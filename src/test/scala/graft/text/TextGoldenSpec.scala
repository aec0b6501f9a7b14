package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Golden vectors copied from the reference's tests — see FIXTURES.md §4.
  * Sources: /root/reference/test/simple_test.cc, test/cyrillic_test.cc.
  */
class TextGoldenSpec extends AnyFunSuite {

  test("normalize: Landwehrstraße → landwehrstrasse (NFD+stripmark+casefold)") {
    assert(Normalize.normalize("Landwehrstraße") == "landwehrstrasse")
    assert(Normalize.normalize("Äöü ÉÀ") == "aou ea")
    // full casefold, not toLowerCase: ẞ (capital sharp s) → ss
    assert(Normalize.normalize("STRAẞE") == "strasse")
  }

  test("trigrams of normalized Landwehrstraße (simple_test.cc:20-32)") {
    val normalized = Normalize.normalize("Landwehrstraße")
    val expected = Vector("lan", "and", "ndw", "dwe", "weh", "ehr", "hrs",
      "rst", "str", "tra", "ras", "ass", "sse")
    assert(Ngrams.trigramStrings(normalized) == expected)
  }

  test("bigrams of normalized Landwehrstraße (simple_test.cc:34-47)") {
    val normalized = Normalize.normalize("Landwehrstraße")
    val expected = Vector("la", "an", "nd", "dw", "we", "eh", "hr", "rs",
      "st", "tr", "ra", "as", "ss", "se")
    val got = Ngrams.bigrams(normalized).toVector.map(g =>
      new String(Ngrams.decompressBigram(g), StandardCharsets.UTF_8))
    assert(got == expected)
  }

  test("cyrillic bigram packing is unsigned (cyrillic_test.cc:20-25)") {
    val i = "и".getBytes(StandardCharsets.UTF_8) // 0xD0 0xB8
    val n = "н".getBytes(StandardCharsets.UTF_8) // 0xD0 0xBD
    assert(Ngrams.compressBigram(i(0), i(1)) != Ngrams.compressBigram(n(0), n(1)))
    assert(Ngrams.decompressBigram(Ngrams.compressBigram(i(0), i(1))).toSeq == i.toSeq)
  }

  test("phrase windows of 6 tokens (simple_test.cc:49-75)") {
    // The reference golden lists *generation order* for windows of <= 3
    // tokens (it predates the length-descending sort that the alt_string
    // golden at simple_test.cc:77-102 pins down). We check generation
    // order restricted to <= 3-token windows here; the sorted semantics
    // are covered by the alt_string test below.
    val buf = Vector.newBuilder[(String, String)]
    Phrases.forEachPhrase(
      Vector("willy", "brandt", "platz", "abert", "ainstein", "illme")) {
      (bits, s) =>
        if (java.lang.Integer.bitCount(bits) <= 3)
          buf += ((s, Phrases.bitMaskToStr(bits)))
    }
    val phrases = buf.result()
    val expected = Vector(
      ("willy", "10000000"), ("willy brandt", "11000000"),
      ("willy brandt platz", "11100000"), ("brandt", "01000000"),
      ("brandt platz", "01100000"), ("brandt platz abert", "01110000"),
      ("platz", "00100000"), ("platz abert", "00110000"),
      ("platz abert ainstein", "00111000"), ("abert", "00010000"),
      ("abert ainstein", "00011000"), ("abert ainstein illme", "00011100"),
      ("ainstein", "00001000"), ("ainstein illme", "00001100"),
      ("illme", "00000100"))
    assert(phrases == expected)
  }

  test("synonym-alternate phrases (simple_test.cc:77-102)") {
    val phrases = Phrases.sortedPhrases(Vector("hauptbahnhof", "darmstadt", "abc"))
    val expected = Vector(
      ("hauptbahnhof darmstadt abc", "11100000"),
      ("hauptbahnhof darmstadt", "11000000"),
      ("hbf darmstadt abc", "11100000"),
      ("hbf darmstadt", "11000000"),
      ("darmstadt abc", "01100000"),
      ("hauptbahnhof", "10000000"),
      ("darmstadt", "01000000"),
      ("hbf", "10000000"),
      ("abc", "00100000"))
    assert(phrases.size == expected.size)
    expected.zipWithIndex.foreach { case ((s, mask), i) =>
      assert((phrases(i).s, Phrases.bitMaskToStr(phrases(i).tokenBits)) == ((s, mask)),
        s"phrase $i")
    }
  }

  test("numeric token mask (normalize.h:192-206)") {
    assert(Phrases.bitMaskToStr(
      Normalize.numericTokensMask(Seq("abc", "98", "9a", "0aa"))) == "01100000")
  }

  test("erase_fillers semantics (normalize.h:28-46)") {
    assert(Normalize.eraseFillers("a,b;c-d/e(f)g.h") == "a b c d e f g h")
    assert(Normalize.eraseFillers("..a..b..") == " a b".trim)
    assert(Normalize.eraseFillers("a  ,  b") == "a b")
    assert(Normalize.eraseFillers("...") == "")
    // collapse only applies to spaces, duplicates of other chars survive
    assert(Normalize.eraseFillers("aabb") == "aabb")
  }

  test("match score accepts reference goldens (simple_test.cc:243-247)") {
    assert(MatchScore.matchScore("Darmstadt", "darmstadt") != MatchScore.NoMatch)
    assert(MatchScore.matchScore("Darmstadt,ZOB Zweifalltorweg", "darmstadt")
      != MatchScore.NoMatch)
  }

  test("match score rejects garbage") {
    assert(MatchScore.matchScore("Bas-Rhin", "zappendorf") == MatchScore.NoMatch)
    assert(MatchScore.matchScore("", "x") == MatchScore.NoMatch)
    assert(MatchScore.matchScore("x", "") == MatchScore.NoMatch)
  }

  test("sift4 smoke (simple_test.cc:265-271 shape)") {
    val d = Sift4.dist("Landkreis Aschaffenburg", "mainaschaff aschaffenburg", 4, 10)
    assert(d > 0 && d <= 25)
    assert(Sift4.dist("abc", "abc", 3, 10) == 0)
    assert(Sift4.dist("", "abc", 3, 10) == 3)
    assert(Sift4.dist("ab", "ba", 3, 10) == 1) // one transposition
  }

  test("bounded levenshtein matches plain levenshtein under the band") {
    assert(EditDistances.boundedLevenshtein("darmstadt", "darmstat") == 1)
    assert(EditDistances.boundedLevenshtein("abc", "abc") == 0)
    // early exit returns the 255 sentinel (score.h:51-53)
    assert(EditDistances.boundedLevenshtein("aaaaaaaaaa", "zzzzzzzzzz")
      == EditDistances.Overflow)
  }

  test("query tokenizer caps at 8 tokens and erases fillers per token") {
    val t = Normalize.tokenizeQuery("Groß-Umstadt An der Pfalz")
    assert(t == Vector("gross umstadt", "an", "der", "pfalz"))
    val many = Normalize.tokenizeQuery((1 to 12).map(i => s"t$i").mkString(" "))
    assert(many.size == 8)
  }

  test("split_ngrams: sorted, capped at 128, space-skipping") {
    val g = Ngrams.splitNgrams("ab cd")
    assert(g.toVector == Vector(
      Ngrams.compressBigram("ab"), Ngrams.compressBigram("cd")).sorted)
    val long = Ngrams.splitNgrams("a" * 300)
    assert(long.length == 128)
  }

  test("min_match_count + cosine cutoff formulas (typeahead.cc:409-423)") {
    assert(Ngrams.minMatchCount(14) == 2 + 14 / (4 + 1))
    assert(Ngrams.cosSim(5, 10, 10) == 0.25f)
  }

  test("normalize is idempotent on match keys (matchScorePre precondition)") {
    // matchScorePre/matchScoresPre skip the internal Normalize.normalize —
    // valid iff normalize is the identity on canonical match keys
    val samples = Seq(
      "Landwehrstraße", "Groß-Umstadt An der Pfalz", "Darmstadt Hbf",
      "ж.к. П. Р. Славейков", "Индже войвода", "İstanbul Caddesi",
      "Müller-Lüdenscheidt-Weg 12", "café RENÉ (gare)", "  a,b;c  ")
    samples.foreach { s =>
      val mk = MatchKeys.matchKey(s)
      assert(Normalize.normalize(mk) == mk, s"normalize not identity on '$mk'")
    }
  }

  test("matchScorePre/matchScoresPre equal matchScore on normalized input") {
    // names must be CANONICAL (matchScorePre's precondition): "войвода"
    // raw would differ — й is NFD-decomposed to и + stripped breve
    val names = Seq("Индже войвода", "ж.к. П. Р. Славейков",
      "Darmstadt Hauptbahnhof", "Landwehrstraße", "war")
      .map(MatchKeys.matchKey)
    val phrases = Array("индже", "славеиков 26", "darmstadt hauptbahnhof",
      "воивода", "landwehrstrasse", "wa")
    names.foreach { n =>
      val multi = MatchScore.matchScoresPre(n, phrases)
      phrases.zipWithIndex.foreach { case (p, i) =>
        val full = MatchScore.matchScore(n, p)
        assert(MatchScore.matchScorePre(n, p) == full, s"pre($n,$p)")
        assert(multi(i) == full, s"multi($n,$p)")
      }
    }
  }
}
