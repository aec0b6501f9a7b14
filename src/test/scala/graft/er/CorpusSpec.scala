package graft.er

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{EditDistances, Normalize}

/** Generator well-posedness: the vocabulary guarantees distinct entities
  * are >= 3 canonical edits apart, so the <=1-edit corruption model keeps
  * the truth separable by string distance (see Corpus scaladoc). */
class CorpusSpec extends AnyFunSuite {
  test("vocabulary lists are pairwise lev >= 3 on canonical forms") {
    Corpus.vocabularies.foreach { list =>
      val canon = list.map(w =>
        graft.text.MatchKeys.foldDigraphs(Normalize.normalize(w)))
      for {
        i <- canon.indices
        j <- (i + 1) until canon.size
      } {
        val d = EditDistances.levenshtein(canon(i), canon(j))
        assert(d >= 3, s"'${list(i)}' vs '${list(j)}' lev=$d")
      }
    }
  }

  test("entity names are injective over the first 30k ids") {
    val names = (0L until 30000L).map(Corpus.entityName(42L, _))
    assert(names.distinct.size == names.size)
  }

  test("corruption never produces an empty or unrecognizable surface") {
    for (e <- 0L until 500L; slot <- 0 until 4) {
      val name = Corpus.entityName(7L, e)
      val surf = Corpus.corrupt(name, DetRandom.hash(7L, e, slot.toLong))
      assert(surf.nonEmpty)
      // byte-level distance: <=1 char edit = <=2 byte edits for ASCII,
      // <=4 for a 2-byte (Cyrillic) transposition
      assert(EditDistances.levenshtein(
        graft.text.MatchKeys.matchKey(surf),
        graft.text.MatchKeys.matchKey(name)) <= 4,
        s"'$surf' strayed too far from '$name'")
    }
  }
}
