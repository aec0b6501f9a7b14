package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** q58 composed reverse lookup (reference `reverse::lookup`,
  * reverse.cc:50-132): the invariants the DuckDB oracle's hash compare
  * can't express on its own — the per-probe gate, the merged top-n
  * contract, and the house/place −10 bonus actually dominating ranks
  * when a point hit is close.
  */
class ReverseGeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // (id, rank, kind, entity_id, score_fp)
  private lazy val rows =
    ReverseGeo.q58ReverseLookup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getInt(r.fieldIndex("rank")),
        r.getString(r.fieldIndex("kind")),
        r.getLong(r.fieldIndex("entity_id")),
        r.getLong(r.fieldIndex("score_fp"))))

  test("q58: filter_type gate — address-only probes see no places, " +
      "place-only probes see no streets") {
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, kind, _, _) =>
      if (id % 3 == 0) assert(kind == "street",
        s"id=$id is street-only (filter gate) but got kind=$kind")
      if (id % 3 == 1) assert(kind == "place",
        s"id=$id is place-only (filter gate) but got kind=$kind")
    }
    // both branches must actually fire somewhere, or the union is vacuous
    val kinds = rows.map(_._3).toSet
    assert(kinds == Set("street", "place"), s"branches seen: $kinds")
    // and at least one probe must mix kinds within its top-n — the whole
    // point of the MERGED candidate set vs two separate lookups
    val mixed = rows.groupBy(_._1).exists(_._2.map(_._3).toSet.size == 2)
    assert(mixed, "no probe ranked street and place hits together")
  }

  test("q58: ONE shared top-n per probe — ranks contiguous from 1, at " +
      "most 3, strictly ordered by (score, kind, entity_id)") {
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val byRank = rs.sortBy(_._2)
      val ranks = byRank.map(_._2).toSeq
      assert(ranks == (1 to rs.length) && rs.length <= 3,
        s"id=$id ranks=$ranks")
      val keys = byRank.map(t => (t._5, t._3, t._4)).toSeq
      assert(keys == keys.sorted, s"id=$id not rank-ordered: $keys")
    }
  }

  test("q58: the -10 place bonus outranks any street hit within bonus " +
      "reach (reverse.cc:66/91 'geo::distance(query, c) - 10.F')") {
    // every place score is (point distance in milli-deg) - 10, every
    // street score is >= 0: wherever a probe has a place hit with
    // score_fp < 0 AND any street hit, the place MUST rank above it
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val negPlace = rs.filter(t => t._3 == "place" && t._5 < 0L)
      val streets = rs.filter(_._3 == "street")
      if (negPlace.nonEmpty && streets.nonEmpty) {
        val bestPlace = negPlace.map(_._2).min
        val bestStreet = streets.map(_._2).min
        assert(bestPlace < bestStreet,
          s"id=$id: bonused place rank $bestPlace vs street $bestStreet")
      }
    }
    // the scenario must occur at sf0.001 or the assertion proves nothing
    assert(rows.exists(t => t._3 == "place" && t._5 < 0L),
      "no bonused place hit at sf0.001 — bonus path unexercised")
  }
}
