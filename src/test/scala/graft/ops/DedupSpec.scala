package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** Production-hash parity for the MinHash/LSH dedup family: the
  * md5-hex demo path exists only so the DuckDB oracle can reproduce the
  * signatures byte-for-byte; the production path keys every shuffle on
  * xxhash64 Longs. Different hash families give different signatures,
  * so the check is on what matters: the candidate PAIR SET the banding
  * emits at matched parameters (8 slots, 4 bands × 2 rows, MaxBlock cap)
  * over the driver's documents corpus.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("xxhash64 LSH + verification equals the md5 demo path exactly") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, sf, "documents")
      val demoCand = pairSet(Dedup.q22LshPairs(spark, sf))
      val prodCand = pairSet(Dedup.lshPairsXx(docs))
      // banding is probabilistic per hash family: true near-dups land in
      // both, only sub-threshold accidental band collisions may differ
      val inter = (demoCand & prodCand).size.toDouble
      assert(inter / (demoCand | prodCand).size >= 0.6,
        s"$sf: candidate overlap collapsed: md5=$demoCand xx=$prodCand")
      // after the exact-Jaccard rescore both paths agree EXACTLY at the
      // corpus near-dup threshold
      val demo = pairSet(Dedup.verifyJaccard(docs,
        Dedup.q22LshPairs(spark, sf), 0.1))
      val prod = pairSet(Dedup.verifyJaccard(docs,
        Dedup.lshPairsXx(docs), 0.1))
      assert(demo == prod,
        s"$sf: verified md5-only=${demo -- prod}, xx-only=${prod -- demo}")
      assert(demo.nonEmpty, s"$sf: empty verified pair set proves nothing")
    }
  }

  test("xxhash64 minhash signatures are fixed-width longs, 8 slots per doc") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sig = Dedup.minhashXx(docs)
    assert(sig.schema("minhash").dataType ==
      org.apache.spark.sql.types.LongType)
    val slots = sig.groupBy("doc_id").count().select("count").distinct().collect()
    assert(slots.map(_.getLong(0)).toSet == Set(8L))
  }
}
