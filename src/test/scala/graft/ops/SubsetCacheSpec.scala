package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** §2.10 subset-reuse cache (reference cache.h:52-108): the incremental
  * path (cached prefix counts + delta-gram postings only) must produce
  * EXACTLY the counts a from-scratch pass over the full gram set does —
  * the identity the reference's typeahead cache relies on per keystroke.
  * The driver's DuckDB oracle re-proves the same thing independently.
  */
class SubsetCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("incremental prefix+delta counts equal from-scratch full-query counts") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val inc = SubsetCache.q44SubsetCache(spark, sf)
      val scratch = SubsetCache.fromScratch(spark, sf)
      assert(inc.count() > 0, s"$sf: subset-cache query produced no candidates")
      assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty,
        s"$sf: incremental and from-scratch candidate counts diverge")
    }
  }

  test("the delta gram set is exactly the windows the new keystrokes added") {
    import org.apache.spark.sql.functions._
    import graft.{functions => gf}
    // prefix grams ⊆ full grams (every window of a prefix is a window of
    // the full string), so except() splits G_full exactly in two
    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(lower(col("p_name")).as("name"))
      .filter(length(col("name")) >= 8)
      .select(col("name"),
        gf.trigram_strings(col("name")).as("gf_full"),
        gf.trigram_strings(substring(col("name"), 1, 5)).as("gf_prefix"))
    val bad = names.filter(
      size(array_except(col("gf_prefix"), col("gf_full"))) > 0 ||
        size(array_union(col("gf_prefix"),
          array_except(col("gf_full"), col("gf_prefix")))) =!= size(col("gf_full")))
    assert(bad.isEmpty, bad.limit(3).collect().mkString("; "))
  }
}
