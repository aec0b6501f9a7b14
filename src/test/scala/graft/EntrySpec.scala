package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns non-empty cluster summary") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query name has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q15/q16/q39 embed Double Metaphone / the reference scorer — no SQL
    // analogue; pinned by ScalaTest goldens (TextGoldenSpec, SuggestSpec)
    assert(noOracle == Set("q15_metaphone", "q16_match_score", "q39_suggest"), noOracle)
    // no orphan oracles
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("all queries run non-empty on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
