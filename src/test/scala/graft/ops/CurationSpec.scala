package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** q61 composed curation manifest: the lineage invariants on top of the
  * DuckDB hash gate — flag implications, every gate actually firing, and
  * the pool-derived rate algebra.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val rows =
    Curation.q61CurationPipeline(spark, "/root/testdata/sf0.001").collect()
  private def b(r: org.apache.spark.sql.Row, c: String): Boolean =
    r.getBoolean(r.fieldIndex(c))
  private def l(r: org.apache.spark.sql.Row, c: String): Long =
    r.getLong(r.fieldIndex(c))

  test("q61: manifest covers every document once with consistent flags") {
    assert(rows.length == 500)
    assert(rows.map(l(_, "doc_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(b(r, "in_pool") ==
        (b(r, "passed_quality") && !b(r, "is_exact_dup") && !b(r, "is_near_dup")))
      assert(b(r, "kept") == (b(r, "in_pool") && b(r, "sampled")))
      assert(b(r, "passed_quality") == (l(r, "quality_pm") >= Curation.QualityGate))
      assert(b(r, "is_exact_dup") == (l(r, "doc_id") != l(r, "exact_keeper")))
      assert(b(r, "is_near_dup") == (l(r, "doc_id") != l(r, "near_keeper")))
      assert(l(r, "exact_keeper") <= l(r, "doc_id"))
      assert(l(r, "near_keeper") <= l(r, "doc_id"))
      assert(b(r, "sampled") == (l(r, "bucket") < l(r, "rate_permille")))
    }
  }

  test("q61: every stage fires at sf0.001 and the final corpus is a " +
      "strict multi-stage reduction") {
    val n = rows.length
    val dropQ = rows.count(!b(_, "passed_quality"))
    val dropE = rows.count(b(_, "is_exact_dup"))
    val dropN = rows.count(r => b(r, "is_near_dup") && !b(r, "is_exact_dup"))
    val pool = rows.count(b(_, "in_pool"))
    val kept = rows.count(b(_, "kept"))
    assert(dropQ > 0, "quality gate never fired")
    assert(dropN > 0, "near-dup gate never fired beyond exact dups")
    assert(pool > 0 && kept > 0 && kept < pool && pool < n,
      s"n=$n pool=$pool kept=$kept dropQ=$dropQ dropE=$dropE dropN=$dropN")
  }

  test("q61: rate is derived from the POOL's token totals, not the corpus") {
    val budgets = Map("en" -> 2500L, "de" -> 2000L, "zh" -> 999999L)
      .withDefaultValue(800L)
    rows.groupBy(r => r.getString(r.fieldIndex("lang"))).foreach {
      case (lang, rs) =>
        val poolTokens = rs.filter(b(_, "in_pool")).map(l(_, "n_tokens")).sum
        val expected =
          if (poolTokens == 0L) 0L
          else math.min(1000L, budgets(lang) * 1000L / poolTokens)
        rs.foreach(r => assert(l(r, "rate_permille") == expected,
          s"$lang rate ${l(r, "rate_permille")} != $expected (pool $poolTokens)"))
        // pool totals differ from corpus totals (dedup/quality dropped
        // someone), so a corpus-derived rate would diverge
        val corpusTokens = rs.map(l(_, "n_tokens")).sum
        assert(corpusTokens > poolTokens, s"$lang: pool must be smaller")
    }
  }
}
