package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SparkTestSession

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("q47 recovers host/pld/canonical from the URL string alone") {
    val out = UrlOps.q47UrlNormalize(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id").isin(0L, 1L))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = out(0L) // even doc: www. subdomain, es lang in sf0.001
    assert(r0.getString(1).startsWith("www.src0.example."))
    assert(r0.getString(2).startsWith("example."), "pld drops the subdomain")
    val canon0 = r0.getString(3)
    assert(canon0.contains("/docs/0?b=0&a=1"), canon0)
    assert(!canon0.contains("utm_") && !canon0.contains("#") &&
      !canon0.contains(":443"), s"tracking/fragment/port must be stripped: $canon0")
    val r1 = out(1L) // odd doc: apex host
    assert(!r1.getString(1).startsWith("www."))
    assert(r1.getLong(4) >= 1L, "docs_in_pld window count present")
  }
}
