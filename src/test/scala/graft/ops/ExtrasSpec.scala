package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SparkTestSession

class ExtrasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("capCells drops Zipf-dense cells whole and keeps sparse ones intact") {
    // a "Tokyo" cell with 300 replicated sites (over Dedup.MaxBlock=256)
    // plus two sparse cells — the dense cell must stop producing
    // candidates entirely, the sparse ones must pass through unchanged
    val dense = (0 until 300).map(i => (i.toLong, 35, 139))
    val sparse = (0 until 40).map(i => (1000L + i, 1, 2)) ++
      Seq((2000L, -3, -4))
    val cells = (dense ++ sparse).toDF("site_id", "cla", "clo")
    val kept = Extras.capCells(cells)
    val byCell = kept.groupBy("cla", "clo").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(!byCell.contains((35, 139)), "dense cell must be dropped whole")
    assert(byCell((1, 2)) == 40L && byCell((-3, -4)) == 1L,
      "sparse cells must survive the cap untouched")
    // exactly at the cap: 256 rows in one cell is still kept
    val atCap = (0 until 256).map(i => (i.toLong, 7, 7)).toDF("site_id", "cla", "clo")
    assert(Extras.capCells(atCap).count() == 256L)
  }
}
