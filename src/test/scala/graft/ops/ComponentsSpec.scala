package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic multi-component graph: vertices 0..59, a chain inside
    * each residue class mod 6 with some edges withheld as the "new"
    * batch — including edges that BRIDGE two old components (the case
    * where incremental maintenance must actually merge clusters, not
    * just extend one). */
  private def graph() = {
    val all = (0 until 54).map(i => (i.toLong, (i + 6).toLong)) // chains mod 6
    val bridges = Seq((1L, 2L), (3L, 4L)) // merge components 1∪2 and 3∪4
    val extra = Seq((48L, 54L), (55L, 55L)) // tail extension + self-loop
    (all, bridges ++ extra)
  }

  test("incrementalComponents over prior labels equals full re-clustering") {
    val (oldEdges, newEdges) = graph()
    val vertices = (0L to 59L).toDF("id")
    val oldDf = oldEdges.toDF("src", "dst")
    val newDf = newEdges.toDF("src", "dst")

    val prior = Components.connectedComponents(vertices, oldDf)
    val incremental = Components.incrementalComponents(prior, newDf)
    val full = Components.connectedComponents(
      vertices, oldDf.unionByName(newDf))

    // min-label semantics make both labelings canonical (label = min
    // member id), so the comparison is exact equality, not isomorphism
    assert(incremental.exceptAll(full).isEmpty &&
      full.exceptAll(incremental).isEmpty,
      "incremental labels diverge from full re-clustering")
    // the bridge edges really did merge old components
    val labelOf = incremental.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelOf(1L) == labelOf(2L) && labelOf(1L) == labelOf(8L))
    assert(labelOf(3L) == labelOf(4L))
    assert(labelOf(0L) != labelOf(1L), "unbridged components must stay apart")
  }

  test("incrementalComponents with empty new batch is the identity") {
    val (oldEdges, _) = graph()
    val vertices = (0L to 59L).toDF("id")
    val prior = Components.connectedComponents(vertices, oldEdges.toDF("src", "dst"))
    val same = Components.incrementalComponents(prior,
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(same.exceptAll(prior).isEmpty && prior.exceptAll(same).isEmpty)
  }

  test("incrementalComponents admits brand-new vertices from the edge batch") {
    val prior = Seq((10L, 10L), (11L, 10L)).toDF("id", "label")
    val out = Components.incrementalComponents(prior,
      Seq((11L, 100L), (200L, 201L)).toDF("src", "dst"))
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(100L) == 10L, "new vertex must join the old cluster through the bridge")
    assert(m(200L) == 200L && m(201L) == 200L, "disjoint new pair forms its own cluster")
    assert(m.keySet == Set(10L, 11L, 100L, 200L, 201L))
  }
}
