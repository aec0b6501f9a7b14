package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** ANN quality gate for the IVF path (q27, k-means cells, k=16).
  *
  * The synthetic embeddings carry no planted high-cosine structure (max
  * pairwise cosine ≈ 0.5, true top-5 at ≈ 0.3 — barely above the 1/√64
  * noise floor), so recall@5 at nprobe p is information-theoretically
  * ≈ p/k on this corpus and a fixed high-recall threshold at nprobe=2
  * would test the data, not the code. What the machinery must guarantee —
  * and what this spec pins — is:
  *
  *  1. LOSSLESSNESS: probing all k cells reproduces the exact brute-force
  *     baseline (q26) bit-for-bit, rounded cosines included. This is the
  *     end-to-end correctness of cell assignment + candidate generation +
  *     ranking with pruning disabled.
  *  2. GRADED PRUNING: recall@5 rises monotonically with nprobe and is
  *     at least the unpruned fraction would predict — the cells partition
  *     without systematically excluding neighbors.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def exactTop5(sf: String): Map[Long, Set[Long]] =
    Similarity.q26CosineTopK(spark, sf)
      .filter(col("rnk") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  private def recallAt(sf: String, nprobe: Int, exact: Map[Long, Set[Long]]): Double = {
    val ivf = Similarity.annIvf(spark, sf, nprobe)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val qs = exact.keys.toSeq.sorted
    qs.map { q =>
      val e = exact(q)
      (e & ivf.getOrElse(q, Set.empty)).size.toDouble / e.size
    }.sum / qs.size
  }

  test("IVF at nprobe = k is lossless: exact top-5, rounded cosines included") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Similarity.q26CosineTopK(spark, sf)
        .filter(col("rnk") <= 5)
        .select("qid", "vec_id", "cosine", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val full = Similarity.annIvf(spark, sf, 16)
        .filter(col("qid") < 5)
        .select("qid", "vec_id", "cosine", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(exact.nonEmpty && full == exact,
        s"$sf: unpruned IVF diverged from the exact baseline " +
          s"(missing ${(exact -- full).take(3)}, extra ${(full -- exact).take(3)})")
    }
  }

  test("recall@5 rises with nprobe and clears the unpruned-fraction floor") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = exactTop5(sf)
      assert(exact.nonEmpty)
      val r2 = recallAt(sf, 2, exact)
      val r8 = recallAt(sf, 8, exact)
      val r16 = recallAt(sf, 16, exact)
      info(f"$sf: recall@5 nprobe=2 $r2%.2f, nprobe=8 $r8%.2f, nprobe=16 $r16%.2f")
      assert(r16 == 1.0, s"$sf: full probe must be exact, got $r16")
      assert(r8 >= r2, s"$sf: recall fell with more probes ($r2 -> $r8)")
      // 8 of 16 cells probed: unpruned-fraction floor is ~0.5 in
      // expectation; 0.3 leaves slack for 25-sample noise while still
      // catching a pruning path that drops neighbors systematically
      assert(r8 >= 0.3, s"$sf: recall at half the cells collapsed to $r8")
    }
  }
}
