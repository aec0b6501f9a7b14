package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession
import graft.ops.Components

/** Incremental (windowed-ingest) ER end-to-end: pages arrive in
  * maintenance windows; each window interns only its new mentions,
  * generates only pairs that TOUCH a newly seen string, scores them, and
  * folds the accepted edges into the running labels with
  * [[Components.incrementalComponents]] — no window ever re-scans old
  * pairs or re-clusters the edge history.
  *
  * Exact-equality caveat, stated rather than hidden: `matchEdges` picks a
  * top-1 hub per satellite over the pairs it is GIVEN, so a satellite
  * that later meets a better hub keeps its earlier (accepted, correct-
  * by-gate) edge too — the incremental edge set is a superset of the
  * batch run's. Cluster agreement is therefore asserted pairwise
  * (the BASELINE.json criterion metric), not via bit-equality — the
  * bit-exact contract belongs to incrementalComponents itself
  * (ComponentsSpec) where the edge stream is the same.
  */
class IncrementalErSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Pairwise F1 between two labelings of the same id set, weighted by
    * string frequency (same granularity trick as Pipeline
    * .evaluateWeighted): contingency counts give agreeing pair mass
    * without materializing pairs. */
  private def partitionF1(a: DataFrame, b: DataFrame, freqs: DataFrame): Double = {
    val j = a.select($"id", $"label".as("la"))
      .join(b.select($"id", $"label".as("lb")), Seq("id"))
      .join(freqs, Seq("id"))
    def mass(groups: DataFrame) = groups
      .agg(coalesce(sum($"n" * ($"n" - 1) / 2), lit(0L)).cast("long")).collect()(0).getLong(0)
    val cells = j.groupBy($"la", $"lb").agg(sum($"freq").as("n")).persist()
    val tp = mass(cells)
    val pa = mass(cells.groupBy($"la").agg(sum($"n").as("n")))
    val pb = mass(cells.groupBy($"lb").agg(sum($"n").as("n")))
    cells.unpersist()
    if (pa + pb == 0) 1.0 else 2.0 * tp / (pa + pb)
  }

  test("windowed incremental ER holds the F1 gate and agrees with batch") {
    val cfg = Pipeline.Config(seed = 42L, nPages = 800, nEntities = 150,
      workDir = "/tmp/graft_test_incr_er")
    val pages = Corpus.pages(spark, cfg.nPages, cfg.nEntities, cfg.seed)
      .toDF().withColumn("win", pmod(xxhash64($"url"), lit(3)).cast("int"))
      .persist()

    var labels: DataFrame = Seq.empty[(Long, Long)].toDF("id", "label")
    var prevIds: DataFrame = Seq.empty[Long].toDF("string_id")
    var stringsSoFar: DataFrame = null
    var membershipSoFar: DataFrame = null
    var pairsSoFar: DataFrame = Seq.empty[(Long, Long)].toDF("src", "dst")

    for (w <- 0 until 3) {
      // cumulative mention log — in production this is the append-only
      // mention sink; interning it is the incremental upsert proven
      // batch-equal in StreamingSpec (content-hashed ids are stable)
      val mentions = Pipeline.extractMentions(pages.filter($"win" <= w))
      val (strings, membership) = Pipeline.internStrings(mentions)
      stringsSoFar = strings.persist()
      membershipSoFar = membership
      val newIds = strings.select($"string_id").exceptAll(prevIds).persist()

      // window pairs: candidate pairs touching at least one NEW string.
      // (candidatePairs re-ranks gram rarity on the grown corpus — the
      // prefix filter is frequency-adaptive; old-only pairs are dropped
      // here precisely because they were already scored in their window.)
      val (pairs, _) = Pipeline.candidatePairs(strings, cfg)
      val touching = pairs
        .join(newIds.withColumnRenamed("string_id", "src"), Seq("src"), "left_semi")
        .unionByName(pairs.join(
          newIds.withColumnRenamed("string_id", "dst"), Seq("dst"), "left_semi")
          .select($"src", $"dst"))
        .dropDuplicates("src", "dst")
      pairsSoFar = pairsSoFar.unionByName(touching).dropDuplicates("src", "dst")
        .localCheckpoint(true)

      val edges = Pipeline.matchEdges(touching, strings, cfg)
      labels = Components.incrementalComponents(labels, edges)
        .localCheckpoint(true) // the persisted labels table IS the checkpoint
      prevIds = newIds.unionByName(prevIds).localCheckpoint(true)
    }

    // cover edge-less strings (label = own id), same as the batch path
    val finalLabels = stringsSoFar.select($"string_id".as("id"))
      .join(labels.withColumnRenamed("label", "l"), Seq("id"), "left")
      .select($"id", coalesce($"l", $"id").as("label"))

    // 1) the north-rule gate holds under incremental maintenance
    val truth = Pipeline.withMentionIds(
      Corpus.truth(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF())
    val mentionLabels = membershipSoFar
      .join(finalLabels.withColumnRenamed("id", "string_id"), Seq("string_id"))
      .select($"mention_id".as("id"), $"mention_id2".as("id2"), $"label")
    val eval = Pipeline.evaluate(
      Pipeline.labeledPairUniverse(pairsSoFar, membershipSoFar), truth, mentionLabels)
    assert(eval.f1 >= 0.99, s"incremental F1 gate failed: $eval")

    // 2) pairwise agreement with the one-shot batch pipeline
    val batch = Pipeline.runPipeline(spark, cfg.copy(
      workDir = "/tmp/graft_test_incr_er_batch"))
    val freqs = stringsSoFar.select($"string_id".as("id"), $"freq")
    val agree = partitionF1(finalLabels, batch.stringLabels, freqs)
    assert(agree >= 0.995, s"incremental vs batch cluster agreement: $agree")
    pages.unpersist()
  }
}
