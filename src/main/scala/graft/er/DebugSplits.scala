package graft.er

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: which truth entities split across clusters, and why
  * (keys, freqs, scalar-gate + hub-rule decisions on their string pairs). */
object DebugSplits {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 800L
    val nEntities = if (args.length > 1) args(1).toInt else 150
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-debug")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
      workDir = "/tmp/graft_debug")
    val pages = Corpus.pages(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF()
    val mentions = Pipeline.extractMentions(pages).cache()
    val (strings0, membership0) = Pipeline.internStrings(mentions)
    val strings = strings0.cache()
    val membership = membership0.cache()
    val truth = Pipeline.withMentionIds(
      Corpus.truth(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF())

    val stringEntity = membership
      .join(truth.select($"mention_id", $"mention_id2", $"entity_id"),
        Seq("mention_id", "mention_id2"))
      .groupBy($"string_id").agg(min($"entity_id").as("entity_id")).cache()

    val out = Pipeline.runPipeline(spark, cfg)
    // string-level cluster label: label of any of its mentions
    val stringLabel = out.labels
      .join(membership.withColumnRenamed("mention_id", "id"), Seq("id"))
      .groupBy($"string_id").agg(min($"label").as("label"))

    val full = strings.join(stringEntity, Seq("string_id"))
      .join(stringLabel, Seq("string_id")).cache()
    val splitEntities = full.groupBy($"entity_id")
      .agg(countDistinct($"label").as("n_labels"), count(lit(1)).as("n_strings"))
      .filter($"n_labels" > 1)
      .cache()
    println(s"SPLIT_ENTITIES=${splitEntities.count()}")
    val splitIds = splitEntities.select($"entity_id").as[Long].collect().toSeq.sorted

    // for the first few split entities, dump their strings and pair decisions
    val scored = Pipeline.scorePairs(out.pairs, strings, cfg)
    val hubEdges = Pipeline.matchEdges(out.pairs, strings, cfg).withColumn("hub_kept", lit(true))
    for (e <- splitIds.take(8)) {
      println(s"== entity $e")
      val es = full.filter($"entity_id" === e)
        .select($"string_id", $"match_key", $"freq", $"label")
        .orderBy($"freq".desc)
      es.show(40, false)
      val ids = es.select($"string_id").as[Long].collect().toSet
      val idsB = spark.sparkContext.broadcast(ids)
      val inPairs = scored.filter(
        udf((s: Long) => idsB.value.contains(s)).apply($"src") &&
        udf((d: Long) => idsB.value.contains(d)).apply($"dst"))
        .join(hubEdges, Seq("src", "dst"), "left")
      inPairs.show(60, false)
    }
    spark.stop()
  }
}
