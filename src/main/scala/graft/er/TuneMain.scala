package graft.er

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: prints blocking recall, score distributions of true vs false
  * candidate string pairs, and end-to-end F1 on the synthetic corpus —
  * used to pin the accept thresholds in Pipeline.Config. Run:
  *   sbt "runMain graft.er.TuneMain [nPages] [nEntities]"
  */
object TuneMain {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 1500L
    val nEntities = if (args.length > 1) args(1).toInt else 250
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
      maxBlockSize = if (args.length > 2) args(2).toInt else 256,
      workDir = "/tmp/graft_tune")
    val pages = Corpus.pages(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF()
    val mentions = Pipeline.extractMentions(pages).cache()
    println(s"MENTIONS=${mentions.count()}")

    val (strings0, membership0) = Pipeline.internStrings(mentions)
    val strings = strings0.cache()
    val membership = membership0.cache()
    println(s"DISTINCT_STRINGS=${strings.count()}")

    val truth = Pipeline.withMentionIds(
      Corpus.truth(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF())
    // entity of each string = entity of its mentions (strings never span
    // entities only if generator names are unique per entity — check!)
    val stringEntity = membership.join(
      truth.select($"mention_id", $"mention_id2", $"entity_id"),
      Seq("mention_id", "mention_id2"))
      .groupBy($"string_id")
      .agg(countDistinct($"entity_id").as("n_e"), min($"entity_id").as("entity_id"))
      .cache()
    val ambiguous = stringEntity.filter($"n_e" > 1).count()
    println(s"AMBIGUOUS_STRINGS=$ambiguous (same surface form from 2+ entities)")

    val (pairs, stats) = Pipeline.candidatePairs(strings, cfg)
    println(s"STATS=$stats")

    // blocking recall at string level: true duplicate string pairs captured
    val se = stringEntity.select($"string_id", $"entity_id")
    val allTrue = se.as("a").join(se.as("b"),
        $"a.entity_id" === $"b.entity_id" && $"a.string_id" < $"b.string_id")
      .select($"a.string_id".as("src"), $"b.string_id".as("dst"))
    val nTrue = allTrue.count()
    val caught = allTrue.join(pairs, Seq("src", "dst"), "left_semi").count()
    println(f"STRING_BLOCKING_RECALL=${caught.toDouble / math.max(1, nTrue)}%.5f ($caught/$nTrue)")

    val scored = Pipeline.scorePairs(pairs, strings, cfg)
    val lab = scored
      .join(se.withColumnRenamed("string_id", "src").withColumnRenamed("entity_id", "se"), Seq("src"))
      .join(se.withColumnRenamed("string_id", "dst").withColumnRenamed("entity_id", "de"), Seq("dst"))
      .withColumn("is_match", $"se" === $"de").cache()

    println("== score distribution by is_match (string pairs)")
    lab.groupBy($"is_match").agg(
      count(lit(1)).as("n"), min($"jw"), max($"jw"),
      expr("percentile(jw, array(0.01,0.05,0.25,0.5,0.75,0.95,0.99))").as("jw_pcts"))
      .show(false)

    println("== worst true pairs (lowest jw)")
    lab.filter($"is_match").orderBy($"jw").limit(6).show(false)
    println("== best false pairs (highest jw)")
    lab.filter(!$"is_match").orderBy($"jw".desc).limit(6).show(false)

    for (theta <- Seq(0.90, 0.92, 0.93, 0.94, 0.95, 0.96)) {
      val acc = lab.withColumn("pred",
        ($"jw" >= theta || ($"lev" =!= 255 &&
          $"lev" <= greatest(lit(1), least(lit(cfg.levMaxCap),
            ceil($"min_len" * cfg.levMaxPerBytes))).cast("int"))) && $"tok_ok")
      val agg = acc.agg(
        sum(when($"is_match" && $"pred", 1L).otherwise(0L)),
        sum(when(!$"is_match" && $"pred", 1L).otherwise(0L)),
        sum(when($"is_match" && !$"pred", 1L).otherwise(0L))).collect()(0)
      val (tp, fp, fn) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      val p = tp.toDouble / math.max(1, tp + fp)
      val r = tp.toDouble / math.max(1, tp + fn)
      println(f"THETA=$theta%.2f edge-level P=$p%.5f R=$r%.5f F1=${2 * p * r / math.max(1e-9, p + r)}%.5f (fp=$fp fn=$fn)")
    }

    println("== full pipeline e2e")
    val res = Pipeline.run(spark, cfg)
    println(s"RESULT=$res")
    spark.stop()
  }
}
