package graft.er

import org.apache.spark.sql.SparkSession

/** Dev tool: one timed pipeline run with per-stage timings (set
  * GRAFT_STAGE_TIMING=1) at a given core count / input size — used to see
  * which stages dominate and how they scale with cores.
  *   runMain graft.er.ProfileMain [cores] [nPages] [nEntities] [shufflePartitions]
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toLong else 500000L
    val nEntities = if (args.length > 2) args(2).toInt else 20000
    val parts = if (args.length > 3) args(3) else "64"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
      workDir = s"/tmp/graft_profile_$cores", collectStats = true)
    // warmup
    Pipeline.runPipeline(spark, cfg.copy(nPages = 500, nEntities = 100,
      workDir = s"/tmp/graft_profile_warm_$cores"))
    val t0 = System.nanoTime()
    val out = Pipeline.runPipeline(spark, cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL cores=$cores pages=$nPages parts=$parts: $sec%.2f s " +
      f"(iterations=${out.iterations}, pairs=${out.stats.candidatePairs})")
    spark.stop()
  }
}
