package graft.er

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the BASELINE north_rule criterion
  * (N vs 4N executors ≥ 0.8 efficiency). No real cluster exists in this
  * sandbox, so the same ER job runs on the same input at local[8] and
  * local[32] (shuffle partitions scaled alike); reported:
  * throughput at both levels, efficiency = (T_8 / T_32) / 4, and
  * output-identity of the final cluster labels across the two runs.
  *
  * Run: sbt "runMain graft.er.ScalingBench [nPages] [nEntities]"
  * Prints one JSON line; also used to fill BENCH/BASELINE.md.
  */
object ScalingBench {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class Level(cores: Int, seconds: Double, pairsPerSec: Double,
      pagesPerSec: Double, f1: Double, clusters: Long)

  def runAt(cores: Int, nPages: Long, nEntities: Int): Level = {
    val spark = session(cores)
    try {
      // JIT/codegen warmup on a small corpus so the measured run is steady-state
      Pipeline.runPipeline(spark, Pipeline.Config(nPages = 500, nEntities = 100,
        workDir = s"/tmp/graft_scaling_warm_$cores", collectStats = false))
      val cfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
        workDir = s"/tmp/graft_scaling_$cores", collectStats = false)
      val t0 = System.nanoTime()
      val out = Pipeline.runPipeline(spark, cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      val nPairs = out.pairs.count() // untimed: metric-only
      val truth = Corpus.truth(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF()
        .withColumn("mention_id", org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("url"),
          org.apache.spark.sql.functions.col("seq")))
      val eval = Pipeline.evaluate(
        Pipeline.labeledPairUniverse(out.pairs, out.membership), truth, out.labels)
      Level(cores, sec, nPairs / sec, nPages / sec,
        eval.f1, out.clusters)
    } finally {
      spark.stop()
      // allow a fresh master for the next level in the same JVM
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 2000000L
    val nEntities = if (args.length > 1) args(1).toInt else 100000
    val lo = runAt(8, nPages, nEntities)
    val hi = runAt(32, nPages, nEntities)
    val eff = (lo.seconds / hi.seconds) / 4.0

    // identical output across parallelism levels (north_rule equivalence)
    val spark = session(8)
    val l1 = spark.read.parquet(latestLabels("/tmp/graft_scaling_8"))
    val l2 = spark.read.parquet(latestLabels("/tmp/graft_scaling_32"))
    val identical = l1.exceptAll(l2).isEmpty && l2.exceptAll(l1).isEmpty
    spark.stop()

    println(
      f"""{"bench":"er_scaling","pages":$nPages,"entities":$nEntities,""" +
        f""""n8":{"seconds":${lo.seconds}%.2f,"pairs_per_sec":${lo.pairsPerSec}%.0f,"pages_per_sec":${lo.pagesPerSec}%.0f,"f1":${lo.f1}%.5f},""" +
        f""""n32":{"seconds":${hi.seconds}%.2f,"pairs_per_sec":${hi.pairsPerSec}%.0f,"pages_per_sec":${hi.pagesPerSec}%.0f,"f1":${hi.f1}%.5f},""" +
        f""""scaling_efficiency":$eff%.3f,"identical_clusters":$identical}""")
  }

  private def latestLabels(dir: String): String = {
    val iters = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("labels_iter_"))
      .flatMap(n => scala.util.Try(n.stripPrefix("labels_iter_").toInt).toOption)
    s"$dir/labels_iter_${iters.max}"
  }
}
