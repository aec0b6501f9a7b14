package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries without the full Bench
  * sweep. `runMain graft.TimeQuery <sfDir> <n_reps> q39_suggest [...]`
  * (no names = all queries). Prints per-query min/each and row counts. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var rows = -1L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        ops.Caches.releaseAll() // each rep re-persists its own frames
        dt
      }
      println(f"[time] $name rows=$rows min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
