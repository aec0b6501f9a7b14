package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for the optimization rounds (guide §1.4): times each
  * named query with the NOOP sink — `df.write.format("noop")` computes
  * every column of every row and discards it, so the number isolates the
  * computation from the sink and from count()'s column pruning. The
  * driver-contract harness stays `graft.Bench` (frozen); numbers printed
  * here are cited in OPTIMIZATION_r06.md as isolation evidence only.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <reps> [query ...]
  * Special stage probes (names starting with '@'):
  *   @q33graph — materialize the q33/q45 blocking+JW name graph only
  *     (interned count + edge count), isolating graph construction from
  *     the component loop that follows it.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        name match {
          case "@q33graph" =>
            val (interned, edges) = ops.Components.nameGraph(spark, sfDir)
            interned.count(); edges.count()
          case _ =>
            spark.sparkContext.setJobDescription(s"benchextra: $name")
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        ops.Caches.releaseAll()
        dt
      }
      println(f"[noop] $name min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
