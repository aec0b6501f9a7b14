package graft.er

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the BASELINE north_rule criterion
  * (N vs 4N executors ≥ 0.8 efficiency). No real cluster exists in this
  * sandbox, so the same ER job runs on the same input at two core counts
  * (the builder brief explicitly allows "N and 4N cores"). Two caveats of
  * a single shared box, both mitigated:
  *
  *  - co-tenant contention makes single runs noisy → each level runs
  *    twice and reports the min (the least-contended estimate);
  *  - all cores share one memory bus, so high core counts add compute but
  *    no bandwidth the way 4× real executors would → the headline 4× pair
  *    is local[1] vs local[4]; local[16] is reported as a supplementary
  *    point, not the criterion;
  *  - GC and JIT threads are NOT scaled by local[N] (the JVM sizes them
  *    from the 32 physical cores in every level), whereas on a real
  *    cluster each executor's GC/JIT capacity is constant across N and 4N
  *    (scaling adds executors, it does not grow them). Launch with
  *    pinned auxiliary threads so they are at least EQUAL across levels:
  *    java -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -XX:CICompilerCount=4.
  *
  * Reported per level: wall seconds, candidate-pairs/sec, pages/sec, F1;
  * plus efficiency = (T_N / T_4N) / 4 and output-identity of the final
  * cluster labels across ALL levels (SURVEY.md §7.4 determinism).
  *
  * Run: sbt "runMain graft.er.ScalingBench [nPages] [nEntities] [lo] [hi] [extra...]"
  * Prints one JSON line; also used to fill BENCH/BASELINE.md.
  */
object ScalingBench {
  /** GRAFT_SCALING_LOCAL_CLUSTER=1 switches the harness from `local[n]`
    * (n task threads in ONE JVM) to `local-cluster[n,1,m]` (n separate
    * 1-core executor JVMs — Spark's standalone cluster running on one
    * box). The latter is the faithful N-vs-4N-executor emulation:
    * - each executor has its own heap and GC, so a stop-the-world pause
    *   costs one core-second per second, not n (measured: the shared-JVM
    *   mode loses a uniform ~25% at local[4] vs local[1] across ALL
    *   stages — allocation-rate-driven STW pauses stopping 4 task
    *   threads at once — an artifact real multi-executor clusters don't
    *   have);
    * - per-executor memory is CONSTANT across levels (scaling a real
    *   cluster adds executors, it doesn't grow them), so total memory
    *   scales with the level exactly as 4× executors would;
    * - data crosses executor boundaries through real shuffle
    *   serialization + local sockets, not in-process array handoff.
    */
  private val localCluster = sys.env.contains("GRAFT_SCALING_LOCAL_CLUSTER")

  /** Where this class's own bytecode lives (sbt classes dir or the
    * packaged app jar) — shipped to executor JVMs via extraClassPath. */
  private def codeSourcePath: String =
    new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath

  private def session(cores: Int): SparkSession = {
    val master =
      if (localCluster) s"local-cluster[$cores,1,6144]" else s"local[$cores]"
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$cores")
    if (localCluster) b
      .config("spark.executor.memory", "6g")
      // application classes for the spawned executor JVMs (the driver runs
      // from sbt's classpath; executors are launched by the worker from
      // SPARK_HOME and only see spark jars unless told otherwise). Derive
      // the path from this class's own code source — hardcoding the repo
      // path broke (or silently ran stale classes) when launched from a
      // packaged jar or a relocated checkout.
      .config("spark.executor.extraClassPath", codeSourcePath)
      // small CONSTANT per-executor GC/JIT capacity (a real executor's
      // aux threads don't grow when the cluster scales out; unpinned,
      // each 1-core executor JVM would size them from all 32 physical
      // cores of the box)
      .config("spark.executor.extraJavaOptions",
        "-XX:ParallelGCThreads=2 -XX:ConcGCThreads=1 -XX:CICompilerCount=2")
      // Locality wait is left at Spark's DEFAULT (3 s) — the config a
      // real spark-submit cluster runs with — unless GRAFT_LOCALITY_WAIT
      // overrides it. Measured tradeoff on this box (2M pages):
      //  - default: at 16 one-core executors the 64-task stages stall on
      //    cache-locality waits (tasks idle ~5 s on 70 KiB inputs, 94% of
      //    CPUs idle, the whole level 15× slower) — an artifact of 4
      //    tasks/executor/stage, which a real 16-node cluster with the
      //    same partitioning would also exhibit;
      //  - wait=0: level 16 drops to its true ~48 s, but level 4 pays
      //    ~+30% because tasks scheduled off the caching executor
      //    serialize cached blocks over loopback — a cost locality
      //    scheduling (and a real cluster) avoids.
      // The criterion pair (1 vs 4) is therefore measured under the
      // default; GRAFT_LOCALITY_WAIT=0 is used for the supplementary
      // 16-executor point, with both configs reported verbatim.
      .config("spark.locality.wait",
        sys.env.getOrElse("GRAFT_LOCALITY_WAIT", "3s"))
    val s = b
      // FIXED across levels: on a real cluster shuffle.partitions does not
      // change when the executor count does, and scaling it with cores
      // biases the comparison (at 2 partitions a 500k-page shuffle spills,
      // inflating T_N and yielding a bogus super-linear efficiency).
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off for the measurement: this pipeline sizes every shuffle
      // explicitly (see Pipeline), so AQE contributes only its per-stage
      // driver replanning latency — a CONSTANT serial cost that biases
      // the faster (4N) level. Measured at 2M pages, 2-vs-8 cores:
      // efficiency 0.66 with AQE, 0.68 without, both levels faster without.
      .config("spark.sql.adaptive.enabled", "false")
      // a broadcast side's upstream computation is serial at local[1] and
      // can exceed the default 300 s — the timeout exists to catch hung
      // executors on a real cluster, not slow-but-progressing local runs
      .config("spark.sql.broadcastTimeout", "36000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class Level(cores: Int, seconds: Double, pairsPerSec: Double,
      pagesPerSec: Double)

  def runAt(cores: Int, nPages: Long, nEntities: Int): Level = {
    // stale checkpoints from an earlier invocation would satisfy
    // latestLabels() with OLD labels if this run converges in fewer
    // iterations — always start each level from an empty workDir
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"/tmp/graft_scaling_$cores"))
    val spark = session(cores)
    try {
      // JIT/codegen warmup on a small corpus so the measured run is steady-state
      Pipeline.runPipeline(spark, Pipeline.Config(nPages = 500, nEntities = 100,
        workDir = s"/tmp/graft_scaling_warm_$cores", collectStats = false))
      val cfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
        workDir = s"/tmp/graft_scaling_$cores", collectStats = false)
      // min-of-2: single runs on a shared box are contention-noisy
      var best = Double.MaxValue
      // only the candidate-pair COUNT survives the loop (a Long, already
      // materialized inside the run) — every rep's persisted frames are
      // released before the next rep so rep 2 isn't timed against rep 1's
      // mention-scale cached blocks, and no kept frame can reference the
      // checkpoint files the next rep's fresh run cleans and rewrites
      var candPairs = -1L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        val o = Pipeline.runPipeline(spark, cfg)
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
        candPairs = o.stats.candidatePairs
        Pipeline.release(o)
      }
      // F1 is NOT evaluated per level: the label outputs are asserted
      // bit-identical across every level below, so the (expensive,
      // untimed) labeled-pair evaluation runs ONCE in the combine session
      // — evaluating it at local[1] burned ~45 min of wall for a number
      // already known from the other levels.
      Level(cores, best, candPairs / best, nPages / best)
    } finally {
      spark.stop()
      // allow a fresh master for the next level in the same JVM
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 2000000L
    val nEntities = if (args.length > 1) args(1).toInt else 80000
    val levels =
      if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 4, 16)
    require(levels.size >= 2 || sys.env.contains("GRAFT_SCALING_NO_EVAL"),
      "need at least two parallelism levels to compute scaling efficiency " +
        "(or set GRAFT_SCALING_NO_EVAL for single-level re-sampling runs)")
    val results = levels.map(c => runAt(c, nPages, nEntities))

    // Re-sampling mode for contended windows: this box shows up to 8×
    // same-code run-to-run variance when a co-tenant VM lands on the host
    // (measured: local[16] blocking 84 s then 653 s back-to-back). Levels
    // are re-run in extra invocations spread in time and combined by
    // per-level MIN across invocations (the least-contended estimate);
    // the expensive eval + cross-level identity check already ran in the
    // first invocation and stays valid (labels are deterministic).
    if (sys.env.contains("GRAFT_SCALING_NO_EVAL")) {
      def lj(l: Level): String =
        f"""{"cores":${l.cores},"seconds":${l.seconds}%.2f,"pairs_per_sec":${l.pairsPerSec}%.0f,""" +
          f""""pages_per_sec":${l.pagesPerSec}%.0f}"""
      println(
        f"""{"bench":"er_scaling_levels","pages":$nPages,"entities":$nEntities,""" +
          s""""levels":[${results.map(lj).mkString(",")}]}""")
      return
    }
    val lo = results(0)
    val hi = results(1)
    val eff = (lo.seconds / hi.seconds) / (hi.cores.toDouble / lo.cores)

    // Combine session (widest level): identical-output assertion across
    // every parallelism level (north_rule equivalence) + ONE pairwise-F1
    // evaluation — valid for all levels because the labels are identical.
    val spark = session(levels.max)
    val first = spark.read.parquet(latestLabels(s"/tmp/graft_scaling_${levels.head}"))
    val identical = levels.tail.forall { c =>
      val l = spark.read.parquet(latestLabels(s"/tmp/graft_scaling_$c"))
      first.exceptAll(l).isEmpty && l.exceptAll(first).isEmpty
    }
    val evalCfg = Pipeline.Config(nPages = nPages, nEntities = nEntities,
      workDir = "/tmp/graft_scaling_eval", collectStats = false)
    val out = Pipeline.runPipeline(spark, evalCfg)
    val truth = Pipeline.withMentionIds(
      Corpus.truth(spark, nPages, nEntities, evalCfg.seed).toDF())
    val eval = Pipeline.evaluateWeighted(
      out.pairs, out.strings, out.membership, truth, out.stringLabels)
    spark.stop()

    def levelJson(l: Level): String =
      f"""{"cores":${l.cores},"seconds":${l.seconds}%.2f,"pairs_per_sec":${l.pairsPerSec}%.0f,""" +
        f""""pages_per_sec":${l.pagesPerSec}%.0f}"""
    println(
      f"""{"bench":"er_scaling","pages":$nPages,"entities":$nEntities,""" +
        s""""levels":[${results.map(levelJson).mkString(",")}],""" +
        f""""criterion_pair":[${lo.cores},${hi.cores}],"scaling_efficiency":$eff%.3f,""" +
        f""""f1":${eval.f1}%.5f,"labeled_pairs":${eval.labeledPairs},""" +
        s""""identical_clusters":$identical}""")
  }

  private def latestLabels(dir: String): String = {
    val iters = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.startsWith("labels_iter_") && !n.endsWith(".jsonl"))
      .flatMap(n => scala.util.Try(n.stripPrefix("labels_iter_").toInt).toOption)
    s"$dir/labels_iter_${iters.max}"
  }
}
