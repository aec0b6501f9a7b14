package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Connected components as a standalone operator (the union-find /
  * transitive-closure analogue of the reference's duplicate merging,
  * generalized per north_rule). The in-query variant uses localCheckpoint
  * to cut lineage each iteration; the checkpoint-to-parquet variant for
  * resumable production runs lives in graft.er.Pipeline.cluster.
  */
object Components {
  import Tables.load

  /** Min-label propagation to fixpoint. vertices: (id); edges: (src, dst).
    *
    * Loop shape mirrors er.Pipeline.cluster: the neighbor-min and the self
    * label merge in ONE aggregate (union + groupBy min — no changed-flag
    * left join), TWO propagation steps amortize each checkpoint, and
    * convergence is "sum(label) unchanged" (labels only decrease under
    * min-propagation) — a tiny agg over the just-checkpointed frame
    * instead of a full `filter(changed).isEmpty` recompute. Driver
    * actions per round: 2 (checkpoint + cached-scan agg) vs 3 full-lineage
    * actions before.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = vertices.sparkSession
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .persist()
    // Size the loop's shuffle width from the DATA (same rule as
    // er.Pipeline.cluster): the match graph is far smaller than its source
    // tables, and every round pays per-task scheduling cost at the loop
    // width. The count also materializes the persisted edge table before
    // the first round.
    val edgeRows = und.count()
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Two regimes: big graphs get ≥ cores partitions (full scheduling
    // waves, ~2M rows/partition memory bound); tiny graphs get only as
    // many partitions as have ≥~512 rows of real work — scheduling 32
    // near-empty tasks per stage × 5 stages × round costs ~1 s/round of
    // pure task overhead on a 100-row graph.
    val loopParts = math.min(sessionParts.toLong, math.max(
      edgeRows / 2000000L + 1L,
      math.min(spark.sparkContext.defaultParallelism.toLong, edgeRows / 512L + 1L))).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0)
    def propagate(l: DataFrame): DataFrame =
      und.join(l.select(col("id").as("b"), col("label")), Seq("b"))
        .select(col("a").as("id"), col("label"))
        .unionByName(l)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
    try {
      // Only vertices TOUCHED by an edge can ever leave label = id under
      // min-propagation — the loop runs over the edge-induced subgraph
      // and untouched vertices join back as identity at the end. On
      // sparse match graphs (the common case: a 200k-vertex corpus with
      // tens of real duplicate edges) this shrinks every per-round
      // shuffle from corpus-sized to match-graph-sized (measured
      // 4.9 s → sub-second on q33 at sf0.1 with 10 edges), and at
      // 10^12 rows it is the difference between iterating over the
      // corpus and iterating over the duplicates.
      var labels = und.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint(true)
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val next = propagate(propagate(labels)).localCheckpoint(true)
        val curSum = labelSum(next)
        labels = next
        // sum-unchanged certifies the fixpoint one confirm round late; an
        // early-out probe (any edge still improvable?) after an advancing
        // round is one cheap job instead of a whole extra round (same
        // rationale as er.Pipeline.cluster's probe)
        converged = curSum.compareTo(prevSum) == 0 ||
          und.join(labels.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
            .join(labels.select(col("id").as("a"), col("label").as("la")), Seq("a"))
            .filter(col("lb") < col("la")).limit(1).isEmpty
        prevSum = curSum
        iter += 1
      }
      vertices.select(col("id"))
        .join(labels.withColumnRenamed("label", "touched_label"), Seq("id"), "left")
        .select(col("id"), coalesce(col("touched_label"), col("id")).as("label"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      und.unpersist()
    }
  }

  /** Star-contraction components: the production fast path for the
    * dedup-lifecycle graphs (q55), where verified near-dup components are
    * overwhelmingly CLIQUES/STARS (every member of a duplicate group
    * passes the pairwise Jaccard gate against the rest).
    *
    * Phase 1 — min-neighbor star forest: parent(x) = min(neighbors ∪ x).
    * parent < x strictly for non-roots, so the map is an acyclic
    * DECREASING forest; pointer doubling (par ← par∘par, the same kernel
    * as er.Pipeline.forestLabels) reaches every root in ⌈log₂ depth⌉
    * rounds — for clique/star components depth is 1 and the loop exits
    * after one zero-advance round, vs the generic fixpoint's
    * propagate-propagate-checkpoint-agg per round.
    *
    * Phase 2 — residual contraction (what makes this ALWAYS bit-equal to
    * [[connectedComponents]], not a clique-only shortcut): an edge whose
    * endpoints landed in different trees ("two leaves of one center":
    * {1–3, 2–3} roots both 1 and 2) re-enters as a CONTRACTED edge
    * between labels; the generic loop then runs on the label graph —
    * usually EMPTY, and always ≤ the original graph, never larger. The
    * component min is itself always a root (it has no smaller neighbor),
    * so composing contracted labels over phase-1 labels yields exactly
    * min-member-id labels — ComponentsSpec proves bit-equality on
    * cliques, chains, the leaf-pair counterexample, and random graphs.
    *
    * Scale: phase 1 is one edge-sized aggregate plus log-depth
    * self-joins of an (id, par) frame — no per-round full-graph
    * propagate; at 10^12 docs the dedup graph's components are tiny and
    * phase 2 is empty, so the whole closure costs ~3 small shuffles. */
  def starContractedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .persist() // scoped: released in the finally below, not at harness drain
    // Size the loop's shuffle width from the DATA (same two-regime rule
    // as connectedComponents): the match graph is far smaller than its
    // source tables, and each doubling round's join/checkpoint/agg pays
    // per-task scheduling cost at the loop width — 32 near-empty tasks
    // per stage on a 100-row graph is ~1 s/round of pure overhead, and
    // tiny graphs are exactly this fast path's common case. The count
    // also materializes the persisted edge table before round 1.
    val edgeRows = und.count()
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.min(sessionParts.toLong, math.max(
      edgeRows / 2000000L + 1L,
      math.min(spark.sparkContext.defaultParallelism.toLong, edgeRows / 512L + 1L))).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
      val par0 = und.groupBy(col("a").as("id"))
        .agg(min(col("b")).as("nmin"))
        .select(col("id"), least(col("nmin"), col("id")).as("par"))
      var par = par0.localCheckpoint(true)
      var advanced = if (edgeRows == 0L) 0L else 1L
      while (advanced > 0L) {
        val jumped = par
          .join(par.select(col("id").as("par"), col("par").as("gpar")),
            Seq("par"), "left")
          .select(col("id"), coalesce(col("gpar"), col("par")).as("par"),
            (col("gpar").isNotNull && col("gpar") =!= col("par"))
              .cast("long").as("adv"))
          .localCheckpoint(true)
        advanced = jumped.agg(coalesce(sum(col("adv")), lit(0L)))
          .collect()(0).getLong(0)
        par = jumped.select(col("id"), col("par"))
      }
      val lab = par.select(col("id"), col("par").as("label"))
      // residual: edges crossing phase-1 trees, contracted to label space.
      // NO checkpoint: viol is consumed EAGERLY on both paths below (the
      // isEmpty probe; on the rare non-empty path the inner loop's own
      // edge count) while `und` is still persisted, and the RETURNED plan
      // never references it — the inner connectedComponents' result is
      // built from its own checkpoints plus `lab` (checkpointed above).
      // The former eager localCheckpoint was one whole extra job per
      // closure call to materialize a frame that is empty in the common
      // case.
      val viol = und
        .join(lab.select(col("id").as("a"), col("label").as("la")), Seq("a"))
        .join(lab.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
        .filter(col("la") =!= col("lb"))
        .select(col("la").as("src"), col("lb").as("dst")).distinct()
      val resolved =
        if (viol.isEmpty) lab
        else {
          val merged = connectedComponents(
            lab.select(col("label").as("id")).distinct(), viol)
          lab.join(
              merged.select(col("id").as("label"), col("label").as("mlabel")),
              Seq("label"))
            .select(col("id"), col("mlabel").as("label"))
        }
      // the result plan must not reference the about-to-be-unpersisted
      // edge frame: `resolved` is either `lab` (checkpointed) or
      // lab ⋈ merged, where merged is built from the inner loop's own
      // checkpoints plus lab — viol (the only und-derived frame here)
      // was consumed eagerly above, so the final join is safe after
      // release
      vertices.select(col("id"))
        .join(resolved.withColumnRenamed("label", "touched_label"), Seq("id"), "left")
        .select(col("id"), coalesce(col("touched_label"), col("id")).as("label"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      und.unpersist()
    }
  }

  /** Incremental cluster maintenance: merge a batch of NEW edges into an
    * existing labeling without re-clustering the full edge history.
    *
    * Under min-label propagation a component's label is its minimum
    * member id, so a prior labeling is a lossless contraction of the
    * prior edge set: the star {(id, label) | label ≠ id} reproduces
    * exactly the prior components, with depth 1. Clustering
    * (prior star ∪ new edges) therefore yields labels BIT-IDENTICAL to
    * re-clustering (all prior edges ∪ new edges) — but the loop input is
    * one row per previously-clustered vertex instead of the whole edge
    * history, and it converges in ~1 doubling round unless the new edges
    * chain many old components together (ComponentsSpec proves the
    * bit-equality both ways).
    *
    * This is the micro-batch companion of [[StreamOps.incrementalBlocking]]:
    * ingest streams pairs continuously, and each maintenance window folds
    * the new accepted edges into the persisted labels — the labels table
    * IS the checkpoint, same as er.Pipeline.cluster's resume contract.
    *
    * prior: (id, label) — a fixpoint of min-label propagation (labels
    * from [[connectedComponents]] / er.Pipeline.forestLabels qualify);
    * newEdges: (src, dst). Output: (id, label) covering prior ids ∪ new
    * edge endpoints. */
  def incrementalComponents(prior: DataFrame, newEdges: DataFrame): DataFrame = {
    val star = prior.filter(col("label") =!= col("id"))
      .select(col("id").as("src"), col("label").as("dst"))
    val vertices = prior.select(col("id"))
      .unionByName(newEdges.select(col("src").as("id")))
      .unionByName(newEdges.select(col("dst").as("id")))
      .distinct()
    // star ∪ new-edges is the IDEAL input for the star-contraction path:
    // the prior labeling is already depth-1 (every satellite points at
    // its component min), so phase 1 resolves it in one pointer-doubling
    // round and only the handful of NEW cross-component bridges reach
    // the residual label graph — labels stay bit-equal to the generic
    // fixpoint (ComponentsSpec proves both the equality and that
    // incremental == full re-clustering through this path)
    starContractedComponents(vertices,
      star.unionByName(newEdges.select(col("src"), col("dst"))))
  }

  /** Entity clusters over distinct part names: intern (D2 street-interning
    * analogue) → trigram blocking (A2/A3 filters) → JW ≥ 0.9 edges →
    * connected components; label = min reachable name_id. */
  def q33Components(spark: SparkSession, dir: String): DataFrame = {
    val (interned, edges) = nameGraph(spark, dir)
    starContractedComponents(interned.select(col("name_id").as("id")), edges)
      .select(col("id").as("name_id"), col("label"))
  }

  /** The q33 match graph as data: interned part names + JW-accepted
    * blocking edges (shared by q33 and the incremental variant q45). */
  private[graft] def nameGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val interned = Caches.persist(load(spark, dir, "part")
      .select(gf.normalize_text(col("p_name")).as("name"), col("p_partkey"))
      .groupBy(col("name")).agg(min(col("p_partkey")).as("name_id")))
      // referenced by the trigram index, the name join, AND the vertex set
      // — persist once instead of recomputing the scan+groupBy per branch;
      // registered with Caches so the harness releases it after the
      // query's sink action (q33 and q45 each build the graph)
    val withTris = interned
      .withColumn("tris", TextOps.trigramStrings(col("name")))
      .withColumn("n", size(col("tris")))
    val keyed = withTris.select(col("name_id"), col("n"), explode(col("tris")).as("gram"))
    // hot-gram cap (same rule + oracle mirror as q13/q23): no gram block
    // may expand quadratically at corpus scale
    val keptGrams = keyed.groupBy(col("gram"))
      .agg(count(lit(1)).as("gcnt"))
      .filter(col("gcnt").between(2, Dedup.MaxBlock))
      .select(col("gram"))
    val capped = keyed.join(keptGrams, Seq("gram"))
    val counted = capped.as("a").join(capped.as("b"),
        col("a.gram") === col("b.gram") && col("a.name_id") < col("b.name_id"))
      .groupBy(col("a.name_id").as("src"), col("b.name_id").as("dst"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("shared"))
    val minN = least(col("n1"), col("n2")).cast("int")
    val mmc = lit(2) + floor(minN / (lit(4) + floor(minN / lit(10))))
    val cand = counted.filter(col("shared") >= mmc.cast("long") &&
      (col("shared") * col("shared")).cast("double") >= lit(0.17) * col("n1") * col("n2"))
    val kv = interned.select(col("name_id"), col("name"))
    val edges = cand
      .join(kv.withColumnRenamed("name_id", "src").withColumnRenamed("name", "name_src"), Seq("src"))
      .join(kv.withColumnRenamed("name_id", "dst").withColumnRenamed("name", "name_dst"), Seq("dst"))
      .filter(gf.jaro_winkler(col("name_src"), col("name_dst")) >= 0.9)
      .select(col("src"), col("dst"))
    // the undirected expansion inside connectedComponents references the
    // edge frame twice — persist (harness-released) so blocking+JW runs once
    (interned, Caches.persist(edges))
  }

  /** Incremental maintenance, driver-checked (q45): the SAME match graph
    * as q33 arrives in two ingest windows — edges with even src+dst are
    * the "already clustered" history, odd ones are the maintenance
    * window's new batch. Spark clusters the history, then folds the new
    * batch in with [[incrementalComponents]]; the DuckDB oracle computes
    * components over ALL edges from scratch and never sees the split —
    * a hash match certifies incremental == full re-clustering on real
    * blocking/JW edges (ComponentsSpec proves it on synthetic graphs). */
  def q45IncrementalComponents(spark: SparkSession, dir: String): DataFrame = {
    val (interned, edges) = nameGraph(spark, dir)
    val oldEdges = edges.filter(pmod(col("src") + col("dst"), lit(2)) === 0)
    val newEdges = edges.filter(pmod(col("src") + col("dst"), lit(2)) === 1)
    val prior = starContractedComponents(
      interned.select(col("name_id").as("id")), oldEdges)
    incrementalComponents(prior, newEdges)
      .select(col("id").as("name_id"), col("label"))
  }

  private val componentsSql: String =
      """WITH RECURSIVE interned AS (
        |  SELECT lower(p_name) AS name, CAST(min(p_partkey) AS BIGINT) AS name_id
        |  FROM part GROUP BY 1),
        |g AS (
        |  SELECT DISTINCT t.name_id, substr(t.name, i.i, 3) AS gram
        |  FROM interned t, LATERAL (SELECT unnest(generate_series(1, len(t.name) - 2)) AS i) i
        |  WHERE len(t.name) >= 3 AND substr(t.name, i.i, 3) NOT LIKE '% %'),
        |n AS (SELECT name_id, count(*) AS n FROM g GROUP BY 1),
        |kf AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 256),
        |gk AS (SELECT g.name_id, g.gram FROM g JOIN kf USING (gram)),
        |counted AS (
        |  SELECT a.name_id AS src, b.name_id AS dst, count(*) AS shared
        |  FROM gk a JOIN gk b ON a.gram = b.gram AND a.name_id < b.name_id
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT src, dst FROM counted
        |  JOIN n n1 ON n1.name_id = src JOIN n n2 ON n2.name_id = dst
        |  WHERE shared >= 2 + floor(least(n1.n, n2.n) / (4 + floor(least(n1.n, n2.n) / 10)))
        |    AND CAST(shared * shared AS DOUBLE) >= 0.17 * n1.n * n2.n),
        |edges AS (
        |  SELECT src, dst FROM cand
        |  JOIN interned sa ON sa.name_id = src JOIN interned sb ON sb.name_id = dst
        |  WHERE jaro_winkler_similarity(sa.name, sb.name) >= 0.9),
        |undirected AS (
        |  SELECT src AS a, dst AS b FROM edges
        |  UNION ALL SELECT dst AS a, src AS b FROM edges),
        |reach(id, lab) AS (
        |  SELECT name_id, name_id FROM interned
        |  UNION
        |  SELECT u.b, r.lab FROM reach r JOIN undirected u ON u.a = r.id)
        |SELECT id AS name_id, CAST(min(lab) AS BIGINT) AS label
        |FROM reach GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q33_components" -> componentsSql,
    // q45's oracle is q33's verbatim: the oracle computes components over
    // the FULL edge set from scratch; only the Spark side splits the
    // edges into history + maintenance window. Identical output = the
    // incremental fold is exact.
    "q45_incremental_components" -> componentsSql
  )
}
