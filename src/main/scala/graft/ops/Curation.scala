package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** q61: the COMPOSED training-data curation pipeline — the recipe a
  * production corpus actually runs end-to-end (CCNet/Dolma-style):
  * quality gate → exact dedup → near-dup dedup → token-budgeted
  * stratified sampling, emitted as ONE per-document lineage MANIFEST
  * with every stage's verdict as a column. Production pipelines keep
  * exactly this manifest (not just the survivor set) so every dropped
  * document is attributable to a stage and re-runs with changed
  * thresholds touch only downstream stages.
  *
  * Every stage is an already-audited shape reused verbatim:
  * q29's integer-permille quality score (gate at ≥ 550), q20's
  * md5-groupBy exact keeper, q55's full near-dup lifecycle (LSH →
  * Jaccard verify → star-contraction closure), q60's token-budget rate
  * derivation and overflow-safe Knuth hash — with the sampling rates
  * derived from the POOL that survived the three gates (budgets must
  * buy surviving tokens, not pre-dedup tokens). No new join shapes, no
  * new exchange beyond the stages' own: the composition is flag joins
  * on doc_id plus one #langs-row broadcast.
  *
  * `sampled` is the stratum-hash verdict for every doc (meaningful for
  * pool members; reported for all so the manifest is re-derivable);
  * `kept = in_pool AND sampled` is the final corpus membership. */
object Curation {
  import Tables.load

  val QualityGate = 550L

  def q61CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val quality = TextOps.q29Quality(spark, dir)
      .select(col("doc_id"), col("quality_pm"))
    val exact = docs
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .withColumn("exact_keeper",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .drop("h")
    val near = Dedup.q55DedupLifecycle(spark, dir)
      .select(col("doc_id"), col("keeper").as("near_keeper"),
        col("is_duplicate").as("is_near_dup"))
    val toks = docs.select(col("doc_id"),
      size(split(gf.normalize_text(col("text")), " "))
        .cast("long").as("n_tokens"))
    val base = exact
      .join(quality, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .join(toks, Seq("doc_id"))
      .withColumn("passed_quality", col("quality_pm") >= QualityGate)
      .withColumn("is_exact_dup", col("doc_id") =!= col("exact_keeper"))
      .withColumn("in_pool",
        col("passed_quality") && !col("is_exact_dup") && !col("is_near_dup"))
    // rates derive from the SURVIVOR pool's token totals (per-stratum
    // tiny aggregate, broadcast back — q60's exact shape); budgets,
    // seeds, and the overflow-safe bucket are Sampling's single
    // definitions so the composed pipeline provably agrees with the
    // standalone samplers
    val rates = base.filter(col("in_pool"))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("pool_tokens"))
      .withColumn("budget_tokens", Sampling.tokenBudget(col("lang")))
      .select(col("lang"),
        least(lit(1000L), expr("budget_tokens * 1000 div pool_tokens"))
          .as("rate_permille"))
    val bucket = Sampling.knuthBucket(col("doc_id"), Sampling.strataSeed(col("lang")))
    base.join(broadcast(rates), Seq("lang"), "left")
      .withColumn("rate_permille", coalesce(col("rate_permille"), lit(0L)))
      .withColumn("bucket", bucket)
      .withColumn("sampled", col("bucket") < col("rate_permille"))
      .select(col("doc_id"), col("lang"), col("quality_pm"),
        col("passed_quality"), col("exact_keeper"), col("is_exact_dup"),
        col("near_keeper"), col("is_near_dup"), col("n_tokens"),
        col("rate_permille"), col("bucket"), col("in_pool"),
        col("sampled"), (col("in_pool") && col("sampled")).as("kept"))
  }

  val oracles: Map[String, String] = Map(
    // q61: each stage's CTE is its own query's proven oracle mirror —
    // q29's quality (lower-split tokens), q20's exact keeper, q55's
    // LSH→Jaccard→recursive-closure block verbatim, q60's rate algebra
    // over the survivor pool
    "q61_curation_pipeline" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) i
        |  WHERE len(t) >= 3),
        |sig AS (
        |  SELECT doc_id, CAST(h AS INT) AS h, min(md5(shingle || ':' || h)) AS minhash
        |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) h
        |  GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, h // 2 AS band, min(minhash) || '|' || max(minhash) AS band_sig
        |  FROM sig GROUP BY 1, 2),
        |bkept AS (
        |  SELECT band, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 256),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        |  JOIN bkept k ON k.band = a.band AND k.band_sig = a.band_sig),
        |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
        |n AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
        |inter AS (
        |  SELECT p.src, p.dst, count(*) AS i
        |  FROM pairs p JOIN dsh a ON a.doc_id = p.src
        |  JOIN dsh b ON b.doc_id = p.dst AND a.shingle = b.shingle
        |  GROUP BY 1, 2),
        |verified AS (
        |  SELECT i.src, i.dst
        |  FROM inter i JOIN n na ON na.doc_id = i.src
        |  JOIN n nb ON nb.doc_id = i.dst
        |  WHERE CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) >= 0.4),
        |undirected AS (
        |  SELECT src AS a, dst AS b FROM verified
        |  UNION ALL SELECT dst AS a, src AS b FROM verified),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT u.b, r.lab FROM reach r JOIN undirected u ON u.a = r.id),
        |near AS (
        |  SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS near_keeper,
        |    min(lab) <> id AS is_near_dup
        |  FROM reach GROUP BY id),
        |q AS (
        |  SELECT doc_id,
        |    least(500, CAST(len(tokens) AS BIGINT) * 10)
        |      + least(500, CAST(len(list_filter(tokens,
        |          t -> t IN ('the','a','and','of','to','value','data'))) AS BIGINT)
        |        * 2500 // len(tokens)) AS quality_pm
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS tokens
        |        FROM documents)),
        |ex AS (
        |  SELECT doc_id, lang,
        |    min(doc_id) OVER (PARTITION BY md5(text)) AS exact_keeper
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[,;\-/().]', ' ', 'g'), '  +', ' ', 'g')), ' '))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |base AS (
        |  SELECT ex.doc_id, ex.lang, q.quality_pm,
        |    q.quality_pm >= 550 AS passed_quality,
        |    CAST(ex.exact_keeper AS BIGINT) AS exact_keeper,
        |    ex.doc_id <> ex.exact_keeper AS is_exact_dup,
        |    near.near_keeper, near.is_near_dup, tk.n_tokens,
        |    (q.quality_pm >= 550 AND ex.doc_id = ex.exact_keeper
        |      AND NOT near.is_near_dup) AS in_pool
        |  FROM ex JOIN q USING (doc_id) JOIN near USING (doc_id)
        |    JOIN tk USING (doc_id)),
        |rates AS (
        |  SELECT lang,
        |    least(1000, CAST(CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 2000
        |        WHEN 'zh' THEN 999999 ELSE 800 END AS BIGINT)
        |      * 1000 // sum(n_tokens)) AS rate_permille
        |  FROM base WHERE in_pool GROUP BY 1)
        |SELECT b.doc_id, b.lang, b.quality_pm, b.passed_quality,
        |  b.exact_keeper, b.is_exact_dup, b.near_keeper, b.is_near_dup,
        |  b.n_tokens,
        |  CAST(coalesce(r.rate_permille, 0) AS BIGINT) AS rate_permille,
        |  CAST(((b.doc_id % 2147483648 + CASE b.lang WHEN 'en' THEN 11
        |      WHEN 'de' THEN 23 WHEN 'zh' THEN 37 ELSE 51 END)
        |    * 2654435761) % 4294967296 % 1000 AS BIGINT) AS bucket,
        |  b.in_pool,
        |  ((b.doc_id % 2147483648 + CASE b.lang WHEN 'en' THEN 11
        |      WHEN 'de' THEN 23 WHEN 'zh' THEN 37 ELSE 51 END)
        |    * 2654435761) % 4294967296 % 1000
        |    < coalesce(r.rate_permille, 0) AS sampled,
        |  (b.in_pool AND ((b.doc_id % 2147483648 + CASE b.lang WHEN 'en' THEN 11
        |      WHEN 'de' THEN 23 WHEN 'zh' THEN 37 ELSE 51 END)
        |    * 2654435761) % 4294967296 % 1000
        |    < coalesce(r.rate_permille, 0)) AS kept
        |FROM base b LEFT JOIN rates r USING (lang)""".stripMargin
  )
}
