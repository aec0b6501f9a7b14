package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data MIXING primitive:
  * every large-corpus pipeline downsamples strata (language, source,
  * quality band) to target proportions, and doing it by HASH instead of
  * rand() makes the sample reproducible across runs, engines, and
  * resumes (the same property the rest of this repo gets from
  * content-hash ids). A document survives iff
  * `hash(doc_id, stratum-seed) mod 1000 < rate_permille(stratum)` — one
  * map-side predicate, no shuffle, no state; rates change = only the
  * predicate changes. This is the CCNet/Dolma-style subsampling shape
  * re-expressed as a pushdown-friendly filter.
  */
object Sampling {
  import Tables.load
  import org.apache.spark.sql.Column

  /** Per-stratum seeds — THE single definition; q53, q60, and q61 all
    * sample with these so the composed pipeline provably agrees with
    * the standalone samplers (the oracles mirror the same CASE). */
  private[ops] def strataSeed(lang: Column): Column =
    when(lang === "en", 11L)
      .when(lang === "de", 23L)
      .when(lang === "zh", 37L)
      .otherwise(51L)

  /** Per-stratum token budgets shared by q60 and q61 (zh oversized to
    * exercise the keep-all clamp). */
  private[ops] def tokenBudget(lang: Column): Column =
    when(lang === "en", 2500L)
      .when(lang === "de", 2000L)
      .when(lang === "zh", 999999L)
      .otherwise(800L)

  /** Overflow-safe Knuth multiplicative bucket — THE single definition
    * (three call sites: q53/q60/q61; commit 63f403b had to patch every
    * copy of the pre-fix form, hence the extraction). doc_id is reduced
    * mod 2^31 BEFORE the multiply so the i64 product is bounded by
    * (2^31 + 51) · 2654435761 ≈ 5.7e18 < 2^63 — without the reduction,
    * doc_id ≳ 3.47e9 overflows signed 64-bit, which Spark (non-ANSI)
    * wraps silently while DuckDB raises, silently breaking the
    * cross-engine reproducibility this operator exists for exactly at
    * web scale. (Reducing mod 2^32, the obvious fix, still overflows:
    * (2^32 − 1) · 2654435761 ≈ 1.14e19 > Long.MaxValue.) Same survivor
    * set for all doc_id < 2^31. */
  private[ops] def knuthBucket(id: Column, seed: Column): Column =
    ((id % 2147483648L + seed) * 2654435761L) % 4294967296L % 1000L

  /** q53: per-language permille rates over documents (en 250, de 500,
    * zh 900, everything else 100), Knuth multiplicative 32-bit hash with
    * a per-stratum seed so strata sample independently. All BIGINT
    * arithmetic — exact in any engine (production would swap in
    * xxhash64; the mixing algebra is identical). Output keeps the bucket
    * so the oracle cross-checks the hash, the stratum rate AND the
    * survivor set. */
  def q53StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
    val rate = when(col("lang") === "en", 250L)
      .when(col("lang") === "de", 500L)
      .when(col("lang") === "zh", 900L)
      .otherwise(100L)
    val bucket = knuthBucket(col("doc_id"), strataSeed(col("lang")))
    d.select(col("doc_id"), col("lang"), rate.as("rate_permille"),
        bucket.as("bucket"))
      .filter(col("bucket") < col("rate_permille"))
  }

  /** q60: TOKEN-budgeted stratified sampling — mixing recipes budget
    * TOKENS, not documents (a 250‰ doc rate over a long-doc stratum
    * over-serves it). Per stratum the rate is DERIVED from a token-count
    * rollup: `rate‰ = min(1000, budget_tokens · 1000 div total_tokens)`
    * (zh's oversized budget exercises the keep-all clamp). The rollup is
    * one tiny partial-agg exchange (#langs rows) broadcast back onto the
    * corpus; the survivor path itself stays exactly q53's map-side
    * predicate — scan → broadcast-hash-join → filter, NO new shuffle on
    * the data. All-BIGINT algebra (`div`), the same overflow-safe Knuth
    * hash and per-stratum seeds as q53, so the survivor set is
    * reproducible across runs, engines, and resumes.
    *
    * Expected tokens kept ≈ Σ n_tokens·rate/1000 ≈ budget per stratum
    * (hash sampling is doc-granular; a token-exact cut would need an
    * order-dependent running sum — not reproducible under re-partition). */
  def q60TokenBudgetSample(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(graft.functions.normalize_text(col("text")), " "))
          .cast("long").as("n_tokens"))
    val rates = d.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("total_tokens"))
      .withColumn("budget_tokens", tokenBudget(col("lang"))) // zh: clamp
      .withColumn("rate_permille",
        least(lit(1000L), expr("budget_tokens * 1000 div total_tokens")))
    val bucket = knuthBucket(col("doc_id"), strataSeed(col("lang")))
    d.join(broadcast(rates), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("total_tokens"), col("rate_permille"), bucket.as("bucket"))
      .filter(col("bucket") < col("rate_permille"))
  }

  val oracles: Map[String, String] = Map(
    // q60: tokenization is the q59-proven regex mirror of normalize_text
    // on this corpus; rate derivation and hash algebra all-BIGINT
    "q60_token_budget_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[,;\-/().]', ' ', 'g'), '  +', ' ', 'g')), ' '))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |rates AS (
        |  SELECT lang, sum(n_tokens) AS total_tokens,
        |    CAST(CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 2000
        |         WHEN 'zh' THEN 999999 ELSE 800 END AS BIGINT) AS budget_tokens
        |  FROM toks GROUP BY 1),
        |j AS (
        |  SELECT t.doc_id, t.lang, t.n_tokens, r.total_tokens,
        |    least(1000, r.budget_tokens * 1000 // r.total_tokens) AS rate_permille,
        |    ((t.doc_id % 2147483648 + CASE t.lang WHEN 'en' THEN 11
        |        WHEN 'de' THEN 23 WHEN 'zh' THEN 37 ELSE 51 END)
        |      * 2654435761) % 4294967296 % 1000 AS bucket
        |  FROM toks t JOIN rates r USING (lang))
        |SELECT doc_id, lang, n_tokens,
        |  CAST(total_tokens AS BIGINT) AS total_tokens,
        |  CAST(rate_permille AS BIGINT) AS rate_permille,
        |  CAST(bucket AS BIGINT) AS bucket
        |FROM j WHERE bucket < rate_permille""".stripMargin,
    "q53_stratified_sample" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500
        |         WHEN 'zh' THEN 900 ELSE 100 END AS BIGINT) AS rate_permille,
        |    ((doc_id % 2147483648 + CASE lang WHEN 'en' THEN 11 WHEN 'de' THEN 23
        |        WHEN 'zh' THEN 37 ELSE 51 END) * 2654435761)
        |      % 4294967296 % 1000 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, rate_permille, CAST(bucket AS BIGINT) AS bucket
        |FROM s WHERE bucket < rate_permille""".stripMargin
  )
}
