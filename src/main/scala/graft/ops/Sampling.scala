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
    val seed = when(col("lang") === "en", 11L)
      .when(col("lang") === "de", 23L)
      .when(col("lang") === "zh", 37L)
      .otherwise(51L)
    // Overflow-safe Knuth multiplicative hash: doc_id is reduced mod 2^31
    // BEFORE the multiply so the i64 product is bounded by
    // (2^31 + 51) · 2654435761 ≈ 5.7e18 < 2^63 — without the reduction,
    // doc_id ≳ 3.47e9 overflows signed 64-bit, which Spark (non-ANSI)
    // wraps silently while DuckDB raises, silently breaking the
    // cross-engine reproducibility this operator exists for exactly at
    // web scale. (Reducing mod 2^32, the obvious fix, still overflows:
    // (2^32 − 1) · 2654435761 ≈ 1.14e19 > Long.MaxValue.) Same survivor
    // set for all doc_id < 2^31.
    val bucket =
      ((col("doc_id") % 2147483648L + seed) * 2654435761L) % 4294967296L % 1000L
    d.select(col("doc_id"), col("lang"), rate.as("rate_permille"),
        bucket.as("bucket"))
      .filter(col("bucket") < col("rate_permille"))
  }

  val oracles: Map[String, String] = Map(
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
