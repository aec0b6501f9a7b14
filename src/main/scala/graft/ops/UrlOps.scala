package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL operators for Common-Crawl-style corpora: host extraction,
  * registrable-domain (PLD) derivation, tracking-parameter-stripping
  * canonicalization, and host-level grouping — the primitives behind
  * URL-level dedup and per-site quality aggregation in web-scale
  * training-data pipelines. Built entirely on Spark's native `parse_url`
  * / array functions (codegen, no UDFs); the PLD rule here is the
  * two-label suffix (a public-suffix list lookup slots in as a broadcast
  * join against the same column at production scale).
  */
object UrlOps {
  import Tables.load

  /** Driver query: a deterministic URL is synthesized per document
    * (www/apex host split by doc parity, per-lang TLD, default :443 port,
    * utm_* tracking params interleaved with real ones, a fragment), then
    * host / PLD / canonical form are recovered from the URL STRING alone
    * with parse_url + array ops. Canonicalization: scheme+host preserved,
    * default port dropped, utm_* params removed (order of the rest kept),
    * fragment dropped. The oracle reconstructs every output column
    * directly from the source columns — it never parses the URL — so a
    * wrong parse offset, port or param rule diverges and fails the gate.
    * docs_in_pld is the host-level grouping every per-site signal
    * aggregates over — computed as `groupBy(pld).count()` + equi-join back
    * rather than `count(*) OVER (PARTITION BY pld)`: PLDs are Zipf-hot on
    * any Common-Crawl-shaped corpus (wikipedia.org, blogspot.com), and an
    * unframed window materializes the whole hot partition in one task,
    * while partial aggregation absorbs the skew map-side and the join
    * back is an ordinary shuffled (or AQE-broadcast) hash join. */
  def q47UrlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
    val did = col("doc_id").cast("string")
    val tld = when(col("lang") === "de", "de")
      .when(col("lang") === "es", "es")
      .when(col("lang") === "zh", "cn")
      .otherwise("org")
    val hostS = concat(
      when(col("doc_id") % 2 === 0, "www.").otherwise(""),
      col("source"), lit(".example."), tld)
    val url = concat(lit("https://"), hostS, lit(":443/docs/"), did,
      lit("?b="), did, lit("&utm_source=feed&a=1&utm_campaign=x#sec"), did)

    // ---- recovery from the URL string alone ----
    val host = parse_url(col("url"), lit("HOST"))
    val labels = split(host, "\\.")
    val pld = concat(element_at(labels, -2), lit("."), element_at(labels, -1))
    // coalesce: a query-less URL yields NULL from parse_url(QUERY); without
    // it the whole canonical column null-propagates instead of falling back
    // to scheme+host+path.
    val keptParams = coalesce(array_join(
      filter(split(parse_url(col("url"), lit("QUERY")), "&"),
        p => !p.startsWith("utm_")), "&"), lit(""))
    val canonical = concat(lit("https://"), host,
      parse_url(col("url"), lit("PATH")),
      when(keptParams === "", "").otherwise(concat(lit("?"), keptParams)))

    val parsed = d.select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), host.as("host"), pld.as("pld"),
        canonical.as("canonical"))
    val pldCounts = parsed.groupBy(col("pld"))
      .agg(count(lit(1)).as("docs_in_pld"))
    parsed.join(pldCounts, "pld")
      .select(col("doc_id"), col("host"), col("pld"), col("canonical"),
        col("docs_in_pld"))
  }

  val oracles: Map[String, String] = Map(
    // every column reconstructed from the source columns — the oracle
    // never parses a URL, so it cross-checks the parse instead of
    // re-running it
    "q47_url_normalize" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END || source ||
        |      '.example.' ||
        |      CASE lang WHEN 'de' THEN 'de' WHEN 'es' THEN 'es'
        |                WHEN 'zh' THEN 'cn' ELSE 'org' END AS host
        |  FROM documents)
        |SELECT doc_id, host,
        |  regexp_extract(host, '([^.]+[.][^.]+)$', 1) AS pld,
        |  'https://' || host || '/docs/' || CAST(doc_id AS VARCHAR) ||
        |    '?b=' || CAST(doc_id AS VARCHAR) || '&a=1' AS canonical,
        |  count(*) OVER (
        |    PARTITION BY regexp_extract(host, '([^.]+[.][^.]+)$', 1))
        |    AS docs_in_pld
        |FROM h""".stripMargin
  )
}
