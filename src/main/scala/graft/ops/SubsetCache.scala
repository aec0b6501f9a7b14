package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/** §2.10 subset-reuse cache, re-expressed for batch
  * (/root/reference/include/adr/cache.h:52-108, used at
  * /root/reference/src/typeahead.cc:392-402).
  *
  * The reference's typeahead keeps an LRU of match-count vectors keyed by
  * the query's gram SET; when a keystroke extends the query, it finds the
  * largest cached subset and joins ONLY the missing grams' postings,
  * adding onto the cached counts. That is an algebraic identity over
  * distinct gram sets — for a prefix-extended query, G_prefix ⊆ G_full, so
  *
  *   |G_full ∩ N| = |G_prefix ∩ N| + |(G_full ∖ G_prefix) ∩ N|
  *
  * and the Spark-native form of the cache is exactly that DAG: the
  * previous query's count frame is the cached vector (persisted / written
  * by the prior run), and the new query joins postings only for
  * `array_except(grams(full), grams(prefix))` — the delta keystrokes'
  * windows. q44 drives the whole identity end-to-end: the driver's DuckDB
  * oracle computes the full-query counts FROM SCRATCH, while Spark only
  * ever joins prefix postings and delta postings separately and merges —
  * a hash match proves the subset-cache reuse is exact, not approximate.
  *
  * At scale this is the shape that matters: the delta gram set is O(chars
  * typed since the cached entry) regardless of query length, so the
  * incremental pass touches a constant number of posting lists where the
  * from-scratch pass touches all |G_full| of them.
  */
object SubsetCache {
  import Tables.load

  /** Incremental candidate counts for prefix-extended queries.
    * Entities = interned lowercase part names with distinct space-free
    * trigram postings under the hot-gram cap (the q13 blocking corpus);
    * queries = every even-id name of length ≥ 8, "typed" in two steps:
    * the first 5 characters (the cached state) and then the full string.
    * Output: (query_id, name_id, shared) for candidates
    * passing the reference mmc gate (typeahead.cc:409) on the FULL
    * query — computed without ever joining the full gram set. */
  def q44SubsetCache(spark: SparkSession, dir: String): DataFrame = {
    val interned = load(spark, dir, "part")
      .groupBy(lower(col("p_name")).as("name"))
      .agg(min(col("p_partkey")).cast("long").as("name_id"))
    val g = interned.select(col("name_id"),
      explode(gf.trigram_strings(col("name"))).as("gram"))
    // hot-gram cap (scale rule, mirrored in the oracle): grams carried by
    // a single name match nothing; grams above MaxBlock are stopword-like
    val kept = g.groupBy(col("gram")).agg(count(lit(1)).as("gcnt"))
      .filter(col("gcnt").between(2, Dedup.MaxBlock))
      .select(col("gram"))
    val postings = g.join(kept, Seq("gram"))

    val queries = interned
      .filter(length(col("name")) >= 8 && col("name_id") % 2 === 0)
      .select(col("name_id").as("query_id"), col("name").as("full"),
        substring(col("name"), 1, 5).as("prefix"))
    // ---- the CACHED vector: the prefix query's count frame, exactly what
    // the reference stores (cache.h:64-79). In a live session this frame
    // is the persisted output of the previous keystroke's run.
    val cached = queries
      .select(col("query_id"), explode(gf.trigram_strings(col("prefix"))).as("gram"))
      .join(postings, Seq("gram"))
      .groupBy(col("query_id"), col("name_id"))
      .agg(count(lit(1)).as("c0"))
    // ---- the DELTA: only the grams the new keystrokes introduced
    // (typeahead.cc:397-401 joins exactly these posting lists on a hit)
    val delta = queries
      .select(col("query_id"), explode(array_except(
        gf.trigram_strings(col("full")),
        gf.trigram_strings(col("prefix")))).as("gram"))
      .join(postings, Seq("gram"))
      .groupBy(col("query_id"), col("name_id"))
      .agg(count(lit(1)).as("c1"))
    // ---- merge: cached + delta ≡ from-scratch counts over G_full
    val nQ = queries.select(col("query_id"),
      size(gf.trigram_strings(col("full"))).as("n_q"))
    cached.join(delta, Seq("query_id", "name_id"), "full_outer")
      .select(col("query_id"), col("name_id"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("c1"), lit(0L))).as("shared"))
      .join(nQ, Seq("query_id"))
      .filter(col("shared") >=
        (lit(2) + floor(col("n_q") / (lit(4) + floor(col("n_q") / lit(10))))).cast("long"))
      .select(col("query_id"), col("name_id"), col("shared"))
  }

  /** From-scratch counts over the full gram set — the independent witness
    * the incremental path must equal (used by SubsetCacheSpec; the
    * driver's DuckDB oracle recomputes the same thing in SQL). */
  private[graft] def fromScratch(spark: SparkSession, dir: String): DataFrame = {
    val interned = load(spark, dir, "part")
      .groupBy(lower(col("p_name")).as("name"))
      .agg(min(col("p_partkey")).cast("long").as("name_id"))
    val g = interned.select(col("name_id"),
      explode(gf.trigram_strings(col("name"))).as("gram"))
    val kept = g.groupBy(col("gram")).agg(count(lit(1)).as("gcnt"))
      .filter(col("gcnt").between(2, Dedup.MaxBlock))
      .select(col("gram"))
    val postings = g.join(kept, Seq("gram"))
    val queries = interned
      .filter(length(col("name")) >= 8 && col("name_id") % 2 === 0)
      .select(col("name_id").as("query_id"), col("name").as("full"))
    val nQ = queries.select(col("query_id"),
      size(gf.trigram_strings(col("full"))).as("n_q"))
    queries
      .select(col("query_id"), explode(gf.trigram_strings(col("full"))).as("gram"))
      .join(postings, Seq("gram"))
      .groupBy(col("query_id"), col("name_id"))
      .agg(count(lit(1)).as("shared"))
      .join(nQ, Seq("query_id"))
      .filter(col("shared") >=
        (lit(2) + floor(col("n_q") / (lit(4) + floor(col("n_q") / lit(10))))).cast("long"))
      .select(col("query_id"), col("name_id"), col("shared"))
  }

  val oracles: Map[String, String] = Map(
    "q44_subset_cache" ->
      // from-scratch full-query counts: the oracle never sees the
      // prefix/delta split — agreement proves the cache identity
      """WITH interned AS (
        |  SELECT lower(p_name) AS name, CAST(min(p_partkey) AS BIGINT) AS name_id
        |  FROM part GROUP BY 1),
        |g AS (
        |  SELECT DISTINCT t.name_id, substr(t.name, i.i, 3) AS gram
        |  FROM interned t, LATERAL (SELECT unnest(generate_series(1, len(t.name) - 2)) AS i) i
        |  WHERE len(t.name) >= 3 AND substr(t.name, i.i, 3) NOT LIKE '% %'),
        |kf AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 256),
        |gk AS (SELECT g.name_id, g.gram FROM g JOIN kf USING (gram)),
        |q AS (SELECT name_id AS query_id, name AS full FROM interned
        |      WHERE len(name) >= 8 AND name_id % 2 = 0),
        |qg AS (
        |  SELECT DISTINCT q.query_id, substr(q.full, i.i, 3) AS gram
        |  FROM q, LATERAL (SELECT unnest(generate_series(1, len(q.full) - 2)) AS i) i
        |  WHERE substr(q.full, i.i, 3) NOT LIKE '% %'),
        |nq AS (SELECT query_id, count(*) AS n_q FROM qg GROUP BY 1),
        |counts AS (
        |  SELECT qg.query_id, gk.name_id, count(*) AS shared
        |  FROM qg JOIN gk USING (gram) GROUP BY 1, 2)
        |SELECT c.query_id, c.name_id, c.shared
        |FROM counts c JOIN nq ON nq.query_id = c.query_id
        |WHERE c.shared >= 2 + floor(nq.n_q / (4 + floor(nq.n_q / 10)))""".stripMargin
  )
}
