package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Training-data deduplication operators over `documents`:
  * exact (hash groupBy), MinHash signatures + LSH band pairs, SimHash,
  * n-gram Jaccard near-dup, embedding-cosine near-dup.
  *
  * All hash material is md5-based so the DuckDB oracle can reproduce the
  * exact values (md5 is identical in both engines); at production scale
  * the same shapes run with xxhash64 instead (cheaper, no hex strings).
  */
object Dedup {
  import Tables.load

  /** Exact dedup: one group per identical text. */
  def q20ExactDedup(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: word-3-shingles, 8 hash slots
    * (hash_h(s) = md5(s || ':' || h), min per slot). */
  def q21Minhash(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .withColumn("tokens", split(gf.normalize_text(col("text")), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingle", explode(transform(
        sequence(lit(1), size(col("tokens")) - 2),
        i => concat_ws(" ",
          element_at(col("tokens"), i),
          element_at(col("tokens"), i + 1),
          element_at(col("tokens"), i + 2)))))
      .withColumn("h", explode(sequence(lit(0), lit(7))))
    d.groupBy(col("doc_id"), col("h"))
      .agg(min(md5(concat(col("shingle"), lit(":"), col("h")))).as("minhash"))
  }

  /** LSH band buckets from the MinHash signature (4 bands × 2 rows);
    * near-dup candidate pairs = docs sharing any band signature. */
  def q22LshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = q21Minhash(spark, dir)
      .withColumn("band", floor(col("h") / 2))
    val bands = sig.groupBy(col("doc_id"), col("band"))
      .agg(concat_ws("|", min(col("minhash")), max(col("minhash"))).as("band_sig"))
    // block expansion instead of a self-join: the signature subtree (full
    // shingle + md5×8 pipeline) is computed ONCE, buckets become member
    // lists, pairs explode map-side (bucket sizes are tiny by design)
    bands.groupBy(col("band"), col("band_sig"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("src"), col("ids"))
      .select(col("src"), explode(col("ids")).as("dst"))
      .filter(col("src") < col("dst"))
      .distinct()
  }

  /** 32-bit SimHash over the token multiset (md5-hex bit decomposition —
    * reproducible in SQL; production uses xxhash64 bits). */
  def q24Simhash(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(gf.normalize_text(col("text")), " ")).as("token"))
      .withColumn("hx", md5(col("token")))
      .withColumn("b", explode(sequence(lit(0), lit(31))))
      .withColumn("hexdigit",
        expr("CAST(conv(substring(hx, CAST(floor(b / 4) AS INT) + 1, 1), 16, 10) AS INT)"))
      .withColumn("bit", expr("shiftright(hexdigit, CAST(b % 4 AS INT)) % 2"))
      .withColumn("contrib", col("bit") * 2 - 1)
    d.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bitval", when(col("s") > 0, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(bitval, b)")).as("simhash"))
  }

  /** Word-3-shingle Jaccard near-dup pairs over documents (≥ 0.1).
    * Shingle keys are high-entropy (unlike char trigrams over a small
    * vocabulary), so the shared-key self-join stays near-linear — the
    * scale-safe formulation. */
  def q23NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .withColumn("tokens", split(gf.normalize_text(col("text")), " "))
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("tokens")) - 2),
        i => concat_ws(" ",
          element_at(col("tokens"), i),
          element_at(col("tokens"), i + 1),
          element_at(col("tokens"), i + 2))))).as("shingle"))
    // One pass over documents: per-doc distinct shingle arrays hashed to
    // 64 bits (same pairs — collision odds ~1e-8 at this cardinality —
    // fixed-width shuffle keys), then block expansion per shingle hash
    // instead of a self-join, so the shingle subtree isn't recomputed.
    val perDoc = d.groupBy(col("doc_id"))
      .agg(collect_set(xxhash64(col("shingle"))).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    val blocks = perDoc.groupBy(col("sh"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ms"))
      .filter(size(col("ms")) >= 2)
    blocks
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("n1") + col("n2") - col("shared")), 6))
      .filter(col("jaccard") >= 0.1)
      .select(col("src"), col("dst"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs via the fused codegen CosineSim
    * expression (threshold for the synthetic embedding distribution). */
  def q25EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v")) // primitive float arrays
    val a = e.select(col("vec_id").as("src"), col("v").as("va"))
    val b = e.select(col("vec_id").as("dst"), col("v").as("vb"))
    a.crossJoin(b).filter(col("src") < col("dst"))
      .withColumn("cosine", round(gf.cosine_sim(col("va"), col("vb")), 5))
      .filter(col("cosine") >= 0.35)
      .select(col("src"), col("dst"), col("cosine"))
  }

  val oracles: Map[String, String] = Map(
    "q20_exact_dedup" ->
      """SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keeper,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q21_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) i
        |  WHERE len(t) >= 3)
        |SELECT doc_id, CAST(h AS INT) AS h,
        |  min(md5(shingle || ':' || h)) AS minhash
        |FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) AS h) h
        |GROUP BY 1, 2""".stripMargin,
    "q22_lsh_pairs" ->
      """WITH sh AS (
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
        |  FROM sig GROUP BY 1, 2)
        |SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id""".stripMargin,
    "q24_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, md5(unnest(string_split(lower(text), ' '))) AS hx
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, CAST(b AS INT) AS b,
        |    ((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
        |      >> CAST(b % 4 AS INT)) % 2 AS bit
        |  FROM tok, LATERAL (SELECT unnest(generate_series(0, 31)) AS b) b),
        |sums AS (
        |  SELECT doc_id, b, sum(bit * 2 - 1) AS s FROM bits GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
        |FROM sums GROUP BY 1""".stripMargin,
    "q23_ngram_jaccard" -> """WITH sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) i
        |  WHERE len(t) >= 3),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT src, dst,
        |  round(CAST(shared AS DOUBLE) / (n1.n + n2.n - shared), 6) AS jaccard
        |FROM p JOIN n n1 ON n1.doc_id = src JOIN n n2 ON n2.doc_id = dst
        |WHERE round(CAST(shared AS DOUBLE) / (n1.n + n2.n - shared), 6) >= 0.1""".stripMargin,
    "q25_embedding_neardup" ->
      """SELECT a.vec_id AS src, b.vec_id AS dst,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 5) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 5) >= 0.35""".stripMargin
  )
}
