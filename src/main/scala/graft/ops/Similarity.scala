package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table: brute-force cosine top-k
  * (the exact baseline) and a coarse-quantizer (IVF-style) bucketed
  * variant (the 100 TB scale path: a fixed partition function prunes the
  * candidate set before the expensive distance computation — bucket-local
  * shuffles instead of a global cross join).
  */
object Similarity {
  import Tables.load

  /** Keep the parquet float arrays primitive (UnsafeArrayData) — CosineSim
    * promotes float→double per element exactly like a CAST, without the
    * boxing `transform` projection. */
  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("v"))

  private def cosine(va: Column, vb: Column): Column =
    graft.functions.cosine_sim(va, vb)

  /** Brute-force exact cosine top-10 for query vectors (vec_id < 5).
    * Deliberately a BroadcastNestedLoopJoin with the BOUNDED 5-row query
    * set as the build side — the exact-recall baseline that q25 (LSH) and
    * q27 (IVF) are measured against; cost is one linear scan of the
    * corpus per batch of queries, which is the optimal exact plan. */
  def q26CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(load(spark, dir, "embeddings"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("vq"))
    val c = e.select(col("vec_id"), col("v"))
    q.crossJoin(c).filter(col("qid") =!= col("vec_id"))
      .withColumn("cosine", cosine(col("vq"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), round(col("cosine"), 5).as("cosine"), col("rnk"))
  }

  /** IVF-style bucketed ANN: coarse cell = sign bits of dims 0..2 (a fixed
    * 8-cell quantizer). Queries only scan their own cell — the scale path
    * trades recall for a 8x (k-cell) candidate cut; verified against the
    * same cell-restricted exact ranking. */
  def q27AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(load(spark, dir, "embeddings"))
      .withColumn("bucket",
        (element_at(col("v"), 1) > 0).cast("int") * 4 +
          (element_at(col("v"), 2) > 0).cast("int") * 2 +
          (element_at(col("v"), 3) > 0).cast("int"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("bucket"))
    val c = e.select(col("vec_id"), col("v"), col("bucket"))
    q.join(c, Seq("bucket")) // bucket-local candidates only
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cosine", cosine(col("vq"), col("v")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("bucket"), col("vec_id"),
        round(col("cosine"), 5).as("cosine"), col("rnk"))
  }

  val oracles: Map[String, String] = Map(
    "q26_cosine_topk" ->
      """WITH p AS (
        |  SELECT q.vec_id AS qid, c.vec_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cos_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |SELECT qid, vec_id, round(cos_raw, 5) AS cosine, rnk FROM (
        |  SELECT qid, vec_id, cos_raw,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id) AS INT) AS rnk
        |  FROM p) WHERE rnk <= 10""".stripMargin,
    "q27_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    CAST(embedding[1] > 0 AS INT) * 4 + CAST(embedding[2] > 0 AS INT) * 2
        |      + CAST(embedding[3] > 0 AS INT) AS bucket
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS qid, q.bucket, c.vec_id,
        |    list_cosine_similarity(q.v, c.v) AS cos_raw
        |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < 20 AND q.vec_id <> c.vec_id)
        |SELECT qid, bucket, vec_id, round(cos_raw, 5) AS cosine, rnk FROM (
        |  SELECT qid, bucket, vec_id, cos_raw,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id) AS INT) AS rnk
        |  FROM p) WHERE rnk <= 5""".stripMargin
  )
}
