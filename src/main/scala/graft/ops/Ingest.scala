package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's `for_each_name` ingestion shape as a driver-checked
  * query (/root/reference/src/typeahead.cc:49-77 + the language interner
  * get_or_create_lang_idx, :41-47): every OSM-ish object emits
  *
  *  - the 5 base name tags — name, old_name, alt_name, short_name,
  *    official_name — in that fixed call order, all in the DEFAULT
  *    language (id 0),
  *  - then the four `:<lang>`-suffixed prefix families — name:*,
  *    short_name:*, alt_name:*, official_name:* — in that family order,
  *    tags in tag-list order within a family,
  *  - every tag value `;`-split into one emission per token,
  *  - languages discovered dynamically and interned to dense ids
  *    (the reference's get_or_create over a hash map; ids skip 0 =
  *    default).
  *
  * Every multilingual import hits this on day one — it is the shape that
  * feeds D1-D3 string interning and the multilang area names.
  */
object Ingest {
  import Tables.load

  /** q51: synthesize a deterministic OSM-ish tag list per document row,
    * run the full for_each_name expansion, and intern discovered
    * languages. The output keeps the emission ORDER explicit as
    * (fam, sub, tok) — family rank, tag rank within family, `;`-token
    * index — so the oracle checks call order, multi-value splitting AND
    * the interned ids.
    *
    * Language interning, distributed: `get_or_create_lang_idx` assigns
    * ids by encounter order, which is nondeterministic under parallel
    * ingest; the Spark-native analogue is first-OCCURRENCE order — the
    * lexicographic min of (doc_id, fam, sub, tok) per language, ranked.
    * The ranked frame is #languages-sized (a few dozen on the whole
    * planet), so the global window and the broadcast join back are both
    * dim-sized — the same discipline as D1-D3 string interning. */
  def q51ForEachName(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
    val did = col("doc_id")
    val base = concat(col("source"), lit(" "), (did % 50).cast("string"))
    val src = col("source")
    // base tags (value NULL = tag absent; name is multi-valued for %4==0)
    val nameVal = when(did % 4 === 0, concat(base, lit(";"), base, lit(" ii")))
      .otherwise(base)
    def tag(fam: Int, sub: Int, lang: String, value: org.apache.spark.sql.Column) =
      struct(lit(fam).as("fam"), lit(sub).as("sub"),
        lit(lang).as("lang"), value.as("value"))
    val tags = array(
      tag(0, 0, "default", nameVal),
      tag(1, 0, "default", when(did % 3 === 0, concat(base, lit(" old")))),
      tag(2, 0, "default", when(did % 5 === 0, concat(base, lit(" alias")))),
      tag(3, 0, "default", when(did % 2 === 0, src)),
      tag(4, 0, "default", when(did % 7 === 0, concat(lit("the "), base))),
      tag(5, 0, "de", when(did % 2 === 1, concat(base, lit("stadt")))),
      tag(5, 1, "fr", when(did % 5 === 1, concat(base, lit("ville")))),
      tag(6, 0, "de", when(did % 6 === 0, concat(src, lit("st")))),
      tag(7, 0, "es", when(did % 9 === 0, concat(base, lit(" es")))),
      tag(8, 0, "bg", when(did % 11 === 0, concat(base, lit(" bg")))))

    val emitted = d
      .select(did, explode(filter(tags, t => t("value").isNotNull)).as("t"))
      .select(col("doc_id"), col("t.fam").as("fam"), col("t.sub").as("sub"),
        col("t.lang").as("lang"),
        posexplode(split(col("t.value"), ";")).as(Seq("tok", "name")))

    val langIds = emitted.filter(col("lang") =!= "default")
      .groupBy(col("lang"))
      .agg(min(struct(col("doc_id"), col("fam"), col("sub"), col("tok")))
        .as("first"))
      .withColumn("lang_id",
        row_number().over(Window.orderBy(col("first"), col("lang"))).cast("long"))
      .select(col("lang"), col("lang_id"))

    emitted.join(broadcast(langIds), Seq("lang"), "left")
      .select(col("doc_id"), col("fam"), col("sub"), col("tok"), col("name"),
        col("lang"), coalesce(col("lang_id"), lit(0L)).as("lang_id"))
  }

  val oracles: Map[String, String] = Map(
    "q51_for_each_name" ->
      """WITH base AS (
        |  SELECT doc_id, source || ' ' || CAST(doc_id % 50 AS VARCHAR) AS b,
        |    source AS src
        |  FROM documents),
        |tags AS (
        |  SELECT doc_id, 0 AS fam, 0 AS sub, 'default' AS lang,
        |    CASE WHEN doc_id % 4 = 0 THEN b || ';' || b || ' ii' ELSE b END AS value
        |  FROM base
        |  UNION ALL SELECT doc_id, 1, 0, 'default',
        |    CASE WHEN doc_id % 3 = 0 THEN b || ' old' END FROM base
        |  UNION ALL SELECT doc_id, 2, 0, 'default',
        |    CASE WHEN doc_id % 5 = 0 THEN b || ' alias' END FROM base
        |  UNION ALL SELECT doc_id, 3, 0, 'default',
        |    CASE WHEN doc_id % 2 = 0 THEN src END FROM base
        |  UNION ALL SELECT doc_id, 4, 0, 'default',
        |    CASE WHEN doc_id % 7 = 0 THEN 'the ' || b END FROM base
        |  UNION ALL SELECT doc_id, 5, 0, 'de',
        |    CASE WHEN doc_id % 2 = 1 THEN b || 'stadt' END FROM base
        |  UNION ALL SELECT doc_id, 5, 1, 'fr',
        |    CASE WHEN doc_id % 5 = 1 THEN b || 'ville' END FROM base
        |  UNION ALL SELECT doc_id, 6, 0, 'de',
        |    CASE WHEN doc_id % 6 = 0 THEN src || 'st' END FROM base
        |  UNION ALL SELECT doc_id, 7, 0, 'es',
        |    CASE WHEN doc_id % 9 = 0 THEN b || ' es' END FROM base
        |  UNION ALL SELECT doc_id, 8, 0, 'bg',
        |    CASE WHEN doc_id % 11 = 0 THEN b || ' bg' END FROM base),
        |em AS (
        |  SELECT doc_id, CAST(fam AS INT) AS fam, CAST(sub AS INT) AS sub,
        |    lang, CAST(u.i - 1 AS INT) AS tok,
        |    string_split(value, ';')[CAST(u.i AS INT)] AS name
        |  FROM tags,
        |    LATERAL (SELECT unnest(generate_series(
        |      1, len(string_split(value, ';')))) AS i) u
        |  WHERE value IS NOT NULL),
        |firsts AS (
        |  SELECT lang, doc_id, fam, sub, tok,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY doc_id, fam, sub, tok) AS rn
        |  FROM em WHERE lang <> 'default'),
        |langs AS (
        |  SELECT lang, CAST(ROW_NUMBER() OVER (
        |    ORDER BY doc_id, fam, sub, tok, lang) AS BIGINT) AS lang_id
        |  FROM firsts WHERE rn = 1)
        |SELECT e.doc_id, e.fam, e.sub, e.tok, e.name, e.lang,
        |  coalesce(l.lang_id, 0) AS lang_id
        |FROM em e LEFT JOIN langs l USING (lang)""".stripMargin
  )
}
