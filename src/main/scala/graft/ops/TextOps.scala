package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** Reference text-operator queries over the `documents`/`part` tables:
  * normalization (X1/X2), tokenization (G2), n-gram generation (G5),
  * inverted-index stats (A1), blocking join + count/cosine candidate
  * filter (A2/A3/J1), pair scoring (X3-X5 family), phonetic keys,
  * language-ID / quality / token-count / fingerprint text analysis.
  *
  * documents.text and part.p_name are pure ASCII in the testdata, so the
  * ICU canonical form equals lower(); full-unicode behavior is pinned by
  * the ScalaTest goldens instead (TextGoldenSpec).
  */
object TextOps {
  import Tables.load

  /** Distinct space-free character trigrams via the one-pass native
    * expression (the built-in `transform(sequence, substr)` formulation is
    * O(n²) on long documents — UTF8String.substring rescans from the
    * start; 4.6 s → 0.3 s on sf0.1 documents). */
  def trigramStrings(c: Column): Column = gf.trigram_strings(c)

  /** X1/X2: normalization. */
  def q10Normalize(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"), gf.normalize_text(col("text")).as("norm"))

  /** G2 + A-family: token stats. */
  def q11Tokens(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(gf.normalize_text(col("text")), " ")).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_total"))

  /** G5 + A1: trigram inverted-index stats. */
  def q12Trigrams(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(trigramStrings(gf.normalize_text(col("text")))).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))

  /** J1 + A2 + A3: the blocking join — part-name pairs sharing trigrams,
    * filtered by the reference's min-match-count and cosine cutoff
    * (typeahead.cc:409-423). */
  def q13BlockingPairs(spark: SparkSession, dir: String): DataFrame = {
    // intern first (reference D1/D2): pair generation over *distinct*
    // names only — 2000 parts share 64 names; at 100x scale the pair
    // count stays bounded by name diversity, not row count
    val interned = load(spark, dir, "part")
      .select(gf.normalize_text(col("p_name")).as("name"), col("p_partkey"))
      .groupBy(col("name")).agg(min(col("p_partkey")).as("name_id"))
    val p = interned
      .withColumn("tris", trigramStrings(col("name")))
      .withColumn("n_grams", size(col("tris")))
    val keyed = p.select(col("name_id"), col("n_grams"), explode(col("tris")).as("gram"))
    // hot-gram cap (Dedup.MaxBlock, mirrored in the oracle): a gram shared
    // by > cap names is a Zipf-hot stopgram with no discriminative signal
    // and a quadratic join block — drop it whole before the self-join
    val keptGrams = keyed.groupBy(col("gram"))
      .agg(count(lit(1)).as("gcnt"))
      .filter(col("gcnt").between(2, Dedup.MaxBlock))
      .select(col("gram"))
    val capped = keyed.join(keptGrams, Seq("gram"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.gram") === col("b.gram") && col("a.name_id") < col("b.name_id"))
      .groupBy(
        col("a.name_id").as("p1"), col("b.name_id").as("p2"),
        col("a.n_grams").as("n1"), col("b.n_grams").as("n2"))
      .agg(count(lit(1)).as("shared"))
    val minN = least(col("n1"), col("n2")).cast("int")
    val mmc = lit(2) + floor(minN / (lit(4) + floor(minN / lit(10))))
    pairs.filter(col("shared") >= mmc.cast("long") &&
        (col("shared") * col("shared")).cast("double") >= lit(0.17) * col("n1") * col("n2"))
      .select(col("p1"), col("p2"), col("shared"))
  }

  /** X-family pair scoring on the blocked pairs (JW + Levenshtein). */
  def q14PairScores(spark: SparkSession, dir: String): DataFrame = {
    val names = load(spark, dir, "part")
      .select(gf.normalize_text(col("p_name")).as("name"), col("p_partkey"))
      .groupBy(col("name")).agg(min(col("p_partkey")).as("name_id"))
      .select(col("name_id"), col("name"))
    q13BlockingPairs(spark, dir)
      .join(names.withColumnRenamed("name_id", "p1").withColumnRenamed("name", "name1"), Seq("p1"))
      .join(names.withColumnRenamed("name_id", "p2").withColumnRenamed("name", "name2"), Seq("p2"))
      .select(col("p1"), col("p2"),
        round(gf.jaro_winkler(col("name1"), col("name2")), 6).as("jw"),
        levenshtein(col("name1"), col("name2")).as("lev"))
      .withColumn("accepted", col("jw") >= 0.9)
  }

  /** Double-Metaphone phonetic keys (no SQL oracle — rows-only check). */
  def q15Metaphone(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .select(col("p_partkey"),
        explode(split(gf.normalize_text(col("p_name")), " ")).as("token"))
      .withColumn("dm", gf.double_metaphone(col("token")))
      .filter(length(col("dm")) >= 1)

  /** Reference get_match_score over part names vs a query phrase
    * (no SQL oracle — pinned by ScalaTest goldens). */
  def q16MatchScore(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        gf.ref_match_score(col("p_name"), lit("blue")).as("score"))
      .filter(col("score").isNotNull)

  // ------------------------------------------------------------ analysis

  private val enStop = Seq("the", "a", "and", "of", "to", "value", "data")

  /** Char-trigram language profiles (Cavnar–Trenkle-style, deterministic):
    * the most frequent DISTINCTIVE space-free trigrams of each language,
    * derived from its function words. Shared n-grams ("ent", "ion") are
    * deliberately excluded so profiles discriminate instead of overlap. */
  private[ops] val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "ing", "hat", "tha", "thi", "his", "ith",
      "wit", "you", "all", "are", "was", "hav", "not", "for", "oul", "uld",
      "ght", "ere"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ich", "sch", "cht",
      "den", "ung", "gen", "ber", "hen", "nde", "ist", "auf", "mit", "ach",
      "eit", "zur"),
    "fr" -> Seq("les", "des", "que", "est", "une", "ait", "our", "ous",
      "ans", "dan", "ett", "eur", "ave", "vec", "pas", "sur", "ais", "qui",
      "dec", "ses"),
    "es" -> Seq("los", "las", "del", "con", "por", "una", "par", "ara",
      "ado", "cio", "ion", "nto", "com", "sta", "ien", "aba", "ndo", "ega",
      "nos", "tra"),
    "bg" -> Seq("ата", "ите", "ото", "пре", "ста", "ния", "ени", "ато",
      "ова", "ква", "про", "ост", "ват", "ане", "кат", "ето", "ива", "тел",
      "раз", "нат"))

  /** Language-ID: per-language distinct-trigram profile hits, argmax with
    * the deterministic tie order en → de → fr → es → bg → xx. Trigram
    * extraction is the same one-pass native expression as q12 (linear,
    * space-free, distinct) so the plan stays codegen'd and scan-shaped. */
  def q28LangId(spark: SparkSession, dir: String): DataFrame =
    langIdOn(load(spark, dir, "documents"))

  /** The classifier over any (doc_id, text) frame — unit-testable on
    * multilingual samples (TextAnalysisSpec). */
  private[graft] def langIdOn(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("tris", trigramStrings(gf.normalize_text(col("text"))))
    val hits: Seq[(String, Column)] = langProfiles.map { case (lang, prof) =>
      lang -> size(filter(col("tris"), t => t.isin(prof.map(x => x: Any): _*)))
    }
    val withHits = hits.foldLeft(d) { case (df, (lang, c)) =>
      df.withColumn(s"${lang}_hits", c)
    }
    val best = hits.map { case (l, _) => col(s"${l}_hits") }.reduce(greatest(_, _))
    val pred = hits.foldRight(lit("xx"): Column) { case ((lang, _), els) =>
      when(col(s"${lang}_hits") === best && best > 0, lit(lang)).otherwise(els)
    }
    withHits.select(col("doc_id") +: pred.as("lang_pred") +:
      langProfiles.map { case (l, _) => col(s"${l}_hits") }: _*)
  }

  /** Quality scoring: length/stopword/punct/word-length signals. */
  def q29Quality(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents")
      .withColumn("norm", gf.normalize_text(col("text")))
      .withColumn("tokens", split(col("norm"), " "))
    val nTok0 = size(col("tokens"))
    val stopHits0 = size(filter(col("tokens"), t => t.isin(enStop.map(x => x: Any): _*)))
    val d2 = d.withColumn("n_tokens_", nTok0).withColumn("stop_hits_", stopHits0)
    val nTok = col("n_tokens_")
    val stopHits = col("stop_hits_")
    d2.select(col("doc_id"),
        length(col("norm")).as("n_chars"),
        nTok.as("n_tokens"),
        round(length(col("norm")).cast("double") / nTok, 6).as("avg_token_span"),
        round(stopHits.cast("double") / nTok, 6).as("stopword_ratio"),
        // integer permille score: exact in any engine (no float rounding
        // knife-edges in the oracle compare)
        (least(lit(500L), nTok.cast("long") * 10) +
          least(lit(500L), expr("CAST(stop_hits_ AS BIGINT) * 2500 div n_tokens_"))).as("quality_pm"))
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def q30TokenStats(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .withColumn("norm", gf.normalize_text(col("text")))
      .select(col("doc_id"),
        size(split(col("norm"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("bpe_tokens"))

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * the normalized bytes (mod 1e9+7). */
  def q31Fingerprint(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .withColumn("norm", gf.normalize_text(col("text")))
      .select(col("doc_id"),
        aggregate(
          transform(sequence(lit(1), length(col("norm"))),
            i => ascii(col("norm").substr(i, lit(1)))),
          lit(0L),
          (acc, c) => (acc * 31 + c) % 1000000007L).as("fp"))

  /** Multimodal columns: binary image payloads with REAL format headers
    * (PNG IHDR / JPEG JFIF+SOF0 / GIF89a screen descriptor), synthesized
    * deterministically per document, then DECODED back from the bytes —
    * format sniffed from the magic, dimensions parsed at the
    * format-specific offsets (big-endian u32 for PNG, marker-scan to
    * SOF0 then big-endian u16 for JPEG, little-endian u16 for GIF). The
    * oracle derives the expected dims independently from the md5 digits,
    * so any wrong decode offset/endianness diverges and fails the gate.
    * (Full raster decode needs image libs absent from this sandbox; the
    * header parse is the real, tested part of the decode path.) */
  def q32MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents").withColumn("h", md5(col("text")))
    def hexVal(i: Int): Column =
      expr(s"locate(substring(h, $i, 1), '0123456789abcdef') - 1")
    // deterministic ground truth for the synthesizer only (the decoder
    // below must recover these from payload BYTES alone)
    val fmtCode = hexVal(1) % 3
    val wTrue = hexVal(2) * 16 + hexVal(3) + 1 // 1..256
    val hTrue = hexVal(4) * 16 + hexVal(5) + 1
    def beHex(v: Column, bytes: Int): Column = lpad(hex(v), bytes * 2, "0")
    def leHex16(v: Column): Column = // u16 little-endian
      concat(lpad(hex(v % 256), 2, "0"), lpad(hex(v.cast("int") / 256), 2, "0"))
    val payloadHex = when(fmtCode === 0, // PNG: sig + IHDR len + "IHDR" + w u32 BE + h u32 BE
        concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
          beHex(wTrue, 4), beHex(hTrue, 4)))
      .when(fmtCode === 1, // JPEG: SOI + APP0/JFIF + SOF0(len 0x11, prec 8, h u16, w u16)
        concat(lit("FFD8" + "FFE000104A46494600010100000100010000" + "FFC0" + "0011" + "08"),
          beHex(hTrue, 2), beHex(wTrue, 2)))
      .otherwise( // GIF89a: sig + w u16 LE + h u16 LE + flags/bg/aspect
        concat(lit("474946383961"), leHex16(wTrue), leHex16(hTrue), lit("F70000")))
    val withPayload = d
      .withColumn("payload", unhex(payloadHex))
      .select(col("doc_id"), col("payload"))
    // ---- the decoder: payload bytes -> (fmt, width, height) ----
    val ph = upper(hex(col("payload")))
    def hexAt(pos: Column, nChars: Int): Column = // hex-digit substring -> int
      conv(substring(ph, pos, lit(nChars)), 16, 10).cast("int")
    val isPng = substring(ph, 1, 16) === "89504E470D0A1A0A"
    val isJpeg = substring(ph, 1, 4) === "FFD8"
    val isGif = substring(ph, 1, 12) === "474946383961"
    val sof = locate("FFC0", ph) // JPEG marker scan (APP0 JFIF bytes never contain FFC0)
    withPayload.select(
      col("doc_id"),
      length(col("payload")).as("payload_len"),
      when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif")
        .otherwise("unknown").as("fmt"),
      when(isPng, hexAt(lit(33), 8)) // IHDR: bytes 17-20 BE
        .when(isJpeg, hexAt(sof + 14, 4)) // SOF0: marker+len+prec+h, then w u16 BE
        .when(isGif, hexAt(lit(15), 2) * 256 + hexAt(lit(13), 2)) // u16 LE
        .as("width"),
      when(isPng, hexAt(lit(41), 8))
        .when(isJpeg, hexAt(sof + 10, 4))
        .when(isGif, hexAt(lit(19), 2) * 256 + hexAt(lit(17), 2))
        .as("height"))
  }

  val oracles: Map[String, String] = Map(
    "q10_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[,;\-/().]', ' ', 'g'), '  +', ' ', 'g')) AS norm
        |FROM documents""".stripMargin,
    "q11_tokens" ->
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_total
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |GROUP BY 1""".stripMargin,
    "q12_trigrams" ->
      """SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM (
        |  SELECT DISTINCT d.doc_id, substr(lower(d.text), i.i, 3) AS gram
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(1, len(d.text) - 2)) AS i) i
        |  WHERE len(d.text) >= 3 AND substr(lower(d.text), i.i, 3) NOT LIKE '% %'
        |) GROUP BY 1""".stripMargin,
    "q13_blocking_pairs" -> """WITH interned AS (
        |  SELECT lower(p_name) AS name, CAST(min(p_partkey) AS BIGINT) AS name_id
        |  FROM part GROUP BY 1),
        |g AS (
        |  SELECT DISTINCT t.name_id, substr(t.name, i.i, 3) AS gram
        |  FROM interned t, LATERAL (SELECT unnest(generate_series(1, len(t.name) - 2)) AS i) i
        |  WHERE len(t.name) >= 3 AND substr(t.name, i.i, 3) NOT LIKE '% %'),
        |n AS (SELECT name_id, count(*) AS n_grams FROM g GROUP BY 1),
        |kf AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 256),
        |gk AS (SELECT g.name_id, g.gram FROM g JOIN kf USING (gram)),
        |pairs AS (
        |  SELECT a.name_id AS p1, b.name_id AS p2, count(*) AS shared
        |  FROM gk a JOIN gk b ON a.gram = b.gram AND a.name_id < b.name_id
        |  GROUP BY 1, 2)
        |SELECT p1, p2, shared FROM pairs
        |JOIN n n1 ON n1.name_id = p1 JOIN n n2 ON n2.name_id = p2
        |WHERE shared >= 2 + floor(least(n1.n_grams, n2.n_grams)
        |    / (4 + floor(least(n1.n_grams, n2.n_grams) / 10)))
        |  AND CAST(shared * shared AS DOUBLE) >= 0.17 * n1.n_grams * n2.n_grams""".stripMargin,
    "q14_pair_scores" -> """WITH interned AS (
        |  SELECT lower(p_name) AS name, CAST(min(p_partkey) AS BIGINT) AS name_id
        |  FROM part GROUP BY 1),
        |g AS (
        |  SELECT DISTINCT t.name_id, substr(t.name, i.i, 3) AS gram
        |  FROM interned t, LATERAL (SELECT unnest(generate_series(1, len(t.name) - 2)) AS i) i
        |  WHERE len(t.name) >= 3 AND substr(t.name, i.i, 3) NOT LIKE '% %'),
        |n AS (SELECT name_id, count(*) AS n_grams FROM g GROUP BY 1),
        |kf AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 256),
        |gk AS (SELECT g.name_id, g.gram FROM g JOIN kf USING (gram)),
        |pairs AS (
        |  SELECT a.name_id AS p1, b.name_id AS p2, count(*) AS shared
        |  FROM gk a JOIN gk b ON a.gram = b.gram AND a.name_id < b.name_id
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT p1, p2 FROM pairs
        |  JOIN n n1 ON n1.name_id = p1 JOIN n n2 ON n2.name_id = p2
        |  WHERE shared >= 2 + floor(least(n1.n_grams, n2.n_grams)
        |      / (4 + floor(least(n1.n_grams, n2.n_grams) / 10)))
        |    AND CAST(shared * shared AS DOUBLE) >= 0.17 * n1.n_grams * n2.n_grams)
        |SELECT p1, p2,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS lev,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9 AS accepted
        |FROM cand JOIN interned a ON a.name_id = p1 JOIN interned b ON b.name_id = p2""".stripMargin,
    "q28_langid" -> {
      val profSql = langProfiles.map { case (lang, prof) =>
        val inList = prof.map(p => s"'$p'").mkString(", ")
        s"    CAST(sum(CASE WHEN gram IN ($inList) THEN 1 ELSE 0 END) AS INT) AS ${lang}_hits"
      }.mkString(",\n")
      val hitCols = langProfiles.map { case (l, _) => s"${l}_hits" }
      val best = s"greatest(${hitCols.mkString(", ")})"
      val predCase = langProfiles.map { case (l, _) =>
        s"    WHEN ${l}_hits = $best AND $best > 0 THEN '$l'"
      }.mkString("\n")
      s"""WITH g AS (
         |  SELECT DISTINCT d.doc_id, substr(lower(d.text), i.i, 3) AS gram
         |  FROM documents d, LATERAL (SELECT unnest(generate_series(1, len(d.text) - 2)) AS i) i
         |  WHERE len(d.text) >= 3 AND substr(lower(d.text), i.i, 3) NOT LIKE '% %'),
         |c AS (
         |  SELECT doc_id,
         |$profSql
         |  FROM g GROUP BY 1)
         |SELECT d0.doc_id,
         |  CASE
         |$predCase
         |    ELSE 'xx' END AS lang_pred,
         |  ${hitCols.map(c => s"coalesce($c, 0) AS $c").mkString(", ")}
         |FROM documents d0 LEFT JOIN c ON c.doc_id = d0.doc_id""".stripMargin
    },
    "q29_quality" -> """WITH d AS (
        |  SELECT doc_id, lower(text) AS norm, string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(len(norm) AS INT) AS n_chars,
        |    CAST(len(tokens) AS INT) AS n_tokens,
        |    round(CAST(len(norm) AS DOUBLE) / len(tokens), 6) AS avg_token_span,
        |    round(CAST(len(list_filter(tokens,
        |      t -> t IN ('the','a','and','of','to','value','data'))) AS DOUBLE)
        |      / len(tokens), 6) AS stopword_ratio,
        |    CAST(len(list_filter(tokens,
        |      t -> t IN ('the','a','and','of','to','value','data'))) AS BIGINT) AS stop_hits
        |  FROM d)
        |SELECT doc_id, n_chars, n_tokens, avg_token_span, stopword_ratio,
        |  least(500, CAST(n_tokens AS BIGINT) * 10)
        |    + least(500, stop_hits * 2500 // n_tokens) AS quality_pm
        |FROM c""".stripMargin,
    "q30_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(lower(text), ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens
        |FROM documents""".stripMargin,
    "q31_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(lower(text)) + 1),
        |        i -> CAST(ascii(substr(lower(text), CAST(i AS INT), 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |FROM documents""".stripMargin,
    "q32_media_meta" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 3 AS fmt_code,
        |    (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(text), 3, 1)) AS w,
        |    (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(text), 5, 1)) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE fmt_code WHEN 0 THEN 24 WHEN 1 THEN 29 ELSE 13 END AS INT)
        |    AS payload_len,
        |  CASE fmt_code WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height
        |FROM d""".stripMargin
  )
}
