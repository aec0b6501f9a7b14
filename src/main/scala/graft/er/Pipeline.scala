package graft.er

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.{Files, Paths}
import org.apache.spark.storage.StorageLevel
import graft.{functions => gf}

/** The web-scale entity-resolution pipeline (BASELINE.json north_rule):
  * pages → mentions → string interning → blocking → pairwise scoring →
  * transitive clustering.
  *
  * Spark-first reimagination of the reference's matcher:
  * - extraction ↔ OSM name-tag extraction (typeahead.cc:49-77)
  * - string interning ↔ get_or_create_string / D1 (typeahead.cc:300-306):
  *   all blocking + scoring runs over *distinct* canonical strings, so a
  *   Zipf-hot surface form costs one row, not one per occurrence — this is
  *   the single most important 10^12-scale lever (the reference's index is
  *   likewise built over interned strings only)
  * - trigram blocking + count/cosine candidate filter ↔ inverted bigram
  *   index + guess() (typeahead.cc:317-337, 372-439)
  * - pair scoring ↔ get_match_score/sift4 (score.h), here symmetric
  *   Jaro-Winkler + banded Levenshtein on canonical match keys
  * - transitive clustering ↔ duplicate marking + hash-consing
  *   (get_suggestions.cc:703-731, typeahead.cc:308-315), generalized to
  *   connected components over the string-match graph plus
  *   mention→string membership edges
  *
  * Scale design: all shuffles after interning are on fixed-width keys
  * (Int trigrams, Long ids); hot blocking keys are capped with the dropped
  * volume logged (the reference's kMaxMatches=6000 analogue,
  * typeahead.cc:428); clustering checkpoints each iteration to parquet
  * with per-partition metrics for lineage-free resumability.
  */
object Pipeline {

  final case class Config(
      seed: Long = 42L,
      nPages: Long = 2000L,
      nEntities: Int = 300,
      // blocking
      maxBlockSize: Int = 256,
      // prefix filtering (MF-Join family): pair generation uses only each
      // string's K globally-rarest trigrams — a 1-edit pair disturbs ≤4
      // grams, so the rarest shared grams stay in both prefixes, while
      // Zipf-hot grams stop generating quadratic blocks entirely
      prefixKeys: Int = 6,
      // JW threshold for TUNEMAIN'S SWEEP ONLY — the production accept
      // gate deliberately excludes whole-string JW (see scorePairs: on
      // dense entity spaces it passes corrupted variants of DIFFERENT
      // entities faster than it recovers true pairs); the real tuning
      // surface is siftMaxEdits/levMaxPerBytes/levMaxCap below plus the
      // per-aligned-token constants tokLevMax/tokJwMin.
      jwThreshold: Double = 0.96,
      // per-aligned-token closeness gate (scorePairs tok_ok): every
      // aligned token pair must satisfy lev ≤ tokLevMax OR jw ≥ tokJwMin
      tokLevMax: Int = 2,
      tokJwMin: Double = 0.92,
      levMaxPerBytes: Double = 1.0 / 12.0, // allowed edits per byte of min length
      levMaxCap: Int = 2, // plain Levenshtein counts a transposition as 2
      // SIFT4 counts a transposition as 1 (the reference scorer's
      // property); budget 2 because canonicalization can amplify one user
      // typo into two key edits (digraph fold: deleting 'f' in "haferring"
      // creates "ae" which folds to "a" — a 2-edit key delta). Precision
      // at 2 edits is recovered by the distance-first hub rule.
      siftMaxEdits: Int = 2,
      // hub rule: a low-frequency string may only link to a hub at least
      // this many times more frequent (frequency prior, reference X9)
      hubFreqRatio: Double = 2.0,
      // skew: salt buckets for the membership-expand join (hot string_ids)
      saltBuckets: Int = 8,
      // contextual evidence (reference A6 analogue): use co-occurring
      // mention strings on the same page as a tie-breaking signal in hub
      // selection. Off by default (costs one bounded co-occurrence join);
      // needed only for entity spaces denser than the vocabulary-separated
      // default corpus.
      contextEvidence: Boolean = false,
      maxCtxPerPage: Int = 8, // distinct strings per page entering co-occurrence
      maxCtxPerString: Int = 64, // strongest context neighbors kept per string
      // clustering
      maxIterations: Int = 20,
      workDir: String = "/tmp/graft_er",
      resume: Boolean = false,
      // clustering engine: matchEdges emits a functional forest (oriented
      // satellite→hub, one out-edge per node), so components resolve by
      // pointer-jumping over the parent map (forestLabels) in log(depth)
      // rounds. false = generic undirected min-label propagation
      // (cluster) — the fallback for arbitrary edge sets / A-B testing.
      forestCluster: Boolean = true,
      // false = skip all metric-only actions (counts/stats collects) so a
      // bench run is one lazy DAG per cluster iteration; production keeps
      // true (the north_rule wants logged stats).
      collectStats: Boolean = true)

  final case class BlockingStats(
      totalKeys: Long, keptKeys: Long, hotKeysDropped: Long,
      hotVolumeDropped: Long, candidatePairs: Long)

  // ---------------------------------------------------------------- extract

  /** Tag mixed into the second identity hash — prefixing a distinct
    * literal is equivalent to running xxhash64 under an independent seed. */
  private val Id2Tag = "graft:id2"

  /** 128-bit mention identity from the natural key (url, seq): two
    * independent xxhash64 values. Collision odds for the PAIR at 10^12
    * rows are ~2^-40 — negligible, vs ~2.7% for a single 64-bit hash
    * (which would silently fuse two unrelated mentions). All mention-level
    * joins (membership ↔ truth) key on both columns. */
  def withMentionIds(df: DataFrame): DataFrame = df
    .withColumn("mention_id", xxhash64(col("url"), col("seq")))
    .withColumn("mention_id2", xxhash64(lit(Id2Tag), col("url"), col("seq")))

  /** pages → mentions. Extraction is structural (lines prefixed "loc: ")
    * and built only from deterministic expressions — byte-identical output
    * per url under any partitioning (input_hint invariant). Mention
    * identity is the 128-bit (mention_id, mention_id2) pair — see
    * withMentionIds.
    */
  def extractMentions(pages: DataFrame): DataFrame = {
    withMentionIds(pages
      .select(
        col("url"),
        col("lang"),
        posexplode(
          filter(split(col("text"), "\n"), l => l.startsWith("loc: ")))
          .as(Seq("seq", "line")))
      .select(
        col("url"),
        col("lang"),
        col("seq"),
        expr("substring(line, 6)").as("raw")))
      .withColumn("norm", gf.normalize_text(col("raw")))
      .withColumn("match_key", gf.match_key(col("raw")))
      .filter(length(col("match_key")) >= 2) // F5: min length gate
  }

  // ---------------------------------------------------------------- intern

  /** Deterministic, collision-FREE Long ids for the interned strings.
    * string_id = xxhash64(match_key), then ONE detect-and-rehash repair
    * round: any id carried by more than one distinct key is reassigned
    * with a tag mixed into the hash and re-checked against the full set;
    * a secondary collision (odds ~1e-9 after ~3 expected primaries at
    * 10^10 keys) aborts the job loudly via assert_true rather than
    * looping further. The result is a pure function of the
    * distinct-key set (partition-invariant) and keeps the clustering loop
    * on 8-byte keys — half the shuffle width of a 128-bit label — while
    * removing the silent-cluster-fusion risk of raw 64-bit hashing.
    * Expected cost beyond the always-needed duplicate check: at 10^10
    * distinct strings ~3 colliding ids → one extra (tiny) round. */
  /** Pure-Scala mirror of Spark's `xxhash64` over a string (seed 42) —
    * keeps the streaming incremental intern (StreamOps.incrementalIntern)
    * assigning the same ids as the batch expression below. */
  def stringIdHash(key: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(key),
      org.apache.spark.sql.types.StringType, 42L)

  private def assignStringIds(keys: DataFrame): DataFrame = {
    // Inline detect → repair → verify, with NO extra action (an eager
    // driver-side check would force the whole mentions→groupBy subtree to
    // compute twice per run): colliding ids are found with a window count
    // over the (small, interned) key table, repaired by one deterministic
    // rehash of the colliding keys, and the repaired set is re-verified by
    // a second window count whose failure raises inside the job. Expected
    // collisions at 10^10 distinct strings: ~3 → repair odds of a
    // secondary collision ~1e-9, and even that fails LOUD, never silent.
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(col("sid0"))
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy(col("sid1"))
    keys
      .withColumn("sid0", xxhash64(col("match_key")))
      .withColumn("n0", count(lit(1)).over(w0))
      .withColumn("sid1", when(col("n0") > 1,
        xxhash64(lit(Id2Tag), col("match_key"), lit(1))).otherwise(col("sid0")))
      .withColumn("n1", count(lit(1)).over(w1))
      .withColumn("string_id", coalesce(
        assert_true(col("n1") === 1,
          lit("string-id hash collision survived the rehash repair — " +
            "refusing to proceed (would silently fuse clusters)")).cast("long"),
        col("sid1")))
      .drop("sid0", "n0", "sid1", "n1")
  }

  /** String interning (reference D1): one row per distinct canonical match
    * key, with a deterministic collision-free Long id (assignStringIds).
    * Returns (strings, membership): strings(string_id, match_key, freq);
    * membership(mention_id, mention_id2, string_id).
    */
  def internStrings(mentions: DataFrame): (DataFrame, DataFrame) = {
    val strings = assignStringIds(
      mentions.groupBy(col("match_key")).agg(count(lit(1)).as("freq")))
      .select(col("string_id"), col("match_key"), col("freq"))
    val membership = mentions
      .select(col("mention_id"), col("mention_id2"), col("match_key"))
      .join(strings.select(col("match_key"), col("string_id")), Seq("match_key"))
      .select(col("mention_id"), col("mention_id2"), col("string_id"))
    (strings, membership)
  }

  // ---------------------------------------------------------------- blocking

  /** distinct strings → candidate string pairs (src < dst).
    *
    * Prefix-filtered blocking (the size/prefix filters of the fuzzy-join
    * literature — PAPERS.md MF-Join; the reference's analogue is the
    * posting-count candidate cut, typeahead.cc:409-423): each string
    * GENERATES pairs only from its `prefixKeys` globally-rarest trigrams.
    * A 1-edit pair disturbs ≤4 of ~20 grams, so both sides keep their
    * rarest shared grams in-prefix and the pair is still generated, while
    * Zipf-hot grams (shared by thousands of strings — zero discriminative
    * signal) stop producing quadratic blocks at all. Residual over-hot
    * prefix blocks are capped at maxBlockSize with the dropped volume
    * logged (the reference's kMaxMatches=6000 cap, typeahead.cc:428).
    * Precision is NOT blocking's job here — every candidate pair goes
    * through the codegen'd scalar gate + hub rule (scorePairs/matchEdges).
    * Double-Metaphone phonetic keys union in as a second key family.
    */
  def candidatePairs(strings: DataFrame, cfg: Config): (DataFrame, BlockingStats) = {
    val spark = strings.sparkSession
    import spark.implicits._

    val m = strings
      .select($"string_id", $"match_key", gf.trigram_keys($"match_key").as("tris"))

    val keyed = m.select($"string_id", explode($"tris").as("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freq = keyed.groupBy($"key").agg(count(lit(1)).as("cnt"))

    // per-string prefix: the K globally-rarest grams with freq ≥ 2
    // (deterministic order). Singleton grams are excluded BEFORE ranking:
    // a freq-1 gram can never generate a pair, yet typo-created grams are
    // exactly the globally-rarest ones — letting them occupy prefix slots
    // crowds out the shared grams that actually recall the pair.
    // top-K selection by hash aggregate instead of a row_number window:
    // the window form sorts the WHOLE keyed-gram table by
    // (string_id, cnt, key); the aggregate form hash-groups and sorts
    // ~20 elements per group — same selected set (array_sort on
    // struct(cnt, key) is the same lexicographic (cnt asc, key asc)
    // order the window used; slice keeps the first prefixKeys).
    val prefixed = keyed
      .join(freq.filter($"cnt" >= 2), Seq("key"))
      .groupBy($"string_id")
      .agg(slice(array_sort(collect_list(struct($"cnt", $"key"))),
        1, cfg.prefixKeys).as("topk"))
      .select($"string_id", explode($"topk").as("e"))
      .select($"string_id", $"e.key".as("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val pfreq = prefixed.groupBy($"key").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (totalKeys, hotKeys, hotVolume, keptKeyCount) =
      if (cfg.collectStats) {
        val agg = pfreq.agg(count(lit(1)).as("t"),
          coalesce(sum(when($"cnt" > cfg.maxBlockSize, 1L).otherwise(0L)), lit(0L)).as("k"),
          coalesce(sum(when($"cnt" > cfg.maxBlockSize, $"cnt").otherwise(0L)), lit(0L)).as("v"),
          // keptKeys counted from the kept predicate itself, NOT derived
          // as total - hot: prefix keys whose pfreq is 1 (a gram that
          // survived into only one string's prefix after rank truncation)
          // are dropped by the kept filter too, so total - hot overcounts
          coalesce(sum(when($"cnt" >= 2 && $"cnt" <= cfg.maxBlockSize, 1L)
            .otherwise(0L)), lit(0L)).as("kk"))
          .collect()(0)
        (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
      } else (-1L, -1L, -1L, -1L)
    val kept = pfreq.filter($"cnt" >= 2 && $"cnt" <= cfg.maxBlockSize)

    // AQE sizes stages by their INPUT bytes, so the aggregated block list
    // (~small) gets coalesced to a couple of partitions — and the pair
    // explosion below (quadratic in block size) would then run in those
    // few tasks, serializing the whole stage (measured: blocking 47 s at
    // 2 cores → 41 s at 8 cores before this repartition). Explicit
    // round-robin repartition of the cheap aggregated rows restores full
    // parallelism for the expensive explode.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val blocks = prefixed
      .join(kept.select($"key"), Seq("key")) // drops singleton + capped keys
      .groupBy($"key")
      .agg(collect_list($"string_id").as("members"))
      .repartition(sessionParts)

    // map-side pair expansion: bounded by maxBlockSize² per key, ≤
    // prefixKeys blocks per string
    val trigramPairs = blocks
      .select(explode($"members").as("src"), $"members")
      .select($"src", explode($"members").as("dst"))
      .filter($"src" < $"dst")

    // phonetic blocking: per-token Double Metaphone codes (len >= 3);
    // the scorer does the precision work on these coarse keys.
    val phonKeyed = strings
      .select($"string_id",
        explode(array_distinct(transform(
          split($"match_key", " "),
          t => gf.double_metaphone(t)))).as("pkey"))
      .filter(length($"pkey") >= 3)
    val phonFreq = phonKeyed.groupBy($"pkey").agg(count(lit(1)).as("cnt"))
    val phonBlocks = phonKeyed
      .join(phonFreq.filter($"cnt" >= 2 && $"cnt" <= cfg.maxBlockSize).select($"pkey"), Seq("pkey"))
      .groupBy($"pkey").agg(collect_list($"string_id").as("ids"))
      .repartition(sessionParts) // same explode-parallelism guard as above
    val phonPairs = phonBlocks
      .select(explode($"ids").as("src"), $"ids")
      .select($"src", explode($"ids").as("dst"))
      .filter($"src" < $"dst")
      .select($"src", $"dst")

    val pairs = trigramPairs.unionByName(phonPairs).dropDuplicates("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // always materialize here: the prefix/pfreq caches feed the pair DAG
    // twice each, so they must still be cached when it first computes
    // (collectStats only gates the *extra* stats aggregation above)
    val nPairs = pairs.count()
    keyed.unpersist()
    prefixed.unpersist()
    pfreq.unpersist()

    val stats = BlockingStats(
      totalKeys = totalKeys,
      keptKeys = keptKeyCount,
      hotKeysDropped = hotKeys,
      hotVolumeDropped = hotVolume,
      candidatePairs = nPairs)
    (pairs, stats)
  }

  // ---------------------------------------------------------------- scoring

  /** candidate string pairs → scored pairs with the scalar accept gate.
    * Scores: Jaro-Winkler + banded Levenshtein + SIFT4 on the canonical
    * match keys (all codegen'd Catalyst expressions — no UDF dispatch).
    * Accept: sift_cp ≤ siftMaxEdits ∧ lev_cp ≤ lev_max ∧ token-aligned
    * gate — all codepoint-level (one typo = one edit on any script); final
    * edge selection adds the frequency-prior hub rule — see matchEdges. */
  def scorePairs(pairs: DataFrame, strings: DataFrame, cfg: Config): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val keys = strings.select($"string_id", $"match_key")
    val withA = pairs
      .join(keys.withColumnRenamed("string_id", "src").withColumnRenamed("match_key", "src_key"), Seq("src"))
    val withB = withA
      .join(keys.withColumnRenamed("string_id", "dst").withColumnRenamed("match_key", "dst_key"), Seq("dst"))
    scoreKeyed(withB, cfg)
      .select($"src", $"dst", $"jw", $"lev", $"sift", $"min_len", $"tok_ok", $"accepted")
  }

  /** The scalar scoring gate alone, over a frame that already carries
    * `src_key`/`dst_key` (stateless, all codegen — no joins, no shuffle):
    * the shared kernel of batch [[scorePairs]] and the streaming
    * scored-edge path (graft.streaming.StreamOps.incrementalScoredPairs),
    * so the two CANNOT diverge. Appends jw/lev/sift/min_len/tok_ok/
    * accepted to the input columns. */
  def scoreKeyed(withKeys: DataFrame, cfg: Config): DataFrame = {
    val spark = withKeys.sparkSession
    import spark.implicits._
    withKeys
      .withColumn("jw", gf.jaro_winkler($"src_key", $"dst_key"))
      // gate distances are CODEPOINT-level (sift4_cp + Spark's built-in
      // levenshtein): one user typo = one edit on any script. Byte-level
      // distances double-count multi-byte UTF-8 edits (a Cyrillic
      // transposition = 4 byte edits), silently splitting every non-Latin
      // cluster under a tight edit budget.
      // (bounded form: -1 when the distance exceeds levMaxCap — banded DP,
      // O(n·cap) instead of O(n²) on the pairwise hot path)
      .withColumn("lev", levenshtein($"src_key", $"dst_key", cfg.levMaxCap))
      .withColumn("sift", gf.sift4_cp($"src_key", $"dst_key"))
      .withColumn("min_len", least(length($"src_key"), length($"dst_key")))
      .withColumn("lev_max", greatest(lit(1),
        least(lit(cfg.levMaxCap), ceil($"min_len" * cfg.levMaxPerBytes))).cast("int"))
      // token-aligned gate: a whole-string score can stay high when one
      // *aligned token* is a different word entirely (long shared base +
      // short differing city, or long base + different suffix) — require
      // every aligned token pair to be individually close. Token-count
      // mismatches (e.g. a deleted space) fall back to the full-string
      // rule alone.
      .withColumn("tok_ok", {
        val ta = split($"src_key", " ")
        val tb = split($"dst_key", " ")
        when(size(ta) =!= size(tb), lit(true)).otherwise(
          forall(zip_with(ta, tb, (a, b) =>
            levenshtein(a, b) <= cfg.tokLevMax ||
              gf.jaro_winkler(a, b) >= cfg.tokJwMin), x => x))
      })
      // Scalar accept: the edit-distance gate ONLY. The corruption model a
      // correct matcher must absorb is "≤1 typo per surface" — SIFT4 ≤ 1
      // (counts a transposition as one edit, like the reference scorer)
      // with plain-Levenshtein ≤ 2 as the band check. Whole-string JW is
      // deliberately NOT an accept path: on dense entity spaces it passes
      // corrupted variants of *different* entities (jw up to 0.99
      // measured) faster than it recovers true pairs. Precision beyond
      // this gate comes from the frequency-prior hub rule (matchEdges).
      .withColumn("accepted",
        $"sift" <= cfg.siftMaxEdits &&
          ($"lev" >= 0 && $"lev" <= $"lev_max") &&
          $"tok_ok")
  }

  /** Scored pairs → accepted match edges via the frequency-prior HUB rule
    * (the reference's population/category priors X8/X9, recast for ER):
    * after interning, an entity's mention mass concentrates on one
    * canonical surface form (case/punctuation/synonym/diacritic variants
    * all collapse to the same match key), while typo variants are
    * low-frequency satellites one edit away. So each low-frequency string
    * links ONLY to its single best higher-frequency hub (top-1 by hub
    * frequency) and never to a sibling satellite: satellite↔satellite
    * edges across entities are exactly the false-positive class on dense
    * entity spaces (two corrupted forms of different entities can land 1
    * edit apart — no pairwise distance can separate that from a true
    * pair; the frequency prior can). Transitivity through the hub still
    * connects all same-entity satellites. */
  /** Bounded page-co-occurrence context (the reference's area evidence A6,
    * recast for ER: co-occurring mentions play the role co-occurring
    * containment areas play in get_suggestions.cc:181-255). Returns
    * (s, c) — string c co-occurs with string s on at least one page.
    * Both sides are capped (strings per page, neighbors per string, kept
    * by co-occurrence count) so the table stays linear in the corpus. */
  def contextPairs(mentions: DataFrame, strings: DataFrame, cfg: Config): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val pageStrings = mentions.select($"url", $"match_key")
      .join(strings.select($"match_key", $"string_id"), Seq("match_key"))
      .select($"url", $"string_id").distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"url").orderBy($"string_id")))
      .filter($"rn" <= cfg.maxCtxPerPage) // cap: a 1000-mention page is boilerplate
      .select($"url", $"string_id")
    pageStrings.as("x")
      .join(pageStrings.as("y"),
        $"x.url" === $"y.url" && $"x.string_id" =!= $"y.string_id")
      .groupBy($"x.string_id".as("s"), $"y.string_id".as("c"))
      .agg(count(lit(1)).as("n_pages"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"s").orderBy($"n_pages".desc, $"c".asc)))
      .filter($"rn" <= cfg.maxCtxPerString)
      .select($"s", $"c")
  }

  def matchEdges(pairs: DataFrame, strings: DataFrame, cfg: Config,
      mentions: Option[DataFrame] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Cheap-gate PRE-filter before the full scorer: the banded Levenshtein
    // at the cap is a NECESSARY condition of `accepted` (which requires
    // lev ∈ [0, lev_max] with lev_max ≤ levMaxCap), so filtering lev ≥ 0
    // first drops no accepted edge — it keeps sift4/token-gate/projection
    // work off the vast majority of candidate pairs the distance gate
    // rejects anyway (the scorer columns were previously projected for
    // every candidate pair because `sift` is needed downstream). scorePairs
    // itself stays unfiltered — TuneMain/DebugSplits analyze rejected
    // pairs through it.
    val keys = strings.select($"string_id", $"match_key")
    val withKeys = pairs
      .join(keys.withColumnRenamed("string_id", "src")
        .withColumnRenamed("match_key", "src_key"), Seq("src"))
      .join(keys.withColumnRenamed("string_id", "dst")
        .withColumnRenamed("match_key", "dst_key"), Seq("dst"))
      .filter(levenshtein($"src_key", $"dst_key", cfg.levMaxCap) >= 0)
    val scored = scoreKeyed(withKeys, cfg).filter($"accepted")
    val freqs = strings.select($"string_id", $"freq")
    val withF = scored
      .join(freqs.withColumnRenamed("string_id", "src").withColumnRenamed("freq", "src_freq"), Seq("src"))
      .join(freqs.withColumnRenamed("string_id", "dst").withColumnRenamed("freq", "dst_freq"), Seq("dst"))
    // orient each edge satellite→hub (ties in freq broken by id: no
    // orientation is possible, and the ratio gate drops the edge anyway)
    val oriented = withF.select(
      when($"src_freq" < $"dst_freq" ||
          ($"src_freq" === $"dst_freq" && $"src" > $"dst"),
        struct($"src".as("low"), $"dst".as("high"),
          $"src_freq".as("low_freq"), $"dst_freq".as("high_freq")))
        .otherwise(
          struct($"dst".as("low"), $"src".as("high"),
            $"dst_freq".as("low_freq"), $"src_freq".as("high_freq"))).as("e"),
      $"sift")
      .select($"e.low", $"e.high", $"e.low_freq", $"e.high_freq", $"sift")
    // top-1 hub per satellite, DISTANCE-first then frequency: with a
    // 2-edit budget a satellite can sit 2 edits from its own canonical and
    // (on dense entity spaces) 1–2 edits from a different entity's — the
    // nearer hub is the right one; frequency only breaks distance ties.
    // Eligible hubs: the frequency-ratio prior, OR any 1-edit neighbor —
    // entities mentioned only a handful of times have no frequency signal
    // (two freq-1 variants of a 2-mention entity), and by vocabulary
    // separation a 1-edit key delta across *different* entities requires
    // two independent typos to collide — the top-1 cap bounds the damage
    // of that rare event to a single satellite's mentions.
    val eligible = oriented
      .filter($"high_freq" >= lit(cfg.hubFreqRatio) * $"low_freq" || $"sift" <= 1)
    // Contextual evidence (A6 analogue, optional): when two hubs tie on
    // distance AND frequency — the exact case no pairwise string score can
    // separate — the satellite goes to the hub sharing page-co-occurrence
    // context with it (shared co-occurring strings, e.g. a city mentioned
    // alongside both). Context RANKS, it never creates or vetoes an edge.
    val ranked = (mentions, cfg.contextEvidence) match {
      case (Some(m), true) =>
        val ctx = contextPairs(m, strings, cfg)
        val overlap = eligible.select($"low", $"high").distinct()
          .join(ctx.select($"s".as("low"), $"c"), Seq("low"))
          .join(ctx.select($"s".as("high"), $"c"), Seq("high", "c"))
          .groupBy($"low", $"high").agg(count(lit(1)).as("ctx_cnt"))
        eligible
          .join(overlap, Seq("low", "high"), "left")
          .withColumn("ctx_cnt", coalesce($"ctx_cnt", lit(0L)))
      case _ => eligible.withColumn("ctx_cnt", lit(0L))
    }
    ranked
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"low").orderBy(
            $"sift".asc, $"ctx_cnt".desc, $"high_freq".desc, $"high".asc)))
      .filter($"rnk" === 1)
      .select($"low".as("src"), $"high".as("dst"))
  }

  // ---------------------------------------------------------------- clustering

  final case class IterationMetrics(
      iteration: Int, labelDelta: java.math.BigDecimal, rows: Long, partitions: Int)

  /** Transitive closure over edges: iterative min-label propagation to
    * fixpoint (the DataFrame union-find of SURVEY.md §4 item 3). Each
    * iteration writes `labels_iter_k` parquet plus per-partition metrics
    * under cfg.workDir — lineage is cut every iteration and the loop can
    * resume from the latest checkpoint after a crash (cfg.resume).
    *
    * label := min(id) reachable — deterministic, partition-count invariant.
    */
  def cluster(
      vertices: DataFrame, // (id)
      edges: DataFrame, // (src, dst)
      cfg: Config): (DataFrame, Vector[IterationMetrics]) = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val (fs, workPath) = hadoopFs(spark, cfg.workDir)

    val und0 = edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))

    // Size the loop's shuffle width from the DATA, not the session: the
    // match graph is orders of magnitude smaller than the corpus (edges
    // live over interned strings), and every iteration runs shuffles +
    // a checkpoint write at that width. Session-wide shuffle.partitions is
    // sized for the corpus-scale stages; reusing it here turns the loop
    // into hundreds of near-empty tasks and tiny checkpoint files whose
    // fixed cost dominates (measured 40 s → 16 s at 500k pages just going
    // 64 → 16 partitions). ~2M edge rows per partition keeps tasks well
    // under executor memory while minimizing per-task overhead; at 10^12
    // docs the same formula yields thousands of partitions.
    // Lower bound: a small multiple of the cluster's total cores, so the
    // loop's single-wave stages bin-pack (9 tasks on 8 cores = one full
    // wave + one straggler = ~44% idle cores; 16 tasks = two full waves).
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val minParts = 2 * spark.sparkContext.defaultParallelism
    val edgeRows = und0.count()
    val loopParts = math.max(minParts.toLong, math.min(
      math.max(sessionParts, minParts).toLong,
      edgeRows / 2000000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // The loop width is already data-sized (above); AQE coalescing below
    // it only breaks co-partitioning with the persisted edge table and
    // forces the edges to reshuffle every step.
    val prevCoalesce = spark.conf
      .getOption("spark.sql.adaptive.coalescePartitions.enabled").getOrElse("true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // Shuffled-HASH join for the loop: sort-merge re-sorts the (static,
    // already partitioned) edge table every single iteration; hashing the
    // small label side and streaming the edges is both cheaper and
    // scale-safe (fixed-width Long keys, no sort buffers).
    val prevPreferSMJ = spark.conf
      .getOption("spark.sql.join.preferSortMergeJoin").getOrElse("true")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    // Pre-partition the STATIC edge table by the join key once: every
    // propagation step joins labels to edges on "b", so a persisted
    // hash-partitioned edge side means only the (smaller) label side
    // shuffles per step — the edge bytes cross the wire once, not once
    // per iteration.
    val und = und0.repartition(loopParts, $"b")
      .persist(StorageLevel.MEMORY_AND_DISK)

    def labelPath(i: Int) = s"${cfg.workDir}/labels_iter_$i"

    val startIter =
      if (cfg.resume) resumePoint(fs, workPath, "labels_iter_")
      else {
        // clean BOTH families: stale complete parents_iter_* from an
        // older forest run in the same workDir would otherwise survive a
        // fresh generic run and poison a later forest resume
        cleanIterFiles(fs, workPath, "labels_iter_")
        cleanIterFiles(fs, workPath, "parents_iter_")
        0
      }

    // Labels only ever DECREASE under min-propagation, so the exact
    // convergence test "no label changed this round" is equivalent to
    // "sum(label) is unchanged" (decimal sum — no overflow on Long ids).
    // The sum rides the checkpoint write as an `observe` aggregate, so
    // convergence costs zero extra jobs and the per-step changed-flag
    // bookkeeping (an extra left join per propagation) disappears.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast(DecimalType(38, 0)))).collect()(0).getDecimal(0) match {
        case null => java.math.BigDecimal.ZERO // empty vertex set: sum is NULL
        case s => s
      }

    var labels =
      if (startIter > 0) graft.ops.TableIO.read(spark, labelPath(startIter - 1))
        .select($"id", $"label")
      else {
        val init = vertices.select(col(vertices.columns.head).as("id"))
          .withColumn("label", $"id")
        graft.ops.TableIO.write(init, s"${cfg.workDir}/labels_init")
        graft.ops.TableIO.read(spark, s"${cfg.workDir}/labels_init")
      }
    var prevSum = labelSum(labels) // one tiny agg at (re)start

    val metrics = Vector.newBuilder[IterationMetrics]
    var iter = startIter
    // on resume, PROBE the loaded checkpoint instead of assuming: a prior
    // run that converged on its last allowed round resumes as already
    // converged (no confirm round, no spurious exhaustion throw), while a
    // prior CAPPED run resumes unconverged and — if maxIterations was not
    // raised — hits the loud exhaustion failure below rather than
    // silently returning split clusters
    var converged = startIter > 0 && timed("cluster.resume_probe") {
      und.join(labels.select($"id".as("b"), $"label".as("lb")), Seq("b"))
        .join(labels.select($"id".as("a"), $"label".as("la")), Seq("a"))
        .filter($"lb" < $"la").limit(1).isEmpty
    }
    try while (!converged && iter < cfg.maxIterations) {
      // two min-label propagation steps per checkpoint round: each round
      // has a fixed scheduling + checkpoint-IO cost that dwarfs the joins
      // themselves on the (interned) string graph, so advancing the
      // frontier twice per round halves the fixed overhead per unit of
      // progress. Each step is TWO shuffles (labels→edge key; union-min
      // by id) — the neighbor min and the self label merge in one
      // aggregate, and the pre-partitioned edge side never reshuffles.
      def propagate(l: DataFrame): DataFrame =
        und.join(l.select($"id".as("b"), $"label"), Seq("b"))
          .select($"a".as("id"), $"label")
          .unionByName(l)
          .groupBy($"id").agg(min($"label").as("label"))
      // NO pointer-jumping (label := label(label)) round: it was measured
      // 3× slower than a plain round — the self-join keys on `label`,
      // which is exactly the maximally-skewed column once clusters start
      // converging (every member of a cluster carries the same key) — and
      // it saved zero rounds on real variant graphs (ER clusters are
      // star-shaped with short chains; double propagation already covers
      // depth 2 per round). Pathological long chains are bounded by
      // maxIterations; a large-star/small-star rewrite is the documented
      // escalation path if one ever appears.
      val next = propagate(propagate(labels))

      val obs = org.apache.spark.sql.Observation(s"labels_iter_$iter")
      timed(s"cluster.write_$iter") {
        next.observe(obs, sum($"label".cast(DecimalType(38, 0))).as("label_sum"))
          .write.mode(SaveMode.Overwrite).format(graft.ops.TableIO.format)
          .save(labelPath(iter)) // checkpoint: cuts lineage (Iceberg table when the runtime jar is present)
      }
      val curSum = obs.get.apply("label_sum") match {
        case null => java.math.BigDecimal.ZERO // empty vertex set
        case s: java.math.BigDecimal => s
      }
      val checked = graft.ops.TableIO.read(spark, labelPath(iter))
      val delta = prevSum.subtract(curSum)
      // per-partition lineage metrics are METRIC-ONLY work (one extra scan
      // + collect per round) — gated on cfg.collectStats like every other
      // stats action, per the Config contract; production keeps the JSONL
      if (cfg.collectStats) {
        val perPartition = timed(s"cluster.metrics_$iter") {
          checked
            .groupBy(spark_partition_id().as("partition_id"))
            .agg(count(lit(1)).as("rows"))
            .collect()
        }
        val rows = perPartition.map(_.getLong(1)).sum
        metrics += IterationMetrics(iter, delta, rows, perPartition.length)
        // per-partition lineage metrics as JSON lines via NIO — durable per
        // iteration (resumable) without spinning a Spark job for a 32-row
        // write (was ~0.5 s/iteration of pure scheduling overhead)
        val metricsJson = perPartition.sortBy(_.getInt(0)).map(r =>
          s"""{"iteration":$iter,"partition_id":${r.getInt(0)},""" +
            s""""rows":${r.getLong(1)},"label_delta":"$delta"}""").mkString("", "\n", "\n")
        Files.writeString(
          Paths.get(s"${cfg.workDir}/label_metrics_iter_$iter.jsonl"), metricsJson)
      } else {
        metrics += IterationMetrics(iter, delta, -1L, -1)
      }

      labels = checked.select($"id", $"label")
      // The zero-delta test only certifies convergence one full round
      // AFTER the fixpoint — a pure "confirm" round that costs a 2-step
      // propagate + checkpoint write. A direct fixpoint probe is far
      // cheaper (two shuffled-hash joins over the pre-partitioned edge
      // side, no write, early-out on first improvable edge): min-label
      // propagation is at fixpoint iff NO edge (a,b) still has
      // label(b) < label(a). Probing after each round replaces the
      // whole confirm round with one ~10× cheaper aggregate.
      converged = delta.signum() == 0 || timed(s"cluster.probe_$iter") {
        und.join(labels.select($"id".as("b"), $"label".as("lb")), Seq("b"))
          .join(labels.select($"id".as("a"), $"label".as("la")), Seq("a"))
          .filter($"lb" < $"la").limit(1).isEmpty
      }
      prevSum = curSum
      iter += 1
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prevPreferSMJ)
    }
    und.unpersist()
    // FAIL LOUD on iteration exhaustion: returning the last unconverged
    // labels silently splits clusters (members still grouped under
    // intermediate ancestors) — the one failure mode a clustering engine
    // must never hide. The resume-entry probe above makes this exact:
    // a resumed-converged run passes, a resumed-capped run with an
    // unraised maxIterations throws. Checkpoints are on disk, so a rerun
    // with a higher maxIterations resumes from here.
    if (!converged)
      throw new IllegalStateException(
        s"cluster: not converged after ${cfg.maxIterations} iterations " +
          s"(workDir=${cfg.workDir}; resume with a higher maxIterations)")
    (labels, metrics.result())
  }

  /** Connected components specialised to the FOREST `matchEdges` emits.
    *
    * Every accepted edge is oriented satellite→hub strictly upward in the
    * (freq, id) total order, and the rnk=1 top-hub cap keeps exactly one
    * out-edge per satellite — so the match graph is a functional forest:
    * acyclic, ≤1 parent per node. Components of a forest need no
    * undirected min-label propagation. Pointer-jumping
    * (parent := parent(parent)) doubles the resolved depth per round over
    * a table with ONE row per satellite — vs 2 rows per edge, a union and
    * a groupBy per propagation STEP in `cluster` — so a depth-d tree
    * resolves in ceil(log2 d) rounds (real variant forests: d ≤ 3), and
    * the component label (min member id, bit-identical to `cluster`'s
    * fixpoint on the same edges) is one partial-aggregating groupBy at
    * the end.
    *
    * Same operational contract as `cluster`: each round checkpoints the
    * parent map to `parents_iter_k` parquet (lineage cut + crash resume
    * via cfg.resume), appends per-partition metrics JSONL, and converges
    * via a zero-advanced observe riding the write or an early-out
    * fixpoint probe (any parent that still has a parent). Root-heavy
    * skew (a mega-hub's satellites all carry the hub's key) stays with
    * sort-merge joins so AQE skew-split can divide hot partitions, and
    * the min-per-root aggregate combines map-side by construction.
    */
  def forestLabels(
      vertices: DataFrame, // (id)
      edges: DataFrame, // (src, dst) — unique src, acyclic
      cfg: Config): (DataFrame, Vector[IterationMetrics]) = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val (fs, workPath) = hadoopFs(spark, cfg.workDir)

    // data-sized loop width (same rationale as `cluster`): one row per
    // satellite, ~2M rows per partition, floor of two waves per core
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val minParts = 2 * spark.sparkContext.defaultParallelism
    val par0 = edges.select($"src".as("id"), $"dst".as("par"))
    val parRows = par0.count()
    val loopParts = math.max(minParts.toLong, math.min(
      math.max(sessionParts, minParts).toLong,
      parRows / 2000000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)

    def parPath(i: Int) = s"${cfg.workDir}/parents_iter_$i"
    def labelPath(i: Int) = s"${cfg.workDir}/labels_iter_$i"
    val startIter =
      if (cfg.resume) resumePoint(fs, workPath, "parents_iter_")
      else {
        cleanIterFiles(fs, workPath, "parents_iter_")
        cleanIterFiles(fs, workPath, "labels_iter_")
        0
      }

    var par =
      if (startIter > 0) graft.ops.TableIO.read(spark, parPath(startIter - 1))
      else par0

    val metrics = Vector.newBuilder[IterationMetrics]
    var iter = startIter
    // resume-entry probe (same contract as `cluster`): a resumed
    // checkpoint is converged iff no parent still has a grandparent —
    // a resumed-capped run with an unraised maxIterations then hits the
    // loud exhaustion failure instead of assembling split clusters
    var converged = startIter > 0 && timed("forest.resume_probe") {
      par.as("p").join(par.select($"id".as("par"), $"par".as("gpar")), Seq("par"))
        .filter($"gpar" =!= $"par").limit(1).isEmpty
    }
    try while (!converged && iter < cfg.maxIterations) {
      val grand = par.select($"id".as("par"), $"par".as("gpar"))
      val jumped = par.join(grand, Seq("par"), "left")
        .select($"id", coalesce($"gpar", $"par").as("par"),
          $"gpar".isNotNull.cast("long").as("advanced"))
      val obs = org.apache.spark.sql.Observation(s"parents_iter_$iter")
      timed(s"forest.write_$iter") {
        jumped.observe(obs, sum($"advanced").as("advanced"))
          .select($"id", $"par")
          .write.mode(SaveMode.Overwrite).format(graft.ops.TableIO.format)
          .save(parPath(iter))
      }
      val advanced = obs.get.apply("advanced") match {
        case null => 0L
        case l: java.lang.Long => l.longValue()
      }
      val checked = graft.ops.TableIO.read(spark, parPath(iter))
      // per-partition lineage metrics are METRIC-ONLY work (one extra scan
      // + collect per round) — gated on cfg.collectStats like every other
      // stats action, per the Config contract ("false = skip all
      // metric-only actions"); production runs keep the JSONL
      if (cfg.collectStats) {
        val perPartition = timed(s"forest.metrics_$iter") {
          checked.groupBy(spark_partition_id().as("partition_id"))
            .agg(count(lit(1)).as("rows")).collect()
        }
        val rows = perPartition.map(_.getLong(1)).sum
        metrics += IterationMetrics(
          iter, java.math.BigDecimal.valueOf(advanced), rows, perPartition.length)
        val metricsJson = perPartition.sortBy(_.getInt(0)).map(r =>
          s"""{"iteration":$iter,"partition_id":${r.getInt(0)},""" +
            s""""rows":${r.getLong(1)},"advanced":$advanced}""").mkString("", "\n", "\n")
        Files.writeString(
          Paths.get(s"${cfg.workDir}/parent_metrics_iter_$iter.jsonl"), metricsJson)
      } else {
        metrics += IterationMetrics(
          iter, java.math.BigDecimal.valueOf(advanced), -1L, -1)
      }
      par = checked
      // fixpoint iff no parent still has a parent; probing after an
      // advancing round saves the pure confirm round (early-out limit 1)
      converged = advanced == 0L || timed(s"forest.probe_$iter") {
        par.join(par.select($"id".as("par")), Seq("par"), "left_semi")
          .limit(1).isEmpty
      }
      iter += 1
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // FAIL LOUD on iteration exhaustion (same contract as `cluster`):
    // assembling with non-root parents groups members under intermediate
    // ancestors — silently split clusters. Exact thanks to the
    // resume-entry probe above.
    if (!converged)
      throw new IllegalStateException(
        s"forestLabels: not converged after ${cfg.maxIterations} pointer-" +
          s"doubling rounds (workDir=${cfg.workDir}; resume with a higher " +
          "maxIterations)")

    // assemble: every tree member (satellites + the root itself) grouped
    // by root, labeled with the min member id; isolated vertices label
    // themselves. Partial aggregation absorbs root skew map-side.
    val rootSelf = par.select($"par".as("id"), $"par").distinct()
    val all = par.unionByName(rootSelf)
    val minPerRoot = all.groupBy($"par").agg(min($"id").as("label"))
    val treeLabels = all.join(minPerRoot, Seq("par")).select($"id", $"label")
    val assembled = vertices.select(col(vertices.columns.head).as("id"))
      .join(treeLabels, Seq("id"), "left")
      .select($"id", coalesce($"label", $"id").as("label"))
    // materialize the FINAL labels once (same `labels_iter_k` naming as
    // the generic engine, so every labels consumer — resume tooling,
    // ScalingBench's cross-level identity check — reads either engine's
    // output identically). One small write per run (one row per string),
    // and the read-back cuts the assembly lineage before the
    // corpus-sized membership-expand join reuses the frame.
    timed(s"forest.labels_write") {
      // data-sized write width (same loopParts formula as the rounds):
      // the assembly joins run at session width for parallelism, but the
      // label table itself is string-sized — committing 32 near-empty
      // files costs more than the rows; coalesce merges post-join without
      // reshuffling. At corpus scale loopParts is thousands — unchanged.
      assembled.coalesce(loopParts).write.mode(SaveMode.Overwrite)
        .format(graft.ops.TableIO.format).save(labelPath(iter))
    }
    (graft.ops.TableIO.read(spark, labelPath(iter)), metrics.result())
  }

  // ---------------------------------------------------------------- eval

  final case class EvalResult(
      tp: Long, fp: Long, fn: Long,
      precision: Double, recall: Double, f1: Double,
      labeledPairs: Long)

  /** Mention-level labeled-pair universe: pairs whose interned strings
    * share a kept blocking key (the candidate string pairs expanded through
    * membership) plus same-string mention pairs. Evaluation-only expansion;
    * at production scale this would be sampled. */
  def labeledPairUniverse(stringPairs: DataFrame, membership: DataFrame): DataFrame = {
    val spark = stringPairs.sparkSession
    import spark.implicits._
    // carry the FULL 128-bit identity per side (the file's contract at
    // withMentionIds: mention-level joins key on both columns — a 64-bit
    // universe would fan out on a collision at 10^12 rows and silently
    // inflate tp/fp); pair orientation orders by the (id, id2) struct
    val mem = membership.select(
      struct($"mention_id", $"mention_id2").as("m"), $"string_id")
    val crossString = stringPairs
      .join(mem.withColumnRenamed("string_id", "src").withColumnRenamed("m", "m_src"), Seq("src"))
      .join(mem.withColumnRenamed("string_id", "dst").withColumnRenamed("m", "m_dst"), Seq("dst"))
      .select(least($"m_src", $"m_dst").as("s"), greatest($"m_src", $"m_dst").as("d"))
    val sameString = mem.as("a")
      .join(mem.as("b"), $"a.string_id" === $"b.string_id" && $"a.m" < $"b.m")
      .select($"a.m".as("s"), $"b.m".as("d"))
    crossString.unionByName(sameString)
      .select($"s.mention_id".as("src"), $"s.mention_id2".as("src2"),
        $"d.mention_id".as("dst"), $"d.mention_id2".as("dst2"))
      .dropDuplicates("src", "src2", "dst", "dst2")
  }

  /** Mention-level pairwise metrics computed at STRING granularity with
    * multiplicities — algebraically identical to expanding the universe
    * through membership (labeledPairUniverse + evaluate), because every
    * mention of an interned string carries the same entity (vocabulary
    * separation: canonical names are ≥3 edits apart, corruption ≤1 edit,
    * so no match key straddles entities — violations are counted and
    * must be zero) and the same cluster label (labels are assigned per
    * string). A string pair (s,d) contributes freq_s·freq_d mention
    * pairs; a single string contributes C(freq,2) same-string pairs,
    * always predicted-positive (one string = one label) and always true
    * (one string = one entity). The expanded form materializes
    * O(Σ freq_s·freq_d) rows — quadratic in hot-string frequency; at 2M
    * Zipf pages it starved the driver into executor-heartbeat death.
    * This form is O(|string pairs|). */
  def evaluateWeighted(
      stringPairs: DataFrame, // (src, dst) candidate string pairs
      strings: DataFrame, // (string_id, match_key, freq)
      membership: DataFrame, // (mention_id, string_id)
      truth: DataFrame, // (mention_id, entity_id)
      stringLabels: DataFrame): EvalResult = { // (id, label) over string ids
    val spark = stringPairs.sparkSession
    import spark.implicits._
    // mention-level join on the FULL 128-bit identity pair
    val stringEntity = membership
      .join(truth.select($"mention_id", $"mention_id2", $"entity_id"),
        Seq("mention_id", "mention_id2"))
      .groupBy($"string_id")
      .agg(min($"entity_id").as("entity_id"),
        countDistinct($"entity_id").as("n_entities"),
        count(lit(1)).as("n_mentions"))
    val info = strings.select($"string_id", $"freq")
      .join(stringEntity, Seq("string_id"))
      .join(stringLabels.select($"id".as("string_id"), $"label"), Seq("string_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Coverage guard: the weighted metrics weight each string by its full
    // freq, which is only valid if truth and stringLabels cover EVERY
    // mention/string — assert it instead of silently diverging from the
    // expanded labeledPairUniverse+evaluate when coverage is partial.
    val cov = info.agg(count(lit(1)).as("n_strings"),
      coalesce(sum($"n_mentions"), lit(0L)).as("n_m"),
      coalesce(sum(when($"freq" =!= $"n_mentions", 1L).otherwise(0L)), lit(0L))
        .as("freq_mismatch")).collect()(0)
    val nStrings = strings.count()
    require(cov.getLong(0) == nStrings && cov.getLong(2) == 0L,
      s"evaluateWeighted coverage violated: ${nStrings - cov.getLong(0)} strings " +
        s"dropped by the truth/label joins, ${cov.getLong(2)} strings with " +
        "truth-joined mention count != freq — use the expanded " +
        "labeledPairUniverse + evaluate instead")
    // Decimal(38,0) weight arithmetic: freq·(freq−1) wraps a signed 64-bit
    // Long at freq ≳ 3.04e9 — exactly the Zipf-hot frequencies the
    // weighted form exists for at the 10^12-page design point. Spark
    // (non-ANSI) wraps silently; decimal sums are exact, and the final
    // longValueExact() conversions below fail LOUD if a metric genuinely
    // exceeds Long range instead of going quietly negative.
    val dec = DecimalType(38, 0)
    val sameAgg = info.agg(
      coalesce(sum($"freq".cast(dec) * ($"freq" - 1)), lit(0L).cast(dec))
        .as("same_tp2"),
      coalesce(sum(when($"n_entities" > 1, 1L).otherwise(0L)), lit(0L)).as("mixed"))
      .collect()(0)
    val sameTp = sameAgg.getDecimal(0).divide(java.math.BigDecimal.valueOf(2))
      .longValueExact() // product always even: exact halving
    val mixed = sameAgg.getLong(1)
    require(mixed == 0L,
      s"$mixed interned strings map to multiple entities — the weighted " +
        "evaluation's per-string invariant is violated; use the expanded " +
        "labeledPairUniverse + evaluate instead")
    val cross = stringPairs
      .join(info.select($"string_id".as("src"), $"freq".as("src_f"),
        $"entity_id".as("src_e"), $"label".as("src_l")), Seq("src"))
      .join(info.select($"string_id".as("dst"), $"freq".as("dst_f"),
        $"entity_id".as("dst_e"), $"label".as("dst_l")), Seq("dst"))
      .select(($"src_e" === $"dst_e").as("m"), ($"src_l" === $"dst_l").as("p"),
        ($"src_f".cast(dec) * $"dst_f").as("w")) // decimal: no silent wrap
    val zero = lit(0L).cast(dec)
    val agg = cross.agg(
      coalesce(sum(when($"m" && $"p", $"w").otherwise(zero)), zero).as("tp"),
      coalesce(sum(when(!$"m" && $"p", $"w").otherwise(zero)), zero).as("fp"),
      coalesce(sum(when($"m" && !$"p", $"w").otherwise(zero)), zero).as("fn"),
      coalesce(sum($"w"), zero).as("n")).collect()(0)
    info.unpersist()
    val (tp, fp, fn, n) = (
      agg.getDecimal(0).longValueExact() + sameTp,
      agg.getDecimal(1).longValueExact(),
      agg.getDecimal(2).longValueExact(),
      agg.getDecimal(3).longValueExact() + sameTp)
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val r = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    EvalResult(tp, fp, fn, p, r, f1, n)
  }

  /** Pairwise F1 over labeled pairs sharing a blocking key (BASELINE
    * metric). `universe` = mention-level labeled pairs carrying the full
    * 128-bit identity per side (src, src2, dst, dst2), `truth` maps
    * (mention_id, mention_id2) → entity_id, `labels` maps
    * (id, id2) → cluster label. Every join here keys on BOTH identity
    * columns (the withMentionIds contract) so a 64-bit collision cannot
    * fan a pair out and inflate tp/fp. */
  def evaluate(universe: DataFrame, truth: DataFrame, labels: DataFrame): EvalResult = {
    val spark = universe.sparkSession
    import spark.implicits._
    val t = truth.select($"mention_id", $"mention_id2", $"entity_id")
    val l = labels.select($"id".as("mention_id"), $"id2".as("mention_id2"), $"label")
    def as(df: DataFrame, side: String, v: String, out: String): DataFrame =
      df.withColumnRenamed("mention_id", side)
        .withColumnRenamed("mention_id2", s"${side}2")
        .withColumnRenamed(v, out)
    val joined = universe
      .join(as(t, "src", "entity_id", "src_e"), Seq("src", "src2"))
      .join(as(t, "dst", "entity_id", "dst_e"), Seq("dst", "dst2"))
      .join(as(l, "src", "label", "src_l"), Seq("src", "src2"))
      .join(as(l, "dst", "label", "dst_l"), Seq("dst", "dst2"))
      .select(
        ($"src_e" === $"dst_e").as("is_match"),
        ($"src_l" === $"dst_l").as("predicted"))
    val agg = joined.agg(
      coalesce(sum(when($"is_match" && $"predicted", 1L).otherwise(0L)), lit(0L)).as("tp"),
      coalesce(sum(when(!$"is_match" && $"predicted", 1L).otherwise(0L)), lit(0L)).as("fp"),
      coalesce(sum(when($"is_match" && !$"predicted", 1L).otherwise(0L)), lit(0L)).as("fn"),
      count(lit(1)).as("n")).collect()(0)
    val (tp, fp, fn, n) = (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val r = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    EvalResult(tp, fp, fn, p, r, f1, n)
  }

  // ---------------------------------------------------------------- e2e

  final case class RunResult(
      mentions: Long, distinctStrings: Long, stats: BlockingStats,
      acceptedPairs: Long, clusters: Long, iterations: Int, eval: EvalResult)

  final case class PipelineOutput(
      mentions: Long, distinctStrings: Long, stats: BlockingStats,
      acceptedPairs: Long, clusters: Long, iterations: Int,
      pairs: DataFrame, membership: DataFrame, labels: DataFrame,
      strings: DataFrame, stringLabels: DataFrame)

  /** Hadoop filesystem for the workDir — java.io.File would silently
    * no-op on hdfs:///s3a:// workDirs (listFiles returns null), leaving
    * the stale-checkpoint shadowing live while claiming it fixed, and
    * making resume silently restart from 0. */
  private def hadoopFs(spark: SparkSession, workDir: String) = {
    val p = new org.apache.hadoop.fs.Path(workDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p): Unit
    (fs, p)
  }

  private def iterEntries(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, prefix: String)
      : Vector[(Int, org.apache.hadoop.fs.Path)] =
    (try fs.listStatus(dir).toVector
     catch { case _: java.io.FileNotFoundException => Vector.empty })
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix))
          scala.util.Try(n.stripPrefix(prefix).toInt).toOption
            .map(i => (i, st.getPath))
        else None
      }

  /** Resume point for an iteration-checkpoint family: the first iteration
    * AFTER the highest COMPLETE checkpoint. A directory that merely
    * exists is not a checkpoint — a job killed mid-write leaves a partial
    * task-file subset (committer v2 / object stores) or only `_temporary`
    * (v1); resuming from either silently drops rows from every later
    * label table. Completeness = the committer's `_SUCCESS` marker
    * (requires the default `mapreduce.fileoutputcommitter.marksuccessfuljobs=true`;
    * Iceberg commits atomically through its metadata layer, so a readable
    * table IS committed there). Incomplete leftovers above the resume
    * point are rewritten by the loop's Overwrite saves. */
  private def resumePoint(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, prefix: String): Int = {
    def complete(p: org.apache.hadoop.fs.Path): Boolean =
      if (graft.ops.TableIO.format == "iceberg") fs.exists(p)
      else fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    val done = iterEntries(fs, dir, prefix).collect {
      case (i, p) if complete(p) => i
    }
    if (done.isEmpty) 0 else done.max + 1
  }

  /** Remove a previous run's iteration checkpoints from the workDir on a
    * FRESH (non-resume) run: the final checkpoint index varies with the
    * round count, so a stale higher-indexed table from a longer prior run
    * would otherwise survive and be read by max-index consumers (the
    * documented labels contract) in place of this run's output. A failed
    * delete FAILS LOUD for the same reason — a survivor silently shadows
    * the new run's output. */
  private def cleanIterFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, prefix: String): Unit =
    iterEntries(fs, dir, prefix).foreach { case (_, p) =>
      if (!fs.delete(p, true) && fs.exists(p))
        throw new java.io.IOException(
          s"cannot remove stale checkpoint $p — it would shadow this run's output")
    }

  private def timed[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (sys.env.contains("GRAFT_STAGE_TIMING"))
      println(f"[stage] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** The timed pipeline: pages → mentions → intern → block → score →
    * cluster. No evaluation work (truth/universe expansion) — this is the
    * unit ScalingBench/Bench measure. */
  def runPipeline(spark: SparkSession, cfg: Config): PipelineOutput = {
    import spark.implicits._
    val pages = Corpus.pages(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF()
    val mentions = extractMentions(pages).persist(StorageLevel.MEMORY_AND_DISK)
    val nMentions = timed("extract")(if (cfg.collectStats) mentions.count() else -1L)

    val (strings0, membership0) = internStrings(mentions)
    val strings = strings0.persist(StorageLevel.MEMORY_AND_DISK)
    val membership = membership0.persist(StorageLevel.MEMORY_AND_DISK)
    val nStrings = timed("intern")(if (cfg.collectStats) strings.count() else -1L)

    val (pairs, stats) = timed("blocking")(candidatePairs(strings, cfg))
    val accepted = matchEdges(pairs, strings, cfg,
        if (cfg.contextEvidence) Some(mentions) else None)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nAccepted = timed("scoring")(if (cfg.collectStats) accepted.count() else -1L)

    // cluster the *string* graph only (strings are the interned minority;
    // iterating label propagation over every mention would shuffle the
    // full corpus per iteration), then expand to mentions with ONE join
    // through the membership table.
    val (stringLabels, metrics) = timed("cluster")(
      if (cfg.forestCluster) forestLabels(strings.select($"string_id"), accepted, cfg)
      else cluster(strings.select($"string_id"), accepted, cfg))
    // Expand string labels to mentions with an EXPLICITLY SALTED join:
    // membership is Zipf-skewed on string_id (a hot surface form carries
    // millions of mentions on a single key at corpus scale, all hashed to
    // one shuffle partition). Salting the big side and replicating the
    // small side `saltBuckets`× makes the plan skew-free by construction
    // at any scale (AQE's skew-join split only rescues sort-merge joins
    // after the fact). Salt = hash(mention_id) — deterministic, so the
    // output stays partition-count invariant.
    val g = cfg.saltBuckets
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // The explicit repartition on the join key pins the join width to the
    // session's shuffle partitions: AQE otherwise coalesces this exchange
    // by its INPUT bytes (~64 MB advisory → a handful of tasks) and the
    // corpus-sized join runs nearly serial (measured 1.3× scaling 2→8
    // cores before the pin).
    val saltedMembership = membership
      .withColumn("salt", pmod(xxhash64($"mention_id"), lit(g)).cast("int"))
      .repartition(sessionParts, $"string_id", $"salt")
    val replicatedLabels = stringLabels
      .withColumnRenamed("id", "string_id")
      .select($"string_id", $"label",
        explode(transform(sequence(lit(0), lit(g - 1)), x => x.cast("int"))).as("salt"))
    val labels = saltedMembership
      .join(replicatedLabels, Seq("string_id", "salt"))
      .select($"mention_id".as("id"), $"mention_id2".as("id2"), $"label")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nClusters = timed("expand") {
      // the membership join is the only job that must run here; count it
      // always (it materializes the labels for callers)
      if (cfg.collectStats) labels.select($"label").distinct().count()
      else { labels.count(); -1L }
    }
    mentions.unpersist(); strings.unpersist(); accepted.unpersist()
    PipelineOutput(nMentions, nStrings, stats, nAccepted, nClusters,
      metrics.size, pairs, membership, labels, strings, stringLabels)
  }

  /** Release a PipelineOutput's persisted frames (pairs, membership,
    * labels — the three caches runPipeline leaves alive for the caller).
    * Repeated-run harnesses (Bench min-of-3, TuneMain sweeps) MUST call
    * this on every output they discard: each leaked mention-scale cache
    * evicts blocks the next timed run needs. */
  def release(o: PipelineOutput): Unit = {
    o.pairs.unpersist(); o.membership.unpersist(); o.labels.unpersist()
  }

  /** Full pipeline + pairwise-F1 evaluation against generator truth. */
  def run(spark: SparkSession, cfg: Config): RunResult = {
    import spark.implicits._
    val out = runPipeline(spark, cfg)
    val truth = withMentionIds(
      Corpus.truth(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF())
    val universe = labeledPairUniverse(out.pairs, out.membership)
    val eval = evaluate(universe, truth, out.labels)
    release(out)
    RunResult(out.mentions, out.distinctStrings, out.stats,
      out.acceptedPairs, out.clusters, out.iterations, eval)
  }
}
