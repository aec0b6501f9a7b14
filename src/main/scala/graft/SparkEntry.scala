package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers the operator inventory of SURVEY.md §2 plus the
  * training-data-pipeline operators (dedup / similarity / text analysis /
  * multimodal plumbing). Every query with a DuckDB-expressible semantics
  * has a matching `oracleSql` entry with *identical column names and
  * rounding*; n-gram/phonetic/reference-scorer queries without exact SQL
  * analogues are covered by ScalaTest goldens and get rows-only checks.
  */
object SparkEntry {

  /** Flagship: the entity-resolution pipeline end-to-end on a small
    * deterministic synthetic corpus — mention extraction → interning →
    * trigram+phonetic blocking → JW/Levenshtein scoring → union-find
    * clustering. Returns one row per cluster with its size. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = er.Pipeline.Config(
      nPages = 300, nEntities = 60, workDir = "/tmp/graft_entry")
    val pages = er.Corpus.pages(spark, cfg.nPages, cfg.nEntities, cfg.seed).toDF()
    val mentions = er.Pipeline.extractMentions(pages)
    val (strings, membership) = er.Pipeline.internStrings(mentions)
    val (pairs, _) = er.Pipeline.candidatePairs(strings, cfg)
    val accepted = er.Pipeline.matchEdges(pairs, strings, cfg)
    // cluster the (small, interned) string graph, then expand labels to
    // mentions through membership — mention and string id spaces stay
    // disjoint by design (see Pipeline.internStrings)
    val labels = Components.connectedComponents(
      strings.select(col("string_id").as("id")), accepted)
    labels.join(membership.select(col("string_id").as("id"), col("mention_id")), Seq("id"))
      .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core (S/F/A/J/K families)
    "q01_agg" -> (Relational.q01Agg _),
    "q02_join_topk" -> (Relational.q02JoinTopK _),
    "q03_window_topk" -> (Relational.q03WindowTopK _),
    "q04_dup_mark" -> (Relational.q04DupMark _),
    "q05_anti_join" -> (Relational.q05AntiJoin _),
    "q06_events_window" -> (Relational.q06EventsWindow _),
    "q07_json" -> (Relational.q07Json _),
    // reference text operators (X/G/A/J families)
    "q10_normalize" -> (TextOps.q10Normalize _),
    "q11_tokens" -> (TextOps.q11Tokens _),
    "q12_trigrams" -> (TextOps.q12Trigrams _),
    "q13_blocking_pairs" -> (TextOps.q13BlockingPairs _),
    "q14_pair_scores" -> (TextOps.q14PairScores _),
    "q15_metaphone" -> (TextOps.q15Metaphone _),
    "q16_match_score" -> (TextOps.q16MatchScore _),
    "q17_phrases" -> (Extras.q17Phrases _),
    "q18_prior_scores" -> (Extras.q18PriorScores _),
    // dedup suite
    "q20_exact_dedup" -> (Dedup.q20ExactDedup _),
    "q21_minhash" -> (Dedup.q21Minhash _),
    "q22_lsh_pairs" -> (Dedup.q22LshPairs _),
    "q23_ngram_jaccard" -> (Dedup.q23NgramJaccard _),
    "q24_simhash" -> (Dedup.q24Simhash _),
    "q25_embedding_neardup" -> (Dedup.q25EmbeddingNearDup _),
    // similarity search
    "q26_cosine_topk" -> (Similarity.q26CosineTopK _),
    "q27_ann_ivf" -> (Similarity.q27AnnIvf _),
    // text analysis + multimodal plumbing
    "q28_langid" -> (TextOps.q28LangId _),
    "q29_quality" -> (TextOps.q29Quality _),
    "q30_token_stats" -> (TextOps.q30TokenStats _),
    "q31_fingerprint" -> (TextOps.q31Fingerprint _),
    "q32_media_meta" -> (TextOps.q32MediaMeta _),
    // html:binary ingestion — visible-text extraction from page bytes
    // (tag strip, script/style/comment skip, entity decode, whitespace
    // collapse) with the oracle deriving expected text from the source
    // columns independently
    "q46_html_extract" -> (TextOps.q46HtmlExtract _),
    // URL canonicalization + registrable-domain grouping (parse_url,
    // tracking-param strip, per-PLD window count); oracle reconstructs
    // from source columns without parsing URLs
    "q47_url_normalize" -> (UrlOps.q47UrlNormalize _),
    // crawl link graph: <a href> outlink extraction from page bytes
    // (comment/script decoys excluded) + fixed-point integer PageRank
    // over the deterministic doc->doc graph
    "q48_link_extract" -> (LinkGraph.q48LinkExtract _),
    "q49_pagerank" -> (LinkGraph.q49PageRank _),
    // Gopher-style repetition quality filter: duplicate word-5-gram
    // permille per document (integer arithmetic, map-side only)
    "q50_repetition" -> (TextOps.q50Repetition _),
    // transitive clustering operator
    "q33_components" -> (Components.q33Components _),
    // incremental cluster maintenance over the same graph: history edges
    // clustered first, the maintenance window's new edges folded in via
    // incrementalComponents; oracle recomputes components from scratch
    "q45_incremental_components" -> (Components.q45IncrementalComponents _),
    // spatial cell join + area-set operators
    "q34_spatial_cell_join" -> (Extras.q34SpatialCellJoin _),
    "q35_areaset_ops" -> (Extras.q35AreasetOps _),
    // per-country address formatting (X14)
    "q36_format_address" -> (Extras.q36FormatAddress _),
    // J3/F9 house-number matching under the numeric-token gate
    "q37_housenumber_join" -> (Extras.q37HousenumberJoin _),
    // A6 greedy contextual area assembly (sequential fold as one HOF expr)
    "q38_area_assembly" -> (Extras.q38AreaAssembly _),
    // the full composed get_suggestions lifecycle (stages 4-10) — rows-only
    // check (reference scorer inside, no SQL analogue; goldens in
    // SuggestSpec mirror cyrillic_test.cc fixtures)
    "q39_suggest" -> (er.Suggest.q39Suggest _),
    // J5 exact point-in-polygon refinement over the cell join + S5 rings
    "q40_point_in_polygon" -> (Extras.q40PointInPolygon _),
    // the reference's full 345-rule OSM amenity-category matcher (X8 over
    // the complete category space, categories.h:691-1345)
    "q41_category_match" -> (Categories.q41CategoryMatch _),
    // get_suggestions stages 6-10 (attrs/K2/house numbers/area fold/
    // bonuses/dup-mark/top-n) over an injectable SQL-expressible score —
    // the q39 skeleton, hash-checked
    "q42_rank_skeleton" -> (er.Suggest.q42RankSkeleton _),
    // A8 weighted-distance city pick + J8 lockstep distinguishing-area
    // advance for same-location pairs (guess_context.cc:105-133,
    // get_suggestions.cc:745-763)
    "q43_area_disambig" -> (AreaPick.q43AreaDisambig _),
    // §2.10 subset-reuse cache (cache.h:52-108) as a batch identity:
    // prefix counts (the cached vector) + delta-gram postings only; the
    // oracle recomputes full-query counts from scratch
    "q44_subset_cache" -> (SubsetCache.q44SubsetCache _),
    // the full for_each_name ingestion shape: 5 base tags + the four
    // :<lang> prefix families, ;-split multi-values, dynamic language
    // interning to dense ids (typeahead.cc:41-77)
    "q51_for_each_name" -> (Ingest.q51ForEachName _),
    // reverse lookup against street POLYLINES: cell-join candidates +
    // exact clamped-projection distance kernel + per-probe top-n
    // (reverse.cc:94-126, geo::distance_to_polyline)
    "q52_reverse_streets" -> (ReverseGeo.q52ReverseStreets _),
    "q58_reverse_lookup" -> (ReverseGeo.q58ReverseLookup _),
    "q59_substring_dedup" -> (Dedup.q59SubstringDedup _),
    // test-set decontamination: eval-gram broadcast semi-join, zero
    // train-side shuffle before the per-doc agg (GPT-3/PaLM method)
    "q62_decontaminate" -> (Dedup.q62Decontaminate _),
    // deterministic hash-stratified sampling — the training-data mixing
    // primitive (map-side predicate, reproducible across runs/engines)
    "q53_stratified_sample" -> (Sampling.q53StratifiedSample _),
    // token-BUDGETED stratified sampling: per-stratum rate derived from
    // a token rollup, broadcast back; survivor path stays map-side
    "q60_token_budget_sample" -> (Sampling.q60TokenBudgetSample _),
    // the COMPOSED curation recipe: quality gate → exact dedup →
    // near-dup lifecycle → token-budget sampling, one lineage manifest
    "q61_curation_pipeline" -> (Curation.q61CurationPipeline _),
    // BM25 salient-term extraction: partial-agg tf, df/dl rollups,
    // broadcast scalar attach, per-doc WindowGroupLimit top-3
    "q54_bm25" -> (Bm25.q54Bm25 _),
    // end-to-end near-dup lifecycle: LSH candidates -> exact-Jaccard
    // verify -> transitive closure -> keep/drop manifest
    "q55_dedup_lifecycle" -> (Dedup.q55DedupLifecycle _),
    // multimodal audio column: WAV/RIFF header decode from bytes alone +
    // exact integer duration algebra (q32's image companion)
    "q56_audio_meta" -> (TextOps.q56AudioMeta _),
    // multimodal video column: MP4 ftyp/mvhd box decode from bytes +
    // timescale algebra + frame-sample stub (completes image/audio/video)
    "q57_video_meta" -> (TextOps.q57VideoMeta _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for q15/q16/q39 (Double Metaphone
    * and the reference scorer have no DuckDB analogue → rows-only check;
    * semantics pinned by ScalaTest goldens instead — TextGoldenSpec,
    * SuggestSpec). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++
      (TextOps.oracles - "q15_metaphone" - "q16_match_score") ++
      Dedup.oracles ++ Similarity.oracles ++ Components.oracles ++ Extras.oracles ++
      Categories.oracles ++ er.Suggest.oracles ++ AreaPick.oracles ++
      SubsetCache.oracles ++ UrlOps.oracles ++ LinkGraph.oracles ++
      Ingest.oracles ++ ReverseGeo.oracles ++ Sampling.oracles ++
      Curation.oracles ++
      Bm25.oracles
}
