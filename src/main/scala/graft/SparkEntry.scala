package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] that is SQL-expressible has a matching DuckDB
  * oracle in [[oracleSql]]; column aliases are kept identical on both
  * sides (the driver compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's default end-to-end flow (SURVEY.md §3.1): load ->
    * clean -> word-score -> project. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cleaned = graft.text.TextClean.cleanSource(
      docs, "text", "filtered", stem = false)
    graft.wordscore.WordScore.score(cleaned, "filtered", "computed")
      .select("doc_id", "text", "computed")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Queries.q1Agg(_, _)),
    "q2_join_agg" -> (Queries.q2JoinAgg(_, _)),
    "q3_filter_project" -> (Queries.q3FilterProject(_, _)),
    "q4_wordfreq" -> (Queries.q4WordFreq(_, _)),
    "q5_clean_text" -> (Queries.q5CleanText(_, _)),
    "q6_distinct" -> (Queries.q6Distinct(_, _)),
    "q7_avg_wordcount" -> (Queries.q7AvgWordCount(_, _)),
    "q8_dedup_exact" -> (Queries.q8DedupExact(_, _)),
    "q9_events_hourly" -> (Queries.q9EventsHourly(_, _)),
    "q10_topk" -> (Queries.q10TopK(_, _)),
    "q11_text_stats" -> (Queries.q11TextStats(_, _)),
    "q12_nullsafe_join" -> (Queries.q12NullSafeJoin(_, _)),
    "q13_levenshtein" -> (Queries.q13Levenshtein(_, _)),
    "q14_starjoin" -> (Queries.q14StarJoin(_, _)),
    "q15_wordscore_exact" -> (Queries.q15WordScoreExact(_, _)),
    "q16_wordscore_full" -> (Queries.q16WordScoreFull(_, _)),
    "q17_dedup_exact_rows" -> (Queries.q17DedupExactRows(_, _)),
    "q18_jaccard_pairs" -> (Queries.q18JaccardPairs(_, _)),
    "q19_text_profile" -> (Queries.q19TextProfile(_, _)),
    "q20_vector_stats" -> (Queries.q20VectorStats(_, _)),
    "q21_knn_exact" -> (Queries.q21KnnExact(_, _)),
    "q22_minhash_pairs" -> (Queries.q22MinhashPairs(_, _)),
    "q23_simhash_pairs" -> (Queries.q23SimhashPairs(_, _)),
    "q24_ann_lsh" -> (Queries.q24AnnLsh(_, _)),
    "q25_ml_train" -> (Queries.q25MlTrain(_, _)),
    "q26_scorelist" -> (Queries.q26ScoreList(_, _)),
    "q27_ann_ivf" -> (Queries.q27AnnIvf(_, _)),
    "q28_events_sliding" -> (Queries.q28EventsSliding(_, _)),
    "q29_user_sessions" -> (Queries.q29UserSessions(_, _)),
    "q30_cosine_neardup" -> (Queries.q30CosineNearDup(_, _)),
    "q31_asof_join" -> (Queries.q31AsofJoin(_, _)),
    "q32_range_join" -> (Queries.q32RangeJoin(_, _)),
    "q33_text_quality" -> (Queries.q33TextQuality(_, _)),
    "q34_chunks" -> (Queries.q34Chunks(_, _)),
    "q35_quantize" -> (Queries.q35Quantize(_, _)),
    "q36_splits" -> (Queries.q36Splits(_, _)),
    "q37_decontaminate" -> (Queries.q37Decontaminate(_, _)),
    "q38_repetition" -> (Queries.q38Repetition(_, _)),
    "q39_gram_topdf" -> (Queries.q39GramTopDf(_, _)),
    "q40_centroids" -> (Queries.q40Centroids(_, _)),
    "q41_redact" -> (Queries.q41Redact(_, _)),
    "q42_stratified" -> (Queries.q42Stratified(_, _)),
    "q43_rate_mix" -> (Queries.q43RateMix(_, _)),
    "q44_length_profile" -> (Queries.q44LengthProfile(_, _)),
    "q45_multimodal" -> (Queries.q45Multimodal(_, _)),
    "q46_packing" -> (Queries.q46Packing(_, _)),
    "q47_bloom_decontaminate" -> (Queries.q47BloomDecontaminate(_, _)),
    "q48_incremental_minhash" -> (Queries.q48IncrementalMinhash(_, _)),
    "q49_ann_batch" -> (Queries.q49AnnBatch(_, _)),
    "q50_skew_report" -> (Queries.q50SkewReport(_, _)),
    "q51_novel_docs" -> (Queries.q51NovelDocs(_, _)),
    "q52_unigram_logprob" -> (Queries.q52UnigramLogprob(_, _)),
    "q53_semantic_dedup" -> (Queries.q53SemanticDedup(_, _)),
    "q54_project" -> (Queries.q54Project(_, _)),
    "q55_similar_docs" -> (Queries.q55SimilarDocs(_, _)),
    "q56_schema_profile" -> (Queries.q56SchemaProfile(_, _)),
    "q57_curate" -> (Queries.q57Curate(_, _)),
    "q58_span_mask" -> (Queries.q58SpanMask(_, _)),
    "q59_retention" -> (Queries.q59Retention(_, _)),
    "q60_lang_pivot" -> (Queries.q60LangPivot(_, _)),
    "q61_rolling_daily" -> (Queries.q61RollingDaily(_, _)),
    "q62_collocations" -> (Queries.q62Collocations(_, _)),
    "q63_lang_unpivot" -> (Queries.q63LangUnpivot(_, _)),
    "q64_quality_gate" -> (Queries.q64QualityGate(_, _)),
    "q65_rollup" -> (Queries.q65Rollup(_, _)),
    "q66_approx_sketch" -> (Queries.q66ApproxSketch(_, _)),
    "q67_corpus_digest" -> (Queries.q67CorpusDigest(_, _)),
    "q68_oov_rate" -> (Queries.q68OovRate(_, _)),
    "q69_source_overlap" -> (Queries.q69SourceOverlap(_, _)),
    "q70_dup_best" -> (Queries.q70DupBest(_, _)),
    "q71_dsir_weight" -> (Queries.q71DsirWeight(_, _)),
    "q72_vocab_curve" -> (Queries.q72VocabCoverage(_, _)),
    "q73_quality_z" -> (Queries.q73QualityZscore(_, _)),
    "q74_containment" -> (Queries.q74Containment(_, _)),
    "q75_funnel" -> (Queries.q75Funnel(_, _)),
    "q76_topk_lang" -> (Queries.q76TopKLang(_, _)),
    "q77_detect_roles" -> (Queries.q77DetectRoles(_, _)),
    "q78_winnow_fingerprint" -> (Queries.q78WinnowFingerprint(_, _)),
    "q79_tfidf_keywords" -> (Queries.q79TfidfKeywords(_, _)),
    "q80_lexical_diversity" -> (Queries.q80LexicalDiversity(_, _)),
    "q81_dup_clusters" -> (Queries.q81DupClusters(_, _)),
    "q82_csv_roundtrip" -> (Queries.q82CsvRoundtrip(_, _)),
    "q83_emoji_substitute" -> (Queries.q83EmojiSubstitute(_, _)),
    "q84_wordlist_sink" -> (Queries.q84WordlistSink(_, _)),
    "q85_json_roundtrip" -> (Queries.q85JsonRoundtrip(_, _)),
    "q86_sentence_sentiment" -> (Queries.q86SentenceSentiment(_, _)),
    "q87_clean_stem" -> (Queries.q87CleanStem(_, _)),
    "q88_shard_order" -> (Queries.q88ShardOrder(_, _)),
    "q89_semantic_decon" -> (Queries.q89SemanticDecon(_, _)),
    "q90_image_decode" -> (Queries.q90ImageDecode(_, _)),
    "q91_audio_decode" -> (Queries.q91AudioDecode(_, _)),
    "q92_bucketed_join" -> (Queries.q92BucketedJoin(_, _)),
    "q93_upsert_merge" -> (Queries.q93UpsertMerge(_, _)),
    "q94_bm25" -> (Queries.q94Bm25(_, _)),
    "q95_bpe_merges" -> (Queries.q95BpeMerges(_, _)),
    "q96_bpe_tokens" -> (Queries.q96BpeTokens(_, _)),
    "q97_pagerank" -> (Queries.q97PageRank(_, _)),
    "q98_blocklist" -> (Queries.q98Blocklist(_, _)),
    "q99_winsorize" -> (Queries.q99Winsorize(_, _)),
    "q100_corpus_diff" -> (Queries.q100CorpusDiff(_, _)),
    "q101_orc_roundtrip" -> (Queries.q101OrcRoundtrip(_, _)),
    "q102_gap_fill" -> (Queries.q102GapFill(_, _)),
    "q103_zorder_skipping" -> (Queries.q103ZorderSkipping(_, _)),
    "q104_compaction_plan" -> (Queries.q104CompactionPlan(_, _)),
    "q105_token_budget" -> (Queries.q105TokenBudget(_, _)),
    "q106_source_cap" -> (Queries.q106SourceCap(_, _)),
    "q107_exact_sample" -> (Queries.q107ExactSample(_, _)),
    "q108_encoding_gate" -> (Queries.q108EncodingGate(_, _)),
    "q109_minhash_calibration" -> (Queries.q109MinhashCalibration(_, _)),
    "q110_cdc_chunks" -> (Queries.q110CdcChunks(_, _)),
    "q111_script_mix" -> (Queries.q111ScriptMix(_, _)),
    "q112_length_histogram" -> (Queries.q112LengthHistogram(_, _)),
    "q113_mask_decontaminate" -> (Queries.q113MaskDecontaminate(_, _)),
    "q114_nfc_gate" -> (Queries.q114NfcGate(_, _)),
    "q115_fertility" -> (Queries.q115Fertility(_, _)),
    "q116_shard_balance" -> (Queries.q116ShardBalance(_, _)),
    "q117_pseudonymize" -> (Queries.q117Pseudonymize(_, _)),
    "q118_datacard" -> (Queries.q118Datacard(_, _)),
    "q119_weighted_sample" -> (Queries.q119WeightedSample(_, _)),
    "q120_gap_stats" -> (Queries.q120GapStats(_, _)),
    "q121_transition_matrix" -> (Queries.q121TransitionMatrix(_, _)),
    "q122_asof_within" -> (Queries.q122AsofWithin(_, _)),
    "q123_scd2" -> (Queries.q123Scd2(_, _)),
    "q124_order_decorrelation" -> (Queries.q124OrderDecorrelation(_, _)),
    "q125_unigram_drift" -> (Queries.q125UnigramDrift(_, _)),
    "q126_proportional_sample" -> (Queries.q126ProportionalSample(_, _)),
    "q127_lang_confusion" -> (Queries.q127LangConfusion(_, _)),
    "q128_session_concurrency" -> (Queries.q128SessionConcurrency(_, _)),
    "q129_top_paths" -> (Queries.q129TopPaths(_, _)),
    "q130_funnel_latency" -> (Queries.q130FunnelLatency(_, _)),
    "q131_mixture_plan" -> (Queries.q131MixturePlan(_, _)),
    "q132_cli_score" -> (Queries.q132CliScore(_, _)),
    "q133_sniff_dialects" -> (Queries.q133SniffDialects(_, _)),
    "q134_ml_classifiers" -> (Queries.q134MlClassifiers(_, _)),
    "q135_bigram_lm" -> (Queries.q135BigramLm(_, _)),
    "q136_pack_plan" -> (Queries.q136PackPlan(_, _)),
    "q137_pack_summary" -> (Queries.q137PackSummary(_, _)),
    "q138_source_overlap" -> (Queries.q138SourceOverlap(_, _)),
    "q139_type_drift" -> (Queries.q139TypeDrift(_, _)),
    "q140_split_leakage" -> (Queries.q140SplitLeakage(_, _)),
    "q141_cli_train_wordscore" -> (Queries.q141CliTrainWordScore(_, _)),
    "q142_entity_pairs" -> (Queries.q142EntityPairs(_, _)),
    "q143_entity_ids" -> (Queries.q143EntityIds(_, _)),
    "q144_json_extract" -> (Queries.q144JsonExtract(_, _)),
    "q145_cluster_split" -> (Queries.q145ClusterSplit(_, _)),
    "q146_json_key_census" -> (Queries.q146JsonKeyCensus(_, _)),
    "q147_kmv_users" -> (Queries.q147KmvUsers(_, _)),
    "q148_transcripts" -> (Queries.q148Transcripts(_, _)),
    "q149_temperature_mix" -> (Queries.q149TemperatureMix(_, _)),
    "q150_kmv_merge" -> (Queries.q150KmvMerge(_, _)),
    "q151_kmv_rollup" -> (Queries.q151KmvRollup(_, _)),
    "q152_stream_gate" -> (Queries.q152StreamGate(_, _)),
    "q153_heavy_tokens" -> (Queries.q153HeavyTokens(_, _)),
    "q154_html_extract" -> (Queries.q154HtmlExtract(_, _)),
    "q155_domain_census" -> (Queries.q155DomainCensus(_, _)),
    "q156_gopher_rules" -> (Queries.q156GopherRules(_, _)),
    "q157_epoch_plan" -> (Queries.q157EpochPlan(_, _)),
    "q158_hard_negatives" -> (Queries.q158HardNegatives(_, _)),
    "q159_psi_drift" -> (Queries.q159PsiDrift(_, _)),
    "q160_confusable_dedup" -> (Queries.q160ConfusableDedup(_, _)),
    "q161_c4_lines" -> (Queries.q161C4Lines(_, _)),
    "q162_w2v_ann" -> (Queries.q162W2vAnn(_, _)),
    "q163_split_balance" -> (Queries.q163SplitBalance(_, _)),
    "q164_embedding_outliers" -> (Queries.q164EmbeddingOutliers(_, _)),
    "q165_ledger" -> (Queries.q165Ledger(_, _)),
    "q166_rank_calibrate" -> (Queries.q166RankCalibrate(_, _)),
    "q167_group_quantiles" -> (Queries.q167GroupQuantiles(_, _)),
    "q168_domain_cap" -> (Queries.q168DomainCap(_, _)),
    "q169_compression_signal" -> (Queries.q169CompressionSignal(_, _)),
    "q170_quality_model" -> (Queries.q170QualityModel(_, _)),
    "q171_csv_quarantine" -> (Queries.q171CsvQuarantine(_, _)),
    "q172_unigram_vocab" -> (Queries.q172UnigramVocab(_, _)),
    "q173_unigram_tokens" -> (Queries.q173UnigramTokens(_, _)),
    "q175_cli_curate" -> (Queries.q175CliCurate(_, _)),
    "q174_ivf_drift" -> (Queries.q174IvfDrift(_, _)),
    "q176_png_decode" -> (Queries.q176PngDecode(_, _)),
    "q177_jpeg_dims" -> (Queries.q177JpegDims(_, _)),
    "q178_video_frames" -> (Queries.q178VideoFrames(_, _)),
    "q179_wet_ingest" -> (Queries.q179WetIngest(_, _)),
    "q180_wordpiece_vocab" -> (Queries.q180WordpieceVocab(_, _)),
    "q181_wordpiece_tokens" -> (Queries.q181WordpieceTokens(_, _)),
    "q182_card_redact" -> (Queries.q182CardRedact(_, _)),
    "q183_ulaw_decode" -> (Queries.q183UlawDecode(_, _)),
    "q184_pq_recall" -> (Queries.q184PqRecall(_, _)),
    "q185_footer_census" -> (Queries.q185FooterCensus(_, _)),
    "q186_ivfpq_serve" -> (Queries.q186IvfPqServe(_, _)),
    "q187_warc_responses" -> (Queries.q187WarcResponses(_, _)),
    "q188_index_cli" -> (Queries.q188IndexCli(_, _)),
    "q189_typed_footer_census" -> (Queries.q189TypedFooterCensus(_, _)),
    "q190_ivfpq_append" -> (Queries.q190IvfPqAppend(_, _)),
    "q191_ivfpq_batch" -> (Queries.q191IvfPqBatch(_, _)),
    "q192_image_phash" -> (Queries.q192ImagePhash(_, _)),
    "q193_image_neardup" -> (Queries.q193ImageNeardup(_, _)),
    "q194_audio_phash" -> (Queries.q194AudioPhash(_, _)),
    "q195_audio_neardup" -> (Queries.q195AudioNeardup(_, _)),
    "q196_curate_blobs" -> (Queries.q196CurateBlobs(_, _)),
    "q197_ivfpq_residual" -> (Queries.q197IvfPqResidual(_, _)),
    "q198_ivfpq_rerank" -> (Queries.q198IvfPqRerank(_, _)),
    "q199_perceptual_incremental" -> (Queries.q199PerceptualIncremental(_, _)),
    "q200_perceptual_gate" -> (Queries.q200PerceptualGate(_, _)),
    "q201_curate_blob_tail" -> (Queries.q201CurateBlobTail(_, _)),
    "q202_ivfpq_opq" -> (Queries.q202IvfPqOpq(_, _)),
    "q203_video_neardup" -> (Queries.q203VideoNeardup(_, _)),
    "q204_curate_semantic_tail" -> (Queries.q204CurateSemanticTail(_, _)),
  )

  /** q97 oracle: the 10 PageRank power iterations unrolled as chained
    * CTEs (recursive-CTE aggregation is non-portable), arithmetic in
    * the same IEEE operation order as [[graft.ops.Graph.pageRank]] —
    * (1.0 - 0.85) stays a subtraction, teleport + 0.85 * sum stays
    * that shape — with scores rounded to 4 decimals before ranking. */
  private def pagerankSql(iterations: Int): String = {
    val steps = (1 to iterations).map { k =>
      s"""pr$k AS (
         |  SELECT d.dst AS node,
         |    (1.0 - 0.85) / n.c + 0.85 * sum(p.rank / d.deg) AS rank
         |  FROM und d JOIN pr${k - 1} p ON p.node = d.src CROSS JOIN n
         |  GROUP BY d.dst, n.c)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
       |    's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem WHERE l_partkey <= 2000),
       |und AS (
       |  SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM (
       |    SELECT src, dst FROM e UNION SELECT dst, src FROM e) u),
       |n AS (SELECT count(DISTINCT src) AS c FROM und),
       |pr0 AS (SELECT DISTINCT src AS node, 1.0 / n.c AS rank
       |        FROM und CROSS JOIN n),
       |$steps
       |SELECT node, round(rank * n.c, 4) AS score
       |FROM pr$iterations CROSS JOIN n
       |ORDER BY score DESC, node LIMIT 20""".stripMargin
  }

  /** q67 and q82 share one contract: the commutative md5-prefix corpus
    * digest of documents, straight from parquet. q67 pins the digest
    * operator itself; q82 computes the same digest AFTER a CSV
    * write→sniff→read round-trip, so any loss in the IO path breaks
    * the match against this parquet-side replay. */
  private val corpusDigestSql: String =
    """SELECT source, count(*) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(concat_ws(chr(1),
      |        doc_id::VARCHAR, text, lang)), 1, 15))::BIGINT) AS VARCHAR) AS digest
      |FROM documents GROUP BY source
      |ORDER BY source""".stripMargin

  /** q30 and q53 share one contract: both near-dup paths (SRP
    * multi-probe, SemDeDup cells) must recover exactly the brute-force
    * cosine >= 0.99 pair set of the planted-copy corpus. */
  private val plantedCosinePairSql: String =
    """WITH uni AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.e, b.e), 4) AS cosine
      |FROM uni a JOIN uni b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.e, b.e) >= 0.99
      |ORDER BY id_a, id_b""".stripMargin

  /** q37 and q47 share one contract: the Bloom prefilter path's exact
    * verify join makes its report bit-identical to the broadcast-join
    * path, so both check against the same SQL. */
  private val decontaminationReportSql: String =
    """WITH norm AS (
      |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(ws)-4),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
      |  FROM norm WHERE len(ws) >= 5
      |  UNION
      |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
      |  FROM norm WHERE len(ws) < 5 AND array_to_string(ws, ' ') <> ''),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
      |SELECT doc_id, count(*) AS n_hits
      |FROM grams JOIN bench USING (g)
      |WHERE doc_id % 10 <> 0
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Shared CTE prefix for the q142/q143 entity-resolution oracles:
    * the md5-tagged + planted-typo staging, name normalization,
    * 3-char blocking, and the Levenshtein-ratio pair stage (threshold
    * applied on the ROUNDED sim, matching `Entity.matchPairs`).
    * Declared `WITH RECURSIVE` so q143 can append its reachability
    * CTE; the keyword is inert for q142's non-recursive use. */
  private def entityPairsSql: String =
    """WITH RECURSIVE base AS (
      |  SELECT p_partkey AS id,
      |    substr(md5(p_partkey::VARCHAR), 1, 6) || ' ' || p_name AS name
      |  FROM part),
      |staged AS (
      |  SELECT id, name FROM base
      |  UNION ALL
      |  SELECT id + 1000000, substr(name, 1, length(name) - 1) || 'x'
      |  FROM base WHERE id % 7 = 0
      |  UNION ALL
      |  SELECT id + 2000000, 'x' || substr(name, 2)
      |  FROM base WHERE id % 11 = 0),
      |kk AS (
      |  SELECT id, nm, substr(nm, 1, 6) AS bp,
      |    substr(nm, greatest(length(nm) - 5, 1), 6) AS bs FROM (
      |    SELECT id,
      |      regexp_replace(regexp_replace(lower(trim(name)),
      |        '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g') AS nm
      |    FROM staged)
      |  WHERE nm <> ''),
      |bsn AS (SELECT bs, count(*) AS n FROM kk GROUP BY bs),
      |cand AS (
      |  SELECT a.id AS id_a, b.id AS id_b, a.nm AS na, b.nm AS nb
      |  FROM kk a JOIN kk b ON a.bp = b.bp AND a.id < b.id
      |  UNION ALL
      |  SELECT a.id, b.id, a.nm, b.nm
      |  FROM kk a JOIN kk b
      |    ON a.bs = b.bs AND a.id < b.id AND a.bp <> b.bp
      |  JOIN bsn ON bsn.bs = a.bs
      |  WHERE bsn.n <= 64),
      |pairs AS (
      |  SELECT * FROM (
      |    SELECT id_a, id_b,
      |      round(1.0 - levenshtein(na, nb)::DOUBLE
      |        / greatest(length(na), length(nb)), 4) AS sim
      |    FROM cand)
      |  WHERE sim >= 0.9)""".stripMargin

  /** Shared staging for the q144/q146 semi-structured oracles: the
    * same three-way payload reshape as `Queries.propsStage` — every
    * 13th event truncated to malformed JSON, every other remaining
    * even event enriched with a spliced-in `"u"` key, the rest raw.
    * Pure string surgery on both engines, so payloads are
    * byte-identical cross-engine. */
  private def propsStageSql: String =
    """SELECT event_id, event_type, user_id,
      |  CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 3)
      |       WHEN event_id % 2 = 0 THEN
      |         substr(props, 1, length(props) - 1)
      |           || ', "u": ' || user_id::VARCHAR || '}'
      |       ELSE props END AS props
      |FROM events""".stripMargin

  /** The q22 near-dup pair replay (trigram shingles, exact jaccard at
    * the 0.7 threshold) WITHOUT its ORDER BY — shared by q22 and the
    * q140 split-leakage audit, which wraps it. */
  private def minhashPairsSql: String =
    """WITH norm AS (
      |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(ws)-2),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
      |  FROM norm WHERE len(ws) >= 3
      |  UNION
      |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
      |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.7""".stripMargin

  /** Shared CTE prefix for the q136/q137 packing oracles: token
    * counts, the seeded 60-bit md5 order key (seed 0 — the '0:'
    * prefix), 4-shard assignment, and the per-shard running-sum
    * offset. The window sum is CAST back to BIGINT (DuckDB sums
    * BIGINT into HUGEINT, which pandas would coerce to float). */
  private def packPlanSql: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(
      |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
      |      w -> w <> '')) AS n_tokens
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, n_tokens,
      |    ('0x' || substr(md5('0:' || doc_id::VARCHAR), 1, 15))::BIGINT AS sort_key
      |  FROM tk WHERE n_tokens >= 1),
      |c AS (
      |  SELECT doc_id, n_tokens, sort_key, sort_key % 4 AS shard,
      |    CAST(sum(n_tokens) OVER (PARTITION BY sort_key % 4
      |      ORDER BY sort_key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      - n_tokens AS start_off
      |  FROM k)""".stripMargin

  /** The q33 composite-quality formula as a WITH-clause prefix
    * (tok/stats/agg/scored CTEs), shared by every oracle that replays
    * the 3-decimal quality contract (q64, q70, q73) so a formula or
    * rounding change cannot silently diverge between them. `carry`
    * lists the documents columns threaded through to `scored` beside
    * doc_id + quality. */
  private def qualityScoredCtes(carry: Seq[String]): String = {
    // trailing-comma form so an EMPTY carry list is legal SQL; `scored`
    // also exposes the token count (n AS tokens) for the budget/cap
    // oracles — existing consumers select columns by name, so the
    // extra CTE column is invisible to them
    val carryAgg = carry.map(c => s"d.$c, ").mkString
    val carrySel = carry.map(c => s"$c, ").mkString
    s"""WITH tok AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents) r
       |  WHERE w <> ''),
       |stats AS (
       |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
       |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
       |      'is','are','was','it','that','this','for','on','with','as',
       |      'at','by','be') THEN 1 ELSE 0 END) AS stops
       |  FROM tok GROUP BY doc_id),
       |agg AS (
       |  SELECT d.doc_id, ${carryAgg}
       |    coalesce(s.n, 0) AS n, coalesce(s.mtl, 0) AS mtl,
       |    coalesce(s.stops, 0) AS stops,
       |    CASE WHEN length(d.text) > 0 THEN
       |      (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
       |    ELSE 0.0 END AS punct
       |  FROM documents d LEFT JOIN stats s USING (doc_id)),
       |scored AS (
       |  SELECT doc_id, ${carrySel}n AS tokens,
       |    round(least(n / 20.0, 1.0) * 0.3
       |        + (1.0 - least(punct * 4, 1.0)) * 0.2
       |        + least(CASE WHEN n > 0 THEN stops::DOUBLE / n ELSE 0.0 END * 4, 1.0) * 0.3
       |        + CASE WHEN mtl BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS quality
       |  FROM agg)""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT c_mktsegment,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q3_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q4_wordfreq" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        |      FROM documents)
        |GROUP BY word
        |HAVING count(*) >= 5
        |ORDER BY n DESC, word""".stripMargin,
    "q5_clean_text" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    lower(text),
        |    '["'']', '', 'g'),
        |    '[\n\r\t]', '', 'g'),
        |    'rt\s+', '', 'g'),
        |    '@\w+', '', 'g'),
        |    '#', '', 'g'),
        |    'http\S+', '', 'g'),
        |    ' +', ' ', 'g'),
        |    '\s+', ' ', 'g') AS cleaned
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q6_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q7_avg_wordcount" ->
      """SELECT source,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_words
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q8_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT lower(text)) AS n_unique
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q9_events_hourly" ->
      """SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,
    "q10_topk" ->
      """SELECT o_custkey,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey
        |LIMIT 10""".stripMargin,
    "q11_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  length(text) AS text_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q12_nullsafe_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey IS NOT DISTINCT FROM o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q13_levenshtein" ->
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q15_wordscore_exact" -> graft.wordscore.WordScore.exactScoreOracleSql,
    // q16/q25: not SQL-expressible (fuzzy dictionary ladder / MLlib
    // training) — pinned literal-VALUES truth tables, the q77 pattern.
    // See PinnedOracles for the determinism + regeneration contract.
    "q16_wordscore_full" -> PinnedOracles.q16Sql,
    "q25_ml_train" -> PinnedOracles.q25Sql,
    "q17_dedup_exact_rows" ->
      """SELECT lang, count(*) AS n FROM (
        |  SELECT lang, row_number() OVER (
        |    PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    "q18_jaccard_pairs" ->
      """WITH rawtok AS (
        |  SELECT DISTINCT source, doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |bn AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |dfc AS (SELECT source, w, count(*) AS df FROM rawtok GROUP BY 1, 2),
        |tok AS (
        |  SELECT r.source, r.doc_id, r.w
        |  FROM rawtok r
        |  JOIN dfc ON dfc.source = r.source AND dfc.w = r.w
        |  JOIN bn ON bn.source = r.source
        |  WHERE dfc.df <= greatest(64, ceil(4 * sqrt(bn.n)))),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.source = b.source AND a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q19_text_profile" ->
      """WITH tok AS (
        |  SELECT doc_id, w
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) raw
        |  WHERE w <> ''),
        |stats AS (
        |  SELECT doc_id, count(*) AS n_tok, avg(length(w)) AS mtl,
        |    sum(CASE WHEN lower(w) IN ('the','a','an','and','or','of','to',
        |      'in','is','are','was','it','that','this','for','on','with',
        |      'as','at','by','be') THEN 1 ELSE 0 END) AS stops
        |  FROM tok GROUP BY doc_id)
        |SELECT d.doc_id,
        |  s.n_tok::BIGINT AS n_tokens,
        |  length(d.text)::BIGINT AS n_chars,
        |  round(s.mtl, 4) AS mean_token_len,
        |  round((length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text), 4) AS punct_ratio,
        |  round(s.stops::DOUBLE / s.n_tok, 4) AS stopword_ratio
        |FROM documents d JOIN stats s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q20_vector_stats" ->
      """SELECT vec_id, dims::BIGINT AS dims, round(sqrt(ss), 4) AS l2_norm
        |FROM (
        |  SELECT vec_id, len(embedding) AS dims, sum(x * x) AS ss
        |  FROM (SELECT vec_id, embedding, unnest(embedding)::DOUBLE AS x
        |        FROM embeddings) u
        |  GROUP BY vec_id, len(embedding)) s
        |ORDER BY vec_id""".stripMargin,
    "q26_scorelist" ->
      """WITH cats AS (
        |  SELECT lang, cast(dense_rank() OVER (ORDER BY lang) - 1 AS VARCHAR) AS category
        |  FROM (SELECT DISTINCT lang FROM documents) dl),
        |term_df AS (
        |  SELECT d.lang, u.w, count(DISTINCT d.doc_id) AS df
        |  FROM documents d,
        |       unnest(string_split(d.text, ' ')) AS u(w)
        |  WHERE u.w <> ''
        |  GROUP BY d.lang, u.w),
        |vocab AS (SELECT lang, w FROM term_df WHERE df >= 5),
        |overlap AS (
        |  SELECT w FROM (SELECT w, count(*) AS c FROM vocab GROUP BY w) o
        |  WHERE c > 2),
        |final AS (
        |  SELECT lang, w FROM vocab
        |  WHERE w NOT IN (SELECT w FROM overlap)),
        |counts AS (SELECT lang, count(*) AS n FROM final GROUP BY lang)
        |SELECT c.category, coalesce(n.n, 0)::BIGINT AS n_words
        |FROM cats c LEFT JOIN counts n ON c.lang = n.lang
        |ORDER BY c.category""".stripMargin,
    "q28_events_sliding" ->
      """WITH starts AS (
        |  SELECT event_type, ts,
        |    unnest([ (floor(epoch(ts)/1800)*1800)::BIGINT,
        |             (floor(epoch(ts)/1800)*1800 - 1800)::BIGINT ]) AS ws
        |  FROM events)
        |SELECT strftime(make_timestamp(ws*1000000), '%Y-%m-%d %H:%M') AS window_start,
        |       event_type, count(*) AS n
        |FROM starts
        |WHERE epoch(ts) >= ws AND epoch(ts) < ws + 3600
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q29_user_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 10 MINUTE OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q21_knn_exact" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x,
        |         unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id, sum(x*y) AS dot, sqrt(sum(x*x)) AS nx,
        |             sqrt(sum(y*y)) AS ny
        |      FROM pairs GROUP BY vec_id)
        |SELECT vec_id, round(dot / (nx * ny), 4) AS cosine
        |FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // q24: full SRP-LSH replay — seeded hyperplanes embedded as
    // literals, bucket signatures + multi-probe + exact rerank all
    // re-derived in SQL (see SimSearch.annLshOracleSql).
    "q24_ann_lsh" -> graft.ops.SimSearch.annLshOracleSql(
      "embeddings", "vec_id", "embedding",
      queryId = 0L, k = 10, bits = 8, dim = 64, seed = 42L),
    "q52_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
        |wc AS (SELECT doc_id, count(*) OVER (PARTITION BY w) AS c FROM t2),
        |d AS (SELECT doc_id, count(*) AS n_tokens, sum(ln(c)) AS slc
        |      FROM wc GROUP BY doc_id),
        |s AS (SELECT sum(n_tokens) AS total FROM d)
        |SELECT doc_id, n_tokens,
        |       round(ln(total) - slc / n_tokens, 3) AS avg_neg_logp
        |FROM d CROSS JOIN s
        |ORDER BY doc_id""".stripMargin,
    "q51_novel_docs" ->
      """WITH k AS (
        |  SELECT doc_id, lang,
        |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS nk
        |  FROM documents)
        |SELECT a.doc_id, a.lang FROM k a
        |WHERE a.doc_id % 2 <> 0
        |  AND NOT EXISTS (SELECT 1 FROM k b
        |                  WHERE b.doc_id % 2 = 0 AND b.nk = a.nk)
        |ORDER BY a.doc_id""".stripMargin,
    "q50_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n_rows
        |           FROM events GROUP BY user_id),
        |s AS (SELECT sum(n_rows) AS total, count(*) AS nkeys FROM c)
        |SELECT user_id, n_rows,
        |  round(n_rows / total, 4) AS share,
        |  round(n_rows::DOUBLE * nkeys / total, 4) AS skew
        |FROM c CROSS JOIN s
        |ORDER BY n_rows DESC, user_id
        |LIMIT 10""".stripMargin,
    // q49: the q24 SRP replay generalized to a query set (per-query
    // multi-probe + window top-k).
    "q49_ann_batch" -> graft.ops.SimSearch.annLshBatchOracleSql(
      "embeddings", "vec_id", "embedding",
      queryPred = "vid < 5", corpusPred = "vid >= 5",
      k = 5, bits = 8, dim = 64, seed = 42L),
    "q56_schema_profile" ->
      """WITH p AS (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
        |    count(*) - count(o_orderkey) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_value
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |    count(DISTINCT o_orderstatus),
        |    min(o_orderstatus), max(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |    count(DISTINCT o_orderpriority),
        |    min(o_orderpriority), max(o_orderpriority)
        |  FROM orders)
        |SELECT * FROM p ORDER BY "column"""".stripMargin,
    // q57: full 10-stage curation replay — every Curate.standard stage
    // recomputed in DuckDB (exact novelty, MinHash band collisions via
    // the SQL-replayable kernel, q33/q38/q52 gates, min-id exact dedup,
    // LSH-candidate + Jaccard-verified near dedup with recursive-CTE
    // closure, brute-force semantic pairs, 5-gram decontamination, split
    // assignment), each stage pinned by survivor count AND membership
    // digest. MATERIALIZED hints keep DuckDB from inlining the stage
    // chain exponentially.
    "q57_curate" ->
      """WITH RECURSIVE
        |-- framing: ingest = docs with embeddings, not in the historical slice
        |input AS MATERIALIZED (
        |  SELECT d.doc_id, d.text, d.source, e.embedding
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |  WHERE d.doc_id % 5 <> 0),
        |hist AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |bench AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0),
        |-- stage 1 novelty: md5(normalized) anti-join vs hist
        |s1 AS MATERIALIZED (
        |  SELECT i.* FROM input i
        |  WHERE md5(regexp_replace(lower(trim(i.text)), '\s+', ' ', 'g')) NOT IN
        |    (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) FROM hist)),
        |-- distinct word 3-gram shingles (whole-text gram for docs < 3 tokens)
        |norm1 AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM s1),
        |g_new AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm1 WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm1 WHERE len(ws) BETWEEN 1 AND 2),
        |normh AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM hist),
        |g_hist AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM normh WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM normh WHERE len(ws) BETWEEN 1 AND 2),
        |-- MinHash replay: base = 60-bit md5 prefix of the gram; per seed s,
        |-- h = (A*(2s+1) * base + B*(s+1)) mod 2^64; 12 seeds, 4 bands x 3 rows
        |seeds AS MATERIALIZED (
        |  SELECT s, (11400714819323198485::HUGEINT * (2*s+1)) % 18446744073709551616::HUGEINT AS a,
        |         (2685821657736338717::HUGEINT * (s+1)) AS off
        |  FROM (SELECT unnest(generate_series(0, 11)) AS s)),
        |band_new AS MATERIALIZED (
        |  SELECT doc_id, s // 3 AS band, list(h ORDER BY s) AS slice FROM (
        |    SELECT doc_id, s,
        |      min((a * ('0x' || substr(md5(g), 1, 15))::BIGINT::HUGEINT + off)
        |          % 18446744073709551616::HUGEINT) AS h
        |    FROM g_new CROSS JOIN seeds GROUP BY doc_id, s)
        |  GROUP BY doc_id, band),
        |band_hist AS MATERIALIZED (
        |  SELECT doc_id, s // 3 AS band, list(h ORDER BY s) AS slice FROM (
        |    SELECT doc_id, s,
        |      min((a * ('0x' || substr(md5(g), 1, 15))::BIGINT::HUGEINT + off)
        |          % 18446744073709551616::HUGEINT) AS h
        |    FROM g_hist CROSS JOIN seeds GROUP BY doc_id, s)
        |  GROUP BY doc_id, band),
        |-- stage 2 near novelty: drop docs with any band-slice collision vs hist
        |s2 AS MATERIALIZED (
        |  SELECT s1.* FROM s1
        |  WHERE doc_id NOT IN (
        |    SELECT DISTINCT n.doc_id FROM band_new n
        |    JOIN band_hist h ON n.band = h.band AND n.slice = h.slice)),
        |-- stage 3 quality gate (q33 formula, rounded to 3) >= 0.3
        |tok3 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM s2) r
        |  WHERE w <> ''),
        |stats3 AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','it','that','this','for','on','with','as',
        |      'at','by','be') THEN 1 ELSE 0 END) AS stops
        |  FROM tok3 GROUP BY doc_id),
        |s3 AS MATERIALIZED (
        |  SELECT s2.* FROM s2 JOIN (
        |    SELECT d.doc_id,
        |      round(least(coalesce(s.n, 0) / 20.0, 1.0) * 0.3
        |        + (1.0 - least((CASE WHEN length(d.text) > 0 THEN
        |            (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
        |            ELSE 0.0 END) * 4, 1.0)) * 0.2
        |        + least(CASE WHEN coalesce(s.n, 0) > 0 THEN coalesce(s.stops, 0)::DOUBLE / s.n ELSE 0.0 END * 4, 1.0) * 0.3
        |        + CASE WHEN coalesce(s.mtl, 0) BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS q
        |    FROM s2 d LEFT JOIN stats3 s USING (doc_id)) qs USING (doc_id)
        |  WHERE qs.q >= 0.3),
        |-- stage 4 repetition gate (q38 formula) dup_2gram_frac <= 0.3
        |norm4 AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> '') AS ws
        |  FROM s3),
        |ga4 AS MATERIALIZED (
        |  SELECT doc_id, sum(c) AS tg, count(*) AS dg FROM (
        |    SELECT doc_id, g, count(*) AS c FROM (
        |      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
        |        i -> ws[i] || ' ' || ws[i+1])) AS g
        |      FROM norm4 WHERE len(ws) >= 2) t GROUP BY doc_id, g) gc
        |  GROUP BY doc_id),
        |s4 AS MATERIALIZED (
        |  SELECT s3.* FROM s3 JOIN (
        |    SELECT n.doc_id, round(coalesce((ga4.tg - ga4.dg) / ga4.tg, 0), 4) AS dup2
        |    FROM norm4 n LEFT JOIN ga4 ON n.doc_id = ga4.doc_id) r USING (doc_id)
        |  WHERE r.dup2 <= 0.3),
        |-- stage 5 LM gate: self-model unigram logprob over s4, drop > 9.0
        |t5 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |    FROM s4) r WHERE w <> ''),
        |d5 AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_tokens, sum(ln(c)) AS slc FROM (
        |    SELECT doc_id, count(*) OVER (PARTITION BY w) AS c FROM t5) wc
        |  GROUP BY doc_id),
        |s5 AS MATERIALIZED (
        |  SELECT s4.* FROM s4 WHERE doc_id NOT IN (
        |    SELECT doc_id FROM d5 CROSS JOIN (SELECT sum(n_tokens) AS total FROM d5) t
        |    WHERE round(ln(total) - slc / n_tokens, 3) > 9.0)),
        |-- stage 6 exact dedup: min id per normalized text
        |s6 AS MATERIALIZED (
        |  SELECT s5.* FROM s5 JOIN (
        |    SELECT min(doc_id) AS doc_id FROM (
        |      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nk
        |      FROM s5) t GROUP BY nk) keep USING (doc_id)),
        |-- stage 7 near dedup: LSH candidates (band-slice collision within s6)
        |-- verified at exact Jaccard >= 0.7, transitive closure, min-id keeper
        |cand7 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band_new a JOIN band_new b
        |    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM s6)
        |    AND b.doc_id IN (SELECT doc_id FROM s6)),
        |g6 AS MATERIALIZED (SELECT * FROM g_new WHERE doc_id IN (SELECT doc_id FROM s6)),
        |sz6 AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM g6 GROUP BY doc_id),
        |pairs7 AS MATERIALIZED (
        |  SELECT c.id_a, c.id_b FROM cand7 c
        |  JOIN (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |        FROM g6 a JOIN g6 b ON a.g = b.g AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2) j ON j.id_a = c.id_a AND j.id_b = c.id_b
        |  JOIN sz6 sa ON sa.doc_id = c.id_a
        |  JOIN sz6 sb ON sb.doc_id = c.id_b
        |  WHERE j.i::DOUBLE / (sa.sz + sb.sz - j.i) >= 0.7),
        |edges7 AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst FROM pairs7
        |  UNION SELECT id_b, id_a FROM pairs7),
        |reach7(node, r) AS (
        |  SELECT src, src FROM edges7
        |  UNION
        |  SELECT e.src, r.r FROM edges7 e JOIN reach7 r ON e.dst = r.node),
        |s7 AS MATERIALIZED (
        |  SELECT s6.* FROM s6 WHERE doc_id NOT IN (
        |    SELECT node FROM reach7 GROUP BY node HAVING min(r) <> node)),
        |-- stage 8 semantic dedup: cosine >= 0.99 pairs, closure, min-id keeper
        |pairs8 AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM (SELECT doc_id, embedding::DOUBLE[] AS e FROM s7) a
        |  JOIN (SELECT doc_id, embedding::DOUBLE[] AS e FROM s7) b
        |    ON a.doc_id < b.doc_id
        |  WHERE list_cosine_similarity(a.e, b.e) >= 0.99),
        |edges8 AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst FROM pairs8
        |  UNION SELECT id_b, id_a FROM pairs8),
        |reach8(node, r) AS (
        |  SELECT src, src FROM edges8
        |  UNION
        |  SELECT e.src, r.r FROM edges8 e JOIN reach8 r ON e.dst = r.node),
        |s8 AS MATERIALIZED (
        |  SELECT s7.* FROM s7 WHERE doc_id NOT IN (
        |    SELECT node FROM reach8 GROUP BY node HAVING min(r) <> node)),
        |-- stage 9 decontamination: drop docs sharing any 5-gram with bench
        |norm9 AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM s8),
        |g9 AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM norm9 WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm9 WHERE len(ws) BETWEEN 1 AND 4),
        |normb AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM bench),
        |gb AS MATERIALIZED (
        |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM normb WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT array_to_string(ws, ' ') AS g
        |  FROM normb WHERE len(ws) BETWEEN 1 AND 4),
        |s9 AS MATERIALIZED (
        |  SELECT s8.* FROM s8 WHERE doc_id NOT IN (
        |    SELECT DISTINCT doc_id FROM g9 JOIN gb USING (g))),
        |-- stage 10 split assignment: md5(source) bucket -> 8/1/1
        |s10 AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 8 THEN 'train'
        |         WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 9 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM s9),
        |-- report: per-stage survivor count + membership digest (sum of 60-bit
        |-- md5-prefix id hashes; the split stage digests (id, split))
        |report AS (
        |  SELECT 0 AS stage_idx, 'novelty' AS stage, count(*)::BIGINT AS n_rows,
        |    coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR AS ids_digest FROM s1
        |  UNION ALL SELECT 1, 'near_novelty', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s2
        |  UNION ALL SELECT 2, 'quality', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s3
        |  UNION ALL SELECT 3, 'repetition', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s4
        |  UNION ALL SELECT 4, 'lm_gate', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s5
        |  UNION ALL SELECT 5, 'exact_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s6
        |  UNION ALL SELECT 6, 'near_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s7
        |  UNION ALL SELECT 7, 'semantic_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s8
        |  UNION ALL SELECT 8, 'decontaminate', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s9
        |  UNION ALL SELECT 9, 'split', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1) || split), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s10)
        |SELECT stage_idx, stage, n_rows, ids_digest FROM report ORDER BY stage_idx""".stripMargin,
    "q55_similar_docs" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x,
        |         unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id, sum(x*y) AS dot, sqrt(sum(x*x)) AS nx,
        |             sqrt(sum(y*y)) AS ny
        |      FROM pairs GROUP BY vec_id),
        |topk AS (
        |  SELECT vec_id, round(dot / (nx * ny), 4) AS cosine
        |  FROM s ORDER BY cosine DESC, vec_id LIMIT 5)
        |SELECT t.vec_id, t.cosine, d.lang, d.source
        |FROM topk t JOIN documents d ON d.doc_id = t.vec_id
        |ORDER BY t.cosine DESC, t.vec_id""".stripMargin,
    // q54: seeded projection matrix embedded as literals, matmul
    // replayed with list_dot_product (see SimSearch.projectOracleSql).
    "q54_project" -> graft.ops.SimSearch.projectOracleSql(
      "embeddings", "vec_id", "embedding",
      outDim = 8, inDim = 64, seed = 42L),
    // q27: the IVF coarse quantizer (seeded KMeans) is not
    // SQL-replayable, but the operator's CONTRACT on this corpus is —
    // with nprobe=4 of nlist=16 cells the probed cells contain the
    // entire exact top-10 (recall 1.0, independently pinned in
    // OpsSpec), and the exact-cosine rerank makes the output identical
    // to the brute-force top-k. The oracle asserts that contract.
    // Partitioning-robustness verified empirically: Verify at
    // SPARK_GRAFT_CPUS=4 and =32 produces bit-identical q27 output
    // (sf0.01 embeddings are a single input split, so the KMeans
    // aggregation order — and therefore the centers — cannot vary
    // with core count). Scale caveat, measured: the contract is
    // sf0.01-specific — at sf0.1 (2000 near-orthogonal vectors)
    // recall drops to 4/10 at nprobe=4 and 9/10 even at nprobe=8,
    // the expected IVF behavior on unstructured embeddings. The
    // driver's correctness gate runs at sf0.01; if that ever moves,
    // re-derive this oracle or demote q27 to rows-only.
    "q27_ann_ivf" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x,
        |         unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id, sum(x*y) AS dot, sqrt(sum(x*x)) AS nx,
        |             sqrt(sum(y*y)) AS ny
        |      FROM pairs GROUP BY vec_id)
        |SELECT vec_id, round(dot / (nx * ny), 4) AS cosine
        |FROM s ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // q22: the LSH banding itself is not SQL-expressible, but its
    // OUTPUT contract is — all pairs with exact 3-gram Jaccard >= 0.7
    // (the fixture plants pairs at J ~0.9-0.99, where the banded
    // candidate probability is >0.99, and the exact-Jaccard verify
    // makes the final set threshold-exact). The CTE mirrors
    // Dedup.shingleSet: normalized tokens, distinct trigrams, and the
    // whole-text shingle for docs shorter than n tokens.
    "q22_minhash_pairs" -> (minhashPairsSql + "\nORDER BY id_a, id_b"),
    // q23: the banded candidate generation is an implementation detail;
    // the OUTPUT contract — every pair within Hamming distance 3, which
    // the 4x16-bit banding guarantees complete by pigeonhole — is fully
    // SQL-expressible. The CTE replays fnv1a64 exactly (HUGEINT modular
    // arithmetic; xor touches only the low 7 bits because inputs are
    // ASCII code points), re-derives the 64 signature bits by token
    // vote, and brute-forces pair Hamming (fine at oracle scale; the
    // Spark side is the one that must avoid the quadratic pass).
    "q23_simhash_pairs" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        |  FROM documents),
        |dtok AS (SELECT DISTINCT tok FROM toks),
        |f(tok, pos, h) AS (
        |  SELECT tok, 0, 14695981039346656037::HUGEINT FROM dtok
        |  UNION ALL
        |  SELECT tok, pos + 1,
        |    ((h - h % 128 + xor((h % 128)::BIGINT, ascii(substr(tok, pos + 1, 1)))::HUGEINT)
        |      * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  FROM f WHERE pos < length(tok)),
        |th AS (SELECT tok, h FROM f WHERE pos = length(tok)),
        |votes AS (
        |  SELECT t.doc_id, b.bit,
        |    sum(CASE WHEN (th.h // (1::HUGEINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM toks t JOIN th USING (tok)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
        |  GROUP BY 1, 2),
        |bits AS (SELECT doc_id, bit, CASE WHEN v > 0 THEN 1 ELSE 0 END AS s FROM votes),
        |ham AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    sum(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS hamming
        |  FROM bits a JOIN bits b ON a.bit = b.bit AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, hamming::INT AS hamming FROM ham
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // q30: the planted-copy corpus makes the output contract exact —
    // every pair at cosine >= 0.99 is a planted (i, i+1000000) copy at
    // cosine 1.0 (organic max pairwise cosine is ~0.51), and identical
    // vectors always share an SRP bucket, so LSH recall is 1 here.
    "q30_cosine_neardup" -> plantedCosinePairSql,
    // q53: same planted-copy contract as q30 — identical vectors get
    // identical KMeans cell assignments, so SemDeDup's within-cell
    // pairing recovers exactly the brute-force >= 0.99 pair set.
    "q53_semantic_dedup" -> plantedCosinePairSql,
    // q31: DuckDB has a native ASOF JOIN; the right side is reduced to
    // one row per (user, ts) by max(value) on both sides so ties are
    // deterministic (same reduction AsofJoin.asof applies).
    "q31_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, max(value) AS v FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, round(r.v, 2) AS prior_view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // q32: the exact theta-join the bin-bucketed plan must reproduce.
    "q32_range_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        |SELECT l.event_id, l.user_id,
        |  count(r.ts) AS n_prior_views,
        |  round(coalesce(sum(r.value), 0), 2) AS sum_view_value
        |FROM l LEFT JOIN r ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 30 MINUTE AND r.ts < l.ts
        |GROUP BY l.event_id, l.user_id
        |ORDER BY l.event_id""".stripMargin,
    // q33: TextStats.qualityScore's documented weights + langId's
    // argmax (ties break toward the lexicographically larger code, so
    // the CASE checks fr -> es -> en -> de) replayed over the same
    // token stats the q19 oracle already replicates.
    "q33_text_quality" ->
      """WITH tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents) r
        |  WHERE w <> ''),
        |stats AS (
        |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','it','that','this','for','on','with','as',
        |      'at','by','be') THEN 1 ELSE 0 END) AS stops,
        |    sum(CASE WHEN w IN ('der','die','und','in','den','von','zu',
        |      'das','mit','sich','des','auf','ist','nicht','ein')
        |      THEN 1 ELSE 0 END) AS h_de,
        |    sum(CASE WHEN w IN ('the','be','to','of','and','a','in','that',
        |      'have','i','it','is','was','for','on') THEN 1 ELSE 0 END) AS h_en,
        |    sum(CASE WHEN w IN ('de','la','que','el','en','y','a','los',
        |      'se','del','las','un','por','con','no') THEN 1 ELSE 0 END) AS h_es,
        |    sum(CASE WHEN w IN ('de','la','le','et','les','des','en','un',
        |      'du','une','que','est','pour','qui','dans') THEN 1 ELSE 0 END) AS h_fr
        |  FROM tok GROUP BY doc_id),
        |agg AS (
        |  SELECT d.doc_id,
        |    coalesce(s.n, 0) AS n, coalesce(s.mtl, 0) AS mtl,
        |    coalesce(s.stops, 0) AS stops,
        |    coalesce(s.h_de, 0) AS h_de, coalesce(s.h_en, 0) AS h_en,
        |    coalesce(s.h_es, 0) AS h_es, coalesce(s.h_fr, 0) AS h_fr,
        |    CASE WHEN length(d.text) > 0 THEN
        |      (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
        |    ELSE 0.0 END AS punct
        |  FROM documents d LEFT JOIN stats s USING (doc_id))
        |SELECT doc_id, n::BIGINT AS n_tokens,
        |  round(least(n / 20.0, 1.0) * 0.3
        |      + (1.0 - least(punct * 4, 1.0)) * 0.2
        |      + least(CASE WHEN n > 0 THEN stops::DOUBLE / n ELSE 0.0 END * 4, 1.0) * 0.3
        |      + CASE WHEN mtl BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS quality,
        |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
        |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |       ELSE 'de' END AS lang_guess
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    // q34: Chunk.explodeChunks replayed with DuckDB list slicing —
    // starts 0, 48, 96, ...; k = 1 + ceil((n-64)/48) chunks; slice ends
    // clamp at n. Multiple unnests in one SELECT zip positionally.
    // Whitespace is normalized first (like q22's oracle) so the
    // single-space split can't diverge from Spark's \s+ tokenizer on
    // tabs/newlines in fixture text.
    "q34_chunks" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    list_filter(
        |      string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> w <> '') AS ws
        |  FROM documents),
        |sized AS (
        |  SELECT doc_id, ws, len(ws) AS n FROM norm WHERE len(ws) > 0),
        |ks AS (
        |  SELECT doc_id, ws, n,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE cast(ceil((n - 64)::DOUBLE / 48) AS INT) + 1 END AS k
        |  FROM sized)
        |SELECT doc_id,
        |  unnest(generate_series(0, k - 1)) AS chunk_id,
        |  unnest(list_transform(generate_series(0, k - 1),
        |    i -> array_to_string(ws[i*48 + 1 : least(i*48 + 64, n)], ' '))) AS chunk_text,
        |  unnest(list_transform(generate_series(0, k - 1),
        |    i -> least(i*48 + 64, n) - i*48)) AS n_chunk_tokens
        |FROM ks
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // q35: symmetric int8 quantization replayed in DuckDB — same
    // scale = max|x|/127, same round(x/scale); integer digests make
    // the compare exact.
    "q35_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale > 0
        |      THEN list_transform(e, x -> cast(round(x / scale) AS INT))
        |      ELSE list_transform(e, x -> 0) END AS qv
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  list_sum(qv)::BIGINT AS q_sum,
        |  list_min(qv)::BIGINT AS q_min,
        |  list_max(qv)::BIGINT AS q_max
        |FROM q
        |ORDER BY vec_id""".stripMargin,
    // q36: the md5-bucket split replayed — '0x'||hex cast parses the
    // same first-8-hex-chars integer Spark's conv(...,16,10) produces.
    "q36_splits" ->
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT CASE WHEN bucket < 8 THEN 'train'
        |              WHEN bucket < 9 THEN 'val'
        |              ELSE 'test' END AS split, source
        |  FROM b)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    // q37: gram semantics mirror q22's oracle (normalized word
    // 5-grams, distinct per doc, whole-text gram for docs shorter than
    // n tokens); benchmark = doc_id % 10 = 0, corpus = the rest.
    "q37_decontaminate" -> decontaminationReportSql,
    "q47_bloom_decontaminate" -> decontaminationReportSql,
    // q48: like q22, the banding is the implementation and the exact
    // n-gram Jaccard set is the contract — restricted to pairs
    // touching the new (odd-id) batch, since old x old pairs are by
    // design never re-derived by the incremental path.
    "q48_incremental_minhash" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.7
        |  AND NOT (id_a % 2 = 0 AND id_b % 2 = 0)
        |ORDER BY id_a, id_b""".stripMargin,
    // q38: TextStats.repetitionOf replayed — normalized tokens, word
    // histogram, adjacent-2-gram duplicate fraction.
    "q38_repetition" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      w -> w <> '') AS ws
        |  FROM documents),
        |w AS (SELECT doc_id, unnest(ws) AS w FROM norm),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        |wa AS (SELECT doc_id, sum(c) AS total, count(*) AS dw, max(c) AS top
        |       FROM wc GROUP BY 1),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(generate_series(1, len(ws)-1),
        |          i -> ws[i] || ' ' || ws[i+1])) AS g
        |      FROM norm WHERE len(ws) >= 2),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        |ga AS (SELECT doc_id, sum(c) AS tg, count(*) AS dg FROM gc GROUP BY 1)
        |SELECT n.doc_id,
        |  coalesce(wa.total, 0)::BIGINT AS n_tokens,
        |  round(coalesce(wa.dw / wa.total, 0), 4) AS distinct_ratio,
        |  round(coalesce(wa.top / wa.total, 0), 4) AS top_word_frac,
        |  round(coalesce((ga.tg - ga.dg) / ga.tg, 0), 4) AS dup_2gram_frac
        |FROM norm n LEFT JOIN wa ON n.doc_id = wa.doc_id
        |LEFT JOIN ga ON n.doc_id = ga.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // q39: document frequency of normalized trigrams (q22's gram CTE),
    // deterministic tie-break on the gram itself.
    "q39_gram_topdf" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
        |  FROM norm WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS gram
        |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> '')
        |SELECT gram, count(*) AS doc_freq
        |FROM grams GROUP BY gram
        |ORDER BY doc_freq DESC, gram
        |LIMIT 20""".stripMargin,
    // q40: element-wise centroid means per cluster; the two unnests in
    // one SELECT zip positionally (value with its 1-based position).
    "q40_centroids" ->
      """WITH x AS (
        |  SELECT vec_id % 8 AS cluster,
        |    unnest(embedding)::DOUBLE AS v,
        |    unnest(generate_series(1, len(embedding))) AS pos
        |  FROM embeddings),
        |m AS (SELECT cluster, pos, avg(v) AS m, count(*) AS n
        |      FROM x GROUP BY 1, 2)
        |SELECT cluster, max(n)::BIGINT AS n_vecs, count(*)::BIGINT AS dims,
        |  round(sqrt(sum(m * m)), 4) AS centroid_l2
        |FROM m GROUP BY cluster
        |ORDER BY cluster""".stripMargin,
    // q41: Redact's patterns replayed in RE2 (the patterns deliberately
    // avoid Java-only constructs); counts via regexp_extract_all,
    // replacement sequential in the same pattern order.
    "q41_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id::VARCHAR ||
        |    '@example.com or http://ex.com/' || doc_id::VARCHAR ||
        |    ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT AS n_url,
        |  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
        |    'https?://[^\s]+', '[REDACTED]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[REDACTED]', 'g') AS text_redacted
        |FROM planted
        |ORDER BY doc_id""".stripMargin,
    // q42: the md5 rank replayed with q36's '0x'||hex parity trick;
    // 1073741824 = 1 << 30 (Sample.stratifiedTopN's rank modulus).
    "q42_stratified" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1073741824,
        |             doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin,
    // q43: Sample.byRates' bucket-cutoff arithmetic (rate x 10000).
    "q43_rate_mix" ->
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS bucket
        |  FROM documents)
        |SELECT source, count(*) AS n_docs
        |FROM b
        |WHERE bucket < CASE WHEN source = 'src0' THEN 5000
        |                    WHEN source = 'src1' THEN 2500
        |                    ELSE 10000 END
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // q44: Spark's exact `percentile` and DuckDB's quantile_cont share
    // linear-interpolation semantics; token counts replay the
    // normalized single-space split.
    "q44_length_profile" ->
      """WITH t AS (
        |  SELECT source,
        |    len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n, 0.5), 4) AS p50,
        |  round(quantile_cont(n, 0.9), 4) AS p90,
        |  round(quantile_cont(n, 0.99), 4) AS p99,
        |  min(n)::BIGINT AS min_tokens,
        |  max(n)::BIGINT AS max_tokens
        |FROM t GROUP BY source
        |ORDER BY source""".stripMargin,
    // q45: the byte-histogram stub replayed over ASCII code points
    // (fixture text is pure printable ASCII, so ascii() == byte and
    // length == octet_length); bin = byte * 16 / 256 = byte // 16.
    "q45_multimodal" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, length(text)),
        |      i -> ascii(substr(text, i, 1)) // 16)) AS bin
        |  FROM documents),
        |h AS (SELECT doc_id, bin, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT d.doc_id AS blob_id,
        |  length(d.text)::BIGINT AS payload_bytes,
        |  coalesce(h2.c, 0)::BIGINT AS n_space,
        |  coalesce(h6.c, 0)::BIGINT AS n_bin6,
        |  coalesce(h7.c, 0)::BIGINT AS n_bin7
        |FROM documents d
        |LEFT JOIN h h2 ON h2.doc_id = d.doc_id AND h2.bin = 2
        |LEFT JOIN h h6 ON h6.doc_id = d.doc_id AND h6.bin = 6
        |LEFT JOIN h h7 ON h7.doc_id = d.doc_id AND h7.bin = 7
        |ORDER BY blob_id""".stripMargin,
    // q46: q34's chunk arithmetic + the running-sum pack rule
    // (pack = floor(tokens_before / budget)) replayed as a window.
    "q46_packing" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    list_filter(
        |      string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      w -> w <> '') AS ws
        |  FROM documents),
        |sized AS (
        |  SELECT doc_id, len(ws) AS n FROM norm WHERE len(ws) > 0),
        |ks AS (
        |  SELECT doc_id, n,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE cast(ceil((n - 64)::DOUBLE / 48) AS INT) + 1 END AS k
        |  FROM sized),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, k - 1)) AS chunk_id,
        |    unnest(list_transform(generate_series(0, k - 1),
        |      i -> least(i*48 + 64, n) - i*48)) AS n_chunk_tokens
        |  FROM ks),
        |src AS (
        |  SELECT d.source, c.doc_id, c.chunk_id, c.n_chunk_tokens
        |  FROM chunks c JOIN documents d USING (doc_id)),
        |raw AS (
        |  SELECT source, n_chunk_tokens,
        |    floor(coalesce(sum(n_chunk_tokens) OVER (
        |      PARTITION BY source ORDER BY doc_id, chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS rawpack
        |  FROM src),
        |packed AS (
        |  SELECT source, n_chunk_tokens,
        |    (dense_rank() OVER (PARTITION BY source ORDER BY rawpack) - 1)::BIGINT AS pack_id
        |  FROM raw)
        |SELECT source, pack_id, count(*) AS n_chunks,
        |  sum(n_chunk_tokens)::BIGINT AS sum_tokens
        |FROM packed GROUP BY source, pack_id
        |ORDER BY source, pack_id""".stripMargin,
    "q14_starjoin" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    // q58: full replay of the span-masking pipeline — per-doc distinct
    // 5-grams -> document frequency -> covered positions -> positional
    // reassembly (string_agg ORDER BY pos == the kernel's in-order
    // rebuild; coalesce('') == a fully-masked doc's empty text).
    "q58_span_mask" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> list_aggregate(ws[i:i+4], 'string_agg', ' '))) AS g
        |  FROM norm WHERE len(ws) >= 5),
        |hot AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        |pos_grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4), i -> i)) AS p,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> list_aggregate(ws[i:i+4], 'string_agg', ' '))) AS g
        |  FROM norm WHERE len(ws) >= 5),
        |covered AS (
        |  SELECT DISTINCT doc_id, cp FROM (
        |    SELECT pg.doc_id, unnest(generate_series(pg.p, pg.p + 4)) AS cp
        |    FROM pos_grams pg JOIN hot h ON pg.g = h.g)),
        |words AS (
        |  SELECT doc_id, unnest(ws) AS w,
        |    unnest(list_transform(generate_series(1, len(ws)), i -> i)) AS p
        |  FROM norm),
        |kept AS (
        |  SELECT w.doc_id, w.w, w.p
        |  FROM words w LEFT JOIN covered c ON w.doc_id = c.doc_id AND w.p = c.cp
        |  WHERE c.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE coalesce(a.text, '') END AS text
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q59_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY user_id),
        |u AS (SELECT DISTINCT f.cohort,
        |        date_diff('day', f.cohort, e.d) AS day_offset, e.user_id
        |      FROM ev e JOIN f ON e.user_id = f.user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, day_offset,
        |  count(*) AS n_users
        |FROM u GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q60_lang_pivot" ->
      """SELECT source,
        |  count(*) FILTER (WHERE lang = 'de') AS de,
        |  count(*) FILTER (WHERE lang = 'en') AS en,
        |  count(*) FILTER (WHERE lang = 'es') AS es,
        |  count(*) FILTER (WHERE lang = 'fr') AS fr,
        |  count(*) FILTER (WHERE lang = 'zh') AS zh
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin,
    "q61_rolling_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    count(*) AS n, sum(value) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_7d,
        |  round(sum(sv) OVER w, 2) AS value_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY d
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,
    "q62_collocations" ->
      """WITH norm AS (
        |  SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c_w FROM (
        |    SELECT unnest(ws) AS w FROM norm) t
        |  WHERE w <> '' GROUP BY w),
        |bi AS (
        |  SELECT word_a, word_b, count(*) AS n_pair FROM (
        |    SELECT unnest(ws[1:len(ws)-1]) AS word_a,
        |           unnest(ws[2:len(ws)]) AS word_b
        |    FROM norm WHERE len(ws) >= 2) t
        |  WHERE word_a <> '' AND word_b <> '' GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(c_w) AS DOUBLE) AS ntok FROM uni),
        |btot AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS nbi FROM bi)
        |SELECT b.word_a, b.word_b, b.n_pair,
        |  round(ln((b.n_pair / bt.nbi) /
        |        ((ua.c_w / t.ntok) * (ub.c_w / t.ntok))), 3) + 0.0 AS pmi
        |FROM bi b
        |JOIN uni ua ON ua.w = b.word_a
        |JOIN uni ub ON ub.w = b.word_b
        |CROSS JOIN tot t CROSS JOIN btot bt
        |WHERE b.n_pair >= 10
        |ORDER BY pmi DESC, word_a, word_b""".stripMargin,
    "q63_lang_unpivot" ->
      """WITH langs(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')),
        |src AS (SELECT DISTINCT source FROM documents),
        |c AS (SELECT source, lang, count(*) AS n
        |      FROM documents GROUP BY 1, 2)
        |SELECT s.source, l.lang, coalesce(c.n, 0) AS n_docs
        |FROM src s CROSS JOIN langs l
        |LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
        |ORDER BY s.source, l.lang""".stripMargin,
    // q64: the q33 quality formula (same 3-decimal contract) gated at
    // each source's own median via quantile_cont == Spark's exact
    // interpolated `percentile`. The threshold compare runs on the
    // ROUNDED score, so engine ulp noise cannot flip the gate.
    "q64_quality_gate" -> (qualityScoredCtes(Seq("source")) +
      """,
        |thr AS (
        |  SELECT source, quantile_cont(quality, 0.5) AS t
        |  FROM scored GROUP BY source)
        |SELECT s.doc_id, s.source, s.quality
        |FROM scored s JOIN thr ON s.source IS NOT DISTINCT FROM thr.source
        |WHERE s.quality >= thr.t
        |ORDER BY s.doc_id""".stripMargin),
    "q65_rollup" ->
      """SELECT CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS lvl,
        |  r_name, n_name, count(*) AS n_rows,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY lvl, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    // q66: exact distincts replayed outright; the sketch columns are
    // in-query contract booleans (no engine reproduces Spark's HLL /
    // t-digest bit-for-bit), so the oracle pins them to true.
    "q66_approx_sketch" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_exact,
        |  true AS hll_ok,
        |  true AS p50_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q67: the commutative md5-prefix digest replayed — same
    // '0x'||hex parse as q36. Both sides emit the digest as VARCHAR:
    // the sum (~10^17..10^20) is exact in Spark DECIMAL(38,0) and
    // DuckDB HUGEINT alike, but any numeric transport path that
    // narrows to float64 (e.g. pandas) loses the low digits — the
    // string form is representation-proof (r7 hash-fail fix).
    "q67_corpus_digest" -> corpusDigestSql,
    // q68: vocab cut replayed with the same deterministic tie-break
    // (count DESC, word ASC); oov_rate is long/long division so 4
    // decimals are engine-portable
    "q68_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM toks
        |       WHERE w <> '' GROUP BY 1, 2),
        |vocab AS (SELECT w FROM (
        |  SELECT w, sum(c) AS cw FROM tf GROUP BY w
        |  ORDER BY cw DESC, w LIMIT 500) v)
        |SELECT t.doc_id, CAST(sum(t.c) AS BIGINT) AS n_tokens,
        |  round(sum(CASE WHEN v.w IS NULL THEN t.c ELSE 0 END)::DOUBLE
        |        / sum(t.c), 4) AS oov_rate
        |FROM tf t LEFT JOIN vocab v ON t.w = v.w
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q69_source_overlap" ->
      """WITH post AS (
        |  SELECT DISTINCT source AS g, w FROM (
        |    SELECT source,
        |           unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |    FROM documents) r WHERE w <> ''),
        |sizes AS (SELECT g, count(*) AS n FROM post GROUP BY g),
        |inter AS (SELECT a.g AS ga, b.g AS gb, count(*) AS com
        |          FROM post a JOIN post b ON a.w = b.w AND a.g < b.g
        |          GROUP BY 1, 2)
        |SELECT sa.g AS source_a, sb.g AS source_b, sa.n AS n_a, sb.n AS n_b,
        |  coalesce(i.com, 0) AS n_common,
        |  round(coalesce(i.com, 0)::DOUBLE
        |        / (sa.n + sb.n - coalesce(i.com, 0)), 4) AS jaccard
        |FROM sizes sa JOIN sizes sb ON sa.g < sb.g
        |LEFT JOIN inter i ON i.ga = sa.g AND i.gb = sb.g
        |ORDER BY source_a, source_b""".stripMargin,
    // q70: the q33/q64 quality formula (3-decimal contract) ranked
    // inside each normalized-text group — winner = highest ROUNDED
    // quality, ties toward the smaller id, so engine ulp noise cannot
    // flip the representative
    "q70_dup_best" -> (qualityScoredCtes(Seq("lang", "text")) +
      """,
        |ranked AS (
        |  SELECT doc_id, lang, quality, row_number() OVER (
        |    PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    ORDER BY quality DESC, doc_id) AS rn
        |  FROM scored)
        |SELECT doc_id, lang, quality FROM ranked
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    // q71: add-one-smoothed unigram log-likelihood ratio replayed;
    // the per-(doc,word) target flag is doc-constant so bool_or == the
    // Spark side's first()
    "q71_dsir_weight" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c, bool_or(lang = 'en') AS tgt
        |       FROM toks WHERE w <> '' GROUP BY 1, 2),
        |freqs AS (SELECT w, sum(c) AS cw,
        |                 sum(CASE WHEN tgt THEN c ELSE 0 END) AS ctw
        |          FROM tf GROUP BY w),
        |tot AS (SELECT sum(cw) AS n, sum(ctw) AS nt, count(*) AS v FROM freqs),
        |d AS (SELECT t.doc_id, sum(t.c) AS n_tokens,
        |             sum(t.c * (ln(f.ctw + 1) - ln(f.cw + 1))) AS s
        |      FROM tf t JOIN freqs f ON t.w = f.w GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(s / n_tokens + ln(n + v) - ln(nt + v), 3) + 0.0 AS log_ratio
        |FROM d CROSS JOIN tot ORDER BY doc_id""".stripMargin,
    // q72: the ranked cut replayed with the same (count DESC, word)
    // tie-break; coverage is long/long division
    "q72_vocab_curve" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
        |tot AS (SELECT sum(c) AS total FROM wc),
        |ranked AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn
        |           FROM wc ORDER BY c DESC, w LIMIT 5000),
        |sizes(vocab_size) AS (VALUES (100), (500), (1000), (5000))
        |SELECT s.vocab_size, count(*) AS n_words,
        |  round(sum(r.c)::DOUBLE / max(t.total), 4) AS coverage
        |FROM sizes s JOIN ranked r ON r.rn <= s.vocab_size
        |CROSS JOIN tot t
        |GROUP BY s.vocab_size ORDER BY s.vocab_size""".stripMargin,
    // q73: the q33 quality formula standardized per source; z compares
    // on 3-decimal rounding so engine ulp in avg/stddev cannot flip it
    "q73_quality_z" -> (qualityScoredCtes(Seq("source")) +
      """,
        |st AS (SELECT source, avg(quality) AS mu, stddev_pop(quality) AS sd
        |       FROM scored GROUP BY source)
        |SELECT s.doc_id, s.source, s.quality,
        |  CASE WHEN st.sd > 0 THEN round((s.quality - st.mu) / st.sd, 3)
        |       ELSE 0.0 END AS z
        |FROM scored s JOIN st ON s.source IS NOT DISTINCT FROM st.source
        |ORDER BY s.doc_id""".stripMargin),
    // q74: the q37 gram replay extended to a LEFT join so clean docs
    // appear at 0.0; containment is long/long division
    "q74_containment" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM norm WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm WHERE len(ws) < 5 AND array_to_string(ws, ' ') <> ''),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
        |SELECT gr.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  round(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 4) AS containment
        |FROM grams gr LEFT JOIN bench b ON gr.g = b.g
        |WHERE gr.doc_id % 10 <> 0
        |GROUP BY gr.doc_id
        |ORDER BY gr.doc_id""".stripMargin,
    // q75: sequential first-occurrence funnel replayed level by level
    // (strict ts ordering; the events fixture has no sub-microsecond
    // components, so the Spark side's nanos->micros conversion cannot
    // create cross-engine ties)
    "q75_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |         (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step""".stripMargin,
    // q76: grouped ranking replayed — rank inside each language by the
    // shared 3-decimal quality contract, ties toward the smaller id
    "q76_topk_lang" -> (qualityScoredCtes(Seq("lang")) +
      """,
        |ranked AS (
        |  SELECT lang, doc_id, quality, row_number() OVER (
        |    PARTITION BY lang ORDER BY quality DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT lang, rank, doc_id, quality FROM ranked
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin),
    // q77: the role rows are a literal truth table (detection samples
    // the first 100 rows of the fixed fixture — re-derived by hand from
    // the documented D2–D5 semantics: max-avg-word-count text column,
    // all-distinct integer index, reference "head = last in schema
    // order" categorical tie-break, single-double value column). The
    // D7/D8 rows are REPLAYED: sorted distinct categories, and the
    // encoded-code sum where code = position in sorted category order
    // (dense_rank - 1), over the full orders table.
    "q77_detect_roles" ->
      """WITH roles(tbl, role, col_name) AS (VALUES
        |  ('documents', 'categorical', 'source'),
        |  ('documents', 'index', 'doc_id'),
        |  ('documents', 'text', 'text'),
        |  ('documents', 'value', '(none)'),
        |  ('events', 'categorical', 'event_type'),
        |  ('events', 'index', 'event_id'),
        |  ('events', 'text', '(none)'),
        |  ('events', 'value', 'value'),
        |  ('orders', 'categorical', 'o_orderpriority'),
        |  ('orders', 'index', 'o_orderkey'),
        |  ('orders', 'text', '(none)'),
        |  ('orders', 'value', 'o_totalprice')),
        |samp AS (SELECT * FROM documents LIMIT 100),
        |census AS (
        |  SELECT 0 AS pos, 'text' AS c,
        |    avg(len(string_split(text, ' '))) AS wc FROM samp
        |  UNION ALL SELECT 1, 'lang',
        |    avg(len(string_split(lang, ' '))) FROM samp
        |  UNION ALL SELECT 2, 'source',
        |    avg(len(string_split(source, ' '))) FROM samp),
        |derived AS (
        |  SELECT 'orders' AS tbl, 'categories:o_orderpriority' AS role,
        |    string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS col_name
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders', 'encoded_sum:o_orderpriority',
        |    sum(code)::VARCHAR FROM (
        |      SELECT dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS code
        |      FROM orders)
        |  UNION ALL
        |  SELECT 'documents', 'categories:lang',
        |    string_agg(DISTINCT lang, '|' ORDER BY lang) FROM documents
        |  UNION ALL
        |  SELECT 'documents', 'text_census:' || c, printf('%.4f', wc)
        |  FROM census
        |  UNION ALL
        |  SELECT 'documents', 'text_pick',
        |    CASE WHEN max(wc) > 5 THEN
        |      (SELECT c FROM census ORDER BY wc DESC, pos LIMIT 1)
        |    ELSE '(none)' END
        |  FROM census)
        |SELECT tbl, role, col_name FROM roles
        |UNION ALL SELECT tbl, role, col_name FROM derived
        |ORDER BY tbl, role""".stripMargin,
    // q78: full winnowing replay — 8-char gram hashes via the shared
    // 60-bit md5-prefix parse, window-of-4 minima, distinct set; the
    // digest sums in HUGEINT and ships as VARCHAR (the q67 contract).
    "q78_winnow_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, CASE WHEN length(s) >= 8 THEN
        |      list_transform(generate_series(1, length(s) - 7),
        |        i -> ('0x' || substr(md5(substr(s, i, 8)), 1, 15))::BIGINT)
        |    ELSE [] END AS hs
        |  FROM n),
        |f AS (
        |  SELECT doc_id, len(hs) AS ng,
        |    CASE WHEN len(hs) >= 1 THEN
        |      list_distinct(list_transform(
        |        generate_series(1, greatest(len(hs) - 3, 1)),
        |        j -> list_min(hs[j:j+3])))
        |    ELSE [] END AS fps
        |  FROM h),
        |d AS (
        |  SELECT doc_id, sum(fp::HUGEINT) AS dg
        |  FROM (SELECT doc_id, unnest(fps) AS fp FROM f) t
        |  GROUP BY doc_id)
        |SELECT f.doc_id, CAST(f.ng AS BIGINT) AS n_grams,
        |  CAST(len(f.fps) AS BIGINT) AS n_fingerprints,
        |  CAST(coalesce(d.dg, 0) AS VARCHAR) AS fp_digest
        |FROM f LEFT JOIN d USING (doc_id)
        |ORDER BY f.doc_id""".stripMargin,
    // q79: tf-idf with the corpus' own df; ranking on the ROUNDED
    // score with word-ascending tie-break (the q64 rounded-gate
    // contract), so an engine-ulp boundary cannot flip the top-3 cut.
    "q79_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, w, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(*) AS df FROM toks GROUP BY w),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM toks),
        |scored AS (
        |  SELECT t.doc_id, t.w AS word, t.tf,
        |    round(t.tf * ln(nd.n / d.df), 4) + 0.0 AS score
        |  FROM toks t JOIN dfreq d USING (w) CROSS JOIN nd)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, word) AS BIGINT) AS rank,
        |  word, tf, score
        |FROM scored
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // q80: ttr/hapax are exact-integer quotients; entropy is the
    // regrouped p·ln p sum (3 decimals, the float-sum contract);
    // integer sums cast to BIGINT (the r7 HUGEINT lesson).
    "q80_lexical_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, w, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |    FROM documents) t
        |  WHERE w <> '' GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  round(count(*)::DOUBLE / sum(tf), 4) AS ttr,
        |  round(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
        |    AS hapax_frac,
        |  round(ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf), 3) + 0.0 AS entropy
        |FROM toks GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // q81: the q22 exact-Jaccard pair contract (LSH output == the
    // brute-force pair set at this fixture) extended to cluster
    // assignment — recursive-CTE min-label closure (the q57 stage-7
    // pattern), singletons mapping to themselves via the left join.
    "q81_dup_clusters" ->
      """WITH RECURSIVE norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) j
        |  JOIN sizes sa ON sa.doc_id = j.id_a
        |  JOIN sizes sb ON sb.doc_id = j.id_b
        |  WHERE j.i::DOUBLE / (sa.sz + sb.sz - j.i) >= 0.7),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
        |comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // q82: the q67 digest replayed from PARQUET while the query's
    // frame went through CSV write → sniff → read — the oracle IS the
    // round-trip losslessness check (S2/S5–S7/S11 end to end).
    "q82_csv_roundtrip" -> corpusDigestSql,
    // q83: token-wise emoji→word substitution replayed in SQL against
    // the FROZEN 914-row truth table (EmojiOracle — independently
    // generated from emojis.csv, NOT the runtime parse; a parse
    // regression drifts Spark while this table stays put). Both sides
    // split on the single space char, map tokens, reassemble.
    "q83_emoji_substitute" ->
      s"""WITH emo(native, word) AS (VALUES
         |${graft.text.EmojiOracle.emoValues}),
         |pick(idx, emoticon) AS (VALUES
         |${graft.text.EmojiOracle.pickValues}),
         |augmented AS (
         |  SELECT d.doc_id, concat_ws(' ', d.text, p.emoticon) AS t2
         |  FROM documents d
         |  JOIN pick p ON (d.doc_id % ${graft.text.EmojiOracle.pickCount}) = p.idx),
         |toks AS (
         |  SELECT doc_id, generate_subscripts(l, 1) AS ord, unnest(l) AS tok
         |  FROM (SELECT doc_id, string_split(t2, ' ') AS l FROM augmented) s),
         |mapped AS (
         |  SELECT t.doc_id, t.ord, coalesce(e.word, t.tok) AS tok2,
         |    CASE WHEN e.word IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM toks t LEFT JOIN emo e ON t.tok = e.native)
         |SELECT doc_id,
         |  CAST(sum(hit) AS BIGINT) AS n_subst,
         |  md5(string_agg(tok2, ' ' ORDER BY ord)) AS sub_digest,
         |  (string_split(string_agg(tok2, ' ' ORDER BY ord), ' '))[-1]
         |    AS appended_word
         |FROM mapped GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q84: the >=6-char English vocabulary, count + order-canonical
    // digest — the oracle recomputes the SAME list straight from
    // parquet, so the text sink + scan round-trip must be lossless.
    "q84_wordlist_sink" ->
      """WITH words AS (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
        |    FROM documents WHERE lang = 'en') u
        |  WHERE length(w) >= 6)
        |SELECT CAST(count(*) AS BIGINT) AS n_words,
        |  md5(string_agg(w, chr(10) ORDER BY w)) AS wl_digest
        |FROM words""".stripMargin,
    // q85: q82's contract for the JSON leg — same parquet-side digest,
    // computed after documents → json sink → extension dispatch → scan.
    "q85_json_roundtrip" -> corpusDigestSql,
    // q86: pinned-VALUES truth table (per-row pure functions over the
    // fuzzy dictionary ladder — not SQL-expressible; see PinnedOracles).
    "q86_sentence_sentiment" -> PinnedOracles.q86Sql,
    // q87: pinned-VALUES truth table (Porter stemming chain — not
    // SQL-expressible; per-row pure function, see PinnedOracles).
    "q87_clean_stem" -> PinnedOracles.q87Sql,
    // q88: full arithmetic replay of the seeded 60-bit md5 shard
    // assignment; the commutative HUGEINT sum pins per-shard
    // membership order-independently (q67 digest contract).
    "q88_shard_order" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT AS sk
        |  FROM documents)
        |SELECT CAST(sk % 8 AS INT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(sk::HUGEINT) AS VARCHAR) AS key_digest,
        |  min(sk) AS min_key, max(sk) AS max_key
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    // q89: brute-force max-cosine replay (the benchmark is the first
    // 50 vectors, present in both sides — the true-leak shape).
    "q89_semantic_decon" ->
      """WITH b AS (
        |  SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT c.vec_id,
        |  round(max(list_cosine_similarity(c.e, b.e)), 4) AS max_benchmark_cosine,
        |  max(list_cosine_similarity(c.e, b.e)) >= 0.99 AS contaminated
        |FROM c, b GROUP BY 1 ORDER BY 1""".stripMargin,
    // q90: the whole P6 decode→features→resize chain is integer
    // arithmetic on (vec_id, x, y), so the oracle replays it exactly:
    // luminance = BT.601 integer weights // 1000, bin = lum*16 // 256,
    // resize picks source pixel (2x', 2y').
    "q90_image_decode" ->
      """WITH pix AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 31), i ->
        |      ((((299 * ((vec_id*31 + (i%8)*7 + (i//8)*13) % 256)
        |        + 587 * ((vec_id*17 + (i%8)*11 + (i//8)*5) % 256)
        |        + 114 * ((vec_id*29 + (i%8)*3 + (i//8)*19) % 256)) // 1000) * 16) // 256))
        |      AS bins,
        |    list_transform(generate_series(0, 7), j ->
        |      ((((299 * ((vec_id*31 + (j%4)*2*7 + (j//4)*2*13) % 256)
        |        + 587 * ((vec_id*17 + (j%4)*2*11 + (j//4)*2*5) % 256)
        |        + 114 * ((vec_id*29 + (j%4)*2*3 + (j//4)*2*19) % 256)) // 1000) * 16) // 256))
        |      AS rbins
        |  FROM embeddings)
        |SELECT vec_id AS blob_id, CAST(8 AS INT) AS width,
        |  CAST(4 AS INT) AS height,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(bins, v -> v = b))), ',') AS lum_bins,
        |  CAST(4 AS INT) AS r_width, CAST(2 AS INT) AS r_height,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(rbins, v -> v = b))), ',') AS r_lum_bins
        |FROM pix ORDER BY blob_id""".stripMargin,
    // q91: the WAV synth→decode→features→decimate chain is integer
    // arithmetic on (vec_id, i): sample_i = ((vec_id*7919 + i*4451)
    // % 65536) - 32768, 64 mono samples at 8 kHz; decimation keeps
    // even i and halves the declared rate. DuckDB lists are
    // 1-indexed, so the zero-crossing probe at series index i
    // compares original samples (i-1, i).
    "q91_audio_decode" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 63), i ->
        |      ((vec_id*7919 + i*4451) % 65536) - 32768) AS smp,
        |    list_transform(generate_series(0, 31), j ->
        |      ((vec_id*7919 + j*2*4451) % 65536) - 32768) AS dsmp
        |  FROM embeddings)
        |SELECT vec_id AS blob_id,
        |  CAST(8000 AS INT) AS sample_rate, CAST(64 AS INT) AS n_samples,
        |  CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak_abs,
        |  CAST(len(list_filter(generate_series(1, 63),
        |    i -> (smp[i] < 0) <> (smp[i+1] < 0))) AS INT) AS zero_crossings,
        |  CAST(list_sum(list_transform(smp, v -> v*v)) AS BIGINT) AS sum_sq,
        |  CAST(4000 AS INT) AS d_sample_rate, CAST(32 AS INT) AS d_n_samples,
        |  CAST(list_max(list_transform(dsmp, v -> abs(v))) AS INT) AS d_peak_abs,
        |  CAST(len(list_filter(generate_series(1, 31),
        |    j -> (dsmp[j] < 0) <> (dsmp[j+1] < 0))) AS INT) AS d_zero_crossings,
        |  CAST(list_sum(list_transform(dsmp, v -> v*v)) AS BIGINT) AS d_sum_sq
        |FROM s ORDER BY blob_id""".stripMargin,
    // q92: bucketing is a pure physical-layout change — the oracle is
    // the plain logical join+aggregate; any data drift introduced by
    // the bucketed write/read round-trip turns the row red.
    "q92_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q93: union + window latest-wins replay of the changelog merge.
    // Ranking needs only (version DESC, src DESC): each (key, version,
    // src) combination is unique by construction — updates are v1,
    // re-deliveries v0, tombstones v2, all on the change side — so the
    // deeper column tie-breaks never bind on either engine.
    "q93_upsert_merge" ->
      """WITH snap AS (
        |  SELECT doc_id, text, source, 0 AS version, false AS del,
        |    0 AS src FROM documents),
        |upd AS (
        |  SELECT doc_id, text || ' [rev2]' AS text, source, 1 AS version,
        |    false AS del, 1 AS src FROM documents WHERE doc_id % 5 = 0),
        |redeliver AS (
        |  SELECT doc_id, text || ' [v0-redelivery]' AS text, source,
        |    0 AS version, false AS del, 1 AS src
        |  FROM documents WHERE doc_id % 11 = 1),
        |tomb AS (
        |  SELECT doc_id, NULL AS text, source, 2 AS version, true AS del,
        |    1 AS src FROM documents WHERE doc_id % 7 = 3),
        |allr AS (
        |  SELECT * FROM snap UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM redeliver UNION ALL SELECT * FROM tomb),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY version DESC, src DESC) AS rn
        |  FROM allr)
        |SELECT doc_id, version, source, md5(text) AS text_digest
        |FROM ranked WHERE rn = 1 AND NOT del ORDER BY doc_id""".stripMargin,
    // q94: full BM25 replay — tf/df/avgdl re-derived, the scoring
    // expression written with the SAME operation order as the Scala
    // side ((1.2 + 1.0) stays a sum; 0.75 * dl / avgdl stays
    // left-associative) so both engines run identical IEEE doubles,
    // and scores round to 4 decimals BEFORE the ORDER BY on both
    // sides. Ranking ties break by doc_id.
    "q94_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '') AS ws
        |  FROM documents),
        |sized AS (SELECT doc_id, ws, len(ws) AS dl FROM base),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM sized),
        |tf AS (
        |  SELECT doc_id, dl, t, count(*) AS tf FROM (
        |    SELECT doc_id, dl, unnest(ws) AS t FROM sized) u
        |  WHERE t IN ('hash', 'join', 'spark') GROUP BY 1, 2, 3),
        |dfs AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
        |  FROM tf JOIN dfs USING (t) CROSS JOIN stats)
        |SELECT doc_id, count(*) AS n_terms_matched,
        |  round(sum(s), 4) AS score
        |FROM scored GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // q174: KMeans cell internals are not SQL-expressible; the
    // CONTRACT is — batch sizes replay arithmetically, and the drift
    // alerts are asserted as the decision the monitor must produce
    // (control batch quiet, planted +2.0-shift batch alerting on both
    // signals) — the q27/q66 contract-boolean pattern
    "q174_ivf_drift" ->
      """WITH c AS (
        |  SELECT count(*) AS n FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT batch, n AS n_vectors, psi_alert, dist_alert
        |FROM c CROSS JOIN (VALUES
        |  ('control', FALSE, FALSE),
        |  ('drifted', TRUE, TRUE)) t(batch, psi_alert, dist_alert)
        |ORDER BY batch""".stripMargin,
    // q172/q173: iterative Viterbi-EM unigram training is not
    // SQL-expressible → pinned-VALUES truth tables frozen at sf0.01
    // (2026-08-15; 8- vs 32-thread sessions verified identical before
    // pinning — integer counts + total tie orders by construction)
    "q172_unigram_vocab" -> PinnedOracles.q172Sql,
    "q173_unigram_tokens" -> PinnedOracles.q173Sql,
    // q175: the CurateCli batch lifecycle — the q57 stage replay
    // restricted to the stages this CLI config activates (quality,
    // repetition, exact dedup, near dedup, decontaminate, split), plus
    // the curated-output summary row, which must equal the split row
    // (the parquet sink holds exactly the final stage's rows).
    "q175_cli_curate" ->
      """WITH RECURSIVE
        |input AS MATERIALIZED (
        |  SELECT doc_id, text, source FROM documents WHERE doc_id % 5 <> 0),
        |bench AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0),
        |-- stage 0 quality gate (q33 formula, rounded to 3) >= 0.3
        |tok3 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM input) r
        |  WHERE w <> ''),
        |stats3 AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','it','that','this','for','on','with','as',
        |      'at','by','be') THEN 1 ELSE 0 END) AS stops
        |  FROM tok3 GROUP BY doc_id),
        |s3 AS MATERIALIZED (
        |  SELECT input.* FROM input JOIN (
        |    SELECT d.doc_id,
        |      round(least(coalesce(s.n, 0) / 20.0, 1.0) * 0.3
        |        + (1.0 - least((CASE WHEN length(d.text) > 0 THEN
        |            (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
        |            ELSE 0.0 END) * 4, 1.0)) * 0.2
        |        + least(CASE WHEN coalesce(s.n, 0) > 0 THEN coalesce(s.stops, 0)::DOUBLE / s.n ELSE 0.0 END * 4, 1.0) * 0.3
        |        + CASE WHEN coalesce(s.mtl, 0) BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS q
        |    FROM input d LEFT JOIN stats3 s USING (doc_id)) qs USING (doc_id)
        |  WHERE qs.q >= 0.3),
        |-- stage 1 repetition gate (q38 formula) dup_2gram_frac <= 0.3
        |norm4 AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> '') AS ws
        |  FROM s3),
        |ga4 AS MATERIALIZED (
        |  SELECT doc_id, sum(c) AS tg, count(*) AS dg FROM (
        |    SELECT doc_id, g, count(*) AS c FROM (
        |      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
        |        i -> ws[i] || ' ' || ws[i+1])) AS g
        |      FROM norm4 WHERE len(ws) >= 2) t GROUP BY doc_id, g) gc
        |  GROUP BY doc_id),
        |s4 AS MATERIALIZED (
        |  SELECT s3.* FROM s3 JOIN (
        |    SELECT n.doc_id, round(coalesce((ga4.tg - ga4.dg) / ga4.tg, 0), 4) AS dup2
        |    FROM norm4 n LEFT JOIN ga4 ON n.doc_id = ga4.doc_id) r USING (doc_id)
        |  WHERE r.dup2 <= 0.3),
        |-- stage 2 exact dedup: min id per normalized text
        |s6 AS MATERIALIZED (
        |  SELECT s4.* FROM s4 JOIN (
        |    SELECT min(doc_id) AS doc_id FROM (
        |      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nk
        |      FROM s4) t GROUP BY nk) keep USING (doc_id)),
        |-- stage 3 near dedup: MinHash band replay over the exact-stage
        |-- survivors, exact-Jaccard >= 0.7 verify, closure, min-id keeper
        |norm1 AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM s6),
        |g_new AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm1 WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm1 WHERE len(ws) BETWEEN 1 AND 2),
        |seeds AS MATERIALIZED (
        |  SELECT s, (11400714819323198485::HUGEINT * (2*s+1)) % 18446744073709551616::HUGEINT AS a,
        |         (2685821657736338717::HUGEINT * (s+1)) AS off
        |  FROM (SELECT unnest(generate_series(0, 11)) AS s)),
        |band_new AS MATERIALIZED (
        |  SELECT doc_id, s // 3 AS band, list(h ORDER BY s) AS slice FROM (
        |    SELECT doc_id, s,
        |      min((a * ('0x' || substr(md5(g), 1, 15))::BIGINT::HUGEINT + off)
        |          % 18446744073709551616::HUGEINT) AS h
        |    FROM g_new CROSS JOIN seeds GROUP BY doc_id, s)
        |  GROUP BY doc_id, band),
        |cand7 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band_new a JOIN band_new b
        |    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id),
        |sz6 AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM g_new GROUP BY doc_id),
        |pairs7 AS MATERIALIZED (
        |  SELECT c.id_a, c.id_b FROM cand7 c
        |  JOIN (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |        FROM g_new a JOIN g_new b ON a.g = b.g AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2) j ON j.id_a = c.id_a AND j.id_b = c.id_b
        |  JOIN sz6 sa ON sa.doc_id = c.id_a
        |  JOIN sz6 sb ON sb.doc_id = c.id_b
        |  WHERE j.i::DOUBLE / (sa.sz + sb.sz - j.i) >= 0.7),
        |edges7 AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst FROM pairs7
        |  UNION SELECT id_b, id_a FROM pairs7),
        |reach7(node, r) AS (
        |  SELECT src, src FROM edges7
        |  UNION
        |  SELECT e.src, r.r FROM edges7 e JOIN reach7 r ON e.dst = r.node),
        |s7 AS MATERIALIZED (
        |  SELECT s6.* FROM s6 WHERE doc_id NOT IN (
        |    SELECT node FROM reach7 GROUP BY node HAVING min(r) <> node)),
        |-- stage 4 decontamination: drop docs sharing any 5-gram with bench
        |norm9 AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM s7),
        |g9 AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM norm9 WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm9 WHERE len(ws) BETWEEN 1 AND 4),
        |normb AS MATERIALIZED (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM bench),
        |gb AS MATERIALIZED (
        |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM normb WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT array_to_string(ws, ' ') AS g
        |  FROM normb WHERE len(ws) BETWEEN 1 AND 4),
        |s9 AS MATERIALIZED (
        |  SELECT s7.* FROM s7 WHERE doc_id NOT IN (
        |    SELECT DISTINCT doc_id FROM g9 JOIN gb USING (g))),
        |-- stage 5 split assignment: md5(source) bucket -> 8/1/1
        |s10 AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 8 THEN 'train'
        |         WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 9 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM s9),
        |report AS (
        |  SELECT 0 AS stage_idx, 'quality' AS stage, count(*)::BIGINT AS n_rows,
        |    coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR AS ids_digest FROM s3
        |  UNION ALL SELECT 1, 'repetition', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s4
        |  UNION ALL SELECT 2, 'exact_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s6
        |  UNION ALL SELECT 3, 'near_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s7
        |  UNION ALL SELECT 4, 'decontaminate', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s9
        |  UNION ALL SELECT 5, 'split', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1) || split), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s10
        |  UNION ALL SELECT 6, 'curated_output', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1) || split), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s10)
        |SELECT stage_idx, stage, n_rows, ids_digest FROM report ORDER BY stage_idx""".stripMargin,
    // q95/q96: iterative BPE training is not SQL-expressible →
    // pinned-VALUES oracles (the q16/q25 contract; regenerated from a
    // fresh Verify run, verified identical across 8/32 threads).
    "q95_bpe_merges" -> PinnedOracles.q95Sql,
    "q96_bpe_tokens" -> PinnedOracles.q96Sql,
    "q97_pagerank" -> pagerankSql(10),
    // q98: every overlapping occurrence recounted with a substr probe
    // at each start position (the Aho–Corasick contract: "aa" occurs
    // twice in "aaa"); distinct patterns via a count filter.
    "q98_blocklist" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |pats(p) AS (VALUES ('scan'), ('can'), ('an'), ('row')),
        |cnts AS (
        |  SELECT doc_id, p,
        |    len(list_filter(
        |      generate_series(1, greatest(len(t) - len(p) + 1, 0)),
        |      i -> substr(t, CAST(i AS INT), len(p)) = p)) AS c
        |  FROM t CROSS JOIN pats)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_hits,
        |  CAST(count(*) FILTER (WHERE c > 0) AS INT) AS n_patterns_hit,
        |  sum(c) > 0 AS flagged
        |FROM cnts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q99: Spark's exact `percentile` and DuckDB's quantile_cont share
    // the linear-interpolation definition (q64 parity); the clip is
    // least(greatest(...)) on both sides.
    "q99_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |thr AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  round(sum(least(greatest(e.value, t.lo), t.hi)), 2)
        |    AS sum_winsorized,
        |  round(min(least(greatest(e.value, t.lo), t.hi)), 4) AS lo_clip,
        |  round(max(least(greatest(e.value, t.lo), t.hi)), 4) AS hi_clip
        |FROM e JOIN thr t USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // q100: the synthesized second snapshot and the full-outer digest
    // compare replayed row for row; key digests are commutative
    // decimal sums (the q67/q88 contract).
    "q100_corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id, text, source, lang FROM documents),
        |newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 1 THEN text || ' [edited]'
        |         ELSE text END AS text, source, lang
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR),
        |    source, lang
        |  FROM documents WHERE doc_id % 11 = 0),
        |od AS (SELECT doc_id,
        |  md5(concat_ws(chr(1), text, source, lang)) AS d FROM old),
        |nd AS (SELECT doc_id,
        |  md5(concat_ws(chr(1), text, source, lang)) AS d FROM newer),
        |j AS (
        |  SELECT coalesce(od.doc_id, nd.doc_id) AS doc_id,
        |    CASE WHEN od.d IS NULL THEN 'added'
        |         WHEN nd.d IS NULL THEN 'removed'
        |         WHEN od.d = nd.d THEN 'same'
        |         ELSE 'changed' END AS status
        |  FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id)
        |SELECT status, count(*) AS n_keys,
        |  CAST(sum(doc_id::DECIMAL(38,0)) AS VARCHAR) AS key_digest
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q101: the ORC sink/scan leg of the IO round-trip family; the
    // oracle reads the ORIGINAL parquet, so any loss in the orc
    // write->dispatch->read path breaks the content digest.
    "q101_orc_roundtrip" -> corpusDigestSql,
    // q102: integer epoch-hour slots on both sides (no timestamp
    // formatting compared); the forward fill is last_value IGNORE
    // NULLS over the same per-key slot order, rounded once at the end.
    "q102_gap_fill" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
        |    count(*) AS n_obs, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, min(slot) AS lo, max(slot) AS hi
        |  FROM e GROUP BY 1),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(lo, hi)) AS slot
        |  FROM spans),
        |j AS (
        |  SELECT g.event_type, g.slot, e.n_obs, e.v
        |  FROM grid g LEFT JOIN e USING (event_type, slot))
        |SELECT event_type, slot AS slot_hour,
        |  coalesce(n_obs, 0) AS n_obs,
        |  round(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS value_filled,
        |  n_obs IS NULL AS was_gap
        |FROM j ORDER BY event_type, slot""".stripMargin,
    // q103: the Morton interleave is replayed bit-for-bit with a
    // generate_series lambda; quantization is exact integer floor
    // division (`//`) matching the pmod form on the Spark side.
    "q103_zorder_skipping" ->
      """WITH stats AS (
        |  SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
        |         min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
        |  FROM lineitem),
        |q AS (
        |  SELECT ((l_partkey - xmin) * 255) // (xmax - xmin) AS xq,
        |         ((l_suppkey - ymin) * 255) // (ymax - ymin) AS yq
        |  FROM lineitem CROSS JOIN stats),
        |f AS (
        |  SELECT xq, yq,
        |    CAST(list_sum(list_transform(generate_series(0, 7), i ->
        |      (((xq >> i) & 1) << (2*i)) + (((yq >> i) & 1) << (2*i+1))))
        |      AS BIGINT) >> 12 AS zfile,
        |    xq >> 4 AS lfile
        |  FROM q),
        |probe AS (SELECT (255 * 40) // 100 AS lo, (255 * 45) // 100 AS hi),
        |lstats AS (
        |  SELECT lfile, min(xq) AS mnx, max(xq) AS mxx,
        |         min(yq) AS mny, max(yq) AS mxy, count(*) AS n
        |  FROM f GROUP BY 1),
        |zstats AS (
        |  SELECT zfile, min(xq) AS mnx, max(xq) AS mxx,
        |         min(yq) AS mny, max(yq) AS mxy, count(*) AS n
        |  FROM f GROUP BY 1),
        |rep AS (
        |  SELECT 'linear' AS layout, count(*) AS n_files,
        |    CAST(sum(CASE WHEN mnx <= hi AND mxx >= lo THEN 1 ELSE 0 END)
        |      AS BIGINT) AS files_hit_x,
        |    CAST(sum(CASE WHEN mny <= hi AND mxy >= lo THEN 1 ELSE 0 END)
        |      AS BIGINT) AS files_hit_y,
        |    CAST(sum(n) AS BIGINT) AS n_rows
        |  FROM lstats CROSS JOIN probe
        |  UNION ALL
        |  SELECT 'zorder', count(*),
        |    CAST(sum(CASE WHEN mnx <= hi AND mxx >= lo THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN mny <= hi AND mxy >= lo THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(n) AS BIGINT)
        |  FROM zstats CROSS JOIN probe)
        |SELECT layout, n_files, files_hit_x, files_hit_y, n_rows
        |FROM rep ORDER BY layout""".stripMargin,
    // q104: the bin is floor(exclusive-prefix-bytes / target) in
    // file-name order per source — replayed with the same window;
    // file names are unique per partition so the order is total.
    "q104_compaction_plan" ->
      """WITH inv AS (
        |  SELECT source, lang || '_' || CAST(doc_id % 8 AS VARCHAR) AS f,
        |         sum(n_chars) AS b
        |  FROM documents GROUP BY 1, 2),
        |binned AS (
        |  SELECT source, f, b,
        |    CAST(coalesce(sum(b) OVER (PARTITION BY source ORDER BY f
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 4000 AS BIGINT) AS bin
        |  FROM inv)
        |SELECT source, bin, count(*) AS n_files,
        |  CAST(sum(b) AS BIGINT) AS bytes,
        |  min(f) AS first_file, max(f) AS last_file
        |FROM binned GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    // q105: the DECOMPOSED cumsum (per-quality prefixes + within-quality
    // windows) must equal the textbook global running sum — which is
    // exactly what this window replays
    "q105_token_budget" -> (qualityScoredCtes(Seq.empty) +
      """,
        |cum AS (
        |  SELECT doc_id, quality, tokens,
        |    CAST(SUM(tokens) OVER (ORDER BY quality DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM scored)
        |SELECT doc_id, quality, tokens, cum_tokens FROM cum
        |WHERE cum_tokens <= 10000
        |ORDER BY quality DESC, doc_id""".stripMargin),
    "q106_source_cap" -> (qualityScoredCtes(Seq("source")) +
      """,
        |ranked AS (
        |  SELECT source, doc_id, quality, tokens, row_number() OVER (
        |    PARTITION BY source ORDER BY quality DESC, doc_id) AS rank
        |  FROM scored),
        |tot AS (SELECT source, count(*) AS n_total FROM scored GROUP BY source),
        |kept AS (
        |  SELECT source, count(*) AS n_kept,
        |    CAST(sum(tokens) AS BIGINT) AS kept_tokens,
        |    round(min(quality), 3) AS quality_floor
        |  FROM ranked WHERE rank <= 10 GROUP BY source)
        |SELECT t.source, n_total, n_kept, n_total - n_kept AS n_dropped,
        |  kept_tokens, quality_floor
        |FROM tot t JOIN kept k ON t.source = k.source
        |ORDER BY t.source""".stripMargin),
    // q107: Splits.hashBucket's md5 arithmetic (same replay as q42/q43)
    "q107_exact_sample" ->
      """SELECT doc_id, source, rnk FROM (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |      % 1073741824 AS rnk
        |  FROM documents)
        |ORDER BY rnk, doc_id LIMIT 100""".stripMargin,
    // q108: same planted corruption (chr(7)=BEL, chr(65533)=U+FFFD),
    // counts via the identical length-difference arithmetic
    "q108_encoding_gate" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    text || CASE WHEN doc_id % 50 = 0 THEN chr(7) ELSE '' END
        |         || CASE WHEN doc_id % 70 = 0 THEN chr(65533) ELSE '' END AS t2
        |  FROM documents),
        |p AS (
        |  SELECT source,
        |    length(t2) - length(replace(t2, chr(65533), '')) AS n_repl,
        |    length(t2) - length(regexp_replace(t2,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS n_ctl
        |  FROM c)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_ctl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
        |  CAST(sum(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement,
        |  CAST(sum(CASE WHEN n_ctl = 0 AND n_repl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // q109: full MinHash replay (the q57 seeds/band arithmetic) over the
    // q22 gram CTEs; per-bucket means from INTEGER sums so float
    // reduction order can't flip the last ulp cross-engine
    "q109_minhash_calibration" ->
      """WITH norm AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm WHERE len(ws) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        |seeds AS (
        |  SELECT s, (11400714819323198485::HUGEINT * (2*s+1)) % 18446744073709551616::HUGEINT AS a,
        |         (2685821657736338717::HUGEINT * (s+1)) AS off
        |  FROM (SELECT unnest(generate_series(0, 11)) AS s)),
        |sig AS (
        |  SELECT doc_id, s,
        |    min((a * ('0x' || substr(md5(g), 1, 15))::BIGINT::HUGEINT + off)
        |        % 18446744073709551616::HUGEINT) AS h
        |  FROM grams CROSS JOIN seeds GROUP BY doc_id, s),
        |slices AS (
        |  SELECT doc_id, s // 3 AS band, list(h ORDER BY s) AS slice
        |  FROM sig GROUP BY doc_id, s // 3),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM slices a JOIN slices b
        |    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id),
        |m AS (
        |  SELECT c.id_a, c.id_b,
        |    sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS mm
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT m.id_a, m.id_b, m.mm,
        |    CAST(round(coalesce(i, 0)::DOUBLE / (sa.sz + sb.sz - coalesce(i, 0)) * 10000) AS BIGINT) AS e4
        |  FROM m
        |  LEFT JOIN inter ON inter.id_a = m.id_a AND inter.id_b = m.id_b
        |  JOIN sizes sa ON sa.doc_id = m.id_a
        |  JOIN sizes sb ON sb.doc_id = m.id_b),
        |bk AS (
        |  SELECT floor((mm::DOUBLE / 12) * 10) / 10 AS bucket, count(*) AS n_pairs,
        |    CAST(sum(mm) AS BIGINT) AS sm, CAST(sum(e4) AS BIGINT) AS se
        |  FROM pairs GROUP BY 1)
        |SELECT bucket, n_pairs, round(sm / (n_pairs * 12.0), 4) AS avg_est,
        |  round(se / (n_pairs * 10000.0), 4) AS avg_exact
        |FROM bk ORDER BY bucket""".stripMargin,
    // q110: hash-break boundaries replayed via the hashBucket md5
    // arithmetic; chunk ids from a per-doc prefix-count window
    "q110_cdc_chunks" ->
      """WITH norm AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '') AS ws
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(ws)), i -> i)) AS pos,
        |    unnest(ws) AS w
        |  FROM norm WHERE len(ws) >= 1),
        |b AS (
        |  SELECT doc_id, source, pos, w,
        |    CASE WHEN ('0x' || substr(md5(w), 1, 8))::BIGINT % 8 = 0
        |      THEN 1 ELSE 0 END AS brk
        |  FROM tok),
        |cid AS (
        |  SELECT doc_id, source, pos, w,
        |    coalesce(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM b),
        |chunks AS (
        |  SELECT doc_id, source, chunk,
        |    string_agg(w, ' ' ORDER BY pos) AS ctext
        |  FROM cid GROUP BY doc_id, source, chunk),
        |h AS (
        |  SELECT source, md5(ctext) AS h,
        |    len(string_split(ctext, ' ')) AS wds
        |  FROM chunks)
        |SELECT source, count(*) AS n_chunks,
        |  count(DISTINCT h) AS n_distinct_chunks,
        |  round(1.0 - (count(DISTINCT h)::DOUBLE / count(*)), 4) AS dup_chunk_ratio,
        |  round(CAST(sum(wds) AS BIGINT) / (count(*) * 1.0), 4) AS avg_chunk_words
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
    // q111: same planted snippets; RE2 spells the script property
    // \p{Cyrillic}/\p{Han} where Java says \p{IsCyrillic}/\p{IsHan}
    "q111_script_mix" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    text || CASE WHEN doc_id % 30 = 0 THEN ' привет мир' ELSE '' END
        |         || CASE WHEN doc_id % 40 = 0 THEN ' 你好世界' ELSE '' END AS t2
        |  FROM documents),
        |p AS (
        |  SELECT source,
        |    length(t2) - length(regexp_replace(t2, '\p{Cyrillic}', '', 'g')) AS cyr,
        |    length(t2) - length(regexp_replace(t2, '\p{Han}', '', 'g')) AS han
        |  FROM c)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN cyr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cyrillic_docs,
        |  CAST(sum(CASE WHEN han > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_han_docs,
        |  CAST(sum(cyr) AS BIGINT) AS cyrillic_chars,
        |  CAST(sum(han) AS BIGINT) AS han_chars
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // q112: quantile_cont boundaries (the q64/q99-proven exact
    // percentile parity) + the same strict-> bin rule
    "q112_length_histogram" ->
      """WITH v AS (SELECT n_chars AS v FROM documents),
        |b AS (
        |  SELECT quantile_cont(v, 0.1) AS q1, quantile_cont(v, 0.2) AS q2,
        |    quantile_cont(v, 0.3) AS q3, quantile_cont(v, 0.4) AS q4,
        |    quantile_cont(v, 0.5) AS q5, quantile_cont(v, 0.6) AS q6,
        |    quantile_cont(v, 0.7) AS q7, quantile_cont(v, 0.8) AS q8,
        |    quantile_cont(v, 0.9) AS q9
        |  FROM v),
        |binned AS (
        |  SELECT v,
        |    (CASE WHEN v > q1 THEN 1 ELSE 0 END + CASE WHEN v > q2 THEN 1 ELSE 0 END
        |   + CASE WHEN v > q3 THEN 1 ELSE 0 END + CASE WHEN v > q4 THEN 1 ELSE 0 END
        |   + CASE WHEN v > q5 THEN 1 ELSE 0 END + CASE WHEN v > q6 THEN 1 ELSE 0 END
        |   + CASE WHEN v > q7 THEN 1 ELSE 0 END + CASE WHEN v > q8 THEN 1 ELSE 0 END
        |   + CASE WHEN v > q9 THEN 1 ELSE 0 END) AS bin
        |  FROM v CROSS JOIN b)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
        |  min(v) AS lo, max(v) AS hi
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,
    // q113: the q58 positional-masking replay with the hot set swapped
    // for the benchmark's distinct 5-grams (q37's doc_id % 10 split)
    "q113_mask_decontaminate" ->
      """WITH normc AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE doc_id % 10 <> 0),
        |normb AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents WHERE doc_id % 10 = 0),
        |hot AS (
        |  SELECT DISTINCT
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> list_aggregate(ws[i:i+4], 'string_agg', ' '))) AS g
        |  FROM normb WHERE len(ws) >= 5),
        |pos_grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4), i -> i)) AS p,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> list_aggregate(ws[i:i+4], 'string_agg', ' '))) AS g
        |  FROM normc WHERE len(ws) >= 5),
        |covered AS (
        |  SELECT DISTINCT doc_id, cp FROM (
        |    SELECT pg.doc_id, unnest(generate_series(pg.p, pg.p + 4)) AS cp
        |    FROM pos_grams pg JOIN hot h ON pg.g = h.g)),
        |words AS (
        |  SELECT doc_id, unnest(ws) AS w,
        |    unnest(list_transform(generate_series(1, len(ws)), i -> i)) AS p
        |  FROM normc),
        |kept AS (
        |  SELECT w.doc_id, w.w, w.p
        |  FROM words w LEFT JOIN covered c ON w.doc_id = c.doc_id AND w.p = c.cp
        |  WHERE c.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE coalesce(a.text, '') END AS text
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |WHERE d.doc_id % 10 <> 0
        |ORDER BY d.doc_id""".stripMargin,
    // q114: same planted decomposed sequences (chr(769) = U+0301
    // combining acute); utf8proc NFC == JDK Normalizer NFC
    "q114_nfc_gate" ->
      """WITH c AS (
        |  SELECT source,
        |    text || CASE WHEN doc_id % 25 = 0
        |      THEN ' cafe' || chr(769) || ' releve' || chr(769)
        |      ELSE '' END AS t2
        |  FROM documents),
        |p AS (SELECT source, t2, nfc_normalize(t2) AS nm FROM c)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN nm <> t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_denormalized,
        |  CAST(sum(length(t2) - length(nm)) AS BIGINT) AS chars_delta
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "q115_fertility" ->
      """WITH tk AS (
        |  SELECT lang, n_chars,
        |    len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '')) AS toks
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(n_chars) AS BIGINT) / (CAST(sum(toks) AS BIGINT) * 1.0), 4) AS chars_per_token,
        |  round(CAST(sum(toks) AS BIGINT) / (count(*) * 1.0), 4) AS tokens_per_doc
        |FROM tk GROUP BY lang ORDER BY lang""".stripMargin,
    // q116: hashBucket md5 arithmetic over 16 shards; the share's
    // denominator is the corpus byte total
    "q116_shard_balance" ->
      """WITH s AS (
        |  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16 AS shard,
        |    n_chars
        |  FROM documents),
        |a AS (
        |  SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM s GROUP BY shard)
        |SELECT shard, n_docs, bytes,
        |  round(bytes / (CAST((SELECT sum(n_chars) FROM documents) AS BIGINT) * 1.0), 4) AS share
        |FROM a ORDER BY shard""".stripMargin,
    "q117_pseudonymize" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users_raw,
        |  count(DISTINCT substr(md5('graft-salt-v1' || user_id::VARCHAR), 1, 16)) AS n_users_pseudo
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q118: one-row datacard; quality rides the scored CTE, the dup
    // ratio the normalized-text md5, percentiles quantile_cont
    "q118_datacard" -> (qualityScoredCtes(Seq.empty) +
      """,
        |nh AS (
        |  SELECT doc_id, lang, source,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS nh
        |  FROM documents),
        |j AS (
        |  SELECT s.doc_id, s.quality, s.tokens, n.nh, n.lang, n.source
        |  FROM scored s JOIN nh n USING (doc_id))
        |SELECT count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(CAST(round(quality * 1000) AS BIGINT)) AS BIGINT)
        |    / (count(*) * 1000.0), 4) AS mean_quality,
        |  round(1.0 - (count(DISTINCT nh)::DOUBLE / count(*)), 4) AS dup_ratio,
        |  quantile_cont(tokens, 0.5) AS p50_tokens,
        |  quantile_cont(tokens, 0.9) AS p90_tokens
        |FROM j""".stripMargin),
    "q119_weighted_sample" -> (qualityScoredCtes(Seq("source")) +
      """,
        |w AS (
        |  SELECT source, quality,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b,
        |    CAST(round(quality * 10000) AS BIGINT) AS cut
        |  FROM scored)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN b < cut THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(CAST(sum(cut) AS BIGINT) / (count(*) * 10000.0), 4) AS expected_rate,
        |  round(CAST(sum(CASE WHEN b < cut THEN 1 ELSE 0 END) AS BIGINT)
        |    / (count(*) * 1.0), 4) AS actual_rate
        |FROM w GROUP BY source ORDER BY source""".stripMargin),
    // q120/q121: per-user lag windows with (us, event_id) tie-break —
    // identical deterministic order on both engines
    "q120_gap_stats" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(quantile_cont(gap, 0.5) / 1000000.0, 4) AS p50_gap_s,
        |  round(quantile_cont(gap, 0.9) / 1000000.0, 4) AS p90_gap_s,
        |  round(max(gap) / 1000000.0, 4) AS max_gap_s
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q121_transition_matrix" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev,
        |    event_type AS nxt
        |  FROM e),
        |c AS (
        |  SELECT prev, nxt, count(*) AS n FROM p
        |  WHERE prev IS NOT NULL GROUP BY prev, nxt),
        |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY prev)
        |SELECT c.prev AS prev_type, c.nxt AS next_type, n,
        |  round(n / (tot * 1.0), 4) AS prob
        |FROM c JOIN t ON c.prev = t.prev
        |ORDER BY prev_type, next_type""".stripMargin,
    // q122: native ASOF JOIN (the q31 contract) + the staleness CASE
    "q122_asof_within" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS us, max(value) AS v FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, epoch_us(ts))
        |SELECT l.event_id, l.user_id,
        |  CASE WHEN r.us IS NOT NULL AND l.us - r.us <= 7200000000
        |    THEN round(r.v, 2) END AS attr_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us
        |ORDER BY l.event_id""".stripMargin,
    // q123: run collapse via lag + row_number, intervals via lead —
    // the same two-window spec on both engines
    "q123_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events),
        |d AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |c AS (
        |  SELECT user_id, event_type, us, event_id FROM d
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |v AS (
        |  SELECT user_id, event_type, us AS valid_from_us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
        |  FROM c)
        |SELECT user_id, event_type, valid_from_us, valid_to_us,
        |  valid_to_us IS NULL AS is_current
        |FROM v
        |ORDER BY user_id, valid_from_us, event_type,
        |  valid_to_us ASC NULLS LAST""".stripMargin,
    // q124: q88's md5 sort-key replay + per-file lag windows; the
    // expectation is exact Σ n² / N² from integer sums
    "q124_order_decorrelation" ->
      """WITH docs AS (SELECT doc_id, source FROM documents),
        |exp_r AS (
        |  SELECT round(CAST(sum(n::HUGEINT * n) AS DOUBLE)
        |    / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 4) AS expected_rate
        |  FROM (SELECT count(*) AS n FROM docs GROUP BY source)),
        |nat AS (
        |  SELECT 'by_id_blocks' AS layout, count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN source = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        |  FROM (
        |    SELECT source,
        |      lag(source) OVER (PARTITION BY doc_id // 25 ORDER BY doc_id) AS prev
        |    FROM docs) x WHERE prev IS NOT NULL),
        |sh AS (
        |  SELECT 'shuffled_shards' AS layout, count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN source = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        |  FROM (
        |    SELECT source, lag(source) OVER (PARTITION BY sk % 8 ORDER BY sk) AS prev
        |    FROM (
        |      SELECT source,
        |        ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT AS sk
        |      FROM docs) z) y WHERE prev IS NOT NULL)
        |SELECT layout, n_pairs, n_same,
        |  round(n_same / (n_pairs * 1.0), 4) AS rate, expected_rate
        |FROM (SELECT * FROM nat UNION ALL SELECT * FROM sh) u CROSS JOIN exp_r
        |ORDER BY layout""".stripMargin,
    // q125: add-one-smoothed KL over the union vocab; e12 fixed-point
    // contribution sums (integer, order-independent), ln == log
    "q125_unigram_drift" ->
      """WITH tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        |    FROM documents) r WHERE w <> ''),
        |c1 AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |c2 AS (SELECT w, count(*) AS c FROM tok WHERE doc_id % 7 <> 0 GROUP BY w),
        |j AS (
        |  SELECT coalesce(c1.c, 0) AS a, coalesce(c2.c, 0) AS b
        |  FROM c1 FULL JOIN c2 ON c1.w = c2.w),
        |v AS (SELECT count(*) AS vs FROM j),
        |t1 AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM j),
        |t2 AS (SELECT CAST(sum(b) AS BIGINT) AS n FROM j),
        |kl AS (
        |  SELECT CAST(sum(e) AS BIGINT) AS s FROM (
        |    SELECT CAST(round(
        |      ((b + 1.0) / (t2.n + v.vs))
        |        * ln(((b + 1.0) / (t2.n + v.vs)) / ((a + 1.0) / (t1.n + v.vs)))
        |        * 1e12) AS BIGINT) AS e
        |    FROM j CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN v))
        |SELECT v.vs AS vocab, t1.n AS tokens_v1, t2.n AS tokens_v2,
        |  round(kl.s / 1e12, 6) AS kl_nats
        |FROM v CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN kl""".stripMargin,
    // q126: largest-remainder allocation (floors + top remainders,
    // name tie-break) and the md5-ranked per-stratum sample
    "q126_proportional_sample" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS grp, count(*) AS n FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
        |q AS (
        |  SELECT grp, n, CAST((1000 * n) // nn AS BIGINT) AS fl,
        |    row_number() OVER (ORDER BY (1000 * n) % nn DESC, grp) AS rk
        |  FROM c CROSS JOIN t),
        |lo AS (SELECT 1000 - CAST(sum(fl) AS BIGINT) AS l FROM q),
        |alloc AS (
        |  SELECT grp, n, fl + CASE WHEN rk <= l THEN 1 ELSE 0 END AS quota
        |  FROM q CROSS JOIN lo),
        |ranked AS (
        |  SELECT o_orderpriority AS grp, row_number() OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT
        |      % 1073741824, o_orderkey) AS rn
        |  FROM orders),
        |sampled AS (
        |  SELECT r.grp, count(*) AS n_sampled
        |  FROM ranked r JOIN alloc a ON r.grp = a.grp
        |  WHERE r.rn <= a.quota GROUP BY r.grp)
        |SELECT a.grp, a.n AS n_available, CAST(a.quota AS BIGINT) AS quota,
        |  coalesce(s.n_sampled, 0) AS n_sampled
        |FROM alloc a LEFT JOIN sampled s ON a.grp = s.grp
        |ORDER BY a.grp""".stripMargin,
    // q127: the q33 profile-hit argmax replay, cross-tabbed against
    // the declared lang column
    "q127_lang_confusion" ->
      """WITH tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents) r
        |  WHERE w <> ''),
        |hits AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN w IN ('der','die','und','in','den','von','zu',
        |      'das','mit','sich','des','auf','ist','nicht','ein')
        |      THEN 1 ELSE 0 END) AS h_de,
        |    sum(CASE WHEN w IN ('the','be','to','of','and','a','in','that',
        |      'have','i','it','is','was','for','on') THEN 1 ELSE 0 END) AS h_en,
        |    sum(CASE WHEN w IN ('de','la','que','el','en','y','a','los',
        |      'se','del','las','un','por','con','no') THEN 1 ELSE 0 END) AS h_es,
        |    sum(CASE WHEN w IN ('de','la','le','et','les','des','en','un',
        |      'du','une','que','est','pour','qui','dans') THEN 1 ELSE 0 END) AS h_fr
        |  FROM tok GROUP BY doc_id),
        |det AS (
        |  SELECT d.doc_id, d.lang AS declared,
        |    CASE WHEN greatest(coalesce(h_de,0), coalesce(h_en,0),
        |                       coalesce(h_es,0), coalesce(h_fr,0)) = 0 THEN 'und'
        |         WHEN coalesce(h_fr,0) = greatest(coalesce(h_de,0), coalesce(h_en,0), coalesce(h_es,0), coalesce(h_fr,0)) THEN 'fr'
        |         WHEN coalesce(h_es,0) = greatest(coalesce(h_de,0), coalesce(h_en,0), coalesce(h_es,0), coalesce(h_fr,0)) THEN 'es'
        |         WHEN coalesce(h_en,0) = greatest(coalesce(h_de,0), coalesce(h_en,0), coalesce(h_es,0), coalesce(h_fr,0)) THEN 'en'
        |         ELSE 'de' END AS detected
        |  FROM documents d LEFT JOIN hits USING (doc_id))
        |SELECT declared, detected, count(*) AS n_docs
        |FROM det GROUP BY declared, detected
        |ORDER BY declared, detected""".stripMargin,
    // q128: q29's gap sessionization + [start, last+gap) interval →
    // slot coverage; 600 s slots
    "q128_session_concurrency" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 10 MINUTE OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |sess AS (
        |  SELECT user_id, sid, min(ts) AS st,
        |    max(ts) + INTERVAL 10 MINUTE AS en
        |  FROM s GROUP BY user_id, sid),
        |slots AS (
        |  SELECT unnest(list_transform(generate_series(
        |      epoch_us(st) // 600000000,
        |      (epoch_us(en) - 1) // 600000000), x -> x)) AS slot
        |  FROM sess)
        |SELECT CAST(slot AS BIGINT) AS slot,
        |  strftime(make_timestamp(slot * 600000000), '%Y-%m-%d %H:%M') AS slot_start,
        |  count(*) AS n_active
        |FROM slots GROUP BY slot ORDER BY slot""".stripMargin,
    // q129: two lags on the q120/q121 per-user window; top-20 with a
    // full path tie-break so the cut is deterministic
    "q129_top_paths" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |p AS (
        |  SELECT
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS step1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS step2,
        |    event_type AS step3
        |  FROM e)
        |SELECT step1, step2, step3, count(*) AS n
        |FROM p WHERE step1 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    // q130: the q75 level joins + quantile_cont latencies, each
    // transition over its own completers
    "q130_funnel_latency" ->
      """WITH l1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |l2 AS (
        |  SELECT e.user_id, l1.t1, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN l1 ON e.user_id = l1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= l1.t1
        |  GROUP BY e.user_id, l1.t1),
        |l3 AS (
        |  SELECT e.user_id, l2.t2, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN l2 ON e.user_id = l2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= l2.t2
        |  GROUP BY e.user_id, l2.t2),
        |a1 AS (SELECT count(*) AS n_step1 FROM l1),
        |a2 AS (
        |  SELECT count(*) AS n_step2,
        |    round(quantile_cont(t2 - t1, 0.5) / 1000000.0, 4) AS p50_s1_to_s2_s,
        |    round(quantile_cont(t2 - t1, 0.9) / 1000000.0, 4) AS p90_s1_to_s2_s
        |  FROM l2),
        |a3 AS (
        |  SELECT count(*) AS n_step3,
        |    round(quantile_cont(t3 - t2, 0.5) / 1000000.0, 4) AS p50_s2_to_s3_s,
        |    round(quantile_cont(t3 - t2, 0.9) / 1000000.0, 4) AS p90_s2_to_s3_s
        |  FROM l3)
        |SELECT n_step1, n_step2, n_step3,
        |  p50_s1_to_s2_s, p90_s1_to_s2_s, p50_s2_to_s3_s, p90_s2_to_s3_s
        |FROM a1 CROSS JOIN a2 CROSS JOIN a3""".stripMargin,
    // q131: ratesForMixture's scale/min arithmetic and byRates'
    // round(rate*10000) md5 cutoff, operation for operation
    "q131_mixture_plan" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '')) AS toks
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |avail AS (
        |  SELECT source, CAST(sum(toks) AS BIGINT) AS a
        |  FROM tk GROUP BY source),
        |wts AS (SELECT * FROM (VALUES ('src0', 4.0), ('src1', 3.0),
        |  ('src2', 2.0), ('src3', 1.0)) w(source, wt)),
        |j AS (SELECT avail.source, a, wt FROM avail JOIN wts USING (source)),
        |sc AS (SELECT min(a / (wt / 10.0)) AS scale FROM j),
        |r AS (
        |  SELECT source, a, wt,
        |    least(1.0, (wt / 10.0) * scale / a) AS rate
        |  FROM j CROSS JOIN sc),
        |cut AS (
        |  SELECT source, a, wt, rate,
        |    CAST(round(rate * 10000) AS BIGINT) AS cutoff FROM r),
        |kept AS (
        |  SELECT tk.source, count(*) AS nk, CAST(sum(toks) AS BIGINT) AS kt
        |  FROM tk JOIN cut ON tk.source = cut.source
        |  WHERE ('0x' || substr(md5(tk.doc_id::VARCHAR), 1, 8))::BIGINT % 10000
        |        < cutoff
        |  GROUP BY tk.source)
        |SELECT c.source, c.a AS avail_tokens, c.wt AS weight,
        |  round(c.rate, 6) AS rate,
        |  coalesce(k.nk, 0) AS n_kept, coalesce(k.kt, 0) AS kept_tokens
        |FROM cut c LEFT JOIN kept k ON c.source = k.source
        |ORDER BY c.source""".stripMargin,
    // q132: pinned-VALUES truth table (full §3.1 CLI lifecycle; the
    // stemmed word-score fuzzy ladder is not SQL-expressible — q16-pin
    // contract, see PinnedOracles).
    "q132_cli_score" -> PinnedOracles.q132Sql,
    // q133: the dialect columns are HAND-DERIVED from the intended
    // S5-S7 sniffing semantics (a real contract, not a replay); the
    // row stats come from the same documents head both engines read.
    "q133_sniff_dialects" ->
      """WITH hd AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 50),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(doc_id) AS BIGINT) AS s FROM hd)
        |SELECT d.dialect, d.delimiter, d.quote_char, d.has_header,
        |       agg.n AS n_rows, agg.s AS id_sum
        |FROM (VALUES
        |  ('comma_header', ',', CAST(NULL AS VARCHAR), true),
        |  ('pipe_noheader', '|', CAST(NULL AS VARCHAR), false),
        |  ('quoted_text', ',', '"', true),
        |  ('semicolon_fallback', ';', CAST(NULL AS VARCHAR), true),
        |  ('tab_header', chr(9), CAST(NULL AS VARCHAR), true)
        | ) d(dialect, delimiter, quote_char, has_header)
        |CROSS JOIN agg
        |ORDER BY d.dialect""".stripMargin,
    // q134: pinned-VALUES truth table (MLlib training metrics — q25
    // contract, see PinnedOracles).
    "q134_ml_classifiers" -> PinnedOracles.q134Sql,
    // q141: pinned truth table (stemmed per-category vocabulary — the
    // q16/q132 non-SQL-expressible contract)
    "q141_cli_train_wordscore" -> PinnedOracles.q141Sql,
    // q142/q143: full record-linkage replay — staging, normalization,
    // blocking, Levenshtein ratio, and (for q143) the transitive
    // closure via a recursive reachability CTE
    "q142_entity_pairs" -> (entityPairsSql +
      "\nSELECT id_a, id_b, sim FROM pairs ORDER BY id_a, id_b"),
    "q143_entity_ids" -> (entityPairsSql +
      """,
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |        UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
        |SELECT k.id,
        |  CAST(least(k.id,
        |    coalesce((SELECT min(b) FROM reach WHERE a = k.id), k.id))
        |    AS BIGINT) AS entity_id
        |FROM kk k ORDER BY k.id""".stripMargin),
    // q144: typed JSON extraction over the three-way staged payloads —
    // json_valid gates replicate Spark's null-for-corrupt contract,
    // missing paths null out on both engines
    "q144_json_extract" -> s"""WITH staged AS (
${propsStageSql.linesIterator.map("  " + _).mkString("\n")}
),
ex AS (
  SELECT event_type,
    CASE WHEN json_valid(props)
         THEN TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) END AS k,
    CASE WHEN json_valid(props)
         THEN TRY_CAST(json_extract_string(props, '$$.u') AS BIGINT) END AS u
  FROM staged)
SELECT event_type, count(*) AS n_rows,
  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
  CAST(sum(CASE WHEN u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_enriched,
  CAST(sum(k) AS BIGINT) AS sum_k,
  CAST(sum(u) AS BIGINT) AS sum_u
FROM ex GROUP BY event_type ORDER BY event_type""",
    // q146: payload key census — json_keys unnest + per-key string
    // extraction, malformed rows dropped by the same json_valid gate
    // Spark's null-map from_json drop implements
    "q146_json_key_census" -> s"""WITH staged AS (
${propsStageSql.linesIterator.map("  " + _).mkString("\n")}
),
kv AS (
  SELECT unnest(json_keys(props)) AS key, props
  FROM staged WHERE props IS NOT NULL AND json_valid(props)),
v AS (SELECT key, json_extract_string(props, key) AS value FROM kv)
SELECT key, count(*) AS n_rows,
  CAST(sum(CASE WHEN regexp_matches(value, '^-?\\d+$$') THEN 1 ELSE 0 END)
    AS BIGINT) AS n_int,
  count(DISTINCT value) AS n_values
FROM v GROUP BY key ORDER BY key""",
    // q145: the q22 pair replay, closed into components (q143's
    // recursive reachability), split 80/10/10 by COMPONENT id with the
    // q140 md5 bucket arithmetic, then the pair frame re-audited
    // against the cluster-keyed assignment
    "q145_cluster_split" -> s"""WITH RECURSIVE pairs AS (
${minhashPairsSql.linesIterator.map("  " + _).mkString("\n")}
),
und AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
lab AS (
  SELECT d.doc_id,
    CAST(least(d.doc_id,
      coalesce((SELECT min(b) FROM reach WHERE a = d.doc_id), d.doc_id))
      AS BIGINT) AS cluster_id
  FROM documents d),
sp AS (
  SELECT doc_id, cluster_id,
    CASE WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 10 < 8 THEN 'train'
         WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 10 < 9 THEN 'val'
         ELSE 'test' END AS split
  FROM lab),
leaks AS (
  SELECT sa.split AS split, count(*) AS leaked
  FROM pairs p
  JOIN sp sa ON sa.doc_id = p.id_a
  JOIN sp sb ON sb.doc_id = p.id_b
  WHERE sa.split <> sb.split
  GROUP BY 1)
SELECT s.split, count(*) AS n_docs,
  count(DISTINCT s.cluster_id) AS n_clusters,
  CAST(coalesce(max(k.leaked), 0) AS BIGINT) AS leaked_pairs
FROM sp s LEFT JOIN leaks k ON k.split = s.split
GROUP BY s.split ORDER BY s.split""",
    // q147: full KMV replay — 60-bit md5 fractions, per-group rank-k
    // prune, and the (k-1)/u_k estimate beside the exact distinct
    "q147_kmv_users" ->
      """WITH hd AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
        |      / power(16, 15) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, u,
        |        row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        |      FROM hd),
        |s AS (SELECT event_type, count(*) AS n_kept, max(u) AS u_k
        |      FROM r WHERE rk <= 64 GROUP BY event_type),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |       FROM events GROUP BY event_type)
        |SELECT ex.event_type, ex.n_exact, s.n_kept,
        |  CASE WHEN s.n_kept < 64 THEN s.n_kept::DOUBLE
        |       ELSE round(63.0 / s.u_k, 4) END AS est_distinct
        |FROM ex JOIN s USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q148: ordered transcript assembly replay — microsecond time +
    // event_id rank, string_agg over the first 20, full count beside
    "q148_transcripts" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS rk
        |      FROM e),
        |n AS (SELECT user_id, count(*) AS n_items FROM e GROUP BY user_id),
        |t AS (SELECT user_id,
        |        string_agg(event_type, '>' ORDER BY rk) AS transcript
        |      FROM r WHERE rk <= 20 GROUP BY user_id)
        |SELECT n.user_id, n.n_items, n.n_items > 20 AS truncated,
        |  t.transcript
        |FROM n JOIN t USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // q149: temperature-mix replay — the exact order-free
    // pow/min-ratio/clamp arithmetic of ratesForTemperature (alpha
    // 0.5) and the byRates 10^4-bucket md5 cutoff
    "q149_temperature_mix" ->
      """WITH avail AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM avail),
        |w AS (SELECT lang, n, power(n::DOUBLE / t, 0.5) AS w
        |      FROM avail CROSS JOIN tot),
        |mr AS (SELECT min(n / w) AS m FROM w),
        |r AS (SELECT lang, n, least(1.0, round(w * m / n, 12)) AS rate
        |      FROM w CROSS JOIN mr),
        |cut AS (SELECT lang, n, rate,
        |          CAST(round(rate * 10000) AS BIGINT) AS cutoff FROM r),
        |kept AS (
        |  SELECT d.lang, count(*) AS nk
        |  FROM documents d JOIN cut ON d.lang = cut.lang
        |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000
        |        < cutoff
        |  GROUP BY d.lang)
        |SELECT c.lang, c.n AS n_available, round(c.rate, 6) AS rate,
        |  coalesce(k.nk, 0) AS n_kept
        |FROM cut c LEFT JOIN kept k ON c.lang = k.lang
        |ORDER BY c.lang""".stripMargin,
    // q150: the KMV merge invariant re-derived — per-half prune to 64,
    // union + re-prune (merged path) vs one-pass prune (whole path),
    // list-compared states and both estimates
    "q150_kmv_merge" ->
      """WITH hd AS (
        |  SELECT DISTINCT event_type, event_id % 2 AS half,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
        |      / power(16, 15) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |hr AS (SELECT event_type, u,
        |         row_number() OVER (PARTITION BY event_type, half
        |           ORDER BY u) AS rk
        |       FROM hd),
        |pruned AS (SELECT DISTINCT event_type, u FROM hr WHERE rk <= 64),
        |m AS (SELECT event_type, u,
        |        row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        |      FROM pruned),
        |ms AS (SELECT event_type, count(*) AS kc, max(u) AS uk,
        |         list(u ORDER BY u) AS st
        |       FROM m WHERE rk <= 64 GROUP BY event_type),
        |wh AS (SELECT DISTINCT event_type, u FROM hd),
        |wr AS (SELECT event_type, u,
        |         row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        |       FROM wh),
        |ws AS (SELECT event_type, count(*) AS kc, max(u) AS uk,
        |         list(u ORDER BY u) AS st
        |       FROM wr WHERE rk <= 64 GROUP BY event_type)
        |SELECT ms.event_type, ms.kc AS k_state,
        |  CASE WHEN ms.kc < 64 THEN ms.kc::DOUBLE
        |       ELSE round(63.0 / ms.uk, 4) END AS est_merged,
        |  CASE WHEN ws.kc < 64 THEN ws.kc::DOUBLE
        |       ELSE round(63.0 / ws.uk, 4) END AS est_whole,
        |  ms.st = ws.st AS states_equal
        |FROM ms JOIN ws USING (event_type)
        |ORDER BY ms.event_type""".stripMargin,
    // q151: the UDAF form re-derived — per-type rank-64 prune, plus
    // the ROLLUP total row as the rank-64 prune over the distinct
    // union of all fractions (what merging every group buffer yields)
    "q151_kmv_rollup" ->
      """WITH hd AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
        |      / power(16, 15) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, u,
        |        row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        |      FROM hd),
        |s AS (SELECT event_type, count(*) AS n_kept, max(u) AS u_k
        |      FROM r WHERE rk <= 64 GROUP BY event_type),
        |au AS (SELECT DISTINCT u FROM hd),
        |ar AS (SELECT u, row_number() OVER (ORDER BY u) AS rk FROM au),
        |asx AS (SELECT count(*) AS n_kept, max(u) AS u_k
        |        FROM ar WHERE rk <= 64),
        |unioned AS (
        |  SELECT event_type, n_kept, u_k FROM s
        |  UNION ALL
        |  SELECT 'ALL', n_kept, u_k FROM asx)
        |SELECT event_type, n_kept,
        |  CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
        |       ELSE round(63.0 / u_k, 4) END AS est_distinct
        |FROM unioned
        |ORDER BY event_type""".stripMargin,
    // q152: the streaming ingest gate's batch form re-derived — md5
    // novelty anti-join, q33 quality, dup-2-gram repetition, the
    // top-4096 add-one unigram REFERENCE model (fit on hist, scored on
    // survivors), and exact 5-gram benchmark decontamination
    "q152_stream_gate" ->
      """WITH input AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
        |hist AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |bench AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0),
        |s1 AS MATERIALIZED (
        |  SELECT i.* FROM input i
        |  WHERE md5(regexp_replace(lower(trim(i.text)), '\s+', ' ', 'g')) NOT IN
        |    (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) FROM hist)),
        |tok3 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM s1) r
        |  WHERE w <> ''),
        |stats3 AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','it','that','this','for','on','with','as',
        |      'at','by','be') THEN 1 ELSE 0 END) AS stops
        |  FROM tok3 GROUP BY doc_id),
        |s3 AS MATERIALIZED (
        |  SELECT s1.* FROM s1 JOIN (
        |    SELECT d.doc_id,
        |      round(least(coalesce(s.n, 0) / 20.0, 1.0) * 0.3
        |        + (1.0 - least((CASE WHEN length(d.text) > 0 THEN
        |            (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
        |            ELSE 0.0 END) * 4, 1.0)) * 0.2
        |        + least(CASE WHEN coalesce(s.n, 0) > 0 THEN coalesce(s.stops, 0)::DOUBLE / s.n ELSE 0.0 END * 4, 1.0) * 0.3
        |        + CASE WHEN coalesce(s.mtl, 0) BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS q
        |    FROM s1 d LEFT JOIN stats3 s USING (doc_id)) qs USING (doc_id)
        |  WHERE qs.q >= 0.3),
        |norm4 AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> '') AS ws
        |  FROM s3),
        |ga4 AS MATERIALIZED (
        |  SELECT doc_id, sum(c) AS tg, count(*) AS dg FROM (
        |    SELECT doc_id, g, count(*) AS c FROM (
        |      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
        |        i -> ws[i] || ' ' || ws[i+1])) AS g
        |      FROM norm4 WHERE len(ws) >= 2) t GROUP BY doc_id, g) gc
        |  GROUP BY doc_id),
        |s4 AS MATERIALIZED (
        |  SELECT s3.* FROM s3 JOIN (
        |    SELECT n.doc_id, round(coalesce((ga4.tg - ga4.dg) / ga4.tg, 0), 4) AS dup2
        |    FROM norm4 n LEFT JOIN ga4 ON n.doc_id = ga4.doc_id) r USING (doc_id)
        |  WHERE r.dup2 <= 0.3),
        |toksh AS MATERIALIZED (
        |  SELECT w FROM (
        |    SELECT unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS w
        |    FROM hist) r),
        |vocab AS MATERIALIZED (
        |  SELECT w, c FROM (SELECT w, count(*) AS c FROM toksh GROUP BY w)
        |  ORDER BY c DESC, w ASC LIMIT 4096),
        |mt AS MATERIALIZED (
        |  SELECT coalesce(sum(c), 0) AS total, count(*) + 1 AS v FROM vocab),
        |t5 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '')) AS w
        |    FROM s4) r),
        |sc AS MATERIALIZED (
        |  SELECT t5.doc_id,
        |    round(avg(-ln((coalesce(vocab.c, 0) + 1) / (mt.total + mt.v))), 3) AS lm
        |  FROM t5 LEFT JOIN vocab USING (w) CROSS JOIN mt
        |  GROUP BY t5.doc_id),
        |s5 AS MATERIALIZED (
        |  SELECT s4.* FROM s4 LEFT JOIN sc USING (doc_id)
        |  WHERE sc.lm IS NULL OR sc.lm <= 9.0),
        |norm6 AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
        |  FROM s5),
        |g_new AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM norm6 WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS g
        |  FROM norm6 WHERE len(ws) BETWEEN 1 AND 4),
        |normb AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws
        |  FROM bench),
        |g_b AS MATERIALIZED (
        |  SELECT DISTINCT
        |    unnest(list_transform(generate_series(1, len(ws)-4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM normb WHERE len(ws) >= 5
        |  UNION
        |  SELECT DISTINCT array_to_string(ws, ' ') AS g
        |  FROM normb WHERE len(ws) BETWEEN 1 AND 4),
        |s6 AS MATERIALIZED (
        |  SELECT s5.* FROM s5 WHERE doc_id NOT IN (
        |    SELECT DISTINCT n.doc_id FROM g_new n JOIN g_b b ON n.g = b.g))
        |SELECT s6.doc_id, sc.lm AS lm_ref
        |FROM s6 LEFT JOIN sc USING (doc_id)
        |ORDER BY s6.doc_id""".stripMargin,
    // q153: heavy hitters replayed as the full GROUP BY / HAVING the
    // bounded-state two-pass construction guarantees to equal
    "q153_heavy_tokens" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |    w -> w <> '')) AS token
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT token, count(*) AS n_occurrences
        |FROM t CROSS JOIN tot
        |GROUP BY token, tot.n
        |HAVING count(*) > 0.01 * tot.n
        |ORDER BY n_occurrences DESC, token ASC""".stripMargin,
    // q154: the HTML → text regex chain replayed verbatim (RE2 inline
    // flags; same pattern strings, same order, ending with the
    // double-escape-correct &amp; decode)
    "q154_html_extract" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><script type="text/js">var x = 1 < 2;</script><style>p { color: red }</style></head><body><!-- nav --><p>'
        |    || text ||
        |    '</p><DIV class="f">&amp;lt; &lt;tag&gt; &nbsp;&#39;q&quot;</DIV></body></html>' AS h
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(h,
        |  '(?is)<(script|style|noscript)\b[^>]*>.*?</(script|style|noscript)>',
        |  ' ', 'g') AS h FROM page),
        |s2 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(h,
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS h
        |  FROM s3)
        |SELECT doc_id, trim(regexp_replace(h, '\s+', ' ', 'g')) AS text
        |FROM s4 ORDER BY doc_id""".stripMargin,
    // q155: host + approximate-PSL apex replayed with the same regex
    // and the same multi-part suffix set (interpolated from the ONE
    // Scala definition so the two engines cannot drift)
    "q155_domain_census" -> {
      val suffixes = (graft.ops.Web.DefaultMultiPartSuffixes :+ "web.zz")
        .map(s => s"'$s'").mkString(", ")
      s"""WITH u AS (
         |  SELECT CASE WHEN doc_id % 17 = 0 THEN '/rel/' || doc_id::VARCHAR
         |    ELSE CASE WHEN doc_id % 19 = 0 THEN '//' ELSE 'https://' END
         |      || CASE WHEN doc_id % 11 = 0 THEN 'u:p@' ELSE '' END
         |      || 'sub' || (doc_id % 7)::VARCHAR
         |      || '.dom' || (doc_id % 13)::VARCHAR
         |      || CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
         |           WHEN doc_id % 23 = 0 THEN '.web.zz' ELSE '.com' END
         |      || CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END
         |      || '/p/' || doc_id::VARCHAR END AS url
         |  FROM documents),
         |h AS (SELECT nullif(regexp_extract(lower(trim(url)),
         |    '^(?:[a-z][a-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)', 1), '') AS host
         |  FROM u),
         |a AS (SELECT host, CASE
         |    WHEN host IS NULL THEN NULL
         |    WHEN len(ls) <= 2 THEN host
         |    WHEN (ls[-2] || '.' || ls[-1]) IN ($suffixes)
         |      THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
         |    ELSE ls[-2] || '.' || ls[-1] END AS apex
         |  FROM (SELECT host, string_split(host, '.') AS ls FROM h))
         |SELECT coalesce(apex, '(none)') AS apex,
         |  count(*) AS n_docs, count(DISTINCT host) AS n_hosts
         |FROM a GROUP BY 1 ORDER BY apex""".stripMargin
    },
    // q156: every Gopher rule re-derived over the same synthesized
    // structure — token HOFs as list_* calls, unrounded ratios in the
    // pass flag exactly as the operator compares them
    "q156_gopher_rules" ->
      """WITH st AS (
        |  SELECT doc_id, concat_ws(chr(10), text,
        |    CASE WHEN doc_id % 4 = 0 THEN '• a bullet item' END,
        |    CASE WHEN doc_id % 6 = 0 THEN '- another list line' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'a trailing thought...' END,
        |    CASE WHEN doc_id % 9 = 0 THEN '#### #tags remain ####' END,
        |    CASE WHEN doc_id % 7 = 0 THEN '42 17 99 31 55 0 8 13 21 34' END) AS text
        |  FROM documents),
        |w AS (SELECT doc_id, text,
        |  list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), x -> x <> '') AS ws,
        |  list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls
        |  FROM st),
        |m AS (SELECT doc_id, text, ws, ls,
        |  len(ws) AS n, len(ls) AS nl,
        |  list_sum(list_transform(ws, x -> length(x))) AS tc,
        |  length(text) - length(regexp_replace(text, '#', '', 'g')) AS hc,
        |  (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3 AS ec,
        |  len(list_filter(ls, l -> regexp_matches(l, '^\s*[•\-\*]'))) AS bl,
        |  len(list_filter(ls, l -> regexp_matches(l, '\.\.\.\s*$'))) AS el,
        |  len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS aw,
        |  len(list_filter(['the','be','to','of','and','that','have','with'],
        |    s -> list_contains(ws, s))) AS sp
        |  FROM w)
        |SELECT doc_id,
        |  coalesce(n, 0) AS n_words,
        |  CASE WHEN n > 0 THEN round(tc::DOUBLE / n, 3) END AS mean_word_len,
        |  CASE WHEN n > 0 THEN round((hc + ec)::DOUBLE / n, 4) END AS symbol_word_ratio,
        |  CASE WHEN n > 0 AND nl > 0 THEN round(bl::DOUBLE / nl, 4) END AS bullet_line_frac,
        |  CASE WHEN n > 0 AND nl > 0 THEN round(el::DOUBLE / nl, 4) END AS ellipsis_line_frac,
        |  CASE WHEN n > 0 THEN round(aw::DOUBLE / n, 4) END AS alpha_word_frac,
        |  CASE WHEN n > 0 THEN sp ELSE 0 END AS n_stop_present,
        |  coalesce(CASE WHEN n > 0 THEN
        |    n >= 10 AND n <= 100000
        |    AND tc::DOUBLE / n >= 3.0 AND tc::DOUBLE / n <= 10.0
        |    AND (hc + ec)::DOUBLE / n <= 0.1
        |    AND (nl = 0 OR (bl::DOUBLE / nl <= 0.9 AND el::DOUBLE / nl <= 0.3))
        |    AND aw::DOUBLE / n >= 0.8 AND sp >= 2 END, false) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin,
    // q157: the whole epoch recipe re-derived — exact integer budget,
    // plan arithmetic in the same IEEE operation order (budget*w/10
    // then /avail), 12-decimal frac quantization, md5 cutoff, and the
    // materialization counts as full·n + |{hash < cutoff}|
    "q157_epoch_plan" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '')) AS toks
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |avail AS (
        |  SELECT source, CAST(sum(toks) AS BIGINT) AS a
        |  FROM tk GROUP BY source),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS t FROM avail),
        |wts AS (SELECT * FROM (VALUES ('src0', 4.0), ('src1', 3.0),
        |  ('src2', 2.0), ('src3', 1.0)) w(source, wt)),
        |p AS (
        |  SELECT source, a,
        |    least(4.0, (((t * 9) // 5)::DOUBLE * wt / 10.0) / a) AS epochs
        |  FROM avail JOIN wts USING (source) CROSS JOIN tot),
        |p2 AS (
        |  SELECT source, a,
        |    CAST(floor(epochs) AS BIGINT) AS fe,
        |    floor((epochs - floor(epochs)) * 1e12 + 0.5) / 1e12 AS fr
        |  FROM p),
        |p3 AS (SELECT source, a, fe, fr,
        |    CAST(round(fr * 10000) AS BIGINT) AS cutoff FROM p2),
        |hits AS (
        |  SELECT tk.source, p3.fe, count(*) AS n, CAST(sum(toks) AS BIGINT) AS st,
        |    sum(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
        |          < p3.cutoff THEN 1 ELSE 0 END) AS nh,
        |    CAST(sum(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
        |          < p3.cutoff THEN toks ELSE 0 END) AS BIGINT) AS th,
        |    max(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
        |          < p3.cutoff THEN 1 ELSE 0 END) AS anyhit
        |  FROM tk JOIN p3 ON tk.source = p3.source
        |  GROUP BY tk.source, p3.fe)
        |SELECT p3.source, p3.a AS avail_tokens, p3.fe AS full_epochs,
        |  round(p3.fr, 6) AS frac_rate,
        |  CAST(coalesce(h.fe * h.n + h.nh, 0) AS BIGINT) AS n_rows_out,
        |  CAST(coalesce(h.fe * h.st + h.th, 0) AS BIGINT) AS out_tokens,
        |  CAST(coalesce(CASE WHEN h.fe * h.n + h.nh > 0
        |    THEN h.fe + h.anyhit ELSE 0 END, 0) AS BIGINT) AS max_epoch
        |FROM p3 LEFT JOIN hits h ON p3.source = h.source
        |ORDER BY p3.source""".stripMargin,
    // q159: add-one-smoothed day-over-day PSI re-derived — the dense
    // (day, type) grid over the global domain, p=(n+1)/(N+C), and the
    // adjacent-day (p−q)·ln(p/q) sum
    "q159_psi_drift" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS pd, event_type AS cat
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |c AS (SELECT pd, cat, count(*) AS n FROM ev GROUP BY pd, cat),
        |cats AS (SELECT DISTINCT cat FROM c),
        |nc AS (SELECT count(*) AS k FROM cats),
        |tot AS (SELECT pd, CAST(sum(n) AS BIGINT) AS nn FROM c GROUP BY pd),
        |shares AS (
        |  SELECT t.pd, cats.cat,
        |    (coalesce(c.n, 0) + 1)::DOUBLE / (t.nn + nc.k) AS p
        |  FROM tot t CROSS JOIN cats CROSS JOIN nc
        |  LEFT JOIN c ON c.pd = t.pd AND c.cat = cats.cat),
        |psi AS (
        |  SELECT cur.pd,
        |    round(sum((cur.p - prv.p) * ln(cur.p / prv.p)), 6) AS psi
        |  FROM shares cur JOIN shares prv
        |    ON prv.pd = cur.pd - 1 AND prv.cat = cur.cat
        |  GROUP BY cur.pd)
        |SELECT psi.pd AS period, tot.nn AS n_events, psi.psi
        |FROM psi JOIN tot ON tot.pd = psi.pd
        |ORDER BY period""".stripMargin,
    // q162: PINNED truth table (q132/q141 contract — skip-gram
    // training is not SQL-expressible; the output IS deterministic:
    // 1-partition seeded fit, bit-identical refit pinned in MLSpec).
    // Values frozen from the sf0.01 fixture; a tokenization or
    // training change that moves ANY neighbor or 4-decimal cosine
    // breaks this row on purpose.
    "q162_w2v_ann" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(cosine AS DOUBLE) AS cosine
        |FROM (VALUES (222, 0.9998), (335, 0.9997), (414, 0.9997),
        |  (130, 0.9996), (137, 0.9996)) t(doc_id, cosine)
        |ORDER BY cosine DESC, doc_id""".stripMargin,
    // q171: the oracle replays the corruption-PLANTING rule over the
    // same first-200 slice — certifying the parse quarantined exactly
    // the planted rows (untypeable toks at %13, garbage line at %41)
    "q171_csv_quarantine" ->
      """WITH h AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
        |c AS (SELECT doc_id,
        |    (doc_id % 41 = 0 OR doc_id % 13 = 0) AS corrupt
        |  FROM h)
        |SELECT
        |  count(*) FILTER (WHERE NOT corrupt) AS n_good,
        |  CAST(coalesce(sum(doc_id) FILTER (WHERE NOT corrupt), 0)
        |    AS BIGINT) AS sum_good_ids,
        |  CAST(coalesce(sum(doc_id % 97) FILTER (WHERE NOT corrupt), 0)
        |    AS BIGINT) AS sum_good_toks,
        |  count(*) FILTER (WHERE corrupt) AS n_quarantined
        |FROM c""".stripMargin,
    // q170: ML training is not SQL-replayable — pinned-VALUES truth
    // table frozen at sf0.01 (2026-08-15; 8- vs 32-thread sessions
    // byte-identical). The values ARE the certification: the
    // distilled model separates the weak-label classes (avg P(pass)
    // 0.229 vs 0.929) and agrees with the rule at 0.5 (0.008 / 1.0).
    "q170_quality_model" ->
      """SELECT CAST(gopher_pass AS BOOLEAN) AS gopher_pass,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(avg_p AS DOUBLE) AS avg_p,
        |  CAST(frac_ge_half AS DOUBLE) AS frac_ge_half
        |FROM (VALUES
        |  (false, 118, 0.229, 0.008),
        |  (true, 382, 0.929, 1.0))
        |  t(gopher_pass, n_docs, avg_p, frac_ge_half)
        |ORDER BY gopher_pass""".stripMargin,
    // q169: zlib output is not SQL-replayable — pinned-VALUES truth
    // table frozen at sf0.01 (2026-08-15, determinism spec-proved;
    // fixed JDK zlib level 6), the q86/q87 contract style. Regenerate
    // by re-running the query if the container JDK ever changes.
    "q169_compression_signal" ->
      """SELECT CAST(repeated AS BOOLEAN) AS repeated,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(avg_ratio AS DOUBLE) AS avg_ratio,
        |  CAST(min_ratio AS DOUBLE) AS min_ratio,
        |  CAST(max_ratio AS DOUBLE) AS max_ratio
        |FROM (VALUES
        |  (false, 264, 0.479, 0.3981, 0.6018),
        |  (true, 125, 0.1537, 0.1097, 0.259))
        |  t(repeated, n_docs, avg_ratio, min_ratio, max_ratio)
        |ORDER BY repeated""".stripMargin,
    // q168: the per-apex cap census — URL synth, host/apex parse, and
    // the row_number cap replayed verbatim (quality DESC, doc_id ASC)
    "q168_domain_cap" -> {
      val suffixes = graft.ops.Web.DefaultMultiPartSuffixes
        .map(s => s"'$s'").mkString(", ")
      qualityScoredCtes(Seq()) +
      s""",
         |u AS (
         |  SELECT doc_id, CASE WHEN doc_id % 17 = 0
         |    THEN '/rel/' || doc_id::VARCHAR
         |    ELSE 'https://sub' || (doc_id % 7)::VARCHAR
         |      || '.dom' || (doc_id % 13)::VARCHAR
         |      || CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
         |      || '/p/' || doc_id::VARCHAR END AS url
         |  FROM documents),
         |h AS (SELECT doc_id, nullif(regexp_extract(lower(trim(url)),
         |    '^(?:[a-z][a-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)', 1), '') AS host
         |  FROM u),
         |a AS (SELECT doc_id, coalesce(CASE
         |    WHEN host IS NULL THEN NULL
         |    WHEN len(ls) <= 2 THEN host
         |    WHEN (ls[-2] || '.' || ls[-1]) IN ($suffixes)
         |      THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
         |    ELSE ls[-2] || '.' || ls[-1] END, '(none)') AS apex
         |  FROM (SELECT doc_id, host, string_split(host, '.') AS ls FROM h)),
         |r AS (SELECT a.apex, s.quality,
         |    row_number() OVER (PARTITION BY a.apex
         |      ORDER BY s.quality DESC, s.doc_id ASC) AS rk
         |  FROM a JOIN scored s USING (doc_id))
         |SELECT apex, count(*) AS n_total,
         |  count(*) FILTER (WHERE rk <= 5) AS n_kept,
         |  min(quality) FILTER (WHERE rk <= 5) AS q_floor
         |FROM r GROUP BY apex ORDER BY apex""".stripMargin
    },
    // q167: the bucketed quantile panel replayed construction-for-
    // construction — (lang, bucket) counts, running sum, and the
    // division-free integer rank compare (cum*10000 >= bp*n)
    "q167_group_quantiles" -> (qualityScoredCtes(Seq("lang")) +
      """,
        |bk AS (SELECT lang, CAST(round(quality * 1000, 0) AS BIGINT) AS b,
        |  count(*) AS cnt FROM scored GROUP BY 1, 2),
        |cm AS (SELECT lang, b,
        |  sum(cnt) OVER (PARTITION BY lang ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM bk),
        |qs AS (SELECT unnest([2500, 5000, 7500, 9500]) AS bp)
        |SELECT cm.lang, qs.bp / 10000.0 AS q,
        |  round(min(cm.b) / 1000.0, 4) AS value
        |FROM cm, qs WHERE cm.cum * 10000 >= qs.bp * cm.n
        |GROUP BY cm.lang, qs.bp ORDER BY lang, q""".stripMargin),
    // q166: the q33 quality formula percentile-ranked per language.
    // Spark runs the decomposed prefix-sum form (no corpus window);
    // its tie-min contract over the lossless 1e-3 bucket domain IS
    // percent_rank ordered by the 3-decimal score, so the oracle stays
    // the plain window — two different algorithms, one answer.
    "q166_rank_calibrate" -> (qualityScoredCtes(Seq("lang")) +
      """
        |SELECT doc_id, lang, quality,
        |  round(percent_rank() OVER (PARTITION BY lang
        |    ORDER BY quality ASC), 6) AS pct_rank
        |FROM scored ORDER BY doc_id""".stripMargin),
    // q165: both ledger paths re-derived — per-half rank-64 prune +
    // union re-prune (merged) vs one-pass prune (whole), plus the
    // count/token sums and the estimate/dup-ratio arithmetic
    "q165_ledger" ->
      """WITH d AS (
        |  SELECT source, doc_id % 2 AS half,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nm,
        |    len(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w <> '')) AS toks
        |  FROM documents),
        |hd AS (SELECT DISTINCT source, half,
        |         ('0x' || substr(md5(nm), 1, 15))::BIGINT / power(16, 15) AS u
        |       FROM d),
        |hr AS (SELECT source, u,
        |         row_number() OVER (PARTITION BY source, half ORDER BY u) AS rk
        |       FROM hd),
        |pruned AS (SELECT DISTINCT source, u FROM hr WHERE rk <= 64),
        |m AS (SELECT source, u,
        |        row_number() OVER (PARTITION BY source ORDER BY u) AS rk
        |      FROM pruned),
        |ms AS (SELECT source, count(*) AS kc, max(u) AS uk,
        |         list(u ORDER BY u) AS st
        |       FROM m WHERE rk <= 64 GROUP BY source),
        |wd AS (SELECT DISTINCT source, u FROM hd),
        |wr AS (SELECT source, u,
        |         row_number() OVER (PARTITION BY source ORDER BY u) AS rk
        |       FROM wd),
        |ws AS (SELECT source, count(*) AS kc, max(u) AS uk,
        |         list(u ORDER BY u) AS st
        |       FROM wr WHERE rk <= 64 GROUP BY source),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(toks) AS BIGINT) AS n_tokens
        |        FROM d GROUP BY source)
        |SELECT a.source, a.n_docs, a.n_tokens,
        |  CASE WHEN ms.kc < 64 THEN ms.kc::DOUBLE
        |       ELSE round(63.0 / ms.uk, 4) END AS est_distinct_texts,
        |  round(a.n_docs / CASE WHEN ms.kc < 64 THEN ms.kc::DOUBLE
        |       ELSE round(63.0 / ms.uk, 4) END, 4) AS dup_ratio,
        |  ms.st = ws.st AS merge_exact
        |FROM agg a JOIN ms USING (source) JOIN ws USING (source)
        |ORDER BY a.source""".stripMargin,
    // q163: the doc-keyed md5 split rule + exact-share deviation fold
    "q163_split_balance" ->
      """WITH b AS (
        |  SELECT lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT CASE WHEN bucket < 8 THEN 'train'
        |              WHEN bucket < 9 THEN 'val'
        |              ELSE 'test' END AS split, lang
        |  FROM b),
        |sl AS (SELECT split, lang, count(*) AS nsl FROM s GROUP BY 1, 2),
        |sp AS (SELECT split, count(*) AS ns FROM s GROUP BY 1),
        |lg AS (SELECT lang, count(*) AS nl FROM s GROUP BY 1),
        |tt AS (SELECT count(*) AS n FROM s)
        |SELECT sl.split, CAST(max(sp.ns) AS BIGINT) AS n_docs,
        |  round(max(abs(sl.nsl::DOUBLE / sp.ns - lg.nl::DOUBLE / tt.n)), 6)
        |    AS max_lang_dev
        |FROM sl JOIN sp USING (split) JOIN lg USING (lang) CROSS JOIN tt
        |GROUP BY sl.split ORDER BY sl.split""".stripMargin,
    // q164: per-language positional-mean centroids + cosine-to-own-
    // centroid, bottom-10 (q40's unnest-zip pattern for positions)
    "q164_embedding_outliers" ->
      """WITH e AS (
        |  SELECT e.vec_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |x AS (
        |  SELECT lang, unnest(v)::DOUBLE AS xv,
        |    unnest(generate_series(1, len(v))) AS pos
        |  FROM e),
        |m AS (SELECT lang, pos, avg(xv) AS m FROM x GROUP BY 1, 2),
        |c AS (SELECT lang, list(m ORDER BY pos) AS cent FROM m GROUP BY lang),
        |sc AS (
        |  SELECT e.vec_id, e.lang,
        |    round(list_dot_product(e.v, c.cent) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(c.cent, c.cent))), 4) AS cos_centroid
        |  FROM e JOIN c USING (lang))
        |SELECT vec_id, lang, cos_centroid
        |FROM sc ORDER BY cos_centroid ASC, vec_id ASC LIMIT 10""".stripMargin,
    // q161: the per-line keep rule (terminal punctuation + word floor
    // + marker substrings) and the reassembly replayed verbatim
    "q161_c4_lines" ->
      """WITH st AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    text || '.',
        |    'Home | Products | About',
        |    CASE WHEN doc_id % 3 = 0 THEN 'Please enable JavaScript to view this page.' END,
        |    CASE WHEN doc_id % 4 = 0 THEN 'Wow!' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'A second real sentence with actual words?' END) AS text
        |  FROM documents),
        |l AS (SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS ls
        |  FROM st),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, x ->
        |    regexp_matches(trim(x), '[.!?"”]$')
        |    AND len(list_filter(string_split(regexp_replace(trim(x), '\s+', ' ', 'g'), ' '), w -> w <> '')) >= 3
        |    AND NOT (contains(lower(x), 'javascript')
        |      OR contains(lower(x), 'cookie policy')
        |      OR contains(lower(x), 'lorem ipsum'))) AS ks
        |  FROM l)
        |SELECT doc_id, CAST(len(ks) AS BIGINT) AS n_lines_kept,
        |  CAST(len(ls) - len(ks) AS BIGINT) AS n_lines_dropped,
        |  array_to_string(list_transform(ks, x -> trim(x)), chr(10)) AS clean_text
        |FROM k WHERE len(ks) >= 2 ORDER BY doc_id""".stripMargin,
    // q160: distinct-key survivor counts with the same translate fold
    // (mapping interpolated from Confusables.Mapping — one source)
    "q160_confusable_dedup" -> {
      val sk = graft.ops.Confusables.skeletonSql("nm")
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |planted AS (
         |  SELECT doc_id + 3000000 AS doc_id,
         |    translate(text, 'aeo', 'аео') AS text
         |  FROM base WHERE doc_id % 13 = 0),
         |staged AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
         |norm AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
         |  FROM staged)
         |SELECT CAST(count(*) AS BIGINT) AS n_input,
         |  CAST(count(DISTINCT nm) AS BIGINT) AS n_exact,
         |  CAST(count(DISTINCT $sk) AS BIGINT) AS n_confusable,
         |  CAST(count(DISTINCT nm) - count(DISTINCT $sk) AS BIGINT)
         |    AS n_homoglyph_only
         |FROM norm""".stripMargin
    },
    // q158: the full SRP replay + label-mismatch + rounded-cosine band
    "q158_hard_negatives" -> graft.ops.SimSearch.hardNegativesOracleSql(
      "embeddings", "vec_id", "embedding", "documents", "doc_id", "lang",
      queryPred = "vid < 8", corpusPred = "vid >= 8",
      m = 5, bits = 8, dim = 64, seed = 42L, minSim = 0.0, maxSim = 0.999),
    // q135: full interpolated-bigram-LM replay — model counts, add-one
    // unigram floor, and the 0.75/0.25 mix all re-derived in SQL
    "q135_bigram_lm" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |         list_filter(string_split(
        |           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |           w -> w <> '') AS ws
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM (
        |          SELECT unnest(ws) AS w FROM norm WHERE doc_id % 2 = 0)
        |        GROUP BY w),
        |tot AS (SELECT sum(c) AS n, count(*) AS v FROM uni),
        |bi AS (SELECT a, b, count(*) AS cab FROM (
        |         SELECT unnest(ws[1:len(ws)-1]) AS a,
        |                unnest(ws[2:len(ws)]) AS b
        |         FROM norm WHERE doc_id % 2 = 0 AND len(ws) >= 2)
        |       GROUP BY a, b HAVING count(*) >= 2),
        |dp AS (SELECT doc_id,
        |              unnest(ws[1:len(ws)-1]) AS a,
        |              unnest(ws[2:len(ws)]) AS b
        |       FROM norm WHERE doc_id % 2 = 1 AND len(ws) >= 2),
        |j AS (SELECT dp.doc_id,
        |        CASE WHEN bi.cab IS NOT NULL AND ua.c IS NOT NULL
        |             THEN bi.cab / ua.c ELSE 0.0 END AS pbi,
        |        (coalesce(ub.c, 0) + 1) / (tot.n + tot.v) AS puni
        |      FROM dp LEFT JOIN bi ON dp.a = bi.a AND dp.b = bi.b
        |      LEFT JOIN uni ua ON dp.a = ua.w
        |      LEFT JOIN uni ub ON dp.b = ub.w
        |      CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(avg(-ln(0.75 * pbi + 0.25 * puni)), 3) AS avg_neg_logp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q136/q137: full packing replay — the seeded 60-bit md5 order key,
    // shard assignment, and running-sum offsets re-derived in SQL;
    // all-integer arithmetic (DuckDB // is integral division)
    "q136_pack_plan" -> (packPlanSql +
      """
        |SELECT doc_id, shard, sort_key, n_tokens, start_off,
        |  start_off // 512 AS first_seq,
        |  (start_off + n_tokens - 1) // 512 AS last_seq
        |FROM c ORDER BY doc_id""".stripMargin),
    "q137_pack_summary" -> (packPlanSql +
      """
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  (CAST(sum(n_tokens) AS BIGINT) + 511) // 512 AS n_seqs,
        |  (CAST(sum(n_tokens) AS BIGINT) + 511) // 512 * 512
        |    - CAST(sum(n_tokens) AS BIGINT) AS pad_tokens,
        |  CAST(sum(CASE WHEN start_off // 512
        |                  <> (start_off + n_tokens - 1) // 512
        |                THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin),
    // q138: source-pair shingle overlap — the q22 trigram+short-doc
    // gram replay lifted to (source, gram) types, keyed by the 60-bit
    // md5 prefix exactly like the Spark side (string grams never
    // shuffle there; the hash IS the contract)
    "q138_source_overlap" ->
      """WITH norm AS (
        |  SELECT source, string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |raw AS (
        |  SELECT source,
        |    unnest(list_transform(generate_series(1, len(ws)-2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM norm WHERE len(ws) >= 3
        |  UNION ALL
        |  SELECT source, array_to_string(ws, ' ') AS g
        |  FROM norm WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''),
        |grams AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS g
        |  FROM raw),
        |sizes AS (SELECT source, count(*) AS types FROM grams GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS shared_types
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, shared_types,
        |  sa.types AS types_a, sb.types AS types_b,
        |  round(shared_types / least(sa.types, sb.types), 4) AS overlap
        |FROM pairs
        |JOIN sizes sa ON sa.source = source_a
        |JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    // q139: the add-one-KL drift replay; the zero-fill cross join
    // gives absent (window, type) cells their +1 smoothing mass
    "q139_type_drift" ->
      """WITH ref AS (
        |  SELECT event_type, count(*) AS c FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM ref),
        |wc AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |uni AS (
        |  SELECT h.window_start, r.event_type, r.c, coalesce(w.n, 0) AS n
        |  FROM (SELECT DISTINCT window_start FROM wc) h
        |  CROSS JOIN ref r
        |  LEFT JOIN wc w ON w.window_start = h.window_start
        |                AND w.event_type = r.event_type),
        |tw AS (SELECT window_start, CAST(sum(n) AS BIGINT) AS nw
        |       FROM uni GROUP BY 1),
        |terms AS (
        |  SELECT u.window_start,
        |    ((u.n + 1.0) / (tw.nw + tot.v))
        |      * ln(((u.n + 1.0) / (tw.nw + tot.v)) / (u.c / tot.n)) AS term
        |  FROM uni u
        |  JOIN tw ON tw.window_start = u.window_start
        |  CROSS JOIN tot)
        |SELECT t.window_start, tw.nw AS n_events,
        |  round(sum(t.term), 3) + 0.0 AS kl_drift
        |FROM terms t JOIN tw ON tw.window_start = t.window_start
        |GROUP BY 1, tw.nw
        |ORDER BY t.window_start""".stripMargin,
    // q140: the q22 pair replay wrapped with the 80/10/10 md5 split
    // (the q116 hashBucket arithmetic) on each side, keeping only
    // boundary-straddling pairs
    "q140_split_leakage" -> (s"""WITH pairs AS (
${minhashPairsSql.linesIterator.map("  " + _).mkString("\n")}
),
labeled AS (
  SELECT id_a, id_b, jaccard,
    CASE WHEN ('0x' || substr(md5(id_a::VARCHAR), 1, 8))::BIGINT % 10 < 8 THEN 'train'
         WHEN ('0x' || substr(md5(id_a::VARCHAR), 1, 8))::BIGINT % 10 < 9 THEN 'val'
         ELSE 'test' END AS split_a,
    CASE WHEN ('0x' || substr(md5(id_b::VARCHAR), 1, 8))::BIGINT % 10 < 8 THEN 'train'
         WHEN ('0x' || substr(md5(id_b::VARCHAR), 1, 8))::BIGINT % 10 < 9 THEN 'val'
         ELSE 'test' END AS split_b
  FROM pairs)
SELECT id_a, id_b, jaccard, split_a, split_b
FROM labeled
WHERE split_a <> split_b
ORDER BY id_a, id_b"""),
    // q176: the q90 oracle shape with PNG in the middle — the synth
    // RGB arithmetic is replayed directly; the Spark side must get
    // the identical triplets back OUT of the compressed payload (PNG
    // is lossless) for the histograms to hash-match. Resize maps
    // (x, y) -> (2x, 2y) for 8x4 -> 4x2, exactly as q90.
    "q176_png_decode" ->
      """WITH pix AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 31), i ->
        |      ((((299 * ((vec_id*37 + (i%8)*5 + (i//8)*11) % 256)
        |        + 587 * ((vec_id*23 + (i%8)*13 + (i//8)*7) % 256)
        |        + 114 * ((vec_id*41 + (i%8)*3 + (i//8)*17) % 256)) // 1000) * 16) // 256))
        |      AS bins,
        |    list_transform(generate_series(0, 7), j ->
        |      ((((299 * ((vec_id*37 + (j%4)*2*5 + (j//4)*2*11) % 256)
        |        + 587 * ((vec_id*23 + (j%4)*2*13 + (j//4)*2*7) % 256)
        |        + 114 * ((vec_id*41 + (j%4)*2*3 + (j//4)*2*17) % 256)) // 1000) * 16) // 256))
        |      AS rbins
        |  FROM embeddings)
        |SELECT vec_id AS blob_id, CAST(8 AS INT) AS width,
        |  CAST(4 AS INT) AS height,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(bins, v -> v = b))), ',') AS lum_bins,
        |  CAST(4 AS INT) AS r_width, CAST(2 AS INT) AS r_height,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(rbins, v -> v = b))), ',') AS r_lum_bins
        |FROM pix ORDER BY blob_id""".stripMargin,
    // q177: what survives a LOSSY codec exactly — decoded dims (11x7,
    // odd on purpose: MCU padding must not leak into the reported
    // size), the pixel count recovered from the normalized histogram,
    // and the JPEG->PNG resize dims (11 -> 4 wide, 7*4//11 = 2 tall).
    // All constants: the oracle proves the codec path engaged (the
    // stub's hash-synthesized dims could never be 11x7 corpus-wide).
    "q177_jpeg_dims" ->
      """SELECT vec_id AS blob_id, CAST(11 AS INT) AS width,
        |  CAST(7 AS INT) AS height, CAST(77 AS INT) AS n_pixels,
        |  CAST(4 AS INT) AS r_width, CAST(2 AS INT) AS r_height,
        |  CAST(8 AS INT) AS r_pixels
        |FROM embeddings ORDER BY blob_id""".stripMargin,
    // q178: raw-DIB AVI is lossless, so the mux -> chunk walk ->
    // frame slice -> unpad/row-flip -> luminance chain is replayed
    // per frame (f = 0 and f = 2 of 4, stride 2) with the same
    // integer arithmetic as q90/q176; n_frames/duration_ms come from
    // the avih header the engine parses at ingest (4 frames at
    // 100000 us = 400 ms). The MJPEG columns are what survives the
    // lossy in-container codec exactly: frame COUNT from the parse
    // and frame-1 decoded dims (a non-zero-offset frame, 11x7).
    "q178_video_frames" ->
      """WITH pix AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 19), i ->
        |      ((((299 * ((vec_id*13 + (i%5)*7 + (i//5)*3) % 256)
        |        + 587 * ((vec_id*11 + (i%5)*5 + (i//5)*17) % 256)
        |        + 114 * ((vec_id*19 + (i%5)*11 + (i//5)*13) % 256)) // 1000) * 16) // 256))
        |      AS b0,
        |    list_transform(generate_series(0, 19), i ->
        |      ((((299 * ((vec_id*13 + 38 + (i%5)*7 + (i//5)*3) % 256)
        |        + 587 * ((vec_id*11 + 46 + (i%5)*5 + (i//5)*17) % 256)
        |        + 114 * ((vec_id*19 + 58 + (i%5)*11 + (i//5)*13) % 256)) // 1000) * 16) // 256))
        |      AS b2
        |  FROM embeddings)
        |SELECT vec_id AS blob_id, CAST(4 AS INT) AS n_frames,
        |  CAST(400 AS BIGINT) AS duration_ms,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(b0, v -> v = b))), ',') AS f0_bins,
        |  array_to_string(list_transform(generate_series(0, 15),
        |    b -> len(list_filter(b2, v -> v = b))), ',') AS f2_bins,
        |  CAST(2 AS INT) AS mj_frames, CAST(11 AS INT) AS mj_width,
        |  CAST(7 AS INT) AS mj_height
        |FROM pix ORDER BY blob_id""".stripMargin,
    // q179: the WET staging is deterministic arithmetic on documents
    // (URL construct, md5 record IDs, octet Content-Length), so the
    // oracle replays what BOTH readers must recover from the actual
    // container bytes; md5(text) is the cross-engine payload digest
    // (UTF-8 both sides).
    "q179_wet_ingest" ->
      """WITH d AS (
        |  SELECT 'https://' || source || '.example/doc/' || doc_id AS url,
        |    text FROM documents)
        |SELECT url,
        |  '<urn:md5:' || md5(url) || '>' AS record_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        |  md5(text) AS payload_md5,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS b_content_length,
        |  md5(text) AS b_payload_md5
        |FROM d ORDER BY url""".stripMargin,
    // q180/q181: iterative likelihood merging is not SQL-expressible
    // -> pinned-VALUES oracles regenerated from a fresh Verify run
    // (8- vs 32-thread identity checked first), the q95/q96 pattern.
    "q180_wordpiece_vocab" -> PinnedOracles.q180Sql,
    "q181_wordpiece_tokens" -> PinnedOracles.q181Sql,
    // q182: the planting arithmetic (15 payload digits + the Luhn
    // check digit) replays in DuckDB list algebra; the expected
    // redaction outcome is then direct — the valid third redacts to
    // the token, the checksum-failing third keeps its card verbatim,
    // the card-free third keeps its text. doc_id%3 selects the arm.
    "q182_card_redact" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    list_transform(generate_series(0, 14),
        |      i -> (doc_id * (3*i + 7)) % 10) AS pay
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, pay,
        |    list_sum(list_transform(generate_series(1, 15), k ->
        |      CASE WHEN (k-1) % 2 = 0 THEN
        |        CASE WHEN pay[k]*2 > 9 THEN pay[k]*2 - 9 ELSE pay[k]*2 END
        |      ELSE pay[k] END)) AS s
        |  FROM d),
        |e AS (
        |  SELECT doc_id, text,
        |    array_to_string(pay, '') ||
        |      CASE WHEN doc_id % 3 = 1
        |        THEN ((10 - s % 10) % 10 + 5) % 10
        |        ELSE (10 - s % 10) % 10 END AS card
        |  FROM c)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_card,
        |  md5(CASE WHEN doc_id % 3 = 2 THEN text
        |    WHEN doc_id % 3 = 0 THEN text || ' card [REDACTED] end'
        |    ELSE text || ' card ' || card || ' end' END) AS red_digest
        |FROM e ORDER BY doc_id""".stripMargin,
    // q183: G.711 µ-law expansion is pure integer bit arithmetic —
    // u = ~b, t = (((u&15)<<3)+132) << ((u&112)>>4), sample =
    // sign ? 132-t : t-132 — replayed per synthesized byte, then the
    // q91 feature arithmetic over the EXPANDED samples. DuckDB lists
    // are 1-indexed (zero-crossing probe pairs i, i+1).
    "q183_ulaw_decode" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 47), i ->
        |      CASE WHEN (xor((vec_id*13 + i*7) % 256, 255) & 128) <> 0
        |        THEN 132 - ((((xor((vec_id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((vec_id*13 + i*7) % 256, 255) & 112) >> 4))
        |        ELSE ((((xor((vec_id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((vec_id*13 + i*7) % 256, 255) & 112) >> 4)) - 132
        |      END) AS smp
        |  FROM embeddings)
        |SELECT vec_id AS blob_id,
        |  CAST(8000 AS INT) AS sample_rate, CAST(48 AS INT) AS n_samples,
        |  CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak_abs,
        |  CAST(len(list_filter(generate_series(1, 47),
        |    i -> (smp[i] < 0) <> (smp[i+1] < 0))) AS INT) AS zero_crossings,
        |  CAST(list_sum(list_transform(smp, v -> v*v)) AS BIGINT) AS sum_sq
        |FROM s ORDER BY blob_id""".stripMargin,
    // q184: PQ ranks are approximate by design -> contract oracle
    // (the q27/q66/q174 pattern): model geometry and corpus count are
    // exact constants, the serving guarantees (self-match, rerank
    // recall, determinism, code diversity) are booleans the Spark
    // side must EARN — a degraded codebook turns the row red.
    "q184_pq_recall" ->
      """SELECT CAST(16 AS INT) AS m, CAST(32 AS INT) AS k,
        |  CAST(4 AS INT) AS dsub, CAST(16 AS INT) AS compression_x,
        |  (SELECT count(*) FROM embeddings) AS n_codes,
        |  TRUE AS diverse_codes, TRUE AS self_top1,
        |  TRUE AS recall_ok, TRUE AS deterministic""".stripMargin,
    // q185: the footer census must agree with the DATA — the oracle
    // recomputes per-bucket counts/min/max and the range-probe
    // disjointness from lineitem itself; the Spark side is only
    // allowed to read file metadata to produce the same numbers.
    "q185_footer_census" ->
      """WITH mx AS (SELECT max(l_orderkey) AS m FROM lineitem),
        |b AS (
        |  SELECT least(CAST(floor(l_orderkey * 4 / (m + 1)) AS INT), 3)
        |      AS bucket, l_orderkey
        |  FROM lineitem CROSS JOIN mx)
        |SELECT bucket, count(*) AS n_rows,
        |  min(l_orderkey) AS key_min, max(l_orderkey) AS key_max,
        |  (min(l_orderkey) > (SELECT m // 2 FROM mx)
        |    OR max(l_orderkey) < (SELECT m // 4 FROM mx)) AS skippable
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q186: IVF+PQ composed serving — the q184/q27 contract-boolean
    // pattern (probed ADC ranks are approximate by design; the
    // guarantees are booleans the Spark side must earn: production-
    // nprobe self-match, exact flat-parity at nprobe=nlist, pruned
    // rerank recall, repeat-search determinism). Geometry and corpus
    // count are exact constants.
    "q186_ivfpq_serve" ->
      """SELECT CAST(16 AS INT) AS nlist, CAST(16 AS INT) AS m,
        |  CAST(32 AS INT) AS k, CAST(4 AS INT) AS dsub,
        |  (SELECT count(*) FROM embeddings) AS n_codes,
        |  TRUE AS self_top1, TRUE AS parity_flat,
        |  TRUE AS recall_ok, TRUE AS deterministic""".stripMargin,
    // q187: raw WARC response ingest — the staging is deterministic
    // arithmetic (url construct, status from doc_id, the HTML wrap,
    // octet-exact HTTP-message length), so the oracle replays what
    // the typed reader must recover from the container bytes: record
    // Content-Length = octets of the WHOLE HTTP message, the split
    // status/content-type, the q154 htmlToText chain over the body,
    // and the per-url request-record skip count.
    "q187_warc_responses" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example/doc/' || doc_id AS url,
        |    '<html><head><title>d' || doc_id ||
        |      '</title><script>var x=1;</script></head><body><!-- nav --><p>'
        |      || text || '</p></body></html>' AS body,
        |    CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(body,
        |  '(?is)<(script|style|noscript)\b[^>]*>.*?</(script|style|noscript)>',
        |  ' ', 'g') AS h FROM d),
        |s2 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(h,
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS h
        |  FROM s3)
        |SELECT d.url,
        |  CAST(d.status AS INT) AS http_status,
        |  'text/html' AS http_content_type,
        |  CAST(octet_length(encode(
        |    'HTTP/1.1 ' || d.status || ' OK' || chr(13) || chr(10) ||
        |    'Content-Type: text/html' || chr(13) || chr(10) ||
        |    'Content-Length: ' || octet_length(encode(d.body)) ||
        |    chr(13) || chr(10) || chr(13) || chr(10) || d.body))
        |    AS BIGINT) AS content_length,
        |  md5(trim(regexp_replace(s4.h, '\s+', ' ', 'g'))) AS text_md5,
        |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_requests
        |FROM d JOIN s4 ON s4.doc_id = d.doc_id
        |ORDER BY d.url""".stripMargin,
    // q188: the ANN index lifecycle CLI — split counts are exact
    // arithmetic; the lifecycle guarantees (CLI search ≡ library on
    // the same persisted index, the --batch-id replay a ledger-checked
    // no-op, CLI batch serving ≡ library on a query frame, control
    // batch quiet, planted-shift batch alarming on both signals) are
    // contract booleans the CLI must earn (the q174/q186 pattern).
    "q188_index_cli" ->
      """SELECT
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 5 <> 0) AS n_fit,
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 5 = 0)
        |    AS n_appended,
        |  TRUE AS search_ok, TRUE AS replay_noop, TRUE AS search_batch_ok,
        |  FALSE AS control_psi_alert, FALSE AS control_dist_alert,
        |  TRUE AS drifted_psi_alert, TRUE AS drifted_dist_alert""".stripMargin,
    // q189: the typed footer census must agree with the DATA — the
    // oracle recomputes per-priority-class counts, string min/max,
    // timestamp min/max (both engines truncate the format to whole
    // seconds), and the string range probe's disjointness from orders
    // itself; the Spark side may only read file metadata.
    "q189_typed_footer_census" ->
      """WITH s AS (
        |  SELECT substr(o_orderpriority, 1, 1) AS bucket,
        |    o_orderpriority, o_orderdate
        |  FROM orders)
        |SELECT bucket, count(*) AS n_rows,
        |  min(o_orderpriority) AS pri_min,
        |  max(o_orderpriority) AS pri_max,
        |  (min(o_orderpriority) > '3' OR max(o_orderpriority) < '2')
        |    AS skippable,
        |  strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS ts_min,
        |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS ts_max
        |FROM s GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q190: IVF+PQ incremental append — split counts are exact
    // arithmetic; the append guarantees (appended codes identical to
    // a direct encode under the persisted codebooks, appended vector
    // servable as its own top-1 under pruning, determinism, and the
    // exactly-once replay no-op) are contract booleans (the
    // q174/q186/q188 pattern).
    "q190_ivfpq_append" ->
      """SELECT
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 5 <> 0)
        |    AS n_base,
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 5 = 0)
        |    AS n_appended,
        |  (SELECT count(*) FROM embeddings) AS n_codes,
        |  TRUE AS encode_parity, TRUE AS appended_self_top1,
        |  TRUE AS deterministic, TRUE AS replay_noop""".stripMargin,
    // q191: batch ADC serving — query count is exact arithmetic; the
    // serving guarantees (every query self-matches, batch ranking ≡
    // per-query ivfPqSearch on a sampled prefix, determinism) are
    // contract booleans (the q186/q190 pattern).
    "q191_ivfpq_batch" ->
      """SELECT
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 25 = 0)
        |    AS n_queries,
        |  (SELECT count(*) FROM embeddings WHERE vec_id % 25 = 0)
        |    AS n_served,
        |  TRUE AS all_self_top1, TRUE AS parity_sample,
        |  TRUE AS deterministic""".stripMargin,
    // q192: the dHash is replayed BIT FOR BIT from the closed-form
    // pixel synthesis — integer luminance cell sums on the 9x8 grid
    // (uniform 4x3 cells at 36x24), strict right-neighbor compare,
    // bit string rendered MSB-first (Spark's lpad(bin(..),64,'0')).
    // The 2x pixel-replicated copies at id+10000 carry the base
    // image's exact bits (area pooling is replication-invariant).
    "q192_image_phash" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |g AS (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM ids,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id)
        |SELECT id AS blob_id, CAST(36 AS INT) AS width,
        |  CAST(24 AS INT) AS height, bits FROM h
        |UNION ALL
        |SELECT id + 10000, CAST(72 AS INT), CAST(48 AS INT), bits FROM h
        |ORDER BY blob_id""".stripMargin,
    // q193: the bucketed banded plan must reproduce EXACTLY what an
    // all-pairs scan finds — the oracle brute-forces every pair over
    // the replayed bits with BITSTRING xor (recall is exact for
    // maxHamming <= 3 by pigeonhole over the four 16-bit chunks).
    "q193_image_neardup" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |g AS (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM ids,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id),
        |all_h AS (
        |  SELECT id AS blob_id, bits FROM h
        |  UNION ALL SELECT id + 10000, bits FROM h),
        |p AS (
        |  SELECT a.blob_id AS id_a, o.blob_id AS id_b,
        |    bit_count(xor(a.bits::BIT, o.bits::BIT)) AS ham
        |  FROM all_h a JOIN all_h o ON a.blob_id < o.blob_id)
        |SELECT id_a, id_b, CAST(ham AS INT) AS hamming
        |FROM p WHERE ham <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // q194: the audio envelope hash replayed BIT FOR BIT — q183's
    // µ-law integer expansion per synthesized byte, absolute-sample
    // sums over the 65 uniform 2-sample windows, strict
    // right-neighbor compares, bit string rendered MSB-first. The 2x
    // sample-replicated copies at id+10000 carry the base bits
    // (window pooling is replication-invariant).
    "q194_audio_phash" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |s AS (
        |  SELECT id,
        |    list_transform(generate_series(0, 129), i ->
        |      abs(CASE WHEN (xor((id*13 + i*7) % 256, 255) & 128) <> 0
        |        THEN 132 - ((((xor((id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((id*13 + i*7) % 256, 255) & 112) >> 4))
        |        ELSE ((((xor((id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((id*13 + i*7) % 256, 255) & 112) >> 4)) - 132
        |      END)) AS a
        |  FROM ids),
        |w AS (
        |  SELECT id,
        |    list_transform(generate_series(0, 64), k ->
        |      a[2*k + 1] + a[2*k + 2]) AS ws
        |  FROM s),
        |h AS (
        |  SELECT id,
        |    string_agg(CASE WHEN ws[k.k + 1] < ws[k.k + 2]
        |        THEN '1' ELSE '0' END, '' ORDER BY k.k DESC) AS bits
        |  FROM w, (SELECT unnest(generate_series(0, 63)) AS k) k
        |  GROUP BY id)
        |SELECT id AS blob_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(130 AS INT) AS n_samples, bits FROM h
        |UNION ALL
        |SELECT id + 10000, CAST(8000 AS INT), CAST(260 AS INT), bits FROM h
        |ORDER BY blob_id""".stripMargin,
    // q195: the bucketed banded plan must reproduce EXACTLY what an
    // all-pairs scan finds over the AUDIO envelope hashes — the q193
    // proof for the audio modality: q194's bit-for-bit µ-law replay,
    // then a BITSTRING-xor brute force of every pair (recall is exact
    // for maxHamming <= 3 by pigeonhole over the four 16-bit chunks).
    "q195_audio_neardup" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |s AS (
        |  SELECT id,
        |    list_transform(generate_series(0, 129), i ->
        |      abs(CASE WHEN (xor((id*13 + i*7) % 256, 255) & 128) <> 0
        |        THEN 132 - ((((xor((id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((id*13 + i*7) % 256, 255) & 112) >> 4))
        |        ELSE ((((xor((id*13 + i*7) % 256, 255) & 15) << 3) + 132)
        |          << ((xor((id*13 + i*7) % 256, 255) & 112) >> 4)) - 132
        |      END)) AS a
        |  FROM ids),
        |w AS (
        |  SELECT id,
        |    list_transform(generate_series(0, 64), k ->
        |      a[2*k + 1] + a[2*k + 2]) AS ws
        |  FROM s),
        |h AS (
        |  SELECT id,
        |    string_agg(CASE WHEN ws[k.k + 1] < ws[k.k + 2]
        |        THEN '1' ELSE '0' END, '' ORDER BY k.k DESC) AS bits
        |  FROM w, (SELECT unnest(generate_series(0, 63)) AS k) k
        |  GROUP BY id),
        |all_h AS (
        |  SELECT id AS blob_id, bits FROM h
        |  UNION ALL SELECT id + 10000, bits FROM h),
        |p AS (
        |  SELECT a.blob_id AS id_a, o.blob_id AS id_b,
        |    bit_count(xor(a.bits::BIT, o.bits::BIT)) AS ham
        |  FROM all_h a JOIN all_h o ON a.blob_id < o.blob_id)
        |SELECT id_a, id_b, CAST(ham AS INT) AS hamming
        |FROM p WHERE ham <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // q196: the q57 stage-report replay for a BLOB-BEARING corpus —
    // quality/repetition gates (q33/q38 formulas), PERCEPTUAL dedup
    // as hash-equality classes over the bit-for-bit replayed dHash
    // (blob key = doc_id % 100; maxHamming=0 makes grouping the
    // closure; winner = max quality then min id — the q70 policy),
    // exact keep-best dedup, passthrough near-dedup/decontamination,
    // split assignment; every stage pinned by count AND digest.
    "q196_curate_blobs" ->
      """WITH
        |-- stage 0 quality gate (q33 formula, rounded to 3) >= 0.3
        |tok3 AS MATERIALIZED (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents) r
        |  WHERE w <> ''),
        |stats3 AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n, avg(length(w)) AS mtl,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in',
        |      'is','are','was','it','that','this','for','on','with','as',
        |      'at','by','be') THEN 1 ELSE 0 END) AS stops
        |  FROM tok3 GROUP BY doc_id),
        |qscore AS MATERIALIZED (
        |  SELECT d.doc_id, d.text, d.source,
        |    round(least(coalesce(s.n, 0) / 20.0, 1.0) * 0.3
        |      + (1.0 - least((CASE WHEN length(d.text) > 0 THEN
        |          (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g')))::DOUBLE / length(d.text)
        |          ELSE 0.0 END) * 4, 1.0)) * 0.2
        |      + least(CASE WHEN coalesce(s.n, 0) > 0 THEN coalesce(s.stops, 0)::DOUBLE / s.n ELSE 0.0 END * 4, 1.0) * 0.3
        |      + CASE WHEN coalesce(s.mtl, 0) BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.5 END * 0.2, 3) AS q
        |  FROM documents d LEFT JOIN stats3 s USING (doc_id)),
        |s1 AS MATERIALIZED (SELECT * FROM qscore WHERE q >= 0.3),
        |-- stage 1 repetition gate (q38 formula) dup_2gram_frac <= 0.3
        |norm4 AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> '') AS ws
        |  FROM s1),
        |ga4 AS MATERIALIZED (
        |  SELECT doc_id, sum(c) AS tg, count(*) AS dg FROM (
        |    SELECT doc_id, g, count(*) AS c FROM (
        |      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
        |        i -> ws[i] || ' ' || ws[i+1])) AS g
        |      FROM norm4 WHERE len(ws) >= 2) t GROUP BY doc_id, g) gc
        |  GROUP BY doc_id),
        |s2 AS MATERIALIZED (
        |  SELECT s1.* FROM s1 JOIN (
        |    SELECT n.doc_id, round(coalesce((ga4.tg - ga4.dg) / ga4.tg, 0), 4) AS dup2
        |    FROM norm4 n LEFT JOIN ga4 ON n.doc_id = ga4.doc_id) r USING (doc_id)
        |  WHERE r.dup2 <= 0.3),
        |-- stage 2 perceptual dedup: dHash replayed bit for bit from the
        |-- doc_id % 100 pixel key (q192's grid), clusters = equal bits
        |keys AS MATERIALIZED (SELECT DISTINCT doc_id % 100 AS id FROM documents),
        |g AS MATERIALIZED (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM keys,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS MATERIALIZED (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS MATERIALIZED (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS MATERIALIZED (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id),
        |ranked AS MATERIALIZED (
        |  SELECT s2.doc_id,
        |    row_number() OVER (PARTITION BY h.bits
        |      ORDER BY s2.q DESC, s2.doc_id) AS rn
        |  FROM s2 JOIN h ON h.id = s2.doc_id % 100),
        |s3 AS MATERIALIZED (
        |  SELECT s2.* FROM s2 JOIN ranked USING (doc_id) WHERE ranked.rn = 1),
        |-- stage 3 exact dedup, keep-best: winner per normalized text =
        |-- max quality, ties to the smallest id (the q70 policy)
        |s4 AS MATERIALIZED (
        |  SELECT * FROM (
        |    SELECT s3.*, row_number() OVER (
        |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |      ORDER BY q DESC, doc_id) AS rn
        |    FROM s3) t WHERE rn = 1),
        |-- stages 4/5 near-dedup (threshold > 1) and decontamination
        |-- (empty benchmark) are passthroughs; stage 6 split assignment
        |s6 AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 8 THEN 'train'
        |         WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 < 9 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM s4),
        |report AS (
        |  SELECT 0 AS stage_idx, 'quality' AS stage, count(*)::BIGINT AS n_rows,
        |    coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR AS ids_digest FROM s1
        |  UNION ALL SELECT 1, 'repetition', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s2
        |  UNION ALL SELECT 2, 'perceptual_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s3
        |  UNION ALL SELECT 3, 'exact_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s4
        |  UNION ALL SELECT 4, 'near_dedup', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s4
        |  UNION ALL SELECT 5, 'decontaminate', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s4
        |  UNION ALL SELECT 6, 'split', count(*), coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1) || split), 1, 15))::BIGINT::HUGEINT), 0)::VARCHAR FROM s6)
        |SELECT stage_idx, stage, n_rows, ids_digest FROM report ORDER BY stage_idx""".stripMargin,
    // q197: residual IVF+PQ vs the shared-codebook default at equal
    // geometry — the seeded KMeans families are not SQL-replayable,
    // so the oracle asserts the opt-in encoding's CONTRACT: distinct
    // persisted kind, self-match under pruning, tighter quantization
    // (mean squared reconstruction error <= shared — the k-means
    // objective the residual codebooks spend the same bits on; strict
    // at every tested sf), half-probe recall >= shared - 1 (equal at
    // sf0.01/0.1; the -1 absorbs half-probe IVF noise on the
    // 100-vector sf0.001 corpus — provenance at the query),
    // determinism. Geometry and corpus count are exact arithmetic.
    "q197_ivfpq_residual" ->
      """SELECT 16 AS nlist, 16 AS m, 32 AS k,
        |  (SELECT count(*) FROM embeddings) AS n_codes,
        |  TRUE AS distinct_kind, TRUE AS self_top1,
        |  TRUE AS tighter_quantization, TRUE AS recall_ok,
        |  TRUE AS deterministic""".stripMargin,
    // q198: two-stage ADC+exact-rerank serving — the guarantees are
    // BY CONSTRUCTION (self reranks to cosine 1.0; full-probe +
    // corpus-window rerank IS brute force modulo the self row; any
    // true top-10 member reaching the window outranks non-members
    // under exact cosine, so rerank recall >= raw-ADC recall), so the
    // oracle pins them as booleans + exact geometry/corpus constants.
    "q198_ivfpq_rerank" ->
      """SELECT 16 AS nlist, 16 AS m, 32 AS k, 100 AS window,
        |  (SELECT count(*) FROM embeddings) AS n_vectors,
        |  TRUE AS self_top1, TRUE AS full_parity,
        |  TRUE AS recall_ge_adc, TRUE AS deterministic""".stripMargin,
    // q199: the INCREMENTAL banded plan must reproduce exactly the
    // batch-touching subset of an all-pairs scan — q193's BITSTRING
    // brute force over the replayed dHashes, filtered to pairs with a
    // member in the new batch (blob_id % 5 = 0; copies at +10000 keep
    // the residue). Missing a new×old pair or inventing an old×old
    // one both break the hash.
    "q199_perceptual_incremental" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |g AS (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM ids,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id),
        |all_h AS (
        |  SELECT id AS blob_id, bits FROM h
        |  UNION ALL SELECT id + 10000, bits FROM h),
        |p AS (
        |  SELECT a.blob_id AS id_a, o.blob_id AS id_b,
        |    bit_count(xor(a.bits::BIT, o.bits::BIT)) AS ham
        |  FROM all_h a JOIN all_h o ON a.blob_id < o.blob_id)
        |SELECT id_a, id_b, CAST(ham AS INT) AS hamming
        |FROM p WHERE ham <= 2
        |  AND (id_a % 5 = 0 OR id_b % 5 = 0)
        |ORDER BY id_a, id_b""".stripMargin,
    // q200: the map-only blob novelty gate replayed EXACTLY — a new
    // blob is novel iff none of its four 16-bit signature chunks
    // (MSB-first bit string: chunk j = substr(49-16j, 16)) equals any
    // admitted blob's same-position chunk. The Bloom's fpp (1e-6) is
    // below the replay's noise floor (the q57 discipline).
    "q200_perceptual_gate" ->
      """WITH ids AS (SELECT vec_id AS id FROM embeddings),
        |g AS (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM ids,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id),
        |all_h AS (
        |  SELECT id AS blob_id, bits FROM h
        |  UNION ALL SELECT id + 10000, bits FROM h),
        |newc AS (
        |  SELECT a.blob_id, j.j AS j, substr(a.bits, 49 - 16*j.j, 16) AS ck
        |  FROM all_h a, (SELECT unnest(generate_series(0,3)) AS j) j
        |  WHERE a.blob_id % 5 = 0),
        |oldc AS (
        |  SELECT DISTINCT j.j AS j, substr(a.bits, 49 - 16*j.j, 16) AS ck
        |  FROM all_h a, (SELECT unnest(generate_series(0,3)) AS j) j
        |  WHERE a.blob_id % 5 <> 0)
        |SELECT n.blob_id, (count(o.ck) = 0) AS novel
        |FROM newc n LEFT JOIN oldc o ON o.j = n.j AND o.ck = n.ck
        |GROUP BY n.blob_id
        |ORDER BY n.blob_id""".stripMargin,
    // q201: the streaming blob tail replayed from the closed form —
    // texts are unique and near-dedup a passthrough, so admitted =
    // min doc_id per dHash-bits class (first-arrival ≡ global min
    // under id-ordered batches); per-batch counts split the minima by
    // the maxId/3 cuts; the 4th batch (after corpus deletion) admits
    // only the novel-key blob, and only if its bits collide with no
    // existing class — replayed, not assumed. replay_noop and
    // b3_dup_dropped are the tail's contract booleans.
    "q201_curate_blob_tail" ->
      """WITH mx AS (SELECT max(doc_id) AS m,
        |            greatest(250, max(doc_id) // 20) AS md FROM documents),
        |keys AS (SELECT DISTINCT doc_id % (SELECT md FROM mx) AS id
        |         FROM documents
        |         UNION SELECT md + 700 FROM mx),
        |g AS (
        |  SELECT id, r.r, c.c, (c.c*4 + dx.dx) AS x, (r.r*3 + dy.dy) AS y
        |  FROM keys,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, r, c,
        |    SUM(((id*7 + x*5 + y*3) % 256) + ((id*11 + x*3) % 256)
        |        + ((y*13 + id) % 256)) AS s
        |  FROM g GROUP BY id, r, c),
        |b AS (
        |  SELECT a.id, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.r = a.r
        |    AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id),
        |cls AS (
        |  SELECT d.doc_id, h.bits,
        |    CASE WHEN d.doc_id <= (SELECT m // 3 FROM mx) THEN 0
        |         WHEN d.doc_id <= (SELECT 2 * m // 3 FROM mx) THEN 1
        |         ELSE 2 END AS bat
        |  FROM documents d
        |  JOIN h ON h.id = d.doc_id % (SELECT md FROM mx)),
        |win AS (SELECT bits, min(doc_id) AS w FROM cls GROUP BY bits),
        |adm AS (
        |  SELECT c.bat, count(*) AS n FROM cls c
        |  JOIN win ON c.doc_id = win.w GROUP BY c.bat)
        |SELECT
        |  coalesce((SELECT n FROM adm WHERE bat = 0), 0) AS b0_admitted,
        |  coalesce((SELECT n FROM adm WHERE bat = 1), 0) AS b1_admitted,
        |  coalesce((SELECT n FROM adm WHERE bat = 2), 0) AS b2_admitted,
        |  (SELECT count(*) FROM win) AS state_sigs,
        |  TRUE AS replay_noop,
        |  (CASE WHEN EXISTS (
        |      SELECT 1 FROM h h0 JOIN h hn ON h0.bits = hn.bits
        |      WHERE hn.id = (SELECT md + 700 FROM mx)
        |        AND h0.id <> hn.id)
        |    THEN 0 ELSE 1 END)::BIGINT AS b3_admitted,
        |  TRUE AS b3_dup_dropped""".stripMargin,
    // q202: OPQ-rotated IVF+PQ — the seeded KMeans/SVD trainer is not
    // SQL-replayable, so the oracle pins the opt-in rotation's
    // CONTRACT (the q197 discipline): distinct persisted kinds, the
    // training objective never increased by the monotone alternating
    // solver (both compositions), corpus reconstruction error <= the
    // equal-everything-but-the-rotation identity baseline, self-match
    // under pruning, determinism. Geometry and corpus count exact.
    "q202_ivfpq_opq" ->
      """SELECT 16 AS nlist, 16 AS m, 32 AS k,
        |  (SELECT count(*) FROM embeddings) AS n_codes,
        |  TRUE AS distinct_kinds, TRUE AS objective_decreased,
        |  TRUE AS objective_decreased_res, TRUE AS corpus_tighter,
        |  TRUE AS self_top1, TRUE AS deterministic""".stripMargin,
    // q203: video near-dup pairs replayed bit for bit — the per-key,
    // per-sampled-frame dHash from the closed-form pixel formula
    // (the 2x-upscaled odd videos carry the base bits: area pooling
    // is bit-exact under the grid-aligned rescale), then the FULL
    // key-pair brute force (BITSTRING xor, all three sampled
    // positions within Hamming 2) expanded to video pairs — the
    // banded plan must equal an all-pairs scan exactly.
    "q203_video_neardup" ->
      """WITH mx AS (SELECT greatest(25, max(doc_id) // 100) AS md
        |            FROM documents),
        |vids AS (
        |  SELECT doc_id AS vid,
        |    ((doc_id // 10) % (SELECT md FROM mx)) AS k
        |  FROM documents WHERE doc_id % 10 = 0),
        |keys AS (SELECT DISTINCT k AS id FROM vids),
        |g AS (
        |  SELECT id, f.f, r.r, c.c, (c.c*4 + dx.dx) AS x,
        |    (r.r*3 + dy.dy) AS y
        |  FROM keys,
        |    (SELECT unnest([0, 2, 4]) AS f) f,
        |    (SELECT unnest(generate_series(0,7)) AS r) r,
        |    (SELECT unnest(generate_series(0,8)) AS c) c,
        |    (SELECT unnest(generate_series(0,3)) AS dx) dx,
        |    (SELECT unnest(generate_series(0,2)) AS dy) dy),
        |cell AS (
        |  SELECT id, f, r, c,
        |    SUM(((id*5 + f*17 + x*3 + y*7) % 256)
        |      + ((id*11 + f*3 + x*5) % 256)
        |      + ((id*7 + f*13 + y*11) % 256)) AS s
        |  FROM g GROUP BY id, f, r, c),
        |b AS (
        |  SELECT a.id, a.f, a.r, a.c,
        |    CASE WHEN a.s < n.s THEN '1' ELSE '0' END AS bit
        |  FROM cell a JOIN cell n ON n.id = a.id AND n.f = a.f
        |    AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT id, f, string_agg(bit, '' ORDER BY r*8 + c DESC) AS bits
        |  FROM b GROUP BY id, f),
        |km AS (
        |  SELECT h1.id AS ka, h2.id AS kb
        |  FROM h h1 JOIN h h2 ON h1.f = h2.f AND h1.id <= h2.id
        |  GROUP BY h1.id, h2.id
        |  HAVING count(*) = 3
        |    AND max(bit_count(xor(h1.bits::BIT, h2.bits::BIT))) <= 2)
        |SELECT v1.vid AS id_a, v2.vid AS id_b,
        |  3::BIGINT AS matched_frames, 3::BIGINT AS n_frames
        |FROM vids v1
        |JOIN vids v2 ON v1.vid < v2.vid
        |JOIN km ON km.ka = least(v1.k, v2.k)
        |  AND km.kb = greatest(v1.k, v2.k)
        |ORDER BY id_a, id_b""".stripMargin,
    // q204: the streaming semantic tail replayed from the closed
    // form — identical-vector classes (vec_id % md), unique texts,
    // near-dedup passthrough, so admitted = min vec_id per class
    // (first-arrival ≡ global min under id-ordered batches); the
    // 4th post-deletion batch admits only the negated vector. The
    // class-minima model is sound only while no CROSS-class base
    // pair reaches the 0.95 threshold — fixture_margin_ok replays
    // that bound instead of assuming it (measured ~0.33 at every sf).
    "q204_curate_semantic_tail" ->
      """WITH mx AS (SELECT max(vec_id) AS m,
        |            greatest(20, (max(vec_id) + 1) // 50) AS md
        |            FROM embeddings),
        |cls AS (
        |  SELECT vec_id, vec_id % (SELECT md FROM mx) AS k,
        |    CASE WHEN vec_id <= (SELECT m // 3 FROM mx) THEN 0
        |         WHEN vec_id <= (SELECT 2 * m // 3 FROM mx) THEN 1
        |         ELSE 2 END AS bat
        |  FROM embeddings),
        |win AS (SELECT k, min(vec_id) AS w FROM cls GROUP BY k),
        |adm AS (
        |  SELECT c.bat, count(*) AS n FROM cls c
        |  JOIN win ON c.vec_id = win.w GROUP BY c.bat),
        |b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < (SELECT md FROM mx))
        |SELECT
        |  coalesce((SELECT n FROM adm WHERE bat = 0), 0) AS b0_admitted,
        |  coalesce((SELECT n FROM adm WHERE bat = 1), 0) AS b1_admitted,
        |  coalesce((SELECT n FROM adm WHERE bat = 2), 0) AS b2_admitted,
        |  (SELECT count(*) FROM win) AS state_vecs,
        |  TRUE AS replay_noop,
        |  1::BIGINT AS b3_admitted,
        |  TRUE AS b3_dup_dropped,
        |  (SELECT max(list_dot_product(a.v, c.v) /
        |     (sqrt(list_dot_product(a.v, a.v)) *
        |      sqrt(list_dot_product(c.v, c.v))))
        |   FROM b a JOIN b c ON a.vec_id < c.vec_id) < 0.95
        |    AS fixture_margin_ok""".stripMargin,
  )
}
