package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.{SecurityFixtures => F}
import graft.operators.{RelationalOps, SecurityOps}
import graft.pipeline.{Curation, Dedup, Multimodal, PipelineOracles => PO, Retrieval, Similarity, TextStats, Winnow}
import graft.sources.Corpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Q1–Q11 model the reference's probe/diff/validation surface over the
  * security fixtures (FIXTURES.md §A; seeds live in SecurityFixtures so
  * Spark queries and DuckDB oracle CTEs share one source of truth).
  * Q12–Q14 are the relational closure over the driver corpus.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.topNationsByBalance(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference probe/diff surface (SURVEY §2.9 Q1–Q11) ---
    "q1_user_exists" -> ((s, _) => SecurityOps.userExists(F.sysUsersDf(s), "app_user")),
    "q2_granted_roles" -> ((s, _) => SecurityOps.grantedRoles(F.sysRoleGrantsDf(s), "app_user")),
    "q3_user_profiles" -> ((s, _) => SecurityOps.userProfiles(F.sysSettingsProfileElementsDf(s), "app_user")),
    "q4_quota_by_member" -> ((s, _) => SecurityOps.quotasForUser(F.sysQuotasDf(s), "app_user")),
    // ClickHouse-dialect spelling of q4 through the SQL surface: proves the
    // has() alias (clickhouse_users.py:179) resolves to native ArrayContains.
    "q4b_quota_by_member_has" -> ((s, dir) => QueryRunner.sql(s, dir,
      "SELECT name FROM sys_quotas WHERE has(apply_to_list, 'app_user') ORDER BY name")),
    "q5_quota_members" -> ((s, _) => SecurityOps.quotaMembers(F.sysQuotasDf(s), "custom_quota")),
    "q6_roles_to_grant" -> ((s, _) => SecurityOps.rolesToGrant(F.desiredRolesDf(s), F.sysRoleGrantsDf(s), "app_user")),
    "q7_invalid_grants" -> ((s, _) => SecurityOps.invalidGrants(F.requestedGrantsDf(s), F.grantAllowlist.map(_._1))),
    "q8_roles_to_revoke" -> ((s, _) => SecurityOps.rolesToRevoke(F.requestedRevokesDf(s), F.sysRoleGrantsDf(s), "reader_role_user")),
    "q9_db_table_expansion" -> ((s, _) => SecurityOps.dbTableExpansion(F.specDatabasesDf(s), F.specTablesDf(s))),
    "q10_quota_append" -> ((s, _) => SecurityOps.quotaAppendMember(F.sysQuotasDf(s), "custom_quota", "new_user")),
    "q11_hash_and_errors" -> ((s, _) => SecurityOps.hashAndErrors(F.userSpecsDf(s))),
    // --- reconcile/apply surface (SURVEY §2.7 D1–D11, §3 EP1–EP3):
    // replay the playbook_example.yaml scenario end-to-end on an empty
    // in-memory catalog and emit the ordered statement transcript. The
    // oracle pins the golden strings (README.md:116-124 templates).
    "q15_playbook_transcript" -> ((s, _) => PlaybookReplay.transcript(s)),
    // --- relational closure (SURVEY §2.9 Q12–Q14) ---
    "q12_lineitem_agg" -> ((s, dir) => RelationalOps.lineitemAgg(s, dir)),
    "q13_top_nations" -> ((s, dir) => RelationalOps.topNationsByBalance(s, dir)),
    "q14_events_agg" -> ((s, dir) => RelationalOps.eventsAgg(s, dir)),
    // --- LLM-data-pipeline surface (SURVEY §7 Milestone 6) ---
    "q16_exact_dedup" -> ((s, dir) => Dedup.exactDedupSummary(Corpus.table(s, dir, "documents"))),
    "q17_dedup_keep_first" -> ((s, dir) => Dedup.dedupKeepFirst(Corpus.table(s, dir, "documents"))),
    "q18_minhash_signatures" -> ((s, dir) => Dedup.minhashSignatures(Corpus.table(s, dir, "documents"))),
    "q19_lsh_near_dups" -> ((s, dir) => Dedup.lshNearDupPairs(Corpus.table(s, dir, "documents"), 0.8)),
    "q20_simhash" -> ((s, dir) => Dedup.simhashAll(Corpus.table(s, dir, "documents"))),
    "q21_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(Corpus.table(s, dir, "documents"), 3, 100L, 0.5)),
    "q22_cosine_topk" -> ((s, dir) => Similarity.cosineTopK(Corpus.table(s, dir, "embeddings"), 0L, 10)),
    "q23_cosine_bucket_topk" -> ((s, dir) => Similarity.bucketTopK(Corpus.table(s, dir, "embeddings"), 0L, 10, 4)),
    "q24_lang_id" -> ((s, dir) => TextStats.langIdSummary(Corpus.table(s, dir, "documents"))),
    "q25_quality_scores" -> ((s, dir) => TextStats.qualityScores(Corpus.table(s, dir, "documents"), 50L)),
    "q26_token_counts" -> ((s, dir) => TextStats.tokenCountsBySource(Corpus.table(s, dir, "documents"))),
    "q27_fingerprints" -> ((s, dir) => TextStats.fingerprints(Corpus.table(s, dir, "documents"), 50L)),
    "q28_multimodal_meta" -> ((s, dir) => Multimodal.payloadMetaBySource(Corpus.table(s, dir, "documents"))),
    // The pair tier sizes its bucket width FROM THE CORPUS (integer-
    // exact ceil-log2, mirrored verbatim by the oracle's params CTE),
    // so expected population tracks the 125-vector target at any
    // scale. The sf1 oracle pass is why: a width pinned at 4 bits put
    // every 10×-corpus bucket over the 1000-member cap, the star
    // fallback fired everywhere, and recall collapsed to 0.1% while
    // the uncapped oracle kept all 15784 pairs.
    "q29_cosine_near_dups" -> ((s, dir) => Similarity.cosineNearDupPairsAuto(
      Corpus.table(s, dir, "embeddings"), 0.4)),
    "q33_simhash_near_dups" -> ((s, dir) => Dedup.simhashNearDupPairs(Corpus.table(s, dir, "documents"), 3)),
    // --- dedup clustering: near-dup graph → components → keep-one ---
    "q36_dedup_clusters" -> ((s, dir) => Dedup.nearDupClusters(Corpus.table(s, dir, "documents"), 0.8)),
    "q37_cluster_dedup_kept" -> ((s, dir) => Dedup.dedupByClusters(Corpus.table(s, dir, "documents"), 0.8)),
    // corpus-sized width (oracle recomputes it in SQL): the r10 sf1
    // outlier — pinned nb=4 ran 15.8x at 10x rows; adaptive holds ~2x
    "q35_knn_join" -> ((s, dir) => Similarity.bucketKnnJoinAuto(Corpus.table(s, dir, "embeddings"), 3)),
    // k-means IVF is not SQL-expressible — no oracleSql entry, so the
    // driver records the (documented) weaker rows-only check. NOTE:
    // building this entry trains the index (Spark jobs run at fn-call
    // time, not first action) — index build is part of the operator.
    "q38_ivf_topk" -> ((s, dir) => Similarity.ivfTopK(Corpus.table(s, dir, "embeddings"), 0L, 10, 8, 2)),
    // q38b: the IVF tier's HARD correctness gate — probing ALL cells is
    // exactly brute force regardless of what the k-means training
    // learned, so nProbe == nClusters must hash-match the q22 exact
    // oracle. q38 keeps the recall dial (nProbe=2) as rows-only.
    "q38b_ivf_exact" -> ((s, dir) => Similarity.ivfTopK(Corpus.table(s, dir, "embeddings"), 0L, 10, 8, 8)),
    // HLL sketch values are engine-specific — rows-only check; the
    // error bound vs exact is pinned in PipelineSpec AND hash-gated via
    // the q39b guard below.
    "q39_dedup_approx" -> ((s, dir) => Dedup.dedupSummaryApprox(Corpus.table(s, dir, "documents"))),
    // q39b: oracle-checkable HLL guard — exact per-source counts plus a
    // boolean pinning the sketch estimate within its error bound; the
    // oracle expects TRUE, so a drifting sketch hash-mismatches.
    "q39b_dedup_approx_guard" -> ((s, dir) => Dedup.dedupApproxGuard(Corpus.table(s, dir, "documents"))),
    "q34_events_monthly" -> ((s, dir) => RelationalOps.eventsMonthly(s, dir)),
    "q40_asof_join" -> ((s, dir) => RelationalOps.purchaseAsofClick(s, dir)),
    // --- wider relational closure: window / rollup / big-join paths ---
    "q30_window_topn" -> ((s, dir) => RelationalOps.topCustomersPerNation(s, dir, 3)),
    "q31_rollup" -> ((s, dir) => RelationalOps.lineitemRollup(s, dir)),
    "q32_join_revenue" -> ((s, dir) => RelationalOps.revenueByPriority(s, dir)),
    // q41: batch gap sessionization (lag + running-sum windows, one
    // shuffle) — also the batch oracle of StreamingPipeline.sessionize
    "q41_sessionize" -> ((s, dir) => RelationalOps.sessionizeEvents(s, dir, 30)),
    // q42/q43: corpus profiling — exact length quantiles per language,
    // vocabulary head with document frequency
    "q42_doc_quantiles" -> ((s, dir) => TextStats.docLengthQuantiles(Corpus.table(s, dir, "documents"))),
    "q43_top_terms" -> ((s, dir) => TextStats.topTerms(Corpus.table(s, dir, "documents"), 20)),
    // q44/q45: curation — benchmark decontamination (eval split =
    // doc_id % 10) and deterministic hash-stratified sampling
    "q44_decontamination" -> ((s, dir) => Curation.decontaminationSummary(Corpus.table(s, dir, "documents"), 10L)),
    "q45_stratified_sample" -> ((s, dir) => Curation.stratifiedSampleSummary(
      Corpus.table(s, dir, "documents"), Map("src3" -> 50, "src7" -> 0), 10)),
    // q46: sequence packing — fixed-token-budget training sequences per
    // source stratum (chunk-boundary running-sum formulation)
    "q46_pack_sequences" -> ((s, dir) => Curation.packSequences(
      Corpus.table(s, dir, "documents"), 512L)),
    // q47: semi-structured JSON field extraction + typed aggregation
    "q47_json_props" -> ((s, dir) => RelationalOps.eventsJsonProps(s, dir)),
    // q48: Gopher-style repetition quality signals per source
    "q48_repetition" -> ((s, dir) => TextStats.repetitionSignals(
      Corpus.table(s, dir, "documents"))),
    // q49: source-pair shingle-overlap (containment audit before blending)
    "q49_source_overlap" -> ((s, dir) => Curation.sourceShingleOverlap(
      Corpus.table(s, dir, "documents"))),
    // q50: daily totals + 7-day moving average per event type
    "q50_moving_avg" -> ((s, dir) => RelationalOps.eventsMovingAvg(s, dir)),
    // q51: argMax — top event per user via one struct-max aggregate
    "q51_arg_max" -> ((s, dir) => RelationalOps.topEventPerUser(s, dir)),
    // q52: windowFunnel — view→click→purchase depth within 7 days
    "q52_funnel" -> ((s, dir) => RelationalOps.windowFunnel(s, dir, 7)),
    // q53: embedding norm profile per label (order-independent aggs)
    "q53_norm_profile" -> ((s, dir) => Similarity.normProfile(
      Corpus.table(s, dir, "embeddings"))),
    // q54: day-grained retention cohorts (first-active-day × offset)
    "q54_retention" -> ((s, dir) => RelationalOps.retentionCohorts(s, dir)),
    // q55: per-source TF-IDF head — source-characteristic vocabulary
    "q55_tfidf_terms" -> ((s, dir) => TextStats.tfidfTopTerms(
      Corpus.table(s, dir, "documents"), 5)),
    // q56: lang × source crosstab via relational PIVOT (explicit values)
    "q56_lang_source_pivot" -> ((s, dir) => TextStats.langSourceCrosstab(
      Corpus.table(s, dir, "documents"), CrosstabSources)),
    // q57: unigram-model quality profile (exact-arithmetic LM filter)
    "q57_unigram_quality" -> ((s, dir) => TextStats.unigramQuality(
      Corpus.table(s, dir, "documents"))),
    // q58: embedding cluster dedup — cosine pairs → CC → keep-one
    // (corpus-sized width, same rule and same pair index as q29)
    "q58_embedding_dedup" -> ((s, dir) => Similarity.dedupEmbeddingsByClustersAuto(
      Corpus.table(s, dir, "embeddings"), 0.4)),
    // q59: context-budget chunking — 32-token windows, 8-token overlap
    "q59_chunk_documents" -> ((s, dir) => Curation.chunkDocuments(
      Corpus.table(s, dir, "documents"), 32, 8)),
    // q60: temperature-scaled (α=0.5) source mixture / epochs table
    "q60_mixture_weights" -> ((s, dir) => Curation.mixtureWeights(
      Corpus.table(s, dir, "documents"))),
    // q61: normalized exact dedup — per-source raw-vs-normalized
    // distinct-hash summary (group detail: Dedup.normalizedDupGroups)
    "q61_normalized_dedup" -> ((s, dir) => Dedup.normalizedDedupSummary(
      Corpus.table(s, dir, "documents"))),
    // q62: fixed-size deterministic sample — hash-rank k per source
    "q62_fixed_k_sample" -> ((s, dir) => Curation.fixedKSample(
      Corpus.table(s, dir, "documents"), 5)),
    // q63: int8 scalar-quantization error audit per label
    "q63_quantization_error" -> ((s, dir) => Similarity.quantizationErrorProfile(
      Corpus.table(s, dir, "embeddings"))),
    // q64: cross-document shingle-share profile (boilerplate diagnostic)
    "q64_crossdoc_share" -> ((s, dir) => Dedup.crossDocShingleShare(
      Corpus.table(s, dir, "documents"))),
    // q65: deterministic hash-based train/val/test split summary
    "q65_train_split" -> ((s, dir) => Curation.trainSplitSummary(
      Corpus.table(s, dir, "documents"))),
    // q66: hash-shard balance audit (16 writer shards)
    "q66_hash_shards" -> ((s, dir) => Curation.hashShardBalance(
      Corpus.table(s, dir, "documents"), 16)),
    // q67: minhash-estimate vs true-jaccard calibration audit (shares
    // the q36/q37 session pair index)
    "q67_minhash_audit" -> ((s, dir) => Dedup.minhashEstimateAudit(
      Corpus.table(s, dir, "documents"), 0.8)),
    // q68: incremental delta-vs-base dedup (ingest admission gate)
    "q68_incremental_dedup" -> ((s, dir) => Dedup.incrementalDedupSummary(
      Corpus.table(s, dir, "documents"), 10L, 0.8)),
    // q69: collocation head — top bigrams by lift (exp-PMI), support ≥ 10
    "q69_collocations" -> ((s, dir) => TextStats.collocationHead(
      Corpus.table(s, dir, "documents"), 10L, 25)),
    // q70: sign-bucket ANN recall@10 vs exact, sampled query set
    "q70_bucket_recall" -> ((s, dir) => Similarity.bucketRecallAudit(
      Corpus.table(s, dir, "embeddings"), 10, 4, 100L)),
    // q71: kNN majority-label consistency (embedding-quality eval);
    // corpus-sized width like q35
    "q71_knn_label_audit" -> ((s, dir) => Similarity.knnLabelAuditAuto(
      Corpus.table(s, dir, "embeddings"), 5)),
    // q72: burst-day anomaly flags (integer-exact 1.25× trailing-7d rule)
    "q72_burst_days" -> ((s, dir) => RelationalOps.burstDays(s, dir)),
    // q73: near-dup cluster-size histogram (the dedup approval report)
    "q73_cluster_sizes" -> ((s, dir) => Dedup.clusterSizeHistogram(
      Corpus.table(s, dir, "documents"), 0.8)),
    // q74: per-eval-doc contamination detail (the q44 summary's eval side)
    "q74_contaminated_evals" -> ((s, dir) => Curation.contaminatedEvalDocs(
      Corpus.table(s, dir, "documents"), 10L)),
    // q75: sequence-length histogram (context-budget planning input)
    "q75_seqlen_histogram" -> ((s, dir) => TextStats.seqLenHistogram(
      Corpus.table(s, dir, "documents"))),
    // q76: REAL image codec round-trip — synthetic PNGs encoded and
    // decoded with javax.imageio; the oracle recomputes the decoded
    // dimensions and pixel sums in closed form from doc_id
    "q76_image_decode" -> ((s, dir) => Multimodal.decodedImageMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q77: JSONL ingest-health contract end-to-end — write a fixture
    // with planted corrupt lines, read through the explicit-schema
    // PERMISSIVE path, count clean vs corrupt; the oracle recomputes
    // the planted split straight from the documents table
    "q77_jsonl_health" -> ((s, dir) => graft.sources.JsonLines.healthReport(
      Corpus.table(s, dir, "documents"),
      fixtureDir("q77", dir), 200L, 7L)),
    // q78: the PERSISTED IVF serving path under the all-probes hard
    // gate — write the cell-partitioned store, probe through it with
    // every cell; must hash-match the q22 exact oracle (q38b's twin,
    // through the store instead of the in-memory frame)
    "q78_ivf_store_probe" -> ((s, dir) => Similarity.ivfStoreExactTopK(
      Corpus.table(s, dir, "embeddings"),
      fixtureDir("q78", dir), 0L, 10, 8)),
    // q79: the q32 revenue join routed through the skew-salting
    // operator — same oracle as q32, pinning salted == plain
    "q79_salted_join" -> ((s, dir) =>
      RelationalOps.saltedRevenueByPriority(s, dir)),
    // q80 (RETIRED as a gate, r14 VERDICT task 4): the MemoryStream
    // replay twin of the streaming sessionizer was the last
    // corpus-to-driver data feed on the gate surface. The parity
    // contract it gated lives on through the PRODUCTION ingress
    // (q116: FileStreamSource, same q41 oracle; q127: many-wave), and
    // the MemoryStream spelling itself stays exercised as a
    // spec-only harness (StreamingPipelineSpec asserts
    // sessionizeReplay == batch sessionization).
    // q81: pattern-scan audit (the PII-scrub sizing report) — one scan
    // for all patterns; gate patterns match the corpus (the PII presets
    // are unit-tested on planted strings — the synthetic corpus
    // deliberately contains none)
    "q81_pattern_scan" -> ((s, dir) => graft.pipeline.TextScrub
      .patternScanSummary(Corpus.table(s, dir, "documents"), ScanPatterns)),
    // q82: keep-BEST cluster dedup — longest-doc representative (the
    // production keep policy), same pair index + shared CC as q37
    "q82_cluster_keep_best" -> ((s, dir) => Dedup.dedupByClustersKeepBest(
      Corpus.table(s, dir, "documents"), 0.8)),
    // q83: quality filter funnel — cumulative survivor counts per
    // source under integer-exact length + repetition rules
    "q83_filter_funnel" -> ((s, dir) => TextStats.filterFunnel(
      Corpus.table(s, dir, "documents"), 30, 40)),
    // q84: the q40 attribution join under a 1-hour match-age bound —
    // a stale click no longer claims the purchase
    "q84_asof_tolerance" -> ((s, dir) =>
      RelationalOps.purchaseAsofClickTolerance(s, dir, 3600L)),
    // q85: approx-quantile guard — percentile_approx (the 100 TB
    // quantile path) pinned inside its rank-error contract against
    // exact ranks; oracle expects TRUE (the q39b pattern)
    "q85_quantile_guard" -> ((s, dir) => TextStats.quantileGuard(
      Corpus.table(s, dir, "documents"))),
    // q86: document novelty — fraction of shingles first seen in each
    // doc (ingest order), the contribution signal beyond binary dedup
    "q86_novelty" -> ((s, dir) => Dedup.noveltyProfile(
      Corpus.table(s, dir, "documents"))),
    // q87: four-table star join — revenue by (nation, order year);
    // dims broadcast, one fact-spine shuffle join (plan-pinned)
    "q87_nation_year_revenue" -> ((s, dir) =>
      RelationalOps.nationYearRevenue(s, dir)),
    // q88: streaming windowed agg fed over the batch events table
    // through the PRODUCTION readStream file path (r14 — no driver
    // collect in the feed) — the watermark+window pipeline's own
    // parity gate next to q80
    "q88_streaming_windowed_agg" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.windowedAggFileStream(
        Corpus.table(s, dir, "events"), fixtureDir("q88", dir))),
    // q89: the CONTROL-plane streaming parity gate — playbook user
    // specs streamed through ContinuousReconcile emit the same golden
    // statements as the q15 batch replay's user steps
    "q89_streaming_reconcile" -> ((s, dir) =>
      graft.streaming.ContinuousReconcile.replayTranscript(
        s, fixtureDir("q89", dir))),
    // q90: the streaming ingest-admission front door (admitStream:
    // stream-static anti join vs the base's hash projection, then
    // bounded-state within-stream dedup) replayed over the documents
    // table — output is the admitted content-hash SET, whose oracle is
    // the batch admission semantics (q68's construction) verbatim
    "q90_streaming_admission" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.admitStreamFileFeed(
        Corpus.table(s, dir, "documents"), 10L, fixtureDir("q90", dir))),
    // q91: REAL pixel resize behind the codec seam — synthesize PNGs,
    // decode → nearest-neighbor resample to 9×6 (pinned integer
    // sampling rule) → PNG re-encode → decode the RESIZED bytes; the
    // oracle recomputes the resampled pixel sums in closed form
    "q91_image_resize" -> ((s, dir) => Multimodal.resizedImageMetaReport(
      Corpus.table(s, dir, "documents"), 20L, 9, 6)),
    // q92: the control-plane streaming gate's GRANTS path (q89's twin
    // for EP3) — playbook grant specs streamed through the grants-path
    // writer must emit the q15 batch replay's golden grant statements
    "q92_streaming_grants" -> ((s, dir) =>
      graft.streaming.ContinuousReconcile.replayGrantsTranscript(
        s, fixtureDir("q92", dir))),
    // q93: the PII presets (TextScrub.PiiPresets) exercised end-to-end
    // on planted emails/ips/phones derived in closed form from doc_id;
    // the oracle recomputes hit counts arithmetically (independent
    // derivation) and the post-scrub residual column must be all-zero
    "q93_pii_presets" -> ((s, dir) => graft.pipeline.TextScrub
      .piiPresetReport(Corpus.table(s, dir, "documents"))),
    // q94: the MULTI-PROBE sign-bucket serving path (finer buckets for
    // linear pair work + hamming-ball probes to buy recall back — the
    // sf1 checkpoint's scaling recipe) under the full-ball hard gate:
    // radius == nBits probes every bucket == brute force, so it must
    // hash-match the q22 exact oracle through the persisted store
    "q94_multiprobe_exact" -> ((s, dir) =>
      Similarity.multiProbeStoreExactTopK(
        Corpus.table(s, dir, "embeddings"),
        fixtureDir("q94", dir), 0L, 10, 4)),
    // q95: REAL frame sampling behind the codec seam — synthesize
    // multi-frame ANIMATED GIFs (exact gray palette, lossless LZW),
    // count frames with the real JDK reader, sample ≤3 under the
    // pinned rule src = j·n/min(3,n), decode only the sampled frames;
    // the oracle recomputes frame counts, sampled indices, dims, and
    // gray sums in closed form from doc_id
    "q95_frame_sample" -> ((s, dir) => Multimodal.sampledFrameMetaReport(
      Corpus.table(s, dir, "documents"), 20L, 3)),
    // q96: REAL audio decode — synthesize 16-bit PCM WAVs (container
    // written by the JDK codec), parse + reconstruct samples through
    // javax.sound.sampled; the oracle recomputes the closed-form
    // sample sums from doc_id
    "q96_audio_decode" -> ((s, dir) => Multimodal.decodedAudioMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q97: Bloom-sketch ingest admission — the base corpus's hash set
    // broadcast as a Bloom filter drops definitely-new delta rows
    // scan-locally; only Bloom positives pay the exact join. Output is
    // IDENTICAL to the plain anti-join at any fpp (positives re-check
    // exactly), so the oracle is the plain set arithmetic
    "q97_bloom_admission" -> ((s, dir) => Dedup.bloomAdmissionSummary(
      Corpus.table(s, dir, "documents"), 10L, 0.01)),
    // q98: compression-ratio quality signal under the invariant guard
    // (the q85 pattern): deflate isn't recomputable cross-engine, so
    // the gate pins the LZ back-reference property (doc+doc deflates
    // to < 2× one copy) and size bounds next to exact count columns
    "q98_compression_guard" -> ((s, dir) => TextStats.compressionGuard(
      Corpus.table(s, dir, "documents"))),
    // q99: the q68 incremental tier THROUGH the persisted bucketed
    // band store — the nightly-artifact execution path (base bands
    // precomputed, bucketed on the join key, base side never
    // shuffles); shares q68's oracle verbatim: store == memory ==
    // DuckDB
    "q99_band_store_dedup" -> ((s, dir) => {
      val (t, p) = bandStoreLoc(dir)
      Dedup.incrementalDedupViaBandStore(
        Corpus.table(s, dir, "documents"), 10L, 0.8, t, p)
    }),
    // q100: heavy-hitters sketch audit — stat.freqItems (one-pass,
    // constant-memory, the 100 TB frequent-items path) under its
    // superset guarantee: every EXACT heavy hitter above support·N
    // must be in the sketch result (the q85 audit pattern)
    "q100_heavy_hitters" -> ((s, dir) => TextStats.heavyHitterAudit(
      Corpus.table(s, dir, "documents"), 0.02)),
    // q101: CSV ingest health — q77's twin for the second interchange
    // format: planted non-numeric doc_id fields must be COUNTED by
    // the explicit-schema PERMISSIVE read, neither dropped nor fatal
    "q101_csv_health" -> ((s, dir) => graft.sources.CsvLines.healthReport(
      Corpus.table(s, dir, "documents"), fixtureDir("q101", dir), 200L, 5L)),
    // q102: Unicode NFC normalization — planted decomposed/precomposed
    // suffixes; the gate hashes the NORMALIZED strings (portable
    // 60-bit), so parity is a hard content check: java.text.Normalizer
    // NFC == DuckDB nfc_normalize byte for byte
    "q102_nfc_normalize" -> ((s, dir) => graft.pipeline.TextScrub
      .nfcNormalizationReport(Corpus.table(s, dir, "documents"))),
    // q103: ORC round trip — write documents through Spark's second
    // built-in columnar format, read back, and hash the CONTENT; the
    // oracle computes the same aggregates straight from the parquet
    // source, so any dropped/re-typed/corrupted column or lost row
    // mismatches
    "q103_orc_roundtrip" -> ((s, dir) => graft.sources.OrcTables
      .roundTripReport(Corpus.table(s, dir, "documents"),
        fixtureDir("q103", dir), 200L)),
    // q104: corpus snapshot diff — v1 drops doc_id%7==0, v2 drops
    // doc_id%13==0 and rewrites doc_id%11==0, both derived in closed
    // form so the oracle classifies added/removed/modified/unchanged
    // ARITHMETICALLY (independent derivation, q93's pattern)
    "q104_corpus_diff" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val docs = Corpus.table(s, dir, "documents")
      val v1 = docs.where(col("doc_id") % 7 =!= 0)
      val v2 = docs.where(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Curation.corpusDiff(v1, v2)
    }),
    // q105: the PURE within-stream watermark dedup replayed over the
    // documents table (q90 gates the composed admission path; this
    // isolates dedupStream itself) — kept hash set == the corpus's
    // distinct content hashes
    "q105_streaming_dedup" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.dedupStreamFileFeed(
        Corpus.table(s, dir, "documents"), fixtureDir("q105", dir))),
    // q106/q107: the pipeline tier through the PURE-SQL surface
    // (VERDICT r10 item 3). q106 goes through a registered table-level
    // entry point — the view's plan IS Dedup.exactDedupSummary, no
    // Scala in the query text; q107 composes the registered array_dot
    // kernel into ad-hoc SQL that reproduces q22's exact cosine top-k
    // bit-for-bit (same transform-cast, same sequential-order dot,
    // same rounding). Both hash-match their Scala twins' oracles.
    "q106_sql_exact_dedup" -> ((s, dir) => QueryRunner.sql(s, dir,
      "SELECT source, n_docs, n_unique FROM graft_exact_dedup ORDER BY source")),
    "q107_sql_cosine_topk" -> ((s, dir) => QueryRunner.sql(s, dir,
      """WITH v AS (SELECT vec_id, label,
        |  transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
        |q AS (SELECT ed AS q_ed, sqrt(array_dot(ed, ed)) AS q_norm
        |  FROM v WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(array_dot(ed, q_ed) / (sqrt(array_dot(ed, ed)) * q_norm), 6) AS cos
        |FROM v, q WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),
    // q108: the q95 frame-sampling gate through MULTI-PAGE TIFF — the
    // JDK's second real multi-frame container — with fresh closed-form
    // constants; certifies the sampler as container-generic
    "q108_tiff_frame_sample" -> ((s, dir) =>
      Multimodal.sampledTiffFrameMetaReport(
        Corpus.table(s, dir, "documents"), 20L, 3)),
    // q109: the FULL banded-LSH dataflow (q19) spelled in ad-hoc SQL
    // over the registered kernels — eligibility filter, shingle-hash,
    // affine minhashes, band keys, bucket pair expansion (with the same
    // star-fallback cap), and true-Jaccard verification. Hash-matches
    // the q19 oracle: the SQL surface runs the same computation, not a
    // lookalike (VERDICT r10 item 3, the dedup entry point). The text
    // is GENERATED from Dedup's banding constants (sqlLshNearDups) so
    // a change to the Scala dataflow cannot leave a stale hand-edited
    // spelling behind (VERDICT r11 finding 3).
    "q109_sql_lsh_near_dups" -> ((s, dir) =>
      QueryRunner.sql(s, dir, sqlLshNearDups)),
    // q110: per-document SimHash (q20) in one SQL line over the native
    // kernels — the fingerprint entry point of the SQL surface
    "q110_sql_simhash" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_id, simhash64(hash_tokens(text, 0, '#sim')) AS simhash
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // q111: the q96 audio-decode gate through AIFF — the JDK's second
    // real audio container, BIG-endian PCM, so the shared decoder's
    // endianness branch is certified with a real parser, not a fixture
    "q111_aiff_decode" -> ((s, dir) => Multimodal.decodedAiffMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q112: AU — the third and last JDK-native audio container through
    // the same decoder; the javax.sound parser surface is now complete
    "q112_au_decode" -> ((s, dir) => Multimodal.decodedAuMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q113: the AS-OF JOIN — the closure's one custom operator — in
    // pure SQL: the same tag → union → one-window → keep-left dataflow
    // AsOfJoin composes in Scala, spelled with last(_r, true) over a
    // running window. Hash-matches q40's DuckDB-native-ASOF oracle:
    // even the operator Spark lacks is SQL-reachable in this engine.
    // (Text hoisted to `sqlAsOfJoin` so the property test can run the
    // IDENTICAL spelling over arbitrary synthetic events tables.)
    "q113_sql_asof_join" -> ((s, dir) => QueryRunner.sql(s, dir, sqlAsOfJoin)),
    // q114: the codec-fallback QUARANTINE CONTRACT — the one seam
    // VERDICT r11 still counted weak. Planted fixtures in five residue
    // classes (valid PNG / truncated PNG / valid WAV / mp3-declared
    // garbage / mp4-declared garbage) run the production routing:
    // decode genuinely attempted per declared family, failures counted
    // + byte-accounted, survivors prove decode via post-decode
    // checksums. The oracle recomputes every number arithmetically.
    "q114_codec_quarantine" -> ((s, dir) => Multimodal.quarantineAuditReport(
      Corpus.table(s, dir, "documents"), 40L)),
    // q115: the CLUSTERING tier reached from pure SQL — the last
    // Scala-only pipeline tier (VERDICT r11 item 3). The
    // graft_dedup_clusters view's plan IS Dedup.nearDupClusters
    // (session pair index + shared min-label CC solve), registered on
    // first reference because a materialized clustering cannot be a
    // lazy view plan. Hash-matches q36's recursive-CTE oracle.
    "q115_sql_dedup_clusters" -> ((s, dir) => QueryRunner.sql(s, dir,
      "SELECT doc_id, cluster FROM graft_dedup_clusters ORDER BY doc_id")),
    // q116: the q80 parity contract through the PRODUCTION ingress —
    // spark.readStream.parquet over staged files (FileStreamSource,
    // maxFilesPerTrigger=1, mtime-ordered corpus + sentinel batches)
    // instead of driver-fed MemoryStream. Shares q41's oracle: Append
    // output == batch sessionization, now entry-path-to-sink.
    "q116_filestream_sessionize" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.sessionizeFileStream(
        Corpus.table(s, dir, "events"), 30, fixtureDir("q116", dir))),
    // q117: the keep-BEST clustering policy from pure SQL — q115's
    // view tier completed (both clustering views now carry their own
    // oracle row, not just the SqlSurfaceSpec pin). q82's oracle.
    "q117_sql_cluster_keep_best" -> ((s, dir) => QueryRunner.sql(s, dir,
      "SELECT source, n_kept FROM graft_cluster_keep_best ORDER BY source")),
    // q118: the q12 pricing summary in ad-hoc SQL over the registered
    // money_sum kernel — the exact 128-bit fold reachable from the SQL
    // surface, graded by q12's own decimal-fold oracle.
    "q118_sql_money_sum" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  CAST(money_sum(l_extendedprice * (1 - l_discount), 4) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(1) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    // q119: multimodal → ANN end-to-end — real-codec image features
    // (q76's synthetic PNGs through extractFeatures' production path)
    // feeding exact cosine top-k under the embedding tier's
    // conventions. The oracle recomputes features closed-form from
    // doc_id and mirrors the sequential fold term by term.
    "q119_media_feature_topk" -> ((s, dir) => Multimodal.mediaFeatureTopK(
      Corpus.table(s, dir, "documents"), 200L, 0L, 10)),
    // q120: REAL video decode — the frame-sampling gate through the
    // AVI container. The JDK ships no video codec, but uncompressed
    // DIB frames need none: the demux is a real RIFF walker (chunk
    // sizes, word padding, LIST recursion, BITMAPINFOHEADER,
    // bottom-up B-G-R stride-padded rasters), so the previously-stub
    // video tier now decodes exactly as far as a codec-free JVM can —
    // and the distinct R/G/B closed forms make a demux that mixed up
    // byte or row order hash-mismatch.
    "q120_avi_frame_sample" -> ((s, dir) =>
      Multimodal.sampledAviFrameMetaReport(
        Corpus.table(s, dir, "documents"), 20L, 3)),
    // q121: REAL compressed-audio decode — G.711 µ-law, the
    // log-companded telephony codec whose decompressor the JDK ships.
    // The oracle recomputes the expansion arithmetically (verified
    // bit-exact against the javax.sound converter for all 256 codes).
    "q121_ulaw_decode" -> ((s, dir) => Multimodal.decodedUlawMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q122: G.711 A-law — the second companding law through the same
    // decoder seam (even-bit toggle + segment structure vs µ-law's
    // complement), fresh closed-form constants.
    "q122_alaw_decode" -> ((s, dir) => Multimodal.decodedAlawMetaReport(
      Corpus.table(s, dir, "documents"), 20L)),
    // q123: corpus-wide PARAGRAPH-level dedup — the C4/RefinedWeb
    // boilerplate strip no document-level pass can do. Keeper = the
    // corpus-wide first occurrence per content key via partial+final
    // min-struct agg (skew-safe where a row_number window would put
    // every occurrence of a hot boilerplate key in ONE partition);
    // docs reassembled from surviving paragraphs in original order,
    // gated by per-source counts plus a portable hash over the
    // cleaned texts.
    "q123_paragraph_dedup" -> ((s, dir) => Dedup.paragraphDedupSummary(
      Corpus.table(s, dir, "documents"))),
    // q124: the paragraph tier from pure SQL — the q123 dataflow
    // (planted segmentation, min-struct keeper, reassembly, portable
    // hash) in one ad-hoc SQL text generated from the same Dedup
    // constants. Shares q123's oracle; bit-parity with the Scala path
    // pinned in SqlSurfaceSpec.
    "q124_sql_paragraph_dedup" -> ((s, dir) =>
      QueryRunner.sql(s, dir, sqlParagraphDedupText(hot = false))),
    // q125: compressed-ingest round trip — documents written as JSONL
    // under gzip (non-splittable: parallelism = file count) AND bzip2
    // (splittable pure-Java codec), read back through the
    // explicit-schema contract, content-hashed per codec; the oracle
    // recomputes both rows from the parquet source (q103's
    // losslessness pattern on the codec path corpora actually arrive
    // through)
    "q125_compressed_ingest" -> ((s, dir) => graft.sources.JsonLines
      .compressedRoundTripReport(Corpus.table(s, dir, "documents"),
        fixtureDir("q125", dir), 200L)),
    // q126: q123's keeper propagate under PLANTED SKEW — one hot
    // boilerplate paragraph in 50%+ of all docs. The derived hot-key
    // salting (Dedup.saltedKeeperFlags) spreads that key over a
    // (h, salt) join instead of one shuffle partition; the oracle
    // recomputes the dedup with the hot planting mirrored, so the
    // salted propagate's RESULTS are hash-gated under the exact
    // adversarial shape it exists for.
    "q126_paragraph_dedup_hotkey" -> ((s, dir) =>
      Dedup.paragraphDedupHotSummary(Corpus.table(s, dir, "documents"))),
    // q127: the q116 production ingress under MANY-WAVE arrival —
    // corpus staged as ~16 mtime-ordered files read one per
    // micro-batch, with genuinely late files carved [8,4) minutes
    // before each wave boundary. Exercises incremental watermark
    // advance + late-file admission on the FileStreamSource path;
    // Append output must still equal batch sessionization (q41's
    // oracle verbatim).
    "q127_filestream_waves" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.sessionizeFileStreamWaves(
        Corpus.table(s, dir, "events"), 30, fixtureDir("q127", dir))),
    // q128: recall@10 ladder for the IVF tier at nProbe ∈ {1,2,4,8} —
    // q70's audit discipline for the k-means quantizer, so q38's dial
    // is no longer the only ungraded knob. Gate = the q85 pattern
    // (exact columns + TRUE-expected monotonicity/endpoint
    // invariants); the recall curve itself is asserted in
    // PipelineSpec (k-means values cannot cross engines). The query
    // sample is corpus-SIZED (≤512 by construction — sizedQueryMod,
    // recomputed identically by the oracle), not a pinned mod whose
    // broadcast would grow linearly with the corpus.
    "q128_ivf_recall_ladder" -> ((s, dir) =>
      Similarity.ivfRecallAuditSized(
        Corpus.table(s, dir, "embeddings"), 10, 8, Seq(1, 2, 4, 8))),
    // q129: the quarantine-RATE guard — q114 counts outcomes, this
    // row CONTRACTS them: eight families on disjoint id ranges (the
    // q114 classes + AVI and both G.711 laws, every codec the JVM
    // really ships), each all-or-nothing by construction, with a
    // Spark-side TRUE-expected rate flag that flips the moment a
    // decodable family starts quarantining or a codec-less one starts
    // "decoding".
    "q129_quarantine_rate_guard" -> ((s, dir) =>
      Multimodal.quarantineRateGuard(Corpus.table(s, dir, "documents"))),
    // q130: q126's skew fixture from pure SQL — the q124/q109 lockstep
    // discipline for the newest tier variant. The hot spelling carries
    // a STATIC (h, salt) keeper join (the q131 forced-salt pattern in
    // SQL): AQE's skew split measurably CANNOT own this path — the
    // keeper aggregate rides the join's own h-shuffle, so
    // OptimizeSkewedJoin's Sort+Shuffle child pattern never matches
    // (ceiling pinned in PlanShapeSpec). Shares q126's oracle.
    "q130_sql_paragraph_dedup_hot" -> ((s, dir) =>
      QueryRunner.sql(s, dir,
        sqlParagraphDedupText(hot = true,
          saltFactor = graft.pipeline.Dedup.SqlSaltFactor))),
    // q131: the salted dataflow itself, oracle-gated — q79's adaptive
    // derivation rightly picks the plain join on unskewed TPC-H, so
    // this row forces the factor and keeps the explode/salt machinery
    // hash-gated on real corpus data at every SF (q32's oracle).
    "q131_salted_join_forced" -> ((s, dir) =>
      RelationalOps.saltedRevenueByPriorityForced(s, dir)),
    // q132: watermarked stream-stream INTERVAL join (r14 — the one
    // Structured Streaming operator family not yet gated):
    // click→purchase attribution over the production file-feed
    // ingress; a purchase matches every same-user click in the
    // preceding 30 minutes. Oracle = the identical batch interval
    // join + per-user rollup in SQL.
    "q132_stream_stream_join" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.clickPurchaseJoinFileFeed(
        Corpus.table(s, dir, "events"), 30, fixtureDir("q132", dir))),
    // q133: the LEFT OUTER spelling — unmatched clicks emit their
    // null-extended row only after the watermark finalizes them, so
    // this gates the join's state-eviction/finalization path (two
    // both-sided sentinel waves advance the global watermark).
    "q133_stream_outer_join" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.clickPurchaseLeftJoinFileFeed(
        Corpus.table(s, dir, "events"), 30, fixtureDir("q133", dir))),
    // q134: benchmark decontamination — 13-gram train/eval overlap on
    // the natural corpus (hash-split eval stand-in; hits ride the
    // corpus's genuine near-dup pairs)
    "q134_decontamination" -> ((s, dir) =>
      Dedup.decontaminationReport(Corpus.table(s, dir, "documents"))),
    // q135: the planted twin — [[DeconBanner]] prepended to a hash
    // split of docs on BOTH sides, so every source exercises the hit
    // path (the q123/q126 planted-fixture discipline)
    "q135_decontamination_planted" -> ((s, dir) =>
      Dedup.decontaminationReport(Corpus.table(s, dir, "documents"),
        plantBanner = true)),
    // q136: int8 scalar-quantized SEARCH recall@10 — the q70 audit
    // discipline applied to the ANN tier's memory lever; recall
    // values hash-match the oracle (asymmetric/ADC scoring, the q63
    // quantization identity)
    "q136_int8_recall" -> ((s, dir) =>
      Similarity.int8RecallAuditSized(Corpus.table(s, dir, "embeddings"),
        10)),
    // q137: the interval join through the MANY-wave ingress — pairs
    // complete across micro-batches from join state (q132 gates the
    // single-batch path; same oracle, different state machine path)
    "q137_stream_join_waves" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.clickPurchaseJoinWaves(
        Corpus.table(s, dir, "events"), 30, fixtureDir("q137", dir))),
    // q138: the EVAL-side detail of the 13-gram tier — which benchmark
    // items are compromised and how badly (q74's treatment at the
    // published convention; r14 VERDICT task 6). Planted spelling so
    // every source exercises the hit path at every SF.
    "q138_contaminated_evals13" -> ((s, dir) =>
      Dedup.contaminatedEvalDocs13(Corpus.table(s, dir, "documents"),
        plantBanner = true)),
    // q139: winnowed fingerprints (Schleimer-Wilbur-Aiken SIGMOD'03
    // local fingerprinting) — per-doc digest over a doc_id-mod sample;
    // the (hash-sum, pos-sum) pair pins WHICH grams were selected AND
    // the tie-break, so any window/tie drift hash-mismatches
    "q139_winnow_fingerprints" -> ((s, dir) =>
      Winnow.winnowFingerprintStats(Corpus.table(s, dir, "documents"))),
    // q140: sub-document copy detection — doc pairs sharing >= 5
    // winnowed fingerprints through df-bounded evidence (boilerplate
    // fingerprints held by > 8 docs are dropped before pairing)
    "q140_winnow_overlap" -> ((s, dir) =>
      Winnow.winnowOverlapPairs(Corpus.table(s, dir, "documents"))),
    // q141: decontamination APPLY — the ship operator the q134/q135
    // report informs: drop contaminated train docs, certify the kept
    // corpus by content hash. Planted so the drop path fires on every
    // source at every SF (q135's reasoning).
    "q141_decontaminate_apply" -> ((s, dir) =>
      Dedup.decontaminateCorpus13(Corpus.table(s, dir, "documents"),
        plantBanner = true)),
    // q142: the SEARCH form of the winnow tier — top-3 copy-evidence
    // neighbors per doc, ranked by shared fingerprints (attribution)
    "q142_winnow_neighbors" -> ((s, dir) =>
      Winnow.winnowTopNeighbors(Corpus.table(s, dir, "documents"))),
    // q143: the decontamination APPLY from pure SQL — the r15 tiers
    // join the q106/q115/q124 lockstep surface (r15 VERDICT task 1).
    // The graft_decontaminate_13 view's plan IS decontaminateCorpus13
    // (planted, gate-standard parameters); shares q141's oracle, so
    // the SQL path is certified as the same ship artifact, content
    // hash included.
    "q143_sql_decontaminate" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_train_docs, n_dropped, n_kept, kept_hash_sum
        |FROM graft_decontaminate_13 ORDER BY source""".stripMargin)),
    // q144: the winnow pair tier from pure SQL — sub-document copy
    // detection reachable with no Scala in sight. The view's plan IS
    // winnowOverlapPairs (join-free, df-bounded); shares q140's oracle.
    "q144_sql_winnow_pairs" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_a, doc_b, n_shared FROM graft_winnow_pairs
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // q145: winnow APPLY — report→apply completed for the copy-
    // detection tier, mirroring q141's for decontamination (r15
    // VERDICT task 2): components over the q140 pair graph, keep-best
    // per component (longest, ties to smallest id), per-source ship
    // digest with a '#wk' content hash certifying the kept corpus.
    "q145_winnow_apply" -> ((s, dir) =>
      Winnow.winnowDedupCorpus(Corpus.table(s, dir, "documents"))),
    // q146: delta-vs-base sub-document copy detection THROUGH the
    // persisted bucketed fingerprint store — the q68/q99 incremental
    // discipline for the winnow tier (r15 VERDICT task 4): the
    // standing corpus is fingerprinted once into a store bucketed on
    // fp_hash; the ingest-batch stand-in probes it with no base-side
    // shuffle. Oracle recomputes the same split + base-df-bounded
    // pairing from scratch: store == memory == DuckDB.
    "q146_winnow_store_incr" -> ((s, dir) => {
      val (t, p) = winnowStoreLoc(dir)
      Winnow.winnowStoreOverlap(Corpus.table(s, dir, "documents"),
        Winnow.WinnowDeltaMod, t, p)
    }),
    // q147: STREAMING decontamination admission — the q141 apply at
    // its production point (quarantine contaminated docs on ARRIVAL,
    // at the FileStreamSource ingress, against the broadcast eval
    // hash set) — r15 VERDICT task 5. Shares q141's oracle verbatim:
    // ingest-time == post-hoc decontamination, content hash included.
    "q147_stream_decontaminate" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.deconAdmitStreamFileFeed(
        Corpus.table(s, dir, "documents"), fixtureDir("q147", dir))),
    // q148: the winnow APPLY from pure SQL — q145 through the
    // first-reference graft_winnow_apply view (the q115/q117
    // materialized-view precedent: the CC solve runs at view build).
    // Shares q145's oracle: both ship digests certify the same
    // artifact from either surface.
    "q148_sql_winnow_apply" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_docs, n_flagged, n_dropped, n_kept, kept_hash_sum
        |FROM graft_winnow_apply ORDER BY source""".stripMargin)),
    // q149: winnow-store ingest ADMISSION — report→apply for the
    // incremental tier (q146 reports delta-vs-base copy pairs; this
    // ships the admitted batch): drop every delta doc with copy
    // evidence against the standing corpus (base copy wins — it is
    // already shipped), per-source digest with a '#wa' content hash
    // over the ADMITTED batch. Shares q146's store (one build per
    // process, the q99 stance).
    "q149_winnow_store_admit" -> ((s, dir) => {
      val (t, p) = winnowStoreLoc(dir)
      Winnow.winnowStoreAdmit(Corpus.table(s, dir, "documents"),
        Winnow.WinnowDeltaMod, t, p)
    }),
    // q150: span-level copy attribution — WHERE the copied span lives
    // (r16 VERDICT task 1, the fp_pos payoff): for every q140-flagged
    // pair, the contiguous matched-fingerprint runs in BOTH docs'
    // token coordinates. Join-free one-pass dataflow; oracle is a
    // classic islands-and-gaps recompute over the same fp CTEs.
    "q150_winnow_spans" -> ((s, dir) =>
      Winnow.winnowCopySpans(Corpus.table(s, dir, "documents"))),
    // q151: the spans from pure SQL via the lazy graft_winnow_spans
    // view (lockstep discipline); shares q150's oracle.
    "q151_sql_winnow_spans" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_a, doc_b, side, span_idx, start_pos, end_pos, n_fps
        |FROM graft_winnow_spans
        |ORDER BY doc_a, doc_b, side, span_idx""".stripMargin)),
    // q152: the winnow STORE probe from pure SQL (r16 VERDICT
    // task 5) — graft_winnow_store_pairs is a first-reference
    // side-effecting mat-view: its build runs the bucketed store
    // build once per process, its plan is the no-base-shuffle probe.
    // Shares q146's oracle: store == SQL == DuckDB.
    "q152_sql_winnow_store" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT delta_doc, base_doc, n_shared
        |FROM graft_winnow_store_pairs
        |ORDER BY delta_doc, base_doc""".stripMargin)),
    // q153: the band-store incremental dedup from pure SQL — closes
    // the same SQL-surface gap for the q99 tier (the one VERDICT
    // said to close or exempt; closed). Shares q68/q99's oracle.
    "q153_sql_band_store" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_delta, n_exact_dup, n_near_dup, n_admitted
        |FROM graft_band_store_dedup
        |ORDER BY source""".stripMargin)),
    // q154: span attribution THROUGH the persisted store — the reason
    // the store keeps fp_pos (q146's scaladoc promise, now an
    // operator): per flagged delta-vs-base pair, the copied token
    // intervals in BOTH the incoming doc's and the standing corpus
    // doc's coordinates, base side read from its buckets. Shares the
    // q146 store; oracle = q146's CTEs + islands-and-gaps.
    "q154_winnow_store_spans" -> ((s, dir) => {
      val (t, p) = winnowStoreLoc(dir)
      Winnow.winnowStoreSpanReport(Corpus.table(s, dir, "documents"),
        Winnow.WinnowDeltaMod, t, p)
    }),
    // q155: q154 from pure SQL via the first-reference
    // graft_winnow_store_spans mat-view; shares q154's oracle.
    "q155_sql_winnow_store_spans" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT delta_doc, base_doc, side, span_idx, start_pos,
        |  end_pos, n_fps
        |FROM graft_winnow_store_spans
        |ORDER BY delta_doc, base_doc, side, span_idx""".stripMargin)),
    // q156: span-level SCRUB — the SURGICAL apply (r17 VERDICT
    // task 1): q145 drops whole documents; this cuts exactly the
    // copied token intervals q150 locates (ExactSubstr convention)
    // and keeps the remainder, the component's best member keeping
    // its text whole. '#ws' content hash over the ENTIRE post-scrub
    // corpus certifies the shipped artifact.
    "q156_winnow_scrub" -> ((s, dir) =>
      Winnow.winnowScrubSpans(Corpus.table(s, dir, "documents"))),
    // q157: the scrub from pure SQL via the first-reference
    // graft_winnow_scrub mat-view (CC solve executes at build);
    // shares q156's oracle.
    "q157_sql_winnow_scrub" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_docs, n_scrubbed, n_tokens_removed,
        |  n_tokens_kept, scrubbed_hash_sum
        |FROM graft_winnow_scrub ORDER BY source""".stripMargin)),
    // q158: STREAMING winnow admission — q149 at its production
    // point (r17 VERDICT task 3): arriving docs fingerprint in the
    // scan, probe the SAME persisted store stream-static, and
    // quarantine on copy evidence the moment the threshold is
    // crossed. Shares q149's oracle verbatim: ingest-time == batch
    // sub-document copy admission, '#wa' hash included.
    "q158_stream_winnow_admit" -> ((s, dir) => {
      val (t, p) = winnowStoreLoc(dir)
      graft.streaming.StreamingPipeline.winnowAdmitStreamFileFeed(
        Corpus.table(s, dir, "documents"), Winnow.WinnowDeltaMod, t, p,
        fixtureDir("q158", dir))
    }),
    // q159: the PARAMETERIZED winnow SQL surface (r17 VERDICT
    // task 5): graft_winnow_pairs is also a session TABLE-VALUED
    // FUNCTION (Spark's TableFunctionRegistry — range()'s registry),
    // so ad-hoc SQL tunes k/w/maxDf/minShared without Scala. The
    // gate spells the TVF at gate-standard arguments and shares
    // q140's oracle, certifying the parameterized path IS the same
    // computation (SqlSurfaceSpec pins the non-standard-argument
    // behavior and literal-only validation).
    "q159_sql_winnow_pairs_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      s"""SELECT doc_a, doc_b, n_shared
        |FROM graft_winnow_pairs(${Winnow.WinnowK}, ${Winnow.WinnowW},
        |  ${Winnow.WinnowMaxDf}, ${Winnow.WinnowMinShared})
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // q160: parameterized near-dup detection — the LSH tier's
    // Jaccard threshold as a TVF argument (the view pins 0.8);
    // gate-standard argument shares q19's oracle.
    "q160_sql_lsh_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_a, doc_b, jaccard FROM graft_lsh_near_dups(0.8)
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // q161: similarity SEARCH from SQL — exact cosine top-k for an
    // arbitrary query vector id (the view pins (0, 10)); gate-standard
    // arguments share q22's oracle.
    "q161_sql_cosine_topk_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      "SELECT vec_id, label, cos FROM graft_cosine_topk(0, 10)")),
    // q162: the per-document scrub artifact behind q156's digest —
    // every flagged non-winner doc with token accounting and a '#wd'
    // hash over ITS rebuilt text, so each shipped scrubbed document
    // is certified individually (a per-doc error that cancels in the
    // digest sum cannot hide in per-doc hashes).
    "q162_winnow_scrubbed_docs" -> ((s, dir) =>
      Winnow.winnowScrubbedDocReport(Corpus.table(s, dir, "documents"))),
    // q163: the per-doc artifact from pure SQL via the first-reference
    // graft_winnow_scrubbed_docs mat-view; shares q162's oracle.
    "q163_sql_winnow_scrubbed_docs" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_id, source, n_toks, n_kept, scrubbed_hash
        |FROM graft_winnow_scrubbed_docs ORDER BY doc_id""".stripMargin)),
    // q164: interpolated bigram LM score (CCNet/KenLM-style perplexity
    // filter), self-scored on the corpus's own counts. ONE ln per
    // distinct bigram type, quantized to integer nanolog; all doc- and
    // source-level accumulation is exact integer arithmetic with one
    // final divide.
    "q164_bigram_lm" -> ((s, dir) =>
      TextStats.bigramLmScores(Corpus.table(s, dir, "documents"))),
    // q165: batch interval join via bucket decomposition — burst-window
    // attribution with NO equality key; bucket width == window width
    // keeps the candidate set O(matches) and the plan a plain
    // equi-join (no cartesian/BNLJ; the oracle is DuckDB's IEJoin).
    "q165_interval_join" -> ((s, dir) =>
      graft.operators.IntervalJoin.burstWindows(s, dir)),
    // q166: weighted sampling without replacement (Efraimidis–Spirakis
    // A-Res, w = n_chars) — fixed-k per source with inclusion
    // probability ∝ length, deterministic under retries and re-runs.
    "q166_weighted_sample" -> ((s, dir) =>
      Curation.weightedSample(Corpus.table(s, dir, "documents"), 50)),
    // q167–q169: the new tier's SQL surface — session table-valued
    // functions at gate-standard arguments, each sharing its Scala
    // twin's oracle (the q159 lockstep discipline).
    "q167_sql_bigram_lm_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_docs, avg_lp, p50_doc_lp
        |FROM graft_bigram_lm(0.875) ORDER BY source""".stripMargin)),
    "q168_sql_burst_windows_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT anchor_id, n_events, n_users
        |FROM graft_burst_windows(250.0, 5)
        |ORDER BY anchor_id""".stripMargin)),
    "q169_sql_weighted_sample_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, rn, doc_id, n_chars, es_key
        |FROM graft_weighted_sample(50) ORDER BY source, rn""".stripMargin)),
    // q170/q171: PRODUCT quantization — the codebook member of the
    // quantized-search family (q63/q136 are scalar int8). Deterministic
    // hash-sampled codebook (closed-form, no k-means) ⇒ codes,
    // reconstructions, and recall values are bit-identical across
    // engines, so this tier gates on VALUES where q128's k-means
    // ladder can only gate on invariants.
    "q170_pq_error" -> ((s, dir) =>
      Similarity.pqErrorProfile(Corpus.table(s, dir, "embeddings"))),
    "q171_pq_recall" -> ((s, dir) =>
      Similarity.pqRecallAuditSized(Corpus.table(s, dir, "embeddings"), 10)),
    // q172/q173: the PQ tier from pure SQL — first-reference mat-views
    // (the codebook TakeOrdered collect runs at build); share the
    // Scala twins' oracles.
    "q172_sql_pq_error" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT label, n, min_pqerr, max_pqerr, p50_pqerr
        |FROM graft_pq_error ORDER BY label""".stripMargin)),
    "q173_sql_pq_recall" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT qid, n_hit, recall, n_hit_r, recall_r
        |FROM graft_pq_recall ORDER BY qid""".stripMargin)),
    // q174: BM25 ranked retrieval — the query-time member of the text
    // tier (q57/q164 score corpora; this SEARCHES one). Inverted-index
    // shape with postings restricted to the query terms in the scan;
    // one ln per query-term type (NANOLOG), per-(doc,term) micro-
    // quantized, exact integer per-doc sums; top-k is
    // TakeOrderedAndProject.
    "q174_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(Corpus.table(s, dir, "documents"))),
    // q175: the same from SQL — a TVF with a STRING argument (the
    // query) at gate-standard args; shares q174's oracle.
    "q175_sql_bm25_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT rank, doc_id, source, n_terms, score
        |FROM graft_bm25('dup merge window', 20) ORDER BY rank"""
        .stripMargin)),
    // q176: edit-distance similarity join (PassJoin pigeonhole —
    // character-level Levenshtein over 40-char prefix keys; blocking
    // is a plain equi-join on (segment idx, text), candidates dedupe
    // before ONE verify per pair). Audit bounded to doc_id < 1000 on
    // both ends (the q21 precedent) so the oracle can brute-force the
    // quadratic reference at sf10; Catalyst pushes the bound through
    // the join into both scans.
    "q176_edit_distance_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.pipeline.EditJoin
        .editDistancePairs(Corpus.table(s, dir, "documents"))
        .where(col("doc_a") < 1000 && col("doc_b") < 1000)
    }),
    // q177: the same from SQL — TVF at gate-standard args, the window
    // applied as a WHERE over the TVF's output (pair-local predicate,
    // so it pushes into the scans); shares q176's oracle.
    "q177_sql_edit_pairs_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT doc_a, doc_b, dist FROM graft_edit_pairs(4, 40)
        |WHERE doc_a < 1000 AND doc_b < 1000
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // q178: CROSS-corpus bigram LM scoring — the CCNet deployment
    // shape (q164 self-scores, so it never sees an unseen word): model
    // trains on the even doc_ids, scores the odd ones; add-one
    // smoothing gives OOV mass, per-source oov_rate reported.
    "q178_bigram_lm_cross" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Corpus.table(s, dir, "documents")
      TextStats.bigramLmCrossScores(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 =!= 0))
    }),
    // q179: the TVF twin at gate-standard λ; shares q178's oracle.
    "q179_sql_bigram_lm_cross_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_docs, avg_lp, p50_doc_lp, oov_rate
        |FROM graft_bigram_lm_cross(0.875) ORDER BY source"""
        .stripMargin)),
    // q180: BM25 through the PERSISTED inverted index — the q68/q99/
    // q146 store discipline applied to retrieval: postings bucketed by
    // term, query-time reads bucket-pruned to the query's own terms +
    // the 1-row stats sidecar, NO corpus scan. Shared scoring tail
    // with q174 ⇒ shares its oracle verbatim.
    "q180_bm25_store" -> ((s, dir) => {
      val (t, p) = bm25StoreLoc(dir)
      Retrieval.bm25TopKViaStore(Corpus.table(s, dir, "documents"), t, p)
    }),
    // q181: the store tier from SQL — first-reference side-effecting
    // mat-view over the SAME store (the q152 lockstep); shares q174's
    // oracle too.
    "q181_sql_bm25_store" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT rank, doc_id, source, n_terms, score
        |FROM graft_bm25_store ORDER BY rank""".stripMargin)),
    // q182: BATCH BM25 — top-k per query for a TABLE of queries in ONE
    // corpus pass (the eval-retrieval shape: 10k prompts cannot each
    // pay a scan). Per-query ranking is row_number ≤ k → partial+final
    // WindowGroupLimit; df/idf computes once, shared across queries.
    "q182_bm25_batch" -> ((s, dir) =>
      Retrieval.bm25BatchTopK(Corpus.table(s, dir, "documents"))),
    // q183: the lazy view twin at gate-standard queries; same oracle.
    "q183_sql_bm25_batch" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT query_id, rank, doc_id, source, n_terms, score
        |FROM graft_bm25_batch ORDER BY query_id, rank""".stripMargin)),
    // q184: percentile-based quality admission — the DYNAMIC-threshold
    // member of the quality tier (q47/q83 apply config cutoffs; this
    // derives each source's cutoff from its own rare-token-rate
    // distribution and certifies the kept corpus with the '#qp'
    // content-hash sum).
    "q184_quality_percentile_admission" -> ((s, dir) =>
      Curation.qualityPercentileAdmission(Corpus.table(s, dir, "documents"))),
    // q185: the TVF twin at gate-standard (q, rare_threshold).
    "q185_sql_quality_admission_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_in, n_dropped, n_kept, kept_hash_sum
        |FROM graft_quality_admission(0.75, 500) ORDER BY source"""
        .stripMargin)),
    // q186: STREAMING ingest into the BM25 index store — documents
    // arrive in micro-batches through the production FileStreamSource
    // ingress, each batch folds in via foreachBatch → appendBm25Store
    // (whose manifest anti-join makes the at-least-once foreachBatch
    // contract exactly-once); the probe afterward answers from the
    // store alone. Shares q174's oracle verbatim (ingest == batch).
    "q186_bm25_stream_ingest" -> ((s, dir) => {
      val (t, p) = bm25StreamStoreLoc(dir)
      graft.streaming.StreamingPipeline.bm25StreamIngest(
        Corpus.table(s, dir, "documents"), t, p, fixtureDir("q186", dir))
    }),
    // q187: GOPHER-style per-document repetition admission — the
    // within-document member of the quality tier (q184 thresholds on a
    // corpus-relative percentile; this drops docs whose own n-gram
    // structure says loop/boilerplate: dup-token fraction, top
    // 2/3/4-gram char fraction, duplicated 5/10-gram char fraction —
    // the MassiveText suite). Decision path is pure integer permille
    // comparisons; stutter planting (the DeconBanner convention) keeps
    // the long-n-gram path firing at every SF.
    "q187_repetition_admission" -> ((s, dir) =>
      TextStats.repetitionAdmission(Corpus.table(s, dir, "documents"))),
    // q188: the TVF twin at gate-standard permille thresholds.
    "q188_sql_repetition_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, n_in, n_flag_dup_tok, n_flag_top_gram,
        |  n_flag_dup_gram, n_dropped, n_kept, kept_hash_sum
        |FROM graft_repetition_admission(650, 150, 180, 220, 150, 100)
        |ORDER BY source""".stripMargin)),
    // q189: DSIR importance resampling — the published
    // hashed-n-gram importance-weight recipe (target = even doc_ids,
    // the q178 split) with Gumbel top-k sampling on an INTEGER key;
    // the principled replacement for q166's size-weighted sample when
    // a target distribution exists.
    "q189_dsir_resample" -> ((s, dir) =>
      Curation.dsirResample(Corpus.table(s, dir, "documents"))),
    // q190: the TVF twin at gate-standard (k, buckets).
    "q190_sql_dsir_tvf" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT source, rn, doc_id, log_w, key
        |FROM graft_dsir_sample(5, 4096) ORDER BY source, rn"""
        .stripMargin)),
    // q191: STREAMING retrieval — queries arrive through the
    // production FileStreamSource ingress and each micro-batch is
    // answered from q180's persisted term-bucketed index (bucket-
    // pruned postings + stats sidecar, never a corpus scan); per-batch
    // results land in batchId-keyed directories so foreachBatch replay
    // is idempotent. Assembled answers == q182 ⇒ shares its oracle.
    "q191_bm25_query_stream" -> ((s, dir) => {
      val (t, p) = bm25StoreLoc(dir)
      graft.streaming.StreamingPipeline.bm25QueryStream(
        Corpus.table(s, dir, "documents"), t, p, fixtureDir("q191", dir))
    }),
    // q192: SEMANTIC decontamination — the embedding-space member of
    // the decontamination tier (q134/q141 catch verbatim 13-gram
    // overlap, q145/q149 sub-document copies; this catches
    // PARAPHRASE-level contamination sharing no n-gram). Consumes the
    // SAME session-cached sign-bucket pair index as q29/q58.
    "q192_semantic_decon" -> ((s, dir) =>
      Similarity.semanticDecontamination(
        Corpus.table(s, dir, "embeddings"))),
    // q193: the SQL twin through the first-reference mat-view (the
    // pair index materializes at build — the graft_dedup_clusters
    // registration class); shares q192's oracle.
    "q193_sql_semantic_decon" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT label, n_train, n_contaminated, n_kept, kept_hash_sum
        |FROM graft_semantic_decon ORDER BY label""".stripMargin)),
    // q194: STREAMING semantic admission — the third member of the
    // ingest-admission triptych (q147 exact 13-gram, q158 sub-document
    // copy, this paraphrase-level): arriving train vectors probe the
    // static eval set bucket-wise and quarantine on cosine evidence.
    // Admitted set == q192's kept set (cap quiescent by the adaptive
    // width contract) ⇒ shares q192's oracle verbatim.
    "q194_stream_semantic_admit" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.semanticAdmitStream(
        Corpus.table(s, dir, "embeddings"), fixtureDir("q194", dir))),
    // q195: the COMPOSITE ANN serving query — coarse multi-probe prune
    // (sign-bucket hamming ball, the CLOSED-FORM coarse quantizer) +
    // PQ-ADC shortlist + exact re-rank of the top-R: the faiss IVF-PQ
    // deployment shape assembled from the audited q94 and q170 tiers,
    // hash-gated on VALUES end-to-end (the k-means IVF tier can only
    // gate on invariants).
    "q195_pq_probe_topk" -> ((s, dir) =>
      Similarity.pqProbeTopK(Corpus.table(s, dir, "embeddings"))),
    // q196: the SQL twin through the first-reference mat-view (the
    // codebook + query row collect at build); shares q195's oracle.
    "q196_sql_pq_probe" -> ((s, dir) => QueryRunner.sql(s, dir,
      """SELECT rank, vec_id, label, cos
        |FROM graft_pq_probe ORDER BY rank""".stripMargin)),
  )

  /** The q124 (and, with the hot planting, q130) SQL text, generated
    * from Dedup's paragraph constants so the SQL surface moves in
    * lockstep with the Scala dataflow (the q109 discipline). Same
    * skew-safe keeper: partial+final min(named_struct) aggregate, NOT
    * a row_number window.
    *
    * The keeper JOIN is the tier's skew point, and — measured, not
    * assumed (r13 VERDICT task 3) — AQE cannot rescue the plain
    * spelling: the keeper aggregate reuses the join's h-shuffle, so
    * the join's build child is Agg←Sort←Shuffle, not the
    * Sort←Shuffle shape OptimizeSkewedJoin requires, and the hot key
    * serializes into one task no matter the thresholds (ceiling
    * pinned in PlanShapeSpec). `saltFactor > 1` therefore emits the
    * static salted spelling: keepers replicate over a salt spine
    * (LATERAL VIEW explode(sequence)) and the join keys on
    * (h, salt), spreading a hot key over `saltFactor` partitions at
    * the cost of a saltFactor× keeper-side replicate — the classic
    * declarative salting trade, next to which the Scala operator's
    * derived hot/cold split (q126) is the cheaper adaptive path.
    * `saltFactor = 1` keeps the plain join for unskewed corpora
    * (q124), mirroring the q79-adaptive/q131-forced pairing. */
  private[graft] def sqlParagraphDedupText(hot: Boolean,
                                           saltFactor: Int = 1): String =
    s"""WITH t AS (SELECT doc_id, source, split(text, ' ') AS tk FROM documents),
       |b AS (SELECT doc_id, source, tk, size(tk) AS n, size(tk) div 3 AS b1,
       |    (size(tk) * 2) div 3 AS b2 FROM t),
       |segs AS (SELECT doc_id, source, array(
       |    array_join(slice(tk, 1, b1), ' '),
       |    array_join(slice(tk, b1 + 1, b2 - b1), ' '),
       |    array_join(slice(tk, b2 + 1, n - b2), ' ')) AS s FROM b),
       |p1 AS (SELECT doc_id, source, CASE WHEN doc_id % 3 = 0
       |    THEN concat(slice(s, 1, 1), array('${Dedup.ParaBanner}'), slice(s, 2, 2))
       |    ELSE s END AS s1 FROM segs),
       |p2x AS (SELECT doc_id, source, CASE WHEN doc_id % 5 = 0
       |    THEN concat(s1, array('${Dedup.ParaFooter}')) ELSE s1 END AS s2x FROM p1),
       |p2 AS (SELECT doc_id, source, ${
         if (hot)
           s"CASE WHEN doc_id % 2 = 0 THEN concat(array('${Dedup.ParaHot}'), s2x) ELSE s2x END"
         else "s2x"
       } AS s2 FROM p2x),
       |p AS (SELECT doc_id, source, para_idx, para, sha2(para, 256) AS h
       |  FROM p2 LATERAL VIEW posexplode(s2) t AS para_idx, para),
       |k AS (SELECT h, min(named_struct('doc_id', doc_id, 'para_idx', para_idx)) AS keeper
       |  FROM p GROUP BY h),
       |${
         if (saltFactor > 1)
           s"""ks AS (SELECT h, keeper, salt FROM k
              |  LATERAL VIEW explode(sequence(0, ${saltFactor - 1})) sp AS salt),
              |f AS (SELECT p.doc_id, p.source, p.para_idx, p.para,
              |    (ks.keeper.doc_id = p.doc_id AND ks.keeper.para_idx = p.para_idx) AS kept
              |  FROM p JOIN ks ON p.h = ks.h
              |    AND CAST(pmod(p.doc_id + p.para_idx, $saltFactor) AS INT) = ks.salt),""".stripMargin
         else
           """f AS (SELECT p.doc_id, p.source, p.para_idx, p.para,
             |    (k.keeper.doc_id = p.doc_id AND k.keeper.para_idx = p.para_idx) AS kept
             |  FROM p JOIN k ON p.h = k.h),""".stripMargin
       }
       |d AS (SELECT doc_id, source, count(1) AS n_paras,
       |    sum(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
       |    array_join(transform(filter(array_sort(
       |      collect_list(struct(para_idx, kept, para))), x -> x.kept),
       |      x -> x.para), '\\n') AS cleaned
       |  FROM f GROUP BY doc_id, source)
       |SELECT source, count(1) AS n_docs, sum(n_paras) AS paras_total,
       |  sum(n_kept) AS paras_kept,
       |  sum(CASE WHEN n_kept < n_paras THEN 1 ELSE 0 END) AS docs_changed,
       |  sum(CAST(conv(substr(sha2(concat(cleaned, '#pd'), 256), 1, 15), 16, 10)
       |      AS BIGINT) % 1000000000) AS cleaned_hash_sum
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** The q109 SQL text, GENERATED from Dedup's banding constants
    * (bands × rows-per-band slices of the minhash array, the shingle
    * width, and the star-fallback cap all interpolate from the same
    * vals the Scala dataflow uses), so the SQL surface moves in
    * lockstep with `Dedup` by construction. Bit-parity with
    * `Dedup.lshNearDupPairs` stays pinned in SqlSurfaceSpec; this
    * removes the hand-edit the pin used to guard. */
  private[graft] val sqlLshNearDups: String = {
    import graft.pipeline.Dedup.{Bands, RowsPerBand, NumHashes, ShingleK, DefaultMaxBucket}
    require(Bands * RowsPerBand == NumHashes,
      "banding must consume exactly the minhash signature")
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand)
        .map(r => s"CAST(mh[${b * RowsPerBand + r}] AS STRING)")
        .mkString(", ")
      s"""named_struct('band', $b, 'bkey', sha256_prefix60(concat_ws('_',
         |      $cols), '#band$b'))""".stripMargin
    }.mkString(",\n    ")
    s"""WITH elig AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE size(split(text, ' ')) >= $ShingleK),
       |sig AS (
       |  SELECT doc_id,
       |    affine_minhashes(hash_tokens(text, $ShingleK, '#mh'), $NumHashes) AS mh
       |  FROM elig),
       |banded AS (
       |  SELECT doc_id, bk.band, bk.bkey FROM sig
       |  LATERAL VIEW explode(array(
       |    $bandStructs)) t AS bk),
       |buckets AS (
       |  SELECT array_sort(collect_list(doc_id)) AS ids
       |  FROM banded GROUP BY band, bkey HAVING count(1) > 1),
       |cand AS (
       |  SELECT DISTINCT p.doc_a, p.doc_b FROM buckets
       |  LATERAL VIEW explode(
       |    CASE WHEN size(ids) <= $DefaultMaxBucket THEN
       |      flatten(transform(sequence(0, size(ids) - 2),
       |        i -> transform(slice(ids, i + 2, size(ids) - 1 - i),
       |          y -> named_struct('doc_a', element_at(ids, i + 1), 'doc_b', y))))
       |    ELSE transform(slice(ids, 2, size(ids) - 1),
       |      y -> named_struct('doc_a', element_at(ids, 1), 'doc_b', y))
       |    END) t AS p),
       |sh AS (
       |  SELECT doc_id, shingle_set(text, $ShingleK) AS sh FROM elig
       |  WHERE doc_id IN (SELECT doc_a FROM cand
       |                   UNION SELECT doc_b FROM cand)),
       |ver AS (
       |  SELECT c.doc_a, c.doc_b,
       |    round(CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) /
       |          CAST(size(array_union(a.sh, b.sh)) AS DOUBLE), 6) AS jaccard
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, jaccard FROM ver WHERE jaccard >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The q113 SQL text — over whatever `events` view is registered. */
  private[graft] val sqlAsOfJoin: String =
    """WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |c0 AS (SELECT user_id, ts AS click_ts, event_id AS click_id,
      |    value AS click_value,
      |    row_number() OVER (PARTITION BY user_id, ts
      |      ORDER BY event_id DESC) AS _rn
      |  FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, click_ts, click_id, click_value
      |  FROM c0 WHERE _rn = 1),
      |u AS (
      |  SELECT user_id, ts AS _t, 1 AS _side, event_id, ts, purchase_value,
      |    CAST(NULL AS STRUCT<click_ts: TIMESTAMP, click_id: BIGINT,
      |      click_value: DOUBLE>) AS _r
      |  FROM p
      |  UNION ALL
      |  SELECT user_id, click_ts, 0, CAST(NULL AS BIGINT),
      |    CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE),
      |    named_struct('click_ts', click_ts, 'click_id', click_id,
      |      'click_value', click_value)
      |  FROM c),
      |w AS (SELECT *, last(_r, true) OVER (PARTITION BY user_id
      |    ORDER BY _t, _side
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof
      |  FROM u)
      |SELECT user_id, event_id, ts, purchase_value,
      |  _asof.click_ts AS click_ts, _asof.click_id AS click_id,
      |  _asof.click_value AS click_value
      |FROM w WHERE _side = 1 AND _asof IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** Per-PROCESS fixture directory for the gate entries that write to
    * disk (q77 JSONL round trip, q78 IVF store): the old sf-keyed path
    * was shared across concurrent gate runs — a Verify and a Bench
    * overlapping on the same SF would overwrite each other's fixtures
    * mid-read (ADVICE r8). The pid suffix isolates processes while
    * keeping within-process reuse (the q78 store is built once per
    * session and probed thereafter); a shutdown hook removes this
    * process's fixtures so repeated runs don't accumulate stores. */
  /** Root for all run-scoped fixture dirs (stream staging, replay
    * checkpoints/sinks, persisted gate stores). Overridable via
    * SPARK_GRAFT_FIXTURE_ROOT so the ephemeral replay plumbing can be
    * placed on fast scratch storage (e.g. tmpfs) — every dir under it
    * is pid-scoped, swept on shutdown, and rebuilt per process, so
    * nothing here ever carries results across runs. */
  private[graft] lazy val fixtureRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_ROOT",
      "/root/repo/target/graft-fixtures")

  private[graft] lazy val fixturePid: Long = {
    val pid = ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    val root = new java.io.File(fixtureRoot)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val mine = root.listFiles()
      if (mine != null) mine.filter(_.getName.endsWith(s"_p$pid")).foreach(rm)
    }))
    // ORPHAN SWEEP (VERDICT r10 item 8): the shutdown hook never runs
    // for a SIGKILL'd process (driver timeouts, OOM kills), so its
    // fixtures would accumulate across gate runs. On first fixture use,
    // remove directories whose owning pid is dead. Pid-reuse could make
    // an orphan look alive, so an age floor (1 day — far beyond any
    // gate run) removes those too. Never touches live recent dirs, so
    // concurrent Verify+Bench stay isolated exactly as before.
    val others = root.listFiles()
    if (others != null) others.foreach { f =>
      val name = f.getName
      val owner = name.lastIndexOf("_p") match {
        case -1 => None
        case i => name.drop(i + 2).toLongOption
      }
      val ownerDead = owner.exists(p =>
        p != pid && !ProcessHandle.of(p).map[java.lang.Boolean](_.isAlive)
          .orElse(java.lang.Boolean.FALSE))
      val stale = !owner.contains(pid) &&
        System.currentTimeMillis() - f.lastModified() > 86400000L
      if (ownerDead || stale) rm(f)
    }
    pid
  }

  /** Corpus-dir tag for fixture and store names: sanitized basename
    * PLUS a 48-bit sha-256 prefix of the absolute path (ADVICE r16:
    * two corpora with the same basename but different parent
    * directories must never share a persisted store; ADVICE r17: the
    * 32-bit String.hashCode used first had realistic birthday-collision
    * odds across many fixture dirs, and a collision silently aliases
    * EVERY fixtureDir user, not just the signature-guarded stores). */
  private[graft] def dirTag(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val base = new java.io.File(dir).getName.replaceAll("\\W", "_")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = sha.take(6).map(b => f"${b & 0xff}%02x").mkString
    s"${base}_$hex"
  }

  private def fixtureDir(tag: String, dir: String): String =
    s"$fixtureRoot/${tag}_${dirTag(dir)}_p$fixturePid"

  /** Persisted-store locations (table name, path) for the incremental
    * gates — shared with the SQL surface (QueryRunner's
    * graft_winnow_store_pairs / graft_band_store_dedup mat-views), so
    * the Scala gate and its SQL twin probe ONE store per (process,
    * corpus), the q99 build-once stance. */
  private[graft] def winnowStoreLoc(dir: String): (String, String) =
    (s"graft_winnow_store_${dirTag(dir)}_p$fixturePid",
      fixtureDir("q146", dir))
  private[graft] def bandStoreLoc(dir: String): (String, String) =
    (s"graft_band_store_${dirTag(dir)}_p$fixturePid",
      fixtureDir("q99", dir))
  private[graft] def bm25StoreLoc(dir: String): (String, String) =
    (s"graft_bm25_store_${dirTag(dir)}_p$fixturePid",
      fixtureDir("q180", dir))
  private[graft] def bm25StreamStoreLoc(dir: String): (String, String) =
    (s"graft_bm25_store_sink_${dirTag(dir)}_p$fixturePid",
      fixtureDir("q186s", dir))

  /** q81 gate patterns — RE2-compatible, chosen to MATCH the synthetic
    * corpus (see TextScrub.PiiPresets for the real PII classes). */
  private val ScanPatterns: Seq[(String, String)] = Seq(
    "agg_prefix" -> "agg\\w*",
    "table_word" -> "\\btable\\b",
    "the_word" -> "\\bthe\\b")

  /** The fixed source enum of the driver corpus (src0..src19 at every
    * SF) — pivot columns are config-known, not discovered (see
    * TextStats.langSourceCrosstab). */
  private val CrosstabSources: Seq[String] = (0 until 20).map(i => s"src$i")

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Q1–Q11 are self-contained via VALUES CTEs
    * generated from the same seeds the Spark side uses. */
  def oracleSql: Map[String, String] = Map(
    "q1_user_exists" ->
      s"WITH ${F.cteSysUsers} SELECT count(*) AS c FROM sys_users WHERE name = 'app_user'",
    "q2_granted_roles" ->
      s"WITH ${F.cteSysRoleGrants} SELECT granted_role_name FROM sys_role_grants WHERE user_name = 'app_user' ORDER BY granted_role_name",
    "q3_user_profiles" ->
      s"WITH ${F.cteSysSettingsProfileElements} SELECT inherit_profile FROM sys_settings_profile_elements WHERE user_name = 'app_user' ORDER BY inherit_profile",
    "q4_quota_by_member" ->
      s"WITH ${F.cteSysQuotas} SELECT name FROM sys_quotas WHERE array_contains(apply_to_list, 'app_user') ORDER BY name",
    "q4b_quota_by_member_has" ->
      s"WITH ${F.cteSysQuotas} SELECT name FROM sys_quotas WHERE array_contains(apply_to_list, 'app_user') ORDER BY name",
    "q5_quota_members" ->
      s"WITH ${F.cteSysQuotas} SELECT apply_to_list FROM sys_quotas WHERE name = 'custom_quota'",
    "q6_roles_to_grant" ->
      s"WITH ${F.cteDesiredRoles}, ${F.cteSysRoleGrants} SELECT d.role FROM desired_roles d WHERE NOT EXISTS (SELECT 1 FROM sys_role_grants g WHERE g.user_name = 'app_user' AND g.granted_role_name = d.role) ORDER BY d.role",
    "q7_invalid_grants" ->
      s"WITH ${F.cteRequestedGrants}, ${F.cteGrantAllowlist} SELECT g.grant_name FROM requested_grants g WHERE NOT EXISTS (SELECT 1 FROM grant_allowlist a WHERE upper(g.grant_name) = a.grant_upper OR g.grant_name = 'dictGet') ORDER BY g.grant_name",
    "q8_roles_to_revoke" ->
      s"WITH ${F.cteRequestedRevokes}, ${F.cteSysRoleGrants} SELECT r.role FROM requested_revokes r WHERE EXISTS (SELECT 1 FROM sys_role_grants g WHERE g.user_name = 'reader_role_user' AND g.granted_role_name = r.role) ORDER BY r.role",
    "q9_db_table_expansion" ->
      s"WITH ${F.cteSpecDatabases}, ${F.cteSpecTables} SELECT d.database, t.table_name FROM spec_databases d CROSS JOIN spec_tables t ORDER BY d.db_idx, t.tb_idx",
    "q10_quota_append" ->
      s"WITH ${F.cteSysQuotas} SELECT name, array_to_string(list_concat(apply_to_list, ['new_user']), ',') AS new_members FROM sys_quotas WHERE name = 'custom_quota'",
    "q11_hash_and_errors" ->
      s"WITH ${F.cteUserSpecs} SELECT user_name, sha256(user_password) AS pw_hash, regexp_extract(err_msg, 'DB::Exception.+\\.', 0) AS db_error FROM user_specs ORDER BY user_name",
    // Golden transcript of the playbook replay (README.md:116-124 template
    // shapes). The oracle derives app_user's hash with sha256() rather than
    // hardcoding it, mirroring playbook_example.yaml:46.
    "q15_playbook_transcript" ->
      ("""SELECT * FROM (VALUES
        | (0, 'db_admin', true, 'CREATE USER ''db_admin'' IDENTIFIED WITH sha256_hash BY ''a2015a1f1eb6a39f615b47de969376b367534b465a41dd7c98e5b1e00a3bdac1'''),
        | (0, 'db_admin', true, 'CREATE ROLE IF NOT EXISTS db_admin_role'),
        | (0, 'db_admin', true, 'GRANT db_admin_role to ''db_admin'''),
        | (1, 'app_user', true, 'CREATE USER ''app_user'' IDENTIFIED WITH sha256_hash BY ''' || sha256('appUserPass') || ''''),
        | (1, 'app_user', true, 'CREATE ROLE IF NOT EXISTS reader_role'),
        | (1, 'app_user', true, 'CREATE ROLE IF NOT EXISTS writer_role'),
        | (1, 'app_user', true, 'GRANT reader_role, writer_role to ''app_user'''),
        | (2, 'db_admin_role', true, 'GRANT ALL on default.* to ''db_admin_role'''),
        | (3, 'reader_role', true, 'GRANT SELECT, SHOW on main.* to ''reader_role'' WITH REPLACE OPTION'),
        | (4, 'writer_role', true, 'GRANT INSERT, UPDATE, OPTIMIZE on main.* to ''writer_role'' WITH REPLACE OPTION'),
        | (5, 'db_admin', false, ''),
        | (6, 'app_user', false, '')
        |) AS t(step, grantee, changed, statement) ORDER BY step, statement""".stripMargin.replace("\n", " ")),
    "q12_lineitem_agg" ->
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price, count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    // the SQL money_sum spelling shares q12's decimal-fold oracle
    "q118_sql_money_sum" ->
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price, count(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    // closed-form recomputation of the feature pipeline: the channel
    // mean S/(w·h) is float-exact cross-engine (S < 2^15 exact in
    // float; the quotient is dyadic-exact or far from any float
    // midpoint), and the cosine mirrors ArrayDot's sequential fold
    // term by term ([w,h,3,m,m,m,m,0] against the query's vector)
    "q119_media_feature_topk" ->
      """WITH d AS (SELECT doc_id, (doc_id % 7 + 8) AS w, (doc_id % 5 + 4) AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, w, h, ((x.i * 31 + y.i * 17 + doc_id) % 256) AS v
        |  FROM d, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)),
        |f AS (SELECT doc_id, w::DOUBLE AS wd, h::DOUBLE AS hd,
        |    CAST(sum(v)::DOUBLE / (w * h) AS REAL)::DOUBLE AS m
        |  FROM px GROUP BY doc_id, w, h),
        |n AS (SELECT doc_id, wd, hd, m,
        |    sqrt(wd*wd + hd*hd + 9.0 + m*m + m*m + m*m + m*m) AS nrm FROM f),
        |q AS (SELECT * FROM n WHERE doc_id = 0)
        |SELECT n.doc_id AS media_id,
        |  round((n.wd*q.wd + n.hd*q.hd + 9.0 + n.m*q.m + n.m*q.m + n.m*q.m
        |    + n.m*q.m) / (n.nrm * q.nrm), 6) AS cos
        |FROM n, q WHERE n.doc_id <> q.doc_id
        |ORDER BY cos DESC, media_id LIMIT 10""".stripMargin.replace("\n", " "),
    "q13_top_nations" ->
      "SELECT n.n_name, count(*) AS num_customers, CAST(sum(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_bal FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY total_bal DESC, n.n_name LIMIT 10",
    "q14_events_agg" ->
      "SELECT event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' GROUP BY event_type ORDER BY event_type",
    // --- LLM-pipeline oracles (exact Spark↔DuckDB parity; see
    //     pipeline/PipelineOracles.scala for the portability contract) ---
    "q16_exact_dedup" -> PO.exactDedup,
    "q17_dedup_keep_first" -> PO.dedupKeepFirst,
    "q18_minhash_signatures" -> PO.minhashSignatures,
    "q19_lsh_near_dups" -> PO.lshNearDups(0.8),
    "q20_simhash" -> PO.simhash,
    "q21_ngram_jaccard" -> PO.ngramJaccard(100L, 0.5),
    "q22_cosine_topk" -> PO.cosineTopK(0L, 10),
    "q23_cosine_bucket_topk" -> PO.bucketTopK(0L, 10, 4),
    "q24_lang_id" -> PO.langIdSummary,
    "q25_quality_scores" -> PO.qualityScores(50L),
    "q26_token_counts" -> PO.tokenCounts,
    "q27_fingerprints" -> PO.fingerprints(50L),
    "q28_multimodal_meta" -> PO.multimodalMeta,
    "q29_cosine_near_dups" -> PO.cosineNearDupsAuto(0.4, 125L),
    // all-probes IVF == brute force: the q22 exact-top-k oracle verbatim
    "q38b_ivf_exact" -> PO.cosineTopK(0L, 10),
    // all-probes through the PERSISTED store == brute force too
    "q78_ivf_store_probe" -> PO.cosineTopK(0L, 10),
    // full hamming ball through the sign-bucket store == brute force
    "q94_multiprobe_exact" -> PO.cosineTopK(0L, 10),
    // salted join must be row-identical to the plain join — q32's
    // oracle verbatim
    "q79_salted_join" ->
      """SELECT o_orderpriority, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " "),
    // the forced-salt spelling grades against the identical oracle
    "q131_salted_join_forced" ->
      """SELECT o_orderpriority, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " "),
    // one UNION ALL branch per gate pattern — same RE2-subset regexes,
    // so Java regex and DuckDB RE2 count identical matches
    "q81_pattern_scan" ->
      """WITH m AS (
        | SELECT source, 'agg_prefix' AS pattern,
        |   len(regexp_extract_all(text, 'agg\w*')) AS m FROM documents
        | UNION ALL SELECT source, 'table_word',
        |   len(regexp_extract_all(text, '\btable\b')) FROM documents
        | UNION ALL SELECT source, 'the_word',
        |   len(regexp_extract_all(text, '\bthe\b')) FROM documents)
        |SELECT source, pattern,
        |  sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_hit,
        |  sum(m)::BIGINT AS n_matches
        |FROM m GROUP BY 1, 2 ORDER BY source, pattern""".stripMargin.replace("\n", " "),
    // keep-best representative over the same recursive clusters
    "q82_cluster_keep_best" -> PO.clusterDedupKeepBest(0.8).replace("\n", " "),
    // the pure-SQL keep-best spelling shares q82's oracle verbatim
    "q117_sql_cluster_keep_best" ->
      PO.clusterDedupKeepBest(0.8).replace("\n", " "),
    // four-table star: same revenue arithmetic as q32, one year()
    // bucketing — both engines' year() cast to BIGINT
    "q87_nation_year_revenue" ->
      """SELECT n.n_name, year(o.o_orderdate)::BIGINT AS order_year,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY n.n_name, order_year
        |ORDER BY n.n_name, order_year""".stripMargin.replace("\n", " "),
    // the q15 user-step golden strings, reordered to the streaming
    // writer's userName-order determinism rule
    "q89_streaming_reconcile" ->
      ("""SELECT * FROM (VALUES
        | ('app_user', true, 'CREATE USER ''app_user'' IDENTIFIED WITH sha256_hash BY ''' || sha256('appUserPass') || ''''),
        | ('app_user', true, 'CREATE ROLE IF NOT EXISTS reader_role'),
        | ('app_user', true, 'CREATE ROLE IF NOT EXISTS writer_role'),
        | ('app_user', true, 'GRANT reader_role, writer_role to ''app_user'''),
        | ('db_admin', true, 'CREATE USER ''db_admin'' IDENTIFIED WITH sha256_hash BY ''a2015a1f1eb6a39f615b47de969376b367534b465a41dd7c98e5b1e00a3bdac1'''),
        | ('db_admin', true, 'CREATE ROLE IF NOT EXISTS db_admin_role'),
        | ('db_admin', true, 'GRANT db_admin_role to ''db_admin''')
        |) AS t(grantee, changed, statement)
        |ORDER BY grantee, statement""".stripMargin.replace("\n", " ")),
    // the q15 grant-step golden strings (steps 2–4: D6 role grant +
    // two D8 REPLACE-OPTION privilege grants), reordered to the
    // grants writer's granteeName-order determinism rule
    "q92_streaming_grants" ->
      ("""SELECT * FROM (VALUES
        | ('db_admin_role', true, 'GRANT ALL on default.* to ''db_admin_role'''),
        | ('reader_role', true, 'GRANT SELECT, SHOW on main.* to ''reader_role'' WITH REPLACE OPTION'),
        | ('writer_role', true, 'GRANT INSERT, UPDATE, OPTIMIZE on main.* to ''writer_role'' WITH REPLACE OPTION')
        |) AS t(grantee, changed, statement)
        |ORDER BY grantee, statement""".stripMargin.replace("\n", " ")),
    // streaming tumbling windows align to the epoch → batch equivalent
    // is an hour-truncated GROUP BY
    "q88_streaming_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 6) AS total
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin.replace("\n", " "),
    // stream-stream interval join: the batch spelling of the same
    // attribution join, per-user rollup (q88's round-6 double-sum
    // convention on the value column)
    "q132_stream_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs,
        |  round(sum(p.value), 6) AS purchase_total
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.user_id = c.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin.replace("\n", " "),
    // left-outer twin: unmatched clicks keep their row with a zero
    // contribution; n_matched counts the genuinely joined pairs
    "q133_stream_outer_join" ->
      """SELECT c.user_id, count(*) AS n_pairs,
        |  count(p.ts) AS n_matched,
        |  round(sum(coalesce(p.value, 0)), 6) AS purchase_total
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin.replace("\n", " "),
    // the many-wave spelling completes the SAME pairs from join state
    // across micro-batches — q132's batch oracle verbatim
    "q137_stream_join_waves" ->
      """SELECT c.user_id, count(*) AS n_pairs,
        |  round(sum(p.value), 6) AS purchase_total
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.user_id = c.user_id AND p.ts >= c.ts
        |  AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin.replace("\n", " "),
    // 13-gram decontamination, natural corpus: same '#dc' 60-bit
    // shingle hash and '#eval' split hash as the Spark side
    "q134_decontamination" -> deconOracleSql(plant = false),
    // planted twin: the banner CASE is mirrored verbatim
    "q135_decontamination_planted" -> deconOracleSql(plant = true),
    // eval-side detail at 13-gram: same CTEs as q135, joined inner
    // and rolled up per eval doc
    "q138_contaminated_evals13" -> deconEvalDetailSql,
    // winnowing: positional '#wn' gram hashes, padded-string window
    // min, full windows only — selection + tie-break pinned by sums
    "q139_winnow_fingerprints" -> winnowStatsSql,
    // df-bounded fingerprint pairing (2 <= df <= 8, >= 5 shared)
    "q140_winnow_overlap" -> winnowOverlapSql,
    // decontamination apply: semi-join hit set, anti-join keep,
    // '#ka' content hash over the kept corpus
    "q141_decontaminate_apply" -> deconApplySql,
    // ranked neighbors: the q140 pairs symmetrized + QUALIFY top-3
    "q142_winnow_neighbors" -> winnowNeighborsSql,
    // SQL-surface spellings of the apply and pair tiers: the views'
    // plans ARE the Scala operators, so they share the same oracles
    "q143_sql_decontaminate" -> deconApplySql,
    "q144_sql_winnow_pairs" -> winnowOverlapSql,
    // winnow apply: recursive-CC over the pair CTEs, keep-best rank,
    // '#wk' content hash over the kept corpus, zero-filled spine
    "q145_winnow_apply" -> winnowApplySql,
    // store-incremental winnow: '#inc' hash split, base-df bound,
    // delta×base pairing — recomputed from scratch (store == batch)
    "q146_winnow_store_incr" -> winnowStoreIncrSql,
    // streaming admission must equal the batch apply on the same
    // corpus: q141's oracle verbatim
    "q147_stream_decontaminate" -> deconApplySql,
    // the SQL spelling of the winnow apply shares q145's oracle
    "q148_sql_winnow_apply" -> winnowApplySql,
    // store admission: q146's CTEs, flagged = distinct delta docs in
    // a pair, '#wa' hash over the admitted batch, delta spine
    "q149_winnow_store_admit" -> winnowStoreAdmitSql,
    // span attribution: islands-and-gaps over the matched (pair,
    // side, pos) set — LAG marks breaks beyond the span gap, running
    // SUM assigns island ids, per-island min/max/count
    "q150_winnow_spans" -> winnowSpansSql,
    // the SQL spelling shares q150's oracle (lockstep)
    "q151_sql_winnow_spans" -> winnowSpansSql,
    // store probe from SQL shares q146's oracle (store == SQL)
    "q152_sql_winnow_store" -> winnowStoreIncrSql,
    // band-store dedup from SQL shares q68/q99's oracle
    "q153_sql_band_store" ->
      PO.incrementalDedup(10L, 0.8).replace("\n", " "),
    // store-side span attribution: q146's CTEs + the q150
    // islands-and-gaps over matched (pair, side, pos)
    "q154_winnow_store_spans" -> winnowStoreSpansSql,
    // the SQL spelling shares q154's oracle (lockstep)
    "q155_sql_winnow_store_spans" -> winnowStoreSpansSql,
    // span-level scrub: CC + keep-best losers, per-doc position
    // union, LAG/SUM islands, then the scrubbed texts REBUILT by
    // token slicing and re-hashed — every byte recomputed in DuckDB
    "q156_winnow_scrub" -> winnowScrubSql,
    // the SQL spelling shares q156's oracle (lockstep)
    "q157_sql_winnow_scrub" -> winnowScrubSql,
    // streaming winnow admission shares q149's oracle verbatim
    // (ingest-time == batch, the q147/q141 precedent)
    "q158_stream_winnow_admit" -> winnowStoreAdmitSql,
    // the TVF spelling at gate-standard arguments shares q140's
    // oracle (lockstep with q144's view spelling)
    "q159_sql_winnow_pairs_tvf" -> winnowOverlapSql,
    // TVF spellings of the LSH pair tier and cosine search share
    // q19's / q22's oracles at gate-standard arguments
    "q160_sql_lsh_tvf" -> PO.lshNearDups(0.8),
    "q161_sql_cosine_topk_tvf" -> PO.cosineTopK(0L, 10),
    // per-doc scrub artifact: the scrub CTEs' sc rows with per-doc
    // '#wd' hashes (q156's digest is a rollup of the same recompute)
    "q162_winnow_scrubbed_docs" -> winnowScrubbedDocsSql,
    // the SQL spelling shares q162's oracle (lockstep)
    "q163_sql_winnow_scrubbed_docs" -> winnowScrubbedDocsSql,
    // same '#nv' 60-bit shingle hash both sides (q64's construction);
    // first occurrence = min(doc_id) per hash; int counts, one divide
    "q86_novelty" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(list_transform(
        |    range(1, len(t)-1), i -> ('0x'||substr(sha256(
        |    array_to_string(t[i:i+2], ' ')||'#nv'),1,15))::BIGINT))) AS g FROM tk),
        |f AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
        |pd AS (SELECT sh.source, sh.doc_id, count(*) AS n_sh,
        |  sum(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END) AS n_novel
        |  FROM sh JOIN f USING (g) GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  round(sum(n_novel)::DOUBLE / sum(n_sh), 6) AS novel_shingle_frac
        |FROM pd GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // DuckDB native ASOF + the same integer-microsecond age filter;
    // q40's pre-dedup of right-side ties carries over unchanged
    "q84_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts AS click_ts, event_id AS click_id, value AS click_value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, click_ts, click_id, click_value FROM c0 WHERE rn = 1)
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
        |  c.click_ts, c.click_id, c.click_value
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |WHERE epoch_us(p.ts) - epoch_us(c.click_ts) <= 3600000000::BIGINT
        |ORDER BY p.event_id""".stripMargin.replace("\n", " "),
    // exact columns + the in-contract invariant (TRUE expected) — the
    // sketch itself never crosses engines
    "q85_quantile_guard" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50_exact,
        |  true AS within_bounds
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " "),
    // integer-exact funnel rules (cross-multiplied thresholds), same
    // whitespace tokenization as q48
    "q83_filter_funnel" ->
      """WITH d AS (SELECT source, len(string_split(text, ' '))::BIGINT AS n,
        |  (len(string_split(text, ' ')) -
        |   len(list_distinct(string_split(text, ' '))))::BIGINT AS dups
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  sum(CASE WHEN n >= 30 THEN 1 ELSE 0 END)::BIGINT AS n_pass_len,
        |  sum(CASE WHEN n >= 30 AND dups * 100 <= n * 40 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_pass_all
        |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // the file-source streaming spelling: Append output == batch
    // sessionization, q41's oracle verbatim (q80's former gate — the
    // MemoryStream twin is spec-only since r15)
    "q116_filestream_sessionize" ->
      sessionizeOracle,
    // the many-wave ingress spelling shares the same batch oracle:
    // late-but-in-budget files must not change Append output
    "q127_filestream_waves" -> sessionizeOracle,
    // quarantine-rate guard: per-family counts recomputed from the
    // disjoint id ranges (q114's arithmetic pattern); the rate flag is
    // TRUE expected — Spark computes it from its own observed decode
    // outcomes, so a codec regression hash-mismatches
    "q129_quarantine_rate_guard" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100)
        |SELECT * FROM (
        |SELECT 'avi_dib' AS family, count(*)::BIGINT AS n_total,
        |  count(*)::BIGINT AS n_decoded, 0::BIGINT AS n_quarantined,
        |  true AS decode_rate_ok FROM ids WHERE id >= 40 AND id < 60
        |UNION ALL SELECT 'g711_alaw_wav', count(*)::BIGINT,
        |  count(*)::BIGINT, 0::BIGINT, true FROM ids WHERE id >= 80
        |UNION ALL SELECT 'g711_ulaw_wav', count(*)::BIGINT,
        |  count(*)::BIGINT, 0::BIGINT, true FROM ids WHERE id >= 60 AND id < 80
        |UNION ALL SELECT 'mp4_codecless', count(*)::BIGINT, 0::BIGINT,
        |  count(*)::BIGINT, true FROM ids WHERE id < 40 AND id % 5 = 4
        |UNION ALL SELECT 'mpeg_codecless', count(*)::BIGINT, 0::BIGINT,
        |  count(*)::BIGINT, true FROM ids WHERE id < 40 AND id % 5 = 3
        |UNION ALL SELECT 'png_corrupt', count(*)::BIGINT, 0::BIGINT,
        |  count(*)::BIGINT, true FROM ids WHERE id < 40 AND id % 5 = 1
        |UNION ALL SELECT 'png_valid', count(*)::BIGINT, count(*)::BIGINT,
        |  0::BIGINT, true FROM ids WHERE id < 40 AND id % 5 = 0
        |UNION ALL SELECT 'wav_pcm', count(*)::BIGINT, count(*)::BIGINT,
        |  0::BIGINT, true FROM ids WHERE id < 40 AND id % 5 = 2
        |) ORDER BY family""".stripMargin.replace("\n", " "),
    // IVF recall ladder: the sampled-query count is exact SQL — the
    // oracle recomputes the derived queryMod (ceil(n/512), the
    // sizedQueryMod identity) from count(*), keeping the sizing in
    // lockstep at any scale; the monotonicity and full-probe-endpoint
    // invariants are TRUE expected (the q85 pattern — k-means recall
    // cannot cross engines)
    "q128_ivf_recall_ladder" ->
      """SELECT v.nprobe, q.n_queries, true AS monotone_ok,
        |  true AS exact_at_full_probe
        |FROM (VALUES (1), (2), (4), (8)) AS v(nprobe)
        |CROSS JOIN (
        |  SELECT count(*)::BIGINT AS n_queries FROM embeddings
        |  WHERE vec_id % (SELECT greatest(1, (count(*) + 511) // 512)
        |                  FROM embeddings) = 0) q
        |ORDER BY v.nprobe""".stripMargin.replace("\n", " "),
    // HLL guard: exact columns + the in-bounds invariant (TRUE expected)
    "q39b_dedup_approx_guard" ->
      "SELECT source, count(*) AS n_docs, true AS within_bounds FROM documents GROUP BY source ORDER BY source",
    "q33_simhash_near_dups" -> PO.simhashNearDups(3),
    "q36_dedup_clusters" -> PO.dedupClusters(0.8),
    // the pure-SQL clustering spelling shares q36's oracle verbatim
    "q115_sql_dedup_clusters" -> PO.dedupClusters(0.8),
    "q37_cluster_dedup_kept" -> PO.clusterDedupKept(0.8),
    "q35_knn_join" -> PO.bucketKnnJoinAuto(3, 125L),
    "q34_events_monthly" ->
      """SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month, event_type,
        | count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_value
        |FROM events GROUP BY month, event_type ORDER BY month, event_type""".stripMargin.replace("\n", " "),
    "q30_window_topn" ->
      """SELECT * FROM (SELECT n.n_name, c.c_custkey, c.c_acctbal,
        | row_number() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
        | FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) t
        |WHERE rn <= 3 ORDER BY n_name, rn""".stripMargin.replace("\n", " "),
    "q31_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin.replace("\n", " "),
    "q32_join_revenue" ->
      """SELECT o_orderpriority, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " "),
    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // implementation (inclusive >=, inner semantics, right pre-deduped
    // per (user, ts) on both sides for a deterministic match)
    "q40_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts AS click_ts, event_id AS click_id, value AS click_value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, click_ts, click_id, click_value FROM c0 WHERE rn = 1)
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
        |  c.click_ts, c.click_id, c.click_value
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin.replace("\n", " "),
    // the pure-SQL as-of spelling must reproduce the same native-ASOF
    // answer — q40's oracle verbatim
    "q113_sql_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts AS click_ts, event_id AS click_id, value AS click_value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, click_ts, click_id, click_value FROM c0 WHERE rn = 1)
        |SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
        |  c.click_ts, c.click_id, c.click_value
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin.replace("\n", " "),
    // arithmetic recomputation of the quarantine audit: residue class
    // doc_id%5 determines each planted payload's decode outcome by
    // construction, so every count, quarantined byte total (16 per
    // truncated PNG, id%20+30 per garbage row), and decoded checksum
    // (q76's red-sum closed form over class 0, q96's sample-sum closed
    // form over class 2) is derivable without running any codec
    "q114_codec_quarantine" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 40),
        |png_px AS (SELECT id, ((x.i * 31 + y.i * 17 + id) % 256) AS v
        |  FROM (SELECT id, (id % 7 + 8) AS w, (id % 5 + 4) AS h
        |        FROM ids WHERE id % 5 = 0) d,
        |  unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i)),
        |wav_s AS (SELECT id, ((i.i * 37 + id * 11) % 2003 - 1001) AS v
        |  FROM (SELECT id, (id % 50 + 100) AS n FROM ids WHERE id % 5 = 2) d,
        |  unnest(range(0, n)) AS i(i))
        |SELECT 'audio/mpeg' AS media_type, count(*)::BIGINT AS n_total,
        |  0::BIGINT AS n_decoded, count(*)::BIGINT AS n_quarantined,
        |  coalesce(sum(id % 20 + 30), 0)::BIGINT AS quarantined_bytes,
        |  0::BIGINT AS decoded_checksum FROM ids WHERE id % 5 = 3
        |UNION ALL SELECT 'audio/wav', count(*)::BIGINT, count(*)::BIGINT,
        |  0::BIGINT, 0::BIGINT,
        |  (SELECT coalesce(sum(v), 0)::BIGINT FROM wav_s)
        |  FROM ids WHERE id % 5 = 2
        |UNION ALL SELECT 'image/png',
        |  (SELECT count(*) FROM ids WHERE id % 5 IN (0, 1))::BIGINT,
        |  (SELECT count(*) FROM ids WHERE id % 5 = 0)::BIGINT,
        |  (SELECT count(*) FROM ids WHERE id % 5 = 1)::BIGINT,
        |  (SELECT 16 * count(*) FROM ids WHERE id % 5 = 1)::BIGINT,
        |  (SELECT coalesce(sum(v), 0)::BIGINT FROM png_px)
        |UNION ALL SELECT 'video/mp4', count(*)::BIGINT, 0::BIGINT,
        |  count(*)::BIGINT, coalesce(sum(id % 20 + 30), 0)::BIGINT,
        |  0::BIGINT FROM ids WHERE id % 5 = 4
        |ORDER BY media_type""".stripMargin.replace("\n", " "),
    // gap sessionization: interval comparison (never epoch subtraction —
    // exact at both engines' timestamp precisions); session membership
    // is tie-order-independent (equal timestamps always co-session)
    "q41_sessionize" ->
      sessionizeOracle,
    // quantile_cont == Spark percentile(): both exact sort-based with
    // linear interpolation
    "q42_doc_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.25), 6) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 6) AS p75,
        |  round(avg(n_chars), 6) AS mean_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " "),
    "q43_top_terms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, count(*) AS n, count(DISTINCT doc_id) AS df
        |FROM t WHERE length(term) > 0
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin.replace("\n", " "),
    // same 60-bit shingle hash (seed 'dc') on both sides → exact parity
    "q44_decontamination" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, list_distinct(list_transform(range(1, len(t)-1),
        |  i -> array_to_string(t[i:i+2], ' '))) AS s FROM tk),
        |hs AS (SELECT doc_id, source,
        |  list_transform(s, x -> ('0x'||substr(sha256(x||'#dc'),1,15))::BIGINT) AS h FROM sh),
        |ev AS (SELECT DISTINCT unnest(h) AS g FROM hs WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, source, h FROM hs WHERE doc_id % 10 <> 0),
        |trg AS (SELECT doc_id, unnest(h) AS g FROM tr),
        |hit AS (SELECT DISTINCT doc_id FROM trg JOIN ev USING (g))
        |SELECT source, count(*) AS n_train,
        |  sum(CASE WHEN doc_id IN (SELECT doc_id FROM hit) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_contaminated
        |FROM tr GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    "q45_stratified_sample" ->
      """SELECT source, count(*) AS n_total,
        |  sum(CASE WHEN ('0x'||substr(sha256(doc_id::VARCHAR||'#samp'),1,15))::BIGINT % 100 <
        |    (CASE WHEN source = 'src3' THEN 50 WHEN source = 'src7' THEN 0 ELSE 10 END)
        |  THEN 1 ELSE 0 END)::BIGINT AS n_sampled
        |FROM documents GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // integer division on the pre-doc cumulative token count — the
    // chunk-boundary packing assignment, identical on both engines
    "q46_pack_sequences" ->
      """WITH t AS (SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS toks
        |  FROM documents),
        |c AS (SELECT source, doc_id, toks,
        |  sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT source, ((cum - toks) // 512)::BIGINT AS seq,
        |  count(*) AS n_docs, sum(toks)::BIGINT AS n_tokens
        |FROM c GROUP BY source, seq ORDER BY source, seq""".stripMargin.replace("\n", " "),
    // JSON path extraction: props->>'k' == Spark get_json_object($.k);
    // sum_k stays integral (exact), only avg(value) needs the round
    "q47_json_props" ->
      """SELECT event_type, (cast(props->>'k' AS BIGINT) // 10)::BIGINT AS k_decile,
        | count(*) AS n, sum(cast(props->>'k' AS BIGINT))::BIGINT AS sum_k,
        | round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_value
        |FROM events GROUP BY event_type, k_decile
        |ORDER BY event_type, k_decile""".stripMargin.replace("\n", " "),
    // repetition signals: integer numerator/denominator sums, ONE final
    // divide — cross-row double summation is order-dependent, int sums
    // are exact on both engines
    "q48_repetition" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |d AS (SELECT doc_id, source, len(t)::BIGINT AS n,
        |  (len(t) - len(list_distinct(t)))::BIGINT AS dups FROM tk),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |  i -> t[i] || ' ' || t[i+1])) AS bg FROM tk WHERE len(t) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM u GROUP BY doc_id, bg),
        |m AS (SELECT doc_id, max(c) AS maxc FROM c GROUP BY doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  round(sum(d.dups)::DOUBLE / sum(d.n), 6) AS dup_token_frac,
        |  round(sum(coalesce(m.maxc, 0))::DOUBLE / sum(greatest(d.n - 1, 1)), 6)
        |    AS top_bigram_frac
        |FROM d LEFT JOIN m USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin.replace("\n", " "),
    // same 60-bit shingle hash (seed 'ov') both sides; int counts + one
    // divide → exact parity
    "q49_source_overlap" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT source, ('0x'||substr(sha256(
        |    array_to_string(t[i:i+2], ' ')||'#ov'),1,15))::BIGINT AS g
        |  FROM tk, unnest(range(1, len(t)-1)) AS r(i)),
        |s AS (SELECT DISTINCT source, g FROM sh),
        |sz AS (SELECT source, count(*) AS n FROM s GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
        |  FROM s a JOIN s b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, shared::BIGINT AS shared,
        |  round(shared::DOUBLE / (x.n + y.n - shared), 6) AS jaccard
        |FROM p JOIN sz x ON source_a = x.source JOIN sz y ON source_b = y.source
        |ORDER BY source_a, source_b""".stripMargin.replace("\n", " "),
    "q50_moving_avg" ->
      """WITH d AS (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  sum(value) AS v, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n, round(v, 6) AS day_total,
        |  round(avg(v) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        |FROM d ORDER BY event_type, day""".stripMargin.replace("\n", " "),
    // argMax oracle spelled as row_number (DuckDB arg_max takes no
    // struct tie-breaker); same (value, event_id) total order
    "q51_arg_max" ->
      """WITH r AS (SELECT user_id, event_type, event_id, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY value DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_events FROM events)
        |SELECT user_id, event_type AS top_type, round(value, 6) AS top_value,
        |  event_id AS top_event_id, n_events
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin.replace("\n", " "),
    // funnel oracle spelled as the three-way self-join (stepwise mins);
    // the Spark side computes the identical math in one sorted fold
    "q52_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY e.user_id)
        |SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |  WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |  count(*)::BIGINT AS n_users
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |GROUP BY depth ORDER BY depth""".stripMargin.replace("\n", " "),
    // day-grained retention: distinct (user, day) then min-day cohort;
    // date_diff('day') on day-truncated stamps == Spark datediff
    "q54_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cd FROM ud GROUP BY user_id)
        |SELECT strftime(c.cd, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', c.cd, ud.d) AS day_offset,
        |  count(DISTINCT ud.user_id) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),
    // TF-IDF: integer tf/df, ONE ln() per term, rank on the ROUNDED
    // score with term tie-break (rank insensitive to libm ulp)
    "q55_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |dt AS (SELECT doc_id, source, term, count(*) AS c FROM tok
        |  WHERE length(term) > 0 GROUP BY 1, 2, 3),
        |tf AS (SELECT source, term, sum(c)::BIGINT AS tf FROM dt GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |s AS (SELECT tf.source, tf.term, tf.tf, df.df,
        |  round(tf.tf * ln(n.n_total::DOUBLE / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (term), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY tfidf DESC, term) AS rn FROM s)
        |SELECT source, term, tf, df, tfidf, rn FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin.replace("\n", " "),
    // unigram quality: integer counts/comparisons, sort-based medians,
    // one final divide — exact parity by construction
    "q57_unigram_quality" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |dt AS (SELECT doc_id, source, term, count(*) AS c FROM tok
        |  WHERE length(term) > 0 GROUP BY 1, 2, 3),
        |v AS (SELECT term, sum(c)::BIGINT AS cnt FROM dt GROUP BY 1),
        |j AS (SELECT dt.doc_id, dt.source, dt.c, v.cnt FROM dt JOIN v USING (term)),
        |d AS (SELECT doc_id, source, sum(c)::BIGINT AS n_toks,
        |  sum(CASE WHEN cnt < 5 THEN c ELSE 0 END)::BIGINT AS n_rare,
        |  quantile_cont(cnt, 0.5) AS med_freq FROM j GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  round(sum(n_rare)::DOUBLE / sum(n_toks), 6) AS rare_token_rate,
        |  round(quantile_cont(med_freq, 0.5), 6) AS p50_med_freq
        |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // embedding cluster dedup: recursive min-label CTE over cosine pairs
    "q58_embedding_dedup" -> PO.embeddingClusterKeptAuto(0.4, 125L),
    // pivot spelled as CASE-sums — same explicit column enum
    "q56_lang_source_pivot" -> {
      val cols = CrosstabSources.map(s =>
        s"sum(CASE WHEN source = '$s' THEN 1 ELSE 0 END)::BIGINT AS $s")
        .mkString(", ")
      s"SELECT lang, $cols FROM documents GROUP BY lang ORDER BY lang"
    },
    // same sequential square-sum fold as the q22 norm (bit-equal);
    // min/max/quantile_cont are all order-independent
    "q53_norm_profile" ->
      """WITH n AS (SELECT label, sqrt(list_reduce(list_transform(embedding,
        |  v -> v::DOUBLE * v::DOUBLE), (x, y) -> x + y)) AS norm FROM embeddings)
        |SELECT label, count(*) AS n, round(min(norm), 6) AS min_norm,
        |  round(max(norm), 6) AS max_norm,
        |  round(quantile_cont(norm, 0.5), 6) AS p50_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin.replace("\n", " "),
    // chunking: starts are 0, stride, … while < len(toks); both slicers
    // are 1-based-inclusive and clamp at the end, so the final short
    // chunk agrees by construction
    "q59_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |  unnest(generate_series(0, len(toks) - 1, 24)) AS start FROM t)
        |SELECT doc_id, (start // 24)::BIGINT AS chunk_idx,
        |  least(32, len(toks) - start)::BIGINT AS n_tokens,
        |  array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "),
    // α=0.5 spelled sqrt(): IEEE sqrt is correctly rounded, so both
    // engines agree bit-for-bit (pow(x,0.5) might not); the window sums
    // run over the |sources|-row post-agg frame
    // denominator folded in SOURCE order (list_reduce over an ORDER BY
    // list) — mirrors the Spark side's sorted sequential aggregate, so
    // the cross-row double sum is bit-identical, not engine-ordered
    "q60_mixture_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT list_reduce(list(sqrt(n_tokens::DOUBLE) ORDER BY source),
        |    (a, b) -> a + b) AS denom,
        |  sum(n_tokens)::BIGINT AS tot_tokens FROM s)
        |SELECT source, n_docs, n_tokens,
        |  round(sqrt(n_tokens::DOUBLE) / denom, 6) AS mix_weight,
        |  round(sqrt(n_tokens::DOUBLE) / denom * tot_tokens / n_tokens, 6)
        |    AS epochs
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin.replace("\n", " "),
    // normalization parity: NFC (byte-level parity gated by q102),
    // then Java \s == RE2 \s on the corpus charset (plain ASCII
    // spaces); sha256 hex is lowercase in both
    "q61_normalized_dedup" ->
      """WITH n AS (SELECT source, sha256(text) AS raw_h,
        |  sha256(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS norm_h
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(DISTINCT raw_h) AS n_unique_raw,
        |  count(DISTINCT norm_h) AS n_unique_norm
        |FROM n GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // same portable 60-bit hash as q45 (sha256 prefix), rank ties
    // broken on doc_id so the sample is total-order deterministic
    "q62_fixed_k_sample" ->
      """WITH h AS (SELECT source, doc_id,
        |  ('0x'||substr(sha256(doc_id::VARCHAR||'#fk'),1,15))::BIGINT AS hk
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT source, doc_id, rn FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin.replace("\n", " "),
    // same sequential fold + d·d spelling as the Spark side; the scale
    // expression (127.0/max_abs) keeps the identical association order
    "q63_quantization_error" ->
      """WITH q AS (SELECT label,
        |  list_transform(embedding, v -> v::DOUBLE) AS ed FROM embeddings),
        |m AS (SELECT label, ed,
        |  list_max(list_transform(ed, v -> abs(v))) AS max_abs,
        |  sqrt(list_reduce(list_transform(ed, v -> v * v),
        |    (x, y) -> x + y)) AS norm FROM q),
        |e AS (SELECT label, CASE WHEN max_abs = 0 OR norm = 0 THEN 0.0
        |  ELSE sqrt(list_reduce(list_transform(ed,
        |    v -> (v - round(v * (127.0/max_abs)) / (127.0/max_abs))
        |       * (v - round(v * (127.0/max_abs)) / (127.0/max_abs))),
        |    (x, y) -> x + y)) / norm END AS qerr FROM m)
        |SELECT label, count(*) AS n, round(min(qerr), 6) AS min_qerr,
        |  round(max(qerr), 6) AS max_qerr,
        |  round(quantile_cont(qerr, 0.5), 6) AS p50_qerr
        |FROM e GROUP BY label ORDER BY label""".stripMargin.replace("\n", " "),
    // distinct 3-shingles per doc (hash seed 'xd'), df>1 = shared with
    // another doc; integer counts, one divide
    "q64_crossdoc_share" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(list_transform(
        |    range(1, len(t)-1), i -> ('0x'||substr(sha256(
        |    array_to_string(t[i:i+2], ' ')||'#xd'),1,15))::BIGINT))) AS g FROM tk),
        |d2 AS (SELECT doc_id, source, count(*) OVER (PARTITION BY g) AS ddf FROM sh),
        |pd AS (SELECT doc_id, source, count(*) AS n_sh,
        |  sum(CASE WHEN ddf > 1 THEN 1 ELSE 0 END) AS n_shared
        |  FROM d2 GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |  round(sum(n_shared)::DOUBLE / sum(n_sh), 6) AS shared_shingle_frac
        |FROM pd GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // same portable 60-bit hash (seed 'split'); 80/10/10 split
    "q65_train_split" ->
      """WITH h AS (SELECT source,
        |  ('0x'||substr(sha256(doc_id::VARCHAR||'#split'),1,15))::BIGINT % 100 AS hm,
        |  len(string_split(text, ' ')) AS toks FROM documents)
        |SELECT source,
        |  CASE WHEN hm < 80 THEN 'train' WHEN hm < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, sum(toks)::BIGINT AS n_tokens
        |FROM h GROUP BY 1, 2 ORDER BY source, split""".stripMargin.replace("\n", " "),
    // same portable 60-bit hash (seed 'shard'); 16 shards
    "q66_hash_shards" ->
      """WITH h AS (SELECT
        |  ('0x'||substr(sha256(doc_id::VARCHAR||'#shard'),1,15))::BIGINT % 16 AS shard,
        |  len(string_split(text, ' '))::BIGINT AS toks FROM documents)
        |SELECT shard, count(*) AS n_docs, sum(toks)::BIGINT AS n_tokens,
        |  min(toks) AS min_doc_toks, max(toks) AS max_doc_toks
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin.replace("\n", " "),
    "q67_minhash_audit" ->
      PO.minhashEstimateAudit(0.8).replace("\n", " "),
    "q68_incremental_dedup" ->
      PO.incrementalDedup(10L, 0.8).replace("\n", " "),
    // store == memory == DuckDB: the persisted-band-store path must
    // produce exactly the q68 summary
    "q99_band_store_dedup" ->
      PO.incrementalDedup(10L, 0.8).replace("\n", " "),
    "q70_bucket_recall" ->
      PO.bucketRecallAudit(10, 4, 100L).replace("\n", " "),
    "q136_int8_recall" ->
      PO.int8RecallAudit(10, 256L).replace("\n", " "),
    "q71_knn_label_audit" ->
      PO.knnLabelAuditAuto(5, 125L).replace("\n", " "),
    // integer-only burst rule (n*28 > 5*trail7, the 1.25x WARN dial) —
    // no float crosses engines
    "q72_burst_days" ->
      """WITH d AS (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, n,
        |  sum(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail7,
        |  count(n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS hist FROM d)
        |SELECT event_type, day, n, trail7::BIGINT AS trail7
        |FROM t WHERE hist = 7 AND n * 28 > trail7 * 5
        |ORDER BY event_type, day""".stripMargin.replace("\n", " "),
    "q73_cluster_sizes" ->
      PO.clusterSizeHistogram(0.8).replace("\n", " "),
    // integral div both sides; DuckDB // is integer division
    "q75_seqlen_histogram" ->
      """SELECT source,
        |  least(len(string_split(text, ' ')) // 16, 8)::BIGINT AS bucket,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin.replace("\n", " "),
    // same '#dc' shingle hashes as q44; distinct (eval, train) pairs
    "q74_contaminated_evals" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |hs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |  i -> ('0x'||substr(sha256(array_to_string(t[i:i+2], ' ')||'#dc'),1,15))::BIGINT))
        |  AS h FROM tk),
        |ev AS (SELECT doc_id AS eval_doc, unnest(h) AS g FROM hs WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id AS train_doc, unnest(h) AS g FROM hs WHERE doc_id % 10 <> 0),
        |p AS (SELECT DISTINCT eval_doc, train_doc FROM ev JOIN tr USING (g))
        |SELECT eval_doc, count(*) AS n_train_hits FROM p
        |GROUP BY eval_doc ORDER BY eval_doc""".stripMargin.replace("\n", " "),
    // lift = (n_pair·N)/(n_a·n_b): int64 products, one double divide —
    // bit-identical in both engines; ranking on the rounded value
    "q69_collocations" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uc AS (SELECT term, count(*) AS c1 FROM
        |  (SELECT unnest(t) AS term FROM tk) u
        |  WHERE length(term) > 0 GROUP BY term),
        |n AS (SELECT sum(c1)::BIGINT AS n_total FROM uc),
        |bc AS (SELECT term_a, term_b, count(*) AS n_pair FROM
        |  (SELECT t[i] AS term_a, t[i+1] AS term_b
        |   FROM tk, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2) b
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT term_a, term_b, n_pair, ca.c1 AS n_a, cb.c1 AS n_b,
        |  round((n_pair * n_total)::DOUBLE / (ca.c1 * cb.c1), 6) AS lift
        |FROM bc JOIN uc ca ON term_a = ca.term
        |        JOIN uc cb ON term_b = cb.term CROSS JOIN n
        |ORDER BY lift DESC, term_a, term_b LIMIT 25""".stripMargin.replace("\n", " "),
    // closed-form recomputation of the PNG round-trip: the Spark side
    // ENCODES pixel (x,y) = (x·31 + y·17 + doc_id) mod 256 and DECODES
    // with a real codec; PNG is lossless, so decoded sums must equal
    // this direct recomputation from doc_id
    "q76_image_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 7 + 8) AS w, (doc_id % 5 + 4) AS h
        |  FROM documents WHERE doc_id < 20),
        |px AS (SELECT doc_id, w, h, ((x.i * 31 + y.i * 17 + doc_id) % 256) AS v
        |  FROM d, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i))
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  3::BIGINT AS n_channels, sum(v)::BIGINT AS red_sum
        |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin.replace("\n", " "),
    // arithmetic recomputation of the planted-PII audit: exactly one
    // match per planted class per doc (residue classes 2/3/5), zero
    // residual after scrub — an independent derivation that catches a
    // preset regex drifting on EITHER engine
    "q93_pii_presets" ->
      """WITH c AS (
        | SELECT source, 'email' AS pattern,
        |   sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS hits
        | FROM documents GROUP BY source
        | UNION ALL SELECT source, 'ipv4',
        |   sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
        | FROM documents GROUP BY source
        | UNION ALL SELECT source, 'phone',
        |   sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT
        | FROM documents GROUP BY source)
        |SELECT source, pattern, hits AS n_docs_hit, hits AS n_matches,
        |  0::BIGINT AS n_residual
        |FROM c ORDER BY source, pattern""".stripMargin.replace("\n", " "),
    // closed-form recomputation of the resize round trip: resized
    // pixel (x', y') = source pixel (x'·w // 9, y'·h // 6) of the q76
    // synthetic image, whose value is (sx·31 + sy·17 + doc_id) mod 256;
    // PNG is lossless on both hops, so decoded sums must equal this
    "q91_image_resize" ->
      """WITH d AS (SELECT doc_id, (doc_id % 7 + 8) AS w, (doc_id % 5 + 4) AS h
        |  FROM documents WHERE doc_id < 20),
        |px AS (SELECT doc_id,
        |    ((((x.i * w) // 9) * 31 + ((y.i * h) // 6) * 17 + doc_id) % 256) AS v
        |  FROM d, unnest(range(0, 9)) AS x(i), unnest(range(0, 6)) AS y(i))
        |SELECT doc_id AS media_id, 9::BIGINT AS width, 6::BIGINT AS height,
        |  3::BIGINT AS n_channels, sum(v)::BIGINT AS red_sum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin.replace("\n", " "),
    // within-stream dedup keeps exactly one copy per content hash:
    // the kept SET is the corpus's distinct hashes, ordered
    "q105_streaming_dedup" ->
      """SELECT DISTINCT sha256(text) AS h FROM documents
        |ORDER BY h""".stripMargin.replace("\n", " "),
    // streaming admission == batch admission: distinct stream hashes
    // anti-joined against the base (doc_id % 10 == 0) hash projection;
    // one row per admitted hash, ordered — exactly what admitStream's
    // Append output must produce regardless of micro-batch boundaries
    "q90_streaming_admission" ->
      """WITH bh AS (SELECT DISTINCT sha256(text) AS h FROM documents
        |  WHERE doc_id % 10 = 0),
        |sh AS (SELECT DISTINCT sha256(text) AS h FROM documents)
        |SELECT h FROM sh ANTI JOIN bh USING (h)
        |ORDER BY h""".stripMargin.replace("\n", " "),
    // closed-form recomputation of the animated-GIF frame sampling:
    // frame f's pixel (x,y) = (x·31 + y·17 + f·29 + doc_id) mod 256,
    // n = doc_id%4+2 frames, sampled index j maps to source frame
    // j·n // min(3,n); GIF over the exact gray palette is lossless,
    // so decoded sums must equal this direct recomputation
    "q95_frame_sample" ->
      """WITH d AS (SELECT doc_id, (doc_id % 5 + 6) AS w, (doc_id % 3 + 4) AS h,
        |    (doc_id % 4 + 2) AS n FROM documents WHERE doc_id < 20),
        |f AS (SELECT doc_id, w, h, n, j.i AS fi, (j.i * n) // least(3, n) AS sf
        |  FROM d, unnest(range(0, least(3, n))) AS j(i)),
        |px AS (SELECT doc_id, fi, sf, n, w, h,
        |    ((x.i * 31 + y.i * 17 + sf * 29 + doc_id) % 256) AS v
        |  FROM f, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i))
        |SELECT doc_id AS media_id, fi AS frame_idx, sf AS src_frame,
        |  n AS n_frames, w AS width, h AS height, sum(v)::BIGINT AS gray_sum
        |FROM px GROUP BY doc_id, fi, sf, n, w, h
        |ORDER BY media_id, frame_idx""".stripMargin.replace("\n", " "),
    // closed-form recomputation of the WAV round-trip: sample i of
    // doc_id's clip = (i·37 + doc_id·11) mod 2003 − 1001 over
    // n = doc_id%50+100 samples; PCM is lossless, so the decoded sums
    // must equal this direct recomputation
    "q96_audio_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 50 + 100) AS n
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, n, ((i.i * 37 + doc_id * 11) % 2003 - 1001) AS v
        |  FROM d, unnest(range(0, n)) AS i(i))
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS n_channels, 16::BIGINT AS bits, n AS n_samples,
        |  sum(v)::BIGINT AS sample_sum
        |FROM s GROUP BY doc_id, n ORDER BY media_id""".stripMargin.replace("\n", " "),
    // arithmetic reclassification of the planted snapshot split:
    // added = in v2 only (%7==0, %13!=0), removed = in v1 only,
    // modified = in both with the %11 rewrite, unchanged = the rest;
    // ids divisible by both 7 and 13 are in neither snapshot
    "q104_corpus_diff" ->
      """WITH c AS (SELECT source,
        |  CASE WHEN doc_id % 7 = 0 AND doc_id % 13 <> 0 THEN 'added'
        |       WHEN doc_id % 13 = 0 AND doc_id % 7 <> 0 THEN 'removed'
        |       WHEN doc_id % 7 <> 0 AND doc_id % 13 <> 0
        |            AND doc_id % 11 = 0 THEN 'modified'
        |       WHEN doc_id % 7 <> 0 AND doc_id % 13 <> 0 THEN 'unchanged'
        |       ELSE NULL END AS change
        |  FROM documents)
        |SELECT source, change, count(*)::BIGINT AS n_docs FROM c
        |WHERE change IS NOT NULL
        |GROUP BY source, change ORDER BY source, change""".stripMargin.replace("\n", " "),
    // the ORC round trip's target values, computed from the parquet
    // source directly — losslessness means the two must agree on
    // counts, sums, and the per-text content hash
    "q103_orc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS n_chars_total,
        |  sum(('0x'||substr(sha256(text||'#orc'),1,15))::BIGINT
        |      % 1000000000)::BIGINT AS text_hash_sum
        |FROM documents WHERE doc_id < 200
        |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // the planted CSV corruption split, recomputed from the source
    // table (q77's pattern, mod 5)
    "q101_csv_health" ->
      """SELECT sum(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_clean,
        |  sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_corrupt
        |FROM documents WHERE doc_id < 200""".stripMargin.replace("\n", " "),
    // DuckDB applies the SAME canonical composition (nfc_normalize),
    // and the gate hashes the normalized strings — byte-level parity
    "q102_nfc_normalize" ->
      """WITH p AS (SELECT source,
        |  text || CASE WHEN doc_id % 3 = 0 THEN ' Cafe' || chr(769)
        |               ELSE ' Caf' || chr(233) END AS planted
        |  FROM documents),
        |n AS (SELECT source, planted, nfc_normalize(planted) AS norm FROM p)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN norm <> planted THEN 1 ELSE 0 END)::BIGINT AS n_changed,
        |  sum(('0x'||substr(sha256(norm||'#nfc'),1,15))::BIGINT % 1000000000)::BIGINT
        |    AS norm_hash_sum
        |FROM n GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // exact recomputation of the heavy-hitter set the sketch must
    // cover: token total and the count of terms above support·N are
    // cross-engine-exact; the membership column must be TRUE
    "q100_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |n AS (SELECT count(*)::BIGINT AS n_tokens FROM t),
        |h AS (SELECT term, count(*) AS c FROM t GROUP BY term)
        |SELECT n.n_tokens,
        |  (SELECT count(*) FROM h WHERE c * 50 > n.n_tokens)::BIGINT
        |    AS n_true_heavy,
        |  TRUE AS all_heavy_in_sketch
        |FROM n""".stripMargin.replace("\n", " "),
    // the compression guard's checkable face: exact per-source counts
    // plus TRUE-expected invariant columns — Spark must run the real
    // deflate codec to produce the TRUEs (q85's pattern)
    "q98_compression_guard" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS n_chars_total,
        |  TRUE AS double_copy_compresses, TRUE AS bounds_ok
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin.replace("\n", " "),
    // the pure-SQL surface rows reuse their Scala twins' oracles
    // verbatim: identical results via a different (SQL) entry path is
    // exactly the property being gated
    "q106_sql_exact_dedup" -> PO.exactDedup,
    "q107_sql_cosine_topk" -> PO.cosineTopK(0L, 10),
    "q109_sql_lsh_near_dups" -> PO.lshNearDups(0.8),
    "q110_sql_simhash" -> PO.simhash,
    // q96's closed-form recomputation with the AIFF constants:
    // n = id%40+80, sample i = (i·53 + id·29) mod 1987 − 993
    "q111_aiff_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 40 + 80) AS n
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, n, ((i.i * 53 + doc_id * 29) % 1987 - 993) AS v
        |  FROM d, unnest(range(0, n)) AS i(i))
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS n_channels, 16::BIGINT AS bits, n AS n_samples,
        |  sum(v)::BIGINT AS sample_sum
        |FROM s GROUP BY doc_id, n ORDER BY media_id""".stripMargin.replace("\n", " "),
    // q96's closed-form recomputation with the AU constants:
    // n = id%30+60, sample i = (i·71 + id·43) mod 1913 − 956
    "q112_au_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 30 + 60) AS n
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, n, ((i.i * 71 + doc_id * 43) % 1913 - 956) AS v
        |  FROM d, unnest(range(0, n)) AS i(i))
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS n_channels, 16::BIGINT AS bits, n AS n_samples,
        |  sum(v)::BIGINT AS sample_sum
        |FROM s GROUP BY doc_id, n ORDER BY media_id""".stripMargin.replace("\n", " "),
    // q95's closed-form recomputation pattern with the TIFF constants:
    // w = id%6+5, h = id%4+3, n = id%5+2, v = (x·19+y·23+f·41+id)%256
    "q108_tiff_frame_sample" ->
      """WITH d AS (SELECT doc_id, (doc_id % 6 + 5) AS w, (doc_id % 4 + 3) AS h,
        |    (doc_id % 5 + 2) AS n FROM documents WHERE doc_id < 20),
        |f AS (SELECT doc_id, w, h, n, j.i AS fi, (j.i * n) // least(3, n) AS sf
        |  FROM d, unnest(range(0, least(3, n))) AS j(i)),
        |px AS (SELECT doc_id, fi, sf, n, w, h,
        |    ((x.i * 19 + y.i * 23 + sf * 41 + doc_id) % 256) AS v
        |  FROM f, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i))
        |SELECT doc_id AS media_id, fi AS frame_idx, sf AS src_frame,
        |  n AS n_frames, w AS width, h AS height, sum(v)::BIGINT AS gray_sum
        |FROM px GROUP BY doc_id, fi, sf, n, w, h
        |ORDER BY media_id, frame_idx""".stripMargin.replace("\n", " "),
    // q95's closed-form recomputation pattern with the AVI constants:
    // w = id%7+6, h = id%3+3, n = id%4+2, R = (x·29+y·13+f·37+id)%256
    // (the red channel is the gate sum; G/B differ by construction so
    // a byte-order or row-order demux bug cannot hash-match)
    "q120_avi_frame_sample" ->
      """WITH d AS (SELECT doc_id, (doc_id % 7 + 6) AS w, (doc_id % 3 + 3) AS h,
        |    (doc_id % 4 + 2) AS n FROM documents WHERE doc_id < 20),
        |f AS (SELECT doc_id, w, h, n, j.i AS fi, (j.i * n) // least(3, n) AS sf
        |  FROM d, unnest(range(0, least(3, n))) AS j(i)),
        |px AS (SELECT doc_id, fi, sf, n, w, h,
        |    ((x.i * 29 + y.i * 13 + sf * 37 + doc_id) % 256) AS v
        |  FROM f, unnest(range(0, w)) AS x(i), unnest(range(0, h)) AS y(i))
        |SELECT doc_id AS media_id, fi AS frame_idx, sf AS src_frame,
        |  n AS n_frames, w AS width, h AS height, sum(v)::BIGINT AS gray_sum
        |FROM px GROUP BY doc_id, fi, sf, n, w, h
        |ORDER BY media_id, frame_idx""".stripMargin.replace("\n", " "),
    // arithmetic recomputation of the JDK's G.711 µ-law expansion
    // (verified bit-exact for all 256 code bytes): code byte i of
    // doc_id's clip = (i·13 + doc_id·7) mod 256 over n = id%45+90;
    // x = 255−b, value = sign(b<128) · ((((x&15)·2+33)<<((x>>4)&7))−33)·4
    "q121_ulaw_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 45 + 90) AS n
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, n, ((i.i * 13 + doc_id * 7) % 256) AS b
        |  FROM d, unnest(range(0, n)) AS i(i)),
        |v AS (SELECT doc_id, n, b, 255 - b AS x FROM s)
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS n_channels, 8::BIGINT AS bits, n AS n_samples,
        |  sum((CASE WHEN b < 128 THEN -1 ELSE 1 END) *
        |      (((((x & 15) * 2 + 33) << ((x >> 4) & 7)) - 33) * 4))::BIGINT
        |    AS sample_sum
        |FROM v GROUP BY doc_id, n ORDER BY media_id""".stripMargin.replace("\n", " "),
    // the A-law twin: code byte i = (i·17 + doc_id·23) mod 256 over
    // n = id%35+70; x = b XOR 0x55, mag = e=0 ? 2m+1 : (2m+33)<<(e−1),
    // value = sign(b≥128) · mag · 8 (also verified for all 256 codes)
    "q122_alaw_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 35 + 70) AS n
        |  FROM documents WHERE doc_id < 20),
        |s AS (SELECT doc_id, n, ((i.i * 17 + doc_id * 23) % 256) AS b
        |  FROM d, unnest(range(0, n)) AS i(i)),
        |v AS (SELECT doc_id, n, b, xor(b, 85) AS x FROM s),
        |e AS (SELECT doc_id, n, b, ((x >> 4) & 7) AS e, (x & 15) AS m FROM v)
        |SELECT doc_id AS media_id, 8000::BIGINT AS sample_rate,
        |  1::BIGINT AS n_channels, 8::BIGINT AS bits, n AS n_samples,
        |  sum((CASE WHEN b >= 128 THEN 1 ELSE -1 END) *
        |      ((CASE WHEN e = 0 THEN 2*m + 1
        |             ELSE (2*m + 33) << (e - 1) END) * 8))::BIGINT
        |    AS sample_sum
        |FROM e GROUP BY doc_id, n ORDER BY media_id""".stripMargin.replace("\n", " "),
    // the same planted paragraph construction (three ⌊n/3⌋ segments +
    // the Dedup-constant banner/footer — interpolated, defined once),
    // keep-first by (doc_id, idx) via row_number (fine at oracle
    // scale; the ENGINE side uses the skew-safe agg), docs rebuilt
    // from survivors, hashed with the portable 60-bit hash
    "q123_paragraph_dedup" -> paragraphDedupOracle(hot = false),
    // the SQL spelling computes the identical result via the identical
    // dataflow — one oracle grades both entry paths
    "q124_sql_paragraph_dedup" -> paragraphDedupOracle(hot = false),
    // same recomputation with the hot planting mirrored — grades the
    // salted keeper propagate under the planted 50%+ skew
    "q126_paragraph_dedup_hotkey" -> paragraphDedupOracle(hot = true),
    // the SQL spelling of the skew fixture — one oracle grades both
    "q130_sql_paragraph_dedup_hot" -> paragraphDedupOracle(hot = true),
    // the compressed round trip's target values, straight from the
    // parquet source — losslessness through write → compress →
    // decompress → parse means the two codec rows must agree on
    // counts, char totals, and the per-text content hash
    "q125_compressed_ingest" ->
      """SELECT c.codec, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS n_chars_total,
        |  sum(('0x'||substr(sha256(text||'#jsonl'),1,15))::BIGINT
        |      % 1000000000)::BIGINT AS text_hash_sum
        |FROM documents CROSS JOIN
        |  (SELECT unnest(['bzip2','gzip']) AS codec) c
        |WHERE doc_id < 200
        |GROUP BY c.codec ORDER BY c.codec""".stripMargin.replace("\n", " "),
  ) ++ oracleSqlTail

  /** The batch gap-sessionization oracle shared by q41 and its three
    * streaming spellings (q80 MemoryStream replay, q116 single-wave
    * file ingress, q127 many-wave file ingress) — ONE text, so a gap
    * or rounding tweak cannot silently diverge the four gates. */
  private lazy val sessionizeOracle: String =
    """WITH f AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |  ROWS UNBOUNDED PRECEDING) AS sess FROM f)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 6) AS total_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin.replace("\n", " ")

  /** DuckDB recomputation shared by q123, its SQL twin q124, and (with
    * the hot planting mirrored) the q126 skew gate. */
  private def paragraphDedupOracle(hot: Boolean): String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT doc_id, source, tk, len(tk) AS n, len(tk) // 3 AS b1,
        |    (len(tk) * 2) // 3 AS b2 FROM t),
        |segs AS (SELECT doc_id, source,
        |  [array_to_string(tk[1:b1], ' '), array_to_string(tk[b1+1:b2], ' '),
        |   array_to_string(tk[b2+1:n], ' ')] AS s FROM b),
        |p1 AS (SELECT doc_id, source, CASE WHEN doc_id % 3 = 0
        |    THEN [s[1], '${Dedup.ParaBanner}', s[2], s[3]] ELSE s END AS s1
        |  FROM segs),
        |p2x AS (SELECT doc_id, source, CASE WHEN doc_id % 5 = 0
        |    THEN list_append(s1, '${Dedup.ParaFooter}') ELSE s1 END AS s2x
        |  FROM p1),
        |p2 AS (SELECT doc_id, source, ${
          if (hot)
            s"CASE WHEN doc_id % 2 = 0 THEN ['${Dedup.ParaHot}'] || s2x ELSE s2x END"
          else "s2x"
        } AS s2 FROM p2x),
        |p AS (SELECT doc_id, source, u.i - 1 AS para_idx, s2[u.i] AS para
        |  FROM p2, unnest(range(1, len(s2) + 1)) AS u(i)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY para
        |    ORDER BY doc_id, para_idx) AS rn FROM p),
        |d AS (SELECT doc_id, source, count(*) AS n_paras,
        |    sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
        |      ORDER BY para_idx), '') AS cleaned
        |  FROM r GROUP BY doc_id, source)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_paras)::BIGINT AS paras_total,
        |  sum(n_kept)::BIGINT AS paras_kept,
        |  sum(CASE WHEN n_kept < n_paras THEN 1 ELSE 0 END)::BIGINT
        |    AS docs_changed,
        |  sum(('0x'||substr(sha256(cleaned||'#pd'),1,15))::BIGINT
        |      % 1000000000)::BIGINT AS cleaned_hash_sum
        |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")

  /** The q134/q135 oracle: 13-gram train/eval contamination with the
    * identical '#eval' split, '#plant' planting, and '#dc' shingle
    * hashes as `Dedup.decontaminationReport`. k = 13 → a shingle at
    * token i spans t[i:i+12]; range(1, len-11) enumerates exactly
    * len-12 start positions and is empty for short docs (DuckDB range
    * never runs backward, matching the Spark-side size guard). */
  private def deconShingleCtes(plant: Boolean): String =
    s"""WITH b AS (SELECT doc_id, source, ${
          if (plant)
            s"CASE WHEN ('0x'||substr(sha256(doc_id::VARCHAR||'#plant'),1,15))::BIGINT % ${Dedup.DeconPlantMod} = 0 " +
              s"THEN '${Dedup.DeconBanner} ' || text ELSE text END"
          else "text"
        } AS text,
        |  ('0x'||substr(sha256(doc_id::VARCHAR||'#eval'),1,15))::BIGINT % ${Dedup.DeconEvalMod} = 0 AS is_eval
        |  FROM documents),
        |tk AS (SELECT doc_id, source, is_eval, string_split(text, ' ') AS t FROM b),
        |sh AS (SELECT doc_id, source, is_eval, unnest(list_distinct(list_transform(
        |    range(1, len(t) - 11), i -> ('0x'||substr(sha256(
        |    array_to_string(t[i:i+12], ' ')||'#dc'),1,15))::BIGINT))) AS g FROM tk)""".stripMargin

  private def deconOracleSql(plant: Boolean): String =
    s"""${deconShingleCtes(plant)},
        |ev AS (SELECT DISTINCT g FROM sh WHERE is_eval),
        |hits AS (SELECT s.doc_id, s.source, count(*) AS n_hit
        |  FROM sh s JOIN ev USING (g) WHERE NOT s.is_eval GROUP BY 1, 2),
        |tr AS (SELECT source, count(*) AS n_train FROM b WHERE NOT is_eval GROUP BY source),
        |hs AS (SELECT source, count(*) AS n_cont, sum(n_hit) AS pairs FROM hits GROUP BY source)
        |SELECT t.source, n_train::BIGINT AS n_train_docs,
        |  coalesce(n_cont, 0)::BIGINT AS n_contaminated,
        |  coalesce(pairs, 0)::BIGINT AS n_hit_pairs,
        |  round(coalesce(n_cont, 0)::DOUBLE / n_train, 6) AS contamination_frac
        |FROM tr t LEFT JOIN hs USING (source) ORDER BY source""".stripMargin.replace("\n", " ")

  /** The q138 oracle: same b/tk/sh CTEs as q135 (planted), joined
    * INNER eval×train on the shingle hash and rolled up per eval doc —
    * distinct counts, so duplicate (eval, train) shingle matches
    * collapse exactly as the Spark side's count_distinct does. The
    * train side keeps the SAME bounded evidence as the Spark
    * dataflow — at most 64 docs per shingle, lowest doc_ids first
    * (row_number over (g, doc_id) both engines, deterministic since
    * per-doc shingles are distinct) — so the planted banner's
    * eval×train clique stays O(shingles × 64) in the oracle too. */
  private def deconEvalDetailSql: String =
    s"""${deconShingleCtes(plant = true)},
        |tev AS (SELECT doc_id, g FROM sh WHERE NOT is_eval
        |  QUALIFY row_number() OVER (PARTITION BY g ORDER BY doc_id) <= ${Dedup.DeconEvidenceCap})
        |SELECT e.doc_id AS eval_doc, e.source,
        |  count(DISTINCT t.doc_id)::BIGINT AS n_train_docs,
        |  count(DISTINCT e.g)::BIGINT AS n_hit_shingles
        |FROM sh e JOIN tev t USING (g)
        |WHERE e.is_eval
        |GROUP BY 1, 2 ORDER BY eval_doc""".stripMargin.replace("\n", " ")

  /** The q139/q140 winnowing CTEs — identical tokenizer
    * (string_split = Spark split(text,' ',-1) on the clean corpus),
    * '#wn' positional k-gram hashes (NO list_distinct: winnowing
    * needs every position), the same zero-padded (hash, pos) string
    * min over ROWS CURRENT..w-1 FOLLOWING, full windows only. k/w
    * come from Dedup's constants so the SQL moves in lockstep. */
  private def winnowFpCte(filter: String): String = {
    val k = Winnow.WinnowK; val w = Winnow.WinnowW
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents$filter),
        |p AS (SELECT doc_id, len(t) - ${k - 1} AS n, t,
        |  unnest(range(1, len(t) - ${k - 2})) AS i FROM tk),
        |h AS (SELECT doc_id, n, i - 1 AS pos, ('0x'||substr(sha256(
        |  array_to_string(t[i:i+${k - 1}], ' ')||'#wn'),1,15))::BIGINT AS g FROM p),
        |s AS (SELECT doc_id, n, pos, min(lpad(g::VARCHAR, 20, '0') ||
        |  lpad(pos::VARCHAR, 10, '0')) OVER (PARTITION BY doc_id ORDER BY pos
        |  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel FROM h),
        |fp AS MATERIALIZED (SELECT DISTINCT doc_id, substr(sel, 1, 20)::BIGINT AS fp_hash,
        |  substr(sel, 21, 10)::BIGINT AS fp_pos FROM s WHERE pos <= n - $w)""".stripMargin
  }

  /** The q141 oracle: same planted CTEs as q135; hit docs = distinct
    * train docs semi-joined on the shingle hash; kept = anti on
    * doc_id; digest hashes the kept text with the '#ka' 60-bit
    * construction, zero-filled per-source spine. */
  private def deconApplySql: String =
    s"""${deconShingleCtes(plant = true)},
        |ev AS (SELECT DISTINCT g FROM sh WHERE is_eval),
        |hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (g)
        |  WHERE NOT s.is_eval),
        |kept AS (SELECT b.source, b.text FROM b LEFT JOIN hit USING (doc_id)
        |  WHERE NOT b.is_eval AND hit.doc_id IS NULL),
        |tr AS (SELECT source, count(*) AS n_train FROM b
        |  WHERE NOT is_eval GROUP BY source),
        |kg AS (SELECT source, count(*) AS n_kept,
        |  sum(('0x'||substr(sha256(text||'#ka'),1,15))::BIGINT % 1000000000) AS khs
        |  FROM kept GROUP BY source)
        |SELECT t.source, n_train::BIGINT AS n_train_docs,
        |  (n_train - coalesce(n_kept, 0))::BIGINT AS n_dropped,
        |  coalesce(n_kept, 0)::BIGINT AS n_kept,
        |  coalesce(khs, 0)::BIGINT AS kept_hash_sum
        |FROM tr t LEFT JOIN kg USING (source)
        |ORDER BY source""".stripMargin.replace("\n", " ")

  private def winnowStatsSql: String =
    s"""${winnowFpCte(s" WHERE doc_id % ${Winnow.WinnowMod} = 0")}
        |SELECT doc_id, count(*)::BIGINT AS n_fp,
        |  sum(fp_hash % 1000000000)::BIGINT AS fp_hash_sum,
        |  sum(fp_pos)::BIGINT AS fp_pos_sum
        |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Shared q140/q142 pair CTEs: distinct (doc, fp), the 2..maxDf df
    * window, the ordered pair rollup (no minShared floor — q140
    * applies its own, q142 ranks instead). */
  private def winnowPairCtes: String =
    s"""${winnowFpCte("")},
        |d AS MATERIALIZED (SELECT DISTINCT doc_id, fp_hash FROM fp),
        |r AS (SELECT fp_hash FROM d GROUP BY fp_hash
        |  HAVING count(*) BETWEEN 2 AND ${Winnow.WinnowMaxDf}),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
        |  FROM d a JOIN r ON a.fp_hash = r.fp_hash
        |           JOIN d b ON b.fp_hash = a.fp_hash
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private def winnowOverlapSql: String =
    s"""$winnowPairCtes
        |SELECT doc_a, doc_b, n_shared FROM pr
        |WHERE n_shared >= ${Winnow.WinnowMinShared}
        |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")

  /** The q150 oracle — span attribution as a classic islands-and-gaps
    * recompute over the SAME fp/df CTEs as q140: matched positions =
    * DISTINCT (pair, side, pos) where the shared hash passes the df
    * window `r` (bounded evidence on BOTH engines — boilerplate
    * contributes no span evidence), LAG marks breaks beyond the span
    * gap, a running SUM assigns island ids, then per-island
    * min/max/count. end_pos extends the last matched gram by its
    * k − 1 trailing tokens, exactly as the Spark fold does. */
  private def winnowSpansSql: String =
    s"""$winnowPairCtes,
        |np AS MATERIALIZED (SELECT doc_a, doc_b FROM pr
        |  WHERE n_shared >= ${Winnow.WinnowMinShared}),
        |mp AS (
        |  SELECT DISTINCT np.doc_a, np.doc_b, 'a' AS side, fa.fp_pos AS pos
        |  FROM np JOIN fp fa ON fa.doc_id = np.doc_a
        |    JOIN r ON fa.fp_hash = r.fp_hash
        |    JOIN d fb ON fb.doc_id = np.doc_b AND fb.fp_hash = fa.fp_hash
        |  UNION ALL
        |  SELECT DISTINCT np.doc_a, np.doc_b, 'b' AS side, fb.fp_pos AS pos
        |  FROM np JOIN fp fb ON fb.doc_id = np.doc_b
        |    JOIN r ON fb.fp_hash = r.fp_hash
        |    JOIN d fa ON fa.doc_id = np.doc_a AND fa.fp_hash = fb.fp_hash),
        |sq AS (SELECT doc_a, doc_b, side, pos,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_a, doc_b, side
        |    ORDER BY pos) > ${Winnow.WinnowSpanGap} THEN 1 ELSE 0 END AS brk
        |  FROM mp),
        |il AS (SELECT doc_a, doc_b, side, pos,
        |  sum(brk) OVER (PARTITION BY doc_a, doc_b, side ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS isl FROM sq)
        |SELECT doc_a, doc_b, side, (isl + 1)::BIGINT AS span_idx,
        |  min(pos)::BIGINT AS start_pos,
        |  (max(pos) + ${Winnow.WinnowK - 1})::BIGINT AS end_pos,
        |  count(*)::BIGINT AS n_fps
        |FROM il GROUP BY doc_a, doc_b, side, isl
        |ORDER BY doc_a, doc_b, side, span_idx""".stripMargin.replace("\n", " ")

  /** The q145 oracle: the shared pair CTEs thresholded at minShared,
    * then DuckDB's recursive transitive closure for min-label
    * components (the q36/q82 oracle pattern), the keep-best rank
    * (n_chars DESC, node), and the per-source ship digest with the
    * '#wk' 60-bit content hash over the kept corpus — every column
    * recomputed from the parquet source. */
  private def winnowApplySql: String =
    s"""${winnowPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |np AS MATERIALIZED (SELECT doc_a, doc_b FROM pr
        |  WHERE n_shared >= ${Winnow.WinnowMinShared}),
        |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM np
        |  UNION SELECT doc_b, doc_a FROM np),
        |reach(node, lab) AS (SELECT src, src FROM edges
        |  UNION SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
        |cl AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY node),
        |rk AS (SELECT c.node, row_number() OVER (PARTITION BY c.cluster
        |  ORDER BY d.n_chars DESC, c.node) AS rn
        |  FROM cl c JOIN documents d ON c.node = d.doc_id),
        |rem AS MATERIALIZED (SELECT node FROM rk WHERE rn <> 1),
        |fl AS (SELECT d.source, count(*) AS nf FROM cl
        |  JOIN documents d ON cl.node = d.doc_id GROUP BY 1),
        |dr AS (SELECT d.source, count(*) AS nd FROM rem
        |  JOIN documents d ON rem.node = d.doc_id GROUP BY 1),
        |kp AS (SELECT source, count(*) AS nk,
        |  sum(('0x'||substr(sha256(text||'#wk'),1,15))::BIGINT % 1000000000) AS khs
        |  FROM documents WHERE doc_id NOT IN (SELECT node FROM rem)
        |  GROUP BY source),
        |tot AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
        |SELECT t.source, n::BIGINT AS n_docs,
        |  coalesce(nf, 0)::BIGINT AS n_flagged,
        |  coalesce(nd, 0)::BIGINT AS n_dropped,
        |  coalesce(nk, 0)::BIGINT AS n_kept,
        |  coalesce(khs, 0)::BIGINT AS kept_hash_sum
        |FROM tot t LEFT JOIN fl USING (source) LEFT JOIN dr USING (source)
        |  LEFT JOIN kp USING (source)
        |ORDER BY source""".stripMargin.replace("\n", " ")

  /** The q156 oracle — the scrub recomputed from the parquet source
    * with NO Spark reuse: the q145 CTEs (pairs → recursive CC →
    * keep-best rank) decide the losers; the q150 matched-position
    * CTEs, re-keyed to the doc each position belongs to and
    * restricted to losers, feed the LAG/running-SUM island collapse
    * per DOC (positions unioned across all of a loser's flagged
    * pairs, exactly the Spark union-then-island order); intervals
    * extend k − 1 trailing tokens; then the scrubbed texts are
    * REBUILT by 1-based token slicing (i − 1 vs the 0-based token
    * intervals), re-joined single-space, and '#ws'-hashed alongside
    * the untouched docs' original texts. A fully-scrubbed doc
    * LEFT-JOINs back as ('' , 0 kept) — kept, not dropped. */
  /** Shared scrub CTE chain (through `sc`, the per-doc rebuilt
    * texts) — the q156 digest and the q162 per-doc report are two
    * selects over the SAME recompute, exactly like the Spark side. */
  private def winnowScrubCtes: String =
    s"""${winnowPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |np AS MATERIALIZED (SELECT doc_a, doc_b FROM pr
        |  WHERE n_shared >= ${Winnow.WinnowMinShared}),
        |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM np
        |  UNION SELECT doc_b, doc_a FROM np),
        |reach(node, lab) AS (SELECT src, src FROM edges
        |  UNION SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
        |cl AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY node),
        |rk AS (SELECT c.node, row_number() OVER (PARTITION BY c.cluster
        |  ORDER BY d.n_chars DESC, c.node) AS rn
        |  FROM cl c JOIN documents d ON c.node = d.doc_id),
        |rem AS MATERIALIZED (SELECT node FROM rk WHERE rn <> 1),
        |mp AS (
        |  SELECT DISTINCT np.doc_a AS doc_id, fa.fp_pos AS pos
        |  FROM np JOIN fp fa ON fa.doc_id = np.doc_a
        |    JOIN r ON fa.fp_hash = r.fp_hash
        |    JOIN d fb ON fb.doc_id = np.doc_b AND fb.fp_hash = fa.fp_hash
        |  UNION
        |  SELECT DISTINCT np.doc_b AS doc_id, fb.fp_pos AS pos
        |  FROM np JOIN fp fb ON fb.doc_id = np.doc_b
        |    JOIN r ON fb.fp_hash = r.fp_hash
        |    JOIN d fa ON fa.doc_id = np.doc_a AND fa.fp_hash = fb.fp_hash),
        |lp AS (SELECT doc_id, pos FROM mp
        |  WHERE doc_id IN (SELECT node FROM rem)),
        |sq AS (SELECT doc_id, pos,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |    ORDER BY pos) > ${Winnow.WinnowSpanGap} THEN 1 ELSE 0 END AS brk
        |  FROM lp),
        |il AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
        |  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl FROM sq),
        |iv AS (SELECT doc_id, min(pos) AS s,
        |  max(pos) + ${Winnow.WinnowK - 1} AS e FROM il
        |  GROUP BY doc_id, isl),
        |tk2 AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id IN (SELECT node FROM rem)),
        |tok AS (SELECT doc_id, source, len(t) AS nt, t,
        |  unnest(range(1, len(t) + 1)) AS i FROM tk2),
        |kp AS (SELECT doc_id, i, t[i] AS tokval FROM tok k
        |  WHERE NOT EXISTS (SELECT 1 FROM iv
        |    WHERE iv.doc_id = k.doc_id AND k.i - 1 BETWEEN iv.s AND iv.e)),
        |ka AS (SELECT doc_id, count(*) AS nk,
        |  array_to_string(list(tokval ORDER BY i), ' ') AS newt
        |  FROM kp GROUP BY doc_id),
        |sc AS (SELECT t2.doc_id, t2.source, len(t2.t) AS nt,
        |  coalesce(ka.nk, 0) AS nk, coalesce(ka.newt, '') AS newt
        |  FROM tk2 t2 LEFT JOIN ka USING (doc_id))""".stripMargin

  private def winnowScrubSql: String =
    s"""$winnowScrubCtes,
        |su AS (SELECT source, count(*) AS nsc, sum(nt - nk) AS nrm,
        |  sum(nk) AS nkp,
        |  sum(('0x'||substr(sha256(newt||'#ws'),1,15))::BIGINT % 1000000000) AS hsc
        |  FROM sc GROUP BY source),
        |un AS (SELECT source,
        |  sum(('0x'||substr(sha256(text||'#ws'),1,15))::BIGINT % 1000000000) AS hun
        |  FROM documents WHERE doc_id NOT IN (SELECT node FROM rem)
        |  GROUP BY source),
        |tot AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
        |SELECT t.source, n::BIGINT AS n_docs,
        |  coalesce(nsc, 0)::BIGINT AS n_scrubbed,
        |  coalesce(nrm, 0)::BIGINT AS n_tokens_removed,
        |  coalesce(nkp, 0)::BIGINT AS n_tokens_kept,
        |  (coalesce(hun, 0) + coalesce(hsc, 0))::BIGINT AS scrubbed_hash_sum
        |FROM tot t LEFT JOIN su USING (source) LEFT JOIN un USING (source)
        |ORDER BY source""".stripMargin.replace("\n", " ")

  /** The q162 oracle: the scrub CTEs' per-doc rows verbatim, each
    * rebuilt text certified individually with the '#wd' 60-bit hash
    * (the digest's sum cannot hide a per-doc error here). */
  private def winnowScrubbedDocsSql: String =
    s"""$winnowScrubCtes
        |SELECT doc_id, source, nt::BIGINT AS n_toks, nk::BIGINT AS n_kept,
        |  ('0x'||substr(sha256(newt||'#wd'),1,15))::BIGINT AS scrubbed_hash
        |FROM sc ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** The q146 oracle: same winnow fingerprint CTEs over the whole
    * corpus, the '#inc' hash split (q68's spelling), base-side df
    * bound at WinnowMaxDf, delta×base shared-fingerprint rollup —
    * bit-identical to the store path because fingerprinting is
    * per-doc local (store built from base == base rows of the
    * whole-corpus fingerprint table). */
  private def winnowStoreCtes: String =
    s"""${winnowFpCte("")},
        |d AS MATERIALIZED (SELECT DISTINCT doc_id, fp_hash FROM fp),
        |dl AS MATERIALIZED (SELECT doc_id FROM documents
        |  WHERE ('0x'||substr(sha256(doc_id::VARCHAR||'#inc'),1,15))::BIGINT
        |    % ${Winnow.WinnowDeltaMod} = 0),
        |bf AS MATERIALIZED (SELECT doc_id, fp_hash FROM d
        |  WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
        |dfp AS MATERIALIZED (SELECT doc_id, fp_hash FROM d
        |  WHERE doc_id IN (SELECT doc_id FROM dl)),
        |el AS MATERIALIZED (SELECT fp_hash FROM bf GROUP BY fp_hash
        |  HAVING count(*) <= ${Winnow.WinnowMaxDf}),
        |pr AS (SELECT dfp.doc_id AS delta_doc, bf.doc_id AS base_doc,
        |  count(*)::BIGINT AS n_shared
        |  FROM dfp JOIN el USING (fp_hash) JOIN bf USING (fp_hash)
        |  GROUP BY 1, 2)""".stripMargin

  private def winnowStoreIncrSql: String =
    s"""$winnowStoreCtes
        |SELECT delta_doc, base_doc, n_shared FROM pr
        |WHERE n_shared >= ${Winnow.WinnowMinShared}
        |ORDER BY delta_doc, base_doc""".stripMargin.replace("\n", " ")

  /** The q154 oracle: q146's CTEs for the split + base-df bound +
    * flagged pairs, then the q150 islands-and-gaps over matched
    * (pair, side, pos) — delta positions from the delta doc's
    * fingerprint rows, base positions from the base doc's, both
    * restricted to hashes passing the base-df window `el` and held by
    * BOTH members. */
  private def winnowStoreSpansSql: String =
    s"""$winnowStoreCtes,
        |np AS MATERIALIZED (SELECT delta_doc, base_doc FROM pr
        |  WHERE n_shared >= ${Winnow.WinnowMinShared}),
        |bfp AS MATERIALIZED (SELECT doc_id, fp_hash, fp_pos FROM fp
        |  WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
        |dpp AS MATERIALIZED (SELECT doc_id, fp_hash, fp_pos FROM fp
        |  WHERE doc_id IN (SELECT doc_id FROM dl)),
        |mp AS (
        |  SELECT DISTINCT np.delta_doc, np.base_doc, 'delta' AS side,
        |    fd.fp_pos AS pos
        |  FROM np JOIN dpp fd ON fd.doc_id = np.delta_doc
        |    JOIN el ON fd.fp_hash = el.fp_hash
        |    JOIN bf fb ON fb.doc_id = np.base_doc AND fb.fp_hash = fd.fp_hash
        |  UNION ALL
        |  SELECT DISTINCT np.delta_doc, np.base_doc, 'base' AS side,
        |    fb2.fp_pos AS pos
        |  FROM np JOIN bfp fb2 ON fb2.doc_id = np.base_doc
        |    JOIN el ON fb2.fp_hash = el.fp_hash
        |    JOIN dfp fd2 ON fd2.doc_id = np.delta_doc
        |      AND fd2.fp_hash = fb2.fp_hash),
        |sq AS (SELECT delta_doc, base_doc, side, pos,
        |  CASE WHEN pos - lag(pos) OVER (PARTITION BY delta_doc, base_doc,
        |    side ORDER BY pos) > ${Winnow.WinnowSpanGap} THEN 1 ELSE 0 END
        |    AS brk FROM mp),
        |il AS (SELECT delta_doc, base_doc, side, pos,
        |  sum(brk) OVER (PARTITION BY delta_doc, base_doc, side ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS isl FROM sq)
        |SELECT delta_doc, base_doc, side, (isl + 1)::BIGINT AS span_idx,
        |  min(pos)::BIGINT AS start_pos,
        |  (max(pos) + ${Winnow.WinnowK - 1})::BIGINT AS end_pos,
        |  count(*)::BIGINT AS n_fps
        |FROM il GROUP BY delta_doc, base_doc, side, isl
        |ORDER BY delta_doc, base_doc, side, span_idx"""
      .stripMargin.replace("\n", " ")

  /** The q149 oracle: q146's CTEs; flagged = distinct delta docs in a
    * >= minShared pair; admitted = delta minus flagged, '#wa' 60-bit
    * content hash, zero-filled delta spine. */
  private def winnowStoreAdmitSql: String =
    s"""$winnowStoreCtes,
        |flg AS (SELECT DISTINCT delta_doc AS doc_id FROM pr
        |  WHERE n_shared >= ${Winnow.WinnowMinShared}),
        |dd AS (SELECT doc_id, source, text FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM dl)),
        |fl AS (SELECT d.source, count(*) AS nf FROM flg
        |  JOIN dd d ON flg.doc_id = d.doc_id GROUP BY 1),
        |ad AS (SELECT source, count(*) AS na,
        |  sum(('0x'||substr(sha256(text||'#wa'),1,15))::BIGINT % 1000000000) AS ahs
        |  FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM flg)
        |  GROUP BY source),
        |tot AS (SELECT source, count(*) AS n FROM dd GROUP BY source)
        |SELECT t.source, n::BIGINT AS n_delta,
        |  coalesce(nf, 0)::BIGINT AS n_copy_flagged,
        |  coalesce(na, 0)::BIGINT AS n_admitted,
        |  coalesce(ahs, 0)::BIGINT AS admitted_hash_sum
        |FROM tot t LEFT JOIN fl USING (source) LEFT JOIN ad USING (source)
        |ORDER BY source""".stripMargin.replace("\n", " ")

  private def winnowNeighborsSql: String =
    s"""$winnowPairCtes,
        |sy AS (SELECT doc_a AS doc_id, doc_b AS nbr, n_shared FROM pr
        |  UNION ALL SELECT doc_b, doc_a, n_shared FROM pr)
        |SELECT doc_id, nbr, n_shared,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY n_shared DESC, nbr) AS rn
        |FROM sy QUALIFY rn <= ${Winnow.WinnowTopK}
        |ORDER BY doc_id, rn""".stripMargin.replace("\n", " ")

  private def oracleSqlTail: Map[String, String] = Map(
    // plain set arithmetic for the Bloom-admission gate: a delta doc
    // (doc_id % 10 != 0) is a dup iff its hash appears among the base
    // (doc_id % 10 = 0) hashes — the Bloom pre-filter must not change
    // this by construction, at any fpp
    "q97_bloom_admission" ->
      """WITH b AS (SELECT DISTINCT sha256(text) AS h FROM documents
        |  WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, source, sha256(text) AS h FROM documents
        |  WHERE doc_id % 10 <> 0)
        |SELECT source, count(*)::BIGINT AS n_delta,
        |  sum(CASE WHEN h IN (SELECT h FROM b) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dup,
        |  sum(CASE WHEN h IN (SELECT h FROM b) THEN 0 ELSE 1 END)::BIGINT
        |    AS n_admitted
        |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " "),
    // the planted corruption split, recomputed from the source table:
    // the Spark side must report exactly these counts after its real
    // write → read → PERMISSIVE-parse round trip
    "q77_jsonl_health" ->
      """SELECT sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_clean,
        |  sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_corrupt
        |FROM documents WHERE doc_id < 200""".stripMargin.replace("\n", " "),
    // interpolated bigram LM (q164): identical model — one ln per
    // distinct bigram type on a bit-identical double (0.875 and 0.125
    // are dyadic, exact in every literal path), quantized to integer
    // nanolog; doc/source accumulation is exact integer sums with one
    // final divide. Parallel unnests zip positionally (w1_i, w2_i).
    "q164_bigram_lm" -> bigramLmSql,
    // batch interval join (q165): the oracle states the plain non-equi
    // range predicate (DuckDB executes an IEJoin); integer-microsecond
    // bounds, inclusive both ends — the Spark side's bucket
    // decomposition must reproduce it exactly
    "q165_interval_join" -> intervalJoinSql,
    // weighted sampling (q166): the same E-S priority — deterministic
    // 60-bit hash uniform, ln(u)/n_chars, rank on the RAW key with
    // doc_id tie-break (a rank flip would need two keys within one
    // ulp), emitted rounded to 9 dp
    "q166_weighted_sample" -> weightedSampleSql,
    // TVF spellings at gate-standard arguments share the Scala twins'
    // oracles (lockstep: one oracle text per computation)
    "q167_sql_bigram_lm_tvf" -> bigramLmSql,
    "q168_sql_burst_windows_tvf" -> intervalJoinSql,
    "q169_sql_weighted_sample_tvf" -> weightedSampleSql,
    // PQ: full DuckDB recompute — same hash-sampled codebook, same
    // argmin assignment (ORDER BY d2, c == array_position-of-min), all
    // folds sequential IEEE arithmetic with no libm, so values
    // hash-match exactly (see Similarity.scala PQ scaladocs)
    "q170_pq_error" -> pqErrorSql,
    "q171_pq_recall" -> pqRecallSql,
    "q172_sql_pq_error" -> pqErrorSql,
    "q173_sql_pq_recall" -> pqRecallSql,
    "q174_bm25_topk" -> bm25Sql,
    "q175_sql_bm25_tvf" -> bm25Sql,
    "q176_edit_distance_pairs" -> editPairsSql,
    "q177_sql_edit_pairs_tvf" -> editPairsSql,
    "q178_bigram_lm_cross" -> bigramLmCrossSql,
    "q179_sql_bigram_lm_cross_tvf" -> bigramLmCrossSql,
    "q180_bm25_store" -> bm25Sql,
    "q181_sql_bm25_store" -> bm25Sql,
    "q182_bm25_batch" -> bm25BatchSql,
    "q183_sql_bm25_batch" -> bm25BatchSql,
    "q184_quality_percentile_admission" -> qualityAdmissionSql,
    "q185_sql_quality_admission_tvf" -> qualityAdmissionSql,
    "q186_bm25_stream_ingest" -> bm25Sql,
    "q187_repetition_admission" -> repetitionAdmissionSql,
    "q188_sql_repetition_tvf" -> repetitionAdmissionSql,
    "q189_dsir_resample" -> dsirSql,
    "q190_sql_dsir_tvf" -> dsirSql,
    "q191_bm25_query_stream" -> bm25BatchSql,
    "q192_semantic_decon" -> PO.semanticDeconSql(
      Similarity.SemDeconThreshold, Similarity.SemDeconEvalMod, 125L),
    "q193_sql_semantic_decon" -> PO.semanticDeconSql(
      Similarity.SemDeconThreshold, Similarity.SemDeconEvalMod, 125L),
    "q194_stream_semantic_admit" -> PO.semanticDeconSql(
      Similarity.SemDeconThreshold, Similarity.SemDeconEvalMod, 125L),
    "q195_pq_probe_topk" -> pqServeSql(0L, 10, Similarity.PqProbeRadius, 125L),
    "q196_sql_pq_probe" -> pqServeSql(0L, 10, Similarity.PqProbeRadius, 125L),
  )

  /** q195/q196 oracle: the composite serving query recomputed — the
    * shared PQ model CTEs (codebook, assignments), the adaptive-width
    * sign buckets, the query's own `ad` rows as the ADC lookup table
    * (m,c-ordered list), an EXPLICIT m-ascending adist sum (the q171
    * fold-order discipline), and the exact-cosine re-rank with the
    * same 64-term left-to-right dot. */
  private def pqServeSql(qid: Long, k: Int, radius: Int,
                         target: Long): String =
    s"""WITH ${PO.adaptiveNbCte(target)},
       |$pqBaseCtes,
       |bk AS (SELECT vec_id,
       |  ${PO.signBucketAdaptive("embedding")} AS bucket FROM embeddings),
       |qb AS (SELECT bucket AS q_bucket FROM bk WHERE vec_id = $qid),
       |qv AS (SELECT ed AS q_ed,
       |  sqrt(list_reduce(list_transform(ed, v -> v * v), (x, y) -> x + y))
       |    AS q_norm FROM b WHERE vec_id = $qid),
       |cand AS (SELECT bk.vec_id FROM bk, qb
       |  WHERE bk.vec_id <> $qid
       |  AND len(list_filter(range(1, (SELECT nb FROM params) + 1),
       |    i -> substr(bk.bucket, i, 1) <> substr(qb.q_bucket, i, 1)))
       |    <= $radius),
       |bc AS MATERIALIZED (SELECT b.* FROM b
       |  WHERE vec_id IN (SELECT vec_id FROM cand) OR vec_id = $qid),
       |adr AS ${pqAdCte("bc")},
       |asgr AS (SELECT vec_id, m, c FROM adr
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY d2, c) = 1),
       |lw AS (SELECT list(d2 ORDER BY m, c) AS lv FROM adr
       |  WHERE vec_id = $qid),
       |aw AS (SELECT vec_id, list(c ORDER BY m) AS cs FROM asgr
       |  WHERE vec_id IN (SELECT vec_id FROM cand) GROUP BY vec_id),
       |short AS (SELECT aw.vec_id FROM aw, lw
       |  QUALIFY row_number() OVER (ORDER BY
       |    ${(0 until Similarity.PqM).map(m =>
            s"lw.lv[$m * ${Similarity.PqC} + aw.cs[${m + 1}] + 1]")
            .mkString(" + ")},
       |    aw.vec_id) <= ${Similarity.PqRescoreR}),
       |resc AS (SELECT b.vec_id, b.label,
       |  round((${(1 to 64).map(i => s"b.ed[$i] * qv.q_ed[$i]")
            .mkString(" + ")})
       |    / (sqrt(list_reduce(list_transform(b.ed, v -> v * v),
       |        (x, y) -> x + y)) * qv.q_norm), 6) AS cos
       |  FROM b JOIN short USING (vec_id) CROSS JOIN qv)
       |SELECT * FROM (SELECT CAST(row_number() OVER
       |    (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |  vec_id, label, cos FROM resc) r
       |WHERE rank <= $k ORDER BY rank""".stripMargin.replace("\n", " ")

  /** q187/q188 oracle: the repetition-admission recompute — the same
    * stutter plant (first 10 tokens appended 3×, hash64(doc_id,'#rep')
    * % 5 gate), the same doc-local n-gram signals (top 2/3/4-gram char
    * max, duplicated 5/10-gram char sum over counts ≥ 2), and the same
    * pure-integer permille decision — no doubles anywhere, so the gate
    * has NO rounding surface at all. '#gr' kept-hash convention. */
  private def repetitionAdmissionSql: String =
      """WITH p AS (SELECT doc_id, source,
        |  CASE WHEN ('0x'||substr(sha256(doc_id::VARCHAR||'#rep'),1,15))
        |      ::BIGINT % 5 = 0
        |    THEN text||' '||st||' '||st||' '||st ELSE text END AS text
        |  FROM (SELECT doc_id, source, text,
        |    array_to_string((list_filter(string_split(text,' '),
        |      x->length(x)>0))[1:10],' ') AS st FROM documents)),
        |b AS (SELECT doc_id, source,
        |  ('0x'||substr(sha256(text||'#gr'),1,15))::BIGINT
        |    % 1000000000 AS th,
        |  length(text)::BIGINT AS n_chars,
        |  list_filter(string_split(text,' '),x->length(x)>0) AS tk FROM p),
        |b2 AS (SELECT doc_id, source, th, n_chars, len(tk)::BIGINT AS n_toks,
        |  (len(tk)-len(list_distinct(tk)))::BIGINT AS n_dup, tk FROM b
        |  WHERE len(tk) >= 1),
        |g AS (SELECT doc_id, n, unnest(list_transform(range(1, len(tk)-n+2),
        |    i -> array_to_string(tk[i:i+n-1],' '))) AS gr
        |  FROM b2, (VALUES (2),(3),(4),(5),(10)) v(n) WHERE len(tk) >= n),
        |gc AS (SELECT doc_id, n, gr, count(*)::BIGINT AS c
        |  FROM g GROUP BY 1,2,3),
        |sig AS (SELECT doc_id,
        |  max(CASE WHEN n=2 THEN c*length(gr) END)::BIGINT AS top2,
        |  max(CASE WHEN n=3 THEN c*length(gr) END)::BIGINT AS top3,
        |  max(CASE WHEN n=4 THEN c*length(gr) END)::BIGINT AS top4,
        |  sum(CASE WHEN n=5 AND c>=2 THEN c*length(gr) ELSE 0 END)
        |    ::BIGINT AS dup5,
        |  sum(CASE WHEN n=10 AND c>=2 THEN c*length(gr) ELSE 0 END)
        |    ::BIGINT AS dup10
        |  FROM gc GROUP BY 1),
        |f AS (SELECT b2.source, b2.th,
        |  (n_dup*1000 > n_toks*650) AS f_dup,
        |  (coalesce(top2,0)*1000 > n_chars*150
        |    OR coalesce(top3,0)*1000 > n_chars*180
        |    OR coalesce(top4,0)*1000 > n_chars*220) AS f_top,
        |  (coalesce(dup5,0)*1000 > n_chars*150
        |    OR coalesce(dup10,0)*1000 > n_chars*100) AS f_dng
        |  FROM b2 LEFT JOIN sig USING (doc_id))
        |SELECT source, count(*)::BIGINT AS n_in,
        |  sum(CASE WHEN f_dup THEN 1 ELSE 0 END)::BIGINT AS n_flag_dup_tok,
        |  sum(CASE WHEN f_top THEN 1 ELSE 0 END)::BIGINT AS n_flag_top_gram,
        |  sum(CASE WHEN f_dng THEN 1 ELSE 0 END)::BIGINT AS n_flag_dup_gram,
        |  sum(CASE WHEN f_dup OR f_top OR f_dng THEN 1 ELSE 0 END)
        |    ::BIGINT AS n_dropped,
        |  sum(CASE WHEN NOT(f_dup OR f_top OR f_dng) THEN 1 ELSE 0 END)
        |    ::BIGINT AS n_kept,
        |  sum(CASE WHEN NOT(f_dup OR f_top OR f_dng) THEN th ELSE 0 END)
        |    ::BIGINT AS kept_hash_sum
        |FROM f GROUP BY 1 ORDER BY source""".stripMargin.replace("\n", " ")

  /** q189/q190 oracle: the DSIR recompute — same hashed unigram+bigram
    * buckets ('#ds', % 4096), add-one smoothed per-side nanologs
    * (rounded separately per side, the Spark spelling token-for-token),
    * integer per-doc weight sums, and the Gumbel key as a BIGINT so
    * ranking never tie-breaks on a float ulp. */
  private def dsirSql: String =
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(string_split(text,' '), x->length(x)>0) AS tk
        |  FROM documents),
        |b AS (SELECT doc_id, source, (doc_id % 2 = 0) AS is_tgt, tk
        |  FROM t WHERE len(tk) >= 1),
        |g AS (SELECT doc_id, source, is_tgt, unnest(list_concat(tk,
        |    list_transform(range(1, len(tk)), i -> tk[i]||' '||tk[i+1])))
        |    AS gr FROM b),
        |feat AS (SELECT doc_id, source, is_tgt,
        |  ('0x'||substr(sha256(gr||'#ds'),1,15))::BIGINT % 4096 AS f,
        |  count(*)::BIGINT AS c FROM g GROUP BY 1,2,3,4),
        |tot AS (SELECT sum(CASE WHEN is_tgt THEN c ELSE 0 END)::BIGINT
        |    AS n_tgt,
        |  sum(CASE WHEN NOT is_tgt THEN c ELSE 0 END)::BIGINT AS n_raw
        |  FROM feat),
        |lr AS (SELECT f,
        |  (CAST(round(ln((sum(CASE WHEN is_tgt THEN c ELSE 0 END)+1)::DOUBLE
        |      / (n_tgt+4096)::DOUBLE)*1e9) AS BIGINT)
        |   - CAST(round(ln((sum(CASE WHEN NOT is_tgt THEN c ELSE 0 END)+1)
        |      ::DOUBLE / (n_raw+4096)::DOUBLE)*1e9) AS BIGINT)) AS lr_nano
        |  FROM feat CROSS JOIN tot GROUP BY f, n_tgt, n_raw),
        |lw AS (SELECT doc_id, source, sum(c*lr_nano)::BIGINT AS lw_nano
        |  FROM feat JOIN lr USING (f) WHERE NOT is_tgt GROUP BY 1,2),
        |keyed AS (SELECT *, lw_nano + CAST(round(-ln(-ln(
        |    greatest(('0x'||substr(sha256(doc_id::VARCHAR||'#dsg'),1,15))
        |      ::BIGINT, 1)::DOUBLE / 1152921504606846976.0))*1e9) AS BIGINT)
        |    AS key_nano FROM lw),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY key_nano DESC, doc_id) AS rn FROM keyed)
        |SELECT source, rn::BIGINT AS rn, doc_id,
        |  round(lw_nano::DOUBLE/1e9, 6) AS log_w,
        |  round(key_nano::DOUBLE/1e9, 6) AS key
        |FROM r WHERE rn <= 5 ORDER BY source, rn"""
        .stripMargin.replace("\n", " ")

  /** Shared PQ model CTEs: codebook by hash rank, per-(vec, subspace)
    * nearest-centroid assignment. Subspace slices are 1-based
    * inclusive [m·8+1 .. m·8+8]; every fold is left-to-right (DuckDB
    * list_reduce == Spark aggregate-with-0.0 since 0+x = x). */
  /** The corpus-as-doubles + codebook CTEs (b, cbv, cb) — shared by
    * the full-assignment form below and the candidate-restricted
    * serving oracle (pqServeSql), so the codebook spelling can never
    * drift between them. */
  private def pqBaseCtes: String =
    s"""b AS MATERIALIZED (SELECT vec_id, label,
       |  list_transform(embedding, v -> v::DOUBLE) AS ed FROM embeddings),
       |cbv AS (SELECT ed, row_number() OVER (ORDER BY
       |  ('0x'||substr(sha256(vec_id::VARCHAR||'#pq'),1,15))::BIGINT,
       |  vec_id) AS rc FROM b QUALIFY rc <= ${Similarity.PqC}),
       |cb AS MATERIALIZED (SELECT rc - 1 AS c, mm.m AS m,
       |  ed[mm.m*8+1 : mm.m*8+8] AS cv FROM cbv
       |  CROSS JOIN (SELECT unnest(range(0, ${Similarity.PqM})) AS m) mm)"""
      .stripMargin

  /** Per-(vec, subspace, centroid) d2 over a source CTE `src` (must
    * expose vec_id, ed) — the `ad` spelling, parameterized so the
    * serving oracle can restrict it to candidates. */
  private def pqAdCte(src: String): String =
    s"""(SELECT $src.vec_id, cb.m, cb.c,
       |  list_reduce(list_transform(range(1, 9),
       |    j -> ($src.ed[cb.m*8+j] - cb.cv[j]) * ($src.ed[cb.m*8+j] - cb.cv[j])),
       |    (x, y) -> x + y) AS d2
       |  FROM $src CROSS JOIN cb)""".stripMargin

  private def pqModelCtes: String =
    s"""$pqBaseCtes,
       |ad AS ${pqAdCte("b")},
       |asg AS MATERIALIZED (SELECT vec_id, m, c, d2 FROM ad
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY d2, c) = 1)""".stripMargin

  private def pqErrorSql: String =
    s"""WITH $pqModelCtes,
       |nv AS (SELECT vec_id, label,
       |  sqrt(list_reduce(list_transform(ed, v -> v * v), (x, y) -> x + y))
       |    AS norm FROM b),
       |e2 AS (SELECT vec_id,
       |  list_reduce(list(d2 ORDER BY m), (x, y) -> x + y) AS err2
       |  FROM asg GROUP BY vec_id),
       |er AS (SELECT nv.label, CASE WHEN nv.norm = 0 THEN 0.0
       |  ELSE sqrt(e2.err2) / nv.norm END AS pqerr
       |  FROM nv JOIN e2 USING (vec_id))
       |SELECT label, count(*)::BIGINT AS n,
       |  round(min(pqerr), 6) AS min_pqerr,
       |  round(max(pqerr), 6) AS max_pqerr,
       |  round(quantile_cont(pqerr, 0.5), 6) AS p50_pqerr
       |FROM er GROUP BY label ORDER BY label""".stripMargin.replace("\n", " ")

  private def pqRecallSql: String =
    s"""WITH $pqModelCtes,
       |qm AS (SELECT greatest(1, (count(*) + 255) // 256) AS m
       |  FROM embeddings),
       |nv AS MATERIALIZED (SELECT vec_id, ed,
       |  list_reduce(list_transform(ed, v -> v * v), (x, y) -> x + y) AS nv
       |  FROM b),
       |q AS MATERIALIZED (SELECT vec_id AS qid, ed AS q_ed, nv AS nq
       |  FROM nv WHERE vec_id % (SELECT m FROM qm) = 0),
       |lut AS (SELECT q.qid, cb.m, cb.c,
       |  list_reduce(list_transform(range(1, 9),
       |    j -> (q.q_ed[cb.m*8+j] - cb.cv[j]) * (q.q_ed[cb.m*8+j] - cb.cv[j])),
       |    (x, y) -> x + y) AS d
       |  FROM q CROSS JOIN cb),
       |lw AS MATERIALIZED (SELECT qid,
       |  list(d ORDER BY m, c) AS lv FROM lut GROUP BY qid),
       |aw AS MATERIALIZED (SELECT vec_id,
       |  list(c ORDER BY m) AS cs FROM asg GROUP BY vec_id),
       |scored AS MATERIALIZED (SELECT q.qid, nv.vec_id,
       |  (nv.nv + q.nq) - (2.0 * (${(1 to 64).map(i =>
            s"nv.ed[$i] * q.q_ed[$i]").mkString(" + ")})) AS l2,
       |  ${(0 until Similarity.PqM).map(m =>
            s"lw.lv[$m * ${Similarity.PqC} + aw.cs[${m + 1}] + 1]")
            .mkString(" + ")} AS adist
       |  FROM nv JOIN aw USING (vec_id) CROSS JOIN q
       |  JOIN lw USING (qid) WHERE nv.vec_id <> q.qid),
       |ex AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY l2, vec_id) AS rn
       |  FROM scored) x WHERE rn <= 10),
       |short AS MATERIALIZED (SELECT qid, vec_id, rn FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rn
       |  FROM scored) y WHERE rn <= ${Similarity.PqRescoreR}),
       |qt AS (SELECT qid AS bqid, vec_id AS bvec FROM short WHERE rn <= 10),
       |resc AS (SELECT scored.qid AS rqid, scored.vec_id AS rvec FROM scored
       |  JOIN short ON scored.qid = short.qid AND scored.vec_id = short.vec_id
       |  QUALIFY row_number() OVER (PARTITION BY scored.qid
       |    ORDER BY scored.l2, scored.vec_id) <= 10)
       |SELECT qid,
       |  sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
       |  round(sum(CASE WHEN bvec IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS recall,
       |  sum(CASE WHEN rvec IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit_r,
       |  round(sum(CASE WHEN rvec IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS recall_r
       |FROM ex LEFT JOIN qt ON qid = bqid AND vec_id = bvec
       |  LEFT JOIN resc ON qid = rqid AND vec_id = rvec
       |GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " ")

  private def bigramLmSql: String =
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
        |  FROM documents),
        |d0 AS (SELECT doc_id, source, len(tk)::BIGINT AS n_toks,
        |  tk[1] AS w0, tk FROM t WHERE len(tk) >= 1),
        |bgx AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
        |  unnest(tk[2:len(tk)]) AS w2 FROM d0 WHERE len(tk) >= 2),
        |bgd AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS c
        |  FROM bgx GROUP BY 1, 2, 3),
        |cb AS (SELECT w1, w2, sum(c)::BIGINT AS cb FROM bgd GROUP BY 1, 2),
        |cx AS (SELECT w1, sum(cb)::BIGINT AS cctx FROM cb GROUP BY 1),
        |tok AS (SELECT unnest(tk) AS w FROM d0),
        |cuw AS (SELECT w, count(*)::BIGINT AS cu FROM tok GROUP BY 1),
        |nn AS (SELECT sum(cu)::BIGINT AS n_corpus FROM cuw),
        |lp AS (SELECT cb.w1, cb.w2,
        |  CAST(round(ln(0.875::DOUBLE * (cb.cb::DOUBLE / cx.cctx::DOUBLE)
        |    + 0.125::DOUBLE * (cu2.cu::DOUBLE / nn.n_corpus::DOUBLE)) * 1e9)
        |    AS BIGINT) AS lp_nano
        |  FROM cb JOIN cx USING (w1) JOIN cuw cu2 ON cu2.w = cb.w2
        |  CROSS JOIN nn),
        |db AS (SELECT doc_id, sum(c * lp_nano)::BIGINT AS bg_nano
        |  FROM bgd JOIN lp USING (w1, w2) GROUP BY doc_id),
        |pd AS (SELECT d0.doc_id, d0.source, d0.n_toks,
        |  CAST(round(ln(cu0.cu::DOUBLE / nn.n_corpus::DOUBLE) * 1e9) AS BIGINT)
        |    + coalesce(db.bg_nano, 0) AS doc_nano
        |  FROM d0 JOIN cuw cu0 ON cu0.w = d0.w0 CROSS JOIN nn
        |  LEFT JOIN db USING (doc_id))
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  round(sum(doc_nano)::DOUBLE / sum(n_toks)::DOUBLE / 1e9, 6) AS avg_lp,
        |  round(quantile_cont(doc_nano::DOUBLE / n_toks::DOUBLE / 1e9, 0.5), 6)
        |    AS p50_doc_lp
        |FROM pd GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")

  /** q174/q175 oracle: full BM25 recompute in DuckDB. Conventions
    * mirrored token-for-token from Retrieval.bm25TopK: Lucene +1 idf,
    * ONE ln per term type → round(·1e9)::BIGINT, the tf factor's
    * pinned parenthesization with constants spelled as the same
    * parse-then-add ((1.2 + 1.0), never a pre-folded 2.2), per-term
    * contribution round(·/1000)::BIGINT, exact integer per-doc sums. */
  private def bm25Sql: String =
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
        |  FROM documents),
        |d0 AS (SELECT doc_id, source, len(tk)::BIGINT AS dl, tk
        |  FROM t WHERE len(tk) >= 1),
        |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
        |  FROM d0),
        |tf AS (SELECT doc_id, source, dl, w, count(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, source, dl, unnest(tk) AS w FROM d0)
        |  WHERE w IN ('dup', 'merge', 'window') GROUP BY 1, 2, 3, 4),
        |dft AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |idf AS (SELECT w, CAST(round(ln(
        |    (st.n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5)
        |    + 1.0) * 1e9) AS BIGINT) AS idf_nano
        |  FROM dft CROSS JOIN st),
        |sc AS (SELECT doc_id, source, CAST(round(idf_nano::DOUBLE *
        |    ((tf.tf::DOUBLE * (1.2 + 1.0)) / (tf.tf::DOUBLE + 1.2 *
        |      ((1.0 - 0.75) + 0.75 *
        |        ((dl::DOUBLE * st.n_docs::DOUBLE) / st.sum_dl::DOUBLE))))
        |    / 1000.0) AS BIGINT) AS s_micro
        |  FROM tf JOIN idf USING (w) CROSS JOIN st),
        |pd AS (SELECT doc_id, source, count(*)::BIGINT AS n_terms,
        |  sum(s_micro)::BIGINT AS s FROM sc GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (ORDER BY s DESC, doc_id) AS rank
        |  FROM pd)
        |SELECT rank::BIGINT AS rank, doc_id, source, n_terms,
        |  round(s::DOUBLE / 1e6, 6) AS score
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin.replace("\n", " ")

  /** q184/q185 oracle: percentile admission recompute — same rare-rate
    * definition (integer ratio), DuckDB quantile_cont(0.75) per source
    * (the q42 percentile parity), ties at the cutoff kept, '#qp'
    * kept-hash convention. */
  private def qualityAdmissionSql: String =
      """WITH dt AS (SELECT doc_id, source,
        |  ('0x'||substr(sha256(text||'#qp'),1,15))::BIGINT % 1000000000 AS th,
        |  w AS term, count(*)::BIGINT AS c
        |  FROM (SELECT doc_id, source, text,
        |    unnest(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) AS w FROM documents)
        |  GROUP BY 1, 2, 3, 4),
        |g AS (SELECT term, sum(c)::BIGINT AS cnt FROM dt GROUP BY 1),
        |nt AS (SELECT sum(c)::BIGINT AS n_total FROM dt),
        |pd AS (SELECT doc_id, source, th,
        |  sum(CASE WHEN g.cnt * 500 < nt.n_total THEN c ELSE 0 END)::DOUBLE
        |    / sum(c)::DOUBLE AS rate
        |  FROM dt JOIN g USING (term) CROSS JOIN nt GROUP BY 1, 2, 3),
        |ct AS (SELECT source, quantile_cont(rate, 0.75) AS cut
        |  FROM pd GROUP BY 1),
        |kept AS (SELECT pd.source, count(*)::BIGINT AS n_kept,
        |  sum(th)::BIGINT AS kept_hash_sum
        |  FROM pd JOIN ct USING (source) WHERE rate <= cut GROUP BY 1),
        |tot AS (SELECT source, count(*)::BIGINT AS n_in FROM pd GROUP BY 1)
        |SELECT tot.source, n_in, n_in - coalesce(n_kept, 0) AS n_dropped,
        |  coalesce(n_kept, 0) AS n_kept,
        |  coalesce(kept_hash_sum, 0) AS kept_hash_sum
        |FROM tot LEFT JOIN kept USING (source)
        |ORDER BY source""".stripMargin.replace("\n", " ")

  /** q182/q183 oracle: the batch form of [[bm25Sql]] — same CTEs, the
    * query-term membership stated as a VALUES table (generated from
    * Retrieval.Bm25BatchQueries so the two surfaces move in lockstep),
    * per-query rank via a partitioned row_number. */
  private def bm25BatchSql: String = {
    val qt = graft.pipeline.Retrieval.Bm25BatchQueries.flatMap {
      case (qid, q) => q.split(" ").filter(_.nonEmpty).distinct
        .map(w => s"($qid, '$w')")
    }.mkString(", ")
    val allTerms = graft.pipeline.Retrieval.Bm25BatchQueries
      .flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct
      .map(w => s"'$w'").mkString(", ")
    s"""WITH qt(query_id, w) AS (VALUES $qt),
       |t AS (SELECT doc_id, source,
       |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
       |  FROM documents),
       |d0 AS (SELECT doc_id, source, len(tk)::BIGINT AS dl, tk
       |  FROM t WHERE len(tk) >= 1),
       |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
       |  FROM d0),
       |tf AS (SELECT doc_id, source, dl, w, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, source, dl, unnest(tk) AS w FROM d0)
       |  WHERE w IN ($allTerms) GROUP BY 1, 2, 3, 4),
       |dft AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |idf AS (SELECT w, CAST(round(ln(
       |    (st.n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5)
       |    + 1.0) * 1e9) AS BIGINT) AS idf_nano
       |  FROM dft CROSS JOIN st),
       |sc AS (SELECT qt.query_id, doc_id, source, CAST(round(idf_nano::DOUBLE *
       |    ((tf.tf::DOUBLE * (1.2 + 1.0)) / (tf.tf::DOUBLE + 1.2 *
       |      ((1.0 - 0.75) + 0.75 *
       |        ((dl::DOUBLE * st.n_docs::DOUBLE) / st.sum_dl::DOUBLE))))
       |    / 1000.0) AS BIGINT) AS s_micro
       |  FROM tf JOIN idf USING (w) JOIN qt USING (w) CROSS JOIN st),
       |pd AS (SELECT query_id, doc_id, source, count(*)::BIGINT AS n_terms,
       |  sum(s_micro)::BIGINT AS s FROM sc GROUP BY 1, 2, 3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY s DESC, doc_id) AS rank FROM pd)
       |SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       |  source, n_terms, round(s::DOUBLE / 1e6, 6) AS score
       |FROM r WHERE rank <= 20
       |ORDER BY query_id, rank""".stripMargin.replace("\n", " ")
  }

  /** q178/q179 oracle: the cross-corpus LM recompute — model counts
    * from the even doc_ids, smoothed scoring of the odd ones, same
    * add-one/interpolation spelling token-for-token (unseen context →
    * the bigram ML term is 0.0; every pu denominator is the one
    * (n_model + v_model + 1) broadcast). */
  private def bigramLmCrossSql: String =
      """WITH tt AS (SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
        |  FROM documents),
        |md AS (SELECT * FROM tt WHERE doc_id % 2 = 0 AND len(tk) >= 1),
        |tg AS (SELECT * FROM tt WHERE doc_id % 2 <> 0 AND len(tk) >= 1),
        |mbg AS (SELECT unnest(tk[1:len(tk)-1]) AS w1,
        |  unnest(tk[2:len(tk)]) AS w2 FROM md WHERE len(tk) >= 2),
        |cb AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM mbg GROUP BY 1, 2),
        |cx AS (SELECT w1, sum(cb)::BIGINT AS cctx FROM cb GROUP BY 1),
        |cuw AS (SELECT w, count(*)::BIGINT AS cu
        |  FROM (SELECT unnest(tk) AS w FROM md) GROUP BY 1),
        |nv AS (SELECT sum(cu)::BIGINT AS n_model, count(*)::BIGINT AS v_model
        |  FROM cuw),
        |tbgx AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
        |  unnest(tk[2:len(tk)]) AS w2 FROM tg WHERE len(tk) >= 2),
        |tbg AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS c
        |  FROM tbgx GROUP BY 1, 2, 3),
        |lp AS (SELECT t.w1, t.w2, CAST(round(ln(
        |    0.875::DOUBLE * (CASE WHEN cx.cctx IS NOT NULL
        |      THEN coalesce(cb.cb, 0)::DOUBLE / cx.cctx::DOUBLE
        |      ELSE 0.0::DOUBLE END)
        |    + 0.125::DOUBLE * ((coalesce(cu2.cu, 0)::DOUBLE + 1.0)
        |      / (nv.n_model::DOUBLE + nv.v_model::DOUBLE + 1.0))) * 1e9)
        |    AS BIGINT) AS lp_nano
        |  FROM (SELECT DISTINCT w1, w2 FROM tbg) t
        |  LEFT JOIN cb ON cb.w1 = t.w1 AND cb.w2 = t.w2
        |  LEFT JOIN cx ON cx.w1 = t.w1
        |  LEFT JOIN cuw cu2 ON cu2.w = t.w2
        |  CROSS JOIN nv),
        |db AS (SELECT doc_id, sum(c * lp_nano)::BIGINT AS bg_nano
        |  FROM tbg JOIN lp USING (w1, w2) GROUP BY doc_id),
        |tok AS (SELECT tg.doc_id, count(*)::BIGINT AS n_toks,
        |  sum(CASE WHEN cuw.cu IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
        |  FROM (SELECT doc_id, unnest(tk) AS w FROM tg) tg
        |  LEFT JOIN cuw ON cuw.w = tg.w GROUP BY 1),
        |pd AS (SELECT tg.doc_id, tg.source, tok.n_toks, tok.n_oov,
        |  CAST(round(ln((coalesce(cu0.cu, 0)::DOUBLE + 1.0)
        |    / (nv.n_model::DOUBLE + nv.v_model::DOUBLE + 1.0)) * 1e9)
        |    AS BIGINT) + coalesce(db.bg_nano, 0) AS doc_nano
        |  FROM tg LEFT JOIN cuw cu0 ON cu0.w = tg.tk[1] CROSS JOIN nv
        |  LEFT JOIN db ON db.doc_id = tg.doc_id
        |  JOIN tok ON tok.doc_id = tg.doc_id)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  round(sum(doc_nano)::DOUBLE / sum(n_toks)::DOUBLE / 1e9, 6)
        |    AS avg_lp,
        |  round(quantile_cont(doc_nano::DOUBLE / n_toks::DOUBLE / 1e9, 0.5), 6)
        |    AS p50_doc_lp,
        |  round(sum(n_oov)::DOUBLE / sum(n_toks)::DOUBLE, 6) AS oov_rate
        |FROM pd GROUP BY source ORDER BY source""".stripMargin
        .replace("\n", " ")

  /** q176/q177 oracle: the brute-force quadratic reference — the plain
    * semantic predicate (levenshtein over 40-char prefixes <= 4) over
    * the bounded audit window, with only the lossless length guard the
    * operator also applies. Deliberately NOT an echo of the PassJoin
    * blocking: DuckDB verifies every window pair. */
  private def editPairsSql: String =
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS s
        |  FROM documents WHERE doc_id < 1000 AND length(text) >= 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.s, b.s)::BIGINT AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")

  private def intervalJoinSql: String =
      """WITH a AS (SELECT event_id AS anchor_id, epoch_us(ts) AS aus
        |  FROM events WHERE event_type = 'error' AND value > 250.0)
        |SELECT a.anchor_id, count(*)::BIGINT AS n_events,
        |  count(DISTINCT e.user_id)::BIGINT AS n_users
        |FROM a JOIN events e
        |  ON epoch_us(e.ts) >= a.aus - 300000000
        |  AND epoch_us(e.ts) <= a.aus + 300000000
        |GROUP BY a.anchor_id ORDER BY a.anchor_id""".stripMargin.replace("\n", " ")

  private def weightedSampleSql: String =
      """WITH h AS (SELECT source, doc_id, n_chars,
        |  ln(greatest(
        |    ('0x'||substr(sha256(doc_id::VARCHAR||'#ws'),1,15))::BIGINT,
        |    1)::DOUBLE / 1152921504606846976.0::DOUBLE)
        |    / n_chars::DOUBLE AS k0
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY k0 DESC, doc_id) AS rn FROM h)
        |SELECT source, rn::BIGINT AS rn, doc_id, n_chars,
        |  round(k0, 9) AS es_key
        |FROM r WHERE rn <= 50 ORDER BY source, rn""".stripMargin.replace("\n", " ")
}
