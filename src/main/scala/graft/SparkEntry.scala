package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (or a §7.4
  * extension), and `oracleSql` holds the DuckDB-equivalent SQL the driver
  * hash-compares against on the same parquet tables. Column names and row
  * order are aligned on both sides; double aggregates are routed through
  * exact decimals (see graft.ops package doc) so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.pricingSummary _,
    "q02_revenue_by_nation" -> Relational.revenueByNation _,
    "q03_top_orders_per_customer" -> Relational.topOrdersPerCustomer _,
    "q04_rollup_acctbal" -> Relational.rollupAcctbal _,
    "q05_semi_join_customers" -> Relational.customersWithFinishedOrders _,
    "q06_anti_join_customers" -> Relational.customersWithoutOrders _,
    "q07_top_orders" -> Relational.topOrders _,
    "q08_distinct_parts" -> Relational.distinctPartsPerFlag _,
    "q09_setops_customers" -> Relational.setOpsCustomers _,
    "q10_forecast_revenue" -> Relational.forecastRevenue _,
    "q11_events_hourly" -> Events.hourlyCounts _,
    "q12_user_sessions" -> Events.userSessions _,
    "q13_doc_stats" -> TextOps.docStats _,
    "q14_token_frequency" -> TextOps.tokenFrequency _,
    "q15_lang_id" -> TextOps.langIdConfusion _,
    "q16_quality_by_source" -> TextOps.qualityBySource _,
    "q17_exact_dedup" -> Dedup.exactDuplicates _,
    "q18_minhash_sigs" -> Dedup.minhashSignatures _,
    "q19_neardup_pairs" -> Dedup.nearDupPairs _,
    "q20_simhash" -> Dedup.simhashFingerprints _,
    "q21_cosine_topk" -> Similarity.cosineTopK _,
    "q22_label_knn" -> Similarity.labelKnn _,
    "q23_label_centroids" ->
      ((s: SparkSession, d: String) => Similarity.labelCentroids(s, d)),
    "q24_asof_purchase_view" -> Events.purchaseViewAsof _,
    "q25_media_features" -> Multimodal.featureStats _,
    "q26_approx_distinct_users" -> Events.approxDistinctUsers _,
    "q27_cube_events" -> Events.cubeEventTypeHour _,
    "q28_ivf_knn" -> ((s: SparkSession, d: String) => Similarity.ivfKnn(s, d)),
    // LSH/k-means queries pass the graded parameterization EXPLICITLY
    // from the constants below — the same constants the oracle-SQL
    // builders interpolate — so neither side can drift via a silent
    // default change on the other.
    "q29_lsh_ann" -> ((s: SparkSession, d: String) =>
      Similarity.lshAnn(s, d, LshAnnTables, LshAnnBits)),
    "q30_embedding_neardups" -> ((s: SparkSession, d: String) =>
      Similarity.embeddingNearDups(s, d, NearDupLshTables, NearDupLshBits)),
    "q31_simhash_neardups" -> Dedup.simhashNearDups _,
    "q32_range_join_windows" -> Events.eventsInWindows _,
    "q33_kmv_distinct_users" -> Events.kmvDistinctUsers _,
    "q34_running_spend" -> Relational.customerRunningSpend _,
    "q35_median_order_value" -> Relational.medianOrderValue _,
    "q36_daily_type_pivot" -> Events.dailyTypePivot _,
    "q37_sliding_windows" -> Events.slidingWindowCounts _,
    "q38_ngram_jaccard_join" ->
      ((s: SparkSession, d: String) => Dedup.ngramJaccardJoin(s, d)),
    "q39_winnow_fingerprints" ->
      ((s: SparkSession, d: String) => TextOps.winnowFingerprints(s, d)),
    "q40_dedup_clusters" -> Dedup.dedupClusters _,
    "q41_lsh_multiprobe" -> ((s: SparkSession, d: String) =>
      Similarity.lshAnnMultiProbe(s, d, MultiProbeTables, MultiProbeBits)),
    "q42_kmeans_clusters" -> ((s: SparkSession, d: String) =>
      Clustering.kmeans(s, d, KmeansK, KmeansIters)),
    "q43_ivf_learned_knn" -> ((s: SparkSession, d: String) =>
      Clustering.ivfLearnedKnn(s, d, KmeansK, KmeansIters)),
    "q44_hash_split" -> Sampling.hashSplit _,
    "q45_training_pipeline" -> TrainingPipeline.curatedSplit _,
    "q46_repetition_stats" -> TextOps.repetitionStats _,
    "q47_decontaminate" -> Dedup.contaminationReport _,
    "q48_pii_scrub" -> Privacy.piiScrub _,
    "q49_stratified_cap" -> Sampling.stratifiedCap _,
    "q50_tfidf_terms" ->
      ((s: SparkSession, d: String) => TextOps.tfidfTopTerms(s, d)),
    "q51_mixture_sample" -> Sampling.mixtureSample _,
    "q52_token_shards" ->
      ((s: SparkSession, d: String) => Sampling.tokenShards(s, d)),
    "q53_grouped_quantiles" ->
      ((s: SparkSession, d: String) =>
        Relational.groupedQuantiles(s, d, QuantilePcts)),
    "q54_duplicate_spans" ->
      ((s: SparkSession, d: String) => Dedup.duplicateSpans(s, d, SpanWindow)),
    "q55_decontaminate_wide" ->
      ((s: SparkSession, d: String) =>
        Dedup.contaminationReportAt(s, d, WideGramWidth)),
    "q56_block_dedup" ->
      ((s: SparkSession, d: String) => Dedup.blockDedup(s, d, BlockSize)),
    "q57_semantic_dedup" ->
      ((s: SparkSession, d: String) =>
        Clustering.semanticDedup(s, d, KmeansK, KmeansIters, SemDedupTau)),
    "q58_lm_quality" -> ((s: SparkSession, d: String) =>
      TextOps.lmQualityScore(s, d)),
    "q59_decontaminate_bloom" ->
      ((s: SparkSession, d: String) => Dedup.contaminationReportBloom(s, d)),
    "q60_importance_weights" ->
      ((s: SparkSession, d: String) =>
        Importance.importanceReport(s, d, DsirTargetLang)),
    "q61_quantized_knn" ->
      ((s: SparkSession, d: String) => Quantization.quantizedTopK(s, d, QuantTopK)),
    "q62_audio_features" -> Multimodal.audioStats _,
    "q63_token_accounting" -> TextOps.tokenAccounting _,
    "q64_funnel" -> Events.funnelStages _,
    "q65_retention_cohorts" -> Events.retentionCohorts _,
    "q66_ivf_quantized_knn" -> ((s: SparkSession, d: String) =>
      Quantization.ivfQuantizedKnn(s, d, KmeansK, KmeansIters, QuantTopK)),
    "q67_scd2_history" -> Cdc.scd2History _,
    "q68_cdc_apply" -> Cdc.cdcApply _,
    "q69_copurchase_pagerank" -> ((s: SparkSession, d: String) =>
      Graph.copurchasePagerank(s, d, PagerankIters)),
    "q70_copurchase_triangles" -> Graph.copurchaseTriangles _,
    "q71_zorder_layout" -> ((s: SparkSession, d: String) =>
      Layout.zorderBucketStats(s, d, ZorderBits, ZorderBucketBits)),
    "q72_approx_quantile_bound" -> ((s: SparkSession, d: String) =>
      Events.approxQuantileBound(s, d, ApproxQuantileAccuracy)),
    "q73_fuzzy_name_match" -> EntityMatch.fuzzyNameMatches _,
    "q74_grouping_sets" -> Relational.groupingSetsLineitem _,
    "q75_decayed_spend" -> ((s: SparkSession, d: String) =>
      Features.decayedSpendOf(Tables(s, d, "orders"), DecayLags)),
    "q76_minmax_embeddings" -> Features.minmaxScaledEmbeddings _,
    "q77_above_nation_avg" -> Relational.customersAboveNationAvg _,
    "q78_quality_audit" -> Quality.qualityAudit _,
    "q79_incremental_agg" -> Cdc.incrementalCustomerAgg _,
    "q80_sliding_distinct_users" -> Events.slidingDistinctUsers _,
    "q81_pit_enrichment" -> Cdc.pointInTimeEnrichment _,
    "q82_embedding_drift" -> ((s: SparkSession, d: String) =>
      Features.embeddingDriftReport(s, d, DriftBuckets)),
    "q83_packed_sequences" -> ((s: SparkSession, d: String) =>
      Sampling.packSequences(s, d, SeqPackLen)),
    "q84_hard_negatives" -> ((s: SparkSession, d: String) =>
      Similarity.hardNegatives(s, d, HardNegK)),
    "q85_snapshot_dedup" -> Dedup.snapshotDedup _,
    "q86_copurchase_communities" -> ((s: SparkSession, d: String) =>
      Graph.copurchaseCommunities(s, d, LpaIters)),
    "q87_epoch_order" -> ((s: SparkSession, d: String) =>
      Sampling.epochOrder(s, d, EpochCount)),
    "q88_curated_packing" -> ((s: SparkSession, d: String) =>
      TrainingPipeline.curatedPackedSequences(s, d, SeqPackLen)),
    "q89_props_extract" -> Events.propsMetrics _,
    "q90_seeded_pagerank" -> ((s: SparkSession, d: String) =>
      Graph.seededPagerank(s, d, PagerankIters)),
    "q91_binary_hamming_knn" -> ((s: SparkSession, d: String) =>
      Quantization.binaryHammingTopK(s, d, QuantTopK)),
    "q92_cdc_chunk_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.cdcChunkDedup(s, d, CdcChunkWindow, CdcChunkMask)),
    "q93_preference_pairs" -> ((s: SparkSession, d: String) =>
      Quality.preferencePairs(s, d, PrefPairsPerGroup)),
    "q94_decontaminate_spans" -> ((s: SparkSession, d: String) =>
      Dedup.decontaminateSpans(s, d, 3)),
    "q95_range_layout" -> ((s: SparkSession, d: String) =>
      Layout.rangeLayoutStats(s, d, RangeLayoutBuckets)),
    "q96_dedup_threshold_sweep" -> Dedup.thresholdSensitivity _,
    "q97_measure_unpivot" -> Relational.measureUnpivot _,
    "q98_bpe_pairs" -> ((s: SparkSession, d: String) =>
      TextOps.bpePairCounts(s, d, BpePairsK)),
    "q99_inverted_index" -> ((s: SparkSession, d: String) =>
      TextOps.invertedIndex(s, d, InvertedIndexMaxDf)),
    "q100_oov_rates" -> ((s: SparkSession, d: String) =>
      TextOps.vocabOovRates(s, d, OovVocabSize)),
    "q101_bpe_merges" -> ((s: SparkSession, d: String) =>
      TextOps.bpeMerges(s, d, BpeMergeSteps)),
    "q102_bpe_encode_stats" -> ((s: SparkSession, d: String) =>
      TextOps.bpeEncodeStats(s, d, BpeMergeSteps)),
    "q103_embedding_decontam" -> ((s: SparkSession, d: String) =>
      Similarity.embeddingDecontamination(s, d, EmbedDecontTau)),
    "q104_session_sequences" -> ((s: SparkSession, d: String) =>
      Events.sessionSequences(s, d, SessionSeqTopK)),
    "q105_split_leakage" -> Sampling.splitLeakageAudit _,
    "q106_mixture_weights" -> Sampling.mixtureWeights _,
    "q107_vocab_coverage" -> ((s: SparkSession, d: String) =>
      TextOps.vocabCoverage(s, d, VocabCurveSizes)),
    "q108_gopher_gate" -> (TextOps.gopherGate _),
    "q109_cms_heavy_hitters" -> ((s: SparkSession, d: String) =>
      TextOps.cmsHeavyHitters(s, d, CmsWidth, CmsDepth, CmsTopK)),
    "q110_hll_distinct" -> ((s: SparkSession, d: String) =>
      Events.hllDistinctUsers(s, d, HllRegisters, HllAlphaPerMille)),
    "q111_cross_source_neardups" -> Dedup.crossSourceNearDups _,
    "q112_normalized_dedup" -> Dedup.normalizedDedupGain _,
    "q113_ngram_novelty" -> TextOps.ngramNovelty _,
    "q114_cluster_split" -> ((s: SparkSession, d: String) =>
      Sampling.clusterAwareSplit(s, d)),
    "q115_token_budget" -> ((s: SparkSession, d: String) =>
      Sampling.tokenBudgetAllocation(s, d, TokenBudget)),
    "q116_session_transitions" -> Events.sessionTransitions _,
    "q117_pq_knn" -> ((s: SparkSession, d: String) =>
      Quantization.pqAdcTopK(s, d, PqM, PqSubDim, PqKSub, PqIters, QuantTopK)),
    "q118_kmv_vocab_overlap" -> TextOps.kmvVocabOverlap _,
    "q119_pmi_collocations" -> TextOps.pmiCollocations _,
    "q120_purchase_hits" -> ((s: SparkSession, d: String) =>
      Graph.purchaseHits(s, d, HitsIters, HitsTopK)),
    "q121_related_docs" -> ((s: SparkSession, d: String) =>
      TextOps.relatedDocs(s, d, RelatedDfCap, RelatedTopK)),
    "q122_markov_eval" -> Events.markovEval _,
    "q123_rag_chunks" -> ((s: SparkSession, d: String) =>
      TextOps.ragChunks(s, d, RagChunkSize, RagOverlap)),
    "q124_volume_bursts" -> Events.volumeBursts _,
    "q125_attribution" -> ((s: SparkSession, d: String) =>
      Events.purchaseAttribution(s, d, AttrWindowSec)),
    "q126_rrf_fusion" -> ((s: SparkSession, d: String) =>
      Similarity.rrfFusion(s, d, RrfKPerSystem, RrfKOut, RrfKConst,
        RelatedDfCap)),
    "q127_snapshot_diff" -> Cdc.snapshotDiff _,
    "q128_weighted_quantiles" -> TextOps.weightedLengthQuantiles _,
    "q129_image_neardups" -> ((s: SparkSession, d: String) =>
      Multimodal.imageNearDups(s, d, ImgHammingMax)),
    "q130_audio_neardups" -> ((s: SparkSession, d: String) =>
      Multimodal.audioNearDups(s, d, ImgHammingMax)),
    "q131_learning_curve" -> ((s: SparkSession, d: String) =>
      Sampling.learningCurveTiers(s, d, CurveTiers)),
    "q132_conversion_delay" -> Events.conversionDelay _,
    "q133_skew_report" -> SkewJoin.skewReport _,
    "q134_vocab_maintenance" -> ((s: SparkSession, d: String) =>
      TextOps.vocabMaintenance(s, d, VocabMaintSize, VocabPromoteMin,
        VocabMaintTopK)),
    "q135_modality_audit" -> Quality.modalityAudit _,
    "q136_ab_readout" -> Events.abReadout _,
    "q137_norm_outliers" -> Similarity.normOutliers _,
    "q138_dedup_savings" -> Dedup.dedupSavings _,
    "q139_filter_chain" -> ((s: SparkSession, d: String) =>
      TextOps.filterChain(s, d, FilterChainQualityMin)),
    "q140_neardup_eval" -> Dedup.nearDupEval _,
    "q141_token_drift" -> TextOps.tokenDrift _,
    "q142_assoc_rules" -> ((s: SparkSession, d: String) =>
      Graph.assocRules(s, d, AssocMinPair, AssocTopK)),
    "q143_deletion_audit" -> ((s: SparkSession, d: String) =>
      Privacy.deletionAudit(s, d, ForgetPct)),
    "q144_mmr_rerank" -> ((s: SparkSession, d: String) =>
      Similarity.mmrRerank(s, d, MmrProbes, MmrCand, MmrK)),
    "q145_trimmed_stats" -> ((s: SparkSession, d: String) =>
      Events.trimmedStats(s, d, TrimPct)),
    "q146_rfm_segments" -> Relational.rfmSegments _,
    "q147_quality_dup_overlap" -> Dedup.qualityDupOverlap _,
    "q148_dim_stats" -> Features.dimStats _,
    "q149_k_anonymity" -> ((s: SparkSession, d: String) =>
      Privacy.kAnonymity(s, d, KAnonK)),
    "q150_table_stats" -> Stats.tableStats _,
    "q151_ann_recall_ladder" -> ((s: SparkSession, d: String) =>
      Similarity.annRecallLadder(s, d, QuantTopK, LshAnnTables, LshAnnBits,
        PqM, PqSubDim, PqKSub, PqIters)),
    "q152_shard_rebalance" -> ((s: SparkSession, d: String) =>
      Sampling.shardRebalance(s, d, RingShards, RingVnodes)),
    "q153_join_estimate" -> Stats.joinEstimates _,
    "q154_ab_bootstrap" -> ((s: SparkSession, d: String) =>
      Events.abBootstrap(s, d, BootReps)),
    "q155_retrieval_eval" -> ((s: SparkSession, d: String) =>
      Similarity.retrievalLabelEval(s, d, RetrievalEvalK)),
    "q156_completeness_gate" -> ((s: SparkSession, d: String) =>
      Events.completenessGate(s, d, GateWindowDays, GateMinPrior)),
    "q157_order_aging" -> Relational.orderAging _,
    "q158_revenue_bridge" -> ((s: SparkSession, d: String) =>
      Relational.revenueBridge(s, d, BridgeY1, BridgeY2)),
    "q159_equidepth_histograms" -> ((s: SparkSession, d: String) =>
      Stats.equidepthHistograms(s, d, HistBuckets)),
    "q160_selectivity_audit" -> ((s: SparkSession, d: String) =>
      Stats.selectivityAudit(s, d, HistBuckets)),
    "q161_cohort_ltv" -> Events.cohortLtv _,
    "q162_supplier_hhi" -> Relational.supplierHhi _,
    "q163_hll_growth_curve" -> ((s: SparkSession, d: String) =>
      Events.hllGrowthCurve(s, d, HllRegisters, HllAlphaPerMille)),
    "q164_zonemap_report" -> ((s: SparkSession, d: String) =>
      Layout.zonemapReport(s, d, ZoneFiles)),
    "q165_active_users" -> Events.activeUsers _,
    "q166_repeat_purchase" -> Events.repeatPurchase _,
    "q167_dedup_report_suite" -> Dedup.dedupReportSuite _,
    "q168_cuped_readout" -> Events.cupedReadout _,
    "q169_km_retention" -> Events.kmRetention _,
    "q170_lateness_profile" -> Events.latenessProfile _,
    "q171_benford_audit" -> Relational.benfordAudit _,
    "q172_theil_sen_trend" -> Events.theilSenTrend _,
    "q173_forecast_backtest" -> Events.forecastBacktest _,
    "q174_abc_classification" -> Relational.abcClassification _,
    "q175_distinctive_terms" -> ((s, d) => TextOps.distinctiveTerms(s, d)),
    "q176_gini_spend" -> Relational.giniSpend _,
    "q177_inflight_timeline" -> Relational.inflightTimeline _,
    "q178_compaction_plan" -> ((s, d) => Layout.compactionPlan(s, d)),
    "q179_skyline_parts" -> Relational.skylineParts _,
    "q180_control_chart" -> Events.controlChart _,
    "q181_davies_bouldin" -> ((s, d) => Clustering.daviesBouldin(s, d)),
    "q182_weekday_profile" -> Events.weekdayProfile _,
    "q183_strong_kcore" -> ((s, d) => Graph.strongKCoreLadder(s, d)),
    "q184_new_vs_returning" -> Events.newVsReturning _,
    "q185_l_diversity" -> ((s, d) => Privacy.lDiversity(s, d)),
    "q186_sla_compliance" -> ((s, d) => Relational.slaCompliance(s, d)),
    "q187_cusum_chart" -> Events.cusumChart _,
    "q188_mann_kendall" -> Events.mannKendallTrend _,
    "q189_gini_features" -> Features.giniFeatureRank _,
    "q190_duplicate_payments" -> ((s, d) => Relational.duplicatePayments(s, d)),
    "q191_reconciliation" -> Relational.reconciliationAudit _,
    "q192_weekday_chi2" -> Events.weekdayChi2 _,
    "q193_lorenz_deciles" -> Relational.lorenzDeciles _,
    "q194_two_proportion_z" -> ((s, d) => Events.twoProportionZ(s, d)),
    "q195_supplier_returns" -> Relational.supplierReturnScreen _,
    "q196_abc_xyz_matrix" -> Relational.abcXyzMatrix _,
    "q197_price_dispersion" -> Relational.priceDispersion _,
    "q198_interarrival_dispersion" -> Events.interarrivalDispersion _,
    "q199_value_drift_chi2" -> Events.valueDriftChi2 _,
    "q200_evergreen_bestsellers" -> ((s, d) =>
      Relational.evergreenBestsellers(s, d)),
    "q201_fk_coverage" -> Relational.fkCoverageAudit _,
    "q202_fd_profile" -> Relational.fdProfile _,
    "q203_token_burstiness" -> ((s, d) => TextOps.tokenBurstiness(s, d)),
    "q204_market_share_shift" -> Relational.marketShareShift _,
    "q205_dom_profile" -> Events.domProfile _,
    "q206_concentration_ratios" -> Relational.concentrationRatios _,
    "q207_promo_lift" -> Relational.promoLift _,
    "q208_dead_stock" -> ((s, d) => Relational.deadStock(s, d)),
    "q209_degree_census" -> ((s, d) => Graph.degreeCensus(s, d)),
    "q210_knn_hubness" -> ((s, d) => Similarity.knnHubness(s, d)),
    "q211_clustering_profile" -> ((s, d) => Graph.clusteringProfile(s, d)),
    "q212_mann_whitney" -> ((s, d) => RankTests.mannWhitney(s, d)),
    "q213_kruskal_wallis" -> RankTests.kruskalWallis _,
    "q214_ewma_chart" -> Events.ewmaChart _,
    "q215_acf_daily" -> Events.acfDaily _,
    "q216_t_closeness" -> ((s, d) => Privacy.tCloseness(s, d)),
    "q217_heaps_growth" -> TextOps.heapsGrowth _,
    "q218_spearman" -> RankTests.spearman _,
    "q219_naive_bayes" -> Features.naiveBayes _,
    "q220_hampel_outliers" -> Events.hampelOutliers _,
    "q221_ks_test" -> ((s, d) => RankTests.ksTest(s, d)),
    "q222_capture_recapture" -> Events.captureRecapture _,
    "q223_apriori_ladder" -> ((s, d) => Graph.aprioriLadder(s, d)),
    "q224_nb_calibration" -> Features.nbCalibration _,
    "q225_classifier_report" -> Features.classifierReport _,
    "q226_sourcing_risk" -> Relational.sourcingRisk _,
    "q227_cosine_silhouette" -> Similarity.cosineSilhouette _,
    "q228_discount_response" -> Relational.discountResponse _,
    "q229_vocab_richness" -> TextOps.vocabRichness _,
    "q230_kendall_tau" -> RankTests.kendallTau _,
    "q231_pettitt_changepoint" -> RankTests.pettitt _,
    "q232_runs_test" -> RankTests.runsTest _,
    "q233_link_prediction" -> ((s, d) => Graph.linkPrediction(s, d)),
    "q234_holt_chart" -> Events.holtChart _,
    "q235_bh_fdr" -> Relational.supplierFdr _,
    "q236_source_divergence" -> TextOps.sourceDivergence _,
    "q237_load_profile" -> Events.loadProfile _,
    "q238_price_anova" -> Relational.priceAnova _,
    "q239_rand_index" -> ((s, d) =>
      Clustering.randIndex(s, d, KmeansK, KmeansIters)),
    "q240_readability" -> TextOps.readability _,
    "q241_log_rank" -> Events.logRank _,
    "q242_seasonal_strength" -> Events.seasonalStrength _,
    "q243_mondrian" -> ((s, d) =>
      Privacy.mondrian(s, d, MondrianK, MondrianRounds)),
    "q244_vocab_containment" -> TextOps.vocabContainment _,
    "q245_user_dispersion" -> Events.userDispersion _,
    "q246_zipf_profile" -> TextOps.zipfProfile _,
    "q247_cramers_v" -> Relational.cramersV _,
    "q248_mcnemar" -> Features.mcnemar _,
    "q249_rmst" -> ((s, d) => Events.rmst(s, d)),
    "q250_type_cooccurrence" -> Events.typeCooccurrence _,
    "q251_link_prediction_capped" -> ((s, d) =>
      Graph.linkPredictionCapped(s, d, 20, LinkPredCap)),
    // q252/q253 put the reference's OWN transform semantics
    // (transform.py:38-168) under the hash-match regime: they run the
    // production Transforms chain over the checked-in raw-fixture
    // parquet (frozen from the extract.py:271-276 document shape by
    // graft.tools.FreezeSpotifyFixture) — the sf dir is unused.
    "q252_spotify_flatten" -> ((s, _) => {
      val raw = s.read.schema(graft.spotify.Schemas.raw)
        .parquet(SpotifyFixture)
      graft.spotify.Transforms.mergeTracksFeatures(
        graft.spotify.Transforms.tracks(raw, Some(FixtureDate)),
        graft.spotify.Transforms.audioFeatures(raw, Some(FixtureDate)))
        .orderBy("track_id")
    }),
    "q253_spotify_albums" -> ((s, _) =>
      graft.spotify.Transforms.albums(
        s.read.schema(graft.spotify.Schemas.raw).parquet(SpotifyFixture),
        Some(FixtureDate))
        .orderBy("album_id")),
    "q254_lagged_spearman" -> ((s, d) =>
      RankTests.laggedSpearman(s, d, LaggedSpearmanMaxLag)),
    "q255_truncated_recall" -> ((s, d) =>
      Similarity.truncatedRecall(s, d)),
    "q256_friedman" -> RankTests.friedman _,
    "q257_hubness_sampled" -> ((s, d) =>
      Similarity.knnHubnessSampled(s, d)),
    "q258_ndcg" -> ((s, d) => Similarity.ndcgAtK(s, d)),
    "q259_page_trend" -> RankTests.pageTrend _,
    "q260_cliffs_delta" -> ((s, d) => RankTests.cliffsDelta(s, d)),
    "q261_minhash_accuracy" -> Dedup.minhashAccuracy _,
    "q262_competing_risks" -> Events.competingRisks _,
    "q263_gate_ablation" -> TextOps.gateAblation _,
    "q264_theil_decomposition" -> Relational.theilDecomposition _,
    "q265_label_noise" -> ((s, d) => Similarity.labelNoise(s, d)),
    "q266_ivf_probe_sweep" -> ((s, d) =>
      Similarity.ivfProbeSweep(s, d)),
    "q267_dedup_scaling" -> Dedup.dedupScalingCurve _,
    "q268_mutual_information" -> Relational.mutualInformation _,
    "q269_source_length_drift" -> RankTests.sourceLengthDrift _,
    "q270_join_advisor" -> Stats.joinAdvisor _,
  )

  /** Chained-CTE replay of one k's peeling (24 rounds — past-fixpoint
    * rounds are no-ops; see Graph.kCoreLadderOf). Reads the shared
    * strong-edge CTE `se`.
    */
  private def kcoreCtes(k: Int, rounds: Int): String = {
    val base = s"c${k}n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM se)"
    val rs = (1 to rounds).map(i =>
      s"""c${k}n$i AS MATERIALIZED (
         |  SELECT src AS id FROM se
         |  WHERE src IN (SELECT id FROM c${k}n${i - 1})
         |    AND dst IN (SELECT id FROM c${k}n${i - 1})
         |  GROUP BY src HAVING COUNT(*) >= $k)""".stripMargin)
    (base +: rs).mkString(",\n")
  }

  private def kcoreArmSql(k: Int, rounds: Int): String =
    s"""SELECT CAST($k AS BIGINT) AS k,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c${k}n$rounds)
       |    AS n_core_nodes,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM se
       |   WHERE src IN (SELECT id FROM c${k}n$rounds)
       |     AND dst IN (SELECT id FROM c${k}n$rounds)) AS n_core_edges"""
      .stripMargin

  /** DuckDB scalar subquery computing the portable m-register HLL NDV
    * of `$t.$c` — the bit-level replay of `Stats.ndvSketch`, shared by
    * the q150 and q153 oracles.
    */
  private def hllNdvSql(t: String, c: String): String = {
    // derived from Stats.M exactly as Stats.ndvSketch derives it, so a
    // change to M can never desynchronize the oracle from the sketch
    val kMax = 41 - Integer.numberOfTrailingZeros(Stats.M)
    val num = Stats.AlphaPerMille * Stats.M * Stats.M * (1L << kMax)
    s"""(WITH h AS (
       |     SELECT CAST('0x' || substr(md5('hll:' || CAST($c AS VARCHAR)),
       |       1, 10) AS BIGINT) AS h
       |     FROM $t WHERE $c IS NOT NULL),
       |   r AS (SELECT h % ${Stats.M} AS idx,
       |     CASE WHEN h // ${Stats.M} = 0 THEN $kMax
       |          ELSE $kMax - length(bin(h // ${Stats.M})) END AS rho
       |     FROM h),
       |   reg AS (SELECT idx, MAX(rho) AS mj FROM r GROUP BY idx),
       |   s AS (SELECT COUNT(*) AS np,
       |     CAST(SUM(1::BIGINT << ($kMax - mj)) AS BIGINT) AS sp FROM reg)
       |   SELECT $num // (1000 * (sp + (${Stats.M} - np) *
       |     ${1L << kMax})) FROM s)""".stripMargin
  }

  /** q47's oracle, shared verbatim by q59: the bloom-prefiltered
    * variant must produce the IDENTICAL contamination report (no false
    * negatives in the sketch, false positives removed by the exact
    * join), so both grade against one SQL.
    */
  private val ContaminationOracleSql: String =
    """WITH bench AS (
      |  SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 100 = 0),
      |train AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
      |  WHERE doc_id % 100 = 0),
      |tg AS (
      |  SELECT doc_id, unnest(sh) AS gram FROM (
      |    SELECT doc_id,
      |      CASE WHEN len(toks) >= 3 THEN
      |        list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      |      ELSE [] END AS sh
      |    FROM (SELECT doc_id,
      |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |          FROM train) x) y),
      |bg AS (
      |  SELECT bench_id, unnest(sh) AS gram FROM (
      |    SELECT bench_id,
      |      CASE WHEN len(toks) >= 3 THEN
      |        list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      |      ELSE [] END AS sh
      |    FROM (SELECT bench_id,
      |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |          FROM bench) x) y)
      |SELECT tg.doc_id,
      |  COUNT(DISTINCT bg.bench_id) AS n_benchmarks,
      |  COUNT(DISTINCT tg.gram) AS n_shared_grams
      |FROM tg JOIN bg ON tg.gram = bg.gram
      |GROUP BY tg.doc_id
      |ORDER BY tg.doc_id""".stripMargin

  /** DuckDB SQL for sign-LSH bucket column `b<t>` over the global
    * hyperplanes [t*bits, (t+1)*bits) — must mirror
    * `Similarity.hyperplanes` / `Similarity.lshBucketed` exactly: same
    * md5("p_i") first-hex-digit parity rule, same global plane indexing,
    * bit p-lo of the bucket is the sign of plane p's dot product.
    * (Generated because q29 runs 8 tables and q30 12-bit buckets — 32
    * and 24 plane expressions respectively, unmaintainable by hand.)
    */
  private def lshBucketSql(t: Int, bits: Int): String = {
    val lo = t * bits
    s"""    CAST(list_sum(list_transform(range($lo, ${lo + bits}), p ->
       |      CASE WHEN list_reduce(list_transform(range(1, 65),
       |          i -> e[i] * CASE WHEN substr(md5(p::VARCHAR || '_' || i::VARCHAR), 1, 1)
       |               IN ('1','3','5','7','9','b','d','f')
       |               THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END),
       |          (a2, b2) -> a2 + b2) >= 0
       |      THEN (1 << (p - $lo)) ELSE 0 END)) AS BIGINT) AS b$t""".stripMargin
  }

  /** CTE chain producing the q19 near-dup `pairs(doc_a, doc_b, jaccard)`
    * set — spliced into both q19's oracle (plain WITH) and q40's (WITH
    * RECURSIVE; in DuckDB the RECURSIVE keyword applies to the whole CTE
    * list, so non-recursive members are unaffected). Deliberately
    * doc-level banding, NOT a mirror of the Spark dedupe-before-LSH
    * plan — the two formulations agreeing is part of what q19 checks.
    */
  private val nearDupPairCtes: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
      |  WHERE doc_id % 100 = 0),
      |d AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM corpus),
      |sg AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      |    ELSE [] END AS shingles
      |  FROM d),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
      |    list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
      |    list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
      |    list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
      |  FROM sg),
      |bands AS (
      |  SELECT doc_id, 0 AS band, mh0 AS h FROM sig
      |  UNION ALL SELECT doc_id, 1, mh1 FROM sig
      |  UNION ALL SELECT doc_id, 2, mh2 FROM sig
      |  UNION ALL SELECT doc_id, 3, mh3 FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
      |j AS (
      |  SELECT doc_a, doc_b,
      |    len(list_intersect(sa.shingles, sb.shingles)) AS n_common,
      |    len(sa.shingles) AS na, len(sb.shingles) AS nb
      |  FROM cand
      |  JOIN sig sa ON cand.doc_a = sa.doc_id
      |  JOIN sig sb ON cand.doc_b = sb.doc_id),
      |pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
      |  FROM j
      |  WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5)""".stripMargin

  /** Transitive closure over `pairs` → `comp(doc_id, canonical_id)`.
    * Appended after `nearDupPairCtes` under WITH RECURSIVE; shared by
    * q40 (the clusters themselves) and q45 (the curation pipeline's
    * dedup stage).
    */
  private val componentCtes: String =
    """edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, lbl) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.doc_id = e.src),
      |comp AS (
      |  SELECT doc_id, CAST(min(lbl) AS BIGINT) AS canonical_id
      |  FROM reach GROUP BY doc_id)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q03_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q04_rollup_acctbal" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal,
        |  COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q05_semi_join_customers" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q07_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q08_distinct_parts" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q09_setops_customers" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin,
    "q10_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q11_events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q12_user_sessions" ->
      """WITH e AS (
        |  SELECT user_id, value, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN prev_ts IS NOT NULL
        |           AND date_diff('second', prev_ts, ts) > 1800
        |           THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM e
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q13_doc_stats" ->
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]{1,4}'))) AS BIGINT) AS sum_bpe_tokens
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q14_token_frequency" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |      FROM documents) t
        |GROUP BY token
        |ORDER BY n DESC, token ASC
        |LIMIT 20""".stripMargin,
    "q15_lang_id" ->
      """WITH d AS (
        |  SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |e AS (
        |  SELECT lang, len(toks) AS n_toks,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS hits
        |  FROM d)
        |SELECT lang,
        |  CASE WHEN hits * 20 >= n_toks THEN 'en' ELSE 'other' END AS pred_lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(hits) AS DOUBLE) / CAST(SUM(n_toks) AS BIGINT) AS stop_ratio
        |FROM e
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q16_quality_by_source" ->
      """WITH d AS (
        |  SELECT source, n_chars, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |e AS (
        |  SELECT source, n_chars, len(toks) AS n_toks,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS hits
        |  FROM d),
        |q AS (
        |  SELECT source,
        |    (CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
        |          WHEN n_chars > 300 THEN 25 ELSE 10 END
        |     + CASE WHEN n_toks >= 20 THEN 30 ELSE 15 END
        |     + CASE WHEN hits * 50 >= n_toks AND hits * 5 <= n_toks THEN 30 ELSE 10 END
        |    ) AS quality
        |  FROM e)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(quality) AS DOUBLE) / COUNT(*) AS avg_quality,
        |  CAST(SUM(CASE WHEN quality >= 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM q
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q17_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 100 = 0)
        |SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies,
        |  md5(text) AS content_hash
        |FROM corpus
        |GROUP BY md5(text)
        |HAVING COUNT(*) > 1
        |ORDER BY canonical_id""".stripMargin,
    "q18_minhash_sigs" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END AS shingles
        |  FROM d)
        |SELECT doc_id,
        |  list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
        |  list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
        |  list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
        |  list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
        |FROM s
        |ORDER BY doc_id""".stripMargin,
    "q19_neardup_pairs" ->
      s"""WITH $nearDupPairCtes
         |SELECT doc_a, doc_b, jaccard FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q20_simhash" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0, 16), b ->
        |    CASE WHEN list_sum(list_transform(toks, t ->
        |        CASE WHEN substr(md5(t), b + 1, 1) IN ('1','3','5','7','9','b','d','f')
        |        THEN 1 ELSE -1 END)) >= 0
        |    THEN (1 << b) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM d
        |ORDER BY doc_id""".stripMargin,
    "q21_cosine_topk" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, label AS q_label, e AS qe FROM v WHERE vec_id < 8),
        |p AS (
        |  SELECT q.q_id, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
        |  FROM v CROSS JOIN q
        |  WHERE v.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p)
        |SELECT q_id, rn, vec_id, cos FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin,
    "q22_label_knn" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, label AS q_label, e AS qe FROM v WHERE vec_id < 8),
        |p AS (
        |  SELECT q.q_id, q.q_label, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
        |  FROM v JOIN q ON v.label = q.q_label AND v.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, q_label, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p)
        |SELECT q_id, q_label, rn, vec_id, cos FROM r WHERE rn <= 3
        |ORDER BY q_id, rn""".stripMargin,
    "q23_label_centroids" ->
      """WITH v AS (
        |  SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
        |x AS (
        |  SELECT label, t.i - 1 AS dim, e[t.i] AS val
        |  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t)
        |SELECT label, dim,
        |  list_reduce(list_sort(list(val)), (a, b) -> a + b) / COUNT(*) AS centroid
        |FROM x
        |GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,
    "q24_asof_purchase_view" ->
      """SELECT p.event_id, p.user_id,
        |  (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_sec
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    // The Spark side synthesizes a real PNG per document (pixel channels
    // are integer functions of (doc_id, x, y) — Multimodal.ImageCodec),
    // decodes it back with JDK ImageIO, and aggregates the DECODED
    // statistics; this oracle recomputes the same integers arithmetically,
    // so any pixel, dimension, or channel the decode misread would
    // hash-mismatch.
    "q25_media_features" ->
      """WITH px AS (
        |  SELECT lang, doc_id,
        |    4 + doc_id % 5 AS w,
        |    3 + doc_id % 4 AS h,
        |    list_sum(flatten(list_transform(generate_series(0, 3 + doc_id % 4 - 1), y ->
        |      list_transform(generate_series(0, 4 + doc_id % 5 - 1), x ->
        |        (doc_id * 31 + x * 7 + y * 13) % 256)))) AS sr,
        |    list_sum(flatten(list_transform(generate_series(0, 3 + doc_id % 4 - 1), y ->
        |      list_transform(generate_series(0, 4 + doc_id % 5 - 1), x ->
        |        (doc_id * 17 + x * 3 + y * 5) % 256)))) AS sg,
        |    list_sum(flatten(list_transform(generate_series(0, 3 + doc_id % 4 - 1), y ->
        |      list_transform(generate_series(0, 4 + doc_id % 5 - 1), x ->
        |        (doc_id * 11 + x + y) % 256)))) AS sb
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_media,
        |  CAST(SUM(w) AS BIGINT) AS sum_width,
        |  CAST(SUM(h) AS BIGINT) AS sum_height,
        |  CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
        |  CAST(SUM(sr) AS BIGINT) AS sum_red,
        |  CAST(SUM(sg) AS BIGINT) AS sum_green,
        |  CAST(SUM(sb) AS BIGINT) AS sum_blue
        |FROM px
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // q26: PARTIAL oracle — HLL sketch internals are engine-specific, so
    // the estimate is graded as an error-bound flag (approx_ok = 1 iff
    // within ±20% of exact; see Events.approxDistinctUsers) while the
    // deterministic columns are hash-checked exactly.
    "q26_approx_distinct_users" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  COUNT(*) AS n_events,
        |  CAST(1 AS BIGINT) AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q27_cube_events" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |    value
        |  FROM events)
        |SELECT event_type, hod, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  CAST(GROUPING_ID(event_type, hod) AS BIGINT) AS gid
        |FROM e
        |GROUP BY CUBE(event_type, hod)
        |ORDER BY gid ASC, event_type ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin,
    "q28_ivf_knn" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |x AS (
        |  SELECT label, t.i - 1 AS dim, e[t.i] AS val
        |  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
        |cent AS (
        |  SELECT label, dim,
        |    list_reduce(list_sort(list(val)), (a, b) -> a + b) / COUNT(*) AS centroid
        |  FROM x GROUP BY label, dim),
        |cvec AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS c_vec
        |  FROM cent GROUP BY label),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 8),
        |assign AS (
        |  SELECT q_id, c_label,
        |    round(list_sum(list_transform(range(1, len(qe) + 1),
        |      i -> (qe[i] - c_vec[i]) * (qe[i] - c_vec[i]))), 6) AS dist
        |  FROM q CROSS JOIN cvec),
        |probe AS (
        |  SELECT q_id, c_label AS probe_label FROM (
        |    SELECT q_id, c_label,
        |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, c_label ASC) AS rn
        |    FROM assign) a
        |  WHERE rn = 1),
        |p AS (
        |  SELECT probe.q_id, probe.probe_label, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x2 -> x2 * x2))) *
        |       sqrt(list_sum(list_transform(e, x2 -> x2 * x2)))), 6) AS cos
        |  FROM v
        |  JOIN probe ON v.label = probe.probe_label
        |  JOIN q ON q.q_id = probe.q_id
        |  WHERE v.vec_id <> probe.q_id),
        |r AS (
        |  SELECT q_id, probe_label, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p)
        |SELECT q_id, probe_label, rn, vec_id, cos FROM r WHERE rn <= 3
        |ORDER BY q_id, rn""".stripMargin,

    // Replays Similarity.ivfProbeSweep: q28's centroid/assignment
    // chain with centroid ranks kept to 3, one scored candidate
    // table served to every nprobe by filter, q21's exact arm.
    "q266_ivf_probe_sweep" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |x AS (
        |  SELECT label, t.i - 1 AS dim, e[t.i] AS val
        |  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
        |cent AS (
        |  SELECT label, dim,
        |    list_reduce(list_sort(list(val)), (a, b) -> a + b)
        |      / COUNT(*) AS centroid
        |  FROM x GROUP BY label, dim),
        |cvec AS (
        |  SELECT label AS c_label, list(centroid ORDER BY dim) AS c_vec
        |  FROM cent GROUP BY label),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 8),
        |assign AS (
        |  SELECT q_id, c_label,
        |    round(list_sum(list_transform(range(1, len(qe) + 1),
        |      i -> (qe[i] - c_vec[i]) * (qe[i] - c_vec[i]))), 6) AS dist
        |  FROM q CROSS JOIN cvec),
        |ranked AS (
        |  SELECT q_id, c_label,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY dist ASC, c_label ASC) AS BIGINT) AS crank
        |  FROM assign QUALIFY crank <= 3),
        |cand AS MATERIALIZED (
        |  SELECT r.q_id, r.crank, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1),
        |        i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x2 -> x2 * x2))) *
        |       sqrt(list_sum(list_transform(e, x2 -> x2 * x2)))), 6)
        |      AS cos
        |  FROM v JOIN ranked r ON v.label = r.c_label
        |  JOIN q ON q.q_id = r.q_id
        |  WHERE v.vec_id <> r.q_id),
        |probes AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS nprobe),
        |sub AS MATERIALIZED (
        |  SELECT p.nprobe, c.q_id, c.vec_id, c.cos
        |  FROM cand c JOIN probes p ON c.crank <= p.nprobe),
        |scanned AS (
        |  SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_scanned
        |  FROM sub GROUP BY 1),
        |tk AS (
        |  SELECT nprobe, q_id, vec_id FROM (
        |    SELECT nprobe, q_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
        |        ORDER BY cos DESC, vec_id ASC) AS rn
        |    FROM sub) z WHERE rn <= 3),
        |pall AS (
        |  SELECT q.q_id, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1),
        |        i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x2 -> x2 * x2))) *
        |       sqrt(list_sum(list_transform(e, x2 -> x2 * x2)))), 6)
        |      AS cos
        |  FROM v CROSS JOIN q WHERE v.vec_id <> q.q_id),
        |exact AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY cos DESC, vec_id ASC) AS rn
        |    FROM pall) z WHERE rn <= 3),
        |rec AS (
        |  SELECT tk.nprobe,
        |    CAST(COUNT(DISTINCT tk.q_id) AS BIGINT) AS n_queries,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_hits
        |  FROM tk LEFT JOIN exact e ON tk.q_id = e.q_id
        |    AND tk.vec_id = e.vec_id
        |  GROUP BY 1)
        |SELECT r.nprobe, r.n_queries, s.n_scanned, r.n_pairs,
        |  r.n_hits, r.n_hits * 1000000 // r.n_pairs AS recall_ppm
        |FROM rec r JOIN scanned s ON r.nprobe = s.nprobe
        |ORDER BY r.nprobe""".stripMargin,
    "q29_lsh_ann" -> {
      val bucketCols = (0 until LshAnnTables)
        .map(t => lshBucketSql(t, LshAnnBits)).mkString(",\n")
      val qCols = (0 until LshAnnTables).map(t => s"b$t AS qb$t").mkString(", ")
      val unions = (0 until LshAnnTables).map(t =>
        s"    SELECT q.q_id, b.vec_id FROM b JOIN q ON b.b$t = q.qb$t")
        .mkString("\n    UNION ALL\n")
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |b AS (
         |  SELECT vec_id, e,
         |$bucketCols
         |  FROM v),
         |q AS (
         |  SELECT vec_id AS q_id, e AS qe, $qCols
         |  FROM b WHERE vec_id < 8),
         |cand AS (
         |  SELECT DISTINCT q_id, vec_id FROM (
         |$unions) u
         |  WHERE q_id <> vec_id),
         |p2 AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
         |      (sqrt(list_sum(list_transform(qe, x2 -> x2 * x2))) *
         |       sqrt(list_sum(list_transform(ce, x2 -> x2 * x2)))), 6) AS cos
         |  FROM cand
         |  JOIN (SELECT vec_id AS c_id, e AS ce FROM v) c ON cand.vec_id = c.c_id
         |  JOIN (SELECT vec_id AS q2, e AS qe FROM v) qq ON cand.q_id = qq.q2),
         |r AS (
         |  SELECT q_id, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM p2)
         |SELECT q_id, rn, vec_id, cos FROM r WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin
    },
    "q30_embedding_neardups" -> {
      val bucketCols = (0 until NearDupLshTables)
        .map(t => lshBucketSql(t, NearDupLshBits)).mkString(",\n")
      val unions = (0 until NearDupLshTables).map(t =>
        s"""    SELECT a.vec_id AS id_a, b2.vec_id AS id_b
           |    FROM b a JOIN b b2 ON a.b$t = b2.b$t AND a.vec_id < b2.vec_id"""
          .stripMargin)
        .mkString("\n    UNION ALL\n")
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |corpus AS (
         |  SELECT vec_id, e FROM base
         |  UNION ALL
         |  SELECT vec_id + 100000, e FROM base WHERE vec_id % 50 = 0),
         |b AS (
         |  SELECT vec_id, e,
         |$bucketCols
         |  FROM corpus),
         |cand AS (
         |  SELECT DISTINCT id_a, id_b FROM (
         |$unions) u),
         |p2 AS (
         |  SELECT id_a, id_b,
         |    round(
         |      list_sum(list_transform(range(1, len(ea) + 1), i -> ea[i] * eb[i])) /
         |      (sqrt(list_sum(list_transform(ea, x2 -> x2 * x2))) *
         |       sqrt(list_sum(list_transform(eb, x2 -> x2 * x2)))), 6) AS cos
         |  FROM cand
         |  JOIN (SELECT vec_id AS va, e AS ea FROM corpus) ca ON cand.id_a = ca.va
         |  JOIN (SELECT vec_id AS vb, e AS eb FROM corpus) cb ON cand.id_b = cb.vb)
         |SELECT id_a, id_b, cos FROM p2 WHERE cos >= 0.999
         |ORDER BY id_a, id_b""".stripMargin
    },
    "q31_simhash_neardups" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
        |  WHERE doc_id % 100 = 0),
        |d AS (
        |  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
        |  FROM corpus),
        |s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 16), b ->
        |      CASE WHEN list_sum(list_transform(toks, t ->
        |          CASE WHEN substr(md5(t), b + 1, 1) IN ('1','3','5','7','9','b','d','f')
        |          THEN 1 ELSE -1 END)) >= 0
        |      THEN (1 << b) ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM d),
        |vals AS (
        |  SELECT simhash, list_sort(list(doc_id)) AS docs
        |  FROM s GROUP BY simhash),
        |bands AS (
        |  SELECT simhash, t.b AS band,
        |    (simhash // (1 << (t.b * 4))) % 16 AS nibble
        |  FROM vals, (SELECT unnest(generate_series(0, 3)) AS b) t),
        |vcand AS (
        |  SELECT DISTINCT a.simhash AS sh_a, b2.simhash AS sh_b
        |  FROM bands a JOIN bands b2
        |    ON a.band = b2.band AND a.nibble = b2.nibble
        |   AND a.simhash <= b2.simhash),
        |vver AS (
        |  SELECT sh_a, sh_b,
        |    CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
        |  FROM vcand
        |  WHERE bit_count(xor(sh_a, sh_b)) <= 3),
        |expanded AS (
        |  SELECT ta.da, tb.db, vver.hamming, vver.sh_a, vver.sh_b
        |  FROM vver
        |  JOIN vals va ON vver.sh_a = va.simhash
        |  JOIN vals vb ON vver.sh_b = vb.simhash,
        |  UNNEST(va.docs) AS ta(da), UNNEST(vb.docs) AS tb(db))
        |SELECT
        |  CASE WHEN da < db THEN da ELSE db END AS doc_a,
        |  CASE WHEN da < db THEN db ELSE da END AS doc_b,
        |  hamming
        |FROM expanded
        |WHERE sh_a <> sh_b OR da < db
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q32_range_join_windows" ->
      """WITH w AS (
        |  SELECT t.w AS window_id,
        |    1704067200000000 + t.w * 25200000000 AS start_us,
        |    1704067200000000 + t.w * 25200000000
        |      + ((t.w % 5) + 1) * 3600000000 AS end_us
        |  FROM (SELECT unnest(generate_series(0, 99)) AS w) t),
        |e AS (SELECT epoch_us(ts) AS ts_us, value FROM events)
        |SELECT window_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM w JOIN e ON e.ts_us >= w.start_us AND e.ts_us < w.end_us
        |GROUP BY window_id
        |ORDER BY window_id""".stripMargin,
    "q33_kmv_distinct_users" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, hv,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h),
        |g AS (
        |  SELECT event_type,
        |    MAX(nd) AS nd,
        |    MAX(CASE WHEN rn = 64 THEN hv END) AS kth_hash
        |  FROM r GROUP BY event_type),
        |x AS (
        |  SELECT e.event_type, COUNT(DISTINCT e.user_id) AS exact_users
        |  FROM events e GROUP BY e.event_type)
        |SELECT g.event_type,
        |  CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
        |       ELSE round(63.0 * 1152921504606846976 / CAST(g.kth_hash AS DOUBLE), 4)
        |  END AS est_distinct,
        |  CASE WHEN g.nd < 64 THEN NULL ELSE g.kth_hash END AS kth_hash,
        |  x.exact_users
        |FROM g JOIN x ON g.event_type = x.event_type
        |ORDER BY g.event_type""".stripMargin,
    "q34_running_spend" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_spend,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / COUNT(*)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg_last3
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q35_median_order_value" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END)
        |   + MAX(CASE WHEN rn = n // 2 + 1 THEN o_totalprice END)) / 2
        |    AS median_value,
        |  COUNT(*) AS n_orders
        |FROM r
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q36_daily_type_pivot" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |    AS day,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q37_sliding_windows" ->
      """WITH s AS (
        |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS ws,
        |    event_type
        |  FROM events
        |  UNION ALL
        |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
        |           - INTERVAL 30 MINUTE,
        |    event_type
        |  FROM events)
        |SELECT ws AS window_start, event_type, COUNT(*) AS n_events
        |FROM s
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // Deliberately a BRUTE-FORCE all-pairs scan (no prefix/size/positional
    // filters): agreement with the Spark side independently proves the
    // prefix-filter candidate generation is lossless — a mirrored oracle
    // could not detect a candidate the filters wrongly dropped.
    "q38_ngram_jaccard_join" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
        |  WHERE doc_id % 100 = 0),
        |c AS (
        |  SELECT md5(text) AS cid, list_sort(list(doc_id)) AS docs,
        |    any_value(text) AS text
        |  FROM corpus GROUP BY text),
        |t AS (
        |  SELECT cid, docs, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM c),
        |g AS (
        |  SELECT cid, docs,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END AS grams
        |  FROM t),
        |gs AS (SELECT cid, docs, grams, len(grams) AS sz FROM g WHERE len(grams) > 0),
        |v AS (
        |  SELECT a.docs AS docs_a, b.docs AS docs_b,
        |    len(list_intersect(a.grams, b.grams)) AS n_common,
        |    a.sz AS na, b.sz AS nb
        |  FROM gs a JOIN gs b ON a.cid < b.cid
        |  WHERE len(list_intersect(a.grams, b.grams)) * 5 >=
        |        4 * (a.sz + b.sz - len(list_intersect(a.grams, b.grams)))),
        |crossx AS (
        |  SELECT least(p.pair[1], p.pair[2]) AS doc_a,
        |    greatest(p.pair[1], p.pair[2]) AS doc_b,
        |    CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
        |  FROM (
        |    SELECT unnest(flatten(list_transform(docs_a, x ->
        |      list_transform(docs_b, y -> [x, y])))) AS pair,
        |      n_common, na, nb
        |    FROM v) p),
        |intra AS (
        |  SELECT p.pair[1] AS doc_a, p.pair[2] AS doc_b,
        |    CAST(1 AS DOUBLE) AS jaccard
        |  FROM (
        |    SELECT unnest(flatten(list_transform(generate_series(1, len(docs) - 1),
        |      i -> list_transform(generate_series(i + 1, len(docs)),
        |        j -> [docs[i], docs[j]])))) AS pair
        |    FROM gs WHERE len(docs) > 1) p)
        |SELECT doc_a, doc_b, jaccard FROM crossx
        |UNION ALL
        |SELECT doc_a, doc_b, jaccard FROM intra
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q39_winnow_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, list_transform(toks, tok ->
        |    CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT)) AS th
        |  FROM t WHERE len(toks) >= 6),
        |kh AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(th) - 2), i ->
        |    list_reduce(list_transform(generate_series(0, 2), o -> th[i + o]),
        |      (a, b) -> (a * 1000003 + b) % 33554432)) AS khs
        |  FROM f),
        |wn AS (
        |  SELECT doc_id, unnest(list_sort(list_distinct(
        |    list_transform(generate_series(1, len(khs) - 3), j ->
        |      list_min(list_slice(khs, j, j + 3)))))) AS fp
        |  FROM kh)
        |SELECT doc_id, fp FROM wn ORDER BY doc_id, fp""".stripMargin,
    // Transitive closure via WITH RECURSIVE over the q19 pair CTEs — an
    // independent formulation of the same fixpoint the Spark side reaches
    // by iterative min-label propagation.
    "q40_dedup_clusters" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes
         |SELECT doc_id, canonical_id FROM comp ORDER BY doc_id""".stripMargin,
    "q41_lsh_multiprobe" -> {
      val bucketCols = (0 until MultiProbeTables)
        .map(t => lshBucketSql(t, MultiProbeBits)).mkString(",\n")
      val qCols = (0 until MultiProbeTables)
        .map(t => s"b$t AS qb$t").mkString(", ")
      // probe set per table: the exact bucket plus all Hamming-1 flips
      def probes(t: Int): String =
        (s"q.qb$t" +: (0 until MultiProbeBits).map(f => s"xor(q.qb$t, ${1 << f})"))
          .mkString("(", ", ", ")")
      val unions = (0 until MultiProbeTables).map(t =>
        s"    SELECT q.q_id, b.vec_id FROM b JOIN q ON b.b$t IN ${probes(t)}")
        .mkString("\n    UNION ALL\n")
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |b AS (
         |  SELECT vec_id, e,
         |$bucketCols
         |  FROM v),
         |q AS (
         |  SELECT vec_id AS q_id, e AS qe, $qCols
         |  FROM b WHERE vec_id < 8),
         |cand AS (
         |  SELECT DISTINCT q_id, vec_id FROM (
         |$unions) u
         |  WHERE q_id <> vec_id),
         |p2 AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
         |      (sqrt(list_sum(list_transform(qe, x2 -> x2 * x2))) *
         |       sqrt(list_sum(list_transform(ce, x2 -> x2 * x2)))), 6) AS cos
         |  FROM cand
         |  JOIN (SELECT vec_id AS c_id, e AS ce FROM v) c ON cand.vec_id = c.c_id
         |  JOIN (SELECT vec_id AS q2, e AS qe FROM v) qq ON cand.q_id = qq.q2),
         |r AS (
         |  SELECT q_id, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM p2)
         |SELECT q_id, rn, vec_id, cos FROM r WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin
    },
    // Replays Clustering.kmeans' deterministic Lloyd iterations exactly:
    // same seeds (vec_id < k), same fixed iteration count, sequential
    // distance folds, sorted-fold means, cluster-id tie-breaks.
    "q42_kmeans_clusters" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)}
         |SELECT vec_id, cluster, round(dist, 6) AS dist
         |FROM a$KmeansIters ORDER BY vec_id""".stripMargin,
    // The learned-index IVF: probe each query's nearest TRAINED centroid
    // (cent{iters-1}, the ones that produced the final assignment),
    // then search only that k-means partition of the corpus.
    "q43_ivf_learned_knn" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)},
         |probe AS (
         |  SELECT q_id, cluster AS probe_cluster FROM (
         |    SELECT q_id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |                         ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT v.vec_id AS q_id, cc.cluster,
         |        list_reduce(list_transform(range(1, 65),
         |          ii -> (v.e[ii] - cc.c[ii]) * (v.e[ii] - cc.c[ii])),
         |          (x2, y2) -> x2 + y2) AS dist
         |      FROM v CROSS JOIN cent${KmeansIters - 1} cc
         |      WHERE v.vec_id < 8) p0) p1
         |  WHERE rn = 1),
         |search AS (
         |  SELECT probe.q_id, probe.probe_cluster, a.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qq.qe) + 1),
         |        ii -> qq.qe[ii] * a.e[ii])) /
         |      (sqrt(list_sum(list_transform(qq.qe, x2 -> x2 * x2))) *
         |       sqrt(list_sum(list_transform(a.e, x2 -> x2 * x2)))), 6) AS cos
         |  FROM a$KmeansIters a
         |  JOIN probe ON a.cluster = probe.probe_cluster
         |  JOIN (SELECT vec_id AS q2, e AS qe FROM v) qq ON probe.q_id = qq.q2
         |  WHERE a.vec_id <> probe.q_id),
         |r AS (
         |  SELECT q_id, probe_cluster, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM search)
         |SELECT q_id, probe_cluster, rn, vec_id, cos FROM r WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin,
    // doc_id IS NOT NULL mirrors the Spark side's explicit null-key drop
    // (Sampling.hashSplit): a NULL key must not silently route to the
    // CASE's 'test' branch and skew the held-out set.
    "q44_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents
        |  WHERE doc_id IS NOT NULL)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // The full curation pipeline: near-dup components (q19+q40 CTEs) →
    // keep canonical/unpaired docs → integer quality bands (q16's) →
    // md5-bucket split (q44's).
    "q45_training_pipeline" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |survivors AS (
         |  SELECT c.doc_id, c.text FROM corpus c
         |  LEFT JOIN comp ON c.doc_id = comp.doc_id
         |  WHERE comp.doc_id IS NULL OR comp.canonical_id = c.doc_id),
         |feat AS (
         |  SELECT doc_id, length(text) AS n_chars, len(toks) AS n_toks,
         |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |  FROM (SELECT doc_id, text,
         |          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |        FROM survivors) s),
         |qual AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |              WHEN n_chars > 300 THEN 25 ELSE 10 END
         |       + CASE WHEN n_toks >= 20 THEN 30 ELSE 15 END
         |       + CASE WHEN hits * 50 >= n_toks AND hits * 5 <= n_toks
         |              THEN 30 ELSE 10 END AS BIGINT) AS quality
         |  FROM feat),
         |sp AS (
         |  SELECT doc_id, quality,
         |    CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS BIGINT) % 100
         |      AS bucket
         |  FROM qual WHERE quality >= 60 AND doc_id IS NOT NULL)
         |SELECT doc_id, quality,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM sp ORDER BY doc_id""".stripMargin,
    "q46_repetition_stats" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, u.tg.k AS k, u.tg.g AS g
        |  FROM t,
        |  UNNEST(list_concat(
        |    list_transform(generate_series(1, len(toks) - 1), i ->
        |      {'k': 2, 'g': toks[i] || ' ' || toks[i + 1]}),
        |    list_transform(generate_series(1, len(toks) - 2), i ->
        |      {'k': 3, 'g': toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]})))
        |    AS u(tg)
        |  WHERE len(toks) >= 3),
        |c AS (
        |  SELECT doc_id, k, g, COUNT(*) AS n FROM tg GROUP BY 1, 2, 3),
        |pk AS (
        |  SELECT doc_id, k,
        |    CAST(SUM(n) AS BIGINT) AS total,
        |    CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup,
        |    MAX(n) AS top
        |  FROM c GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN k = 2 THEN total END) AS n_2grams,
        |    MAX(CASE WHEN k = 2 THEN top END) AS top2_n,
        |    MAX(CASE WHEN k = 3 THEN total END) AS n_3grams,
        |    MAX(CASE WHEN k = 3 THEN dup END) AS dup_3grams
        |  FROM pk GROUP BY doc_id)
        |SELECT doc_id, n_2grams, top2_n, n_3grams, dup_3grams,
        |  CAST(CASE WHEN dup_3grams * 5 >= n_3grams
        |             OR (top2_n >= 2 AND top2_n * 10 >= n_2grams)
        |        THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        |FROM d ORDER BY doc_id""".stripMargin,
    "q47_decontaminate" -> ContaminationOracleSql,
    // q59 is the bloom-prefiltered q47: a Bloom filter has no false
    // negatives and the exact gram join removes the false positives,
    // so the result — and therefore the oracle — is identical.
    "q59_decontaminate_bloom" -> ContaminationOracleSql,
    "q48_pii_scrub" -> {
      // the IDENTICAL pattern strings the Spark side uses (Privacy.*Re)
      val em = ops.Privacy.EmailRe
      val ph = ops.Privacy.PhoneRe
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 50 = 0 THEN
         |      text || ' contact user' || doc_id::VARCHAR || '@example.com' ||
         |      ' or call 555-' || lpad(((doc_id * 7) % 1000)::VARCHAR, 3, '0') ||
         |      '-' || lpad(((doc_id * 13) % 10000)::VARCHAR, 4, '0')
         |    ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(text, '$em', '[EMAIL]', 'g'),
         |    '$ph', '[PHONE]', 'g') AS redacted
         |FROM corpus
         |WHERE regexp_matches(text, '$em') OR regexp_matches(text, '$ph')
         |ORDER BY doc_id""".stripMargin
    },
    "q49_stratified_cap" ->
      """SELECT source, rn, doc_id FROM (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents WHERE doc_id IS NOT NULL) t
        |WHERE rn <= 10
        |ORDER BY source, rn""".stripMargin,
    // rational tfidf (tf * N / df), not ln-based: exactly-rounded integer
    // multiply + one division keeps both engines bit-identical (see
    // TextOps.tfidfTopTerms).
    "q50_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |    FROM documents) t
        |  GROUP BY doc_id, token),
        |idf AS (
        |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, idf.df,
        |    round(CAST(tf.tf * n.n_docs AS DOUBLE) / idf.df, 6) AS tfidf
        |  FROM tf JOIN idf ON tf.token = idf.token CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, token, tf, df, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, token ASC) AS rn
        |  FROM s)
        |SELECT doc_id, rn, token, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, tfidf
        |FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "q51_mixture_sample" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
        |m AS (SELECT MIN(n_s) AS n_min FROM counts),
        |pcts AS (
        |  SELECT source,
        |    CAST(ceil(100 * sqrt(CAST(n_min AS DOUBLE) / n_s)) AS BIGINT)
        |      AS pct
        |  FROM counts CROSS JOIN m)
        |SELECT d.source, p.pct, d.doc_id
        |FROM documents d JOIN pcts p ON d.source = p.source
        |WHERE d.doc_id IS NOT NULL
        |  AND CAST('0x' || substr(md5(d.doc_id::VARCHAR), 1, 6) AS BIGINT) % 100
        |      < p.pct
        |ORDER BY d.source, d.doc_id""".stripMargin,
    // Deliberately the NAIVE single global window over the hash order —
    // matching it row-for-row proves the Spark side's two-phase
    // distributed prefix sum is an exact decomposition.
    "q52_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
        |      AS n_toks,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents WHERE doc_id IS NOT NULL),
        |c AS (
        |  SELECT doc_id, n_toks,
        |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_tok
        |  FROM t)
        |SELECT doc_id, n_toks, start_tok, start_tok // 2000 AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    // quantile_disc is an INDEPENDENT implementation of the same exact
    // rank rule ceil(pct·n/100) — DuckDB's decimal literal keeps the
    // ceil exact, the Spark side uses integer arithmetic; both pick a
    // physical data value, so no interpolation arithmetic can drift.
    "q53_grouped_quantiles" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |${QuantilePcts.map(p =>
            s"  quantile_disc(o_totalprice, ${BigDecimal(p) / 100}) AS p$p")
            .mkString(",\n")}
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    // Span hashes mirror the Spark side exactly: md5 of the
    // space-joined `SpanWindow`-token slice; duplicate spans via a
    // grouped-count CTE, then a per-doc rollup of window/dup counts.
    "q54_duplicate_spans" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
         |  WHERE doc_id % 100 = 0),
         |t AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM corpus WHERE doc_id IS NOT NULL),
         |sp AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - ${SpanWindow - 1}),
         |      i -> md5(array_to_string(toks[i:i + ${SpanWindow - 1}], ' ')))) AS h
         |  FROM t WHERE len(toks) >= $SpanWindow),
         |dc AS (
         |  SELECT h FROM sp GROUP BY h HAVING COUNT(*) > 1),
         |agg AS (
         |  SELECT sp.doc_id,
         |    COUNT(*) AS n_windows,
         |    CAST(SUM(CASE WHEN dc.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_windows
         |  FROM sp LEFT JOIN dc ON sp.h = dc.h
         |  GROUP BY sp.doc_id)
         |SELECT doc_id, n_windows, n_dup_windows,
         |  CAST(n_dup_windows AS DOUBLE) / n_windows AS dup_frac
         |FROM agg ORDER BY doc_id""".stripMargin,
    // q47 at production gram width (WideGramWidth-token shingles): the
    // same train/bench construction, only the shingle width changes.
    "q55_decontaminate_wide" ->
      s"""WITH bench AS (
         |  SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 100 = 0),
         |train AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
         |  WHERE doc_id % 100 = 0),
         |tg AS (
         |  SELECT doc_id, unnest(sh) AS gram FROM (
         |    SELECT doc_id,
         |      CASE WHEN len(toks) >= $WideGramWidth THEN
         |        list_distinct(list_transform(
         |          generate_series(1, len(toks) - ${WideGramWidth - 1}),
         |          i -> array_to_string(toks[i:i + ${WideGramWidth - 1}], ' ')))
         |      ELSE [] END AS sh
         |    FROM (SELECT doc_id,
         |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |          FROM train) x) y),
         |bg AS (
         |  SELECT bench_id, unnest(sh) AS gram FROM (
         |    SELECT bench_id,
         |      CASE WHEN len(toks) >= $WideGramWidth THEN
         |        list_distinct(list_transform(
         |          generate_series(1, len(toks) - ${WideGramWidth - 1}),
         |          i -> array_to_string(toks[i:i + ${WideGramWidth - 1}], ' ')))
         |      ELSE [] END AS sh
         |    FROM (SELECT bench_id,
         |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |          FROM bench) x) y)
         |SELECT tg.doc_id,
         |  COUNT(DISTINCT bg.bench_id) AS n_benchmarks,
         |  COUNT(DISTINCT tg.gram) AS n_shared_grams
         |FROM tg JOIN bg ON tg.gram = bg.gram
         |GROUP BY tg.doc_id
         |ORDER BY tg.doc_id""".stripMargin,
    // Block hashes mirror the Spark side (md5 of the space-joined
    // BlockSize-token slice); the kept flag is an INDEPENDENT
    // implementation — row_number over (doc_id, pos) within each block
    // hash, vs Spark's min-struct aggregate + join-back — so an
    // ordering bug in either first-occurrence rule mismatches.
    "q56_block_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
         |  WHERE doc_id % 100 = 0),
         |t AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM corpus WHERE doc_id IS NOT NULL),
         |b0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(
         |      generate_series(0,
         |        CAST(ceil(len(toks) / ${BlockSize}.0) AS INT) - 1),
         |      j -> struct_pack(pos := j,
         |        blk := array_to_string(
         |          toks[j * $BlockSize + 1 : j * $BlockSize + $BlockSize],
         |          ' ')))) AS u
         |  FROM t WHERE len(toks) > 0),
         |f AS (
         |  SELECT doc_id, u.pos AS pos, u.blk AS blk,
         |    row_number() OVER (PARTITION BY md5(u.blk)
         |      ORDER BY doc_id, u.pos) = 1 AS kept
         |  FROM b0)
         |SELECT doc_id, COUNT(*) AS n_blocks,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(CASE WHEN kept THEN blk END, ' '
         |    ORDER BY pos), '') AS clean_text
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // SemDeDup: replay the k-means training (kmeansCtes, trained on the
    // BASE table only — the planted copies are assigned, never trained
    // on), assign the augmented corpus against cent{iters-1} with the
    // identical sequential L2 fold + (dist, cluster) tie-break, then
    // mark any vector with a lower-id cluster-mate at cosine >= tau.
    "q57_semantic_dedup" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)},
         |corpus AS (
         |  SELECT vec_id, e FROM v
         |  UNION ALL
         |  SELECT vec_id + 1000000, e FROM v WHERE vec_id % 50 = 0),
         |asg AS (
         |  SELECT vec_id, e, cluster FROM (
         |    SELECT vec_id, e, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |                         ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT c0.vec_id, c0.e, cc.cluster,
         |        list_reduce(list_transform(range(1, 65),
         |          ii -> (c0.e[ii] - cc.c[ii]) * (c0.e[ii] - cc.c[ii])),
         |          (x2, y2) -> x2 + y2) AS dist
         |      FROM corpus c0 CROSS JOIN cent${KmeansIters - 1} cc) d) t
         |  WHERE rn = 1),
         |dup AS (
         |  SELECT b.vec_id
         |  FROM asg a JOIN asg b ON a.cluster = b.cluster
         |    AND a.vec_id < b.vec_id
         |  WHERE round(
         |      list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) /
         |      (sqrt(list_sum(list_transform(a.e, x -> x * x))) *
         |       sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6)
         |    >= $SemDedupTau
         |  GROUP BY b.vec_id)
         |SELECT asg.vec_id, asg.cluster,
         |  CAST(CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |    AS is_dup
         |FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id
         |ORDER BY asg.vec_id""".stripMargin,
    // Bigram-LM score: each transition probability is an exact-rounded
    // ratio of integers; ln agrees bit-for-bit with Math.log on every
    // distinct corpus ratio (see TextOps.lmQualityScore); the mean goes
    // through an exact decimal sum because engines aggregate doubles in
    // different orders.
    "q58_lm_quality" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |tr AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS u
        |  FROM t WHERE len(toks) >= 2),
        |tr2 AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM tr),
        |uni AS (
        |  SELECT w1, COUNT(*) AS c1
        |  FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY w1),
        |big AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM tr2 GROUP BY w1, w2),
        |v AS (SELECT COUNT(*) AS vsz FROM uni),
        |s AS (
        |  SELECT tr2.doc_id,
        |    ln((big.c12 + 1)::DOUBLE / (uni.c1 + v.vsz)) AS logp
        |  FROM tr2 JOIN big USING (w1, w2) JOIN uni USING (w1), v)
        |SELECT doc_id, COUNT(*) AS n_transitions,
        |  round(CAST(SUM(CAST(logp AS DECIMAL(38, 18))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_logp
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Replays Importance.importanceReportOf over the planted-target
    // corpus: hashed-bigram occurrence buckets, add-one-smoothed
    // likelihood ratio decided by integer cross-multiplication in
    // decimal, per-doc majority vote. The bucket count, target language,
    // and planted vocabularies interpolate from the same constants the
    // Scala operator uses.
    "q60_importance_weights" ->
      s"""WITH base AS (SELECT doc_id, lang, text FROM documents),
        |corpus AS (
        |  SELECT doc_id, lang, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 2000000, 'en', '${Importance.TonicText}'
        |  FROM base WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, 'xx', '${Importance.TonicText}'
        |  FROM base WHERE doc_id % 100 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000, 'xx', '${Importance.JunkText}'
        |  FROM base WHERE doc_id % 100 = 0),
        |t AS (
        |  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM corpus),
        |g AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |b AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(gram), 1, 6) AS BIGINT) % ${Importance.NumBuckets}
        |      AS bucket
        |  FROM g),
        |hist AS (
        |  SELECT bucket, COUNT(*) AS r_cnt,
        |    SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS t_cnt
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT SUM(r_cnt) AS r_total, SUM(t_cnt) AS t_total FROM hist),
        |lean AS (
        |  SELECT bucket,
        |    CAST(t_cnt + 1 AS DECIMAL(19, 0)) *
        |      CAST(r_total + ${Importance.NumBuckets} AS DECIMAL(19, 0)) >
        |    CAST(r_cnt + 1 AS DECIMAL(19, 0)) *
        |      CAST(t_total + ${Importance.NumBuckets} AS DECIMAL(19, 0))
        |      AS target_leaning
        |  FROM hist CROSS JOIN tot)
        |SELECT b.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN target_leaning THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_target_leaning,
        |  SUM(CASE WHEN target_leaning THEN 1 ELSE 0 END) * 2 > COUNT(*)
        |    AS dsir_keep
        |FROM b JOIN lean USING (bucket)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,

    // Replays Quantization.quantizedTopK: L2-normalize, then fixed-scale
    // int8 quantization (floor(u*127 + 0.5) — floor, not round: see the
    // operator doc), exact bigint dot products, top-k by
    // (qdot DESC, vec_id ASC) over the q21 probe set.
    "q61_quantized_knn" ->
      s"""WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (
        |  SELECT vec_id, e,
        |    sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        |qt AS (
        |  SELECT vec_id,
        |    CASE WHEN nrm = 0 THEN list_transform(e, x -> 0)
        |    ELSE list_transform(e,
        |      x -> CAST(floor(x / nrm * 127.0 + 0.5) AS INTEGER)) END AS q
        |  FROM s),
        |p AS (
        |  SELECT qs.vec_id AS q_id, t.vec_id,
        |    CAST(list_sum(list_transform(range(1, len(qs.q) + 1),
        |      i -> CAST(qs.q[i] AS BIGINT) * CAST(t.q[i] AS BIGINT)))
        |      AS BIGINT) AS qdot
        |  FROM qt t CROSS JOIN (SELECT * FROM qt WHERE vec_id < 8) qs
        |  WHERE t.vec_id <> qs.vec_id),
        |r AS (
        |  SELECT q_id, vec_id, qdot,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY qdot DESC, vec_id ASC)
        |      AS rn
        |  FROM p)
        |SELECT q_id, rn, vec_id, qdot FROM r WHERE rn <= $QuantTopK
        |ORDER BY q_id, rn""".stripMargin,

    // Recomputes Multimodal.AudioCodec's planted-sample arithmetic: the
    // Spark side must DECODE real WAV bytes back to these integers, so
    // any header/frame/endianness misread hash-mismatches (q25's
    // planted-value pattern, audio edition).
    "q62_audio_features" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    unnest(generate_series(0, CAST(50 + doc_id % 32 AS BIGINT) - 1)) AS i
        |  FROM d),
        |v AS (
        |  SELECT doc_id, lang, i,
        |    (doc_id * 131 + i * 37) % 65536 - 32768 AS smp
        |  FROM s),
        |z AS (
        |  SELECT doc_id, lang, smp,
        |    lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM v),
        |f AS (
        |  SELECT doc_id, lang, COUNT(*) AS n_samples,
        |    CAST(SUM(abs(smp)) AS BIGINT) AS sum_abs,
        |    MAX(abs(smp)) AS peak,
        |    CAST(SUM(CASE WHEN prev * smp < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero_cross
        |  FROM z GROUP BY doc_id, lang)
        |SELECT lang, COUNT(*) AS n_media,
        |  CAST(SUM(n_samples) AS BIGINT) AS sum_samples,
        |  CAST(SUM(sum_abs) AS BIGINT) AS sum_abs, MAX(peak) AS max_peak,
        |  CAST(SUM(n_zero_cross) AS BIGINT) AS sum_zero_cross
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // Replays TextOps.tokenAccountingOf. The piece regex is restricted
    // to the Java∩RE2 subset (disjoint maximal-run classes) so both
    // engines segment identically.
    "q63_token_accounting" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+'))
        |    AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Replays Events.funnelStagesOf: four stacked window minima over one
    // user partitioning, each stage's first event strictly after the
    // previous stage's.
    "q64_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2),
        |s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t4 FROM s3),
        |u AS (
        |  SELECT DISTINCT user_id,
        |    CASE WHEN t4 IS NOT NULL THEN 4
        |         WHEN t3 IS NOT NULL THEN 3
        |         WHEN t2 IS NOT NULL THEN 2
        |         WHEN t1 IS NOT NULL THEN 1
        |         ELSE 0 END AS stage
        |  FROM s4)
        |SELECT stage,
        |  CASE stage WHEN 4 THEN 'purchase' WHEN 3 THEN 'click'
        |       WHEN 2 THEN 'view' WHEN 1 THEN 'signup'
        |       ELSE 'none' END AS stage_name,
        |  COUNT(*) AS n_users
        |FROM u GROUP BY stage ORDER BY stage""".stripMargin,

    // Replays Events.retentionCohortsOf: integer epoch-week buckets
    // (no calendar semantics to reconcile), distinct activity matrix,
    // cohort week as a per-user window minimum.
    "q65_retention_cohorts" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 604800 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week,
        |    min(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM a)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  COUNT(*) AS n_users
        |FROM c GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // Replays Quantization.ivfQuantizedKnn: the q43 probe chain (shared
    // kmeans CTEs, full-precision centroid probe) with the in-cluster
    // search swapped to the q61 quantizer's exact integer dot products.
    "q66_ivf_quantized_knn" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)},
         |qt AS (
         |  SELECT a.vec_id, a.cluster,
         |    CASE WHEN nrm = 0 THEN list_transform(e, x -> 0)
         |    ELSE list_transform(e,
         |      x -> CAST(floor(x / nrm * 127.0 + 0.5) AS INTEGER)) END AS q
         |  FROM (SELECT vec_id, cluster, e,
         |          sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
         |        FROM a$KmeansIters) a),
         |probe AS (
         |  SELECT q_id, cluster AS probe_cluster FROM (
         |    SELECT q_id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |                         ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT v.vec_id AS q_id, cc.cluster,
         |        list_reduce(list_transform(range(1, 65),
         |          ii -> (v.e[ii] - cc.c[ii]) * (v.e[ii] - cc.c[ii])),
         |          (x2, y2) -> x2 + y2) AS dist
         |      FROM v CROSS JOIN cent${KmeansIters - 1} cc
         |      WHERE v.vec_id < 8) p0) p1
         |  WHERE rn = 1),
         |search AS (
         |  SELECT probe.q_id, probe.probe_cluster, t.vec_id,
         |    CAST(list_sum(list_transform(range(1, len(qq.q) + 1),
         |      ii -> CAST(qq.q[ii] AS BIGINT) * CAST(t.q[ii] AS BIGINT)))
         |      AS BIGINT) AS qdot
         |  FROM qt t
         |  JOIN probe ON t.cluster = probe.probe_cluster
         |  JOIN (SELECT vec_id AS q2, q FROM qt) qq ON probe.q_id = qq.q2
         |  WHERE t.vec_id <> probe.q_id),
         |r AS (
         |  SELECT q_id, probe_cluster, vec_id, qdot,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY qdot DESC, vec_id ASC) AS rn
         |  FROM search)
         |SELECT q_id, probe_cluster, rn, vec_id, qdot FROM r WHERE rn <= $QuantTopK
         |ORDER BY q_id, rn""".stripMargin,

    // Replays Cdc.scd2HistoryOf: gaps-and-islands run detection via lag,
    // interval closing via lead over the surviving run boundaries.
    "q67_scd2_history" ->
      """WITH m AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY epoch_us(ts), event_id) AS prev_type,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_total
        |  FROM events),
        |i AS (
        |  SELECT * FROM m WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (
        |  SELECT user_id, event_type, tus AS valid_from_us, rn, n_total,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS version,
        |    LEAD(tus) OVER (PARTITION BY user_id ORDER BY rn) AS valid_to_us,
        |    LEAD(rn) OVER (PARTITION BY user_id ORDER BY rn) AS next_rn
        |  FROM i)
        |SELECT user_id, version, event_type, valid_from_us, valid_to_us,
        |  COALESCE(next_rn, n_total + 1) - rn AS n_events,
        |  valid_to_us IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // Replays Cdc.cdcApply: changelog compaction to the latest row per
    // key, then a full-outer MERGE with error-tombstones dropped.
    "q68_cdc_apply" ->
      """WITH latest AS (
        |  SELECT user_id AS key, event_type AS change_type,
        |    value AS change_value
        |  FROM (
        |    SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |                         ORDER BY epoch_us(ts) DESC, event_id DESC)
        |        AS rn
        |    FROM events) x
        |  WHERE rn = 1),
        |base AS (
        |  SELECT c_custkey AS key, c_acctbal AS base_balance FROM customer)
        |SELECT COALESCE(b.key, l.key) AS key,
        |  COALESCE(l.change_value, b.base_balance) AS balance,
        |  CASE WHEN b.key IS NULL THEN 'insert'
        |       WHEN l.key IS NULL THEN 'keep'
        |       ELSE 'update' END AS op
        |FROM base b FULL OUTER JOIN latest l ON b.key = l.key
        |WHERE l.change_type IS NULL OR l.change_type <> 'error'
        |ORDER BY key""".stripMargin,

    // Replays Graph.copurchasePagerank: the same fixed-point integer
    // iterations unrolled as chained CTEs (r1..rK). All arithmetic is
    // bigint floor division — bit-identical across engines by
    // construction, no FP summation order to reconcile. DuckDB's SUM
    // over bigint widens to hugeint; the CAST narrows it back to the
    // bigint Spark carries throughout.
    "q69_copurchase_pagerank" ->
      s"""WITH ${pagerankCtes(PagerankIters)}
         |SELECT id AS part_id, r AS rank_fp FROM r$PagerankIters
         |ORDER BY rank_fp DESC, part_id ASC""".stripMargin,
    // Replays Graph.copurchaseTriangles: the same degree orientation
    // (low-(deg, id) endpoint -> high), wedge join, closing-edge join,
    // three-corner rollup. All joins and counts are integer-exact.
    "q70_copurchase_triangles" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |und AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM lp a JOIN lp b ON a.k = b.k AND a.p < b.p),
        |deg AS (
        |  SELECT id, COUNT(*) AS deg FROM (
        |    SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
        |  GROUP BY id),
        |o AS (
        |  SELECT
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |      THEN und.u ELSE und.v END AS a,
        |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |      THEN und.v ELSE und.u END AS b
        |  FROM und
        |  JOIN deg du ON und.u = du.id
        |  JOIN deg dv ON und.v = dv.id),
        |tri AS (
        |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM o e1
        |  JOIN o e2 ON e1.b = e2.a
        |  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b AS id FROM tri
        |  UNION ALL SELECT c AS id FROM tri)
        |SELECT id AS part_id, COUNT(*) AS n_triangles
        |FROM corners GROUP BY id
        |ORDER BY n_triangles DESC, part_id ASC""".stripMargin,
    // Replays Layout.zorderBucketStats: the identical unrolled bit
    // interleave (generated from the same Scala loop — one formula,
    // two engines), bucket = top bits of z, per-bucket bounding boxes.
    "q71_zorder_layout" ->
      s"""WITH z AS (
         |  SELECT l_partkey, l_suppkey,
         |    ${Layout.zValueSql("l_partkey", "l_suppkey", ZorderBits)} AS zv
         |  FROM lineitem)
         |SELECT zv >> ${2 * ZorderBits - ZorderBucketBits} AS bucket,
         |  COUNT(*) AS n_rows,
         |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
         |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
         |FROM z GROUP BY bucket
         |ORDER BY bucket""".stripMargin,
    // Deterministic columns exact; approx_ok = the GK sketch's own
    // rank-error contract, verified Spark-side against the data.
    "q72_approx_quantile_bound" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  MIN(value) AS min_value, MAX(value) AS max_value,
        |  CAST(1 AS BIGINT) AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // Deliberately UNMIRRORED brute-force cross join: a hash-match
    // proves the deletion-neighborhood blocking lossless (q38 pattern).
    "q73_fuzzy_name_match" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a
        |JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // Non-hierarchical sets (skipping the (flag) grain) — neither
    // ROLLUP nor CUBE covers this; GROUPING_ID bit order matches
    // Spark's no-arg grouping_id() over (flag, status).
    "q74_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_linestatus), ())
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    // Replays Features.decayedSpendOf: the identical truncated
    // fixed-point decay sum, lag chain generated from the same
    // DecayLags constant — integer floor division per term, so the
    // engines agree bit-for-bit.
    "q75_decayed_spend" ->
      s"""WITH o AS (
         |  SELECT o_custkey, o_orderkey, o_orderdate,
         |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
         |      AS lag_0
         |  FROM orders),
         |l AS (
         |  SELECT o_custkey, o_orderkey, lag_0,
         |    ${(1 until DecayLags).map(j =>
              s"lag(lag_0, $j) OVER w AS lag_$j").mkString(",\n    ")}
         |  FROM o
         |  WINDOW w AS (PARTITION BY o_custkey
         |               ORDER BY o_orderdate, o_orderkey))
         |SELECT o_custkey, o_orderkey,
         |  ${(0 until DecayLags).map(j =>
              s"COALESCE(lag_$j, 0) // ${1L << (j + 1)}").mkString(" +\n  ")}
         |    AS decayed_cents
         |FROM l
         |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // Replays Features.minmaxScaledOf: exact per-dimension min/max
    // PICKS, one subtraction + one division on identical doubles.
    "q76_minmax_embeddings" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |x AS (
        |  SELECT vec_id, t.i - 1 AS dim, e[t.i] AS val
        |  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
        |r AS (
        |  SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM x GROUP BY dim)
        |SELECT x.vec_id, CAST(x.dim AS BIGINT) AS dim,
        |  CASE WHEN r.mx > r.mn THEN (x.val - r.mn) / (r.mx - r.mn)
        |       ELSE 0.0 END AS scaled
        |FROM x JOIN r ON x.dim = r.dim
        |ORDER BY vec_id, dim""".stripMargin,
    // The correlated form itself — DuckDB decorrelates it internally;
    // the integer cross-multiplication mirrors the Spark comparison.
    "q77_above_nation_avg" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |s AS (
        |  SELECT c_nationkey, CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |    COUNT(*) AS n
        |  FROM c GROUP BY c_nationkey)
        |SELECT c.c_custkey, n.n_name AS nation, c.c_acctbal
        |FROM c
        |JOIN s ON c.c_nationkey = s.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.cents * s.n > s.sum_cents
        |ORDER BY c_custkey""".stripMargin,
    "q78_quality_audit" ->
      """SELECT metric, value FROM (
        |  SELECT 'lineitem_rows' AS metric, COUNT(*) AS value FROM lineitem
        |  UNION ALL SELECT 'orders_rows', COUNT(*) FROM orders
        |  UNION ALL SELECT 'customer_rows', COUNT(*) FROM customer
        |  UNION ALL SELECT 'orders_distinct_keys',
        |    COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'orders_dup_keys', COUNT(*) FROM (
        |    SELECT o_orderkey FROM orders GROUP BY o_orderkey
        |    HAVING COUNT(*) > 1)
        |  UNION ALL SELECT 'lineitem_orphans', COUNT(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                      WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL SELECT 'orders_orphans', COUNT(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                      WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL SELECT 'lineitem_null_shipdate', COUNT(*) FROM lineitem
        |    WHERE l_shipdate IS NULL
        |  UNION ALL SELECT 'lineitem_nonpositive_qty', COUNT(*) FROM lineitem
        |    WHERE l_quantity <= 0
        |  UNION ALL SELECT 'lineitem_discount_range', COUNT(*) FROM lineitem
        |    WHERE l_discount < 0 OR l_discount > 1)
        |ORDER BY metric""".stripMargin,
    // Deliberately the FULL recompute (no split): a hash-match proves
    // the incremental merge exactly equals re-aggregating everything.
    "q79_incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // q33's exact KMV replay, per sliding-window start (q37's two-row
    // window duplication): bottom-64 hashes, kth at rank 64, estimator
    // regime mirrored.
    "q80_sliding_distinct_users" ->
      """WITH s AS (
        |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
        |    AS ws, user_id
        |  FROM events
        |  UNION ALL
        |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
        |           - INTERVAL 30 MINUTE,
        |    user_id
        |  FROM events),
        |h AS (
        |  SELECT DISTINCT ws,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM s),
        |r AS (
        |  SELECT ws, hv,
        |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY ws) AS nd
        |  FROM h),
        |g AS (
        |  SELECT ws, MAX(nd) AS nd,
        |    MAX(CASE WHEN rn = 64 THEN hv END) AS kth_hash
        |  FROM r GROUP BY ws),
        |x AS (
        |  SELECT ws, COUNT(DISTINCT user_id) AS exact_users
        |  FROM s GROUP BY ws)
        |SELECT g.ws AS window_start,
        |  CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
        |       ELSE round(63.0 * 1152921504606846976 / CAST(g.kth_hash AS DOUBLE), 4)
        |  END AS est_distinct,
        |  CASE WHEN g.nd < 64 THEN NULL ELSE g.kth_hash END AS kth_hash,
        |  x.exact_users
        |FROM g JOIN x ON g.ws = x.ws
        |ORDER BY window_start""".stripMargin,
    // Replays Cdc.pointInTimeEnrichment: q67's SCD2 CTEs over the even
    // (dimension) feed, odd facts joined into the containing interval.
    "q81_pit_enrichment" ->
      """WITH d AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events WHERE event_id % 2 = 0),
        |m AS (
        |  SELECT user_id, event_type, tus,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY tus, event_id) AS rn,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY tus, event_id) AS prev_type
        |  FROM d),
        |i AS (
        |  SELECT * FROM m WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (
        |  SELECT user_id, event_type AS active_type, tus AS valid_from_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS version,
        |    LEAD(tus) OVER (PARTITION BY user_id ORDER BY rn) AS valid_to_us
        |  FROM i),
        |f AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS fus
        |  FROM events WHERE event_id % 2 = 1)
        |SELECT f.event_id AS fact_event_id, f.user_id, v.version,
        |  v.active_type, f.event_type AS fact_type
        |FROM f JOIN v ON f.user_id = v.user_id
        |  AND f.fus >= v.valid_from_us
        |  AND (v.valid_to_us IS NULL OR f.fus < v.valid_to_us)
        |ORDER BY fact_event_id""".stripMargin,
    // Replays Features.embeddingDriftReport: identical bucket formula
    // (same FP op order), q44's md5 membership rule, integer drift sum.
    "q82_embedding_drift" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |x AS (
         |  SELECT vec_id, t.i - 1 AS dim, e[t.i] AS val
         |  FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
         |r AS (
         |  SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM x GROUP BY dim),
         |b AS (
         |  SELECT x.vec_id, x.dim,
         |    CASE WHEN r.mx > r.mn
         |      THEN least(CAST(floor(((x.val - r.mn) / (r.mx - r.mn))
         |                            * $DriftBuckets) AS BIGINT),
         |                 ${DriftBuckets - 1})
         |      ELSE 0 END AS bucket,
         |    CAST('0x' || substr(md5(x.vec_id::VARCHAR), 1, 6) AS BIGINT)
         |      % 100 < 50 AS in_half
         |  FROM x JOIN r ON x.dim = r.dim),
         |h AS (
         |  SELECT dim, bucket, COUNT(*) AS full_n,
         |    COUNT(*) FILTER (WHERE in_half) AS half_n
         |  FROM b GROUP BY dim, bucket)
         |SELECT CAST(dim AS BIGINT) AS dim,
         |  CAST(SUM(full_n) AS BIGINT) AS full_n,
         |  CAST(SUM(half_n) AS BIGINT) AS half_n,
         |  CAST(SUM(abs(2 * half_n - full_n)) AS BIGINT) AS drift_num
         |FROM h GROUP BY dim ORDER BY dim""".stripMargin,
    // The oracle lays the corpus out with the NAIVE single global
    // window (as q52's does) and unnests each document's sequence span
    // arithmetically — proving the two-phase offsets and the
    // boundary-split arithmetic exact, piece by piece.
    "q83_packed_sequences" ->
      s"""WITH pk_src AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
         |${packedSeqSqlTail}""".stripMargin,
    "q84_hard_negatives" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, label AS q_label, e AS qe
         |  FROM v WHERE vec_id < 8),
         |p AS (
         |  SELECT q.q_id, q.q_label, v.vec_id, v.label AS neg_label,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
         |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
         |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
         |  FROM v CROSS JOIN q
         |  WHERE v.vec_id <> q.q_id AND v.label <> q.q_label),
         |r AS (
         |  SELECT q_id, q_label, vec_id, neg_label, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM p)
         |SELECT q_id, q_label, rn, vec_id, neg_label, cos
         |FROM r WHERE rn <= $HardNegK
         |ORDER BY q_id, rn""".stripMargin,
    // Incremental snapshot dedup: the oracle rebuilds the same synthetic
    // snapshot, the same exact-hash stage, and doc-level 4-band MinHash
    // LSH restricted to new×old pairs, with the integer Jaccard rule.
    "q85_snapshot_dedup" ->
      """WITH old AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
        |nw AS (
        |  SELECT doc_id + 6000000 AS new_id, text FROM old
        |  WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 7000000, text || ' rr tt yy' FROM old
        |  WHERE doc_id % 10 = 1
        |  UNION ALL
        |  SELECT doc_id + 8000000,
        |    'novel snapshot page revision entry ' || doc_id FROM old
        |  WHERE doc_id % 10 = 2),
        |ex AS (
        |  SELECT n.new_id, MIN(o.doc_id) AS m_exact
        |  FROM nw n JOIN old o ON md5(n.text) = md5(o.text)
        |  GROUP BY n.new_id),
        |rest AS (
        |  SELECT new_id, text FROM nw
        |  WHERE new_id NOT IN (SELECT new_id FROM ex)),
        |osg AS (
        |  SELECT doc_id AS id, shingles FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(toks) >= 3 THEN
        |        list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |      ELSE [] END AS shingles
        |    FROM (SELECT doc_id,
        |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |          FROM old))
        |  WHERE len(shingles) > 0),
        |nsg AS (
        |  SELECT new_id AS id, shingles FROM (
        |    SELECT new_id,
        |      CASE WHEN len(toks) >= 3 THEN
        |        list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |          i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |      ELSE [] END AS shingles
        |    FROM (SELECT new_id,
        |            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |          FROM rest))
        |  WHERE len(shingles) > 0),
        |osig AS (
        |  SELECT id, shingles,
        |    list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
        |    list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
        |    list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
        |    list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
        |  FROM osg),
        |nsig AS (
        |  SELECT id, shingles,
        |    list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
        |    list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
        |    list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
        |    list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
        |  FROM nsg),
        |obands AS (
        |  SELECT id, 0 AS band, mh0 AS h FROM osig
        |  UNION ALL SELECT id, 1, mh1 FROM osig
        |  UNION ALL SELECT id, 2, mh2 FROM osig
        |  UNION ALL SELECT id, 3, mh3 FROM osig),
        |nbands AS (
        |  SELECT id, 0 AS band, mh0 AS h FROM nsig
        |  UNION ALL SELECT id, 1, mh1 FROM nsig
        |  UNION ALL SELECT id, 2, mh2 FROM nsig
        |  UNION ALL SELECT id, 3, mh3 FROM nsig),
        |cand AS (
        |  SELECT DISTINCT n.id AS new_id, o.id AS old_id
        |  FROM nbands n JOIN obands o ON n.band = o.band AND n.h = o.h),
        |near AS (
        |  SELECT new_id, MIN(old_id) AS m_near FROM (
        |    SELECT cand.new_id, cand.old_id,
        |      len(list_intersect(ns.shingles, os.shingles)) AS c,
        |      len(ns.shingles) AS ln, len(os.shingles) AS lo
        |    FROM cand
        |    JOIN nsig ns ON cand.new_id = ns.id
        |    JOIN osig os ON cand.old_id = os.id)
        |  WHERE c * 2 >= ln + lo - c
        |  GROUP BY new_id)
        |SELECT n.new_id,
        |  CASE WHEN ex.m_exact IS NOT NULL THEN 'exact_dup'
        |       WHEN near.m_near IS NOT NULL THEN 'near_dup'
        |       ELSE 'new' END AS verdict,
        |  CAST(COALESCE(ex.m_exact, near.m_near) AS BIGINT) AS matched_id
        |FROM nw n
        |LEFT JOIN ex ON n.new_id = ex.new_id
        |LEFT JOIN near ON n.new_id = near.new_id
        |ORDER BY n.new_id""".stripMargin,
    "q86_copurchase_communities" ->
      s"""WITH ${lpaCtes(LpaIters)}
         |SELECT id AS part_id, CAST(lbl AS BIGINT) AS community
         |FROM l$LpaIters ORDER BY part_id""".stripMargin,
    // The oracle ranks each epoch with the NAIVE per-epoch global
    // window — the hash-match proves the 16-range count decomposition
    // lands every document on its exact global position.
    // q45's full curation chain selects the train split; the shared
    // packing tail lays it out — the oracle composes the same two
    // proofs the components grade under.
    "q88_curated_packing" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |survivors AS (
         |  SELECT c.doc_id, c.text FROM corpus c
         |  LEFT JOIN comp ON c.doc_id = comp.doc_id
         |  WHERE comp.doc_id IS NULL OR comp.canonical_id = c.doc_id),
         |feat AS (
         |  SELECT doc_id, length(text) AS n_chars, len(toks) AS n_toks,
         |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |  FROM (SELECT doc_id, text,
         |          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |        FROM survivors) s),
         |qual AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |              WHEN n_chars > 300 THEN 25 ELSE 10 END
         |       + CASE WHEN n_toks >= 20 THEN 30 ELSE 15 END
         |       + CASE WHEN hits * 50 >= n_toks AND hits * 5 <= n_toks
         |              THEN 30 ELSE 10 END AS BIGINT) AS quality
         |  FROM feat),
         |pk_src AS (
         |  SELECT q.doc_id, c.text
         |  FROM qual q JOIN corpus c ON q.doc_id = c.doc_id
         |  WHERE q.quality >= 60 AND q.doc_id IS NOT NULL
         |    AND CAST('0x' || substr(md5(q.doc_id::VARCHAR), 1, 6) AS BIGINT)
         |        % 100 < 90),
         |${packedSeqSqlTail}""".stripMargin,
    "q87_epoch_order" ->
      s"""WITH x AS (
         |  SELECT e.epoch, d.doc_id,
         |    md5(e.epoch::VARCHAR || '_' || d.doc_id::VARCHAR) AS h
         |  FROM documents d,
         |    (SELECT unnest(generate_series(0, ${EpochCount - 1})) AS epoch) e
         |  WHERE d.doc_id IS NOT NULL)
         |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch
         |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM x ORDER BY epoch, pos""".stripMargin,
    // DuckDB's JSON operators are an independent parser — agreement
    // pins both the extraction semantics and the NULL degradation.
    // TRY_CAST, not CAST: the Spark side (from_json with a declared
    // schema) degrades invalid JSON / non-numeric k to NULL rather than
    // failing, and the oracle must share that degradation contract — a
    // plain CAST would error in DuckDB on inputs Spark tolerates.
    "q89_props_extract" ->
      """WITH p AS (
        |  SELECT event_type,
        |    TRY_CAST(CASE WHEN json_valid(props) THEN props->>'k' END
        |             AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(k) AS n_parsed,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q90_seeded_pagerank" ->
      s"""WITH ${seededPagerankCtes(PagerankIters)}
         |SELECT id AS part_id, r AS rank_fp FROM p$PagerankIters
         |ORDER BY rank_fp DESC, part_id ASC""".stripMargin,
    // Sign bits from the exact float→double widening; DuckDB's own
    // bit_count/xor are the independent popcount implementation.
    "q91_binary_hamming_knn" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |c AS (
         |  SELECT vec_id,
         |    CAST(list_sum(list_transform(range(1, 33), i ->
         |      CASE WHEN e[i] > 0 THEN 1::BIGINT << (i - 1)
         |           ELSE 0 END)) AS BIGINT) AS lo,
         |    CAST(list_sum(list_transform(range(33, 65), i ->
         |      CASE WHEN e[i] > 0 THEN 1::BIGINT << (i - 33)
         |           ELSE 0 END)) AS BIGINT) AS hi
         |  FROM v),
         |q AS (
         |  SELECT vec_id AS q_id, lo AS q_lo, hi AS q_hi FROM c
         |  WHERE vec_id < 8),
         |p AS (
         |  SELECT q.q_id, c.vec_id,
         |    CAST(bit_count(xor(c.lo, q.q_lo))
         |       + bit_count(xor(c.hi, q.q_hi)) AS BIGINT) AS hamming
         |  FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, vec_id, hamming,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY hamming ASC, vec_id ASC) AS rn
         |  FROM p)
         |SELECT q_id, rn, vec_id, hamming FROM r WHERE rn <= $QuantTopK
         |ORDER BY q_id, rn""".stripMargin,
    // The q39 rolling-hash fold decides boundaries; DuckDB's inclusive
    // list slice toks[a:b] rebuilds each chunk for hashing.
    "q92_cdc_chunk_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 9000000, 'pp qq rr ' || text FROM documents
         |  WHERE doc_id % 100 = 0),
         |t AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM corpus WHERE doc_id IS NOT NULL),
         |f AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    list_transform(toks, tok ->
         |      CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT)) AS th
         |  FROM t WHERE len(toks) > 0),
         |kh AS (
         |  SELECT doc_id, toks, n,
         |    CASE WHEN n >= $CdcChunkWindow THEN
         |      list_transform(generate_series(1, n - ${CdcChunkWindow - 1}), i ->
         |        list_reduce(
         |          list_transform(generate_series(0, ${CdcChunkWindow - 1}),
         |            o -> th[i + o]),
         |          (a, b) -> (a * 1000003 + b) % 33554432))
         |    ELSE [] END AS khs
         |  FROM f),
         |bd AS (
         |  SELECT doc_id, toks,
         |    list_sort(list_distinct(list_concat(list_concat(
         |      [0::BIGINT],
         |      list_transform(
         |        list_filter(generate_series(1, len(khs)),
         |          i -> khs[i] % $CdcChunkMask = 0),
         |        i -> (i + ${CdcChunkWindow - 1})::BIGINT)),
         |      [n::BIGINT]))) AS bounds
         |  FROM kh),
         |ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(2, len(bounds)), j ->
         |      md5(array_to_string(toks[bounds[j-1] + 1 : bounds[j]], ' '))))
         |      AS chunk_hash
         |  FROM bd),
         |sh AS (
         |  SELECT chunk_hash FROM ch GROUP BY chunk_hash
         |  HAVING COUNT(DISTINCT doc_id) > 1)
         |SELECT ch.doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN sh.chunk_hash IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_shared
         |FROM ch LEFT JOIN sh ON ch.chunk_hash = sh.chunk_hash
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin,
    "q93_preference_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, n_chars,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents),
         |e AS (
         |  SELECT doc_id, source, n_chars, len(toks) AS n_toks,
         |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |  FROM d),
         |q AS (
         |  SELECT doc_id, source,
         |    CAST(CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |              WHEN n_chars > 300 THEN 25 ELSE 10 END
         |       + CASE WHEN n_toks >= 20 THEN 30 ELSE 15 END
         |       + CASE WHEN hits * 50 >= n_toks AND hits * 5 <= n_toks
         |              THEN 30 ELSE 10 END AS BIGINT) AS quality
         |  FROM e),
         |r AS (
         |  SELECT doc_id, source, quality,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id ASC) AS r_top,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality ASC, doc_id DESC) AS r_bot
         |  FROM q)
         |SELECT c.source, CAST(c.r_top AS BIGINT) AS pair_rank,
         |  c.doc_id AS chosen_id, j.doc_id AS rejected_id,
         |  c.quality - j.quality AS margin
         |FROM r c JOIN r j
         |  ON c.source = j.source AND c.r_top = j.r_bot
         |WHERE c.r_top <= $PrefPairsPerGroup
         |  AND c.doc_id <> j.doc_id AND c.quality > j.quality
         |ORDER BY c.source, pair_rank""".stripMargin,
    // Same train/bench construction as q47; positional grams, tainted
    // position union, and the kept-token reassembly all replayed in
    // DuckDB list arithmetic.
    "q94_decontaminate_spans" ->
      """WITH bench AS (
        |  SELECT doc_id AS bench_id, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |train AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 100 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
        |  WHERE doc_id % 100 = 0),
        |tk AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
        |  FROM train WHERE doc_id IS NOT NULL),
        |tg AS (
        |  SELECT doc_id, u.i AS pos,
        |    toks[u.i] || ' ' || toks[u.i + 1] || ' ' || toks[u.i + 2] AS gram
        |  FROM tk, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |bg AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END) AS gram
        |  FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |        FROM bench)),
        |hits AS (
        |  SELECT tg.doc_id, list_distinct(list(tg.pos)) AS hits
        |  FROM tg JOIN bg ON tg.gram = bg.gram
        |  GROUP BY tg.doc_id),
        |srg AS (
        |  SELECT tk.doc_id, tk.toks,
        |    list_distinct(flatten(list_transform(
        |      COALESCE(hits.hits, []), p -> generate_series(p, p + 2))))
        |      AS taints
        |  FROM tk LEFT JOIN hits ON tk.doc_id = hits.doc_id),
        |fin AS (
        |  SELECT doc_id, toks,
        |    list_filter(generate_series(1, len(toks)),
        |      i -> NOT list_contains(taints, i)) AS kept
        |  FROM srg)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
        |  -- a fully-excised doc cleans to '' (DuckDB's array_to_string
        |  -- of an empty list is NULL; Spark's array_join is '')
        |  COALESCE(array_to_string(list_transform(kept, i -> toks[i]), ' '),
        |           '') AS clean_text
        |FROM fin ORDER BY doc_id""".stripMargin,
    // The oracle IS the naive global NTILE window — the hash match
    // proves the histogram-selected boundary decomposition lands every
    // row in its exact NTILE bucket.
    "q95_range_layout" ->
      s"""WITH r AS (
         |  SELECT o_totalprice,
         |    NTILE($RangeLayoutBuckets) OVER
         |      (ORDER BY o_totalprice, o_orderkey) AS bucket
         |  FROM orders)
         |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,
    // Content-level banding (identical texts collapse BEFORE LSH, as
    // the Spark side does) with NO acceptance threshold — the q19
    // machinery reported as deciles.
    "q96_dedup_threshold_sweep" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
        |  WHERE doc_id % 100 = 0),
        |contents AS (
        |  SELECT DISTINCT text, md5(text) AS cid FROM corpus),
        |d AS (
        |  SELECT cid, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM contents),
        |sg AS (
        |  SELECT cid,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END AS shingles
        |  FROM d),
        |sig AS (
        |  SELECT cid, shingles,
        |    list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
        |    list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
        |    list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
        |    list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
        |  FROM sg),
        |bands AS (
        |  SELECT cid, 0 AS band, mh0 AS h FROM sig
        |  UNION ALL SELECT cid, 1, mh1 FROM sig
        |  UNION ALL SELECT cid, 2, mh2 FROM sig
        |  UNION ALL SELECT cid, 3, mh3 FROM sig),
        |cand AS (
        |  SELECT DISTINCT a.cid AS ca, b.cid AS cb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.h = b.h AND a.cid < b.cid),
        |j AS (
        |  SELECT ca, cb,
        |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |      (len(sa.shingles) + len(sb.shingles)
        |       - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
        |  FROM cand
        |  JOIN sig sa ON cand.ca = sa.cid
        |  JOIN sig sb ON cand.cb = sb.cid)
        |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS band,
        |  COUNT(*) AS n_pairs,
        |  MIN(jaccard) AS min_jaccard, MAX(jaccard) AS max_jaccard
        |FROM j GROUP BY band ORDER BY band""".stripMargin,

    // Replays Dedup.minhashAccuracy: the q96 candidate chain, then
    // per-pair match counts vs exact integer Jaccard ppm, banded by
    // match count with the global MAE/bias repeated per row.
    "q261_minhash_accuracy" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' qq ww ee' FROM documents
        |  WHERE doc_id % 100 = 0),
        |contents AS (
        |  SELECT DISTINCT text, md5(text) AS cid FROM corpus),
        |d AS (
        |  SELECT cid, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM contents),
        |sg AS (
        |  SELECT cid,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END AS shingles
        |  FROM d),
        |sig AS MATERIALIZED (
        |  SELECT cid, shingles,
        |    list_aggregate(list_transform(shingles, x -> md5('seed0' || x)), 'min') AS mh0,
        |    list_aggregate(list_transform(shingles, x -> md5('seed1' || x)), 'min') AS mh1,
        |    list_aggregate(list_transform(shingles, x -> md5('seed2' || x)), 'min') AS mh2,
        |    list_aggregate(list_transform(shingles, x -> md5('seed3' || x)), 'min') AS mh3
        |  FROM sg),
        |bands AS (
        |  SELECT cid, 0 AS band, mh0 AS h FROM sig
        |  UNION ALL SELECT cid, 1, mh1 FROM sig
        |  UNION ALL SELECT cid, 2, mh2 FROM sig
        |  UNION ALL SELECT cid, 3, mh3 FROM sig),
        |cand AS (
        |  SELECT DISTINCT a.cid AS ca, b.cid AS cb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.h = b.h AND a.cid < b.cid),
        |scored AS MATERIALIZED (
        |  SELECT ca, cb,
        |    CAST(CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
        |      + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
        |      + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
        |      + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
        |      AS BIGINT) AS matches,
        |    CAST(len(list_intersect(sa.shingles, sb.shingles))
        |        AS BIGINT) * 1000000
        |      // (len(sa.shingles) + len(sb.shingles)
        |         - len(list_intersect(sa.shingles, sb.shingles)))
        |      AS exact_ppm
        |  FROM cand
        |  JOIN sig sa ON cand.ca = sa.cid
        |  JOIN sig sb ON cand.cb = sb.cid),
        |e AS (
        |  SELECT matches, exact_ppm,
        |    matches * 250000 - exact_ppm AS err_ppm
        |  FROM scored),
        |g AS (
        |  SELECT CAST(SUM(abs(err_ppm)) // COUNT(*) AS BIGINT)
        |      AS mae_ppm,
        |    CAST(SUM(err_ppm) // COUNT(*) AS BIGINT) AS bias_ppm
        |  FROM e)
        |SELECT matches, matches * 250000 AS est_ppm,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(exact_ppm) // COUNT(*) AS BIGINT) AS mean_exact_ppm,
        |  CAST(SUM(err_ppm) // COUNT(*) AS BIGINT) AS mean_err_ppm,
        |  CAST(SUM(abs(err_ppm)) // COUNT(*) AS BIGINT)
        |    AS mean_abs_err_ppm,
        |  CAST(MIN(exact_ppm) AS BIGINT) AS min_exact_ppm,
        |  CAST(MAX(exact_ppm) AS BIGINT) AS max_exact_ppm,
        |  g.mae_ppm, g.bias_ppm
        |FROM e CROSS JOIN g
        |GROUP BY matches, g.mae_ppm, g.bias_ppm
        |ORDER BY matches""".stripMargin,

    // Replays Dedup.dedupScalingCurve: the Knuth-hash quarter, nested
    // membership fan-out, the q17 shape per fraction, and the
    // vs-full underestimation ratio.
    "q267_dedup_scaling" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 100 = 0),
        |qd AS (
        |  SELECT md5(text) AS h,
        |    (doc_id * 2654435761) % 4294967296 // 1073741824 AS q
        |  FROM corpus),
        |e AS (
        |  SELECT h, CAST(unnest(generate_series(q + 1, 4)) AS BIGINT)
        |    AS f
        |  FROM qd),
        |perf AS MATERIALIZED (
        |  SELECT f, h, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM e GROUP BY 1, 2),
        |agg AS (
        |  SELECT f, CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_contents,
        |    CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_groups,
        |    CAST(SUM(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END)
        |      AS BIGINT) AS n_redundant
        |  FROM perf GROUP BY 1),
        |a2 AS (
        |  SELECT agg.*,
        |    CAST(n_redundant * 1000000 // n_docs AS BIGINT) AS dup_ppm
        |  FROM agg),
        |fl AS (SELECT dup_ppm AS full_dup_ppm FROM a2 WHERE f = 4)
        |SELECT f, n_docs, n_contents, n_dup_groups, n_redundant,
        |  dup_ppm, full_dup_ppm,
        |  CAST(dup_ppm * 1000000 // nullif(full_dup_ppm, 0)
        |    AS BIGINT) AS vs_full_ppm
        |FROM a2 CROSS JOIN fl ORDER BY f""".stripMargin,

    // Replays Relational.mutualInformationOf: one contingency
    // collapse, per-cell PMI terms off exactly-representable integer
    // ratios (the q58/q264 ln discipline), DECIMAL(38,18) sums,
    // round 6, U = ratio of the two rounded values.
    "q268_mutual_information" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST(c_nationkey AS BIGINT) AS x, c_mktsegment AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx
        |  FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        |hx AS (
        |  SELECT round(CAST(SUM(CAST((cx::DOUBLE / n::DOUBLE)
        |    * ln(n::DOUBLE / cx::DOUBLE) AS DECIMAL(38, 18)))
        |    AS DOUBLE), 6) AS h_x
        |  FROM mx CROSS JOIN tot),
        |hy AS (
        |  SELECT round(CAST(SUM(CAST((cy::DOUBLE / n::DOUBLE)
        |    * ln(n::DOUBLE / cy::DOUBLE) AS DECIMAL(38, 18)))
        |    AS DOUBLE), 6) AS h_y
        |  FROM my CROSS JOIN tot),
        |scored AS MATERIALIZED (
        |  SELECT cells.x, cells.y, cells.c,
        |    CAST(mx.cx * my.cy // tot.n AS BIGINT) AS expected,
        |    round((cells.c::DOUBLE / tot.n::DOUBLE)
        |      * ln((cells.c * tot.n)::DOUBLE
        |        / (mx.cx * my.cy)::DOUBLE), 6) AS pmi_term,
        |    tot.n AS n
        |  FROM cells JOIN mx USING (x) JOIN my USING (y)
        |  CROSS JOIN tot),
        |hj AS (
        |  SELECT round(CAST(SUM(CAST((c::DOUBLE / n::DOUBLE)
        |    * ln(n::DOUBLE / c::DOUBLE) AS DECIMAL(38, 18)))
        |    AS DOUBLE), 6) AS h_joint
        |  FROM scored),
        |mi AS (
        |  SELECT round(CAST(SUM(CAST(pmi_term AS DECIMAL(38, 18)))
        |    AS DOUBLE), 6) AS mi_nats
        |  FROM scored)
        |SELECT x, y, c, expected, pmi_term, h_x, h_y, h_joint,
        |  mi_nats,
        |  CASE WHEN h_x = 0.0 THEN NULL
        |    ELSE round(mi_nats / h_x, 6) END AS u_x_given_y,
        |  CASE WHEN h_y = 0.0 THEN NULL
        |    ELSE round(mi_nats / h_y, 6) END AS u_y_given_x
        |FROM scored CROSS JOIN hx CROSS JOIN hy CROSS JOIN hj
        |CROSS JOIN mi
        |ORDER BY x, y""".stripMargin,

    // Replays RankTests.sourceLengthDriftOf: the (source, length)
    // histogram, the sources x global-domain grid, q221's exact
    // cross-multiplied sup-gap per arm, raw + pinned-Bonferroni
    // verdicts.
    "q269_source_length_drift" ->
      s"""WITH lens AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS v
        |  FROM documents WHERE doc_id IS NOT NULL),
        |h AS MATERIALIZED (
        |  SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lens GROUP BY 1, 2),
        |gv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cg
        |  FROM h GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS m FROM h),
        |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_a
        |  FROM h GROUP BY 1),
        |grid AS (
        |  SELECT s.source, gv.v, gv.cg, COALESCE(h.c, 0) AS c
        |  FROM (SELECT DISTINCT source FROM h) s
        |  CROSS JOIN gv
        |  LEFT JOIN h ON h.source = s.source AND h.v = gv.v),
        |diffs AS MATERIALIZED (
        |  SELECT g.source, g.v, ns.n_a, tot.n_total - ns.n_a AS n_b,
        |    tot.m,
        |    abs(SUM(g.c) OVER (PARTITION BY g.source ORDER BY g.v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        ::HUGEINT * (tot.n_total - ns.n_a)
        |      - (SUM(g.cg) OVER (PARTITION BY g.source ORDER BY g.v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         - SUM(g.c) OVER (PARTITION BY g.source ORDER BY g.v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |        ::HUGEINT * ns.n_a) AS adiff
        |  FROM grid g JOIN ns ON ns.source = g.source
        |  CROSS JOIN tot),
        |dm AS (SELECT source, MAX(adiff) AS dm
        |  FROM diffs GROUP BY 1),
        |arm AS (
        |  SELECT d.source, MIN(d.v) AS v_at_max, MAX(d.dm2) AS dm,
        |    MAX(d.n_a) AS n_a, MAX(d.n_b) AS n_b, MAX(d.m) AS m
        |  FROM (SELECT diffs.*, dm.dm AS dm2 FROM diffs
        |        JOIN dm ON dm.source = diffs.source
        |        WHERE diffs.adiff = dm.dm) d
        |  GROUP BY 1)
        |SELECT source, n_a, n_b,
        |  CAST(dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0)
        |    AS BIGINT) AS d_ppm,
        |  v_at_max, m,
        |  CAST(${RankTests.KsCrit2Micro} AS BIGINT) AS crit2_micro,
        |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |    WHEN (dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0))
        |        ::HUGEINT
        |        * (dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0))
        |        * n_a * n_b
        |      > ${RankTests.KsCrit2Micro}::HUGEINT * (n_a + n_b)
        |        * 1000000
        |      THEN 1 ELSE 0 END AS BIGINT) AS significant_raw,
        |  CAST(([${RankTests.KsCrit2MicroByM.mkString(",")}])
        |    [CAST(m AS INT)] AS BIGINT) AS crit2_bonf_micro,
        |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |    WHEN (dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0))
        |        ::HUGEINT
        |        * (dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0))
        |        * n_a * n_b
        |      > (([${RankTests.KsCrit2MicroByM.mkString(",")}])
        |          [CAST(m AS INT)])::HUGEINT * (n_a + n_b) * 1000000
        |      THEN 1 ELSE 0 END AS BIGINT) AS significant_bonf
        |FROM arm
        |ORDER BY source""".stripMargin,

    // Replays Stats.joinAdvisor: exact measured bytes under the
    // pinned width model (fixed-width 8, string length + 4), the
    // pinned 10 MiB threshold and executor fan-out, the same
    // strategy pick and bucketing amortization.
    "q270_join_advisor" ->
      s"""WITH cust AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(24 + COALESCE(len(c_name), 0) + 4
        |      + COALESCE(len(c_mktsegment), 0) + 4) AS BIGINT) AS b
        |  FROM customer),
        |ord AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(32 + COALESCE(len(o_orderstatus), 0) + 4
        |      + COALESCE(len(o_orderpriority), 0) + 4) AS BIGINT) AS b
        |  FROM orders),
        |li AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(72 + COALESCE(len(l_returnflag), 0) + 4
        |      + COALESCE(len(l_linestatus), 0) + 4) AS BIGINT) AS b
        |  FROM lineitem),
        |prt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(24 + COALESCE(len(p_name), 0) + 4
        |      + COALESCE(len(p_brand), 0) + 4
        |      + COALESCE(len(p_type), 0) + 4) AS BIGINT) AS b
        |  FROM part),
        |base AS (
        |  SELECT 'customer_orders' AS join_name, cust.n AS n_left,
        |    ord.n AS n_right, cust.b AS bytes_left, ord.b AS bytes_right
        |  FROM cust CROSS JOIN ord
        |  UNION ALL
        |  SELECT 'orders_lineitem', ord.n, li.n, ord.b, li.b
        |  FROM ord CROSS JOIN li
        |  UNION ALL
        |  SELECT 'part_lineitem', prt.n, li.n, prt.b, li.b
        |  FROM prt CROSS JOIN li),
        |adv AS (
        |  SELECT base.*, least(bytes_left, bytes_right) AS build_bytes,
        |    bytes_left + bytes_right AS shuffle_moved
        |  FROM base),
        |adv2 AS (
        |  SELECT adv.*,
        |    CASE WHEN build_bytes <= ${graft.ops.Stats
                   .BroadcastThresholdBytes}
        |      THEN build_bytes * ${graft.ops.Stats.AdvisorExecutors}
        |      ELSE NULL END AS broadcast_moved
        |  FROM adv),
        |adv3 AS (
        |  SELECT adv2.*,
        |    CASE WHEN broadcast_moved IS NOT NULL
        |        AND broadcast_moved < shuffle_moved
        |      THEN 'broadcast' ELSE 'shuffle' END AS chosen
        |  FROM adv2),
        |adv4 AS (
        |  SELECT adv3.*,
        |    CASE WHEN chosen = 'broadcast' THEN broadcast_moved
        |      ELSE shuffle_moved END AS chosen_moved,
        |    shuffle_moved AS bucket_layout_bytes
        |  FROM adv3)
        |SELECT join_name, n_left, n_right, bytes_left, bytes_right,
        |  build_bytes, shuffle_moved,
        |  CAST(broadcast_moved AS BIGINT) AS broadcast_moved, chosen,
        |  chosen_moved,
        |  bucket_layout_bytes,
        |  (bucket_layout_bytes + chosen_moved - 1) // chosen_moved
        |    AS bucket_amortize_runs
        |FROM adv4 ORDER BY join_name""".stripMargin,

    // Replays Events.competingRisksOf: per-user firsts with the
    // pinned tie rule, offset histogram + at-risk cumulative, and the
    // three Aalen-Johansen recurrences in ONE linear recursive CTE
    // (the old surv feeds each CIF term before it updates).
    "q262_competing_risks" ->
      """WITH RECURSIVE pu AS (
        |  SELECT user_id,
        |    MIN(epoch_us(ts) // 1000000 // 86400) AS first_day,
        |    MIN(CASE WHEN event_type = 'error'
        |      THEN epoch_us(ts) // 1000000 // 86400 END) AS day_a,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(ts) // 1000000 // 86400 END) AS day_b
        |  FROM events GROUP BY 1),
        |mx AS (SELECT MAX(epoch_us(ts) // 1000000 // 86400)
        |  AS max_day FROM events),
        |sub AS (
        |  SELECT
        |    CASE WHEN day_a IS NOT NULL
        |        AND (day_b IS NULL OR day_a <= day_b)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ea,
        |    CASE WHEN day_b IS NOT NULL
        |        AND (day_a IS NULL OR day_b < day_a)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS eb,
        |    CASE WHEN day_a IS NOT NULL OR day_b IS NOT NULL
        |      THEN least(day_a, day_b) - first_day
        |      ELSE max_day - first_day END AS t
        |  FROM pu CROSS JOIN mx),
        |hist AS MATERIALIZED (
        |  SELECT t, CAST(SUM(ea) AS BIGINT) AS d_a,
        |    CAST(SUM(eb) AS BIGINT) AS d_b,
        |    CAST(SUM(1 - ea - eb) AS BIGINT) AS c,
        |    CAST(COUNT(*) AS BIGINT) AS n_t
        |  FROM sub GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM hist),
        |risk AS MATERIALIZED (
        |  SELECT t, d_a, d_b, c,
        |    CAST(n_total - COALESCE(SUM(n_t) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_at_risk,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn
        |  FROM hist CROSS JOIN tot),
        |chain(rn, surv, ca, cb) AS (
        |  SELECT rn,
        |    1000000 * (n_at_risk - d_a - d_b) // n_at_risk,
        |    1000000 * d_a // n_at_risk,
        |    1000000 * d_b // n_at_risk
        |  FROM risk WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn,
        |    ch.surv * (r.n_at_risk - r.d_a - r.d_b) // r.n_at_risk,
        |    ch.ca + ch.surv * r.d_a // r.n_at_risk,
        |    ch.cb + ch.surv * r.d_b // r.n_at_risk
        |  FROM chain ch JOIN risk r ON r.rn = ch.rn + 1)
        |SELECT r.t, r.n_at_risk, r.d_a, r.d_b, r.c AS n_censored,
        |  CAST(ch.surv AS BIGINT) AS surv_ppm,
        |  CAST(ch.ca AS BIGINT) AS cif_a_ppm,
        |  CAST(ch.cb AS BIGINT) AS cif_b_ppm
        |FROM risk r JOIN chain ch ON r.rn = ch.rn
        |ORDER BY r.t""".stripMargin,
    // Deliberately the NAIVE four-scan melt — Spark's one-Expand stack
    // must be value-identical.
    "q97_measure_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'discount' AS measure,
        |    CAST(l_discount AS DECIMAL(12,2)) AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'extendedprice',
        |    CAST(l_extendedprice AS DECIMAL(12,2)) FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'quantity',
        |    CAST(l_quantity AS DECIMAL(12,2)) FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'tax',
        |    CAST(l_tax AS DECIMAL(12,2)) FROM lineitem)
        |SELECT l_returnflag, measure,
        |  CAST(SUM(value) AS DOUBLE) AS sum_value, COUNT(*) AS n
        |FROM m GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,
    // The word-frequency collapse happens first on both sides; pair
    // weights are SUM(freq), cast to BIGINT (DuckDB sums to HUGEINT).
    "q98_bpe_pairs" ->
      s"""WITH words AS (
         |  SELECT word, COUNT(*) AS freq FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
         |    FROM documents WHERE doc_id IS NOT NULL) uw
         |  GROUP BY word),
         |pairs AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occ FROM (
         |    SELECT freq,
         |      unnest(list_transform(generate_series(1, length(word) - 1),
         |        i -> substring(word, i, 2))) AS pair
         |    FROM words WHERE length(word) >= 2) up
         |  GROUP BY pair),
         |ranked AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair ASC) AS rank,
         |    pair, n_occ
         |  FROM pairs)
         |SELECT CAST(rank AS BIGINT) AS rank, pair, n_occ
         |FROM ranked WHERE rank <= $BpePairsK ORDER BY rank""".stripMargin,
    // Postings serialize as the space-joined doc_id list (numeric sort)
    // on both sides; suppressed lists stay NULL through the left join.
    "q99_inverted_index" ->
      s"""WITH postings AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
         |      AS term
         |  FROM documents WHERE doc_id IS NOT NULL),
         |dfs AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
         |kept AS (
         |  SELECT p.term,
         |    string_agg(CAST(p.doc_id AS VARCHAR), ' ' ORDER BY p.doc_id)
         |      AS postings
         |  FROM postings p JOIN dfs d
         |    ON p.term = d.term AND d.df <= $InvertedIndexMaxDf
         |  GROUP BY p.term)
         |SELECT d.term, d.df, k.postings
         |FROM dfs d LEFT JOIN kept k ON d.term = k.term
         |ORDER BY d.term""".stripMargin,
    // The vocab cut is the same (count DESC, token ASC) top-N on both
    // sides; rates are integer parts-per-million so the hash is exact.
    "q100_oov_rates" ->
      s"""WITH toks AS (
         |  SELECT source,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         |  FROM documents WHERE doc_id IS NOT NULL),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, COUNT(*) AS n FROM toks GROUP BY token) tc
         |  ORDER BY n DESC, token ASC LIMIT $OovVocabSize)
         |SELECT t.source,
         |  COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000
         |       // COUNT(*) AS BIGINT) AS oov_ppm
         |FROM toks t LEFT JOIN vocab v ON t.token = v.token
         |GROUP BY t.source ORDER BY t.source""".stripMargin,
    // Oracle-side replay of the q101 BPE training loop: one CTE triple
    // (pair counts, winning pair, rewritten vocab) per merge round over
    // the same spaced-symbol word representation, so the literal
    // `replace` merge semantics are identical on both engines.
    "q101_bpe_merges" -> {
      val union = (1 to BpeMergeSteps).map(t => s"SELECT * FROM b$t")
        .mkString("\n  UNION ALL ")
      s"""WITH ${bpeCtes(BpeMergeSteps)}
         |SELECT CAST(step AS BIGINT) AS step, lhs, rhs,
         |  lhs || rhs AS merged, n_occ
         |FROM ($union)
         |ORDER BY step""".stripMargin
    },
    // q102 re-joins the per-source word table against the trained
    // vocabulary (w$k) and reports integer-ppm fertility/compression.
    "q102_bpe_encode_stats" ->
      s"""WITH ${bpeCtes(BpeMergeSteps)}
         |SELECT source, n_words, n_pieces,
         |  CAST(n_pieces * 1000000 // n_words AS BIGINT)
         |    AS pieces_per_word_ppm,
         |  CAST(n_chars * 1000000 // n_pieces AS BIGINT)
         |    AS chars_per_piece_ppm
         |FROM (
         |  SELECT s.source, CAST(SUM(s.cnt) AS BIGINT) AS n_words,
         |    CAST(SUM(s.cnt * len(string_split(trim(v.w), '  '))) AS BIGINT)
         |      AS n_pieces,
         |    CAST(SUM(s.cnt * length(s.word)) AS BIGINT) AS n_chars
         |  FROM sw s JOIN w$BpeMergeSteps v USING (word)
         |  GROUP BY s.source) agg
         |ORDER BY source""".stripMargin,
    // The q21 dot-product/norm formulation verbatim (broadcast side's
    // elements first), benchmark = every 100th vector ×2 (exact in both
    // engines: float ×2 then cast, vs double ×2 — identical doubles).
    "q103_embedding_decontam" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         |b AS (
         |  SELECT vec_id AS b_id, list_transform(e, x -> x * 2) AS be
         |  FROM v WHERE vec_id % 100 = 0),
         |p AS (
         |  SELECT v.label, v.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(be) + 1), i -> be[i] * e[i])) /
         |      (sqrt(list_sum(list_transform(be, x -> x * x))) *
         |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
         |  FROM v CROSS JOIN b),
         |f AS (
         |  SELECT label,
         |    COUNT(DISTINCT CASE WHEN cos >= $EmbedDecontTau THEN vec_id END)
         |      AS n_flagged
         |  FROM p GROUP BY label),
         |n AS (SELECT label, COUNT(*) AS n_vecs FROM v GROUP BY label)
         |SELECT CAST(n.label AS BIGINT) AS label,
         |  CAST(n.n_vecs AS BIGINT) AS n_vecs,
         |  CAST(COALESCE(f.n_flagged, 0) AS BIGINT) AS n_flagged,
         |  CAST(COALESCE(f.n_flagged, 0) * 1000000 // n.n_vecs AS BIGINT)
         |    AS flagged_ppm
         |FROM n LEFT JOIN f USING (label)
         |ORDER BY label""".stripMargin,
    // q12's gap rule (floor-second, 1800s) + µs ordering; the sequence
    // serializes via ORDER BY inside the aggregate, the Spark side via
    // sorted (ts_us, event_id, type) structs — identical strings.
    "q104_session_sequences" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type,
         |    epoch_us(ts) AS us, epoch_us(ts) // 1000000 AS sec
         |  FROM events),
         |m AS (
         |  SELECT *, CASE WHEN lag(sec) OVER w IS NOT NULL
         |      AND sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s AS (
         |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM m),
         |q AS (
         |  SELECT user_id, sess,
         |    string_agg(event_type, ' ' ORDER BY us, event_id) AS seq
         |  FROM s GROUP BY user_id, sess),
         |c AS (SELECT seq, COUNT(*) AS n_sessions FROM q GROUP BY seq),
         |r AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY n_sessions DESC, seq ASC)
         |    AS rank, seq, n_sessions
         |  FROM c)
         |SELECT CAST(rank AS BIGINT) AS rank, seq,
         |  CAST(n_sessions AS BIGINT) AS n_sessions
         |FROM r WHERE rank <= $SessionSeqTopK ORDER BY rank""".stripMargin,
    // The q19 pair machinery verbatim, then q44's md5-bucket split
    // recomputed on each endpoint id — no corpus re-access.
    "q105_split_leakage" ->
      s"""WITH $nearDupPairCtes,
         |sp AS (
         |  SELECT
         |    CASE WHEN CAST('0x' || substr(md5(doc_a::VARCHAR), 1, 6) AS BIGINT) % 100 < 90 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(doc_a::VARCHAR), 1, 6) AS BIGINT) % 100 < 95 THEN 'validation'
         |         ELSE 'test' END AS sa,
         |    CASE WHEN CAST('0x' || substr(md5(doc_b::VARCHAR), 1, 6) AS BIGINT) % 100 < 90 THEN 'train'
         |         WHEN CAST('0x' || substr(md5(doc_b::VARCHAR), 1, 6) AS BIGINT) % 100 < 95 THEN 'validation'
         |         ELSE 'test' END AS sb
         |  FROM pairs),
         |c AS (
         |  SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
         |    COUNT(*) AS n_pairs
         |  FROM sp GROUP BY 1, 2)
         |SELECT split_a, split_b, CAST(n_pairs AS BIGINT) AS n_pairs,
         |  CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_leak
         |FROM c ORDER BY split_a, split_b""".stripMargin,
    // sqrt is correctly rounded per IEEE-754, so the α=1/2 temperature
    // point is bit-exact; Σ√n folds over a sorted list on both sides so
    // FP summation order is pinned (list_reduce / aggregate are both
    // sequential left folds).
    "q106_mixture_weights" ->
      """WITH counts AS (
        |  SELECT source,
        |    CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id IS NOT NULL
        |  GROUP BY source),
        |t AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
        |    list_reduce(list_sort(list(sqrt(n_tokens::DOUBLE))),
        |      (a, b) -> a + b) AS sum_sqrt
        |  FROM counts)
        |SELECT source, n_tokens,
        |  CAST(n_tokens * 1000000 // total AS BIGINT) AS natural_ppm,
        |  round(sqrt(n_tokens::DOUBLE) / sum_sqrt, 6) AS weight,
        |  round(sqrt(n_tokens::DOUBLE) / sum_sqrt * total::DOUBLE
        |    / n_tokens::DOUBLE, 6) AS boost
        |FROM counts, t ORDER BY source""".stripMargin,
    // Same (count DESC, token ASC) cut as q100 at each size; integer
    // ppm so the hash is exact.
    "q107_vocab_coverage" -> {
      val points = VocabCurveSizes.sorted.map { k =>
        s"""  SELECT $k AS vocab_size, (
           |    SELECT CAST(SUM(n) AS BIGINT) FROM (
           |      SELECT n FROM counts ORDER BY n DESC, token ASC LIMIT $k) v)
           |    AS n_tokens_covered""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH counts AS (
         |  SELECT token, COUNT(*) AS n FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |      AS token
         |    FROM documents WHERE doc_id IS NOT NULL) ut
         |  GROUP BY token),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
         |pts AS (
         |$points)
         |SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
         |  n_tokens_covered,
         |  CAST(n_tokens_covered * 1000000 // total AS BIGINT)
         |    AS coverage_ppm
         |FROM pts, t ORDER BY vocab_size""".stripMargin
    },
    // Each rule decided in integers (cross-multiplication, containment
    // over the FIXED 7-word stop list); empty token lists coalesce to 0
    // chars on both engines, so the vacuous r_wordlen pass agrees.
    "q108_gopher_gate" ->
      """WITH d AS (
        |  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |e AS (
        |  SELECT source, len(toks) AS n_toks,
        |    COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
        |      AS tok_chars,
        |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
        |      AS n_alpha,
        |    len(list_filter(['the','a','of','and','is','to','in'],
        |      s -> list_contains(toks, s))) AS n_stop
        |  FROM d),
        |g AS (
        |  SELECT source,
        |    CASE WHEN n_toks BETWEEN 25 AND 100000 THEN 1 ELSE 0 END
        |      AS r_count,
        |    CASE WHEN tok_chars >= n_toks * 3 AND tok_chars <= n_toks * 10
        |      THEN 1 ELSE 0 END AS r_wordlen,
        |    CASE WHEN n_alpha * 10 >= n_toks * 8 THEN 1 ELSE 0 END
        |      AS r_alpha,
        |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
        |  FROM e),
        |r AS (
        |  SELECT source, r_count, r_wordlen, r_alpha, r_stop,
        |    r_count * r_wordlen * r_alpha * r_stop AS pass
        |  FROM g)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(r_count) AS BIGINT) AS n_count_ok,
        |  CAST(SUM(r_wordlen) AS BIGINT) AS n_wordlen_ok,
        |  CAST(SUM(r_alpha) AS BIGINT) AS n_alpha_ok,
        |  CAST(SUM(r_stop) AS BIGINT) AS n_stop_ok,
        |  CAST(SUM(pass) AS BIGINT) AS n_pass,
        |  CAST(SUM(pass) * 1000000 // COUNT(*) AS BIGINT) AS pass_ppm
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // Replays TextOps.gateAblationOf: the q108 flag CTE, the 4-bit
    // mask rollup, and the sole-removal summary repeated per row.
    "q263_gate_ablation" ->
      """WITH d AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |e AS (
        |  SELECT len(toks) AS n_toks,
        |    COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
        |      AS tok_chars,
        |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
        |      AS n_alpha,
        |    len(list_filter(['the','a','of','and','is','to','in'],
        |      s -> list_contains(toks, s))) AS n_stop
        |  FROM d),
        |g AS (
        |  SELECT n_toks,
        |    CASE WHEN n_toks BETWEEN 25 AND 100000 THEN 1 ELSE 0 END
        |      AS r_count,
        |    CASE WHEN tok_chars >= n_toks * 3 AND tok_chars <= n_toks * 10
        |      THEN 1 ELSE 0 END AS r_wordlen,
        |    CASE WHEN n_alpha * 10 >= n_toks * 8 THEN 1 ELSE 0 END
        |      AS r_alpha,
        |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
        |  FROM e),
        |m AS MATERIALIZED (
        |  SELECT CAST(r_count * 8 + r_wordlen * 4 + r_alpha * 2 + r_stop
        |      AS BIGINT) AS mask,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |  FROM g GROUP BY 1),
        |s AS (
        |  SELECT
        |    COALESCE(SUM(CASE WHEN mask = 15 THEN n_docs END),
        |      CAST(0 AS BIGINT)) AS n_pass,
        |    COALESCE(SUM(CASE WHEN mask = 7 THEN n_docs END),
        |      CAST(0 AS BIGINT)) AS sole_count,
        |    COALESCE(SUM(CASE WHEN mask = 11 THEN n_docs END),
        |      CAST(0 AS BIGINT)) AS sole_wordlen,
        |    COALESCE(SUM(CASE WHEN mask = 13 THEN n_docs END),
        |      CAST(0 AS BIGINT)) AS sole_alpha,
        |    COALESCE(SUM(CASE WHEN mask = 14 THEN n_docs END),
        |      CAST(0 AS BIGINT)) AS sole_stop
        |  FROM m)
        |SELECT mask, (mask // 8) % 2 AS r_count,
        |  (mask // 4) % 2 AS r_wordlen, (mask // 2) % 2 AS r_alpha,
        |  mask % 2 AS r_stop, n_docs, n_tokens,
        |  CAST(n_pass AS BIGINT) AS n_pass,
        |  CAST(sole_count AS BIGINT) AS sole_count,
        |  CAST(sole_wordlen AS BIGINT) AS sole_wordlen,
        |  CAST(sole_alpha AS BIGINT) AS sole_alpha,
        |  CAST(sole_stop AS BIGINT) AS sole_stop
        |FROM m CROSS JOIN s
        |ORDER BY mask""".stripMargin,

    // Replays Relational.theilDecompositionOf: per-customer double
    // terms off exactly-representable integer ratios (the q58 ln
    // discipline), DECIMAL(38,18) sums, round 6; between/within off
    // the rounded per-nation values.
    "q264_theil_decomposition" ->
      """WITH spend AS (
        |  SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice
        |    AS DECIMAL(12, 2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |pos AS MATERIALIZED (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation, cents
        |  FROM spend JOIN customer ON o_custkey = c_custkey
        |  WHERE cents > 0),
        |g AS MATERIALIZED (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(cents) AS BIGINT) AS s_g
        |  FROM pos GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |  CAST(SUM(s_g) AS BIGINT) AS s FROM g),
        |terms AS MATERIALIZED (
        |  SELECT p.nation,
        |    (p.cents::DOUBLE / g.s_g::DOUBLE)
        |      * ln((p.cents * g.n_g)::DOUBLE / g.s_g::DOUBLE)
        |      AS t_g_term,
        |    (p.cents::DOUBLE / tot.s::DOUBLE)
        |      * ln((p.cents * tot.n)::DOUBLE / tot.s::DOUBLE)
        |      AS t_term
        |  FROM pos p JOIN g USING (nation) CROSS JOIN tot),
        |pn AS (
        |  SELECT t.nation, g.n_g AS n_cust, g.s_g AS spend_cents,
        |    round(CAST(SUM(CAST(t_g_term AS DECIMAL(38, 18)))
        |      AS DOUBLE), 6) AS theil_g
        |  FROM terms t JOIN g ON g.nation = t.nation
        |  GROUP BY 1, 2, 3),
        |wb AS MATERIALIZED (
        |  SELECT pn.nation, pn.n_cust, pn.spend_cents, pn.theil_g,
        |    CAST(pn.spend_cents * 1000000 // tot.s AS BIGINT)
        |      AS share_ppm,
        |    round((pn.spend_cents::DOUBLE / tot.s::DOUBLE)
        |      * ln((pn.spend_cents * tot.n)::DOUBLE
        |        / (tot.s * pn.n_cust)::DOUBLE), 6) AS between_term,
        |    tot.s AS s
        |  FROM pn CROSS JOIN tot),
        |gl AS (
        |  SELECT round(CAST(SUM(CAST(between_term AS DECIMAL(38, 18)))
        |      AS DOUBLE), 6) AS theil_between,
        |    round(CAST(SUM(CAST((spend_cents::DOUBLE / s::DOUBLE)
        |      * theil_g AS DECIMAL(38, 18))) AS DOUBLE), 6)
        |      AS theil_within
        |  FROM wb),
        |tt AS (
        |  SELECT round(CAST(SUM(CAST(t_term AS DECIMAL(38, 18)))
        |    AS DOUBLE), 6) AS theil_total
        |  FROM terms)
        |SELECT nation, n_cust, spend_cents, share_ppm, theil_g,
        |  between_term, theil_total, theil_between, theil_within
        |FROM wb CROSS JOIN gl CROSS JOIN tt
        |ORDER BY nation""".stripMargin,
    // The q44 md5-bucket rule seeded per hash row ('cms' || j || ':'):
    // counters replayed as a (j, b) grouped sum, estimates as the min
    // over each top-k token's d cells — overcount >= 0 structurally.
    "q109_cms_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    AS token
        |  FROM documents WHERE doc_id IS NOT NULL),
        |cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
        |jx AS (SELECT unnest(range(4)) AS j),
        |bk AS (
        |  SELECT j, token, n,
        |    CAST('0x' || substr(md5('cms' || j::VARCHAR || ':' || token),
        |      1, 6) AS BIGINT) % 1024 AS b
        |  FROM cnt CROSS JOIN jx),
        |ctr AS (
        |  SELECT j, b, CAST(SUM(n) AS BIGINT) AS c FROM bk GROUP BY j, b),
        |topk AS (
        |  SELECT token, n FROM cnt ORDER BY n DESC, token ASC LIMIT 20)
        |SELECT t.token, t.n AS n_exact, MIN(c.c) AS est,
        |  MIN(c.c) - t.n AS overcount
        |FROM topk t
        |JOIN bk ON bk.token = t.token
        |JOIN ctr c ON c.j = bk.j AND c.b = bk.b
        |GROUP BY t.token, t.n
        |ORDER BY n_exact DESC, t.token ASC""".stripMargin,
    // Register-exact HLL replay: 40-bit md5-prefix hash, low log2(m)
    // bits the register, rho = leading zeros + 1 via the minimal-bin
    // length (identical on both engines), estimate as ONE integral
    // division of the alpha-scaled numerator.
    "q110_hll_distinct" -> hllOracleSql(HllRegisters, HllAlphaPerMille),
    "q111_cross_source_neardups" ->
      s"""WITH $nearDupPairCtes,
         |sm AS (SELECT doc_id, source FROM documents),
         |pb AS (
         |  SELECT CASE WHEN doc_a >= 1000000 THEN doc_a - 1000000
         |              ELSE doc_a END AS ba,
         |         CASE WHEN doc_b >= 1000000 THEN doc_b - 1000000
         |              ELSE doc_b END AS bb,
         |         jaccard
         |  FROM pairs),
         |ps AS (
         |  SELECT least(sa.source, sb.source) AS source_a,
         |         greatest(sa.source, sb.source) AS source_b, jaccard
         |  FROM pb JOIN sm sa ON pb.ba = sa.doc_id
         |          JOIN sm sb ON pb.bb = sb.doc_id)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN jaccard = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_exact,
         |  MIN(jaccard) AS min_jaccard, MAX(jaccard) AS max_jaccard
         |FROM ps GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,
    "q112_normalized_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, upper(text) || ' !!', source
        |  FROM documents WHERE doc_id % 100 = 0),
        |h AS (
        |  SELECT source, md5(text) AS raw_h,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |      AS norm_h
        |  FROM corpus),
        |g AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    COUNT(DISTINCT raw_h) AS n_raw_distinct,
        |    COUNT(DISTINCT norm_h) AS n_norm_distinct
        |  FROM h GROUP BY source)
        |SELECT source, n_docs, n_raw_distinct, n_norm_distinct,
        |  n_raw_distinct - n_norm_distinct AS n_collapsed,
        |  (n_docs - n_norm_distinct) * 1000000 // n_docs AS dup_ppm_norm
        |FROM g ORDER BY source""".stripMargin,
    "q113_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL),
        |sg AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
        |    ELSE [] END AS shingles
        |  FROM d),
        |g AS (SELECT doc_id, unnest(shingles) AS gram FROM sg),
        |df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram),
        |per AS (
        |  SELECT g.doc_id, COUNT(*) AS n_grams,
        |    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_unique
        |  FROM g JOIN df USING (gram) GROUP BY g.doc_id)
        |SELECT doc_id, n_grams, n_unique,
        |  n_unique * 1000000 // n_grams AS novelty_ppm
        |FROM per ORDER BY doc_id""".stripMargin,
    // q40's recursive closure + the q44 bucket rule keyed on the
    // canonical id (identity for unclustered docs).
    "q114_cluster_split" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |cs AS (
         |  SELECT c.doc_id,
         |    COALESCE(comp.canonical_id, c.doc_id) AS canonical_id
         |  FROM corpus c LEFT JOIN comp ON c.doc_id = comp.doc_id),
         |b AS (
         |  SELECT doc_id, canonical_id,
         |    CAST('0x' || substr(md5(canonical_id::VARCHAR), 1, 6)
         |      AS BIGINT) % 100 AS bucket
         |  FROM cs)
         |SELECT doc_id, canonical_id, bucket,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "q115_token_budget" ->
      s"""WITH t AS (
         |  SELECT source,
         |    CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
         |      AS BIGINT) AS n_tokens
         |  FROM documents WHERE doc_id IS NOT NULL GROUP BY source),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
         |  FROM t),
         |d AS (SELECT CAST(SUM(w_sqrt) AS BIGINT) AS denom FROM w)
         |SELECT source, n_tokens, w_sqrt,
         |  $TokenBudget * w_sqrt // denom AS alloc_tokens,
         |  ($TokenBudget * w_sqrt // denom) * 1000 // n_tokens
         |    AS epochs_permille
         |FROM w, d ORDER BY source""".stripMargin,
    // the q12 lag-window session rule (gap > 1800 s breaks the chain);
    // row-normalization totals re-derived from the transition counts.
    "q116_session_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |t AS (
        |  SELECT prev_type, event_type AS next_type
        |  FROM e
        |  WHERE prev_ts IS NOT NULL
        |    AND date_diff('second', prev_ts, ts) <= 1800),
        |c AS (SELECT prev_type, next_type, COUNT(*) AS n_trans
        |      FROM t GROUP BY prev_type, next_type),
        |tot AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
        |        FROM c GROUP BY prev_type)
        |SELECT c.prev_type, c.next_type, c.n_trans,
        |  c.n_trans * 1000000 // tot.n_from AS p_ppm
        |FROM c JOIN tot USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    // Replays Quantization.pqAdcTopK: per-sub-space kmeans training
    // (pqCtes — the kmeansCtes shape with `sub` in every key), code
    // assignment, per-probe distance tables, and the sub-order ADC fold.
    "q117_pq_knn" ->
      s"""WITH ${pqCtes(PqM, PqSubDim, PqKSub, PqIters)},
         |codes AS (
         |  SELECT vec_id, list(cluster ORDER BY sub) AS codes
         |  FROM a$PqIters GROUP BY vec_id),
         |dt AS (
         |  SELECT s.vec_id AS q_id, c.sub, c.cluster,
         |    list_reduce(list_transform(range(1, ${PqSubDim + 1}),
         |      ii -> (s.sv[ii] - c.c[ii]) * (s.sv[ii] - c.c[ii])),
         |      (x2, y2) -> x2 + y2) AS d2
         |  FROM sv s JOIN cent${PqIters - 1} c ON s.sub = c.sub
         |  WHERE s.vec_id < 8),
         |dtab AS (
         |  SELECT q_id, list(d2 ORDER BY sub, cluster) AS dtab
         |  FROM dt GROUP BY q_id),
         |ad AS (
         |  SELECT d.q_id, cd.vec_id,
         |    list_reduce(list_transform(range(0, $PqM),
         |      s2 -> d.dtab[s2 * $PqKSub + cd.codes[s2 + 1] + 1]),
         |      (x2, y2) -> x2 + y2) AS adist
         |  FROM codes cd CROSS JOIN dtab d
         |  WHERE cd.vec_id <> d.q_id),
         |r AS (
         |  SELECT q_id, vec_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY adist ASC, vec_id ASC) AS rn
         |  FROM ad)
         |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, ROUND(adist, 6) AS adist
         |FROM r WHERE rn <= $QuantTopK ORDER BY q_id, rn""".stripMargin,

    // Replays TextOps.kmvVocabOverlap: per-source bottom-64 distinct
    // 56-bit hashes (the kmv_values state) via a ranked window, then
    // the identical sketch algebra per pair.
    "q118_kmv_vocab_overlap" ->
      s"""WITH toks AS (
         |  SELECT source,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         |  FROM documents WHERE doc_id IS NOT NULL),
         |h AS (
         |  SELECT DISTINCT source,
         |    ('0x' || substr(md5(token), 1, 14))::BIGINT AS hv
         |  FROM toks),
         |rk AS (
         |  SELECT source, hv,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
         |  FROM h),
         |sk AS (
         |  SELECT source, list(hv ORDER BY hv) AS sk
         |  FROM rk WHERE rn <= $KmvOverlapK GROUP BY source),
         |p AS (
         |  SELECT a.source AS src_a, b.source AS src_b, a.sk AS ska,
         |    b.sk AS skb, list_sort(list_distinct(a.sk || b.sk)) AS mrg
         |  FROM sk a JOIN sk b ON a.source < b.source),
         |c AS (
         |  SELECT src_a, src_b, ska, skb, mrg,
         |    greatest(least($KmvOverlapK, len(mrg)), 1) AS uk,
         |    CASE WHEN len(ska) < $KmvOverlapK THEN CAST(len(ska) AS BIGINT)
         |      ELSE (${KmvOverlapK - 1}::BIGINT * $KmvOverlapDomain) // ska[$KmvOverlapK]
         |      END AS est_a,
         |    CASE WHEN len(skb) < $KmvOverlapK THEN CAST(len(skb) AS BIGINT)
         |      ELSE (${KmvOverlapK - 1}::BIGINT * $KmvOverlapDomain) // skb[$KmvOverlapK]
         |      END AS est_b,
         |    CASE WHEN len(mrg) < $KmvOverlapK THEN CAST(len(mrg) AS BIGINT)
         |      ELSE (${KmvOverlapK - 1}::BIGINT * $KmvOverlapDomain) // mrg[$KmvOverlapK]
         |      END AS est_union
         |  FROM p)
         |SELECT src_a, src_b, est_a, est_b, est_union,
         |  greatest(est_a + est_b - est_union, 0) AS est_intersect,
         |  CAST(len(list_filter(list_slice(mrg, 1, uk),
         |    x -> list_contains(ska, x) AND list_contains(skb, x)))
         |    AS BIGINT) AS n_common,
         |  CAST(len(list_filter(list_slice(mrg, 1, uk),
         |    x -> list_contains(ska, x) AND list_contains(skb, x)))
         |    AS BIGINT) * 1000 // uk AS jaccard_permille
         |FROM c ORDER BY src_a, src_b""".stripMargin,

    // Replays TextOps.pmiCollocations: adjacent bigrams via the list
    // index walk (the word_ngrams mirror), HUGEINT cross-multiplication
    // and one floor division for the ppm score.
    "q119_pmi_collocations" ->
      s"""WITH toks AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
         |  FROM documents WHERE doc_id IS NOT NULL),
         |uc AS (
         |  SELECT word, COUNT(*) AS n FROM (
         |    SELECT unnest(tk) AS word FROM toks) u GROUP BY word),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM uc),
         |bc AS (
         |  SELECT bigram, COUNT(*) AS n_xy FROM (
         |    SELECT unnest(list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i + 1])) AS bigram
         |    FROM toks) b
         |  GROUP BY bigram HAVING COUNT(*) >= $PmiMinCountSql),
         |j AS (
         |  SELECT b.bigram, b.n_xy, x.n AS n_x, y.n AS n_y,
         |    CAST((b.n_xy::HUGEINT * t.n_total * 1000000)
         |      // (x.n::HUGEINT * y.n) AS BIGINT) AS pmi_ppm
         |  FROM bc b
         |  JOIN uc x ON split_part(b.bigram, ' ', 1) = x.word
         |  JOIN uc y ON split_part(b.bigram, ' ', 2) = y.word
         |  CROSS JOIN tot t),
         |r AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY pmi_ppm DESC, n_xy DESC,
         |    bigram ASC) AS rank, bigram, n_xy, n_x, n_y, pmi_ppm
         |  FROM j)
         |SELECT CAST(rank AS BIGINT) AS rank, bigram, n_xy, n_x, n_y, pmi_ppm
         |FROM r WHERE rank <= $PmiTopKSql ORDER BY rank""".stripMargin,

    // Replays Graph.purchaseHits: the bipartite incidence set, then
    // iters x (sum half-round, HUGEINT max-normalization) per side,
    // finally the two ranked leaderboards.
    "q120_purchase_hits" -> hitsOracleSql(HitsIters, HitsTopK),

    // Replays TextOps.relatedDocs: distinct postings, the 2..cap df
    // band with integer rarity weights, the term self-join, and the
    // per-anchor top-k.
    "q121_related_docs" ->
      s"""WITH ${relatedDocsCtes(RelatedDfCap)}
         |SELECT doc_a AS doc_id, CAST(rn AS BIGINT) AS rn,
         |  doc_b AS related_doc_id, n_shared_rare, score
         |FROM rel_ranked WHERE rn <= $RelatedTopK
         |ORDER BY doc_id, rn""".stripMargin,

    // Replays Events.markovEval: the q116 lag/session rule, the
    // integer 80%-of-window cutoff, train-side argmax, test rollup.
    "q122_markov_eval" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, epoch_us(ts) AS tus,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY epoch_us(ts), event_id)
        |      AS prev_type,
        |    lag(ts) OVER (PARTITION BY user_id
        |                  ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events),
        |b AS (SELECT MIN(tus) + (MAX(tus) - MIN(tus)) * 8 // 10 AS cutoff
        |      FROM e),
        |t AS (
        |  SELECT prev_type, event_type AS next_type,
        |    tus > (SELECT cutoff FROM b) AS is_test
        |  FROM e
        |  WHERE prev_ts IS NOT NULL
        |    AND date_diff('second', prev_ts, ts) <= 1800),
        |cnt AS (SELECT prev_type, next_type, is_test, COUNT(*) AS n
        |        FROM t GROUP BY prev_type, next_type, is_test),
        |model AS (
        |  SELECT prev_type, next_type AS predicted_type FROM (
        |    SELECT prev_type, next_type,
        |      ROW_NUMBER() OVER (PARTITION BY prev_type
        |                         ORDER BY n DESC, next_type ASC) AS rn
        |    FROM cnt WHERE NOT is_test) m WHERE rn = 1)
        |SELECT c.prev_type, mo.predicted_type,
        |  CAST(SUM(c.n) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN c.next_type = mo.predicted_type THEN c.n
        |    ELSE 0 END) AS BIGINT) AS n_correct,
        |  CAST(SUM(CASE WHEN c.next_type = mo.predicted_type THEN c.n
        |    ELSE 0 END) AS BIGINT) * 1000000 // CAST(SUM(c.n) AS BIGINT)
        |    AS acc_ppm
        |FROM cnt c LEFT JOIN model mo USING (prev_type)
        |WHERE c.is_test
        |GROUP BY c.prev_type, mo.predicted_type
        |ORDER BY c.prev_type""".stripMargin,

    // Replays TextOps.ragChunks: the same chunk-count rule and span
    // arithmetic; DuckDB's list_slice takes an INCLUSIVE end index,
    // which is exactly `end_tok` in 1-based terms.
    "q123_rag_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |      AS n
         |  FROM documents WHERE doc_id IS NOT NULL),
         |c AS (
         |  SELECT doc_id, tk, n,
         |    unnest(range(0,
         |      ((greatest(n - $RagChunkSize, 0) + ${RagChunkSize - RagOverlap - 1})
         |        // ${RagChunkSize - RagOverlap}) + 1)) AS idx
         |  FROM d)
         |SELECT doc_id, CAST(idx AS BIGINT) AS chunk_id,
         |  idx * ${RagChunkSize - RagOverlap} AS start_tok,
         |  least(idx * ${RagChunkSize - RagOverlap} + $RagChunkSize, n) AS end_tok,
         |  least(idx * ${RagChunkSize - RagOverlap} + $RagChunkSize, n)
         |    - idx * ${RagChunkSize - RagOverlap} AS n_tokens,
         |  array_to_string(list_slice(tk,
         |    CAST(idx * ${RagChunkSize - RagOverlap} + 1 AS INT),
         |    CAST(least(idx * ${RagChunkSize - RagOverlap} + $RagChunkSize, n)
         |      AS INT)), ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // Replays Events.volumeBursts: day buckets by double floor
    // division, the q53 lower-median rank rule, the integer 2.5x flag.
    "q124_volume_bursts" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, day, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY n ASC, day ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM daily),
        |med AS (SELECT event_type, n AS median_n FROM r
        |        WHERE rn = (m + 1) // 2)
        |SELECT d.event_type, d.day, d.n, med.median_n,
        |  CAST(CASE WHEN d.n * 10 >= med.median_n * 25 THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_burst
        |FROM daily d JOIN med USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    // Replays Events.purchaseAttribution: the user-keyed window join,
    // last-touch via the (t_ts, t_id) ranked window (= the struct max),
    // linear ppm by integral division, the direct remainder row.
    "q125_attribution" ->
      s"""WITH p AS (
         |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (
         |  SELECT user_id, event_type AS touch_type, event_id AS t_id,
         |    epoch_us(ts) AS t_ts
         |  FROM events WHERE event_type IN ('view', 'click')),
         |pr AS (
         |  SELECT p.p_id, t.touch_type, t.t_id, t.t_ts
         |  FROM p JOIN t USING (user_id)
         |  WHERE t.t_ts < p.p_ts
         |    AND t.t_ts >= p.p_ts - ${AttrWindowSec * 1000000L}),
         |pp AS (SELECT p_id, COUNT(*) AS n_touches FROM pr GROUP BY p_id),
         |last AS (
         |  SELECT p_id, touch_type FROM (
         |    SELECT p_id, touch_type,
         |      ROW_NUMBER() OVER (PARTITION BY p_id
         |                         ORDER BY t_ts DESC, t_id DESC) AS rn
         |    FROM pr) x WHERE rn = 1),
         |lt AS (SELECT touch_type, COUNT(*) AS n_last_touch
         |       FROM last GROUP BY touch_type),
         |lin AS (
         |  SELECT pr.touch_type,
         |    CAST(SUM(1000000 // pp.n_touches) AS BIGINT) AS linear_ppm
         |  FROM pr JOIN pp USING (p_id) GROUP BY pr.touch_type),
         |direct AS (
         |  SELECT 'direct' AS touch_type, COUNT(*) AS n_last_touch,
         |    COUNT(*) * 1000000 AS linear_ppm
         |  FROM p WHERE p_id NOT IN (SELECT p_id FROM pr)),
         |merged AS (
         |  SELECT COALESCE(lt.touch_type, lin.touch_type) AS touch_type,
         |    COALESCE(lt.n_last_touch, 0) AS n_last_touch,
         |    COALESCE(lin.linear_ppm, 0) AS linear_ppm
         |  FROM lt FULL OUTER JOIN lin ON lt.touch_type = lin.touch_type)
         |SELECT touch_type, CAST(n_last_touch AS BIGINT) AS n_last_touch,
         |  CAST(linear_ppm AS BIGINT) AS linear_ppm
         |FROM (SELECT * FROM merged UNION ALL SELECT * FROM direct) u
         |ORDER BY touch_type""".stripMargin,

    // Replays Similarity.rrfFusion: the q21 dense arm at depth
    // $RrfKPerSystem, the q121 sparse arm (shared CTEs) with anchors
    // restricted to the probe set, full-outer fusion, integer RRF.
    "q126_rrf_fusion" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 8),
         |p AS (
         |  SELECT q.q_id, v.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
         |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
         |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
         |  FROM v CROSS JOIN q
         |  WHERE v.vec_id <> q.q_id),
         |dense AS (
         |  SELECT q_id, vec_id AS doc_id, CAST(rn AS BIGINT) AS dense_rank
         |  FROM (
         |    SELECT q_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |                         ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM p) d WHERE rn <= $RrfKPerSystem),
         |${relatedDocsCtes(RelatedDfCap)},
         |sparse AS (
         |  SELECT doc_a AS q_id, doc_b AS doc_id,
         |    CAST(rn AS BIGINT) AS sparse_rank
         |  FROM rel_ranked WHERE rn <= $RrfKPerSystem AND doc_a < 8),
         |f AS (
         |  SELECT COALESCE(dense.q_id, sparse.q_id) AS q_id,
         |    COALESCE(dense.doc_id, sparse.doc_id) AS doc_id,
         |    dense.dense_rank, sparse.sparse_rank,
         |    COALESCE(1000000 // ($RrfKConst + dense.dense_rank), 0)
         |      + COALESCE(1000000 // ($RrfKConst + sparse.sparse_rank), 0)
         |      AS rrf_ppm
         |  FROM dense FULL OUTER JOIN sparse
         |    ON dense.q_id = sparse.q_id AND dense.doc_id = sparse.doc_id),
         |r AS (
         |  SELECT q_id, doc_id, dense_rank, sparse_rank, rrf_ppm,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY rrf_ppm DESC, doc_id ASC) AS rn
         |  FROM f)
         |SELECT q_id, CAST(rn AS BIGINT) AS rn, doc_id, dense_rank,
         |  sparse_rank, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
         |FROM r WHERE rn <= $RrfKOut ORDER BY q_id, rn""".stripMargin,

    // Replays Cdc.snapshotDiff: the derived md5-bucket snapshot, the
    // full-outer PK join, null-safe per-column comparison, the melted
    // report (SQL generated from the same column list as the operator).
    "q127_snapshot_diff" -> snapshotDiffOracleSql,

    // Replays TextOps.weightedLengthQuantiles: the (source, len)
    // histogram, value-domain cumulative window, exact integer picks.
    "q128_weighted_quantiles" ->
      """WITH hist AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
        |      AS len,
        |    COUNT(*) AS n_docs_len
        |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1, 2),
        |h2 AS (SELECT source, len, n_docs_len,
        |         len * n_docs_len AS toks_len FROM hist),
        |c AS (
        |  SELECT source, len,
        |    SUM(n_docs_len) OVER (PARTITION BY source ORDER BY len ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_docs,
        |    SUM(toks_len) OVER (PARTITION BY source ORDER BY len ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
        |  FROM h2),
        |t AS (SELECT source, CAST(SUM(n_docs_len) AS BIGINT) AS n_docs,
        |        CAST(SUM(toks_len) AS BIGINT) AS total_tokens
        |      FROM h2 GROUP BY source)
        |SELECT c.source, t.n_docs, t.total_tokens,
        |  MIN(CASE WHEN c.cum_docs >= (t.n_docs + 1) // 2
        |      THEN c.len END) AS doc_median_len,
        |  MIN(CASE WHEN c.cum_toks >= (t.total_tokens + 1) // 2
        |      THEN c.len END) AS tok_median_len,
        |  MIN(CASE WHEN c.cum_toks >= (9 * t.total_tokens + 9) // 10
        |      THEN c.len END) AS tok_p90_len
        |FROM c JOIN t USING (source)
        |GROUP BY c.source, t.n_docs, t.total_tokens
        |ORDER BY c.source""".stripMargin,

    // q129's oracle is the deliberately-unmirrored brute force: pixels
    // and clones recomputed arithmetically (the q25 pattern), dHash
    // packed by the same luma/bit rules, then an ALL-PAIRS within-dims
    // scan — so the hash match proves the Spark side's band join
    // lossless for the threshold (the q38 pattern).
    "q129_image_neardups" ->
      s"""WITH ids AS (
         |  SELECT doc_id AS img_id, doc_id AS base, 0 AS pert FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, doc_id, 1 FROM documents
         |  WHERE doc_id % 50 = 0),
         |g AS (
         |  SELECT img_id, CAST(4 + base % 5 AS BIGINT) AS w,
         |    CAST(3 + base % 4 AS BIGINT) AS h,
         |    flatten(list_transform(generate_series(0, 3 + base % 4 - 1), y ->
         |      list_transform(generate_series(0, 4 + base % 5 - 1), x ->
         |        299 * (CASE WHEN pert = 1 AND x = 0 AND y = 0
         |               THEN (base * 31 + 40) % 256
         |               ELSE (base * 31 + x * 7 + y * 13 + x * y * 29) % 256 END)
         |        + 587 * ((base * 17 + x * 3 + y * 5 + x * y * 23) % 256)
         |        + 114 * ((base * 11 + x + y + x * y * 19) % 256)))) AS lum
         |  FROM ids),
         |hsh AS (
         |  SELECT img_id, w, h,
         |    CAST(list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
         |      list_transform(generate_series(0, w - 2), x ->
         |        CASE WHEN lum[y * w + x + 2] > lum[y * w + x + 1]
         |        THEN (1::BIGINT << (y * (w - 1) + x)) ELSE 0::BIGINT END))))
         |      AS BIGINT) AS dhash
         |  FROM g),
         |pr AS (
         |  SELECT a.w, a.h,
         |    bit_count(xor(a.dhash, b.dhash)) AS hamming,
         |    CASE WHEN b.img_id - a.img_id = 1000000 THEN 1 ELSE 0 END
         |      AS planted
         |  FROM hsh a JOIN hsh b
         |    ON a.w = b.w AND a.h = b.h AND a.img_id < b.img_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= $ImgHammingMax),
         |rep AS (
         |  SELECT w, h, COUNT(*) AS n_pairs, SUM(hamming) AS sum_hamming,
         |    SUM(planted) AS n_planted
         |  FROM pr GROUP BY w, h),
         |n AS (SELECT w, h, COUNT(*) AS n_images FROM hsh GROUP BY w, h)
         |SELECT n.w, n.h, CAST(n.n_images AS BIGINT) AS n_images,
         |  CAST(COALESCE(rep.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(rep.sum_hamming, 0) AS BIGINT) AS sum_hamming,
         |  CAST(COALESCE(rep.n_planted, 0) AS BIGINT) AS n_planted
         |FROM n LEFT JOIN rep ON n.w = rep.w AND n.h = rep.h
         |ORDER BY n.w, n.h""".stripMargin,

    // q130's oracle: the textured PCM recomputed arithmetically
    // (cube-mix v = (t³ div 4096) mod 2¹⁶, t = base·131 + i·37 + 11;
    // the clone shifts sample 0 by +500 mod 2¹⁶), the 48 sign bits
    // (v ≥ 32768 ⟺ s ≥ 0) packed by the same rules, then the
    // brute-force all-pairs scan.
    "q130_audio_neardups" ->
      s"""WITH ids AS (
         |  SELECT doc_id AS clip_id, doc_id AS base, 0 AS pert FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, doc_id, 1 FROM documents
         |  WHERE doc_id % 50 = 0),
         |fp AS (
         |  SELECT clip_id,
         |    CAST(list_sum(list_transform(generate_series(0, 47), i ->
         |      CASE WHEN
         |        (CASE WHEN pert = 1 AND i = 0
         |         THEN (((base * 131 + 11) * (base * 131 + 11) * (base * 131 + 11)
         |               // 4096) % 65536 + 500) % 65536
         |         ELSE ((base * 131 + i * 37 + 11) * (base * 131 + i * 37 + 11)
         |               * (base * 131 + i * 37 + 11) // 4096) % 65536 END)
         |        >= 32768
         |      THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS f
         |  FROM ids),
         |pr AS (
         |  SELECT bit_count(xor(a.f, b.f)) AS hamming,
         |    CASE WHEN b.clip_id - a.clip_id = 1000000 THEN 1 ELSE 0 END
         |      AS planted
         |  FROM fp a JOIN fp b ON a.clip_id < b.clip_id
         |  WHERE bit_count(xor(a.f, b.f)) <= $ImgHammingMax)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fp) AS n_clips,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(SUM(hamming), 0) AS BIGINT) AS sum_hamming,
         |  CAST(COALESCE(SUM(planted), 0) AS BIGINT) AS n_planted
         |FROM pr""".stripMargin,

    // Replays Sampling.learningCurveTiers: the md5-bucket smallest-tier
    // label, per-(source, tier) rollup, tier-ordered cumulative.
    "q131_learning_curve" ->
      s"""WITH d AS (
         |  SELECT source,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
         |      AS BIGINT) % 100 AS bkt,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |      AS n_toks
         |  FROM documents WHERE doc_id IS NOT NULL),
         |t AS (
         |  SELECT source,
         |    CASE ${CurveTiers.map(t => s"WHEN bkt < $t THEN ${t}")
                .mkString(" ")} END AS tier,
         |    n_toks
         |  FROM d),
         |p AS (
         |  SELECT source, CAST(tier AS BIGINT) AS tier,
         |    COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |  FROM t GROUP BY source, tier)
         |SELECT source, tier, n_docs, n_tokens,
         |  CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY tier
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_docs,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY tier
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |FROM p ORDER BY source, tier""".stripMargin,

    // Replays Events.conversionDelay: first-view/first-purchase mins,
    // the minute-granular histogram, ceil-rank picks over its
    // cumulative, integer ppm conversion.
    "q132_conversion_delay" ->
      """WITH fv AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |dl AS (
        |  SELECT e.user_id,
        |    (MIN(epoch_us(e.ts)) - fv.v_ts) // 60000000 AS delay_min
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.v_ts
        |  GROUP BY e.user_id, fv.v_ts),
        |h AS (SELECT delay_min, COUNT(*) AS n FROM dl GROUP BY delay_min),
        |c AS (
        |  SELECT delay_min,
        |    SUM(n) OVER (ORDER BY delay_min
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_converted FROM h),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers FROM fv)
        |SELECT v.n_viewers, t.n_converted,
        |  t.n_converted * 1000000 // v.n_viewers AS conv_ppm,
        |  MIN(CASE WHEN c.cum >= (t.n_converted + 1) // 2
        |      THEN c.delay_min END) AS median_delay_min,
        |  MIN(CASE WHEN c.cum >= (9 * t.n_converted + 9) // 10
        |      THEN c.delay_min END) AS p90_delay_min
        |FROM c, t, v
        |GROUP BY v.n_viewers, t.n_converted""".stripMargin,

    // Replays SkewJoin.skewReport: per key a group-size histogram, its
    // cumulative, ceil-rank picks, hottest-key share (SQL generated
    // from the same key list the operator receives).
    "q133_skew_report" ->
      skewOracleSql(Seq("l_orderkey", "l_partkey", "l_suppkey")),

    // Replays TextOps.vocabMaintenance: the md5 old/new split, q100's
    // vocab cut on the old side, OOV counts on the delta, the flagged
    // promotion leaderboard.
    "q134_vocab_maintenance" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
         |      AS BIGINT) % 100 AS bkt
         |  FROM documents WHERE doc_id IS NOT NULL),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, COUNT(*) AS n FROM (
         |      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |        AS token
         |      FROM d WHERE bkt < 90) ot GROUP BY token) tc
         |  ORDER BY n DESC, token ASC LIMIT $VocabMaintSize),
         |oov AS (
         |  SELECT token, COUNT(*) AS n_delta FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
         |      AS token
         |    FROM d WHERE bkt >= 90) dt
         |  WHERE token NOT IN (SELECT token FROM vocab)
         |  GROUP BY token),
         |r AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY n_delta DESC, token ASC)
         |    AS rank, token, n_delta
         |  FROM oov)
         |SELECT CAST(rank AS BIGINT) AS rank, token, n_delta,
         |  CAST(CASE WHEN n_delta >= $VocabPromoteMin THEN 1 ELSE 0 END
         |    AS BIGINT) AS promote
         |FROM r WHERE rank <= $VocabMaintTopK ORDER BY rank""".stripMargin,

    // Replays Quality.modalityAudit: each check an independent count
    // or NOT-IN over the id sets, melted to the long format.
    "q135_modality_audit" ->
      """SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
        |  UNION ALL SELECT 'n_vecs', COUNT(*) FROM embeddings
        |  UNION ALL SELECT 'docs_without_vec', COUNT(*) FROM
        |    (SELECT DISTINCT doc_id FROM documents) dd
        |    WHERE doc_id NOT IN (SELECT vec_id FROM embeddings)
        |  UNION ALL SELECT 'vecs_without_doc', COUNT(*) FROM
        |    (SELECT DISTINCT vec_id FROM embeddings) vv
        |    WHERE vec_id NOT IN (SELECT doc_id FROM documents)
        |  UNION ALL SELECT 'dup_vec_ids',
        |    COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0) FROM
        |    (SELECT vec_id, COUNT(*) AS n FROM embeddings GROUP BY vec_id) g
        |  UNION ALL SELECT 'dim_violations',
        |    SUM(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END)
        |  FROM embeddings
        |  UNION ALL SELECT 'zero_vectors',
        |    SUM(CASE WHEN list_sum(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1 ELSE 0 END)
        |  FROM embeddings
        |  UNION ALL SELECT 'null_text_docs',
        |    SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) FROM documents
        |) u ORDER BY metric""".stripMargin,

    // Replays Events.abReadout: md5 arm assignment on the distinct user
    // set, purchase-converter flags, integer ppm.
    "q136_ab_readout" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |a AS (
        |  SELECT user_id,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 100 < 50 THEN 'a' ELSE 'b' END AS arm
        |  FROM u),
        |c AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT a.arm, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_converted,
        |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // COUNT(*) AS conv_ppm
        |FROM a LEFT JOIN c ON a.user_id = c.user_id
        |GROUP BY a.arm ORDER BY a.arm""".stripMargin,

    // Replays Similarity.normOutliers: index-order norm fold, centi
    // quantization, value-domain histogram, ceil-rank median, the
    // [median/2, 2*median] band counts.
    "q137_norm_outliers" ->
      """WITH n AS (
        |  SELECT label,
        |    CAST(floor(sqrt(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> x * x))) * 100.0) AS BIGINT) AS norm_cu
        |  FROM embeddings),
        |h AS (SELECT label, norm_cu, COUNT(*) AS nv
        |      FROM n GROUP BY label, norm_cu),
        |c AS (
        |  SELECT label, norm_cu, nv,
        |    SUM(nv) OVER (PARTITION BY label ORDER BY norm_cu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |t AS (SELECT label, CAST(SUM(nv) AS BIGINT) AS n_vecs
        |      FROM h GROUP BY label),
        |med AS (
        |  SELECT c.label, MIN(c.norm_cu) AS median_norm_cu
        |  FROM c JOIN t ON c.label = t.label
        |  WHERE c.cum >= (t.n_vecs + 1) // 2
        |  GROUP BY c.label)
        |SELECT h.label, t.n_vecs, med.median_norm_cu,
        |  CAST(SUM(CASE WHEN h.norm_cu * 2 < med.median_norm_cu
        |    THEN h.nv ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN h.norm_cu > med.median_norm_cu * 2
        |    THEN h.nv ELSE 0 END) AS BIGINT) AS n_high
        |FROM h JOIN med ON h.label = med.label JOIN t ON h.label = t.label
        |GROUP BY h.label, t.n_vecs, med.median_norm_cu
        |ORDER BY h.label""".stripMargin,

    // Replays Dedup.dedupSavings: the q40 recursive closure (shared
    // CTEs) with the q114 identity fallback, rolled up per source.
    "q138_dedup_savings" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |      AS n_toks
         |  FROM documents WHERE doc_id IS NOT NULL),
         |canonized AS (
         |  SELECT t.source, t.n_toks,
         |    CASE WHEN COALESCE(c.canonical_id, t.doc_id) = t.doc_id
         |      THEN 1 ELSE 0 END AS kept
         |  FROM tok t LEFT JOIN comp c ON t.doc_id = c.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(kept) AS BIGINT) AS n_docs_kept,
         |  CAST(SUM(kept * n_toks) AS BIGINT) AS n_tokens_kept,
         |  (CAST(SUM(n_toks) AS BIGINT) - CAST(SUM(kept * n_toks) AS BIGINT))
         |    * 1000000 // CAST(SUM(n_toks) AS BIGINT) AS savings_ppm
         |FROM canonized GROUP BY source ORDER BY source""".stripMargin,

    // Replays TextOps.filterChain: the q16 quality CTE, the q46
    // repetition chain (per doc, LEFT-joined — <3-token docs have no
    // grams), the q108 gopher rules, conjoined and rolled up.
    "q139_filter_chain" ->
      s"""WITH tq AS (
         |  SELECT doc_id, source,
         |    (CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |          WHEN n_chars > 300 THEN 25 ELSE 10 END
         |     + CASE WHEN len(toks) >= 20 THEN 30 ELSE 15 END
         |     + CASE WHEN hits * 50 >= len(toks) AND hits * 5 <= len(toks)
         |       THEN 30 ELSE 10 END) AS quality
         |  FROM (
         |    SELECT doc_id, source, n_chars, toks,
         |      len(list_filter(toks,
         |        t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |    FROM (
         |      SELECT doc_id, source, n_chars,
         |        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |      FROM documents WHERE doc_id IS NOT NULL) d0) d1),
         |t46 AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |  FROM documents WHERE doc_id IS NOT NULL),
         |tg AS (
         |  SELECT doc_id, u.tg.k AS k, u.tg.g AS g
         |  FROM t46,
         |  UNNEST(list_concat(
         |    list_transform(generate_series(1, len(toks) - 1), i ->
         |      {'k': 2, 'g': toks[i] || ' ' || toks[i + 1]}),
         |    list_transform(generate_series(1, len(toks) - 2), i ->
         |      {'k': 3, 'g': toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]})))
         |    AS u(tg)
         |  WHERE len(toks) >= 3),
         |cg AS (
         |  SELECT doc_id, k, g, COUNT(*) AS n FROM tg GROUP BY 1, 2, 3),
         |pk AS (
         |  SELECT doc_id, k,
         |    CAST(SUM(n) AS BIGINT) AS total,
         |    CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup,
         |    MAX(n) AS top
         |  FROM cg GROUP BY 1, 2),
         |rep AS (
         |  SELECT doc_id,
         |    CASE WHEN MAX(CASE WHEN k = 3 THEN dup END) * 5
         |           >= MAX(CASE WHEN k = 3 THEN total END)
         |         OR (MAX(CASE WHEN k = 2 THEN top END) >= 2
         |             AND MAX(CASE WHEN k = 2 THEN top END) * 10
         |               >= MAX(CASE WHEN k = 2 THEN total END))
         |    THEN 1 ELSE 0 END AS repetitive
         |  FROM pk GROUP BY doc_id),
         |ge AS (
         |  SELECT doc_id, len(toks) AS n_toks,
         |    COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
         |      AS tok_chars,
         |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
         |      AS n_alpha,
         |    len(list_filter(['the','a','of','and','is','to','in'],
         |      s -> list_contains(toks, s))) AS n_stop
         |  FROM t46),
         |gp AS (
         |  SELECT doc_id,
         |    (CASE WHEN n_toks BETWEEN 25 AND 100000 THEN 1 ELSE 0 END)
         |    * (CASE WHEN tok_chars >= n_toks * 3 AND tok_chars <= n_toks * 10
         |       THEN 1 ELSE 0 END)
         |    * (CASE WHEN n_alpha * 10 >= n_toks * 8 THEN 1 ELSE 0 END)
         |    * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END) AS gpass
         |  FROM ge),
         |j AS (
         |  SELECT tq.source, tq.quality,
         |    COALESCE(rep.repetitive, 0) AS repetitive, gp.gpass
         |  FROM tq
         |  LEFT JOIN rep ON tq.doc_id = rep.doc_id
         |  JOIN gp ON tq.doc_id = gp.doc_id)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN quality >= $FilterChainQualityMin THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_quality_ok,
         |  CAST(SUM(CASE WHEN repetitive = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rep_clean,
         |  CAST(SUM(gpass) AS BIGINT) AS n_gopher_ok,
         |  CAST(SUM(CASE WHEN quality >= $FilterChainQualityMin
         |    AND repetitive = 0 AND gpass = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_keep,
         |  CAST(SUM(CASE WHEN quality >= $FilterChainQualityMin
         |    AND repetitive = 0 AND gpass = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // COUNT(*) AS keep_ppm
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // Replays Dedup.nearDupEval: the shared q19 pair CTEs vs the
    // planted-truth set, three scalar counts, integer recall.
    "q140_neardup_eval" ->
      s"""WITH $nearDupPairCtes,
         |truth AS (
         |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
         |  FROM documents WHERE doc_id % 100 = 0),
         |hit AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs p
         |  JOIN truth t ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_detected,
         |  (SELECT n FROM hit) AS n_truth_detected,
         |  (SELECT n FROM hit) * 1000000
         |    // (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS recall_ppm,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) - (SELECT n FROM hit)
         |    AS n_organic""".stripMargin,
    "q141_token_drift" ->
      """WITH c AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT source,
        |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |    FROM documents WHERE doc_id IS NOT NULL) t
        |  GROUP BY source, token),
        |s AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_src,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct
        |  FROM c GROUP BY source),
        |v AS (SELECT token, CAST(SUM(n) AS BIGINT) AS n_tok FROM c GROUP BY token),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
        |j AS (
        |  SELECT s.source, s.n_src, s.n_distinct, v.n_tok, t.n_total,
        |    COALESCE(c.n, 0) AS n
        |  FROM v CROSS JOIN s CROSS JOIN t
        |  LEFT JOIN c ON c.source = s.source AND c.token = v.token)
        |SELECT source, MAX(n_src) AS n_tokens, MAX(n_distinct) AS n_distinct,
        |  CAST(SUM(abs(n::HUGEINT * n_total - n_tok::HUGEINT * n_src)) * 1000000
        |    // (2::HUGEINT * MAX(n_src) * MAX(n_total)) AS BIGINT) AS tv_ppm
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q142_assoc_rules" ->
      s"""WITH b AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |n AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_baskets FROM b),
         |ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_item FROM b GROUP BY p),
         |u AS (
         |  SELECT x.p AS pa, y.p AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
         |  FROM b x JOIN b y ON x.k = y.k AND x.p < y.p
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $AssocMinPair),
         |d AS (
         |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM u
         |  UNION ALL SELECT pb, pa, n_ab FROM u),
         |r AS (
         |  SELECT d.antecedent, d.consequent, d.n_ab,
         |    ia.n_item AS n_ante, ib.n_item AS n_cons, n.n_baskets
         |  FROM d JOIN ic ia ON ia.p = d.antecedent
         |  JOIN ic ib ON ib.p = d.consequent CROSS JOIN n)
         |SELECT antecedent, consequent, n_ab, n_ante, n_cons,
         |  n_ab * 1000000 // n_baskets AS support_ppm,
         |  n_ab * 1000000 // n_ante AS confidence_ppm,
         |  CAST(n_ab::HUGEINT * n_baskets * 1000000
         |    // (n_ante::HUGEINT * n_cons) AS BIGINT) AS lift_ppm
         |FROM r
         |ORDER BY lift_ppm DESC, antecedent ASC, consequent ASC
         |LIMIT $AssocTopK""".stripMargin,
    "q143_deletion_audit" -> {
      def gone(k: String) =
        s"CAST('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 6) AS BIGINT) % 100 < $ForgetPct"
      s"""WITH fo AS (
         |  SELECT o_orderkey FROM orders WHERE ${gone("o_custkey")}),
         |raw AS (
         |  SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(CASE WHEN ${gone("c_custkey")} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_delete
         |  FROM customer
         |  UNION ALL
         |  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN ${gone("user_id")} THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM events
         |  UNION ALL
         |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN fo.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT)
         |  FROM lineitem LEFT JOIN fo ON l_orderkey = fo.o_orderkey
         |  UNION ALL
         |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN ${gone("o_custkey")} THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM orders)
         |SELECT table_name, n_rows, n_delete,
         |  n_delete * 1000000 // n_rows AS delete_ppm
         |FROM raw ORDER BY table_name""".stripMargin
    },
    "q144_mmr_rerank" -> mmrOracleSql(MmrProbes, MmrCand, MmrK),
    "q145_trimmed_stats" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT) AS cents,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2),
         |c AS (
         |  SELECT *, SUM(cnt) OVER (PARTITION BY event_type
         |    ORDER BY cents ASC ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h),
         |t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
         |      FROM h GROUP BY 1),
         |j AS (
         |  SELECT c.*, t.n, t.n * $TrimPct // 100 AS cut,
         |    greatest(0, least(c.cum, t.n - t.n * $TrimPct // 100)
         |      - greatest(c.cum - c.cnt + 1, t.n * $TrimPct // 100 + 1)
         |      + 1) AS kept
         |  FROM c JOIN t USING (event_type))
         |SELECT event_type, MAX(n) AS n_values, MAX(cut) AS n_cut,
         |  MIN(CASE WHEN cum >= cut + 1 THEN cents END) AS lo_cents,
         |  MIN(CASE WHEN cum >= n - cut THEN cents END) AS hi_cents,
         |  CAST(SUM(cents * cnt)::HUGEINT * 10000 // MAX(n) AS BIGINT)
         |    AS mean_micro,
         |  CAST(SUM(cents * kept)::HUGEINT * 10000
         |    // (MAX(n) - 2 * MAX(cut)) AS BIGINT) AS trimmed_mean_micro,
         |  CAST((SUM(cents * kept) + MAX(cut)
         |      * (MIN(CASE WHEN cum >= cut + 1 THEN cents END)
         |         + MIN(CASE WHEN cum >= n - cut THEN cents END)))::HUGEINT
         |    * 10000 // MAX(n) AS BIGINT) AS winsor_mean_micro
         |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q146_rfm_segments" ->
      """WITH pc AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS last_date,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12, 2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey),
        |met AS (
        |  SELECT pc.*, CAST(date_diff('day', last_date,
        |    (SELECT MAX(last_date) FROM pc)) AS BIGINT) AS rec_days
        |  FROM pc),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM met),
        |rq AS (
        |  SELECT rec_days, CAST((5 * cum + n - 1) // n AS BIGINT) AS r_q FROM (
        |    SELECT rec_days, SUM(cnt) OVER (ORDER BY rec_days ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM (SELECT rec_days, CAST(COUNT(*) AS BIGINT) AS cnt
        |          FROM met GROUP BY 1) h) c CROSS JOIN n),
        |fq AS (
        |  SELECT freq, CAST((5 * cum + n - 1) // n AS BIGINT) AS f_q FROM (
        |    SELECT freq, SUM(cnt) OVER (ORDER BY freq ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM (SELECT freq, CAST(COUNT(*) AS BIGINT) AS cnt
        |          FROM met GROUP BY 1) h) c CROSS JOIN n),
        |mq AS (
        |  SELECT cents, CAST((5 * cum + n - 1) // n AS BIGINT) AS m_q FROM (
        |    SELECT cents, SUM(cnt) OVER (ORDER BY cents ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |          FROM met GROUP BY 1) h) c CROSS JOIN n)
        |SELECT 6 - r_q AS r_score, f_q AS f_score, m_q AS m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |FROM met JOIN rq USING (rec_days) JOIN fq USING (freq)
        |  JOIN mq USING (cents)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q147_quality_dup_overlap" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |q AS (
         |  SELECT doc_id,
         |    (CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |          WHEN n_chars > 300 THEN 25 ELSE 10 END
         |     + CASE WHEN len(toks) >= 20 THEN 30 ELSE 15 END
         |     + CASE WHEN hits * 50 >= len(toks) AND hits * 5 <= len(toks)
         |       THEN 30 ELSE 10 END)::BIGINT AS quality
         |  FROM (
         |    SELECT doc_id, n_chars, toks,
         |      len(list_filter(toks,
         |        t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |    FROM (
         |      SELECT doc_id, n_chars,
         |        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |      FROM documents WHERE doc_id IS NOT NULL) d0) d1),
         |m AS (SELECT DISTINCT doc_id FROM comp)
         |SELECT quality, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_members,
         |  CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT) AS dup_ppm
         |FROM q LEFT JOIN m USING (doc_id)
         |GROUP BY quality ORDER BY quality""".stripMargin,
    "q148_dim_stats" ->
      """WITH e AS (
        |  SELECT u.i - 1 AS dim, embedding[u.i]::DOUBLE AS x
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u),
        |c AS (
        |  SELECT CAST(dim AS BIGINT) AS dim, x,
        |    CAST(floor(x * 100) AS BIGINT) AS cu
        |  FROM e),
        |a AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS zero_cnt,
        |    MIN(cu) AS min_cu, MAX(cu) AS max_cu,
        |    CAST(SUM(cu + 1000) AS BIGINT) AS s1,
        |    SUM((cu + 1000)::HUGEINT * (cu + 1000)) AS s2
        |  FROM c GROUP BY dim)
        |SELECT dim, n_vecs, zero_cnt, min_cu, max_cu,
        |  CAST(s1::HUGEINT * 1000000 // n_vecs AS BIGINT) - 1000000000
        |    AS mean_cu_micro,
        |  CAST((n_vecs * s2 - s1::HUGEINT * s1) * 1000000
        |    // (n_vecs::HUGEINT * n_vecs) AS BIGINT) AS var_ccu_micro
        |FROM a ORDER BY dim""".stripMargin,
    "q149_k_anonymity" -> {
      def lvl(name: String, keys: String) =
        s"""SELECT '$name' AS level, CAST(COUNT(*) AS BIGINT) AS n_groups,
           |  CAST(SUM(CASE WHEN sz < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violations,
           |  CAST(SUM(CASE WHEN sz < $KAnonK THEN sz ELSE 0 END) AS BIGINT)
           |    AS rows_at_risk,
           |  CAST(SUM(CASE WHEN sz < $KAnonK THEN sz ELSE 0 END) AS BIGINT)
           |    * 1000000 // CAST(SUM(sz) AS BIGINT) AS risk_ppm
           |FROM (SELECT $keys, CAST(COUNT(*) AS BIGINT) AS sz
           |      FROM base GROUP BY $keys) g""".stripMargin
      s"""WITH base AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
         |    CAST(n_regionkey AS BIGINT) AS reg, c_mktsegment AS seg
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
         |SELECT * FROM (
         |  ${lvl("L0_nation_segment", "nat, seg")}
         |  UNION ALL
         |  ${lvl("L1_region_segment", "reg, seg")}
         |  UNION ALL
         |  ${lvl("L2_region", "reg")}) u
         |ORDER BY level""".stripMargin
    },
    "q150_table_stats" -> {
      // one SELECT per (table, column); the HLL scalar subquery replays
      // ops.Stats' register sketch (q110's proven bit-level arithmetic)
      def one(t: String, c: String) =
        s"""SELECT '$t' AS table_name, '$c' AS column_name,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $t) AS n_rows,
           |  (SELECT CAST(SUM(CASE WHEN CAST($c AS VARCHAR) IS NULL
           |     THEN 1 ELSE 0 END) AS BIGINT) FROM $t) AS n_nulls,
           |  (SELECT CAST(COUNT(DISTINCT CAST($c AS VARCHAR)) AS BIGINT)
           |     FROM $t) AS ndv_exact,
           |  ${hllNdvSql(t, c)} AS ndv_hll""".stripMargin
      val parts = Seq(
        ("documents", Seq("source", "lang")),
        ("events", Seq("user_id", "event_type")),
        ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
        ("orders", Seq("o_orderkey", "o_custkey"))).flatMap {
        case (t, cs) => cs.map(c => one(t, c))
      }.mkString("\n  UNION ALL\n")
      s"""SELECT table_name, column_name, n_rows, n_nulls, ndv_exact,
         |  ndv_hll, abs(ndv_hll - ndv_exact) * 1000000 // ndv_exact
         |    AS err_ppm
         |FROM (
         |  $parts) u
         |ORDER BY table_name, column_name""".stripMargin
    },
    "q151_ann_recall_ladder" -> annLadderOracleSql(QuantTopK),
    "q153_join_estimate" -> {
      def one(name: String, lt: String, lc: String, rt: String,
          rc: String) =
        s"""SELECT '$name' AS join_name,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $lt) AS n_left,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $rt) AS n_right,
           |  ${hllNdvSql(lt, lc)} AS ndv_left,
           |  ${hllNdvSql(rt, rc)} AS ndv_right,
           |  (SELECT CAST(COUNT(*) AS BIGINT)
           |   FROM $lt JOIN $rt ON $lc = $rc) AS actual_rows""".stripMargin
      val parts = Seq(
        one("customer_orders", "customer", "c_custkey", "orders",
          "o_custkey"),
        one("orders_lineitem", "orders", "o_orderkey", "lineitem",
          "l_orderkey"),
        one("part_lineitem", "part", "p_partkey", "lineitem",
          "l_partkey")).mkString("\n  UNION ALL\n")
      s"""SELECT join_name, n_left, n_right, ndv_left, ndv_right,
         |  CAST(n_left::HUGEINT * n_right
         |    // greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
         |  actual_rows,
         |  abs(CAST(n_left::HUGEINT * n_right
         |    // greatest(ndv_left, ndv_right) AS BIGINT) - actual_rows)
         |    * 1000000 // actual_rows AS err_ppm
         |FROM (
         |  $parts) u
         |ORDER BY join_name""".stripMargin
    },
    "q152_shard_rebalance" -> {
      val v = RingVnodes
      def ring(n: Int, alias: String) =
        s"""n$alias AS (
           |  SELECT i // $v AS shard,
           |    CAST('0x' || substr(md5('node:' || CAST(i // $v AS VARCHAR) ||
           |      ':' || CAST(i % $v AS VARCHAR)), 1, 12) AS BIGINT) AS npos
           |  FROM range(0, ${n * v}) t(i)),
           |c$alias AS (SELECT shard, npos, npos * 32 + shard AS code
           |            FROM n$alias),
           |a$alias AS (
           |  SELECT doc_id,
           |    COALESCE(MIN(CASE WHEN npos >= kpos THEN code END),
           |      MIN(code)) % 32 AS shard
           |  FROM keys CROSS JOIN c$alias GROUP BY doc_id, kpos)"""
          .stripMargin
      s"""WITH keys AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5('key:' || CAST(doc_id AS VARCHAR)),
         |      1, 12) AS BIGINT) AS kpos
         |  FROM documents WHERE doc_id IS NOT NULL),
         |${ring(RingShards, "o")},
         |${ring(RingShards + 1, "n")}
         |SELECT scheme, n_keys, n_moved,
         |  n_moved * 1000000 // n_keys AS moved_ppm
         |FROM (
         |  SELECT 'mod' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(CASE WHEN doc_id % $RingShards <>
         |      doc_id % ${RingShards + 1} THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_moved
         |  FROM keys
         |  UNION ALL
         |  SELECT 'ring', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN ao.shard <> an.shard THEN 1 ELSE 0 END)
         |      AS BIGINT)
         |  FROM ao JOIN an USING (doc_id)) u
         |ORDER BY scheme""".stripMargin
    },
    "q154_ab_bootstrap" ->
      s"""WITH conv AS (
         |  SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'purchase'
         |    AND CAST(value AS DECIMAL(12, 2)) >= 200),
         |u AS (
         |  SELECT u0.user_id,
         |    CASE WHEN CAST('0x' || substr(md5(CAST(u0.user_id AS VARCHAR)),
         |      1, 6) AS BIGINT) % 100 < 50 THEN 'a' ELSE 'b' END AS arm,
         |    CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted
         |  FROM (SELECT DISTINCT user_id FROM events) u0
         |  LEFT JOIN conv c ON u0.user_id = c.user_id),
         |g AS (
         |  SELECT u.user_id, u.arm, u.converted, t.b
         |  FROM u, range(0, $BootReps) t(b)),
         |wts AS (
         |  SELECT arm, b, converted,
         |    CASE WHEN bucket < 367879 THEN 0 WHEN bucket < 735759 THEN 1
         |      WHEN bucket < 919699 THEN 2 WHEN bucket < 981012 THEN 3
         |      WHEN bucket < 996340 THEN 4 WHEN bucket < 999406 THEN 5
         |      WHEN bucket < 999917 THEN 6 WHEN bucket < 999990 THEN 7
         |      WHEN bucket < 999999 THEN 8 ELSE 9 END AS w
         |  FROM (SELECT arm, b, converted,
         |      CAST('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
         |        || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000000
         |        AS bucket
         |    FROM g) x),
         |ar AS (
         |  SELECT arm, b, CAST(SUM(w * converted) AS BIGINT) * 1000000
         |    // NULLIF(CAST(SUM(w) AS BIGINT), 0) AS ppm
         |  FROM wts GROUP BY arm, b),
         |dr AS (
         |  SELECT 'diff' AS series, b,
         |    MAX(CASE WHEN arm = 'a' THEN ppm END)
         |      - MAX(CASE WHEN arm = 'b' THEN ppm END) AS ppm
         |  FROM ar GROUP BY b),
         |reps AS (
         |  SELECT arm AS series, b, ppm FROM ar
         |  UNION ALL SELECT series, b, ppm FROM dr),
         |fr AS (SELECT * FROM reps WHERE ppm IS NOT NULL),
         |cnt AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS count_rn
         |        FROM fr GROUP BY series),
         |rk AS (
         |  SELECT f.series, f.ppm, c.count_rn,
         |    ROW_NUMBER() OVER (PARTITION BY f.series
         |      ORDER BY f.ppm ASC, f.b ASC) AS rn
         |  FROM fr f JOIN cnt c USING (series)),
         |ci AS (
         |  SELECT series, MAX(count_rn) AS n_reps,
         |    MIN(CASE WHEN rn >= (count_rn * 25 + 999) // 1000
         |      THEN ppm END) AS boot_lo_ppm,
         |    MIN(CASE WHEN rn >= (count_rn * 975 + 999) // 1000
         |      THEN ppm END) AS boot_hi_ppm
         |  FROM rk GROUP BY series),
         |pa AS (
         |  SELECT arm AS series, CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(converted) AS BIGINT) * 1000000 // COUNT(*)
         |      AS point_ppm
         |  FROM u GROUP BY arm),
         |pd AS (
         |  SELECT 'diff' AS series, CAST(SUM(n_users) AS BIGINT) AS n_users,
         |    SUM(CASE WHEN series = 'a' THEN point_ppm END)
         |      - SUM(CASE WHEN series = 'b' THEN point_ppm END) AS point_ppm
         |  FROM pa),
         |pts AS (SELECT series, n_users, point_ppm FROM pa
         |        UNION ALL SELECT series, n_users, point_ppm FROM pd)
         |SELECT p.series, p.n_users, CAST(p.point_ppm AS BIGINT)
         |    AS point_ppm, ci.n_reps,
         |  CAST(ci.boot_lo_ppm AS BIGINT) AS boot_lo_ppm,
         |  CAST(ci.boot_hi_ppm AS BIGINT) AS boot_hi_ppm
         |FROM pts p JOIN ci USING (series) ORDER BY p.series""".stripMargin,
    "q155_retrieval_eval" ->
      s"""WITH v AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, e AS qe
         |      FROM v WHERE vec_id < 8),
         |p AS (
         |  SELECT q.q_id, q.q_label, v.vec_id, v.label AS d_label,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
         |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
         |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
         |  FROM v CROSS JOIN q
         |  WHERE v.vec_id <> q.q_id),
         |rk AS (
         |  SELECT q_id, q_label, d_label,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM p),
         |pp AS (
         |  SELECT q_id, q_label,
         |    CAST(SUM(CASE WHEN d_label = q_label THEN 1 ELSE 0 END)
         |      AS BIGINT) AS hits,
         |    MIN(CASE WHEN d_label = q_label THEN rank END) AS first_rank
         |  FROM rk WHERE rank <= $RetrievalEvalK
         |  GROUP BY q_id, q_label),
         |lc AS (SELECT label AS q_label, CAST(COUNT(*) AS BIGINT) AS n_label
         |       FROM v GROUP BY label),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM v),
         |agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         |    CAST(SUM(hits) AS BIGINT) AS sum_hits,
         |    CAST(SUM(COALESCE(1000000 // first_rank, 0)) AS BIGINT)
         |      AS sum_rr,
         |    CAST(SUM((lc.n_label - 1) * 1000000 // (nt.n_total - 1))
         |      AS BIGINT) AS sum_base
         |  FROM pp JOIN lc USING (q_label) CROSS JOIN nt)
         |SELECT n_probes, CAST($RetrievalEvalK AS BIGINT) AS k,
         |  sum_hits * 1000000 // (n_probes * $RetrievalEvalK) AS p_at_k_ppm,
         |  sum_rr // n_probes AS mrr_ppm,
         |  sum_base // n_probes AS base_rate_ppm,
         |  (sum_hits * 1000000 // (n_probes * $RetrievalEvalK)) * 1000
         |    // (sum_base // n_probes) AS lift_x1000
         |FROM agg""".stripMargin,
    "q156_completeness_gate" ->
      s"""WITH d AS (
         |  SELECT event_type,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |wq AS (
         |  SELECT event_type, day, n,
         |    list_sort(COALESCE(list(n) OVER (PARTITION BY event_type
         |      ORDER BY day RANGE BETWEEN $GateWindowDays PRECEDING
         |      AND 1 PRECEDING), [])) AS prior
         |  FROM d),
         |e AS (
         |  SELECT event_type, day, n, CAST(len(prior) AS BIGINT) AS m,
         |    CASE WHEN len(prior) >= $GateMinPrior
         |      THEN prior[CAST((len(prior) + 1) // 2 AS INT)] END
         |      AS trailing_med
         |  FROM wq)
         |SELECT event_type, day, n, m, trailing_med,
         |  CASE WHEN trailing_med IS NOT NULL
         |    THEN CAST(n * 10 >= trailing_med * 8 AS BIGINT) END
         |    AS is_complete
         |FROM e ORDER BY event_type, day""".stripMargin,
    "q157_order_aging" ->
      """WITH snap AS (SELECT MAX(o_orderdate) AS snap FROM orders),
        |open_o AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', o_orderdate, snap.snap) AS BIGINT)
        |      AS age_days,
        |    CAST(o_totalprice AS DECIMAL(12, 2)) AS price
        |  FROM orders CROSS JOIN snap
        |  WHERE o_orderstatus = 'O'),
        |b AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN age_days <= 30 THEN 'a_0_30'
        |         WHEN age_days <= 90 THEN 'b_31_90'
        |         WHEN age_days <= 365 THEN 'c_91_365'
        |         ELSE 'd_365_plus' END AS bucket,
        |    price
        |  FROM open_o),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_open FROM b)
        |SELECT o_orderpriority, bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price) * 100 AS BIGINT) AS value_cents,
        |  CAST(COUNT(*) AS BIGINT) * 1000000 // tot.n_open AS share_ppm
        |FROM b CROSS JOIN tot
        |GROUP BY o_orderpriority, bucket, tot.n_open
        |ORDER BY o_orderpriority, bucket""".stripMargin,
    "q158_revenue_bridge" ->
      s"""WITH base AS (
         |  SELECT p.p_brand, year(o.o_orderdate) AS yr,
         |    CAST(l.l_quantity AS DECIMAL(12, 2)) AS qty,
         |    CAST(l.l_extendedprice AS DECIMAL(12, 2))
         |      * (1 - CAST(l.l_discount AS DECIMAL(12, 2))) AS rev
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE year(o.o_orderdate) IN ($BridgeY1, $BridgeY2)),
         |per AS (
         |  SELECT p_brand, yr,
         |    CAST(SUM(qty) * 100 AS BIGINT) AS q_c,
         |    CAST(SUM(rev) * 10000 AS BIGINT) AS r4
         |  FROM base GROUP BY p_brand, yr),
         |pv AS (
         |  SELECT p_brand,
         |    COALESCE(SUM(CASE WHEN yr = $BridgeY1 THEN q_c END), 0) AS q1,
         |    COALESCE(SUM(CASE WHEN yr = $BridgeY1 THEN r4 END), 0) AS r1,
         |    COALESCE(SUM(CASE WHEN yr = $BridgeY2 THEN q_c END), 0) AS q2,
         |    COALESCE(SUM(CASE WHEN yr = $BridgeY2 THEN r4 END), 0) AS r2
         |  FROM per GROUP BY p_brand),
         |eff AS (
         |  SELECT p_brand, CAST(q1 AS BIGINT) AS q1, CAST(r1 AS BIGINT) AS r1,
         |    CAST(q2 AS BIGINT) AS q2, CAST(r2 AS BIGINT) AS r2,
         |    CAST(r2 - r1 AS BIGINT) AS delta_r4,
         |    CASE WHEN q1 = 0 OR q2 = 0 THEN CAST(r2 - r1 AS BIGINT)
         |      WHEN q2 >= q1 THEN
         |        CAST((q2 - q1)::HUGEINT * r1 // q1 AS BIGINT)
         |      ELSE -CAST((q1 - q2)::HUGEINT * r1 // q1 AS BIGINT)
         |      END AS volume_eff_r4,
         |    CASE WHEN q1 = 0 OR q2 = 0 THEN 0
         |      ELSE CAST(q1::HUGEINT * r2 // q2 AS BIGINT)
         |        - CAST(r1 AS BIGINT)
         |      END AS price_eff_r4
         |  FROM pv)
         |SELECT p_brand, r1, r2, delta_r4, volume_eff_r4, price_eff_r4,
         |  delta_r4 - volume_eff_r4 - price_eff_r4 AS mix_residual_r4
         |FROM eff ORDER BY p_brand""".stripMargin,
    "q159_equidepth_histograms" -> {
      val arms = Stats.HistogramColumns.map { case (t, c) =>
        equidepthArmSql(t, c, HistBuckets,
          "SELECT table_name, column_name, bucket, lo, hi, n_rows FROM rg")
      }.mkString("\n  UNION ALL\n")
      s"""SELECT * FROM (
         |  $arms) u
         |ORDER BY table_name, column_name, bucket""".stripMargin
    },
    "q160_selectivity_audit" -> {
      val arms = Stats.AuditPredicates.map { case (name, t, c, plo, phi) =>
        val pl = plo.getOrElse(Long.MinValue / 4)
        val ph = phi.getOrElse(Long.MaxValue / 4)
        val body =
          s"""SELECT '$name' AS predicate,
             |  (SELECT CAST(SUM(CASE WHEN hi > lo THEN
             |      n_rows::HUGEINT
             |        * greatest(0, least(hi, $ph) - greatest(lo, $pl - 1))
             |        // (hi - lo)
             |      ELSE 0 END) AS BIGINT) FROM rg) AS est_rows,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $t
             |   WHERE CAST(CAST($c AS DECIMAL(12, 2)) * 100 AS BIGINT)
             |     BETWEEN $pl AND $ph) AS actual_rows""".stripMargin
        equidepthArmSql(t, c, HistBuckets, body)
      }.mkString("\n  UNION ALL\n")
      s"""SELECT predicate, est_rows, actual_rows,
         |  abs(est_rows - actual_rows) * 1000000 // actual_rows AS err_ppm
         |FROM (
         |  $arms) u
         |ORDER BY predicate""".stripMargin
    },
    "q161_cohort_ltv" ->
      """WITH uw AS (
        |  SELECT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(12, 2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |ch AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1),
        |g AS (
        |  SELECT ch.cohort_week, uw.week - ch.cohort_week AS week_offset,
        |    CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_active,
        |    CAST(SUM(uw.cents) AS BIGINT) AS rev_cents
        |  FROM uw JOIN ch USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_week, n_active AS cohort_size FROM g
        |       WHERE week_offset = 0),
        |cumq AS (
        |  SELECT g.cohort_week, g.week_offset, g.n_active, sz.cohort_size,
        |    g.rev_cents,
        |    CAST(SUM(g.rev_cents) OVER (PARTITION BY g.cohort_week
        |      ORDER BY g.week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cum_rev_cents
        |  FROM g JOIN sz USING (cohort_week))
        |SELECT cohort_week, week_offset, n_active, cohort_size, rev_cents,
        |  cum_rev_cents,
        |  CAST(cum_rev_cents::HUGEINT * 10000 // cohort_size AS BIGINT)
        |    AS ltv_micro_per_user
        |FROM cumq ORDER BY cohort_week, week_offset""".stripMargin,
    "q162_supplier_hhi" ->
      """WITH r AS (
        |  SELECT s.s_nationkey AS nation, l.l_suppkey,
        |    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12, 2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(12, 2)))) * 10000
        |      AS BIGINT) AS r4
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT CAST(nation AS BIGINT) AS nation,
        |    CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |    CAST(SUM(r4) AS BIGINT) AS tot_r4,
        |    SUM(r4::HUGEINT * r4) AS sq_r4
        |  FROM r GROUP BY 1)
        |SELECT nation, n_suppliers, tot_r4,
        |  CAST(sq_r4 * 1000000 // (tot_r4::HUGEINT * tot_r4) AS BIGINT)
        |    AS hhi_ppm,
        |  1000000000 // nullif(CAST(sq_r4 * 1000000
        |    // (tot_r4::HUGEINT * tot_r4) AS BIGINT), 0)
        |    AS equiv_suppliers_x1000
        |FROM agg ORDER BY nation""".stripMargin,
    "q163_hll_growth_curve" -> {
      val m = HllRegisters
      val kMax = 41 - Integer.numberOfTrailingZeros(m)
      val num = HllAlphaPerMille * m.toLong * m.toLong * (1L << kMax)
      s"""WITH ev AS (
         |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
         |  FROM events),
         |h AS (
         |  SELECT day,
         |    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
         |      1, 10) AS BIGINT) AS h
         |  FROM ev),
         |r AS (
         |  SELECT day, h % $m AS idx,
         |    CASE WHEN h // $m = 0 THEN $kMax
         |         ELSE $kMax - length(bin(h // $m)) END AS rho
         |  FROM h),
         |daily AS (SELECT day, idx, MAX(rho) AS mj FROM r GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM daily),
         |grid AS (
         |  SELECT days.day, g.idx FROM days
         |  CROSS JOIN (SELECT unnest(range(0, $m)) AS idx) g),
         |merged AS (
         |  SELECT grid.day, grid.idx,
         |    MAX(daily.mj) OVER (PARTITION BY grid.idx ORDER BY grid.day
         |      ROWS UNBOUNDED PRECEDING) AS cum_mj
         |  FROM grid LEFT JOIN daily
         |    ON grid.day = daily.day AND grid.idx = daily.idx),
         |est AS (
         |  SELECT day,
         |    CAST(SUM(CASE WHEN cum_mj IS NOT NULL
         |      THEN 1::BIGINT << ($kMax - cum_mj) END) AS BIGINT)
         |      AS s_present,
         |    CAST(SUM(CASE WHEN cum_mj IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_present
         |  FROM merged GROUP BY day),
         |e2 AS (
         |  SELECT day, $num // (1000 * (COALESCE(s_present, 0) +
         |    ($m - n_present) * ${1L << kMax})) AS est_cum
         |  FROM est),
         |fs AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
         |    SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id) f
         |  GROUP BY day),
         |ex AS (
         |  SELECT days.day,
         |    CAST(SUM(COALESCE(fs.n_new, 0)) OVER (ORDER BY days.day
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS exact_cum
         |  FROM days LEFT JOIN fs ON days.day = fs.day)
         |SELECT e2.day, ex.exact_cum, CAST(e2.est_cum AS BIGINT) AS est_cum,
         |  abs(CAST(e2.est_cum AS BIGINT) - ex.exact_cum) * 1000000
         |    // ex.exact_cum AS err_ppm
         |FROM e2 JOIN ex USING (day) ORDER BY e2.day""".stripMargin
    },
    "q164_zonemap_report" ->
      s"""WITH base AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM orders),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
         |srt AS (
         |  SELECT 'a_sorted' AS layout,
         |    CAST(rank - 1 AS BIGINT) * $ZoneFiles // n.n AS file_id, cents
         |  FROM (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents,
         |    o_orderkey) AS rank FROM base) r CROSS JOIN n),
         |hsh AS (
         |  SELECT 'b_hashed' AS layout,
         |    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)
         |      AS BIGINT) % 100 % $ZoneFiles AS file_id, cents
         |  FROM base),
         |ext AS (
         |  SELECT layout, file_id, MIN(cents) AS min_c, MAX(cents) AS max_c
         |  FROM (SELECT * FROM srt UNION ALL SELECT * FROM hsh) u
         |  GROUP BY layout, file_id),
         |pr AS (SELECT * FROM (VALUES ('total_lt_30k', CAST(0 AS BIGINT), CAST(3000000 AS BIGINT)), ('total_150k_200k', CAST(15000000 AS BIGINT), CAST(20000000 AS BIGINT)))
         |  t(predicate, p_lo, p_hi))
         |SELECT layout, predicate, CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(CASE WHEN min_c <= p_hi AND max_c >= p_lo
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
         |  (CAST(COUNT(*) AS BIGINT) - CAST(SUM(CASE WHEN min_c <= p_hi
         |    AND max_c >= p_lo THEN 1 ELSE 0 END) AS BIGINT)) * 1000000
         |    // CAST(COUNT(*) AS BIGINT) AS skipped_ppm
         |FROM ext CROSS JOIN pr
         |GROUP BY layout, predicate
         |ORDER BY layout, predicate""".stripMargin,
    "q165_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |dau AS (
        |  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM ud GROUP BY day),
        |wx AS (
        |  SELECT u.user_id, u.day + g.i AS day
        |  FROM ud u, (SELECT unnest(range(0, 7)) AS i) g),
        |wau AS (
        |  SELECT wx.day, CAST(COUNT(DISTINCT wx.user_id) AS BIGINT) AS wau
        |  FROM wx JOIN days ON wx.day = days.day GROUP BY wx.day),
        |mx AS (
        |  SELECT u.user_id, u.day + g.i AS day
        |  FROM ud u, (SELECT unnest(range(0, 30)) AS i) g),
        |mau AS (
        |  SELECT mx.day, CAST(COUNT(DISTINCT mx.user_id) AS BIGINT) AS mau
        |  FROM mx JOIN days ON mx.day = days.day GROUP BY mx.day)
        |SELECT day, dau, wau, mau, dau * 1000000 // mau AS stickiness_ppm
        |FROM dau JOIN wau USING (day) JOIN mau USING (day)
        |ORDER BY day""".stripMargin,
    "q166_repeat_purchase" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT user_id, ts_us,
        |    lag(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS prev_us
        |  FROM p),
        |buyers AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
        |    CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_repeat
        |  FROM (SELECT user_id, COUNT(*) AS n FROM p GROUP BY 1) b),
        |h AS (
        |  SELECT (ts_us - prev_us) // 86400000000 AS gap_days,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM g WHERE prev_us IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT gap_days, cnt, SUM(cnt) OVER (ORDER BY gap_days
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM h),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_gaps FROM h),
        |q AS (
        |  SELECT MAX(t.n_gaps) AS n_gaps,
        |    MIN(CASE WHEN cum * 2 >= t.n_gaps THEN gap_days END)
        |      AS median_gap_days,
        |    MIN(CASE WHEN cum * 10 >= t.n_gaps * 9 THEN gap_days END)
        |      AS p90_gap_days
        |  FROM c CROSS JOIN t)
        |SELECT b.n_buyers, b.n_repeat,
        |  b.n_repeat * 1000000 // b.n_buyers AS repeat_ppm,
        |  q.n_gaps, CAST(q.median_gap_days AS BIGINT) AS median_gap_days,
        |  CAST(q.p90_gap_days AS BIGINT) AS p90_gap_days
        |FROM buyers b CROSS JOIN q""".stripMargin,

    // Composes the q138/q140/q147 oracle bodies over ONE shared pair +
    // closure CTE chain and melts each report to (report, k, metric,
    // value) BIGINT cells — the same melt the Spark suite performs.
    "q167_dedup_report_suite" ->
      s"""WITH RECURSIVE $nearDupPairCtes,
         |$componentCtes,
         |tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
         |      AS n_toks
         |  FROM documents WHERE doc_id IS NOT NULL),
         |canonized AS (
         |  SELECT t.source, t.n_toks,
         |    CASE WHEN COALESCE(c.canonical_id, t.doc_id) = t.doc_id
         |      THEN 1 ELSE 0 END AS kept
         |  FROM tok t LEFT JOIN comp c ON t.doc_id = c.doc_id),
         |sv AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(kept) AS BIGINT) AS n_docs_kept,
         |    CAST(SUM(kept * n_toks) AS BIGINT) AS n_tokens_kept,
         |    (CAST(SUM(n_toks) AS BIGINT) - CAST(SUM(kept * n_toks) AS BIGINT))
         |      * 1000000 // CAST(SUM(n_toks) AS BIGINT) AS savings_ppm
         |  FROM canonized GROUP BY source),
         |truth AS (
         |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
         |  FROM documents WHERE doc_id % 100 = 0),
         |hit AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs p
         |  JOIN truth t ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b),
         |ev AS (
         |  SELECT
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_detected,
         |    (SELECT n FROM hit) AS n_truth_detected,
         |    (SELECT n FROM hit) * 1000000
         |      // (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS recall_ppm,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) - (SELECT n FROM hit)
         |      AS n_organic),
         |q AS (
         |  SELECT doc_id,
         |    (CASE WHEN n_chars BETWEEN 100 AND 300 THEN 40
         |          WHEN n_chars > 300 THEN 25 ELSE 10 END
         |     + CASE WHEN len(toks) >= 20 THEN 30 ELSE 15 END
         |     + CASE WHEN hits * 50 >= len(toks) AND hits * 5 <= len(toks)
         |       THEN 30 ELSE 10 END)::BIGINT AS quality
         |  FROM (
         |    SELECT doc_id, n_chars, toks,
         |      len(list_filter(toks,
         |        t -> t IN ('the','a','of','and','is','to','in'))) AS hits
         |    FROM (
         |      SELECT doc_id, n_chars,
         |        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
         |      FROM documents WHERE doc_id IS NOT NULL) d0) d1),
         |m AS (SELECT DISTINCT doc_id FROM comp),
         |ov AS (
         |  SELECT quality, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_dup_members,
         |    CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT) AS dup_ppm
         |  FROM q LEFT JOIN m USING (doc_id)
         |  GROUP BY quality)
         |SELECT report, k, metric, value FROM (
         |  SELECT 'savings' AS report, source AS k, 'n_docs' AS metric,
         |    n_docs AS value FROM sv
         |  UNION ALL SELECT 'savings', source, 'n_tokens', n_tokens FROM sv
         |  UNION ALL SELECT 'savings', source, 'n_docs_kept', n_docs_kept
         |    FROM sv
         |  UNION ALL SELECT 'savings', source, 'n_tokens_kept',
         |    n_tokens_kept FROM sv
         |  UNION ALL SELECT 'savings', source, 'savings_ppm', savings_ppm
         |    FROM sv
         |  UNION ALL SELECT 'eval', 'all', 'n_truth', n_truth FROM ev
         |  UNION ALL SELECT 'eval', 'all', 'n_detected', n_detected FROM ev
         |  UNION ALL SELECT 'eval', 'all', 'n_truth_detected',
         |    n_truth_detected FROM ev
         |  UNION ALL SELECT 'eval', 'all', 'recall_ppm', recall_ppm FROM ev
         |  UNION ALL SELECT 'eval', 'all', 'n_organic', n_organic FROM ev
         |  UNION ALL SELECT 'overlap', CAST(quality AS VARCHAR), 'n_docs',
         |    n_docs FROM ov
         |  UNION ALL SELECT 'overlap', CAST(quality AS VARCHAR),
         |    'n_dup_members', n_dup_members FROM ov
         |  UNION ALL SELECT 'overlap', CAST(quality AS VARCHAR), 'dup_ppm',
         |    dup_ppm FROM ov) u
         |ORDER BY report, k, metric""".stripMargin,

    // Replays Events.cupedReadoutOf: q122's 80% time cutoff, per-user
    // (x, y) cents pairs, pooled centered moments in HUGEINT, the
    // two-stage floored theta, and the sign-split adjustment division.
    "q168_cuped_readout" ->
      """WITH b AS (
        |  SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
        |    * 8 // 10 AS cutoff FROM events),
        |u AS (
        |  SELECT user_id,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_us(ts) <= (SELECT cutoff FROM b)
        |      THEN CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT) END),
        |      0) AS x,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_us(ts) > (SELECT cutoff FROM b)
        |      THEN CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT) END),
        |      0) AS y
        |  FROM events GROUP BY user_id),
        |ua AS (
        |  SELECT x, y,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 100 < 50 THEN 'a' ELSE 'b' END AS arm
        |  FROM u),
        |p AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x::HUGEINT * x) AS sxx_raw, SUM(x::HUGEINT * y) AS sxy_raw,
        |    SUM(y::HUGEINT * y) AS syy_raw
        |  FROM ua),
        |m AS (
        |  SELECT n, sx, sy,
        |    n * sxx_raw - sx::HUGEINT * sx AS sxx,
        |    n * sxy_raw - sx::HUGEINT * sy AS sxy,
        |    n * syy_raw - sy::HUGEINT * sy AS syy
        |  FROM p),
        |t AS (
        |  SELECT *, CAST(sxy * 1000000 // nullif(sxx, 0) AS BIGINT)
        |    AS theta_micro FROM m),
        |t2 AS (
        |  SELECT *, CAST(theta_micro * sxy // nullif(syy, 0) AS BIGINT)
        |    AS rho2_ppm FROM t),
        |a AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(x) AS BIGINT) AS sum_x_cents,
        |    CAST(SUM(y) AS BIGINT) AS sum_y_cents
        |  FROM ua GROUP BY arm),
        |j AS (
        |  SELECT a.*, t2.*,
        |    sum_x_cents::HUGEINT * n - sx::HUGEINT * n_users AS dx_num
        |  FROM a CROSS JOIN t2)
        |SELECT arm, n_users, sum_y_cents,
        |  sum_y_cents * 1000000 // n_users AS raw_mean_micro,
        |  sum_y_cents * 1000000 // n_users
        |    - CAST(CASE WHEN theta_micro * dx_num >= 0
        |        THEN (theta_micro * dx_num)
        |          // (n_users::HUGEINT * n)
        |        ELSE -((-(theta_micro * dx_num))
        |          // (n_users::HUGEINT * n))
        |      END AS BIGINT) AS adj_mean_micro,
        |  theta_micro, rho2_ppm
        |FROM j ORDER BY arm""".stripMargin,

    // Replays Events.kmRetentionOf: per-user (first_day, purch_day),
    // censor at the window end, the offset histogram with at-risk
    // counts, and the floored KM product as a LINEAR recursive CTE
    // (one row per step — the same fold Spark runs as a prefix
    // aggregate HOF).
    "q169_km_retention" ->
      s"""WITH RECURSIVE $kmCtes
         |SELECT r.t, CAST(r.n_at_risk AS BIGINT) AS n_at_risk,
         |  r.d AS n_events, r.c AS n_censored,
         |  CAST(r.d * 1000000 // r.n_at_risk AS BIGINT) AS hazard_ppm,
         |  CAST(k.km_ppm AS BIGINT) AS km_ppm
         |FROM risk r JOIN km k ON r.rn = k.rn
         |ORDER BY r.t""".stripMargin,

    // Replays Events.rmstOfKm over the SHARED kmCtes chain: the
    // 30-day spine, carried-forward right-continuous S(d), one floor.
    "q249_rmst" ->
      s"""WITH RECURSIVE $kmCtes,
         |steps AS (
         |  SELECT r.t, CAST(k.km_ppm AS BIGINT) AS km_ppm
         |  FROM risk r JOIN km k ON r.rn = k.rn),
         |spine AS (SELECT unnest(generate_series(0, 29)) AS d),
         |curve AS (
         |  SELECT d, coalesce((
         |    SELECT km_ppm FROM steps WHERE t <= d
         |    ORDER BY t DESC LIMIT 1), 1000000) AS s_ppm
         |  FROM spine),
         |med AS (
         |  SELECT MIN(t) AS median_t FROM steps WHERE km_ppm <= 500000),
         |ns AS (
         |  SELECT CAST(MAX(n_at_risk) AS BIGINT) AS n_subjects
         |  FROM risk)
         |SELECT n_subjects, CAST(30 AS BIGINT) AS tau_days, median_t,
         |  (SELECT CAST(SUM(s_ppm) AS BIGINT) // 1000 FROM curve)
         |    AS rmst_milli_days
         |FROM ns CROSS JOIN med""".stripMargin,

    // Replays Events.latenessProfileOf with the oracle's privilege of a
    // single global ordered window (Spark's two-phase chunked prefix
    // max equals it exactly); md5 jitter and ceil-rank picks identical.
    "q170_lateness_profile" ->
      """WITH base AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |arms AS (
        |  SELECT 'a_inorder' AS arm, event_id, event_type, ts_us,
        |    ts_us AS arrival_us FROM base
        |  UNION ALL
        |  SELECT 'b_jittered', event_id, event_type, ts_us,
        |    ts_us + (CAST('0x' || substr(md5('late:' ||
        |      CAST(event_id AS VARCHAR)), 1, 10) AS BIGINT) % 3600)
        |      * 1000000
        |  FROM base),
        |l AS (
        |  SELECT arm, event_type,
        |    (MAX(ts_us) OVER (PARTITION BY arm
        |       ORDER BY arrival_us, event_id ROWS UNBOUNDED PRECEDING)
        |     - ts_us) // 1000000 AS late_sec
        |  FROM arms),
        |h AS (
        |  SELECT arm, event_type, late_sec,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM l GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT arm, event_type, late_sec, cnt,
        |    SUM(cnt) OVER (PARTITION BY arm, event_type ORDER BY late_sec
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM h),
        |t AS (
        |  SELECT arm, event_type, CAST(SUM(cnt) AS BIGINT) AS n_events,
        |    MAX(late_sec) AS max_late_sec,
        |    CAST(SUM(CASE WHEN late_sec > 600 THEN cnt ELSE 0 END)
        |      AS BIGINT) AS n_over
        |  FROM h GROUP BY 1, 2)
        |SELECT c.arm, c.event_type, MAX(t.n_events) AS n_events,
        |  MIN(CASE WHEN cum * 2 >= t.n_events THEN late_sec END)
        |    AS p50_late_sec,
        |  MIN(CASE WHEN cum * 20 >= t.n_events * 19 THEN late_sec END)
        |    AS p95_late_sec,
        |  MAX(t.max_late_sec) AS max_late_sec,
        |  CAST(MAX(n_over * 1000000 // t.n_events) AS BIGINT)
        |    AS over_600s_ppm
        |FROM c JOIN t USING (arm, event_type)
        |GROUP BY c.arm, c.event_type
        |ORDER BY arm, event_type""".stripMargin,

    // Replays Relational.benfordAuditOf: cents-string first digit, the
    // same nine floor(log10(1+1/d)*1e6) constants, integer deviations.
    "q171_benford_audit" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12, 2))
        |    * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
        |      FROM d GROUP BY 1),
        |e(digit, exp_ppm) AS (VALUES
        |  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
        |  (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
        |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM c),
        |j AS (
        |  SELECT CAST(e.digit AS BIGINT) AS digit,
        |    COALESCE(c.n_orders, 0) AS n_orders,
        |    COALESCE(c.n_orders, 0) * 1000000 // (SELECT n_total FROM t)
        |      AS obs_ppm,
        |    CAST(e.exp_ppm AS BIGINT) AS exp_ppm
        |  FROM e LEFT JOIN c ON e.digit = c.digit)
        |SELECT digit, n_orders, obs_ppm, exp_ppm,
        |  abs(obs_ppm - exp_ppm) AS dev_ppm,
        |  (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) // exp_ppm AS chi_ppm
        |FROM j ORDER BY digit""".stripMargin,

    // Replays Events.theilSenTrendOf: the (type, day) cents matrix,
    // all-pairs integer slopes, ceil-rank median, HUGEINT OLS.
    "q172_theil_sen_trend" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    (b.cents - a.cents) * 1000000 // (b.day - a.day)
        |      AS slope_micro
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |h AS (
        |  SELECT event_type, slope_micro, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM p GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_pairs
        |  FROM h GROUP BY 1),
        |c AS (
        |  SELECT h.event_type, slope_micro, cnt,
        |    SUM(cnt) OVER (PARTITION BY h.event_type ORDER BY slope_micro
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    t.n_pairs
        |  FROM h JOIN t ON h.event_type = t.event_type),
        |med AS (
        |  SELECT event_type, MAX(n_pairs) AS n_pairs,
        |    MIN(CASE WHEN cum * 2 >= n_pairs THEN slope_micro END)
        |      AS median_slope_micro
        |  FROM c GROUP BY 1),
        |ols AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST((COUNT(*) * SUM(day::HUGEINT * cents)
        |        - SUM(day)::HUGEINT * SUM(cents)) * 1000000
        |      // nullif(COUNT(*) * SUM(day::HUGEINT * day)
        |        - SUM(day)::HUGEINT * SUM(day), 0) AS BIGINT)
        |      AS ols_slope_micro
        |  FROM daily GROUP BY 1)
        |SELECT m.event_type, o.n_days, m.n_pairs, m.median_slope_micro,
        |  o.ols_slope_micro
        |FROM med m JOIN ols o ON m.event_type = o.event_type
        |ORDER BY m.event_type""".stripMargin,

    // Replays Events.forecastBacktestOf: densified calendar, window
    // lags, the once-floored ma7 mean, last-20% test days, sae ratios.
    "q173_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT MIN(day) AS mn, MAX(day) AS mx,
        |    MIN(day) + (MAX(day) - MIN(day)) * 8 // 10 AS cutoff
        |  FROM daily),
        |cal AS (
        |  SELECT unnest(generate_series(mn, mx)) AS day, mn, cutoff FROM b),
        |dense AS (
        |  SELECT t.event_type, cal.day, cal.mn, cal.cutoff,
        |    COALESCE(d.cents, 0) AS cents
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |s AS (
        |  SELECT event_type, day, mn, cutoff, cents,
        |    lag(cents, 1) OVER w AS naive,
        |    lag(cents, 7) OVER w AS snaive7,
        |    SUM(cents) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) // 7 AS ma7
        |  FROM dense
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |test AS (
        |  SELECT * FROM s WHERE day > cutoff AND day - 7 >= mn),
        |pm AS (
        |  SELECT event_type, m.method,
        |    CAST(COUNT(*) AS BIGINT) AS n_forecasts,
        |    CAST(SUM(abs(cents - CASE m.method WHEN 'naive' THEN naive
        |      WHEN 'snaive7' THEN snaive7 ELSE ma7 END)) AS BIGINT) AS sae,
        |    CAST(SUM(CASE m.method WHEN 'naive' THEN naive
        |      WHEN 'snaive7' THEN snaive7 ELSE ma7 END - cents)
        |      AS BIGINT) AS se
        |  FROM test CROSS JOIN
        |    (SELECT unnest(['naive', 'snaive7', 'ma7']) AS method) m
        |  GROUP BY 1, 2),
        |nv AS (
        |  SELECT event_type, sae AS naive_sae FROM pm
        |  WHERE method = 'naive')
        |SELECT pm.event_type, pm.method, pm.n_forecasts,
        |  pm.sae // pm.n_forecasts AS mae_cents,
        |  CASE WHEN pm.se >= 0 THEN pm.se // pm.n_forecasts
        |    ELSE -((-pm.se) // pm.n_forecasts) END AS bias_cents,
        |  pm.sae * 1000000 // nullif(nv.naive_sae, 0) AS vs_naive_ppm
        |FROM pm JOIN nv ON pm.event_type = nv.event_type
        |ORDER BY pm.event_type, pm.method""".stripMargin,

    // Replays Relational.abcOf with the oracle's privilege of one
    // global (r4 desc, partkey) window; Spark's coarse-bucket +
    // boundary-bucket two-phase classification must equal it exactly.
    "q174_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12, 2))
        |      * (1 - CAST(l_discount AS DECIMAL(12, 2)))) * 10000
        |      AS BIGINT) AS r4
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT r4,
        |    COALESCE(SUM(r4) OVER (ORDER BY r4 DESC, l_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM rev),
        |t AS (SELECT CAST(SUM(r4) AS BIGINT) AS total,
        |      CAST(COUNT(*) AS BIGINT) AS np FROM rev),
        |k AS (
        |  SELECT CASE
        |      WHEN cum_before * 5 < (SELECT total FROM t) * 4 THEN 'A'
        |      WHEN cum_before * 20 < (SELECT total FROM t) * 19 THEN 'B'
        |      ELSE 'C' END AS abc_class, r4
        |  FROM c)
        |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(r4) AS BIGINT) AS revenue_r4,
        |  CAST(SUM(r4)::HUGEINT * 1000000 // (SELECT total FROM t)
        |    AS BIGINT) AS revenue_share_ppm,
        |  CAST(COUNT(*) AS BIGINT) * 1000000 // (SELECT np FROM t)
        |    AS parts_share_ppm
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays TextOps.distinctiveTermsOf: the (source, token, n) matrix,
    // +1-smoothed odds ratio in HUGEINT, count floor 20, top-5 ranks.
    "q175_distinctive_terms" ->
      """WITH c AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT source,
        |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |    FROM documents WHERE doc_id IS NOT NULL) t
        |  GROUP BY 1, 2),
        |s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src
        |      FROM c GROUP BY 1),
        |v AS (SELECT token, CAST(SUM(n) AS BIGINT) AS n_tok
        |      FROM c GROUP BY 1),
        |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM c),
        |sc AS (
        |  SELECT c.source, c.token, c.n, v.n_tok - c.n AS n_rest,
        |    CAST(c.n::HUGEINT
        |      * ((SELECT n_all FROM a) - s.n_src - (v.n_tok - c.n) + 1)
        |      * 1000000
        |      // ((s.n_src - c.n + 1)::HUGEINT * (v.n_tok - c.n + 1))
        |      AS BIGINT) AS or_ppm
        |  FROM c JOIN v USING (token) JOIN s USING (source)
        |  WHERE c.n >= 20),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY or_ppm DESC, token ASC) AS rnk
        |  FROM sc)
        |SELECT source, CAST(rnk AS BIGINT) AS rank, token,
        |  n AS n_in_source, n_rest, or_ppm
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    // Replays Relational.giniOf: per-customer cents, whole-dollar
    // quantization, per-bucket rank-weighted sums in HUGEINT, the
    // closed-form Gini with one truncating ppm division.
    "q176_gini_spend" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |sn AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation, sp.cents,
        |    sp.cents // 100 AS v
        |  FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
        |h AS (
        |  SELECT nation, v, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(cents) AS BIGINT) AS cents_in
        |  FROM sn GROUP BY 1, 2),
        |cb AS (
        |  SELECT nation, v, c, cents_in,
        |    COALESCE(SUM(c) OVER (PARTITION BY nation ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM h),
        |a AS (
        |  SELECT nation, CAST(SUM(c) AS BIGINT) AS n_customers,
        |    CAST(SUM(cents_in) AS BIGINT) AS total_cents,
        |    SUM(v::HUGEINT * c) AS sx,
        |    SUM(v::HUGEINT * c * 2 * cum_before
        |      + v::HUGEINT * c * (c + 1)) AS two_rank_x
        |  FROM cb GROUP BY 1)
        |SELECT nation, n_customers, total_cents,
        |  CAST((two_rank_x - (n_customers + 1) * sx) * 1000000
        |    // nullif(n_customers::HUGEINT * sx, 0) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY nation""".stripMargin,

    // Replays Relational.inflightTimelineOf: the two-delta difference
    // array, bounded-day aggregation, densified-calendar prefix sum.
    "q177_inflight_timeline" ->
      """WITH d AS (
        |  SELECT epoch_us(o.o_orderdate) // 86400000000 AS order_day,
        |    epoch_us(l.l_shipdate) // 86400000000 AS ship_day
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deltas AS (
        |  SELECT day, CAST(SUM(delta) AS BIGINT) AS delta,
        |    CAST(SUM(ordered) AS BIGINT) AS n_ordered,
        |    CAST(SUM(shipped) AS BIGINT) AS n_shipped,
        |    CAST(SUM(invalid) AS BIGINT) AS n_invalid
        |  FROM (
        |    SELECT order_day AS day, 1 AS delta, 1 AS ordered,
        |      0 AS shipped, 0 AS invalid FROM d
        |    WHERE ship_day >= order_day
        |    UNION ALL
        |    SELECT ship_day, -1, 0, 1, 0 FROM d WHERE ship_day >= order_day
        |    UNION ALL
        |    SELECT order_day, 0, 0, 0, 1 FROM d
        |    WHERE ship_day < order_day) u
        |  GROUP BY 1),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM deltas),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b)
        |SELECT cal.day,
        |  COALESCE(deltas.n_ordered, 0) AS n_ordered,
        |  COALESCE(deltas.n_shipped, 0) AS n_shipped,
        |  COALESCE(deltas.n_invalid, 0) AS n_invalid,
        |  CAST(SUM(COALESCE(deltas.delta, 0)) OVER (ORDER BY cal.day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_backlog
        |FROM cal LEFT JOIN deltas ON cal.day = deltas.day
        |ORDER BY cal.day""".stripMargin,

    // Replays Layout.compactionPlanOf: day-granular file sizes, the
    // NFD sweep as a LINEAR recursive CTE (same fold Spark runs as a
    // prefix aggregate HOF over the broadcast sorted file list).
    "q178_compaction_plan" ->
      """WITH RECURSIVE f AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS file_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT file_id, n_rows,
        |    ROW_NUMBER() OVER (ORDER BY n_rows DESC, file_id ASC) AS rn
        |  FROM f),
        |sweep(rn, bin, fill) AS (
        |  SELECT rn, CAST(1 AS BIGINT), n_rows FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn,
        |    CASE WHEN s.fill + r.n_rows > 4096 THEN s.bin + 1
        |         ELSE s.bin END,
        |    CASE WHEN s.fill + r.n_rows > 4096 THEN r.n_rows
        |         ELSE s.fill + r.n_rows END
        |  FROM sweep s JOIN r ON r.rn = s.rn + 1)
        |SELECT s.bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(r.n_rows) AS BIGINT) AS total_rows,
        |  CAST(SUM(r.n_rows) AS BIGINT) * 1000000 // 4096 AS fill_ppm
        |FROM sweep s JOIN r ON s.rn = r.rn
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // INDEPENDENT skyline formulation: the textbook O(n²) NOT-EXISTS
    // dominance test — hash-matching it proves Spark's value-domain
    // prefix-max reduction computes the same frontier.
    "q179_skyline_parts" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part)
        |SELECT p_partkey, price_cents, size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
        |    AND (b.price_cents < a.price_cents OR b.size > a.size))
        |ORDER BY p_partkey""".stripMargin,

    // Replays Events.controlChartOfDaily: densified calendar, HUGEINT
    // cross-multiplied 2σ/3σ tests, the 3-row WE-rule-2 frame.
    "q180_control_chart" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
        |dense AS (
        |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS s1,
        |    SUM(cents::HUGEINT * cents) AS s2
        |  FROM dense GROUP BY 1),
        |f AS (
        |  SELECT d.event_type, d.day, d.cents,
        |    d.cents::HUGEINT * st.n - st.s1 AS dev,
        |    st.n * st.s2 - st.s1::HUGEINT * st.s1 AS var_n
        |  FROM dense d JOIN st USING (event_type)),
        |g AS (
        |  SELECT event_type, day, cents,
        |    CASE WHEN dev * dev > 9 * var_n
        |      THEN CASE WHEN dev > 0 THEN 1 ELSE -1 END
        |      ELSE 0 END AS rule1,
        |    CASE WHEN dev * dev > 4 * var_n
        |      THEN CASE WHEN dev > 0 THEN 1 ELSE -1 END
        |      ELSE 0 END AS beyond2
        |  FROM f),
        |h AS (
        |  SELECT event_type, day, cents, CAST(rule1 AS BIGINT) AS rule1,
        |    beyond2,
        |    SUM(CASE WHEN beyond2 = 1 THEN 1 ELSE 0 END)
        |      OVER w3 AS n2a,
        |    SUM(CASE WHEN beyond2 = -1 THEN 1 ELSE 0 END)
        |      OVER w3 AS n2b
        |  FROM g
        |  WINDOW w3 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, cents, rule1,
        |  CAST(CASE WHEN beyond2 = 1 AND n2a >= 2 THEN 1
        |       WHEN beyond2 = -1 AND n2b >= 2 THEN -1
        |       ELSE 0 END AS BIGINT) AS rule2
        |FROM h ORDER BY event_type, day""".stripMargin,

    // Replays Clustering.daviesBouldin on top of the full Lloyd chain:
    // sorted-fold scatters, sequential-fold centroid separations, the
    // max ratio, and the overall index — double-for-double.
    "q181_davies_bouldin" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)},
         |sc AS (
         |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         |    list_reduce(list_sort(list(sqrt(dist))), (x, y) -> x + y)
         |      AS sum_ed
         |  FROM a$KmeansIters GROUP BY cluster),
         |sm AS (SELECT cluster, n_members, sum_ed / n_members AS s_i
         |       FROM sc),
         |m AS (
         |  SELECT a.cluster AS ci, b.cluster AS cj,
         |    sqrt(list_reduce(list_transform(range(1, 65),
         |      ii -> (a.c[ii] - b.c[ii]) * (a.c[ii] - b.c[ii])),
         |      (x2, y2) -> x2 + y2)) AS m_ij
         |  FROM cent${KmeansIters - 1} a CROSS JOIN cent${KmeansIters - 1} b
         |  WHERE a.cluster <> b.cluster),
         |r AS (
         |  SELECT m.ci, (sa.s_i + sb.s_i) / m.m_ij AS r_ij
         |  FROM m JOIN sm sa ON m.ci = sa.cluster
         |  JOIN sm sb ON m.cj = sb.cluster),
         |d AS (SELECT ci AS cluster, MAX(r_ij) AS d_i FROM r GROUP BY ci),
         |db AS (
         |  SELECT list_reduce(list_sort(list(d_i)), (x, y) -> x + y)
         |    / COUNT(*) AS db_index FROM d)
         |SELECT sm.cluster, sm.n_members, round(sm.s_i, 6) AS s_i,
         |  round(d.d_i, 6) AS d_i,
         |  round((SELECT db_index FROM db), 6) AS db_index
         |FROM sm JOIN d ON sm.cluster = d.cluster
         |ORDER BY sm.cluster""".stripMargin,

    // Replays Events.weekdayProfileOfDaily: densified calendar,
    // (day+3)%7 weekdays, cross-multiplied index, peak flags.
    "q182_weekday_profile" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
        |dense AS (
        |  SELECT t.event_type, cal.day, (cal.day + 3) % 7 AS dow,
        |    COALESCE(d.cents, 0) AS cents
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |bd AS (
        |  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM dense GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(SUM(n_days) AS BIGINT) AS n_all,
        |    CAST(SUM(cents) AS BIGINT) AS s_all
        |  FROM bd GROUP BY 1),
        |ix AS (
        |  SELECT bd.event_type, bd.dow, bd.n_days, bd.cents,
        |    CAST(bd.cents::HUGEINT * t.n_all * 1000000
        |      // nullif(bd.n_days::HUGEINT * t.s_all, 0) AS BIGINT)
        |      AS index_ppm
        |  FROM bd JOIN t USING (event_type)),
        |pk AS (SELECT event_type, MAX(index_ppm) AS peak_ppm
        |       FROM ix GROUP BY 1)
        |SELECT ix.event_type, ix.dow, ix.n_days, ix.cents, ix.index_ppm,
        |  CAST(CASE WHEN ix.index_ppm = pk.peak_ppm THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_peak
        |FROM ix JOIN pk USING (event_type)
        |ORDER BY ix.event_type, ix.dow""".stripMargin,

    // Replays Graph.strongKCoreLadder: the >=2-shared-orders edge
    // build, then 24 chained peeling rounds per k.
    "q183_strong_kcore" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |se AS MATERIALIZED (
         |  SELECT a.p AS src, b.p AS dst
         |  FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |${kcoreCtes(1, 24)},
         |${kcoreCtes(2, 24)},
         |${kcoreCtes(3, 24)}
         |SELECT * FROM (
         |${kcoreArmSql(1, 24)}
         |UNION ALL
         |${kcoreArmSql(2, 24)}
         |UNION ALL
         |${kcoreArmSql(3, 24)}) u
         |ORDER BY k""".stripMargin,

    // Replays Events.newVsReturningOf: the distinct (user, day) matrix,
    // per-user first-seen min, comparison-classified daily split.
    "q184_new_vs_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 86400 AS day
        |  FROM events),
        |fs AS (SELECT user_id, MIN(day) AS f FROM ud GROUP BY 1)
        |SELECT ud.day, CAST(COUNT(*) AS BIGINT) AS dau,
        |  CAST(SUM(CASE WHEN ud.day = fs.f THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN ud.day > fs.f THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning,
        |  CAST(SUM(CASE WHEN ud.day > fs.f THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS returning_ppm
        |FROM ud JOIN fs ON ud.user_id = fs.user_id
        |GROUP BY ud.day ORDER BY ud.day""".stripMargin,

    // Replays Privacy.lDiversity: the broadcast-joined slim base, per
    // level distinct-sensitive counts and homogeneous-group risk.
    "q185_l_diversity" ->
      """WITH base AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS nat,
        |    CAST(n.n_regionkey AS BIGINT) AS reg,
        |    CAST(CASE WHEN c.c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT)
        |      AS bal_sign,
        |    c.c_mktsegment AS sens
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |l0 AS (SELECT nat AS g, CAST(COUNT(*) AS BIGINT) AS sz,
        |       CAST(COUNT(DISTINCT sens) AS BIGINT) AS div
        |       FROM base GROUP BY 1),
        |l1 AS (SELECT reg AS g, CAST(COUNT(*) AS BIGINT) AS sz,
        |       CAST(COUNT(DISTINCT sens) AS BIGINT) AS div
        |       FROM base GROUP BY 1),
        |l2 AS (SELECT bal_sign AS g, CAST(COUNT(*) AS BIGINT) AS sz,
        |       CAST(COUNT(DISTINCT sens) AS BIGINT) AS div
        |       FROM base GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'L0_nation' AS level, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_homogeneous,
        |    MIN(div) AS min_diversity,
        |    CAST(SUM(CASE WHEN div < 3 THEN sz ELSE 0 END) AS BIGINT)
        |      * 1000000 // CAST(SUM(sz) AS BIGINT) AS risk_ppm
        |  FROM l0
        |  UNION ALL
        |  SELECT 'L1_region', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT),
        |    MIN(div),
        |    CAST(SUM(CASE WHEN div < 3 THEN sz ELSE 0 END) AS BIGINT)
        |      * 1000000 // CAST(SUM(sz) AS BIGINT)
        |  FROM l1
        |  UNION ALL
        |  SELECT 'L2_balance_sign', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT),
        |    MIN(div),
        |    CAST(SUM(CASE WHEN div < 3 THEN sz ELSE 0 END) AS BIGINT)
        |      * 1000000 // CAST(SUM(sz) AS BIGINT)
        |  FROM l2) u
        |ORDER BY level""".stripMargin,

    // Replays Relational.slaComplianceOf: order-to-ship day gaps, the
    // q177 causality screen, on-time ppm, ceil-rank median/p95.
    "q186_sla_compliance" ->
      """WITH g AS (
        |  SELECT o.o_orderpriority AS priority,
        |    epoch_us(l.l_shipdate) // 86400000000
        |      - epoch_us(o.o_orderdate) // 86400000000 AS gap_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h AS (
        |  SELECT priority, gap_days, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM g WHERE gap_days >= 0 GROUP BY 1, 2),
        |inv AS (
        |  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_invalid
        |  FROM g WHERE gap_days < 0 GROUP BY 1),
        |t AS (
        |  SELECT priority, CAST(SUM(cnt) AS BIGINT) AS n_lines,
        |    CAST(SUM(CASE WHEN gap_days <= 7 THEN cnt ELSE 0 END)
        |      AS BIGINT) AS n_on_time
        |  FROM h GROUP BY 1),
        |c AS (
        |  SELECT h.priority, gap_days, cnt,
        |    SUM(cnt) OVER (PARTITION BY h.priority ORDER BY gap_days
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    t.n_lines, t.n_on_time
        |  FROM h JOIN t ON h.priority = t.priority),
        |agg AS (
        |  SELECT priority, MAX(n_lines) AS n_lines,
        |    MAX(n_on_time * 1000000 // n_lines) AS on_time_ppm,
        |    MIN(CASE WHEN cum * 2 >= n_lines THEN gap_days END)
        |      AS median_days,
        |    MIN(CASE WHEN cum * 20 >= n_lines * 19 THEN gap_days END)
        |      AS p95_days
        |  FROM c GROUP BY 1)
        |SELECT agg.priority, agg.n_lines,
        |  COALESCE(inv.n_invalid, 0) AS n_invalid,
        |  CAST(agg.on_time_ppm AS BIGINT) AS on_time_ppm,
        |  agg.median_days, agg.p95_days
        |FROM agg LEFT JOIN inv ON agg.priority = inv.priority
        |ORDER BY agg.priority""".stripMargin,

    // Replays Events.cusumChartOfDaily: densified calendar, integer
    // mu/k/h params, and the reset-on-alarm Page recurrence as a
    // per-type LINEAR recursive CTE (the q178 sweep, partitioned).
    "q187_cusum_chart" -> cusumSql,
    "q214_ewma_chart" -> ewmaSql,
    "q234_holt_chart" -> holtSql,

    // Replays Events.acfOfDaily: densified calendar, milli-centered
    // deviations, 7 window lags, num/den HUGEINT ratios, the
    // Ljung-Box floors and the chi2(7) verdict (1-based list index).
    "q215_acf_daily" ->
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
         |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
         |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
         |dense AS (
         |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
         |  FROM (SELECT DISTINCT event_type FROM daily) t
         |  CROSS JOIN cal
         |  LEFT JOIN daily d ON d.event_type = t.event_type
         |    AND d.day = cal.day),
         |st AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) * 1000 // COUNT(*) AS m_milli
         |  FROM dense GROUP BY 1),
         |dx AS (
         |  SELECT dense.event_type, day, cents * 1000 - m_milli AS dx, n
         |  FROM dense JOIN st USING (event_type)),
         |den AS (
         |  SELECT event_type, SUM(dx::HUGEINT * dx) AS den,
         |    MAX(n) AS n
         |  FROM dx GROUP BY 1),
         |lagged AS (
         |  SELECT event_type, day, dx,
         |    ${(1 to 7).map(k =>
             s"LAG(dx, $k) OVER w AS dx$k").mkString(",\n         |    ")}
         |  FROM dx WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |melted AS (
         |  ${(1 to 7).map(k =>
             s"SELECT event_type, CAST($k AS BIGINT) AS lag, dx, " +
             s"dx$k AS dxl FROM lagged WHERE dx$k IS NOT NULL")
            .mkString("\n         |  UNION ALL ")}),
         |nums AS (
         |  SELECT event_type, lag, SUM(dx::HUGEINT * dxl) AS num
         |  FROM melted GROUP BY 1, 2),
         |rs AS (
         |  SELECT nums.event_type, lag, den.n,
         |    CAST(num * 1000000 // nullif(den, 0) AS BIGINT) AS r_ppm
         |  FROM nums JOIN den USING (event_type)),
         |rb AS (
         |  SELECT *,
         |    CAST(CASE WHEN r_ppm IS NULL THEN NULL
         |      WHEN r_ppm::HUGEINT * r_ppm * n > 4000000000000::HUGEINT
         |        THEN 1 ELSE 0 END AS BIGINT) AS beyond_band
         |  FROM rs),
         |lb AS (
         |  SELECT event_type,
         |    SUM(r_ppm::HUGEINT * r_ppm // nullif(n - lag, 0)) AS s_sum,
         |    MAX(n) AS n2, CAST(COUNT(*) AS BIGINT) AS n_lags
         |  FROM rb GROUP BY 1),
         |lb2 AS (
         |  SELECT event_type, n_lags AS df_chi2,
         |    CAST(n2::HUGEINT * (n2 + 2) * s_sum // 1000000 AS BIGINT)
         |      AS q_lb_micro,
         |    CAST(([${graft.ops.Events.Chi2Crit95Ppm.mkString(",")}])
         |      [n_lags] AS BIGINT) AS crit_micro
         |  FROM lb),
         |lb3 AS (
         |  SELECT *,
         |    CAST(CASE WHEN q_lb_micro IS NULL OR crit_micro IS NULL
         |      THEN NULL
         |      WHEN q_lb_micro > crit_micro THEN 1 ELSE 0 END
         |      AS BIGINT) AS autocorrelated
         |  FROM lb2)
         |SELECT rb.event_type, lag, n AS n_days, r_ppm, beyond_band,
         |  q_lb_micro, df_chi2, crit_micro, autocorrelated
         |FROM rb JOIN lb3 ON rb.event_type = lb3.event_type
         |ORDER BY 1, 2""".stripMargin,

    // Replays Privacy.tClosenessOf: the q185 base, per-level
    // cross-multiplied TV distances, the 0.2 verdict rollup.
    "q216_t_closeness" ->
      s"""WITH base AS MATERIALIZED (
         |  SELECT CAST(c.c_nationkey AS BIGINT) AS nat,
         |    CAST(n.n_regionkey AS BIGINT) AS reg,
         |    CAST(CASE WHEN c.c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT)
         |      AS bal_sign,
         |    c.c_mktsegment AS sens
         |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
         |gsens AS (SELECT sens, CAST(COUNT(*) AS BIGINT) AS n_c
         |          FROM base GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM base)
         |SELECT * FROM (
         |  ${tClosenessArm("L0_nation", "nat")}
         |  UNION ALL
         |  ${tClosenessArm("L1_region", "reg")}
         |  UNION ALL
         |  ${tClosenessArm("L2_balance_sign", "bal_sign")}) u
         |ORDER BY level""".stripMargin,

    // Replays TextOps.heapsGrowthOf: shared tokenizer, first-seen
    // min-aggregate, proportional doc-id deciles, 10-row cumulative.
    "q217_heaps_growth" ->
      """WITH b AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx
        |           FROM documents),
        |toks AS MATERIALIZED (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |dt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
        |       FROM toks GROUP BY 1),
        |dd AS (
        |  SELECT (d.doc_id - mn) * 10 // (mx - mn + 1) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(COALESCE(dt.n_toks, 0)) AS BIGINT) AS n_tokens
        |  FROM documents d CROSS JOIN b LEFT JOIN dt USING (doc_id)
        |  GROUP BY 1),
        |td AS (
        |  SELECT (first_doc - mn) * 10 // (mx - mn + 1) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS new_types
        |  FROM (SELECT tok, MIN(doc_id) AS first_doc FROM toks
        |        GROUP BY 1) f
        |  CROSS JOIN b GROUP BY 1),
        |sp AS (SELECT unnest(generate_series(1, 10)) AS decile),
        |j AS (
        |  SELECT sp.decile, COALESCE(n_docs, 0) AS n_docs,
        |    COALESCE(n_tokens, 0) AS n_tokens,
        |    COALESCE(new_types, 0) AS new_types
        |  FROM sp LEFT JOIN dd ON sp.decile = dd.decile
        |  LEFT JOIN td ON sp.decile = td.decile),
        |c AS (
        |  SELECT decile, n_docs, n_tokens, new_types,
        |    SUM(n_docs) OVER w AS n_docs_cum,
        |    SUM(n_tokens) OVER w AS n_tokens_cum,
        |    SUM(new_types) OVER w AS vocab_cum
        |  FROM j WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        |SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_tokens,
        |  new_types,
        |  CAST(n_docs_cum AS BIGINT) AS n_docs_cum,
        |  CAST(n_tokens_cum AS BIGINT) AS n_tokens_cum,
        |  CAST(vocab_cum AS BIGINT) AS vocab_cum,
        |  CAST(vocab_cum * 1000000 // nullif(n_tokens_cum, 0) AS BIGINT)
        |    AS ttr_ppm
        |FROM c ORDER BY decile""".stripMargin,

    // Replays RankTests.spearmanOf: whole-dollar quantization, the
    // shared doubled-midrank engine per variable, the q209 two-pass
    // integer Pearson on rank pairs, z2 = rho2*(n-1) vs chi2(1).
    "q218_spearman" ->
      s"""WITH spend AS (
         |  SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice
         |    AS DECIMAL(12, 2)) * 100 AS BIGINT)) AS BIGINT) AS ycents
         |  FROM orders GROUP BY 1),
         |d AS MATERIALIZED (
         |  SELECT CAST(CAST(c_acctbal AS DECIMAL(12, 2)) * 100
         |      AS BIGINT) // 100 AS x,
         |    COALESCE(ycents // 100, 0) AS y
         |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
         |hx AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM d GROUP BY 1),
         |rx AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
         |    + cnt + 1 AS mr2 FROM hx),
         |tx AS (SELECT SUM(cnt::HUGEINT * cnt * cnt - cnt) AS tie_x
         |       FROM hx),
         |hy AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM d GROUP BY 1),
         |ry AS (SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
         |    + cnt + 1 AS mr2 FROM hy),
         |ty AS (SELECT SUM(cnt::HUGEINT * cnt * cnt - cnt) AS tie_y
         |       FROM hy),
         |pairs AS MATERIALIZED (
         |  SELECT rx.mr2 AS rx2, ry.mr2 AS ry2
         |  FROM d JOIN rx ON d.x = rx.v JOIN ry ON d.y = ry.v),
         |p1 AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(rx2)::HUGEINT * 1000 // COUNT(*) AS mx,
         |    SUM(ry2)::HUGEINT * 1000 // COUNT(*) AS my
         |  FROM pairs),
         |p2 AS (
         |  SELECT MAX(n) AS n,
         |    SUM((rx2 * 1000 - mx)::HUGEINT * (ry2 * 1000 - my)) AS covS,
         |    SUM((rx2 * 1000 - mx)::HUGEINT * (rx2 * 1000 - mx)) AS vxS,
         |    SUM((ry2 * 1000 - my)::HUGEINT * (ry2 * 1000 - my)) AS vyS
         |  FROM pairs CROSS JOIN p1),
         |p3 AS (
         |  SELECT n, covS // n AS covM, vxS // n AS vxM, vyS // n AS vyM
         |  FROM p2),
         |p4 AS (
         |  SELECT n,
         |    CAST(CASE WHEN covM > 0 THEN 1 WHEN covM < 0 THEN -1
         |      ELSE 0 END AS BIGINT) AS rho_sign,
         |    CAST(covM * covM * 1000000 // nullif(vxM * vyM, 0)
         |      AS BIGINT) AS rho2_ppm
         |  FROM p3)
         |SELECT n, CAST(tie_x AS BIGINT) AS tie_x,
         |  CAST(tie_y AS BIGINT) AS tie_y, rho_sign, rho2_ppm,
         |  rho2_ppm * (n - 1) AS z2_micro,
         |  CAST(${graft.ops.Events.Chi2Crit95Ppm.head} AS BIGINT)
         |    AS crit_micro,
         |  CAST(CASE WHEN rho2_ppm IS NULL THEN NULL
         |    WHEN rho2_ppm * (n - 1) >
         |      ${graft.ops.Events.Chi2Crit95Ppm.head} THEN 1
         |    ELSE 0 END AS BIGINT) AS significant
         |FROM p4 CROSS JOIN tx CROSS JOIN ty""".stripMargin,

    // Replays Features.naiveBayesOf: the count cube, Laplace-smoothed
    // fixed-point scores, the pinned argmax, the weighted confusion
    // rollup. The cube/score CTEs are shared with q224/q225 via
    // `nbScoreCtes` so the model arithmetic cannot drift.
    "q219_naive_bayes" ->
      s"""WITH $nbScoreCtes,
        |tot AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_total,
        |        CAST(MAX(n_c) AS BIGINT) AS n_major FROM cls),
        |pred AS (
        |  SELECT nat, bsign, seg AS predicted
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY nat, bsign
        |          ORDER BY s_fp DESC, seg ASC) AS rn FROM sc) z
        |  WHERE rn = 1),
        |conf AS (
        |  SELECT cube.seg AS actual, predicted,
        |    CAST(SUM(cube.n) AS BIGINT) AS n
        |  FROM cube JOIN pred USING (nat, bsign) GROUP BY 1, 2),
        |acc AS (
        |  SELECT n_total,
        |    CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
        |      * 1000000 // n_total AS BIGINT) AS accuracy_ppm,
        |    CAST(n_major * 1000000 // n_total AS BIGINT) AS baseline_ppm
        |  FROM conf CROSS JOIN tot GROUP BY n_total, n_major)
        |SELECT actual, predicted, n, n_total, accuracy_ppm, baseline_ppm
        |FROM conf CROSS JOIN acc ORDER BY 1, 2""".stripMargin,

    // Replays Features.mcnemarOf over the shared NB score CTEs: the
    // combo argmax, the pinned majority class, discordant-pair
    // rollups and the continuity-corrected chi-square.
    "q248_mcnemar" ->
      s"""WITH $nbScoreCtes,
         |pred AS (
         |  SELECT nat, bsign, seg AS predicted
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY nat, bsign
         |          ORDER BY s_fp DESC, seg ASC) AS rn FROM sc) z
         |  WHERE rn = 1),
         |mj AS (
         |  SELECT seg AS major FROM cls
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY n_c DESC, seg ASC) = 1),
         |f AS (
         |  SELECT CAST(SUM(cube.n) AS BIGINT) AS n_total,
         |    CAST(SUM(CASE WHEN cube.seg = predicted
         |      AND cube.seg <> major THEN cube.n ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN cube.seg <> predicted
         |      AND cube.seg = major THEN cube.n ELSE 0 END)
         |      AS BIGINT) AS c
         |  FROM cube JOIN pred USING (nat, bsign) CROSS JOIN mj)
         |SELECT n_total, b, c,
         |  CAST((abs(b - c) - 1)::HUGEINT * (abs(b - c) - 1) * 1000000
         |    // nullif(b + c, 0) AS BIGINT) AS chi2_micro,
         |  CAST(CASE WHEN b + c = 0 THEN NULL
         |    WHEN (abs(b - c) - 1)::HUGEINT * (abs(b - c) - 1)
         |      * 1000000 // (b + c) > ${Events.Chi2Crit95Ppm.head}
         |    THEN 1 ELSE 0 END AS BIGINT) AS significant
         |FROM f""".stripMargin,

    // Replays Events.typeCooccurrenceOf: distinct (user, day, type)
    // baskets, within-basket pairs, cross-multiplied lift.
    "q250_type_cooccurrence" ->
      """WITH bt AS MATERIALIZED (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 1000000 // 86400 AS day, event_type
        |  FROM events),
        |nt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
        |  FROM (SELECT DISTINCT user_id, day FROM bt) x),
        |mg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m
        |  FROM bt GROUP BY 1),
        |pc AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM bt a JOIN bt b ON a.user_id = b.user_id
        |    AND a.day = b.day AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, ma.m AS n_a, mb.m AS n_b,
        |  n_baskets,
        |  CAST(n_ab::HUGEINT * n_baskets * 1000000
        |    // (ma.m::HUGEINT * mb.m) AS BIGINT) AS lift_ppm,
        |  n_ab * 1000000 // (ma.m + mb.m - n_ab) AS jaccard_ppm
        |FROM pc JOIN mg ma ON pc.type_a = ma.event_type
        |JOIN mg mb ON pc.type_b = mb.event_type
        |CROSS JOIN nt
        |ORDER BY type_a, type_b""".stripMargin,

    // Replays Events.hampelOfDaily: densified calendar, two ceil-rank
    // picks (median, MAD), the integer 3*1.4826 cross-compare.
    "q220_hampel_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
        |dense AS (
        |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |h1 AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM dense GROUP BY 1, 2),
        |t1 AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_days
        |       FROM h1 GROUP BY 1),
        |m1 AS (
        |  SELECT c1.event_type,
        |    MIN(CASE WHEN cum * 2 >= n_days THEN cents END) AS med_cents
        |  FROM (SELECT event_type, cents, cnt,
        |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM h1) c1
        |  JOIN t1 USING (event_type) GROUP BY 1),
        |dev AS (
        |  SELECT dense.event_type, day, cents, med_cents,
        |    abs(cents - med_cents) AS adev
        |  FROM dense JOIN m1 USING (event_type)),
        |h2 AS (SELECT event_type, adev, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM dev GROUP BY 1, 2),
        |m2 AS (
        |  SELECT c2.event_type,
        |    MIN(CASE WHEN cum * 2 >= n_days THEN adev END) AS mad_cents
        |  FROM (SELECT event_type, adev, cnt,
        |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY adev
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM h2) c2
        |  JOIN t1 USING (event_type) GROUP BY 1)
        |SELECT dev.event_type, day, cents, med_cents, mad_cents,
        |  CAST(CASE WHEN adev::HUGEINT * 10000 > 44478::HUGEINT * mad_cents
        |    THEN CASE WHEN cents > med_cents THEN 1 ELSE -1 END
        |    ELSE 0 END AS BIGINT) AS outlier
        |FROM dev JOIN m2 USING (event_type)
        |ORDER BY 1, 2""".stripMargin,

    // Replays RankTests.ksTestOf: shared whole-dollar histogram, the
    // common-denominator CDF gap, one floor, the squared KS band.
    "q221_ks_test" ->
      s"""WITH src AS (
         |  SELECT o_orderpriority AS g,
         |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
         |      // 100 AS v
         |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         |h AS MATERIALIZED (
         |  SELECT v,
         |    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS ca0,
         |    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cb0
         |  FROM src GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ca0) AS BIGINT) AS n_a,
         |        CAST(SUM(cb0) AS BIGINT) AS n_b FROM h),
         |diffs AS (
         |  SELECT v,
         |    abs((SUM(ca0) OVER w)::HUGEINT * n_b
         |      - (SUM(cb0) OVER w)::HUGEINT * n_a) AS adiff,
         |    n_a, n_b
         |  FROM h CROSS JOIN tot
         |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW)),
         |dm AS (SELECT MAX(adiff) AS dmax FROM diffs),
         |pick AS (
         |  SELECT MIN(v) AS v_at_max, MAX(adiff) AS dm,
         |    MAX(n_a) AS n_a, MAX(n_b) AS n_b
         |  FROM diffs CROSS JOIN dm WHERE adiff = dmax),
         |calc AS (
         |  SELECT n_a, n_b,
         |    CAST(dm * 1000000 // nullif(n_a::HUGEINT * n_b, 0)
         |      AS BIGINT) AS d_ppm,
         |    v_at_max
         |  FROM pick)
         |SELECT n_a, n_b, d_ppm, v_at_max,
         |  CAST(${graft.ops.RankTests.KsCrit2Micro} AS BIGINT)
         |    AS crit2_micro,
         |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
         |    WHEN d_ppm::HUGEINT * d_ppm * n_a * n_b
         |      > ${graft.ops.RankTests.KsCrit2Micro}::HUGEINT
         |        * (n_a + n_b) * 1000000 THEN 1
         |    ELSE 0 END AS BIGINT) AS significant
         |FROM calc""".stripMargin,

    // Replays Events.captureRecaptureOf: per-user first/last vs the
    // integer midpoint, both estimators' single floors, signed error.
    "q222_capture_recapture" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS ts_sec FROM events),
        |b AS (SELECT MIN(ts_sec) AS mn, MAX(ts_sec) AS mx FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    CASE WHEN MIN(ts_sec) <= (mn + mx) // 2 THEN 1 ELSE 0 END
        |      AS in1,
        |    CASE WHEN MAX(ts_sec) > (mn + mx) // 2 THEN 1 ELSE 0 END
        |      AS in2
        |  FROM ev CROSS JOIN b GROUP BY user_id, mn, mx),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
        |    CAST(SUM(in1) AS BIGINT) AS n1,
        |    CAST(SUM(in2) AS BIGINT) AS n2,
        |    CAST(SUM(in1 * in2) AS BIGINT) AS m
        |  FROM pu),
        |est AS (
        |  SELECT n1, n2, m, n_true,
        |    CAST(n1::HUGEINT * n2 // nullif(m, 0) AS BIGINT) AS lp_est,
        |    CAST((n1 + 1)::HUGEINT * (n2 + 1) // (m + 1) - 1 AS BIGINT)
        |      AS chapman_est
        |  FROM agg)
        |SELECT n1, n2, m, n_true, lp_est, chapman_est,
        |  (chapman_est - n_true) * 1000000 // n_true AS chapman_err_ppm
        |FROM est""".stripMargin,

    // Replays Graph.aprioriLadderOf: in-basket k-way joins, per-level
    // count rollups, the survival ratio floor.
    "q223_apriori_ladder" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |s1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM li GROUP BY 1),
        |s2 AS (SELECT a.p, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
        |       GROUP BY 1, 2),
        |s3 AS (SELECT a.p, b.p AS p2, c.p AS p3,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |       FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
        |       JOIN li c ON b.k = c.k AND b.p < c.p
        |       GROUP BY 1, 2, 3),
        |u AS (
        |  SELECT CAST(1 AS BIGINT) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_itemsets,
        |    CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_frequent,
        |    CAST(MAX(n) AS BIGINT) AS max_support
        |  FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(n) AS BIGINT)
        |  FROM s2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(n) AS BIGINT)
        |  FROM s3)
        |SELECT k, n_itemsets, n_frequent, max_support,
        |  CAST(n_frequent * 1000000 // nullif(n_itemsets, 0) AS BIGINT)
        |    AS frequent_ppm
        |FROM u ORDER BY k""".stripMargin,

    // Replays Features.nbCalibrationOf: the q219 score CTEs, the
    // normalized-posterior confidence floor, 10%-band rollup, ECE.
    "q224_nb_calibration" ->
      s"""WITH $nbScoreCtes,
         |pred AS (
         |  SELECT nat, bsign, seg AS predicted, s_fp AS s_pred
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY nat, bsign
         |          ORDER BY s_fp DESC, seg ASC) AS rn FROM sc) z
         |  WHERE rn = 1),
         |tt AS (SELECT nat, bsign, CAST(SUM(s_fp) AS BIGINT) AS s_tot
         |       FROM sc GROUP BY 1, 2),
         |cc AS (
         |  SELECT pred.nat, pred.bsign, predicted,
         |    CAST(s_pred::HUGEINT * 1000000 // s_tot AS BIGINT)
         |      AS conf_ppm
         |  FROM pred JOIN tt USING (nat, bsign)),
         |bb AS (
         |  SELECT conf_ppm // 100000 AS band,
         |    CAST(SUM(n) AS BIGINT) AS n_rows,
         |    CAST(SUM(CASE WHEN cube.seg = predicted THEN n ELSE 0 END)
         |      AS BIGINT) AS n_correct,
         |    SUM(conf_ppm::HUGEINT * n) AS conf_mass
         |  FROM cube JOIN cc USING (nat, bsign)
         |  GROUP BY 1),
         |b2 AS (
         |  SELECT band, n_rows, n_correct,
         |    CAST(conf_mass // n_rows AS BIGINT) AS avg_conf_ppm,
         |    CAST(n_correct * 1000000 // n_rows AS BIGINT) AS acc_ppm
         |  FROM bb),
         |b3 AS (SELECT *, abs(acc_ppm - avg_conf_ppm) AS gap_ppm
         |       FROM b2),
         |ece AS (
         |  SELECT CAST(SUM(gap_ppm::HUGEINT * n_rows) // SUM(n_rows)
         |    AS BIGINT) AS ece_ppm FROM b3)
         |SELECT band, n_rows, n_correct, avg_conf_ppm, acc_ppm,
         |  gap_ppm, ece_ppm
         |FROM b3 CROSS JOIN ece ORDER BY band""".stripMargin,

    // Replays Features.classifierReportOf over the q219 confusion:
    // margins, per-class P/R/F1 floors, Cohen's kappa.
    "q225_classifier_report" ->
      s"""WITH $nbScoreCtes,
         |pred AS (
         |  SELECT nat, bsign, seg AS predicted
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY nat, bsign
         |          ORDER BY s_fp DESC, seg ASC) AS rn FROM sc) z
         |  WHERE rn = 1),
         |conf AS (
         |  SELECT cube.seg AS actual, predicted,
         |    CAST(SUM(cube.n) AS BIGINT) AS n
         |  FROM cube JOIN pred USING (nat, bsign) GROUP BY 1, 2),
         |ba AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_actual
         |       FROM conf GROUP BY 1),
         |bp AS (SELECT predicted AS cls,
         |         CAST(SUM(n) AS BIGINT) AS n_predicted
         |       FROM conf GROUP BY 1),
         |dg AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_correct
         |       FROM conf WHERE actual = predicted GROUP BY 1),
         |mg AS (
         |  SELECT COALESCE(ba.cls, bp.cls) AS cls,
         |    COALESCE(n_actual, 0) AS n_actual,
         |    COALESCE(n_predicted, 0) AS n_predicted
         |  FROM ba FULL OUTER JOIN bp ON ba.cls = bp.cls),
         |mg2 AS (
         |  SELECT mg.cls, n_actual, n_predicted,
         |    COALESCE(n_correct, 0) AS n_correct
         |  FROM mg LEFT JOIN dg ON mg.cls = dg.cls),
         |kp AS (
         |  SELECT CAST(SUM(n_actual) AS BIGINT) AS n_total,
         |    CAST(SUM(n_correct) AS BIGINT) AS n_diag,
         |    SUM(n_actual::HUGEINT * n_predicted) AS pe_mass
         |  FROM mg2),
         |kp2 AS (
         |  SELECT n_total,
         |    CAST(n_diag * 1000000 // n_total AS BIGINT) AS po_ppm,
         |    CAST(pe_mass * 1000000 // (n_total::HUGEINT * n_total)
         |      AS BIGINT) AS pe_ppm
         |  FROM kp),
         |kp3 AS (
         |  SELECT n_total, po_ppm, pe_ppm,
         |    CAST((po_ppm - pe_ppm)::HUGEINT * 1000000
         |      // nullif(1000000 - pe_ppm, 0) AS BIGINT) AS kappa_ppm
         |  FROM kp2),
         |pr AS (
         |  SELECT cls, n_actual, n_predicted, n_correct,
         |    CAST(n_correct * 1000000 // nullif(n_predicted, 0)
         |      AS BIGINT) AS precision_ppm,
         |    CAST(n_correct * 1000000 // nullif(n_actual, 0)
         |      AS BIGINT) AS recall_ppm
         |  FROM mg2)
         |SELECT cls, n_actual, n_predicted, n_correct, precision_ppm,
         |  recall_ppm,
         |  CAST(2 * precision_ppm::HUGEINT * recall_ppm
         |    // nullif(precision_ppm + recall_ppm, 0) AS BIGINT)
         |    AS f1_ppm,
         |  n_total, po_ppm, pe_ppm, kappa_ppm
         |FROM pr CROSS JOIN kp3 ORDER BY cls""".stripMargin,

    // Replays Relational.sourcingRiskOf: (part, supplier) revenue
    // collapse, per-part top-share floor, brand rollups + dim joins.
    "q226_sourcing_risk" ->
      """WITH ps AS MATERIALIZED (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |pp AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |    CAST(SUM(rev) AS BIGINT) AS part_rev,
        |    CAST(MAX(rev) AS BIGINT) AS top_rev
        |  FROM ps GROUP BY 1),
        |pp2 AS (
        |  SELECT *, CAST(top_rev::HUGEINT * 1000000 // part_rev
        |    AS BIGINT) AS top_share_ppm
        |  FROM pp),
        |bn AS (
        |  SELECT p_brand,
        |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |    CAST(COUNT(DISTINCT s_nationkey) AS BIGINT)
        |      AS n_supply_nations
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM ps) x
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |br AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |    CAST(SUM(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_single,
        |    CAST(SUM(CASE WHEN n_supp = 1 THEN part_rev ELSE 0 END)
        |      AS BIGINT) AS risk_cents,
        |    CAST(SUM(top_share_ppm) AS BIGINT) AS share_sum
        |  FROM part JOIN pp2 USING (p_partkey)
        |  GROUP BY 1)
        |SELECT br.p_brand, n_parts, n_single,
        |  n_single * 1000000 // n_parts AS single_ppm,
        |  risk_cents, n_suppliers, n_supply_nations,
        |  share_sum // n_parts AS mean_top_share_ppm
        |FROM br JOIN bn ON br.p_brand = bn.p_brand
        |ORDER BY br.p_brand""".stripMargin,

    // Replays Similarity.silhouetteOf: the q210 rounded-cosine
    // kernel to integer micro distances, per-point a/b means,
    // truncating silhouette, label rollup.
    "q227_cosine_silhouette" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label, v.vec_id,
        |    v.label,
        |    1000000 - CAST(round(round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      * 1000000) AS BIGINT) AS d
        |  FROM v CROSS JOIN v q WHERE v.vec_id <> q.vec_id),
        |g AS (
        |  SELECT q_id, q_label, label, CAST(SUM(d) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2, 3),
        |g2 AS (SELECT *, s // n AS m FROM g),
        |aa AS (SELECT q_id, m AS a FROM g2 WHERE label = q_label),
        |bb AS (SELECT q_id, q_label, MIN(m) AS b
        |       FROM g2 WHERE label <> q_label GROUP BY 1, 2),
        |sil AS (
        |  SELECT bb.q_id, q_label,
        |    CAST(CASE WHEN a IS NULL THEN 0
        |      WHEN greatest(a, b) = 0 THEN 0
        |      ELSE (b - a) * 1000000 // greatest(a, b) END AS BIGINT)
        |      AS sil
        |  FROM bb LEFT JOIN aa ON bb.q_id = aa.q_id),
        |ov AS (
        |  SELECT CAST(CAST(SUM(sil) AS BIGINT) // COUNT(*) AS BIGINT)
        |    AS overall_mean_micro FROM sil)
        |SELECT q_label AS label, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(CAST(SUM(sil) AS BIGINT) // COUNT(*) AS BIGINT)
        |    AS mean_sil_micro,
        |  CAST(MIN(sil) AS BIGINT) AS min_sil_micro,
        |  CAST(SUM(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_negative,
        |  overall_mean_micro
        |FROM sil CROSS JOIN ov
        |GROUP BY q_label, overall_mean_micro
        |ORDER BY label""".stripMargin,

    // Replays Relational.discountResponseOf: the five power sums,
    // HUGEINT cross-multiplied slope/intercept/R², nullif guards.
    "q228_discount_response" ->
      """WITH b AS (
        |  SELECT p_brand,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x,
        |    CAST(round(l_quantity) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM b GROUP BY 1),
        |d AS (
        |  SELECT *,
        |    n_lines::HUGEINT * sxx - sx::HUGEINT * sx AS dxx,
        |    n_lines::HUGEINT * syy - sy::HUGEINT * sy AS dyy,
        |    n_lines::HUGEINT * sxy - sx::HUGEINT * sy AS dxy
        |  FROM a)
        |SELECT p_brand, n_lines,
        |  CAST(dxy * 1000000 // nullif(dxx, 0) AS BIGINT) AS slope_ppm,
        |  CAST((sy::HUGEINT * sxx - sx::HUGEINT * sxy) * 1000
        |    // nullif(dxx, 0) AS BIGINT) AS intercept_milli,
        |  CAST(dxy * dxy * 1000000 // nullif(dxx * dyy, 0) AS BIGINT)
        |    AS r2_ppm
        |FROM d ORDER BY p_brand""".stripMargin,

    // Replays TextOps.vocabRichnessOf: the q14 token kernel, the
    // frequency-of-frequencies fold, bias-corrected Chao1 and
    // Good-Turing unseen mass, one floor each.
    "q229_vocab_richness" ->
      """WITH t AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text),
        |    '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, vocab, f1, f2,
        |  vocab * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
        |    AS chao1_milli,
        |  f1 * 1000000 // n_tokens AS gt_unseen_ppm
        |FROM a ORDER BY source""".stripMargin,

    // Replays RankTests.kendallTauOfDaily: the calendar-bounded day
    // pair join, concordant/discordant CASE, equal-value tie pairs,
    // tau-a and the signed HUGEINT tau-b-squared.
    "q230_kendall_tau" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n0,
        |    CAST(SUM(CASE
        |      WHEN (b.x > a.x AND b.y > a.y)
        |        OR (b.x < a.x AND b.y < a.y) THEN 1
        |      WHEN (b.x > a.x AND b.y < a.y)
        |        OR (b.x < a.x AND b.y > a.y) THEN -1
        |      ELSE 0 END) AS BIGINT) AS nc_nd,
        |    CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tx_pairs,
        |    CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ty_pairs
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |n AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT n.event_type, n_days,
        |  coalesce(n0, 0) AS n0, coalesce(nc_nd, 0) AS nc_nd,
        |  coalesce(tx_pairs, 0) AS tx_pairs,
        |  coalesce(ty_pairs, 0) AS ty_pairs,
        |  CAST(coalesce(nc_nd, 0) * 1000000
        |    // nullif(coalesce(n0, 0), 0) AS BIGINT) AS tau_a_ppm,
        |  CAST((CASE WHEN coalesce(nc_nd, 0) < 0 THEN -1 ELSE 1 END)
        |    * coalesce(nc_nd, 0)::HUGEINT * coalesce(nc_nd, 0)
        |    * 1000000
        |    // nullif((coalesce(n0, 0) - coalesce(tx_pairs, 0))::HUGEINT
        |      * (coalesce(n0, 0) - coalesce(ty_pairs, 0)), 0)
        |    AS BIGINT) AS taub2_signed_ppm
        |FROM n LEFT JOIN p ON n.event_type = p.event_type
        |ORDER BY n.event_type""".stripMargin,

    // Replays RankTests.pettittOfDaily: per-day full sign sums, the
    // cumulative U_t, smallest-day argmax tie rule, level means, and
    // the cross-multiplied ln(40) significance bound.
    "q231_pettitt_changepoint" -> {
      val c = graft.ops.RankTests.PettittLn40Micro
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
         |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100
         |      AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |v AS (
         |  SELECT a.event_type AS event_type, a.day AS day,
         |    CAST(SUM(CASE WHEN a.x > b.x THEN 1
         |                  WHEN a.x < b.x THEN -1
         |                  ELSE 0 END) AS BIGINT) AS vt
         |  FROM daily a JOIN daily b ON a.event_type = b.event_type
         |  GROUP BY 1, 2),
         |u AS (
         |  SELECT event_type, day,
         |    CAST(SUM(vt) OVER (PARTITION BY event_type ORDER BY day)
         |      AS BIGINT) AS ut,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day)
         |      AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS nd
         |  FROM v),
         |best AS (
         |  SELECT event_type, day AS cp_day, ut AS u_at_cp,
         |    abs(ut) AS k_stat
         |  FROM u WHERE rn < nd
         |  QUALIFY row_number() OVER (PARTITION BY event_type
         |    ORDER BY abs(ut) DESC, day ASC) = 1),
         |lv AS (
         |  SELECT daily.event_type,
         |    CAST(SUM(CASE WHEN day <= cp_day THEN x END) AS BIGINT)
         |      // CAST(SUM(CASE WHEN day <= cp_day THEN 1 END)
         |         AS BIGINT) AS mean_before_cents,
         |    CAST(SUM(CASE WHEN day > cp_day THEN x END) AS BIGINT)
         |      // CAST(SUM(CASE WHEN day > cp_day THEN 1 END)
         |         AS BIGINT) AS mean_after_cents
         |  FROM daily JOIN best ON daily.event_type = best.event_type
         |  GROUP BY 1),
         |n AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
         |  FROM daily GROUP BY 1)
         |SELECT n.event_type, n_days, cp_day, u_at_cp, k_stat,
         |  mean_before_cents, mean_after_cents,
         |  CASE WHEN k_stat IS NULL THEN CAST(NULL AS BIGINT)
         |       WHEN 6::HUGEINT * k_stat * k_stat * 1000000
         |          > $c::HUGEINT
         |            * (n_days::HUGEINT * n_days * n_days
         |               + n_days::HUGEINT * n_days)
         |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
         |  END AS significant
         |FROM n LEFT JOIN best ON n.event_type = best.event_type
         |LEFT JOIN lv ON n.event_type = lv.event_type
         |ORDER BY n.event_type""".stripMargin
    },

    // Replays RankTests.runsTestOfDaily: tie-dropped direction signs,
    // lag-windowed run starts, and the cross-multiplied z-test.
    "q232_runs_test" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, day, x,
        |    lag(x) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM daily),
        |sg AS (
        |  SELECT event_type, day,
        |    CASE WHEN x > prev THEN 1 ELSE -1 END AS s
        |  FROM st WHERE prev IS NOT NULL AND x <> prev),
        |rn AS (
        |  SELECT event_type, s,
        |    lag(s) OVER (PARTITION BY event_type ORDER BY day)
        |      AS prevs
        |  FROM sg),
        |ag AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_steps,
        |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_up,
        |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_down,
        |    CAST(SUM(CASE WHEN prevs IS NULL OR s <> prevs
        |      THEN 1 ELSE 0 END) AS BIGINT) AS runs
        |  FROM rn GROUP BY 1),
        |n AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT n.event_type, n_days,
        |    coalesce(n_steps, 0) AS n_steps,
        |    coalesce(n_up, 0) AS n_up, coalesce(n_down, 0) AS n_down,
        |    coalesce(runs, 0) AS runs
        |  FROM n LEFT JOIN ag ON n.event_type = ag.event_type)
        |SELECT event_type, n_days, n_steps, n_up, n_down, runs,
        |  n_steps * (runs - 1) - 2 * n_up * n_down AS a_stat,
        |  CASE
        |    WHEN n_steps < 2
        |      OR 2::HUGEINT * n_up * n_down
        |         * (2 * n_up * n_down - n_steps) <= 0
        |    THEN CAST(NULL AS BIGINT)
        |    WHEN (n_steps * (runs - 1) - 2 * n_up * n_down)::HUGEINT
        |         * (n_steps * (runs - 1) - 2 * n_up * n_down)
        |         * (n_steps - 1) * 10000
        |       > 38416::HUGEINT * 2 * n_up * n_down
        |         * (2 * n_up * n_down - n_steps)
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        |  END AS significant
        |FROM f ORDER BY event_type""".stripMargin,

    // Replays Graph.linkPredictionOf: canonical co-purchase edges,
    // wedge counting through the shared neighbor, anti-join of
    // existing edges, Jaccard normalization, deterministic top-k.
    "q233_link_prediction" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |deg AS (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e) x
        |  GROUP BY 1),
        |adj AS (
        |  SELECT u AS w, v AS nbr FROM e
        |  UNION ALL SELECT v AS w, u AS nbr FROM e),
        |wg AS (
        |  SELECT a.nbr AS u, b.nbr AS v, CAST(COUNT(*) AS BIGINT)
        |    AS cn
        |  FROM adj a JOIN adj b ON a.w = b.w AND a.nbr < b.nbr
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT wg.* FROM wg ANTI JOIN e
        |    ON wg.u = e.u AND wg.v = e.v)
        |SELECT cand.u, cand.v, cn,
        |  du.deg AS deg_u, dv.deg AS deg_v,
        |  cn * 1000000 // (du.deg + dv.deg - cn) AS jaccard_ppm
        |FROM cand JOIN deg du ON cand.u = du.id
        |JOIN deg dv ON cand.v = dv.id
        |ORDER BY jaccard_ppm DESC, cn DESC, cand.u ASC, cand.v ASC
        |LIMIT 20""".stripMargin,

    // Replays Graph.linkPredictionCappedOf: q233's chain with each
    // node's adjacency truncated to its top-`LinkPredCap` neighbors
    // by (deg DESC, id ASC) before the wedge join; TRUE degrees in
    // the Jaccard denominator.
    "q251_link_prediction_capped" ->
      s"""WITH li AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p),
        |deg AS MATERIALIZED (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e) x
        |  GROUP BY 1),
        |adj AS (
        |  SELECT u AS w, v AS nbr FROM e
        |  UNION ALL SELECT v AS w, u AS nbr FROM e),
        |capped AS MATERIALIZED (
        |  SELECT w, nbr FROM (
        |    SELECT a.w, a.nbr,
        |      row_number() OVER (PARTITION BY a.w
        |        ORDER BY d.deg DESC, a.nbr ASC) AS rk
        |    FROM adj a JOIN deg d ON a.nbr = d.id) r
        |  WHERE rk <= $LinkPredCap),
        |wg AS (
        |  SELECT a.nbr AS u, b.nbr AS v, CAST(COUNT(*) AS BIGINT)
        |    AS cn
        |  FROM capped a JOIN capped b ON a.w = b.w AND a.nbr < b.nbr
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT wg.* FROM wg ANTI JOIN e
        |    ON wg.u = e.u AND wg.v = e.v)
        |SELECT cand.u, cand.v, cn,
        |  du.deg AS deg_u, dv.deg AS deg_v,
        |  cn * 1000000 // (du.deg + dv.deg - cn) AS jaccard_ppm
        |FROM cand JOIN deg du ON cand.u = du.id
        |JOIN deg dv ON cand.v = dv.id
        |ORDER BY jaccard_ppm DESC, cn DESC, cand.u ASC, cand.v ASC
        |LIMIT 20""".stripMargin,

    // Replays Transforms.tracks + audioFeatures + mergeTracksFeatures
    // (transform.py:75-115,156-165) over the committed fixture: the
    // nested explodes, per-element "Unknown Artist" default, explicit
    // default, null-feature-entry filter, left join, suffix-drop.
    "q252_spotify_flatten" ->
      s"""WITH raw AS (SELECT * FROM '$SpotifyFixture'),
        |rel AS (SELECT unnest(releases) AS a FROM raw),
        |tr AS (
        |  SELECT struct_extract(a, 'album_id') AS album_id,
        |    unnest(struct_extract(a, 'tracks')) AS t
        |  FROM rel),
        |tracks AS (
        |  SELECT struct_extract(t, 'id') AS track_id,
        |    struct_extract(t, 'name') AS track_name, album_id,
        |    coalesce(array_to_string(list_transform(
        |      struct_extract(t, 'artists'),
        |      x -> coalesce(struct_extract(x, 'name'),
        |        'Unknown Artist')), ', '), '') AS artists,
        |    struct_extract(t, 'track_number') AS track_number,
        |    struct_extract(t, 'duration_ms') AS duration_ms,
        |    coalesce(struct_extract(t, 'explicit'), false) AS explicit,
        |    struct_extract(struct_extract(t, 'external_urls'),
        |      'spotify') AS spotify_url,
        |    '$FixtureDate' AS extraction_date
        |  FROM tr),
        |feats AS (
        |  SELECT struct_extract(f, 'id') AS track_id,
        |    struct_extract(f, 'danceability') AS danceability,
        |    struct_extract(f, 'energy') AS energy,
        |    struct_extract(f, 'loudness') AS loudness,
        |    struct_extract(f, 'tempo') AS tempo
        |  FROM (SELECT unnest(audio_features) AS f FROM raw)
        |  WHERE f IS NOT NULL)
        |SELECT t.*, f.danceability, f.energy, f.loudness, f.tempo
        |FROM tracks t LEFT JOIN feats f USING (track_id)
        |ORDER BY track_id""".stripMargin,

    // Replays Transforms.albums (transform.py:38-68): the 12-column
    // flatten with the artists[0]-null, popularity-0, and genres-""
    // defaults.
    "q253_spotify_albums" ->
      s"""WITH raw AS (SELECT * FROM '$SpotifyFixture'),
        |rel AS (SELECT unnest(releases) AS a FROM raw)
        |SELECT struct_extract(a, 'album_id') AS album_id,
        |  struct_extract(a, 'album_name') AS album_name,
        |  struct_extract(a, 'album_type') AS album_type,
        |  struct_extract(a, 'release_date') AS release_date,
        |  struct_extract(a, 'total_tracks') AS total_tracks,
        |  coalesce(struct_extract(a, 'popularity'), 0) AS popularity,
        |  struct_extract(struct_extract(a, 'artists')[1], 'id')
        |    AS main_artist_id,
        |  struct_extract(struct_extract(a, 'artists')[1], 'name')
        |    AS main_artist_name,
        |  coalesce(array_to_string(struct_extract(
        |    struct_extract(a, 'main_artist_details'), 'genres'),
        |    ', '), '') AS artist_genres,
        |  struct_extract(a, 'image_url') AS image_url,
        |  struct_extract(a, 'spotify_url') AS spotify_url,
        |  '$FixtureDate' AS extraction_date
        |FROM rel ORDER BY album_id""".stripMargin,

    // Replays RankTests.laggedSpearmanOf: the q234/q215 daily-cents
    // matrix densified over the calendar, the lag via the day-key
    // equi-join, q218's doubled-midrank/milli-mean/HUGEINT-moment
    // chain PER (pair, lag) group, and the pinned peak pick.
    "q254_lagged_spearman" ->
      s"""WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |dense AS MATERIALIZED (
        |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
        |  FROM types t CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |lags AS (SELECT CAST(unnest(generate_series(
        |  -$LaggedSpearmanMaxLag, $LaggedSpearmanMaxLag)) AS BIGINT)
        |  AS lag),
        |grid AS MATERIALIZED (
        |  SELECT p.ta, p.tb, l.lag, a.day, a.cents AS x, bb.cents AS y
        |  FROM (SELECT a.event_type AS ta, b.event_type AS tb
        |        FROM types a JOIN types b
        |        ON a.event_type < b.event_type) p
        |  CROSS JOIN lags l
        |  JOIN dense a ON a.event_type = p.ta
        |  JOIN dense bb ON bb.event_type = p.tb
        |    AND bb.day = a.day + l.lag),
        |hx AS (SELECT ta, tb, lag, x AS v,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY 1, 2, 3, 4),
        |rx AS (SELECT ta, tb, lag, v,
        |    2 * (SUM(cnt) OVER (PARTITION BY ta, tb, lag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |    + cnt + 1 AS mr2 FROM hx),
        |hy AS (SELECT ta, tb, lag, y AS v,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY 1, 2, 3, 4),
        |ry AS (SELECT ta, tb, lag, v,
        |    2 * (SUM(cnt) OVER (PARTITION BY ta, tb, lag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |    + cnt + 1 AS mr2 FROM hy),
        |ranked AS MATERIALIZED (
        |  SELECT g.ta, g.tb, g.lag, rx.mr2 AS rx2, ry.mr2 AS ry2
        |  FROM grid g
        |  JOIN rx ON rx.ta = g.ta AND rx.tb = g.tb
        |    AND rx.lag = g.lag AND rx.v = g.x
        |  JOIN ry ON ry.ta = g.ta AND ry.tb = g.tb
        |    AND ry.lag = g.lag AND ry.v = g.y),
        |p1 AS (
        |  SELECT ta, tb, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(rx2)::HUGEINT * 1000 // COUNT(*) AS mx,
        |    SUM(ry2)::HUGEINT * 1000 // COUNT(*) AS my
        |  FROM ranked GROUP BY 1, 2, 3),
        |p2 AS (
        |  SELECT r.ta, r.tb, r.lag, MAX(n) AS n,
        |    SUM((rx2 * 1000 - mx)::HUGEINT * (ry2 * 1000 - my))
        |      AS covS,
        |    SUM((rx2 * 1000 - mx)::HUGEINT * (rx2 * 1000 - mx))
        |      AS vxS,
        |    SUM((ry2 * 1000 - my)::HUGEINT * (ry2 * 1000 - my))
        |      AS vyS
        |  FROM ranked r JOIN p1 ON p1.ta = r.ta AND p1.tb = r.tb
        |    AND p1.lag = r.lag
        |  GROUP BY 1, 2, 3),
        |p3 AS (
        |  SELECT ta, tb, lag, n, covS // n AS covM, vxS // n AS vxM,
        |    vyS // n AS vyM
        |  FROM p2),
        |p4 AS (
        |  SELECT ta, tb, lag, n,
        |    CAST(CASE WHEN covM > 0 THEN 1 WHEN covM < 0 THEN -1
        |      ELSE 0 END AS BIGINT) AS rho_sign,
        |    CAST(covM * covM * 1000000 // nullif(vxM * vyM, 0)
        |      AS BIGINT) AS rho2_ppm
        |  FROM p3)
        |SELECT ta, tb, lag, n, rho_sign, rho2_ppm,
        |  rho2_ppm * (n - 1) AS z2_micro,
        |  CAST(CASE WHEN rho2_ppm IS NULL THEN NULL
        |    WHEN rho2_ppm * (n - 1) >
        |      ${graft.ops.Events.Chi2Crit95Ppm.head} THEN 1
        |    ELSE 0 END AS BIGINT) AS significant,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY ta, tb
        |      ORDER BY coalesce(rho2_ppm, -1) DESC, lag ASC) = 1
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_peak
        |FROM p4
        |ORDER BY ta, tb, lag""".stripMargin,

    // Replays Similarity.truncatedRecall: the q21 cosine kernel on
    // the first-m prefix (slice BEFORE the norms), round-6, vec_id
    // tie-break, recall@k of each arm against the m=64 exact arm.
    "q255_truncated_recall" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 8),
        |ms AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS m),
        |p AS MATERIALIZED (
        |  SELECT ms.m, q.q_id, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, CAST(ms.m AS INT) + 1),
        |        i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe[1:CAST(ms.m AS INT)],
        |         x -> x * x))) *
        |       sqrt(list_sum(list_transform(e[1:CAST(ms.m AS INT)],
        |         x -> x * x)))), 6) AS cos
        |  FROM v CROSS JOIN q CROSS JOIN ms
        |  WHERE v.vec_id <> q.q_id),
        |r AS MATERIALIZED (
        |  SELECT m, q_id, vec_id FROM (
        |    SELECT m, q_id, vec_id,
        |      row_number() OVER (PARTITION BY m, q_id
        |        ORDER BY cos DESC, vec_id ASC) AS rn
        |    FROM p) x WHERE rn <= 5),
        |ex AS (SELECT q_id, vec_id FROM r WHERE m = 64),
        |rec AS (
        |  SELECT r.m,
        |    CAST(COUNT(DISTINCT r.q_id) AS BIGINT) AS n_probes,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_hits
        |  FROM r LEFT JOIN ex ON r.q_id = ex.q_id
        |    AND r.vec_id = ex.vec_id
        |  GROUP BY 1)
        |SELECT 'm' || lpad(CAST(m AS VARCHAR), 2, '0') AS dims, m,
        |  n_probes, n_pairs, n_hits,
        |  n_hits * 1000000 // n_pairs AS recall_ppm
        |FROM rec ORDER BY m""".stripMargin,

    // Replays RankTests.friedmanOf: per-(month, priority) cells,
    // complete blocks only, within-block doubled midranks, the
    // quarter-cancelled tie-general statistic in HUGEINT.
    "q256_friedman" ->
      s"""WITH obs AS (
        |  SELECT substring(CAST(o_orderdate AS VARCHAR), 1, 7)
        |      AS block,
        |    o_orderpriority AS treatment,
        |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT) AS v
        |  FROM orders),
        |cells AS MATERIALIZED (
        |  SELECT block, treatment, CAST(SUM(v) AS BIGINT) AS v
        |  FROM obs GROUP BY 1, 2),
        |kk AS (
        |  SELECT CAST(COUNT(DISTINCT treatment) AS BIGINT) AS k,
        |    CAST(COUNT(DISTINCT block) AS BIGINT) AS n_blocks_total
        |  FROM cells),
        |complete AS MATERIALIZED (
        |  SELECT c.block, c.treatment, c.v, kk.k, kk.n_blocks_total
        |  FROM cells c CROSS JOIN kk
        |  QUALIFY COUNT(*) OVER (PARTITION BY c.block) = kk.k),
        |h AS (
        |  SELECT block, v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM complete GROUP BY 1, 2),
        |mr AS (
        |  SELECT block, v,
        |    2 * (SUM(cnt) OVER (PARTITION BY block ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |    + cnt + 1 AS mr2
        |  FROM h),
        |ranked AS MATERIALIZED (
        |  SELECT c.treatment, c.k, c.n_blocks_total, mr.mr2
        |  FROM complete c JOIN mr ON mr.block = c.block
        |    AND mr.v = c.v),
        |pert AS MATERIALIZED (
        |  SELECT treatment, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    SUM(mr2)::HUGEINT AS s2, MAX(k) AS k,
        |    MAX(n_blocks_total) AS n_blocks_total
        |  FROM ranked GROUP BY 1),
        |gsq AS (SELECT SUM(mr2::HUGEINT * mr2) AS sum_sq
        |  FROM ranked),
        |mom AS (
        |  SELECT MAX(k) AS k, MAX(n_blocks) AS n,
        |    SUM((s2 - n_blocks * (k + 1))::HUGEINT
        |      * (s2 - n_blocks * (k + 1))) AS dev_sq,
        |    MAX(sum_sq) AS sum_sq
        |  FROM pert CROSS JOIN gsq),
        |stat AS (
        |  SELECT
        |    CAST((k - 1) * dev_sq * 1000000
        |      // nullif(sum_sq - n::HUGEINT * k * (k + 1) * (k + 1),
        |        0) AS BIGINT) AS stat_micro,
        |    CAST(([${graft.ops.Events.Chi2Crit95Ppm.mkString(",")}])
        |      [CAST(k - 1 AS INT)] AS BIGINT) AS crit_micro
        |  FROM mom)
        |SELECT treatment, n_blocks, n_blocks_total,
        |  CAST(s2 AS BIGINT) AS rank_sum2,
        |  CAST(s2 * 1000 // (2 * n_blocks) AS BIGINT)
        |    AS mean_rank_milli,
        |  k - 1 AS df_chi2, stat_micro, crit_micro,
        |  CAST(CASE WHEN stat_micro IS NULL OR crit_micro IS NULL
        |      THEN NULL
        |    WHEN stat_micro > crit_micro THEN 1 ELSE 0 END
        |    AS BIGINT) AS significant
        |FROM pert CROSS JOIN stat
        |ORDER BY treatment""".stripMargin,

    // Replays Similarity.knnHubnessSampled: the q210 chain over the
    // deterministic Knuth-hash ~25% sample (ids are non-negative, so
    // plain % equals pmod).
    "q257_hubness_sampled" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        |  WHERE (vec_id * 2654435761) % 4294967296 < 1073741824),
        |p AS (
        |  SELECT q.vec_id AS q_id, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cos
        |  FROM v CROSS JOIN v q
        |  WHERE v.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p),
        |occ AS (
        |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_k
        |  FROM r WHERE rn <= 5 GROUP BY 1),
        |pv AS (
        |  SELECT v.vec_id, COALESCE(occ.n_k, 0) AS n_k
        |  FROM v LEFT JOIN occ ON v.vec_id = occ.vec_id),
        |s1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(CASE WHEN n_k = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphans,
        |    CAST(MAX(n_k) AS BIGINT) AS max_nk
        |  FROM pv),
        |hub AS (
        |  SELECT CAST(MIN(pv.vec_id) AS BIGINT) AS hub_id
        |  FROM pv CROSS JOIN s1 WHERE pv.n_k = s1.max_nk),
        |summ AS (
        |  SELECT n_vecs, n_orphans * 1000000 // n_vecs AS orphan_ppm,
        |    max_nk, hub_id
        |  FROM s1 CROSS JOIN hub)
        |SELECT pv.n_k, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  summ.n_vecs, CAST(summ.orphan_ppm AS BIGINT) AS orphan_ppm,
        |  summ.max_nk, summ.hub_id
        |FROM pv CROSS JOIN summ
        |GROUP BY 1, 3, 4, 5, 6
        |ORDER BY 1""".stripMargin,

    // Replays Similarity.labelNoiseOf on the q257 hash sample: q21's
    // ranking with labels, per-point disagreement counts, per-label
    // rollup with the corpus totals repeated.
    "q265_label_noise" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e
        |  FROM embeddings
        |  WHERE (vec_id * 2654435761) % 4294967296 < 1073741824),
        |p AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    v.vec_id, v.label,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cos
        |  FROM v CROSS JOIN v q
        |  WHERE v.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id, q_label, label,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p),
        |per AS MATERIALIZED (
        |  SELECT q_id, q_label,
        |    CAST(SUM(CASE WHEN label <> q_label THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_diff
        |  FROM r WHERE rn <= 5 GROUP BY 1, 2),
        |g AS (
        |  SELECT CAST(SUM(CASE WHEN n_diff = 5 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS total_suspects,
        |    CAST(SUM(n_diff) * 1000000 // (COUNT(*) * 5) AS BIGINT)
        |      AS overall_disagree_ppm
        |  FROM per)
        |SELECT q_label AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(n_diff) AS BIGINT) AS sum_diff,
        |  CAST(SUM(n_diff) * 1000000 // (COUNT(*) * 5) AS BIGINT)
        |    AS disagree_ppm,
        |  CAST(SUM(CASE WHEN n_diff = 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_suspects,
        |  g.total_suspects, g.overall_disagree_ppm
        |FROM per CROSS JOIN g
        |GROUP BY 1, 6, 7
        |ORDER BY 1""".stripMargin,

    // Replays Similarity.ndcgAtK: the q21 cosine ranking with labels,
    // gains from the PINNED DcgWeightMicro table, ideal = first
    // min(R, k) weights, per-probe nDCG + the floored corpus mean.
    "q258_ndcg" ->
      s"""WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, label AS q_label, e AS qe
        |  FROM v WHERE vec_id < 8),
        |p AS (
        |  SELECT q.q_id, q.q_label, v.vec_id, v.label AS d_label,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1),
        |        i -> qe[i] * e[i])) /
        |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6)
        |      AS cos
        |  FROM v CROSS JOIN q
        |  WHERE v.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, q_label, d_label,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p),
        |g AS (
        |  SELECT q_id, q_label,
        |    CAST(SUM(CASE WHEN d_label = q_label
        |      THEN ([${graft.ops.Similarity.DcgWeightMicro
                       .mkString(",")}])[CAST(rn AS INT)]
        |      ELSE 0 END) AS BIGINT) AS dcg_micro
        |  FROM r WHERE rn <= 10 GROUP BY 1, 2),
        |lc AS (
        |  SELECT label AS q_label, CAST(COUNT(*) AS BIGINT) AS n_label
        |  FROM v GROUP BY 1),
        |pp AS MATERIALIZED (
        |  SELECT g.q_id, g.q_label, g.dcg_micro,
        |    lc.n_label - 1 AS n_rel,
        |    CAST(COALESCE(list_sum(
        |      ([${graft.ops.Similarity.DcgWeightMicro.mkString(",")}])
        |        [1:CAST(least(lc.n_label - 1, 10) AS INT)]), 0)
        |      AS BIGINT) AS idcg_micro
        |  FROM g JOIN lc ON g.q_label = lc.q_label),
        |mn AS (
        |  SELECT CAST(SUM(CASE WHEN n_rel > 0
        |        THEN dcg_micro * 1000000 // idcg_micro END) //
        |      nullif(SUM(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS mean_ndcg_ppm
        |  FROM pp)
        |SELECT q_id, q_label, CAST(10 AS BIGINT) AS k, n_rel,
        |  dcg_micro, idcg_micro,
        |  CAST(dcg_micro * 1000000 // nullif(idcg_micro, 0)
        |    AS BIGINT) AS ndcg_ppm,
        |  mn.mean_ndcg_ppm
        |FROM pp CROSS JOIN mn
        |ORDER BY q_id""".stripMargin,

    // Replays RankTests.pageTrendOf: the q256 blocked-midrank chain,
    // then L2 = sum(c_pos * S2) and the exact rational z² in HUGEINT.
    "q259_page_trend" ->
      s"""WITH obs AS (
        |  SELECT substring(CAST(o_orderdate AS VARCHAR), 1, 7)
        |      AS block,
        |    o_orderpriority AS treatment,
        |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT) AS v
        |  FROM orders),
        |cells AS MATERIALIZED (
        |  SELECT block, treatment, CAST(SUM(v) AS BIGINT) AS v
        |  FROM obs GROUP BY 1, 2),
        |kk AS (
        |  SELECT CAST(COUNT(DISTINCT treatment) AS BIGINT) AS k,
        |    CAST(COUNT(DISTINCT block) AS BIGINT) AS n_blocks_total
        |  FROM cells),
        |complete AS MATERIALIZED (
        |  SELECT c.block, c.treatment, c.v, kk.k, kk.n_blocks_total
        |  FROM cells c CROSS JOIN kk
        |  QUALIFY COUNT(*) OVER (PARTITION BY c.block) = kk.k),
        |h AS (
        |  SELECT block, v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM complete GROUP BY 1, 2),
        |mr AS (
        |  SELECT block, v,
        |    2 * (SUM(cnt) OVER (PARTITION BY block ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |    + cnt + 1 AS mr2
        |  FROM h),
        |ranked AS MATERIALIZED (
        |  SELECT c.treatment, c.k, c.n_blocks_total, mr.mr2
        |  FROM complete c JOIN mr ON mr.block = c.block
        |    AND mr.v = c.v),
        |pert AS MATERIALIZED (
        |  SELECT treatment, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    SUM(mr2)::HUGEINT AS s2, MAX(k) AS k,
        |    MAX(n_blocks_total) AS n_blocks_total,
        |    CAST(row_number() OVER (ORDER BY treatment ASC)
        |      AS BIGINT) AS c_pos
        |  FROM ranked GROUP BY 1),
        |mom AS (
        |  SELECT MAX(k) AS k, MAX(n_blocks) AS n,
        |    SUM(c_pos::HUGEINT * s2) AS l2
        |  FROM pert),
        |stat AS (
        |  SELECT CAST(l2 AS BIGINT) AS l2,
        |    CAST(CASE WHEN 2 * l2 - n::HUGEINT * k * (k + 1) * (k + 1)
        |        > 0 THEN 1
        |      WHEN 2 * l2 - n::HUGEINT * k * (k + 1) * (k + 1) < 0
        |        THEN -1 ELSE 0 END AS BIGINT) AS trend_sign,
        |    CAST(9 * (2 * l2 - n::HUGEINT * k * (k + 1) * (k + 1))
        |        * (2 * l2 - n::HUGEINT * k * (k + 1) * (k + 1))
        |        * 1000000
        |      // nullif(n::HUGEINT * k * k * (k * k - 1) * (k + 1), 0)
        |      AS BIGINT) AS z2_micro
        |  FROM mom)
        |SELECT treatment, c_pos, n_blocks, n_blocks_total,
        |  CAST(s2 AS BIGINT) AS rank_sum2, stat.l2, stat.trend_sign,
        |  stat.z2_micro,
        |  CAST(${graft.ops.Events.Chi2Crit95Ppm.head} AS BIGINT)
        |    AS crit_micro,
        |  CAST(CASE WHEN stat.z2_micro IS NULL THEN NULL
        |    WHEN stat.z2_micro > ${graft.ops.Events.Chi2Crit95Ppm.head}
        |      THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM pert CROSS JOIN stat
        |ORDER BY treatment""".stripMargin,

    // Replays RankTests.cliffsDeltaOf: merged whole-dollar histogram,
    // one domain-bounded window, three HUGEINT pair sums, pinned
    // Romano magnitude bands.
    "q260_cliffs_delta" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT) // 100 AS v
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |hist AS MATERIALIZED (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |  CAST(SUM(cb) AS BIGINT) AS n_b FROM hist),
        |cum AS (
        |  SELECT v, ca, cb,
        |    SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_cb
        |  FROM hist),
        |s AS (
        |  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |    SUM(ca::HUGEINT * (cum_cb - cb)) AS gtS,
        |    SUM(ca::HUGEINT * (n_b - cum_cb)) AS ltS,
        |    SUM(ca::HUGEINT * cb) AS tieS
        |  FROM cum CROSS JOIN tot),
        |o AS (
        |  SELECT '1-URGENT' AS grp_a, '5-LOW' AS grp_b, n_a, n_b,
        |    CAST(gtS AS BIGINT) AS n_gt, CAST(ltS AS BIGINT) AS n_lt,
        |    CAST(tieS AS BIGINT) AS n_tie,
        |    CAST((gtS - ltS) * 1000000
        |      // nullif(n_a::HUGEINT * n_b, 0) AS BIGINT) AS delta_ppm
        |  FROM s)
        |SELECT o.*,
        |  CASE WHEN delta_ppm IS NULL THEN NULL
        |    WHEN abs(delta_ppm) < 147000 THEN 'negligible'
        |    WHEN abs(delta_ppm) < 330000 THEN 'small'
        |    WHEN abs(delta_ppm) < 474000 THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM o""".stripMargin,

    // Replays TextOps.sourceDivergenceOf: the q14 token kernel, the
    // vocab-union pair grid, per-token HUGEINT D^2 terms, final div.
    "q236_source_divergence" ->
      """WITH t AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text),
        |    '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |tot AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n
        |  FROM c GROUP BY 1),
        |toks AS (SELECT DISTINCT token FROM c),
        |pairs AS (
        |  SELECT a.source AS source_a, a.n AS n_a,
        |    b.source AS source_b, b.n AS n_b
        |  FROM tot a JOIN tot b ON a.source < b.source),
        |grid AS (
        |  SELECT p.*, toks.token,
        |    coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
        |  FROM pairs p CROSS JOIN toks
        |  LEFT JOIN c ca ON ca.token = toks.token
        |    AND ca.source = p.source_a
        |  LEFT JOIN c cb ON cb.token = toks.token
        |    AND cb.source = p.source_b),
        |terms AS (
        |  SELECT source_a, source_b, n_a, n_b,
        |    (ca::HUGEINT * n_b - cb::HUGEINT * n_a)
        |      * (ca::HUGEINT * n_b - cb::HUGEINT * n_a)
        |      * 1000000 // (ca + cb) AS term2
        |  FROM grid WHERE ca + cb > 0)
        |SELECT source_a, source_b, n_a, n_b,
        |  CAST(COUNT(*) AS BIGINT) AS vocab_union,
        |  CAST(SUM(term2) // (n_a::HUGEINT * n_b) AS BIGINT)
        |    AS chi2_micro
        |FROM terms GROUP BY 1, 2, 3, 4
        |ORDER BY source_a, source_b""".stripMargin,

    // Replays Events.loadProfileOf: the 24-bucket hour histogram,
    // smallest-hour peak tie rule, fixed-denominator peak-to-mean,
    // hour HHI and night share.
    "q237_load_profile" ->
      """WITH h AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 1000000 // 3600) % 24 AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |pk AS (
        |  SELECT event_type, hour AS peak_hour, n AS peak_n
        |  FROM h
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |    ORDER BY n DESC, hour ASC) = 1),
        |ag AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
        |    SUM(n::HUGEINT * n) AS sq,
        |    CAST(SUM(CASE WHEN hour < 6 THEN n ELSE 0 END) AS BIGINT)
        |      AS n_night
        |  FROM h GROUP BY 1)
        |SELECT ag.event_type, n_events, peak_hour, peak_n,
        |  peak_n * 24 * 1000 // n_events AS peak_to_mean_milli,
        |  CAST(sq * 1000000 // (n_events::HUGEINT * n_events)
        |    AS BIGINT) AS hhi_ppm,
        |  n_night * 1000000 // n_events AS night_ppm
        |FROM ag JOIN pk ON ag.event_type = pk.event_type
        |ORDER BY ag.event_type""".stripMargin,

    // Replays Relational.priceAnovaOf: floored unit price, nested
    // moment collapses, floored sums-of-squares, clamped eta^2.
    "q238_price_anova" ->
      """WITH y AS (
        |  SELECT p_brand, l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT) // CAST(round(l_quantity) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (
        |  SELECT p_brand, l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(y) AS BIGINT) AS s_g,
        |    SUM(y::HUGEINT * y) AS q_g
        |  FROM y GROUP BY 1, 2),
        |b AS (
        |  SELECT p_brand, CAST(SUM(n_g) AS BIGINT) AS n_lines,
        |    CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |    CAST(SUM(s_g) AS BIGINT) AS s, SUM(q_g) AS q,
        |    SUM((s_g // n_g)::HUGEINT * s_g) AS gterms
        |  FROM g GROUP BY 1),
        |c AS (
        |  SELECT *, (s // n_lines)::HUGEINT * s AS corr
        |  FROM b)
        |SELECT p_brand, n_lines, n_suppliers,
        |  s // n_lines AS mean_price_cents,
        |  CAST(greatest(gterms - corr, 0) * 1000000
        |    // nullif(q - corr, 0) AS BIGINT) AS eta2_ppm
        |FROM c ORDER BY p_brand""".stripMargin,

    // Replays Clustering.randIndexOf over the q42 k-means CTEs: the
    // contingency pair counts and the chance-corrected HUGEINT ARI.
    "q239_rand_index" ->
      s"""WITH ${kmeansCtes(KmeansK, KmeansIters)},
         |ass AS (
         |  SELECT a.vec_id, a.cluster, e.label
         |  FROM a$KmeansIters a
         |  JOIN embeddings e ON a.vec_id = e.vec_id),
         |cont AS (
         |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n_ij
         |  FROM ass GROUP BY 1, 2),
         |aa AS (
         |  SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) AS a_pairs,
         |    CAST(COUNT(*) AS BIGINT) AS k_clusters
         |  FROM (SELECT cluster, CAST(SUM(n_ij) AS BIGINT) AS ai
         |        FROM cont GROUP BY 1) x),
         |bb AS (
         |  SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) AS b_pairs,
         |    CAST(COUNT(*) AS BIGINT) AS n_labels
         |  FROM (SELECT label, CAST(SUM(n_ij) AS BIGINT) AS bj
         |        FROM cont GROUP BY 1) x),
         |pp AS (
         |  SELECT CAST(SUM(n_ij) AS BIGINT) AS n_points,
         |    CAST(SUM(n_ij * (n_ij - 1) // 2) AS BIGINT) AS p_pairs
         |  FROM cont),
         |f AS (
         |  SELECT *, n_points * (n_points - 1) // 2 AS n_tot
         |  FROM pp CROSS JOIN aa CROSS JOIN bb)
         |SELECT n_points, k_clusters, n_labels, p_pairs, a_pairs,
         |  b_pairs,
         |  CAST((n_tot::HUGEINT + 2 * p_pairs - a_pairs - b_pairs)
         |    * 1000000 // nullif(n_tot, 0) AS BIGINT) AS ri_ppm,
         |  CAST(2 * (p_pairs::HUGEINT * n_tot
         |            - a_pairs::HUGEINT * b_pairs) * 1000000
         |    // nullif(n_tot::HUGEINT * (a_pairs + b_pairs)
         |       - 2 * a_pairs::HUGEINT * b_pairs, 0) AS BIGINT)
         |    AS ari_ppm
         |FROM f""".stripMargin,

    // Replays TextOps.readabilityOf: the three literal-class regex
    // counts, pooled per source, two-floor Flesch milli.
    "q240_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |      AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS y
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(w) AS BIGINT) AS n_words,
        |    CAST(SUM(s) AS BIGINT) AS n_sentences,
        |    CAST(SUM(y) AS BIGINT) AS n_syll
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, n_words, n_sentences, n_syll,
        |  n_words * 1000 // nullif(n_sentences, 0) AS wps_milli,
        |  n_syll * 1000 // nullif(n_words, 0) AS spw_milli,
        |  206835 - 1015 * n_words // nullif(n_sentences, 0)
        |    - 84600 * n_syll // nullif(n_words, 0) AS flesch_milli
        |FROM a ORDER BY source""".stripMargin,

    // Replays Events.logRankOf: the censored per-user collapse, the
    // midpoint cohort split, per-cohort bounded at-risk windows over
    // the shared offset spine, floored E/V terms, HUGEINT chi2.
    "q241_log_rank" -> {
      val crit = graft.ops.Events.Chi2Crit95Ppm.head
      s"""WITH d0 AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         |    epoch_us(ts) // 1000000 // 86400 AS day
         |  FROM events),
         |pu AS (
         |  SELECT user_id, MIN(day) AS first_day,
         |    MIN(CASE WHEN event_type = 'purchase' THEN day END)
         |      AS purch_day,
         |    first(event_type ORDER BY ts_us, event_type)
         |      AS first_type
         |  FROM d0 GROUP BY 1),
         |mx AS (SELECT MAX(day) AS max_day FROM d0),
         |subj AS (
         |  SELECT CASE WHEN first_type = 'signup'
         |    THEN 1 ELSE 2 END AS grp,
         |    CASE WHEN purch_day IS NOT NULL
         |      THEN purch_day - first_day
         |      ELSE max_day - first_day END AS t,
         |    CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS e
         |  FROM pu CROSS JOIN mx),
         |hist AS (
         |  SELECT grp, t, CAST(SUM(e) AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS n_t
         |  FROM subj GROUP BY 1, 2),
         |spine AS (SELECT DISTINCT t FROM hist),
         |tot AS (
         |  SELECT grp, CAST(SUM(n_t) AS BIGINT) AS tot
         |  FROM hist GROUP BY 1),
         |grid AS (
         |  SELECT s.t, tt.grp, tt.tot, coalesce(h.d, 0) AS d,
         |    coalesce(h.n_t, 0) AS n_t
         |  FROM spine s CROSS JOIN tot tt
         |  LEFT JOIN hist h ON h.grp = tt.grp AND h.t = s.t),
         |g2 AS (
         |  SELECT *, tot - coalesce(SUM(n_t) OVER (
         |    PARTITION BY grp ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS at_risk
         |  FROM grid),
         |byt AS (
         |  SELECT t,
         |    CAST(coalesce(SUM(CASE WHEN grp = 1 THEN at_risk END), 0)
         |      AS BIGINT) AS n1,
         |    CAST(coalesce(SUM(CASE WHEN grp = 1 THEN d END), 0)
         |      AS BIGINT) AS d1,
         |    CAST(coalesce(SUM(CASE WHEN grp = 2 THEN at_risk END), 0)
         |      AS BIGINT) AS n2,
         |    CAST(coalesce(SUM(CASE WHEN grp = 2 THEN d END), 0)
         |      AS BIGINT) AS d2
         |  FROM g2 GROUP BY 1),
         |terms AS (
         |  SELECT *,
         |    CAST((d1 + d2)::HUGEINT * n1 * 1000000 // (n1 + n2)
         |      AS BIGINT) AS e1_micro,
         |    CASE WHEN n1 + n2 <= 1 THEN CAST(0 AS BIGINT)
         |      ELSE CAST((d1 + d2)::HUGEINT * n1 * n2
         |        * (n1 + n2 - d1 - d2) * 1000000
         |        // ((n1 + n2)::HUGEINT * (n1 + n2) * (n1 + n2 - 1))
         |        AS BIGINT) END AS v_micro
         |  FROM byt WHERE d1 + d2 > 0),
         |agg AS (
         |  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         |    CAST(SUM(d2) AS BIGINT) AS o2,
         |    CAST(SUM(e1_micro) AS BIGINT) AS e1_micro,
         |    CAST(SUM(v_micro) AS BIGINT) AS v_micro,
         |    CAST(COUNT(*) AS BIGINT) AS n_event_times
         |  FROM terms),
         |sub AS (
         |  SELECT
         |    CAST(coalesce(SUM(CASE WHEN grp = 1 THEN tot END), 0)
         |      AS BIGINT) AS n1_subj,
         |    CAST(coalesce(SUM(CASE WHEN grp = 2 THEN tot END), 0)
         |      AS BIGINT) AS n2_subj
         |  FROM tot),
         |f AS (
         |  SELECT *, CAST((o1::HUGEINT * 1000000 - e1_micro)
         |    * (o1::HUGEINT * 1000000 - e1_micro)
         |    // nullif(v_micro, 0) AS BIGINT) AS chi2_micro
         |  FROM agg CROSS JOIN sub)
         |SELECT n1_subj, n2_subj, n_event_times, o1, o2, e1_micro,
         |  v_micro, chi2_micro,
         |  CAST(CASE WHEN chi2_micro IS NULL THEN NULL
         |    WHEN chi2_micro > $crit THEN 1 ELSE 0 END AS BIGINT)
         |    AS significant
         |FROM f""".stripMargin
    },

    // Replays Events.seasonalStrengthOfDaily: the densified calendar,
    // weekday moment collapse, floored-mean eta^2.
    "q242_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
        |dense AS (
        |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
        |  FROM (SELECT DISTINCT event_type FROM daily) t
        |  CROSS JOIN cal
        |  LEFT JOIN daily d ON d.event_type = t.event_type
        |    AND d.day = cal.day),
        |g AS (
        |  SELECT event_type, (day + 3) % 7 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(cents) AS BIGINT) AS s_g,
        |    SUM(cents::HUGEINT * cents) AS q_g
        |  FROM dense GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(SUM(n_g) AS BIGINT) AS n_days,
        |    CAST(SUM(s_g) AS BIGINT) AS s, SUM(q_g) AS q,
        |    SUM((s_g // n_g)::HUGEINT * s_g) AS gterms
        |  FROM g GROUP BY 1),
        |c AS (
        |  SELECT *, (s // n_days)::HUGEINT * s AS corr FROM t)
        |SELECT event_type, n_days, s // n_days AS mean_cents,
        |  CAST(greatest(gterms - corr, 0) * 1000000
        |    // nullif(q - corr, 0) AS BIGINT) AS eta2_ppm
        |FROM c ORDER BY event_type""".stripMargin,

    // Replays Privacy.mondrianOf level for level via mondrianCtes.
    "q243_mondrian" ->
      s"""WITH ${mondrianCtes(MondrianK, MondrianRounds)},
         |grp AS (
         |  SELECT pid, MIN(bal) AS bal_min, MAX(bal) AS bal_max,
         |    MIN(nat) AS nat_min, MAX(nat) AS nat_max,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM r$MondrianRounds GROUP BY 1),
         |sm AS (
         |  SELECT CAST(MIN(n) AS BIGINT) AS k_achieved,
         |    CAST(COUNT(*) AS BIGINT) AS n_groups
         |  FROM grp)
         |SELECT bal_min, bal_max, nat_min, nat_max, n, k_achieved,
         |  n_groups
         |FROM grp CROSS JOIN sm
         |ORDER BY bal_min, bal_max, nat_min, nat_max, n""".stripMargin,

    // Replays TextOps.vocabContainmentOf: distinct (source, token)
    // sets, within-token pair enumeration, directional containment.
    "q244_vocab_containment" ->
      """WITH st AS MATERIALIZED (
        |  SELECT DISTINCT source, unnest(regexp_extract_all(
        |    lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS v
        |  FROM st GROUP BY 1),
        |i AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM st a JOIN st b
        |    ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, sa.v AS v_a, sb.v AS v_b, n_inter,
        |  n_inter * 1000000 // sa.v AS contain_ab_ppm,
        |  n_inter * 1000000 // sb.v AS contain_ba_ppm,
        |  n_inter * 1000000 // (sa.v + sb.v - n_inter) AS jaccard_ppm
        |FROM i JOIN sz sa ON i.source_a = sa.source
        |JOIN sz sb ON i.source_b = sb.source
        |ORDER BY source_a, source_b""".stripMargin,

    // Replays Events.userDispersionOf: per-user counts, HUGEINT
    // variance-to-mean, smallest-id top-user tie rule.
    "q245_user_dispersion" ->
      """WITH per AS MATERIALIZED (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |top AS (
        |  SELECT event_type, user_id AS top_user, c AS top_n
        |  FROM per
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |    ORDER BY c DESC, user_id ASC) = 1),
        |ag AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS n_events,
        |    SUM(c::HUGEINT * c) AS sq
        |  FROM per GROUP BY 1)
        |SELECT ag.event_type, n_users, n_events,
        |  n_events * 1000 // n_users AS mean_milli,
        |  CAST((n_users::HUGEINT * sq - n_events::HUGEINT * n_events)
        |    * 1000 // (n_users::HUGEINT * n_events) AS BIGINT)
        |    AS dispersion_milli,
        |  top_user, top_n * 1000000 // n_events AS top_share_ppm
        |FROM ag JOIN top ON ag.event_type = top.event_type
        |ORDER BY ag.event_type""".stripMargin,

    // Replays TextOps.zipfProfileOf: (count DESC, token ASC) ranks,
    // doubling-rank picks, fused total token count.
    "q246_zipf_profile" ->
      """WITH c AS MATERIALIZED (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(regexp_extract_all(lower(text),
        |      '[a-z0-9]+')) AS token
        |    FROM documents) t
        |  GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM c),
        |r AS (
        |  SELECT token, c, CAST(row_number() OVER (
        |    ORDER BY c DESC, token ASC) AS BIGINT) AS rank
        |  FROM c QUALIFY rank <= 512)
        |SELECT a.rank, a.token, a.c,
        |  a.c * 1000000000 // n_tokens AS freq_ppb,
        |  a.c * 1000 // b.c AS doubling_milli
        |FROM r a LEFT JOIN r b ON b.rank = a.rank * 2
        |CROSS JOIN n
        |WHERE a.rank IN (1, 2, 4, 8, 16, 32, 64, 128, 256)
        |ORDER BY a.rank""".stripMargin,

    // Replays Relational.cramersVOf: one pair block per column pair
    // via cramersPairCtes, sqrt-free V^2, nullif on constant columns.
    "q247_cramers_v" ->
      s"""WITH base AS MATERIALIZED (
         |  SELECT o_orderpriority AS priority,
         |    o_orderstatus AS status,
         |    CAST((epoch_us(o_orderdate) // 86400000000 + 3) % 7
         |      AS VARCHAR) AS weekday
         |  FROM orders),
         |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
         |${cramersPairCtes(1, "priority", "status")},
         |${cramersPairCtes(2, "priority", "weekday")},
         |${cramersPairCtes(3, "status", "weekday")}
         |SELECT col_a, col_b, n, k_a, k_b, chi2_micro,
         |  chi2_micro // nullif(n * least(k_a - 1, k_b - 1), 0)
         |    AS v2_ppm
         |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
         |      UNION ALL SELECT * FROM p3) u
         |ORDER BY col_a, col_b""".stripMargin,

    // Replays Events.mannKendallOfDaily: the pairwise sign sum, the
    // Kendall tie correction, and the continuity-corrected
    // cross-multiplied 5% test in HUGEINT.
    "q188_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
        |                  WHEN b.cents < a.cents THEN -1
        |                  ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON b.event_type = a.event_type
        |    AND a.day < b.day
        |  GROUP BY 1),
        |t AS (
        |  SELECT event_type,
        |    CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie_sum
        |  FROM (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS tt
        |        FROM daily GROUP BY 1, 2) g
        |  GROUP BY 1),
        |n AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |j AS (
        |  SELECT n.event_type, n_days,
        |    COALESCE(s.s_stat, 0) AS s_stat,
        |    n_days * (n_days - 1) // 2 AS n_pairs,
        |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum AS var18
        |  FROM n LEFT JOIN s ON n.event_type = s.event_type
        |  JOIN t ON n.event_type = t.event_type)
        |SELECT event_type, n_days, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(s_stat AS BIGINT) AS s_stat,
        |  CAST(CASE WHEN n_pairs = 0 THEN 0
        |       ELSE s_stat * 1000000 // n_pairs END AS BIGINT) AS tau_ppm,
        |  CAST(var18 AS BIGINT) AS var18,
        |  CAST(CASE WHEN s_stat = 0 THEN 0
        |       WHEN (abs(s_stat) - 1)::HUGEINT * (abs(s_stat) - 1) * 180000
        |          > 38416::HUGEINT * var18
        |       THEN CASE WHEN s_stat > 0 THEN 1 ELSE -1 END
        |       ELSE 0 END AS BIGINT) AS trend
        |FROM j ORDER BY 1""".stripMargin,

    // Replays Features.giniFeatureRankOf: the 4-arm melt as UNION ALL,
    // per-group and weighted Gini with the same floor points, HUGEINT
    // squares.
    "q189_gini_features" ->
      """WITH c AS (
        |  SELECT c_name, c_nationkey, c_mktsegment AS label,
        |    CAST(CAST(c_acctbal AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer),
        |m AS (
        |  SELECT 'bal_band' AS feature,
        |    CAST((cents + 100000) // 100000 AS VARCHAR) AS fval, label
        |  FROM c
        |  UNION ALL
        |  SELECT 'bal_sign',
        |    CASE WHEN cents < 0 THEN 'neg' ELSE 'nonneg' END, label
        |  FROM c
        |  UNION ALL
        |  SELECT 'name_digit', right(c_name, 1), label FROM c
        |  UNION ALL
        |  SELECT 'nation', CAST(c_nationkey AS VARCHAR), label FROM c),
        |cube3 AS (
        |  SELECT feature, fval, label, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2, 3),
        |pv AS (
        |  SELECT feature, fval, CAST(SUM(cnt) AS BIGINT) AS n_v,
        |    SUM(cnt::HUGEINT * cnt) AS ssq_v
        |  FROM cube3 GROUP BY 1, 2),
        |pvg AS (
        |  SELECT feature, fval, n_v,
        |    1000000 - ssq_v * 1000000 // (n_v::HUGEINT * n_v)
        |      AS gini_v_ppm
        |  FROM pv),
        |pf AS (
        |  SELECT feature, CAST(SUM(n_v) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_values,
        |    CAST(SUM(n_v::HUGEINT * gini_v_ppm) // SUM(n_v) AS BIGINT)
        |      AS split_gini_ppm
        |  FROM pvg GROUP BY 1),
        |rt AS (
        |  SELECT CAST(1000000 - SUM(nc::HUGEINT * nc) * 1000000
        |    // (SUM(nc)::HUGEINT * SUM(nc)) AS BIGINT) AS root_gini_ppm
        |  FROM (SELECT label, CAST(SUM(cnt) AS BIGINT) AS nc
        |        FROM cube3 WHERE feature = 'nation' GROUP BY 1) r)
        |SELECT feature, n, n_values, root_gini_ppm, split_gini_ppm,
        |  root_gini_ppm - split_gini_ppm AS gain_ppm
        |FROM pf CROSS JOIN rt ORDER BY feature""".stripMargin,

    // Replays Relational.duplicatePaymentsOf: customer-blocked pair
    // join, $100-band suspect rule, least-amount risk, dense gap spine.
    "q190_duplicate_payments" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(o_orderdate) // 86400000000 AS day,
        |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |p AS (
        |  SELECT a.o_custkey AS cust, abs(b.day - a.day) AS gap_days,
        |    (a.cents // 10000) = (b.cents // 10000) AS suspect,
        |    least(a.cents, b.cents) AS risk_cents
        |  FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |    AND a.o_orderkey < b.o_orderkey
        |  WHERE abs(b.day - a.day) <= 7),
        |agg AS (
        |  SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN suspect THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_suspect,
        |    CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers,
        |    CAST(SUM(CASE WHEN suspect THEN risk_cents ELSE 0 END)
        |      AS BIGINT) AS cents_at_risk
        |  FROM p GROUP BY 1)
        |SELECT s.gap_days, COALESCE(n_pairs, 0) AS n_pairs,
        |  COALESCE(n_suspect, 0) AS n_suspect,
        |  COALESCE(n_customers, 0) AS n_customers,
        |  COALESCE(cents_at_risk, 0) AS cents_at_risk
        |FROM (SELECT unnest(generate_series(0, 7)) AS gap_days) s
        |LEFT JOIN agg ON s.gap_days = agg.gap_days
        |ORDER BY s.gap_days""".stripMargin,

    // Replays Relational.reconciliationAuditOf: HUGEINT charge
    // formula, full-outer completeness bands, fixed band spine.
    "q191_reconciliation" ->
      """WITH rc AS (
        |  SELECT l_orderkey AS okey,
        |    CAST(SUM(
        |      CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100
        |        AS BIGINT)::HUGEINT
        |      * (1000000 - CAST(CAST(l_discount AS DECIMAL(8, 6))
        |          * 1000000 AS BIGINT))
        |      * (1000000 + CAST(CAST(l_tax AS DECIMAL(8, 6))
        |          * 1000000 AS BIGINT))
        |      // 1000000000000) AS BIGINT) AS recomputed_cents
        |  FROM lineitem GROUP BY 1),
        |bk AS (
        |  SELECT o_orderkey AS okey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS booked_cents
        |  FROM orders),
        |j AS (
        |  SELECT
        |    CASE WHEN booked_cents IS NULL THEN 'orphan_lines'
        |         WHEN recomputed_cents IS NULL THEN 'no_lines'
        |         WHEN recomputed_cents = booked_cents THEN 'exact'
        |         ELSE concat(
        |           CASE WHEN recomputed_cents > booked_cents
        |             THEN 'pos_' ELSE 'neg_' END,
        |           CASE WHEN abs(recomputed_cents - booked_cents) <= 100
        |                  THEN 'le_1'
        |                WHEN abs(recomputed_cents - booked_cents) <= 10000
        |                  THEN 'le_100'
        |                WHEN abs(recomputed_cents - booked_cents)
        |                    <= 1000000 THEN 'le_10k'
        |                ELSE 'gt_10k' END) END AS band,
        |    abs(COALESCE(recomputed_cents, 0) - COALESCE(booked_cents, 0))
        |      AS abs_delta
        |  FROM bk FULL OUTER JOIN rc USING (okey)),
        |agg AS (
        |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(abs_delta) AS BIGINT) AS abs_delta_cents
        |  FROM j GROUP BY 1)
        |SELECT s.band, COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(abs_delta_cents, 0) AS abs_delta_cents
        |FROM (SELECT unnest(['exact',
        |  'pos_le_1', 'pos_le_100', 'pos_le_10k', 'pos_gt_10k',
        |  'neg_le_1', 'neg_le_100', 'neg_le_10k', 'neg_gt_10k',
        |  'no_lines', 'orphan_lines']) AS band) s
        |LEFT JOIN agg ON s.band = agg.band
        |ORDER BY s.band""".stripMargin,

    // Replays Events.weekdayChi2Of: the contingency grid, the bounded
    // two-floor expected/contrib chain in HUGEINT, and the verdict
    // against the SAME Chi2Crit95Ppm table (1-based list index; df
    // outside 1..120 yields NULL in both engines).
    "q192_weekday_chi2" ->
      s"""WITH obs AS (
         |  SELECT event_type,
         |    (epoch_us(ts) // 1000000 // 86400 + 3) % 7 AS weekday,
         |    CAST(COUNT(*) AS BIGINT) AS observed
         |  FROM events GROUP BY 1, 2),
         |rm AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS r
         |       FROM obs GROUP BY 1),
         |cm AS (SELECT weekday, CAST(SUM(observed) AS BIGINT) AS c
         |       FROM obs GROUP BY 1),
         |tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
         |    CAST(COUNT(DISTINCT weekday) AS BIGINT) AS nc
         |  FROM obs),
         |cells AS (
         |  SELECT rm.event_type, cm.weekday,
         |    COALESCE(obs.observed, 0) AS observed,
         |    CAST(rm.r::HUGEINT * cm.c * 1000000 // tot.n AS BIGINT)
         |      AS expected_micro
         |  FROM rm CROSS JOIN cm CROSS JOIN tot
         |  LEFT JOIN obs ON obs.event_type = rm.event_type
         |    AND obs.weekday = cm.weekday),
         |cc AS (
         |  SELECT event_type, weekday, observed, expected_micro,
         |    CAST((observed::HUGEINT * 1000000 - expected_micro)
         |      * (observed::HUGEINT * 1000000 - expected_micro)
         |      // nullif(expected_micro, 0) AS BIGINT) AS contrib_micro
         |  FROM cells),
         |sm AS (
         |  SELECT CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
         |  FROM cc),
         |sd AS (
         |  SELECT sm.chi2_micro,
         |    CAST((tot.nr - 1) * (tot.nc - 1) AS BIGINT) AS df
         |  FROM sm CROSS JOIN tot),
         |sv AS (
         |  SELECT chi2_micro, df,
         |    ([${Events.Chi2Crit95Ppm.mkString(",")}])[df] AS crit_micro
         |  FROM sd)
         |SELECT cc.event_type, cc.weekday, cc.observed, cc.expected_micro,
         |  cc.contrib_micro, sv.chi2_micro, sv.df,
         |  CAST(sv.crit_micro AS BIGINT) AS crit_micro,
         |  CAST(CASE WHEN sv.crit_micro IS NULL THEN NULL
         |       WHEN sv.chi2_micro > sv.crit_micro THEN 1
         |       ELSE 0 END AS BIGINT) AS dependent
         |FROM cc CROSS JOIN sv
         |ORDER BY cc.event_type, cc.weekday""".stripMargin,

    // Replays Relational.lorenzOf: whole-dollar quantization, the
    // exact straddle split of each value group across rank deciles,
    // HUGEINT dollar sums, 10-row cumulative.
    "q193_lorenz_deciles" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |h AS (SELECT cents // 100 AS v, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM sp GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |        SUM(v::HUGEINT * c) AS total_d
        |      FROM h),
        |hc AS (
        |  SELECT v, c, COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM h),
        |e AS (
        |  SELECT hc.v, hc.c, hc.cum, t.n, t.total_d, d.decile
        |  FROM hc CROSS JOIN t
        |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS decile) d),
        |dc AS (
        |  SELECT decile,
        |    greatest(0, least(cum + c, (decile * n) // 10)
        |      - greatest(cum, ((decile - 1) * n) // 10)) AS dcount,
        |    v, total_d
        |  FROM e),
        |g AS (
        |  SELECT decile, CAST(SUM(dcount) AS BIGINT) AS n_customers,
        |    SUM(dcount::HUGEINT * v) AS spend_dollars,
        |    MAX(total_d) AS total_d
        |  FROM dc WHERE dcount > 0 GROUP BY 1)
        |SELECT CAST(decile AS BIGINT) AS decile, n_customers,
        |  CAST(spend_dollars AS BIGINT) AS spend_dollars,
        |  CAST(spend_dollars * 1000000 // nullif(total_d, 0) AS BIGINT)
        |    AS share_ppm,
        |  CAST(SUM(spend_dollars) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING)
        |    * 1000000 // nullif(total_d, 0) AS BIGINT) AS cum_share_ppm
        |FROM g ORDER BY decile""".stripMargin,

    // Replays Events.twoProportionZOf on top of the q136 counts CTE:
    // ppm rates, the one-division pooled se2 in 1e-18 units, the
    // chi2(1) critical constant.
    "q194_two_proportion_z" ->
      s"""WITH u AS (
         |  SELECT DISTINCT user_id FROM events),
         |asg AS (
         |  SELECT user_id,
         |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
         |      1, 6) AS BIGINT) % 100 < 50 THEN 'a' ELSE 'b' END AS arm
         |  FROM u),
         |c AS (SELECT user_id FROM events
         |      WHERE event_type = 'purchase'
         |      GROUP BY 1 HAVING COUNT(*) >= 15),
         |k AS (
         |  SELECT asg.arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_converted,
         |    CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) * 1000000 // COUNT(*) AS conv_ppm
         |  FROM asg LEFT JOIN c ON asg.user_id = c.user_id
         |  GROUP BY asg.arm),
         |p AS (
         |  SELECT
         |    ka.n_users AS n_a, ka.n_converted AS conv_a,
         |    CAST(ka.conv_ppm AS BIGINT) AS p_a_ppm,
         |    kb.n_users AS n_b, kb.n_converted AS conv_b,
         |    CAST(kb.conv_ppm AS BIGINT) AS p_b_ppm
         |  FROM (SELECT * FROM k WHERE arm = 'a') ka
         |  CROSS JOIN (SELECT * FROM k WHERE arm = 'b') kb),
         |x AS (
         |  SELECT *, p_a_ppm - p_b_ppm AS diff_ppm,
         |    (conv_a + conv_b) * 1000000 // (n_a + n_b) AS pooled_ppm
         |  FROM p),
         |y AS (
         |  SELECT *,
         |    CAST(pooled_ppm::HUGEINT * (1000000 - pooled_ppm)
         |      * (n_a + n_b) * 1000000
         |      // (n_a::HUGEINT * n_b) AS BIGINT) AS se2_e18
         |  FROM x),
         |z AS (
         |  SELECT *,
         |    CAST(diff_ppm::HUGEINT * diff_ppm * 1000000000000
         |      // nullif(se2_e18, 0) AS BIGINT) AS z2_micro,
         |    CAST(${Events.Chi2Crit95Ppm.head} AS BIGINT) AS crit_micro
         |  FROM y)
         |SELECT n_a, conv_a, p_a_ppm, n_b, conv_b, p_b_ppm, diff_ppm,
         |  pooled_ppm, se2_e18, z2_micro, crit_micro,
         |  CAST(CASE WHEN z2_micro IS NULL THEN NULL
         |       WHEN z2_micro > crit_micro THEN 1 ELSE 0 END AS BIGINT)
         |    AS significant,
         |  CASE WHEN diff_ppm > 0 THEN 'a'
         |       WHEN diff_ppm < 0 THEN 'b' ELSE 'tie' END AS winner
         |FROM z""".stripMargin,

    // Replays Relational.supplierReturnScreenOf: per-supplier counts,
    // the supplier-vs-rest pooled z² in HUGEINT, the shared chi2(1)
    // constant.
    "q195_supplier_returns" ->
      s"""WITH per AS (
         |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_returned
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(SUM(n_lines) AS BIGINT) AS nn,
         |        CAST(SUM(n_returned) AS BIGINT) AS rr
         |      FROM per),
         |x AS (
         |  SELECT per.*, g.nn, g.rr,
         |    n_returned * 1000000 // n_lines AS rate_ppm,
         |    (rr - n_returned) * 1000000 // nullif(nn - n_lines, 0)
         |      AS rest_ppm,
         |    rr * 1000000 // nn AS pooled_ppm
         |  FROM per CROSS JOIN g),
         |y AS (
         |  SELECT *, rate_ppm - rest_ppm AS diff_ppm,
         |    CAST(pooled_ppm::HUGEINT * (1000000 - pooled_ppm)
         |      * nn * 1000000
         |      // (n_lines::HUGEINT * nullif(nn - n_lines, 0))
         |      AS BIGINT) AS se2_e18
         |  FROM x),
         |z AS (
         |  SELECT *,
         |    CAST(diff_ppm::HUGEINT * diff_ppm * 1000000000000
         |      // nullif(se2_e18, 0) AS BIGINT) AS z2_micro
         |  FROM y)
         |SELECT l_suppkey, n_lines, n_returned,
         |  CAST(rate_ppm AS BIGINT) AS rate_ppm,
         |  CAST(rest_ppm AS BIGINT) AS rest_ppm,
         |  CAST(diff_ppm AS BIGINT) AS diff_ppm, z2_micro,
         |  CAST(CASE WHEN z2_micro IS NULL THEN NULL
         |       WHEN z2_micro > ${Events.Chi2Crit95Ppm.head}
         |            AND diff_ppm > 0 THEN 1
         |       ELSE 0 END AS BIGINT) AS elevated
         |FROM z ORDER BY l_suppkey""".stripMargin,

    // Replays Relational.supplierFdrOf: the q195 z-chain, the shared
    // PLadderMicro p assignment, band cumulative ranks, BH step-up
    // at q=10% and the Bonferroni contrast.
    "q235_bh_fdr" ->
      s"""WITH per AS (
         |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_returned
         |  FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(SUM(n_lines) AS BIGINT) AS nn,
         |        CAST(SUM(n_returned) AS BIGINT) AS rr
         |      FROM per),
         |x AS (
         |  SELECT per.*, g.nn, g.rr,
         |    n_returned * 1000000 // n_lines AS rate_ppm,
         |    (rr - n_returned) * 1000000 // nullif(nn - n_lines, 0)
         |      AS rest_ppm,
         |    rr * 1000000 // nn AS pooled_ppm
         |  FROM per CROSS JOIN g),
         |y AS (
         |  SELECT *, rate_ppm - rest_ppm AS diff_ppm,
         |    CAST(pooled_ppm::HUGEINT * (1000000 - pooled_ppm)
         |      * nn * 1000000
         |      // (n_lines::HUGEINT * nullif(nn - n_lines, 0))
         |      AS BIGINT) AS se2_e18
         |  FROM x),
         |z AS (
         |  SELECT *,
         |    CAST(diff_ppm::HUGEINT * diff_ppm * 1000000000000
         |      // nullif(se2_e18, 0) AS BIGINT) AS z2_micro
         |  FROM y),
         |t AS (
         |  SELECT ${graft.ops.Relational.pLadderCase("z2_micro")}
         |    AS p_ppm
         |  FROM z WHERE z2_micro IS NOT NULL),
         |bands AS (
         |  SELECT p_ppm, CAST(COUNT(*) AS BIGINT) AS n_suppliers
         |  FROM t GROUP BY 1),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_tested FROM t),
         |c AS (
         |  SELECT p_ppm, n_suppliers,
         |    CAST(SUM(n_suppliers) OVER (ORDER BY p_ppm) AS BIGINT)
         |      AS cum_tested, m_tested
         |  FROM bands CROSS JOIN m),
         |f AS (
         |  SELECT *,
         |    CAST(CASE WHEN p_ppm * m_tested <= cum_tested * 100000
         |      THEN 1 ELSE 0 END AS BIGINT) AS bh_pass,
         |    CASE WHEN p_ppm * m_tested <= 50000
         |      THEN 1 ELSE 0 END AS bonf_pass
         |  FROM c),
         |tot AS (
         |  SELECT
         |    CAST(coalesce(MAX(CASE WHEN bh_pass = 1
         |      THEN cum_tested END), 0) AS BIGINT) AS n_discoveries,
         |    CAST(coalesce(MAX(CASE WHEN bonf_pass = 1
         |      THEN cum_tested END), 0) AS BIGINT) AS n_bonferroni
         |  FROM f)
         |SELECT p_ppm, n_suppliers, cum_tested, bh_pass,
         |  n_discoveries, n_bonferroni, m_tested
         |FROM f CROSS JOIN tot ORDER BY p_ppm""".stripMargin,

    // INDEPENDENT per-part ABC formulation (the q174 global window)
    // crossed with the HUGEINT CV2 XYZ classes — hash-matching proves
    // Spark's two-phase per-part reduction, the q179 pattern.
    "q196_abc_xyz_matrix" ->
      """WITH ml AS (
        |  SELECT l_partkey,
        |    year(l_shipdate) AS m,
        |    CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS qc,
        |    CAST(l_extendedprice AS DECIMAL(12, 2))
        |      * (1 - CAST(l_discount AS DECIMAL(12, 2))) AS rt
        |  FROM lineitem),
        |mo AS (
        |  SELECT l_partkey, m, CAST(SUM(qc) AS BIGINT) AS qm,
        |    SUM(rt) AS rm
        |  FROM ml GROUP BY 1, 2),
        |pp AS (
        |  SELECT l_partkey, CAST(SUM(qm) AS BIGINT) AS sq,
        |    SUM(qm::HUGEINT * qm) AS q2,
        |    CAST(SUM(rm) * 10000 AS BIGINT) AS r4
        |  FROM mo GROUP BY 1),
        |sp AS (SELECT MAX(m) - MIN(m) + 1 AS mm FROM mo),
        |x AS (
        |  SELECT pp.*, CASE
        |      WHEN (mm::HUGEINT * q2 - sq::HUGEINT * sq) * 4
        |           <= sq::HUGEINT * sq THEN 'X'
        |      WHEN mm::HUGEINT * q2 - sq::HUGEINT * sq
        |           <= sq::HUGEINT * sq THEN 'Y'
        |      ELSE 'Z' END AS xyz_class
        |  FROM pp CROSS JOIN sp),
        |c AS (
        |  SELECT l_partkey, r4,
        |    COALESCE(SUM(r4) OVER (ORDER BY r4 DESC, l_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM pp),
        |t AS (SELECT CAST(SUM(r4) AS BIGINT) AS total,
        |      CAST(SUM(sq) AS BIGINT) AS tq FROM pp),
        |k AS (
        |  SELECT l_partkey, CASE
        |      WHEN cum_before * 5 < (SELECT total FROM t) * 4 THEN 'A'
        |      WHEN cum_before * 20 < (SELECT total FROM t) * 19 THEN 'B'
        |      ELSE 'C' END AS abc_class
        |  FROM c),
        |cell AS (
        |  SELECT k.abc_class, x.xyz_class, CAST(COUNT(*) AS BIGINT)
        |      AS n_parts,
        |    CAST(SUM(x.r4) AS BIGINT) AS cr,
        |    CAST(SUM(x.sq) AS BIGINT) AS cq
        |  FROM k JOIN x USING (l_partkey) GROUP BY 1, 2),
        |spine AS (
        |  SELECT a.abc_class, z.xyz_class
        |  FROM (SELECT unnest(['A', 'B', 'C']) AS abc_class) a
        |  CROSS JOIN (SELECT unnest(['X', 'Y', 'Z']) AS xyz_class) z)
        |SELECT s.abc_class, s.xyz_class,
        |  COALESCE(n_parts, 0) AS n_parts,
        |  COALESCE(CAST(cr::HUGEINT * 1000000 // (SELECT total FROM t)
        |    AS BIGINT), 0) AS revenue_share_ppm,
        |  COALESCE(CAST(cq::HUGEINT * 1000000 // (SELECT tq FROM t)
        |    AS BIGINT), 0) AS qty_share_ppm
        |FROM spine s LEFT JOIN cell
        |  ON s.abc_class = cell.abc_class AND s.xyz_class = cell.xyz_class
        |ORDER BY 1, 2""".stripMargin,

    // Replays Relational.priceDispersionOf: floored unit-price micro,
    // per-part min/max, the fixed dispersion bands per brand.
    "q197_price_dispersion" ->
      """WITH u AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      * 1000000
        |      // CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |      AS um
        |  FROM lineitem),
        |per AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(MIN(um) AS BIGINT) AS mn, CAST(MAX(um) AS BIGINT) AS mx
        |  FROM u GROUP BY 1),
        |sp AS (
        |  SELECT l_partkey,
        |    (mx - mn) * 1000000 // nullif(mn, 0) AS spread_ppm
        |  FROM per)
        |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(CASE WHEN spread_ppm = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_uniform,
        |  CAST(SUM(CASE WHEN spread_ppm > 0 AND spread_ppm <= 10000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_le_1pct,
        |  CAST(SUM(CASE WHEN spread_ppm > 10000 AND spread_ppm <= 50000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_le_5pct,
        |  CAST(SUM(CASE WHEN spread_ppm > 50000 AND spread_ppm <= 200000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_le_20pct,
        |  CAST(SUM(CASE WHEN spread_ppm > 200000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gt_20pct,
        |  CAST(MAX(spread_ppm) AS BIGINT) AS max_spread_ppm
        |FROM sp JOIN part p ON sp.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays Events.interarrivalDispersionOf: per-(user, type) lag
    // gaps, HUGEINT moments, the ±10% dispersion bands.
    "q198_interarrival_dispersion" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) // 1000000
        |      - lag(epoch_us(ts) // 1000000) OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY epoch_us(ts) // 1000000) AS gp
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    CAST(SUM(gp) AS BIGINT) AS s1,
        |    SUM(gp::HUGEINT * gp) AS s2
        |  FROM g WHERE gp IS NOT NULL GROUP BY 1),
        |x AS (
        |  SELECT event_type, n_gaps, s1, s1 // n_gaps AS mean_gap_sec,
        |    CAST((n_gaps::HUGEINT * s2 - s1::HUGEINT * s1) * 1000000
        |      // nullif(s1::HUGEINT * s1, 0) AS BIGINT) AS cv2_micro
        |  FROM m)
        |SELECT event_type, n_gaps, s1 AS sum_gap_sec,
        |  CAST(mean_gap_sec AS BIGINT) AS mean_gap_sec, cv2_micro,
        |  CASE WHEN cv2_micro IS NULL THEN 'degenerate'
        |       WHEN cv2_micro < 900000 THEN 'regular'
        |       WHEN cv2_micro <= 1100000 THEN 'poisson_like'
        |       ELSE 'bursty' END AS dispersion
        |FROM x ORDER BY event_type""".stripMargin,

    // Replays Events.valueDriftChi2Of: calendar-half split, $10 bands,
    // the shared q192 cell chain with df = B-1 and the same constant
    // table.
    "q199_value_drift_chi2" ->
      s"""WITH p AS (
         |  SELECT epoch_us(ts) // 1000000 // 86400 AS day,
         |    CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT) // 1000
         |      AS band
         |  FROM events WHERE event_type = 'purchase'),
         |md AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM p),
         |obs AS (
         |  SELECT CASE WHEN day < mid THEN 'h1' ELSE 'h2' END AS half,
         |    band, CAST(COUNT(*) AS BIGINT) AS observed
         |  FROM p CROSS JOIN md GROUP BY 1, 2),
         |rm AS (SELECT half, CAST(SUM(observed) AS BIGINT) AS r
         |       FROM obs GROUP BY 1),
         |cm AS (SELECT band, CAST(SUM(observed) AS BIGINT) AS c
         |       FROM obs GROUP BY 1),
         |tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT half) AS BIGINT) AS nr,
         |    CAST(COUNT(DISTINCT band) AS BIGINT) AS nc
         |  FROM obs),
         |cells AS (
         |  SELECT rm.half, cm.band, COALESCE(obs.observed, 0) AS observed,
         |    CAST(rm.r::HUGEINT * cm.c * 1000000 // tot.n AS BIGINT)
         |      AS expected_micro
         |  FROM rm CROSS JOIN cm CROSS JOIN tot
         |  LEFT JOIN obs ON obs.half = rm.half AND obs.band = cm.band),
         |cc AS (
         |  SELECT half, band, observed, expected_micro,
         |    CAST((observed::HUGEINT * 1000000 - expected_micro)
         |      * (observed::HUGEINT * 1000000 - expected_micro)
         |      // nullif(expected_micro, 0) AS BIGINT) AS contrib_micro
         |  FROM cells),
         |sm AS (
         |  SELECT CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
         |  FROM cc),
         |sd AS (
         |  SELECT sm.chi2_micro,
         |    CAST((tot.nr - 1) * (tot.nc - 1) AS BIGINT) AS df
         |  FROM sm CROSS JOIN tot),
         |sv AS (
         |  SELECT chi2_micro, df,
         |    ([${Events.Chi2Crit95Ppm.mkString(",")}])[df] AS crit_micro
         |  FROM sd)
         |SELECT cc.half, cc.band, cc.observed, cc.expected_micro,
         |  cc.contrib_micro, sv.chi2_micro, sv.df,
         |  CAST(sv.crit_micro AS BIGINT) AS crit_micro,
         |  CAST(CASE WHEN sv.crit_micro IS NULL THEN NULL
         |       WHEN sv.chi2_micro > sv.crit_micro THEN 1
         |       ELSE 0 END AS BIGINT) AS drifted
         |FROM cc CROSS JOIN sv
         |ORDER BY cc.half, cc.band""".stripMargin,

    // Replays Relational.evergreenOf: weekly revenue, pinned
    // row_number ranks, top-20 membership stability.
    "q200_evergreen_bestsellers" ->
      """WITH w AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 // 7 AS week,
        |    l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12, 2))
        |      * (1 - CAST(l_discount AS DECIMAL(12, 2)))) * 10000
        |      AS BIGINT) AS r4
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT week, l_partkey,
        |    ROW_NUMBER() OVER (PARTITION BY week
        |      ORDER BY r4 DESC, l_partkey ASC) AS rnk
        |  FROM w),
        |top AS (SELECT * FROM r WHERE rnk <= 20),
        |nw AS (SELECT CAST(COUNT(DISTINCT week) AS BIGINT) AS n_weeks
        |       FROM top)
        |SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS weeks_in_top,
        |  nw.n_weeks,
        |  CAST(COUNT(*) AS BIGINT) * 1000000 // nw.n_weeks
        |    AS presence_ppm,
        |  CAST(MIN(rnk) AS BIGINT) AS best_rank
        |FROM top CROSS JOIN nw
        |GROUP BY l_partkey, nw.n_weeks
        |ORDER BY weeks_in_top DESC, l_partkey ASC""".stripMargin,

    // Replays Relational.fkCoverageOf edge by edge as UNION ALL arms.
    "q201_fk_coverage" -> {
      def arm(label: String, child: String, fk: String, parent: String,
          pk: String) =
        s"""SELECT '$label' AS edge,
           |  CAST(COUNT(*) AS BIGINT) AS n_child,
           |  CAST(SUM(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null_fk,
           |  CAST(SUM(CASE WHEN c.$fk IS NOT NULL AND p.$pk IS NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           |  CAST((COUNT(*)
           |   - SUM(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END)
           |   - SUM(CASE WHEN c.$fk IS NOT NULL AND p.$pk IS NULL
           |       THEN 1 ELSE 0 END)) * 1000000 // COUNT(*)
           |    AS BIGINT) AS coverage_ppm
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON c.$fk = p.$pk""".stripMargin
      Seq(
        arm("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        arm("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        arm("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        arm("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        arm("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        arm("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        arm("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    // Replays Relational.fdProfileOf: per candidate the g3 plurality
    // arithmetic as one UNION ALL arm.
    "q202_fd_profile" -> {
      def arm(table: String, det: String, dep: String) =
        s"""SELECT '$table' AS table_name, '$det' AS determinant,
           |  '$dep' AS dependent,
           |  CAST(SUM(tot) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_groups,
           |  CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(SUM(tot - mx) AS BIGINT) AS g3_rows,
           |  CAST(SUM(tot - mx) * 1000000 // SUM(tot) AS BIGINT)
           |    AS g3_ppm,
           |  CAST(CASE WHEN SUM(tot - mx) = 0 THEN 1 ELSE 0 END
           |    AS BIGINT) AS holds
           |FROM (
           |  SELECT d, CAST(SUM(c) AS BIGINT) AS tot,
           |    CAST(MAX(c) AS BIGINT) AS mx,
           |    CAST(COUNT(*) AS BIGINT) AS ndep
           |  FROM (SELECT $det AS d, $dep AS v,
           |          CAST(COUNT(*) AS BIGINT) AS c
           |        FROM $table GROUP BY 1, 2) g
           |  GROUP BY 1) p""".stripMargin
      Relational.FdCandidates.map { case (t, det, dep) => arm(t, det, dep) }
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY table_name, determinant, dependent")
    },

    // Replays TextOps.tokenBurstinessOf on the shared tokenizer.
    "q203_token_burstiness" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |v AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM t GROUP BY 1)
        |SELECT token, cf, df, cf * 1000000 // df AS burst_micro
        |FROM v WHERE cf >= 20
        |ORDER BY burst_micro DESC, token ASC
        |LIMIT 20""".stripMargin,

    // Replays Relational.marketShareShiftOf: (nation, year) collapse,
    // per-year totals, integral shares, YoY lag.
    "q204_market_share_shift" ->
      """WITH ny AS (
        |  SELECT n.n_name, year(o.o_orderdate) AS yr,
        |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |yt AS (SELECT yr, CAST(SUM(revenue_cents) AS BIGINT) AS yt
        |       FROM ny GROUP BY 1),
        |s AS (
        |  SELECT ny.n_name, ny.yr, ny.revenue_cents,
        |    CAST(ny.revenue_cents::HUGEINT * 1000000 // yt.yt AS BIGINT)
        |      AS share_ppm
        |  FROM ny JOIN yt ON ny.yr = yt.yr)
        |SELECT n_name, CAST(yr AS BIGINT) AS yr, revenue_cents,
        |  share_ppm,
        |  share_ppm - lag(share_ppm, 1) OVER (PARTITION BY n_name
        |    ORDER BY yr) AS delta_share_ppm
        |FROM s ORDER BY n_name, yr""".stripMargin,

    // Replays Events.domProfileOf: occurrence-normalized dom index in
    // HUGEINT, the pinned idx*100-dom peak rule.
    "q205_dom_profile" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        |cal AS (
        |  SELECT day,
        |    CAST(day(DATE '1970-01-01' + day * INTERVAL 1 DAY)
        |      AS BIGINT) AS dom
        |  FROM (SELECT unnest(generate_series(mn, mx)) AS day FROM b) g),
        |occ AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS occ
        |        FROM cal GROUP BY 1),
        |tt AS (
        |  SELECT event_type, CAST(SUM(cents) AS BIGINT) AS tot_cents,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cal) AS total_days
        |  FROM daily GROUP BY 1),
        |bd AS (
        |  SELECT d.event_type, c.dom, CAST(SUM(d.cents) AS BIGINT)
        |      AS cents
        |  FROM daily d JOIN cal c ON d.day = c.day
        |  GROUP BY 1, 2),
        |ix AS (
        |  SELECT bd.event_type, bd.dom, bd.cents, occ.occ,
        |    CAST(bd.cents::HUGEINT * tt.total_days * 1000000
        |      // (occ.occ::HUGEINT * nullif(tt.tot_cents, 0)) AS BIGINT)
        |      AS idx_ppm
        |  FROM bd JOIN occ ON bd.dom = occ.dom
        |  JOIN tt ON bd.event_type = tt.event_type),
        |pk AS (
        |  SELECT event_type, MAX(idx_ppm * 100 - dom) AS pk
        |  FROM ix GROUP BY 1)
        |SELECT ix.event_type, ix.dom, ix.cents, ix.occ, ix.idx_ppm,
        |  CAST(CASE WHEN ix.idx_ppm * 100 - ix.dom = pk.pk THEN 1
        |       ELSE 0 END AS BIGINT) AS is_peak
        |FROM ix JOIN pk ON ix.event_type = pk.event_type
        |ORDER BY ix.event_type, ix.dom""".stripMargin,

    // Replays Relational.concentrationOf: pinned per-nation ranks,
    // top-k prefix sums, integral shares.
    "q206_concentration_ratios" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |sn AS (
        |  SELECT sp.o_custkey, CAST(c.c_nationkey AS BIGINT) AS nation,
        |    sp.cents
        |  FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
        |t AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(cents) AS BIGINT) AS total_cents
        |  FROM sn GROUP BY 1),
        |r AS (
        |  SELECT nation, cents,
        |    ROW_NUMBER() OVER (PARTITION BY nation
        |      ORDER BY cents DESC, o_custkey ASC) AS rnk
        |  FROM sn),
        |k AS (
        |  SELECT nation,
        |    CAST(SUM(CASE WHEN rnk <= 1 THEN cents ELSE 0 END)
        |      AS BIGINT) AS t1,
        |    CAST(SUM(CASE WHEN rnk <= 4 THEN cents ELSE 0 END)
        |      AS BIGINT) AS t4,
        |    CAST(SUM(cents) AS BIGINT) AS t10
        |  FROM r WHERE rnk <= 10 GROUP BY 1)
        |SELECT k.nation, t.n_customers, t.total_cents,
        |  CAST(k.t1::HUGEINT * 1000000 // t.total_cents AS BIGINT)
        |    AS cr1_ppm,
        |  CAST(k.t4::HUGEINT * 1000000 // t.total_cents AS BIGINT)
        |    AS cr4_ppm,
        |  CAST(k.t10::HUGEINT * 1000000 // t.total_cents AS BIGINT)
        |    AS cr10_ppm
        |FROM k JOIN t ON k.nation = t.nation
        |ORDER BY k.nation""".stripMargin,

    // Replays Relational.promoLiftOf: per-discount collapse, the
    // cross-multiplied baseline lift in HUGEINT.
    "q207_promo_lift" ->
      """WITH per AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(8, 6)) * 1000000
        |      AS BIGINT) AS disc_ppm,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100
        |      AS BIGINT)) AS BIGINT) AS sum_qty_centi
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT n_lines AS n0, sum_qty_centi AS q0 FROM per
        |      WHERE disc_ppm = 0)
        |SELECT disc_ppm, n_lines, sum_qty_centi,
        |  sum_qty_centi // n_lines AS avg_qty_centi,
        |  CAST(sum_qty_centi::HUGEINT * n0 * 1000000
        |    // (n_lines::HUGEINT * nullif(q0, 0)) AS BIGINT) AS lift_ppm
        |FROM per CROSS JOIN b
        |ORDER BY disc_ppm""".stripMargin,

    // Replays Relational.deadStockOf: trailing-window distinct sellers,
    // catalog left join, per-brand rollup.
    "q208_dead_stock" ->
      """WITH mx AS (
        |  SELECT MAX(epoch_us(l_shipdate) // 86400000000) AS m
        |  FROM lineitem),
        |recent AS (
        |  SELECT DISTINCT l_partkey AS p_partkey
        |  FROM lineitem CROSS JOIN mx
        |  WHERE epoch_us(l_shipdate) // 86400000000 > m - 365)
        |SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(CASE WHEN r.p_partkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dead,
        |  CAST(SUM(CASE WHEN r.p_partkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // COUNT(*) AS dead_ppm,
        |  CAST(SUM(CASE WHEN r.p_partkey IS NULL THEN
        |    CAST(CAST(p.p_retailprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS dead_value_cents
        |FROM part p LEFT JOIN recent r ON p.p_partkey = r.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays Graph.degreeCensusOf on q183's strong-edge CTE: binary
    // floor-log2 bands, the two-pass milli-centered moments in
    // HUGEINT, the sqrt-free (sign, r2) verdict.
    "q209_degree_census" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |se AS MATERIALIZED (
        |  SELECT a.p AS src, b.p AS dst
        |  FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM se GROUP BY 1),
        |pr AS (
        |  SELECT dx.d AS x, dy.d AS y
        |  FROM se JOIN deg dx ON se.src = dx.src
        |  JOIN deg dy ON se.dst = dy.src),
        |p1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(x) AS BIGINT) * 1000 // COUNT(*) AS mx,
        |    CAST(SUM(y) AS BIGINT) * 1000 // COUNT(*) AS my
        |  FROM pr),
        |p2 AS (
        |  SELECT MAX(m) AS m,
        |    SUM((x * 1000 - mx)::HUGEINT * (y * 1000 - my)) AS covS,
        |    SUM((x * 1000 - mx)::HUGEINT * (x * 1000 - mx)) AS vxS,
        |    SUM((y * 1000 - my)::HUGEINT * (y * 1000 - my)) AS vyS
        |  FROM pr CROSS JOIN p1),
        |p3 AS (
        |  SELECT m, covS // m AS covM, vxS // m AS vxM, vyS // m AS vyM
        |  FROM p2),
        |summ AS (
        |  SELECT CAST(m AS BIGINT) AS m_edges,
        |    CAST(CASE WHEN covM > 0 THEN 1 WHEN covM < 0 THEN -1
        |      ELSE 0 END AS BIGINT) AS r_sign,
        |    CAST(covM * covM * 1000000 // nullif(vxM * vyM, 0)
        |      AS BIGINT) AS r2_ppm
        |  FROM p3),
        |census AS (
        |  SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(MIN(d) AS BIGINT) AS min_deg,
        |    CAST(MAX(d) AS BIGINT) AS max_deg
        |  FROM deg GROUP BY 1)
        |SELECT band, n_nodes, min_deg, max_deg, m_edges, r_sign, r2_ppm
        |FROM census CROSS JOIN summ
        |ORDER BY band""".stripMargin,

    // Replays Similarity.knnHubnessOf: q21's rounded-cosine all-pairs
    // kNN, k-occurrence counts, orphans, the pinned hub.
    "q210_knn_hubness" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS q_id, v.vec_id,
        |    round(
        |      list_sum(list_transform(range(1, len(q.e) + 1),
        |        i -> q.e[i] * v.e[i])) /
        |      (sqrt(list_sum(list_transform(q.e, x -> x * x))) *
        |       sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6)
        |      AS cos
        |  FROM v CROSS JOIN v q
        |  WHERE v.vec_id <> q.vec_id),
        |r AS (
        |  SELECT q_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM p),
        |occ AS (
        |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_k
        |  FROM r WHERE rn <= 5 GROUP BY 1),
        |pv AS (
        |  SELECT v.vec_id, COALESCE(occ.n_k, 0) AS n_k
        |  FROM v LEFT JOIN occ ON v.vec_id = occ.vec_id),
        |s1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    CAST(SUM(CASE WHEN n_k = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphans,
        |    CAST(MAX(n_k) AS BIGINT) AS max_nk
        |  FROM pv),
        |hub AS (
        |  SELECT CAST(MIN(pv.vec_id) AS BIGINT) AS hub_id
        |  FROM pv CROSS JOIN s1 WHERE pv.n_k = s1.max_nk),
        |summ AS (
        |  SELECT n_vecs, n_orphans * 1000000 // n_vecs AS orphan_ppm,
        |    max_nk, hub_id
        |  FROM s1 CROSS JOIN hub)
        |SELECT pv.n_k, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  summ.n_vecs, CAST(summ.orphan_ppm AS BIGINT) AS orphan_ppm,
        |  summ.max_nk, summ.hub_id
        |FROM pv CROSS JOIN summ
        |GROUP BY pv.n_k, summ.n_vecs, summ.orphan_ppm, summ.max_nk,
        |  summ.hub_id
        |ORDER BY pv.n_k""".stripMargin,

    // Replays Graph.clusteringProfileOf on the q183/q209 strong-edge
    // CTE: exact triangle corners via the canonical a<b<c join, the
    // cross-multiplied cc floor, band means, and both global ratios.
    "q211_clustering_profile" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |se AS MATERIALIZED (
        |  SELECT a.p AS src, b.p AS dst
        |  FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS MATERIALIZED (
        |  SELECT src AS u, dst AS v FROM se WHERE src < dst),
        |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM se GROUP BY 1),
        |tri AS (
        |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |  FROM und ab JOIN und bc ON ab.v = bc.u
        |  JOIN und ac ON ac.u = ab.u AND ac.v = bc.v),
        |corner AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |tcnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS t
        |         FROM corner GROUP BY 1),
        |nodes AS (
        |  SELECT deg.id, deg.d, COALESCE(tcnt.t, 0) AS t,
        |    CASE WHEN deg.d >= 2 THEN
        |      CAST(COALESCE(tcnt.t, 0)::HUGEINT * 2 * 1000000
        |        // (deg.d::HUGEINT * (deg.d - 1)) AS BIGINT)
        |    END AS cc_ppm
        |  FROM deg LEFT JOIN tcnt USING (id)),
        |gl AS (
        |  SELECT
        |    CAST(SUM(cc_ppm) // nullif(SUM(CASE WHEN cc_ppm IS NOT NULL
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS avg_cc_ppm,
        |    CAST(SUM(t)::HUGEINT * 2 * 1000000
        |      // nullif(SUM(d::HUGEINT * (d - 1)), 0) AS BIGINT)
        |      AS transitivity_ppm,
        |    CAST(SUM(t) // 3 AS BIGINT) AS n_triangles
        |  FROM nodes),
        |bands AS (
        |  SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(CASE WHEN cc_ppm IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_eligible,
        |    CAST(SUM(cc_ppm) // nullif(SUM(CASE WHEN cc_ppm IS NOT NULL
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS mean_cc_ppm,
        |    CAST(MAX(t) AS BIGINT) AS max_triangles
        |  FROM nodes GROUP BY 1)
        |SELECT band, n_nodes, n_eligible, mean_cc_ppm, max_triangles,
        |  avg_cc_ppm, transitivity_ppm, n_triangles
        |FROM bands CROSS JOIN gl ORDER BY band""".stripMargin,

    // Replays RankTests.mannWhitneyOf: whole-dollar value histogram,
    // doubled midranks, the three-floor z2 chain, χ²(1) verdict. All
    // `//` operands are HUGEINT (DuckDB // is only integral on
    // integer types; on DECIMAL it is true division).
    "q212_mann_whitney" ->
      s"""WITH src AS (
         |  SELECT o_orderpriority AS g,
         |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
         |      // 100 AS v
         |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         |h AS MATERIALIZED (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
         |mr AS (
         |  SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
         |    + cnt + 1 AS mr2
         |  FROM h),
         |grp AS (
         |  SELECT g, CAST(SUM(n_gv) AS BIGINT) AS n_g,
         |    SUM(n_gv::HUGEINT * mr2) AS r2_g
         |  FROM (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS n_gv
         |        FROM src GROUP BY 1, 2) gh
         |  JOIN mr USING (v) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
         |    SUM(cnt::HUGEINT * cnt * cnt - cnt) AS tie_term FROM h),
         |calc AS (
         |  SELECT a.n_g AS n_a, b.n_g AS n_b,
         |    a.r2_g - a.n_g::HUGEINT * (a.n_g + 1) AS u2_a,
         |    n_total, tie_term,
         |    n_total::HUGEINT * n_total * n_total - n_total - tie_term
         |      AS w_big
         |  FROM grp a CROSS JOIN grp b CROSS JOIN tot
         |  WHERE a.g = '1-URGENT' AND b.g = '5-LOW'),
         |c2 AS (
         |  SELECT *,
         |    (u2_a - n_a::HUGEINT * n_b) * 1000000
         |      // (n_a::HUGEINT * n_b) AS r_rb_ppm,
         |    w_big // nullif(n_total::HUGEINT * (n_total - 1), 0) AS v_fl
         |  FROM calc),
         |c3 AS (
         |  SELECT *, 3 * r_rb_ppm * r_rb_ppm * n_a * n_b
         |    // nullif(v_fl * 1000000, 0) AS z2_micro
         |  FROM c2)
         |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(u2_a AS BIGINT) AS u2_a,
         |  CAST(r_rb_ppm AS BIGINT) AS r_rb_ppm,
         |  CAST(tie_term AS BIGINT) AS tie_term,
         |  CAST(z2_micro AS BIGINT) AS z2_micro,
         |  CAST(${graft.ops.Events.Chi2Crit95Ppm.head} AS BIGINT)
         |    AS crit_micro,
         |  CAST(CASE WHEN z2_micro IS NULL THEN NULL
         |    WHEN z2_micro > ${graft.ops.Events.Chi2Crit95Ppm.head}
         |      THEN 1 ELSE 0 END AS BIGINT) AS significant,
         |  CASE WHEN r_rb_ppm > 0 THEN '1-URGENT'
         |       WHEN r_rb_ppm < 0 THEN '5-LOW'
         |       ELSE 'tie' END AS winner
         |FROM c3""".stripMargin,

    // Replays RankTests.kruskalWallisOf: same midrank engine over all
    // five priorities, exact doubled deviations, the ppm/per-mille
    // floors, χ²(k−1) verdict off the shared table (1-based index).
    "q213_kruskal_wallis" ->
      s"""WITH src AS (
         |  SELECT o_orderpriority AS g,
         |    CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
         |      // 100 AS v
         |  FROM orders),
         |h AS MATERIALIZED (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
         |mr AS (
         |  SELECT v, 2 * (SUM(cnt) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
         |    + cnt + 1 AS mr2
         |  FROM h),
         |grp AS (
         |  SELECT g, CAST(SUM(n_gv) AS BIGINT) AS n_g,
         |    SUM(n_gv::HUGEINT * mr2) AS r2_g
         |  FROM (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS n_gv
         |        FROM src GROUP BY 1, 2) gh
         |  JOIN mr USING (v) GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
         |    SUM(cnt::HUGEINT * cnt * cnt - cnt) AS tie_term FROM h),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_groups FROM grp),
         |devs AS (
         |  SELECT g, n_g,
         |    (r2_g - n_g::HUGEINT * (n_total + 1)) * 1000000
         |      // (n_g::HUGEINT * n_total) AS d_ppm
         |  FROM grp CROSS JOIN tot),
         |summ AS (
         |  SELECT SUM(n_g::HUGEINT * d_ppm * d_ppm) AS s_dev FROM devs),
         |s2 AS (
         |  SELECT n_total, tie_term, k_groups,
         |    3 * n_total::HUGEINT * s_dev
         |      // (1000000 * (n_total::HUGEINT + 1)) AS h_micro,
         |    1000 - tie_term::HUGEINT * 1000
         |      // (n_total::HUGEINT * n_total * n_total - n_total) AS c_pm
         |  FROM summ CROSS JOIN tot CROSS JOIN kk),
         |s3 AS (
         |  SELECT n_total, CAST(tie_term AS BIGINT) AS tie_term,
         |    CAST(h_micro AS BIGINT) AS h_micro,
         |    CAST(h_micro * 1000 // nullif(c_pm, 0) AS BIGINT)
         |      AS h_tie_micro,
         |    CAST(k_groups - 1 AS BIGINT) AS df_chi2,
         |    CAST(([${graft.ops.Events.Chi2Crit95Ppm.mkString(",")}])
         |      [k_groups - 1] AS BIGINT) AS crit_micro
         |  FROM s2),
         |s4 AS (
         |  SELECT s3.*,
         |    CAST(CASE WHEN h_tie_micro IS NULL OR crit_micro IS NULL
         |      THEN NULL
         |      WHEN h_tie_micro > crit_micro THEN 1 ELSE 0 END
         |      AS BIGINT) AS significant
         |  FROM s3)
         |SELECT g, n_g,
         |  CAST(r2_g // n_g::HUGEINT AS BIGINT) AS mean_rank2,
         |  n_total, tie_term, h_micro, h_tie_micro, df_chi2,
         |  crit_micro, significant
         |FROM grp CROSS JOIN s4
         |ORDER BY g""".stripMargin,
  )

  /** The q219/q224/q225 shared oracle CTE block: the (nat, sign, seg)
    * count cube and the Laplace-smoothed fixed-point NB scores —
    * mirrors `Features.nbCube`/`nbScores`.
    */
  private def nbScoreCtes: String =
    """cube AS MATERIALIZED (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
      |    CAST(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT)
      |      AS bsign,
      |    c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2, 3),
      |cls AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS n_c
      |        FROM cube GROUP BY 1),
      |nats AS (SELECT nat, seg, CAST(SUM(n) AS BIGINT) AS n_natc
      |         FROM cube GROUP BY 1, 2),
      |sgn AS (SELECT bsign, seg, CAST(SUM(n) AS BIGINT) AS n_signc
      |        FROM cube GROUP BY 1, 2),
      |dn AS (SELECT CAST(COUNT(DISTINCT nat) AS BIGINT) AS d_nat
      |       FROM cube),
      |combos AS (SELECT DISTINCT nat, bsign FROM cube),
      |sc AS (
      |  SELECT c.nat, c.bsign, cls.seg,
      |    CAST(cls.n_c::HUGEINT * (COALESCE(nats.n_natc, 0) + 1)
      |      * (COALESCE(sgn.n_signc, 0) + 1) * 1000000000000
      |      // ((cls.n_c + d_nat)::HUGEINT * (cls.n_c + 2))
      |      AS BIGINT) AS s_fp
      |  FROM combos c CROSS JOIN cls
      |  LEFT JOIN nats ON nats.nat = c.nat AND nats.seg = cls.seg
      |  LEFT JOIN sgn ON sgn.bsign = c.bsign AND sgn.seg = cls.seg
      |  CROSS JOIN dn)""".stripMargin

  /** One level of the q216 oracle: per-group EMD/TV distance against
    * the global sensitive distribution with the closed-form
    * absent-class mass, then the level rollup — all `//` operands
    * HUGEINT/BIGINT.
    */
  private def tClosenessArm(name: String, key: String): String =
    s"""SELECT '$name' AS level, CAST(COUNT(*) AS BIGINT) AS n_groups,
       |    CAST(SUM(CASE WHEN t_ppm > 200000 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_violating,
       |    CAST(MAX(t_ppm) AS BIGINT) AS max_t_ppm,
       |    CAST(SUM(CASE WHEN t_ppm > 200000 THEN n_g ELSE 0 END)
       |      * 1000000 // MAX(n_total) AS BIGINT) AS risk_ppm
       |  FROM (
       |    SELECT n_g, n_total,
       |      (s_present + (n_total - c_present)::HUGEINT * n_g)
       |        * 1000000 // (2 * n_g::HUGEINT * n_total) AS t_ppm
       |    FROM (
       |      SELECT gc.$key, MAX(n_g) AS n_g, MAX(n_total) AS n_total,
       |        SUM(abs(n_gc::HUGEINT * n_total - n_c::HUGEINT * n_g))
       |          AS s_present,
       |        SUM(n_c) AS c_present
       |      FROM (SELECT $key, sens, CAST(COUNT(*) AS BIGINT) AS n_gc
       |            FROM base GROUP BY 1, 2) gc
       |      JOIN (SELECT $key, CAST(COUNT(*) AS BIGINT) AS n_g
       |            FROM base GROUP BY 1) gt USING ($key)
       |      JOIN gsens USING (sens) CROSS JOIN tt
       |      GROUP BY 1) p) q""".stripMargin

  /** Builds the q214 oracle: the EWMA level/variance recursions as a
    * per-type linear recursive CTE over the densified calendar,
    * replaying the operator's per-day floors exactly (all operands
    * non-negative, so `//` and `div` agree trivially).
    */
  private def ewmaSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
       |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
       |dense AS (
       |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN cal
       |  LEFT JOIN daily d ON d.event_type = t.event_type
       |    AND d.day = cal.day),
       |p AS (
       |  SELECT event_type,
       |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mu,
       |    CAST((COUNT(*)::HUGEINT * SUM(cents::HUGEINT * cents)
       |        - SUM(cents)::HUGEINT * SUM(cents))
       |      // (COUNT(*)::HUGEINT * COUNT(*)) AS BIGINT) AS sig2
       |  FROM dense GROUP BY 1),
       |d2 AS (
       |  SELECT dense.event_type, day, cents, mu, sig2,
       |    ROW_NUMBER() OVER (PARTITION BY dense.event_type
       |      ORDER BY day) AS rn
       |  FROM dense JOIN p USING (event_type)),
       |sweep(event_type, rn, z, v) AS (
       |  SELECT event_type, rn,
       |    (200 * cents + 800 * mu) // 1000,
       |    (40000 * sig2) // 1000000
       |  FROM d2 WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn,
       |    (200 * d2.cents + 800 * s.z) // 1000,
       |    (640000 * s.v + 40000 * d2.sig2) // 1000000
       |  FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |    AND d2.rn = s.rn + 1)
       |SELECT d2.event_type, d2.day, d2.cents,
       |  CAST(s.z AS BIGINT) AS ewma_cents,
       |  CAST(s.v AS BIGINT) AS v_cents2,
       |  CAST(CASE WHEN (s.z - d2.mu)::HUGEINT * (s.z - d2.mu)
       |         > 9 * s.v::HUGEINT
       |    THEN CASE WHEN s.z > d2.mu THEN 1 ELSE -1 END
       |    ELSE 0 END AS BIGINT) AS alarm
       |FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |  AND d2.rn = s.rn
       |ORDER BY 1, 2""".stripMargin

  /** The q169 Kaplan-Meier oracle chain (per-user censored collapse,
    * risk sets, the recursive floored product), shared by the q169
    * and q249 oracles so the curve arithmetic cannot drift.
    */
  private def kmCtes: String =
    """pu AS (
      |  SELECT user_id,
      |    MIN(epoch_us(ts) // 1000000 // 86400) AS first_day,
      |    MIN(CASE WHEN event_type = 'purchase'
      |      THEN epoch_us(ts) // 1000000 // 86400 END) AS purch_day
      |  FROM events GROUP BY user_id),
      |mx AS (
      |  SELECT MAX(epoch_us(ts) // 1000000 // 86400) AS max_day
      |  FROM events),
      |subj AS (
      |  SELECT CASE WHEN purch_day IS NOT NULL
      |      THEN purch_day - first_day
      |      ELSE (SELECT max_day FROM mx) - first_day END AS t,
      |    CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM pu),
      |h AS (
      |  SELECT t, CAST(SUM(e) AS BIGINT) AS d,
      |    CAST(SUM(1 - e) AS BIGINT) AS c,
      |    CAST(COUNT(*) AS BIGINT) AS n_t
      |  FROM subj GROUP BY t),
      |tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM h),
      |risk AS (
      |  SELECT t, d, c,
      |    (SELECT n_total FROM tot)
      |      - COALESCE(SUM(n_t) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS n_at_risk,
      |    ROW_NUMBER() OVER (ORDER BY t) AS rn
      |  FROM h),
      |km(rn, km_ppm) AS (
      |  SELECT rn, 1000000 * (n_at_risk - d) // n_at_risk
      |  FROM risk WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, k.km_ppm * (r.n_at_risk - r.d) // r.n_at_risk
      |  FROM km k JOIN risk r ON r.rn = k.rn + 1)""".stripMargin

  private val MondrianK = 25L
  private val MondrianRounds = 6
  private val LinkPredCap = 32
  /** Committed raw-document fixture (see FIXTURES.md §1) — absolute
    * because the driver's Verify/DuckDB passes share no working dir.
    */
  private val SpotifyFixture = "/root/repo/fixtures/spotify_raw.parquet"
  private val FixtureDate = "2026-01-01"
  private val LaggedSpearmanMaxLag = 3

  /** One q247 pair block: contingency cells, margins, the
    * present-cells chi-square identity with per-cell floors.
    */
  private def cramersPairCtes(i: Int, a: String, b: String): String =
    s"""p${i}c AS MATERIALIZED (
       |  SELECT $a AS va, $b AS vb, CAST(COUNT(*) AS BIGINT) AS o
       |  FROM base GROUP BY 1, 2),
       |p$i AS (
       |  SELECT '$a' AS col_a, '$b' AS col_b, n,
       |    CAST(COUNT(DISTINCT va) AS BIGINT) AS k_a,
       |    CAST(COUNT(DISTINCT vb) AS BIGINT) AS k_b,
       |    CAST(SUM(o::HUGEINT * o * n * 1000000
       |      // (ra.r::HUGEINT * rb.c)) - n::HUGEINT * 1000000
       |      AS BIGINT) AS chi2_micro
       |  FROM p${i}c
       |  JOIN (SELECT va, CAST(SUM(o) AS BIGINT) AS r FROM p${i}c
       |        GROUP BY 1) ra USING (va)
       |  JOIN (SELECT vb, CAST(SUM(o) AS BIGINT) AS c FROM p${i}c
       |        GROUP BY 1) rb USING (vb)
       |  CROSS JOIN n0
       |  GROUP BY n)""".stripMargin

  /** Builds the q243 oracle: `rounds` unrolled Mondrian levels — per
    * round, per-dimension value-domain histograms with cumulative
    * ranks, the lower-median QUALIFY pick, the wider-range strict cut
    * rule, and the injective base-3 3p/3p+1/3p+2 triple-map
    * reassignment — the kcoreCtes unrolling discipline.
    */
  private def mondrianCtes(k: Long, rounds: Int): String = {
    val base =
      """r0 AS MATERIALIZED (
        |  SELECT CAST(round(c_acctbal) AS BIGINT) AS bal,
        |    CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(0 AS BIGINT) AS pid
        |  FROM customer)""".stripMargin
    def hist(i: Int, d: String, c: String) =
      s"""h$i$d AS MATERIALIZED (
         |  SELECT pid, $c AS v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM r${i - 1} GROUP BY 1, 2),
         |c$i$d AS (
         |  SELECT pid, v,
         |    SUM(c) OVER (PARTITION BY pid ORDER BY v) AS cum,
         |    SUM(c) OVER (PARTITION BY pid) AS n
         |  FROM h$i$d),
         |m$i$d AS (
         |  SELECT pid, v AS med, cum AS lft FROM c$i$d
         |  WHERE cum >= (n + 1) // 2
         |  QUALIFY row_number() OVER (PARTITION BY pid ORDER BY v)
         |    = 1)""".stripMargin
    val rs = (1 to rounds).map { i =>
      val wide = "g.mxb - g.mnb >= g.mxn - g.mnn"
      val lft = s"(CASE WHEN $wide THEN b.lft ELSE nn.lft END)"
      s"""${hist(i, "b", "bal")},
         |${hist(i, "n", "nat")},
         |g$i AS (
         |  SELECT pid, MIN(bal) AS mnb, MAX(bal) AS mxb,
         |    MIN(nat) AS mnn, MAX(nat) AS mxn,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM r${i - 1} GROUP BY 1),
         |e$i AS (
         |  SELECT g.pid,
         |    CASE WHEN $wide THEN 0 ELSE 1 END AS dim,
         |    CASE WHEN $wide THEN b.med ELSE nn.med END AS med,
         |    CASE WHEN g.n >= 2 * $k AND $lft >= $k
         |         AND g.n - $lft >= $k THEN 1 ELSE 0 END AS do_cut
         |  FROM g$i g JOIN m${i}b b ON g.pid = b.pid
         |  JOIN m${i}n nn ON g.pid = nn.pid),
         |r$i AS MATERIALIZED (
         |  SELECT r.bal, r.nat,
         |    CASE WHEN e.do_cut = 1 AND ((e.dim = 0 AND r.bal <= e.med)
         |           OR (e.dim = 1 AND r.nat <= e.med))
         |      THEN r.pid * 3 + 1
         |      WHEN e.do_cut = 1 THEN r.pid * 3 + 2
         |      ELSE r.pid * 3 END AS pid
         |  FROM r${i - 1} r JOIN e$i e ON r.pid = e.pid)""".stripMargin
    }
    (base +: rs).mkString(",\n")
  }

  /** Builds the q234 oracle: the per-type linear recursive CTE replay
    * of Events.holtChartOfDaily, the l_t step interpolated twice
    * (into both l and b) because neither a recursive CTE nor the fold
    * lambda can bind intermediates.
    */
  private def holtSql: String = {
    val lNew = "(300 * d2.cents + 700 * (s.l + s.bb)) // 1000"
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
       |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
       |dense AS (
       |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN cal
       |  LEFT JOIN daily d ON d.event_type = t.event_type
       |    AND d.day = cal.day),
       |d2 AS (
       |  SELECT event_type, day, cents,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY day) AS rn
       |  FROM dense),
       |sweep(event_type, rn, l, bb, f) AS (
       |  SELECT event_type, rn, cents, CAST(0 AS BIGINT), cents
       |  FROM d2 WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn,
       |    $lNew,
       |    (100 * ($lNew - s.l) + 900 * s.bb) // 1000,
       |    s.l + s.bb
       |  FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |    AND d2.rn = s.rn + 1)
       |SELECT d2.event_type, d2.day, d2.cents,
       |  CAST(s.l AS BIGINT) AS level_cents,
       |  CAST(s.bb AS BIGINT) AS trend_cents,
       |  CAST(s.f AS BIGINT) AS forecast_cents,
       |  CAST(d2.cents - s.f AS BIGINT) AS err_cents
       |FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |  AND d2.rn = s.rn
       |ORDER BY 1, 2""".stripMargin
  }

  /** Builds the q187 oracle: the tabular-CUSUM step expressions are
    * interpolated twice (seed row and recursive row) because a
    * recursive CTE cannot bind intermediates.
    */
  private def cusumSql: String = {
    def np(cp: String, q: String) =
      s"greatest(0, $cp + $q.cents - $q.mu - $q.kk)"
    def nn(cn: String, q: String) =
      s"greatest(0, $cn + $q.mu - $q.kk - $q.cents)"
    def al(cp: String, cn: String, q: String) =
      s"""CASE WHEN ${np(cp, q)} > $q.mu THEN 1
         |       WHEN ${nn(cn, q)} > $q.mu THEN -1 ELSE 0 END""".stripMargin
    def stepRow(cp: String, cn: String, q: String) =
      s"""CASE WHEN (${al(cp, cn, q)}) <> 0 THEN 0
         |      ELSE ${np(cp, q)} END,
         |    CASE WHEN (${al(cp, cn, q)}) <> 0 THEN 0
         |      ELSE ${nn(cn, q)} END,
         |    ${np(cp, q)}, ${nn(cn, q)}, ${al(cp, cn, q)}""".stripMargin
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, epoch_us(ts) // 1000000 // 86400 AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(12, 2)) * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
       |cal AS (SELECT unnest(generate_series(mn, mx)) AS day FROM b),
       |dense AS (
       |  SELECT t.event_type, cal.day, COALESCE(d.cents, 0) AS cents
       |  FROM (SELECT DISTINCT event_type FROM daily) t
       |  CROSS JOIN cal
       |  LEFT JOIN daily d ON d.event_type = t.event_type
       |    AND d.day = cal.day),
       |p AS (
       |  SELECT event_type,
       |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS mu,
       |    (CAST(SUM(cents) AS BIGINT) // COUNT(*)) // 20 AS kk
       |  FROM dense GROUP BY 1),
       |d2 AS (
       |  SELECT dense.event_type, day, cents, mu, kk,
       |    ROW_NUMBER() OVER (PARTITION BY dense.event_type
       |      ORDER BY day) AS rn
       |  FROM dense JOIN p USING (event_type)),
       |sweep(event_type, rn, cp, cn, ep, en, al) AS (
       |  SELECT event_type, rn,
       |    ${stepRow("0", "0", "d2")}
       |  FROM d2 WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn,
       |    ${stepRow("s.cp", "s.cn", "d2")}
       |  FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |    AND d2.rn = s.rn + 1)
       |SELECT d2.event_type, d2.day, d2.cents,
       |  CAST(s.ep AS BIGINT) AS cpos, CAST(s.en AS BIGINT) AS cneg,
       |  CAST(s.al AS BIGINT) AS alarm
       |FROM sweep s JOIN d2 ON d2.event_type = s.event_type
       |  AND d2.rn = s.rn
       |ORDER BY 1, 2""".stripMargin
  }

  /** One nested-WITH arm replaying `Stats.equidepthOf(t, c, buckets)`
    * up to the `rg` ranges-with-counts CTE, then running `body` over
    * it — shared by the q159 and q160 oracles.
    */
  private def equidepthArmSql(t: String, c: String, buckets: Int,
      body: String): String = {
    val picks = (1 to buckets).map(i =>
      s"SELECT CAST($i AS BIGINT) AS bucket, (SELECT MIN(cents) FROM cm" +
        s" WHERE cum * $buckets >= (SELECT n FROM tt) * $i) AS hi")
      .mkString("\n    UNION ALL ")
    s"""SELECT * FROM (
       |WITH h AS (
       |  SELECT CAST(CAST($c AS DECIMAL(12, 2)) * 100 AS BIGINT) AS cents,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM $t GROUP BY 1),
       |cm AS (
       |  SELECT cents, cnt,
       |    SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM h),
       |tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
       |       MIN(cents) - 1 AS floor_lo FROM h),
       |bd AS (
       |    $picks),
       |rg0 AS (
       |  SELECT '$t' AS table_name, '$c' AS column_name, bucket,
       |    COALESCE(lag(hi) OVER (ORDER BY bucket),
       |      (SELECT floor_lo FROM tt)) AS lo,
       |    hi
       |  FROM bd),
       |rg AS (
       |  SELECT table_name, column_name, bucket, lo, hi,
       |    COALESCE((SELECT CAST(SUM(c2.cnt) AS BIGINT) FROM cm c2
       |      WHERE c2.cents > rg0.lo AND c2.cents <= rg0.hi), 0) AS n_rows
       |  FROM rg0)
       |$body) arm_${t}_$c""".stripMargin
  }

  /** Replays `Similarity.annRecallLadder(k)`: four UNION arms, each a
    * nested WITH holding the exact chain (x-prefixed CTEs, the q21
    * arithmetic cut to k) plus that arm's ALREADY-PROVEN method chain
    * (q61 int8 / q117 PQ / q29 LSH, verbatim CTE text), reduced to
    * probe/pair/hit counts and one integral recall division.
    */
  private def annLadderOracleSql(k: Int): String = {
    val exactCtes =
      s"""xv AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |xq AS (SELECT vec_id AS q_id, e AS qe FROM xv WHERE vec_id < 8),
         |xp AS (
         |  SELECT xq.q_id, xv.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i])) /
         |      (sqrt(list_sum(list_transform(qe, x -> x * x))) *
         |       sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
         |  FROM xv CROSS JOIN xq
         |  WHERE xv.vec_id <> xq.q_id),
         |ex AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, vec_id ASC) AS rn FROM xp) t
         |  WHERE rn <= $k)""".stripMargin
    def armBody(name: String) =
      s"""SELECT '$name' AS method,
         |  CAST((SELECT COUNT(DISTINCT q_id) FROM tk) AS BIGINT) AS n_probes,
         |  CAST((SELECT COUNT(*) FROM tk) AS BIGINT) AS n_pairs,
         |  CAST((SELECT COUNT(*) FROM tk JOIN ex USING (q_id, vec_id))
         |    AS BIGINT) AS n_hits,
         |  CAST((SELECT COUNT(*) FROM tk JOIN ex USING (q_id, vec_id))
         |    AS BIGINT) * 1000000
         |    // CAST((SELECT COUNT(*) FROM tk) AS BIGINT) AS recall_ppm"""
        .stripMargin
    def arm(name: String, methodCtes: String) =
      s"""SELECT * FROM (
         |WITH $exactCtes${if (methodCtes.isEmpty) "" else ",\n" + methodCtes}
         |${armBody(name)}) arm_$name""".stripMargin
    val exactArm = arm("a_exact", "tk AS (SELECT * FROM ex)")
    val int8Ctes =
      s"""s AS (
         |  SELECT vec_id, e,
         |    sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM xv),
         |qt AS (
         |  SELECT vec_id,
         |    CASE WHEN nrm = 0 THEN list_transform(e, x -> 0)
         |    ELSE list_transform(e,
         |      x -> CAST(floor(x / nrm * 127.0 + 0.5) AS INTEGER)) END AS q
         |  FROM s),
         |p AS (
         |  SELECT qs.vec_id AS q_id, t.vec_id,
         |    CAST(list_sum(list_transform(range(1, len(qs.q) + 1),
         |      i -> CAST(qs.q[i] AS BIGINT) * CAST(t.q[i] AS BIGINT)))
         |      AS BIGINT) AS qdot
         |  FROM qt t CROSS JOIN (SELECT * FROM qt WHERE vec_id < 8) qs
         |  WHERE t.vec_id <> qs.vec_id),
         |r AS (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY qdot DESC, vec_id ASC) AS rn
         |  FROM p),
         |tk AS (SELECT q_id, vec_id FROM r WHERE rn <= $k)""".stripMargin
    val pqCteChain =
      s"""${pqCtes(PqM, PqSubDim, PqKSub, PqIters)},
         |codes AS (
         |  SELECT vec_id, list(cluster ORDER BY sub) AS codes
         |  FROM a$PqIters GROUP BY vec_id),
         |dt AS (
         |  SELECT s.vec_id AS q_id, c.sub, c.cluster,
         |    list_reduce(list_transform(range(1, ${PqSubDim + 1}),
         |      ii -> (s.sv[ii] - c.c[ii]) * (s.sv[ii] - c.c[ii])),
         |      (x2, y2) -> x2 + y2) AS d2
         |  FROM sv s JOIN cent${PqIters - 1} c ON s.sub = c.sub
         |  WHERE s.vec_id < 8),
         |dtab AS (
         |  SELECT q_id, list(d2 ORDER BY sub, cluster) AS dtab
         |  FROM dt GROUP BY q_id),
         |ad AS (
         |  SELECT d.q_id, cd.vec_id,
         |    list_reduce(list_transform(range(0, $PqM),
         |      s2 -> d.dtab[s2 * $PqKSub + cd.codes[s2 + 1] + 1]),
         |      (x2, y2) -> x2 + y2) AS adist
         |  FROM codes cd CROSS JOIN dtab d
         |  WHERE cd.vec_id <> d.q_id),
         |r AS (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |                       ORDER BY adist ASC, vec_id ASC) AS rn
         |  FROM ad),
         |tk AS (SELECT q_id, vec_id FROM r WHERE rn <= $k)""".stripMargin
    val bucketCols = (0 until LshAnnTables)
      .map(t => lshBucketSql(t, LshAnnBits)).mkString(",\n")
    val qCols = (0 until LshAnnTables).map(t => s"b$t AS qb$t")
      .mkString(", ")
    val unions = (0 until LshAnnTables).map(t =>
      s"    SELECT q.q_id, b.vec_id FROM b JOIN q ON b.b$t = q.qb$t")
      .mkString("\n    UNION ALL\n")
    val lshCtes =
      s"""b AS (
         |  SELECT vec_id, e,
         |$bucketCols
         |  FROM xv),
         |q AS (
         |  SELECT vec_id AS q_id, e AS qe2, $qCols
         |  FROM b WHERE vec_id < 8),
         |cand AS (
         |  SELECT DISTINCT q_id, vec_id FROM (
         |$unions) u
         |  WHERE q_id <> vec_id),
         |p2 AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(qe3) + 1), i -> qe3[i] * ce[i])) /
         |      (sqrt(list_sum(list_transform(qe3, x2 -> x2 * x2))) *
         |       sqrt(list_sum(list_transform(ce, x2 -> x2 * x2)))), 6) AS cos
         |  FROM cand
         |  JOIN (SELECT vec_id AS c_id, e AS ce FROM xv) c ON cand.vec_id = c.c_id
         |  JOIN (SELECT vec_id AS q2, e AS qe3 FROM xv) qq ON cand.q_id = qq.q2),
         |r AS (
         |  SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM p2),
         |tk AS (SELECT q_id, vec_id FROM r WHERE rn <= $k)""".stripMargin
    s"""SELECT method, n_probes, n_pairs, n_hits, recall_ppm FROM (
       |$exactArm
       |UNION ALL
       |${arm("b_int8", int8Ctes)}
       |UNION ALL
       |${arm("c_pq", pqCteChain)}
       |UNION ALL
       |${arm("d_lsh", lshCtes)}) ladder
       |ORDER BY method""".stripMargin
  }

  /** CTE chain replaying `Similarity.mmrRerank(nProbes, nCand, k)` in
    * DuckDB: the q21 cosine candidate stage cut to nCand, the pairwise
    * candidate-sim table, then per greedy round r ≥ 2: `m$r` scores the
    * remaining candidates (7·rel − 3·max-sim-to-selected, all integer
    * ppm) and `s$r` takes the per-probe argmax (ties vec_id asc);
    * round 1 is pure relevance. `sel$r` accumulates the selected set.
    */
  private def mmrOracleSql(nProbes: Int, nCand: Int, k: Int): String = {
    val cosExpr = (a: String, b: String) =>
      s"""round(
         |      list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) /
         |      (sqrt(list_sum(list_transform($a, x -> x * x))) *
         |       sqrt(list_sum(list_transform($b, x -> x * x)))), 6)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""m$r AS (
         |  SELECT c.q_id, c.vec_id, MAX(c.rel_ppm) AS rel_ppm,
         |    7 * MAX(c.rel_ppm) - 3 * MAX(p2.sim_ppm) AS mmr_fp
         |  FROM cand c
         |  JOIN pr p2 ON p2.q_id = c.q_id AND p2.ia = c.vec_id
         |  JOIN sel${r - 1} s ON s.q_id = p2.q_id AND s.vec_id = p2.ib
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} x
         |    WHERE x.q_id = c.q_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.q_id, c.vec_id),
         |s$r AS (
         |  SELECT q_id, CAST($r AS BIGINT) AS rank, vec_id, rel_ppm, mmr_fp
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY mmr_fp DESC, vec_id ASC) AS rr FROM m$r) t
         |  WHERE rr = 1),
         |sel$r AS (SELECT q_id, vec_id FROM sel${r - 1}
         |  UNION ALL SELECT q_id, vec_id FROM s$r)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k).map(r => s"SELECT * FROM s$r")
      .mkString("\n  UNION ALL ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < $nProbes),
       |p AS (
       |  SELECT q.q_id, v.vec_id, v.e,
       |    ${cosExpr("qe", "e")} AS cos
       |  FROM v CROSS JOIN q
       |  WHERE v.vec_id <> q.q_id),
       |cand AS (
       |  SELECT q_id, vec_id, e,
       |    CAST(round(cos * 1000000, 0) AS BIGINT) AS rel_ppm
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id ASC) AS rn FROM p) t
       |  WHERE rn <= $nCand),
       |pr AS (
       |  SELECT a.q_id, a.vec_id AS ia, b.vec_id AS ib,
       |    CAST(round(${cosExpr("a.e", "b.e")} * 1000000, 0) AS BIGINT)
       |      AS sim_ppm
       |  FROM cand a JOIN cand b
       |    ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT q_id, CAST(1 AS BIGINT) AS rank, vec_id, rel_ppm,
       |    7 * rel_ppm AS mmr_fp
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY 7 * rel_ppm DESC, vec_id ASC) AS rr FROM cand) t
       |  WHERE rr = 1),
       |sel1 AS (SELECT q_id, vec_id FROM s1),
       |$rounds
       |SELECT q_id, rank, vec_id, rel_ppm, mmr_fp FROM (
       |  $unionAll) u
       |ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB replay of `Events.hllDistinctUsers(m, αpm)` — every CTE
    * mirrors one stage of the Spark plan (hash, register project, max
    * aggregate, integer estimate, exact join-back).
    */
  private def hllOracleSql(m: Int, alphaPerMille: Long): String = {
    val kMax = 41 - Integer.numberOfTrailingZeros(m)
    val num = alphaPerMille * m.toLong * m.toLong * (1L << kMax)
    s"""WITH h AS (
       |  SELECT event_type,
       |    CAST('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
       |      1, 10) AS BIGINT) AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h % $m AS idx,
       |    CASE WHEN h // $m = 0 THEN $kMax
       |         ELSE $kMax - length(bin(h // $m)) END AS rho
       |  FROM h),
       |reg AS (SELECT event_type, idx, MAX(rho) AS mj
       |        FROM r GROUP BY event_type, idx),
       |s AS (
       |  SELECT event_type, COUNT(*) AS n_present,
       |    CAST(SUM(1::BIGINT << ($kMax - mj)) AS BIGINT) AS s_present
       |  FROM reg GROUP BY event_type),
       |e AS (
       |  SELECT event_type, $m - n_present AS n_zero_regs,
       |    $num // (1000 * (s_present + ($m - n_present) *
       |      ${1L << kMax})) AS est_hll
       |  FROM s),
       |x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |      FROM events GROUP BY event_type)
       |SELECT x.event_type, x.n_exact, e.n_zero_regs, e.est_hll,
       |  abs(e.est_hll - x.n_exact) * 1000000 // x.n_exact AS abs_err_ppm
       |FROM x JOIN e USING (event_type) ORDER BY x.event_type""".stripMargin
  }

  /** CTE chain replaying `TextOps.bpeTrain(k)` in DuckDB: `sw` the
    * per-source word counts (the single corpus collapse), `wf`/`w0` the
    * global spaced-symbol word-frequency vocabulary, then per round t:
    * `p$t` (adjacent-pair counts), `b$t` (the adopted pair — max count,
    * ties on the pair string ascending), `w$t` (vocab after the literal
    * replace). Shared by q101 (unions the `b$t`) and q102 (joins `sw`
    * against the final `w$k`).
    */
  private def bpeCtes(k: Int): String = {
    val rounds = (1 to k).map { t =>
      s"""p$t AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occ FROM (
         |    SELECT freq,
         |      unnest(list_transform(generate_series(1, len(syms) - 1),
         |        i -> syms[i] || ' ' || syms[i + 1])) AS pair
         |    FROM (SELECT freq, string_split(trim(w), '  ') AS syms
         |          FROM w${t - 1})
         |    WHERE len(syms) >= 2) up
         |  GROUP BY pair),
         |b$t AS (
         |  SELECT $t AS step, split_part(pair, ' ', 1) AS lhs,
         |    split_part(pair, ' ', 2) AS rhs, n_occ
         |  FROM p$t ORDER BY n_occ DESC, pair ASC LIMIT 1),
         |w$t AS (
         |  SELECT word, replace(w, ' ' || lhs || '  ' || rhs || ' ',
         |    ' ' || lhs || rhs || ' ') AS w, freq
         |  FROM w${t - 1}, b$t)""".stripMargin
    }.mkString(",\n")
    s"""sw AS (
       |  SELECT source, word, COUNT(*) AS cnt FROM (
       |    SELECT source,
       |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |    FROM documents WHERE doc_id IS NOT NULL) ut
       |  GROUP BY source, word),
       |wf AS (SELECT word, SUM(cnt) AS freq FROM sw GROUP BY word),
       |w0 AS (
       |  SELECT word, ' ' || array_to_string(
       |      list_transform(generate_series(1, length(word)),
       |        i -> substring(word, i, 1)), '  ') || ' ' AS w,
       |    freq
       |  FROM wf),
       |$rounds""".stripMargin
  }

  /** Packing CTE tail replaying `Sampling.packSequencesOf` over a
    * `pk_src(doc_id, text)` CTE with the NAIVE global window (the
    * two-phase proof device, as q52's oracle) — shared verbatim by q83
    * (whole corpus) and q88 (curated train split).
    */
  private def packedSeqSqlTail: String =
    s"""pk_t AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
       |      AS n_toks,
       |    md5(doc_id::VARCHAR) AS h
       |  FROM pk_src),
       |pk_c AS (
       |  SELECT doc_id, n_toks,
       |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_tok
       |  FROM pk_t),
       |pk_p AS (
       |  SELECT doc_id, n_toks, start_tok,
       |    start_tok + n_toks AS end_tok,
       |    unnest(generate_series(start_tok // $SeqPackLen,
       |                           (start_tok + n_toks - 1) // $SeqPackLen))
       |      AS seq
       |  FROM pk_c WHERE n_toks > 0)
       |SELECT doc_id, CAST(seq AS BIGINT) AS seq,
       |  CAST(greatest(start_tok, seq * $SeqPackLen)
       |       - seq * $SeqPackLen AS BIGINT) AS seq_start,
       |  CAST(greatest(start_tok, seq * $SeqPackLen)
       |       - start_tok AS BIGINT) AS doc_off,
       |  CAST(least(end_tok, (seq + 1) * $SeqPackLen)
       |       - greatest(start_tok, seq * $SeqPackLen) AS BIGINT)
       |      AS piece_toks
       |FROM pk_p ORDER BY doc_id, seq""".stripMargin

  /** Oracle-side replay of the q90 personalized-PageRank loop: q69's
    * edge/degree build, URGENT-order seed set (graph members only),
    * per-round damped mass UNION ALL seed-only teleport.
    */
  private def seededPagerankCtes(iters: Int): String = {
    val s = Graph.RankScale
    val head =
      s"""lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
         |      FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |sd AS (SELECT DISTINCT lp.p AS id
         |       FROM orders o JOIN lp ON o.o_orderkey = lp.k
         |       JOIN (SELECT DISTINCT src FROM e) g ON lp.p = g.src
         |       WHERE o.o_orderpriority = '1-URGENT'),
         |ns AS (SELECT COUNT(*) AS n FROM sd),
         |p0 AS (SELECT id, $s // (SELECT n FROM ns) AS r FROM sd)"""
        .stripMargin
    val steps = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT id, CAST(SUM(r) AS BIGINT) AS r FROM (
         |    SELECT e.dst AS id,
         |      (17 * SUM(p${i - 1}.r // deg.deg)) // 20 AS r
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id
         |    JOIN deg ON e.src = deg.src
         |    GROUP BY e.dst
         |    UNION ALL
         |    SELECT id, 3 * $s // (20 * (SELECT n FROM ns)) AS r FROM sd)
         |  GROUP BY id
         |  HAVING CAST(SUM(r) AS BIGINT) <> 0)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Oracle-side replay of the q86 synchronous LPA loop — same edge
    * build as q69's, per-round neighbor-label counts, but the argmax is
    * an INDEPENDENT implementation (a ranking window, vs Spark's
    * partial-aggregable struct-max).
    */
  private def lpaCtes(iters: Int): String = {
    val head =
      """lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
        |      FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
        |l0 AS (SELECT DISTINCT dst AS id, dst AS lbl FROM e)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""l$i AS (
         |  SELECT dst AS id, lbl FROM (
         |    SELECT dst, lbl, ROW_NUMBER() OVER (PARTITION BY dst
         |      ORDER BY cnt DESC, lbl ASC) AS rn
         |    FROM (SELECT e.dst, l.lbl, COUNT(*) AS cnt
         |          FROM e JOIN l${i - 1} l ON e.src = l.id
         |          GROUP BY e.dst, l.lbl))
         |  WHERE rn = 1)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Oracle-side replay of the q69 fixed-point PageRank loop: co-purchase
    * edge build, out-degrees, then `iters` chained rank CTEs mirroring
    * `Graph.pagerank`'s integer arithmetic (teleport `3S div 20N`,
    * damping `17/20`, per-edge contribution `r div deg`).
    */
  private def pagerankCtes(iters: Int): String = {
    val s = Graph.RankScale
    val head =
      s"""lp AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
         |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
         |      FROM lp a JOIN lp b ON a.k = b.k AND a.p <> b.p),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |r0 AS (SELECT src AS id, $s // (SELECT n FROM nn) AS r FROM deg)"""
        .stripMargin
    // left join from the full node set (as the Spark loop does): a
    // source-only node keeps its teleport share every round
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT deg.src AS id,
         |    CAST(3 * $s // (20 * (SELECT n FROM nn)) +
         |         (17 * COALESCE(m.msum, 0)) // 20 AS BIGINT) AS r
         |  FROM deg LEFT JOIN (
         |    SELECT e.dst, SUM(r${i - 1}.r // dg.deg) AS msum
         |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
         |    JOIN deg dg ON e.src = dg.src
         |    GROUP BY e.dst) m ON deg.src = m.dst)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The graded parameterizations, single-sourced: the `queries` map
    * passes them EXPLICITLY to the Scala operators, and the oracle-SQL
    * builders interpolate the same values (q42/q43 via a$KmeansIters /
    * cent${KmeansIters-1}, q29/q30/q41 via their bucket/union loops) —
    * changing one here changes both engines together.
    */
  private val KmeansK = 4
  private val QuantilePcts = Seq(25, 50, 75, 90, 99)
  private val KmeansIters = 3
  private val PagerankIters = 5
  // 11 bits cover l_partkey < 2048 at the graded sf; 6 bucket bits =
  // 64 z-range "files". At cluster scale raise both together — the
  // interleave is O(bits) arithmetic per row, never a sort.
  private val ZorderBits = 11
  private val ZorderBucketBits = 6
  // GK sketch accuracy K=100 => contracted rank error eps = 1/100.
  private val ApproxQuantileAccuracy = 100
  // q75: 16 half-life lags — weights beyond lag 15 are < 1/65536 cent.
  private val DecayLags = 16
  // q82: 16 equi-width buckets per embedding dimension.
  private val DriftBuckets = 16
  // 16 tables x 4 bits: RecallSpec measures top-3 recall 0.875 on this
  // corpus (8x4 measured 0.625 — a graded point a 100 TB deployment
  // would not ship; the nTables lever is the recall knob).
  private val LshAnnTables = 16
  private val LshAnnBits = 4
  private val NearDupLshTables = 2
  private val NearDupLshBits = 12
  // 4 tables x 4 bits with Hamming-1 probing: measured top-3 recall
  // 0.958 at sf0.01 (1.000 at sf0.001); 2x4 measured 0.708 — below
  // what a deployment would ship. RecallSpec floors the graded point
  // at 0.8. Probing costs |bits|+1 bucket lookups per table, never a
  // wider candidate join.
  private val MultiProbeTables = 4
  private val MultiProbeBits = 4
  // q54: duplicate-span window width (tokens per hashed span).
  private val SpanWindow = 10
  // q55: production-width decontamination (GPT-3 appendix C used 13).
  private val WideGramWidth = 13
  // q56: tokens per dedup block (the C4 "line" unit on this corpus).
  private val BlockSize = 20
  // q57: SemDeDup cosine threshold (paper operates at 0.9-0.95+).
  private val SemDedupTau = 0.95
  // q60: DSIR target distribution = the English slice of the corpus.
  private val DsirTargetLang = "en"
  // q61: neighbors per probe under the quantized integer dot product.
  private val QuantTopK = 3
  // q117: PQ geometry — 4 sub-spaces x 16 dims, 4 codewords each
  // (kSub^m = 256 virtual centroids from 16 stored ones), 2 Lloyd
  // rounds per codebook. Production raises kSub to 256 (8-bit codes);
  // the oracle CTE chain scales as m * iters.
  private val PqM = 4
  private val PqSubDim = 16
  private val PqKSub = 4
  private val PqIters = 2
  // q120: HITS half-round count and per-side leaderboard size.
  private val HitsIters = 3
  private val HitsTopK = 20
  // q121: related-docs df cap (q99's zipf-head rule: signal filter AND
  // join fan-out bound) and neighbors per anchor.
  private val RelatedDfCap = 50L
  private val RelatedTopK = 3
  // q123: retrieval chunk geometry — 64-token windows, 16-token
  // overlap (stride 48). Graded small so multi-chunk docs and short
  // tails occur at sf0.01; a production 512/64 only changes these.
  private val RagChunkSize = 64
  private val RagOverlap = 16
  // q125: attribution lookback window (24 h).
  private val AttrWindowSec = 86400L
  // q126: RRF fusion — per-system ranking depth, fused output depth,
  // and the K=60 constant from Cormack et al. 2009.
  private val RrfKPerSystem = 10
  private val RrfKOut = 5
  private val RrfKConst = 60
  // q129: dHash near-dup Hamming threshold (4 bands of 11 bits cover
  // <= 3 flips by pigeonhole over the <= 44-bit hash space).
  private val ImgHammingMax = 3
  // q131: nested scaling-law subset percentages (md5-bucket rule).
  private val CurveTiers = Seq(10, 25, 50, 100)
  // q139: the ensemble's quality-band floor (bands span 35..100).
  private val FilterChainQualityMin = 60L
  // q142: association-rule min pair count and leaderboard depth. The
  // min-count floor keeps singleton co-occurrences (pure noise, and
  // the bulk of all pairs) out of the rule arithmetic.
  private val AssocMinPair = 2L
  private val AssocTopK = 20
  // q143: share of data subjects in the forget-set (md5-bucket rule).
  private val ForgetPct = 5
  // q149: the k in k-anonymity.
  private val KAnonK = 5L
  // q152: ring geometry — shards before the grow step, vnodes/shard.
  private val RingShards = 8
  private val RingVnodes = 16
  // q154: Poisson-bootstrap replicate count.
  private val BootReps = 100
  // q155: retrieval-eval ranking depth.
  private val RetrievalEvalK = 10
  // q156: trailing-baseline window and the warmup floor.
  private val GateWindowDays = 7
  private val GateMinPrior = 4
  // q158: bridge periods.
  private val BridgeY1 = 1999
  private val BridgeY2 = 2000
  // q159/q160: equi-depth bucket count.
  private val HistBuckets = 8
  // q164: file count per layout.
  private val ZoneFiles = 16
  // q144: MMR re-ranking — probe count, ANN candidate depth per
  // probe, selections per probe. λ is fixed at 7/10 inside the
  // integer score (7·rel − 3·maxsim), shared with the oracle CTEs.
  private val MmrProbes = 4
  private val MmrCand = 10
  private val MmrK = 5
  // q145: rows trimmed per side, in percent of each type's count.
  private val TrimPct = 5
  // q134: frozen-vocab size, promotion threshold, report depth. The
  // fixture corpus has 31 distinct tokens, so the graded cut is 20 —
  // smaller than the vocabulary, leaving a REAL OOV tail (a 1000-size
  // cut like q100's would make every delta token in-vocab and the
  // maintenance loop vacuous).
  private val VocabMaintSize = 20
  private val VocabPromoteMin = 5L
  private val VocabMaintTopK = 50
  // q83: tokens per packed context window. Graded small so boundary
  // splits actually occur at sf0.01 (~300-token docs straddle often);
  // a 2k/4k/8k production window only changes this constant.
  private val SeqPackLen = 512L
  // q84: hard negatives mined per anchor.
  private val HardNegK = 5
  // q86: synchronous LPA rounds (deterministic; convergence not
  // required — a fixed round count is the reproducibility contract).
  private val LpaIters = 3
  // q92: content-defined chunking — rolling window width and boundary
  // mask (expected chunk length ~ mask tokens).
  private val CdcChunkWindow = 3
  private val CdcChunkMask = 16
  // q93: preference pairs built per source.
  private val PrefPairsPerGroup = 3
  // q95: contiguous balanced key ranges in the sorted-export layout.
  private val RangeLayoutBuckets = 8
  // q87: training epochs laid out (each gets its own hash order).
  private val EpochCount = 3
  // q98: first-merge candidate pairs reported by the BPE pair counter.
  private val BpePairsK = 20
  // q99: stop-term df cap — posting lists above this df stay NULL.
  private val InvertedIndexMaxDf = 50L
  // q100: corpus-top-N token vocabulary OOV rates are measured against.
  private val OovVocabSize = 1000
  // q101/q102: BPE merge-learning rounds (the oracle replays each as a
  // CTE); q102 encodes the corpus with the round-k vocabulary.
  private val BpeMergeSteps = 8
  // q103: embedding-decontamination gate. The planted ×2-rescaled leaks
  // score 1.0; the measured cross-set background tops out near 0.45.
  private val EmbedDecontTau = 0.95
  // q104: behavior-vocabulary cut — top-k most common session shapes.
  private val SessionSeqTopK = 20
  // q107: the vocab sizes the coverage curve is evaluated at.
  private val VocabCurveSizes = Seq(100, 1000, 10000)
  // q109: count-min-sketch geometry (w buckets × d hash rows) and the
  // heavy-hitter report size. w ≫ the corpus vocabulary's heavy tail,
  // so the graded point shows near-clean estimates; shrink w in specs
  // to force collisions.
  private val CmsWidth = 1024
  private val CmsDepth = 4
  private val CmsTopK = 20
  // q110: HLL register count (m, a power of two ≤ 4096) and Flajolet's
  // bias constant α_64 = 0.7213/(1 + 1.079/64) ≈ 0.709, scaled to
  // per-mille so the estimator is pure integer arithmetic on both
  // engines. Raising m is the accuracy lever (rse ≈ 1.04/√m).
  private val HllRegisters = 64
  private val HllAlphaPerMille = 709L
  // q115: the fixed token budget the α=1/2 mixture is allocated
  // against. Graded at 1M so low-resource sources land above one epoch
  // (epochs_permille > 1000) at sf0.01 — the decision point the table
  // exists to show; a production 10T-token budget only changes this.
  private val TokenBudget = 1000000L

  /** CTE chain replaying `Clustering.kmeansModel(k, iters)` in DuckDB:
    * `v` (vectors), `cent0` (seeds) … `a$iters` (final assignment), with
    * `cent${iters-1}` the centroids that produced it. Shared by q42
    * (assignments) and q43 (learned-index IVF probe/search).
    */
  private def kmeansCtes(k: Int, iters: Int): String = {
    def assignCte(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, e, cluster, dist FROM (
         |    SELECT vec_id, e, cluster, dist,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |                         ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT v.vec_id, v.e, cc.cluster,
         |        list_reduce(list_transform(range(1, 65),
         |          ii -> (v.e[ii] - cc.c[ii]) * (v.e[ii] - cc.c[ii])),
         |          (x2, y2) -> x2 + y2) AS dist
         |      FROM v CROSS JOIN cent${i - 1} cc) d$i) t$i
         |  WHERE rn = 1)""".stripMargin
    def centCte(i: Int): String =
      s"""cent$i AS (
         |  SELECT cluster, list(cd ORDER BY dim) AS c FROM (
         |    SELECT cluster, dim,
         |      list_reduce(list_sort(list(val)), (x2, y2) -> x2 + y2) / COUNT(*) AS cd
         |    FROM (SELECT a.cluster, t.i - 1 AS dim, a.e[t.i] AS val
         |          FROM a$i a, (SELECT unnest(generate_series(1, 64)) AS i) t) e$i
         |    GROUP BY cluster, dim) g$i
         |  GROUP BY cluster)""".stripMargin
    (Seq(
      "v AS (\n  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
      s"cent0 AS (\n  SELECT vec_id AS cluster, e AS c FROM v WHERE vec_id < $k)") ++
      (1 until iters).flatMap(i => Seq(assignCte(i), centCte(i))) :+
      assignCte(iters)).mkString(",\n")
  }

  /** CTE chain replaying `TextOps.relatedDocsOf(maxDf)` in DuckDB:
    * `postings` (distinct doc–term), `rare` (the 2..cap df band with
    * integer rarity weights), `rel_pairs`, and `rel_ranked` (the
    * per-anchor ranking, cut by the consumer). Shared by q121 (top-k
    * per doc) and q126's sparse fusion arm.
    */
  private def relatedDocsCtes(maxDf: Long): String =
    s"""postings AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
       |      AS term
       |  FROM documents WHERE doc_id IS NOT NULL),
       |rare AS (
       |  SELECT term, COUNT(*) AS df, 1000000 // COUNT(*) AS wt
       |  FROM postings GROUP BY term
       |  HAVING COUNT(*) >= 2 AND COUNT(*) <= $maxDf),
       |rel_pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared_rare,
       |    CAST(SUM(r.wt) AS BIGINT) AS score
       |  FROM postings a
       |  JOIN rare r ON a.term = r.term
       |  JOIN postings b ON b.term = a.term AND b.doc_id <> a.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |rel_ranked AS (
       |  SELECT doc_a, doc_b, n_shared_rare, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_a
       |                       ORDER BY score DESC, doc_b ASC) AS rn
       |  FROM rel_pairs)""".stripMargin

  /** DuckDB replay of `Cdc.snapshotDiff`, generated from the same
    * non-key column list the operator derives from the schema — the
    * derivation (buckets 0-4 modified, 5-7 removed, 8-9 cloned), the
    * full-outer join, null-safe comparisons, and the melted report.
    */
  private def snapshotDiffOracleSql: String = {
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val same = cols.map(c => s"b.$c IS NOT DISTINCT FROM s.$c")
      .mkString("\n         AND ")
    val pairCols = cols.map(c => s"b.$c AS b_$c, s.$c AS s_$c")
      .mkString(",\n       |    ")
    val chgSelects = cols.map(c =>
      s"""SELECT 'chg_$c' AS metric,
         |    CAST(COALESCE(SUM(CASE WHEN NOT (b_$c IS NOT DISTINCT FROM s_$c)
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n
         |  FROM j WHERE change_type = 'modified'""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""WITH bb AS (
       |  SELECT *, CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)
       |    AS BIGINT) % 100 AS bkt
       |  FROM orders),
       |snap AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus,
       |    CASE WHEN bkt < 5 THEN o_totalprice + 1.0 ELSE o_totalprice END
       |      AS o_totalprice,
       |    o_orderdate,
       |    CASE WHEN bkt < 5 THEN 'RUSHED' ELSE o_orderpriority END
       |      AS o_orderpriority
       |  FROM bb WHERE bkt < 5 OR bkt >= 8
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
       |    o_totalprice, o_orderdate, o_orderpriority
       |  FROM bb WHERE bkt >= 8 AND bkt < 10),
       |j AS (
       |  SELECT
       |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
       |         WHEN s.o_orderkey IS NULL THEN 'removed'
       |         WHEN $same THEN 'unchanged'
       |         ELSE 'modified' END AS change_type,
       |    $pairCols
       |  FROM orders b FULL OUTER JOIN snap s ON b.o_orderkey = s.o_orderkey)
       |SELECT metric, n FROM (
       |  SELECT 'n_' || change_type AS metric, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM j GROUP BY change_type
       |  UNION ALL
       |  $chgSelects
       |) u ORDER BY metric""".stripMargin
  }

  /** DuckDB replay of `SkewJoin.skewReport`, generated per key column:
    * the size-value histogram, its cumulative, exact ceil-rank picks,
    * hottest-key row share.
    */
  private def skewOracleSql(keys: Seq[String]): String = {
    val ctes = keys.flatMap { k =>
      Seq(
        s"""h_$k AS (
           |  SELECT sz, COUNT(*) AS nk FROM (
           |    SELECT $k, COUNT(*) AS sz FROM lineitem GROUP BY $k) s_$k
           |  GROUP BY sz)""".stripMargin,
        s"""c_$k AS (
           |  SELECT sz, SUM(nk) OVER (ORDER BY sz
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM h_$k)""".stripMargin)
    }.mkString(",\n")
    val blocks = keys.map { k =>
      s"""SELECT '$k' AS key_col,
         |  (SELECT CAST(SUM(sz * nk) AS BIGINT) FROM h_$k) AS n_rows,
         |  (SELECT CAST(SUM(nk) AS BIGINT) FROM h_$k) AS n_keys,
         |  (SELECT CAST(MAX(sz) AS BIGINT) FROM h_$k) AS max_group,
         |  MIN(CASE WHEN cum >= ((SELECT SUM(nk) FROM h_$k) + 1) // 2
         |      THEN sz END) AS p50_group,
         |  MIN(CASE WHEN cum >= (99 * (SELECT SUM(nk) FROM h_$k) + 99) // 100
         |      THEN sz END) AS p99_group,
         |  (SELECT CAST(MAX(sz) AS BIGINT) FROM h_$k) * 1000000
         |    // (SELECT CAST(SUM(sz * nk) AS BIGINT) FROM h_$k)
         |    AS top_share_ppm
         |FROM c_$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ctes
       |SELECT * FROM (
       |$blocks
       |) u ORDER BY key_col""".stripMargin
  }

  // q118: sketch size and hash domain (2^56 — 14 md5 hex chars, chosen
  // so (k−1)·domain fits a bigint), single-sourced from TextOps.
  private val KmvOverlapK = ops.TextOps.KmvK
  private val KmvOverlapDomain = ops.TextOps.KmvDomain
  // q119: collocation count floor and leaderboard size, from TextOps.
  private val PmiMinCountSql = ops.TextOps.PmiMinCount
  private val PmiTopKSql = ops.TextOps.PmiTopK

  /** CTE chain replaying `Quantization.pqModel(m, subDim, kSub, iters)`
    * in DuckDB — `kmeansCtes`' structure with the sub-space id `sub` in
    * every key: `sv` (sliced vectors), `cent0` (per-sub seeds) …
    * `a$iters` (final per-sub assignment), `cent${iters-1}` the
    * codebooks that produced it.
    */
  private def pqCtes(m: Int, subDim: Int, kSub: Int, iters: Int): String = {
    def assignCte(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, sub, sv, cluster FROM (
         |    SELECT vec_id, sub, sv, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY dist ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT s.vec_id, s.sub, s.sv, cc.cluster,
         |        list_reduce(list_transform(range(1, ${subDim + 1}),
         |          ii -> (s.sv[ii] - cc.c[ii]) * (s.sv[ii] - cc.c[ii])),
         |          (x2, y2) -> x2 + y2) AS dist
         |      FROM sv s JOIN cent${i - 1} cc ON s.sub = cc.sub) d$i) t$i
         |  WHERE rn = 1)""".stripMargin
    def centCte(i: Int): String =
      s"""cent$i AS (
         |  SELECT sub, cluster, list(cd ORDER BY dim) AS c FROM (
         |    SELECT sub, cluster, dim,
         |      list_reduce(list_sort(list(val)), (x2, y2) -> x2 + y2) / COUNT(*) AS cd
         |    FROM (SELECT a.sub, a.cluster, t.i - 1 AS dim, a.sv[t.i] AS val
         |          FROM a$i a, (SELECT unnest(generate_series(1, $subDim)) AS i) t) e$i
         |    GROUP BY sub, cluster, dim) g$i
         |  GROUP BY sub, cluster)""".stripMargin
    (Seq(
      "v AS (\n  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
      s"""sv AS (
         |  SELECT vec_id, s.sub,
         |    list_slice(e, s.sub * $subDim + 1, (s.sub + 1) * $subDim) AS sv
         |  FROM v, (SELECT unnest(range(0, $m)) AS sub) s)""".stripMargin,
      s"""cent0 AS (
         |  SELECT sub, vec_id AS cluster, sv AS c FROM sv WHERE vec_id < $kSub)"""
        .stripMargin) ++
      (1 until iters).flatMap(i => Seq(assignCte(i), centCte(i))) :+
      assignCte(iters)).mkString(",\n")
  }

  /** DuckDB replay of `Graph.purchaseHits(iters, kTop)`: the bipartite
    * incidence set, `iters` pairs of (authority half-round, hub
    * half-round) — each an exact integer in-edge sum followed by the
    * HUGEINT max-normalization — then the two bounded leaderboards.
    */
  private def hitsOracleSql(iters: Int, kTop: Int): String = {
    val scale = ops.Graph.HitsScale
    val rounds = (1 to iters).map { i =>
      val hPrev = s"h${i - 1}"
      s"""ar$i AS (
         |  SELECT part, CAST(SUM(score) AS BIGINT) AS raw
         |  FROM e JOIN $hPrev USING (cust) GROUP BY part),
         |a$i AS (
         |  SELECT part, CAST((raw::HUGEINT * $scale)
         |    // (SELECT MAX(raw) FROM ar$i) AS BIGINT) AS score
         |  FROM ar$i),
         |hr$i AS (
         |  SELECT cust, CAST(SUM(score) AS BIGINT) AS raw
         |  FROM e JOIN a$i USING (part) GROUP BY cust),
         |h$i AS (
         |  SELECT cust, CAST((raw::HUGEINT * $scale)
         |    // (SELECT MAX(raw) FROM hr$i) AS BIGINT) AS score
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS (
       |  SELECT cust, ${scale}::BIGINT AS score
       |  FROM (SELECT DISTINCT cust FROM e) c0),
       |$rounds,
       |auth AS (
       |  SELECT 'authority' AS kind,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, part ASC) AS rank,
       |    CAST(part AS BIGINT) AS node_id, score AS score_fp
       |  FROM a$iters),
       |hub AS (
       |  SELECT 'hub' AS kind,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, cust ASC) AS rank,
       |    CAST(cust AS BIGINT) AS node_id, score AS score_fp
       |  FROM h$iters)
       |SELECT kind, CAST(rank AS BIGINT) AS rank, node_id, score_fp
       |FROM (SELECT * FROM auth WHERE rank <= $kTop
       |      UNION ALL SELECT * FROM hub WHERE rank <= $kTop) u
       |ORDER BY kind, rank""".stripMargin
  }
}
