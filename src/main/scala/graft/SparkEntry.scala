package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extras => X, ExtrasOracle, Inventory => I, OracleSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2.2 to a
  * DataFrame builder `(spark, sfDir) => df`; `oracleSql` carries the
  * DuckDB twin for each hash-checked entry (entries without a twin get
  * the driver's weaker rows-only check — used only for approximate /
  * non-deterministic-by-design paths).
  */
object SparkEntry {

  /** Flagship query (Q09, the insights-style aggregation) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    I.q09(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan" -> (I.q01 _),
    "q02_filter" -> (I.q02 _),
    "q03_json_project" -> (I.q03 _),
    "q04_join_inner" -> (I.q04 _),
    "q05_join_broadcast" -> (I.q05 _),
    "q06_join_5way" -> (I.q06 _),
    "q07_join_leftouter" -> (I.q07 _),
    "q08_semi_join" -> (I.q08Semi _),
    "q08_anti_join" -> (I.q08Anti _),
    "q09_agg_ratios" -> (I.q09 _),
    "q10_distinct" -> (I.q10 _),
    "q10_approx_distinct" -> (I.q10Approx _),
    "q11_explode_agg" -> (I.q11 _),
    "q12_rollup" -> (I.q12Rollup _),
    "q12_cube" -> (I.q12Cube _),
    "q13_keep_latest" -> (I.q13 _),
    "q14_trailing_window" -> (I.q14 _),
    "q15_topk_group" -> (I.q15 _),
    "q16_range_join" -> (I.q16 _),
    "q17_asof_join" -> (I.q17 _),
    "q18_set_ops" -> (I.q18 _),
    "q19_dedup_upsert" -> (I.q19 _),
    "q20_tumbling" -> (I.q20 _),
    "q21_sliding" -> (I.q21 _),
    "q22_session" -> (I.q22 _),
    "q23_sanitize" -> (I.q23 _),
    "q24_scalar_battery" -> (I.q24 _),
    "q25_text_stats" -> (I.q25 _),
    "q26_centroid" -> (I.q26 _),
    "q26b_cosine_topk" -> (I.q26b _),
    "q27_near_dup" -> (I.q27 _),
    "q28_stream_equiv" -> (I.q28 _),
    // LLM-training-data pipeline extras (see queries/Extras.scala)
    "q26_centroid_agg" -> (X.q26CentroidAgg _),
    "x01_dedup_exact" -> (X.x01DedupExact _),
    "x02_dedup_minhash_lsh" -> (X.x02DedupMinhashLsh _),
    "x03_dedup_simhash" -> (X.x03DedupSimhash _),
    "x04_ngram_jaccard" -> (X.x04NgramJaccard _),
    "x05_ann_brute" -> (X.x05AnnBrute _),
    "x06_ann_lsh" -> (X.x06AnnLsh _),
    "x07_lang_id" -> (X.x07LangId _),
    "x08_quality_score" -> (X.x08QualityScore _),
    "x09_token_count" -> (X.x09TokenCount _),
    "x10_fingerprint" -> (X.x10Fingerprint _),
    "x11_multimodal" -> (X.x11Multimodal _),
    "x12_embed_neardup" -> (X.x12EmbedNearDup _),
    "x13_ann_ivf" -> (X.x13AnnIvf _),
    "x14_dedup_clusters" -> (X.x14DedupClusters _),
    "x15_sample_uniform" -> (X.x15SampleUniform _),
    "x15_sample_stratified" -> (X.x15SampleStratified _),
    "x16_contamination" -> (X.x16Contamination _),
    "x17_vocab_topk" -> (X.x17VocabTopk _),
    "x18_repetition" -> (X.x18Repetition _),
    "x19_pii_scrub" -> (X.x19PiiScrub _),
    "x20_bloom_dedup" -> (X.x20BloomDedup _),
    "x21_ann_sq" -> (X.x21AnnSq _),
    "x22_length_quantiles" -> (X.x22LengthQuantiles _),
    "x23_bpe_pairs" -> (X.x23BpePairs _),
    "x24_hybrid_search" -> (X.x24HybridSearch _),
    "x25_ann_pq" -> (X.x25AnnPq _),
    "x26_mixture" -> (X.x26Mixture _),
    "x27_classify_centroid" -> (X.x27ClassifyCentroid _),
    "x28_knn_vote" -> (X.x28KnnVote _),
    "x29_dedup_survivors" -> (X.x29DedupSurvivors _),
    "x30_source_caps" -> (X.x30SourceCaps _),
    "x31_seq_pack" -> (X.x31SeqPack _),
    "x32_scd2" -> (X.x32Scd2 _),
    "x33_snapshot_diff" -> (X.x33SnapshotDiff _),
    "x34_weighted_sample" -> (X.x34WeightedSample _),
    "x35_seq_stats" -> (X.x35SeqStats _),
    // approximate by design (sketch estimate) -> rows-only check;
    // QueriesSpec pins the error bound against the exact twin
    "x36_sketch_store" -> (X.x36SketchStore _),
    "x37_source_overlap" -> (X.x37SourceOverlap _),
    "x38_filter_cascade" -> (X.x38FilterCascade _),
    "x39_data_card" -> (X.x39DataCard _),
    "x40_chunk_overlap" -> (X.x40ChunkOverlap _),
    "x41_curriculum" -> (X.x41Curriculum _),
    "x42_funnel" -> (X.x42Funnel _),
    "x43_retention" -> (X.x43Retention _),
    "x44_boilerplate" -> (X.x44Boilerplate _),
    "x45_tfidf_keywords" -> (X.x45TfidfKeywords _),
    "x46_volume_anomaly" -> (X.x46VolumeAnomaly _),
    "x47_containment" -> (X.x47Containment _),
    "x48_attribution" -> (X.x48Attribution _),
    "x49_pipeline_funnel" -> (X.x49PipelineFunnel _),
    "x50_leak_safe_split" -> (X.x50LeakSafeSplit _),
    "x11b_binary_assets" -> (X.x11bBinaryAssets _),
    "x51_token_drift" -> (X.x51TokenDrift _),
    "x52_time_travel" -> (X.x52TimeTravel _),
    "x53_merge_upsert" -> (X.x53MergeUpsert _),
    "x54_data_skipping" -> (X.x54DataSkipping _),
    "x55_change_feed" -> (X.x55ChangeFeed _),
    "x56_segment_dedup" -> (X.x56SegmentDedup _),
    "x57_lm_quality" -> (X.x57LmQuality _),
    "x58_deletion_vectors" -> (X.x58DeletionVectors _),
    "x59_incremental_mv" -> (X.x59IncrementalMv _),
    "x60_bpe_train" -> (X.x60BpeTrain _),
    "x61_kmeans_embed" -> (X.x61KmeansEmbed _),
    "x62_semantic_dedup" -> (X.x62SemanticDedup _),
    "x63_shallow_clone" -> (X.x63ShallowClone _),
    "x64_multi_txn" -> (X.x64MultiTxn _),
    "x65_ann_index" -> (X.x65AnnIndex _),
    "x65b_ann_append" -> (X.x65bAnnAppend _),
    "x65c_ann_optimize" -> (X.x65cAnnOptimize _),
    "x65d_ann_policy" -> (X.x65dAnnPolicy _),
    "x66_frame_sample" -> (X.x66FrameSample _),
    "x67_resize" -> (X.x67Resize _),
    "x68_audio_features" -> (X.x68AudioFeatures _),
    "x69_asset_stream" -> (X.x69AssetStream _),
    "x70_ann_index_stream" -> (X.x70AnnIndexStream _),
    "x71_incremental_minhash" -> (X.x71IncrementalMinhash _),
    "x72_bpe_encode" -> (X.x72BpeEncode _),
    "x73_shard_pack" -> (X.x73ShardPack _),
    "x74_lang_classifier" -> (X.x74LangClassifier _),
    "x75_stream_dedup" -> (X.x75StreamDedup _),
    "x76_ann_recall" -> (X.x76AnnRecall _),
    "x82_ann_twolevel" -> (X.x82AnnTwoLevel _),
    "x83_ann_twolevel_narrow" -> (X.x83AnnTwoLevelNarrow _),
    "x76b_ann_recall_maintained" -> (X.x76bAnnRecallMaintained _),
    "x77_embedding_drift" -> (X.x77EmbeddingDrift _),
    "x78_dedup_verdicts" -> (X.x78DedupVerdicts _),
    "x79_semdedup_incremental" -> (X.x79SemdedupIncremental _),
    "x80_semdedup_stream" -> (X.x80SemdedupStream _),
    "x81_semdedup_verdicts" -> (X.x81SemdedupVerdicts _)
  )

  def oracleSql: Map[String, String] = OracleSql.sql ++ ExtrasOracle.sql
}
