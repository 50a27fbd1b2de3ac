package graft

import graft.core.Tables
import graft.multimodal.Binary
import graft.operators.{AsOfJoin, Bucketing, Checks, Classifier, Curation, Dedup, Funnel, GlobalIndex, Graph, Importance, IntervalJoin, LanguageModel, Layout, Merge, MinHashLSH, Packing, Paths, ProductQuantizer, Retention, Sampling, Sessionize, SimHash, Similarity, SkewJoin, Sketches, TextAnalysis, Urls, VectorIndex}
import graft.sinks.{CsvSink, ParquetSink}
import graft.sources.{Catalog, SasCsvReader, SasOptions, SasTypes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Driver contract — see /root/repo/SURVEY.md §2 (one queries entry per
  * inventory row) and §6 (aliasing + ordering rules). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q10AggPricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}

/** §2 operator inventory registry. Implementations live in the section
  * traits (QueriesSas, QueriesCore, QueriesAnn, QueriesPipeline,
  * QueriesText — one file per SURVEY §2 family); oracle SQL in
  * [[QueryOracles]]. Every query orders its output deterministically and
  * aliases computed columns identically to its oracle. */
object Queries
    extends QueryHelpers
    with QueriesSas
    with QueriesCore
    with QueriesAnn
    with QueriesPipeline
    with QueriesText
    with QueryOracles {

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sas_keep_rename" -> q01SasKeepRename _,
    "q02_sas_drop_where" -> q02SasDropWhere _,
    "q03_sas_obs" -> q03SasObs _,
    "q04_fix_missing" -> q04FixMissing _,
    "q05_col_types" -> q05ColTypes _,
    "q06_csv_roundtrip" -> q06CsvRoundtrip _,
    "q07_parquet_modified" -> q07ParquetModified _,
    "q08_type_inference" -> q08TypeInference _,
    "q09_list_tables" -> q09ListTables _,
    "q10_agg_pricing" -> q10AggPricing _,
    "q11_join_broadcast" -> q11JoinBroadcast _,
    "q12_join_shuffle" -> q12JoinShuffle _,
    "q13_topn" -> q13TopN _,
    "q14_window_rank" -> q14WindowRank _,
    "q15_distinct" -> q15Distinct _,
    "q16_anti_semi" -> q16AntiSemi _,
    "q17_union_label" -> q17UnionLabel _,
    "q18_pivot" -> q18Pivot _,
    "q19_rollup" -> q19Rollup _,
    "q20_asof_join" -> q20AsofJoin _,
    "q48_asof_inner" -> q48AsofInner _,
    "q49_asof_native" -> q49AsofNative _,
    "q53_asof_broadcast" -> q53AsofBroadcast _,
    "q54_split_sample" -> q54SplitSample _,
    "q55_latest_per_key" -> q55LatestPerKey _,
    "q56_scd_intervals" -> q56ScdIntervals _,
    "q57_interval_lookup" -> q57IntervalLookup _,
    "q58_compress_ratio" -> q58CompressRatio _,
    "q59_global_rownum" -> q59GlobalRownum _,
    "q60_stratified_sample" -> q60StratifiedSample _,
    "q61_ntile" -> q61Ntile _,
    "q62_quality_checks" -> q62QualityChecks _,
    "q21_sessionize" -> q21Sessionize _,
    "q22_time_window" -> q22TimeWindow _,
    "q23_exists_semi" -> q23ExistsSemi _,
    "q24_scalar_subquery" -> q24ScalarSubquery _,
    "q25_cube" -> q25Cube _,
    "q26_json_extract" -> q26JsonExtract _,
    "q27_running_sum" -> q27RunningSum _,
    "q28_count_distinct" -> q28CountDistinct _,
    "q29_salted_join" -> q29SaltedJoin _,
    "q46_percentiles" -> q46Percentiles _,
    "q138_quantile_sketch" -> q138QuantileSketch _,
    "q146_tail_quantiles" -> q146TailQuantiles _,
    "q141_tfrecord_export" -> q141TfrecordExport _,
    "q47_histogram" -> q47Histogram _,
    "q30_dedup_exact" -> q30DedupExact _,
    "q31_dedup_ngram" -> q31DedupNgram _,
    "q129_jaccard_prefix" -> q129JaccardPrefix _,
    "q149_ngram_containment" -> q149NgramContainment _,
    "q150_weighted_sample" -> q150WeightedSample _,
    "q151_graph_components" -> q151GraphComponents _,
    "q32_dedup_minhash" -> q32DedupMinhash _,
    "q33_dedup_simhash" -> q33DedupSimhash _,
    "q34_dedup_embedding" -> q34DedupEmbedding _,
    "q35_dedup_cluster" -> q35DedupCluster _,
    "q66_dedup_corpus" -> q66DedupCorpus _,
    "q133_dedup_keep_best" -> q133DedupKeepBest _,
    "q74_dedup_embedding_lsh" -> q74DedupEmbeddingLsh _,
    "q50_ann_brute" -> q50AnnBrute _,
    "q51_ann_ivf" -> q51AnnIvf _,
    "q63_ann_lsh" -> q63AnnLsh _,
    "q64_ann_ivf_index" -> q64AnnIvfIndex _,
    "q156_ann_ivf_grid" -> q156AnnIvfGrid _,
    "q104_ann_ivf_q8" -> q104AnnIvfQ8 _,
    "q65_ann_lsh_index" -> q65AnnLshIndex _,
    "q52_knn_join" -> q52KnnJoin _,
    "q40_token_count" -> q40TokenCount _,
    "q44_rolling_fp" -> q44RollingFp _,
    "q118_winnow" -> q118Winnow _,
    "q45_ngram_topk" -> q45NgramTopk _,
    "q41_text_quality" -> q41TextQuality _,
    "q42_lang_id" -> q42LangId _,
    "q43_fingerprint" -> q43Fingerprint _,
    "q67_tfidf_topk" -> q67TfidfTopk _,
    "q68_funnel" -> q68Funnel _,
    "q69_retention" -> q69Retention _,
    "q75_pack_shards" -> q75PackShards _,
    "q76_quality_filter" -> q76QualityFilter _,
    "q77_repetition" -> q77Repetition _,
    "q78_contamination" -> q78Contamination _,
    "q79_domain_mix" -> q79DomainMix _,
    "q80_chunking" -> q80Chunking _,
    "q81_outliers" -> q81Outliers _,
    "q82_bucketed_join" -> q82BucketedJoin _,
    "q83_relative_filter" -> q83RelativeFilter _,
    "q84_incremental_dedup" -> q84IncrementalDedup _,
    "q85_pii_redact" -> q85PiiRedact _,
    "q86_boilerplate" -> q86Boilerplate _,
    "q87_interval_overlap" -> q87IntervalOverlap _,
    "q88_sketch_profile" -> q88SketchProfile _,
    "q89_zorder" -> q89Zorder _,
    "q90_compact" -> q90Compact _,
    "q91_vocab_encode" -> q91VocabEncode _,
    "q92_winsorize" -> q92Winsorize _,
    "q93_curate_corpus" -> q93CurateCorpus _,
    "q94_upsert" -> q94Upsert _,
    "q95_minmax_scale" -> q95MinmaxScale _,
    "q96_pack_sequences" -> q96PackSequences _,
    "q97_phash_dedup" -> q97PhashDedup _,
    "q98_bpe_merges" -> q98BpeMerges _,
    "q105_lm_perplexity" -> q105LmPerplexity _,
    "q106_nb_classifier" -> q106NbClassifier _,
    "q107_dsir_resample" -> q107DsirResample _,
    "q108_dup_ngrams" -> q108DupNgrams _,
    "q109_url_dedup" -> q109UrlDedup _,
    "q110_pq_ann" -> q110PqAnn _,
    "q157_ann_pq_grid" -> q157AnnPqGrid _,
    "q158_ann_lsh_grid" -> q158AnnLshGrid _,
    "q159_ann_ivfpq_grid" -> q159AnnIvfPqGrid _,
    "q160_ann_opq_perm_grid" -> q160AnnOpqPermGrid _,
    "q136_ann_opq" -> q136AnnOpq _,
    "q111_cdc_chunks" -> q111CdcChunks _,
    "q112_ann_ivfpq" -> q112AnnIvfPq _,
    "q116_ann_ivfpq_res" -> q116AnnIvfPqRes _,
    "q142_ann_ivfpq_opq" -> q142AnnIvfPqOpq _,
    "q148_ann_ivfpq_append" -> q148AnnIvfPqAppend _,
    "q113_heavy_hitters" -> q113HeavyHitters _,
    "q117_top_users" -> q117TopUsers _,
    "q114_heavy_hitters_grouped" -> q114HeavyHittersGrouped _,
    "q121_topk_group" -> q121TopkGroup _,
    "q122_jsonl_manifest" -> q122JsonlManifest _,
    "q123_corpus_diff" -> q123CorpusDiff _,
    "q131_corpus_overlap" -> q131CorpusOverlap _,
    "q132_shuffle_shards" -> q132ShuffleShards _,
    "q134_overlap_matrix" -> q134OverlapMatrix _,
    "q135_phrase_search" -> q135PhraseSearch _,
    "q124_nfc_normalize" -> q124NfcNormalize _,
    "q125_html_strip" -> q125HtmlStrip _,
    "q126_top_paths" -> q126TopPaths _,
    "q127_pagerank" -> q127PageRank _,
    "q128_curation_audit" -> q128CurationAudit _,
    "q120_bm25" -> q120Bm25 _,
    "q130_text_index" -> q130TextIndex _,
    "q99_sas7bdat_native" -> q99Sas7bdat _,
    "q137_warc_ingest" -> q137WarcIngest _,
    "q147_warc_split_ingest" -> q147WarcSplitIngest _,
    "q100_semdedup" -> q100SemDedup _,
    "q161_semdedup_grid" -> q161SemdedupGrid _,
    "q162_minhash_md5_grid" -> q162MinhashMd5Grid _,
    "q101_dup_spans" -> q101DupSpans _,
    "q102_contam_spans" -> q102ContamSpans _,
    "q103_leakage_safe_split" -> q103LeakageSafeSplit _,
    "q115_bloom_dedup" -> q115BloomDedup _,
    "q119_line_dedup" -> q119LineDedup _,
    "q70_binary_features" -> q70BinaryFeatures _,
    "q71_frame_sample" -> q71FrameSample _,
    "q72_resize" -> q72Resize _,
    "q139_image_features" -> q139ImageFeatures _,
    "q140_image_near_dups" -> q140ImageNearDups _,
    "q143_phash_near_dups" -> q143PhashNearDups _,
    "q144_gif_frames" -> q144GifFrames _,
    "q145_gif_frame_overlap" -> q145GifFrameOverlap _,
    "q73_frame_overlap" -> q73FrameOverlap _,
    "q152_wav_features" -> q152WavFeatures _,
    "q153_audio_fingerprint_dedup" -> q153AudioFingerprintDedup _,
    "q154_frame_overlap_guarded" -> q154FrameOverlapGuarded _,
    "q155_dedup_containment" -> q155DedupContainment _
  )
}
