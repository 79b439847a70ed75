package graft

/** Per-query warm-min bench pins (seconds) at sf0.1 / local[32] — the
  * regression reference for EVERY registered query, so a tail query can
  * no longer regress silently outside the headline set.
  *
  * ROUND-12 FULL RE-PIN — SERIES BREAK (see BASELINE.md): every pin below
  * comes from TWO clean full-registry warm-min runs under the
  * FULL-CONSUMPTION `noop` timing action (the new default; min per query
  * across the two runs, totals 290.55 s / 290.78 s, 0 errors,
  * 2026-08-16). The pre-round-12 pins were a `count()`-action series;
  * round 11's audit (BENCH_ACTION_AUDIT.json) proved count() measured a
  * Catalyst-eliminated plan for 81 of 293 queries (q112 0.12 s vs 5.35 s
  * honest), so the old pins are NOT comparable and were retired wholesale
  * rather than selectively — one series, one action, recorded in the
  * bench artifact's "action" field. The historical count-series pins and
  * their adjudication log live in git history (BenchPins.scala before
  * this commit) and the final count-series totals in
  * BENCH_R12_COUNT_SIDECAR.json.
  *
  * Cross-run agreement of the two pin runs: only q174/q184/q218/q241
  * disagreed by >1.5x with >0.25 s absolute delta (GC mood on sub-second
  * queries); min-merge keeps whichever regime was healthy — the round-9
  * adjudication discipline.
  *
  * Update a pin only with an adjudicated improvement/regression (re-run
  * warm, compare, record the rationale here), never from one noisy round.
  * To regenerate after adding queries: run
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench q"`
  * twice and merge with tools/regen_pins.py.  *
  * ROUND-14 FULL RE-PIN — OPTIMIZATION RE-BASELINE (2026-08-18): every pin
  * regenerated from TWO clean full-registry warm-min runs at the r14
  * optimization round's HEAD (totals 256.81 s / 249.44 s, 0 errors,
  * action=noop, min-merged by tools/regen_pins.py). The r13 pins measured
  * the PRE-optimization code (313.1 s round-start baseline, geomean 1.159
  * on unchanged code); after this round's changes (OPTIMIZATION_r14.md:
  * recompute fixes, heavy-stage spreads, index write layout, bench block
  * hygiene) the old series would read ~0.5-0.9x everywhere and a real
  * regression could hide inside the slack, so the series re-bases
  * wholesale — same action, same method. The r13 series and its
  * adjudication comments live in git history (BenchPins.scala before this
  * commit).
  */
object BenchPins {
  val values: Map[String, Double] = Map(
    "q01_pricing_summary" -> 0.910, "q02_null_fractions" -> 0.229,
    "q03_value_counts_pct" -> 0.287, "q04_mode_qty" -> 0.271,
    "q05_quantiles_price" -> 1.666, "q06_iqr_outlier_count" -> 0.492,
    "q07_distinct_counts" -> 0.593, "q08_target_encoding" -> 0.292,
    "q09_corr" -> 0.251, "q100_chunk_sliding" -> 0.207,
    "q101_conversation_qa" -> 0.353, "q102_ngram_char_stats" -> 0.415,
    "q103_bigram_nll" -> 1.969, "q104_dsir_weights" -> 1.440,
    "q105_dsir_resample" -> 1.723, "q106_ppl_buckets" -> 1.248,
    "q107_vocab_coverage" -> 0.380, "q108_hard_negatives" -> 0.444,
    "q109_split_assign" -> 0.271, "q10_skewness" -> 0.164,
    "q110_rrf_fusion" -> 0.990, "q111_length_buckets" -> 0.258,
    "q112_approx_audit" -> 0.767, "q113_url_blocklist" -> 0.586,
    "q114_source_terms" -> 0.684, "q115_c4_lines" -> 0.309,
    "q116_mix_tokens" -> 0.283, "q117_ivf_lloyd" -> 1.129,
    "q118_quality_classifier" -> 0.703, "q119_temperature_mix" -> 0.311,
    "q11_substring_filter" -> 0.231, "q120_split_leakage" -> 1.385,
    "q121_containment" -> 0.585, "q122_incremental_semdedup" -> 0.783,
    "q123_text_normalize" -> 0.288, "q124_hamming_topk" -> 0.668,
    "q125_matryoshka" -> 0.426, "q126_shared_spans" -> 1.312,
    "q127_bpe_encode" -> 1.524, "q128_cc_luhn" -> 0.189,
    "q129_script_shares" -> 0.299, "q12_nullsafe_filter" -> 0.292,
    "q130_quality_gate" -> 0.944, "q131_skew_report" -> 0.326,
    "q132_merge_upsert" -> 0.326, "q133_heavy_hitters" -> 1.067,
    "q134_fuzzy_match" -> 1.152, "q135_scd2" -> 0.272,
    "q136_oof_encoding" -> 0.376, "q137_pagerank" -> 4.564,
    "q138_resample_ffill" -> 0.374, "q139_funnel" -> 0.344,
    "q13_length_filter" -> 0.266, "q140_cohorts" -> 0.529,
    "q141_dense_ids" -> 0.723, "q142_lsh_recall" -> 1.029,
    "q143_ivf_probe_saved" -> 0.800, "q144_psi_drift" -> 0.410,
    "q145_rolling_window" -> 1.199, "q146_novelty" -> 0.900,
    "q147_attribution" -> 0.546, "q148_jsd_sources" -> 1.064,
    "q149_ks_drift" -> 1.122, "q14_between_filter" -> 0.280,
    "q150_char_entropy" -> 1.892, "q151_weighted_sample" -> 0.152,
    "q152_stratified_sample" -> 0.283, "q153_psi_timeline" -> 0.344,
    "q154_rolling_anomaly" -> 1.672, "q155_regression" -> 1.877,
    "q156_chi_square" -> 0.484, "q157_welch_t" -> 0.483,
    "q158_mad_outliers" -> 0.675, "q159_benford" -> 0.535,
    "q15_province_ranges" -> 0.272, "q160_ewma" -> 0.691,
    "q161_markov" -> 0.544, "q162_compaction" -> 0.296,
    "q163_ndcg" -> 0.262, "q164_ndcg_global" -> 0.352,
    "q165_psi_categorical" -> 0.354, "q166_cohen_kappa" -> 0.395,
    "q167_gini_users" -> 0.587, "q168_calibration" -> 0.309,
    "q169_auc" -> 0.779, "q16_join3_revenue" -> 1.182,
    "q170_zipf_slope" -> 0.530, "q171_pmi_collocations" -> 0.696,
    "q172_psi_vs_reference" -> 0.735, "q173_psi_multi" -> 0.306,
    "q174_mutual_info" -> 0.342, "q175_contract_report" -> 0.298,
    "q176_growth_curve" -> 0.454, "q177_trimmed_mean" -> 1.463,
    "q178_mmr_rerank" -> 0.864, "q179_quantile_normalize" -> 0.293,
    "q17_anti_join" -> 0.340, "q180_bootstrap_ci" -> 0.652,
    "q181_info_gain_sweep" -> 0.310, "q182_dedup_keep_best" -> 1.753,
    "q183_anova" -> 0.741, "q184_cramers_v" -> 0.377,
    "q185_acf" -> 0.549, "q186_wasserstein" -> 2.379,
    "q187_kaplan_meier" -> 0.577, "q188_budget_waterfill" -> 0.347,
    "q189_basket_lift" -> 2.454, "q18_semi_join" -> 0.330,
    "q190_spearman" -> 2.841, "q191_jaro_winkler" -> 0.250,
    "q192_jw_match" -> 0.613, "q193_seasonal" -> 0.408,
    "q194_cusum" -> 0.290, "q195_weighted_median" -> 2.906,
    "q196_holt" -> 0.252, "q197_vocab_jaccard" -> 0.514,
    "q198_triangles" -> 2.380, "q199_ols2" -> 0.804,
    "q19_geo_theta_join" -> 0.370, "q200_lorenz" -> 0.665,
    "q201_ess" -> 0.261, "q202_rfm" -> 1.039,
    "q203_funnel_latency" -> 0.421, "q204_cvm" -> 1.188,
    "q205_interarrival" -> 0.682, "q206_entropy_rate" -> 0.379,
    "q207_lexical_diversity" -> 0.398, "q208_ab_test" -> 0.279,
    "q209_wow" -> 0.389, "q20_remap_fallback" -> 0.221,
    "q210_abc" -> 1.315, "q211_star_revenue" -> 0.933,
    "q212_grouping_sets" -> 0.547, "q213_transition_latency" -> 0.922,
    "q214_variants" -> 0.489, "q215_theil_sen" -> 0.352,
    "q216_mann_kendall" -> 0.365, "q217_bh_fdr" -> 0.701,
    "q218_kendall_tau" -> 0.515, "q219_brown_forsythe" -> 0.676,
    "q21_dedup_first" -> 1.185, "q220_slo_burn" -> 0.512,
    "q221_edit_dist_pairs" -> 0.870, "q222_doc_keywords" -> 1.021,
    "q223_hits" -> 3.041, "q224_top_sequences" -> 0.698,
    "q225_woe_iv" -> 0.944, "q226_vocab_richness" -> 0.383,
    "q227_audience_overlap" -> 0.286, "q228_durbin_watson" -> 0.355,
    "q229_ols_influence" -> 0.380, "q22_topk_per_group" -> 0.283,
    "q230_partial_corr" -> 0.727, "q231_label_noise" -> 1.216,
    "q232_bootstrap_uplift" -> 1.218, "q233_sprt" -> 0.323,
    "q234_precision_recall" -> 0.436, "q235_leaderboard_churn" -> 0.936,
    "q236_dup_rate_card" -> 0.374, "q237_quantile_bands" -> 0.560,
    "q238_consistency_audit" -> 1.509, "q239_hhi" -> 0.489,
    "q23_running_sum" -> 0.634, "q240_gains_chart" -> 0.396,
    "q241_theil_sen_by_type" -> 0.531, "q242_seasonal_anomaly" -> 0.659,
    "q243_cross_corr" -> 0.375, "q244_holt_backtest" -> 0.304,
    "q245_dup_size_hist" -> 0.292, "q246_prefix_jaccard" -> 4.522,
    "q247_qq_table" -> 0.190, "q248_stickiness" -> 0.671,
    "q249_bot_cadence" -> 0.573, "q24_set_ops" -> 0.412,
    "q250_ecdf" -> 1.089, "q251_punch_card" -> 0.260,
    "q252_cell_residuals" -> 0.387, "q253_equi_depth" -> 1.470,
    "q254_ols_by_type" -> 0.372, "q255_cohens_d" -> 0.588,
    "q256_skyline" -> 1.296, "q257_mix_shift" -> 0.528,
    "q258_cuped" -> 0.715, "q259_kn_bigram_nll" -> 1.816,
    "q25_cache_lookup" -> 0.187, "q260_broken_trend" -> 0.542,
    "q261_pq_adc" -> 1.045, "q262_pq_recall" -> 1.370,
    "q263_ivf_pq" -> 1.196, "q264_ivfpq_saved" -> 0.792,
    "q265_det_leaderboard" -> 2.322, "q266_boilerplate" -> 0.616,
    "q267_k_anonymity" -> 0.254, "q268_dp_counts" -> 0.244,
    "q269_cell_clusters" -> 1.157, "q26_text_funcs" -> 0.258,
    "q270_ivf_range" -> 0.787, "q271_ivf_add" -> 0.998,
    "q272_embed_cov" -> 1.069, "q273_pca_power" -> 0.903,
    "q274_isotropy" -> 0.894, "q275_l_diversity" -> 0.312,
    "q276_abtt_correct" -> 0.730, "q277_pca_deflate" -> 0.901,
    "q278_k_core" -> 2.670, "q279_exact_substr" -> 2.564,
    "q27_url_tail" -> 0.319, "q280_ivfpq_add" -> 1.538,
    "q281_pca_topk" -> 1.345, "q282_pca_whiten" -> 1.033,
    "q283_exact_dup_card" -> 1.774, "q284_exact_substr_cut" -> 1.944,
    "q285_abtt_topk" -> 1.060, "q286_contam_spans" -> 1.783,
    "q287_contam_card" -> 1.879, "q288_contam_probe_saved" -> 1.585,
    "q289_contam_index_add" -> 5.787, "q28_epc_bucket" -> 0.230,
    "q290_lsh_index_probe" -> 3.239, "q291_unigram_learn" -> 0.740,
    "q292_unigram_encode" -> 1.291, "q293_ivf_cell_audit" -> 0.637,
    "q294_ivf_cell_split" -> 1.485, "q295_opq_rotation" -> 1.538,
    "q296_contam_matches" -> 1.603, "q297_cell_clusters_scalek" -> 0.771,
    "q298_bpe_encode_saved" -> 0.598, "q299_unigram_encode_saved" -> 0.727,
    "q29_try_cast" -> 0.156, "q300_hier_cell_clusters" -> 0.789,
    "q301_hier_clusters_saved" -> 0.866, "q302_ann_e2e" -> 1.027,
    "q303_hier3_clusters" -> 1.239, "q304_hier_lloyd_ivf" -> 1.443,
    "q30_winsorize" -> 0.584, "q31_date_agg" -> 0.351,
    "q32_json_extract" -> 0.511, "q33_tumbling_window" -> 0.498,
    "q34_window_suite" -> 0.362, "q35_salted_agg" -> 0.520,
    "q36_rollup" -> 0.546, "q37_cube" -> 1.080,
    "q38_pivot" -> 0.646, "q40_token_stats" -> 0.233,
    "q41_lang_id" -> 0.362, "q42_quality_score" -> 0.282,
    "q43_fingerprint" -> 0.324, "q44_exact_dup" -> 0.261,
    "q45_ngram_jaccard" -> 0.558, "q46_minhash_lsh" -> 1.330,
    "q47_simhash" -> 0.333, "q48_cosine_topk" -> 0.427,
    "q49_cosine_neardup" -> 1.231, "q50_ann_lsh" -> 0.842,
    "q51_multimodal_features" -> 0.278, "q52_frame_sample" -> 0.284,
    "q53_embedding_stats" -> 0.259, "q55_dedup_clusters" -> 1.599,
    "q56_address_assembly" -> 0.197, "q57_rolling_hash" -> 0.131,
    "q58_winnowing" -> 0.398, "q60_immo_pipeline" -> 3.812,
    "q61_link_lifecycle" -> 2.535, "q62_feature_corr" -> 0.363,
    "q63_sessionize" -> 0.859, "q64_ml_leaderboard" -> 1.464,
    "q65_ivf_topk" -> 1.174, "q66_interval_join" -> 0.364,
    "q67_asof_join" -> 0.579, "q68_embed_clusters" -> 0.997,
    "q69_salted_join" -> 0.692, "q70_lang_id_ngram" -> 0.352,
    "q71_dedup_keep" -> 1.326, "q72_simhash_pairs" -> 2.200,
    "q73_domain_cap" -> 0.290, "q74_repetition" -> 0.174,
    "q75_c4_filter" -> 0.220, "q76_pii_redact" -> 0.156,
    "q77_incremental_dedup" -> 0.413, "q78_bloom_dedup" -> 0.556,
    "q79_paragraph_dedup" -> 0.393, "q80_mix_rates" -> 0.209,
    "q81_url_canon" -> 1.471, "q82_chunk_pack" -> 0.264,
    "q83_zvalue" -> 0.187, "q84_quantize_int8" -> 0.225,
    "q85_decontamination" -> 0.361, "q86_bm25_topk" -> 0.647,
    "q87_hash_sample" -> 0.233, "q88_pack_windows" -> 0.460,
    "q89_unigram_nll" -> 0.918, "q90_gopher_rules" -> 0.619,
    "q91_shard_assign" -> 0.468, "q92_semdedup" -> 1.552,
    "q93_html_extract" -> 0.208, "q94_corpus_report" -> 0.353,
    "q95_bpe_merges" -> 1.085, "q96_corpus_diff" -> 0.291,
    "q97_curation_e2e" -> 0.746, "q98_ann_recall" -> 1.085,
    "q99_incremental_report" -> 0.261)

}
