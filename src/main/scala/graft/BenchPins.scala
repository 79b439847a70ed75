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
  * twice and merge with tools/regen_pins.py.
  */
object BenchPins {
  val values: Map[String, Double] = Map(
    "q01_pricing_summary" -> 0.787, "q02_null_fractions" -> 0.206,
    "q03_value_counts_pct" -> 0.251, "q04_mode_qty" -> 0.267,
    "q05_quantiles_price" -> 1.408, "q06_iqr_outlier_count" -> 0.486,
    "q07_distinct_counts" -> 0.442, "q08_target_encoding" -> 0.241,
    "q09_corr" -> 0.197, "q100_chunk_sliding" -> 0.210,
    "q101_conversation_qa" -> 0.331, "q102_ngram_char_stats" -> 0.223,
    "q103_bigram_nll" -> 1.908, "q104_dsir_weights" -> 1.073,
    "q105_dsir_resample" -> 1.582, "q106_ppl_buckets" -> 1.128,
    "q107_vocab_coverage" -> 0.377, "q108_hard_negatives" -> 0.389,
    "q109_split_assign" -> 0.242, "q10_skewness" -> 0.147,
    "q110_rrf_fusion" -> 0.980, "q111_length_buckets" -> 0.265,
    // q112 re-pinned after the aggregate-shape fix (one agg mixing two
    // DISTINCTs with percentile buffers forced a corpus-tripling Expand;
    // split 1-row aggregates + broadcast cross join measured 4.65 -> 1.01 s
    // isolated warm-min under noop)
    "q112_approx_audit" -> 1.010, "q113_url_blocklist" -> 0.551,
    "q114_source_terms" -> 0.702, "q115_c4_lines" -> 0.313,
    "q116_mix_tokens" -> 0.264, "q117_ivf_lloyd" -> 1.030,
    "q118_quality_classifier" -> 0.603, "q119_temperature_mix" -> 0.306,
    "q11_substring_filter" -> 0.220, "q120_split_leakage" -> 1.257,
    "q121_containment" -> 0.560, "q122_incremental_semdedup" -> 0.709,
    "q123_text_normalize" -> 0.226, "q124_hamming_topk" -> 0.639,
    "q125_matryoshka" -> 0.394, "q126_shared_spans" -> 1.483,
    "q127_bpe_encode" -> 1.564, "q128_cc_luhn" -> 0.196,
    // q129 re-pinned after the CharClassCounts fusion (round 13): one
    // table-lookup pass replaced six regexp_replace passes + six stripped
    // string copies per doc — isolated noop warm-min 0.551 at sf0.1,
    // 1.73 s at sf10 (was 61.9 s; 36x, slope 9.15 -> ~1.8x/decade)
    "q129_script_shares" -> 0.551, "q12_nullsafe_filter" -> 0.279,
    "q130_quality_gate" -> 0.908, "q131_skew_report" -> 0.187,
    "q132_merge_upsert" -> 0.349, "q133_heavy_hitters" -> 0.932,
    // q134 re-pinned (round 13): the only floored over-pin alarm in the
    // round-13 full run (1.501x) — the q90 signature: dependency graph
    // unchanged, isolated noop warm-min reads 1.274/1.298 (in-run 1.204),
    // never near the 0.802 pin-generation tail
    "q134_fuzzy_match" -> 1.274, "q135_scd2" -> 0.231,
    "q136_oof_encoding" -> 0.404, "q137_pagerank" -> 7.899,
    "q138_resample_ffill" -> 0.355, "q139_funnel" -> 0.309,
    "q13_length_filter" -> 0.261, "q140_cohorts" -> 0.468,
    "q141_dense_ids" -> 0.658, "q142_lsh_recall" -> 0.990,
    "q143_ivf_probe_saved" -> 0.775, "q144_psi_drift" -> 0.393,
    "q145_rolling_window" -> 0.855, "q146_novelty" -> 0.760,
    "q147_attribution" -> 0.556, "q148_jsd_sources" -> 0.959,
    "q149_ks_drift" -> 0.928, "q14_between_filter" -> 0.260,
    "q150_char_entropy" -> 1.530, "q151_weighted_sample" -> 0.152,
    "q152_stratified_sample" -> 0.260, "q153_psi_timeline" -> 0.334,
    "q154_rolling_anomaly" -> 1.235, "q155_regression" -> 1.441,
    "q156_chi_square" -> 0.514, "q157_welch_t" -> 0.400,
    "q158_mad_outliers" -> 0.729, "q159_benford" -> 0.479,
    "q15_province_ranges" -> 0.269, "q160_ewma" -> 0.615,
    "q161_markov" -> 0.567, "q162_compaction" -> 0.315,
    "q163_ndcg" -> 0.275, "q164_ndcg_global" -> 0.271,
    "q165_psi_categorical" -> 0.400, "q166_cohen_kappa" -> 0.436,
    "q167_gini_users" -> 0.631, "q168_calibration" -> 0.328,
    "q169_auc" -> 0.884, "q16_join3_revenue" -> 0.987,
    "q170_zipf_slope" -> 0.335, "q171_pmi_collocations" -> 0.742,
    "q172_psi_vs_reference" -> 0.826, "q173_psi_multi" -> 0.253,
    "q174_mutual_info" -> 0.280, "q175_contract_report" -> 0.292,
    "q176_growth_curve" -> 0.261, "q177_trimmed_mean" -> 2.750,
    "q178_mmr_rerank" -> 0.929, "q179_quantile_normalize" -> 0.300,
    "q17_anti_join" -> 0.336, "q180_bootstrap_ci" -> 0.467,
    "q181_info_gain_sweep" -> 0.367, "q182_dedup_keep_best" -> 1.849,
    "q183_anova" -> 0.529, "q184_cramers_v" -> 0.424,
    "q185_acf" -> 0.543, "q186_wasserstein" -> 2.460,
    "q187_kaplan_meier" -> 0.593, "q188_budget_waterfill" -> 0.387,
    "q189_basket_lift" -> 2.608, "q18_semi_join" -> 0.376,
    "q190_spearman" -> 2.944, "q191_jaro_winkler" -> 0.262,
    "q192_jw_match" -> 0.699, "q193_seasonal" -> 0.412,
    "q194_cusum" -> 0.305, "q195_weighted_median" -> 2.578,
    "q196_holt" -> 0.290, "q197_vocab_jaccard" -> 0.546,
    "q198_triangles" -> 2.461, "q199_ols2" -> 1.954,
    "q19_geo_theta_join" -> 0.412, "q200_lorenz" -> 0.752,
    "q201_ess" -> 0.304, "q202_rfm" -> 1.295,
    "q203_funnel_latency" -> 0.453, "q204_cvm" -> 1.076,
    "q205_interarrival" -> 0.590, "q206_entropy_rate" -> 0.311,
    "q207_lexical_diversity" -> 0.444, "q208_ab_test" -> 0.300,
    "q209_wow" -> 0.406, "q20_remap_fallback" -> 0.243,
    "q210_abc" -> 1.396, "q211_star_revenue" -> 0.938,
    "q212_grouping_sets" -> 0.494, "q213_transition_latency" -> 0.745,
    "q214_variants" -> 0.508, "q215_theil_sen" -> 0.403,
    "q216_mann_kendall" -> 0.410, "q217_bh_fdr" -> 0.549,
    "q218_kendall_tau" -> 0.290, "q219_brown_forsythe" -> 0.460,
    "q21_dedup_first" -> 1.090, "q220_slo_burn" -> 0.468,
    "q221_edit_dist_pairs" -> 0.648, "q222_doc_keywords" -> 0.938,
    "q223_hits" -> 5.171, "q224_top_sequences" -> 0.662,
    "q225_woe_iv" -> 1.031, "q226_vocab_richness" -> 0.439,
    "q227_audience_overlap" -> 0.264, "q228_durbin_watson" -> 0.403,
    "q229_ols_influence" -> 0.387, "q22_topk_per_group" -> 0.253,
    "q230_partial_corr" -> 2.001, "q231_label_noise" -> 1.309,
    "q232_bootstrap_uplift" -> 1.240, "q233_sprt" -> 0.309,
    "q234_precision_recall" -> 0.447, "q235_leaderboard_churn" -> 0.882,
    "q236_dup_rate_card" -> 0.376, "q237_quantile_bands" -> 0.486,
    "q238_consistency_audit" -> 1.246, "q239_hhi" -> 0.426,
    "q23_running_sum" -> 0.493, "q240_gains_chart" -> 0.470,
    "q241_theil_sen_by_type" -> 0.316, "q242_seasonal_anomaly" -> 0.743,
    "q243_cross_corr" -> 0.387, "q244_holt_backtest" -> 0.356,
    "q245_dup_size_hist" -> 0.308, "q246_prefix_jaccard" -> 4.281,
    "q247_qq_table" -> 0.194, "q248_stickiness" -> 0.459,
    "q249_bot_cadence" -> 0.582, "q24_set_ops" -> 0.459,
    "q250_ecdf" -> 1.231, "q251_punch_card" -> 0.268,
    "q252_cell_residuals" -> 0.463, "q253_equi_depth" -> 1.465,
    "q254_ols_by_type" -> 0.404, "q255_cohens_d" -> 0.587,
    "q256_skyline" -> 1.509, "q257_mix_shift" -> 0.582,
    "q258_cuped" -> 0.810, "q259_kn_bigram_nll" -> 2.002,
    "q25_cache_lookup" -> 0.202, "q260_broken_trend" -> 0.661,
    "q261_pq_adc" -> 2.071, "q262_pq_recall" -> 2.343,
    "q263_ivf_pq" -> 2.106, "q264_ivfpq_saved" -> 0.856,
    "q265_det_leaderboard" -> 5.155, "q266_boilerplate" -> 0.580,
    "q267_k_anonymity" -> 0.263, "q268_dp_counts" -> 0.252,
    "q269_cell_clusters" -> 1.560, "q26_text_funcs" -> 0.299,
    "q270_ivf_range" -> 0.937, "q271_ivf_add" -> 1.122,
    "q272_embed_cov" -> 1.298, "q273_pca_power" -> 1.066,
    "q274_isotropy" -> 1.314, "q275_l_diversity" -> 0.179,
    "q276_abtt_correct" -> 1.044, "q277_pca_deflate" -> 1.344,
    "q278_k_core" -> 3.093, "q279_exact_substr" -> 3.130,
    "q27_url_tail" -> 0.379, "q280_ivfpq_add" -> 2.355,
    "q281_pca_topk" -> 1.677, "q282_pca_whiten" -> 1.288,
    "q283_exact_dup_card" -> 2.030, "q284_exact_substr_cut" -> 2.243,
    "q285_abtt_topk" -> 1.210, "q286_contam_spans" -> 2.174,
    "q287_contam_card" -> 1.922, "q288_contam_probe_saved" -> 2.097,
    "q289_contam_index_add" -> 13.832, "q28_epc_bucket" -> 0.240,
    "q290_lsh_index_probe" -> 7.263, "q291_unigram_learn" -> 1.705,
    "q292_unigram_encode" -> 4.144, "q293_ivf_cell_audit" -> 0.787,
    "q294_ivf_cell_split" -> 1.574, "q295_opq_rotation" -> 2.035,
    // q297 re-pinned after its quantizer posture moved from k=n/100 to
    // k=ceil(sqrt(n)) (sf10 measured the n/100 assignment stage going
    // quadratic at 152x over two decades; sqrt-k is 54x): warm-min of two
    // isolated noop runs, 1.271/1.302 s
    "q296_contam_matches" -> 1.917, "q297_cell_clusters_scalek" -> 1.271,
    "q298_bpe_encode_saved" -> 0.555, "q299_unigram_encode_saved" -> 2.583,
    // q300 pinned at creation (round 13): warm-min of two isolated noop
    // dev runs, 2.026/2.511 s. Slower than q297 at sf0.1 BY DESIGN — the
    // two-level quantizer pays two argmin stages + a g-key join at small
    // n to buy the ~2x/decade measured slope and linear pair volume
    // (its value is at sf10, not here)
    "q300_hier_cell_clusters" -> 2.026,
    // q301 pinned at creation (round 13): isolated noop warm-min 1.855
    // (runs 1.855/1.987/2.263, the last two before the lazy-k fix that
    // skips the corpus count on cache hit); the saved-artifact twin of
    // q300 — at sf0.1 the pair/components tail dominates both
    "q301_hier_clusters_saved" -> 1.855,
    "q29_try_cast" -> 0.156, "q30_winsorize" -> 0.603,
    "q31_date_agg" -> 0.329, "q32_json_extract" -> 0.411,
    "q33_tumbling_window" -> 0.468, "q34_window_suite" -> 0.216,
    "q35_salted_agg" -> 0.392, "q36_rollup" -> 0.398,
    "q37_cube" -> 0.946, "q38_pivot" -> 0.463,
    "q40_token_stats" -> 0.250, "q41_lang_id" -> 0.344,
    "q42_quality_score" -> 0.300, "q43_fingerprint" -> 0.192,
    "q44_exact_dup" -> 0.302, "q45_ngram_jaccard" -> 0.620,
    "q46_minhash_lsh" -> 1.227, "q47_simhash" -> 0.362,
    "q48_cosine_topk" -> 0.487, "q49_cosine_neardup" -> 1.215,
    "q50_ann_lsh" -> 0.902, "q51_multimodal_features" -> 0.262,
    "q52_frame_sample" -> 0.303, "q53_embedding_stats" -> 0.306,
    "q55_dedup_clusters" -> 1.788, "q56_address_assembly" -> 0.226,
    "q57_rolling_hash" -> 0.168, "q58_winnowing" -> 0.513,
    "q60_immo_pipeline" -> 4.382, "q61_link_lifecycle" -> 2.878,
    "q62_feature_corr" -> 0.355, "q63_sessionize" -> 0.909,
    "q64_ml_leaderboard" -> 1.778, "q65_ivf_topk" -> 1.407,
    "q66_interval_join" -> 0.426, "q67_asof_join" -> 0.388,
    "q68_embed_clusters" -> 1.287, "q69_salted_join" -> 0.500,
    "q70_lang_id_ngram" -> 0.381, "q71_dedup_keep" -> 1.428,
    "q72_simhash_pairs" -> 1.645, "q73_domain_cap" -> 0.345,
    "q74_repetition" -> 0.180, "q75_c4_filter" -> 0.235,
    "q76_pii_redact" -> 0.186, "q77_incremental_dedup" -> 0.484,
    "q78_bloom_dedup" -> 0.664, "q79_paragraph_dedup" -> 0.455,
    "q80_mix_rates" -> 0.237, "q81_url_canon" -> 1.331,
    "q82_chunk_pack" -> 0.291, "q83_zvalue" -> 0.174,
    "q84_quantize_int8" -> 0.232, "q85_decontamination" -> 0.396,
    "q86_bm25_topk" -> 0.661, "q87_hash_sample" -> 0.269,
    "q88_pack_windows" -> 0.499, "q89_unigram_nll" -> 0.909,
    // q90 re-pinned (round 13, adjudicating BENCH_r12's only floored
    // over-pin alarm, 1.624x): its dependency graph is UNCHANGED since the
    // round-12 re-pin (Curation/TextAnalysis untouched; the Spread probe
    // change never engages at sf0.1 — documents 584 KB < the 8 MB gate),
    // yet three isolated noop warm-min runs read 0.715/0.814/0.864 and
    // BENCH_r12's in-run value was ~0.70 — every measurement since the
    // pin runs agrees on ~0.7-0.86. The 0.430 was the lucky tail of the
    // pin-generation min-of-4-samples, not the plan's reproducible cost.
    "q90_gopher_rules" -> 0.715, "q91_shard_assign" -> 0.439,
    "q92_semdedup" -> 1.887, "q93_html_extract" -> 0.226,
    "q94_corpus_report" -> 0.332, "q95_bpe_merges" -> 1.285,
    "q96_corpus_diff" -> 0.361, "q97_curation_e2e" -> 0.708,
    "q98_ann_recall" -> 0.873, "q99_incremental_report" -> 0.265)
}
