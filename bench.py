#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect bottleneck). A warmup query amortizes JVM/session
startup so the numbers measure the plans, not Spark boot.

Seal protocol (`bench.py --seal [--runs 3] [--out FILE]
[--load-threshold L]`): the per-round adopted number comes from N
fresh-subprocess runs (each its own JVM — no code-cache/GC aging
between runs). Before each run the 1-min loadavg must drop below the
threshold (polled up to 10 min; a run that starts contended anyway is
marked `contended` and is ineligible for adoption unless every run is).
The single emitted artifact carries every run (loadavg before/after,
totals) plus the ADOPTED run — median headline total among eligible
runs — flattened at top level so existing BENCH_LOCAL readers work
unchanged. This codifies what PERF_NOTES r9 did by hand (46% host-drift
band across the r9b seal runs; VERDICT r9 "Next round" #4).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark

HEADLINE = [
    "tpch_q1",
    "tpch_q6_like",
    "tpch_q3_like",
    "tpch_q4_like",
    "tpch_q5_like",
    "tpch_q10_like",
    "tpch_q18_like",
    "tpch_q9_like",
    "tpch_q21_like",
    "join_inner_multi",
    "window_running",
    "events_sessionize",
    "events_user_funnel",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "ann_ivf_topk",
    "text_token_stats",
    "range_join_buckets",
    "sample_hash",
    "skew_salted_join",
    "pipeline_curate",
]

# Curation flagships: the two most expensive operators a real curation
# run ships (composed LSH dedup -> CC -> keep-best, and the full
# Gopher -> dedup -> PII -> chunk ingest pipeline), tracked
# round-over-round headline-style under their own stable section
# (VERDICT r3 #8). They STAY in EXTENSION too so extension_total keeps
# its r2/r3 composition — the ~5s of duplicate timing is deliberate.
CURATION = [
    "dedup_keep_best",
    "pipeline_curate_full",
]

# Post-freeze extension queries: timed as a SEPARATE section (own total)
# so the headline round-over-round totals stay comparable, per the
# round-2 review. scripts/dump_plans.py audits the same list.
EXTENSION = [
    "text_decontaminate",
    "text_vocab_topk",
    "text_repetition",
    "curation_token_budget",
    "dedup_semantic_lsh",
    "dedup_semantic_verified",
    "dedup_minhash_lsh_capped",
    "ann_ivf_kmeans_topk",
    "ann_centroid_classify",
    "text_chunk_windows",
    "curation_quality_sample",
    "tpch_q2_like",
    "tpch_q15_like",
    "ann_pq_topk",
    "text_pii_redact",
    "text_gopher_quality",
    "text_tfidf_keywords",
    "events_anomaly_zscore",
    "dedup_keep_best",
    "scd2_intervals",
    "streaming_anomaly_zscore",
    "curation_dataset_card",
    "text_winnow_fingerprints",
    "pipeline_curate_full",
    "ann_ivfpq_topk",
    "multimodal_dedup_exact",
]


# Round-4 additions: their own section so extension_total keeps its
# r2/r3 composition; future rounds append here or open a new section.
EXTENSION_R4 = [
    "dedup_shared_ngrams",
    "dedup_winnow_pairs",
    "curation_importance_weights",
    "curation_mixture_sample",
    "curation_block_dedup",
    "text_pii_luhn",
    "text_bytes_per_token",
    "ann_range_search",
    "streaming_mixture_sample",
    "multimodal_frame_dedup",
    "dedup_substring_spans",
    "text_quality_classifier",
    "text_inverted_index",
    "text_bm25_topk",
    "dedup_sorted_neighborhood",
    "join_null_aware_anti",
    "scan_zonemap_prune",
    "asof_point_in_time",
    "stats_column_profile",
    "streaming_stream_left_join",
    "events_countmin_heavy_hitters",
    "curation_perplexity_buckets",
    "text_bigram_lm_score",
    "events_markov_transitions",
    "streaming_vocab_topk",
    "dedup_minhash_incremental",
    "dedup_crossmodal_agreement",
    "dedup_prefix_filter",
    "dedup_simhash_hamming",
    "curation_leakage_safe_split",
    "ann_knn_graph",
    "graph_pagerank_knn",
    "approx_hll_mergeable_rollup",
    "events_attribution_first_touch",
    "streaming_countmin_heavy_hitters",
    "join_interval_overlap",
    "dedup_exact_normalized",
    "events_path_mining",
    "streaming_materialized_agg",
    "pipeline_feature_matrix",
]

# Round-5 additions: own section, same contract.
EXTENSION_R5 = [
    "curation_source_cap",
    "curation_curriculum_order",
    "sample_reservoir_per_key",
    "join_bloom_prefilter",
    "ann_int8_quantize",
    "events_ewma_half",
    "events_gap_fill_asof",
    "text_trigram_backoff",
    "text_ngram_novelty",
    "graph_triangle_count",
    "agg_percentile_exact",
    "agg_mode_deterministic",
    "events_feature_lags",
    "window_rolling_distinct",
    "scan_partitioned_write_prune",
    "streaming_reservoir_sample",
    "graph_label_propagation",
    "join_asof_nearest",
    "agg_corr_manual",
    "events_hourly_profile",
    "curation_shard_manifest",
    "pipeline_dataset_build",
    "streaming_ewma_half",
    "dedup_bloom_ingest",
    "agg_histogram_fixed_bins",
    "ann_pca_power_iteration",
    "streaming_histogram",
    "text_rake_keywords",
    "multimodal_payload_simhash",
    "events_time_to_convert",
    "privacy_k_anonymity",
    "text_bpe_train_merges",
    "text_bpe_encode",
    "events_anomaly_mad",
    "curation_gini_balance",
    "events_dau_wau_stickiness",
    "text_source_drift_tv",
    "text_vocab_coverage_curve",
    "curation_dedup_rate_report",
    "privacy_pii_density_report",
    "streaming_source_drift",
]


# Round-6 additions: own section, same contract.
EXTENSION_R6 = [
    "ann_lsh_topk_derived",
    "agg_trimmed_mean_exact",
    "agg_skew_kurtosis_exact",
    "agg_weighted_median_bytes",
    "events_changepoint_cusum",
    "events_rfm_segments",
    "events_interarrival_profile",
    "events_seasonality_profile",
    "ann_lsh_recall_report",
    "emb_centroid_shift",
    "graph_kcore_peel2",
    "graph_common_neighbors",
    "curation_mixture_reweight",
    "text_lexical_diversity",
    "text_cooccurrence_lift",
    "scan_footer_stats",
    "streaming_cusum_alarm",
    "approx_hll_manual",
    "text_feature_hashing",
    "events_bounce_rate",
    "dedup_lsh_recall_curve",
    "curation_quality_length_bias",
    "events_pareto_concentration",
    "events_anomaly_iqr",
    "scd2_as_of_snapshot",
    "pipeline_incremental_ingest",
    "curation_funnel_report",
    "graph_reachability_3hop",
    "streaming_rfm_segments",
    "events_user_overlap_jaccard",
    "curation_cluster_size_histogram",
    "curation_rater_agreement_kappa",
    "curation_score_calibration",
    "events_seasonal_naive_backtest",
    "text_langid_confusion",
    "emb_knn_label_accuracy",
    "agg_winsorized_mean",
    "events_abtest_ztest",
    "scan_zorder_multicol_prune",
    "streaming_funnel_live",
    "curation_budget_waterfill",
    "ann_ivf_recall_report",
    "dedup_threshold_sweep",
    "curation_source_overlap_matrix",
]


# Round-7 additions: own section, same contract.
EXTENSION_R7 = [
    "agg_mannwhitney_u",
    "agg_ks_two_sample",
    "agg_chi2_independence",
    "agg_benford_first_digit",
    "agg_autocorr_daily",
    "agg_theil_sen_trend",
    "agg_bitmap_exact_distinct",
    "text_zipf_decade_ratio",
    "text_char_class_profile",
    "curation_dsir_contrast",
    "curation_stratified_quota",
    "emb_matryoshka_recall",
    "emb_jl_distortion",
    "emb_dim_variance_topk",
    "emb_cosine_pair_histogram",
    "graph_resource_allocation",
    "graph_degree_histogram",
    "join_bucketed_colocated",
    "agg_grouping_sets_id",
    "window_range_1h",
    "multimodal_audio_vad",
    "streaming_bitmap_distinct",
    "dedup_minhash_estimate_error",
    "graph_clustering_coefficient",
    "events_holt_forecast",
    "curation_survivorship_audit",
    "agg_bootstrap_mean_ci",
    "agg_poisson_rate_ci",
    "events_mde_power_curve",
    "quality_completeness_report",
    "quality_uniqueness_report",
    "quality_referential_integrity",
    "quality_constraint_violations",
    "quality_freshness_report",
    "feature_target_encode_smoothed",
    "feature_target_encode_oof",
    "feature_vocab_index_topk",
    "setop_intersect_all",
    "setop_except_all",
    "agg_filter_clause",
    "order_by_nulls_first",
    "window_ignore_nulls_locf",
    "scan_schema_evolution",
    "agg_bh_fdr",
    "agg_cohens_d",
    "quality_roc_auc",
    "events_kaplan_meier",
    "events_did_estimator",
    "events_markov_removal",
    "ann_hybrid_rrf",
    "dedup_edit_distance",
    "graph_jaccard_linkpred",
    "graph_copurchase_projection",
    "curation_interleave_sources",
    "streaming_minhash_dedup",
    "ann_ivf_nprobe_sweep",
    "events_cohort_ltv",
    "events_funnel_step_time",
    "scalar_bitwise_funcs",
    "scan_corrupt_records",
    "sink_dynamic_partition_overwrite",
    "events_order_violations",
    "approx_hll_error_curve",
    "agg_ols_hourly_trend",
    "agg_beta_posterior",
    "pipeline_cdc_apply",
    "agg_spearman_rho",
    "quality_pr_auc",
    "quality_brier_decomposition",
    "quality_lift_deciles",
    "subquery_any_all",
    "graph_harmonic_centrality",
    "text_readability",
    "streaming_cdc_apply",
    "agg_runs_test",
    "agg_durbin_watson",
    "graph_modularity",
    "window_qualify",
    "ann_mmr_rerank",
    "emb_pq_distortion",
    "streaming_asof_enrich",
    "text_burstiness",
    "events_attribution_position",
    "curation_skyline_2d",
    "sample_systematic",
    "multimodal_phash_dct",
    "quality_ece",
    "scan_manifest_time_travel",
    "multimodal_phash_near_dup",
    "agg_covariance_matrix",
    "curation_temperature_mixture",
    "events_ab_srm_check",
    "agg_welch_ttest",
]


EXTENSION_R8 = [
    "agg_kruskal_wallis",
    "agg_mann_kendall_trend",
    "agg_brown_forsythe",
    "agg_wilcoxon_signed_rank",
    "events_pettitt_changepoint",
    "agg_hodges_lehmann_shift",
    "quality_confusion_sweep",
    "quality_mcc_sweep",
    "quality_youden_threshold",
    "quality_macro_f1_lang",
    "multimodal_phash_cap_audit",
    "graph_wedge_cap_audit",
    "graph_mutual_knn_rate",
    "maintenance_compaction_plan",
    "emb_label_centroid_outliers",
    "graph_assortativity",
    "privacy_l_diversity",
    "approx_kmv_distinct",
    "curation_semdedup_cells",
    "maintenance_delete_plan",
    "events_theta_forecast",
    "events_funnel_wilson_ci",
    "dedup_semantic_threshold_sweep",
    "ann_lsh_tables_recall_sweep",
    "streaming_kmv_distinct",
    "dedup_minhash_bbit_audit",
    "events_activity_streaks",
    "scan_mor_position_deletes",
    "multimodal_video_scene_cuts",
    "ann_graph_greedy_search",
    "agg_jarque_bera",
    "agg_levene_mean",
    "agg_cramers_v",
    "agg_mcnemar",
    "agg_simpson_diversity",
    "quality_ks_separation",
    "quality_hellinger_drift",
    "privacy_t_closeness",
    "graph_hubness_audit",
    "graph_transitivity_global",
    "graph_rich_club",
    "graph_ktruss_support",
    "emb_davies_bouldin",
    "cte_recursive_month_spine",
    "scalar_try_funcs",
    "events_spectral_power",
    "events_seasonal_strength",
    "text_lix_rix",
    "text_smog_grade",
    "multimodal_ahash_dhash",
    "quality_gmean_sweep",
    "curation_effective_sample_size",
    "agg_fleiss_kappa",
    "events_gini_activity",
    "maintenance_snapshot_expiry_plan",
    "emb_silhouette_sampled",
    "text_textrank_keywords",
    "quality_cost_curve",
    "events_pacf",
    "streaming_hellinger_drift",
    "streaming_seasonal_strength",
    "agg_grubbs_statistic",
    "agg_dixon_q",
    "events_atkinson_index",
    "emb_norm_profile",
    "select_group_by_all",
    "window_named_clause",
    "ann_greedy_entries_sweep",
]


EXTENSION_R9 = [
    "retrieval_tfidf_cosine_topk",
    "retrieval_qlm_dirichlet_topk",
    "retrieval_eval_report",
    "retrieval_rrf_fusion",
    "retrieval_index_stats",
    "events_page_hinkley",
    "events_rsi_cutler",
    "events_bollinger_bands",
    "events_max_drawdown",
    "agg_cliffs_delta",
    "agg_friedman_kendall_w",
    "agg_cochrans_q",
    "agg_gini_mean_difference",
    "agg_lorenz_deciles",
    "agg_quartile_dispersion",
    "agg_cronbach_alpha",
    "curation_kcenter_coreset",
    "curation_submodular_coverage",
    "streaming_page_hinkley",
    "streaming_max_drawdown",
    "maintenance_manifest_diff",
    "emb_knn_margin_audit",
    "quality_weighted_kappa",
    "quality_spiegelhalter_z",
    "events_turning_points",
    "events_ljung_box",
    "emb_energy_distance_sampled",
    "privacy_suppression_plan",
    "ann_ivf_balance_audit",
    "curation_cluster_purity",
    "graph_component_size_histogram",
    "text_shingle_simpson_by_source",
    "select_star_except",
    "multimodal_quadrant_ahash",
    "agg_chebyshev_bound_check",
]

# Round-9 late-session additions: own section so the earlier r9 seal's
# extension_r9_total stays comparable to BENCH_LOCAL_r9.json.
EXTENSION_R9B = [
    "join_bloom_prune",
    "select_lateral_topn",
    "scalar_distinct_predicates",
    "maintenance_zorder_clustering",
    "approx_kmv_intersection",
    "sample_priority_weighted",
    "agg_mood_median_test",
    "stats_kendall_tau_binned",
    "events_cuped_adjustment",
    "events_ma_decomposition",
    "events_seasonal_anomaly",
    "agg_sn_estimator_daily",
    "ann_sign_hamming_rerank",
    "retrieval_ndcg_at10",
    "quality_selection_rate_parity",
    "privacy_generalization_ladder",
    "events_granger_lag1",
    "agg_siegel_tukey",
    "events_qini_uplift_deciles",
    "retrieval_rm3_expansion",
    "streaming_seasonal_anomaly",
    "events_randomization_test",
    "agg_tukey_hsd_pairs",
    "text_boilerplate_prefix",
    "events_circular_hour_stats",
    "events_attribution_window_sweep",
    "approx_rank_synopsis_quantiles",
    "events_concurrency_profile",
    "scan_rowgroup_stats_audit",
    "emb_label_noise_candidates",
    "events_ewma_control_chart",
    "events_bot_regularity_flags",
    "scalar_variant_json",
    "setop_union_by_name",
    "order_nulls_placement",
    "streaming_ewma_control_chart",
    "emb_anisotropy_profile",
    "agg_median_polish",
    "events_forecast_ensemble_backtest",
    "events_did_placebo_pretrends",
]

EXTENSION_R10 = [
    "retrieval_jm_smoothing_topk",
    "retrieval_bm25f_fields",
    "retrieval_pivoted_length_norm",
    "retrieval_map_mrr",
    "retrieval_rank_agreement",
    "retrieval_phrase_match",
    "retrieval_snippet_best_window",
    "ann_label_filtered_topk",
    "emb_triplet_mining",
    "emb_residual_quantize",
    "ann_knn_graph_derived",
    "text_heaps_doubling",
    "text_vocab_tail_profile",
    "text_source_chi2_drift",
    "events_croston_forecast",
    "events_ordinal_patterns",
    "events_sampen_ratio",
    "events_vshape_patterns",
    "quality_equalized_odds_gap",
    "sample_neyman_allocation",
    "join_natural_using",
    "scalar_interval_arithmetic",
    "scd2_apply_changes",
    "graph_local_bridges",
]

EXTENSION_R11 = [
    "text_kneser_ney_bigram",
    "sample_pps_systematic",
    "emb_matryoshka_edge_distortion",
    "dedup_crossmodal_candidate_audit",
]


def _time_section(spark, qs, names: list[str], sf_dir: str) -> dict[str, float]:
    """Best-of-2 full passes: one transient stall (GC, page cache miss,
    machine contention) otherwise lands verbatim in the recorded number.
    clearCache between queries: several operators persist intermediates
    (minhash shingle projection, IVF normalized corpus) that would
    otherwise accumulate across the suite — each timed run then pays
    for (and benefits from) exactly its own caching, so numbers are
    order-independent round over round. Pass 1 doubles as the section's
    codegen warmup (min() picks the warm pass 2)."""
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), t)
    return timings


_CALIB_ROWS = 8_000_000_000  # sized for ~3s on a quiet 32-thread host


def _calibrate(spark) -> float:
    """Fixed CPU-bound calibration workload (r10 verdict #3): hash-fold a
    constant in-memory range — zero I/O, zero shuffle beyond the final
    1-row agg, fully deterministic, partitioned like the bench (32).
    Its wall time measures the HOST's effective compute rate at bench
    time, so a round-over-round headline delta decomposes with numbers:
    if headline and calib moved by the same factor, the host moved; if
    headline moved alone, the code did. Warm pass + best-of-2 timed
    passes, the same discipline as the query sections."""
    from pyspark.sql import functions as F

    def run() -> None:
        (
            spark.range(0, _CALIB_ROWS, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.sum(F.col("h") % 1024).alias("s"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    run()  # codegen warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return round(best, 3)


SECTIONS = {
    "headline": HEADLINE,
    "curation": CURATION,
    "extension": EXTENSION,
    "r4": EXTENSION_R4,
    "r5": EXTENSION_R5,
    "r6": EXTENSION_R6,
    "r7": EXTENSION_R7,
    "r8": EXTENSION_R8,
    "r9": EXTENSION_R9,
    "r9b": EXTENSION_R9B,
    "r10": EXTENSION_R10,
    "r11": EXTENSION_R11,
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Optional scope-down knobs (both inherited by --seal subprocesses):
    # SPARK_GRAFT_BENCH_QUERIES="a,b,c" times exactly those queries as a
    # single custom section (the sf1 scale-stress path); otherwise
    # SPARK_GRAFT_BENCH_SECTIONS="headline,r9b" limits which standard
    # sections run. Default: everything.
    only_queries = [
        q
        for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",")
        if q
    ]
    only_sections = {
        s
        for s in os.environ.get("SPARK_GRAFT_BENCH_SECTIONS", "").split(",")
        if s
    }
    if only_queries:
        return _main_custom(only_queries, sf_dir, sf)

    def want(section: str) -> bool:
        return not only_sections or section in only_sections

    # Host-state capture (r12 verdict #1/#3): a contaminated run must be
    # mechanically distinguishable from a regression after the fact.
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warmup: boot executors + parquet footer caches on a small scan, and
    # compile the HEADLINE plans' codegen at the smallest SF so the
    # tracked numbers measure the plans at sf_dir, not Janino
    # compilation. Extension sections self-warm via pass 1 of their
    # best-of-2 (min() records the warm pass) — warming all ~280 plans
    # here aged the JVM (code cache, GC tenuring) before the tracked
    # sections ran, which is where the round-over-round companion drift
    # came from (r4 7.92s -> r6 9.29s as the registry grew 187 -> 280).
    qs["scan_project"].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # Host-rate calibration BEFORE the timed sections (same JVM, same
    # thread count): carried in the artifact so headline deltas are
    # decomposable into host band vs code with numbers, not narrative.
    calib = _calibrate(spark)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and want("headline"):
        for wq in HEADLINE:
            qs[wq].build(spark, warm_dir).write.mode("overwrite").format("noop").save()

    def section(name: str, names: list[str]) -> tuple[dict[str, float], float]:
        if not want(name):
            return {}, 0.0
        t = _time_section(spark, qs, names, sf_dir)
        return t, round(sum(t.values()), 3)

    timings, total = section("headline", HEADLINE)

    # Companion pass at sf0.01: a low-variance second datapoint so
    # round-over-round deltas aren't drowned by sf0.1 run noise. Runs
    # IMMEDIATELY after the headline pass — before the ~150 extension
    # queries age the JVM — so its round-over-round comparison tracks
    # the plans, not how many operators later sections gained.
    companion: dict[str, float] = {}
    comp_dir = "/root/testdata/sf0.01"
    if (
        want("headline")
        and os.path.isdir(comp_dir)
        and os.path.abspath(comp_dir) != os.path.abspath(sf_dir)
    ):
        companion = _time_section(spark, qs, HEADLINE, comp_dir)

    # Extension sets: separate best-of-2 passes and separate totals so
    # the headline number stays comparable across rounds while the newer
    # curation / ANN-training / TPC-H-tail operators still get timed.
    ext_timings, ext_total = section("extension", EXTENSION)
    r4_timings, r4_total = section("r4", EXTENSION_R4)
    r5_timings, r5_total = section("r5", EXTENSION_R5)
    r6_timings, r6_total = section("r6", EXTENSION_R6)
    r7_timings, r7_total = section("r7", EXTENSION_R7)
    r8_timings, r8_total = section("r8", EXTENSION_R8)
    r9_timings, r9_total = section("r9", EXTENSION_R9)
    r9b_timings, r9b_total = section("r9b", EXTENSION_R9B)
    r10_timings, r10_total = section("r10", EXTENSION_R10)
    r11_timings, r11_total = section("r11", EXTENSION_R11)

    # Curation flagships: best-of-2, own stable total (r3 comparison
    # base: extension_queries.dedup_keep_best / pipeline_curate_full).
    cur_timings, cur_total = section("curation", CURATION)

    from sql_engine_spark.sharedcost import snapshot as shared_builds

    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_wall_sec": calib,
        "loadavg_start": loadavg_start,
        "shared_builds": shared_builds(),
        "calibrated_headline_ratio": (
            round(total / calib, 3) if calib else None
        ),
        "extension_total": ext_total,
        "extension_queries": ext_timings,
        "curation_total": cur_total,
        "curation_queries": cur_timings,
        "extension_r4_total": r4_total,
        "extension_r4_queries": r4_timings,
        "extension_r5_total": r5_total,
        "extension_r5_queries": r5_timings,
        "extension_r6_total": r6_total,
        "extension_r6_queries": r6_timings,
        "extension_r7_total": r7_total,
        "extension_r7_queries": r7_timings,
        "extension_r8_total": r8_total,
        "extension_r8_queries": r8_timings,
        "extension_r9_total": r9_total,
        "extension_r9_queries": r9_timings,
        "extension_r9b_total": r9b_total,
        "extension_r9b_queries": r9b_timings,
        "extension_r10_total": r10_total,
        "extension_r10_queries": r10_timings,
        "extension_r11_total": r11_total,
        "extension_r11_queries": r11_timings,
    }
    if companion:
        out["companion_sf"] = 0.01
        out["companion_total"] = round(sum(companion.values()), 3)
        out["companion_queries"] = companion
    # Full per-query artifact: the driver's stdout capture truncates to
    # a 2,000-char tail, which loses every per-query map (the r6 verdict
    # could not attribute a +16% section drift for exactly this reason).
    # The committed BENCH_LOCAL artifact is the durable evidence.
    art = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    try:
        with open(art, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    print(json.dumps(out))
    # The full line above is several KB; a bounded stdout-tail capture
    # can truncate its head and lose the round-over-round headline
    # numbers (BENCH_r04 did exactly that). Repeat the totals PLUS the
    # headline/companion per-query maps as a compact LAST line so any
    # tail keeps them and a parse-the-last-line reader gets valid JSON.
    # The per-query maps were dropped from this line when the compact
    # summary was introduced, which left the r12 driver comparison with
    # n_common=0 / a null geomean / empty scaling.per_query (r12 verdict
    # #1) — restored here, serialized with compact separators so the
    # whole line stays within a 2,000-char stdout-tail capture.
    summary = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "calib_wall_sec": calib,
        "loadavg_start": loadavg_start,
        "queries": timings,
        "headline_total": total,
        "curation_total": cur_total,
        "extension_total": ext_total,
        "extension_r4_total": r4_total,
        "extension_r5_total": r5_total,
        "extension_r6_total": r6_total,
        "extension_r7_total": r7_total,
        "extension_r8_total": r8_total,
        "extension_r9_total": r9_total,
        "extension_r9b_total": r9b_total,
        "extension_r10_total": r10_total,
        "extension_r11_total": r11_total,
        "shared_builds": shared_builds(),
    }
    if companion:
        summary["companion_total"] = out["companion_total"]
        summary["companion_queries"] = companion
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1990:
        # Never let the contract-critical per-query maps fall off a
        # 2,000-char tail: shed shared_builds first (it stays in the
        # full first line and the committed artifact), then companion.
        summary.pop("shared_builds", None)
        line = json.dumps(summary, separators=(",", ":"))
        if len(line) > 1990:
            summary.pop("companion_queries", None)
            line = json.dumps(summary, separators=(",", ":"))
    print(line, flush=True)
    return 0


def _main_custom(names: list[str], sf_dir: str, sf) -> int:
    """SPARK_GRAFT_BENCH_QUERIES path: time exactly the named queries as
    one section (the sf1 scale-stress seal uses this). Same best-of-2 /
    noop-sink / warmup discipline as the standard sections."""
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    qs["scan_project"].build(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(
        sf_dir
    ):
        for wq in names:
            qs[wq].build(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
    calib = _calibrate(spark)
    timings = _time_section(spark, qs, names, sf_dir)
    total = round(sum(timings.values()), 3)
    from sql_engine_spark.sharedcost import snapshot as shared_builds

    out = {
        "metric": "custom_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "sf_dir": sf_dir,
        "calib_wall_sec": calib,
        "shared_builds": shared_builds(),
    }
    art = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if art:
        try:
            with open(art, "w") as fh:
                json.dump(out, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass
    print(json.dumps(out), flush=True)
    return 0


def seal(argv: list[str]) -> int:
    """N fresh-subprocess bench runs -> ONE artifact with all runs and
    the adopted median. See module docstring."""
    import statistics
    import subprocess
    import tempfile

    runs_n = 3
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_SEAL.json"
    )
    load_threshold = 8.0
    wait_budget_s = 600.0
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs_n = int(argv[i + 1]); i += 2
        elif argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        elif argv[i] == "--load-threshold":
            load_threshold = float(argv[i + 1]); i += 2
        else:
            print(f"unknown --seal arg: {argv[i]}", file=sys.stderr)
            return 2
    # No-Spark preflight: a seal must never be produced from a stale
    # tree (r10 shipped a red suite exactly this way — REGISTRY.md went
    # stale after its last regen and nothing re-checked before sealing).
    pf = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts",
                "preflight.py",
            ),
        ],
        capture_output=True,
        text=True,
    )
    sys.stdout.write(pf.stdout)
    if pf.returncode != 0:
        print("seal refused: preflight failed", file=sys.stderr)
        return 1
    runs = []
    for r in range(runs_n):
        # Gate on host quiescence: a run started under load measures the
        # neighbors, not the plans.
        waited = 0.0
        load0 = os.getloadavg()[0]
        while load0 > load_threshold and waited < wait_budget_s:
            time.sleep(15.0)
            waited += 15.0
            load0 = os.getloadavg()[0]
        contended = load0 > load_threshold
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            run_art = tf.name
        env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=run_art)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        elapsed = round(time.time() - t0, 1)
        load1 = os.getloadavg()[0]
        entry = {
            "run": r + 1,
            "loadavg_start": round(load0, 2),
            "loadavg_end": round(load1, 2),
            "contended": contended,
            "wall_sec": elapsed,
            "returncode": proc.returncode,
        }
        try:
            with open(run_art) as fh:
                entry["result"] = json.load(fh)
        except (OSError, ValueError):
            entry["result"] = None
            entry["stderr_tail"] = proc.stderr[-500:]
        finally:
            try:
                os.unlink(run_art)
            except OSError:
                pass
        runs.append(entry)
        v = entry["result"]["value"] if entry["result"] else None
        print(
            f"seal run {r + 1}/{runs_n}: headline={v} load_start={load0:.2f}"
            f" load_end={load1:.2f} contended={contended}",
            flush=True,
        )
    good = [e for e in runs if e["result"] is not None]
    if not good:
        print("seal: every run failed", file=sys.stderr)
        return 1
    eligible = [e for e in good if not e["contended"]] or good
    # median headline total among eligible runs (even count: lower middle,
    # so the adopted artifact is always a real run, never an average)
    vals = sorted(e["result"]["value"] for e in eligible)
    med = vals[(len(vals) - 1) // 2]
    adopted = next(e for e in eligible if e["result"]["value"] == med)
    out = dict(adopted["result"])
    def _calibrated(res) -> float | None:
        if not res or not res.get("calib_wall_sec"):
            return None
        return round(res["value"] / res["calib_wall_sec"], 3)

    out["seal"] = {
        "protocol": "median-of-N fresh subprocesses, loadavg-gated, "
        "host-rate calibrated",
        "runs_requested": runs_n,
        "load_threshold_1min": load_threshold,
        "adopted_run": adopted["run"],
        "headline_totals": [
            e["result"]["value"] if e["result"] else None for e in runs
        ],
        "calib_walls": [
            (e["result"] or {}).get("calib_wall_sec") for e in runs
        ],
        "calibrated_ratios": [_calibrated(e["result"]) for e in runs],
        "runs": [
            {k: v for k, v in e.items() if k != "result"} for e in runs
        ],
        "all_results": [e["result"] for e in runs],
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": out["value"],
                "unit": "sec",
                "sf": out.get("sf"),
                "adopted_run": adopted["run"],
                "headline_totals": out["seal"]["headline_totals"],
                "out": out_path,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--seal":
        sys.exit(seal(sys.argv[2:]))
    sys.exit(main())
