"""Oracle-checked query registry.

Every operator the engine claims (SURVEY.md §2 inventory + the
training-data-pipeline extensions) registers here as a named pair:

  * ``fn(spark, sf_dir) -> DataFrame``  — the Spark implementation
  * ``oracle``                          — equivalent DuckDB SQL (or None for
    genuinely non-SQL-expressible ops, which the driver checks rows-only)

``__spark_entry__.py`` exposes the registry to the driver.  Column names and
types are aligned pairwise — the driver's compare hashes values after
sorting columns by name.

Cross-engine determinism rules used throughout (see functions/hashing.py):
integer/string outputs wherever possible; money aggregates computed in
DECIMAL then rounded and cast to DOUBLE; nanosecond timestamps carried as
int64; float similarity scores rounded to 6 dp with identical fold order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        # a silent override would replace an ever-green query's fn/oracle
        # with a new one under the driver's feet (nearly happened in r12:
        # a_shared_sql_grouping_sets already existed in analytics.py)
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def with_ctes(*ctes: str, select: str) -> str:
    """Assemble ``WITH a AS (...), b AS (...) SELECT ...`` oracle SQL."""
    return "WITH " + ",\n".join(ctes) + "\n" + select


#: Names with a green row in CORRECTNESS_r01 ∪ … ∪ r07 (static history of
#: the driver's correctness runs; oracle-less queries count as green on a
#: clean rows-only row).  The driver verifies only a prefix (~50) of the
#: registry each round, so ``all_queries`` orders every name WITHOUT a
#: green row ahead of this set, then the round's new queries, then this
#: remainder as ballast.  After round 10 (50/50 green, tenth consecutive)
#: every registered name has a green driver row — after round 12 (50/50
#: green, twelfth consecutive) cumulative 502/502 — so the round-13
#: window is entirely spare; round-13 additions go straight into
#: ``_NEW_THIS_ROUND`` until it fills (50 names).
_EVER_GREEN = frozenset({
    # --- green in CORRECTNESS_r12 (folded in at the round-13 rotation) ---
    'p_semantic_dedup_bucketed_auto', 'p_semantic_dedup_auto_tau40',
    'p_semantic_dedup_bucketed_tau40', 'p_semdedup_bucketed_auto_agreement',
    'p_semantic_dedup_incremental', 'p_semdedup_batch_invariance',
    'p_ivf_trained_multiprobe', 'p_trained_nprobe_recall_curve',
    'r_compaction_steady_state', 'p_semantic_dedup_bucketed_trained',
    'p_planes_budget_sweep', 'p_semantic_dedup_incremental_bucketed',
    'r_steady_state_live_files', 'p_semdedup_trained_bucketed_agreement',
    'a_grubbs_price',
    # --- green in CORRECTNESS_r11 (folded in at the round-12 rotation) ---
    'p_ivf_pq_rerank_trained', 'p_substring_fixpoint',
    'p_e2e_fixpoint_cascade', 'p_ivfpq_filter_aware',
    'r_amplification_pareto', 'p_stitch_width_invariance',
    'p_bpe_roundtrip', 'p_ivfpq_trained_recall', 'r_t15_drain_model',
    'p_semantic_dedup_trained', 'p_trained_cell_balance',
    'a_benford_price', 'r_session_bursts', 'p_cut_window_sensitivity',
    'p_trained_inertia_descent', 'r_msg_size_histogram', 'p_rrf_k_sweep',
    'a_hurst_rs', 'p_lsh_bands_ladder', 'p_cascade_order_sensitivity',
    'p_semantic_dedup_bucketed', 'p_semdedup_bucketed_agreement',
    # --- green in CORRECTNESS_r10 (folded in at the round-11 rotation) ---
    'p_substring_dedup', 'p_e2e_substring_pack', 'p_bpe_fertility',
    'p_quality_calibration_drift', 'r_read_amplification',
    'r_retention_deletion_plan', 'r_sqs_redrive_model', 'p_ivf_pq_rerank',
    'p_dup_pair_bleu', 'p_degree_assortativity', 'p_anisotropy_profile',
    'p_split_centroid_shift', 'r_e2e_latency_budget',
    'p_substring_position_profile', 'a_pettitt_changepoint',
    'a_shared_sql_unpivot', 'p_reweight_agreement', 'p_dup_detector_matrix',
    'p_e2e_dedup_cascade', 'p_bpe_merge_curve', 'p_knn_hubness',
    'p_substring_quality_shift', 'p_source_separability',
    'p_conformal_quality_bound', 'p_cut_idempotence',
    'p_quality_threshold_sweep', 'a_littles_law_identity',
    'r_redrive_policy_sweep', 'p_pack_budget_sweep', 'p_knn_reciprocity',
    'r_x3_variant_parse', 'p_posting_gap_profile', 'p_rbo_retrieval',
    'a_page_trend_dow', 'p_ivfpq_recall', 'p_dedup_centroid_shift',
    'p_ivfpq_shortlist_curve', 'a_shared_sql_group_by_all',
    'p_ivfpq_label_filtered', 'a_shared_sql_lateral_alias',
    'p_substring_convergence', 'p_split_zipf_drift', 'p_split_oov_rate',
    'p_source_token_entropy',
    # --- green in CORRECTNESS_r09 (folded in at the round-10 rotation) ---
    'p_e2e_curation_funnel', 'p_e2e_pack_manifest',
    'p_e2e_mix_dedup_interaction', 'p_semantic_dedup_2level',
    'p_e2e_split_leakage', 'a_mix_budget_sensitivity',
    'p_bloom_register_table', 'r_compaction_past_checkpoint',
    'p_semantic_dedup_auto', 'r_hourly_volume', 'r_compaction_convergence',
    'p_e2e_mix_pack', 'p_e2e_heldout_perplexity', 'p_minhash_mergeability',
    'p_band_agreement_histogram', 'p_hamming_jaccard_corr',
    'p_cosine_dot_agreement', 'p_bfs_reachability', 'a_theil_index_brand',
    'a_jarque_bera_price', 'a_price_elasticity_brand',
    'a_cohen_kappa_priority', 'a_interarrival_cv_segment',
    'a_backlog_age_quartiles', 'p_split_token_js', 'p_split_label_chi2',
    'p_pack_attention_audit', 'p_quality_gate_kappa',
    'a_markov_entropy_rate', 'p_pii_by_source', 'p_intrinsic_dim_2nn',
    'r_tombstone_rate', 'a_tenure_survival', 'r_volume_trend_ols',
    'a_shared_sql_values', 'r_key_zipf_slope', 'p_hnsw_level_model',
    'p_e2e_chunk_dedup', 'r_checkpoint_interval_sweep', 'a_discount_by_qty',
    # --- green in CORRECTNESS_r08 (folded in at the round-9 rotation) ---
    'r_s4_event_parse', 'r_t5_first_delay', 'a_mann_kendall_daily',
    'a_gini_brand_revenue', 'a_pacf_lag2_daily', 'a_dema_revenue',
    'a_odds_ratio_weekend', 'a_peak_open_orders', 'p_jm_smoothing',
    'p_borda_fusion', 'p_winnowing_density', 'p_lsh_pair_transitivity',
    'p_rare_token_share', 'r_t14_cron_grid', 'p_pq_recall_at_k',
    'p_pca_residual_var', 'p_chars_per_token', 'a_kruskal_wallis_dow',
    'a_winsorized_mean_price', 'p_kmeans_elbow', 'p_dedup_token_savings',
    'p_lsh_bucket_entropy', 'p_shingle_reuse', 'p_df_histogram',
    'a_brand_basket_lift', 'r_partition_volume_profile', 'r_segment_cadence',
    'p_source_vocab_jaccard', 'a_repeat_revenue_share', 'a_value_cv_by_priority',
    'r_path_sort_equivalence', 'p_retrieval_rank_agreement',
    'p_ann_tier_agreement', 'a_month_end_effect', 'p_ann_map',
    'a_bowley_brand_skew', 'a_dow_seasonality_strength', 'p_uncertainty_sample',
    'p_best_stump_split', 'a_partial_corr_qty_price', 'r_checkpoint_staleness',
    'r_write_amplification', 'r_x5_checkpoint_codec', 'r_t13_overlap_tolerance',
    'a_mode_price_brand', 'a_abc_classes', 'a_changepoint_sse',
    'a_top_brand_stability', 'p_knn_label_eval', 'r_t6_lost_ranges',
    # --- green in CORRECTNESS_r07 (folded in at the round-8 rotation) ---
    'a_kendall_tau_brand', 'p_rule_matrix', 'p_embedding_norm_profile',
    'p_pr_curve', 'a_shared_sql_filter_clause', 'p_kcore_peel',
    'p_query_likelihood', 'p_jl_distortion', 'p_chunk_overlap_audit',
    'p_hard_negatives', 'a_trimmed_mean_price', 'p_mmr_diversify',
    'p_quota_sample', 'p_hamming_histogram', 'p_ivf_cost_audit',
    'a_event_dispersion', 'p_char_class_profile', 'a_rfm_migration',
    'a_lorenz_octiles', 'p_submodular_coverage', 'p_bloom_fpr_audit',
    'p_dedup_quality_shift', 'a_session_gap_sensitivity',
    'r_merge_fanin_histogram', 'r_segment_size_cv', 'p_minhash_k_sensitivity',
    'a_runs_test_daily', 'p_silhouette_proxy', 'p_text_embedding_corr',
    'p_label_source_contingency', 'p_ivf_probe_recall_curve',
    'a_max_drawdown', 'r_x2_metadata_codec', 'r_x7_backoff_schedule',
    'r_rebalance_rendezvous', 'p_simhash_bit_balance', 'p_scalar_quant_error',
    'a_laspeyres_price_index', 'r_ts_monotonicity', 'a_mann_whitney_weekend',
    'r_key_cardinality_profile', 'r_f3_superseded_pop', 'r_f5_age_gate',
    'r_x4_url_roundtrip', 'p_ann_ndcg', 'p_label_source_mi',
    'p_label_propagation', 'a_cramers_v', 'a_priority_mix_drift',
    'r_o4_subscribe_order',
    # --- green in CORRECTNESS_r06 (folded in at the round-7 rotation) ---
    'p_auc_quality', 'p_ece_calibration', 'p_categorical_drift_chi2',
    'p_dup_rate_wilson', 'a_shared_sql_lateral', 'a_activity_streaks',
    'a_theil_sen_trend', 'a_pareto_top_quartile', 'a_event_trigrams',
    'p_dup_span_extents', 'p_cluster_purity', 'p_textrank_keywords',
    'p_doremi_weights', 'p_stratified_kfold', 'p_rrf_fusion',
    'p_pack_efficiency', 'p_truncation_loss', 'p_detector_agreement',
    'p_cosine_decile_histogram', 'p_pq_distortion', 'a_shared_sql_exists',
    'a_session_entry_exit', 'a_iqr_outliers', 'p_ivf_balance', 'p_dsir_ess',
    'p_sorted_neighborhood', 'p_source_token_js', 'a_promo_diff_in_diff',
    'a_shared_sql_setops', 'p_vocab_coverage', 'p_hash_collision_audit',
    'a_seasonal_naive_backtest', 'a_churn_hazard', 'p_hill_tail_index',
    'p_semantic_dedup_sweep', 'a_shared_sql_named_windows',
    'a_nation_share_drift', 'a_weekend_effect_ttest', 'p_shard_balance',
    'p_quality_length_bias', 'p_media_dedup', 'a_hhi_concentration',
    'a_yoy_growth', 'a_basket_size_histogram', 'a_shared_sql_rollup',
    'p_snm_multipass', 'p_centroid_drift', 'p_lsh_grid_expected_capture',
    'a_ewma_revenue', 'a_spearman_daily',
    # --- green in CORRECTNESS_r05 (folded in at the round-6 rotation) ---
    'a_benford_totalprice', 'a_autocorr_daily', 'a_cusum_changepoint',
    'a_event_type_lift', 'a_user_lifespan', 'a_stickiness', 'a_anomaly_mad',
    'a_attribution_last_touch', 'p_triangle_census', 'p_degree_histogram',
    'p_link_prediction', 'p_kneser_ney', 'p_term_burstiness',
    'p_token_fertility', 'p_rake_keywords', 'p_embedding_covariance',
    'p_dim_truncation_recall', 'p_ngram_coverage', 'p_poisson_bootstrap',
    'a_inactivity_gaps', 'a_brand_affinity', 'a_supplier_part_overlap',
    'p_pca_power', 'p_oov_rate', 'a_ab_assignment', 'p_simhash_eval',
    'p_centroid_outliers', 'p_per_source_sample', 'p_histogram_quantiles',
    'p_bm25_scores', 'a_revenue_trend_ols', 'p_ann_recall',
    'a_growth_accounting', 'a_top_event_paths', 'p_source_lang_entropy',
    'p_props_profile', 'a_cohort_ltv', 'a_shipping_lag', 'a_interval_merge',
    'a_weighted_median_price', 'p_length_drift', 'a_returns_rate_by_brand',
    'p_jaccard_decile_histogram', 'p_source_gini', 'p_hapax_share',
    'a_repeat_purchase', 'p_lsh_capture_curve', 'p_ann_mrr',
    'a_value_by_hour_anova', 'a_shared_sql_recursive_spine',
    # --- green in CORRECTNESS_r04 (folded in at the round-5 rotation) ---
    'p_bigram_logprob', 'p_quality_classifier', 'p_temperature_mix',
    'p_readability', 'p_vocab_growth', 'p_zipf_slope', 'p_perplexity_profile',
    'p_lang_confusion', 'a_markov_transitions', 'a_decayed_value',
    'a_value_histogram', 'a_skyline_parts', 'p_knn_graph', 'p_embedding_stats',
    'p_minhash_containment', 'p_epoch_plan', 'p_cross_source_overlap',
    'p_dedup_best_quality', 'p_length_quantiles', 'p_graph_pagerank',
    'a_rolling_user_activity', 'a_revenue_momentum', 'p_ann_label_precision',
    'a_anomaly_zscore', 'a_user_rfm', 'p_stopword_profile', 'p_winnowing',
    'a_nation_trade_balance', 'p_uniform_sample', 'p_cond_entropy',
    'a_time_seasonality', 'p_coreset_select', 'p_span_corruption',
    'p_dedup_funnel', 'p_charngram_langid', 'p_tfidf_topterm_pairs',
    'p_dataset_split', 'p_shard_plan', 'p_doc_dup_category',
    'p_token_len_histogram', 'p_hash_balance_audit', 'p_edit_distance_pairs',
    'a_weekly_active_users', 'a_user_concentration', 'a_conversion_lag',
    'p_crosslingual_dups', 'p_dup_cluster_sizes', 'p_column_profile',
    'p_fk_integrity', 'p_uniqueness_audit',
    # --- green in r01 ∪ r02 ∪ r03 ---
    'a_asof_join', 'a_bloom_semi_join', 'a_correlation', 'a_dedup_first_event',
    'a_distinct_aggregates', 'a_funnel_steps', 'a_interval_join',
    'a_pivot_event_counts', 'a_q10_returned_items', 'a_q11_important_stock',
    'a_q12_ship_priority_classes', 'a_q13_order_count_histogram',
    'a_q14_promo_revenue', 'a_q15_top_supplier', 'a_q16_part_supplier_variety',
    'a_q17_small_qty_revenue', 'a_q18_large_volume_customers',
    'a_q19_bracket_scan', 'a_q1_pricing_summary', 'a_q20_excess_supply',
    'a_q21_waiting_suppliers', 'a_q22_idle_balances', 'a_q2_min_cost_supplier',
    'a_q3_top_revenue_orders', 'a_q4_priority_lateness', 'a_q5_region_revenue',
    'a_q6_forecast_revenue', 'a_q7_bination_volume', 'a_q8_market_share',
    'a_q9_product_profit', 'a_quantiles', 'a_range_join', 'a_retention_cohorts',
    'a_rolling_revenue', 'a_rollup_orders', 'a_running_revenue', 'a_salted_agg',
    'a_salted_join', 'a_scalar_functions', 'a_semi_anti_customers',
    'a_session_window_builtin', 'a_sessionization', 'a_set_ops',
    'a_shared_sql_cube', 'a_shared_sql_grouping_sets', 'a_shared_sql_revenue',
    'a_shared_sql_scalar_subquery', 'a_stats_aggregates', 'a_topk_per_group',
    'a_window_functions', 'p_ann_topk', 'p_boiler_ngrams', 'p_bpe_merges',
    'p_chunk_documents', 'p_cleaning_pipeline', 'p_cms_heavy_hitters',
    'p_contamination', 'p_cooccur_pmi', 'p_corpus_mix', 'p_cosine_topk',
    'p_curate_batch', 'p_curriculum_buckets', 'p_dedup_exact',
    'p_dedup_jaccard', 'p_dedup_rate_by_source', 'p_doc_entropy',
    'p_doc_repetition', 'p_dsir_weights', 'p_dup_clusters', 'p_dup_spans',
    'p_embedding_neardup', 'p_fingerprint', 'p_hll_distinct', 'p_hll_union',
    'p_incremental_dedup', 'p_inverted_index', 'p_ivf_multiprobe', 'p_ivf_topk',
    'p_ivf_topk_trained', 'p_kmeans_centroids', 'p_kmv_overlap', 'p_lang_id',
    'p_lsh_buckets', 'p_lsh_candidate_pairs', 'p_media_embed_topk',
    'p_media_frames', 'p_media_meta', 'p_minhash_estimate_audit',
    'p_minhash_signatures', 'p_ngram_novelty', 'p_oph_jaccard',
    'p_pack_sequences', 'p_pii_scrub', 'p_pps_sample', 'p_pq_topk',
    'p_prefix_dedup', 'p_quality_rules', 'p_quantized_topk', 'p_semantic_dedup',
    'p_simhash', 'p_simhash_near_pairs', 'p_stratified_sample',
    'p_text_quality', 'p_text_stats', 'p_tfidf_top_terms', 'p_token_counts',
    'p_top_ngrams', 'p_udtf_tokenize', 'p_unigram_logprob',
    'p_versioned_history', 'r_a3_min_ts_per_batch', 'r_a4_level_extent',
    'r_a6_checkpoint_lww', 'r_a7_last_event', 'r_a8_bounded_take',
    'r_f1_resume_trim', 'r_f2_prune_segments', 'r_f6_sanity_offsets',
    'r_f7_foreign_region', 'r_j1_consistent_listing', 'r_m1_gap_check',
    'r_m1_merge_dedup', 'r_p1_project_messages', 'r_s5_compacted_state',
    'r_t10_event_expiry', 'r_t16_windowed_counts', 'r_t1_segment_plan',
    'r_t9_resume_replay', 'r_x1_path_codec', 'r_x3_json_extract',
    'r_x8_metric_names',
})

#: Queries in THIS round's (round 13) driver window behind any never-green
#: backlog.  CORRECTNESS_r12 was 50/50 green, so the round-12 window's 15
#: names folded into ``_EVER_GREEN`` (cumulative 502/502 driver-verified)
#: and the round-13 window is ENTIRELY spare — round-13 additions go
#: straight HERE until the window fills (50 names), then overflow into
#: ``_STAGED_NEXT_ROUND``.
_NEW_THIS_ROUND: list[str] = [
    "p_model_retrain_decision",
    "r_dedup_state_compacted",
    "r_t1_age_ladder",
    "p_trained_ppv_sweep",
    "p_retrain_reassignment_delta",
    "a_mcnemar_urgent",
    "a_kendalls_w_nation",
    "r_age_chain_compaction",
    "p_stale_model_recall",
    "p_ingest_touched_cells",
    "a_shared_sql_distinct_from",
    "p_ingest_touched_groups_bucketed",
    "a_shared_sql_order_by_all",
]


#: Queries registered mid-round AFTER the window filled (none pending —
#: round-12 closed with 35 spare window slots; keep list order at the next
#: rotation).
_STAGED_NEXT_ROUND: list[str] = []


def all_queries() -> dict[str, Query]:
    # import for side effects (registration) — kept lazy so a syntax error in
    # one family doesn't take down the whole registry at import time.
    from kafka_replicator_spark.queries import replicator, curation, analytics_ext, analytics_tpch, pipeline_ext, pipeline_r4, pipeline_r5, pipeline_r6, pipeline_prof, analytics_behavior, analytics, pipeline, quality_audit, analytics_ts, graph_analytics, lexical, embeddings_ext, staged_ext, retrieval_ext, eval_metrics, analytics_sql_ext, curation_ext, pipeline_audits, pipeline_r7, analytics_r7, pipeline_r8, compose, pipeline_r9, analytics_r9, pipeline_r10, analytics_r10, pipeline_r11, analytics_r11, pipeline_r12, pipeline_r13, analytics_r13  # noqa: F401

    names = list(REGISTRY)
    new = [n for n in _NEW_THIS_ROUND + _STAGED_NEXT_ROUND if n in REGISTRY]
    # Priority for the driver's prefix-of-50 window, most-starved first:
    # 1. never-green backlog, r_* first (the engine's center of gravity),
    #    then registration order
    # 2. this round's additions (then the staged overflow)
    # 3. the ever-green remainder (r_* first so an over-50 prefix re-checks
    #    the replicator lifecycle before analytics ballast)
    backlog = [n for n in names if n not in _EVER_GREEN and n not in new]
    backlog.sort(key=lambda n: not n.startswith("r_"))
    green = [n for n in names if n in _EVER_GREEN and n not in new]
    green.sort(key=lambda n: not n.startswith("r_"))
    ordered = backlog + new + green
    return {n: REGISTRY[n] for n in ordered}
