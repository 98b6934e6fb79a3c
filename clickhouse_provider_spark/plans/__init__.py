"""Serving-layer query plans (SURVEY.md §2C) + analytic query surface.

Catalog ordering
----------------
The correctness driver samples the FIRST 50 entries of ``queries()`` in
insertion order, so the catalog is re-ordered after registration to put the
entries that most need a fresh official row at the front:

1. **Repaired this round** (``PRIORITY_REPAIRED``): round 10 rebuilds
   ``dedup_cluster_stats`` again (LSH pair self-join → per-bucket hub
   edges, oracle mirrored — VERDICT r9 "What's wrong" #1); it needs a
   fresh official green under the new plan+oracle.
2. **Never hash-green** (``PRIORITY_NEVER_GREEN``): entries that have never
   had an official ``hash_match: true`` row in any round (``no_oracle`` or
   out-of-window so far). Empty since round 5 — every existing entry has
   been green at least once; brand-new entries land here automatically
   (absent from ``LAST_GREEN_ROUND``); round 10 adds
   ``multimodal_decode_png_stats``, ``dedup_survivors_lsh``,
   ``hybrid_rrf_topk``, ``dedup_simhash_clusters``, and
   ``dedup_lsh_recall_eval`` this way.
3. Everything else, **oldest official green first** (``LAST_GREEN_ROUND``,
   frozen from CORRECTNESS_r0{1..9}.json; ties keep insertion order) — so
   long-unverified entries cycle back into the window before recently
   verified ones.

Any brand-new entry automatically lands in group 2 (front of the window);
already-green entries keep local coverage via ``tests/test_oracle_parity.py``.
"""

from clickhouse_provider_spark.plans.catalog import CATALOG, QuerySpec
from clickhouse_provider_spark.plans import catalog2, catalog3, catalog4, catalog5, catalog6, catalog7, catalog8, catalog9, catalog10, catalog11, catalog12, catalog13, catalog14, catalog15, catalog16, catalog17, catalog_stats, llm_catalog, llm_catalog2, llm_catalog3  # noqa: F401  (register entries)

#: Entries whose PLAN (and oracle) changed this round, so the prior green
#: no longer attests the current code; they lead the official window.
#: Round 14 is the first OPTIMIZATION round: every entry below executes a
#: physical plan that differs from its last official green — the
#: ivf_train_centroids NULL-seed filter (the four ANN entries), the
#: cogrouped semantic-dedup pair kernel, the driver-side CC union-find +
#: oriented/distinct-flag/explode edge builders (the six dedup_* CC
#: consumers + dedup_lsh_pairs' distinct=False band join), the bucketed
#: grouped midranks + moments-through-the-collapse (spearman), the
#: crossing-bucket weighted median, the single-aggregation q18/q21, the
#: one-pass covar/ngram/substring/histogram/bm25 restructures, the
#: spread_scan repartitions (knn, multimodal, boilerplate), and the
#: Arrow-kernel k-means (both clustering consumers). Values are
#: oracle-hash-identical at the gate SFs for every one of them
#: (tools/targeted_oracle.py ×3 SFs per change + full driver_sim 184/184
#: at HEAD — OPTIMIZATION_r14.md records each check), but the official
#: window must re-attest the changed plans.
PRIORITY_REPAIRED = (
    "semantic_dedup_prune",
    "similarity_filtered_ann_eval",
    "similarity_ivf_topk",
    "similarity_ivfpq_adc",
    "spearman_rank_corr",
    "quantile_exact_weighted",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "covar_corr_matrix",
    "ngram_string_distance",
    "substring_dup_ratio",
    "histogram_adaptive",
    "bm25_topk",
    "hybrid_rrf_topk",
    "semantic_cluster_kmeans",
    "cluster_balanced_selection",
    "dedup_cluster_stats",
    "dedup_simhash_clusters",
    "dedup_survivors",
    "dedup_survivors_lsh",
    "dedup_delta_labels",
    "dedup_lsh_verified",
    "dedup_lsh_pairs",
    "knn_label_accuracy",
    "multimodal_decode_png_stats",
    "multimodal_decode_pixel_stats",
    "boilerplate_ngrams",
)

#: Entries with no official ``hash_match: true`` in ANY round so far.
#: Empty after round 5 (everything else has been green at least once);
#: brand-new entries fall into this tier automatically by being absent
#: from LAST_GREEN_ROUND.
PRIORITY_NEVER_GREEN = ()

#: name -> round of most recent official hash-green (CORRECTNESS_r0{1..9}).
#: Frozen so the rotation is deterministic and file-independent; refresh
#: each round from the latest CORRECTNESS file.
LAST_GREEN_ROUND = {
    **{n: 4 for n in (
        "corpus_curation", "dedup_embedding_pairs", "dedup_exact",
        "dedup_lsh_pairs", "dedup_lsh_verified",
        "dedup_minhash_signatures", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_survivors", "embedding_norms",
        "price_qty_corr", "q11_important_parts",
        "q16_supplier_concentration", "q20_dominant_suppliers",
        "q22_global_sales_opportunity", "similarity_topk",
        "text_contamination", "text_fingerprint", "text_lang_id",
        "text_ngram_repetition", "text_quality",
        "text_tfidf_top_terms", "text_token_rarity",
        "text_token_stats", "value_percentiles",
    )},
    **{n: 5 for n in (
        "above_avg_orders", "anti_join_not_exists",
        "approx_distinct_users", "approx_value_quantiles",
        "argmax_latest_event", "asof_last_purchase",
        "bloom_runtime_semijoin", "daily_counts",
        "distinct_parts_per_flag", "except_nations",
        "having_big_brands", "hypertable_rollup_1h1d1w",
        "intersect_nations", "json_props_stats", "latest_watermark",
        "monthly_orders", "multimodal_frame_sample",
        "pii_scrub_props", "pivot_priority_status", "price_buckets",
        "q3_shipping_priority", "q5_regional_revenue",
        "range_frame_window", "range_join_1h_windows",
        "replacing_dedup", "retention_cohorts", "rollup_sales",
        "running_total", "sample_reservoir", "sample_stratified",
        "scd2_intervals", "semi_join_exists", "seq_match_timed",
        "seq_match_user_paths", "session_gaps", "similarity_ann_lsh",
        "similarity_ivf_topk", "similarity_pq_topk",
        "sliding_event_counts", "string_brand_stats", "time_range",
        "token_budget_selection", "top3_per_group",
        "tumbling_event_counts", "user_history", "user_sessions",
        "window_funnel", "window_funnel_exact",
    )},
    **{n: 6 for n in (
        "approx_topk_heavy_hitters", "array_lambda_ops",
        "bitwise_aggregates", "chain_continuity",
        "conditional_aggregates", "cross_join_dims", "cube_sales",
        "date_parts", "dict_get_enrich", "embedding_quantize_int8",
        "first_last_window", "gap_fill_interpolate",
        "group_array_caps", "grouping_sets_mixed",
        "in_subquery_nations", "late_shipment_buckets", "low_card_in",
        "multimodal_feature_stats", "needle_lookup", "null_handling",
        "ordered_string_agg", "per_group_counts", "point_lookup",
        "q10_returned_revenue", "q12_priority_lines",
        "q13_customer_distribution", "q14_promo_share",
        "q15_top_supplier", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q19_disjunctive",
        "q1_pricing_summary", "q21_waiting_suppliers",
        "q2_min_price_part", "q4_order_priority",
        "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
        "q9_product_profit", "quantile_state_merge_rollup",
        "range_page", "range_scan", "rank_dense_percent",
        "regex_classify", "seq_next_node", "sum_map_props",
        "theta_set_algebra", "uniq_state_merge_rollup",
        "window_funnel_strict_increase", "window_funnel_strict_order",
    )},
    # round 8 official window: all 50 rows green (CORRECTNESS_r08.json).
    # Later **-entries override the earlier tiers for the few names that
    # were re-attested (q11/q22 from r4, window_funnel_strict_order from
    # r6).
    **{n: 8 for n in (
        "anova_f", "association_measures", "bitmap_set_ops",
        "boilerplate_ngrams", "bounding_ratio",
        "cluster_balanced_selection", "covar_corr_matrix", "cramers_v",
        "date_time_functions", "dedup_cluster_stats",
        "delta_sum_increases", "entropy_rank_profile",
        "exp_time_decayed_avg", "geohash_encode", "group_array_sorted",
        "histogram_adaptive", "interval_length_sum", "ipv4_functions",
        "knn_label_accuracy", "ks_test_2samp", "lttb_downsample",
        "mann_whitney_u", "max_intersections", "min_max_map_props",
        "mixture_sampling_temperature", "moving_window_aggs",
        "neighbor_diffs", "ngram_string_distance",
        "q11_important_parts", "q22_global_sales_opportunity",
        "quality_logistic_score", "quantile_exact_weighted",
        "quantile_timing", "retention_aggregate",
        "semantic_cluster_kmeans", "seq_next_node_backward",
        "seq_next_node_last_match", "similarity_recall_eval",
        "simple_linear_regression", "skew_kurtosis",
        "skew_salted_topk_revenue", "sparkbar_render",
        "spearman_rank_corr", "string_search_multi",
        "topk_weighted", "ttest_student_welch", "uniq_up_to",
        "url_functions", "window_funnel_strict_dedup",
        "window_funnel_strict_order",
    )},
    # round 9 official window: all 50 rows green (CORRECTNESS_r09.json) —
    # folded in per the per-round refresh (VERDICT r9 task 2). Overrides
    # earlier tiers for the re-attested r4/r5/r6 names.
    **{n: 9 for n in (
        "anti_join_not_exists", "association_measures", "bm25_topk",
        "corpus_curation", "cramers_v", "daily_counts",
        "dedup_cluster_stats", "dedup_embedding_pairs", "dedup_exact",
        "dedup_lsh_pairs", "dedup_lsh_verified",
        "dedup_minhash_signatures", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_survivors", "distinct_parts_per_flag",
        "embedding_norms", "except_nations", "intersect_nations",
        "json_props_stats", "ks_test_2samp", "latest_watermark",
        "mann_whitney_u", "monthly_orders",
        "multimodal_decode_pixel_stats", "pivot_priority_status",
        "price_qty_corr", "q16_supplier_concentration",
        "q20_dominant_suppliers", "q3_shipping_priority",
        "q5_regional_revenue", "replacing_dedup", "rollup_sales",
        "running_total", "semi_join_exists", "session_gaps",
        "similarity_topk", "substring_dup_ratio", "text_contamination",
        "text_fingerprint", "text_lang_id", "text_ngram_repetition",
        "text_quality", "text_tfidf_top_terms", "text_token_rarity",
        "text_token_stats", "time_range", "top3_per_group",
        "user_history", "value_percentiles",
    )},
    # round 10 official window: all 50 rows green (CORRECTNESS_r10.json) —
    # folded in per the per-round refresh (VERDICT r10 task 2). Overrides
    # earlier tiers for the re-attested names; the five round-10-new
    # entries (dedup_survivors_lsh, dedup_simhash_clusters,
    # dedup_lsh_recall_eval, hybrid_rrf_topk, multimodal_decode_png_stats)
    # get their first entry here.
    **{n: 10 for n in (
        "above_avg_orders", "approx_distinct_users",
        "approx_value_quantiles", "argmax_latest_event",
        "asof_last_purchase", "bloom_runtime_semijoin",
        "chain_continuity", "cube_sales", "date_parts",
        "dedup_cluster_stats", "dedup_lsh_recall_eval",
        "dedup_simhash_clusters", "dedup_survivors_lsh",
        "first_last_window", "grouping_sets_mixed", "having_big_brands",
        "hybrid_rrf_topk", "hypertable_rollup_1h1d1w",
        "in_subquery_nations", "low_card_in",
        "multimodal_decode_png_stats", "multimodal_frame_sample",
        "needle_lookup", "ordered_string_agg", "per_group_counts",
        "pii_scrub_props", "point_lookup", "price_buckets",
        "q1_pricing_summary", "range_frame_window",
        "range_join_1h_windows", "range_page", "range_scan",
        "rank_dense_percent", "retention_cohorts", "sample_reservoir",
        "sample_stratified", "scd2_intervals", "seq_match_timed",
        "seq_match_user_paths", "similarity_ann_lsh",
        "similarity_ivf_topk", "similarity_pq_topk",
        "sliding_event_counts", "string_brand_stats",
        "token_budget_selection", "tumbling_event_counts",
        "user_sessions", "window_funnel", "window_funnel_exact",
    )},
    # round 11 official window: all 50 rows green (CORRECTNESS_r11.json) —
    # folded in per the per-round refresh (VERDICT r11 task 7). Overrides
    # earlier tiers for the re-attested names; the four round-11-new
    # entries (semantic_dedup_prune, sequence_packing_bins,
    # similarity_filtered_ann_eval, similarity_ivfpq_adc) and the
    # re-attested dedup_simhash_clusters get their row here.
    **{n: 11 for n in (
        "approx_topk_heavy_hitters", "array_lambda_ops",
        "bitwise_aggregates", "conditional_aggregates",
        "cross_join_dims", "dedup_simhash_clusters",
        "delta_sum_increases", "dict_get_enrich",
        "embedding_quantize_int8", "gap_fill_interpolate",
        "group_array_caps", "histogram_adaptive",
        "late_shipment_buckets", "lttb_downsample", "min_max_map_props",
        "multimodal_feature_stats", "null_handling",
        "q10_returned_revenue", "q11_important_parts",
        "q12_priority_lines", "q13_customer_distribution",
        "q14_promo_share", "q15_top_supplier",
        "q17_small_quantity_revenue", "q18_large_volume_customers",
        "q19_disjunctive", "q21_waiting_suppliers",
        "q22_global_sales_opportunity", "q2_min_price_part",
        "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
        "q8_market_share", "q9_product_profit",
        "quantile_state_merge_rollup", "regex_classify",
        "semantic_dedup_prune", "seq_next_node",
        "seq_next_node_backward", "seq_next_node_last_match",
        "sequence_packing_bins", "similarity_filtered_ann_eval",
        "similarity_ivfpq_adc", "sum_map_props", "theta_set_algebra",
        "topk_weighted", "uniq_state_merge_rollup",
        "window_funnel_strict_dedup", "window_funnel_strict_increase",
        "window_funnel_strict_order",
    )},
    # round 12 official window: all 50 rows green (CORRECTNESS_r12.json) —
    # folded in per the per-round refresh (VERDICT r12 task 3). Overrides
    # earlier tiers for the re-attested names (incl. the four
    # argmax-repaired entries); the round-12-new
    # window_funnel_strict_increase_scan gets its first row here.
    **{n: 12 for n in (
        "anova_f", "bitmap_set_ops", "boilerplate_ngrams",
        "bounding_ratio", "cluster_balanced_selection",
        "covar_corr_matrix", "daily_counts", "date_time_functions",
        "entropy_rank_profile", "exp_time_decayed_avg",
        "geohash_encode", "group_array_sorted", "interval_length_sum",
        "ipv4_functions", "knn_label_accuracy", "latest_watermark",
        "max_intersections", "mixture_sampling_temperature",
        "moving_window_aggs", "neighbor_diffs", "ngram_string_distance",
        "q3_shipping_priority", "q5_regional_revenue",
        "quality_logistic_score", "quantile_exact_weighted",
        "quantile_timing", "replacing_dedup", "retention_aggregate",
        "rollup_sales", "running_total", "semantic_cluster_kmeans",
        "semantic_dedup_prune", "session_gaps",
        "similarity_filtered_ann_eval", "similarity_ivf_topk",
        "similarity_ivfpq_adc", "similarity_recall_eval",
        "simple_linear_regression", "skew_kurtosis",
        "skew_salted_topk_revenue", "sparkbar_render",
        "spearman_rank_corr", "string_search_multi", "time_range",
        "top3_per_group", "ttest_student_welch", "uniq_up_to",
        "url_functions", "user_history",
        "window_funnel_strict_increase_scan",
    )},
    # round 13 official window: all 50 rows green (CORRECTNESS_r13.json)
    # — folded in per the per-round refresh (VERDICT r13 task 6).
    # Overrides earlier tiers for the re-attested names (incl. the four
    # argmax/salt-repaired entries, which round 14 re-seeds again for the
    # trainer's NULL-filter plan change — see PRIORITY_REPAIRED).
    **{n: 13 for n in (
        "anti_join_not_exists", "association_measures", "bm25_topk",
        "corpus_curation", "cramers_v", "dedup_embedding_pairs",
        "dedup_exact", "dedup_lsh_pairs", "dedup_lsh_verified",
        "dedup_minhash_signatures", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_survivors", "distinct_parts_per_flag",
        "embedding_norms", "except_nations", "having_big_brands",
        "intersect_nations", "json_props_stats", "ks_test_2samp",
        "low_card_in", "mann_whitney_u", "monthly_orders",
        "multimodal_decode_pixel_stats", "needle_lookup",
        "per_group_counts", "pivot_priority_status", "point_lookup",
        "price_qty_corr", "q16_supplier_concentration",
        "q1_pricing_summary", "q20_dominant_suppliers", "range_page",
        "range_scan", "semantic_dedup_prune", "semi_join_exists",
        "similarity_filtered_ann_eval", "similarity_ivf_topk",
        "similarity_ivfpq_adc", "similarity_topk",
        "substring_dup_ratio", "text_contamination",
        "text_fingerprint", "text_lang_id", "text_ngram_repetition",
        "text_quality", "text_tfidf_top_terms", "text_token_rarity",
        "text_token_stats", "value_percentiles",
    )},
}


def _rotate_for_official_window(catalog: dict) -> None:
    """Reorder ``catalog`` in place: repaired → never-green → oldest green
    first (stable within each tier)."""
    order = list(catalog)

    def tier(name: str) -> tuple:
        if name in PRIORITY_REPAIRED:
            return (0, PRIORITY_REPAIRED.index(name))
        # tier 1 = no official green yet: PRIORITY_NEVER_GREEN's members
        # are exactly the names absent from LAST_GREEN_ROUND (asserted
        # below), so absence alone decides — the tuple documents intent
        if name not in LAST_GREEN_ROUND:
            return (1, order.index(name))
        return (2, LAST_GREEN_ROUND[name], order.index(name))

    reordered = {n: catalog[n] for n in sorted(order, key=tier)}
    catalog.clear()
    catalog.update(reordered)


# stale-tuple guard: a name added to LAST_GREEN_ROUND must be removed from
# PRIORITY_NEVER_GREEN, or the rotation's tiers silently disagree
assert set(PRIORITY_NEVER_GREEN).isdisjoint(LAST_GREEN_ROUND)
assert set(PRIORITY_REPAIRED).isdisjoint(PRIORITY_NEVER_GREEN)

_rotate_for_official_window(CATALOG)

__all__ = [
    "CATALOG",
    "QuerySpec",
    "PRIORITY_REPAIRED",
    "PRIORITY_NEVER_GREEN",
    "LAST_GREEN_ROUND",
]
