"""In-pytest replica of the driver's correctness gate for a fast subset
of the SQL-checked queries: row count + schema + order-insensitive
value equality against DuckDB at sf0.001.

(The full gate over every query runs via scripts/check_correctness.py;
this keeps the core contract enforced by `python -m pytest -x -q`.)
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_SUBSET = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "topk_event_types",
    "events_hourly",
    "events_sliding_window",
    "sessionize_events",
    "median_value_by_event_type",
    "orders_priority_stats",
    "doc_token_stats",
    "explode_words",
    "views_before_purchase",
    "centroid_by_label",
    "dedup_rate_by_source",
    "user_overlap_view_purchase",
    "top10_words",
    "decontaminate_docs",
    "repetition_quality_docs",
    "scrub_docs",
    "stratified_sample_docs",
    "knn_cosine_top10",
    "minhash_dedup_planted",
    "events_lag_delta",
    "pivot_user_event_counts",
    "customer_order_stats",
    "rollup_event_hourly",
    "ntile_orders_by_price",
    "events_window_frame",
    "price_discount_corr",
    "top_customer_by_nation",
    "user_set_ops",
    "big_orders_having",
    "percent_rank_orders",
    "events_range_window",
    "user_event_path",
    "cube_event_dow",
    "unpivot_lineitem_measures",
    "hash_sample_orders",
    "customers_with_urgent_orders",
    "user_view_purchase_outer",
    "q17_small_quantity_revenue",
    "rank_orders_by_date",
    "events_first_last",
    "mode_event_type_by_user",
    "exact_percentile_price",
    "span_dedup_stats",
    "semdedup_embeddings",
    "token_budget_select",
    "domain_mix_select",
    "dsir_select_docs",
    "bpe_encode_docs",
    "badwords_filter_docs",
    "ccnet_perplexity_buckets",
    "tokenize_pack_docs",
    "max_repeat_run_docs",
    "decontaminate_fuzzy_docs",
    "histogram_order_price",
    "funnel_view_click_purchase",
    "kmeans_assign_embeddings",
    "kmeans_fixedpoint_embeddings",
    "join_size_view_purchase",
    "source_drift_tv",
    "moments_text_len",
    "moments_text_len_by_source",
    "events_orc_feather_roundtrip",
    "rollup_distinct_users_ranges",
    "rollup_value_moments_ranges",
    "q5_local_supplier_revenue",
    "order_count_distribution",
    "retention_cohorts",
    "cumulative_new_users",
    "max_concurrent_views",
    "gapfill_hourly_errors",
    "token_freq_score_docs",
    "sole_return_suppliers",
    "q22_idle_rich_customers",
    "top10_bigrams",
    "pagerank_word_graph",
    "paginate_orders",
    "purchases_near_errors",
    "embedding_sq_norms",
    "median_value_by_user",
    "event_type_transitions",
    "outlier_events_zscore",
    "bfs_word_graph",
    "gram_matrix_embeddings",
    "triangle_count_words",
    "time_weighted_avg_by_user",
    "jaccard_sources_vocab",
    "percentile_cont_price",
    "chi2_type_dow",
    "skyline_orders",
    "label_propagation_words",
    "dq_orders_violations",
    "daily_revenue_wow",
    "top_session_paths",
    "corr_value_hour_by_type",
    "bitagg_users_by_type",
    "equidepth_deciles_price",
    "q15_top_supplier",
    "q12_ship_delay_priority",
    "q10_returned_revenue_customers",
    "q19_disjunctive_revenue",
    "q4_late_orders_by_priority",
    "q7_nation_pair_volume",
    "q8_market_share_by_year",
    "q16_supplier_counts_by_brand",
    "q9_profit_by_nation_year",
    "q20_majority_suppliers",
    "f2_exact_user_events",
    "kcore3_peel_words",
    "novelty_score_docs",
    "acctbal_stats_by_nation",
    "longest_streak_by_user",
    "mad_value_by_event_type",
    "top_cosine_pairs",
    "weekend_distinct_users_by_type",
    "benford_order_prices",
    "ship_delay_quartiles",
    "gini_customer_spend",
    "rolling7_distinct_users",
    "embedding_dim_stats",
    "outlier_events_robust",
    "shortest_paths_word_graph",
    "user_set_overlap_3way",
    "profile_lineitem",
    "join_size_lineitem_orders",
    "grep_docs",
    "weighted_median_price",
    "top_char_bigrams",
    "vocab_growth_docs",
    "gap_histogram_events",
    "coverage_topk_words",
    "bpe_two_merges",
    "events_csv_roundtrip",
    "debounce_events",
    "split_assign_docs",
    "max_drawdown_revenue",
    "length_weighted_sample_docs",
    "second_order_per_customer",
    "top2_balances_by_nation_ties",
    "embedding_top2_dims",
    "distinct_users_rollup",
    "first_last_transition_matrix",
    "purchases_next_hour_views",
    "snapshot_diff_docs",
    "weighted_jaccard_pairs",
    "rollup_churn_users_ranges",
    "weighted_minhash_planted",
    "normalize_text_docs",
    "priority_sample_orders",
    "weekend_value_ztest",
    "ks_weekend_weekday",
    "upsert_orders_latest",
    "fk_containment",
    "spearman_price_qty",
    "bounce_rate_daily",
    "view_to_purchase_latency_quartiles",
    "nearest_error_to_purchase",
    "repeat_customer_revenue_share",
    "session_type_lift",
    "diversified_top_orders",
    "rolling30_rev_cnt_corr",
    "bootstrap_means_orders",
    "bought_together_parts",
    "weekly_churn",
    "consecutive_vcp_users",
    "customer_hhi",
    "order_size_histogram",
    "supplier_late_rates",
    "median_customer_aov",
    "types_seen_so_far",
    "id_gaps_events",
    "word_length_by_source",
    "trimmed_mean_price",
    "spiky_customers",
    "ttr_docs",
    "longest_same_type_run",
    "export_split_partitions",
    "vocab_edit_distance_pairs",
    "percentile_grid_price",
    "lineitem_corr_matrix",
    "fd_violations_lineitem",
    "order_cadence_by_customer",
    "top1pct_revenue_share",
    "weekly_autocorr_revenue",
    "events_dow_hour_heatmap",
    "cheapest_supplier_per_part",
    "promo_revenue_ratio",
    "important_parts",
    "dedup_docs_exact",
    "hll_distinct_nation",
    "hll_distinct_event_type",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].astype(str).itertuples(index=False, name=None)))


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as entry

    res = entry.queries()[name](SF_DIR)
    if not hasattr(res, "columns"):
        res = res.to_pandas()
    exp = duck.execute(entry.oracle_sql()[name]).fetchdf()
    assert len(res) == len(exp), f"{name}: rows {len(res)} != {len(exp)}"
    assert sorted(res.columns) == sorted(exp.columns)
    assert _norm(res) == _norm(exp), f"{name}: value mismatch"
