"""Plan-quality audit: for each headline query, inspect the executed plan for
the properties that matter at 100 TB and write PLAN_AUDIT.md.

Checks per query:
- join strategy mix (broadcast / sort-merge / shuffled-hash counts)
- scan pruning: every parquet scan's ReadSchema column count
- pushed filters present when the query filters scanned columns
- Python boundary: flags row-at-a-time PythonUDF in the plan (ArrowEvalPython
  from pandas UDFs is the accepted path)

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "is_a_scan", "edge_join_2hop", "edge_weighted_filter",
    "parts_per_customer", "findall_orders", "view_reduce_groups",
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "dedup_exact", "dedup_minhash_lsh", "ann_bruteforce_topk",
    "pattern_dsl_query", "training_pipeline", "events_hourly_window",
    "q6_forecast_revenue", "q18_large_orders",
    "select_first", "events_sessions", "integrity_report",
    "events_asof_join", "events_interval_join", "events_rollup_daily",
    "q2_min_cost_supplier", "q4_order_priority_exists",
    "q13_customer_distribution", "q16_supplier_cnt", "q20_nested_semijoin",
    "topk_per_group", "grouping_sets_revenue", "events_moving_avg",
    "events_json_props", "sketch_approx_distinct", "ann_lsh_recall",
    "q7_nation_volume", "q10_returned_items", "q11_important_stock",
    "q12_priority_shipping", "q14_promo_revenue", "q15_top_supplier",
    "q19_discounted_revenue", "q21_waiting_supplier", "dedup_survivors",
    "q22_global_sales_opportunity", "view_mixed_key_order",
    "graph_pagerank", "dedup_embedding", "geo_polygon_intersects",
    "sketch_quantiles", "replication_subset", "dedup_embedding_recall",
    "text_repetition", "text_chunks", "text_bm25_topk",
    "text_unigram_logprob", "dedup_contamination", "training_mix",
    "corpus_curation", "q8_market_share", "q9_product_profit",
    "q17_small_quantity", "ann_ivf_recall", "multimodal_decode",
    "retrieval_hybrid_rrf", "text_pii_redaction", "text_collocations_pmi",
    "pack_sequences", "incoming_edges_goal",
    "text_classifier", "vocab_coverage", "embedding_outliers",
    "graph_hits", "profile_lineitem", "histogram_price", "zorder_key",
    "dedup_incremental", "distinctive_terms", "events_funnel",
    "events_retention", "graph_link_prediction", "source_drift",
    "text_bigram_logprob", "quality_gate", "multimodal_audio",
    "multimodal_video", "span_corruption", "decontaminated_split",
    "graph_neighbor_features", "table_diff", "sql_interface",
    "graph_negative_samples", "events_anomalies", "salted_revenue",
    "two_phase_distinct", "customer_rfm", "entity_fuzzy_pairs",
    "export_shards", "events_wow_change",
    # round-4 additions
    "curation_ingest", "graph_pagerank_personalized", "text_boilerplate",
    "dedup_containment", "stratified_sample", "embedding_quantize",
    "retrieval_rerank", "token_budget_mix", "cms_heavy_hitters",
    "retrieval_mmr", "curation_v2", "graph_walk_census", "sft_pairs",
    "events_recency_score", "source_ks_drift", "graph_pagerank_weighted",
    # round-5 additions
    "duplicate_ngram_spans", "bpe_pair_stats", "quality_adaptive_gate",
    "graph_closeness_landmarks", "embedding_pq", "bucketed_join_colocated",
    "text_keywords", "events_changepoint", "events_gap_fill", "cohort_ltv",
    "basket_pair_rules", "k_anonymity_audit", "events_seasonality",
    "text_sparse_dot_pairs", "multimodal_phash_dedup",
    "ann_truncation_recall", "order_lag_features", "graph_modularity",
    "classifier_calibration",
    # round-5 late batch
    "graph_clustering_coefficient", "compaction_plan",
    "events_autocorrelation", "events_smoothing", "events_attribution",
    "l_diversity_audit", "retrieval_ndcg", "scd2_history",
    "graph_assortativity", "zonemap_skip_stats", "graph_ktruss",
    "winsorize_orders", "events_forecast", "item_cf_similarity",
    "vocab_growth", "dedup_cluster_sizes",
    # round-6 additions
    "classifier_auc", "classifier_kappa", "source_psi_drift",
    "t_closeness_audit", "equi_depth_hist_price", "order_backlog_depth",
    "orders_pivot_status", "events_trailing_window", "bloom_filter_audit",
    "encoding_stats", "knn_label_propagation", "vocab_zipf_slope",
    "events_mad_outliers", "events_attribution_linear", "metrics_unpivot",
    "rollup_revenue", "session_paths", "embedding_centroid_drift",
    "embedding_dim_stats", "key_skew_profile", "fk_integrity_audit",
    "events_ohlc_hourly", "ann_ivfpq_recall", "bpe_learn_merges",
    "bloom_dedup_ingest", "curriculum_order", "classifier_train_logreg",
    "bpe_compression", "dataset_card", "join_cardinality_audit",
    "ann_recall_curve", "graph_knn_degree", "customer_order_gaps",
    "chi2_independence", "benford_audit", "theilsen_trend",
    "events_rolling_distinct", "text_readability", "tokenizer_fertility",
    "dpo_preference_pairs", "shard_interleave_audit", "graph_eccentricity",
    "embedding_pair_cosine", "multimodal_dims", "text_truncation_curve",
    "dedup_sampling_weights", "mvcc_revision_diff", "boxplot_chars",
    "join_view_incremental", "survival_km", "anova_quantity_returnflag",
    "mann_whitney_quantity", "weighted_sample_tickets", "kendall_tau",
    "kruskal_quantity", "spearman_rho", "source_jsd", "dedup_cross_source",
    "result_cache_hit", "doremi_mix_weights", "embedding_covariance",
    "graph_cc_incremental", "delete_cascade_audit", "customer_spend_deciles",
    "orders_global_rank", "ab_experiment", "allen_census",
    "quantile_normalize_lengths", "wilcoxon_order_growth", "ipf_raking",
    "mantel_haenszel_or", "cronbach_alpha_events",
    "matview_rollup_answer",
    # round-6 (session 6) additions
    "stateful_running_totals", "stateful_anomalies", "geo_goal_rings",
    "dq_expectation_audit", "cv_fold_assignment", "neyman_allocation",
    "bootstrap_ci_mean", "feature_woe_iv", "target_encoding_loo",
    "decision_stump_split", "embedding_isotropy",
    "graph_rich_club", "ab_cuped_report", "replica_checksum_manifest",
    "split_leakage_audit", "skyline_parts", "conformal_coverage",
    # round-7 additions
    "wal_txn_log_roundtrip", "once_goal_first_order",
    "ngram_novelty", "mix_ess_design_effect", "fdr_bh_segments",
    "krippendorff_labelers", "mvcc_compact_roundtrip",
    "mvcc_snapshot_replay", "not_in_list_goal", "unify_eq_goal",
    "call_functor_goal", "retrieval_rbo",
    # round-7 batch-5
    "temperature_mix_weights", "epoch_schedule_budget",
    "dedup_minhash_est_error", "lsh_band_tuning",
    "graph_stress_landmarks", "events_transition_entropy",
    "hll_estimate_audit", "events_twap", "text_kn_logprob",
    "viterbi_segmentation", "retrieval_ql_dirichlet",
    "negative_sampling_dist", "events_shapley_attribution",
    "v_optimal_histogram", "knn_shapley_values",
    "facility_location_select", "fellegi_sunter_weights",
    # session-3 batch-6
    "dedup_edit_distance", "isotonic_calibration", "graph_scc",
    "graph_bowtie", "rouge_l_pairs", "graph_triad_census",
    "graph_dyad_census", "events_markov_steady",
    "dedup_edit_clusters", "text_word_burstiness",
    # round-8 additions
    "geo_grid_dbscan", "bleu_pairs", "classifier_mcnemar",
    "revenue_inequality", "dsir_select", "ccnet_buckets",
    "ann_binary_hamming", "mink_prob_audit", "temporal_reach",
    "format_roundtrip_audit",
    # round-9 registrations
    "temporal_reach_converged", "classifier_cochran_q",
    "effect_size_quantity", "confident_label_audit",
    "good_turing_source", "lang_mix_audit", "curation_funnel",
    "embedding_top_eigen", "dedup_cluster_profile", "stateful_late_audit",
]


def audit(sf_dir: str) -> str:
    from vivace_graph_v3_spark import entry_queries as eq
    from vivace_graph_v3_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = eq.queries()
    lines = ["# PLAN_AUDIT — executed-plan properties per headline query",
             "", f"sf_dir: `{sf_dir}`", "",
             "| query | joins (bcast/smj/shj) | scans | read cols/scan | "
             "pushed filters | python |", "|---|---|---|---|---|---|"]
    from vivace_graph_v3_spark.plans import plan_facts

    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        df.collect()  # populate the *executed* (post-AQE) plan
        f = plan_facts(df)
        py_row = "row-UDF!" if f.row_udf else ("arrow" if f.arrow else "-")
        lines.append(
            f"| {name} | {f.broadcast_joins}/{f.sort_merge_joins}/"
            f"{f.shuffled_hash_joins} | {len(f.scans)} | "
            f"{','.join(map(str, f.scans)) or '-'} | "
            f"{f.pushed_filters} | {py_row} |")
    lines += ["", "Notes:",
              "- `row-UDF!` would mark a row-at-a-time Python UDF in the hot "
              "path — none expected; pandas/Arrow paths show `arrow`.",
              "- Read cols/scan shows column pruning reaching parquet "
              "(full TPC-H tables are 8-16 cols wide)."]
    return "\n".join(lines)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report = audit(sf)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write(report + "\n")
    print(report)
