"""Scale probe beyond the provided TESTDATA: build a 10x key-shifted copy of
sf0.1 (~6M lineitem rows, the sf1 regime) in a temp dir and time headline
queries at sf0.1 vs 10x. This exercises the DATA-dominated regime the
driver's SFs can't reach locally — the per-op ratio shows which plans scale
with volume and which are still overhead-bound.

Key-shift keeps join semantics exact: every key column gets +copy*10^7, so
the 10x graph is 10 disjoint copies (counts scale exactly 10x for per-key
aggregates; global aggregates scale 10x in rows).

Run: python tools/scale10_probe.py [n_copies]   (writes under /tmp)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
UNKEYED = ["nation", "region", "embeddings"]

PROBES = ["q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
          "q13_customer_distribution", "q18_large_orders",
          "parts_per_customer", "events_latest_per_user", "events_moving_avg",
          "grouping_sets_revenue", "sketch_approx_distinct",
          "dedup_exact", "text_lang_id", "text_quality",
          # data-regime heavies: a 10x corpus where every doc has 10
          # exact copies (dup-group size 10 -> 45 verified pairs each),
          # and BFS whose hop joins scan 10x edges
          "dedup_minhash_lsh", "traverse_bfs",
          # iterative analytics: 10 pagerank rounds shuffle 10x messages
          "graph_pagerank",
          # round-3 ops: retrieval fans the inverted-index slice 10x (and
          # every doc is a 10-copy dup group), packing folds 10x groups,
          # redaction/collocations are scan-bound
          "retrieval_hybrid_rrf", "text_pii_redaction",
          "text_collocations_pmi", "pack_sequences",
          # late round-3 ops: zero-shuffle classifier and the profiler
          # are scan-bound; vocab/drift reduce to vocab/bucket-sized
          # frames; incremental dedup probes a 10x posting index with a
          # 10x batch; funnel/retention are user-bounded; HITS and
          # link-prediction shuffle 10x edges
          "text_classifier", "vocab_coverage", "profile_lineitem",
          "source_drift", "dedup_incremental", "events_funnel",
          "events_retention", "graph_hits", "graph_link_prediction",
          "zorder_key",
          # round-4 ops: boilerplate's span table grows with dup volume
          # (every chunk is a 10-copy group); containment's inverted index
          # fans 10x postings; census DP shuffles 10x edges twice;
          # quantize/sft/budget-mix are scan-bound; CMS is a fixed-cell
          # aggregate no matter the volume
          "text_boilerplate", "dedup_containment", "graph_walk_census",
          "embedding_quantize", "sft_pairs", "token_budget_mix",
          "cms_heavy_hitters", "stratified_sample",
          # round-5 batch-2 ops: gap-fill's window runs over the
          # days-x-groups grid (volume only feeds the daily aggregate);
          # cohort/basket/seasonality are aggregate+bounded-join; the
          # sparse-dot df hub cap is ABSOLUTE, so 10x copies push every
          # term over it (empty result — the cap doing its job on a
          # degenerate corpus; the tf/df aggregates still scan 10x); the
          # phash pair join is banded on hash values (10x images, same
          # 256 patterns -> bucket growth probes the LSH-join regime)
          "events_gap_fill", "cohort_ltv", "basket_pair_rules",
          "events_seasonality", "text_sparse_dot_pairs",
          "multimodal_phash_dedup", "k_anonymity_audit",
          # round-5 late batch: SCD2 windows are history-bounded per key
          # (10x keys, same frame sizes); attribution is one user window;
          # the zone-map estimator and compaction planner are
          # metadata-sized aggregates over 10x input rows; assortativity's
          # moments are two endpoint joins + a 1-row aggregate; the ACF /
          # smoothing series length is calendar-bounded (volume only
          # feeds the daily rollup); nDCG scans 10x corpus map-only.
          # (clustering_coefficient / k_truss are probed separately — the
          # 10x copurchase triangle join is minutes-long and its scaling
          # is already characterized by the graph heavies above.)
          "scd2_history", "events_attribution", "zonemap_skip_stats",
          "compaction_plan", "graph_assortativity",
          "events_autocorrelation", "events_smoothing", "retrieval_ndcg",
          "l_diversity_audit",
          # round-6 ops: AUC/kappa/PSI/t-closeness/equi-depth/MAD/skew
          # all reduce to value-grid or class-grid frames (volume only
          # feeds the first aggregate); the backlog sweep-line cumsum
          # runs over the distinct-day grid; bloom probes 2x keys against
          # a fixed 64Kbit set; encoding stats lag within 10x file
          # groups; OHLC/trailing-window shuffle 10x events once; linear
          # attribution is one user RANGE window; the FK audit is four
          # 10x anti-joins; pivot/rollup/unpivot are Expand aggregates
          "classifier_auc", "classifier_kappa", "source_psi_drift",
          "t_closeness_audit", "equi_depth_hist_price",
          "order_backlog_depth", "orders_pivot_status",
          "events_trailing_window", "bloom_filter_audit", "encoding_stats",
          "events_mad_outliers", "events_attribution_linear",
          "metrics_unpivot", "rollup_revenue", "session_paths",
          "key_skew_profile", "fk_integrity_audit", "events_ohlc_hourly",
          "ann_ivfpq_recall",
          # round-7 ops: the stats family (chi2/theilsen/anova/
          # mann-whitney/kendall/kruskal/spearman/boxplot/survival)
          # reduces the 10x table to value-grid frames in ONE partial
          # aggregate — only that first pass scans more; readability /
          # fertility / truncation / sampling-weights / dims are
          # map-only or map+1-agg; tickets explode 10x weights into a
          # two-phase top-k; jsd/doremi re-aggregate to
          # |sources| x |buckets| / |vocab| frames; cross-source joins
          # the (family, source) grid; covariance expands 36 terms/row
          # map-only; rolling-distinct windows the day grid; matview /
          # result-cache / revision-diff / join-view rebuild their
          # session stores at the 10x dir (ingest-time in deployments)
          "chi2_independence", "benford_audit", "theilsen_trend",
          "events_rolling_distinct", "text_readability",
          "tokenizer_fertility", "dpo_preference_pairs",
          "shard_interleave_audit", "graph_eccentricity",
          "embedding_pair_cosine", "multimodal_dims",
          "text_truncation_curve", "dedup_sampling_weights",
          "mvcc_revision_diff", "boxplot_chars", "matview_rollup_answer",
          "survival_km", "anova_quantity_returnflag",
          "mann_whitney_quantity", "weighted_sample_tickets",
          "join_view_incremental", "kendall_tau", "kruskal_quantity",
          "spearman_rho", "source_jsd", "dedup_cross_source",
          "result_cache_hit", "doremi_mix_weights",
          "embedding_covariance",
          # round-6 (session 6) ops: the stateful faces drain a real
          # 4-micro-batch stream over 10x events at the 10x dir
          # (ingest-time convention); geo rings are a map-only filter +
          # haversine; the DQ audit is one map-side-combined aggregate
          # per table + an FK anti-join; folds/Neyman reduce to
          # fold-x-lang / strata grids; the Poisson bootstrap fans the
          # scan x200 map-only into B-row aggregates; knn re-probed
          # after the Arrow seed-scan fix
          "stateful_running_totals", "stateful_anomalies",
          "stateful_sessions",
          "geo_goal_rings", "dq_expectation_audit", "cv_fold_assignment",
          "neyman_allocation", "bootstrap_ci_mean",
          "knn_label_propagation",
          # session-6 batch 3: rich-club is grid joins over the deduped
          # edge set; CUPED/checksums/leakage are single moment/hash
          # aggregates
          "graph_rich_club", "ab_cuped_report",
          "replica_checksum_manifest", "split_leakage_audit",
          # skyline = grid aggregate + frontier window over distinct
          # prices; conformal = grid-quantile + one coverage aggregate
          "skyline_parts", "conformal_coverage",
          # round-7 ops: the WAL round-trip commits 10x rows through
          # three log appends (write-path volume); once/cut is one
          # min-per-customer aggregate-shaped window over 10x orders;
          # novelty anti-joins the 10x shingle vocabulary; ESS/FDR/alpha
          # reduce to lang/cell/label grids in one aggregate each
          "wal_txn_log_roundtrip", "once_goal_first_order",
          "ngram_novelty", "mix_ess_design_effect", "fdr_bh_segments",
          "krippendorff_labelers",
          # compaction folds the 10x log into base copy-on-write;
          # snapshot/replay rewrite the 10x live set once each
          "mvcc_compact_roundtrip", "mvcc_snapshot_replay",
          # functor goals: one pruned scan + filter / one hash join
          "not_in_list_goal", "unify_eq_goal", "call_functor_goal",
          # RBO: tf grid aggregate + two depth-10 windows + grid join
          "retrieval_rbo",
          # batch-5: mix/epoch are one group-by + broadcast totals over
          # 10x docs; the MinHash audits fan k md5 mins per doc and ride
          # the inverted-index pair join (10x dup-group pairs); stress is
          # two frontier passes over 10x edges; entropy is a lag window
          # per user + |states|^2 cells
          "temperature_mix_weights", "epoch_schedule_budget",
          "dedup_minhash_est_error", "lsh_band_tuning",
          "graph_stress_landmarks", "events_transition_entropy",
          "hll_estimate_audit", "events_twap", "text_kn_logprob",
          "viterbi_segmentation", "retrieval_ql_dirichlet",
          "negative_sampling_dist", "stateful_rate_limit",
          "events_shapley_attribution", "v_optimal_histogram",
          "knn_shapley_values", "facility_location_select",
          "fellegi_sunter_weights",
          # session-3 batch-6: PassJoin blocking shuffles hashed segment
          # keys (output grows with dup-group size^2 on the degenerate
          # 10x corpus); isotonic reduces the corpus to the bin grid in
          # one aggregate, then runs B-row hull joins
          "dedup_edit_distance", "isotonic_calibration",
          # rouge: map-only token slices + one pairing window,
          # then a constant-bounded per-pair integer fold
          "rouge_l_pairs",
          # rotated out of the bench suite session-3 (stdout-tail
          # budget) — timed here instead
          "decontaminated_split", "events_recency_score",
          # triad/dyad ride the brand-grid co-occurrence aggregate;
          # markov reduces volume to the |states|^2 grid then iterates
          "graph_triad_census", "graph_dyad_census",
          "events_markov_steady",
          # clusters ride the pair-volume regime (the 10x corpus is
          # dup-degenerate); burstiness is two vocab-bounded aggregates
          "dedup_edit_clusters", "text_word_burstiness",
          # format audit: 3 distributed write+scan+agg passes
          "format_roundtrip_audit"]


def build(spark, out_dir: str, n_copies: int) -> None:
    from pyspark.sql import functions as F

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(n_copies):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in UNKEYED:
        spark.read.parquet(f"{SRC}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def run(spark, qs, sf_dir: str, only: list[str] | None = None) -> dict[str, float]:
    times = {}
    for name in (only or PROBES):
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {sf_dir.split('/')[-1]} {name}: {n} rows "
              f"in {times[name]}s", file=sys.stderr)
    return times


def main() -> int:
    from vivace_graph_v3_spark.session import get_spark
    from vivace_graph_v3_spark import entry_queries as eq

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:] or None   # optional op subset
    spark = get_spark("scale10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # events.ts is TIMESTAMP(NANOS); read it as long (same as entry_queries)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = eq.queries()

    tmp = tempfile.mkdtemp(prefix="vgv3_scale10_")
    try:
        t0 = time.time()
        build(spark, tmp, n_copies)
        print(f"# build {n_copies}x: {round(time.time() - t0, 1)}s",
              file=sys.stderr)
        base = run(spark, qs, SRC, only)
        big = run(spark, qs, tmp, only)
        ratio = {k: round(big[k] / base[k], 2) for k in base}
        print(json.dumps({"n_copies": n_copies, "base_s": base,
                          "big_s": big, "ratio": ratio}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
