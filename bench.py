"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The suite covers every subsystem: goal-list joins, aggregates, views,
traversal, spatial, events windows, text dedup (exact + MinHash-LSH +
simhash), ANN, and the TPC-H-shaped analytics — the workload shape of the
reference's perf suite (tests/perf/benchmarks.lisp) at TESTDATA scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# medians over N repetitions: single-run timings on a shared host showed
# 1.4x run-to-run suite spread and 2-2.5x per-op spread on iterative ops
# (SCALING.md repeatability study), which made cross-round comparisons
# noise adjudications. 3 reps ~ triples wall time but stabilizes the medians.
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# the headline subset (kept <= ~15 so a round's bench stays minutes, not hours)
BENCH_QUERIES = [
    "is_a_scan",
    "edge_join_2hop",
    "edge_weighted_filter",
    "parts_per_customer",
    "findall_orders",
    "view_reduce_groups",
    "traverse_bfs",
    "spatial_radius",
    "events_hourly_window",
    "events_latest_per_user",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q13_customer_distribution",
    "q2_min_cost_supplier",
    "grouping_sets_revenue",
    "events_moving_avg",
    "sketch_approx_distinct",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_survivors",
    "ann_bruteforce_topk",
    "pattern_dsl_query",
    "text_lang_id",
    "text_chunks",
    "multimodal_features",
    "view_mixed_key_order",
    "geo_polygon_metrics",
    "graph_pagerank",
    "retrieval_hybrid_rrf",
    "text_pii_redaction",
    "pack_sequences",
    "text_classifier",
    "vocab_coverage",
    "embedding_outliers",
    "graph_hits",
    "profile_lineitem",
    "zorder_key",
    "dedup_incremental",
    "events_funnel",
    "events_retention",
    "span_corruption",
    "multimodal_audio",
    # (customer_rfm / events_wow_change / events_dau_mau / revenue_pareto
    # rotated out in session 6 to fund the three additions below within
    # the driver's stdout-tail budget — all four remain timed in
    # SCALING.md's probe tables and stay oracle-checked in the registry)
    "entity_fuzzy_pairs",
    "text_boilerplate",
    "dedup_containment",
    "stratified_sample",
    "embedding_quantize",
    "retrieval_rerank",
    "token_budget_mix",
    "cms_heavy_hitters",
    "sft_pairs",
    "source_ks_drift",
    "events_gap_fill",
    "cohort_ltv",
    "multimodal_phash_dedup",
    # round-5 late batch representative (one op: the driver's stdout-tail
    # window caps the final JSON line, see test_bench_contract; the rest
    # of the batch is timed in SCALING.md's 10x probe table, and the
    # triangle heavies are characterized there too)
    "scd2_history",
    # round-6 representatives (short names chosen deliberately — the
    # stdout-tail budget again; the full round-6 batch is timed in the
    # 10x probe table)
    "classifier_auc",
    "encoding_stats",
    "order_backlog_depth",
    # session-6 representatives: the knn fix (16.3 -> ~2 s, Arrow seed
    # scan), the DQ gate, and the Poisson bootstrap (all short names —
    # stdout-tail budget; the rest of the batch is in the probe table)
    "knn_label_propagation",
    "dq_expectation_audit",
    "bootstrap_ci_mean",
    # session-3 batch-6 representatives, funded by rotating out
    # text_collocations_pmi / decontaminated_split /
    # events_recency_score (stdout-tail budget; all three remain
    # oracle-checked in the registry and timed in the 10x probe
    # table). scc/bowtie are characterized in SCALING.md — their
    # 40 s iterative fixpoints don't fit the suite.
    "dedup_edit_distance",
    "rouge_l_pairs",
    "isotonic_calibration",
]


def write_benchmarks(spark, samples: dict[str, list[float]]) -> None:
    """Write-path ops/s shapes from the reference perf suite
    (tests/perf/benchmarks.lisp:35-78, 163-185): batch insert, copy/save
    update, soft delete, snapshot dump, replay restore — through the MVCC
    txn-log engine (mvcc.py) on a throwaway store."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F, types as T

    from vivace_graph_v3_spark.mvcc import VersionedGraph
    from vivace_graph_v3_spark.schema import SchemaRegistry

    n = 20_000
    tmp = tempfile.mkdtemp(prefix="vgv3bench_")
    timings: dict[str, float] = {}
    try:
        reg = SchemaRegistry()
        reg.def_vertex("p_node", {"value": T.LongType()})
        vg = VersionedGraph(spark, reg, f"{tmp}/g")
        rows = spark.range(n).select(
            F.concat(F.lit("v"), F.col("id")).alias("id"),
            F.col("id").alias("value"))

        t0 = time.time()
        vg.commit(vg.begin().create("p_node", rows))
        timings["mvcc_insert_20k"] = round(time.time() - t0, 3)

        t0 = time.time()
        cur = vg.read("p_node").select("id", (F.col("value") + 1).alias("value"),
                                       "revision")
        vg.commit(vg.begin().save("p_node", cur))
        timings["mvcc_update_20k"] = round(time.time() - t0, 3)

        t0 = time.time()
        dead = vg.read("p_node").filter(F.col("value") <= n // 2).select("id")
        vg.commit(vg.begin().mark_deleted("p_node", dead))
        timings["mvcc_delete_10k"] = round(time.time() - t0, 3)

        t0 = time.time()
        vg.snapshot(f"{tmp}/snap")
        timings["mvcc_snapshot"] = round(time.time() - t0, 3)

        t0 = time.time()
        vg2 = VersionedGraph.replay(spark, reg, f"{tmp}/snap", f"{tmp}/g2")
        assert vg2.read("p_node").count() > 0
        timings["mvcc_replay"] = round(time.time() - t0, 3)

        for k, v in timings.items():
            samples.setdefault(k, []).append(v)
            print(f"# {k}: {v}s", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# sub-second ops rerun this many extra passes (n = REPS + EXTRA_REPS):
# their absolute deltas are noise-sized, yet their medians dominate the
# cross-round drift adjudication (VERDICT r6: two consecutive official
# windows were load-noised) — n=5 tightens exactly those medians at a
# few seconds of extra wall time
FAST_OP_EXTRA_REPS = max(0, int(os.environ.get(
    "SPARK_GRAFT_BENCH_EXTRA_REPS", "2")))
FAST_OP_CUTOFF_S = 1.0


def scale_probe_seconds(spark) -> float:
    """Core-sensitive scaling probe (VERDICT r9 item 2): a FIXED amount of
    CPU-bound work spread over 64 partitions — at least 2x any core count
    the driver benches with — so its wall time tracks 1/cores. The
    8-partition calibration op saturates at 8 cores and the sub-second
    suite entries sit on the job-scheduling floor, which made the driver's
    low-core/high-core ratio check illegible (PERF_r09 suspect_cpus_ignored
    despite session.py honoring $SPARK_GRAFT_CPUS). Same hash-mix kernel as
    the calibration op, whole-stage codegen, no I/O, computed fresh every
    call — nothing here depends on the SF data, so the ratio isolates the
    core count."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(0, 6_000_000_000, 1, 64).select(
        F.sum((F.col("id") % 2147483648) * 2654435761
              % 2147483648 % 97)).first()
    return round(time.time() - t0, 3)


def calibration_seconds(spark) -> float:
    """Fixed-cost JVM calibration op: sum a hash-mix over a 150M-row
    range on a pinned 8-partition layout — whole-stage codegen, no I/O,
    no shuffle, byte-identical work every call. Returns the MIN of 3
    runs (the least load-contaminated estimate of clean machine speed).
    Timed before and after the suite and emitted in the final JSON
    line, so a host-load-drifted bench window is detectable from
    BENCH_rN.json alone: same code + same machine => cal moves only
    with external load."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 150_000_000, 1, 8).select(
            F.sum((F.col("id") * 2654435761 % 2147483648) % 97)).first()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def main() -> int:
    from vivace_graph_v3_spark.session import get_spark
    from vivace_graph_v3_spark import entry_queries as eq

    spark = get_spark("vgv3-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = eq.queries()

    # warm the JVM/parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    # clean-window discipline (VERDICT r7 item 8): a load-drifted start
    # must not silently become the official record. A draining machine
    # shows MONOTONICALLY IMPROVING calibrations (consecutive estimates
    # can agree within 2x while both are still inflated — observed when
    # benching right after a test-suite run), so wait while the estimate
    # keeps improving by >15% and accept at the plateau; bounded at 5
    # retries, machine-independent (the run is compared to itself). The
    # final line still carries the drift annotation if the post-suite
    # calibration exposes a window this loop could not clean.
    cal_pre = calibration_seconds(spark)
    for _ in range(5):
        time.sleep(5)
        again = calibration_seconds(spark)
        if again >= 0.85 * cal_pre:
            cal_pre = min(cal_pre, again)
            break
        print(f"# pre-cal still improving ({cal_pre}s -> {again}s): "
              "waiting out draining load", file=sys.stderr)
        cal_pre = again
    print(f"# calibration pre-suite: {cal_pre}s", file=sys.stderr)

    # rep-major order: every query runs once per rep, so a transient host
    # stall lands on a different query each pass instead of biasing one
    samples: dict[str, list[float]] = {}

    def run_one(rep, name):
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = round(time.time() - t0, 3)
        samples.setdefault(name, []).append(dt)
        print(f"# rep{rep} {name}: {n} rows in {dt}s", file=sys.stderr)

    for rep in range(REPS):
        for name in BENCH_QUERIES:
            run_one(rep, name)
        write_benchmarks(spark, samples)
        sp = scale_probe_seconds(spark)
        samples.setdefault("scale_probe", []).append(sp)
        print(f"# rep{rep} scale_probe: {sp}s", file=sys.stderr)

    import statistics

    # extra passes for the sub-second ops (incl. the mvcc write path:
    # write_benchmarks reruns on a fresh throwaway store each pass)
    fast = [k for k in BENCH_QUERIES
            if statistics.median(samples[k]) < FAST_OP_CUTOFF_S]
    for extra in range(FAST_OP_EXTRA_REPS):
        for name in fast:
            run_one(REPS + extra, name)
        write_benchmarks(spark, samples)

    cal_post = calibration_seconds(spark)
    print(f"# calibration post-suite: {cal_post}s", file=sys.stderr)

    timings = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    spread = {k: round(max(v) - min(v), 3) for k, v in samples.items()}
    # the suite total stays the sum of the SAME entries every prior round
    # summed — scale_probe is a scaling diagnostic ADDED to the queries
    # dict this round (additive rows are allowed), and counting it in the
    # headline would self-inflict ~1.3 s vs the round-9 total
    total = round(sum(v for k, v in timings.items() if k != "scale_probe"), 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    # reps/spread are diagnostics -> stderr. The driver keeps only a ~2000-char
    # tail of stdout and parses the LAST line as JSON, so the final line must
    # stay comfortably under that (round-4 lesson: spread inlined here pushed
    # the line past the tail window and the driver recorded parsed=null).
    print(json.dumps({"reps": REPS, "extra_reps_fast": FAST_OP_EXTRA_REPS,
                      "spread": spread}), file=sys.stderr)
    print(final_json_line(total, timings, sf_val, cal_pre, cal_post))
    return 0


def final_json_line(total: float, timings: dict[str, float], sf_val,
                    cal_pre: float | None = None,
                    cal_post: float | None = None) -> str:
    """The ONE stdout JSON line the driver parses. Compact separators and
    2-decimal per-query values keep it under the driver's ~2000-char stdout
    tail window even with the full 65-op suite (gated by
    tests/test_bench_contract.py). ``cal`` carries the fixed-cost
    calibration timings bracketing the suite — the load-drift marker."""
    obj = {
        "metric": "headline_suite_seconds",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_val,
        # echo the core count the session actually ran with (VERDICT r9
        # item 2: make the driver's scaling check legible from the
        # artifact alone)
        "cpus": CPUS,
    }
    if cal_pre is not None:
        obj["cal"] = [round(cal_pre, 2),
                      round(cal_post, 2) if cal_post is not None else None]
        # load-drift annotation (VERDICT r7 item 8): the window is dirty
        # when the bracketing calibrations disagree by more than 2x —
        # machine-independent, computable from the artifact alone. A
        # drifted official record now carries its own warning label.
        if cal_post is not None and \
                max(cal_pre, cal_post) > 2 * min(cal_pre, cal_post):
            obj["drift"] = 1
    return json.dumps(obj, separators=(",", ":"))


if __name__ == "__main__":
    sys.exit(main())
