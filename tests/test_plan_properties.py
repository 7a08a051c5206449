"""Plan-quality regression tests: lock in the executed-plan properties that
matter at 100 TB (SURVEY §4.1 / PLAN_AUDIT.md) so a refactor can't silently
trade them away.

Asserts on the POST-AQE executed plan string: broadcast joins where a side
is dim-sized, parquet filter pushdown, column pruning, no row-at-a-time
Python, no nested-loop/cartesian fallbacks.
"""

import re

import pytest

from tests.conftest import SF_DIR
from vivace_graph_v3_spark import entry_queries as eq


def executed_plan(spark, name):
    df = eq.queries()[name](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints the final plan followed by a copy of the initial plan —
    # assert only on what actually executed
    return plan.split("== Initial Plan ==")[0]


def read_cols(plan):
    return [len([c for c in s.split(",") if c.strip()])
            for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]


# every query here must stay free of the scale-killers
NO_GO = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

CASES = {
    # pure pushdown scan: every predicate reaches the reader, <=5 cols read
    "q6_forecast_revenue": lambda p: (
        "PushedFilters: [" in p and max(read_cols(p)) <= 5
        and "Join" not in p),
    # scan-agg: two-phase (partial+final) aggregation, no shuffle-heavy join
    "q1_pricing_summary": lambda p: (
        len(re.findall(r"HashAggregate", p)) >= 2 and "Join" not in p),
    # dim joins must broadcast, never sort-merge
    "q16_supplier_cnt": lambda p: (
        "BroadcastHashJoin" in p and "SortMergeJoin" not in p),
    "q18_large_orders": lambda p: "BroadcastHashJoin" in p,
    "topk_per_group": lambda p: (
        "BroadcastHashJoin" in p and "SortMergeJoin" not in p
        and "Window" in p),
    # single-column type scan: pruning reaches parquet
    "is_a_scan": lambda p: read_cols(p) and max(read_cols(p)) == 1,
    # rollup = one Expand, not three scans
    "grouping_sets_revenue": lambda p: (
        "Expand" in p and len(read_cols(p)) <= 1),
    # window over a single shuffle; no join at all
    "events_moving_avg": lambda p: ("Window" in p and "Join" not in p),
    # sketch aggregate: no distinct Expand explosion for the HLL column
    "sketch_approx_distinct": lambda p: "Join" not in p,
    # exact dedup: hash aggregate + semi join, no cartesian anything
    "dedup_exact": lambda p: "HashAggregate" in p,
    # 7-table share join: dims broadcast, lineitem never sort-merged
    "q8_market_share": lambda p: (
        "BroadcastHashJoin" in p and "SortMergeJoin" not in p),
    # profit rollup: same broadcast-only property
    "q9_product_profit": lambda p: (
        "BroadcastHashJoin" in p and "SortMergeJoin" not in p),
    # decorrelated scalar-avg: per-part aggregate feeds a join, no
    # correlated re-scan per row
    "q17_small_quantity": lambda p: "HashAggregate" in p,
    # chunking is map-only: one scan, no shuffle exchange, no join.
    # Pruning is only assertable against a real file scan — if another
    # test's module fixture left documents .cache()d, the plan reads the
    # full-width InMemoryRelation instead and the read-schema check is moot
    "text_chunks": lambda p: (
        "Join" not in p and "Exchange" not in p
        and ("InMemoryTableScan" in p
             or (read_cols(p) and max(read_cols(p)) <= 2))),
    # contamination: eval side broadcasts; corpus is never shuffled by
    # shingle (the only exchange is the per-doc count aggregation)
    "dedup_contamination": lambda p: "BroadcastHashJoin" in p,
    # round-3 additions — lock in their designed shapes:
    # classifier scoring is a map-only expression chain
    "text_classifier": lambda p: ("Join" not in p and "Exchange" not in p),
    # the vocabulary membership join must broadcast (N-bounded by design)
    "vocab_coverage": lambda p: "BroadcastHashJoin" in p,
    # zorder key computation is map-only
    "zorder_key": lambda p: ("Join" not in p and "Exchange" not in p),
    # span corruption is a map-only fold
    "span_corruption": lambda p: ("Join" not in p and "Exchange" not in p),
    # audio decode runs through Arrow-batched pandas, never row-Python
    "multimodal_audio": lambda p: ("MapInPandas" in p
                                   and "BatchEvalPython" not in p),
    # (source_drift deliberately cross-joins a broadcast 1-row scalar —
    # BroadcastNestedLoopJoin with IdentityBroadcastMode — which NO_GO
    # would flag, so it is asserted via PLAN_AUDIT instead)
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_plan_properties(spark, name):
    plan = executed_plan(spark, name)
    for bad in NO_GO:
        assert bad not in plan, f"{name}: {bad} in executed plan"
    assert CASES[name](plan), f"{name}: plan property violated:\n{plan[:2000]}"


# -- PLAN_AUDIT snapshot gate (VERDICT r6 stretch item) -----------------------
#
# PLAN_AUDIT.md is the checked-in record of each headline entry's executed
# plan shape at sf0.01. This gate re-derives the same facts for a
# representative cross-subsystem subset and asserts the invariants that a
# Catalyst-behavior change (e.g. a future Spark upgrade) must not silently
# break: no NEW sort-merge join where the audit recorded broadcast-only, the
# python column stays arrow-or-absent (never a row UDF), and the scan count
# per entry is stable. Tests run at sf0.001 (conftest SF_DIR) while the
# audit ran at sf0.01 — join strategy can only shift TOWARD broadcast at the
# smaller SF, so smj is asserted as <= the snapshot, scans as ==.

SNAPSHOT_GATE = [
    "is_a_scan", "edge_join_2hop", "parts_per_customer",
    "q1_pricing_summary", "q5_nation_revenue", "dedup_exact",
    "ann_bruteforce_topk", "events_hourly_window",
    "q13_customer_distribution", "graph_pagerank", "retrieval_hybrid_rrf",
    "multimodal_audio", "knn_label_propagation", "matview_rollup_answer",
    # round-7 session-2 representatives: the 16-round relational DP and
    # the exact-isqrt mix (both must stay UDF-free and scan-stable)
    "viterbi_segmentation", "temperature_mix_weights",
]


def _audit_snapshot():
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_AUDIT.md")
    rows = {}
    with open(path) as fh:
        for line in fh:
            parts = [p.strip() for p in line.strip().strip("|").split("|")]
            if len(parts) != 6 or parts[0] in ("query", "---"):
                continue
            name, joins, scans, _cols, _pushed, py = parts
            if "/" not in joins:
                continue
            b, smj, shj = (int(x) for x in joins.split("/"))
            rows[name] = {"bcast": b, "smj": smj, "shj": shj,
                          "scans": int(scans), "python": py}
    return rows


@pytest.mark.parametrize("name", SNAPSHOT_GATE)
def test_plan_matches_audit_snapshot(spark, name):
    from vivace_graph_v3_spark.plans import plan_facts

    snap = _audit_snapshot()
    assert name in snap, f"{name} missing from PLAN_AUDIT.md"
    # another test module may have left an input table .cache()d, which
    # turns its parquet scans into InMemoryTableScans and voids the
    # scan-count compare (same caveat as the text_chunks case above) —
    # the audit snapshot is of COLD plans, so compare cold
    spark.catalog.clearCache()
    df = eq.queries()[name](spark, SF_DIR)
    df.collect()
    f = plan_facts(df)
    assert not f.row_udf, f"{name}: row-at-a-time Python UDF appeared"
    want = snap[name]
    got_py = "row-UDF!" if f.row_udf else ("arrow" if f.arrow else "-")
    assert got_py == want["python"], (
        f"{name}: python boundary changed {want['python']} -> {got_py}")
    assert f.sort_merge_joins <= want["smj"], (
        f"{name}: NEW sort-merge join ({f.sort_merge_joins} > "
        f"{want['smj']} in the audited snapshot)")
    assert len(f.scans) == want["scans"], (
        f"{name}: scan count changed {want['scans']} -> {len(f.scans)}")
