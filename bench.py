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
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
]


def main() -> int:
    from vivace_graph_v3_spark.session import get_spark
    from vivace_graph_v3_spark import entry_queries as eq

    spark = get_spark("vgv3-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = eq.queries()

    # warm the JVM/parquet footers once so timings measure the queries
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
