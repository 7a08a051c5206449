"""Sketch aggregates: HLL++ approx distinct and Greenwald-Khanna quantiles.

No reference analog (SURVEY §2.4 notes the reference has no
approx_count_distinct); these are beyond-reference scale operators — at
100 TB a sketch with fixed-size state is the only viable distinct/quantile
path (no per-key distinct shuffle). Correctness here = bounded error
against the exact answer, not hash equality.
"""

import numpy as np

from tests.conftest import SF_DIR
from vivace_graph_v3_spark import entry_queries as eq


def test_approx_distinct_error_bound(spark):
    rows = eq.q_sketch_approx_distinct(spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["exact_users"] > 0
        rel = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel < 0.05, (r["event_type"], rel)


def test_quantiles_rank_error(spark, duck):
    got = {r["event_type"]: r
           for r in eq.q_sketch_quantiles(spark, SF_DIR).collect()}
    vals = duck.execute(
        "SELECT event_type, list(value) FROM events GROUP BY 1").fetchall()
    for etype, xs in vals:
        xs = np.sort(np.array(xs))
        n = len(xs)
        for col, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            est = got[etype][col]
            # rank of the estimate must be within 1% of the target rank
            rank = np.searchsorted(xs, est, side="right") / n
            assert abs(rank - q) <= 0.011 + 1.0 / n, (etype, col, est, rank)
