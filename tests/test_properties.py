"""Property-based tests (hypothesis) over the query surface — SURVEY §5(c):
operators whose semantics must hold for ARBITRARY parameters, not just the
fixture values used in the example-based tests.

Kept to few examples per property: every example compiles and runs a real
Spark plan (deadline disabled for JVM scheduling jitter).
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.query.builder import select, select_count

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.function_scoped_fixture])


@SLOW
@given(thr=st.floats(min_value=-1000, max_value=10000,
                     allow_nan=False, allow_infinity=False))
def test_threshold_filter_matches_oracle(tpch, duck, thr):
    """slot-compare goal == SQL predicate for arbitrary thresholds,
    including ones outside the data range (empty results)."""
    df = select(tpch, ["?c"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        (">", "?b", thr),
    ])
    want = duck.execute(
        "SELECT count(*) FROM customer WHERE c_acctbal > ?", [thr]).fetchone()[0]
    assert df.count() == want


@SLOW
@given(skip=st.integers(min_value=0, max_value=60),
       limit=st.integers(min_value=0, max_value=60))
def test_limit_skip_composition(tpch, duck, skip, limit):
    """select :skip/:limit arithmetic (prologc.lisp:825-831) for arbitrary
    page windows, including windows past the end of the data."""
    total = duck.execute("SELECT count(*) FROM nation").fetchone()[0]
    df = select(tpch, ["?n"], [("is-a", "?n", "nation")],
                skip=skip, limit=limit)
    assert df.count() == max(0, min(total - skip, limit))


@SLOW
@given(seg=st.sampled_from(["BUILDING", "AUTOMOBILE", "MACHINERY",
                            "HOUSEHOLD", "FURNITURE"]),
       thr=st.floats(min_value=0, max_value=5000,
                     allow_nan=False, allow_infinity=False))
def test_conjunction_commutes_with_filter_order(tpch, seg, thr):
    """Goal conjunction is declarative: swapping two independent filter
    goals cannot change the solution multiset (the upgrade over the
    reference's order-as-execution-plan, SURVEY §4.1)."""
    base = [("is-a", "?c", "customer"),
            ("slot", "?c", "c_mktsegment", "?s"),
            ("slot", "?c", "c_acctbal", "?b")]
    g1 = base + [("==", "?s", seg), (">", "?b", thr)]
    g2 = base + [(">", "?b", thr), ("==", "?s", seg)]
    a = sorted(r["c"] for r in select(tpch, ["?c"], g1).collect())
    b = sorted(r["c"] for r in select(tpch, ["?c"], g2).collect())
    assert a == b


@SLOW
@given(lo=st.floats(min_value=0, max_value=2500, allow_nan=False),
       hi=st.floats(min_value=2500, max_value=6000, allow_nan=False))
def test_not_complements_range(tpch, duck, lo, hi):
    """Negation-as-failure is a true complement: rows in [lo,hi] plus
    rows NOT in [lo,hi] == all rows, for arbitrary ranges."""
    inside = select_count(tpch, [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        (">=", "?b", lo), ("<=", "?b", hi),
    ])
    outside = select_count(tpch, [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        ("not", (">=", "?b", lo), ("<=", "?b", hi)),
    ])
    total = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert inside + outside == total
