"""interval_join: bucketed equi-join path vs the naive range predicate."""

import random

import pytest

from vivace_graph_v3_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def spark():
    from vivace_graph_v3_spark.session import get_spark

    return get_spark("test-interval")


def test_interval_join_basic(spark):
    pts = spark.createDataFrame([(1, 5), (2, 10), (3, 99)], ["pid", "ts"])
    iv = spark.createDataFrame([(10, 0, 9), (20, 10, 20), (30, 5, 15)],
                               ["iid", "lo", "hi"])
    got = {(r["pid"], r["iid"])
           for r in interval_join(pts, iv, point_ts="ts", start_col="lo",
                                  end_col="hi", bucket_width=8).collect()}
    # point 5 in [0,9] and [5,15]; point 10 in [10,20] and [5,15]; 99 nowhere
    assert got == {(1, 10), (1, 30), (2, 20), (2, 30)}


def test_interval_join_bucketed_equals_naive(spark):
    rng = random.Random(3)
    pts = [(i, rng.choice("ab"), rng.randint(0, 1000)) for i in range(300)]
    ivs = []
    for i in range(60):
        lo = rng.randint(0, 950)
        ivs.append((i, rng.choice("ab"), lo, lo + rng.randint(0, 120)))
    p = spark.createDataFrame(pts, ["pid", "k", "ts"])
    v = spark.createDataFrame(ivs, ["iid", "k", "lo", "hi"])
    for width in (16, 64, 1024):
        bucketed = {(r["pid"], r["iid"]) for r in interval_join(
            p, v, point_ts="ts", start_col="lo", end_col="hi",
            on="k", bucket_width=width).collect()}
        naive = {(r["pid"], r["iid"]) for r in interval_join(
            p, v, point_ts="ts", start_col="lo", end_col="hi",
            on="k").collect()}
        assert bucketed == naive and naive  # non-empty and identical


def test_interval_join_left_keeps_unmatched(spark):
    pts = spark.createDataFrame([(1, 5), (2, 50)], ["pid", "ts"])
    iv = spark.createDataFrame([(10, 0, 9)], ["iid", "lo", "hi"])
    rows = interval_join(pts, iv, point_ts="ts", start_col="lo",
                         end_col="hi", how="left").collect()
    by_pid = {r["pid"]: r["iid"] for r in rows}
    assert by_pid == {1: 10, 2: None}


def test_interval_concurrency_matches_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.operators.interval import interval_concurrency

    rng = random.Random(42)
    ivs = []
    for _ in range(200):
        s = rng.randint(0, 100)
        ivs.append((s, s + rng.randint(0, 20)))
    df = spark.createDataFrame(ivs, "s long, e long")
    out = {r.t: r.depth for r in
           interval_concurrency(df, start_col="s", end_col="e").collect()}
    # brute-force: depth at time t = count of intervals with s <= t <= e
    for t in range(0, 130):
        expected = sum(1 for s, e in ivs if s <= t <= e)
        # emitted rows carry the depth at their boundary; between
        # boundaries depth is the last emitted value
        boundary_depth = [d for bt, d in sorted(out.items()) if bt <= t]
        got = boundary_depth[-1] if boundary_depth else 0
        assert got == expected, (t, got, expected)


def test_interval_concurrency_closed_endpoints(spark):
    from vivace_graph_v3_spark.operators.interval import interval_concurrency

    # [0, 5] and [5, 9]: both open at t=5 (closed intervals)
    df = spark.createDataFrame([(0, 5), (5, 9)], "s long, e long")
    out = {r.t: r.depth for r in
           interval_concurrency(df, start_col="s", end_col="e").collect()}
    assert out[5] == 2
    assert out[6] == 1


def test_allen_relation_census_all_13(spark):
    from vivace_graph_v3_spark.operators.interval import (
        allen_relation_census)
    # one pair per relation, all in distinct groups; (a, b) with a < b
    rows = [
        ("g1", 1, 0, 2), ("g1", 2, 5, 8),       # before (a ends first)
        ("g2", 1, 5, 8), ("g2", 2, 0, 2),       # after
        ("g3", 1, 0, 3), ("g3", 2, 3, 6),       # meets
        ("g4", 1, 3, 6), ("g4", 2, 0, 3),       # met_by
        ("g5", 1, 0, 4), ("g5", 2, 2, 7),       # overlaps
        ("g6", 1, 2, 7), ("g6", 2, 0, 4),       # overlapped_by
        ("g7", 1, 0, 3), ("g7", 2, 0, 6),       # starts
        ("g8", 1, 0, 6), ("g8", 2, 0, 3),       # started_by
        ("g9", 1, 3, 6), ("g9", 2, 0, 6),       # finishes
        ("gA", 1, 0, 6), ("gA", 2, 3, 6),       # finished_by
        ("gB", 1, 2, 4), ("gB", 2, 0, 6),       # during
        ("gC", 1, 0, 6), ("gC", 2, 2, 4),       # contains
        ("gD", 1, 1, 5), ("gD", 2, 1, 5),       # equals
    ]
    df = spark.createDataFrame(rows, ["g", "i", "s", "e"])
    out = {r["relation"]: r["n_pairs"]
           for r in allen_relation_census(df, group_col="g", id_col="i",
                                          start_col="s",
                                          end_col="e").collect()}
    assert out == {k: 1 for k in (
        "before", "after", "meets", "met_by", "overlaps", "overlapped_by",
        "starts", "started_by", "finishes", "finished_by", "during",
        "contains", "equals")}


def test_allen_census_group_scoped(spark):
    from vivace_graph_v3_spark.operators.interval import (
        allen_relation_census)
    # same intervals in DIFFERENT groups -> no pairs at all
    rows = [("g1", 1, 0, 2), ("g2", 2, 0, 2)]
    df = spark.createDataFrame(rows, ["g", "i", "s", "e"])
    assert allen_relation_census(df, group_col="g", id_col="i",
                                 start_col="s", end_col="e").count() == 0
