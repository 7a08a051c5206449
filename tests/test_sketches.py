"""Sketch aggregates: HLL++ approx distinct and Greenwald-Khanna quantiles.

No reference analog (SURVEY §2.4 notes the reference has no
approx_count_distinct); these are beyond-reference scale operators — at
100 TB a sketch with fixed-size state is the only viable distinct/quantile
path (no per-key distinct shuffle). Correctness = bounded error against the
exact answer; the contract queries embed the bound check as boolean columns
(so the DuckDB oracle can verify them exactly), and these tests assert the
bounds hold plus re-derive the quantile rank error independently via numpy.
"""

import numpy as np

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark import entry_queries as eq


def test_approx_distinct_error_bound(spark):
    rows = eq.q_sketch_approx_distinct(spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["exact_users"] > 0
        assert r["within_5pct"], r["event_type"]


def test_quantiles_rank_flags(spark):
    rows = eq.q_sketch_quantiles(spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        for col in ("p50_rank_ok", "p95_rank_ok", "p99_rank_ok"):
            assert r[col], (r["event_type"], col)


def test_quantiles_rank_error_numpy(spark, duck):
    # independent re-derivation of the in-query rank check: pull the raw
    # percentile_approx values and rank them against the sorted data
    ev = eq._events(spark, SF_DIR)
    got = {r["event_type"]: r["q"] for r in
           (ev.groupBy("event_type")
            .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000)
                 .alias("q"))).collect()}
    vals = duck.execute(
        "SELECT event_type, list(value) FROM events GROUP BY 1").fetchall()
    for etype, xs in vals:
        xs = np.sort(np.array(xs))
        n = len(xs)
        for i, q in enumerate((0.5, 0.95, 0.99)):
            est = got[etype][i]
            rank = np.searchsorted(xs, est, side="right") / n
            assert abs(rank - q) <= 0.011 + 1.0 / n, (etype, q, est, rank)


def test_bloom_no_false_negatives(spark):
    from vivace_graph_v3_spark.operators.sketches import (
        bloom_build, bloom_fpr_audit, bloom_probe)
    from pyspark.sql import functions as F

    members = spark.range(0, 200).select(F.col("id").alias("key"))
    bits = bloom_build(members, "key", k=3, m_bits=1024)
    probed = bloom_probe(
        bits, members.withColumn("is_member", F.lit(True)), "key",
        k=3, m_bits=1024, id_cols=["key", "is_member"])
    # every member must probe positive — blooms never false-negative
    assert probed.filter(~F.col("maybe")).count() == 0

    probes = (members.withColumn("is_member", F.lit(True))
              .unionAll(spark.range(100000, 100200)
                        .select(F.col("id").alias("key"),
                                F.lit(False).alias("is_member"))))
    row = bloom_fpr_audit(members, probes, "key", k=3, m_bits=1024).first()
    assert row.n_false_neg == 0
    assert row.n_probes == 400 and row.n_members == 200
    assert 0 < row.bits_set <= min(1024, 600)
    # fpr_ppm consistent with the counted false positives
    assert row.fpr_ppm == round(row.n_false_pos / 200 * 1e6)


def test_bloom_fpr_shrinks_with_more_bits(spark):
    from vivace_graph_v3_spark.operators.sketches import bloom_fpr_audit
    from pyspark.sql import functions as F

    members = spark.range(0, 500).select(F.col("id").alias("key"))
    probes = (members.withColumn("is_member", F.lit(True))
              .unionAll(spark.range(7000, 7500)
                        .select(F.col("id").alias("key"),
                                F.lit(False).alias("is_member"))))
    small = bloom_fpr_audit(members, probes, "key", k=3,
                            m_bits=1024).first()
    big = bloom_fpr_audit(members, probes, "key", k=3,
                          m_bits=16384).first()
    assert big.n_false_pos <= small.n_false_pos


def test_bloom_build_ignores_null_keys(spark):
    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.operators.sketches import bloom_build

    with_nulls = spark.createDataFrame([(1,), (None,), (2,)], "key long")
    without = spark.createDataFrame([(1,), (2,)], "key long")
    b1 = set(r.pos for r in bloom_build(with_nulls, "key").collect())
    b2 = set(r.pos for r in bloom_build(without, "key").collect())
    assert b1 == b2 and None not in b1
