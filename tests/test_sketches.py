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


class TestHLL:
    def test_registers_match_pure_python(self, spark):
        import hashlib

        vals = [f"k{i}" for i in range(200)]
        df = spark.createDataFrame([(v,) for v in vals], ["k"])
        from vivace_graph_v3_spark.operators.sketches import hll_registers

        got = {r["register"]: r["m_rho"]
               for r in hll_registers(df, "k", m=64).collect()}

        def md5h64(s: str) -> int:
            h = hashlib.md5(s.encode()).hexdigest()
            hi = int(h[:8], 16)
            if hi >= 2**31:
                hi -= 2**32
            return hi * 2**32 + int(h[8:16], 16)

        exp = {j: 0 for j in range(64)}
        for v in vals:
            hh = md5h64(v) % 2**62
            j, w = hh % 64, hh // 64
            rho = 40 if w == 0 else min((w & -w).bit_length(), 40)
            exp[j] = max(exp[j], rho)
        assert got == exp

    def test_estimate_close_to_exact(self, spark):
        df = spark.createDataFrame([(f"u{i % 500}",) for i in range(2000)],
                                   ["k"])
        from vivace_graph_v3_spark.operators.sketches import (
            hll_estimate_audit)

        r = hll_estimate_audit(df, "k").collect()[0]
        assert r["n_exact"] == 500
        # 64 registers -> stderr ~ 1.04/sqrt(64) = 13%; allow 4 sigma
        assert abs(r["est"] - 500) < 0.52 * 500
        assert r["m"] == 64 and r["s_scaled"] > 0


class TestTWAP:
    def test_hand_intervals(self, spark):
        from vivace_graph_v3_spark.operators.rollup import (
            time_weighted_average)

        # value 1.00 in effect for 3 ns, 5.00 for 1 ns, last row dropped
        rows = [("a", 0, 1, 1.0), ("a", 3, 2, 5.0), ("a", 4, 3, 9.0),
                ("b", 0, 4, 2.0)]  # b: single obs -> no interval -> absent
        df = spark.createDataFrame(
            rows, "event_type string, ts long, event_id long, value double")
        out = {r["group"]: r for r in time_weighted_average(df).collect()}
        assert set(out) == {"a"}
        a = out["a"]
        assert a["n_intervals"] == 2 and a["span_ns"] == 4
        # (100*3 + 500*1) * 1000 // 4 = 200000 millicents = $2.00
        assert a["twap_millicents"] == 200000
