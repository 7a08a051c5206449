"""One-pass table profiler."""

import pytest
from datetime import date

from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.profile import profile_table


def test_profile_mixed_types(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a", date(2020, 1, 1)),
         (2, None, "b", date(2021, 6, 1)),
         (2, 7.5, None, None)],
        "k long, v double, s string, d date")
    rows = {r.column: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "v", "s", "d"}
    k = rows["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (3, 0, 2)
    assert (k.min_num, k.max_num, k.mean) == (1.0, 2.0, round(5 / 3, 6))
    assert k.min_str is None and k.max_str is None
    v = rows["v"]
    assert (v.n_null, v.n_distinct, v.mean) == (1, 2, 5.0)
    s = rows["s"]
    assert (s.min_str, s.max_str, s.n_null) == ("a", "b", 1)
    assert s.min_num is None and s.mean is None
    d = rows["d"]
    assert d.min_str == "2020-01-01" and d.max_str == "2021-06-01"


def test_profile_scan_budget(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # exactly TWO scans (r10): one plain-aggregate chain + one
    # multi-distinct chain, so the distinct Expand rewrite never carries
    # the plain aggregates' inputs through its row blowup
    assert plan.count("Range (0, 100") == 2
    # the approx path keeps the single-scan shape (no Expand at all)
    approx = profile_table(df, exact_distinct=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert approx.count("Range (0, 100") == 1
    assert "Expand" not in approx


def test_histogram_basic(spark):
    from vivace_graph_v3_spark.operators.profile import histogram
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    rows = {r.bin: r for r in histogram(df, "x", bins=10).collect()}
    assert len(rows) == 10
    assert all(r.n == 10 for r in rows.values())
    assert rows[0].lo == 0.0 and rows[9].hi == 99.0
    # top edge clamps into last bin
    one = histogram(df, "x", bins=10, lo=0, hi=99).collect()
    assert sum(r.n for r in one) == 100


def test_histogram_explicit_bounds_single_pass(spark):
    from vivace_graph_v3_spark.operators.profile import histogram
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    plan = histogram(df, "x", bins=4, lo=0, hi=999) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan  # no inline min/max pass


def test_morton_key_locality_and_bounds(spark):
    from vivace_graph_v3_spark.operators.layout import morton_key
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long")
    key = morton_key(["x", "y"], [(0, 3), (0, 3)], bits=2)
    got = {(r.x, r.y): r.z for r in df.select("x", "y", key.alias("z")).collect()}
    # classic 4x4 morton curve: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,0)=4 ...
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1
    assert got[(0, 1)] == 2 and got[(1, 1)] == 3
    assert got[(2, 0)] == 4 and got[(3, 3)] == 15
    assert len(set(got.values())) == 16  # bijective on the grid


def test_zorder_write_plan_range_partitions(spark):
    from vivace_graph_v3_spark.operators.layout import zorder_write_plan
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long")
    out = zorder_write_plan(df, ["x", "y"], [(0, 31), (0, 31)],
                            bits=5, partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # each partition owns a contiguous curve segment
    parts = out.select(F.spark_partition_id().alias("p"), "zkey").collect()
    bounds = {}
    for r in parts:
        lo, hi = bounds.get(r.p, (r.zkey, r.zkey))
        bounds[r.p] = (min(lo, r.zkey), max(hi, r.zkey))
    ordered = sorted(bounds.values())
    for (l1, h1), (l2, h2) in zip(ordered, ordered[1:]):
        assert h1 <= l2


def test_distribution_drift_identical_vs_shifted(spark):
    from vivace_graph_v3_spark.operators.profile import distribution_drift
    rows = [("a", v) for v in range(0, 1000, 10)] \
        + [("b", v) for v in range(0, 1000, 10)] \
        + [("c", v + 5000) for v in range(0, 1000, 10)]
    df = spark.createDataFrame(rows, "src string, x long")
    got = {r.group: r.chi2 for r in
           distribution_drift(df, group_col="src", value_col="x").collect()}
    # a and b are identical distributions -> equal (nonzero, since the
    # corpus includes c's far buckets); c is disjointly shifted -> largest
    assert got["a"] == got["b"]
    assert got["c"] > got["a"] > 0


def test_table_diff_all_change_kinds(spark):
    from vivace_graph_v3_spark.operators.profile import table_diff
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long")
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged -> omitted
         (2, "b", 21),          # changed
         (3, "c", None),        # unchanged with NULL payload -> omitted
         (5, "e", 50)],         # added; 4 removed
        "k long, s string, v long")
    got = {r.k: r.change for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 4: "removed", 5: "added"}
    # compare_cols narrows the comparison
    narrowed = {r.k: r.change
                for r in table_diff(old, new, ["k"],
                                    compare_cols=["s"]).collect()}
    assert narrowed == {4: "removed", 5: "added"}


def test_histogram_constant_column_single_bin(spark):
    """Degenerate range (min == max) must yield ONE bin 0 with lo == hi,
    not NaN-arithmetic landing every row in bin bins-1 (ADVICE r3)."""
    from vivace_graph_v3_spark.operators.profile import histogram
    df = spark.createDataFrame([(7.5,)] * 40, "x double")
    rows = histogram(df, "x", bins=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.bin == 0 and r.lo == 7.5 and r.hi == 7.5 and r.n == 40


def test_ks_drift_detects_shifted_group(spark):
    """A group drawn from a shifted distribution has a much larger KS
    statistic than groups matching the corpus; identical groups get a
    small one. KS is bounded in [0, 1]."""
    from vivace_graph_v3_spark.operators.profile import ks_drift

    rows = ([("a", v) for v in range(100)]
            + [("b", v) for v in range(100)]
            + [("c", v + 500) for v in range(100)])  # shifted way right
    df = spark.createDataFrame(rows, "g string, x int")
    ks = {r.g: r.ks for r in
          ks_drift(df, group_col="g", value_col="x").collect()}
    assert all(0.0 <= v <= 1.0 for v in ks.values())
    assert ks["c"] > 0.6                       # disjoint support
    assert ks["a"] == ks["b"] and ks["a"] < 0.4


def test_ks_ratio_decimal_arithmetic_survives_overflow_scale(spark):
    """Round-4 advice regression: ks_drift's rounding step multiplies
    max(num) by 2,000,000 where num/den scale as n_g*n_all; in BIGINT that
    wraps (ANSI off) or throws (ANSI on) once n_g*n_all exceeds ~4.6e12.
    The DECIMAL(38,0) recipe must return the exact round-half-up quotient
    at that scale. num/den here model a 600k-row group in a 10M-row corpus
    (den = 6e12), far past the BIGINT boundary of 9.22e18/2e6."""
    from pyspark.sql import functions as F

    num, den = 5_999_999_999_999, 6_000_000_000_000   # ratio ~ 1.0
    df = spark.createDataFrame([(num, den)], "num long, den long")
    q = df.select(
        F.expr("(CAST(max(num) AS DECIMAL(38,0)) * 2000000 "
               " + any_value(den)) "
               "div (CAST(any_value(den) AS DECIMAL(38,0)) * 2)")
        .alias("q")).collect()[0].q
    # exact round-half-up of num/den * 1e6
    want = (num * 2_000_000 + den) // (den * 2)
    assert q == want == 1_000_000  # ratio ~1.0 -> 1.000000 at 6dp scale


def test_k_anonymity_classes(spark):
    from vivace_graph_v3_spark.operators.profile import k_anonymity

    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "A"), (1, "B"), (2, "A")],
        "nat int, seg string")
    got = {(r.nat, r.seg): (r.class_size, r.at_risk)
           for r in k_anonymity(df, ["nat", "seg"], k=3).collect()}
    assert got[(1, "A")] == (3, False)
    assert got[(1, "B")] == (1, True)
    assert got[(2, "A")] == (1, True)


def test_l_diversity_flags_homogeneous_classes(spark):
    from vivace_graph_v3_spark.operators.profile import l_diversity

    df = spark.createDataFrame(
        [(1, "A", "flu"), (1, "A", "flu"), (1, "A", "cold"),
         (1, "B", "flu"), (1, "B", "cold"), (2, "A", "flu")],
        "nat int, seg string, dx string")
    got = {(r.nat, r.seg): (r.class_size, r.n_sensitive, r.at_risk)
           for r in l_diversity(df, ["nat", "seg"], "dx", l=2).collect()}
    assert got[(1, "A")] == (3, 2, False)
    assert got[(1, "B")] == (2, 2, False)
    assert got[(2, "A")] == (1, 1, True)


def test_compaction_plan_groups_by_running_size(spark):
    from vivace_graph_v3_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [("t1", 1, 100), ("t1", 2, 100), ("t1", 3, 100),
         ("t2", 1, 400), ("t2", 2, 10)],
        "prefix string, file_id long, size_bytes long")
    got = {(r.prefix, r.file_id): r.group_id
           for r in compaction_plan(files, target_bytes=150).collect()}
    # t1 exclusive cumsums 0/100/200 -> groups 0, 0, 1 (prefix-local)
    assert got[("t1", 1)] == 0 and got[("t1", 2)] == 0
    assert got[("t1", 3)] == 1
    assert got[("t2", 1)] == 0 and got[("t2", 2)] == 2


def test_zonemap_skip_stats_sorted_layout_prunes(spark):
    from vivace_graph_v3_spark.operators.layout import zonemap_skip_stats

    # keys 0..999 uniform; arrival ids shuffled mod-wise; predicate 100..199
    df = spark.createDataFrame(
        [(k, (k * 7919) % 1000) for k in range(1000)], "key long, a long")
    got = {r.layout: (r.n_files, r.n_skipped)
           for r in zonemap_skip_stats(df, "key", 100, 199,
                                       arrival_col="a",
                                       n_files=10).collect()}
    # range layout: 10 files of 100 keys each -> exactly 9 skippable
    assert got["keysorted"] == (10, 9)
    # arrival layout: every file spans nearly the whole key range -> 0
    assert got["arrival"] == (10, 0)


def test_winsorize_stats_hand_percentiles(spark):
    from vivace_graph_v3_spark.operators.profile import winsorize_stats

    # 10 values 1..10 dollars; 10/90 band -> lo=1.00, hi=9.00 (grid rule:
    # min value whose cumulative count reaches ceil(n*pct/100))
    df = spark.createDataFrame([("g", float(i)) for i in range(1, 11)],
                               "grp string, val double")
    r = winsorize_stats(df, "val", "grp", lo_pct=10, hi_pct=90).first()
    assert (r.n, r.lo_thr, r.hi_thr) == (10, 100, 900)
    assert (r.n_clipped_lo, r.n_clipped_hi) == (0, 1)       # only 10.00 clips
    assert r.winsorized_sum_cents == sum(range(100, 1000, 100)) + 900


def test_roc_auc_perfect_and_random(spark):
    from vivace_graph_v3_spark.operators.profile import roc_auc

    # perfect separation: every positive scores above every negative
    df = spark.createDataFrame(
        [(10, True), (9, True), (2, False), (1, False)], "s long, y boolean")
    r = roc_auc(df, score_col="s", label_col="y").first()
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    # all scores tied: AUC must be exactly 0.5 via average ranks
    df = spark.createDataFrame(
        [(5, True), (5, True), (5, False), (5, False)], "s long, y boolean")
    assert roc_auc(df, score_col="s", label_col="y").first().auc == 0.5
    # known hand case: scores 1,2,3,4 labels F,T,F,T -> AUC = 3/4
    df = spark.createDataFrame(
        [(1, False), (2, True), (3, False), (4, True)], "s long, y boolean")
    assert roc_auc(df, score_col="s", label_col="y").first().auc == 0.75


def test_roc_auc_degenerate_groups_dropped(spark):
    from vivace_graph_v3_spark.operators.profile import roc_auc

    df = spark.createDataFrame(
        [("g1", 1, True), ("g1", 2, False), ("g2", 1, True), ("g2", 2, True)],
        "g string, s long, y boolean")
    rows = roc_auc(df, score_col="s", label_col="y", group_col="g").collect()
    # g2 has no negatives -> AUC undefined -> dropped, not NaN/err
    assert [r.group for r in rows] == ["g1"]


def test_rater_agreement_kappa(spark):
    from vivace_graph_v3_spark.operators.profile import rater_agreement

    # perfect agreement -> kappa 1
    df = spark.createDataFrame([(True, True), (False, False)] * 5,
                               "a boolean, b boolean")
    r = rater_agreement(df, a_col="a", b_col="b").first()
    assert (r.n, r.n_agree, r.kappa) == (10, 10, 1.0)
    # independence-shaped 2x2 (all four cells equal) -> kappa 0
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)] * 3,
        "a boolean, b boolean")
    assert rater_agreement(df, a_col="a", b_col="b").first().kappa == 0.0
    # systematic disagreement -> kappa -1
    df = spark.createDataFrame([(True, False), (False, True)] * 5,
                               "a boolean, b boolean")
    assert rater_agreement(df, a_col="a", b_col="b").first().kappa == -1.0


def test_psi_drift_identical_groups_near_zero(spark):
    from vivace_graph_v3_spark.operators.profile import psi_drift

    rows = [(g, v) for g in ("a", "b") for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.group: r.psi for r in
           psi_drift(df, group_col="g", value_col="v",
                     bucket_width=10).collect()}
    # identical distributions -> PSI ~ 0 (exactly 0 up to smoothing)
    assert all(abs(v) < 1e-6 for v in out.values())


def test_psi_drift_shifted_group_positive(spark):
    from vivace_graph_v3_spark.operators.profile import psi_drift

    rows = ([("a", v) for v in range(100)]
            + [("b", v + 500) for v in range(100)])
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.group: r.psi for r in
           psi_drift(df, group_col="g", value_col="v",
                     bucket_width=10).collect()}
    assert out["a"] > 0.25 and out["b"] > 0.25  # disjoint mass = major shift


def test_t_closeness_hand_computed(spark):
    from vivace_graph_v3_spark.operators.profile import t_closeness

    # c1 uniform on {1,2,3,4}, c2 all-1. Global CDF = (.625,.75,.875,1);
    # c1 CDF = (.25,.5,.75,1) -> EMD = (.375+.25+.125+0)/3 = 0.25;
    # c2 CDF = (1,1,1,1)      -> EMD = (.375+.25+.125+0)/3 = 0.25 too
    # (two-class mixtures are symmetric around the pool) — assert the
    # exact hand value, and that a third matching class scores 0
    rows = ([("c1", v) for v in (1, 2, 3, 4)] * 3
            + [("c2", 1)] * 12)
    df = spark.createDataFrame(rows, "q string, v long")
    out = {r.q: r for r in t_closeness(df, ["q"], "v").collect()}
    assert out["c1"].t_ppm == 250000 and out["c2"].t_ppm == 250000
    assert out["c1"].class_size == 12 and out["c2"].class_size == 12
    assert not out["c1"].at_risk  # 0.25 < default 0.3 threshold

    # a class distributed exactly like the pool scores t = 0
    rows2 = rows + [("c3", v) for v in (1, 1, 1, 1, 1, 2, 3, 4)]
    # pool of rows = {1: 17, 2: 5, 3: 5, 4: 5}; c3 = {1:5, 2:1, 3:1, 4:1}
    # is NOT proportional — instead check monotonicity: c3 sits between
    df2 = spark.createDataFrame(rows2, "q string, v long")
    out2 = {r.q: r.t_ppm for r in t_closeness(df2, ["q"], "v").collect()}
    assert out2["c3"] < out2["c2"]


def test_equi_depth_histogram_balanced(spark):
    from vivace_graph_v3_spark.operators.profile import equi_depth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rows = sorted(equi_depth_histogram(df, "v", buckets=5, scale=1).collect())
    assert len(rows) == 5
    assert all(r.n == 20 for r in rows)
    # contiguous, ordered, non-overlapping edges
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo
    # heavy tie: one value holding >1/k of the mass stays in ONE bucket
    df = spark.createDataFrame([(1.0,)] * 60 + [(float(i),) for i in range(2, 42)],
                               "v double")
    rows = equi_depth_histogram(df, "v", buckets=5, scale=1).collect()
    big = [r for r in rows if r.lo <= 1 <= r.hi]
    assert len(big) == 1 and big[0].n >= 60


def test_encoding_stats_known_layout(spark):
    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.operators.layout import encoding_stats

    # one file, rows in order: constant column -> 1 run; strictly
    # increasing column -> n runs, fully sorted
    df = spark.createDataFrame(
        [(i, 7, i) for i in range(10)], "pos long, const long, inc long")
    out = {r.column: r for r in
           encoding_stats(df, ["const", "inc"], file_col=F.lit(0),
                          order_cols=["pos"]).collect()}
    assert (out["const"].n_runs, out["const"].n_distinct) == (1, 1)
    assert out["const"].sorted_ppm == 1000000
    assert (out["inc"].n_runs, out["inc"].n_distinct) == (10, 10)
    assert out["inc"].sorted_ppm == 1000000
    # reversed column: sorted_ppm 0, still 10 runs
    df2 = spark.createDataFrame([(i, 9 - i) for i in range(10)],
                                "pos long, dec long")
    r = encoding_stats(df2, ["dec"], file_col=F.lit(0),
                       order_cols=["pos"]).first()
    assert (r.n_runs, r.sorted_ppm) == (10, 0)


def test_encoding_stats_runs_reset_at_file_boundary(spark):
    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.operators.layout import encoding_stats

    # same constant value across two files -> 2 runs (one per file head)
    df = spark.createDataFrame([(f, i, 5) for f in (0, 1) for i in range(5)],
                               "f long, pos long, v long")
    r = encoding_stats(df, ["v"], file_col=F.col("f"),
                       order_cols=["pos"]).first()
    assert r.n_runs == 2


def test_rater_agreement_degenerate_null_kappa(spark):
    from vivace_graph_v3_spark.operators.profile import rater_agreement

    # both raters constant -> pe = 1 -> kappa undefined (NULL), not a
    # divide-by-zero
    df = spark.createDataFrame([(True, True)] * 4, "a boolean, b boolean")
    r = rater_agreement(df, a_col="a", b_col="b").first()
    assert r.n == 4 and r.kappa_ppm is None and r.kappa is None


def test_t_closeness_single_value_zero(spark):
    from vivace_graph_v3_spark.operators.profile import t_closeness

    df = spark.createDataFrame([("c1", 5), ("c2", 5)], "q string, v long")
    rows = t_closeness(df, ["q"], "v").collect()
    assert all(r.t_ppm == 0 and not r.at_risk for r in rows)


def test_js_divergence_identical_group_zero(spark):
    from vivace_graph_v3_spark.operators.profile import js_divergence
    rows = [("a", v) for v in (10, 20, 30, 40)] * 5 + \
           [("b", v) for v in (10, 20, 30, 40)] * 5
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["group"]: r["jsd_bits"]
           for r in js_divergence(df, group_col="g", value_col="v",
                                  bucket_width=10).collect()}
    # both groups match the corpus distribution exactly -> JSD 0
    assert out["a"] == 0.0 and out["b"] == 0.0


def test_js_divergence_vs_python(spark):
    import math as m
    from vivace_graph_v3_spark.operators.profile import js_divergence
    rows = [("a", v) for v in (5, 5, 15, 25)] + \
           [("b", v) for v in (15, 25, 25, 35, 35, 35)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["group"]: r
           for r in js_divergence(df, group_col="g", value_col="v",
                                  bucket_width=10).collect()}

    def brute(grp):
        from collections import Counter
        gb = Counter(v // 10 for g, v in rows if g == grp)
        cb = Counter(v // 10 for _, v in rows)
        ns, nt = sum(gb.values()), sum(cb.values())
        jsd = 0.0
        for b in cb:
            p, q = gb.get(b, 0) / ns, cb[b] / nt
            mm = (p + q) / 2
            jsd += (0.5 * p * m.log2(p / mm) if p else 0.0) \
                + 0.5 * q * m.log2(q / mm)
        return jsd

    for g in ("a", "b"):
        assert got[g]["jsd_bits"] == pytest.approx(brute(g), abs=1e-6)
        assert 0.0 <= got[g]["jsd_bits"] <= 1.0


def test_js_divergence_disjoint_groups_bounded(spark):
    from vivace_graph_v3_spark.operators.profile import js_divergence
    rows = [("a", 5)] * 10 + [("b", 995)] * 10
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["group"]: r["jsd_bits"]
           for r in js_divergence(df, group_col="g", value_col="v",
                                  bucket_width=10).collect()}
    # a group fully disjoint from the other half of the corpus:
    # JSD(p, (p+q)/2 mix) is strictly inside (0, 1) and symmetric
    assert out["a"] == out["b"]
    assert 0.3 < out["a"] < 1.0


def test_delete_cascade_audit_chain(spark):
    from vivace_graph_v3_spark.operators.profile import delete_cascade_audit
    cust = spark.createDataFrame([(1, "del"), (2, "keep"), (3, "del")],
                                 ["ck", "tag"])
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["ok", "ck"])
    items = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (12, 1), (13, 1)], ["ok", "ln"])
    seed = cust.filter(F.col("tag") == "del")
    out = {r["table"]: r["n_rows"] for r in delete_cascade_audit(
        seed, "ck",
        [("orders", orders, "__seed__", "ck", "ok"),
         ("items", items, "orders", "ok", None)]).collect()}
    # customers 1,3 -> orders 10,11,13 -> items on 10(x2),11,13
    assert out == {"__seed__": 2, "orders": 3, "items": 4}


def test_delete_cascade_audit_empty_seed(spark):
    from vivace_graph_v3_spark.operators.profile import delete_cascade_audit
    cust = spark.createDataFrame([(1,)], ["ck"])
    orders = spark.createDataFrame([(10, 1)], ["ok", "ck"])
    out = {r["table"]: r["n_rows"] for r in delete_cascade_audit(
        cust.filter(F.col("ck") < 0), "ck",
        [("orders", orders, "__seed__", "ck", None)]).collect()}
    assert out == {"__seed__": 0, "orders": 0}
