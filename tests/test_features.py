"""Tests for operators/features.py and embedding isotropy."""

import math

import pyspark.sql.functions as F


class TestWoeIv:
    def test_hand_computed(self, spark):
        from vivace_graph_v3_spark.operators.features import woe_iv

        # cat a: 3 good / 1 bad; cat b: 1 good / 3 bad; totals 4/4
        rows = [("a", True)] * 3 + [("a", False)] + \
               [("b", True)] + [("b", False)] * 3
        df = spark.createDataFrame(rows, "c string, y boolean")
        out = {r["category"]: r for r in woe_iv(df, "c", "y").collect()}
        woe_a = math.log(3.5 / 5.0) - math.log(1.5 / 5.0)
        assert abs(out["a"]["woe"] - round(woe_a, 6)) < 1e-9
        assert out["a"]["n_good"] == 3 and out["a"]["n_bad"] == 1
        # symmetric construction -> antisymmetric WoE
        assert abs(out["a"]["woe"] + out["b"]["woe"]) < 1e-9
        iv = 2 * ((3 / 4 - 1 / 4) * woe_a)
        assert abs(out["a"]["iv_total"] - round(iv, 6)) < 1e-5

    def test_empty_cell_stays_finite(self, spark):
        from vivace_graph_v3_spark.operators.features import woe_iv

        rows = [("a", True)] * 5 + [("b", False)] * 5
        df = spark.createDataFrame(rows, "c string, y boolean")
        out = woe_iv(df, "c", "y").collect()
        assert all(math.isfinite(r["woe"]) for r in out)


class TestTargetEncodingLoo:
    def test_leave_one_out(self, spark):
        from vivace_graph_v3_spark.operators.features import (
            target_encoding_loo)

        rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 7)]
        df = spark.createDataFrame(rows, "id int, c string, t int")
        out = {r["id"]: r["encoding"] for r in
               target_encoding_loo(df, "c", "t", ["id"]).collect()}
        assert out[1] == 25.0   # (20+30)/2
        assert out[2] == 20.0   # (10+30)/2
        assert out[3] == 15.0
        assert out[4] is None   # singleton category


class TestDecisionStump:
    def test_perfect_split(self, spark):
        from vivace_graph_v3_spark.operators.features import (
            decision_stump_split)

        # label TRUE iff v <= 5: threshold 5 separates perfectly
        rows = [(v, v <= 5) for v in range(1, 11)] * 3
        df = spark.createDataFrame(rows, "v int, y boolean")
        r = decision_stump_split(df, "v", "y").first()
        assert r["threshold"] == 5
        assert r["gini"] == 0.0
        assert r["n_left"] == 15 and r["n_pos_left"] == 15
        assert r["n_right"] == 15 and r["n_pos_right"] == 0

    def test_tie_breaks_to_smallest_threshold(self, spark):
        from vivace_graph_v3_spark.operators.features import (
            decision_stump_split)

        # constant label: every split has equal (zero-info) score ->
        # smallest threshold wins
        rows = [(v, True) for v in range(1, 6)]
        df = spark.createDataFrame(rows, "v int, y boolean")
        assert decision_stump_split(df, "v", "y").first()["threshold"] == 1


def test_isotropy_of_orthonormal_basis(spark):
    """n vectors forming +/- pairs along axes: mean unit vector is 0 ->
    perfectly isotropic; all vectors along ONE axis -> mean_unit_norm 1."""
    from vivace_graph_v3_spark.pipeline.similarity import (
        embedding_isotropy)

    dim = 4
    balanced = []
    for i in range(dim):
        v = [0.0] * dim
        v[i] = 1.0
        w = [0.0] * dim
        w[i] = -1.0
        balanced.append((2 * i, v))
        balanced.append((2 * i + 1, w))
    df = spark.createDataFrame(balanced, "vec_id long, embedding array<float>")
    r = embedding_isotropy(df).first()
    assert r["mean_unit_norm"] == 0.0 and r["isotropy"] == 1.0
    assert r["n_vectors"] == 8 and r["dims"] == 4

    aligned = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<float>")
    r2 = embedding_isotropy(aligned).first()
    assert r2["mean_unit_norm"] == 1.0 and r2["isotropy"] == 0.0


class TestRichClub:
    def test_complete_core_with_pendant_leaves(self, spark):
        """K4 among a,b,c,d plus 5 leaves on a. Degrees: a=8, b=c=d=3,
        leaves=1. Club(k=2) = {a,b,c,d} -> 6 edges, phi = 1.0 (K4 fully
        connected); club(k=3) = {a} -> phi undefined."""
        from tests.test_graph_algorithms import _graph
        from vivace_graph_v3_spark.operators.graph_algorithms import (
            rich_club_coefficient)

        core = ["a", "b", "c", "d"]
        vertices = core + [f"l{i}" for i in range(5)]
        edges = [(x, y, 1) for xi, x in enumerate(core)
                 for y in core[xi + 1:]] + \
                [("a", f"l{i}", 1) for i in range(5)]
        g = _graph(spark, vertices, edges)
        out = {r["k"]: r for r in
               rich_club_coefficient(g, [2, 3]).collect()}
        assert out[2]["n_club"] == 4 and out[2]["n_club_edges"] == 6
        assert out[2]["phi_ppm"] == 1_000_000
        assert out[3]["n_club"] == 1 and out[3]["phi_ppm"] is None

    def test_phi_ppm_integer_div_exact_at_scale(self, spark):
        """ADVICE r6: phi_ppm must be BIGINT `div`, never floor of a
        double quotient — past n_club*(n_club-1) ~ 2^32 a remainder
        smaller than half an ulp can round the double up across an
        integer. Assert Spark's `div` agrees with Python's exact //
        on club sizes where the double mantissa is already saturated."""
        cases = [(131_079, 17_182_233_162 // 2_000_000 * 131  # arbitrary
                  ), (1_048_577, 123_456_789_012),
                 (2_000_003, 987_654_321_987)]
        rows = [(int(n), int(e)) for n, e in cases]
        df = spark.createDataFrame(rows, "n_club long, n_club_edges long")
        got = {r["n_club"]: r["phi"] for r in df.selectExpr(
            "n_club",
            "(2 * n_club_edges * 1000000) div (n_club * (n_club - 1)) "
            "AS phi").collect()}
        for n, e in rows:
            assert got[n] == (2 * e * 1_000_000) // (n * (n - 1))


class TestCuped:
    def test_perfect_covariate_kills_variance(self, spark):
        """post = pre exactly: theta = 1, adjusted means equal the grand
        mean of post in every arm, var_ratio = 0."""
        from vivace_graph_v3_spark.operators.product_analytics import (
            cuped_adjusted_report)

        rows = [(i % 2, 100 + i * 7, 100 + i * 7) for i in range(200)]
        df = spark.createDataFrame(rows, "arm int, pre long, post long")
        out = {r["arm"]: r for r in cuped_adjusted_report(df).collect()}
        grand = sum(100 + i * 7 for i in range(200)) / 200
        for arm in (0, 1):
            assert abs(out[arm]["theta"] - 1.0) < 1e-9
            assert abs(out[arm]["cuped_mean"] - round(grand, 6)) < 1e-6
            assert abs(out[arm]["var_ratio"]) < 1e-9

    def test_useless_covariate_changes_nothing(self, spark):
        """pre constant-ish orthogonal to post: theta ~ 0, adjusted mean
        ~ raw mean."""
        from vivace_graph_v3_spark.operators.product_analytics import (
            cuped_adjusted_report)

        # pre cycles with period 8, post with period 4: every (post
        # class, pre value) combination appears equally often, so
        # cov(pre, post) = 0 exactly -> theta = 0 -> no adjustment
        rows = [(i % 2, (i // 4) % 2, [10, 20, 30, 40][i % 4])
                for i in range(400)]
        df = spark.createDataFrame(rows, "arm int, pre long, post long")
        out = cuped_adjusted_report(df).collect()
        for r in out:
            assert r["theta"] == 0.0
            assert r["cuped_mean"] == r["raw_mean"]


class TestChecksumManifest:
    def test_partition_and_order_invariant(self, spark):
        from vivace_graph_v3_spark.operators.integrity import (
            replica_checksum_manifest)

        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1000)], "k long, v string")
        a = sorted(map(tuple, replica_checksum_manifest(
            df, "k", ["k", "v"], n_buckets=8).collect()))
        b = sorted(map(tuple, replica_checksum_manifest(
            df.repartition(13).sortWithinPartitions("v"), "k", ["k", "v"],
            n_buckets=8).collect()))
        assert a == b and len(a) == 8

    def test_detects_single_cell_divergence(self, spark):
        from pyspark.sql import functions as F

        from vivace_graph_v3_spark.operators.integrity import (
            replica_checksum_manifest)

        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(1000)], "k long, v string")
        tampered = df.withColumn(
            "v", F.when(F.col("k") == 537, "vX").otherwise(F.col("v")))
        a = {r["bucket"]: r["checksum"] for r in
             replica_checksum_manifest(df, "k", ["k", "v"]).collect()}
        b = {r["bucket"]: r["checksum"] for r in
             replica_checksum_manifest(tampered, "k", ["k", "v"]).collect()}
        diff = [k for k in a if a[k] != b[k]]
        assert diff == [537 % 64]


def test_split_leakage_by_group_is_zero_by_row_is_not(spark):
    from vivace_graph_v3_spark.operators.quality import split_leakage_audit

    rows = [(i, i % 40) for i in range(2000)]  # 40 groups x 50 rows
    df = spark.createDataFrame(rows, "row_id long, grp long")
    out = {r["scheme"]: r for r in
           split_leakage_audit(df, "grp", "row_id").collect()}
    assert out["by_group"]["n_leaky_groups"] == 0
    assert out["by_row"]["n_leaky_groups"] > 30  # 50 rows/group, 3 folds
    assert out["by_group"]["n_rows"] == out["by_row"]["n_rows"] == 2000
    assert out["by_group"]["n_groups"] == 40


class TestSkyline:
    def test_hand_computed_frontier(self, spark):
        from vivace_graph_v3_spark.operators.stats import skyline_2d

        # (cost, value): frontier = (1,5), (3,7), (6,9); (2,4) dominated
        # by (1,5); (3,6) dominated by (3,7); (7,9) dominated by (6,9);
        # duplicate frontier point (3,7) counted twice
        rows = [(1, 5), (2, 4), (3, 7), (3, 7), (3, 6), (6, 9), (7, 9)]
        df = spark.createDataFrame(rows, "cost long, val long")
        out = sorted(map(tuple, skyline_2d(df, "cost", "val").collect()))
        assert out == [(1, 5, 1), (3, 7, 2), (6, 9, 1)]

    def test_monotone_and_undominated(self, spark):
        """Property: frontier is strictly increasing in BOTH dims when
        sorted by cost, and no input point dominates any frontier point."""
        from vivace_graph_v3_spark.operators.stats import skyline_2d

        rows = [((i * 37) % 100, (i * 53) % 100) for i in range(500)]
        df = spark.createDataFrame(rows, "cost long, val long")
        sky = sorted((r["cost"], r["val"])
                     for r in skyline_2d(df, "cost", "val").collect())
        for (c1, v1), (c2, v2) in zip(sky, sky[1:]):
            assert c1 < c2 and v1 < v2
        for c, v in rows:
            for sc, sv in sky:
                assert not (c <= sc and v >= sv and (c < sc or v > sv)), \
                    f"({c},{v}) dominates frontier point ({sc},{sv})"


def test_conformal_coverage_hits_guarantee(spark):
    """Split-conformal guarantee: coverage >= 1 - alpha in expectation;
    with exchangeable folds and 2000 rows the empirical coverage must
    land near 90% (and qhat must be a real calibration residual)."""
    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.operators.stats_inference import (
        split_conformal_report)

    rows = [(i, 50 + (i * 17) % 100, 100.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, y long, yhat double")
    r = split_conformal_report(df, "y", "yhat", "k", alpha=0.1).first()
    assert r["n_cal"] + r["n_test"] == 2000
    assert 850_000 <= r["coverage_ppm"] <= 980_000
    assert r["target_ppm"] == 900_000
    # determinism under repartition
    r2 = split_conformal_report(df.repartition(7), "y", "yhat", "k",
                                alpha=0.1).first()
    assert r == r2
