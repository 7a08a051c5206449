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
