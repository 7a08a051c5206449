"""Tests for operators/quality.py and the round-6 sampling/inference
operators (Poisson bootstrap, Neyman allocation, hash folds)."""

import pyspark.sql.functions as F
import pytest


class TestExpectationAudit:
    def test_counts_and_null_is_violation(self, spark):
        from vivace_graph_v3_spark.operators.quality import (
            expectation_audit)

        df = spark.createDataFrame(
            [(1, 10), (2, -5), (3, None), (4, 50)], "id int, v int")
        out = {r["rule"]: r for r in expectation_audit(df, {
            "v_positive": F.col("v") > 0,
            "id_present": F.col("id").isNotNull(),
        }).collect()}
        assert out["v_positive"]["n_checked"] == 4
        # -5 violates; NULL comparison is unknown -> violation
        assert out["v_positive"]["n_violations"] == 2
        assert out["v_positive"]["pass"] is False
        assert out["id_present"]["n_violations"] == 0
        assert out["id_present"]["pass"] is True

    def test_single_scan(self, spark):
        """All rules fold into ONE aggregate of one scan of the table."""
        from vivace_graph_v3_spark.operators.quality import (
            expectation_audit)

        df = spark.range(100).select(F.col("id").alias("v"))
        out = expectation_audit(df, {f"r{i}": F.col("v") >= i
                                     for i in range(6)})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ") <= 1

    def test_referential_orphans_and_nulls(self, spark):
        from vivace_graph_v3_spark.operators.quality import (
            referential_violations)

        child = spark.createDataFrame(
            [(1,), (2,), (9,), (None,)], "k int")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
        r = referential_violations(child, parent, "k", "k").first()
        assert r["n_checked"] == 4
        assert r["n_violations"] == 2  # orphan 9 + NULL key
        assert r["pass"] is False


class TestPoissonBootstrap:
    def test_deterministic_and_brackets_mean(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            poisson_bootstrap_ci)

        df = spark.createDataFrame([(i, 100 + (i * 7) % 50)
                                    for i in range(500)], "k int, v int")
        a = poisson_bootstrap_ci(df, "v", key_col="k").first()
        b = poisson_bootstrap_ci(df.repartition(7), "v",
                                 key_col="k").first()
        assert a == b  # partition-layout invariant
        assert a["n_replicates"] == 200
        assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
        # CI width for n=500 of a bounded variable is modest
        assert (a["ci_hi"] - a["ci_lo"]) < 10

    def test_ci_narrows_with_n(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            poisson_bootstrap_ci)

        small = spark.createDataFrame([(i, 100 + (i * 7) % 50)
                                       for i in range(50)], "k int, v int")
        big = spark.createDataFrame([(i, 100 + (i * 7) % 50)
                                     for i in range(5000)], "k int, v int")
        ws = poisson_bootstrap_ci(small, "v", key_col="k").first()
        wb = poisson_bootstrap_ci(big, "v", key_col="k").first()
        assert (wb["ci_hi"] - wb["ci_lo"]) < (ws["ci_hi"] - ws["ci_lo"])


class TestNeymanAllocation:
    def test_proportional_to_n_times_std(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            neyman_allocation)

        # stratum a: 100 rows alternating 0/10 (std~5.02); stratum b:
        # 100 rows constant 5 except one 6 (tiny std) -> nearly the whole
        # budget goes to a
        rows = [("a", 10 * (i % 2)) for i in range(100)] + \
               [("b", 5 if i else 6) for i in range(100)]
        df = spark.createDataFrame(rows, "s string, v int")
        out = {r["stratum"]: r for r in
               neyman_allocation(df, "s", "v", 100).collect()}
        assert out["a"]["alloc"] + out["b"]["alloc"] == 100
        assert out["a"]["alloc"] >= 95
        assert out["a"]["n_stratum"] == 100

    def test_sums_to_budget_with_remainders(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            neyman_allocation)

        rows = [(f"s{i % 7}", (i * 13) % 40) for i in range(700)]
        df = spark.createDataFrame(rows, "s string, v int")
        total = (neyman_allocation(df, "s", "v", 123)
                 .agg(F.sum("alloc")).first()[0])
        assert total == 123


class TestHashFolds:
    def test_stable_bounded_and_grouped(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            hash_fold_assignment)

        df = spark.createDataFrame([(i % 50, i) for i in range(500)],
                                   "g int, row int")
        out = df.withColumn("f", hash_fold_assignment("g", n_folds=5))
        assert out.filter((F.col("f") < 0) | (F.col("f") >= 5)).count() == 0
        # all rows of a group share its fold (leakage-safe split)
        assert (out.groupBy("g").agg(F.countDistinct("f").alias("d"))
                .filter(F.col("d") > 1).count()) == 0
        # deterministic across computations
        again = df.withColumn("f", hash_fold_assignment("g"))
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, again.collect()))
