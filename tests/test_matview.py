"""Tests for plans/matview.py — summary-catalog rollup answering:
correctness vs the base computation, covering/fallback decisions,
coarsest-grid selection, and the no-base-scan plan guarantee."""

import tempfile

from pyspark.sql import functions as F

from vivace_graph_v3_spark.plans.matview import (
    AggSpec, SummaryCatalog)


def _base_df(spark):
    rows = [("US", "A", 2020, 10), ("US", "A", 2020, 20),
            ("US", "B", 2021, 30), ("FR", "A", 2021, 40),
            ("FR", "B", 2020, 50), ("FR", "B", 2021, 60)]
    return spark.createDataFrame(rows, ["nation", "seg", "yr", "v"])


def _catalog(spark):
    cat = SummaryCatalog(spark)
    spec = cat.register(
        "fine", lambda sp: _base_df(sp), ["nation", "seg", "yr"],
        [AggSpec("sum", "v"), AggSpec("count"),
         AggSpec("min", "v"), AggSpec("max", "v")],
        tempfile.mkdtemp(prefix="mv_fine_"), assume_nonnull={"v"})
    cat.materialize(spec)
    return cat, spec


class TestRollupAnswer:
    def test_rollup_matches_base(self, spark):
        cat, _ = _catalog(spark)
        df, src = cat.answer(
            ["nation"],
            {"n": AggSpec("count"), "s": AggSpec("sum", "v"),
             "mx": AggSpec("max", "v"), "a": AggSpec("avg", "v")})
        assert src == "fine"
        got = {r["nation"]: r for r in df.collect()}
        assert got["US"]["n"] == 3 and got["US"]["s"] == 60
        assert got["US"]["mx"] == 30 and got["US"]["a"] == 20.0
        assert got["FR"]["s"] == 150 and got["FR"]["a"] == 50.0

    def test_grid_filter_pruning(self, spark):
        cat, _ = _catalog(spark)
        df, src = cat.answer([], {"s": AggSpec("sum", "v")},
                             filters={"seg": "B"})
        assert src == "fine"
        assert df.collect()[0]["s"] == 140

    def test_non_grid_filter_falls_back(self, spark):
        cat, _ = _catalog(spark)
        df, src = cat.answer(
            ["nation"], {"s": AggSpec("sum", "v")},
            filters={"v": 30}, base=lambda sp: _base_df(sp))
        assert src == "base"
        assert {r["nation"]: r["s"] for r in df.collect()} == {"US": 30}

    def test_uncovered_agg_falls_back(self, spark):
        cat, _ = _catalog(spark)
        # min over a column the grid never stored
        df, src = cat.answer(
            ["nation"], {"m": AggSpec("min", "yr")},
            base=lambda sp: _base_df(sp))
        assert src == "base"
        assert {r["nation"]: r["m"] for r in df.collect()} == \
            {"US": 2020, "FR": 2020}

    def test_coarsest_covering_grid_wins(self, spark):
        cat, _ = _catalog(spark)
        coarse = cat.register(
            "coarse", lambda sp: _base_df(sp), ["nation"],
            [AggSpec("sum", "v"), AggSpec("count")],
            tempfile.mkdtemp(prefix="mv_coarse_"))
        cat.materialize(coarse)
        _, src = cat.answer(["nation"], {"s": AggSpec("sum", "v")})
        assert src == "coarse"
        # but a seg-grouped query can only use the fine grid
        _, src = cat.answer(["seg"], {"s": AggSpec("sum", "v")})
        assert src == "fine"

    def test_answer_never_scans_base(self, spark):
        cat, spec = _catalog(spark)
        df, src = cat.answer(["seg"], {"s": AggSpec("sum", "v")})
        assert src == "fine"
        files = df.inputFiles()
        assert files and all(spec.path in f for f in files)

    def test_avg_is_sum_over_count_not_avg_of_avg(self, spark):
        # skewed grid: one cell n=1 v=100, one cell n=3 v=0 each
        rows = [("g", "x", 1, 100)] + [("g", "y", 1, 0)] * 3
        cat = SummaryCatalog(spark)
        spec = cat.register(
            "s", lambda sp: sp.createDataFrame(
                rows, ["k", "cell", "yr", "v"]), ["k", "cell"],
            [AggSpec("sum", "v"), AggSpec("count")],
            tempfile.mkdtemp(prefix="mv_avg_"), assume_nonnull={"v"})
        cat.materialize(spec)
        df, _ = cat.answer(["k"], {"a": AggSpec("avg", "v")})
        assert df.collect()[0]["a"] == 25.0  # avg-of-avg would say 50


class TestCountCol:
    """Regression (ADVICE r5): AggSpec('count', col) passed covers() but
    materialize() only ever wrote count(*), so answer() failed — and avg
    over a nullable column silently over-counted its denominator."""

    def _null_catalog(self, spark):
        rows = [("g", "x", 10), ("g", "x", None), ("g", "y", 30),
                ("g", "y", None), ("g", "y", 50)]
        cat = SummaryCatalog(spark)
        spec = cat.register(
            "nn", lambda sp: sp.createDataFrame(
                rows, "k string, cell string, v int"), ["k", "cell"],
            [AggSpec("sum", "v"), AggSpec("count", "v"), AggSpec("count")],
            tempfile.mkdtemp(prefix="mv_cnt_"))
        cat.materialize(spec)
        return cat

    def test_count_col_materializes_and_answers(self, spark):
        cat = self._null_catalog(spark)
        df, src = cat.answer(["k"], {"nv": AggSpec("count", "v"),
                                     "n": AggSpec("count")})
        assert src == "nn"
        row = df.collect()[0]
        assert row["nv"] == 3 and row["n"] == 5  # count(v) skips NULLs

    def test_avg_uses_nonnull_denominator(self, spark):
        cat = self._null_catalog(spark)
        df, src = cat.answer(["k"], {"a": AggSpec("avg", "v")})
        assert src == "nn"
        # F.avg semantics: (10+30+50)/3, not /5
        assert df.collect()[0]["a"] == 30.0

    def test_avg_refused_without_nonnull_opt_in(self, spark):
        """ADVICE r6: a summary storing sum(x) + count(*) but not
        count(x) must NOT silently answer avg(x) from the over-counting
        count_all denominator — without the explicit assume_nonnull
        opt-in it simply does not cover, and the answer comes from base
        with exact F.avg semantics."""
        import warnings

        rows = [("g", "x", 10), ("g", "x", None), ("g", "y", 30),
                ("g", "y", None), ("g", "y", 50)]

        def base(sp):
            return sp.createDataFrame(rows, "k string, cell string, v int")

        cat = SummaryCatalog(spark)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            spec = cat.register(
                "gap", base, ["k", "cell"],
                [AggSpec("sum", "v"), AggSpec("count")],
                tempfile.mkdtemp(prefix="mv_gap_"))
            assert any("assume_nonnull" in str(x.message) for x in w)
        cat.materialize(spec)
        assert not spec.covers(["k"], [AggSpec("avg", "v")], [])
        df, src = cat.answer(["k"], {"a": AggSpec("avg", "v")}, base=base)
        assert src == "base"
        assert df.collect()[0]["a"] == 30.0  # (10+30+50)/3, never /5
        # sum/count themselves still answer from the grid
        _, src = cat.answer(["k"], {"s": AggSpec("sum", "v")})
        assert src == "gap"

    def test_nonnull_opt_in_registers_without_warning(self, spark):
        import warnings

        cat = SummaryCatalog(spark)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cat.register(
                "ok", lambda sp: _base_df(sp), ["nation"],
                [AggSpec("sum", "v"), AggSpec("count")],
                tempfile.mkdtemp(prefix="mv_ok_"), assume_nonnull={"v"})
            assert not w

    def test_base_fallback_count_col_skips_nulls(self, spark):
        rows = [("g", 1), ("g", None), ("g", 3)]
        cat = SummaryCatalog(spark)
        df, src = cat.answer(
            ["k"], {"nv": AggSpec("count", "v")},
            base=lambda sp: sp.createDataFrame(rows, "k string, v int"))
        assert src == "base"
        assert df.collect()[0]["nv"] == 2
