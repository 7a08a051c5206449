"""rollup_cascade: every cascaded level must equal aggregating raw directly."""

import random

import pytest
from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.rollup import rollup_cascade


@pytest.fixture(scope="module")
def spark():
    from vivace_graph_v3_spark.session import get_spark

    return get_spark("test-rollup")


def test_cascade_matches_direct(spark):
    rng = random.Random(11)
    rows = [(rng.randint(0, 10_000), rng.choice("xy"), rng.uniform(-5, 5))
            for _ in range(2000)]
    df = spark.createDataFrame(rows, ["ts", "k", "v"])
    widths = [10, 100, 1000]
    levels = rollup_cascade(df, ts_col="ts", value_col="v",
                            group_cols=["k"], widths=widths)
    for w, lvl in zip(widths, levels):
        direct = (df.groupBy((F.expr(f"ts div {w}") * w).alias("bucket_start"),
                             "k")
                  .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"),
                       F.min("v").alias("min_v"), F.max("v").alias("max_v")))
        got = {(r["bucket_start"], r["k"]):
               (r["n"], round(r["sum_v"], 9), r["min_v"], r["max_v"])
               for r in lvl.collect()}
        want = {(r["bucket_start"], r["k"]):
                (r["n"], round(r["sum_v"], 9), r["min_v"], r["max_v"])
                for r in direct.collect()}
        assert got == want


def test_cascade_validates_widths(spark):
    df = spark.createDataFrame([(1, 1.0)], ["ts", "v"])
    with pytest.raises(ValueError):
        rollup_cascade(df, ts_col="ts", value_col="v", widths=[100, 10])
    with pytest.raises(ValueError):
        rollup_cascade(df, ts_col="ts", value_col="v", widths=[10, 25])
