"""One-pass table profiler."""

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


def test_profile_single_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one aggregate chain: Range appears exactly once
    assert plan.count("Range (0, 100") == 1
