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


def test_gap_fill_locf(spark):
    from datetime import datetime

    from vivace_graph_v3_spark.operators.rollup import gap_fill_locf

    ev = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 5)), ("a", datetime(2024, 1, 1, 9)),
         ("a", datetime(2024, 1, 4)),
         ("b", datetime(2024, 1, 3))],
        "event_type string, ts timestamp")
    got = {(r.event_type, r.day): (r.n_events, r.filled)
           for r in gap_fill_locf(ev).collect()}
    # calendar spans the global min..max day (2024-01-01 .. 2024-01-04)
    assert got[("a", "2024-01-01")] == (2, False)
    assert got[("a", "2024-01-02")] == (2, True)    # carried forward
    assert got[("a", "2024-01-03")] == (2, True)
    assert got[("a", "2024-01-04")] == (1, False)
    # b starts after the global lo: leading gap fills with 0
    assert got[("b", "2024-01-01")] == (0, True)
    assert got[("b", "2024-01-02")] == (0, True)
    assert got[("b", "2024-01-03")] == (1, False)
    assert got[("b", "2024-01-04")] == (1, True)
    assert len(got) == 8


def test_holt_forecast_hand_two_days(spark):
    from datetime import datetime

    from vivace_graph_v3_spark.operators.rollup import holt_forecast

    # counts [4, 8]: l0=4,b0=0; l1=0.5*8+0.5*4=6, b1=0.5*(6-4)=1
    rows = ([(datetime(2024, 1, 1, h), "e") for h in range(4)]
            + [(datetime(2024, 1, 2, h), "e") for h in range(8)])
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    r = holt_forecast(ev, horizon=7).first()
    assert r.n_days == 2
    assert (r.level_ppm, r.trend_ppm) == (6_000_000, 1_000_000)
    assert (r.forecast1_ppm, r.forecast7_ppm) == (7_000_000, 13_000_000)


def test_ohlc_resample_deterministic_ties(spark):
    from vivace_graph_v3_spark.operators.rollup import ohlc_resample

    # two events with IDENTICAL ts in one bucket: open/close break the
    # tie by event_id; high/low independent of order
    ns = 1_000_000_000
    rows = [
        ("a", 10 * ns, 1, 5.0),
        ("a", 10 * ns, 2, 7.0),   # same ts, higher id -> close
        ("a", 20 * ns, 3, 1.0),   # later ts but still same hour bucket
    ]
    df = spark.createDataFrame(rows, "event_type string, ts long, "
                                     "event_id long, value double")
    r = ohlc_resample(df).first()
    assert (r.n, r.open_cents, r.close_cents) == (3, 500, 100)
    assert (r.high_cents, r.low_cents) == (700, 100)
