"""asof_join vs pandas.merge_asof (the de-facto semantics reference)."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def spark():
    from vivace_graph_v3_spark.session import get_spark

    return get_spark("test-asof")


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_asof_basic_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(20)), (3, "b", _ts(5))],
        ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [("a", _ts(10), 1.0), ("a", _ts(15), 2.0), ("b", _ts(6), 9.0)],
        ["k", "ts", "v"])
    got = {r["event_id"]: (r["ts_asof"], r["v_asof"])
           for r in asof_join(left, right, on="k").collect()}
    assert got[1] == (_ts(10), 1.0)          # equal ts matches (inclusive)
    assert got[2] == (_ts(15), 2.0)          # latest before
    assert got[3] == (None, None)            # nothing at or before


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, "a", _ts(60))], ["event_id", "k", "ts"])
    right = spark.createDataFrame([("a", _ts(10), 5.0)], ["k", "ts", "v"])
    with_tol = asof_join(left, right, on="k",
                         tolerance=F.expr("INTERVAL 10 MINUTES")).first()
    no_tol = asof_join(left, right, on="k").first()
    assert with_tol["v_asof"] is None and no_tol["v_asof"] == 5.0


def test_asof_matches_pandas_random(spark):
    rng = random.Random(7)
    lrows = [(i, rng.choice("abc"), _ts(rng.randint(0, 500)))
             for i in range(200)]
    rrows = [(rng.choice("abc"), _ts(m), float(m))
             for m in rng.sample(range(0, 500), 120)]
    # one right row per (k, ts) so both engines are deterministic
    rrows = list({(k, t): (k, t, v) for k, t, v in rrows}.values())
    left = spark.createDataFrame(lrows, ["event_id", "k", "ts"])
    right = spark.createDataFrame(rrows, ["k", "ts", "v"])
    got = {r["event_id"]: r["v_asof"]
           for r in asof_join(left, right, on="k").collect()}

    lp = pd.DataFrame(lrows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in want.iterrows():
        w = None if pd.isna(row["v"]) else row["v"]
        assert got[row["event_id"]] == w, row["event_id"]
