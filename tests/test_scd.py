"""SCD2 dimension builder: run compression, validity intervals,
point-in-time lookup."""

from vivace_graph_v3_spark.operators.scd import scd2_build, scd2_lookup


def _dim(spark):
    rows = [
        (1, 0, 100, "a"), (1, 1, 101, "a"),   # restated: compresses
        (1, 2, 102, "b"), (1, 3, 103, "a"),   # a -> b -> back to a
        (2, 5, 200, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, t long, event_id long, attr string")
    return scd2_build(df, "user_id", "t", ["attr"],
                      tiebreak_cols=["event_id"])


def test_scd2_runs_and_intervals(spark):
    got = {(r.user_id, r.version): (r.attr, r.valid_from, r.valid_to,
                                    r.is_current)
           for r in _dim(spark).collect()}
    assert got[(1, 1)] == ("a", 0, 2, False)     # restatement compressed
    assert got[(1, 2)] == ("b", 2, 3, False)
    assert got[(1, 3)] == ("a", 3, None, True)   # value may recur as a new run
    assert got[(2, 1)] == ("x", 5, None, True)
    assert len(got) == 4


def test_scd2_point_in_time(spark):
    dim = _dim(spark)
    at2 = {r.user_id: r.attr
           for r in scd2_lookup(dim, 2, ts_from="valid_from").collect()}
    assert at2 == {1: "b"}                       # t=2: user 1 is 'b', user 2 absent
    at9 = {r.user_id: r.attr
           for r in scd2_lookup(dim, 9, ts_from="valid_from").collect()}
    assert at9 == {1: "a", 2: "x"}
