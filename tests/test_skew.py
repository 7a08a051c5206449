"""Skew mitigation rewrites preserve semantics and actually spread keys."""

from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.skew import (
    salted_join, two_phase_distinct)


def _skewed(spark, n_hot=5000, n_cold=50):
    hot = spark.range(n_hot).select(F.lit(1).alias("k"),
                                    F.col("id").alias("payload"))
    cold = spark.range(n_cold).select((F.col("id") + 2).alias("k"),
                                      F.col("id").alias("payload"))
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(1, "hot"), (2, "miss"), (10, "cold")], ["k", "label"])
    plain = {(r.k, r.payload, r.label)
             for r in left.join(right, ["k"]).collect()}
    salted = {(r.k, r.payload, r.label)
              for r in salted_join(left, right, ["k"], salts=8).collect()}
    assert salted == plain and len(salted) == 5002
    # left join keeps unmatched skewed rows exactly once
    pl = left.join(right, ["k"], "left").count()
    sl = salted_join(left, right, ["k"], salts=8, how="left").count()
    assert pl == sl
    # the hot key's rows really carry multiple salt values
    nsalts = (left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(8)))
        .filter(F.col("k") == 1).select("__salt").distinct().count())
    assert nsalts == 8


def test_two_phase_distinct_equals_count_distinct(spark):
    df = _skewed(spark).withColumn("v", F.col("payload") % 97)
    want = {(r.k, r.n) for r in
            df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    got = {(r.k, r.n_distinct) for r in
           two_phase_distinct(df, ["k"], "v").collect()}
    assert got == want


def test_two_phase_distinct_null_semantics_match_count_distinct(spark):
    """countDistinct ignores NULL values; keys whose values are all NULL
    report 0 (ADVICE r3: a kept (key, NULL) row was off-by-one per key)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None), ("c", 3), ("c", 3)],
        "k string, v int")
    want = {(r.k, r.n) for r in
            df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    got = {(r.k, r.n_distinct) for r in
           two_phase_distinct(df, ["k"], "v").collect()}
    assert got == want
    assert ("a", 2) in got and ("b", 0) in got


def test_key_skew_profile_hand_case(spark):
    from vivace_graph_v3_spark.operators.skew import key_skew_profile

    # keys: a x6, b x2, c x1, d x1 -> n_rows 10, n_keys 4, max 6,
    # fanout grid {1:2, 2:1, 6:1}: p50 = min c with cum*2>=4 -> 1
    # (cum at c=1 is 2, 2*2>=4), p99 = 6, top1 share = 600000
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, "k").first()
    assert (r.n_rows, r.n_keys, r.max_per_key) == (10, 4, 6)
    assert (r.p50_per_key, r.p99_per_key) == (1, 6)
    assert r.top1_share_ppm == 600000


class TestRankedTwoPhase:
    def test_equals_direct_window(self, spark):
        import random
        from pyspark.sql import Window
        from vivace_graph_v3_spark.operators.skew import ranked_two_phase
        rnd = random.Random(3)
        rows = [(i, rnd.randint(0, 50)) for i in range(500)]
        df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
        got = {r["id"]: r["rank"]
               for r in ranked_two_phase(df, ["v", "id"],
                                         num_partitions=6).collect()}
        w = Window.orderBy("v", "id")
        want = {r["id"]: r["rk"]
                for r in df.withColumn("rk", F.row_number().over(w))
                .collect()}
        assert got == want

    def test_no_global_funnel_on_data_path(self, spark):
        from vivace_graph_v3_spark.operators.skew import ranked_two_phase
        from vivace_graph_v3_spark.plans import plan_facts
        df = spark.range(0, 20_000).select(
            F.col("id"), (F.col("id") * 37 % 1000).alias("v"))
        out = ranked_two_phase(df, ["v", "id"], num_partitions=8)
        out.collect()
        f = plan_facts(out)
        # the corpus ranks through rangepartitioning (parallel windows);
        # the only SinglePartition exchange is the |partitions|-row
        # offsets frame
        assert "rangepartitioning" in f.plan.lower()
        assert f.single_partition_exchanges <= 1
