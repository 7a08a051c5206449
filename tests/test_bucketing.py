"""Bucketed-layout joins: shuffle paid at write time, zero exchange after."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.operators.bucketing import (
    assert_no_shuffle_join, bucketed_join, write_bucketed)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    old = spark.conf.get("spark.sql.warehouse.dir", None)
    # managed tables land in the session warehouse; point it at a tmp dir
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed_t LOCATION '{wh}'")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "bucketed_t.orders_b", ["o_orderkey"], buckets=8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "bucketed_t.lineitem_b", ["o_orderkey"], buckets=8)
    yield spark
    spark.sql("DROP DATABASE bucketed_t CASCADE")


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    # force the merge-join path (at test SF the tables are broadcast-small,
    # which would trivially have no exchange)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bucketed_t.orders_b",
                          "bucketed_t.lineitem_b", ["o_orderkey"])
        j.count()
        plan = assert_no_shuffle_join(j)
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # same result as the plain parquet join
    plain = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
             .join(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
                   F.col("o_orderkey") == F.col("l_orderkey")).count())
    assert j.count() == plain


def test_bucketed_aggregate_no_exchange(bucketed):
    spark = bucketed
    agg = (spark.table("bucketed_t.lineitem_b")
           .groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
