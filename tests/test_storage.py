"""Bucketed storage + salted join tests: bucketed vertex-edge joins must plan
without an Exchange on the bucketed sides; salted joins must return exactly
the plain-join result."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from vivace_graph_v3_spark.graph import GraphStore
from vivace_graph_v3_spark.schema import SchemaRegistry
from vivace_graph_v3_spark.sources import (
    load_bucketed_graph, save_bucketed_graph,
)
from vivace_graph_v3_spark.util import salted_join


@pytest.fixture()
def small_graph(spark):
    reg = SchemaRegistry()
    reg.def_vertex("node", {"v": T.LongType()})
    reg.def_edge("link")
    g = GraphStore(spark, reg, name="b", has_tombstones=False)
    n = 1000
    g.add_vertices("node", spark.range(n).select(
        F.concat(F.lit("n"), "id").alias("id"), F.lit("node").alias("type"),
        F.lit(False).alias("deleted"), F.lit(0).cast("long").alias("revision"),
        F.lit(0).cast("long").alias("commit_epoch"), F.col("id").alias("v")))
    g.add_edges("link", spark.range(n - 1).select(
        F.concat(F.lit("e"), "id").alias("id"), F.lit("link").alias("type"),
        F.lit(False).alias("deleted"), F.lit(0).cast("long").alias("revision"),
        F.lit(0).cast("long").alias("commit_epoch"),
        F.concat(F.lit("n"), "id").alias("src"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight")))
    return g


def test_bucketed_join_has_no_exchange(spark, small_graph):
    save_bucketed_graph(small_graph, prefix="tb", buckets=8)
    try:
        g2 = load_bucketed_graph(spark, small_graph.registry, prefix="tb")
        edges = g2.scan_edges("link", columns=["src", "dst"])
        verts = g2.scan_vertices("node", columns=["id", "v"])
        joined = edges.join(verts.withColumnRenamed("id", "src"), "src")
        assert joined.count() == 999
        # disable broadcast so the plan must choose a co-located join; the
        # bucketed sides must not re-shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
        assert "Exchange" not in plan, plan
    finally:
        for t in ("tb_vertex_node", "tb_edge_link"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_salted_join_matches_plain(spark):
    left = spark.range(10_000).select(
        (F.col("id") % 5).cast("string").alias("k"), F.col("id").alias("x"))
    right = spark.createDataFrame(
        [(str(i), i * 100) for i in range(5)], "k string, y long")
    plain = left.join(right, "k").agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")).first()
    salted = salted_join(left, right, "k", salt=8).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")).first()
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([("a", 1), ("zz", 2)], "k string, x long")
    right = spark.createDataFrame([("a", 10)], "k string, y long")
    rows = {(r["k"], r["y"]) for r in
            salted_join(left, right, "k", salt=4, how="left").collect()}
    assert rows == {("a", 10), ("zz", None)}
