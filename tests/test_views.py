"""View semantics vs DuckDB oracle — mirrors tests/view-tests.lisp:34-236
(map/reduce views, sort orders, range scans, paging, grand totals)."""

from pyspark.sql import functions as F

from tests.conftest import rows_set, duck_set
from vivace_graph_v3_spark.views import (
    def_view, invoke_graph_view, map_view, map_reduced_view)


def _views():
    # view_customer_segment: map-only, key = c_mktsegment (F2's
    # view_customer_email analog over TESTDATA)
    def_view("customer", "by_segment",
             lambda df: df.select("id", F.col("c_mktsegment").alias("key"),
                                  F.col("c_name").alias("value")))
    # popularity: map-reduce over 'contains' edges: yield (part, qty); sum
    # (F2's view_likes_popularity, example.lisp:65-72), descending
    def_view("contains", "part_popularity",
             lambda df: df.select("id", F.col("dst").alias("key"),
                                  F.col("weight").alias("value")),
             kind="edge", reduce_agg=F.sum("value"), order="greaterp")


def test_map_view_key_lookup(tpch, duck):
    _views()
    df = invoke_graph_view(tpch, "customer", "by_segment", key="BUILDING")
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey, c_mktsegment, c_name FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """)
    assert rows_set(df) == want


def test_map_view_range_and_paging(tpch, duck):
    _views()
    df = map_view(tpch, "customer", "by_segment",
                  start_key="AUTOMOBILE", end_key="FURNITURE", skip=3, count=7)
    want = duck_set(duck, """
        SELECT * FROM (
          SELECT 'customer:'||c_custkey AS id, c_mktsegment AS key,
                 c_name AS value
          FROM customer WHERE c_mktsegment BETWEEN 'AUTOMOBILE' AND 'FURNITURE'
          ORDER BY key, id LIMIT 7 OFFSET 3)
    """)
    assert rows_set(df) == want


def test_reduce_view_groups(tpch, duck):
    _views()
    df = invoke_graph_view(tpch, "contains", "part_popularity", group_p=True)
    want = duck_set(duck, """
        SELECT 'part:'||l_partkey AS key, sum(l_quantity) AS value
        FROM lineitem GROUP BY 1
    """, round_floats=6)
    assert rows_set(df, round_floats=6) == want


def test_reduce_view_single_key(tpch, duck):
    _views()
    (k,) = duck.execute(
        "SELECT 'part:'||l_partkey FROM lineitem GROUP BY 1 ORDER BY 1 LIMIT 1"
    ).fetchone()
    df = invoke_graph_view(tpch, "contains", "part_popularity",
                           group_p=True, key=k)
    want = duck_set(duck, f"""
        SELECT 'part:'||l_partkey AS key, sum(l_quantity) AS value
        FROM lineitem WHERE 'part:'||l_partkey = '{k}' GROUP BY 1
    """, round_floats=6)
    assert rows_set(df, round_floats=6) == want


def test_reduce_view_grand_total(tpch, duck):
    _views()
    df = invoke_graph_view(tpch, "contains", "part_popularity")
    (want,) = duck.execute("SELECT sum(l_quantity) FROM lineitem").fetchone()
    got = df.collect()[0][0]
    assert abs(got - want) < 1e-6


def test_greaterp_descending_paging(tpch, duck):
    _views()
    # :greaterp = descending by KEY with paging (views.lisp:313-329 contract)
    df = map_reduced_view(tpch, "contains", "part_popularity", skip=2, count=5)
    got = [(r["key"], round(r["value"], 6)) for r in df.collect()]
    want = [(k, round(v, 6)) for k, v in duck.execute("""
        SELECT 'part:'||l_partkey AS key, sum(l_quantity) AS v
        FROM lineitem GROUP BY 1 ORDER BY key DESC LIMIT 5 OFFSET 2
    """).fetchall()]
    assert got == want
