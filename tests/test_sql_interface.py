"""SQL front-end over the graph store."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.entry_queries import load_tpch_graph
from vivace_graph_v3_spark.sql import register_graph_views, sql


def test_views_match_scans_and_respect_liveness(spark):
    g = load_tpch_graph(spark, SF_DIR)
    names = register_graph_views(g, prefix="t_")
    assert "t_vertices_customer" in names and "t_edges" in names
    assert (spark.table("t_vertices_customer").count()
            == g.scan_vertices("customer").count())
    # union views cover every type
    per_type = sum(g.scan_vertices(t).count() for t in g.vertex_types())
    assert spark.table("t_vertices").count() == per_type


def test_sql_equals_goal_list_plan(spark):
    from vivace_graph_v3_spark.query import select
    g = load_tpch_graph(spark, SF_DIR)
    df = sql(g, """
        SELECT e.dst AS nation, count(*) AS n
        FROM vertices_customer c JOIN edges_in_nation e ON e.src = c.id
        GROUP BY e.dst
    """)
    goal = (select(g, ["?n"], [("is-a", "?c", "customer"),
                              ("in_nation", "?c", "?n")])
            .groupBy(F.col("n").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n")))
    assert ({(r.nation, r.n) for r in df.collect()}
            == {(r.nation, r.n) for r in goal.collect()})
