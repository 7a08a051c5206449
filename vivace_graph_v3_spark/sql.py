"""SQL interface: expose a GraphStore as Spark SQL temp views.

The reference is queried through Prolog goals and a REST pattern DSL;
Spark's native query language is SQL, so an idiomatic port should let a
user point ``spark.sql`` at the graph directly. ``register_graph_views``
publishes, per type:

- ``<prefix>vertices_<type>``  — live vertices with their slot columns
- ``<prefix>edges_<type>``     — live edges (id, src, dst, weight, slots)
- ``<prefix>vertices`` / ``<prefix>edges`` — the all-type unions

Views are lazy logical plans over the store's current frames: they
inherit MVCC liveness semantics (deleted rows excluded), column pruning,
and pushdown exactly like the goal-list planner — SQL and ``select`` are
two front-ends over identical plans. Re-registering after commits
refreshes the snapshot.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vivace_graph_v3_spark.graph import GraphStore


def register_graph_views(graph: GraphStore, *, prefix: str = "") -> list[str]:
    """Create/replace the temp views for ``graph``; returns the view
    names registered."""
    names: list[str] = []
    for vt in graph.vertex_types():
        name = f"{prefix}vertices_{vt}"
        graph.scan_vertices(vt).createOrReplaceTempView(name)
        names.append(name)
    for et in graph.edge_types():
        name = f"{prefix}edges_{et}"
        graph.active_edges(et).createOrReplaceTempView(name)
        names.append(name)
    graph.scan_vertices().createOrReplaceTempView(f"{prefix}vertices")
    graph.active_edges().createOrReplaceTempView(f"{prefix}edges")
    names += [f"{prefix}vertices", f"{prefix}edges"]
    return names


def sql(graph: GraphStore, query: str, *, prefix: str = ""):
    """Convenience: register (or refresh) the views and run ``query``."""
    register_graph_views(graph, prefix=prefix)
    spark: SparkSession = graph.spark
    return spark.sql(query)
