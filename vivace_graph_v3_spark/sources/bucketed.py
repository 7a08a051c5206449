"""Bucketed graph storage: pre-shuffled tables for co-located joins.

The reference's VE/VEV adjacency indexes (ve-index.lisp, vev-index.lisp) make
edge-by-endpoint lookups O(1); the Spark analog at 100 TB is **bucketing**:
write vertices bucketed by ``id`` and edges bucketed by ``src`` (and a second
copy by ``dst`` when in-edges dominate), so a vertex-edge equi-join needs NO
exchange on either side — the join happens bucket-to-bucket.

This matters at scale: the per-query cost of `edges JOIN vertices ON src=id`
drops from two full shuffles to zero. It is the storage-level decision SURVEY
§7.0 defers to deployment; this module makes it concrete and testable.

Uses the session catalog (``saveAsTable`` — bucket metadata must live in a
table catalog; plain ``parquet(path)`` cannot carry it). Table names are
namespaced ``<prefix>_<kind>_<type>``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vivace_graph_v3_spark.graph import GraphStore
from vivace_graph_v3_spark.schema import SchemaRegistry


def _table(prefix: str, kind: str, type_name: str) -> str:
    return f"{prefix}_{kind}_{type_name}".replace("-", "_")


def save_bucketed_graph(graph: GraphStore, *, prefix: str = "g",
                        buckets: int = 32, edge_key: str = "src") -> None:
    """Write every vertex table bucketed by id and every edge table bucketed
    by ``edge_key``, both sorted within buckets (sorted buckets additionally
    enable merge-joins without sort)."""
    for t in graph.vertex_types():
        (graph._vertices[t].write.mode("overwrite")
         .bucketBy(buckets, "id").sortBy("id")
         .saveAsTable(_table(prefix, "vertex", t)))
    for t in graph.edge_types():
        (graph._edges[t].write.mode("overwrite")
         .bucketBy(buckets, edge_key).sortBy(edge_key)
         .saveAsTable(_table(prefix, "edge", t)))


def load_bucketed_graph(spark: SparkSession, registry: SchemaRegistry, *,
                        prefix: str = "g",
                        has_tombstones: bool = False) -> GraphStore:
    """Reload a bucketed graph; joins on the bucket keys are exchange-free
    (verify with ``.explain``: no Exchange above the scans)."""
    g = GraphStore(spark, registry, name=f"bucketed:{prefix}",
                   has_tombstones=has_tombstones)
    for nt in registry.types("vertex"):
        name = _table(prefix, "vertex", nt.name)
        if spark.catalog.tableExists(name):
            g.add_vertices(nt.name, spark.table(name))
    for nt in registry.types("edge"):
        name = _table(prefix, "edge", nt.name)
        if spark.catalog.tableExists(name):
            g.add_edges(nt.name, spark.table(name))
    return g
