"""vivace_graph_v3_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of kraison/vivace-graph-v3.

The reference (/root/reference) is a Common Lisp property-graph database with
a Prolog query language, incremental map-reduce views, BFS traversal, a
geohash spatial index, MVCC transactions and replication. This package
re-expresses those *semantics* Spark-first:

- property graph      -> typed vertex/edge DataFrames (graph.py, schema.py)
- Prolog ``select``   -> a goal-list query builder compiling conjunctive
                         queries to DataFrame plans (query/builder.py)
- map-reduce views    -> materialized DataFrames + groupBy aggregates (views.py)
- BFS ``traverse``    -> iterative frontier joins (operators/traverse.py)
- geohash spatial     -> pure-python geohash lib + cell-join strategies
                         (functions/geohash.py, operators/spatial.py)
- txn log / MVCC      -> append-only change-log tables, epoch-gated snapshot
                         reads, Structured Streaming replication (mvcc.py,
                         streaming/)
- REST layer          -> stdlib http.server control plane over MVCC commits,
                         named queries and the JSON pattern DSL (rest.py)
- plus large-scale training-data pipeline operators: dedup (exact/MinHash-LSH/
  SimHash/ngram-Jaccard/embedding), ANN similarity search, text analysis,
  multimodal column plumbing (pipeline/).

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join selection and AQE; Python UDFs appear only where Spark has no built-in
(geohash encode, point-in-polygon refine, multimodal decode stubs).
"""

from vivace_graph_v3_spark.schema import SchemaRegistry, def_vertex, def_edge
from vivace_graph_v3_spark.graph import GraphStore, load_tpch_graph

__all__ = [
    "SchemaRegistry",
    "def_vertex",
    "def_edge",
    "GraphStore",
    "load_tpch_graph",
]

__version__ = "0.1.0"
