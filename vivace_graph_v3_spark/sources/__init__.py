"""Storage layout connectors: plain parquet projections (graph.py) plus the
bucketed layout for shuffle-free adjacency joins at scale."""

from vivace_graph_v3_spark.sources.bucketed import (  # noqa: F401
    load_bucketed_graph, save_bucketed_graph,
)
