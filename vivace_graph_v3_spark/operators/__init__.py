from vivace_graph_v3_spark.operators.traverse import traverse
from vivace_graph_v3_spark.operators.graph_algorithms import (
    aggregate_messages, pagerank, connected_components, triangle_count,
    shortest_paths, label_propagation, k_core)

__all__ = ["traverse", "aggregate_messages", "pagerank",
           "connected_components", "triangle_count", "shortest_paths",
           "label_propagation", "k_core"]
