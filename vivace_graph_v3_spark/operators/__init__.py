from vivace_graph_v3_spark.operators.traverse import traverse
from vivace_graph_v3_spark.operators.graph_algorithms import (
    aggregate_messages, pagerank, connected_components, triangle_count,
    shortest_paths, label_propagation, k_core, hits,
    common_neighbor_similarity)
from vivace_graph_v3_spark.operators.profile import (
    profile_table, histogram, distribution_drift, table_diff)
from vivace_graph_v3_spark.operators.layout import (
    morton_key, zorder_write_plan)
from vivace_graph_v3_spark.operators.product_analytics import (
    funnel, cohort_retention)
from vivace_graph_v3_spark.operators.bucketing import (
    write_bucketed, bucketed_join)
from vivace_graph_v3_spark.operators.skew import (
    salted_join, two_phase_distinct)
from vivace_graph_v3_spark.operators.walks import (
    random_walks, skipgram_pairs, negative_samples)

__all__ = ["traverse", "aggregate_messages", "pagerank",
           "connected_components", "triangle_count", "shortest_paths",
           "label_propagation", "k_core", "hits",
           "common_neighbor_similarity", "profile_table", "histogram",
           "distribution_drift", "table_diff", "morton_key",
           "zorder_write_plan", "funnel", "cohort_retention",
           "write_bucketed", "bucketed_join", "salted_join",
           "two_phase_distinct", "random_walks", "skipgram_pairs",
           "negative_samples"]
