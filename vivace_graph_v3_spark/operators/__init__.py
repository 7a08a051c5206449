from vivace_graph_v3_spark.operators.traverse import traverse

__all__ = ["traverse"]
