from vivace_graph_v3_spark.query.builder import Select, select

__all__ = ["Select", "select"]
