"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship goal-list query on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators (dedup, similarity
search, text analysis). Implementations live in
``vivace_graph_v3_spark.entry_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vivace_graph_v3_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
