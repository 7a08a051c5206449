"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy per-row
    work (k-hash signatures, pandas UDFs). Small tables often arrive as one
    parquet file -> one partition, which would serialize the computation onto
    a single core; at real scale the input already has >= parallelism
    partitions and this is a no-op (no shuffle added)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
