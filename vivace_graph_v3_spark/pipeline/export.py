"""Model-ready corpus export: deterministic shards + content manifest.

The last step of a training-data pipeline: write the curated corpus as a
fixed set of shards whose ASSIGNMENT is a pure function of each row's key
(content-keyed md5 bucket — the same determinism contract as
dataset_split: re-runs, re-partitionings, and engine changes produce
byte-identical shard membership), together with a MANIFEST recording per
shard the row count and an order-insensitive content hash. Training jobs
consume the manifest to verify they read exactly what curation wrote —
a truncated copy or a double-written shard fails loudly instead of
silently skewing the data mix.

Scale shape: assignment is map-only; the write is one
``partitionBy(shard)`` parquet job; the manifest is a |shards|-row
aggregate (map-side combined, XOR hash is order-insensitive so no sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vivace_graph_v3_spark.pipeline.dedup import md5_hash64


def with_shard(df: DataFrame, key_col: str, *, n_shards: int = 16,
               out_col: str = "shard") -> DataFrame:
    """Deterministic shard id in [0, n_shards) from the content key."""
    return df.withColumn(
        out_col, F.pmod(md5_hash64(F.col(key_col).cast("string")),
                        F.lit(n_shards)).cast("int"))


def _content_hash(cols: list[str]):
    """Order-insensitive 64-bit content hash: bit_xor aggregate of
    per-row xxhash64 over all exported columns — no sort needed, and
    any row-level corruption flips the fold."""
    return F.expr(
        "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in cols) + "))")


def export_shards(df: DataFrame, path: str, key_col: str, *,
                  n_shards: int = 16) -> DataFrame:
    """Write ``df`` to ``path`` partitioned by the deterministic shard id
    and a ``_manifest`` parquet next to it; returns the manifest
    (shard, n_rows, content_hash)."""
    sharded = with_shard(df, key_col, n_shards=n_shards)
    cols = [c for c in sharded.columns if c != "shard"]
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    manifest = (written.groupBy("shard")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     _content_hash(cols).alias("content_hash")))
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_shards(spark: SparkSession, path: str) -> DataFrame:
    """Re-read the shards and compare against the stored manifest;
    returns violation rows (empty = intact): (shard, kind) where kind in
    {'missing', 'extra', 'count', 'content'}."""
    data = spark.read.parquet(path)
    cols = [c for c in data.columns if c != "shard"]
    actual = (data.groupBy("shard")
              .agg(F.count(F.lit(1)).alias("a_rows"),
                   _content_hash(cols).alias("a_hash")))
    manifest = spark.read.parquet(f"{path}/_manifest")
    j = manifest.join(actual, "shard", "full_outer")
    kind = (F.when(F.col("a_rows").isNull(), "missing")
            .when(F.col("n_rows").isNull(), "extra")
            .when(F.col("n_rows") != F.col("a_rows"), "count")
            .when(F.col("content_hash") != F.col("a_hash"), "content"))
    return (j.withColumn("kind", kind).filter(F.col("kind").isNotNull())
            .select("shard", "kind"))
