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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


def interleave_audit(df: DataFrame, key_col: str, group_col: str, *,
                     n_shards: int = 16) -> DataFrame:
    """Shuffle-quality audit of the export order: within each shard, in
    the deterministic export order (content-hash, then key), measure the
    RUN LENGTHS of consecutive rows sharing the same ``group_col`` (e.g.
    source). A well-shuffled corpus has short runs (mean near the
    i.i.d. expectation); long runs mean a training consumer reading
    shards sequentially sees correlated batches — the data-ordering
    pathology curriculum/mixing work warns about.

    Returns per group: (group, n_docs, n_runs, max_run, mean_run_ppm)
    with mean_run = n_docs/n_runs as an exact integer ppm.

    Scale shape: one window pass partitioned BY SHARD (parallelism =
    shard count; size the shard count to the cluster — at 100 TB exports
    use thousands of shards, so per-partition data is file-sized, and
    the same audit runs map-local per shard). The run aggregation is
    map-side combined; output is group-domain-bounded."""
    h = md5_hash64(F.col(key_col).cast("string"))
    base = (with_shard(df, key_col, n_shards=n_shards)
            .select(F.col(key_col).alias("k"),
                    F.col(group_col).alias("g"), "shard",
                    h.alias("h")))
    w = Window.partitionBy("shard").orderBy("h", "k")
    runs = (base
            .withColumn("brk", F.when(
                F.lag("g").over(w).isNull()
                | (F.lag("g").over(w) != F.col("g")), 1).otherwise(0))
            .withColumn("run_id", F.sum("brk").over(
                Window.partitionBy("shard").orderBy("h", "k")
                .rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("shard", "run_id", "g")
            .agg(F.count(F.lit(1)).alias("run_len")))
    return (runs.groupBy("g")
            .agg(F.sum("run_len").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_runs"),
                 F.max("run_len").alias("max_run"))
            .select(F.col("g").alias(group_col),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_runs").cast("long").alias("n_runs"),
                    F.col("max_run").cast("long").alias("max_run"),
                    F.expr("(n_docs * 2000000 + n_runs) div (n_runs * 2)")
                    .alias("mean_run_ppm")))
