"""Mergeable sketch operators with engine-reproducible hashing.

Spark ships HLL++ (approx_count_distinct) and KLL-ish percentile_approx —
both used by the sketch_* contract entries. This module adds the classic
COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) for heavy-hitter /
frequency estimation, built from the repo's cross-engine md5-derived
64-bit hash so an external engine (the DuckDB oracles here, or any SQL
system) can reproduce the sketch — and therefore the ESTIMATES —
bit-for-bit. That turns the usual "trust the bound" sketch check into an
exact value-hash contract.

Scale shape: the sketch is a single groupBy over (depth x occurrences)
hash rows into depth*width cells — fixed-size state (e.g. 4 x 1024
counters), perfectly map-side combinable, merge = cell-wise sum. At
100 TB the counter table is KBs regardless of corpus size; estimates
join the tiny counter table broadcast-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.pipeline.dedup import md5_hash64


def cms_bucket(col, j: int, width: int):
    """Row-j bucket of a value: pmod(md5_64('j|' || value), width). The
    'j|' prefix derives depth independent-enough hash functions from one
    base hash, identically reproducible in SQL."""
    return F.pmod(md5_hash64(F.concat(F.lit(f"{j}|"), col)), F.lit(width))


def cms_build(df: DataFrame, col: str, *, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the counter table (j, bucket, cnt) over every row of ``col``
    (one occurrence = one increment per hash row). depth*width cells total;
    absent cells mean 0."""
    hashes = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cms_bucket(F.col(col), j, width).alias("bucket"))
        for j in range(depth)])
    return (df.select(F.explode(hashes).alias("h"))
            .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(cms: DataFrame, items: DataFrame, col: str, *,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate every row of ``items[col]`` against a built sketch:
    est = min over hash rows j of cnt[j][bucket_j(item)]. Returns the
    items frame plus an ``est`` column (BIGINT; never underestimates).
    The counter table is depth*width rows — broadcast it."""
    probes = items.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     cms_bucket(F.col(col), j, width).alias("bucket"))
            for j in range(depth)])).alias("h"))
    joined = probes.join(F.broadcast(cms),
                         (probes["h.j"] == cms["j"])
                         & (probes["h.bucket"] == cms["bucket"]), "left")
    return (joined.groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))
