"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k per query — broadcast the (small)
  query set against the corpus, windowed rank. The correctness baseline and
  perfectly adequate whenever |queries| * |corpus| per partition fits compute
  (it's one broadcast join: no shuffle of the corpus at all).
- ``ivf_ann_topk``: the scale path — IVF (inverted-file) partitioning:
  k-means-lite centroids from a deterministic sample, corpus assigned to
  nearest centroid once (a write-time step at 100 TB), queries probe only the
  ``nprobe`` nearest centroid cells.

All vector math is JVM expressions (zip_with/aggregate), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vivace_graph_v3_spark.pipeline.dedup import cosine


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int, *,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           q_vec_col: str | None = None,
                           q_id_col: str | None = None) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Returns
    (query_id, neighbor_id, cosine, rank). Self-matches excluded when ids
    collide."""
    q_vec_col = q_vec_col or vec_col
    q_id_col = q_id_col or id_col
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    joined = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def train_centroids(corpus: DataFrame, num_centroids: int, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    iterations: int = 2) -> DataFrame:
    """k-means-lite: deterministic seed sample (lowest ids) + a couple of
    Lloyd iterations with groupBy mean. Returns (centroid_id, cv)."""
    seeds = (corpus.orderBy(F.col(id_col)).limit(num_centroids)
             .select(F.monotonically_increasing_id().alias("centroid_id"),
                     F.col(vec_col).alias("cv")))
    cents = seeds
    for _ in range(iterations):
        assigned = _assign(corpus, cents, vec_col=vec_col, id_col=id_col)
        # mean of arrays: posexplode -> avg per (centroid, pos) -> re-collect
        exploded = (assigned
                    .join(corpus.select(F.col(id_col).alias("id"),
                                        F.col(vec_col).alias("v")), "id")
                    .select("centroid_id", F.posexplode("v").alias("pos", "x")))
        cents = (exploded.groupBy("centroid_id", "pos")
                 .agg(F.avg("x").alias("x"))
                 .groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
                 .select("centroid_id",
                         F.transform("px", lambda s: s["x"].cast("float")).alias("cv")))
    return cents


def _assign(corpus: DataFrame, cents: DataFrame, *, vec_col: str,
            id_col: str) -> DataFrame:
    """Nearest centroid per corpus row (broadcast the centroids)."""
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(),
                                         F.col("centroid_id").asc())
    return (corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .join(F.broadcast(cents))
            .withColumn("sim", cosine(F.col("v"), F.col("cv")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "centroid_id"))


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                 num_centroids: int = 16, nprobe: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid cells per
    query. At 100 TB the assignment (``_assign``) is precomputed at ingest and
    the corpus is partitioned by centroid_id, making each probe a partition-
    pruned scan."""
    cents = train_centroids(corpus, num_centroids, vec_col=vec_col,
                            id_col=id_col, iterations=1)
    assign = _assign(corpus, cents, vec_col=vec_col, id_col=id_col)
    corpus_cells = corpus.select(F.col(id_col).alias("neighbor_id"),
                                 F.col(vec_col).alias("cv2")) \
        .join(assign.withColumnRenamed("id", "neighbor_id"), "neighbor_id")

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(),
                                                F.col("centroid_id").asc())
    probes = (q.join(F.broadcast(cents))
              .withColumn("csim", cosine(F.col("qv"), F.col("cv")))
              .withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "centroid_id"))

    cand = probes.join(corpus_cells, "centroid_id") \
        .filter(F.col("query_id") != F.col("neighbor_id")) \
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv2")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _lsh_buckets(df: DataFrame, planes, *, vec_col: str, id_col: str,
                 out_id: str) -> DataFrame:
    """(id, table, bucket) per input row: bucket = packed sign bits of the
    row's dot products with that table's hyperplanes. Plane coefficients are
    plan-time literals, so the whole signature is one codegen'd expression —
    no Python at runtime."""
    num_tables, num_bits, _dim = planes.shape
    tables = []
    for t in range(num_tables):
        bucket = F.lit(0)
        for b in range(num_bits):
            r = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), r, lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x)
            bucket = bucket + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        tables.append(F.struct(F.lit(t).alias("table"),
                               bucket.cast("int").alias("bucket")))
    return (df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"),
                      F.explode(F.array(*tables)).alias("tb"))
            .select(out_id, "__v", "tb.table", "tb.bucket"))


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                 num_tables: int = 12, num_bits: int = 6, multiprobe: int = 1,
                 seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dim: int | None = None) -> DataFrame:
    """Random-hyperplane (sign) LSH ANN — the bucketed alternative to IVF:
    two rows collide in a table iff all ``num_bits`` sign bits agree
    (P = (1 - theta/pi)^bits per table), so candidate generation is a hash
    EQUI-join on (table, bucket) — at 100 TB, corpus bucket columns are
    stamped at ingest and the corpus is bucketed by (table, bucket), making
    each query a partition-local probe with no corpus shuffle (the same
    write-time trade as IVF's centroid assignment). ``multiprobe=r`` also
    probes every bucket within r sign-flips (query-side only — the corpus
    is never expanded), trading probe fan-out for recall exactly like
    classic multi-probe LSH; 0 disables probing."""
    import itertools

    import numpy as np

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = np.random.RandomState(seed).normal(size=(num_tables, num_bits, dim))

    c = _lsh_buckets(corpus, planes, vec_col=vec_col, id_col=id_col,
                     out_id="neighbor_id").withColumnRenamed("__v", "cv2")
    q = _lsh_buckets(queries, planes, vec_col=vec_col, id_col=id_col,
                     out_id="query_id").withColumnRenamed("__v", "qv")
    if multiprobe > 0:
        # all perturbation masks with <= multiprobe bits set (plan-time
        # literals: C(num_bits, <=r) masks, e.g. 22 for 6 bits at r=2)
        masks = [0] + [
            sum(1 << b for b in combo)
            for r in range(1, multiprobe + 1)
            for combo in itertools.combinations(range(num_bits), r)]
        flips = F.array(*[F.lit(m) for m in masks])
        q = (q.select("query_id", "qv", "table",
                      F.explode(F.transform(
                          flips, lambda m: F.col("bucket").bitwiseXOR(m)))
                      .alias("bucket")))

    cand = (q.join(c, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "qv", "neighbor_id", "cv2")
            .dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv2")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
