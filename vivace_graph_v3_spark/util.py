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


def checkpoint_counted(df: DataFrame, *,
                       rebase: bool = False) -> tuple[DataFrame, int]:
    """Eager local checkpoint with the row count riding the materialization
    as a DataFrame observation: checkpoint + count/emptiness probe in ONE
    Spark job instead of two. Iterative fixpoint loops that previously ran
    ``.count()`` / ``.isEmpty()`` over a frame they had just checkpointed
    pay one fewer driver round-trip per round. With ``rebase`` the
    checkpoint goes through :func:`checkpoint_rebased` (stats reset for
    frames re-joined every round); the observation fires on the eager
    materialization inside it, before the rewrap."""
    from pyspark.sql import Observation, functions as F

    ob = Observation()
    observed = df.observe(ob, F.count(F.lit(1)).alias("n"))
    out = (checkpoint_rebased(observed) if rebase
           else observed.localCheckpoint(eager=True))
    return out, int(ob.get["n"])


def rows_to_json(df, *, col: str = "json"):
    """One JSON object per row — the REST layer's NDJSON/JSON encoding of
    nodes (rest.lisp:101-146, 249-291) as a single JVM expression."""
    from pyspark.sql import functions as F

    return df.select(F.to_json(F.struct(*df.columns)).alias(col))


def salted_join(left, right, key: str, *, salt: int = 16, how: str = "inner"):
    """Skew-resistant equi-join: replicate the (small-ish) right side ``salt``
    ways and scatter the left side's hot keys across the replicas, so one hot
    key becomes ``salt`` balanced tasks instead of one straggler.

    AQE's skew-join splitting handles sort-merge skew automatically; this
    explicit form is for the cases AQE can't fix (aggregation-feeding joins,
    deliberate repartitioning) and as the documented pattern for hot vertices
    (celebrity nodes) in adjacency joins.
    """
    from pyspark.sql import functions as F

    lft = left.withColumn("__lsalt", F.floor(F.rand(seed=7) * salt).cast("int"))
    rgt = (right.withColumnRenamed(key, "__rkey")
           .withColumn("__rsalt",
                       F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))))
    out = lft.join(rgt, (F.col(key) == F.col("__rkey"))
                   & (F.col("__lsalt") == F.col("__rsalt")), how)
    return out.drop("__lsalt", "__rsalt", "__rkey")


def normalize_event_ts(df: DataFrame, *, col: str = "ts") -> DataFrame:
    """Normalize the events table's ``ts`` column to epoch NANOSECONDS
    (bigint), whatever the physical parquet type was written as.

    The testdata generator has shipped ``ts`` both as parquet
    TIMESTAMP(NANOS) (which Spark only reads via
    ``spark.sql.legacy.parquet.nanosAsLong`` -> bigint nanos) and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). All downstream time
    arithmetic is integer-based on nanos — timezone- and engine-independent
    — so both layouts converge here. NTZ wall time is by convention the UTC
    instant (the session timezone is pinned to UTC in session.py), matching
    DuckDB's ``epoch_ns(ts)`` on the same file."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype in ("timestamp", "timestamp_ntz"):
        return df.withColumn(
            col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000))
    return df


def checkpoint_rebased(df: DataFrame) -> DataFrame:
    """Eager local checkpoint that ALSO resets Catalyst's size statistics.

    ``localCheckpoint`` truncates lineage but the new ``LogicalRDD``
    INHERITS the child plan's estimated statistics. Catalyst's
    size-only estimator multiplies child sizeInBytes across a join, so in
    an iterative algorithm that checkpoints a join (worse: a self-join —
    squaring) every round, the inherited sizeInBytes BigInt grows its
    DIGIT COUNT linearly (self-join: doubles it) per iteration. After a
    few dozen rounds the planner spends minutes inside
    ``BigInteger.multiplyToomCook3`` computing astronomically large join
    estimates for 30-row frames — observed as a full planner stall (the
    graph_bowtie entry hung past spark.sql.broadcastTimeout; stage-level
    profiling showed 100% driver CPU in BigInt multiply under
    SizeInBytesOnlyStatsPlanVisitor.visitJoin).

    Fix: after materializing the checkpoint, rewrap its InternalRow RDD
    with ``internalCreateDataFrame`` — a brand-new LogicalRDD carrying
    default leaf statistics. JVM-only (no Python round trip, no
    recompute: ``toRdd`` on a checkpointed plan is the checkpoint RDD),
    so it is scale-safe wherever localCheckpoint is. Use this instead of
    bare ``localCheckpoint(eager=True)`` in any loop whose body joins the
    checkpointed frame.

    Classic-PySpark-only (ADVICE r7): the rewrap reaches through private
    JVM handles (``_jdf``, ``internalCreateDataFrame``) that do not exist
    under Spark Connect and carry no compatibility guarantee, so it is
    capability-guarded — when the handles are missing the helper falls
    back to the plain eager localCheckpoint (correct, merely exposed to
    the stats-explosion slowdown this works around)."""
    ck = df.localCheckpoint(eager=True)
    jdf = getattr(ck, "_jdf", None)
    spark = ck.sparkSession
    jspark = getattr(spark, "_jsparkSession", None)
    if jdf is None or jspark is None or \
            not hasattr(jspark, "internalCreateDataFrame"):
        return ck
    try:
        jreset = jspark.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False)
    except Exception:  # future-Spark signature drift: stay correct
        return ck
    return DataFrame(jreset, spark)
