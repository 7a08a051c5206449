"""Interval (range) join — match point events to [start, end] intervals.

Not in the reference (its only temporal surface is timestamp comparison goals,
prologc.lisp:117-129); standard in event/feature pipelines (promotion windows,
maintenance windows, session attribution).

Spark-first scale design: Catalyst turns a raw ``l.ts BETWEEN r.start AND
r.end`` join into a BroadcastNestedLoopJoin (fine only when the interval side
broadcasts) or, worse, a cartesian product. The bucketed formulation makes it
an EQUI-join: pick a bucket width, explode each interval into the buckets it
covers, map each point to its single bucket, hash-join on (keys..., bucket),
then apply the exact range filter. A point lands in exactly one bucket, so no
post-join dedup is needed; cost is O(|intervals| * avg_buckets_per_interval +
|points|) shuffled rows — choose ``bucket_width`` near the typical interval
length so avg_buckets_per_interval stays ~1-2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_ts: str, start_col: str, end_col: str,
                  on: str | list[str] | None = None,
                  bucket_width: int | None = None,
                  how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (and equal ``on`` keys, if given).

    Timestamps/bounds must share one orderable numeric or timestamp type.
    ``bucket_width`` (same units as an integer ``point_ts``) enables the
    bucketed equi-join path; when None the raw range predicate is used and
    Catalyst picks the strategy (broadcast the interval side when small).
    ``how``: 'inner' or 'left' (unmatched points kept with null interval
    columns — only on the non-bucketed path)."""
    keys = [on] if isinstance(on, str) else list(on or [])
    rng = (F.col(point_ts) >= F.col(start_col)) & \
          (F.col(point_ts) <= F.col(end_col))
    if bucket_width is None:
        cond = rng
        for k in keys:
            cond = cond & (points[k] == intervals[k])
        iv = intervals.drop(*keys) if keys else intervals
        return points.join(intervals, cond, how).drop(
            *[intervals[k] for k in keys])
    if how != "inner":
        raise ValueError("bucketed path supports how='inner' only")
    # integer `div` keeps bucket ids exact for 64-bit epoch values (double
    # division would lose precision past 2^53)
    iv = intervals.withColumn("__b", F.explode(F.sequence(
        F.expr(f"{start_col} div {bucket_width}"),
        F.expr(f"{end_col} div {bucket_width}"))))
    pt = points.withColumn("__b", F.expr(f"{point_ts} div {bucket_width}"))
    return pt.join(iv, keys + ["__b"]).filter(rng).drop("__b")


def interval_concurrency(intervals: DataFrame, *, start_col: str,
                         end_col: str) -> DataFrame:
    """Concurrency (overlap depth) of a set of [start, end] INTEGER
    intervals — how many are simultaneously open at each boundary: the
    order-backlog / concurrent-sessions / WIP-depth query.

    Classic sweep-line, reshaped for scale: every interval emits +1 at
    ``start`` and -1 at ``end + 1`` (closed intervals); the deltas are
    aggregated per boundary point FIRST (one map-side-combined groupBy —
    the only pass over the data), and the running sum then runs over the
    aggregated boundary grid, which is distinct-boundary-bounded, not
    row-bounded (the winsorize/value-grid convention: a cumulative window
    over 1e4 distinct days is safe when the input was 1e10 intervals).
    Emits one row per boundary with a net change:
    (t, delta, depth) where depth is the count open in [t, next_t)."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long") + 1
    # both boundary deltas come out of ONE pass over the intervals (an
    # explode of two (t, d) structs) — a unionAll of two selects would
    # make Spark compute the interval frame twice, doubling any upstream
    # join/aggregate work feeding this operator
    deltas = (intervals
              .select(F.explode(F.array(
                  F.struct(s.alias("t"), F.lit(1).alias("d")),
                  F.struct(e.alias("t"), F.lit(-1).alias("d"))))
                  .alias("b"))
              .select("b.t", "b.d")
              .groupBy("t").agg(F.sum("d").alias("delta"))
              .filter(F.col("delta") != 0))
    w = (Window.partitionBy(F.lit(1)).orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (deltas.withColumn("depth", F.sum("delta").over(w))
            .select("t", F.col("delta").cast("long").alias("delta"),
                    F.col("depth").cast("long").alias("depth")))


def allen_relation_census(intervals: DataFrame, *, group_col: str,
                          id_col: str, start_col: str,
                          end_col: str) -> DataFrame:
    """Census of Allen's interval algebra (Allen 1983) over every
    ordered pair of intervals SHARING a group key: classifies each pair
    into one of the 13 basic relations (before / meets / overlaps /
    starts / during / finishes / equals + inverses collapse onto the
    ordered pair id_a < id_b) and counts globally per relation — the
    temporal-integrity profile of any interval table (do shipments
    overlap? abut? nest?).

    The pair join is group-scoped (an order has <= 7 lineitems, so
    <= 21 pairs per group — never corpus x corpus); classification is a
    pure expression ladder; the census is one map-side-combined
    aggregate to <= 13 rows. Integer day arithmetic only."""
    base = intervals.select(F.col(group_col).alias("g"),
                            F.col(id_col).alias("i"),
                            F.col(start_col).alias("s"),
                            F.col(end_col).alias("e"))
    a = base.select("g", F.col("i").alias("ia"), F.col("s").alias("sa"),
                    F.col("e").alias("ea"))
    b = base.select("g", F.col("i").alias("ib"), F.col("s").alias("sb"),
                    F.col("e").alias("eb"))
    p = a.join(b, "g").filter(F.col("ia") < F.col("ib"))
    sa, ea, sb, eb = (F.col("sa"), F.col("ea"), F.col("sb"), F.col("eb"))
    rel = (
        F.when((sa == sb) & (ea == eb), "equals")
        .when(ea < sb, "before")
        .when(eb < sa, "after")
        .when(ea == sb, "meets")
        .when(eb == sa, "met_by")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb) & (ea > eb), "started_by")
        .when((ea == eb) & (sa > sb), "finishes")
        .when((ea == eb) & (sa < sb), "finished_by")
        .when((sa > sb) & (ea < eb), "during")
        .when((sa < sb) & (ea > eb), "contains")
        .when(sa < sb, "overlaps")
        .otherwise("overlapped_by"))
    return (p.select(rel.alias("relation"))
            .groupBy("relation")
            .agg(F.count(F.lit(1)).alias("n_pairs")))
