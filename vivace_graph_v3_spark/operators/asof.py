"""As-of (point-in-time) join — a temporal operator the reference lacks but a
training-data/event pipeline needs (feature lookup at example time, latest
state before an observation). No direct analog in the reference; its closest
surface is timestamp-ordered Prolog comparison goals (prologc.lisp:117-129).

Spark-first design — the union-merge formulation, NOT a range join:

  tag left and right rows, union them, and run ONE window per key ordered by
  (ts, tag): ``last(right_payload, ignorenulls=True)`` up to the current row
  carries the most recent right-hand match forward onto every left row.

Cost model: a single hash shuffle on the key plus an in-partition sort —
O(n log n) per key, no candidate explosion. The naive alternative (equi-join
on key + ``l.ts >= r.ts`` filter + row_number) materializes O(|L_k| * |R_k|)
candidate rows per key before pruning, which detonates on hot keys at scale;
the union-merge never builds candidates at all. Skew lands in the window sort,
where it is bounded by the true per-key row count.

Right rows sort BEFORE left rows at equal timestamps (tag ordering), so a
right row at exactly t matches a left row at t (inclusive as-of, the standard
``direction="backward"`` contract; pandas.merge_asof semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance: Column | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (backward as-of).

    ``right_cols``: right columns to carry (default: all but key/ts).
    ``tolerance``: optional max lookback as an INTERVAL Column
    (e.g. ``F.expr("INTERVAL 7 DAYS")``); older matches become NULL.
    Carried columns appear as ``<col><suffix>`` plus ``<right_ts><suffix>``.

    Determinism: if several right rows share the matching timestamp, the one
    last in the (ts, original column order) sort wins — pre-aggregate the
    right side to one row per (key, ts) for a fully deterministic result.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]
    payload = F.struct(F.col(right_ts).alias("__ts"),
                       *[F.col(c) for c in right_cols])

    payload_type = ("struct<__ts:"
                    + right.schema[right_ts].dataType.simpleString() + ","
                    + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}"
                               for c in right_cols) + ">")
    lhs = (left.withColumn("__tag", F.lit(1))
           .withColumn("__p", F.lit(None).cast(payload_type))
           .withColumn("__ts", F.col(left_ts)))
    rhs = (right.select(*keys, payload.alias("__p"))
           .withColumn("__tag", F.lit(0))
           .withColumn("__ts", F.col("__p.__ts"))
           .select(*keys, "__tag", "__p", "__ts",
                   *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                     for c in left.columns if c not in keys]))

    merged = lhs.select(*keys, "__tag", "__p", "__ts",
                        *[c for c in left.columns if c not in keys]) \
        .unionByName(rhs)
    # right rows (tag 0) sort before left rows (tag 1) at equal ts -> inclusive
    w = (Window.partitionBy(*keys).orderBy(F.col("__ts").asc(), F.col("__tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = merged.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__m", F.when(F.col("__m.__ts") >= F.col("__ts") - tolerance,
                          F.col("__m")))
    return out.select(
        *keys, *[c for c in left.columns if c not in keys],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols])
