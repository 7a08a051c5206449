"""Hypertable-style rollup cascade: multi-resolution time-bucketed aggregates
where every coarser level re-aggregates the NEXT-FINER level, not the raw
table.

Not in the reference (no time-series surface); the TimescaleDB continuous-
aggregate pattern re-expressed on DataFrames. The scale argument: a daily
rollup computed from hourly buckets touches 24 rows per key-day instead of
every raw event — each cascade level costs O(|previous level|), so refreshing
the whole pyramid is barely more than refreshing its finest level. Requires
decomposable aggregates; this operator carries (count, sum, min, max), from
which mean derives (sum/count) at read time.

Each level is one hash shuffle on (bucket, group keys) with map-side partial
aggregation; bucket ids are integer `div` arithmetic (exact for 64-bit epoch
values), so levels align perfectly when each width divides the next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MEASURES = ["n", "sum_v", "min_v", "max_v"]


def rollup_cascade(df: DataFrame, *, ts_col: str, value_col: str,
                   group_cols: list[str] | None = None,
                   widths: list[int]) -> list[DataFrame]:
    """Build the rollup pyramid. ``widths``: ascending bucket widths in the
    integer units of ``ts_col`` (e.g. ns); each width should divide the next
    so coarse buckets are exact unions of fine ones. Returns one DataFrame
    per level with columns (bucket_start, *group_cols, n, sum_v, min_v,
    max_v); level i+1 is derived from level i."""
    if widths != sorted(widths):
        raise ValueError("widths must be ascending")
    for a, b in zip(widths, widths[1:]):
        if b % a:
            raise ValueError(f"width {b} is not a multiple of {a}")
    groups = list(group_cols or [])
    levels = []
    w0 = widths[0]
    base = (df.groupBy((F.expr(f"{ts_col} div {w0}") * w0).alias("bucket_start"),
                       *groups)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("sum_v"),
                 F.min(value_col).alias("min_v"),
                 F.max(value_col).alias("max_v")))
    levels.append(base)
    for w in widths[1:]:
        prev = levels[-1]
        nxt = (prev.groupBy((F.expr(f"bucket_start div {w}") * w)
                            .alias("bucket_start"), *groups)
               .agg(F.sum("n").alias("n"),
                    F.sum("sum_v").alias("sum_v"),
                    F.min("min_v").alias("min_v"),
                    F.max("max_v").alias("max_v")))
        levels.append(nxt)
    return levels
