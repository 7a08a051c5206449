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


def gap_fill_locf(df: DataFrame, *, ts_col: str = "ts",
                  group_col: str = "event_type") -> DataFrame:
    """Time-bucket downsample with gap filling: per group, the daily event
    count over a dense calendar, missing days carried forward from the last
    observed day (LOCF — the TimescaleDB ``time_bucket_gapfill`` +
    ``locf()`` pattern; no reference analogue, the time-series surface the
    reference lacks).

    Returns (group, day 'yyyy-MM-dd' string, n_events, filled): observed
    days keep their count with filled=false; calendar days with no events
    repeat the previous observed count with filled=true (0 before the
    first observation). All-integer values, dates rendered as strings so
    both engines canonicalize identically.

    Scale shape: the raw table is touched exactly once by the (group, day)
    count, which map-side combines down to |groups| x |days| rows;
    the dense calendar is a ``sequence()`` explode over that bounded grid,
    and the LOCF window runs per group over calendar days only — never
    over raw events. At 100 TB the post-aggregate state is a few thousand
    rows regardless of corpus size."""
    from pyspark.sql import Window

    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (df.groupBy(F.col(group_col).alias("g"), day.alias("d"))
             .agg(F.count(F.lit(1)).alias("n_raw")))
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = (daily.select("g").distinct()
           .crossJoin(F.broadcast(span))
           .select("g", F.explode(F.sequence("lo", "hi")).alias("d")))
    w = (Window.partitionBy("g").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = (cal.join(daily, ["g", "d"], "left")
              .select("g", "d",
                      F.coalesce(F.last("n_raw", ignorenulls=True).over(w),
                                 F.lit(0)).alias("n_events"),
                      F.col("n_raw").isNull().alias("filled")))
    return filled.select(F.col("g").alias(group_col),
                         F.date_format("d", "yyyy-MM-dd").alias("day"),
                         "n_events", "filled")


def holt_forecast(df: DataFrame, *, ts_col: str = "ts",
                  group_col: str = "event_type",
                  horizon: int = 7) -> DataFrame:
    """Holt linear-trend forecast (Holt 1957) of each group's daily event
    count: level/trend double-smoothing with alpha = beta = 1/2 over the
    dense calendar (missing days count 0), emitting the final state and
    the 1- and ``horizon``-step-ahead forecasts in integer ppm.

    Determinism: alpha = 1/2 makes every smoothing weight an exact binary
    fraction, and the fold runs STRICTLY sequentially over a per-group
    sorted day array (F.aggregate over collect_list) — the identical IEEE
    operation sequence a recursive-CTE oracle performs, so the doubles
    match bit-for-bit even once fraction bits exceed the mantissa.
    Init: l_0 = x_0, b_0 = 0 (documented; series long enough to wash it).

    Scale shape: the raw table is touched once by the (group, day) count;
    the calendar grid and the per-group fold are |groups| x |days| —
    calendar-bounded, never corpus-bounded (the gap_fill_locf argument).
    The fold itself is a Catalyst higher-order function: JVM-side, no
    Python, no window, no shuffle beyond the grid rollup."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (df.groupBy(F.col(group_col).alias("g"), day.alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = (daily.select("g").distinct()
           .crossJoin(F.broadcast(span))
           .select("g", F.explode(F.sequence("lo", "hi")).alias("d")))
    dense = (cal.join(daily, ["g", "d"], "left")
             .select("g", "d", F.coalesce("n", F.lit(0)).alias("n")))
    arr = (dense.groupBy("g")
           .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("xs")))
    step = """(acc, x) -> named_struct(
        'i', acc.i + 1L,
        'l', CASE WHEN acc.i = 0L THEN CAST(x.n AS DOUBLE)
                  ELSE 0.5D * x.n + 0.5D * (acc.l + acc.b) END,
        'b', CASE WHEN acc.i = 0L THEN CAST(0.0 AS DOUBLE)
                  ELSE 0.5D * ((0.5D * x.n + 0.5D * (acc.l + acc.b))
                               - acc.l) + 0.5D * acc.b END)"""
    st = arr.select(
        "g", F.size("xs").cast("long").alias("n_days"),
        F.expr("aggregate(xs, named_struct('i', 0L, "
               "'l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), "
               + step + ")").alias("st"))
    ppm = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return st.select(
        F.col("g").alias(group_col), "n_days",
        ppm(F.col("st.l")).alias("level_ppm"),
        ppm(F.col("st.b")).alias("trend_ppm"),
        ppm(F.col("st.l") + F.col("st.b")).alias("forecast1_ppm"),
        ppm(F.col("st.l") + F.lit(float(horizon)) * F.col("st.b"))
        .alias(f"forecast{horizon}_ppm"))


def ohlc_resample(events: DataFrame, *, ts_col: str = "ts",
                  group_col: str = "event_type", value_col: str = "value",
                  bucket_ns: int = 3_600_000_000_000,
                  id_col: str = "event_id") -> DataFrame:
    """OHLC (open/high/low/close) resampling per (group, time bucket) —
    the financial-candle / metrics-downsample shape. ``ts`` must already
    be epoch-nanos (the events convention); values are half-up cents.

    Determinism: open/close pick the first/last row by (ts, id) — the id
    tiebreak makes simultaneous events unambiguous; they are computed as
    min/max over a (t, id, cents) STRUCT (lexicographic struct ordering,
    one aggregate — no row_number window pass), so the whole op is ONE
    map-side-combinable aggregate per (group, bucket): the 100 TB shape
    (no per-bucket sort anywhere).

    Returns (group, bucket, n, open_cents, high_cents, low_cents,
    close_cents)."""
    cents = F.floor(F.col(value_col) * 100.0 + 0.5).cast("long")
    base = events.select(
        F.col(group_col).alias("g"),
        F.expr(f"`{ts_col}` div {bucket_ns}").alias("bucket"),
        F.struct(F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
                 cents.alias("v")).alias("s"),
        cents.alias("cents"))
    agg = (base.groupBy("g", "bucket")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("s").alias("first_s"), F.max("s").alias("last_s"),
                F.max("cents").alias("high_cents"),
                F.min("cents").alias("low_cents")))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.col("first_s.v").alias("open_cents"),
        F.col("high_cents").alias("high_cents"),
        F.col("low_cents").alias("low_cents"),
        F.col("last_s.v").alias("close_cents"))


def time_weighted_average(df: DataFrame, *, group_col: str = "event_type",
                          ts_col: str = "ts", id_col: str = "event_id",
                          value_col: str = "value") -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is weighted
    by the duration it was "in effect" — the interval to the NEXT
    observation in the group — so irregular sampling doesn't bias the
    mean toward burst periods (the standard financial TWAP / metrics
    resample-then-average semantics, which a plain AVG silently gets
    wrong on event streams).

    One lead window per group ordered by (ts, id), then one map-side-
    combined aggregate. The value*duration products accumulate as
    DECIMAL(38,0) (cents x nanoseconds overflows BIGINT at ~1e4 rows),
    and the final ratio is one exact integer division to milli-cents —
    engine-exact at any scale. The last observation of a group carries
    no duration (it is "in effect" until an unknown future).

    Returns (group, n_intervals, span_ns, twap_millicents)."""
    from pyspark.sql import Window

    cents = F.floor(F.col(value_col) * 100 + 0.5).cast("long")
    d = (df.select(F.col(group_col).alias("group"),
                   F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
                   cents.alias("c"))
         .withColumn("t_next", F.lead("t").over(
             Window.partitionBy("group").orderBy("t", "i")))
         .filter(F.col("t_next").isNotNull()))
    return (d.groupBy("group")
            .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"),
                 F.sum(F.col("t_next") - F.col("t")).cast("long")
                 .alias("span_ns"),
                 F.sum(((F.col("t_next") - F.col("t")) * F.col("c"))
                       .cast("decimal(38,0)")).alias("num"))
            .select("group", "n_intervals", "span_ns",
                    F.expr("cast(num * 1000 div span_ns as long)")
                    .alias("twap_millicents")))
