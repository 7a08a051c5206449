"""Event-stream product analytics: ordered funnels and cohort retention.

Beyond the reference's event surface (its events are graph mutations;
SURVEY.md §2.8) — these are the two canonical event-table reports every
warehouse runs, included so the engine's analytics surface matches what a
user of a timeseries/OLAP store expects.

Timestamps follow the engine's events convention (util.normalize_event_ts):
raw nanosecond longs, so every derived quantity (spans, week buckets,
offsets) is integer arithmetic — timezone- and engine-independent. A
timestamp-typed column is converted on entry.

Scale shape: every step is a filtered scan (predicate pushdown on
event_type) aggregated to one row per user — all joins are user-keyed
hash joins over frames no larger than |users|, never event-sized, and
every aggregate map-side-combines. No windows over raw events.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

NANOS_PER_DAY = 86_400_000_000_000


def _nanos(events: DataFrame, ts_col: str) -> DataFrame:
    dt = dict((f.name, f.dataType) for f in events.schema.fields)[ts_col]
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return events.withColumn(
            ts_col, F.unix_micros(F.col(ts_col).cast("timestamp"))
            * F.lit(1000))
    if not isinstance(dt, LongType):
        return events.withColumn(ts_col, F.col(ts_col).cast("long"))
    return events


def funnel(events: DataFrame, steps: list[str], *,
           ts_col: str = "ts", user_col: str = "user_id",
           type_col: str = "event_type",
           max_span_days: int | None = None) -> DataFrame:
    """Ordered-sequence funnel: a user converts step i when an event of
    type ``steps[i]`` occurs STRICTLY AFTER their step i-1 conversion
    time (first qualifying occurrence wins; ``max_span_days`` optionally
    bounds the whole funnel to a window after the step-1 event). Returns
    one row per step: (step, step_name, n_users, conversion) with
    ``conversion`` = n_users / step-1 users, integer-round-half-up to 6
    decimals (engine-stable)."""
    events = _nanos(events, ts_col)
    ts = F.col(ts_col)
    prev = (events.filter(F.col(type_col) == steps[0])
            .groupBy(user_col).agg(F.min(ts).alias("t"))
            .withColumn("t0", F.col("t")))
    per_step = [prev]
    for s in steps[1:]:
        nxt = (events.filter(F.col(type_col) == s)
               .join(prev.select(user_col, "t", "t0"), user_col)
               .filter(ts > F.col("t")))
        if max_span_days is not None:
            nxt = nxt.filter(
                ts <= F.col("t0") + F.lit(max_span_days * NANOS_PER_DAY))
        prev = (nxt.groupBy(user_col, "t0")
                .agg(F.min(ts).alias("t")))
        per_step.append(prev)
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"), "n_users")
        for i, df in enumerate(per_step)]
    out = reduce(lambda a, b: a.unionByName(b), counts)
    base = out.filter(F.col("step") == 1) \
        .select(F.col("n_users").alias("__base"))
    conv = F.when(F.col("__base") > 0, F.expr(
        "(n_users * 2000000 + __base) div (__base * 2)").cast("double")
        / F.lit(1_000_000.0)).otherwise(F.lit(0.0))
    return (out.crossJoin(F.broadcast(base))
            .select("step", "step_name", "n_users",
                    conv.alias("conversion")))


def cohort_retention(events: DataFrame, *, ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday-truncated
    week of their first event; for every (cohort_week, week_offset) the
    count of cohort users active in that week. Returns (cohort_week DATE,
    week_offset, n_users) — the classic retention triangle.

    All-integer: epoch-day = nanos div day; Monday truncation uses
    day 0 = Thursday, so dow = (day + 3) mod 7 and week start =
    day - dow; offsets are day-difference div 7."""
    events = _nanos(events, ts_col)
    # integer div — a double quotient of an ~1e18 nanos value loses
    # sub-256ns precision and could flip a midnight-boundary day
    day = F.expr(f"`{ts_col}` div {NANOS_PER_DAY}")
    wk_start = day - (day + 3) % 7
    first = (events.groupBy(user_col)
             .agg(F.min(wk_start).alias("cw")))
    active = (events.select(F.col(user_col), wk_start.alias("wk"))
              .dropDuplicates())
    return (active.join(first, user_col)
            .select(F.date_from_unix_date(F.col("cw").cast("int"))
                    .alias("cohort_week"),
                    ((F.col("wk") - F.col("cw")) / 7).cast("long")
                    .alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def cusum_changepoint(events: DataFrame, *, ts_col: str = "ts",
                      group_col: str = "event_type",
                      value_col: str = "value") -> DataFrame:
    """CUSUM change-point detection (Page 1954) per group over the daily
    value series: the day where the cumulative deviation from the group
    mean peaks in magnitude — the classic single-change locator for
    level shifts in a metric stream.

    Engine-exact formulation: daily values are scaled to integers
    (floor(x*1e4 + 0.5), bit-determined on doubles), and the deviation is
    cross-multiplied instead of divided — dev_d = s_d * n_days - total —
    so the running CUSUM is pure BIGINT arithmetic; the peak day and its
    deviation are identical in any engine, no floating accumulation.

    Returns (group, change_day, peak_dev, n_days): change_day = earliest
    day attaining max |cusum|, peak_dev the signed scaled deviation
    there.

    Scale shape: the corpus is touched once by the (group, day)
    aggregate, which map-side combines; everything after is
    days-x-groups bounded (window cumsum per group over the day grid —
    the ks_drift grid discipline)."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    scaled = F.floor(F.col(value_col) * 10000.0 + 0.5).cast("long")
    daily = (events.groupBy(F.col(group_col).alias("g"), day.alias("d"))
             .agg(F.sum(scaled).alias("s")))
    totals = (daily.groupBy("g")
              .agg(F.sum("s").alias("total"),
                   F.count(F.lit(1)).alias("n_days")))
    wc = (Window.partitionBy("g").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (daily.join(totals, "g")
           .withColumn("cusum",
                       F.sum(F.col("s") * F.col("n_days")).over(wc)
                       - F.row_number().over(
                           Window.partitionBy("g").orderBy("d"))
                       * F.col("total")))
    w_peak = Window.partitionBy("g").orderBy(
        F.abs("cusum").desc(), F.col("d").asc())
    return (cum.withColumn("__rn", F.row_number().over(w_peak))
            .filter(F.col("__rn") == 1)
            .select(F.col("g").alias(group_col),
                    F.col("d").alias("change_day"),
                    F.col("cusum").alias("peak_dev"),
                    F.col("n_days").cast("long").alias("n_days")))
