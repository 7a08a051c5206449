"""Event-time streaming: watermarked windowed aggregation over an event feed.

The reference has NO event-time machinery — commit order is its only time
axis (SURVEY.md §2.8) — so this module is part of the beyond-reference
surface a large-scale pipeline needs: ingest an append-only event table as a
stream and maintain windowed aggregates with bounded state.

Built entirely on Structured Streaming primitives:

- ``read_event_stream``: file-source stream over the events parquet
  (``ts`` arrives as raw nanoseconds; converted to TimestampType once,
  at the source);
- ``windowed_counts``: tumbling/sliding event-time windows with a watermark
  — late rows beyond the watermark are dropped and window state is evicted,
  which is what bounds memory at 100 TB/day feeds;
- ``session_counts``: per-user session windows (gap-based);
- ``run_available_now``: drain-everything-then-stop driver used by tests and
  batch backfills (the same code path a continuous deployment runs with a
  real trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vivace_graph_v3_spark.util import normalize_event_ts

EVENT_SCHEMA = ("event_id long, ts long, user_id long, event_type string, "
                "value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      *, max_files_per_trigger: int | None = None) -> DataFrame:
    """Stream the events parquet directory; ``ts`` is normalized to epoch
    nanos (bigint) and an ``event_time`` timestamp column is derived.

    File streams need an explicit schema, but the physical type of ``ts``
    has varied across testdata generations (TIMESTAMP(NANOS) -> bigint via
    the nanosAsLong legacy flag, TIMESTAMP(MICROS) -> TIMESTAMP_NTZ), so we
    peek at the batch-reader footer schema once (driver-side metadata read,
    no data scan) and stream with exactly that schema."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.errors import AnalysisException
    try:
        actual = spark.read.parquet(path).schema
    except AnalysisException:
        # a genuinely streaming source may start on an EMPTY directory
        # (no footer to peek at): fall back to the declared schema rather
        # than failing with 'unable to infer schema'
        actual = EVENT_SCHEMA
    reader = spark.readStream.schema(actual)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # file-source streams need a directory: stream the parent, matching
        # just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    ev = normalize_event_ts(reader.parquet(path))
    return ev.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def windowed_counts(events: DataFrame, *, window: str = "1 hour",
                    slide: str | None = None, watermark: str = "2 hours",
                    by: list[str] = ("event_type",)) -> DataFrame:
    """Watermarked tumbling (or sliding) window aggregate:
    (window, *by, n, sum_value). State for windows older than the watermark
    is evicted; rows later than that are dropped."""
    win = (F.window("event_time", window, slide) if slide
           else F.window("event_time", window))
    return (events.withWatermark("event_time", watermark)
            .groupBy(win.alias("window"), *by)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value")))


def session_counts(events: DataFrame, *, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-close semantics): one row per session
    with its span and event count."""
    return (events.withWatermark("event_time", watermark)
            .groupBy(F.session_window("event_time", gap).alias("session"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value")))


def dedup_stream(events: DataFrame, *, keys: list[str] = ("event_id",),
                 watermark: str = "2 hours",
                 within_watermark: bool = False) -> DataFrame:
    """Streaming deduplication — the streaming face of the training-data
    dedup pipeline (pipeline/dedup.py): emit each key once, with per-key
    state EVICTED by the watermark so the state store stays bounded on an
    unbounded feed (the non-negotiable property at 100 TB/day).

    Two contracts:
    - default: exact-once per (keys, event_time) — duplicates carry the
      same event time (replayed files, at-least-once sources); state for
      event times older than the watermark is dropped.
    - ``within_watermark``: duplicates may arrive with DIFFERENT event
      times up to the watermark apart (retries that re-stamp time) —
      ``dropDuplicatesWithinWatermark`` keys state by ``keys`` alone and
      expires it one watermark after first sight.
    """
    ev = events.withWatermark("event_time", watermark)
    if within_watermark:
        return ev.dropDuplicatesWithinWatermark(list(keys))
    return ev.dropDuplicates([*keys, "event_time"])


def correlate_streams(left: DataFrame, right: DataFrame, *,
                      key: str = "user_id", within: str = "15 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream inner join — the impression/click
    correlation shape: match each right-stream event to left-stream events
    with the same ``key`` whose event time falls in
    ``[right.event_time - within, right.event_time]``.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark derives state-eviction watermarks for BOTH state
    stores — state is dropped once the opposite stream's watermark passes
    the bound (unbounded feeds hold bounded state; the same non-negotiable
    as dedup_stream). Batch semantics of this operator are the bucketed
    interval join (operators/interval.py, `events_interval_join`) — this is
    its streaming face.

    Returns (key, left_event_id, right_event_id, left_time, right_time)."""
    l = (left.withWatermark("event_time", watermark)
         .select(F.col(key).alias("__lk"),
                 F.col("event_id").alias("left_event_id"),
                 F.col("event_time").alias("left_time")))
    r = (right.withWatermark("event_time", watermark)
         .select(F.col(key).alias("__rk"),
                 F.col("event_id").alias("right_event_id"),
                 F.col("event_time").alias("right_time")))
    cond = ((F.col("__lk") == F.col("__rk"))
            & (F.col("left_time") <= F.col("right_time"))
            & (F.col("left_time") >= F.col("right_time")
               - F.expr(f"INTERVAL {within}")))
    return (l.join(r, cond)
            .select(F.col("__lk").alias(key), "left_event_id",
                    "right_event_id", "left_time", "right_time"))


def run_available_now(stream_df: DataFrame, *, checkpoint: str,
                      out_path: str | None = None,
                      output_mode: str = "append", timeout: int = 300):
    """Drain the stream with trigger(availableNow) into parquet (or a memory
    sink when ``out_path`` is None — tests read the returned query's table).
    Returns the finished StreamingQuery."""
    writer = (stream_df.writeStream.outputMode(output_mode)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True))
    def drain(q):
        # a stateful query holding timers may not self-terminate even under
        # availableNow once the source is exhausted — wait for idle, then stop
        q.awaitTermination(timeout)
        if q.isActive:
            while q.status["isDataAvailable"] and q.isActive:
                q.awaitTermination(5)
            q.stop()
            q.awaitTermination(30)

    if out_path is None:
        import uuid

        name = f"mem_{uuid.uuid4().hex[:8]}"
        q = writer.format("memory").queryName(name).start()
        drain(q)
        q.mem_table = name
        return q
    q = writer.format("parquet").option("path", out_path).start()
    drain(q)
    return q
