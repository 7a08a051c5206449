"""Event-time streaming tests: the streaming windowed aggregate must match
the batch (DuckDB-style) answer on a drained finite source, sessions must
respect the gap, and late rows beyond the watermark must be dropped."""

import pyspark.sql.functions as F

from vivace_graph_v3_spark.streaming.events import (
    read_event_stream, run_available_now, session_counts, windowed_counts,
)
from vivace_graph_v3_spark.util import normalize_event_ts

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark, tmp_path):
    ev = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    agg = windowed_counts(ev, window="1 hour", watermark="1 hour")
    q = run_available_now(agg, checkpoint=str(tmp_path / "cp"))
    got = (spark.table(q.mem_table)
           .select(F.col("window.start").alias("ws"), "event_type", "n")
           .collect())
    got = {(r["ws"], r["event_type"]): r["n"] for r in got}

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (normalize_event_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"))
        .withColumn("event_time",
                    F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    # availableNow + watermark: the final (open) windows may be withheld from
    # the append-mode sink, so every emitted window must match batch and
    # cover all but the tail beyond the last watermark
    assert got
    assert all(want[k] == v for k, v in got.items())
    missing = set(want) - set(got)
    if missing:
        last_emitted = max(ws for ws, _ in got)
        assert all(ws >= last_emitted for ws, _ in missing)


def test_session_counts_gap(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 7), (2, "2024-01-01 00:10:00", 7),
        (3, "2024-01-01 02:00:00", 7),       # new session after 110-min gap
        (4, "2024-01-01 00:05:00", 8),
        (5, "2024-01-01 23:00:00", 9),       # advances watermark, closes all
    ]
    src = str(tmp_path / "src")
    (spark.createDataFrame(rows, "event_id long, t string, user_id long")
     .select("event_id",
             (F.unix_timestamp("t").cast("long") * 1_000_000_000).alias("ts"),
             "user_id", F.lit("click").alias("event_type"),
             F.lit(1.0).alias("value"), F.lit("{}").alias("props"))
     .write.parquet(src))
    ev = read_event_stream(spark, src)
    q = run_available_now(session_counts(ev, gap="30 minutes",
                                         watermark="10 minutes"),
                          checkpoint=str(tmp_path / "cp"))
    out = spark.table(q.mem_table).filter(F.col("user_id") == 7).collect()
    assert sorted(r["n"] for r in out) == [1, 2]  # two sessions for user 7


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-user running aggregates accumulate across
    micro-batches (two source files -> two batches with maxFilesPerTrigger)."""
    from vivace_graph_v3_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    rows1 = [(1, "2024-01-01 00:00:00", 7, 1.0), (2, "2024-01-01 00:01:00", 7, 2.0),
             (3, "2024-01-01 00:02:00", 8, 5.0)]
    rows2 = [(4, "2024-01-01 00:03:00", 7, 3.0)]
    for i, rows in enumerate((rows1, rows2)):
        (spark.createDataFrame(rows, "event_id long, t string, user_id long, value double")
         .select("event_id",
                 (F.unix_timestamp("t").cast("long") * 1_000_000_000).alias("ts"),
                 "user_id", F.lit("click").alias("event_type"), "value",
                 F.lit("{}").alias("props"))
         .coalesce(1).write.mode("append").parquet(src))

    from vivace_graph_v3_spark.streaming.events import (
        read_event_stream, run_available_now)
    ev = read_event_stream(spark, src, max_files_per_trigger=1)
    q = run_available_now(running_totals(ev), checkpoint=str(tmp_path / "cp"),
                          timeout=20)
    out = spark.table(q.mem_table).collect()
    by_user = {}
    for r in out:  # last non-final row per key wins
        if not r["final"]:
            by_user[r["key"]] = (r["n"], r["total"])
    assert by_user["7"] == (3, 6.0)
    assert by_user["8"] == (1, 5.0)


def test_dedup_stream_replayed_files(spark, tmp_path):
    """A replayed source file (at-least-once delivery) must come out exactly
    once, keyed by (event_id, event_time)."""
    import shutil

    src = tmp_path / "feed"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "batch1.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "batch2.parquet")

    from vivace_graph_v3_spark.streaming.events import dedup_stream

    ev = read_event_stream(spark, str(src))
    out = dedup_stream(ev, keys=["event_id"], watermark="1 hour")
    q = run_available_now(out, checkpoint=str(tmp_path / "cp"))
    got = spark.table(q.mem_table)

    n_src = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Duplicates re-stamped with different event times dedup on the key
    alone when within the watermark."""
    import shutil

    src = tmp_path / "feed"
    src.mkdir()
    # write both deliveries from the normalized frame so the stream
    # directory has a homogeneous ts type regardless of the source layout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    norm = normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    norm.coalesce(1).write.parquet(str(tmp_path / "stage1"))
    shutil.copy(next((tmp_path / "stage1").glob("part-*.parquet")),
                src / "batch1.parquet")
    # second delivery of the same events, re-stamped 10 min later
    (norm.withColumn("ts", F.col("ts") + F.lit(600_000_000_000))
        .coalesce(1)
        .write.parquet(str(tmp_path / "stage2")))
    shutil.copy(next((tmp_path / "stage2").glob("part-*.parquet")),
                src / "batch2.parquet")

    from vivace_graph_v3_spark.streaming.events import dedup_stream

    ev = read_event_stream(spark, str(src))
    out = dedup_stream(ev, keys=["event_id"], watermark="2 hours",
                       within_watermark=True)
    q = run_available_now(out, checkpoint=str(tmp_path / "cp"))
    n_src = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert spark.table(q.mem_table).select("event_id").distinct().count() == n_src


def test_correlate_streams_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join (view->click correlation within 15
    min per user) must equal the batch join on a drained finite source."""
    from vivace_graph_v3_spark.streaming.events import correlate_streams

    ev = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    out = correlate_streams(views, clicks, key="user_id",
                            within="15 minutes", watermark="1 hour")
    q = run_available_now(out, checkpoint=str(tmp_path / "cp"))
    got = {(r["user_id"], r["left_event_id"], r["right_event_id"])
           for r in spark.table(q.mem_table).collect()}

    batch = (normalize_event_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"))
        .withColumn("event_time",
                    F.timestamp_micros((F.col("ts") / 1000).cast("long"))))
    bv = batch.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("lid"),
        F.col("event_time").alias("lt"))
    bc = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("ruid"), F.col("event_id").alias("rid"),
        F.col("event_time").alias("rt"))
    want = {(r["user_id"], r["lid"], r["rid"])
            for r in bv.join(bc, (F.col("user_id") == F.col("ruid"))
                             & (F.col("lt") <= F.col("rt"))
                             & (F.col("lt") >= F.col("rt")
                                - F.expr("INTERVAL 15 minutes"))).collect()}
    assert want, "fixture must produce at least one correlated pair"
    # stream-stream inner join under availableNow may withhold pairs newer
    # than the final watermark; everything emitted must be correct, and
    # everything strictly older than the last emitted right_time must be
    # present
    assert got
    assert got <= want
    missing = want - got
    if missing:
        last_rt = max(r["right_time"]
                      for r in spark.table(q.mem_table).collect())
        by_key = {(r["user_id"], r["lid"], r["rid"]): r["rt"]
                  for r in bv.join(bc, (F.col("user_id") == F.col("ruid"))
                                   & (F.col("lt") <= F.col("rt"))
                                   & (F.col("lt") >= F.col("rt")
                                      - F.expr("INTERVAL 15 minutes"))).collect()}
        assert all(by_key[m] >= last_rt for m in missing)


def test_stateful_streaming_anomalies(spark, tmp_path):
    """Streaming 3-sigma flags: baseline accumulates across batches; an
    outlier arriving in a later batch is flagged against PRIOR moments."""
    from vivace_graph_v3_spark.streaming.events import (
        read_event_stream, run_available_now)
    from vivace_graph_v3_spark.streaming.stateful import streaming_anomalies

    src = str(tmp_path / "src")
    base = [(i, f"2024-01-01 00:{i:02d}:00", 7, float(10 + (i % 3)))
            for i in range(10)]
    spike = [(99, "2024-01-01 01:00:00", 7, 1000.0),
             (100, "2024-01-01 01:01:00", 7, 11.0)]
    for rows in (base, spike):
        (spark.createDataFrame(
            rows, "event_id long, t string, user_id long, value double")
         .select("event_id",
                 (F.unix_timestamp("t").cast("long")
                  * 1_000_000_000).alias("ts"),
                 "user_id", F.lit("click").alias("event_type"), "value",
                 F.lit("{}").alias("props"))
         .coalesce(1).write.mode("append").parquet(src))

    ev = read_event_stream(spark, src, max_files_per_trigger=1)
    q = run_available_now(streaming_anomalies(ev),
                          checkpoint=str(tmp_path / "cp"), timeout=20)
    rows = spark.table(q.mem_table).collect()
    assert len(rows) == 12  # every event emitted exactly once
    spikes = [r for r in rows if r["value"] == 1000.0]
    assert spikes and spikes[0]["is_anomaly"] and spikes[0]["n_seen"] == 10
    # ordinary values never flag, including the one after the spike
    assert not any(r["is_anomaly"] for r in rows if r["value"] != 1000.0)


def test_anomaly_update_folds_in_event_time_order():
    """_anomaly_update must be deterministic in the face of arbitrary
    micro-batch row order: the fold sorts by event_ms first (ADVICE r3),
    so a shuffled batch produces bit-identical output to a sorted one."""
    import pandas as pd

    from vivace_graph_v3_spark.streaming.stateful import _anomaly_update

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.saved = v

        def setTimeoutDuration(self, ms):
            pass

    base = pd.DataFrame({
        "event_ms": [1000 * i for i in range(12)],
        "value": [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.0, 10.0,
                  1000.0, 10.0, 11.0],
    })
    shuffled = base.sample(frac=1.0, random_state=7).reset_index(drop=True)

    def run(pdf):
        st = FakeState()
        out = pd.concat(list(_anomaly_update(("k",), iter([pdf]), st)),
                        ignore_index=True)
        return out.sort_values("event_ms").reset_index(drop=True), st.saved

    out_sorted, st_a = run(base)
    out_shuf, st_b = run(shuffled)
    pd.testing.assert_frame_equal(out_sorted, out_shuf)
    assert st_a == st_b
    spike = out_sorted[out_sorted["value"] == 1000.0].iloc[0]
    assert bool(spike["is_anomaly"]) and int(spike["n_seen"]) == 9


def test_anomaly_update_exact_at_double_breaking_scale():
    """ADVICE r6: once per-key sums pass ~2^26.5 units, (n*v - s1)^2 and
    s1*s1 exceed 2^53 and the double-rounded 3-sigma inequality can flip
    vs an exact-integer oracle. The values below are a concrete flip
    case (double arithmetic says False, exact integers say True) — the
    operator must take the exact branch, and its persisted state must
    round-trip the accumulators losslessly (decimal(38,0), not double)."""
    from decimal import Decimal

    import pandas as pd

    from vivace_graph_v3_spark.streaming.stateful import _anomaly_update

    prior = [187768204, 187768202, 187768205, 187768200,
             187768199, 187768202]
    v = 187768194
    n, s1 = len(prior), sum(prior)
    s2 = sum(x * x for x in prior)
    # the case is genuinely adversarial: the old double formula disagrees
    assert ((n * float(v) - float(s1)) ** 2
            > 9.0 * (n * float(s2) - float(s1) * float(s1))) is False
    assert ((n * v - s1) ** 2 > 9 * (n * s2 - s1 * s1)) is True

    class FakeState:
        hasTimedOut = False

        def __init__(self):
            self.exists = False

        def update(self, val):
            self.saved, self.exists = val, True

        @property
        def get(self):
            return self.saved

        def setTimeoutDuration(self, ms):
            pass

    st = FakeState()
    batch1 = pd.DataFrame({"event_ms": [1000 * i for i in range(n)],
                           "value": [float(x) for x in prior]})
    list(_anomaly_update(("k",), iter([batch1]), st))
    # state carries exact integers as Decimal — no double rounding
    sn, ss1, ss2 = st.saved
    assert (sn, int(ss1), int(ss2)) == (n, s1, s2)
    assert isinstance(ss1, Decimal) and isinstance(ss2, Decimal)
    batch2 = pd.DataFrame({"event_ms": [1000 * n], "value": [float(v)]})
    (out,) = list(_anomaly_update(("k",), iter([batch2]), st))
    assert bool(out.iloc[0]["is_anomaly"]) is True  # the exact verdict


def test_stateful_contract_run_carries_state_across_batches(spark):
    """The stateful contract artifact (entry_queries._session_stateful_run)
    must genuinely exercise CROSS-BATCH state: the 4-file event-id-range
    source means most keys appear in several micro-batches, so their
    running-total rows must show strictly growing n — and the final
    accumulation must equal the batch aggregate."""
    import pyspark.sql.functions as F

    from vivace_graph_v3_spark import entry_queries as eq

    base = eq._session_stateful_run(spark, SF_DIR)
    t = spark.read.parquet(f"{base}/totals").filter(~F.col("final"))
    per_key = (t.groupBy("key").agg(F.count(F.lit(1)).alias("n_rows"),
                                    F.max("n").alias("n_max"))
               .collect())
    multi = [r for r in per_key if r["n_rows"] >= 2]
    assert multi, "no key appeared in more than one micro-batch"
    # rows per key are distinct accumulation points: max n == total events
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {str(r["user_id"]): r["c"] for r in
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    got = {r["key"]: r["n_max"] for r in per_key}
    assert got == want


def test_stream_sessionize_gap_and_carry(spark, tmp_path):
    """applyInPandasWithState sessionizer: a >gap event-time break closes
    the session exactly once, open state carries across micro-batches,
    and closed + final-open equals the batch sessionization."""
    from vivace_graph_v3_spark.streaming.stateful import stream_sessionize

    src = str(tmp_path / "src")
    # user 7: events at t=1,2 (batch 1), then t=500 (batch 2) -> gap
    # 498*1000ms > 300000 closes (1..2), opens (500). user 8: one event.
    rows1 = [(1, 7, 1.0), (2, 7, 2.0), (3, 8, 5.0)]
    rows2 = [(500, 7, 3.0)]
    for i, rows in enumerate((rows1, rows2)):
        (spark.createDataFrame(rows, "t long, user_id long, value double")
         .coalesce(1).write.mode("append").parquet(src))

    stream = (spark.readStream
              .schema("t long, user_id long, value double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_sessionize(stream, key_col="user_id", value_col="value",
                            ts_col="t", gap_ms=300_000)
    q = (out.writeStream.format("memory").queryName("sess_t")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.table("sess_t").collect()
    closed = [r for r in got if r["closed"]]
    assert len(closed) == 1
    c = closed[0]
    assert (c["key"], c["session_start_ms"], c["session_end_ms"],
            c["n_events"], c["total"]) == ("7", 1000, 2000, 2, 3.0)
    # final open snapshot per key = greatest end-ms
    finals = {}
    for r in got:
        if not r["closed"]:
            cur = finals.get(r["key"])
            if cur is None or r["session_end_ms"] > cur["session_end_ms"]:
                finals[r["key"]] = r
    assert finals["7"]["session_start_ms"] == 500000
    assert finals["7"]["n_events"] == 1 and finals["7"]["total"] == 3.0
    assert finals["8"]["n_events"] == 1 and finals["8"]["total"] == 5.0


def test_stream_rate_limit_budget_spans_batches(spark, tmp_path):
    """applyInPandasWithState rate limiter: the per-(key, window) budget
    carries across micro-batches — events of one window split over two
    batches share one quota."""
    from vivace_graph_v3_spark.streaming.stateful import stream_rate_limit

    src = str(tmp_path / "src")
    # window size 1000 ms = 1 t-unit... use window_ms=5000: t in [0,5)
    # is window 0. Batch 1 has t=1,2; batch 2 has t=3,4 (same window) and
    # t=7 (next window).
    rows1 = [(1, 7), (2, 7)]
    rows2 = [(3, 7), (4, 7), (7, 7)]
    for rows in (rows1, rows2):
        (spark.createDataFrame(rows, "t long, user_id long")
         .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream.schema("t long, user_id long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_rate_limit(stream, key_col="user_id", ts_col="t",
                            limit_per_window=3, window_ms=5000)
    q = (out.writeStream.format("memory").queryName("rate_t")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["event_ms"]: r for r in spark.table("rate_t").collect()}
    assert len(got) == 5
    # window 0 holds t=1,2,3,4 -> positions 1..4; limit 3 rejects the 4th
    assert [got[t * 1000]["admitted"] for t in (1, 2, 3, 4)] == [
        True, True, True, False]
    assert got[4000]["n_in_window"] == 4
    # t=7 opens window 1 with a fresh budget
    assert got[7000]["admitted"] and got[7000]["n_in_window"] == 1
