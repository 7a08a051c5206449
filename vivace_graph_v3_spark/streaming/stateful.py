"""Custom stateful streaming operator: per-key running aggregates with
``applyInPandasWithState``.

The reference's only stateful abstraction is incremental view maintenance on
commit (views.lisp:331-374) — a per-key running reduce. This module is its
streaming generalization (and the SURVEY §2.8 "custom stateful operator"
slot): arbitrary per-key state carried across micro-batches with timeout
eviction, the building block for running counters, rate limiting, per-user
quotas, or change detection over the txn log / event feed.

``running_totals`` maintains (count, sum, max_ts) per key; state for keys
idle past ``idle_timeout`` is evicted and emitted with ``final=True`` — the
watermark-driven analog of closing a session.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("key string, n long, total double, last_event_ms long, "
              "final boolean")
# total carries as an EXACT integer accumulator of pre-quantized units
# (decimal(38,0) state, same contract as the anomaly operator below):
# a double state cell silently loses low bits once a key's running sum
# passes 2^53, diverging from an integer relational oracle. The OUTPUT
# stays double (one IEEE-correct cast at emit — the same cast the
# oracle applies to its BIGINT sum).
STATE_SCHEMA = "n long, total decimal(38,0), last_event_ms long"


def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    from decimal import Decimal

    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame([{"key": key[0], "n": n, "total": float(total),
                             "last_event_ms": last, "final": True}])
        return
    if state.exists:
        n, total, last = state.get
        total = int(total)
    else:
        n, total, last = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            total += int(pdf["value"].astype("int64").sum())
            last = max(last, int(pdf["event_ms"].max()))
    state.update((n, Decimal(total), last))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame([{"key": key[0], "n": n, "total": float(total),
                         "last_event_ms": last, "final": False}])


def running_totals(events: DataFrame, *, key_col: str = "user_id",
                   value_col: str = "value",
                   ts_col: str = "event_time") -> DataFrame:
    """Per-key running (count, sum) over a stream; one output row per key per
    micro-batch, plus a ``final`` row when a key's state times out.

    Input must be a streaming DataFrame with the given columns. All state
    transfer is Arrow-batched pandas (no row-at-a-time Python).

    Contract: ``value_col`` holds pre-quantized integer units (e.g.
    cents) — the running sum carries as an exact arbitrary-precision
    integer in state (decimal(38,0) storage) and is cast to double once
    at emit, so it matches an integer relational oracle at any scale,
    not just below the 2^53 double mantissa."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_update, OUT_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def _noop(*_a: Any) -> None:  # pragma: no cover
    return None


# -- streaming anomaly detection ----------------------------------------------

ANOM_OUT_SCHEMA = ("key string, event_ms long, value double, "
                   "n_seen long, is_anomaly boolean")
# s1/s2 are EXACT integer accumulators (sum of units, sum of squared
# units) stored as decimal(38,0): doubles lose the low bits of
# (n*v - s1)^2 once per-key sums pass ~2^26.5 units and the 3-sigma
# inequality can flip against an exact-integer oracle; decimal(38,0)
# round-trips Python ints up to 1e38 through Arrow with no rounding.
ANOM_STATE_SCHEMA = "n long, s1 decimal(38,0), s2 decimal(38,0)"


def _anomaly_update(key: tuple, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:  # pragma: no cover - eviction only frees state
        state.remove()
        return
    if state.exists:
        n, s1, s2 = state.get
        n, s1, s2 = int(n), int(s1), int(s2)
    else:
        n, s1, s2 = 0, 0, 0
    out: list[dict] = []
    # fold in event-time order: micro-batch row order is partition/arrival
    # dependent, and "tested against the moments of events BEFORE it" must
    # mean before in EVENT time or n_seen/is_anomaly are nondeterministic
    # across runs
    frames = [p for p in pdfs if len(p)]
    for pdf in ([pd.concat(frames, ignore_index=True)
                 .sort_values("event_ms", kind="mergesort")]
                if frames else []):
        for ms, v in zip(pdf["event_ms"], pdf["value"]):
            v = float(v)
            # values arrive as pre-quantized integer units (the operator
            # contract — callers pass e.g. cents); all moments carry as
            # arbitrary-precision Python ints so the inequality is exact
            # at ANY scale, matching a BIGINT/HUGEINT relational oracle
            vi = int(v)
            # test against the moments of PRIOR events only (an anomaly
            # must not dilute the baseline it is judged against);
            # (n*v - s1)^2 > 9*(n*s2 - s1^2), the batch entry's exact
            # rational form — needs n >= 2 for a defined variance
            flag = bool(n >= 2
                        and (n * vi - s1) ** 2 > 9 * (n * s2 - s1 * s1))
            out.append({"key": key[0], "event_ms": int(ms), "value": v,
                        "n_seen": n, "is_anomaly": flag})
            n, s1, s2 = n + 1, s1 + vi, s2 + vi * vi
    from decimal import Decimal

    state.update((n, Decimal(s1), Decimal(s2)))
    state.setTimeoutDuration(300_000)
    yield pd.DataFrame(out, columns=["key", "event_ms", "value",
                                     "n_seen", "is_anomaly"])


def streaming_anomalies(events: DataFrame, *, key_col: str = "user_id",
                        value_col: str = "value",
                        ts_col: str = "event_time") -> DataFrame:
    """Streaming 3-sigma anomaly flags: per-key running moments carried
    across micro-batches (the streaming face of the batch
    ``events_anomalies`` entry); each event is tested against the
    moments of the events BEFORE it, so a burst of outliers cannot
    normalize itself away within a batch. Arrow-batched state, timeout
    eviction for idle keys.

    Contract: ``value_col`` holds pre-quantized integer units (e.g.
    cents) — the moments accumulate as exact arbitrary-precision
    integers in state (decimal(38,0) storage), so the 3-sigma
    inequality is bit-exact against an integer relational oracle at any
    scale, not just below the 2^53 double mantissa."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_anomaly_update, ANOM_OUT_SCHEMA,
                                    ANOM_STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


# -- streaming sessionization --------------------------------------------------

SESS_OUT_SCHEMA = ("key string, session_start_ms long, session_end_ms long, "
                   "n_events long, total double, closed boolean")
# total carries as an exact integer accumulator (decimal(38,0) state,
# same contract as running_totals above): callers pass pre-quantized
# integer units so the per-session sum matches a BIGINT relational
# oracle at any scale.
SESS_STATE_SCHEMA = ("start_ms long, last_ms long, n long, "
                     "total decimal(38,0)")


def stream_sessionize(events: DataFrame, *, key_col: str = "user_id",
                      value_col: str = "value", ts_col: str = "event_time",
                      gap_ms: int = 300_000) -> DataFrame:
    """Custom stateful SESSIONIZATION over a stream: per-key sessions
    close when the event-time gap to the next event exceeds ``gap_ms``,
    with open-session state carried across micro-batches — the streaming
    twin of the batch lag/cumulative-break sessionizer (events_sessions)
    and the classic idle-timeout web-session semantics
    (cf. F.session_window, whose merge logic this reimplements with
    explicit user state so downstream logic can ride the open/closed
    distinction).

    Emits one row per CLOSED session the moment the closing gap is
    observed (each closed session exactly once — deterministic under a
    deterministic source order), plus a ``closed=False`` snapshot of the
    key's open session at each micro-batch where the key saw events; the
    final open session per key is the snapshot with the greatest
    ``session_end_ms``, which makes closed ∪ final-open exactly the
    batch sessionization — relational-oracle-checkable end to end.

    Per-batch events fold in EVENT-time order (micro-batch row order is
    partition/arrival dependent). Timeout eviction only frees state for
    keys idle past 60 s of processing time; the open snapshot was
    already emitted, so eviction never loses a session. All state
    transfer is Arrow-batched pandas."""
    from pyspark.sql import functions as F

    gap = int(gap_ms)

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        from decimal import Decimal

        if state.hasTimedOut:  # pragma: no cover - eviction frees state
            state.remove()
            return
        if state.exists:
            start, last, n, tot = state.get
            start, last, n, tot = int(start), int(last), int(n), int(tot)
        else:
            start = None
            last = n = tot = 0
        out: list[dict] = []
        frames = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(frames, ignore_index=True)
                     .sort_values("event_ms", kind="mergesort")]
                    if frames else []):
            for ms, v in zip(pdf["event_ms"], pdf["value"]):
                ms, vi = int(ms), int(v)
                if start is not None and ms - last > gap:
                    out.append({"key": key[0], "session_start_ms": start,
                                "session_end_ms": last, "n_events": n,
                                "total": float(tot), "closed": True})
                    start = None
                if start is None:
                    start, last, n, tot = ms, ms, 1, vi
                else:
                    last, n, tot = ms, n + 1, tot + vi
        if start is not None:
            state.update((start, last, n, Decimal(tot)))
            state.setTimeoutDuration(60_000)
            out.append({"key": key[0], "session_start_ms": start,
                        "session_end_ms": last, "n_events": n,
                        "total": float(tot), "closed": False})
        if out:
            yield pd.DataFrame(out)

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_update, SESS_OUT_SCHEMA,
                                    SESS_STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


# -- streaming per-key rate limiting -------------------------------------------

RATE_OUT_SCHEMA = ("key string, event_ms long, window_id long, "
                   "n_in_window long, admitted boolean")
RATE_STATE_SCHEMA = "window_id long, n long"


def stream_rate_limit(events: DataFrame, *, key_col: str = "user_id",
                      ts_col: str = "event_time",
                      limit_per_window: int = 5,
                      window_ms: int = 1_000_000) -> DataFrame:
    """Per-key event-time RATE LIMITER over a stream: each key admits at
    most ``limit_per_window`` events per tumbling event-time window
    (window_id = event_ms div window_ms) and marks the rest rejected —
    the quota/throttle/abuse-gate shape, with the (window, count) state
    carried across micro-batches so a window that spans batch boundaries
    keeps one consistent budget.

    Emits EVERY event exactly once with its admission verdict and its
    position in the window — deterministic under a deterministic source
    order because per-batch events fold in event-time order, which makes
    the verdict a pure function of the event history (oracle: one
    row_number per (key, window)). Timeout eviction frees state for idle
    keys; a stale window's counter is never needed again because event
    time only moves forward per key in this source convention. All state
    transfer is Arrow-batched pandas."""
    from pyspark.sql import functions as F

    lim, wms = int(limit_per_window), int(window_ms)

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - eviction frees state
            state.remove()
            return
        if state.exists:
            wid, n = state.get
            wid, n = int(wid), int(n)
        else:
            wid, n = -1, 0
        out: list[dict] = []
        frames = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(frames, ignore_index=True)
                     .sort_values("event_ms", kind="mergesort")]
                    if frames else []):
            for ms in pdf["event_ms"]:
                ms = int(ms)
                w = ms // wms
                if w != wid:
                    wid, n = w, 0
                n += 1
                out.append({"key": key[0], "event_ms": ms, "window_id": w,
                            "n_in_window": n, "admitted": n <= lim})
        state.update((wid, n))
        state.setTimeoutDuration(60_000)
        if out:
            yield pd.DataFrame(out)

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_update, RATE_OUT_SCHEMA,
                                    RATE_STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


# -- streaming exactly-once dedup ----------------------------------------------

DEDUP_OUT_SCHEMA = ("key string, event_ms long, value long, "
                    "is_first boolean")
DEDUP_STATE_SCHEMA = "seen array<long>"


def stream_dedup(events: DataFrame, *, key_col: str = "user_id",
                 value_col: str = "value",
                 ts_col: str = "event_time") -> DataFrame:
    """Custom stateful exactly-once DEDUP over a stream: per key, the
    FIRST occurrence of each value is flagged ``is_first=True`` and
    every later occurrence False, with the seen-set carried across
    micro-batches — the streaming twin of the batch first-occurrence
    dedup (row_number() = 1 over (key, value) by event time), and the
    ingest-side guarantee a training-data pipeline needs before a sink
    that must not double-count.

    Every input event is emitted exactly once (with its verdict), so
    the drain is coverage-checkable against the input count. Per-batch
    events fold in EVENT-time order. State is the per-key distinct
    value set; production deployments bound it with an event-time TTL
    (the same watermark discipline as dropDuplicates withWatermark) —
    the contract face runs un-evicted inside its bounded drain so the
    relational oracle is exact. All state transfer is Arrow-batched
    pandas."""
    from pyspark.sql import functions as F

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - eviction frees state
            state.remove()
            return
        seen = set(int(v) for v in state.get[0]) if state.exists else set()
        frames = [p for p in pdfs if len(p)]
        out = None
        if frames:
            pdf = (pd.concat(frames, ignore_index=True)
                   .sort_values("event_ms", kind="mergesort"))
            # vectorized first-occurrence verdict (guide §4.2): an event is
            # first iff its value is neither in the carried seen-set nor a
            # within-batch repeat (stable sort above = event-time order, so
            # duplicated(keep='first') marks exactly the later repeats)
            vals = pdf["value"].astype("int64")
            is_first = ~(vals.duplicated(keep="first")
                         | vals.isin(seen)).to_numpy()
            seen.update(int(v) for v in vals.unique())
            out = pd.DataFrame({"key": key[0],
                                "event_ms": pdf["event_ms"].astype("int64"),
                                "value": vals,
                                "is_first": is_first})
        state.update((sorted(seen),))
        state.setTimeoutDuration(60_000)
        if out is not None and len(out):
            yield out

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias("value"),
        (F.col(ts_col).cast("double") * 1000).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_update, DEDUP_OUT_SCHEMA,
                                    DEDUP_STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


LATE_OUT_SCHEMA = ("key string, event_ms long, value long, "
                   "is_late boolean, watermark_ms long")
LATE_STATE_SCHEMA = "max_ms long"


def stream_late_audit(events: DataFrame, *, key_col: str = "user_id",
                      value_col: str = "value",
                      ts_col: str = "event_time",
                      delay_ms: int = 0) -> DataFrame:
    """Per-key WATERMARK accounting over a stream: each key's state is
    the max event time it has seen; an event arriving in a later
    micro-batch with ``event_ms + delay_ms`` BELOW that high-water mark
    is flagged late — the mechanism behind Structured Streaming's
    withWatermark drop decisions, surfaced as an auditable per-event
    verdict instead of a silent drop (the report a pipeline needs to
    SIZE its allowed-lateness delay before committing to one).

    Semantics (batch-boundary deterministic): the watermark each event
    is judged against is the state BEFORE its micro-batch (within-batch
    events fold in event-time order, so within-batch arrivals are never
    late against each other — exactly Spark's batch-granular watermark
    advance). Every event emits exactly once with its verdict and the
    watermark it was judged against (-1 when the key has no prior
    batch). State is ONE long per key — O(keys), TTL-evictable. All
    state transfer is Arrow-batched pandas."""
    from pyspark.sql import functions as F

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - eviction frees state
            state.remove()
            return
        max_ms = int(state.get[0]) if state.exists else None
        out = None
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = (pd.concat(frames, ignore_index=True)
                   .sort_values("event_ms", kind="mergesort"))
            wm = max_ms  # high-water mark BEFORE this batch
            ms = pdf["event_ms"].astype("int64")
            # vectorized verdict (guide §4.2): the watermark every event
            # is judged against is fixed for the whole batch, so there is
            # no sequential dependence to fold row by row
            late = (ms + delay_ms < wm) if wm is not None else False
            out = pd.DataFrame({"key": key[0], "event_ms": ms,
                                "value": pdf["value"].astype("int64"),
                                "is_late": late,
                                "watermark_ms": wm if wm is not None
                                else -1})
            batch_max = int(ms.max())
            max_ms = batch_max if max_ms is None else max(max_ms,
                                                          batch_max)
        state.update((max_ms if max_ms is not None else -1,))
        state.setTimeoutDuration(60_000)
        if out is not None and len(out):
            yield out

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("long").alias("value"),
        F.col(ts_col).cast("long").alias("event_ms"))
    return (prepared.groupBy("key")
            .applyInPandasWithState(_update, LATE_OUT_SCHEMA,
                                    LATE_STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))
