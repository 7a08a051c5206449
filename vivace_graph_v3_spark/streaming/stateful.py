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
STATE_SCHEMA = "n long, total double, last_event_ms long"


def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame([{"key": key[0], "n": n, "total": total,
                             "last_event_ms": last, "final": True}])
        return
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["event_ms"].max()))
    state.update((n, total, last))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame([{"key": key[0], "n": n, "total": total,
                         "last_event_ms": last, "final": False}])


def running_totals(events: DataFrame, *, key_col: str = "user_id",
                   value_col: str = "value",
                   ts_col: str = "event_time") -> DataFrame:
    """Per-key running (count, sum) over a stream; one output row per key per
    micro-batch, plus a ``final`` row when a key's state times out.

    Input must be a streaming DataFrame with the given columns. All state
    transfer is Arrow-batched pandas (no row-at-a-time Python)."""
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
