"""Slowly-changing-dimension (type 2) history builder.

Every lakehouse warehouse needs the CDC-to-dimension step: turn an
append-only change log into a versioned dimension table with validity
intervals — Kimball's SCD type 2. The reference engine's MVCC revision
chain (vivace-graph-v3 node revisions, transaction.lisp) answers the same
"what did this row look like at time T" question; this operator is the
relational, batch-friendly face of it.

Shape: consecutive identical attribute values compress into one version
(a change log often re-states unchanged rows), then each surviving run
start becomes a version row [valid_from, valid_to) with ``is_current`` on
the open tail.

Scale: ONE shuffle on the business key serves both windows (run
compression and interval assignment use the same partitioning, so
Catalyst plans a single Exchange and two Window operators over it).
Per-key frames are history-bounded, never corpus-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_build(changes: DataFrame, key_col: str, ts_col: str,
               attr_cols: list[str], *,
               tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Build an SCD2 dimension from a change log.

    Returns one row per attribute RUN per key:
    (key, *attrs, valid_from, valid_to, version, is_current) where
    valid_to is the next run's valid_from (null on the current run) and
    version is the 1-based run index within the key.

    ``tiebreak_cols`` make same-timestamp changes deterministic (pass the
    log's unique id column); without one, equal-timestamp runs would
    compress in an engine-dependent order.
    """
    tb = tiebreak_cols or []
    w = Window.partitionBy(key_col).orderBy(ts_col, *tb)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    runs = (changes
            .withColumn("_prev", F.lag(attrs).over(w))
            .withColumn("_new", F.col("_prev").isNull()
                        | (attrs != F.col("_prev")))
            .filter(F.col("_new"))
            .drop("_prev", "_new"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *tb)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return runs.select(
        key_col, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        nxt.isNull().alias("is_current"))


def scd2_lookup(dim: DataFrame, at_ts, *, ts_from: str = "valid_from",
                ts_to: str = "valid_to") -> DataFrame:
    """Point-in-time slice of an SCD2 dimension: rows whose
    [valid_from, valid_to) interval covers ``at_ts``. A pure filter —
    partition/zone-map prunable when the dimension is written sorted by
    valid_from, so the time-travel read never scans closed history."""
    t = F.lit(at_ts)
    return dim.filter((F.col(ts_from) <= t)
                      & (F.col(ts_to).isNull() | (F.col(ts_to) > t)))
