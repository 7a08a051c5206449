"""Skew mitigation utilities: salted joins and two-phase distinct.

AQE's skew-join splitting (enabled by default in session.py) already
handles most skewed SORT-MERGE joins by splitting oversized partitions.
These helpers cover the cases AQE cannot:

- ``salted_join``: a skewed BROADCAST-ineligible join where one hot key
  floods a single task even after AQE splitting (AQE splits by partition
  size, but a single key's rows cannot be split across tasks for a plain
  hash join — salting CAN split them, at the cost of replicating the
  small side ``salts`` times).
- ``two_phase_distinct``: count-distinct over a skewed group key; the
  classic rewrite (dedupe on (key, value) first — that shuffle spreads a
  hot key across value-hash partitions — then count per key).

Both are pure DataFrame rewrites with identical semantics to the naive
formulation (property-tested), usable anywhere the engine's operators
meet a pathological key distribution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(skewed: DataFrame, small: DataFrame, on: list[str], *,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Join a SKEWED left side against a (relatively) small right side on
    ``on`` with ``salts``-way key salting: each skewed row gets a
    deterministic salt derived from its full row hash, the small side is
    replicated once per salt value, and the join runs on (key..., salt) —
    a hot key's rows now land on up to ``salts`` tasks instead of one.

    Cost model: replicates the small side ``salts`` times through the
    shuffle — worth it exactly when (hot-key rows / task budget) >
    ``salts`` x |small|. Supports 'inner' and 'left' (the sides where
    per-row multiplicity is preserved by construction)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                  F.lit(salts))
    left = skewed.withColumn("__salt", salt)
    right = (small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        .withColumn("__salt", F.col("__salt").cast("bigint")))
    return left.join(right, on + ["__salt"], how).drop("__salt")


def two_phase_distinct(df: DataFrame, key_cols: list[str],
                       value_col: str) -> DataFrame:
    """Exact count-distinct of ``value_col`` per key, skew-safe: phase 1
    dedupes (key, value) pairs — that shuffle hashes on BOTH columns, so
    a hot key spreads across partitions — phase 2 counts per key over the
    already-distinct pairs (map-side combinable). Returns
    (key..., n_distinct). Semantically identical to
    ``groupBy(key).agg(countDistinct(value))``, which plans the same hot
    key into one Expand partition — including on NULLs: dropDuplicates
    keeps at most one (key, NULL) row, and the null-skipping
    ``count(value)`` then ignores it, so keys holding NULLs are not
    over-counted and all-NULL keys report 0, exactly like countDistinct."""
    return (df.select(*key_cols, value_col).dropDuplicates()
            .groupBy(*key_cols)
            .agg(F.count(value_col).alias("n_distinct")))
