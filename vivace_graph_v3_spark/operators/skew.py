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


def ranked_two_phase(df: DataFrame, order_cols: list[str], *,
                     rank_col: str = "rank",
                     num_partitions: int | None = None) -> DataFrame:
    """Global dense row-number over ``order_cols`` (which must form a
    TOTAL order — include a unique tiebreak) WITHOUT the single-partition
    window funnel: the classic two-phase global sort rank.

    Phase 1: ``repartitionByRange(order_cols)`` — Spark's range
    partitioner samples boundaries, so partition i holds strictly
    smaller keys than partition i+1 and every partition ranks in
    PARALLEL with a partition-local window.
    Phase 2: per-partition row counts (|partitions| rows) cumsum into
    start offsets, broadcast-joined back: ``rank = offset + local``.

    At 100 TB this is the only viable global-rank shape — the direct
    ``Window.orderBy`` moves the entire frame through one task. Equality
    with the direct window is property-tested; the plan carries no
    SinglePartition exchange on the data path (gated in test_plans)."""
    if num_partitions:
        parts = df.repartitionByRange(num_partitions, *order_cols)
    else:
        parts = df.repartitionByRange(*order_cols)
    from pyspark.sql import Window
    parts = parts.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = parts.withColumn("__lrank", F.row_number().over(w))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # offsets frame is |partitions| rows — the one tiny global window
    wo = (Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(wo), F.lit(0)))
    return (local.join(F.broadcast(offsets.select("__pid", "__off")),
                       "__pid")
            .withColumn(rank_col, (F.col("__off") + F.col("__lrank"))
                        .cast("long"))
            .drop("__pid", "__lrank", "__off"))


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnosis — the numbers you need BEFORE deciding
    between a plain shuffle join, a broadcast, salting, or an AQE skew
    split: per-key fanout distribution of a prospective join key.

    Returns one row: (n_rows, n_keys, max_per_key, p50_per_key,
    p99_per_key, top1_share_ppm). Percentiles are exact lower
    percentiles over the VALUE GRID of per-key counts (a grid bounded
    by the number of DISTINCT fanout sizes — tiny even when keys are
    billions), so the whole profile is one map-side-combined count
    aggregate plus grid-sized work; all integer arithmetic.

    Reading it: max_per_key * row_width ~ the largest single-task
    payload a shuffle join would see; top1_share near 1e6 means one hot
    key dominates (salt it); p99/p50 >> 1 means a long tail (AQE skew
    join handles it)."""
    from pyspark.sql import Window

    counts = (df.select(F.col(key_col).alias("k"))
              .groupBy("k").agg(F.count(F.lit(1)).alias("c")))
    grid = counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_keys_c"))
    w = (Window.partitionBy(F.lit(1)).orderBy("c")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = grid.withColumn("cum", F.sum("n_keys_c").over(w))
    tot = grid.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("n_keys_c"))
        .cast("long").alias("n_rows"),
        F.sum("n_keys_c").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_per_key"))
    pct = (cum.crossJoin(F.broadcast(tot))
           .agg(F.min(F.when(F.col("cum") * 2 >= F.col("n_keys"),
                             F.col("c"))).cast("long").alias("p50_per_key"),
                F.min(F.when(F.col("cum") * 100 >= F.col("n_keys") * 99,
                             F.col("c"))).cast("long")
                .alias("p99_per_key")))
    return (tot.crossJoin(F.broadcast(pct))
            .select("n_rows", "n_keys", "max_per_key", "p50_per_key",
                    "p99_per_key",
                    F.expr("max_per_key * 1000000 div n_rows")
                    .cast("long").alias("top1_share_ppm")))


def join_cardinality_audit(left: DataFrame, right: DataFrame,
                           left_key: str, right_key: str) -> DataFrame:
    """Pre-join cardinality audit: the EXACT output size of an equi-join
    (sum over keys of a_k * b_k, computed from the two per-key count
    tables — key-bounded work, never the join itself) next to the
    textbook independence estimate n_a * n_b / max(d_a, d_b) that a
    Selinger-style optimizer would use. The ratio tells you how wrong
    the uniform assumption is on this key BEFORE you pay for the join —
    the companion diagnostic to key_skew_profile.

    Returns one row: (n_left, n_right, d_left, d_right, exact_rows,
    estimate_rows, err_ppm) with err = |exact - est| / exact. Products
    accumulate in DECIMAL(38,0) (a_k * b_k sums reach n_a * n_b at the
    hot-key extreme)."""
    a = (left.select(F.col(left_key).alias("k"))
         .groupBy("k").agg(F.count(F.lit(1)).alias("a")))
    b = (right.select(F.col(right_key).alias("k"))
         .groupBy("k").agg(F.count(F.lit(1)).alias("b")))
    j = (a.join(b, "k")
         .agg(F.sum(F.col("a").cast("decimal(38,0)") * F.col("b"))
              .cast("long").alias("exact_rows")))
    ta = a.agg(F.sum("a").cast("long").alias("n_left"),
               F.count(F.lit(1)).cast("long").alias("d_left"))
    tb = b.agg(F.sum("b").cast("long").alias("n_right"),
               F.count(F.lit(1)).cast("long").alias("d_right"))
    est = F.expr("CAST(n_left AS DECIMAL(38,0)) * n_right"
                 " div greatest(d_left, d_right)")
    err = F.expr("CASE WHEN exact_rows = 0 THEN NULL ELSE"
                 " (abs(estimate_rows - exact_rows) * 2000000"
                 "  + exact_rows) div (exact_rows * 2) END")
    return (ta.crossJoin(tb).crossJoin(j)
            .withColumn("estimate_rows", est.cast("long"))
            .select("n_left", "n_right", "d_left", "d_right",
                    "exact_rows", "estimate_rows",
                    err.cast("long").alias("err_ppm")))
