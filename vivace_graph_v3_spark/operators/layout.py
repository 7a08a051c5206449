"""Data-layout optimization: Z-order (Morton) clustering keys.

Writing a 100 TB table clustered on a space-filling curve over its two or
three hottest filter columns lets min/max-zone-map file skipping prune
multi-dimensional predicates — the standard lakehouse write optimization.
The key itself is pure integer bit arithmetic (whole-stage codegen,
map-only); ``zorder_write_plan`` shows the intended use: range-partition
by the key, sort within partitions, write.

Morton interleaving reference: the classic bit-interleave construction
(Morton 1966); widely used by lakehouse table formats for multi-column
data skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scale_to_bits(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column in [lo, hi] onto [0, 2^bits) by linear
    scaling — all-integer (numerator product stays under 2^63 for
    realistic ranges), so identical in every engine. Out-of-range values
    clamp."""
    span = max(hi - lo, 1)
    if span * ((1 << bits) - 1) >= (1 << 53):
        raise ValueError("range too wide for exact double scaling")
    # floor(exact-product / span) in double: the product is < 2^53 (exact)
    # and quotients sit >= 1/span away from integers, far outside double
    # rounding error — so floor(double) == integer division in any engine
    scaled = F.floor(((col.cast("long") - F.lit(lo))
                      * F.lit((1 << bits) - 1)).cast("double")
                     / F.lit(float(span))).cast("long")
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def morton_key(cols: list[Column | str], ranges: list[tuple[int, int]], *,
               bits: int = 16) -> Column:
    """Interleaved Z-order key over 2..4 integer columns. ``ranges`` gives
    each column's (min, max) — at write time these come from table stats,
    which keeps key computation MAP-ONLY (no inline min/max pass). Bit j
    of scaled column i lands at key bit j*len(cols)+i."""
    k = len(cols)
    if not 2 <= k <= 4:
        raise ValueError("morton_key interleaves 2..4 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    scaled = [
        _scale_to_bits(F.col(c) if isinstance(c, str) else c, lo, hi, bits)
        for c, (lo, hi) in zip(cols, ranges)]
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * k + i))
    return key


def zorder_write_plan(df: DataFrame, cols: list[str],
                      ranges: list[tuple[int, int]], *,
                      bits: int = 16, partitions: int | None = None,
                      key_col: str = "zkey") -> DataFrame:
    """The clustered-write shape: compute the Morton key, RANGE-partition
    on it (so each output file owns a compact curve segment => tight
    per-file min/max on every interleaved column), sort within
    partitions, and leave the frame ready for ``.write``. One range
    shuffle — the same cost as any global sort-write — buying
    multi-dimensional file skipping afterwards."""
    keyed = df.withColumn(key_col, morton_key(cols, ranges, bits=bits))
    parted = (keyed.repartitionByRange(partitions, F.col(key_col))
              if partitions else keyed.repartitionByRange(F.col(key_col)))
    return parted.sortWithinPartitions(key_col)


def compaction_plan(files: DataFrame, *, prefix_col: str = "prefix",
                    file_col: str = "file_id", size_col: str = "size_bytes",
                    target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Small-file compaction planner: assign each input file to an output
    group so groups approach ``target_bytes`` — the OPTIMIZE/rewrite step
    every lakehouse table needs after streaming or small-batch ingest
    (thousands of tiny parquet files kill scan startup at 100 TB).

    Packing rule (deterministic, streaming-friendly): within a prefix,
    files pack in file-name order and a file opens a new group when the
    running size BEFORE it has crossed a multiple of target_bytes —
    i.e. group = exclusive_cumsum div target. Pure BIGINT window math;
    oracle-exact. (First-fit-decreasing would pack ~1% tighter but is
    order-sensitive and needs a driver loop; the cumsum rule is the one
    that distributes.)

    Scale shape: ONE window shuffle keyed on the table prefix — file
    inventories are metadata-sized (millions of rows for a 100 TB table,
    not data-sized), so the whole plan is a metadata pass.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(prefix_col).orderBy(file_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return (files.select(prefix_col, file_col,
                         F.col(size_col).cast("long").alias(size_col))
            .withColumn("_before", before)
            .withColumn("group_id",
                        F.expr(f"_before div {int(target_bytes)}L"))
            .drop("_before"))


def zonemap_skip_stats(df: DataFrame, key_col: str, lo: int, hi: int, *,
                       arrival_col: str, n_files: int = 64) -> DataFrame:
    """Zone-map skip-rate estimator: how many files a range predicate
    ``key in [lo, hi]`` can prune under two write layouts — ``keysorted``
    (range-partitioned on the key, the zorder_write_plan outcome) vs
    ``arrival`` (ingest order, modeled as ``arrival_col % n_files``).
    The planner's answer to "is the OPTIMIZE/Z-order rewrite worth it?";
    returns one row per layout: (layout, n_files, n_skipped, skip_ppm).

    File assignment is deterministic and all-integer so the oracle
    reproduces it exactly: the keysorted layout is an equal-width range
    bucket floor((key-kmin)*n/(kmax-kmin+1)) computed map-only from a
    1-row broadcast of the key bounds (how repartitionByRange splits when
    keys are uniform); a file is skippable when its min/max zone misses
    [lo, hi] entirely.

    Scale shape: one pass for bounds (1-row broadcast), one map-side
    combined aggregate per layout keyed on (layout, file) — file
    inventories are metadata-sized. No sort, no window, no join beyond
    the bounds broadcast."""
    key = F.col(key_col).cast("long")
    bounds = df.agg(F.min(key).alias("_kmin"), F.max(key).alias("_kmax"))
    keyed = (df.select(key.alias("_k"),
                       F.col(arrival_col).cast("long").alias("_a"))
             .crossJoin(F.broadcast(bounds)))
    sorted_file = F.expr(f"(_k - _kmin) * {int(n_files)}L div "
                         f"(_kmax - _kmin + 1L)")
    arrival_file = F.pmod(F.col("_a"), F.lit(n_files))
    zones = None
    for layout, file_of in (("keysorted", sorted_file),
                            ("arrival", arrival_file)):
        z = (keyed.groupBy(file_of.alias("f"))
             .agg(F.min("_k").alias("zmin"), F.max("_k").alias("zmax"))
             .select(F.lit(layout).alias("layout"), "zmin", "zmax"))
        zones = z if zones is None else zones.unionByName(z)
    skipped = F.when((F.col("zmax") < F.lit(lo))
                     | (F.col("zmin") > F.lit(hi)), 1).otherwise(0)
    return (zones.groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(skipped).cast("long").alias("n_skipped"))
            .withColumn("skip_ppm",
                        F.expr("n_skipped * 1000000L div n_files")))


def encoding_stats(df: DataFrame, cols: list[str], *, file_col,
                   order_cols: list[str]) -> DataFrame:
    """Per-column physical-layout statistics that drive encoding choice
    at write time — the planner input for "should this column be
    RLE / delta / dict encoded in this file layout":

      n           rows
      n_distinct  exact distinct values (dict-encoding candidate gauge)
      n_runs      runs of equal adjacent values in file order (RLE gauge)
      sorted_ppm  fraction of adjacent pairs non-decreasing (delta gauge)

    Adjacency is computed WITHIN ``file_col`` groups in ``order_cols``
    order — the physical file/row-group boundary — so the lag windows are
    partitioned by file, never a global sort: the 100 TB shape (files are
    bounded; a global-order formulation would single-task). Columns are
    analyzed in one pass each over a long-format projection.

    Values must be integer-castable (dates via datediff upstream)."""
    from functools import reduce

    from pyspark.sql import Window

    fcol = file_col if not isinstance(file_col, str) else F.col(file_col)
    outs = []
    for c in cols:
        base = df.select(fcol.alias("f"),
                         *[F.col(o).alias(f"o{i}")
                           for i, o in enumerate(order_cols)],
                         F.col(c).cast("long").alias("v"))
        # the value itself is the FINAL tiebreaker: if order_cols don't
        # form a unique key, rows tying on them would make adjacency
        # nondeterministic — grouping equal values last keeps n_runs /
        # sortedness well-defined (equal-value ties can't change either)
        w = Window.partitionBy("f").orderBy(
            *[f"o{i}" for i in range(len(order_cols))], "v")
        lagged = base.withColumn("pv", F.lag("v").over(w))
        stats = lagged.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("v").alias("n_distinct"),
            # a run starts where the value changes (or at a file head,
            # where pv is null)
            F.sum(F.when(F.col("pv").isNull()
                         | (F.col("pv") != F.col("v")), 1)
                  .otherwise(0)).alias("n_runs"),
            F.sum(F.when(F.col("pv").isNotNull(), 1).otherwise(0))
            .alias("n_pairs"),
            F.sum(F.when(F.col("pv").isNotNull()
                         & (F.col("v") >= F.col("pv")), 1).otherwise(0))
            .alias("n_sorted"))
        outs.append(stats.select(
            F.lit(c).alias("column"),
            F.col("n").cast("long").alias("n"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("n_runs").cast("long").alias("n_runs"),
            F.expr("CASE WHEN n_pairs > 0 THEN (n_sorted * 2000000 +"
                   " n_pairs) div (n_pairs * 2) ELSE 1000000 END")
            .cast("long").alias("sorted_ppm")))
    return reduce(lambda a, b: a.unionAll(b), outs)
