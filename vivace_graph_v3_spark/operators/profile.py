"""One-pass table profiling — the data-quality summary a pipeline runs
before training on (or even ingesting) a new source: per-column row/null/
distinct counts, min/max, and mean.

Beyond the reference's surface (its integrity checker, backup.lisp:46-80,
validates structural invariants; this profiles VALUE distributions) and a
first-class need at 100 TB: you profile a petabyte source once before
deciding to curate it.

Scale shape: every statistic is computed in ONE aggregate over one scan —
the wide single-row aggregate is then exploded into the long
(one-row-per-column) report shape entirely in-plan, so profiling cost is a
single pass regardless of column count. Exact ``count(distinct ...)`` over
several columns compiles to Spark's Expand (rows x |cols| in the shuffle);
at extreme scale swap ``exact_distinct=False`` to use HLL
``approx_count_distinct`` in the same plan shape. Means accumulate in
DECIMAL(38,12) so the report value-hashes identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (DateType, NumericType, StringType,
                               TimestampNTZType, TimestampType)


def profile_table(df: DataFrame, columns: list[str] | None = None, *,
                  exact_distinct: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one pass. Returns
    one row per column: (column, n_rows, n_null, n_distinct, min_num,
    max_num, mean, min_str, max_str) — numeric extremes/mean populate the
    ``_num``/``mean`` columns, string/date/timestamp extremes populate the
    ``_str`` columns (as their canonical cast-to-string form), the other
    family is NULL. Mean is rounded to 6 decimals via decimal
    accumulation."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)
    aggs, structs = [], []
    n_rows = F.count(F.lit(1)).alias("__n")
    aggs.append(n_rows)
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, NumericType)
        stringy = isinstance(dt, (StringType, DateType, TimestampType,
                                  TimestampNTZType))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c))
                        .alias(f"__dist_{c}"))
        if numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
            aggs.append(
                (F.round(F.sum(F.col(c).cast("decimal(38,12)"))
                         .cast("double") / F.count(F.col(c)), 6))
                .alias(f"__mean_{c}"))
        elif stringy:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, NumericType)
        stringy = isinstance(dt, (StringType, DateType, TimestampType,
                                  TimestampNTZType))
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}") if numeric
             else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"__max_{c}") if numeric
             else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"__mean_{c}") if numeric
             else F.lit(None).cast("double")).alias("mean"),
            (F.col(f"__min_{c}") if stringy
             else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"__max_{c}") if stringy
             else F.lit(None).cast("string")).alias("max_str"),
        ))
    return (wide.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))


def histogram(df: DataFrame, col: str, bins: int = 20, *,
              lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n) for each
    NON-EMPTY bin. Bounds default to the column min/max (one extra
    aggregate pass); passing explicit ``lo``/``hi`` (e.g. from a profile
    run or write-time stats) makes it a single map-side-combined aggregate
    — the 100 TB shape. Values at the top edge clamp into the last bin.

    Determinism: bin width and edges are fixed-order IEEE double
    arithmetic (identical in any engine); edges are rounded to 6 decimals
    for a stable value hash."""
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        b = df.agg(F.min(x).alias("__lo"), F.max(x).alias("__hi"))
        src = df.crossJoin(F.broadcast(b))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        src = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    w = (hi_c - lo_c) / F.lit(float(bins))
    # degenerate range (constant column, or explicit lo == hi): width 0
    # makes (x - lo)/w NaN, which least() would silently clamp into bin
    # bins-1 — put everything in ONE bin 0 with lo == hi edges instead
    bin_ = (F.when(w == 0, F.lit(0))
            .otherwise(F.least(F.floor((x - lo_c) / w), F.lit(bins - 1)))
            .cast("long"))
    return (src.filter(x.isNotNull() & (x >= lo_c) & (x <= hi_c))
            .groupBy(bin_.alias("bin"),
                     F.round(lo_c + bin_ * w, 6).alias("lo"),
                     F.round(lo_c + (bin_ + 1) * w, 6).alias("hi"))
            .agg(F.count(F.lit(1)).alias("n")))


def distribution_drift(df: DataFrame, *, group_col: str, value_col: str,
                       bucket_width: int = 100) -> DataFrame:
    """Per-group distribution drift of an integer column against the
    whole-corpus distribution, as the chi-square statistic over
    fixed-width buckets — the standard data-quality monitor for "did this
    source/day start looking different" (a PSI/chi-square drift check).
    Returns (group, n_rows, chi2) with chi2 = sum over corpus-occupied
    buckets of (observed - expected)^2 / expected, where expected =
    n_group * bucket_share(corpus). High chi2 = the group's distribution
    diverges from the corpus mix.

    Determinism: bucketing is integer division; each bucket's term is a
    fixed-order IEEE expression of exact integer counts; the cross-bucket
    sum accumulates in DECIMAL(38,12) (order-independent), rounded to 6.

    Scale shape: one map-side-combined aggregate to (group, bucket)
    counts — the only corpus-sized pass; everything after operates on
    |groups| x |buckets| rows. The bucket-share frame is broadcast."""
    b = F.expr(f"`{value_col}` div {bucket_width}")
    gb = (df.select(F.col(group_col).alias("group"), b.alias("bucket"))
          .groupBy("group", "bucket").agg(F.count(F.lit(1)).alias("o")))
    corpus = gb.groupBy("bucket").agg(F.sum("o").alias("c"))
    totals = gb.groupBy("group").agg(F.sum("o").alias("n_rows"))
    n = corpus.agg(F.sum("c").alias("n_total"))
    # zero-fill: every group x every corpus-occupied bucket
    full = (totals.crossJoin(F.broadcast(corpus))
            .join(gb, ["group", "bucket"], "left")
            .crossJoin(F.broadcast(n))
            .select("group", "n_rows",
                    F.coalesce(F.col("o"), F.lit(0)).alias("o"),
                    "c", "n_total"))
    e = (F.col("n_rows").cast("double") * F.col("c")) / F.col("n_total")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    return (full.groupBy("group", "n_rows")
            .agg(F.round(F.sum(term.cast("decimal(38,12)"))
                         .cast("double"), 6).alias("chi2"))
            .select("group", "n_rows", "chi2"))


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str], *,
               compare_cols: list[str] | None = None) -> DataFrame:
    """Snapshot diff — the CDC-style comparison between two versions of a
    keyed table: returns (key..., change) with change in
    {'added', 'removed', 'changed'}; unchanged rows are omitted. The
    basis of incremental replication audits and "what did this batch
    touch" reports (the relational face of the MVCC store's txn-log
    delta).

    Scale shape: one full-outer hash join on the key — the minimal cost
    of any exact diff; column comparison is null-safe eqNullSafe inside
    the join output (no second pass)."""
    cols = compare_cols or [c for c in old.columns if c not in key_cols]
    # presence markers survive all-null payload rows; ONE full-outer join
    # carries markers and both payloads
    o = old.select(*key_cols, F.lit(1).alias("__in_o"),
                   *[F.col(c).alias(f"__o_{c}") for c in cols])
    nw = new.select(*key_cols, F.lit(1).alias("__in_n"),
                    *[F.col(c).alias(f"__n_{c}") for c in cols])
    j = o.join(nw, key_cols, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (F.when(F.col("__in_o").isNull(), "added")
              .when(F.col("__in_n").isNull(), "removed")
              .when(~same, "changed"))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change"))


def ks_drift(df: DataFrame, *, group_col: str, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift of each group's ``value_col``
    distribution against the whole corpus: D = max over x of
    |ECDF_group(x) - ECDF_corpus(x)| — the distribution-shape companion to
    distribution_drift's chi-square (KS sees location/scale shifts that
    binned chi-square can blur). Returns (group, n_rows, ks), ks rounded
    half-up to 6 decimals.

    Exactness: D is computed as an INTEGER maximum —
    max |cum_g(x)·n_all − cum_all(x)·n_g| — then divided once via the
    integer round-half-up recipe, so the statistic is bit-identical in
    any engine (no floating ECDFs).

    Scale shape: the evaluation grid is (groups × distinct values) — a
    window cumsum per group over that grid, plus one corpus cumsum; the
    raw table is touched once for the per-(group, value) counts, which
    map-side combine. Groups are categories (sources/days), so the window
    partitions are value-cardinality-bounded, never row-bounded."""
    x = F.col(value_col)
    counts = (df.groupBy(F.col(group_col).alias("g"), x.alias("x"))
              .agg(F.count(F.lit(1)).alias("c")))
    allx = counts.select("x").dropDuplicates()
    groups = (counts.groupBy("g")
              .agg(F.sum("c").alias("n_g")))
    n_all_df = counts.agg(F.sum("c").alias("n_all"))
    grid = (groups.crossJoin(allx)
            .join(counts, ["g", "x"], "left")
            .withColumn("c", F.coalesce(F.col("c"), F.lit(0))))
    wg = (Window.partitionBy("g").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum_g = F.sum("c").over(wg)
    corpus = (counts.groupBy("x").agg(F.sum("c").alias("ca")))
    wa = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    corpus = corpus.withColumn("cum_all", F.sum("ca").over(wa))
    scored = (grid.withColumn("cum_g", cum_g)
              .join(corpus.select("x", "cum_all"), "x")
              .crossJoin(F.broadcast(n_all_df))
              .select("g", "n_g",
                      F.abs(F.col("cum_g") * F.col("n_all")
                            - F.col("cum_all") * F.col("n_g"))
                      .alias("num"),
                      (F.col("n_g") * F.col("n_all")).alias("den")))
    # num/den scale as n_g*n_all, so the *2000000 step must run in
    # DECIMAL(38,0): in BIGINT it overflows once n_g*n_all > ~4.6e12
    # (e.g. a 500k-row group in a 10M-row corpus) — silently wrong with
    # ANSI off, runtime error with ANSI on. The quotient itself is always
    # <= 2000001, so `div`'s BIGINT result is safe.
    ks = (F.expr("(CAST(max(num) AS DECIMAL(38,0)) * 2000000 "
                 " + any_value(den)) "
                 "div (CAST(any_value(den) AS DECIMAL(38,0)) * 2)")
          .cast("double") / 1e6)
    return (scored.groupBy(F.col("g").alias(group_col))
            .agg(F.any_value(F.col("n_g")).cast("long").alias("n_rows"),
                 ks.alias("ks")))


def k_anonymity(df: DataFrame, qi_cols: list[str], *,
                k: int = 10) -> DataFrame:
    """Data-governance audit (Sweeney 2002 k-anonymity): equivalence
    classes over the quasi-identifier columns with their sizes and an
    at_risk flag for classes smaller than k — the rows a release would
    have to generalize or suppress. A training-data pipeline runs this
    before exporting anything keyed on user-ish attributes.

    Returns (*qi_cols, class_size, at_risk) — all-integer/boolean, one
    hash aggregate with map-side combine; output is bounded by the QI
    domain product, not the row count, so the plan is a single shuffle
    at any corpus size."""
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("at_risk", F.col("class_size") < k))


def l_diversity(df: DataFrame, qi_cols: list[str], sensitive_col: str, *,
                l: int = 3) -> DataFrame:
    """Distinct l-diversity audit (Machanavalhala et al. 2007), the
    companion check to :func:`k_anonymity`: a release is l-diverse when
    every quasi-identifier equivalence class contains at least ``l``
    distinct values of the sensitive attribute — k-anonymity alone
    cannot stop attribute disclosure when a class is homogeneous.

    Returns (*qi_cols, class_size, n_sensitive, at_risk) with at_risk =
    n_sensitive < l. Exact distinct (not approx) because the audit is a
    gate, not an estimate.

    Scale shape: one aggregation keyed on (QI..., sensitive) then one on
    (QI...) — Spark plans count(distinct) as exactly this two-phase
    expand, both phases map-side-combining; output bounded by the QI
    domain product."""
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"),
                 F.countDistinct(sensitive_col).alias("n_sensitive"))
            .withColumn("at_risk", F.col("n_sensitive") < l))


def winsorize_stats(df, value_col: str, group_col: str, *,
                    lo_pct: int = 5, hi_pct: int = 95):
    """Winsorized robust statistics per group: clip values outside the
    exact [lo_pct, hi_pct] percentile band and report the thresholds,
    clip counts, and winsorized sum — the outlier-taming step numeric
    feature pipelines run before scaling (Tukey/Dixon trimming, kept as
    clipping so row count is preserved).

    Values are half-up cents (BIGINT); percentiles use the VALUE-GRID
    exact-quantile recipe of pipeline/text.grid_quantile_gate (threshold
    = min value whose cumulative count reaches ceil(n*pct/100)), so the
    whole contract is integer arithmetic — no interpolation, no
    approx-percentile drift.

    Scale shape: one map-side-combined (group, value) count, a cumulative
    window over the value grid (domain-bounded, not row-bounded — safe
    when one group holds 1e10 rows), then one broadcast of the per-group
    thresholds back onto the rows for the clip aggregate.
    """
    from pyspark.sql import functions as F

    g = F.col(group_col)
    cents = F.floor(F.col(value_col) * 100.0 + 0.5).cast("long")
    rows = df.select(g.alias("g"), cents.alias("q"))
    counts = rows.groupBy("g", "q").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))
    wg = (Window.partitionBy("g").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = counts.withColumn("cum", F.sum("c").over(wg)).join(totals, "g")
    thr = (cum.groupBy("g").agg(
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * lo_pct,
                     F.col("q"))).alias("lo_thr"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * hi_pct,
                     F.col("q"))).alias("hi_thr"),
        F.any_value("n").alias("n")))
    clipped = F.greatest(F.col("lo_thr"),
                         F.least(F.col("hi_thr"), F.col("q")))
    return (rows.join(F.broadcast(thr), "g")
            .groupBy("g", "lo_thr", "hi_thr", "n")
            .agg(F.sum(F.when(F.col("q") < F.col("lo_thr"), 1)
                       .otherwise(0)).cast("long").alias("n_clipped_lo"),
                 F.sum(F.when(F.col("q") > F.col("hi_thr"), 1)
                       .otherwise(0)).cast("long").alias("n_clipped_hi"),
                 F.sum(clipped).cast("long").alias("winsorized_sum_cents"))
            .select(F.col("g").alias(group_col),
                    F.col("n").cast("long").alias("n"),
                    "lo_thr", "hi_thr", "n_clipped_lo", "n_clipped_hi",
                    "winsorized_sum_cents"))
