"""Statistical profiling operators: categorical-independence (chi-square)
audits, Benford first-digit conformance, and Theil–Sen robust trend — the
column-level statistics a warehouse/data-curation pipeline runs beyond the
per-column profiles in operators/profile.py.

Reference parity: vivace-graph-v3 exposes its store to arbitrary Prolog
aggregation (select + functors over map-reduced views, e.g.
views.lisp / prolog-functors.lisp); these are the canonical statistical
reports a user of that surface would assemble by hand. Here each is one
declarative Catalyst plan over domain-bounded aggregates.

Engine-exactness discipline (same as operators/profile.py): every ratio
that crosses the Spark/DuckDB boundary is an integer round-half-up ppm
(``(x*2000000 + d) div (d*2)``), never a float division whose libm/sum
ordering could differ; the only doubles emitted are (a) IEEE-exact chains
over identical integers (div/mul/sub/sqrt are correctly rounded and thus
bit-identical in any IEEE-754 engine) or (b) hardcoded literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chi2_independence",
    "benford_first_digit",
    "theilsen_trend",
    "BENFORD_PPM",
    "inequality_indices",
    "skyline_2d",
]


def _ppm(num: Column | str, den: Column | str) -> Column:
    """Round-half-up parts-per-million of num/den in pure BIGINT
    arithmetic — bit-identical in any engine."""
    return F.expr(f"({num} * 2000000 + {den}) div ({den} * 2)")


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square independence audit between two categorical
    columns, returned as the full contingency grid with exact integer-ppm
    expected counts and per-cell contributions, plus the (constant)
    chi2_total_ppm, degrees of freedom, and Cramér's V.

    Exactness: per-cell ``contrib_ppm = round_half_up(1e6 * (o*n - ra*cb)^2
    / (ra*cb*n))`` runs in DECIMAL(38,0) (the square reaches ~1e17 at
    sf0.1 and BIGINT would overflow near n ~ 3e9 rows); the grid total is
    then an exact BIGINT sum — order-independent, unlike a float chi2.
    Cramér's V is sqrt of a ratio of those integers: IEEE sqrt/div are
    correctly rounded, so the double is engine-stable.

    Scale shape: one hash aggregate over the raw table (map-side combine)
    produces the cell grid; everything after operates on the grid, whose
    size is the attribute-domain product (|A|x|B|), never the row count.
    Marginals are re-aggregations of the grid; n is a 1-row crossJoin
    broadcast. The unpartitioned window for the grid total is
    domain-bounded by construction (documented single-partition step over
    |A|x|B| rows, not data rows)."""
    cells = (df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
             .agg(F.count(F.lit(1)).alias("o")))
    row_tot = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    col_tot = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = cells.agg(F.sum("o").alias("n"),
                    F.count_distinct("a").alias("r_card"),
                    F.count_distinct("b").alias("c_card"))
    g = (cells.join(row_tot, "a").join(col_tot, "b")
         .crossJoin(F.broadcast(tot)))
    diff = "(o * n - ra * cb)"
    # (o*n - ra*cb)^2 * 2e6 needs ~24 digits at sf0.1 -> DECIMAL(38,0)
    contrib = F.expr(
        f"CAST((CAST({diff} AS DECIMAL(38,0)) * {diff} * 2000000"
        f"      + ra * cb * n)"
        f"     div (CAST(ra AS DECIMAL(38,0)) * cb * n * 2) AS BIGINT)")
    g = g.select(
        F.col("a").alias(col_a), F.col("b").alias(col_b),
        F.col("o").alias("observed"),
        _ppm("ra * cb", "n").alias("expected_ppm"),
        contrib.alias("contrib_ppm"),
        "n", "r_card", "c_card")
    w = Window.partitionBy(F.lit(1))  # grid is |A|x|B|-bounded, see doc
    return (g.withColumn("chi2_total_ppm", F.sum("contrib_ppm").over(w))
            .withColumn("dof",
                        ((F.col("r_card") - 1)
                         * (F.col("c_card") - 1)).cast("long"))
            .withColumn(
                "cramers_v",
                F.sqrt((F.col("chi2_total_ppm").cast("double") / 1e6)
                       / (F.col("n").cast("double")
                          * F.least(F.col("r_card") - 1,
                                    F.col("c_card") - 1).cast("double"))))
            .drop("n", "r_card", "c_card"))


# round(log10(1 + 1/d) * 1e6) for d = 1..9 — hardcoded literals on both
# engine sides so no libm log10 ever crosses the comparison boundary
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_first_digit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over a positive
    monetary column — the classic anomaly/fabrication screen for
    transaction amounts (Benford 1938; Nigrini's forensic accounting
    use). Returns one row per digit 1-9 with the observed count, observed
    ppm share, the Benford-expected ppm (hardcoded literals), and the
    absolute deviation.

    Exactness: the first digit is taken from the DECIMAL STRING of the
    integer cent amount (``round(x*100)``) — integer-to-string is
    engine-identical, unlike float formatting or ``floor(log10(x))``
    whose last-ulp behavior at powers of ten is libm-dependent.

    Scale shape: one map-side-combined aggregate to <= 9 rows; the share
    denominator is a 1-row broadcast."""
    cents = F.round(F.col(col) * 100).cast("long")
    digits = (df.filter(F.col(col) > 0)
              .select(F.substring(cents.cast("string"), 1, 1)
                      .cast("int").alias("digit"))
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    tot = digits.agg(F.sum("n").alias("n_total"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]),
        F.col("digit"))
    return (digits.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    _ppm("n", "n_total").alias("observed_ppm"),
                    expected.cast("long").alias("benford_ppm"))
            .withColumn("abs_dev_ppm",
                        F.abs(F.col("observed_ppm") - F.col("benford_ppm"))))


def theilsen_trend(df: DataFrame, group_col: str, x_col: str,
                   y_col: str) -> DataFrame:
    """Theil–Sen robust trend per group: the LOWER MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i) over the group's (x, y) points — the
    breakdown-resistant alternative to OLS slope (Theil 1950, Sen 1968);
    a single corrupted month cannot swing it.

    Caller contract: x and y are INTEGERS (e.g. month index and cent
    amounts) with one row per (group, x). Each slope is then one IEEE
    double division of two exact integers — engine-identical — and the
    lower median picks an actual slope element via the integer cum-count
    rule (cum*2 >= n), never an interpolated float.

    Scale shape: points per group are grid-bounded (months, not rows), so
    the within-group self-join is O(m^2) on tiny m; the median uses a
    per-group window over that slope grid. Returns (group, n_points,
    n_pairs, slope)."""
    pts = df.select(F.col(group_col).alias("g"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"))
    a, b = pts.alias("i"), pts.alias("j")
    slopes = (a.join(b, (F.col("i.g") == F.col("j.g"))
                     & (F.col("i.x") < F.col("j.x")))
              .select(F.col("i.g").alias("g"),
                      ((F.col("j.y") - F.col("i.y")).cast("double")
                       / (F.col("j.x") - F.col("i.x")).cast("double"))
                      .alias("slope")))
    grid = slopes.groupBy("g", "slope").agg(F.count(F.lit(1)).alias("c"))
    wcum = (Window.partitionBy("g").orderBy("slope")
            .rowsBetween(Window.unboundedPreceding, 0))
    wtot = Window.partitionBy("g")
    npts = pts.groupBy("g").agg(F.count(F.lit(1)).alias("n_points"))
    med = (grid.withColumn("cum", F.sum("c").over(wcum))
           .withColumn("n_pairs", F.sum("c").over(wtot))
           .filter(F.col("cum") * 2 >= F.col("n_pairs"))
           .groupBy("g")
           .agg(F.any_value("n_pairs").alias("n_pairs"),
                F.min("slope").alias("slope")))
    return (med.join(npts, "g")
            .select(F.col("g").alias(group_col), "n_points", "n_pairs",
                    "slope"))


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """2-D skyline / Pareto frontier (Borzsony, Kossmann & Stocker,
    ICDE 2001): the points not DOMINATED by any other — q dominates p
    when q.min_col <= p.min_col and q.max_col >= p.max_col with at
    least one strict. Classic sort-based evaluation, relationalized:
    aggregate to the (min_col -> max(max_col)) value grid, then a point
    survives iff its max_col exceeds the running maximum over all
    STRICTLY smaller min_col values (a same-cost point with larger
    max_col kills it via the per-cost max). Returns the frontier:
    (min_col, max_col, n_rows) ascending in min_col, descending in
    max_col by construction.

    Both columns must be integer-valued. Scale shape: one
    map-side-combined grid aggregate; the ordered window runs over the
    DISTINCT min_col grid (domain-bounded, kaplan_meier discipline),
    never over rows."""
    x, y = F.col(min_col).cast("long"), F.col(max_col).cast("long")
    grid = (df.select(x.alias("x"), y.alias("y"))
            .groupBy("x").agg(F.max("y").alias("best_y")))
    # count rows AT the frontier point (x, best_y), not all rows at x
    at_best = (df.select(x.alias("x"), y.alias("y"))
               .groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_rows")))
    w = (Window.orderBy("x")  # distinct-x grid, see docstring
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (grid
                .withColumn("prev_best", F.max("best_y").over(w))
                .filter(F.col("prev_best").isNull()
                        | (F.col("best_y") > F.col("prev_best"))))
    return (frontier.join(at_best,
                          (frontier["x"] == at_best["x"])
                          & (frontier["best_y"] == at_best["y"]))
            .select(frontier["x"].alias(min_col),
                    F.col("best_y").alias(max_col),
                    F.col("n_rows").cast("long").alias("n_rows")))


def inequality_indices(df: DataFrame, value_col: str,
                       group_col: str | None = None) -> DataFrame:
    """Entropy-family inequality indices per group (complementing the
    rank-based Gini): Theil T index T = mean((x/mu) * ln(x/mu))
    (Theil 1967) and the Atkinson index at epsilon = 1,
    A1 = 1 - geomean(x)/mean(x) (Atkinson 1970). Zero/negative values
    are excluded (ln domain), n and the exclusion count are reported.

    One map-side-combined aggregate pass: n, sum(x), sum(ln x),
    sum(x ln x) — four running sums at any volume, one row per group.
    T = sum(x ln x)/sum(x) - ln(sum(x)/n); A1 = 1 - exp(sum(ln x)/n)
    * n / sum(x). Doubles rounded to 4 decimals (the decimal-boundary
    convention used by the Gini entry)."""
    x = F.col(value_col).cast("double")
    pos = df.filter(x > 0)
    keys = [group_col] if group_col else []
    agg = (pos.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(F.log(x)).alias("slx"),
        F.sum(x * F.log(x)).alias("sxlx")))
    mean = F.col("sx") / F.col("n")
    theil = F.col("sxlx") / F.col("sx") - F.log(mean)
    atkinson = 1.0 - F.exp(F.col("slx") / F.col("n")) / mean
    out = agg.select(
        *keys, F.col("n").cast("long").alias("n"),
        F.round(theil, 4).alias("theil_t"),
        F.round(atkinson, 4).alias("atkinson_1"))
    return out.orderBy(*keys) if keys else out
