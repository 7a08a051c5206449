"""Feature-engineering operators: weight-of-evidence / information
value, leave-one-out target encoding, and single-split (decision-stump)
threshold search.

Reference parity: the reference exposes slot values to arbitrary Prolog
aggregation (map-reduced views + select functors); these are the
standard supervised-feature reports a modeling pipeline derives from
that surface before any training run. Engine-exactness discipline of
operators/stats.py: every aggregate is an exact BIGINT moment, every
float a fixed chain of correctly-rounded ops on those moments; ln
outputs (WoE) are reported 6-dp rounded (the cross-engine convention
used by zipf_slope).

Scale shape: each operator is one map-side-combined aggregate to a
category / value grid; everything downstream operates on grid rows.
Target encoding joins the (small) category grid back broadcast-style —
Catalyst picks broadcast from stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["woe_iv", "target_encoding_loo", "decision_stump_split"]


def woe_iv(df: DataFrame, feature_col: str, label_col,
           *, smoothing: float = 0.5) -> DataFrame:
    """Weight of evidence and information value of a categorical feature
    against a boolean label (Siddiqi, "Credit Risk Scorecards", 2006):
    WoE_i = ln((good_i + s)/(G + 2s)) - ln((bad_i + s)/(B + 2s)) with
    additive smoothing s so empty cells stay finite; IV is the
    fold-summed (good share - bad share) * WoE. Returns one row per
    category plus the (constant) total IV column.

    ``label_col`` may be a column name or boolean Column. All shares are
    exact-int ratios; the two ln calls and their difference are the only
    transcendental steps (6-dp rounded output)."""
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    g = (df.groupBy(F.col(feature_col).alias("category"))
         .agg(F.sum(F.when(y, 1).otherwise(0)).alias("n_good"),
              F.sum(F.when(y, 0).otherwise(1)).alias("n_bad")))
    tot = g.agg(F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb"))
    j = g.crossJoin(F.broadcast(tot))
    s = float(smoothing)
    gs = ((F.col("n_good").cast("double") + F.lit(s))
          / (F.col("tg").cast("double") + F.lit(2 * s)))
    bs = ((F.col("n_bad").cast("double") + F.lit(s))
          / (F.col("tb").cast("double") + F.lit(2 * s)))
    woe = F.log(gs) - F.log(bs)
    j = j.select("category",
                 F.col("n_good").cast("long").alias("n_good"),
                 F.col("n_bad").cast("long").alias("n_bad"),
                 F.round(woe, 6).alias("woe"),
                 ((F.col("n_good").cast("double")
                   / F.col("tg").cast("double")
                   - F.col("n_bad").cast("double")
                   / F.col("tb").cast("double")) * woe).alias("__ivc"))
    iv = j.agg(F.round(F.aggregate(
        F.array_sort(F.collect_list(F.struct("category", "__ivc"))),
        F.lit(0.0), lambda acc, x: acc + x["__ivc"]), 6).alias("iv_total"))
    return (j.drop("__ivc").crossJoin(F.broadcast(iv)))


def target_encoding_loo(df: DataFrame, category_col: str, target_col: str,
                        id_cols: list[str]) -> DataFrame:
    """Leave-one-out target encoding (Micci-Barreca 2001, the
    leakage-safe variant): each row's encoding is the mean of the
    INTEGER target over the other rows of its category,
    (S_c - y) / (n_c - 1); singleton categories get NULL (no other
    rows to borrow from). One grid aggregate + one broadcast-back join;
    encodings are exact-int ratios."""
    t = F.col(target_col).cast("long")
    g = (df.groupBy(F.col(category_col).alias("__c"))
         .agg(F.sum(t).alias("__s"), F.count(F.lit(1)).alias("__n")))
    j = df.select(*id_cols, F.col(category_col).alias("__c"),
                  t.alias("__y")).join(F.broadcast(g), "__c")
    enc = F.when(F.col("__n") > 1,
                 (F.col("__s") - F.col("__y")).cast("double")
                 / (F.col("__n") - 1).cast("double"))
    return j.select(*id_cols, F.col("__c").alias(category_col),
                    enc.alias("encoding"))


def decision_stump_split(df: DataFrame, value_col: str, label_col,
                         *, min_leaf: int = 1) -> DataFrame:
    """Best single-threshold split of an integer-valued feature against
    a boolean label by weighted Gini impurity (CART's root step,
    Breiman et al. 1984): candidate thresholds are the distinct feature
    values (split = "x <= t"); impurity of a leaf with n rows / p
    positives is 1 - (p/n)^2 - ((n-p)/n)^2 and the split score is the
    row-weighted sum. Returns ONE row: the argmin threshold (ties ->
    smallest threshold), leaf sizes, and the 6-dp Gini.

    Scale shape: one aggregate to the distinct-value grid, one grid
    cumsum window, one TakeOrdered argmin. The grid — never the table —
    feeds the window."""
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    grid = (df.select(F.col(value_col).cast("long").alias("v"),
                      F.when(y, 1).otherwise(0).alias("p"))
            .groupBy("v").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("p").alias("np")))
    tot = grid.agg(F.sum("n").alias("nt"), F.sum("np").alias("pt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    c = (grid.withColumn("nl", F.sum("n").over(w))
         .withColumn("pl", F.sum("np").over(w))
         .crossJoin(F.broadcast(tot))
         .withColumn("nr", F.col("nt") - F.col("nl"))
         .withColumn("pr", F.col("pt") - F.col("pl"))
         .filter((F.col("nl") >= min_leaf) & (F.col("nr") >= min_leaf)))

    def gini(n, p):
        nd, pd_ = n.cast("double"), p.cast("double")
        share_p = pd_ / nd
        share_n = (nd - pd_) / nd
        return F.lit(1.0) - share_p * share_p - share_n * share_n

    score = (F.col("nl").cast("double") * gini(F.col("nl"), F.col("pl"))
             + F.col("nr").cast("double") * gini(F.col("nr"), F.col("pr"))
             ) / F.col("nt").cast("double")
    # EXACT integer argmin key (r7 sf0.1 sweep find): sorting candidates
    # by the double `score` is cross-engine fragile — near-equal ginis
    # differ by an ulp between engines (and an oracle's ORDER BY can
    # silently bind a rounded output alias). Minimizing score is
    # equivalent to MAXIMIZING T = (pl²+ql²)/nl + (pr²+qr²)/nr, which
    # scaled by 1000 and integer-divided is an exact, engine-identical
    # sort key (DECIMAL(38,0) intermediates; ties at the 1e-3 T
    # resolution — gini ties beyond the 9th decimal — break to the
    # smallest threshold in both engines). The reported gini column is
    # still the 6-dp double, computed once on the winning row.
    tkey = F.expr(
        "CAST(((CAST(pl AS DECIMAL(38,0)) * pl"
        " + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl)) * nr"
        " + (CAST(pr AS DECIMAL(38,0)) * pr"
        " + CAST(nr - pr AS DECIMAL(38,0)) * (nr - pr)) * nl)"
        " * 1000 div (CAST(nl AS DECIMAL(38,0)) * nr) AS BIGINT)")
    return (c.withColumn("gini", score).withColumn("__t", tkey)
            .orderBy(F.col("__t").desc(), F.col("v").asc()).limit(1)
            .select(F.col("v").alias("threshold"),
                    F.col("nl").cast("long").alias("n_left"),
                    F.col("nr").cast("long").alias("n_right"),
                    F.col("pl").cast("long").alias("n_pos_left"),
                    F.col("pr").cast("long").alias("n_pos_right"),
                    F.round("gini", 6).alias("gini")))
