"""Entity resolution: blocked fuzzy matching by edit distance.

The classic record-linkage shape (Fellegi-Sunter style blocking +
string-similarity verification): candidate pairs are generated ONLY
within blocks (shared coarse keys — a nation, a zip prefix, a sorted
name token), then verified with an exact string metric. Cost is the sum
of block sizes squared, never corpus², exactly like the shingle-blocked
dedup candidates in pipeline/dedup.py; hot blocks are the skew knob
(cap or sub-block them — see operators/skew.py).

Levenshtein runs as Spark's built-in JVM expression (whole-stage
codegen) and is integer-exact, so a SQL oracle reproduces matches
bit-for-bit — no fuzzy-score drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_fuzzy_pairs(df: DataFrame, *, key_col: str, name_col: str,
                        block_cols: list[str], max_edit: int = 2,
                        block_cap: int | None = None) -> DataFrame:
    """All pairs (key_a < key_b) sharing every ``block_cols`` value with
    ``levenshtein(name_a, name_b) <= max_edit``. Returns
    (key_a, key_b, edit). ``block_cap`` drops blocks larger than the cap
    before pairing (the hub guard — an unexpectedly hot block would
    otherwise contribute size² pairs)."""
    side = df.select(*block_cols, F.col(key_col).alias("k"),
                     F.col(name_col).alias("nm"))
    if block_cap is not None:
        sizes = (side.groupBy(*block_cols)
                 .agg(F.count(F.lit(1)).alias("__bs")))
        side = (side.join(sizes.filter(F.col("__bs") <= block_cap)
                          .select(*block_cols), block_cols, "left_semi"))
    a, b = side.alias("a"), side.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    edit = F.levenshtein(F.col("a.nm"), F.col("b.nm"))
    return (a.join(b, cond)
            .filter(edit <= max_edit)
            .select(F.col("a.k").alias("key_a"),
                    F.col("b.k").alias("key_b"), edit.alias("edit")))


def fellegi_sunter_weights(df: DataFrame, *, key_col: str, name_col: str,
                           block_col: str, fields: list[str],
                           match_max_edit: int = 1) -> DataFrame:
    """Fellegi-Sunter match/unmatch weight estimation (Fellegi & Sunter
    JASA 1969 — the probabilistic record-linkage model behind every
    production ER system): for each comparison field, estimate
    m = P(field agrees | pair is a match) and u = P(agrees | non-match)
    from a deterministically-labeled candidate pair set, and report the
    field's log2(m/u) agreement weight — the score increment a linkage
    run adds when that field agrees.

    Candidates are the block's pairs (one shared ``block_col`` value,
    key_a < key_b — the SSJoin-style bounded generator); the training
    label is the deterministic name-edit rule
    levenshtein <= ``match_max_edit`` (both engines implement the same
    Levenshtein, so labels are engine-exact). Agreement counts are exact
    integers; m/u are floor-ppm; the weight is one mirrored double
    expression (NULL when a zero count makes it undefined).

    One pair join + ONE aggregate (fields unpivot via stack) — the
    count frame is |fields| rows; pair volume is block-bounded.
    Returns per field: (field, n_match, n_match_agree, n_unmatch,
    n_unmatch_agree, m_ppm, u_ppm, weight_bits)."""
    cols = [block_col, key_col, name_col] + list(fields)
    side = df.select(*[F.col(c) for c in cols])
    a, b = side.alias("a"), side.alias("b")
    pairs = (a.join(b, (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
                    & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")))
             .select(
                 (F.levenshtein(F.col(f"a.{name_col}"),
                                F.col(f"b.{name_col}"))
                  <= int(match_max_edit)).alias("is_match"),
                 *[(F.col(f"a.{f}") == F.col(f"b.{f}"))
                   .alias(f"agree_{f}") for f in fields]))
    aggs = [
        F.sum(F.when(F.col("is_match"), 1).otherwise(0)).alias("n_match"),
        F.sum(F.when(~F.col("is_match"), 1).otherwise(0))
        .alias("n_unmatch")]
    for f in fields:
        aggs.append(F.sum(F.when(F.col("is_match")
                                 & F.col(f"agree_{f}"), 1).otherwise(0))
                    .alias(f"ma_{f}"))
        aggs.append(F.sum(F.when(~F.col("is_match")
                                 & F.col(f"agree_{f}"), 1).otherwise(0))
                    .alias(f"ua_{f}"))
    tot = pairs.agg(*aggs)
    stack = ", ".join(f"'{f}', ma_{f}, ua_{f}" for f in fields)
    long = tot.selectExpr(
        "n_match", "n_unmatch",
        f"stack({len(fields)}, {stack})"
        " as (field, n_match_agree, n_unmatch_agree)")
    w = F.when(
        (F.col("n_match") > 0) & (F.col("n_unmatch") > 0)
        & (F.col("n_match_agree") > 0) & (F.col("n_unmatch_agree") > 0),
        F.round(F.log2(
            (F.col("n_match_agree").cast("double")
             / F.col("n_match").cast("double"))
            / (F.col("n_unmatch_agree").cast("double")
               / F.col("n_unmatch").cast("double"))), 6))
    return long.select(
        "field", F.col("n_match").cast("long").alias("n_match"),
        F.col("n_match_agree").cast("long").alias("n_match_agree"),
        F.col("n_unmatch").cast("long").alias("n_unmatch"),
        F.col("n_unmatch_agree").cast("long").alias("n_unmatch_agree"),
        F.expr("CASE WHEN n_match > 0 THEN"
               " n_match_agree * 1000000L div n_match END").alias("m_ppm"),
        F.expr("CASE WHEN n_unmatch > 0 THEN"
               " n_unmatch_agree * 1000000L div n_unmatch END")
        .alias("u_ppm"),
        w.alias("weight_bits"))
