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
