"""Data-quality expectation auditing: declarative per-rule violation
counts over a table, plus referential-integrity checks between tables.

Reference parity: vivace-graph-v3 ships ``check-data-integrity``
(vivace-graph-v3.lisp:283-331), which walks the heap validating that
every vertex/edge deserializes and that edge endpoints resolve; the
operators/integrity.py module reproduces that storage-level audit. This
module is the LOGICAL layer a curation pipeline needs on top: arbitrary
row-level expectations ("quantity in 1..50", "ship date precedes
receipt date") declared as Columns, evaluated in ONE scan, reported as
a per-rule violation table — the Great-Expectations-style gate run
before data enters a training mix.

Scale shape: all rule counters aggregate in a single map-side-combined
pass over the table (one ``sum(case when violated)`` per rule — no per
rule re-scan); the output is |rules| rows via one ``stack`` unpivot.
Referential checks are anti-join counts (broadcast when the parent key
side is small; Catalyst picks from stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["expectation_audit", "referential_violations",
           "split_leakage_audit"]


def expectation_audit(df: DataFrame,
                      rules: dict[str, Column]) -> DataFrame:
    """Evaluate named expectations over ``df`` in one scan. Each rule is
    a boolean Column that is TRUE when the row SATISFIES the
    expectation; NULL (e.g. comparisons over NULL operands) counts as a
    violation — an unknown is not a pass. Returns one row per rule:
    (rule, n_checked, n_violations, pass) ordered by rule name."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(F.sum(
            F.when(cond.isNull() | ~cond, 1).otherwise(0))
            .alias(f"__v_{name}"))
    row = df.agg(*aggs)
    names = sorted(rules)
    stack = ", ".join(f"'{n}', `__v_{n}`" for n in names)
    return (row.selectExpr("__n",
                           f"stack({len(names)}, {stack}) AS "
                           "(rule, n_violations)")
            .select("rule", F.col("__n").cast("long").alias("n_checked"),
                    F.col("n_violations").cast("long").alias("n_violations"),
                    (F.col("n_violations") == 0).alias("pass")))


def referential_violations(child: DataFrame, parent: DataFrame,
                           child_key: str, parent_key: str) -> DataFrame:
    """Orphaned-foreign-key count: child rows whose key has no parent
    (NULL child keys count as orphans — an unresolvable reference).
    Returns one row (n_checked, n_violations, pass)."""
    orphans = (child.select(F.col(child_key).alias("k"))
               .filter(F.col("k").isNotNull())  # nulls counted separately
               .join(parent.select(F.col(parent_key).alias("k"))
                     .dropDuplicates(), "k", "left_anti"))
    nulls = child.filter(F.col(child_key).isNull())
    return (child.agg(F.count(F.lit(1)).alias("n_checked"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("__o")))
            .crossJoin(nulls.agg(F.count(F.lit(1)).alias("__nl")))
            .select(F.col("n_checked").cast("long").alias("n_checked"),
                    (F.col("__o") + F.col("__nl")).cast("long")
                    .alias("n_violations"),
                    ((F.col("__o") + F.col("__nl")) == 0).alias("pass")))


def split_leakage_audit(df: DataFrame, group_col: str, row_col: str,
                        *, n_folds: int = 3) -> DataFrame:
    """Group-leakage comparison of two train/val/test split schemes over
    the same table: splitting by the GROUP key's hash fold keeps every
    group inside one split (leakage-safe by construction); splitting by
    the ROW key's hash fold scatters a group's rows across splits — the
    classic eval-contamination bug this audit exists to catch before a
    model sees the data. Returns one row per scheme:
    (scheme, n_rows, n_groups, n_leaky_groups) where a leaky group spans
    more than one split."""
    from vivace_graph_v3_spark.operators.stats_inference import (
        hash_fold_assignment)

    out = []
    for scheme, key in (("by_group", group_col), ("by_row", row_col)):
        split = hash_fold_assignment(key, n_folds=n_folds)
        g = (df.withColumn("__split", split)
             .groupBy(F.col(group_col).alias("g"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.countDistinct("__split").alias("d")))
        out.append(g.agg(
            F.lit(scheme).alias("scheme"),
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0)).cast("long")
            .alias("n_leaky_groups")))
    return out[0].unionByName(out[1])
