"""Executed-plan introspection as a library API.

The properties that matter at 100 TB — join strategies, scan pruning,
pushed filters, exchange counts, Python boundaries — extracted from a
DataFrame's (post-AQE) physical plan into a typed report. Two uses:

- ad-hoc: ``plan_facts(df)`` after ``df.collect()`` to see what actually
  ran;
- CI gates: ``assert_plan(df, max_exchanges=..., no_row_udf=True, ...)``
  pins a query's plan shape so a regression (lost pushdown, surprise
  shuffle, row-at-a-time UDF creeping into a hot path) fails a test
  instead of shipping. tools/plan_audit.py renders these facts for every
  headline registry entry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    broadcast_joins: int = 0
    broadcast_nl_joins: int = 0     # non-equi broadcast (nested-loop)
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    cartesian_products: int = 0     # unbroadcast cross joins — almost
                                    # always a scale bug
    exchanges: int = 0
    single_partition_exchanges: int = 0  # global funnels (Exchange
                                         # SinglePartition)
    scans: list[int] = field(default_factory=list)  # columns read per scan
    pushed_filters: int = 0
    row_udf: bool = False
    arrow: bool = False
    take_ordered: bool = False      # two-phase top-k (no global Sort)
    partial_aggregates: int = 0     # map-side combine stages
    plan: str = ""

    @property
    def joins(self) -> int:
        return (self.broadcast_joins + self.sort_merge_joins
                + self.shuffled_hash_joins)


def plan_facts(df: DataFrame, *, executed: bool = True) -> PlanFacts:
    """Extract :class:`PlanFacts` from ``df``'s physical plan. With
    ``executed=True`` (default) reads the post-AQE executed plan — run an
    action first for final join/exchange decisions; AQE-planned trees are
    still inspectable before that, just marked non-final by Spark."""
    qe = df._jdf.queryExecution()
    plan = (qe.executedPlan() if executed else qe.sparkPlan()).toString()
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final tree or every operator
    # double-counts
    marker = "== Initial Plan =="
    if marker in plan:
        plan = plan.split(marker)[0]
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    return PlanFacts(
        broadcast_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        broadcast_nl_joins=len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        shuffled_hash_joins=len(re.findall(r"ShuffledHashJoin", plan)),
        # Spark prints "Exchange hashpartitioning(...)", "Exchange
        # rangepartitioning(...)" and "Exchange SinglePartition" (capital S)
        # — match case-insensitively or single-partition (global-aggregate)
        # shuffles are never counted and the max_exchanges gate is porous.
        cartesian_products=len(re.findall(r"CartesianProduct", plan)),
        exchanges=len(re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
            plan, re.IGNORECASE)),
        single_partition_exchanges=len(re.findall(
            r"Exchange SinglePartition", plan)),
        scans=[len([c for c in s.split(",") if c.strip()]) for s in scans],
        pushed_filters=len(re.findall(r"PushedFilters: \[[^\]]+\]", plan)),
        row_udf="BatchEvalPython" in plan,
        arrow=("ArrowEvalPython" in plan or "MapInPandas" in plan
               or "FlatMapGroupsInPandas" in plan),
        take_ordered="TakeOrderedAndProject" in plan,
        partial_aggregates=len(re.findall(
            r"HashAggregate\([^)]*keys=[^)]*functions=\[partial_", plan)),
        plan=plan)


def assert_plan(df: DataFrame, *, max_exchanges: int | None = None,
                max_scan_cols: int | None = None,
                require_pushed_filters: bool = False,
                no_row_udf: bool = True,
                executed: bool = True) -> PlanFacts:
    """Pin a query's plan shape; raises AssertionError naming the violated
    property (with the plan attached) and returns the facts when clean."""
    f = plan_facts(df, executed=executed)
    if no_row_udf and f.row_udf:
        raise AssertionError(
            "row-at-a-time Python UDF in plan:\n" + f.plan)
    if max_exchanges is not None and f.exchanges > max_exchanges:
        raise AssertionError(
            f"{f.exchanges} exchanges > {max_exchanges}:\n" + f.plan)
    if max_scan_cols is not None and any(c > max_scan_cols for c in f.scans):
        raise AssertionError(
            f"scan reads {max(f.scans)} cols > {max_scan_cols} "
            "(pruning lost):\n" + f.plan)
    if require_pushed_filters and f.pushed_filters == 0:
        raise AssertionError("no pushed filters reached the scan:\n" + f.plan)
    return f
