"""Plan-introspection API: facts extraction and CI-gate assertions."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.plans import assert_plan, plan_facts


def test_plan_facts_on_pruned_filtered_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = (li.filter(F.col("l_quantity") > 30)
         .select("l_orderkey", "l_quantity"))
    q.collect()
    f = plan_facts(q)
    assert f.scans == [2]           # column pruning reached parquet
    assert f.pushed_filters == 1    # predicate reached the scan
    assert f.joins == 0 and not f.row_udf
    # gates pass...
    assert_plan(q, max_exchanges=0, max_scan_cols=2,
                require_pushed_filters=True)
    # ...and fail loudly when violated
    with pytest.raises(AssertionError, match="pruning lost"):
        assert_plan(q, max_scan_cols=1)


def test_assert_plan_flags_exchanges_and_broadcast(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    j = (li.join(F.broadcast(orders),
                 li["l_orderkey"] == orders["o_orderkey"])
         .groupBy("o_orderpriority").count())
    j.collect()
    f = plan_facts(j)
    assert f.broadcast_joins == 1
    with pytest.raises(AssertionError, match="exchanges"):
        assert_plan(j, max_exchanges=0)


def test_plan_facts_counts_single_partition_exchange(spark):
    """A global (ungrouped) aggregate shuffles via `Exchange
    SinglePartition` — capital S, which a case-sensitive lowercase regex
    missed, silently zeroing the exchange gate (ADVICE r3)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    g = li.agg(F.sum("l_quantity").alias("s"))
    g.collect()
    assert plan_facts(g).exchanges >= 1
