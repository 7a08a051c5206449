"""Bucketed table layout — co-located joins without a shuffle.

The write-side half of the scale story the operator docstrings reference:
at 100 TB, the fact tables that join repeatedly on the same key (orders ⋈
lineitem on orderkey; graph edges on src) are written ONCE bucketed (and
sorted) by that key, and every subsequent join or aggregate on it runs
with ZERO exchange on the bucketed side — the shuffle is paid at write
time, once, instead of per query.

Spark specifics encoded here:
- ``bucketBy`` requires a table-catalog write (``saveAsTable``); plain
  ``parquet(path)`` silently drops bucket metadata.
- both sides must have the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  exchange-free join.
- ``sortBy`` additionally removes the per-task Sort before SortMergeJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str], *,
                   buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and by default sorted) managed table.
    One shuffle now; exchange-free joins/aggregates on ``bucket_cols``
    forever after."""
    w = (df.write.mode(mode)
         .bucketBy(buckets, *bucket_cols))
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on their
    bucket key. With matching bucket counts the physical plan contains NO
    Exchange under either join child (verify with
    ``assert_no_shuffle_join``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> str:
    """Raise if the executed plan shuffles either join side; returns the
    plan string for logging. The check target for bucketed layouts."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join still shuffles:\n" + plan)
    return plan
