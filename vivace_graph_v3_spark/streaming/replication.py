"""Master/slave replication as Structured Streaming over the txn log.

Reference semantics reproduced (citations into /root/reference):

- master -> slave broadcast of committed txns, applied in commit order
  (transaction-streaming.lisp:3-236, graph-class.lisp:85-103): the Spark
  analog is a Structured Streaming job tailing the master's append-only
  txn-log directory and appending to the replica's log — commit order is
  carried by ``commit_epoch`` and the replica's merge-on-read resolution
  (mvcc.py) is order-insensitive within an epoch, so at-least-once file
  delivery converges to the same state.
- subset replication filter (graph-class.lisp:98-103,
  transactions.lisp:884-956, spatial-query.lisp:161-172): the slave applies
  only writes whose node passes a predicate; an update of a now-excluded node
  becomes a delete; inserts of excluded nodes are skipped; deletes always
  apply.
- recovery/replay (transactions.lisp:1987-2035): the streaming checkpoint is
  the ``load-highest-transaction-id`` analog — restarting the query resumes
  from the last processed log file.

Scale note: the stream carries only deltas (the txn log), never base-table
data; the filter is expression-only (``from_json`` on the payload), so the
whole pipeline stays JVM-side with no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vivace_graph_v3_spark.mvcc import LOG_SCHEMA, VersionedGraph, _slot_struct
from vivace_graph_v3_spark.schema import SchemaRegistry


def subset_filter(df: DataFrame, registry: SchemaRegistry,
                  predicates: dict) -> DataFrame:
    """Apply per-type subset-replication predicates to a txn-log frame.

    ``predicates`` maps type name -> fn(payload_struct_col) -> BooleanType
    Column evaluated over the decoded slot payload. Types without a predicate
    replicate fully. Semantics (transactions.lisp:884-956):

    - delete ops always pass (removing an excluded node is a no-op);
    - inserts/updates passing the predicate pass through;
    - an update of a now-excluded node is *converted to a delete* so the
      replica drops nodes that move out of the replicated subset;
    - inserts of excluded nodes are dropped.
    """
    if not predicates:
        return df
    keep = F.lit(None).cast("boolean")
    for type_name, make_pred in predicates.items():
        nt = registry.get(type_name)
        payload = F.from_json("payload", _slot_struct(nt))
        keep = F.when(F.col("type") == type_name,
                      F.coalesce(make_pred(payload), F.lit(False))).otherwise(keep)
    keep = F.coalesce(keep, F.lit(True))  # unlisted types replicate fully

    passes = keep | (F.col("op") == "delete")
    # materialize the demote flag BEFORE rewriting op: the flag references
    # op=='update', which the rewrite below would otherwise clobber
    d = F.col("__demote")
    return (df.withColumn("__demote", (~keep) & (F.col("op") == "update"))
            .filter(passes | d)
            .withColumn("op", F.when(d, F.lit("delete")).otherwise(F.col("op")))
            .withColumn("deleted", F.when(d, F.lit(True)).otherwise(F.col("deleted")))
            .withColumn("payload", F.when(d, F.lit(None).cast("string"))
                        .otherwise(F.col("payload")))
            .drop("__demote"))


def replicate(spark: SparkSession, master_log: str, replica: VersionedGraph, *,
              predicates: dict | None = None, checkpoint: str,
              available_now: bool = True):
    """Start the slave-side apply stream: tail ``master_log`` and append the
    (optionally subset-filtered) txn rows to ``replica``'s log.

    With ``available_now`` the query drains everything currently in the master
    log and stops — the batch catch-up mode used in tests and backfills; pass
    ``False`` for a continuously-running slave. Returns the StreamingQuery.
    """
    src = spark.readStream.schema(LOG_SCHEMA).parquet(master_log)
    out = subset_filter(src, replica.registry, predicates or {})
    writer = (out.writeStream
              .format("parquet")
              .option("path", replica.log_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replicate_and_wait(spark: SparkSession, master_log: str,
                       replica: VersionedGraph, *, predicates: dict | None = None,
                       checkpoint: str, timeout: int = 120) -> None:
    """One catch-up replication pass (drain master log, then stop)."""
    q = replicate(spark, master_log, replica, predicates=predicates,
                  checkpoint=checkpoint, available_now=True)
    q.awaitTermination(timeout)
