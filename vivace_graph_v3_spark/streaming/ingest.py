"""Streaming ingest: turn an event stream into versioned graph mutations.

Closes the loop between the two streaming surfaces: events flow IN as
upsert transactions against a :class:`VersionedGraph` (each micro-batch is
one atomic commit-epoch), and the resulting txn log flows OUT through
replication / view maintenance (streaming/replication.py,
streaming/view_maintenance.py). The reference's equivalent path is client
writes -> with-transaction -> WAL -> replication
(transactions.lisp:255-266 -> 1382-1424 -> transaction-streaming.lisp).

``upsert_stream`` is deliberately generic: the caller maps each micro-batch
DataFrame to (type_name, rows) upserts; rows whose id exists get saved
(revision bump), new ids get created — per-batch merge semantics on top of
the OCC write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.mvcc import VersionedGraph


def upsert_batch(graph: VersionedGraph, type_name: str, rows: DataFrame) -> int:
    """One atomic upsert commit: split incoming rows into creates (unknown
    id) and saves (known id, carrying the current revision so OCC passes).
    Duplicate ids within the batch are collapsed last-wins-arbitrary
    (dropDuplicates) before the split."""
    rows = rows.dropDuplicates(["id"])
    cur = graph.read(type_name, include_deleted=True).select(
        "id", F.col("revision").alias("__rev"))
    joined = rows.join(cur, "id", "left")
    creates = joined.filter(F.col("__rev").isNull()).drop("__rev")
    saves = (joined.filter(F.col("__rev").isNotNull())
             .withColumn("revision", F.col("__rev")).drop("__rev"))
    tx = graph.begin()
    if not creates.isEmpty():
        tx.create(type_name, creates)
    if not saves.isEmpty():
        tx.save(type_name, saves)
    if tx.ops:
        return graph.commit(tx)
    return graph.current_epoch()


def upsert_stream(stream: DataFrame, graph: VersionedGraph, type_name: str,
                  *, transform=None, checkpoint: str,
                  available_now: bool = True):
    """Drive ``upsert_batch`` from a streaming source via foreachBatch.
    ``transform(batch_df) -> rows`` shapes each micro-batch into node rows
    (must produce an ``id`` column + declared slots)."""

    def apply(batch: DataFrame, _batch_id: int) -> None:
        rows = transform(batch) if transform else batch
        upsert_batch(graph, type_name, rows)

    writer = (stream.writeStream.foreachBatch(apply)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
