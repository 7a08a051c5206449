"""Deterministic shard export + manifest verification."""

from pyspark.sql import functions as F

from vivace_graph_v3_spark.pipeline.export import (
    export_shards, verify_shards, with_shard)


def test_export_roundtrip_and_corruption_detection(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text"), F.col("id")).alias("text"))
    path = str(tmp_path / "corpus")
    manifest = export_shards(df, path, "doc_id", n_shards=8)
    rows = manifest.collect()
    assert len(rows) == 8 and sum(r.n_rows for r in rows) == 500
    # intact export verifies clean
    assert verify_shards(spark, path).count() == 0
    # shard assignment is a pure function of the key
    a = {r.doc_id: r.shard for r in
         with_shard(df, "doc_id", n_shards=8).collect()}
    b = {r.doc_id: r.shard for r in
         with_shard(df.repartition(13), "doc_id", n_shards=8).collect()}
    assert a == b
    # corrupt one shard (append a duplicate row file) -> flagged
    victim = rows[0].shard
    (df.limit(1).withColumn("shard", F.lit(victim))
     .write.mode("append").partitionBy("shard").parquet(path))
    bad = {(r.shard, r.kind) for r in verify_shards(spark, path).collect()}
    assert (victim, "count") in bad
