"""Unit tests for the round-9 batch-2 operators: streaming watermark
late-audit, power-iteration top eigenpair, and the dedup cluster-size
profile."""

import math

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


def test_stream_late_audit_flags_cross_batch_lateness(spark, tmp_path):
    """Per-key high-water-mark state carries across micro-batches: an
    event in a later batch below the mark is late; within-batch events
    are judged against the PRE-batch mark only."""
    from vivace_graph_v3_spark.streaming.stateful import stream_late_audit

    src = str(tmp_path / "src")
    # batch 1: user 7 at ms=100, 300 (no prior mark -> never late)
    # batch 2: user 7 at ms=50 (late vs 300), ms=400 (on time);
    #          user 8 at ms=10 (first batch for key 8 -> not late)
    rows1 = [(100, 7, 1), (300, 7, 2)]
    rows2 = [(50, 7, 3), (400, 7, 4), (10, 8, 5)]
    for rows in (rows1, rows2):
        (spark.createDataFrame(rows, "ms long, user_id long, v long")
         .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream.schema("ms long, user_id long, v long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_late_audit(stream, key_col="user_id", value_col="v",
                            ts_col="ms")
    q = (out.writeStream.format("memory").queryName("late_t")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(r["key"], r["event_ms"]): r
           for r in spark.table("late_t").collect()}
    assert len(got) == 5
    assert not got[("7", 100)]["is_late"]
    assert got[("7", 100)]["watermark_ms"] == -1
    assert not got[("7", 300)]["is_late"]
    assert got[("7", 50)]["is_late"]
    assert got[("7", 50)]["watermark_ms"] == 300
    assert not got[("7", 400)]["is_late"]
    assert not got[("8", 10)]["is_late"]
    assert got[("8", 10)]["watermark_ms"] == -1


def test_late_audit_contract_matches_relational_watermark(spark):
    """The drained contract artifact equals the relational rule: late
    iff event_ms < the key's max event_ms over strictly earlier
    round-robin batches (event_id % 4)."""
    from pyspark.sql import Window

    from vivace_graph_v3_spark import entry_queries as eq

    base = eq._session_late_audit_run(spark, SF_DIR)
    got = spark.read.parquet(f"{base}/late")
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select(F.col("user_id").cast("string").alias("key"),
                  F.col("event_id").alias("value"),
                  F.expr("unix_micros(cast(ts as timestamp)) div 1000")
                  .alias("event_ms"),
                  F.pmod("event_id", F.lit(4)).alias("b")))
    w = (Window.partitionBy("key").orderBy("b")
         .rangeBetween(Window.unboundedPreceding, -1))
    want = ev.withColumn("wm", F.max("event_ms").over(w)).select(
        "key", "event_ms", "value",
        F.coalesce(F.col("event_ms") < F.col("wm"), F.lit(False))
        .alias("is_late"),
        F.coalesce("wm", F.lit(-1)).alias("watermark_ms"))
    assert got.count() == want.count()
    diff = got.exceptAll(want)
    assert diff.isEmpty()
    # the round-robin split must actually produce late traffic
    assert got.filter("is_late").count() > 0


def test_embedding_top_eigen_matches_numpy(spark):
    """The pinned-order power iterations from e_0 land on numpy's top eigenpair of
    the same rounded covariance (up to sign and iteration residual)."""
    np = pytest.importorskip("numpy")
    from vivace_graph_v3_spark.pipeline.similarity import (
        embedding_covariance, embedding_top_eigen)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    row = embedding_top_eigen(emb).collect()[0]
    cells = embedding_covariance(emb, dims=8).collect()
    cov = {(r["i"], r["j"]): r["cov"] for r in cells}
    C = np.array([[cov[(min(i, j), max(i, j))] for j in range(8)]
                  for i in range(8)])
    vals, vecs = np.linalg.eigh(C)
    assert row["lambda_top"] == pytest.approx(vals[-1], rel=1e-3)
    v = np.array([row[f"v{i}"] for i in range(8)])
    top = vecs[:, -1]
    # the vector converges half as fast as the Rayleigh quotient; the
    # cross-engine EXACTNESS is the oracle's job — this is a sanity
    # alignment check against an independent eigensolver
    assert abs(float(abs(v @ top))) == pytest.approx(1.0, abs=2e-2)
    assert row["trace"] == pytest.approx(float(np.trace(C)), abs=1e-5)
    # floor of the UNROUNDED ratio: the 6-dp-rounded lambda/trace can
    # shift the recomputed ppm by up to ~0.5e-6/trace*1e6 ~ 5
    assert abs(row["top_share_ppm"]
               - row["lambda_top"] / row["trace"] * 1e6) < 10


def test_cluster_size_profile_histogram(spark):
    from vivace_graph_v3_spark.pipeline.dedup import cluster_size_profile

    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO WORLD "),
         (4, "unique one"), (5, "another  text"), (6, "another text")],
        ["doc_id", "text"])
    rows = {r["cluster_size"]: r.asDict()
            for r in cluster_size_profile(docs).collect()}
    # families: {1,2,3} (hello world), {5,6} (another text), {4}
    assert rows[1]["n_clusters"] == 1 and rows[1]["dup_docs"] == 0
    assert rows[2]["n_clusters"] == 1 and rows[2]["dup_docs"] == 1
    assert rows[3]["n_clusters"] == 1 and rows[3]["dup_docs"] == 2
    assert rows[3]["docs_share_ppm"] == 3 * 1_000_000 // 6
    assert sum(r["n_docs"] for r in rows.values()) == 6


def test_cluster_size_profile_prefix_mode(spark):
    from vivace_graph_v3_spark.pipeline.dedup import cluster_size_profile

    docs = spark.createDataFrame(
        [(1, "shared prefix AAAA then tail one"),
         (2, "shared prefix AAAA then tail two"),
         (3, "different entirely")],
        ["doc_id", "text"])
    # whole-text: all distinct
    whole = {r["cluster_size"]: r["n_clusters"]
             for r in cluster_size_profile(docs).collect()}
    assert whole == {1: 3}
    # 20-char prefix: docs 1,2 share a family
    pre = {r["cluster_size"]: r["n_clusters"]
           for r in cluster_size_profile(docs, prefix_chars=20).collect()}
    assert pre == {1: 1, 2: 1}
