"""Unit tests for the round-7 batch-4 operators: PPM dimension sniffing,
truncation-loss curve, repetition-aware sampling weights, and MVCC
revision diff (including against a REAL VersionedGraph txn log)."""

from pyspark.sql import functions as F, types as T

from vivace_graph_v3_spark.mvcc import VersionedGraph, revision_diff
from vivace_graph_v3_spark.pipeline.dedup import dedup_sampling_weights
from vivace_graph_v3_spark.pipeline.multimodal import (
    sniff_ppm_dims, synthesize_ppm_media_var)
from vivace_graph_v3_spark.pipeline.text import truncation_loss_curve
from vivace_graph_v3_spark.schema import SchemaRegistry


def _ppm(num: int, den: int) -> int:
    return (num * 2000000 + den) // (den * 2)


class TestSniffDims:
    def test_sniff_matches_synthesized_meta(self, spark):
        df = spark.createDataFrame([(i,) for i in range(25)], ["doc_id"])
        media = synthesize_ppm_media_var(df, "doc_id")
        got = {r["media_id"]: r for r in sniff_ppm_dims(media).collect()}
        meta = {r["media_id"]: r["meta"]
                for r in media.select("media_id", "meta").collect()}
        assert len(got) == 25
        for mid, r in got.items():
            assert r["width"] == meta[mid]["width"]
            assert r["height"] == meta[mid]["height"]
            assert r["n_pixels"] == r["width"] * r["height"]
            assert r["aspect_ppm"] == int(
                (r["width"] * 2000000 + r["height"]) // (r["height"] * 2))

    def test_bytes_are_valid_ppm(self, spark):
        df = spark.createDataFrame([(7,)], ["doc_id"])
        raw = synthesize_ppm_media_var(df, "doc_id").collect()[0]
        b = bytes(raw["media"])
        # id 7: w = 4 + 7%5 = 6, h = 4 + 21%5 = 5
        assert b.startswith(b"P6\n6 5\n255\n")
        assert len(b) == len(b"P6\n6 5\n255\n") + 6 * 5 * 3


class TestTruncationCurve:
    def test_hand_counts(self, spark):
        docs = [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 100)),
                (3, " ".join(["w"] * 300))]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r["max_len"]: r for r in
               truncation_loss_curve(df, max_lens=(64, 256)).collect()}
        r64 = out[64]
        assert r64["n_docs"] == 3 and r64["n_docs_truncated"] == 2
        assert r64["kept_tokens"] == 10 + 64 + 64
        assert r64["total_tokens"] == 410
        assert r64["kept_ppm"] == _ppm(138, 410)
        r256 = out[256]
        assert r256["n_docs_truncated"] == 1
        assert r256["kept_tokens"] == 10 + 100 + 256


class TestSamplingWeights:
    def test_cluster_weights(self, spark):
        docs = [(1, "same  text"), (2, "same text"), (3, "SAME TEXT "),
                (4, "unique thing")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dedup_sampling_weights(df).collect()}
        # 1-3 normalize identically -> cluster of 3
        for d in (1, 2, 3):
            assert out[d]["cluster_size"] == 3
            assert out[d]["weight_ppm"] == _ppm(1, 3)
        assert out[4]["cluster_size"] == 1
        assert out[4]["weight_ppm"] == 1_000_000


class TestRevisionDiff:
    def test_synthetic_log(self, spark):
        rows = [
            (1, "vertex", "t", "insert", "a"),
            (1, "vertex", "t", "insert", "b"),
            (2, "vertex", "t", "update", "a"),   # a updated
            (2, "vertex", "t", "delete", "b"),   # b removed
            (2, "vertex", "t", "insert", "c"),   # c added
            (2, "vertex", "t", "insert", "d"),
            (3, "vertex", "t", "delete", "d"),   # gone by b-epoch too
        ]
        log = spark.createDataFrame(
            rows, "commit_epoch long, kind string, type string, "
                  "op string, id string")
        out = {r["id"]: r["change"]
               for r in revision_diff(log, 1, 3).collect()}
        assert out == {"a": "updated", "b": "removed", "c": "added"}

    def test_against_real_versioned_graph(self, spark, tmp_path):
        reg = SchemaRegistry()
        reg.def_vertex("p", {"v": T.LongType()})
        vg = VersionedGraph(spark, reg, str(tmp_path / "g"))
        mk = lambda ids: spark.createDataFrame(
            [(i, 0) for i in ids], "id string, v long")
        e1 = vg.commit(vg.begin().create("p", mk(["x", "y"])))
        cur = vg.read("p").filter(F.col("id") == "x") \
            .select("id", (F.col("v") + 1).alias("v"), "revision")
        e2 = vg.commit(vg.begin().save("p", cur))
        e3 = vg.commit(vg.begin().mark_deleted("p", mk(["y"]).select("id")))
        e4 = vg.commit(vg.begin().create("p", mk(["z"])))
        out = {r["id"]: r["change"]
               for r in revision_diff(vg._log(), e1, e4).collect()}
        assert out == {"x": "updated", "y": "removed", "z": "added"}
        assert e2 < e3 < e4
