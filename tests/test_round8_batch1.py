"""Unit tests for the round-8 registration batch: grid-DBSCAN, BLEU
pairs, McNemar, inequality indices, DSIR selection, CCNet buckets."""

import math

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR, duck_set, rows_set


def test_grid_dbscan_blobs_and_noise(spark):
    from vivace_graph_v3_spark.operators.spatial import grid_dbscan

    pts = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),       # blob A
           (5, 50, 50), (6, 51, 50), (7, 50, 51), (8, 51, 51),  # blob B
           (9, 200, 200)]                                     # noise
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r["id"]: (r["cluster"], r["role"])
           for r in grid_dbscan(df, eps=2, min_pts=4).collect()}
    # two distinct clusters, labeled by their min point id
    for i in (1, 2, 3, 4):
        assert out[i] == (1, "core")
    for i in (5, 6, 7, 8):
        assert out[i] == (5, "core")
    assert out[9] == (None, "noise")


def test_grid_dbscan_coincident_points_are_core(spark):
    from vivace_graph_v3_spark.operators.spatial import grid_dbscan

    pts = [(i, 10, 10) for i in range(1, 5)] + [(9, 0, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r["id"]: (r["cluster"], r["role"])
           for r in grid_dbscan(df, eps=1, min_pts=4).collect()}
    for i in range(1, 5):
        assert out[i] == (1, "core")
    assert out[9] == (None, "noise")


def test_grid_dbscan_border_attaches_min_cluster(spark):
    from vivace_graph_v3_spark.operators.spatial import grid_dbscan

    # a cross: the center sees both arms (core at min_pts=3), each arm
    # sees only the center (non-core, within eps of a core -> border)
    pts = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (9, 50, 50)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r["id"]: (r["cluster"], r["role"])
           for r in grid_dbscan(df, eps=1, min_pts=3).collect()}
    assert out[1] == (1, "core")
    assert out[2] == (1, "border")
    assert out[3] == (1, "border")
    assert out[9] == (None, "noise")


def test_bleu_pairs_exact_counts(spark):
    from vivace_graph_v3_spark.pipeline.text import bleu_pairs

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat", "s"),
         (2, "the cat on the mat", "s")],
        "doc_id long, text string, source string")
    row = bleu_pairs(df).collect()[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["len_a"] == 6 and row["len_b"] == 5
    # cand unigrams: the x2, cat, sat, on, mat; ref: the x2, cat, on, mat
    # clipped m1 = 2 + 1 + 0 + 1 + 1 = 5
    assert row["m1"] == 5 and row["t1"] == 6
    # cand bigrams: 'the cat','cat sat','sat on','on the','the mat';
    # ref bigrams: 'the cat','cat on','on the','the mat' -> m2 = 3
    assert row["m2"] == 3 and row["t2"] == 5
    assert row["p1_ppm"] == 5 * 1_000_000 // 6
    assert row["p2_ppm"] == 3 * 1_000_000 // 5
    assert row["brevity_penalized"] == 0  # candidate longer than ref


def test_mcnemar_exact(spark):
    from vivace_graph_v3_spark.operators.stats_inference import mcnemar_test

    rows = ([(1, 1, 1)] * 10      # both right
            + [(1, 0, 1)] * 6     # A right, B wrong
            + [(0, 1, 1)] * 2     # A wrong, B right
            + [(0, 0, 1)] * 3)    # both wrong
    df = spark.createDataFrame(rows, "a int, b int, y int")
    r = mcnemar_test(df, F.col("a"), F.col("b"), F.col("y")).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (10, 6, 2, 3)
    # chi2_cc = (|6-2|-1)^2 / 8 = 9/8 -> 1125000 ppm
    assert r["chi2_cc_ppm"] == 1_125_000


def test_mcnemar_zero_discordant_is_null_and_clamped(spark):
    from vivace_graph_v3_spark.operators.stats_inference import mcnemar_test

    df = spark.createDataFrame([(1, 1, 1)] * 4, "a int, b int, y int")
    r = mcnemar_test(df, F.col("a"), F.col("b"), F.col("y")).collect()[0]
    assert r["chi2_cc_ppm"] is None
    # equal discordant counts: statistic clamps to 0, not (0-1)^2
    df2 = spark.createDataFrame(
        [(1, 0, 1), (0, 1, 1)], "a int, b int, y int")
    r2 = mcnemar_test(df2, F.col("a"), F.col("b"),
                      F.col("y")).collect()[0]
    assert r2["chi2_cc_ppm"] == 0


def test_inequality_indices_known_values(spark):
    from vivace_graph_v3_spark.operators.stats import inequality_indices

    # equal distribution: both indices exactly 0
    eq = spark.createDataFrame([(5.0,)] * 8, "v double")
    r = inequality_indices(eq, "v").collect()[0]
    assert r["theil_t"] == 0.0 and r["atkinson_1"] == 0.0
    # known two-point distribution {1, 3}: mu=2,
    # T = (1/2)*((1/2)ln(1/2) + (3/2)ln(3/2))
    two = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    r2 = inequality_indices(two, "v").collect()[0]
    t = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    a = 1 - math.exp(0.5 * (math.log(1) + math.log(3))) / 2
    assert r2["theil_t"] == pytest.approx(round(t, 4), abs=1e-9)
    assert r2["atkinson_1"] == pytest.approx(round(a, 4), abs=1e-9)
    # zero/negative excluded, reported n shrinks
    mixed = spark.createDataFrame([(0.0,), (-1.0,), (2.0,), (2.0,)],
                                  "v double")
    r3 = inequality_indices(mixed, "v").collect()[0]
    assert r3["n"] == 2 and r3["theil_t"] == 0.0


def test_dsir_prefers_target_like_docs(spark):
    from vivace_graph_v3_spark.pipeline.text import dsir_select

    rows = ([(i, "alpha beta gamma delta", "t") for i in range(10)]
            + [(100, "alpha beta gamma delta", "r"),
               (101, "omega psi chi phi", "r"),
               (102, "alpha beta omega psi", "r")])
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = dsir_select(df, target_source="t", k=3)
    ids = [r["doc_id"] for r in out.collect()]
    # the doc identical to the target distribution ranks first,
    # the disjoint-vocab doc last
    assert ids[0] == 100 and ids[-1] == 101
    scores = {r["doc_id"]: r["score_ppm"] for r in out.collect()}
    assert scores[100] > scores[102] > scores[101]


def test_ccnet_buckets_structure(spark):
    from vivace_graph_v3_spark.pipeline.text import ccnet_perplexity_buckets

    rows = [(i, "common words here always", "en") for i in range(6)] \
        + [(10 + i, f"rare{i} unique{i} tokens{i} junk{i}", "en")
           for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_perplexity_buckets(df)
    rowsc = {r["bucket"]: r for r in out.collect()}
    assert set(rowsc) == {"head", "middle", "tail"}
    assert rowsc["head"]["n_docs"] == 3
    # cleanest (most probable) docs land in head: head mean < tail mean
    assert rowsc["head"]["mean_nlp"] < rowsc["tail"]["mean_nlp"]


def test_round8_entries_match_oracle_sf0001(spark, duck):
    import __spark_entry__ as e

    for name in ["geo_grid_dbscan", "bleu_pairs", "classifier_mcnemar",
                 "revenue_inequality", "dsir_select", "ccnet_buckets"]:
        got = rows_set(e.queries()[name](spark, SF_DIR))
        want = duck_set(duck, e.oracle_sql()[name])
        assert got == want, name


def test_binary_signatures_packing(spark):
    from vivace_graph_v3_spark.pipeline.similarity import binary_signatures

    # dims 0 and 33 positive -> bit 0 of lo, bit 1 of hi
    vec = [1.0] + [-1.0] * 32 + [2.0] + [-1.0] * 30
    df = spark.createDataFrame([(7, vec)], "vec_id long, embedding array<double>")
    r = binary_signatures(df).collect()[0]
    assert r["sig_lo"] == 1 and r["sig_hi"] == 2


def test_hamming_topk_exact_order(spark):
    from vivace_graph_v3_spark.pipeline.similarity import hamming_topk

    def vec(bits):
        return [1.0 if i in bits else -1.0 for i in range(64)]

    rows = [(0, vec({0, 1, 2, 3})),          # query
            (1, vec({0, 1, 2, 3})),          # hamming 0
            (2, vec({0, 1, 2})),             # hamming 1
            (3, vec({0, 1, 40, 41})),        # hamming 4
            (4, vec(set(range(32, 64))))]    # far
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hamming_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    got = [(r["neighbor_id"], r["hamming"]) for r in out]
    assert got == [(1, 0), (2, 1), (3, 4)]


def test_ann_binary_hamming_matches_oracle(spark, duck):
    import __spark_entry__ as e

    name = "ann_binary_hamming"
    got = rows_set(e.queries()[name](spark, SF_DIR))
    want = duck_set(duck, e.oracle_sql()[name])
    assert got == want


def test_temporal_earliest_arrival_respects_time(spark):
    from vivace_graph_v3_spark.operators.graph_algorithms import (
        temporal_earliest_arrival)

    # a -> b at t=10; b -> c at t=5 (BEFORE arrival at b: unusable);
    # b -> d at t=20 (usable); d -> c at t=30
    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 5), ("b", "d", 20), ("d", "c", 30)],
        "src string, dst string, ts long")
    seeds = spark.createDataFrame([("a",)], ["id"])
    out = {(r["seed"], r["node"]): r["arrival"]
           for r in temporal_earliest_arrival(edges, seeds,
                                              max_hops=4).collect()}
    assert out[("a", "b")] == 10
    assert out[("a", "d")] == 20
    assert out[("a", "c")] == 30  # only via d; b->c at 5 is in the past
    assert ("a", "a") not in out


def test_temporal_earliest_arrival_prefers_earliest(spark):
    from vivace_graph_v3_spark.operators.graph_algorithms import (
        temporal_earliest_arrival)

    # two routes to c: direct at 50, via b arriving 15 — earliest wins;
    # and the earlier arrival at c enables c -> e at 20 (the direct
    # route would have missed it: optimal-substructure regression)
    edges = spark.createDataFrame(
        [("a", "c", 50), ("a", "b", 5), ("b", "c", 15), ("c", "e", 20)],
        "src string, dst string, ts long")
    seeds = spark.createDataFrame([("a",)], ["id"])
    out = {r["node"]: r["arrival"]
           for r in temporal_earliest_arrival(edges, seeds,
                                              max_hops=4).collect()}
    assert out["c"] == 15
    assert out["e"] == 20


def test_mink_prob_audit_tail_focus(spark):
    from vivace_graph_v3_spark.pipeline.text import mink_prob_audit

    # doc 1: all-common tokens; doc 2: same commons + one rare token.
    # With k=20% on 5 tokens (k_used=1), doc 2's worst token is the
    # rare one -> strictly higher mink score
    rows = [(1, "x x x x x"), (2, "x x x x rareword")] \
        + [(10 + i, "x x x x x") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in mink_prob_audit(df).collect()}
    assert out[1]["k_used"] == 1 and out[2]["k_used"] == 1
    assert out[2]["mink_nlp"] > out[1]["mink_nlp"]


def test_stream_dedup_batchwise_semantics(spark, tmp_path):
    # drive stream_dedup through two availableNow micro-batches and
    # check first-occurrence flags carry state across the boundary
    import os

    from vivace_graph_v3_spark.streaming.stateful import stream_dedup

    b1 = spark.createDataFrame(
        [(1, 1.0, 100.0), (1, 2.0, 101.0), (1, 1.0, 102.0)],
        "user_id long, value double, event_time double")
    b2 = spark.createDataFrame(
        [(1, 1.0, 200.0), (1, 3.0, 201.0)],
        "user_id long, value double, event_time double")
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1.coalesce(1).write.parquet(str(tmp_path / "p1"))
    b2.coalesce(1).write.parquet(str(tmp_path / "p2"))
    import glob
    import shutil
    for i, d in enumerate(["p1", "p2"]):
        (pf,) = glob.glob(str(tmp_path / d / "part-*.parquet"))
        dst = os.path.join(src, f"q{i}.parquet")
        shutil.move(pf, dst)
        os.utime(dst, (1000 + i, 1000 + i))
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (stream_dedup(stream, ts_col="event_time")
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["event_ms"]): r["is_first"]
           for r in spark.read.parquet(out_dir).collect()}
    assert got[100000] is True     # first 1
    assert got[101000] is True     # first 2
    assert got[102000] is False    # repeat 1, same batch
    assert got[200000] is False    # repeat 1, ACROSS batch boundary
    assert got[201000] is True     # first 3


def test_batch3_entries_match_oracle_sf0001(spark, duck):
    import __spark_entry__ as e

    for name in ["mink_prob_audit", "temporal_reach", "stateful_dedup"]:
        got = rows_set(e.queries()[name](spark, SF_DIR))
        want = duck_set(duck, e.oracle_sql()[name])
        assert got == want, name
