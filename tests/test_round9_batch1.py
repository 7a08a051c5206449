"""Unit tests for the round-9 operator batch: Cochran's Q, two-sample
effect sizes, confident-learning label audit, Good-Turing unseen mass,
language-mixing audit, and the curation attrition funnel."""

import math

import pyspark.sql.functions as F
import pytest


def test_cochran_q_matches_hand_computation(spark):
    from vivace_graph_v3_spark.operators.stats_inference import cochran_q

    rows = [(1, 1, 0, 1), (1, 0, 0, 1), (0, 1, 1, 1),
            (1, 1, 1, 1), (0, 0, 0, 1), (1, 0, 1, 1)]
    df = spark.createDataFrame(rows, ["a", "b", "c", "y"])
    out = cochran_q(df, [F.col("a"), F.col("b"), F.col("c")],
                    F.col("y")).collect()[0]
    X = [[int(r[i] == r[3]) for i in range(3)] for r in rows]
    G = [sum(x[j] for x in X) for j in range(3)]
    L = [sum(x) for x in X]
    S, k = sum(L), 3
    num = (k - 1) * (k * sum(g * g for g in G) - S * S)
    den = k * S - sum(v * v for v in L)
    assert out["n"] == 6 and out["k"] == 3
    assert out["q_ppm"] == num * 10**6 // den


def test_cochran_q_degenerate_denominator_is_null(spark):
    from vivace_graph_v3_spark.operators.stats_inference import cochran_q

    # every row all-correct: k*S - sum L^2 = 0 -> NULL, not div-by-zero
    df = spark.createDataFrame([(1, 1, 1)] * 4, ["a", "b", "y"])
    out = cochran_q(df, [F.col("a"), F.col("b")], F.col("y")).collect()[0]
    assert out["q_ppm"] is None


def test_cochran_q_rejects_single_classifier(spark):
    from vivace_graph_v3_spark.operators.stats_inference import cochran_q

    df = spark.createDataFrame([(1, 1)], ["a", "y"])
    with pytest.raises(ValueError):
        cochran_q(df, [F.col("a")], F.col("y"))


def test_effect_size_report_matches_hand_computation(spark):
    from vivace_graph_v3_spark.operators.stats_inference import (
        effect_size_report)

    A, B = [1, 2, 2, 5], [2, 3, 4]
    vals = [("a", v) for v in A] + [("b", v) for v in B]
    df = spark.createDataFrame(vals, ["g", "v"])
    out = effect_size_report(df, "g", "v", "a", "b").collect()[0]
    wins = sum(1 for x in A for y in B if x > y)
    losses = sum(1 for x in A for y in B if x < y)
    net = wins - losses
    delta = int(math.copysign(abs(net) * 10**6 // (len(A) * len(B)), net))
    ma, mb = sum(A) / len(A), sum(B) / len(B)
    var = (sum((x - ma) ** 2 for x in A)
           + sum((x - mb) ** 2 for x in B)) / (len(A) + len(B) - 2)
    assert out["n_a"] == 4 and out["n_b"] == 3
    assert out["cliffs_delta_ppm"] == delta
    assert out["cohen_d"] == pytest.approx(
        round((ma - mb) / math.sqrt(var), 4))


def test_effect_size_identical_groups_zero(spark):
    from vivace_graph_v3_spark.operators.stats_inference import (
        effect_size_report)

    vals = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    out = effect_size_report(spark.createDataFrame(vals, ["g", "v"]),
                             "g", "v", "a", "b").collect()[0]
    assert out["cliffs_delta_ppm"] == 0
    assert out["cohen_d"] == 0.0


def test_confident_learning_matches_hand_computation(spark):
    from vivace_graph_v3_spark.operators.stats_inference import (
        confident_learning_audit)

    data = [(0.95, 1), (0.9, 1), (0.2, 1), (0.1, 0), (0.05, 0), (0.85, 0)]
    out = confident_learning_audit(
        spark.createDataFrame(data, ["p", "y"]), "p", "y").collect()[0]
    t1 = (950000 + 900000 + 200000) // 3
    t0 = (900000 + 950000 + 150000) // 3
    cj, unconf = {}, 0
    for p, y in data:
        pp = round(p * 10**6)
        q1, q0 = pp >= t1, (10**6 - pp) >= t0
        if q1 and q0:
            j = 1 if pp * 2 >= 10**6 else 0
        elif q1:
            j = 1
        elif q0:
            j = 0
        else:
            unconf += 1
            continue
        cj[(y, j)] = cj.get((y, j), 0) + 1
    assert out["c00"] == cj.get((0, 0), 0)
    assert out["c01"] == cj.get((0, 1), 0)
    assert out["c10"] == cj.get((1, 0), 0)
    assert out["c11"] == cj.get((1, 1), 0)
    assert out["n_unconfident"] == unconf
    assert out["label_errors"] == out["c01"] + out["c10"]


def test_good_turing_mass_counts(spark):
    from vivace_graph_v3_spark.pipeline.text import good_turing_mass

    docs = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "c d", "s1"), (3, "x y", "s2")],
        ["doc_id", "text", "source"])
    out = {r["source"]: r.asDict()
           for r in good_turing_mass(docs).collect()}
    # s1: a:3 b:2 c:2 d:1 -> N=8, V=4, N1=1, N2=2
    assert out["s1"]["n_tokens"] == 8
    assert out["s1"]["vocab_size"] == 4
    assert out["s1"]["n1"] == 1 and out["s1"]["n2"] == 2
    assert out["s1"]["p0_ppm"] == 10**6 // 8
    assert out["s1"]["c1_star_ppm"] == 2 * 2 * 10**6 // 1
    # s2: x:1 y:1 -> all singletons, no doubletons
    assert out["s2"]["n1"] == 2 and out["s2"]["n2"] == 0
    assert out["s2"]["p0_ppm"] == 10**6


def test_lang_mix_audit_detects_code_switching(spark):
    from vivace_graph_v3_spark.pipeline.text import lang_mix_audit

    en = "the and of to is in that with " * 4      # 32 en tokens
    de = "der die das und ist nicht mit ein " * 4  # 32 de tokens
    docs = spark.createDataFrame(
        [(1, en + de), (2, en + en), (3, ""), (4, "zz qq ww")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in lang_mix_audit(docs).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_switches"] == 1
    assert out[1]["n_langs"] == 2 and out[1]["mixed"]
    assert out[2]["n_chunks"] == 2 and out[2]["n_switches"] == 0
    assert out[2]["n_langs"] == 1 and not out[2]["mixed"]
    assert out[3]["n_chunks"] == 0 and not out[3]["mixed"]
    assert out[4]["n_langs"] == 0  # no markers -> 'und' only


def test_curation_funnel_is_a_funnel(spark):
    from vivace_graph_v3_spark.pipeline.text import curation_funnel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted((r["stage"], r["n_in"], r["n_fail"], r["n_out"])
                  for r in curation_funnel(docs).collect())
    assert len(rows) == 4
    assert rows[0][1] == docs.count()
    for stage, n_in, n_fail, n_out in rows:
        assert n_in == n_fail + n_out
    # survivors chain: n_out(i) == n_in(i+1)
    for (s1, _, _, out1), (s2, in2, _, _) in zip(rows, rows[1:]):
        assert out1 == in2
