"""Unit tests for the round-7 batch-5 operators: exact-isqrt temperature
mix weights, data-constrained epoch schedule, md5-MinHash estimate audit,
LSH band tuning, landmark stress centrality, Kneser-Ney / QL-Dirichlet
LM scoring, Viterbi segmentation, and the negative-sampling
distribution. (HLL/TWAP live in test_sketches.py; the streaming
sessionizer and rate limiter in test_streaming_events.py.)"""

import math

from pyspark.sql import functions as F

from vivace_graph_v3_spark.pipeline.dedup import (
    lsh_band_tuning, minhash_estimate_audit, minhash_signatures_md5)
from vivace_graph_v3_spark.pipeline.text import (
    _isqrt_col, epoch_schedule, temperature_mix_weights)


def _ppm(num: int, den: int) -> int:
    return num * 1000000 // den


class TestIsqrt:
    def test_exact_on_boundaries(self, spark):
        # perfect squares and their neighbours are exactly where a bare
        # floor(sqrt(double)) goes wrong by one
        vals = [2**63 - 1, 2**63 - 2]  # past the last perfect square
        for s in [0, 1, 2, 3, 10, 12345, 94906265, 3037000499]:
            for x in (s * s - 1, s * s, s * s + 1):
                if 0 <= x < 2**63:
                    vals.append(x)
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {r["x"]: r["s"] for r in
               df.select("x", _isqrt_col(F.col("x")).alias("s")).collect()}
        for v in vals:
            assert got[v] == math.isqrt(v), v


class TestTemperatureMix:
    def test_hand_weights(self, spark):
        # lang a: 100 tokens over 2 docs; lang b: 400 tokens over 1 doc
        docs = [(1, " ".join(["w"] * 60), "a"),
                (2, " ".join(["w"] * 40), "a"),
                (3, " ".join(["w"] * 400), "b")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        out = {r["group"]: r for r in temperature_mix_weights(df).collect()}
        assert out["a"]["n_docs"] == 2 and out["a"]["n_tokens"] == 100
        assert out["a"]["isqrt_tokens"] == 10
        assert out["b"]["isqrt_tokens"] == 20
        assert out["a"]["raw_share_ppm"] == _ppm(100, 500)
        # alpha=0.5 upsamples the low-resource lang: 10/30 vs 100/500
        assert out["a"]["weight_ppm"] == _ppm(10, 30)
        assert out["b"]["weight_ppm"] == _ppm(20, 30)
        assert out["a"]["weight_ppm"] > out["a"]["raw_share_ppm"]

    def test_weights_sum_to_about_one(self, spark):
        docs = [(i, " ".join(["w"] * (10 + 37 * (i % 7))), f"l{i % 4}")
                for i in range(40)]
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        rows = temperature_mix_weights(df).collect()
        total = sum(r["weight_ppm"] for r in rows)
        # floor-ppm: within |groups| of 1e6, never above
        assert 1000000 - len(rows) <= total <= 1000000


class TestEpochSchedule:
    def test_budget_allocation(self, spark):
        docs = [(1, " ".join(["w"] * 100), "web"),
                (2, " ".join(["w"] * 400), "books")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
        out = {r["group"]: r for r in epoch_schedule(
            df, budget_multiplier_milli=3000).collect()}
        # total 500 tokens -> budget 1500; isqrt 10 + 20
        w_web = _ppm(10, 30)
        alloc_web = 1500 * w_web // 1000000
        assert out["web"]["alloc_tokens"] == alloc_web
        assert out["web"]["epochs_milli"] == alloc_web * 1000 // 100
        # the small source is repeated ~5x: over the 4-epoch cap
        assert out["web"]["over_cap"]
        assert not out["books"]["over_cap"]


class TestMinhashAudit:
    def test_identical_docs_estimate_exactly_one(self, spark):
        text = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "totally different words here now")],
            ["doc_id", "text"])
        rows = minhash_estimate_audit(df, num_hashes=16).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["n_matches"] == 16
        assert r["est_ppm"] == 1000000 and r["exact_ppm"] == 1000000
        assert r["err_ppm"] == 0

    def test_signature_shape(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "")], ["doc_id", "text"])
        sigs = minhash_signatures_md5(df, num_hashes=8).collect()
        assert len(sigs) == 1  # empty doc dropped
        assert len(sigs[0]["sig"]) == 8
        assert sigs[0]["n_shingles"] == 3

    def test_estimator_error_bounded(self, spark):
        # overlapping docs: est within a few sigma of exact
        base = ["tok%d" % i for i in range(30)]
        docs = [(1, " ".join(base)), (2, " ".join(base[:20] + ["x", "y"]))]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        rows = minhash_estimate_audit(df, num_hashes=16,
                                      min_exact_ppm=100000).collect()
        assert len(rows) == 1
        r = rows[0]
        # stderr = sqrt(J(1-J)/16) <= 0.125; 4 sigma = 500000 ppm
        assert r["err_ppm"] <= 500000


class TestBandTuning:
    def test_monotone_recall_and_consistency(self, spark):
        text = " ".join("w%d" % i for i in range(40))
        docs = [(1, text),
                (2, " ".join("w%d" % i for i in range(38)) + " a b"),
                (3, " ".join("v%d" % i for i in range(40))),
                (4, text + " extra")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        rows = {r["bands"]: r for r in lsh_band_tuning(df).collect()}
        assert set(rows) == {16, 8, 4, 2}
        for b, r in rows.items():
            assert r["rows_per_band"] == 16 // b
            assert r["n_caught"] <= r["n_candidates"]
            assert r["n_caught"] <= r["n_true_total"]
        # more bands never catches fewer candidates (a band split of a
        # matching wider band still matches)
        assert rows[16]["n_candidates"] >= rows[8]["n_candidates"]
        assert rows[8]["n_candidates"] >= rows[4]["n_candidates"]
        assert rows[4]["n_candidates"] >= rows[2]["n_candidates"]
        assert rows[16]["n_caught"] >= rows[2]["n_caught"]


def _graph(spark, vertices, edges):
    from vivace_graph_v3_spark.graph import GraphStore
    from vivace_graph_v3_spark.schema import SchemaRegistry

    reg = SchemaRegistry()
    reg.def_vertex("node", {})
    reg.def_edge("link")
    g = GraphStore(spark, reg, name="alg", has_tombstones=False)
    g.add_vertices("node", spark.createDataFrame(
        [(v, "node", False, 0, 0) for v in vertices],
        "id string, type string, deleted boolean, revision long, "
        "commit_epoch long"))
    g.add_edges("link", spark.createDataFrame(
        [(f"e{i}", "link", False, 0, 0, s, d, 1.0)
         for i, (s, d) in enumerate(edges)],
        "id string, type string, deleted boolean, revision long, "
        "commit_epoch long, src string, dst string, weight double"))
    return g


class TestLandmarkStress:
    def test_path_graph_counts(self, spark):
        # path a - b - c - d: from landmark a, sigma = 1 everywhere,
        # stress(b) = paths through b = a->c, a->d = 2; stress(c) = 1
        from vivace_graph_v3_spark.operators.graph_algorithms import (
            landmark_stress)

        g = _graph(spark, ["a", "b", "c", "d"],
                   [("a", "b"), ("b", "c"), ("c", "d")])
        out = {(r["lm"], r["dist"]): r
               for r in landmark_stress(g, ["a"], max_depth=6).collect()}
        assert out[("a", 0)]["sum_stress"] == 0
        assert out[("a", 1)]["sum_stress"] == 2   # b
        assert out[("a", 2)]["sum_stress"] == 1   # c
        assert out[("a", 3)]["sum_stress"] == 0   # d (endpoint)
        assert all(r["sum_sigma"] == 1 for r in out.values())

    def test_diamond_multiplicity(self, spark):
        # diamond a->{b,c}->d->e: sigma(d) = 2, stress(d) = 2 (a->e via
        # b and via c), stress(b) = stress(c) = sigma*rho-1 paths = 2
        # each (to d and to e)
        from vivace_graph_v3_spark.operators.graph_algorithms import (
            landmark_stress)

        edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                 ("d", "e")]
        g = _graph(spark, ["a", "b", "c", "d", "e"], edges)
        out = {r["dist"]: r
               for r in landmark_stress(g, ["a"], max_depth=6).collect()}
        assert out[2]["sum_sigma"] == 2            # d
        assert out[2]["sum_stress"] == 2 * 1       # a->e x2 through d
        assert out[1]["sum_stress"] == 4           # b and c: 2 each
        assert out[3]["sum_sigma"] == 2            # e reached twice


class TestKneserNey:
    def test_matches_pure_python(self, spark):
        import math
        from collections import Counter

        from vivace_graph_v3_spark.pipeline.text import kneser_ney_logprob

        docs = [(1, "the cat sat on the mat"),
                (2, "the dog sat on the log"),
                (3, "a cat and a dog")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["id"]: r for r in kneser_ney_logprob(df).collect()}

        bigrams = {}
        for did, text in docs:
            ws = text.split()
            bigrams[did] = list(zip(ws, ws[1:]))
        bc = Counter(b for bs in bigrams.values() for b in bs)
        c1 = Counter(); nf = Counter(); nb = Counter()
        for (w1, w2), c in bc.items():
            c1[w1] += c; nf[w1] += 1; nb[w2] += 1
        nt = len(bc)
        for did, bs in bigrams.items():
            terms = []
            for w1, w2 in bs:
                p = ((bc[(w1, w2)] - 0.75) / c1[w1]
                     + ((0.75 * nf[w1]) / c1[w1]) * (nb[w2] / nt))
                terms.append(-math.log2(p))
            exp = round(sum(terms) / len(bs), 6)
            assert got[did]["n_bigrams"] == len(bs)
            assert abs(got[did]["avg_neg_logp2_kn"] - exp) < 1e-6, did

    def test_continuation_beats_raw_frequency(self, spark):
        # "sf" is frequent but only ever follows "in" (one continuation
        # context); "dog" follows many contexts. KN gives the backoff
        # mass to diverse-context words, so p(sf | unseen-ish context)
        # must NOT inflate with raw frequency. We check the corpus-level
        # signature: nb (continuation count) drives the interpolated
        # term, not c(w2).
        from vivace_graph_v3_spark.pipeline.text import kneser_ney_logprob

        docs = [(1, "in sf in sf in sf in sf"),
                (2, "a dog b dog c dog d dog"),
                (3, "x dog y sf")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r["id"]: r["avg_neg_logp2_kn"]
               for r in kneser_ney_logprob(df).collect()}
        # doc 3's "y sf" bigram is unseen-context-heavy: its surprise
        # should exceed doc 1's templated repetition
        assert out[3] > out[1]


class TestViterbiSegmentation:
    def test_dp_picks_cheaper_split(self, spark):
        from vivace_graph_v3_spark.pipeline.tokenizer import (
            viterbi_segment_stats, viterbi_vocab)

        docs = [(1, "the cat the hat", "en"), (2, "thethethe", "en"),
                (3, "ab", "de")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        vocab = {r["piece"]: r["cost_milli"]
                 for r in viterbi_vocab(df).collect()}
        out = {r["group"]: r for r in viterbi_segment_stats(df).collect()}
        # 'ab' as one bigram piece must beat 'a'+'b' iff its cost is lower
        assert vocab["ab"] <= vocab["a"] + vocab["b"]
        de = out["de"]
        assert de["n_tokens"] == 1 and de["total_pieces"] == 1
        assert de["total_cost_milli"] == vocab["ab"]

    def test_matches_pure_python_dp(self, spark):
        from vivace_graph_v3_spark.pipeline.tokenizer import (
            viterbi_segment_stats, viterbi_vocab)

        docs = [(1, "banana bandana cabana", "en"),
                (2, "nab ban anna", "en")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        vocab = {r["piece"]: r["cost_milli"]
                 for r in viterbi_vocab(df).collect()}

        def seg(w):
            best = [(0, 0)] + [(None, None)] * len(w)
            for i in range(1, len(w) + 1):
                cands = []
                p1 = w[i - 1]
                if p1 in vocab and best[i - 1][0] is not None:
                    cands.append((best[i - 1][0] + vocab[p1],
                                  best[i - 1][1] + 1))
                if i >= 2:
                    p2 = w[i - 2:i]
                    if p2 in vocab and best[i - 2][0] is not None:
                        cands.append((best[i - 2][0] + vocab[p2],
                                      best[i - 2][1] + 1))
                best[i] = min(cands)
            return best[len(w)]

        words = {}
        for _d, text in [(d, t) for d, t, _l in docs]:
            for w in text.split():
                words[w] = words.get(w, 0) + 1
        exp_cost = sum(c * seg(w)[0] for w, c in words.items())
        exp_np = sum(c * seg(w)[1] for w, c in words.items())
        r = viterbi_segment_stats(df).collect()[0]
        assert r["total_cost_milli"] == exp_cost
        assert r["total_pieces"] == exp_np

    def test_word_at_exact_length_cap_and_beyond(self, spark):
        """Boundary of the vectorized DP's fixed-width char matrix: a word
        of exactly max_word_len chars occupies every lane (no NUL padding),
        and words past the cap stay excluded from every statistic."""
        from vivace_graph_v3_spark.pipeline.tokenizer import (
            viterbi_segment_stats, viterbi_vocab)

        w16 = "abcdefghijklmnop"          # 16 chars == default cap
        w17 = "abcdefghijklmnopq"         # 17 chars: must be ignored
        docs = [(1, f"{w16} {w17}", "en")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        vocab = {r["piece"]: r["cost_milli"]
                 for r in viterbi_vocab(df).collect()}
        # every char unique and every bigram in the top-200 vocab: the
        # reference DP over w16 is well-defined from the vocab dict
        def seg(w):
            best = [(0, 0)] + [(None, None)] * len(w)
            for i in range(1, len(w) + 1):
                cands = []
                if w[i - 1] in vocab:
                    cands.append((best[i - 1][0] + vocab[w[i - 1]],
                                  best[i - 1][1] + 1))
                if i >= 2 and w[i - 2:i] in vocab:
                    cands.append((best[i - 2][0] + vocab[w[i - 2:i]],
                                  best[i - 2][1] + 1))
                best[i] = min(cands)
            return best[len(w)]

        rows = viterbi_segment_stats(df).collect()
        assert len(rows) == 1
        r = rows[0]
        cost, np_ = seg(w16)
        assert r["n_tokens"] == 1                  # w17 excluded
        assert r["n_distinct_words"] == 1
        assert r["total_pieces"] == np_
        assert r["total_cost_milli"] == cost


class TestQLDirichlet:
    def test_matches_pure_python(self, spark):
        import math
        from collections import Counter

        from vivace_graph_v3_spark.pipeline.text import ql_dirichlet_topk

        docs = [(1, "spark runs fast spark wins"),
                (2, "window merge window"),
                (3, "nothing relevant here"),
                (4, "spark merge window spark")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        q = ["spark", "merge", "window"]
        got = {r["id"]: r for r in ql_dirichlet_topk(df, q, k=10).collect()}

        all_toks = [w for _i, t in docs for w in t.split()]
        n = len(all_toks)
        cf = Counter(w for w in all_toks if w in q)
        exp = {}
        for did, t in docs:
            ws = t.split()
            tfs = Counter(w for w in ws if w in q)
            if not tfs:
                continue  # not a candidate
            s = sum(math.log2((tfs.get(w, 0) + 2000.0 * (cf[w] / n))
                              / (len(ws) + 2000.0)) for w in q if cf[w])
            exp[did] = round(s, 6)
        assert set(got) == set(exp)
        for did, s in exp.items():
            assert abs(got[did]["score"] - s) < 1e-6
        # ranks follow the exact scores (desc, id tiebreak)
        order = sorted(exp, key=lambda d: (-exp[d], d))
        for r, did in enumerate(order, start=1):
            assert got[did]["rank"] == r


class TestNegativeSampling:
    def test_exact_three_quarter_power(self, spark):
        import math

        from vivace_graph_v3_spark.pipeline.text import (
            negative_sampling_distribution)

        docs = [(1, " ".join(["a"] * 16 + ["b"] * 81 + ["c"] * 2))]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r["w"]: r for r in
               negative_sampling_distribution(df, top_k=10).collect()}
        # f^(3/4) exactly: 16 -> 8, 81 -> 27, 2 -> floor(2^0.75) = 1
        assert out["a"]["f_pow75"] == 8
        assert out["b"]["f_pow75"] == 27
        assert out["c"]["f_pow75"] == 1
        tot = 8 + 27 + 1
        for w in ("a", "b", "c"):
            assert out[w]["weight_ppm"] == out[w]["f_pow75"] * 1000000 // tot
        # the 3/4 power flattens the head: b's weight share is below its
        # raw frequency share
        assert out["b"]["weight_ppm"] < 81 * 1000000 // (16 + 81 + 2)
        # nested isqrt = exact integer 4th root on arbitrary f
        for f in (1, 2, 3, 15, 16, 17, 80, 81, 82, 624, 625, 626):
            k = math.isqrt(math.isqrt(f * f * f))
            assert k ** 4 <= f ** 3 < (k + 1) ** 4


class TestShapleyAttribution:
    def test_matches_exhaustive_permutations(self, spark):
        import itertools
        import math

        from vivace_graph_v3_spark.operators.product_analytics import (
            shapley_attribution)

        # users: (touched channels, converted)
        journeys = [(["a"], True), (["a", "b"], True), (["b"], False),
                    (["a", "b", "c"], True), (["c"], True), ([], True)]
        rows = []
        for u, (chs, conv) in enumerate(journeys):
            for c in chs:
                rows.append((u, c))
            if conv:
                rows.append((u, "purchase"))
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        got = {r["channel"]: r for r in shapley_attribution(
            df, channels=["a", "b", "c"]).collect()}

        chans = ["a", "b", "c"]
        masks = []
        for chs, conv in journeys:
            if conv:
                masks.append(frozenset(chs))

        def v(t: frozenset) -> int:
            return sum(1 for m in masks if m <= t)

        # brute-force Shapley over all 3! permutations
        phi = {c: 0 for c in chans}
        for perm in itertools.permutations(chans):
            seen: set = set()
            for c in perm:
                phi[c] += v(frozenset(seen | {c})) - v(frozenset(seen))
                seen.add(c)
        # phi above is already scaled by n! (sum over all permutations)
        for c in chans:
            assert got[c]["phi_scaled"] == phi[c], c
        assert sum(r["phi_scaled"] for r in got.values()) == \
            math.factorial(3) * (v(frozenset(chans)) - v(frozenset()))
        assert got["a"]["v_full"] == len(masks)


class TestVOptimalHistogram:
    def test_matches_brute_force_dp(self, spark):
        import itertools

        from vivace_graph_v3_spark.operators.profile import (
            v_optimal_histogram)

        # values engineered so v-optimal differs from equi-width: two
        # tight clusters and one spread tail
        vals = ([10.0] * 20 + [10.2] * 20 + [50.0] * 30 +
                [90.0, 91.0, 95.0, 99.0, 99.9])
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {r["bucket"]: r for r in
               v_optimal_histogram(df, "x", buckets=3,
                                   grid_cells=12).collect()}

        # brute-force: assign cents to the same 12-cell pre-grid, try
        # every 2-split of the populated cells
        cents = [round(v * 100) for v in vals]
        lo, hi = min(cents), max(cents)
        cells = {}
        for c in cents:
            cell = min((c - lo) * 12 // max(hi - lo + 1, 1), 11)
            cells.setdefault(cell, []).append(c)
        order = sorted(cells)

        def sse(group):
            xs = [x for cell in group for x in cells[cell]]
            n = len(xs)
            return sum(x * x for x in xs) - sum(xs) ** 2 / n

        best = None
        g = len(order)
        for a, b in itertools.combinations(range(1, g), 2):
            parts = [order[:a], order[a:b], order[b:]]
            tot = sum(sse(p) for p in parts)
            if best is None or tot < best[0]:
                best = (tot, parts)
        assert len(got) == 3
        spark_total = sum(r["sse"] for r in got.values())
        assert abs(spark_total - best[0]) < 1e-6
        for k, part in enumerate(best[1]):
            assert got[k]["n"] == sum(len(cells[c]) for c in part)


class TestKnnShapley:
    def test_matches_pure_python_closed_form(self, spark):
        import hashlib
        import struct
        from decimal import Decimal

        from vivace_graph_v3_spark.pipeline.similarity import (
            knn_shapley_values)

        import random
        random.seed(11)
        data = [(i, [struct.unpack("f", struct.pack("f", random.uniform(-1, 1)))[0]
                     for _ in range(4)], i % 2) for i in range(30)]
        df = spark.createDataFrame(
            [(i, v, l) for i, v, l in data],
            "vec_id long, embedding array<float>, label int")
        got = {r["vec_id"]: r["total_value"] for r in knn_shapley_values(
            df, k=3, n_test=3, top_out=30).collect()}

        def md5h64(s: str) -> int:
            h = hashlib.md5(s.encode()).hexdigest()
            hi = int(h[:8], 16)
            if hi >= 2**31:
                hi -= 2**32
            return hi * 2**32 + int(h[8:16], 16)

        order = sorted(data, key=lambda t: (md5h64(str(t[0])), t[0]))
        test = order[:3]
        tids = {t[0] for t in test}
        train = [t for t in data if t[0] not in tids]
        K = 3
        vals = {t[0]: Decimal(0) for t in train}
        for _tid, tv, ty in test:
            byd = sorted((sum((a - b) * (a - b) for a, b in zip(v, tv)),
                          i, y) for i, v, y in train)
            n = len(byd)
            a = [1 if y == ty else 0 for _d, _i, y in byd]
            terms = [Decimal(0)] * n
            terms[n - 1] = Decimal(a[n - 1] / n).quantize(Decimal("1e-12"))
            for i in range(1, n):
                d = (a[i - 1] - a[i]) / K * (min(K, i) / i)
                terms[i - 1] = Decimal(d).quantize(Decimal("1e-12"))
            suf = Decimal(0)
            for i in range(n, 0, -1):
                suf += terms[i - 1]
                vals[byd[i - 1][1]] += suf
        for i, v in vals.items():
            assert abs(got[i] - float(round(v, 6))) < 2e-6, i

    def test_efficiency_axiom(self, spark):
        # sum of all values over one test point = the classifier's value
        # of the full set = P(correct) = a_(1..K) mean... for KNN-Shapley
        # the sum telescopes to sum(min(K,i)/i terms); just assert the
        # all-same-label degenerate case: every point has value 1/N per
        # test point
        from vivace_graph_v3_spark.pipeline.similarity import (
            knn_shapley_values)

        data = [(i, [float(i), 0.0], 1) for i in range(10)]
        df = spark.createDataFrame(
            data, "vec_id long, embedding array<float>, label int")
        rows = knn_shapley_values(df, k=3, n_test=2, top_out=10).collect()
        # 8 train points, all same label as any test point: s_i = 1/8
        # per test point -> total 0.25 each
        assert len(rows) == 8
        for r in rows:
            assert abs(r["total_value"] - 0.25) < 2e-6


class TestFacilityLocation:
    def test_greedy_matches_brute_force(self, spark):
        import itertools
        import struct
        from decimal import Decimal

        from vivace_graph_v3_spark.pipeline.similarity import (
            facility_location_select)

        import random
        random.seed(3)
        data = [(i, [struct.unpack("f", struct.pack("f",
                                                    random.uniform(-1, 1)))[0]
                     for _ in range(3)]) for i in range(12)]
        df = spark.createDataFrame(
            [(i, v, 0) for i, v in data],
            "vec_id long, embedding array<float>, label int")
        rows = facility_location_select(df, k=3, ground=12).collect()
        got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["round"])]

        import math
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a))
                        * math.sqrt(sum(x * x for x in b)))
        sims = {(i, j): cos(v, w) for i, v in data for j, w in data}
        # greedy reference
        best = {j: 0.0 for j, _ in data}
        picked = []
        for _ in range(3):
            cand_gain = {}
            for i, _v in data:
                if i in picked:
                    continue
                gain = sum(Decimal(max(sims[(i, j)] - best[j], 0.0))
                           .quantize(Decimal("1e-12"))
                           for j, _ in data)
                cand_gain[i] = gain
            pick = min(cand_gain, key=lambda i: (-cand_gain[i], i))
            picked.append(pick)
            for j, _ in data:
                best[j] = max(best[j], sims[(pick, j)])
        assert got == picked
        # gains monotone non-increasing (submodularity)
        gains = [r["gain"] for r in sorted(rows, key=lambda r: r["round"])]
        assert all(gains[i] >= gains[i + 1] - 1e-9
                   for i in range(len(gains) - 1))


class TestFellegiSunter:
    def test_hand_counts(self, spark):
        from vivace_graph_v3_spark.operators.entity import (
            fellegi_sunter_weights)

        # block "bk": 4 records -> 6 pairs; names: two near-identical
        # (match), rest distinct. field f agrees on exactly the match
        # pair and one non-match pair.
        rows = [(1, "alpha one", "bk", "x"), (2, "alpha oni", "bk", "x"),
                (3, "totally different", "bk", "y"),
                (4, "another thing!!", "bk", "x")]
        df = spark.createDataFrame(rows, "k long, nm string, blk string,"
                                         " f string")
        out = {r["field"]: r for r in fellegi_sunter_weights(
            df, key_col="k", name_col="nm", block_col="blk",
            fields=["f"]).collect()}
        r = out["f"]
        assert r["n_match"] == 1          # (1,2) lev = 1
        assert r["n_unmatch"] == 5
        assert r["n_match_agree"] == 1    # both 'x'
        assert r["n_unmatch_agree"] == 2  # (1,4), (2,4) both 'x'
        assert r["m_ppm"] == 1000000
        assert r["u_ppm"] == 2 * 1000000 // 5
        import math
        exp_w = round(math.log2((1 / 1) / (2 / 5)), 6)
        assert abs(r["weight_bits"] - exp_w) < 1e-9

    def test_zero_counts_yield_null_weight(self, spark):
        from vivace_graph_v3_spark.operators.entity import (
            fellegi_sunter_weights)

        rows = [(1, "aaaa", "bk", "p"), (2, "zzzz", "bk", "q")]
        df = spark.createDataFrame(rows, "k long, nm string, blk string,"
                                         " f string")
        r = fellegi_sunter_weights(df, key_col="k", name_col="nm",
                                   block_col="blk",
                                   fields=["f"]).collect()[0]
        assert r["n_match"] == 0 and r["weight_bits"] is None
