"""Unit tests for operators/stats_inference.py — hand-computable
fixtures for Kaplan–Meier, one-way ANOVA, Mann–Whitney U, and the
deterministic ticket-lottery weighted sampler."""

import hashlib
import math

import pytest

from vivace_graph_v3_spark.operators.stats_inference import (
    anova_oneway, kaplan_meier, kendall_tau_b, kruskal_wallis,
    mann_whitney_u, spearman_rho, weighted_ticket_sample,
    wilcoxon_signed_rank)


class TestKaplanMeier:
    def test_hand_life_table(self, spark):
        # subjects: 1(event) 2(censor) 3(event) 3(event) 4(censor) 5(event)
        rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (5, 1)]
        df = spark.createDataFrame(rows, ["dur", "ev"])
        out = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
        assert [out[t]["n_risk"] for t in (1, 2, 3, 4, 5)] == [6, 5, 4, 2, 1]
        assert math.isclose(out[1]["survival"], 5 / 6)
        assert math.isclose(out[2]["survival"], 5 / 6)  # censor: no drop
        assert math.isclose(out[3]["survival"], 5 / 6 * 2 / 4)
        assert math.isclose(out[4]["survival"], 5 / 12)
        assert out[5]["survival"] == 0.0
        assert out[3]["n_events"] == 2 and out[2]["n_censored"] == 1

    def test_monotone_non_increasing(self, spark):
        rows = [(t % 7 + 1, t % 3 != 0) for t in range(200)]
        df = spark.createDataFrame(
            [(t, int(e)) for t, e in rows], ["dur", "ev"])
        out = sorted(kaplan_meier(df, "dur", "ev").collect(),
                     key=lambda r: r["t"])
        surv = [r["survival"] for r in out]
        assert all(0.0 <= s <= 1.0 for s in surv)
        assert all(a >= b for a, b in zip(surv, surv[1:]))


class TestAnova:
    def test_hand_two_groups(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)],
            ["g", "v"])
        out = {r["g"]: r for r in anova_oneway(df, "g", "v").collect()}
        assert out["a"]["n"] == 3 and out["a"]["s"] == 6
        assert math.isclose(out["a"]["mean"], 2.0)
        r = out["b"]
        # SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5; SSW = 2 + 2 = 4
        assert math.isclose(r["ssb"], 13.5)
        assert math.isclose(r["ssw"], 4.0)
        assert r["dof_between"] == 1 and r["dof_within"] == 4
        assert math.isclose(r["f_stat"], 13.5 / 1.0)

    def test_equal_groups_zero_f(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 3), ("b", 1), ("b", 3)], ["g", "v"])
        r = anova_oneway(df, "g", "v").collect()[0]
        assert math.isclose(r["ssb"], 0.0, abs_tol=1e-12)
        assert math.isclose(r["f_stat"], 0.0, abs_tol=1e-12)


class TestMannWhitney:
    def test_hand_with_ties(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4)],
            ["g", "v"])
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        # midranks: 1->1, 2->2.5, 3->4.5, 4->6; R_a = 8 -> U_a = 2
        assert r["n_a"] == 3 and r["n_b"] == 3
        assert r["u2_a"] == 4 and r["u2_b"] == 14
        var = (9 / 12) * (7 - 12 / 30)
        assert math.isclose(r["z"], (4 - 9) / (2 * math.sqrt(var)))

    def test_identical_groups_symmetric(self, spark):
        rows = [("a", v) for v in (1, 2, 3, 4)] + \
               [("b", v) for v in (1, 2, 3, 4)]
        df = spark.createDataFrame(rows, ["g", "v"])
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r["u2_a"] == r["u2_b"]  # 2U = n_a*n_b each
        assert math.isclose(r["z"], 0.0, abs_tol=1e-12)


def _md5_64(s: str) -> int:
    v = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
    return v - (1 << 64) if v >= (1 << 63) else v


class TestTicketSample:
    def test_matches_python_reference(self, spark):
        rows = [(f"k{i}", 1 + i % 4) for i in range(40)]
        df = spark.createDataFrame(rows, ["key", "w"])
        got = [(r["key"], r["priority"])
               for r in weighted_ticket_sample(df, "key", "w", 10).collect()]
        ref = sorted(
            ((k, min(_md5_64(f"{k}#{j}") for j in range(w)))
             for k, w in rows),
            key=lambda kv: (kv[1], kv[0]))[:10]
        assert got == ref

    def test_deterministic_and_weight_monotone(self, spark):
        rows = [(f"d{i}", 1 if i < 500 else 8) for i in range(1000)]
        df = spark.createDataFrame(rows, ["key", "w"])
        s1 = weighted_ticket_sample(df, "key", "w", 100).collect()
        s2 = weighted_ticket_sample(df, "key", "w", 100).collect()
        assert [r["key"] for r in s1] == [r["key"] for r in s2]
        heavy = sum(1 for r in s1 if r["weight"] == 8)
        # 8 tickets vs 1: heavy rows should dominate the winners
        assert heavy > 70


class TestKendallTauB:
    def test_perfect_concordance(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(1, 6)],
                                   ["x", "y"])
        r = kendall_tau_b(df, "x", "y").collect()[0]
        assert r["n"] == 5 and r["concordant"] == 10
        assert r["discordant"] == 0
        assert r["ties_x"] == 0 and r["ties_y"] == 0
        assert math.isclose(r["tau_b"], 1.0)

    def test_perfect_discordance(self, spark):
        df = spark.createDataFrame([(i, 10 - i) for i in range(1, 6)],
                                   ["x", "y"])
        r = kendall_tau_b(df, "x", "y").collect()[0]
        assert r["concordant"] == 0 and r["discordant"] == 10
        assert math.isclose(r["tau_b"], -1.0)

    def test_vs_bruteforce_with_ties(self, spark):
        import itertools
        import random
        rnd = random.Random(7)
        data = [(rnd.randint(0, 5), rnd.randint(0, 3)) for _ in range(80)]
        c = d = tx = ty = 0
        for (x1, y1), (x2, y2) in itertools.combinations(data, 2):
            if x1 == x2:
                tx += 1
            if y1 == y2:
                ty += 1
            if x1 != x2 and y1 != y2:
                if (x1 - x2) * (y1 - y2) > 0:
                    c += 1
                else:
                    d += 1
        n0 = len(data) * (len(data) - 1) // 2
        df = spark.createDataFrame(data, ["x", "y"])
        r = kendall_tau_b(df, "x", "y").collect()[0]
        assert (r["concordant"], r["discordant"]) == (c, d)
        assert (r["ties_x"], r["ties_y"]) == (tx, ty)
        assert math.isclose(
            r["tau_b"],
            (c - d) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty)),
            rel_tol=1e-12)


def _kw_brute(pairs):
    """Pure-Python Kruskal-Wallis with midranks + tie correction."""
    from collections import Counter
    cnt = Counter(v for _, v in pairs)
    ranks, cum = {}, 0
    for v in sorted(cnt):
        ranks[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    n = len(pairs)
    groups = {}
    for g, v in pairs:
        groups.setdefault(g, []).append(ranks[v])
    h = (12.0 / (n * (n + 1))
         * sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
         - 3 * (n + 1))
    tie = sum(c ** 3 - c for c in cnt.values())
    return h, h / (1 - tie / (n ** 3 - n)), len(groups) - 1


class TestKruskalWallis:
    def test_vs_bruteforce(self, spark):
        import random
        rnd = random.Random(11)
        pairs = [(rnd.choice("abc"), rnd.randint(1, 8))
                 for _ in range(120)]
        df = spark.createDataFrame(pairs, ["g", "v"])
        rows = kruskal_wallis(df, "g", "v").collect()
        h, h_tc, dof = _kw_brute(pairs)
        assert len(rows) == 3
        assert all(r["dof"] == dof for r in rows)
        assert math.isclose(rows[0]["h"], h, rel_tol=1e-9)
        assert math.isclose(rows[0]["h_tie_corrected"], h_tc, rel_tol=1e-9)
        # doubled-rank sums are exact integers: 2 * midrank sum per group
        from collections import Counter
        cnt = Counter(v for _, v in pairs)
        ranks, cum = {}, 0
        for v in sorted(cnt):
            ranks[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        for r in rows:
            want = round(2 * sum(ranks[v] for g, v in pairs if g == r["g"]))
            assert r["rank2_sum"] == want

    def test_no_group_effect_small_h(self, spark):
        rows = [("a", v) for v in range(1, 11)] + \
               [("b", v) for v in range(1, 11)]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = kruskal_wallis(df, "g", "v").collect()
        assert math.isclose(out[0]["h"], 0.0, abs_tol=1e-9)


def _spearman_brute(pairs):
    """Pearson correlation of midranks, pure Python."""
    from collections import Counter

    def midranks(vals):
        cnt = Counter(vals)
        r, cum = {}, 0
        for v in sorted(cnt):
            r[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        return r

    rx = midranks([x for x, _ in pairs])
    ry = midranks([y for _, y in pairs])
    xs = [rx[x] for x, _ in pairs]
    ys = [ry[y] for _, y in pairs]
    n = len(pairs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    dx = sum((a - mx) ** 2 for a in xs)
    dy = sum((b - my) ** 2 for b in ys)
    return num / math.sqrt(dx * dy)


class TestSpearmanRho:
    def test_monotone_is_one(self, spark):
        df = spark.createDataFrame([(i, i * i) for i in range(1, 9)],
                                   ["x", "y"])
        r = spearman_rho(df, "x", "y").collect()[0]
        assert math.isclose(r["rho"], 1.0)
        assert r["s_xy"] == r["s_xx"] == r["s_yy"]

    def test_vs_bruteforce_with_ties(self, spark):
        import random
        rnd = random.Random(23)
        data = [(rnd.randint(0, 6), rnd.randint(0, 4)) for _ in range(150)]
        df = spark.createDataFrame(data, ["x", "y"])
        r = spearman_rho(df, "x", "y").collect()[0]
        assert r["n"] == 150
        assert math.isclose(r["rho"], _spearman_brute(data), rel_tol=1e-9)
        # doubled centered moments are 4x the midrank moments
        from collections import Counter
        cnt = Counter(x for x, _ in data)
        rk, cum = {}, 0
        for v in sorted(cnt):
            rk[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        mean = (150 + 1) / 2.0
        want_sxx = round(4 * sum((rk[x] - mean) ** 2 for x, _ in data))
        assert r["s_xx"] == want_sxx


def _wilcoxon_brute(pairs):
    """Pure-Python signed-rank with midranks + tie correction."""
    from collections import Counter
    ds = [x - y for x, y in pairs if x != y]
    n = len(ds)
    cnt = Counter(abs(d) for d in ds)
    ranks, cum = {}, 0
    for a in sorted(cnt):
        ranks[a] = cum + (cnt[a] + 1) / 2.0
        cum += cnt[a]
    wplus = sum(ranks[abs(d)] for d in ds if d > 0)
    ties = sum(c ** 3 - c for c in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    z = (wplus - n * (n + 1) / 4.0) / math.sqrt(var)
    return n, round(2 * wplus), z


class TestWilcoxonSignedRank:
    def test_vs_bruteforce_with_ties_and_zeros(self, spark):
        import random
        rnd = random.Random(17)
        pairs = [(rnd.randint(0, 8), rnd.randint(0, 8))
                 for _ in range(100)]
        df = spark.createDataFrame(pairs, ["x", "y"])
        r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
        n, w2, z = _wilcoxon_brute(pairs)
        assert (r["n"], r["w2_plus"]) == (n, w2)
        assert math.isclose(r["z"], z, rel_tol=1e-9)

    def test_symmetric_pairs_z_zero(self, spark):
        # d and -d equally present -> W+ at its mean -> z = 0
        pairs = [(5, 1), (1, 5), (7, 2), (2, 7)]
        df = spark.createDataFrame(pairs, ["x", "y"])
        r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
        assert r["n"] == 4
        assert math.isclose(r["z"], 0.0, abs_tol=1e-12)


class TestIpfRaking:
    def test_marginals_converge_to_uniform(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            ipf_raking)
        rows = ([("s1", "en")] * 8 + [("s1", "fr")] * 2
                + [("s2", "en")] * 3 + [("s2", "fr")] * 7)
        df = spark.createDataFrame(rows, ["src", "lng"])
        out = ipf_raking(df, "src", "lng", iterations=8).collect()
        total = sum(r["weight"] for r in out)
        by_r, by_c = {}, {}
        for r in out:
            by_r[r["src"]] = by_r.get(r["src"], 0) + r["weight"]
            by_c[r["lng"]] = by_c.get(r["lng"], 0) + r["weight"]
        assert total == pytest.approx(20.0, abs=1e-3)
        for v in by_r.values():
            assert v == pytest.approx(10.0, abs=1e-2)
        for v in by_c.values():
            assert v == pytest.approx(10.0, abs=1e-2)
        # mass is preserved per cell direction: all weights positive
        assert all(r["weight"] > 0 for r in out)

    def test_already_uniform_is_fixpoint(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            ipf_raking)
        rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
        df = spark.createDataFrame(rows, ["src", "lng"])
        out = ipf_raking(df, "src", "lng", iterations=3).collect()
        assert all(r["weight"] == 1.0 for r in out)


class TestMantelHaenszel:
    def test_vs_hand_computation(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            mantel_haenszel_or)
        # stratum 1: a=4 b=1 c=2 d=3 (n=10); stratum 2: a=2 b=3 c=1 d=4
        rows = ([("s1", True, True)] * 4 + [("s1", True, False)]
                + [("s1", False, True)] * 2 + [("s1", False, False)] * 3
                + [("s2", True, True)] * 2 + [("s2", True, False)] * 3
                + [("s2", False, True)] + [("s2", False, False)] * 4)
        df = spark.createDataFrame(rows, ["st", "e", "o"])
        out = {r["stratum"]: r for r in mantel_haenszel_or(
            df, stratum_col="st", exposed_col="e",
            outcome_col="o").collect()}
        assert (out["s1"]["a"], out["s1"]["b"],
                out["s1"]["c"], out["s1"]["d"]) == (4, 1, 2, 3)
        want = (4 * 3 / 10 + 2 * 4 / 10) / (1 * 2 / 10 + 3 * 1 / 10)
        assert out["s1"]["or_mh"] == out["s2"]["or_mh"] == round(want, 6)

    def test_zero_denominator_guarded(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            mantel_haenszel_or)
        rows = [("s1", True, True), ("s1", False, False)]
        df = spark.createDataFrame(rows, ["st", "e", "o"])
        out = mantel_haenszel_or(df, stratum_col="st", exposed_col="e",
                                 outcome_col="o").collect()
        assert out[0]["or_mh"] == 0.0  # b*c = 0 everywhere -> guarded


class TestCronbachAlpha:
    def test_vs_numpy_reference(self, spark):
        import numpy as np
        from vivace_graph_v3_spark.operators.stats_inference import (
            cronbach_alpha)
        rng = np.random.RandomState(9)
        base = rng.randint(0, 10, 50)
        items = np.stack([base + rng.randint(0, 3, 50)
                          for _ in range(4)], axis=1)
        rows = [tuple(int(v) for v in r) for r in items]
        df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
        r = cronbach_alpha(df, ["a", "b", "c", "d"]).collect()[0]
        iv = items.var(axis=0).sum()
        tv = items.sum(axis=1).var()
        want = 4 / 3 * (1 - iv / tv)
        assert r["n"] == 50 and r["k"] == 4
        assert r["alpha"] == pytest.approx(want, abs=1e-6)
        assert r["alpha"] > 0.8  # items share the same latent trait

    def test_independent_items_low_alpha(self, spark):
        import numpy as np
        from vivace_graph_v3_spark.operators.stats_inference import (
            cronbach_alpha)
        rng = np.random.RandomState(4)
        rows = [tuple(int(v) for v in rng.randint(0, 10, 3))
                for _ in range(200)]
        df = spark.createDataFrame(rows, ["a", "b", "c"])
        r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
        assert abs(r["alpha"]) < 0.3

    def test_requires_two_items(self, spark):
        from vivace_graph_v3_spark.operators.stats_inference import (
            cronbach_alpha)
        df = spark.createDataFrame([(1,)], ["a"])
        with pytest.raises(ValueError):
            cronbach_alpha(df, ["a"])


def test_kish_ess_hand_values(spark):
    from vivace_graph_v3_spark.operators.stats_inference import kish_ess

    df = spark.createDataFrame(
        [("u", 1), ("u", 1), ("u", 1), ("u", 1), ("s", 3), ("s", 1)],
        "g string, w int")
    out = {r["g"]: r for r in kish_ess(df, "w", group_col="g").collect()}
    # uniform weights: ESS = n, deff = 1
    assert out["u"]["ess_milli"] == 4000 and out["u"]["deff_milli"] == 1000
    # skewed 3:1 -> ESS = 16/10 = 1.6, deff = 2*10/16 = 1.25
    assert out["s"]["ess_milli"] == 1600 and out["s"]["deff_milli"] == 1250


def test_bh_fdr_step_up_hand_example(spark):
    """Classic BH: rates .01 .02 .30 .40 .90 at q=0.1 over m=5 give
    thresholds .02i -> k=2, exactly the two smallest rejected."""
    from vivace_graph_v3_spark.operators.stats_inference import bh_fdr

    rows = [("a", 1, 100), ("b", 2, 100), ("c", 30, 100),
            ("d", 40, 100), ("e", 90, 100)]
    df = spark.createDataFrame(rows, "cell string, hits int, n int")
    out = {r["cell"]: r for r in
           bh_fdr(df, "hits", "n", ["cell"], q_milli=100).collect()}
    assert [out[c]["rejected"] for c in "abcde"] == \
        [True, True, False, False, False]
    assert [out[c]["rank"] for c in "abcde"] == [1, 2, 3, 4, 5]


def test_bh_fdr_step_up_not_step_down(spark):
    """The STEP-UP property: a later rank satisfying the inequality
    rescues every earlier rank, even ones that individually fail."""
    from vivace_graph_v3_spark.operators.stats_inference import bh_fdr

    # p = .019, .021, .022 at q=.1, m=3: thresholds .0333i
    # rank1: 19/1000 <= .0333 ok; rank2: .021 <= .0666 ok;
    # rank3: .022 <= .1 ok -> ALL rejected (step-up k=3)
    rows = [("a", 19, 1000), ("b", 21, 1000), ("c", 22, 1000)]
    df = spark.createDataFrame(rows, "cell string, hits int, n int")
    out = bh_fdr(df, "hits", "n", ["cell"], q_milli=100).collect()
    assert all(r["rejected"] for r in out)


def test_krippendorff_alpha_hand_values(spark):
    from vivace_graph_v3_spark.operators.stats_inference import (
        krippendorff_alpha_nominal)

    # units (a,a) (a,b) (b,b) (b,b): coincidences o_aa=2 o_ab=o_ba=1
    # o_bb=4; N=8, D=2, marginals 3/5 -> alpha = 1 - 7*2/30 = 16/30
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")],
        "a string, b string")
    row = krippendorff_alpha_nominal(df, "a", "b").collect()[0]
    assert row["n_units"] == 4 and row["n_categories"] == 2
    assert row["n_disagree_pairs"] == 2
    assert row["alpha_ppm"] == 1_000_000 - (7 * 2 * 1_000_000) // 30

    # degenerate single-category data: alpha undefined, never a
    # divide-by-zero
    one = spark.createDataFrame([("x", "x"), ("x", "x")],
                                "a string, b string")
    assert krippendorff_alpha_nominal(one, "a", "b").collect()[0][
        "alpha_ppm"] is None


def test_new_operators_match_pure_python_references(spark):
    """Seeded randomized cross-check: bh_fdr / kish_ess /
    krippendorff_alpha_nominal against direct pure-Python
    implementations of the textbook formulas."""
    import random

    from vivace_graph_v3_spark.operators.stats_inference import (
        bh_fdr, kish_ess, krippendorff_alpha_nominal)

    rng = random.Random(42)

    for trial in range(3):
        # --- BH ---
        m = rng.randrange(5, 20)
        rows = [(f"c{i:02d}", rng.randrange(0, 50), rng.randrange(50, 500))
                for i in range(m)]
        rows = [(c, min(h, n), n) for c, h, n in rows]
        df = spark.createDataFrame(rows, "cell string, hits int, n int")
        got = {r["cell"]: r["rejected"]
               for r in bh_fdr(df, "hits", "n", ["cell"]).collect()}
        ordered = sorted(rows, key=lambda r: (r[1] / r[2], r[0]))
        k = max([i + 1 for i, (c, h, n) in enumerate(ordered)
                 if h * m * 1000 <= (i + 1) * 100 * n], default=0)
        want = {c: (i + 1 <= k) for i, (c, h, n) in enumerate(ordered)}
        assert got == want, f"BH mismatch on trial {trial}"

        # --- Kish ESS ---
        ws = [rng.randrange(1, 100) for _ in range(rng.randrange(2, 30))]
        df = spark.createDataFrame([(w,) for w in ws], "w int")
        row = kish_ess(df, "w").collect()[0]
        s, q = sum(ws), sum(w * w for w in ws)
        assert row["ess_milli"] == s * s * 1000 // q
        assert row["deff_milli"] == len(ws) * q * 1000 // (s * s)

        # --- Krippendorff ---
        units = [(rng.choice("xyz"), rng.choice("xyz"))
                 for _ in range(rng.randrange(10, 60))]
        df = spark.createDataFrame(units, "a string, b string")
        row = krippendorff_alpha_nominal(df, "a", "b").collect()[0]
        from collections import Counter
        o = Counter()
        for a, b in units:
            o[(a, b)] += 1
            o[(b, a)] += 1
        N = sum(o.values())
        D = sum(c for (x, y), c in o.items() if x != y)
        marg = Counter()
        for (x, _y), c in o.items():
            marg[x] += c
        denom = N * N - sum(c * c for c in marg.values())
        want_ppm = (1_000_000 - ((N - 1) * D * 1_000_000) // denom
                    if denom > 0 else None)
        assert row["alpha_ppm"] == want_ppm
        assert row["n_units"] == len(units)
