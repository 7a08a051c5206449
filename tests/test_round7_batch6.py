"""Unit tests for the round-7 session-3 (batch-6) operators: PassJoin
edit-distance dedup, trade-flow SCC / bow-tie decomposition, and exact
isotonic (PAVA) calibration."""

import itertools

from pyspark.sql import functions as F

from vivace_graph_v3_spark.pipeline.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditDistancePairs:
    def test_complete_vs_bruteforce(self, spark):
        # PassJoin must find EVERY pair within distance k (pigeonhole
        # completeness), and nothing above k — compare to brute force
        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = [
            ("d0", base),
            ("d1", base.replace("quick", "quack")),           # ed 1
            ("d2", base.replace("jumps", "jumped") + " x"),   # small edits
            ("d3", base[:-6] + "often"),
            ("d4", "a completely different document about spark engines ok"),
            ("d5", base.replace("brown", "blue") + " tail"),
            ("d6", "  THE   Quick brown fox jumps over the lazy dog"
                   " again and again "),                      # normalizes close
        ]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        k = 4
        got = {(r["id_a"], r["id_b"]): r["edit_distance"]
               for r in edit_distance_pairs(df, k=k).collect()}

        def norm(t):
            return " ".join(t.lower().split())

        want = {}
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            d = _lev(norm(ta), norm(tb))
            if d <= k:
                want[(min(ia, ib), max(ia, ib))] = d
        assert got == want
        assert want, "fixture must generate at least one pair"
        assert any(d > 0 for d in want.values())

    def test_short_texts_out_of_scope(self, spark):
        df = spark.createDataFrame(
            [("a", "tiny text"), ("b", "tiny text")],
            "doc_id string, text string")
        assert edit_distance_pairs(df, k=4, min_len=20).count() == 0

    def test_exact_duplicates_distance_zero(self, spark):
        t = "identical content stretched to pass the minimum length gate"
        df = spark.createDataFrame(
            [("a", t), ("b", t)], "doc_id string, text string")
        rows = edit_distance_pairs(df, k=2).collect()
        assert [(r["id_a"], r["id_b"], r["edit_distance"])
                for r in rows] == [("a", "b", 0)]
