"""Unit tests for the round-7 text/training operators: readability,
tokenizer fertility, DPO preference pairs, shard interleave audit."""

from pyspark.sql import functions as F

from vivace_graph_v3_spark.pipeline.text import (
    preference_pairs, readability_stats, tokenizer_fertility)
from vivace_graph_v3_spark.pipeline.export import interleave_audit


def _ppm(num: int, den: int) -> int:
    return (num * 2000000 + den) // (den * 2)


class TestReadability:
    def test_hand_counts(self, spark):
        # "The cat sat. It ran!" -> 5 words, 2 sentences,
        # syllables: the(1) cat(1) sat(1) it(1) ran(1) = 5
        df = spark.createDataFrame(
            [(1, "The cat sat. It ran!")], ["doc_id", "text"])
        r = readability_stats(df).collect()[0]
        assert r["n_words"] == 5
        assert r["n_sentences"] == 2
        assert r["n_syllables"] == 5
        expected = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
        assert r["flesch"] == expected
        assert r["band"] == "easy"

    def test_vowelless_word_counts_one_syllable(self, spark):
        df = spark.createDataFrame(
            [(1, "shh pfft hmm")], ["doc_id", "text"])
        r = readability_stats(df).collect()[0]
        assert r["n_syllables"] == 3  # no vowel groups, 3 min-1 words
        assert r["n_sentences"] == 1  # floor of 1 without punctuation

    def test_empty_doc_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "   "), (2, "word")], ["doc_id", "text"])
        out = readability_stats(df).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_hard_band(self, spark):
        # very long polysyllabic single sentence -> negative score
        text = " ".join(["onomatopoeia"] * 40)
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        r = readability_stats(df).collect()[0]
        assert r["band"] == "hard"


class TestFertility:
    def test_hand_ratios(self, spark):
        # doc1: "ab cd" -> 2 words, 2 bpe tokens, 5 chars
        # doc2: "a-b x1y" -> 2 words, bpe: a,-,b,x,1,y = 6 tokens, 7 chars
        df = spark.createDataFrame(
            [(1, "ab cd", "en"), (2, "a-b x1y", "en"),
             (3, "uno dos", "es")],
            ["doc_id", "text", "lang"])
        out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
        en = out["en"]
        assert en["n_docs"] == 2
        assert en["n_words"] == 4
        assert en["n_bpe_tokens"] == 8
        assert en["n_chars"] == 12
        assert en["fertility_ppm"] == _ppm(8, 4)
        assert en["chars_per_bpe_ppm"] == _ppm(12, 8)
        assert out["es"]["fertility_ppm"] == _ppm(2, 2)


class TestPreferencePairs:
    def test_best_pairs_worst(self, spark):
        # quality orders by length score; 4 docs in one source ->
        # 2 pairs: rank1<->rank4, rank2<->rank3
        docs = [(1, "x" * 500 + " word the and of in is", "s"),
                (2, "the and of to in is a an or word here", "s"),
                (3, "zz", "s"),
                (4, "q", "s")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
        out = {r["pair_rank"]: r for r in preference_pairs(df).collect()}
        assert set(out) <= {1, 2}
        for r in out.values():
            assert r["margin"] > 0
            assert r["chosen_q"] > r["rejected_q"]
        # the long high-quality doc must be the rank-1 chosen
        assert out[1]["chosen_id"] == 1

    def test_sources_isolated_and_zero_margin_dropped(self, spark):
        docs = [(1, "same text here", "a"), (2, "same text here", "a"),
                (3, "good words the and of in", "b"), (4, "zz", "b")]
        df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
        out = preference_pairs(df).collect()
        # source a: identical quality -> margin 0 -> dropped
        assert all(r["source"] == "b" for r in out)
        assert len(out) == 1


class TestInterleaveAudit:
    def test_totals_and_runs(self, spark):
        rows = [(i, "src%d" % (i % 3)) for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = interleave_audit(df, "doc_id", "source", n_shards=4)
        got = {r["source"]: r for r in out.collect()}
        assert sum(r["n_docs"] for r in got.values()) == 60
        for r in got.values():
            assert 1 <= r["n_runs"] <= r["n_docs"]
            assert r["max_run"] >= 1
            assert r["mean_run_ppm"] == _ppm(r["n_docs"], r["n_runs"])

    def test_single_group_is_one_run_per_shard(self, spark):
        rows = [(i, "only") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        r = interleave_audit(df, "doc_id", "source", n_shards=2).collect()[0]
        # one run per shard that received any rows
        assert r["n_docs"] == 20
        assert r["n_runs"] <= 2


class TestQuantileNormalize:
    def test_equal_groups_identical_distributions(self, spark):
        from vivace_graph_v3_spark.pipeline.text import quantile_normalize
        rows = [(i, "a", v) for i, v in enumerate([10, 20, 30, 40])] + \
               [(10 + i, "b", v) for i, v in enumerate([100, 200, 300, 400])]
        df = spark.createDataFrame(rows, ["doc_id", "source", "len"])
        out = quantile_normalize(df, group_col="source", value_col="len",
                                 id_col="doc_id").collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["source"], []).append(r["norm"])
        # post-normalization distributions are identical across groups
        assert sorted(by_g["a"]) == sorted(by_g["b"])
        # reference at rank 1 = mean(10, 100)
        r1 = [r for r in out if r["rank"] == 1]
        assert all(r["norm"] == 55.0 for r in r1)

    def test_unequal_groups_truncated_reference(self, spark):
        from vivace_graph_v3_spark.pipeline.text import quantile_normalize
        rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "len"])
        out = {r["doc_id"]: r["norm"]
               for r in quantile_normalize(df, group_col="source",
                                           value_col="len",
                                           id_col="doc_id").collect()}
        assert out[1] == 20.0 and out[3] == 20.0   # rank 1: mean(10, 30)
        assert out[2] == 20.0                      # rank 2: only group a
