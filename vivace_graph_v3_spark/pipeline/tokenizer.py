"""Distributed tokenizer-training statistics.

Training a subword tokenizer (BPE / WordPiece) over a 100 TB corpus has one
step that actually touches the corpus: building the word-frequency table.
Everything after — pair counting, merge selection — runs over the DISTINCT
word vocabulary weighted by frequency, which Heaps' law keeps orders of
magnitude smaller than the corpus. These operators implement that split
Spark-first: one map-side-combined shuffle over the corpus, then
vocab-bounded expression work, no Python in either phase.

Reference scope note: the reference engine (kraison/vivace-graph-v3) has no
tokenizer surface; this extends the LLM-data-pipeline operator set the
engine targets (see SURVEY.md §2 beyond-reference block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.util import ensure_parallelism

# lowercase alphabetic runs: the word universe for pair statistics (digits
# and punctuation are single symbols in a real byte-level BPE and never
# participate in early merges on natural text)
WORD_RE = "[a-z]+"


def word_frequencies(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(w, f) word-frequency table — the ONLY corpus-bounded step of
    tokenizer training. regexp_extract_all + explode + count stays in
    whole-stage codegen; the groupBy map-side combines, so the shuffle
    carries the per-partition vocabulary, not the corpus."""
    return (ensure_parallelism(df)
            .select(F.explode(F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)))
                .alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("f")))


def bpe_pair_stats(df: DataFrame, *, text_col: str = "text",
                   top_k: int = 30) -> DataFrame:
    """The first BPE merge iteration (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units"): count
    adjacent character-pair occurrences across the corpus and rank the
    merge candidates. Pair positions count individually ("aaa" yields
    "aa" twice) — the BPE counting convention.

    Returns the ``top_k`` (pair, freq) rows, freq desc / pair asc (a
    total order, so the cut is deterministic).

    Scale shape: pairs are generated from the DISTINCT vocabulary
    weighted by word frequency — after word_frequencies' single corpus
    shuffle, the explode touches |vocab| * avg_word_len rows, not the
    corpus. Top-k is TakeOrdered (per-partition heads + driver merge),
    never a global sort."""
    wf = word_frequencies(df, text_col=text_col)
    pairs = (wf.filter(F.length("w") >= 2)
             .select("f", F.explode(F.expr(
                 "transform(sequence(1, length(w) - 1), "
                 "          i -> substring(w, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
            .agg(F.sum("f").cast("long").alias("freq"))
            .orderBy(F.desc("freq"), "pair")
            .limit(top_k))
