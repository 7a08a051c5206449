"""Greedy sequence packing — assign documents/chunks to fixed-size context
windows for training-sample assembly.

The packer walks each group (e.g. a source shard) in deterministic key
order and opens a new bin whenever the running token total would exceed the
context length; an item longer than the context gets a bin of its own
(no truncation here — chunking upstream handles overlong docs). This is
FIRST-FIT-IN-ORDER, the streaming-friendly variant used by large training
pipelines: unlike first-fit-decreasing it needs no global sort by length,
and its output is reproducible from (group, key) alone.

Scale shape: the fold is inherently sequential PER GROUP, so the
parallelism unit is the group — at 100 TB the corpus is packed per
(source, shard) where shards are bounded (e.g. one input file or a
hash-bucket of doc ids), giving millions of independent groups. The
per-group state is two integers, so `applyInPandas` streams each group
through a vectorized cumulative fold without materializing anything
beyond the group itself. No other operator shape fits: packing is a
data-dependent running fold, exactly the case SURVEY.md §7.2 assigns to
grouped pandas execution rather than window functions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def pack_sequences(df: DataFrame, *, context_len: int,
                   group_col: str = "source", key_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Assign each row a bin index within its group. Returns
    (group_col, key_col, tokens_col, bin) with ``bin`` counting from 0 in
    ``key_col`` order inside each group."""
    from pyspark.sql import types as T

    in_fields = {f.name: f.dataType for f in df.schema.fields}
    schema = T.StructType([
        T.StructField(group_col, in_fields[group_col]),
        T.StructField(key_col, in_fields[key_col]),
        T.StructField(tokens_col, in_fields[tokens_col]),
        T.StructField("bin", T.LongType()),
    ])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        bins = []
        bin_idx, fill = 0, 0
        for tok in pdf[tokens_col]:
            t = int(tok)
            if fill > 0 and fill + t > context_len:
                bin_idx += 1
                fill = 0
            fill += t
            bins.append(bin_idx)
        out = pdf[[group_col, key_col, tokens_col]].copy()
        out["bin"] = bins
        return out

    cols = df.select(group_col, key_col, tokens_col)
    return cols.groupBy(group_col).applyInPandas(fold, schema=schema)


def packing_stats(packed: DataFrame, *, context_len: int,
                  group_col: str = "source",
                  tokens_col: str = "n_tokens") -> DataFrame:
    """Packing-efficiency report per group: bins used, items, token total,
    and fill ratio (tokens / (bins × context)). Pure relational aggregate
    over the packer output."""
    per_bin = (packed.groupBy(group_col, "bin")
               .agg(F.sum(tokens_col).alias("bin_tokens"),
                    F.count(F.lit(1)).alias("bin_items")))
    return (per_bin.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_bins"),
                 F.sum("bin_items").alias("n_items"),
                 F.sum("bin_tokens").alias("total_tokens"))
            .withColumn(
                "fill_ratio",
                F.round(F.col("total_tokens")
                        / (F.col("n_bins") * F.lit(context_len)), 6)))
