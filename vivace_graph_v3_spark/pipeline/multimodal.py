"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side contract is real and tested — schema, partitioning, pandas-UDF
signatures, Arrow batch shapes — while the actual media decode is stubbed
(the decode libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which produces a deterministic
fake decode so the pipeline shape can be exercised end-to-end.

Pattern: ``mapInPandas`` over batches of (id, media, meta) — each batch is one
Arrow RecordBatch, so media bytes never round-trip through Python pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("media", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), True),      # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def synthesize_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Wrap any table into the media schema with deterministic fake bytes —
    the test harness for the plumbing (real ingests write binary columns from
    object storage)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.encode(F.concat(F.lit("FAKE-MEDIA:"), F.col(id_col).cast("string")),
                 "utf-8").alias("media"),
        F.struct(
            F.lit(kind).alias("kind"), F.lit("application/x-fake").alias("mime"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(1000).cast("long").alias("duration_ms")).alias("meta"))


def decode_and_featurize(df: DataFrame, *, batch_feature_dim: int = 8,
                         fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas. ``fake=False`` is the seam
    where a real decoder (PIL/ffmpeg/torchaudio) plugs in; this container has
    none, so it raises (clearly marked stub)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; pass fake=True for the deterministic stub")
            feats = []
            for blob in pdf["media"]:
                # deterministic fake "embedding": bytes -> rolling sums
                # float64 so the fake feature is bit-identical to a SQL oracle
                arr = np.frombuffer(blob or b"\0", dtype=np.uint8).astype(np.float64)
                vec = np.resize(arr, batch_feature_dim)
                feats.append((vec / 255.0).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": [m["kind"] if m is not None else None for m in pdf["meta"]],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf["media"]],
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(df: DataFrame, *, width: int, height: int,
                 fake: bool = True) -> DataFrame:
    """Resize plumbing via mapInPandas: same (media_id, media, meta) schema
    out, with meta.width/height rewritten to the target and the media bytes
    re-encoded. ``fake=False`` is the PIL/ffmpeg seam (clearly marked stub);
    the fake path emits deterministic bytes sized proportionally to the
    target pixel count, so batch shapes and byte-size accounting downstream
    are exercised for real."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL — not in this container; "
                    "pass fake=True for the deterministic stub")
            out_media, out_meta = [], []
            for blob, m in zip(pdf["media"], pdf["meta"]):
                meta = dict(m) if m is not None else {}
                meta["width"], meta["height"] = width, height
                # deterministic: tile/truncate source bytes to 1 byte/pixel
                src = bytes(blob or b"\0")
                n = max(width * height, 1)
                out_media.append((src * (n // len(src) + 1))[:n])
                out_meta.append(meta)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "media": out_media, "meta": out_meta})

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into frame
    timestamps (decode stubbed). JVM-side sequence/explode, no Python."""
    return (df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"),
                                                  F.lit(0)),
                             F.lit(every_ms))))
        .select("media_id", "frame_ts_ms"))
