"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side contract is real and tested — schema, partitioning, pandas-UDF
signatures, Arrow batch shapes. The decode itself is a dependency seam:
``fake=True`` (the default, and the CI path) produces a deterministic fake
decode so the pipeline shape can be exercised end-to-end; ``fake=False``
imports PIL *inside the executor UDF* and runs a real decode/resize when the
library is present, raising ``NotImplementedError`` only when it is genuinely
absent (as in this container). The real-path logic lives in module-level
helpers (`_decode_image_real`, `_resize_image_real`) so it is unit-testable
driver-side with a stub PIL.

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


def synthesize_ppm_media(df: DataFrame, id_col: str, *,
                         size: int = 8) -> DataFrame:
    """REAL media bytes, generated JVM-side: a valid binary PPM (P6) per
    row, ``size`` x ``size``, where pixel (x, y) has all three channels
    equal to ``(id + x) % 256`` — a closed form whose decoded grayscale
    column means an SQL oracle can predict exactly. Header and raster are
    built as hex string expressions and unhex'd to binary: no Python, no
    shuffle — at 100 TB this is scan-speed media synthesis (the production
    analog reads binary columns straight from parquet/object storage)."""
    header_hex = F.lit(f"P6\n{size} {size}\n255\n".encode().hex().upper())
    idn = F.col(id_col).cast("long")
    pix_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), F.lit(size * size - 1)),
        lambda p: F.repeat(
            F.lpad(F.hex(F.pmod(idn + F.pmod(p.cast("long"), F.lit(size)),
                                F.lit(256))), 2, "0"), 3)))
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.unhex(F.concat(header_hex, pix_hex)).alias("media"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(size).alias("width"), F.lit(size).alias("height"),
            F.lit(None).cast("long").alias("duration_ms")).alias("meta"))


def _import_pil():
    """The PIL seam: import inside the executor UDF (never at module import,
    so the package works without the extra). Raises NotImplementedError with
    a clear message when the library is absent."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError as exc:
        raise NotImplementedError(
            "real media decode requires Pillow (pip extra); not installed "
            "in this environment — pass fake=True for the deterministic "
            "stub path") from exc


def _decode_image_real(blob: bytes, feature_dim: int, image_mod=None):
    """Real image decode + feature extraction: grayscale thumbnail resampled
    to feature_dim pixels, normalized to [0,1]. Binary netpbm (PPM/PGM) is
    decoded by the dependency-free in-repo codec (imagecodec.py); other
    formats go through the PIL seam. ``image_mod`` injectable for tests;
    defaults to PIL.Image."""
    import io

    import numpy as np

    if image_mod is None and bytes(blob[:2]) in (b"P6", b"P5"):
        from vivace_graph_v3_spark.pipeline.imagecodec import (
            gray_column_feature)
        return gray_column_feature(blob, feature_dim)
    image = image_mod if image_mod is not None else _import_pil()
    img = image.open(io.BytesIO(blob))
    # decode to grayscale, thumbnail to a 1 x feature_dim strip: cheap,
    # deterministic, and bounded memory per row regardless of source size
    small = img.convert("L").resize((feature_dim, 1))
    arr = np.asarray(small, dtype=np.float64).reshape(-1)[:feature_dim]
    return (arr / 255.0).tolist()


def _resize_image_real(blob: bytes, width: int, height: int, image_mod=None) -> bytes:
    """Real resize: decode, resize, re-encode PNG. ``image_mod`` injectable
    for tests; defaults to PIL.Image."""
    import io

    if image_mod is None and bytes(blob[:2]) in (b"P6", b"P5"):
        from vivace_graph_v3_spark.pipeline.imagecodec import resize_netpbm
        return resize_netpbm(blob, width, height)
    image = image_mod if image_mod is not None else _import_pil()
    img = image.open(io.BytesIO(blob))
    out = io.BytesIO()
    img.resize((width, height)).save(out, format="PNG")
    return out.getvalue()


def decode_and_featurize(df: DataFrame, *, batch_feature_dim: int = 8,
                         fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas. ``fake=True`` (default/CI):
    deterministic bytes->feature stub. ``fake=False``: real PIL decode on
    the executors (raises NotImplementedError if Pillow is absent)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                if fake:
                    # deterministic fake "embedding": bytes -> rolling sums
                    # float64 so the fake feature is bit-identical to a SQL
                    # oracle
                    arr = (np.frombuffer(blob or b"\0", dtype=np.uint8)
                           .astype(np.float64))
                    vec = np.resize(arr, batch_feature_dim)
                    feats.append((vec / 255.0).tolist())
                else:
                    feats.append(_decode_image_real(blob, batch_feature_dim))
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
    re-encoded. ``fake=True`` (default/CI) emits deterministic bytes sized
    proportionally to the target pixel count, so batch shapes and byte-size
    accounting downstream are exercised for real; ``fake=False`` runs a real
    PIL resize on the executors (NotImplementedError if Pillow is absent)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_media, out_meta = [], []
            for blob, m in zip(pdf["media"], pdf["meta"]):
                meta = dict(m) if m is not None else {}
                meta["width"], meta["height"] = width, height
                src = bytes(blob or b"\0")
                if fake:
                    # deterministic: tile/truncate source to 1 byte/pixel
                    n = max(width * height, 1)
                    out_media.append((src * (n // len(src) + 1))[:n])
                else:
                    out_media.append(_resize_image_real(src, width, height))
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


# -- audio (WAV PCM) ----------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("mean_square", T.LongType(), True),
])


def synthesize_wav_media(df: DataFrame, id_col: str, *,
                         n_samples: int = 64,
                         sample_rate: int = 8000) -> DataFrame:
    """REAL audio bytes, generated JVM-side: a valid 16-bit mono PCM RIFF/
    WAV file per row where sample i = ((id*31 + i*17) mod 65536) - 32768 —
    a closed form whose decoded energy an SQL oracle predicts exactly.
    The 44-byte header is a binary literal (all fields constant for fixed
    n/rate); samples pack to little-endian two's-complement via hex
    expressions and one unhex. No Python, no shuffle — scan-speed audio
    synthesis (production reads binary columns from parquet/object
    storage; this is the harness for the decode plumbing)."""
    import struct

    data_len = n_samples * 2
    header = (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVEfmt "
              + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16)
              + b"data" + struct.pack("<I", data_len))
    idn = F.col(id_col).cast("long")
    # stored u16 two's complement of s = u16' - 32768 where
    # u16' = (id*31 + i*17) % 65536  =>  stored = (u16' + 32768) % 65536
    def _stored(i):
        return F.pmod(idn * 31 + i.cast("long") * 17 + 32768, F.lit(65536))

    sample_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), F.lit(n_samples - 1)),
        lambda i: F.concat(
            F.lpad(F.hex(_stored(i) % 256), 2, "0"),
            F.lpad(F.hex(F.floor(_stored(i) / 256).cast("long")), 2, "0"))))
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.concat(F.lit(header), F.unhex(sample_hex)).alias("media"),
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.lit(n_samples) * 1000 / F.lit(sample_rate)).cast("long")
            .alias("duration_ms")).alias("meta"))


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV bytes on the executors with the STDLIB ``wave`` module
    (real RIFF parsing, no optional dependency) and extract exact integer
    features: sample count, rate, and mean-square energy (sum(s^2) div n
    — all-integer, so the oracle can verify the full synthesize->pack->
    parse->featurize loop bit-for-bit). Arrow-batched mapInPandas; binary
    never leaves the executor."""

    def run(batches):
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "sample_rate": [],
                   "n_samples": [], "mean_square": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(blob)
                with wave.open(io.BytesIO(raw)) as w:
                    n = w.getnframes()
                    rate = w.getframerate()
                    frames = w.readframes(n)
                samples = struct.unpack(f"<{n}h", frames)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(raw))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["mean_square"].append(
                    sum(s * s for s in samples) // n if n else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# -- video (netpbm frame stream) ----------------------------------------------

FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("frame_idx", T.LongType(), True),
    T.StructField("mean_pixel", T.LongType(), True),
])


def synthesize_ppm_stream_media(df: DataFrame, id_col: str, *,
                                n_frames: int = 6, size: int = 4,
                                frame_ms: int = 250) -> DataFrame:
    """REAL video-like bytes, generated JVM-side: ``n_frames`` binary PPM
    frames concatenated back to back (the classic multi-image netpbm
    stream), frame f a constant raster of value (id + f) % 256 — closed
    form for the oracle. Same scan-speed hex/unhex construction as the
    single-image and WAV synthesizers."""
    idn = F.col(id_col).cast("long")
    header_hex = F.lit(f"P6\n{size} {size}\n255\n".encode().hex().upper())
    npx = size * size * 3
    stream_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda f: F.concat(
            header_hex,
            F.repeat(F.lpad(F.hex(F.pmod(idn + f.cast("long"),
                                         F.lit(256))), 2, "0"), npx))))
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.unhex(stream_hex).alias("media"),
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/x-portable-pixmap-stream").alias("mime"),
            F.lit(size).alias("width"), F.lit(size).alias("height"),
            F.lit(n_frames * frame_ms).cast("long").alias("duration_ms")
        ).alias("meta"))


def video_frame_features(media: DataFrame, *, every: int = 2) -> DataFrame:
    """Decode the frame stream on executors (dependency-free in-repo
    codec), SAMPLE every ``every``-th frame, and featurize each sampled
    frame to its exact integer mean pixel value — the frame-sampling +
    per-frame-featurize stage of a video ingest, with the decode real and
    the verification exact. Arrow-batched mapInPandas."""

    def run(batches):
        import pandas as pd

        from vivace_graph_v3_spark.pipeline.imagecodec import (
            decode_netpbm_stream)

        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "frame_idx": [],
                   "mean_pixel": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                frames = decode_netpbm_stream(bytes(blob))
                for idx in range(0, len(frames), every):
                    w, h, ch, raster = frames[idx]
                    out["media_id"].append(mid)
                    out["n_frames"].append(len(frames))
                    out["frame_idx"].append(idx)
                    out["mean_pixel"].append(sum(raster) // (w * h * ch))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), True),
    T.StructField("hash_lo", T.LongType(), True),
    T.StructField("hash_hi", T.LongType(), True),
])


def ahash64(df: DataFrame, *, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: decode the media
    blob (in-repo netpbm codec — no Pillow), nearest-neighbor downsample
    to grid x grid (the resize_netpbm index formula), and emit one bit per
    cell: channel-sum >= image mean. All comparisons are integer
    (bit = s*cells >= total), so the hash is engine-exact and an SQL
    oracle can predict it for synthetic rasters.

    The 64 bits are returned as two BIGINT halves (hash_lo bits 0-31,
    hash_hi bits 32-63) to keep every value positive and portable across
    engines without signed-shift edge cases.

    Scale shape: mapInPandas over Arrow batches — bytes never leave the
    executor, output is 2 ints per image; the downstream pair join (see
    phash_dup_pairs) works on hashes only."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from vivace_graph_v3_spark.pipeline.imagecodec import decode_netpbm

        for pdf in batches:
            los, his = [], []
            for blob in pdf["media"]:
                w, h, c, raster = decode_netpbm(bytes(blob))
                arr = (np.frombuffer(raster, dtype=np.uint8)
                       .reshape(h, w, c).astype(np.int64).sum(axis=2))
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = arr[ys][:, xs]
                bits = (cells * (grid * grid) >= cells.sum()).reshape(-1)
                val = 0
                for j, bset in enumerate(bits):
                    if bset:
                        val |= 1 << j
                los.append(val & 0xFFFFFFFF)
                his.append(val >> 32)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "hash_lo": los, "hash_hi": his})

    return df.mapInPandas(run, schema=AHASH_SCHEMA)


def phash_dup_pairs(hashes: DataFrame, *, max_hamming: int = 16,
                    band_bits: int = 16, top_k: int = 100) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance,
    banded-LSH blocked: the 64-bit hash splits into 64/band_bits bands and
    only pairs agreeing on at least one band are generated — the SimHash
    text path (pipeline/dedup.simhash_dup_pairs) applied to pixels, so
    recall semantics are the documented band-collision contract, never
    all-pairs.

    band_bits tunes the LSH operating point: 16 (default) for
    high-entropy hashes; smaller bands for low-entropy hashes (an aHash
    of a grid-structured image carries far fewer than 64 informative
    bits, so 4-bit bands keep collision probability meaningful at the
    same hamming target).

    EXACT-CLASS CONTRACTION first: identical hashes collapse into one
    class (representative = min media_id, size carried) BEFORE banding —
    the Kiveris-style contraction discipline. Without it a corpus where
    many images share a hash (screenshots, logos, synthetic rasters)
    turns one band bucket into a |corpus|-sized clique and the pair join
    goes quadratic; after it, bucket width is bounded by DISTINCT hash
    count, and exact duplicates are already answered by the class itself
    (measured at sf0.1, where 97% of the synthetic rasters share one
    hash: 166 s naive -> 4 s contracted, same top pairs). Returns the
    deterministic top_k near-dup CLASS pairs
    (media_a, media_b, hamming, size_a, size_b) by distance then
    representative ids; hamming >= 1 by construction — hamming-0
    (exact) duplicates are the within-class members.

    Scale shape: one hash aggregate (map-side combining) + a banded join
    over distinct hashes; the verify step is two xor+popcounts per
    candidate."""
    if 64 % band_bits:
        raise ValueError("band_bits must divide 64")
    classes = (hashes.groupBy("hash_lo", "hash_hi")
               .agg(F.min("media_id").alias("media_id"),
                    F.count(F.lit(1)).alias("size")))
    mask = (1 << band_bits) - 1
    nbands = 64 // band_bits
    bands = []
    for i in range(nbands):
        off = i * band_bits
        src = "hash_lo" if off < 32 else "hash_hi"
        bands.append(F.shiftright(src, off % 32).bitwiseAND(F.lit(mask))
                     .alias(f"b{i}"))
    h = classes.select("media_id", "hash_lo", "hash_hi", "size", *bands)
    stack_args = ", ".join(f"{i}, b{i}" for i in range(nbands))
    banded = h.selectExpr(
        "media_id", "hash_lo", "hash_hi", "size",
        f"stack({nbands}, {stack_args}) as (band_id, band_val)")
    a = banded.select(F.col("media_id").alias("media_a"),
                      F.col("hash_lo").alias("lo_a"),
                      F.col("hash_hi").alias("hi_a"),
                      F.col("size").alias("size_a"), "band_id", "band_val")
    b = banded.select(F.col("media_id").alias("media_b"),
                      F.col("hash_lo").alias("lo_b"),
                      F.col("hash_hi").alias("hi_b"),
                      F.col("size").alias("size_b"), "band_id", "band_val")
    cand = (a.join(b, ["band_id", "band_val"])
            .filter(F.col("media_a") < F.col("media_b"))
            .select("media_a", "media_b", "lo_a", "hi_a", "lo_b", "hi_b",
                    "size_a", "size_b")
            .distinct())
    ham = (F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
           + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))).cast("long")
    return (cand.select("media_a", "media_b", ham.alias("hamming"),
                        "size_a", "size_b")
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("hamming", "media_a", "media_b")
            .limit(top_k))


def synthesize_ppm_media_var(df: DataFrame, id_col: str, *,
                             min_size: int = 4,
                             n_sizes: int = 5) -> DataFrame:
    """Variable-dimension PPM synthesis: like synthesize_ppm_media but
    each row gets its own rectangle — width ``min_size + (id % n_sizes)``,
    height ``min_size + ((id * 3) % n_sizes)`` — the harness for
    metadata-sniffing operators, which are uninteresting over a
    constant-dimension corpus. Same closed pixel form ((id + x) % 256),
    same all-JVM hex construction, no Python, no shuffle."""
    idn = F.col(id_col).cast("long")
    w = (F.lit(min_size) + F.pmod(idn, F.lit(n_sizes))).cast("long")
    h = (F.lit(min_size) + F.pmod(idn * 3, F.lit(n_sizes))).cast("long")
    header_hex = F.hex(F.encode(
        F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                 h.cast("string"), F.lit("\n255\n")), "UTF-8"))
    pix_hex = F.concat_ws("", F.transform(
        F.sequence(F.lit(0), w * h - 1),
        lambda p: F.repeat(
            F.lpad(F.hex(F.pmod(idn + F.pmod(p.cast("long"), w),
                                F.lit(256))), 2, "0"), 3)))
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.unhex(F.concat(header_hex, pix_hex)).alias("media"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            w.cast("int").alias("width"), h.cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms")).alias("meta"))


def sniff_ppm_dims(media: DataFrame, *, media_col: str = "media",
                   id_col: str = "media_id") -> DataFrame:
    """Metadata sniffing WITHOUT decoding: parse width/height out of the
    binary P6 header with pure JVM string expressions (decode the ASCII
    prefix, regexp the two dimension fields) — the pattern for the
    cheap first pass of a multimodal pipeline: dimension/aspect filters
    run at scan speed over billions of images, and only survivors pay
    the Python (Arrow) decode in decode_image_features.

    Returns (media_id, width, height, n_pixels, aspect_ppm). Map-only."""
    # the P6 header fits well inside 32 bytes for any sane dimensions;
    # raster bytes past it are arbitrary, so decode as ISO-8859-1 (total:
    # every byte maps to a char; the ASCII header is unchanged) — UTF-8
    # would throw MALFORMED_CHARACTER_CODING on raster bytes
    head = F.decode(F.expr(f"substring({media_col}, 1, 32)"), "ISO-8859-1")
    w = F.regexp_extract(head, r"P6\s+(\d+)\s+(\d+)", 1).cast("long")
    h = F.regexp_extract(head, r"P6\s+(\d+)\s+(\d+)", 2).cast("long")
    # dims are header-bounded (<= ~1e5), so the ppm numerator stays far
    # inside double-exact integer range; floor(double) == integer div here
    aspect = F.floor((w * F.lit(2000000) + h) / (h * F.lit(2))).cast("long")
    return media.select(
        F.col(id_col),
        w.alias("width"), h.alias("height"),
        (w * h).alias("n_pixels"),
        aspect.alias("aspect_ppm"))
