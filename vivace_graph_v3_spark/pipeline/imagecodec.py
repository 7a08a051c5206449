"""Dependency-free image codec for the REAL multimodal decode path.

The container has no Pillow, so the PIL seam in multimodal.py could never
actually execute — this module provides a complete in-repo decoder for the
netpbm formats (binary PPM ``P6`` / PGM ``P5``), making ``fake=False`` a
real, testable path for at least one format while JPEG/PNG stay behind the
PIL seam. Reference analog: the optional GEOS add-on seam
(graph-db.asd:176-185) — core works standalone, heavier formats are extras.

Netpbm is public-domain-documented (netpbm.sourceforge.net/doc/ppm.html):
ASCII header ``P6 <width> <height> <maxval>`` with ``#`` comments and
arbitrary whitespace, then ``width*height*3`` raw bytes (1 byte/sample for
maxval < 256).
"""

from __future__ import annotations


def _read_header_tokens(blob: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated integer tokens after the
    magic, skipping ``#`` comments; returns (tokens, offset_past_header).
    The single whitespace byte after the last token is consumed (netpbm:
    exactly one whitespace separates maxval from raster)."""
    toks: list[int] = []
    i = 2  # past magic
    cur = b""
    while len(toks) < n_tokens:
        if i >= len(blob):
            raise ValueError("truncated netpbm header")
        c = blob[i:i + 1]
        if c == b"#":
            while i < len(blob) and blob[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            if not c.isdigit():
                raise ValueError(f"bad netpbm header byte {c!r}")
            cur += c
        i += 1
    return toks, i


def decode_netpbm(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode binary PPM (P6, RGB) or PGM (P5, grayscale).

    Returns (width, height, channels, raster) with ``channels`` 3 or 1 and
    ``raster`` exactly ``width*height*channels`` bytes (maxval < 256 only —
    16-bit samples are out of scope for the feature path)."""
    magic = bytes(blob[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm image (magic {magic!r})")
    channels = 3 if magic == b"P6" else 1
    (width, height, maxval), off = _read_header_tokens(blob, 3)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad netpbm dimensions {width}x{height}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    need = width * height * channels
    raster = bytes(blob[off:off + need])
    if len(raster) < need:
        raise ValueError(f"truncated netpbm raster: {len(raster)} < {need}")
    return width, height, channels, raster


def encode_netpbm(width: int, height: int, channels: int,
                  raster: bytes) -> bytes:
    """Inverse of decode_netpbm (maxval fixed at 255)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(raster) != width * height * channels:
        raise ValueError("raster size does not match dimensions")
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode() + raster


def gray_column_feature(blob: bytes, feature_dim: int) -> list[float]:
    """The decode->feature contract for netpbm media: grayscale (channel
    mean), box-averaged down each column, columns box-averaged into
    ``feature_dim`` buckets, normalized to [0,1]. Pure closed-form
    arithmetic, so an SQL oracle can predict it for synthetic rasters."""
    import numpy as np

    width, height, channels, raster = decode_netpbm(blob)
    arr = (np.frombuffer(raster, dtype=np.uint8).astype(np.float64)
           .reshape(height, width, channels))
    gray = arr.mean(axis=2)            # (R+G+B)/3, or identity for P5
    cols = gray.mean(axis=0)           # box-average each column
    buckets = np.array_split(cols, feature_dim)
    # empty buckets (feature_dim > width) contribute 0.0
    return [float(b.mean() / 255.0) if b.size else 0.0 for b in buckets]


def resize_netpbm(blob: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as netpbm — the dependency-free
    real path for resize_image."""
    import numpy as np

    sw, sh, channels, raster = decode_netpbm(blob)
    arr = (np.frombuffer(raster, dtype=np.uint8)
           .reshape(sh, sw, channels))
    ys = (np.arange(height) * sh) // height
    xs = (np.arange(width) * sw) // width
    out = arr[ys][:, xs]
    return encode_netpbm(width, height, channels, out.tobytes())


def decode_netpbm_stream(blob: bytes) -> list[tuple[int, int, int, bytes]]:
    """Decode a CONCATENATED netpbm stream (the classic multi-image ppm
    convention: frames appended back to back) into its frames. Each
    frame's length is derived from its own header, so mixed sizes are
    fine; raises on any truncated frame."""
    frames: list[tuple[int, int, int, bytes]] = []
    i = 0
    n = len(blob)
    while i < n:
        sub = blob[i:]
        magic = bytes(sub[:2])
        if magic not in (b"P6", b"P5"):
            raise ValueError(
                f"frame {len(frames)}: bad magic {magic!r} at offset {i}")
        channels = 3 if magic == b"P6" else 1
        (width, height, maxval), off = _read_header_tokens(sub, 3)
        if not 0 < maxval < 256:
            raise ValueError(f"unsupported maxval {maxval}")
        need = width * height * channels
        raster = bytes(sub[off:off + need])
        if len(raster) < need:
            raise ValueError(f"truncated frame {len(frames)}")
        frames.append((width, height, channels, raster))
        i += off + need
    return frames
