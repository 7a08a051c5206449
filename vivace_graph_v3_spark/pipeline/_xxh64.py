"""Vectorized XXH64 primitives, bit-identical to Spark's ``xxhash64``.

Spark's ``xxhash64`` expression (seed 42) folds its children through the
XXH64 block mixers: a LONG child goes through ``hashLong`` and an INT
child through ``hashInt`` (org.apache.spark.sql.catalyst.expressions.XXH64,
the classic Cyan4973/xxHash finalization). Both are fixed bit-mixes with
no data-length loop, so they vectorize directly onto numpy uint64 lanes.

Why this module exists (optimization round 9, guide §4.2): Spark's
higher-order functions (``transform`` / ``aggregate`` lambdas) are
CodegenFallback — every element evaluation walks the interpreted
expression tree. The minhash signature fold evaluates
``least(v, xxhash64(shingle, perm))`` |shingles| x k times per document,
which measured ~7 us per eval (~100 core-seconds for 5 000 docs x 48
shingles x 64 permutations at sf0.1) and dominated the whole dedup
family. The same arithmetic as numpy vector passes is ~100x cheaper and
crosses the Python boundary as Arrow batches. Bit-equality with the
expression form is pinned by tests/test_dedup.py::test_minhash_vectorized_bit_identical.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's fixed xxhash64 seed

_err = np.seterr(over="ignore")  # uint64 wrap-around IS the algorithm
np.seterr(**_err)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * _P2
        h = h ^ (h >> np.uint64(29))
        h = h * _P3
        h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong over a uint64 vector (Spark: LONG child fold)."""
    with np.errstate(over="ignore"):
        h = np.uint64(seed) + (_P5 + np.uint64(8)) if np.isscalar(seed) \
            else seed + (_P5 + np.uint64(8))
        k1 = _rotl(value * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value: int, seed: np.ndarray) -> np.ndarray:
    """XXH64.hashInt of a scalar int against a vector of seeds
    (Spark: INT child folded after a previous child's hash)."""
    with np.errstate(over="ignore"):
        h = seed + (_P5 + np.uint64(4))
        h = h ^ (np.uint64(value & 0xFFFFFFFF) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def minhash_matrix(flat: np.ndarray, starts: np.ndarray,
                   num_hashes: int) -> np.ndarray:
    """Per-document minhash signatures, bit-identical to the Spark fold
    ``aggregate(sh, array_repeat(maxlong, k), (a, s) -> transform(a,
    (v, i) -> least(v, xxhash64(s, i))))``.

    ``flat``: all documents' shingle hashes concatenated (int64);
    ``starts``: start offset of each document's slice (int64, len = ndocs,
    every document non-empty). Returns an (ndocs, num_hashes) int64 matrix.
    ``least`` on LongType is a SIGNED comparison, so minima are taken on
    the int64 view, matching the expression form exactly."""
    inner = hash_long(flat.view(np.uint64), _SEED)  # xxhash64(s) fold step 1
    out = np.empty((len(starts), num_hashes), dtype=np.int64)
    for i in range(num_hashes):
        h = hash_int(i, inner).view(np.int64)
        out[:, i] = np.minimum.reduceat(h, starts)
    return out
