"""Deterministic vectorized per-row column hashing (no Ray, no Python loop).

Moved from pipelines/encode.py so leaf layers (sources/bloom.py) can share
it without importing the pipeline layer. The role of the reference's
DefaultHashFunc (/root/reference/helpers.go:16-24), but vectorized and
stable across processes — the same value hashes identically at encode time
(bloom build, salt shuffle) and at query time (bloom probe), on every
worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stable_hash(col: pa.ChunkedArray) -> np.ndarray:
    """Deterministic per-row int64 hash of a string/int column (FNV-1a over
    bytes, vectorized)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        v = np.asarray(arr, dtype=np.int64).view(np.uint64)
        h = v * np.uint64(0x100000001B3)
        h ^= h >> np.uint64(29)
        return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) \
            or pa.types.is_fixed_size_binary(arr.type):
        # binary shares string's offsets+data layout; casting to string
        # would utf8-validate (and reject) arbitrary bytes
        arr = arr.cast(pa.binary())
    else:
        arr = arr.cast(pa.string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1, offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets)
    n = len(lengths)
    # Segment-fold polynomial hash: hash(row) = sum_j (b_j + C) * P^j mod 2^64,
    # computed flat over the concatenated data buffer — O(total_bytes *
    # log(maxlen)) time, O(total_bytes) memory. (A padded n x maxlen matrix
    # hash here once meant one 1 MB document in a 64k-row batch allocated
    # ~500 GB.)
    total = int(offsets[-1] - offsets[0])
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if total:
        starts = offsets[:-1] - offsets[0]
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        p = np.uint64(1099511628211)
        weights = np.ones(total, dtype=np.uint64)
        base = np.array([p], dtype=np.uint64)  # array: silent modular wrap
        for b in range(int(lengths.max() - 1).bit_length()):
            np.multiply(weights, base, out=weights, where=((pos >> b) & 1) == 1)
            base *= base
        terms = (data[offsets[0] : offsets[-1]].astype(np.uint64) + np.uint64(0x9E37)) * weights
        cs = np.empty(total + 1, dtype=np.uint64)
        cs[0] = 0
        np.cumsum(terms, dtype=np.uint64, out=cs[1:])
        h ^= cs[offsets[1:] - offsets[0]] - cs[starts]
        h *= p
        h ^= h >> np.uint64(29)
    h ^= lengths.view(np.uint64) if lengths.dtype == np.int64 else lengths.astype(np.uint64)
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
