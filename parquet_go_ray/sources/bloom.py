"""Split-block Bloom filters for partition-level point-lookup pruning.

The reference prunes row groups by min/max stats only
(/root/reference/file_reader.go:275-277); on high-cardinality columns
(doc_id over a shuffled corpus) every partition's [min,max] spans the whole
key space and stats pruning is useless. A per-partition Bloom filter makes
equality lookups skip partitions that provably lack the key — at 100 TB a
``doc_id`` point query touches a handful of partitions instead of all of
them. The filter is the public split-block Bloom design (Putze, Sanders &
Singler 2007; the same SBBF layout standard Parquet adopted): 256-bit
blocks of 8x32-bit words, one block per insertion chosen by the high hash
bits, one bit per word chosen by 8 odd-constant multiplications — two
cache lines touched per probe, fully vectorizable.

Hashing: ``functions/colhash.stable_hash`` (deterministic across
processes/workers — the build at encode time and the probe at query time
must agree). Sizing: ~10 bits per distinct value (≈1% false-positive rate)
rounded up to whole blocks, capped at 4 MiB.

Wire: raw little-endian uint32 block words, stored as a blob in the
partition body with (offset, size, nblocks, n_distinct) recorded in the
footer under ``blooms[column]`` — probes do ONE ranged read of the blob
(footer tail-read + blob read), no page data moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.colhash import stable_hash

# the 8 odd constants of the standard split-block design (public Parquet
# SBBF salt; any fixed odd constants work — these are the convention)
_SALT = np.array([
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
], dtype=np.uint32)

BITS_PER_VALUE = 10  # ~1% fpp at 8 probe bits
MAX_BYTES = 4 << 20


def num_blocks(n_distinct: int) -> int:
    nbytes = max(32, min(MAX_BYTES, (n_distinct * BITS_PER_VALUE + 7) // 8))
    return (nbytes + 31) // 32


def _fmix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer (public domain): full-avalanche mix. colhash's
    FNV-style int hash is linear in the value — small ints map to small
    high bits, which would funnel EVERY row into block 0 and saturate it
    (a measured 100%-false-positive filter before this mix)."""
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC4CEB9FE1A85EC53)
    return h ^ (h >> np.uint64(33))


def _block_and_masks(h: np.ndarray, nblocks: int):
    """(block index, 8 x per-word bit masks) for each hash, vectorized."""
    h = h.view(np.uint64) if h.dtype == np.int64 else h.astype(np.uint64)
    h = _fmix64(h)
    hi = (h >> np.uint64(32)).astype(np.uint32)
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    # unbiased range reduction without modulo: (hi * nblocks) >> 32
    block = ((hi.astype(np.uint64) * np.uint64(nblocks)) >> np.uint64(32)).astype(np.int64)
    shifts = ((lo[:, None] * _SALT[None, :]) >> np.uint32(27)).astype(np.uint32)
    masks = (np.uint32(1) << shifts)  # (n, 8)
    return block, masks


def build(col: pa.ChunkedArray | pa.Array) -> bytes:
    """Build a filter over a column's non-null values (ints or strings)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        arr = arr.drop_null()
    h = stable_hash(pa.chunked_array([arr])) if len(arr) else np.empty(0, np.int64)
    uh = np.unique(h)
    nb = num_blocks(len(uh))
    words = np.zeros((nb, 8), dtype=np.uint32)
    if len(uh):
        block, masks = _block_and_masks(uh, nb)
        for w in range(8):  # 8 scatter-ORs; duplicates need the unbuffered op
            np.bitwise_or.at(words[:, w], block, masks[:, w])
    return words.tobytes()


def maybe_contains(blob: bytes | memoryview, values) -> np.ndarray:
    """Vectorized probe: bool per value (True = possibly present)."""
    words = np.frombuffer(blob, dtype=np.uint32)
    if len(words) % 8:
        raise ValueError("bloom blob is not whole 256-bit blocks")
    nb = len(words) // 8
    if nb == 0:
        raise ValueError("empty bloom blob")
    words = words.reshape(nb, 8)
    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    h = stable_hash(pa.chunked_array([arr]) if isinstance(arr, pa.Array) else arr)
    if len(h) == 0:
        return np.empty(0, dtype=bool)
    block, masks = _block_and_masks(h, nb)
    got = words[block]  # (n, 8)
    return ((got & masks) == masks).all(axis=1)
