"""Per-chunk statistics and codec auto-selection.

Replicates the reference's encoding decisions (SURVEY.md §2.3):

  * dictionary is the default for every type except BOOLEAN
    (/root/reference/schema.go:532-547, chunk_writer.go:178);
  * dictionary is abandoned when the chunk's distinct count exceeds
    32767 = math.MaxInt16 (/root/reference/type_dict.go:96-104,
    chunk_writer.go:188,200);
  * the dictionary size model is ``unique_bytes + 4 * num_values``
    vs the plain size (/root/reference/type_dict.go:131-133);
  * non-dict fallback encoding is the store's configured encoding — PLAIN by
    default, DELTA_* when configured (/root/reference/chunk_writer.go:80-128).

Two modes:
  REFERENCE  exactly the rules above — decision-parity tests pin this;
  EXTENDED   adds RLE-run, frame-of-reference(+delta), DELTA_* and FSST arms
             that only fire when their estimated size strictly beats the
             reference choice, preserving the <= reference-footprint invariant
             (BASELINE.json north_rule).

Stats are computed vectorized per chunk (numpy / pyarrow.compute), optionally
on a sample for cardinality, mirroring "sampling-based codec auto-selector
(cardinality, run-length, value-range statistics per Arrow chunk)" from the
north star.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions import bitpack, forr
from ..functions.shred import Stream

DICT_MAX_CARD = 32767  # math.MaxInt16, /root/reference/type_dict.go:101

MODE_REFERENCE = "reference"
MODE_EXTENDED = "extended"


@dataclass
class ChunkStats:
    num_values: int
    distinct: int | None  # None = not computed / over cutoff
    min: object = None
    max: object = None
    plain_size: int = 0
    unique_bytes: int = 0
    run_count: int | None = None  # number of value-change boundaries + 1
    sorted: bool = False
    delta_est: int | None = None
    for_est: int | None = None
    for_delta_est: int | None = None
    fsst_est: int | None = None

    @property
    def dict_size(self) -> int:
        # /root/reference/type_dict.go:131-133
        return self.unique_bytes + 4 * self.num_values


def int_stats(values: np.ndarray, nbits: int, sample_cap: int = 65536) -> ChunkStats:
    n = len(values)
    if n == 0:
        return ChunkStats(0, 0, plain_size=0)
    vmin, vmax = values.min(), values.max()
    itemsize = values.dtype.itemsize
    span = int(vmax) - int(vmin)
    # cardinality: O(n) bincount when the value span is small, exact sort on
    # small chunks, sample-screened otherwise (the "sampling-based" selector
    # of the north star — a high-card sample skips the exact pass entirely)
    if span < (1 << 22):
        distinct = int(np.count_nonzero(np.bincount((values.astype(np.int64) - int(vmin)), minlength=span + 1)))
    elif n <= sample_cap:
        distinct = len(np.unique(values))
    else:
        sample = values[:: max(1, n // sample_cap)][:sample_cap]
        s_uniq = len(np.unique(sample))
        if s_uniq > 0.5 * len(sample) or s_uniq > DICT_MAX_CARD:
            distinct = None  # clearly high-cardinality; skip the exact pass
        else:
            distinct = len(np.unique(values))
    runs = int(np.count_nonzero(np.diff(values))) + 1
    is_sorted = bool(np.all(values[1:] >= values[:-1])) if n > 1 else True
    size_for, size_fd = forr.estimate_size(values, nbits)
    # delta-binary-packed estimate: avg miniblock width over a sample
    sdt = values.dtype
    udt = np.uint32 if itemsize == 4 else np.uint64
    d = (values[1:].astype(udt, copy=False) - values[:-1].astype(udt, copy=False)).view(sdt) if n > 1 else np.empty(0, sdt)
    if len(d):
        span = int(d.max()) - int(d.min())
        delta_est = 8 + (n - 1) * max(span.bit_length(), 1) // 8 + (n // 128 + 1) * 6
    else:
        delta_est = 16
    return ChunkStats(
        num_values=n,
        distinct=distinct,
        min=vmin,
        max=vmax,
        plain_size=n * itemsize,
        unique_bytes=(distinct or 0) * itemsize,
        run_count=runs,
        sorted=is_sorted,
        delta_est=delta_est,
        for_est=size_for,
        for_delta_est=size_fd,
    )


def bytes_stats(offsets: np.ndarray, data: np.ndarray, sample_cap: int = 65536) -> ChunkStats:
    n = len(offsets) - 1
    nbytes = int(offsets[-1] - offsets[0])
    if n == 0:
        return ChunkStats(0, 0)
    lengths = np.diff(offsets)
    # distinct via hashing windows is costly; use numpy void-view on padded
    # matrix for short values, else a Python-free approximation via pyarrow
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(np.ascontiguousarray(offsets - offsets[0], dtype=np.int32)), pa.py_buffer(np.ascontiguousarray(data[int(offsets[0]):int(offsets[-1])]))],
    )
    if n <= sample_cap:
        distinct = pc.count_distinct(arr).as_py()
        unique_bytes = int(pc.sum(pc.binary_length(pc.unique(arr))).as_py() or 0)
    else:
        sample = arr.slice(0, sample_cap)
        s_uniq = pc.count_distinct(sample).as_py()
        if s_uniq > 0.5 * len(sample) or s_uniq > DICT_MAX_CARD:
            distinct, unique_bytes = None, 0
        else:
            distinct = pc.count_distinct(arr).as_py()
            unique_bytes = int(pc.sum(pc.binary_length(pc.unique(arr))).as_py() or 0)
    return ChunkStats(
        num_values=n,
        distinct=distinct,
        min=None,
        max=None,
        plain_size=nbytes + 4 * n,
        unique_bytes=unique_bytes + 4 * (distinct or 0),
    )


@dataclass
class Decision:
    codec: str
    reason: str


def choose_int_codec(stats: ChunkStats, mode: str = MODE_EXTENDED, fallback: str = "PLAIN") -> Decision:
    """Codec for an integer values stream (int32/int64 class)."""
    dict_ok = stats.distinct is not None and stats.distinct <= DICT_MAX_CARD
    if mode == MODE_REFERENCE:
        # exact reference semantics: dict iff cardinality survives the cutoff
        if dict_ok:
            return Decision("DICT", f"distinct={stats.distinct}<=32767")
        return Decision(fallback, "dict cutoff exceeded -> configured encoding")
    # EXTENDED: pick the smallest estimated size, dict competing on the
    # reference's own size model, never larger than the reference's pick.
    candidates: dict[str, float] = {"PLAIN": stats.plain_size}
    if dict_ok:
        width = bitpack.bit_width(max(stats.distinct - 1, 0))
        # real dict cost: dict values + packed indices (tighter than 4*n model)
        candidates["DICT"] = stats.unique_bytes + bitpack.packed_size(stats.num_values, width) + 16
    if stats.delta_est is not None:
        candidates["DELTA_BP"] = stats.delta_est
    if stats.for_est is not None:
        candidates["FOR"] = stats.for_est
    if stats.for_delta_est is not None:
        candidates["FOR_DELTA"] = stats.for_delta_est
    best = min(candidates, key=candidates.get)
    return Decision(best, f"min-size {candidates[best]:.0f}B of {len(candidates)} candidates")


def choose_bytes_codec(stats: ChunkStats, mode: str = MODE_EXTENDED, fallback: str = "PLAIN_BA", *, prefix_ratio: float = 0.0, fsst_est: int | None = None) -> Decision:
    dict_ok = stats.distinct is not None and stats.distinct <= DICT_MAX_CARD
    if mode == MODE_REFERENCE:
        if dict_ok:
            return Decision("DICT", f"distinct={stats.distinct}<=32767")
        return Decision(fallback, "dict cutoff exceeded -> configured encoding")
    candidates: dict[str, float] = {"PLAIN_BA": stats.plain_size}
    # delta-length drops the 4-byte prefixes for a compact delta stream
    candidates["DELTA_LENGTH_BA"] = stats.plain_size - 4 * stats.num_values + stats.num_values // 4 + 32
    if dict_ok:
        width = bitpack.bit_width(max(stats.distinct - 1, 0))
        candidates["DICT"] = stats.unique_bytes + bitpack.packed_size(stats.num_values, width) + 16
    if prefix_ratio > 0.25:
        payload = stats.plain_size - 4 * stats.num_values
        candidates["DELTA_BA"] = payload * (1 - prefix_ratio) + stats.num_values // 2 + 64
    if fsst_est is not None:
        candidates["FSST_BA"] = fsst_est
    best = min(candidates, key=candidates.get)
    return Decision(best, f"min-size {candidates[best]:.0f}B of {len(candidates)} candidates")


def choose_bool_codec(values: np.ndarray, mode: str = MODE_EXTENDED) -> Decision:
    # reference: booleans never dict (/root/reference/chunk_writer.go:178);
    # PLAIN bit-packs, RLE pays off on long runs.
    if mode == MODE_REFERENCE:
        return Decision("PLAIN_BOOL", "boolean -> plain (never dict)")
    n = len(values)
    if n == 0:
        return Decision("PLAIN_BOOL", "empty")
    runs = int(np.count_nonzero(np.diff(values))) + 1
    if runs * 3 < n // 8:
        return Decision("RLE_BOOL", f"{runs} runs over {n} values")
    return Decision("PLAIN_BOOL", "run density too high for RLE")
