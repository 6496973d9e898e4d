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

from dataclasses import dataclass

import numpy as np

from ..functions import bitpack

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
    uniques: object = None  # np.ndarray of sorted uniques when distinct survived the cap

    @property
    def dict_size(self) -> int:
        # /root/reference/type_dict.go:131-133
        return self.unique_bytes + 4 * self.num_values


def capped_distinct(values: np.ndarray, cap: int = DICT_MAX_CARD, chunk: int = 1 << 18):
    """Exact distinct values with early abort past ``cap``.

    This is the reference's streaming cardinality cutoff
    (/root/reference/type_dict.go:96-104: uniques tracked while adding, dict
    flips off permanently once the cap is crossed) done in vectorized chunks:
    high-cardinality data aborts after the first chunk, low-cardinality data
    pays only small sorted merges. Returns the sorted uniques array (reused by
    the DICT encoder) or None if the cap was exceeded.
    """
    uniq = None
    for lo in range(0, len(values), chunk):
        cu = np.unique(values[lo : lo + chunk])
        uniq = cu if uniq is None else np.union1d(uniq, cu)
        if len(uniq) > cap:
            return None
    return uniq


def int_stats(values: np.ndarray, sample_cap: int = 65536) -> ChunkStats:
    """Chunk statistics for an integer column. ``sample_cap`` bounds the
    delta-statistics sample per slice (selection-steering only; exact
    min/max for pruning stay global). ``run_count``/``sorted`` in the
    result are diagnostics computed from the same sampled delta pass —
    no selection rule reads them today."""
    n = len(values)
    itemsize = values.dtype.itemsize
    if n == 0:
        return ChunkStats(0, 0, plain_size=0)
    vmin, vmax = values.min(), values.max()
    span = int(vmax) - int(vmin)
    sdt = values.dtype
    udt = {1: np.uint8, 2: np.uint16, 4: np.uint32}.get(itemsize, np.uint64)
    from ..functions.arena import scratch_view

    # single delta pass shared by run-count / sortedness / delta / FOR
    # estimates; scratch-arena temp (d is dead before the next arena draw).
    # For big chunks the delta statistics come from head/middle/tail slices
    # (they only steer codec SELECTION — exact min/max for pruning stats stay
    # global above; the encoders compute their true widths at encode time),
    # cutting ~3 full memory passes from the selection step.
    SAMPLE = int(sample_cap)
    if n > 1:
        if n > 8 * SAMPLE:
            slices = [values[:SAMPLE], values[(n - SAMPLE) // 2 : (n + SAMPLE) // 2],
                      values[-SAMPLE:]]
            sampled_n = sum(len(s) for s in slices) - len(slices)
            dmin = dmax = None
            nz = 0
            is_sorted = True
            for s in slices:
                su = s.view(udt)
                sd = (su[1:] - su[:-1]).view(sdt)
                m1, m2 = int(sd.min()), int(sd.max())
                dmin = m1 if dmin is None else min(dmin, m1)
                dmax = m2 if dmax is None else max(dmax, m2)
                nz += int(np.count_nonzero(sd))
                is_sorted &= m1 >= 0
            # sortedness needs the gaps between slices too
            is_sorted &= bool(slices[0][-1] <= slices[1][0] <= slices[1][-1] <= slices[2][0])
            runs = int(nz / max(sampled_n, 1) * (n - 1)) + 1
            dspan = dmax - dmin
        else:
            u = values.view(udt)
            d = scratch_view(n - 1, udt)
            np.subtract(u[1:], u[:-1], out=d)
            d = d.view(sdt)
            dmin, dmax = int(d.min()), int(d.max())
            runs = int(np.count_nonzero(d)) + 1
            is_sorted = dmin >= 0
            dspan = dmax - dmin
    else:
        runs, is_sorted, dspan = 1, True, 0

    # exact-with-early-abort cardinality (uniques kept for the DICT encoder);
    # bincount fast path when the value span is small
    uniques = None
    if span < (1 << 20) and span >= 0:
        if itemsize < 4:
            # a 1/2-byte dtype can't hold its own full span (e.g. int16
            # span 65535) — the in-dtype subtract would wrap negative
            shifted = values.astype(np.int32) - np.int32(vmin)
        else:
            shifted = scratch_view(n, values.dtype)  # reuses d's size class
            np.subtract(values, vmin, out=shifted)
        counts = np.bincount(shifted, minlength=span + 1)
        nz = np.flatnonzero(counts)
        distinct = len(nz)
        if distinct <= DICT_MAX_CARD:
            uniques = (nz + int(vmin)).astype(sdt)
    else:
        uniques = capped_distinct(values)
        distinct = len(uniques) if uniques is not None else None

    base = 6 + itemsize + 1
    size_for = base + bitpack.packed_size(n, span.bit_length())
    size_fd = base + itemsize + bitpack.packed_size(max(n - 1, 0), dspan.bit_length())
    delta_est = 8 + max(n - 1, 0) * max(dspan.bit_length(), 1) // 8 + (n // 128 + 1) * 6
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
        uniques=uniques,
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

    rel = np.ascontiguousarray(offsets - offsets[0], dtype=np.int64)
    payload = pa.py_buffer(np.ascontiguousarray(data[int(offsets[0]):int(offsets[-1])]))
    if nbytes <= np.iinfo(np.int32).max:
        arr = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(rel.astype(np.int32)), payload])
    else:
        # >2 GiB of chunk payload: int32 offsets would silently wrap negative
        # and count_distinct would score garbage — large_binary keeps int64
        arr = pa.Array.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(rel), payload])
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
