"""Parquet-style RLE / bit-packed hybrid codec.

Framing (same grammar the reference reads at
/root/reference/hybrid_decoder.go:142-165):

  run        := rle-run | bitpacked-run
  rle-run    := uvarint(count << 1) value:ceil(width/8) bytes LE
  bitpacked  := uvarint((groups << 1) | 1) groups*width bytes
                (each group holds 8 values, LSB-first — see bitpack.py)

The reference's *writer* only ever emits bit-packed runs
(/root/reference/hybrid_encoder.go:55-70, README.md:42); our writer emits true
RLE runs for runs >= RLE_MIN_RUN values, so our output size is a lower bound on
the reference's for the same width — and we decode both kinds, like its reader.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import read_uvarint, write_uvarint

RLE_MIN_RUN = 8  # a run must fill at least one bit-packed group to be worth an RLE header


def _rle_value_bytes(width: int) -> int:
    return (width + 7) // 8


def encode(values: np.ndarray, width: int) -> bytes:
    """Encode uint values at the given bit width as a hybrid run stream."""
    n = len(values)
    if n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    vb = _rle_value_bytes(width)

    if width == 0:
        # Everything is the value 0: one RLE run, no payload bytes per spec
        # corner (width 0 -> 0-byte value); keep 0 value bytes.
        return write_uvarint(n << 1)

    # Run-length structure: starts[i]..starts[i+1] all hold run_values[i].
    change = np.flatnonzero(np.diff(v)) + 1
    starts = np.concatenate([[0], change, [n]])
    run_lens = np.diff(starts)
    long_runs = np.flatnonzero(run_lens >= RLE_MIN_RUN)

    # Plan the run layout first (cheap scalar pass over long runs only), then
    # do ONE vectorized pack over every bit-packed segment (each segment is
    # padded to whole 8-value groups, so a single padded scatter + pack call
    # replaces thousands of tiny pack calls on run-heavy data).
    #
    # A mid-stream bit-packed run's value count is implied by its group count,
    # so every bit-packed segment except the stream's last must hold a multiple
    # of 8 values: align each RLE run's start up to the segment's 8-boundary
    # and let the leading remainder ride in the bit-packed segment.
    bp_segs: list[tuple[int, int]] = []  # (lo, hi)
    rle_segs: list[tuple[int, int]] = []  # (count, value)
    order: list[tuple[str, int]] = []  # ("bp"|"rle", index)
    cursor = 0
    for ri in long_runs:
        s = int(starts[ri])
        e = s + int(run_lens[ri])
        rle_start = cursor + ((s - cursor + 7) // 8) * 8
        if e - rle_start < RLE_MIN_RUN:
            continue  # alignment ate the run; keep it bit-packed
        if rle_start > cursor:
            order.append(("bp", len(bp_segs)))
            bp_segs.append((cursor, rle_start))
        order.append(("rle", len(rle_segs)))
        rle_segs.append((e - rle_start, int(v[s])))
        cursor = e
    if cursor < n:
        order.append(("bp", len(bp_segs)))
        bp_segs.append((cursor, n))

    # one pack over all bit-packed segments (padded per segment)
    seg_bytes: list[bytes] = []
    if bp_segs:
        lens = np.array([hi - lo for lo, hi in bp_segs], dtype=np.int64)
        padded = ((lens + 7) // 8) * 8
        tot = int(padded.sum())
        padv = np.zeros(tot, dtype=np.uint64)
        pstart = np.concatenate([[0], np.cumsum(padded[:-1])])
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens[:-1])]), lens
        )
        src = np.repeat(np.array([lo for lo, _ in bp_segs], dtype=np.int64), lens) + within
        padv[np.repeat(pstart, lens) + within] = v[src]
        packed = bitpack.pack(padv, width)
        byte_start = (pstart * width // 8).tolist()
        byte_len = (padded * width // 8).tolist()
        seg_bytes = [packed[byte_start[i] : byte_start[i] + byte_len[i]] for i in range(len(bp_segs))]

    out = bytearray()
    for kind, i in order:
        if kind == "bp":
            lo, hi = bp_segs[i]
            out.extend(write_uvarint(((hi - lo + 7) // 8 << 1) | 1))
            out.extend(seg_bytes[i])
        else:
            cnt, value = rle_segs[i]
            out.extend(write_uvarint(cnt << 1))
            out.extend(value.to_bytes(vb, "little"))
    return bytes(out)


def decode(data, width: int, count: int) -> np.ndarray:
    """Decode a hybrid run stream to exactly ``count`` uint64 values.

    Two-phase: a cheap sequential header parse (varints force it), then two
    vectorized fills — one np.repeat scatter for all RLE runs, one
    concatenated unpack + gather for all bit-packed runs (their payloads are
    whole 8-value groups, so concatenating slices preserves alignment)."""
    out = np.empty(count, dtype=np.uint64)
    if count == 0:
        return out
    if width == 0:
        # The reference's encoder emits ZERO bytes for width 0
        # (hybrid_encoder.go bpEncode returns early), so a constant
        # dictionary-index stream from a parquet-go file has no runs to parse;
        # and a width-0 bit-packed header would make nbytes/nvals_per zero.
        out[:] = 0
        return out
    buf = bytes(data)
    vb = _rle_value_bytes(width)
    pos = 0
    filled = 0
    rle_vals: list[int] = []
    rle_takes: list[int] = []
    rle_dst: list[int] = []
    bp_slices: list[tuple[int, int]] = []
    bp_takes: list[int] = []
    bp_dst: list[int] = []
    try:
        while filled < count:
            header, pos = read_uvarint(buf, pos)
            if header & 1:  # bit-packed run
                groups = header >> 1
                if groups == 0:
                    raise ValueError("hybrid: zero-group bit-packed run")
                nbytes = groups * width
                if pos + nbytes > len(buf):
                    raise ValueError("hybrid: bit-packed run exceeds buffer")
                take = min(groups * 8, count - filled)
                bp_slices.append((pos, nbytes))
                bp_takes.append(take)
                bp_dst.append(filled)
                pos += nbytes
                filled += take
            else:  # RLE run
                run = header >> 1
                if run == 0:
                    raise ValueError("hybrid: zero-length RLE run")
                if pos + vb > len(buf):
                    raise ValueError("hybrid: truncated RLE value")
                rle_vals.append(int.from_bytes(buf[pos : pos + vb], "little") if vb else 0)
                pos += vb
                take = min(run, count - filled)
                rle_takes.append(take)
                rle_dst.append(filled)
                filled += take
    except IndexError as e:
        raise ValueError("hybrid: truncated run stream") from e

    def _ragged_dst(dst: np.ndarray, takes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        total = int(takes.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(takes[:-1])]), takes
        )
        return np.repeat(dst, takes) + within, within

    if rle_vals:
        takes = np.array(rle_takes, dtype=np.int64)
        idx, _ = _ragged_dst(np.array(rle_dst, dtype=np.int64), takes)
        out[idx] = np.repeat(np.array(rle_vals, dtype=np.uint64), takes)
    if bp_slices:
        takes = np.array(bp_takes, dtype=np.int64)
        chunk = b"".join(buf[s : s + n] for s, n in bp_slices)
        nvals_per = np.array([n * 8 // width for _, n in bp_slices], dtype=np.int64)
        unp = bitpack.unpack(chunk, width, int(nvals_per.sum()))
        base = np.concatenate([[0], np.cumsum(nvals_per[:-1])])
        dsti, within = _ragged_dst(np.array(bp_dst, dtype=np.int64), takes)
        out[dsti] = unp[np.repeat(base, takes) + within]
    return out
