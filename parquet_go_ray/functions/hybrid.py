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

    out = bytearray()

    def emit_bitpacked(lo: int, hi: int) -> None:
        if hi <= lo:
            return
        groups = (hi - lo + 7) // 8
        out.extend(write_uvarint((groups << 1) | 1))
        out.extend(bitpack.pack(v[lo:hi], width))

    # A mid-stream bit-packed run's value count is implied by its group count,
    # so every bit-packed segment except the stream's last must hold a multiple
    # of 8 values: align each RLE run's start up to the segment's 8-boundary
    # and let the leading remainder ride in the bit-packed segment.
    cursor = 0
    for ri in long_runs:
        s = int(starts[ri])
        e = s + int(run_lens[ri])
        rle_start = cursor + ((s - cursor + 7) // 8) * 8
        if e - rle_start < RLE_MIN_RUN:
            continue  # alignment ate the run; keep it bit-packed
        emit_bitpacked(cursor, rle_start)
        out.extend(write_uvarint((e - rle_start) << 1))
        out.extend(int(v[s]).to_bytes(vb, "little"))
        cursor = e
    emit_bitpacked(cursor, n)
    return bytes(out)


def decode(data, width: int, count: int) -> np.ndarray:
    """Decode a hybrid run stream to exactly ``count`` uint64 values."""
    out = np.empty(count, dtype=np.uint64)
    if count == 0:
        return out
    buf = bytes(data)
    vb = _rle_value_bytes(width)
    pos = 0
    filled = 0
    while filled < count:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            nvals = groups * 8
            nbytes = groups * width
            vals = bitpack.unpack(buf[pos : pos + nbytes], width, nvals)
            pos += nbytes
            take = min(nvals, count - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
        else:  # RLE run
            run = header >> 1
            value = int.from_bytes(buf[pos : pos + vb], "little") if vb else 0
            pos += vb
            take = min(run, count - filled)
            out[filled : filled + take] = value
            filled += take
    return out
