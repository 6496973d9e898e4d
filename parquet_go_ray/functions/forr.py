"""Frame-of-reference (+ optional delta) bit-packing for integers.

North-star addition (not in the reference — BASELINE.json adds
"frame-of-reference + delta" beyond the parquet-go codec set). Classic FOR:
subtract the chunk minimum, bit-pack the non-negative residuals at the width
of the max residual. The delta variant applies FOR to the (modular) deltas,
which wins on sorted-ish data with occasional jumps.

Wire: [mode:u8][nbits:u8][count:u32le][ref:nbits/8 LE]
      FOR:        [width:u8][bitpacked (v - ref), count values]
      FOR+delta:  [lo:nbits/8 LE][width:u8][bitpacked (delta - lo), count-1]
All arithmetic is modular in the value width (uint32/uint64 views), matching
the wraparound discipline of the delta codec.
"""

from __future__ import annotations

import numpy as np

from . import bitpack

MODE_FOR = 0
MODE_FOR_DELTA = 1


def _dtypes(nbits: int):
    return (np.int32, np.uint32) if nbits == 32 else (np.int64, np.uint64)


def encode(values: np.ndarray, nbits: int, mode: int = MODE_FOR) -> bytes:
    sdt, udt = _dtypes(nbits)
    v = np.ascontiguousarray(values, dtype=sdt)
    u = v.view(udt)
    n = len(v)
    mask = (1 << nbits) - 1
    vb = nbits // 8
    head = bytes([mode, nbits]) + n.to_bytes(4, "little")
    if n == 0:
        return head + b"\x00" * vb + (b"\x00" * vb if mode == MODE_FOR_DELTA else b"") + b"\x00"
    if mode == MODE_FOR_DELTA:
        ref = int(v[0])
        if n > 1:
            deltas = (u[1:] - u[:-1]).view(sdt)
            lo = int(deltas.min())
            resid = (deltas.view(udt) - np.array(lo & mask, dtype=udt)).astype(np.uint64)
            width = int(resid.max()).bit_length()
        else:
            lo, resid, width = 0, np.empty(0, dtype=np.uint64), 0
        return (
            head
            + (ref & mask).to_bytes(vb, "little")
            + (lo & mask).to_bytes(vb, "little")
            + bytes([width])
            + bitpack.pack(resid, width)
        )
    ref = int(v.min())
    resid = (u - np.array(ref & mask, dtype=udt)).astype(np.uint64)
    width = int(resid.max()).bit_length()
    return head + (ref & mask).to_bytes(vb, "little") + bytes([width]) + bitpack.pack(resid, width)


def decode(data) -> np.ndarray:
    buf = bytes(data)
    mode, nbits = buf[0], buf[1]
    n = int.from_bytes(buf[2:6], "little")
    sdt, udt = _dtypes(nbits)
    vb = nbits // 8
    if n == 0:
        return np.empty(0, dtype=sdt)
    ref = np.array(int.from_bytes(buf[6 : 6 + vb], "little"), dtype=np.uint64).astype(udt)
    pos = 6 + vb
    if mode == MODE_FOR_DELTA:
        lo = np.array(int.from_bytes(buf[pos : pos + vb], "little"), dtype=np.uint64).astype(udt)
        pos += vb
        width = buf[pos]
        resid = bitpack.unpack(buf[pos + 1 :], width, n - 1)
        out = np.empty(n, dtype=udt)
        out[0] = ref
        if n > 1:
            deltas = (resid.astype(udt) + lo).astype(udt)
            np.cumsum(deltas, out=out[1:], dtype=udt)
            out[1:] += out[0]
        return out.view(sdt)
    width = buf[pos]
    resid = bitpack.unpack(buf[pos + 1 :], width, n)
    return (resid.astype(udt) + ref).view(sdt)


def estimate_size(values: np.ndarray, nbits: int) -> tuple[int, int]:
    """(for_bytes, for_delta_bytes) without encoding — for the selector."""
    sdt, udt = _dtypes(nbits)
    v = np.ascontiguousarray(values, dtype=sdt)
    n = len(v)
    vb = nbits // 8
    base = 6 + vb + 1
    if n == 0:
        return base, base + vb
    w_for = (int(v.max()) - int(v.min())).bit_length()
    size_for = base + bitpack.packed_size(n, w_for)
    if n > 1:
        u = v.view(udt)
        d = (u[1:] - u[:-1]).view(sdt)
        w_fd = (int(d.max()) - int(d.min())).bit_length()
    else:
        w_fd = 0
    size_fd = base + vb + bitpack.packed_size(n - 1, w_fd)
    return size_for, size_fd
