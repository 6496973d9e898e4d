"""DELTA_BINARY_PACKED for int32/int64 (Parquet spec layout).

Geometry fixed at block=128 deltas, 4 miniblocks of 32 — the reference's
constants (/root/reference/chunk_writer.go:52-58). Stream layout, as the
reference's encoder writes it (/root/reference/deltabp_encoder.go:12-168):

  header    := uvarint(block_size) uvarint(miniblock_count)
               uvarint(total_count) zigzag-varint(first_value)
  per block := zigzag-varint(min_delta) widths:miniblock_count bytes
               miniblock payloads (bitpacked at that miniblock's width;
               miniblocks entirely past the data are width 0 / empty)

Overflow semantics match the reference's deliberate unsigned wraparound
(/root/reference/deltabp_encoder.go:58-61): deltas, min-delta subtraction and
the decode prefix-sum are all modular in the value width. We therefore do all
arithmetic in uint32/uint64 and reinterpret, never in Python ints.

Vectorization: deltas and per-miniblock widths are computed with numpy over the
whole array; bit-packing is grouped by width (<= 65 distinct widths) so each
group is one vectorized pack/unpack call instead of a per-miniblock loop.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import read_uvarint, read_varint, write_uvarint, write_varint

BLOCK = 128
MINIBLOCKS = 4
MB_VALUES = BLOCK // MINIBLOCKS  # 32


def _dtypes(nbits: int):
    return (np.int32, np.uint32) if nbits == 32 else (np.int64, np.uint64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length over uint64 (float log2 rounds values near
    powers of two upward, which once emitted an invalid width of 65 for
    full-range int64 delta spreads — see deltabp_encoder.go:101-123 for the
    reference's exact-shift equivalent)."""
    w = np.zeros(x.shape, dtype=np.uint8)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        w[m] += s
        v[m] >>= np.uint64(s)
    w[x > 0] += 1
    return w


def encode(values: np.ndarray, nbits: int) -> bytes:
    sdt, udt = _dtypes(nbits)
    v = np.ascontiguousarray(values, dtype=sdt)
    n = len(v)
    out = bytearray()
    out += write_uvarint(BLOCK)
    out += write_uvarint(MINIBLOCKS)
    out += write_uvarint(n)
    out += write_varint(int(v[0]) if n else 0)
    if n <= 1:
        return bytes(out)

    u = v.view(udt)
    deltas = (u[1:] - u[:-1]).view(sdt)  # modular subtraction, signed view
    nd = len(deltas)
    nblocks = (nd + BLOCK - 1) // BLOCK
    pad = nblocks * BLOCK - nd

    # Per-block min over real deltas only: pad with +max so padding never wins.
    dpad = np.concatenate([deltas, np.full(pad, np.iinfo(sdt).max, dtype=sdt)])
    blocks = dpad.reshape(nblocks, BLOCK)
    min_deltas = blocks.min(axis=1)

    # adjusted = delta - min_delta, modular, non-negative by construction.
    adj = (blocks.view(udt) - min_deltas.view(udt)[:, None]).astype(np.uint64)
    # Zero out padding so trailing miniblocks get width 0.
    if pad:
        flat = adj.reshape(-1)
        flat[nd:] = 0
        adj = flat.reshape(nblocks, BLOCK)

    mbs = adj.reshape(nblocks * MINIBLOCKS, MB_VALUES)
    mb_max = mbs.max(axis=1)
    widths = _bit_length_u64(mb_max)

    # Group miniblocks by width; one vectorized pack per distinct width.
    payloads: list[bytes | None] = [None] * len(mbs)
    for w in np.unique(widths):
        w = int(w)
        idx = np.flatnonzero(widths == w)
        if w == 0:
            for i in idx:
                payloads[i] = b""
            continue
        packed = bitpack.pack(mbs[idx].reshape(-1), w)
        per = MB_VALUES * w // 8
        for j, i in enumerate(idx):
            payloads[i] = packed[j * per : (j + 1) * per]

    for b in range(nblocks):
        out += write_varint(int(min_deltas[b]))
        out += widths[b * MINIBLOCKS : (b + 1) * MINIBLOCKS].tobytes()
        for m in range(MINIBLOCKS):
            out += payloads[b * MINIBLOCKS + m]
    return bytes(out)


def decode(data, nbits: int) -> np.ndarray:
    values, _ = decode_stream(data, nbits)
    return values


def decode_stream(data, nbits: int, start: int = 0) -> tuple[np.ndarray, int]:
    """Decode one self-delimiting DELTA_BINARY_PACKED stream; returns
    (values, end position) — the spec layout has no length prefix, so readers
    of DELTA_LENGTH/DELTA_BYTE_ARRAY need the consumed length."""
    sdt, udt = _dtypes(nbits)
    buf = bytes(data)
    try:
        block, pos = read_uvarint(buf, start)
        nmb, pos = read_uvarint(buf, pos)
        n, pos = read_uvarint(buf, pos)
        first, pos = read_varint(buf, pos)
    except IndexError as e:
        raise ValueError("delta: truncated stream header") from e
    if nmb == 0 or block % nmb:
        raise ValueError("delta: block size not divisible by miniblock count")
    if block > (1 << 20) or nmb > 512:
        raise ValueError("delta: implausible block geometry")  # malformed guard
    # malformed guard: each block of `block` values costs at least 1 byte of
    # min-delta varint plus nmb width bytes, so a claimed count vastly above
    # the buffer's capacity is garbage — reject before allocating n values
    # (reference fuzz corpus: deltabp_fuzz.go). The bound is derived from the
    # PARSED geometry, not a fixed 128-value assumption: a spec-valid stream
    # with block=2048/nmb=8 of constant values packs >64 values per byte.
    if n > block * (len(buf) - start) // (1 + nmb) + block:
        raise ValueError(f"delta: claimed count {n} exceeds stream capacity")
    mbv = block // nmb
    if mbv == 0 or mbv % 8:
        raise ValueError("delta: miniblock value count must be a positive multiple of 8")
    if n == 0:
        return np.empty(0, dtype=sdt), pos
    if n == 1:
        return np.array([first], dtype=np.int64).astype(sdt), pos

    nd = n - 1
    nblocks = (nd + block - 1) // block
    min_deltas = np.empty(nblocks, dtype=np.int64)
    all_widths = np.empty(nblocks * nmb, dtype=np.uint8)
    spans: list[tuple[int, int]] = []  # (offset, width) per miniblock
    try:
        for b in range(nblocks):
            md, pos = read_varint(buf, pos)
            min_deltas[b] = md
            ws = np.frombuffer(buf, dtype=np.uint8, count=nmb, offset=pos)
            if (ws > 64).any():
                raise ValueError("delta: miniblock bit width > 64")
            all_widths[b * nmb : (b + 1) * nmb] = ws
            pos += nmb
            for w in ws:
                spans.append((pos, int(w)))
                pos += mbv * int(w) // 8
        if pos > len(buf):
            raise ValueError("delta: truncated miniblock payload")
    except IndexError as e:
        raise ValueError("delta: truncated stream") from e

    # Grouped-by-width vectorized unpack.
    adj = np.zeros(nblocks * nmb * mbv, dtype=np.uint64)
    widths_arr = all_widths
    for w in np.unique(widths_arr):
        w = int(w)
        if w == 0:
            continue
        idx = np.flatnonzero(widths_arr == w)
        per = mbv * w // 8
        chunk = b"".join(buf[spans[i][0] : spans[i][0] + per] for i in idx)
        vals = bitpack.unpack(chunk, w, len(idx) * mbv).reshape(len(idx), mbv)
        adj.reshape(-1, mbv)[idx] = vals

    adj = adj.reshape(nblocks, block)
    deltas = (adj.astype(udt) + min_deltas.astype(udt)[:, None]).reshape(-1)[:nd]
    out = np.empty(n, dtype=udt)
    out[0] = np.int64(first).astype(udt)
    np.cumsum(deltas, out=out[1:], dtype=udt)
    out[1:] += out[0]
    return out.view(sdt), pos
