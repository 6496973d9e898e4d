"""Width-parametric LSB-first bit-packing kernel.

One vectorized numpy kernel replaces the ~4.6k LoC of generated Go pack/unpack
functions in the reference (generator /root/reference/bitpack_gen.go:139-165,
tables bitbacking32.go / bitpacking64.go): values are packed value-major,
LSB-first within each byte — the bit order of Parquet's RLE/bit-packed hybrid
runs (/root/reference/hybrid_encoder.go:55-70 packs 8-value groups the same
way).

Performance note: numpy uint64 broadcast shifts are ~70x slower than uint32
ops, so the kernel works in the smallest unsigned dtype that holds the width
and builds the bit matrix with one vectorized pass per bit (w passes of
cheap ops beat one pass of catastrophically slow uint64 broadcasting).

Widths 0..64 supported. ``pack`` pads the value count up to a multiple of 8
(callers that need exact framing track the true count separately, as the
reference does with its run headers).
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Bits needed for max_value (0 -> 0), like Go's bits.Len64."""
    return int(max_value).bit_length()


def _work_dtype(width: int):
    if width <= 8:
        return np.uint8
    if width <= 16:
        return np.uint16
    if width <= 32:
        return np.uint32
    return np.uint64


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` (any unsigned-castable int array) at ``width`` bits.

    Count is padded to a multiple of 8 with zeros; output is
    ``ceil(n/8) * width`` bytes.
    """
    if width == 0 or len(values) == 0:
        return b""
    dt = _work_dtype(width)
    v = np.asarray(values).astype(dt, copy=False)
    n = len(v)
    pad = (-n) % 8
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=dt)])
    if width in (8, 16, 32, 64):
        # byte-aligned: plain little-endian cast, memcpy speed
        adt = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[width]
        return np.ascontiguousarray(v.astype(adt, copy=False)).tobytes()
    if width in (24, 40, 48, 56):
        # byte-aligned but not a native dtype: slice the LE byte planes
        nb = width // 8
        if width == 24 and v.dtype.itemsize == 4:
            # low 3 LE bytes of a uint32 == low 3 LE bytes of the widened
            # uint64 — skip the 2x widening copy (ALP_RD right streams)
            src = np.ascontiguousarray(v).view(np.uint8).reshape(-1, 4)
            return np.ascontiguousarray(src[:, :3]).tobytes()
        src = np.ascontiguousarray(v.astype(np.uint64, copy=False)).view(np.uint8).reshape(-1, 8)
        return np.ascontiguousarray(src[:, :nb]).tobytes()
    if width > 16:
        # Byte-lane group kernel: 8 values occupy EXACTLY width bytes, and
        # value j's in-group (byte offset, bit shift) is fixed — so 8 passes
        # of uint64 shift + byte-plane OR build the stream regardless of
        # width, vs the bit matrix's O(width) passes. Byte-identical output
        # (pinned against the matrix path over widths 1..64); crossover
        # measured at ~w=20 for pack (5x at w=53).
        V = v.astype(np.uint64, copy=False).reshape(-1, 8)
        ng = len(V)
        out = np.zeros((ng, width + 9), dtype=np.uint8)  # +9: shift slack
        for j in range(8):
            s = (j * width) & 7
            off = (j * width) >> 3
            col = V[:, j]
            lo = (col << np.uint64(s)) if s else col
            out[:, off:off + 8] |= np.ascontiguousarray(lo).view(np.uint8).reshape(ng, 8)
            if s and width + s > 64:
                out[:, off + 8] |= (col >> np.uint64(64 - s)).astype(np.uint8)
        return out[:, :width].tobytes()
    # Chunked: the bit matrix is n x width BYTES (16x the input at width 16),
    # so building it whole thrashes cold pages on big arrays. 64k-value chunks
    # keep the matrix L2-resident (<= 4 MB) — measured ~5x on 50M values.
    from .arena import scratch

    total = len(v) * width // 8
    out = np.empty(total, dtype=np.uint8)
    CHUNK = 1 << 16  # multiple of 8
    one = dt(1)
    pos = 0
    for lo in range(0, len(v), CHUNK):
        part = v[lo : lo + CHUNK]
        bits = scratch(len(part) * width).reshape(len(part), width)
        for j in range(width):
            np.bitwise_and(part >> dt(j), one, out=bits[:, j], casting="unsafe")
        packed = np.packbits(bits.ravel(), bitorder="little")
        out[pos : pos + len(packed)] = packed
        pos += len(packed)
    return out.tobytes()


def unpack(data: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns exactly ``count`` uint64 values."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    padded = count + ((-count) % 8)
    nbytes = padded * width // 8
    if len(raw) < nbytes:
        raise ValueError(f"bitpack: need {nbytes} bytes for {count}x{width}b, got {len(raw)}")
    if width in (8, 16, 32, 64):
        adt = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[width]
        return np.frombuffer(raw, dtype=adt, count=padded)[:count].astype(np.uint64)
    if width in (24, 40, 48, 56):
        nb = width // 8
        full = np.zeros((padded, 8), dtype=np.uint8)
        full[:, :nb] = raw[:nbytes].reshape(padded, nb)
        return full.reshape(-1).view(np.uint64)[:count].copy()
    if width > 8:
        # byte-lane group kernel (see pack): 8 unaligned-uint64 gathers +
        # shifts instead of O(width) bit-matrix passes; crossover ~w=12,
        # 15x at w=53
        ng = padded // 8
        buf = np.zeros((ng, width + 9), dtype=np.uint8)
        buf[:, :width] = raw[:nbytes].reshape(ng, width)
        out = np.empty((ng, 8), dtype=np.uint64)
        mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(2 ** 64 - 1)
        for j in range(8):
            s = (j * width) & 7
            off = (j * width) >> 3
            u = np.ascontiguousarray(buf[:, off:off + 8]).view(np.uint64).reshape(ng)
            val = (u >> np.uint64(s)) if s else u.copy()
            if s and width + s > 64:
                val |= buf[:, off + 8].astype(np.uint64) << np.uint64(64 - s)
            out[:, j] = val & mask
        return out.reshape(-1)[:count]
    dt = _work_dtype(width)
    out = np.empty(padded, dtype=dt)
    CHUNK = 1 << 16  # values per chunk; bit matrix stays cache-resident
    bytes_per = CHUNK * width // 8
    for lo in range(0, padded, CHUNK):
        nvals = min(CHUNK, padded - lo)
        seg = raw[lo * width // 8 : lo * width // 8 + nvals * width // 8]
        bits = np.unpackbits(seg, bitorder="little", count=nvals * width).reshape(nvals, width)
        acc = out[lo : lo + nvals]
        acc[:] = bits[:, 0]
        for j in range(1, width):
            acc |= bits[:, j].astype(dt) << dt(j)
    return out[:count].astype(np.uint64)


def packed_size(count: int, width: int) -> int:
    return (count + ((-count) % 8)) * width // 8
