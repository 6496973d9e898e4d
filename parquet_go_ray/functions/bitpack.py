"""Width-parametric LSB-first bit-packing kernel.

One vectorized numpy kernel replaces the ~4.6k LoC of generated Go pack/unpack
functions in the reference (generator /root/reference/bitpack_gen.go:139-165,
tables bitbacking32.go / bitpacking64.go): values are packed value-major,
LSB-first within each byte — the bit order of Parquet's RLE/bit-packed hybrid
runs (/root/reference/hybrid_encoder.go:55-70 packs 8-value groups the same
way).

Widths 0..64 supported. ``pack`` pads the value count up to a multiple of 8
(callers that need exact framing track the true count separately, as the
reference does with its run headers).
"""

from __future__ import annotations

import numpy as np

_SHIFTS = {w: np.arange(w, dtype=np.uint64) for w in range(1, 65)}


def bit_width(max_value: int) -> int:
    """Bits needed for max_value (0 -> 0), like Go's bits.Len64."""
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` (any unsigned-castable int array) at ``width`` bits.

    Count is padded to a multiple of 8 with zeros; output is
    ``ceil(n/8) * width`` bytes.
    """
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    pad = (-n) % 8
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint64)])
    # (n, width) bit matrix, value-major, LSB first -> exact hybrid bit order.
    bits = ((v[:, None] >> _SHIFTS[width]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(data: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns exactly ``count`` uint64 values."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    padded = count + ((-count) % 8)
    nbytes = padded * width // 8
    if len(raw) < nbytes:
        raise ValueError(f"bitpack: need {nbytes} bytes for {count}x{width}b, got {len(raw)}")
    bits = np.unpackbits(raw[:nbytes], bitorder="little", count=padded * width)
    bits = bits.reshape(padded, width).astype(np.uint64)
    vals = (bits << _SHIFTS[width]).sum(axis=1, dtype=np.uint64)
    return vals[:count]


def packed_size(count: int, width: int) -> int:
    return (count + ((-count) % 8)) * width // 8
