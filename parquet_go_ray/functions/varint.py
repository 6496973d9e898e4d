"""ULEB128 varints and zigzag, mirroring the semantics of the reference's
helpers (/root/reference/helpers.go:151-207) without its byte-at-a-time I/O.

Used only for stream headers (hybrid run headers, delta-binary-packed block
headers) — a handful per page, so scalar Python here is not on the hot path.
"""

from __future__ import annotations



def write_uvarint(value: int) -> bytes:
    out = bytearray()
    v = int(value)
    if v < 0:
        raise ValueError("uvarint must be non-negative")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(data, pos: int) -> tuple[int, int]:
    """Read a uvarint from data at pos; returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("uvarint too long")


def zigzag(value: int) -> int:
    v = int(value)
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def unzigzag(u: int) -> int:
    return (u >> 1) if not (u & 1) else -((u + 1) >> 1)


def write_varint(value: int) -> bytes:
    """Zigzag-encoded uvarint (signed values)."""
    return write_uvarint(zigzag(value))


def read_varint(data, pos: int) -> tuple[int, int]:
    u, pos = read_uvarint(data, pos)
    return unzigzag(u), pos
