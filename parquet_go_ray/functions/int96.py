"""INT96 Julian-day timestamps (legacy Parquet/Impala convention).

Parity with /root/reference/int96_time.go:17-56: an INT96 is 12 bytes LE —
8 bytes nanos-within-day + 4 bytes Julian day number. Vectorized over numpy
arrays; used when ingesting legacy INT96 parquet columns into our engine's
int64-nanosecond timestamps.
"""

from __future__ import annotations

import numpy as np

JULIAN_UNIX_EPOCH = 2440588  # Julian day number of 1970-01-01
NANOS_PER_DAY = 86_400_000_000_000


def int96_to_ns(raw: np.ndarray) -> np.ndarray:
    """(n, 12) uint8 (or flat n*12) INT96 bytes -> int64 epoch nanoseconds."""
    b = np.ascontiguousarray(raw, dtype=np.uint8).reshape(-1, 12)
    nanos = b[:, :8].copy().view("<u8").reshape(-1)
    days = b[:, 8:12].copy().view("<u4").reshape(-1)
    return ((days.astype(np.int64) - JULIAN_UNIX_EPOCH) * NANOS_PER_DAY + nanos.astype(np.int64))


def ns_to_int96(ns: np.ndarray) -> np.ndarray:
    """int64 epoch nanoseconds -> (n, 12) uint8 INT96 bytes."""
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    days = np.floor_divide(ns, NANOS_PER_DAY)
    nanos = ns - days * NANOS_PER_DAY  # always non-negative (floor division)
    out = np.empty((len(ns), 12), dtype=np.uint8)
    out[:, :8] = nanos.astype("<u8").view(np.uint8).reshape(-1, 8)
    out[:, 8:12] = (days + JULIAN_UNIX_EPOCH).astype("<u4").view(np.uint8).reshape(-1, 4)
    return out
