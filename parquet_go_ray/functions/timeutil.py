"""Time conveniences: floor/time-of-day arithmetic and epoch-unit guessing.

Role of the reference's ``floor`` package (/root/reference/floor/, the
``floor.Time`` convenience type) and the INT96 epoch-unit helpers — vectorized
over numpy int64 arrays / arrow timestamp columns instead of per-value
methods.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_UNIT_NS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "minute": 60_000_000_000,
    "hour": 3_600_000_000_000,
    "day": 86_400_000_000_000,
}


def floor_timestamp(arr, unit: str):
    """Truncate timestamps down to the given unit boundary (floor division —
    correct for pre-epoch values too). Accepts an arrow timestamp array or an
    int64 ns numpy array; returns the same kind."""
    step = np.int64(_UNIT_NS[unit])
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        t = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        unit_in = t.type.unit
        ns = np.asarray(t.cast(pa.timestamp("ns")).view(pa.int64()), dtype=np.int64)
        out = (ns // step) * step
        return pa.array(out).view(pa.timestamp("ns")).cast(pa.timestamp(unit_in))
    v = np.asarray(arr, dtype=np.int64)
    return (v // step) * step


def time_of_day_ns(arr) -> np.ndarray:
    """Nanoseconds since local midnight (UTC days), always in [0, 86400e9)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        t = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        v = np.asarray(t.cast(pa.timestamp("ns")).view(pa.int64()), dtype=np.int64)
    else:
        v = np.asarray(arr, dtype=np.int64)
    day = np.int64(_UNIT_NS["day"])
    return v - (v // day) * day


def guess_epoch_unit(values: np.ndarray) -> str:
    """Guess the epoch unit of raw integer timestamps by magnitude: the unit
    whose median lands within 1970..2200. Ambiguity resolves to the coarser
    unit (the reference's INT96 ingestion convenience)."""
    v = np.asarray(values, dtype=np.int64)
    v = v[v != 0]
    if not len(v):
        return "s"
    med = float(np.median(np.abs(v)))
    # seconds for year 2200 ~ 7.3e9
    for unit, per in (("s", 1), ("ms", 1_000), ("us", 1_000_000), ("ns", 1_000_000_000)):
        if med < 7.3e9 * per:
            return unit
    return "ns"


def parse_byte_size(text: str) -> int:
    """Human byte sizes: "128MB", "1.5GiB", "64k", "1024". Decimal suffixes
    are powers of 1000, binary (KiB/MiB/...) powers of 1024 — but the bare
    single-letter forms follow the reference CLI's binary convention."""
    s = str(text).strip()
    units = {
        "": 1,
        "b": 1,
        "k": 1 << 10, "kb": 1000, "kib": 1 << 10,
        "m": 1 << 20, "mb": 1000**2, "mib": 1 << 20,
        "g": 1 << 30, "gb": 1000**3, "gib": 1 << 30,
        "t": 1 << 40, "tb": 1000**4, "tib": 1 << 40,
    }
    i = len(s)
    while i > 0 and not (s[i - 1].isdigit() or s[i - 1] == "."):
        i -= 1
    num, suffix = s[:i].strip(), s[i:].strip().lower()
    if suffix not in units or not num:
        raise ValueError(f"unparseable byte size: {text!r}")
    return int(float(num) * units[suffix])
