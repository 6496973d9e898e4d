"""Process-local scratch-buffer arena.

This sandbox (and cold cloud VMs generally) pays heavily for fresh large
allocations: first-touch page faults + kernel zeroing make a cold 10 MB numpy
temp ~20x slower than a warm one (measured in BENCH/BASELINE.md notes). Encode
actors process many same-shaped batches, so the hot kernels draw their big
temporaries from this arena instead of np.empty — one warm buffer per
power-of-two size class, reused across batches.

Single-threaded use only (Ray actors / tasks are single-threaded); callers
must finish with a buffer before requesting the next batch's.
"""

from __future__ import annotations

import numpy as np

_POOL: dict[int, np.ndarray] = {}
_MAX_CLASSES = 8
_MAX_BYTES = 1 << 30


def scratch(nbytes: int) -> np.ndarray:
    """A uint8 scratch array of at least ``nbytes`` (warm if same class reused)."""
    if nbytes > _MAX_BYTES:
        return np.empty(nbytes, dtype=np.uint8)
    cls = 1 << max(int(nbytes - 1).bit_length(), 12)
    buf = _POOL.get(cls)
    if buf is None:
        if len(_POOL) >= _MAX_CLASSES:
            _POOL.pop(next(iter(_POOL)))
        buf = np.empty(cls, dtype=np.uint8)
        _POOL[cls] = buf
    return buf[:nbytes]


def scratch_view(count: int, dtype) -> np.ndarray:
    dt = np.dtype(dtype)
    return scratch(count * dt.itemsize).view(dt)[:count]
