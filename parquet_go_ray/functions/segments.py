"""Shared ragged-segment index arithmetic.

The "segmented arange" idiom — positions [0..l0), [0..l1), ... concatenated,
or equivalently gather indices for ragged slices — appears in every ragged
kernel in this repo (DELTA_BYTE_ARRAY suffix scatter, n-gram pair gathers,
token-sequence fragment splits, dictionary byte gathers). One definition
here keeps the off-by-one-prone parts in a single place.
"""

from __future__ import annotations

import numpy as np


def exclusive_cumsum(lengths: np.ndarray) -> np.ndarray:
    """[0, l0, l0+l1, ...] — segment start offsets (len(lengths) entries)."""
    starts = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    return starts


def segment_positions(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — intra-segment positions."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if not total:
        return np.empty(0, dtype=np.int64)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(exclusive_cumsum(lengths), lengths))


def ragged_gather_indices(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat indices for gathering the ragged slices
    ``[starts[i], starts[i]+lengths[i])`` back to back."""
    lengths = np.asarray(lengths, dtype=np.int64)
    return np.repeat(np.asarray(starts, dtype=np.int64),
                     lengths) + segment_positions(lengths)
