"""Exact substring (duplicated token-span) deduplication.

The token-level exact-substring dedup of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022, arXiv:2107.06499): any token
span of length >= k that occurs more than once corpus-wide is removed from
every occurrence EXCEPT the canonical first one (minimum (doc_id, position)).
The paper builds a suffix array; at Ray scale the equivalent fixed-k
formulation is a rolling-hash k-gram join, which keeps every stage a
vectorized batch kernel:

  pass 1  map_batches: per-batch partial aggregate of k-gram hashes
          (128-bit rolling polynomial hash, one cumsum + two gathers per
          batch) -> (gram, count, min_occurrence_key) partials; one
          hash-partitioned groupby merges them. Only DISTINCT grams move,
          bounded by per-batch gram vocabulary, never corpus length.
  pass 2  map_batches: recompute gram hashes per doc, look up the broadcast
          duplicated-gram table (ray.put once, searchsorted per batch), mark
          every position covered by a NON-canonical duplicated gram via a
          difference array, and rebuild the token lists without them.

The duplicated-gram table (hash pair + canonical key per gram with count
>= 2) broadcasts via ``ray.put``; its size is bounded by the number of
distinct duplicated k-grams, which real corpora keep far below corpus size
(the Lee et al. C4 measurement: ~1 dup span per 10^2..10^3 tokens). A
``max_dup_grams`` guard fail-fasts when that assumption breaks; the scale
escape hatch is the same two-pass shape with the lookup as a gram-partitioned
shuffle join instead of a broadcast (O(total tokens) exchange — the honest
cost of suffix-array dedup too).

Reference parity note: fraugster/parquet-go has no dedup surface; this is
part of the LLM-training-data operator family the engine adds on top
(SURVEY.md §2.9 extension).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Two independent 64-bit polynomial hashes -> 128-bit gram identity.
# Collision probability across G distinct grams ~ G^2 / 2^129.
_P1 = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P1_INV = np.uint64(pow(int(_P1), -1, 1 << 64))
_P2_INV = np.uint64(pow(int(_P2), -1, 1 << 64))
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

_KEY_POS_BITS = 32  # occurrence key = doc_id << 32 | position


def _splitmix(x: np.ndarray, mix: np.uint64) -> np.ndarray:
    h = x + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * mix
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _pow_accumulate(p: np.uint64, n: int) -> np.ndarray:
    """[p^0, p^1, ..., p^(n-1)] mod 2^64."""
    out = np.full(n, p, dtype=np.uint64)
    if n:
        out[0] = np.uint64(1)
    return np.multiply.accumulate(out)


def _gram_hashes_one(x: np.ndarray, k: int, p: np.uint64, p_inv: np.uint64,
                     mix: np.uint64) -> np.ndarray:
    """Position-independent polynomial hash of every k-window of ``x``.

    H(s) = sum_{j<k} mix(x[s+j]) * p_inv^j  * 1   (all mod 2^64)
         = (C[s+k] - C[s]) * p^s  with C = cumsum(mix(x) * p_inv^position),
    one cumsum + one subtraction + one multiply — no per-window loop.
    Windows crossing document boundaries are sliced away by the caller.
    """
    n = len(x)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    h = _splitmix(x, mix)
    pinv_pow = _pow_accumulate(p_inv, n)
    c = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(h * pinv_pow, out=c[1:])
    p_pow = _pow_accumulate(p, n - k + 1)
    return (c[k:] - c[:-k]) * p_pow


def _list_column(t: pa.Table, name: str) -> pa.Array:
    col = t.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks
                   else pa.array([], type=col.type))
    return col


def _doc_grams(t: pa.Table, k: int, tokens_col: str, id_col: str):
    """(g1, g2, start_key, doc_index_of_start, flat, offsets) for one batch."""
    col = _list_column(t, tokens_col)
    flat = np.asarray(col.flatten()).astype(np.int64).view(np.uint64)
    offs = np.asarray(col.offsets, dtype=np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() >= (1 << (63 - _KEY_POS_BITS))):
        raise ValueError(
            "dedup_substrings: doc ids must be in [0, 2^31) to pack the "
            "(doc_id, position) occurrence key into 63 bits")
    g1_all = _gram_hashes_one(flat, k, _P1, _P1_INV, _MIX1)
    g2_all = _gram_hashes_one(flat, k, _P2, _P2_INV, _MIX2)
    # valid starts: position s within a doc with s + k <= doc_len
    from ..functions.segments import ragged_gather_indices

    n_starts = np.maximum(lens - k + 1, 0)
    starts_flat = ragged_gather_indices(offs[:-1][n_starts > 0],
                                        n_starts[n_starts > 0])
    d_idx = np.repeat(np.arange(len(lens)), n_starts)
    pos = starts_flat - offs[:-1][d_idx]
    key = (ids[d_idx].astype(np.uint64) << np.uint64(_KEY_POS_BITS)) | \
        pos.astype(np.uint64)
    return (g1_all[starts_flat], g2_all[starts_flat], key, d_idx, flat, offs)


def _dup_gram_table(ds, *, k: int, tokens_col: str, id_col: str,
                    num_partitions: int, max_dup_grams: int):
    """Distributed (gram -> count, canonical occurrence) for count >= 2.

    Returns (g1, g2, canonical_key) arrays sorted by (g1, g2)."""

    def partials(t: pa.Table) -> pa.Table:
        g1, g2, key, _, _, _ = _doc_grams(t, k, tokens_col, id_col)
        if not len(g1):
            return pa.table({
                "g1": pa.array([], pa.uint64()), "g2": pa.array([], pa.uint64()),
                "c": pa.array([], pa.int64()), "mk": pa.array([], pa.uint64()),
                "__p": pa.array([], pa.int64())})
        # single-key sort on g1 (the r4 kernel was a 3-key lexsort — 1.3x
        # slower): equal (g1,g2) occurrences land adjacent except when two
        # DISTINCT grams collide on g1 (~n^2/2^64 per batch), in which case
        # this emits split partials for the same gram — harmless, because
        # these are PARTIAL aggregates and merge's exact (g1,g2) group_by
        # re-sums counts and re-mins keys downstream
        order = np.argsort(g1, kind="stable")
        g1s, g2s, ks = g1[order], g2[order], key[order]
        new = np.empty(len(g1s), dtype=bool)
        new[0] = True
        np.not_equal(g1s[1:], g1s[:-1], out=new[1:])
        np.logical_or(new[1:], g2s[1:] != g2s[:-1], out=new[1:])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.append(firsts, len(g1s)))
        return pa.table({
            "g1": pa.array(g1s[firsts]),
            "g2": pa.array(g2s[firsts]),
            "c": pa.array(counts.astype(np.int64)),
            "mk": pa.array(np.minimum.reduceat(ks, firsts)),
            "__p": pa.array((g1s[firsts] % np.uint64(num_partitions))
                            .astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["g1", "g2"]).aggregate([("c", "sum"), ("mk", "min")])
        import pyarrow.compute as pc

        g = g.filter(pc.greater_equal(g.column("c_sum"), 2))
        return g.select(["g1", "g2", "mk_min"]).rename_columns(
            ["g1", "g2", "mk"])

    parts = [(np.asarray(b.column("g1")), np.asarray(b.column("g2")),
              np.asarray(b.column("mk")))
             for b in (ds.map_batches(partials, batch_format="pyarrow",
                                      zero_copy_batch=True)
                       .groupby("__p")
                       .map_groups(merge, batch_format="pyarrow")
                       .iter_batches(batch_format="pyarrow"))
             if b.num_rows]
    if not parts:
        z = np.empty(0, dtype=np.uint64)
        return z, z, z
    g1 = np.concatenate([p[0] for p in parts]).astype(np.uint64)
    g2 = np.concatenate([p[1] for p in parts]).astype(np.uint64)
    mk = np.concatenate([p[2] for p in parts]).astype(np.uint64)
    if len(g1) > max_dup_grams:
        raise ValueError(
            f"dedup_substrings: {len(g1)} duplicated grams exceed the "
            f"broadcast cap ({max_dup_grams}); raise max_dup_grams or use "
            "the gram-partitioned join path (see module docstring)")
    order = np.lexsort((g2, g1))
    return g1[order], g2[order], mk[order]


def _lookup_pairs(g1: np.ndarray, g2: np.ndarray, d1: np.ndarray,
                  d2: np.ndarray) -> np.ndarray:
    """Index into the (d1, d2)-lexsorted dup table for each (g1, g2) query;
    -1 where absent. Vectorized searchsorted on d1; the rare d1-tie ranges
    (distinct 128-bit grams colliding in their first 64 bits) fall back to a
    tiny per-tie scan."""
    if not len(d1) or not len(g1):
        return np.full(len(g1), -1, dtype=np.int64)
    idx = np.searchsorted(d1, g1)
    idx_c = np.minimum(idx, len(d1) - 1)
    hit = (d1[idx_c] == g1) & (d2[idx_c] == g2) & (idx < len(d1))
    out = np.where(hit, idx_c, -1)
    # d1 values occurring more than once: resolve by scanning the tie range
    if len(d1) > 1:
        dup_d1 = np.flatnonzero(d1[1:] == d1[:-1])
        if len(dup_d1):
            tied = np.isin(g1, d1[dup_d1]) & (out < 0)
            for i in np.flatnonzero(tied):
                lo = np.searchsorted(d1, g1[i], side="left")
                hi = np.searchsorted(d1, g1[i], side="right")
                for j in range(lo, hi):
                    if d2[j] == g2[i]:
                        out[i] = j
                        break
    return out


def dedup_substrings(ds, *, k: int = 50, tokens_col: str = "tokens",
                     id_col: str = "doc_id", mode: str = "remove",
                     num_partitions: int = 64,
                     max_dup_grams: int = 50_000_000):
    """Remove (or flag) every duplicated token span of length >= ``k``.

    A position is removed when some k-gram covering it occurs elsewhere in
    the corpus AND this occurrence is not the gram's canonical (minimum
    ``(doc_id, position)``) one — so exactly one copy of every duplicated
    substring survives, the first. ``mode="remove"`` rewrites ``tokens``
    (and appends ``n_removed``); ``mode="flag"`` appends ``n_dup_tokens``
    and ``dup_frac`` instead.
    """
    import ray

    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be 'remove' or 'flag', got {mode!r}")
    d1, d2, mk = _dup_gram_table(
        ds, k=k, tokens_col=tokens_col, id_col=id_col,
        num_partitions=num_partitions, max_dup_grams=max_dup_grams)
    ref = ray.put((d1, d2, mk))

    def apply(t: pa.Table) -> pa.Table:
        dd1, dd2, dmk = ray.get(ref)
        g1, g2, key, d_idx, flat, offs = _doc_grams(t, k, tokens_col, id_col)
        lens = np.diff(offs)
        covered = np.zeros(offs[-1] + 1, dtype=np.int64)  # difference array
        if len(g1):
            hit = _lookup_pairs(g1, g2, dd1, dd2)
            bad = (hit >= 0)
            bad[bad] &= dmk[hit[bad]] != key[bad]  # canonical copy survives
            if bad.any():
                s = (offs[:-1][d_idx[bad]]
                     + (key[bad] & np.uint64((1 << _KEY_POS_BITS) - 1))
                     .astype(np.int64))
                np.add.at(covered, s, 1)
                np.add.at(covered, s + k, -1)
        cov = np.cumsum(covered[:-1]) > 0
        if mode == "flag":
            # segment sums via prefix sums: reduceat with clipped indices
            # credited the LAST real doc's final token to a trailing
            # empty-doc slot and undercounted it by one (review r5 batch 5)
            csum = np.zeros(len(cov) + 1, dtype=np.int64)
            np.cumsum(cov, out=csum[1:])
            n_dup = csum[offs[1:]] - csum[offs[:-1]]
            return t.append_column(
                "n_dup_tokens", pa.array(n_dup.astype(np.int64))
            ).append_column(
                "dup_frac", pa.array(
                    n_dup / np.maximum(lens, 1).astype(np.float64)))
        keep = ~cov
        csum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(keep, out=csum[1:])
        new_offs = csum[offs]
        col = _list_column(t, tokens_col)
        vt = col.type.value_type
        kept_vals = flat[keep].view(np.int64).astype(vt.to_pandas_dtype())
        new = pa.ListArray.from_arrays(
            pa.array(new_offs.astype(np.int32)), pa.array(kept_vals, type=vt))
        i = t.schema.get_field_index(tokens_col)
        return t.set_column(i, tokens_col, new).append_column(
            "n_removed", pa.array((lens - np.diff(new_offs)).astype(np.int64)))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
