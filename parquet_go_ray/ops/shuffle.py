"""Deterministic global shuffle for training-data ordering.

A reproducible, seed-keyed permutation of the corpus — the "shuffle the
training set" step — expressed as a distributed counting sort so the global
order comes out exact without a full all-to-all sort of corpus bytes:

  pass 1  streaming histogram of the shuffle keys into ``num_buckets``
          ranges (vectorized, no shuffle);
  driver  exclusive prefix over the bucket counts (num_buckets ints);
  pass 2  one hash shuffle keyed by bucket; inside each bucket group the
          rows sort locally by key and take
          ``rank = bucket_offset + local position``.

The shuffle key is the Knuth multiplicative hash ``(id + seed) * 2654435761
mod 2^32`` — a BIJECTION on 32-bit ids (odd multiplier), so ranks are unique
without tie-breaking for id spaces < 2^32; ties on larger id spaces break by
id, which both sides of the oracle specify identically. Changing ``seed``
gives an independent permutation; re-running gives the identical one.

Only (id, key) pairs move through the one shuffle — never document bodies;
callers re-attach content by id (broadcast join / zipped write) or pass the
full table through when the corpus itself is being rewritten in shuffle
order (inherent cost of a physical shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_MOD = np.uint64(1 << 32)


def _shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    return ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD


def _key_ints(col) -> np.ndarray:
    """Per-row int64 key material from the id column.

    Integer ids pass through unchanged (the permutation for integer ids is
    pinned by the SQL oracle — do not re-route them through a hash); string
    and binary ids are hashed with the engine's stable FNV-style hash. Null
    ids have no defined position in a permutation and the rank tie-break
    cannot compare them — raise up front instead of dying mid-lexsort.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError(
            "deterministic_shuffle_rank: id_col contains nulls — shuffle "
            "ids must be non-null (filter or fill them first)")
    if pa.types.is_integer(arr.type):
        return np.asarray(arr)
    if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
            or pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)):
        from ..pipelines.encode import _stable_hash

        return _stable_hash(arr)
    raise ValueError(
        f"deterministic_shuffle_rank: unsupported id_col type {arr.type} — "
        f"use an integer or string/binary id column")


def deterministic_shuffle_rank(ds, *, id_col: str = "doc_id", seed: int = 0,
                               num_buckets: int = 4096,
                               num_partitions: int = 64):
    """Append ``shuffle_pos`` — the row's position in the seed-keyed global
    permutation — to every row of ``ds`` (id and any other columns pass
    through the bucket shuffle).

    The input executes ONCE (materialized into the spillable object store)
    because both the histogram pass and the tagged shuffle consume it —
    without this, any upstream lineage (reads, hashing, filters) runs
    twice."""
    import ray

    ds = ds.materialize()
    # Tiny-block inputs make BOTH passes scheduling-bound, not compute-bound
    # (narrow (id, key) projections of a sharded read arrive as hundreds of
    # sub-MB blocks: 224 blocks of 285 KB measured 4.4 s histogram + 5.4 s
    # exchange; re-blocked to 32 they measure 0.7 + 1.0 s). Re-block toward
    # ~32 MB only when the block count is far past the size-derived target,
    # so a well-sized web-scale input never pays the extra exchange.
    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    target_blocks = max(ncpu, (ds.size_bytes() or 0) // (32 << 20) + 1)
    if ds.num_blocks() > 4 * target_blocks:
        ds = ds.repartition(target_blocks).materialize()

    def histogram(t: pa.Table) -> pa.Table:
        keys = _shuffle_key(_key_ints(t.column(id_col)), seed)
        bucket = (keys * np.uint64(num_buckets)) >> np.uint64(32)
        counts = np.bincount(bucket.astype(np.int64), minlength=num_buckets)
        nz = np.flatnonzero(counts)  # sparse: rows ∝ data, not buckets×blocks
        return pa.table({"bucket": pa.array(nz), "n": pa.array(counts[nz])})

    totals = np.zeros(num_buckets, dtype=np.int64)
    for b in (ds.map_batches(histogram, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow")):
        # np.add.at, NOT totals[idx] += n: iter_batches coalesces histogram
        # rows from several blocks into one batch, and fancy-index += applies
        # only ONE update per duplicated bucket id — bucket totals undercount,
        # offsets shrink, and ranks collide (measured: 20k rows yielded only
        # ~10k distinct shuffle_pos at num_buckets=128)
        np.add.at(totals, np.asarray(b.column("bucket")),
                  np.asarray(b.column("n")))
    offsets = np.zeros(num_buckets, dtype=np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])
    ref = ray.put(offsets)
    # the histogram already counted every row — size the shuffle to the data
    # (~64k rows per partition) instead of paying a fixed 64-way sort-shuffle
    # cost on small inputs
    num_partitions = min(num_partitions,
                         max(1, int(totals.sum()) // 65536 + 1))

    def tag(t: pa.Table) -> pa.Table:
        keys = _shuffle_key(_key_ints(t.column(id_col)), seed)
        bucket = (keys * np.uint64(num_buckets)) >> np.uint64(32)
        return (t.append_column("__key", pa.array(keys.view(np.int64)))
                .append_column("__bucket", pa.array(bucket.astype(np.int64)))
                .append_column("__p", pa.array(
                    bucket.astype(np.int64) % num_partitions)))

    def rank(t: pa.Table) -> pa.Table:
        # ONE lexsort over the whole partition group, then segmented
        # positions per bucket — no per-bucket Python loop (a partition
        # holds up to num_buckets/num_partitions buckets; the loop was
        # a pandas sort_values + concat per bucket).
        offs = ray.get(ref)
        b = np.asarray(t.column("__bucket"))
        k = np.asarray(t.column("__key"))
        ids = np.asarray(t.column(id_col))
        order = np.lexsort((ids, k, b))  # ties (id spaces >= 2^32) break by id
        sb = b[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        seg_len = np.diff(np.r_[starts, len(sb)])
        within = (np.arange(len(sb), dtype=np.int64)
                  - np.repeat(starts.astype(np.int64), seg_len))
        pos = np.empty(len(sb), dtype=np.int64)
        pos[order] = offs[sb] + within  # scatter back to input row order
        return (t.drop_columns(["__key", "__bucket", "__p"])
                .append_column("shuffle_pos", pa.array(pos)))

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__p").map_groups(rank, batch_format="pyarrow"))
