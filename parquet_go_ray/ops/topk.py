"""Distributed top-k / head without a full sort.

The reference's ``parquet-tool head`` reads the first n rows and stops
(/root/reference/cmd/parquet-tool/cmds/head.go); a keyed head is a top-k. A
full ``ds.sort(key).limit(k)`` is an all-to-all exchange of the whole table —
at 100 TB that shuffles everything to produce 10 rows. Instead: each block
keeps its local top-k (one vectorized ``pyarrow.compute.select_k_unstable``
call), then the driver merges nblocks x k rows (tiny).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def head_by_key(ds, key: str, k: int, *, ascending: bool = True) -> pa.Table:
    """Top-k rows of ``ds`` by ``key``. Returns an in-memory Table (k rows).

    Ties are broken arbitrarily (same as SQL ``ORDER BY key LIMIT k`` without
    a tiebreaker).
    """
    order = "ascending" if ascending else "descending"

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(batch, k, [(key, order)])
        return batch.take(idx)

    candidates = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    # nblocks x k rows stream back to the driver — bounded, not the table.
    parts = list(candidates.iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.table({})  # empty input dataset
    merged = pa.concat_tables(parts)
    if merged.num_rows > k:
        merged = merged.take(pc.select_k_unstable(merged, k, [(key, order)]))
    return merged.sort_by([(key, order)])


def _group_topk_kernel(t: pa.Table, group_col: str, sort_keys, k: int) -> pa.Table:
    """Keep the first k rows of each group after sorting by
    (group, *sort_keys): one vectorized sort + run-length rank mask."""
    import numpy as np

    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(t, [(group_col, "ascending")] + list(sort_keys))
    t = t.take(idx)
    g = t.column(group_col).combine_chunks()
    # sorted by group value -> equal values (and the null run) are contiguous;
    # dictionary codes inherit that, with nulls mapped to their own id
    codes = np.asarray(g.dictionary_encode().indices.fill_null(-1), dtype=np.int64)
    changed = np.r_[True, codes[1:] != codes[:-1]]
    starts = np.flatnonzero(changed)
    lens = np.diff(np.r_[starts, len(codes)])
    rank = np.arange(len(codes)) - np.repeat(starts, lens)
    return t.filter(pa.array(rank < k))


def top_k_per_group(ds, group_col: str, order_col: str, k: int, *,
                    ascending: bool = False, tiebreak: str | None = None):
    """Top-k rows of every group — ``SELECT ... QUALIFY row_number() OVER
    (PARTITION BY group ORDER BY order_col) <= k`` as two Ray Data stages.

    The curation primitive behind "keep the k best documents per domain":
    a full ``sort + window`` is an all-to-all exchange of the whole table;
    here each block first cuts itself to <= k rows per (block, group) with
    one vectorized sort + run-rank mask (the combiner), so the groupby only
    shuffles the surviving candidates — <= k * blocks rows per group, not
    the group. ``tiebreak`` (e.g. the id column, ascending) makes the kept
    set deterministic under ties; without it ties resolve arbitrarily, like
    SQL row_number without a full ORDER BY.
    """
    order = "ascending" if ascending else "descending"
    sort_keys = [(order_col, order)]
    if tiebreak is not None:
        sort_keys.append((tiebreak, "ascending"))

    def _null_fill(t: pa.DataType):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return ""
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return b""
        if pa.types.is_integer(t):
            return 0
        if pa.types.is_floating(t):
            return 0.0
        return None

    def local(batch: pa.Table) -> pa.Table:
        out = _group_topk_kernel(batch, group_col, sort_keys, k)
        # Ray's sort-shuffle groupby cannot compare None against a value, so
        # shuffle on an (is_null, filled) key pair instead: the bool column
        # disambiguates the null group, so the fill value colliding with a
        # real value is harmless (unlike a sentinel)
        col = out.column(group_col).combine_chunks()
        fill = _null_fill(col.type)
        if fill is None and col.null_count:
            raise ValueError(
                f"top_k_per_group: null group keys of type {col.type} are "
                "not supported")
        filled = pc.fill_null(col, fill) if fill is not None else col
        return (out.append_column("__g_null", pc.is_null(col))
                .append_column("__g_key", filled))

    def final(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__g_null", "__g_key"])
        return _group_topk_kernel(g, group_col, sort_keys, k)

    return (ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["__g_null", "__g_key"])
            .map_groups(final, batch_format="pyarrow"))
