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
