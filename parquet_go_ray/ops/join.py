"""Broadcast (map-side) join: small side shipped once, probed per batch.

The reference has no joins at all (SURVEY.md §2.6); at 100 TB the only sane
join against a small dimension table is a broadcast: ``ray.put`` the build
side ONCE, every map task reads it from the object store (never re-shipped
per batch) and probes it with one vectorized ``pyarrow.compute.index_in``
per batch — no shuffle of the big side, ever.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(ds, small: pa.Table, on: str, *, right_on: str | None = None,
                   how: str = "inner", suffix: str = ""):
    """Join a Dataset (probe side) against an in-memory small Table (build
    side) on ``on`` (probe) == ``right_on`` (build, defaults to ``on``).

    ``how``: "inner" drops unmatched probe rows; "left" keeps them with null
    build columns. Build-side key must be unique (dimension-table semantics);
    duplicate keys keep the first occurrence.
    """
    import ray

    right_on = right_on or on
    small = small.combine_chunks()
    small_ref = ray.put(small)

    def probe(batch: pa.Table) -> pa.Table:
        build = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        idx = pc.index_in(batch.column(on), value_set=build.column(right_on).combine_chunks())
        if how == "inner":
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for name in build.column_names:
            if name == right_on:
                continue
            out_name = name + suffix if name in batch.column_names else name
            batch = batch.append_column(out_name, build.column(name).combine_chunks().take(idx))
        return batch

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
