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
    if not isinstance(small, pa.Table):
        if hasattr(small, "to_arrow_refs"):  # a (small!) Dataset build side
            small = pa.concat_tables(
                t for t in ray.get(small.to_arrow_refs()) if t.num_rows)
        else:
            raise TypeError(
                f"broadcast_join build side must be a pyarrow.Table (or a "
                f"small Dataset), got {type(small).__name__}")
    small = small.combine_chunks()
    small_ref = ray.put(small)

    def probe(batch: pa.Table) -> pa.Table:
        build = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        idx = pc.index_in(batch.column(on), value_set=build.column(right_on).combine_chunks())
        # SQL join semantics: NULL never equals NULL — index_in would match
        # a null probe key to a null build key, inner-joining rows SQL drops
        # (and attaching that build row's values under how="left")
        idx = pc.if_else(pc.is_null(batch.column(on)),
                         pa.scalar(None, idx.type), idx)
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


def _attach_null_dim(t: pa.Table, dim_t: pa.Table) -> pa.Table:
    """Empty dimension table: every probe row is unmatched — append the dim
    columns as all-null (take() on empty columns would raise instead)."""
    out = t
    for f in dim_t.schema:
        out = out.append_column(f.name, pa.nulls(t.num_rows, f.type))
    return out


def asof_join_broadcast(ds, dim: pa.Table, *, ts_col: str, dim_ts_col: str,
                        by: str | None = None, dim_by: str | None = None):
    """Broadcast AS-OF join: every probe row is matched to the LAST dim row
    whose ``dim_ts_col`` <= its ``ts_col`` (per ``by`` key when given) — the
    event-to-latest-checkpoint / trade-to-quote join.

    Same scale shape as ``broadcast_join``: the dimension table ships ONCE
    via ``ray.put`` (sorted by (key, ts)); each batch does one vectorized
    ``searchsorted`` (per present key when ``by`` is set — the loop is over
    the BROADCAST side's keys, never probe rows). No shuffle, no sort of
    the probe side. Unmatched rows (ts before the first checkpoint) get
    null dim columns. Timestamps and plain numerics both work (everything
    compares as int64)."""
    import numpy as np
    import ray

    dim_by = dim_by or by

    def key_array(t, col):
        """-> (int64 values, validity mask). Nulls become 0 in the value
        array and False in the mask — the previous np.asarray().astype()
        put NaN through an UNDEFINED float->int64 cast (platform-dependent:
        INT64_MIN here, 0 elsewhere — 0 would silently as-of-match a null
        timestamp to a real dim row)."""
        arr = t.column(col) if hasattr(t, "column") else col
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.timestamp("us"))
        elif not pa.types.is_integer(arr.type):
            raise TypeError(
                f"asof_join_broadcast: column {col!r} must be integer or "
                f"timestamp, got {arr.type} (hash string keys to int64 "
                f"first)")
        ok = ~np.asarray(pc.is_null(arr))
        if not ok.all():
            arr = pc.fill_null(arr, pa.scalar(0, arr.type) if not
                               pa.types.is_timestamp(arr.type) else
                               pa.scalar(0, pa.int64()).cast(arr.type))
        if pa.types.is_timestamp(arr.type):
            return np.asarray(arr).view("i8"), ok
        return np.asarray(arr).astype(np.int64), ok

    overlap = set(dim.column_names) & set(ds.schema().names)
    if overlap:
        raise ValueError(f"asof_join_broadcast: overlapping columns {overlap}"
                         " — rename the dim columns first")
    dts, dts_ok = key_array(dim, dim_ts_col)
    if not dts_ok.all():
        raise ValueError(f"asof_join_broadcast: dim column {dim_ts_col!r} "
                         f"contains nulls — a dim row without a timestamp "
                         f"cannot anchor an as-of match")
    if by is None:
        order = np.argsort(dts, kind="stable")
    else:
        dkey, dkey_ok = key_array(dim, dim_by)
        if not dkey_ok.all():
            raise ValueError(f"asof_join_broadcast: dim column {dim_by!r} "
                             f"contains nulls")
        order = np.lexsort((dts, dkey))
    dim_sorted = dim.take(pa.array(order))
    dts_sorted = dts[order]
    if by is not None:
        dkey_sorted = key_array(dim_sorted, dim_by)[0]
    ref = ray.put((dim_sorted, dts_sorted,
                   dkey_sorted if by is not None else None))

    def attach(t: pa.Table) -> pa.Table:
        dim_t, dts_s, dkey_s = ray.get(ref)
        if len(dts_s) == 0:
            return _attach_null_dim(t, dim_t)
        ts, ts_ok = key_array(t, ts_col)
        if by is None:
            idx = np.searchsorted(dts_s, ts, side="right") - 1
        else:
            pk, pk_ok = key_array(t, by)
            ts_ok = ts_ok & pk_ok  # a null by-key matches nothing either
            idx = np.full(len(ts), -1, dtype=np.int64)
            for k in np.unique(pk):  # loop over the small side's key space
                lo = np.searchsorted(dkey_s, k, side="left")
                hi = np.searchsorted(dkey_s, k, side="right")
                if lo == hi:
                    continue
                rows = pk == k
                idx[rows] = lo + np.searchsorted(
                    dts_s[lo:hi], ts[rows], side="right") - 1
                idx[rows & (idx < lo)] = -1
        valid = (idx >= 0) & ts_ok
        take = pa.array(np.where(valid, idx, 0))
        out = t
        vmask = pa.array(valid)
        for c in dim_t.column_names:
            vals = dim_t.column(c).take(take)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if not valid.all():
                vals = pc.if_else(vmask, vals, pa.nulls(len(vals), vals.type))
            out = out.append_column(c, vals)
        return out

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def range_join_broadcast(ds, dim: pa.Table, *, value_col: str, lo_col: str,
                         hi_col: str):
    """Broadcast RANGE join: every probe row matched to the dim interval with
    ``lo <= value <= hi`` — score banding, histogram bucketing, SLA tiers.
    Intervals must be non-overlapping (dimension-table semantics; sorted by
    ``lo`` internally, overlap raises). Same scale shape as the other
    broadcast joins: dim ships once, one vectorized searchsorted + bound
    check per batch, no shuffle. Rows in no interval get null dim columns."""
    import numpy as np
    import ray

    overlap = set(dim.column_names) & set(ds.schema().names)
    if overlap:
        raise ValueError(f"range_join_broadcast: overlapping columns "
                         f"{overlap} — rename the dim columns first")
    # compare in int64 when every side is integral: float64 holds only 53
    # mantissa bits, so int64 values past 2^53 would band into the wrong
    # interval or falsely pass the hi check
    s = ds.schema()  # ray.data Schema: parallel .names / .types lists
    int_exact = all(pa.types.is_integer(typ) for typ in (
        dim.column(lo_col).type, dim.column(hi_col).type,
        s.types[s.names.index(value_col)]))
    cmp_t = np.int64 if int_exact else np.float64
    if dim.column(lo_col).null_count or dim.column(hi_col).null_count:
        raise ValueError("range_join_broadcast: interval bounds must be "
                         "null-free — a null bound defines no interval")
    lo = np.asarray(dim.column(lo_col), dtype=cmp_t)
    hi = np.asarray(dim.column(hi_col), dtype=cmp_t)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    if (hi < lo).any() or (len(lo) > 1 and (lo[1:] <= hi[:-1]).any()):
        raise ValueError("range_join_broadcast: intervals must be valid and "
                         "non-overlapping")
    ref = ray.put((dim.take(pa.array(order)), lo, hi))
    cmp_pa = pa.int64() if int_exact else pa.float64()

    def attach(t: pa.Table) -> pa.Table:
        dim_t, lo_s, hi_s = ray.get(ref)
        if len(lo_s) == 0:
            return _attach_null_dim(t, dim_t)
        varr = t.column(value_col).combine_chunks().cast(cmp_pa)
        # explicit null handling: np.asarray on an int64-with-nulls column
        # silently converts to float64 (NaN) — losing exactness past 2^53,
        # the precise failure the int-exact comparison path exists to avoid
        v_ok = ~np.asarray(pc.is_null(varr))
        if not v_ok.all():
            varr = pc.fill_null(varr, pa.scalar(0, cmp_pa))
        v = np.asarray(varr)
        idx = np.searchsorted(lo_s, v, side="right") - 1
        valid = (idx >= 0) & (v <= hi_s[np.maximum(idx, 0)]) & v_ok
        take = pa.array(np.where(valid, idx, 0))
        vmask = pa.array(valid)
        out = t
        for c in dim_t.column_names:
            vals = dim_t.column(c).take(take)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if not valid.all():
                vals = pc.if_else(vmask, vals, pa.nulls(len(vals), vals.type))
            out = out.append_column(c, vals)
        return out

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(left, right, on: str, *, right_on: str | None = None,
              how: str = "inner", num_partitions: int | None = None,
              broadcast_bytes_cap: int = 256 << 20, method: str = "auto"):
    """General distributed equi-join of two Datasets.

    Routing (``method="auto"``): a build side fitting
    ``broadcast_bytes_cap`` gathers once and runs the zero-shuffle
    ``broadcast_join`` — the dominant case in star-schema pipelines; a
    genuinely large-large join falls through to Ray Data's native
    hash-shuffle join (both sides partitioned on the key across
    ``num_partitions`` aggregators). ``method="shuffle"`` /
    ``method="broadcast"`` force a path.

    ``how``: "inner" or "left" (left outer). The broadcast path requires
    unique build keys (dimension semantics) — ``method="auto"`` checks the
    gathered build side and falls through to the shuffle join when keys
    repeat, so duplicate-key multiplicity is never silently dropped;
    ``method="broadcast"`` forces first-match-per-key dimension semantics.
    """
    import pyarrow.compute as pc
    import ray

    right_on = right_on or on
    if method not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown method {method!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r} (inner or left)")
    if num_partitions is None:
        # Ray's hash-shuffle join schedules num_partitions aggregator
        # actors; requesting more than the cluster's CPUs deadlocks a small
        # cluster (reproduced at 64 partitions on 4 CPUs)
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(64, cpus))
    if isinstance(right, pa.Table):
        return broadcast_join(left, right, on, right_on=right_on, how=how)
    if method != "shuffle":
        right = right.materialize()
        if method == "broadcast" or right.size_bytes() <= broadcast_bytes_cap:
            batches = list(right.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
            if batches:
                tbl = pa.concat_tables(batches)
            else:
                sch = right.schema()
                tbl = pa.schema(list(zip(sch.names, sch.types))).empty_table()
            unique_keys = (tbl.num_rows
                           == pc.count_distinct(tbl.column(right_on)).as_py()
                           if tbl.num_rows else True)
            if method == "broadcast" or unique_keys:
                return broadcast_join(left, tbl, on, right_on=right_on, how=how)
            # duplicate build keys: only the shuffle join preserves
            # multiplicity — fall through
    join_type = {"inner": "inner", "left": "left_outer"}[how]
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=(on,), right_on=(right_on,))
