"""Windowed aggregates over an event stream table.

Ray Data has no event-time windows (ray_guide: streaming-shaped workloads);
tumbling windows are expressed as group-bys on a derived bucket column. The
batch pre-aggregation pattern applies: each map_batches emits one partial row
per (key, bucket) per batch, so the groupby shuffles partials, not events —
the combiner structure a 100 TB stream needs.

Ordering assumption: none — tumbling buckets are order-independent; the
aggregates used (count/min/max) are exact under any merge order (float sums
are deliberately avoided in the oracle-checked surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_to_us(ts) -> pa.ChunkedArray:
    """Epoch-microsecond int64 from a timestamp column of ANY unit (or an
    already-integer column, passed through). A plain ``.cast(timestamp[us])``
    is a SAFE cast that raises 'would lose data' on any ns value not
    microsecond-aligned — i.e. on virtually every real timestamp[ns] column;
    here ns floors by integer division instead (Arrow ``divide`` truncates
    toward zero; pre-epoch ns values land one us late — documented, exact
    for the post-1970 domain). Nulls stay null."""
    if pa.types.is_timestamp(ts.type):
        unit = ts.type.unit
        raw = pc.cast(ts, pa.int64())
        if unit == "s":
            return pc.multiply_checked(raw, 1_000_000)
        if unit == "ms":
            return pc.multiply_checked(raw, 1_000)
        if unit == "ns":
            return pc.divide(raw, 1_000)
        return raw
    return pc.cast(ts, pa.int64())


def _drop_null_ts(batch: pa.Table, us) -> tuple[pa.Table, pa.ChunkedArray]:
    """A null timestamp belongs to no window (SQL GROUP BY on the derived
    bucket would keep a null group; converting through numpy would
    silently turn it into INT64_MIN garbage — the one thing it must never
    be). Drop those rows up front, consistently across all window shapes."""
    if us.null_count:
        mask = pc.is_valid(us)
        return batch.filter(mask), pc.drop_null(us)
    return batch, us


def tumbling_window(ds, *, key: str = "user_id", ts_col: str = "ts", value_col: str = "value",
                    width_us: int = 3_600_000_000):
    """(key, bucket, n_events, min_value, max_value) per tumbling window."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        epoch = _ts_to_us(batch.column(ts_col))
        batch, epoch = _drop_null_ts(batch, epoch)
        bucket = pc.cast(pc.floor(pc.divide(epoch, float(width_us))), pa.int64())
        t = pa.table(
            {
                key: batch.column(key),
                "bucket": bucket,
                "value": batch.column(value_col),
            }
        )
        # per-batch combine: one row per (key, bucket). n counts EVENTS
        # (mode="all") — the default only_valid mode would silently exclude
        # null-value rows, disagreeing with session_windows on the same data
        g = t.group_by([key, "bucket"]).aggregate(
            [("value", "count", pc.CountOptions(mode="all")),
             ("value", "min"), ("value", "max")]
        )
        return g.rename_columns([key, "bucket", "n_partial", "min_partial", "max_partial"])

    partial_ds = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_ds.groupby([key, "bucket"]).aggregate(
        Sum("n_partial", alias_name="n_events"),
        Min("min_partial", alias_name="min_value"),
        Max("max_partial", alias_name="max_value"),
    )
    return out


def session_windows(ds, *, key: str = "user_id", ts_col: str = "ts", gap_us: int = 600_000_000,
                    num_buckets: int | None = None):
    """Sessionization: per key, events sorted by time split where the gap to
    the previous event exceeds ``gap_us``. Returns one row per session:
    (key, session_id, n_events, start_us, end_us) with session_id = the
    0-based session index per key.

    Shuffle pattern: ONE groupby on a hash BUCKET of the key (not the key
    itself), so the per-group body runs once per bucket — a few per CPU —
    never once per key. Inside a bucket everything is vectorized across all
    its keys at once: one (key, ts) sort, one diff for gap breaks, one
    cumsum chain for per-key session numbering, one flatnonzero gather for
    the per-session aggregates. At web scale (hundreds of millions of keys)
    a per-key ``map_groups`` pays a Python call + pandas frame per key; the
    bucket shape pays B ≈ 4×CPU calls total at the identical shuffle cost.
    A bucket must fit in a task's heap (rows/B × ~16 B); scale
    ``num_buckets`` with the event count, not the key count. Skew bound:
    one bucket holds every event of its keys — same bound as any
    key-partitioned sessionizer; a single pathological key dominates its
    bucket either way. Session ids are deterministic (time order within
    key; ties in ts don't affect session aggregates)."""
    import pandas as pd

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "__us"], kind="stable")
        k = g[key].to_numpy()
        us = g["__us"].to_numpy()
        n = len(g)
        if n == 0:  # schema-inference probe blocks
            return pd.DataFrame({key: k, "session_id": us, "n_events": us,
                                 "start_us": us, "end_us": us})
        key_change = np.empty(n, dtype=bool)
        key_change[0] = True
        key_change[1:] = k[1:] != k[:-1]
        new_sess = key_change.copy()
        new_sess[1:] |= (us[1:] - us[:-1]) > gap_us
        sess_idx = np.cumsum(new_sess) - 1          # session ordinal within bucket
        key_ord = np.cumsum(key_change) - 1         # key ordinal within bucket
        session_id = sess_idx - sess_idx[key_change][key_ord]  # 0-based per key
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n]
        return pd.DataFrame({
            key: k[starts],
            "session_id": session_id[starts],
            "n_events": (ends - starts).astype(np.int64),
            "start_us": us[starts],
            "end_us": us[ends - 1],
        })

    def add_us(batch: pa.Table) -> pa.Table:
        from ..pipelines.encode import _stable_hash

        us = _ts_to_us(batch.column(ts_col))
        batch, us = _drop_null_ts(batch, us)
        bucket = _stable_hash(batch.column(key)) % np.int64(nb)
        return pa.table(
            {
                key: batch.column(key),
                "__us": us,
                "__bucket": pa.array(bucket),
            }
        )

    if num_buckets is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        nb = max(32, 4 * ncpu)
    else:
        nb = max(1, int(num_buckets))

    return (
        ds.map_batches(add_us, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def hopping_window(ds, *, key: str = "user_id", ts_col: str = "ts", value_col: str = "value",
                   size_us: int = 3_600_000_000, hop_us: int = 1_800_000_000):
    """Hopping (sliding) windows: window w covers [w*hop, w*hop + size); each
    event lands in size/hop windows. Same partial-agg combiner as tumbling:
    the per-batch fan-out emits one partial row per (key, window) per batch,
    so the shuffle still moves partials, not size/hop copies of the events.

    Returns (key, win_start, n_events, min_value, max_value); ``win_start``
    in epoch microseconds.
    """
    from ray.data.aggregate import Max, Min, Sum

    if size_us % hop_us:
        raise ValueError("hopping_window: size must be a multiple of hop")
    fanout = size_us // hop_us

    def partials(batch: pa.Table) -> pa.Table:
        us = _ts_to_us(batch.column(ts_col))
        batch, us = _drop_null_ts(batch, us)
        epoch = np.asarray(us, dtype=np.int64)
        base = np.floor_divide(epoch, hop_us)
        n = len(epoch)
        wins = (np.repeat(base, fanout)
                - np.tile(np.arange(fanout, dtype=np.int64), n)) * hop_us
        # fan out key/value via Arrow take (null-preserving: a numpy
        # round-trip would turn null values into NaN — counted as valid —
        # and nullable ints into garbage)
        rep = np.repeat(np.arange(n, dtype=np.int64), fanout)
        t = pa.table({
            key: batch.column(key).take(rep),
            "win_start": pa.array(wins),
            "value": batch.column(value_col).take(rep),
        })
        g = t.group_by([key, "win_start"]).aggregate(
            [("value", "count", pc.CountOptions(mode="all")),
             ("value", "min"), ("value", "max")]
        )
        return g.rename_columns([key, "win_start", "n_partial", "min_partial", "max_partial"])

    partial_ds = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return partial_ds.groupby([key, "win_start"]).aggregate(
        Sum("n_partial", alias_name="n_events"),
        Min("min_partial", alias_name="min_value"),
        Max("max_partial", alias_name="max_value"),
    )
