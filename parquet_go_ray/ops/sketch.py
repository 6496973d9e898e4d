"""Mergeable sketches over Dataset columns: HyperLogLog distinct counts and
quantile summaries.

Both follow the combiner discipline every 100 TB aggregate needs: each batch
reduces to a tiny mergeable state (an HLL register array / a weighted sample
of order statistics), states merge associatively, and only sketch bytes ever
move — never the column. The reference's aggregation surface is footer stats
(min/max/distinct, SURVEY.md §2.7); these extend it to the streaming-scale
estimators a training-data pipeline actually runs (corpus cardinality,
length/score percentiles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ------------------------------------------------------------- HyperLogLog
def _hll_registers(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> HLL register array of size 2^p (max rho per bucket)."""
    from ..functions.delta import _bit_length_u64

    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remainder bits moved to the top
    # rho = 1-based position of the first 1-bit from the top = 64 - bit_length + 1
    bl = _bit_length_u64(rest)
    rho = np.minimum(64 - bl.astype(np.int64) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def approx_distinct(ds, col: str, *, p: int = 12) -> float:
    """HyperLogLog cardinality estimate (error ~1.04/sqrt(2^p) ≈ 1.6% at
    p=12; 4 KB of registers per batch is all that moves)."""
    from ..pipelines.encode import _stable_hash

    def sketch(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if arr.null_count:
            # SQL count(distinct) semantics: nulls are not a value — and
            # _stable_hash maps null like "", which would also conflate a
            # null with a genuinely empty string
            arr = arr.drop_null()
        h = _stable_hash(arr).view(np.uint64)
        # _stable_hash masks to 63 bits; spread back over 64 for HLL buckets
        h = h * np.uint64(0x9E3779B97F4A7C15)
        regs = _hll_registers(h, p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(sketch, batch_format="pyarrow",
                                zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for blob in batch["regs"]:
            np.maximum(merged, np.frombuffer(blob.as_py(), dtype=np.uint8), out=merged)
    return _hll_estimate(merged)


# ------------------------------------------------------- quantile summaries
def quantile_sketch(ds, col: str, quantiles: list[float], *, k: int = 512) -> list[float]:
    """Approximate quantiles via mergeable weighted order-statistic samples:
    each batch keeps k evenly spaced order statistics weighted by the rows
    they summarize; the driver merges the (tiny) weighted samples and reads
    quantiles off the weighted CDF. Error ~1/k of rank per merge level."""

    def summarize(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col).combine_chunks(), dtype=np.float64)
        v = np.sort(v[~np.isnan(v)])
        n = len(v)
        if n == 0:
            return pa.table({"q": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        if n <= k:
            return pa.table({"q": pa.array(v), "w": pa.array(np.ones(n))})
        pos = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
        return pa.table({"q": pa.array(v[pos]),
                         "w": pa.array(np.full(k, n / k, dtype=np.float64))})

    parts = ds.map_batches(summarize, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if "q" not in parts.columns:
        # an EMPTY dataset yields a column-less frame from to_pandas();
        # quantiles of nothing are NaN (the in-code convention below)
        return [float("nan")] * len(quantiles)
    q = parts["q"].to_numpy()
    w = parts["w"].to_numpy()
    order = np.argsort(q, kind="stable")
    q, w = q[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    out = []
    for target in quantiles:
        if not len(q):
            out.append(float("nan"))
            continue
        i = int(np.searchsorted(cum, target * total))
        out.append(float(q[min(i, len(q) - 1)]))
    return out


def exact_quantile_threshold(ds, col: str, q: float, *, k: int = 512,
                             bracket: float = 0.02) -> float:
    """Sketch-GUIDED exact order statistic: the value at ascending 0-indexed
    rank ``floor(q * N)`` — identical to SQL's ``ORDER BY col LIMIT 1 OFFSET
    floor(q*N)``, which is what makes sketch-driven filters hash-checkable
    against a SQL oracle (VERDICT r3 #9).

    Two streaming passes, no shuffle, no materialization: pass 1 is the
    mergeable quantile sketch, read at ``q ± bracket`` to get a narrow VALUE
    bracket guaranteed (sketch rank error ~1/k per merge level << bracket)
    to contain the target rank; pass 2 streams per-batch counts below the
    bracket plus (distinct value, count) pairs inside it — tiny whenever the
    in-bracket cardinality is moderate (integer lengths, scores, bucketed
    floats), the case for every quality-filter column. The driver then picks
    the exact ranked value from O(distinct-in-bracket) pairs. Raises if the
    bracket missed (pathological skew) — widen ``bracket`` and rerun."""
    lo_q, hi_q = max(q - bracket, 0.0), min(q + bracket, 1.0)
    lo, hi = quantile_sketch(ds, col, [lo_q, hi_q], k=k)
    if not np.isfinite(lo) or not np.isfinite(hi):
        return float("nan")

    def pass2(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(col).combine_chunks(), dtype=np.float64)
        v = v[~np.isnan(v)]
        below = int((v < lo).sum())
        vals, cnts = np.unique(v[(v >= lo) & (v <= hi)], return_counts=True)
        return pa.table({
            "below": pa.array([below], pa.int64()),
            "n": pa.array([len(v)], pa.int64()),
            "vals": pa.array([vals], pa.list_(pa.float64())),
            "cnts": pa.array([cnts.astype(np.int64)], pa.list_(pa.int64())),
        })

    parts = ds.map_batches(pass2, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    total = int(parts["n"].sum())
    below = int(parts["below"].sum())
    if total == 0:
        return float("nan")
    vals = np.concatenate([np.asarray(x, dtype=np.float64)
                           for x in parts["vals"]] or [np.empty(0)])
    cnts = np.concatenate([np.asarray(x, dtype=np.int64)
                           for x in parts["cnts"]] or [np.empty(0, np.int64)])
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    uvals, start = np.unique(vals, return_index=True)
    ucnts = np.add.reduceat(cnts, start) if len(vals) else cnts
    # 0-indexed ascending target, clamped so q=1.0 means the maximum
    # (floor(1.0*N) = N is out of range and would blame the bracket forever)
    rank = min(int(np.floor(q * total)), total - 1)
    j = rank - below
    if j < 0 or j >= int(ucnts.sum()):
        raise RuntimeError(
            f"exact_quantile_threshold: bracket [{lo}, {hi}] missed rank "
            f"{rank} (below={below}, in-bracket={int(ucnts.sum())}); widen "
            "`bracket`")
    cum = np.cumsum(ucnts)
    return float(uvals[np.searchsorted(cum, j, side="right")])


def quantile_filter(ds, col: str, *, keep_above: float = 0.1, k: int = 512,
                    exact: bool = False):
    """Sketch-driven adaptive filtering — "drop the bottom decile by
    quality": one streaming pass learns the approximate ``keep_above``
    quantile of ``col`` (mergeable weighted order-statistic sketch, driver
    holds O(k) floats per block), the threshold broadcasts in the closure,
    and a second streaming pass keeps rows with ``col >= threshold``. No
    shuffle, no corpus materialization; the usual two-pass shape of
    statistics-driven filters.

    Returns ``(filtered_ds, threshold)`` so callers can log/persist the cut
    point alongside the output. With ``exact=True`` the threshold is the
    sketch-guided EXACT rank-``floor(q*N)`` order statistic
    (``exact_quantile_threshold``) — same streaming cost (two passes), but
    the cut point is reproducible by a SQL oracle."""
    import pyarrow.compute as pc

    if exact:
        threshold = exact_quantile_threshold(ds, col, keep_above, k=k)
    else:
        (threshold,) = quantile_sketch(ds, col, [keep_above], k=k)

    def keep(t):
        return t.filter(pc.greater_equal(t.column(col), threshold))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True), threshold


def heavy_hitters(ds, col: str, *, k: int = 20, capacity: int | None = None):
    """Approximate top-k frequent values (heavy hitters) in ONE streaming
    pass: per-batch Misra-Gries summaries (Misra & Gries 1982; merge rule
    from Agarwal et al., "Mergeable Summaries", PODS 2012) of ``capacity``
    counters each, merged pairwise on the driver — only counter dicts ever
    leave a task, never value streams.

    Guarantee: any value with true frequency > N/capacity is present, and
    every reported count is an UNDER-estimate by at most N/capacity (N =
    total rows). ``capacity`` defaults to ``8*k``, making the top-k ordering
    exact whenever the k-th item leads the (k+1)-th by more than N/(8k).

    Returns a pandas DataFrame (value, count_lo) sorted by count descending,
    truncated to k rows. For the exact equivalent use
    ``ds.groupby(col).count()`` — a full shuffle; this is the no-shuffle
    approximation for monitoring/mixture decisions at 100 TB.
    """
    import pandas as pd

    cap = capacity or 8 * k

    def summarize(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        vc = arr.combine_chunks().value_counts()
        vals = vc.field("values").to_pylist()
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        if len(counts) > cap:
            # Misra-Gries reduction: keep top-cap, subtract the (cap+1)-th
            # count from the survivors (the standard summary truncation)
            order = np.argsort(-counts, kind="stable")
            cut = counts[order[cap]]
            keep = order[:cap]
            vals = [vals[i] for i in keep]
            counts = counts[keep] - cut
            m = counts > 0
            vals = [v for v, ok in zip(vals, m) if ok]
            counts = counts[m]
        return pa.table({"value": pa.array(vals),
                         "count": pa.array(counts, pa.int64())})

    merged: dict = {}
    for b in ds.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow", batch_size=None):
        for v, c in zip(b.column("value").to_pylist(),
                        b.column("count").to_pylist()):
            merged[v] = merged.get(v, 0) + c
        if len(merged) > cap:
            cut = sorted(merged.values(), reverse=True)[cap]
            merged = {v: c - cut for v, c in merged.items() if c - cut > 0}
    top = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return pd.DataFrame(top, columns=["value", "count_lo"])
