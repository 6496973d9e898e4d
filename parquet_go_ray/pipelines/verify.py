"""Distributed roundtrip verification: decoded output == source, per row.

The north-rule invariant is per-row token-array equality keyed by doc_id (not
positional — shuffles reorder rows, SURVEY.md §7.3). Both sides reduce to
(doc_id, content_hash) rows inside map_batches (vectorized FNV over the token
bytes via reduceat), then a single hash-partitioned compare joins them — only
16 bytes per row ever shuffle, never the token payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _row_hashes(batch: pa.Table, id_col: str, list_col: str) -> pa.Table:
    arr = batch.column(list_col).combine_chunks()
    offsets = np.asarray(arr.offsets, dtype=np.int64)
    values = np.asarray(arr.values.view(pa.int32()), dtype=np.int32) if len(arr.values) else np.empty(0, np.int32)
    n = len(arr)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    lens = np.diff(offsets)
    if len(values):
        v = values.astype(np.uint64)
        # FNV-style order-sensitive fold per row: h = h*P + v, via segmented
        # Horner using position weights — order matters, so use a two-pass
        # mix: sum(v * P^(pos_in_row)) with P an odd constant, mod 2^64.
        P = np.uint64(1099511628211)
        pos = np.arange(len(v), dtype=np.int64) - np.repeat(offsets[:-1] - offsets[0], lens)
        # P^pos mod 2^64, vectorized by repeated squaring over bits of pos
        weights = np.ones(len(v), dtype=np.uint64)
        base = P
        maxbits = int(pos.max()).bit_length() if len(pos) else 0
        # overflow IS the mod-2^64 reduction; numpy warns on scalar uint64
        # wraparound (base*base) only, so scope it explicitly
        with np.errstate(over="ignore"):
            for b in range(maxbits):
                mask = ((pos >> b) & 1) == 1
                weights[mask] *= base
                base = base * base
        terms = (v + np.uint64(0x9E37)) * weights
        # Prefix-sum segment sums (modular in uint64). reduceat would reject a
        # trailing empty row (its start index == len(terms)); this handles any
        # pattern of empty rows uniformly.
        cs = np.empty(len(terms) + 1, dtype=np.uint64)
        cs[0] = 0
        np.cumsum(terms, dtype=np.uint64, out=cs[1:])
        base0 = offsets[0]
        sums = cs[offsets[1:] - base0] - cs[offsets[:-1] - base0]
        h ^= sums
    h ^= lens.view(np.uint64) if lens.dtype == np.int64 else lens.astype(np.uint64)
    return pa.table({id_col: batch.column(id_col), "__rh": pa.array(h.view(np.int64))})


def verify_roundtrip(source_ds, decoded_ds, *, id_col: str = "doc_id",
                     list_col: str = "tokens", num_partitions: int = 64) -> dict:
    """Returns {"rows": n, "mismatches": m, "missing": k}. m == k == 0 on a
    lossless roundtrip."""
    from .encode import _stable_hash

    def hashes(tag):
        def fn(batch: pa.Table) -> pa.Table:
            t = _row_hashes(batch, id_col, list_col)
            p = _stable_hash(t.column(id_col)) % num_partitions
            return t.append_column("__p", pa.array(p)).append_column(
                "__side", pa.array(np.full(t.num_rows, tag, dtype=np.int8))
            )

        return fn

    both = source_ds.map_batches(hashes(0), batch_format="pyarrow", zero_copy_batch=True).union(
        decoded_ds.map_batches(hashes(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g.__side == 0][[id_col, "__rh"]]
        b = g[g.__side == 1][[id_col, "__rh"]]
        m = a.merge(b, on=id_col, how="outer", suffixes=("_src", "_dec"), indicator=True)
        missing = int((m["_merge"] != "both").sum())
        mismatches = int((m.loc[m["_merge"] == "both", "__rh_src"]
                          != m.loc[m["_merge"] == "both", "__rh_dec"]).sum())
        return pd.DataFrame({"rows": [len(a)], "mismatches": [mismatches], "missing": [missing]})

    parts = both.groupby("__p").map_groups(compare, batch_format="pandas").to_pandas()
    return {
        "rows": int(parts.rows.sum()),
        "mismatches": int(parts.mismatches.sum()),
        "missing": int(parts.missing.sum()),
    }
