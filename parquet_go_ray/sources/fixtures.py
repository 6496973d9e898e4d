"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

Sources are Zipf-skewed ("web" ~40% of rows — exercises the salted shuffle)
and each source is a codec-selector stratum (FIXTURES.md F1): low-cardinality
vocab, dictionary-cutoff boundary (32767/32768 distinct), long runs, sorted
ids, full-range uniform int32 (delta overflow), constant, plus BPE-ish Zipf
text sources. ~0.5% empty token lists (the reference's empty-repeated path,
/root/reference/data_store.go:116-119) and length-1 lists (single-value delta
bug class, CHANGELOG v0.8.0).

Generation is shard-parallel and fully deterministic: shard i uses
``default_rng(seed * 1_000_003 + i)``, so a Ray Dataset built from shards is
identical across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB = 50_257  # BPE-ish

SOURCES = [
    ("web", 0.40, "zipf"),
    ("books", 0.14, "zipf"),
    ("code", 0.10, "zipf"),
    ("wiki", 0.08, "zipf"),
    ("news", 0.06, "zipf"),
    ("social", 0.05, "zipf"),
    ("low_card", 0.05, "low_card"),
    ("boundary", 0.04, "boundary"),
    ("runs", 0.03, "runs"),
    ("sorted", 0.02, "sorted"),
    ("uniform32", 0.02, "uniform32"),
    ("constant", 0.01, "constant"),
]
_REST = max(1.0 - sum(p for _, p, _ in SOURCES), 0.001)
SOURCES.append(("forum", _REST, "zipf"))


def _token_values(kind: str, total: int, rng: np.random.Generator) -> np.ndarray:
    if total == 0:
        return np.empty(0, dtype=np.int32)
    if kind == "zipf":
        v = rng.zipf(1.3, total).astype(np.int64)
        return np.minimum(v - 1, VOCAB - 1).astype(np.int32)
    if kind == "low_card":
        return rng.integers(0, 256, total, dtype=np.int32)
    if kind == "boundary":
        # hovers at the 32767 dict cutoff: half the chunks just under, half over
        hi = 32_767 if rng.integers(0, 2) == 0 else 32_768
        return (np.arange(total, dtype=np.int64) % hi).astype(np.int32)
    if kind == "runs":
        n_runs = max(1, total // 64)
        run_vals = rng.integers(0, 1000, n_runs, dtype=np.int32)
        reps = rng.multinomial(total - n_runs, np.full(n_runs, 1 / n_runs)) + 1
        return np.repeat(run_vals, reps).astype(np.int32)
    if kind == "sorted":
        start = int(rng.integers(0, 1 << 20))
        return (start + np.arange(total, dtype=np.int64) % (1 << 30)).astype(np.int32)
    if kind == "uniform32":
        return rng.integers(np.iinfo(np.int32).min, np.iinfo(np.int32).max, total, dtype=np.int32)
    if kind == "constant":
        return np.full(total, 7, dtype=np.int32)
    raise ValueError(kind)


def token_table_shard(rows: int, shard: int = 0, seed: int = 42) -> pa.Table:
    """One deterministic shard of the F1 token table."""
    rng = np.random.default_rng(seed * 1_000_003 + shard)
    names = [s for s, _, _ in SOURCES]
    probs = np.array([p for _, p, _ in SOURCES])
    kinds = {s: k for s, _, k in SOURCES}
    src_idx = rng.choice(len(SOURCES), rows, p=probs / probs.sum())

    lens = np.clip(rng.lognormal(4.6, 0.9, rows), 0, 4096).astype(np.int64)
    lens[rng.random(rows) < 0.005] = 0  # empty lists
    lens[rng.random(rows) < 0.005] = 1  # single-token lists

    values = np.empty(int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    for si in range(len(SOURCES)):
        rows_of = np.flatnonzero(src_idx == si)
        if not len(rows_of):
            continue
        total = int(lens[rows_of].sum())
        vals = _token_values(kinds[names[si]], total, rng)
        # scatter into the per-row slots (ragged, vectorized)
        row_lens = lens[rows_of]
        dst = np.repeat(offsets[rows_of], row_lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(row_lens[:-1])]), row_lens)
        )
        values[dst] = vals

    import pyarrow.compute as pc

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))
    # vectorized doc_id construction (arrow kernels, no per-row Python)
    seq = pc.utf8_lpad(pc.cast(pa.array(np.arange(rows, dtype=np.int64)), pa.string()), 10, "0")
    doc_id = pc.binary_join_element_wise(pa.scalar(f"doc-{shard:05d}-"), seq, pa.scalar(""))
    source = pa.array(np.array(names, dtype=object)[src_idx])
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": source.cast(pa.string()),
        }
    )


def token_dataset(total_rows: int, *, shards: int = 32, seed: int = 42):
    """Shard-parallel Ray Dataset of the F1 token table (deterministic)."""
    import ray.data as rd

    per = total_rows // shards
    sizes = [per + (1 if i < total_rows % shards else 0) for i in range(shards)]

    def gen(batch):
        shard = int(batch["id"][0])
        return token_table_shard(sizes[shard], shard, seed)

    return (
        rd.range(shards)
        .repartition(shards)
        .map_batches(gen, batch_format="numpy", batch_size=1, zero_copy_batch=True)
    )


def write_token_parquet(path: str, total_rows: int, *, shards: int = 8, seed: int = 42) -> str:
    """Materialize the fixture to a parquet file (driver-side, for caches/tests)."""
    import pyarrow.parquet as pq

    tables = [token_table_shard(total_rows // shards + (1 if i < total_rows % shards else 0), i, seed)
              for i in range(shards)]
    pq.write_table(pa.concat_tables(tables), path)
    return path
