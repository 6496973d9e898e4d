"""Regression tests for the round-4 advisor findings (ADVICE.md).

(The five round-3 advisor fixes the round-4 VERDICT asked to pin — CLI
dedup --method simhash/embedding end-to-end, simhash over a non-'text'
column, the >2^53 int64 range join, the negative-main-id cross_dedup raise,
and the broadcast-CC round-budget error — are already pinned, one named test
each, in tests/test_advice_r3.py.)

This file pins the round-4 items:

1. q_bpe_tokenize_documents' in-query roundtrip check: an EMPTY batch must
   pass (pc.all over zero rows is null — previously a spurious raise), and a
   NULL text row must fail loudly rather than vanish into pc.all's
   null-skipping.
2. semantic_dedup on an empty corpus returns an empty (id, cluster_id) drop
   table (drop=False) / the corpus unchanged (drop=True) instead of
   crashing in np.stack.
3. bench_parquet_baseline measures min-of-N (GRAFT_BENCH_REPEATS), the same
   protocol as the headline encode — no warm-cache asymmetry in the
   speedup ratio.
4. BpeEncoder / whitespace_normalize: explicit null contract — null text
   encodes to zero tokens and normalizes to "", with flatten()/offsets
   alignment intact for batches that mix null and real rows.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# --------------------------------------- 1. BPE check: empty batch / nulls
def test_bpe_query_check_passes_empty_and_rejects_nulls(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from parquet_go_ray.pipelines.queries import q_bpe_tokenize_documents

    # tiny corpus containing an EMPTY-text row; map_batches may also see
    # empty batches — the check must pass both
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(["a b c", "b c d", "", "  ", "a  b", "d d d"]),
    }), tmp_path / "documents.parquet")
    out = q_bpe_tokenize_documents(str(tmp_path)).to_pandas()
    assert len(out) == 6
    assert out.loc[out.doc_id == 2, "n_bpe"].iloc[0] == 0


def test_bpe_encoder_null_text_is_zero_tokens(ray_session):
    from parquet_go_ray.ops.bpe import (apply_bpe, train_bpe,
                                        whitespace_normalize)

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b ab ab", "ab ab b", None, "b a"]}))
    model = train_bpe(ds, num_merges=8)
    got = apply_bpe(ds, model).to_pandas().sort_values("doc_id")
    assert got.n_bpe.iloc[2] == 0 and len(got.bpe_ids.iloc[2]) == 0
    # alignment: the rows AFTER the null must still roundtrip exactly
    assert got.n_bpe.iloc[3] > 0
    norm = whitespace_normalize(pa.array(["a  b", None, " x "]))
    assert norm.to_pylist() == ["a b", "", "x"]


# ------------------------------------------- 2. semantic_dedup empty corpus
def test_semantic_dedup_empty_corpus(ray_session):
    from parquet_go_ray.ops.cluster import semantic_dedup

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    drops = semantic_dedup(empty, tau=0.9)
    # (schema checked on the Dataset: ray to_pandas drops columns at 0 rows)
    assert drops.schema().names == ["vec_id", "cluster_id"]
    assert drops.count() == 0
    kept = semantic_dedup(empty, tau=0.9, drop=True)
    assert kept.count() == 0


# --------------------------------- 3. baseline shares the min-of-N protocol
def test_parquet_baseline_min_of_n(tmp_path, monkeypatch):
    import bench

    calls = []
    real = bench.time.perf_counter

    def fake_counter():
        calls.append(None)
        return real()

    monkeypatch.setenv("GRAFT_BENCH_REPEATS", "3")
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))

    import pyarrow.parquet as pq
    src = tmp_path / "tok"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(64)]),
        "tokens": pa.array([[1, 2, 3]] * 64, pa.list_(pa.int32())),
        "n_tok": pa.array([3] * 64, pa.int32()),
        "source": pa.array(["s"] * 64)}), src / "part-0.parquet")
    monkeypatch.setattr(bench, "_token_cache_dir", lambda rows: str(src))
    monkeypatch.setattr(bench.time, "perf_counter", fake_counter)
    res = bench.bench_parquet_baseline(64)
    # 3 repeats x 2 perf_counter reads each = 6 timing calls -> min-of-3
    assert len(calls) == 6
    assert res["sec"] >= 0 and res["bytes"] > 0


# ------------------------------------------------ 4. bpe decode with nulls
def test_bpe_roundtrip_with_null_mixed_batch(ray_session):
    from parquet_go_ray.ops.bpe import (apply_bpe, decode_bpe_column,
                                        train_bpe, whitespace_normalize)

    texts = ["the cat sat", None, "on the   mat", "", "cat cat cat"]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    model = train_bpe(ds, num_merges=16)
    enc = apply_bpe(ds, model).to_pandas().sort_values("doc_id")
    t = pa.table({
        "bpe_ids": pa.array([list(map(int, x)) for x in enc.bpe_ids],
                            pa.list_(pa.int32()))})
    rt = decode_bpe_column(t, model=model).column("text_rt").to_pylist()
    want = whitespace_normalize(pa.array(texts)).to_pylist()
    assert rt == want


# ---------------- round-5 review: string ids fail fast, not deep in numpy
def test_near_dedup_requires_integer_ids(ray_session):
    """The pair sources and connected-components chain carry ids as int64
    (pair shuffles, hash-min labels, broadcast membership filters); a
    string-id corpus used to crash deep in the chain with an opaque numpy
    error. Entry points now fail fast with guidance."""
    import ray.data as rd

    from parquet_go_ray.ops.dedup import (dedup_exact,
                                          minhash_candidate_pairs,
                                          simhash_candidate_pairs)

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x y z"] * 2 + ["p q r"] * 2}))
    with pytest.raises(ValueError, match="INTEGER 'doc_id'"):
        minhash_candidate_pairs(ds)
    with pytest.raises(ValueError, match="INTEGER 'doc_id'"):
        simhash_candidate_pairs(ds)
    # exact dedup's second pass runs the same int64 membership filter
    with pytest.raises(ValueError, match="INTEGER 'doc_id'"):
        dedup_exact(ds)

    from parquet_go_ray.ops.dedup import embedding_neardup_lsh

    emb = rd.from_pandas(pd.DataFrame({
        "vec_id": ["v1", "v2"],
        "embedding": [np.ones(4, np.float32)] * 2}))
    with pytest.raises(ValueError, match="INTEGER 'vec_id'"):
        embedding_neardup_lsh(emb, tau=0.9)
