"""Regression tests for the round-3 advisor findings (ADVICE.md):

1. cli dedup: --threshold must only reach methods that accept it (Jaccard
   threshold for minhash, cosine tau for embedding, nothing for simhash) —
   previously `dedup --method simhash|embedding` crashed with TypeError.
2. dedup_near simhash path must forward text_col (non-'text' corpora).
3. duplicate_clusters broadcast path: round budget is explicit
   (broadcast_iters) and the non-convergence error reports the actual
   number of rounds attempted.
4. range_join_broadcast: all-integer inputs compare in int64 — values past
   2^53 must not band into the wrong interval via float64 rounding.
5. cross_dedup: negative main-corpus ids raise (the sign bit marks the
   reference side; a negative main id would silently mis-classify).
"""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# ----------------------------------------------- 1. CLI non-default methods
def _write_dup_docs(path, n_base=20, n_dup=4, seed=8):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(words, 50)) for _ in range(n_base)]
    texts += texts[:n_dup]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}), path)
    return n_base


def test_cli_dedup_simhash(tmp_path, ray_session):
    src = tmp_path / "docs.parquet"
    n_base = _write_dup_docs(src)
    out = tmp_path / "deduped"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "dedup", str(src),
         str(out), "--method", "simhash", "--threshold", "0.5"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows_kept"] == n_base
    assert set(pd.read_parquet(out).doc_id) == set(range(n_base))


def test_cli_dedup_embedding(tmp_path, ray_session):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[25:] = vecs[:5] + 1e-4  # ids 25..29 near-duplicate 0..4
    src = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), 16)}), src)
    out = tmp_path / "deduped"
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli", "dedup", str(src),
         str(out), "--method", "embedding", "--id-col", "vec_id",
         "--vec-col", "embedding", "--threshold", "0.999"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    kept = set(pd.read_parquet(out).vec_id)
    assert set(range(25)) <= kept
    assert kept.isdisjoint(range(25, 30)), kept


# ------------------------------------------- 2. simhash text_col forwarding
def test_dedup_near_simhash_custom_text_col(ray_session):
    from parquet_go_ray.ops.cluster import dedup_near

    rng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(words, 50)) for _ in range(12)]
    texts += texts[:3]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "body": texts}))
    kept = set(dedup_near(ds, method="simhash", text_col="body",
                          num_partitions=4).to_pandas().doc_id)
    assert kept == set(range(12)), kept


# ----------------------------------------- 3. broadcast-path round budget
def test_clusters_broadcast_budget_and_error(ray_session):
    # duplicate_clusters' L0 local-CC pass fully contracts graphs that fit
    # one shuffle partition, so exercise the delta-round budget on
    # _clusters_broadcast directly: label forest with roots {0, 4} bridged
    # by edge (4,5) needs 2 rounds (improve node 4, then observe quiescence)
    from parquet_go_ray.ops.cluster import _clusters_broadcast, duplicate_clusters

    edges = rd.from_arrow(pa.table({
        "u": pa.array([0, 5, 4, 5, 4, 9], type=pa.int64()),
        "v": pa.array([5, 0, 5, 4, 9, 4], type=pa.int64())})).materialize()
    labels = rd.from_arrow(pa.table({
        "node": pa.array([0, 4, 5, 9], type=pa.int64()),
        "label": pa.array([0, 4, 0, 0], type=pa.int64())})).materialize()
    with pytest.raises(RuntimeError, match=r"after 1 delta rounds"):
        _clusters_broadcast(edges, labels, 1)
    got = _clusters_broadcast(edges, labels, 2).to_pandas()
    assert dict(zip(got.node, got.cluster_id)) == {0: 0, 4: 0, 5: 0, 9: 0}

    # the public knob plumbs through (and the default budget converges)
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 4, 4], type=pa.int64()),
        "doc_b": pa.array([5, 5, 9], type=pa.int64())}))
    got = duplicate_clusters(pairs, broadcast_iters=3).to_pandas()
    assert dict(zip(got.node, got.cluster_id)) == {0: 0, 4: 0, 5: 0, 9: 0}


# ------------------------------------------------ 4. int64-exact range join
def test_range_join_int64_beyond_2_53(ray_session):
    from parquet_go_ray.ops.join import range_join_broadcast

    base = 1 << 53
    dim = pa.table({
        "lo": pa.array([base, base + 5], type=pa.int64()),
        "hi": pa.array([base + 4, base + 9], type=pa.int64()),
        "band": pa.array(["A", "B"]),
    })
    # base+5 is exactly halfway between representable float64s base+4 and
    # base+6; ties-to-even rounds it DOWN to base+4, so a float64 compare
    # puts it in band A (hi = base+4 "matches"). Integer compare: band B.
    probe = rd.from_arrow(pa.table({
        "v": pa.array([base + 1, base + 5, base + 9, base + 11],
                      type=pa.int64())}))
    out = (range_join_broadcast(probe, dim, value_col="v",
                                lo_col="lo", hi_col="hi")
           .to_pandas().sort_values("v"))
    assert list(out.band) == ["A", "B", "B", None]


# --------------------------------------------- 5. cross_dedup negative ids
def test_cross_dedup_rejects_negative_main_ids(ray_session):
    from parquet_go_ray.ops.cluster import cross_dedup

    main = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([-1, 2, 3], dtype=np.int64),
        "text": ["a b c d", "e f g h", "i j k l"]}))
    ref = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64), "text": ["a b c d"]}))
    with pytest.raises(Exception, match="non-negative"):
        cross_dedup(main, ref, num_partitions=2).materialize()
