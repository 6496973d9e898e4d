"""Round-5 fourth review batch (dedup / cluster / similarity ops), pinned."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

RNG = np.random.default_rng(91)


def _emb_table(n, d=16, seed=3):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.reshape(-1)), d).cast(pa.list_(pa.float32())),
    })


def test_knn_ivf_returns_full_k_single_batch(ray_session):
    # the self-match used to occupy a per-batch top-k slot; with the whole
    # corpus in one batch the query came back with k-1 neighbors
    from parquet_go_ray.ops.similarity import knn_ivf

    ds = rd.from_arrow(_emb_table(400))
    out = knn_ivf(ds, query_ids=[0, 1], k=10, nlist=4, nprobe=4)
    counts = out.groupby("query_id").size()
    assert (counts == 10).all(), counts.to_dict()
    assert (out.query_id != out.neighbor_id).all()


def test_knn_lsh_returns_full_k_single_batch(ray_session):
    from parquet_go_ray.ops.similarity import knn_lsh

    ds = rd.from_arrow(_emb_table(400))
    out = knn_lsh(ds, query_ids=[0, 1], k=10, bits=2)
    counts = out.groupby("query_id").size()
    assert (counts == 10).all(), counts.to_dict()
    assert (out.query_id != out.neighbor_id).all()


def test_empty_docs_minhash_signature_is_neighbor_independent(ray_session):
    # an empty doc's shingle start clamped into the NEXT doc's bytes, so
    # its signature depended on batch neighbors: two identical empty docs
    # were never emitted as candidates
    from parquet_go_ray.ops.dedup import minhash_candidate_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "the quick brown fox " * 10,
                          "", "a completely different document " * 10]),
    })
    pairs = minhash_candidate_pairs(rd.from_arrow(t)).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 3) in got, got  # the two empty docs MUST pair


def test_key_equality_pairs_null_keys_match_nothing(ray_session):
    from parquet_go_ray.ops.cluster import duplicate_clusters, key_equality_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "host": pa.array(["a.com", "a.com", None, None, "b.com"]),
    })
    pairs = key_equality_pairs(rd.from_arrow(t), "host").to_pandas()
    assert not pairs.isna().any().any()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert got == {(1, 2)}  # nulls never equal each other (SQL semantics)
    # and the pairs feed clustering without the NaN int64 cast crash
    duplicate_clusters(rd.from_arrow(pa.Table.from_pandas(pairs))).count()


def test_embedding_neardup_exact_survives_empty_blocks(ray_session):
    from parquet_go_ray.ops.dedup import embedding_neardup_pairs

    t = _emb_table(60, seed=8)
    # a filter that empties some blocks entirely
    ds = rd.from_arrow(t).repartition(8).filter(
        lambda r: r["vec_id"] < 20)
    out = embedding_neardup_pairs(ds, tau=0.99, method="exact", prune=False)
    assert len(out) >= 0  # no reshape crash on the empty refs


def test_hamming_pairs_reject_string_ids(ray_session):
    from parquet_go_ray.ops.dedup import hamming_candidate_pairs

    t = pa.table({"doc_id": pa.array(["a", "b"]),
                  "simhash": pa.array([3, 7], pa.int64())})
    with pytest.raises(Exception, match="INTEGER"):
        hamming_candidate_pairs(rd.from_arrow(t)).count()
