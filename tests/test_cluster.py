"""Connected-component duplicate clustering (ops/cluster.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_clusters_match_union_find_random_graph(ray_session):
    from parquet_go_ray.ops.cluster import duplicate_clusters

    rng = np.random.default_rng(7)
    # ~300 nodes, sparse random pairs -> mix of singleton-free components,
    # chains, and merged blobs
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 300, (220, 2)) if a != b]
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["doc_a", "doc_b"]))
    expect = _union_find(pairs, sorted({n for p in pairs for n in p}))
    # both execution paths must agree with ground truth: the broadcast fast
    # path (default for candidate-bounded label sets) and the fully
    # distributed shuffle loop (broadcast_nodes=0 forces it)
    for bn in (1 << 22, 0):
        out = duplicate_clusters(ds, max_iters=12, num_partitions=8,
                                 broadcast_nodes=bn).to_pandas()
        assert len(out) == len(expect)
        assert dict(zip(out.node, out.cluster_id)) == expect


def test_clusters_chain_needs_iterations(ray_session):
    """A path graph exercises multi-round propagation (diameter rounds)."""
    from parquet_go_ray.ops.cluster import duplicate_clusters

    chain = [(i, i + 1) for i in range(30)]  # one 31-node path, min id 0
    ds = rd.from_pandas(pd.DataFrame(chain, columns=["doc_a", "doc_b"]))
    out = duplicate_clusters(ds, max_iters=12, num_partitions=8).to_pandas()
    assert (out.cluster_id == 0).all() and len(out) == 31


def test_clusters_unconverged_raises(ray_session, monkeypatch):
    import parquet_go_ray.ops.cluster as C

    # force the shuffle path (broadcast_nodes=0) and spread the chain across
    # many partitions so one round cannot solve it
    monkeypatch.setattr(C, "_EDGES_PER_PARTITION", 4)
    chain = [(i, i + 1) for i in range(30)]
    ds = rd.from_pandas(pd.DataFrame(chain, columns=["doc_a", "doc_b"]))
    with pytest.raises(RuntimeError, match="not converged"):
        C.duplicate_clusters(ds, max_iters=1, num_partitions=8,
                             broadcast_nodes=0)


def test_dedup_near_minhash_end_to_end(ray_session):
    """Planted transitive near-dup groups (A~B~C) collapse to the min-id
    member; untouched docs all survive."""
    from parquet_go_ray.ops.cluster import dedup_near

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    next_id = 0
    planted_groups = []
    for i in range(30):
        t = " ".join(rng.choice(words, 80))
        group = [next_id]
        texts.append(t)
        next_id += 1
        if i < 6:  # plant a 3-member near-dup chain: tweak 1 word each step
            toks = t.split()
            for step in range(2):
                toks = list(toks)
                toks[3 + step] = f"CHANGED{step}"
                texts.append(" ".join(toks))
                group.append(next_id)
                next_id += 1
        planted_groups.append(group)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    kept = set(dedup_near(ds, method="minhash", threshold=0.5, num_partitions=8)
               .to_pandas().doc_id)
    for group in planted_groups:
        survivors = kept & set(group)
        assert survivors == {min(group)}, (group, survivors)
    # every singleton doc survived
    singles = {g[0] for g in planted_groups if len(g) == 1}
    assert singles <= kept


def test_dedup_segments_newline_mode(ray_session):
    from parquet_go_ray.ops.text import dedup_segments

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["l1\nl2\nl1\nl3\nl2", "single", ""],
    }))
    out = dedup_segments(ds, delimiter="\n").to_pandas().sort_values("doc_id")
    assert out.text.tolist() == ["l1\nl2\nl3", "single", ""]


def test_pack_sequences_prefix_sum(ray_session):
    from parquet_go_ray.ops.text import pack_sequences

    n = 100
    toks = np.arange(1, n + 1, dtype=np.int64)  # 1..100 tokens per doc
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                                      "n_tok": toks})).materialize()
    out = pack_sequences(ds, seq_len=64).to_pandas().sort_values("doc_id")
    expect_start = np.concatenate([[0], np.cumsum(toks[:-1])])
    assert (out.tok_start.to_numpy() == expect_start).all()
    assert (out.seq_id.to_numpy() == expect_start // 64).all()


def test_pack_sequences_gappy_and_unsorted_input(ray_session):
    """VERDICT r3 #5: block fingerprinting lifts the id-sortedness
    requirement — a stratified-sampled (gappy-id) upstream and a
    non-id-sorted (shuffled-block) upstream both pack correctly in their
    dataset order."""
    from parquet_go_ray.ops.text import pack_sequences, stratified_sample

    n = 200
    toks = ((np.arange(n) * 37) % 90 + 10).astype(np.int64)
    base = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "n_tok": toks,
                         "source": np.where(np.arange(n) % 2 == 0,
                                            "evens", "odds")})
    # gappy ids: drop all of one stratum, keep dataset order
    ds = stratified_sample(
        rd.from_pandas(base).repartition(8).materialize(),
        {"odds": 0.0}, key_col="source", default_rate=1.0).materialize()
    out = pack_sequences(ds, seq_len=64).to_pandas()
    kept = out.sort_values("tok_start")
    expect = np.concatenate([[0], np.cumsum(kept.n_tok.to_numpy()[:-1])])
    assert (kept.tok_start.to_numpy() == expect).all()
    assert (kept.seq_id.to_numpy() == expect // 64).all()

    # non-id-sorted: pack order = dataset order, not id order
    perm = np.random.default_rng(3).permutation(n)
    shuf = rd.from_pandas(base.iloc[perm].reset_index(drop=True)) \
        .repartition(8).materialize()
    out2 = pack_sequences(shuf, seq_len=64).to_pandas()
    # every tok_start is the sum of the n_toks packed before it
    by_start = out2.sort_values("tok_start")
    expect2 = np.concatenate([[0], np.cumsum(by_start.n_tok.to_numpy()[:-1])])
    assert (by_start.tok_start.to_numpy() == expect2).all()


def test_stratified_sample_rates(ray_session):
    from parquet_go_ray.ops.text import stratified_sample

    n = 20000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "source": np.where(np.arange(n) % 2 == 0, "keep_half",
                                          "keep_all")})
    ds = rd.from_pandas(df)
    out = stratified_sample(ds, {"keep_half": 0.5}, key_col="source",
                            default_rate=1.0).to_pandas()
    kept_all = (out.source == "keep_all").sum()
    kept_half = (out.source == "keep_half").sum()
    assert kept_all == n // 2  # default rate keeps everything
    assert abs(kept_half / (n // 2) - 0.5) < 0.02  # hash-uniform ~50%
    # deterministic: identical second run
    out2 = stratified_sample(ds, {"keep_half": 0.5}, key_col="source",
                             default_rate=1.0).to_pandas()
    assert set(out.doc_id) == set(out2.doc_id)
    # a different salt gives a (mostly) different sample
    out3 = stratified_sample(ds, {"keep_half": 0.5}, key_col="source",
                             salt=7, default_rate=1.0).to_pandas()
    half3 = set(out3[out3.source == "keep_half"].doc_id)
    half1 = set(out[out.source == "keep_half"].doc_id)
    assert half1 != half3


def test_deterministic_shuffle_rank(ray_session):
    from parquet_go_ray.ops.shuffle import deterministic_shuffle_rank, _shuffle_key

    n = 5000
    ids = np.random.default_rng(3).permutation(n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = deterministic_shuffle_rank(ds, seed=42, num_buckets=64,
                                     num_partitions=8).to_pandas()
    assert len(out) == n
    assert sorted(out.shuffle_pos) == list(range(n))  # exact permutation
    # matches the driver-side definition: rank by (key, id)
    keys = _shuffle_key(out.doc_id.to_numpy(), 42)
    order = np.lexsort((out.doc_id.to_numpy(), keys))
    expect = np.empty(n, dtype=np.int64)
    expect[order] = np.arange(n)
    assert (out.shuffle_pos.to_numpy() == expect).all()
    # reproducible, and a different seed permutes differently
    out2 = deterministic_shuffle_rank(ds, seed=42, num_buckets=64,
                                      num_partitions=8).to_pandas()
    assert out.sort_values("doc_id").shuffle_pos.tolist() == \
        out2.sort_values("doc_id").shuffle_pos.tolist()
    out3 = deterministic_shuffle_rank(ds, seed=7, num_buckets=64,
                                      num_partitions=8).to_pandas()
    assert out.sort_values("doc_id").shuffle_pos.tolist() != \
        out3.sort_values("doc_id").shuffle_pos.tolist()


def test_pack_token_sequences_exact_stream(ray_session):
    from parquet_go_ray.ops.text import pack_token_sequences

    rng = np.random.default_rng(1)
    n = 200
    lens = rng.integers(1, 50, n)
    toks = [rng.integers(0, 1000, l).astype(np.int32) for l in lens]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "tokens": pa.array([x.tolist() for x in toks],
                           type=pa.list_(pa.int32()))})
    ds = rd.from_arrow(t).materialize()
    SEQ = 64
    out = (pack_token_sequences(ds, seq_len=SEQ, pad_id=-1)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    stream = np.concatenate(toks)
    n_seq = -(-len(stream) // SEQ)
    assert len(out) == n_seq
    got = np.concatenate([np.asarray(x) for x in out.tokens])
    padded = np.concatenate(
        [stream, np.full(n_seq * SEQ - len(stream), -1, dtype=np.int32)])
    assert np.array_equal(got, padded)
    assert all(len(np.asarray(x)) == SEQ for x in out.tokens)
    out2 = pack_token_sequences(ds, seq_len=SEQ, drop_last=True).to_pandas()
    assert len(out2) == len(stream) // SEQ


def test_cross_dedup_planted_overlap(ray_session):
    from parquet_go_ray.ops.cluster import cross_dedup

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(300)]
    main_texts = [" ".join(rng.choice(words, 60)) for _ in range(40)]
    ref_texts = [" ".join(rng.choice(words, 60)) for _ in range(20)]
    # plant: main docs 0-4 are exact copies of ref docs, 5-6 near copies
    for i in range(5):
        main_texts[i] = ref_texts[i]
    for i in (5, 6):
        toks = ref_texts[i + 5].split()
        toks[10] = "TWEAKED"
        main_texts[i] = " ".join(toks)
    main = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64), "text": main_texts}))
    ref = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64), "text": ref_texts}))
    kept = set(cross_dedup(main, ref, threshold=0.5, n=3,
                           num_partitions=8).to_pandas().doc_id)
    dropped = set(range(40)) - kept
    assert dropped == {0, 1, 2, 3, 4, 5, 6}, dropped
    # report mode returns the matched ids instead
    matches = set(cross_dedup(main, ref, threshold=0.5, n=3,
                              num_partitions=8, drop=False)
                  .to_pandas().doc_id)
    assert matches == {0, 1, 2, 3, 4, 5, 6}


def test_dedup_near_simhash_and_embedding_paths(ray_session):
    from parquet_go_ray.ops.cluster import dedup_near

    # simhash path: exact copies collide in every band; base docs are random
    # word soup so unrelated docs stay beyond the hamming radius
    wrng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(400)]
    texts = [" ".join(wrng.choice(words, 50)) for _ in range(20)]
    texts += texts[:4]  # ids 20..23 duplicate 0..3
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    kept = set(dedup_near(ds, method="simhash", num_partitions=8)
               .to_pandas().doc_id)
    assert kept == set(range(20)), kept

    # embedding path: ds IS the embeddings dataset (id_col names its ids)
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[25:] = vecs[:5] + 1e-4  # ids 25..29 near-duplicate 0..4
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), 16)}))
    kept = set(dedup_near(emb, method="embedding", id_col="vec_id",
                          tau=0.999).to_pandas().vec_id)
    assert set(range(25)) <= kept
    assert kept.isdisjoint(range(25, 30)), kept


def test_asof_join_broadcast_keyed_and_unmatched(ray_session):
    from parquet_go_ray.ops.join import asof_join_broadcast

    # per-key checkpoints; probe rows before the first checkpoint get nulls
    dim = pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "cts": pa.array([10, 20, 15], type=pa.int64()),
        "val": pa.array([100, 200, 150], type=pa.int64()),
    })
    probe = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "ts": pa.array([5, 12, 25, 14, 16, 99], type=pa.int64()),
    }))
    out = (asof_join_broadcast(probe, dim.drop_columns(["k"])
                               .append_column("dk", dim.column("k")),
                               ts_col="ts", dim_ts_col="cts",
                               by="k", dim_by="dk")
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    assert out.val.tolist() == [None, 100, 200, None, 150, None] or \
        [None if pd.isna(v) else int(v) for v in out.val] == \
        [None, 100, 200, None, 150, None]


# ----------------------------------------------------------- semantic dedup
def _semdedup_corpus(seed=3, n_clusters=6, per=30, dim=32, n_dups=12):
    """Well-separated cluster centers; planted near-identical dup pairs."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, ids = [], []
    vid = 0
    for c in centers:
        for _ in range(per):
            v = c + 0.15 * rng.normal(size=dim)
            vecs.append(v / np.linalg.norm(v)); ids.append(vid); vid += 1
    dup_pairs = []
    for i in range(n_dups):
        src = rng.integers(0, len(vecs))
        v = vecs[src] + 1e-4 * rng.normal(size=dim)
        vecs.append(v / np.linalg.norm(v))
        ids.append(vid); dup_pairs.append((ids[src], vid)); vid += 1
    t = pa.table({
        "vec_id": pa.array(np.array(ids, dtype=np.int64)),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    return t, dup_pairs


def test_semantic_dedup_drops_planted_dups(ray_session):
    from parquet_go_ray.ops.cluster import semantic_dedup

    t, dup_pairs = _semdedup_corpus()
    ds = rd.from_arrow(t)
    drops = semantic_dedup(ds, tau=0.99, target_cluster=64,
                           keep="min_id").to_pandas()
    dropped = set(drops.vec_id)
    # exactly one member of every planted near-identical pair is dropped
    for a, b in dup_pairs:
        assert (a in dropped) != (b in dropped), (a, b)
    # min_id keep policy: the survivor is the smaller id
    for a, b in dup_pairs:
        assert min(a, b) not in dropped or (a, b) in [
            p for p in dup_pairs if p[0] in dropped and p[1] in dropped]
    # nothing else gets dropped at tau=0.99 with sigma=0.15 clusters
    planted_victims = {max(a, b) for a, b in dup_pairs}
    assert dropped == planted_victims


def test_semantic_dedup_keep_farthest_and_filter(ray_session):
    from parquet_go_ray.ops.cluster import semantic_dedup

    t, dup_pairs = _semdedup_corpus(seed=11)
    ds = rd.from_arrow(t)
    kept = semantic_dedup(ds, tau=0.99, target_cluster=64,
                          keep="far_from_centroid", drop=True).to_pandas()
    assert len(kept) == t.num_rows - len(dup_pairs)
    kept_ids = set(kept.vec_id)
    for a, b in dup_pairs:
        assert (a in kept_ids) != (b in kept_ids)


def test_semantic_dedup_matches_exact_pairs(ray_session):
    # every dropped id must actually have a >= tau neighbor (no false drops)
    from parquet_go_ray.ops.cluster import semantic_dedup

    t, _ = _semdedup_corpus(seed=5)
    ds = rd.from_arrow(t)
    tau = 0.995
    drops = semantic_dedup(ds, tau=tau, target_cluster=64,
                           keep="min_id").to_pandas()
    M = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    np.fill_diagonal(S, -2)
    has_nbr = (S >= tau - 1e-9).any(axis=1)
    by_id = dict(zip(t.column("vec_id").to_pylist(), has_nbr))
    for d in drops.vec_id:
        assert by_id[d], f"{d} dropped without any >= tau neighbor"


# ------------------------------------------------------------- hash join
def test_hash_join_paths_agree_and_multiplicity(ray_session):
    from parquet_go_ray.ops.join import hash_join

    rng = np.random.default_rng(9)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 400).astype(np.int64),
        "lv": np.arange(400, dtype=np.int64)})
    # duplicate build keys: key k appears 1 or 2 times
    rk = np.concatenate([np.arange(40), np.arange(0, 40, 2)]).astype(np.int64)
    right = pd.DataFrame({"rk": rk, "rv": np.arange(len(rk), dtype=np.int64)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)

    shuf = hash_join(lds, rds, on="k", right_on="rk",
                     method="shuffle", num_partitions=4).to_pandas()
    # pandas merge is the ground truth incl. duplicate-key multiplicity
    ref = left.merge(right, left_on="k", right_on="rk")
    assert len(shuf) == len(ref)
    assert (shuf.groupby("k").size().sort_index()
            == ref.groupby("k").size().sort_index()).all()

    # broadcast path (unique build keys) agrees with shuffle on a dim table
    dim = right.drop_duplicates("rk", keep="first")
    b = hash_join(lds, rd.from_pandas(dim), on="k", right_on="rk",
                  method="broadcast").to_pandas()
    s = hash_join(lds, rd.from_pandas(dim), on="k", right_on="rk",
                  method="shuffle", num_partitions=4).to_pandas()
    key = lambda df: sorted(zip(df.k, df.lv, df.rv))
    assert key(b) == key(s)
    assert len(b) > 0


def test_hash_join_left_outer(ray_session):
    from parquet_go_ray.ops.join import hash_join

    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                         "lv": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"k2": np.array([2, 4], dtype=np.int64),
                          "rv": np.array([20, 40], dtype=np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="k2", how="left",
                    method="shuffle", num_partitions=2).to_pandas()
    out = out.sort_values("k")
    assert out.k.tolist() == [1, 2, 3, 4]
    assert out.rv.fillna(-1).tolist() == [-1, 20, -1, 40]


def test_hash_join_auto_duplicate_keys_keeps_multiplicity(ray_session):
    """A small-but-duplicate-keyed build side must NOT silently lose rows to
    the broadcast first-match path (review r4): auto falls to shuffle."""
    from parquet_go_ray.ops.join import hash_join

    left = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                         "lv": np.arange(3, dtype=np.int64)})
    right = pd.DataFrame({"k2": np.array([1, 1, 2], dtype=np.int64),
                          "rv": np.array([10, 11, 20], dtype=np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="k2").to_pandas()
    assert len(out) == 5  # k=1: 2x2, k=2: 1x1
    assert sorted(out[out.k == 1].rv.tolist()) == [10, 10, 11, 11]


def test_hash_join_empty_right_and_bad_how(ray_session):
    from parquet_go_ray.ops.join import hash_join

    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64),
                         "lv": np.array([5, 6], dtype=np.int64)})
    empty = rd.from_pandas(pd.DataFrame(
        {"k2": pd.Series(dtype="int64"), "rv": pd.Series(dtype="int64")}))
    out = hash_join(rd.from_pandas(left), empty, on="k",
                    right_on="k2").to_pandas()
    assert len(out) == 0
    lo = hash_join(rd.from_pandas(left), empty, on="k", right_on="k2",
                   how="left").to_pandas()
    assert sorted(lo.k.tolist()) == [1, 2] and lo.rv.isna().all()
    with pytest.raises(ValueError, match="unknown how"):
        hash_join(rd.from_pandas(left), empty, on="k", how="right")


def test_mix_sources_infeasible_and_int_rate_semantics(ray_session):
    from parquet_go_ray.ops.text import mix_sources, stratified_sample

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "source": np.repeat(["a", "b"], 50)}))
    with pytest.raises(ValueError, match="absent from the corpus"):
        mix_sources(ds, {"a": 1, "nope": 1})
    # int rate 1 without basis_points still means keep-all (pre-r4 contract)
    out = stratified_sample(ds, {"a": 1}, default_rate=1).to_pandas()
    assert len(out) == 100
