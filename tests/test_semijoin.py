"""Semi-join prefilter for the dedup attach passes (VERDICT r2 #1): the
broadcast candidate-id filter must bound every _attach_text input to
O(candidates) rows, never the corpus, while keeping results exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parquet_go_ray.ops import dedup


# --------------------------------------------------- filter unit tests (no Ray)
def test_id_filter_exact_membership():
    f = dedup.IdMembershipFilter(np.array([3, 1, 7, 7, 100], dtype=np.int64))
    assert f.kind == "exact"
    got = f.contains(np.array([0, 1, 2, 3, 7, 99, 100, -5], dtype=np.int64))
    np.testing.assert_array_equal(
        got, [False, True, False, True, True, False, True, False])


def test_id_filter_empty():
    f = dedup.IdMembershipFilter(np.empty(0, dtype=np.int64))
    assert not f.contains(np.array([1, 2, 3], dtype=np.int64)).any()


def test_id_filter_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(42)
    members = rng.integers(-(1 << 62), 1 << 62, 50_000, dtype=np.int64)
    f = dedup.IdMembershipFilter(members, bloom_threshold=1000)  # force bloom
    assert f.kind == "bloom"
    # no false negatives
    assert f.contains(members).all()
    # false-positive rate well under 1% at 16 bits/id, 4 probes
    probes = rng.integers(-(1 << 62), 1 << 62, 100_000, dtype=np.int64)
    outside = probes[~np.isin(probes, members)]
    fp = f.contains(outside).mean()
    assert fp < 0.01, f"bloom fp rate {fp}"


# ------------------------------------------------------- distributed behavior
def _corpus(n_unique=300, n_dups=10):
    base = pd.DataFrame({
        "doc_id": np.arange(n_unique, dtype=np.int64),
        "text": [f"document body number {i} with words" for i in range(n_unique)],
    })
    dup = base.iloc[:n_dups].assign(
        doc_id=np.arange(n_unique, n_unique + n_dups, dtype=np.int64))
    return pd.concat([base, dup], ignore_index=True)


def test_semi_filter_bounds_rows(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df)
    cands = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([0, 1, 2], dtype=np.int64),
        "doc_b": np.array([300, 301, 302], dtype=np.int64),
    }))
    filt = dedup._broadcast_id_filter(cands, ["doc_a", "doc_b"])
    out = dedup._semi_filter(ds, "doc_id", filt).to_pandas()
    assert set(out.doc_id) == {0, 1, 2, 300, 301, 302}


def test_dedup_exact_attach_is_candidate_bounded(ray_session, monkeypatch):
    df = _corpus(n_unique=300, n_dups=10)
    ds = rd.from_pandas(df)

    seen = {}
    orig = dedup._attach_text

    def spy(pairs, texts, *a, **k):
        seen["attach_rows"] = texts.count()
        return orig(pairs, texts, *a, **k)

    monkeypatch.setattr(dedup, "_attach_text", spy)
    out = dedup.dedup_exact(ds).to_pandas()

    # attach input == the 20 duplicate-group members, not the 310-row corpus
    assert seen["attach_rows"] == 20
    # and the result is still exact
    assert len(out) == 300
    assert out.dup_count.sum() == 310
    assert (out[out.dup_count == 2].doc_id < 300).all()


def test_ngram_jaccard_attach_is_candidate_bounded(ray_session, monkeypatch):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(40):
        t = " ".join(rng.choice(words, 60))
        texts.append(t); ids.append(2 * i)
        if i < 8:
            toks = t.split(); toks[5] = "CHANGED"
            texts.append(" ".join(toks)); ids.append(2 * i + 1)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array(ids, dtype=np.int64), "text": texts}))

    attach_rows = []
    orig = dedup._attach_text

    def spy(pairs, texts_ds, *a, **k):
        attach_rows.append(texts_ds.count())
        return orig(pairs, texts_ds, *a, **k)

    monkeypatch.setattr(dedup, "_attach_text", spy)
    out = dedup.ngram_jaccard_pairs(ds, threshold=0.5,
                                    method="shuffle").to_pandas()

    found = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    planted = {(2 * i, 2 * i + 1) for i in range(8)}
    assert planted <= found, f"missing {planted - found}"
    # the shuffle path ran (auto would pick broadcast at this size) and both
    # attach passes saw only candidate members (<= 2 ids/pair), not all docs
    assert len(attach_rows) == 2
    n_corpus = len(ids)
    for rows in attach_rows:
        assert rows < n_corpus, f"attach saw {rows} rows of a {n_corpus}-doc corpus"


def test_ngram_verify_broadcast_matches_shuffle(ray_session):
    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(120)]
    texts, ids = [], []
    for i in range(50):
        t = " ".join(rng.choice(words, 40))
        texts.append(t); ids.append(3 * i)
        if i % 2 == 0:
            toks = t.split(); toks[7] = "ALT"
            texts.append(" ".join(toks)); ids.append(3 * i + 1)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array(ids, dtype=np.int64), "text": texts}))
    cands = dedup.minhash_candidate_pairs(ds).materialize()

    def key_set(df):
        return set(zip(df.doc_a, df.doc_b, np.round(df.jaccard, 12)))

    b = dedup.verify_ngram_jaccard(ds, cands, threshold=0.4,
                                   method="broadcast").to_pandas()
    s = dedup.verify_ngram_jaccard(ds, cands, threshold=0.4,
                                   method="shuffle").to_pandas()
    assert len(b) > 0
    assert key_set(b) == key_set(s)


def test_minhash_verify_semi_filtered(ray_session, monkeypatch):
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(150)]
    texts, ids = [], []
    for i in range(30):
        t = " ".join(rng.choice(words, 50))
        texts.append(t); ids.append(2 * i)
        if i < 6:
            toks = t.split(); toks[3] = "X"
            texts.append(" ".join(toks)); ids.append(2 * i + 1)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array(ids, dtype=np.int64), "text": texts}))

    sigs = ds.map_batches(dedup.MinHasher, fn_constructor_kwargs={"num_perm": 64},
                          batch_format="pyarrow", concurrency=2)
    pairs = dedup.minhash_candidate_pairs(ds)

    attach_rows = []
    orig = dedup._attach_text

    def spy(p, s, *a, **k):
        attach_rows.append(s.count())
        return orig(p, s, *a, **k)

    monkeypatch.setattr(dedup, "_attach_text", spy)
    out = dedup.minhash_verify_pairs(pairs, sigs, threshold=0.5,
                                     method="shuffle").to_pandas()

    found = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    planted = {(2 * i, 2 * i + 1) for i in range(6)}
    assert planted <= found, f"missing {planted - found}"
    n_corpus = len(ids)
    # first attach pass input is the semi-filtered signature set
    assert attach_rows[0] < n_corpus

    # the broadcast (auto at this size) path agrees exactly with shuffle
    monkeypatch.setattr(dedup, "_attach_text", orig)
    b = dedup.minhash_verify_pairs(pairs, sigs, threshold=0.5).to_pandas()
    key = lambda df: set(zip(df.doc_a, df.doc_b, np.round(df.jaccard, 12)))
    assert key(b) == key(out)
