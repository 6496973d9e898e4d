"""Exact substring dedup (ops/substring.py) vs a brute-force reference.

Semantics under test (Lee et al. 2022 fixed-k formulation): every k-gram
occurring >= 2 times corpus-wide covers its positions at all occurrences
EXCEPT the canonical minimum-(doc_id, pos) one; covered positions are
removed (or counted, mode="flag")."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.ops.substring import (_gram_hashes_one, _lookup_pairs,
                                          dedup_substrings, _MIX1, _P1,
                                          _P1_INV)


def _brute(docs, k):
    from collections import defaultdict

    occ = defaultdict(list)
    for d, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            occ[tuple(toks[p:p + k].tolist())].append((d, p))
    cov = [np.zeros(len(t), bool) for t in docs]
    for spans in occ.values():
        if len(spans) < 2:
            continue
        canon = min(spans)
        for (d, p) in spans:
            if (d, p) != canon:
                cov[d][p:p + k] = True
    return ([t[~c] for t, c in zip(docs, cov)],
            [int(c.sum()) for c in cov])


def _table(docs):
    return pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "tokens": pa.array([list(map(int, d)) for d in docs],
                           pa.list_(pa.int32())),
    })


def _run(docs, k, **kw):
    import ray.data as rd

    ds = rd.from_arrow(_table(docs)).repartition(4)
    return (dedup_substrings(ds, k=k, num_partitions=8, **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(3)
    docs = [rng.integers(0, 5, size=rng.integers(0, 40)).astype(np.int32)
            for _ in range(60)]
    exp_toks, exp_rem = _brute(docs, 6)
    got = _run(docs, 6)
    assert int(got.n_removed.sum()) == sum(exp_rem) > 0
    for i in range(len(docs)):
        assert np.array_equal(np.asarray(got.tokens[i], np.int32),
                              exp_toks[i]), i


def test_planted_cross_doc_copy_keeps_first(ray_session):
    rng = np.random.default_rng(11)
    base = rng.integers(1000, 2000, 64).astype(np.int32)
    other = rng.integers(5000, 6000, 30).astype(np.int32)
    docs = [base, np.concatenate([other, base[8:40]])]
    got = _run(docs, 8)
    # doc 0 (canonical) intact; doc 1's copied span removed entirely
    assert np.array_equal(np.asarray(got.tokens[0], np.int32), base)
    assert np.array_equal(np.asarray(got.tokens[1], np.int32), other)
    assert int(got.n_removed[1]) == 32


def test_within_doc_self_repeat(ray_session):
    rng = np.random.default_rng(12)
    s = rng.integers(0, 1000, 20).astype(np.int32)
    docs = [np.concatenate([s, s])]
    got = _run(docs, 20)
    # second copy removed, first kept
    assert np.array_equal(np.asarray(got.tokens[0], np.int32), s)
    assert int(got.n_removed[0]) == 20


def test_short_and_empty_docs_untouched(ray_session):
    docs = [np.array([], np.int32), np.array([1, 2, 3], np.int32),
            np.array([1, 2, 3], np.int32)]
    got = _run(docs, 4)  # every doc shorter than k -> no grams at all
    assert int(got.n_removed.sum()) == 0
    assert list(got.tokens[1]) == [1, 2, 3]
    flag = _run(docs, 4, mode="flag")
    assert int(flag.n_dup_tokens.sum()) == 0


def test_flag_mode_counts(ray_session):
    rng = np.random.default_rng(13)
    docs = [rng.integers(0, 4, size=30).astype(np.int32) for _ in range(20)]
    _, exp_rem = _brute(docs, 5)
    got = _run(docs, 5, mode="flag")
    assert [int(x) for x in got.n_dup_tokens] == exp_rem
    assert np.allclose(got.dup_frac,
                       np.array(exp_rem) / np.array([len(d) for d in docs]))


def test_rolling_hash_position_independent():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 100, 50).astype(np.int64).view(np.uint64)
    k = 7
    h = _gram_hashes_one(x, k, _P1, _P1_INV, _MIX1)
    # equal windows hash equal regardless of position
    y = np.concatenate([x[10:10 + k], x[3:3 + k], x[10:10 + k]]) \
        .astype(np.uint64)
    h2 = _gram_hashes_one(y, k, _P1, _P1_INV, _MIX1)
    assert h2[0] == h[10] and h2[k] == h[3] and h2[2 * k] == h[10]
    # and distinct windows (almost surely) differ
    assert len(np.unique(h)) > 40


def test_lookup_pairs_handles_g1_ties():
    d1 = np.array([5, 5, 9], np.uint64)
    d2 = np.array([1, 7, 2], np.uint64)
    g1 = np.array([5, 5, 9, 5, 8], np.uint64)
    g2 = np.array([7, 1, 2, 3, 8], np.uint64)
    out = _lookup_pairs(g1, g2, d1, d2)
    assert list(out) == [1, 0, 2, -1, -1]


def test_broadcast_cap_fail_fast(ray_session):
    docs = [np.arange(30, dtype=np.int32), np.arange(30, dtype=np.int32)]
    with pytest.raises(ValueError, match="broadcast cap"):
        _run(docs, 5, max_dup_grams=3)
