import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from parquet_go_ray.ops import bpe


def test_merge_pass_basic():
    # "abab" under (a,b)->X : two merges
    sym = np.array([1, 2, 1, 2], dtype=np.int32)
    word = np.zeros(4, dtype=np.int32)
    s, w = bpe._merge_pass(sym, word, 1, 2, 9)
    assert s.tolist() == [9, 9]


def test_merge_pass_overlap_left_to_right():
    # "aaaa" under (a,a)->X must merge pairs left-to-right: XX, not XaX
    sym = np.array([1, 1, 1, 1, 1], dtype=np.int32)  # "aaaaa" -> X X a
    word = np.zeros(5, dtype=np.int32)
    s, _ = bpe._merge_pass(sym, word, 1, 1, 9)
    assert s.tolist() == [9, 9, 1]


def test_merge_pass_respects_word_boundary():
    sym = np.array([1, 2, 1, 2], dtype=np.int32)
    word = np.array([0, 0, 1, 1], dtype=np.int32)
    # pair spanning words 0|1 at index 1 must not merge
    s, _ = bpe._merge_pass(sym, word, 2, 1, 9)
    assert s.tolist() == [1, 2, 1, 2]


def test_train_bpe_classic_corpus(ray_session):
    # Sennrich's running example: most frequent pair merges first
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    ds = rd.from_pandas(pd.DataFrame({"text": [" ".join(texts)]}))
    model = bpe.train_bpe(ds, num_merges=10)
    assert model.vocab_size == 256 + len(model.merges)
    # "es" (from newest x6 + widest x3 = 9) is the top first-pair candidate
    first = model.token_bytes[int(model.merges[0][2])]
    assert first == b"es"
    # "est" follows
    assert b"est" in model.token_bytes


def test_bpe_roundtrip_and_counts(ray_session):
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, rng.integers(3, 30))) for _ in range(200)]
    texts.append("")  # empty doc
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    model = bpe.train_bpe(ds, num_merges=60)
    out = bpe.apply_bpe(ds, model).materialize()
    t = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)])
    t = bpe.decode_bpe_column(t, model=model)
    orig = [" ".join(x.split()) for x in t.column("text").to_pylist()]
    assert t.column("text_rt").to_pylist() == orig  # lossless
    n_bpe = np.asarray(t.column("n_bpe"))
    raw_len = np.array([len(x.encode()) for x in orig])
    assert (n_bpe <= raw_len).all()
    # merges compress: far fewer tokens than bytes on this tiny vocab corpus
    assert n_bpe[raw_len > 0].mean() < 0.6 * raw_len[raw_len > 0].mean()
    assert n_bpe[np.array([len(x) == 0 for x in orig])].tolist() == [0]


def test_bpe_deterministic(ray_session):
    texts = ["the quick brown fox jumps over the lazy dog"] * 20 + \
            ["pack my box with five dozen liquor jugs"] * 10
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    m1 = bpe.train_bpe(ds, num_merges=40)
    m2 = bpe.train_bpe(ds, num_merges=40)
    assert np.array_equal(m1.merges, m2.merges)
    assert m1.token_bytes == m2.token_bytes


def test_bpe_unicode(ray_session):
    texts = ["héllo wörld héllo", "héllo wörld", "naïve café naïve café"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    model = bpe.train_bpe(ds, num_merges=30)
    out = bpe.apply_bpe(ds, model).materialize()
    t = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)])
    t = bpe.decode_bpe_column(t, model=model)
    assert t.column("text_rt").to_pylist() == texts


def test_incremental_trainer_matches_rescan_reference():
    """The incremental (linked-list + delta-count + lazy-heap) merge loop
    must produce IDENTICAL merges to the O(merges x stream) rescan
    reference, including tie-breaks and the <2 stop rule — over corpora
    with repeated-symbol runs, skewed weights, and many word types."""
    rng = np.random.default_rng(42)
    cases = []
    # random word corpora over a small byte alphabet (forces heavy merging)
    for trial in range(4):
        n_types = int(rng.integers(50, 400))
        words = [bytes(rng.integers(97, 97 + int(rng.integers(2, 7)),
                                    size=int(rng.integers(1, 14))).tolist())
                 for _ in range(n_types)]
        counts = rng.integers(1, 50, size=n_types).astype(np.int64)
        cases.append((words, counts, int(rng.integers(20, 300))))
    # pathological runs: overlap parity + left==right merges all the way up
    cases.append(([b"aaaa", b"aaa", b"aaaaaaa", b"ab", b"ba"],
                  np.array([5, 3, 2, 9, 9], dtype=np.int64), 12))
    # empty / single-byte words
    cases.append(([b"x", b"y", b"xy", b"yx"],
                  np.array([4, 4, 3, 3], dtype=np.int64), 10))
    # ONLY single-byte words: zero adjacent pairs anywhere (the empty-deltas
    # path that crashed _agg_deltas on an all-1-byte vocabulary)
    cases.append(([b"a", b"b", b"c"],
                  np.array([7, 5, 2], dtype=np.int64), 5))
    for words, counts, n_merges in cases:
        sym, word = bpe._words_to_symbols(words)
        ref = bpe._merge_loop_rescan(sym.copy(), word.copy(), counts,
                                     n_merges)
        got, final, lens = bpe._merge_loop_incremental(
            sym.copy(), word.copy(), counts, n_merges)
        np.testing.assert_array_equal(got, ref)
        # the exported final stream must equal re-encoding every word with
        # the merges (the cache contract)
        esym, eword = bpe._merge_passes_rank_driven(sym.copy(), word.copy(),
                                                    got)
        np.testing.assert_array_equal(final, esym.astype(np.int32))
        np.testing.assert_array_equal(
            lens, np.bincount(eword, minlength=len(words)))


def test_incremental_trainer_rich_vocab():
    """Digit-composed Zipf word types (the bpe_train_32k bench profile):
    thousands of types, hundreds of merges, none exhausted — pins the
    manual-slice index build against the rescan reference at a scale where
    the per-merge index updates actually run many segments per merge."""
    n_types = 5000
    words = [("w" + str(r)).encode() for r in range(1, n_types + 1)]
    counts = np.maximum((1e6 / np.arange(1, n_types + 1) ** 1.05), 1
                        ).astype(np.int64)
    sym, word = bpe._words_to_symbols(words)
    ref = bpe._merge_loop_rescan(sym.copy(), word.copy(), counts, 500)
    got, final, lens = bpe._merge_loop_incremental(
        sym.copy(), word.copy(), counts, 500)
    np.testing.assert_array_equal(got, ref)
    assert len(got) == 500  # rich vocab: merges must not exhaust early
    # cache contract: exported stream == rank-driven re-encode of every word
    esym, eword = bpe._merge_passes_rank_driven(sym.copy(), word.copy(), got)
    np.testing.assert_array_equal(final, esym.astype(np.int32))
    np.testing.assert_array_equal(lens, np.bincount(eword,
                                                    minlength=n_types))
    # every word decodes back through the token byte table
    token_bytes = [bytes([i]) for i in range(256)]
    for l, r, _ in got:
        token_bytes.append(token_bytes[int(l)] + token_bytes[int(r)])
    offs = np.zeros(n_types + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    for i in (0, 1, 17, 4999):
        assert b"".join(token_bytes[s] for s in
                        final[offs[i]:offs[i + 1]]) == words[i]


def test_encode_cache_and_oov_agree():
    """Cached-word lookup and the OOV merge loop must tokenize identically;
    OOV words (absent from training) must still roundtrip."""
    words = [b"low", b"lower", b"newest", b"widest", b"aaaa"]
    counts = np.array([5, 2, 6, 3, 4], dtype=np.int64)
    sym, word = bpe._words_to_symbols(words)
    merges, final, lens = bpe._merge_loop_incremental(sym, word, counts, 30)
    token_bytes = [bytes([i]) for i in range(256)]
    for l, r, _ in merges:
        token_bytes.append(token_bytes[int(l)] + token_bytes[int(r)])
    offs = np.zeros(len(words) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    cached = bpe.BpeModel(merges=merges, token_bytes=token_bytes,
                          cache_words=pa.array(words, pa.binary()),
                          cache_ids=final, cache_offs=offs)
    plain = bpe.BpeModel(merges=merges, token_bytes=token_bytes)
    queries = [b"lowest", b"low", b"aaaa", b"aaaaaa", b"zzz", b"newest"]
    s1, l1 = bpe._encode_unique_words(queries, cached)
    s2, l2 = bpe._encode_unique_words(queries, plain)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(l1, l2)
    # every encoding decodes back to the original bytes
    o = np.zeros(len(queries) + 1, dtype=np.int64)
    np.cumsum(l1, out=o[1:])
    for i, q in enumerate(queries):
        assert cached.decode(s1[o[i]:o[i + 1]]) == q


def test_rank_incremental_apply_matches_rescan():
    """The incremental rank-driven apply (linked list + ascending rank heap)
    must produce IDENTICAL tokenizations to the O(ranks x stream) rescan
    reference — over random vocabularies, OOV words the model never saw,
    and pathological same-symbol runs (the _alternate_sites parity path)."""
    rng = np.random.default_rng(23)
    for trial in range(12):
        n_types = int(rng.integers(5, 600))
        train_words = [bytes(rng.integers(97, 97 + int(rng.integers(2, 7)),
                                          size=int(rng.integers(1, 14))).tolist())
                       for _ in range(n_types)]
        counts = rng.integers(1, 50, size=n_types).astype(np.int64)
        sym, word = bpe._words_to_symbols(train_words)
        merges, _, _ = bpe._merge_loop_incremental(
            sym.copy(), word.copy(), counts, int(rng.integers(10, 200)))
        # apply to FRESH words (OOV mix) + run-heavy pathologicals
        apply_words = [bytes(rng.integers(97, 105,
                                          size=int(rng.integers(1, 20))).tolist())
                       for _ in range(200)] + \
            [b"aaaaaaaa", b"aaa", b"abababab", b"a", b""[:0] or b"z"]
        asym, aword = bpe._words_to_symbols(apply_words)
        rsym, rword = bpe._merge_passes_rank_driven(asym.copy(), aword.copy(),
                                                    merges)
        isym, iword = bpe._merge_passes_rank_incremental(
            asym.copy(), aword.copy(), merges)
        np.testing.assert_array_equal(isym, rsym.astype(np.int32))
        np.testing.assert_array_equal(iword, rword)


def test_model_save_load_roundtrip(ray_session, tmp_path):
    """A trained tokenizer must persist across sessions: save stores merges
    + the word-type cache (token_bytes is derived), load reconstructs a
    model whose tokenization is byte-identical, with and without cache."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["the cat sat", "the the the", "cat cat mat",
                          "héllo wörld", "", "sat on the mat"]),
    }))
    m = bpe.train_bpe(ds, num_merges=32)
    p = str(tmp_path / "model.npz")
    m.save(p)
    m2 = bpe.BpeModel.load(p)
    assert np.array_equal(m.merges, m2.merges)
    assert m.token_bytes == m2.token_bytes
    assert len(m2.cache_words) == len(m.cache_words)
    a = bpe.apply_bpe(ds, m).to_pandas().sort_values("doc_id")
    b = bpe.apply_bpe(ds, m2).to_pandas().sort_values("doc_id")
    assert all(list(x) == list(y) for x, y in zip(a.bpe_ids, b.bpe_ids))

    m3 = bpe.train_bpe(ds, num_merges=8, cache_words=False)
    m3.save(p)
    m4 = bpe.BpeModel.load(p)
    assert np.array_equal(m3.merges, m4.merges) and m4.cache_words is None
