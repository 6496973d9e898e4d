"""Distributed byte-level BPE tokenizer training and application.

Algorithm: byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — public
paper), at byte level (as popularized by GPT-2's public tokenizer). The
reference engine has no tokenizer; this is one of the training-data-pipeline
operators this repo adds as first-class (brief: token counting exists in
``ops/text.py``; this trains the vocabulary those counts presuppose).

Scale architecture — the standard production shape:

- The ONLY corpus-wide pass is a distributed word-frequency aggregation
  (``build_vocab``: per-batch combiner, (token, partial-count) shuffle —
  bounded by vocabulary, not corpus length).
- The merge loop runs over the aggregated WORD-TYPE table (vocab-sized;
  ``max_word_types`` caps it at the most frequent types), fully vectorized:
  each iteration is one weighted pair count + one flat merge pass over the
  concatenated symbol stream of all word types. No per-word Python loops.
- Application is an actor-pool ``map_batches``: the merge table is
  ``ray.put`` once and read zero-copy in ``__init__``; each batch
  dictionary-encodes its words, encodes only the UNIQUE words (one flat
  vectorized merge pass per merge rank), then gathers per-occurrence.

Within-word merges only (words are whitespace-pretokenized); a literal
space byte (id 32) joins words in the output id stream, so
``decode(encode(x)) == " ".join(x.split())`` exactly.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_EOW = None  # byte-level: no end-of-word marker; space id 32 separates words
_SPACE_ID = 32


@dataclass
class BpeModel:
    """A trained byte-level BPE tokenizer: 256 byte symbols + one new symbol
    per merge. ``merges[k] = (left, right, new_id=256+k)`` in rank order;
    ``token_bytes[i]`` is symbol i's byte string.

    ``cache_*`` (optional) is the trained word-type table's final
    tokenization, exported for free by the incremental trainer: encode
    becomes an exact-match lookup for every word seen in training (the Zipf
    bulk of any corpus) and runs the merge loop only for OOV words. The
    cache match is EXACT: the per-actor hash index (_CacheLookup) verifies
    every hash hit by byte equality, so a collision degrades to the OOV
    merge loop — it can never tokenize the wrong word."""

    merges: np.ndarray  # (M, 3) int32
    token_bytes: list[bytes] = field(repr=False)
    cache_words: pa.Array | None = field(default=None, repr=False)
    cache_ids: np.ndarray | None = field(default=None, repr=False)  # flat i32
    cache_offs: np.ndarray | None = field(default=None, repr=False)  # i64 n+1

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def decode(self, ids) -> bytes:
        tb = self.token_bytes
        return b"".join(tb[int(i)] for i in np.asarray(ids, dtype=np.int64))

    def save(self, path: str) -> None:
        """Persist the model as one compressed npz blob via fsio (local
        path or object-store URI): merges plus the optional word-type
        cache. ``token_bytes`` is fully derived from ``merges`` and is
        reconstructed on load, never stored — train once, ``BpeModel.load``
        in every later tokenize job."""
        import io

        from ..sources import fsio

        kw = {"merges": np.ascontiguousarray(self.merges, dtype=np.int32)}
        if self.cache_words is not None and len(self.cache_words):
            arr = self.cache_words
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.cast(pa.large_binary())
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
            offs = offs[arr.offset: arr.offset + len(arr) + 1]
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            kw.update(
                word_offs=np.ascontiguousarray(offs - offs[0]),
                word_data=np.ascontiguousarray(data[offs[0]:offs[-1]]),
                cache_ids=np.ascontiguousarray(self.cache_ids, np.int32),
                cache_offs=np.ascontiguousarray(self.cache_offs, np.int64))
        buf = io.BytesIO()
        np.savez_compressed(buf, **kw)
        fsio.write_bytes_atomic(path, buf.getvalue())

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        """Inverse of :meth:`save`; byte-identical tokenization guaranteed
        (merges drive everything; the cache is an exact-match accelerator)."""
        import io

        from ..sources import fsio

        z = np.load(io.BytesIO(bytes(fsio.read_bytes(path))))
        merges = np.ascontiguousarray(z["merges"], dtype=np.int32)
        token_bytes = [bytes([i]) for i in range(256)]
        for left, right, _ in merges:
            token_bytes.append(token_bytes[int(left)] + token_bytes[int(right)])
        model = cls(merges=merges, token_bytes=token_bytes)
        if "word_offs" in z.files:
            offs = np.ascontiguousarray(z["word_offs"], dtype=np.int64)
            data = np.ascontiguousarray(z["word_data"], dtype=np.uint8)
            arr = pa.Array.from_buffers(
                pa.large_binary(), len(offs) - 1,
                [None, pa.py_buffer(offs), pa.py_buffer(data)])
            # train builds the cache as pa.binary(); keep types identical so
            # pc.index_in on the apply path never sees a type mismatch
            model.cache_words = arr.cast(pa.binary())
            model.cache_ids = np.ascontiguousarray(z["cache_ids"], np.int32)
            model.cache_offs = np.ascontiguousarray(z["cache_offs"], np.int64)
        return model


def _merge_pass(sym: np.ndarray, word: np.ndarray, left: int, right: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """One exhaustive left-to-right merge of (left, right) -> new_id over the
    flat symbol stream ``sym`` with word-id array ``word`` (merges never
    cross word boundaries). Overlapping matches (only possible when
    left == right, e.g. 'aaaa' under (a,a)) resolve left-to-right via run
    parity — all vectorized."""
    if len(sym) < 2:
        return sym, word
    m = (sym[:-1] == left) & (sym[1:] == right) & (word[:-1] == word[1:])
    if left == right:
        # keep alternate matches inside each run of consecutive True
        idx = np.flatnonzero(m)
        if len(idx):
            new_run = np.ones(len(idx), dtype=bool)
            new_run[1:] = idx[1:] != idx[:-1] + 1
            run_start = idx[new_run][np.cumsum(new_run) - 1]
            keep = ((idx - run_start) % 2) == 0
            m = np.zeros(len(m), dtype=bool)
            m[idx[keep]] = True
    pos = np.flatnonzero(m)
    if not len(pos):
        return sym, word
    sym = sym.copy()
    sym[pos] = new_id
    drop = np.zeros(len(sym), dtype=bool)
    drop[pos + 1] = True
    keepm = ~drop
    return sym[keepm], word[keepm]


def _words_to_symbols(words: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Flat uint8->int32 symbol stream + word-id array for a word list."""
    if not words:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    blob = b"".join(words)
    sym = np.frombuffer(blob, dtype=np.uint8).astype(np.int32)
    lens = np.array([len(w) for w in words], dtype=np.int64)
    word = np.repeat(np.arange(len(words), dtype=np.int32), lens)
    return sym, word


def _merge_loop_rescan(sym: np.ndarray, word: np.ndarray, wcount: np.ndarray,
                       num_merges: int) -> np.ndarray:
    """The O(stream) per-merge reference loop (full pair recount + full
    merge sweep each iteration). Kept as the SEMANTICS REFERENCE: the
    incremental trainer below must produce identical merges — pinned in
    tests/test_bpe.py. Use only for small vocabularies."""
    merges = np.empty((num_merges, 3), dtype=np.int32)
    n_done = 0
    for _ in range(num_merges):
        if len(sym) < 2:
            break
        adj = word[:-1] == word[1:]
        keys = (sym[:-1].astype(np.int64) << 32) | sym[1:].astype(np.int64)
        keys = keys[adj]
        if not len(keys):
            break
        w = wcount[word[:-1][adj]]
        uk, inv = np.unique(keys, return_inverse=True)
        totals = np.bincount(inv, weights=w.astype(np.float64))
        best = int(np.argmax(totals))  # ties: first occurrence = smallest key
        if totals[best] < 2:
            break  # nothing repeats; further merges are noise
        left = int(uk[best] >> 32)
        right = int(uk[best] & 0xFFFFFFFF)
        new_id = 256 + n_done
        merges[n_done] = (left, right, new_id)
        sym, word = _merge_pass(sym, word, left, right, new_id)
        n_done += 1
    return merges[:n_done]


def _agg_deltas(keys: np.ndarray, weights: np.ndarray):
    """Group (key, weight) deltas by key: (unique keys, summed weights)."""
    if not len(keys):
        return keys, weights.astype(np.int64)
    o = np.argsort(keys, kind="stable")
    k, w = keys[o], weights[o]
    b = np.empty(len(k), dtype=bool)
    b[0] = True
    np.not_equal(k[1:], k[:-1], out=b[1:])
    firsts = np.flatnonzero(b)
    return k[firsts], np.add.reduceat(w, firsts)


def _index_append(index: dict[int, list], keys: np.ndarray,
                  pos: np.ndarray) -> None:
    """Group ``pos`` by pair ``keys`` and append one candidate-position array
    per key to ``index`` — the one sort->boundaries->manual-slices idiom both
    the initial build and the per-merge add share. Manual slices, not
    np.split: array_split's per-segment overhead (swapaxes + wrapper calls)
    dominated the merge loop at 32k merges."""
    o = np.argsort(keys, kind="stable")
    ks, ps = keys[o], pos[o]
    bounds = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    bb = bounds.tolist() + [len(ps)]
    for i, kk in enumerate(ks[bounds].tolist()):
        index.setdefault(int(kk), []).append(ps[bb[i]:bb[i + 1]])


def _init_chain(sym: np.ndarray, word: np.ndarray):
    """Doubly-linked list over the symbol cells (-1 marks word boundaries,
    so merges can never cross words) — shared by the incremental trainer
    and the incremental rank-driven apply."""
    n = len(sym)
    sym = sym.astype(np.int64).copy()
    nxt = np.arange(1, n + 1, dtype=np.int64)
    nxt[-1] = -1
    prv = np.arange(-1, n - 1, dtype=np.int64)
    brk = word[1:] != word[:-1]
    nxt[:-1][brk] = -1
    prv[1:][brk] = -1
    return sym, nxt, prv


def _alternate_sites(P: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    """Overlapping same-symbol runs ('aaaa'): keep alternate sites
    left-to-right — the same parity rule as _merge_pass, so the incremental
    loops stay equivalent to the rescan reference. ``P`` must be sorted."""
    Pset = set(P.tolist())
    skip, sel = set(), []
    for p in P.tolist():
        if p in skip:
            continue
        sel.append(p)
        q = int(nxt[p])
        if q in Pset:
            skip.add(q)
    return np.asarray(sel, dtype=np.int64)


def _merge_loop_incremental(sym: np.ndarray, word: np.ndarray,
                            wcount: np.ndarray, num_merges: int):
    """Incremental BPE trainer: O(stream + merge events), not
    O(merges x stream) like the rescan reference.

    The symbol stream is a doubly-linked list over a fixed cell array
    (``nxt``/``prv``; -1 marks word boundaries, so merges can never cross
    words and no word-equality check is needed after init). Exact weighted
    pair counts live in a dict updated by vectorized deltas around each
    merge site; the best pair comes from a lazy max-heap keyed
    ``(-count, pair)`` — identical tie-breaking to the reference's argmax
    over sorted unique keys (smallest pair key wins among equal counts),
    and counts stay exact integers so the orders agree everywhere. A
    pair -> candidate-positions index is validated lazily at selection
    time (a cell's pair key can never repeat — new pairs always contain a
    strictly newer symbol id — so stale entries are simply skipped).

    Returns (merges (M,3) int32, final flat symbol stream int32, per-word
    token lengths int64) — the final stream IS every trained word type's
    tokenization, exported as the encode cache."""
    import heapq

    n = len(sym)
    merges = np.empty((num_merges, 3), dtype=np.int32)
    if n == 0 or num_merges == 0:
        lens = np.bincount(word, minlength=wcount.shape[0]).astype(np.int64) \
            if n else np.zeros(wcount.shape[0], dtype=np.int64)
        return merges[:0], sym.astype(np.int32), lens
    sym, nxt, prv = _init_chain(sym, word)
    alive = np.ones(n, dtype=bool)
    wpos = wcount[word].astype(np.int64)  # pair weight = weight of its word

    p0 = np.flatnonzero(nxt != -1)
    if not len(p0):  # no adjacent pair anywhere (all words single-symbol)
        return (merges[:0], sym.astype(np.int32),
                np.bincount(word, minlength=wcount.shape[0]).astype(np.int64))
    k0 = (sym[p0] << 32) | sym[p0 + 1]
    uk, tot = _agg_deltas(k0, wpos[p0])
    counts: dict[int, int] = dict(zip(uk.tolist(), tot.tolist()))
    # index: pair key -> list of candidate position arrays (lazily validated)
    index: dict[int, list] = {}
    _index_append(index, k0, p0)
    heap = [(-c, k) for k, c in counts.items()]
    heapq.heapify(heap)

    n_done = 0
    while n_done < num_merges and heap:
        negc, key = heapq.heappop(heap)
        c = counts.get(key, 0)
        if c != -negc:
            continue  # stale entry; the fresh one is elsewhere in the heap
        if c < 2:
            break  # nothing repeats; further merges are noise
        left, right = key >> 32, key & 0xFFFFFFFF
        plist = index.pop(key, None)
        P = np.unique(np.concatenate(plist)) if plist else \
            np.empty(0, np.int64)
        # validate candidates against the CURRENT stream
        P = P[alive[P] & (sym[P] == left)]
        r = nxt[P]
        m = r != -1
        P, r = P[m], r[m]
        m = sym[r] == right
        P, r = P[m], r[m]
        if not len(P):  # can't happen while counts are exact; hard guard
            counts.pop(key, None)
            continue
        if left == right and len(P) > 1:
            P = _alternate_sites(P, nxt)  # P is sorted (np.unique)
            r = nxt[P]
        # --- deltas for neighbor pairs destroyed by this merge (pre-mutate)
        l = prv[P]
        lm = l != -1
        r2 = nxt[r]
        r2m = r2 != -1
        rm_pos = np.unique(np.concatenate((l[lm], r[r2m])))
        rm_keys = (sym[rm_pos] << 32) | sym[nxt[rm_pos]]
        keep = rm_keys != key  # the merged pair itself is zeroed wholesale
        rm_pos, rm_keys = rm_pos[keep], rm_keys[keep]
        new_id = 256 + n_done
        merges[n_done] = (left, right, new_id)
        n_done += 1
        counts.pop(key, None)  # every valid occurrence is consumed
        if len(rm_pos):
            dk, dw = _agg_deltas(rm_keys, wpos[rm_pos])
            for kk, ww in zip(dk.tolist(), dw.tolist()):
                cc = counts.get(kk, 0) - ww
                if cc <= 0:
                    counts.pop(kk, None)
                else:
                    counts[kk] = cc
                    heapq.heappush(heap, (-cc, kk))
        # --- mutate: left cell becomes new_id, right cell dies, relink
        sym[P] = new_id
        alive[r] = False
        nxt[P] = r2
        tgt = r2[r2m]
        prv[tgt] = P[r2m]
        # --- deltas for pairs created around the merged cells (post-mutate)
        add_pos = np.concatenate((l[lm], P[nxt[P] != -1]))
        add_pos = np.unique(add_pos)
        add_pos = add_pos[alive[add_pos]]  # chain middles died above
        if len(add_pos):
            ak = (sym[add_pos] << 32) | sym[nxt[add_pos]]
            dk, dw = _agg_deltas(ak, wpos[add_pos])
            for kk, ww in zip(dk.tolist(), dw.tolist()):
                cc = counts.get(kk, 0) + ww
                counts[kk] = cc
                heapq.heappush(heap, (-cc, kk))
            _index_append(index, ak, add_pos)

    final = sym[alive].astype(np.int32)
    lens = np.bincount(word[alive], minlength=wcount.shape[0]).astype(np.int64)
    return merges[:n_done], final, lens


def train_bpe(ds, *, num_merges: int = 200, text_col: str = "text",
              min_count: int = 1, max_word_types: int = 1_000_000,
              cache_words: bool = True) -> BpeModel:
    """Train byte-level BPE on a Dataset's ``text_col``. One distributed
    word-count shuffle; the merge loop is driver-side over the word-TYPE
    table (each unique word weighted by its corpus count), incremental —
    O(stream + merge events), so 32k-merge vocabularies train in seconds
    where the per-merge rescan loop would take hours.

    ``cache_words=True`` (default) attaches the trained types' final
    tokenization to the model: ``apply_bpe`` then encodes known words by
    exact lookup and runs merges only for OOV words."""
    from .text import build_vocab

    vocab = build_vocab(ds, text_col, min_count=min_count)
    toks, counts = [], []
    for b in vocab.iter_batches(batch_format="pyarrow", batch_size=None):
        toks.append(b.column("token").combine_chunks().cast(pa.binary()))
        counts.append(np.asarray(b.column("count"), dtype=np.int64))
    if toks:
        words_arr = pa.concat_arrays(toks)
        cnt = np.concatenate(counts)
    else:
        words_arr, cnt = pa.array([], pa.binary()), np.empty(0, np.int64)
    if len(cnt) > max_word_types:
        # deterministic top-K: by count desc, then word bytes asc
        order = np.lexsort((np.asarray(words_arr).astype(object), -cnt))[:max_word_types]
        order.sort()
        words_arr = words_arr.take(pa.array(order))
        cnt = cnt[order]
    words = words_arr.to_pylist()
    sym, word = _words_to_symbols(words)

    merges, final_sym, final_lens = _merge_loop_incremental(
        sym, word, cnt, num_merges)
    token_bytes = [bytes([i]) for i in range(256)]
    for left, right, _ in merges:
        token_bytes.append(token_bytes[int(left)] + token_bytes[int(right)])
    model = BpeModel(merges=merges, token_bytes=token_bytes)
    if cache_words and len(words):
        offs = np.zeros(len(words) + 1, dtype=np.int64)
        np.cumsum(final_lens, out=offs[1:])
        model.cache_words = words_arr
        model.cache_ids = final_sym
        model.cache_offs = offs
    return model


def _merge_passes_rank_driven(sym: np.ndarray, word: np.ndarray,
                              merges: np.ndarray
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Apply merges to a symbol stream by repeatedly finding the LOWEST
    applicable rank and applying it exhaustively. Equivalent to one pass per
    rank in rank order (a merge only ever creates pairs containing its new,
    strictly-higher id, so no lower-rank pair can appear later), but skips
    the ranks absent from the stream — iterations are bounded by the number
    of DISTINCT ranks actually used, not the vocabulary size."""
    if not len(merges) or len(sym) < 2:
        return sym, word
    mkeys = (merges[:, 0].astype(np.int64) << 32) | merges[:, 1].astype(np.int64)
    korder = np.argsort(mkeys, kind="stable")
    mk_sorted = mkeys[korder]
    while len(sym) >= 2:
        adj = word[:-1] == word[1:]
        keys = ((sym[:-1].astype(np.int64) << 32) | sym[1:].astype(np.int64))[adj]
        if not len(keys):
            break
        uk = np.unique(keys)
        pos = np.searchsorted(mk_sorted, uk)
        pos_c = np.minimum(pos, len(mk_sorted) - 1)
        hit = mk_sorted[pos_c] == uk
        if not hit.any():
            break
        rank = int(korder[pos_c[hit]].min())
        left, right, new_id = (int(x) for x in merges[rank])
        sym, word = _merge_pass(sym, word, left, right, new_id)
    return sym, word


def _merge_passes_rank_incremental(sym: np.ndarray, word: np.ndarray,
                                   merges: np.ndarray
                                   ) -> tuple[np.ndarray, np.ndarray]:
    """Incremental rank-driven apply — the encode-side analogue of
    _merge_loop_incremental: O(stream + merge events) instead of the rescan
    loop's O(stream) PER APPLIED RANK (which dominated OOV-heavy batches:
    a capped vocabulary leaves every Zipf-tail word OOV at apply time).

    Equivalent to _merge_passes_rank_driven, pinned by test: the heap pops
    the lowest applicable rank and exhausts it; a merge only creates pairs
    containing its strictly-newer id, and such a pair's own merge (if any)
    was necessarily trained AFTER that id existed, so every newly created
    mergeable pair has a strictly higher rank and ascending-heap order IS
    rank order. Overlap parity comes from the shared _alternate_sites."""
    import heapq

    n = len(sym)
    if not len(merges) or n < 2:
        return sym.astype(np.int32), word
    mkeys = (merges[:, 0].astype(np.int64) << 32) | \
        merges[:, 1].astype(np.int64)
    korder = np.argsort(mkeys, kind="stable")
    mk_sorted = mkeys[korder]

    def ranks_of(keys: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(mk_sorted, keys)
        pos_c = np.minimum(pos, len(mk_sorted) - 1)
        return np.where(mk_sorted[pos_c] == keys, korder[pos_c], -1)

    sym, nxt, prv = _init_chain(sym, word)
    alive = np.ones(n, dtype=bool)
    p0 = np.flatnonzero(nxt != -1)
    if not len(p0):
        return sym.astype(np.int32), word
    k0 = (sym[p0] << 32) | sym[p0 + 1]
    r0 = ranks_of(k0)
    m0 = r0 >= 0
    index: dict[int, list] = {}
    _index_append(index, k0[m0], p0[m0])
    heap = sorted(set(r0[m0].tolist()))  # ascending list IS a valid heap
    in_heap = set(heap)
    while heap:
        rank = heapq.heappop(heap)
        in_heap.discard(rank)
        left, right, new_id = (int(x) for x in merges[rank])
        plist = index.pop((left << 32) | right, None)
        if not plist:
            continue
        P = np.unique(np.concatenate(plist))
        # validate candidates against the CURRENT stream
        P = P[alive[P] & (sym[P] == left)]
        r = nxt[P]
        m = r != -1
        P, r = P[m], r[m]
        m = sym[r] == right
        P, r = P[m], r[m]
        if not len(P):
            continue
        if left == right and len(P) > 1:
            P = _alternate_sites(P, nxt)  # P is sorted (np.unique)
            r = nxt[P]
        l = prv[P]
        lm = l != -1
        r2 = nxt[r]
        r2m = r2 != -1
        # mutate: left cell becomes new_id, right cell dies, relink
        sym[P] = new_id
        alive[r] = False
        nxt[P] = r2
        tgt = r2[r2m]
        prv[tgt] = P[r2m]
        # pairs created around the merged cells: index + heap only the
        # mergeable ones
        add_pos = np.unique(np.concatenate((l[lm], P[nxt[P] != -1])))
        add_pos = add_pos[alive[add_pos]]  # chain middles died above
        if len(add_pos):
            ak = (sym[add_pos] << 32) | sym[nxt[add_pos]]
            ar = ranks_of(ak)
            am = ar >= 0
            if am.any():
                _index_append(index, ak[am], add_pos[am])
                for rr in set(ar[am].tolist()):
                    if rr not in in_heap:
                        heapq.heappush(heap, rr)
                        in_heap.add(rr)
    return sym[alive].astype(np.int32), word[alive]


def _binary_offsets_data(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(absolute offsets int64, data uint8) views of a binary/string array."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=len(arr) + 1,
                         offset=arr.offset * 4).astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None \
        else np.empty(0, np.uint8)
    return offs, data


class _CacheLookup:
    """Per-actor exact-match index over the model's trained-word cache.

    ``pc.index_in`` rebuilds a hash table of the whole value_set on EVERY
    call — with the 1M-word cache (the ``max_word_types`` cap, which the
    32k-merge bench hits exactly) that build dwarfed the actual probes on
    every 1024-row batch. Built once per actor instead: a sorted array of
    64-bit content hashes (16 MB per 1M words) probed by searchsorted, with
    every hash hit VERIFIED by byte equality — a collision (or a duplicate
    cache hash shadowing a true match at the next slot) degrades to the OOV
    merge loop, never to a wrong encoding."""

    def __init__(self, model: BpeModel):
        from ..pipelines.encode import _stable_hash

        cw = model.cache_words
        cw = cw.combine_chunks() if isinstance(cw, pa.ChunkedArray) else cw
        self.offs, self.data = _binary_offsets_data(cw)
        h = _stable_hash(cw)
        self.order = np.argsort(h, kind="stable").astype(np.int64)
        self.h_sorted = h[self.order]

    def lookup(self, warr: pa.Array) -> np.ndarray:
        """Cache index per word (int64), -1 for misses."""
        from ..functions.segments import ragged_gather_indices
        from ..pipelines.encode import _stable_hash

        n = len(warr)
        out = np.full(n, -1, dtype=np.int64)
        if n == 0 or not len(self.h_sorted):
            return out
        hw = _stable_hash(warr)
        pos = np.searchsorted(self.h_sorted, hw)
        pos_c = np.minimum(pos, len(self.h_sorted) - 1)
        cand = self.h_sorted[pos_c] == hw
        ci = self.order[pos_c[cand]]
        wi = np.flatnonzero(cand)
        woffs, wdata = _binary_offsets_data(warr)
        wl = woffs[wi + 1] - woffs[wi]
        lm = wl == (self.offs[ci + 1] - self.offs[ci])
        ci, wi, wl = ci[lm], wi[lm], wl[lm]
        if len(wi):
            gw = wdata[ragged_gather_indices(woffs[wi], wl)]
            gc = self.data[ragged_gather_indices(self.offs[ci], wl)]
            starts = np.zeros(len(wi), dtype=np.int64)
            np.cumsum(wl[:-1], out=starts[1:])  # wl >= 1: no empty words
            bad = np.add.reduceat(gw != gc, starts) > 0
            out[wi[~bad]] = ci[~bad]
        return out


def _encode_unique_words(words, model: BpeModel,
                         lookup: _CacheLookup | None = None
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Encode a unique-word list (``list[bytes]`` or a binary/string
    ``pa.Array``): returns (flat ids int32, per-word lengths int64). Words
    present in the model's training cache (the common case — the Zipf bulk
    of any same-distribution corpus) are an exact-match lookup; only OOV
    words run the rank-driven merge loop. Pass a per-actor ``lookup`` to
    avoid index_in's per-call value_set hash rebuild (see _CacheLookup)."""
    import pyarrow.compute as pc

    is_arrow = isinstance(words, (pa.Array, pa.ChunkedArray))
    if is_arrow:
        warr = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
            else words
        warr = warr.cast(pa.binary())
        n = len(warr)
        words = None  # materialized lazily, only for the OOV subset
    else:
        n = len(words)
        warr = pa.array(words, pa.binary()) if n else None
    if model.cache_words is not None and n:
        if lookup is not None:
            idx_np = lookup.lookup(warr)
        else:
            idx = pc.index_in(warr, value_set=model.cache_words)
            idx_np = np.asarray(idx.fill_null(-1), dtype=np.int64)
        known = idx_np >= 0
        lens = np.zeros(n, dtype=np.int64)
        ki = idx_np[known]
        co, ci = model.cache_offs, model.cache_ids
        lens[known] = co[ki + 1] - co[ki]
        if known.all():
            oov_words = []
        elif is_arrow:
            oov_words = warr.filter(pa.array(~known)).to_pylist()
        else:
            oov_words = [w for w, k in zip(words, known) if not k]
        if oov_words:
            osym, oword = _merge_passes_rank_incremental(
                *_words_to_symbols(oov_words), model.merges)
            olens = np.bincount(oword, minlength=len(oov_words)) \
                .astype(np.int64) if len(oword) else \
                np.zeros(len(oov_words), dtype=np.int64)
            lens[~known] = olens
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        out = np.empty(int(offs[-1]), dtype=np.int32)
        from ..functions.segments import ragged_gather_indices
        if known.any():
            out[ragged_gather_indices(offs[:-1][known], lens[known])] = \
                ci[ragged_gather_indices(co[ki], lens[known])]
        if oov_words:
            ooffs = np.zeros(len(oov_words) + 1, dtype=np.int64)
            np.cumsum(olens, out=ooffs[1:])
            out[ragged_gather_indices(offs[:-1][~known], lens[~known])] = \
                osym[ragged_gather_indices(ooffs[:-1], olens)]
        return out, lens
    if is_arrow:
        words = warr.to_pylist() if n else []
    sym, word = _merge_passes_rank_incremental(*_words_to_symbols(words),
                                               model.merges)
    lens = np.bincount(word, minlength=n).astype(np.int64) \
        if len(word) else np.zeros(n, dtype=np.int64)
    return sym.astype(np.int32), lens


class BpeEncoder:
    """Actor-pool stage: encode ``text_col`` to BPE ids (``out_col``,
    list<int32>; spaces between words are the literal byte-32 token) and a
    token count (``count_col``). The model rides a ``ray.put`` ref — read
    once per actor in ``__init__``, never per batch."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "bpe_ids", count_col: str = "n_bpe"):
        import ray

        self.model: BpeModel = ray.get(model_ref)
        self.text_col, self.out_col, self.count_col = text_col, out_col, count_col
        # once per actor, never per batch (see _CacheLookup)
        self.lookup = (_CacheLookup(self.model)
                       if self.model.cache_words is not None else None)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.segments import ragged_gather_indices, segment_positions

        # explicit null contract: null text == empty text (zero tokens);
        # without the fill the alignment below rests on utf8_split_whitespace
        # happening to emit zero-extent offsets for null slots
        col = pc.fill_null(t.column(self.text_col).combine_chunks(), "")
        split = pc.utf8_split_whitespace(col)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        # per-doc word counts after dropping edge empties (same fold as
        # _gram_hash_sets in ops/dedup.py)
        woffs = np.asarray(split.offsets, dtype=np.int64)
        keepw = np.asarray(nonempty)
        csum = np.zeros(len(keepw) + 1, dtype=np.int64)
        np.cumsum(keepw, out=csum[1:])
        per_doc = csum[woffs[1:] - woffs[0]] - csum[woffs[:-1] - woffs[0]]
        words = flat.filter(nonempty).cast(pa.binary())

        # dictionary-encode: BPE only the unique words of the batch (the
        # dictionary array goes straight to the encoder — no to_pylist)
        dic = words.dictionary_encode()
        uniq = dic.dictionary
        codes = np.asarray(dic.indices, dtype=np.int64) if len(words) else \
            np.empty(0, np.int64)
        usym, ulens = _encode_unique_words(uniq, self.model,
                                           lookup=self.lookup)
        uoffs = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(ulens, out=uoffs[1:])
        # gather each occurrence's ids; +1 slot per word for the joining
        # space (dropped for the last word of each doc)
        occ_lens = ulens[codes] if len(codes) else np.empty(0, np.int64)
        ids = usym[ragged_gather_indices(uoffs[:-1][codes], occ_lens)] \
            if len(codes) else np.empty(0, np.int32)
        # interleave space tokens: build per-word cells (ids + [32]),
        # then trim the trailing space of each doc by shrinking its extent
        n_docs = t.num_rows
        cell_lens = occ_lens + 1
        cell_offs = np.zeros(len(codes) + 1, dtype=np.int64)
        np.cumsum(cell_lens, out=cell_offs[1:])
        total = int(cell_offs[-1])
        out_flat = np.full(total, _SPACE_ID, dtype=np.int32)
        if len(ids):
            put = np.repeat(cell_offs[:-1], occ_lens) + segment_positions(occ_lens)
            out_flat[put] = ids
        # doc extents over cells
        doc_cell_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(per_doc, out=doc_cell_offs[1:])
        starts = cell_offs[doc_cell_offs[:-1]]
        ends = cell_offs[doc_cell_offs[1:]]
        ends = np.where(per_doc > 0, ends - 1, ends)  # drop trailing space
        lens_per_doc = ends - starts
        gather = ragged_gather_indices(starts, lens_per_doc)
        doc_ids_flat = out_flat[gather]
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens_per_doc, out=offs[1:])
        lists = pa.LargeListArray.from_arrays(offs, pa.array(doc_ids_flat,
                                                             pa.int32()))
        t = t.append_column(self.out_col, lists)
        return t.append_column(self.count_col,
                               pa.array(lens_per_doc, pa.int64()))


def apply_bpe(ds, model: BpeModel, *, text_col: str = "text",
              out_col: str = "bpe_ids", count_col: str = "n_bpe",
              concurrency=None, batch_size: int = 1024):
    """Tokenize a Dataset with a trained model — actor pool, model broadcast
    once via ``ray.put``."""
    import ray

    from ..pipelines.encode import _default_concurrency

    ref = ray.put(model)
    return ds.map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "model_ref": ref, "text_col": text_col,
            "out_col": out_col, "count_col": count_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_concurrency())


def whitespace_normalize(col) -> pa.Array:
    """Vectorized ``" ".join(x.split())`` — the exact text BPE encode/decode
    roundtrips to (same split-and-drop-empties fold as ``BpeEncoder``)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")  # null text normalizes to "" (zero tokens)
    split = pc.utf8_split_whitespace(col)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    woffs = np.asarray(split.offsets, dtype=np.int64)
    keepw = np.asarray(nonempty)
    csum = np.zeros(len(keepw) + 1, dtype=np.int64)
    np.cumsum(keepw, out=csum[1:])
    new_offs = csum[woffs - woffs[0]]
    lists = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                     flat.filter(nonempty))
    return pc.binary_join(lists, pa.scalar(" "))


def decode_bpe_column(t: pa.Table, *, ids_col: str = "bpe_ids",
                      model: BpeModel, out_col: str = "text_rt") -> pa.Table:
    """Vectorized decode of a list<int32> id column back to text: one take
    over the token byte table + one list-aware binary join."""
    import pyarrow.compute as pc

    lists = t.column(ids_col).combine_chunks()
    flat = lists.flatten()
    tok_arr = pa.array(model.token_bytes, pa.binary())
    pieces = tok_arr.take(flat)
    offs = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(offs, out=offsets[1:])
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, pieces), pa.scalar(b""))
    return t.append_column(out_col, joined.cast(pa.string()))
