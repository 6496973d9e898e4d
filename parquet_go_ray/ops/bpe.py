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
    ``token_bytes[i]`` is symbol i's byte string."""

    merges: np.ndarray  # (M, 3) int32
    token_bytes: list[bytes] = field(repr=False)

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def decode(self, ids) -> bytes:
        tb = self.token_bytes
        return b"".join(tb[int(i)] for i in np.asarray(ids, dtype=np.int64))


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


def train_bpe(ds, *, num_merges: int = 200, text_col: str = "text",
              min_count: int = 1, max_word_types: int = 1_000_000) -> BpeModel:
    """Train byte-level BPE on a Dataset's ``text_col``. One distributed
    word-count shuffle; the merge loop is driver-side over the word-TYPE
    table (each unique word weighted by its corpus count)."""
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
    wcount = cnt  # weight of each word type

    merges = np.empty((num_merges, 3), dtype=np.int32)
    token_bytes = [bytes([i]) for i in range(256)]
    n_done = 0
    for k in range(num_merges):
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
        token_bytes.append(token_bytes[left] + token_bytes[right])
        sym, word = _merge_pass(sym, word, left, right, new_id)
        n_done += 1
    return BpeModel(merges=merges[:n_done], token_bytes=token_bytes)


def _encode_unique_words(words: list[bytes], merges: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Encode a unique-word list: returns (flat ids int32, per-word lengths
    int64). One vectorized merge pass per merge rank over the whole flat
    stream — applying merges exhaustively in rank order is the original
    Sennrich encode."""
    sym, word = _words_to_symbols(words)
    for left, right, new_id in merges:
        sym, word = _merge_pass(sym, word, int(left), int(right), int(new_id))
    lens = np.bincount(word, minlength=len(words)).astype(np.int64) \
        if len(word) else np.zeros(len(words), dtype=np.int64)
    return sym, lens


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

        # dictionary-encode: BPE only the unique words of the batch
        dic = words.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        codes = np.asarray(dic.indices, dtype=np.int64) if len(words) else \
            np.empty(0, np.int64)
        usym, ulens = _encode_unique_words(uniq, self.model.merges)
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
