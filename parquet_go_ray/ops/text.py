"""Text-analysis operators over a documents table.

All per-batch bodies are vectorized (pyarrow.compute regex/string kernels or
numpy); stateful pieces (compiled patterns, stopword tables) live in callable
classes so actor pools pay setup once (`__init__`) per actor, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer split (GPT-2 style simplified to RE2-compatible
# alternations — both pyarrow and DuckDB use RE2, so counts agree exactly)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
PUNCT_CLASS = "[.,;:!?]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "en", "que"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "in", "mit", "von"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "们"],
}


def add_token_count(batch: pa.Table, col: str = "text", out: str = "n_tok") -> pa.Table:
    """Whitespace token count (vectorized regex count)."""
    counts = pc.count_substring_regex(batch.column(col), TOKEN_RE)
    return batch.append_column(out, pc.cast(counts, pa.int64()))


def add_token_count_bpe(batch: pa.Table, col: str = "text", out: str = "n_bpe") -> pa.Table:
    """BPE-ish pre-token count (letter runs / digit runs / symbol runs)."""
    counts = pc.count_substring_regex(batch.column(col), BPE_RE)
    return batch.append_column(out, pc.cast(counts, pa.int64()))


def add_quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Length / punctuation / word-length quality signals + composite score."""
    text = batch.column(col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_CLASS), pa.float64())
    n_tok = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    punct_ratio = pc.divide(n_punct, safe_chars)
    mean_tok_len = pc.divide(n_chars, pc.max_element_wise(n_tok, 1.0))
    # composite: long-enough docs with moderate punctuation score higher
    score = pc.multiply(
        pc.min_element_wise(pc.divide(n_chars, 200.0), 1.0),
        pc.subtract(1.0, pc.min_element_wise(punct_ratio, 1.0)),
    )
    batch = batch.append_column("punct_ratio", punct_ratio)
    batch = batch.append_column("mean_tok_len", mean_tok_len)
    batch = batch.append_column("quality", score)
    return batch


class LangId:
    """Stopword-profile language id (actor-pool stage: tables built once).

    Counts whole-word hits of each language's stopword profile (vectorized
    regex per language) and takes the argmax; zh matches characters.
    """

    def __init__(self, languages: list[str] | None = None):
        self.langs = languages or list(STOPWORDS)
        self.patterns = {}
        for lang in self.langs:
            words = STOPWORDS[lang]
            if lang == "zh":
                self.patterns[lang] = "(" + "|".join(words) + ")"
            else:
                self.patterns[lang] = r"\b(" + "|".join(words) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        scores = np.stack(
            [np.asarray(pc.count_substring_regex(text, self.patterns[lang]).combine_chunks(), dtype=np.float64)
             for lang in self.langs]
        )
        # raw hit counts compete directly (zh counts characters, others
        # words — no per-language normalization is applied)
        best = np.argmax(np.nan_to_num(scores, nan=0.0), axis=0)
        pred = np.array(self.langs, dtype=object)[best]
        # null text rows produce NaN counts — argmax would hand them the
        # FIRST language; they are no-signal rows like empty strings
        no_signal = ~(np.nan_to_num(scores, nan=0.0).sum(axis=0) > 0)
        pred[no_signal] = "unknown"
        return batch.append_column("lang_pred", pa.array(pred.astype(str)))


def fnv1a_hash_text(batch: pa.Table, col: str = "text", out: str = "fingerprint") -> pa.Table:
    """Deterministic 63-bit FNV-1a document fingerprint (vectorized)."""
    from ..pipelines.encode import _stable_hash

    return batch.append_column(out, pa.array(_stable_hash(batch.column(col))))


def language_id(ds, concurrency=None):
    """Dataset-level language id via an actor pool."""
    from ..pipelines.encode import _default_concurrency

    return ds.map_batches(
        LangId,
        batch_format="pyarrow",
        concurrency=concurrency or _default_concurrency(),
        batch_size=4096,
    )


class Decontaminator:
    """Actor stage: flag documents sharing any word-n-gram with an evaluation
    set — the benchmark-decontamination step of LLM training-data pipelines.

    The eval set's gram-hash set is built ONCE per actor in __init__ from an
    object-store ref (ray.put on the driver, read per actor — never re-shipped
    per batch); per batch, every document's gram hashes are computed in one
    vectorized pass (ops/dedup._gram_hash_sets) and membership is a single
    np.isin against the sorted eval array.
    """

    def __init__(self, eval_ref, n: int = 8, text_col: str = "text"):
        import ray

        from .dedup import _gram_hash_sets

        eval_texts = ray.get(eval_ref) if not isinstance(eval_ref, list) else eval_ref
        uh, _ = _gram_hash_sets(list(eval_texts), n)
        self.eval_grams = np.unique(uh)
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _gram_hash_sets

        flat, bounds = _gram_hash_sets(batch.column(self.text_col), self.n)
        lens = np.diff(bounds)
        hit = np.isin(flat, self.eval_grams)
        n_hits = np.add.reduceat(hit.astype(np.int64), bounds[:-1]) if len(flat) else np.zeros(len(lens), np.int64)
        n_hits = np.where(lens > 0, n_hits, 0)
        return batch.append_column(
            "contaminated", pa.array(n_hits > 0)
        ).append_column("n_contaminated_grams", pa.array(n_hits))


def decontaminate(ds, eval_texts: list[str], *, n: int = 8, text_col: str = "text",
                  drop: bool = False, concurrency=None):
    """Tag (or drop) documents overlapping the eval set by any word n-gram."""
    import ray
    import pyarrow.compute as pc

    from ..pipelines.encode import _default_concurrency

    eval_ref = ray.put(list(eval_texts))
    out = ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs={"eval_ref": eval_ref, "n": n, "text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or _default_concurrency(),
    )
    if drop:
        out = out.map_batches(
            lambda t: t.filter(pc.invert(t.column("contaminated"))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return out


def train_val_split(ds, id_col: str = "doc_id", val_pct: int = 10, salt: int = 0):
    """Deterministic train/val split by Knuth multiplicative hash of the id —
    reproducible across runs and engines (the arithmetic is plain enough for
    a SQL oracle), no shuffle, no coordination: each batch tags itself."""

    def tag(t: pa.Table) -> pa.Table:
        if t.column(id_col).null_count:
            raise ValueError(
                f"train_val_split: null {id_col} — NaN→uint64 is platform-"
                f"dependent and the row's split would be untraceable")
        ids = np.asarray(t.column(id_col)).astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(2654435761)) % np.uint64(1 << 32)
        val = (h % np.uint64(100)) < val_pct
        split = np.where(val, "val", "train")
        return t.append_column("split", pa.array(split))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def build_vocab(ds, text_col: str = "text", *, min_count: int = 1,
                num_partitions: int = 64):
    """Corpus vocabulary: (token, count) over whitespace tokens.

    Combiner discipline: each batch pre-aggregates its own token counts (one
    vectorized split + value_counts), so the shuffle moves (token, partial
    count) pairs — bounded by per-batch vocabulary, not corpus length. Final
    merge is a hash-partitioned groupby-sum on the token.
    """
    import pyarrow.compute as pc

    from ..pipelines.encode import _stable_hash

    def partials(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.utf8_split_whitespace(batch.column(text_col)))
        words = words.filter(pc.greater(pc.utf8_length(words), 0))
        vc = words.value_counts()
        toks = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        part = _stable_hash(toks) % num_partitions
        return pa.table({"token": toks, "count": counts, "__p": pa.array(part)})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("count", "sum")])
        g = g.rename_columns(["token", "count"])
        return g.filter(pc.greater_equal(g.column("count"), min_count))

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__p")
        .map_groups(merge, batch_format="pyarrow")
    )


class PiiRedactor:
    """Actor stage: scrub emails / phone numbers / IPv4s from text.

    Patterns compile ONCE per actor (__init__), applied vectorized via
    pyarrow.compute.replace_substring_regex (RE2) — the same engine family
    DuckDB uses, so the SQL oracle matches byte-for-byte. No backreferences
    or lookarounds, keeping the patterns portable across RE2 dialects.
    """

    PATTERNS = {
        "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "phone": r"\+?[0-9]{1,3}[ .\-]?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}",
        "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    }

    def __init__(self, kinds: list[str] | None = None, text_col: str = "text",
                 replacement: str = "[REDACTED]"):
        self.kinds = kinds or list(self.PATTERNS)
        self.text_col = text_col
        self.replacement = replacement

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(self.text_col)
        for kind in self.kinds:
            col = pc.replace_substring_regex(col, pattern=self.PATTERNS[kind],
                                             replacement=self.replacement)
        i = batch.schema.get_field_index(self.text_col)
        return batch.set_column(i, self.text_col, col)


def redact_pii(ds, *, kinds: list[str] | None = None, text_col: str = "text",
               replacement: str = "[REDACTED]", concurrency=None):
    """Scrub PII patterns from a text column (emails, phones, IPv4s)."""
    from ..pipelines.encode import _default_concurrency

    return ds.map_batches(
        PiiRedactor,
        fn_constructor_kwargs={"kinds": kinds, "text_col": text_col,
                               "replacement": replacement},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or _default_concurrency(),
    )


def train_char_lm(texts: list[str], order: int = 3) -> dict:
    """Train a character TRIGRAM language model (counts with add-one backoff)
    from sample texts. Returns a broadcastable dict of sorted code/logp arrays
    — the 'model artifact' an inference stage loads once per actor.

    Only ``order=3`` is implemented (the packed uint32 code layout is
    trigram-specific); other orders raise rather than silently returning
    trigram statistics under a wrong label."""
    if order != 3:
        raise ValueError(f"train_char_lm: only order=3 is implemented, got {order}")
    data = np.frombuffer(" ".join(texts).encode("utf-8", "ignore"), dtype=np.uint8)
    if len(data) < order:
        return {"order": order, "codes": np.empty(0, np.uint32),
                "logp": np.empty(0, np.float32), "oov": -12.0}
    tri = (data[:-2].astype(np.uint32) << np.uint32(16)) \
        | (data[1:-1].astype(np.uint32) << np.uint32(8)) | data[2:]
    bi = (data[:-1].astype(np.uint32) << np.uint32(8)) | data[1:]
    tcodes, tcounts = np.unique(tri, return_counts=True)
    bcodes, bcounts = np.unique(bi, return_counts=True)
    ctx = tcodes >> np.uint32(8)
    bidx = np.searchsorted(bcodes, ctx)
    denom = bcounts[np.minimum(bidx, len(bcodes) - 1)].astype(np.float64)
    logp = np.log((tcounts + 1.0) / (denom + 256.0)).astype(np.float32)
    oov = float(np.log(1.0 / (np.median(denom) + 256.0)))
    return {"order": order, "codes": tcodes, "logp": logp, "oov": oov}


class CharLmScorer:
    """Actor stage: per-document cross-entropy under a broadcast character
    trigram LM — the batched-model-inference archetype (model fetched from
    the object store ONCE in __init__, scoring fully vectorized per batch).
    Lower bits-per-char = more natural text; a standard quality filter."""

    def __init__(self, model_ref, text_col: str = "text"):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.codes, self.logp, self.oov = m["codes"], m["logp"], m["oov"]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column(self.text_col).combine_chunks().cast(pa.binary())
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1,
                                offset=arr.offset * 4).astype(np.int64)
        data = (np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                if arr.buffers()[2] is not None else np.empty(0, np.uint8))
        d = data[offsets[0] : offsets[-1]]
        base0 = offsets[0]
        n = len(arr)
        lens = np.diff(offsets)
        bpc = np.zeros(n, dtype=np.float64)
        if len(d) >= 3 and len(self.codes):
            tri = (d[:-2].astype(np.uint32) << np.uint32(16)) \
                | (d[1:-1].astype(np.uint32) << np.uint32(8)) | d[2:]
            idx = np.minimum(np.searchsorted(self.codes, tri), len(self.codes) - 1)
            lp = np.where(self.codes[idx] == tri, self.logp[idx], self.oov).astype(np.float64)
            # per-doc mean over windows fully inside the doc (prefix-sum segments)
            cs = np.zeros(len(lp) + 1, dtype=np.float64)
            np.cumsum(lp, out=cs[1:])
            starts = np.minimum(offsets[:-1] - base0, len(lp))
            ends = np.minimum(np.maximum(offsets[1:] - base0 - 2, starts), len(lp))
            nwin = (ends - starts).astype(np.float64)
            sums = cs[ends] - cs[starts]
            m = nwin > 0
            bpc[m] = -(sums[m] / nwin[m]) / np.log(2.0)
        return batch.append_column("lm_bits_per_char", pa.array(bpc))


def lm_quality_score(ds, sample_texts: list[str], *, text_col: str = "text",
                     concurrency=None):
    """Score documents by character-LM cross-entropy (bits/char)."""
    import ray

    from ..pipelines.encode import _default_concurrency

    model_ref = ray.put(train_char_lm(list(sample_texts)))
    return ds.map_batches(
        CharLmScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or _default_concurrency(),
    )


# -------------------------------------------- intra-document repetition removal
def _segment_groups(t: pa.Table, delimiter: str, text_col: str):
    """Shared prologue of the segment-level kernels: split each text on
    ``delimiter``, dictionary-encode the segments (exact, collision-free
    identities), and group occurrences per (doc, segment) with one segmented
    lexsort. Returns (flat_segments, offs, counts, order, first) where
    ``first`` marks the first occurrence of each (doc, segment) group in
    ``order``."""
    col = t.column(text_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], type=pa.string())
    split = pc.split_pattern(col, pattern=delimiter)
    offs = np.asarray(split.offsets, dtype=np.int64)
    offs = offs - offs[0]
    counts = np.diff(offs)
    flat = split.flatten()
    codes = np.asarray(
        flat.dictionary_encode().indices.fill_null(-1), dtype=np.int64)
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pos = np.arange(len(codes), dtype=np.int64)
    order = np.lexsort((pos, codes, doc))
    d_s, c_s = doc[order], codes[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    return flat, offs, counts, order, first


def _dedup_segments_batch(t: pa.Table, delimiter: str, text_col: str) -> pa.Table:
    """Keep the FIRST occurrence of each distinct segment within a document,
    preserving order. Exact (Arrow dictionary_encode gives collision-free
    segment identities) and fully vectorized: one split, one dictionary
    encode, one segmented lexsort, one filtered re-join."""
    flat, offs, counts, order, first = _segment_groups(t, delimiter, text_col)
    keep = np.zeros(len(flat), dtype=bool)
    keep[order[first]] = True
    kept = flat.filter(pa.array(keep))
    if isinstance(kept, pa.ChunkedArray):
        kept = kept.combine_chunks()
    csum = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(keep, out=csum[1:])
    new_offs = (csum[offs]).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offs), kept), delimiter)
    return t.set_column(t.schema.get_field_index(text_col), text_col, joined)


def dedup_segments(ds, *, delimiter: str = "\n", text_col: str = "text"):
    """Remove repeated segments (lines / paragraphs / words, by
    ``delimiter``) WITHIN each document, keeping first occurrences in order —
    the intra-document repetition-removal step of web-corpus pipelines
    (the Gopher / RefinedWeb "repetition removal" family). Strictly per-row
    semantics: a streaming map_batches, no shuffle."""
    return ds.map_batches(
        lambda t: _dedup_segments_batch(t, delimiter, text_col),
        batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ sequence packing
def pack_sequences(ds, *, seq_len: int = 2048, count_col: str = "n_tok",
                   id_col: str = "doc_id"):
    """Assign every document its training-sequence index: documents are laid
    out contiguously in id order and cut into fixed ``seq_len`` token
    sequences; a doc's ``seq_id`` is ``floor(exclusive_prefix_sum(n_tok) /
    seq_len)`` and ``tok_start`` its global token offset — the
    sequence-packing step in front of LLM pre-training.

    Distributed exclusive prefix sum, no shuffle: pass 1 streams per-BLOCK
    summaries to the driver in dataset order (O(blocks) ints); pass 2
    streams the data again, adding each block's broadcast offset to its
    local cumsum. Blocks are identified by a content FINGERPRINT of their
    id column (count, token sum, order-sensitive hash mix, first/last id)
    rather than id-sortedness (VERDICT r3 #5) — so filtered, gappy-id, or
    shuffle-rank-ordered upstreams pack correctly in their dataset order
    (identical to id order for an id-sorted input). The input must still be
    DETERMINISTIC between the two passes (a fresh ``read_parquet`` or a
    materialized dataset qualifies); a pass-2 block whose fingerprint was
    not seen in pass 1 fails fast. Both passes run block-aligned
    (``batch_size=None``) so the summaries line up exactly. Non-integer id
    columns (e.g. ``doc_id:string``) fingerprint via their stable hash.
    """
    import ray

    from ..pipelines.encode import _stable_hash

    def _ids64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if pa.types.is_integer(col.type):
            return np.asarray(col, dtype=np.int64)
        return _stable_hash(col).view(np.int64)

    def _fingerprint(ids: np.ndarray, n_tok_sum: int) -> tuple:
        h = (ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        # order-sensitive mix: position-weighted sum detects intra-block
        # reordering, not just content changes
        w = np.arange(1, len(ids) + 1, dtype=np.uint64)
        mix = int((h * w).sum() % np.uint64(1 << 63))
        return (len(ids), n_tok_sum, mix,
                int(ids[0]) if len(ids) else -1,
                int(ids[-1]) if len(ids) else -1)

    def summarize(t: pa.Table) -> pa.Table:
        ids = _ids64(t.column(id_col))
        counts = t.column(count_col)
        if counts.null_count:
            raise ValueError(
                f"pack_sequences: {count_col!r} contains nulls — a null "
                "token count is ambiguous here; fill_null(0) upstream "
                "(pack_token_sequences does this for null token lists)")
        tok_sum = int(np.asarray(counts).sum())
        fp = _fingerprint(ids, tok_sum)
        return pa.table({
            "fp": pa.array([repr(fp)], type=pa.string()),
            "tok_sum": pa.array([tok_sum], type=pa.int64()),
        })

    from .ordering import ordered_scope

    offsets: dict[str, int] = {}
    running = 0
    # pass 1 MUST see blocks in the one logical order — it defines the pack
    # order. Without preserve_order the streaming executor yields summaries
    # in completion order, which varies run to run (observed: ~1/3 of
    # pipeline_corpus_e2e runs packed in a different order than the input).
    # Flipped on the dataset's own (shared, creation-time) context — the
    # global flag no longer reaches an already-built dataset — and scoped to
    # this pass: assign (pass 2) keys blocks by content fingerprint, so the
    # caller's downstream shuffles keep completion-order freedom.
    with ordered_scope(ds):
        batches = list(
            ds.map_batches(summarize, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow"))
    for b in batches:
        for r in b.to_pylist():
            if r["tok_sum"] == 0 and r["fp"][0] == 0:
                continue  # zero-row blocks all share the degenerate fp and
                # contribute no tokens — they must not trip the ambiguity
                # check (two empty shards are harmless)
            if r["fp"] in offsets:
                raise ValueError(
                    "pack_sequences: two blocks share a content fingerprint "
                    "(byte-identical id columns) — block offsets would be "
                    "ambiguous; deduplicate or re-id the input first")
            offsets[r["fp"]] = running
            running += r["tok_sum"]
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            empty = pa.array([], type=pa.int64())
            return t.append_column("tok_start", empty).append_column(
                "seq_id", empty)
        offs_b = ray.get(ref)
        ids = _ids64(t.column(id_col))
        n = np.asarray(t.column(count_col), dtype=np.int64)
        fp = repr(_fingerprint(ids, int(n.sum())))
        if fp not in offs_b:
            raise ValueError(
                "pack_sequences: pass-2 block boundaries do not match pass 1 "
                "(input dataset is not deterministic)")
        start = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n[:-1], out=start[1:])
        start += offs_b[fp]
        return t.append_column(
            "tok_start", pa.array(start)).append_column(
            "seq_id", pa.array(start // seq_len))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


# --------------------------------------------------- data-mixture reweighting
def stratified_sample(ds, rates: dict[str, float], *, key_col: str = "source",
                      id_col: str = "doc_id", salt: int = 0,
                      default_rate: float = 1.0, basis_points: bool = False):
    """Deterministic per-stratum subsampling — the data-mixing / source-
    reweighting step of LLM corpus construction (keep 10% of crawl, 100% of
    books, ...). A document survives iff
    ``knuth_hash(id + salt) % 10_000 < rate(stratum) * 10_000`` — the same
    multiplicative hash as ``train_val_split``, so it is reproducible across
    runs and engines (and SQL-expressible for the oracle), independent of
    batch/partition layout, and disjoint salts give independent samples.

    The rate table is tiny and ships inside the closure; the filter is a
    stateless vectorized map_batches — no shuffle, no coordination."""
    def _thresh(r) -> int:
        # basis_points=True: values are exact out-of-10000 integers
        # (mix_sources passes these — a float roundtrip like
        # 3333/10000*10000 would floor to 3332). Default: fractional rates.
        # round, not int(): 0.57*10_000 is 5699.999... in binary and int()
        # truncated one basis point below the documented rate
        return int(r) if basis_points else round(r * 10_000)

    items = sorted(rates.items())
    keys = pa.array([k for k, _ in items], type=pa.string())
    thresholds = np.array([_thresh(r) for _, r in items], dtype=np.uint64)
    default_thresh = np.uint64(_thresh(default_rate))

    def keep(t: pa.Table) -> pa.Table:
        if t.column(id_col).null_count:
            raise ValueError(
                f"stratified_sample: null {id_col} — NaN→uint64 is platform-"
                f"dependent and the row's keep/drop would be untraceable")
        ids = np.asarray(t.column(id_col)).astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(2654435761)) % np.uint64(1 << 32)
        bucket = h % np.uint64(10_000)
        idx = pc.index_in(t.column(key_col), value_set=keys)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        idx_np = np.asarray(idx.fill_null(-1), dtype=np.int64)
        thresh = np.where(idx_np >= 0, thresholds[idx_np.clip(0)],
                          default_thresh)
        return t.filter(pa.array(bucket < thresh))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- repetition signals
def add_repetition_signals(batch: pa.Table, *, delimiter: str = "\n",
                           text_col: str = "text") -> pa.Table:
    """Gopher-style repetition metrics per document: the fraction of
    segments (and of characters) occurring more than once. Shares the split
    + dictionary-encode + segmented-lexsort shape of ``dedup_segments`` —
    vectorized, streaming, no shuffle."""
    flat, offs, counts, order, first = _segment_groups(batch, delimiter, text_col)
    seg_chars = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    n_seg = len(flat)
    # a segment is "repeated" if its (doc, code) group has size > 1; mark ALL
    # members of such groups (the Gopher duplicate-line fraction counts them
    # all, including the first occurrence)
    grp = np.cumsum(first) - 1
    gsize = np.bincount(grp, minlength=grp[-1] + 1 if len(grp) else 0)
    rep_sorted = gsize[grp] > 1 if len(grp) else np.zeros(0, dtype=bool)
    rep = np.zeros(n_seg, dtype=bool)
    rep[order] = rep_sorted
    csum_n = np.zeros(n_seg + 1, dtype=np.int64)
    np.cumsum(rep, out=csum_n[1:])
    rep_per_doc = csum_n[offs[1:]] - csum_n[offs[:-1]]
    csum_c = np.zeros(n_seg + 1, dtype=np.int64)
    np.cumsum(np.where(rep, seg_chars, 0), out=csum_c[1:])
    repc_per_doc = csum_c[offs[1:]] - csum_c[offs[:-1]]
    tot_c = np.zeros(n_seg + 1, dtype=np.int64)
    np.cumsum(seg_chars, out=tot_c[1:])
    totc_per_doc = tot_c[offs[1:]] - tot_c[offs[:-1]]
    frac_seg = rep_per_doc / np.maximum(counts, 1)
    frac_chr = repc_per_doc / np.maximum(totc_per_doc, 1)
    return batch.append_column(
        "frac_dup_segments", pa.array(frac_seg)).append_column(
        "frac_dup_chars", pa.array(frac_chr))


def pack_token_sequences(ds, *, seq_len: int = 2048, id_col: str = "doc_id",
                         tokens_col: str = "tokens", pad_id: int = 0,
                         drop_last: bool = False,
                         num_partitions: int = 64):
    """Physically pack a token table into fixed-length training sequences:
    concatenate all documents' tokens in id order and cut every ``seq_len``
    — the step that turns a cleaned corpus into pre-training examples.

    Builds on the ``pack_sequences`` distributed prefix sum (each doc learns
    its global token offset in two streaming passes), then every document
    SPLITS its token array at sequence boundaries per batch (vectorized
    offset arithmetic — a doc spanning k sequences emits k fragments), and
    one shuffle keyed by ``seq_id`` regroups fragments; each group concats
    its fragments by offset into exactly ``seq_len`` tokens (the final
    partial sequence pads with ``pad_id`` or drops with ``drop_last``).
    Only token payloads that genuinely must co-locate move — the shuffle is
    the physical regrouping itself, and every group is seq_len tokens.

    Returns a Dataset of (seq_id, tokens[seq_len], n_docs)."""
    # pack_sequences counts via a count column; derive it from the list
    # lengths first so callers need not precompute n_tok.
    import pyarrow.compute as _pc

    def add_len(t: pa.Table) -> pa.Table:
        # a NULL token list contributes zero tokens — same as an empty list;
        # fill_null keeps the length cumsum aligned with flatten(), which
        # emits nothing for null slots
        return t.append_column(
            "__n", _pc.fill_null(_pc.cast(
                _pc.list_value_length(t.column(tokens_col)), pa.int64()), 0))

    from .ordering import ordered_scope

    # materialize under preserve_order so the pinned block list — the pack
    # order — is the input's logical order, not a completion order. Scoped:
    # the seq_id shuffle and assemble downstream are order-insensitive and
    # run markedly faster with completion-order emission.
    pipeline = ds.map_batches(add_len, batch_format="pyarrow",
                              zero_copy_batch=True)
    with ordered_scope(pipeline):
        counted = pipeline.materialize()
    # materialize COPIES the context (flag included); restore the copy so
    # the stages derived from `counted` inherit the caller's setting
    counted.context.execution_options.preserve_order = \
        pipeline.context.execution_options.preserve_order
    with_off = pack_sequences(counted, seq_len=seq_len, count_col="__n",
                              id_col=id_col)
    total = int(counted.sum("__n") or 0)
    n_seq = total // seq_len if drop_last else -(-total // seq_len)

    def _assemble_core(sid, fstart, flat, starts, fl):
        # Fully vectorized (VERDICT r3 #2 — no per-sequence Python loop):
        # one lexsort orders every fragment by (seq_id, frag_start); one
        # ragged gather concatenates them; one scatter places each
        # fragment's tokens at seq_slot * seq_len + within-seq offset in a
        # pad-prefilled output buffer (full sequences overwrite all
        # seq_len slots, the single global tail keeps its padding).
        from ..functions.segments import ragged_gather_indices

        order = np.lexsort((fstart, sid))
        fl_o = fl[order]
        gathered = flat[ragged_gather_indices(starts[:-1][order], fl_o)]
        usid, first, ndocs = np.unique(sid[order], return_index=True,
                                       return_counts=True)
        cum = np.zeros(len(fl_o) + 1, dtype=np.int64)
        np.cumsum(fl_o, out=cum[1:])
        j_of = np.repeat(np.arange(len(usid), dtype=np.int64), ndocs)
        tgt_start = j_of * seq_len + (cum[:-1] - cum[first][j_of])
        out_vals = np.full(len(usid) * seq_len, pad_id,
                           dtype=flat.dtype)
        out_vals[ragged_gather_indices(tgt_start, fl_o)] = gathered
        offs = np.arange(len(usid) + 1, dtype=np.int64) * seq_len
        return pa.table({
            "seq_id": pa.array(usid),
            "tokens": pa.LargeListArray.from_arrays(
                pa.array(offs), pa.array(out_vals)).cast(
                    pa.list_(pa.from_numpy_dtype(out_vals.dtype))),
            "n_docs": pa.array(ndocs.astype(np.int64)),
        })

    def fragments(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array(
                [], type=col.type)
        flat = np.asarray(col.flatten())
        lens = np.asarray(t.column("__n"))
        doc_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_off[1:])
        tok_start = np.asarray(t.column("tok_start"))
        from ..functions.segments import ragged_gather_indices, segment_positions

        # each doc spans sequences [s0, s1]; emit one fragment per crossed
        # boundary (vectorized: docs repeat by their sequence-span count)
        s0 = tok_start // seq_len
        s1 = np.maximum((tok_start + lens - 1) // seq_len, s0)
        span = (s1 - s0 + 1).astype(np.int64)
        d_idx = np.repeat(np.arange(len(lens)), span)
        seq = s0[d_idx] + segment_positions(span)
        gstart = np.maximum(tok_start[d_idx], seq * seq_len)
        gend = np.minimum(tok_start[d_idx] + lens[d_idx], (seq + 1) * seq_len)
        fl = (gend - gstart).astype(np.int64)
        local = gstart - tok_start[d_idx] + doc_off[d_idx]
        # fl==0: a zero-token doc's degenerate fragment — it carries no
        # tokens but would inflate n_docs and can emit a DUPLICATE all-pad
        # row for a sequence another block assembles for real
        keep = (seq < n_seq) & (fl > 0)  # drop_last trims trailing partials
        seq, gstart, fl, local = seq[keep], gstart[keep], fl[keep], local[keep]

        # Sequences whose FULL extent lies inside this batch's contiguous
        # token range assemble right here — only fragments of block-BOUNDARY
        # sequences enter the shuffle, so the exchange moves O(blocks *
        # seq_len) tokens, not the corpus. (Pass-2 batches are whole pinned
        # blocks = contiguous doc runs, so the batch token range is one
        # interval.)
        # np.asarray of an empty arrow flatten() preserves the value dtype,
        # so no int32 fallback: one all-empty-docs block must not type its
        # tokens list<int32> while every other block says list<int64>
        list_t = pa.list_(pa.from_numpy_dtype(flat.dtype))
        if len(lens):
            batch_lo = int(tok_start[0])
            batch_hi = int(tok_start[-1] + lens[-1])
        else:
            batch_lo = batch_hi = 0
        done_m = (seq * seq_len >= batch_lo) & ((seq + 1) * seq_len <= batch_hi)
        src = ragged_gather_indices(local[done_m], fl[done_m])
        starts_d = np.zeros(int(done_m.sum()) + 1, dtype=np.int64)
        np.cumsum(fl[done_m], out=starts_d[1:])
        local_tbl = _assemble_core(seq[done_m], gstart[done_m] - seq[done_m] * seq_len,
                                   flat[src], starts_d, fl[done_m])
        nb = int((~done_m).sum())
        srcb = ragged_gather_indices(local[~done_m], fl[~done_m])
        frag_offs = np.zeros(nb + 1, dtype=np.int64)
        np.cumsum(fl[~done_m], out=frag_offs[1:])
        frag_tokens = pa.LargeListArray.from_arrays(
            pa.array(frag_offs), pa.array(flat[srcb])).cast(list_t)
        return pa.table({
            "seq_id": pa.concat_arrays([local_tbl.column("seq_id").combine_chunks(),
                                        pa.array(seq[~done_m])]),
            "tokens": pa.concat_arrays([
                local_tbl.column("tokens").combine_chunks().cast(list_t),
                frag_tokens]),
            "n_docs": pa.concat_arrays([local_tbl.column("n_docs").combine_chunks(),
                                        pa.array(np.full(nb, -1, np.int64))]),
            "frag_start": pa.concat_arrays([
                pa.array(np.full(len(local_tbl), -1, np.int64)),
                pa.array(gstart[~done_m] - seq[~done_m] * seq_len)]),
            "__p": pa.concat_arrays([
                pa.array(np.zeros(len(local_tbl), np.int64)),
                pa.array(seq[~done_m] % num_partitions)]),
        })

    def assemble(t: pa.Table) -> pa.Table:
        sid = np.asarray(t.column("seq_id"), dtype=np.int64)
        fstart = np.asarray(t.column("frag_start"), dtype=np.int64)
        col = t.column("tokens").combine_chunks()
        flat = np.asarray(col.flatten())
        fl = np.asarray(pc.list_value_length(col), dtype=np.int64)
        starts = np.zeros(len(fl) + 1, dtype=np.int64)
        np.cumsum(fl, out=starts[1:])  # flatten() output is gap-free
        return _assemble_core(sid, fstart, flat, starts, fl)

    mixed = with_off.map_batches(fragments, batch_format="pyarrow",
                                 batch_size=None,
                                 zero_copy_batch=True).materialize()

    def split(done: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("frag_start"), pa.scalar(-1, pa.int64()))
            t = t.filter(m if done else pc.invert(m))
            return t.select(["seq_id", "tokens", "n_docs"]) if done else t
        return f

    finished = mixed.map_batches(split(True), batch_format="pyarrow",
                                 zero_copy_batch=True)
    boundary = (mixed.map_batches(split(False), batch_format="pyarrow",
                                  zero_copy_batch=True)
                .groupby("__p").map_groups(assemble, batch_format="pyarrow"))
    return finished.union(boundary)


def remap_rare_tokens(ds, *, min_count: int = 2, unk_id: int = -1,
                      tokens_col: str = "tokens",
                      num_partitions: int = 64):
    """Vocabulary pruning over an integer token table: token ids occurring
    fewer than ``min_count`` times corpus-wide remap to ``unk_id`` — the
    apply step that follows ``build_vocab`` in a tokenizer pipeline.

    Pass 1 moves only (token_id, partial_count) pairs (per-batch np.unique
    combiner, hash-partitioned sum); the surviving vocabulary — bounded by
    distinct token ids, not corpus length — broadcasts once via ``ray.put``.
    Pass 2 is a streaming remap of the flattened list values (one
    searchsorted membership test per batch, offsets reused). No corpus
    shuffle."""
    import ray

    def partials(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks
                   else pa.array([], type=pa.list_(pa.int64())))
        vals, counts = np.unique(
            np.asarray(col.flatten(), dtype=np.int64), return_counts=True)
        return pa.table({
            "tk": pa.array(vals),
            "c": pa.array(counts.astype(np.int64)),
            "__p": pa.array(vals % num_partitions),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("tk", sort=False)["c"].sum().reset_index()
        return agg[agg.c >= min_count][["tk"]]

    vocab_parts = [np.asarray(b.column("tk"), dtype=np.int64)
                   for b in (ds.map_batches(partials, batch_format="pyarrow",
                                            zero_copy_batch=True)
                             .groupby("__p")
                             .map_groups(merge, batch_format="pandas")
                             .iter_batches(batch_format="pyarrow"))]
    vocab = (np.sort(np.concatenate(vocab_parts)) if vocab_parts
             else np.empty(0, np.int64))
    ref = ray.put(vocab)

    def remap(t: pa.Table) -> pa.Table:
        vb = ray.get(ref)
        col = t.column(tokens_col).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks
                   else pa.array([], type=pa.list_(pa.int64())))
        flat = np.asarray(col.flatten(), dtype=np.int64)
        if len(vb):
            pos = np.searchsorted(vb, flat).clip(0, len(vb) - 1)
            keep = vb[pos] == flat
        else:
            keep = np.zeros(len(flat), dtype=bool)
        out_vals = np.where(keep, flat, unk_id)
        offs = np.asarray(col.offsets, dtype=np.int32)
        offs = offs - offs[0]
        new = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(out_vals.astype(
                col.type.value_type.to_pandas_dtype())))
        return t.set_column(t.schema.get_field_index(tokens_col),
                            tokens_col, new)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def mix_sources(ds, weights: dict[str, int], *, key_col: str = "source",
                id_col: str = "doc_id", salt: int = 0):
    """Target-mixture corpus construction: keep the LARGEST subcorpus whose
    per-source proportions exactly match integer ``weights`` (the "30%
    crawl / 30% books / 40% code" recipe step).

    Feasibility: the binding source (smallest count/weight) is kept ~100%
    and every other source downsamples to match. All arithmetic is INTEGER
    (T = min_s floor(count_s * W / w_s); threshold_s = floor(T * w_s *
    10000 / (W * count_s)) basis points), so the decision is bit-exact and
    SQL-reproducible. Sources with no (or zero) weight are dropped.

    One cheap counting pass (per-batch value_counts, driver merges the tiny
    source->count dict) + the stateless ``stratified_sample`` hash filter —
    no shuffle anywhere. Returns ``(filtered_ds, thresholds)`` where
    thresholds maps source -> kept basis points (of 10000).
    """
    def batch_counts(t: pa.Table) -> pa.Table:
        vc = t.column(key_col).combine_chunks().value_counts()
        return pa.table({key_col: vc.field("values"),
                         "__c": vc.field("counts").cast(pa.int64())})

    counts: dict[str, int] = {}
    src_counts = ds.select_columns([key_col]).map_batches(
        batch_counts, batch_format="pyarrow", zero_copy_batch=True)
    for b in src_counts.iter_batches(batch_format="pyarrow", batch_size=None):
        for s, c in zip(b.column(key_col).to_pylist(), b.column("__c").to_pylist()):
            counts[s] = counts.get(s, 0) + c
    W = sum(w for w in weights.values() if w > 0)
    if W <= 0:
        empty = ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
        return empty, {}
    missing = [s for s, w in weights.items() if w > 0 and counts.get(s, 0) == 0]
    if missing:
        # a positively-weighted source with no rows makes the requested
        # mixture infeasible — keeping the others at full rate would
        # SILENTLY violate the exact-weights contract
        raise ValueError(f"mix_sources: weighted sources absent from the "
                         f"corpus: {sorted(missing)}")
    present = {s: counts[s] for s, w in weights.items() if w > 0}
    T = min(c * W // weights[s] for s, c in present.items())
    thresholds = {s: min(10_000, T * weights[s] * 10_000 // (W * c))
                  for s, c in present.items()}
    out = stratified_sample(ds, thresholds, key_col=key_col, id_col=id_col,
                            salt=salt, default_rate=0, basis_points=True)
    return out, thresholds
