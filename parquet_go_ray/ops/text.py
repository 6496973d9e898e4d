"""Text-analysis operators over a documents table.

All per-batch bodies are vectorized (pyarrow.compute regex/string kernels or
numpy); stateful pieces (compiled patterns, stopword tables) live in callable
classes so actor pools pay setup once (`__init__`) per actor, not per batch.
"""

from __future__ import annotations

import numpy as np
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
        # normalize zh by char count, others by token count
        best = np.argmax(scores, axis=0)
        pred = np.array(self.langs, dtype=object)[best]
        no_signal = scores.sum(axis=0) == 0
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
