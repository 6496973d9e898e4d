"""FSST-lite: symbol-table string compression (vectorized pair coding).

Inspired by "FSST: Fast Random Access String Compression" (VLDB 2020, see
PAPERS.md) — not in the reference (README.md:44-51 lists its unimplemented
features; FSST is a north-star addition per BASELINE.json). This is a
simplified, fully-vectorized variant:

  * symbols are the up-to-254 most frequent byte *pairs* of a training sample
    (codes 0..253); code 255 is the escape marker, ``escape + literal_byte``
    encodes any byte not covered by a pair symbol;
  * greedy non-overlapping pair selection is done without a sequential scan:
    within each run of consecutive matching positions, every even-parity
    position is selected (equivalent to the left-to-right greedy choice);
  * decode is a table lookup + vectorized expansion (the property FSST is
    named for: random-access, branch-free decode).

Wire: [n_symbols:u8][symbol table: 2 bytes each][payload_len:u32le][payload].
The per-value framing (offsets) is carried by the column writer like every
other byte-array codec; this kernel encodes one concatenated buffer.
Compression is worse than real FSST (pairs only, one pass) but strictly
honest: the selector only picks FSST when its measured size wins.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 254


def train(sample: np.ndarray, max_symbols: int = MAX_SYMBOLS) -> np.ndarray:
    """Pick the most frequent byte pairs. Returns (k,2) uint8 symbol table."""
    s = np.asarray(sample, dtype=np.uint8)
    if len(s) < 2:
        return np.zeros((0, 2), dtype=np.uint8)
    pairs = s[:-1].astype(np.uint16) * 256 + s[1:]
    counts = np.bincount(pairs, minlength=65536)
    # only pairs that appear often enough to pay for a table slot
    candidates = np.flatnonzero(counts >= 4)
    if len(candidates) == 0:
        return np.zeros((0, 2), dtype=np.uint8)
    order = candidates[np.argsort(counts[candidates])[::-1]][:max_symbols]
    table = np.empty((len(order), 2), dtype=np.uint8)
    table[:, 0] = order >> 8
    table[:, 1] = order & 0xFF
    return table


def encode(data: np.ndarray, table: np.ndarray) -> bytes:
    d = np.asarray(data, dtype=np.uint8)
    n = len(d)
    k = len(table)
    header = bytes([k]) + table.tobytes()
    if n == 0:
        return header + (0).to_bytes(4, "little")
    if k == 0:
        # no symbols: escape everything
        out = np.empty(2 * n, dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = d
        return header + len(out).to_bytes(4, "little") + out.tobytes()

    # code for the pair starting at each position (k if not a symbol)
    pair_to_code = np.full(65536, k, dtype=np.uint16)
    pair_ids = table[:, 0].astype(np.uint32) * 256 + table[:, 1]
    pair_to_code[pair_ids] = np.arange(k, dtype=np.uint16)
    codes = pair_to_code[d[:-1].astype(np.uint32) * 256 + d[1:]]
    is_sym = codes < k

    # greedy non-overlap: in each run of consecutive matching positions the
    # left-to-right greedy choice selects exactly the even-parity offsets
    idx = np.flatnonzero(is_sym)
    if len(idx):
        run_head = np.concatenate([[True], np.diff(idx) > 1])
        run_start = np.maximum.accumulate(np.where(run_head, idx, 0))
        selected = idx[((idx - run_start) % 2) == 0]
    else:
        selected = idx

    covered = np.zeros(n, dtype=bool)
    covered[selected] = True
    covered[selected + 1] = True
    literal_pos = np.flatnonzero(~covered)

    # emit: one output token per selected pair (1 byte) + per literal (2 bytes)
    tok_pos = np.concatenate([selected, literal_pos])
    tok_is_pair = np.concatenate(
        [np.ones(len(selected), dtype=bool), np.zeros(len(literal_pos), dtype=bool)]
    )
    order = np.argsort(tok_pos, kind="stable")
    tok_pos = tok_pos[order]
    tok_is_pair = tok_is_pair[order]
    sizes = np.where(tok_is_pair, 1, 2)
    dst = np.zeros(len(tok_pos), dtype=np.int64)
    np.cumsum(sizes[:-1], out=dst[1:])
    total = int(sizes.sum())
    out = np.empty(total, dtype=np.uint8)
    out[dst[tok_is_pair]] = codes[tok_pos[tok_is_pair]].astype(np.uint8)
    lit_dst = dst[~tok_is_pair]
    out[lit_dst] = ESCAPE
    out[lit_dst + 1] = d[tok_pos[~tok_is_pair]]
    return header + total.to_bytes(4, "little") + out.tobytes()


def decode(blob) -> np.ndarray:
    buf = bytes(blob)
    k = buf[0]
    table = np.frombuffer(buf, dtype=np.uint8, count=2 * k, offset=1).reshape(k, 2)
    plen = int.from_bytes(buf[1 + 2 * k : 5 + 2 * k], "little")
    payload = np.frombuffer(buf, dtype=np.uint8, count=plen, offset=5 + 2 * k)
    if plen == 0:
        return np.empty(0, dtype=np.uint8)
    # token boundaries: escape tokens consume 2 bytes. A byte is a token start
    # unless it is preceded by an unconsumed escape; escapes can't nest because
    # the literal byte after an escape is data. Compute starts via parity of
    # escape runs.
    is_esc = payload == ESCAPE
    # A position is "consumed" if the previous position is an escape *token*.
    # escape tokens: escapes at token starts. Solve with run parity: within a
    # run of consecutive ESCAPE bytes starting at a token start, escapes at
    # even offsets are tokens. ESCAPE can also appear as a literal byte —
    # handled by the same parity logic.
    token_start = np.ones(plen, dtype=bool)
    esc_idx = np.flatnonzero(is_esc)
    if len(esc_idx):
        # run starts among escape bytes
        run_head = np.concatenate([[True], np.diff(esc_idx) > 1])
        run_start_pos = np.maximum.accumulate(np.where(run_head, esc_idx, 0))
        is_tok_esc = ((esc_idx - run_start_pos) % 2) == 0
        # the byte after an escape token is not a token start
        consumed = esc_idx[is_tok_esc] + 1
        consumed = consumed[consumed < plen]
        token_start[consumed] = False
    tok_pos = np.flatnonzero(token_start)
    tok_byte = payload[tok_pos]
    tok_is_esc = tok_byte == ESCAPE
    out_sizes = np.where(tok_is_esc, 1, 2).astype(np.int64)
    # symbol tokens with code >= k are invalid; treat as literal of that byte
    sym_ok = (~tok_is_esc) & (tok_byte < k)
    out_sizes[(~tok_is_esc) & ~sym_ok] = 1
    dst = np.zeros(len(tok_pos), dtype=np.int64)
    np.cumsum(out_sizes[:-1], out=dst[1:])
    out = np.empty(int(out_sizes.sum()), dtype=np.uint8)
    # literals from escapes
    lit = tok_is_esc
    out[dst[lit]] = payload[np.minimum(tok_pos[lit] + 1, plen - 1)]
    # pair symbols
    out[dst[sym_ok]] = table[tok_byte[sym_ok], 0]
    out[dst[sym_ok] + 1] = table[tok_byte[sym_ok], 1]
    bad = (~tok_is_esc) & ~sym_ok
    if bad.any():
        out[dst[bad]] = tok_byte[bad]
    return out
