"""FSST: symbol-table string compression (real variable-length symbols).

Implements the algorithm of "FSST: Fast Random Access String Compression"
(VLDB 2020, see PAPERS.md) — not in the reference (README.md:44-51 lists its
unimplemented features; FSST is a north-star addition per BASELINE.json):

  * up to 254 symbols of length 1..8 bytes (codes 0..253); code 255 is the
    escape marker, ``escape + literal_byte`` encodes any uncovered byte;
  * training = the paper's iterative refinement: parse the sample with the
    current table, credit each used symbol gain = freq x length, propose the
    concatenations of adjacent tokens (capped at 8 bytes) as new candidates,
    keep the top symbols, repeat;
  * encoding parses greedily longest-match-first. The per-position longest
    match is 8 vectorized hash lookups (one per symbol length); the
    left-to-right greedy chain — inherently sequential — is resolved with
    list-ranking by pointer doubling (O(n) total gather work, log n rounds),
    so there is no per-byte Python loop;
  * decode is a table lookup + ragged scatter (random-access, branch-free —
    the property FSST is named for).

Wire: [n_symbols:u8][lengths: n_symbols bytes][symbol bytes, concatenated]
      [payload_len:u32le][payload].
The per-value framing (offsets) is carried by the column writer like every
other byte-array codec; this kernel encodes one concatenated buffer.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 254
MAX_LEN = 8


def _pack_table(lengths: np.ndarray, sym_bytes: np.ndarray) -> np.ndarray:
    k = len(lengths)
    out = np.empty(1 + k + len(sym_bytes), dtype=np.uint8)
    out[0] = k
    out[1 : 1 + k] = lengths
    out[1 + k :] = sym_bytes
    return out


def _unpack_table(table: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (lengths uint8[k], starts int64[k], bytes uint8[...])."""
    t = np.asarray(table, dtype=np.uint8)
    if len(t) == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64), np.empty(0, np.uint8)
    k = int(t[0])
    lengths = t[1 : 1 + k].astype(np.uint8)
    starts = np.zeros(k, dtype=np.int64)
    np.cumsum(lengths[:-1].astype(np.int64), out=starts[1:])
    return lengths, starts, t[1 + k :]


def _small_values(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(v2 uint16[n], v4 uint32[n]): big-endian 2- and 4-byte window values
    (zero-padded past the end). All ops stay in <= 32-bit lanes — uint64
    broadcast ops are pathologically slow on some hosts, and a full (8, n)
    uint64 value matrix would be 16x the input in fresh pages."""
    n = len(d)
    v2 = np.zeros(n, dtype=np.uint16)
    if n:
        v2[:] = d.astype(np.uint16) << np.uint16(8)
        v2[: n - 1] |= d[1:]
    v4 = np.zeros(n, dtype=np.uint32)
    if n:
        v4[:] = v2.astype(np.uint32) << np.uint32(16)
        v4[: n - 2] |= v2[2:]
    return v2, v4


def _window_u32(d, v2, v4, L: int, at: np.ndarray | None = None) -> np.ndarray:
    """Big-endian value of the L-byte window (L <= 4) as uint32, either for
    all positions or gathered at ``at``."""
    if L == 1:
        src = d.astype(np.uint32) if at is None else d[at].astype(np.uint32)
        return src
    if L == 2:
        return (v2 if at is None else v2[at]).astype(np.uint32)
    if L == 3:
        return (v4 if at is None else v4[at]) >> np.uint32(8)
    return v4 if at is None else v4[at]


def _symbol_values(lengths, starts, sym_bytes) -> np.ndarray:
    """Big-endian uint64 value per symbol."""
    k = len(lengths)
    out = np.zeros(k, dtype=np.uint64)
    for i in range(k):  # <= 254 symbols: scalar loop is fine
        v = 0
        for b in sym_bytes[starts[i] : starts[i] + lengths[i]]:
            v = (v << 8) | int(b)
        out[i] = v
    return out


def _match_lengths(d: np.ndarray, table: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Longest symbol match per position -> (match_len uint8[n], code uint16[n]).

    match_len[i] == 0 means no symbol matches at i (escape needed).
    Lengths 1-2 are O(1) lookup tables; 3-4 one uint32 searchsorted each;
    5-8 a uint32 4-byte-prefix filter first, then the (few) candidate
    positions verify their suffix — no full-width uint64 pass ever runs."""
    lengths, starts, sym_bytes = _unpack_table(table)
    n = len(d)
    ml = np.zeros(n, dtype=np.uint8)
    code = np.zeros(n, dtype=np.uint16)
    if n == 0 or len(lengths) == 0:
        return ml, code
    sym_vals = _symbol_values(lengths, starts, sym_bytes)
    v2, v4 = _small_values(d)

    def apply(hit_pos, codes, L):
        ml[hit_pos] = L
        code[hit_pos] = codes

    # L = 1: 256-entry LUT
    sel = np.flatnonzero(lengths == 1)
    if len(sel):
        lut = np.full(256, 0xFFFF, dtype=np.uint16)
        lut[sym_vals[sel].astype(np.uint16)] = sel.astype(np.uint16)
        c = lut[d]
        hit = np.flatnonzero(c != 0xFFFF)
        apply(hit, c[hit], 1)
    # L = 2: 65536-entry LUT
    sel = np.flatnonzero(lengths == 2)
    if len(sel):
        lut = np.full(65536, 0xFFFF, dtype=np.uint16)
        lut[sym_vals[sel].astype(np.uint32)] = sel.astype(np.uint16)
        c = lut[v2]
        c[n - 1 :] = 0xFFFF
        hit = np.flatnonzero(c != 0xFFFF)
        apply(hit, c[hit], 2)
    # L >= 3: a 64K LUT on the first two bytes pre-filters candidates per
    # length (bit L-3 set iff some length-L symbol starts with those bytes);
    # only candidate positions — a small fraction — build and verify keys.
    has_long = lengths >= 3
    if has_long.any():
        pre2 = np.zeros(65536, dtype=np.uint8)
        first2 = (sym_vals >> ((lengths.astype(np.uint64) - 2) * np.uint64(8))).astype(np.uint32)
        for L in range(3, MAX_LEN + 1):
            sel = np.flatnonzero(lengths == L)
            if len(sel):
                pre2[first2[sel]] |= np.uint8(1 << (L - 3))
        mask_all = pre2[v2]
        mask_all[n - 2 :] = 0
        for L in range(3, MAX_LEN + 1):  # longest applied last overwrites
            sel = np.flatnonzero(lengths == L)
            if not len(sel):
                continue
            cand = np.flatnonzero(mask_all & np.uint8(1 << (L - 3)))
            cand = cand[cand + L <= n]
            if not len(cand):
                continue
            if L <= 4:
                key = _window_u32(d, v2, v4, L, at=cand).astype(np.uint64)
            else:
                suf = _window_u32(d, v2, v4, L - 4, at=cand + 4)
                key = (v4[cand].astype(np.uint64) << np.uint64(8 * (L - 4))) | suf
            sv = sym_vals[sel]
            order = np.argsort(sv)
            sv_s, codes_s = sv[order], sel[order]
            si = np.minimum(np.searchsorted(sv_s, key), len(sv_s) - 1)
            hit = sv_s[si] == key
            hp = cand[hit]
            apply(hp, codes_s[si[hit]].astype(np.uint16), L)
    return ml, code


def _greedy_token_positions(step: np.ndarray) -> np.ndarray:
    """Positions visited by the greedy left-to-right parse: start at 0, jump
    ``step`` bytes each time. List-ranking by pointer doubling — the path
    doubles every round, total gather work O(n)."""
    n = len(step)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # successor function with a terminal sentinel at index n (n maps to n);
    # int32 halves the gather traffic of the compositions below
    jump = np.empty(n + 1, dtype=np.int32)
    jump[:n] = np.minimum(np.arange(n, dtype=np.int64) + step, n).astype(np.int32)
    jump[n] = n
    # two-level walk: compose next^64 (6 full gathers), take coarse anchors
    # with a short scalar walk (|tokens|/64 steps), then expand each stride
    # back to single steps with 63 small vectorized gathers — O(n) total
    # instead of the O(n log n) full-composition doubling
    LOG = 6
    j64 = jump
    for _ in range(LOG):
        j64 = j64[j64]
    anchors = [0]
    pos = 0
    while pos < n:
        pos = int(j64[pos])
        anchors.append(pos)
    A = np.array(anchors[:-1], dtype=np.int32)  # last anchor is the sentinel
    rows = [A]
    cur = A
    for _ in range((1 << LOG) - 1):
        cur = jump[cur]
        rows.append(cur)
    path = np.stack(rows, axis=1).reshape(-1).astype(np.int64)
    keep = np.empty(len(path), dtype=bool)
    keep[0] = True
    np.greater(path[1:], np.maximum.accumulate(path)[:-1], out=keep[1:])
    path = path[keep]
    return path[path < n]


def _window_values_at(d: np.ndarray, pos: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Big-endian uint64 value of the window [pos, pos+len) per entry
    (training-only: runs on sample-sized arrays)."""
    out = np.zeros(len(pos), dtype=np.uint64)
    for j in range(MAX_LEN):
        m = lens > j
        if not m.any():
            break
        out[m] = (out[m] << np.uint64(8)) | d[pos[m] + j].astype(np.uint64)
    return out


def train(sample: np.ndarray, max_symbols: int = MAX_SYMBOLS, iters: int = 4) -> np.ndarray:
    """Iterative-refinement training (VLDB'20 section 3). Returns the packed
    symbol table (uint8 array: [k][lengths][bytes])."""
    d = np.asarray(sample, dtype=np.uint8)
    if len(d) < 4:
        return np.zeros(0, dtype=np.uint8)
    table = np.zeros(0, dtype=np.uint8)
    for _ in range(max(iters, 1)):
        ml, code = _match_lengths(d, table)
        step = np.maximum(ml, 1).astype(np.int64)
        pos = _greedy_token_positions(step)
        tok_len = step[pos]
        # gains for used symbols and for concatenations of adjacent tokens
        cand_len = tok_len[:-1] + tok_len[1:]
        ok = cand_len <= MAX_LEN
        cat_pos = pos[:-1][ok]
        cat_len = cand_len[ok]
        all_pos = np.concatenate([pos, cat_pos])
        all_len = np.concatenate([tok_len, cat_len])
        # value of each candidate window (big-endian, length-tagged)
        wv = _window_values_at(d, all_pos, all_len)
        # group identical (length, value) windows: sort key is the pair, since
        # a raw value can collide across lengths (leading zero bytes)
        order = np.lexsort((wv, all_len))
        sl, sv = all_len[order], wv[order]
        new_group = np.concatenate([[True], (np.diff(sl) != 0) | (np.diff(sv) != 0)])
        gidx = np.flatnonzero(new_group)
        counts = np.diff(np.append(gidx, len(sl)))
        glen = sl[gidx]
        gval = sv[gidx]
        gain = counts.astype(np.int64) * glen
        # drop single-byte singletons (never pay for a slot)
        keep = (counts >= 2) | (glen >= 2)
        glen, gval, gain = glen[keep], gval[keep], gain[keep]
        if not len(glen):
            break
        top = np.argsort(gain)[::-1][:max_symbols]
        glen, gval = glen[top], gval[top]
        # pack the new table
        lengths = glen.astype(np.uint8)
        total = int(lengths.sum())
        sym_bytes = np.empty(total, dtype=np.uint8)
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1].astype(np.int64), out=starts[1:])
        for i in range(len(lengths)):  # <= 254: scalar loop fine
            L = int(lengths[i])
            v = int(gval[i])
            for j in range(L):
                sym_bytes[starts[i] + L - 1 - j] = (v >> (8 * j)) & 0xFF
        table = _pack_table(lengths, sym_bytes)
    return table


def encode(data: np.ndarray, table: np.ndarray) -> bytes:
    d = np.asarray(data, dtype=np.uint8)
    n = len(d)
    header = (bytes([0]) if len(table) == 0 else np.asarray(table, dtype=np.uint8).tobytes())
    if n == 0:
        return header + (0).to_bytes(4, "little")
    ml, code = _match_lengths(d, table)
    if len(table) == 0 or not ml.any():
        out = np.empty(2 * n, dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = d
        return header + len(out).to_bytes(4, "little") + out.tobytes()
    step = np.maximum(ml, 1).astype(np.int64)
    pos = _greedy_token_positions(step)
    is_sym = ml[pos] > 0
    sizes = np.where(is_sym, 1, 2)
    dst = np.zeros(len(pos), dtype=np.int64)
    np.cumsum(sizes[:-1], out=dst[1:])
    total = int(sizes.sum())
    out = np.empty(total, dtype=np.uint8)
    out[dst[is_sym]] = code[pos[is_sym]].astype(np.uint8)
    lit = ~is_sym
    out[dst[lit]] = ESCAPE
    out[dst[lit] + 1] = d[pos[lit]]
    return header + total.to_bytes(4, "little") + out.tobytes()


def decode(blob) -> np.ndarray:
    buf = bytes(blob)
    k = buf[0]
    lengths = np.frombuffer(buf, dtype=np.uint8, count=k, offset=1)
    sym_total = int(lengths.sum())
    sym_bytes = np.frombuffer(buf, dtype=np.uint8, count=sym_total, offset=1 + k)
    starts = np.zeros(k, dtype=np.int64)
    if k:
        np.cumsum(lengths[:-1].astype(np.int64), out=starts[1:])
    hdr = 1 + k + sym_total
    plen = int.from_bytes(buf[hdr : hdr + 4], "little")
    payload = np.frombuffer(buf, dtype=np.uint8, count=plen, offset=hdr + 4)
    if plen == 0:
        return np.empty(0, dtype=np.uint8)
    # token boundaries: escape tokens consume 2 payload bytes. Within a run of
    # consecutive ESCAPE bytes starting at a token start, escapes at even
    # offsets are tokens (ESCAPE as the literal byte is covered by parity).
    is_esc = payload == ESCAPE
    token_start = np.ones(plen, dtype=bool)
    esc_idx = np.flatnonzero(is_esc)
    if len(esc_idx):
        run_head = np.concatenate([[True], np.diff(esc_idx) > 1])
        run_start_pos = np.maximum.accumulate(np.where(run_head, esc_idx, 0))
        is_tok_esc = ((esc_idx - run_start_pos) % 2) == 0
        consumed = esc_idx[is_tok_esc] + 1
        consumed = consumed[consumed < plen]
        token_start[consumed] = False
    tok_pos = np.flatnonzero(token_start)
    tok_byte = payload[tok_pos]
    tok_is_esc = tok_byte == ESCAPE
    sym_ok = (~tok_is_esc) & (tok_byte < k)
    out_sizes = np.ones(len(tok_pos), dtype=np.int64)
    out_sizes[sym_ok] = lengths[tok_byte[sym_ok]]
    dst = np.zeros(len(tok_pos), dtype=np.int64)
    np.cumsum(out_sizes[:-1], out=dst[1:])
    out = np.empty(int(out_sizes.sum()), dtype=np.uint8)
    # literals from escapes
    out[dst[tok_is_esc]] = payload[np.minimum(tok_pos[tok_is_esc] + 1, plen - 1)]
    # invalid codes decode as the raw byte (defensive)
    bad = (~tok_is_esc) & ~sym_ok
    if bad.any():
        out[dst[bad]] = tok_byte[bad]
    # symbols: ragged scatter of table bytes
    if sym_ok.any():
        codes = tok_byte[sym_ok]
        ls = lengths[codes].astype(np.int64)
        tot = int(ls.sum())
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ls[:-1])]), ls)
        out[np.repeat(dst[sym_ok], ls) + within] = sym_bytes[
            np.repeat(starts[codes], ls) + within]
    return out
