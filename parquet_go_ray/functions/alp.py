"""ALP: Adaptive Lossless floating-Point compression for float columns.

North-star addition (not in the reference — parquet-go encodes floats PLAIN
only, type_float.go / type_double.go; BASELINE.json asks for "the best of"
lightweight codecs per column). ALP (Afroozeh & Boncz, "ALP: Adaptive
Lossless floating-Point Compression", SIGMOD'24 — public algorithm) targets
floats that are *decimals in disguise*: sensor readings, prices, ratios
stored as float64 but carrying ≤ ~15 significant decimal digits. Each value
is mapped to an integer ``I = round((v · 10^e) / 10^f)`` for one chunk-wide
exponent pair ``(e, f)``; decode is ``v' = (I · 10^f) / 10^e`` in IEEE
float64 (exact same op order both sides). Decode DIVIDES where the paper
multiplies by the precomputed inverse: division is correctly rounded, so
``I / 10^e`` lands on the nearest double of the exact decimal and every
true k-decimal value round-trips with zero exceptions (``8007 · 0.01`` is
1 ulp off ``80.07``; ``8007 / 100`` is not). Values whose round-trip is not
BIT-identical become *exceptions*: stored raw (position + original bits) and
patched over the decoded output, so the codec is lossless on any input —
NaN payloads, ±inf, -0.0, full-entropy mantissas — it just stops being
small when the decimal assumption fails. The integer vector is encoded with
the existing frame-of-reference bit-packer (functions/forr.py), which is
where the size win comes from: a 2-decimal price column needs
``log2(range·100)`` bits/value instead of 64.

The ``f`` factor trims trailing decimal zeros (e.g. prices quoted in
hundreds): ``e=2, f=0`` encodes cents; ``e=2, f=2`` would encode the same
values as whole units if they are all integral. ``choose_exponents`` picks
``(e, f)`` on a sample by exhaustive search over e ∈ [0,18], f ∈ [0,18],
scoring by estimated encoded size (FOR width of the exact ints + raw cost
of exceptions) — the same sampled-trial discipline as the BSS/FSST arms.
f > e (not in the paper's f ≤ e space) trims trailing DECIMAL zeros:
values that are all multiples of 100 encode as ``v/100`` with
``e=0, f=2`` — the bit-identity gate makes the wider space free.

float32/float16 inputs are widened to float64 for the integer mapping and
narrowed back with ``astype`` at the end of decode; the bit-exactness check
runs on the NARROW type, so the round-trip guarantee is on the stored bits.

Wire (self-contained per page, like every codec in this repo):
  [fw:u8 = float width 2|4|8][e:u8][f:u8][n:u32le][n_exc:u32le][ilen:u32le]
  [FOR blob, ilen bytes]  (functions/forr.py MODE_FOR; int32 for fw≤4)
  [exception positions u32le × n_exc][exception raw bits fw × n_exc]
"""

from __future__ import annotations

import numpy as np

from . import forr

MAX_E = 18  # 10^18 < 2^63; beyond this float64 cannot hold exact decimals

# Powers of ten as exact-as-possible float64 constants. Indexing a
# precomputed table keeps encode and decode on identical bit patterns.
_F10 = np.array([10.0 ** k for k in range(MAX_E + 1)], dtype=np.float64)

_UINT = {2: np.uint16, 4: np.uint32, 8: np.uint64}
_FLT = {2: np.float16, 4: np.float32, 8: np.float64}
# Integer class per float width: float16/32 ints fit comfortably in int32
# (a float32 has 24 significand bits), float64 needs int64.
_LIMIT = {2: float(2 ** 24), 4: float(2 ** 31 - 1), 8: float(2 ** 53)}
_NBITS = {2: 32, 4: 32, 8: 64}


def _map_ints(v64: np.ndarray, e: int, f: int, limit: float):
    """(ints_f64, in_range_mask) for the candidate exponent pair."""
    # "+ 0.0" canonicalizes -0.0 → +0.0: the stored INTEGER cannot carry a
    # signed zero, so the verify mask must see exactly what decode will
    # reproduce (a raw -0.0 input then fails the bit check → exception)
    ints = np.rint((v64 * _F10[e]) / _F10[f]) + 0.0
    ok = np.isfinite(ints) & (np.abs(ints) <= limit)
    return ints, ok


def _exact_mask(values: np.ndarray, ints: np.ndarray, ok: np.ndarray,
                e: int, f: int) -> np.ndarray:
    """Bit-identical round-trip mask on the SOURCE dtype."""
    dec64 = (np.where(ok, ints, 0.0) * _F10[f]) / _F10[e]
    dec = dec64 if values.dtype.itemsize == 8 else dec64.astype(values.dtype)
    u = _UINT[values.dtype.itemsize]
    return ok & (dec.view(u) == values.view(u))


def choose_exponents(values: np.ndarray) -> tuple[int, int, float]:
    """Pick (e, f) on a sample; returns (e, f, exact_fraction).

    Exhaustive over the 361 (e, f) pairs — on a ≤4k-value sample this is a
    few ms, run once per stream by the selector trial. Score = estimated
    encoded bytes: FOR-packed width of the exactly-representable ints plus
    (pos + raw bits) per exception. Ties break toward MORE exact values
    (exceptions hurt downstream compressibility beyond their byte count),
    then smaller e-f (smaller integers, narrower packs), then smaller e."""
    v = np.ascontiguousarray(values)
    if len(v) > 4096:  # the trial hands us ≤8k; guard anyway
        v = v[:: len(v) // 4096 + 1]
    if len(v) == 0:
        return 0, 0, 0.0
    fw = v.dtype.itemsize
    v64 = v.astype(np.float64) if fw != 8 else v
    limit = _LIMIT[fw]
    n = len(v)
    best = None  # (size, e - f, e, f, frac)
    for e in range(MAX_E + 1):
        for f in range(MAX_E + 1):
            ints, ok = _map_ints(v64, e, f, limit)
            exact = _exact_mask(v, ints, ok, e, f)
            n_exact = int(exact.sum())
            if n_exact == 0:
                continue
            ie = ints[exact]
            width = max(int(ie.max() - ie.min()), 0).bit_length()
            size = n_exact * width / 8 + (n - n_exact) * (4 + fw)
            key = (size, n - n_exact, e - f, e)
            if best is None or key < best[:4]:
                best = key + (f, n_exact / n)
    if best is None:
        return 0, 0, 0.0
    return best[3], best[4], best[5]


def encode(values: np.ndarray, e: int, f: int) -> bytes:
    """Encode one page with the chunk-wide (e, f). Lossless for ANY input —
    non-representable values ride along as raw exceptions."""
    v = np.ascontiguousarray(values)
    fw = v.dtype.itemsize
    n = len(v)
    nbits = _NBITS[fw]
    head = bytes([fw, e, f])
    if n == 0:
        ints_blob = forr.encode(np.empty(0, np.int64 if nbits == 64 else np.int32),
                                nbits, forr.MODE_FOR)
        return (head + (0).to_bytes(4, "little") * 2
                + len(ints_blob).to_bytes(4, "little") + ints_blob)
    v64 = v.astype(np.float64) if fw != 8 else v
    ints, ok = _map_ints(v64, e, f, _LIMIT[fw])
    exact = _exact_mask(v, ints, ok, e, f)
    idt = np.int64 if nbits == 64 else np.int32
    ints_i = np.where(exact, ints, 0.0).astype(idt)
    exc_pos = np.flatnonzero(~exact).astype(np.uint32)
    if len(exc_pos) and len(exc_pos) < n:
        # fill exceptions with the min exact int: keeps the FOR residual
        # range exactly what the exact values span (0 could widen it)
        ints_i[~exact] = ints_i[exact].min()
    ints_blob = forr.encode(ints_i, nbits, forr.MODE_FOR)
    exc_raw = v[~exact].view(np.uint8).tobytes() if len(exc_pos) else b""
    return (head
            + n.to_bytes(4, "little")
            + len(exc_pos).to_bytes(4, "little")
            + len(ints_blob).to_bytes(4, "little")
            + ints_blob
            + exc_pos.tobytes()
            + exc_raw)


def decode(data) -> np.ndarray:
    buf = bytes(data)
    if len(buf) < 15:
        raise ValueError("ALP: truncated header")
    fw, e, f = buf[0], buf[1], buf[2]
    if fw not in _FLT or e > MAX_E or f > MAX_E:
        raise ValueError(f"ALP: bad header (fw={fw}, e={e}, f={f})")
    n = int.from_bytes(buf[3:7], "little")
    n_exc = int.from_bytes(buf[7:11], "little")
    ilen = int.from_bytes(buf[11:15], "little")
    if n_exc > n or 15 + ilen + n_exc * (4 + fw) > len(buf):
        raise ValueError("ALP: lengths exceed payload")
    dt = _FLT[fw]
    if n == 0:
        return np.empty(0, dtype=dt)
    pos = 15
    ints = forr.decode(buf[pos : pos + ilen])
    if len(ints) != n:
        raise ValueError(f"ALP: FOR blob holds {len(ints)} values, header says {n}")
    pos += ilen
    dec64 = (ints.astype(np.float64) * _F10[f]) / _F10[e]
    out = dec64 if fw == 8 else dec64.astype(dt)
    if n_exc:
        exc_pos = np.frombuffer(buf, dtype=np.uint32, count=n_exc, offset=pos)
        pos += 4 * n_exc
        exc = np.frombuffer(buf, dtype=dt, count=n_exc, offset=pos)
        if len(exc_pos) and int(exc_pos.max()) >= n:
            raise ValueError("ALP: exception position out of range")
        out = np.ascontiguousarray(out)
        out[exc_pos] = exc
    return out


# ----------------------------------------------------------------- ALP-RD
# The second half of the ALP paper: "real doubles" that are NOT decimals
# (embeddings, physical measurements). The float's bit pattern is cut at a
# chunk-chosen position L: the LEFT L bits (sign + exponent + top mantissa)
# cluster heavily and are dictionary-encoded; the RIGHT fw*8-L bits are
# near-random and stored bit-packed raw. A pure bit repartition — lossless
# by construction on every input, no exceptions, no verify gate. Wins where
# ALP classic can't bite (measured 3.50 vs 3.71 B/val for BSS+zstd on the
# sf embeddings corpus).

RD_MAX_DICT = 1 << 16  # left-pattern dictionary cap (paper uses 8-bit + exc)

from . import bitpack  # noqa: E402  (kept local to the RD section)


def choose_left_width(values: np.ndarray) -> tuple[int, float]:
    """Pick the left-cut L on a sample; returns (L, est_bytes_per_value).

    L=0 means RD cannot win (dictionary overflow at every cut)."""
    v = np.ascontiguousarray(values)
    if len(v) == 0:
        return 0, float("inf")
    fw = v.dtype.itemsize
    tot = fw * 8
    bits = v.view(_UINT[fw]).astype(np.uint64)
    n = len(v)
    best_l, best_bpv = 0, float("inf")
    for L in range(1, min(16, tot) + 1):
        left = bits >> (tot - L)
        u = len(np.unique(left))
        if u > RD_MAX_DICT:
            continue
        w_idx = max((u - 1).bit_length(), 1)
        bpv = (w_idx + (tot - L)) / 8 + (u * L / 8) / n
        if bpv < best_bpv:
            best_l, best_bpv = L, bpv
    return best_l, best_bpv


def encode_rd(values: np.ndarray, L: int) -> bytes:
    """Wire: [fw:u8][L:u8][n:u32le][ndict:u32le][dlen:u32le][ilen:u32le]
    [dict packed @L bits][indices packed][right bits packed]."""
    v = np.ascontiguousarray(values)
    fw = v.dtype.itemsize
    tot = fw * 8
    if not 1 <= L <= min(16, tot):
        raise ValueError(f"ALP_RD: left width {L} out of range")
    n = len(v)
    head = bytes([fw, L]) + n.to_bytes(4, "little")
    if n == 0:
        return head + (0).to_bytes(4, "little") * 3
    # stay in the native width: widening 500k float32 bits to uint64 cost
    # more than the two shifts it fed (uint32 ops are also faster per the
    # bitpack kernel's measurements); pack() casts internally as needed
    u = _UINT[fw]
    bits = v.view(u)
    left = bits >> u(tot - L)
    right = bits & u(((1 << (tot - L)) - 1) & ((1 << tot) - 1))
    # L <= 16, so the left-pattern space is small: bincount + LUT builds the
    # dictionary in O(n + 2^L) — np.unique's sort was 82% of encode wall
    li = left.astype(np.intp)
    counts = np.bincount(li, minlength=1 << L)
    uniq = np.flatnonzero(counts).astype(np.uint64)
    if len(uniq) > RD_MAX_DICT:
        raise ValueError(f"ALP_RD: {len(uniq)} left patterns exceed the "
                         f"{RD_MAX_DICT} dictionary cap")
    lut = np.zeros(1 << L, dtype=np.uint32)
    lut[uniq.astype(np.intp)] = np.arange(len(uniq), dtype=np.uint32)
    idx = lut[li]
    w_idx = max((len(uniq) - 1).bit_length(), 1)
    dict_blob = bitpack.pack(uniq, L)
    idx_blob = bitpack.pack(idx, w_idx)
    right_blob = bitpack.pack(right, tot - L)
    return (head
            + len(uniq).to_bytes(4, "little")
            + len(dict_blob).to_bytes(4, "little")
            + len(idx_blob).to_bytes(4, "little")
            + dict_blob + idx_blob + right_blob)


def decode_rd(data) -> np.ndarray:
    buf = bytes(data)
    if len(buf) < 18:
        raise ValueError("ALP_RD: truncated header")
    fw, L = buf[0], buf[1]
    if fw not in _FLT or not 1 <= L <= min(16, fw * 8):
        raise ValueError(f"ALP_RD: bad header (fw={fw}, L={L})")
    tot = fw * 8
    n = int.from_bytes(buf[2:6], "little")
    ndict = int.from_bytes(buf[6:10], "little")
    dlen = int.from_bytes(buf[10:14], "little")
    ilen = int.from_bytes(buf[14:18], "little")
    if n == 0:
        return np.empty(0, dtype=_FLT[fw])
    if ndict == 0 or ndict > RD_MAX_DICT or 18 + dlen + ilen > len(buf):
        raise ValueError("ALP_RD: lengths exceed payload")
    pos = 18
    uniq = bitpack.unpack(buf[pos : pos + dlen], L, ndict)
    pos += dlen
    w_idx = max((ndict - 1).bit_length(), 1)
    idx = bitpack.unpack(buf[pos : pos + ilen], w_idx, n)
    pos += ilen
    right = bitpack.unpack(buf[pos:], tot - L, n)
    if int(idx.max()) >= ndict:
        raise ValueError("ALP_RD: dictionary index out of range")
    if fw == 8:
        return ((uniq[idx] << np.uint64(tot - L)) | right).view(np.float64)
    u = _UINT[fw]  # narrow FIRST: one uint64 combine pass costs more than two
    return ((uniq.astype(u)[idx] << u(tot - L))
            | right.astype(u)).view(_FLT[fw])
