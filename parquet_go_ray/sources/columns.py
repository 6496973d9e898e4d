"""Encode/decode one shredded stream (column chunk) with codec auto-selection.

This is the moral equivalent of the reference's ``writeChunk``/``readChunk``
(/root/reference/chunk_writer.go:154-317, chunk_reader.go:299-362): per
stream pick a codec (dictionary decided chunk-wide like the reference's
chunk-flush re-decision at chunk_writer.go:174-209), cut pages at a byte
budget (~1 MiB uncompressed estimate, data_store.go:149-154), compress each
page, and record per-page offsets + stats for the footer.

All values-level work is numpy/pyarrow vectorized; Python only orchestrates
per-page bookkeeping.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions import alp, bitpack, bytearray as ba, delta, dictionary, forr, fsst, hybrid, plain
from ..functions.shred import Stream
from ..state import selector as sel

DEFAULT_PAGE_BYTES = 1 << 20  # reference default max page size


@dataclass
class EncodeConfig:
    mode: str = sel.MODE_EXTENDED  # selector mode: "reference" | "extended"
    compression: str = "snappy"  # per-page: none | snappy | zstd | gzip | lz4
    page_bytes: int = DEFAULT_PAGE_BYTES
    crc: bool = True
    column_codecs: dict = field(default_factory=dict)  # path -> forced codec name
    # top-level column names to build split-block Bloom filters for
    # (sources/bloom.py): equality point-lookups prune whole partitions on
    # high-cardinality columns where min/max stats can't (decode_dataset's
    # eq_filter). int/string/binary columns only.
    bloom_columns: tuple = ()
    # file-level key/value metadata (str -> str), carried in every partition
    # footer + lineage record — the WithMetaData role of the reference
    # (/root/reference/file_writer.go:86-98)
    metadata: dict = field(default_factory=dict)


def _buf(payload):
    if isinstance(payload, np.ndarray):
        return memoryview(np.ascontiguousarray(payload)).cast("B")
    return payload


# ------------------------------------------------------ compressor registry
# Built-ins route through pyarrow's block codecs; ``register_compressor``
# adds a user codec by name — the RegisterBlockCompressor role of the
# reference (/root/reference/compress.go:131-137). Registration is
# per-process (exactly the reference's contract: the codec must be
# registered in any process that encodes or decodes with it) — under Ray,
# register at import time of a module your pipeline imports so workers
# re-register when they import it.
_BUILTIN_CODECS = frozenset({"none", "snappy", "zstd", "gzip", "lz4"})
_CUSTOM_COMPRESSORS: dict[str, tuple] = {}


def register_compressor(name: str, compress_fn, decompress_fn) -> None:
    """Register a page compressor: ``compress_fn(buffer) -> bytes-like``,
    ``decompress_fn(buffer, usize) -> bytes-like of exactly usize bytes``.
    Any ``EncodeConfig(compression=name)`` then uses it for every page."""
    if name in _BUILTIN_CODECS:
        raise ValueError(f"cannot override built-in codec {name!r}")
    if not callable(compress_fn) or not callable(decompress_fn):
        raise TypeError("register_compressor needs two callables")
    _CUSTOM_COMPRESSORS[name] = (compress_fn, decompress_fn)


def _compress(payload, codec: str):
    """payload: any buffer-like (bytes, memoryview, C-contiguous ndarray).
    Returns a buffer-like; no .to_pybytes() copy — the file writer streams
    buffers directly (memory traffic matters: encode is bandwidth-bound)."""
    if codec == "none" or len(payload) == 0:
        return payload
    custom = _CUSTOM_COMPRESSORS.get(codec)
    if custom is not None:
        return custom[0](_buf(payload))
    return pa.compress(payload, codec=codec)


def _decompress(payload: bytes, codec: str, usize: int):
    """-> buffer-like (bytes or zero-copy memoryview of the arrow Buffer).
    No .to_pybytes(): that copied EVERY decompressed page — a full extra pass
    over the decoded dataset. Decoders consume via np.frombuffer /
    int.from_bytes / slicing, all of which take memoryviews."""
    if codec == "none" or usize == 0:
        return payload
    custom = _CUSTOM_COMPRESSORS.get(codec)
    if custom is not None:
        out = custom[1](payload, usize)
        if len(out) != usize:
            raise ValueError(
                f"custom codec {codec!r} returned {len(out)} bytes, "
                f"page declares {usize}")
        return out if isinstance(out, memoryview) else memoryview(out)
    if codec not in _BUILTIN_CODECS:
        raise ValueError(
            f"unknown page codec {codec!r} — call register_compressor() in "
            "this process (Ray workers re-register via module import)")
    return memoryview(pa.decompress(payload, decompressed_size=usize, codec=codec))


_INT_CLASS = {"int8": 32, "int16": 32, "int32": 32, "uint8": 32, "uint16": 32, "uint32": 32,
              "int64": 64, "uint64": 64}


def _bss_split(v: np.ndarray) -> np.ndarray:
    """values -> plane-major bytes (all byte-0s, then all byte-1s, ...): the
    BYTE_STREAM_SPLIT transform. ``np.ravel(.T, order='C')`` is ONE strided
    gather over the buffer — ~2.7x cheaper than per-plane
    ``ascontiguousarray`` copies (measured 25 vs 67 ms on a 37 MB stream)."""
    k = v.dtype.itemsize
    return np.ravel(np.ascontiguousarray(v).view(np.uint8).reshape(len(v), k).T, order="C")


def _bss_trial(v: np.ndarray, config: EncodeConfig,
               baseline_encode=None) -> str | None:
    """Sampled BYTE_STREAM_SPLIT trial (extended mode; unimplemented in the
    reference, README.md:44-51): does transposing value bytes into planes make
    the page compressor strictly better? Tried jointly with the plane codec —
    snappy is pathologically slow on byte planes while zstd is both faster and
    smaller there, so the trial picks the best of {configured codec, zstd} on
    the sample and the winner is recorded per stream in the footer (decode
    honors per-stream ``compression``). Returns the winning plane codec, or
    None when the incumbent stays within 5%.

    ``baseline_encode`` encodes the sample with the codec the size model
    chose (FOR / delta / ...); default is PLAIN. Challenging the non-PLAIN
    winners matters on key-pure layouts: a single-source token chunk has a
    narrow value range, so FOR beats PLAIN in the pre-compression size model
    — but the model can't see that the page compressor recovers far more
    from BSS planes than from bit-packed FOR frames (measured 452 vs 292 MB
    on the 2M-row fixture's keyed layout, round 5).

    The sample is four CONTIGUOUS chunks spread across the stream: contiguity
    keeps run structure visible to the compressor (a strided sample destroys
    it), spreading covers strata-ordered data (e.g. the token fixture's
    per-source blocks)."""
    n = len(v)
    if config.compression == "none" or n < 4096:
        return None
    if n > 8192:
        step = max(n // 4, 1)
        sample = np.concatenate([v[i * step : i * step + 2048] for i in range(4)])
    else:
        sample = np.ascontiguousarray(v)
    base = _buf(sample) if baseline_encode is None else _buf(baseline_encode(sample))
    base_c = len(_compress(base, config.compression))
    bss = _bss_split(sample)
    best_codec, best = None, base_c * 0.95
    for cand in dict.fromkeys((config.compression, "zstd")):
        sz = len(_compress(bss, cand))
        if sz < best:
            best_codec, best = cand, sz
    return best_codec


def _trial_sample(v: np.ndarray) -> np.ndarray:
    """Four CONTIGUOUS chunks spread across the stream (same rationale as
    _bss_trial: contiguity preserves run structure, spreading covers
    strata-ordered data)."""
    n = len(v)
    if n > 8192:
        step = max(n // 4, 1)
        return np.concatenate([v[i * step : i * step + 2048] for i in range(4)])
    return np.ascontiguousarray(v)


def _challenge(enc: bytes, config: EncodeConfig, incumbent_size: int):
    """Compress a candidate sample encoding with the allowed page codecs;
    return (codec, size) when strictly (>5%) smaller than the incumbent,
    else None. compression="none" stays "none" (the user asked for speed;
    ALP/ALP_RD are real size reductions, not compressibility transforms,
    so they still run)."""
    cands = ("none",) if config.compression == "none" else dict.fromkeys(
        (config.compression, "zstd"))
    best_codec, best = None, incumbent_size * 0.95
    for cand in cands:
        sz = len(_compress(enc, cand))
        if sz < best:
            best_codec, best = cand, sz
    return (best_codec, best) if best_codec else None


def _alp_trial(v: np.ndarray, config: EncodeConfig, incumbent_size: int):
    """Sampled ALP trial for float streams (extended mode). Returns
    ``(e, f, plane_codec, size)`` when ALP's encoded+compressed sample is
    strictly smaller than the incumbent, else None."""
    sample = _trial_sample(v)
    e, f, frac = alp.choose_exponents(sample)
    if frac < 0.5:  # mostly exceptions: cannot win, skip the encode work
        return None
    win = _challenge(alp.encode(sample, e, f), config, incumbent_size)
    return (e, f, win[0], win[1]) if win else None


def _alprd_trial(v: np.ndarray, config: EncodeConfig, incumbent_size: int):
    """Sampled ALP_RD trial (the paper's 'real doubles' half): left-bits
    dictionary + right-bits packed. Returns ``(L, plane_codec, size)`` when
    strictly smaller than the incumbent, else None."""
    sample = _trial_sample(v)
    L, _bpv = alp.choose_left_width(sample)
    if L == 0:
        return None
    win = _challenge(alp.encode_rd(sample, L), config, incumbent_size)
    return (L, win[0], win[1]) if win else None


def _decode_bss_pages(pages: list[dict], page_payload, dtype_str: str) -> np.ndarray:
    """Interleave BSS plane pages straight into ONE preallocated output
    array: per-plane column assignment into the final buffer is ~5x cheaper
    than ``ascontiguousarray(planes.T)`` per page + a concatenate pass
    (0.40 vs 2.18 ms per 1 MiB page) — decode is bandwidth-bound and the
    transpose temp plus concat were two full extra passes."""
    dt = np.dtype(dtype_str)
    k = dt.itemsize
    total = sum(p["num_values"] for p in pages)
    out = np.empty(total, dtype=dt)
    ob = out.view(np.uint8).reshape(total, k) if total else None
    pos = 0
    for p in pages:
        nv = p["num_values"]
        if nv == 0:  # zero-row stream: one empty page, ob is None
            continue
        planes = np.frombuffer(page_payload(p), dtype=np.uint8).reshape(k, nv)
        tgt = ob[pos : pos + nv]
        for i in range(k):
            tgt[:, i] = planes[i]
        pos += nv
    return out


def _to_class(values: np.ndarray, dtype: str) -> tuple[np.ndarray, int]:
    nbits = _INT_CLASS[dtype]
    if nbits == 32:
        if values.dtype.itemsize < 4:
            return values.astype(np.int32), 32
        return values.view(np.int32), 32
    return values.view(np.int64), 64


def _from_class(values: np.ndarray, dtype: str) -> np.ndarray:
    if values.dtype.itemsize == np.dtype(dtype).itemsize:
        return values.view(dtype)
    return values.astype(dtype)


def _page_slices(n: int, per_value_bytes: float, page_bytes: int) -> list[tuple[int, int]]:
    if n == 0:
        return [(0, 0)]
    per_page = max(1, int(page_bytes / max(per_value_bytes, 1e-9)))
    return [(i, min(i + per_page, n)) for i in range(0, n, per_page)]


def encode_stream(stream: Stream, config: EncodeConfig) -> tuple[list[bytes], dict]:
    """Returns (page payload blobs in order, stream meta dict).

    Meta: {path, kind, dtype, codec, compression, num_values, pages:[...],
    dict: {...}|None, stats:{...}}. Page/dict offsets are assigned by the file
    writer when it lays blobs into the file.
    """
    kind, dtype = stream.kind, stream.dtype
    forced = config.column_codecs.get(stream.path)
    blobs: list[bytes] = []
    pages: list[dict] = []
    dict_meta = None
    stats: dict = {}
    # per-stream page codec: the BSS trial may override it (footer records it
    # per stream; decode_stream reads meta["compression"], never the config)
    stream_comp = config.compression

    def add_page(payload, num_values: int) -> None:
        payload = _buf(payload)
        comp = _compress(payload, stream_comp)
        pages.append(
            {
                "size": len(comp),
                "usize": len(payload),
                "num_values": num_values,
                # CRC over the COMPRESSED blob: the integrity pass touches the
                # smaller buffer on both write and read (~0.5x the bytes)
                "crc32_comp": zlib.crc32(comp) & 0xFFFFFFFF if config.crc else None,
            }
        )
        blobs.append(comp)

    if kind == "validity":
        v = np.asarray(stream.data, dtype=np.uint64)
        codec = "HYBRID1"
        stats = {"null_count": int(stream.num_values - int(v.sum()))}
        for lo, hi in _page_slices(len(v), 0.125, config.page_bytes):
            add_page(hybrid.encode(v[lo:hi], 1), hi - lo)
    elif kind == "values" and dtype == "bool":
        v = np.asarray(stream.data, dtype=np.uint64)
        if forced and forced not in ("PLAIN", "RLE_BOOL"):
            raise ValueError(f"unknown bool codec {forced!r} for "
                             f"{stream.path!r}; valid: PLAIN, RLE_BOOL")
        codec = forced or sel.choose_bool_codec(np.asarray(stream.data), config.mode).codec
        for lo, hi in _page_slices(len(v), 0.125, config.page_bytes):
            if codec == "RLE_BOOL":
                add_page(hybrid.encode(v[lo:hi], 1), hi - lo)
            else:
                add_page(plain.encode_bool(np.asarray(stream.data)[lo:hi]), hi - lo)
    elif kind in ("values", "lengths") and dtype in _INT_CLASS:
        raw = np.asarray(stream.data)
        v, nbits = _to_class(raw, dtype)
        st = sel.int_stats(v)
        stats = {"min": int(st.min) if st.num_values else None,
                 "max": int(st.max) if st.num_values else None,
                 "distinct": st.distinct}
        codec = forced or sel.choose_int_codec(st, config.mode).codec
        if not forced and config.mode == sel.MODE_EXTENDED:
            # Mixed-source token chunks land on PLAIN (full-range min/max
            # kills FOR/delta, cardinality past the dict cutoff kills DICT)
            # yet carry ~8 bits/value of entropy — the BSS planes expose it.
            # Key-PURE chunks land on FOR/delta instead (narrow per-source
            # range), so those winners are challenged too, with the sample
            # encoded under the incumbent codec as the baseline. DICT is not
            # challenged: its cost amortizes the dictionary page over the
            # whole chunk, which a sampled trial systematically overstates.
            baseline = {
                "PLAIN": None,
                "FOR": lambda s: forr.encode(s, nbits, forr.MODE_FOR),
                "FOR_DELTA": lambda s: forr.encode(s, nbits, forr.MODE_FOR_DELTA),
                "DELTA_BP": lambda s: delta.encode(s, nbits),
            }
            if codec in baseline:
                pc = _bss_trial(v, config, baseline_encode=baseline[codec])
                if pc:
                    codec, stream_comp = "BSS", pc
        if codec == "DICT":
            if st.uniques is not None:
                uniq = st.uniques
                inv = np.searchsorted(uniq, v)
            else:
                uniq, inv = np.unique(v, return_inverse=True)
            if len(uniq) > sel.DICT_MAX_CARD:  # forced dict past cutoff: fall back like the reference
                codec = "PLAIN"
            else:
                dpayload = _buf(plain.encode_fixed(uniq))
                dcomp = _compress(dpayload, stream_comp)
                dict_meta = {"size": len(dcomp), "usize": len(dpayload), "num_values": len(uniq),
                             "crc32_comp": zlib.crc32(dcomp) & 0xFFFFFFFF if config.crc else None}
                blobs.append(dcomp)
                for lo, hi in _page_slices(len(v), max(bitpack.bit_width(max(len(uniq) - 1, 0)), 1) / 8, config.page_bytes):
                    add_page(dictionary.encode_indices(inv[lo:hi], len(uniq)), hi - lo)
        if codec != "DICT":
            for lo, hi in _page_slices(len(v), v.dtype.itemsize, config.page_bytes):
                pv = v[lo:hi]
                if codec == "PLAIN":
                    add_page(plain.encode_fixed(pv), hi - lo)
                elif codec == "DELTA_BP":
                    add_page(delta.encode(pv, nbits), hi - lo)
                elif codec == "FOR":
                    add_page(forr.encode(pv, nbits, forr.MODE_FOR), hi - lo)
                elif codec == "FOR_DELTA":
                    add_page(forr.encode(pv, nbits, forr.MODE_FOR_DELTA), hi - lo)
                elif codec == "BSS":
                    add_page(_bss_split(pv), hi - lo)
                else:
                    raise ValueError(f"unknown int codec {codec}")
    elif kind == "values":  # float16 / float32 / float64
        raw = np.asarray(stream.data)
        _u = {2: np.uint16, 4: np.uint32, 8: np.uint64}[raw.dtype.itemsize]
        _i = {2: np.int16, 4: np.int32, 8: np.int64}[raw.dtype.itemsize]
        bits = raw.view(_u)
        st = sel.int_stats(bits.view(_i))
        stats = {"distinct": st.distinct}
        if len(raw):
            finite = raw[np.isfinite(raw)]
            if len(finite):
                stats["min"], stats["max"] = float(finite.min()), float(finite.max())
        dict_ok = st.distinct is not None and st.distinct <= sel.DICT_MAX_CARD
        if forced and forced not in ("PLAIN", "DICT", "BSS", "ALP", "ALP_RD"):
            raise ValueError(f"unknown float codec {forced!r} for "
                             f"{stream.path!r}; valid: PLAIN, DICT, BSS, "
                             f"ALP, ALP_RD")
        codec = forced or ("DICT" if dict_ok and (config.mode == sel.MODE_REFERENCE or st.unique_bytes + st.num_values * bitpack.bit_width(max((st.distinct or 1) - 1, 0)) / 8 < st.plain_size) else "PLAIN")
        alp_ef = (0, 0)
        alp_rd_l = 8
        if forced == "ALP":
            alp_ef = alp.choose_exponents(_trial_sample(raw))[:2]
        elif forced == "ALP_RD":
            alp_rd_l = alp.choose_left_width(_trial_sample(raw))[0] or 8
        if codec == "PLAIN" and not forced and config.mode == sel.MODE_EXTENDED and len(raw) >= 4096:
            # Challenge chain, each arm must beat the current winner by a
            # strict 5% on the same sample: PLAIN -> BSS (compressor sees
            # the repetitive exponent planes) -> ALP (decimal-in-disguise
            # floats pack to a few bits/value as integers) -> ALP_RD
            # (high-entropy 'real doubles': left-bits dictionary + packed
            # right bits — wins where the left patterns straddle BSS's
            # byte-plane boundaries).
            sample = _trial_sample(raw)
            incumbent = len(_compress(_buf(sample), config.compression))
            pc = _bss_trial(raw, config)
            if pc:
                codec, stream_comp = "BSS", pc
                incumbent = len(_compress(_bss_split(sample), pc))
            alp_pick = _alp_trial(raw, config, incumbent)
            if alp_pick:
                alp_ef, codec, stream_comp = alp_pick[:2], "ALP", alp_pick[2]
                incumbent = alp_pick[3]
            rd_pick = _alprd_trial(raw, config, incumbent)
            if rd_pick:
                alp_rd_l, codec, stream_comp = rd_pick[0], "ALP_RD", rd_pick[1]
        if codec == "DICT" and dict_ok:
            uniq_bits, inv = np.unique(bits, return_inverse=True)
            dpayload = _buf(plain.encode_fixed(uniq_bits.view(raw.dtype)))
            dcomp = _compress(dpayload, stream_comp)
            dict_meta = {"size": len(dcomp), "usize": len(dpayload), "num_values": len(uniq_bits),
                         "crc32_comp": zlib.crc32(dcomp) & 0xFFFFFFFF if config.crc else None}
            blobs.append(dcomp)
            for lo, hi in _page_slices(len(raw), max(bitpack.bit_width(max(len(uniq_bits) - 1, 0)), 1) / 8, config.page_bytes):
                add_page(dictionary.encode_indices(inv[lo:hi], len(uniq_bits)), hi - lo)
        elif codec == "BSS":
            for lo, hi in _page_slices(len(raw), raw.dtype.itemsize, config.page_bytes):
                add_page(_bss_split(raw[lo:hi]), hi - lo)
        elif codec == "ALP":
            # chunk-wide (e, f) from the sampled trial; every page embeds it
            # (self-contained pages) — recorded in stats for lineage parity
            # with the FSST table hash
            stats["alp_e"], stats["alp_f"] = int(alp_ef[0]), int(alp_ef[1])
            for lo, hi in _page_slices(len(raw), raw.dtype.itemsize, config.page_bytes):
                add_page(alp.encode(raw[lo:hi], alp_ef[0], alp_ef[1]), hi - lo)
        elif codec == "ALP_RD":
            stats["alp_rd_l"] = int(alp_rd_l)
            for lo, hi in _page_slices(len(raw), raw.dtype.itemsize, config.page_bytes):
                pv, L = raw[lo:hi], alp_rd_l
                while True:
                    try:
                        payload = alp.encode_rd(pv, L)
                        break
                    except ValueError:
                        # page's left patterns overflow the dictionary cap
                        # (sample underestimated): a SMALLER cut strictly
                        # coarsens the partition, so this converges
                        if L <= 1:
                            raise
                        L -= 1
                add_page(payload, hi - lo)
        else:
            codec = "PLAIN"
            for lo, hi in _page_slices(len(raw), raw.dtype.itemsize, config.page_bytes):
                add_page(plain.encode_fixed(raw[lo:hi]), hi - lo)
    elif kind == "fixed_bytes":
        width = int(dtype.split(":")[1])
        flat = np.ascontiguousarray(np.asarray(stream.data, dtype=np.uint8))
        n = len(flat) // max(width, 1)
        void = flat.view(f"V{width}").reshape(-1) if n else np.empty(0, f"V{max(width,1)}")
        uniq_v = np.unique(void) if n and n <= (1 << 22) else None
        distinct = len(uniq_v) if uniq_v is not None else None
        stats = {"distinct": distinct}
        dict_ok = distinct is not None and distinct <= sel.DICT_MAX_CARD
        if forced:
            if forced not in ("PLAIN_FB", "DICT"):
                raise ValueError(f"unknown fixed-bytes codec {forced!r} for "
                                 f"{stream.path!r}; valid: PLAIN_FB, DICT")
            codec = forced
        elif config.mode == sel.MODE_REFERENCE:
            codec = "DICT" if dict_ok else "PLAIN_FB"
        else:
            codec = "DICT" if dict_ok and distinct * width + n * 2 < n * width else "PLAIN_FB"
        if codec == "DICT" and dict_ok:
            inv = np.searchsorted(uniq_v, void)
            dpayload = _buf(uniq_v.view(np.uint8))
            dcomp = _compress(dpayload, stream_comp)
            dict_meta = {"size": len(dcomp), "usize": len(dpayload), "num_values": distinct,
                         "crc32_comp": zlib.crc32(dcomp) & 0xFFFFFFFF if config.crc else None}
            blobs.append(dcomp)
            for lo, hi in _page_slices(n, max(bitpack.bit_width(max(distinct - 1, 0)), 1) / 8, config.page_bytes):
                add_page(dictionary.encode_indices(inv[lo:hi], distinct), hi - lo)
        else:
            codec = "PLAIN_FB" if codec == "DICT" else codec
            for lo, hi in _page_slices(n, width, config.page_bytes):
                add_page(flat[lo * width : hi * width], hi - lo)
    elif kind == "bytes":
        offsets, data = stream.data
        offsets = np.asarray(offsets, dtype=np.int64)
        n = len(offsets) - 1
        st = sel.bytes_stats(offsets, np.asarray(data))
        stats = {"distinct": st.distinct}
        if n:
            # byte-compare min/max like the reference (stats.go byte arrays);
            # stored as utf-8 (lossy for non-utf8 binary -> skipped then)
            _arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(np.ascontiguousarray(offsets - offsets[0], dtype=np.int32)),
                 pa.py_buffer(np.ascontiguousarray(np.asarray(data, dtype=np.uint8)[int(offsets[0]):int(offsets[-1])]))],
            )
            try:
                import pyarrow.compute as _pc

                mm = _pc.min_max(_arr).as_py()
                stats["min"] = mm["min"].decode()
                stats["max"] = mm["max"].decode()
            except (UnicodeDecodeError, pa.ArrowInvalid):
                pass
        dict_clearly_wins = (
            st.distinct is not None
            and st.distinct <= sel.DICT_MAX_CARD
            and st.dict_size < st.plain_size // 2
        )
        if forced:
            # "PLAIN" is the natural spelling (it IS the name on every other
            # stream kind) — alias it instead of failing at page-encode time
            codec = {"PLAIN": "PLAIN_BA"}.get(forced, forced)
            if codec not in ("PLAIN_BA", "DICT", "DELTA_LENGTH_BA",
                             "DELTA_BA", "FSST_BA"):
                raise ValueError(
                    f"unknown bytes codec {forced!r} for {stream.path!r}; "
                    f"valid: PLAIN, DICT, DELTA_LENGTH_BA, DELTA_BA, FSST_BA")
        elif dict_clearly_wins:
            # skip the prefix/FSST trial passes when the dictionary is at
            # least 2x smaller than plain — they can't win and cost a scan
            codec = "DICT"
        else:
            pref_ratio = 0.0
            if n > 1:
                # prefix trial on a head sample — selection signal only
                ns = min(n, 1 << 16)
                po = offsets[: ns + 1]
                pl = ba.prefix_lengths(po, np.asarray(data))
                total = max(int(po[-1] - po[0]), 1)
                pref_ratio = float(pl.sum()) / total
            fsst_est = None
            if config.mode == sel.MODE_EXTENDED and n:
                # bounded trial: 16 KB sample, 2 refinement iterations — the
                # trial only needs a ratio estimate, not the final table
                d = np.asarray(data, dtype=np.uint8)[int(offsets[0]) : int(offsets[-1])]
                sample = d[: 1 << 14]
                if len(sample) >= 64:
                    table = fsst.train(sample, iters=2)
                    if len(table):
                        enc = fsst.encode(sample, table)
                        ratio = len(enc) / max(len(sample), 1)
                        fsst_est = int(ratio * (int(offsets[-1] - offsets[0]))) + n // 4 + 64
            codec = sel.choose_bytes_codec(st, config.mode, prefix_ratio=pref_ratio, fsst_est=fsst_est).codec
        if codec == "DICT" and (st.distinct is None or st.distinct > sel.DICT_MAX_CARD):
            codec = "PLAIN_BA"
        avg = (int(offsets[-1] - offsets[0]) / n + 4) if n else 1
        if codec == "DICT":
            arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(np.ascontiguousarray(offsets - offsets[0], dtype=np.int32)),
                 pa.py_buffer(np.ascontiguousarray(np.asarray(data, dtype=np.uint8)[int(offsets[0]):int(offsets[-1])]))],
            )
            denc = arr.dictionary_encode()
            duniq = denc.dictionary
            inv = np.asarray(denc.indices, dtype=np.int64)
            doff = np.frombuffer(duniq.buffers()[1], dtype=np.int32, count=len(duniq) + 1, offset=duniq.offset * 4).astype(np.int64)
            ddata = np.frombuffer(duniq.buffers()[2], dtype=np.uint8) if duniq.buffers()[2] is not None else np.empty(0, np.uint8)
            dpayload = _buf(plain.encode_byte_array(doff, ddata))
            dcomp = _compress(dpayload, stream_comp)
            dict_meta = {"size": len(dcomp), "usize": len(dpayload), "num_values": len(duniq),
                         "crc32_comp": zlib.crc32(dcomp) & 0xFFFFFFFF if config.crc else None}
            blobs.append(dcomp)
            for lo, hi in _page_slices(n, max(bitpack.bit_width(max(len(duniq) - 1, 0)), 1) / 8, config.page_bytes):
                add_page(dictionary.encode_indices(inv[lo:hi], len(duniq)), hi - lo)
        else:
            d = np.asarray(data, dtype=np.uint8)
            fsst_table = None
            if codec == "FSST_BA" and not n:
                # forced FSST on a zero-row stream: nothing to train on —
                # an empty table encodes the (empty) page as all literals
                fsst_table = np.empty(0, dtype=np.uint8)
            if codec == "FSST_BA" and n:
                # ONE symbol table per stream, trained on a 64 KB sample and
                # shared by every page (training is iterative and would
                # dominate if repeated per page; the VLDB'20 design likewise
                # trains per block, not per string). Table hash goes to
                # lineage (north-star checkpoint record: resumed runs must
                # reproduce identical tables).
                sample = d[int(offsets[0]) : int(offsets[0]) + (1 << 16)]
                fsst_table = fsst.train(sample)
                stats["fsst_table_crc32"] = zlib.crc32(fsst_table.tobytes()) & 0xFFFFFFFF
            for lo, hi in _page_slices(n, avg, config.page_bytes):
                po = offsets[lo : hi + 1]
                if codec == "PLAIN_BA":
                    add_page(plain.encode_byte_array(po, d), hi - lo)
                elif codec == "DELTA_LENGTH_BA":
                    add_page(ba.encode_delta_length(po, d), hi - lo)
                elif codec == "DELTA_BA":
                    add_page(ba.encode_delta_byte_array(po, d), hi - lo)
                elif codec == "FSST_BA":
                    lens_enc = delta.encode(np.diff(po).astype(np.int32), 32)
                    payload_bytes = d[int(po[0]) : int(po[-1])]
                    fenc = fsst.encode(payload_bytes, fsst_table)
                    add_page(len(lens_enc).to_bytes(4, "little") + lens_enc + fenc, hi - lo)
                else:
                    raise ValueError(f"unknown bytes codec {codec}")
    else:
        raise ValueError(f"unknown stream kind {kind} dtype {dtype}")

    if kind == "bytes":
        offs = np.asarray(stream.data[0], dtype=np.int64)
        decoded_bytes = int(offs[-1] - offs[0]) + 8 * max(len(offs) - 1, 0)
    elif kind == "fixed_bytes":
        decoded_bytes = len(np.asarray(stream.data))
    else:
        arr = np.asarray(stream.data)
        decoded_bytes = arr.size * max(arr.dtype.itemsize, 1)
    meta = {
        "path": stream.path,
        "kind": kind,
        "dtype": dtype,
        "codec": codec,
        "compression": stream_comp,
        "num_values": stream.num_values,
        "decoded_bytes": decoded_bytes,  # true decode heap need (alloc.go role)
        "pages": pages,
        "dict": dict_meta,
        "stats": stats,
    }
    return blobs, meta


def decode_stream(meta: dict, read_at) -> Stream:
    """Rebuild a Stream. ``read_at(offset, size) -> bytes`` supplies file data."""
    codec = meta["codec"]
    comp = meta["compression"]
    kind, dtype = meta["kind"], meta["dtype"]
    crc_check = True

    def _comp_crc(m: dict):
        # "crc32_comp" = IEEE CRC-32 over compressed bytes; "crc32c" is the
        # round-2 name for the SAME value (misnamed — it was never Castagnoli),
        # kept as a read fallback for files written by that version
        v = m.get("crc32_comp")
        return v if v is not None else m.get("crc32c")

    def page_payload(p: dict) -> bytes:
        raw = read_at(p["offset"], p["size"])
        pcrc = _comp_crc(p)
        if crc_check and pcrc is not None:
            if (zlib.crc32(raw) & 0xFFFFFFFF) != pcrc:
                raise ValueError(f"CRC mismatch on {meta['path']} page @{p['offset']}")
        payload = _decompress(raw, comp, p["usize"])
        if crc_check and p.get("crc32") is not None:  # legacy: crc of payload
            actual = zlib.crc32(payload) & 0xFFFFFFFF
            if actual != p["crc32"]:
                raise ValueError(f"CRC mismatch on {meta['path']} page @{p['offset']}")
        return payload

    dict_values = None
    if meta.get("dict"):
        dmeta = meta["dict"]
        draw = read_at(dmeta["offset"], dmeta["size"])
        dcrc = _comp_crc(dmeta)
        if crc_check and dcrc is not None and (zlib.crc32(bytes(draw)) & 0xFFFFFFFF) != dcrc:
            raise ValueError(f"CRC mismatch on {meta['path']} dict page")
        dpayload = _decompress(draw, comp, dmeta["usize"])
        if crc_check and dmeta.get("crc32") is not None and (zlib.crc32(dpayload) & 0xFFFFFFFF) != dmeta["crc32"]:
            raise ValueError(f"CRC mismatch on {meta['path']} dict page")
        if kind == "bytes":
            dict_values = plain.decode_byte_array(dpayload, dmeta["num_values"])
        elif kind == "fixed_bytes":
            dict_values = np.frombuffer(dpayload, dtype=np.uint8)
        elif dtype in _INT_CLASS:
            nbits = _INT_CLASS[dtype]
            dict_values = plain.decode_fixed(dpayload, "int32" if nbits == 32 else "int64", dmeta["num_values"])
        else:  # float
            dict_values = plain.decode_fixed(dpayload, dtype, dmeta["num_values"])

    if kind == "validity":
        parts = [hybrid.decode(page_payload(p), 1, p["num_values"]).astype(np.bool_) for p in meta["pages"]]
        return Stream(meta["path"], kind, dtype, np.concatenate(parts) if parts else np.empty(0, np.bool_), meta["num_values"])

    if kind == "values" and dtype == "bool":
        parts = []
        for p in meta["pages"]:
            payload = page_payload(p)
            if codec == "RLE_BOOL":
                parts.append(hybrid.decode(payload, 1, p["num_values"]).astype(np.bool_))
            else:
                parts.append(plain.decode_bool(payload, p["num_values"]))
        return Stream(meta["path"], kind, dtype, np.concatenate(parts) if parts else np.empty(0, np.bool_), meta["num_values"])

    if kind in ("values", "lengths") and dtype in _INT_CLASS:
        nbits = _INT_CLASS[dtype]
        cls_dtype = "int32" if nbits == 32 else "int64"
        if codec == "BSS":
            v = _decode_bss_pages(meta["pages"], page_payload, cls_dtype)
            return Stream(meta["path"], kind, dtype, _from_class(v, dtype), meta["num_values"])
        parts = []
        for p in meta["pages"]:
            payload = page_payload(p)
            if codec == "DICT":
                idx = dictionary.decode_indices(payload, p["num_values"])
                parts.append(dict_values[idx])
            elif codec == "PLAIN":
                parts.append(plain.decode_fixed(payload, cls_dtype, p["num_values"]))
            elif codec == "DELTA_BP":
                parts.append(delta.decode(payload, nbits))
            elif codec in ("FOR", "FOR_DELTA"):
                parts.append(forr.decode(payload))
            else:
                raise ValueError(f"unknown int codec {codec}")
        v = np.concatenate(parts) if parts else np.empty(0, cls_dtype)
        return Stream(meta["path"], kind, dtype, _from_class(v, dtype), meta["num_values"])

    if kind == "values":  # float
        if codec == "BSS":
            v = _decode_bss_pages(meta["pages"], page_payload, dtype)
            return Stream(meta["path"], kind, dtype, v, meta["num_values"])
        parts = []
        for p in meta["pages"]:
            payload = page_payload(p)
            if codec == "DICT":
                idx = dictionary.decode_indices(payload, p["num_values"])
                parts.append(dict_values[idx])
            elif codec in ("ALP", "ALP_RD"):
                part = (alp.decode if codec == "ALP" else alp.decode_rd)(payload)
                if len(part) != p["num_values"]:
                    raise ValueError(
                        f"{codec} page claims {len(part)} values, footer "
                        f"says {p['num_values']} on {meta['path']}")
                parts.append(part)
            else:
                parts.append(plain.decode_fixed(payload, dtype, p["num_values"]))
        return Stream(meta["path"], kind, dtype, np.concatenate(parts) if parts else np.empty(0, dtype), meta["num_values"])

    if kind == "fixed_bytes":
        width = int(dtype.split(":")[1])
        parts = []
        for p in meta["pages"]:
            payload = page_payload(p)
            if codec == "DICT":
                idx = dictionary.decode_indices(payload, p["num_values"]).astype(np.int64)
                dmat = np.asarray(dict_values, dtype=np.uint8).reshape(-1, width)
                parts.append(dmat[idx].reshape(-1))
            else:
                parts.append(np.frombuffer(payload, dtype=np.uint8, count=p["num_values"] * width))
        data = np.concatenate(parts) if parts else np.empty(0, np.uint8)
        return Stream(meta["path"], kind, dtype, data, meta["num_values"])

    if kind == "bytes":
        all_offsets = [np.zeros(1, dtype=np.int64)]
        datas = []
        base = 0
        if codec == "DICT":
            doff, ddata = dict_values
            lengths_d = np.diff(doff)
        for p in meta["pages"]:
            payload = page_payload(p)
            nv = p["num_values"]
            if codec == "DICT":
                idx = dictionary.decode_indices(payload, nv).astype(np.int64)
                lens = lengths_d[idx]
                po = np.zeros(nv + 1, dtype=np.int64)
                np.cumsum(lens, out=po[1:])
                total = int(po[-1])
                if total:
                    within = np.arange(total, dtype=np.int64) - np.repeat(po[:-1], lens)
                    pd_bytes = np.asarray(ddata)[np.repeat(doff[idx], lens) + within]
                else:
                    pd_bytes = np.empty(0, np.uint8)
            elif codec == "PLAIN_BA":
                po, pd_bytes = plain.decode_byte_array(payload, nv)
            elif codec == "DELTA_LENGTH_BA":
                po, pd_bytes = ba.decode_delta_length(payload, nv)
            elif codec == "DELTA_BA":
                po, pd_bytes = ba.decode_delta_byte_array(payload, nv)
            elif codec == "FSST_BA":
                ls = int.from_bytes(payload[:4], "little")
                lens = delta.decode(payload[4 : 4 + ls], 32).astype(np.int64)
                pd_bytes = fsst.decode(payload[4 + ls :])
                po = np.zeros(nv + 1, dtype=np.int64)
                np.cumsum(lens, out=po[1:])
            else:
                raise ValueError(f"unknown bytes codec {codec}")
            po = np.asarray(po, dtype=np.int64)
            all_offsets.append(po[1:] - po[0] + base)
            base += int(po[-1] - po[0])
            datas.append(np.asarray(pd_bytes, dtype=np.uint8))
        offsets = np.concatenate(all_offsets)
        data = np.concatenate(datas) if datas else np.empty(0, np.uint8)
        return Stream(meta["path"], kind, dtype, (offsets, data), meta["num_values"])

    raise ValueError(f"unknown stream kind {kind}")
