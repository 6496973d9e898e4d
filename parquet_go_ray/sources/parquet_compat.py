"""Read real Apache Parquet files with OUR codec kernels.

The conformance role of the reference's external corpora tests
(/root/reference/parquet_test.go reads apache/parquet-testing goldens;
parquet_compatibility_test.go reads Impala files): no network in this
sandbox, so the goldens are pyarrow-written files with pinned encodings, and
this module decodes their actual page bytes — Thrift compact footer/page
headers (thrift_compact.py) + our PLAIN / RLE-hybrid / RLE_DICTIONARY /
DELTA_BINARY_PACKED / DELTA_LENGTH / DELTA_BYTE_ARRAY kernels — proving the
kernels are bitstream-compatible with the real format, not just
self-consistent.

Scope (enough for the conformance matrix, documented limits):
  * flat columns (no nesting), REQUIRED or OPTIONAL (def levels via the
    hybrid decoder, 4-byte length prefix in V1 pages / header lengths in V2);
  * physical types BOOLEAN/INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY;
  * encodings PLAIN, PLAIN_DICTIONARY/RLE_DICTIONARY, DELTA_BINARY_PACKED,
    DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY, BYTE_STREAM_SPLIT;
  * codecs UNCOMPRESSED/SNAPPY/GZIP/ZSTD/LZ4 (raw frame).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import bytearray as ba, delta, hybrid, plain
from .thrift_compact import CompactReader

MAGIC = b"PAR1"

PHYS = {0: "boolean", 1: "int32", 2: "int64", 3: "int96", 4: "float32", 5: "float64",
        6: "byte_array", 7: "flba"}
CODEC = {0: None, 1: "snappy", 2: "gzip", 6: "zstd", 5: "lz4"}

ENC_PLAIN = 0
ENC_PLAIN_DICT = 2
ENC_RLE = 3
ENC_DELTA_BP = 5
ENC_DELTA_LEN = 6
ENC_DELTA_BA = 7
ENC_RLE_DICT = 8
ENC_BSS = 9


def _decompress(payload: bytes, codec: int, usize: int) -> bytes:
    name = CODEC.get(codec)
    if name is None:
        if codec in CODEC:
            return payload
        raise NotImplementedError(f"parquet codec id {codec}")
    return pa.decompress(payload, decompressed_size=usize, codec=name).to_pybytes()


def read_file_metadata(blob: bytes) -> dict:
    if blob[:4] != MAGIC or blob[-4:] != MAGIC:
        raise ValueError("not a parquet file")
    flen = int.from_bytes(blob[-8:-4], "little")
    return CompactReader(blob, len(blob) - 8 - flen).read_struct()


def _decode_values(payload: bytes, encoding: int, phys: str, n: int, dict_values):
    """Decode n non-null values from a data-page payload."""
    if encoding in (ENC_PLAIN_DICT, ENC_RLE_DICT):
        width = payload[0]
        idx = hybrid.decode(payload[1:], width, n).astype(np.int64)
        off, data = dict_values if isinstance(dict_values, tuple) else (None, None)
        if off is not None:  # byte_array dictionary
            lens = np.diff(off)[idx]
            starts = off[idx]
            total = int(lens.sum())
            out = np.empty(total, dtype=np.uint8)
            if total:
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.concatenate([[0], np.cumsum(lens[:-1])]), lens)
                out[:] = data[np.repeat(starts, lens) + within]
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            return offsets, out
        return dict_values[idx]
    if encoding == ENC_PLAIN:
        if phys == "boolean":
            return plain.decode_bool(payload, n)
        if phys == "byte_array":
            return plain.decode_byte_array(payload, n)
        return plain.decode_fixed(payload, phys, n)
    if encoding == ENC_DELTA_BP:
        return delta.decode(payload, 32 if phys == "int32" else 64)
    if encoding == ENC_DELTA_LEN:
        # spec framing: self-delimiting delta stream of lengths, then bytes
        lengths, pos = delta.decode_stream(payload, 32)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths.astype(np.int64), out=offsets[1:])
        data = np.frombuffer(payload, dtype=np.uint8, offset=pos)
        return offsets, data[: int(offsets[-1])].copy()
    if encoding == ENC_DELTA_BA:
        # spec framing: delta prefix-lengths, delta suffix-lengths, suffix bytes
        pref, pos = delta.decode_stream(payload, 32)
        suf_lens, pos = delta.decode_stream(payload, 32, pos)
        pref = pref.astype(np.int64)
        suf_lens = suf_lens.astype(np.int64)
        suf_data = np.frombuffer(payload, dtype=np.uint8, offset=pos)
        lengths = pref + suf_lens
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        out = np.empty(int(offsets[-1]), dtype=np.uint8)
        suf_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(suf_lens, out=suf_off[1:])
        prev = 0
        for i in range(n):  # sequential by construction (front coding)
            s = int(offsets[i])
            p = int(pref[i])
            if p:
                out[s : s + p] = out[prev : prev + p]
            sl = int(suf_lens[i])
            if sl:
                out[s + p : s + p + sl] = suf_data[suf_off[i] : suf_off[i] + sl]
            prev = s
        return offsets, out
    if encoding == ENC_BSS:
        itemsize = np.dtype(phys).itemsize
        planes = np.frombuffer(payload, dtype=np.uint8, count=n * itemsize).reshape(itemsize, n)
        return np.ascontiguousarray(planes.T).reshape(-1).view(phys)
    raise NotImplementedError(f"parquet encoding {encoding} for {phys}")


def _read_chunk(blob: bytes, col_meta: dict, max_def: int):
    """Decode one column chunk -> (values, validity|None)."""
    phys = PHYS[col_meta[1]]
    codec = col_meta[4]
    num_values = col_meta[5]
    total_compressed = col_meta[7]
    data_off = col_meta[9]
    dict_off = col_meta.get(11)
    start = dict_off if dict_off is not None and dict_off < data_off else data_off

    pos = start
    consumed = 0
    dict_values = None
    out_parts = []
    defs_parts = []
    n_seen = 0
    while consumed < total_compressed and n_seen < num_values:
        r = CompactReader(blob, pos)
        header = r.read_struct()
        payload_start = r.pos
        ptype = header[1]
        usize, csize = header[2], header[3]
        pos = payload_start + csize
        consumed = pos - start
        if ptype != 3:  # v2 pages leave their level section uncompressed
            payload = _decompress(blob[payload_start : payload_start + csize], codec, usize)
        if ptype == 2:  # dictionary page
            dph = header[7]
            dn = dph[1]
            if phys == "byte_array":
                dict_values = plain.decode_byte_array(payload, dn)
            else:
                dict_values = plain.decode_fixed(payload, phys, dn)
            continue
        if ptype == 0:  # data page v1
            dph = header[5]
            n = dph[1]
            enc = dph[2]
            body = payload
            if max_def > 0:
                dlen = int.from_bytes(body[:4], "little")
                defs = hybrid.decode(body[4 : 4 + dlen], 1, n).astype(np.bool_)
                body = body[4 + dlen :]
            else:
                defs = None
            nn = int(defs.sum()) if defs is not None else n
            out_parts.append(_decode_values(body, enc, phys, nn, dict_values))
            defs_parts.append(defs if defs is not None else np.ones(n, dtype=np.bool_))
            n_seen += n
        elif ptype == 3:  # data page v2
            dph = header[8]
            n, num_nulls = dph[1], dph[2]
            enc = dph[4]
            dl_len = dph[5]
            rl_len = dph[6]
            # v2: levels are NOT compressed and precede the (compressed) values
            raw = blob[payload_start : payload_start + csize]
            levels = raw[: rl_len + dl_len]
            vals_bytes = raw[rl_len + dl_len :]
            if dph.get(7, True) and CODEC.get(codec):
                vals_bytes = _decompress(vals_bytes, codec, usize - rl_len - dl_len)
            if max_def > 0 and dl_len:
                defs = hybrid.decode(levels[rl_len:], 1, n).astype(np.bool_)
            else:
                defs = np.ones(n, dtype=np.bool_)
            nn = n - num_nulls
            out_parts.append(_decode_values(vals_bytes, enc, phys, nn, dict_values))
            defs_parts.append(defs)
            n_seen += n
        else:
            raise NotImplementedError(f"page type {ptype}")

    validity = np.concatenate(defs_parts) if defs_parts else np.empty(0, np.bool_)
    if phys == "byte_array":
        offs = [np.zeros(1, dtype=np.int64)]
        datas = []
        base = 0
        for po, pd_bytes in out_parts:
            po = np.asarray(po, dtype=np.int64)
            offs.append(po[1:] - po[0] + base)
            base += int(po[-1] - po[0])
            datas.append(np.asarray(pd_bytes, dtype=np.uint8))
        values = (np.concatenate(offs), np.concatenate(datas) if datas else np.empty(0, np.uint8))
    else:
        values = np.concatenate(out_parts) if out_parts else np.empty(0, phys if phys != "boolean" else np.bool_)
    return values, (None if max_def == 0 else validity)


def read_parquet_with_our_kernels(path: str, columns: list[str] | None = None) -> pa.Table:
    """Decode a flat parquet file entirely with our kernels."""
    with open(path, "rb") as f:
        blob = f.read()
    meta = read_file_metadata(blob)
    schema_elems = meta[2]
    root = schema_elems[0]
    fields = schema_elems[1:]  # flat: every element is a leaf
    names = [e[4].decode() for e in fields]
    reps = [e.get(3, 0) for e in fields]
    if any(e.get(5) for e in fields):
        raise NotImplementedError("nested parquet schemas not supported by the compat reader")

    arrays = {}
    for rg in meta[4]:
        for chunk in rg[1]:
            cm = chunk[3]
            name = cm[3][0].decode()
            if columns is not None and name not in columns:
                continue
            i = names.index(name)
            max_def = 1 if reps[i] == 1 else 0
            values, validity = _read_chunk(blob, cm, max_def)
            arrays.setdefault(name, []).append((values, validity, PHYS[cm[1]]))

    # converted_type (SchemaElement field 6) -> arrow logical type
    CONVERTED = {0: pa.string(), 6: pa.date32(), 9: pa.timestamp("ms"), 10: pa.timestamp("us")}

    out = {}
    for name, parts in arrays.items():
        i = names.index(name)
        logical = CONVERTED.get(fields[i].get(6))
        cols = []
        for values, validity, phys in parts:
            if phys == "byte_array":
                offsets, data = values
                flat = pa.Array.from_buffers(
                    pa.binary(), len(offsets) - 1,
                    [None, pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int32)),
                     pa.py_buffer(np.ascontiguousarray(data))],
                )
            else:
                flat = pa.array(np.asarray(values))
            if validity is not None:
                pos = np.cumsum(validity, dtype=np.int64) - 1
                idx = pa.array(pos, mask=~validity)
                flat = flat.take(idx)
            if logical is not None:
                flat = flat.cast(logical) if pa.types.is_string(logical) else flat.view(logical)
            cols.append(flat)
        out[name] = pa.concat_arrays(cols) if len(cols) > 1 else cols[0]
    order = [n for n in (columns or names) if n in out]
    return pa.table({n: out[n] for n in order})
