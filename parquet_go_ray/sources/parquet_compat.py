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


# ------------------------------------------------------------------- writer
from .thrift_compact import (  # noqa: E402
    CompactWriter,
    T_BINARY,
    T_I32,
    T_I64,
    T_LIST,
    T_STRUCT,
    T_TRUE,
)

_PHYS_ID = {"boolean": 0, "int32": 1, "int64": 2, "float32": 4, "float64": 5, "byte_array": 6}
_CODEC_ID = {None: 0, "none": 0, "snappy": 1, "gzip": 2, "zstd": 6}


def _phys_of(t: pa.DataType) -> tuple[str, int | None]:
    """(physical, converted_type) for a supported flat arrow type."""
    if pa.types.is_boolean(t):
        return "boolean", None
    if pa.types.is_int32(t):
        return "int32", None
    if pa.types.is_int64(t):
        return "int64", None
    if pa.types.is_float32(t):
        return "float32", None
    if pa.types.is_float64(t):
        return "float64", None
    if pa.types.is_string(t):
        return "byte_array", 0  # UTF8
    if pa.types.is_binary(t):
        return "byte_array", None
    if pa.types.is_timestamp(t) and t.unit in ("ms", "us"):
        # ("ts", unit): emitted as a LogicalType TIMESTAMP with
        # isAdjustedToUTC=false (naive), matching Arrow naive timestamps —
        # the legacy ConvertedType would force UTC semantics on read
        return "int64", ("ts", t.unit)
    if pa.types.is_date32(t):
        return "int32", 6
    raise NotImplementedError(f"parquet writer: unsupported type {t}")


def _compress_page(payload: bytes, codec: str | None) -> bytes:
    if not codec or codec == "none":
        return payload
    return pa.compress(payload, codec=codec).to_pybytes()


def write_parquet_with_our_kernels(
    table: pa.Table, path: str, *, compression: str | None = "snappy",
    column_encoding: dict[str, str] | None = None,
) -> None:
    """Write a REAL Parquet file (flat schema, one row group, v1 pages) whose
    pages are produced by OUR encoders — readable by pyarrow/DuckDB, proving
    the encoders are spec-conformant on the wire. Encodings per column:
    "PLAIN" (default), "DELTA_BINARY_PACKED", "DELTA_LENGTH_BYTE_ARRAY",
    "DELTA_BYTE_ARRAY", "DICT" (PLAIN dict page + RLE_DICTIONARY data)."""
    from ..functions import hybrid as hyb
    from ..functions.shred import Stream, shred

    table = table.combine_chunks()
    enc_map = column_encoding or {}
    body = bytearray(MAGIC)
    col_chunks = []

    list_schema_elems: dict[str, list[bytes]] = {}
    for name in table.column_names:
        col = table.column(name)
        arr = col.chunk(0) if col.num_chunks else pa.nulls(0, col.type)
        if pa.types.is_list(arr.type) and pa.types.is_int32(arr.type.value_type) and arr.null_count == 0:
            chunk_start = len(body)
            meta_fields, total_cmp, elems = _write_list_int32_chunk(arr, name, body, compression)
            col_chunks.append((name, chunk_start, meta_fields, total_cmp))
            list_schema_elems[name] = elems
            continue
        phys, conv = _phys_of(arr.type)
        n = len(arr)
        has_nulls = arr.null_count > 0

        # definition levels (max_def=1, optional column) — v1: 4-byte len prefix
        if has_nulls:
            validity = np.zeros(n, dtype=np.uint64)
            streams: list[Stream] = []
            shred(arr, name, streams)
            by_kind = {s.kind: s for s in streams}
            validity[:] = np.asarray(by_kind["validity"].data, dtype=np.uint64)
            levels = hyb.encode(validity, 1)
            level_bytes = len(levels).to_bytes(4, "little") + levels
            vals_stream = by_kind.get("values") or by_kind.get("bytes")
        else:
            streams = []
            shred(arr, name, streams)
            level_bytes = b""
            vals_stream = streams[0]

        encoding = enc_map.get(name, "PLAIN")
        dict_page = None
        if encoding == "DICT":
            if phys == "byte_array":
                offsets, data = vals_stream.data
                arr2 = pa.Array.from_buffers(
                    pa.binary(), len(offsets) - 1,
                    [None, pa.py_buffer(np.ascontiguousarray(offsets - offsets[0], dtype=np.int32)),
                     pa.py_buffer(np.ascontiguousarray(np.asarray(data, dtype=np.uint8)[int(offsets[0]):int(offsets[-1])]))])
                denc = arr2.dictionary_encode()
                duniq = denc.dictionary
                inv = np.asarray(denc.indices, dtype=np.int64)
                doff = np.frombuffer(duniq.buffers()[1], dtype=np.int32, count=len(duniq) + 1,
                                     offset=duniq.offset * 4).astype(np.int64)
                ddata = np.frombuffer(duniq.buffers()[2], dtype=np.uint8) if duniq.buffers()[2] is not None else np.empty(0, np.uint8)
                dict_payload = plain.encode_byte_array(doff, ddata)
                ndict = len(duniq)
            else:
                uniq, inv = np.unique(np.asarray(vals_stream.data), return_inverse=True)
                dict_payload = plain.encode_fixed(uniq)
                ndict = len(uniq)
            width = max(int(ndict - 1).bit_length(), 1)
            values_payload = bytes([width]) + hyb.encode(inv, width)
            data_enc_id = ENC_RLE_DICT
            dict_page = bytes(dict_payload) if not isinstance(dict_payload, bytes) else dict_payload
        elif encoding == "DELTA_BINARY_PACKED":
            values_payload = delta.encode(np.asarray(vals_stream.data), 32 if phys == "int32" else 64)
            data_enc_id = ENC_DELTA_BP
        elif encoding == "DELTA_LENGTH_BYTE_ARRAY":
            offsets, data = vals_stream.data
            lens = np.diff(np.asarray(offsets, dtype=np.int64)).astype(np.int32)
            payload_bytes = np.asarray(data, dtype=np.uint8)[int(offsets[0]):int(offsets[-1])].tobytes()
            values_payload = delta.encode(lens, 32) + payload_bytes  # spec: no length prefix
            data_enc_id = ENC_DELTA_LEN
        elif encoding == "DELTA_BYTE_ARRAY":
            offsets, data = vals_stream.data
            offsets = np.asarray(offsets, dtype=np.int64)
            d8 = np.asarray(data, dtype=np.uint8)
            pref = ba.prefix_lengths(offsets, d8).astype(np.int64)
            lens = np.diff(offsets)
            suf_lens = (lens - pref).astype(np.int32)
            total = int(suf_lens.sum())
            if total:
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.concatenate([[0], np.cumsum(suf_lens[:-1].astype(np.int64))]), suf_lens)
                suf = d8[np.repeat(offsets[:-1] + pref, suf_lens) + within].tobytes()
            else:
                suf = b""
            values_payload = delta.encode(pref.astype(np.int32), 32) + delta.encode(suf_lens, 32) + suf
            data_enc_id = ENC_DELTA_BA
        else:  # PLAIN
            if phys == "boolean":
                values_payload = plain.encode_bool(np.asarray(vals_stream.data))
            elif phys == "byte_array":
                offsets, data = vals_stream.data
                values_payload = plain.encode_byte_array(np.asarray(offsets), np.asarray(data))
            else:
                values_payload = bytes(memoryview(plain.encode_fixed(np.asarray(vals_stream.data))))
            data_enc_id = ENC_PLAIN

    # page assembly
        values_payload = bytes(values_payload) if not isinstance(values_payload, bytes) else values_payload
        page_payload = level_bytes + values_payload
        chunk_start = len(body)
        dict_off = None
        encodings = [data_enc_id, ENC_RLE] if has_nulls else [data_enc_id]
        total_unc = 0
        total_cmp = 0
        if dict_page is not None:
            comp = _compress_page(dict_page, compression)
            header = CompactWriter.struct_([
                (1, T_I32, 2), (2, T_I32, len(dict_page)), (3, T_I32, len(comp)),
                (7, T_STRUCT, [(1, T_I32, ndict), (2, T_I32, ENC_PLAIN)]),
            ])
            dict_off = len(body)
            body += header + comp
            total_unc += len(header) + len(dict_page)
            total_cmp += len(header) + len(comp)
            encodings.append(ENC_PLAIN)
        comp = _compress_page(page_payload, compression)
        header = CompactWriter.struct_([
            (1, T_I32, 0), (2, T_I32, len(page_payload)), (3, T_I32, len(comp)),
            (5, T_STRUCT, [(1, T_I32, n), (2, T_I32, data_enc_id),
                           (3, T_I32, ENC_RLE), (4, T_I32, ENC_RLE)]),
        ])
        data_off = len(body)
        body += header + comp
        total_unc += len(header) + len(page_payload)
        total_cmp += len(header) + len(comp)

        meta_fields = [
            (1, T_I32, _PHYS_ID[phys]),
            (2, T_LIST, (T_I32, encodings)),
            (3, T_LIST, (T_BINARY, [name])),
            (4, T_I32, _CODEC_ID[compression]),
            (5, T_I64, n),
            (6, T_I64, total_unc),
            (7, T_I64, total_cmp),
            (9, T_I64, data_off),
        ]
        if dict_off is not None:
            meta_fields.append((11, T_I64, dict_off))
        col_chunks.append((name, chunk_start, meta_fields, total_cmp))

    # footer
    schema_elems = [CompactWriter.struct_([(4, T_BINARY, "schema"),
                                           (5, T_I32, table.num_columns)])]
    for name in table.column_names:
        t = table.column(name).type
        if name in list_schema_elems:
            schema_elems.extend(list_schema_elems[name])
            continue
        phys, conv = _phys_of(t)
        nullable = table.column(name).null_count > 0
        fields = [(1, T_I32, _PHYS_ID[phys]), (3, T_I32, 1 if nullable else 0), (4, T_BINARY, name)]
        if isinstance(conv, tuple) and conv[0] == "ts":
            unit_fid = {"ms": 1, "us": 2}[conv[1]]
            fields.append((10, T_STRUCT, [  # LogicalType.TIMESTAMP
                (8, T_STRUCT, [
                    (1, T_TRUE, False),  # isAdjustedToUTC = false (naive)
                    (2, T_STRUCT, [(unit_fid, T_STRUCT, [])]),  # TimeUnit union
                ]),
            ]))
        elif conv is not None:
            fields.append((6, T_I32, conv))
        schema_elems.append(CompactWriter.struct_(fields))

    row_group = CompactWriter.struct_([
        (1, T_LIST, (T_STRUCT, [
            [(2, T_I64, start), (3, T_STRUCT, meta)] for (_, start, meta, _) in col_chunks
        ])),
        (2, T_I64, sum(c[3] for c in col_chunks)),
        (3, T_I64, table.num_rows),
    ])
    # footer built field-by-field because schema elements / row groups are
    # pre-encoded struct blobs
    fb = bytearray()
    fb += bytes([(1 << 4) | T_I32]) + CompactWriter.value(T_I32, 1)  # version
    # field 2: schema list of structs
    fb += bytes([(1 << 4) | T_LIST])
    nel = len(schema_elems)
    if nel < 15:
        fb.append((nel << 4) | T_STRUCT)
    else:
        from .thrift_compact import _uvarint as _uv

        fb.append((15 << 4) | T_STRUCT)
        fb += _uv(nel)
    for el in schema_elems:
        fb += el
    fb += bytes([(1 << 4) | T_I64]) + CompactWriter.value(T_I64, table.num_rows)  # field 3
    fb += bytes([(1 << 4) | T_LIST])  # field 4: row_groups
    fb.append((1 << 4) | T_STRUCT)
    fb += row_group
    fb += bytes([(2 << 4) | T_BINARY]) + CompactWriter.value(T_BINARY, "parquet_go_ray")  # field 6
    fb.append(0)

    body += fb
    body += len(fb).to_bytes(4, "little")
    body += MAGIC
    with open(path, "wb") as f:
        f.write(body)


def _write_list_int32_chunk(arr: pa.Array, name: str, body: bytearray, compression):
    """Column chunk for a non-null list<int32> column (the token-table shape):
    3-level LIST convention, max_rep=1 / max_def=1, levels hybrid-encoded.
    Empty lists emit a single (rep=0, def=0) entry — the same levels-only path
    the reference takes for empty repeated fields
    (/root/reference/data_store.go:116-119)."""
    from ..functions import hybrid as hyb

    offsets = np.asarray(arr.offsets, dtype=np.int64)
    values = np.asarray(arr.values.view(pa.int32())) if len(arr.values) else np.empty(0, np.int32)
    values = values[offsets[0] : offsets[-1]]
    lens = np.diff(offsets)
    n_rows = len(lens)
    # one level entry per value, plus one per empty list
    n_entries = int(np.maximum(lens, 1).sum())
    rep = np.ones(n_entries, dtype=np.uint64)
    defs = np.ones(n_entries, dtype=np.uint64)
    entry_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.maximum(lens, 1), out=entry_starts[1:])
    rep[entry_starts[:-1]] = 0  # first entry of each row
    defs[entry_starts[:-1][lens == 0]] = 0  # empty rows: levels-only marker

    rep_b = hyb.encode(rep, 1)
    def_b = hyb.encode(defs, 1)
    payload = (
        len(rep_b).to_bytes(4, "little") + rep_b
        + len(def_b).to_bytes(4, "little") + def_b
        + bytes(memoryview(plain.encode_fixed(values)))
    )
    comp = _compress_page(payload, compression)
    header = CompactWriter.struct_([
        (1, T_I32, 0), (2, T_I32, len(payload)), (3, T_I32, len(comp)),
        (5, T_STRUCT, [(1, T_I32, n_entries), (2, T_I32, ENC_PLAIN),
                       (3, T_I32, ENC_RLE), (4, T_I32, ENC_RLE)]),
    ])
    data_off = len(body)
    body += header + comp
    meta_fields = [
        (1, T_I32, _PHYS_ID["int32"]),
        (2, T_LIST, (T_I32, [ENC_PLAIN, ENC_RLE])),
        (3, T_LIST, (T_BINARY, [name, "list", "element"])),
        (4, T_I32, _CODEC_ID[compression]),
        (5, T_I64, n_entries),
        (6, T_I64, len(header) + len(payload)),
        (7, T_I64, len(header) + len(comp)),
        (9, T_I64, data_off),
    ]
    total_cmp = len(header) + len(comp)
    schema_elems = [
        CompactWriter.struct_([(3, T_I32, 0), (4, T_BINARY, name), (5, T_I32, 1), (6, T_I32, 3)]),  # LIST
        CompactWriter.struct_([(3, T_I32, 2), (4, T_BINARY, "list"), (5, T_I32, 1)]),  # repeated
        CompactWriter.struct_([(1, T_I32, _PHYS_ID["int32"]), (3, T_I32, 0), (4, T_BINARY, "element")]),
    ]
    return meta_fields, total_cmp, schema_elems
