"""Partition file layout + atomic write + read.

File layout (own format; the parquet analogy is one row group per file, the
layout role of /root/reference/file_writer.go:297-350's footer):

    magic  b"RDPG1\\x00"
    [page + dict-page blobs, concatenated]
    footer: JSON (schema IPC base64, per-stream codec/pages/stats)
    footer_len: u32 LE
    magic

Writes are atomic (tmp file + rename) so a partially-written partition never
looks committed — the resume path (state/manifest.py) relies on this.
``write_partition`` returns the lineage record for the manifest: partition id,
per-stream codec choices, page counts, bytes in/out, crc — the checkpoint
record the north rule requires.
"""

from __future__ import annotations

import base64
import json
import zlib

import numpy as np
import pyarrow as pa

from ..functions.shred import Stream, assemble, path_segment, shred
from . import fsio
from .columns import EncodeConfig, decode_stream, encode_stream

MAGIC = b"RDPG1\x00"


def encode_table(table: pa.Table, config: EncodeConfig | None = None,
                 metadata: dict | None = None) -> tuple[bytes, dict]:
    """Encode a pa.Table into partition-file bytes + lineage record.

    ``config.metadata`` is file-level KV metadata (the reference's
    WithMetaData, file_writer.go:86-98); the ``metadata`` argument is
    per-partition KV (the per-row-group FlushRowGroupOption metadata role,
    file_writer.go:194-226) and overrides config keys on collision. Both land
    in the footer's ``kv_metadata`` and the lineage record."""
    config = config or EncodeConfig()
    names = table.column_names
    if len(set(names)) != len(names):
        # streams are keyed by column path — a duplicate name would otherwise
        # surface as an opaque KeyError from deep inside the schema walk
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"encode_table: duplicate column name(s) {dupes} — column names "
            f"must be unique (rename with Table.rename_columns first)")
    table = table.combine_chunks()
    streams: list[Stream] = []
    for name in table.column_names:
        col = table.column(name)
        arr = col.chunk(0) if col.num_chunks else pa.nulls(0, col.type)
        shred(arr, path_segment(name), streams)

    if config.column_codecs:
        # a typo'd path would otherwise silently no-op and the selector's
        # choice would ship instead of the forced codec
        known = {s.path for s in streams}
        unknown = sorted(set(config.column_codecs) - known)
        if unknown:
            raise ValueError(
                f"column_codecs: no such stream path(s) {unknown}; "
                f"available: {sorted(known)}")

    body = bytearray(MAGIC)

    def _append(part) -> None:
        # parts may be bytes, memoryview, numpy, or pyarrow Buffer (buffer protocol)
        body.extend(part if isinstance(part, (bytes, bytearray)) else memoryview(part))

    stream_metas = []
    bytes_in = table.nbytes
    for st in streams:
        blobs, meta = encode_stream(st, config)
        bi = 0
        if meta.get("dict"):
            meta["dict"]["offset"] = len(body)
            _append(blobs[0])
            bi = 1
        for p, blob in zip(meta["pages"], blobs[bi:]):
            p["offset"] = len(body)
            _append(blob)
        stream_metas.append(meta)

    blooms = {}
    if config.bloom_columns:
        from . import bloom as _bloom

        for cname in config.bloom_columns:
            if cname not in table.column_names:
                raise ValueError(
                    f"bloom_columns: no such column {cname!r}; "
                    f"available: {table.column_names}")
            ty = table.schema.field(cname).type
            if not (pa.types.is_integer(ty) or pa.types.is_string(ty)
                    or pa.types.is_large_string(ty) or pa.types.is_binary(ty)):
                raise ValueError(
                    f"bloom_columns: {cname!r} has type {ty} — Bloom "
                    f"filters support int/string/binary columns")
            blob = _bloom.build(table.column(cname))
            # CRC is load-bearing here, not hygiene: a bit CLEARED by rot
            # turns into a false NEGATIVE — eq_filter would skip a partition
            # that really holds the key and rows would silently vanish from
            # point lookups (pages fail loudly on corruption; a bloom fails
            # by lying)
            blooms[cname] = {"offset": len(body), "size": len(blob),
                             "algo": "sbbf-fnv1a-poly",
                             "crc32": zlib.crc32(blob) & 0xFFFFFFFF}
            _append(blob)

    footer = {
        "version": 1,
        "num_rows": table.num_rows,
        "schema_ipc": base64.b64encode(table.schema.serialize().to_pybytes()).decode(),
        "streams": stream_metas,
    }
    if blooms:
        footer["blooms"] = blooms
    kv = {**config.metadata, **(metadata or {})}
    if kv:
        footer["kv_metadata"] = {str(k): str(v) for k, v in kv.items()}
    fbytes = json.dumps(footer).encode()
    body.extend(fbytes)
    body.extend(len(fbytes).to_bytes(4, "little"))
    body.extend(MAGIC)

    lineage = {
        "num_rows": table.num_rows,
        "bytes_in": int(bytes_in),
        "bytes_out": len(body),
        "codecs": {m["path"]: m["codec"] for m in stream_metas},
        "pages": {m["path"]: len(m["pages"]) for m in stream_metas},
        "crc32": zlib.crc32(body) & 0xFFFFFFFF,  # bytearray ok: no copy
        # the full reproducible config: compaction re-encodes merged
        # partitions with THIS (config=None would otherwise silently reset
        # compression / forced codecs / blooms / kv metadata to defaults)
        "encode_config": {
            "mode": config.mode, "compression": config.compression,
            "page_bytes": config.page_bytes, "crc": config.crc,
            "column_codecs": dict(config.column_codecs),
            "bloom_columns": list(config.bloom_columns),
            "metadata": {str(k): str(v) for k, v in config.metadata.items()},
        },
    }
    tables = {
        m["path"]: m["stats"]["fsst_table_crc32"]
        for m in stream_metas
        if m.get("stats", {}).get("fsst_table_crc32")
    }
    if tables:
        lineage["symbol_tables"] = tables
    if kv:
        lineage["kv_metadata"] = footer["kv_metadata"]
    return bytes(body), lineage


def write_partition(table: pa.Table, path: str, config: EncodeConfig | None = None,
                    metadata: dict | None = None) -> dict:
    """Atomic write (tmp+rename locally, single PUT on object stores — see
    fsio.write_bytes_atomic); returns the lineage record incl. path. ``path``
    may be a plain local path or any pyarrow.fs URI."""
    body, lineage = encode_table(table, config, metadata)
    fsio.write_bytes_atomic(path, body, fsync=True)
    lineage["path"] = path
    return lineage


def read_footer(blob: bytes) -> dict:
    if blob[: len(MAGIC)] != MAGIC or blob[-len(MAGIC) :] != MAGIC:
        raise ValueError("not an RDPG partition file (bad magic)")
    flen = int.from_bytes(blob[-len(MAGIC) - 4 : -len(MAGIC)], "little")
    fstart = len(blob) - len(MAGIC) - 4 - flen
    return json.loads(blob[fstart : fstart + flen])


def decode_table(blob: bytes, columns: list[str] | None = None) -> pa.Table:
    """Decode partition bytes to a pa.Table, optionally projecting columns.

    Projection skips unrequested streams entirely (the analogue of the
    reference's WithColumns chunk skipping, /root/reference/chunk_reader.go:271-297).
    """
    footer = read_footer(blob)
    schema = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(footer["schema_ipc"])))
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def read_at(offset: int, size: int) -> bytes:
        return blob[offset : offset + size]

    wanted = {path_segment(f.name) for f in schema}
    streams: dict[str, dict[str, Stream]] = {}
    for meta in footer["streams"]:
        root = meta["path"].split(".", 1)[0]
        if root not in wanted:
            continue
        st = decode_stream(meta, read_at)
        streams.setdefault(st.path, {})[st.kind] = st

    arrays = [
        assemble(f.type, streams, path_segment(f.name), footer["num_rows"]) for f in schema
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


def read_partition(path: str, columns: list[str] | None = None) -> pa.Table:
    return decode_table(fsio.read_bytes(path), columns)


def read_partition_footer(path: str) -> dict:
    """Footer-only read (ranged tail read) — the analogue of the reference's
    ReadFileMetaData (/root/reference/file_meta.go:18-74): no page data moves,
    over local paths or object-store URIs alike."""
    blob, size = fsio.read_tail(path, 64 * 1024)
    if blob[-len(MAGIC):] != MAGIC:
        raise ValueError(f"{path}: bad trailing magic")
    flen = int.from_bytes(blob[-len(MAGIC) - 4 : -len(MAGIC)], "little")
    if flen + 4 + len(MAGIC) > size:
        raise ValueError(f"{path}: footer length {flen} exceeds file size {size}")
    if flen + 4 + len(MAGIC) > len(blob):
        blob = fsio.read_range(path, size - flen - 4 - len(MAGIC), flen + 4 + len(MAGIC))
    try:
        return json.loads(blob[-len(MAGIC) - 4 - flen : -len(MAGIC) - 4])
    except (ValueError, UnicodeDecodeError) as e:
        # a bit-flip inside the footer region must surface as a clean
        # corruption error, not a JSON/unicode decode traceback
        raise ValueError(f"{path}: corrupt footer ({e})") from None


def partition_stats(path: str) -> dict[str, dict]:
    """path-level stream stats {stream_path: {min,max,distinct,null_count}}."""
    footer = read_partition_footer(path)
    return {s["path"]: (s.get("stats") or {}) for s in footer["streams"]}


def read_dictionary_page(path: str, column: str):
    """Distinct values of a DICT-encoded stream WITHOUT touching data pages —
    the dictionary page *is* the per-chunk distinct set (the property the
    reference exploits for its distinct-count stats, type_dict.go:127-129).
    Returns a pa.Array of the dictionary values, or None if the stream isn't
    dictionary-encoded in this partition."""
    from .columns import _INT_CLASS, _decompress

    footer = read_partition_footer(path)
    meta = next((s for s in footer["streams"] if s["path"] == column), None)
    if meta is None or not meta.get("dict"):
        return None
    dmeta = meta["dict"]
    raw = fsio.read_range(path, dmeta["offset"], dmeta["size"])
    crc = dmeta.get("crc32_comp", dmeta.get("crc32c"))
    if crc is not None and (zlib.crc32(bytes(raw)) & 0xFFFFFFFF) != crc:
        # this distinct set drives EXACT pruning (eq_filter) — a rotted
        # page that silently missed a queried key would vanish rows from
        # point lookups, the lying-filter failure the bloom CRC exists for
        raise ValueError(f"CRC mismatch on {path} dict page for {column}")
    payload = _decompress(raw, meta["compression"], dmeta["usize"])
    from ..functions import plain

    if meta["kind"] == "bytes":
        offsets, data = plain.decode_byte_array(payload, dmeta["num_values"])
        return pa.Array.from_buffers(
            pa.binary(), dmeta["num_values"],
            [None, pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int32)),
             pa.py_buffer(np.ascontiguousarray(data))],
        )
    dtype = meta["dtype"]
    if meta["kind"] == "fixed_bytes":
        width = int(dtype.split(":")[1])
        flat = np.frombuffer(payload, dtype=np.uint8,
                             count=dmeta["num_values"] * width)
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), dmeta["num_values"],
            [None, pa.py_buffer(np.ascontiguousarray(flat))])
    if dtype in _INT_CLASS:
        nbits = _INT_CLASS[dtype]
        v = plain.decode_fixed(payload, "int32" if nbits == 32 else "int64",
                               dmeta["num_values"])
        # restore the COLUMN dtype like decode_stream's _from_class —
        # returning the signed class view hands uint32 values >= 2^31 back
        # as negatives (and silently breaks dict-pruning casts)
        from .columns import _from_class

        return pa.array(_from_class(v, dtype))
    return pa.array(plain.decode_fixed(payload, dtype, dmeta["num_values"]))
