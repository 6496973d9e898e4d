"""Shred Arrow arrays into flat leaf streams and assemble them back.

The reference shreds nested records into per-leaf (values, rep/def levels)
via Dremel (/root/reference/schema.go:837-891, data_store.go:96-136). Arrow
already stores nested data shredded — offsets + validity + child buffers — so
our streams mirror Arrow's physical layout instead of materializing Dremel
levels (SURVEY.md §1.5); ``levels.py`` provides the Dremel conversion at the
Parquet-file boundary for parity tests.

Stream kinds per array node (path-addressed, e.g. ``tokens.item``):
  validity  np.bool_, full slot count (only present when null_count > 0)
  lengths   np.int64 list lengths of non-null slots (list/large_list/map)
  values    numpy primitive array of non-null slots (leaf primitives)
  bytes     (offsets:int64, data:uint8) of non-null slots (string/binary)
Struct children keep full slot count (their own validity covers parent nulls).

Like the reference, only *defined* values are stored
(/root/reference/data_store.go:116-119: nulls advance levels only).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass
class Stream:
    path: str
    kind: str  # validity | lengths | values | bytes
    dtype: str  # numpy dtype name, "bool", or "bytes"
    data: object  # np.ndarray or (offsets, data) tuple
    num_values: int


def path_segment(name: str) -> str:
    """Escape one column/field name for use in a dotted stream path.

    Paths flatten the schema tree with "." joins; a field literally named
    "a.b" (or containing "%") would otherwise collide with a genuinely
    nested a->b path and silently cross-wire data. Plain names — every
    normal schema — are unchanged, so existing files decode as-is.
    """
    return name.replace("%", "%25").replace(".", "%2E")


def _validity_array(arr: pa.Array) -> np.ndarray:
    buf = arr.buffers()[0]
    if buf is None:
        return np.ones(len(arr), dtype=np.bool_)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), bitorder="little", count=arr.offset + len(arr)
    )
    return bits[arr.offset :].astype(np.bool_)


_PRIMS = {
    pa.types.is_int8: "int8",
    pa.types.is_int16: "int16",
    pa.types.is_int32: "int32",
    pa.types.is_int64: "int64",
    pa.types.is_uint8: "uint8",
    pa.types.is_uint16: "uint16",
    pa.types.is_uint32: "uint32",
    pa.types.is_uint64: "uint64",
    pa.types.is_float16: "float16",
    pa.types.is_float32: "float32",
    pa.types.is_float64: "float64",
}


def _prim_dtype(t: pa.DataType) -> str | None:
    """numpy dtype for primitives storable as fixed-width streams."""
    for pred, name in _PRIMS.items():
        if pred(t):
            return name
    if pa.types.is_timestamp(t) or pa.types.is_time64(t) or pa.types.is_duration(t) or pa.types.is_date64(t):
        return "int64"
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return "int32"
    return None


def _storage_type(name: str) -> pa.DataType:
    return {"int32": pa.int32(), "int64": pa.int64()}.get(name) or getattr(pa, name)()


def shred(arr: pa.Array, path: str, out: list[Stream]) -> None:
    t = arr.type
    if pa.types.is_dictionary(t):
        # decode to the value type; indices hidden behind a null slot of an
        # ANCESTOR (e.g. a null struct row) are unspecified per the Arrow
        # spec and may point outside the dictionary — cast() would raise on
        # them, so null out-of-range indices first (the parent's validity
        # re-masks those slots at assemble time anyway)
        import pyarrow.compute as pc

        idx = arr.indices
        ok = pc.and_kleene(
            pc.greater_equal(idx, 0),
            pc.less(idx, pa.scalar(len(arr.dictionary), type=idx.type)),
        )
        safe = pc.if_else(ok, idx, pa.scalar(None, type=idx.type))
        shred(pc.take(arr.dictionary, safe), path, out)
        return
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        shred(arr.cast(pa.string() if pa.types.is_large_string(t) else pa.binary()), path, out)
        return
    if pa.types.is_null(t):
        out.append(Stream(path, "validity", "bool", np.zeros(len(arr), dtype=np.bool_), len(arr)))
        return
    has_nulls = arr.null_count > 0
    if has_nulls:
        out.append(Stream(path, "validity", "bool", _validity_array(arr), len(arr)))

    if pa.types.is_boolean(t):
        vals = arr.drop_null() if has_nulls else arr
        np_vals = np.asarray(vals.cast(pa.uint8())).astype(np.bool_)
        out.append(Stream(path, "values", "bool", np_vals, len(np_vals)))
        return

    prim = _prim_dtype(t)
    if prim is not None:
        vals = arr.drop_null() if has_nulls else arr
        np_vals = np.asarray(vals.view(_storage_type(prim)))
        out.append(Stream(path, "values", prim, np_vals, len(np_vals)))
        return

    if pa.types.is_string(t) or pa.types.is_binary(t):
        vals = arr.drop_null() if has_nulls else arr
        bufs = vals.buffers()
        offsets = np.frombuffer(
            bufs[1], dtype=np.int32, count=len(vals) + 1, offset=vals.offset * 4
        ).astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        out.append(Stream(path, "bytes", "bytes", (offsets, data), len(vals)))
        return

    if pa.types.is_fixed_size_binary(t) or pa.types.is_decimal(t):
        # FIXED_LEN_BYTE_ARRAY analogue (/root/reference/type_bytearray.go:328-333);
        # decimal128/256 are its 16/32-byte special cases
        width = t.byte_width
        vals = arr.drop_null() if has_nulls else arr
        data = np.frombuffer(
            vals.buffers()[1], dtype=np.uint8, count=len(vals) * width, offset=vals.offset * width
        )
        out.append(Stream(path, "fixed_bytes", f"fixed:{width}", data, len(vals)))
        return

    if pa.types.is_map(t):
        if has_nulls:
            raise NotImplementedError("nullable map columns not supported")
        as_list = pa.ListArray.from_arrays(
            pa.array(np.asarray(arr.offsets), type=pa.int32()),
            pa.StructArray.from_arrays([arr.keys, arr.items], names=["key", "value"]),
        )
        shred(as_list, path, out)
        return

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        vals = arr.drop_null() if has_nulls else arr
        off_np = np.asarray(vals.offsets, dtype=np.int64)
        out.append(Stream(path, "lengths", "int64", np.diff(off_np), len(vals)))
        child = vals.values[off_np[0] : off_np[-1]] if len(vals) else vals.values[:0]
        shred(child, path + ".item", out)
        return

    if pa.types.is_struct(t):
        child_names = [f.name for f in t]
        if len(set(child_names)) != len(child_names):
            # duplicate names map to one stream path — the later field would
            # silently overwrite the earlier one's data
            dupes = sorted({n for n in child_names if child_names.count(n) > 1})
            raise ValueError(
                f"shred: duplicate struct field name(s) {dupes} at {path} — "
                f"field names within a struct must be unique")
        for i, field in enumerate(t):
            shred(arr.field(i), f"{path}.{path_segment(field.name)}", out)
        return

    raise NotImplementedError(f"shred: unsupported Arrow type {t} at {path}")


def _scatter(flat: pa.Array, validity: np.ndarray) -> pa.Array:
    """Expand compacted non-null values to full length with nulls."""
    n = len(validity)
    pos = np.cumsum(validity, dtype=np.int64) - 1
    idx = pa.array(pos, mask=~validity)  # null index -> null output slot
    return flat.take(idx)


def assemble(t: pa.DataType, streams: dict[str, dict[str, Stream]], path: str, length: int) -> pa.Array:
    """Rebuild a pa.Array of type ``t`` (length slots) from shredded streams."""
    node = streams.get(path, {})
    validity = np.asarray(node["validity"].data, dtype=np.bool_) if "validity" in node else None

    if pa.types.is_null(t):
        return pa.nulls(length)

    if pa.types.is_dictionary(t):
        # shred() stores dictionary columns as their decoded value type; the
        # footer schema keeps the logical dictionary type, so re-encode on
        # the way out (cast fixes the index width / ordered flag to match)
        plain = assemble(t.value_type, streams, path, length)
        return plain.dictionary_encode().cast(t)

    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        small = pa.string() if pa.types.is_large_string(t) else pa.binary()
        return assemble(small, streams, path, length).cast(t)

    if pa.types.is_string(t) or pa.types.is_binary(t):
        offsets, data = node["bytes"].data
        flat = pa.Array.from_buffers(
            t,
            len(offsets) - 1,
            [
                None,
                pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int32)),
                pa.py_buffer(np.ascontiguousarray(data, dtype=np.uint8)),
            ],
        )
        return _scatter(flat, validity) if validity is not None else flat

    if pa.types.is_fixed_size_binary(t) or pa.types.is_decimal(t):
        width = t.byte_width  # 16 for decimal128, 32 for decimal256
        data = np.ascontiguousarray(np.asarray(node["fixed_bytes"].data, dtype=np.uint8))
        flat = pa.Array.from_buffers(t, len(data) // width, [None, pa.py_buffer(data)])
        return _scatter(flat, validity) if validity is not None else flat

    if pa.types.is_boolean(t):
        flat = pa.array(np.asarray(node["values"].data, dtype=np.bool_))
        return _scatter(flat, validity) if validity is not None else flat

    prim = _prim_dtype(t)
    if prim is not None:
        flat = pa.array(np.asarray(node["values"].data, dtype=prim))
        if flat.type != t:
            flat = flat.view(t)
        return _scatter(flat, validity) if validity is not None else flat

    if pa.types.is_map(t):
        as_list = assemble(
            pa.list_(pa.struct([("key", t.key_type), ("value", t.item_type)])), streams, path, length
        )
        return pa.MapArray.from_arrays(as_list.offsets, as_list.values.field(0), as_list.values.field(1))

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lengths = np.asarray(node["lengths"].data, dtype=np.int64)
        child_len = int(lengths.sum()) if len(lengths) else 0
        child = assemble(t.value_type, streams, path + ".item", child_len)
        if validity is None:
            offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            flat = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)
        else:
            full_lengths = np.zeros(len(validity), dtype=np.int64)
            full_lengths[validity] = lengths
            offsets = np.zeros(len(validity) + 1, dtype=np.int64)
            np.cumsum(full_lengths, out=offsets[1:])
            flat = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), child, mask=pa.array(~validity)
            )
        return flat if flat.type == t else flat.cast(t)

    if pa.types.is_struct(t):
        children = [
            assemble(f.type, streams, f"{path}.{path_segment(f.name)}", length) for f in t
        ]
        mask = pa.array(~validity) if validity is not None else None
        return pa.StructArray.from_arrays(children, fields=list(t), mask=mask)

    raise NotImplementedError(f"assemble: unsupported type {t} at {path}")
