"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. delta: capacity guard must accept spec-valid large-block streams
   (block=2048/nmb=8 constant data packs >64 values/byte; the reference
   decoder deltabp_decoder.go:53-68 accepts any 128-multiple geometry).
2. hybrid: truncated RLE value bytes must raise, not silently decode a
   partial little-endian value.
3. parquet legacy lists: a single-field repeated group named "array" or
   "<list>_tuple" is the ELEMENT (a one-field struct), not the 3-level
   middle node; bare repeated GROUPS normalize to lists like bare leaves.
4. RowGroup.total_byte_size (thrift field 2) is total UNCOMPRESSED size.
5. .rdpg page-CRC key renamed "crc32c" -> "crc32_comp" (it is IEEE CRC-32,
   not Castagnoli); old files with the misnamed key must still validate.
"""

import base64
import json

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.functions import delta, hybrid
from parquet_go_ray.functions.varint import write_uvarint, write_varint
from parquet_go_ray.sources import parquet_compat as pcq
from parquet_go_ray.sources import partfile
from parquet_go_ray.sources.columns import EncodeConfig


# ------------------------------------------------------- 1. delta capacity
def test_delta_accepts_large_block_constant_stream():
    # Hand-built spec-valid stream: block=2048, 8 miniblocks, constant values
    # -> every block is varint(0) min-delta + 8 zero width bytes, no payload.
    n = 1_000_000
    first = 7
    blob = bytearray()
    blob += write_uvarint(2048)
    blob += write_uvarint(8)
    blob += write_uvarint(n)
    blob += write_varint(first)
    nblocks = (n - 1 + 2047) // 2048
    blob += (write_varint(0) + bytes(8)) * nblocks
    vals = delta.decode(bytes(blob), 64)
    assert len(vals) == n
    assert vals[0] == first and vals[-1] == first
    assert (vals == first).all()


def test_delta_still_rejects_absurd_count_for_parsed_geometry():
    # block=2048/nmb=8 in a ~10-byte stream can cover at most
    # 2048*10/9 + 2048 values; claim 2^40 and it must be rejected.
    blob = (write_uvarint(2048) + write_uvarint(8)
            + write_uvarint(1 << 40) + write_varint(0))
    with pytest.raises(ValueError, match="capacity"):
        delta.decode(blob, 64)


# ------------------------------------------------ 2. hybrid truncated RLE
def test_hybrid_truncated_rle_value_raises():
    # width=16 -> 2 value bytes; supply only 1. Silently zero-padding would
    # decode value 0x01 instead of failing.
    buf = write_uvarint(10 << 1) + b"\x01"
    with pytest.raises(ValueError, match="truncated RLE value"):
        hybrid.decode(buf, 16, 10)


def test_hybrid_exact_rle_value_still_decodes():
    buf = write_uvarint(10 << 1) + (0x0201).to_bytes(2, "little")
    out = hybrid.decode(buf, 16, 10)
    assert (out == 0x0201).all()


# --------------------------------------------- 3. legacy list element rules
def _elems(*entries):
    """Build thrift-dict schema elems: root + entries (dicts with thrift
    field ids: 1=type, 3=repetition, 4=name, 5=num_children, 6=converted)."""
    root = {4: b"schema", 5: 0}
    out = [root]
    tops = 0
    depth = []  # remaining-children stack to count root's direct children
    for e in entries:
        if not depth:
            tops += 1
        else:
            depth[-1] -= 1
            while depth and depth[-1] == 0:
                depth.pop()
        nch = e.get(5, 0)
        if nch:
            depth.append(nch)
        out.append(e)
    root[5] = tops
    return out


def test_legacy_array_named_group_is_element():
    # optional group friends (LIST) { repeated group array { required binary
    # name (UTF8); } }  -> per spec the "array" group IS the element:
    # list<struct<name>> not list<string>.
    elems = _elems(
        {3: 1, 4: b"friends", 5: 1, 6: 3},
        {3: 2, 4: b"array", 5: 1},
        {1: 6, 3: 0, 4: b"name", 6: 0},
    )
    tops, leaves = pcq._schema_tree(elems)
    top = tops[0]
    assert top.kind == "list"
    elem = top.children[0].children[0]
    assert elem.kind == "struct" and len(elem.children) == 1
    assert elem.children[0].name == "name"


def test_legacy_tuple_named_group_is_element():
    elems = _elems(
        {3: 1, 4: b"friends", 5: 1, 6: 3},
        {3: 2, 4: b"friends_tuple", 5: 1},
        {1: 6, 3: 0, 4: b"name", 6: 0},
    )
    tops, _ = pcq._schema_tree(elems)
    elem = tops[0].children[0].children[0]
    assert elem.kind == "struct" and elem.children[0].name == "name"


def test_modern_three_level_list_unchanged():
    # group named "list" with one field stays the 3-level middle node:
    # list<string>, element is the leaf.
    elems = _elems(
        {3: 1, 4: b"friends", 5: 1, 6: 3},
        {3: 2, 4: b"list", 5: 1},
        {1: 6, 3: 0, 4: b"element", 6: 0},
    )
    tops, _ = pcq._schema_tree(elems)
    elem = tops[0].children[0].children[0]
    assert elem.is_leaf and elem.name == "element"


def test_bare_repeated_group_normalizes_to_list():
    # repeated group point { required int32 x; required int32 y; } with no
    # LIST annotation -> list<struct<x,y>> (top level and nested).
    elems = _elems(
        {3: 2, 4: b"point", 5: 2},
        {1: 1, 3: 0, 4: b"x"},
        {1: 1, 3: 0, 4: b"y"},
    )
    tops, leaves = pcq._schema_tree(elems)
    top = tops[0]
    assert top.kind == "list" and top.repetition == "required"
    mid = top.children[0]
    assert mid.repetition == "repeated"
    elem = mid.children[0]
    assert elem.kind == "struct" and len(elem.children) == 2
    # level accounting matches the bare repeated original: leaves at R=1, D=1
    assert all(leaf.max_r == 1 and leaf.max_d == 1 for _, _, leaf in leaves)


def test_bare_repeated_group_nested_in_struct_normalizes():
    elems = _elems(
        {3: 1, 4: b"outer", 5: 1},
        {3: 2, 4: b"point", 5: 2},
        {1: 1, 3: 0, 4: b"x"},
        {1: 1, 3: 0, 4: b"y"},
    )
    tops, _ = pcq._schema_tree(elems)
    inner = tops[0].children[0]
    assert inner.kind == "list"
    assert inner.children[0].children[0].kind == "struct"


# ---------------------------------------- 4. RowGroup.total_byte_size spec
def test_rowgroup_total_byte_size_is_uncompressed(tmp_path):
    import pyarrow.parquet as pq

    n = 5000
    t = pa.table({
        "a": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"value-{i % 11}" for i in range(n)]),
    })
    p = str(tmp_path / "tbs.parquet")
    pcq.write_parquet_with_our_kernels(t, p, compression="snappy")
    md = pq.ParquetFile(p).metadata
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        unc = sum(rg.column(i).total_uncompressed_size for i in range(rg.num_columns))
        cmp_ = sum(rg.column(i).total_compressed_size for i in range(rg.num_columns))
        assert rg.total_byte_size == unc
        assert cmp_ < unc  # sanity: snappy actually compressed something


# ------------------------------------------------- 5. crc32_comp back-compat
def _rewrite_footer(blob: bytes, mutate) -> bytes:
    m = partfile.MAGIC
    flen = int.from_bytes(blob[-len(m) - 4 : -len(m)], "little")
    fstart = len(blob) - len(m) - 4 - flen
    footer = json.loads(blob[fstart : fstart + flen])
    mutate(footer)
    fbytes = json.dumps(footer).encode()
    return blob[:fstart] + fbytes + len(fbytes).to_bytes(4, "little") + m


def test_legacy_crc32c_key_still_validates():
    n = 4000
    t = pa.table({
        "a": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"legacy-{i % 13}" for i in range(n)]),
    })
    blob, _ = partfile.encode_table(t, EncodeConfig(crc=True))

    renamed = {"count": 0}

    def to_old_key(footer):
        for sm in footer["streams"]:
            for p in sm["pages"] + ([sm["dict"]] if sm.get("dict") else []):
                if p.get("crc32_comp") is not None:
                    p["crc32c"] = p.pop("crc32_comp")
                    renamed["count"] += 1

    old = _rewrite_footer(blob, to_old_key)
    assert renamed["count"] > 0
    got = partfile.decode_table(old)
    assert got.equals(t)

    # the fallback must actually VALIDATE: corrupt a page byte and the
    # old-key CRC must catch it
    footer = partfile.read_footer(old)
    off = footer["streams"][0]["pages"][0]["offset"]
    bad = bytearray(old)
    bad[off] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        partfile.decode_table(bytes(bad))


def test_new_key_name_in_fresh_files():
    t = pa.table({"a": pa.array(np.arange(100, dtype=np.int64))})
    blob, _ = partfile.encode_table(t, EncodeConfig(crc=True))
    footer = partfile.read_footer(blob)
    for sm in footer["streams"]:
        for p in sm["pages"]:
            assert "crc32c" not in p
            assert p.get("crc32_comp") is not None
