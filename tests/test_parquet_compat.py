"""Bitstream conformance: decode REAL parquet files (written by pyarrow with
pinned encodings) using our kernels only — the sandbox stand-in for the
reference's apache/parquet-testing + Impala corpora tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import parquet_go_ray.sources.parquet_compat as pcq
from parquet_go_ray.sources.parquet_compat import read_parquet_with_our_kernels

RNG = np.random.default_rng(21)


def _table(n=5000, with_nulls=False):
    ints = RNG.integers(-(2**40), 2**40, n)
    sorted_ints = np.sort(RNG.integers(0, 10**9, n)).astype(np.int32)
    floats = RNG.standard_normal(n)
    strs = [f"user-{i % 997:05d}-{i % 13}" for i in range(n)]
    if with_nulls:
        mask = RNG.random(n) < 0.1
        ints = pa.array(np.where(mask, 0, ints), mask=mask)
        strs = pa.array([None if RNG.random() < 0.1 else s for s in strs])
    else:
        ints = pa.array(ints)
        strs = pa.array(strs)
    return pa.table(
        {"i64": ints, "i32": pa.array(sorted_ints), "f64": pa.array(floats),
         "f32": pa.array(floats.astype(np.float32)), "s": strs}
    )


def _assert_matches(path):
    ours = read_parquet_with_our_kernels(path)
    ref = pq.read_table(path)
    for name in ref.column_names:
        a = ours.column(name).combine_chunks()
        b = ref.column(name).combine_chunks()
        if pa.types.is_string(b.type):
            a = a.cast(pa.string())
        assert a.equals(b), f"{name}:\n{a.slice(0, 5)}\n!=\n{b.slice(0, 5)}"


@pytest.mark.parametrize("compression", ["NONE", "SNAPPY", "ZSTD", "GZIP"])
def test_plain_and_dict_v1(tmp_path, compression):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(), p, compression=compression, use_dictionary=["s"],
                   data_page_version="1.0")
    _assert_matches(p)


def test_nulls_v1(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(with_nulls=True), p, compression="SNAPPY",
                   use_dictionary=["s"], data_page_version="1.0")
    _assert_matches(p)


def test_delta_binary_packed(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        _table(), p, compression="SNAPPY", use_dictionary=False,
        column_encoding={"i32": "DELTA_BINARY_PACKED", "i64": "DELTA_BINARY_PACKED",
                         "f64": "PLAIN", "f32": "PLAIN", "s": "DELTA_LENGTH_BYTE_ARRAY"},
        data_page_version="1.0",
    )
    _assert_matches(p)


def test_delta_byte_array_and_bss(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        _table(), p, compression="SNAPPY", use_dictionary=False,
        column_encoding={"s": "DELTA_BYTE_ARRAY", "f64": "BYTE_STREAM_SPLIT",
                         "f32": "BYTE_STREAM_SPLIT", "i32": "PLAIN", "i64": "PLAIN"},
        data_page_version="1.0",
    )
    _assert_matches(p)


def test_data_page_v2(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(with_nulls=True), p, compression="SNAPPY",
                   use_dictionary=["s"], data_page_version="2.0")
    _assert_matches(p)


def test_multi_row_group(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(20_000), p, compression="SNAPPY", row_group_size=3000,
                   data_page_version="1.0")
    _assert_matches(p)


def test_projection(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(_table(), p, data_page_version="1.0")
    out = read_parquet_with_our_kernels(p, columns=["i32", "s"])
    assert out.column_names == ["i32", "s"]
    ref = pq.read_table(p, columns=["i32", "s"])
    assert out.column("i32").combine_chunks().equals(ref.column("i32").combine_chunks())


# ------------------------------------------------------------------- writer
import duckdb

from parquet_go_ray.sources.parquet_compat import write_parquet_with_our_kernels


def _write_and_check(tmp_path, table, **kw):
    p = str(tmp_path / "ours.parquet")
    write_parquet_with_our_kernels(table, p, **kw)
    ref = pq.read_table(p)
    for name in table.column_names:
        a = ref.column(name).combine_chunks()
        b = table.column(name).combine_chunks()
        if pa.types.is_binary(a.type) and pa.types.is_string(b.type):
            a = a.cast(pa.string())
        assert a.equals(b), f"pyarrow read mismatch on {name}"
    # second independent reader: DuckDB
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
    assert n == table.num_rows
    return p


def test_write_plain_all_types(tmp_path):
    t = _table(3000)
    _write_and_check(tmp_path, t, compression="snappy")


def test_write_uncompressed_and_zstd(tmp_path):
    t = _table(1000)
    _write_and_check(tmp_path, t, compression=None)
    _write_and_check(tmp_path, t, compression="zstd")


def test_write_with_nulls(tmp_path):
    t = _table(2000, with_nulls=True)
    _write_and_check(tmp_path, t, compression="snappy")


def test_write_encodings(tmp_path):
    t = _table(4000)
    p = _write_and_check(
        tmp_path, t, compression="snappy",
        column_encoding={"i32": "DELTA_BINARY_PACKED", "i64": "DELTA_BINARY_PACKED",
                         "s": "DELTA_BYTE_ARRAY"},
    )
    # verify the file really used those encodings
    meta = pq.ParquetFile(p).metadata
    encs = {meta.row_group(0).column(i).path_in_schema: meta.row_group(0).column(i).encodings
            for i in range(meta.num_columns)}
    assert "DELTA_BINARY_PACKED" in encs["i32"]
    assert "DELTA_BYTE_ARRAY" in encs["s"]


def test_write_dictionary(tmp_path):
    t = pa.table({"s": pa.array([f"v{i % 40}" for i in range(5000)]),
                  "k": pa.array(np.arange(5000, dtype=np.int64) % 17)})
    p = _write_and_check(tmp_path, t, compression="snappy",
                         column_encoding={"s": "DICT", "k": "DICT"})
    meta = pq.ParquetFile(p).metadata
    assert "RLE_DICTIONARY" in meta.row_group(0).column(0).encodings


def test_write_timestamps_and_dates(tmp_path):
    t = pa.table({
        "ts": pa.array(np.arange(1000) * 1_000_000, type=pa.timestamp("us")),
        "d": pa.array(np.arange(1000, dtype=np.int32), type=pa.date32()),
    })
    _write_and_check(tmp_path, t, compression="snappy")


def test_write_then_read_with_our_reader(tmp_path):
    """Full circle: our writer -> our reader (plus pyarrow in the middle)."""
    t = _table(2000)
    p = str(tmp_path / "circle.parquet")
    write_parquet_with_our_kernels(t, p, compression="snappy",
                                   column_encoding={"i32": "DELTA_BINARY_PACKED"})
    ours = read_parquet_with_our_kernels(p)
    for name in t.column_names:
        a = ours.column(name).combine_chunks()
        b = t.column(name).combine_chunks()
        if pa.types.is_binary(a.type):
            a = a.cast(pa.string())
        assert a.equals(b), name


def test_write_token_table_list_column(tmp_path):
    """The flagship shape — (doc_id, tokens:list<int32>, n_tok, source) — as a
    REAL parquet file written by our kernels, read back by pyarrow + DuckDB."""
    from parquet_go_ray.sources.fixtures import token_table_shard

    t = token_table_shard(2000, shard=0)
    p = str(tmp_path / "tokens.parquet")
    write_parquet_with_our_kernels(
        t, p, compression="snappy",
        column_encoding={"doc_id": "DELTA_BYTE_ARRAY", "source": "DICT",
                         "n_tok": "DELTA_BINARY_PACKED"},
    )
    ref = pq.read_table(p)
    assert ref.column("tokens").combine_chunks().cast(pa.list_(pa.int32())).equals(
        t.column("tokens").combine_chunks())
    assert ref.column("doc_id").combine_chunks().cast(pa.string()).equals(
        t.column("doc_id").combine_chunks())
    assert ref.column("n_tok").combine_chunks().equals(t.column("n_tok").combine_chunks())
    n_empty = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{p}') WHERE len(tokens) = 0"
    ).fetchone()[0]
    want_empty = sum(1 for x in t.column("n_tok").to_pylist() if x == 0)
    assert n_empty == want_empty


# ---------------------------------------------------------------- round 2:
# nested schemas, multi-row-group, v2 pages, INT96/FLBA, page CRC
NESTED_CASES = {
    "struct": pa.table({"s": pa.array(
        [{"x": 1, "y": "a"}, None, {"x": None, "y": "b"}],
        pa.struct([("x", pa.int64()), ("y", pa.string())]))}),
    "list_nulls": pa.table({"l": pa.array([[1, 2], [], None, [3, None]],
                                          pa.list_(pa.int32()))}),
    "list_struct": pa.table({"ls": pa.array(
        [[{"p": 1, "q": "a"}], [], None, [{"p": 5, "q": None}, {"p": None, "q": "w"}]],
        pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())])))}),
    "struct_list": pa.table({"s2": pa.array(
        [{"v": [1, 2], "w": 9}, {"v": [], "w": None}, None, {"v": None, "w": 3}],
        pa.struct([("v", pa.list_(pa.int32())), ("w", pa.int64())]))}),
    "map": pa.table({"m": pa.array([[("a", 1), ("b", None)], [], None, [("c", 3)]],
                                   pa.map_(pa.string(), pa.int64()))}),
    "deep": pa.table({"d": pa.array(
        [{"items": [{"name": "x", "vals": [1, 2]}, {"name": None, "vals": []}]},
         {"items": []}, None, {"items": [{"name": "y", "vals": None}]}],
        pa.struct([("items", pa.list_(pa.struct(
            [("name", pa.string()), ("vals", pa.list_(pa.int64()))])))]))}),
    "list_of_list": pa.table({"ll": pa.array([[[1], [2, 3], []], [], None, [None, [4]]],
                                             pa.list_(pa.list_(pa.int32())))}),
}


@pytest.mark.parametrize("name", sorted(NESTED_CASES))
def test_nested_write_pyarrow_reads(tmp_path, name):
    """Our writer emits real nested parquet pyarrow can read (readwrite_test.go:252-533)."""
    t = NESTED_CASES[name]
    p = str(tmp_path / f"{name}.parquet")
    pcq.write_parquet_with_our_kernels(t, p)
    assert pq.read_table(p).cast(t.schema).equals(t)


@pytest.mark.parametrize("name", sorted(NESTED_CASES))
def test_nested_read_of_pyarrow_file(tmp_path, name):
    """Our reader assembles pyarrow-written nested parquet (nested_lists golden role)."""
    t = NESTED_CASES[name]
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, p)
    assert pcq.read_parquet_with_our_kernels(p).cast(t.schema).equals(t)


@pytest.mark.parametrize("version", [1, 2])
def test_nested_self_roundtrip_both_page_versions(tmp_path, version):
    t = NESTED_CASES["deep"]
    p = str(tmp_path / "deep.parquet")
    pcq.write_parquet_with_our_kernels(t, p, data_page_version=version, compression="zstd")
    assert pcq.read_parquet_with_our_kernels(p, validate_crc=True).cast(t.schema).equals(t)


def test_multi_row_group_write_and_read(tmp_path):
    t = pa.table({"a": pa.array(np.arange(1000), pa.int64()),
                  "s": [f"v{i % 7}" for i in range(1000)]})
    p = str(tmp_path / "mrg.parquet")
    pcq.write_parquet_with_our_kernels(t, p, row_group_rows=300)
    f = pq.ParquetFile(p)
    assert f.num_row_groups == 4
    assert f.read().cast(t.schema).equals(t)
    assert pcq.read_parquet_with_our_kernels(p).cast(t.schema).equals(t)


def test_v2_pages_read_from_pyarrow(tmp_path):
    t = pa.table({"a": pa.array(np.arange(500) % 50, pa.int64()),
                  "s": [f"v{i % 7}" for i in range(500)]})
    p = str(tmp_path / "v2.parquet")
    pq.write_table(t, p, data_page_version="2.0")
    assert pcq.read_parquet_with_our_kernels(p).cast(t.schema).equals(t)


def test_int96_both_directions(tmp_path):
    t = pa.table({"ts": pa.array([0, 10**15, None], pa.timestamp("ns"))})
    p1 = str(tmp_path / "pa_int96.parquet")
    pq.write_table(t, p1, use_deprecated_int96_timestamps=True)
    assert pcq.read_parquet_with_our_kernels(p1).cast(t.schema).equals(t)
    p2 = str(tmp_path / "our_int96.parquet")
    pcq.write_parquet_with_our_kernels(t, p2, int96_timestamps=True)
    assert pq.read_table(p2).cast(t.schema).equals(t)
    assert pcq.read_parquet_with_our_kernels(p2).cast(t.schema).equals(t)


def test_decimal_and_fixed_binary_both_directions(tmp_path):
    from decimal import Decimal

    t = pa.table({"d": pa.array([None, Decimal("123.45"), Decimal("-0.01")],
                                pa.decimal128(10, 2)),
                  "fb": pa.array([b"abcd", None, b"wxyz"], pa.binary(4))})
    p1 = str(tmp_path / "pa_dec.parquet")
    pq.write_table(t, p1)
    assert pcq.read_parquet_with_our_kernels(p1).cast(t.schema).equals(t)
    p2 = str(tmp_path / "our_dec.parquet")
    pcq.write_parquet_with_our_kernels(t, p2)
    assert pq.read_table(p2).cast(t.schema).equals(t)


def test_page_crc_written_and_validated(tmp_path):
    t = pa.table({"a": pa.array([1, 2, None], pa.int64()), "s": ["x", None, "z"]})
    p = str(tmp_path / "crc.parquet")
    pcq.write_parquet_with_our_kernels(t, p)
    # pyarrow's own checksum verification accepts our CRCs
    assert pq.ParquetFile(p, page_checksum_verification=True).read().cast(t.schema).equals(t)
    assert pcq.read_parquet_with_our_kernels(p, validate_crc=True).cast(t.schema).equals(t)
    blob = bytearray(open(p, "rb").read())
    blob[30] ^= 0xFF  # flip a byte inside the first page
    bad = str(tmp_path / "crc_bad.parquet")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        pcq.read_parquet_with_our_kernels(bad, validate_crc=True)


def test_dremel_shred_assemble_identity():
    """Vectorized dremel shred->assemble is the identity on every nested case."""
    from parquet_go_ray.sources.dremel import (assemble_column, fix_levels,
                                               node_from_arrow, shred_column)

    for name, t in NESTED_CASES.items():
        fld = t.schema.field(0)
        arr = t.column(0).combine_chunks()
        node = node_from_arrow(fld)
        fix_levels(node)
        smap = {tuple(s.path): {"reps": s.reps, "defs": s.defs, "values": s.values}
                for s in shred_column(arr, node)}
        assert assemble_column(node, smap).equals(arr), name


def test_dremel_levels_match_reference_semantics():
    """Cross-check vectorized levels against the record-oriented spec
    implementation (functions/levels.py, Dremel-paper semantics)."""
    from parquet_go_ray.functions.levels import Node, shred_to_levels
    from parquet_go_ray.sources.dremel import fix_levels, node_from_arrow, shred_column

    t = NESTED_CASES["deep"]
    arr = t.column(0).combine_chunks()
    node = node_from_arrow(t.schema.field(0))
    fix_levels(node)
    streams = {tuple(s.path): s for s in shred_column(arr, node)}

    ref_root = Node("root", "required", [
        Node("d", "optional", [
            Node("items", "optional", [
                Node("list", "repeated", [
                    Node("element", "optional", [
                        Node("name", "optional"),
                        Node("vals", "optional", [
                            Node("list", "repeated", [
                                Node("element", "optional"),
                            ]),
                        ]),
                    ]),
                ]),
            ]),
        ]),
    ])
    recs = []
    for row in arr.to_pylist():
        if row is None:
            recs.append({})
            continue
        items = row["items"]
        recs.append({"d": {"items": None if items is None else {
            "list": [{"element": None if it is None else {
                "name": it["name"],
                "vals": None if it["vals"] is None else {
                    "list": [{"element": v} for v in it["vals"]]},
            }} for it in items]}}})
    ref = shred_to_levels(recs, ref_root)
    got_name = streams[("d", "items", "list", "element", "name")]
    assert got_name.defs.tolist() == ref["d.items.list.element.name"]["dlevels"]
    assert got_name.reps.tolist() == ref["d.items.list.element.name"]["rlevels"]
    got_vals = streams[("d", "items", "list", "element", "vals", "list", "element")]
    key = "d.items.list.element.vals.list.element"
    assert got_vals.defs.tolist() == ref[key]["dlevels"]
    assert got_vals.reps.tolist() == ref[key]["rlevels"]


def test_sliced_arrays_through_dremel_and_writer(tmp_path):
    """Ray blocks slice arrays routinely; offsets must be honored everywhere."""
    from parquet_go_ray.sources.dremel import (assemble_column, fix_levels,
                                               node_from_arrow, shred_column)

    deep = NESTED_CASES["deep"].column(0).combine_chunks()
    extra = pa.concat_arrays([deep, deep])
    for lo, ln in [(1, 4), (2, 3), (3, 2), (0, 6)]:
        sl = extra.slice(lo, ln)
        node = node_from_arrow(pa.field("c", sl.type))
        fix_levels(node)
        smap = {tuple(s.path): {"reps": s.reps, "defs": s.defs, "values": s.values}
                for s in shred_column(sl, node)}
        assert assemble_column(node, smap).equals(sl), (lo, ln)
    t = pa.table({"c": extra.slice(1, 5)})
    p = str(tmp_path / "sliced.parquet")
    pcq.write_parquet_with_our_kernels(t, p)
    assert pq.read_table(p).cast(t.schema).equals(t)


def test_extended_leaf_types_both_directions(tmp_path):
    """int8/uint16/uint64/time32/time64 + dictionary columns survive both
    writer->pyarrow and pyarrow->reader."""
    t = pa.table({
        "i8": pa.array([1, None, -3], pa.int8()),
        "u16": pa.array([1, 65535, None], pa.uint16()),
        "u64": pa.array([2**63, 1, None], pa.uint64()),
        "t32": pa.array([1000, None, 2000], pa.time32("ms")),
        "t64": pa.array([10**6, None, 5], pa.time64("us")),
    })
    p1 = str(tmp_path / "w.parquet")
    pcq.write_parquet_with_our_kernels(t, p1)
    assert pq.read_table(p1).cast(t.schema).equals(t)
    p2 = str(tmp_path / "r.parquet")
    pq.write_table(t, p2)
    assert pcq.read_parquet_with_our_kernels(p2).cast(t.schema).equals(t)

    d = pa.array(["a", "b", "a", None, "c"]).dictionary_encode()
    td = pa.table({"d": d})
    p3 = str(tmp_path / "d.parquet")
    pcq.write_parquet_with_our_kernels(td, p3)
    exp = pa.table({"d": d.cast(pa.string())})
    assert pq.read_table(p3).cast(exp.schema).equals(exp)


def test_write_column_chunk_statistics(tmp_path):
    """Column-chunk Statistics (min/max/null_count) in emitted files — the
    reference writes these per chunk (stats.go:22-225, chunk_writer.go:283-290)
    so external engines can prune row groups. pyarrow must surface them and
    DuckDB must zone-map-prune on them."""
    import re

    import duckdb
    import numpy as np

    n = 10000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "f": pa.array(np.arange(n, dtype=np.float64) / 7.0),
        "s": pa.array([f"key-{i:06d}" for i in range(n)]),
        "b": pa.array((np.arange(n) % 2 == 0)),
        "opt": pa.array([None if i % 10 == 0 else i for i in range(n)],
                        type=pa.int32()),
    })
    p = str(tmp_path / "stats.parquet")
    write_parquet_with_our_kernels(t, p, compression="snappy", row_group_rows=1000)
    meta = pq.ParquetFile(p).metadata
    assert meta.num_row_groups == 10
    for rg in range(meta.num_row_groups):
        lo, hi = rg * 1000, rg * 1000 + 999
        by_name = {meta.row_group(rg).column(j).path_in_schema:
                   meta.row_group(rg).column(j).statistics
                   for j in range(meta.num_columns)}
        assert (by_name["k"].min, by_name["k"].max) == (lo, hi)
        assert by_name["k"].null_count == 0
        assert by_name["f"].max == hi / 7.0
        assert (by_name["s"].min, by_name["s"].max) == (f"key-{lo:06d}", f"key-{hi:06d}")
        assert by_name["b"].min is False and by_name["b"].max is True
        assert by_name["opt"].null_count == 100
    # DuckDB zone-map pruning: the scan's estimated cardinality comes from the
    # row groups that SURVIVE min/max pruning — 2 groups (2500..2600 straddles
    # a boundary), not all 10
    txt = "\n".join(r[1] for r in duckdb.sql(
        f"EXPLAIN ANALYZE SELECT count(*) FROM read_parquet('{p}') "
        "WHERE k BETWEEN 2500 AND 2600").fetchall())
    ec = int(re.search(r"EC:\s*(\d+)", txt).group(1))
    assert ec == 2000, f"expected 2 surviving row groups (EC 2000), got EC {ec}"
    # filtered result still correct
    got = duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}') "
                     "WHERE k BETWEEN 2500 AND 2600").fetchone()[0]
    assert got == 101


def test_statistics_float_nan_and_zero(tmp_path):
    """NaNs are excluded from float bounds; all-NaN chunks omit min/max; zero
    bounds widen to -0.0/+0.0 per the spec's recommendation."""
    import math

    t = pa.table({
        "f": pa.array([float("nan"), 1.5, -2.0, float("nan")], pa.float64()),
        "g": pa.array([float("nan")] * 4, pa.float64()),
        "z": pa.array([0.0, -0.0, 0.0, -0.0], pa.float64()),
    })
    p = str(tmp_path / "nan.parquet")
    write_parquet_with_our_kernels(t, p, compression=None)
    st = {pq.ParquetFile(p).metadata.row_group(0).column(j).path_in_schema:
          pq.ParquetFile(p).metadata.row_group(0).column(j).statistics
          for j in range(3)}
    assert (st["f"].min, st["f"].max) == (-2.0, 1.5)
    assert not st["g"].has_min_max
    assert math.copysign(1, st["z"].min) == -1.0
    assert math.copysign(1, st["z"].max) == 1.0


# ---------------------------------------------------- streaming writer (r4)
def test_stream_writer_incremental_row_groups(tmp_path):
    from parquet_go_ray.sources.parquet_compat import ParquetStreamWriter

    p = str(tmp_path / "stream.parquet")
    t = _table(3000)
    with ParquetStreamWriter(p, compression="snappy") as w:
        # caller-driven FlushRowGroup: three explicit row groups
        for lo in (0, 1000, 2000):
            w.add_table(t.slice(lo, 1000))
            w.flush_row_group()
    back = pq.read_table(p)
    assert back.num_rows == 3000
    assert pq.ParquetFile(p).num_row_groups == 3
    for name in t.column_names:
        a = back.column(name).combine_chunks()
        b = t.column(name).combine_chunks()
        if pa.types.is_binary(a.type) and pa.types.is_string(b.type):
            a = a.cast(pa.string())
        assert a.equals(b), name
    # DuckDB agrees
    assert duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0] == 3000


def test_stream_writer_auto_rowgroup_split_matches_oneshot(tmp_path):
    from parquet_go_ray.sources.parquet_compat import ParquetStreamWriter

    t = _table(2500)
    p1 = str(tmp_path / "a.parquet")
    with ParquetStreamWriter(p1, compression="zstd", row_group_rows=700) as w:
        # add in awkward increments; auto-flush must slice at exactly 700
        for lo in range(0, 2500, 600):
            w.add_table(t.slice(lo, 600))
    p2 = str(tmp_path / "b.parquet")
    write_parquet_with_our_kernels(t, p2, compression="zstd", row_group_rows=700)
    f1, f2 = pq.ParquetFile(p1), pq.ParquetFile(p2)
    assert f1.num_row_groups == f2.num_row_groups == 4  # 700*3 + 400
    assert pq.read_table(p1).equals(pq.read_table(p2))


def test_stream_writer_schema_mismatch_and_empty(tmp_path):
    import pytest as _pytest

    from parquet_go_ray.sources.parquet_compat import ParquetStreamWriter

    p = str(tmp_path / "s.parquet")
    w = ParquetStreamWriter(p)
    w.add_table(pa.table({"x": pa.array([1, 2], pa.int64())}))
    with _pytest.raises(ValueError, match="schema mismatch"):
        w.add_table(pa.table({"x": pa.array([1.0])}))
    w.close()
    assert pq.read_table(p).num_rows == 2

    # zero-row stream still produces a readable file with the schema
    p0 = str(tmp_path / "empty.parquet")
    with ParquetStreamWriter(p0) as w0:
        w0.add_table(pa.table({"x": pa.array([], pa.int64())}))
    back = pq.read_table(p0)
    assert back.num_rows == 0 and back.schema.names == ["x"]

    # no schema at all -> close() refuses
    w2 = ParquetStreamWriter(str(tmp_path / "none.parquet"))
    with _pytest.raises(ValueError, match="no schema"):
        w2.close()
