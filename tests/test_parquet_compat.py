"""Bitstream conformance: decode REAL parquet files (written by pyarrow with
pinned encodings) using our kernels only — the sandbox stand-in for the
reference's apache/parquet-testing + Impala corpora tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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
