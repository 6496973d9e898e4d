"""Round-5 third review batch (durability layer: partfile / fsio /
manifest), each finding pinned."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.sources import fsio, partfile
from parquet_go_ray.sources.columns import EncodeConfig
from parquet_go_ray.state import manifest as mf

RNG = np.random.default_rng(55)


def test_dictionary_page_on_decimal_and_flba(tmp_path):
    # kind 'fixed_bytes' used to fall through to decode_fixed('fixed:16')
    # and crash with KeyError — breaking eq_filter dict pruning on decimals
    import decimal

    vals = [decimal.Decimal("12.3456"), decimal.Decimal("-7.8900")] * 50
    t = pa.table({"d": pa.array(vals, pa.decimal128(20, 4)),
                  "b": pa.array([b"ab" * 8, b"cd" * 8] * 50,
                                pa.binary(16))})
    p = str(tmp_path / "x.rdpg")
    partfile.write_partition(t, p)
    for col in ("d", "b"):
        dv = partfile.read_dictionary_page(p, col)
        if dv is not None:  # DICT chosen for these low-cardinality columns
            assert len(dv) == 2


def test_dictionary_page_unsigned_values_not_reinterpreted(tmp_path):
    # uint32 dict values >= 2^31 came back negative (signed class view)
    big = np.array([3_000_000_000, 5, 3_000_000_000, 5] * 30, dtype=np.uint32)
    t = pa.table({"u": pa.array(big)})
    p = str(tmp_path / "u.rdpg")
    partfile.write_partition(t, p, EncodeConfig(column_codecs={"u": "DICT"}))
    dv = partfile.read_dictionary_page(p, "u")
    assert dv is not None
    assert sorted(dv.to_pylist()) == [5, 3_000_000_000]


def test_dictionary_page_crc_checked(tmp_path):
    t = pa.table({"s": pa.array(["a", "b"] * 100)})
    p = str(tmp_path / "c.rdpg")
    partfile.write_partition(t, p)
    footer = partfile.read_partition_footer(p)
    meta = next(s for s in footer["streams"] if s["path"] == "s")
    assert meta.get("dict"), "expected DICT for the low-cardinality column"
    off = meta["dict"]["offset"]
    with open(p, "r+b") as f:
        f.seek(off)
        b = f.read(1)
        f.seek(off)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="CRC mismatch.*dict page"):
        partfile.read_dictionary_page(p, "s")


def test_torn_record_with_invalid_utf8_does_not_brick_resume(tmp_path):
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    out = str(tmp_path / "run")
    rec = partfile.write_partition(t, fsio.join(out, "part-a.rdpg"))
    rec["partition_id"] = "a"
    rec["path"] = fsio.join(out, "part-a.rdpg")
    mf.write_record(out, rec)
    # torn record: raw bytes that are not valid UTF-8
    with open(fsio.join(out, "_manifest", "torn.json"), "wb") as f:
        f.write(b"\xff\xfe\x00garbage")
    recs = mf.load_records(out)
    assert [r["partition_id"] for r in recs] == ["a"]
    assert mf.completed_ids(out) == {"a"}


def test_verify_crc_retires_corrupt_merged_record(tmp_path):
    t = pa.table({"x": pa.array(np.arange(100, dtype=np.int64))})
    out = str(tmp_path / "run2")
    rec = partfile.write_partition(t, fsio.join(out, "part-m.rdpg"))
    rec["partition_id"] = "m"
    rec["path"] = fsio.join(out, "part-m.rdpg")
    rec["covers"] = ["orig-1", "orig-2"]
    mf.write_record(out, rec)
    # rot the merged file: verify_crc must retire the record so re-encoded
    # replacements are no longer hidden behind its covers
    with open(rec["path"], "r+b") as f:
        f.seek(50)
        f.write(b"\x00\x01\x02")
    done = mf.completed_ids(out, verify_crc=True)
    assert done == set()
    assert mf.load_records(out) == []  # record retired; file left for fsck


def test_file_size_missing_object_store_path_raises_not_found():
    with pytest.raises(FileNotFoundError):
        fsio.file_size("mock://bucket/nope/missing.rdpg")


def test_forced_bytes_codecs_on_zero_row_and_plain_alias(tmp_path):
    # hypothesis (random seed) found: forced FSST_BA on a zero-row string
    # column crashed (no table trained), and forced "PLAIN" on bytes
    # raised 'unknown bytes codec' at page time instead of aliasing to
    # PLAIN_BA like every other stream kind spells it
    t0 = pa.table({"x": pa.array([], pa.string())})
    for codec in ("FSST_BA", "PLAIN", "DELTA_BA", "DELTA_LENGTH_BA", "DICT"):
        blob, _ = partfile.encode_table(
            t0, EncodeConfig(column_codecs={"x": codec}))
        assert partfile.decode_table(blob).equals(t0), codec
    t1 = pa.table({"x": pa.array(["aa", "bb"])})
    blob, rec = partfile.encode_table(
        t1, EncodeConfig(column_codecs={"x": "PLAIN"}))
    assert rec["codecs"]["x"] == "PLAIN_BA"
    with pytest.raises(ValueError, match="unknown bytes codec"):
        partfile.encode_table(t1, EncodeConfig(column_codecs={"x": "NOPE"}))
