"""Split-block Bloom filters (sources/bloom.py) + eq_filter partition
pruning (pipelines/encode.decode_dataset).

The reference prunes row groups by min/max only (file_reader.go:275-277);
the Bloom path is the extension that makes equality point-lookups prune on
high-cardinality columns where stats can't.
"""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.sources import bloom, partfile
from parquet_go_ray.sources.columns import EncodeConfig

RNG = np.random.default_rng(42)


def test_no_false_negatives_ints_and_strings():
    ids = RNG.integers(0, 10 ** 12, 5000)
    blob = bloom.build(pa.chunked_array([pa.array(ids)]))
    assert bloom.maybe_contains(blob, pa.array(ids)).all()
    strs = pa.array([f"doc-{i}" for i in range(3000)])
    blob2 = bloom.build(pa.chunked_array([strs]))
    assert bloom.maybe_contains(blob2, strs).all()


def test_false_positive_rate_near_one_percent():
    # INTERLEAVED present/absent values (evens in, odds out): before the
    # fmix64 avalanche, colhash's linear int hash funneled every small int
    # into block 0 — a disjoint-range absent set passed while interleaved
    # values read 100% false-positive. This shape pins the fix.
    present = np.arange(0, 100000, 2, dtype=np.int64)
    blob = bloom.build(pa.chunked_array([pa.array(present)]))
    absent = np.arange(1, 100000, 2, dtype=np.int64)
    fp = bloom.maybe_contains(blob, pa.array(absent)).mean()
    assert fp < 0.03, fp  # sized at ~10 bits/value ≈ 1% design point
    # and block occupancy is actually spread (the funnel saturated ONE block)
    words = np.frombuffer(blob, np.uint32).reshape(-1, 8)
    occupied = (words != 0).any(axis=1).mean()
    assert occupied > 0.9


def test_nulls_ignored_and_empty_column():
    blob = bloom.build(pa.chunked_array([pa.array([1, None, 2], pa.int64())]))
    assert bloom.maybe_contains(blob, pa.array([1, 2])).all()
    blob0 = bloom.build(pa.chunked_array([pa.array([], pa.int64())]))
    assert not bloom.maybe_contains(blob0, pa.array([7])).any()


def test_binary_values_hash_without_utf8_validation():
    raw = pa.array([b"\xff\xfe\x00", b"ok", b"\x80" * 40], pa.binary())
    blob = bloom.build(pa.chunked_array([raw]))
    assert bloom.maybe_contains(blob, raw).all()


def test_malformed_blob_rejected():
    with pytest.raises(ValueError):
        bloom.maybe_contains(b"\x00" * 33, pa.array([1]))
    with pytest.raises(ValueError):
        bloom.maybe_contains(b"", pa.array([1]))


def test_footer_records_bloom_and_probe_roundtrip(tmp_path):
    t = pa.table({
        "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
        "text": pa.array([f"t{i}" for i in range(1000)]),
    })
    p = str(tmp_path / "part.rdpg")
    partfile.write_partition(t, p, EncodeConfig(bloom_columns=("doc_id",)))
    footer = partfile.read_partition_footer(p)
    assert "doc_id" in footer["blooms"]
    b = footer["blooms"]["doc_id"]
    from parquet_go_ray.sources import fsio

    blob = fsio.read_range(p, b["offset"], b["size"])
    assert bloom.maybe_contains(blob, pa.array([0, 500, 999])).all()
    # decoded data is untouched by the extra blob
    assert partfile.read_partition(p).equals(t)


def test_bloom_columns_validation():
    t = pa.table({"x": pa.array([1.5, 2.5])})
    with pytest.raises(ValueError, match="no such column"):
        partfile.encode_table(t, EncodeConfig(bloom_columns=("nope",)))
    with pytest.raises(ValueError, match="int/string/binary"):
        partfile.encode_table(t, EncodeConfig(bloom_columns=("x",)))


def test_eq_filter_prunes_partitions_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    out = str(tmp_path / "run")
    n = 40000
    # shuffled high-cardinality ids: every partition's [min,max] spans the
    # space, so stats alone cannot prune — only the Bloom can
    ids = RNG.permutation(n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "payload": pa.array(RNG.integers(0, 100, n))})
    ds = rd.from_arrow(t).repartition(8)
    encode_dataset(ds, out, EncodeConfig(bloom_columns=("doc_id",)),
                   batch_rows=5000).materialize()

    target = int(ids[12345])
    full = decode_dataset(out)
    hit = decode_dataset(out, eq_filter={"doc_id": target})
    # correctness: the row is found
    got = hit.to_pandas()
    row = got[got.doc_id == target]
    assert len(row) == 1
    # pruning: strictly fewer input files than the full read
    n_files_full = full.input_files() if hasattr(full, "input_files") else None
    assert hit.count() < t.num_rows  # decoded a strict subset of rows

    # absent key: every partition pruned (with ~1% fpp over 8 partitions an
    # occasional survivor is legal; assert at most one survives)
    miss = decode_dataset(out, eq_filter={"doc_id": 10 ** 15})
    assert miss.count() <= 5000


def test_eq_filter_multi_value_and_no_bloom_fallback(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    out = str(tmp_path / "run2")
    t = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64)),
                  "v": pa.array(np.arange(1000, dtype=np.int64) * 2)})
    # no bloom_columns: eq_filter must still work via stats envelope
    encode_dataset(rd.from_arrow(t), out, batch_rows=100).materialize()
    got = decode_dataset(out, eq_filter={"k": [5, 950]}).to_pandas()
    assert {5, 950} <= set(got.k)
    # sorted ids -> stats prune to ~2 partitions of 100 rows
    assert len(got) <= 300
    with pytest.raises(TypeError):
        decode_dataset(out, eq_filter=[("k", 5)])
    with pytest.raises(ValueError, match="null"):
        decode_dataset(out, eq_filter={"k": pa.array([1, None])})


def test_compaction_inherits_bloom_columns(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.compact import compact_partitions
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquet_go_ray.sources.partfile import read_partition_footer
    from parquet_go_ray.state import manifest as mf

    out = str(tmp_path / "run3")
    ids = RNG.permutation(8000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "v": pa.array(RNG.integers(0, 9, 8000))})
    encode_dataset(rd.from_arrow(t), out,
                   EncodeConfig(bloom_columns=("doc_id",)),
                   batch_rows=1000).materialize()
    # DEFAULT config compaction must keep the filters on merged partitions
    res = compact_partitions(out, target_bytes=1 << 30)
    assert res["merged_files"] >= 1
    for r in mf.drop_covered(mf.load_records(out)):
        footer = read_partition_footer(r["path"])
        assert "doc_id" in (footer.get("blooms") or {}), r["path"]
    target = int(ids[7])
    got = decode_dataset(out, eq_filter={"doc_id": target}).to_pandas()
    assert (got.doc_id == target).sum() == 1


def test_cli_encode_bloom_flag(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from parquet_go_ray.cli import main as cli_main
    from parquet_go_ray.sources.partfile import read_partition_footer
    from parquet_go_ray.state import manifest as mf

    src = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64)),
                             "text": pa.array([f"d{i}" for i in range(500)])}), src)
    out = str(tmp_path / "enc")
    cli_main(["encode", src, out, "--bloom", "doc_id"])
    recs = mf.drop_covered(mf.load_records(out))
    assert recs
    footer = read_partition_footer(recs[0]["path"])
    assert "doc_id" in footer["blooms"]


def test_eq_filter_exact_prune_via_dictionary_page(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    out = str(tmp_path / "run4")
    # low-cardinality string column -> DICT encoding; values are assigned
    # round-robin so every partition's [min,max] spans all sources — stats
    # cannot prune, but each 1000-row batch holds only a FEW sources after
    # sorting, and the dictionary page gives an exact membership test
    n = 8000
    srcs = pa.array([f"src-{i % 8:02d}" for i in range(n)])
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "source": srcs})
    ds = rd.from_arrow(t).sort("source")
    encode_dataset(ds, out, batch_rows=1000).materialize()
    got = decode_dataset(out, eq_filter={"source": "src-03"}).to_pandas()
    assert (got.source == "src-03").sum() == n // 8
    # exactness: only partitions that truly hold src-03 were decoded
    assert len(got) <= 2000


def test_eq_filter_typo_column_raises(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    out = str(tmp_path / "run5")
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    encode_dataset(rd.from_arrow(t), out).materialize()
    with pytest.raises(ValueError, match="no such column"):
        decode_dataset(out, eq_filter={"kk": 1}).count()


def test_corrupt_bloom_fails_loudly_not_false_negative(ray_session, tmp_path):
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquet_go_ray.sources.partfile import read_partition_footer
    from parquet_go_ray.state import manifest as mf

    out = str(tmp_path / "run6")
    ids = RNG.permutation(4000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    encode_dataset(rd.from_arrow(t), out,
                   EncodeConfig(bloom_columns=("doc_id",)),
                   batch_rows=1000).materialize()
    # clear one byte inside a bloom blob: without the CRC this reads as
    # "key absent" and the partition's rows silently vanish from lookups
    r = mf.drop_covered(mf.load_records(out))[0]
    footer = read_partition_footer(r["path"])
    b = footer["blooms"]["doc_id"]
    with open(r["path"], "r+b") as f:
        f.seek(b["offset"] + 17)
        f.write(b"\x00")
    with pytest.raises(Exception, match="CRC mismatch.*bloom"):
        decode_dataset(out, eq_filter={"doc_id": int(ids[0])}).count()


def test_point_lookup_api_and_cli(ray_session, tmp_path, capsys):
    import ray.data as rd

    from parquet_go_ray.cli import main as cli_main
    from parquet_go_ray.pipelines.encode import encode_dataset, point_lookup

    out = str(tmp_path / "run7")
    ids = RNG.permutation(6000).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array([f"d{i}" for i in ids])})
    encode_dataset(rd.from_arrow(t), out,
                   EncodeConfig(bloom_columns=("doc_id",)),
                   batch_rows=1000).materialize()
    got = point_lookup(out, "doc_id", [10, 20, 4999])
    assert sorted(got.column("doc_id").to_pylist()) == [10, 20, 4999]
    assert got.column("text").to_pylist() is not None
    # projection that drops the key column from the OUTPUT but not the filter
    got2 = point_lookup(out, "doc_id", 10, columns=["text"])
    assert got2.column_names == ["text"] and got2.num_rows == 1
    # absent value -> typed empty table
    got3 = point_lookup(out, "doc_id", 999_999_999)
    assert got3.num_rows == 0 and "doc_id" in got3.column_names
    # CLI
    cli_main(["lookup", out, "--col", "doc_id", "--values", "10,20"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2
