"""Ray Data encode/decode pipeline tests over the driver testdata."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from parquet_go_ray.pipelines.encode import (
    decode_dataset,
    encode_dataset,
    encode_grouped,
    plan_salts,
)
from parquet_go_ray.sources.columns import EncodeConfig
from parquet_go_ray.state import manifest as mf

SF = "/root/testdata/sf0.001"


def _sorted_pandas(ds, key):
    df = ds.to_pandas()
    return df.sort_values(key).reset_index(drop=True)


def test_encode_decode_lineitem(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/lineitem.parquet")
    lineage = encode_dataset(src, out, batch_rows=1000).to_pandas()
    assert lineage.num_rows.sum() == 6000
    assert (lineage.bytes_out > 0).all()
    totals = mf.finalize(out)
    assert totals["num_rows"] == 6000

    decoded = decode_dataset(out)
    want = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    keys = list(want.columns.drop("l_shipdate"))
    got = _sorted_pandas(decoded, keys)
    want = want.sort_values(keys).reset_index(drop=True)
    assert got.shape == want.shape
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)


def test_encode_decode_projection(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/orders.parquet")
    encode_dataset(src, out, batch_rows=500).materialize()
    decoded = decode_dataset(out, columns=["o_orderkey", "o_totalprice"])
    df = decoded.to_pandas()
    assert list(df.columns) == ["o_orderkey", "o_totalprice"]
    want = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]).to_pandas()
    np.testing.assert_array_equal(
        np.sort(df.o_totalprice.to_numpy()), np.sort(want.o_totalprice.to_numpy())
    )


def test_grouped_encode_with_salt_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/documents.parquet")
    salts = plan_salts(src, "source", target_partition_bytes=16 * 1024)
    assert all(v >= 1 for v in salts.values())

    lineage = encode_grouped(
        src, out, key="source", target_partition_bytes=16 * 1024
    ).to_pandas()
    assert lineage.num_rows.sum() == 500
    ids = set(lineage.partition_id)
    assert all("-" in pid for pid in ids)

    # resume: second run skips every completed partition (bytes_out == 0 marker)
    lineage2 = encode_grouped(
        src, out, key="source", target_partition_bytes=16 * 1024
    ).to_pandas()
    assert (lineage2.bytes_out == 0).all()
    assert set(lineage2.partition_id) == ids

    decoded = decode_dataset(out).to_pandas()
    want = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert sorted(decoded.doc_id) == sorted(want.doc_id)
    got = decoded.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)


def test_encode_idempotent_partition_ids(ray_session, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    src = rd.read_parquet(f"{SF}/nation.parquet")
    l1 = encode_dataset(src, out1, batch_rows=25).to_pandas()
    l2 = encode_dataset(src, out2, batch_rows=25).to_pandas()
    # deterministic content-hash ids: same input + config -> same ids
    assert set(l1.partition_id) == set(l2.partition_id)


def test_events_timestamps_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/events.parquet")
    encode_dataset(src, out, batch_rows=400).materialize()
    got = decode_dataset(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/events.parquet").to_pandas().sort_values("event_id").reset_index(drop=True)
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)


def test_embeddings_list_float_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/embeddings.parquet")
    encode_dataset(src, out, batch_rows=200).materialize()
    got = decode_dataset(out).to_pandas().sort_values("vec_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id").reset_index(drop=True)
    np.testing.assert_array_equal(got.vec_id.to_numpy(), want.vec_id.to_numpy())
    ga = np.stack(got.embedding.to_numpy())
    wa = np.stack(want.embedding.to_numpy())
    np.testing.assert_array_equal(ga, wa)


def test_verify_roundtrip_pipeline(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquet_go_ray.pipelines.queries import token_table_dataset
    from parquet_go_ray.pipelines.verify import verify_roundtrip

    out = str(tmp_path / "enc")
    src = token_table_dataset(SF)
    encode_dataset(src, out, batch_rows=200).materialize()
    res = verify_roundtrip(token_table_dataset(SF), decode_dataset(out))
    assert res == {"rows": 500, "mismatches": 0, "missing": 0}

    # sabotage one decoded row -> must be detected
    def corrupt(batch: pa.Table) -> pa.Table:
        import numpy as np

        arr = batch.column("tokens").combine_chunks()
        vals = np.asarray(arr.values).copy()
        if len(vals):
            vals[0] += 1
        tokens = pa.ListArray.from_arrays(arr.offsets, pa.array(vals, type=pa.int32()))
        return batch.set_column(batch.schema.get_field_index("tokens"), "tokens", tokens)

    bad = decode_dataset(out).map_batches(corrupt, batch_format="pyarrow")
    res2 = verify_roundtrip(token_table_dataset(SF), bad)
    assert res2["mismatches"] > 0


def test_partitioned_encode_and_compaction(ray_session, tmp_path):
    from parquet_go_ray.pipelines.compact import compact_partitions, plan_compaction
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_partitioned

    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/documents.parquet")
    lineage = encode_partitioned(src, out, key="source", batch_rows=100).to_pandas()
    assert lineage.num_rows.sum() == 500
    assert len(lineage) > 20  # one file per (source, batch)
    recs = mf.load_records(out)
    assert all("key" in r for r in recs)

    plan = plan_compaction(out, target_bytes=1 << 20)
    assert plan  # plenty of small files
    res = compact_partitions(out, target_bytes=1 << 20)
    assert res["merged_files"] > 0
    after = mf.load_records(out)
    assert len(after) < len(recs)

    got = decode_dataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/documents.parquet").to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 500
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)


def test_ray_datasource_read(ray_session, tmp_path):
    from parquet_go_ray.pipelines.encode import encode_dataset
    from parquet_go_ray.sources.ray_datasource import read_rdpg

    out = str(tmp_path / "enc")
    encode_dataset(rd.read_parquet(f"{SF}/nation.parquet"), out, batch_rows=10).materialize()
    ds = read_rdpg(out)
    df = ds.to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    want = pq.read_table(f"{SF}/nation.parquet").to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    for col in want.columns:
        np.testing.assert_array_equal(df[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    # projection pushdown
    dfp = read_rdpg(out, columns=["n_name"]).to_pandas()
    assert list(dfp.columns) == ["n_name"]


def test_grouped_encode_without_salt_column(ray_session, tmp_path):
    """encode_grouped on a table lacking the salt column (events has no
    doc_id): the salt falls back to row position; roundtrip must hold."""
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_grouped

    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/events.parquet")
    lineage = encode_grouped(src, out, key="event_type",
                             target_partition_bytes=32 * 1024, resume=False).to_pandas()
    assert lineage.num_rows.sum() == 1000
    got = decode_dataset(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/events.parquet").to_pandas().sort_values("event_id").reset_index(drop=True)
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)


def test_all_empty_lists_roundtrip(ray_session, tmp_path):
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    t = pa.table({
        "id": pa.array(np.arange(50, dtype=np.int64)),
        "l": pa.array([[] for _ in range(50)], type=pa.list_(pa.int32())),
    })
    out = str(tmp_path / "enc")
    encode_dataset(rd.from_arrow(t), out, batch_rows=10).materialize()
    got = decode_dataset(out).to_pandas()
    assert len(got) == 50
    assert got.l.map(len).eq(0).all()


def test_string_stats_pruning(ray_session, tmp_path):
    """bytes-stream min/max stats enable partition pruning on string keys."""
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquet_go_ray.sources.partfile import partition_stats
    from parquet_go_ray.state import manifest as mfx

    out = str(tmp_path / "enc")
    src = rd.read_parquet(f"{SF}/customer.parquet").sort("c_name")
    encode_dataset(src, out, batch_rows=30).materialize()
    recs = mfx.load_records(out)
    st = partition_stats(recs[0]["path"])
    assert st["c_name"].get("min") is not None

    pruned = decode_dataset(out, stats_filter={"c_name": ("Customer#000000001",
                                                          "Customer#000000050")})
    full = decode_dataset(out)
    assert pruned.count() < full.count()


def test_verify_roundtrip_trailing_empty_list(ray_session):
    """_row_hashes must survive an empty token list in the LAST row of a batch
    (reduceat used to IndexError there — ADVICE r1)."""
    from parquet_go_ray.pipelines.verify import _row_hashes, verify_roundtrip

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "tokens": pa.array([[1, 2], [3], []], type=pa.list_(pa.int32())),
    })
    h = _row_hashes(t, "doc_id", "tokens")
    assert h.num_rows == 3
    # empty rows hash equal regardless of position
    t2 = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "tokens": pa.array([[], [1, 2], [3]], type=pa.list_(pa.int32())),
    })
    h2 = _row_hashes(t2, "doc_id", "tokens")
    m1 = dict(zip(h.column("doc_id").to_pylist(), h.column("__rh").to_pylist()))
    m2 = dict(zip(h2.column("doc_id").to_pylist(), h2.column("__rh").to_pylist()))
    assert m1[3] == m2[1] and m1[1] == m2[2] and m1[2] == m2[3]

    res = verify_roundtrip(rd.from_arrow(t), rd.from_arrow(t), num_partitions=4)
    assert res == {"rows": 3, "mismatches": 0, "missing": 0}


def test_manifest_torn_record_skipped(tmp_path):
    """A zero-length or truncated manifest record re-encodes one partition, it
    must not brick resume (ADVICE r1)."""
    from parquet_go_ray.state import manifest as mfx

    out = str(tmp_path)
    mfx.write_record(out, {"partition_id": "p0", "path": str(tmp_path / "x"),
                           "num_rows": 1, "bytes_in": 1, "bytes_out": 1, "crc32": 0})
    # torn records
    open(mfx.record_path(out, "p1"), "w").close()
    with open(mfx.record_path(out, "p2"), "w") as f:
        f.write('{"partition_id": "p2", "num_ro')
    recs = mfx.load_records(out)
    assert [r["partition_id"] for r in recs] == ["p0"]
    assert mfx.completed_ids(out) == set()  # p0's path doesn't exist on disk


def test_stable_hash_bounded_memory_large_doc():
    """One 1 MB string in a 10k-row batch must hash in O(total_bytes), not
    O(n * maxlen) padded-matrix memory (VERDICT r1 #5)."""
    import time

    from parquet_go_ray.pipelines.encode import _stable_hash

    big = ["x"] * 10_000
    big[5_000] = "y" * (1 << 20)
    arr = pa.chunked_array([pa.array(big)])
    t0 = time.time()
    h = _stable_hash(arr)
    assert time.time() - t0 < 10  # padded matrix would OOM/stall (~80 GB)
    assert h[0] == h[1] and h[0] != h[5_000]
    # deterministic + position/chunk independent
    h2 = _stable_hash(pa.chunked_array([pa.array(["y" * (1 << 20), "x"])]))
    assert h2[0] == h[5_000] and h2[1] == h[0]


def test_decode_stage_memory_cap(ray_session, tmp_path):
    """Oversized partitions fail fast with a clear error (alloc.go role)."""
    from parquet_go_ray.sources.columns import EncodeConfig
    from parquet_go_ray.sources.partfile import write_partition
    from parquet_go_ray.stages.codec import DecodeStage

    t = pa.table({"a": pa.array(np.arange(10_000, dtype=np.int64))})
    p = str(tmp_path / "part-x.rdpg")
    write_partition(t, p, EncodeConfig())
    batch = pa.table({"path": [p]})
    # generous cap decodes fine
    out = DecodeStage(max_partition_bytes=10 << 20)(batch)
    assert out.num_rows == 10_000
    with pytest.raises(ValueError, match="task cap"):
        DecodeStage(max_partition_bytes=1024)(batch)


def test_plan_compaction_caps_group_files(tmp_path):
    """A key with many tiny files splits into bounded parallel merge groups
    instead of one straggler (VERDICT r2 #9)."""
    from parquet_go_ray.pipelines.compact import plan_compaction
    from parquet_go_ray.state import manifest as mf

    out = str(tmp_path / "run")
    for i in range(300):
        mf.write_record(out, {"partition_id": f"p{i:04d}", "key": "hot",
                              "path": f"{out}/p{i:04d}.rdpg",
                              "num_rows": 10, "bytes_in": 100, "bytes_out": 100,
                              "crc32": 0, "codecs": {}})
    groups = plan_compaction(out, target_bytes=1 << 30, max_group_files=64)
    assert len(groups) >= 5  # 300 files / 64 cap
    assert max(len(g) for g in groups) <= 64
    assert sum(len(g) for g in groups) == 300


def test_encode_stage_batch_cap_self_splits(tmp_path):
    """Encode-side declared-bytes cap (VERDICT r2 #8 + r3 #4): an oversized
    batch SELF-SPLITS into multiple cap-sized partitions (the reference's
    incremental page-flush role, data_store.go:156-184) and roundtrips
    losslessly; only an unsplittable single row still fails fast."""
    import pyarrow as pa
    import pytest

    from parquet_go_ray.sources.partfile import read_partition
    from parquet_go_ray.stages.codec import EncodeStage

    out_dir = tmp_path / "o"
    stage = EncodeStage(str(out_dir), max_batch_bytes=4096)
    big = pa.table({"x": pa.array([f"z{i:04d}".encode() * 20 for i in range(300)])})
    assert big.nbytes > 4096
    lineage = stage(big)
    assert lineage.num_rows > 1  # multiple partitions, not a raise
    assert lineage.column("num_rows").to_pylist().count(0) == 0
    assert sum(lineage.column("num_rows").to_pylist()) == 300
    # row order preserved across the split partitions
    got = pa.concat_tables(
        [read_partition(p) for p in lineage.column("path").to_pylist()])
    assert got.equals(big)

    # under the cap: single partition
    small = pa.table({"x": pa.array([b"z"] * 10)})
    assert stage(small).num_rows == 1

    # a single row over the cap cannot split -> fail fast
    one = pa.table({"x": pa.array([b"q" * 10_000])})
    with pytest.raises(ValueError, match="cannot be split"):
        stage(one)


def test_adversarial_partition_keys_roundtrip(ray_session, tmp_path):
    """Keys with '/', unicode, percent signs, 300-char values and NULLs must
    roundtrip through BOTH keyed layouts. Regressions this pins: a '/' in an
    encode_grouped key put the partition file in a stray subdirectory
    decode_dataset never globs (silent row loss), and encode_partitioned's
    pc.equal(keys, null-scalar) filter dropped null-key rows silently."""
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import (decode_dataset,
                                                 encode_grouped,
                                                 encode_partitioned)

    keys = ["é中", "a/b", "k" * 300, "", "100%", None, "a b", "é中", None]
    t = pa.table({"source": pa.array(keys, pa.string()),
                  "v": pa.array(range(len(keys)), pa.int64())})
    for i, fn in enumerate((encode_partitioned, encode_grouped)):
        out = str(tmp_path / f"keys{i}")
        fn(rd.from_arrow(t), out, key="source").materialize()
        back = (decode_dataset(out).to_pandas()
                .sort_values("v").reset_index(drop=True))
        assert back.v.tolist() == list(range(len(keys)))
        assert back.source.tolist() == keys


def test_null_key_partition_point_lookup(ray_session, tmp_path):
    """decode_dataset(keys={None}) selects exactly the null-key partition
    (manifest tag '__null__'), and a named key selects only its own."""
    import ray.data as rd

    from parquet_go_ray.pipelines.encode import (decode_dataset,
                                                 encode_partitioned)

    t = pa.table({"source": pa.array(["a", None, "b", None], pa.string()),
                  "v": pa.array(range(4), pa.int64())})
    out = str(tmp_path / "nullkey")
    encode_partitioned(rd.from_arrow(t), out, key="source").materialize()
    assert sorted(decode_dataset(out, keys={None}).to_pandas().v) == [1, 3]
    assert sorted(decode_dataset(out, keys={"a"}).to_pandas().v) == [0]


def test_decode_missing_local_dir_raises(ray_session, tmp_path):
    """decode_dataset of a nonexistent LOCAL directory is a caller error
    (typo, failed mount) and must raise, not silently return 0 rows; an
    existing-but-empty directory still decodes to an empty Dataset."""
    from parquet_go_ray.pipelines.encode import decode_dataset

    empty = tmp_path / "empty"
    empty.mkdir()
    assert decode_dataset(str(empty)).count() == 0
    with pytest.raises(ValueError, match="does not exist"):
        decode_dataset(str(tmp_path / "nope"))
