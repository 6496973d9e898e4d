"""Round-5 code-review regression pins: each test names the reviewed defect.

1. key_tag collision: a literal '__null__' key value and the null partition
   silently shared one partition file (second group overwrote the first).
2. mp4 stts under-coverage: a table covering fewer samples than stsz slipped
   through the 'every malformed path raises' contract.
3. progressive-JPEG scan scripts silently dropped AC bands not covered by
   spectral_bands, breaking the bit-equal-to-baseline contract.
4. FLAC sample_rate wrapped modulo 2^20 into wrong-but-well-formed metadata.
5. rowcount read the whole file into memory for a footer-only answer.
"""

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def test_key_tag_injective_for_reserved_token():
    from parquet_go_ray.pipelines.encode import key_tag

    tags = [key_tag(v) for v in
            (None, "__null__", "___null__", "_null", "x", "__x", 7)]
    assert len(set(tags)) == len(tags), tags
    assert key_tag(None) == "__null__"
    assert key_tag("plain") == "plain"


def test_encode_grouped_literal_null_key_rows_survive(ray_session, tmp_path):
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_grouped

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["__null__", None, "__null__", None]),
        "text": pa.array(["a", "b", "c", "d"]),
    })
    out = str(tmp_path / "nullkey")
    # the lineage Dataset is lazy — consume it to run the encode
    encode_grouped(rd.from_arrow(t), out, key="source",
                   target_partition_bytes=1 << 20).to_pandas()
    got = decode_dataset(out).to_pandas()
    assert sorted(got.doc_id.tolist()) == [0, 1, 2, 3]
    nulls = decode_dataset(out, keys={None}).to_pandas()
    assert sorted(nulls.doc_id.tolist()) == [1, 3]
    lit = decode_dataset(out, keys={"__null__"}).to_pandas()
    assert sorted(lit.doc_id.tolist()) == [0, 2]


def test_mp4_stts_undercoverage_raises():
    from parquet_go_ray.functions.mp4box import demux_mp4, mux_mp4

    frames = [bytes([i]) * 40 for i in range(5)]
    blob = mux_mp4([{"codec": "raw ", "timescale": 30, "delta": 1,
                     "samples": frames, "width": 4, "height": 2}])
    # patch the stts entry count down: its one entry (count=5) -> count=3
    i = blob.find(b"stts")
    assert i > 0
    n_ent = struct.unpack(">I", blob[i + 8: i + 12])[0]
    assert n_ent >= 1
    cnt_off = i + 12
    cnt = struct.unpack(">I", blob[cnt_off: cnt_off + 4])[0]
    assert cnt == 5
    bad = blob[:cnt_off] + struct.pack(">I", 3) + blob[cnt_off + 4:]
    with pytest.raises(ValueError, match="stts covers fewer"):
        demux_mp4(bad)


def test_progressive_jpeg_rejects_noncovering_bands():
    from parquet_go_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

    px = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    for bad in (((1, 5),), ((1, 30), (32, 63)), ((1, 32), (32, 63)),
                ((0, 63),), ((1, 64),)):
        with pytest.raises(ValueError, match="spectral_bands"):
            encode_jpeg(px, progressive=True, spectral_bands=bad)
    # a valid multi-band partition still decodes bit-equal to baseline
    good = encode_jpeg(px, progressive=True,
                       spectral_bands=((1, 5), (6, 63)))
    base = encode_jpeg(px, progressive=False)
    assert np.array_equal(decode_jpeg(good), decode_jpeg(base))


def test_flac_sample_rate_out_of_range_raises():
    from parquet_go_ray.functions.flaccodec import decode_flac, encode_flac

    pcm = np.random.default_rng(1).integers(-1000, 1000, (256, 1)).astype(np.int64)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(pcm, 2_000_000)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(pcm, 0)
    _samples, rate, _bps = decode_flac(encode_flac(pcm, 48_000))
    assert rate == 48_000


def test_rowcount_reads_footer_only(tmp_path, capsys):
    """Tail-seek rowcount: correct on both formats, and never materializes
    the body (pinned by counting bytes read through a wrapper)."""
    from parquet_go_ray.cli import _tail_footer
    from parquet_go_ray.sources.partfile import MAGIC

    body = b"\x00" * 300_000
    footer = json.dumps({"num_rows": 42}).encode()
    p = tmp_path / "big.rdpg"
    p.write_bytes(MAGIC + body + footer
                  + struct.pack("<I", len(footer)) + MAGIC)

    reads = []

    class Counting:
        def __init__(self, f):
            self.f = f

        def seek(self, *a):
            return self.f.seek(*a)

        def read(self, n=-1):
            b = self.f.read(n)
            reads.append(len(b))
            return b

    with open(p, "rb") as f:
        got = json.loads(_tail_footer(Counting(f), MAGIC))
    assert got["num_rows"] == 42
    assert sum(reads) < 4096, f"read {sum(reads)} bytes for a footer"


# --- second review batch (state/fsio/window/shuffle/sketch) ------------------

def test_shuffle_rank_is_permutation_small_buckets(ray_session):
    """Histogram merge regression: iter_batches coalesces histogram rows
    from different blocks, and `totals[idx] += n` dropped duplicate-bucket
    updates (reproduced: 20k rows -> ~10k distinct positions). shuffle_pos
    must be a permutation of 0..n-1 at any bucket count."""
    from parquet_go_ray.ops.shuffle import deterministic_shuffle_rank

    n = 20_000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64))})).repartition(10)
    out = deterministic_shuffle_rank(ds, num_buckets=128).to_pandas()
    pos = np.sort(out.shuffle_pos.to_numpy())
    np.testing.assert_array_equal(pos, np.arange(n))


def test_windows_accept_ns_timestamps_and_null_ts(ray_session):
    """timestamp[ns] crashed all three window ops (safe cast refuses
    sub-us values); null timestamps became INT64_MIN garbage through the
    numpy path. Now: ns floors to us, null-ts rows belong to no window,
    and n_events counts ROWS (null values included) in all three shapes."""
    from parquet_go_ray.ops.window import (hopping_window, session_windows,
                                           tumbling_window)

    ts_ns = pa.array([1_000_001_234, 1_000_002_345, None, 7_200_000_000_001],
                     pa.timestamp("ns"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": ts_ns,
        "value": pa.array([1.0, None, 3.0, 4.0]),  # one NULL value
    })
    ds = rd.from_arrow(t)
    tumb = tumbling_window(ds, width_us=3_600_000_000).to_pandas()
    # 3 non-null-ts events: two in hour 0 (n_events counts the null value!)
    assert int(tumb[tumb.bucket == 0].n_events.iloc[0]) == 2
    assert len(tumb) == 2
    hop = hopping_window(ds, size_us=3_600_000_000,
                         hop_us=3_600_000_000).to_pandas()
    assert int(hop[hop.win_start == 0].n_events.iloc[0]) == 2
    assert hop.win_start.min() >= 0  # no INT64_MIN garbage window
    sess = session_windows(ds, gap_us=600_000_000).to_pandas()
    assert int(sess.n_events.sum()) == 3  # null-ts row in no session


def test_exact_quantile_threshold_q1_is_max(ray_session):
    from parquet_go_ray.ops.sketch import exact_quantile_threshold

    ds = rd.from_arrow(pa.table({"x": pa.array([5.0, 1.0, 9.0, 3.0])}))
    assert exact_quantile_threshold(ds, "x", 1.0) == 9.0
    assert exact_quantile_threshold(ds, "x", 0.0) == 1.0


def test_list_files_ignores_directories(tmp_path):
    from parquet_go_ray.sources import fsio

    (tmp_path / "real.rdpg").write_bytes(b"x")
    (tmp_path / "fake.rdpg").mkdir()
    got = fsio.list_files(str(tmp_path), ".rdpg")
    assert [p.split("/")[-1] for p in got] == ["real.rdpg"]


def test_stats_filter_rejects_non_mapping(ray_session, tmp_path):
    """A tuple like ("doc_id", ">=", 0) used to die inside the prune loop
    with an opaque AttributeError; the mapping contract is now validated
    up front with the expected shape in the message."""
    import pytest

    from parquet_go_ray.pipelines.encode import decode_dataset, encode_dataset

    out = str(tmp_path / "sf")
    encode_dataset(
        rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64())})),
        out).materialize()
    with pytest.raises(TypeError, match="stats_filter must be a mapping"):
        decode_dataset(out, stats_filter=("doc_id", ">=", 0))
    # the documented mapping shape still works, combined with projection
    got = decode_dataset(out, columns=["doc_id"],
                         stats_filter={"doc_id": (2, None)}).to_pandas()
    assert got.doc_id.tolist() == [1, 2] or got.doc_id.tolist() == [2]


def test_compaction_preserves_empty_and_null_keys(ray_session, tmp_path):
    """compact_partitions groups records by key; an empty-string key is
    falsy and a null key rides the reserved '__null__' tag — both must
    survive a merge with their manifest key intact so decode_dataset
    point-lookups keep working after compaction."""
    import glob

    from parquet_go_ray.pipelines.compact import compact_partitions
    from parquet_go_ray.pipelines.encode import (decode_dataset,
                                                 encode_partitioned)

    out = str(tmp_path / "keyed")
    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "source": pa.array(["", None] * 6),
    })
    encode_partitioned(rd.from_arrow(t).repartition(6), out,
                       key="source").materialize()
    assert len(glob.glob(out + "/part-*.rdpg")) == 12
    r = compact_partitions(out, target_bytes=1 << 20)
    assert r["merged_files"] == 12 and len(glob.glob(out + "/part-*.rdpg")) == 2
    assert decode_dataset(out).count() == 12
    empties = decode_dataset(out, keys={""}).to_pandas()
    nulls = decode_dataset(out, keys={None}).to_pandas()
    assert len(empties) == 6 and set(empties.source) == {""}
    assert len(nulls) == 6 and nulls.source.isna().all()


def test_resume_after_compaction_does_not_duplicate(ray_session, tmp_path):
    """compact_partitions renames partitions to content-hash ids; resume
    keys on the original '<key>-<salt>' ids. Without the merged record's
    ``covers`` list, a resume re-run after compaction re-encoded every
    group and silently DUPLICATED all rows (reproduced: 2000 -> 4000)."""
    import numpy as np

    from parquet_go_ray.pipelines.compact import compact_partitions
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_grouped
    from parquet_go_ray.state import manifest as mf

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["".join(map(str, rng.integers(0, 10, 200)))
                          for _ in range(n)]),
        "source": pa.array([f"s{i % 2}" for i in range(n)]),
    })
    out = str(tmp_path / "run")
    kw = dict(key="source", target_partition_bytes=10_000)
    encode_grouped(rd.from_arrow(t), out, **kw).materialize()
    before = mf.completed_ids(out)
    r = compact_partitions(out, target_bytes=1 << 20)
    assert r["merged_files"] > 0
    # the original salt-stable ids stay complete through the rename
    assert before <= mf.completed_ids(out)
    encode_grouped(rd.from_arrow(t), out, **kw).materialize()
    assert decode_dataset(out).count() == n
    # covers propagate through a SECOND compaction round
    compact_partitions(out, target_bytes=1 << 21)
    encode_grouped(rd.from_arrow(t), out, **kw).materialize()
    assert decode_dataset(out).count() == n


def test_interrupted_compaction_never_double_reads(ray_session, tmp_path):
    """The crash window between the merged record landing and the old
    records being retired leaves BOTH listed; decode used to read both and
    duplicate every absorbed row (reproduced: 2000 -> 4000). drop_covered
    reconciles reads, and the next compact_partitions call finishes the
    retirement."""
    import glob
    import os
    import shutil

    import numpy as np

    from parquet_go_ray.pipelines.compact import compact_partitions
    from parquet_go_ray.pipelines.encode import decode_dataset, encode_grouped

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["".join(map(str, rng.integers(0, 10, 200)))
                          for _ in range(n)]),
        "source": pa.array([f"s{i % 2}" for i in range(n)]),
    })
    out, snap = str(tmp_path / "run"), str(tmp_path / "snap")
    encode_grouped(rd.from_arrow(t), out, key="source",
                   target_partition_bytes=10_000).materialize()
    shutil.copytree(out, snap)
    assert compact_partitions(out, target_bytes=1 << 20)["merged_files"] > 0
    # restore the pre-compaction files + records = crash before retirement
    for sub in ("", "_manifest/"):
        for p in glob.glob(os.path.join(snap, sub, "*")):
            if os.path.isfile(p):
                dst = os.path.join(out, sub, os.path.basename(p))
                if not os.path.exists(dst):
                    shutil.copy(p, dst)
    assert decode_dataset(out).count() == n
    assert decode_dataset(out, keys={"s0"}).count() == n // 2
    compact_partitions(out, target_bytes=1 << 20)  # repair pass
    assert decode_dataset(out).count() == n


def test_ivf_index_queries_identical_after_compaction(ray_session, tmp_path):
    """An IVF index is a keyed .rdpg layout; compacting it must not change
    any query result (manifest keys survive the merge — the same covers
    machinery the resume fix relies on)."""
    import numpy as np
    import pandas as pd

    from parquet_go_ray.ops.similarity import build_ivf_index, knn_ivf_query
    from parquet_go_ray.pipelines.compact import compact_partitions

    rng = np.random.default_rng(3)
    n, d = 1200, 16
    M = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.reshape(-1)), d).cast(pa.list_(pa.float32()))})
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(t).repartition(6).materialize(), idx,
                    nlist=8)
    q = knn_ivf_query(idx, [0, 1], M[:2], k=5, nprobe=3)
    a = (q.to_pandas() if not isinstance(q, pd.DataFrame) else q)
    assert compact_partitions(idx, target_bytes=1 << 22)["merged_files"] > 0
    q2 = knn_ivf_query(idx, [0, 1], M[:2], k=5, nprobe=3)
    b = (q2.to_pandas() if not isinstance(q2, pd.DataFrame) else q2)
    cols = list(a.columns)
    assert a.sort_values(cols).reset_index(drop=True).equals(
        b.sort_values(cols).reset_index(drop=True))
