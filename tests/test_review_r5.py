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
