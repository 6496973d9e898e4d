"""Generative (hypothesis) fuzzing over the decode parsers — the role of
the reference's continuous go-fuzz loops (reader_fuzz.go:12,
hybrid_fuzz.go:12, deltabp_fuzz.go:10, types_fuzz.go:10-170), on top of the
frozen deterministic corpus in tests/test_fuzz.py.

Two input families per parser:
  * raw byte soup (hypothesis ``binary``), and
  * MUTATED VALID encodings — truncate / bit-flip / splice / duplicate a
    slice of a real encoding, which reaches far deeper parser states than
    uniform noise ever does.

The contract under fuzz is the same as the frozen corpus: a clean parse
error (ValueError & friends) or a well-formed-but-wrong value is fine;
MemoryError, SystemError, segfaults, hangs and unbounded allocation are the
bugs being hunted. Budgeted to stay within ~1-2 minutes of CI time
(the round-5 media decoders run a full parse per example).

Any crasher hypothesis finds gets FROZEN as a deterministic regression in
tests/test_fuzz.py (none outstanding).
"""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, example, given, settings, strategies as st

from parquet_go_ray.functions import (bitpack, bytearray as ba, delta, forr,
                                      fsst, hybrid, plain)
from parquet_go_ray.sources.thrift_compact import CompactReader

CLEAN = (ValueError, KeyError, IndexError, NotImplementedError, OSError,
         OverflowError, TypeError, pa.ArrowInvalid)

FUZZ = dict(max_examples=200, deadline=None,
            suppress_health_check=[HealthCheck.too_slow,
                                   HealthCheck.data_too_large])


def _expect_clean(fn):
    try:
        fn()
    except CLEAN:
        pass


# ---------------------------------------------------------------- mutations

def _mutate(valid: bytes, draw_kind: int, pos: int, payload: bytes) -> bytes:
    """Deterministic structural mutation of a valid encoding."""
    if not valid:
        return payload
    pos %= (len(valid) + 1)
    kind = draw_kind % 4
    if kind == 0:  # truncate
        return valid[:pos]
    if kind == 1:  # bit flip
        i = pos % len(valid)
        return valid[:i] + bytes([valid[i] ^ (1 << (draw_kind % 8))]) \
            + valid[i + 1:]
    if kind == 2:  # splice random bytes in
        return valid[:pos] + payload + valid[pos:]
    # duplicate a slice (confuses length-prefixed chains)
    return valid[:pos] + valid[pos // 2:pos] + valid[pos:]


mutation = st.tuples(st.integers(0, 2**31), st.integers(0, 2**31),
                     st.binary(max_size=24))


# valid-encoding pools (built once; mutation picks among them)
_HYBRID_POOL = [
    (hybrid.encode(np.arange(100, dtype=np.uint64) % 7, 3), 3, 100),
    (hybrid.encode(np.zeros(400, dtype=np.uint64), 1), 1, 400),
    (hybrid.encode(np.arange(50, dtype=np.uint64), 20), 20, 50),
]
_DELTA_POOL = [
    (delta.encode(np.arange(300, dtype=np.int64) * 7 - 150, 64), 64),
    (delta.encode(np.asarray([0, -1, 2**30, -(2**30)] * 40, np.int32), 32),
     32),
]
_rng = np.random.default_rng(0xFA22)
_STRS = [f"fuzz-{i % 23}-{'x' * (i % 11)}".encode() for i in range(120)]
_LENS = np.array([len(s) for s in _STRS], dtype=np.int64)
_OFFS = np.zeros(len(_STRS) + 1, dtype=np.int64)
np.cumsum(_LENS, out=_OFFS[1:])
_DATA = np.frombuffer(b"".join(_STRS), dtype=np.uint8)
_DBA_POOL = [ba.encode_delta_byte_array(_OFFS, _DATA)]
_DLB_POOL = [ba.encode_delta_length(_OFFS, _DATA)]
_FSST_POOL = [fsst.encode(_DATA, fsst.train(_DATA))]
_FOR_POOL = [forr.encode(_rng.integers(-500, 9000, 256), 64, forr.MODE_FOR),
             forr.encode(np.cumsum(_rng.integers(0, 50, 256)), 64,
                         forr.MODE_FOR_DELTA)]


# ---------------------------------------------------------------- thrift

@settings(**FUZZ)
@given(st.binary(max_size=400))
def test_thrift_soup(blob):
    _expect_clean(lambda: CompactReader(blob).read_struct())


@settings(**FUZZ)
@given(st.binary(max_size=40), mutation)
def test_thrift_structured(prefix, mut):
    # struct-ish skeleton: field headers with list/bool/i64 type nibbles
    skeleton = bytes([0x15, 0x04, 0x19, 0x28, 0x02, 0x01, 0x16, 0x80, 0x01,
                      0x00])
    blob = _mutate(skeleton, mut[0], mut[1], mut[2]) + prefix
    _expect_clean(lambda: CompactReader(blob).read_struct())


# ---------------------------------------------------------------- hybrid

@settings(**FUZZ)
@given(st.binary(max_size=300), st.integers(0, 64), st.integers(0, 5000))
def test_hybrid_soup(blob, width, count):
    _expect_clean(lambda: hybrid.decode(blob, width, count))


@settings(**FUZZ)
@given(st.integers(0, 2), mutation)
def test_hybrid_mutated(idx, mut):
    valid, width, count = _HYBRID_POOL[idx]
    blob = _mutate(bytes(valid), mut[0], mut[1], mut[2])
    _expect_clean(lambda: hybrid.decode(blob, width, count))


# ---------------------------------------------------------------- delta

@settings(**FUZZ)
@given(st.binary(max_size=300), st.sampled_from([32, 64]))
def test_delta_soup(blob, nbits):
    _expect_clean(lambda: delta.decode(blob, nbits))


@settings(**FUZZ)
@given(st.integers(0, 1), mutation)
def test_delta_mutated(idx, mut):
    valid, nbits = _DELTA_POOL[idx]
    blob = _mutate(bytes(valid), mut[0], mut[1], mut[2])
    _expect_clean(lambda: delta.decode(blob, nbits))


# ---------------------------------------------------------------- plain

@settings(**FUZZ)
@given(st.binary(max_size=200), st.integers(0, 10000))
def test_plain_byte_array_soup(blob, count):
    _expect_clean(lambda: plain.decode_byte_array(blob, count))


@settings(**FUZZ)
@given(st.binary(max_size=200),
       st.sampled_from(["int32", "int64", "float32", "float64"]),
       st.integers(0, 10000))
def test_plain_fixed_soup(blob, dtype, count):
    _expect_clean(lambda: plain.decode_fixed(blob, dtype, count))
    _expect_clean(lambda: plain.decode_bool(blob, count))
    _expect_clean(lambda: plain.decode_fixed_len_byte_array(blob, 5, count))


# ------------------------------------------------------- delta byte arrays

@settings(**FUZZ)
@given(mutation, st.integers(0, 300))
def test_delta_byte_array_mutated(mut, count):
    blob = _mutate(bytes(_DBA_POOL[0]), mut[0], mut[1], mut[2])
    _expect_clean(lambda: ba.decode_delta_byte_array(blob, count))


@settings(**FUZZ)
@given(mutation, st.integers(0, 300))
def test_delta_length_mutated(mut, count):
    blob = _mutate(bytes(_DLB_POOL[0]), mut[0], mut[1], mut[2])
    _expect_clean(lambda: ba.decode_delta_length(blob, count))


# ------------------------------------------------------------- fsst / forr

@settings(**FUZZ)
@given(mutation)
def test_fsst_mutated(mut):
    blob = _mutate(bytes(_FSST_POOL[0]), mut[0], mut[1], mut[2])
    _expect_clean(lambda: fsst.decode(blob))


@settings(**FUZZ)
@given(st.integers(0, 1), mutation)
def test_for_mutated(idx, mut):
    blob = _mutate(bytes(_FOR_POOL[idx]), mut[0], mut[1], mut[2])
    _expect_clean(lambda: forr.decode(blob))


# --------------------------------------------------------------- bitpack

@settings(**FUZZ)
@given(st.binary(max_size=120), st.integers(0, 64), st.integers(0, 4000))
def test_bitpack_soup(blob, width, count):
    _expect_clean(lambda: bitpack.unpack(blob, width, count))


# ------------------------------------------- round-5 media-codec parsers

def _flac_valid() -> bytes:
    from parquet_go_ray.functions.flaccodec import encode_flac

    t = np.arange(2000) / 8000
    sig = (4000 * np.sin(2 * np.pi * 250 * t)).astype(np.int64)[:, None]
    return encode_flac(sig, 8000, block_size=512)


def _mp4_valid() -> bytes:
    from parquet_go_ray.functions.mp4box import mux_mp4

    fr = [bytes([i % 251]) * 12 for i in range(6)]
    return mux_mp4([{"codec": "raw ", "timescale": 30, "delta": 1,
                     "samples": fr, "width": 2, "height": 2}])


def _jpeg_valid(progressive: bool) -> bytes:
    from parquet_go_ray.functions.jpegcodec import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:24]
    img = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    return encode_jpeg(img, quality=80, progressive=progressive)


_FLAC_POOL = [_flac_valid()]
# media decoders run a full parse per example (entropy loops): smaller
# example budget keeps the whole fuzz suite inside CI time
FUZZ_MEDIA = dict(FUZZ, max_examples=50)
_MP4_POOL = [_mp4_valid()]
_JPEG_POOL = [_jpeg_valid(False), _jpeg_valid(True)]


@settings(**FUZZ_MEDIA)
@given(st.binary(max_size=300))
def test_flac_soup(blob):
    from parquet_go_ray.functions.flaccodec import decode_flac

    _expect_clean(lambda: decode_flac(b"fLaC" + blob))


@settings(**FUZZ_MEDIA)
@given(mutation)
def test_flac_mutated(mut):
    from parquet_go_ray.functions.flaccodec import decode_flac

    blob = _mutate(_FLAC_POOL[0], *mut)
    _expect_clean(lambda: decode_flac(blob))


@settings(**FUZZ_MEDIA)
@given(st.binary(max_size=300))
def test_mp4_soup(blob):
    from parquet_go_ray.functions.mp4box import demux_mp4

    _expect_clean(lambda: demux_mp4(blob))


@settings(**FUZZ_MEDIA)
@given(mutation)
def test_mp4_mutated(mut):
    from parquet_go_ray.functions.mp4box import demux_mp4

    blob = _mutate(_MP4_POOL[0], *mut)
    _expect_clean(lambda: demux_mp4(blob))


def _mjpeg_mp4_valid() -> bytes:
    from parquet_go_ray.functions.jpegcodec import encode_jpeg
    from parquet_go_ray.functions.mp4box import mux_mp4

    yy, xx = np.mgrid[0:8, 0:8]
    img = np.stack([(xx * 9) % 256, (yy * 7) % 256,
                    ((xx + yy) * 5) % 256], axis=-1).astype(np.uint8)
    fr = [encode_jpeg(img, quality=80) for _ in range(3)]
    return mux_mp4([{"codec": "jpeg", "timescale": 30, "delta": 1,
                     "samples": fr, "width": 8, "height": 8}])


_MJPEG_POOL = [_mjpeg_mp4_valid()]


@settings(**FUZZ_MEDIA)
@given(mutation)
def test_mjpeg_stage_mutated(mut):
    """Mutated MJPEG MP4s through the full DemuxVideoFrames stage: the
    container walk AND the per-sample JPEG decode must both fail cleanly
    (corrupt samples reach decode_jpeg, not just the box parser)."""
    from parquet_go_ray.ops.multimodal import DemuxVideoFrames

    blob = _mutate(_MJPEG_POOL[0], *mut)
    t = pa.table({"video_id": pa.array([0]),
                  "payload": pa.array([blob], pa.binary())})
    _expect_clean(lambda: DemuxVideoFrames(every=1)(t))


@settings(**FUZZ_MEDIA)
@given(st.integers(0, 1), mutation)
@example(
    which=1,
    mut=(0, 11434, b''),
).via('discovered failure')
def test_jpeg_mutated(which, mut):
    from parquet_go_ray.functions.jpegcodec import decode_jpeg

    blob = _mutate(_JPEG_POOL[which], *mut)
    _expect_clean(lambda: decode_jpeg(blob))


# --- spherical-cap pruning soundness (ops/dedup.py) -------------------------
# The angular-triangle-inequality bound must NEVER dismiss a cap pair that
# holds a qualifying vector pair — for any block contents, any tau.

@settings(**FUZZ)
@given(st.data())
def test_cap_pruning_never_false_dismisses(data):
    import pyarrow as pa

    from parquet_go_ray.ops.dedup import _block_cap_summary, _prune_cap_pairs

    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    d = data.draw(st.integers(2, 24))
    nblocks = data.draw(st.integers(1, 5))
    tau = data.draw(st.floats(-0.5, 0.999))
    caps, mats = [], []
    for _ in range(nblocks):
        n = rng.integers(1, 30)
        # mix of tight and spread blocks, occasional duplicates/zeros
        M = rng.standard_normal((n, d))
        if rng.random() < 0.5:  # tighten around a random direction
            c = rng.standard_normal(d)
            M = c + rng.uniform(0.005, 0.4) * M
        if rng.random() < 0.2 and n > 1:
            M[0] = M[-1]  # exact duplicate across positions
        Mn = (M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
              ).astype(np.float32)
        t = pa.table({
            "__vec": pa.FixedSizeListArray.from_arrays(
                pa.array(Mn.reshape(-1)), d),
            "__cl": pa.array(np.zeros(n, dtype=np.int64)),
        })
        runs = _block_cap_summary(t)
        assert len(runs) == 1
        caps.append((runs[0][2], runs[0][3]))
        mats.append(np.asarray(Mn, dtype=np.float64))
    kept = set(_prune_cap_pairs(caps, tau))
    for i in range(nblocks):
        for j in range(i, nblocks):
            best = float((mats[i] @ mats[j].T).max())
            if best >= tau:
                assert (i, j) in kept, (i, j, best, tau, caps[i], caps[j])


# ------------------- round-5 session-2: container / schema / image surfaces

def _rdpg_valid() -> bytes:
    from parquet_go_ray.sources.partfile import encode_table

    t = pa.table({
        "id": pa.array(np.arange(40, dtype=np.int64)),
        "txt": pa.array([f"doc-{i % 7}" for i in range(40)]),
        "toks": pa.array([[i, i + 1, i + 2] for i in range(40)],
                         pa.list_(pa.int32())),
        "score": pa.array(np.linspace(0, 1, 40)),
    })
    blob, _lineage = encode_table(t)
    return bytes(blob)


_RDPG_POOL = [_rdpg_valid()]


@settings(**FUZZ_MEDIA)
@given(mutation)
def test_rdpg_mutated(mut):
    """Mutated .rdpg partition blobs through footer + full decode: the
    container format (magic, footer JSON, page directory, CRCs, per-page
    codec payloads) must fail cleanly whatever byte is wrong."""
    from parquet_go_ray.sources.partfile import decode_table, read_footer

    blob = _mutate(_RDPG_POOL[0], *mut)
    _expect_clean(lambda: read_footer(blob))
    _expect_clean(lambda: decode_table(blob))
    _expect_clean(lambda: decode_table(blob, columns=["id", "toks"]))


@settings(**FUZZ_MEDIA)
@given(st.binary(max_size=300))
def test_rdpg_soup(blob):
    from parquet_go_ray.sources.partfile import decode_table

    _expect_clean(lambda: decode_table(blob))


def _parquet_valid() -> bytes:
    import pyarrow.parquet  # noqa: F401  (ensure module load)

    from parquet_go_ray.sources.parquet_compat import (
        write_parquet_with_our_kernels)

    t = pa.table({
        "id": pa.array(np.arange(30, dtype=np.int64)),
        "s": pa.array([None if i % 9 == 0 else f"v{i % 5}"
                       for i in range(30)]),
        "nest": pa.array([{"a": i, "b": [float(i), i + 0.5]}
                          for i in range(30)]),
    })
    import io, os, tempfile
    fd, p = tempfile.mkstemp(suffix=".parquet")
    os.close(fd)
    try:
        write_parquet_with_our_kernels(t, p)
        with open(p, "rb") as f:
            return f.read()
    finally:
        os.unlink(p)


_PARQUET_POOL = [_parquet_valid()]


@settings(**FUZZ_MEDIA)
@given(mutation)
def test_parquet_reader_mutated(mut):
    """Mutated real parquet bytes through OUR reader (thrift footer walk,
    page headers, level decode, Dremel assembly) — the exact role of the
    reference's reader_fuzz.go:12."""
    import os
    import tempfile

    from parquet_go_ray.sources.parquet_compat import (
        read_file_metadata, read_parquet_with_our_kernels)

    blob = _mutate(_PARQUET_POOL[0], *mut)
    _expect_clean(lambda: read_file_metadata(blob))
    fd, p = tempfile.mkstemp(suffix=".parquet")
    os.close(fd)
    try:
        with open(p, "wb") as f:
            f.write(blob)
        _expect_clean(lambda: read_parquet_with_our_kernels(
            p, validate_crc=True))
    finally:
        os.unlink(p)


def _png_valid() -> bytes:
    from parquet_go_ray.functions.imagecodec import encode_png

    yy, xx = np.mgrid[0:12, 0:12]
    img = np.stack([(xx * 11) % 256, (yy * 13) % 256,
                    ((xx ^ yy) * 7) % 256], axis=-1).astype(np.uint8)
    return encode_png(img, filter_type=1)


def _bmp_valid() -> bytes:
    from parquet_go_ray.functions.imagecodec import encode_bmp

    yy, xx = np.mgrid[0:9, 0:7]
    img = np.stack([xx * 30 % 256, yy * 25 % 256,
                    (xx + yy) * 15 % 256], axis=-1).astype(np.uint8)
    return encode_bmp(img)


def _wav_valid() -> bytes:
    from parquet_go_ray.functions.imagecodec import encode_wav

    t = np.arange(600) / 8000
    return encode_wav((3000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16),
                      8000)


_PNG_POOL = [_png_valid()]
_BMP_POOL = [_bmp_valid()]
_WAV_POOL = [_wav_valid()]


@settings(**FUZZ_MEDIA)
@given(st.integers(0, 2), mutation)
def test_image_audio_mutated(which, mut):
    from parquet_go_ray.functions.imagecodec import (decode_bmp, decode_png,
                                                     decode_wav)

    pool, dec = [(_PNG_POOL, decode_png), (_BMP_POOL, decode_bmp),
                 (_WAV_POOL, decode_wav)][which]
    blob = _mutate(pool[0], *mut)
    # zlib.error (PNG inflate of corrupt deflate streams) is a clean parse
    # failure for this surface, same contract as the frozen corpus
    import zlib
    try:
        dec(blob)
    except CLEAN:
        pass
    except zlib.error:
        pass


_SCHEMA_VALID = """message doc {
  required int64 id;
  optional binary name (STRING);
  repeated group tags {
    required binary t (STRING);
    optional int32 w;
  }
  optional group xs (LIST) {
    repeated group list {
      optional double element;
    }
  }
}"""


@settings(**FUZZ)
@given(mutation)
def test_schema_dsl_mutated(mut):
    """Mutated schema-DSL text through the parser (the reference's
    parquetschema/schema_parser.go fuzz role): SchemaParseError (a
    ValueError) or a parsed-but-different tree, never a raw crash."""
    from parquet_go_ray.functions.schema_dsl import parse_schema, to_arrow_schema

    valid = _SCHEMA_VALID.encode()
    blob = _mutate(valid, *mut)
    try:
        text = blob.decode("utf-8", errors="replace")
    except Exception:
        return
    def run():
        root = parse_schema(text)
        to_arrow_schema(root)  # a parse that survives must also map to Arrow
    _expect_clean(run)


@settings(**FUZZ)
@given(st.text(max_size=200))
def test_schema_dsl_soup(text):
    from parquet_go_ray.functions.schema_dsl import parse_schema

    _expect_clean(lambda: parse_schema(text))


# ------------------------------------------------------------------- ALP

def _alp_pool():
    from parquet_go_ray.functions import alp

    rng = np.random.default_rng(17)
    return [
        alp.encode(np.round(rng.uniform(1, 1e5, 500), 2), 2, 0),
        alp.encode(rng.standard_normal(300), 14, 2),  # mostly exceptions
        alp.encode(np.round(rng.uniform(0, 10, 400), 1).astype(np.float32), 1, 0),
    ]


_ALP_POOL = _alp_pool()


@settings(**FUZZ)
@given(st.integers(0, 2), mutation)
def test_alp_mutated(idx, mut):
    from parquet_go_ray.functions import alp

    blob = _mutate(_ALP_POOL[idx], *mut)
    _expect_clean(lambda: alp.decode(blob))


@settings(**FUZZ)
@given(st.binary(max_size=200))
def test_alp_soup(blob):
    from parquet_go_ray.functions import alp

    _expect_clean(lambda: alp.decode(blob))


# --------------------------------------------------- G.711 / ADPCM WAV

def _g711_ima_pool():
    from parquet_go_ray.functions import audiocodec as ac

    s = (5000 * np.sin(np.arange(700) / 20)).astype(np.int16)
    return [ac.encode_wav_g711(s, 8000, law="ulaw"),
            ac.encode_wav_g711(s, 8000, law="alaw"),
            ac.encode_wav_ima(s, 16000, block_align=256)]


_G711_POOL = _g711_ima_pool()


@settings(**FUZZ_MEDIA)
@given(st.integers(0, 2), mutation)
def test_wav_g711_ima_mutated(idx, mut):
    from parquet_go_ray.functions.imagecodec import decode_wav

    blob = _mutate(_G711_POOL[idx], *mut)
    _expect_clean(lambda: decode_wav(blob))


@settings(**FUZZ)
@given(st.binary(max_size=300), st.integers(1, 4), st.sampled_from([8, 64, 256]))
def test_ima_adpcm_soup(blob, channels, block_align):
    from parquet_go_ray.functions.audiocodec import decode_ima_adpcm

    _expect_clean(lambda: decode_ima_adpcm(blob, channels, block_align))


def _alprd_pool():
    from parquet_go_ray.functions import alp

    rng = np.random.default_rng(23)
    return [alp.encode_rd(rng.standard_normal(400), 11),
            alp.encode_rd(rng.standard_normal(300).astype(np.float32), 9)]


_ALPRD_POOL = _alprd_pool()


@settings(**FUZZ)
@given(st.integers(0, 1), mutation)
def test_alprd_mutated(idx, mut):
    from parquet_go_ray.functions import alp

    blob = _mutate(_ALPRD_POOL[idx], *mut)
    _expect_clean(lambda: alp.decode_rd(blob))


@settings(**FUZZ)
@given(st.binary(max_size=200))
def test_alprd_soup(blob):
    from parquet_go_ray.functions import alp

    _expect_clean(lambda: alp.decode_rd(blob))


@settings(**FUZZ)
@given(st.binary(max_size=300))
def test_bloom_soup(blob):
    import pyarrow as pa

    from parquet_go_ray.sources import bloom

    _expect_clean(lambda: bloom.maybe_contains(blob, pa.array([1, 2, 3])))
