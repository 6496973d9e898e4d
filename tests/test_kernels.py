"""Randomized roundtrip tests for the pure codec kernels.

Mirrors the reference's codec test strategy (SURVEY.md §5.1): every
encoder/decoder gets randomized roundtrips across bit widths / value shapes
(/root/reference/hybrid_test.go:34-61, deltabp_test.go:21-52,
bitpacking32_test.go, type_bytearray_test.go). No Ray needed here.
"""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.functions import bitpack, bytearray as ba, delta, dictionary, forr, fsst, hybrid, plain

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("width", [0, 1, 2, 3, 5, 7, 8, 13, 16, 24, 31, 32, 33, 47, 63, 64])
@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 1000])
def test_bitpack_roundtrip(width, n):
    hi = (1 << width) if width < 64 else (1 << 64)
    vals = RNG.integers(0, hi, size=n, dtype=np.uint64)
    packed = bitpack.pack(vals, width)
    assert len(packed) == bitpack.packed_size(n, width) if n else len(packed) == 0
    out = bitpack.unpack(packed, width, n)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("width", [0, 1, 3, 8, 16, 20, 32, 40, 64])
def test_hybrid_roundtrip_random(width):
    hi = (1 << width) if width < 64 else (1 << 64)
    vals = RNG.integers(0, hi, size=8 * 1024 + 5, dtype=np.uint64)
    out = hybrid.decode(hybrid.encode(vals, width), width, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_hybrid_runs_compress():
    vals = np.repeat(np.arange(20, dtype=np.uint64) % 4, 500)
    enc = hybrid.encode(vals, 2)
    assert len(enc) < bitpack.packed_size(len(vals), 2) / 10  # RLE runs win
    np.testing.assert_array_equal(hybrid.decode(enc, 2, len(vals)), vals)


def test_hybrid_mixed_short_long_runs():
    pieces = []
    for i in range(50):
        pieces.append(np.full(RNG.integers(1, 40), RNG.integers(0, 100), dtype=np.uint64))
    vals = np.concatenate(pieces)
    out = hybrid.decode(hybrid.encode(vals, 7), 7, len(vals))
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("nbits", [32, 64])
@pytest.mark.parametrize(
    "gen",
    [
        lambda dt, info: RNG.integers(info.min, info.max, size=1311, dtype=dt),  # full range / overflow
        lambda dt, info: np.arange(1000, dtype=dt),  # sorted
        lambda dt, info: np.repeat(RNG.integers(0, 50, 30), 40).astype(dt),  # runs
        lambda dt, info: np.array([7], dtype=dt),  # single value (v0.8.0 bug class)
        lambda dt, info: np.array([], dtype=dt),  # empty
        lambda dt, info: np.array([info.min, info.max, 0, -1, 1], dtype=dt),  # extremes
        lambda dt, info: np.full(129, info.min, dtype=dt),  # block boundary + extreme
    ],
)
def test_delta_roundtrip(nbits, gen):
    dt = np.int32 if nbits == 32 else np.int64
    vals = gen(dt, np.iinfo(dt))
    out = delta.decode(delta.encode(vals, nbits), nbits)
    np.testing.assert_array_equal(out, vals)
    assert out.dtype == dt


def test_delta_sorted_compresses():
    vals = np.arange(100_000, dtype=np.int64)
    enc = delta.encode(vals, 64)
    assert len(enc) < len(vals) * 8 / 50


@pytest.mark.parametrize("dtype", ["int32", "int64", "float32", "float64"])
def test_plain_fixed(dtype):
    if dtype.startswith("f"):
        vals = RNG.standard_normal(1000).astype(dtype)
        vals[::100] = np.nan
    else:
        vals = RNG.integers(-1000, 1000, 1000).astype(dtype)
    out = plain.decode_fixed(plain.encode_fixed(vals), dtype, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_plain_bool():
    vals = RNG.integers(0, 2, 1003).astype(np.bool_)
    out = plain.decode_bool(plain.encode_bool(vals), len(vals))
    np.testing.assert_array_equal(out, vals)


def _random_strings(n, lo=0, hi=30):
    lengths = RNG.integers(lo, hi, n)
    data = RNG.integers(0, 256, int(lengths.sum()), dtype=np.uint8)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return offsets, data


def test_plain_byte_array():
    offsets, data = _random_strings(500)
    enc = plain.encode_byte_array(offsets, data)
    out_off, out_data = plain.decode_byte_array(enc, 500)
    np.testing.assert_array_equal(np.diff(out_off), np.diff(offsets))
    np.testing.assert_array_equal(out_data, data)


def test_delta_length_byte_array():
    offsets, data = _random_strings(700)
    enc = ba.encode_delta_length(offsets, data)
    out_off, out_data = ba.decode_delta_length(enc, 700)
    np.testing.assert_array_equal(np.diff(out_off), np.diff(offsets))
    np.testing.assert_array_equal(out_data, data)


def test_delta_byte_array_shared_prefix():
    strs = sorted(f"doc-{i:012d}".encode() for i in range(2000))
    lengths = np.array([len(s) for s in strs])
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    enc = ba.encode_delta_byte_array(offsets, data)
    assert len(enc) < int(lengths.sum()) / 2  # front-coding wins on shared prefixes
    out_off, out_data = ba.decode_delta_byte_array(enc, len(strs))
    np.testing.assert_array_equal(np.diff(out_off), lengths)
    np.testing.assert_array_equal(out_data, data)


def test_delta_byte_array_random():
    offsets, data = _random_strings(300, 0, 50)
    enc = ba.encode_delta_byte_array(offsets, data)
    out_off, out_data = ba.decode_delta_byte_array(enc, 300)
    np.testing.assert_array_equal(np.diff(out_off), np.diff(offsets))
    np.testing.assert_array_equal(out_data, data)


def test_prefix_lengths_golden():
    strs = [b"", b"abc", b"abd", b"abd", b"ab", b"xyz"]
    lengths = np.array([len(s) for s in strs])
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    np.testing.assert_array_equal(ba.prefix_lengths(offsets, data), [0, 0, 2, 3, 2, 0])


@pytest.mark.parametrize("card", [1, 2, 100, 40000])
def test_dictionary_indices(card):
    idx = RNG.integers(0, card, 5000)
    out = dictionary.decode_indices(dictionary.encode_indices(idx, card), 5000)
    np.testing.assert_array_equal(out, idx)


def test_fsst_roundtrip_text():
    text = (b"the quick brown fox jumps over the lazy dog " * 200) + bytes(range(256)) * 3
    data = np.frombuffer(text, dtype=np.uint8)
    table = fsst.train(data)
    enc = fsst.encode(data, table)
    out = fsst.decode(enc)
    np.testing.assert_array_equal(out, data)
    assert len(enc) < len(text)  # compresses english-ish text


def test_fsst_escape_heavy():
    data = np.full(1000, fsst.ESCAPE, dtype=np.uint8)  # all 0xff bytes
    table = fsst.train(data)
    out = fsst.decode(fsst.encode(data, table))
    np.testing.assert_array_equal(out, data)


def test_fsst_random_bytes():
    data = RNG.integers(0, 256, 4096).astype(np.uint8)
    table = fsst.train(data)
    out = fsst.decode(fsst.encode(data, table))
    np.testing.assert_array_equal(out, data)


def test_fsst_empty_and_no_table():
    data = np.frombuffer(b"ab", dtype=np.uint8)
    out = fsst.decode(fsst.encode(data, np.zeros((0, 2), dtype=np.uint8)))
    np.testing.assert_array_equal(out, data)
    out = fsst.decode(fsst.encode(np.empty(0, dtype=np.uint8), fsst.train(data)))
    assert len(out) == 0


@pytest.mark.parametrize("nbits", [32, 64])
@pytest.mark.parametrize("mode", [forr.MODE_FOR, forr.MODE_FOR_DELTA])
def test_for_roundtrip(nbits, mode):
    dt = np.int32 if nbits == 32 else np.int64
    info = np.iinfo(dt)
    for vals in [
        RNG.integers(info.min, info.max, 777, dtype=dt),
        np.arange(5000, dtype=dt) + 1000,
        np.array([info.min, info.max], dtype=dt),
        np.array([42], dtype=dt),
        np.array([], dtype=dt),
    ]:
        out = forr.decode(forr.encode(vals, nbits, mode))
        np.testing.assert_array_equal(out, vals)
        assert out.dtype == dt


def test_for_estimate_matches_encode():
    vals = (RNG.integers(0, 1000, 2048) + 10_000).astype(np.int64)
    est_for, est_fd = forr.estimate_size(vals, 64)
    assert est_for == len(forr.encode(vals, 64, forr.MODE_FOR))
    assert est_fd == len(forr.encode(vals, 64, forr.MODE_FOR_DELTA))
    assert est_for < 2048 * 8 / 4  # 10-bit residuals


def test_delta_full_range_int64_widths_valid():
    """Exact bit widths: full-range int64 delta spreads must never emit a
    width > 64 (float log2 once rounded up to 65 — ADVICE r1)."""
    from parquet_go_ray.functions.varint import read_uvarint, read_varint

    v = np.array([0, 2**63 - 1, -1], dtype=np.int64)
    enc = delta.encode(v, 64)
    np.testing.assert_array_equal(delta.decode(enc, 64), v)
    pos = 0
    for _ in range(3):
        _, pos = read_uvarint(enc, pos)
    _, pos = read_varint(enc, pos)
    _, pos = read_varint(enc, pos)  # min_delta of first block
    widths = list(enc[pos : pos + 4])
    assert max(widths) <= 64


@pytest.mark.parametrize("nbits", [32, 64])
def test_delta_extreme_spreads_roundtrip(nbits):
    dt = np.int32 if nbits == 32 else np.int64
    info = np.iinfo(dt)
    for vals in [
        np.array([info.min, info.max] * 100, dtype=dt),
        RNG.integers(info.min, info.max, 500, dtype=dt),
        np.array([0, info.max, info.min, -1, 1], dtype=dt),
    ]:
        np.testing.assert_array_equal(delta.decode(delta.encode(vals, nbits), nbits), vals)


def test_hybrid_width0_empty_buffer():
    """The reference's encoder emits zero bytes at width 0
    (hybrid_encoder.go bpEncode early return) — decode must not parse runs."""
    out = hybrid.decode(b"", 0, 7)
    np.testing.assert_array_equal(out, np.zeros(7, dtype=np.uint64))
    assert hybrid.decode(b"", 0, 0).shape == (0,)


def test_timeutil_floor_and_time_of_day():
    from parquet_go_ray.functions import timeutil as tu

    ns = np.array([0, 3_600_000_000_123, -1, 90_000_000_000_000], dtype=np.int64)
    fl = tu.floor_timestamp(ns, "hour")
    np.testing.assert_array_equal(fl, [0, 3_600_000_000_000, -3_600_000_000_000,
                                       90_000_000_000_000 // 3_600_000_000_000 * 3_600_000_000_000])
    tod = tu.time_of_day_ns(ns)
    assert (tod >= 0).all() and (tod < 86_400_000_000_000).all()
    assert tod[1] == 3_600_000_000_123
    # arrow path roundtrips unit
    arr = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))
    out = tu.floor_timestamp(arr, "day")
    assert out.type == pa.timestamp("us")
    assert int(out[0].value) % 86_400_000_000 == 0


def test_timeutil_epoch_guess_and_byte_size():
    from parquet_go_ray.functions import timeutil as tu

    now_s, now_ms = 1_700_000_000, 1_700_000_000_000
    assert tu.guess_epoch_unit(np.array([now_s] * 5)) == "s"
    assert tu.guess_epoch_unit(np.array([now_ms] * 5)) == "ms"
    assert tu.guess_epoch_unit(np.array([now_ms * 1000])) == "us"
    assert tu.guess_epoch_unit(np.array([now_ms * 10**6])) == "ns"
    assert tu.parse_byte_size("128MB") == 128_000_000
    assert tu.parse_byte_size("1.5GiB") == int(1.5 * (1 << 30))
    assert tu.parse_byte_size("64k") == 64 << 10
    assert tu.parse_byte_size("1024") == 1024
    with pytest.raises(ValueError):
        tu.parse_byte_size("12 parsecs")


def test_bitpack_matches_pure_python_bit_stream_all_widths():
    """Independent spec pin for BOTH kernel paths (bit-matrix <=16, byte-lane
    >16): LSB-first value-major layout computed with python ints."""
    import numpy as np

    from parquet_go_ray.functions import bitpack

    rng = np.random.default_rng(77)
    for width in range(1, 65):
        for n in (1, 8, 11, 29):
            hi = 1 << min(width, 63)
            v = rng.integers(0, hi, n, dtype=np.uint64)
            if width == 64:
                v |= rng.integers(0, 2, n, dtype=np.uint64) << np.uint64(63)
            acc = 0
            for i, x in enumerate(v.tolist()):
                acc |= (x & ((1 << width) - 1)) << (i * width)
            padded = n + ((-n) % 8)
            expect = acc.to_bytes(padded * width // 8, "little")
            got = bitpack.pack(v, width)
            assert got == expect, (width, n)
            back = bitpack.unpack(got, width, n)
            assert np.array_equal(back, v), (width, n)
