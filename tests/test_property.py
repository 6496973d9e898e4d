"""Hypothesis property tests — the role of the reference's go-fuzz harnesses
(/root/reference/types_fuzz.go, hybrid_fuzz.go, deltabp_fuzz.go): randomized
roundtrips over adversarial value shapes for every codec family."""

import numpy as np
from hypothesis import given, settings, strategies as st

from parquet_go_ray.functions import bitpack, bytearray as ba, delta, forr, fsst, hybrid

SETTINGS = dict(max_examples=30, deadline=None)


@settings(**SETTINGS)
@given(
    st.integers(0, 64),
    st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=300),
)
def test_bitpack_property(width, values):
    vals = np.array([v & ((1 << width) - 1) if width else 0 for v in values], dtype=np.uint64)
    out = bitpack.unpack(bitpack.pack(vals, width), width, len(vals))
    np.testing.assert_array_equal(out, vals)


@settings(**SETTINGS)
@given(
    st.integers(0, 32),
    st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=500),
)
def test_hybrid_property(width, values):
    vals = np.array([v & ((1 << width) - 1) if width else 0 for v in values], dtype=np.uint64)
    out = hybrid.decode(hybrid.encode(vals, width), width, len(vals))
    np.testing.assert_array_equal(out, vals)


@settings(**SETTINGS)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=400))
def test_delta32_property(values):
    vals = np.array(values, dtype=np.int32)
    out = delta.decode(delta.encode(vals, 32), 32)
    np.testing.assert_array_equal(out, vals)


@settings(**SETTINGS)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=400))
def test_delta64_property(values):
    vals = np.array(values, dtype=np.int64)
    out = delta.decode(delta.encode(vals, 64), 64)
    np.testing.assert_array_equal(out, vals)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=300),
    st.sampled_from([forr.MODE_FOR, forr.MODE_FOR_DELTA]),
)
def test_for_property(values, mode):
    vals = np.array(values, dtype=np.int64)
    out = forr.decode(forr.encode(vals, 64, mode))
    np.testing.assert_array_equal(out, vals)


@settings(**SETTINGS)
@given(st.binary(min_size=0, max_size=4000))
def test_fsst_property(data):
    arr = np.frombuffer(data, dtype=np.uint8)
    table = fsst.train(arr)
    out = fsst.decode(fsst.encode(arr, table))
    np.testing.assert_array_equal(out, arr)


@settings(**SETTINGS)
@given(st.lists(st.binary(min_size=0, max_size=60), min_size=0, max_size=120))
def test_delta_byte_array_property(strings):
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(b"".join(strings), dtype=np.uint8)
    enc = ba.encode_delta_byte_array(offsets, data)
    out_off, out_data = ba.decode_delta_byte_array(enc, len(strings))
    np.testing.assert_array_equal(np.diff(out_off), lengths)
    np.testing.assert_array_equal(out_data, data)


@settings(**SETTINGS)
@given(st.lists(st.binary(min_size=0, max_size=60), min_size=0, max_size=120))
def test_delta_length_property(strings):
    lengths = np.array([len(s) for s in strings], dtype=np.int64)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = np.frombuffer(b"".join(strings), dtype=np.uint8)
    enc = ba.encode_delta_length(offsets, data)
    out_off, out_data = ba.decode_delta_length(enc, len(strings))
    np.testing.assert_array_equal(np.diff(out_off), lengths)
    np.testing.assert_array_equal(out_data, data)
