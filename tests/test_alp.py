"""ALP float codec (functions/alp.py): kernel roundtrips, exception
handling, exponent search, selector integration.

The reference encodes floats PLAIN only (type_float.go / type_double.go);
ALP is a north-star extended arm, so there is no reference golden — the
contract is bit-identity on arbitrary inputs plus a strict size win on
decimal-like data.
"""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_go_ray.functions import alp
from parquet_go_ray.sources import partfile
from parquet_go_ray.sources.columns import EncodeConfig

RNG = np.random.default_rng(40)


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    u = {2: np.uint16, 4: np.uint32, 8: np.uint64}[a.dtype.itemsize]
    return a.dtype == b.dtype and np.array_equal(a.view(u), b.view(u))


def test_prices_two_decimals_pack_small():
    v = np.round(RNG.uniform(1, 100000, 50000), 2)
    e, f, frac = alp.choose_exponents(v[:4096])
    assert frac == 1.0
    enc = alp.encode(v, e, f)
    assert _bits_equal(alp.decode(enc), v)
    assert len(enc) < 0.45 * v.nbytes  # ~3 B/val vs 8 plain


def test_trailing_zero_factor_beats_plain_exponent():
    # all multiples of 100: the f>e extension encodes v/100
    v = (RNG.integers(1, 1000, 10000) * 100).astype(np.float64)
    e, f, _ = alp.choose_exponents(v[:4096])
    assert f > e
    enc = alp.encode(v, e, f)
    assert _bits_equal(alp.decode(enc), v)
    assert len(enc) < 0.2 * v.nbytes


def test_hostile_values_all_exception_paths():
    h = RNG.standard_normal(10000)
    h[::97] = np.nan
    h[1::97] = np.inf
    h[2::97] = -np.inf
    h[3::97] = -0.0
    h[4::97] = 1e300
    for ef in [(0, 0), (5, 2), (18, 0), (2, 7)]:
        assert _bits_equal(alp.decode(alp.encode(h, *ef)), h), ef


def test_negative_zero_is_exception_not_silent_plus_zero():
    v = np.array([-0.0, 0.0, 12.5])
    dec = alp.decode(alp.encode(v, 1, 0))
    assert _bits_equal(dec, v)
    assert np.signbit(dec[0]) and not np.signbit(dec[1])


def test_float32_and_float16_roundtrip():
    v32 = np.round(RNG.uniform(0, 1000, 20000), 1).astype(np.float32)
    e, f, _ = alp.choose_exponents(v32[:4096])
    assert _bits_equal(alp.decode(alp.encode(v32, e, f)), v32)
    v16 = (RNG.integers(0, 100, 5000) / np.float16(4)).astype(np.float16)
    e, f, _ = alp.choose_exponents(v16[:4096])
    assert _bits_equal(alp.decode(alp.encode(v16, e, f)), v16)


def test_empty_and_single_value():
    assert len(alp.decode(alp.encode(np.empty(0, np.float64), 0, 0))) == 0
    one = np.array([3.25], dtype=np.float32)
    assert _bits_equal(alp.decode(alp.encode(one, 2, 0)), one)


def test_all_nan_all_exceptions():
    v = np.full(257, np.nan)
    assert _bits_equal(alp.decode(alp.encode(v, 4, 1)), v)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    bits=st.lists(st.integers(0, 2 ** 64 - 1), max_size=300),
    e=st.integers(0, alp.MAX_E),
    f=st.integers(0, alp.MAX_E),
)
def test_property_arbitrary_doubles_any_exponents(bits, e, f):
    """ANY bit pattern (incl. NaN payloads, subnormals) must round-trip
    bit-identically under ANY (e, f) — the exception path is the safety
    net, never lossy."""
    v = np.array(bits, dtype=np.uint64).view(np.float64)
    assert _bits_equal(alp.decode(alp.encode(v, e, f)), v)


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    cents=st.lists(st.integers(-10 ** 9, 10 ** 9), min_size=1, max_size=300),
    f=st.integers(0, 4),
)
def test_property_decimals_have_zero_exceptions(cents, f):
    """True k-decimal data under (e=k, f=0) maps with no exceptions and
    the chooser finds a 100%-exact pair."""
    v = np.array(cents, dtype=np.float64) / 100.0
    enc = alp.encode(v, 2, 0)
    assert _bits_equal(alp.decode(enc), v)
    n_exc = int.from_bytes(enc[7:11], "little")
    assert n_exc == 0
    # the chooser optimizes SIZE, so it may pick a different pair — but it
    # must round-trip and never do worse than the known-exact (2, 0)
    e, f, _ = alp.choose_exponents(v)
    enc2 = alp.encode(v, e, f)
    assert _bits_equal(alp.decode(enc2), v)
    assert len(enc2) <= len(enc)


def test_selector_picks_alp_for_prices_and_not_for_noise():
    n = 30000
    t = pa.table({
        "price": pa.array(np.round(RNG.uniform(1, 100000, n), 2)),
        "noise": pa.array(RNG.standard_normal(n)),
    })
    blob, rec = partfile.encode_table(t, EncodeConfig())
    assert rec["codecs"]["price"] == "ALP"
    assert rec["codecs"]["noise"] != "ALP"  # full-entropy: ALP cannot win
    assert partfile.decode_table(blob).equals(t)


def test_forced_alp_lossless_even_on_noise():
    n = 5000
    t = pa.table({"x": pa.array(RNG.standard_normal(n))})
    blob, rec = partfile.encode_table(
        t, EncodeConfig(column_codecs={"x": "ALP"}))
    assert rec["codecs"]["x"] == "ALP"
    assert partfile.decode_table(blob).equals(t)


def test_alp_survives_compression_none():
    # ALP is a real size reduction, not a compressibility transform:
    # it must fire (and win) with no page compressor at all
    n = 30000
    t = pa.table({"price": pa.array(np.round(RNG.uniform(1, 1000, n), 2))})
    blob, rec = partfile.encode_table(t, EncodeConfig(compression="none"))
    assert rec["codecs"]["price"] == "ALP"
    assert rec["bytes_out"] < 0.5 * rec["bytes_in"]
    assert partfile.decode_table(blob).equals(t)


def test_alp_pages_self_contained_across_page_splits():
    n = 40000
    v = np.round(RNG.uniform(0, 10, n), 3)
    t = pa.table({"v": pa.array(v)})
    blob, rec = partfile.encode_table(
        t, EncodeConfig(column_codecs={"v": "ALP"}, page_bytes=4096))
    back = partfile.decode_table(blob)
    assert back.equals(t)


def test_alp_with_nulls_mixed():
    vals = [1.25, None, 3.5, None, 97.75, -0.0, None]
    t = pa.table({"v": pa.array(vals, type=pa.float64())})
    blob, _ = partfile.encode_table(
        t, EncodeConfig(column_codecs={"v": "ALP"}))
    assert partfile.decode_table(blob).equals(t)


# ------------------------------------------------------------------ ALP-RD

def test_rd_roundtrip_across_dtypes_and_hostile_bits():
    rng = np.random.default_rng(5)
    for v in [rng.standard_normal(40000),
              rng.standard_normal(30000).astype(np.float32),
              (rng.standard_normal(5000) * 100).astype(np.float16),
              np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324]),
              np.empty(0, np.float32)]:
        L, _ = alp.choose_left_width(v[:4096])
        enc = alp.encode_rd(v, L or 8)
        assert _bits_equal(alp.decode_rd(enc), v), v.dtype


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    bits=st.lists(st.integers(0, 2 ** 64 - 1), max_size=200),
    L=st.integers(1, 16),
)
def test_rd_property_any_bits_any_cut(bits, L):
    """ALP_RD is a pure bit repartition: ANY input bits, ANY cut point,
    bit-identical round-trip (the only failure mode is the dictionary cap,
    which raises cleanly)."""
    v = np.array(bits, dtype=np.uint64).view(np.float64)
    try:
        enc = alp.encode_rd(v, L)
    except ValueError:
        return  # dictionary cap: legal refusal, never silent corruption
    assert _bits_equal(alp.decode_rd(enc), v)


def test_rd_beats_plain_on_normals():
    rng = np.random.default_rng(6)
    v = rng.standard_normal(50000)
    L, _ = alp.choose_left_width(v[:4096])
    enc = alp.encode_rd(v, L)
    assert len(enc) < 0.95 * v.nbytes  # few exponents: left dict is narrow


def test_selector_picks_rd_for_high_entropy_float32():
    # float32 normals: the 9ish left bits (sign+exponent) straddle BSS's
    # byte-plane boundary, so RD beats BSS past the strict 5% bar there
    # (on float64 normals RD is only ~3% better and the margin correctly
    # keeps BSS — pinned below)
    rng = np.random.default_rng(3)
    n = 30000
    t = pa.table({
        "noise32": pa.array(rng.standard_normal(n).astype(np.float32)),
        "noise64": pa.array(rng.standard_normal(n)),
    })
    blob, rec = partfile.encode_table(t, EncodeConfig())
    assert rec["codecs"]["noise32"] == "ALP_RD"
    assert rec["codecs"]["noise64"] in ("BSS", "ALP_RD")
    back = partfile.decode_table(blob)
    assert _bits_equal(np.asarray(back.column("noise32")),
                       np.asarray(t.column("noise32")))
    assert _bits_equal(np.asarray(back.column("noise64")),
                       np.asarray(t.column("noise64")))


def test_forced_rd_page_fallback_on_dict_overflow():
    # sample says L=16 is fine, but a full 128k-value page overflows the
    # 2^16 left-pattern cap -> the page encoder must coarsen the cut, not die
    rng = np.random.default_rng(9)
    v = rng.standard_normal(200000)
    t = pa.table({"x": pa.array(v)})
    blob, rec = partfile.encode_table(
        t, EncodeConfig(column_codecs={"x": "ALP_RD"}))
    assert rec["codecs"]["x"] == "ALP_RD"
    assert _bits_equal(np.asarray(partfile.decode_table(blob).column("x")), v)


def test_rd_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        alp.decode_rd(b"\x08\x05")  # truncated
    with pytest.raises(ValueError):
        alp.decode_rd(bytes([3, 5]) + b"\x00" * 16)  # bad float width
    with pytest.raises(ValueError):
        alp.encode_rd(np.zeros(4), 40)  # cut out of range
