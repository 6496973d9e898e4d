"""Decision-parity tests: the selector in 'reference' mode must pick exactly
what parquet-go's writeChunk would (/root/reference/chunk_writer.go:174-209,
type_dict.go:96-104): dictionary by default, abandoned past 32767 distinct,
never for booleans; fallback is the configured encoding (PLAIN default)."""

import numpy as np
import pytest

from parquet_go_ray.state import selector as sel


def stats_of(vals):
    return sel.int_stats(np.asarray(vals, dtype=np.int32))


def test_dict_cutoff_boundary_accept():
    # exactly 32767 distinct values -> dict survives (<= math.MaxInt16)
    vals = np.arange(32767, dtype=np.int32)
    d = sel.choose_int_codec(stats_of(vals), mode=sel.MODE_REFERENCE)
    assert d.codec == "DICT"


def test_dict_cutoff_boundary_reject():
    # 32768 distinct -> dict abandoned, fallback encoding
    vals = np.arange(32768, dtype=np.int32)
    d = sel.choose_int_codec(stats_of(vals), mode=sel.MODE_REFERENCE)
    assert d.codec == "PLAIN"
    d2 = sel.choose_int_codec(stats_of(vals), mode=sel.MODE_REFERENCE, fallback="DELTA_BP")
    assert d2.codec == "DELTA_BP"  # configured encoding, like NewInt32Store(enc,...)


def test_low_card_dict():
    vals = np.tile(np.arange(100, dtype=np.int32), 100)
    assert sel.choose_int_codec(stats_of(vals), mode=sel.MODE_REFERENCE).codec == "DICT"


def test_bool_never_dict():
    vals = np.zeros(1000, dtype=np.bool_)
    d = sel.choose_bool_codec(vals, mode=sel.MODE_REFERENCE)
    assert d.codec == "PLAIN_BOOL"


def test_dict_size_model():
    # /root/reference/type_dict.go:131-133: dictLen = uniqueBytes + 4*len(values)
    st = stats_of(np.tile(np.arange(10, dtype=np.int32), 50))
    assert st.dict_size == 10 * 4 + 4 * 500


def test_bytes_dict_cutoff():
    import pyarrow as pa

    vals = [f"v{i}" for i in range(100)] * 5
    arr = pa.array(vals).cast(pa.binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    st = sel.bytes_stats(offsets, data)
    assert st.distinct == 100
    assert sel.choose_bytes_codec(st, mode=sel.MODE_REFERENCE).codec == "DICT"


@pytest.mark.parametrize(
    "gen,expect",
    [
        (lambda: np.arange(100_000, dtype=np.int32), {"DELTA_BP", "FOR_DELTA"}),  # sorted
        (lambda: np.random.default_rng(0).integers(-(2**31), 2**31 - 1, 100_000, dtype=np.int32), {"PLAIN", "FOR"}),  # uniform full-range
        (lambda: np.repeat(np.arange(10, dtype=np.int32), 10_000), {"DICT", "DELTA_BP", "FOR_DELTA"}),  # low-card runs
        (lambda: np.full(50_000, 7, dtype=np.int32), {"DICT", "FOR", "FOR_DELTA", "DELTA_BP"}),  # constant
    ],
)
def test_extended_mode_sane_choices(gen, expect):
    vals = gen()
    d = sel.choose_int_codec(sel.int_stats(vals), mode=sel.MODE_EXTENDED)
    assert d.codec in expect, d


def test_extended_never_bigger_than_reference():
    """The north-rule invariant: extended-mode output <= reference-mode output."""
    import pyarrow as pa

    from parquet_go_ray.sources.columns import EncodeConfig
    from parquet_go_ray.sources.partfile import encode_table

    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "sorted": pa.array(np.arange(20_000, dtype=np.int64)),
            "uniform": pa.array(rng.integers(-(2**60), 2**60, 20_000)),
            "lowcard": pa.array(rng.integers(0, 50, 20_000, dtype=np.int32)),
            "strings": pa.array([f"user-{i % 1000:06d}" for i in range(20_000)]),
        }
    )
    for col in t.column_names:
        ext, _ = encode_table(t.select([col]), EncodeConfig(mode="extended", compression="none"))
        ref, _ = encode_table(t.select([col]), EncodeConfig(mode="reference", compression="none"))
        assert len(ext) <= len(ref) * 1.01, f"{col}: extended {len(ext)} > reference {len(ref)}"
