"""Hypothesis property tests — the role of the reference's go-fuzz harnesses
(/root/reference/types_fuzz.go, hybrid_fuzz.go, deltabp_fuzz.go): randomized
roundtrips over adversarial value shapes for every codec family."""

import os

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


# ----------------------------------------------------- round 2: dremel layer
_scalar = st.one_of(st.none(), st.integers(-(2**40), 2**40))
_inner = st.one_of(
    _scalar,
    st.lists(_scalar, max_size=4),
    st.fixed_dictionaries({"x": _scalar, "y": st.one_of(st.none(), st.text(max_size=6))}),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(_inner, max_size=4)), min_size=0, max_size=12),
       st.integers(0, 2))
def test_dremel_shred_assemble_property(rows, shape):
    """Random nested values roundtrip through the vectorized Dremel layer."""
    import pyarrow as pa

    from parquet_go_ray.sources.dremel import (assemble_column, fix_levels,
                                               node_from_arrow, shred_column)

    types = [
        pa.list_(pa.int64()),
        pa.list_(pa.struct([("x", pa.int64()), ("y", pa.string())])),
        pa.list_(pa.list_(pa.int64())),
    ]
    t = types[shape]
    # coerce the random rows into the chosen type, dropping incompatible cells
    def coerce(cell):
        if cell is None:
            return None
        out = []
        for v in cell:
            if shape == 0:
                out.append(v if isinstance(v, int) else None)
            elif shape == 1:
                if isinstance(v, dict):
                    out.append({"x": v.get("x"), "y": v.get("y")})
                else:
                    out.append(None)
            else:
                if isinstance(v, list):
                    out.append([x for x in v if isinstance(x, int) or x is None])
                elif v is None:
                    out.append(None)
                else:
                    out.append([v] if isinstance(v, int) else None)
        return out

    arr = pa.array([coerce(r) for r in rows], type=t)
    node = node_from_arrow(pa.field("c", t))
    fix_levels(node)
    smap = {tuple(s.path): {"reps": s.reps, "defs": s.defs, "values": s.values}
            for s in shred_column(arr, node)}
    assert assemble_column(node, smap).equals(arr)


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
                                                   max_size=5)),
                     min_size=0, max_size=10),
       version=st.sampled_from([1, 2]))
def test_parquet_nested_roundtrip_property(rows, version):
    """Random nullable list<int32> tables survive our parquet writer -> pyarrow
    AND pyarrow writer -> our reader, both page versions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import tempfile

    from parquet_go_ray.sources import parquet_compat as pcq

    t = pa.table({"l": pa.array(rows, type=pa.list_(pa.int32())),
                  "i": pa.array(range(len(rows)), type=pa.int64())})
    d = tempfile.mkdtemp(prefix="pgr-prop-", dir="/tmp")
    p1 = str(os.path.join(d, "ours.parquet"))
    pcq.write_parquet_with_our_kernels(t, p1, data_page_version=version)
    assert pq.read_table(p1).cast(t.schema).equals(t)
    p2 = str(os.path.join(d, "pa.parquet"))
    pq.write_table(t, p2)
    assert pcq.read_parquet_with_our_kernels(p2).cast(t.schema).equals(t)


@given(
    st.integers(1, 40), st.integers(1, 40),
    st.sampled_from([1, 3, 4]), st.sampled_from([0, 1, 2]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, ch, filt, seed):
    from parquet_go_ray.functions import imagecodec as ic

    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png(px, filter_type=filt)), px)


@given(st.integers(1, 40), st.integers(1, 40), st.sampled_from([3, 4]),
       st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, ch, seed):
    from parquet_go_ray.functions import imagecodec as ic

    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


@given(st.lists(st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                         min_size=0, max_size=12),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_dedup_segments_matches_python_reference(docs):
    import pyarrow as pa

    from parquet_go_ray.ops.text import _dedup_segments_batch

    texts = [" ".join(words) for words in docs]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    got = _dedup_segments_batch(t, " ", "text").column("text").to_pylist()

    def ref(s):
        seen, out = set(), []
        for seg in s.split(" "):
            if seg not in seen:
                seen.add(seg)
                out.append(seg)
        return " ".join(out)

    assert got == [ref(s) for s in texts]


@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=60),
       st.integers(0, 1000))
@settings(max_examples=25, deadline=None)
def test_local_cc_matches_union_find(pairs, _seed):
    from parquet_go_ray.ops.cluster import _local_cc

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    src = np.array([a for a, _ in pairs] + [b for _, b in pairs], dtype=np.int64)
    dst = np.array([b for _, b in pairs] + [a for a, _ in pairs], dtype=np.int64)
    nodes, labels = _local_cc(src, dst)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in nodes}
    assert dict(zip(nodes.tolist(), labels.tolist())) == expect
