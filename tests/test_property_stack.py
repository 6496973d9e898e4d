"""Whole-stack property: a random token-shaped table through the FULL
encode path — codec auto-selection, plane trials (BSS/FOR/delta/FSST/dict),
page slicing, block compression, footer — must decode bit-identical.

The per-codec properties in test_property.py pin each kernel alone; this
pins their COMPOSITION (selector decisions interact with value shape,
nulls, empty lists, extreme values, and the page compressor). The shape
mirrors the north-star input (doc_id:string, tokens:list<int32>,
n_tok:int32, source:string) plus the scalar types the engine ships.
"""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from parquet_go_ray.sources.columns import EncodeConfig
from parquet_go_ray.sources.partfile import decode_table, encode_table

SETTINGS = dict(max_examples=60, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.data_too_large])

_i32 = st.integers(-(2**31), 2**31 - 1)

# token lists: empty, null, short random, and long runs (dict/RLE/FOR bait)
_tokens = st.one_of(
    st.none(),
    st.lists(_i32, max_size=20),
    st.integers(0, 50).map(lambda n: [7] * n),          # constant run
    st.integers(0, 30).map(lambda n: list(range(n))),    # ramp (delta bait)
)

_doc_id = st.one_of(st.none(), st.text(max_size=12),
                    st.sampled_from(["", "a", "é中\U0001f600"]))
_source = st.one_of(st.none(), st.sampled_from(["cc", "wiki", "code", "s"]))


@st.composite
def token_tables(draw):
    n = draw(st.integers(0, 120))
    toks = [draw(_tokens) for _ in range(n)]
    return pa.table({
        "doc_id": pa.array([draw(_doc_id) for _ in range(n)], pa.string()),
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "n_tok": pa.array(
            [len(t) if t is not None else None for t in toks], pa.int32()),
        "source": pa.array([draw(_source) for _ in range(n)], pa.string()),
    })


@settings(**SETTINGS)
@given(t=token_tables(), compression=st.sampled_from(["none", "snappy",
                                                      "zstd"]),
       mode=st.sampled_from(["extended", "reference"]),
       page_bytes=st.sampled_from([64, 1 << 20]))
def test_token_table_roundtrip_bit_identical(t, compression, mode,
                                             page_bytes):
    cfg = EncodeConfig(compression=compression, mode=mode,
                       page_bytes=page_bytes)  # tiny pages force multi-page
    body, lineage = encode_table(t, cfg)
    back = decode_table(body)
    assert back.schema == t.schema
    assert back.equals(t), (lineage.get("codecs"), t.to_pydict())


@st.composite
def scalar_tables(draw):
    """Every scalar physical type in one table, independent null masks,
    adversarial float values (inf/-0.0/nan handled as bit-patterns)."""
    n = draw(st.integers(0, 80))

    def col(strat):
        return [draw(st.one_of(st.none(), strat)) for _ in range(n)]

    floats = st.one_of(
        st.floats(allow_nan=False, width=64),
        st.sampled_from([0.0, -0.0, float("inf"), float("-inf")]))
    return pa.table({
        "i64": pa.array(col(st.integers(-(2**63), 2**63 - 1)), pa.int64()),
        "i32": pa.array(col(_i32), pa.int32()),
        "f64": pa.array(col(floats), pa.float64()),
        "b": pa.array(col(st.booleans()), pa.bool_()),
        "s": pa.array(col(st.text(max_size=16)), pa.string()),
        "bin": pa.array(col(st.binary(max_size=16)), pa.binary()),
    })


@settings(**SETTINGS)
@given(t=scalar_tables(), compression=st.sampled_from(["none", "zstd"]))
def test_scalar_table_roundtrip_bit_identical(t, compression):
    body, lineage = encode_table(t, EncodeConfig(compression=compression))
    back = decode_table(body)
    assert back.schema == t.schema
    assert back.equals(t), (lineage.get("codecs"), t.to_pydict())


_x = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))
_struct_ty = __import__("pyarrow").struct([("x", __import__("pyarrow").int32()),
                                           ("s", __import__("pyarrow").string())])
_struct_row = st.one_of(
    st.none(),
    st.fixed_dictionaries({"x": _x, "s": st.one_of(st.none(),
                                                   st.text(max_size=6))}))

# the three nesting shapes with distinct level algebra: list<struct>
# (ancestor-absorbed values — the pyarrow num_nulls trap), struct<list>,
# and map (key required, value optional)
_nested_cols = {
    "ls": (st.one_of(st.none(), st.lists(_struct_row, max_size=4)),
           lambda pa: pa.list_(_struct_ty)),
    "sl": (st.one_of(st.none(), st.fixed_dictionaries(
        {"l": st.one_of(st.none(), st.lists(_x, max_size=4))})),
        lambda pa: pa.struct([("l", pa.list_(pa.int32()))])),
    "m": (st.one_of(st.none(), st.lists(
        st.tuples(st.text(alphabet="abc", max_size=3), _x),
        max_size=3, unique_by=lambda kv: kv[0])),
        lambda pa: pa.map_(pa.string(), pa.int32())),
}


@st.composite
def nested_tables(draw):
    n = draw(st.integers(0, 30))
    cols = {}
    for name, (strat, ty) in _nested_cols.items():
        cols[name] = pa.array([draw(strat) for _ in range(n)], ty(pa))
    return pa.table(cols)


@settings(**dict(SETTINGS, max_examples=25))
@given(t=nested_tables(), version=st.sampled_from([1, 2]),
       rg_rows=st.sampled_from([None, 3]))
def test_parquet_conformance_nested_property(t, version, rg_rows):
    """Nested shapes (list<struct>, struct<list>, map) with nulls at every
    nesting depth survive both interop directions at v1 AND v2 pages.
    Pins the v2 stored-value-count fix: parquet-cpp's DataPageHeaderV2
    num_nulls omits levels absorbed by null/empty ancestors, so the count
    must come from the def levels."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from parquet_go_ray.sources import parquet_compat as pcq

    d = tempfile.mkdtemp(prefix="pgr-prop-nested-", dir="/tmp")
    try:
        p1 = os.path.join(d, "ours.parquet")
        pcq.write_parquet_with_our_kernels(t, p1, data_page_version=version,
                                           row_group_rows=rg_rows)
        assert pq.read_table(p1).cast(t.schema).equals(t)
        p2 = os.path.join(d, "pa.parquet")
        pq.write_table(t, p2, data_page_version=f"{version}.0",
                       row_group_size=rg_rows or 2**20)
        assert pcq.read_parquet_with_our_kernels(p2).cast(t.schema).equals(t)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(**dict(SETTINGS, max_examples=25))
@given(t=scalar_tables(), version=st.sampled_from([1, 2]))
def test_parquet_conformance_scalar_property(t, version):
    """Mixed-scalar tables (independent null masks, inf/-0.0, unicode,
    binary) survive BOTH interop directions: our parquet writer read by
    pyarrow, and pyarrow's file read by our kernels — v1 and v2 pages.
    Extends test_property.py's nested-list conformance property to every
    scalar physical type at once."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from parquet_go_ray.sources import parquet_compat as pcq

    d = tempfile.mkdtemp(prefix="pgr-prop-scalar-", dir="/tmp")
    try:
        p1 = os.path.join(d, "ours.parquet")
        pcq.write_parquet_with_our_kernels(t, p1, data_page_version=version)
        assert pq.read_table(p1).cast(t.schema).equals(t)
        p2 = os.path.join(d, "pa.parquet")
        pq.write_table(t, p2, data_page_version=f"{version}.0")
        assert pcq.read_parquet_with_our_kernels(p2).cast(t.schema).equals(t)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
