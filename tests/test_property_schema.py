"""Arbitrary-schema roundtrip property: random Arrow type TREES (nested
lists/structs/maps over every supported leaf type, hostile field names,
random nulls) through encode_table -> decode_table must come back
type-identical and value-identical.

test_property_stack pins the codec composition on the north-star token
shape; THIS file pins the schema walk itself — the shred/assemble path
addressing, name escaping, and per-type stream layout. The round-5
dictionary and dotted-name bugs lived exactly in this space.
"""

from decimal import Decimal

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from parquet_go_ray.sources.partfile import decode_table, encode_table

SETTINGS = dict(max_examples=80, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.data_too_large])

# names stress the path escaping: dots, percents, unicode, whitespace
_name = st.one_of(
    st.sampled_from(["x", "y", "z", "a.b", "a%2Eb", "tokens.item",
                     "名", " ", "item"]),
    st.text(alphabet="ab.%é ", min_size=1, max_size=5),
)

_LEAVES = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.float16(), pa.float32(), pa.float64(), pa.bool_(),
    pa.string(), pa.binary(), pa.large_string(), pa.large_binary(),
    pa.binary(3), pa.decimal128(20, 4), pa.decimal256(50, 6),
    pa.date32(), pa.time64("us"), pa.timestamp("us"),
    pa.timestamp("ns", tz="UTC"),
    pa.dictionary(pa.int32(), pa.string()),
    pa.dictionary(pa.int8(), pa.int64()),
]
_leaf = st.sampled_from(_LEAVES)

_INT_BOUNDS = {
    "int8": (-(2**7), 2**7 - 1), "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1), "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 2**8 - 1), "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1), "uint64": (0, 2**64 - 1),
}


def _type_trees(depth: int):
    if depth == 0:
        return _leaf
    sub = _type_trees(depth - 1)
    return st.one_of(
        _leaf,
        sub.map(pa.list_),
        sub.map(pa.large_list),
        st.lists(st.tuples(_name, sub), min_size=1, max_size=3,
                 unique_by=lambda kv: kv[0]).map(pa.struct),
        st.tuples(st.sampled_from([pa.string(), pa.int64()]), sub).map(
            lambda kv: pa.map_(*kv)),
    )


_tree = _type_trees(2)


def _scalar(draw, t: pa.DataType):
    s = str(t)
    if s in _INT_BOUNDS:
        lo, hi = _INT_BOUNDS[s]
        return draw(st.integers(lo, hi))
    if pa.types.is_floating(t):
        width = {2: 16, 4: 32, 8: 64}[t.byte_width]
        # NaN excluded: Arrow .equals is NaN != NaN; NaN/-0.0/inf
        # bit-exactness is pinned separately in test_property_stack
        val = draw(st.floats(allow_nan=False, width=width))
        return np.float16(val) if width == 16 else val
    if pa.types.is_boolean(t):
        return draw(st.booleans())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return draw(st.text(max_size=8))
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return draw(st.binary(max_size=8))
    if pa.types.is_fixed_size_binary(t):
        return draw(st.binary(min_size=t.byte_width, max_size=t.byte_width))
    if pa.types.is_decimal(t):
        digits = min(t.precision, 18)
        unscaled = draw(st.integers(-(10**digits) + 1, 10**digits - 1))
        return Decimal(unscaled).scaleb(-t.scale)
    if pa.types.is_date32(t):
        return draw(st.integers(-100_000, 100_000))
    if pa.types.is_time(t):
        return draw(st.integers(0, 86_399_999_999))
    if pa.types.is_timestamp(t):
        return draw(st.integers(-(2**60), 2**60))
    raise NotImplementedError(s)


def _value(draw, t: pa.DataType, allow_null: bool = True):
    if allow_null and not pa.types.is_map(t) and draw(st.integers(0, 7)) == 0:
        return None  # shred rejects nullable MAP rows; everything else nulls
    if pa.types.is_dictionary(t):
        return _value(draw, t.value_type)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        n = draw(st.integers(0, 3))
        return [_value(draw, t.value_type) for _ in range(n)]
    if pa.types.is_struct(t):
        return {f.name: _value(draw, f.type) for f in t}
    if pa.types.is_map(t):
        n = draw(st.integers(0, 3))
        keys = {_scalar(draw, t.key_type) for _ in range(n)}  # unique, non-null
        return [(k, _value(draw, t.item_type)) for k in keys]
    return _scalar(draw, t)


@st.composite
def tables(draw):
    n_cols = draw(st.integers(1, 3))
    names = draw(st.lists(_name, min_size=n_cols, max_size=n_cols, unique=True))
    n_rows = draw(st.integers(0, 8))
    cols, fields = [], []
    for name in names:
        t = draw(_tree)
        vals = [_value(draw, t) for _ in range(n_rows)]
        if pa.types.is_timestamp(t) and t.unit == "us":
            # python ints overflow datetime conversion; build via int64 cast
            arr = pa.array(vals, type=pa.int64()).cast(t)
        else:
            arr = pa.array(vals, type=t)
        cols.append(arr)
        fields.append(pa.field(name, t))
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


@settings(**SETTINGS)
@given(t=tables(), compression=st.sampled_from(["none", "snappy"]))
def test_arbitrary_schema_roundtrip(t, compression):
    from parquet_go_ray.stages.codec import EncodeConfig

    body, lineage = encode_table(t, EncodeConfig(compression=compression))
    back = decode_table(body)
    assert back.schema.equals(t.schema), f"{t.schema}\n!=\n{back.schema}"
    assert back.equals(t), (lineage.get("codecs"), t.to_pydict())


_INT_CODECS = ["PLAIN", "DICT", "DELTA_BP", "FOR", "FOR_DELTA", "BSS"]
_BYTES_CODECS = ["PLAIN", "DELTA_LENGTH_BA", "DELTA_BA", "FSST_BA"]
_FLOAT_CODECS = ["PLAIN", "DICT", "BSS", "ALP", "ALP_RD"]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(data=st.data())
def test_forced_codecs_on_arbitrary_schemas(data):
    """Every forced-codec choice must stay bit-exact on any schema — the
    selector normally picks per-chunk, but column_codecs overrides it, so
    each kernel must hold on value shapes it would never be chosen for."""
    from parquet_go_ray.functions.shred import path_segment
    from parquet_go_ray.stages.codec import EncodeConfig

    t = data.draw(tables())
    codecs = {}
    for f in t.schema:
        ty = f.type.value_type if pa.types.is_dictionary(f.type) else f.type
        key = path_segment(f.name)
        if (pa.types.is_integer(ty) or pa.types.is_date32(ty)
                or pa.types.is_time(ty) or pa.types.is_timestamp(ty)):
            if data.draw(st.booleans()):
                codecs[key] = data.draw(st.sampled_from(_INT_CODECS))
        elif pa.types.is_string(ty) or pa.types.is_binary(ty):
            if data.draw(st.booleans()):
                codecs[key] = data.draw(st.sampled_from(_BYTES_CODECS))
        elif pa.types.is_floating(ty):
            if data.draw(st.booleans()):
                codecs[key] = data.draw(st.sampled_from(_FLOAT_CODECS))
    cfg = EncodeConfig(
        compression=data.draw(st.sampled_from(["none", "snappy", "zstd"])),
        page_bytes=data.draw(st.sampled_from([64, 4096])),
        column_codecs=codecs,
        mode=data.draw(st.sampled_from(["reference", "extended"])),
    )
    body, lineage = encode_table(t, cfg)
    back = decode_table(body)
    assert back.equals(t), (cfg, lineage.get("codecs"), t.to_pydict())


# ---- the same property at the PARQUET conformance boundary ----------------
# our writer must be readable by pyarrow, and pyarrow's files by our reader,
# for arbitrary nested schemas over the parquet-expressible leaf set

_PARQUET_LEAVES = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(),
    pa.float32(), pa.float64(), pa.bool_(),
    pa.string(), pa.binary(), pa.decimal128(20, 4),
    pa.date32(), pa.time64("us"), pa.timestamp("us"),
]


@st.composite
def parquet_tables(draw):
    global _leaf, _tree
    saved_leaf, saved_tree = _leaf, _tree
    _leaf = st.sampled_from(_PARQUET_LEAVES)
    _tree = _type_trees(2)
    try:
        return draw(tables())
    finally:
        _leaf, _tree = saved_leaf, saved_tree


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(t=parquet_tables(), version=st.sampled_from([1, 2]))
def test_arbitrary_schema_parquet_conformance(t, version):
    import os
    import tempfile

    import pyarrow.parquet as pq
    from hypothesis import assume

    from parquet_go_ray.sources import parquet_compat as pcq

    d = tempfile.mkdtemp(prefix="pgr-pcprop-", dir="/tmp")
    p1 = os.path.join(d, "ours.parquet")
    try:
        pcq.write_parquet_with_our_kernels(t, p1, data_page_version=version)
    except NotImplementedError:
        assume(False)  # honest unsupported-type gate, not a conformance bug
    back = pq.read_table(p1).cast(t.schema)
    assert back.equals(t), (t.schema, t.to_pydict(), back.to_pydict())
    p2 = os.path.join(d, "pa.parquet")
    pq.write_table(t, p2)
    try:
        ours = pcq.read_parquet_with_our_kernels(p2)
    except NotImplementedError:
        assume(False)
    assert ours.cast(t.schema).equals(t), (t.schema, ours.to_pydict())
