"""Round-5 probe pins: exotic Arrow input types through the partition codec.

Each test reproduces a probe from the final-round adversarial pass over
write_partition/read_partition — input shapes a real Ray Data pipeline can
produce (dictionary-encoded read output, sliced zero-copy batches, binary
payload columns) that the oracle corpus never exercises.
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from parquet_go_ray.sources.partfile import read_partition, write_partition


def _roundtrip(tmp_path, table: pa.Table) -> pa.Table:
    path = str(tmp_path / "probe.rdpg")
    write_partition(table, path)
    return read_partition(path)


def test_duplicate_column_names_raise_clearly(tmp_path):
    t = pa.Table.from_arrays([pa.array([1, 2]), pa.array([3, 4])], names=["x", "x"])
    with pytest.raises(ValueError, match="duplicate column name.*'x'"):
        write_partition(t, str(tmp_path / "dup.rdpg"))


def test_dictionary_encoded_input_column(tmp_path):
    # ray.data read output (and pandas categoricals) can carry
    # dictionary-typed columns; values must survive even if the physical
    # type is decoded to plain strings
    arr = pa.array(["a", "b", "a", None, "c"] * 20).dictionary_encode()
    t = pa.table({"doc_id": pa.array([str(i) for i in range(100)]), "s": arr})
    back = _roundtrip(tmp_path, t)
    assert back.column("s").to_pylist() == t.column("s").to_pylist()
    assert back.column("s").type == arr.type  # logical type survives


def test_dictionary_int_values_and_index_width(tmp_path):
    arr = pa.array([10, 20, 10, None], type=pa.int64()).dictionary_encode()
    narrow = arr.cast(pa.dictionary(pa.int8(), pa.int64()))
    t = pa.table({"v": narrow})
    back = _roundtrip(tmp_path, t)
    assert back.column("v").type == narrow.type
    assert back.column("v").to_pylist() == [10, 20, 10, None]


def test_large_list_tokens_column(tmp_path):
    tok = pa.array([[1, 2, 3], [], None, [7]], type=pa.large_list(pa.int32()))
    t = pa.table({"doc_id": pa.array(list("abcd")), "tokens": tok})
    back = _roundtrip(tmp_path, t)
    assert back.column("tokens").to_pylist() == t.column("tokens").to_pylist()


def test_non_utf8_binary_column(tmp_path):
    vals = [b"\x00\xff\xfe", b"", None, bytes(range(256)), b"\x80" * 1000]
    t = pa.table({"doc_id": pa.array(list("abcde")),
                  "blob": pa.array(vals, type=pa.binary())})
    back = _roundtrip(tmp_path, t)
    assert back.column("blob").to_pylist() == vals


def test_hostile_column_names(tmp_path):
    names = ["col/with/slash", "名前", "a b", ""]
    t = pa.Table.from_arrays([pa.array([1, 2])] * 4, names=names)
    back = _roundtrip(tmp_path, t)
    assert back.column_names == names
    assert back.column(0).to_pylist() == [1, 2]


def test_sliced_nonzero_offset_table(tmp_path):
    rng = np.random.default_rng(0)
    big = pa.table({
        "doc_id": pa.array([str(i) for i in range(1000)]),
        "tokens": pa.array([[i, i + 1] for i in range(1000)],
                           type=pa.list_(pa.int32())),
        "f": pa.array(rng.normal(size=1000)),
    })
    sl = big.slice(313, 401)
    back = _roundtrip(tmp_path, sl)
    for c in sl.column_names:
        assert back.column(c).to_pylist() == sl.column(c).to_pylist(), c


def test_zero_length_chunks_input(tmp_path):
    c = pa.chunked_array([pa.array([], type=pa.int64()), pa.array([1, 2]),
                          pa.array([], type=pa.int64()), pa.array([3])])
    t = pa.Table.from_arrays([c], names=["x"])
    back = _roundtrip(tmp_path, t)
    assert back.column("x").to_pylist() == [1, 2, 3]


def test_temporal_types_bit_exact_and_type_preserving(tmp_path):
    t = pa.table({
        # 2**60 us is outside datetime.datetime range — compares must stay
        # in Arrow (to_pylist would itself overflow), which is exactly why
        # this value is here: the codec must not round-trip through Python
        "ts_us": pa.array([0, 1, None, 2**60], type=pa.timestamp("us")),
        "ts_ns_tz": pa.array([0, -5, 7, None], type=pa.timestamp("ns", tz="UTC")),
        "d": pa.array([0, 1, None, 20000], type=pa.date32()),
        "t64": pa.array([0, 1, None, 86399999999], type=pa.time64("us")),
    })
    back = _roundtrip(tmp_path, t)
    for c in t.column_names:
        a, b = t.column(c), back.column(c)
        assert a.type == b.type, f"{c}: {a.type} -> {b.type}"
        ai = a.cast(pa.int64() if a.type != pa.date32() else pa.int32())
        bi = b.cast(pa.int64() if b.type != pa.date32() else pa.int32())
        assert pc.all(pc.equal(pc.fill_null(ai, -1), pc.fill_null(bi, -1))).as_py(), c
        assert a.null_count == b.null_count, c


def test_dotted_name_vs_nested_path_collision(tmp_path):
    # stream paths flatten the schema tree with "." — before escaping, the
    # struct child s -> "a.b" and the column "s.a" -> "b" shared the path
    # "s.a.b" and decode silently cross-wired their values
    t = pa.table({
        "s": pa.array([{"a.b": 1}], type=pa.struct([("a.b", pa.int64())])),
        "s.a": pa.array([{"b": 99}], type=pa.struct([("b", pa.int64())])),
    })
    back = _roundtrip(tmp_path, t)
    assert back.equals(t), back.to_pydict()


def test_column_named_like_list_child_path(tmp_path):
    t = pa.table({
        "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
        "tokens.item": pa.array([7], type=pa.int32()),
    })
    back = _roundtrip(tmp_path, t)
    assert back.equals(t), back.to_pydict()


def test_escape_alias_columns(tmp_path):
    # the escaped form of "a.b" is "a%2Eb" — a column literally named that
    # must not collide with the escaping of "a.b"
    t = pa.table({"a%2Eb": pa.array([1]), "a.b": pa.array([2])})
    back = _roundtrip(tmp_path, t)
    assert back.equals(t), back.to_pydict()


def test_projection_of_dotted_column_name(tmp_path):
    from parquet_go_ray.sources.partfile import read_partition as rp
    t = pa.table({"a.b": pa.array([5, 6]), "c": pa.array([7, 8])})
    path = str(tmp_path / "dotted.rdpg")
    write_partition(t, path)
    assert rp(path, columns=["a.b"]).to_pydict() == {"a.b": [5, 6]}


def test_duplicate_struct_field_names_raise(tmp_path):
    t = pa.table({"s": pa.array(
        [(1, 2)], type=pa.struct([pa.field("d", pa.int64()),
                                  pa.field("d", pa.int64())]))})
    with pytest.raises(ValueError, match="duplicate struct field name"):
        write_partition(t, str(tmp_path / "dupstruct.rdpg"))


def test_decimal256_roundtrip(tmp_path):
    # shred hardcoded width 16 — decimal256 (32 bytes) silently truncated
    # at encode and then failed opaquely at decode
    from decimal import Decimal
    vals = [Decimal("123456789012345678901234567890.12"), None, Decimal("-1.01")]
    t = pa.table({"d": pa.array(vals, type=pa.decimal256(50, 2))})
    back = _roundtrip(tmp_path, t)
    assert back.equals(t), back.to_pydict()


def test_dictionary_child_of_null_struct_row(tmp_path):
    # Arrow leaves values behind null slots unspecified: a null struct row
    # can mask a dictionary child whose index points outside the dictionary
    # (here: empty dictionary, index 0) — cast() raised ArrowIndexError
    child = pa.DictionaryArray.from_arrays(
        pa.array([0], type=pa.int32()), pa.array([], type=pa.string()),
        safe=False)
    s = pa.StructArray.from_arrays(
        [child], names=["x"], mask=pa.array([True]))  # the one row is null
    t = pa.Table.from_arrays([s], names=["s"])
    back = _roundtrip(tmp_path, t)
    assert back.column("s").null_count == 1
    assert back.column("s").type == s.type


def test_parquet_read_zero_row_temporal_columns(tmp_path):
    # a zero-row column chunk decodes to an empty uint8 placeholder; the
    # logical conversion tried uint8->timestamp, which has no cast kernel
    import pyarrow.parquet as pq

    from parquet_go_ray.sources import parquet_compat as pcq

    t = pa.table({"ts": pa.array([], type=pa.timestamp("us")),
                  "t64": pa.array([], type=pa.time64("us")),
                  "s": pa.array([], type=pa.string())})
    p = str(tmp_path / "zr.parquet")
    pq.write_table(t, p)
    assert pcq.read_parquet_with_our_kernels(p).cast(t.schema).equals(t)


def test_shuffle_rank_string_ids(ray_session):
    # a real text corpus has string doc ids; the shuffle previously assumed
    # integer-castable ids and died in numpy astype mid-task
    import ray.data as rd

    from parquet_go_ray.ops.shuffle import deterministic_shuffle_rank

    t = pa.table({"doc_id": pa.array([f"doc-{i}" for i in range(300)] + ["", "é中"]),
                  "v": pa.array(range(302))})
    r1 = deterministic_shuffle_rank(rd.from_arrow(t), seed=3).to_pandas().sort_values("doc_id")
    assert sorted(r1.shuffle_pos) == list(range(302))  # bijective
    r2 = deterministic_shuffle_rank(rd.from_arrow(t), seed=3).to_pandas().sort_values("doc_id")
    assert (r1.shuffle_pos.values == r2.shuffle_pos.values).all()  # reproducible
    r3 = deterministic_shuffle_rank(rd.from_arrow(t), seed=4).to_pandas().sort_values("doc_id")
    assert (r1.shuffle_pos.values != r3.shuffle_pos.values).any()  # seed-keyed


def test_shuffle_rank_null_ids_raise(ray_session):
    import ray.data as rd

    from parquet_go_ray.ops.shuffle import deterministic_shuffle_rank

    t = pa.table({"doc_id": pa.array(["a", None]), "v": pa.array([1, 2])})
    with pytest.raises(Exception, match="must be non-null"):
        deterministic_shuffle_rank(rd.from_arrow(t)).to_pandas()


def test_float16_roundtrip_bit_exact(tmp_path):
    # fp16 embedding tables are standard in training corpora; previously
    # rejected at shred. Bit-exactness checked through uint16 views (covers
    # -0.0 / inf / subnormals without float comparison semantics).
    import numpy as np

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(200, 16)).astype(np.float16)
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(201) * 16, type=pa.int32()), pa.array(emb.reshape(-1)))
    specials = np.array([1.5, -0.0, np.inf, -np.inf, 65504.0, 6e-8] * 50,
                        dtype=np.float16)
    t = pa.table({"vec_id": pa.array(range(200), type=pa.int64()),
                  "embedding": lists,
                  "h": pa.array(specials[:200])})
    back = _roundtrip(tmp_path, t)
    assert back.schema.equals(t.schema)
    for c in ("embedding", "h"):
        a, b = t.column(c).combine_chunks(), back.column(c).combine_chunks()
        if pa.types.is_list(a.type):
            a, b = a.flatten(), b.flatten()
        assert np.array_equal(np.asarray(a).view(np.uint16),
                              np.asarray(b).view(np.uint16)), c


def test_null_typed_column(tmp_path):
    t = pa.table({"doc_id": pa.array(["a", "b"]),
                  "v": pa.array([None, None], type=pa.null())})
    try:
        back = _roundtrip(tmp_path, t)
    except (ValueError, NotImplementedError):
        return  # honest rejection is acceptable
    assert back.column("v").null_count == 2
