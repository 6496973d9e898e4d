"""Schema DSL parser/printer/Arrow conversion tests (mirrors the reference's
parquetschema parser tests, /root/reference/parquetschema/schema_parser.go)."""

import pyarrow as pa
import pytest

from parquet_go_ray.functions.levels import fix_levels
from parquet_go_ray.functions.schema_dsl import (
    SchemaParseError,
    from_arrow_schema,
    parse_schema,
    print_schema,
    to_arrow_schema,
    to_levels_node,
)

TOKEN_DSL = """
message doc {
    required binary doc_id (STRING);
    required group tokens (LIST) { repeated group list { required int32 element; } }
    required int32 n_tok;
    required binary source (STRING);
}
"""


def test_parse_token_schema_to_arrow():
    root = parse_schema(TOKEN_DSL)
    schema = to_arrow_schema(root)
    assert schema.field("doc_id").type == pa.string()
    assert schema.field("tokens").type == pa.list_(pa.int32())
    assert schema.field("n_tok").type == pa.int32()
    assert not schema.field("doc_id").nullable


def test_dremel_document_schema():
    dsl = """
    message Document {
        required int64 DocId;
        optional group Links { repeated int32 Backward; repeated int32 Forward; }
        repeated group Name {
            repeated group Language { required binary Code (STRING); optional binary Country (STRING); }
            optional binary Url (STRING);
        }
    }
    """
    root = parse_schema(dsl)
    node = to_levels_node(root)
    fix_levels(node)
    name = [c for c in node.children if c.name == "Name"][0]
    lang = name.children[0]
    assert (lang.max_r, lang.max_d) == (2, 2)
    assert (lang.children[1].max_r, lang.children[1].max_d) == (2, 3)  # Country


def test_roundtrip_print_parse():
    root = parse_schema(TOKEN_DSL)
    text = print_schema(root)
    again = parse_schema(text)
    assert print_schema(again) == text


def test_arrow_roundtrip():
    schema = pa.schema(
        [
            pa.field("a", pa.int64(), nullable=False),
            pa.field("b", pa.string()),
            pa.field("c", pa.list_(pa.int32()), nullable=False),
            pa.field("m", pa.map_(pa.string(), pa.int64())),
            pa.field("s", pa.struct([("x", pa.float64()), ("y", pa.bool_())])),
            pa.field("ts", pa.timestamp("us")),
            pa.field("d", pa.decimal128(12, 2)),
            pa.field("u16", pa.uint16()),
        ]
    )
    root = from_arrow_schema(schema)
    text = print_schema(root)
    back = to_arrow_schema(parse_schema(text))
    assert back.field("a").type == pa.int64() and not back.field("a").nullable
    assert back.field("b").type == pa.string()
    assert back.field("c").type == pa.list_(pa.int32())
    assert back.field("m").type == pa.map_(pa.string(), pa.int64())
    assert back.field("s").type.field("x").type == pa.float64()
    assert back.field("ts").type == pa.timestamp("us")
    assert back.field("d").type == pa.decimal128(12, 2)
    assert back.field("u16").type == pa.uint16()


@pytest.mark.parametrize(
    "bad",
    [
        "message m { required int32 a; required int32 a; }",  # duplicate
        "message m { repeated group l (LIST) { repeated group list { required int32 e; } } }",  # repeated LIST
        "message m { optional group l (LIST) { required int32 e; } }",  # LIST without repeated group
        "message m { optional group mp (MAP) { repeated group key_value { optional binary key (STRING); required int32 v; } } }",  # optional key
        "message m { required int33 a; }",  # bad type
        "message m { required int32 a }",  # missing semicolon
    ],
)
def test_validation_rejects(bad):
    with pytest.raises(SchemaParseError):
        parse_schema(bad)


def test_fixed_len_and_field_id():
    root = parse_schema("message m { required fixed_len_byte_array(16) u (UUID) = 7; }")
    f = root.children[0]
    assert f.type_length == 16 and f.field_id == 7 and f.logical == "UUID"
    assert to_arrow_schema(root).field("u").type == pa.binary(16)
