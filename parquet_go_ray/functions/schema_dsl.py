"""Parquet schema-definition language: parse + print + Arrow conversion.

The reference ships a hand-rolled lexer/parser for the textual schema DSL
(/root/reference/parquetschema/schema_parser.go, entry schema_def.go:94-103)
with strict validation of the LIST/MAP group conventions
(schema_parser.go:776-956). This is the same surface re-built small: a
tokenizer + recursive-descent parser producing a tree of :class:`Field`,
bidirectional conversion to ``pyarrow.Schema`` (LIST/MAP conventions from
/root/reference/schema.go:585-647), and conversion to the Dremel
:class:`~parquet_go_ray.functions.levels.Node` tree.

Grammar (as the reference accepts):

    message <name> {
        <repetition> <type> <name> [(LOGICAL[(args)])] [= <id>] ;
        <repetition> group <name> [(LIST|MAP|...)] { ... }
    }
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import pyarrow as pa

from .levels import Node

PHYSICAL = {"boolean", "int32", "int64", "int96", "float", "double", "binary",
            "fixed_len_byte_array"}
REPETITIONS = {"required", "optional", "repeated"}

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[{}();,=]|\S")


@dataclass
class Field:
    name: str
    repetition: str
    physical: str | None = None  # None -> group
    type_length: int | None = None
    logical: str | None = None
    logical_args: list = dc_field(default_factory=list)
    field_id: int | None = None
    children: list["Field"] = dc_field(default_factory=list)

    @property
    def is_group(self) -> bool:
        return self.physical is None


class SchemaParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.tokens = _TOKEN_RE.findall(text)
        self.pos = 0

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SchemaParseError("unexpected end of schema")
        self.pos += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise SchemaParseError(f"expected {tok!r}, got {t!r}")

    def parse_message(self) -> Field:
        self.expect("message")
        name = self.next()
        root = Field(name=name, repetition="required")
        self.expect("{")
        while self.peek() != "}":
            root.children.append(self.parse_field())
        self.expect("}")
        if self.peek() is not None:
            raise SchemaParseError(f"trailing tokens after message: {self.peek()!r}")
        _validate(root)
        return root

    def parse_field(self) -> Field:
        rep = self.next()
        if rep not in REPETITIONS:
            raise SchemaParseError(f"expected repetition, got {rep!r}")
        t = self.next()
        if t == "group":
            name = self.next()
            f = Field(name=name, repetition=rep)
            if self.peek() == "(":
                self.next()
                f.logical = self.next().upper()
                self.expect(")")
            self.expect("{")
            while self.peek() != "}":
                f.children.append(self.parse_field())
            self.expect("}")
            return f
        if t not in PHYSICAL:
            raise SchemaParseError(f"unknown type {t!r}")
        f = Field(name="", repetition=rep, physical=t)
        if t == "fixed_len_byte_array":
            self.expect("(")
            f.type_length = int(self.next())
            self.expect(")")
        f.name = self.next()
        if self.peek() == "(":
            self.next()
            f.logical = self.next().upper()
            if self.peek() == "(":
                self.next()
                while self.peek() != ")":
                    tok = self.next()
                    if tok != ",":
                        f.logical_args.append(tok)
                self.expect(")")
            self.expect(")")
        if self.peek() == "=":
            self.next()
            f.field_id = int(self.next())
        self.expect(";")
        return f


def _validate(root: Field) -> None:
    """Strict checks mirroring the reference's validator
    (/root/reference/parquetschema/schema_parser.go:776-956)."""

    def walk(f: Field, path: str):
        names = set()
        for c in f.children:
            if c.name in names:
                raise SchemaParseError(f"duplicate field name {c.name!r} in {path or 'root'}")
            names.add(c.name)
        if f.logical == "LIST":
            if f.repetition == "repeated":
                raise SchemaParseError(f"{path}: LIST group must not be repeated")
            if len(f.children) != 1 or f.children[0].repetition != "repeated" or not f.children[0].is_group:
                raise SchemaParseError(f"{path}: LIST must contain exactly one repeated group")
            inner = f.children[0]
            if inner.name not in ("list", "bag", "array"):
                raise SchemaParseError(f"{path}: LIST inner group must be named list/bag/array")
            if len(inner.children) != 1:
                raise SchemaParseError(f"{path}: LIST element group must have one field")
        if f.logical == "MAP":
            if len(f.children) != 1 or f.children[0].repetition != "repeated" or not f.children[0].is_group:
                raise SchemaParseError(f"{path}: MAP must contain one repeated key_value group")
            kv = f.children[0]
            if len(kv.children) != 2:
                raise SchemaParseError(f"{path}: MAP key_value must have key and value")
            if kv.children[0].repetition != "required":
                raise SchemaParseError(f"{path}: MAP key must be required")
        for c in f.children:
            walk(c, f"{path}.{c.name}" if path else c.name)

    walk(root, "")


def parse_schema(text: str) -> Field:
    return _Parser(text).parse_message()


def print_schema(root: Field) -> str:
    """Field tree -> DSL text (parquet-tool schema output parity)."""
    out = [f"message {root.name} {{"]

    def emit(f: Field, indent: int):
        pad = "  " * indent
        ann = ""
        if f.logical:
            args = "(" + ", ".join(f.logical_args) + ")" if f.logical_args else ""
            ann = f" ({f.logical}{args})"
        fid = f" = {f.field_id}" if f.field_id is not None else ""
        if f.is_group:
            out.append(f"{pad}{f.repetition} group {f.name}{ann} {{")
            for c in f.children:
                emit(c, indent + 1)
            out.append(f"{pad}}}")
        else:
            phys = f.physical if f.type_length is None else f"{f.physical}({f.type_length})"
            out.append(f"{pad}{f.repetition} {phys} {f.name}{ann}{fid};")

    for c in root.children:
        emit(c, 1)
    out.append("}")
    return "\n".join(out)


_LOGICAL_TO_ARROW = {
    "STRING": pa.string(), "UTF8": pa.string(), "ENUM": pa.string(),
    "JSON": pa.string(), "BSON": pa.binary(), "UUID": pa.binary(16),
    "DATE": pa.date32(),
}


def _leaf_arrow_type(f: Field) -> pa.DataType:
    if f.logical in _LOGICAL_TO_ARROW:
        return _LOGICAL_TO_ARROW[f.logical]
    if f.logical == "DECIMAL":
        p, s = (int(f.logical_args[0]), int(f.logical_args[1])) if len(f.logical_args) >= 2 else (38, 18)
        return pa.decimal128(p, s)
    if f.logical == "TIMESTAMP":
        unit = {"MILLIS": "ms", "MICROS": "us", "NANOS": "ns"}.get(
            (f.logical_args[-1] if f.logical_args else "MICROS").upper(), "us")
        return pa.timestamp(unit)
    if f.logical == "INT" and len(f.logical_args) >= 2:
        width = int(f.logical_args[0])
        signed = f.logical_args[1].lower() == "true"
        return getattr(pa, f"{'int' if signed else 'uint'}{width}")()
    return {
        "boolean": pa.bool_(), "int32": pa.int32(), "int64": pa.int64(),
        "int96": pa.binary(12), "float": pa.float32(), "double": pa.float64(),
        "binary": pa.binary(),
        "fixed_len_byte_array": pa.binary(f.type_length or 1),
    }[f.physical]


def to_arrow_field(f: Field) -> pa.Field:
    nullable = f.repetition == "optional"
    if not f.is_group:
        t = _leaf_arrow_type(f)
        if f.repetition == "repeated":
            return pa.field(f.name, pa.list_(t), nullable=False)
        return pa.field(f.name, t, nullable=nullable)
    if f.logical == "LIST":
        element = f.children[0].children[0]
        return pa.field(f.name, pa.list_(to_arrow_field(element).type), nullable=nullable)
    if f.logical == "MAP":
        kv = f.children[0]
        key_t = to_arrow_field(kv.children[0]).type
        val_t = to_arrow_field(kv.children[1]).type
        return pa.field(f.name, pa.map_(key_t, val_t), nullable=nullable)
    struct = pa.struct([to_arrow_field(c) for c in f.children])
    if f.repetition == "repeated":
        return pa.field(f.name, pa.list_(struct), nullable=False)
    return pa.field(f.name, struct, nullable=nullable)


def to_arrow_schema(root: Field) -> pa.Schema:
    return pa.schema([to_arrow_field(c) for c in root.children])


def from_arrow_schema(schema: pa.Schema, name: str = "schema") -> Field:
    """pa.Schema -> DSL Field tree (LIST/MAP conventions of the reference)."""

    def conv(fld: pa.Field) -> Field:
        rep = "optional" if fld.nullable else "required"
        t = fld.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            inner = conv(pa.field("element", t.value_type, nullable=t.value_field.nullable))
            return Field(name=fld.name, repetition=rep, logical="LIST",
                         children=[Field(name="list", repetition="repeated", children=[inner])])
        if pa.types.is_map(t):
            kv = Field(name="key_value", repetition="repeated", children=[
                conv(pa.field("key", t.key_type, nullable=False)),
                conv(pa.field("value", t.item_type, nullable=True)),
            ])
            return Field(name=fld.name, repetition=rep, logical="MAP", children=[kv])
        if pa.types.is_struct(t):
            return Field(name=fld.name, repetition=rep, children=[conv(c) for c in t])
        phys, logical, args, tl = _arrow_leaf(t)
        return Field(name=fld.name, repetition=rep, physical=phys, logical=logical,
                     logical_args=args, type_length=tl)

    def _arrow_leaf(t: pa.DataType):
        if pa.types.is_boolean(t):
            return "boolean", None, [], None
        if pa.types.is_int32(t):
            return "int32", None, [], None
        if pa.types.is_int64(t):
            return "int64", None, [], None
        if t in (pa.int8(), pa.int16(), pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()):
            width = t.bit_width
            signed = "true" if pa.types.is_signed_integer(t) else "false"
            phys = "int64" if width == 64 else "int32"
            return phys, "INT", [str(width), signed], None
        if pa.types.is_float32(t):
            return "float", None, [], None
        if pa.types.is_float64(t):
            return "double", None, [], None
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "binary", "STRING", [], None
        if pa.types.is_fixed_size_binary(t):
            return "fixed_len_byte_array", None, [], t.byte_width
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary", None, [], None
        if pa.types.is_decimal(t):
            return "fixed_len_byte_array", "DECIMAL", [str(t.precision), str(t.scale)], 16
        if pa.types.is_timestamp(t):
            unit = {"ms": "MILLIS", "us": "MICROS", "ns": "NANOS"}[t.unit]
            return "int64", "TIMESTAMP", ["true", unit], None
        if pa.types.is_date32(t):
            return "int32", "DATE", [], None
        raise SchemaParseError(f"no DSL mapping for arrow type {t}")

    return Field(name=name, repetition="required", children=[conv(f) for f in schema])


def to_levels_node(f: Field) -> Node:
    """Field tree -> Dremel Node tree (for levels.py shred/assemble)."""
    return Node(f.name, f.repetition, [to_levels_node(c) for c in f.children])
