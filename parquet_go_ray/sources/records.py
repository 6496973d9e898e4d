"""Record-level convenience API — the role of the reference's ``floor``
package (reflection marshalling, /root/reference/floor/writer.go:72-145,
floor/reader.go) and autoschema (/root/reference/parquetschema/autoschema/gen.go).

Python-native equivalents:
  * :func:`schema_from_dataclass` — reflect a dataclass into a pa.Schema
    (``Optional[T]`` -> nullable, ``list[T]`` -> list, nested dataclasses ->
    struct; a ``metadata={"parquet": "name"}`` field tag renames, like the
    reference's ``parquet:"name"`` struct tags, floor/fieldname.go:10-19).
  * :func:`write_records` / :func:`read_records` — one-call record lists in
    and out of the partition format. Convenience only: the scalable path is
    Arrow batches through the pipelines, never Python rows.
"""

from __future__ import annotations

import dataclasses
import datetime
import types
import typing

import pyarrow as pa

from .columns import EncodeConfig
from .partfile import read_partition, write_partition

_PY_TO_ARROW = {
    bool: pa.bool_(),
    int: pa.int64(),
    float: pa.float64(),
    str: pa.string(),
    bytes: pa.binary(),
    datetime.datetime: pa.timestamp("us"),
    datetime.date: pa.date32(),
}


def _arrow_type(t) -> tuple[pa.DataType, bool]:
    """(arrow type, nullable) for a Python type annotation."""
    origin = typing.get_origin(t)
    if origin in (typing.Union, types.UnionType):
        args = [a for a in typing.get_args(t) if a is not type(None)]
        if len(args) != 1:
            raise TypeError(f"unsupported union {t}")
        inner, _ = _arrow_type(args[0])
        return inner, True
    if origin in (list, typing.List):
        (elem,) = typing.get_args(t)
        et, en = _arrow_type(elem)
        return pa.list_(et), False
    if origin in (dict, typing.Dict):
        kt, vt = typing.get_args(t)
        return pa.map_(_arrow_type(kt)[0], _arrow_type(vt)[0]), False
    if dataclasses.is_dataclass(t):
        fields = []
        for f in dataclasses.fields(t):
            ft, fn = _arrow_type(f.type)
            name = f.metadata.get("parquet", f.name) if f.metadata else f.name
            fields.append(pa.field(name, ft, nullable=fn))
        return pa.struct(fields), False
    if t in _PY_TO_ARROW:
        return _PY_TO_ARROW[t], False
    raise TypeError(f"no arrow mapping for {t}")


def schema_from_dataclass(cls) -> pa.Schema:
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    t, _ = _arrow_type(cls)
    return pa.schema(list(t))


def write_records(records, path: str, schema: pa.Schema | None = None,
                  config: EncodeConfig | None = None) -> dict:
    """Records (dicts or dataclass instances) -> one encoded partition file."""
    rows = [dataclasses.asdict(r) if dataclasses.is_dataclass(r) else r for r in records]
    if schema is None and rows and dataclasses.is_dataclass(records[0]):
        schema = schema_from_dataclass(type(records[0]))
    table = pa.Table.from_pylist(rows, schema=schema)
    return write_partition(table, path, config)


def read_records(path: str, columns: list[str] | None = None) -> list[dict]:
    return read_partition(path, columns).to_pylist()
