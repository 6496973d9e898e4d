"""floor-equivalent record API tests (reflection marshal + autoschema)."""

import dataclasses
import datetime
from typing import Optional

import pyarrow as pa

from parquet_go_ray.sources.records import read_records, schema_from_dataclass, write_records


@dataclasses.dataclass
class Doc:
    doc_id: str
    tokens: list[int]
    n_tok: int
    score: Optional[float]
    created: datetime.datetime
    alias: str = dataclasses.field(default="", metadata={"parquet": "renamed_alias"})


def test_schema_from_dataclass():
    s = schema_from_dataclass(Doc)
    assert s.field("doc_id").type == pa.string() and not s.field("doc_id").nullable
    assert s.field("tokens").type == pa.list_(pa.int64())
    assert s.field("score").nullable and s.field("score").type == pa.float64()
    assert s.field("created").type == pa.timestamp("us")
    assert "renamed_alias" in s.names and "alias" not in s.names


def test_write_read_records_roundtrip(tmp_path):
    now = datetime.datetime(2026, 8, 17, 12, 0, 0)
    docs = [
        Doc("d1", [1, 2, 3], 3, 0.5, now, "a"),
        Doc("d2", [], 0, None, now, "b"),
        Doc("d3", [7], 1, -1.5, now, "c"),
    ]
    rows = [dataclasses.asdict(d) for d in docs]
    for d in rows:
        d["renamed_alias"] = d.pop("alias")
    path = str(tmp_path / "docs.rdpg")
    lineage = write_records(rows, path, schema=schema_from_dataclass(Doc))
    assert lineage["num_rows"] == 3
    back = read_records(path)
    assert back[0]["doc_id"] == "d1" and back[0]["tokens"] == [1, 2, 3]
    assert back[1]["score"] is None and back[1]["tokens"] == []
    assert back[2]["renamed_alias"] == "c"


def test_nested_dataclass_struct():
    @dataclasses.dataclass
    class Inner:
        x: int
        y: Optional[str]

    @dataclasses.dataclass
    class Outer:
        name: str
        inner: Inner
        items: list[int]

    s = schema_from_dataclass(Outer)
    assert s.field("inner").type == pa.struct([pa.field("x", pa.int64(), nullable=False),
                                               pa.field("y", pa.string())])
