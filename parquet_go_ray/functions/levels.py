"""Dremel definition/repetition levels at the Parquet-file boundary.

Our engine stores nested data as Arrow offsets+validity (shred.py); this
module provides the conversion to/from classic Dremel (value, dLevel, rLevel)
streams for Parquet interchange and for parity with the reference's level
semantics (/root/reference/schema.go:667-693 recursiveFix,
data_store.go:96-136 add, data_store.go:262-309 get). Golden tests reproduce
the Dremel paper's Document example exactly as the reference does
(/root/reference/data_store_test.go:148-170, 227-346).

Not a hot-path component: the 100 TB pipeline never materializes levels
(SURVEY.md §1.5); this is the boundary/parity layer, so clarity wins over
vectorization here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    """Parquet schema node. repetition: 'required' | 'optional' | 'repeated'."""

    name: str
    repetition: str
    children: list["Node"] = field(default_factory=list)  # empty -> leaf
    max_r: int = 0
    max_d: int = 0

    @property
    def is_leaf(self) -> bool:
        return not self.children


def fix_levels(node: Node, r: int = 0, d: int = 0) -> None:
    """Assign maxR/maxD like the reference's recursiveFix
    (/root/reference/schema.go:667-693): +1 D per non-REQUIRED, +1 R per REPEATED."""
    if node.repetition == "repeated":
        r += 1
        d += 1
    elif node.repetition == "optional":
        d += 1
    node.max_r, node.max_d = r, d
    for c in node.children:
        fix_levels(c, r, d)


def _leaves(node: Node, prefix: str) -> list[str]:
    path = f"{prefix}.{node.name}" if prefix else node.name
    if node.is_leaf:
        return [path]
    out = []
    for c in node.children:
        out.extend(_leaves(c, path))
    return out


def _first_leaf(node: Node, path: str) -> str:
    while not node.is_leaf:
        path = f"{path}.{node.children[0].name}"
        node = node.children[0]
    return path


def shred_to_levels(records: list[dict], root: Node) -> dict[str, dict]:
    """Shred nested records (dicts; repeated fields are lists) into per-leaf
    {"values": [...], "dlevels": [...], "rlevels": [...]} streams.

    Semantics notes (matching the reference):
      * an empty repeated field is indistinguishable from an absent one —
        both emit levels-only (/root/reference/data_store.go:116-119);
      * the first element of a repeated group carries the parent's repetition
        level; subsequent elements carry the node's maxR
        (/root/reference/data_store.go:290-293).
    """
    fix_levels(root)
    out = {p: {"values": [], "dlevels": [], "rlevels": []} for c in root.children for p in _leaves(c, "")}

    def emit_missing(node: Node, prefix: str, r: int, d: int) -> None:
        path = f"{prefix}.{node.name}" if prefix else node.name
        if node.is_leaf:
            s = out[path]
            s["values"].append(None)
            s["dlevels"].append(d)
            s["rlevels"].append(r)
        else:
            for c in node.children:
                emit_missing(c, path, r, d)

    def shred_element(value, node: Node, prefix: str, r: int, d: int) -> None:
        """One element of the field (repetition already resolved by caller)."""
        path = f"{prefix}.{node.name}" if prefix else node.name
        if node.is_leaf:
            s = out[path]
            if value is None:
                if node.repetition == "required":
                    raise ValueError(f"missing required leaf {path}")
                s["values"].append(None)
                s["dlevels"].append(d)
            else:
                s["values"].append(value)
                s["dlevels"].append(d + (0 if node.repetition == "required" else 1))
            s["rlevels"].append(r)
            return
        if value is None:
            if node.repetition == "required":
                raise ValueError(f"missing required group {path}")
            for c in node.children:
                emit_missing(c, path, r, d)
            return
        d_here = d + (0 if node.repetition == "required" else 1)
        for c in node.children:
            shred_field(value.get(c.name), c, path, r, d_here)

    def shred_field(value, node: Node, prefix: str, r: int, d: int) -> None:
        if node.repetition != "repeated":
            shred_element(value, node, prefix, r, d)
            return
        lst = value if value is not None else []
        if not lst:
            emit_missing(node, prefix, r, d)
            return
        for i, el in enumerate(lst):
            shred_element(el, node, prefix, r if i == 0 else node.max_r, d)

    for rec in records:
        for c in root.children:
            shred_field(rec.get(c.name) if rec else None, c, "", 0, 0)
    return out


def assemble_from_levels(streams: dict[str, dict], root: Node, num_records: int) -> list[dict]:
    """Inverse of shred_to_levels: rebuild nested records from level streams.

    Mirrors the reference's assembly: a repeated group keeps consuming while
    the next entry's rLevel equals the node's maxR; group presence is judged
    from the first leaf's dLevel before consumption
    (/root/reference/data_store.go:262-309, schema.go:216-312)."""
    fix_levels(root)
    cursors = {p: 0 for p in streams}

    def read_element(node: Node, prefix: str, path: str):
        """Consume one element; returns (value, present)."""
        if node.is_leaf:
            s = streams[path]
            i = cursors[path]
            cursors[path] = i + 1
            defined = s["dlevels"][i] >= node.max_d
            return (s["values"][i] if defined else None), defined
        lp = _first_leaf(node, path)
        present = streams[lp]["dlevels"][cursors[lp]] >= node.max_d
        obj = {}
        for c in node.children:
            obj[c.name] = read_field(c, path)
        return (obj if present else None), present

    def read_field(node: Node, prefix: str):
        path = f"{prefix}.{node.name}" if prefix else node.name
        if node.repetition != "repeated":
            el, present = read_element(node, prefix, path)
            return el if present else None
        lp = _first_leaf(node, path)
        s = streams[lp]
        elements = []
        first = True
        while True:
            el, present = read_element(node, prefix, path)
            if first and not present:
                return []
            if present:
                elements.append(el)
            first = False
            i = cursors[lp]
            if i >= len(s["rlevels"]) or s["rlevels"][i] < node.max_r:
                return elements

    records = []
    for _ in range(num_records):
        records.append({c.name: read_field(c, "") for c in root.children})
    return records
