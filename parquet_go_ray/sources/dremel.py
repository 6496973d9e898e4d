"""Vectorized Dremel shredding/assembly for arbitrary nesting.

Bridges Arrow arrays and Parquet (repetition, definition, values) level
streams for ANY schema shape — structs, LIST, MAP, optional-in-repeated,
arbitrarily deep — the generality of the reference's schema tree
(/root/reference/schema.go:837-891 column creation, data_store.go:96-136 add,
data_store.go:262-309 get), but computed with numpy over whole columns
instead of per-record recursion. ``functions/levels.py`` keeps the
record-oriented implementation as the readable spec + paper goldens; this
module is the engine the parquet-compat reader/writer run on.

Core representation during shredding: a flat array of "entries" per leaf
(one per Dremel level slot) carrying
  idx   >= 0  -> alive, points at a slot of the current arrow array
  idx   == -1 -> dead at some ancestor; ``ddef`` holds its final def level
Entries only multiply at repeated nodes (np.repeat keeps record order), so
every pass is a vectorized gather/scatter.

Assembly inverts it: at repetition context r, a node's slots are the entries
with rep <= r; element membership at a repeated node is defs >= d+1. Each
group level becomes one offsets/validity buffer build.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ConvertedType ids (parquet.thrift)
CONV_UTF8 = 0
CONV_MAP = 1
CONV_MAP_KEY_VALUE = 2
CONV_LIST = 3
CONV_DECIMAL = 5
CONV_DATE = 6
CONV_TIME_MILLIS = 7
CONV_TIME_MICROS = 8
CONV_TS_MILLIS = 9
CONV_TS_MICROS = 10
CONV_UINT = {8: 11, 16: 12, 32: 13, 64: 14}
CONV_INT = {8: 15, 16: 16, 32: 17, 64: 18}


@dataclass
class PNode:
    """Parquet schema node (writer- and reader-side)."""

    name: str
    repetition: str  # required | optional | repeated
    kind: str  # leaf | struct | list | map
    children: list["PNode"] = dc_field(default_factory=list)
    phys: str | None = None  # leaf physical type name
    type_length: int | None = None  # flba length
    converted: int | None = None
    logical: tuple | None = None  # e.g. ("ts", "ns")
    precision: int | None = None
    scale: int | None = None
    arrow: pa.DataType | None = None  # leaf arrow type for reconstruction
    max_r: int = 0
    max_d: int = 0

    @property
    def is_leaf(self) -> bool:
        return self.kind == "leaf"


def fix_levels(node: PNode, r: int = 0, d: int = 0) -> None:
    if node.repetition == "repeated":
        r += 1
        d += 1
    elif node.repetition == "optional":
        d += 1
    node.max_r, node.max_d = r, d
    for c in node.children:
        fix_levels(c, r, d)


# --------------------------------------------------------------- arrow -> tree
def node_from_arrow(fld: pa.Field, *, int96_ns: bool = False,
                    repetition: str | None = None) -> PNode:
    """Build the parquet schema node for an arrow field (writer side)."""
    t = fld.type
    rep = repetition or ("optional" if fld.nullable else "required")
    if pa.types.is_dictionary(t):
        return node_from_arrow(pa.field(fld.name, t.value_type, fld.nullable),
                               int96_ns=int96_ns, repetition=repetition)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        elem = node_from_arrow(pa.field("element", t.value_type, t.value_field.nullable),
                               int96_ns=int96_ns)
        mid = PNode("list", "repeated", "struct", [elem])
        return PNode(fld.name, rep, "list", [mid], converted=CONV_LIST)
    if pa.types.is_map(t):
        key = node_from_arrow(pa.field("key", t.key_type, False), int96_ns=int96_ns)
        val = node_from_arrow(pa.field("value", t.item_type, t.item_field.nullable),
                              int96_ns=int96_ns)
        mid = PNode("key_value", "repeated", "struct", [key, val])
        return PNode(fld.name, rep, "map", [mid], converted=CONV_MAP)
    if pa.types.is_struct(t):
        kids = [node_from_arrow(t.field(i), int96_ns=int96_ns) for i in range(t.num_fields)]
        return PNode(fld.name, rep, "struct", kids)
    # leaves
    n = PNode(fld.name, rep, "leaf", arrow=t)
    if pa.types.is_boolean(t):
        n.phys = "boolean"
    elif pa.types.is_int32(t):
        n.phys = "int32"
    elif pa.types.is_int64(t):
        n.phys = "int64"
    elif t in (pa.int8(), pa.int16()):
        n.phys, n.converted = "int32", CONV_INT[t.bit_width]
    elif t in (pa.uint8(), pa.uint16(), pa.uint32()):
        n.phys, n.converted = "int32", CONV_UINT[t.bit_width]
    elif pa.types.is_uint64(t):
        n.phys, n.converted = "int64", CONV_UINT[64]
    elif pa.types.is_float32(t):
        n.phys = "float32"
    elif pa.types.is_float64(t):
        n.phys = "float64"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        n.phys, n.converted = "byte_array", CONV_UTF8
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        n.phys = "byte_array"
    elif pa.types.is_date32(t):
        n.phys, n.converted = "int32", CONV_DATE
    elif pa.types.is_timestamp(t) and t.unit == "ms":
        n.phys, n.logical = "int64", ("ts", "ms")
    elif pa.types.is_timestamp(t) and t.unit == "us":
        n.phys, n.logical = "int64", ("ts", "us")
    elif pa.types.is_timestamp(t) and t.unit == "ns":
        if int96_ns:
            n.phys, n.type_length = "int96", 12
        else:
            n.phys, n.logical = "int64", ("ts", "ns")
    elif pa.types.is_time32(t) and t.unit == "ms":
        n.phys, n.converted = "int32", CONV_TIME_MILLIS
    elif pa.types.is_time64(t) and t.unit == "us":
        n.phys, n.converted = "int64", CONV_TIME_MICROS
    elif pa.types.is_fixed_size_binary(t):
        n.phys, n.type_length = "flba", t.byte_width
    elif pa.types.is_decimal128(t):
        n.phys, n.type_length = "flba", 16
        n.converted, n.precision, n.scale = CONV_DECIMAL, t.precision, t.scale
    else:
        raise NotImplementedError(f"parquet writer: unsupported arrow type {t}")
    return n


# ------------------------------------------------------------------- shredder
@dataclass
class LeafStream:
    path: list[str]
    node: PNode  # the leaf
    reps: np.ndarray  # uint8, one per entry
    defs: np.ndarray  # uint8, one per entry
    values: pa.Array  # non-null leaf values in order
    max_r: int
    max_d: int


def _ragged_within(lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens[:-1])]), lens
    )


def shred_column(arr: pa.Array | pa.ChunkedArray, node: PNode) -> list[LeafStream]:
    """Shred one top-level column into its leaf level streams."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    idx = np.arange(n, dtype=np.int64)
    rep = np.zeros(n, dtype=np.uint8)
    ddef = np.zeros(n, dtype=np.uint8)
    out: list[LeafStream] = []
    _shred(arr, node, idx, rep, ddef, 0, 0, [node.name], out)
    return out


def _gather_validity(arr: pa.Array, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(alive mask, per-entry validity at idx) — dead entries read as invalid."""
    alive = idx >= 0
    ok = np.zeros(len(idx), dtype=bool)
    if arr.null_count == 0:
        ok[alive] = True
    else:
        valid = np.asarray(pc.is_valid(arr))
        ok[alive] = valid[idx[alive]]
    return alive, ok


def _shred(arr: pa.Array, node: PNode, idx, rep, ddef, d: int, r: int,
           path: list[str], out: list[LeafStream]) -> None:
    if node.repetition == "optional":
        alive, ok = _gather_validity(arr, idx)
        dead_now = alive & ~ok
        if dead_now.any():
            idx = np.where(dead_now, np.int64(-1), idx)
            ddef = np.where(dead_now, np.uint8(d), ddef).astype(np.uint8)
        d += 1

    if node.is_leaf:
        alive = idx >= 0
        defs = np.where(alive, np.uint8(d), ddef).astype(np.uint8)
        take = idx[alive]
        values = arr.take(pa.array(take)) if len(take) else arr.slice(0, 0)
        out.append(LeafStream(path, node, rep.astype(np.uint8), defs, values, r, d))
        return

    if node.kind == "struct":
        st = arr  # StructArray (possibly with nulls already handled)
        at = st.type
        for i, child in enumerate(node.children):
            _shred(st.field(i), child, idx, rep, ddef, d, r, path + [child.name], out)
        return

    # list / map: expand via the repeated middle group
    mid = node.children[0]
    if node.kind == "map":
        offs = np.asarray(arr.offsets, dtype=np.int64)
        child_arrays = [arr.keys, arr.items]
    elif pa.types.is_fixed_size_list(arr.type):
        size = arr.type.list_size
        offs = (np.arange(len(arr) + 1, dtype=np.int64) + arr.offset) * size
        child_arrays = [arr.values]
    else:
        offs = np.asarray(arr.offsets, dtype=np.int64)
        child_arrays = [arr.values]

    alive = idx >= 0
    lens = np.zeros(len(idx), dtype=np.int64)
    if alive.any():
        ia = idx[alive]
        lens[alive] = offs[ia + 1] - offs[ia]
    counts = np.where(alive, np.maximum(lens, 1), 1)
    total = int(counts.sum())
    starts = np.zeros(len(idx), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    new_idx = np.full(total, -1, dtype=np.int64)
    new_rep = np.full(total, np.uint8(r + 1), dtype=np.uint8)
    new_ddef = np.zeros(total, dtype=np.uint8)
    new_rep[starts] = rep
    # heads: dead stay dead; alive-but-empty die at the (post-optional) d
    new_ddef[starts] = np.where(alive & (lens == 0), np.uint8(d), ddef).astype(np.uint8)
    m = alive & (lens > 0)
    if m.any():
        lm = lens[m]
        within = _ragged_within(lm)
        dest = np.repeat(starts[m], lm) + within
        new_idx[dest] = np.repeat(offs[idx[m]], lm) + within

    d += 1
    r += 1
    if node.kind == "map":
        key_node, val_node = mid.children
        _shred(child_arrays[0], key_node, new_idx, new_rep, new_ddef, d, r,
               path + [mid.name, key_node.name], out)
        _shred(child_arrays[1], val_node, new_idx, new_rep, new_ddef, d, r,
               path + [mid.name, val_node.name], out)
    else:
        elem = mid.children[0]
        _shred(child_arrays[0], elem, new_idx, new_rep, new_ddef, d, r,
               path + [mid.name, elem.name], out)


# ------------------------------------------------------------------- assembly
def assemble_column(node: PNode, streams: dict[tuple, dict]) -> pa.Array:
    """Rebuild the arrow array for one top-level column.

    ``streams``: leaf path tuple (excluding the root) -> {"reps", "defs",
    "values"} where values is a pa.Array of the non-null leaf values.
    """
    cols = {p: dict(s) for p, s in streams.items()}
    return _build(node, cols, 0, 0, (node.name,))


def _first(cols: dict) -> dict:
    return next(iter(cols.values()))


def _subcols(cols: dict, prefix: tuple, child: str) -> dict:
    want = prefix + (child,)
    return {p: s for p, s in cols.items() if p[: len(want)] == want}


def _slot_mask(reps: np.ndarray, r: int) -> np.ndarray:
    return reps <= r


def _leaf_to_arrow(node: PNode, values: pa.Array) -> pa.Array:
    """Physical -> logical conversion for reader-built values (already done
    for writer-shredded streams, where values carry the arrow type)."""
    return values


def _build(node: PNode, cols: dict, d: int, r: int, prefix: tuple) -> pa.Array:
    if node.repetition == "optional":
        d += 1

    if node.is_leaf:
        s = _first(cols)
        defs = s["defs"]
        values: pa.Array = s["values"]
        valid = defs >= d
        if bool(valid.all()) and len(values) == len(defs):
            return values
        pos = np.cumsum(valid, dtype=np.int64) - 1
        take = pa.array(np.where(valid, pos, 0), mask=~valid)
        if len(values) == 0:
            return pa.nulls(len(defs), values.type)
        return values.take(take)

    if node.kind == "struct":
        s = _first(cols)
        slots = _slot_mask(s["reps"], r)
        n_slots = int(slots.sum())
        kids = []
        names = []
        for child in node.children:
            sub = _subcols(cols, prefix, child.name)
            kids.append(_build(child, sub, d, r, prefix + (child.name,)))
            names.append(child.name)
        if node.repetition == "optional":
            valid = s["defs"][slots] >= d
            mask = pa.array(~valid)
        else:
            mask = None
        return pa.StructArray.from_arrays(kids, names, mask=mask)

    # list / map
    mid = node.children[0]
    s = _first(cols)
    reps, defs = s["reps"], s["defs"]
    slots = _slot_mask(reps, r)  # starts of this node's instances
    elem_entry = defs >= d + 1  # entries belonging to some element
    elem_start = _slot_mask(reps, r + 1) & elem_entry
    # elements per slot: count elem_starts between consecutive slot starts
    slot_pos = np.flatnonzero(slots)
    cum = np.concatenate([[0], np.cumsum(elem_start)])
    bounds = np.append(slot_pos, len(reps))
    counts = cum[bounds[1:]] - cum[bounds[:-1]]
    offsets = np.zeros(len(slot_pos) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    present = defs[slot_pos] >= d  # null list vs (empty or non-empty)

    # Each leaf's entry count can differ here (deeper repeated nodes multiply
    # entries), so element membership is judged per leaf from ITS OWN defs:
    # defs >= d+1 keeps exactly the entries inside some element of this node.
    filt = {}
    for p, st in cols.items():
        m = st["defs"] >= d + 1
        filt[p] = {k: (v[m] if isinstance(v, np.ndarray) else v) for k, v in st.items()}

    # offsets-with-nulls convention: null at offsets[i] marks list i null;
    # the final boundary offset is always valid
    off_mask = np.append(~present, False)
    off_arr = pa.array(offsets.astype(np.int32), mask=off_mask)
    if node.kind == "map":
        key_node, val_node = mid.children
        kp = prefix + (mid.name, key_node.name)
        vp = prefix + (mid.name, val_node.name)
        keys = _build(key_node, {p: st for p, st in filt.items() if p[: len(kp)] == kp},
                      d + 1, r + 1, kp)
        items = _build(val_node, {p: st for p, st in filt.items() if p[: len(vp)] == vp},
                       d + 1, r + 1, vp)
        return pa.MapArray.from_arrays(off_arr, keys, items)
    elem = mid.children[0]
    child = _build(elem, filt, d + 1, r + 1, prefix + (mid.name, elem.name))
    return pa.ListArray.from_arrays(off_arr, child)
