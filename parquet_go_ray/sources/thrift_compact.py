"""Minimal Thrift Compact Protocol reader (read-only, schema-less).

Just enough of the compact protocol to parse Apache Parquet metadata
(FileMetaData, PageHeader) — the role of the reference's generated bindings
(/root/reference/parquet/parquet.go) without code generation: structs come
back as {field_id: value} dicts and are interpreted by the caller
(parquet_compat.py) using the field ids from the parquet.thrift spec.

Wire format (thrift compact protocol spec):
  varint        ULEB128
  int16/32/64   zigzag varint
  struct field  header byte (delta<<4)|type; delta==0 -> long form
                (zigzag-varint field id follows); type 0 terminates
  bool          encoded IN the field type (1=true, 2=false)
  binary        varint length + bytes
  list/set      header (size<<4)|elem_type; size==15 -> varint size follows
  double        8 bytes little-endian
"""

from __future__ import annotations

import struct

T_STOP = 0
T_TRUE = 1
T_FALSE = 2
T_BYTE = 3
T_I16 = 4
T_I32 = 5
T_I64 = 6
T_DOUBLE = 7
T_BINARY = 8
T_LIST = 9
T_SET = 10
T_MAP = 11
T_STRUCT = 12


class CompactReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def uvarint(self) -> int:
        result = 0
        shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def zigzag(self) -> int:
        u = self.uvarint()
        return (u >> 1) ^ -(u & 1)

    def read_value(self, ftype: int):
        if ftype == T_TRUE:
            return True
        if ftype == T_FALSE:
            return False
        if ftype == T_BYTE:
            v = self.buf[self.pos]
            self.pos += 1
            return v - 256 if v > 127 else v
        if ftype in (T_I16, T_I32, T_I64):
            return self.zigzag()
        if ftype == T_DOUBLE:
            if self.pos + 8 > len(self.buf):
                raise ValueError("thrift compact: truncated double")
            v = struct.unpack_from("<d", self.buf, self.pos)[0]
            self.pos += 8
            return v
        if ftype == T_BINARY:
            n = self.uvarint()
            v = self.buf[self.pos : self.pos + n]
            self.pos += n
            return v
        if ftype in (T_LIST, T_SET):
            header = self.buf[self.pos]
            self.pos += 1
            size = header >> 4
            etype = header & 0x0F
            if size == 15:
                size = self.uvarint()
            # malformed guard: a boolean list element consumes zero bytes, so
            # an absurd size would otherwise spin for 2^60 iterations
            if size > len(self.buf) - self.pos + 1:
                raise ValueError(f"thrift compact: list size {size} exceeds buffer")
            return [self.read_value(etype) for _ in range(size)]
        if ftype == T_MAP:
            size = self.uvarint()
            if size == 0:
                return {}
            # same malformed guard as T_LIST: bool/bool entries consume zero
            # bytes each, so an absurd declared size would spin unbounded
            if size > len(self.buf) - self.pos + 1:
                raise ValueError(f"thrift compact: map size {size} exceeds buffer")
            kv = self.buf[self.pos]
            self.pos += 1
            kt, vt = kv >> 4, kv & 0x0F
            return {self.read_value(kt): self.read_value(vt) for _ in range(size)}
        if ftype == T_STRUCT:
            return self.read_struct()
        raise ValueError(f"thrift compact: unknown type {ftype}")

    def read_struct(self) -> dict:
        depth = getattr(self, "_depth", 0)
        if depth > 100:
            raise ValueError("thrift compact: structs nested too deeply")
        self._depth = depth + 1
        try:
            out: dict[int, object] = {}
            last_id = 0
            while True:
                if self.pos >= len(self.buf):
                    raise ValueError("thrift compact: truncated struct")
                header = self.buf[self.pos]
                self.pos += 1
                if header == T_STOP:
                    return out
                delta = header >> 4
                ftype = header & 0x0F
                fid = last_id + delta if delta else self.zigzag()
                last_id = fid
                out[fid] = self.read_value(ftype)
        finally:
            self._depth = depth


# ----------------------------------------------------------------- writer
def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> bytes:
    return _uvarint((v << 1) ^ (v >> 63))


class CompactWriter:
    """Minimal compact-protocol emitter: structs are lists of
    (field_id, type, value) with ids strictly increasing."""

    @staticmethod
    def value(ftype: int, v) -> bytes:
        if ftype in (T_TRUE, T_FALSE):
            return b""
        if ftype in (T_I16, T_I32, T_I64):
            return _zigzag(int(v))
        if ftype == T_DOUBLE:
            return struct.pack("<d", v)
        if ftype == T_BINARY:
            b = v.encode() if isinstance(v, str) else bytes(v)
            return _uvarint(len(b)) + b
        if ftype == T_STRUCT:
            return CompactWriter.struct_(v)
        if ftype == T_LIST:
            etype, items = v
            head = bytearray()
            if len(items) < 15:
                head.append((len(items) << 4) | etype)
            else:
                head.append((15 << 4) | etype)
                head += _uvarint(len(items))
            for it in items:
                head += CompactWriter.value(etype, it)
            return bytes(head)
        raise ValueError(f"thrift write: unsupported type {ftype}")

    @staticmethod
    def struct_(fields) -> bytes:
        out = bytearray()
        last = 0
        for fid, ftype, v in fields:
            if ftype == T_TRUE and v is False:
                ftype = T_FALSE
            delta = fid - last
            if 0 < delta < 16:
                out.append((delta << 4) | ftype)
            else:
                out.append(ftype)
                out += _zigzag(fid)
            last = fid
            out += CompactWriter.value(ftype, v)
        out.append(T_STOP)
        return bytes(out)
