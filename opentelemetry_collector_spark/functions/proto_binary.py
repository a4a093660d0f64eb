"""Minimal protobuf (proto3) binary reader/writer — no protobuf
library. The encoding layer shared by the OTLP binary wire
(``sources/otlp_proto.py``; the encoding the reference's OTLP gRPC
receiver decodes, receiver/otlpreceiver/logs/otlp.go:53-77) and the
Jaeger protobuf wire (``sources/jaeger_proto.py``,
translator/trace/jaeger/jaegerproto_to_traces.go).

Wire format (public protobuf spec): a message is a sequence of
``tag = (field_number << 3) | wire_type`` keys, each followed by a
value. Wire types used by the OTLP/Jaeger protos: 0 varint (ints,
bools, enums), 1 fixed64 (double, fixed64 nanos), 2 length-delimited
(strings, bytes, sub-messages, packed), 5 fixed32. Unknown fields are
skippable for forward compatibility, exactly like the thrift codec
(functions/thrift_binary.py) this mirrors."""

from __future__ import annotations

import struct
from collections.abc import Iterator

VARINT, FIXED64, LEN, FIXED32 = 0, 1, 2, 5


class Reader:
    def __init__(self, buf: bytes, end: int | None = None):
        self.buf = buf
        self.pos = 0
        self.end = len(buf) if end is None else end

    def varint(self) -> int:
        shift = result = 0
        while True:
            if self.pos >= self.end:
                # bounded by this (sub-)message's end, not the whole
                # buffer: a varint must not bleed into sibling fields
                raise ValueError("varint exceeds message bounds")
            b = self.buf[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 63:
                raise ValueError("varint longer than 64 bits")

    def int64(self) -> int:
        """varint interpreted as two's-complement int64 (proto3 int64/
        int32 negative values are encoded as 10-byte varints)."""
        v = self.varint()
        return v - (1 << 64) if v >= 1 << 63 else v

    def fixed64(self) -> int:
        if self.pos + 8 > self.end:
            raise ValueError("fixed64 exceeds message bounds")
        v = struct.unpack_from("<Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def double(self) -> float:
        if self.pos + 8 > self.end:
            raise ValueError("double exceeds message bounds")
        v = struct.unpack_from("<d", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def fixed32(self) -> int:
        if self.pos + 4 > self.end:
            raise ValueError("fixed32 exceeds message bounds")
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def bytes_(self) -> bytes:
        n = self.varint()
        if self.pos + n > self.end:
            # strict: a slice would silently return SHORT data on a
            # truncated buffer, or bleed past a sub-message bound into
            # sibling fields — malformed payloads must error, not
            # produce plausible garbage
            raise ValueError("length-delimited field exceeds buffer")
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def string(self) -> str:
        return self.bytes_().decode("utf-8", "replace")

    def message(self) -> "Reader":
        """Length-delimited sub-message as a bounded sub-reader."""
        n = self.varint()
        if self.pos + n > self.end:
            raise ValueError("sub-message exceeds buffer")
        sub = Reader(self.buf, self.pos + n)
        sub.pos = self.pos
        self.pos += n
        return sub

    def skip(self, wire_type: int) -> None:
        if wire_type == VARINT:
            self.varint()
        elif wire_type == FIXED64:
            if self.pos + 8 > self.end:
                raise ValueError("skipped fixed64 exceeds message bounds")
            self.pos += 8
        elif wire_type == LEN:
            # read the length BEFORE adding: `pos += varint()` would
            # evaluate the old pos first and lose the length prefix's
            # own width, desyncing on every skipped LEN field
            n = self.varint()
            if self.pos + n > self.end:
                raise ValueError("skipped length-delimited field exceeds buffer")
            self.pos += n
        elif wire_type == FIXED32:
            if self.pos + 4 > self.end:
                raise ValueError("skipped fixed32 exceeds message bounds")
            self.pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")

    def fields(self) -> Iterator[tuple[int, int]]:
        """(field_number, wire_type) until the end of this (sub-)
        message; caller must read or skip every yielded field."""
        while self.pos < self.end:
            key = self.varint()
            yield key >> 3, key & 0x7


class Writer:
    def __init__(self):
        self.out = bytearray()

    def varint(self, v: int):
        if v < 0:
            v += 1 << 64  # two's-complement 64-bit, like proto int64
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def tag(self, field: int, wire_type: int):
        self.varint((field << 3) | wire_type)

    def int_(self, field: int, v: int):
        """varint field, omitted when zero (proto3 default elision)."""
        if v:
            self.tag(field, VARINT)
            self.varint(v)

    def fixed64(self, field: int, v: int):
        if v:
            self.tag(field, FIXED64)
            self.out += struct.pack("<Q", v)

    def double(self, field: int, v: float):
        if v != 0.0:
            self.tag(field, FIXED64)
            self.out += struct.pack("<d", v)

    def fixed32(self, field: int, v: int):
        if v:
            self.tag(field, FIXED32)
            self.out += struct.pack("<I", v)

    def bool_(self, field: int, v: bool):
        if v:
            self.tag(field, VARINT)
            self.varint(1)

    def bytes_(self, field: int, v: bytes, keep_empty: bool = False):
        if v or keep_empty:
            self.tag(field, LEN)
            self.varint(len(v))
            self.out += v

    def string(self, field: int, v: str, keep_empty: bool = False):
        self.bytes_(field, v.encode("utf-8"), keep_empty)

    def message(self, field: int, payload: "Writer | bytes", keep_empty: bool = False):
        buf = payload.out if isinstance(payload, Writer) else payload
        if buf or keep_empty:
            self.tag(field, LEN)
            self.varint(len(buf))
            self.out += buf
