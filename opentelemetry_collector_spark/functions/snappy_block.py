"""Snappy BLOCK format encode/decode — no snappy library.

The Prometheus remote-write transport is ``snappy.Encode`` of a
protobuf ``WriteRequest`` (reference:
exporter/prometheusremotewriteexporter/exporter.go:31,160-170); this
module supplies the framing so the wire can be produced and consumed
in this environment. Implements the PUBLIC block-format spec
(google/snappy format_description.txt):

* preamble: uncompressed length, little-endian varint;
* tag low 2 bits: 00 literal (len-1 in the upper 6 bits, values
  60..63 meaning the next 1..4 little-endian bytes carry len-1),
  01 copy with 1-byte offset (3-bit len-4, 11-bit offset),
  10 copy with 2-byte LE offset (6-bit len-1),
  11 copy with 4-byte LE offset (6-bit len-1);
* copies may self-overlap (byte-at-a-time semantics), offset 0 is
  invalid, output must land exactly on the declared length.

The decoder accepts the full format (any compliant encoder's output).
The encoder emits spec-valid streams with a greedy 4-byte-hash
matcher producing 2-byte-offset copies — compression in snappy is
OPTIONAL (an all-literal stream is compliant), so correctness never
depends on match quality; ``compress=False`` forces the all-literal
form for tests and worst-case inputs.
"""

from __future__ import annotations


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated snappy length varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("snappy length varint overflow")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    n = end - start
    while n > 0:
        chunk = min(n, 1 << 16)  # keep length encodings small + simple
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += data[start : start + chunk]
        start += chunk
        n -= chunk


def compress(data: bytes, compress: bool = True) -> bytes:
    """Snappy block-format encode. Greedy hash matcher: a 4-byte match
    within the 64 KiB copy-2 window becomes a chain of copy ops (≤ 64
    bytes each, the copy-2 length ceiling); everything else is
    literal. ``compress=False`` emits the pure-literal form."""
    out = bytearray(_uvarint(len(data)))
    if not data:
        return bytes(out)
    if not compress or len(data) < 8:
        _emit_literal(out, data, 0, len(data))
        return bytes(out)

    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    limit = len(data) - 4
    while i <= limit:
        key = int.from_bytes(data[i : i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or data[cand : cand + 4] != data[i : i + 4]:
            i += 1
            continue
        # extend the match
        m = i + 4
        c = cand + 4
        while m < len(data) and data[m] == data[c]:
            m += 1
            c += 1
        _emit_literal(out, data, lit_start, i)
        offset = i - cand
        length = m - i
        while length > 0:
            ln = min(length, 64)
            # spec: copy-2 length must be in [1, 64]
            out.append(((ln - 1) << 2) | 0b10)
            out += offset.to_bytes(2, "little")
            length -= ln
        lit_start = m
        i = m
    _emit_literal(out, data, lit_start, len(data))
    return bytes(out)


def decompress(buf: bytes) -> bytes:
    """Snappy block-format decode — full tag set, overlap-correct."""
    total, pos = _read_uvarint(buf, 0)
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(buf):
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(buf):
                raise ValueError("truncated literal body")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 0b01:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0b111)
            if pos >= len(buf):
                raise ValueError("truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 0b10:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > len(buf):
                raise ValueError("truncated copy-2 offset")
            offset = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > len(buf):
                raise ValueError("truncated copy-4 offset")
            offset = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(f"snappy copy offset {offset} out of range")
        # overlap-correct: copy byte-at-a-time when offset < length
        src = len(out) - offset
        if offset >= length:
            out += out[src : src + length]
        else:
            for _ in range(length):
                out.append(out[src])
                src += 1
    if len(out) != total:
        raise ValueError(
            f"snappy stream decoded to {len(out)} bytes, header said {total}"
        )
    return bytes(out)
