"""Property-based tests for the two hand-written wire codecs.

``functions/proto_binary.py`` and ``functions/thrift_binary.py`` are
load-bearing for five wire formats (OTLP proto, Jaeger proto, Zipkin v2
proto, Jaeger thrift, Zipkin v1 thrift); hypothesis drives the encoder
with arbitrary field soups and checks the three invariants every
translator relies on: (1) write→read round-trips every value exactly,
(2) ``skip`` advances the cursor to precisely the next field (so
unknown fields are forward-compatible, mirroring the reference's
skippable-unknown-field behavior in its generated codecs), and
(3) proto3 zero-elision never drops a non-default value.

Pure Python — no SparkSession fixture, safe to run standalone.
"""

from __future__ import annotations
import pytest

# slow lane: hypothesis wire-codec properties; directed codec tests stay in the fast lane
pytestmark = pytest.mark.slow

import struct

from hypothesis import given, settings, strategies as st

from opentelemetry_collector_spark.functions import proto_binary as pb
from opentelemetry_collector_spark.functions import thrift_binary as tb

# ---------------------------------------------------------------- proto

uint64s = st.integers(min_value=0, max_value=(1 << 64) - 1)
int64s = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
uint32s = st.integers(min_value=0, max_value=(1 << 32) - 1)
finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)


@given(uint64s)
def test_proto_varint_roundtrip(v):
    w = pb.Writer()
    w.varint(v)
    assert pb.Reader(bytes(w.out)).varint() == v


@given(int64s)
def test_proto_signed_varint_roundtrip(v):
    w = pb.Writer()
    w.varint(v)
    assert pb.Reader(bytes(w.out)).int64() == v


# a "field soup": list of (field_number, kind, value) written in order.
# Values avoid proto3 defaults so elision cannot legally drop them.
def _soup_fields(lo: int, hi: int):
    fids = st.integers(lo, hi)
    return st.one_of(
        st.tuples(fids, st.just("int"), int64s.filter(lambda v: v != 0)),
        st.tuples(fids, st.just("fixed64"), uint64s.filter(lambda v: v != 0)),
        st.tuples(fids, st.just("fixed32"), uint32s.filter(lambda v: v != 0)),
        st.tuples(fids, st.just("double"),
                  finite_doubles.filter(lambda v: v != 0.0)),
        st.tuples(fids, st.just("string"), st.text(min_size=1, max_size=40)),
        st.tuples(fids, st.just("bytes"), st.binary(min_size=1, max_size=40)),
    )


field_soups = st.lists(_soup_fields(1, 100), min_size=1, max_size=12)
# disjoint field-number range: an unknown field sharing a known field's
# number+wire-type is legitimately indistinguishable in protobuf
unknown_soups = st.lists(_soup_fields(101, 200), min_size=1, max_size=12)

_WIRE = {"int": pb.VARINT, "fixed64": pb.FIXED64, "fixed32": pb.FIXED32,
         "double": pb.FIXED64, "string": pb.LEN, "bytes": pb.LEN}


def _write_soup(w: pb.Writer, soup):
    for fid, kind, v in soup:
        getattr(w, {"int": "int_", "fixed64": "fixed64",
                    "fixed32": "fixed32", "double": "double",
                    "string": "string", "bytes": "bytes_"}[kind])(fid, v)


def _read_soup(r: pb.Reader, soup):
    """Read fields in written order, checking tag + value each time."""
    it = iter(soup)
    for field, wt in r.fields():
        fid, kind, v = next(it)
        assert (field, wt) == (fid, _WIRE[kind])
        if kind == "int":
            assert r.int64() == v
        elif kind == "fixed64":
            assert r.fixed64() == v
        elif kind == "fixed32":
            assert r.fixed32() == v
        elif kind == "double":
            got = r.double()
            assert got == v or (got != got and v != v)
        elif kind == "string":
            assert r.string() == v
        else:
            assert r.bytes_() == v
    assert next(it, None) is None, "reader ended before all fields"


@settings(max_examples=200)
@given(field_soups)
def test_proto_field_soup_roundtrip(soup):
    w = pb.Writer()
    _write_soup(w, soup)
    _read_soup(pb.Reader(bytes(w.out)), soup)


@settings(max_examples=200)
@given(field_soups)
def test_proto_skip_lands_on_next_field(soup):
    """Skipping every field in turn must land exactly at end — the
    forward-compat invariant every translator's unknown-field arm
    relies on."""
    w = pb.Writer()
    _write_soup(w, soup)
    r = pb.Reader(bytes(w.out))
    n = 0
    for _field, wt in r.fields():
        r.skip(wt)
        n += 1
    assert n == len(soup)
    assert r.pos == r.end


@settings(max_examples=100)
@given(field_soups, unknown_soups)
def test_proto_unknown_fields_are_transparent(known, unknown):
    """Interleave unknown fields after each known one; a decoder that
    skips anything it does not expect still reads the known values."""
    w = pb.Writer()
    for i, (fid, kind, v) in enumerate(known):
        _write_soup(w, [(fid, kind, v)])
        if i < len(unknown):
            _write_soup(w, [unknown[i]])
    r = pb.Reader(bytes(w.out))
    got = []
    expect_tags = {}
    for fid, kind, v in known:
        expect_tags.setdefault((fid, _WIRE[kind], kind), []).append(v)
    it = iter(known)
    pending = next(it, None)
    for field, wt in r.fields():
        if pending and (field, wt) == (pending[0], _WIRE[pending[1]]):
            kind = pending[1]
            if kind == "int":
                got.append(r.int64())
            elif kind == "fixed64":
                got.append(r.fixed64())
            elif kind == "fixed32":
                got.append(r.fixed32())
            elif kind == "double":
                got.append(r.double())
            elif kind == "string":
                got.append(r.string())
            else:
                got.append(r.bytes_())
            pending = next(it, None)
        else:
            r.skip(wt)
    assert pending is None
    assert len(got) == len(known)
    for (fid, kind, v), g in zip(known, got):
        assert g == v or (g != g and v != v)


@settings(max_examples=100)
@given(field_soups, field_soups)
def test_proto_nested_message_bounds(inner_soup, outer_soup):
    """A sub-reader must be bounded to its own payload: reading the
    nested message to completion leaves the outer cursor on the next
    outer field."""
    inner = pb.Writer()
    _write_soup(inner, inner_soup)
    w = pb.Writer()
    w.message(7, inner)
    _write_soup(w, outer_soup)
    r = pb.Reader(bytes(w.out))
    fields = r.fields()
    field, wt = next(fields)
    assert (field, wt) == (7, pb.LEN)
    sub = r.message()
    _read_soup(sub, inner_soup)
    # outer continues where the sub-message ended
    rest = 0
    for _f, wt in fields:
        r.skip(wt)
        rest += 1
    assert rest == len(outer_soup)
    assert r.pos == r.end


# --------------------------------------------------------------- thrift

_tfield = st.one_of(
    st.tuples(st.integers(1, 3000), st.just(tb.BOOL), st.booleans()),
    st.tuples(st.integers(1, 3000), st.just(tb.BYTE),
              st.integers(-128, 127)),
    st.tuples(st.integers(1, 3000), st.just(tb.I16),
              st.integers(-(1 << 15), (1 << 15) - 1)),
    st.tuples(st.integers(1, 3000), st.just(tb.I32),
              st.integers(-(1 << 31), (1 << 31) - 1)),
    st.tuples(st.integers(1, 3000), st.just(tb.I64),
              st.integers(-(1 << 63), (1 << 63) - 1)),
    st.tuples(st.integers(1, 3000), st.just(tb.DOUBLE), finite_doubles),
    st.tuples(st.integers(1, 3000), st.just(tb.STRING),
              st.binary(max_size=40)),
)
tstructs = st.lists(_tfield, min_size=0, max_size=10)


def _twrite_struct(w: tb.Writer, fields):
    for fid, ftype, v in fields:
        w.field(fid, ftype)
        if ftype == tb.BOOL:
            w.byte(1 if v else 0)
        elif ftype == tb.BYTE:
            w.byte(v)
        elif ftype == tb.I16:
            w.i16(v)
        elif ftype == tb.I32:
            w.i32(v)
        elif ftype == tb.I64:
            w.i64(v)
        elif ftype == tb.DOUBLE:
            w.double(v)
        else:
            w.string(v)
    w.stop()


@settings(max_examples=200)
@given(tstructs)
def test_thrift_struct_roundtrip(fields):
    w = tb.Writer()
    _twrite_struct(w, fields)
    r = tb.Reader(bytes(w.out))
    it = iter(fields)
    for fid, ftype in r.fields():
        efid, eftype, v = next(it)
        assert (fid, ftype) == (efid, eftype)
        if ftype == tb.BOOL:
            assert r.bool_() == v
        elif ftype == tb.BYTE:
            assert r.byte() == v
        elif ftype == tb.I16:
            assert r.i16() == v
        elif ftype == tb.I32:
            assert r.i32() == v
        elif ftype == tb.I64:
            assert r.i64() == v
        elif ftype == tb.DOUBLE:
            assert r.double() == v
        else:
            assert r.binary() == v
    assert next(it, None) is None
    assert r.pos == len(w.out)


@settings(max_examples=200)
@given(tstructs, tstructs)
def test_thrift_skip_nested_struct_and_list(inner, outer):
    """skip(STRUCT) and skip(LIST) must consume exactly the nested
    payload: after skipping field 1 (a struct) and field 2 (a
    list<struct>), the reader reads field 3's marker value intact."""
    nested = tb.Writer()
    _twrite_struct(nested, inner)

    w = tb.Writer()
    w.field(1, tb.STRUCT)
    w.out += nested.out
    w.field(2, tb.LIST)
    w.list_header(3, tb.STRUCT)
    for _ in range(3):
        w.out += nested.out
    w.field(3, tb.I64)
    w.i64(0x5AFE5AFE5AFE)
    w.stop()

    r = tb.Reader(bytes(w.out))
    seen = []
    for fid, ftype in r.fields():
        if fid == 3:
            seen.append(r.i64())
        else:
            r.skip(ftype)
    assert seen == [0x5AFE5AFE5AFE]
    assert r.pos == len(w.out)
    # the outer soup is unused on purpose: hypothesis shrinks inner
    del outer


@given(st.integers(0, (1 << 64) - 1))
def test_thrift_hex16_signed64_roundtrip(v):
    h = tb.hex16(v)
    assert len(h) == 16
    assert tb.signed64(h) & 0xFFFFFFFFFFFFFFFF == v
    # signed64 is the two's-complement view an i64 writer needs
    assert struct.pack(">q", tb.signed64(h)) == bytes.fromhex(h)


@given(st.integers(-(1 << 63), (1 << 63) - 1))
def test_thrift_signed64_hex16_inverse(v):
    assert tb.signed64(tb.hex16(v)) == v


# ---------------------------------------------------- truncation safety

@settings(max_examples=150)
@given(field_soups, st.integers(0, 100))
def test_proto_truncation_raises_not_hangs(soup, cut_pct):
    """A truncated payload must raise (ValueError/IndexError/struct
    error) or stop cleanly — never loop forever or read past the
    buffer. Receivers see cut-off network payloads routinely."""
    w = pb.Writer()
    _write_soup(w, soup)
    buf = bytes(w.out)
    cut = buf[: len(buf) * cut_pct // 100]
    r = pb.Reader(cut)
    try:
        for _field, wt in r.fields():
            r.skip(wt)
    except (ValueError, IndexError, struct.error):
        pass
    # fixed-width skips only reposition (never read), so pos may step
    # past end — the invariant is termination + no silent data, which
    # the strict bytes_/message bounds checks enforce


@settings(max_examples=100)
@given(st.lists(_soup_fields(1, 90), min_size=1, max_size=12),
       st.integers(1, 20))
def test_proto_truncated_len_field_raises(soup, extra):
    """A length prefix that claims more bytes than remain must raise,
    not silently return a short slice."""
    w = pb.Writer()
    _write_soup(w, soup)
    w.tag(99, pb.LEN)
    w.varint(extra)  # claims `extra` bytes that are never written
    r = pb.Reader(bytes(w.out))
    fid = wt = None
    try:
        for fid, wt in r.fields():
            if fid == 99:
                r.bytes_()
                raise AssertionError("short read not detected")
            r.skip(wt)
    except ValueError:
        assert fid == 99


def test_proto_submessage_cannot_bleed_into_sibling():
    """A nested message whose inner length prefix overruns its own
    bound must raise instead of reading the sibling field's bytes."""
    inner = pb.Writer()
    inner.tag(1, pb.LEN)
    inner.varint(50)  # claims 50 bytes; the sub-message has none
    outer = pb.Writer()
    outer.message(2, inner)
    outer.string(3, "sibling-data-that-must-not-leak")
    r = pb.Reader(bytes(outer.out))
    fields = r.fields()
    assert next(fields)[0] == 2
    sub = r.message()
    sub_fields = sub.fields()
    assert next(sub_fields) == (1, pb.LEN)
    try:
        sub.bytes_()
        raise AssertionError("sub-message bound not enforced")
    except ValueError:
        pass


def test_otlp_decode_ignores_unknown_fields_end_to_end():
    """Regression for the skip(LEN) cursor bug: an OTLP logs request
    with unknown fields injected at the top level AND spliced inside
    the ResourceLogs payload must decode identically to the clean
    blob (the forward-compat contract of the reference's generated
    codecs, consumer/pdata/generated_log.go)."""
    from opentelemetry_collector_spark.sources import otlp_proto as op

    req = {"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "svc-a"}}]},
        "instrumentationLibraryLogs": [{
            "instrumentationLibrary": {"name": "lib", "version": "1.2"},
            "logs": [{"timeUnixNano": "1700000000000000123",
                      "severityNumber": 9, "severityText": "INFO",
                      "name": "evt", "body": {"stringValue": "hello"},
                      "attributes": [
                          {"key": "k", "value": {"intValue": "7"}}],
                      "traceId": "0af7651916cd43dd8448eb211c80319c",
                      "spanId": "b7ad6b7169203331"}]}]}]}
    blob = op.encode_logs_request(req)
    base = op.decode_logs_request(blob)

    w = pb.Writer()
    w.string(999, "future-top-level-field")
    w.int_(1000, 123456)
    w.fixed64(1001, 0xDEADBEEF)
    w.out += blob
    w.string(998, "trailing-unknown")
    assert op.decode_logs_request(bytes(w.out)) == base

    r = pb.Reader(blob)
    _fid, _wt = next(r.fields())
    inner = r.message()
    payload = inner.buf[inner.pos:inner.end]
    spliced = pb.Writer()
    spliced.string(500, "unknown-inside-resource-logs")
    spliced.out += payload
    outer = pb.Writer()
    outer.message(1, spliced)
    assert op.decode_logs_request(bytes(outer.out)) == base


def test_thrift_negative_length_raises():
    w = tb.Writer()
    w.field(1, tb.STRING)
    w.i32(-5)
    r = tb.Reader(bytes(w.out))
    for _fid, ftype in r.fields():
        try:
            r.binary()
            raise AssertionError("negative length not detected")
        except ValueError:
            return


@settings(max_examples=150)
@given(tstructs, st.integers(0, 100))
def test_thrift_truncation_raises_not_hangs(fields, cut_pct):
    w = tb.Writer()
    _twrite_struct(w, fields)
    buf = bytes(w.out)
    cut = buf[: len(buf) * cut_pct // 100]
    r = tb.Reader(cut)
    try:
        for _fid, ftype in r.fields():
            r.skip(ftype)
    except (ValueError, IndexError, struct.error):
        pass


# -------------------------------------------------------------- msgpack

from opentelemetry_collector_spark.functions import msgpack_binary as mp  # noqa: E402

# arbitrary msgpack value trees: scalars, strings across size-class
# boundaries, bytes, EventTime exts, nested arrays/maps
_mp_scalars = st.one_of(
    st.none(),
    st.booleans(),
    int64s,
    st.integers(min_value=1 << 63, max_value=(1 << 64) - 1),  # uint64 range
    finite_doubles,
    st.text(max_size=70),
    st.binary(max_size=70),
    st.builds(
        mp.EventTime,
        st.integers(0, (1 << 32) - 1),
        st.integers(0, 999_999_999),
    ),
)
_mp_values = st.recursive(
    _mp_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=10), children, max_size=6),
    ),
    max_leaves=20,
)


def _mp_eq(a, b):
    """Float-exact structural equality (== would call 0.0 == False)."""
    if type(a) is not type(b):
        # int/bool distinction matters: msgpack encodes them differently
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(_mp_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(_mp_eq(v, b[k]) for k, v in a.items())
    if isinstance(a, float):
        return struct.pack(">d", a) == struct.pack(">d", b)
    return a == b


@settings(max_examples=300)
@given(_mp_values)
def test_msgpack_roundtrip(v):
    assert _mp_eq(mp.unpackb(mp.packb(v)), v)


@settings(max_examples=200)
@given(_mp_values, st.integers(0, 99))
def test_msgpack_truncation_raises_not_garbage(v, cut_pct):
    buf = mp.packb(v)
    cut = buf[: len(buf) * cut_pct // 100]
    if cut == buf:
        return
    try:
        mp.unpackb(cut)
    except ValueError:
        return
    # a strict prefix that still parses must be a shorter VALID value
    # followed by trailing bytes — unpackb rejects those too, so
    # reaching here means silent garbage
    raise AssertionError("truncated msgpack decoded without error")


@settings(max_examples=150)
@given(st.lists(_mp_values, min_size=1, max_size=5))
def test_msgpack_concatenated_stream(values):
    p = mp.Packer()
    for v in values:
        p.pack(v)
    u = mp.Unpacker(bytes(p.out))
    out = []
    while u.pos < len(u.buf):
        out.append(u.unpack())
    assert len(out) == len(values)
    assert all(_mp_eq(a, b) for a, b in zip(out, values))


# ---------------------------------------------------------------------------
# snappy block format (functions/snappy_block.py)
# ---------------------------------------------------------------------------

from opentelemetry_collector_spark.functions.snappy_block import (  # noqa: E402
    compress as snappy_compress,
    decompress as snappy_decompress,
)


@settings(max_examples=300)
@given(st.binary(max_size=4096), st.booleans())
def test_snappy_roundtrip_arbitrary_bytes(data, flag):
    assert snappy_decompress(snappy_compress(data, flag)) == data


@settings(max_examples=100)
@given(
    st.binary(min_size=1, max_size=32),
    st.integers(min_value=1, max_value=2000),
)
def test_snappy_roundtrip_repetitive(chunk, reps):
    # repetition drives the copy-emitting encoder paths: long matches
    # chain through the 64-byte copy-2 length ceiling and overlapping
    # copies (offset < length) decode byte-at-a-time
    data = chunk * reps
    out = snappy_compress(data, True)
    assert snappy_decompress(out) == data
    if len(data) > 4 * len(chunk) + 64:
        assert len(out) < len(data)  # matches actually fired


@settings(max_examples=200)
@given(st.binary(max_size=512))
def test_snappy_truncation_never_crashes_unsafely(data):
    # every truncation of a valid stream must raise ValueError or
    # decode to a strict prefix-length mismatch — never hang or return
    # silently wrong bytes of the full length
    full = snappy_compress(data, True)
    for cut in range(len(full)):
        try:
            got = snappy_decompress(full[:cut])
        except ValueError:
            continue
        assert got != data or len(data) == 0


# ---------------------------------------------------------------------------
# prometheus exposition label escaping (sources/prometheus_text.py)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from opentelemetry_collector_spark.sources.prometheus_text import (  # noqa: E402
    escape_label_value,
    unescape_label_value,
)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        # the 5-char alphabet generates every nasty escape sequence
        # combinatorially: runs of backslashes, backslash-before-quote,
        # backslash-n vs real newline, trailing backslash
        st.text(alphabet=list('ab\\"\n'), max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_prom_label_escape_unescape_identity(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [
        r["r"]
        for r in df.select(
            unescape_label_value(escape_label_value(F.col("v"))).alias("r")
        ).collect()
    ]
    assert sorted(out) == sorted(values)
