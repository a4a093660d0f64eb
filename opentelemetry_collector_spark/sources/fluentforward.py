"""Fluentd Forward protocol (msgpack wire) — the reference's
fluentforward receiver re-expressed Spark-first.

Wire semantics follow receiver/fluentforwardreceiver/conversion.go and
the public Forward Protocol Specification v1:

  * three carrier modes, detected by the TYPE of the event array's
    second element (server.go:139-207 DetermineNextEventMode):
    int/uint/ext → Message, array → Forward, bin/str → PackedForward;
  * Message mode ``[tag, time, record, option?]``
    (conversion.go:182-230 MessageEventLogRecord.DecodeMsg);
  * Forward mode ``[tag, [[time, record], ...], option?]``
    (conversion.go:255-303 ForwardEventLogRecords.DecodeMsg);
  * PackedForward mode ``[tag, bin|str of concatenated msgpack
    [time, record] entries, option?]``, gzip-compressed when the
    option map says ``compressed: "gzip"`` (conversion.go:328-425,
    entries are read raw FIRST because the compression flag arrives
    in the options map after them);
  * ``time`` is a plain integer (seconds) or the EventTime ext
    (timeext.go:44-68);
  * record keys ``message`` (fluentd) / ``log`` (fluentbit) become the
    Body; every other key is an attribute (conversion.go:158-177),
    with tag under ``fluent.tag`` (conversion.go:30);
  * attribute values map per insertToAttributeMap
    (conversion.go:84-109): bool/str/int/float pass through, bytes
    decode to string, maps/lists JSON-encode.

The Python decode/encode kernels run Arrow-batched via mapInPandas —
one socket payload (blob) is the unit of work, matching the
receiver's framing; blobs never shuffle and never reach the driver.
"""

from __future__ import annotations

import gzip as _gzip
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.msgpack_binary import EventTime, Ext, Packer, Unpacker

TAG_ATTRIBUTE_KEY = "fluent.tag"


# ---------------------------------------------------------------------------
# decode (receiver direction)
# ---------------------------------------------------------------------------


def _json_default(o):
    """Nested values json can't encode natively: bytes decode like the
    top-level bytes branch; anything else (e.g. a stray Ext) renders
    via str — never a TypeError that would kill the whole blob."""
    if isinstance(o, (bytes, bytearray)):
        return bytes(o).decode("utf-8", "replace")
    return str(o)


def _attr_value(val):
    """insertToAttributeMap's type mapping (conversion.go:84-109),
    with every value carried as its Python type; bytes → str,
    map/list → JSON (ensure_ascii=False: Go's json.Marshal does not
    \\uXXXX-escape non-ASCII)."""
    if isinstance(val, (bytes, bytearray)):
        return bytes(val).decode("utf-8", "replace")
    if isinstance(val, (dict, list)):
        return json.dumps(
            val, separators=(", ", ": "), ensure_ascii=False,
            default=_json_default,
        )
    if isinstance(val, (bool, int, float, str)):
        return val
    return str(val)


def _time_ns(ts) -> int:
    """conversion.go:112-120 timeFromTimestamp: int seconds or
    EventTime ext; anything else is an error."""
    if isinstance(ts, EventTime):
        return ts.seconds * 1_000_000_000 + ts.nanoseconds
    if isinstance(ts, int) and not isinstance(ts, bool):
        return ts * 1_000_000_000
    if isinstance(ts, Ext):
        raise ValueError(f"unknown event time ext type {ts.code}")
    raise ValueError(f"unknown type of time value: {ts!r}")


def _record_to_log(time_ns: int, record: dict, tag: str) -> dict:
    if not isinstance(record, dict):
        raise ValueError("forward entry record must be a map")
    body = None
    attrs = {TAG_ATTRIBUTE_KEY: tag}
    for key, val in record.items():
        if isinstance(key, (bytes, bytearray)):
            # some clients send binary map keys (conversion.go:149-156)
            key = bytes(key).decode("utf-8", "replace")
        if key in ("message", "log"):
            # fluentd uses message, fluentbit log (conversion.go:163)
            if isinstance(val, (bytes, bytearray)):
                body = bytes(val).decode("utf-8", "replace")
            elif isinstance(val, str):
                body = val
            else:
                raise ValueError(f"cannot convert message type {type(val)} to string")
        else:
            attrs[key] = _attr_value(val)
    return {"time_ns": time_ns, "body": body, "attrs": attrs}


def _decode_entries_stream(buf: bytes, tag: str) -> list[dict]:
    """Concatenated msgpack ``[time, record]`` entries until EOF
    (conversion.go:400-425 parseEntries)."""
    u = Unpacker(buf)
    out = []
    while u.pos < len(buf):
        entry = u.unpack()
        if not isinstance(entry, list) or len(entry) != 2:
            raise ValueError("packed entry must be a 2-element array")
        out.append(_record_to_log(_time_ns(entry[0]), entry[1], tag))
    return out


def decode_event(u: Unpacker) -> list[dict]:
    """One Forward-protocol event (any carrier mode) → log records."""
    n = u.array_header()
    if n < 2 or n > 4:
        raise ValueError(f"forward event array length {n} out of range")
    tag = u.unpack()
    if isinstance(tag, (bytes, bytearray)):
        tag = bytes(tag).decode("utf-8", "replace")
    if not isinstance(tag, str):
        raise ValueError("forward event tag must be a string")

    second = u.peek_type()
    if second in ("int", "ext"):
        # Message mode: [tag, time, record, option?] — header length
        # must be 3 or 4 (conversion.go:199-203)
        if n < 3:
            raise ValueError("message-mode event needs [tag, time, record]")
        time_ns = _time_ns(u.unpack())
        record = u.unpack()
        if n == 4:
            u.unpack()  # options (chunk ack is transport-level)
        return [_record_to_log(time_ns, record, tag)]

    if second == "array":
        # Forward mode: [tag, [[time, record], ...], option?]
        entries = u.unpack()
        if n == 4:
            raise ValueError("forward-mode event array length 4 invalid")
        if n == 3:
            u.unpack()  # options
        out = []
        for entry in entries:
            if not isinstance(entry, list) or len(entry) != 2:
                raise ValueError("forward entry must be a 2-element array")
            out.append(_record_to_log(_time_ns(entry[0]), entry[1], tag))
        return out

    if second in ("bin", "str"):
        # PackedForward: entries are read RAW first; whether they are
        # gzipped is only known after the options map (conversion.go:355)
        if n > 3:
            raise ValueError("packedforward-mode event array length 4 invalid")
        # read the chunk RAW whether bin- or str-framed: the payload is
        # msgpack entry bytes, and a str-framed chunk (conversion.go:366)
        # must not round-trip through UTF-8 (lossy decode is irreversible)
        raw = u.raw_bin_or_str()
        options = u.unpack() if n == 3 else {}
        if not isinstance(options, dict):
            raise ValueError("forward event options must be a map")
        if options.get("compressed") == "gzip":
            raw = _gzip.decompress(raw)
        return _decode_entries_stream(raw, tag)

    raise ValueError(f"unable to determine event mode for type {second}")


def decode_forward_stream(blob: bytes) -> list[dict]:
    """A socket payload: events back to back until EOF
    (server.go:62-137 handleConnection loop)."""
    u = Unpacker(blob)
    out = []
    while u.pos < len(blob):
        out.extend(decode_event(u))
    return out


# ---------------------------------------------------------------------------
# encode (client / exporter symmetry, used to prove the decode)
# ---------------------------------------------------------------------------


def _entry(time_ns: int, record: dict) -> list:
    return [EventTime(time_ns // 1_000_000_000, time_ns % 1_000_000_000), record]


def encode_message_events(tag: str, entries: list[tuple[int, dict]]) -> bytes:
    """Message mode: one [tag, time, record] event per entry,
    concatenated (the stream framing a fluentd client produces)."""
    p = Packer()
    for time_ns, record in entries:
        p.pack([tag, *_entry(time_ns, record)])
    return bytes(p.out)


def encode_forward_event(tag: str, entries: list[tuple[int, dict]]) -> bytes:
    return packb_event([tag, [_entry(t, r) for t, r in entries]])


def encode_packed_forward_event(
    tag: str, entries: list[tuple[int, dict]], compress: bool = False
) -> bytes:
    inner = Packer()
    for time_ns, record in entries:
        inner.pack(_entry(time_ns, record))
    raw = bytes(inner.out)
    options: dict = {"size": len(entries)}
    if compress:
        raw = _gzip.compress(raw, mtime=0)
        options["compressed"] = "gzip"
    return packb_event([tag, raw, options])


def packb_event(event: list) -> bytes:
    return bytes(Packer().pack(event).out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_MODES = ("message", "forward", "packed_forward", "packed_forward_gzip")


def transcripts_to_fluent(
    df: DataFrame, mode: str = "forward", tag: str = "transcripts"
) -> DataFrame:
    """Transcript rows → Forward-protocol blobs (one blob per Arrow
    batch = one socket payload). The record mirrors what a fluentd
    client shipping the transcript table would send: ``message`` is
    the body, the remaining columns ride as attributes."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            entries = []
            for row in pdf.itertuples(index=False):
                record = {
                    "message": row.text,
                    "conv_id": row.conv_id,
                    "turn_idx": int(row.turn_idx),
                    "role": row.role,
                }
                if row.tool is not None and not pd.isna(row.tool):
                    record["tool"] = row.tool
                ts_ns = int(pd.Timestamp(row.ts).value)
                entries.append((ts_ns, record))
            if mode == "message":
                blob = encode_message_events(tag, entries)
            elif mode == "forward":
                blob = encode_forward_event(tag, entries)
            else:
                blob = encode_packed_forward_event(
                    tag, entries, compress=(mode == "packed_forward_gzip")
                )
            yield pd.DataFrame({"fluent": [blob]})

    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").mapInPandas(
        encode, schema="fluent binary"
    )


def fluent_to_transcripts(df: DataFrame, bin_col: str = "fluent") -> DataFrame:
    """Forward-protocol blobs → transcript rows: wire decode + the
    Body/attribute split, then the attrs project back to the table's
    typed columns. Unknown/extra attributes are preserved through the
    generic log-record form; this projection is the transcript-table
    adapter."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[bin_col]:
                if blob is None:
                    continue
                for rec in decode_forward_stream(bytes(blob)):
                    a = rec["attrs"]
                    if a.get("turn_idx") is None:
                        # a valid Forward record that simply isn't a
                        # transcript row: fail in the codec's declared
                        # exception family, not with int(None)'s
                        # TypeError killing the whole task opaquely
                        raise ValueError(
                            "fluent record missing transcript attribute"
                            f" 'turn_idx' (tag={rec.get('tag')!r},"
                            f" attrs={sorted(a)})"
                        )
                    rows.append(
                        (
                            str(a.get("conv_id")),
                            int(a.get("turn_idx")),
                            str(a.get("role")),
                            rec["body"],
                            a.get("tool"),
                            rec["time_ns"] // 1000,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_us"],
            )

    out = df.mapInPandas(
        decode,
        schema="conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_us long",
    )
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
    )


def fluent_to_log_records(df: DataFrame, bin_col: str = "fluent") -> DataFrame:
    """Forward-protocol blobs → the generic log-record form the
    reference produces (Body + attributes map incl. fluent.tag) —
    for pipelines that don't assume the transcript shape."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[bin_col]:
                if blob is None:
                    continue
                for rec in decode_forward_stream(bytes(blob)):
                    rows.append(
                        (
                            rec["time_ns"],
                            rec["body"],
                            {k: str(v) for k, v in rec["attrs"].items()},
                        )
                    )
            yield pd.DataFrame(rows, columns=["time_ns", "body", "attrs"])

    return df.mapInPandas(
        decode, schema="time_ns long, body string, attrs map<string,string>"
    )
