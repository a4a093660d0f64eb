"""Binary protobuf wire formats: the shared proto3 codec
(functions/proto_binary.py), the OTLP binary wire
(receiver/otlpreceiver/logs/otlp.go:53-77 decode path), and the
Jaeger model.proto Batch wire (jaegerproto_to_traces.go)."""

import struct

import pytest

from opentelemetry_collector_spark.functions.proto_binary import (
    FIXED64,
    LEN,
    VARINT,
    Reader,
    Writer,
)
from opentelemetry_collector_spark.sources.jaeger_proto import (
    decode_batch,
    encode_batch,
    jaeger_proto_to_spans,
    spans_to_jaeger_proto,
)
from opentelemetry_collector_spark.sources.otlp_proto import (
    decode_logs_request,
    decode_traces_request,
    encode_logs_request,
    encode_traces_request,
    logs_from_otlp_proto,
    logs_to_otlp_proto,
    otlp_proto_to_spans,
    spans_to_otlp_proto,
)


class TestCodec:
    @pytest.mark.parametrize(
        "v", [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63]
    )
    def test_varint_int64_round_trip(self, v):
        w = Writer()
        w.varint(v if v >= 0 else v)
        r = Reader(bytes(w.out))
        assert r.int64() == v

    def test_negative_int64_is_ten_bytes(self):
        # proto3 int64 negatives encode as full 10-byte varints
        w = Writer()
        w.varint(-1)
        assert len(w.out) == 10

    def test_zero_scalars_elided(self):
        w = Writer()
        w.int_(1, 0)
        w.fixed64(2, 0)
        w.string(3, "")
        assert bytes(w.out) == b""

    def test_keep_empty_emits_zero_length(self):
        w = Writer()
        w.string(1, "", keep_empty=True)
        assert bytes(w.out) == b"\x0a\x00"

    def test_nested_message_and_skip_unknown(self):
        inner = Writer()
        inner.string(1, "hello")
        inner.int_(2, 42)
        outer = Writer()
        outer.double(7, 2.5)              # unknown to the reader below
        outer.message(3, inner)
        outer.fixed32(9, 123)             # unknown fixed32
        r = Reader(bytes(outer.out))
        got = {}
        for fid, wt in r.fields():
            if fid == 3 and wt == LEN:
                sub = r.message()
                for sfid, swt in sub.fields():
                    if sfid == 1 and swt == LEN:
                        got["s"] = sub.string()
                    elif sfid == 2 and swt == VARINT:
                        got["i"] = sub.varint()
                    else:
                        sub.skip(swt)
            else:
                r.skip(wt)
        assert got == {"s": "hello", "i": 42}

    def test_varint_overflow_raises(self):
        with pytest.raises(ValueError):
            Reader(b"\xff" * 11).varint()


LOGS_REQ = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "conv_id", "value": {"stringValue": "conv-1"}},
                    {"key": "weight", "value": {"doubleValue": 0.25}},
                    {"key": "turns", "value": {"intValue": "7"}},
                    {"key": "flagged", "value": {"boolValue": True}},
                ]
            },
            "instrumentationLibraryLogs": [
                {
                    "instrumentationLibrary": {"name": "transcripts"},
                    "logs": [
                        {
                            "timeUnixNano": "1700000000000000000",
                            "severityText": "user",
                            "name": "turn",
                            "body": {"stringValue": "hello ünïcode"},
                            "attributes": [
                                {
                                    "key": "tool",
                                    "value": {"stringValue": "search"},
                                }
                            ],
                        }
                    ],
                }
            ],
        }
    ]
}

TRACES_REQ = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "front"}}
                ]
            },
            "instrumentationLibrarySpans": [
                {
                    "instrumentationLibrary": {"name": "transcripts"},
                    "spans": [
                        {
                            "traceId": "q83vASNFZ4kBI0VniavN7w==",
                            "spanId": "ASNFZ4mrze8=",
                            "parentSpanId": "EjRWeJq83vA=",
                            "name": "lookup",
                            "kind": "SPAN_KIND_SERVER",
                            "startTimeUnixNano": "1700000000000000000",
                            "endTimeUnixNano": "1700000000002500000",
                            "attributes": [
                                {
                                    "key": "turn_idx",
                                    "value": {"intValue": "3"},
                                }
                            ],
                            "status": {"code": 2},
                        }
                    ],
                }
            ],
        }
    ]
}


class TestOtlpWire:
    def test_logs_round_trip(self):
        assert decode_logs_request(encode_logs_request(LOGS_REQ)) == LOGS_REQ

    def test_traces_round_trip(self):
        assert decode_traces_request(encode_traces_request(TRACES_REQ)) == TRACES_REQ

    def test_unknown_fields_skipped(self):
        blob = bytearray(encode_logs_request(LOGS_REQ))
        # splice an unknown fixed64 field (id 99 → multi-byte tag
        # varint) at the request level
        unknown = Writer()
        unknown.tag(99, FIXED64)
        unknown.out += struct.pack("<Q", 0xDEADBEEF)
        blob[0:0] = unknown.out
        assert decode_logs_request(bytes(blob)) == LOGS_REQ

    def test_empty_request(self):
        assert decode_logs_request(b"") == {"resourceLogs": []}
        assert encode_logs_request({"resourceLogs": []}) == b""


class TestJaegerWire:
    SPAN = {
        "traceID": "00000000000004d200000000000010e1",
        "spanID": "00000000000004d3",
        "operationName": "lookup",
        "references": [
            {
                "refType": "CHILD_OF",
                "traceID": "00000000000004d200000000000010e1",
                "spanID": "00000000000004d2",
            }
        ],
        "startTime": 1_700_000_000_000_000,
        "duration": 2500,
        "tags": [
            {"key": "span.kind", "type": "string", "value": "server"},
            {"key": "turn_idx", "type": "int64", "value": "3"},
            {"key": "retried", "type": "bool", "value": "true"},
            {"key": "ratio", "type": "float64", "value": "0.25"},
        ],
        "process": {"serviceName": "front"},
    }

    def test_round_trip(self):
        back = decode_batch(encode_batch([self.SPAN]))
        assert len(back) == 1
        got = back[0]
        # high half of the trace id is nonzero here → full 32-hex form
        assert got["traceID"] == self.SPAN["traceID"]
        for k in ("spanID", "operationName", "startTime", "duration"):
            assert got[k] == self.SPAN[k], k
        assert got["references"][0] == self.SPAN["references"][0]
        assert {(t["key"], t["type"], t["value"]) for t in got["tags"]} == {
            (t["key"], t["type"], t["value"]) for t in self.SPAN["tags"]
        }
        assert got["process"]["serviceName"] == "front"

    def test_short_trace_id_strips_high_half(self):
        sp = dict(self.SPAN, traceID="00000000000010e1", references=[])
        got = decode_batch(encode_batch([sp]))[0]
        assert got["traceID"] == "00000000000010e1"

    def test_unknown_fields_skipped(self):
        blob = bytearray(encode_batch([self.SPAN]))
        # unknown varint field (id 15) spliced at the batch level
        blob[0:0] = bytes([(15 << 3) | VARINT, 0x07])
        assert decode_batch(bytes(blob))[0]["operationName"] == "lookup"


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    from opentelemetry_collector_spark.operators.traces import (
        transcripts_to_spans,
    )
    from opentelemetry_collector_spark.plans.pipeline import parse_stage

    df = transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()
    df.count()
    yield df
    df.unpersist()


SPAN_KEY = [
    "trace_id", "span_id", "parent_span_id", "turn_idx",
    "name", "kind", "status_code",
]


class TestSparkPath:
    def test_otlp_logs_proto_round_trip(self, spark, tiny_transcripts):
        from pyspark.sql import functions as F

        back = logs_from_otlp_proto(logs_to_otlp_proto(tiny_transcripts))
        cols = ["conv_id", "turn_idx", "role", "text", "tool"]
        a = tiny_transcripts.select(
            *cols, F.unix_micros("ts").alias("ts_us")
        )
        b = back.select(
            *cols, F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
        )
        assert b.count() == a.count()
        assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0

    def test_otlp_traces_proto_round_trip(self, spark, spans):
        back = otlp_proto_to_spans(spans_to_otlp_proto(spans))
        assert back.count() == spans.count()
        # otlp path md5-hashes the trace id (16-byte wire constraint) —
        # compare on the stable non-derived key columns
        key = [c for c in SPAN_KEY if c != "trace_id"]
        assert back.select(key).subtract(spans.select(key)).count() == 0

    def test_jaeger_proto_round_trip(self, spark, spans):
        back = jaeger_proto_to_spans(spans_to_jaeger_proto(spans))
        assert back.count() == spans.count()
        assert back.select(SPAN_KEY).subtract(spans.select(SPAN_KEY)).count() == 0
        assert spans.select(SPAN_KEY).subtract(back.select(SPAN_KEY)).count() == 0
