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
    decode_metrics_request,
    decode_traces_request,
    encode_logs_request,
    encode_metrics_request,
    encode_traces_request,
    logs_from_otlp_proto,
    logs_to_otlp_proto,
    metrics_from_otlp_proto,
    metrics_to_otlp_proto,
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

    def test_truncated_varint_raises_value_error(self):
        # continuation bit set on the last byte: must be ValueError,
        # not IndexError, matching the strict bytes_() stance
        with pytest.raises(ValueError):
            Reader(b"\xff\xff").varint()

    def test_varint_bounded_by_submessage_end(self):
        # a varint inside a sub-message must not bleed into sibling
        # bytes past the sub-message's declared end
        buf = b"\x80" + b"\x01"  # continuation byte, then a sibling byte
        r = Reader(buf, end=1)
        with pytest.raises(ValueError):
            r.varint()

    @pytest.mark.parametrize("method,n", [("fixed64", 8), ("double", 8), ("fixed32", 4)])
    def test_truncated_fixed_raises_value_error(self, method, n):
        r = Reader(b"\x00" * (n - 1))
        with pytest.raises(ValueError):
            getattr(r, method)()

    def test_fixed_bounded_by_submessage_end(self):
        # 8 real bytes in the buffer, but the sub-message ends at 4
        r = Reader(b"\x00" * 8, end=4)
        with pytest.raises(ValueError):
            r.fixed64()

    def test_skip_len_past_buffer_raises(self):
        # declared length 100 with 1 byte of payload
        with pytest.raises(ValueError):
            Reader(b"\x64\x00").skip(LEN)

    def test_skip_fixed_past_end_raises(self):
        with pytest.raises(ValueError):
            Reader(b"\x00" * 3, end=3).skip(FIXED64)

    def test_unknown_span_kind_falls_back_to_unspecified(self):
        # a forward-version enum value must not fail the batch
        from opentelemetry_collector_spark.sources.otlp_proto import (
            _SPAN_KINDS,
        )

        span = Writer()
        span.bytes_(1, b"\x01" * 16)   # traceId
        span.bytes_(2, b"\x02" * 8)    # spanId
        span.string(5, "s")
        span.int_(6, 99)               # unknown kind
        scope_spans = Writer()
        scope_spans.message(2, span)
        rs = Writer()
        rs.message(2, scope_spans)
        req = Writer()
        req.message(1, rs)
        decoded = decode_traces_request(bytes(req.out))
        got = decoded["resourceSpans"][0]["instrumentationLibrarySpans"][0][
            "spans"
        ][0]
        assert got["kind"] == _SPAN_KINDS[0]


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


METRICS = [
    {
        "name": "events.click",
        "intSum": {
            "dataPoints": [
                {
                    "labels": [{"key": "event_id", "value": "7"}],
                    "timeUnixNano": "1700000000000000000",
                    "value": "42",
                },
                {"timeUnixNano": "1700000001000000000", "value": "-3"},
            ],
            "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
            "isMonotonic": True,
        },
    },
    {
        "name": "events.purchase",
        "doubleSum": {
            "dataPoints": [
                {"timeUnixNano": "1700000002000000000", "value": 123.456789}
            ],
            "aggregationTemporality": "AGGREGATION_TEMPORALITY_CUMULATIVE",
            "isMonotonic": True,
        },
    },
    {
        "name": "events.gauge",
        "doubleGauge": {
            "dataPoints": [{"timeUnixNano": "1700000003000000000", "value": -0.5}]
        },
    },
]


class TestOtlpMetricsWire:
    def test_round_trip_all_union_arms(self):
        assert decode_metrics_request(encode_metrics_request(METRICS)) == METRICS

    def test_negative_int_value_is_sfixed64(self):
        # v0.17 IntDataPoint.Value is FIXED64-encoded int64
        # (metrics.pb.go:911): -3 must survive as two's-complement
        # fixed64, not a varint
        one = [
            {
                "name": "m",
                "intGauge": {
                    "dataPoints": [{"timeUnixNano": "1", "value": "-3"}]
                },
            }
        ]
        blob = encode_metrics_request(one)
        assert struct.pack("<Q", (1 << 64) - 3) in bytes(blob)
        assert decode_metrics_request(blob) == one

    def test_zero_defaults_restored(self):
        # proto3 elides zero values; decode restores jsonpb defaults
        one = [
            {
                "name": "m",
                "intSum": {
                    "dataPoints": [{"timeUnixNano": "0", "value": "0"}],
                    "isMonotonic": True,
                },
            }
        ]
        assert decode_metrics_request(encode_metrics_request(one)) == one

    def test_unknown_fields_skipped(self):
        blob = bytearray(encode_metrics_request(METRICS))
        unknown = Writer()
        unknown.tag(99, FIXED64)
        unknown.out += struct.pack("<Q", 0xDEADBEEF)
        blob[0:0] = unknown.out
        assert decode_metrics_request(bytes(blob)) == METRICS

    def test_multi_metric_request_fans_out(self):
        blob = encode_metrics_request(METRICS)
        assert len(decode_metrics_request(blob)) == 3


ZIPKIN_SPANS = [
    {
        "traceId": "7f6f5f4f3f2f1f0ff7f6f5f4f3f2f1f0",
        "parentId": "f7f6f5f4f3f2f1f0",
        "id": "6766656463626160",
        "kind": "CONSUMER",
        "name": "ProtoSpan1",
        "timestamp": 1_700_000_000_123_456,
        "duration": 12_000_000,
        "localEndpoint": {"serviceName": "svc-1"},
        "tags": {"conv_id": "conv-1", "turn_idx": "3"},
    },
    {
        # root, INTERNAL (absent kind), zero duration
        "traceId": "7a6a5a4a3a2a1a0ac7c6c5c4c3c2c1c0",
        "id": "1716151413121110",
        "name": "root ü 日本語",
        "timestamp": 1_700_000_001_000_000,
        "duration": 0,
        "localEndpoint": {"serviceName": "transcripts"},
    },
]


class TestZipkinProtoWire:
    def test_round_trip(self):
        from opentelemetry_collector_spark.sources.zipkin_proto import (
            decode_list_of_spans,
            encode_list_of_spans,
        )

        assert decode_list_of_spans(encode_list_of_spans(ZIPKIN_SPANS)) == ZIPKIN_SPANS

    def test_ids_are_raw_bytes_and_timestamp_fixed64_micros(self):
        # proto_parse_test.go:51-56 pins the wire: 16/8-byte raw ids,
        # fixed64 MICROsecond timestamp
        from opentelemetry_collector_spark.sources.zipkin_proto import (
            encode_list_of_spans,
        )

        blob = encode_list_of_spans([ZIPKIN_SPANS[0]])
        assert bytes.fromhex(ZIPKIN_SPANS[0]["traceId"]) in blob
        assert bytes.fromhex(ZIPKIN_SPANS[0]["id"]) in blob
        assert struct.pack("<Q", 1_700_000_000_123_456) in blob

    def test_unknown_fields_skipped(self):
        from opentelemetry_collector_spark.sources.zipkin_proto import (
            decode_list_of_spans,
            encode_list_of_spans,
        )

        blob = bytearray(encode_list_of_spans(ZIPKIN_SPANS))
        unknown = Writer()
        unknown.tag(12, VARINT)  # debug flag: real field, not modeled
        unknown.varint(1)
        blob.extend(unknown.out)
        assert decode_list_of_spans(bytes(blob)) == ZIPKIN_SPANS


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
    # slow lane: full proto wire roundtrips; the wire-matrix driver rows re-verify
    pytestmark = pytest.mark.slow
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

    def test_zipkin_proto_round_trip(self, spark, spans):
        from opentelemetry_collector_spark.sources.zipkin_proto import (
            spans_to_zipkin_proto,
            zipkin_proto_to_spans,
        )

        back = zipkin_proto_to_spans(spans_to_zipkin_proto(spans))
        assert back.count() == spans.count()
        # zipkin path md5-hashes the trace id (16-byte wire) — compare
        # the stable non-derived key columns
        key = [c for c in SPAN_KEY if c != "trace_id"]
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0

    def test_otlp_metrics_proto_round_trip(self, spark):
        from pyspark.sql import functions as F

        dps = spark.createDataFrame(
            [
                ("m.int", "IntSum", "DELTA", {"u": "1"}, 1_700_000_000_000_000, 5, None),
                ("m.int", "IntSum", "DELTA", {"u": "2"}, 1_700_000_001_000_000, -2, None),
                ("m.dbl", "DoubleSum", "CUMULATIVE", {}, 1_700_000_002_000_000, None, 9.25),
                ("m.g", "DoubleGauge", "UNSPECIFIED", {}, 1_700_000_003_000_000, None, -0.5),
            ],
            "name string, data_type string, temporality string,"
            " labels map<string,string>, ts_us long, int_value long,"
            " double_value double",
        ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
        back = metrics_from_otlp_proto(metrics_to_otlp_proto(dps))
        cols = ["name", "data_type", "temporality", "int_value", "double_value"]
        a = dps.select(*cols, F.unix_micros(F.col("ts")).alias("us"))
        b = back.select(*cols, F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        assert b.count() == a.count() == 4
        assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
        # labels survive the StringKeyValue wire form
        got = {
            r["us"]: dict(r["labels"] or {})
            for r in back.select("labels", F.unix_micros("ts").alias("us")).collect()
        }
        assert got[1_700_000_000_000_000] == {"u": "1"}
        assert got[1_700_000_002_000_000] == {}
