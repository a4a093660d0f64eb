"""Jaeger thrift Batch wire format: codec goldens + the Spark decode
path feeding the shared Jaeger JSON semantics."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.jaeger_thrift import (
    decode_batch,
    encode_batch,
    jaeger_thrift_to_spans,
    spans_to_jaeger_thrift,
)

SPAN = {
    "traceID": "00000000000004d2" + "00000000000010e1",
    "spanID": "00000000000004d3",
    "operationName": "lookup",
    "references": [
        {
            "refType": "CHILD_OF",
            "traceID": "00000000000004d2" + "00000000000010e1",
            "spanID": "00000000000004d2",
        }
    ],
    "startTime": 1_700_000_000_000_000,
    "duration": 2500,
    "tags": [
        {"key": "span.kind", "type": "string", "value": "server"},
        {"key": "turn_idx", "type": "int64", "value": "3"},
        {"key": "conv_id", "type": "string", "value": "conv-9"},
        {"key": "retried", "type": "bool", "value": "true"},
        {"key": "ratio", "type": "float64", "value": "0.25"},
    ],
    "process": {"serviceName": "front"},
}


class TestCodec:
    def test_round_trip(self):
        back = decode_batch(encode_batch([SPAN]))
        assert len(back) == 1
        got = back[0]
        for k in ("traceID", "spanID", "operationName", "startTime", "duration"):
            assert got[k] == SPAN[k], k
        assert got["references"][0] == SPAN["references"][0]
        assert {(t["key"], t["type"], t["value"]) for t in got["tags"]} == {
            (t["key"], t["type"], t["value"]) for t in SPAN["tags"]
        }
        assert got["process"]["serviceName"] == "front"

    def test_parent_field_synthesizes_child_of(self):
        # a span carrying parentSpanId in field 4 but NO references
        # list must come back with a CHILD_OF reference (the JSON
        # model's parent form); hand-encode the minimal batch
        from opentelemetry_collector_spark.functions.thrift_binary import (
            I64, LIST, STRING, STRUCT, Writer,
        )

        w = Writer()
        w.field(1, STRUCT)          # process
        w.field(1, STRING); w.string("svc")
        w.stop()
        w.field(2, LIST); w.list_header(1)
        w.field(1, I64); w.i64(0x10e1)    # traceIdLow
        w.field(3, I64); w.i64(0x04d3)    # spanId
        w.field(4, I64); w.i64(0x04d2)    # parentSpanId, no references
        w.stop()                           # end span
        w.stop()                           # end batch
        back = decode_batch(bytes(w.out))
        refs = back[0]["references"]
        assert refs and refs[0]["refType"] == "CHILD_OF"
        assert refs[0]["spanID"] == "00000000000004d2"

    def test_unknown_fields_skipped(self):
        import struct

        blob = bytearray(encode_batch([SPAN]))
        # splice an unknown bool field (id 99) right at the batch level
        blob[0:0] = struct.pack(">bhb", 2, 99, 1)
        back = decode_batch(bytes(blob))
        assert back[0]["operationName"] == "lookup"


class TestSparkPath:
    def test_thrift_batch_to_spans(self, spark):
        df = spark.createDataFrame(
            [(bytearray(encode_batch([SPAN])),)], "thrift binary"
        )
        r = jaeger_thrift_to_spans(df).first()
        assert r["trace_id"] == "conv-9" and r["turn_idx"] == 3
        assert r["kind"] == "SERVER"
        assert r["parent_span_id"] == "00000000000004d2"
        assert r["attrs"]["retried"] == "true" and r["attrs"]["ratio"] == "0.25"
        assert r["start_ts"].timestamp() == 1_700_000_000.0

    def test_span_table_round_trip(self, spark, tiny_transcripts):
        from opentelemetry_collector_spark.operators.traces import (
            transcripts_to_spans,
        )
        from opentelemetry_collector_spark.plans.pipeline import parse_stage

        spans = transcripts_to_spans(
            parse_stage(tiny_transcripts, engine="jvm")
        ).cache()
        back = jaeger_thrift_to_spans(spans_to_jaeger_thrift(spans))
        key = [
            "trace_id", "span_id", "parent_span_id", "turn_idx",
            "name", "kind", "status_code",
        ]
        assert back.count() == spans.count()
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0
