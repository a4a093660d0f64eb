"""Jaeger JSON round trip over the span table."""

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.traces import transcripts_to_spans
from opentelemetry_collector_spark.plans.pipeline import parse_stage
from opentelemetry_collector_spark.sources.jaeger_json import (
    jaeger_json_to_spans,
    spans_to_jaeger_json,
)


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    return transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()


class TestJaegerRoundTrip:
    def test_fields_survive(self, spans):
        back = jaeger_json_to_spans(spans_to_jaeger_json(spans))
        assert back.count() == spans.count()
        key = ["trace_id", "span_id", "parent_span_id", "turn_idx", "name", "kind", "status_code"]
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0

    def test_jaeger_shape_and_typed_tags(self, spans):
        line = json.loads(
            spans_to_jaeger_json(spans.filter(F.col("turn_idx") == 1)).first()["jaeger"]
        )
        assert len(line["traceID"]) == 32 and len(line["spanID"]) == 16
        assert line["references"][0]["refType"] == "CHILD_OF"
        tags = {t["key"]: t for t in line["tags"]}
        assert tags["turn_idx"]["type"] == "int64" and tags["turn_idx"]["value"] == "1"
        assert tags["span.kind"]["value"] in ("server", "client", "internal")
        assert line["process"]["serviceName"] == "transcripts"

    def test_root_has_no_references(self, spans):
        line = json.loads(
            spans_to_jaeger_json(spans.filter(F.col("turn_idx") == 0)).first()["jaeger"]
        )
        assert line.get("references", []) == []


class TestTypedTagCoercion:
    def _parse_one(self, spark, tags, extra=None):
        span = {
            "traceID": "a" * 32, "spanID": "b" * 16, "operationName": "op",
            "startTime": 1_000_000, "duration": 500, "tags": tags,
        }
        span.update(extra or {})
        df = spark.createDataFrame([(json.dumps(span),)], "jaeger string")
        return jaeger_json_to_spans(df).first()

    def test_bool_normalized_int_passthrough(self, spark):
        r = self._parse_one(
            spark,
            [
                {"key": "flag", "type": "bool", "value": "True"},
                {"key": "n", "type": "int64", "value": "42"},
                {"key": "s", "type": "string", "value": "x"},
            ],
        )
        assert r["attrs"] == {"flag": "true", "n": "42", "s": "x"}

    def test_http_status_fallback_via_table(self, spark):
        # no otel.status_code → http.status_code maps through HTTP→OC
        r = self._parse_one(
            spark, [{"key": "http.status_code", "type": "int64", "value": "404"}]
        )
        assert r["status_code"] == 5  # NOT_FOUND
        # otel.status_code wins when both present
        r = self._parse_one(
            spark,
            [
                {"key": "otel.status_code", "type": "int64", "value": "2"},
                {"key": "http.status_code", "type": "int64", "value": "404"},
            ],
        )
        assert r["status_code"] == 2

    def test_duplicate_tag_keys_last_wins(self, spark):
        r = self._parse_one(
            spark,
            [
                {"key": "k", "type": "string", "value": "first"},
                {"key": "k", "type": "string", "value": "second"},
            ],
        )
        assert r["attrs"]["k"] == "second"

    def test_keyless_tag_skipped_not_fatal(self, spark):
        # untrusted JSON: a tag object with no 'key' must be skipped
        # (Go receiver behavior), not a "null as map key" runtime error
        # in the last-wins fold
        r = self._parse_one(
            spark,
            [
                {"type": "string", "value": "orphan"},
                {"key": "k", "type": "string", "value": "kept"},
            ],
        )
        assert r["attrs"] == {"k": "kept"}
