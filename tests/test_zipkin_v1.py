"""Zipkin v1 JSON translation + the status-code mapping tables
(zipkinv1_to_protospan.go, status_code.go, grpc_http_mapper.go),
shaped after status_code_test.go / zipkinv1_to_protospan_test.go."""

import json

import pytest

# slow lane: v1 parse-rule matrix; the zipkin_v1 wires ride the span_wire_roundtrips driver row every round
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.status_codes import (
    oc_status_from_http,
    zipkin_status,
)
from opentelemetry_collector_spark.operators.traces import transcripts_to_spans
from opentelemetry_collector_spark.plans.pipeline import parse_stage
from opentelemetry_collector_spark.sources.zipkin_v1_json import (
    spans_to_zipkin_v1_json,
    zipkin_v1_json_to_spans,
)


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    return transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()


def _status(spark, tags: dict):
    df = spark.createDataFrame([(tags,)], "tags map<string,string>")
    return df.select(zipkin_status(F.col("tags")).alias("s")).first()["s"]


class TestStatusMapper:
    def test_priority_census_over_status_over_http(self, spark):
        s = _status(
            spark,
            {"census.status_code": "10", "status.code": "5", "http.status_code": "404"},
        )
        assert (s["code"], s["has_status"]) == (10, True)
        s = _status(spark, {"status.code": "5", "http.status_code": "200"})
        assert s["code"] == 5
        s = _status(spark, {"http.status_code": "404"})
        assert s["code"] == 5  # HTTP 404 → OC NOT_FOUND

    def test_error_tag_canonical_name(self, spark):
        s = _status(spark, {"error": "DEADLINE_EXCEEDED"})
        assert (s["code"], s["has_status"]) == (4, True)

    def test_error_tag_beats_http_and_borrows_message(self, spark):
        s = _status(
            spark,
            {
                "error": "NOT_FOUND",
                "http.status_code": "500",
                "status.message": "m1",
            },
        )
        assert s["code"] == 5 and s["message"] == "m1"

    def test_error_tag_garbage_is_unknown_last_resort(self, spark):
        s = _status(spark, {"error": "something broke"})
        assert (s["code"], s["has_status"]) == (2, True)
        # ...but any real source wins over the garbage error tag
        s = _status(spark, {"error": "something broke", "http.status_code": "503"})
        assert s["code"] == 14

    def test_error_tag_empty_is_no_code(self, spark):
        s = _status(spark, {"error": ""})
        assert s["has_status"] is False and s["code"] == 0

    def test_no_tags_no_status(self, spark):
        s = _status(spark, {})
        assert s["has_status"] is False

    def test_unparseable_code_ignored(self, spark):
        s = _status(spark, {"census.status_code": "abc", "status.code": "7"})
        assert s["code"] == 7

    def test_http_mapping_table(self, spark):
        cases = [
            (200, 0), (302, 0), (401, 16), (403, 7), (404, 5), (429, 8),
            (499, 1), (400, 3), (418, 3), (501, 12), (503, 14), (504, 4),
            (500, 13), (599, 13), (700, 2),
        ]
        df = spark.createDataFrame([(c,) for c, _ in cases], "http int")
        got = [
            r["oc"]
            for r in df.select(oc_status_from_http(F.col("http")).alias("oc")).collect()
        ]
        assert got == [oc for _, oc in cases]


class TestZipkinV1RoundTrip:
    def test_fields_survive(self, spans):
        back = zipkin_v1_json_to_spans(spans_to_zipkin_v1_json(spans))
        assert back.count() == spans.count()
        key = [
            "trace_id", "span_id", "parent_span_id", "turn_idx",
            "name", "kind", "status_code",
        ]
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0

    def test_times_survive_at_microseconds(self, spans):
        back = zipkin_v1_json_to_spans(spans_to_zipkin_v1_json(spans))
        key = lambda df: df.select(  # noqa: E731
            "span_id",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("s"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("e"),
        )
        assert key(back).subtract(key(spans)).count() == 0

    def test_v1_shape(self, spans):
        line = json.loads(
            spans_to_zipkin_v1_json(
                spans.filter(F.col("kind") == "CLIENT")
            ).first()["zipkin_v1"]
        )
        values = [a["value"] for a in line["annotations"]]
        assert values == ["cs", "cr"]
        assert line["annotations"][0]["endpoint"]["serviceName"] == "transcripts"
        keys = {b["key"] for b in line["binaryAnnotations"]}
        assert "conv_id" in keys and "turn_idx" in keys

    def test_status_rides_numeric_census_code(self, spans):
        err = spans.filter(F.col("status_code") == 2)
        line = json.loads(spans_to_zipkin_v1_json(err).first()["zipkin_v1"])
        tags = {b["key"]: b["value"] for b in line["binaryAnnotations"]}
        # numeric, as attribToStatusCode parses (names belong to `error`)
        assert tags["census.status_code"] == "2"
        ok = spans.filter(F.col("status_code") == 0)
        okline = json.loads(spans_to_zipkin_v1_json(ok).first()["zipkin_v1"])
        assert "census.status_code" not in {
            b["key"] for b in okline["binaryAnnotations"]
        }


class TestV1ParseRules:
    def _parse(self, spark, span: dict):
        df = spark.createDataFrame([(json.dumps(span),)], "zipkin_v1 string")
        return zipkin_v1_json_to_spans(df).first()

    def test_keyless_binary_annotation_skipped_not_fatal(self, spark):
        # a binaryAnnotation missing 'key' (untrusted JSON) is a
        # skipped tag, not a "null as map key" error in the tags fold
        r = self._parse(
            spark,
            {
                "traceId": "a" * 16, "id": "b" * 16, "timestamp": 1000,
                "duration": 5,
                "binaryAnnotations": [
                    {"value": "orphan"},
                    {"key": "k", "value": "kept"},
                ],
            },
        )
        assert r["attrs"]["k"] == "kept"
        assert None not in r["attrs"]

    def test_first_kind_annotation_wins(self, spark):
        r = self._parse(
            spark,
            {
                "traceId": "a" * 16, "id": "b" * 16, "timestamp": 1000, "duration": 5,
                "annotations": [
                    {"timestamp": 1000, "value": "sr"},
                    {"timestamp": 1005, "value": "cs"},
                ],
            },
        )
        assert r["kind"] == "SERVER"

    def test_ms_mr_extended_kinds(self, spark):
        for v, want in (("ms", "PRODUCER"), ("mr", "CONSUMER")):
            r = self._parse(
                spark,
                {
                    "traceId": "a" * 16, "id": "b" * 16, "timestamp": 1,
                    "annotations": [{"timestamp": 1, "value": v}],
                },
            )
            assert r["kind"] == want

    def test_timestamp_fallback_to_annotation_times(self, spark):
        r = self._parse(
            spark,
            {
                "traceId": "a" * 16, "id": "b" * 16,
                "annotations": [
                    {"timestamp": 2_000_000, "value": "sr"},
                    {"timestamp": 9_000_000, "value": "ss"},
                ],
            },
        )
        assert F and r["start_ts"].timestamp() == 2.0
        assert r["end_ts"].timestamp() == 9.0

    def test_lc_renames_to_component_and_status_tags_consumed(self, spark):
        r = self._parse(
            spark,
            {
                "traceId": "a" * 16, "id": "b" * 16, "timestamp": 1,
                "binaryAnnotations": [
                    {"key": "lc", "value": "db"},
                    {"key": "census.status_code", "value": "5"},
                    {"key": "http.status_code", "value": "404"},
                ],
            },
        )
        assert r["attrs"]["component"] == "db"
        assert "census.status_code" not in r["attrs"]
        assert r["attrs"]["http.status_code"] == "404"  # http tags are kept
        assert r["status_code"] == 5

    def test_duplicate_keys_last_wins(self, spark):
        r = self._parse(
            spark,
            {
                "traceId": "a" * 16, "id": "b" * 16, "timestamp": 1,
                "binaryAnnotations": [
                    {"key": "k", "value": "first"},
                    {"key": "k", "value": "second"},
                ],
            },
        )
        assert r["attrs"]["k"] == "second"
