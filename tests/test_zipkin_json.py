"""Zipkin v2 JSON round trip over the span table."""

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.traces import transcripts_to_spans
from opentelemetry_collector_spark.plans.pipeline import parse_stage
from opentelemetry_collector_spark.sources.zipkin_json import (
    spans_to_zipkin_json,
    zipkin_json_to_spans,
)


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    return transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()


class TestZipkinRoundTrip:
    def test_span_count_conserved(self, spans):
        back = zipkin_json_to_spans(spans_to_zipkin_json(spans))
        assert back.count() == spans.count()

    def test_fields_survive(self, spans):
        back = zipkin_json_to_spans(spans_to_zipkin_json(spans))
        key = ["trace_id", "span_id", "parent_span_id", "turn_idx", "name", "kind", "status_code"]
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0

    def test_timestamps_to_second_precision(self, spans):
        # encode truncates to whole seconds (epoch-second span table)
        back = zipkin_json_to_spans(spans_to_zipkin_json(spans))
        a = spans.select(
            "span_id", F.col("start_ts").cast("timestamp").cast("long").alias("s")
        )
        b = back.select(
            "span_id", F.col("start_ts").cast("timestamp").cast("long").alias("s")
        )
        assert a.subtract(b).count() == 0

    def test_zipkin_shape(self, spans):
        line = json.loads(spans_to_zipkin_json(spans).first()["zipkin"])
        assert set(line) <= {
            "traceId", "id", "parentId", "name", "kind",
            "timestamp", "duration", "localEndpoint", "tags",
        }
        assert len(line["traceId"]) == 32 and len(line["id"]) == 16
        assert line["localEndpoint"]["serviceName"] == "transcripts"

    def test_internal_kind_omitted_and_restored(self, spans):
        internal = spans.filter(F.col("kind") == "INTERNAL")
        if internal.count() == 0:
            pytest.skip("no INTERNAL spans in fixture")
        line = json.loads(spans_to_zipkin_json(internal).first()["zipkin"])
        assert "kind" not in line
        back = zipkin_json_to_spans(spans_to_zipkin_json(internal))
        assert back.select("kind").distinct().first()["kind"] == "INTERNAL"
