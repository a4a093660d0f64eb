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
