"""OpenCensus JSON round trips (translator/internaldata/oc_to_traces.go,
oc_to_metrics.go shapes) over the span and datapoint tables."""

import base64
import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.traces import transcripts_to_spans
from opentelemetry_collector_spark.plans.pipeline import parse_stage
from opentelemetry_collector_spark.sources.opencensus_json import (
    metrics_to_oc_json,
    oc_json_to_metrics,
    oc_json_to_spans,
    spans_to_oc_json,
)


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    return transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()


class TestOcTraceRoundTrip:
    def test_fields_survive(self, spans):
        back = oc_json_to_spans(spans_to_oc_json(spans))
        assert back.count() == spans.count()
        key = [
            "trace_id", "span_id", "parent_span_id", "turn_idx",
            "name", "kind", "status_code",
        ]
        assert back.select(key).subtract(spans.select(key)).count() == 0
        assert spans.select(key).subtract(back.select(key)).count() == 0

    def test_timestamps_survive_at_microseconds(self, spans):
        back = oc_json_to_spans(spans_to_oc_json(spans))
        want = spans.select(
            "span_id",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("s"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("e"),
        )
        got = back.select(
            "span_id",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("s"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("e"),
        )
        assert got.subtract(want).count() == 0

    def test_oc_shape(self, spans):
        line = json.loads(
            spans_to_oc_json(spans.filter(F.col("turn_idx") == 1)).first()["oc"]
        )
        # proto-JSON bytes fields are base64: 16-byte trace, 8-byte span
        assert len(base64.b64decode(line["traceId"])) == 16
        assert len(base64.b64decode(line["spanId"])) == 8
        assert len(base64.b64decode(line["parentSpanId"])) == 8
        assert set(line["name"]) == {"value"}
        amap = line["attributes"]["attributeMap"]
        assert amap["turn_idx"]["intValue"] == "1"
        assert "value" in amap["conv_id"]["stringValue"]
        assert line["sameProcessAsParentSpan"] is True
        # RFC3339 with microsecond fraction
        assert line["startTime"].endswith("Z") and "." in line["startTime"]

    def test_kind_rides_span_kind_attribute(self, spans):
        # INTERNAL has no OC enum value: kind field absent, the
        # OpenTracing span.kind attribute carries it (and is consumed
        # on the way back)
        internal = spans.filter(F.col("kind") == "INTERNAL")
        line = json.loads(spans_to_oc_json(internal).first()["oc"])
        assert "kind" not in line
        assert line["attributes"]["attributeMap"]["span.kind"]["stringValue"][
            "value"
        ] == "internal"
        native = spans.filter(F.col("kind") == "SERVER")
        if native.count():
            nline = json.loads(spans_to_oc_json(native).first()["oc"])
            assert nline["kind"] == "SERVER"
            assert "span.kind" not in nline["attributes"]["attributeMap"]

    def test_status_omitted_at_zero(self, spans):
        ok = spans.filter(F.col("status_code") == 0)
        line = json.loads(spans_to_oc_json(ok).first()["oc"])
        assert "status" not in line
        err = spans.filter(F.col("status_code") == 2)
        if err.count():
            eline = json.loads(spans_to_oc_json(err).first()["oc"])
            assert eline["status"]["code"] == 2


@pytest.fixture(scope="module")
def datapoints(spark):
    rows = [
        ("req.count", "IntSum", "CUMULATIVE", {"code": "200"}, "2024-01-01 00:00:01.5", 10, None),
        ("req.count", "IntSum", "CUMULATIVE", {"code": "200"}, "2024-01-01 00:00:02.5", 25, None),
        ("req.count", "IntSum", "CUMULATIVE", {"code": "500"}, "2024-01-01 00:00:01.5", 3, None),
        ("cpu.pct", "DoubleGauge", "UNSPECIFIED", {}, "2024-01-01 00:00:01", None, 0.25),
        # DELTA has no OC representation — must be dropped, not mangled
        ("clicks", "IntSum", "DELTA", {}, "2024-01-01 00:00:01", 7, None),
    ]
    df = spark.createDataFrame(
        rows,
        "name string, data_type string, temporality string, "
        "labels map<string,string>, ts_s string, int_value long, double_value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    return df.cache()


class TestOcMetricsRoundTrip:
    def test_round_trip(self, datapoints):
        oc = metrics_to_oc_json(datapoints, label_keys=["code"])
        back = oc_json_to_metrics(oc)
        lbl = F.array_sort(F.map_entries(F.col("labels"))).alias("lbl")
        want = (
            datapoints.filter(F.col("temporality") != "DELTA")
            .select(
                "name", "data_type", "temporality", lbl,
                F.unix_micros(F.col("ts")).alias("us"),
                "int_value", "double_value",
            )
        )
        got = back.select(
            "name", "data_type", "temporality", lbl,
            F.unix_micros(F.col("ts")).alias("us"),
            "int_value", "double_value",
        )
        assert got.count() == 4
        assert got.subtract(want).count() == 0
        assert want.subtract(got).count() == 0

    def test_descriptor_shape(self, datapoints):
        lines = [
            json.loads(r["oc"])
            for r in metrics_to_oc_json(datapoints, label_keys=["code"]).collect()
        ]
        by_name = {l["metricDescriptor"]["name"]: l for l in lines}
        req = by_name["req.count"]
        assert req["metricDescriptor"]["type"] == "CUMULATIVE_INT64"
        assert req["metricDescriptor"]["labelKeys"] == [{"key": "code"}]
        # two label-sets → two timeseries; the 200 series has 2 points in ts order
        assert len(req["timeseries"]) == 2
        ts200 = next(
            t for t in req["timeseries"] if t["labelValues"][0]["value"] == "200"
        )
        assert [p["int64Value"] for p in ts200["points"]] == ["10", "25"]
        cpu = by_name["cpu.pct"]
        assert cpu["metricDescriptor"]["type"] == "GAUGE_DOUBLE"
        # absent label → hasValue false
        assert cpu["timeseries"][0]["labelValues"][0]["hasValue"] is False
        assert "clicks" not in by_name
