"""OTLP protobuf-JSON round trip: flat records → resourceLogs tree →
flat records (fileexporter → otlpreceiver pair)."""

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.otlp_json import (
    logs_from_otlp_json,
    logs_to_otlp_json,
)


class TestOtlpJsonRoundTrip:
    def test_round_trip_preserves_rows(self, spark, tiny_transcripts):
        out = logs_to_otlp_json(tiny_transcripts)
        back = logs_from_otlp_json(out)
        n = tiny_transcripts.count()
        # LogRecordCount conservation (log.go:85-97)
        assert back.count() == n
        # per-turn text equality under (conv_id, turn_idx) keys — the
        # north-star per-row invariant
        orig = tiny_transcripts.select("conv_id", "turn_idx", "role", "text", "tool")
        got = back.select("conv_id", "turn_idx", "role", "text", "tool")
        assert got.subtract(orig).count() == 0
        assert orig.subtract(got).count() == 0

    def test_timestamps_survive_ns_encoding(self, spark, tiny_transcripts):
        back = logs_from_otlp_json(logs_to_otlp_json(tiny_transcripts))
        orig = tiny_transcripts.select(
            "conv_id", "turn_idx", F.col("ts").cast("timestamp").cast("long").alias("es")
        )
        got = back.select(
            "conv_id", "turn_idx", F.col("ts").cast("timestamp").cast("long").alias("es")
        )
        assert got.subtract(orig).count() == 0

    def test_one_line_per_resource_group(self, spark, tiny_transcripts):
        out = logs_to_otlp_json(tiny_transcripts)
        assert out.count() == tiny_transcripts.select("conv_id").distinct().count()
        # valid JSON with the OTLP field names (v0.17 shape)
        line = json.loads(out.first()["otlp"])
        rl = line["resourceLogs"][0]
        assert rl["resource"]["attributes"][0]["key"] == "conv_id"
        ill = rl["instrumentationLibraryLogs"][0]
        assert ill["instrumentationLibrary"]["name"] == "transcripts"
        assert ill["logs"][0]["body"]["stringValue"]

    def test_library_name_carried(self, spark, tiny_transcripts):
        back = logs_from_otlp_json(
            logs_to_otlp_json(tiny_transcripts, library_name="libX")
        )
        assert back.select("library").distinct().collect()[0]["library"] == "libX"


class TestRecordOrdering:
    def test_records_in_numeric_turn_order(self, spark):
        # turn indexes 0..11 must serialize 0,1,2,...,11 — not the
        # lexicographic 0,1,10,11,2,...
        rows = [
            ("conv-x", i, "user", f"turn {i}", None, "2025-01-01 00:00:%02d" % i)
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        line = json.loads(logs_to_otlp_json(df).first()["otlp"])
        logs = line["resourceLogs"][0]["instrumentationLibraryLogs"][0]["logs"]
        texts = [r["body"]["stringValue"] for r in logs]
        assert texts == [f"turn {i}" for i in range(12)]


class TestOtlpMetricsRoundTrip:
    @pytest.fixture(scope="class")
    def datapoints(self, spark):
        rows = [
            ("req.count", "IntSum", "CUMULATIVE", {"code": "200"}, "2024-01-01 00:00:01.5", 10, None),
            ("req.count", "IntSum", "CUMULATIVE", {"code": "200"}, "2024-01-01 00:00:02.5", 25, None),
            ("clicks", "IntSum", "DELTA", {}, "2024-01-01 00:00:01", 7, None),
            ("cpu.pct", "DoubleGauge", "UNSPECIFIED", {}, "2024-01-01 00:00:01", None, 0.25),
            ("mem.used", "IntGauge", "UNSPECIFIED", {"host": "a"}, "2024-01-01 00:00:03", 512, None),
            ("rate", "DoubleSum", "CUMULATIVE", {}, "2024-01-01 00:00:04", None, 1.5),
        ]
        return spark.createDataFrame(
            rows,
            "name string, data_type string, temporality string, "
            "labels map<string,string>, ts_s string, int_value long, double_value double",
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").cache()

    def test_round_trip_all_union_arms(self, datapoints):
        from opentelemetry_collector_spark.sources.otlp_json import (
            metrics_from_otlp_json,
            metrics_to_otlp_json,
        )

        back = metrics_from_otlp_json(metrics_to_otlp_json(datapoints))
        lbl = F.array_sort(F.map_entries(F.col("labels"))).alias("lbl")
        canon = lambda d: d.select(  # noqa: E731
            "name", "data_type", "temporality", lbl,
            F.unix_micros(F.col("ts")).alias("us"), "int_value", "double_value",
        )
        assert back.count() == datapoints.count()
        assert canon(back).subtract(canon(datapoints)).count() == 0
        assert canon(datapoints).subtract(canon(back)).count() == 0

    def test_union_shape(self, datapoints):
        from opentelemetry_collector_spark.sources.otlp_json import (
            metrics_to_otlp_json,
        )

        lines = {
            json.loads(r["otlp"])["name"]: json.loads(r["otlp"])
            for r in metrics_to_otlp_json(datapoints).collect()
        }
        req = lines["req.count"]
        assert "intSum" in req and "doubleSum" not in req
        assert req["intSum"]["aggregationTemporality"] == (
            "AGGREGATION_TEMPORALITY_CUMULATIVE"
        )
        pts = req["intSum"]["dataPoints"]
        assert [p["value"] for p in pts] == ["10", "25"]  # ts order, int64-as-string
        assert pts[0]["labels"] == [{"key": "code", "value": "200"}]
        assert lines["clicks"]["intSum"]["aggregationTemporality"] == (
            "AGGREGATION_TEMPORALITY_DELTA"
        )
        assert "dataPoints" in lines["cpu.pct"]["doubleGauge"]
