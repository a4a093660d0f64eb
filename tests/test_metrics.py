"""Metrics-signal operators: typed variants, metric-vs-datapoint
counting, name filtering, resource_to_label, temporality roll-ups."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.metrics import (
    datapoint_count,
    filter_metric_names,
    metric_count,
    resource_to_label,
    temporality_totals,
    validate_datapoints,
)


@pytest.fixture(scope="module")
def datapoints(spark):
    rows = [
        # name, type, temporality, labels, resource, ts, int, double, buckets
        ("cpu.time", "DoubleSum", "CUMULATIVE", {"core": "0"}, {"host": "a"},
         "2025-01-01 00:00:00", None, 10.5, None),
        ("cpu.time", "DoubleSum", "CUMULATIVE", {"core": "0"}, {"host": "a"},
         "2025-01-01 00:01:00", None, 12.25, None),
        ("requests", "IntSum", "DELTA", {"code": "200"}, {"host": "a"},
         "2025-01-01 00:00:30", 7, None, None),
        ("requests", "IntSum", "DELTA", {"code": "200"}, {"host": "b"},
         "2025-01-01 00:01:30", 5, None, None),
        ("latency", "DoubleHistogram", "DELTA", {}, {"host": "b"},
         "2025-01-01 00:00:10", None, None, [1, 5, 2]),
        ("broken", "IntGauge", "UNSPECIFIED", {}, {},
         "2025-01-01 00:00:00", None, 3.0, None),  # wrong variant
    ]
    df = spark.createDataFrame(
        rows,
        "name string, data_type string, temporality string, "
        "labels map<string,string>, resource_attrs map<string,string>, "
        "ts string, int_value long, double_value double, bucket_counts array<long>",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return df.cache()


class TestCounts:
    def test_metric_vs_datapoint_count(self, datapoints):
        # 4 metrics (cpu.time, requests, latency, broken), 6 datapoints
        assert metric_count(datapoints).first()["metric_count"] == 4
        assert datapoint_count(datapoints).first()["datapoint_count"] == 6

    def test_validate_typed_variants(self, datapoints):
        v = {(r["name"], r["ts"].isoformat()): r["valid"]
             for r in validate_datapoints(datapoints).collect()}
        assert v[("broken", "2025-01-01T00:00:00")] is False
        assert all(ok for (name, _), ok in v.items() if name != "broken")


class TestFilterNames:
    def test_strict(self, datapoints):
        got = filter_metric_names(datapoints, ["cpu.time"], "strict")
        assert got.count() == 2

    def test_regexp_any_unanchored(self, datapoints):
        got = filter_metric_names(datapoints, ["que", "laten"], "regexp")
        assert {r["name"] for r in got.collect()} == {"requests", "latency"}

    def test_exclude(self, datapoints):
        got = filter_metric_names(datapoints, ["cpu.time"], "strict", action="exclude")
        assert "cpu.time" not in {r["name"] for r in got.collect()}


class TestResourceToLabel:
    def test_copied_and_dp_label_wins(self, spark):
        df = spark.createDataFrame(
            [("m", {"host": "dp-wins", "k": "v"}, {"host": "res", "region": "r1"})],
            "name string, labels map<string,string>, resource_attrs map<string,string>",
        )
        got = dict(resource_to_label(df).first()["labels"])
        assert got == {"host": "dp-wins", "k": "v", "region": "r1"}

    def test_null_maps(self, spark):
        df = spark.createDataFrame(
            [("m", None, {"region": "r1"})],
            "name string, labels map<string,string>, resource_attrs map<string,string>",
        )
        assert dict(resource_to_label(df).first()["labels"]) == {"region": "r1"}


class TestTemporality:
    def test_delta_sums_cumulative_takes_latest(self, datapoints):
        got = {r["name"]: r for r in temporality_totals(datapoints).collect()}
        assert got["requests"]["delta_total"] == 12.0  # 7 + 5
        assert got["cpu.time"]["latest_value"] == 12.25  # max_by ts
        assert got["cpu.time"]["delta_total"] is None
