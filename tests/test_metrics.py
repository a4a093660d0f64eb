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


def py_adjust(series):
    """Pure-python mirror of adjust_cumulative: per series in (ts, raw)
    order, initial/reset points dropped, others emit (raw - seg_first,
    seg_first_ts). metrics_adjuster.go:188-316."""
    out = []
    for name, points in series.items():
        points = sorted(points)
        base_v = base_t = prev = None
        for ts, v in points:
            if prev is None or v < prev:
                base_v, base_t = v, ts  # initial or reset: dropped
            else:
                out.append((name, ts, v - base_v, base_t))
            prev = v
    return sorted(out)


class TestAdjustCumulative:
    def mk(self, spark, series):
        import datetime as dt

        rows = [
            (name, dt.datetime(2026, 1, 1, 0, 0, ts), None, float(v))
            for name, pts in series.items()
            for ts, v in pts
        ]
        return spark.createDataFrame(
            rows, "name string, ts timestamp, int_value long, double_value double"
        )

    def collect(self, df):
        from opentelemetry_collector_spark.operators.metrics import adjust_cumulative

        return sorted(
            (r["name"], r["ts"].second, r["adjusted_value"], r["start_ts"].second)
            for r in adjust_cumulative(df).collect()
        )

    def test_matches_python_golden_with_resets(self, spark):
        series = {
            "a": [(0, 5), (1, 7), (2, 3), (3, 4), (4, 10)],  # reset at t2
            "b": [(0, 1), (1, 1), (2, 2)],  # flat point is NOT a reset
            "c": [(0, 9)],  # single point: initial only, nothing emitted
        }
        assert self.collect(self.mk(spark, series)) == py_adjust(series)

    def test_monotonic_series_single_segment(self, spark):
        series = {"m": [(i, 10 * i) for i in range(6)]}
        got = self.collect(self.mk(spark, series))
        assert [g[2] for g in got] == [10.0, 20.0, 30.0, 40.0, 50.0]
        assert all(g[3] == 0 for g in got)  # one start time for all

    def test_every_point_decreasing_emits_nothing(self, spark):
        series = {"m": [(i, 100 - i) for i in range(5)]}
        assert self.collect(self.mk(spark, series)) == []

    def test_int_valued_series(self, spark):
        import datetime as dt

        rows = [
            ("m", dt.datetime(2026, 1, 1, 0, 0, i), v, None)
            for i, v in enumerate([3, 8, 2, 6])
        ]
        df = spark.createDataFrame(
            rows, "name string, ts timestamp, int_value long, double_value double"
        )
        got = self.collect(df)
        assert got == [("m", 1, 5.0, 0), ("m", 3, 4.0, 2)]

    def test_one_exchange_plan(self, spark):
        from opentelemetry_collector_spark.operators.metrics import adjust_cumulative

        df = self.mk(spark, {"m": [(i, i) for i in range(4)]})
        plan = (
            adjust_cumulative(df)._jdf.queryExecution().executedPlan().toString()
        )
        # both windows and the filter share the series-key partitioning:
        # exactly one shuffle for the whole adjustment
        assert plan.lower().count("exchange") <= 1, plan
