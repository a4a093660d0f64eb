"""loggingexporter: exact-text rendering of the debug blocks
(exporter/loggingexporter/logging_exporter.go)."""

import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sinks import (
    format_logs_debug,
    format_spans_debug,
    go_time_string,
    logging_exporter,
)


def _utc(*args):
    return datetime.datetime(*args)


class TestGoTimeString:
    """time.Unix(0, ns).String() parity: fraction trimmed of trailing
    zeros, omitted when zero (pdata/common.go:31-33)."""

    @pytest.mark.parametrize(
        "micros, want",
        [
            (0, "2020-01-02 03:04:05 +0000 UTC"),
            (120_000, "2020-01-02 03:04:05.12 +0000 UTC"),
            (123_456, "2020-01-02 03:04:05.123456 +0000 UTC"),
            (100_000, "2020-01-02 03:04:05.1 +0000 UTC"),
            (1, "2020-01-02 03:04:05.000001 +0000 UTC"),
        ],
    )
    def test_fraction_trim(self, spark, micros, want):
        base = _utc(2020, 1, 2, 3, 4, 5, micros)
        df = spark.createDataFrame([(base,)], "ts timestamp")
        assert df.select(go_time_string(F.col("ts")).alias("s")).first()["s"] == want


class TestSpanBlock:
    def test_exact_block(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "conv-1",
                    "a" * 16,
                    None,
                    0,
                    "user/-",
                    "SERVER",
                    _utc(2020, 1, 1, 0, 0, 0),
                    _utc(2020, 1, 1, 0, 0, 0, 500_000),
                    0,
                ),
                (
                    "conv-1",
                    "b" * 16,
                    "a" * 16,
                    1,
                    "tool/search",
                    "CLIENT",
                    _utc(2020, 1, 1, 0, 0, 1),
                    _utc(2020, 1, 1, 0, 0, 2),
                    2,
                ),
            ],
            "trace_id string, span_id string, parent_span_id string, turn_idx int,"
            " name string, kind string, start_ts timestamp, end_ts timestamp,"
            " status_code int",
        )
        rows = {r["span_id"]: r["debug"] for r in format_spans_debug(df).collect()}
        import hashlib

        md5 = hashlib.md5(b"conv-1").hexdigest()
        assert rows["a" * 16] == "\n".join(
            [
                "Span #0",
                f"    Trace ID       : {md5}",
                "    Parent ID      : ",
                f"    ID             : {'a' * 16}",
                "    Name           : user/-",
                "    Kind           : SPAN_KIND_SERVER",
                "    Start time     : 2020-01-01 00:00:00 +0000 UTC",
                "    End time       : 2020-01-01 00:00:00.5 +0000 UTC",
                "    Status code    : STATUS_CODE_UNSET",
                "    Status message : ",
            ]
        )
        assert "    Kind           : SPAN_KIND_CLIENT" in rows["b" * 16]
        assert "    Status code    : STATUS_CODE_ERROR" in rows["b" * 16]
        assert "Span #1" in rows["b" * 16]

    def test_attrs_render_sorted_and_empty_skipped(self, spark):
        df = spark.createDataFrame(
            [
                ("t", "s1", None, 0, "n", "INTERNAL",
                 _utc(2020, 1, 1), _utc(2020, 1, 1), 0, {"b": "2", "a": "1"}),
                ("t", "s2", None, 1, "n", "INTERNAL",
                 _utc(2020, 1, 1), _utc(2020, 1, 1), 0, {}),
            ],
            "trace_id string, span_id string, parent_span_id string, turn_idx int,"
            " name string, kind string, start_ts timestamp, end_ts timestamp,"
            " status_code int, attrs map<string,string>",
        )
        rows = {r["span_id"]: r["debug"] for r in format_spans_debug(df).collect()}
        assert rows["s1"].endswith(
            "\nAttributes:\n     -> a: STRING(1)\n     -> b: STRING(2)"
        )
        # empty map: logAttributeMap renders NOTHING, not an empty header
        assert "Attributes" not in rows["s2"]
        assert rows["s2"].endswith("    Status message : ")


class TestLogBlock:
    def test_exact_block(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "conv-9",
                    0,
                    "user",
                    "[info] click: event 7 duration=150ms",
                    None,
                    _utc(2020, 6, 1, 12, 0, 0),
                    "info",
                    "click",
                    "event 7",
                    "150",
                ),
            ],
            "conv_id string, turn_idx int, role string, text string, tool string,"
            " ts timestamp, level string, component string, msg string,"
            " duration_ms string",
        )
        got = format_logs_debug(df).first()["debug"]
        ns = int(
            datetime.datetime(
                2020, 6, 1, 12, 0, 0, tzinfo=datetime.timezone.utc
            ).timestamp()
        ) * 10**9
        assert got == "\n".join(
            [
                "LogRecord #0",
                f"Timestamp: {ns}",
                "Severity: INFO",
                "ShortName: click",
                "Body: [info] click: event 7 duration=150ms",
                "Attributes:",
                "     -> component: STRING(click)",
                "     -> duration_ms: STRING(150)",
                "     -> role: STRING(user)",
            ]
        )


class TestExporterSurface:
    def test_summary_counts_and_debug_gate(self, spark, tiny_transcripts):
        from opentelemetry_collector_spark.operators.traces import transcripts_to_spans
        from opentelemetry_collector_spark.plans.pipeline import parse_stage

        spans = transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm"))
        info = logging_exporter(spans, "traces", level="info")
        assert info["debug"] is None
        row = info["summary"].first()
        assert (row["exporter"], row["counter"]) == ("TracesExporter", "#spans")
        assert row["n"] == spans.count()

        dbg = logging_exporter(spans, "traces", level="DEBUG")
        assert dbg["debug"].count() == spans.count()

        logs = logging_exporter(parse_stage(tiny_transcripts, engine="jvm"), "logs", "debug")
        assert logs["summary"].first()["exporter"] == "LogsExporter"
        assert logs["debug"].count() == tiny_transcripts.count()

        with pytest.raises(ValueError, match="unknown signal"):
            logging_exporter(spans, "profiles")


class TestMetricsBlock:
    def _dps(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "name string, data_type string, temporality string,"
            " labels map<string,string>, ts timestamp,"
            " int_value long, double_value double",
        )

    def test_descriptor_on_first_point_only(self, spark):
        from opentelemetry_collector_spark.sinks import format_metrics_debug

        df = self._dps(
            spark,
            [
                ("m.a", "IntSum", "DELTA", {"k": "1"}, _utc(2020, 1, 1, 0, 0, 0), 7, None),
                ("m.a", "IntSum", "DELTA", {"k": "2"}, _utc(2020, 1, 1, 0, 0, 1), 9, None),
                ("m.b", "DoubleGauge", "UNSPECIFIED", {}, _utc(2020, 1, 1), None, 2.5),
            ],
        )
        rows = {
            (r["name"], r["dp_idx"]): r["debug"]
            for r in format_metrics_debug(df).collect()
        }
        assert rows[("m.a", 0)] == "\n".join(
            [
                "Metric #0",
                "Descriptor:",
                "     -> Name: m.a",
                "     -> Description: ",
                "     -> Unit: ",
                "     -> DataType: IntSum",
                "     -> IsMonotonic: false",
                "     -> AggregationTemporality: AGGREGATION_TEMPORALITY_DELTA",
                "IntDataPoints #0",
                "Data point labels:",
                "     -> k: 1",
                "StartTime: 0",
                "Timestamp: 1577836800000000000",
                "Value: 7",
            ]
        )
        # second point: NO descriptor, just the point block
        assert rows[("m.a", 1)].startswith("IntDataPoints #1\n")
        assert "Descriptor" not in rows[("m.a", 1)]
        # gauge: no monotonic/temporality lines, %f double rendering,
        # empty labels render nothing
        assert rows[("m.b", 0)] == "\n".join(
            [
                "Metric #1",
                "Descriptor:",
                "     -> Name: m.b",
                "     -> Description: ",
                "     -> Unit: ",
                "     -> DataType: DoubleGauge",
                "DoubleDataPoints #0",
                "StartTime: 0",
                "Timestamp: 1577836800000000000",
                "Value: 2.500000",
            ]
        )

    def test_histogram_rejected_loudly(self, spark):
        from opentelemetry_collector_spark.sinks import format_metrics_debug

        df = self._dps(
            spark,
            [("m.h", "DoubleHistogram", "DELTA", {}, _utc(2020, 1, 1), None, 1.0)],
        )
        with pytest.raises(Exception, match="unsupported data_type"):
            format_metrics_debug(df).collect()
