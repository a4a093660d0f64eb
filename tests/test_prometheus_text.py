"""Prometheus exposition-format codec (sources/prometheus_text.py).

Reference parity targets:
  receiver/prometheusreceiver/internal/metricsbuilder.go:222-246
    (type mapping, always-float64), 193-200 (suffix trimming),
    161-178 (useless labels), 203-220 (le/quantile boundaries);
  exposition escaping rules (backslash, quote, newline).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.prometheus_text import (
    escape_label_value,
    metrics_to_prom_text,
    prom_text_to_metrics,
    prom_text_to_samples,
    sanitize_metric_name,
    unescape_label_value,
)

DP_SCHEMA = (
    "name string, data_type string, temporality string, "
    "labels map<string,string>, ts timestamp, int_value long, "
    "double_value double"
)


def page(spark, text):
    return spark.createDataFrame([(text,)], "text string")


class TestEncode:
    def test_exact_page_golden(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "events.click",
                    "DoubleSum",
                    "CUMULATIVE",
                    {"m": "click"},
                    dt.datetime(2026, 1, 1, 0, 0, 1, 500000),
                    None,
                    12.5,
                )
            ],
            DP_SCHEMA,
        )
        [r] = metrics_to_prom_text(df).collect()
        assert r["family"] == "events_click"
        assert r["text"] == (
            "# TYPE events_click counter\n"
            'events_click{m="click"} 12.5 1767225601500\n'
        )

    def test_delta_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "IntSum", "DELTA", {"m": "x"}, dt.datetime(2026, 1, 1), 7, None),
                ("b", "IntSum", "CUMULATIVE", {"m": "x"}, dt.datetime(2026, 1, 1), 7, None),
            ],
            DP_SCHEMA,
        )
        fams = {r["family"] for r in metrics_to_prom_text(df).collect()}
        assert fams == {"b"}  # DELTA has no exposition representation

    def test_int_samples_render_as_floats(self, spark):
        # metricsbuilder.go:224-226: "always use float64" — an int
        # counter round-trips as a double
        df = spark.createDataFrame(
            [("c", "IntSum", "CUMULATIVE", {"m": "x"}, dt.datetime(2026, 1, 1), 1027, None)],
            DP_SCHEMA,
        )
        [r] = metrics_to_prom_text(df).collect()
        assert 'c{m="x"} 1027 ' in r["text"]

    def test_gauge_type_line_and_deterministic_order(self, spark):
        rows = [
            ("g", "DoubleGauge", "UNSPECIFIED", {"m": b}, dt.datetime(2026, 1, 1), None, v)
            for b, v in (("z", 1.0), ("a", 2.0))
        ]
        df = spark.createDataFrame(rows, DP_SCHEMA)
        [r] = metrics_to_prom_text(df).collect()
        lines = r["text"].strip().split("\n")
        assert lines[0] == "# TYPE g gauge"
        assert lines[1] < lines[2]  # samples sorted, page reproducible


class TestEscaping:
    NASTY = ['a"b', "back\\slash", "new\nline", "\\n", 'mix\\"q\n\\\\end', ""]

    def test_escape_unescape_identity(self, spark):
        df = spark.createDataFrame([(s,) for s in self.NASTY], "v string")
        out = df.select(
            unescape_label_value(escape_label_value(F.col("v"))).alias("r")
        ).collect()
        assert [r["r"] for r in out] == self.NASTY

    def test_escaped_backslash_n_is_not_newline(self, spark):
        # the chained-replace bug this module's split trick avoids:
        # the two-char value backslash+n must survive, distinct from
        # an actual newline
        df = page(spark, '# TYPE x gauge\nx{m="a\\\\nb"} 1\n')
        [r] = prom_text_to_samples(df).collect()
        assert r["labels"]["m"] == "a\\nb"  # backslash + n, 4 chars

    def test_full_roundtrip_with_nasty_labels(self, spark):
        df = spark.createDataFrame(
            [
                ("g", "DoubleGauge", "UNSPECIFIED", {"m": s}, dt.datetime(2026, 1, 1), None, 1.0)
                for s in self.NASTY
                if s  # empty label value renders as an absent pair
            ],
            DP_SCHEMA,
        )
        back = prom_text_to_metrics(metrics_to_prom_text(df))
        got = sorted(r["labels"]["m"] for r in back.collect())
        assert got == sorted(s for s in self.NASTY if s)


class TestParse:
    def test_type_mapping(self, spark):
        df = page(
            spark,
            "# TYPE c counter\n"
            'c{m="x"} 1.5 1000\n'
            "# TYPE g gauge\n"
            'g{m="x"} 2.5 1000\n'
            'u{m="x"} 3.5 1000\n',
        )
        rows = {r["name"]: r for r in prom_text_to_metrics(df).collect()}
        assert rows["c"]["data_type"] == "DoubleSum"
        assert rows["c"]["temporality"] == "CUMULATIVE"
        assert rows["g"]["data_type"] == "DoubleGauge"
        assert rows["g"]["temporality"] == "UNSPECIFIED"
        # no TYPE metadata → unknown → gauge (metricsbuilder.go:227-229)
        assert rows["u"]["data_type"] == "DoubleGauge"

    def test_histogram_family_assembly_inputs(self, spark):
        df = page(
            spark,
            "# TYPE lat histogram\n"
            'lat_bucket{le="0.5",job="scrape"} 3 1000\n'
            'lat_bucket{le="+Inf"} 5 1000\n'
            "lat_sum 2.5 1000\n"
            "lat_count 5 1000\n",
        )
        s = prom_text_to_samples(df).collect()
        assert {r["family"] for r in s} == {"lat"}  # suffixes trimmed
        buckets = {r["boundary"] for r in s if r["metric_name"] == "lat_bucket"}
        assert buckets == {0.5, float("inf")}  # le → boundary, +Inf ok
        for r in s:
            assert "le" not in r["labels"]  # boundary label lifted out
            assert "job" not in r["labels"]  # useless label dropped
        # distribution families never leak into the scalar frame
        assert prom_text_to_metrics(df).count() == 0

    def test_summary_quantile_boundary(self, spark):
        df = page(
            spark,
            "# TYPE rpc summary\n"
            'rpc{quantile="0.99"} 7.0 1000\n'
            "rpc_sum 14.0 1000\n"
            "rpc_count 2 1000\n",
        )
        s = {r["metric_name"]: r for r in prom_text_to_samples(df).collect()}
        assert s["rpc"]["boundary"] == 0.99
        assert s["rpc_sum"]["family"] == "rpc"

    def test_standalone_suffix_name_is_its_own_family(self, spark):
        # a COUNTER literally named x_count must not fold into a
        # (nonexistent) distribution family x
        df = page(spark, "# TYPE x_count counter\n" 'x_count{m="a"} 1 1000\n')
        [r] = prom_text_to_samples(df).collect()
        assert r["family"] == "x_count"

    def test_missing_timestamp_is_null(self, spark):
        df = page(spark, "# TYPE g gauge\n" 'g{m="a"} 1.5\n')
        [r] = prom_text_to_metrics(df).collect()
        assert r["ts"] is None
        assert r["double_value"] == 1.5

    def test_sanitize_metric_name(self, spark):
        df = spark.createDataFrame([("a.b-c:d_e",)], "n string")
        [r] = df.select(sanitize_metric_name(F.col("n")).alias("s")).collect()
        assert r["s"] == "a_b_c:d_e"


class TestRoundtrip:
    def test_counter_roundtrip_matrix_shape(self, spark):
        rows = [
            (
                f"events.{name}",
                "DoubleSum",
                "CUMULATIVE",
                {"m": name},
                dt.datetime(2026, 1, 1, 0, 0, i, 123000),
                None,
                round(0.5 + i, 6),
            )
            for i, name in enumerate(["purchase", "refund", "error"])
        ]
        df = spark.createDataFrame(rows, DP_SCHEMA)
        back = prom_text_to_metrics(metrics_to_prom_text(df))
        got = sorted(
            (r["name"], r["labels"]["m"], r["ts"], r["double_value"])
            for r in back.collect()
        )
        want = sorted(
            (n.replace(".", "_"), lb["m"], ts, dv)
            for n, _dt, _tmp, lb, ts, _iv, dv in rows
        )
        assert got == want
