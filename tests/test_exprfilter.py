"""filterexpr match-type tests, shaped after
internal/processor/filterexpr/matcher_test.go cases."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.exprfilter import (
    compile_expr,
    filter_metrics_expr,
)


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("http.requests", {"method": "GET", "code": "200"}),
        ("http.requests", {"method": "POST", "code": "500"}),
        ("cpu.usage", {"core": "0"}),
        ("mem.usage", {}),
    ]
    return spark.createDataFrame(rows, "name string, labels map<string,string>").cache()


class TestCompile:
    def test_metric_name_equality(self, metrics):
        got = metrics.filter(compile_expr('MetricName == "cpu.usage"')).collect()
        assert len(got) == 1 and got[0]["name"] == "cpu.usage"

    def test_label_and_haslabel(self, metrics):
        got = metrics.filter(
            compile_expr('HasLabel("method") && Label("code") == "500"')
        ).collect()
        assert len(got) == 1 and got[0]["labels"]["method"] == "POST"

    def test_matches_regex_unanchored(self, metrics):
        got = metrics.filter(compile_expr('MetricName matches "usage"')).collect()
        assert {r["name"] for r in got} == {"cpu.usage", "mem.usage"}

    def test_not_and_or(self, metrics):
        got = metrics.filter(
            compile_expr('MetricName == "cpu.usage" || MetricName == "mem.usage"')
        ).count()
        assert got == 2
        got = metrics.filter(compile_expr('!(HasLabel("method"))')).count()
        assert got == 2

    def test_unknown_identifier_rejected(self):
        with pytest.raises(ValueError, match="unknown identifier"):
            compile_expr("DropTable == 1")

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            compile_expr("MetricName; DROP TABLE x")


class TestFilterMetrics:
    def test_any_datapoint_matches_keeps_whole_metric(self, metrics):
        # code==500 matches only one datapoint row, but the whole
        # http.requests metric is kept (matcher.go:148-164)
        got = filter_metrics_expr(metrics, 'Label("code") == "500"').collect()
        assert len(got) == 2
        assert {r["name"] for r in got} == {"http.requests"}

    def test_exclude_drops_whole_metric(self, metrics):
        got = filter_metrics_expr(metrics, 'Label("code") == "500"', action="exclude")
        assert {r["name"] for r in got.collect()} == {"cpu.usage", "mem.usage"}

    def test_missing_label_eval_is_not_match(self, metrics):
        # Label() on a metric without that label → "" (Go map zero
        # value, matcher.go createEnv) → not equal to "0"
        got = filter_metrics_expr(metrics, 'Label("core") == "0"').collect()
        assert {r["name"] for r in got} == {"cpu.usage"}

    def test_missing_label_reads_as_empty_string(self, metrics):
        # reference env parity: Label(k) on a label-less datapoint is
        # "", so != matches rows WITHOUT the label too (a NULL-based
        # compile would silently drop them)
        got = filter_metrics_expr(metrics, 'Label("code") != "500"').collect()
        assert {r["name"] for r in got} == {"http.requests", "cpu.usage", "mem.usage"}
        got = filter_metrics_expr(metrics, 'Label("core") matches "^$|0"').collect()
        assert {r["name"] for r in got} == {
            "http.requests", "cpu.usage", "mem.usage",
        }


class TestEscapes:
    def test_backslash_preserved_in_regex(self, spark):
        df = spark.createDataFrame(
            [("cpu1", {}), ("cpud", {})], "name string, labels map<string,string>"
        )
        got = df.filter(compile_expr(r'MetricName matches "cpu\d+"')).collect()
        assert [r["name"] for r in got] == ["cpu1"]

    def test_escaped_quote(self, spark):
        df = spark.createDataFrame(
            [('say "hi"', {})], "name string, labels map<string,string>"
        )
        assert df.filter(compile_expr(r'MetricName == "say \"hi\""')).count() == 1

    def test_truncated_call_is_config_error(self):
        with pytest.raises(ValueError, match="requires"):
            compile_expr('Label("k"')
        with pytest.raises(ValueError, match="requires"):
            compile_expr('HasLabel(')


class TestRE2Subset:
    def test_java_only_constructs_rejected(self):
        # RE2 has no lookaround/backreferences/possessive quantifiers;
        # accepting them silently would diverge from the reference env
        for pat in (
            r'MetricName matches "(?=cpu).*"',
            r'MetricName matches "(?<!mem)usage"',
            r'MetricName matches "(a)\1"',
            r'MetricName matches "ab*+"',
        ):
            with pytest.raises(ValueError, match="RE2"):
                compile_expr(pat)

    def test_re2_safe_patterns_accepted(self, spark):
        df = spark.createDataFrame(
            [(r"a+b", {})], "name string, labels map<string,string>"
        )
        # escaped metachars and named groups are RE2-legal
        assert df.filter(compile_expr(r'MetricName matches "a\+b"')).count() == 1
        assert df.filter(compile_expr(r'MetricName matches "(?:a.)b"')).count() == 1

    def test_escape_aware_validator_edges(self):
        from opentelemetry_collector_spark.operators.exprfilter import (
            _validate_re2_subset,
        )

        # literal unescaped '}' then '+' is valid RE2 (no quantifier
        # braces) — must NOT be rejected as possessive
        _validate_re2_subset(r"x}+")
        # escaped brace quantifier form likewise literal
        _validate_re2_subset(r"a\{2\}+")
        # a lookahead after an ESCAPED backslash is a real lookahead
        # (the backslash escapes itself, not the paren)
        with pytest.raises(ValueError, match="RE2"):
            _validate_re2_subset("\\\\(?=a)")
        # true possessive brace quantifier stays rejected
        with pytest.raises(ValueError, match="RE2"):
            _validate_re2_subset(r"a{2}+")
        with pytest.raises(ValueError, match="RE2"):
            _validate_re2_subset(r"a{2,5}+")
        # escaped-digit backreference detection is escape-pair exact
        with pytest.raises(ValueError, match="RE2"):
            _validate_re2_subset(r"(a)\1")
        _validate_re2_subset(r"(a)\\1")  # literal backslash then '1'
