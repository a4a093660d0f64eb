"""Span processor rename semantics + resource processor, ported from
processor/spanprocessor/span_test.go and
processor/resourceprocessor/resource_processor_test.go shapes."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import Action
from opentelemetry_collector_spark.operators.span import (
    ResourceProcessor,
    ToAttributesRule,
    rename_from_attributes,
    rename_to_attributes,
)


def spans_df(spark, rows):
    """rows: list of (name, attrs_dict)."""
    return spark.createDataFrame(
        [(name, attrs) for name, attrs in rows],
        "name string, attrs map<string,string>",
    )


class TestRenameFromAttributes:
    def test_joins_in_config_order(self, spark):
        df = spans_df(spark, [("old", {"svc": "api", "op": "get", "ver": "1"})])
        got = rename_from_attributes(df, ["svc", "op", "ver"], separator="::").first()
        assert got["name"] == "api::get::1"

    def test_any_missing_key_aborts(self, spark):
        # span.go:136-149 — all-or-nothing
        df = spans_df(spark, [("old", {"svc": "api"})])
        got = rename_from_attributes(df, ["svc", "missing"], separator="-").first()
        assert got["name"] == "old"

    def test_empty_separator(self, spark):
        df = spans_df(spark, [("old", {"a": "x", "b": "y"})])
        assert rename_from_attributes(df, ["a", "b"]).first()["name"] == "xy"

    def test_requires_keys(self, spark):
        df = spans_df(spark, [("old", {})])
        with pytest.raises(ValueError):
            rename_from_attributes(df, [])


class TestRenameToAttributes:
    def test_single_rule_extracts_and_placeholders(self, spark):
        # the canonical example from the spanprocessor README/tests
        df = spans_df(spark, [("/api/v1/document/12345/update", {})])
        got = rename_to_attributes(
            df, [r"/api/v1/document/(?P<documentId>.*)/update"]
        ).first()
        assert got["attrs"]["documentId"] == "12345"
        assert got["name"] == "/api/v1/document/{documentId}/update"

    def test_no_match_is_noop(self, spark):
        df = spans_df(spark, [("/health", {"keep": "1"})])
        got = rename_to_attributes(df, [r"/api/(?P<x>\d+)"]).first()
        assert got["name"] == "/health" and dict(got["attrs"]) == {"keep": "1"}

    def test_multiple_groups(self, spark):
        df = spans_df(spark, [("GET /users/42/posts/7", {})])
        got = rename_to_attributes(
            df, [r"/users/(?P<uid>\d+)/posts/(?P<pid>\d+)"]
        ).first()
        assert got["attrs"]["uid"] == "42" and got["attrs"]["pid"] == "7"
        assert got["name"] == "GET /users/{uid}/posts/{pid}"

    def test_break_after_match_stops_rules(self, spark):
        df = spans_df(spark, [("/doc/1/page/2", {})])
        rules = [r"/doc/(?P<doc>\d+)", r"/page/(?P<page>\d+)"]
        stop = rename_to_attributes(df, rules, break_after_match=True).first()
        assert "doc" in stop["attrs"] and "page" not in stop["attrs"]
        both = rename_to_attributes(df, rules, break_after_match=False).first()
        assert "doc" in both["attrs"] and "page" in both["attrs"]
        assert both["name"] == "/doc/{doc}/page/{page}"

    def test_rejects_unnamed_groups(self, spark):
        with pytest.raises(ValueError):
            ToAttributesRule(r"/api/(\d+)")


class TestResourceProcessor:
    def test_null_resource_initialized_then_upserted(self, spark):
        df = spark.createDataFrame(
            [("c1", None)], "conv_id string, resource_attrs map<string,string>"
        )
        proc = ResourceProcessor([Action("cloud.zone", "upsert", value="zone-1")])
        got = proc(df).first()
        assert dict(got["resource_attrs"]) == {"cloud.zone": "zone-1"}

    def test_ordered_actions(self, spark):
        df = spark.createDataFrame(
            [("c1", {"env": "dev", "drop": "x"})],
            "conv_id string, resource_attrs map<string,string>",
        )
        proc = ResourceProcessor(
            [
                Action("env", "update", value="prod"),
                Action("drop", "delete"),
                Action("team", "insert", value="obs"),
            ]
        )
        got = proc(df).first()
        assert dict(got["resource_attrs"]) == {"env": "prod", "team": "obs"}
