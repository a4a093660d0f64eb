"""Config-driven pipeline compilation: the YAML-config analog
(config/config.go + pipelines_builder.go) — spec dicts compile into
the same chains as hand-built stages, unknown types fail at config
time, processors apply in declared order."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.config import (
    build_pipeline_chain,
    build_processor,
    compile_spec,
)
from opentelemetry_collector_spark.plans.pipeline import parse_stage, route_stage


@pytest.fixture(scope="module")
def attr_rows(spark):
    return spark.createDataFrame(
        [
            ("a", {"role": "tool", "level": "info"}),
            ("b", {"role": "user"}),
            ("c", {"role": "tool", "level": "error"}),
        ],
        "id string, attrs map<string,string>",
    ).cache()


class TestBuildProcessor:
    def test_unknown_type_is_config_error(self):
        with pytest.raises(ValueError, match="unknown processor type"):
            build_processor({"type": "tail_sampler"})

    def test_attributes_stage(self, attr_rows):
        stage = build_processor(
            {
                "type": "attributes",
                "actions": [
                    {"key": "env", "action": "insert", "value": "prod"},
                    {"key": "level", "action": "delete"},
                ],
            }
        )
        got = {r["id"]: dict(r["attrs"]) for r in stage(attr_rows).collect()}
        assert got["a"] == {"role": "tool", "env": "prod"}
        assert got["b"] == {"role": "user", "env": "prod"}

    def test_filter_stage_strict(self, attr_rows):
        stage = build_processor(
            {
                "type": "filter",
                "include": {
                    "match_type": "strict",
                    "attributes": [{"key": "role", "value": "tool"}],
                },
            }
        )
        assert {r["id"] for r in stage(attr_rows).collect()} == {"a", "c"}

    def test_declared_order_matters(self, attr_rows):
        # upsert-then-delete ≠ delete-then-upsert
        up_then_del = build_pipeline_chain(
            [
                {"type": "attributes", "actions": [{"key": "x", "action": "upsert", "value": "1"}]},
                {"type": "attributes", "actions": [{"key": "x", "action": "delete"}]},
            ]
        )
        del_then_up = build_pipeline_chain(
            [
                {"type": "attributes", "actions": [{"key": "x", "action": "delete"}]},
                {"type": "attributes", "actions": [{"key": "x", "action": "upsert", "value": "1"}]},
            ]
        )
        a = up_then_del(attr_rows).first()["attrs"]
        b = del_then_up(attr_rows).first()["attrs"]
        assert "x" not in a and b["x"] == "1"


class TestCompileSpec:
    def test_full_spec_end_to_end(self, spark, tiny_transcripts):
        spec = {
            "processors": [
                {
                    "type": "span_to_attributes",
                    "rules": [r"duration=(?P<dur>\d+)ms"],
                    "name_col": "text",
                },
            ],
            "exporters": {
                "errors": {"include_levels": ["warn", "error"]},
                "archive": {},
            },
        }
        chain, routes = compile_spec(spec)
        parsed = parse_stage(tiny_transcripts, engine="jvm").withColumn(
            "attrs",
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")),
        )
        processed = chain(parsed)
        routed = route_stage(processed, routes)
        n = tiny_transcripts.count()
        assert routed["archive"].count() == n
        expect_err = parsed.filter(F.col("level").isin("warn", "error")).count()
        assert routed["errors"].count() == expect_err
        # the to_attributes rule extracted duration into attrs
        with_dur = processed.filter(F.map_contains_key("attrs", "dur")).count()
        parsed_rows = parsed.filter(F.col("parsed")).count()
        assert with_dur == parsed_rows

    def test_requires_exporter(self):
        with pytest.raises(ValueError, match="at least one exporter"):
            compile_spec({"processors": []})

    def test_sampler_from_config(self, spark, tiny_transcripts):
        chain, _ = compile_spec(
            {
                "processors": [
                    {"type": "probabilistic_sampler", "sampling_percentage": 100.0}
                ],
                "exporters": {"archive": {}},
            }
        )
        assert chain(tiny_transcripts).count() == tiny_transcripts.count()
