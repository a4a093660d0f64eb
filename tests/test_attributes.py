"""Table-driven attribute-action tests — port of the reference's
processor/processorhelper/attraction_test.go and
processor/attributesprocessor/attributes_log_test.go cases: each case
is (input attribute map, action list, expected attribute map), compared
after canonical sorting (the reference sorts maps before equality,
common.go:577-583 — Spark maps compare as dicts, same effect)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import (
    Action,
    AttributesProcessor,
    apply_actions_to_map,
)
from opentelemetry_collector_spark.operators.filters import (
    AttributeCondition,
    MatchProperties,
    matcher,
)

from conftest import attrs_df


def run_actions(spark, input_attrs: dict, actions: list[Action]) -> dict:
    df = attrs_df(spark, [input_attrs])
    out = df.select(apply_actions_to_map(F.col("attrs"), actions).alias("attrs"))
    return dict(out.first()["attrs"])


SHA1 = lambda s: hashlib.sha1(s.encode()).hexdigest()

# (name, input, actions, expected) — cases mirror attraction_test.go
CASES = [
    (
        "insert_absent_literal",
        {"anno": "old"},
        [Action(key="attribute1", action="insert", value=123)],
        {"anno": "old", "attribute1": "123"},
    ),
    (
        "insert_present_noop",
        {"attribute1": "known"},
        [Action(key="attribute1", action="insert", value="new")],
        {"attribute1": "known"},
    ),
    (
        "insert_from_attribute_missing_source",
        {"anno": "old"},
        [Action(key="dst", action="insert", from_attribute="nope")],
        {"anno": "old"},
    ),
    (
        "insert_from_attribute",
        {"anno": "old", "src": "val"},
        [Action(key="dst", action="insert", from_attribute="src")],
        {"anno": "old", "src": "val", "dst": "val"},
    ),
    (
        "update_present",
        {"k": "v1"},
        [Action(key="k", action="update", value="v2")],
        {"k": "v2"},
    ),
    (
        "update_absent_noop",
        {"other": "v"},
        [Action(key="k", action="update", value="v2")],
        {"other": "v"},
    ),
    (
        "update_from_attribute",
        {"k": "v1", "src": "sv"},
        [Action(key="k", action="update", from_attribute="src")],
        {"k": "sv", "src": "sv"},
    ),
    (
        "upsert_absent",
        {},
        [Action(key="region", action="upsert", value="planet-earth")],
        {"region": "planet-earth"},
    ),
    (
        "upsert_present",
        {"region": "mars"},
        [Action(key="region", action="upsert", value="planet-earth")],
        {"region": "planet-earth"},
    ),
    (
        "upsert_from_attribute_missing_noop",
        {"anno": "old"},
        [Action(key="dst", action="upsert", from_attribute="nope")],
        {"anno": "old"},
    ),
    (
        "delete_present",
        {"duplicate_key": "x", "original_key": "y"},
        [Action(key="duplicate_key", action="delete")],
        {"original_key": "y"},
    ),
    (
        "delete_absent_noop",
        {"k": "v"},
        [Action(key="nope", action="delete")],
        {"k": "v"},
    ),
    (
        "hash_string_value",
        {"user.email": "john.doe@example.com"},
        [Action(key="user.email", action="hash")],
        {"user.email": SHA1("john.doe@example.com")},
    ),
    (
        "hash_absent_noop",
        {"k": "v"},
        [Action(key="nope", action="hash")],
        {"k": "v"},
    ),
    (
        "extract_full_match",
        {"user_key": "/api/v1/document/12345678/update", "foo": "casper"},
        [
            Action(
                key="user_key",
                action="extract",
                pattern=r"/api/(?P<new_user_key>.*)/document/(?P<doc_id>.*)/update",
            )
        ],
        {
            "user_key": "/api/v1/document/12345678/update",
            "foo": "casper",
            "new_user_key": "v1",
            "doc_id": "12345678",
        },
    ),
    (
        "extract_no_match_noop",
        {"user_key": "not matching", "foo": "casper"},
        [
            Action(
                key="user_key",
                action="extract",
                pattern=r"/api/(?P<new_user_key>.*)/document/(?P<doc_id>.*)/update",
            )
        ],
        {"user_key": "not matching", "foo": "casper"},
    ),
    (
        "extract_missing_key_noop",
        {"foo": "casper"},
        [Action(key="user_key", action="extract", pattern=r"(?P<g>\d+)")],
        {"foo": "casper"},
    ),
    (
        "extract_overwrites_existing_group_key",
        {"user_key": "id=99", "g": "old"},
        [Action(key="user_key", action="extract", pattern=r"id=(?P<g>\d+)")],
        {"user_key": "id=99", "g": "99"},
    ),
    (
        "ordered_action_list",
        {"operation": "default", "svc.operation": "old"},
        [
            Action(key="svc.operation", action="upsert", from_attribute="operation"),
            Action(key="operation", action="delete"),
        ],
        {"svc.operation": "default"},
    ),
    (
        "insert_typed_literals_stringified",
        {},
        [
            Action(key="b", action="insert", value=True),
            Action(key="d", action="insert", value=0.1),
            Action(key="i", action="insert", value=-42),
        ],
        {"b": "true", "d": "0.1", "i": "-42"},
    ),
]


@pytest.mark.parametrize("name,inp,actions,expected", CASES, ids=[c[0] for c in CASES])
def test_action_cases(spark, name, inp, actions, expected):
    assert run_actions(spark, inp, actions) == expected


class TestActionValidation:
    """Config-validation parity with NewAttrProc (attraction.go:138-211)."""

    def test_missing_key(self):
        with pytest.raises(ValueError, match="key"):
            Action(key="", action="delete")

    def test_unsupported_action(self):
        with pytest.raises(ValueError, match="unsupported"):
            Action(key="k", action="frobnicate")

    def test_insert_needs_value_xor_from_attribute(self):
        with pytest.raises(ValueError, match="value"):
            Action(key="k", action="insert")
        with pytest.raises(ValueError, match="both"):
            Action(key="k", action="insert", value="v", from_attribute="a")

    def test_insert_rejects_pattern(self):
        with pytest.raises(ValueError, match="pattern"):
            Action(key="k", action="insert", value="v", pattern="x")

    def test_delete_rejects_value(self):
        with pytest.raises(ValueError):
            Action(key="k", action="delete", value="v")

    def test_hash_rejects_from_attribute(self):
        with pytest.raises(ValueError):
            Action(key="k", action="hash", from_attribute="a")

    def test_extract_needs_pattern(self):
        with pytest.raises(ValueError, match="pattern"):
            Action(key="k", action="extract")

    def test_extract_rejects_unnamed_groups(self):
        with pytest.raises(ValueError):
            Action(key="k", action="extract", pattern=r"(\d+)")

    def test_case_insensitive_action(self):
        assert Action(key="k", action="DELETE").action == "delete"


class TestIncludeExcludeGate:
    """attributes_log.go:72-88 — include checked first, then exclude."""

    ACTIONS = [Action(key="processed", action="upsert", value="yes")]

    def _run(self, spark, include=None, exclude=None):
        df = attrs_df(spark, [{"svc": "auth", "env": "prod"}, {"svc": "web", "env": "dev"}])
        proc = AttributesProcessor(self.ACTIONS, include=include, exclude=exclude)
        return [dict(r["attrs"]) for r in proc(df).collect()]

    def test_no_matchers_processes_all(self, spark):
        out = self._run(spark)
        assert all(a.get("processed") == "yes" for a in out)

    def test_include_only(self, spark):
        inc = matcher(
            MatchProperties("strict", attributes=[AttributeCondition("svc", "auth")])
        )
        out = self._run(spark, include=inc)
        assert out[0].get("processed") == "yes"
        assert "processed" not in out[1]

    def test_exclude_only(self, spark):
        exc = matcher(
            MatchProperties("strict", attributes=[AttributeCondition("env", "prod")])
        )
        out = self._run(spark, exclude=exc)
        assert "processed" not in out[0]
        assert out[1].get("processed") == "yes"

    def test_include_and_exclude(self, spark):
        inc = matcher(MatchProperties("regexp", attributes=[AttributeCondition("svc", "au|we")]))
        exc = matcher(
            MatchProperties("strict", attributes=[AttributeCondition("env", "dev")])
        )
        out = self._run(spark, include=inc, exclude=exc)
        assert out[0].get("processed") == "yes"
        assert "processed" not in out[1]
