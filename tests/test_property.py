"""Property-based parity: hypothesis generates attribute maps and
action lists; a pure-Python reference model of the attraction
semantics (attraction.go:213-283) is compared against the Spark
implementation. All generated cases for one property run in a SINGLE
DataFrame so Spark executes once per test, not once per example."""

import hashlib
import pytest

# slow lane: hypothesis action-parity properties; directed attribute-op tests stay fast
pytestmark = pytest.mark.slow
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import (
    Action,
    apply_actions_to_map,
)

KEYS = ["alpha", "beta", "gamma", "delta"]
VALUES = ["", "x", "value-1", "True", "3.14", "100"]

attr_maps = st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=4)


def insertish(kind):
    return st.builds(
        lambda key, use_from, value, src: Action(
            key,
            kind,
            value=None if use_from else value,
            from_attribute=src if use_from else "",
        ),
        st.sampled_from(KEYS),
        st.booleans(),
        st.sampled_from(VALUES),
        st.sampled_from(KEYS),
    )


actions_strategy = st.lists(
    st.one_of(
        insertish("insert"),
        insertish("update"),
        insertish("upsert"),
        st.builds(lambda k: Action(k, "delete"), st.sampled_from(KEYS)),
        st.builds(lambda k: Action(k, "hash"), st.sampled_from(KEYS)),
    ),
    min_size=1,
    max_size=5,
)


def py_apply(attrs: dict, actions: list[Action]) -> dict:
    """Pure-Python model of the ordered action semantics."""
    m = dict(attrs)
    for a in actions:
        if a.action == "delete":
            m.pop(a.key, None)
            continue
        if a.action == "hash":
            if a.key in m:
                m[a.key] = hashlib.sha1(m[a.key].encode()).hexdigest()
            continue
        if a.value is not None:
            val, found = str(a.value), True
        else:
            found = a.from_attribute in m
            val = m.get(a.from_attribute)
        if not found:
            continue
        if a.action == "insert" and a.key not in m:
            m[a.key] = val
        elif a.action == "update" and a.key in m:
            m[a.key] = val
        elif a.action == "upsert":
            m[a.key] = val
    return m


class TestActionParity:
    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(attr_maps, actions_strategy), min_size=1, max_size=12))
    def test_action_lists_match_python_model(self, spark, cases):
        rows = [(i, attrs) for i, (attrs, _) in enumerate(cases)]
        df = spark.createDataFrame(rows, "case_id int, attrs map<string,string>")
        # each case gets its own action list; build one select with a
        # CASE over case_id so all cases execute in one job
        out_col = F.col("attrs")
        for i, (_, actions) in enumerate(cases):
            out_col = F.when(
                F.col("case_id") == i, apply_actions_to_map(F.col("attrs"), actions)
            ).otherwise(out_col)
        got = {
            r["case_id"]: dict(r["out"])
            for r in df.select("case_id", out_col.alias("out")).collect()
        }
        for i, (attrs, actions) in enumerate(cases):
            assert got[i] == py_apply(attrs, actions), (attrs, [a.__dict__ for a in actions])


class TestExtractParity:
    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.sampled_from([
        "[info] planner: ok duration=12ms",
        "[error] critic: broke duration=999ms",
        "plain note, no structure",
        "",
        "[warn] router: x duration=notanumber",
    ]), min_size=1, max_size=8))
    def test_extract_matches_python_re(self, spark, texts):
        pattern = r"\[(?P<level>\w+)\] (?P<component>\w+): .* duration=(?P<ms>\d+)ms"
        action = Action("text", "extract", pattern=pattern)
        rows = [(i, {"text": t}) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "i int, attrs map<string,string>")
        got = {
            r["i"]: dict(r["out"])
            for r in df.select(
                "i", apply_actions_to_map(F.col("attrs"), [action]).alias("out")
            ).collect()
        }
        for i, t in enumerate(texts):
            expect = {"text": t}
            m = re.search(pattern, t)
            if m:
                expect.update({k: v for k, v in m.groupdict().items() if v is not None})
            assert got[i] == expect, t


class TestRouteConservation:
    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=2, max_value=30))
    def test_archive_gets_everything(self, spark, n_convs):
        from opentelemetry_collector_spark.datagen import make_transcripts_df
        from opentelemetry_collector_spark.plans.pipeline import (
            PipelineConfig, parse_stage, route_stage,
        )

        t = make_transcripts_df(spark, n_convs=n_convs, seed=n_convs)
        routed = route_stage(parse_stage(t, engine="jvm"), PipelineConfig().routes)
        n = t.count()
        assert routed["archive"].count() == n
        # errors ∪ complement partitions under the same predicate
        errs = routed["errors"].count()
        non_errs = (
            parse_stage(t, engine="jvm")
            .filter(~F.coalesce(F.col("level").isin("warn", "error"), F.lit(False)))
            .count()
        )
        assert errs + non_errs == n
