"""Matcher-stack tests — port of internal/processor/filtermatcher/
filtermatcher_test.go, filterlog_test.go and the filterset tests."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.filters import (
    AttributeCondition,
    MatchProperties,
    attributes_predicate,
    filterset_predicate,
    include_exclude_keep,
    properties_predicate,
)

from conftest import attrs_df


def eval_attr_pred(spark, rows, conditions, match_type):
    df = attrs_df(spark, rows)
    return [
        r["m"]
        for r in df.select(
            attributes_predicate(F.col("attrs"), conditions, match_type).alias("m")
        ).collect()
    ]


class TestFilterSet:
    def test_strict_membership(self, spark):
        df = spark.createDataFrame([("a",), ("b",), ("c",), (None,)], "v string")
        got = [
            r["m"]
            for r in df.select(
                filterset_predicate(F.col("v"), ["a", "c"], "strict").alias("m")
            ).collect()
        ]
        assert got == [True, False, True, None]

    def test_regexp_any_unanchored(self, spark):
        # Go MatchString = substring search (regexpfilterset.go:56-76)
        df = spark.createDataFrame(
            [("prefix_test_match",), ("test_match_sufix",), ("no",)], "v string"
        )
        got = [
            r["m"]
            for r in df.select(
                filterset_predicate(F.col("v"), ["test_match", "^never$"], "regexp").alias("m")
            ).collect()
        ]
        assert got == [True, True, False]

    def test_empty_values_matches_all(self, spark):
        df = spark.createDataFrame([("x",)], "v string")
        assert df.select(filterset_predicate(F.col("v"), [], "strict")).first()[0] is True

    def test_bad_match_type(self, spark):
        with pytest.raises(ValueError):
            filterset_predicate(F.lit("x"), ["a"], "fuzzy")


class TestAttributeMatcher:
    """attributematcher.go:59-129 semantics."""

    def test_all_keys_must_exist(self, spark):
        conds = [AttributeCondition("keyOne"), AttributeCondition("keyTwo")]
        got = eval_attr_pred(
            spark,
            [{"keyOne": "a", "keyTwo": "b"}, {"keyOne": "a"}, {}],
            conds,
            "strict",
        )
        assert got == [True, False, False]

    def test_existence_only_when_no_value(self, spark):
        got = eval_attr_pred(
            spark,
            [{"k": "anything"}, {"other": "x"}],
            [AttributeCondition("k")],
            "strict",
        )
        assert got == [True, False]

    def test_strict_value_equality_stringified(self, spark):
        # typed config values compare against canonical stringification
        got = eval_attr_pred(
            spark,
            [{"i": "123", "d": "0.1", "b": "true"}],
            [
                AttributeCondition("i", 123),
                AttributeCondition("d", 0.1),
                AttributeCondition("b", True),
            ],
            "strict",
        )
        assert got == [True]

    def test_regexp_value_substring(self, spark):
        got = eval_attr_pred(
            spark,
            [{"svc": "auth-service"}, {"svc": "web"}],
            [AttributeCondition("svc", "auth")],
            "regexp",
        )
        assert got == [True, False]

    def test_regexp_rejects_non_string_pattern(self, spark):
        with pytest.raises(ValueError, match="string-typed"):
            eval_attr_pred(spark, [{"k": "1"}], [AttributeCondition("k", 1)], "regexp")

    def test_empty_map_never_matches_nonempty_list(self, spark):
        got = eval_attr_pred(spark, [{}], [AttributeCondition("k", "v")], "strict")
        assert got == [False]

    def test_null_map_never_matches(self, spark):
        df = spark.createDataFrame([(None,)], "attrs map<string,string>")
        got = df.select(
            attributes_predicate(
                F.col("attrs"), [AttributeCondition("k")], "strict"
            ).alias("m")
        ).first()["m"]
        assert got is False


class TestMatchProperties:
    def test_validation_requires_a_criterion(self):
        with pytest.raises(ValueError):
            MatchProperties("strict")
        with pytest.raises(ValueError):
            MatchProperties("fuzzy", log_names=["x"])

    def test_log_names_and_attributes_conjunction(self, spark):
        df = spark.createDataFrame(
            [
                ("app/login", {"env": "prod"}),
                ("app/login", {"env": "dev"}),
                ("health", {"env": "prod"}),
            ],
            "name string, attrs map<string,string>",
        )
        props = MatchProperties(
            "strict", log_names=["app/login"], attributes=[AttributeCondition("env", "prod")]
        )
        got = [r[0] for r in df.select(properties_predicate(df, props)).collect()]
        assert got == [True, False, False]

    def test_resource_attributes(self, spark):
        df = spark.createDataFrame(
            [({"service.name": "auth"}, {}), ({"service.name": "web"}, {})],
            "resource map<string,string>, attrs map<string,string>",
        )
        props = MatchProperties(
            "regexp", resources=[AttributeCondition("service.name", "^auth$")]
        )
        got = [r[0] for r in df.select(properties_predicate(df, props)).collect()]
        assert got == [True, False]


class TestIncludeExclude:
    """The four include/exclude presence combinations
    (filterspan.go:90-106, filterconfig/config.go:26-46)."""

    def _keep(self, spark, include, exclude):
        df = spark.createDataFrame([(1,)], "x int")
        inc = None if include is None else F.lit(include)
        exc = None if exclude is None else F.lit(exclude)
        return df.select(include_exclude_keep(df, inc, exc)).first()[0]

    @pytest.mark.parametrize(
        "include,exclude,expected",
        [
            (None, None, True),
            (True, None, True),
            (False, None, False),
            (None, True, False),
            (None, False, True),
            (True, True, False),   # include matches but exclude wins
            (True, False, True),
            (False, False, False),
        ],
    )
    def test_truth_table(self, spark, include, exclude, expected):
        assert self._keep(spark, include, exclude) is expected
