"""Declarative pipeline config → compiled DataFrame chain: the analog
of the reference's YAML service config (config/config.go:127-310)
compiled by the pipeline builder (service/builder/
pipelines_builder.go:120-203) into a linked consumer chain.

A spec is a plain dict (YAML-loadable):

    {
      "receivers": {"transcripts": {"type": "table"}},
      "processors": [
        {"type": "attributes", "actions": [
            {"key": "level", "action": "upsert", "value": "info"}]},
        {"type": "filter", "include": {"match_type": "strict",
                                       "attributes": [{"key": "role", "value": "tool"}]}},
        {"type": "probabilistic_sampler", "sampling_percentage": 15.0},
        {"type": "span_to_attributes", "rules": ["..."], "break_after_match": true},
      ],
      "exporters": {"errors": {"include_levels": ["warn", "error"]},
                    "archive": {}},
    }

Processors apply IN DECLARED ORDER (the reference builds the chain
back-to-front so data flows in config order, pipelines_builder.go:
124-136); unknown types are config-time errors, matching the factory
registry lookup failure (service/defaultcomponents/). Each compiled
stage is a pure DataFrame→DataFrame function, so the whole chain
stays one Catalyst plan."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

StageFn = Callable[[DataFrame], DataFrame]


def _build_attributes(params: dict) -> StageFn:
    from ..operators.attributes import Action, AttributesProcessor

    actions = [Action(**a) for a in params.get("actions", [])]
    include = _match_builder(params.get("include"))
    exclude = _match_builder(params.get("exclude"))
    return AttributesProcessor(
        actions, include=include, exclude=exclude,
        attrs_col=params.get("attrs_col", "attrs"),
    )


def _match_builder(spec: dict | None):
    if not spec:
        return None
    from ..operators.filters import AttributeCondition, MatchProperties, matcher

    props = MatchProperties(
        spec.get("match_type", "strict"),
        attributes=[
            AttributeCondition(a["key"], a.get("value"))
            for a in spec.get("attributes", [])
        ],
        resources=[
            AttributeCondition(a["key"], a.get("value"))
            for a in spec.get("resources", [])
        ],
        log_names=spec.get("log_names", []),
    )
    return matcher(props)


def _build_filter(params: dict) -> StageFn:
    from ..operators.filters import include_exclude_keep

    include = _match_builder(params.get("include"))
    exclude = _match_builder(params.get("exclude"))

    def stage(df: DataFrame) -> DataFrame:
        keep = include_exclude_keep(
            df,
            include(df) if include else None,
            exclude(df) if exclude else None,
        )
        return df.filter(keep)

    return stage


def _build_sampler(params: dict) -> StageFn:
    from ..operators.sampler import ProbabilisticSampler

    return ProbabilisticSampler(
        float(params["sampling_percentage"]),
        hash_seed=int(params.get("hash_seed", 0)),
        id_col=params.get("id_col", "conv_id"),
    )


def _build_span_to_attributes(params: dict) -> StageFn:
    from ..operators.span import rename_to_attributes

    def stage(df: DataFrame) -> DataFrame:
        return rename_to_attributes(
            df,
            params["rules"],
            break_after_match=params.get("break_after_match", False),
            name_col=params.get("name_col", "text"),
            attrs_col=params.get("attrs_col", "attrs"),
        )

    return stage


def _build_span_from_attributes(params: dict) -> StageFn:
    from ..operators.span import rename_from_attributes

    def stage(df: DataFrame) -> DataFrame:
        return rename_from_attributes(
            df,
            params["keys"],
            separator=params.get("separator", ""),
            name_col=params.get("name_col", "text"),
            attrs_col=params.get("attrs_col", "attrs"),
        )

    return stage


def _build_resource(params: dict) -> StageFn:
    from ..operators.attributes import Action
    from ..operators.span import ResourceProcessor

    return ResourceProcessor(
        [Action(**a) for a in params.get("actions", [])],
        attrs_col=params.get("attrs_col", "resource_attrs"),
    )


_PROCESSOR_FACTORIES: dict[str, Callable[[dict], StageFn]] = {
    "attributes": _build_attributes,
    "filter": _build_filter,
    "probabilistic_sampler": _build_sampler,
    "span_to_attributes": _build_span_to_attributes,
    "span_from_attributes": _build_span_from_attributes,
    "resource": _build_resource,
}


def build_processor(spec: dict) -> StageFn:
    """One processor spec → stage function; unknown type is a config
    error (the factory-registry miss, config/config.go:191)."""
    kind = spec.get("type")
    if kind not in _PROCESSOR_FACTORIES:
        raise ValueError(
            f"unknown processor type {kind!r}; available: {sorted(_PROCESSOR_FACTORIES)}"
        )
    params = {k: v for k, v in spec.items() if k != "type"}
    return _PROCESSOR_FACTORIES[kind](params)


def build_pipeline_chain(processors: list[dict]) -> StageFn:
    """Ordered processor list → one composed stage."""
    stages = [build_processor(p) for p in processors]

    def chain(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return chain


def compile_spec(spec: dict):
    """Full spec → (chain, routes). Exporter entries become RouteRule
    sinks: optional ``include_levels`` (strict level set) narrows a
    sink; an empty spec is catch-all (the archive shape)."""
    from .pipeline import RouteRule

    chain = build_pipeline_chain(spec.get("processors", []))
    routes = []
    for sink, params in spec.get("exporters", {}).items():
        levels = params.get("include_levels")
        include = (
            (lambda lv: (lambda df: F.col("level").isin(*lv)))(levels) if levels else None
        )
        routes.append(RouteRule(sink, include=include))
    if not routes:
        raise ValueError("config needs at least one exporter")
    return chain, routes
