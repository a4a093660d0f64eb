"""Matcher / filter stack → boolean Column predicates.

Reference semantics:
  * filterset strict — exact string set membership
    (internal/processor/filterset/strict/strictfilterset.go:37-40).
  * filterset regexp — ANY pattern matches; Go MatchString is
    *unanchored substring* search (regexp/regexpfilterset.go:56-76);
    Spark ``rlike`` has the same substring semantics.
  * attribute matcher — ALL configured keys must exist; an empty
    attribute map never matches a non-empty matcher list; a condition
    with no value is an existence check; with a value it compares the
    canonically-stringified attribute (strict) or regex-matches it
    (internal/processor/filtermatcher/attributematcher.go:59-129).
  * properties matcher — conjunction of record-name filterset,
    resource-attribute conditions and record-attribute conditions
    (filtermatcher/filtermatcher.go:88-103, filterlog/filterlog.go:78-84).
  * include/exclude — skip record iff (include set && !include.Match)
    || (exclude set && exclude.Match); include evaluated first
    (attributes_log.go:72-88, filterconfig/config.go:26-46).

All predicates are pure Catalyst boolean expressions (``isin`` /
``rlike`` / ``map_contains_key``), so they push down and codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .attributes import _stringify_literal


def filterset_predicate(col: Column, values: list[str], match_type: str) -> Column:
    """strict → hash-set membership; regexp → OR of unanchored rlike."""
    if not values:
        return F.lit(True)
    if match_type == "strict":
        return col.isin(values)
    if match_type == "regexp":
        pred = col.rlike(values[0])
        for pattern in values[1:]:
            pred = pred | col.rlike(pattern)
        return pred
    raise ValueError(f"unrecognized match_type {match_type!r}")


@dataclass
class AttributeCondition:
    """One key[/value] condition; value=None ⇒ existence-only check."""

    key: str
    value: Any = None


def attributes_predicate(
    m: Column, conditions: list[AttributeCondition], match_type: str
) -> Column:
    """Conjunction over an attribute-map column (attributematcher.go:83-114).

    NULL-safe: a NULL map behaves as empty (never matches a non-empty
    condition list)."""
    if not conditions:
        return F.lit(True)
    m = F.coalesce(m, F.create_map().cast("map<string,string>"))
    pred = F.lit(True)
    for cond in conditions:
        exists = F.map_contains_key(m, F.lit(cond.key))
        if cond.value is None:
            pred = pred & exists
        else:
            attr = F.element_at(m, cond.key)
            if match_type == "strict":
                pred = pred & exists & (attr == F.lit(_stringify_literal(cond.value)))
            elif match_type == "regexp":
                if not isinstance(cond.value, str):
                    raise ValueError(
                        "regexp matching only supports string-typed patterns"
                    )
                pred = pred & exists & attr.rlike(cond.value)
            else:
                raise ValueError(f"unrecognized match_type {match_type!r}")
    return pred


@dataclass
class MatchProperties:
    """Mirror of filterconfig.MatchProperties for logs/records.

    Validation per filterconfig/config.go:124-134: at least one of
    log_names / attributes / resources must be set.
    """

    match_type: str  # "strict" | "regexp"
    log_names: list[str] = field(default_factory=list)
    attributes: list[AttributeCondition] = field(default_factory=list)
    resources: list[AttributeCondition] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.match_type not in ("strict", "regexp"):
            raise ValueError(f"unrecognized match_type {self.match_type!r}")
        if not (self.log_names or self.attributes or self.resources):
            raise ValueError(
                "at least one of log_names, attributes or resources must be specified"
            )


def properties_predicate(
    df: DataFrame,
    props: MatchProperties,
    name_col: str = "name",
    attrs_col: str = "attrs",
    resource_col: str = "resource",
) -> Column:
    """Compile MatchProperties to one boolean Column over df."""
    pred = F.lit(True)
    if props.log_names:
        pred = pred & filterset_predicate(
            F.col(name_col), props.log_names, props.match_type
        )
    if props.resources:
        pred = pred & attributes_predicate(
            F.col(resource_col), props.resources, props.match_type
        )
    if props.attributes:
        pred = pred & attributes_predicate(
            F.col(attrs_col), props.attributes, props.match_type
        )
    return pred


def include_exclude_keep(
    df: DataFrame, include: Column | None, exclude: Column | None
) -> Column:
    """keep = (include.Match if include) && !(exclude.Match if exclude)."""
    keep = F.lit(True)
    if include is not None:
        keep = keep & include
    if exclude is not None:
        keep = keep & ~exclude
    return keep


def matcher(props: MatchProperties, **cols):
    """Convenience: MatchProperties → predicate builder (df → Column)."""

    def build(df: DataFrame) -> Column:
        return properties_predicate(df, props, **cols)

    return build
