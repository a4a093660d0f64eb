"""Attributes processor — ordered attribute-map actions as pure
Catalyst map expressions.

Reference semantics (processor/processorhelper/attraction.go:130-283,
processor/attributesprocessor/attributes_log.go:43-88):

  * per record: skip when ``(include set && !include.Match) ||
    (exclude set && exclude.Match)``; otherwise run the ordered action
    list against the record's attribute map.
  * INSERT — set key only if absent; UPDATE — only if present;
    UPSERT — unconditional; value from a literal XOR ``from_attribute``
    (missing source attribute ⇒ no-op).
  * DELETE — remove key. HASH — replace value with hex SHA-1 of its
    typed byte encoding (hasher.go:41-72). EXTRACT — regex with named
    groups only over a string attribute; each named submatch upserted;
    no-match ⇒ no-op.

Attributes are carried as one ``map<string,string>`` column (canonical
stringification — the same canonicalization the reference's matchers
use, filtermatcher/attributematcher.go:116-129). Every action compiles
to built-in map expressions (``map_filter``/``map_concat``/
``transform_values``) so the whole action list stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import sha1_string
from ..functions.parse import extract_named_groups, matched_predicate, named_groups

_ACTIONS = {"insert", "update", "upsert", "delete", "hash", "extract"}


@dataclass
class Action:
    """One configured action (mirrors the reference's ActionKeyValue)."""

    key: str
    action: str
    value: Any = None
    from_attribute: str = ""
    pattern: str = ""

    def __post_init__(self) -> None:
        # Validation mirrors NewAttrProc (attraction.go:138-211).
        if not self.key:
            raise ValueError('missing required field "key"')
        self.action = self.action.lower()
        if self.action not in _ACTIONS:
            raise ValueError(f"unsupported action {self.action!r}")
        if self.action in ("insert", "update", "upsert"):
            if self.value is None and not self.from_attribute:
                raise ValueError(
                    'either field "value" or "from_attribute" must be specified'
                )
            if self.value is not None and self.from_attribute:
                raise ValueError('both "value" and "from_attribute" are set')
            if self.pattern:
                raise ValueError(f'action "{self.action}" does not use "pattern"')
        elif self.action in ("hash", "delete"):
            if self.value is not None or self.from_attribute or self.pattern:
                raise ValueError(
                    f'action "{self.action}" does not use "value", "pattern" or "from_attribute"'
                )
        elif self.action == "extract":
            if self.value is not None or self.from_attribute:
                raise ValueError('action "extract" does not use "value" or "from_attribute"')
            if not self.pattern:
                raise ValueError('missing required field "pattern" for action "extract"')
            named_groups(self.pattern)  # raises on no/unnamed groups


def _stringify_literal(value: Any) -> str:
    """Config literal → canonical string (filterhelper.go:27-40 +
    attributematcher.go:116-129 stringification)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        # Go strconv.FormatFloat(f, 'f', -1, 64): shortest decimal, no exponent.
        s = repr(value)
        if "e" in s or "E" in s:
            from decimal import Decimal

            s = format(Decimal(s), "f")
        return s
    return str(value)


def _set_key(m: Column, key: str, value: Column) -> Column:
    """Upsert one key into a map column (remove-then-concat avoids
    duplicate-key errors under the default EXCEPTION dedup policy)."""
    cleaned = F.map_filter(m, lambda k, _v: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value))


def _source_value(m: Column, action: Action) -> tuple[Column, Column]:
    """(value column, found predicate) per getSourceAttributeValue."""
    if action.value is not None:
        return F.lit(_stringify_literal(action.value)), F.lit(True)
    src = F.element_at(m, action.from_attribute)
    return src, F.map_contains_key(m, F.lit(action.from_attribute))


def _apply_one(m: Column, action: Action) -> Column:
    key = action.key
    has_key = F.map_contains_key(m, F.lit(key))
    if action.action == "delete":
        return F.map_filter(m, lambda k, _v: k != F.lit(key))
    if action.action == "insert":
        val, found = _source_value(m, action)
        return F.when(found & ~has_key, _set_key(m, key, val)).otherwise(m)
    if action.action == "update":
        val, found = _source_value(m, action)
        return F.when(
            found & has_key,
            F.transform_values(m, lambda k, v: F.when(k == F.lit(key), val).otherwise(v)),
        ).otherwise(m)
    if action.action == "upsert":
        val, found = _source_value(m, action)
        return F.when(found, _set_key(m, key, val)).otherwise(m)
    if action.action == "hash":
        return F.transform_values(
            m, lambda k, v: F.when(k == F.lit(key), sha1_string(v)).otherwise(v)
        )
    if action.action == "extract":
        src = F.element_at(m, key)
        matched = F.map_contains_key(m, F.lit(key)) & matched_predicate(src, action.pattern)
        groups = extract_named_groups(src, action.pattern)
        out = m
        for name, col in groups.items():
            out = _set_key(out, name, col)
        return F.when(matched, out).otherwise(m)
    raise AssertionError(action.action)


def apply_actions_to_map(m: Column, actions: list[Action]) -> Column:
    """Compose the ordered action list into one map expression."""
    out = m
    for action in actions:
        out = _apply_one(out, action)
    return out


@dataclass
class AttributesProcessor:
    """The attributes processor stage: include/exclude gate + actions.

    ``include`` / ``exclude`` are predicate builders (df → Column), as
    produced by operators.filters; gating follows attributes_log.go:72-88.
    """

    actions: list[Action]
    include: Any = None  # Callable[[DataFrame], Column] | None
    exclude: Any = None
    attrs_col: str = "attrs"

    def __call__(self, df: DataFrame) -> DataFrame:
        m = F.col(self.attrs_col)
        transformed = apply_actions_to_map(m, self.actions)
        from .filters import include_exclude_keep

        process = include_exclude_keep(
            df,
            self.include(df) if self.include else None,
            self.exclude(df) if self.exclude else None,
        )
        return df.withColumn(
            self.attrs_col, F.when(process, transformed).otherwise(m)
        )
