"""Span processor (name ↔ attributes) and resource processor.

Reference semantics:
  * rename from_attributes (processor/spanprocessor/span.go:105-156):
    span.name := the values of N configured attribute keys joined with
    a separator, in config order; if ANY key is missing the rename is
    aborted for that record (all-or-nothing).
  * rename to_attributes (span.go:158-221): ordered rules, each a
    regex with named groups run against span.name; every named
    submatch is upserted as an attribute and the matched submatch text
    inside the name is replaced with the ``{group}`` placeholder;
    ``break_after_match`` stops at the first matching rule.
  * resource processor (processor/resourceprocessor/
    resource_processor.go:29-61): the same ordered attribute actions
    applied to the batch-level resource map — here a per-conversation
    map column — starting from an empty map when none exists
    (resource_processor.go:44-46).

In our transcript model span.name ≅ a name/text string column and the
span attribute map ≅ the ``attrs`` map column.

The to_attributes placeholder rewrite is index-based in Go (rebuild
the name from submatch offsets). That is not expressible with
``regexp_replace`` alone for multi-group patterns, so it runs as an
Arrow-batched pandas UDF with the regex compiled once per executor —
the same slow-path policy as the parse layer (SURVEY.md §4: RE2-parity
paths go through pandas UDFs; everything else stays JVM-side).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.parse import named_groups, _to_python_dialect
from .attributes import Action, apply_actions_to_map, _set_key


# ---------------------------------------------------------------------------
# rename: from_attributes
# ---------------------------------------------------------------------------

def rename_from_attributes(
    df: DataFrame,
    keys: list[str],
    separator: str = "",
    name_col: str = "name",
    attrs_col: str = "attrs",
) -> DataFrame:
    """name := join(attrs[k] for k in keys, separator); abort (keep the
    old name) unless EVERY key is present (span.go:136-149)."""
    if not keys:
        raise ValueError("from_attributes requires at least one key")
    m = F.col(attrs_col)
    all_present = F.lit(True)
    for k in keys:
        all_present = all_present & F.map_contains_key(m, F.lit(k))
    new_name = F.concat_ws(separator, *[F.element_at(m, k) for k in keys])
    return df.withColumn(
        name_col, F.when(all_present, new_name).otherwise(F.col(name_col))
    )


# ---------------------------------------------------------------------------
# rename: to_attributes
# ---------------------------------------------------------------------------

@dataclass
class ToAttributesRule:
    pattern: str
    groups: list[str] = field(init=False)

    def __post_init__(self) -> None:
        self.groups = named_groups(self.pattern)  # validates: named groups only


def _placeholder_udf(pattern: str):
    """name → struct(new_name, matched, g_<name>... submatch values).

    Reproduces span.go:175-211: on match, each named submatch value is
    captured and the submatch's span inside the name is replaced by
    ``{group}``, rebuilding from match offsets right-to-left so earlier
    offsets stay valid."""
    py_pattern = _to_python_dialect(pattern)
    groups = named_groups(pattern)
    schema = T.StructType(
        [T.StructField("new_name", T.StringType()), T.StructField("matched", T.BooleanType())]
        + [T.StructField(f"g_{g}", T.StringType()) for g in groups]
    )

    @F.pandas_udf(schema)
    def f(names: pd.Series) -> pd.DataFrame:
        rx = re.compile(py_pattern)
        out = {"new_name": [], "matched": []}
        for g in groups:
            out[f"g_{g}"] = []
        for name in names:
            m = rx.search(name) if name is not None else None
            if not m:
                out["new_name"].append(name)
                out["matched"].append(False)
                for g in groups:
                    out[f"g_{g}"].append(None)
                continue
            # rebuild right-to-left from submatch offsets
            new_name = name
            spans = [(g, m.span(g)) for g in groups if m.span(g) != (-1, -1)]
            for g, (s, e) in sorted(spans, key=lambda x: -x[1][0]):
                new_name = new_name[:s] + "{" + g + "}" + new_name[e:]
            out["new_name"].append(new_name)
            out["matched"].append(True)
            for g in groups:
                out[f"g_{g}"].append(m.group(g))
        return pd.DataFrame(out)

    return f


def rename_to_attributes(
    df: DataFrame,
    rules: list[ToAttributesRule | str],
    break_after_match: bool = False,
    name_col: str = "name",
    attrs_col: str = "attrs",
) -> DataFrame:
    """Apply the ordered to_attributes rules (span.go:158-221)."""
    rules = [r if isinstance(r, ToAttributesRule) else ToAttributesRule(r) for r in rules]
    out = df
    # `_active` models break_after_match: once a rule matches, later
    # rules see active=false and leave the record untouched.
    out = out.withColumn("_active", F.lit(True))
    for i, rule in enumerate(rules):
        res_col = f"_r{i}"
        out = out.withColumn(res_col, _placeholder_udf(rule.pattern)(F.col(name_col)))
        hit = F.col("_active") & F.col(f"{res_col}.matched")
        new_attrs = F.col(attrs_col)
        for g in rule.groups:
            new_attrs = F.when(
                F.col(f"{res_col}.g_{g}").isNotNull(),
                _set_key(new_attrs, g, F.col(f"{res_col}.g_{g}")),
            ).otherwise(new_attrs)
        out = (
            out.withColumn(attrs_col, F.when(hit, new_attrs).otherwise(F.col(attrs_col)))
            .withColumn(
                name_col,
                F.when(hit, F.col(f"{res_col}.new_name")).otherwise(F.col(name_col)),
            )
        )
        if break_after_match:
            out = out.withColumn("_active", F.col("_active") & ~F.col(f"{res_col}.matched"))
        out = out.drop(res_col)
    return out.drop("_active")


# ---------------------------------------------------------------------------
# resource processor
# ---------------------------------------------------------------------------

@dataclass
class ResourceProcessor:
    """Ordered attribute actions over the resource (conversation-level)
    map column; a NULL resource initializes to an empty map first
    (resource_processor.go:44-46). No include/exclude gate — the
    reference's resource processor applies unconditionally."""

    actions: list[Action]
    attrs_col: str = "resource_attrs"

    def __call__(self, df: DataFrame) -> DataFrame:
        empty = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
        m = F.coalesce(F.col(self.attrs_col), empty)
        return df.withColumn(self.attrs_col, apply_actions_to_map(m, self.actions))
