"""Vectorized grok/EXTRACT parse primitives.

Reference semantics: the EXTRACT action runs a regex with *named groups
only* against a string attribute and upserts each named submatch as a
new attribute; no match / non-string source ⇒ no-op
(processor/processorhelper/attraction.go:180-203,263-283). The fluentd
receiver's record-parse stage is the same shape: one raw text field →
structured attributes (receiver/fluentforwardreceiver/conversion.go:84-180).

Two execution paths:
  * JVM path (default, whole-stage codegen): one ``regexp_extract`` per
    named group. Catalyst folds the pattern; Java regex dialect.
  * Arrow path (RE2/Python-dialect parity): ``pd.Series.str.extract``
    in a pandas UDF returning a struct — one pass per batch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NAMED_GROUP = re.compile(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>")


def named_groups(pattern: str) -> list[str]:
    """Named capture groups in order; validates the reference's EXTRACT
    config rules (≥1 group, all groups named — attraction.go:188-203)."""
    compiled = re.compile(_to_python_dialect(pattern))
    if compiled.groups < 1:
        raise ValueError(f"pattern contains no capture groups: {pattern}")
    index_by_name = compiled.groupindex  # name → 1-based index
    if len(index_by_name) != compiled.groups:
        raise ValueError(f"pattern contains at least one unnamed group: {pattern}")
    ordered = sorted(index_by_name.items(), key=lambda kv: kv[1])
    return [name for name, _ in ordered]


def _to_python_dialect(pattern: str) -> str:
    """Accept Go/RE2 ``(?P<name>…)`` and Java ``(?<name>…)`` spellings."""
    return re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", pattern)


def _to_java_dialect(pattern: str) -> str:
    """Strip group names → positional groups. Java rejects '_' in group
    names, and regexp_extract addresses groups by index anyway."""
    return re.sub(r"\(\?P?<[A-Za-z][A-Za-z0-9_]*>", "(", pattern)


def extract_named_groups(col: Column, pattern: str) -> dict[str, Column]:
    """JVM path: {group_name: regexp_extract column}. Non-matching rows
    yield empty string per Spark's regexp_extract; callers that need the
    reference's no-op-on-no-match use ``when(matched, …)`` with
    ``matched_predicate``."""
    names = named_groups(pattern)
    jpat = _to_java_dialect(pattern)
    return {name: F.regexp_extract(col, jpat, i + 1) for i, name in enumerate(names)}


def matched_predicate(col: Column, pattern: str) -> Column:
    """True iff the unanchored pattern matches (Go MatchString semantics:
    substring search, cf. regexp/regexpfilterset.go:56-76)."""
    return col.rlike(_to_java_dialect(pattern))


def extract_struct(col: Column, pattern: str) -> Column:
    """JVM path packaged as one struct column; fields NULL when the row
    does not match (EXTRACT no-op semantics preserved downstream)."""
    names = named_groups(pattern)
    groups = extract_named_groups(col, pattern)
    matched = matched_predicate(col, pattern)
    return F.struct(
        *[F.when(matched, groups[name]).otherwise(F.lit(None)).alias(name) for name in names]
    )


def extract_pandas_udf(pattern: str):
    """Arrow path: pandas UDF text → struct<groups…:string>, using the
    Python `re` dialect (closest public stand-in for RE2 parity).
    One ``Series.str.extract`` per Arrow batch — no per-row Python."""
    names = named_groups(pattern)
    ppat = _to_python_dialect(pattern)
    out_type = T.StructType([T.StructField(n, T.StringType()) for n in names])

    @F.pandas_udf(out_type)
    def extract(s: pd.Series) -> pd.DataFrame:
        df = s.astype("string").str.extract(ppat, expand=True)
        df.columns = names
        return df.astype(object).where(pd.notna(df), None)

    return extract
