"""Expression-language filter: the filter processor's ``expr`` match
type (internal/processor/filterexpr/matcher.go:29-62), which evaluates
a boolean expression over the env {MetricName, HasLabel(key),
Label(key)} per datapoint; a metric matches when ANY of its datapoints
matches (matcher.go:148-164).

The expression compiles to a Catalyst predicate via a whitelist
tokenizer → SQL translation (F.expr) — the Spark analog of the
reference compiling user expressions to its own VM
(filterexpr/matcher.go:36-42). Unknown identifiers/functions are
config errors, mirroring compile-time failure.

Supported surface (the subset the reference's tests exercise):
  MetricName, Label("k"), HasLabel("k"), string/number literals,
  == != < <= > >=, && || !, and/or/not, matches (regex, unanchored —
  Go RE2 MatchString semantics, like filterset regexp §2.4), ( ).

Env parity notes (matcher.go createEnv):
  * ``Label(k)`` for a missing label evaluates to "" (the Go map
    zero value), NOT NULL — compiled as coalesce(labels[k], '') so
    ``Label("code") != "500"`` matches label-less datapoints exactly
    like the reference.
  * ``matches`` executes as Java regex (RLIKE). RE2 and Java agree on
    the whitelisted subset; Java-only constructs RE2 rejects
    (backreferences, lookaround, atomic groups, possessive
    quantifiers) are rejected at compile time as config errors so a
    pattern can't silently change meaning between engines.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TOKEN = re.compile(
    r"""\s*(?:
      (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<number>\d+(?:\.\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>==|!=|<=|>=|&&|\|\||[!<>(),])
    )""",
    re.VERBOSE,
)

_IDENT_SQL = {
    "and": "AND", "or": "OR", "not": "NOT",
    "true": "TRUE", "false": "FALSE", "nil": "NULL",
}

# Java-regex-only constructs that Go RE2 rejects: lookaround / atomic
# groups `(?=` `(?!` `(?<=` `(?<!` `(?>`, backreferences `\1`..`\9`,
# and possessive quantifiers `*+` `++` `?+` `{n}+` / `{n,m}+`.
# Scanned AFTER collapsing escape pairs, so a literal `\\` can neither
# hide a real construct behind a naive lookbehind nor mask one, and a
# bare `}` (a literal in both dialects, e.g. "x}+") is only treated as
# a quantifier close when a `{n[,m]}` brace form precedes the `+`.
_NON_RE2_STRIPPED = re.compile(r"\(\?[=!<>]|[*+?]\+|\{\d+(?:,\d*)?\}\+")


def _validate_re2_subset(pattern: str) -> None:
    # escape pairs first: \1..\9 are Java backreferences (RE2 has none)
    for m in re.finditer(r"\\(.)", pattern):
        if m.group(1) in "123456789":
            raise ValueError(
                f"pattern {pattern!r} uses a backreference — outside "
                "the RE2 subset"
            )
    # collapse every escape pair to an inert placeholder, then scan
    # for the remaining Java-only constructs on true (unescaped) text
    stripped = re.sub(r"\\.", "\x00", pattern)
    if _NON_RE2_STRIPPED.search(stripped):
        raise ValueError(
            f"pattern {pattern!r} uses Java-only regex constructs "
            "(lookaround/possessive) outside the RE2 subset"
        )


def compile_expr(
    expression: str, name_col: str = "name", labels_col: str = "labels"
) -> Column:
    """expr string → Column predicate (raises ValueError on anything
    outside the whitelist)."""
    pos, out, toks = 0, [], []
    while pos < len(expression):
        m = _TOKEN.match(expression, pos)
        if not m or m.end() == pos:
            if expression[pos:].strip():
                raise ValueError(f"unparseable expr at: {expression[pos:]!r}")
            break
        pos = m.end()
        toks.append(m)

    def _unquote(raw: str) -> str:
        # expr-language escapes: only \" \' \\ are escape sequences;
        # every other backslash (e.g. regex \d) passes through verbatim
        body = raw[1:-1]
        quote = raw[0]
        return body.replace("\\" + quote, quote).replace("\\\\", "\\")

    def _sql_str(value: str) -> str:
        # re-escape for the Spark SQL literal (its parser also treats
        # backslash as an escape character)
        return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"

    i = 0
    while i < len(toks):
        m = toks[i]
        if m.group("string"):
            out.append(_sql_str(_unquote(m.group("string"))))
        elif m.group("number"):
            out.append(m.group("number"))
        elif m.group("ident"):
            ident = m.group("ident")
            if ident == "MetricName":
                out.append(f"`{name_col}`")
            elif ident in ("Label", "HasLabel"):
                # expect ( "key" )
                if (
                    i + 3 >= len(toks)
                    or toks[i + 1].group("op") != "("
                    or not toks[i + 2].group("string")
                    or toks[i + 3].group("op") != ")"
                ):
                    raise ValueError(f'{ident} requires a ("key") argument')
                key = _sql_str(_unquote(toks[i + 2].group("string")))
                if ident == "Label":
                    # Go env: missing label reads as the map zero value ""
                    out.append(f"coalesce(`{labels_col}`[{key}], '')")
                else:
                    out.append(f"map_contains_key(`{labels_col}`, {key})")
                i += 3
            elif ident == "matches":
                # unanchored, Go MatchString semantics; RE2 has no
                # backreferences/lookaround — reject them up front so a
                # Java-only pattern is a config error, not a silent
                # semantic divergence
                if i + 1 < len(toks) and toks[i + 1].group("string"):
                    _validate_re2_subset(_unquote(toks[i + 1].group("string")))
                out.append("RLIKE")
            elif ident.lower() in _IDENT_SQL:
                out.append(_IDENT_SQL[ident.lower()])
            else:
                raise ValueError(f"unknown identifier {ident!r} in expr")
        else:
            op = m.group("op")
            out.append(
                {"==": "=", "&&": "AND", "||": "OR", "!": "NOT"}.get(op, op)
            )
        i += 1
    if not out:
        raise ValueError("empty expression")
    return F.expr(" ".join(out))


def filter_metrics_expr(
    df: DataFrame,
    expression: str,
    action: str = "include",
    name_col: str = "name",
    labels_col: str = "labels",
) -> DataFrame:
    """Keep (include) / drop (exclude) whole metrics by expression:
    a metric matches when ANY of its datapoint rows matches
    (matcher.go:148-164), so the per-row predicate is OR-ed across the
    metric's rows with a window max — no row of a matching metric is
    lost, order preserved (filter_processor.go:90-113)."""
    if action not in ("include", "exclude"):
        raise ValueError(f"unknown action {action!r}")
    pred = compile_expr(expression, name_col, labels_col)
    any_match = (
        F.max(F.coalesce(pred, F.lit(False)).cast("int"))
        .over(Window.partitionBy(name_col))
        == 1
    )
    tagged = df.withColumn("_any_match", any_match)
    keep = F.col("_any_match") if action == "include" else ~F.col("_any_match")
    return tagged.filter(keep).drop("_any_match")
