"""Intra-document repetition metrics — the Gopher repetition filters.

Pretraining corpora drop documents whose content repeats itself:
duplicated lines/paragraphs (boilerplate, agent loops) and excessive
n-gram repetition (keyboard mash, templated spam). This implements the
repetition signals popularized by Rae et al. 2021 (Gopher, Table A1)
and carried by the public curation stacks (RedPajama-Data, Dolma,
NeMo-Curator), as one Arrow-batched pass per document:

- ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines /
  paragraphs that are repeats of an earlier one,
- ``dup_line_char_frac`` / ``dup_para_char_frac`` — fraction of
  line/paragraph characters belonging to those repeats,
- ``top_{2,3,4}gram_char_frac`` — characters claimed by the single
  most repeated word n-gram,
- ``dup_{5..10}gram_char_frac`` — characters claimed by word n-grams
  occurring more than once (ALL their occurrences, per Gopher).

Scale shape: every metric is a pure function of one document — the
operator is a ``pandas_udf`` (Arrow batches, linear hash counting per
document, no shuffle, no driver data). At 100 TB this parallelizes
embarrassingly and composes with the other per-doc curation signals
(`text.quality_score`, `text.lang_id`) in a single scan.

Determinism contract (what makes the DuckDB oracle hash-match): every
numerator and denominator is an exact int64 (character counts), so
the only floating-point op is one final division — identical IEEE
result in any engine, rounded identically by the caller.

Definitions are pinned so an external engine can reproduce them:
lines = '\\n'-split, stripped of [ \\t\\r], empties dropped;
paragraphs = '\\n\\n'-split, stripped of whitespace, empties dropped;
tokens = whitespace-run split of the stripped text; an n-gram's
character length is ``len(' '.join(window))``; the denominator for
n-gram metrics is ``len(' '.join(tokens))``. Overlapping occurrences
are each counted (Gopher does not de-overlap), so pathological texts
("a a a a") can exceed 1.0 — thresholds sit far below that.

Reference parity note: the reference collector has no corpus-quality
operator (its dedup story ends at processor/batch); this module is
part of the training-data extension family (SURVEY.md north-star
table), like trainingdata/dedup.py and trainingdata/components.py.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "TOP_NGRAM_NS",
    "DUP_NGRAM_NS",
    "GOPHER_THRESHOLDS",
    "repetition_metrics_py",
    "repetition_metrics_np",
    "repetition_metrics",
    "gopher_repetition_filter",
]

TOP_NGRAM_NS = (2, 3, 4)
DUP_NGRAM_NS = (5, 6, 7, 8, 9, 10)

_LINE_STRIP = " \t\r"
_PARA_STRIP = " \t\r\n"

# Gopher Table A1 rejection thresholds: a document is kept only if
# every metric is <= its threshold.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

METRIC_FIELDS: tuple[str, ...] = (
    "n_lines",
    "dup_line_frac",
    "dup_line_char_frac",
    "dup_para_frac",
    "dup_para_char_frac",
    *(f"top_{n}gram_char_frac" for n in TOP_NGRAM_NS),
    *(f"dup_{n}gram_char_frac" for n in DUP_NGRAM_NS),
)

_SCHEMA = T.StructType(
    [T.StructField("n_lines", T.IntegerType())]
    + [T.StructField(f, T.DoubleType()) for f in METRIC_FIELDS[1:]]
)


def _unit_stats(units: list[str]) -> tuple[int, float, float]:
    """(count, dup fraction, dup char fraction) for lines/paragraphs:
    a unit is a 'repeat' if an identical unit appeared before it, so
    the dup fraction is (n - n_distinct) / n and the char fraction
    counts (cnt - 1) * len(unit) per distinct duplicated unit."""
    n = len(units)
    if n == 0:
        return 0, 0.0, 0.0
    counts = Counter(units)
    total_chars = sum(len(u) * c for u, c in counts.items())
    dup_frac = (n - len(counts)) / n
    dup_chars = sum((c - 1) * len(u) for u, c in counts.items() if c > 1)
    char_frac = dup_chars / total_chars if total_chars else 0.0
    return n, dup_frac, char_frac


def repetition_metrics_py(text: str | None) -> dict[str, float]:
    """Pure-Python single-document reference implementation — the
    exact function the pandas UDF vectorizes and the DuckDB oracle
    mirrors; kept importable so tests can property-check all three."""
    if not text:
        out: dict[str, float] = {f: 0.0 for f in METRIC_FIELDS}
        out["n_lines"] = 0
        return out

    lines = [l for l in (x.strip(_LINE_STRIP) for x in text.split("\n")) if l]
    paras = [p for p in (x.strip(_PARA_STRIP) for x in text.split("\n\n")) if p]
    n_lines, dup_line_frac, dup_line_char_frac = _unit_stats(lines)
    _, dup_para_frac, dup_para_char_frac = _unit_stats(paras)

    tokens = text.split()
    total_chars = len(" ".join(tokens))
    out = {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
    }
    for n in TOP_NGRAM_NS + DUP_NGRAM_NS:
        key = (
            f"top_{n}gram_char_frac"
            if n in TOP_NGRAM_NS
            else f"dup_{n}gram_char_frac"
        )
        if total_chars == 0 or len(tokens) < n:
            out[key] = 0.0
            continue
        grams = Counter(
            " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
        )
        if n in TOP_NGRAM_NS:
            # Gopher: characters covered by the MOST FREQUENT n-gram
            # (not the max count*len product — a rarer-but-longer gram
            # must not win). Count ties break to the longest gram,
            # which makes the coverage value itself deterministic.
            mx = max(grams.values())
            covered = mx * max(len(g) for g, c in grams.items() if c == mx)
        else:
            covered = sum(c * len(g) for g, c in grams.items() if c > 1)
        out[key] = covered / total_chars
    return out


# Token count above which the numpy n-gram path beats the Counter
# path (np.unique's O(m log m) C sort amortizes its per-call setup
# around a few hundred tokens; measured crossover in
# tests/test_repetition.py's benchmark note).
_NP_MIN_TOKENS = 512


def _ngram_fracs_np(tokens: list[str], total_chars: int) -> dict[str, float]:
    """EXACT numpy reimplementation of the n-gram half of
    ``repetition_metrics_py`` — no hashing, no approximation: n-gram
    identities are integer codes built by chaining ``np.unique``
    inverse indices (the code of an n-gram is (code of its (n-1)-gram
    prefix) * #distinct-tokens + (last token id), unique-compressed at
    each step so codes never overflow int64 for any m < 2^31 tokens).
    Counts come from ``np.bincount``; gram character lengths from a
    cumulative-sum window (every occurrence of a gram has the same
    ``len(' '.join(window))``, so a per-gram scatter is well-defined).
    All numerators/denominators stay exact int64 — bit-identical to
    the Counter path, property-tested in tests/test_repetition.py.

    Why it exists: profiling (round 5) showed 97% of this operator's
    Python CPU is Counter-based n-gram counting (line/para stats are
    3%, so moving THOSE to Catalyst — the r4 suggestion — wins
    nothing). For large documents the sort-based path cuts the per-doc
    CPU several-fold, which is what matters when this is the curation
    hot loop at 100 TB; small docs keep the Counter path, which wins
    under ~512 tokens."""
    import numpy as np

    m = len(tokens)
    out: dict[str, float] = {}
    uniq_toks, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    inv = inv.astype(np.int64, copy=False)
    n_tok = len(uniq_toks)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=m)
    cs = np.concatenate(([0], np.cumsum(lens)))
    gid = inv  # n=1 gram ids; extended one token at a time below
    for n in range(2, max(DUP_NGRAM_NS) + 1):
        key = (
            f"top_{n}gram_char_frac"
            if n in TOP_NGRAM_NS
            else f"dup_{n}gram_char_frac"
        )
        if m < n:
            if n in TOP_NGRAM_NS or n in DUP_NGRAM_NS:
                out[key] = 0.0
            continue
        code = gid[: m - n + 1] * n_tok + inv[n - 1 :]
        _, gid = np.unique(code, return_inverse=True)
        gid = gid.astype(np.int64, copy=False)
        if n not in TOP_NGRAM_NS and n not in DUP_NGRAM_NS:
            continue
        counts = np.bincount(gid)
        # len(" ".join(window)) per position; identical for every
        # occurrence of the same gram
        poslen = cs[n:] - cs[:-n] + (n - 1)
        gram_len = np.zeros(len(counts), dtype=np.int64)
        gram_len[gid] = poslen
        if n in TOP_NGRAM_NS:
            mx = int(counts.max())
            covered = mx * int(gram_len[counts == mx].max())
        else:
            dup = counts > 1
            covered = int((counts[dup] * gram_len[dup]).sum())
        out[key] = covered / total_chars
    return out


def repetition_metrics_np(text: str | None) -> dict[str, float]:
    """Large-document variant of ``repetition_metrics_py``: identical
    output (exact, not approximate — see ``_ngram_fracs_np``), numpy
    n-gram counting, Counter line/para stats (3% of the CPU)."""
    if not text:
        out: dict[str, float] = {f: 0.0 for f in METRIC_FIELDS}
        out["n_lines"] = 0
        return out

    lines = [l for l in (x.strip(_LINE_STRIP) for x in text.split("\n")) if l]
    paras = [p for p in (x.strip(_PARA_STRIP) for x in text.split("\n\n")) if p]
    n_lines, dup_line_frac, dup_line_char_frac = _unit_stats(lines)
    _, dup_para_frac, dup_para_char_frac = _unit_stats(paras)

    tokens = text.split()
    m = len(tokens)
    total_chars = sum(len(t) for t in tokens) + max(0, m - 1)
    out = {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
    }
    if total_chars == 0:
        for n in TOP_NGRAM_NS + DUP_NGRAM_NS:
            k = (
                f"top_{n}gram_char_frac"
                if n in TOP_NGRAM_NS
                else f"dup_{n}gram_char_frac"
            )
            out[k] = 0.0
        return out
    out.update(_ngram_fracs_np(tokens, total_chars))
    return out


def _metrics_one(t: str | None) -> dict[str, float]:
    if t and t.count(" ") >= _NP_MIN_TOKENS:  # cheap token-count proxy
        return repetition_metrics_np(t)
    return repetition_metrics_py(t)


@F.pandas_udf(_SCHEMA)
def _metrics_udf(s: pd.Series) -> pd.DataFrame:
    rows = [_metrics_one(t) for t in s]
    df = pd.DataFrame(rows, columns=list(METRIC_FIELDS))
    df["n_lines"] = df["n_lines"].astype("int32")
    return df


def repetition_metrics(col: Column) -> Column:
    """Struct of all repetition metrics for a text column (fields in
    ``METRIC_FIELDS``) — one Arrow-batched pass, no shuffle."""
    return _metrics_udf(col)


def gopher_repetition_filter(
    metrics: Column, thresholds: dict[str, float] | None = None
) -> Column:
    """Boolean keep-predicate over a ``repetition_metrics`` struct:
    true iff every thresholded metric is <= its limit (Gopher Table A1
    defaults). Unknown threshold keys fail fast rather than silently
    filtering on nothing."""
    thresholds = GOPHER_THRESHOLDS if thresholds is None else thresholds
    unknown = set(thresholds) - set(METRIC_FIELDS)
    if unknown:
        raise ValueError(f"unknown repetition metrics: {sorted(unknown)}")
    if not thresholds:
        raise ValueError("thresholds must name at least one metric")
    pred = F.lit(True)
    for name, limit in thresholds.items():
        pred = pred & (metrics[name] <= F.lit(float(limit)))
    return pred
