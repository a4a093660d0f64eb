"""PII detection and redaction over text columns.

Public training corpora scrub personally identifiable information
before anything else touches the data (C4 removed pages on a
blocklist; Dolma and the BigScience ROOTS pipeline regex-scrub
emails / IPs / phone numbers). This implements that stage as pure
Catalyst expressions — `regexp_extract_all` counting and chained
`regexp_replace` redaction — so the whole scrub runs JVM-side inside
whole-stage codegen: no UDF, no Arrow hop, no shuffle; at 100 TB it
fuses into the same scan as the other per-doc curation signals.

The patterns live in the RE2 ∩ java.util.regex common dialect
(character classes, bounded quantifiers, non-capturing groups, \\b —
no lookaround, no backrefs) so an external engine (the DuckDB oracle,
a Go scrubber) reproduces hit-for-hit identical matches; the parity
is pinned by tests and the td_pii driver row.

These are pattern-shaped detectors, not validators: `ipv4` matches
999.999.999.999 and `ssn` matches any d3-d2-d4 — standard recall-first
scrubbing behavior (drop/emit candidates, never try to prove a hit is
real PII).

Reference parity note: the closest reference behavior is the
attributesprocessor HASH action used to anonymize attributes
(processor/attributesprocessor; this repo's operators/attributes.py +
functions/hashing.py). Free-text scrubbing has no reference
counterpart — it belongs to the training-data extension family
(SURVEY.md north-star table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "total_pii_count", "redact_pii"]

# Ordered: redaction applies in this order, so earlier kinds win on
# overlapping text (an email's host is consumed before ipv4/phone see
# it). Keys are the redaction token ("<EMAIL>" etc).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    # the leading \b is load-bearing for the zero-residual invariant:
    # without it the phone pass can consume a SUFFIX of a longer digit
    # run ('1.2.3.45555-123-4567' → '1.2.3.45<PHONE>'), exposing a
    # fresh ipv4 match after the ipv4 pass already ran. Anchored, no
    # pass can split a digit run, so later passes never see new
    # boundaries. A '+' after a word char keeps its '+' unredacted
    # (the digits still go).
    "phone": r"\b\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def _token(kind: str) -> str:
    return f"<{kind.upper()}>"


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind candidate-hit counts (long), null-text-safe. Counts
    use the raw column independently per kind — a char claimed by two
    patterns counts for both (detection view); redaction resolves the
    overlap by `PII_PATTERNS` order."""
    return {
        kind: F.coalesce(
            F.size(F.regexp_extract_all(col, F.lit(pat), 0)), F.lit(0)
        ).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def total_pii_count(col: Column) -> Column:
    """Sum of all per-kind counts — the 'is this doc dirty' scalar."""
    counts = list(pii_counts(col).values())
    out = counts[0]
    for c in counts[1:]:
        out = out + c
    return out


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace every match with its '<KIND>' token, applying patterns
    in `PII_PATTERNS` order (email before ipv4/phone, so an address's
    digits are gone before the later patterns scan). The tokens
    contain no digits or '@', so redacted text can never re-trigger a
    pattern — `total_pii_count(redact_pii(c)) == 0` is an invariant
    the td_pii oracle checks corpus-wide."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = col
    for kind in PII_PATTERNS:  # canonical order regardless of input order
        if kind in kinds:
            out = F.regexp_replace(
                out, PII_PATTERNS[kind], _token(kind)
            )
    return out
