"""SeverityNumber ↔ SeverityText mapping (consumer/pdata/log.go:116-142):
the OTLP enum 1..24 = TRACE..FATAL4, four numbers per named band
(TRACE=1..4, DEBUG=5..8, INFO=9..12, WARN=13..16, ERROR=17..20,
FATAL=21..24); the canonical text for band base n is the band name,
n+1..n+3 carry the 2..4 suffixes."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BANDS = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]

SEVERITY_TEXT_TO_NUMBER = {}
for i, band in enumerate(_BANDS):
    base = i * 4 + 1
    SEVERITY_TEXT_TO_NUMBER[band] = base
    for off in (2, 3, 4):
        SEVERITY_TEXT_TO_NUMBER[f"{band}{off}"] = base + off - 1

SEVERITY_NUMBER_TO_TEXT = {v: k for k, v in SEVERITY_TEXT_TO_NUMBER.items()}


def severity_number(text: Column) -> Column:
    """Severity text (case-insensitive) → enum number; unknown → 0
    (SEVERITY_NUMBER_UNDEFINED)."""
    up = F.upper(text)
    out = F.lit(0)
    for t, n in SEVERITY_TEXT_TO_NUMBER.items():
        out = F.when(up == t, F.lit(n)).otherwise(out)
    return out.cast("int")


def severity_text(num: Column) -> Column:
    """Enum number → canonical severity text; out of range → NULL."""
    out = F.lit(None).cast("string")
    for n, t in SEVERITY_NUMBER_TO_TEXT.items():
        out = F.when(num == n, F.lit(t)).otherwise(out)
    return out


def severity_band(num: Column) -> Column:
    """Enum number → coarse band name (the reference's is-error-level
    style checks compare against band bases)."""
    return F.when(
        (num >= 1) & (num <= 24),
        F.element_at(
            F.array(*[F.lit(b) for b in _BANDS]),
            ((num - 1) / 4).cast("int") + 1,
        ),
    )
