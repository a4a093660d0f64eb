"""Synthetic-transcript fixture sanity (FIXTURES.md §1-2)."""

import re

import numpy as np

from opentelemetry_collector_spark.datagen import (
    make_transcripts_pdf,
    role_lookup_pdf,
    tool_lookup_pdf,
)
from opentelemetry_collector_spark.plans.pipeline import TRANSCRIPT_PATTERN


def test_deterministic():
    a = make_transcripts_pdf(50, seed=42)
    b = make_transcripts_pdf(50, seed=42)
    assert a.equals(b)
    c = make_transcripts_pdf(50, seed=43)
    assert not a.equals(c)


def test_schema_and_invariants():
    pdf = make_transcripts_pdf(200, seed=42)
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert pdf["turn_idx"].dtype == np.int32

    g = pdf.groupby("conv_id")
    # dense 0-based turn_idx
    assert (g["turn_idx"].min() == 0).all()
    assert (g["turn_idx"].max() + 1 == g.size()).all()
    # ts monotone non-decreasing within conversation (ordered by turn_idx)
    s = pdf.sort_values(["conv_id", "turn_idx"])
    assert s.groupby("conv_id")["ts"].apply(lambda x: x.is_monotonic_increasing).all()
    # duplicate timestamps exist within some conversation (turn_idx tiebreak matters)
    assert (g["ts"].nunique() < g.size()).any()
    # tool set iff role == 'tool'
    assert (pdf["tool"].notna() == (pdf["role"] == "tool")).all()
    # conversations open with a user turn
    assert (pdf[pdf.turn_idx == 0]["role"] == "user").all()


def test_skewed_sizes():
    pdf = make_transcripts_pdf(300, seed=42)
    sizes = pdf.groupby("conv_id").size()
    assert sizes.max() > 20 * sizes.median()


def test_parse_fraction():
    pdf = make_transcripts_pdf(200, seed=42)
    pat = re.compile(TRANSCRIPT_PATTERN)
    frac = pdf["text"].apply(lambda t: bool(pat.search(t))).mean()
    assert 0.90 < frac < 0.99  # ~5% unstructured


def test_lookups():
    roles = role_lookup_pdf()
    tools = tool_lookup_pdf()
    assert len(roles) <= 20 and len(tools) <= 20
    # dim row absent from facts & fact value absent from dim (FIXTURES §2)
    pdf = make_transcripts_pdf(200, seed=42)
    assert "moderator" in set(roles.role) - set(pdf.role)
    assert "shell" in set(pdf.tool.dropna()) - set(tools.tool)
