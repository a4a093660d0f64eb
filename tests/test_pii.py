"""PII detection/redaction: cross-engine pattern parity, redaction
ordering, the zero-residual invariant, and plan purity (all-codegen,
no UDF)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from opentelemetry_collector_spark.trainingdata import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    total_pii_count,
)

SAMPLES = [
    "mail a.b+c@ex-1.org or 10.1.2.3 call 555-123-4567 ssn 123-45-6789",
    "u7@example.com> from 10.7.20.7 code 2020",
    "ip-ish 999.999.999.999 and 1.2.3.4.5 and v1.2.3",
    "phones: +1 555-123-4567, 555 123 4567, 55-123-4567",
    "no pii here at all",
    "",
    "adjacent:1.2.3.4a@b.co 123-45-678912",
    # regression: an unanchored phone pattern once consumed the SUFFIX
    # of this digit run, exposing a fresh ipv4 ('1.2.3.45<PHONE>')
    "1.2.3.45555-123-4567",
    "x+123-456-7890 and +1 555-123-4567",
]


class TestPatterns:
    def test_duckdb_parity_on_samples(self, spark):
        df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
        con = duckdb.connect()
        for kind, pat in PII_PATTERNS.items():
            got = [
                r[0]
                for r in df.select(
                    F.regexp_extract_all("text", F.lit(pat), 0)
                ).collect()
            ]
            want = [
                con.execute(
                    "SELECT regexp_extract_all(?, ?)", [s, pat]
                ).fetchone()[0]
                for s in SAMPLES
            ]
            assert got == want, kind

    def test_counts_and_null_safety(self, spark):
        df = spark.createDataFrame(
            [(0, SAMPLES[0]), (1, None), (2, "")], "i long, text string"
        )
        counts = pii_counts(F.col("text"))
        rows = {
            r["i"]: r
            for r in df.select(
                "i", *[counts[k].alias(k) for k in PII_PATTERNS]
            ).collect()
        }
        assert (
            rows[0]["email"],
            rows[0]["ipv4"],
            rows[0]["phone"],
            rows[0]["ssn"],
        ) == (1, 1, 1, 1)
        for i in (1, 2):
            assert all(rows[i][k] == 0 for k in PII_PATTERNS)

    def test_redaction_order_email_wins_overlap(self, spark):
        # the address's host would match nothing after email runs; the
        # embedded dotted-quad local part must be gone too
        df = spark.createDataFrame([("x 1.2.3.4@ex.com y",)], "text string")
        red = df.select(redact_pii(F.col("text")).alias("r")).first()["r"]
        assert red == "x <EMAIL> y"

    def test_selected_kinds_only(self, spark):
        df = spark.createDataFrame([(SAMPLES[0],)], "text string")
        red = df.select(
            redact_pii(F.col("text"), kinds=["ssn"]).alias("r")
        ).first()["r"]
        assert "<SSN>" in red and "@" in red and "10.1.2.3" in red

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError):
            redact_pii(F.col("text"), kinds=["email", "dna"])

    @given(
        st.text(
            alphabet="ab1. -@5c\n", min_size=0, max_size=60
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_zero_residual_invariant(self, text):
        # pure-Python mirror of the column ops via re — fast enough for
        # hypothesis; Spark parity is pinned by the other tests
        import re

        red = text
        for kind, pat in PII_PATTERNS.items():
            red = re.sub(pat, f"<{kind.upper()}>", red)
        for pat in PII_PATTERNS.values():
            assert not re.search(pat, red), (text, red)

    def test_zero_residual_on_spark(self, spark):
        df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
        residual = df.select(
            F.sum(total_pii_count(redact_pii(F.col("text")))).alias("r")
        ).first()["r"]
        assert residual == 0

    def test_plan_is_pure_codegen(self, spark):
        df = spark.createDataFrame([(SAMPLES[0],)], "text string").select(
            redact_pii(F.col("text")).alias("r"),
            total_pii_count(F.col("text")).alias("n"),
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan, plan
        assert "Exchange" not in plan, plan
