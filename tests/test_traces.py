"""Trace-signal operators: span derivation, counts, trace rollups,
any-error trace selection."""

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.traces import (
    error_traces,
    span_count,
    trace_summaries,
    transcripts_to_spans,
)
from opentelemetry_collector_spark.plans.pipeline import parse_stage


@pytest.fixture(scope="module")
def spans(spark, tiny_transcripts):
    return transcripts_to_spans(parse_stage(tiny_transcripts, engine="jvm")).cache()


def py_span_id(conv: str, turn: int) -> str:
    return hashlib.md5(f"{conv}#{turn}".encode()).hexdigest()[:16]


class TestSpanDerivation:
    def test_span_count_conserved(self, spans, tiny_transcripts):
        assert span_count(spans).first()["span_count"] == tiny_transcripts.count()

    def test_span_ids_deterministic(self, spans):
        r = spans.filter(F.col("turn_idx") == 0).first()
        assert r["span_id"] == py_span_id(r["trace_id"], 0)

    def test_parent_links_follow_turn_order(self, spans):
        conv = spans.filter(F.col("turn_idx") == 3).first()["trace_id"]
        rows = {
            r["turn_idx"]: r
            for r in spans.filter(F.col("trace_id") == conv).collect()
        }
        assert rows[0]["parent_span_id"] is None  # root
        for i in range(1, len(rows)):
            assert rows[i]["parent_span_id"] == rows[i - 1]["span_id"]

    def test_kind_mapping(self, spans):
        kinds = dict(
            spans.select(F.split("name", "/")[0].alias("role"), "kind")
            .distinct()
            .collect()
        )
        assert kinds["user"] == "SERVER" and kinds["tool"] == "CLIENT"

    def test_end_after_start(self, spans):
        bad = spans.filter(F.col("end_ts") < F.col("start_ts")).count()
        assert bad == 0


class TestTraceRollups:
    def test_one_root_per_trace(self, spans):
        roots = trace_summaries(spans).select("n_roots").distinct().collect()
        assert [r["n_roots"] for r in roots] == [1]

    def test_summary_counts(self, spans):
        s = trace_summaries(spans)
        total = s.agg(F.sum("n_spans")).first()[0]
        assert total == span_count(spans).first()["span_count"]
        assert s.filter(F.col("duration_ms") < 0).count() == 0

    def test_error_traces_keep_whole_trace(self, spans):
        et = error_traces(spans)
        # every kept trace has at least one error span…
        per_trace = et.groupBy("trace_id").agg(
            F.sum(F.when(F.col("status_code") == 2, 1).otherwise(0)).alias("errs"),
            F.count(F.lit(1)).alias("n"),
        )
        assert per_trace.filter(F.col("errs") == 0).count() == 0
        # …and is kept in full (span count matches the source trace)
        src = spans.groupBy("trace_id").count()
        joined = per_trace.join(src, "trace_id")
        assert joined.filter(F.col("n") != F.col("count")).count() == 0
