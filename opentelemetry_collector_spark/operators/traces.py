"""Trace-signal operators: the Span data model and trace-level
aggregations.

Reference span shape (consumer/pdata/generated_trace.go:477-657):
TraceID/SpanID/ParentSpanID, Name, Kind (trace.go:117-124), StartTime/
EndTime, Status{code,message} (trace.go:159-163), attributes. Count
walk = SpanCount (trace.go:77-88).

Transcript mapping: one conversation = one trace; one turn = one span.
span_id is a deterministic content hash (md5 of conv_id#turn_idx,
truncated to 8 bytes hex — the reference's SpanID is 8 bytes,
internal/data/spanid.go); parent_span_id links each turn to the
previous turn (the pdata slice order / turn_idx ordering), making the
conversation a linear trace. Kind maps from role the way the
receiver's translators map protocol roles (SERVER for user-facing
turns, INTERNAL for system, CLIENT for tool calls — cf. the
jaeger/zipkin kind mappings, translator/trace/zipkin/status_code.go
siblings). Status derives from the parsed level: error → code 2
(STATUS_ERROR), else 0 (cf. trace.go:159-163).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SPAN_KIND_BY_ROLE = {
    "user": "SERVER",
    "assistant": "INTERNAL",
    "system": "INTERNAL",
    "tool": "CLIENT",
}


def span_id(conv: Column, turn: Column) -> Column:
    """Deterministic 8-byte span id: first 16 hex chars of
    md5(conv_id#turn_idx)."""
    return F.substring(F.md5(F.concat_ws("#", conv, turn.cast("string"))), 1, 16)


def transcripts_to_spans(df: DataFrame, duration_col: str = "duration_ms") -> DataFrame:
    """Parsed transcripts → span table. Expects the parse stage's
    ``duration_ms``/``level`` columns; unparsed rows get duration 0 and
    status 0."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    kind = F.lit("INTERNAL")
    for role, k in SPAN_KIND_BY_ROLE.items():
        kind = F.when(F.col("role") == role, F.lit(k)).otherwise(kind)
    dur_us = (F.coalesce(F.col(duration_col).cast("long"), F.lit(0)) * 1000)
    return df.select(
        F.col("conv_id").alias("trace_id"),
        span_id(F.col("conv_id"), F.col("turn_idx")).alias("span_id"),
        F.lag(span_id(F.col("conv_id"), F.col("turn_idx"))).over(w).alias("parent_span_id"),
        F.col("turn_idx"),
        F.concat_ws("/", F.col("role"), F.coalesce(F.col("tool"), F.lit("-"))).alias("name"),
        kind.alias("kind"),
        F.col("ts").alias("start_ts"),
        # unix_micros keeps sub-second precision (a double cast through
        # LONG floors to whole seconds and zeroes sub-1s durations —
        # the reference translators preserve ns→us exactly)
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + dur_us
        ).alias("end_ts"),
        F.when(F.col("level") == "error", F.lit(2)).otherwise(F.lit(0)).alias("status_code"),
    )


def span_count(df: DataFrame) -> DataFrame:
    """SpanCount walk (trace.go:77-88) — rows of the flat table."""
    return df.agg(F.count(F.lit(1)).alias("span_count"))


def trace_summaries(spans: DataFrame) -> DataFrame:
    """Per-trace rollup: span count, root count (no parent), error
    count, wall duration in ms (max end − min start) — the
    trace-level view a tail sampler or trace-quality gate consumes."""
    dur_ms = F.floor(
        (
            F.max(F.unix_micros(F.col("end_ts").cast("timestamp")))
            - F.min(F.unix_micros(F.col("start_ts").cast("timestamp")))
        )
        / 1000
    )
    return spans.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("parent_span_id").isNull(), 1).otherwise(0)).alias("n_roots"),
        F.sum(F.when(F.col("status_code") == 2, 1).otherwise(0)).alias("n_errors"),
        dur_ms.cast("long").alias("duration_ms"),
    )


def error_traces(spans: DataFrame) -> DataFrame:
    """Traces containing ≥1 error span — whole-trace selection (the
    tail-sampling decision shape: any-span-matches keeps the trace,
    like filterexpr's any-datapoint semantics)."""
    flagged = spans.withColumn(
        "_has_err",
        F.max(F.when(F.col("status_code") == 2, 1).otherwise(0)).over(
            Window.partitionBy("trace_id")
        ),
    )
    return flagged.filter(F.col("_has_err") == 1).drop("_has_err")
