"""Zipkin v2 JSON span translation (translator/trace/zipkin/ — the
reference converts Zipkin's flat JSON spans to/from the pdata tree;
here the conversion is span-table ↔ Zipkin-JSON lines).

Zipkin v2 span shape: traceId/id/parentId (hex), name, kind
(SERVER/CLIENT/PRODUCER/CONSUMER — INTERNAL has no Zipkin kind and is
omitted, as the reference's translator does), timestamp+duration in
MICROseconds, localEndpoint.serviceName, string tags. Status rides
the ``otel.status_code`` tag, the reference's convention
(translator/trace/zipkin/status_code.go)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZIPKIN_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("parentId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField(
            "localEndpoint",
            T.StructType([T.StructField("serviceName", T.StringType())]),
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def spans_to_zipkin_json(spans: DataFrame, service_name: str = "transcripts") -> DataFrame:
    """Span table (operators.traces schema) → one Zipkin v2 JSON line
    per span."""
    # unix_micros, not cast-through-long: keeps the sub-second
    # component (the reference preserves ns→us; spans under 1s must
    # not export duration=0)
    start_us = F.unix_micros(F.col("start_ts").cast("timestamp"))
    end_us = F.unix_micros(F.col("end_ts").cast("timestamp"))
    payload = F.struct(
        F.md5(F.col("trace_id")).alias("traceId"),  # zipkin: 32-hex trace id
        F.col("span_id").alias("id"),
        F.col("parent_span_id").alias("parentId"),
        F.col("name").alias("name"),
        F.when(F.col("kind") != "INTERNAL", F.col("kind")).alias("kind"),
        start_us.alias("timestamp"),
        (end_us - start_us).alias("duration"),
        F.struct(F.lit(service_name).alias("serviceName")).alias("localEndpoint"),
        F.map_filter(
            F.create_map(
                F.lit("otel.status_code"),
                F.when(F.col("status_code") != 0, F.col("status_code").cast("string")),
                F.lit("turn_idx"), F.col("turn_idx").cast("string"),
                F.lit("conv_id"), F.col("trace_id"),
            ),
            lambda _k, v: v.isNotNull(),
        ).alias("tags"),
    )
    return spans.select(F.to_json(payload, {"ignoreNullFields": "true"}).alias("zipkin"))


def zipkin_json_to_spans(df: DataFrame, json_col: str = "zipkin") -> DataFrame:
    """Zipkin v2 JSON lines → span table. INTERNAL kind restores from
    absence; status from the otel.status_code tag (missing → 0)."""
    z = df.select(F.from_json(F.col(json_col), ZIPKIN_SPAN_SCHEMA).alias("s")).select("s.*")
    return z.select(
        F.element_at(F.col("tags"), "conv_id").alias("trace_id"),
        F.col("id").alias("span_id"),
        F.col("parentId").alias("parent_span_id"),
        F.element_at(F.col("tags"), "turn_idx").cast("int").alias("turn_idx"),
        F.col("name"),
        F.coalesce(F.col("kind"), F.lit("INTERNAL")).alias("kind"),
        F.timestamp_micros(F.col("timestamp")).alias("start_ts"),
        F.timestamp_micros(F.col("timestamp") + F.col("duration")).alias("end_ts"),
        F.coalesce(
            F.element_at(F.col("tags"), "otel.status_code").cast("int"), F.lit(0)
        ).alias("status_code"),
    )
