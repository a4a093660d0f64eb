"""Jaeger JSON span translation (translator/trace/jaeger/
jaegerproto_to_traces.go / traces_to_jaegerproto.go — field-by-field
span conversion including typed tag ↔ attribute coercion).

Jaeger span shape (API JSON): traceID/spanID hex, operationName,
references [{refType: CHILD_OF, traceID, spanID}], startTime +
duration in MICROseconds, typed tags [{key, type, value}] (the
reference coerces tag types into attribute values and back —
represented here by string/int64 tag types), process.serviceName.
Span kind rides the ``span.kind`` tag (Jaeger's convention, lowercase
values), as the reference's translator emits it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )
)

JAEGER_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("traceID", T.StringType()),
        T.StructField("spanID", T.StringType()),
        T.StructField("operationName", T.StringType()),
        T.StructField(
            "references",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("refType", T.StringType()),
                        T.StructField("traceID", T.StringType()),
                        T.StructField("spanID", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("startTime", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField("tags", _TAG_SCHEMA),
        T.StructField(
            "process",
            T.StructType([T.StructField("serviceName", T.StringType())]),
        ),
    ]
)

_KIND_TO_JAEGER = {
    "SERVER": "server",
    "CLIENT": "client",
    "INTERNAL": "internal",
    "PRODUCER": "producer",
    "CONSUMER": "consumer",
}


def spans_to_jaeger_json(spans: DataFrame, service_name: str = "transcripts") -> DataFrame:
    """Span table → one Jaeger JSON span per line; parent linkage as a
    CHILD_OF reference, kind as the span.kind tag, typed tags for
    turn_idx (int64) and status (int64)."""
    # unix_micros keeps sub-second precision (reference preserves
    # ns→us; see zipkin_json.py note)
    start_us = F.unix_micros(F.col("start_ts").cast("timestamp"))
    end_us = F.unix_micros(F.col("end_ts").cast("timestamp"))
    trace_hex = F.md5(F.col("trace_id"))
    kind_tag = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in _KIND_TO_JAEGER]),
            F.array(*[F.lit(v) for v in _KIND_TO_JAEGER.values()]),
        ),
        F.col("kind"),
    )
    tags = F.filter(
        F.array(
            F.struct(
                F.lit("span.kind").alias("key"), F.lit("string").alias("type"),
                kind_tag.alias("value"),
            ),
            F.struct(
                F.lit("turn_idx").alias("key"), F.lit("int64").alias("type"),
                F.col("turn_idx").cast("string").alias("value"),
            ),
            F.struct(
                F.lit("otel.status_code").alias("key"), F.lit("int64").alias("type"),
                F.when(F.col("status_code") != 0, F.col("status_code").cast("string")).alias("value"),
            ),
            F.struct(
                F.lit("conv_id").alias("key"), F.lit("string").alias("type"),
                F.col("trace_id").alias("value"),
            ),
        ),
        lambda t: t["value"].isNotNull(),
    )
    refs = F.when(
        F.col("parent_span_id").isNotNull(),
        F.array(
            F.struct(
                F.lit("CHILD_OF").alias("refType"),
                trace_hex.alias("traceID"),
                F.col("parent_span_id").alias("spanID"),
            )
        ),
    ).otherwise(F.array().cast(JAEGER_SPAN_SCHEMA["references"].dataType))
    payload = F.struct(
        trace_hex.alias("traceID"),
        F.col("span_id").alias("spanID"),
        F.col("name").alias("operationName"),
        refs.alias("references"),
        start_us.alias("startTime"),
        (end_us - start_us).alias("duration"),
        tags.alias("tags"),
        F.struct(F.lit(service_name).alias("serviceName")).alias("process"),
    )
    return spans.select(F.to_json(payload, {"ignoreNullFields": "true"}).alias("jaeger"))


_RESERVED_TAGS = ("span.kind", "conv_id", "turn_idx", "otel.status_code")


def jaeger_json_to_spans(df: DataFrame, json_col: str = "jaeger") -> DataFrame:
    """Jaeger JSON lines → span table: typed tags coerce back
    (int64-typed strings → int, bools canonicalized lowercase — the
    tag-type coercions of jaegerproto_to_traces.go), CHILD_OF
    reference restores the parent, span.kind tag restores the kind.
    Status resolves otel.status_code first, then the HTTP→OC table on
    http.status_code (setInternalSpanStatus's fallback order); all
    non-reserved tags land in an ``attrs`` map (last-wins on
    duplicate keys, Go map semantics)."""
    from ..functions.status_codes import oc_status_from_http

    j = df.select(F.from_json(F.col(json_col), JAEGER_SPAN_SCHEMA).alias("s")).select("s.*")

    def tag(key: str):
        hits = F.filter(F.col("tags"), lambda t: t["key"] == key)
        return F.when(F.size(hits) > 0, F.element_at(hits, 1)["value"])

    kind_back = F.upper(F.coalesce(tag("span.kind"), F.lit("internal")))
    child_of = F.filter(F.col("references"), lambda r: r["refType"] == "CHILD_OF")
    http_code = tag("http.status_code").try_cast("int")
    status = F.coalesce(
        tag("otel.status_code").cast("int"),
        F.when(http_code.isNotNull(), oc_status_from_http(http_code)),
        F.lit(0),
    )
    coerced = F.transform(
        F.filter(
            F.coalesce(F.col("tags"), F.array().cast(_TAG_SCHEMA)),
            # key.isNotNull() EXPLICITLY: untrusted JSON can omit
            # 'key', and a NULL key reaching the create_map fold below
            # is a runtime error, not a skipped tag (the Go receiver
            # skips it). ~NULL.isin(...) would drop it only
            # implicitly via three-valued logic.
            lambda t: t["key"].isNotNull() & ~t["key"].isin(*_RESERVED_TAGS),
        ),
        lambda t: F.struct(
            t["key"].alias("key"),
            F.when(t["type"] == "bool", F.lower(t["value"]))
            .otherwise(t["value"])
            .alias("value"),
        ),
    )
    attrs = F.aggregate(
        coerced,
        F.create_map().cast("map<string,string>"),
        lambda acc, t: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != t["key"]),
            F.create_map(t["key"], t["value"]),
        ),
    )
    return j.select(
        tag("conv_id").alias("trace_id"),
        F.col("spanID").alias("span_id"),
        F.when(F.size(child_of) > 0, F.element_at(child_of, 1)["spanID"]).alias(
            "parent_span_id"
        ),
        tag("turn_idx").cast("int").alias("turn_idx"),
        F.col("operationName").alias("name"),
        kind_back.alias("kind"),
        F.timestamp_micros(F.col("startTime")).alias("start_ts"),
        F.timestamp_micros(F.col("startTime") + F.col("duration")).alias("end_ts"),
        status.alias("status_code"),
        attrs.alias("attrs"),
    )
