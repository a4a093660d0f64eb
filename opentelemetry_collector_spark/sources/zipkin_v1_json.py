"""Zipkin v1 JSON span translation (translator/trace/zipkin/
zipkinv1_to_protospan.go / zipkinv1_to_traces.go).

The v1 span (zipkin-api.yaml) carries kind as core ANNOTATIONS
("cs"/"cr" client send/recv, "sr"/"ss" server, "ms"/"mr" message
producer/consumer) and attributes+status as BINARY ANNOTATIONS.
Parse rules mirrored from the reference:

  * the FIRST kind-bearing annotation sets the kind
    (zipkinv1_to_protospan.go:326-350); "ms"/"mr" have no OC kind and
    ride the OpenTracing span.kind extended value;
  * ``timestamp``/``duration`` are epoch MICROseconds; a zero/absent
    timestamp falls back to the earliest/latest annotation times
    (zipkinv1_to_protospan.go:156-162);
  * binary annotations run through the status mapper
    (functions/status_codes.py): census.status_code > status.code >
    error > http.status_code; consumed status tags are dropped from
    attributes, http.* and non-canonical error tags are kept
    (status_code.go:85-127);
  * LOCAL_COMPONENT ("lc") renames to "component"
    (zipkinv1_to_protospan.go:222-226).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.status_codes import is_consumed_status_tag, zipkin_status

_ENDPOINT = T.StructType([T.StructField("serviceName", T.StringType())])

ZIPKIN_V1_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("parentId", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField(
            "annotations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("endpoint", _ENDPOINT),
                    ]
                )
            ),
        ),
        T.StructField(
            "binaryAnnotations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("endpoint", _ENDPOINT),
                    ]
                )
            ),
        ),
    ]
)

_KIND_ANNOTATIONS = ("cs", "cr", "ms", "mr", "ss", "sr")


def spans_to_zipkin_v1_json(
    spans: DataFrame, service_name: str = "transcripts"
) -> DataFrame:
    """Span table → one Zipkin v1 JSON line per span: kind as core
    annotations at the send/receive instants (CLIENT → cs/cr,
    SERVER → sr/ss; INTERNAL has no core annotations), attributes and
    status as binary annotations (census.status_code carries the
    NUMERIC code — attribToStatusCode parses int; the canonical NAME
    form belongs to the ``error`` tag)."""
    start_us = F.unix_micros(F.col("start_ts").cast("timestamp"))
    end_us = F.unix_micros(F.col("end_ts").cast("timestamp"))
    ep = F.struct(F.lit(service_name).alias("serviceName"))

    def ann(ts, value):
        return F.struct(ts.alias("timestamp"), value.alias("value"), ep.alias("endpoint"))

    annotations = (
        F.when(
            F.col("kind") == "CLIENT",
            F.array(ann(start_us, F.lit("cs")), ann(end_us, F.lit("cr"))),
        )
        .when(
            F.col("kind") == "SERVER",
            F.array(ann(start_us, F.lit("sr")), ann(end_us, F.lit("ss"))),
        )
        # message send/receive are single-sided annotations
        .when(F.col("kind") == "PRODUCER", F.array(ann(start_us, F.lit("ms"))))
        .when(F.col("kind") == "CONSUMER", F.array(ann(start_us, F.lit("mr"))))
        .otherwise(
            F.array().cast(ZIPKIN_V1_SPAN_SCHEMA["annotations"].dataType)
        )
    )
    def bann(key, value):
        return F.struct(key.alias("key"), value.alias("value"), ep.alias("endpoint"))

    bin_annotations = F.filter(
        F.array(
            bann(F.lit("conv_id"), F.col("trace_id")),
            bann(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
            bann(
                F.lit("census.status_code"),
                F.when(
                    F.col("status_code") != 0, F.col("status_code").cast("string")
                ),
            ),
        ),
        lambda b: b["value"].isNotNull(),
    )
    payload = F.struct(
        F.md5(F.col("trace_id")).alias("traceId"),
        F.col("name").alias("name"),
        F.col("parent_span_id").alias("parentId"),
        F.col("span_id").alias("id"),
        start_us.alias("timestamp"),
        (end_us - start_us).alias("duration"),
        annotations.alias("annotations"),
        bin_annotations.alias("binaryAnnotations"),
    )
    return spans.select(F.to_json(payload, {"ignoreNullFields": "true"}).alias("zipkin_v1"))


def zipkin_v1_json_to_spans(df: DataFrame, json_col: str = "zipkin_v1") -> DataFrame:
    """Zipkin v1 JSON lines → span table (zipkinV1ToOCSpan field
    rules). Kind from the first kind-bearing annotation; times from
    timestamp/duration with annotation-time fallback; status via the
    status mapper; consumed status tags dropped from attrs."""
    z = df.select(F.from_json(F.col(json_col), ZIPKIN_V1_SPAN_SCHEMA).alias("s")).select(
        "s.*"
    )
    kind_anns = F.filter(
        F.col("annotations"), lambda a: a["value"].isin(*_KIND_ANNOTATIONS)
    )
    first_kind = F.when(F.size(kind_anns) > 0, F.element_at(kind_anns, 1)["value"])
    kind = (
        F.when(first_kind.isin("cs", "cr"), F.lit("CLIENT"))
        .when(first_kind.isin("ss", "sr"), F.lit("SERVER"))
        .when(first_kind == "ms", F.lit("PRODUCER"))
        .when(first_kind == "mr", F.lit("CONSUMER"))
        .otherwise(F.lit("INTERNAL"))
    )
    ann_times = F.transform(
        F.filter(F.col("annotations"), lambda a: a["value"].isNotNull()),
        lambda a: a["timestamp"],
    )
    start_us = F.when(
        F.coalesce(F.col("timestamp"), F.lit(0)) != 0, F.col("timestamp")
    ).otherwise(F.array_min(ann_times))
    end_us = F.when(
        F.coalesce(F.col("timestamp"), F.lit(0)) != 0,
        F.col("timestamp") + F.coalesce(F.col("duration"), F.lit(0)),
    ).otherwise(F.array_max(ann_times))
    # lc → component rename happens BEFORE the status mapper sees keys
    renamed = F.transform(
        # a binary annotation missing its 'key' (untrusted JSON) must
        # be a skipped tag, not a "null as map key" runtime error in
        # the create_map fold below
        F.filter(
            F.coalesce(
                F.col("binaryAnnotations"),
                F.array().cast(ZIPKIN_V1_SPAN_SCHEMA["binaryAnnotations"].dataType),
            ),
            lambda b: b["key"].isNotNull(),
        ),
        lambda b: F.struct(
            F.when(b["key"] == "lc", F.lit("component")).otherwise(b["key"]).alias("key"),
            b["value"].alias("value"),
        ),
    )
    # fold to a map with LAST-wins on duplicate keys (Go map assign
    # semantics; map_from_entries would throw on duplicates)
    tags = F.aggregate(
        renamed,
        F.create_map().cast("map<string,string>"),
        lambda acc, b: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != b["key"]),
            F.create_map(b["key"], b["value"]),
        ),
    )
    status = zipkin_status(tags)
    attrs = F.map_filter(tags, lambda k, v: ~is_consumed_status_tag(k, v))
    return z.select(
        F.element_at(tags, "conv_id").alias("trace_id"),
        F.col("id").alias("span_id"),
        F.col("parentId").alias("parent_span_id"),
        F.element_at(tags, "turn_idx").cast("int").alias("turn_idx"),
        F.col("name"),
        kind.alias("kind"),
        F.timestamp_micros(start_us).alias("start_ts"),
        F.timestamp_micros(end_us).alias("end_ts"),
        status["code"].alias("status_code"),
        status["message"].alias("status_message"),
        attrs.alias("attrs"),
    )
