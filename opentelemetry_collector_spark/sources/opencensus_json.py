"""OpenCensus JSON span translation (translator/internaldata/
oc_to_traces.go / traces_to_oc.go — in the v0.17 era OC was the
default interchange format between collectors).

OC proto-JSON span shape: traceId/spanId/parentSpanId are base64 of
the raw bytes (proto3 JSON bytes encoding), name is a
TruncatableString ``{"value": ...}``, startTime/endTime are RFC3339
proto Timestamps, attributes ride an ``attributeMap`` of typed value
wrappers (``{"stringValue": {"value": ...}}`` / ``{"intValue": "n"}``,
oc proto trace.proto), status is ``{"code": n}`` (omitted at 0).

Kind semantics (oc_to_traces.go:257-294 + traces_to_oc.go): OC's enum
only has SERVER/CLIENT — every other kind rides the OpenTracing
``span.kind`` attribute (lowercase values); on read, the native enum
wins, else the attribute is consumed (and deleted) to restore
INTERNAL/PRODUCER/CONSUMER.

All conversion is JVM-side json/struct/base64 expressions — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RFC3339_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

_ATTR_VALUE = T.StructType(
    [
        T.StructField(
            "stringValue", T.StructType([T.StructField("value", T.StringType())])
        ),
        T.StructField("intValue", T.StringType()),  # proto JSON: int64 as string
    ]
)

OC_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("parentSpanId", T.StringType()),
        T.StructField("name", T.StructType([T.StructField("value", T.StringType())])),
        T.StructField("kind", T.StringType()),
        T.StructField("startTime", T.StringType()),
        T.StructField("endTime", T.StringType()),
        T.StructField(
            "attributes",
            T.StructType(
                [
                    T.StructField(
                        "attributeMap", T.MapType(T.StringType(), _ATTR_VALUE)
                    )
                ]
            ),
        ),
        T.StructField("status", T.StructType([T.StructField("code", T.IntegerType())])),
        T.StructField("sameProcessAsParentSpan", T.BooleanType()),
    ]
)


def _str_attr(value):
    return F.struct(
        F.struct(value.alias("value")).alias("stringValue"),
        F.lit(None).cast("string").alias("intValue"),
    )


def _int_attr(value):
    return F.struct(
        F.lit(None).cast(_ATTR_VALUE["stringValue"].dataType).alias("stringValue"),
        value.cast("string").alias("intValue"),
    )


def spans_to_oc_json(spans: DataFrame, json_name: str = "oc") -> DataFrame:
    """Span table (operators.traces schema) → one OC proto-JSON span
    per line (traces_to_oc.go field mapping)."""
    b64 = lambda hex_col: F.base64(F.unhex(hex_col))  # noqa: E731
    native_kind = F.when(F.col("kind").isin("SERVER", "CLIENT"), F.col("kind"))
    # non-native kinds ride the OpenTracing span.kind attribute
    kind_attr = F.when(
        ~F.coalesce(F.col("kind"), F.lit("INTERNAL")).isin("SERVER", "CLIENT"),
        F.lower(F.coalesce(F.col("kind"), F.lit("INTERNAL"))),
    )
    attr_map = F.map_filter(
        F.create_map(
            F.lit("conv_id"), _str_attr(F.col("trace_id")),
            F.lit("turn_idx"), _int_attr(F.col("turn_idx")),
            F.lit("span.kind"), F.when(kind_attr.isNotNull(), _str_attr(kind_attr)),
        ),
        lambda _k, v: v.isNotNull(),
    )
    payload = F.struct(
        b64(F.md5(F.col("trace_id"))).alias("traceId"),
        b64(F.col("span_id")).alias("spanId"),
        b64(F.col("parent_span_id")).alias("parentSpanId"),
        F.struct(F.col("name").alias("value")).alias("name"),
        native_kind.alias("kind"),
        F.date_format(F.col("start_ts").cast("timestamp"), _RFC3339_US).alias(
            "startTime"
        ),
        F.date_format(F.col("end_ts").cast("timestamp"), _RFC3339_US).alias("endTime"),
        F.struct(attr_map.alias("attributeMap")).alias("attributes"),
        F.when(
            F.col("status_code") != 0,
            F.struct(F.col("status_code").cast("int").alias("code")),
        ).alias("status"),
        F.lit(True).alias("sameProcessAsParentSpan"),
    )
    return spans.select(
        F.to_json(payload, {"ignoreNullFields": "true"}).alias(json_name)
    )


def oc_json_to_spans(df: DataFrame, json_col: str = "oc") -> DataFrame:
    """OC proto-JSON span lines → span table. Native kind wins; the
    span.kind attribute restores non-native kinds and is consumed
    (oc_to_traces.go:266-289); neither present → INTERNAL (our span
    model's zero kind). Status restores 0 from absence."""
    s = df.select(F.from_json(F.col(json_col), OC_SPAN_SCHEMA).alias("s")).select("s.*")
    amap = F.col("attributes.attributeMap")

    def attr_str(key: str):
        return F.element_at(amap, key)["stringValue"]["value"]

    def attr_int(key: str):
        return F.element_at(amap, key)["intValue"]

    kind = F.coalesce(
        F.col("kind"), F.upper(attr_str("span.kind")), F.lit("INTERNAL")
    )
    unb64 = lambda c: F.lower(F.hex(F.unbase64(c)))  # noqa: E731
    return s.select(
        attr_str("conv_id").alias("trace_id"),
        unb64(F.col("spanId")).alias("span_id"),
        F.when(
            F.col("parentSpanId").isNotNull(), unb64(F.col("parentSpanId"))
        ).alias("parent_span_id"),
        attr_int("turn_idx").cast("int").alias("turn_idx"),
        F.col("name.value").alias("name"),
        kind.alias("kind"),
        F.to_timestamp(F.col("startTime"), _RFC3339_US).alias("start_ts"),
        F.to_timestamp(F.col("endTime"), _RFC3339_US).alias("end_ts"),
        F.coalesce(F.col("status.code"), F.lit(0)).alias("status_code"),
    )


# ---------------------------------------------------------------------------
# metrics (oc_to_metrics.go / metrics_to_oc.go)
# ---------------------------------------------------------------------------

# OC MetricDescriptor.Type ↔ (data_type, temporality). OC has no DELTA
# representation — the reference treats OC points as gauge/cumulative
# only (oc_to_metrics.go descriptorTypeToMetrics); DELTA rows are not
# OC-expressible and metrics_to_oc_json UNCONDITIONALLY drops them
# (the oracle encodes the same drop).
_OC_TYPE_BY_MODEL = {
    ("IntGauge", "UNSPECIFIED"): "GAUGE_INT64",
    ("DoubleGauge", "UNSPECIFIED"): "GAUGE_DOUBLE",
    ("IntSum", "CUMULATIVE"): "CUMULATIVE_INT64",
    ("DoubleSum", "CUMULATIVE"): "CUMULATIVE_DOUBLE",
}
_MODEL_BY_OC_TYPE = {v: k for k, v in _OC_TYPE_BY_MODEL.items()}

OC_METRIC_SCHEMA = T.StructType(
    [
        T.StructField(
            "metricDescriptor",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "labelKeys",
                        T.ArrayType(
                            T.StructType([T.StructField("key", T.StringType())])
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "timeseries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "labelValues",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("value", T.StringType()),
                                        T.StructField("hasValue", T.BooleanType()),
                                    ]
                                )
                            ),
                        ),
                        T.StructField(
                            "points",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("timestamp", T.StringType()),
                                        T.StructField("int64Value", T.StringType()),
                                        T.StructField("doubleValue", T.DoubleType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def metrics_to_oc_json(
    dps: DataFrame, label_keys: list[str], json_name: str = "oc"
) -> DataFrame:
    """Datapoint rows (operators.metrics schema) → one OC proto-JSON
    Metric per metric name: per-(name, labels) timeseries with points
    in ts order (metrics_to_oc.go). ``label_keys`` fixes the
    descriptor's labelKeys order, as the reference derives it from the
    metric's known keys; every timeseries emits its labelValues in
    that order with hasValue mirroring presence."""
    oc_type = F.lit(None).cast("string")
    for (dt, temp), oc in _OC_TYPE_BY_MODEL.items():
        oc_type = F.when(
            (F.col("data_type") == dt) & (F.col("temporality") == temp), F.lit(oc)
        ).otherwise(oc_type)
    tagged = dps.withColumn("_oc_type", oc_type).filter(F.col("_oc_type").isNotNull())
    label_values = F.array(
        *[
            F.struct(
                F.coalesce(F.element_at(F.col("labels"), k), F.lit("")).alias("value"),
                F.map_contains_key(F.col("labels"), F.lit(k)).alias("hasValue"),
            )
            for k in label_keys
        ]
    )
    point = F.struct(
        F.date_format(F.col("ts").cast("timestamp"), _RFC3339_US).alias("timestamp"),
        F.when(
            F.col("_oc_type").isin("GAUGE_INT64", "CUMULATIVE_INT64"),
            F.col("int_value").cast("string"),
        ).alias("int64Value"),
        F.when(
            F.col("_oc_type").isin("GAUGE_DOUBLE", "CUMULATIVE_DOUBLE"),
            F.col("double_value"),
        ).alias("doubleValue"),
    )
    series = (
        tagged.withColumn("_lv", label_values)
        .withColumn("_pt", point)
        .groupBy("name", "_oc_type", "_lv")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("ts").alias("_ord"), F.col("_pt")))
                ),
                lambda p: p["_pt"],
            ).alias("points")
        )
    )
    metric = series.groupBy("name", "_oc_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("_lv").alias("labelValues"), F.col("points"))
            )
        ).alias("timeseries")
    )
    payload = F.struct(
        F.struct(
            F.col("name"),
            F.col("_oc_type").alias("type"),
            F.array(*[F.struct(F.lit(k).alias("key")) for k in label_keys]).alias(
                "labelKeys"
            ),
        ).alias("metricDescriptor"),
        F.col("timeseries"),
    )
    return metric.select(
        F.to_json(payload, {"ignoreNullFields": "true"}).alias(json_name)
    )


def oc_json_to_metrics(df: DataFrame, json_col: str = "oc") -> DataFrame:
    """OC proto-JSON Metric lines → datapoint rows: explode timeseries
    × points, rebuild the labels map from (labelKeys, labelValues)
    zip (hasValue=false entries are absent keys), map the OC type back
    to (data_type, temporality) (oc_to_metrics.go)."""
    m = df.select(F.from_json(F.col(json_col), OC_METRIC_SCHEMA).alias("m")).select(
        "m.*"
    )
    dt = F.lit(None).cast("string")
    temp = F.lit(None).cast("string")
    for oc, (d, t) in _MODEL_BY_OC_TYPE.items():
        hit = F.col("metricDescriptor.type") == oc
        dt = F.when(hit, F.lit(d)).otherwise(dt)
        temp = F.when(hit, F.lit(t)).otherwise(temp)
    ts_row = m.select(
        F.col("metricDescriptor.name").alias("name"),
        dt.alias("data_type"),
        temp.alias("temporality"),
        F.transform(F.col("metricDescriptor.labelKeys"), lambda k: k["key"]).alias(
            "_keys"
        ),
        F.explode("timeseries").alias("_ts"),
    )
    labels = F.map_from_entries(
        F.filter(
            F.zip_with(
                F.col("_keys"),
                F.col("_ts.labelValues"),
                lambda k, v: F.struct(
                    k.alias("key"),
                    F.when(v["hasValue"], v["value"]).alias("value"),
                ),
            ),
            lambda e: e["value"].isNotNull(),
        )
    )
    pt = ts_row.withColumn("labels", labels).select(
        "name", "data_type", "temporality", "labels",
        F.explode("_ts.points").alias("_pt"),
    )
    return pt.select(
        "name", "data_type", "temporality", "labels",
        F.to_timestamp(F.col("_pt.timestamp"), _RFC3339_US).alias("ts"),
        F.col("_pt.int64Value").cast("long").alias("int_value"),
        F.col("_pt.doubleValue").alias("double_value"),
    )
