"""OTLP protobuf-JSON translation: flat records ↔ the nested
``resourceLogs`` tree.

The reference's fileexporter writes one protobuf-JSON
ExportLogsServiceRequest per batch (exporter/fileexporter/
file_exporter.go:36-75) and the OTLP receiver reads the same shape
back (receiver/otlpreceiver/logs/otlp.go:53-77); the tree is
Logs → []ResourceLogs → []InstrumentationLibraryLogs → []LogRecord
(consumer/pdata/log.go:31-33, v0.17 field names). Attributes ride as
key/value lists with typed value wrappers ({"stringValue": …},
consumer/pdata/common.go:38-46).

Spark mapping (SURVEY.md §1.4): one conversation = one resource group,
so the flat transcript table round-trips through
``groupBy(conv_id).collect_list`` on the way out and
``from_json → explode ×3`` on the way back — all JVM-side json/struct
expressions, no Python.

Scale note: a resource group's records must fit one row on the way
out (collect_list per conv_id) — exactly the batch granularity the
reference holds in memory per export; pathological conversations are
capped upstream by split_batches (batch.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KV_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value",
                T.StructType([T.StructField("stringValue", T.StringType())]),
            ),
        ]
    )
)

LOG_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),  # proto JSON: uint64 as string
        T.StructField("severityText", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("body", T.StructType([T.StructField("stringValue", T.StringType())])),
        T.StructField("attributes", _KV_SCHEMA),
    ]
)

OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _KV_SCHEMA)]),
                        ),
                        T.StructField(
                            "instrumentationLibraryLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "instrumentationLibrary",
                                            T.StructType(
                                                [T.StructField("name", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "logs", T.ArrayType(LOG_RECORD_SCHEMA)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _map_to_kvlist(m: Column) -> Column:
    """map<string,string> → sorted OTLP attribute KV list (sorted for
    the canonical ordering the reference's tests compare with,
    common.go:577-583)."""
    entries = F.map_entries(m)
    kvs = F.transform(
        entries,
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(e["value"].alias("stringValue")).alias("value"),
        ),
    )
    return F.array_sort(kvs)


def _kvlist_to_map(kvs: Column) -> Column:
    return F.map_from_entries(
        F.transform(kvs, lambda e: F.struct(e["key"], e["value"]["stringValue"]))
    )


def logs_to_otlp_json(
    df: DataFrame,
    resource_key: str = "conv_id",
    library_name: str = "transcripts",
) -> DataFrame:
    """Flat records → one OTLP-JSON request line per resource group.

    Expects columns: conv_id, turn_idx, role, text, tool, ts. Output:
    (conv_id, otlp json string) — the fileexporter's
    line-per-batch format."""
    record = F.struct(
        # micros × 1000, not seconds × 1e9: timeUnixNano keeps the
        # full sub-second precision the proto field carries
        (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1_000))
        .cast("string")
        .alias("timeUnixNano"),
        F.col("role").alias("severityText"),
        F.concat_ws("/", F.col(resource_key), F.col("turn_idx").cast("string")).alias(
            "name"
        ),
        F.struct(F.col("text").alias("stringValue")).alias("body"),
        _map_to_kvlist(
            F.map_filter(
                F.create_map(
                    F.lit("turn_idx"), F.col("turn_idx").cast("string"),
                    F.lit("tool"), F.col("tool"),
                ),
                lambda _k, v: v.isNotNull(),
            )
        ).alias("attributes"),
    )
    grouped = (
        df.withColumn("_rec", record)
        .groupBy(resource_key)
        .agg(
            # order records by the NUMERIC turn index — the stable pdata
            # slice order; sorting by the name string would put turn 10
            # before turn 2
            F.sort_array(
                F.collect_list(F.struct(F.col("turn_idx").alias("_ord"), F.col("_rec")))
            ).alias("_pairs")
        )
        .withColumn("_recs", F.transform(F.col("_pairs"), lambda p: p["_rec"]))
    )
    payload = F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.array(
                        F.struct(
                            F.lit("conv_id").alias("key"),
                            F.struct(F.col(resource_key).alias("stringValue")).alias(
                                "value"
                            ),
                        )
                    ).alias("attributes")
                ).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(library_name).alias("name")).alias(
                            "instrumentationLibrary"
                        ),
                        F.col("_recs").alias("logs"),
                    )
                ).alias("instrumentationLibraryLogs"),
            )
        ).alias("resourceLogs")
    )
    return grouped.select(
        F.col(resource_key), F.to_json(payload).alias("otlp")
    )


def logs_from_otlp_json(df: DataFrame, json_col: str = "otlp") -> DataFrame:
    """OTLP-JSON request lines → flat records (the receiver path):
    from_json + three explodes walk the tree; the record count equals
    LogRecordCount() (log.go:85-97) by construction."""
    parsed = df.select(F.from_json(F.col(json_col), OTLP_LOGS_SCHEMA).alias("req"))
    rl = parsed.select(F.explode("req.resourceLogs").alias("rl"))
    ill = rl.select(
        _kvlist_to_map(F.col("rl.resource.attributes")).alias("resource_attrs"),
        F.explode("rl.instrumentationLibraryLogs").alias("ill"),
    )
    rec = ill.select(
        "resource_attrs",
        F.col("ill.instrumentationLibrary.name").alias("library"),
        F.explode("ill.logs").alias("r"),
    )
    attrs = _kvlist_to_map(F.col("r.attributes"))
    return rec.select(
        F.element_at(F.col("resource_attrs"), "conv_id").alias("conv_id"),
        F.element_at(attrs, "turn_idx").cast("int").alias("turn_idx"),
        F.col("r.severityText").alias("role"),
        F.col("r.body.stringValue").alias("text"),
        F.element_at(attrs, "tool").alias("tool"),
        F.timestamp_micros(
            F.floor(F.col("r.timeUnixNano").cast("long") / F.lit(1_000)).cast("long")
        ).alias("ts"),
        F.col("library"),
    )
