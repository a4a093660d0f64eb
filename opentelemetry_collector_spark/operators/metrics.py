"""Metrics-signal operators: the reference's metric data model and its
distinctive counting semantics.

Data model (consumer/pdata/metric.go:158-167): a Metric is a tagged
union of 7 data types — IntGauge, DoubleGauge, IntSum, DoubleSum,
IntHistogram, DoubleHistogram, DoubleSummary — with
AggregationTemporality Delta/Cumulative (metric.go:22-28). Flattened
Spark schema: one row per DATAPOINT, carrying the metric identity
(name, data_type, temporality), its labels (StringMap,
common.go:633-786), and typed value columns (int_value, double_value,
bucket_counts for histograms).

Counting semantics the batch processor depends on
(batch_processor.go:298-307 vs metric.go:121-153):
  * ``metric_count``   — number of distinct METRICS (what
    send_batch_size counts for metrics);
  * ``datapoint_count`` — number of datapoint rows (what
    MetricAndDataPointCount reports).

resource_to_label (exporter/exporterhelper/resource_to_label.go:36-55)
copies every resource attribute into each datapoint's label map,
stringified — here one ``map_concat`` (datapoint labels win on key
collision, matching Upsert-into-copy order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRIC_TYPES = [
    "IntGauge",
    "DoubleGauge",
    "IntSum",
    "DoubleSum",
    "IntHistogram",
    "DoubleHistogram",
    "DoubleSummary",
]
TEMPORALITIES = ["UNSPECIFIED", "DELTA", "CUMULATIVE"]

DATAPOINT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("temporality", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("resource_attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.TimestampType()),
        T.StructField("int_value", T.LongType()),
        T.StructField("double_value", T.DoubleType()),
        T.StructField("bucket_counts", T.ArrayType(T.LongType())),
    ]
)


def validate_datapoints(df: DataFrame) -> DataFrame:
    """Typed-variant discipline (the accessor panics of
    metric.go:237-281 as a filterable validity predicate): int types
    must carry int_value, double types double_value, histograms
    bucket_counts."""
    t = F.col("data_type")
    valid = (
        F.when(t.isin("IntGauge", "IntSum"), F.col("int_value").isNotNull())
        .when(
            t.isin("DoubleGauge", "DoubleSum", "DoubleSummary"),
            F.col("double_value").isNotNull(),
        )
        .when(
            t.isin("IntHistogram", "DoubleHistogram"),
            F.col("bucket_counts").isNotNull(),
        )
        .otherwise(F.lit(False))
    )
    return df.withColumn("valid", valid)


def metric_count(df: DataFrame) -> DataFrame:
    """Distinct metric count — batch sizing counts METRICS, not
    datapoints (batch_processor.go:298-307)."""
    return df.agg(F.count_distinct("name").alias("metric_count"))


def datapoint_count(df: DataFrame) -> DataFrame:
    """Datapoint count — the MetricAndDataPointCount walk
    (metric.go:121-153)."""
    return df.agg(F.count(F.lit(1)).alias("datapoint_count"))


def filter_metric_names(
    df: DataFrame, values: list[str], match_type: str, action: str = "include"
) -> DataFrame:
    """filterprocessor over metric names (strict set / regexp any-match
    filtersets, §2.4), dropping whole metrics while preserving row
    order within partitions (filter_processor.go:90-113)."""
    from .filters import filterset_predicate

    pred = filterset_predicate(F.col("name"), values, match_type)
    return df.filter(pred if action == "include" else ~pred)


def resource_to_label(df: DataFrame) -> DataFrame:
    """Copy resource attributes into each datapoint's labels
    (resource_to_label.go:36-55). Collision rule: the datapoint's own
    label wins (the reference Upserts resource attrs first, then the
    dp's own labels overwrite) — expressed dedup-policy-independent by
    dropping resource keys the datapoint already has before concat."""
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    labels = F.coalesce(F.col("labels"), empty)
    res_only = F.map_filter(
        F.coalesce(F.col("resource_attrs"), empty),
        lambda k, _v: ~F.map_contains_key(labels, k),
    )
    return df.withColumn("labels", F.map_concat(res_only, labels))


def temporality_totals(df: DataFrame) -> DataFrame:
    """Delta vs cumulative roll-up: DELTA sums increments over the
    window; CUMULATIVE takes the latest value per (name, labels) —
    both in one pass via conditional aggregation on (name,
    temporality)."""
    w_latest = F.max_by(
        F.coalesce(F.col("double_value"), F.col("int_value").cast("double")), F.col("ts")
    )
    delta_sum = F.sum(
        F.when(
            F.col("temporality") == "DELTA",
            F.coalesce(F.col("double_value"), F.col("int_value").cast("double")),
        )
    )
    return (
        df.groupBy("name", "temporality")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(delta_sum, 6).alias("delta_total"),
            F.round(w_latest, 6).alias("latest_value"),
        )
    )


def adjust_cumulative(
    df: DataFrame,
    series_cols: tuple[str, ...] = ("name",),
    ts_col: str = "ts",
) -> DataFrame:
    """Prometheus-receiver start-time / reset adjustment for CUMULATIVE
    scalar series (receiver/prometheusreceiver/internal/
    metrics_adjuster.go:188-316): per series in time order, the FIRST
    point is the "initial" — it defines the series start time and
    baseline and is REMOVED from the output; a point whose raw value
    drops below the previous raw value is a RESET — it becomes the new
    initial (also removed); every other point is emitted with
    ``adjusted_value = raw − segment_initial`` and ``start_ts`` = its
    segment's initial timestamp. This is what turns a scrape stream of
    monotonic counters (that restart when processes restart) into
    rate-able deltas with honest start times.

    Spark-first shape: one window partition per series — lag() marks
    segment starts, a running conditional sum numbers segments, and
    first_value() over (series, segment) supplies the baseline/start —
    a single exchange on the series key, no Python, no state store;
    Prometheus cardinality (many small series) partitions evenly, and
    a single pathological series is bounded by its scrape count.
    Ordering ties on ``ts`` break by raw value so the result is
    deterministic and engine-reproducible."""
    from pyspark.sql.window import Window

    raw = F.coalesce(F.col("double_value"), F.col("int_value").cast("double"))
    d = df.withColumn("_ac_raw", raw)
    w_ord = Window.partitionBy(*series_cols).orderBy(ts_col, "_ac_raw")
    prev = F.lag("_ac_raw").over(w_ord)
    is_start = prev.isNull() | (F.col("_ac_raw") < prev)
    d = d.withColumn("_ac_start", is_start).withColumn(
        "_ac_seg",
        F.sum(F.when(is_start, F.lit(1)).otherwise(F.lit(0))).over(w_ord),
    )
    w_seg = Window.partitionBy(*series_cols, "_ac_seg").orderBy(ts_col, "_ac_raw")
    d = d.withColumn(
        "adjusted_value", F.col("_ac_raw") - F.first("_ac_raw").over(w_seg)
    ).withColumn("start_ts", F.first(ts_col).over(w_seg))
    return d.filter(~F.col("_ac_start")).drop("_ac_raw", "_ac_start", "_ac_seg")
