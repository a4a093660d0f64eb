"""loggingexporter: the debug sink that renders pdata items into the
collector's human-readable text blocks.

Reference: exporter/loggingexporter/logging_exporter.go — the Go
exporter drops the data and (a) logs an info line with the item count
(logging_exporter.go:313,457), (b) at level=debug renders every item
into an indented text buffer (logDataBuffer, logging_exporter.go:33-63).

Spark-first re-expression: rendering one driver-side string for a
100 TB batch is anti-scale, so the debug buffer becomes a DataFrame of
per-item text blocks (one row per span / log record), all formatting in
Catalyst string expressions (format_string/rpad/concat_ws — zero Python
in the hot path). Two deliberate canonicalizations, both documented
because Go leaves them nondeterministic:

- item numbering ("Span #k") is per-trace in turn order (Go numbers
  within whatever batch arrived);
- attribute lines render in sorted-key order (Go map iteration order is
  random per run).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Status_StatusCode names (trace.pb.go:169-173) — the exporter prints
# span.Status().Code().String() (logging_exporter.go:343); values
# outside the named range print as their decimal number (proto enum
# String() fallback).
_STATUS_CODE_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK", 2: "STATUS_CODE_ERROR"}

# Span_SpanKind names (trace.pb.go:59-66) keyed by the repo's internal
# kind strings (operators/traces.SPAN_KIND_BY_ROLE domain).
_SPAN_KIND_NAMES = {
    "UNSPECIFIED": "SPAN_KIND_UNSPECIFIED",
    "INTERNAL": "SPAN_KIND_INTERNAL",
    "SERVER": "SPAN_KIND_SERVER",
    "CLIENT": "SPAN_KIND_CLIENT",
    "PRODUCER": "SPAN_KIND_PRODUCER",
    "CONSUMER": "SPAN_KIND_CONSUMER",
}


def _enum_name(col: Column, names: dict) -> Column:
    out = col.cast("string")  # proto String() fallback: the number
    for v, name in names.items():
        out = F.when(col == v, F.lit(name)).otherwise(out)
    return out


def _log_attr(label: str, value: Column) -> Column:
    """One `logAttr` line (logging_exporter.go:42-44):
    ``    %-15s: %s`` — 4-space indent, label padded to 15."""
    return F.concat(F.lit("    " + label.ljust(15) + ": "), F.coalesce(value, F.lit("")))


def go_time_string(ts: Column) -> Column:
    """``time.Unix(0, ns).String()`` under the session's pinned-UTC
    zone (pdata/common.go:31-33): ``2006-01-02 15:04:05.999999999
    +0000 UTC`` with the fractional part trailing-zero-trimmed and
    omitted when zero."""
    micros = F.unix_micros(ts.cast("timestamp")) % 1_000_000
    frac = F.regexp_replace(F.lpad(micros.cast("string"), 6, "0"), "0+$", "")
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
        F.when(frac != "", F.concat(F.lit("."), frac)).otherwise(F.lit("")),
        F.lit(" +0000 UTC"),
    )


def _attr_map_block(label: str, attrs: Column) -> Column:
    """``logAttributeMap`` (logging_exporter.go:46-55): empty map
    renders nothing; otherwise a ``label:`` header plus one
    ``     -> k: STRING(v)`` line per entry. The repo's attribute
    model coerces every value to string on ingest (operators/
    attributes.py Go-parity coercion), so the type tag is always
    STRING, exactly what the Go exporter would print for those pdata
    values. Entries render in sorted-key order (canonical; Go map
    order is random)."""
    entries = F.sort_array(F.map_entries(attrs))
    lines = F.transform(
        entries,
        lambda e: F.format_string("     -> %s: STRING(%s)", e["key"], e["value"]),
    )
    return F.when(
        F.size(entries) > 0,
        F.concat(F.lit(f"\n{label}:\n"), F.array_join(lines, "\n")),
    ).otherwise(F.lit(""))


def format_spans_debug(spans: DataFrame) -> DataFrame:
    """Per-span debug block (pushTraceData, logging_exporter.go:
    319-349): ``Span #k`` then the nine logAttr lines. Trace ids
    hexify as md5(trace_id) — the same 16-byte derivation the Jaeger/
    Zipkin encoders use (sources/jaeger_json.py:73) — span ids are
    already 16-hex; a root's absent parent prints "" (HexString of an
    empty SpanID). Status message is "" (the span model carries no
    message; Go prints the empty string for unset)."""
    w = Window.partitionBy("trace_id").orderBy("turn_idx")
    attrs = "attrs" in spans.columns
    block = F.concat_ws(
        "\n",
        F.format_string("Span #%d", F.row_number().over(w) - 1),
        _log_attr("Trace ID", F.md5(F.col("trace_id"))),
        _log_attr("Parent ID", F.col("parent_span_id")),
        _log_attr("ID", F.col("span_id")),
        _log_attr("Name", F.col("name")),
        _log_attr("Kind", _span_kind_name(F.col("kind"))),
        _log_attr("Start time", go_time_string(F.col("start_ts"))),
        _log_attr("End time", go_time_string(F.col("end_ts"))),
        _log_attr("Status code", _enum_name(F.col("status_code"), _STATUS_CODE_NAMES)),
        _log_attr("Status message", F.lit("")),
    )
    if attrs:
        block = F.concat(block, _attr_map_block("Attributes", F.col("attrs")))
    return spans.select("trace_id", "span_id", block.alias("debug"))


def _span_kind_name(kind: Column) -> Column:
    out = F.lit("SPAN_KIND_UNSPECIFIED")
    for internal, name in _SPAN_KIND_NAMES.items():
        out = F.when(kind == internal, F.lit(name)).otherwise(out)
    return out


def format_logs_debug(
    parsed: DataFrame,
    body_col: str = "text",
    name_col: str = "component",
    severity_col: str = "level",
    ts_col: str = "ts",
    attr_cols: tuple = ("component", "duration_ms", "role"),
) -> DataFrame:
    """Per-record debug block (pushLogData → logLogRecord,
    logging_exporter.go:216-222,476-480): ``LogRecord #k`` then
    unindented ``Timestamp: <ns>`` (TimestampUnixNano printed with %d
    — the raw nanos, not a date), ``Severity``, ``ShortName``,
    ``Body`` and the attribute map built from the parse stage's
    extracted fields."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    attrs = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in attr_cols]),
            F.array(*[F.col(c).cast("string") for c in attr_cols]),
        ),
        lambda _k, v: v.isNotNull(),
    )
    block = F.concat(
        F.concat_ws(
            "\n",
            F.format_string("LogRecord #%d", F.row_number().over(w) - 1),
            F.format_string("Timestamp: %d", F.unix_micros(F.col(ts_col).cast("timestamp")) * 1000),
            F.format_string("Severity: %s", F.coalesce(F.upper(F.col(severity_col)), F.lit(""))),
            F.format_string("ShortName: %s", F.coalesce(F.col(name_col), F.lit(""))),
            F.format_string("Body: %s", F.coalesce(F.col(body_col), F.lit(""))),
        ),
        _attr_map_block("Attributes", attrs),
    )
    return parsed.select(
        F.col("conv_id"), F.col("turn_idx"), block.alias("debug")
    )


def format_metrics_debug(dps: DataFrame, point_order: Column | None = None) -> DataFrame:
    """Per-datapoint debug block (pushMetricsData, logging_exporter.go:
    367-390 → logMetricDescriptor:75-81, logMetricDataPoints:83-113,
    logIntDataPoints/logDoubleDataPoints:115-137).

    The Go buffer interleaves one ``Metric #k / Descriptor:`` header
    before each metric's points; here the header renders on the FIRST
    datapoint row of each metric (the full buffer is the dp_idx-ordered
    concatenation), keeping row-per-datapoint granularity — a metric
    with 10^9 points must not become one driver-sized string.

    Covers the gauge and sum types of the flat datapoint model
    (operators/metrics.DATAPOINT_SCHEMA); histograms/summaries carry
    bounds/quantiles the flat model doesn't, so they are rejected
    loudly rather than rendered wrong. Description/Unit/StartTime are
    absent from the model and render as their Go zero values (empty /
    0); IsMonotonic likewise renders the bool zero value ``false``.

    ``point_order``: total-order tiebreak column(s) within a metric
    (defaults to ts — pass something unique when timestamps can
    collide, or the #i numbering is nondeterministic)."""
    sums = ("IntSum", "DoubleSum")
    supported = ("IntGauge", "DoubleGauge") + sums

    # Metric #k: dense rank over the (low-cardinality) distinct metric
    # names — ranked on the tiny distinct frame and broadcast back,
    # never a global window over the datapoint table
    names = dps.select("name", "data_type", "temporality").distinct()
    # dense_rank by name (not row_number): if one name ever carries two
    # data_type/temporality combos, both get the SAME deterministic
    # index — matching the oracle's dense_rank-by-name numbering —
    # instead of arbitrary tie-broken distinct indices
    w_names = Window.orderBy("name")
    names = names.withColumn("_metric_idx", F.dense_rank().over(w_names) - 1)

    order = [F.col("ts")] + ([point_order] if point_order is not None else [])
    w_dp = Window.partitionBy("name").orderBy(*order)

    is_int = F.col("data_type").isin("IntGauge", "IntSum")
    points_label = F.when(is_int, F.lit("IntDataPoints")).otherwise(F.lit("DoubleDataPoints"))
    value = F.when(
        is_int, F.col("int_value").cast("string")
    ).otherwise(F.format_string("%f", F.col("double_value")))

    descriptor = F.concat_ws(
        "\n",
        F.format_string("Metric #%d", F.col("_metric_idx")),
        F.lit("Descriptor:"),
        F.format_string("     -> Name: %s", F.col("name")),
        F.lit("     -> Description: "),
        F.lit("     -> Unit: "),
        F.format_string("     -> DataType: %s", F.col("data_type")),
    )
    sum_lines = F.when(
        F.col("data_type").isin(*sums),
        F.concat(
            F.lit("\n     -> IsMonotonic: false"),
            F.format_string(
                "\n     -> AggregationTemporality: AGGREGATION_TEMPORALITY_%s",
                F.col("temporality"),
            ),
        ),
    ).otherwise(F.lit(""))

    dp_idx = F.row_number().over(w_dp) - 1
    point = F.concat(
        F.concat_ws(
            "\n",
            F.format_string("%s #%d", points_label, dp_idx),
        ),
        _string_map_block("Data point labels", F.col("labels")),
        F.concat_ws(
            "\n",
            F.lit(""),
            F.lit("StartTime: 0"),
            F.format_string(
                "Timestamp: %d", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
            ),
            F.format_string("Value: %s", value),
        ),
    )

    out = (
        dps.join(F.broadcast(names), ["name", "data_type", "temporality"])
        .withColumn("_dp_idx", dp_idx)
        .withColumn(
            "debug",
            F.concat(
                F.when(
                    F.col("_dp_idx") == 0, F.concat(descriptor, sum_lines, F.lit("\n"))
                ).otherwise(F.lit("")),
                point,
            ),
        )
    )
    bad = ~F.col("data_type").isin(*supported)
    out = out.withColumn(
        "debug",
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("format_metrics_debug: unsupported data_type "),
                    F.col("data_type"),
                    F.lit(" (histogram/summary need the tree model)"),
                )
            ),
        ).otherwise(F.col("debug")),
    )
    return out.select("name", F.col("_dp_idx").alias("dp_idx"), "debug")


def _string_map_block(label: str, sm: Column) -> Column:
    """``logStringMap`` (logging_exporter.go:57-66): like the
    attribute map but untyped values (``     -> k: v``); empty map
    renders nothing."""
    entries = F.sort_array(F.map_entries(sm))
    lines = F.transform(
        entries, lambda e: F.format_string("     -> %s: %s", e["key"], e["value"])
    )
    return F.when(
        F.size(entries) > 0,
        F.concat(F.lit(f"\n{label}:\n"), F.array_join(lines, "\n")),
    ).otherwise(F.lit(""))


def logging_exporter(df: DataFrame, signal: str, level: str = "info") -> dict:
    """The exporter surface: drops the data, returns the info line as a
    1-row count frame (``TracesExporter #spans N``; the metrics line
    counts METRICS, not datapoints — MetricCount semantics,
    logging_exporter.go:361), and at level='debug' also the rendered
    per-item blocks (lazy — nothing is collected here)."""
    names = {
        "traces": ("TracesExporter", "#spans"),
        "logs": ("LogsExporter", "#logs"),
        "metrics": ("MetricsExporter", "#metrics"),
    }
    if signal not in names:
        raise ValueError(f"unknown signal {signal!r}")
    exporter, counter = names[signal]
    n = F.count_distinct(F.col("name")) if signal == "metrics" else F.count(F.lit(1))
    summary = df.agg(
        F.lit(exporter).alias("exporter"),
        F.lit(counter).alias("counter"),
        n.alias("n"),
    )
    debug = None
    if level.lower() == "debug":
        debug = {
            "traces": format_spans_debug,
            "logs": format_logs_debug,
            "metrics": format_metrics_debug,
        }[signal](df)
    return {"summary": summary, "debug": debug}
