"""Prometheus exposition-format text ↔ datapoint rows.

The reference's prometheus pair is two components: a pull SCRAPE loop
(receiver/prometheusreceiver — embeds the Prometheus scrape manager)
and an HTTP expose server (exporter/prometheusexporter). The network
machinery is runtime, not data processing (SURVEY §2.1/§2.7 keeps it
out of scope); this module implements the DATA half — the exposition
text format translation both directions — with the reference's
translation rules:

* family resolution + suffix trimming (``_bucket``/``_count``/``_sum``)
  — receiver/prometheusreceiver/internal/metricsbuilder.go:33-41,193-200
* type mapping: counter → CUMULATIVE double ("always use float64, as
  it's the internal data type used in prometheus"), gauge AND
  untyped/unknown → gauge double, histogram → cumulative distribution,
  summary → summary — metricsbuilder.go:222-246
* useless-label filtering (``job``/``instance``/``__name__``/…;
  ``le`` only on distributions, ``quantile`` only on summaries) —
  metricsbuilder.go:161-178
* boundary extraction from ``le``/``quantile`` —
  metricsbuilder.go:203-220
* non-scalar families that the flat datapoint schema cannot carry are
  counted, not silently mangled (the receiver's droppedTimeseries
  accounting — metricfamily.go:71,161).

Everything is pure Catalyst expression (whole-stage codegen; no
Python). Label-value unescaping uses the split-on-``\\`` trick so the
three exposition escapes (``\\``, ``\"``, ``\n``) decode correctly in
one pass of chained replaces — the same construction is expressible in
ANSI SQL, which keeps the wire DuckDB-oracle-able.

LOSSY by the wire's own data model, mirrored in the oracle rather than
hidden: metric names are sanitized (``[^a-zA-Z0-9_:]`` → ``_``),
integer samples come back as doubles (the float64 rule above),
timestamps are milliseconds, and DELTA temporality has no exposition
representation (samples are cumulative-or-instant) so DELTA rows are
dropped on encode — exactly as the OC arm drops them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# prometheus/common/model label names the receiver never forwards
# (metricsbuilder.go:161-178): scrape bookkeeping, not dimensions
_USELESS_LABELS = ("__name__", "job", "instance", "__scheme__", "__metrics_path__")

_TRIMMABLE = ("_bucket", "_count", "_sum")  # metricsbuilder.go:41

# exposition sample line: name, optional {labels}, value, optional ms
# timestamp. Histogram/summary component samples reuse the same shape.
_SAMPLE_RE = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
# one label pair; value is any run of non-quote chars or escapes, so
# embedded commas / braces never confuse the pair scan
_LABEL_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'
_TYPE_RE = r"(?m)^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*) ([a-z]+)$"


def sanitize_metric_name(col: Column) -> Column:
    """Prometheus data-model name charset: every other char → '_'."""
    return F.regexp_replace(col, "[^a-zA-Z0-9_:]", "_")


def escape_label_value(col: Column) -> Column:
    """Exposition escapes, backslash FIRST so later escapes are not
    re-escaped: ``\\`` then ``"`` then newline."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    return F.replace(out, F.lit("\n"), F.lit("\\n"))


def unescape_label_value(col: Column) -> Column:
    """Inverse of ``escape_label_value``. A chained replace is WRONG
    here (``\\\\n`` must decode to backslash+n, not newline): split on
    the escaped backslash first, decode the simple escapes inside each
    segment, rejoin with a literal backslash — one pass, order-proof."""
    return F.array_join(
        F.transform(
            F.split(col, r"\\\\", -1),
            lambda seg: F.replace(
                F.replace(seg, F.lit('\\"'), F.lit('"')),
                F.lit("\\n"),
                F.lit("\n"),
            ),
        ),
        "\\",
    )


def _render_double(col: Column) -> Column:
    """Deterministic float rendering both engines reproduce: fixed
    6-decimal then trailing-zero trim (datapoint doubles are
    round(v, 6) by module convention, so nothing is lost; any engine
    parses the decimal back to the identical double). Non-finite
    values use the exposition spellings."""
    fixed = F.format_string("%.6f", col)
    trimmed = F.rtrim(F.rtrim(fixed, F.lit("0")), F.lit("."))
    return (
        F.when(F.isnan(col), F.lit("NaN"))
        .when(col == F.lit(float("inf")), F.lit("+Inf"))
        .when(col == F.lit(float("-inf")), F.lit("-Inf"))
        .otherwise(trimmed)
    )


def _parse_double(col: Column) -> Column:
    """Exposition float literal → double (``+Inf``/``-Inf``/``NaN``
    spellings included; try_cast keeps a malformed sample a null, the
    scrape-parser's drop semantics, instead of an ANSI error)."""
    return (
        F.when(col == "+Inf", F.lit(float("inf")))
        .when(col == "Inf", F.lit(float("inf")))
        .when(col == "-Inf", F.lit(float("-inf")))
        .otherwise(col.try_cast("double"))
    )


def metrics_to_prom_text(
    df: DataFrame, label_keys: Sequence[str] = ("m",)
) -> DataFrame:
    """Datapoint rows → one exposition page per metric family
    (``family``, ``text``). Scalar families only — cumulative sums
    become ``counter`` samples, gauges become ``gauge`` samples; DELTA
    rows are dropped (no exposition representation; same policy as the
    OC arm, metricfamily.go:161 isCumulativeType). Sample lines are
    sorted (labels, ts, value) so the page is deterministic. Values
    render via the float64 rule — integer datapoints become float
    samples, which is exactly what a real scrape would hand back."""
    dt = F.col("data_type")
    is_sum = dt.isin("IntSum", "DoubleSum")
    is_gauge = dt.isin("IntGauge", "DoubleGauge")
    keep = (is_sum & (F.col("temporality") == "CUMULATIVE")) | is_gauge
    val = F.coalesce(
        F.col("double_value"), F.col("int_value").cast("double")
    )
    # a label absent from a row's map is an absent pair, not an empty
    # one: concat_ws skips the nulled-out entries
    labels_txt = F.concat_ws(
        ",",
        *[
            F.when(
                F.map_contains_key(F.col("labels"), F.lit(k)),
                F.concat(
                    F.lit(k + '="'),
                    escape_label_value(F.element_at(F.col("labels"), k)),
                    F.lit('"'),
                ),
            )
            for k in label_keys
        ],
    )
    line = F.concat(
        sanitize_metric_name(F.col("name")),
        F.lit("{"),
        labels_txt,
        F.lit("} "),
        _render_double(val),
        F.lit(" "),
        F.unix_millis(F.col("ts").cast("timestamp")).cast("string"),
    )
    fam = sanitize_metric_name(F.col("name"))
    ptype = F.when(is_sum, F.lit("counter")).otherwise(F.lit("gauge"))
    return (
        df.filter(keep)
        .select(fam.alias("family"), ptype.alias("ptype"), line.alias("line"))
        .groupBy("family", "ptype")
        .agg(F.array_sort(F.collect_list("line")).alias("lines"))
        .select(
            "family",
            F.concat(
                F.lit("# TYPE "),
                F.col("family"),
                F.lit(" "),
                F.col("ptype"),
                F.lit("\n"),
                F.array_join("lines", "\n"),
                F.lit("\n"),
            ).alias("text"),
        )
    )


def prom_text_to_samples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exposition page(s) → one row per sample: ``family`` (suffix
    trimmed when the page's TYPE metadata says the raw name is a
    histogram/summary component — metricsbuilder.go:193-200),
    ``metric_name`` (raw), ``family_type`` (from ``# TYPE``, 'unknown'
    when absent — the receiver's MetricTypeUnknown default), ``labels``
    (useless labels dropped; ``le``/``quantile`` lifted out as
    ``boundary`` on distribution/summary components), ``value``,
    ``ts_ms`` (null when the sample carries no timestamp)."""
    types = F.map_from_arrays(
        F.regexp_extract_all(F.col(text_col), F.lit(_TYPE_RE), 1),
        F.regexp_extract_all(F.col(text_col), F.lit(_TYPE_RE), 2),
    )
    parsed = (
        df.select(types.alias("_types"), F.explode(F.split(text_col, "\n")).alias("_l"))
        .filter((F.length("_l") > 0) & ~F.col("_l").startswith("#"))
        .select(
            "_types",
            F.regexp_extract("_l", _SAMPLE_RE, 1).alias("metric_name"),
            F.regexp_extract("_l", _SAMPLE_RE, 2).alias("_blob"),
            F.regexp_extract("_l", _SAMPLE_RE, 3).alias("_val"),
            F.regexp_extract("_l", _SAMPLE_RE, 4).alias("_ts"),
        )
        .filter(F.col("metric_name") != "")
    )
    # family resolution: exact TYPE entry wins; else a trimmable
    # suffix whose trimmed name has a distribution/summary TYPE entry
    # folds the component sample into that family
    name = F.col("metric_name")
    fam = F.when(F.map_contains_key("_types", name), name)
    for suf in _TRIMMABLE:
        trimmed = F.expr(
            f"CASE WHEN endswith(metric_name, '{suf}') AND length(metric_name) >"
            f" {len(suf)} THEN left(metric_name, length(metric_name) - {len(suf)})"
            " END"
        )
        fam = fam.when(
            trimmed.isNotNull()
            & F.element_at("_types", trimmed).isin("histogram", "summary"),
            trimmed,
        )
    fam = fam.otherwise(name)
    ftype = F.coalesce(F.element_at("_types", fam), F.lit("unknown"))
    raw_labels = F.map_from_arrays(
        F.regexp_extract_all("_blob", F.lit(_LABEL_RE), 1),
        F.transform(
            F.regexp_extract_all("_blob", F.lit(_LABEL_RE), 2),
            unescape_label_value,
        ),
    )
    is_bucket = (ftype == "histogram") & name.endswith("_bucket")
    is_quant = (
        (ftype == "summary")
        & ~name.endswith("_sum")
        & ~name.endswith("_count")
    )
    boundary = F.when(
        is_bucket, _parse_double(F.element_at(raw_labels, "le"))
    ).when(is_quant, _parse_double(F.element_at(raw_labels, "quantile")))
    useful = F.map_filter(
        raw_labels,
        lambda k, _v: ~k.isin(*_USELESS_LABELS)
        & ~(k == F.lit("le"))  # only distribution components carry le
        & ~(k == F.lit("quantile")),
    )
    return parsed.select(
        fam.alias("family"),
        "metric_name",
        ftype.alias("family_type"),
        useful.alias("labels"),
        boundary.alias("boundary"),
        _parse_double(F.col("_val")).alias("value"),
        F.nullif("_ts", F.lit("")).try_cast("long").alias("ts_ms"),
    )


def prom_text_to_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exposition page(s) → scalar datapoint rows (the receiver
    direction for the families the flat datapoint schema carries):
    counter → DoubleSum CUMULATIVE, gauge/unknown → DoubleGauge
    UNSPECIFIED (metricsbuilder.go:222-246 — always double).
    Histogram/summary families are excluded here; count them from
    ``prom_text_to_samples`` (the droppedTimeseries analog) rather
    than mangling them into scalars."""
    s = prom_text_to_samples(df, text_col)
    scalar = s.filter(F.col("family_type").isin("counter", "gauge", "unknown"))
    is_counter = F.col("family_type") == "counter"
    return scalar.select(
        F.col("family").alias("name"),
        F.when(is_counter, F.lit("DoubleSum"))
        .otherwise(F.lit("DoubleGauge"))
        .alias("data_type"),
        F.when(is_counter, F.lit("CUMULATIVE"))
        .otherwise(F.lit("UNSPECIFIED"))
        .alias("temporality"),
        "labels",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        F.lit(None).cast("long").alias("int_value"),
        F.col("value").alias("double_value"),
    )
