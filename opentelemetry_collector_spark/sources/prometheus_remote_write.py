"""Prometheus remote-write wire: datapoint rows ↔ snappy-framed
protobuf ``WriteRequest`` blobs.

The reference's prometheusremotewriteexporter converts OTLP metrics
into ``prompb.TimeSeries``, marshals a ``WriteRequest`` and ships it
``snappy.Encode``-framed over HTTP (exporter.go:91-176). The HTTP
client machinery is runtime; the WIRE is data processing and is
implemented here with the reference's exact translation rules:

* validateMetrics (helper.go:55-81): sums and histograms must be
  CUMULATIVE to be exportable — DELTA rows are dropped; gauges and
  summaries pass unconditionally.
* getPromMetricName (helper.go:174-213): optional namespace prefix,
  ``_total`` appended to counters UNLESS the name already ends in
  "total", then sanitized.
* sanitize (helper.go:254-271, copied there from
  prometheus-go-metrics-exporter): every non-letter/digit rune → '_'
  (note: stricter than the exposition charset — ':' dies here too),
  names starting with a digit get a ``key_`` prefix, names starting
  with '_' get a ``key`` prefix.
* createLabelSet + timeSeriesSignature (helper.go:106-172): label
  KEYS are sanitized, values pass through verbatim; the series
  signature sorts labels by name; ``__name__`` rides as an internal
  label and keeps its underscores.
* samples are (float64 value, millisecond timestamp) —
  helper.go:246-251 (convertTimeStamp nanos → ms).

prompb field numbers (public prometheus/prompb protos):
``WriteRequest.timeseries = 1``; ``TimeSeries.labels = 1,
.samples = 2``; ``Label.name = 1, .value = 2``; ``Sample.value = 1
(double), .timestamp = 2 (int64)``.

Timeseries within a request are emitted in signature order and
samples in (timestamp, value) order so a request blob is a
deterministic function of its rows — the property every other wire in
this repo keeps for oracle comparability. The wire itself carries NO
metric type (remote write is typeless samples); the decode side
therefore returns samples, and any type reattachment is the
caller's documented inference.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.proto_binary import LEN, Reader, Writer
from ..functions.snappy_block import compress, decompress

_NON_ALNUM = re.compile(r"[^A-Za-z0-9]")


def sanitize(s: str) -> str:
    """helper.go:254-271 parity (incl. the digit/underscore prefixes)."""
    if not s:
        return s
    s = _NON_ALNUM.sub("_", s)
    if s[0].isdigit():
        s = "key_" + s
    if s[0] == "_":
        s = "key" + s
    return s


def prom_metric_name(name: str, is_counter: bool, namespace: str = "") -> str:
    """getPromMetricName parity (helper.go:174-213)."""
    full = f"{namespace}_{name}" if namespace else name
    if is_counter and not name.endswith("total"):
        full = full + "_total"
    return sanitize(full)


# ---------------------------------------------------------------------------
# prompb encode / decode (proto_binary framing)
# ---------------------------------------------------------------------------


def _write_request(series: list[tuple[list[tuple[str, str]], list[tuple[float, int]]]]) -> bytes:
    w = Writer()
    for labels, samples in series:
        ts_w = Writer()
        for k, v in labels:
            lb = Writer()
            lb.string(1, k)
            lb.string(2, v)
            ts_w.message(1, lb, keep_empty=True)
        for value, ts_ms in samples:
            sm = Writer()
            sm.double(1, value)
            sm.int_(2, ts_ms)
            ts_w.message(2, sm, keep_empty=True)
        w.message(1, ts_w, keep_empty=True)
    return bytes(w.out)


def _read_request(buf: bytes) -> list[tuple[list[tuple[str, str]], list[tuple[float, int]]]]:
    out = []
    r = Reader(buf)
    for field, wt in r.fields():
        if field == 1 and wt == LEN:
            ts_r = r.message()
            labels: list[tuple[str, str]] = []
            samples: list[tuple[float, int]] = []
            for f2, wt2 in ts_r.fields():
                if f2 == 1 and wt2 == LEN:
                    lb = ts_r.message()
                    name = value = ""
                    for f3, wt3 in lb.fields():
                        if f3 == 1 and wt3 == LEN:
                            name = lb.string()
                        elif f3 == 2 and wt3 == LEN:
                            value = lb.string()
                        else:
                            lb.skip(wt3)
                    labels.append((name, value))
                elif f2 == 2 and wt2 == LEN:
                    sm = ts_r.message()
                    val, ts_ms = 0.0, 0
                    for f3, wt3 in sm.fields():
                        if f3 == 1 and wt3 == 1:
                            val = sm.double()
                        elif f3 == 2 and wt3 == 0:
                            ts_ms = sm.int64()
                        else:
                            sm.skip(wt3)
                    samples.append((val, ts_ms))
                else:
                    ts_r.skip(wt2)
            out.append((labels, samples))
        else:
            r.skip(wt)
    return out


# ---------------------------------------------------------------------------
# Spark surface (Arrow-batched mapInPandas, like the other wires)
# ---------------------------------------------------------------------------


def metrics_to_remote_write(
    df: DataFrame, label_keys: Sequence[str] = ("m",), namespace: str = ""
) -> DataFrame:
    """Datapoint rows → one snappy(WriteRequest) blob per Arrow batch
    (column ``blob``). Applies validateMetrics (DELTA sums dropped),
    the counter ``_total`` naming, label-key sanitization and sorted
    deterministic series/sample order."""
    # no leading underscores in the flat column names: pandas
    # itertuples silently renames such fields to positional _N
    cols = [
        F.col("name").alias("mname"),
        F.col("data_type").alias("dtype"),
        F.col("temporality").alias("temp"),
        F.coalesce(F.col("double_value"), F.col("int_value").cast("double")).alias(
            "dval"
        ),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tsms"),
    ] + [
        F.element_at(F.col("labels"), k).alias(f"lb{i}")
        for i, k in enumerate(label_keys)
    ]
    flat = df.select(*cols)
    keys = list(label_keys)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            series: dict[tuple, list[tuple[float, int]]] = {}
            for row in pdf.itertuples(index=False):
                is_sum = row.dtype in ("IntSum", "DoubleSum")
                is_hist = row.dtype in ("IntHistogram", "DoubleHistogram")
                if (is_sum or is_hist) and row.temp != "CUMULATIVE":
                    continue  # validateMetrics: non-cumulative dropped
                name = prom_metric_name(row.mname, is_sum, namespace)
                labels = [("__name__", name)] + [
                    (sanitize(k), v)
                    for k, v in zip(keys, row[5:])
                    if v is not None
                ]
                labels.sort()
                ts_ms = 0 if pd.isna(row.tsms) else int(row.tsms)
                series.setdefault(tuple(labels), []).append(
                    (float(row.dval), ts_ms)
                )
            if not series:
                yield pd.DataFrame({"blob": pd.Series([], dtype=object)})
                continue
            req = [
                (list(sig), sorted(samples, key=lambda s: (s[1], s[0])))
                for sig, samples in sorted(series.items())
            ]
            yield pd.DataFrame({"blob": [compress(_write_request(req))]})

    return flat.mapInPandas(encode, schema="blob binary")


def remote_write_to_samples(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """snappy(WriteRequest) blobs → sample rows (``name`` from the
    ``__name__`` label, ``labels`` without it, float64 ``value``,
    ``ts_ms``). The wire is typeless, so this is the complete
    information a remote-write endpoint receives."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, labels_json, values, tss = [], [], [], []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                for labels, samples in _read_request(decompress(bytes(blob))):
                    lm = dict(labels)
                    name = lm.pop("__name__", "")
                    for value, ts_ms in samples:
                        names.append(name)
                        labels_json.append(json.dumps(lm, sort_keys=True))
                        values.append(value)
                        tss.append(ts_ms)
            yield pd.DataFrame(
                {
                    "name": pd.Series(names, dtype=object),
                    "labels_json": pd.Series(labels_json, dtype=object),
                    "value": pd.Series(values, dtype="float64"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                }
            )

    out = df.mapInPandas(
        decode, schema="name string, labels_json string, value double, ts_ms long"
    )
    return out.select(
        "name",
        F.from_json("labels_json", "map<string,string>").alias("labels"),
        "value",
        "ts_ms",
    )
