from .tables import read_table, read_transcripts, TABLES
from .otlp_json import (
    logs_to_otlp_json,
    logs_from_otlp_json,
    spans_to_otlp_json,
    otlp_json_to_spans,
)
from .jaeger_json import spans_to_jaeger_json, jaeger_json_to_spans
from .zipkin_json import spans_to_zipkin_json, zipkin_json_to_spans
from .zipkin_v1_json import spans_to_zipkin_v1_json, zipkin_v1_json_to_spans
from .opencensus_json import (
    spans_to_oc_json,
    oc_json_to_spans,
    metrics_to_oc_json,
    oc_json_to_metrics,
)
from .zipkin_thrift import spans_to_zipkin_thrift, zipkin_thrift_to_spans
from .jaeger_thrift import spans_to_jaeger_thrift, jaeger_thrift_to_spans

__all__ = [
    "read_table",
    "read_transcripts",
    "TABLES",
    "logs_to_otlp_json",
    "logs_from_otlp_json",
    "spans_to_otlp_json",
    "otlp_json_to_spans",
    "spans_to_jaeger_json",
    "jaeger_json_to_spans",
    "spans_to_zipkin_json",
    "zipkin_json_to_spans",
    "spans_to_zipkin_v1_json",
    "zipkin_v1_json_to_spans",
    "spans_to_oc_json",
    "oc_json_to_spans",
    "metrics_to_oc_json",
    "oc_json_to_metrics",
    "spans_to_zipkin_thrift",
    "zipkin_thrift_to_spans",
    "spans_to_jaeger_thrift",
    "jaeger_thrift_to_spans",
]
