"""Sink layer: snapshot-versioned table writes with per-partition
lineage, obsreport-style metrics, and idempotent resume."""

from .warehouse import Warehouse, SinkResult, run_and_write
from .logging_exporter import (
    logging_exporter,
    format_spans_debug,
    format_logs_debug,
    format_metrics_debug,
    go_time_string,
)

__all__ = [
    "Warehouse",
    "SinkResult",
    "run_and_write",
    "logging_exporter",
    "format_spans_debug",
    "format_logs_debug",
    "format_metrics_debug",
    "go_time_string",
]
