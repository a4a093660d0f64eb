"""Sink layer: snapshot-versioned table writes with per-partition
lineage, obsreport-style metrics, and idempotent resume."""

from .warehouse import Warehouse, SinkResult, run_and_write

__all__ = ["Warehouse", "SinkResult", "run_and_write"]
