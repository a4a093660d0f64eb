"""Structured Streaming surface: the continuous (receiver-shaped)
variant of the batch pipeline."""

from .pipeline import (
    TRANSCRIPT_SCHEMA,
    streaming_dedup,
    streaming_session_counts,
    stream_transcripts,
    streaming_windowed_counts,
    start_routed_stream,
    batch_emitter_state,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "streaming_dedup",
    "streaming_session_counts",
    "stream_transcripts",
    "streaming_windowed_counts",
    "start_routed_stream",
    "batch_emitter_state",
]
