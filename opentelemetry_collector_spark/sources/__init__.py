from .tables import read_table, read_transcripts, TABLES
from .otlp_json import logs_to_otlp_json, logs_from_otlp_json

__all__ = [
    "read_table",
    "read_transcripts",
    "TABLES",
    "logs_to_otlp_json",
    "logs_from_otlp_json",
]
