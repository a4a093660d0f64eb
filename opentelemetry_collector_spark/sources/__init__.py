from .tables import read_table, read_transcripts, TABLES

__all__ = ["read_table", "read_transcripts", "TABLES"]
