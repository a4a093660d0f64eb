"""Shared events→transcripts derivation used by both query
registries (identical SQL in Spark and DuckDB dialects)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import read_table

_TRANSCRIPTS_FROM_EVENTS = """
SELECT
  'conv-' || CAST(user_id AS STRING)                                AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                                                                    AS turn_idx,
  CASE event_type
    WHEN 'click'    THEN 'user'
    WHEN 'view'     THEN 'user'
    WHEN 'purchase' THEN 'assistant'
    WHEN 'signup'   THEN 'system'
    ELSE 'tool' END                                                 AS role,
  '[' || CASE WHEN value < 100 THEN 'info'
              WHEN value < 300 THEN 'warn'
              ELSE 'error' END
      || '] ' || event_type || ': event ' || CAST(event_id AS STRING)
      || ' duration=' || CAST(CAST(floor(value * 10) AS BIGINT) AS STRING)
      || 'ms'                                                       AS text,
  CASE WHEN event_type = 'error'
       THEN CASE WHEN value < 245 THEN 'search' ELSE 'python' END
       END                                                          AS tool,
  ts
FROM events
"""


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "events")
    return spark.sql(_TRANSCRIPTS_FROM_EVENTS)
