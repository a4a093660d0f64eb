"""Batch table sources.

The reference's receivers are network servers (receiver/otlpreceiver,
receiver/fluentforwardreceiver); in the batch-table world the source is
a columnar table scan — ``spark.read.parquet`` (or Iceberg when its
runtime jar is on the classpath). Filters/projections applied after
these readers push down into the scan (verify via
``df.explain`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_transcripts(
    spark: SparkSession, path: str | None = None, n_convs: int = 100, seed: int = 42
) -> DataFrame:
    """Transcript source: parquet path if given, else the deterministic
    in-repo generator (FIXTURES.md §1)."""
    if path and os.path.exists(path):
        return spark.read.parquet(path)
    from ..datagen import make_transcripts_df

    return make_transcripts_df(spark, n_convs=n_convs, seed=seed)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False
