"""Kafka source/sink plumbing (kafkareceiver / kafkaexporter,
receiver/kafkareceiver/kafka_receiver.go:151-176,
exporter/kafkaexporter/kafka_exporter.go:39-106).

The option-building is pure and unit-tested; the actual readStream/
writeStream calls require the spark-sql-kafka package on the
classpath and a broker, so they raise a clear error when the
integration is absent (the same config-time failure the reference
gives on an unreachable broker). Payloads ride the OTLP-JSON
translation (sources/otlp_json.py) — the value column is one
protobuf-JSON request per record, keyed by the resource group so a
partition-keyed topic preserves per-conversation ordering, exactly
the traceID-keyed topic layout the reference's docs recommend for
scale-out (docs/performance.md:67-73)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaConfig:
    brokers: list[str]
    topic: str
    group_id: str = "otelcol_spark"
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.brokers:
            raise ValueError("at least one broker is required")
        if not self.topic:
            raise ValueError("topic is required")


def kafka_source_options(cfg: KafkaConfig) -> dict[str, str]:
    """readStream options (pure; unit-tested)."""
    opts = {
        "kafka.bootstrap.servers": ",".join(cfg.brokers),
        "subscribe": cfg.topic,
        "startingOffsets": cfg.starting_offsets,
        "kafka.group.id": cfg.group_id,
    }
    if cfg.max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    opts.update({k: str(v) for k, v in cfg.extra.items()})
    return opts


def kafka_sink_options(cfg: KafkaConfig) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": ",".join(cfg.brokers),
        "topic": cfg.topic,
    }
    opts.update({k: str(v) for k, v in cfg.extra.items()})
    return opts


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_transcripts(spark: SparkSession, cfg: KafkaConfig) -> DataFrame:
    """Streaming source: Kafka records → flat transcript rows via the
    OTLP-JSON translation."""
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka is not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    from ..sources.otlp_json import logs_from_otlp_json

    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(cfg))
        .load()
        .select(F.col("value").cast("string").alias("otlp"))
    )
    return logs_from_otlp_json(raw)


def write_kafka_transcripts(df: DataFrame, cfg: KafkaConfig, checkpoint_dir: str):
    """Streaming sink: flat rows → one OTLP-JSON record per resource
    group, keyed by conv_id for partition-ordered consumption."""
    if not kafka_available(df.sparkSession):
        raise RuntimeError(
            "spark-sql-kafka is not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    from ..sources.otlp_json import logs_to_otlp_json

    payload = logs_to_otlp_json(df).select(
        F.col("conv_id").cast("string").alias("key"),
        F.col("otlp").alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .options(**kafka_sink_options(cfg))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
