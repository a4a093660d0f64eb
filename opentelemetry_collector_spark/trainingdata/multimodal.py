"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The real codec step (JPEG decode, audio resample, video frame decode)
is STUBBED — the image/audio libraries are not in this container —
behind ``decode_media``, which raises ``NotImplementedError`` unless a
deterministic fake codec is requested. Everything around the stub is
real and tested: the schema, the Arrow batch shape, the partitioning,
byte-level feature extraction, and frame sampling all run exactly as
they would with a real codec plugged in.

Scale design: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches executor-side, and feature extraction emits only
small fixed-width vectors so the shuffle after extraction carries
features, not media bytes. Partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` exactly as for any binary-heavy
table (Spark's own `binaryFile` source uses the same shape:
path/metadata columns + one binary content column)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURE_BINS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_KINDS = ["image", "audio", "video"]


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text table: payload =
    UTF-8 bytes of the text (stands in for encoded media), kind cycles
    by id, metadata derived from payload length. Pure JVM expressions."""
    n = F.length(F.col(text_col))
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (n % 64 + 1).cast("int").alias("width"),
            (n % 48 + 1).cast("int").alias("height"),
            (n % 16 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("feature_norm", T.DoubleType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-histogram feature extraction over Arrow batches: 16-bin
    histogram of ``byte % 16``, L1-normalized — the deterministic
    stand-in for an image/audio embedding model, with the exact
    mapInPandas plumbing a real model would use (numpy over the whole
    batch, no per-row Python loops)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = np.zeros((len(pdf), N_FEATURE_BINS), dtype=np.float64)
            lens = np.zeros(len(pdf), dtype=np.int64)
            for i, buf in enumerate(payloads):  # per-doc; histogram itself is vectorized
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                lens[i] = arr.size
                if arr.size:
                    feats[i] = np.bincount(arr % N_FEATURE_BINS, minlength=N_FEATURE_BINS)
            totals = feats.sum(axis=1, keepdims=True)
            np.divide(feats, totals, out=feats, where=totals > 0)
            feats = feats.round(6)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "features": list(feats),
                    "feature_norm": np.sqrt((feats**2).sum(axis=1)).round(6),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def decode_media(df: DataFrame, codec: str = "real") -> DataFrame:
    """Decode payloads to raw pixel/sample arrays.

    codec='real' raises NotImplementedError (no PIL/ffmpeg in this
    container — plug the real decoder into the same mapInPandas slot).
    codec='fake' decodes deterministically: byte i → double i-th byte
    value / 255, truncated to width*height."""
    if codec == "real":
        raise NotImplementedError(
            "real media codecs (PIL/soundfile/ffmpeg) are not available in "
            "this environment; use codec='fake' for the deterministic stub"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("pixels", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_px = []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64) / 255.0
                limit = int(meta["width"]) * int(meta["height"])
                out_px.append(arr[:limit].round(6))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "pixels": out_px}
            )

    return df.mapInPandas(batches, schema)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling: split the payload into ``n_frames`` equal
    chunks and keep every n-th — pure JVM byte slicing (substring on
    binary), one output row per kept frame via posexplode."""
    n_frames = F.col("meta.n_frames")
    frame_len = F.greatest(
        (F.length("payload") / n_frames).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(F.col("payload"), (i * frame_len + 1).cast("int"), frame_len),
    )
    sampled = F.filter(
        F.transform(frames, lambda fr, i: F.struct(i.alias("frame_idx"), fr.alias("frame"))),
        lambda s: s["frame_idx"] % every_n == 0,
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(sampled).alias("s"))
        .select(
            "media_id",
            F.col("s.frame_idx").alias("frame_idx"),
            F.col("s.frame").alias("frame"),
            F.length(F.col("s.frame")).cast("long").alias("frame_bytes"),
        )
        .filter(F.col("frame_bytes") > 0)  # integer chunking can leave empty tails
    )
