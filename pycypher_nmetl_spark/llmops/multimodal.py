"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batching, partition-aware UDF
signatures) is real and tested; the codec calls themselves are STUBBED
(`decode_image`/`decode_audio` raise NotImplementedError unless a
deterministic fake is requested) because no image/audio libraries exist
in this container. Swapping in PIL/librosa/etc. is a one-function
change per modality.

Scale notes: mapInPandas streams Arrow batches — memory use is bounded
by `spark.sql.execution.arrow.maxRecordsPerBatch` regardless of blob
size skew; repartition by a size-bucket column first when blob sizes
are heavily skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB: returns (width, height). Real impl would use PIL/cv2."""
    if fake:
        # deterministic fake so the pipeline shape is testable
        return (len(content) % 640 + 1, len(content) % 480 + 1)
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; pass fake=True for the deterministic test decoder"
    )


def decode_audio(content: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB: returns (duration_ms, sample_rate)."""
    if fake:
        return (len(content) * 10, 16_000)
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; pass fake=True for the deterministic test decoder"
    )


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media df -> per-image features via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            dims = pdf["content"].map(lambda c: decode_image(bytes(c), fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(
                        lambda c: hashlib.md5(bytes(c)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            meta = pdf["content"].map(lambda c: decode_audio(bytes(c), fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": meta.map(lambda d: d[0]).astype("int64"),
                    "sample_rate": meta.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(
                        lambda c: hashlib.md5(bytes(c)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to extract — pure JVM expansion; the decode itself is the stubbed
    modality above. Bounded by max_frames per video."""
    dur = F.coalesce(
        F.element_at(F.col("meta"), F.lit("duration_ms")).cast("long"),
        F.lit(0),
    )
    n = F.least((dur / every_ms).cast("long") + 1, F.lit(max_frames))
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


def exact_binary_dedup(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact dedup of binary blobs by 64-bit + md5 double hash (JVM-side:
    no bytes cross into Python)."""
    return (
        df.withColumn("_h", F.xxhash64(F.col(content_col)))
        .withColumn("_m", F.md5(F.col(content_col)))
        .dropDuplicates(["_h", "_m"])
        .drop("_h", "_m")
    )
