"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decoders are REAL for the common container formats and need no
external libraries: image dimensions are parsed straight from the
PNG / JPEG / GIF / BMP headers, audio duration/sample-rate via the
stdlib `wave` module. PIL is used as an import-gated fallback for
formats the header parser doesn't know; a deterministic fake decoder
remains available (fake=True) for pipeline-shape tests.

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


def _parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) straight from the container header — no imaging
    library needed for PNG / GIF / BMP / JPEG. None = unknown format."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandated to be the first chunk: bytes 16..24
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 26 and b[:2] == b"BM":
        return (
            int.from_bytes(b[18:22], "little", signed=True),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: walk to a SOF marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(b[i + 7:i + 9], "big"),
                    int.from_bytes(b[i + 5:i + 7], "big"),
                )
            i += 2 + seglen
    return None


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """(width, height). Header parse for PNG/JPEG/GIF/BMP; PIL fallback
    for other formats when installed; deterministic fake on request."""
    if fake:
        # deterministic fake so the pipeline shape is testable
        return (len(content) % 640 + 1, len(content) % 480 + 1)
    dims = _parse_image_dims(bytes(content))
    if dims is not None:
        return dims
    try:  # import-gated: PIL is not in the base environment
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        raise NotImplementedError(
            "unrecognized image format (not PNG/JPEG/GIF/BMP) and PIL is "
            "not installed; pass fake=True for the deterministic test "
            "decoder"
        ) from None
    with Image.open(io.BytesIO(bytes(content))) as img:
        return img.size


def decode_audio(content: bytes, fake: bool = False) -> tuple[int, int]:
    """(duration_ms, sample_rate). Real WAV parse via the stdlib `wave`
    module; deterministic fake on request."""
    if fake:
        return (len(content) * 10, 16_000)
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(content))) as w:
            sr = w.getframerate()
            frames = w.getnframes()
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"only WAV audio is decodable without external libraries "
            f"({e}); pass fake=True for the deterministic test decoder"
        ) from None
    if sr <= 0:
        raise ValueError("WAV header reports a non-positive sample rate")
    return (frames * 1000 // sr, sr)


# ------------------------------------------------------------------ #
# deterministic synthetic media (tests + differential-gate oracle)
# ------------------------------------------------------------------ #
def synth_png(w: int, h: int) -> bytes:
    """Minimal valid PNG (signature + IHDR + empty IDAT + IEND)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (h * (w + 1)))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def synth_gif(w: int, h: int) -> bytes:
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00\x00\x00\x3b"
    )


def synth_bmp(w: int, h: int) -> bytes:
    import struct

    row = (w * 3 + 3) & ~3
    size = 54 + row * h
    return (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 0, 0, 0, 0)
        + b"\x00" * (row * h)
    )


def synth_jpeg(w: int, h: int) -> bytes:
    import struct

    sof0 = struct.pack(">HBHHB", 8, 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"                              # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + b"\x00\x01\x00\x01\x00\x00"            # APP0
        + b"\xff\xc0" + sof0                     # SOF0 with dimensions
        + b"\xff\xd9"                            # EOI
    )


def synth_wav(n_frames: int, sample_rate: int = 16_000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media df -> per-image features via Arrow-batched mapInPandas.

    The kind filter and a (media_id, content) projection run JVM-side,
    *below* the Python boundary: only image rows' bytes cross into
    Arrow, and the filter/pruning reach the source scan (mapInPandas is
    opaque to Catalyst, so without the explicit select every column of
    every row — audio payloads included — would be read and shipped).
    """
    src = df.filter(F.col("kind") == "image").select("media_id", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
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

    return src.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media df -> per-audio features; same JVM-side prefilter as
    extract_image_features (only audio rows' bytes reach Python)."""
    src = df.filter(F.col("kind") == "audio").select("media_id", "content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
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

    return src.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


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
