"""Multimodal column plumbing (driver north star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image/audio libraries, so the *decode kernel* is a
deterministic fake behind ``decode_image_stub`` (a real pillow/ffmpeg kernel
drops into the same seam — see ``REAL_DECODER_NOTE``).  Everything
Spark-side is real and tested: schema contract, binary encoding, Arrow batch
shape, partition-parallel execution, feature extraction plumbing.

Scale posture: binary payloads never pass through Python row-at-a-time —
``mapInPandas`` moves Arrow record batches; per-partition batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REAL_DECODER_NOTE = (
    "Swap decode_image_stub for a pillow/torchvision kernel: same signature, "
    "bytes -> (width, height, channels, features)."
)

#: Output contract of the image feature extractor.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_fake_image(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary 'image' column (deterministic fake:
    utf-8 payload of the text) plus typed metadata — the storage contract."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("image_bytes"),
        F.lit("image/fake").alias("content_type"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decoder: derives (width, height, channels,
    mean_intensity) from the payload bytes.  A real decoder is not available
    in this environment; raise for non-fake content types upstream."""
    crc = zlib.crc32(payload)
    width = 16 + crc % 240
    height = 16 + (crc >> 8) % 240
    channels = 1 + (crc >> 16) % 4
    mean_intensity = float(sum(payload[:256]) % 256) if payload else 0.0
    return width, height, channels, mean_intensity


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, payload, ctype in zip(
                batch["doc_id"], batch["image_bytes"], batch["content_type"]
            ):
                if ctype != "image/fake":
                    raise NotImplementedError(REAL_DECODER_NOTE)
                payload = bytes(payload)
                w, h, c, mean = decode_image_stub(payload)
                out.append(
                    (doc_id, len(payload), zlib.crc32(payload), w, h, c, mean)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


# -- Resize (image) -----------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("image_bytes", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: cycle the payload to exactly width*height
    bytes (a real pillow ``Image.resize`` kernel drops into this seam)."""
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched resize over the binary image column: bytes in ->
    bytes out, fixed target shape; metadata columns carry the new dims."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, payload, ctype in zip(
                batch["doc_id"], batch["image_bytes"], batch["content_type"]
            ):
                if ctype != "image/fake":
                    raise NotImplementedError(REAL_DECODER_NOTE)
                out.append(
                    (
                        doc_id,
                        width,
                        height,
                        resize_image_stub(bytes(payload), width, height),
                        ctype,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


# -- Audio --------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def attach_fake_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary 'audio' column (deterministic fake: utf-8 payload as
    8-bit mono samples) plus typed metadata — the storage contract."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("audio_bytes"),
        F.lit(16000).alias("sample_rate"),
        F.lit("audio/fake").alias("content_type"),
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction (duration / RMS / zero
    crossings over fake 8-bit centered samples; a real librosa/soundfile
    kernel drops into the same seam)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            out = []
            for doc_id, payload, rate, ctype in zip(
                batch["doc_id"],
                batch["audio_bytes"],
                batch["sample_rate"],
                batch["content_type"],
            ):
                if ctype != "audio/fake":
                    raise NotImplementedError(REAL_DECODER_NOTE)
                samples = np.frombuffer(bytes(payload), dtype="uint8").astype(
                    "float64"
                ) - 128.0
                n = len(samples)
                rms = float(np.sqrt((samples**2).mean())) if n else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(samples)))) if n else 0
                out.append(
                    (doc_id, n, int(rate), int(n * 1000 // int(rate)), rms, zc)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


# -- Video frame sampling -----------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

_FAKE_FPS = 10
_FAKE_FRAME_BYTES = 64


def attach_fake_video(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary 'video' column: the fake container is a flat
    concatenation of fixed-size frames at a fixed fps."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("video_bytes"),
        F.lit(_FAKE_FPS).alias("fps"),
        F.lit("video/fake").alias("content_type"),
    )


def sample_video_frames(df: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame sampling: one OUTPUT ROW PER SAMPLED FRAME (row-expanding
    mapInPandas — the UDTF shape).  The fake container yields
    ``n_bytes // frame_size`` frames; a real ffmpeg/pyav keyframe reader
    drops into the same seam and keeps the identical output contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, payload, fps, ctype in zip(
                batch["doc_id"],
                batch["video_bytes"],
                batch["fps"],
                batch["content_type"],
            ):
                if ctype != "video/fake":
                    raise NotImplementedError(REAL_DECODER_NOTE)
                payload = bytes(payload)
                n_frames = len(payload) // _FAKE_FRAME_BYTES
                for idx in range(0, n_frames, every_nth):
                    out.append(
                        (
                            doc_id,
                            idx,
                            idx * 1000 // int(fps),
                            payload[
                                idx * _FAKE_FRAME_BYTES : (idx + 1)
                                * _FAKE_FRAME_BYTES
                            ],
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)
