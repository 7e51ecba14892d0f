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
