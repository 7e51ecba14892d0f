"""Multimodal column plumbing (driver north star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

Two codec tiers share the same Spark plumbing, dispatched on content type:

* **Real formats** (``codecs.py``, stdlib+numpy, no pillow/ffmpeg needed):
  PPM images, RIFF/WAV PCM audio, YUV4MPEG2 (y4m) video.  The payloads in
  the binary column are genuine files and the extractors genuinely parse
  headers and sample data.
* **Legacy fakes** (``*/fake`` content types) kept from round 1: the seam a
  pillow/ffmpeg kernel for compressed formats (JPEG/MP3/H.264) would drop
  into — see ``REAL_DECODER_NOTE``.

Scale posture: binary payloads never pass through Python row-at-a-time —
``mapInPandas`` moves Arrow record batches; per-partition batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import (
    PPM_CONTENT_TYPE,
    WAV_CONTENT_TYPE,
    Y4M_CONTENT_TYPE,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
    resize_ppm_nearest,
)
from .jpeg import JPEG_CONTENT_TYPE, decode_jpeg, encode_jpeg

REAL_DECODER_NOTE = (
    "Psychoacoustic/entropy codecs (MP3/H.264) need an ffmpeg kernel: "
    "same signature seam as the real PPM/JPEG/WAV/Y4M/G.711 decoders in "
    "codecs.py/jpeg.py/g711.py.  (JPEG — incl. 4:2:0 — and G.711 mu-law "
    "ARE fully supported real codecs here, no external libs needed.)"
)


def _cycle_bytes(data: bytes, n: int) -> bytes:
    """Cycle ``data`` to exactly ``n`` bytes (deterministic payload filler)."""
    if not data:
        data = b"\x00"
    return (data * (n // len(data) + 1))[:n]

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


def attach_ppm_image(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a REAL PPM image per document: deterministic dimensions
    from doc_id, pixel bytes cycled from the utf-8 text.  Encoding happens
    executor-side in Arrow batches; the result column holds genuine P6
    files any image tool can open."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch[text_col]):
                w = 8 + int(doc_id) % 25
                h = 8 + (int(doc_id) * 7) % 25
                rgb = _cycle_bytes(str(text).encode("utf-8"), w * h * 3)
                out.append((doc_id, encode_ppm(w, h, rgb), PPM_CONTENT_TYPE))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.select("doc_id", text_col).mapInPandas(kernel, schema=schema)


def jpeg_pixels_for_doc(doc_id: int) -> tuple[int, int, np.ndarray]:
    """Deterministic per-doc test image: dimensions and a folded triangle-
    wave pixel ramp derived from doc_id alone, so an external engine can
    recompute the ORIGINAL pixel statistics from doc_id in plain SQL:

        width  = 8 * (1 + doc_id % 3)        -- 8/16/24
        height = 8 * (1 + doc_id % 2)        -- 8/16
        px[r,c,ch] = abs(((3r + 5c + 37ch + doc_id) % 510) - 255)

    The triangle wave is smooth (piecewise-linear, no wrap discontinuity),
    so baseline JPEG at quality 95 round-trips it near-losslessly."""
    doc_id = int(doc_id)
    w = 8 * (1 + doc_id % 3)
    h = 8 * (1 + doc_id % 2)
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    px = np.abs(((3 * r + 5 * c + 37 * ch + doc_id) % 510) - 255)
    return w, h, px.astype(np.uint8)


def attach_jpeg_image(df: DataFrame) -> DataFrame:
    """Materialize a REAL baseline JPEG per document (pure-Python codec,
    jpeg.py): deterministic dimensions + pixels from doc_id.  The binary
    column holds genuine JFIF files any image tool can open."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                w, h, px = jpeg_pixels_for_doc(doc_id)
                out.append(
                    (doc_id, encode_jpeg(w, h, px.tobytes()), JPEG_CONTENT_TYPE)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    # The encode kernel is CPU-bound Python, not IO-bound: byte-based input
    # splits undersize its parallelism badly (x16 probe: a 80k-doc parquet
    # arrived as 3 partitions -> 3 busy cores out of 32).  A narrow
    # doc_id-only repartition to the cluster's parallelism costs ~8 bytes a
    # row and keeps every core busy.
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select("doc_id").repartition(par).mapInPandas(kernel, schema=schema)


def png_pixels_for_doc(doc_id: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic per-doc PNG test image.  PNG is lossless, so unlike
    the JPEG rule no smoothness is needed — the wrap discontinuities of a
    plain modulus exercise the filter heuristic harder — and dimensions
    deliberately avoid the 8-multiple grain:

        width    = 5 + doc_id % 28            -- 5..32
        height   = 4 + doc_id % 13            -- 4..16
        channels = 1 if doc_id % 3 == 0 else 3
        px[r,c,ch] = (7r + 11c + 41ch + doc_id) % 256

    All pure integer functions of doc_id, so an external engine recomputes
    the EXACT pixel sum in plain SQL (the lossless contract)."""
    doc_id = int(doc_id)
    w = 5 + doc_id % 28
    h = 4 + doc_id % 13
    channels = 1 if doc_id % 3 == 0 else 3
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(channels)[None, None, :]
    px = (7 * r + 11 * c + 41 * ch + doc_id) % 256
    return w, h, channels, px.astype(np.uint8)


def attach_png_image(df: DataFrame) -> DataFrame:
    """Materialize a REAL PNG per document (pure stdlib-zlib codec,
    png.py): deterministic dimensions + pixels from doc_id.  The binary
    column holds genuine CRC-valid PNG files any image tool can open."""
    from .png import PNG_CONTENT_TYPE, encode_png

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                w, h, channels, px = png_pixels_for_doc(doc_id)
                out.append(
                    (
                        doc_id,
                        encode_png(w, h, px.tobytes(), channels=channels),
                        PNG_CONTENT_TYPE,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    # same CPU-bound-encode posture as attach_jpeg_image: narrow id-only
    # repartition to cluster parallelism before the Python kernel
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select("doc_id").repartition(par).mapInPandas(kernel, schema=schema)


def attach_wav_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a REAL RIFF/WAV PCM16 mono clip per document: samples
    derived from the utf-8 text bytes (centered, scaled to int16)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("audio_bytes", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
        ]
    )
    rate = 16000

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch[text_col]):
                raw = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                samples = (raw.astype(np.int16) - 128) * 256
                out.append(
                    (doc_id, encode_wav(samples, rate), rate, WAV_CONTENT_TYPE)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.select("doc_id", text_col).mapInPandas(kernel, schema=schema)


_Y4M_W, _Y4M_H, _Y4M_FPS = 16, 16, 10


def attach_y4m_video(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a REAL YUV4MPEG2 (C444) clip per document: 3-8 frames of
    plane data cycled from the utf-8 text."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("video_bytes", T.BinaryType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
        ]
    )
    frame_size = 3 * _Y4M_W * _Y4M_H

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch[text_col]):
                n_frames = 3 + int(doc_id) % 6
                blob = _cycle_bytes(
                    str(text).encode("utf-8"), frame_size * n_frames
                )
                frames = [
                    blob[i * frame_size : (i + 1) * frame_size]
                    for i in range(n_frames)
                ]
                out.append(
                    (
                        doc_id,
                        encode_y4m(frames, _Y4M_W, _Y4M_H, _Y4M_FPS),
                        _Y4M_FPS,
                        Y4M_CONTENT_TYPE,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.select("doc_id", text_col).mapInPandas(kernel, schema=schema)


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
                payload = bytes(payload)
                if ctype == PPM_CONTENT_TYPE:
                    w, h, px = decode_ppm(payload)
                    c, mean = 3, float(px.mean())
                elif ctype == JPEG_CONTENT_TYPE:
                    w, h, px = decode_jpeg(payload)
                    c = 1 if px.ndim == 2 else px.shape[2]
                    mean = float(px.mean())
                elif ctype == "image/fake":
                    w, h, c, mean = decode_image_stub(payload)
                else:
                    raise NotImplementedError(REAL_DECODER_NOTE)
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
                if ctype == PPM_CONTENT_TYPE:
                    resized = resize_ppm_nearest(bytes(payload), width, height)
                elif ctype == JPEG_CONTENT_TYPE:
                    w0, h0, px = decode_jpeg(bytes(payload))
                    ys = (np.arange(height) * h0) // height
                    xs = (np.arange(width) * w0) // width
                    near = px[ys][:, xs]
                    resized = encode_jpeg(
                        width,
                        height,
                        near.tobytes(),
                        channels=1 if near.ndim == 2 else 3,
                    )
                elif ctype == "image/fake":
                    resized = resize_image_stub(bytes(payload), width, height)
                else:
                    raise NotImplementedError(REAL_DECODER_NOTE)
                out.append((doc_id, width, height, resized, ctype))
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
        for batch in batches:
            out = []
            for doc_id, payload, rate, ctype in zip(
                batch["doc_id"],
                batch["audio_bytes"],
                batch["sample_rate"],
                batch["content_type"],
            ):
                if ctype == WAV_CONTENT_TYPE:
                    rate, pcm = decode_wav(bytes(payload))
                    samples = pcm.astype("float64")
                elif ctype == "audio/fake":
                    samples = np.frombuffer(
                        bytes(payload), dtype="uint8"
                    ).astype("float64") - 128.0
                else:
                    raise NotImplementedError(REAL_DECODER_NOTE)
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
                payload = bytes(payload)
                if ctype == Y4M_CONTENT_TYPE:
                    _, _, fps, frames = decode_y4m(payload)
                elif ctype == "video/fake":
                    frames = [
                        payload[i * _FAKE_FRAME_BYTES : (i + 1) * _FAKE_FRAME_BYTES]
                        for i in range(len(payload) // _FAKE_FRAME_BYTES)
                    ]
                else:
                    raise NotImplementedError(REAL_DECODER_NOTE)
                for idx in range(0, len(frames), every_nth):
                    out.append(
                        (doc_id, idx, idx * 1000 // int(fps), frames[idx])
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)


def qoi_pixels_for_doc(doc_id: int) -> tuple[int, int, int, np.ndarray]:
    """Deterministic per-doc QOI test image.  QOI is lossless, so the rule
    is pure-integer like the PNG one, but with an RGBA lane (alpha keyed on
    doc_id % 4 == 0) to exercise the QOI_OP_RGBA path and run-friendly row
    bands (px constant along short spans) to exercise QOI_OP_RUN:

        width    = 4 + doc_id % 29            -- 4..32
        height   = 3 + doc_id % 14            -- 3..16
        channels = 4 if doc_id % 4 == 0 else 3
        px[r,c,ch] = (5r + 13*(c DIV 3) + 37ch + doc_id) % 256

    The c DIV 3 term makes every 3 adjacent pixels equal → real runs.
    All pure integer functions of doc_id, so an external engine recomputes
    the EXACT pixel sum in plain SQL (the lossless contract)."""
    doc_id = int(doc_id)
    w = 4 + doc_id % 29
    h = 3 + doc_id % 14
    channels = 4 if doc_id % 4 == 0 else 3
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(channels)[None, None, :]
    px = (5 * r + 13 * (c // 3) + 37 * ch + doc_id) % 256
    return w, h, channels, px.astype(np.uint8)


def attach_qoi_image(df: DataFrame) -> DataFrame:
    """Materialize a REAL QOI per document (pure-stdlib codec, qoi.py):
    deterministic dimensions + pixels from doc_id.  The binary column
    holds genuine spec-complete QOI files any QOI tool can open."""
    from .qoi import QOI_CONTENT_TYPE, encode_qoi

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                w, h, channels, px = qoi_pixels_for_doc(doc_id)
                out.append(
                    (
                        doc_id,
                        encode_qoi(w, h, px.tobytes(), channels=channels),
                        QOI_CONTENT_TYPE,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    # same CPU-bound-encode posture as attach_png_image
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select("doc_id").repartition(par).mapInPandas(kernel, schema=schema)


def gif_pixels_for_doc(doc_id: int) -> tuple[int, int, np.ndarray]:
    """Deterministic per-doc GIF test image (8-bit grayscale).  GIF's LZW
    rewards repetition, so the rule has flat 4-pixel bands along rows
    (real back-references) while staying a pure integer function of
    doc_id so an external engine recomputes the EXACT pixel sum in SQL:

        width  = 6 + doc_id % 27            -- 6..32
        height = 4 + doc_id % 12            -- 4..15
        px[r,c] = (11r + 17*(c DIV 4) + doc_id) % 256
    """
    doc_id = int(doc_id)
    w = 6 + doc_id % 27
    h = 4 + doc_id % 12
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    px = (11 * r + 17 * (c // 4) + doc_id) % 256
    return w, h, px.astype(np.uint8)


def attach_gif_image(df: DataFrame) -> DataFrame:
    """Materialize a REAL GIF87a per document (pure-stdlib LZW codec,
    gif.py): deterministic dimensions + pixels from doc_id.  The binary
    column holds genuine GIF files any browser can open."""
    from .gif import GIF_CONTENT_TYPE, encode_gif

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                w, h, px = gif_pixels_for_doc(doc_id)
                out.append(
                    (doc_id, encode_gif(w, h, px.tobytes()), GIF_CONTENT_TYPE)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select("doc_id").repartition(par).mapInPandas(kernel, schema=schema)


def bmp_pixels_for_doc(doc_id: int) -> tuple[int, int, np.ndarray]:
    """Deterministic per-doc BMP test image (24-bit RGB).  Pure-integer
    generation rule so an external engine recomputes the EXACT pixel sum:

        width  = 5 + doc_id % 28          -- 5..32: hits all 4 row-padding
        height = 4 + doc_id % 11          -- 4..14    residues (3w mod 4)
        px[r,c,ch] = (7r + 11*(c DIV 2) + 29ch + doc_id) % 256
    """
    doc_id = int(doc_id)
    w = 5 + doc_id % 28
    h = 4 + doc_id % 11
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    px = (7 * r + 11 * (c // 2) + 29 * ch + doc_id) % 256
    return w, h, px.astype(np.uint8)


def attach_bmp_image(df: DataFrame) -> DataFrame:
    """Materialize a REAL 24-bit BMP per document (multimodal/bmp.py):
    deterministic dimensions + pixels from doc_id; the binary column holds
    genuine BM-magic files any image viewer opens."""
    from .bmp import BMP_CONTENT_TYPE, encode_bmp

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image_bytes", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                w, h, px = bmp_pixels_for_doc(doc_id)
                out.append(
                    (doc_id, encode_bmp(w, h, px.tobytes()), BMP_CONTENT_TYPE)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select("doc_id").repartition(par).mapInPandas(kernel, schema=schema)
