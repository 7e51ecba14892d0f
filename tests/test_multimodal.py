"""Multimodal binary-column plumbing: schema contract, Arrow batch path,
deterministic stub decode."""

from __future__ import annotations

import zlib

import pytest

from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
    IMAGE_FEATURES_SCHEMA,
    attach_fake_image,
    extract_image_features,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )


def test_binary_column_contract(spark):
    df = attach_fake_image(_docs(spark))
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "image_bytes": "binary",
        "content_type": "string",
    }


def test_feature_extraction_schema_and_determinism(spark):
    out = extract_image_features(attach_fake_image(_docs(spark)))
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == len(b"hello world")
    assert rows[1].crc32 == zlib.crc32(b"hello world")
    assert 16 <= rows[1].width < 256 and 16 <= rows[1].height < 256
    # re-run -> identical features (deterministic kernel)
    again = {r.doc_id: r for r in
             extract_image_features(attach_fake_image(_docs(spark))).collect()}
    assert rows[1] == again[1] and rows[2] == again[2]


def test_unknown_content_type_raises(spark):
    from pyspark.sql import functions as F

    df = attach_fake_image(_docs(spark)).withColumn(
        "content_type", F.lit("image/png")
    )
    with pytest.raises(Exception, match="pillow|NotImplemented"):
        extract_image_features(df).collect()


def test_resize_images_fixed_shape(spark):
    from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
        attach_fake_image,
        resize_images,
    )

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = resize_images(attach_fake_image(df), width=8, height=4).first()
    assert row.width == 8 and row.height == 4
    assert len(row.image_bytes) == 32
    # Deterministic: cycled payload.
    assert bytes(row.image_bytes) == (b"hello world" * 3)[:32]


def test_audio_features_deterministic(spark):
    from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
        attach_fake_audio,
        extract_audio_features,
    )

    df = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    row = extract_audio_features(attach_fake_audio(df)).first()
    assert row.n_bytes == 4 and row.sample_rate == 16000
    assert row.duration_ms == 4 * 1000 // 16000
    samples = [ord(c) - 128.0 for c in "abcd"]
    rms = (sum(s * s for s in samples) / 4) ** 0.5
    assert abs(row.rms - rms) < 1e-9


def test_video_frame_sampling_counts_and_offsets(spark):
    from projeto_de_etl_com_api_do_meta_spark.multimodal.binary_ops import (
        _FAKE_FRAME_BYTES,
        attach_fake_video,
        sample_video_frames,
    )

    text = "x" * (_FAKE_FRAME_BYTES * 12 + 10)  # 12 full frames + remainder
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sample_video_frames(attach_fake_video(df), every_nth=5).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 5, 10]
    assert all(len(r.frame_bytes) == _FAKE_FRAME_BYTES for r in rows)
    assert sorted(r.ts_ms for r in rows) == [0, 500, 1000]
