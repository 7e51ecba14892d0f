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
