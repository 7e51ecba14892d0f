"""Registry queries for the reference-parity pipelines, streaming surface,
and multimodal plumbing.

Pipelines read from the fake REST transport (not sf_dir): no oracle SQL is
possible (the driver registers only the fixture parquet views), so these are
rows-only checks; semantics are pinned by the golden/unit tests in
tests/test_pipelines.py.  ``stream_tumbling_daily`` DOES carry an oracle —
Structured Streaming vs DuckDB batch SQL on the same fixture (stream/batch
parity).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..multimodal.binary_ops import attach_fake_image, extract_image_features
from ..plans.pipelines import (
    run_campaign_performance,
    run_dimension,
    run_lead_insights,
)
from ..session import pin_query_session_conf
from ..sources.meta_rest import MetaRestSource
from ..streaming.windows import read_events_stream, run_available_now, tumbling_daily
from .registry import register


@register(
    "meta_dimension_pipeline",
    oracle=None,
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_dimension pipeline (REST scan + IN-filter pushdown, "
        "null-safe struct flatten, keep-last dedup). Rows-only; goldens in "
        "tests/test_pipelines.py."
    ),
)
def meta_dimension_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_dimension(MetaRestSource(spark))


@register(
    "meta_performance_pipeline",
    oracle=None,
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_campaign_performance pipeline (insights scan, actions "
        "pivot, first-non-null grain dedup, safe-div metrics)."
    ),
)
def meta_performance_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_campaign_performance(MetaRestSource(spark))


@register(
    "meta_leads_pipeline",
    oracle=None,
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_lead_insights pipeline (demo x geo full-outer merge "
        "with fan-out + 0-fill)."
    ),
)
def meta_leads_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_lead_insights(MetaRestSource(spark))


_ORACLE_STREAM_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_tumbling_daily",
    oracle=_ORACLE_STREAM_DAILY,
    tags=("streaming",),
    doc=(
        "Structured Streaming tumbling 1-day window with watermark, run via "
        "Trigger.AvailableNow to completion — oracle-checked against batch "
        "SQL (stream/batch parity, SURVEY §2.8)."
    ),
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    stream = tumbling_daily(read_events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        return run_available_now(stream, ckpt)


@register(
    "multimodal_image_features",
    oracle=None,
    tags=("multimodal", "north-star"),
    doc=(
        "Binary-column multimodal plumbing: opaque image bytes + typed "
        "metadata -> Arrow-batched mapInPandas feature extraction (decode "
        "kernel stubbed; Spark plumbing real)."
    ),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_image_features(attach_fake_image(docs))
