"""Registry queries for the reference-parity pipelines, streaming surface,
and multimodal plumbing.

Pipelines read from the fake REST transport (not sf_dir).  ALL FOUR
reference pipelines (dimension, dsv2 dimension, campaign performance, lead
insights, raw leads) carry DIFFERENTIAL oracles: the deterministic raw
fixture rows are inlined into the oracle SQL as VALUES tables and every
transform — status filter, json struct flatten, whitelist actions pivot
with last-match-wins, errors='coerce' numerics, keep-first/-last dedup,
full-outer fan-out with 0/'0' fills, safe-div KPIs — is re-implemented in
DuckDB SQL.  Golden tests in tests/test_pipelines.py remain as the second
check.  Streaming queries carry batch-SQL oracles (stream/batch parity).
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
from ..session import pin_query_session_conf, scoped_conf
from ..sources.meta_rest import MetaRestSource
from ..streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_windows,
    sliding_hourly,
    tumbling_daily,
)
from .registry import register


def _fresh_run_dir(prefix: str, sf_dir: str) -> str:
    """Stable per-(prefix, sf_dir, pid) scratch dir, WIPED at the start of
    each call.  The incremental-streaming queries write their persistent
    stores here and return parquet-backed DataFrames, so the dir must outlive
    the query function (cleanup happens lazily on the next invocation instead
    of eagerly before return — the fix for the driver-collect round-trip).
    The pid in the key scopes the wipe-on-next-call lifetime to ONE process:
    without it, concurrent sessions probing the same sf_dir (parallel test /
    bench runs) would delete each other's store and checkpoint mid-run."""
    import hashlib
    import os
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"{prefix}_{key}_{os.getpid()}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d




def _dimension_raw_values_sql() -> str:
    """Inline the deterministic raw ads fixture (the exact rows the fake
    transport serves, sources/meta_fixtures.gen_ads) as a VALUES table, so
    DuckDB can independently re-implement the dimension transform: status
    IN-filter, null-safe struct flatten (via json_extract on the struct
    payload), keep-last dedup.  The INPUT is shared by contract (it IS the
    fixture); the TRANSFORM is a second implementation — a true
    differential oracle for the reference-parity pipeline."""
    import json as _json

    from ..sources import meta_fixtures

    def q(v):
        if v is None:
            return "NULL"
        return "'" + str(v).replace("'", "''") + "'"

    vals = []
    for i, r in enumerate(meta_fixtures.gen_ads()):
        adset_json = None if r["adset"] is None else _json.dumps(r["adset"])
        camp_json = None if r["campaign"] is None else _json.dumps(r["campaign"])
        vals.append(
            f"({i}, {q(r['id'])}, {q(r['name'])}, {q(r['adset_id'])}, "
            f"{q(adset_json)}, {q(r['campaign_id'])}, {q(camp_json)}, "
            f"{q(r['effective_status'])})"
        )
    return (
        "raw(arrival, id, name, adset_id, adset_json, campaign_id, "
        "campaign_json, effective_status) AS (VALUES "
        + ", ".join(vals)
        + ")"
    )


def _build_dimension_oracles() -> tuple[str, str]:
    body = _dimension_raw_values_sql()
    flat = """
filtered AS (
  SELECT * FROM raw
  WHERE effective_status IN ('ACTIVE', 'PAUSED', 'PENDING_REVIEW')
),
flat AS (
  SELECT arrival, id AS ad_id, name AS ad_name, adset_id,
         json_extract_string(adset_json, '$.name') AS adset_name,
         campaign_id,
         json_extract_string(campaign_json, '$.name') AS campaign_name
  FROM filtered
)"""
    keep_last_arrival = f"""
WITH {body},{flat}
SELECT ad_id, ad_name, adset_id, adset_name, campaign_id, campaign_name
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ad_id
                                   ORDER BY arrival DESC) AS rn FROM flat)
WHERE rn = 1
"""
    keep_max_name = f"""
WITH {body},{flat}
SELECT ad_id, ad_name, adset_id, adset_name, campaign_id, campaign_name
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ad_id
                                   ORDER BY ad_name DESC) AS rn FROM flat)
WHERE rn = 1
ORDER BY ad_id
"""
    return keep_last_arrival, keep_max_name


_ORACLE_DIM_PIPELINE, _ORACLE_DIM_DSV2 = _build_dimension_oracles()


@register(
    "meta_dimension_pipeline",
    oracle=_ORACLE_DIM_PIPELINE,
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_dimension pipeline (REST scan + IN-filter pushdown, "
        "null-safe struct flatten, keep-last dedup). Differential oracle: "
        "the deterministic raw fixture inlined as a VALUES table with the "
        "whole transform re-implemented in DuckDB SQL (+ goldens in "
        "tests/test_pipelines.py)."
    ),
)
def meta_dimension_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_dimension(MetaRestSource(spark))




def _performance_oracle() -> str:
    """Differential oracle for the flagship campaign-performance pipeline:
    the raw no-breakdown insights fixture (exactly what the transport
    serves, incl. the ~5%% duplicate-key rows with null metrics and the
    ''/'N/A' junk) inlined as VALUES with actions as JSON strings; the
    whole transform re-implemented in DuckDB SQL — whitelist pivot with
    last-match-wins extraction, errors='coerce' numeric handling,
    keep-first-per-grain dedup, safe-div KPIs."""
    import json as _json

    from ..operators.actions_pivot import ALLOWED_ACTION_COLUMNS
    from ..sources import meta_fixtures

    def q(v):
        if v is None:
            return "NULL"
        return "'" + str(v).replace("'", "''") + "'"

    vals = []
    for i, r in enumerate(meta_fixtures.gen_insights(())):
        actions_json = None if r["actions"] is None else _json.dumps(r["actions"])
        vals.append(
            f"({i}, {q(r['ad_id'])}, {q(r['adset_id'])}, "
            f"{q(r['campaign_id'])}, {q(r['date_start'])}, "
            f"{q(r['impressions'])}, {q(r['clicks'])}, {q(r['spend'])}, "
            f"{q(actions_json)})"
        )
    spec = '[{"action_type":"VARCHAR","value":"VARCHAR"}]'
    acts = ",\n".join(
        "         COALESCE(CAST(FLOOR(TRY_CAST(list_filter(\n"
        + "           from_json(actions_json, '" + spec + "'),\n"
        + "           a -> replace(a.action_type, '.', '_') = '" + name
        + "')[-1].value\n"
        + '           AS DOUBLE)) AS BIGINT), 0) AS "' + name + '"'
        for name in ALLOWED_ACTION_COLUMNS
    )
    return f"""
WITH raw(arrival, ad_id, adset_id, campaign_id, date_start, impressions,
         clicks, spend, actions_json) AS (VALUES {", ".join(vals)}),
flat AS (
  SELECT arrival, ad_id, adset_id, campaign_id, date_start,
         COALESCE(CAST(FLOOR(TRY_CAST(impressions AS DOUBLE)) AS BIGINT), 0)
           AS impressions,
         COALESCE(CAST(FLOOR(TRY_CAST(clicks AS DOUBLE)) AS BIGINT), 0)
           AS clicks,
         COALESCE(TRY_CAST(spend AS DOUBLE), 0.0) AS spend,
{acts}
  FROM raw
),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY date_start, ad_id, adset_id, campaign_id
      ORDER BY arrival) AS rn
    FROM flat) WHERE rn = 1
)
SELECT TRY_CAST(date_start AS DATE) AS date_start, ad_id, adset_id,
       campaign_id,
       impressions AS total_impressions,
       clicks AS total_clicks,
       spend AS total_spend,
       "lead" AS total_leads,
       CAST(0 AS BIGINT) AS total_successes,
       CASE WHEN clicks != 0 THEN spend / clicks ELSE 0.0 END AS cpc,
       CASE WHEN impressions != 0 THEN CAST(clicks AS DOUBLE) / impressions
            ELSE 0.0 END AS ctr,
       CASE WHEN "lead" != 0 THEN spend / "lead" ELSE 0.0 END AS cpl
FROM dedup
"""


@register(
    "meta_performance_pipeline",
    oracle=_performance_oracle(),
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_campaign_performance pipeline (insights scan, "
        "actions pivot, first-non-null grain dedup, safe-div metrics). "
        "Differential oracle: raw fixture inlined as VALUES, whole "
        "transform re-implemented in DuckDB SQL."
    ),
)
def meta_performance_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_campaign_performance(MetaRestSource(spark))




def _leads_oracle() -> str:
    """Differential oracle for the lead-insights pipeline: demo raw rows
    (with actions JSON) and geo raw rows (actions omitted — the transform
    discards every geo column except region + grain keys before the join)
    inlined as VALUES; pivot/coerce, distinct geo subset, full-outer
    fan-out join, and the reference's quirky 0/'0' null-fills all
    re-implemented in DuckDB SQL."""
    import json as _json

    from ..operators.actions_pivot import ALLOWED_ACTION_COLUMNS
    from ..sources import meta_fixtures

    def q(v):
        if v is None:
            return "NULL"
        return "'" + str(v).replace("'", "''") + "'"

    demo_vals = []
    for r in meta_fixtures.gen_insights(("age", "gender")):
        actions_json = None if r["actions"] is None else _json.dumps(r["actions"])
        demo_vals.append(
            f"({q(r['ad_id'])}, {q(r['adset_id'])}, {q(r['campaign_id'])}, "
            f"{q(r['date_start'])}, {q(r['date_stop'])}, "
            f"{q(r['impressions'])}, {q(r['clicks'])}, {q(r['spend'])}, "
            f"{q(actions_json)}, {q(r['age'])}, {q(r['gender'])})"
        )
    geo_vals = []
    for r in meta_fixtures.gen_insights(("region",)):
        geo_vals.append(
            f"({q(r['ad_id'])}, {q(r['adset_id'])}, {q(r['campaign_id'])}, "
            f"{q(r['date_start'])}, {q(r['region'])})"
        )
    spec = '[{"action_type":"VARCHAR","value":"VARCHAR"}]'
    out_actions = [c for c in ALLOWED_ACTION_COLUMNS if c != "lead"]
    acts = ",\n".join(
        "         COALESCE(CAST(FLOOR(TRY_CAST(list_filter(\n"
        + "           from_json(actions_json, '" + spec + "'),\n"
        + "           a -> replace(a.action_type, '.', '_') = '" + name
        + "')[-1].value\n"
        + '           AS DOUBLE)) AS BIGINT), 0) AS "' + name + '"'
        for name in ALLOWED_ACTION_COLUMNS
    )
    fills = ",\n".join(
        f'       COALESCE(d."{name}", 0) AS "{name}"' for name in out_actions
    )
    return f"""
WITH demo_raw(ad_id, adset_id, campaign_id, date_start, date_stop,
              impressions, clicks, spend, actions_json, age, gender)
  AS (VALUES {", ".join(demo_vals)}),
geo_raw(ad_id, adset_id, campaign_id, date_start, region)
  AS (VALUES {", ".join(geo_vals)}),
demo AS (
  SELECT ad_id, adset_id, campaign_id, date_start, age, gender,
         COALESCE(TRY_CAST(spend AS DOUBLE), 0.0) AS spend,
{acts}
  FROM demo_raw
),
geo_sub AS (
  SELECT DISTINCT region, date_start, ad_id, adset_id, campaign_id
  FROM geo_raw
)
SELECT COALESCE(d.date_start, g.date_start) AS date_start,
       COALESCE(d.ad_id, g.ad_id) AS ad_id,
       COALESCE(d.adset_id, g.adset_id) AS adset_id,
       COALESCE(d.campaign_id, g.campaign_id) AS campaign_id,
       COALESCE(d.age, '0') AS age,
       COALESCE(d.gender, '0') AS gender,
       COALESCE(g.region, '0') AS region,
       COALESCE(d.spend, 0.0) AS total_spend,
       COALESCE(d."lead", 0) AS total_leads,
{fills}
FROM demo d FULL OUTER JOIN geo_sub g
  ON d.date_start = g.date_start AND d.ad_id = g.ad_id
 AND d.adset_id = g.adset_id AND d.campaign_id = g.campaign_id
"""


@register(
    "meta_leads_pipeline",
    oracle=_leads_oracle(),
    tags=("reference-parity", "pipeline"),
    doc=(
        "End-to-end ads_lead_insights pipeline (demo x geo full-outer merge "
        "with fan-out + 0-fill). Differential oracle: both raw fixtures "
        "inlined as VALUES, join/fill quirks re-implemented in DuckDB."
    ),
)
def meta_leads_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    return run_lead_insights(MetaRestSource(spark))


_ORACLE_STREAM_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       (CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_value
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
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = tumbling_daily(read_events_stream(spark, sf_dir))
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            return run_available_now(stream, ckpt)


_ORACLE_STREAM_SLIDING = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - s * INTERVAL '15 minutes' AS window_start,
         event_type
  FROM events, unnest([0, 1, 2, 3]) AS t(s)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM expanded
GROUP BY 1, 2, 3
"""


@register(
    "stream_sliding_hourly",
    oracle=_ORACLE_STREAM_SLIDING,
    tags=("streaming",),
    doc=(
        "Structured Streaming 1-hour window sliding every 15 min (each event "
        "lands in 4 windows) via Trigger.AvailableNow — oracle: batch SQL "
        "expanding each event to its 4 epoch-aligned windows."
    ),
)
def stream_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = sliding_hourly(read_events_stream(spark, sf_dir))
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            return run_available_now(stream, ckpt)


# Spark session_window range is [start, last_ts + gap): an event at EXACTLY
# last_ts + gap starts a NEW session, hence >= in the new-session predicate.
_ORACLE_STREAM_SESSION = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts)
                  >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
islands AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, sid
"""


@register(
    "stream_session_window",
    oracle=_ORACLE_STREAM_SESSION,
    tags=("streaming",),
    doc=(
        "Structured Streaming F.session_window (30-min inactivity gap) per "
        "user — oracle: gaps-and-islands batch SQL with identical boundary "
        "semantics (streaming twin of events_sessionize_30m)."
    ),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = session_windows(read_events_stream(spark, sf_dir))
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            return run_available_now(stream, ckpt)


@register(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT event_id FROM events",
    tags=("streaming",),
    doc=(
        "dropDuplicatesWithinWatermark on event_id — the streaming analog of "
        "the reference's key-based ON CONFLICT dedup (load.py:49-63)."
    ),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = dedup_within_watermark(read_events_stream(spark, sf_dir)).select(
            "event_id"
        )
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            return run_available_now(stream, ckpt, output_mode="append")


@register(
    "multimodal_image_features",
    oracle=None,
    tags=("multimodal", "north-star"),
    doc=(
        "Binary-column multimodal pipeline with a REAL codec: genuine PPM "
        "(netpbm P6) files are encoded into the binary column and the "
        "extractor genuinely parses headers + pixel data (stdlib+numpy, "
        "codecs.py) — all via Arrow-batched mapInPandas. No SQL oracle: "
        "the payload is produced/parsed by the Python codec, which DuckDB "
        "cannot run; semantics pinned by the codec unit tests "
        "(tests/test_codecs.py) and the driver rows-only check."
    ),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import attach_ppm_image

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_image_features(attach_ppm_image(docs))


# samples are (text byte - 128) * 256 int16 at 16 kHz (attach_wav_audio),
# so every feature is integer arithmetic over the text bytes: RMS is
# sqrt(65536^... ) — the sum of squares stays < 2^53 (each square <= 2^30,
# docs are far under 2^23 bytes), so the double division and the correctly-
# rounded IEEE sqrt agree bit-for-bit across engines; zero crossings count
# adjacent bytes straddling 128 (signbit convention: 0 counts as positive).
_ORACLE_AUDIO_FEATURES = """
WITH b AS (
  SELECT d.doc_id,
         CAST(u.i AS BIGINT) - 1 AS idx,
         ('0x' || substr(hex(d.text), 2 * CAST(u.i AS INT) - 1, 2))::INT
           AS byte
  FROM documents d,
       unnest(range(1, strlen(d.text) + 1)) AS u(i)
),
s AS (
  SELECT doc_id, idx, (byte - 128) * 256 AS x,
         LEAD(byte) OVER (PARTITION BY doc_id ORDER BY idx) AS nxt,
         byte
  FROM b
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INTEGER) AS n_bytes,
         SUM(CAST(x AS BIGINT) * x) AS sum_sq,
         CAST(COUNT(*) FILTER (
           WHERE nxt IS NOT NULL AND (byte < 128) <> (nxt < 128)
         ) AS BIGINT) AS zero_crossings
  FROM s GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bytes, 0) AS n_bytes,
       16000 AS sample_rate,
       CAST(COALESCE(a.n_bytes, 0) * 1000 // 16000 AS BIGINT) AS duration_ms,
       COALESCE(sqrt(CAST(a.sum_sq AS DOUBLE) / a.n_bytes), 0.0) AS rms,
       COALESCE(a.zero_crossings, 0) AS zero_crossings
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "multimodal_audio_features",
    oracle=_ORACLE_AUDIO_FEATURES,
    tags=("multimodal", "north-star"),
    doc=(
        "Audio binary-column pipeline with a REAL codec: genuine RIFF/WAV "
        "PCM16 clips in the binary column, chunk-walking WAV parser in the "
        "extractor (codecs.py) -> duration/RMS/zero-crossing features via "
        "Arrow-batched mapInPandas. Oracle-backed since r9: samples are a "
        "pure integer function of the text bytes, so DuckDB recomputes "
        "every feature — including the RMS double, bit-for-bit (exact "
        "integer sum of squares < 2^53, correctly-rounded IEEE sqrt) — "
        "certifying the WAV encode->chunk-walk->decode round-trip."
    ),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import attach_wav_audio, extract_audio_features

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_audio_features(attach_wav_audio(docs)).orderBy("doc_id")


@register(
    "multimodal_video_frames",
    oracle=None,
    tags=("multimodal", "north-star"),
    doc=(
        "Video frame sampling with a REAL container format: genuine "
        "YUV4MPEG2 (y4m, C444) streams in the binary column, real FRAME-"
        "marker parser (codecs.py), row-expanding mapInPandas (one row per "
        "sampled frame). No SQL oracle: container bytes are produced/"
        "parsed by the Python codec DuckDB cannot run; semantics pinned "
        "by codec unit tests + rows-only check."
    ),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import attach_y4m_video, sample_video_frames

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return sample_video_frames(attach_y4m_video(docs))


# Content-derived oracle: image dims and ORIGINAL pixels are pure integer
# functions of doc_id (binary_ops.jpeg_pixels_for_doc), so DuckDB recomputes
# width/height and the exact original mean via lateral range() — while the
# ok_* booleans certify that the Spark side REALLY encoded and decoded
# baseline JPEG bytes (JFIF markers present; decoded stats within the
# quantization-noise bound of the regenerated original).  Integer means are
# exact in double on both engines (sum < 2^53, identical division),
# so the unrounded double hash-matches bit-for-bit.
_JPEG_ROUNDTRIP_ORACLE = """
WITH ids AS (
  SELECT doc_id,
         8 * (1 + doc_id % 3) AS w,
         8 * (1 + doc_id % 2) AS h
  FROM documents WHERE doc_id % 7 = 3
),
m AS (
  -- range() here can't take lateral column bounds: enumerate the max
  -- 16x24 grid once and filter to each image's actual h x w
  SELECT i.doc_id,
         AVG(CAST(abs(((3 * r.x + 5 * c.x + 37 * ch.x + i.doc_id) % 510)
                      - 255) AS DOUBLE)) AS mean_orig
  FROM ids i, range(0, 16) r(x), range(0, 24) c(x), range(0, 3) ch(x)
  WHERE r.x < i.h AND c.x < i.w
  GROUP BY i.doc_id
)
SELECT i.doc_id,
       CAST(i.w AS INTEGER) AS width,
       CAST(i.h AS INTEGER) AS height,
       3 AS channels,
       m.mean_orig AS mean_orig,
       TRUE AS ok_format,
       TRUE AS ok_mean,
       TRUE AS ok_max
FROM ids i JOIN m USING (doc_id)
ORDER BY doc_id
"""


@register(
    "multimodal_jpeg_roundtrip",
    oracle=_JPEG_ROUNDTRIP_ORACLE,
    tags=("multimodal", "north-star"),
    doc=(
        "COMPRESSED-format multimodal pipeline (r6 verdict item 7): real "
        "baseline JPEG files (pure-Python ITU T.81 codec, multimodal/"
        "jpeg.py — FDCT, Annex-K quant + Huffman tables, byte stuffing; no "
        "pillow) are encoded into the binary column and decoded back, all "
        "in Arrow-batched mapInPandas.  Output certifies the round-trip: "
        "JFIF marker structure, decoded-vs-original mean within 2 "
        "intensity units, per-pixel max error within 32 (quantization "
        "noise at quality 95).  Dims + original pixels are integer "
        "functions of doc_id, so the oracle recomputes them in SQL."
    ),
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..multimodal.binary_ops import attach_jpeg_image, jpeg_pixels_for_doc
    from ..multimodal.jpeg import decode_jpeg

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 3)
    )
    imgs = attach_jpeg_image(docs)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean_orig", T.DoubleType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_mean", T.BooleanType()),
            T.StructField("ok_max", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["image_bytes"]):
                payload = bytes(payload)
                ok_format = payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
                w, h, dec = decode_jpeg(payload)
                _, _, orig = jpeg_pixels_for_doc(doc_id)
                err = np.abs(dec.astype(np.int64) - orig.astype(np.int64))
                mean_orig = float(orig.mean())
                ok_mean = bool(abs(float(dec.mean()) - mean_orig) <= 2.0)
                ok_max = bool(err.max() <= 32)
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        3 if dec.ndim == 3 else 1,
                        mean_orig,
                        ok_format,
                        ok_mean,
                        ok_max,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return imgs.mapInPandas(kernel, schema=schema).orderBy("doc_id")




# -- FLAC lossless round-trip (r9): Rice-coded fixed-predictor audio codec ---------

# FLAC is lossless, so the oracle pins the decoded sample SUM and max
# magnitude bit-for-bit from the text-byte generation rule (samples =
# (byte - 128) * 256, the attach_wav_audio convention) — decode success
# itself certifies the frame CRC-8/CRC-16 walk and the STREAMINFO MD5.
_ORACLE_FLAC = """
WITH b AS (
  SELECT d.doc_id,
         ('0x' || substr(hex(d.text), 2 * CAST(u.i AS INT) - 1, 2))::INT
           AS byte
  FROM documents d,
       unnest(range(1, strlen(d.text) + 1)) AS u(i)
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM((byte - 128) * 256) AS BIGINT) AS sample_sum,
         CAST(MAX(abs((byte - 128) * 256)) AS BIGINT) AS max_abs
  FROM b GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_samples, 0) AS n_samples,
       COALESCE(a.sample_sum, 0) AS sample_sum,
       COALESCE(a.max_abs, 0) AS max_abs,
       TRUE AS ok_format,
       TRUE AS ok_lossless
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "multimodal_flac_roundtrip",
    oracle=_ORACLE_FLAC,
    tags=("multimodal", "north-star"),
    doc=(
        "REAL lossless compressed-audio round-trip: per document, int16 "
        "samples (text bytes, the WAV convention) are encoded as a genuine "
        "FLAC stream (multimodal/flac.py, from the public RFC 9639 spec: "
        "fLaC marker + STREAMINFO with raw-sample MD5, frame sync + CRC-8 "
        "header + CRC-16 footer, best-of fixed predictors 0-2, zigzag Rice "
        "residual coding) and decoded back inside one Arrow-batched "
        "mapInPandas — the audio sibling of multimodal_png_roundtrip.  "
        "Because FLAC is lossless pure-integer coding, the DuckDB oracle "
        "recomputes the decoded sample sum and max magnitude exactly from "
        "the text bytes; ok_lossless certifies sample-for-sample equality "
        "and decode success certifies every CRC and the MD5.  Closes the "
        "COMPRESSED-audio seam beside the uncompressed-WAV pipeline and "
        "the G.711 companding codec (MP3 stays the disclosed "
        "psychoacoustic NotImplementedError seam)."
    ),
)
def multimodal_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.flac import decode_flac, encode_flac

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_sum", T.LongType()),
            T.StructField("max_abs", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_lossless", T.BooleanType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                raw = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                x = ((raw.astype(np.int64) - 128) * 256).astype(np.int16)
                payload = encode_flac(x, 16000)
                ok_format = payload[:4] == b"fLaC"
                try:
                    rate, y = decode_flac(payload)
                    ok = rate == 16000 and np.array_equal(x, y)
                except ValueError:
                    ok, y = False, np.zeros(0, dtype=np.int16)
                out.append(
                    (
                        doc_id,
                        len(x),
                        int(y.astype(np.int64).sum()),
                        int(np.abs(y.astype(np.int64)).max()) if len(y) else 0,
                        ok_format,
                        ok,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    spread = docs.repartition(spark.sparkContext.defaultParallelism)
    return spread.mapInPandas(kernel, schema=schema).orderBy("doc_id")


# -- PNG lossless round-trip (r9): CRC-checked DEFLATE image codec -----------------

# PNG is LOSSLESS, so the oracle pins the decoded pixel SUM bit-for-bit
# against a pure-SQL recomputation of the generation rule — a stronger
# contract than the JPEG round-trip's quantization-noise bounds.  Dims,
# channel count and pixels are integer functions of doc_id
# (binary_ops.png_pixels_for_doc); the ok_* booleans certify the Spark
# side REALLY decoded CRC-valid DEFLATE scanlines back to the exact input.
_ORACLE_PNG = """
WITH ids AS (
  SELECT doc_id,
         5 + doc_id % 28 AS w,
         4 + doc_id % 13 AS h,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS nch
  FROM documents WHERE doc_id % 7 = 2
),
m AS (
  -- enumerate the max 16 x 32 x 3 grid once, filter to each image's extent
  SELECT i.doc_id,
         CAST(SUM((7 * r.x + 11 * c.x + 41 * ch.x + i.doc_id) % 256)
              AS BIGINT) AS pixel_sum
  FROM ids i, range(0, 16) r(x), range(0, 32) c(x), range(0, 3) ch(x)
  WHERE r.x < i.h AND c.x < i.w AND ch.x < i.nch
  GROUP BY i.doc_id
)
SELECT i.doc_id,
       CAST(i.w AS INTEGER) AS width,
       CAST(i.h AS INTEGER) AS height,
       CAST(i.nch AS INTEGER) AS channels,
       m.pixel_sum,
       TRUE AS ok_format,
       TRUE AS ok_lossless
FROM ids i JOIN m USING (doc_id)
ORDER BY doc_id
"""


@register(
    "multimodal_png_roundtrip",
    oracle=_ORACLE_PNG,
    tags=("multimodal", "north-star"),
    doc=(
        "REAL compressed-image LOSSLESS round-trip: genuine PNGs (pure "
        "stdlib-zlib codec, multimodal/png.py — IHDR/IDAT/IEND chunk "
        "walk, per-chunk CRC-32, DEFLATE scanlines, adaptive filter "
        "types 0-4 incl. Paeth) are encoded into the binary column and "
        "decoded back inside one Arrow-batched mapInPandas.  Greyscale "
        "and RGB both exercised (channels keyed on doc_id).  Because PNG "
        "is lossless, the DuckDB oracle recomputes the EXACT decoded "
        "pixel sum from the generation rule — with ok_format certifying "
        "the signature/CRC walk and ok_lossless certifying decoded == "
        "original pixel-for-pixel.  Closes the compressed-image seam "
        "beside the lossy JPEG codec (multimodal_jpeg_roundtrip)."
    ),
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..multimodal.binary_ops import attach_png_image, png_pixels_for_doc
    from ..multimodal.png import decode_png

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 2)
    )
    imgs = attach_png_image(docs)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_lossless", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["image_bytes"]):
                payload = bytes(payload)
                ok_format = payload[:8] == b"\x89PNG\r\n\x1a\n"
                w, h, dec = decode_png(payload)  # verifies every chunk CRC
                _, _, channels, orig = png_pixels_for_doc(doc_id)
                dec3 = dec.reshape(h, w, channels)
                ok_lossless = bool(np.array_equal(dec3, orig))
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        channels,
                        int(dec3.astype(np.int64).sum()),
                        ok_format,
                        ok_lossless,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return imgs.mapInPandas(kernel, schema=schema).orderBy("doc_id")


# -- QOI lossless round-trip (r9b): dictionary/delta/RLE image codec ---------------

# QOI (qoiformat.org, spec v1.0) is LOSSLESS like PNG, so the oracle pins
# the decoded pixel SUM bit-for-bit against a pure-SQL recomputation of the
# generation rule (binary_ops.qoi_pixels_for_doc) — alpha lane included.
_ORACLE_QOI = """
WITH ids AS (
  SELECT doc_id,
         4 + doc_id % 29 AS w,
         3 + doc_id % 14 AS h,
         CASE WHEN doc_id % 4 = 0 THEN 4 ELSE 3 END AS nch
  FROM documents WHERE doc_id % 7 = 4
),
m AS (
  SELECT i.doc_id,
         CAST(SUM((5 * r.x + 13 * (c.x // 3) + 37 * ch.x + i.doc_id) % 256)
              AS BIGINT) AS pixel_sum
  FROM ids i, range(0, 16) r(x), range(0, 32) c(x), range(0, 4) ch(x)
  WHERE r.x < i.h AND c.x < i.w AND ch.x < i.nch
  GROUP BY i.doc_id
)
SELECT i.doc_id,
       CAST(i.w AS INTEGER) AS width,
       CAST(i.h AS INTEGER) AS height,
       CAST(i.nch AS INTEGER) AS channels,
       m.pixel_sum,
       TRUE AS ok_format,
       TRUE AS ok_lossless
FROM ids i JOIN m USING (doc_id)
ORDER BY doc_id
"""


@register(
    "multimodal_qoi_roundtrip",
    oracle=_ORACLE_QOI,
    tags=("multimodal",),
    doc=(
        "REAL QOI image LOSSLESS round-trip: genuine spec-complete QOI "
        "files (qoiformat.org v1.0 — 64-slot color-index hashing, "
        "wrapping DIFF/LUMA deltas, RGB/RGBA literals, run-length ops, "
        "end marker; multimodal/qoi.py) are encoded into the binary "
        "column and decoded back inside one Arrow-batched mapInPandas.  "
        "RGB and RGBA both exercised (alpha lane keyed on doc_id), and "
        "the generation rule's 3-pixel bands force real QOI_OP_RUN "
        "chunks.  The DuckDB oracle recomputes the EXACT decoded pixel "
        "sum from the generation rule; ok_lossless certifies decoded == "
        "original pixel-for-pixel.  Completes the codec family's "
        "dictionary/delta/RLE quadrant beside PNG (DEFLATE+filters), "
        "JPEG (DCT) and FLAC (prediction+Rice)."
    ),
)
def multimodal_qoi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..multimodal.binary_ops import attach_qoi_image, qoi_pixels_for_doc
    from ..multimodal.qoi import decode_qoi

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 4)
    )
    imgs = attach_qoi_image(docs)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_lossless", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["image_bytes"]):
                payload = bytes(payload)
                ok_format = payload[:4] == b"qoif"
                w, h, ch, dec = decode_qoi(payload)  # verifies end marker
                _, _, channels, orig = qoi_pixels_for_doc(doc_id)
                arr = np.frombuffer(dec, dtype=np.uint8).reshape(h, w, ch)
                ok_lossless = bool(np.array_equal(arr, orig))
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        ch,
                        int(arr.astype(np.int64).sum()),
                        ok_format,
                        ok_lossless,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return imgs.mapInPandas(kernel, schema=schema).orderBy("doc_id")


def _raw_leads_oracle() -> str:
    """Differential oracle for the raw-leads pipeline: the deterministic
    per-form lead fixture rows (sources/meta_fixtures.gen_leads, exactly
    what the correlated mapInPandas fetch returns) inlined as VALUES, with
    the transform — created_time day coercion via TRY_CAST and keep-first
    dedup per lead_id — re-implemented in DuckDB SQL."""
    from ..sources import meta_fixtures

    def q(v):
        if v is None:
            return "NULL"
        return "'" + str(v).replace("'", "''") + "'"

    vals = []
    for form in meta_fixtures.gen_forms():
        for r in meta_fixtures.gen_leads(form["id"]):
            vals.append(
                "(" + ", ".join(
                    q(r[k])
                    for k in (
                        "lead_id", "created_time", "ad_id", "campaign_id",
                        "adset_id", "form_id", "field_data",
                        "ad_platform_data",
                    )
                ) + ")"
            )
    return (
        "WITH raw(lead_id, created_time, ad_id, campaign_id, adset_id, "
        "form_id, field_data, ad_platform_data) AS (VALUES "
        + ", ".join(vals)
        + """),
dated AS (
  SELECT lead_id, TRY_CAST(created_time AS DATE) AS created_time,
         ad_id, campaign_id, adset_id, form_id, field_data,
         CAST(ad_platform_data AS VARCHAR) AS ad_platform_data
  FROM raw
)
SELECT lead_id, created_time, ad_id, campaign_id, adset_id, form_id,
       field_data, ad_platform_data
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lead_id
                                   ORDER BY created_time ASC NULLS LAST,
                                            form_id) AS rn
      FROM dated)
WHERE rn = 1
""")


@register(
    "meta_raw_leads_pipeline",
    oracle=_raw_leads_oracle(),
    tags=("reference-parity", "pipeline"),
    doc=(
        "Latent ads_raw_leads path (reference extract.py:60-100, never wired "
        "into main.py): per-form correlated lead fetch via executor-parallel "
        "mapInPandas, day-coerced created_time, JSONB-ready field_data, "
        "keep-first dedup per lead_id."
    ),
)
def meta_raw_leads_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.pipelines import run_raw_leads

    pin_query_session_conf(spark)
    return run_raw_leads(MetaRestSource(spark))


@register(
    "stream_upsert_foreachbatch",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    tags=("streaming", "sink"),
    doc=(
        "End-to-end incremental pattern (the reference's Jenkins-cron + "
        "ON CONFLICT merge, README.md:115-127 + load.py:94-116): events "
        "stream -> foreachBatch key-merge into a parquet target -> read "
        "back. Idempotent by key, so the merged table equals the input."
    ),
)
def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import foreach_batch_upsert

    pin_query_session_conf(spark)
    stream = read_events_stream(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="stream_upsert_")
    target = f"{tmp}/events_merged.parquet"
    q = foreach_batch_upsert(stream, target, keys=["event_id"], checkpoint_dir=f"{tmp}/ckpt")
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


#: total_value_cents is the sum of PER-EVENT integer cents (round(v*100)
#: per event), matching the stateful kernel's accumulator — per-event
#: quantization is the only contract that is micro-batch-partition
#: independent once values carry full double precision (r11 sf0.01 refresh).
_ORACLE_STATEFUL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_value_cents,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


@register(
    "stream_stateful_counters",
    oracle=_ORACLE_STATEFUL,
    tags=("streaming", "stateful"),
    doc=(
        "Custom stateful streaming operator via applyInPandasWithState: "
        "per-user running counters in explicit group state. Update-mode "
        "emissions reduced to the final state per user (counters are "
        "monotone), so the batch-SQL oracle applies."
    ),
)
def stream_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..streaming.windows import stateful_user_counters

    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = stateful_user_counters(read_events_stream(spark, sf_dir))
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            out = run_available_now(stream, ckpt, output_mode="update")
    # Update mode re-emits a user's row each micro-batch it appears in; the
    # counters are monotone, so the final state is the per-user max.
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value_cents").alias("total_value_cents"),
        F.max("last_ts").alias("last_ts"),
    )


_ORACLE_STREAM_STATIC = """
WITH user_dim AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
SELECT e.event_type,
       CASE WHEN e.ts = u.first_ts THEN 1 ELSE 0 END AS is_first,
       COUNT(*) AS n_events
FROM events e JOIN user_dim u ON e.user_id = u.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "stream_static_enrich",
    oracle=_ORACLE_STREAM_STATIC,
    tags=("streaming", "join"),
    doc=(
        "Stream-static broadcast enrichment: the events stream joins a "
        "batch user dimension (first-seen timestamp, computed once and "
        "broadcast to every micro-batch), then counts events per "
        "(type, is-first-event). Oracle is the equivalent batch self-join "
        "(stream/batch parity)."
    ),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..streaming.windows import enrich_with_static_dim

    pin_query_session_conf(spark)
    user_dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = enrich_with_static_dim(read_events_stream(spark, sf_dir), user_dim)
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            out = run_available_now(stream, ckpt)
    return out.orderBy("event_type", "is_first")


@register(
    "meta_dsv2_dimension_scan",
    oracle=_ORACLE_DIM_DSV2,
    tags=("source", "dsv2"),
    doc=(
        "Ads dimension built over the Python DataSource V2 reader "
        "(sources/meta_dsv2.py): partition-per-page parallel scan with the "
        "status IN-list accepted by pushFilters and executed by the "
        "(fake) endpoint, nested adset/campaign structs flattened, "
        "keep-last dedup to the ad grain. Differential oracle: the raw "
        "fixture rows inlined as VALUES, transform re-implemented in SQL."
    ),
)
def meta_dsv2_dimension_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sources.meta_dsv2 import register_meta_source

    pin_query_session_conf(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_meta_source(spark)
    ads = (
        spark.read.format("meta_ads")
        .load()
        .where(
            F.col("effective_status").isin("ACTIVE", "PAUSED", "PENDING_REVIEW")
        )
    )
    w = Window.partitionBy("ad_id").orderBy(F.col("ad_name").desc())
    return (
        ads.select(
            F.col("id").alias("ad_id"),
            F.col("name").alias("ad_name"),
            "adset_id",
            F.col("adset.name").alias("adset_name"),
            "campaign_id",
            F.col("campaign.name").alias("campaign_name"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("ad_id")
    )




def _stream_ingest_oracle() -> str:
    """Differential oracle for the streaming ingest: the stream source
    serves exactly the no-breakdown insights fixture day-by-day, so the
    daily rollup must equal the same aggregate over the raw rows (inlined
    as (date_start, ad_id) VALUES)."""
    from ..sources import meta_fixtures

    vals = ", ".join(
        f"('{r['date_start']}', '{r['ad_id']}')"
        for r in meta_fixtures.gen_insights(())
    )
    return (
        "WITH raw(date_start, ad_id) AS (VALUES "
        + vals
        + """)
SELECT date_start, COUNT(*) AS n_rows, COUNT(DISTINCT ad_id) AS n_ads
FROM raw GROUP BY date_start ORDER BY date_start
"""
    )


@register(
    "meta_stream_insights_ingest",
    oracle=_stream_ingest_oracle(),
    tags=("streaming", "source", "dsv2"),
    doc=(
        "Streaming ingestion through the Python DataSourceStreamReader "
        "(sources/meta_dsv2.py): day-indexed offsets over the insights "
        "edge, run to completion with availableNow into a parquet sink "
        "(checkpointed, exactly-once), then aggregated to daily ad counts. "
        "The streaming-native form of the reference's daily cron re-scan. "
        "Differential oracle: raw (date_start, ad_id) fixture pairs "
        "inlined as VALUES, same daily rollup in SQL."
    ),
)
def meta_stream_insights_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..sources.meta_dsv2 import register_meta_stream_source

    pin_query_session_conf(spark)
    register_meta_stream_source(spark)
    tmp = tempfile.mkdtemp(prefix="meta_stream_")
    out = f"{tmp}/ingested"
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        q = (
            spark.readStream.format("meta_insights_stream")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("date_start")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("ad_id").alias("n_ads"),
        )
        .orderBy("date_start")
    )



_ORACLE_STREAM_CHAINED = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY 1
)
SELECT CAST(date_trunc('day', h) AS DATE) AS day,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_hours
FROM hourly GROUP BY 1
"""


@register(
    "stream_chained_windows",
    oracle=_ORACLE_STREAM_CHAINED,
    tags=("streaming",),
    doc=(
        "Chained stateful operators in one streaming query (Spark 3.4+ "
        "multiple-stateful-operator support): hourly tumbling counts -> "
        "daily re-aggregation with active-hour counts, watermark "
        "propagating through both (window_time); append mode as multiple "
        "stateful operators require, with a far-future sentinel row "
        "advancing the final watermark so trailing windows flush under "
        "Trigger.AvailableNow; oracle-checked against the equivalent "
        "two-level batch rollup."
    ),
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import chained_hourly_to_daily

    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        stream = chained_hourly_to_daily(
            read_events_stream(spark, sf_dir, sentinel=True)
        )
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            return run_available_now(stream, ckpt, output_mode="append")


@register(
    "multimodal_image_resize",
    oracle=None,
    tags=("multimodal", "north-star"),
    doc=(
        "REAL image resize pipeline: PPM files decoded, nearest-neighbor "
        "resampled to 16x16, re-encoded — all inside Arrow-batched "
        "mapInPandas; output rows carry the resized genuine PPM payloads "
        "plus integrity metadata (byte size, crc32). No SQL oracle: the "
        "resampled payload exists only through the Python codec; the "
        "crc32/byte-size integrity columns are pinned by codec unit "
        "tests + the rows-only check."
    ),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..multimodal.binary_ops import attach_ppm_image, resize_images

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    resized = resize_images(attach_ppm_image(docs), width=16, height=16)
    # F.crc32 is the JVM-side CRC-32 (IEEE, same polynomial as zlib.crc32) —
    # no Python round-trip for the integrity checksum.
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("image_bytes").alias("n_bytes"),
        F.crc32("image_bytes").alias("crc32"),
    )


# -- Multi-batch incremental exact dedup stream -------------------------------

_ORACLE_STREAM_INCR_DEDUP = r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT min(doc_id) AS doc_id, fingerprint
FROM fp
GROUP BY fingerprint
ORDER BY doc_id
"""


@register(
    "stream_incremental_dedup",
    oracle=_ORACLE_STREAM_INCR_DEDUP,
    tags=("streaming", "dedup", "north-star"),
    doc=(
        "First-seen-wins exact dedup as a REAL multi-micro-batch streaming "
        "pipeline: the corpus replays as 5 ordered file batches "
        "(maxFilesPerTrigger=1), each batch collapses its own duplicates "
        "(min doc_id per fingerprint), anti-joins the persistent "
        "fingerprint store, and appends only never-seen fingerprints — the "
        "reference's cron rescan + ON CONFLICT DO NOTHING ingest "
        "(load.py:94-119) made incremental. Chunks are doc_id-monotone, so "
        "first-seen == global-min doc_id and the batch-SQL oracle is "
        "exact. Store state is O(distinct fingerprints); each batch "
        "shuffles only itself, never the history."
    ),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import (
        chunked_docs_stream_dir,
        incremental_exact_dedup,
    )

    pin_query_session_conf(spark)
    stream_dir = chunked_docs_stream_dir(spark, sf_dir, n_chunks=5)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        # Stable per-(sf_dir) run dir, wiped at the START of each call so the
        # returned DataFrame stays parquet-backed (no driver collect round-
        # trip) — the store outlives this function; the next call cleans it.
        run = _fresh_run_dir("incr_dedup", sf_dir)
        store = f"{run}/store.parquet"
        q = incremental_exact_dedup(spark, stream_dir, store, f"{run}/ckpt")
        q.awaitTermination()
        return (
            spark.read.parquet(store)
            .select("doc_id", "fingerprint")
            .orderBy("doc_id")
        )


_ORACLE_STREAM_NEARDUP = r"""
WITH sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS s
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
       unnest(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
),
mh AS (
  SELECT doc_id, r.i AS hi,
         MIN(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || s), 1, 8))::BIGINT)
           AS h
  FROM sh, unnest(range(0, 16)) AS r(i)
  GROUP BY doc_id, r.i
),
sig AS (
  SELECT doc_id, list(h ORDER BY hi) AS sig FROM mh GROUP BY doc_id
),
band AS (
  SELECT doc_id, b.j AS band_id,
         md5(array_to_string(sig[b.j * 4 + 1 : b.j * 4 + 4], ':')) AS bh
  FROM sig, unnest(range(0, 4)) AS b(j)
),
sup AS (
  SELECT b1.doc_id, MIN(b2.doc_id) AS suppressor
  FROM band b1
  JOIN band b2 ON b1.band_id = b2.band_id AND b1.bh = b2.bh
              AND b2.doc_id < b1.doc_id
  GROUP BY b1.doc_id
)
SELECT d.doc_id,
       s.suppressor IS NULL AS is_kept,
       s.suppressor
FROM documents d
LEFT JOIN sup s USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "stream_incremental_neardup",
    oracle=_ORACLE_STREAM_NEARDUP,
    tags=("streaming", "dedup", "minhash", "north-star"),
    doc=(
        "Streaming NEAR-dup suppression: the corpus replays as 5 ordered "
        "micro-batches; each document's MinHash-LSH band buckets (md5 "
        "cross-engine family, 16-min signature, 4x4 bands) probe a "
        "persistent first-seen bucket store and the within-batch bucket "
        "minima — suppressed iff ANY band was seen by a smaller doc_id, "
        "with the smallest such doc recorded as the suppressor. Monotone "
        "chunk replay makes the incremental result equal the batch rule "
        "'min earlier doc sharing any band', so the full (doc, is_kept, "
        "suppressor) output is value-exact against SQL. Store is "
        "O(distinct buckets); batches never rescan history."
    ),
)
def stream_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import (
        chunked_docs_stream_dir,
        incremental_neardup_suppress,
    )

    pin_query_session_conf(spark)
    stream_dir = chunked_docs_stream_dir(spark, sf_dir, n_chunks=5)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        run = _fresh_run_dir("incr_neardup", sf_dir)
        q = incremental_neardup_suppress(
            spark,
            stream_dir,
            f"{run}/buckets.parquet",
            f"{run}/results.parquet",
            f"{run}/ckpt",
        )
        q.awaitTermination()
        return (
            spark.read.parquet(f"{run}/results.parquet")
            .select("doc_id", "is_kept", "suppressor")
            .orderBy("doc_id")
        )


_ORACLE_LAKE_SINK = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
         AS total_value_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "stream_lakehouse_append_sink",
    oracle=_ORACLE_LAKE_SINK,
    tags=("streaming", "lakehouse", "sink", "north-star"),
    doc=(
        "Exactly-once streaming ingest into the manifest-versioned table "
        "(operators/lakehouse.py): the events corpus streams in 4 "
        "micro-batches (maxFilesPerTrigger=1), each foreachBatch commits "
        "an APPEND version keyed by the micro-batch id — and then "
        "deliberately commits AGAIN with the same txn_id, simulating the "
        "failure-retry Structured Streaming guarantees will happen. The "
        "idempotent-commit protocol makes the retry a no-op, so the "
        "final table read back through its manifest aggregates to "
        "exactly the batch answer — the oracle's value equality IS the "
        "proof that no micro-batch was lost or double-applied. Append "
        "commits cost O(batch); the table is never rewritten."
    ),
)
def stream_lakehouse_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.safe_math import dec
    from ..operators.lakehouse import commit_append, read_version

    pin_query_session_conf(spark)
    run = _fresh_run_dir("lake_sink", sf_dir)
    src = f"{run}/src"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ev.repartitionByRange(4, "event_id").write.parquet(src)
    schema = spark.read.parquet(src).schema
    table = f"{run}/table"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        commit_append(batch_df, table, txn_id=f"b{batch_id}")
        commit_append(batch_df, table, txn_id=f"b{batch_id}")  # retried batch
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{run}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        read_version(spark, table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value", "decimal(18,4)")) * 100, 0)
            .cast("long")
            .alias("total_value_cents"),
        )
        .orderBy("event_type")
    )


# -- binaryFile source: opaque-asset ingestion off the filesystem --------------

_BF_N_FILES = 64

_ORACLE_BINARYFILE = f"""
WITH spec AS (
  SELECT i AS file_idx, 2 + i % 3 AS w, 2 + i % 4 AS h
  FROM (SELECT unnest(range({_BF_N_FILES})) AS i)
)
SELECT file_idx,
       CAST(length('P6' || chr(10) || w || ' ' || h || chr(10) || '255'
                   || chr(10)) + 3 * w * h AS BIGINT) AS byte_len,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height
FROM spec
ORDER BY file_idx
"""


@register(
    "multimodal_binaryfile_scan",
    oracle=_ORACLE_BINARYFILE,
    tags=("multimodal", "io", "source"),
    doc=(
        "binaryFile-source ingestion: raw image assets (one PPM per file, "
        "dimensions varying per index) are read straight off the "
        "filesystem with spark.read.format('binaryFile') — the scan shape "
        "a multimodal corpus has BEFORE it is packed into parquet binary "
        "columns — and the header is parsed from the binary content with "
        "pure JVM expressions (decode + regexp), no Python. The oracle "
        "recomputes byte length and dimensions from the generation rule, "
        "value-verifying the write -> binaryFile scan -> parse round trip "
        "(path/mtime columns are projected away: content-derived values "
        "only). At 100 TB: binaryFile splits per-file (no intra-file "
        "parallelism) and a files-per-task listing cost, which is exactly "
        "why the pipeline's next step is packing into parquet "
        "(multimodal_image_* consume that layout); pathGlobFilter + "
        "recursiveFileLookup prune the listing server-side."
    ),
)
def multimodal_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import functions as F

    from ..multimodal.codecs import encode_ppm

    pin_query_session_conf(spark)
    d = tempfile.mkdtemp(prefix="binaryfile_")
    for i in range(_BF_N_FILES):
        w, h = 2 + i % 3, 2 + i % 4
        rgb = bytes((i * 7 + j) % 256 for j in range(3 * w * h))
        with open(os.path.join(d, f"img_{i:04d}.ppm"), "wb") as f:
            f.write(encode_ppm(w, h, rgb))
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(d)
    )
    header = F.decode(F.substring("content", 1, 32), "ISO-8859-1")
    return (
        bf.select(
            F.regexp_extract(
                F.element_at(F.split("path", "/"), -1), r"img_(\d+)\.ppm", 1
            )
            .cast("long")
            .alias("file_idx"),
            F.col("length").alias("byte_len"),
            F.regexp_extract(header, r"P6\n(\d+) (\d+)\n", 1)
            .cast("long")
            .alias("width"),
            F.regexp_extract(header, r"P6\n(\d+) (\d+)\n", 2)
            .cast("long")
            .alias("height"),
        )
        .orderBy("file_idx")
    )


_ORACLE_CDC_LAKE_MERGE = """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(round(CAST(value AS DECIMAL(18,4)) * 100, 0) AS BIGINT)
           AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@register(
    "stream_cdc_lakehouse_merge",
    oracle=_ORACLE_CDC_LAKE_MERGE,
    tags=("streaming", "lakehouse", "cdc", "north-star"),
    doc=(
        "Streaming CDC apply INTO the manifest lakehouse "
        "(operators/lakehouse.py: merge_into): the events corpus becomes "
        "a changelog (key=user_id, error rows are tombstones, everything "
        "else upserts the row's cents value), sharded into 4 KEY-RANGE "
        "files so each key's full history lives in exactly one "
        "micro-batch — batch arrival order then cannot change the result "
        "(cross-batch ordering would need sequence-number fencing; "
        "documented, not silently assumed). Each foreachBatch micro-batch "
        "resolves keep-last per key (ts, event_id ordering), then MERGEs "
        "copy-on-write — and every batch is deliberately applied TWICE: "
        "MERGE is content-idempotent (re-update to the same values, "
        "re-delete of an absent key, re-insert of a now-matched key all "
        "converge), which is the recovery property a replayed micro-batch "
        "needs. Oracle: global keep-last per key over the raw changelog, "
        "tombstones dropped."
    ),
)
def stream_cdc_lakehouse_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.safe_math import dec
    from ..operators.lakehouse import commit_version, merge_into, read_version

    pin_query_session_conf(spark)
    run = _fresh_run_dir("cdc_lake_merge", sf_dir)
    src = f"{run}/changelog"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "error").alias("is_del"),
        (F.round(dec("value", "decimal(18,4)") * 100, 0))
        .cast("bigint")
        .alias("cents"),
    )
    ev.repartitionByRange(4, "user_id").write.parquet(src)
    schema = spark.read.parquet(src).schema
    table = f"{run}/state"
    # seed an empty v1 so the first merge has a snapshot to merge into
    commit_version(
        spark.createDataFrame([], "user_id long, cents long").coalesce(1),
        table,
        stats_cols=("user_id",),
    )

    def apply_cdc(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        last = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "cents", "is_del")
        )
        merge_into(spark, table, last, key="user_id", delete_col="is_del",
                   stats_cols=("user_id",))
        # replayed micro-batch: content-idempotent by MERGE semantics
        merge_into(spark, table, last, key="user_id", delete_col="is_del",
                   stats_cols=("user_id",))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_cdc)
        .option("checkpointLocation", f"{run}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_version(spark, table).orderBy("user_id")


_ORACLE_CDC_FENCED = """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(round(CAST(value AS DECIMAL(18,4)) * 100, 0) AS BIGINT)
           AS cents,
         event_id AS seq,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC)
           AS rn
  FROM events
)
SELECT user_id, cents, CAST(seq AS BIGINT) AS seq
FROM ranked WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@register(
    "stream_cdc_fenced_apply",
    oracle=_ORACLE_CDC_FENCED,
    tags=("streaming", "lakehouse", "cdc", "north-star"),
    doc=(
        "Sequence-FENCED streaming CDC apply — the cross-batch-ordering "
        "companion to stream_cdc_lakehouse_merge: here the changelog is "
        "sharded ARBITRARILY (by event_id range, so one key's history "
        "spans batches and batch arrival order is NOT aligned with "
        "change order), and correctness comes from monotonic "
        "sequence-number fencing instead: each micro-batch unions the "
        "current snapshot with the batch and keeps, per key, the row "
        "with the highest sequence number — a stale or replayed change "
        "can never overwrite a newer state (the Debezium/Delta "
        "applyChanges rule). Every batch is applied twice to prove "
        "replay idempotency. Tombstones carry through the keep-last "
        "with their seq (so a late pre-delete upsert loses) and filter "
        "out at read. Trade-off vs the key-bounded COW merge is "
        "documented: fencing rewrites O(state) per batch (state is the "
        "compacted per-key table, not the log), the right shape when "
        "changes cannot be key-partitioned at the source."
    ),
)
def stream_cdc_fenced_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.safe_math import dec
    from ..operators.lakehouse import commit_version, read_version, versions

    pin_query_session_conf(spark)
    run = _fresh_run_dir("cdc_fenced", sf_dir)
    src = f"{run}/changelog"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        (F.col("event_type") == "error").alias("is_del"),
        (F.round(dec("value", "decimal(18,4)") * 100, 0))
        .cast("bigint")
        .alias("cents"),
    )
    # shard by event_id range: a key's changes SPAN batches on purpose
    ev.repartitionByRange(4, "seq").write.parquet(src)
    schema = spark.read.parquet(src).schema
    table = f"{run}/state"
    commit_version(
        spark.createDataFrame(
            [], "user_id long, cents long, seq long, is_del boolean"
        ).coalesce(1),
        table,
    )

    def apply_fenced(batch_df: DataFrame, batch_id: int) -> None:
        for _ in range(2):  # deliberate replay: fencing makes it a no-op
            cur = read_version(spark, table)
            merged = cur.unionByName(
                batch_df.select("user_id", "cents", "seq", "is_del")
            )
            w = Window.partitionBy("user_id").orderBy(F.col("seq").desc())
            latest = (
                merged.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .drop("rn")
            )
            commit_version(latest, table)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_fenced)
        .option("checkpointLocation", f"{run}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        read_version(spark, table)
        .where(~F.col("is_del"))
        .select("user_id", "cents", F.col("seq").cast("bigint").alias("seq"))
        .orderBy("user_id")
    )


# Streaming HLL: the sketch's MAX-register state is exactly the kind of
# small mergeable aggregate streaming engines are built around — the
# running register table (days x 64 cells) IS the stream state, and the
# estimate projects off whatever the state holds at any trigger.
_ORACLE_STREAM_HLL = """
WITH regs AS (
  SELECT CAST(ts AS DATE) AS day, (h >> 54) AS reg_idx,
         MAX(CASE WHEN (h & 18014398509481983) = 0 THEN 55
                  ELSE 55 - length(bin(h & 18014398509481983)) END)
           AS max_rank
  FROM (SELECT ts,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                 AS h
        FROM events WHERE user_id IS NOT NULL)
  GROUP BY day, reg_idx
)
SELECT day,
       CAST(SUM(1::BIGINT << (55 - max_rank))
            + (64 - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS sum_inv,
       CAST(64 - COUNT(*) AS INTEGER) AS n_zero
FROM regs GROUP BY day ORDER BY day
"""


@register(
    "stream_hll_daily_users",
    oracle=_ORACLE_STREAM_HLL,
    tags=("streaming", "sketch", "scale"),
    doc=(
        "HyperLogLog register state maintained INSIDE Structured "
        "Streaming: the per-(day, register) MAX-rank aggregate runs as "
        "the streaming stateful operator (complete mode under "
        "AvailableNow replay), so the stream's state store holds <= days "
        "x 64 BIGINT cells — the sketch IS the state, distinct users are "
        "never buffered. The exact BIGINT harmonic sum projects off the "
        "replayed state and must equal the batch registers bit-for-bit "
        "(stream/batch parity, the same contract as the other stream_* "
        "rows; estimate derivation is pinned by agg_hll_distinct_sketch)."
    ),
)
def stream_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.sketches import hll_rank_cols

    pin_query_session_conf(spark)
    with scoped_conf(spark, **{"spark.sql.shuffle.partitions": "8"}):
        ev = read_events_stream(spark, sf_dir).where(
            F.col("user_id").isNotNull()
        )
        idx, rank = hll_rank_cols("user_id")
        regs = (
            ev.select(F.col("ts").cast("date").alias("day"), idx, rank)
            .groupBy("day", "reg_idx")
            .agg(F.max("rank").alias("max_rank"))
        )
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            state = run_available_now(regs, ckpt)
    two55 = 1 << 55
    return (
        state.groupBy("day")
        .agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - max_rank)"))
                + (F.lit(64) - F.count("*")) * F.lit(two55)
            )
            .cast("bigint")
            .alias("sum_inv"),
            (F.lit(64) - F.count("*")).cast("int").alias("n_zero"),
        )
        .orderBy("day")
    )


# -- G.711 mu-law audio round-trip (r8): REAL compressed-audio codec ----------------

_ORACLE_G711 = """
WITH b AS (  -- the i-th UTF-8 byte of each document's text
  SELECT d.doc_id,
         ('0x' || substr(hex(d.text), 2 * CAST(u.i AS INT) - 1, 2))::INT
           AS byte
  FROM documents d,
       unnest(range(1, strlen(d.text) + 1)) AS u(i)
),
s AS (  -- linear sample (16-bit scale), then the G.711 encode/decode math
  SELECT doc_id, (byte - 128) * 64 AS x FROM b
),
enc AS (
  SELECT doc_id, x,
         CASE WHEN x < 0 THEN 128 ELSE 0 END AS sign,
         least(abs(x), 32635) + 132 AS m
  FROM s
),
seg AS (
  SELECT doc_id, x, sign, m,
         CASE WHEN m > 16383 THEN 7 WHEN m > 8191 THEN 6
              WHEN m > 4095 THEN 5 WHEN m > 2047 THEN 4
              WHEN m > 1023 THEN 3 WHEN m > 511 THEN 2
              WHEN m > 255 THEN 1 ELSE 0 END AS k
  FROM enc
),
code AS (
  SELECT doc_id, x,
         255 - (sign | (k << 4) | ((m >> (k + 3)) & 15)) AS c
  FROM seg
),
dec AS (
  SELECT doc_id, x, c,
         CASE WHEN ((255 - c) & 128) <> 0
              THEN -(((((255 - c) & 15) << 3) + 132)
                     << (((255 - c) >> 4) & 7)) + 132
              ELSE (((((255 - c) & 15) << 3) + 132)
                    << (((255 - c) >> 4) & 7)) - 132 END AS y
  FROM code
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(c) AS BIGINT) AS code_sum,
         CAST(SUM((x - y) * (x - y)) AS BIGINT) AS err_sq_sum,
         CAST(MAX(abs(x - y)) AS BIGINT) AS max_abs_err
  FROM dec GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_samples, 0) AS n_samples,
       COALESCE(p.code_sum, 0) AS code_sum,
       COALESCE(p.err_sq_sum, 0) AS err_sq_sum,
       COALESCE(p.max_abs_err, 0) AS max_abs_err,
       TRUE AS ok_format
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "multimodal_g711_roundtrip",
    oracle=_ORACLE_G711,
    tags=("multimodal", "north-star"),
    doc=(
        "REAL compressed-audio round-trip: per document, linear samples "
        "(16-bit scale, derived from the text's UTF-8 bytes) are G.711 mu-law "
        "companded and wrapped in a GENUINE format-7 RIFF/WAV by the "
        "pure-numpy codec (multimodal/g711.py, from the public ITU-T "
        "G.711 spec), then the container is chunk-walked back and decoded "
        "— all inside one Arrow-batched mapInPandas. Because mu-law is "
        "pure integer segment/mantissa arithmetic (unlike JPEG's float "
        "DCT), the DuckDB oracle recomputes EVERY code byte and decoded "
        "sample bit-for-bit from the same text bytes — the strongest "
        "oracle any codec here has: code_sum proves the container "
        "round-trip byte-exactly, err_sq_sum/max_abs_err pin the "
        "spec-mandated quantization error, ok_format certifies the "
        "format-7 header parse. Closes the compressed-audio seam the "
        "MP3 NotImplementedError discloses (psychoacoustic codecs stay "
        "out of scope; companding is the honest real one)."
    ),
)
def multimodal_g711_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.g711 import (
        decode_wav_mulaw,
        encode_wav_mulaw,
        mulaw_encode,
    )

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("code_sum", T.LongType()),
            T.StructField("err_sq_sum", T.LongType()),
            T.StructField("max_abs_err", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                raw = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                x = (raw.astype(np.int64) - 128) * 64
                payload = encode_wav_mulaw(x.astype(np.int16), 8000)
                try:
                    rate, y = decode_wav_mulaw(payload)
                    ok = rate == 8000 and len(y) == len(x)
                except ValueError:
                    ok, y = False, np.zeros(len(x), dtype=np.int64)
                # code_sum from the CONTAINER's data chunk bytes (proves
                # the RIFF walk), not from re-encoding in memory
                codes = (
                    np.frombuffer(payload[-len(x) :], dtype=np.uint8)
                    if len(x)
                    else np.zeros(0, dtype=np.uint8)
                )
                ok = ok and bool(
                    (codes == mulaw_encode(x)).all() if len(x) else True
                )
                err = x - y.astype(np.int64)
                out.append(
                    (
                        doc_id,
                        len(x),
                        int(codes.astype(np.int64).sum()),
                        int((err * err).sum()),
                        int(np.abs(err).max()) if len(x) else 0,
                        ok,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    spread = docs.repartition(spark.sparkContext.defaultParallelism)
    return spread.mapInPandas(kernel, schema=schema).orderBy("doc_id")


# -- GIF87a lossless round-trip (r9d): real LZW dictionary coding ------------------

_ORACLE_GIF = """
WITH ids AS (
  SELECT doc_id,
         6 + doc_id % 27 AS w,
         4 + doc_id % 12 AS h
  FROM documents WHERE doc_id % 7 = 5
),
m AS (
  SELECT i.doc_id,
         CAST(SUM((11 * r.x + 17 * (c.x // 4) + i.doc_id) % 256)
              AS BIGINT) AS pixel_sum
  FROM ids i, range(0, 15) r(x), range(0, 32) c(x)
  WHERE r.x < i.h AND c.x < i.w
  GROUP BY i.doc_id
)
SELECT i.doc_id,
       CAST(i.w AS INTEGER) AS width,
       CAST(i.h AS INTEGER) AS height,
       m.pixel_sum,
       TRUE AS ok_format,
       TRUE AS ok_lossless
FROM ids i JOIN m USING (doc_id)
ORDER BY doc_id
"""


@register(
    "multimodal_gif_roundtrip",
    oracle=_ORACLE_GIF,
    tags=("multimodal",),
    doc=(
        "REAL GIF87a LOSSLESS round-trip: genuine browser-openable GIFs "
        "(pure-stdlib codec, multimodal/gif.py — logical screen "
        "descriptor, 256-gray global color table, and real LZW with "
        "variable-width codes, CLEAR/EOI control codes, the KwKwK "
        "decoder case, and the 4096-entry dictionary-reset protocol) "
        "encoded into the binary column and decoded back inside one "
        "Arrow-batched mapInPandas.  The generation rule's 4-pixel "
        "bands force real LZW back-references.  8-bit grayscale "
        "indices are lossless, so the DuckDB oracle recomputes the "
        "EXACT decoded pixel sum from the rule; completes the codec "
        "family's dictionary-coding quadrant beside PNG (LZ77+Huffman), "
        "QOI (index/delta/RLE), JPEG (DCT) and FLAC (prediction+Rice)."
    ),
)
def multimodal_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..multimodal.binary_ops import attach_gif_image, gif_pixels_for_doc
    from ..multimodal.gif import decode_gif

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 5)
    )
    imgs = attach_gif_image(docs)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
            T.StructField("ok_lossless", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["image_bytes"]):
                payload = bytes(payload)
                ok_format = payload[:6] == b"GIF87a"
                w, h, dec = decode_gif(payload)
                _, _, orig = gif_pixels_for_doc(doc_id)
                arr = np.frombuffer(dec, dtype=np.uint8).reshape(h, w)
                ok_lossless = bool(np.array_equal(arr, orig))
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        int(arr.astype(np.int64).sum()),
                        ok_format,
                        ok_lossless,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return imgs.mapInPandas(kernel, schema=schema).orderBy("doc_id")


# -- IMA ADPCM lossy-but-integer round-trip (r9e): SQL replays the codec -----------

def _adpcm_oracle() -> str:
    """The full IMA encode+decode walk replayed in DuckDB: a recursive CTE
    steps the (predictor, step-index) state machine sample by sample, with
    the nested-subquery chain giving LET semantics so each table lookup is
    computed once per step.  Closed-loop IMA means the encoder's predictor
    IS the decoder's reconstruction, so ONE walk verifies both halves."""
    from ..multimodal.adpcm import INDEX_TABLE, STEP_TABLE

    st = "[" + ", ".join(str(v) for v in STEP_TABLE) + "]"
    it = "[" + ", ".join(str(v) for v in INDEX_TABLE) + "]"
    return f"""
WITH RECURSIVE ids AS (
  SELECT doc_id, CAST(40 + doc_id % 120 AS BIGINT) AS n
  FROM documents WHERE doc_id % 7 = 6
),
walk(doc_id, n, i, pred, idx, code_sum, recon_sum, err_sum) AS (
  SELECT doc_id, n, CAST(1 AS BIGINT),
         CAST((29 * doc_id) % 4001 - 2000 AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM ids
  UNION ALL
  SELECT doc_id, n, i + 1,
         new_pred,
         least(greatest(idx + ({it})[nmag + 1], 0), 88),
         code_sum + 8 * sgn + nmag,
         recon_sum + new_pred,
         err_sum + abs(s - new_pred)
  FROM (
    SELECT *, least(greatest(pred + CASE WHEN sgn = 1 THEN -diffq
                                         ELSE diffq END,
                             -32768), 32767) AS new_pred
    FROM (
      SELECT *, 4 * b2 + 2 * b1 + b0 AS nmag,
             step // 8 + b2 * step + b1 * (step // 2) + b0 * (step // 4)
               AS diffq
      FROM (
        SELECT *, CAST(ad2 >= step // 4 AS INT) AS b0
        FROM (
          SELECT *, CAST(ad1 >= step // 2 AS INT) AS b1,
                 ad1 - CAST(ad1 >= step // 2 AS INT) * (step // 2) AS ad2
          FROM (
            SELECT *, CAST(ad >= step AS INT) AS b2,
                   ad - CAST(ad >= step AS INT) * step AS ad1
            FROM (
              SELECT *, CAST(s < pred AS INT) AS sgn, abs(s - pred) AS ad
              FROM (
                SELECT w.*, ({st})[w.idx + 1] AS step,
                       CAST((3 * w.i * w.i + 17 * w.i + 29 * w.doc_id)
                            % 4001 - 2000 AS BIGINT) AS s
                FROM walk w WHERE w.i < w.n
              )
            )
          )
        )
      )
    )
  )
)
SELECT doc_id,
       n AS n_samples,
       CAST((29 * doc_id) % 4001 - 2000 AS BIGINT) AS first_sample,
       code_sum, recon_sum, err_sum,
       TRUE AS ok_format
FROM walk WHERE i = n
ORDER BY doc_id
"""


@register(
    "multimodal_adpcm_roundtrip",
    oracle=_adpcm_oracle(),
    tags=("multimodal", "north-star"),
    doc=(
        "REAL IMA ADPCM (WAV format 0x0011) round-trip with the WHOLE "
        "codec replayed in SQL: genuine single-block IMA-WAV files "
        "(multimodal/adpcm.py — RIFF fmt/fact/data chunks, 4-byte block "
        "header carrying the verbatim first sample, closed-loop 4-bit "
        "quantizer against the 89-entry step table) are encoded and "
        "decoded in one Arrow-batched mapInPandas, and the DuckDB "
        "oracle steps the SAME integer state machine sample-by-sample "
        "in a recursive CTE (nested subqueries as let-bindings), "
        "pinning the nibble-code sum, every reconstructed sample's sum, "
        "and the exact total reconstruction error.  ADPCM is LOSSY but "
        "pure-integer, so unlike JPEG the lossy path itself is "
        "bit-verifiable cross-engine — the adaptive-differential "
        "quadrant beside G.711's fixed companding curve."
    ),
)
def multimodal_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..multimodal.adpcm import decode_wav_ima, encode_wav_ima

    pin_query_session_conf(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 6)
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("first_sample", T.LongType()),
            T.StructField("code_sum", T.LongType()),
            T.StructField("recon_sum", T.LongType()),
            T.StructField("err_sum", T.LongType()),
            T.StructField("ok_format", T.BooleanType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            out = []
            for doc_id in batch["doc_id"]:
                doc_id = int(doc_id)
                n = 40 + doc_id % 120
                samples = [
                    (3 * i * i + 17 * i + 29 * doc_id) % 4001 - 2000
                    for i in range(n)
                ]
                wav = encode_wav_ima(samples)
                ok_format = wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
                rate, rec = decode_wav_ima(wav)
                ok_format = ok_format and rate == 8000 and len(rec) == n
                # nibble-code sum over the real payload (exclude pad nibble)
                payload = wav[wav.rindex(b"data") + 8 + 4 :]
                nibbles = []
                for byte in payload:
                    nibbles.append(byte & 0x0F)
                    nibbles.append(byte >> 4)
                nibbles = nibbles[: n - 1]
                out.append(
                    (
                        doc_id,
                        n,
                        samples[0],
                        sum(nibbles),
                        sum(rec[1:]),
                        sum(abs(s - r) for s, r in zip(samples[1:], rec[1:])),
                        ok_format,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    par = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(par).mapInPandas(kernel, schema=schema).orderBy("doc_id")
    )
