"""Event-stream analytics in batch form (SURVEY.md §2.8 batch analogs).

``events_daily_by_type`` is the batch twin of the streaming tumbling-window
aggregation (streaming/windows.py) — same grouping, same results — pinning
stream/batch parity the way the reference's daily Jenkins re-run pins its
incremental semantics (README.md:115-127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.safe_math import dec_sum
from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_DAILY = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       (CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "events_daily_by_type",
    oracle=_ORACLE_DAILY,
    tags=("events", "agg", "streaming-parity"),
    doc="Daily tumbling buckets per event type — batch twin of the streaming window agg.",
)
def events_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum("value").alias("total_value"),
    )


# -- Sessionization (gaps-and-islands; batch analog of session_window) --------

_ORACLE_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
"""


@register(
    "events_sessionize_30m",
    oracle=_ORACLE_SESSIONS,
    tags=("events", "window", "sessionization"),
    doc=(
        "Gaps-and-islands sessionization (30-min inactivity gap) via lag + "
        "conditional sum — batch analog of F.session_window (§2.8)."
    ),
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
