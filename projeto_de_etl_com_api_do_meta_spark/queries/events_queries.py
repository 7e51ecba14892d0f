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


# -- Funnel analysis (sequential pattern over the event stream) ----------------

_ORACLE_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT u.user_id, v.v_ts, c.c_ts, p.p_ts,
       CASE WHEN p.p_ts IS NOT NULL THEN 3
            WHEN c.c_ts IS NOT NULL THEN 2
            WHEN v.v_ts IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


@register(
    "events_funnel_stages",
    oracle=_ORACLE_FUNNEL,
    tags=("events", "funnel"),
    doc=(
        "Ordered funnel (first view -> first later click -> first later "
        "purchase) per user: three conditional min-aggregations chained by "
        "joins — each stage a map-side-combinable agg, no per-user "
        "sequence materialization."
    ),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    users = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .when(F.col("v_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "v_ts", "c_ts", "p_ts", stage.alias("funnel_stage"))
    )


# -- Gap filling: dense daily spine per event type -----------------------------

_ORACLE_GAP_FILL = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
),
spine AS (
  SELECT t.day, e.event_type
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day'))::DATE AS day
        FROM bounds) t
  CROSS JOIN (SELECT DISTINCT event_type FROM events) e
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT s.day, s.event_type, COALESCE(d.n_events, 0) AS n_events,
       CASE WHEN d.n_events IS NULL THEN TRUE ELSE FALSE END AS gap_filled
FROM spine s LEFT JOIN daily d ON s.day = d.day AND s.event_type = d.event_type
"""


@register(
    "events_gap_fill_daily",
    oracle=_ORACLE_GAP_FILL,
    tags=("events", "timeseries"),
    doc=(
        "Time-series gap filling: dense (day x event_type) spine generated "
        "with sequence+explode, left-joined to the daily counts, gaps "
        "0-filled and flagged — the dense-calendar prerequisite of every "
        "window/rolling metric downstream."
    ),
)
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d0"),
        F.max(F.date_trunc("day", "ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    spine = days.crossJoin(ev.select("event_type").distinct())
    return spine.join(daily, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("gap_filled"),
    )


_ORACLE_COHORT = """
WITH firstseen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, a.day) AS day_offset,
       count(*) AS n_users
FROM activity a
JOIN firstseen f ON a.user_id = f.user_id
GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.day)
ORDER BY cohort_day, day_offset
"""


@register(
    "events_cohort_retention",
    oracle=_ORACLE_COHORT,
    tags=("agg", "analytics"),
    doc=(
        "Cohort retention triangle: users grouped by first-seen day, "
        "activity counted per (cohort, day-offset). Two hash aggregations "
        "plus one key join — the first-seen table is tiny (one row per "
        "user) and broadcasts; the distinct-activity aggregate combines "
        "map-side before its shuffle."
    ),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    events = load_table(spark, sf_dir, "events")
    firstseen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(F.broadcast(firstseen), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# -- Next-event transition matrix ---------------------------------------------

_ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type, count(*) AS n_transitions
FROM seq
WHERE next_type IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "events_transition_matrix",
    oracle=_ORACLE_TRANSITIONS,
    tags=("events", "window", "analytics"),
    doc=(
        "First-order Markov transition counts between consecutive events "
        "per user (LEAD over the per-user timeline, then one hash "
        "aggregate). The window and the aggregate shuffle on different "
        "keys, but the window's user_id exchange dominates and the "
        "transition-pair aggregate combines map-side to |event_types|^2 "
        "rows — negligible reduce fan-in at any scale."
    ),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


# -- Rolling 7-day active users ----------------------------------------------

_ORACLE_ROLLING_WAU = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
spine AS (
  SELECT DISTINCT day FROM ud
)
SELECT s.day, count(DISTINCT u.user_id) AS wau
FROM spine s
JOIN ud u ON u.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
GROUP BY s.day
ORDER BY s.day
"""


@register(
    "events_rolling_active_users",
    oracle=_ORACLE_ROLLING_WAU,
    tags=("events", "analytics", "agg"),
    doc=(
        "Rolling 7-day active users per day (WAU). COUNT(DISTINCT) cannot "
        "live inside a window frame, so the engine uses the scalable "
        "formulation: dedup to (user, day) once — the only big shuffle — "
        "then range-join the tiny day spine (broadcast) and hash-aggregate "
        "a distinct count per anchor day. Each (user, day) row fans out to "
        "at most 7 anchors regardless of data size, so the blow-up is "
        "bounded and partial aggregation absorbs it map-side."
    ),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    spine = ud.select(F.col("day").alias("anchor")).distinct()
    return (
        ud.join(
            F.broadcast(spine),
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("anchor").alias("day"), "wau")
        .orderBy("day")
    )


# -- Built-in session_window in BATCH mode (twin of events_sessionize_30m) -----

_ORACLE_SESSION_BUILTIN = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@register(
    "events_session_window_builtin",
    oracle=_ORACLE_SESSION_BUILTIN,
    tags=("events", "window", "streaming-parity"),
    doc=(
        "F.session_window in BATCH mode (30-min inactivity gap): per-session "
        "start/end/event-count detail rows — the built-in-operator twin of "
        "the lag/cumsum gaps-and-islands form in events_sessionize_30m, and "
        "the batch twin of stream_session_window (§2.8). One shuffle on "
        "user_id; session merge is Spark-internal (no window-function pass). "
        "Oracle reproduces [start, last_ts + gap) semantics via lag/cumsum "
        "(session boundaries depend only on ts gaps, so duplicate-ts "
        "ordering cannot change the result)."
    ),
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# -- Time-hierarchy ROLLUP (year -> month -> day) ------------------------------

_ORACLE_TIME_ROLLUP = """
SELECT COALESCE(CAST(EXTRACT(year FROM ts) AS BIGINT), -1) AS y,
       COALESCE(CAST(EXTRACT(month FROM ts) AS BIGINT), -1) AS m,
       COALESCE(CAST(EXTRACT(day FROM ts) AS BIGINT), -1) AS d,
       GROUPING(EXTRACT(year FROM ts)) * 4
         + GROUPING(EXTRACT(month FROM ts)) * 2
         + GROUPING(EXTRACT(day FROM ts)) AS gid,
       COUNT(*) AS n_events,
       (CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
             AS DOUBLE) / 100) AS total_value
FROM events
GROUP BY ROLLUP (EXTRACT(year FROM ts), EXTRACT(month FROM ts),
                 EXTRACT(day FROM ts))
"""


@register(
    "events_time_rollup_ymd",
    oracle=_ORACLE_TIME_ROLLUP,
    tags=("events", "rollup", "agg"),
    doc=(
        "Calendar-hierarchy ROLLUP (year, month, day) over events with "
        "grouping_id and decimal-exact value sums: every report granularity "
        "in ONE pass (partial aggregation handles all levels map-side) "
        "instead of one scan per granularity."
    ),
)
def events_time_rollup_ymd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.safe_math import dec_sum

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        F.year("ts").cast("long").alias("yy"),
        F.month("ts").cast("long").alias("mm"),
        F.dayofmonth("ts").cast("long").alias("dd"),
        "value",
    )
    return (
        ev.rollup("yy", "mm", "dd")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("yy"), F.lit(-1)).alias("y"),
            F.coalesce(F.col("mm"), F.lit(-1)).alias("m"),
            F.coalesce(F.col("dd"), F.lit(-1)).alias("d"),
            "gid",
            "n_events",
            "total_value",
        )
    )


# -- Linear interpolation of sparse series (exact-rational form) ---------------

_ORACLE_INTERPOLATE = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
),
spine AS (
  SELECT t.day, e.event_type
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day'))::DATE AS day
        FROM bounds) t
  CROSS JOIN (SELECT DISTINCT event_type FROM events) e
),
observed AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(round(SUM(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
           AS cents
  FROM events
  WHERE EXTRACT(day FROM ts) % 3 = 0
  GROUP BY 1, 2
),
idx AS (
  SELECT s.day, s.event_type,
         datediff('day', DATE '2020-01-01', s.day) AS di,
         o.cents
  FROM spine s LEFT JOIN observed o
    ON s.day = o.day AND s.event_type = o.event_type
),
ctx AS (
  SELECT day, event_type, di, cents,
         last_value(cents IGNORE NULLS) OVER wp AS prev_c,
         last_value(CASE WHEN cents IS NOT NULL THEN di END IGNORE NULLS)
           OVER wp AS prev_i,
         first_value(cents IGNORE NULLS) OVER wf AS next_c,
         first_value(CASE WHEN cents IS NOT NULL THEN di END IGNORE NULLS)
           OVER wf AS next_i
  FROM idx
  WINDOW wp AS (PARTITION BY event_type ORDER BY di
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY di
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT day, event_type,
       CASE WHEN cents IS NOT NULL THEN cents
            WHEN prev_c IS NULL OR next_c IS NULL THEN NULL
            ELSE prev_c * (next_i - prev_i)
                 + (next_c - prev_c) * (di - prev_i) END AS interp_num,
       CASE WHEN cents IS NOT NULL THEN 1
            WHEN prev_c IS NULL OR next_c IS NULL THEN NULL
            ELSE next_i - prev_i END AS interp_den
FROM ctx
ORDER BY event_type, day
"""


@register(
    "events_interpolate_linear",
    oracle=_ORACLE_INTERPOLATE,
    tags=("events", "timeseries", "window"),
    doc=(
        "Linear interpolation of a sparse daily series (only every-3rd-day "
        "totals observed): dense spine -> carry prev/next observation via "
        "ignore-nulls window frames -> EXACT-RATIONAL interpolated value "
        "emitted as (numerator, denominator) integer pair, so the result "
        "hashes bit-identically across engines (no float division). "
        "Windows partition per series (event_type); at N series x D days "
        "state is bounded per partition."
    ),
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pin_query_session_conf(spark)
    from ..functions.safe_math import dec

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d0"),
        F.max(F.date_trunc("day", "ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(F.broadcast(types))
    observed = (
        ev.where(F.dayofmonth("ts") % 3 == 0)
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum(dec("value")) * 100, 0).cast("long").alias("cents"))
    )
    idx = spine.join(observed, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.datediff("day", F.lit("2020-01-01").cast("date")).alias("di"),
        "cents",
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("di")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_di = F.when(F.col("cents").isNotNull(), F.col("di"))
    ctx = idx.select(
        "day",
        "event_type",
        "di",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("prev_c"),
        F.last(obs_di, ignorenulls=True).over(wp).alias("prev_i"),
        F.first("cents", ignorenulls=True).over(wf).alias("next_c"),
        F.first(obs_di, ignorenulls=True).over(wf).alias("next_i"),
    )
    has_ends = F.col("prev_c").isNotNull() & F.col("next_c").isNotNull()
    num = F.col("prev_c") * (F.col("next_i") - F.col("prev_i")) + (
        F.col("next_c") - F.col("prev_c")
    ) * (F.col("di") - F.col("prev_i"))
    den = F.col("next_i") - F.col("prev_i")
    return ctx.select(
        "day",
        "event_type",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .when(has_ends, num)
        .alias("interp_num"),
        F.when(F.col("cents").isNotNull(), F.lit(1).cast("long"))
        .when(has_ends, den.cast("long"))
        .alias("interp_den"),
    ).orderBy("event_type", "day")


# -- Last-touch attribution (the ads-ETL composite) ----------------------------

_ORACLE_ATTRIBUTION = """
WITH clicks AS (
  SELECT user_id, ts, CAST(props->>'k' AS BIGINT) AS campaign_k
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
attributed AS (
  SELECT c.campaign_k, p.value
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT COALESCE(campaign_k, -1) AS campaign_k,
       COUNT(*) AS n_purchases,
       CAST(round(SUM(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
         AS attributed_cents
FROM attributed
GROUP BY 1
ORDER BY campaign_k
"""


@register(
    "events_last_touch_attribution",
    oracle=_ORACLE_ATTRIBUTION,
    tags=("events", "asof", "reference-parity"),
    doc=(
        "Last-touch revenue attribution — the ads-measurement composite the "
        "reference's CPC/CPL metrics feed (reference transform.py "
        "safe-ratio KPIs): each purchase is attributed to the campaign key "
        "(props JSON) of the user's most recent prior click via the "
        "one-shuffle as-of join, then revenue rolls up per campaign in "
        "exact cents; unattributed purchases land in campaign -1."
    ),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.safe_math import dec
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("campaign_k"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    attributed = asof_join(
        purchases, clicks, key="user_id", ts="ts", payload_cols=["campaign_k"]
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("campaign_k"), F.lit(-1)).alias("campaign_k")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum(dec("value")) * 100, 0)
            .cast("long")
            .alias("attributed_cents"),
        )
        .orderBy("campaign_k")
    )


# -- Behavioral 3-gram mining (sequence patterns) ------------------------------

_ORACLE_BEHAVIOR_NGRAMS = """
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS pattern,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT user_id) AS n_users
FROM ordered
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, pattern
LIMIT 50
"""


@register(
    "events_behavior_ngrams",
    oracle=_ORACLE_BEHAVIOR_NGRAMS,
    tags=("events", "window", "sequence"),
    doc=(
        "Behavioral 3-gram mining: per-user event-type sequences (LEAD x2 "
        "over the per-user timeline — one shuffle on user_id) -> pattern "
        "frequencies with distinct-user support; top-50 by a total order. "
        "The sequence-pattern generalization of events_transition_matrix."
    ),
)
def events_behavior_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("pattern"),
            "user_id",
        )
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "pattern")
        .limit(50)
    )


_ORACLE_PATTERN_FUNNEL = """
WITH seq AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       md5(s) AS seq_md5,
       CAST((length(s) - length(replace(s, 'vcp', ''))) / 3 AS BIGINT)
         AS vcp_runs,
       CAST(COALESCE(list_max(list_transform(
              regexp_split_to_array(s, '[^c]+'), x -> length(x))), 0)
            AS BIGINT) AS max_click_streak
FROM seq ORDER BY user_id
"""


@register(
    "events_pattern_funnel_regex",
    oracle=_ORACLE_PATTERN_FUNNEL,
    tags=("events", "sessionize", "analytics"),
    doc=(
        "Sequence-pattern analytics (the MATCH_RECOGNIZE-shaped workload): "
        "each user's event history collapses to an ordered type-initial "
        "string ONCE — array_sort(collect_list(struct(ts, event_id, "
        "initial))) makes the order total and engine-independent — then "
        "strict-contiguity patterns run as pure string expressions on that "
        "sequence: view->click->purchase runs via the replace-length "
        "trick, longest click streak via split-on-non-c. One shuffle to "
        "group by user; the per-user sequence state is bounded by that "
        "user's history, never the corpus (per-user strings fingerprint "
        "as md5 in the output). Regex-engine semantics (RE2 vs java.util) "
        "never cross the oracle: both patterns are literal string ops."
    ),
)
def events_pattern_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda e: e["c"]
                ),
            ).alias("s"),
        )
    )
    streak = F.array_max(
        F.transform(F.split(F.col("s"), "[^c]+"), lambda x: F.length(x))
    )
    return seq.select(
        "user_id",
        "n_events",
        F.md5("s").alias("seq_md5"),
        ((F.length("s") - F.length(F.replace(F.col("s"), F.lit("vcp"), F.lit(""))))
         / 3).cast("bigint").alias("vcp_runs"),
        F.coalesce(streak, F.lit(0)).cast("bigint").alias("max_click_streak"),
    ).orderBy("user_id")


_ORACLE_EWMA = """
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
)
SELECT user_id, CAST(len(xs) AS BIGINT) AS n_obs,
       round(list_reduce(xs, (acc, x) ->
             CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc), 6)
         AS ewma
FROM ordered ORDER BY user_id
"""


@register(
    "events_ewma_fold",
    oracle=_ORACLE_EWMA,
    tags=("events", "timeseries", "analytics"),
    doc=(
        "Exponentially-weighted moving average per user (alpha=0.2, "
        "seeded at the first observation) — the recursive time-series "
        "smoother that has no closed-form window expression: s_t = "
        "alpha*x_t + (1-alpha)*s_{t-1}. Expressed as a DETERMINISTIC "
        "array fold: one shuffle groups each user's history, array_sort "
        "on (ts, event_id) makes the order total, and F.aggregate folds "
        "the recursion JVM-side in exactly that order — bit-identical to "
        "the DuckDB list_reduce oracle because both engines execute the "
        "same float operations in the same sequence (no UDF, no "
        "order-dependent SUM). Per-user state is that user's history; at "
        "100 TB the same recursion runs incrementally in streaming "
        "(stream_stateful_counters carries the scalar state instead)."
    ),
)
def events_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "view"
    )
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.col("value").cast("double").alias("x"))
            .alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda e: e["x"]
            ).alias("xs")
        )
    )
    return seq.select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_obs"),
        F.round(
            F.aggregate(
                F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
                F.element_at(F.col("xs"), 1),
                lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
            ),
            6,
        ).alias("ewma"),
    ).orderBy("user_id")


_ORACLE_HOLT = """
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id
),
folded AS (
  -- accumulator is a 2-element DOUBLE list [level, trend]: DuckDB 1.0's
  -- list_reduce mis-evaluates STRUCT accumulators whose fields reference
  -- each other's inputs (verified: struct form returns a wrong trend on
  -- 3+ elements while the list form matches the hand recursion and
  -- Spark bit-for-bit)
  SELECT user_id, len(xs) AS n_obs,
         list_reduce(
           list_transform(xs, x -> [x, CAST(0.0 AS DOUBLE)]),
           (acc, e) -> [
             CAST(0.5 AS DOUBLE) * e[1]
               + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
             CAST(0.3 AS DOUBLE)
               * (CAST(0.5 AS DOUBLE) * e[1]
                  + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]) - acc[1])
               + CAST(0.7 AS DOUBLE) * acc[2]]) AS s
  FROM ordered
)
SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
       round(s[1], 6) AS level, round(s[2], 6) AS trend,
       round(s[1] + s[2], 6) AS forecast_1
FROM folded ORDER BY user_id
"""


@register(
    "events_holt_linear_fold",
    oracle=_ORACLE_HOLT,
    tags=("events", "timeseries", "analytics"),
    doc=(
        "Holt's linear-trend double-exponential smoothing per user "
        "(alpha=0.5, beta=0.3, level seeded at the first observation, "
        "trend at 0): the TWO-STATE recursion l' = a*x + (1-a)(l+t), "
        "t' = b*(l'-l) + (1-b)*t — no window expression can carry "
        "coupled state, so it runs as a deterministic STRUCT-accumulator "
        "fold: array_sort fixes a total order, F.aggregate folds a "
        "(level, trend) struct JVM-side in exactly that order, and the "
        "DuckDB oracle executes the identical operation sequence via "
        "list_reduce over struct_pack — bit-identical without a single "
        "UDF. The pattern generalizes: any bounded-state sequential "
        "recursion (CUSUM, Kalman 1-D, session scoring) oracle-checks "
        "this way. Emits final level/trend and the one-step forecast."
    ),
)
def events_holt_linear_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    # NULL observations must never enter the fold: Spark's aggregate()
    # infers the accumulator struct's field nullability from the INIT
    # expression (t = 0.0 -> non-nullable), so a null produced mid-fold is
    # silently coerced to the codegen default 0.0 while DuckDB keeps NULL
    # (found by the r8 degenerate-fixture differ; show() even renders the
    # JVM NULL while collect() surfaces the coerced 0.0).
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.col("value").cast("double").alias("x"))
            .alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda e: e["x"]
            ).alias("xs")
        )
    )
    a, b = F.lit(0.5), F.lit(0.3)

    def merge(acc, x):
        new_l = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["t"])
        new_t = (
            b * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["t"]) - acc["l"])
            + (F.lit(1.0) - b) * acc["t"]
        )
        return F.struct(new_l.alias("l"), new_t.alias("t"))

    folded = seq.select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_obs"),
        F.aggregate(
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
            F.struct(
                F.element_at(F.col("xs"), 1).alias("l"),
                F.lit(0.0).alias("t"),
            ),
            merge,
        ).alias("s"),
    )
    return folded.select(
        "user_id",
        "n_obs",
        F.round(F.col("s.l"), 6).alias("level"),
        F.round(F.col("s.t"), 6).alias("trend"),
        F.round(F.col("s.l") + F.col("s.t"), 6).alias("forecast_1"),
    ).orderBy("user_id")


_ORACLE_CONVERSION_WINDOW = """
WITH views AS (
  SELECT event_id, user_id, ts, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'view'
),
converted AS (
  SELECT v.event_id,
         CASE WHEN EXISTS (
           SELECT 1 FROM events p
           WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
             AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL '30 minutes'
         ) THEN 1 ELSE 0 END AS conv,
         v.d
  FROM views v
)
SELECT d, CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       CAST(floor(1000000.0 * SUM(conv) / COUNT(*)) AS BIGINT)
         AS conversion_ppm
FROM converted GROUP BY d ORDER BY d
"""


@register(
    "events_conversion_window_rate",
    oracle=_ORACLE_CONVERSION_WINDOW,
    tags=("events", "analytics", "timeseries"),
    doc=(
        "Time-boxed funnel conversion rate: a view CONVERTS if the same "
        "user purchases within 30 minutes; daily conversion ppm. The "
        "existence probe is the forward as-of join "
        "(operators/asof.py, direction='forward') with the horizon as "
        "tolerance — one union+carry window pass per key, NOT the "
        "O(views x purchases) correlated-EXISTS the oracle spells (the "
        "oracle's nested EXISTS is the semantic spec; the engine's plan "
        "is the scalable one). Aggregation is one hash agg on the day."
    ),
)
def events_conversion_window_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    joined = asof_join(
        views,
        purchases,
        key="user_id",
        ts="ts",
        payload_cols=["p_id"],
        tolerance_us=30 * 60 * 1_000_000,
        direction="forward",
    )
    return (
        joined.select(
            F.col("ts").cast("date").alias("d"),
            F.when(F.col("p_id").isNotNull(), 1).otherwise(0).alias("conv"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_views"),
            F.sum("conv").cast("bigint").alias("n_converted"),
        )
        .select(
            "d",
            "n_views",
            "n_converted",
            F.floor(
                F.lit(1000000.0) * F.col("n_converted") / F.col("n_views")
            ).cast("bigint").alias("conversion_ppm"),
        )
        .orderBy("d")
    )


_ORACLE_AB_ZTEST = """
WITH assign AS (
  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS x
  FROM assign GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
         MAX(CASE WHEN variant = 0 THEN x END) AS x0,
         MAX(CASE WHEN variant = 1 THEN n END) AS n1,
         MAX(CASE WHEN variant = 1 THEN x END) AS x1
  FROM v
)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(x0 AS BIGINT) AS conv_a,
       CAST(n1 AS BIGINT) AS n_b, CAST(x1 AS BIGINT) AS conv_b,
       round(CAST(x0 AS DOUBLE) / n0, 6) AS rate_a,
       round(CAST(x1 AS DOUBLE) / n1, 6) AS rate_b,
       round((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
             / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                    * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat,
       round(((CAST(x1 AS DOUBLE) + 1.9208) / (n1 + 3.8416)
              - 1.96 * sqrt(CAST(x1 AS DOUBLE) * (n1 - x1) / n1 + 0.9604)
                / (n1 + 3.8416)), 6) AS wilson_lo_b,
       round(((CAST(x1 AS DOUBLE) + 1.9208) / (n1 + 3.8416)
              + 1.96 * sqrt(CAST(x1 AS DOUBLE) * (n1 - x1) / n1 + 0.9604)
                / (n1 + 3.8416)), 6) AS wilson_hi_b
FROM wide
"""


@register(
    "events_ab_test_ztest",
    oracle=_ORACLE_AB_ZTEST,
    tags=("events", "analytics", "stats"),
    doc=(
        "A/B experiment readout: users hash into two variants "
        "(user_id % 2 standing in for the assignment hash), conversion "
        "= any purchase; two-proportion pooled z-statistic plus the "
        "Wilson 95% interval for the treatment arm (the interval that "
        "behaves at small counts where the normal approximation "
        "doesn't). Two hash aggregates (per-user collapse, per-variant "
        "counts) and ONE row of float math from exact integers — the "
        "formulas are written symbol-for-symbol in both engines so "
        "round-6 values match exactly. The experimentation readout "
        "every product-analytics warehouse runs daily, at any scale."
    ),
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "conv")
    v = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").cast("bigint").alias("x")
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    n0, x0 = F.col("n0").cast("double"), F.col("x0").cast("double")
    n1, x1 = F.col("n1").cast("double"), F.col("x1").cast("double")
    pooled = (x0 + x1) / (F.col("n0") + F.col("n1")).cast("double")
    z = (x1 / n1 - x0 / n0) / F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
    )
    center = (x1 + F.lit(1.9208)) / (n1 + F.lit(3.8416))
    half = (
        F.lit(1.96)
        * F.sqrt(x1 * (n1 - x1) / n1 + F.lit(0.9604))
        / (n1 + F.lit(3.8416))
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n_a"),
        F.col("x0").cast("bigint").alias("conv_a"),
        F.col("n1").cast("bigint").alias("n_b"),
        F.col("x1").cast("bigint").alias("conv_b"),
        F.round(x0 / n0, 6).alias("rate_a"),
        F.round(x1 / n1, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
        F.round(center - half, 6).alias("wilson_lo_b"),
        F.round(center + half, 6).alias("wilson_hi_b"),
    )


_ORACLE_KAPLAN_MEIER = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p0,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
),
spells AS (
  SELECT user_id,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0 THEN 1 ELSE 0 END AS ev,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0
              THEN date_diff('day', s0, p0)
              ELSE date_diff('day', s0, last_seen) END AS dur
  FROM per_user WHERE s0 IS NOT NULL
),
grouped AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(1 - ev) AS BIGINT) AS c
  FROM spells GROUP BY dur
),
ordered AS (
  SELECT dur, d, c,
         CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM spells) -
           COALESCE(SUM(d + c) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM grouped
)
SELECT dur AS duration_days, d AS n_events, c AS n_censored,
       n_risk,
       round(exp(SUM(CASE WHEN d = 0 THEN 0.0
                          ELSE ln(1.0 - CAST(d AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE)) END)
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival
FROM ordered ORDER BY dur
"""


@register(
    "events_survival_kaplan_meier",
    oracle=_ORACLE_KAPLAN_MEIER,
    tags=("events", "stats", "analytics"),
    doc=(
        "Kaplan-Meier survival curve for signup->purchase conversion "
        "with right-censoring (users never purchasing are censored at "
        "their last observed event): per-duration event/censor counts, "
        "risk set via a cumulative window, S(t) as the running product "
        "Pi(1 - d_i/n_i) computed in log space — the cumulative ln-sum "
        "runs over the SAME sorted duration order in both engines "
        "(left-to-right sequential accumulation), so round-6 survival "
        "matches exactly. The duration table is tiny (distinct day "
        "counts) regardless of user count, so the global-order window "
        "is bounded; the corpus-scale work is one per-user collapse. "
        "The time-to-event statistic behind retention/churn curves."
    ),
)
def events_survival_kaplan_meier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "s0"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p0"
        ),
        F.max("ts").alias("last_seen"),
    )
    has_event = F.col("p0").isNotNull() & (F.col("p0") >= F.col("s0"))
    spells = per_user.where(F.col("s0").isNotNull()).select(
        F.when(has_event, 1).otherwise(0).alias("ev"),
        F.when(
            has_event, F.datediff(F.col("p0").cast("date"), F.col("s0").cast("date"))
        )
        .otherwise(
            F.datediff(F.col("last_seen").cast("date"), F.col("s0").cast("date"))
        )
        .alias("dur"),
    )
    total = spells.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    grouped = spells.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    # duration table is bounded (distinct days), so the global-order
    # windows below see a tiny input — documented in the docstring
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = grouped.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    ln_term = F.when(F.col("d") == 0, F.lit(0.0)).otherwise(
        F.log(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        )
    )
    return ordered.select(
        F.col("dur").alias("duration_days"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        "n_risk",
        F.round(F.exp(F.sum(ln_term).over(w_run)), 6).alias("survival"),
    ).orderBy("duration_days")


_ORACLE_BOUNCE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no,
         ts
  FROM flagged
),
per_session AS (
  SELECT user_id, sess_no,
         CAST(MIN(ts) AS DATE) AS d,
         COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sess_no
)
SELECT d, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(floor(1000000.0 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                  / COUNT(*)) AS BIGINT) AS bounce_ppm
FROM per_session GROUP BY d ORDER BY d
"""


@register(
    "events_bounce_rate_daily",
    oracle=_ORACLE_BOUNCE,
    tags=("events", "sessionize", "analytics"),
    doc=(
        "Daily bounce rate: gaps-and-islands sessionization (30-min "
        "inactivity, the events_sessionize_30m mechanic) extended to "
        "per-session event counts; a single-event session is a bounce, "
        "attributed to the day its session started. Two window passes "
        "over the same user partitioning (one shuffle) + one hash "
        "aggregate per (user, session) + one per day — the canonical "
        "web-analytics KPI, integer ppm."
    ),
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.withColumn("sess_no", F.sum("new_session").over(w_run))
    per_session = sessions.groupBy("user_id", "sess_no").agg(
        F.min("ts").cast("date").alias("d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_session.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
        )
        .select(
            "d",
            "n_sessions",
            "n_bounces",
            F.floor(
                F.lit(1000000.0) * F.col("n_bounces") / F.col("n_sessions")
            ).cast("bigint").alias("bounce_ppm"),
        )
        .orderBy("d")
    )


_ORACLE_DOW_PROFILE = """
WITH cells AS (
  SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,   -- 0=Sunday in DuckDB
         CAST(hour(ts) AS INTEGER) AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells)
SELECT dow, hr, CAST(n AS BIGINT) AS n,
       CAST(floor(1000000.0 * n * n_cells / total) AS BIGINT)
         AS load_index_ppm   -- 1e6 = uniform share; hot cells exceed it
FROM cells, t ORDER BY dow, hr
"""


@register(
    "events_dow_hour_profile",
    oracle=_ORACLE_DOW_PROFILE,
    tags=("events", "timeseries", "profiling"),
    doc=(
        "Day-of-week x hour-of-day load profile with a uniform-share "
        "index (1e6 ppm = perfectly even traffic; hot cells exceed it) "
        "— the seasonality fingerprint capacity planning and "
        "anomaly-baseline jobs start from. Spark's dayofweek is "
        "1=Sunday and DuckDB's dayofweek is 0=Sunday, so the engine "
        "side shifts by one to meet the oracle on the same convention "
        "(a real cross-engine calendar trap, pinned here). One hash "
        "aggregate over 168 cells + a scalar broadcast."
    ),
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),  # to 0=Sunday
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = cells.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    return (
        cells.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hr",
            F.col("n").cast("bigint").alias("n"),
            F.floor(
                F.lit(1000000.0) * F.col("n") * F.col("n_cells")
                / F.col("total")
            )
            .cast("bigint")
            .alias("load_index_ppm"),
        )
        .orderBy("dow", "hr")
    )


_ORACLE_SLO_BURN = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS errs
  FROM events GROUP BY 1
),
rolled AS (
  SELECT d, n, errs,
         SUM(n) OVER w AS n7, SUM(errs) OVER w AS errs7
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d, n, errs,
       CAST(floor(1000000.0 * errs7 / n7) AS BIGINT) AS err_rate_7d_ppm,
       -- burn rate vs a 5% error budget: 1e6 = burning exactly at budget
       CAST(floor(1000000.0 * errs7 / n7 / 0.05) AS BIGINT) AS burn_ppm,
       CASE WHEN 1000000.0 * errs7 / n7 / 0.05 >= 2000000 THEN 'page'
            WHEN 1000000.0 * errs7 / n7 / 0.05 >= 1000000 THEN 'ticket'
            ELSE 'ok' END AS alert
FROM rolled ORDER BY d
"""


@register(
    "events_slo_error_budget_burn",
    oracle=_ORACLE_SLO_BURN,
    tags=("events", "timeseries", "analytics"),
    doc=(
        "SLO error-budget burn-rate monitor: daily error rates rolled "
        "over a 7-day window, normalized by a 5% error budget (1e6 ppm "
        "= burning exactly at budget) with page/ticket alert thresholds "
        "at 2x/1x — the SRE multiwindow-burn readout, batch form. The "
        "rolling window runs over the bounded days table; integer "
        "floors on every rate so no float accumulation crosses the "
        "oracle; the streaming twin is a sliding-window aggregate over "
        "the same expressions (stream_sliding_hourly's shape)."
    ),
)
def events_slo_error_budget_burn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs"),
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    rolled = daily.select(
        "d",
        "n",
        "errs",
        F.sum("n").over(w).alias("n7"),
        F.sum("errs").over(w).alias("errs7"),
    )
    rate = F.lit(1000000.0) * F.col("errs7") / F.col("n7")
    burn = rate / F.lit(0.05)
    return rolled.select(
        "d",
        "n",
        "errs",
        F.floor(rate).cast("bigint").alias("err_rate_7d_ppm"),
        F.floor(burn).cast("bigint").alias("burn_ppm"),
        F.when(burn >= 2000000, "page")
        .when(burn >= 1000000, "ticket")
        .otherwise("ok")
        .alias("alert"),
    ).orderBy("d")


_ORACLE_INTERVAL_COALESCE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 600000000 AS e,   -- 10-minute activity window
         event_id
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id
                ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1
              WHEN MAX(e) OVER (PARTITION BY user_id
                ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM iv
),
blocks AS (
  SELECT user_id, s, e,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS UNBOUNDED PRECEDING) AS block_id
  FROM flagged
),
merged AS (
  SELECT user_id, block_id,
         MIN(s) AS block_start, MAX(e) AS block_end,
         COUNT(*) AS n_events
  FROM blocks GROUP BY user_id, block_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(block_end - block_start) AS BIGINT) AS covered_us
FROM merged GROUP BY user_id ORDER BY user_id
"""


@register(
    "events_interval_coalesce",
    oracle=_ORACLE_INTERVAL_COALESCE,
    tags=("events", "timeseries", "window"),
    doc=(
        "Interval COALESCING (merge overlapping/touching spans): each "
        "event opens a 10-minute activity interval; per user, "
        "overlapping intervals merge into maximal blocks via the "
        "running-max-of-end break test (a new block starts only when "
        "the next start exceeds every previous end — the packing/"
        "scheduling primitive behind availability windows, downtime "
        "merging, and span dedup in text rebuilds). One per-user window "
        "pass (running MAX over epoch-micros integers — exact), then "
        "two hash aggregates; reports blocks, events, and exact covered "
        "microseconds per user."
    ),
)
def events_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600_000_000).alias("e"),
        "event_id",
    )
    w_prev = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0)
        .alias("brk"),
        "event_id",
    )
    w_run = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    blocks = flagged.withColumn("block_id", F.sum("brk").over(w_run))
    merged = blocks.groupBy("user_id", "block_id").agg(
        F.min("s").alias("block_start"),
        F.max("e").alias("block_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum(F.col("block_end") - F.col("block_start"))
            .cast("bigint")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


# -- seasonal decomposition (trend / day-of-week / residual) --------------------

_ORACLE_SEASONAL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT)) AS BIGINT)
           AS v_e4
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
win AS (
  SELECT d, v_e4,
         CAST(SUM(v_e4) OVER w AS BIGINT) AS t7,
         CAST(COUNT(*) OVER w AS BIGINT) AS c7,
         CAST(MAX(d) OVER w - MIN(d) OVER w AS INTEGER) AS span
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
valid AS (
  SELECT d, v_e4,
         CASE WHEN c7 = 7 AND span = 6 THEN t7 END AS t7,
         CAST(d - DATE '1970-01-05' AS INTEGER) % 7 AS dow
  FROM win
),
seas AS (
  SELECT dow,
         CAST(SUM(7 * v_e4 - t7) AS BIGINT) AS s_sum,
         CAST(COUNT(t7) AS BIGINT) AS s_cnt
  FROM valid WHERE t7 IS NOT NULL GROUP BY dow
)
SELECT v.d AS day,
       CAST(v.v_e4 AS DOUBLE) / 10000.0 AS value,
       CAST(v.t7 AS DOUBLE) / 70000.0 AS trend,
       CAST(s.s_sum AS DOUBLE) / CAST(s.s_cnt AS DOUBLE) / 70000.0
         AS seasonal,
       CAST(v.v_e4 AS DOUBLE) / 10000.0
         - CAST(v.t7 AS DOUBLE) / 70000.0
         - CAST(s.s_sum AS DOUBLE) / CAST(s.s_cnt AS DOUBLE) / 70000.0
         AS residual
FROM valid v LEFT JOIN seas s ON s.dow = v.dow
ORDER BY day
"""


@register(
    "events_seasonal_decompose",
    oracle=_ORACLE_SEASONAL,
    tags=("events", "timeseries"),
    doc=(
        "Classical seasonal decomposition of the daily metric series: "
        "trend = centered 7-day moving average (defined only where the "
        "window covers 7 CONSECUTIVE days — count and span both checked), "
        "seasonal = day-of-week mean of the detrended series, residual = "
        "value - trend - seasonal.  Complements the EWMA/Holt folds with "
        "the decomposition view.  All state is integer fixed-point until "
        "the final projection: detrended values are kept as 7*v - sum7 "
        "(exact BIGINT, no rational intermediates), day-of-week is "
        "epoch-days mod 7 (engine-neutral, Monday=0), so every output "
        "double is one identical division chain on both engines.  The "
        "global-order window is bounded by calendar days (allowlisted "
        "global sort)."
    ),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("value") * 10000.0, 0).cast("bigint"))
        .cast("bigint")
        .alias("v_e4")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "v_e4",
        F.sum("v_e4").over(w).cast("bigint").alias("t7"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("c7"),
        F.datediff(F.max("d").over(w), F.min("d").over(w)).alias("span"),
    )
    valid = win.select(
        "d",
        "v_e4",
        F.when((F.col("c7") == 7) & (F.col("span") == 6), F.col("t7")).alias(
            "t7"
        ),
        (F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")) % 7).alias(
            "dow"
        ),
    )
    seas = (
        valid.where(F.col("t7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum(F.lit(7) * F.col("v_e4") - F.col("t7"))
            .cast("bigint")
            .alias("s_sum"),
            F.count("t7").cast("bigint").alias("s_cnt"),
        )
    )
    value = F.col("v_e4").cast("double") / F.lit(10000.0)
    trend = F.col("t7").cast("double") / F.lit(70000.0)
    seasonal = (
        F.col("s_sum").cast("double")
        / F.col("s_cnt").cast("double")
        / F.lit(70000.0)
    )
    return (
        valid.join(F.broadcast(seas), "dow", "left")
        .select(
            F.col("d").alias("day"),
            value.alias("value"),
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            (value - trend - seasonal).alias("residual"),
        )
        .orderBy("day")
    )


# -- CUSUM changepoint detection -------------------------------------------------

_ORACLE_CUSUM = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(round(value * 10000.0, 0) AS BIGINT))
              // COUNT(*) AS BIGINT) AS m_e4
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list(d ORDER BY d) AS days,
         list(CAST(m_e4 AS DOUBLE) / 10000.0 ORDER BY d) AS xs,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(m_e4) AS BIGINT) AS s1,
         CAST(SUM(m_e4 * m_e4) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
),
params AS (
  SELECT *,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 AS mu,
         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
              / CAST(n * n AS DOUBLE)) / 10000.0 AS sd
  FROM series
),
folded AS (
  SELECT event_type, days, n, mu, sd,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0, -1.0, 0.0],
                        list_transform(xs, x -> [x, 0.0, 0.0, 0.0, 0.0])),
           (acc, e) -> [
             greatest(0.0, acc[1] + (e[1] - mu - 0.5 * sd)),
             greatest(0.0, acc[2] + (mu - e[1] - 0.5 * sd)),
             greatest(acc[3],
                      greatest(0.0, acc[1] + (e[1] - mu - 0.5 * sd)),
                      greatest(0.0, acc[2] + (mu - e[1] - 0.5 * sd))),
             CASE WHEN acc[4] >= 0.0 THEN acc[4]
                  WHEN greatest(
                         greatest(0.0, acc[1] + (e[1] - mu - 0.5 * sd)),
                         greatest(0.0, acc[2] + (mu - e[1] - 0.5 * sd)))
                       > 4.0 * sd
                  THEN acc[5] + 1.0 ELSE -1.0 END,
             acc[5] + 1.0]) AS st
  FROM params
)
SELECT event_type,
       n AS n_days,
       round(mu, 6) AS mean_daily,
       round(sd, 6) AS sd_daily,
       round(st[3], 6) AS max_cusum,
       CASE WHEN st[4] >= 0.0 THEN days[CAST(st[4] AS INTEGER)] END
         AS first_alarm_day
FROM folded ORDER BY event_type
"""


@register(
    "events_cusum_changepoint",
    oracle=_ORACLE_CUSUM,
    tags=("events", "timeseries", "anomaly"),
    doc=(
        "Two-sided CUSUM changepoint detector (Page 1954) on the daily "
        "mean-value series per event type: S+_t = max(0, S+ + (x-mu-k)), "
        "S-_t symmetric, k = 0.5 sd slack, alarm at 4 sd — the classic "
        "sequential drift detector that a rolling z-score misses (it "
        "accumulates many small shifts). Third member of the "
        "sequential-fold family (EWMA, Holt): day-bounded VECTOR-state "
        "fold [S+, S-, running max, first-alarm idx, i] executed as one "
        "deterministic array fold JVM-side — bit-identical to DuckDB's "
        "list_reduce with a prepended zero-init element. Daily means and "
        "sd come from exact integer sums (floor-divided fixed point), so "
        "mu/sd/every fold step are the same doubles on both engines."
    ),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(value * 10000.0, 0) AS BIGINT)) "
            "DIV count(*) AS BIGINT)"
        ).alias("m_e4")
    )
    series = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(d, m_e4))), "
               "s -> s.d)").alias("days"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, m_e4))), "
            "s -> CAST(s.m_e4 AS DOUBLE) / 10000.0)"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("m_e4").cast("bigint").alias("s1"),
        F.sum(F.col("m_e4") * F.col("m_e4")).cast("bigint").alias("s2"),
    )
    params = series.withColumn(
        "mu",
        F.col("s1").cast("double") / F.col("n").cast("double") / F.lit(1e4),
    ).withColumn(
        "sd",
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n") * F.col("n")).cast("double")
        )
        / F.lit(1e4),
    )
    fold = """
aggregate(
  transform(xs, x -> array(x, 0D, 0D, 0D, 0D)),
  array(0D, 0D, 0D, -1D, 0D),
  (acc, e) -> array(
    greatest(0D, acc[0] + (e[0] - mu - 0.5 * sd)),
    greatest(0D, acc[1] + (mu - e[0] - 0.5 * sd)),
    greatest(acc[2],
             greatest(0D, acc[0] + (e[0] - mu - 0.5 * sd)),
             greatest(0D, acc[1] + (mu - e[0] - 0.5 * sd))),
    CASE WHEN acc[3] >= 0D THEN acc[3]
         WHEN greatest(
                greatest(0D, acc[0] + (e[0] - mu - 0.5 * sd)),
                greatest(0D, acc[1] + (mu - e[0] - 0.5 * sd)))
              > 4.0 * sd
         THEN acc[4] + 1D ELSE -1D END,
    acc[4] + 1D))
"""
    folded = params.withColumn("st", F.expr(fold))
    return folded.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round("mu", 6).alias("mean_daily"),
        F.round("sd", 6).alias("sd_daily"),
        F.round(F.expr("st[2]"), 6).alias("max_cusum"),
        F.expr(
            "CASE WHEN st[3] >= 0D "
            "THEN element_at(days, CAST(st[3] AS INT)) END"
        ).alias("first_alarm_day"),
    ).orderBy("event_type")


# -- seasonal-adjusted anomaly flags ---------------------------------------------

_ORACLE_SEASONAL_ANOM = f"""
WITH base AS ({_ORACLE_SEASONAL.replace("ORDER BY day", "")}),
res AS (SELECT day, value, residual FROM base WHERE residual IS NOT NULL),
med AS (
  SELECT residual AS med FROM (
    SELECT residual, ROW_NUMBER() OVER (ORDER BY residual, day) AS r,
           COUNT(*) OVER () AS n
    FROM res
  ) WHERE r = (n + 1) // 2
),
mad AS (
  SELECT dev AS mad FROM (
    SELECT abs(res.residual - med.med) AS dev,
           ROW_NUMBER() OVER (ORDER BY abs(res.residual - med.med),
                              res.day) AS r,
           COUNT(*) OVER () AS n
    FROM res, med
  ) WHERE r = (n + 1) // 2
)
SELECT res.day, round(res.value, 6) AS value,
       round(res.residual, 6) AS residual,
       round(med.med, 6) AS med_residual,
       round(mad.mad, 6) AS mad_residual,
       abs(res.residual - med.med) > 3.5 * mad.mad AS is_anomaly
FROM res, med, mad
ORDER BY res.day
"""


@register(
    "events_seasonal_anomaly",
    oracle=_ORACLE_SEASONAL_ANOM,
    tags=("events", "timeseries", "anomaly", "dq"),
    doc=(
        "Seasonality-adjusted anomaly flags: the residual series from the "
        "trend + day-of-week decomposition (events_seasonal_decompose) "
        "screened with the robust median/MAD rule (|r - med| > 3.5 MAD) — "
        "detrending first is what keeps weekday troughs from reading as "
        "anomalies, MAD is what keeps one real spike from inflating the "
        "threshold (a sd-based rule masks itself). Lower-median order "
        "statistics (explicit ROW_NUMBER selection, never an "
        "interpolating median()) make both engines pick the identical "
        "residual; every residual double is already bit-identical from "
        "the integer fixed-point decomposition."
    ),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    res = (
        events_seasonal_decompose(spark, sf_dir)
        .where(F.col("residual").isNotNull())
        .select("day", "value", "residual")
    )
    n_w = Window.orderBy(F.lit(1))
    med = res.select(
        "residual",
        F.row_number().over(Window.orderBy("residual", "day")).alias("r"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).where(F.col("r") == F.expr("(n + 1) DIV 2")).select(
        F.col("residual").alias("med")
    )
    with_med = res.crossJoin(F.broadcast(med))
    mad = with_med.select(
        F.abs(F.col("residual") - F.col("med")).alias("dev"),
        F.row_number()
        .over(
            Window.orderBy(F.abs(F.col("residual") - F.col("med")), F.col("day"))
        )
        .alias("r"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).where(F.col("r") == F.expr("(n + 1) DIV 2")).select(
        F.col("dev").alias("mad")
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.round("value", 6).alias("value"),
            F.round("residual", 6).alias("residual"),
            F.round("med", 6).alias("med_residual"),
            F.round("mad", 6).alias("mad_residual"),
            (
                F.abs(F.col("residual") - F.col("med"))
                > F.lit(3.5) * F.col("mad")
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )


# -- Markov-chain attribution with removal effects --------------------------------

_MKV_STATES = ("start", "click", "error", "signup", "view", "conv", "null")
_MKV_TYPES = ("click", "error", "signup", "view")
_MKV_ITERS = 64

_MKV_COUNTS_SQL = """
ordered AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
firstp AS (
  SELECT user_id, MIN(rn) AS prn FROM ordered
  WHERE event_type = 'purchase' GROUP BY user_id
),
journey AS (
  SELECT o.user_id, o.event_type, o.rn, f.prn
  FROM ordered o LEFT JOIN firstp f ON o.user_id = f.user_id
  WHERE f.prn IS NULL OR o.rn < f.prn
),
jstats AS (
  SELECT user_id, MAX(rn) AS lastrn, MIN(rn) AS firstrn, MAX(prn) AS prn
  FROM journey GROUP BY user_id
),
trans AS (
  SELECT 'start' AS src, j.event_type AS dst
  FROM journey j JOIN jstats s ON j.user_id = s.user_id AND j.rn = s.firstrn
  UNION ALL
  SELECT 'start', 'conv' FROM firstp WHERE prn = 1
  UNION ALL
  SELECT j.event_type,
         LEAD(j.event_type) OVER (PARTITION BY j.user_id ORDER BY j.rn)
  FROM journey j
  QUALIFY LEAD(j.event_type) OVER (PARTITION BY j.user_id ORDER BY j.rn)
          IS NOT NULL
  UNION ALL
  SELECT j.event_type,
         CASE WHEN s.prn IS NOT NULL THEN 'conv' ELSE 'null' END
  FROM journey j JOIN jstats s ON j.user_id = s.user_id AND j.rn = s.lastrn
),
cnts AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM trans GROUP BY 1, 2
)
"""


def _mkv_p_expr(i: str, j: str, removed: str | None) -> str:
    """SQL expression for P'[i][j] under an optional removal scenario —
    the same single-operation shapes the driver's Python floats use."""
    def n(a: str, b: str) -> str:
        return (
            f"COALESCE((SELECT CAST(cnt AS DOUBLE) FROM cnts "
            f"WHERE src = '{a}' AND dst = '{b}'), 0.0)"
        )

    def t(a: str) -> str:
        return (
            f"COALESCE((SELECT CAST(SUM(cnt) AS DOUBLE) FROM cnts "
            f"WHERE src = '{a}'), 0.0)"
        )

    if i in ("conv", "null"):
        return "1.0" if j == i else "0.0"
    if removed is not None and i == removed:
        return "1.0" if j == "null" else "0.0"
    base = f"CASE WHEN {t(i)} = 0.0 THEN {{fallback}} ELSE {{p}} END"
    if removed is None or j not in ("null", removed):
        p = f"{n(i, j)} / {t(i)}"
        return base.format(fallback="1.0" if j == "null" else "0.0", p=p)
    if j == removed:
        return "0.0"
    # j == 'null' under removal: redirected mass, ONE addition
    p = f"({n(i, 'null')} / {t(i)} + {n(i, removed)} / {t(i)})"
    return base.format(fallback="1.0", p=p)


def _mkv_oracle() -> str:
    scen_rows = []
    for scen in (None, *_MKV_TYPES):
        cols = []
        for j in _MKV_STATES:
            entries = ", ".join(
                _mkv_p_expr(i, j, scen) for i in _MKV_STATES
            )
            cols.append(f"[{entries}]")
        fold = (
            "list_reduce(list_prepend("
            "CAST([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]), "
            f"list_transform(range({_MKV_ITERS}), x -> CAST([0.0] AS DOUBLE[]))), "
            "(acc, e) -> ["
            + ", ".join(f"list_dot_product(c[{k + 1}], acc)" for k in range(7))
            + "])"
        )
        name = "base" if scen is None else f"removed:{scen}"
        scen_rows.append(
            f"SELECT '{name}' AS scenario, "
            f"(({fold})[6]) AS p_conv FROM (SELECT [{', '.join(cols)}] AS c)"
        )
    rows = "\n  UNION ALL\n  ".join(scen_rows)
    return f"""
WITH {_MKV_COUNTS_SQL},
sol AS MATERIALIZED (
  {rows}
)
SELECT scenario, round(p_conv, 9) AS p_conv,
       round((SELECT p_conv FROM sol WHERE scenario = 'base') - p_conv, 9)
         AS p_drop,
       round(CASE WHEN (SELECT p_conv FROM sol WHERE scenario = 'base') = 0.0
                  THEN 0.0
                  ELSE ((SELECT p_conv FROM sol WHERE scenario = 'base')
                        - p_conv)
                       / (SELECT p_conv FROM sol WHERE scenario = 'base')
             END, 6) AS removal_effect
FROM sol ORDER BY scenario
"""


@register(
    "events_markov_attribution",
    oracle=_mkv_oracle(),
    tags=("events", "analytics", "ml", "attribution"),
    doc=(
        "Markov-chain attribution with REMOVAL EFFECTS (Anderl et al. "
        "2014) — the model-based upgrade over last-touch: user journeys "
        "(events up to the first purchase) estimate a first-order "
        "transition matrix over start/4 channels/conv/null; each "
        "channel's credit is the drop in absorption probability when "
        "transitions into it are redirected to the null sink. The "
        "distributed part is the transition-count aggregate (windows per "
        "user, one shuffle); the solver runs on the BOUNDED 7x7 state "
        "(driver floats) as 64 power-iteration steps, each a sequence of "
        "sequential-fold dot products — the exact arithmetic "
        "list_dot_product performs, so the DuckDB oracle reproduces every "
        "double bit-for-bit via the same fold (list_reduce over 64 dummy "
        "steps; no convergence-tolerance ambiguity, both engines compute "
        "the identical 64-step approximation)."
    ),
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    journey = ordered.join(firstp, "user_id", "left").where(
        F.col("prn").isNull() | (F.col("rn") < F.col("prn"))
    )
    jstats = journey.groupBy("user_id").agg(
        F.max("rn").alias("lastrn"),
        F.min("rn").alias("firstrn"),
        F.max("prn").alias("prn"),
    )
    jw = Window.partitionBy("user_id").orderBy("rn")
    jmin = journey.drop("prn")
    starts = jmin.join(jstats, "user_id").where(
        F.col("rn") == F.col("firstrn")
    ).select(F.lit("start").alias("src"), F.col("event_type").alias("dst"))
    direct = firstp.where(F.col("prn") == 1).select(
        F.lit("start").alias("src"), F.lit("conv").alias("dst")
    )
    steps = (
        journey.withColumn("nxt", F.lead("event_type").over(jw))
        .where(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
    )
    lasts = jmin.join(jstats, "user_id").where(
        F.col("rn") == F.col("lastrn")
    ).select(
        F.col("event_type").alias("src"),
        F.when(F.col("prn").isNotNull(), "conv").otherwise("null").alias(
            "dst"
        ),
    )
    cnts = {
        (r["src"], r["dst"]): r["cnt"]
        for r in starts.unionByName(direct)
        .unionByName(steps)
        .unionByName(lasts)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()  # bounded: <= |states|^2 rows
    }

    S = _MKV_STATES
    tot = {i: float(sum(c for (s, _), c in cnts.items() if s == i)) for i in S}

    def p(i: str, j: str, removed: str | None) -> float:
        # mirrors _mkv_p_expr operation-for-operation
        if i in ("conv", "null"):
            return 1.0 if j == i else 0.0
        if removed is not None and i == removed:
            return 1.0 if j == "null" else 0.0
        if tot[i] == 0.0:
            if removed is None or j not in ("null", removed):
                return 1.0 if j == "null" else 0.0
            return 0.0 if j == removed else 1.0
        if removed is None or j not in ("null", removed):
            return float(cnts.get((i, j), 0)) / tot[i]
        if j == removed:
            return 0.0
        return (
            float(cnts.get((i, "null"), 0)) / tot[i]
            + float(cnts.get((i, removed), 0)) / tot[i]
        )

    def solve(removed: str | None) -> float:
        cols = [[p(i, j, removed) for i in S] for j in S]
        v = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        for _ in range(_MKV_ITERS):
            nv = []
            for j in range(7):
                acc = 0.0
                for i in range(7):  # the list_dot_product sequential fold
                    acc += cols[j][i] * v[i]
                nv.append(acc)
            v = nv
        return v[5]  # conv

    base = solve(None)
    out = [("base", round(base, 9), round(0.0, 9), 0.0)]
    for t in _MKV_TYPES:
        pc = solve(t)
        eff = 0.0 if base == 0.0 else (base - pc) / base
        out.append(
            (f"removed:{t}", round(pc, 9), round(base - pc, 9), round(eff, 6))
        )
    out.sort()
    return spark.createDataFrame(
        out, "scenario string, p_conv double, p_drop double, removal_effect double"
    )


# -- Nelson-Aalen cumulative hazard (r8) -----------------------------------------

_ORACLE_NELSON_AALEN = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p0,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
),
spells AS (
  SELECT user_id,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0 THEN 1 ELSE 0 END AS ev,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0
              THEN date_diff('day', s0, p0)
              ELSE date_diff('day', s0, last_seen) END AS dur
  FROM per_user WHERE s0 IS NOT NULL
),
grouped AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(1 - ev) AS BIGINT) AS c
  FROM spells GROUP BY dur
),
ordered AS (
  SELECT dur, d, c,
         CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM spells) -
           COALESCE(SUM(d + c) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM grouped
)
SELECT dur AS duration_days, d AS n_events, n_risk,
       round(SUM(CAST(d AS DOUBLE) / n_risk)
             OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cum_hazard,
       round(exp(-SUM(CAST(d AS DOUBLE) / n_risk)
             OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         AS breslow_survival,
       round(SUM(CAST(d AS DOUBLE) * (n_risk - d)
                 / (CAST(n_risk AS DOUBLE) * n_risk * n_risk))
             OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS var_hazard
FROM ordered ORDER BY dur
"""


@register(
    "events_hazard_nelson_aalen",
    oracle=_ORACLE_NELSON_AALEN,
    tags=("events", "stats", "analytics"),
    doc=(
        "Nelson-Aalen cumulative hazard H(t) = sum(d_i/n_i) with the "
        "standard variance estimate sum(d_i(n_i-d_i)/n_i^3) and the "
        "Breslow survival exp(-H) — the KM sibling (same signup->purchase "
        "spells, same right-censoring) that estimates hazard directly "
        "instead of survival. The cumulative sums run over the identical "
        "sorted duration order in both engines (sequential left-to-right "
        "accumulation, the events_survival_kaplan_meier contract), so "
        "round-6 values match exactly; the duration table stays bounded "
        "by distinct day counts regardless of user count."
    ),
)
def events_hazard_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p0"),
        F.max("ts").alias("last_seen"),
    )
    has_event = F.col("p0").isNotNull() & (F.col("p0") >= F.col("s0"))
    spells = per_user.where(F.col("s0").isNotNull()).select(
        F.when(has_event, 1).otherwise(0).alias("ev"),
        F.when(
            has_event,
            F.datediff(F.col("p0").cast("date"), F.col("s0").cast("date")),
        )
        .otherwise(
            F.datediff(F.col("last_seen").cast("date"), F.col("s0").cast("date"))
        )
        .alias("dur"),
    )
    total = spells.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    grouped = spells.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = grouped.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).cast("bigint"),
    )
    hz = F.col("d").cast("double") / F.col("n_risk")
    vz = (
        F.col("d").cast("double")
        * (F.col("n_risk") - F.col("d"))
        / (F.col("n_risk").cast("double") * F.col("n_risk") * F.col("n_risk"))
    )
    return (
        ordered.select(
            F.col("dur").alias("duration_days"),
            F.col("d").alias("n_events"),
            "n_risk",
            F.round(F.sum(hz).over(w_run), 6).alias("cum_hazard"),
            F.round(F.exp(-F.sum(hz).over(w_run)), 6).alias("breslow_survival"),
            F.round(F.sum(vz).over(w_run), 6).alias("var_hazard"),
        )
        .orderBy("duration_days")
    )


# -- Daily autocorrelation function (r8) ------------------------------------------

_ACF_MAX_LAG = 7

_ORACLE_ACF = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, x FROM daily
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM idx
),
cent AS (  -- n*x_t - S is an exact integer residual scaled by n
  SELECT t, CAST(n * x - s AS BIGINT) AS r FROM idx, tot
),
den AS (SELECT CAST(SUM(r * r) AS BIGINT) AS d2 FROM cent),
lags AS (
  SELECT l.lag,
         CAST(SUM(a.r * b.r) AS BIGINT) AS num
  FROM (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag) l
  JOIN cent a ON TRUE
  JOIN cent b ON b.t = a.t + l.lag
  GROUP BY l.lag
)
SELECT CAST(lag AS INTEGER) AS lag, num,
       (SELECT d2 FROM den) AS den,
       round(CAST(num AS DOUBLE) / (SELECT d2 FROM den), 6) AS acf
FROM lags ORDER BY lag
"""


@register(
    "events_autocorrelation_daily",
    oracle=_ORACLE_ACF,
    tags=("events", "timeseries", "stats"),
    doc=(
        f"Autocorrelation function of the daily event-count series at lags "
        f"1..{_ACF_MAX_LAG} — the seasonality detector run before picking "
        "events_seasonal_decompose's period. EXACT integer path: residuals "
        "are scaled by n (r_t = n*x_t - S, an integer), so numerator and "
        "denominator are exact BIGINT sums of integer products and the "
        "shared n^2 factor cancels in the ratio — no float mean subtraction "
        "crosses the oracle. The lag join runs over the bounded daily "
        "spine (<=31 rows), never raw events."
    ),
)
def events_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x"
    )
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = idx.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("x") - F.col("s")).cast("bigint").alias("r")
    )
    den = cent.agg(F.sum(F.col("r") * F.col("r")).cast("bigint").alias("d2"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = cent.select(F.col("t").alias("ta"), F.col("r").alias("ra"))
    b = cent.select(F.col("t").alias("tb"), F.col("r").alias("rb"))
    num = (
        lags.crossJoin(a)
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("num"))
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "num",
            F.col("d2").alias("den"),
            F.round(F.col("num").cast("double") / F.col("d2"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


# -- Funnel stage-delay percentiles (r8) -------------------------------------------

_ORACLE_FUNNEL_DELAYS = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS v0,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS c0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p0
  FROM events GROUP BY user_id
),
delays AS (
  SELECT 'view->signup' AS stage,
         CAST(date_diff('second', v0, c0) AS BIGINT) AS delay_s
  FROM per_user WHERE v0 IS NOT NULL AND c0 IS NOT NULL AND c0 >= v0
  UNION ALL
  SELECT 'signup->purchase',
         CAST(date_diff('second', c0, p0) AS BIGINT)
  FROM per_user WHERE c0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= c0
  UNION ALL
  SELECT 'view->purchase',
         CAST(date_diff('second', v0, p0) AS BIGINT)
  FROM per_user WHERE v0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= v0
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(quantile_cont(delay_s, 0.5), 4) AS p50_s,
       round(quantile_cont(delay_s, 0.9), 4) AS p90_s,
       round(CAST(SUM(delay_s) AS DOUBLE) / COUNT(*), 4) AS mean_s
FROM delays GROUP BY stage ORDER BY stage
"""


@register(
    "events_funnel_delay_percentiles",
    oracle=_ORACLE_FUNNEL_DELAYS,
    tags=("events", "funnel", "analytics"),
    doc=(
        "Time-to-convert distribution per funnel stage (view->signup, "
        "signup->purchase, view->purchase): per-user first-touch collapse, "
        "delays as exact integer seconds, then interpolated p50/p90 "
        "(Spark percentile == DuckDB quantile_cont, the agg_percentiles "
        "parity) and an exact-rational mean. The latency companion to "
        "events_funnel_stages' count funnel; one per-user aggregate then "
        "a 3-group reduce."
    ),
)
def events_funnel_delay_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v0"),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("c0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p0"),
    )

    def leg(a: str, b: str, stage: str) -> DataFrame:
        return (
            per_user.where(
                F.col(a).isNotNull()
                & F.col(b).isNotNull()
                & (F.col(b) >= F.col(a))
            )
            .select(
                F.lit(stage).alias("stage"),
                (
                    F.unix_timestamp(F.col(b)) - F.unix_timestamp(F.col(a))
                )
                .cast("bigint")
                .alias("delay_s"),
            )
        )

    delays = (
        leg("v0", "c0", "view->signup")
        .unionByName(leg("c0", "p0", "signup->purchase"))
        .unionByName(leg("v0", "p0", "view->purchase"))
    )
    return (
        delays.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.percentile("delay_s", F.lit(0.5)), 4).alias("p50_s"),
            F.round(F.percentile("delay_s", F.lit(0.9)), 4).alias("p90_s"),
            F.round(
                F.sum("delay_s").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_s"),
        )
        .orderBy("stage")
    )


# -- Poisson rate-ratio test between two windows (r8) ------------------------------

_ORACLE_RATE_RATIO = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
),
win AS (
  SELECT CASE WHEN date_diff('day', (SELECT d0 FROM bounds),
                             CAST(ts AS DATE)) < 15
              THEN 'w1' ELSE 'w2' END AS w
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT
    CAST(SUM(CASE WHEN w = 'w1' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN w = 'w2' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM win
)
SELECT c1, c2,
       CASE WHEN c1 > 0 AND c2 > 0
            THEN round(CAST(c1 AS DOUBLE) / c2, 6) END AS rate_ratio,
       CASE WHEN c1 > 0 AND c2 > 0
            THEN round((ln(CAST(c1 AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)))
                       / sqrt(1.0 / c1 + 1.0 / c2), 6) END AS z_stat,
       CASE WHEN c1 > 0 AND c2 > 0
            THEN round(exp(ln(CAST(c1 AS DOUBLE) / c2)
                           - 1.96 * sqrt(1.0 / c1 + 1.0 / c2)), 6) END AS rr_lo,
       CASE WHEN c1 > 0 AND c2 > 0
            THEN round(exp(ln(CAST(c1 AS DOUBLE) / c2)
                           + 1.96 * sqrt(1.0 / c1 + 1.0 / c2)), 6) END AS rr_hi
FROM c
"""


@register(
    "events_rate_ratio_test",
    oracle=_ORACLE_RATE_RATIO,
    tags=("events", "stats", "analytics"),
    doc=(
        "Poisson rate-ratio test between the first 15 days and the rest "
        "of the window (purchase counts as Poisson arrivals over equal "
        "exposure): log-rate z statistic and the standard log-normal 95% "
        "CI for the ratio. Counts are exact integers from one conditional "
        "scan; the statistics are single closed-form expressions — the "
        "'did the arrival rate change' companion to events_ab_test_ztest's "
        "proportion test and events_cusum_changepoint's localization."
    ),
)
def events_rate_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    win = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                F.datediff(F.col("ts").cast("date"), F.col("d0")) < 15, "w1"
            )
            .otherwise("w2")
            .alias("w")
        )
    )
    c = win.agg(
        F.sum(F.when(F.col("w") == "w1", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("w") == "w2", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    lnr = F.log(F.col("c1").cast("double") / F.col("c2"))
    se = F.sqrt(1.0 / F.col("c1") + 1.0 / F.col("c2"))
    # both counts must be positive or the statistics are undefined (ln 0
    # RAISES in DuckDB while non-ANSI Spark nulls silently — found by the
    # r8 degenerate-fixture differ): guard identically on both engines
    ok = (F.col("c1") > 0) & (F.col("c2") > 0)
    return c.select(
        "c1",
        "c2",
        F.when(
            ok, F.round(F.col("c1").cast("double") / F.col("c2"), 6)
        ).alias("rate_ratio"),
        F.when(
            ok,
            F.round(
                (
                    F.log(F.col("c1").cast("double"))
                    - F.log(F.col("c2").cast("double"))
                )
                / se,
                6,
            ),
        ).alias("z_stat"),
        F.when(ok, F.round(F.exp(lnr - 1.96 * se), 6)).alias("rr_lo"),
        F.when(ok, F.round(F.exp(lnr + 1.96 * se), 6)).alias("rr_hi"),
    )


# -- Exact running distinct users (first-touch formulation, r8) ---------------------

_ORACLE_CUME_DISTINCT = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
new_by_day AS (
  SELECT d0 AS d, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY d0
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
active AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1
)
SELECT days.d, a.dau,
       COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0))
            OVER (ORDER BY days.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cume_users
FROM days
LEFT JOIN new_by_day n ON n.d = days.d
JOIN active a ON a.d = days.d
ORDER BY days.d
"""


@register(
    "events_cumulative_distinct_users",
    oracle=_ORACLE_CUME_DISTINCT,
    tags=("events", "timeseries", "scale"),
    doc=(
        "EXACT running distinct-user count per day via the first-touch "
        "formulation: min(date) per user -> daily new-user counts -> one "
        "cumulative sum over the bounded day spine. This is the scalable "
        "exact twin of agg_hll_running_daily's sketch (and the reason a "
        "windowed size(collect_set) is never needed): history is never "
        "rescanned, per-day state is one integer, and the only big "
        "shuffle is the per-user min — map-side combinable. DAU kept "
        "beside the cumulative for the classic growth dashboard pair."
    ),
)
def events_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    new_by_day = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    active = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(new_by_day, "d", "left")
        .select(
            "d",
            "dau",
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn(
            "cume_users", F.sum("new_users").over(w).cast("bigint")
        )
        .orderBy("d")
    )


# -- DAU / WAU / MAU stickiness (r8) --------------------------------------------------

_ORACLE_STICKINESS = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM du),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
wau AS (
  SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
  FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
  GROUP BY days.d
),
mau AS (
  SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
  FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 29 DAY AND days.d
  GROUP BY days.d
)
SELECT d.d, d.dau, w.wau, m.mau,
       round(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
FROM dau d JOIN wau w USING (d) JOIN mau m USING (d)
ORDER BY d.d
"""


@register(
    "events_dau_wau_mau",
    oracle=_ORACLE_STICKINESS,
    tags=("events", "timeseries", "analytics"),
    doc=(
        "DAU / rolling-7d WAU / rolling-30d MAU with the DAU/MAU "
        "stickiness ratio — the canonical engagement dashboard. Exact "
        "rolling DISTINCT over sliding windows cannot be a prefix sum "
        "(users re-appear), so the plan collapses events once to the "
        "DISTINCT (day, user) table — bounded by users x active-days, "
        "the corpus-scale step — then range-joins the <=31-day spine "
        "against it (spine side broadcast, fanout <= window length) and "
        "count-distincts per spine day. Window-length-bounded work, "
        "never a rescan of raw events; the sketch alternative for "
        "much longer windows is agg_hll_running_daily's register merge."
    ),
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))

    def rolling(n_days: int, name: str) -> DataFrame:
        spine = days.select(F.col("d").alias("spine_d"))
        return (
            du.join(
                F.broadcast(spine),
                (F.col("d") <= F.col("spine_d"))
                & (F.col("d") >= F.date_sub(F.col("spine_d"), n_days - 1)),
            )
            .groupBy("spine_d")
            .agg(F.countDistinct("user_id").cast("bigint").alias(name))
            .withColumnRenamed("spine_d", "d")
        )

    return (
        dau.join(rolling(7, "wau"), "d")
        .join(rolling(30, "mau"), "d")
        .select(
            "d",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("d")
    )


# -- Wilcoxon signed-rank (paired first/second half days, r8) -------------------------

_ORACLE_WILCOXON = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, x FROM daily
),
paired AS (
  SELECT a.t AS pair_id, CAST(a.x - b.x AS BIGINT) AS diff
  FROM idx a JOIN idx b ON b.t = a.t + 15
  WHERE a.t <= 15 AND a.x <> b.x
),
ranked AS (  -- rank |diff|, ties broken by pair_id (documented total order)
  SELECT diff, ROW_NUMBER() OVER (ORDER BY abs(diff), pair_id) AS rk
  FROM paired
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS BIGINT) AS w_plus,
         CAST(SUM(CASE WHEN diff < 0 THEN rk ELSE 0 END) AS BIGINT) AS w_minus
  FROM ranked
)
SELECT n, w_plus, w_minus,
       round((CAST(w_plus AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 4.0)
             / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0), 6)
         AS z_stat
FROM agg
"""


@register(
    "events_wilcoxon_signed_rank",
    oracle=_ORACLE_WILCOXON,
    tags=("events", "stats"),
    doc=(
        "Wilcoxon signed-rank test pairing each of the first 15 days "
        "with its day 15 days later (did traffic shift between the month "
        "halves, without assuming normality): zero diffs dropped, |diff| "
        "ranked under a documented total order (abs diff, then pair id — "
        "the deterministic stand-in for average ranks, identical in both "
        "engines), W+ / W- as exact BIGINT rank sums, normal-approx z. "
        "The nonparametric complement to ml_welch_t_test; all windows "
        "run over the bounded daily spine."
    ),
)
def events_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x"
    )
    a = idx.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = idx.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    paired = (
        a.join(b, F.col("tb") == F.col("ta") + 15)
        .where((F.col("ta") <= 15) & (F.col("xa") != F.col("xb")))
        .select(
            F.col("ta").alias("pair_id"),
            (F.col("xa") - F.col("xb")).cast("bigint").alias("diff"),
        )
    )
    ranked = paired.select(
        "diff",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("diff")), F.col("pair_id")))
        .alias("rk"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("rk")).otherwise(0))
        .cast("bigint")
        .alias("w_plus"),
        F.sum(F.when(F.col("diff") < 0, F.col("rk")).otherwise(0))
        .cast("bigint")
        .alias("w_minus"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "n",
        "w_plus",
        "w_minus",
        F.round(
            (F.col("w_plus").cast("double") - n * (n + 1) / 4.0)
            / F.sqrt(n * (n + 1) * (2 * n + 1) / 24.0),
            6,
        ).alias("z_stat"),
    )


# -- Holt-Winters additive smoothing (r8) ---------------------------------------------

_HW_A, _HW_B, _HW_G = 0.3, 0.1, 0.2  # level / trend / seasonal rates
_HW_P = 7  # weekly season


def _hw_fold_spark() -> str:
    """Spark array-fold step (0-based acc: [L, B, s0..s6, i, sse])."""
    sold = "acc[CAST(acc[9] AS INT) % 7 + 2]"
    lnew = f"({_HW_A}D * (e[0] - {sold}) + {1 - _HW_A}D * (acc[0] + acc[1]))"
    bnew = f"({_HW_B}D * ({lnew} - acc[0]) + {1 - _HW_B}D * acc[1])"
    snew = f"({_HW_G}D * (e[0] - {lnew}) + {1 - _HW_G}D * {sold})"
    err = f"(e[0] - (acc[0] + acc[1] + {sold}))"
    return (
        "aggregate(transform(slice(xs, 8, size(xs) - 7), x -> array(x)), "
        "concat(array(CAST(s7a AS DOUBLE) / 7.0D, "
        "             (CAST(s7b AS DOUBLE) - s7a) / 49.0D), "
        "       transform(slice(xs, 1, 7), "
        "                 x -> x - CAST(s7a AS DOUBLE) / 7.0D), "
        "       array(7.0D, 0.0D)), "
        f"(acc, e) -> concat(array({lnew}, {bnew}), "
        "  transform(sequence(0, 6), k -> CASE "
        f"    WHEN k = CAST(acc[9] AS INT) % 7 THEN {snew} "
        "    ELSE acc[k + 2] END), "
        f"  array(acc[9] + 1.0D, acc[10] + {err} * {err})))"
    )


def _hw_fold_duck() -> str:
    """DuckDB list_reduce step (1-based acc: [L, B, s1..s7, i, sse]);
    a prepended init element + LIST accumulator, the CUSUM contract."""
    sold = "acc[(CAST(acc[10] AS INT) % 7) + 3]"
    lnew = f"({_HW_A} * (e[1] - {sold}) + {1 - _HW_A} * (acc[1] + acc[2]))"
    bnew = f"({_HW_B} * ({lnew} - acc[1]) + {1 - _HW_B} * acc[2])"
    snew = f"({_HW_G} * (e[1] - {lnew}) + {1 - _HW_G} * {sold})"
    err = f"(e[1] - (acc[1] + acc[2] + {sold}))"
    return (
        "list_reduce(list_prepend("
        "  list_concat(list_concat("
        "    [CAST(s7a AS DOUBLE) / 7.0, (CAST(s7b AS DOUBLE) - s7a) / 49.0],"
        "    list_transform(xs[1:7], x -> x - CAST(s7a AS DOUBLE) / 7.0)),"
        "    [7.0, 0.0]),"
        "  list_transform(xs[8:], x -> [x, 0.0, 0.0, 0.0, 0.0, 0.0,"
        "                               0.0, 0.0, 0.0, 0.0, 0.0])),"
        f"(acc, e) -> list_concat(list_concat([{lnew}, {bnew}],"
        "  list_transform(range(7), k -> CASE "
        f"    WHEN k = (CAST(acc[10] AS INT) % 7) THEN {snew} "
        "    ELSE acc[k + 3] END)),"
        f"  [acc[10] + 1.0, acc[11] + {err} * {err}]))"
    )


_ORACLE_HOLT_WINTERS = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list(CAST(x AS DOUBLE) ORDER BY d) AS xs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily GROUP BY event_type
),
inits AS (
  SELECT event_type, xs, n,
         CAST(list_sum(list_transform(xs[1:7], x -> CAST(x AS BIGINT)))
              AS BIGINT) AS s7a,
         CAST(list_sum(list_transform(xs[8:14], x -> CAST(x AS BIGINT)))
              AS BIGINT) AS s7b
  FROM series WHERE n >= 14
),
folded AS (
  SELECT event_type, n, {_hw_fold_duck()} AS st FROM inits
)
SELECT event_type, n AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[3], 6) AS s0, round(st[4], 6) AS s1, round(st[5], 6) AS s2,
       round(st[6], 6) AS s3, round(st[7], 6) AS s4, round(st[8], 6) AS s5,
       round(st[9], 6) AS s6,
       round(st[11] / (n - 7), 6) AS mse_one_step
FROM folded ORDER BY event_type
"""


@register(
    "events_holt_winters_additive",
    oracle=_ORACLE_HOLT_WINTERS,
    tags=("events", "timeseries", "forecast"),
    doc=(
        "Holt-Winters ADDITIVE triple exponential smoothing (level + "
        "trend + weekly seasonal, alpha/beta/gamma = 0.3/0.1/0.2) per "
        "event type, with the one-step-ahead forecast MSE — completing "
        "the sequential-fold family (EWMA -> Holt linear -> CUSUM -> "
        "HW seasonal). The recursion runs as ONE deterministic 11-cell "
        "vector-state array fold over the day-bounded series (classic "
        "first-period init: L = mean of week 1, B = week-over-week mean "
        "drift / 7, S_j = x_j - L), bit-identical to DuckDB's "
        "list_reduce with a prepended init element and a LIST "
        "accumulator (the CUSUM cross-engine contract; per-period "
        "seasonal slots updated by index inside the fold). Daily counts "
        "are exact integers, so the init state and every fold step are "
        "the same doubles on both engines."
    ),
)
def events_holt_winters_additive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, x))), "
            "s -> CAST(s.x AS DOUBLE))"
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    inits = series.where(F.col("n") >= 14).select(
        "event_type",
        "xs",
        "n",
        F.expr(
            "CAST(aggregate(slice(xs, 1, 7), 0L, "
            "(a, x) -> a + CAST(x AS BIGINT)) AS BIGINT)"
        ).alias("s7a"),
        F.expr(
            "CAST(aggregate(slice(xs, 8, 7), 0L, "
            "(a, x) -> a + CAST(x AS BIGINT)) AS BIGINT)"
        ).alias("s7b"),
    )
    folded = inits.withColumn("st", F.expr(_hw_fold_spark()))
    return folded.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.expr("st[0]"), 6).alias("level"),
        F.round(F.expr("st[1]"), 6).alias("trend"),
        *[
            F.round(F.expr(f"st[{i + 2}]"), 6).alias(f"s{i}")
            for i in range(7)
        ],
        F.round(F.expr("st[10]") / (F.col("n") - 7), 6).alias(
            "mse_one_step"
        ),
    ).orderBy("event_type")


# -- Cohort LTV curves (cumulative revenue per cohort-age) (r9) -----------------

_ORACLE_COHORT_LTV = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
sizes AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
          FROM first_seen GROUP BY cohort_day),
rev AS (
  SELECT f.cohort_day,
         CAST(ts AS DATE) - f.cohort_day AS age,
         CAST(SUM(CAST(round(e.value * 100.0, 0) AS BIGINT)) AS BIGINT)
           AS rev_e2
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  WHERE e.value IS NOT NULL AND e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_day, age, rev_e2,
         CAST(SUM(rev_e2) OVER (PARTITION BY cohort_day ORDER BY age)
              AS BIGINT) AS cum_rev_e2
  FROM rev
)
SELECT c.cohort_day, CAST(c.age AS BIGINT) AS age, s.cohort_users,
       c.rev_e2, c.cum_rev_e2,
       CAST(c.cum_rev_e2 * 10 // s.cohort_users AS BIGINT)
         AS ltv_per_user_e3
FROM cum c JOIN sizes s ON s.cohort_day = c.cohort_day
ORDER BY c.cohort_day, c.age
"""


@register(
    "events_cohort_ltv",
    oracle=_ORACLE_COHORT_LTV,
    tags=("events", "analytics", "agg"),
    doc=(
        "Cohort LTV curves: users grouped by first-seen day, purchase "
        "revenue accumulated per (cohort, days-since-first-seen) — the "
        "monetary companion of events_cohort_retention's activity "
        "triangle (does a cohort's cumulative value bend up or flatten "
        "as it ages?). Exact BIGINT cents throughout; per-user LTV is "
        "floor tenth-cents so no division crosses the hash. The "
        "cumulative window is per-COHORT over per-age pre-aggregates "
        "(calendar-bounded rows: cohorts x ages, never event-scale); "
        "the first-seen table is one row per user and broadcasts."
    ),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    rev = (
        ev.where(
            F.col("value").isNotNull() & (F.col("event_type") == "purchase")
        )
        .join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "age"
            ),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev_e2")
        )
    )
    wc = Window.partitionBy("cohort_day").orderBy("age")
    cum = rev.withColumn(
        "cum_rev_e2", F.sum("rev_e2").over(wc).cast("bigint")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.col("age").cast("bigint").alias("age"),
            "cohort_users",
            "rev_e2",
            "cum_rev_e2",
            F.expr(
                "CAST(cum_rev_e2 * 10 div cohort_users AS BIGINT)"
            ).alias("ltv_per_user_e3"),
        )
        .orderBy("cohort_day", "age")
    )


# -- Rule-based multi-touch attribution (first/last/linear) (r9) ----------------

_ORACLE_ATTRIBUTION = """
WITH conv AS (
  SELECT user_id, MIN(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.ts, e.event_id, e.event_type
  FROM events e JOIN conv c ON c.user_id = e.user_id
  WHERE e.ts < c.conv_ts AND e.event_type <> 'purchase'
),
per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM touches GROUP BY user_id
),
ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM touches
),
linear AS (
  SELECT t.event_type,
         CAST(SUM(1000000 // p.k) AS BIGINT) AS linear_credit_e6,
         CAST(COUNT(*) AS BIGINT) AS n_touches
  FROM touches t JOIN per_user p ON p.user_id = t.user_id
  GROUP BY t.event_type
),
firsts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS first_touch_conv
  FROM ordered WHERE rn_a = 1 GROUP BY 1
),
lasts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS last_touch_conv
  FROM ordered WHERE rn_d = 1 GROUP BY 1
)
SELECT l.event_type AS channel, l.n_touches, l.linear_credit_e6,
       COALESCE(f.first_touch_conv, 0) AS first_touch_conv,
       COALESCE(la.last_touch_conv, 0) AS last_touch_conv
FROM linear l
LEFT JOIN firsts f ON f.event_type = l.event_type
LEFT JOIN lasts la ON la.event_type = l.event_type
ORDER BY l.event_type
"""


@register(
    "events_attribution_models",
    oracle=_ORACLE_ATTRIBUTION,
    tags=("events", "analytics", "agg"),
    doc=(
        "Rule-based multi-touch attribution next to the data-driven one "
        "(events_markov_attribution): each converting user's pre-first-"
        "purchase touch journey credits its channels under the three "
        "standard models at once — first-touch (min (ts, event_id) "
        "struct per user), last-touch (max), and linear (floor(1e6/k) "
        "per touch; flooring mass is a documented contract exactly like "
        "PageRank's teleport floor). One conversion-spine join + two "
        "hash aggregates; per-user journey state is a pair of struct "
        "min/max aggregates with a total (ts, event_id) order, never a "
        "sort window, so the operator is one shuffle on user_id at any "
        "scale. All credits exact BIGINTs."
    ),
)
def events_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        ev.join(F.broadcast(conv), "user_id")
        .where(
            (F.col("ts") < F.col("conv_ts"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    per_user = touches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.min(F.struct("ts", "event_id", "event_type")).alias("first_t"),
        F.max(F.struct("ts", "event_id", "event_type")).alias("last_t"),
    )
    linear = (
        touches.join(per_user.select("user_id", "k"), "user_id")
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("1000000 div k")).cast("bigint").alias(
                "linear_credit_e6"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
    )
    firsts = per_user.groupBy(
        F.col("first_t.event_type").alias("event_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("first_touch_conv"))
    lasts = per_user.groupBy(
        F.col("last_t.event_type").alias("event_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("last_touch_conv"))
    return (
        linear.join(firsts, "event_type", "left")
        .join(lasts, "event_type", "left")
        .select(
            F.col("event_type").alias("channel"),
            "n_touches",
            "linear_credit_e6",
            F.coalesce("first_touch_conv", F.lit(0))
            .cast("bigint")
            .alias("first_touch_conv"),
            F.coalesce("last_touch_conv", F.lit(0))
            .cast("bigint")
            .alias("last_touch_conv"),
        )
        .orderBy(F.col("channel"))
    )


# -- Kleinberg 2-state burst detection as an exact Viterbi fold (r9) -------------

_BURST_INF = 4_611_686_018_427_387_904  # 2^62: unreachable-state sentinel

_ORACLE_BURST = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, CAST(COUNT(*) AS BIGINT) AS r
  FROM events GROUP BY 1, 2
),
dtot AS (SELECT d, CAST(SUM(r) AS BIGINT) AS dt FROM daily GROUP BY d),
rtot AS (SELECT event_type,
                CAST(SUM(r) AS BIGINT) AS rt,
                CAST(COUNT(*) AS BIGINT) AS n_days
         FROM daily GROUP BY event_type),
gtot AS (SELECT CAST(SUM(dt) AS BIGINT) AS g FROM dtot),
costs AS (
  SELECT da.event_type, da.d, rt.n_days,
         CAST(floor(-1000000000.0 *
              (da.r * ln(CAST(rt.rt AS DOUBLE) / g.g)
               + (t.dt - da.r) * ln(1.0 - CAST(rt.rt AS DOUBLE) / g.g)))
           AS BIGINT) AS a0,
         CAST(floor(-1000000000.0 *
              (da.r * ln(least(2.0 * rt.rt / g.g, 0.999999))
               + (t.dt - da.r) * ln(1.0 - least(2.0 * rt.rt / g.g,
                                                0.999999))))
           AS BIGINT) AS a1
  FROM daily da
  JOIN dtot t ON t.d = da.d
  JOIN rtot rt ON rt.event_type = da.event_type
  CROSS JOIN gtot g
),
series AS (
  SELECT event_type, MAX(n_days) AS n_days,
         CAST(floor(1000000000.0 * ln(CAST(MAX(n_days) AS DOUBLE)))
           AS BIGINT) AS trans,
         list([a0, a1] ORDER BY d) AS xs
  FROM costs GROUP BY event_type
),
folded AS (
  SELECT event_type, n_days,
         list_reduce(
           list_prepend([CAST(0 AS BIGINT), {_BURST_INF},
                         CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                        xs),
           (acc, e) -> [
             least(acc[1], acc[2]) + e[1],
             least(acc[1] + trans, acc[2]) + e[2],
             CASE WHEN acc[1] <= acc[2] THEN acc[3] ELSE acc[4] END * 2,
             CASE WHEN acc[1] + trans < acc[2] THEN acc[3]
                  ELSE acc[4] END * 2 + 1
           ]) AS st
  FROM series
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(st[1] AS BIGINT) AS cost_end0,
       CAST(st[2] AS BIGINT) AS cost_end1,
       CAST(CASE WHEN st[1] <= st[2] THEN st[3] ELSE st[4] END AS BIGINT)
         AS burst_mask,
       CAST(bit_count(CAST(CASE WHEN st[1] <= st[2] THEN st[3] ELSE st[4]
                           END AS BIGINT)) AS BIGINT) AS n_burst_days
FROM folded ORDER BY event_type
"""


@register(
    "events_burst_detection",
    oracle=_ORACLE_BURST,
    tags=("events", "timeseries", "anomaly"),
    doc=(
        "Kleinberg 2-state burst detection (KDD 2002) per event type: a "
        "baseline state emits at the type's global rate p0 = R/G, the "
        "burst state at min(2*p0, 1-eps); per-day binomial costs (the "
        "C(d,r) term cancels between states) and a ln(n)-scaled 0->1 "
        "transition cost feed a FULL VITERBI — not a greedy threshold — "
        "run as one vector-state array fold: [cost0, cost1, path0, "
        "path1], with each state's optimal PATH bit-packed into a BIGINT "
        "(day-bounded series, <=62 days per window by construction). "
        "Costs are e9-floored integers, so the entire DP — minima, "
        "transitions, path choices — is exact BIGINT arithmetic and the "
        "oracle replays it bit-for-bit with list_reduce. Fourth member "
        "of the sequential-fold family (EWMA, Holt, CUSUM); the "
        "'trending topic' detector a feed pipeline runs per entity. "
        "Scale: per-type folds over per-day pre-aggregates — one hash "
        "aggregate + one day-bounded fold per key."
    ),
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    dtot = daily.groupBy("d").agg(F.sum("r").cast("bigint").alias("dt"))
    rtot = daily.groupBy("event_type").agg(
        F.sum("r").cast("bigint").alias("rt"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    gtot = dtot.agg(F.sum("dt").cast("bigint").alias("g"))
    p0 = F.col("rt").cast("double") / F.col("g")
    p1 = F.least(F.lit(2.0) * F.col("rt") / F.col("g"), F.lit(0.999999))
    costs = (
        daily.join(dtot, "d")
        .join(F.broadcast(rtot), "event_type")
        .crossJoin(F.broadcast(gtot))
        .select(
            "event_type",
            "d",
            "n_days",
            F.floor(
                F.lit(-1000000000.0)
                * (
                    F.col("r") * F.log(p0)
                    + (F.col("dt") - F.col("r")) * F.log(F.lit(1.0) - p0)
                )
            )
            .cast("bigint")
            .alias("a0"),
            F.floor(
                F.lit(-1000000000.0)
                * (
                    F.col("r") * F.log(p1)
                    + (F.col("dt") - F.col("r")) * F.log(F.lit(1.0) - p1)
                )
            )
            .cast("bigint")
            .alias("a1"),
        )
    )
    series = costs.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.floor(
            F.lit(1000000000.0) * F.log(F.max("n_days").cast("double"))
        )
        .cast("bigint")
        .alias("trans"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, a0, a1))), "
            "s -> array(s.a0, s.a1))"
        ).alias("xs"),
    )
    fold = f"""
aggregate(
  xs,
  array(0L, {_BURST_INF}L, 0L, 0L),
  (acc, e) -> array(
    least(acc[0], acc[1]) + e[0],
    least(acc[0] + trans, acc[1]) + e[1],
    (CASE WHEN acc[0] <= acc[1] THEN acc[2] ELSE acc[3] END) * 2L,
    (CASE WHEN acc[0] + trans < acc[1] THEN acc[2] ELSE acc[3] END) * 2L + 1L
  ))
"""
    folded = series.withColumn("st", F.expr(fold))
    mask = F.expr("CASE WHEN st[0] <= st[1] THEN st[2] ELSE st[3] END")
    return folded.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.expr("st[0]").cast("bigint").alias("cost_end0"),
        F.expr("st[1]").cast("bigint").alias("cost_end1"),
        mask.cast("bigint").alias("burst_mask"),
        F.bit_count(mask).cast("bigint").alias("n_burst_days"),
    ).orderBy("event_type")
