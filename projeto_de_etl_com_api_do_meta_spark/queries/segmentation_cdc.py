"""User segmentation, equi-depth histograms, and CDC-changelog apply.

Three more operator families a production deployment of the reference's
star schema would reach for next:

- ``events_rfm_segments``: classic RFM (recency / frequency / monetary)
  quartile segmentation per user — the BI segmentation the reference's
  README promises downstream of its facts (README.md:132-135), owned by
  the engine instead.
- ``agg_histogram_equidepth``: exact equal-population deciles of a
  measure (complements ``agg_histogram_equiwidth``'s equal-range buckets
  and ``agg_percentiles``'s approximate quantiles).
- ``warehouse_cdc_apply``: apply a keyed change-data-capture feed
  (I/U/D ops with sequence numbers, Debezium-style) onto a base snapshot
  with last-writer-wins semantics — the generalization of the reference's
  ON CONFLICT upsert (load.py:94-119), which only expresses I/U.

Determinism / cross-engine policy: every score is an integer (counts,
day-diffs, NTILE bucket ids); monetary sums go through the exact decimal
path (safe_math.dec_sum). NTILE orderings always end in the primary key so
the total order (and therefore every bucket assignment) is unique — both
engines implement NTILE's floor/ceil bucket-size rule identically, so a
total order makes the assignment exact, not merely likely.

Scale notes:
- RFM reduces 100 TB of events to one row per user *before* any window
  runs; the NTILE windows are global by definition (global quantile ranks)
  over that reduced table. If even the user grain is too large for one
  partition, the scale path is percentile thresholds from
  ``approx_percentile`` joined back — the exact form is kept here because
  it is the oracle-checkable contract.
- the equi-depth histogram's global sort is the price of *exact* equal
  population; the approximate-at-scale alternative is
  ``percentile_approx(col, array(0.1 .. 0.9))`` (see ``agg_percentiles``).
- CDC apply is two hash aggregates / windows partitioned by the key plus
  one full-outer shuffle join on the key — the same co-partitioned shape
  as ``dq_snapshot_diff``; nothing global, skew rides on AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.safe_math import dec_sum
from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# RFM quartile segmentation over the event stream.
# ---------------------------------------------------------------------------

_ORACLE_RFM = """
WITH u AS (
  SELECT user_id,
         COUNT(*) AS freq,
         (CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS DOUBLE) / 100) AS monetary,
         date_diff('day', CAST(MAX(ts) AS DATE),
                   (SELECT CAST(MAX(ts) AS DATE)
                    FROM events)) AS recency_days
  FROM events
  GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_days, freq, monetary,
         NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_score,
         NTILE(4) OVER (ORDER BY freq, user_id) AS f_score,
         NTILE(4) OVER (ORDER BY monetary, user_id) AS m_score
  FROM u
)
SELECT user_id, recency_days, freq, monetary,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
FROM scored
"""


@register(
    "events_rfm_segments",
    oracle=_ORACLE_RFM,
    tags=("events", "window", "segmentation", "scale-audit-only"),
    doc=(
        "RFM quartile segmentation: one-pass user-grain aggregate, then "
        "NTILE(4) quartile scores over totally-ordered (metric, user_id). "
        "Bucket 1 = most recent / least frequent / lowest spend. "
        "SCALE-AUDIT-ONLY: the exact NTILE funnels the user-grain table "
        "through one partition by construction — at corpus scale use "
        "events_rfm_segments_approx (percentile_approx thresholds, also "
        "oracle-verified), and keep this exact form for bounded audits."
    ),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    global_max = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            dec_sum("value").alias("monetary"),
            F.max(F.col("ts").cast("date")).alias("user_max_day"),
        )
        .crossJoin(F.broadcast(global_max))
        .select(
            "user_id",
            "freq",
            "monetary",
            F.datediff("max_day", "user_max_day").alias("recency_days"),
        )
    )
    r_w = Window.orderBy("recency_days", "user_id")
    f_w = Window.orderBy("freq", "user_id")
    m_w = Window.orderBy("monetary", "user_id")
    scored = u.select(
        "user_id",
        "recency_days",
        "freq",
        "monetary",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "long"
        ),
    )


# ---------------------------------------------------------------------------
# Approx (scale-path) RFM: percentile_approx thresholds joined back.
# ---------------------------------------------------------------------------

# Semantics note vs the exact NTILE form: scores here are VALUE-based —
# score(x) = 1 + #{thresholds t_i < x} with t_i the discrete quartile values
# — so tied metric values always share a bucket (NTILE splits ties by rank).
# That is the correct contract for the scale path: it needs no global total
# order, only three scalar thresholds.
#
# Cross-engine determinism: Spark's percentile_approx with rank error
# n/accuracy < 1 returns exactly the element at rank ceil(q*n), which is
# precisely DuckDB's quantile_disc (verified empirically incl. tie cases).
# Thresholds are actual data values, bit-identical in both engines (counts,
# day-diffs, cents-rounded sums), so the > comparisons are exact.

# Rank error is n/accuracy; empirically the sketch needs a wide margin
# (error <= ~0.1, not just < 1) to pin the exact ceil(q*n) element, so keep
# accuracy >= ~10x the checked row counts (sf0.1 lineitem ~600k). At real
# scale this dial turns DOWN and the result is honestly approximate — that
# is the point of the scale path.
_RFM_ACC = 10_000_000

_ORACLE_RFM_APPROX = """
WITH u AS (
  SELECT user_id,
         COUNT(*) AS freq,
         (CAST(CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS DOUBLE) / 100) AS monetary,
         date_diff('day', CAST(MAX(ts) AS DATE),
                   (SELECT CAST(MAX(ts) AS DATE)
                    FROM events)) AS recency_days
  FROM events
  GROUP BY user_id
),
th AS (
  SELECT quantile_disc(recency_days, [0.25, 0.5, 0.75]) AS r_t,
         quantile_disc(freq, [0.25, 0.5, 0.75]) AS f_t,
         quantile_disc(monetary, [0.25, 0.5, 0.75]) AS m_t
  FROM u
)
SELECT u.user_id, u.recency_days, u.freq, u.monetary,
       CAST(1 + (u.recency_days > r_t[1])::INT + (u.recency_days > r_t[2])::INT
              + (u.recency_days > r_t[3])::INT AS BIGINT) AS r_score,
       CAST(1 + (u.freq > f_t[1])::INT + (u.freq > f_t[2])::INT
              + (u.freq > f_t[3])::INT AS BIGINT) AS f_score,
       CAST(1 + (u.monetary > m_t[1])::INT + (u.monetary > m_t[2])::INT
              + (u.monetary > m_t[3])::INT AS BIGINT) AS m_score
FROM u, th
"""


@register(
    "events_rfm_segments_approx",
    oracle=_ORACLE_RFM_APPROX,
    tags=("events", "segmentation", "approx", "scale-path"),
    doc=(
        "Scale-path RFM: quartile thresholds from percentile_approx (one "
        "tiny map-side-combinable aggregate) broadcast-joined back; scores "
        "are value-based (1 + #thresholds below). No global sort, no "
        "single-partition NTILE window — this is the plan that survives "
        "100 TB; the exact NTILE form (events_rfm_segments) remains the "
        "rank-exact contract."
    ),
)
def events_rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    global_max = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            dec_sum("value").alias("monetary"),
            F.max(F.col("ts").cast("date")).alias("user_max_day"),
        )
        .crossJoin(F.broadcast(global_max))
        .select(
            "user_id",
            "freq",
            "monetary",
            F.datediff("max_day", "user_max_day").alias("recency_days"),
        )
    )
    qs = [0.25, 0.5, 0.75]
    th = u.agg(
        F.percentile_approx("recency_days", qs, _RFM_ACC).alias("r_t"),
        F.percentile_approx("freq", qs, _RFM_ACC).alias("f_t"),
        F.percentile_approx("monetary", qs, _RFM_ACC).alias("m_t"),
    )

    def score(col: str, t: str):
        x = F.col(col)
        return (
            F.lit(1)
            + (x > F.col(t)[0]).cast("int")
            + (x > F.col(t)[1]).cast("int")
            + (x > F.col(t)[2]).cast("int")
        ).cast("long")

    return u.crossJoin(F.broadcast(th)).select(
        "user_id",
        "recency_days",
        "freq",
        "monetary",
        score("recency_days", "r_t").alias("r_score"),
        score("freq", "f_t").alias("f_score"),
        score("monetary", "m_t").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Approx (scale-path) equi-depth histogram.
# ---------------------------------------------------------------------------

_ORACLE_EQUIDEPTH_APPROX = """
WITH th AS (
  SELECT quantile_disc(l_extendedprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
  FROM lineitem
),
b AS (
  SELECT l_extendedprice,
         1 + (l_extendedprice > t[1])::INT + (l_extendedprice > t[2])::INT
           + (l_extendedprice > t[3])::INT + (l_extendedprice > t[4])::INT
           + (l_extendedprice > t[5])::INT + (l_extendedprice > t[6])::INT
           + (l_extendedprice > t[7])::INT + (l_extendedprice > t[8])::INT
           + (l_extendedprice > t[9])::INT AS bucket
  FROM lineitem, th
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM b
GROUP BY bucket
"""


@register(
    "agg_histogram_equidepth_approx",
    oracle=_ORACLE_EQUIDEPTH_APPROX,
    tags=("agg", "histogram", "approx", "scale-path"),
    doc=(
        "Scale-path equi-depth deciles: percentile_approx threshold vector "
        "(single aggregate, GK sketch, mergeable map-side) broadcast to a "
        "value-based bucket assignment, then a hash aggregate per bucket. "
        "Replaces the exact form's global NTILE sort; buckets deviate from "
        "exact equal population only by tie mass at the thresholds."
    ),
)
def agg_histogram_equidepth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    qs = [i / 10 for i in range(1, 10)]
    th = li.agg(F.percentile_approx("l_extendedprice", qs, _RFM_ACC).alias("t"))
    x = F.col("l_extendedprice")
    bucket = F.lit(1)
    for i in range(9):
        bucket = bucket + (x > F.col("t")[i]).cast("int")
    return (
        li.crossJoin(F.broadcast(th))
        .select("l_extendedprice", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )


# ---------------------------------------------------------------------------
# Exact equi-depth (equal-population) histogram.
# ---------------------------------------------------------------------------

_ORACLE_EQUIDEPTH = """
WITH b AS (
  SELECT l_extendedprice,
         NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bucket
  FROM lineitem
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM b
GROUP BY bucket
"""


@register(
    "agg_histogram_equidepth",
    oracle=_ORACLE_EQUIDEPTH,
    tags=("agg", "histogram", "scale-audit-only"),
    doc=(
        "Exact equal-population deciles of l_extendedprice via NTILE over "
        "a totally-ordered sort; min/max bounds per bucket. "
        "SCALE-AUDIT-ONLY: the exact NTILE funnels every row through one "
        "partition by construction — at corpus scale use "
        "agg_histogram_equidepth_approx (percentile_approx boundaries, "
        "also oracle-verified), and keep this exact form for bounded "
        "audits."
    ),
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select("l_extendedprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (I/U/D with sequence numbers, last-writer-wins).
# ---------------------------------------------------------------------------

# The fixture set has no changelog table, so one is DERIVED deterministically
# from `orders` (same pattern as the synthetic-PII scrub): the base snapshot
# is keys with o_orderkey % 10 < 8; the feed carries two overlapping update
# waves, a delete wave, and inserts of the held-out keys. Both engines build
# the identical feed, so the oracle value-verifies the apply semantics:
#   - per key, the op with the highest (seq, op) wins;
#   - D removes the key; I materializes the new row; U patches the base row
#     and is a no-op for keys absent from the base.

_CDC_FEED_SQL = """
  SELECT o_orderkey AS k, 1 AS seq, 'U' AS op, 'U1' AS new_status,
         CAST(NULL AS BIGINT) AS i_custkey, CAST(NULL AS DOUBLE) AS i_totalprice,
         CAST(NULL AS TIMESTAMP) AS i_orderdate
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'U', 'U2', NULL, NULL, NULL
  FROM orders WHERE o_orderkey % 14 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'D', NULL, NULL, NULL, NULL
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, 1, 'I', 'NEW', o_custkey, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 10 >= 8
"""

_ORACLE_CDC = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 10 < 8
),
feed AS ({_CDC_FEED_SQL}),
latest AS (
  SELECT k, op, new_status, i_custkey, i_totalprice, i_orderdate
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC, op DESC)
             AS rn
    FROM feed
  ) WHERE rn = 1
)
SELECT COALESCE(b.o_orderkey, l.k) AS o_orderkey,
       COALESCE(b.o_custkey, l.i_custkey) AS o_custkey,
       CASE WHEN l.op = 'I' THEN l.new_status
            WHEN l.op = 'U' THEN l.new_status
            ELSE b.o_orderstatus END AS o_orderstatus,
       COALESCE(b.o_totalprice, l.i_totalprice) AS o_totalprice,
       COALESCE(b.o_orderdate, l.i_orderdate) AS o_orderdate
FROM base b
FULL OUTER JOIN latest l ON b.o_orderkey = l.k
WHERE NOT (l.op = 'D')
  AND NOT (l.op = 'U' AND b.o_orderkey IS NULL)
  OR l.op IS NULL
"""


@register(
    "warehouse_cdc_apply",
    oracle=_ORACLE_CDC,
    tags=("warehouse", "cdc", "merge"),
    doc=(
        "Apply a keyed I/U/D changelog (with sequence numbers) onto a base "
        "snapshot, last-writer-wins per key — the Debezium-style "
        "generalization of the reference's ON CONFLICT upsert "
        "(load.py:94-119). Key-partitioned windows + one full-outer join."
    ),
)
def warehouse_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")

    base = orders.where(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    feed = spark.sql(_CDC_FEED_SQL)
    w = Window.partitionBy("k").orderBy(F.col("seq").desc(), F.col("op").desc())
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    j = base.join(latest, base.o_orderkey == latest.k, "full_outer")
    applied = j.where(
        (
            ~(F.col("op") == "D")
            & ~((F.col("op") == "U") & F.col("o_orderkey").isNull())
        )
        | F.col("op").isNull()
    )
    return applied.select(
        F.coalesce("o_orderkey", "k").alias("o_orderkey"),
        F.coalesce("o_custkey", "i_custkey").alias("o_custkey"),
        F.when(F.col("op").isin("I", "U"), F.col("new_status"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.coalesce("o_totalprice", "i_totalprice").alias("o_totalprice"),
        F.coalesce("o_orderdate", "i_orderdate").alias("o_orderdate"),
    )
