"""Distribution-drift metrics, relative-error quantile sketches, and
sequence/time-series analytics over the events stream.

Five operators rounding out the drift + series suite (round 9b):

* ``ml_wasserstein_drift`` — the exact 1-D Wasserstein-1 (earth-mover)
  distance between two value distributions.  PSI (``ml_psi_drift_report``)
  is bin-choice-sensitive and KS (``ml_ks_two_sample_exact``) only sees the
  worst single point; W1 integrates the full ECDF gap and is the metric of
  choice for numeric-feature drift.
* ``agg_ddsketch_quantiles`` — a DDSketch-style relative-error quantile
  sketch (Masson et al., VLDB'19) built from EXACT integer bucketing:
  base-2 exponent via binary-string length plus a 3-bit mantissa
  sub-bucket via integer shifts, so both engines agree bit-for-bit and
  the guarantee (bucket width <= 1/8 of the value) is structural.
* ``events_top_paths`` — the classic product-analytics "top user journeys"
  report: each user's first five event types as an ordered path string,
  frequency-ranked.
* ``window_rolling_regression`` — 7-day rolling OLS slope/intercept of
  daily revenue via exact BIGINT window sums (sum-x/y/xy/x2) and ONE
  float division at the end; the rolling companion of the global
  ``agg_regr_battery``.
* ``events_haar_wavelet_energy`` — unnormalized Haar wavelet decomposition
  of the 32-day dyadic revenue series: five rounds of pairwise sum/diff
  folds (pure integer), per-level detail energy.  The multiresolution
  twin of ``events_seasonal_decompose`` — band energies localize WHERE
  in time the variance lives.

Scale notes: every operator aggregates to a bounded intermediate before
any window fires — distinct cent-values (W1), sketch buckets (DDSketch),
per-user 5-prefixes (paths), the calendar-day spine (regression, Haar).
None of the windows or broadcasts ever sees data-scale rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance between two event-value samples
# ---------------------------------------------------------------------------

_ORACLE_W1 = """
WITH scored AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CAST(round(value * 100.0, 0) AS BIGINT) AS v_e2
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
),
per_v AS (
  SELECT v_e2,
         CAST(SUM(is_a) AS BIGINT) AS cnt_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS cnt_b
  FROM scored GROUP BY v_e2
),
cum AS (
  SELECT v_e2,
         SUM(cnt_a) OVER (ORDER BY v_e2) AS cum_a,
         SUM(cnt_b) OVER (ORDER BY v_e2) AS cum_b,
         LEAD(v_e2) OVER (ORDER BY v_e2) - v_e2 AS gap
  FROM per_v
),
tot AS (
  SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a, CAST(SUM(cnt_b) AS BIGINT) AS n_b
  FROM per_v
)
SELECT t.n_a, t.n_b,
       CAST(SUM(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)
                * COALESCE(c.gap, 0)) AS BIGINT) AS w1_num_e2,
       round(CAST(SUM(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)
                      * COALESCE(c.gap, 0)) AS DOUBLE)
             / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE) * 100.0),
             6) AS w1_dollars
FROM cum c, tot t
GROUP BY t.n_a, t.n_b
"""


@register(
    "ml_wasserstein_drift",
    oracle=_ORACLE_W1,
    tags=("ml", "drift", "stats"),
    doc=(
        "Exact 1-D Wasserstein-1 distance between click and purchase "
        "value distributions: W1 = integral |F_a - F_b| dx over the merged "
        "support.  Values fixed-point to cents; per-value (cnt_a, cnt_b) "
        "is one hash aggregate; one cumulative window over the DISTINCT-"
        "VALUE table (bounded by cent resolution, not row count) yields "
        "piecewise-constant ECDF gaps; the integral is the exact BIGINT "
        "sum |cumA*nB - cumB*nA| * gap (common denominator nA*nB kept "
        "symbolic so no float enters until the final normalized output). "
        "Completes the drift toolkit beside PSI (bin-sensitive) and KS "
        "(sup-norm only) — W1 is the integrated-gap metric."
    ),
)
def ml_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    scored = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "purchase")
    ).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v_e2"),
    )
    per_v = scored.groupBy("v_e2").agg(
        F.sum("is_a").cast("bigint").alias("cnt_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cnt_b"),
    )
    w = Window.orderBy("v_e2")
    cum = per_v.select(
        F.sum("cnt_a").over(w).alias("cum_a"),
        F.sum("cnt_b").over(w).alias("cum_b"),
        (F.lead("v_e2").over(w) - F.col("v_e2")).alias("gap"),
    )
    tot = per_v.agg(
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum("cnt_b").cast("bigint").alias("n_b"),
    )
    # 1-row totals scalar broadcast (the global-total pattern).
    joined = cum.crossJoin(F.broadcast(tot))
    num = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ) * F.coalesce("gap", F.lit(0))
    return joined.groupBy("n_a", "n_b").agg(
        F.sum(num).cast("bigint").alias("w1_num_e2"),
        F.round(
            F.sum(num).cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double") * 100.0),
            6,
        ).alias("w1_dollars"),
    )


# ---------------------------------------------------------------------------
# DDSketch-style relative-error quantiles with exact integer bucketing
# ---------------------------------------------------------------------------

_ORACLE_DDSKETCH = """
WITH vals AS (
  SELECT event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS v_e2
  FROM events WHERE value IS NOT NULL AND round(value * 100.0, 0) >= 1
),
bucketed AS (
  SELECT event_type,
         length(printf('%b', v_e2)) - 1 AS e,
         (v_e2 >> greatest(length(printf('%b', v_e2)) - 4, 0)) & 7 AS sub,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, e, sub, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM bucketed
),
q(q_pct) AS (VALUES (50), (90), (99)),
hit AS (
  SELECT c.event_type, q.q_pct, c.n,
         CAST((q.q_pct * c.n + 99) // 100 AS BIGINT) AS rnk,
         c.e, c.sub, c.cnt, c.cum
  FROM cum c, q
  WHERE c.cum >= (q.q_pct * c.n + 99) // 100
    AND c.cum - c.cnt < (q.q_pct * c.n + 99) // 100
)
SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
       CAST(n AS BIGINT) AS n, rnk,
       CAST(CASE WHEN e >= 3 THEN (8 + sub) * (1 << (e - 3)) ELSE sub END
            AS BIGINT) AS lo_e2,
       CAST(CASE WHEN e >= 3
                 THEN (8 + sub) * (1 << (e - 3)) + (1 << (e - 3)) - 1
                 ELSE sub END AS BIGINT) AS hi_e2
FROM hit
ORDER BY event_type, q_pct
"""


@register(
    "agg_ddsketch_quantiles",
    oracle=_ORACLE_DDSKETCH,
    tags=("agg", "sketch"),
    doc=(
        "DDSketch-style relative-error quantile sketch (Masson et al., "
        "VLDB'19) with EXACT integer bucketing so both engines agree "
        "bit-for-bit: bucket key = (base-2 exponent via binary-string "
        "length, 3-bit mantissa sub-bucket via integer shift) — bucket "
        "width <= value/8, i.e. a structural ~6% relative-error "
        "guarantee with O(8*log2(max)) buckets of state per group.  One "
        "hash aggregate to bucket counts, a PARTITIONED cumulative "
        "window over the bucket table (sketch-scale, never data-scale), "
        "rank = ceil(q*n) by integer arithmetic, and the answer bucket's "
        "[lo, hi] bounds reconstructed exactly by shifts.  The "
        "mergeable-sketch quantile path beside the KLL-style sampling "
        "twin (agg_quantile_sketch_md5) and exact two-phase selection."
    ),
)
def agg_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    vals = ev.where(
        F.col("value").isNotNull()
        & (F.round(F.col("value") * 100.0, 0) >= 1)
    ).select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v_e2"),
    )
    e = (F.length(F.conv(F.col("v_e2"), 10, 2)) - 1).cast("int")
    bucketed = (
        vals.select(
            "event_type",
            e.alias("e"),
            F.expr(
                "shiftright(v_e2, greatest(length(conv(v_e2, 10, 2)) - 4, 0)) & 7"
            ).alias("sub"),
        )
        .groupBy("event_type", "e", "sub")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("e", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = bucketed.select(
        "event_type",
        "e",
        "sub",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    q = spark.createDataFrame([(50,), (90,), (99,)], "q_pct int")
    rnk = F.expr("(q_pct * n + 99) DIV 100")
    # 3-row quantile-target spine broadcast onto the bucket table.
    hit = cum.crossJoin(F.broadcast(q)).where(
        (F.col("cum") >= rnk) & (F.col("cum") - F.col("cnt") < rnk)
    )
    pw = F.expr("shiftleft(CAST(1 AS BIGINT), e - 3)")
    lo = F.when(F.col("e") >= 3, (8 + F.col("sub")) * pw).otherwise(F.col("sub"))
    hi = F.when(F.col("e") >= 3, (8 + F.col("sub")) * pw + pw - 1).otherwise(
        F.col("sub")
    )
    return hit.select(
        "event_type",
        F.col("q_pct").cast("bigint").alias("q_pct"),
        "n",
        rnk.cast("bigint").alias("rnk"),
        lo.cast("bigint").alias("lo_e2"),
        hi.cast("bigint").alias("hi_e2"),
    ).orderBy("event_type", "q_pct")


# ---------------------------------------------------------------------------
# Top user journeys: first-5-event path frequency ranking
# ---------------------------------------------------------------------------

_ORACLE_TOP_PATHS = """
WITH firstk AS (
  SELECT user_id, event_type, ts, event_id
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 5
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM firstk GROUP BY user_id
),
ranked AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users,
         row_number() OVER (ORDER BY COUNT(*) DESC, path) AS rk
  FROM paths GROUP BY path
)
SELECT CAST(rk AS BIGINT) AS rk, path, n_users
FROM ranked WHERE rk <= 20 ORDER BY rk
"""


@register(
    "events_top_paths",
    oracle=_ORACLE_TOP_PATHS,
    tags=("events", "analytics"),
    doc=(
        "Top user journeys: each user's first five events (ordered by "
        "ts, event_id for determinism) concatenated into a '>'-separated "
        "path string, frequency-ranked top-20 with a total (count DESC, "
        "path ASC) tie-break.  The per-user prefix is a partitioned "
        "row_number window (shuffled once on user_id, never global); "
        "path building is sort_array(collect_list(struct)) so ordering "
        "is explicit, not incidental; the final ranking window runs over "
        "the DISTINCT-PATH table, bounded by 5^|event-types| not users. "
        "The path-analysis entry point beside the funnel family "
        "(events_funnel_stages, events_pattern_funnel_regex) and the "
        "transition matrix (events_transition_matrix)."
    ),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 5)
    paths = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    w_rk = Window.orderBy(F.col("n_users").desc(), "path")
    return (
        counted.select(
            F.row_number().over(w_rk).cast("bigint").alias("rk"),
            "path",
            "n_users",
        )
        .where(F.col("rk") <= 20)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# 7-day rolling OLS regression over daily revenue
# ---------------------------------------------------------------------------

_ORACLE_ROLLREG = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
  GROUP BY 1, 2
),
win AS (
  SELECT d,
         row_number() OVER (ORDER BY d) AS rn,
         SUM(x)     OVER w AS sx,
         SUM(y)     OVER w AS sy,
         SUM(x * y) OVER w AS sxy,
         SUM(x * x) OVER w AS sxx
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d AS day,
       CAST(7 * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(7 * sxx - sx * sx AS BIGINT) AS slope_den,
       round(CAST(7 * sxy - sx * sy AS DOUBLE)
             / CAST(7 * sxx - sx * sx AS DOUBLE), 6) AS slope_e2_per_day,
       round(CAST(sy * (7 * sxx - sx * sx) - (7 * sxy - sx * sy) * sx
                  AS DOUBLE)
             / (7.0 * CAST(7 * sxx - sx * sx AS DOUBLE)), 4) AS intercept_e2
FROM win WHERE rn >= 7 ORDER BY day
"""


@register(
    "window_rolling_regression",
    oracle=_ORACLE_ROLLREG,
    tags=("window", "timeseries"),
    doc=(
        "7-day rolling OLS trend of daily purchase revenue: exact BIGINT "
        "window sums of (x, y, xy, x2) over a ROWS 6-PRECEDING frame on "
        "the daily aggregate, slope = (7*Sxy - Sx*Sy)/(7*Sxx - Sx^2) and "
        "the intercept kept as ONE rational expression over exact "
        "integers so each engine performs a single identical float "
        "division (for consecutive days the denominator is the constant "
        "196, so overflow headroom is y-side only and holds past "
        "sf1000).  The rolling companion of the global agg_regr_battery "
        "and the trend half of events_holt_linear_fold.  Windows run on "
        "the calendar-bounded daily spine, never on raw events."
    ),
)
def window_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
        .select(
            "d",
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
            "y",
        )
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    w_rn = Window.orderBy("d")
    win = daily.select(
        "d",
        F.row_number().over(w_rn).alias("rn"),
        F.sum("x").over(w7).alias("sx"),
        F.sum("y").over(w7).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w7).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w7).alias("sxx"),
    )
    num = 7 * F.col("sxy") - F.col("sx") * F.col("sy")
    den = 7 * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        win.where(F.col("rn") >= 7)
        .select(
            F.col("d").alias("day"),
            num.cast("bigint").alias("slope_num"),
            den.cast("bigint").alias("slope_den"),
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "slope_e2_per_day"
            ),
            F.round(
                (F.col("sy") * den - num * F.col("sx")).cast("double")
                / (7.0 * den.cast("double")),
                4,
            ).alias("intercept_e2"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Haar wavelet multiresolution energy over the 32-day dyadic revenue series
# ---------------------------------------------------------------------------

_ORACLE_HAAR = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
  GROUP BY 1
),
origin AS (SELECT MIN(d) AS d0 FROM daily),
l0 AS (
  SELECT s.i AS idx, COALESCE(dl.y, 0) AS val
  FROM range(0, 32) s(i)
  LEFT JOIN (SELECT CAST(d - (SELECT d0 FROM origin) AS BIGINT) AS i, y
             FROM daily) dl ON s.i = dl.i
),
l1 AS (SELECT idx // 2 AS idx,
              SUM(CASE WHEN idx % 2 = 0 THEN val ELSE -val END) AS dcoef,
              SUM(val) AS val
       FROM l0 GROUP BY idx // 2),
l2 AS (SELECT idx // 2 AS idx,
              SUM(CASE WHEN idx % 2 = 0 THEN val ELSE -val END) AS dcoef,
              SUM(val) AS val
       FROM l1 GROUP BY idx // 2),
l3 AS (SELECT idx // 2 AS idx,
              SUM(CASE WHEN idx % 2 = 0 THEN val ELSE -val END) AS dcoef,
              SUM(val) AS val
       FROM l2 GROUP BY idx // 2),
l4 AS (SELECT idx // 2 AS idx,
              SUM(CASE WHEN idx % 2 = 0 THEN val ELSE -val END) AS dcoef,
              SUM(val) AS val
       FROM l3 GROUP BY idx // 2),
l5 AS (SELECT idx // 2 AS idx,
              SUM(CASE WHEN idx % 2 = 0 THEN val ELSE -val END) AS dcoef,
              SUM(val) AS val
       FROM l4 GROUP BY idx // 2)
SELECT * FROM (
  SELECT 1 AS level, 'detail' AS kind, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
         CAST(SUM(dcoef * dcoef) AS BIGINT) AS energy FROM l1
  UNION ALL
  SELECT 2, 'detail', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(dcoef * dcoef) AS BIGINT) FROM l2
  UNION ALL
  SELECT 3, 'detail', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(dcoef * dcoef) AS BIGINT) FROM l3
  UNION ALL
  SELECT 4, 'detail', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(dcoef * dcoef) AS BIGINT) FROM l4
  UNION ALL
  SELECT 5, 'detail', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(dcoef * dcoef) AS BIGINT) FROM l5
  UNION ALL
  SELECT 5, 'approx', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(val) AS BIGINT) FROM l5
) ORDER BY level, kind
"""


@register(
    "events_haar_wavelet_energy",
    oracle=_ORACLE_HAAR,
    tags=("events", "timeseries"),
    doc=(
        "Unnormalized Haar wavelet decomposition of the 32-day dyadic "
        "daily-revenue series (cents, zero-padded past the calendar): "
        "five rounds of pairwise (sum, difference) folds — each round ONE "
        "tiny groupBy(idx DIV 2) on a halving spine — with per-level "
        "detail energy sum(d^2) as exact BIGINTs plus the final "
        "approximation coefficient (= total revenue).  Band energies "
        "localize which timescale (1-2 day churn vs 16-32 day trend) "
        "carries the variance — the multiresolution twin of "
        "events_seasonal_decompose.  Everything after the daily "
        "aggregate runs on <=32 rows; the fold structure is the same "
        "log-rounds pattern the engine uses for large-star connected "
        "components, so the 2^k-bucket version at scale is the identical "
        "plan with a bigger spine."
    ),
)
def events_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
    )
    origin = daily.agg(F.min("d").alias("d0"))
    # 1-row calendar-origin scalar broadcast onto the <=32-row daily table.
    indexed = daily.crossJoin(F.broadcast(origin)).select(
        F.datediff("d", "d0").cast("bigint").alias("idx"), F.col("y").alias("val")
    )
    spine = spark.range(0, 32).select(F.col("id").alias("idx"))
    level = (
        spine.join(indexed, "idx", "left")
        .select("idx", F.coalesce("val", F.lit(0)).cast("bigint").alias("val"))
    )
    parts = []
    for lv in range(1, 6):
        signed = level.select(
            F.expr("idx DIV 2").alias("pidx"),
            F.when(F.col("idx") % 2 == 0, F.col("val"))
            .otherwise(-F.col("val"))
            .alias("signed_val"),
            "val",
        )
        nxt = signed.groupBy("pidx").agg(
            F.sum("signed_val").cast("bigint").alias("dcoef"),
            F.sum("val").cast("bigint").alias("val"),
        ).withColumnRenamed("pidx", "idx")
        parts.append(
            nxt.agg(
                F.lit(lv).alias("level"),
                F.lit("detail").alias("kind"),
                F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
                F.sum(F.col("dcoef") * F.col("dcoef"))
                .cast("bigint")
                .alias("energy"),
            )
        )
        level = nxt.select("idx", "val")
    parts.append(
        level.agg(
            F.lit(5).alias("level"),
            F.lit("approx").alias("kind"),
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum("val").cast("bigint").alias("energy"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("level", "kind")
