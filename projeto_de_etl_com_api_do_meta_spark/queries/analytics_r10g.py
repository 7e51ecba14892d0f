"""Round-10g batch: inequality curve, survey sampling, OLS diagnostics.

* ``agg_lorenz_curve_deciles`` — the Lorenz curve at the ten decile
  points as exact ppm integer pairs (the curve the Gini/Palma/Hoover
  indices summarize).
* ``sample_pps_systematic`` — probability-proportional-to-size
  systematic sampling in deterministic md5 order via cumulative-size
  threshold crossings, all integer arithmetic.
* ``ml_regression_diagnostics`` — per-point OLS diagnostics (residual,
  leverage, Cook's distance) for the daily click->view regression, every
  input an exact integer moment.

Reference scope: [EXT] SURVEY §6 analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Lorenz curve deciles
# ---------------------------------------------------------------------------

_ORACLE_LORENZ = """
WITH x AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey
  FROM orders
),
o AS (
  SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
         COUNT(*) OVER () AS n,
         SUM(v) OVER (ORDER BY v, o_orderkey ROWS UNBOUNDED PRECEDING)
           AS cum_v,
         SUM(v) OVER () AS tot_v
  FROM x
),
deciles AS (
  -- the largest rn with rn*10 <= d*n: rn = (d*n) // 10
  SELECT CAST(d.d AS BIGINT) AS decile, o.cum_v, o.tot_v, o.n
  FROM (SELECT unnest(generate_series(1, 10)) AS d) d
  JOIN o ON o.rn = (d.d * o.n) // 10
)
SELECT decile,
       CAST(((decile * n // 10) * 1000000) // n AS BIGINT) AS cum_pop_ppm,
       CAST((cum_v * 1000000) // tot_v AS BIGINT) AS cum_value_ppm
FROM deciles
"""


@register(
    "agg_lorenz_curve_deciles",
    oracle=_ORACLE_LORENZ,
    tags=("agg", "analytics"),
    doc=(
        "The Lorenz curve of order totals at the ten decile points: "
        "orders sorted by value (deterministic o_orderkey tiebreak), the "
        "decile row is the exact integer rank (d*n)//10, and both curve "
        "coordinates are exact ppm INTEGER divisions of BIGINT "
        "cumulative sums — the full inequality CURVE whose area the "
        "repo's Gini summarizes and whose tails Palma/Pareto read.  "
        "Engine side runs on the distinct-cent VALUE SPINE (cumulative "
        "count/value sums over groupBy(v); the decile rank is located "
        "inside its homogeneous v-block, where the tiebreak order is "
        "value-free) — no raw-row global sort; output exactly 10 rows."
    ),
)
def agg_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    d = x.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wg = Window.partitionBy(F.lit(1))
    o = d.select(
        "v",
        "c",
        F.sum("c").over(wc).alias("cum_n"),
        F.sum(F.col("v") * F.col("c")).over(wc).alias("cum_v"),
        F.sum("c").over(wg).alias("n"),
        F.sum(F.col("v") * F.col("c")).over(wg).alias("tot_v"),
    )
    dd = spark.range(1, 11).select(F.col("id").cast("bigint").alias("decile"))
    r = F.expr("(decile * n) div 10")
    deciles = F.broadcast(dd).join(
        o, (F.col("cum_n") - F.col("c") < r) & (r <= F.col("cum_n"))
    )
    # exact cumulative value at rank r: all rows of the straddling block
    # share v, so subtract the block rows past r — identical to the
    # oracle's raw-row prefix sum at rn = r regardless of tiebreak.
    return deciles.select(
        "decile",
        F.expr("(((decile * n) div 10) * 1000000) div n")
        .cast("bigint")
        .alias("cum_pop_ppm"),
        F.expr(
            "((cum_v - v * (cum_n - (decile * n) div 10)) * 1000000)"
            " div tot_v"
        )
        .cast("bigint")
        .alias("cum_value_ppm"),
    )


# ---------------------------------------------------------------------------
# PPS systematic sampling
# ---------------------------------------------------------------------------

_PPS_SAMPLES = 50

_ORACLE_PPS = f"""
WITH x AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE n_chars > 0
),
o AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
           AS cum,
         SUM(n_chars) OVER () AS tot
  FROM x
),
-- doc i is selected iff the half-open size interval [cum - n, cum)
-- contains a sampling point k*tot/m for integer k in [0, m): the
-- integer-exact test floor((cum-1)*m/tot) > floor((cum-n-1)*m/tot) via
-- ((cum - 1) * m) // tot vs ((cum - n_chars - 1) * m) // tot
sel AS (
  SELECT doc_id, n_chars, cum, tot,
         ((cum - 1) * {_PPS_SAMPLES}) // tot
           - CASE WHEN cum - n_chars = 0 THEN -1
                  ELSE ((cum - n_chars - 1) * {_PPS_SAMPLES}) // tot END
           AS n_hits
  FROM o
)
SELECT doc_id, n_chars, CAST(n_hits AS BIGINT) AS n_hits,
       CAST((cum * 1000000) // tot AS BIGINT) AS cum_ppm
FROM sel WHERE n_hits > 0
"""


@register(
    "sample_pps_systematic",
    oracle=_ORACLE_PPS,
    tags=("sample",),
    doc=(
        f"Probability-proportional-to-size systematic sample of "
        f"{_PPS_SAMPLES} draws over the document corpus: documents line "
        "up in deterministic md5 order, each occupies its n_chars-sized "
        "interval of the cumulative size line, and a document is drawn "
        "once per sampling point k*total/m landing inside its interval — "
        "the point-in-interval test is EXACT integer floor-division "
        "((cum-1)m)//tot minus the previous boundary, so no float ever "
        "selects (big docs can be drawn multiple times, n_hits carries "
        "the multiplicity).  The classic survey/importance design where "
        "uniform sampling wastes budget on tiny units.  The cumulative "
        "size line is a TWO-PHASE PREFIX SUM (range repartition on the "
        "md5 order key, per-partition subtotals to the driver, local "
        "cumsums on the prefix-summed offsets — the ids_global_dense "
        "machinery), so raw rows never funnel through one partition; "
        "output bounded by the sample count."
    ),
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import global_prefix_sum

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    x = docs.where(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    # corpus total as a driver-side literal (one map-side-combinable
    # scalar aggregate) — no crossJoin, no window.
    tot = int(x.agg(F.sum("n_chars")).collect()[0][0] or 0)
    o = global_prefix_sum(
        x, ["h", "doc_id"], "n_chars", out_col="cum", inclusive=True
    ).select("doc_id", "n_chars", "cum", F.lit(tot).cast("bigint").alias("tot"))
    n_hits = F.expr(
        f"((cum - 1) * {_PPS_SAMPLES}) div tot"
    ) - F.when(F.col("cum") - F.col("n_chars") == 0, F.lit(-1)).otherwise(
        F.expr(f"((cum - n_chars - 1) * {_PPS_SAMPLES}) div tot")
    )
    sel = o.select(
        "doc_id",
        "n_chars",
        n_hits.cast("bigint").alias("n_hits"),
        F.expr("(cum * 1000000) div tot").cast("bigint").alias("cum_ppm"),
    )
    return sel.where(F.col("n_hits") > 0)


# ---------------------------------------------------------------------------
# OLS regression diagnostics over the daily spine
# ---------------------------------------------------------------------------

_ORACLE_REG_DIAG = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily
),
diag AS (
  -- slope = Sxy/Sxx on n-scaled centered moments (exact integers);
  -- residual_e6 and leverage_e9 are single fixed-op-order float
  -- expressions on BIGINTs, re-fixed to integers per row
  SELECT d.day, d.x, d.y, m.n,
         CAST(round((CAST(d.y AS DOUBLE)
                     - (CAST(m.sy AS DOUBLE) / m.n
                        + (CAST(m.n AS DOUBLE) * m.sxy
                           - CAST(m.sx AS DOUBLE) * m.sy)
                          / (CAST(m.n AS DOUBLE) * m.sxx
                             - CAST(m.sx AS DOUBLE) * m.sx)
                          * (d.x - CAST(m.sx AS DOUBLE) / m.n)))
                    * 1000000.0) AS BIGINT) AS resid_e6,
         CAST(round((1.0 / m.n
                     + (CAST(m.n AS DOUBLE) * d.x - m.sx)
                       * (CAST(m.n AS DOUBLE) * d.x - m.sx)
                       / m.n
                       / (CAST(m.n AS DOUBLE) * m.sxx
                          - CAST(m.sx AS DOUBLE) * m.sx))
                    * 1000000000.0) AS BIGINT) AS lev_e9
  FROM daily d, m
),
sse AS (
  SELECT CAST(SUM(resid_e6 * resid_e6) AS BIGINT) AS sse_e12,
         ANY_VALUE(n) AS n
  FROM diag
)
SELECT d.day, d.x, d.y, d.resid_e6, d.lev_e9,
       round(CASE WHEN s.n <= 2 OR s.sse_e12 = 0
                       OR 1000000000 - d.lev_e9 <= 0 THEN 0.0
                  ELSE (CAST(d.resid_e6 AS DOUBLE) * d.resid_e6
                        / (CAST(s.sse_e12 AS DOUBLE) / (s.n - 2)))
                       * (CAST(d.lev_e9 AS DOUBLE)
                          / (1000000000.0 - d.lev_e9))
                       / (2.0 * (1000000000.0 - d.lev_e9)
                          / 1000000000.0) END,
             6) AS cooks_d
FROM diag d, sse s
"""


@register(
    "ml_regression_diagnostics",
    oracle=_ORACLE_REG_DIAG,
    tags=("ml", "stats"),
    doc=(
        "Per-point OLS diagnostics for the daily click->view regression: "
        "residuals and leverages rendered from exact integer moments by "
        "single fixed-op-order expressions and re-FIXED to e6/e9 "
        "integers per row (so the SSE cross-row sum is integer "
        "arithmetic), then Cook's distance D_i = r_i^2/(p*MSE) * "
        "h_i/(1-h_i)^2 as the final float — the WHICH-day-drives-the-fit "
        "answer the slope alone hides.  Spine-bounded; one grouped "
        "aggregate + two broadcast attaches."
    ),
)
def ml_regression_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    dm = daily.join(F.broadcast(m), F.lit(True), "left")
    sxx_c = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    sxy_c = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    yhat = (
        F.col("sy").cast("double") / F.col("n")
        + sxy_c / sxx_c * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
    )
    ux = F.col("n").cast("double") * F.col("x") - F.col("sx")
    diag = dm.select(
        "day",
        "x",
        "y",
        "n",
        F.round((F.col("y").cast("double") - yhat) * 1000000.0)
        .cast("bigint")
        .alias("resid_e6"),
        F.round(
            (1.0 / F.col("n") + ux * ux / F.col("n") / sxx_c) * 1000000000.0
        )
        .cast("bigint")
        .alias("lev_e9"),
    )
    sse = diag.agg(
        F.sum(F.col("resid_e6") * F.col("resid_e6"))
        .cast("bigint")
        .alias("sse_e12"),
        F.first("n").cast("bigint").alias("n_"),
    )
    out = diag.join(F.broadcast(sse), F.lit(True), "left")
    cooks = F.when(
        (F.col("n_") <= 2)
        | (F.col("sse_e12") == 0)
        | (1000000000 - F.col("lev_e9") <= 0),
        F.lit(0.0),
    ).otherwise(
        (
            F.col("resid_e6").cast("double")
            * F.col("resid_e6")
            / (F.col("sse_e12").cast("double") / (F.col("n_") - 2))
        )
        * (F.col("lev_e9").cast("double") / (1000000000.0 - F.col("lev_e9")))
        / (2.0 * (1000000000.0 - F.col("lev_e9")) / 1000000000.0)
    )
    return out.select(
        "day", "x", "y", "resid_e6", "lev_e9", F.round(cooks, 6).alias("cooks_d")
    )


# ---------------------------------------------------------------------------
# Log-rank test between two survival cohorts
# ---------------------------------------------------------------------------

_ORACLE_LOGRANK = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p0,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
),
spells AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0 THEN 1 ELSE 0 END AS ev,
         CASE WHEN p0 IS NOT NULL AND p0 >= s0
              THEN date_diff('day', s0, p0)
              ELSE date_diff('day', s0, last_seen) END AS dur
  FROM per_user WHERE s0 IS NOT NULL
),
tot AS (
  SELECT CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM spells
),
grouped AS (
  SELECT dur,
         CAST(SUM(CASE WHEN cohort = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         CAST(COUNT(*) AS BIGINT) AS r
  FROM spells GROUP BY dur
),
ordered AS (
  SELECT dur, d1, d,
         tot.t1 - COALESCE(SUM(r1) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
         tot.t - COALESCE(SUM(r) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
  FROM grouped, tot
),
terms AS (
  SELECT d1, d, n1, n,
         CAST(round(CAST(n1 AS DOUBLE) * d * 1000000000.0 / n) AS BIGINT)
           AS e1_e9,
         CAST(round(CASE WHEN n <= 1 THEN 0.0
                         ELSE CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)
                              / (CAST(n AS DOUBLE) * n * (n - 1))
                              * 1000000000.0 END) AS BIGINT) AS v_e9
  FROM ordered WHERE d > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       CAST(SUM(e1_e9) AS BIGINT) AS e1_e9,
       CAST(SUM(v_e9) AS BIGINT) AS v_e9,
       CAST(COUNT(*) AS BIGINT) AS n_event_times,
       round(CASE WHEN SUM(v_e9) <= 0 THEN 0.0
                  ELSE (CAST(SUM(d1) AS DOUBLE)
                        - CAST(SUM(e1_e9) AS DOUBLE) / 1000000000.0)
                       / sqrt(CAST(SUM(v_e9) AS DOUBLE) / 1000000000.0) END,
             6) AS z_stat
FROM terms
"""


@register(
    "ml_logrank_test",
    oracle=_ORACLE_LOGRANK,
    tags=("ml", "stats", "events"),
    doc=(
        "Log-rank test between the odd/even user cohorts' signup-to-"
        "purchase survival curves (same spell construction as "
        "events_survival_kaplan_meier): at each distinct event time the "
        "at-risk counts come from exact cumulative windows, the "
        "hypergeometric expectation n1 d / n and variance d n1 (n-n1) "
        "(n-d) / (n^2 (n-1)) are e9-FIXED per time before the cross-time "
        "sums, and z = (O - E)/sqrt(V) is the single final float — the "
        "do-the-curves-differ answer KM itself cannot give.  State "
        "bounded by distinct durations (the calendar)."
    ),
)
def ml_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p0"),
        F.max("ts").alias("last_seen"),
    )
    converted = F.col("p0").isNotNull() & (F.col("p0") >= F.col("s0"))
    spells = per_user.where(F.col("s0").isNotNull()).select(
        (F.col("user_id") % 2).cast("bigint").alias("cohort"),
        F.when(converted, 1).otherwise(0).alias("ev"),
        F.when(converted, F.datediff(F.col("p0"), F.col("s0")))
        .otherwise(F.datediff(F.col("last_seen"), F.col("s0")))
        .alias("dur"),
    )
    tot = spells.agg(
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("t1"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    grouped = spells.groupBy("dur").agg(
        F.sum(F.when(F.col("cohort") == 1, F.col("ev")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.count(F.lit(1)).cast("bigint").alias("r"),
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    ordered = grouped.join(F.broadcast(tot), F.lit(True), "left").select(
        "dur",
        "d1",
        "d",
        (F.col("t1") - F.coalesce(F.sum("r1").over(wprev), F.lit(0))).alias("n1"),
        (F.col("t") - F.coalesce(F.sum("r").over(wprev), F.lit(0))).alias("n"),
    )
    e1_e9 = F.round(
        F.col("n1").cast("double") * F.col("d") * 1000000000.0 / F.col("n")
    ).cast("bigint")
    v_e9 = F.round(
        F.when(F.col("n") <= 1, F.lit(0.0)).otherwise(
            F.col("d").cast("double")
            * F.col("n1")
            * (F.col("n") - F.col("n1"))
            * (F.col("n") - F.col("d"))
            / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
            * 1000000000.0
        )
    ).cast("bigint")
    terms = ordered.where(F.col("d") > 0).select(
        "d1", e1_e9.alias("e1_e9"), v_e9.alias("v_e9")
    )
    z = F.when(F.sum("v_e9") <= 0, F.lit(0.0)).otherwise(
        (
            F.sum("d1").cast("double")
            - F.sum("e1_e9").cast("double") / 1000000000.0
        )
        / F.sqrt(F.sum("v_e9").cast("double") / 1000000000.0)
    )
    return terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1_e9").cast("bigint").alias("e1_e9"),
        F.sum("v_e9").cast("bigint").alias("v_e9"),
        F.count(F.lit(1)).cast("bigint").alias("n_event_times"),
        F.round(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Cochran-Mantel-Haenszel chi-square (companion of the MH odds ratio)
# ---------------------------------------------------------------------------

_ORACLE_CMH = """
WITH x AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN round(value * 100) >= 20000 THEN 1 ELSE 0 END AS e
  FROM events WHERE value IS NOT NULL
),
cells AS (
  SELECT day,
         CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         CAST(SUM(y) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM x GROUP BY day
),
terms AS (
  SELECT a,
         CAST(round(CAST(r1 AS DOUBLE) * c1 * 1000000000.0 / n) AS BIGINT)
           AS e_e9,
         CAST(round(CASE WHEN n <= 1 THEN 0.0
                         ELSE CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)
                              / (CAST(n AS DOUBLE) * n * (n - 1))
                              * 1000000000.0 END) AS BIGINT) AS v_e9
  FROM cells WHERE n > 0
)
SELECT CAST(SUM(a) AS BIGINT) AS sum_a,
       CAST(SUM(e_e9) AS BIGINT) AS sum_e_e9,
       CAST(SUM(v_e9) AS BIGINT) AS sum_v_e9,
       CAST(COUNT(*) AS BIGINT) AS n_strata,
       round(CASE WHEN SUM(v_e9) <= 0 THEN 0.0
                  ELSE (ABS(CAST(SUM(a) AS DOUBLE)
                            - CAST(SUM(e_e9) AS DOUBLE) / 1000000000.0)
                        - 0.5)
                       * (ABS(CAST(SUM(a) AS DOUBLE)
                              - CAST(SUM(e_e9) AS DOUBLE) / 1000000000.0)
                          - 0.5)
                       / (CAST(SUM(v_e9) AS DOUBLE) / 1000000000.0) END,
             6) AS cmh_chi2
FROM terms
"""


@register(
    "ml_cmh_chi2",
    oracle=_ORACLE_CMH,
    tags=("ml", "stats"),
    doc=(
        "Cochran-Mantel-Haenszel chi-square (continuity-corrected) for "
        "the same day-stratified exposure->purchase tables as "
        "ml_mantel_haenszel_or — the TEST companion of that estimate: "
        "per-stratum hypergeometric expectation r1 c1/n and variance "
        "r1(n-r1)c1(n-c1)/(n^2(n-1)) e9-FIXED before the cross-stratum "
        "sums, observed cell count exact, one final float.  Detects a "
        "common association the pooled table dilutes."
    ),
)
def ml_cmh_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.round(F.col("value") * 100) >= 20000, 1).otherwise(0).alias("e"),
    )
    cells = x.groupBy("day").agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("e") == 1, 1).otherwise(0)).cast("bigint").alias("r1"),
        F.sum("y").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    e_e9 = F.round(
        F.col("r1").cast("double") * F.col("c1") * 1000000000.0 / F.col("n")
    ).cast("bigint")
    v_e9 = F.round(
        F.when(F.col("n") <= 1, F.lit(0.0)).otherwise(
            F.col("r1").cast("double")
            * (F.col("n") - F.col("r1"))
            * F.col("c1")
            * (F.col("n") - F.col("c1"))
            / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
            * 1000000000.0
        )
    ).cast("bigint")
    terms = cells.where(F.col("n") > 0).select(
        "a", e_e9.alias("e_e9"), v_e9.alias("v_e9")
    )
    dev = F.abs(
        F.sum("a").cast("double") - F.sum("e_e9").cast("double") / 1000000000.0
    )
    chi2 = F.when(F.sum("v_e9") <= 0, F.lit(0.0)).otherwise(
        (dev - 0.5) * (dev - 0.5) / (F.sum("v_e9").cast("double") / 1000000000.0)
    )
    return terms.agg(
        F.sum("a").cast("bigint").alias("sum_a"),
        F.sum("e_e9").cast("bigint").alias("sum_e_e9"),
        F.sum("v_e9").cast("bigint").alias("sum_v_e9"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.round(chi2, 6).alias("cmh_chi2"),
    )


# ---------------------------------------------------------------------------
# Exact sign test (true binomial p-value via integer folds)
# ---------------------------------------------------------------------------

_ORACLE_SIGN_TEST = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
s AS (
  SELECT CAST(SUM(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN x <> y THEN 1 ELSE 0 END) AS BIGINT) AS n
  FROM daily
),
p AS (
  -- exact binomial tail: C(n,k) built by the integer-exact multiplicative
  -- fold C*(n-k)//(k+1); tail_num = sum over k >= max(pos, n-pos) of
  -- C(n,k), doubled unless the two tails coincide; p = tail/2^n
  SELECT pos, n,
         CASE WHEN n IS NULL OR n <= 0
              THEN [CAST(1 AS BIGINT), CAST(0 AS BIGINT)]
              ELSE list_reduce(
           list_prepend([CAST(1 AS BIGINT), CAST(0 AS BIGINT)],
                        list_transform(range(0, CAST(n AS BIGINT)),
                                       k -> [k, CAST(0 AS BIGINT)])),
           (acc, e) -> [
             (acc[1] * (n - e[1])) // (e[1] + 1),
             acc[2] + CASE WHEN e[1] >= GREATEST(pos, n - pos)
                           THEN acc[1] ELSE 0 END]
         ) END AS st
  FROM s
)
SELECT pos AS n_positive, n AS n_nonzero,
       CAST(st[2] + CASE WHEN n >= GREATEST(pos, n - pos)
                         THEN st[1] ELSE 0 END AS BIGINT) AS tail_num,
       round(LEAST(1.0,
             CAST(st[2] + CASE WHEN n >= GREATEST(pos, n - pos)
                               THEN st[1] ELSE 0 END AS DOUBLE)
             * 2.0
             / power(2.0, CAST(n AS DOUBLE))), 6) AS p_two_sided
FROM p
"""


@register(
    "ml_sign_test_exact",
    oracle=_ORACLE_SIGN_TEST,
    tags=("ml", "stats"),
    doc=(
        "Exact sign test on the paired daily click-vs-view counts with a "
        "TRUE exact binomial p-value (no normal approximation anywhere): "
        "binomial coefficients are built inside a two-cell integer fold "
        "via the multiplicative identity C(n,k+1) = C(n,k)(n-k)/(k+1) — "
        "every division is exact integer arithmetic — the upper-tail sum "
        "accumulates in the second cell, and p = 2*tail/2^n (capped at "
        "1, halved when the split is exactly even).  The only test in "
        "the repo whose P-VALUE itself is cross-engine exact; spine-"
        "bounded (n <= days; a runtime assert_true raises LOUDLY past "
        "n = 62, where the exact C(n,k) fold would wrap BIGINT — DuckDB "
        "raises there by itself).  Even splits render the conventional "
        "capped p = 1.0 (scipy binomtest convention)."
    ),
)
def ml_sign_test_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    s = daily.agg(
        F.sum(F.when(F.col("x") > F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
        F.sum(F.when(F.col("x") != F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n"),
    )
    # n <= 0 guard: Spark's sequence(0, -1) silently DESCENDS (step -1)
    # where DuckDB's range(0, 0) is empty — never hand the fold that case
    fold = (
        "CASE WHEN n IS NULL OR n <= 0 "
        "THEN array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)) "
        "ELSE aggregate(sequence(CAST(0 AS BIGINT), n - 1), "
        "array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)), "
        "(acc, k) -> array("
        "(element_at(acc, 1) * (n - k)) div (k + 1), "
        "element_at(acc, 2) + CASE WHEN k >= GREATEST(pos, n - pos) "
        "THEN element_at(acc, 1) ELSE CAST(0 AS BIGINT) END)) END"
    )
    # loud overflow guard: C(n,k) exceeds BIGINT past n = 62 and Spark's
    # integer fold would silently wrap where DuckDB raises (ADVICE r10) —
    # assert_true yields NULL on pass, errors the task on violation
    guarded = s.where(
        F.expr(
            "assert_true(n IS NULL OR n <= 62, 'ml_sign_test_exact: more "
            "than 62 nonzero-diff days overflows the exact C(n,k) BIGINT "
            "fold; use a normal-approximation twin beyond that') IS NULL"
        )
    )
    p = guarded.select("pos", "n", F.expr(fold).alias("st"))
    tail = (
        F.expr("element_at(st, 2)")
        + F.when(
            F.col("n") >= F.greatest(F.col("pos"), F.col("n") - F.col("pos")),
            F.expr("element_at(st, 1)"),
        ).otherwise(0)
    ).cast("bigint")
    # scipy two-sided convention: always 2*tail, LEAST caps the even-split
    # central double-count at exactly 1.0 (ADVICE r10 — the factor-1 arm
    # emitted ~0.5+central instead of the conventional 1.0)
    p_two = F.round(
        F.least(
            F.lit(1.0),
            tail.cast("double")
            * 2.0
            / F.pow(F.lit(2.0), F.col("n").cast("double")),
        ),
        6,
    )
    return p.select(
        F.col("pos").alias("n_positive"),
        F.col("n").alias("n_nonzero"),
        tail.alias("tail_num"),
        p_two.alias("p_two_sided"),
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

_ORACLE_K_ANON = """
WITH qi AS (
  -- quasi-identifier tuple: (event type, day-of-week, value decile band);
  -- sensitive attribute: user_id
  SELECT event_type AS et,
         -- portable day-of-week: days since Monday 1970-01-05 mod 7
         -- (dayofweek() numbers Sunday differently across engines)
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
         CAST(floor(round(value * 100) / 10000.0) AS BIGINT) AS band,
         user_id
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT et, dow, band,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
  FROM qi GROUP BY et, dow, band
)
SELECT et AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MIN(l) AS BIGINT) AS l_min,
       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_k5,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_suppressed,
       CAST((SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000)
            // SUM(k) AS BIGINT) AS suppressed_ppm
FROM grp GROUP BY et
"""


@register(
    "dq_k_anonymity_profile",
    oracle=_ORACLE_K_ANON,
    tags=("dq", "privacy"),
    doc=(
        "k-anonymity / l-diversity audit of the release-shaped "
        "quasi-identifier tuple (event type, day-of-week, value band) "
        "with user_id as the sensitive attribute: per-type group counts, "
        "the minimum equivalence-class size k_min, the minimum distinct-"
        "sensitive count l_min, and the exact ppm of rows a k>=5 "
        "suppression policy would drop (integer floor division — the "
        "CAST(double AS BIGINT) rounding split never crosses the "
        "boundary).  The privacy gate a training-data release runs "
        "before export; one grouped aggregate, map-side combinable "
        "except the COUNT DISTINCT."
    ),
)
def dq_k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    qi = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("et"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05")) % 7)
        .cast("bigint")
        .alias("dow"),
        F.floor(F.round(F.col("value") * 100) / 10000.0)
        .cast("bigint")
        .alias("band"),
        "user_id",
    )
    grp = qi.groupBy("et", "dow", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.countDistinct("user_id").cast("bigint").alias("l"),
    )
    return grp.groupBy(F.col("et").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("k").cast("bigint").alias("k_min"),
        F.min("l").cast("bigint").alias("l_min"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_below_k5"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_suppressed"),
        F.expr(
            "(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000) div sum(k)"
        )
        .cast("bigint")
        .alias("suppressed_ppm"),
    )


# ---------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 2: fully rational form)
# ---------------------------------------------------------------------------

_ORACLE_ATKINSON = """
WITH x AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
  WHERE o_totalprice > 0
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
         -- per-row reciprocal e12-fixed BEFORE the sum (order-free)
         CAST(SUM(CAST(round(1000000000000.0 / v) AS BIGINT)) AS BIGINT)
           AS rsum_e12
  FROM x
)
SELECT n, s, rsum_e12,
       round(CASE WHEN n = 0 OR s = 0 OR rsum_e12 = 0 THEN 0.0
                  ELSE 1.0 - (CAST(n AS DOUBLE) * n * 1000000000000.0
                              / rsum_e12) / (CAST(s AS DOUBLE) / n) / n END,
             6) AS atkinson_eps2
FROM m
"""


@register(
    "agg_atkinson_inequality",
    oracle=_ORACLE_ATKINSON,
    tags=("agg", "analytics"),
    doc=(
        "Atkinson inequality index at epsilon=2 — the one epsilon where "
        "the index is fully RATIONAL: A_2 = 1 - harmonic_mean / "
        "arithmetic_mean, with each reciprocal e12-FIXED before the "
        "order-free integer sum.  The welfare-theoretic member of the "
        "inequality suite (Gini/Palma/Hoover/HHI/Lorenz), more sensitive "
        "to the bottom of the distribution than any of them.  One "
        "map-side-combinable aggregate."
    ),
)
def agg_atkinson_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    x = orders.where(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    r_e12 = F.round(1000000000000.0 / F.col("v")).cast("bigint")
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(r_e12).cast("bigint").alias("rsum_e12"),
    )
    atkinson = F.when(
        (F.col("n") == 0) | (F.col("s") == 0) | (F.col("rsum_e12") == 0),
        F.lit(0.0),
    ).otherwise(
        1.0
        - (
            F.col("n").cast("double")
            * F.col("n")
            * 1000000000000.0
            / F.col("rsum_e12")
        )
        / (F.col("s").cast("double") / F.col("n"))
        / F.col("n")
    )
    return m.select(
        "n", "s", "rsum_e12", F.round(atkinson, 6).alias("atkinson_eps2")
    )


# ---------------------------------------------------------------------------
# Mood's rank-based scale (dispersion) test
# ---------------------------------------------------------------------------

_ORACLE_MOOD_SCALE = """
WITH x AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS s,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
d AS (
  SELECT v, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM x GROUP BY v
),
cum AS (
  SELECT v, c1, c,
         SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS below,
         SUM(c) OVER () AS nn
  FROM d
),
blocks AS (
  -- exact per-block sum of (2r - (N+1))^2 over the tie block's rank
  -- range [below+1, below+c], via the closed forms for sum r and
  -- sum r^2 (all BIGINT); each sample-1 member carries the block
  -- AVERAGE, e6-fixed before the cross-block sum
  SELECT c1, c, nn,
         4 * ((below + c) * (below + c + 1) * (2 * (below + c) + 1) // 6
              - below * (below + 1) * (2 * below + 1) // 6)
         - 4 * (nn + 1)
             * ((below + 1 + below + c) * c // 2)
         + c * (nn + 1) * (nn + 1) AS block_sq_sum
  FROM cum
),
terms AS (
  -- block averages sit at ~1e8-1e11 magnitude, so unit (e0) rounding
  -- is lossless in the 6th decimal and keeps the cross-block BIGINT
  -- sum far from overflow at any sf
  SELECT CAST(round(CAST(c1 AS DOUBLE) * block_sq_sum / c)
              AS BIGINT) AS t_i,
         c1, nn
  FROM blocks
)
SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       CAST(ANY_VALUE(nn) AS BIGINT) AS n_total,
       CAST(SUM(t_i) AS BIGINT) AS mood4_sum,
       round(CAST(SUM(t_i) AS DOUBLE) / 4.0, 6) AS mood_stat
FROM terms
"""


@register(
    "ml_mood_scale_test",
    oracle=_ORACLE_MOOD_SCALE,
    tags=("ml", "stats"),
    doc=(
        "Mood's rank-based scale (dispersion) test between the click and "
        "view value distributions: M = sum over sample-1 of (r - "
        "(N+1)/2)^2 with tie-averaged ranks handled EXACTLY — each tie "
        "block's sum of (2r - (N+1))^2 comes from the integer closed "
        "forms for sum r and sum r^2 over the block's rank range, the "
        "per-member average is e6-fixed before the cross-block sum, and "
        "the /4 descaling is the final float.  The rank-based sibling "
        "of Brown-Forsythe (moment-based) for the same "
        "are-the-spreads-equal question; spine-bounded."
    ),
)
def ml_mood_scale_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    ).select(
        F.when(F.col("event_type") == "click", 1).otherwise(2).alias("s"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    d = x.groupBy("v").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = d.select(
        "c1",
        "c",
        (F.sum("c").over(wc) - F.col("c")).alias("below"),
        F.sum("c").over(Window.partitionBy(F.lit(1))).alias("nn"),
    )
    # integer closed form: 4*(sum r^2) - 4*(N+1)*(sum r) + c*(N+1)^2,
    # with sum r^2 = (hi(hi+1)(2hi+1) - lo(lo+1)(2lo+1))/6 and
    # sum r = (lo+1 + hi)*c/2 — both divisions exact (consecutive-integer
    # products), kept in INTEGER floor division on both engines
    block_sq_sum = (
        4 * F.expr(
            "((below + c) * (below + c + 1) * (2 * (below + c) + 1)) div 6"
            " - (below * (below + 1) * (2 * below + 1)) div 6"
        )
        - 4 * (F.col("nn") + 1) * F.expr("((below + 1 + below + c) * c) div 2")
        + F.col("c") * (F.col("nn") + 1) * (F.col("nn") + 1)
    )
    terms = cum.select(
        "c1",
        "nn",
        F.round(
            F.col("c1").cast("double") * block_sq_sum / F.col("c")
        )
        .cast("bigint")
        .alias("t_i"),
    )
    return terms.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.first("nn").cast("bigint").alias("n_total"),
        F.sum("t_i").cast("bigint").alias("mood4_sum"),
        F.round(F.sum("t_i").cast("double") / 4.0, 6).alias("mood_stat"),
    )


# ---------------------------------------------------------------------------
# Siegel repeated-medians robust slope
# ---------------------------------------------------------------------------

_ORACLE_SIEGEL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
slopes AS (
  SELECT a.day AS di,
         CAST(round(CAST(b.y - a.y AS DOUBLE) * 1000000.0 / (b.x - a.x))
              AS BIGINT) AS s_e6
  FROM daily a JOIN daily b ON a.day <> b.day AND a.x <> b.x
),
inner_rk AS (
  SELECT di, s_e6,
         row_number() OVER (PARTITION BY di ORDER BY s_e6) AS rn,
         COUNT(*) OVER (PARTITION BY di) AS n
  FROM slopes
),
inner_med AS (  -- 2*median of each point's slope list (e6 scale)
  SELECT di,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN s_e6 ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN s_e6 ELSE 0 END)
              AS BIGINT) AS m2_e6
  FROM inner_rk GROUP BY di
),
outer_rk AS (
  SELECT m2_e6, row_number() OVER (ORDER BY m2_e6, di) AS rn,
         COUNT(*) OVER () AS n
  FROM inner_med
)
SELECT ANY_VALUE(n) AS n_points,
       CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN m2_e6 ELSE 0 END)
            + SUM(CASE WHEN rn = (n + 2) // 2 THEN m2_e6 ELSE 0 END)
            AS BIGINT) AS m4_e6,
       round(CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN m2_e6 ELSE 0 END)
                  + SUM(CASE WHEN rn = (n + 2) // 2 THEN m2_e6 ELSE 0 END)
                  AS DOUBLE) / 4000000.0, 6) AS siegel_slope
FROM outer_rk
"""


@register(
    "ml_siegel_repeated_medians",
    oracle=_ORACLE_SIEGEL,
    tags=("ml", "stats"),
    doc=(
        "Siegel repeated-medians slope between the click and view daily "
        "series: each point's median pairwise slope (e6-fixed integers, "
        "two-middle order-statistic selection), then the median of those "
        "medians — 50% breakdown where Theil-Sen holds only 29%, the "
        "most outlier-robust line the repo fits.  Entirely INTEGER once "
        "slopes are fixed (nested 2x/4x median scales); both median "
        "selections are spine-bounded windows (n days, n^2 pair slopes "
        "at ~30 days regardless of event volume)."
    ),
)
def ml_siegel_repeated_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.day") != F.col("b.day")) & (F.col("a.x") != F.col("b.x")),
        )
        .select(
            F.col("a.day").alias("di"),
            F.round(
                (F.col("b.y") - F.col("a.y")).cast("double")
                * 1000000.0
                / (F.col("b.x") - F.col("a.x"))
            )
            .cast("bigint")
            .alias("s_e6"),
        )
    )
    inner_rk = slopes.select(
        "di",
        "s_e6",
        F.row_number()
        .over(Window.partitionBy("di").orderBy("s_e6"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("di")).alias("n"),
    )
    inner_med = inner_rk.groupBy("di").agg(
        (
            F.sum(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("s_e6")).otherwise(0)
            )
            + F.sum(
                F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("s_e6")).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("m2_e6")
    )
    outer_rk = inner_med.select(
        "m2_e6",
        F.row_number().over(Window.orderBy("m2_e6", "di")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    m4 = (
        F.sum(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("m2_e6")).otherwise(0)
        )
        + F.sum(
            F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("m2_e6")).otherwise(0)
        )
    ).cast("bigint")
    return outer_rk.agg(
        F.first("n").cast("bigint").alias("n_points"),
        m4.alias("m4_e6"),
        F.round(m4.cast("double") / 4000000.0, 6).alias("siegel_slope"),
    )
