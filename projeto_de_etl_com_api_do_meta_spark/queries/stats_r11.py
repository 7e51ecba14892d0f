"""Round-11 statistics batch: ordinal association, regression diagnostics,
structural breaks, goodness-of-fit, long-memory, complexity, outliers.

* ``ml_goodman_kruskal_gamma`` — gamma, Somers' d_yx and Stuart's tau-c
  for the (event-type order) x (value) ordinal association, from the
  shared dominance spine (concordant/discordant/tied counts are exact
  BIGINTs; three final floats).
* ``ml_durbin_watson`` — first-order residual autocorrelation of the
  daily click->view OLS fit, residuals e6-fixed and both quadratic sums
  exact integers via ``(d*d) div 1e6`` terms.
* ``ml_chow_test`` — structural-break F at the calendar midpoint from
  per-segment integer regression moments (each segment SSE one e6-fixed
  float from BIGINT centered moments).
* ``ml_cramer_von_mises`` — two-sample CvM criterion between the click
  and view value ECDFs over the distinct-cent spine (each pooled-point
  term e9-fixed before the cross-row sum; the L2 sibling of the repo's
  KS / Anderson-Darling pair).
* ``ml_hurst_rs`` — rescaled-range (R/S) Hurst exponent of the daily
  event-count series at window sizes 2/4/8/16: per-block range and
  variance are exact integers (w-scaled cumulative deviations), each
  block's R/S e6-fixed, the log-log slope one final float.
* ``events_permutation_entropy`` — order-3 ordinal-pattern entropy of
  each type's daily series (Bandt-Pompe complexity), pattern counting
  fully integer, each -p ln p term e9-fixed.
* ``ml_mahalanobis_outliers`` — per-day Mahalanobis distance of the
  (clicks, views) pair under the diagonal covariance, d^2 a single
  float from n-scaled BIGINT moments, chi2(2, .95) flag.

Determinism contract (repo-wide): values quantize to exact integer fixed
point, every cross-row sum is over INTEGERS (terms e6/e9-fixed first so
accumulation order is irrelevant in both engines), and at most one final
float expression per column — identical text in both engines — renders
the headline statistic rounded to 6 decimals.

Scale: every operator reduces to grouped integer aggregates over a
bounded spine (distinct value buckets, the <= |days| calendar, or the
k-group grid) before any window or pair join; raw fact rows never funnel
through a single partition.  Reference scope: [EXT] SURVEY §6 analytics
surface; the reference has no stats layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register
from .stats_r10c import _ORACLE_DOMINANCE, _dominance_tables

# ---------------------------------------------------------------------------
# Goodman-Kruskal gamma / Somers' D / Stuart's tau-c
# ---------------------------------------------------------------------------

_ORACLE_GAMMA = (
    _ORACLE_DOMINANCE
    + """
, tot AS (
  SELECT CAST(SUM(n_low_less) AS BIGINT) AS c_pairs,
         CAST(SUM(n_low_greater) AS BIGINT) AS d_pairs,
         CAST(SUM(n_tie) AS BIGINT) AS ty_pairs
  FROM pairs
),
gl AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM sizes
),
vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM spine)
SELECT tot.c_pairs, tot.d_pairs, tot.ty_pairs, gl.n_tot,
       CAST(LEAST(gl.k, vs.v) AS BIGINT) AS m_min,
       round(CASE WHEN tot.c_pairs + tot.d_pairs = 0 THEN 0.0
                  ELSE CAST(tot.c_pairs - tot.d_pairs AS DOUBLE)
                       / (tot.c_pairs + tot.d_pairs) END, 6) AS gamma,
       round(CASE WHEN tot.c_pairs + tot.d_pairs + tot.ty_pairs = 0
                  THEN 0.0
                  ELSE CAST(tot.c_pairs - tot.d_pairs AS DOUBLE)
                       / (tot.c_pairs + tot.d_pairs + tot.ty_pairs) END,
             6) AS somers_d_yx,
       round(CASE WHEN gl.n_tot <= 1 OR LEAST(gl.k, vs.v) <= 1 THEN 0.0
                  ELSE 2.0 * LEAST(gl.k, vs.v)
                       * CAST(tot.c_pairs - tot.d_pairs AS DOUBLE)
                       / (CAST(gl.n_tot AS DOUBLE) * gl.n_tot
                          * (LEAST(gl.k, vs.v) - 1)) END, 6) AS tau_c
FROM tot, gl, vs
"""
)


@register(
    "ml_goodman_kruskal_gamma",
    oracle=_ORACLE_GAMMA,
    tags=("ml", "stats"),
    doc=(
        "Goodman-Kruskal gamma, Somers' d_yx and Stuart's tau-c for the "
        "ordinal association between the alphabetical event-type order "
        "and the unit-bucketed value: concordant/discordant/Y-tied pair "
        "counts come as exact BIGINTs from the shared dominance spine "
        "(the Jonckheere/Cliff machinery — O(k * |buckets|), never an "
        "O(n^2) pair join), and each coefficient is one final float: "
        "gamma ignores ties, Somers' d_yx charges Y-only ties against "
        "the dependent margin, tau-c corrects for the non-square "
        "k x |values| table.  The ordinal-association triple every "
        "crosstab report pairs with its chi-square."
    ),
)
def ml_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    pairs, sizes = _dominance_tables(spark, sf_dir)
    tot = pairs.agg(
        F.sum("n_low_less").cast("bigint").alias("c_pairs"),
        F.sum("n_low_greater").cast("bigint").alias("d_pairs"),
        F.sum("n_tie").cast("bigint").alias("ty_pairs"),
    )
    gl = sizes.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ev = load_table(spark, sf_dir, "events")
    vs = ev.where(F.col("value").isNotNull()).agg(
        F.countDistinct(F.round("value").cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    m_min = F.least(F.col("k"), F.col("v")).cast("bigint")
    cd = (F.col("c_pairs") - F.col("d_pairs")).cast("double")
    gamma = F.when(F.col("c_pairs") + F.col("d_pairs") == 0, F.lit(0.0)).otherwise(
        cd / (F.col("c_pairs") + F.col("d_pairs"))
    )
    somers = F.when(
        F.col("c_pairs") + F.col("d_pairs") + F.col("ty_pairs") == 0, F.lit(0.0)
    ).otherwise(cd / (F.col("c_pairs") + F.col("d_pairs") + F.col("ty_pairs")))
    tau_c = F.when((F.col("n_tot") <= 1) | (m_min <= 1), F.lit(0.0)).otherwise(
        2.0
        * m_min
        * cd
        / (F.col("n_tot").cast("double") * F.col("n_tot") * (m_min - 1))
    )
    return (
        tot.join(F.broadcast(gl), F.lit(True), "left")
        .join(F.broadcast(vs), F.lit(True), "left")
        .select(
            "c_pairs",
            "d_pairs",
            "ty_pairs",
            "n_tot",
            m_min.alias("m_min"),
            F.round(gamma, 6).alias("gamma"),
            F.round(somers, 6).alias("somers_d_yx"),
            F.round(tau_c, 6).alias("tau_c"),
        )
    )


# ---------------------------------------------------------------------------
# Shared daily click->view series + OLS moment fragments
# ---------------------------------------------------------------------------

_DAILY_XY_SQL = """
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
)"""

#: e6-fixed OLS residual of y on x from n-scaled integer moments —
#: IDENTICAL text in both engines (the ml_regression_diagnostics form).
_RESID_E6 = (
    "CAST(round((CAST(y AS DOUBLE)"
    " - (CAST(sy AS DOUBLE) / n"
    "    + (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    "      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    "      * (x - CAST(sx AS DOUBLE) / n)))"
    " * 1000000.0) AS BIGINT)"
)


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson
# ---------------------------------------------------------------------------

_ORACLE_DW = f"""
WITH {_DAILY_XY_SQL},
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily
),
resid AS (
  SELECT d.day, {_RESID_E6} AS e_e6
  FROM daily d, m
),
lagged AS (
  SELECT e_e6, lag(e_e6) OVER (ORDER BY day) AS p_e6
  FROM resid
),
sums AS (
  SELECT CAST(SUM(CASE WHEN p_e6 IS NULL THEN 0
                       ELSE ((e_e6 - p_e6) * (e_e6 - p_e6)) // 1000000
                  END) AS BIGINT) AS num_e6,
         CAST(SUM((e_e6 * e_e6) // 1000000) AS BIGINT) AS den_e6,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM lagged
)
SELECT n_days, num_e6, den_e6,
       round(CASE WHEN den_e6 = 0 THEN 0.0
                  ELSE CAST(num_e6 AS DOUBLE) / den_e6 END, 6) AS dw_stat
FROM sums
"""


@register(
    "ml_durbin_watson",
    oracle=_ORACLE_DW,
    tags=("ml", "stats"),
    doc=(
        "Durbin-Watson first-order autocorrelation test on the daily "
        "click->view OLS residuals: residuals are the e6-fixed integers "
        "of the shared regression-diagnostics expression, both quadratic "
        "sums accumulate exact integer terms ((d*d) div 1e6 — integer "
        "floor division in both engines, so accumulation order cannot "
        "matter), and DW = sum(diff^2)/sum(e^2) is the single final "
        "float.  DW ~ 2 means no serial correlation; the residual-"
        "independence check ml_regression_diagnostics's leverage/Cook "
        "columns assume.  Calendar-bounded daily spine throughout."
    ),
)
def ml_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    daily = _daily_xy(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    resid = daily.join(F.broadcast(m), F.lit(True), "left").select(
        "day", F.expr(_RESID_E6).alias("e_e6")
    )
    lagged = resid.select(
        "e_e6", F.lag("e_e6").over(Window.orderBy("day")).alias("p_e6")
    )
    sums = lagged.agg(
        F.sum(
            F.when(F.col("p_e6").isNull(), 0).otherwise(
                F.expr("((e_e6 - p_e6) * (e_e6 - p_e6)) div 1000000")
            )
        )
        .cast("bigint")
        .alias("num_e6"),
        F.sum(F.expr("(e_e6 * e_e6) div 1000000")).cast("bigint").alias("den_e6"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dw = F.when(F.col("den_e6") == 0, F.lit(0.0)).otherwise(
        F.col("num_e6").cast("double") / F.col("den_e6")
    )
    return sums.select(
        "n_days", "num_e6", "den_e6", F.round(dw, 6).alias("dw_stat")
    )


# ---------------------------------------------------------------------------
# Chow structural-break test
# ---------------------------------------------------------------------------

#: e6-fixed OLS SSE of a segment from its n-scaled integer centered
#: moments — identical text in both engines; degenerate Sxx = 0 (constant
#: x) falls back to the intercept-only SSE.
_SSE_E6 = (
    "CAST(round(1000000.0 * ("
    "CASE WHEN n * sxx - sx * sx = 0"
    " THEN CAST(n * syy - sy * sy AS DOUBLE) / n / n"
    " ELSE (CAST(n * syy - sy * sy AS DOUBLE)"
    "       - CAST(n * sxy - sx * sy AS DOUBLE)"
    "         * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    "         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
    "      / n / n END)) AS BIGINT)"
)

_ORACLE_CHOW = f"""
WITH {_DAILY_XY_SQL},
cut AS (
  SELECT MIN(day) + CAST((date_diff('day', MIN(day), MAX(day)) // 2)
                         AS INTEGER) AS mid
  FROM daily
),
seg AS (
  SELECT CASE WHEN d.day <= cut.mid THEN 1 ELSE 2 END AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily d, cut GROUP BY 1
),
sse AS (SELECT s, n, {_SSE_E6} AS sse_e6 FROM seg),
pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(sx) AS BIGINT) AS sx, CAST(SUM(sy) AS BIGINT) AS sy,
         CAST(SUM(sxx) AS BIGINT) AS sxx,
         CAST(SUM(sxy) AS BIGINT) AS sxy,
         CAST(SUM(syy) AS BIGINT) AS syy
  FROM seg
),
psse AS (SELECT n, {_SSE_E6} AS sse_e6 FROM pooled),
parts AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s = 2 THEN n ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN s = 1 THEN n * sse_e6 ELSE 0 END)
              AS BIGINT) AS nsse1_e6,
         CAST(SUM(CASE WHEN s = 2 THEN n * sse_e6 ELSE 0 END)
              AS BIGINT) AS nsse2_e6
  FROM sse
)
SELECT p.n1, p.n2,
       CAST(ps.n * ps.sse_e6 AS BIGINT) AS nsse_pooled_e6,
       p.nsse1_e6, p.nsse2_e6,
       round(CASE WHEN p.n1 + p.n2 <= 4 OR p.nsse1_e6 + p.nsse2_e6 = 0
                  THEN 0.0
                  ELSE (CAST(ps.n * ps.sse_e6 - p.nsse1_e6 - p.nsse2_e6
                             AS DOUBLE) / 2.0)
                       / (CAST(p.nsse1_e6 + p.nsse2_e6 AS DOUBLE)
                          / (p.n1 + p.n2 - 4)) END, 6) AS chow_f
FROM parts p, psse ps
"""


@register(
    "ml_chow_test",
    oracle=_ORACLE_CHOW,
    tags=("ml", "stats"),
    doc=(
        "Chow structural-break test for the daily click->view regression "
        "at the calendar midpoint: per-segment and pooled SSEs each come "
        "from ONE e6-fixed float over n-scaled BIGINT centered moments "
        "(n*syy - sy^2 etc. — SSEs are carried n-SCALED so the pooled-vs-"
        "segments comparison stays in exact integers), and F = "
        "((SSE_p - SSE_1 - SSE_2)/2) / ((SSE_1 + SSE_2)/(n-4)) is the "
        "single final float.  The did-the-relationship-CHANGE question "
        "events_changepoint_binseg locates and this test sizes; "
        "calendar-bounded daily spine, two grouped aggregates."
    ),
)
def ml_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    daily = _daily_xy(spark, sf_dir)
    cut = daily.agg(
        F.expr(
            "date_add(MIN(day), CAST(datediff(MAX(day), MIN(day)) div 2"
            " AS INT))"
        ).alias("mid")
    )
    seg = (
        daily.join(F.broadcast(cut), F.lit(True), "left")
        .groupBy(
            F.when(F.col("day") <= F.col("mid"), 1).otherwise(2).alias("s")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
    )
    sse = seg.select("s", "n", F.expr(_SSE_E6).alias("sse_e6"))
    pooled = seg.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sy").cast("bigint").alias("sy"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum("sxy").cast("bigint").alias("sxy"),
        F.sum("syy").cast("bigint").alias("syy"),
    )
    psse = pooled.select("n", F.expr(_SSE_E6).alias("sse_e6"))
    parts = sse.agg(
        F.sum(F.when(F.col("s") == 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("s") == 2, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("s") == 1, F.col("n") * F.col("sse_e6")).otherwise(0))
        .cast("bigint")
        .alias("nsse1_e6"),
        F.sum(F.when(F.col("s") == 2, F.col("n") * F.col("sse_e6")).otherwise(0))
        .cast("bigint")
        .alias("nsse2_e6"),
    )
    out = parts.join(F.broadcast(psse), F.lit(True), "left")
    nsse_p = (F.col("n") * F.col("sse_e6")).cast("bigint")
    chow_f = F.when(
        (F.col("n1") + F.col("n2") <= 4)
        | (F.col("nsse1_e6") + F.col("nsse2_e6") == 0),
        F.lit(0.0),
    ).otherwise(
        ((nsse_p - F.col("nsse1_e6") - F.col("nsse2_e6")).cast("double") / 2.0)
        / (
            (F.col("nsse1_e6") + F.col("nsse2_e6")).cast("double")
            / (F.col("n1") + F.col("n2") - 4)
        )
    )
    return out.select(
        "n1",
        "n2",
        nsse_p.alias("nsse_pooled_e6"),
        "nsse1_e6",
        "nsse2_e6",
        F.round(chow_f, 6).alias("chow_f"),
    )


# ---------------------------------------------------------------------------
# Two-sample Cramer-von Mises
# ---------------------------------------------------------------------------

_ORACLE_CVM = """
WITH x AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS s,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
d AS (
  SELECT v, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM x GROUP BY v
),
cum AS (
  SELECT v, c1, c2,
         SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS m1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS m2
  FROM d
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM d
),
terms AS (
  SELECT CAST(round(1000000000.0 * (c1 + c2)
              * (CAST(m1 AS DOUBLE) / n.n1 - CAST(m2 AS DOUBLE) / n.n2)
              * (CAST(m1 AS DOUBLE) / n.n1 - CAST(m2 AS DOUBLE) / n.n2))
              AS BIGINT) AS t_e9
  FROM cum, n
)
SELECT n.n1, n.n2, n.n_distinct,
       CAST((SELECT SUM(t_e9) FROM terms) AS BIGINT) AS cvm_e9,
       round(CAST(n.n1 AS DOUBLE) * n.n2
             / ((CAST(n.n1 AS DOUBLE) + n.n2) * (CAST(n.n1 AS DOUBLE) + n.n2))
             * (SELECT SUM(t_e9) FROM terms) / 1000000000.0, 6) AS cvm_t
FROM n
"""


@register(
    "ml_cramer_von_mises",
    oracle=_ORACLE_CVM,
    tags=("ml", "stats"),
    doc=(
        "Two-sample Cramer-von Mises criterion between the click and "
        "view cents-value distributions: T = n1 n2 / N^2 * sum over "
        "pooled observations of (F1 - F2)^2, evaluated on the distinct-"
        "value spine with exact integer cumulative counts and each "
        "pooled point's squared-ECDF-gap term e9-FIXED before the cross-"
        "row sum.  The L2 goodness-of-fit companion of KS (sup-norm) "
        "and Anderson-Darling (tail-weighted) — the middle sensitivity "
        "profile of the trio.  State bounded by the value vocabulary "
        "(the ml_auc_roc_exact contract)."
    ),
)
def ml_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = d.select(
        "c1",
        "c2",
        F.sum("c1").over(wc).alias("m1"),
        F.sum("c2").over(wc).alias("m2"),
    )
    n = d.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    gap = (
        F.col("m1").cast("double") / F.col("n1")
        - F.col("m2").cast("double") / F.col("n2")
    )
    t_e9 = F.round(1000000000.0 * (F.col("c1") + F.col("c2")) * gap * gap).cast(
        "bigint"
    )
    s = (
        cum.join(F.broadcast(n), F.lit(True), "left")
        .select(t_e9.alias("t_e9"))
        .agg(F.sum("t_e9").cast("bigint").alias("cvm_e9"))
    )
    t_stat = (
        F.col("n1").cast("double")
        * F.col("n2")
        / (
            (F.col("n1").cast("double") + F.col("n2"))
            * (F.col("n1").cast("double") + F.col("n2"))
        )
        * F.col("cvm_e9")
        / 1000000000.0
    )
    return n.join(F.broadcast(s), F.lit(True), "left").select(
        "n1", "n2", "n_distinct", "cvm_e9", F.round(t_stat, 6).alias("cvm_t")
    )


# ---------------------------------------------------------------------------
# R/S Hurst exponent
# ---------------------------------------------------------------------------

_HURST_WINDOWS = (2, 4, 8, 16)

#: e6-fixed per-block rescaled range R/S = R_int * sqrt(w / var_int), where
#: R_int = w-scaled range of cumulative deviations and var_int = w^2-scaled
#: deviation square sum — identical text both engines.
_RS_E6 = (
    "CAST(round(1000000.0 * r_int"
    " * sqrt(CAST(w AS DOUBLE) / var_int)) AS BIGINT)"
)

_ORACLE_HURST = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
),
idx AS (
  SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily
),
win AS (SELECT unnest([{", ".join(str(w) for w in _HURST_WINDOWS)}]) AS w),
blocks AS (
  SELECT w.w, (idx.rn - 1) // w.w AS b, idx.rn, idx.x,
         SUM(idx.x) OVER (PARTITION BY w.w, (idx.rn - 1) // w.w
                          ORDER BY idx.rn ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (PARTITION BY w.w, (idx.rn - 1) // w.w
                            ORDER BY idx.rn) AS k
  FROM idx, win w
),
complete AS (
  SELECT w, b,
         CAST(MAX(k) AS BIGINT) AS blen,
         CAST(SUM(x) AS BIGINT) AS s1
  FROM blocks GROUP BY w, b HAVING MAX(k) = w
),
devs AS (
  SELECT bl.w, bl.b,
         CAST(bl.w * bl.cum - bl.k * c.s1 AS BIGINT) AS dev,
         CAST(bl.w * bl.x - c.s1 AS BIGINT) AS ddev
  FROM blocks bl JOIN complete c ON c.w = bl.w AND c.b = bl.b
),
rs AS (
  SELECT w, b,
         CAST(MAX(dev) - MIN(dev) AS BIGINT) AS r_int,
         CAST(SUM(ddev * ddev) AS BIGINT) AS var_int
  FROM devs GROUP BY w, b
),
rs_fixed AS (
  SELECT w, {_RS_E6} AS rs_e6 FROM rs WHERE var_int > 0
),
per_w AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(rs_e6) AS BIGINT) AS sum_rs_e6
  FROM rs_fixed GROUP BY w
),
logpts AS (
  SELECT CAST(round(ln(CAST(w AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx,
         CAST(round(ln(CAST(sum_rs_e6 AS DOUBLE) / n_blocks / 1000000.0)
                    * 1000000.0) AS BIGINT) AS ly
  FROM per_w WHERE sum_rs_e6 > 0
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(lx) AS BIGINT) AS slx, CAST(SUM(ly) AS BIGINT) AS sly,
         CAST(SUM(lx * lx // 1000000) AS BIGINT) AS slxx,
         CAST(SUM(lx * ly // 1000000) AS BIGINT) AS slxy
  FROM logpts
)
SELECT p.w, p.n_blocks, p.sum_rs_e6,
       round(CASE WHEN f.np <= 1
                       OR f.np * f.slxx - f.slx * f.slx // 1000000 = 0
                  THEN 0.0
                  ELSE CAST(f.np * f.slxy - f.slx * f.sly // 1000000
                            AS DOUBLE)
                       / (f.np * f.slxx - f.slx * f.slx // 1000000) END,
             6) AS hurst
FROM per_w p, fit f
ORDER BY p.w
"""


@register(
    "ml_hurst_rs",
    oracle=_ORACLE_HURST,
    tags=("ml", "stats", "events"),
    doc=(
        "Rescaled-range (R/S) Hurst exponent of the daily event-count "
        "series at window sizes 2/4/8/16: within each complete block the "
        "cumulative deviations are EXACT w-scaled integers (w*cumsum - "
        "k*blocksum), so the range R and the w^2-scaled variance are "
        "BIGINTs; each block's R/S is one e6-fixed float, per-window "
        "means stay integer, and the log-log slope (the Hurst estimate) "
        "is assembled from e6-fixed ln() points with integer-floor "
        "product terms — the same accepted 1-ulp libm surface as "
        "events_power_law_mle.  H > 0.5 = long-memory persistence, the "
        "burstiness diagnostic for traffic series.  Spine-bounded "
        "(blocks live on the <= |days| calendar)."
    ),
)
def ml_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    win = spark.createDataFrame(
        [(w,) for w in _HURST_WINDOWS], "w int"
    ).select(F.col("w").cast("bigint").alias("w"))
    wb = Window.partitionBy("w", "b").orderBy("rn")
    blocks = (
        idx.crossJoin(F.broadcast(win))
        .withColumn("b", F.expr("(rn - 1) div w"))
        .select(
            "w",
            "b",
            "rn",
            "x",
            F.sum("x")
            .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum"),
            F.row_number().over(wb).alias("k"),
        )
    )
    complete = (
        blocks.groupBy("w", "b")
        .agg(
            F.max("k").cast("bigint").alias("blen"),
            F.sum("x").cast("bigint").alias("s1"),
        )
        .where(F.col("blen") == F.col("w"))
        .select("w", "b", "s1")
    )
    devs = blocks.join(complete, ["w", "b"]).select(
        "w",
        "b",
        (F.col("w") * F.col("cum") - F.col("k") * F.col("s1"))
        .cast("bigint")
        .alias("dev"),
        (F.col("w") * F.col("x") - F.col("s1")).cast("bigint").alias("ddev"),
    )
    rs = devs.groupBy("w", "b").agg(
        (F.max("dev") - F.min("dev")).cast("bigint").alias("r_int"),
        F.sum(F.col("ddev") * F.col("ddev")).cast("bigint").alias("var_int"),
    )
    rs_fixed = rs.where(F.col("var_int") > 0).select(
        "w", F.expr(_RS_E6).alias("rs_e6")
    )
    per_w = rs_fixed.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("rs_e6").cast("bigint").alias("sum_rs_e6"),
    )
    logpts = per_w.where(F.col("sum_rs_e6") > 0).select(
        F.round(F.log(F.col("w").cast("double")) * 1000000.0)
        .cast("bigint")
        .alias("lx"),
        F.round(
            F.log(
                F.col("sum_rs_e6").cast("double")
                / F.col("n_blocks")
                / 1000000.0
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("ly"),
    )
    fit = logpts.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum("lx").cast("bigint").alias("slx"),
        F.sum("ly").cast("bigint").alias("sly"),
        F.sum(F.expr("lx * lx div 1000000")).cast("bigint").alias("slxx"),
        F.sum(F.expr("lx * ly div 1000000")).cast("bigint").alias("slxy"),
    )
    hurst = F.when(
        (F.col("np") <= 1)
        | (F.col("np") * F.col("slxx") - F.expr("slx * slx div 1000000") == 0),
        F.lit(0.0),
    ).otherwise(
        (F.col("np") * F.col("slxy") - F.expr("slx * sly div 1000000")).cast(
            "double"
        )
        / (F.col("np") * F.col("slxx") - F.expr("slx * slx div 1000000"))
    )
    return (
        per_w.join(F.broadcast(fit), F.lit(True), "left")
        .select("w", "n_blocks", "sum_rs_e6", F.round(hurst, 6).alias("hurst"))
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# Permutation entropy (Bandt-Pompe, order 3)
# ---------------------------------------------------------------------------

_ORACLE_PERM_ENTROPY = """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
lagged AS (
  SELECT g, x,
         lag(x, 2) OVER (PARTITION BY g ORDER BY day) AS x0,
         lag(x, 1) OVER (PARTITION BY g ORDER BY day) AS x1
  FROM daily
),
pats AS (
  SELECT g,
         4 * CASE WHEN x0 <= x1 THEN 1 ELSE 0 END
         + 2 * CASE WHEN x0 <= x THEN 1 ELSE 0 END
         + CASE WHEN x1 <= x THEN 1 ELSE 0 END AS code
  FROM lagged WHERE x0 IS NOT NULL
),
counts AS (
  SELECT g, code, CAST(COUNT(*) AS BIGINT) AS c FROM pats GROUP BY g, code
),
tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY g),
terms AS (
  SELECT c.g,
         CAST(round(-1000000000.0 * (CAST(c.c AS DOUBLE) / t.n)
                    * ln(CAST(c.c AS DOUBLE) / t.n)) AS BIGINT) AS h_e9
  FROM counts c JOIN tot t ON t.g = c.g
)
SELECT t.g AS event_type, t.n AS n_windows,
       CAST((SELECT COUNT(*) FROM counts c WHERE c.g = t.g) AS BIGINT)
         AS n_patterns,
       round(CAST((SELECT SUM(h_e9) FROM terms x WHERE x.g = t.g)
                  AS DOUBLE) / 1000000000.0 / ln(6.0), 6) AS perm_entropy
FROM tot t
"""


@register(
    "events_permutation_entropy",
    oracle=_ORACLE_PERM_ENTROPY,
    tags=("events", "stats", "timeseries"),
    doc=(
        "Order-3 permutation (Bandt-Pompe) entropy of each event type's "
        "daily count series: every 3-day window maps to an ordinal "
        "pattern code built from three exact integer <= comparisons "
        "(ties resolve to temporal order, pinned identically in both "
        "engines), pattern counting is pure integer aggregation, each "
        "-p ln p term is e9-FIXED before the cross-pattern sum, and the "
        "normalization by ln(3!) is the single final float.  Low entropy "
        "= predictable daily rhythm, high = noise; the model-free "
        "complexity measure beside the repo's autocorrelation/seasonal "
        "decomposition.  Windows are lag columns on the calendar-bounded "
        "per-type daily spine (PARTITIONED windows, no global funnel)."
    ),
)
def events_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wd = Window.partitionBy("g").orderBy("day")
    lagged = daily.select(
        "g",
        "x",
        F.lag("x", 2).over(wd).alias("x0"),
        F.lag("x", 1).over(wd).alias("x1"),
    ).where(F.col("x0").isNotNull())
    code = (
        4 * F.when(F.col("x0") <= F.col("x1"), 1).otherwise(0)
        + 2 * F.when(F.col("x0") <= F.col("x"), 1).otherwise(0)
        + F.when(F.col("x1") <= F.col("x"), 1).otherwise(0)
    )
    counts = lagged.groupBy("g", code.alias("code")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = counts.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
    )
    p = F.col("c").cast("double") / F.col("n")
    h_e9 = F.round(-1000000000.0 * p * F.log(p)).cast("bigint")
    terms = (
        counts.join(tot.select("g", "n"), "g")
        .select("g", h_e9.alias("h_e9"))
        .groupBy("g")
        .agg(F.sum("h_e9").cast("bigint").alias("h_sum_e9"))
    )
    return tot.join(terms, "g").select(
        F.col("g").alias("event_type"),
        F.col("n").alias("n_windows"),
        "n_patterns",
        F.round(
            F.col("h_sum_e9").cast("double") / 1000000000.0 / F.log(F.lit(6.0)),
            6,
        ).alias("perm_entropy"),
    )


# ---------------------------------------------------------------------------
# Mahalanobis outliers (diagonal covariance)
# ---------------------------------------------------------------------------

_ORACLE_MAHALANOBIS = f"""
WITH {_DAILY_XY_SQL},
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily
),
scored AS (
  SELECT d.day, d.x, d.y,
         CAST(round(1000000.0 * (
           CASE WHEN m.n * m.sxx - m.sx * m.sx = 0 THEN 0.0
                ELSE CAST((m.n * d.x - m.sx) * (m.n * d.x - m.sx) AS DOUBLE)
                     / (CAST(m.n AS DOUBLE) * m.sxx
                        - CAST(m.sx AS DOUBLE) * m.sx) END
           + CASE WHEN m.n * m.syy - m.sy * m.sy = 0 THEN 0.0
                  ELSE CAST((m.n * d.y - m.sy) * (m.n * d.y - m.sy) AS DOUBLE)
                       / (CAST(m.n AS DOUBLE) * m.syy
                          - CAST(m.sy AS DOUBLE) * m.sy) END))
              AS BIGINT) AS d2_e6
  FROM daily d, m
)
SELECT day, x, y, d2_e6,
       CAST(CASE WHEN d2_e6 > 5991465 THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM scored
"""


@register(
    "ml_mahalanobis_outliers",
    oracle=_ORACLE_MAHALANOBIS,
    tags=("ml", "stats", "dq"),
    doc=(
        "Per-day Mahalanobis distance of the (clicks, views) pair under "
        "the diagonal covariance: d^2 = (n x - sx)^2/(n sxx - sx^2) + "
        "(n y - sy)^2/(n syy - sy^2) — the n-scaled centering makes "
        "every numerator and denominator an exact BIGINT, the ratio sum "
        "is one e6-fixed float per day, and the outlier flag is the "
        "exact integer compare against the chi2(2, .95) = 5.991465 "
        "cutoff.  The multivariate companion of the repo's univariate "
        "z-score/IQR/Hampel outlier family; one scalar-moment broadcast "
        "onto the calendar-bounded daily spine."
    ),
)
def ml_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    daily = _daily_xy(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d2_e6 = F.expr(
        "CAST(round(1000000.0 * ("
        "CASE WHEN n * sxx - sx * sx = 0 THEN 0.0"
        " ELSE CAST((n * x - sx) * (n * x - sx) AS DOUBLE)"
        "      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END"
        " + CASE WHEN n * syy - sy * sy = 0 THEN 0.0"
        " ELSE CAST((n * y - sy) * (n * y - sy) AS DOUBLE)"
        "      / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) END))"
        " AS BIGINT)"
    )
    return daily.join(F.broadcast(m), F.lit(True), "left").select(
        "day",
        "x",
        "y",
        d2_e6.alias("d2_e6"),
        F.when(d2_e6 > 5991465, 1).otherwise(0).cast("bigint").alias("is_outlier"),
    )
