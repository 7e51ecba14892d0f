"""Round-11 batch 3: directed dependence and the time-series codec.

* ``ml_granger_causality`` — lag-1 Granger F tests in BOTH directions
  between the daily click and view series, restricted/unrestricted SSEs
  from exact n-scaled BIGINT moments (the ml_chow_test machinery with a
  second regressor).
* ``events_transfer_entropy`` — binary (up/down) transfer entropy in
  both directions from exact 8-cell joint counts, each cell's term
  e9-fixed (the DIRECTED companion of permutation entropy and MI).
* ``ml_partial_correlation`` — r(clicks, views | purchases) in one
  float expression from exact centered moments, beside the three raw
  pairwise correlations.
* ``io_dod_timestamp_roundtrip`` — Gorilla-style delta-of-delta
  timestamp compression (zigzag LEB128 varints, byte-aligned) through
  Arrow-batched pandas UDFs per user stream, with an ANALYTIC size
  oracle (per-event varint byte cost classified by magnitude) and an
  exact decode-back assertion.

Determinism contract and scale posture as stats_r11: integer fixed
point, e-fixed terms before cross-row sums, at most one final float per
column with identical text in both engines; daily/8-cell/user-stream
state, never raw-row funnels.  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Granger causality (lag 1, both directions)
# ---------------------------------------------------------------------------

#: n-scaled centered-moment SSEs for the restricted (d ~ r1) and
#: unrestricted (d ~ r1 + r2) lag regressions, e6-fixed — identical text in
#: both engines.  Moments are the raw BIGINT sums over the lag-joined days.
_GC_SSE_R_E6 = (
    "CAST(round(1000000.0 * ("
    "CASE WHEN n * s11 - s1 * s1 = 0"
    " THEN CAST(n * sdd - sd * sd AS DOUBLE) / n / n"
    " ELSE (CAST(n * sdd - sd * sd AS DOUBLE)"
    "       - CAST(n * s1d - s1 * sd AS DOUBLE)"
    "         * (CAST(n AS DOUBLE) * s1d - CAST(s1 AS DOUBLE) * sd)"
    "         / (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1))"
    "      / n / n END)) AS BIGINT)"
)
_GC_SSE_U_E6 = (
    "CAST(round(1000000.0 * ("
    "CASE WHEN (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)"
    "          * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)"
    "          - (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)"
    "            * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2) = 0"
    " THEN CAST(n * sdd - sd * sd AS DOUBLE) / n / n"
    " ELSE (CAST(n * sdd - sd * sd AS DOUBLE)"
    "       - ((CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)"
    "          * (CAST(n AS DOUBLE) * s1d - CAST(s1 AS DOUBLE) * sd)"
    "          * (CAST(n AS DOUBLE) * s1d - CAST(s1 AS DOUBLE) * sd)"
    "          - 2.0 * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)"
    "            * (CAST(n AS DOUBLE) * s1d - CAST(s1 AS DOUBLE) * sd)"
    "            * (CAST(n AS DOUBLE) * s2d - CAST(s2 AS DOUBLE) * sd)"
    "          + (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)"
    "            * (CAST(n AS DOUBLE) * s2d - CAST(s2 AS DOUBLE) * sd)"
    "            * (CAST(n AS DOUBLE) * s2d - CAST(s2 AS DOUBLE) * sd))"
    "         / ((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)"
    "            * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)"
    "            - (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)"
    "              * (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)))"
    "      / n / n END)) AS BIGINT)"
)

_ORACLE_GRANGER = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
lagged AS (
  SELECT x, y,
         lag(x) OVER (ORDER BY day) AS x1,
         lag(y) OVER (ORDER BY day) AS y1
  FROM daily
),
frames AS (
  SELECT 'x->y' AS direction, y AS d, y1 AS r1, x1 AS r2
  FROM lagged WHERE x1 IS NOT NULL
  UNION ALL
  SELECT 'y->x', x, x1, y1 FROM lagged WHERE x1 IS NOT NULL
),
m AS (
  SELECT direction,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(r1) AS BIGINT) AS s1,
         CAST(SUM(r2) AS BIGINT) AS s2,
         CAST(SUM(d * d) AS BIGINT) AS sdd,
         CAST(SUM(r1 * r1) AS BIGINT) AS s11,
         CAST(SUM(r2 * r2) AS BIGINT) AS s22,
         CAST(SUM(r1 * r2) AS BIGINT) AS s12,
         CAST(SUM(r1 * d) AS BIGINT) AS s1d,
         CAST(SUM(r2 * d) AS BIGINT) AS s2d
  FROM frames GROUP BY direction
),
sse AS (
  SELECT direction, n,
         {_GC_SSE_R_E6} AS sse_r_e6,
         {_GC_SSE_U_E6} AS sse_u_e6
  FROM m
)
SELECT direction, n AS n_pairs, sse_r_e6, sse_u_e6,
       round(CASE WHEN n <= 3 OR sse_u_e6 <= 0 THEN 0.0
                  ELSE CAST(sse_r_e6 - sse_u_e6 AS DOUBLE)
                       / (CAST(sse_u_e6 AS DOUBLE) / (n - 3)) END,
             6) AS granger_f
FROM sse ORDER BY direction
"""


@register(
    "ml_granger_causality",
    oracle=_ORACLE_GRANGER,
    tags=("ml", "stats", "timeseries"),
    doc=(
        "Lag-1 Granger causality F tests in BOTH directions between the "
        "daily click and view series: the restricted (own lag only) and "
        "unrestricted (own lag + other's lag) SSEs come from exact "
        "n-scaled BIGINT moments — the 2-regressor normal-equation "
        "closed form (S22 S1d^2 - 2 S12 S1d S2d + S11 S2d^2) / det — "
        "each e6-FIXED, and F = (SSE_r - SSE_u)/(SSE_u/(n-3)) is the "
        "single final float per direction.  The does-x's-PAST-help "
        "question plain correlation can't answer; asymmetry between the "
        "two rows is the finding.  Calendar-bounded daily spine, one "
        "grouped moment aggregate per direction."
    ),
)
def ml_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        "y",
        F.lag("x").over(w).alias("x1"),
        F.lag("y").over(w).alias("y1"),
    ).where(F.col("x1").isNotNull())
    xy = lagged.select(
        F.lit("x->y").alias("direction"),
        F.col("y").alias("d"),
        F.col("y1").alias("r1"),
        F.col("x1").alias("r2"),
    )
    yx = lagged.select(
        F.lit("y->x").alias("direction"),
        F.col("x").alias("d"),
        F.col("x1").alias("r1"),
        F.col("y1").alias("r2"),
    )
    frames = xy.unionAll(yx)
    m = frames.groupBy("direction").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum("r1").cast("bigint").alias("s1"),
        F.sum("r2").cast("bigint").alias("s2"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum(F.col("r1") * F.col("r1")).cast("bigint").alias("s11"),
        F.sum(F.col("r2") * F.col("r2")).cast("bigint").alias("s22"),
        F.sum(F.col("r1") * F.col("r2")).cast("bigint").alias("s12"),
        F.sum(F.col("r1") * F.col("d")).cast("bigint").alias("s1d"),
        F.sum(F.col("r2") * F.col("d")).cast("bigint").alias("s2d"),
    )
    sse = m.select(
        "direction",
        "n",
        F.expr(_GC_SSE_R_E6).alias("sse_r_e6"),
        F.expr(_GC_SSE_U_E6).alias("sse_u_e6"),
    )
    f_stat = F.when(
        (F.col("n") <= 3) | (F.col("sse_u_e6") <= 0), F.lit(0.0)
    ).otherwise(
        (F.col("sse_r_e6") - F.col("sse_u_e6")).cast("double")
        / (F.col("sse_u_e6").cast("double") / (F.col("n") - 3))
    )
    return sse.select(
        "direction",
        F.col("n").alias("n_pairs"),
        "sse_r_e6",
        "sse_u_e6",
        F.round(f_stat, 6).alias("granger_f"),
    ).orderBy("direction")


# ---------------------------------------------------------------------------
# Transfer entropy (binary up/down states, both directions)
# ---------------------------------------------------------------------------

_ORACLE_TRANSFER_ENTROPY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
states AS (
  SELECT day,
         CASE WHEN x > lag(x) OVER (ORDER BY day) THEN 1 ELSE 0 END AS sx,
         CASE WHEN y > lag(y) OVER (ORDER BY day) THEN 1 ELSE 0 END AS sy,
         lag(x) OVER (ORDER BY day) AS guard
  FROM daily
),
trans AS (
  SELECT sx AS xt, sy AS yt,
         lag(sx) OVER (ORDER BY day) AS x1,
         lag(sy) OVER (ORDER BY day) AS y1
  FROM states WHERE guard IS NOT NULL
),
frames AS (
  SELECT 'x->y' AS direction, yt AS t, y1 AS t1, x1 AS o1
  FROM trans WHERE x1 IS NOT NULL
  UNION ALL
  SELECT 'y->x', xt, x1, y1 FROM trans WHERE x1 IS NOT NULL
),
joint AS (
  SELECT direction, t, t1, o1, CAST(COUNT(*) AS BIGINT) AS c
  FROM frames GROUP BY direction, t, t1, o1
),
m_t1o1 AS (
  SELECT direction, t1, o1, CAST(SUM(c) AS BIGINT) AS c_t1o1
  FROM joint GROUP BY direction, t1, o1
),
m_tt1 AS (
  SELECT direction, t, t1, CAST(SUM(c) AS BIGINT) AS c_tt1
  FROM joint GROUP BY direction, t, t1
),
m_t1 AS (
  SELECT direction, t1, CAST(SUM(c) AS BIGINT) AS c_t1
  FROM joint GROUP BY direction, t1
),
n AS (
  SELECT direction, CAST(SUM(c) AS BIGINT) AS n
  FROM joint GROUP BY direction
),
terms AS (
  SELECT j.direction,
         CAST(round(1000000000.0 * (CAST(j.c AS DOUBLE) / n.n)
                    * ln(CAST(j.c AS DOUBLE) * m1.c_t1
                         / (CAST(mo.c_t1o1 AS DOUBLE) * mt.c_tt1)))
              AS BIGINT) AS te_e9
  FROM joint j
  JOIN m_t1o1 mo ON mo.direction = j.direction AND mo.t1 = j.t1
                AND mo.o1 = j.o1
  JOIN m_tt1 mt ON mt.direction = j.direction AND mt.t = j.t
               AND mt.t1 = j.t1
  JOIN m_t1 m1 ON m1.direction = j.direction AND m1.t1 = j.t1
  JOIN n ON n.direction = j.direction
)
SELECT n.direction, n.n AS n_transitions,
       CAST((SELECT COUNT(*) FROM terms t WHERE t.direction = n.direction)
            AS BIGINT) AS n_cells,
       CAST((SELECT SUM(te_e9) FROM terms t WHERE t.direction = n.direction)
            AS BIGINT) AS te_sum_e9,
       round(CAST((SELECT SUM(te_e9) FROM terms t
                   WHERE t.direction = n.direction) AS DOUBLE)
             / 1000000000.0, 6) AS transfer_entropy
FROM n ORDER BY n.direction
"""


@register(
    "events_transfer_entropy",
    oracle=_ORACLE_TRANSFER_ENTROPY,
    tags=("events", "stats", "timeseries"),
    doc=(
        "Binary transfer entropy in both directions between the daily "
        "click and view up/down state sequences: TE(X->Y) = sum over the "
        "8 (y_t, y_{t-1}, x_{t-1}) cells of p ln [p(y_t|y_1,x_1) / "
        "p(y_t|y_1)], every probability a ratio of exact BIGINT "
        "transition counts and each cell's term e9-FIXED before the sum. "
        " The DIRECTED, model-free dependence measure: MI is symmetric, "
        "Granger assumes linearity, TE is neither — asymmetric rows are "
        "the lead-lag finding.  State = 8 cells per direction at any "
        "event volume (calendar-bounded lag windows)."
    ),
)
def events_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.orderBy("day")
    states = daily.select(
        "day",
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("sx"),
        F.when(F.col("y") > F.lag("y").over(w), 1).otherwise(0).alias("sy"),
        F.lag("x").over(w).alias("guard"),
    ).where(F.col("guard").isNotNull())
    trans = states.select(
        F.col("sx").alias("xt"),
        F.col("sy").alias("yt"),
        F.lag("sx").over(Window.orderBy("day")).alias("x1"),
        F.lag("sy").over(Window.orderBy("day")).alias("y1"),
    ).where(F.col("x1").isNotNull())
    xy = trans.select(
        F.lit("x->y").alias("direction"),
        F.col("yt").alias("t"),
        F.col("y1").alias("t1"),
        F.col("x1").alias("o1"),
    )
    yx = trans.select(
        F.lit("y->x").alias("direction"),
        F.col("xt").alias("t"),
        F.col("x1").alias("t1"),
        F.col("y1").alias("o1"),
    )
    joint = (
        xy.unionAll(yx)
        .groupBy("direction", "t", "t1", "o1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m_t1o1 = joint.groupBy("direction", "t1", "o1").agg(
        F.sum("c").cast("bigint").alias("c_t1o1")
    )
    m_tt1 = joint.groupBy("direction", "t", "t1").agg(
        F.sum("c").cast("bigint").alias("c_tt1")
    )
    m_t1 = joint.groupBy("direction", "t1").agg(
        F.sum("c").cast("bigint").alias("c_t1")
    )
    n = joint.groupBy("direction").agg(F.sum("c").cast("bigint").alias("n"))
    te_e9 = F.round(
        1000000000.0
        * (F.col("c").cast("double") / F.col("n"))
        * F.log(
            F.col("c").cast("double")
            * F.col("c_t1")
            / (F.col("c_t1o1").cast("double") * F.col("c_tt1"))
        )
    ).cast("bigint")
    terms = (
        joint.join(m_t1o1, ["direction", "t1", "o1"])
        .join(m_tt1, ["direction", "t", "t1"])
        .join(m_t1, ["direction", "t1"])
        .join(n, "direction")
        .select("direction", te_e9.alias("te_e9"))
        .groupBy("direction")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("te_e9").cast("bigint").alias("te_sum_e9"),
        )
    )
    return (
        n.join(terms, "direction")
        .select(
            "direction",
            F.col("n").alias("n_transitions"),
            "n_cells",
            "te_sum_e9",
            F.round(F.col("te_sum_e9").cast("double") / 1000000000.0, 6).alias(
                "transfer_entropy"
            ),
        )
        .orderBy("direction")
    )


# ---------------------------------------------------------------------------
# Partial correlation
# ---------------------------------------------------------------------------

#: Pearson r from n-scaled centered BIGINT moments — identical text.
_R_EXPR = (
    "round(CASE WHEN (CAST(n AS DOUBLE) * s{a}{a} - CAST(s{a} AS DOUBLE) * s{a})"
    "             * (CAST(n AS DOUBLE) * s{b}{b} - CAST(s{b} AS DOUBLE) * s{b})"
    "             <= 0 THEN 0.0"
    " ELSE (CAST(n AS DOUBLE) * s{a}{b} - CAST(s{a} AS DOUBLE) * s{b})"
    "      / sqrt((CAST(n AS DOUBLE) * s{a}{a} - CAST(s{a} AS DOUBLE) * s{a})"
    "             * (CAST(n AS DOUBLE) * s{b}{b} - CAST(s{b} AS DOUBLE) * s{b}))"
    " END, 6)"
)

#: Partial r_xy.z in ONE expression from the same centered moments.
_PARTIAL_EXPR = (
    "round(CASE WHEN ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    "              * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)"
    "              - (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)"
    "                * (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz))"
    "             * ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    "                * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)"
    "                - (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)"
    "                  * (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz))"
    "             <= 0 THEN 0.0"
    " ELSE ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    "       * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)"
    "       - (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)"
    "         * (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz))"
    "      / sqrt(((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    "              * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)"
    "              - (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)"
    "                * (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz))"
    "             * ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    "                * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)"
    "                - (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)"
    "                  * (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)))"
    " END, 6)"
)

_ORACLE_PARTIAL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS z
  FROM events GROUP BY CAST(ts AS DATE)
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(z * z) AS BIGINT) AS szz,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * z) AS BIGINT) AS sxz,
         CAST(SUM(y * z) AS BIGINT) AS syz
  FROM daily
)
SELECT n AS n_days,
       {_R_EXPR.format(a="x", b="y")} AS r_xy,
       {_R_EXPR.format(a="x", b="z")} AS r_xz,
       {_R_EXPR.format(a="y", b="z")} AS r_yz,
       {_PARTIAL_EXPR} AS partial_r_xy_z
FROM m
"""


@register(
    "ml_partial_correlation",
    oracle=_ORACLE_PARTIAL,
    tags=("ml", "stats"),
    doc=(
        "Partial correlation r(clicks, views | purchases) over the daily "
        "spine, beside the three raw pairwise correlations: every "
        "coefficient is ONE float expression over the exact n-scaled "
        "BIGINT moment matrix (the partial via the determinant form "
        "(Sxy Szz - Sxz Syz)/sqrt((Sxx Szz - Sxz^2)(Syy Szz - Syz^2)), "
        "degenerate denominators to 0).  The is-the-correlation-just-"
        "traffic control every pairwise-correlation report needs; one "
        "grouped integer aggregate, 10 BIGINTs of state."
    ),
)
def ml_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("z"),
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("bigint").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("bigint").alias("syz"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.expr(_R_EXPR.format(a="x", b="y")).alias("r_xy"),
        F.expr(_R_EXPR.format(a="x", b="z")).alias("r_xz"),
        F.expr(_R_EXPR.format(a="y", b="z")).alias("r_yz"),
        F.expr(_PARTIAL_EXPR).alias("partial_r_xy_z"),
    )


# ---------------------------------------------------------------------------
# Delta-of-delta timestamp codec
# ---------------------------------------------------------------------------


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dod_encode(ts: list[int]) -> bytes:
    """Gorilla-style delta-of-delta: varint(n), varint(t0), then
    zigzag-varint(first delta), then zigzag-varint(dod) per point."""
    out = bytearray(_varint(len(ts)))
    if not ts:
        return bytes(out)
    out += _varint(ts[0])
    prev, prev_delta = ts[0], None
    for t in ts[1:]:
        delta = t - prev
        if prev_delta is None:
            out += _varint(_zigzag(delta))
        else:
            out += _varint(_zigzag(delta - prev_delta))
        prev, prev_delta = t, delta
    return bytes(out)


def dod_decode(buf: bytes) -> list[int]:
    pos = 0

    def rd() -> int:
        nonlocal pos
        shift = u = 0
        while True:
            b = buf[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u
            shift += 7

    n = rd()
    if n == 0:
        return []
    out = [rd()]
    prev_delta = None
    for _ in range(n - 1):
        if prev_delta is None:
            prev_delta = _unzigzag(rd())
        else:
            prev_delta += _unzigzag(rd())
        out.append(out[-1] + prev_delta)
    return out


#: SQL varint byte count of an unsigned value (LEB128; 9 classes cover
#: 63 bits — microsecond epochs need 8).
_VSIZE = (
    "(CASE WHEN {u} < 128 THEN 1 WHEN {u} < 16384 THEN 2"
    " WHEN {u} < 2097152 THEN 3 WHEN {u} < 268435456 THEN 4"
    " WHEN {u} < 34359738368 THEN 5 WHEN {u} < 4398046511104 THEN 6"
    " WHEN {u} < 562949953421312 THEN 7"
    " WHEN {u} < 72057594037927936 THEN 8 ELSE 9 END)"
)
#: zigzag of a signed value in SQL (both engines: 2v / -2v-1 branches).
_ZZ = "(CASE WHEN {v} >= 0 THEN 2 * ({v}) ELSE -2 * ({v}) - 1 END)"

_ORACLE_DOD = f"""
WITH e AS (
  -- exact integer MICROSECONDS: epoch(ts) is a DOUBLE whose BIGINT cast
  -- ROUNDS sub-second parts where Spark's unix_timestamp truncates (1-byte
  -- varint divergences at sf0.1); epoch_us/unix_micros are integer-exact
  -- in both engines.
  SELECT user_id, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS t
  FROM events
),
o AS (
  SELECT user_id, t,
         lag(t) OVER w AS t1,
         lag(t, 2) OVER w AS t2,
         row_number() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
cost AS (
  SELECT user_id, n,
         CASE WHEN rn = 1
              THEN {_VSIZE.format(u="n")} + {_VSIZE.format(u="t")}
              WHEN rn = 2
              THEN {_VSIZE.format(u=_ZZ.format(v="(t - t1)"))}
              ELSE {_VSIZE.format(u=_ZZ.format(v="((t - t1) - (t1 - t2))"))}
         END AS b
  FROM o
),
per_user AS (
  SELECT user_id % 16 AS shard, CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
         CAST(SUM(b) AS BIGINT) AS nbytes
  FROM cost GROUP BY user_id
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
FROM per_user GROUP BY shard
"""


@register(
    "io_dod_timestamp_roundtrip",
    oracle=_ORACLE_DOD,
    tags=("io", "codec", "timeseries"),
    doc=(
        "Gorilla-style delta-of-delta timestamp compression per user "
        "event stream (the TSDB trick: regular cadences make the second "
        "difference ~0, so zigzag LEB128 varints collapse to one byte): "
        "real executor-side encode/decode through applyInPandas, the "
        "oracle recomputes the compressed size ANALYTICALLY from each "
        "event's dod magnitude class (varint byte thresholds as a "
        "shared CASE) and the engine asserts every user stream decodes "
        "back timestamp-exact.  Same-timestamp events are tiebroken by "
        "event_id in both engines, and the delta multiset is tiebreak-"
        "invariant anyway.  The time-series quadrant of the codec "
        "family (varint = ints, bitpack = sub-byte, PackBits = RLE, "
        "DoD = second differences); one shuffle on user_id."
    ),
)
def io_dod_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").cast("bigint").alias("t"),
    )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("nbytes", T.LongType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def encode_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"])
        ts = [int(v) for v in pdf["t"]]
        buf = dod_encode(ts)
        return pd.DataFrame(
            [
                (
                    int(pdf["user_id"].iloc[0]) % 16,
                    len(ts),
                    len(buf),
                    dod_decode(buf) == ts,
                )
            ],
            columns=["shard", "n_events", "nbytes", "ok"],
        )

    per_user = e.groupBy("user_id").applyInPandas(encode_user, schema=out_schema)
    return per_user.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("nbytes").cast("bigint").alias("total_bytes"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip_ok"),
    )
