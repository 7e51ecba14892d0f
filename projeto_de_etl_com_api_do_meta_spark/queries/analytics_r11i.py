"""Round-11 batch 9: modern dependence measures, stability, survival eval.

* ``ml_xicor_correlation`` — Chatterjee's xi rank correlation (JASA
  2021), both directions: the consistent estimator of HOW MUCH y is a
  function of x — zero iff independent, 1 iff y = f(x), catches the
  nonmonotone dependence Pearson/Spearman/Kendall miss.  Tie-robust
  formula, exact integer ranks over the calendar-bounded daily spine.
* ``ml_tail_dependence`` — empirical upper/lower tail-dependence
  lambda of (engagement, revenue) at q = 0.9/0.1: exact order-statistic
  thresholds from cumulative counts over the VALUE spine (revenue
  bucketed to whole currency — the quantize-then-spine contract), then
  one conditional-count readout.  The copula-tail risk number Pearson
  hides.
* ``events_allan_variance`` — Allan variance of the daily count series
  at tau in {1,2,3,5,7}: block means e6-fixed, successive-difference
  squares e12-fixed, the clock-stability statistic that separates
  white noise (AVAR ~ 1/tau) from drift (AVAR rising).
* ``ml_survival_cindex`` — Harrell's concordance index for the
  signup-to-purchase survival task scored by engagement: comparable
  pairs (i converted, t_i < t_j) counted on the (time, event, score)
  CELL GRID — the quantize-then-spine form of the O(n^2) pair sum, so
  user volume never enters the pair join.

Exactness contract as the rest of r11: integer mass arithmetic, floored
e-fixed readouts (non-negative operands for every floor division), one
shared double expression per float column.  Reference scope: [EXT]
SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Chatterjee's xi
# ---------------------------------------------------------------------------


def _xicor_one_sql(xcol: str, ycol: str, label: str) -> str:
    """One direction of xi as DuckDB CTE body over the `daily` relation."""
    return f"""
  SELECT '{label}' AS direction, n,
         CAST(CASE WHEN den = 0 THEN 0
              ELSE 1000000 - (1000000 * num) // den END AS BIGINT) AS xi_e6
  FROM (
    SELECT MAX(n) AS n,
           MAX(n) * COALESCE(SUM(adiff), 0) AS num,
           CAST(2 AS BIGINT) * MAX(sl) AS den
    FROM (
      SELECT n, sl,
             abs(r - lag(r) OVER (ORDER BY {xcol}, d)) AS adiff
      FROM (
        SELECT d, {xcol}, r, n,
               SUM(l * (n - l)) OVER () AS sl
        FROM (
          SELECT d, {xcol},
                 CAST(COUNT(*) OVER (ORDER BY {ycol}
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS r,
                 CAST(COUNT(*) OVER (ORDER BY {ycol} DESC
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS l,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM daily
        )
      )
    )
  )
"""


_ORACLE_XICOR = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT direction, n AS n_days, xi_e6,
       CAST(xi_e6 AS DOUBLE) / 1000000.0 AS xi
FROM (
  {_xicor_one_sql("x", "y", "clicks_to_purchases")}
  UNION ALL
  {_xicor_one_sql("y", "x", "purchases_to_clicks")}
)
ORDER BY direction
"""


def _xicor_one_spark(daily: DataFrame, xcol: str, ycol: str, label: str) -> DataFrame:
    n_w = Window.partitionBy()
    r_w = (
        Window.orderBy(ycol)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    l_w = (
        Window.orderBy(F.col(ycol).desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = daily.select(
        "d",
        xcol,
        F.count(F.lit(1)).over(r_w).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(l_w).cast("bigint").alias("l"),
        F.count(F.lit(1)).over(n_w).cast("bigint").alias("n"),
    )
    with_sl = ranked.select(
        "d",
        xcol,
        "r",
        "n",
        F.sum(F.col("l") * (F.col("n") - F.col("l"))).over(n_w).alias("sl"),
    )
    diffs = with_sl.select(
        "n",
        "sl",
        F.abs(
            F.col("r") - F.lag("r").over(Window.orderBy(xcol, "d"))
        ).alias("adiff"),
    )
    agg = diffs.agg(
        F.max("n").alias("n"),
        (F.max("n") * F.coalesce(F.sum("adiff"), F.lit(0))).alias("num"),
        (F.lit(2).cast("bigint") * F.max("sl")).alias("den"),
    )
    return agg.select(
        F.lit(label).alias("direction"),
        "n",
        F.expr(
            "CAST(CASE WHEN den = 0 THEN 0"
            " ELSE 1000000 - (1000000 * num) div den END AS BIGINT)"
        ).alias("xi_e6"),
    )


@register(
    "ml_xicor_correlation",
    oracle=_ORACLE_XICOR,
    tags=("ml", "stats"),
    doc=(
        "Chatterjee's xi rank correlation (JASA 2021) between daily "
        "clicks and daily purchases, BOTH directions (xi is "
        "asymmetric — it estimates how much y is a FUNCTION of x): "
        "tie-robust formula xi = 1 - n*sum|r_(i+1) - r_i| / "
        "(2*sum l_i(n-l_i)) with max-tie ranks from RANGE-frame count "
        "windows and the x-order walk from one lag — all exact BIGINTs "
        "over the calendar-bounded daily spine, readout floored at e6.  "
        "Detects the nonmonotone dependence Pearson/Spearman/Kendall "
        "structurally miss; the modern first-look dependence screen."
    ),
)
def ml_xicor_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    out = _xicor_one_spark(daily, "x", "y", "clicks_to_purchases").unionAll(
        _xicor_one_spark(
            daily.select("d", F.col("y").alias("x"), F.col("x").alias("y")),
            "x",
            "y",
            "purchases_to_clicks",
        )
    )
    return out.select(
        "direction",
        F.col("n").alias("n_days"),
        "xi_e6",
        (F.col("xi_e6").cast("double") / 1000000.0).alias("xi"),
    ).orderBy("direction")


# ---------------------------------------------------------------------------
# Tail dependence
# ---------------------------------------------------------------------------

_TD_Q_NUM, _TD_Q_DEN = 9, 10  # q = 0.9 upper / 0.1 lower


_ORACLE_TAIL = f"""
WITH usr AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) // 100 AS y
  FROM events GROUP BY user_id
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM usr),
xs AS (
  SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c FROM usr GROUP BY x
),
xc AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM xs
),
ys AS (
  SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS c FROM usr GROUP BY y
),
yc AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM ys
),
th AS (
  SELECT
    (SELECT MIN(v) FROM xc CROSS JOIN nn
     WHERE cum >= ({_TD_Q_NUM} * n + {_TD_Q_DEN} - 1) // {_TD_Q_DEN})
      AS tx_hi,
    (SELECT MIN(v) FROM yc CROSS JOIN nn
     WHERE cum >= ({_TD_Q_NUM} * n + {_TD_Q_DEN} - 1) // {_TD_Q_DEN})
      AS ty_hi,
    (SELECT MIN(v) FROM xc CROSS JOIN nn
     WHERE cum >= (n + {_TD_Q_DEN} - 1) // {_TD_Q_DEN}) AS tx_lo,
    (SELECT MIN(v) FROM yc CROSS JOIN nn
     WHERE cum >= (n + {_TD_Q_DEN} - 1) // {_TD_Q_DEN}) AS ty_lo
),
cnt AS (
  SELECT
    CAST(SUM(CASE WHEN u.x > th.tx_hi THEN 1 ELSE 0 END) AS BIGINT) AS nx_hi,
    CAST(SUM(CASE WHEN u.x > th.tx_hi AND u.y > th.ty_hi THEN 1 ELSE 0 END)
         AS BIGINT) AS nj_hi,
    CAST(SUM(CASE WHEN u.x <= th.tx_lo THEN 1 ELSE 0 END) AS BIGINT) AS nx_lo,
    CAST(SUM(CASE WHEN u.x <= th.tx_lo AND u.y <= th.ty_lo THEN 1 ELSE 0 END)
         AS BIGINT) AS nj_lo
  FROM usr u CROSS JOIN th
)
SELECT nn.n AS n_users, th.tx_hi, th.ty_hi, th.tx_lo, th.ty_lo,
       cnt.nx_hi, cnt.nj_hi, cnt.nx_lo, cnt.nj_lo,
       CAST(CASE WHEN cnt.nx_hi = 0 THEN 0
            ELSE (1000000 * cnt.nj_hi) // cnt.nx_hi END AS BIGINT)
         AS lambda_upper_e6,
       CAST(CASE WHEN cnt.nx_lo = 0 THEN 0
            ELSE (1000000 * cnt.nj_lo) // cnt.nx_lo END AS BIGINT)
         AS lambda_lower_e6
FROM cnt CROSS JOIN th CROSS JOIN nn
"""


@register(
    "ml_tail_dependence",
    oracle=_ORACLE_TAIL,
    tags=("ml", "stats", "risk"),
    doc=(
        "Empirical upper/lower tail-dependence lambda between per-user "
        "engagement (view+click count) and purchase revenue (bucketed "
        "to whole currency — the quantize-then-spine contract): "
        "q = 0.9 / 0.1 thresholds are EXACT order statistics read from "
        "cumulative counts over the distinct-VALUE spines (never a "
        "per-user global sort), then lambda_U = P(Y > y_.9 | X > x_.9) "
        "and lambda_L = P(Y <= y_.1 | X <= x_.1) are one conditional "
        "count each, floored at e6.  The do-the-extremes-move-together "
        "copula number that correlation coefficients hide."
    ),
)
def ml_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    usr = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)"
            " AS BIGINT) div 100"
        ).alias("y"),
    )
    nn = usr.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def thresh(col: str, k_expr: str, alias: str) -> DataFrame:
        vals = usr.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        cum = vals.select(
            "v",
            F.sum("c")
            .over(
                Window.orderBy("v").rangeBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("cum"),
        )
        return (
            cum.crossJoin(F.broadcast(nn))
            .where(F.expr(f"cum >= {k_expr}"))
            .agg(F.min("v").alias(alias))
        )

    hi_k = f"({_TD_Q_NUM} * n + {_TD_Q_DEN} - 1) div {_TD_Q_DEN}"
    lo_k = f"(n + {_TD_Q_DEN} - 1) div {_TD_Q_DEN}"
    th = (
        thresh("x", hi_k, "tx_hi")
        .crossJoin(thresh("y", hi_k, "ty_hi"))
        .crossJoin(thresh("x", lo_k, "tx_lo"))
        .crossJoin(thresh("y", lo_k, "ty_lo"))
    )
    cnt = usr.crossJoin(F.broadcast(th)).agg(
        F.sum(F.when(F.col("x") > F.col("tx_hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("nx_hi"),
        F.sum(
            F.when(
                (F.col("x") > F.col("tx_hi")) & (F.col("y") > F.col("ty_hi")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("nj_hi"),
        F.sum(F.when(F.col("x") <= F.col("tx_lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("nx_lo"),
        F.sum(
            F.when(
                (F.col("x") <= F.col("tx_lo"))
                & (F.col("y") <= F.col("ty_lo")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("nj_lo"),
    )
    return (
        cnt.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_users"),
            "tx_hi",
            "ty_hi",
            "tx_lo",
            "ty_lo",
            "nx_hi",
            "nj_hi",
            "nx_lo",
            "nj_lo",
            F.expr(
                "CAST(CASE WHEN nx_hi = 0 THEN 0"
                " ELSE (1000000 * nj_hi) div nx_hi END AS BIGINT)"
            ).alias("lambda_upper_e6"),
            F.expr(
                "CAST(CASE WHEN nx_lo = 0 THEN 0"
                " ELSE (1000000 * nj_lo) div nx_lo END AS BIGINT)"
            ).alias("lambda_lower_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Allan variance
# ---------------------------------------------------------------------------

_AV_TAUS = (1, 2, 3, 5, 7)

_ORACLE_ALLAN = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS t, x FROM daily),
blocks AS (
  SELECT tau.tau, idx.t // tau.tau AS b,
         CAST(SUM(x) AS BIGINT) AS bsum, CAST(COUNT(*) AS BIGINT) AS bn
  FROM idx
  JOIN (SELECT unnest([{", ".join(str(t) for t in _AV_TAUS)}]) AS tau) tau
    ON TRUE
  GROUP BY tau.tau, idx.t // tau.tau
),
means AS (
  SELECT tau, b, (1000000 * bsum) // tau AS m_e6
  FROM blocks WHERE bn = tau
),
diffs AS (
  SELECT tau,
         m_e6 - lag(m_e6) OVER (PARTITION BY tau ORDER BY b) AS dm
  FROM means
),
stats AS (
  SELECT tau,
         CAST(COUNT(*) AS BIGINT) AS n_diffs,
         CAST(COALESCE(SUM(dm * dm), 0) AS BIGINT) AS ss
  FROM diffs WHERE dm IS NOT NULL GROUP BY tau
),
mb AS (
  SELECT tau, CAST(COUNT(*) AS BIGINT) AS m_blocks FROM means GROUP BY tau
)
SELECT mb.tau, mb.m_blocks,
       CAST(CASE WHEN COALESCE(s.n_diffs, 0) = 0 THEN 0
            ELSE s.ss // (2 * s.n_diffs) END AS BIGINT) AS avar_e12,
       CAST(floor(sqrt(CAST(CASE WHEN COALESCE(s.n_diffs, 0) = 0 THEN 0
                 ELSE s.ss // (2 * s.n_diffs) END AS DOUBLE) / 1000000000000.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS adev_e6
FROM mb LEFT JOIN stats s ON s.tau = mb.tau
ORDER BY mb.tau
"""


@register(
    "events_allan_variance",
    oracle=_ORACLE_ALLAN,
    tags=("events", "timeseries", "stats"),
    doc=(
        f"Allan variance of the daily event-count series at tau in "
        f"{{{', '.join(str(t) for t in _AV_TAUS)}}} days: full tau-blocks "
        "average to e6-fixed integer means, AVAR(tau) = "
        "sum((m_k+1 - m_k)^2) / (2(M-1)) stays e12-fixed BIGINT, and "
        "the Allan deviation readout is one shared sqrt expression "
        "floored at e6.  The clock-stability statistic: white noise "
        "falls as 1/tau, rate drift RISES with tau — the regime "
        "diagnosis a plain variance cannot make.  All block work lives "
        "on the calendar x tau spine."
    ),
)
def events_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"), "x"
    )
    taus = spark.createDataFrame([(t,) for t in _AV_TAUS], "tau INT")
    blocks = (
        idx.join(F.broadcast(taus), F.lit(True))
        .groupBy("tau", F.expr("t div tau").alias("b"))
        .agg(
            F.sum("x").cast("bigint").alias("bsum"),
            F.count(F.lit(1)).cast("bigint").alias("bn"),
        )
    )
    means = blocks.where(F.col("bn") == F.col("tau")).select(
        "tau", "b", F.expr("(1000000 * bsum) div tau").alias("m_e6")
    )
    w = Window.partitionBy("tau").orderBy("b")
    diffs = means.select(
        "tau", (F.col("m_e6") - F.lag("m_e6").over(w)).alias("dm")
    )
    stats = (
        diffs.where(F.col("dm").isNotNull())
        .groupBy("tau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_diffs"),
            F.coalesce(F.sum(F.col("dm") * F.col("dm")), F.lit(0))
            .cast("bigint")
            .alias("ss"),
        )
    )
    mb = means.groupBy("tau").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_blocks")
    )
    avar = (
        "CASE WHEN COALESCE(n_diffs, 0) = 0 THEN 0"
        " ELSE ss div (2 * n_diffs) END"
    )
    return (
        mb.join(stats, "tau", "left")
        .select(
            "tau",
            "m_blocks",
            F.expr(f"CAST({avar} AS BIGINT)").alias("avar_e12"),
            F.expr(
                f"CAST(floor(sqrt(CAST({avar} AS DOUBLE) / 1000000000000.0)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("adev_e6"),
        )
        .orderBy("tau")
    )


# ---------------------------------------------------------------------------
# Harrell's C-index
# ---------------------------------------------------------------------------

_ORACLE_CINDEX = """
WITH su AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
maxd AS (SELECT CAST(MAX(ts) AS DATE) AS max_d FROM events),
conv AS (
  SELECT su.user_id, MIN(e.ts) AS purchase_ts
  FROM su JOIN events e ON e.user_id = su.user_id
   AND e.event_type = 'purchase' AND e.ts >= su.signup_ts
  GROUP BY su.user_id
),
score AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM events GROUP BY user_id
),
subj AS (
  SELECT su.user_id,
         CASE WHEN c.purchase_ts IS NOT NULL
              THEN datediff('day', CAST(su.signup_ts AS DATE),
                            CAST(c.purchase_ts AS DATE))
              ELSE datediff('day', CAST(su.signup_ts AS DATE), maxd.max_d)
         END AS t,
         CASE WHEN c.purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS ev,
         COALESCE(sc.s, 0) AS s
  FROM su
  LEFT JOIN conv c ON c.user_id = su.user_id
  LEFT JOIN score sc ON sc.user_id = su.user_id
  CROSS JOIN maxd
),
cells AS (
  SELECT t, ev, s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM subj GROUP BY t, ev, s
),
pairs AS (
  SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS comparable,
         CAST(SUM(CASE WHEN a.s > b.s THEN a.cnt * b.cnt ELSE 0 END)
              AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN a.s = b.s THEN a.cnt * b.cnt ELSE 0 END)
              AS BIGINT) AS tied_score
  FROM cells a JOIN cells b ON a.ev = 1 AND b.t > a.t
)
SELECT CAST((SELECT COUNT(*) FROM subj) AS BIGINT) AS n_subjects,
       COALESCE(comparable, 0) AS comparable,
       COALESCE(concordant, 0) AS concordant,
       COALESCE(tied_score, 0) AS tied_score,
       CAST(CASE WHEN COALESCE(comparable, 0) = 0 THEN 0
            ELSE (1000000 * (2 * concordant + tied_score))
                 // (2 * comparable) END AS BIGINT) AS cindex_e6
FROM pairs
"""


@register(
    "ml_survival_cindex",
    oracle=_ORACLE_CINDEX,
    tags=("ml", "stats", "eval", "survival"),
    doc=(
        "Harrell's concordance index for the signup-to-first-purchase "
        "survival task scored by engagement (view+click count as the "
        "risk score; higher = expected to convert sooner): comparable "
        "pairs are (i converted, t_i < t_j), concordant when "
        "s_i > s_j, score ties count half.  The O(n^2) pair sum is "
        "evaluated on the (time, event, score) CELL GRID — counts "
        "multiply across cells, so user volume never enters the pair "
        "join (the quantize-then-spine contract; times are day-grain, "
        "calendar-bounded).  C = (2*conc + ties) / (2*comparable), "
        "floored at e6 — the standard discrimination eval for any "
        "time-to-event model."
    ),
)
def ml_survival_cindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    maxd = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    conv = (
        su.join(
            ev.where(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("cu"), F.col("ts").alias("pts")
            ),
            (F.col("cu") == F.col("user_id"))
            & (F.col("pts") >= F.col("signup_ts")),
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("purchase_ts"))
    )
    score = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("s")
    )
    subj = (
        su.join(conv, "user_id", "left")
        .join(score, "user_id", "left")
        .crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            F.when(
                F.col("purchase_ts").isNotNull(),
                F.datediff(F.to_date("purchase_ts"), F.to_date("signup_ts")),
            )
            .otherwise(F.datediff("max_d", F.to_date("signup_ts")))
            .alias("t"),
            F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0).alias(
                "ev"
            ),
            F.coalesce("s", F.lit(0)).alias("s"),
        )
    )
    cells = subj.groupBy("t", "ev", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = cells.select(
        F.col("t").alias("ta"),
        F.col("ev").alias("eva"),
        F.col("s").alias("sa"),
        F.col("cnt").alias("ca"),
    )
    b = cells.select(
        F.col("t").alias("tb"), F.col("s").alias("sb"), F.col("cnt").alias("cb")
    )
    pairs = (
        a.where(F.col("eva") == 1)
        .join(b, F.col("tb") > F.col("ta"))
        .agg(
            F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias(
                "comparable"
            ),
            F.sum(
                F.when(
                    F.col("sa") > F.col("sb"), F.col("ca") * F.col("cb")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("concordant"),
            F.sum(
                F.when(
                    F.col("sa") == F.col("sb"), F.col("ca") * F.col("cb")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tied_score"),
        )
    )
    n_subj = subj.agg(F.count(F.lit(1)).cast("bigint").alias("n_subjects"))
    return (
        n_subj.crossJoin(F.broadcast(pairs))
        .select(
            "n_subjects",
            F.coalesce("comparable", F.lit(0)).cast("bigint").alias(
                "comparable"
            ),
            F.coalesce("concordant", F.lit(0)).cast("bigint").alias(
                "concordant"
            ),
            F.coalesce("tied_score", F.lit(0)).cast("bigint").alias(
                "tied_score"
            ),
            F.expr(
                "CAST(CASE WHEN COALESCE(comparable, 0) = 0 THEN 0"
                " ELSE (1000000 * (2 * concordant + tied_score))"
                " div (2 * comparable) END AS BIGINT)"
            ).alias("cindex_e6"),
        )
    )
