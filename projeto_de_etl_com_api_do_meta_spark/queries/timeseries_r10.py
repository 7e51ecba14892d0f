"""Round-10 time-series robustness and graded-retrieval-eval operators.

* ``events_forecast_accuracy_naive`` — MAE/RMSE/MASE backtest of the
  naive (lag-1) vs seasonal-naive (lag-7) forecasters over each type's
  daily series, every error an exact integer.
* ``events_hampel_filter`` — rolling-window Hampel outlier filter
  (median ± 3 * 1.4826 * MAD) with the median and MAD carried as exact
  doubled/quadrupled integers and the outlier decision a pure INTEGER
  comparison (dev2 * 20000 > 44478 * mad4) — no float ever decides.
* ``ml_anderson_darling_2samp`` — two-sample Anderson-Darling
  (Scholz-Stephens right-continuous form) between the click and view
  value distributions over the pooled distinct-value spine; each
  term's double contribution is rounded to an e12 INTEGER before the
  cross-row sum so accumulation order cannot flake the differ.
* ``retrieval_err_eval`` — Expected Reciprocal Rank with graded dyadic
  relevance R = (2^g - 1)/8: the cascade product over higher ranks is
  reconstructed EXACTLY as 7^a * 5^b / 8^(a+b+c) from window counts of
  each grade (dyadic-rational arithmetic, no running float product),
  each rank's term e12-fixed before the per-query sum.

Reference scope: [EXT] SURVEY §6 analytics/eval surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Naive vs seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

_ORACLE_FORECAST = """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
l AS (
  SELECT g, cnt,
         lag(cnt, 1) OVER (PARTITION BY g ORDER BY day) AS f1,
         lag(cnt, 7) OVER (PARTITION BY g ORDER BY day) AS f7
  FROM daily
),
e AS (
  SELECT g, cnt - f1 AS e1, cnt - f7 AS e7
  FROM l WHERE f1 IS NOT NULL AND f7 IS NOT NULL
)
SELECT g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(ABS(e1)) AS BIGINT) AS sum_abs_e1,
       CAST(SUM(e1 * e1) AS BIGINT) AS sum_sq_e1,
       CAST(SUM(ABS(e7)) AS BIGINT) AS sum_abs_e7,
       CAST(SUM(e7 * e7) AS BIGINT) AS sum_sq_e7,
       round(CAST(SUM(ABS(e1)) AS DOUBLE) / COUNT(*), 6) AS mae_naive,
       round(sqrt(CAST(SUM(e1 * e1) AS DOUBLE) / COUNT(*)), 6) AS rmse_naive,
       round(CASE WHEN SUM(ABS(e1)) = 0 THEN 0.0
                  ELSE CAST(SUM(ABS(e7)) AS DOUBLE) / SUM(ABS(e1)) END,
             6) AS mase_seasonal
FROM e GROUP BY g
"""


@register(
    "events_forecast_accuracy_naive",
    oracle=_ORACLE_FORECAST,
    tags=("events", "timeseries", "eval"),
    doc=(
        "Forecast-accuracy backtest of the naive (yesterday) vs "
        "seasonal-naive (a week ago, rows-based) forecasters over each "
        "type's daily count series: every error is an exact integer, the "
        "absolute/squared error sums are BIGINTs, and MAE/RMSE/MASE are "
        "single final float expressions.  MASE > 1 means weekly "
        "seasonality does NOT beat simple persistence — the standard "
        "pre-model sanity gate for any demand/traffic pipeline.  Two lag "
        "windows + one grouped aggregate."
    ),
)
def events_forecast_accuracy_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("g").orderBy("day")
    l = daily.select(
        "g",
        "cnt",
        F.lag("cnt", 1).over(w).alias("f1"),
        F.lag("cnt", 7).over(w).alias("f7"),
    )
    e = l.where(F.col("f1").isNotNull() & F.col("f7").isNotNull()).select(
        "g",
        (F.col("cnt") - F.col("f1")).alias("e1"),
        (F.col("cnt") - F.col("f7")).alias("e7"),
    )
    agg = e.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.abs("e1")).cast("bigint").alias("sum_abs_e1"),
        F.sum(F.col("e1") * F.col("e1")).cast("bigint").alias("sum_sq_e1"),
        F.sum(F.abs("e7")).cast("bigint").alias("sum_abs_e7"),
        F.sum(F.col("e7") * F.col("e7")).cast("bigint").alias("sum_sq_e7"),
    )
    return agg.select(
        F.col("g").alias("event_type"),
        "n_eval",
        "sum_abs_e1",
        "sum_sq_e1",
        "sum_abs_e7",
        "sum_sq_e7",
        F.round(F.col("sum_abs_e1").cast("double") / F.col("n_eval"), 6).alias(
            "mae_naive"
        ),
        F.round(
            F.sqrt(F.col("sum_sq_e1").cast("double") / F.col("n_eval")), 6
        ).alias("rmse_naive"),
        F.round(
            F.when(F.col("sum_abs_e1") == 0, F.lit(0.0)).otherwise(
                F.col("sum_abs_e7").cast("double") / F.col("sum_abs_e1")
            ),
            6,
        ).alias("mase_seasonal"),
    )


# ---------------------------------------------------------------------------
# Hampel filter (integer-decided rolling median ± 3 * 1.4826 * MAD)
# ---------------------------------------------------------------------------

#: 3 * 1.4826 = 4.4478; the decision dev > 4.4478 * MAD is evaluated as
#: dev2 * 20000 > 44478 * mad4 with dev2 = 2*dev and mad4 = 4*MAD — exact
#: integers on both sides, so no float ever decides an outlier flag.
_HAMPEL_K_E4 = 44478

_ORACLE_HAMPEL = f"""
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
win AS (
  SELECT g, day, cnt,
         list_sort(list(cnt) OVER (PARTITION BY g ORDER BY day
                                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
           AS arr
  FROM daily
),
med AS (
  SELECT g, day, cnt, arr, len(arr) AS n,
         arr[(len(arr) + 1) // 2] + arr[(len(arr) + 2) // 2] AS med2
  FROM win
),
mad AS (
  SELECT g, day, cnt, med2,
         ABS(2 * cnt - med2) AS dev2,
         list_sort(list_transform(arr, v -> ABS(2 * v - med2))) AS dv
  FROM med
)
SELECT g AS event_type, day, cnt, med2, dev2,
       dv[(len(dv) + 1) // 2] + dv[(len(dv) + 2) // 2] AS mad4,
       CASE WHEN dev2 * 20000 >
                 {_HAMPEL_K_E4} * (dv[(len(dv) + 1) // 2]
                                   + dv[(len(dv) + 2) // 2])
            THEN 1 ELSE 0 END AS is_outlier
FROM mad
"""


@register(
    "events_hampel_filter",
    oracle=_ORACLE_HAMPEL,
    tags=("events", "timeseries", "dq"),
    doc=(
        "Hampel rolling outlier filter over each type's daily series "
        "(window of 7, rows-based): the window median rides as the exact "
        "integer 2*median (sum of the two middle sorted values), the MAD "
        "as the exact integer 4*MAD (doubled median of doubled "
        "deviations), and the classic 3-sigma-equivalent decision "
        "dev > 3 * 1.4826 * MAD is the pure INTEGER comparison "
        "dev2 * 20000 > 44478 * mad4 — the flag can never flake on a "
        "float.  One list window per row (7 elements) + array ops, all "
        "inside codegen; the calendar bounds the state."
    ),
)
def events_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.withColumn("arr", F.sort_array(F.collect_list("cnt").over(w)))
    med = win.withColumn(
        "med2",
        F.expr(
            "element_at(arr, cast((size(arr) + 1) div 2 as int))"
            " + element_at(arr, cast((size(arr) + 2) div 2 as int))"
        ),
    )
    mad = med.select(
        "g",
        "day",
        "cnt",
        "med2",
        F.abs(2 * F.col("cnt") - F.col("med2")).alias("dev2"),
        F.expr("sort_array(transform(arr, v -> abs(2 * v - med2)))").alias("dv"),
    )
    mad4 = F.expr(
        "element_at(dv, cast((size(dv) + 1) div 2 as int))"
        " + element_at(dv, cast((size(dv) + 2) div 2 as int))"
    )
    return mad.select(
        F.col("g").alias("event_type"),
        "day",
        "cnt",
        "med2",
        "dev2",
        mad4.alias("mad4"),
        F.when(F.col("dev2") * 20000 > _HAMPEL_K_E4 * mad4, 1)
        .otherwise(0)
        .alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling over the pooled distinct-value spine
# ---------------------------------------------------------------------------

_ORACLE_AD = """
WITH x AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS s,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
d AS (
  SELECT v, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM x GROUP BY v
),
cum AS (
  SELECT v, c1, c2,
         SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS m1,
         SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS b
  FROM d
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 + c2) AS BIGINT) AS nn
  FROM d
),
terms AS (
  SELECT CAST(round((1.0 / n.n1 + 1.0 / n.n2) / n.nn
                    * (c1 + c2)
                    * (CAST(n.nn AS DOUBLE) * m1
                       - CAST(n.n1 AS DOUBLE) * b)
                    * (CAST(n.nn AS DOUBLE) * m1
                       - CAST(n.n1 AS DOUBLE) * b)
                    / (CAST(b AS DOUBLE) * (n.nn - b))
                    * 1000000000000.0) AS BIGINT) AS t_e12
  FROM cum, n WHERE b < n.nn
)
SELECT n.n1, n.n2,
       CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_distinct,
       CAST((SELECT SUM(t_e12) FROM terms) AS BIGINT) AS a2_e12,
       round(CAST((SELECT SUM(t_e12) FROM terms) AS DOUBLE)
             / 1000000000000.0, 6) AS a2_stat
FROM n
"""


@register(
    "ml_anderson_darling_2samp",
    oracle=_ORACLE_AD,
    tags=("ml", "stats"),
    doc=(
        "Two-sample Anderson-Darling statistic (Scholz-Stephens "
        "right-continuous form, tail-weighted where KS is not) between "
        "the click and view cents-value distributions: A2 = (1/n1 + "
        "1/n2)/N * sum_j l_j (N M_j - n1 B_j)^2 / (B_j (N - B_j)) over "
        "the pooled distinct-value spine with exact integer cumulative "
        "counts; each term's fixed-op-order double contribution is "
        "rounded to an e12 INTEGER before the cross-row sum, making "
        "accumulation order irrelevant in both engines.  One grouped "
        "count + one cumulative window, state bounded by the value "
        "vocabulary."
    ),
)
def ml_anderson_darling_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "v",
        "c1",
        "c2",
        F.sum("c1").over(wc).alias("m1"),
        F.sum(F.col("c1") + F.col("c2")).over(wc).alias("b"),
    )
    n = d.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") + F.col("c2")).cast("bigint").alias("nn"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    dd = F.col("nn").cast("double") * F.col("m1") - F.col("n1").cast(
        "double"
    ) * F.col("b")
    t_e12 = F.round(
        (1.0 / F.col("n1") + 1.0 / F.col("n2"))
        / F.col("nn")
        * (F.col("c1") + F.col("c2"))
        * dd
        * dd
        / (F.col("b").cast("double") * (F.col("nn") - F.col("b")))
        * 1000000000000.0
    ).cast("bigint")
    terms = (
        cum.join(F.broadcast(n), F.lit(True), "left")
        .where(F.col("b") < F.col("nn"))
        .select(t_e12.alias("t_e12"))
    )
    s = terms.agg(F.sum("t_e12").cast("bigint").alias("a2_e12"))
    return (
        n.join(F.broadcast(nd), F.lit(True), "left")
        .join(F.broadcast(s), F.lit(True), "left")
        .select(
            "n1",
            "n2",
            "n_distinct",
            "a2_e12",
            F.round(F.col("a2_e12").cast("double") / 1000000000000.0, 6).alias(
                "a2_stat"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Expected Reciprocal Rank with dyadic graded relevance
# ---------------------------------------------------------------------------

_ERR_QUERIES = 5
_ERR_K = 10

_ORACLE_ERR = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id < {_ERR_QUERIES}
),
c AS (
  SELECT vec_id AS did, label AS dlabel,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings
),
ranked AS (
  SELECT qid, qlabel, dlabel,
         round(list_dot_product(qv, dv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(dv, dv))), 6) AS cos6,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
           round(list_dot_product(qv, dv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(dv, dv))), 6) DESC, did) AS r
  FROM q, c WHERE qid <> did
),
graded AS (
  SELECT qid, r,
         CASE WHEN dlabel <> qlabel THEN 0
              WHEN cos6 >= 0.3 THEN 3
              WHEN cos6 >= 0.1 THEN 2
              ELSE 1 END AS g
  FROM ranked WHERE r <= {_ERR_K}
),
casc AS (
  SELECT qid, r, g,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
              OVER (PARTITION BY qid ORDER BY r
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS a7,
         CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END)
              OVER (PARTITION BY qid ORDER BY r
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS a5,
         CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END)
              OVER (PARTITION BY qid ORDER BY r
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS a1
  FROM graded
),
terms AS (
  SELECT qid,
         CAST(round(CAST((pow(2, g) - 1) AS DOUBLE) / 8.0
                    * pow(7, COALESCE(a7, 0)) * pow(5, COALESCE(a5, 0))
                    / pow(8, COALESCE(a7, 0) + COALESCE(a5, 0)
                          + COALESCE(a1, 0))
                    / r * 1000000000000.0) AS BIGINT) AS t_e12
  FROM casc
)
SELECT qid AS query_id,
       CAST(SUM(t_e12) AS BIGINT) AS err_e12,
       round(CAST(SUM(t_e12) AS DOUBLE) / 1000000000000.0, 6) AS err
FROM terms GROUP BY qid
"""


@register(
    "retrieval_err_eval",
    oracle=_ORACLE_ERR,
    tags=("retrieval", "eval"),
    doc=(
        f"Expected Reciprocal Rank @{_ERR_K} over the same pinned "
        "query vectors as the NDCG/MRR evals, with DYADIC graded "
        "relevance R = (2^g - 1)/8 (g from same-label + 6dp-cosine "
        "bands): the cascade continuation product prod(1 - R_i) is "
        "reconstructed EXACTLY as 7^(n_g1) * 5^(n_g2) / 8^(n_higher) "
        "from window counts of each grade at higher ranks — "
        "integer powers, never a running float product — and each "
        "rank's term is e12-fixed before the per-query sum.  The "
        "cascade-model cousin of NDCG that actually models early "
        "satisfaction; broadcast query side, top-k window, codegen "
        "arithmetic."
    ),
)
def retrieval_err_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _ERR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("did"),
        F.col("label").alias("dlabel"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("dv"),
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"
    cos6 = F.round(
        F.expr(dot.format(a="qv", b="dv"))
        / (
            F.sqrt(F.expr(dot.format(a="qv", b="qv")))
            * F.sqrt(F.expr(dot.format(a="dv", b="dv")))
        ),
        6,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("did"))
        .select("qid", "qlabel", "did", "dlabel", cos6.alias("cos6"))
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos6").desc(), F.col("did"))
    ranked = scored.withColumn("r", F.row_number().over(wr)).where(
        F.col("r") <= _ERR_K
    )
    graded = ranked.select(
        "qid",
        "r",
        F.when(F.col("dlabel") != F.col("qlabel"), 0)
        .when(F.col("cos6") >= 0.3, 3)
        .when(F.col("cos6") >= 0.1, 2)
        .otherwise(1)
        .alias("g"),
    )
    wp = (
        Window.partitionBy("qid")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    casc = graded.select(
        "qid",
        "r",
        "g",
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).over(wp).cast("bigint").alias("a7"),
        F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).over(wp).cast("bigint").alias("a5"),
        F.sum(F.when(F.col("g") == 3, 1).otherwise(0)).over(wp).cast("bigint").alias("a1"),
    )
    t_e12 = F.round(
        (F.pow(F.lit(2.0), F.col("g")) - 1).cast("double")
        / 8.0
        * F.pow(F.lit(7.0), F.coalesce(F.col("a7"), F.lit(0)))
        * F.pow(F.lit(5.0), F.coalesce(F.col("a5"), F.lit(0)))
        / F.pow(
            F.lit(8.0),
            F.coalesce(F.col("a7"), F.lit(0))
            + F.coalesce(F.col("a5"), F.lit(0))
            + F.coalesce(F.col("a1"), F.lit(0)),
        )
        / F.col("r")
        * 1000000000000.0
    ).cast("bigint")
    return (
        casc.select("qid", t_e12.alias("t_e12"))
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.sum("t_e12").cast("bigint").alias("err_e12"),
            F.round(
                F.sum("t_e12").cast("double") / 1000000000000.0, 6
            ).alias("err"),
        )
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift detector as an integer-state fold
# ---------------------------------------------------------------------------

_PH_DELTA_E6 = 1_000_000   # delta = 1 count of slack per step
_PH_LAMBDA_E6 = 20_000_000  # alarm when m - min(m) exceeds 20 counts

#: Five-cell BIGINT fold state: [t, sum, m_e6, min_m_e6, first_alarm_t].
#: The only non-integer op per step is round(1e6*x - 1e6*s/t) — one
#: correctly-rounded double expression on exact integers, identical
#: ARITHMETIC in both engines, immediately re-fixed to BIGINT.  The step
#: text is generated ONCE from this template; only the list-indexing
#: syntax differs per engine (Spark brackets are 0-based, DuckDB's are
#: 1-based, so both sides use their 1-based accessor explicitly).


def _ph_step(idx, x: str, arr_open: str, arr_close: str) -> str:
    """Fold-step lambda body; ``idx(i)`` renders 1-based element access,
    ``x`` the current element's value, ``arr_open``/``arr_close`` the
    engine's array constructor (DuckDB brackets, Spark array(...))."""
    t, sm, m, mn, al = (idx(i) for i in range(1, 6))
    m_new = (
        f"{m} + CAST(round(1000000.0 * {x} "
        f"- 1000000.0 * ({sm} + {x}) / ({t} + 1)) AS BIGINT) - {_PH_DELTA_E6}"
    )
    return (
        f"(acc, e) -> {arr_open}"
        f"{t} + 1, "
        f"{sm} + {x}, "
        f"{m_new}, "
        f"LEAST({mn}, {m_new}), "
        f"CASE WHEN {al} > 0 THEN {al} "
        f"WHEN {m_new} - LEAST({mn}, {m_new}) > {_PH_LAMBDA_E6} "
        f"THEN {t} + 1 ELSE 0 END"
        f"{arr_close}"
    )


_PH_STEP_DUCK = _ph_step(lambda i: f"acc[{i}]", "e[1]", "[", "]")
_PH_STEP_SPARK = _ph_step(
    lambda i: f"element_at(acc, {i})", "e", "array(", ")"
)

_ORACLE_PAGE_HINKLEY = f"""
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
ordered AS (
  SELECT g, list(x ORDER BY d) AS xs FROM daily GROUP BY g
),
folded AS (
  SELECT g,
         list_reduce(
           list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                         CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                         CAST(0 AS BIGINT)],
                        list_transform(xs, x -> [x, CAST(0 AS BIGINT),
                                                 CAST(0 AS BIGINT),
                                                 CAST(0 AS BIGINT),
                                                 CAST(0 AS BIGINT)])),
           {_PH_STEP_DUCK}) AS st
  FROM ordered
)
SELECT g AS event_type,
       st[1] AS n_days, st[2] AS total_events,
       st[3] AS m_e6, st[4] AS min_m_e6, st[5] AS first_alarm_day
FROM folded
"""


@register(
    "events_page_hinkley_fold",
    oracle=_ORACLE_PAGE_HINKLEY,
    tags=("events", "timeseries", "drift"),
    doc=(
        "Page-Hinkley sequential drift detector over each type's daily "
        "count series as a five-cell INTEGER fold [t, sum, m_e6, "
        "min_m_e6, first_alarm_t]: m accumulates e6-fixed deviations "
        "from the RUNNING mean (the one double expression per step is "
        "identical text in both engines and is immediately re-fixed to "
        "BIGINT), the running minimum rides in the state, and the alarm "
        "fires the first day m - min(m) exceeds lambda — the online "
        "sibling of the offline CUSUM/binseg changepoint queries.  One "
        "shuffle groups each series; at 100 TB the same recursion runs "
        "as streaming stateful-counter state."
    ),
)
def events_page_hinkley_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    ordered = daily.groupBy("g").agg(
        F.expr("transform(array_sort(collect_list(struct(d, x))), p -> p.x)")
        .alias("xs")
    )
    folded = ordered.select(
        "g",
        F.expr(
            "aggregate(xs, array(CAST(0 AS BIGINT), CAST(0 AS BIGINT), "
            "CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)), "
            + _PH_STEP_SPARK
            + ")"
        ).alias("st"),
    )
    return folded.select(
        F.col("g").alias("event_type"),
        F.element_at("st", 1).alias("n_days"),
        F.element_at("st", 2).alias("total_events"),
        F.element_at("st", 3).alias("m_e6"),
        F.element_at("st", 4).alias("min_m_e6"),
        F.element_at("st", 5).alias("first_alarm_day"),
    )
