"""Round-10 exact-statistics operators.

Completes the nonparametric/psychometric family around the r9 additions
(ANOVA, Kruskal-Wallis, Friedman, Burrows):

* ``ml_cochran_q`` — Cochran's Q for k matched binary treatments.
* ``ml_cronbach_alpha`` — internal-consistency reliability over the
  user x event-type count matrix.
* ``ml_dixon_q_outlier`` — Dixon's Q ratio per segment from exact order
  statistics.
* ``ml_runs_test`` — Wald-Wolfowitz runs test on the daily-activity
  above/below-mean sign sequence.
* ``events_page_trend_test`` — Page's L for ordered alternatives (the
  trend-sensitive sibling of the Friedman test, same rank machinery).
* ``agg_hoover_index`` — the Hoover/Robin-Hood inequality index per
  segment as one exact integer ratio.

Determinism contract (the repo-wide pattern): every statistic reduces to
exact BIGINT moments/counts/rank-sums; at most ONE final float expression
(identical text in both engines, correctly-rounded IEEE ops only) renders
the headline number, rounded to 6 decimals.  Reference scope: [EXT]
SURVEY §6 analytics surface; the reference itself has no stats layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Cochran's Q (k matched binary treatments)
# ---------------------------------------------------------------------------

_ORACLE_COCHRAN = """
WITH x AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t1,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t2,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS t3
  FROM events
  GROUP BY user_id
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(t1) AS BIGINT) AS c1,
         CAST(SUM(t2) AS BIGINT) AS c2,
         CAST(SUM(t3) AS BIGINT) AS c3,
         CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS sum_r_sq,
         CAST(SUM(t1 + t2 + t3) AS BIGINT) AS n_success
  FROM x
)
SELECT n_users, c1, c2, c3, n_success, sum_r_sq,
       CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                 - n_success * n_success) AS BIGINT) AS q_num,
       CAST(3 * n_success - sum_r_sq AS BIGINT) AS q_den,
       round(CASE WHEN 3 * n_success - sum_r_sq = 0 THEN 0.0
                  ELSE CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                                 - n_success * n_success) AS DOUBLE)
                       / CAST(3 * n_success - sum_r_sq AS DOUBLE) END,
             6) AS q_stat
FROM agg
"""


@register(
    "ml_cochran_q",
    oracle=_ORACLE_COCHRAN,
    tags=("ml", "stats"),
    doc=(
        "Cochran's Q test for k=3 matched binary treatments (did the user "
        "ever click / purchase / view): Q = (k-1)(k*sum C_j^2 - N^2) / "
        "(k*N - sum R_i^2) — column totals, row-total squares and the "
        "success count are all exact BIGINTs from ONE user-grain "
        "aggregate, and the only float is the final ratio.  The "
        "k-treatment extension of McNemar (k=2 reduces to it), closing "
        "the matched-binary cell of the nonparametric family.  "
        "Map-side-combinable MAX/SUM aggregates; no windows, no joins."
    ),
)
def ml_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("t1"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "t2"
        ),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("t3"),
    )
    r = F.col("t1") + F.col("t2") + F.col("t3")
    agg = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("t1").cast("bigint").alias("c1"),
        F.sum("t2").cast("bigint").alias("c2"),
        F.sum("t3").cast("bigint").alias("c3"),
        F.sum(r * r).cast("bigint").alias("sum_r_sq"),
        F.sum(r).cast("bigint").alias("n_success"),
    )
    c_sq = (
        F.col("c1") * F.col("c1")
        + F.col("c2") * F.col("c2")
        + F.col("c3") * F.col("c3")
    )
    q_num = (2 * (3 * c_sq - F.col("n_success") * F.col("n_success"))).cast(
        "bigint"
    )
    q_den = (3 * F.col("n_success") - F.col("sum_r_sq")).cast("bigint")
    return agg.select(
        "n_users",
        "c1",
        "c2",
        "c3",
        "n_success",
        "sum_r_sq",
        q_num.alias("q_num"),
        q_den.alias("q_den"),
        F.round(
            F.when(q_den == 0, F.lit(0.0)).otherwise(
                q_num.cast("double") / q_den.cast("double")
            ),
            6,
        ).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha (internal consistency over the user x event-type matrix)
# ---------------------------------------------------------------------------

_ORACLE_CRONBACH = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY user_id, event_type
),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM events),
item AS (
  -- zero cells contribute 0 to both moments, so the sparse (user,type)
  -- table IS the full grid for sums
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS q
  FROM c GROUP BY event_type
),
itemvar AS (
  -- no GROUP BY: must yield exactly one row even over an EMPTY item table
  -- (zero-row parity: Spark's global agg always emits one row)
  SELECT CAST(SUM(n.n_users * q - s * s) AS BIGINT) AS sum_item_var_num
  FROM item, n
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(t * t) AS BIGINT) AS st2
  FROM (SELECT user_id, SUM(x) AS t FROM c GROUP BY user_id)
)
SELECT n.n_users, n.k, i.sum_item_var_num,
       CAST(n.n_users * tot.st2 - tot.st * tot.st AS BIGINT)
         AS total_var_num,
       round(CAST(n.k AS DOUBLE) / CAST(n.k - 1 AS DOUBLE)
             * (1.0 - CAST(i.sum_item_var_num AS DOUBLE)
                      / CAST(n.n_users * tot.st2 - tot.st * tot.st
                             AS DOUBLE)),
             6) AS alpha
FROM n, itemvar i, tot
"""


@register(
    "ml_cronbach_alpha",
    oracle=_ORACLE_CRONBACH,
    tags=("ml", "stats"),
    doc=(
        "Cronbach's alpha over the user x event-type count matrix (k=5 "
        "items): alpha = k/(k-1) * (1 - sum item-variances / total "
        "variance), with every variance carried as its exact integer "
        "numerator n*Sum(x^2) - Sum(x)^2 — zero cells contribute zero to "
        "both moments, so the SPARSE (user, type) aggregate is the full "
        "grid and no pivot/backfill is ever materialized.  One grouped "
        "count + two tiny aggregates; the only float is the final "
        "expression.  The reliability coefficient behind every "
        "multi-signal quality score the curation pipeline builds."
    ),
)
def ml_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    n = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    item = c.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    itemvar = (
        item.join(F.broadcast(n), F.lit(True), "left")
        .agg(
            F.sum(F.col("n_users") * F.col("q") - F.col("s") * F.col("s"))
            .cast("bigint")
            .alias("sum_item_var_num")
        )
    )
    tot = (
        c.groupBy("user_id")
        .agg(F.sum("x").alias("t"))
        .agg(
            F.sum("t").cast("bigint").alias("st"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias("st2"),
        )
    )
    total_var_num = (
        F.col("n_users") * F.col("st2") - F.col("st") * F.col("st")
    ).cast("bigint")
    return (
        n.join(F.broadcast(itemvar), F.lit(True), "left")
        .join(F.broadcast(tot), F.lit(True), "left")
        .select(
            "n_users",
            "k",
            "sum_item_var_num",
            total_var_num.alias("total_var_num"),
            F.round(
                F.col("k").cast("double")
                / (F.col("k") - 1).cast("double")
                * (
                    F.lit(1.0)
                    - F.col("sum_item_var_num").cast("double")
                    / total_var_num.cast("double")
                ),
                6,
            ).alias("alpha"),
        )
    )


# ---------------------------------------------------------------------------
# Dixon's Q outlier ratio per segment
# ---------------------------------------------------------------------------

_ORACLE_DIXON = """
WITH cents AS (
  SELECT c_mktsegment AS seg,
         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS x,
         c_custkey
  FROM customer
),
ranked AS (
  SELECT seg, x,
         row_number() OVER (PARTITION BY seg ORDER BY x, c_custkey) AS rn,
         row_number() OVER (PARTITION BY seg ORDER BY x DESC, c_custkey DESC)
           AS rn_d,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM cents
),
pick AS (
  SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(CASE WHEN rn = 1 THEN x END) AS BIGINT) AS x_min,
         CAST(MAX(CASE WHEN rn = 2 THEN x END) AS BIGINT) AS x_2,
         CAST(MAX(CASE WHEN rn_d = 2 THEN x END) AS BIGINT) AS x_n1,
         CAST(MAX(CASE WHEN rn_d = 1 THEN x END) AS BIGINT) AS x_max
  FROM ranked GROUP BY seg
)
SELECT seg, n, x_min, x_2, x_n1, x_max,
       round(CASE WHEN x_max = x_min THEN 0.0
                  ELSE CAST(x_2 - x_min AS DOUBLE)
                       / CAST(x_max - x_min AS DOUBLE) END, 6) AS q_low,
       round(CASE WHEN x_max = x_min THEN 0.0
                  ELSE CAST(x_max - x_n1 AS DOUBLE)
                       / CAST(x_max - x_min AS DOUBLE) END, 6) AS q_high
FROM pick ORDER BY seg
"""


@register(
    "ml_dixon_q_outlier",
    oracle=_ORACLE_DIXON,
    tags=("ml", "stats", "dq"),
    doc=(
        "Dixon's Q outlier ratio per market segment: gap-to-range ratios "
        "Q_low = (x(2)-x(1))/(x(n)-x(1)) and Q_high from EXACT order "
        "statistics (cent-integer balances; duplicate extremes handled by "
        "true rank-2 statistics, not min-of-greater hacks) — the "
        "small-sample outlier screen that needs no distributional "
        "parameters, and a pure rational so both engines agree "
        "bit-for-bit.  Two per-segment rank windows + one grouped pick; "
        "all state segment-partitioned."
    ),
)
def ml_dixon_q_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100.0, 0).cast("bigint").alias("x"),
        "c_custkey",
    )
    w_asc = Window.partitionBy("seg").orderBy("x", "c_custkey")
    w_dsc = Window.partitionBy("seg").orderBy(
        F.col("x").desc(), F.col("c_custkey").desc()
    )
    w_n = Window.partitionBy("seg")
    ranked = cust.select(
        "seg",
        "x",
        F.row_number().over(w_asc).alias("rn"),
        F.row_number().over(w_dsc).alias("rn_d"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    pick = ranked.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == 1, F.col("x"))).cast("bigint").alias("x_min"),
        F.max(F.when(F.col("rn") == 2, F.col("x"))).cast("bigint").alias("x_2"),
        F.max(F.when(F.col("rn_d") == 2, F.col("x")))
        .cast("bigint")
        .alias("x_n1"),
        F.max(F.when(F.col("rn_d") == 1, F.col("x")))
        .cast("bigint")
        .alias("x_max"),
    )
    rng = F.col("x_max") - F.col("x_min")
    return pick.select(
        "seg",
        "n",
        "x_min",
        "x_2",
        "x_n1",
        "x_max",
        F.round(
            F.when(rng == 0, F.lit(0.0)).otherwise(
                (F.col("x_2") - F.col("x_min")).cast("double")
                / rng.cast("double")
            ),
            6,
        ).alias("q_low"),
        F.round(
            F.when(rng == 0, F.lit(0.0)).otherwise(
                (F.col("x_max") - F.col("x_n1")).cast("double")
                / rng.cast("double")
            ),
            6,
        ).alias("q_high"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily-activity sign sequence
# ---------------------------------------------------------------------------

_ORACLE_RUNS = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(x) AS BIGINT) AS s
        FROM daily),
signed AS (
  SELECT d, CASE WHEN t.nd * x > t.s THEN 1 ELSE -1 END AS sgn
  FROM daily, tot t
  WHERE t.nd * x <> t.s
),
runs AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev
  FROM signed
),
agg AS (
  SELECT CAST(SUM(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM runs
)
SELECT r AS n_runs, n1, n2,
       round((CAST(r AS DOUBLE)
              - (2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE) + 1.0))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                       * CAST(n1 + n2 - 1 AS DOUBLE))),
             6) AS z_stat
FROM agg
"""


@register(
    "ml_runs_test",
    oracle=_ORACLE_RUNS,
    tags=("ml", "stats", "events"),
    doc=(
        "Wald-Wolfowitz runs test for randomness of the daily activity "
        "sequence: each day signs above/below the mean WITHOUT computing "
        "the mean as a float (n*x_d vs sum — exact integers; ties "
        "excluded, the standard treatment), runs counted with one lag "
        "window over the calendar-bounded daily spine, and the z "
        "statistic is one float expression over (R, n1, n2) using only "
        "correctly-rounded ops (sqrt included).  Detects serial "
        "dependence that autocorrelation-free summary stats miss."
    ),
)
def ml_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("x").cast("bigint").alias("s"),
    )
    signed = (
        daily.join(F.broadcast(tot), F.lit(True), "left")
        .where(F.col("nd") * F.col("x") != F.col("s"))
        .select(
            "d",
            F.when(F.col("nd") * F.col("x") > F.col("s"), 1)
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    # calendar-bounded global window (days in range), same contract as the
    # seasonal-decompose family
    w = Window.orderBy("d")
    runs = signed.select("sgn", F.lag("sgn").over(w).alias("prev"))
    agg = runs.agg(
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("sgn") != F.col("prev")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    nn = (n1 + n2).cast("double")
    two_n1n2 = F.lit(2.0) * n1 * n2
    return agg.select(
        r.alias("n_runs"),
        "n1",
        "n2",
        F.round(
            (r.cast("double") - (two_n1n2 / nn + F.lit(1.0)))
            / F.sqrt(
                two_n1n2
                * (two_n1n2 - (n1 + n2))
                / (nn * nn * (n1 + n2 - 1).cast("double"))
            ),
            6,
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Page's trend test (ordered alternatives across event types)
# ---------------------------------------------------------------------------

_ORACLE_PAGE = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
full_blocks AS (
  SELECT d FROM cells GROUP BY d
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM cells)
),
ranked AS (
  SELECT c.d, c.event_type,
         CAST(row_number() OVER (PARTITION BY c.d ORDER BY c.v, c.event_type)
              AS BIGINT) AS rk,
         CAST(dense_rank() OVER (ORDER BY c.event_type) AS BIGINT) AS j
  FROM cells c JOIN full_blocks f ON c.d = f.d
),
sums AS (
  SELECT j, CAST(SUM(rk) AS BIGINT) AS r_sum FROM ranked GROUP BY j
),
meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(j * r_sum) AS BIGINT) AS l_stat
  FROM sums
),
nblocks AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM full_blocks)
SELECT n.n AS n_blocks, m.k AS k_treatments, m.l_stat,
       CAST(n.n * m.k * (m.k + 1) * (m.k + 1) AS BIGINT) AS mu4_num,
       round((CAST(m.l_stat AS DOUBLE)
              - CAST(n.n * m.k * (m.k + 1) * (m.k + 1) AS DOUBLE) / 4.0)
             / sqrt(CAST(n.n AS DOUBLE) * m.k * m.k * (m.k + 1)
                    * (m.k * m.k - 1) / 144.0),
             6) AS z_stat
FROM meta m, nblocks n
"""


@register(
    "events_page_trend_test",
    oracle=_ORACLE_PAGE,
    tags=("events", "stats"),
    doc=(
        "Page's L trend test for ordered alternatives: days are blocks, "
        "event types (in their fixed alphabetical order as the a-priori "
        "ordering) are treatments, within-block ranks use the same "
        "PARTITIONED window machinery as ml_friedman_test, and "
        "L = sum j*R_j is an exact BIGINT.  Where Friedman only asks "
        "'do treatments differ', Page asks 'do they trend in THIS "
        "order' — strictly more power when an ordering is hypothesized. "
        "z from the exact L moments in one final float expression."
    ),
)
def events_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    k_types = cells.select("event_type").distinct().count()
    full_blocks = (
        cells.groupBy("d")
        .agg(F.count(F.lit(1)).alias("_k"))
        .where(F.col("_k") == k_types)
        .select("d")
    )
    w_rank = Window.partitionBy("d").orderBy("v", "event_type")
    w_j = Window.orderBy("event_type")
    ranked = (
        cells.join(full_blocks, "d")
        .select(
            "d",
            "event_type",
            F.row_number().over(w_rank).cast("bigint").alias("rk"),
            F.dense_rank().over(w_j).cast("bigint").alias("j"),
        )
    )
    sums = ranked.groupBy("j").agg(F.sum("rk").cast("bigint").alias("r_sum"))
    meta = sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("j") * F.col("r_sum")).cast("bigint").alias("l_stat"),
    )
    nblocks = full_blocks.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    k, n, l_stat = F.col("k"), F.col("n"), F.col("l_stat")
    mu4_num = (n * k * (k + 1) * (k + 1)).cast("bigint")
    return meta.join(F.broadcast(nblocks), F.lit(True), "left").select(
        n.alias("n_blocks"),
        k.alias("k_treatments"),
        "l_stat",
        mu4_num.alias("mu4_num"),
        F.round(
            (l_stat.cast("double") - mu4_num.cast("double") / F.lit(4.0))
            / F.sqrt(
                n.cast("double")
                * k
                * k
                * (k + 1)
                * (k * k - 1)
                / F.lit(144.0)
            ),
            6,
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Hoover / Robin Hood inequality index
# ---------------------------------------------------------------------------

_ORACLE_HOOVER = """
WITH cents AS (
  SELECT c_mktsegment AS seg,
         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS x
  FROM customer WHERE c_acctbal > 0
),
m AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM cents GROUP BY seg
)
SELECT c.seg, m.n, m.s,
       CAST(SUM(abs(m.n * c.x - m.s)) AS BIGINT) AS dev_num,
       round(CAST(SUM(abs(m.n * c.x - m.s)) AS DOUBLE)
             / (2.0 * m.n * m.s), 6) AS hoover
FROM cents c JOIN m USING (seg)
GROUP BY c.seg, m.n, m.s
ORDER BY c.seg
"""


@register(
    "agg_hoover_index",
    oracle=_ORACLE_HOOVER,
    tags=("agg", "stats", "bi"),
    doc=(
        "Hoover (Robin Hood) inequality index per segment: the share of "
        "total balance that would have to move to equalize everyone, "
        "computed WITHOUT a float mean — |n*x_i - S| keeps every "
        "deviation an exact BIGINT (the runs-test trick), so "
        "H = sum|n*x - S| / (2nS) is one final rational.  The "
        "rational-arithmetic sibling of agg_gini_inequality: no sort, no "
        "window, just one grouped aggregate after a broadcast of the "
        "per-segment (n, S) pair — cheaper than Gini at any scale and "
        "often the better dashboard number."
    ),
)
def agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cents = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100.0, 0).cast("bigint").alias("x"),
        )
    )
    m = cents.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    return (
        cents.join(F.broadcast(m), "seg")
        .groupBy("seg", "n", "s")
        .agg(
            F.sum(F.abs(F.col("n") * F.col("x") - F.col("s")))
            .cast("bigint")
            .alias("dev_num")
        )
        .select(
            "seg",
            "n",
            "s",
            "dev_num",
            F.round(
                F.col("dev_num").cast("double")
                / (F.lit(2.0) * F.col("n") * F.col("s")),
                6,
            ).alias("hoover"),
        )
        .orderBy("seg")
    )
