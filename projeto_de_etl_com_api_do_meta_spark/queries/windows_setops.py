"""Window functions, dedup variants, sorts/limits, set operations
(SURVEY.md §2.7 W1/W2/O1/O2/U1/U2 + §2.4 A1/A2/A3 deterministic parity).

Every window has a total order (unique-key tie-break) so results are
deterministic and hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec2d
from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# -- W1: ranking + top-k per group --------------------------------------------

_ORACLE_TOPK = """
SELECT * FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         CAST(o_totalprice AS DOUBLE) AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rk,
         DENSE_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS drk
  FROM orders
) WHERE rn <= 3
"""


@register(
    "window_topk_per_group",
    oracle=_ORACLE_TOPK,
    tags=("window",),
    doc="row_number/rank/dense_rank + top-3-per-customer filter (W1, O2).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .where(F.col("rn") <= 3)
    )


# -- W2: running sum + lag/lead -----------------------------------------------

_ORACLE_RUNNING = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       (CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) * 100
            AS BIGINT) AS DOUBLE) / 100)
         AS running_spend,
       CAST(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
         AS prev_price,
       CAST(LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
         AS next_price
FROM orders
"""


@register(
    "window_running_lag_lead",
    oracle=_ORACLE_RUNNING,
    tags=("window",),
    doc="Running decimal-exact sum + lag/lead over an explicit frame (W2).",
)
def window_running_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        dec2d(F.sum(dec("o_totalprice")).over(wf)).alias("running_spend"),
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
    )


# -- W2: range frame (moving window by value distance) ------------------------

_ORACLE_RANGE_FRAME = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_no,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT d, n_orders,
       CAST(SUM(n_orders) OVER (ORDER BY day_no
                                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_orders_7d
FROM daily
"""


@register(
    "window_range_frame_7d",
    oracle=_ORACLE_RANGE_FRAME,
    tags=("window",),
    doc="RANGE frame: trailing-7-day order count over a daily series (W2).",
)
def window_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")).alias(
            "day_no"
        ),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("day_no").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "d", "n_orders", F.sum("n_orders").over(w).cast("long").alias("n_orders_7d")
    )


# -- A2 parity: deterministic keep-last dedup ---------------------------------

_ORACLE_KEEP_LAST = """
SELECT l_orderkey AS orderkey, l_linenumber AS last_linenumber,
       CAST(l_quantity AS DOUBLE) AS last_qty
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@register(
    "dedup_keep_last",
    oracle=_ORACLE_KEEP_LAST,
    tags=("dedup", "reference-parity"),
    doc=(
        "Deterministic keep-last dedup (reference A2, transform.py:97): "
        "drop_duplicates(keep='last') re-expressed as row_number over an "
        "explicit arrival order — the only distributed-correct form."
    ),
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures — the ordering
    # must cover every output column to stay deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").desc(), F.col("l_quantity").desc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("last_linenumber"),
            F.col("l_quantity").cast("double").alias("last_qty"),
        )
    )


# -- A1 parity: group-by first-non-null per column ----------------------------

_ORACLE_FIRST_NONNULL = """
WITH src AS (
  SELECT o_custkey,
         NULLIF(o_orderpriority, '1-URGENT') AS prio_nullable,
         o_orderdate, o_orderkey
  FROM orders
)
SELECT DISTINCT o_custkey AS custkey,
       FIRST_VALUE(prio_nullable IGNORE NULLS)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_priority
FROM src
"""


@register(
    "groupby_first_nonnull",
    oracle=_ORACLE_FIRST_NONNULL,
    tags=("agg", "reference-parity"),
    doc=(
        "Reference A1 parity (transform.py:105-106): pandas groupby().first() "
        "takes the first NON-NULL value per column per group; distributed-"
        "deterministic form = first(ignorenulls) over an explicit total order."
    ),
)
def groupby_first_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        "o_custkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_nullable"),
        "o_orderdate",
        "o_orderkey",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        src.select(
            F.col("o_custkey").alias("custkey"),
            F.first("prio_nullable", ignorenulls=True).over(w).alias("first_priority"),
        )
        .distinct()
    )


# -- A3: full-row distinct ----------------------------------------------------

_ORACLE_DISTINCT = """
SELECT DISTINCT l_returnflag AS returnflag, l_linestatus AS linestatus FROM lineitem
"""


@register(
    "dedup_distinct_pairs",
    oracle=_ORACLE_DISTINCT,
    tags=("dedup",),
    doc="Full-row distinct on a projection (reference A3, transform.py:137).",
)
def dedup_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).distinct()


# -- O1/O2: global sort + limit (deterministic total order) -------------------

_ORACLE_TOPN = """
SELECT o_orderkey AS orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register(
    "sort_limit_topn",
    oracle=_ORACLE_TOPN,
    tags=("sort",),
    doc="Global ORDER BY + LIMIT with unique tie-break (O1/O2; TakeOrdered).",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .limit(10)
    )


# -- U1: ragged union-by-name -------------------------------------------------

_ORACLE_UNION_NAME = """
SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS acctbal,
       'customer' AS src
FROM customer
UNION ALL
SELECT s_suppkey AS entity_key, s_name AS entity_name, NULL AS acctbal, 'supplier' AS src
FROM supplier
"""


@register(
    "union_by_name_ragged",
    oracle=_ORACLE_UNION_NAME,
    tags=("setop", "reference-parity"),
    doc=(
        "unionByName(allowMissingColumns=True) over ragged schemas — the "
        "reference's cross-page/cross-form concat (U1, extract.py:90-93)."
    ),
)
def union_by_name_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("src"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


# -- U2: intersect / except ---------------------------------------------------

_ORACLE_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register(
    "setop_intersect",
    oracle=_ORACLE_INTERSECT,
    tags=("setop",),
    doc="INTERSECT: nations having both customers and suppliers (U2).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


_ORACLE_EXCEPT = """
SELECT CAST(o_orderdate AS DATE) AS order_date FROM orders
WHERE year(o_orderdate) = 1995
EXCEPT
SELECT CAST(o_orderdate AS DATE) AS order_date FROM orders
WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6
"""


@register(
    "setop_except",
    oracle=_ORACLE_EXCEPT,
    tags=("setop",),
    doc="EXCEPT (set semantics, df.subtract): 1995-H2 order dates (U2).",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(F.col("o_orderdate").cast("date").alias("order_date"))
    y1995 = d.where(F.year("order_date") == 1995)
    h1 = d.where((F.year("order_date") == 1995) & (F.month("order_date") <= 6))
    return y1995.subtract(h1)


# -- Correlated subquery via Spark SQL ----------------------------------------

_SUBQ_SQL = """
SELECT c.c_custkey AS custkey, CAST(c.c_acctbal AS DOUBLE) AS acctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * (SELECT COUNT(*) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
"""


@register(
    "subquery_correlated",
    oracle=_SUBQ_SQL,
    tags=("sql", "subquery"),
    doc="Correlated scalar subquery (decorrelated by Catalyst into a join).",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SUBQ_SQL)


# -- R1 inverse: unpivot (wide metrics -> long) --------------------------------

_ORACLE_UNPIVOT = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS quantity,
         CAST(l_extendedprice AS DOUBLE) AS extendedprice,
         CAST(l_discount AS DOUBLE) AS discount
  FROM lineitem WHERE l_orderkey % 101 = 0
)
SELECT l_orderkey, l_linenumber, metric, value FROM base
UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
"""


@register(
    "restructure_unpivot",
    oracle=_ORACLE_UNPIVOT,
    tags=("restructure",),
    doc=(
        "Unpivot (inverse of the actions pivot R1): wide metric columns -> "
        "(metric, value) long form via stack — per-row expression, no shuffle."
    ),
)
def restructure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 101 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', CAST(l_quantity AS DOUBLE), "
            "'extendedprice', CAST(l_extendedprice AS DOUBLE), "
            "'discount', CAST(l_discount AS DOUBLE)) AS (metric, value)"
        ),
    )


# -- W1/W2: distribution window functions --------------------------------------

_ORACLE_DISTRIBUTION = """
SELECT c_custkey AS custkey,
       CAST(c_acctbal AS DOUBLE) AS acctbal,
       NTILE(4) OVER w AS quartile,
       round(CUME_DIST() OVER w, 6) AS cume,
       round(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@register(
    "window_distribution_funcs",
    oracle=_ORACLE_DISTRIBUTION,
    tags=("window",),
    doc="ntile/cume_dist/percent_rank over a total order (W1 family).",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# -- Ratio-to-report (share-of-total windows) ---------------------------------

_ORACLE_SHARE = """
SELECT o_custkey,
       o_orderkey,
       CAST(floor(
         CAST(o_totalprice AS DECIMAL(18,4)) * 1000000
         / SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey)
       ) AS BIGINT) AS share_ppm
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_share_of_total",
    oracle=_ORACLE_SHARE,
    tags=("window", "analytics"),
    doc=(
        "Ratio-to-report: each order's share of its customer's lifetime "
        "spend via an unordered partition window (one shuffle on the "
        "partition key, no sort — Spark plans an unbounded frame). Share "
        "emitted as floor parts-per-million over a decimal-exact "
        "numerator/denominator so both engines divide identical exact "
        "values and floor has no tie-mode to disagree on."
    ),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.safe_math import dec

    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    share = F.floor(
        dec("o_totalprice") * F.lit(1000000) / F.sum(dec("o_totalprice")).over(w)
    ).cast("long")
    return (
        orders.where(F.col("o_custkey") < 100)
        .select("o_custkey", "o_orderkey", share.alias("share_ppm"))
        .orderBy("o_custkey", "o_orderkey")
    )


# -- first/last/nth value windows ---------------------------------------------

_ORACLE_FIRST_LAST_NTH = """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_first_last_nth",
    oracle=_ORACLE_FIRST_LAST_NTH,
    tags=("window", "analytics"),
    doc=(
        "first_value/last_value/nth_value over an explicit full-partition "
        "frame (the default running frame makes last_value mean 'current "
        "row' — a classic correctness trap, so the frame is pinned to "
        "UNBOUNDED..UNBOUNDED on both engines). Total order on (date, "
        "key) keeps ties deterministic. Values pass through from the scan "
        "untouched — no arithmetic to diverge on."
    ),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.where(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# -- Rolling exact median over a trailing window -------------------------------

_ORACLE_ROLLING_MEDIAN = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(SUM(CAST(value AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       median(CAST(cents AS DOUBLE))
         OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
FROM daily
ORDER BY event_type, day
"""


@register(
    "window_rolling_median",
    oracle=_ORACLE_ROLLING_MEDIAN,
    tags=("window", "timeseries"),
    doc=(
        "Exact rolling median (trailing 7-row frame) of the daily value "
        "series per event type — percentile as a WINDOW aggregate, the "
        "robust-baseline primitive for anomaly detection. Runs on the "
        "pre-aggregated daily series (|types| x |days| rows), so the "
        "per-frame sort is over at most 7 values; integer cents in, exact "
        "half-integer double out on both engines."
    ),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    from ..functions.safe_math import dec

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum(dec("value")) * 100, 0).cast("long").alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.expr("percentile(CAST(cents AS DOUBLE), 0.5)").over(w).alias("med7"),
    ).orderBy("event_type", "day")


# -- Set ops with duplicate preservation (ALL variants) ------------------------

_ORACLE_SETOP_ALL = """
WITH a AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_linenumber <= 2),
     b AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_linenumber = 1)
SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
  SELECT k FROM a INTERSECT ALL SELECT k FROM b
) GROUP BY k
UNION ALL
SELECT 'except_all', k, COUNT(*) FROM (
  SELECT k FROM a EXCEPT ALL SELECT k FROM b
) GROUP BY k
ORDER BY op, k
"""


@register(
    "setop_intersect_except_all",
    oracle=_ORACLE_SETOP_ALL,
    tags=("setop",),
    doc=(
        "INTERSECT ALL / EXCEPT ALL (U2 completion): bag semantics — "
        "duplicates preserved up to multiplicity — which Spark plans as "
        "count-compare aggregates, not row-pair matching; results "
        "re-aggregated per key for a stable comparison form."
    ),
)
def setop_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linenumber") <= 2).select(
        (F.col("l_orderkey") % 100).alias("k")
    )
    b = li.where(F.col("l_linenumber") == 1).select(
        (F.col("l_orderkey") % 100).alias("k")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return inter.unionAll(exc).orderBy("op", "k")


_ORACLE_DIST_RANKS = """
SELECT o_orderpriority,
       o_orderkey,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM orders
WHERE o_orderkey < 640
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderpriority, o_orderkey
"""


@register(
    "window_distribution_ranks",
    oracle=_ORACLE_DIST_RANKS,
    tags=("window", "analytics"),
    doc=(
        "Distribution-rank window battery: percent_rank, cume_dist and "
        "ntile(4) per priority group over a total (price, key) order — "
        "the relative-standing trio (W1's remaining members) used for "
        "percentile-based cohorting. One shuffle on the partition key; "
        "the ORDER BY includes the key so every rank is a total order "
        "and engine-exact. Filter keeps the fixture window small; at "
        "scale these windows run per bounded partition, never globally."
    ),
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 640
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).orderBy("o_orderpriority", "o_orderkey")
