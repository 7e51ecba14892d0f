"""Relational core queries (SURVEY.md §2.2-§2.7).

Every query is ANSI-safe and timezone-pinned, and every monetary aggregate
goes through decimal-exact summation (see functions.safe_math) so results are
bit-identical to the DuckDB oracle regardless of distributed execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec2d, dec_sum, safe_div
from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan -> filter -> hash agg -> derived -> sort).
# Exercises SURVEY §2 A4/A5 (grouped sums), D1-adjacent averages, O1 sort.
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  (CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS sum_qty,
  (CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS sum_base_price,
  (CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS sum_disc_price,
  (CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) / COUNT(*) AS avg_qty,
  (CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    oracle=_Q1_ORACLE,
    tags=("agg", "flagship"),
    doc="TPC-H Q1-shaped pricing summary: filter + grouped exact sums + avgs.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec2d(F.sum(disc_price)).alias("sum_disc_price"),
            (dec2d(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
            (dec2d(F.sum(dec("l_extendedprice"))) / cnt).alias("avg_price"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Reference performance-pipeline shape (SURVEY §3 entry point 1): daily-grain
# fact with safe-ratio derived metrics (D1: x/0 -> 0, 0/0 -> 0).
# ---------------------------------------------------------------------------

_PERF_ORACLE = """
SELECT
  CAST(o.o_orderdate AS DATE) AS order_date,
  o.o_orderpriority AS priority,
  (CAST(CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_revenue,
  (CAST(CAST(round(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_qty,
  COUNT(*) AS total_lines,
  COALESCE(CASE WHEN SUM(CAST(l.l_quantity AS DECIMAL(18,4))) <> 0 THEN
    (CAST(CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100)
    / (CAST(CAST(round(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100)
  END, 0.0) AS revenue_per_unit
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY CAST(o.o_orderdate AS DATE), o.o_orderpriority
"""


@register(
    "perf_daily_fact",
    oracle=_PERF_ORACLE,
    tags=("join", "agg", "safe_div"),
    doc=(
        "Reference campaign-performance shape (transform.py:101-117 analog): "
        "scan -> join -> daily-grain grouped sums -> safe-div ratio metrics."
    ),
)
def perf_daily_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    grouped = (
        orders.join(li, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            dec2d(F.sum(revenue)).alias("total_revenue"),
            dec_sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("total_lines"),
        )
    )
    return grouped.withColumn(
        "revenue_per_unit", safe_div(F.col("total_revenue"), F.col("total_qty"))
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped breadth: Q3 (shipping priority), Q6 (forecast revenue),
# Q10 (returned items) — multi-join + agg + top-k, pure-filter agg, and
# join-heavy group-by respectively.
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       (CAST(CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""


@register(
    "q3_shipping_priority",
    oracle=_Q3_ORACLE,
    tags=("join", "agg", "flagship"),
    doc=(
        "TPC-H Q3-shaped shipping priority: 3-way join + grouped exact "
        "revenue + deterministic top-10."
    ),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,4)")
    revenue = F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec2d(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


_Q6_ORACLE = """
SELECT (CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_discount AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    tags=("agg", "flagship"),
    doc=(
        "TPC-H Q6-shaped forecast revenue: pure pushed-down filter + single "
        "exact aggregate — the all-pushdown plan."
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec2d(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue")
        )
    )


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       (CAST(CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1995-10-01'
  AND o.o_orderdate < DATE '1996-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    tags=("join", "agg", "flagship"),
    doc=(
        "TPC-H Q10-shaped returned-item report: 4-way join (nation "
        "broadcast) + grouped exact revenue + deterministic top-20."
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    one = F.lit(1).cast("decimal(18,4)")
    revenue = F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec2d(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# ---------------------------------------------------------------------------
# SQL front-end: the same engine through spark.sql over registered views.
# ---------------------------------------------------------------------------

_SQL_TEXT = """
SELECT n.n_name AS nation,
       COUNT(DISTINCT c.c_custkey) AS n_customers,
       COUNT(o.o_orderkey) AS n_orders
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY n.n_name
"""


@register(
    "sql_interface_demo",
    oracle=_SQL_TEXT,
    tags=("sql", "interface"),
    doc=(
        "SQL front-end: identical ANSI text executed by spark.sql over "
        "registered temp views AND by the DuckDB oracle — same string, two "
        "engines, same result (Catalyst parses/optimizes it like any "
        "DataFrame plan)."
    ),
)
def sql_interface_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import register_all

    pin_query_session_conf(spark)
    register_all(spark, sf_dir)
    return spark.sql(_SQL_TEXT)


_SQL_RECURSIVE = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1996-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('1996-12-01' AS DATE)
)
SELECT months.m AS month_start, COUNT(o.o_orderkey) AS n_orders
FROM months
LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
GROUP BY months.m
ORDER BY months.m
"""


@register(
    "sql_recursive_cte",
    oracle=_SQL_RECURSIVE,
    tags=("sql", "interface"),
    doc=(
        "Recursive CTE (Spark 4 WITH RECURSIVE): a 12-month spine "
        "generated by recursion, left-joined to orders for a "
        "zero-preserving monthly series. The identical SQL text runs on "
        "DuckDB as the oracle. (Each recursion step is a distributed "
        "sub-plan, so depth is kept to the spine size, not the data size "
        "— data-sized iteration belongs in the min-label-propagation "
        "loop, see dedup_cluster_components.)"
    ),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import register_all

    pin_query_session_conf(spark)
    register_all(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE)
