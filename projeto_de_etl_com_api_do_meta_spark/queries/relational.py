"""Relational core queries (SURVEY.md §2.2-§2.7).

Every query is ANSI-safe and timezone-pinned, and every monetary aggregate
goes through decimal-exact summation (see functions.safe_math) so results are
bit-identical to the DuckDB oracle regardless of distributed execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec_sum, safe_div
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
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
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
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
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
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_revenue,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
  COUNT(*) AS total_lines,
  COALESCE(CASE WHEN SUM(CAST(l.l_quantity AS DECIMAL(18,4))) <> 0 THEN
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
    / CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
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
            F.sum(revenue).cast("double").alias("total_revenue"),
            dec_sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("total_lines"),
        )
    )
    return grouped.withColumn(
        "revenue_per_unit", safe_div(F.col("total_revenue"), F.col("total_qty"))
    )
