"""Extended TPC-H-shaped analytics (SURVEY.md §2.10 breadth).

Adapted to the driver fixture schemas (no partsupp table; lineitem carries
no commitdate/receiptdate/shipmode), these queries exercise the relational
shapes the first five flagships do not: disjunctive multi-nation join
predicates (q7), conditional market-share aggregation (q8), outer-join
histograms (q13), conditional-ratio aggregation (q14), aggregate-of-aggregate
top-1 selection (q15), correlated scalar subqueries (q17), IN-subquery with
HAVING (q18), disjunctive join filters (q19), and NOT EXISTS anti-join with a
scalar threshold subquery (q22).

Scale notes: nation/region/supplier/part are dimension tables -> broadcast
(J4); lineitem⋈orders stays a shuffle join on the co-partitioned order key;
every monetary aggregate goes through decimal-exact summation
(functions.safe_math) so results are bit-identical to the DuckDB oracle
regardless of partitioning / execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec2d, dec_sum, safe_div
from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import REVENUE_SQL, dcol_sql, dsum_sql, revenue
from .registry import register

# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {dsum_sql(REVENUE_SQL)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping",
    oracle=_Q7_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q7-shaped volume shipping: 6-way join with a disjunctive "
        "nation-pair predicate, grouped exact revenue by (supp, cust, year)."
    ),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dec2d(F.sum(revenue())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share inside a region, by year.
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
WITH all_orders AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         {REVENUE_SQL} AS volume,
         n1.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'EUROPE'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1998-01-01'
)
SELECT o_year,
       {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END")}
       / {dsum_sql("volume")} AS mkt_share
FROM all_orders
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q8_market_share",
    oracle=_Q8_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q8-shaped market share: 8-way join, conditional exact "
        "revenue share of one supplier nation within a customer region."
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n2 = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(F.col("n_nationkey").alias("n2_key"))
    )
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    vol = revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dec2d(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                    )
                )
                / dec2d(F.sum(vol))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer-join histogram).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q13-shaped customer distribution: left outer join with an "
        "extra join predicate, per-customer counts, then a histogram of the "
        "counts (two-level aggregation)."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional ratio over one month).
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT 100.0 * {dsum_sql(f"CASE WHEN p.p_type = 'PROMO' THEN {REVENUE_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END")}
       / {dsum_sql(REVENUE_SQL)} AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@register(
    "q14_promo_effect",
    oracle=_Q14_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q14-shaped promotion effect: broadcast part join, "
        "conditional exact-revenue ratio over one ship month."
    ),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    zero = F.lit(0).cast("decimal(18,4)")
    vol = revenue()
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0)
            * dec2d(F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)))
            / dec2d(F.sum(vol))
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (aggregate-of-aggregate top-1).
# ---------------------------------------------------------------------------

_Q15_REV = f"""
  SELECT l_suppkey AS supplier_no,
         {dsum_sql(REVENUE_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
"""

_Q15_ORACLE = f"""
WITH revenue_q AS ({_Q15_REV})
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue_q r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue_q)
ORDER BY s.s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    tags=("join", "agg", "subquery", "tpch"),
    doc=(
        "TPC-H Q15-shaped top supplier: per-supplier quarterly exact "
        "revenue, then select the max via a broadcast scalar join (the "
        "view + scalar-subquery shape, without a single-partition window)."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec2d(F.sum(revenue())).alias("total_revenue"))
    )
    # Scalar max as a 1-row broadcast cross join: no single-partition window,
    # and the per-supplier aggregate is computed once (Catalyst reuses the
    # exchange for both branches).
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        rev.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated scalar subquery).
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT {dsum_sql(dcol_sql("l.l_extendedprice"))} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND p.p_type = 'SMALL'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register(
    "q17_small_qty_revenue",
    oracle=_Q17_ORACLE,
    tags=("join", "agg", "subquery", "tpch"),
    doc=(
        "TPC-H Q17-shaped small-quantity revenue: correlated per-part "
        "average-quantity subquery, decorrelated in Spark as an aggregate "
        "join (the plan Catalyst/DuckDB both rewrite to)."
    ),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
        )
    )
    # Decorrelated inner: per-part avg over ALL lineitems of that part
    # (l_quantity is integer-valued, so the double sum is exact and
    # order-insensitive; avg = sum/count is deterministic on both engines).
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dec_sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (IN subquery over HAVING).
# ---------------------------------------------------------------------------

_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
       {dsum_sql(dcol_sql("l.l_quantity"))} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register(
    "q18_large_volume_customers",
    oracle=_Q18_ORACLE,
    tags=("join", "agg", "subquery", "tpch"),
    doc=(
        "TPC-H Q18-shaped large-volume customers: IN-subquery with HAVING "
        "expressed as a semi join against the aggregated order keys, then "
        "the detail join + group-by + deterministic top-100."
    ),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            big_orders, orders.o_orderkey == F.col("big_orderkey"), "left_semi"
        )
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(dec_sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive join predicates).
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {dsum_sql(REVENUE_SQL)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register(
    "q19_discounted_revenue",
    oracle=_Q19_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q19-shaped discounted revenue: broadcast hash join with a "
        "3-way disjunctive residual predicate mixing both sides."
    ),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dec2d(F.sum(revenue())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (NOT EXISTS + scalar threshold).
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT c.c_mktsegment,
       COUNT(*) AS numcust,
       {dsum_sql(dcol_sql("c.c_acctbal"))} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {dsum_sql(dcol_sql("c2.c_acctbal"), 4)} / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= DATE '2000-01-01'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register(
    "q22_dormant_customers",
    oracle=_Q22_ORACLE,
    tags=("join", "agg", "subquery", "tpch"),
    doc=(
        "TPC-H Q22-shaped dormant customers: scalar average-balance "
        "threshold subquery (exact decimal mean) + NOT EXISTS recent-order "
        "anti join, grouped by market segment."
    ),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # Exact decimal mean -> identical threshold double on both engines.
    thr = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (dec_sum("c_acctbal", digits=4) / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
