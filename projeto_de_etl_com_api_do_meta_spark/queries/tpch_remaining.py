"""Remaining TPC-H-shaped analytics — completes the 22-query family.

The fixture star schema has no ``partsupp`` table and ``lineitem`` carries no
commitdate/receiptdate/shipmode, so the partsupp-dependent queries (q2, q11,
q16, q20) are adapted to use the *observed* part-supplier relation — the
distinct ``(l_partkey, l_suppkey)`` pairs from ``lineitem`` — and the
date-arithmetic queries (q4, q12, q21) substitute fixture columns
(``l_returnflag``/``o_orderpriority``) for the missing ones while keeping the
original relational shape: q2's correlated-min over a dimension subset, q4's
EXISTS semi-join, q9's multi-way profit expression, q11's HAVING vs a global
scalar, q12's conditional two-way counts, q16's NOT-IN + count-distinct,
q20's nested IN with a correlated quantity threshold, q21's EXISTS/NOT-EXISTS
self-join pair.

Scale notes (100 TB posture):
- ``nation``/``region``/``supplier``/``part`` are dimensions -> broadcast;
  only ``lineitem``(⋈``orders``) shuffles, on its natural keys.
- q2/q16/q20 reduce lineitem to distinct key pairs FIRST (map-side partial
  distinct -> tiny shuffle) before touching any dimension.
- q11's global total is a one-row aggregate broadcast into the HAVING
  comparison; the comparison is decimal-exact (integer multiple, no float
  threshold) so partitioning never flips a borderline row.
- q21's EXISTS/NOT-EXISTS pair is two aggregated semi-structures on the
  same ``l_orderkey`` key: computed as one groupBy over lineitem (count of
  other-supplier lines, count of other-supplier 'R' lines) and joined once,
  instead of two per-row correlated probes.
- All monetary sums go through the exact decimal path (safe_math.dec*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec2d
from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import REVENUE_SQL, dsum_sql, revenue
from .registry import register

# ---------------------------------------------------------------------------
# Q2 — min-acctbal supplier per part (correlated min over a regional subset).
# ---------------------------------------------------------------------------

_PS_PAIRS_SQL = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"

_Q2_ORACLE = f"""
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
FROM part p, supplier s, nation n, region r, {_PS_PAIRS_SQL} ps
WHERE p.p_partkey = ps.l_partkey AND s.s_suppkey = ps.l_suppkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE' AND p.p_type = 'LARGE'
  AND p.p_size BETWEEN 10 AND 30
  AND s.s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM supplier s2, nation n2, region r2, {_PS_PAIRS_SQL} ps2
    WHERE ps2.l_partkey = p.p_partkey AND s2.s_suppkey = ps2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("join", "subquery", "tpch"),
    doc=(
        "TPC-H Q2 shape on the observed part-supplier relation: per part, "
        "the EUROPE supplier with minimum account balance (correlated min "
        "done as a window over one shuffle, not a self-join)."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp_eu = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 30)
        )
    )
    w = Window.partitionBy("l_partkey")
    eu_pairs = (
        pairs.join(supp_eu, pairs.l_suppkey == supp_eu.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
    )
    return (
        eu_pairs.join(part, eu_pairs.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS semi-join).
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q4_order_priority",
    oracle=_Q4_ORACLE,
    tags=("join", "semi", "tpch"),
    doc=(
        "TPC-H Q4 shape: orders in a quarter having at least one returned "
        "line (EXISTS -> left_semi join), counted per priority. The lineitem "
        "side is pre-filtered and projected to the join key before the "
        "shuffle, so the semi-join moves keys only."
    ),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year.
# ---------------------------------------------------------------------------

_COST_SQL = "CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))"

_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       {dsum_sql(f"{REVENUE_SQL} - {_COST_SQL}")} AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


@register(
    "q9_product_profit",
    oracle=_Q9_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q9 shape: profit = revenue - retailprice*quantity (fixture "
        "has no ps_supplycost) per (supplier nation, order year) for parts "
        "matching a name substring. part/supplier/nation broadcast; the "
        "part filter prunes lineitem before the orders shuffle join."
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = revenue() - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dec2d(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important parts by value within one nation (HAVING vs global scalar).
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH natline AS (
  SELECT l.l_partkey, {REVENUE_SQL} AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3')
SELECT l_partkey AS p_key, {dsum_sql("v")} AS part_value
FROM natline
GROUP BY l_partkey
HAVING SUM(v) * 500 > (SELECT SUM(v) FROM natline)
ORDER BY part_value DESC, p_key
"""


@register(
    "q11_important_parts",
    oracle=_Q11_ORACLE,
    tags=("agg", "subquery", "tpch"),
    doc=(
        "TPC-H Q11 shape: per-part revenue within one nation, kept when it "
        "exceeds 1/500 of the nation total. The global total is a one-row "
        "aggregate cross-joined (broadcast) into the filter; the comparison "
        "multiplies the exact decimal by an integer — no float threshold, "
        "so borderline parts can't flip between engines."
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    )
    natline = (
        load_table(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), revenue().alias("v"))
    )
    per_part = natline.groupBy("l_partkey").agg(F.sum("v").alias("value_dec"))
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_dec") * 500 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("p_key"),
            dec2d(F.col("value_dec")).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_key")
    )


# ---------------------------------------------------------------------------
# Q12 — priority classes per line status (conditional two-way counts).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register(
    "q12_priority_by_status",
    oracle=_Q12_ORACLE,
    tags=("join", "agg", "tpch"),
    doc=(
        "TPC-H Q12 shape (shipmode -> l_linestatus): lines shipped in a "
        "year, split per status into high/low priority counts via "
        "conditional sums. Projected to 3 columns before the join shuffle."
    ),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts per part attribute (NOT IN + count-distinct).
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM {_PS_PAIRS_SQL} ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "q16_supplier_part_counts",
    oracle=_Q16_ORACLE,
    tags=("agg", "anti", "tpch"),
    doc=(
        "TPC-H Q16 shape: distinct supplier count per (brand, type, size) "
        "over the observed part-supplier pairs, excluding flagged suppliers "
        "(NOT IN -> broadcast left_anti). Pairs are distinct-ed map-side "
        "before any dimension join."
    ),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    flagged = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(flagged, pairs.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers shipping excess quantity of selected parts (nested IN).
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 50)
ORDER BY s.s_name
"""


@register(
    "q20_excess_shippers",
    oracle=_Q20_ORACLE,
    tags=("semi", "subquery", "tpch"),
    doc=(
        "TPC-H Q20 shape: ASIA suppliers who shipped > 50 units of "
        "red-named parts in 1997 (nested IN -> broadcast semi-join into a "
        "grouped HAVING, then semi-join back to the supplier dimension). "
        "Quantity sums are integer-valued doubles — exact under 2^53."
    ),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    red_parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(heavy, F.col("s_suppkey") == heavy.l_suppkey, "left_semi")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept finished orders waiting (EXISTS / NOT EXISTS).
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_ORACLE,
    tags=("join", "anti", "tpch"),
    doc=(
        "TPC-H Q21 shape: the only supplier in a finished order whose lines "
        "were returned. The EXISTS/NOT-EXISTS pair over other suppliers of "
        "the same order is computed as ONE aggregation of lineitem per "
        "(orderkey, suppkey) — distinct supplier count and per-flag "
        "supplier sets — then joined once, instead of two correlated "
        "probes re-shuffling lineitem twice."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # ONE scan of lineitem, reduced to (orderkey, suppkey) grain first — a
    # map-side-combinable aggregate — then the EXISTS / NOT-EXISTS pair
    # becomes a window over the reduced grain: n_supps (any other supplier
    # line exists) and n_r_supps (no other supplier had a returned line).
    # No countDistinct expand, no second scan, no row-level join-back: the
    # qualifying supplier's returned-row count (what the oracle's count(*)
    # over l1 rows measures) is carried as n_r_lines and summed at the end.
    os_stats = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("n_r_lines")
    )
    w = Window.partitionBy("l_orderkey")
    enriched = os_stats.select(
        "l_orderkey",
        "l_suppkey",
        "n_r_lines",
        F.count(F.lit(1)).over(w).alias("n_supps"),
        F.sum((F.col("n_r_lines") > 0).cast("int")).over(w).alias("n_r_supps"),
    )
    orders_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    supp_eu = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    waiting = (
        enriched
        # this supplier has returned lines; some OTHER supplier line exists;
        # NO other supplier has a returned line (this is the only 'R' one).
        .where(
            (F.col("n_r_lines") > 0)
            & (F.col("n_supps") > 1)
            & (F.col("n_r_supps") == 1)
        )
        .join(
            orders_f.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .join(supp_eu, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.sum("n_r_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
