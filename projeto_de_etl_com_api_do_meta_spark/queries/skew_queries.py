"""Skew-mitigation registry queries: results must be IDENTICAL to the naive
plans (the oracle runs the naive SQL), only the shuffle layout differs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.skew import salted_join, skew_safe_count_distinct
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_SALTED = """
SELECT o.o_orderkey, o.o_orderstatus, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 7 = 0
"""


@register(
    "join_salted_skew",
    oracle=_ORACLE_SALTED,
    tags=("join", "skew", "scale"),
    doc=(
        "Salted equi-join (hot-key mitigation): skewed side's key widened "
        "with an 8-way content-hash salt, small side replicated 8x — same "
        "rows as the plain join (oracle is the naive SQL), no straggler "
        "reducer."
    ),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_orderstatus", F.col("o_custkey").alias("c_custkey"))
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return salted_join(orders, customer, key="c_custkey", num_salts=8).select(
        "o_orderkey", "o_orderstatus", "c_name", "c_mktsegment"
    )


_ORACLE_SKEW_DISTINCT = """
SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_distinct
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_skew_safe_distinct",
    oracle=_ORACLE_SKEW_DISTINCT,
    tags=("agg", "skew", "scale"),
    doc=(
        "Two-phase exact count-distinct per hot key (3 returnflag groups "
        "hold ALL rows): distinct on (key, value) spreads each hot key "
        "across the cluster before the per-key count."
    ),
)
def agg_skew_safe_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return skew_safe_count_distinct(li, "l_returnflag", "l_suppkey")


_SKEW_REPORT_TOPK = 10

_ORACLE_SKEW_REPORT = f"""
WITH per_key AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n_keys, SUM(cnt) AS total FROM per_key
)
SELECT p.o_custkey, p.cnt,
       CAST((p.cnt * 10000) // s.total AS BIGINT) AS share_bp,
       CAST((p.cnt * s.n_keys * 10000) // s.total AS BIGINT) AS vs_mean_bp
FROM per_key p CROSS JOIN stats s
ORDER BY p.cnt DESC, p.o_custkey
LIMIT {_SKEW_REPORT_TOPK}
"""


@register(
    "dq_key_skew_report",
    oracle=_ORACLE_SKEW_REPORT,
    tags=("dq", "skew", "scale"),
    doc=(
        "Key-skew diagnostic: per-key row counts for a prospective "
        "join/agg key (orders.o_custkey), reported as the top-10 hottest "
        "keys with their share of all rows and their ratio to the mean "
        "key's count (both in integer basis points — exact BIGINT "
        "arithmetic, no float hash hazard). The report a pipeline runs "
        "BEFORE picking a shuffle strategy: vs_mean_bp >> 10000 on a top "
        "key says 'salt this join or enable AQE skew handling'. One "
        "map-side-combined count per key + a 2-value scalar broadcast + "
        "TakeOrderedAndProject — the diagnostic itself never suffers the "
        "skew it measures, because partial aggregation collapses hot keys "
        "per partition before the shuffle."
    ),
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_report

    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return key_skew_report(orders, "o_custkey", top_k=_SKEW_REPORT_TOPK)
