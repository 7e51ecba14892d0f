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
