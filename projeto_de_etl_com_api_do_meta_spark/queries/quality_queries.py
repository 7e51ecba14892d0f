"""Data-quality registry queries (the reference README's declared next step,
README.md:150-153) — each check is one scan + one reduce, oracle-verified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..operators.quality import null_rate_report, referential_violations
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_NULL_RATES = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn_custkey,
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn_orderdate,
         SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn_totalprice
  FROM orders
)
SELECT col AS "column", n_rows, n_null,
       round(CAST(n_null AS DOUBLE) / n_rows, 6) AS null_rate
FROM agg
UNPIVOT (n_null FOR col IN (nn_custkey AS 'o_custkey',
                            nn_orderdate AS 'o_orderdate',
                            nn_totalprice AS 'o_totalprice'))
"""


@register(
    "dq_null_rates",
    oracle=_ORACLE_NULL_RATES,
    tags=("quality",),
    doc=(
        "Null-rate report over orders key columns: one conditional-count "
        "aggregation pass + unpivot (the reference's declared Great-"
        "Expectations-style next step, README.md:150-153)."
    ),
)
def dq_null_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return null_rate_report(orders, ["o_custkey", "o_orderdate", "o_totalprice"])


_ORACLE_REF_INTEGRITY = """
SELECT o.o_custkey, COUNT(*) AS n_orphan_rows
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
GROUP BY o.o_custkey
"""


@register(
    "dq_referential_integrity",
    oracle=_ORACLE_REF_INTEGRITY,
    tags=("quality",),
    doc=(
        "Referential-integrity check: orders whose custkey is missing from "
        "the positive-balance customer dimension (a deliberately partial "
        "dim, so violations exist) — broadcast left-anti join + count per "
        "orphan key."
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").where("c_acctbal > 0")
    return referential_violations(orders, "o_custkey", dim, "c_custkey")
