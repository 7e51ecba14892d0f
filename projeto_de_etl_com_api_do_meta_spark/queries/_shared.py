"""Shared expression fragments used across registry queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.safe_math import dec

#: Exact decimal revenue term: extendedprice * (1 - discount).
def revenue():
    one = F.lit(1).cast("decimal(18,4)")
    return dec("l_extendedprice") * (one - dec("l_discount"))


#: DuckDB SQL fragment matching ``revenue()`` exactly.
REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
)

#: Exact decimal sum rendered back to double, as SQL.
def dsum_sql(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE)"


def dcol_sql(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,4))"
