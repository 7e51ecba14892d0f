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

#: Exact decimal sum rendered back to double, as SQL — via the same exact
#: integer path as safe_math.dec2d (DuckDB's decimal->double cast is off by
#: one ulp at large magnitudes; the long->double hardware conversion is not).
def dsum_sql(expr: str, digits: int = 2) -> str:
    scale = 10**digits
    return (
        f"(CAST(CAST(round(SUM({expr}), {digits}) * {scale} AS BIGINT) "
        f"AS DOUBLE) / {scale})"
    )


def dcol_sql(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,4))"
