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


def grand_median2_spine(df, value_col: str, out_col: str = "m2"):
    """Exact integer ``2*grand-median`` (sum of the two middle order
    statistics) of an integral column WITHOUT sorting raw rows through a
    single partition: group to the distinct-value spine (bounded by the
    fixed-point vocabulary — the ml_auc_roc_exact contract), one
    cumulative-count window over THAT spine, and the middle order
    statistics are the spine rows whose inclusive count range
    ``(cum - c, cum]`` straddles ranks ``(n+1)//2`` / ``(n+2)//2``.
    Returns a 1-row DataFrame with BIGINT ``out_col`` — broadcast it onto
    the fact table for above/below splits."""
    from pyspark.sql import Window

    d = df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    wc = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = d.select(
        F.col(value_col).alias("_v"),
        "_c",
        F.sum("_c").over(wc).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(F.lit(1))).alias("_n"),
    )
    r1 = F.expr("(_n + 1) div 2")
    r2 = F.expr("(_n + 2) div 2")

    def holds(r):
        return (F.col("_cum") - F.col("_c") < r) & (r <= F.col("_cum"))

    return cum.agg(
        (
            F.sum(F.when(holds(r1), F.col("_v")).otherwise(0))
            + F.sum(F.when(holds(r2), F.col("_v")).otherwise(0))
        )
        .cast("bigint")
        .alias(out_col)
    )
