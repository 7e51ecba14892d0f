"""Binned interval (range) join — the scale path for pure range predicates.

A join on ``r.ts ∈ [l.ts, l.ts + W)`` with no equi-key plans as a
BroadcastNestedLoop / cartesian in Spark — O(|L|·|R|). Binning converts it
to an equi-join: bucket both sides into W-wide time bins, replicate the
right side into the two bins its match could live in, equi-join on the bin,
then refine with the exact predicate.  Cost drops to O(matches + bin
collisions); replication factor is exactly 2 regardless of data size.
(Databricks' range-join "bin" hint and DuckDB's IEJoin solve the same
problem engine-side; here it's expressed relationally so any Spark runs it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    window_us: int = 300_000_000,
) -> DataFrame:
    """All (left, right) pairs with ``right.ts ∈ [left.ts, left.ts + W)``.

    Column names must be pre-disambiguated (no shared names except ``ts``,
    which is aliased per side)."""
    l = left.select(
        "*",
        F.floor(F.unix_micros(F.col(ts)) / window_us).alias("_bin"),
        F.unix_micros(F.col(ts)).alias("_l_us"),
    ).withColumnRenamed(ts, f"{ts}_left")
    r_base = right.select(
        "*", F.unix_micros(F.col(ts)).alias("_r_us")
    ).withColumnRenamed(ts, f"{ts}_right")
    # A right row at bin b can only match left rows in bins {b, b-1}.
    r = r_base.select(
        "*",
        F.explode(
            F.array(
                F.floor(F.col("_r_us") / window_us),
                F.floor(F.col("_r_us") / window_us) - 1,
            )
        ).alias("_bin"),
    )
    refined = (
        l.join(r, "_bin")
        .where(
            (F.col("_r_us") >= F.col("_l_us"))
            & (F.col("_r_us") < F.col("_l_us") + window_us)
        )
        .drop("_bin", "_l_us", "_r_us")
    )
    return refined
