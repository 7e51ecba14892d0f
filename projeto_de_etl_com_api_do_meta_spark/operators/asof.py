"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY §2.3 J5 family; the standard time-series primitive).

Spark-first formulation ("union trick"): tag both sides, union them, and
carry the latest right-side payload forward with ``last(..., ignorenulls)``
over a (key, ts, side) window.  ONE shuffle on the join key, no per-row
Python, no range cross-product — at 100 TB this is a single sort-partition
pass, versus the O(|L|·|R|) theta-join a naive ``ts_r <= ts_l`` predicate
would plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the most recent right row
    with ``right.ts <= left.ts`` and the same ``key`` (ties: the right row
    at exactly left.ts counts — right sorts before left at equal ts).

    ``tolerance_us`` nulls the payload when the matched right row is older
    than the given horizon (pandas ``merge_asof(tolerance=...)`` analog).
    """
    lcols = left.columns
    pay = [f"_r_{c}" for c in payload_cols]
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.unix_micros(F.col(ts)).alias("_r_ts_us"),
        *[F.col(c).alias(a) for c, a in zip(payload_cols, pay)],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_r_ts_us"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a) for c, a in zip(payload_cols, pay)],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[F.last(a, ignorenulls=True).over(w).alias(f"_c{a}") for a in pay],
        F.last("_r_ts_us", ignorenulls=True).over(w).alias("_c_ts_us"),
    ).where(F.col("_side") == 1)
    if tolerance_us is not None:
        stale = (F.unix_micros(F.col(ts)) - F.col("_c_ts_us")) > tolerance_us
        outs = [
            F.when(stale, F.lit(None)).otherwise(F.col(f"_c{a}")).alias(c)
            for c, a in zip(payload_cols, pay)
        ]
    else:
        outs = [F.col(f"_c{a}").alias(c) for c, a in zip(payload_cols, pay)]
    return carried.select(*lcols, *outs)
