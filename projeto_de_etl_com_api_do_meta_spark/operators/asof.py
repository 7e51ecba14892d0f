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
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the payload of the nearest right row with
    the same ``key``: ``direction="backward"`` takes the most recent right
    row with ``right.ts <= left.ts`` (ties: the right row at exactly left.ts
    counts — right sorts before left at equal ts); ``direction="forward"``
    takes the earliest right row with ``right.ts >= left.ts`` (a right row
    at exactly left.ts counts — it sorts after left at equal ts).

    ``tolerance_us`` nulls the payload when the matched right row is further
    than the given horizon (pandas ``merge_asof(tolerance=...)`` analog).

    Both directions are the same one-shuffle union+carry window pass; only
    the frame flips (carry-forward ``last`` vs carry-backward ``first``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    pay = [f"_r_{c}" for c in payload_cols]
    back = direction == "backward"
    # backward: right sorts BEFORE left at equal ts (right=0, left=1);
    # forward: right sorts AFTER left at equal ts (left=0, right=1).
    r_side, l_side = (0, 1) if back else (1, 0)
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(r_side).alias("_side"),
        F.unix_micros(F.col(ts)).alias("_r_ts_us"),
        *[F.col(c).alias(a) for c, a in zip(payload_cols, pay)],
    )
    l = left.select(
        "*",
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("long").alias("_r_ts_us"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a) for c, a in zip(payload_cols, pay)],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # Carry ONE struct of (ts, all payload fields), not per-column
    # last(ignorenulls): a right row whose payload VALUE is legitimately
    # NULL must still win the carry as a whole row — per-column skipping
    # spliced field values from DIFFERENT right rows (found by the r8
    # degenerate-fixture differ: a NULL view_value took the view_id of
    # the nearest row but the value of an older one).  The struct wrapper
    # is non-null for every right row, so ignorenulls only skips LEFT
    # rows, never a null field.
    pay_struct = F.when(
        F.col("_side") == r_side,
        F.struct(F.col("_r_ts_us").alias("ts_us"), *[F.col(a) for a in pay]),
    )  # otherwise NULL (left rows)
    # Tie contract: several right rows at the SAME timestamp resolve to
    # the GREATEST payload struct (lexicographic over (ts, payload...)) in
    # BOTH directions — without an explicit intra-ts order the winner was
    # partitioning-dependent (r8 degenerate-fixture2: three views at one
    # instant matched different rows across engines).  backward scans
    # ascending and takes last(), so _pay orders ASC; forward scans from
    # the current row and takes first(), so _pay orders DESC — both land
    # on the max struct.
    if back:
        base = Window.partitionBy(key).orderBy(
            F.col(ts), F.col("_side"), F.col("_pay").asc()
        )
        w = base.rowsBetween(Window.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        base = Window.partitionBy(key).orderBy(
            F.col(ts), F.col("_side"), F.col("_pay").desc()
        )
        w = base.rowsBetween(0, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    carried = (
        u.withColumn("_pay", pay_struct)
        .select("*", pick("_pay").over(w).alias("_c_pay"))
        .where(F.col("_side") == l_side)
    )
    if tolerance_us is not None:
        gap = (
            (F.unix_micros(F.col(ts)) - F.col("_c_pay.ts_us"))
            if back
            else (F.col("_c_pay.ts_us") - F.unix_micros(F.col(ts)))
        )
        outs = [
            F.when(gap > tolerance_us, F.lit(None))
            .otherwise(F.col(f"_c_pay.{a}"))
            .alias(c)
            for c, a in zip(payload_cols, pay)
        ]
    else:
        outs = [F.col(f"_c_pay.{a}").alias(c) for c, a in zip(payload_cols, pay)]
    return carried.select(*lcols, *outs)
