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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bucket_width: int,
) -> DataFrame:
    """All (left, right) pairs whose closed integer intervals overlap:
    ``l.s <= r.e AND r.s <= l.e`` — interval x interval, the general form
    of :func:`binned_interval_join`'s point-in-window.

    Scale shape: each side is replicated to every ``bucket_width``-wide
    bucket its interval touches (``explode(sequence(s div w, e div w))``)
    and the join is an EQUI-join on the bucket — O(matches + replication),
    never the O(|L| x |R|) nested loop a bare conjunction of inequalities
    plans. A pair overlapping several shared buckets would match once per
    bucket; instead of a distinct (an extra corpus-wide shuffle), each
    pair is emitted ONLY in the bucket containing its overlap start
    (``bucket == greatest(l.s, r.s) div w``) — exactly-once by
    construction. Pick ``bucket_width`` near the typical interval length:
    replication factor is ``len/width + 1`` per row.

    Column names must be pre-disambiguated; span columns must be
    non-negative integers (cast timestamps to epoch micros first).

    Bucket ids come from INTEGER division (``div``), not float-divide +
    floor: for spans past 2^53 the double rounding could shift a value at
    an exact multiple of ``bucket_width`` into the wrong bucket (ADVICE
    r4 #3) — exactness must not depend on magnitude.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    ls, le = left_span
    rs, re_ = right_span

    def _q(name: str) -> str:
        # Backtick-quote identifiers before they enter generated SQL, so
        # span columns with spaces/hyphens/reserved words parse (ADVICE r5
        # #5); embedded backticks are escaped by doubling.
        return "`" + name.replace("`", "``") + "`"

    def _bucket(sql: str) -> "F.Column":
        return F.expr(f"CAST({sql} AS BIGINT) div {bucket_width}")

    def _buckets(s: str, e: str):
        return F.explode(F.sequence(_bucket(_q(s)), _bucket(_q(e))))

    l = left.withColumn("_b", _buckets(ls, le))
    r = right.withColumn("_b", _buckets(rs, re_))
    return (
        l.join(r, "_b")
        .where(
            (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
            & (F.col("_b") == _bucket(f"greatest({_q(ls)}, {_q(rs)})"))
        )
        .drop("_b")
    )
