"""Skew-mitigation operators (SURVEY §7 "100 TB posture").

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
are the explicit, planner-independent techniques for the pathological cases —
a handful of hot keys holding most of the data:

- ``salted_join``: widen the join key with a salt on the big (skewed) side
  and replicate the small side once per salt value, so one hot key spreads
  over ``num_salts`` reducers instead of one straggler task.
- ``skew_safe_count_distinct``: two-phase exact distinct — shuffle on
  (key, value) first (cardinality spreads the hot key), then count per key.

Both produce results IDENTICAL to their naive forms (oracle-verified); only
the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the skewed side's key is widened with a deterministic
    salt and the small side is replicated ``num_salts``× — a hot key's rows
    land on ``num_salts`` different reducers.

    The salt is derived from the skewed row's full content hash, so any row
    distribution works and the result is exactly the plain join's.  Cost:
    |small| × num_salts replication — keep the small side small (it usually
    rides a broadcast anyway; salting matters when it's just too big to
    broadcast but far smaller than the skewed fact)."""
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    l = skewed.withColumn("_salt", salt_l)
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = l.join(r, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def skew_safe_count_distinct(
    df: DataFrame, key: str, value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key in two shuffles: distinct on
    (key, value) — the value's cardinality spreads a hot key across the
    cluster — then a cheap count per key.  Equivalent results to the naive
    single-shot aggregate, minus the single-reducer hot spot."""
    return (
        df.select(key, value)
        .where(F.col(value).isNotNull())
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def key_skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Top-``top_k`` hottest values of ``key`` with their share of all rows
    and their ratio to the mean key's count, in exact integer basis points.
    The pre-shuffle-strategy diagnostic: ``vs_mean_bp >> 10000`` on a top
    key says salt that join / lean on AQE skew handling.  Map-side partial
    aggregation collapses hot keys per partition, so the diagnostic never
    suffers the skew it measures; the two corpus scalars broadcast."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("total")
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            key,
            "cnt",
            F.expr("(cnt * 10000) div total").alias("share_bp"),
            F.expr("(cnt * n_keys * 10000) div total").alias("vs_mean_bp"),
        )
        .orderBy(F.col("cnt").desc(), key)
        .limit(top_k)
    )
