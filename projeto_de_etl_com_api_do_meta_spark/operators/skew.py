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
