"""Schema-conform operators (SURVEY §2.2 P4/P7, §2.5 R2/R3).

The reference repairs inferred schemas toward fixed contracts with pandas
idioms; these are the declarative Spark equivalents:

- ``backfill``       : add missing columns with typed defaults
  (extract.py:159-162, transform.py:45-49,78-79).
- ``conform_select`` : fixed final column list, existence-guarded, ordered
  dedup of the list (transform.py:98,111-117,150-155).
- ``coerce_numeric`` : pd.to_numeric(errors='coerce').fillna(0) equivalent —
  ANSI-safe try_cast, null -> 0 (transform.py:51-61).
- ``coerce_dates``   : pd.to_datetime(errors='coerce').dt.date equivalent
  (load.py:37-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def backfill(df: DataFrame, defaults: dict[str, tuple[str, object]]) -> DataFrame:
    """Add each missing column as a typed literal default.

    ``defaults`` maps column -> (spark type name, default value); default
    None produces a typed null (ids/names), 0 the metric backfill."""
    cols = set(df.columns)
    for name, (typ, value) in defaults.items():
        if name not in cols:
            df = df.withColumn(name, F.lit(value).cast(typ))
    return df


def conform_select(df: DataFrame, wanted: list[str]) -> DataFrame:
    """Select the fixed column list, keeping only columns present, dropping
    extras, de-duplicating the list while preserving first-seen order."""
    seen: dict[str, None] = {}
    for c in wanted:
        if c in df.columns and c not in seen:
            seen[c] = None
    return df.select(*seen)


def coerce_numeric(
    df: DataFrame,
    monetary_cols: list[str],
    count_cols: list[str],
) -> DataFrame:
    """errors='coerce' semantics, ANSI-safe: unparseable -> null -> 0.

    Monetary columns stay DoubleType (reference accepts FP money,
    SURVEY §7); count columns become LongType (pandas nullable Int64
    analog, 0-backfilled)."""
    out = df
    for c in monetary_cols:
        if c in out.columns:
            out = out.withColumn(
                c, F.coalesce(F.col(c).try_cast("double"), F.lit(0.0))
            )
    for c in count_cols:
        if c in out.columns:
            out = out.withColumn(
                c,
                F.coalesce(
                    F.floor(F.col(c).try_cast("double")).cast("long"), F.lit(0)
                ),
            )
    return out


def coerce_dates(df: DataFrame, cols: list[str]) -> DataFrame:
    """to_datetime(errors='coerce').dt.date equivalent: bad values -> null."""
    out = df
    for c in cols:
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast("string").try_cast("date"))
    return out
