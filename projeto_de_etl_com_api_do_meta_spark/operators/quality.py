"""Data-quality checks — the reference's own declared next step
("Testes de qualidade de dados (ex.: Great Expectations)",
reference README.md:150-153), built in as a first-class operator.

Each check compiles to ONE aggregation over the table (conditional counts —
map-side combinable), so a full check suite is a single scan + single
reduce at any scale; referential-integrity checks add one left-anti join
against the (broadcastable) dimension keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_rate_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, null_rate) per checked column — computed in
    one aggregation pass, then unpivoted."""
    n = F.count(F.lit(1))
    aggs = [n.alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}") for c in cols
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}" for c in cols)
    long = wide.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column, n_null)"),
    )
    return long.select(
        "column",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_rate"),
    )


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key tuples appearing more than once (primary-key check)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def referential_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Fact rows whose foreign key has no match in the dimension — a
    left-anti join against the (broadcast) dimension key set."""
    dim_keys = F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct())
    return (
        fact.join(dim_keys, fact_key, "left_anti")
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("n_orphan_rows"))
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_col: str,
) -> DataFrame:
    """Table-diff between two snapshots keyed on ``key``: rows only in B
    are 'added', only in A 'removed', in both with differing
    ``compare_col`` 'changed'; identical rows are dropped.

    One full-outer shuffle join on the key — the anti-entropy primitive
    for validating an incremental load against a full recompute, or two
    replicas against each other.  At 100 TB both sides hash-partition on
    the key; nothing is broadcast and unchanged rows never leave their
    executor (filtered before the presentation sort)."""
    from pyspark.sql import functions as F

    an = a.select(F.col(key).alias("a_key"), F.col(compare_col).alias("a_val"))
    bn = b.select(F.col(key).alias("b_key"), F.col(compare_col).alias("b_val"))
    joined = an.join(bn, an.a_key == bn.b_key, "full_outer")
    status = (
        F.when(F.col("a_key").isNull(), F.lit("added"))
        .when(F.col("b_key").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.where(
            F.col("a_key").isNull()
            | F.col("b_key").isNull()
            | (F.col("a_val") != F.col("b_val"))
        )
        .select(
            F.coalesce(F.col("a_key"), F.col("b_key")).alias(key),
            status.alias("status"),
        )
    )
