"""Fixture-table IO: parquet readers for the driver test tables.

Scale posture: plain ``spark.read.parquet`` keeps Catalyst's column pruning,
predicate pushdown, and (for date-partitioned layouts) partition pruning —
the file-source equivalents of the reference's server-side ``fields`` /
``filtering`` / ``time_range`` pushdown (reference extract.py:70-73,125-128,
199-207).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
