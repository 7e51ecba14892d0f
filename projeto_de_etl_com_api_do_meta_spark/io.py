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
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet may store ``ts`` as TIMESTAMP(NANOS) (read nanos-as-long
    and truncate to micros — the same truncation DuckDB applies) or as a
    no-timezone TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ.
    ``unix_micros``/``withWatermark``/BIGINT casts all reject NTZ, so
    normalize either form to a session-TZ TIMESTAMP; the session timezone is
    pinned to UTC everywhere (tests, bench, entrypoints), so wall-clock values
    are identical to what DuckDB sees and oracle parity is preserved."""
    from pyspark.sql import functions as F  # local: keep module import light

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.to_timestamp("ts"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# -- Generic file sources/sinks (SURVEY §2.1 S9) ------------------------------

_FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-generic sink.  CSV gets headers by default; date-partitioned
    layouts (``partition_by``) enable static+dynamic partition pruning on
    re-read — the at-rest analog of the reference's time_range pushdown."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {_FORMATS}")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options) -> DataFrame:
    """Format-generic source.  Schema-on-read inference stays at this edge
    only (SURVEY §1.2); pass an explicit schema for typed CSV/JSON reads."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {_FORMATS}")
    if fmt == "csv":
        options.setdefault("header", "true")
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """PERMISSIVE JSONL read with a quarantine column: rows that fail to
    parse against ``schema_ddl`` come back with their raw line in
    ``_corrupt_record`` and every typed field NULL, instead of failing the
    job (FAILFAST) or silently vanishing (DROPMALFORMED).  This is the
    ingestion contract for web-crawl JSONL at scale, where a 100 TB batch
    WILL contain truncated/mangled lines and one bad record must cost one
    quarantined row, not a task retry storm.

    The returned frame carries ``_corrupt_record string`` appended to the
    caller's schema; route ``_corrupt_record IS NOT NULL`` rows to a
    quarantine sink and the rest onward.  (Spark refuses plans that
    reference ONLY the corrupt column — always select it alongside a data
    column, as the quarantine split naturally does.)
    """
    return (
        spark.read.schema(schema_ddl + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
