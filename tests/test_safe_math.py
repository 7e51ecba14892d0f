"""Pin reference division semantics (SURVEY §2.6 D1, transform.py:82-87):
x/0 -> 0, 0/0 -> 0, null numerator or denominator -> 0."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.functions.safe_math import (
    dec_sum,
    safe_div,
)


def test_safe_div_zero_denominator(spark):
    df = spark.createDataFrame(
        [(10.0, 0.0), (0.0, 0.0), (10.0, 2.0), (None, 2.0), (10.0, None)],
        "num double, den double",
    )
    out = [r.q for r in df.select(safe_div("num", "den").alias("q")).collect()]
    assert out == [0.0, 0.0, 5.0, 0.0, 0.0]


def test_safe_div_custom_default(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "num double, den double")
    assert df.select(safe_div("num", "den", default=-1.0).alias("q")).first().q == -1.0


def test_safe_div_ansi_mode_does_not_raise(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        df = spark.createDataFrame([(1.0, 0.0)], "num double, den double")
        assert df.select(safe_div("num", "den").alias("q")).first().q == 0.0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_dec_sum_is_exact_regardless_of_partitioning(spark):
    # 0.1 summed 1000 times in float drifts; decimal sum is exactly 100.
    df = spark.range(1000).select(F.lit(0.1).alias("x")).repartition(7)
    assert df.agg(dec_sum("x").alias("s")).first().s == 100.0
