"""Python DataSource V2 Meta source (sources/meta_dsv2.py): partitioned
paging, filter pushdown, pruning, and parity with Spark-side filtering.

Pushdown evidence: ``pushFilters`` runs in Spark's planning worker process,
so acceptance is asserted from the PLAN — an accepted filter leaves no
Filter node above the BatchScan; a rejected one stays in the plan for Spark
to evaluate — plus value parity against an unpushed scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.sources.meta_dsv2 import (
    register_meta_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_meta_source(spark)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ads_scan_full(spark):
    df = spark.read.format("meta_ads").load()
    assert df.count() == 70  # fixture row count (meta_fixtures.gen_ads)
    assert [f.name for f in df.schema.fields][:2] == ["id", "name"]


def test_ads_scan_is_partitioned_by_page(spark):
    df = spark.read.format("meta_ads").option("pagesize", "25").load()
    assert df.rdd.getNumPartitions() == 3  # ceil(70/25)


def test_status_filter_pushed_and_correct(spark):
    df = (
        spark.read.format("meta_ads")
        .load()
        .where(F.col("effective_status").isin("ACTIVE", "PAUSED"))
    )
    # accepted by the source -> no Filter node survives above the scan
    assert "Filter" not in _physical_plan(df).replace("RuntimeFilters: []", "")
    rows = df.collect()
    assert rows and {r.effective_status for r in rows} <= {"ACTIVE", "PAUSED"}
    # parity with an unpushed scan filtered by Spark
    all_rows = spark.read.format("meta_ads").load().collect()
    manual = [r for r in all_rows if r.effective_status in ("ACTIVE", "PAUSED")]
    assert sorted(r.id for r in rows) == sorted(r.id for r in manual)


def test_unpushable_filter_stays_in_plan(spark):
    df = spark.read.format("meta_ads").load().where(F.col("name").like("%v0%"))
    assert "Filter" in _physical_plan(df).replace("RuntimeFilters: []", "")
    got = df.collect()
    assert got and all("v0" in r.name for r in got)


def test_insights_time_range_pushdown(spark):
    base = spark.read.format("meta_ads").option("edge", "insights").load()
    lo, hi = "2024-03-02", "2024-03-03"
    bounded = base.where((F.col("date_start") >= lo) & (F.col("date_start") <= hi))
    assert "Filter" not in _physical_plan(bounded).replace("RuntimeFilters: []", "")
    pushed = bounded.collect()
    assert pushed, "time-range scan returned nothing"
    assert all(lo <= r.date_start <= hi for r in pushed)
    manual = [r for r in base.collect() if lo <= r.date_start <= hi]
    assert len(pushed) == len(manual)


def test_insights_breakdown_schema(spark):
    df = (
        spark.read.format("meta_ads")
        .option("edge", "insights")
        .option("breakdowns", "age,gender")
        .load()
    )
    names = [f.name for f in df.schema.fields]
    assert "age" in names and "gender" in names
    assert df.count() > 0


def test_nested_structs_and_actions_arrays(spark):
    df = spark.read.format("meta_ads").load()
    flat = df.select(
        "id", F.col("adset.name").alias("adset_name")
    ).where(F.col("adset_name").isNotNull())
    assert flat.count() > 0
    ins = spark.read.format("meta_ads").option("edge", "insights").load()
    acted = ins.select(F.explode("actions").alias("a")).select("a.action_type")
    assert acted.count() > 0


def test_stream_source_parity_and_batching(spark, tmp_path):
    from projeto_de_etl_com_api_do_meta_spark.sources.meta_dsv2 import (
        register_meta_stream_source,
    )

    register_meta_stream_source(spark)
    out = str(tmp_path / "ingested")

    def run_once():
        q = (
            spark.readStream.format("meta_insights_stream")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = spark.read.parquet(out)
    batch = spark.read.format("meta_ads").option("edge", "insights").load()
    assert got.count() == batch.count()
    # value parity at the day grain
    a = got.groupBy("date_start").count().collect()
    b = batch.groupBy("date_start").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # restart on the same checkpoint: no new days -> no duplicate ingestion
    run_once()
    assert spark.read.parquet(out).count() == batch.count()


def test_dsv2_writer_staged_commit(spark, tmp_path):
    import json

    from projeto_de_etl_com_api_do_meta_spark.sources.meta_dsv2 import (
        register_meta_sink,
    )

    register_meta_sink(spark)
    target = tmp_path / "load"
    target.mkdir()
    df = spark.range(0, 12_345).selectExpr(
        "CAST(id AS STRING) AS ad_id", "id * 2 AS clicks"
    )
    (
        df.repartition(4)
        .write.format("meta_load")
        .option("path", str(target))
        .option("batchsize", "1000")
        .mode("append")
        .save()
    )
    manifest = json.loads((target / "_manifest.json").read_text())
    assert manifest["total_rows"] == 12_345
    # chunking honors batchsize: 4 tasks x ceil(rows_per_task/1000) chunks
    assert len(manifest["chunks"]) >= 13
    staged_rows = 0
    for chunk in manifest["chunks"]:
        with open(chunk) as fh:
            staged_rows += sum(1 for _ in fh)
    assert staged_rows == 12_345
