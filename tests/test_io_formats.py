"""Format-generic file source/sink round-trips (SURVEY §2.1 S9)."""

from __future__ import annotations

import pytest

from projeto_de_etl_com_api_do_meta_spark.io import (
    load_table,
    read_table,
    write_table,
)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_round_trip_preserves_rows(spark, sf_dir, fmt, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt=fmt)
    got = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_table(src, path, partition_by=["o_orderstatus"])
    got = read_table(spark, path).where("o_orderstatus = 'F'")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    # The status predicate must land in PartitionFilters, not a row filter.
    assert "PartitionFilters" in plan
    part_filters = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "o_orderstatus" in part_filters
    assert got.count() == src.where("o_orderstatus = 'F'").count()
