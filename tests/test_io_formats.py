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


def test_jsonl_quarantine_split(spark, tmp_path):
    """Hand-built JSONL with known-bad lines: good rows parse typed, bad
    rows land whole in _corrupt_record with typed fields NULL."""
    from projeto_de_etl_com_api_do_meta_spark.io import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"id": 1, "name": "ok"}',
                '{"id": 2, "name": "also ok"}',
                '{"id": 3, "name": "truncated',  # unclosed string/brace
                "not json at all",
                '{"id": "not a number", "name": "type clash"}',
            ]
        )
    )
    df = read_jsonl_quarantine(spark, str(p), "id long, name string")
    rows = df.collect()
    assert len(rows) == 5
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {(r.id, r.name) for r in good} == {(1, "ok"), (2, "also ok")}
    assert len(bad) == 3
    # quarantined rows keep the raw line for forensics
    assert any("not json at all" in r._corrupt_record for r in bad)
