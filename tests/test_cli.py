"""CLI entry point: list/run/sql/explain drive the registry end-to-end."""

from __future__ import annotations

from projeto_de_etl_com_api_do_meta_spark.cli import main


def test_cli_list_filters_by_tag(capsys):
    assert main(["list", "--tag", "retrieval"]) == 0
    out = capsys.readouterr().out
    assert "corpus_bm25_search" in out
    assert "q1_pricing_summary" not in out


def test_cli_run_and_explain(spark, sf_dir, capsys):
    assert main(["run", "agg_basic_battery", "--sf", sf_dir, "--limit", "3"]) == 0
    assert main(["run", "agg_basic_battery", "--sf", sf_dir, "--explain"]) == 0
    out = capsys.readouterr().out
    assert "AdaptiveSparkPlan" in out or "HashAggregate" in out
    assert main(["run", "no_such_query"]) == 2


def test_cli_sql_over_fixture_views(spark, sf_dir, capsys):
    assert (
        main(
            [
                "sql",
                "SELECT count(*) AS n FROM orders",
                "--sf",
                sf_dir,
            ]
        )
        == 0
    )
    assert "n" in capsys.readouterr().out


def test_cli_run_writes_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "res")
    assert main(["run", "pivot_status_counts", "--sf", sf_dir, "--out", out]) == 0
    assert spark.read.parquet(out).count() > 0
