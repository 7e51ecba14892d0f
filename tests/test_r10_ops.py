"""Unit tests for round-10 operators."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestAutoCellPicker:
    def test_cell_shrinks_with_density(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
            auto_cell_microdeg,
        )

        cells = [auto_cell_microdeg(n) for n in (1, 10, 1_000, 100_000, 10**7)]
        assert cells == sorted(cells, reverse=True)
        assert all(c >= 1 for c in cells)
        # x100 density -> x10 smaller cells (sqrt law)
        assert abs(cells[1] / cells[3] - 100.0) / 100.0 < 0.01

    def test_cell_matches_duckdb_bit_for_bit(self):
        """The Python picker and the oracle's SQL expression must agree for
        every plausible build-side count — the regime decision itself is
        cross-engine exact."""
        from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
            auto_cell_microdeg,
        )

        ns = [1, 2, 3, 7, 10, 99, 100, 1_000, 12_345, 10**6, 10**9]
        got = duckdb.sql(
            "SELECT n, GREATEST(CAST(floor(sqrt(32e0 * 160000001e0 * "
            "360000001e0 / (9e0 * GREATEST(n, 1)))) AS BIGINT), 1) "
            f"FROM (SELECT unnest({ns}) AS n)"
        ).fetchall()
        for (n, duck_cell) in got:
            assert auto_cell_microdeg(n) == duck_cell, n

    def test_auto_knn_emits_cell_and_matches_fixed_at_tiny_sf(self, spark):
        """At tiny SF the auto cell is huge (sparse data -> big cells) and
        every customer still gets a nearest supplier."""
        from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
            join_geo_grid_knn_auto,
        )

        rows = join_geo_grid_knn_auto(spark, SF_DIR).collect()
        assert len(rows) > 0
        cells = {r["cell_microdeg"] for r in rows}
        assert len(cells) == 1
        assert all(r["matched"] for r in rows)
