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


class TestKcoreDeepPeelGuard:
    """VERDICT r9 item 7: exercise BOTH sides of the oracle-unroll guard
    with a fixture whose peel depth exceeds the fixed SQL unroll."""

    def _deep_fixture(self, spark):
        # 6-cycle (every node degree 2 -> the surviving 2-core) plus a
        # 30-node path: peeling strips the path's two endpoints per round,
        # so convergence needs ~15 rounds — far past an 8-round unroll.
        cyc = [(i, (i + 1) % 6) for i in range(6)]
        path = [(100 + i, 100 + i + 1) for i in range(30)]
        und = cyc + path
        edges = und + [(v, u) for u, v in und]
        return spark.createDataFrame(edges, "u long, v long")

    def test_guard_raises_past_unroll(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
            kcore_peel_edges,
        )

        with pytest.raises(RuntimeError, match="raise _KCORE_ROUNDS"):
            kcore_peel_edges(self._deep_fixture(spark), k=2, oracle_unroll=8)

    def test_deep_peel_converges_without_guard(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
            kcore_peel_edges,
        )

        core, rounds = kcore_peel_edges(
            self._deep_fixture(spark), k=2, oracle_unroll=None
        )
        got = sorted((r["u"], r["v"]) for r in core.collect())
        want = sorted(
            [(i, (i + 1) % 6) for i in range(6)]
            + [((i + 1) % 6, i) for i in range(6)]
        )
        assert got == want  # exactly the cycle, both directions
        assert rounds > 8  # the fixture genuinely out-peels the unroll

    def test_shallow_peel_inside_unroll_ok(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
            kcore_peel_edges,
        )

        # triangle + one pendant: converges in 1 round, inside any unroll
        und = [(0, 1), (1, 2), (0, 2), (2, 3)]
        edges = und + [(v, u) for u, v in und]
        e = spark.createDataFrame(edges, "u long, v long")
        core, rounds = kcore_peel_edges(e, k=2, oracle_unroll=8)
        assert rounds == 1
        assert core.count() == 6  # the triangle, both directions
