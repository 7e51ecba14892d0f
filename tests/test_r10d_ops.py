"""Unit tests for the round-10d/geo/timeseries operators."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestVarint:
    def test_golden_encodings(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r10d import (
            varint_decode,
            varint_encode,
        )

        assert varint_encode(0) == b"\x00"
        assert varint_encode(127) == b"\x7f"
        assert varint_encode(128) == b"\x80\x01"
        assert varint_encode(300) == b"\xac\x02"  # protobuf docs example
        for n in [0, 1, 127, 128, 300, 16383, 16384, 2**35 - 1, 2**56 + 9]:
            assert varint_decode(varint_encode(n)) == n
            # analytic length formula the oracle uses
            want_len = 1 if n == 0 else -(-n.bit_length() // 7)
            assert len(varint_encode(n)) == want_len


class TestGeohash:
    def test_known_point_via_spark(self, spark):
        """The generated SQL must agree with a reference Python geohash on
        the quantized domain (both clamp identically at the upper edge)."""
        from projeto_de_etl_com_api_do_meta_spark.queries.geo_r10 import (
            _BASE32,
            _NLAT,
            _NLON,
            _geohash_sql,
        )

        def py_geohash(lat_u, lon_u):
            lonb = min((lon_u + 180_000_000) * (1 << _NLON) // 360_000_000,
                       (1 << _NLON) - 1)
            latb = min((lat_u + 90_000_000) * (1 << _NLAT) // 180_000_000,
                       (1 << _NLAT) - 1)
            bits = 0
            li, ti = _NLON - 1, _NLAT - 1
            for k in range(25):
                if k % 2 == 0:
                    bits = (bits << 1) | ((lonb >> li) & 1)
                    li -= 1
                else:
                    bits = (bits << 1) | ((latb >> ti) & 1)
                    ti -= 1
            return "".join(
                _BASE32[(bits >> (20 - 5 * i)) & 31] for i in range(5)
            )

        pts = [
            (0, 0), (-80_000_000, -180_000_000), (80_000_000, 180_000_000),
            (45_123_456, -122_654_321), (-33_000_001, 151_000_003),
        ]
        rows = spark.createDataFrame(pts, ["lat", "lon"])
        from pyspark.sql import functions as F

        got = rows.select(
            "lat", "lon", F.expr(_geohash_sql("lat", "lon")).alias("gh")
        ).collect()
        for r in got:
            assert r["gh"] == py_geohash(r["lat"], r["lon"]), (r["lat"], r["lon"])

    def test_prefix_is_proximity(self, spark):
        """Two points 1 microdeg apart share the gh4 prefix (away from cell
        edges); two antipodal points never do."""
        from pyspark.sql import functions as F

        from projeto_de_etl_com_api_do_meta_spark.queries.geo_r10 import (
            _geohash_sql,
        )

        rows = spark.createDataFrame(
            [
                (45_000_000, 10_000_000),
                (45_000_001, 10_000_001),
                (-45_000_000, -170_000_000),
            ],
            ["lat", "lon"],
        )
        ghs = [
            r["gh"]
            for r in rows.select(
                F.expr(_geohash_sql("lat", "lon")).alias("gh")
            ).collect()
        ]
        assert ghs[0][:4] == ghs[1][:4]
        assert ghs[0][:2] != ghs[2][:2]


class TestPointInPolygon:
    def test_vertex_and_center(self, spark):
        from pyspark.sql import functions as F

        from projeto_de_etl_com_api_do_meta_spark.queries.geo_r10 import (
            _POLY,
            _pip_sql,
        )

        cx = sum(p[0] for p in _POLY) // len(_POLY)
        cy = sum(p[1] for p in _POLY) // len(_POLY)
        rows = spark.createDataFrame(
            [
                (cx, cy),               # centroid: inside
                (_POLY[0][0], _POLY[0][1]),  # vertex: boundary
                (79_000_000, -179_000_000),  # far corner: outside
            ],
            ["lat", "lon"],
        )
        got = [
            r["v"]
            for r in rows.select(
                F.expr(_pip_sql("lat", "lon")).alias("v")
            ).collect()
        ]
        assert got == ["inside", "boundary", "outside"]


class TestAmsF2:
    def test_estimate_brackets_exact(self, spark):
        """AMS is unbiased; with 16 estimators the realized error at the
        fixture must stay within an order of magnitude (pinned loose)."""
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r10d import (
            agg_ams_f2_sketch,
        )

        r = agg_ams_f2_sketch(spark, SF_DIR).collect()[0]
        assert r["f2_exact"] > 0
        assert 0.1 * r["f2_exact"] < r["f2_est"] < 10 * r["f2_exact"]

    def test_bridge_allocation_reconciles(self, spark):
        """Total allocated cents must differ from order totals only by the
        per-row rounding residual the query itself reports."""
        from projeto_de_etl_com_api_do_meta_spark.queries.analytics_r10d import (
            warehouse_bridge_allocation,
        )

        rows = warehouse_bridge_allocation(spark, SF_DIR).collect()
        residuals = {r["rounding_residual_e2"] for r in rows}
        assert len(residuals) == 1
        # residual is bounded by half a cent per line item
        n_items = sum(r["n_items"] for r in rows)
        assert abs(residuals.pop()) <= n_items


class TestHampelAndForecast:
    def test_hampel_flags_are_integer_decided(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.timeseries_r10 import (
            events_hampel_filter,
        )

        rows = events_hampel_filter(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            want = 1 if r["dev2"] * 20000 > 44478 * r["mad4"] else 0
            assert r["is_outlier"] == want

    def test_forecast_metrics_consistent(self, spark):
        import math

        from projeto_de_etl_com_api_do_meta_spark.queries.timeseries_r10 import (
            events_forecast_accuracy_naive,
        )

        rows = events_forecast_accuracy_naive(spark, SF_DIR).collect()
        for r in rows:
            assert r["mae_naive"] == pytest.approx(
                r["sum_abs_e1"] / r["n_eval"], abs=1e-6
            )
            assert r["rmse_naive"] == pytest.approx(
                math.sqrt(r["sum_sq_e1"] / r["n_eval"]), abs=1e-6
            )

    def test_err_within_unit_interval(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.timeseries_r10 import (
            retrieval_err_eval,
        )

        rows = retrieval_err_eval(spark, SF_DIR).collect()
        assert len(rows) == 5
        for r in rows:
            assert 0.0 <= r["err"] <= 1.0
