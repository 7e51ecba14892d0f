"""Unit tests for the stats_r10d batch."""

from __future__ import annotations

import base64
import os
import random

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestAscii85:
    def test_matches_stdlib_randomized(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ascii85_decode,
            ascii85_encode,
        )

        rng = random.Random(17)
        for _ in range(500):
            n = rng.randint(0, 64)
            data = bytes(rng.randrange(256) for _ in range(n))
            enc = ascii85_encode(data)
            assert enc == base64.a85encode(data).decode("ascii"), data
            assert ascii85_decode(enc) == data
        # the canonical partial-group length rule
        for n in range(0, 13):
            data = bytes(range(n))
            want = (n // 4) * 5 + (0 if n % 4 == 0 else n % 4 + 1)
            assert len(ascii85_encode(data)) == want


class TestGrubbs:
    def test_suspect_is_true_argmax(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ml_grubbs_test,
        )

        rows = ml_grubbs_test(spark, SF_DIR).collect()
        assert len(rows) == 5
        for r in rows:
            # |n*x - S| at the reported suspect must equal the reported max
            assert abs(r["n"] * r["suspect_x_e2"] - r["s"]) == r["max_u"]
            assert r["g_stat"] >= 0.0


class TestKendallW:
    def test_w_in_unit_interval(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ml_kendall_w,
        )

        r = ml_kendall_w(spark, SF_DIR).collect()[0]
        assert 0.0 <= r["w_stat"] <= 1.0
        assert r["n_raters"] == 5

    def test_perfect_concordance_w_is_one(self, spark):
        """All raters rank days identically (counts strictly increase by
        day for every type) => W == 1."""
        import datetime as dt
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = tempfile.mkdtemp()
        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(5):
            for et in ("view", "click"):
                for k in range(day + 1):  # value grows with the day
                    rows.append((eid, base + dt.timedelta(days=day), et,
                                 float(10 * (day + 1) + k)))
                    eid += 1
        events = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(events, f"{out}/events.parquet")
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ml_kendall_w,
        )

        r = ml_kendall_w(spark, out).collect()[0]
        assert r["w_stat"] == pytest.approx(1.0, abs=1e-9)


class TestLjungBox:
    def test_q_nonnegative_and_bounded_terms(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ml_ljung_box,
        )

        rows = ml_ljung_box(spark, SF_DIR).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["q_stat"] >= 0.0
            # each |r_k| <= 1e9 so sum of 7 squares <= 7e18
            assert 0 <= r["sum_r2_e18"] <= 7 * 10**18


class TestFactlessCoverage:
    def test_cells_reconcile(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            warehouse_factless_coverage,
        )

        rows = warehouse_factless_coverage(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r["n_covered"] + r["n_missing"] == r["n_cells"]
            n_listed = (
                len(r["missing_nations_csv"].split(","))
                if r["missing_nations_csv"]
                else 0
            )
            assert n_listed == r["n_missing"]
