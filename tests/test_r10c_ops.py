"""Unit tests for the round-10c operators (string-distance ER +
nonparametric stats batch)."""

from __future__ import annotations

import os
import random
import string

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestJaroWinkler:
    def test_golden_cases(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.similarity_r10 import (
            jaro_winkler,
        )

        assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(
            0.9611111111111111, abs=1e-15
        )
        assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-12)
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("", "abc") == 0.0
        assert jaro_winkler("abc", "") == 0.0
        # DuckDB convention: two empties are NOT similar
        assert jaro_winkler("", "") == 0.0
        # boost only above the 0.7 threshold
        assert jaro_winkler("ab", "ba") == pytest.approx(
            (1.0 + 1.0 + 0.0) / 3.0 * 0.0 + 0.0, abs=1.0
        )

    def test_matches_duckdb_builtin_randomized(self):
        """The from-scratch implementation must agree with DuckDB's
        independent C++ builtin on randomized bigram-shaped pairs."""
        from projeto_de_etl_com_api_do_meta_spark.queries.similarity_r10 import (
            jaro_winkler,
        )

        rng = random.Random(23)
        cases = []
        for _ in range(2000):
            a = "".join(
                rng.choices(string.ascii_lowercase[:5] + " ", k=rng.randint(0, 12))
            )
            b = "".join(
                rng.choices(string.ascii_lowercase[:5] + " ", k=rng.randint(0, 12))
            )
            cases.append((a, b))
        rows = duckdb.sql(
            "SELECT jaro_winkler_similarity(a, b) FROM "
            "(SELECT unnest($1) AS a, unnest($2) AS b)",
            params=[[c[0] for c in cases], [c[1] for c in cases]],
        ).fetchall()
        for (a, b), (want,) in zip(cases, rows):
            assert jaro_winkler(a, b) == pytest.approx(want, abs=1e-12), (a, b)


class TestDamerauLevenshtein:
    def test_true_dl_not_osa(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.similarity_r10 import (
            damerau_levenshtein,
        )

        # the canonical separator: OSA('CA','ABC') = 3, true DL = 2
        assert damerau_levenshtein("CA", "ABC") == 2
        assert damerau_levenshtein("ab", "ba") == 1
        assert damerau_levenshtein("", "abc") == 3
        assert damerau_levenshtein("kitten", "sitting") == 3

    def test_matches_duckdb_builtin_randomized(self):
        from projeto_de_etl_com_api_do_meta_spark.queries.similarity_r10 import (
            damerau_levenshtein,
        )

        rng = random.Random(31)
        cases = []
        for _ in range(800):
            a = "".join(rng.choices("abcd", k=rng.randint(0, 9)))
            b = "".join(rng.choices("abcd", k=rng.randint(0, 9)))
            cases.append((a, b))
        rows = duckdb.sql(
            "SELECT damerau_levenshtein(a, b) FROM "
            "(SELECT unnest($1) AS a, unnest($2) AS b)",
            params=[[c[0] for c in cases], [c[1] for c in cases]],
        ).fetchall()
        for (a, b), (want,) in zip(cases, rows):
            assert damerau_levenshtein(a, b) == want, (a, b)

    def test_transposition_wins_present_at_sf(self, spark):
        """The n_transposition_wins column must be live signal on the real
        corpus (60 pairs at sf0.01), not a constant-zero contract column."""
        from projeto_de_etl_com_api_do_meta_spark.queries.similarity_r10 import (
            er_damerau_levenshtein,
        )

        rows = er_damerau_levenshtein(spark, SF_DIR).collect()
        assert sum(r["n_transposition_wins"] for r in rows) > 0
        # DL is a lower bound of levenshtein: sums must respect it per block
        for r in rows:
            assert r["sum_dl"] <= r["sum_lev"]


class TestNonparametricBatch:
    def test_mann_kendall_monotone_series(self, spark):
        """On a strictly increasing daily series S = n(n-1)/2 and z > 0."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq
        import tempfile

        out = tempfile.mkdtemp()
        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(6):  # day d gets d+1 'view' events: strictly rising
            for _ in range(day + 1):
                rows.append((eid, base + dt.timedelta(days=day)))
                eid += 1
        events = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(events, f"{out}/events.parquet")
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            events_mann_kendall_trend,
        )

        got = events_mann_kendall_trend(spark, out).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_days"] == 6
        assert r["s_stat"] == 15  # 6*5/2, every pair increasing
        assert r["z_stat"] > 0

    def test_cliffs_delta_bounds_and_antisymmetry(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            ml_cliffs_delta,
        )

        rows = ml_cliffs_delta(spark, SF_DIR).collect()
        assert len(rows) == 10  # C(5,2) event-type pairs
        for r in rows:
            assert -1.0 <= r["delta"] <= 1.0
            assert r["n_gt"] + r["n_lt"] + r["n_tie"] == r["n_low"] * r["n_high"]

    def test_jonckheere_identity_with_cliffs_counts(self, spark):
        """2J must equal sum over pairs of (2*n_lt + n_tie) — the two
        operators share one dominance contract."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            ml_cliffs_delta,
            ml_jonckheere_trend,
        )

        pairs = ml_cliffs_delta(spark, SF_DIR).collect()
        jt = ml_jonckheere_trend(spark, SF_DIR).collect()[0]
        assert jt["two_j"] == sum(2 * r["n_lt"] + r["n_tie"] for r in pairs)
        assert jt["e_two_j"] == sum(r["n_low"] * r["n_high"] for r in pairs)

    def test_krippendorff_perfect_agreement(self, spark):
        """Units that each use exactly one category => D_o = 0 => alpha = 1."""
        import datetime as dt
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = tempfile.mkdtemp()
        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u, et in [(1, "view"), (2, "click"), (3, "view")]:
            for _ in range(4):  # m_u = 4, all same category
                rows.append((eid, base, u, et))
                eid += 1
        events = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(events, f"{out}/events.parquet")
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            ml_krippendorff_alpha,
        )

        r = ml_krippendorff_alpha(spark, out).collect()[0]
        assert r["d_o_e9"] == 0
        assert r["alpha"] == pytest.approx(1.0, abs=1e-9)

    def test_brown_forsythe_nonnegative(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            ml_brown_forsythe,
        )

        rows = ml_brown_forsythe(spark, SF_DIR).collect()
        assert len(rows) == 5
        ws = {r["bf_w"] for r in rows}
        assert len(ws) == 1  # global statistic attached to every row
        assert ws.pop() >= 0.0

    def test_mood_contributions_nonnegative(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10c import (
            ml_mood_median_test,
        )

        rows = ml_mood_median_test(spark, SF_DIR).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["chi2_contrib"] >= 0.0
            assert r["n_above"] + r["n_not_above"] == r["n_g"]
