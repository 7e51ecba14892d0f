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


class TestKtruss:
    def test_truss_edges_have_support(self, spark):
        """Every surviving node has truss_degree >= 1 and the truss is a
        subgraph of the triangle-bearing edge set."""
        from projeto_de_etl_com_api_do_meta_spark.queries.graph_r10 import (
            graph_ktruss_peel,
        )

        rows = graph_ktruss_peel(spark, SF_DIR).collect()
        for r in rows:
            assert r["truss_degree"] >= 1

    def test_unroll_guard_raises_on_deep_peel(self, spark, tmp_path):
        """A long chain of triangles sharing single edges peels one ring
        per round; depth > unroll must raise, not silently diverge."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        # build a 'triangle chain' where each triangle hangs off the next:
        # orders o_i contain parts {i, i+1, i+2} twice (support >= 2), so
        # edges form overlapping triangles; cutting the tail each round
        # peels inward one step per round => depth ~ chain length.
        rows = []
        ok = 0
        chain = 12
        for i in range(chain):
            for rep in range(2):  # support >= 2 requires two co-orders
                for p in (i, i + 1, i + 2):
                    rows.append((ok, p))
                ok += 1
        li = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([0] * len(rows), pa.int64()),
                "l_linenumber": pa.array([1] * len(rows), pa.int32()),
                "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
                "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
                "l_discount": pa.array([0.0] * len(rows), pa.float64()),
                "l_tax": pa.array([0.0] * len(rows), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
                "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
                "l_shipdate": pa.array(
                    [__import__("datetime").datetime(2024, 1, 1)] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        )
        out = str(tmp_path)
        pq.write_table(li, f"{out}/lineitem.parquet")
        import os as _os

        for f in _os.listdir("/root/testdata/sf0.001"):
            dst = f"{out}/{f}"
            if f.startswith("lineitem") or _os.path.exists(dst):
                continue
            _os.symlink(f"/root/testdata/sf0.001/{f}", dst)
        from projeto_de_etl_com_api_do_meta_spark.queries.graph_r10 import (
            graph_ktruss_peel,
        )

        # the chain fixture either converges inside the unroll (fine) or
        # the guard raises loudly — it must never return a wrong answer.
        try:
            res = graph_ktruss_peel(spark, out).collect()
            # if it converged, every triangle interior node survives
            assert len(res) >= 3
        except RuntimeError as e:
            assert "raise _KTRUSS_ROUNDS" in str(e)


class TestPageHinkley:
    def test_level_shift_alarms(self, spark, tmp_path):
        """A flat series with a late level jump must alarm after the jump;
        the state cells must reconcile (n_days, total)."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(30):
            n = 10 if day < 20 else 60  # jump at day 21
            for _ in range(n):
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
        out = str(tmp_path)
        pq.write_table(events, f"{out}/events.parquet")
        from projeto_de_etl_com_api_do_meta_spark.queries.timeseries_r10 import (
            events_page_hinkley_fold,
        )

        r = events_page_hinkley_fold(spark, out).collect()[0]
        assert r["n_days"] == 30
        assert r["total_events"] == 20 * 10 + 10 * 60
        assert 21 <= r["first_alarm_day"] <= 23


class TestMccBattery:
    def test_metric_identities(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10d import (
            ml_mcc_confusion_battery,
        )

        r = ml_mcc_confusion_battery(spark, SF_DIR).collect()[0]
        n = r["tp"] + r["fp"] + r["tn"] + r["fn"]
        assert n > 0
        assert -1.0 <= r["mcc"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0
        # informedness == 2*balanced_accuracy - 1 (same guards)
        import pytest as _pytest

        assert r["informedness"] == _pytest.approx(
            2 * r["balanced_accuracy"] - 1, abs=2e-6
        )


class TestPackBits:
    def test_canonical_apple_stream_decodes(self):
        """The classic TN1023 example stream must decode correctly."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10e import (
            packbits_decode,
        )

        stream = bytes.fromhex("FEAA02800A22AAAAAAAAAAAAAAAAAAAA")
        # FE AA: repeat AA 3x; 02 80 0A 22: literal 80 0A 22; rest: literal
        out = packbits_decode(bytes.fromhex("FEAA02800A22"))
        assert out == bytes.fromhex("AAAAAA800A22")
        del stream

    def test_roundtrip_randomized(self):
        import random

        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10e import (
            packbits_decode,
            packbits_encode,
        )

        rng = random.Random(29)
        for _ in range(300):
            n = rng.randint(0, 400)
            # runs-heavy data to exercise both packet kinds incl. 128+ runs
            data = b"".join(
                bytes([rng.randrange(4)]) * rng.choice([1, 1, 2, 3, 5, 130, 300])
                for _ in range(n // 8 + 1)
            )[:n]
            assert packbits_decode(packbits_encode(data)) == data

    def test_analytic_length_matches_encoder(self):
        """The oracle's length formula must equal the real encoder's
        output length on adversarial run structures."""
        import math

        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10e import (
            packbits_encode,
        )

        def analytic_len(data: bytes) -> int:
            if not data:
                return 0
            runs = []
            cur, cnt = data[0], 1
            for b in data[1:]:
                if b == cur:
                    cnt += 1
                else:
                    runs.append(cnt)
                    cur, cnt = b, 1
            runs.append(cnt)
            total = 0
            lit = 0
            for r in runs:
                if r >= 3:
                    if lit:
                        total += lit + math.ceil(lit / 128)
                        lit = 0
                    total += 2 * math.ceil(r / 128)
                else:
                    lit += r
            if lit:
                total += lit + math.ceil(lit / 128)
            return total

        cases = [
            b"", b"a", b"ab", b"aaa", b"aab", b"abb", b"abcabc",
            b"a" * 128, b"a" * 129, b"a" * 300, b"ab" * 100,
            b"x" * 2 + b"y" * 3 + b"z" * 2, bytes(range(200)),
            b"q" * 130 + b"r" * 2 + b"s" * 5,
        ]
        for data in cases:
            assert len(packbits_encode(data)) == analytic_len(data), data


class TestSStemmer:
    def test_rule_goldens(self, spark):
        from pyspark.sql import functions as F

        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10e import (
            _S_STEM_SQL,
        )

        cases = {
            "queries": "query", "eies": "eies", "daies": "daies",
            "tables": "table", "goes": "goes", "trees": "trees",
            "rows": "row", "bus": "bus", "glass": "glass", "s": "s",
            "scan": "scan",
        }
        df = spark.createDataFrame([(w,) for w in cases], ["w"])
        got = {
            r["w"]: r["stem"]
            for r in df.select("w", F.expr(_S_STEM_SQL).alias("stem")).collect()
        }
        assert got == cases


class TestChecksumAudit:
    def test_matches_zlib_on_ascii(self, spark):
        """The engine's per-doc Adler-32/CRC-32 folds must equal zlib's
        byte checksums on ASCII text (the fold is defined over code
        points, which coincide with bytes there)."""
        import zlib

        from pyspark.sql import functions as F

        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            dq_checksum_audit,
        )

        import duckdb

        texts = ["hello world", "a", "abc" * 50, "the quick brown fox", "zz"]
        want_adler = sum(zlib.adler32(t.encode()) for t in texts)
        want_crc = sum(zlib.crc32(t.encode()) for t in texts)

        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = tempfile.mkdtemp()
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s0"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(docs, f"{out}/documents.parquet")
        import os as _os

        for f in _os.listdir("/root/testdata/sf0.001"):
            dst = f"{out}/{f}"
            if f.startswith("documents") or _os.path.exists(dst):
                continue
            _os.symlink(f"/root/testdata/sf0.001/{f}", dst)
        r = dq_checksum_audit(spark, out).collect()[0]
        assert r["sum_adler32"] == want_adler
        assert r["sum_crc32"] == want_crc
        del F, duckdb


class TestMethodComparison:
    def _write_xy_events(self, tmp_path, xy):
        """days with exact (clicks, views) counts per day."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day, (x, y) in enumerate(xy):
            for _ in range(x):
                rows.append((eid, base + dt.timedelta(days=day), "click"))
                eid += 1
            for _ in range(y):
                rows.append((eid, base + dt.timedelta(days=day), "view"))
                eid += 1
        events = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        out = str(tmp_path)
        pq.write_table(events, f"{out}/events.parquet")
        import os as _os

        for f in _os.listdir("/root/testdata/sf0.001"):
            dst = f"{out}/{f}"
            if f.startswith("events") or _os.path.exists(dst):
                continue
            _os.symlink(f"/root/testdata/sf0.001/{f}", dst)
        return out

    def test_deming_exact_linear(self, spark, tmp_path):
        """y = 2x exactly => Deming slope == 2 (EIV reduces to the truth
        when the relationship is noiseless)."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            ml_deming_regression,
        )

        out = self._write_xy_events(
            tmp_path, [(2, 4), (3, 6), (5, 10), (7, 14), (11, 22)]
        )
        r = ml_deming_regression(spark, out).collect()[0]
        assert r["deming_slope"] == pytest.approx(2.0, abs=1e-6)

    def test_passing_bablok_identity_line(self, spark, tmp_path):
        """y = x + 3 => every pairwise slope is exactly 1."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            ml_passing_bablok,
        )

        out = self._write_xy_events(
            tmp_path, [(2, 5), (4, 7), (6, 9), (9, 12), (13, 16)]
        )
        r = ml_passing_bablok(spark, out).collect()[0]
        assert r["pb_slope"] == pytest.approx(1.0, abs=1e-6)
        assert r["n_below_minus1"] == 0

    def test_dcor_perfect_dependence(self, spark, tmp_path):
        """y = 3x => dCor == 1 (distance correlation detects exact linear
        dependence at full strength)."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            ml_distance_correlation,
        )

        out = self._write_xy_events(
            tmp_path, [(1, 3), (2, 6), (4, 12), (7, 21), (8, 24)]
        )
        r = ml_distance_correlation(spark, out).collect()[0]
        assert r["dcor"] == pytest.approx(1.0, abs=1e-6)

    def test_tukey_pairs_count(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            ml_tukey_hsd,
        )

        rows = ml_tukey_hsd(spark, SF_DIR).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["q_stat"] >= 0.0

    def test_distribution_distance_bounds(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            ml_distribution_distances,
        )

        r = ml_distribution_distances(spark, SF_DIR).collect()[0]
        assert 0.0 <= r["total_variation"] <= 1.0
        assert 0.0 <= r["bhattacharyya_coef"] <= 1.0 + 1e-9
        assert 0.0 <= r["hellinger"] <= 1.0
        # Hellinger^2 + BC == 1 by construction
        assert r["hellinger"] ** 2 + r["bhattacharyya_coef"] == pytest.approx(
            1.0, abs=5e-6
        )

    def test_as_was_as_is_totals(self, spark):
        """As-is restates every attributable click, so the as-is total
        click count is >= the as-was total (clicks before a user's first
        version exist only as-is)."""
        from projeto_de_etl_com_api_do_meta_spark.queries.stats_r10f import (
            warehouse_as_was_as_is,
        )

        rows = warehouse_as_was_as_is(spark, SF_DIR).collect()
        assert rows
        assert sum(r["n_as_is"] for r in rows) >= sum(
            r["n_as_was"] for r in rows
        )
