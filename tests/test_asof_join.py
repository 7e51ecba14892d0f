"""As-of join semantics: latest prior match, inclusive ties, tolerance."""

from __future__ import annotations

import datetime as dt

from projeto_de_etl_com_api_do_meta_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_picks_latest_prior_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 2, _ts(5))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(15)), (102, 3, _ts(1))],
        "rid long, user_id long, ts timestamp",
    )
    got = {
        r.id: r.rid
        for r in asof_join(
            left, right, key="user_id", ts="ts", payload_cols=["rid"]
        ).collect()
    }
    assert got[1] == 100   # tie at ts=10 matches (inclusive)
    assert got[2] == 101   # latest prior, not first
    assert got[3] is None  # no right rows for user 2


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(30))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(10))], "rid long, user_id long, ts timestamp"
    )
    fresh = asof_join(
        left, right, key="user_id", ts="ts", payload_cols=["rid"],
        tolerance_us=25_000_000,
    ).first()
    stale = asof_join(
        left, right, key="user_id", ts="ts", payload_cols=["rid"],
        tolerance_us=15_000_000,
    ).first()
    assert fresh.rid == 100
    assert stale.rid is None


class TestIntervalOverlapJoin:
    def test_exactly_once_across_shared_buckets(self, spark):
        """A pair overlapping across MANY shared buckets must be emitted
        once — the report-at-overlap-start rule replaces a distinct."""
        from projeto_de_etl_com_api_do_meta_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        left = spark.createDataFrame(
            [(1, 0, 1000), (2, 350, 420), (3, 2000, 2100)],
            "lid long, s1 long, e1 long",
        )
        right = spark.createDataFrame(
            [(10, 100, 900), (11, 950, 1050)],
            "rid long, s2 long, e2 long",
        )
        out = interval_overlap_join(
            left, right, ("s1", "e1"), ("s2", "e2"), bucket_width=100
        )
        got = sorted((r.lid, r.rid) for r in out.collect())
        # (1,10) shares 9 buckets -> once; (1,11) overlaps at bucket 9;
        # (2,10) nested interval; (3,*) no overlap
        assert got == [(1, 10), (1, 11), (2, 10)]

    def test_touching_endpoints_count_as_overlap(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        left = spark.createDataFrame([(1, 0, 100)], "lid long, s1 long, e1 long")
        right = spark.createDataFrame(
            [(10, 100, 200), (11, 101, 200)], "rid long, s2 long, e2 long"
        )
        out = interval_overlap_join(
            left, right, ("s1", "e1"), ("s2", "e2"), bucket_width=50
        )
        assert [(r.lid, r.rid) for r in out.collect()] == [(1, 10)]

    def test_bucket_width_guard_and_large_span_exactness(self, spark):
        """bucket_width < 1 raises; bucket ids use integer division, so
        values past 2^53 at exact multiples of the width stay in the
        right bucket (ADVICE r4 #3 — float-divide+floor can shift them)."""
        import pytest as _pytest

        from projeto_de_etl_com_api_do_meta_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        left = spark.createDataFrame([(1, 0, 1)], "lid long, s1 long, e1 long")
        right = spark.createDataFrame([(2, 0, 1)], "rid long, s2 long, e2 long")
        with _pytest.raises(ValueError):
            interval_overlap_join(
                left, right, ("s1", "e1"), ("s2", "e2"), bucket_width=0
            )
        # 2^53 + 1 is not representable in float64: float path would put
        # s = 9007199254740993 (odd) into the same bucket as 2^53 for
        # width 2; integer div keeps the true buckets and the pair still
        # joins exactly once.
        big = (1 << 53) + 1
        left = spark.createDataFrame(
            [(1, big, big + 10)], "lid long, s1 long, e1 long"
        )
        right = spark.createDataFrame(
            [(2, big + 5, big + 20)], "rid long, s2 long, e2 long"
        )
        out = interval_overlap_join(
            left, right, ("s1", "e1"), ("s2", "e2"), bucket_width=2
        )
        assert [(r.lid, r.rid) for r in out.collect()] == [(1, 2)]


def test_interval_overlap_join_quotes_awkward_column_names(spark):
    """Span columns needing backtick quoting (hyphens, reserved words) must
    parse in the generated bucket SQL (ADVICE r5 #5)."""
    from projeto_de_etl_com_api_do_meta_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10)], ["l_id", "start-ts", "end"]  # hyphen + reserved word
    )
    right = spark.createDataFrame(
        [(7, 5, 15), (8, 20, 30)], ["r_id", "from", "order"]  # both reserved
    )
    out = interval_overlap_join(
        left, right, ("start-ts", "end"), ("from", "order"), bucket_width=4
    )
    assert [(r.l_id, r.r_id) for r in out.collect()] == [(1, 7)]
