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
