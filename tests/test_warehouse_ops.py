"""Warehouse ops: SCD2 point-in-time join and incremental partition
overwrite (queries/warehouse_ops.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table
from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
    _daily_rollup,
    events_incremental_rollup,
    join_scd2_point_in_time,
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_scd2_version_boundaries(spark, sf_dir, tmp_path):
    """A click at exactly valid_from joins the NEW version; clicks before the
    first purchase join nothing; clicks after the last join the open one."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: purchases at 10:00 (v1) and 12:00 (v2)
        (1, t.replace(hour=10), 1, "purchase", 0.0),
        (2, t.replace(hour=12), 1, "purchase", 0.0),
        (3, t.replace(hour=9), 1, "click", 0.0),   # before v1 -> no match
        (4, t.replace(hour=10), 1, "click", 0.0),  # == v1 valid_from -> v1
        (5, t.replace(hour=11), 1, "click", 0.0),  # inside v1
        (6, t.replace(hour=12), 1, "click", 0.0),  # == v2 valid_from -> v2
        (7, t.replace(hour=23), 1, "click", 0.0),  # open interval -> v2
        # user 2: no purchases -> its click never matches
        (8, t.replace(hour=11), 2, "click", 0.0),
    ]
    src = tmp_path / "events.parquet"
    _events_df(spark, rows).withColumn("props", F.lit("{}")).write.parquet(str(src))
    # point the query at a directory whose events table is our fixture
    got = {
        r.event_id: r.version_no
        for r in join_scd2_point_in_time(spark, str(tmp_path)).collect()
    }
    assert got == {4: 1, 5: 1, 6: 2, 7: 2}


def test_incremental_rollup_matches_full_recompute(spark, sf_dir):
    out = events_incremental_rollup(spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events")
    want = {
        (r.event_date, r.event_type): (r.n_events, r.value_cents)
        for r in _daily_rollup(events).collect()
    }
    got = {
        (r.event_date, r.event_type): (r.n_events, r.value_cents) for r in out
    }
    assert got == want
    # early-history days (before the reprocess window) must have survived
    # the second overwrite — static mode would have dropped them.
    assert min(d for d, _ in got) == dt.date(2024, 1, 1)


def test_incremental_rollup_rerun_idempotent(spark, sf_dir):
    a = sorted(map(tuple, events_incremental_rollup(spark, sf_dir).collect()))
    b = sorted(map(tuple, events_incremental_rollup(spark, sf_dir).collect()))
    assert a == b


def test_overwrite_mode_restored(spark, sf_dir):
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    events_incremental_rollup(spark, sf_dir)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == before
    )


def test_observation_metrics_piggyback_on_one_pass(spark, sf_dir):
    """In-flight data-quality counters via df.observe(): row count, null
    count, and value sum are collected as a side effect of the SAME job
    that writes/consumes the data — at 100 TB this replaces a second
    full-scan validation pass with zero extra IO."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("n_null_qty"),
        F.sum("l_quantity").alias("sum_qty"),
    )
    n = observed.count()  # one action drives both the query and the metrics
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_null_qty"] == 0
    exact = li.agg(F.sum("l_quantity")).first()[0]
    assert got["sum_qty"] == exact


def test_cdc_apply_semantics(tmp_path, spark):
    """Pin last-writer-wins on a tiny hand-built orders table.

    Keys (all < 100 so % waves are easy to reason about):
      - 14: in base (14%10<8), U1 wave (14%7=0) and U2 wave (14%14=0)
            -> survives with status U2 (seq 2 beats seq 1).
      - 13: in base, D wave (13%13=0) -> removed.
      - 18: not in base (18%10=8), I wave -> appears with status NEW.
      - 11: in base, untouched -> unchanged.
    """
    import datetime as dt

    from projeto_de_etl_com_api_do_meta_spark.queries.segmentation_cdc import (
        warehouse_cdc_apply,
    )

    d = dt.datetime(2024, 1, 1)
    rows = [
        (14, 1, "O", 10.0, d, "1-URGENT"),
        (13, 2, "O", 20.0, d, "1-URGENT"),
        (18, 3, "O", 30.0, d, "1-URGENT"),
        (11, 4, "F", 40.0, d, "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.o_orderkey: r for r in warehouse_cdc_apply(spark, str(tmp_path)).collect()
    }
    assert set(out) == {14, 18, 11}
    assert out[14].o_orderstatus == "U2" and out[14].o_totalprice == 10.0
    assert out[18].o_orderstatus == "NEW" and out[18].o_custkey == 3
    assert out[11].o_orderstatus == "F"


# -- Changelog (retraction) aggregate maintenance -----------------------------


class TestChangelogAggMerge:
    def test_fully_retracted_group_drops_out(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
            changelog_agg_merge,
        )

        view = spark.createDataFrame(
            [("a", 2, 300), ("b", 1, 50)], "k string, n long, cents long"
        )
        # -D both 'a' rows, +I one 'c' row: 'a' must VANISH, not linger at 0
        delta = spark.createDataFrame(
            [("a", -2, -300), ("c", 1, 75)], "k string, n long, cents long"
        )
        out = {
            r.k: (r.n, r.cents)
            for r in changelog_agg_merge(view, delta, "k", "n").collect()
        }
        assert out == {"b": (1, 50), "c": (1, 75)}

    def test_update_as_retract_insert_moves_between_groups(self, spark):
        from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
            changelog_agg_merge,
        )

        view = spark.createDataFrame([("a", 3, 900)], "k string, n long, cents long")
        delta = spark.createDataFrame(
            [("a", -1, -300), ("b", 1, 300)], "k string, n long, cents long"
        )
        out = {
            r.k: (r.n, r.cents)
            for r in changelog_agg_merge(view, delta, "k", "n").collect()
        }
        assert out == {"a": (2, 600), "b": (1, 300)}
