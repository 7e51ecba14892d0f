"""Bucketed-join co-location (SURVEY §7 100-TB posture): pre-bucketing both
sides of a recurring join on the key removes the per-query shuffle — the
at-rest analog of `repartition` that survives across jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(4, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_b")
    )
    yield spark.table("orders_b"), spark.table("customer_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, customer_b = bucketed
    # Force the non-broadcast path so the join must co-locate via buckets.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = orders_b.join(customer_b, orders_b.o_custkey == customer_b.c_custkey)
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    orders_b, customer_b = bucketed
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert (
        orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        ).count()
        == plain
    )


def test_registry_bucketed_join_consumes_bucket_layout(spark, sf_dir):
    """The registry query's executed join subtree must read both bucketed
    scans directly — local sorts only, no Exchange between scan and join."""
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    df = QUERIES["layout_bucketed_join_roundtrip"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Bucketed: true") == 2
    i = final.find("SortMergeJoin")
    assert i != -1
    # subtree from the join to the end of its second scan: everything the
    # join consumes.  Cut at the aggregate above it (appears before SMJ).
    subtree = final[i:]
    assert "Exchange" not in subtree, subtree[:500]
