"""Physical-plan shape assertions (SURVEY §4): the optimizations the engine
relies on at 100 TB must actually appear in the plans — predicate pushdown
and column pruning at the parquet scan, broadcast joins for dim tables,
partial (map-side) aggregation, and whole-stage codegen on the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan
    # Column pruning: the scan reads ONLY the two referenced columns.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_dim_join_broadcasts_small_side(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    df = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_groupby_has_partial_aggregation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _formatted_plan(df)
    # Partial (map-side) + final hash aggregate around one shuffle.
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_hot_path_stays_in_wholestage_codegen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.where(F.col("l_shipdate").isNotNull())
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # AQE finalizes (and codegen-compiles) only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans; the whole
    # filter->project->partial-agg pipeline must sit inside one.
    assert "*(1) HashAggregate" in plan
    assert "*(1) Filter" in plan


def test_date_filter_prunes_at_scan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    df = orders.where(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
    plan = _formatted_plan(df)
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_q9_broadcasts_all_dims_no_nested_loop(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.tpch_remaining import (
        q9_product_profit,
    )

    plan = _formatted_plan(q9_product_profit(spark, sf_dir))
    # part / supplier / nation are broadcast; the only shuffle join (if
    # any at this size) is lineitem<->orders; never a nested loop.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_is_single_window_no_self_join(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.tpch_remaining import (
        q2_min_cost_supplier,
    )

    plan = _formatted_plan(q2_min_cost_supplier(spark, sf_dir))
    # The correlated min runs as ONE window over the pair set, not a
    # second aggregate-join of the same scan.  (Formatted plans name each
    # node twice: "Window (n)" in the tree and "(n) Window" in details.)
    assert plan.count("Window (") == 1
    # distinct pairs aggregate map-side before any dimension join
    assert "HashAggregate" in plan


def test_scd2_join_is_hash_or_merge_on_entity_key(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
        join_scd2_point_in_time,
    )

    plan = _formatted_plan(join_scd2_point_in_time(spark, sf_dir))
    # equi-join on user_id with interval residual -> hash/merge join,
    # never a broadcast-nested-loop over the interval predicate.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_selective_fact_join_injects_runtime_bloom_filter(spark, sf_dir):
    """At 100 TB a selective dim-side predicate must prune the fact scan
    before the shuffle: Spark's runtime bloom filter builds a filter from
    the selective side and applies might_contain() on the fact side. The
    size thresholds are tuned for multi-GB scans, so the test lowers the
    application-side floor to fire at fixture scale."""
    from projeto_de_etl_com_api_do_meta_spark.session import scoped_conf

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    with scoped_conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        },
    ):
        df = li.join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        )
        plan = _formatted_plan(df)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_kmeans_broadcasts_centroids_every_iteration(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        embed_kmeans_lloyd,
    )

    plan = _formatted_plan(embed_kmeans_lloyd(spark, sf_dir))
    # each Lloyd round joins points against a BROADCAST centroid table —
    # never a shuffle join keyed on the k*dim side
    assert plan.count("BroadcastHashJoin") >= 2


def test_substring_dup_join_key_is_digest_not_raw_text(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        text_substring_dup_spans,
    )

    plan = _formatted_plan(text_substring_dup_spans(spark, sf_dir))
    # gram hashing happens BEFORE the exchange: the shuffled key is the md5
    # digest (fixed width), not the 50-char substring
    assert "md5" in plan
    assert plan.count("HashAggregate") >= 2


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a selectively-filtered dim must
    plan a dynamicpruning subquery on the partition column — the runtime
    analog of static partition pruning (SURVEY §4)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("event_date")
    )
    path = str(tmp_path / "events_by_date")
    events.write.mode("overwrite").partitionBy("event_date").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        events.select("event_date").distinct()
        .withColumn("is_hot", F.dayofmonth("event_date") == 3)
    )
    joined = fact.join(dim.where(F.col("is_hot")), "event_date")
    plan = _formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()


def test_rag_funnel_arms_are_depth_bounded_and_broadcast(spark):
    """pipeline_rag_funnel: both retriever arms end in
    TakeOrderedAndProject (depth bound before any fusion join) and the
    scalar stats/query-vector sides broadcast."""
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    plan = (
        QUERIES["pipeline_rag_funnel"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_colbert_maxsim_is_broadcast_codegen_no_python(spark, sf_dir):
    """The 64 chunk-cosines must stay JVM-side: broadcast NL join for the
    1-row query side, no BatchEvalPython/ArrowEvalPython anywhere, and no
    sort-merge/shuffle join of the candidate table."""
    from projeto_de_etl_com_api_do_meta_spark.queries.retrieval_extra import (
        retrieval_colbert_maxsim,
    )

    plan = _formatted_plan(retrieval_colbert_maxsim(spark, sf_dir))
    assert "Broadcast" in plan
    assert "EvalPython" not in plan  # no Python UDF on the scoring path
    assert "SortMergeJoin" not in plan


def test_hll_sketch_has_partial_max_aggregation(spark, sf_dir):
    """Register state must form map-side (partial_max) before the shuffle
    — the property that keeps the scan's shuffle O(groups x 64)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_sketches import (
        agg_hll_distinct_sketch,
    )

    plan = _formatted_plan(agg_hll_distinct_sketch(spark, sf_dir))
    assert "partial_max" in plan
    assert "EvalPython" not in plan


def test_bootstrap_fanout_aggregates_map_side(spark, sf_dir):
    """The x200 replicate fan-out must combine map-side into (type, rep)
    cells (partial_sum), never shuffle the exploded rows raw."""
    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        ml_bootstrap_ci_poisson,
    )

    plan = _formatted_plan(ml_bootstrap_ci_poisson(spark, sf_dir))
    assert "partial_sum" in plan
    assert "EvalPython" not in plan
