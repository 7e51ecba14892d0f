"""Aggregation queries (SURVEY.md §2.4: A4/A5/A6 + pivot R1-dynamic analog).

Numeric-stability policy: any aggregate whose value depends on float addition
order (sum/avg/stddev/corr over doubles) is computed from **exact decimal
sums** and finished with deterministic double arithmetic — identical on Spark
and DuckDB regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.safe_math import dec, dec2d, dec_sum
from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# -- A5: standard function battery -------------------------------------------

_ORACLE_AGG_BASIC = """
SELECT l_returnflag AS returnflag,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
       (CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS sum_qty,
       (CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) / COUNT(*) AS avg_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_basic_battery",
    oracle=_ORACLE_AGG_BASIC,
    tags=("agg",),
    doc="count / count-distinct ×2 / min / max / exact sum / avg per group (A5).",
)
def agg_basic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        cnt.alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        dec_sum("l_quantity").alias("sum_qty"),
        (dec2d(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
    )


# -- A5: stddev / variance from exact moments ---------------------------------

_ORACLE_AGG_STATS = """
SELECT l_linestatus AS linestatus,
       COUNT(*) AS n,
       (CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) * 10000 AS BIGINT) AS DOUBLE) / 10000) AS sum_disc,
       (CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 4) * 10000 AS BIGINT) AS DOUBLE) / 10000) AS sum_disc_sq,
       CASE WHEN COUNT(*) > 1 THEN
         sqrt(((CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 4) * 10000 AS BIGINT) AS DOUBLE) / 10000)
               - (CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) * 10000 AS BIGINT) AS DOUBLE) / 10000)
                 * (CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) * 10000 AS BIGINT) AS DOUBLE) / 10000) / COUNT(*))
              / (COUNT(*) - 1))
       ELSE 0.0 END AS stddev_disc
FROM lineitem
GROUP BY l_linestatus
"""


@register(
    "agg_stats_moments",
    oracle=_ORACLE_AGG_STATS,
    tags=("agg", "stats"),
    doc=(
        "Sample stddev computed from exact decimal moments (A5). At scale the "
        "two moment sums are a single map-side-combinable pass, unlike a "
        "naive two-pass stddev."
    ),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    s1 = dec2d(F.sum(dec("l_discount")), 4)
    s2 = dec2d(F.sum(dec("l_discount") * dec("l_discount")), 4)
    out = li.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        n.alias("n"), s1.alias("sum_disc"), s2.alias("sum_disc_sq")
    )
    return out.withColumn(
        "stddev_disc",
        F.when(
            F.col("n") > 1,
            F.sqrt(
                (
                    F.col("sum_disc_sq")
                    - F.col("sum_disc") * F.col("sum_disc") / F.col("n")
                )
                / (F.col("n") - 1)
            ),
        ).otherwise(F.lit(0.0)),
    )


# -- A5: approx_count_distinct (rows-only: approximate by design) -------------


@register(
    "agg_approx_distinct",
    oracle=None,
    tags=("agg", "approx"),
    doc=(
        "HyperLogLog++ approx distinct counts (A5). No SQL oracle — the "
        "estimate is engine-specific; correctness pinned by unit test vs "
        "exact counts within rsd bounds."
    ),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# -- A5: exact percentile -----------------------------------------------------

_ORACLE_PCTL = """
SELECT o_orderpriority AS priority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_percentiles",
    oracle=_ORACLE_PCTL,
    tags=("agg", "stats"),
    doc="Exact interpolated percentiles per group (A5), rounded to 4dp.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


# -- A5: collect_set rendered order-stable ------------------------------------

_ORACLE_COLLECT = """
SELECT n.n_name AS nation,
       array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',') AS segments
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register(
    "agg_collect_set",
    oracle=_ORACLE_COLLECT,
    tags=("agg",),
    doc="collect_set -> sorted CSV string (A5); order-stable across engines.",
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            )
        )
    )


# -- A6: rollup / cube / grouping sets ----------------------------------------

_ORACLE_ROLLUP = """
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
       GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS gid,
       COUNT(*) AS n_customers,
       (CAST(CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register(
    "agg_rollup_region_nation",
    oracle=_ORACLE_ROLLUP,
    tags=("agg", "rollup"),
    doc=(
        "ROLLUP(region, nation) with grouping_id (A6) — the native replacement "
        "for the reference's two-breakdown-scans-plus-merge pattern."
    ),
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("c_acctbal").alias("total_bal"),
    ).select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
        F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
        "gid",
        "n_customers",
        "total_bal",
    )


_ORACLE_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register(
    "agg_cube_flag_status",
    oracle=_ORACLE_CUBE,
    tags=("agg", "cube"),
    doc="CUBE(returnflag, linestatus) with grouping_id (A6).",
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_lines"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_lines",
        )
    )


_ORACLE_GSETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "agg_grouping_sets",
    oracle=_ORACLE_GSETS,
    tags=("agg",),
    doc="Explicit GROUPING SETS via Spark SQL (A6).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# -- R1-dynamic analog: pivot to wide columns ---------------------------------

_ORACLE_PIVOT = """
SELECT o_orderpriority AS priority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "pivot_status_counts",
    oracle=_ORACLE_PIVOT,
    tags=("pivot", "reference-parity"),
    doc=(
        "groupBy().pivot() to wide columns — the dynamic variant of the "
        "reference's actions pivot (transform.py:22-39, R1)."
    ),
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "priority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )
    return renamed


# -- Equi-width histogram ------------------------------------------------------

_ORACLE_HISTOGRAM = """
WITH bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT LEAST(CAST(floor((o_totalprice - b.lo) / ((b.hi - b.lo) / 20) )
             AS BIGINT), 19) AS bucket,
       count(*) AS n_orders
FROM orders, bounds b
GROUP BY 1
ORDER BY 1
"""


@register(
    "agg_histogram_equiwidth",
    oracle=_ORACLE_HISTOGRAM,
    tags=("agg", "analytics", "stats"),
    doc=(
        "20-bucket equi-width histogram of order totals with data-derived "
        "bounds: one tiny min/max scalar aggregate broadcast into a "
        "stateless bucket expression, then one map-side-combining count "
        "per bucket — two scans, no shuffle wider than 20 rows. The "
        "histogram-of-a-measure profile that feeds range-partitioning and "
        "skew decisions at scale. Bucket arithmetic is identical IEEE "
        "double ops on both engines; the top edge clamps into the last "
        "bucket (LEAST), matching half-open bins."
    ),
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / F.lit(20))
        ).cast("long"),
        F.lit(19).cast("long"),
    )
    return (
        orders.join(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("bucket")
    )


# -- Median (exact interpolated) + deterministic mode --------------------------

_ORACLE_MEDIAN_MODE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
mode_pick AS (
  SELECT l_returnflag, q AS mode_qty,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, q ASC) AS rn
  FROM counts
)
SELECT m.l_returnflag,
       med.median_qty,
       m.mode_qty
FROM mode_pick m
JOIN (
  SELECT l_returnflag,
         median(CAST(l_quantity AS DOUBLE)) AS median_qty
  FROM lineitem GROUP BY 1
) med USING (l_returnflag)
WHERE m.rn = 1
ORDER BY m.l_returnflag
"""


@register(
    "agg_median_mode",
    oracle=_ORACLE_MEDIAN_MODE,
    tags=("agg",),
    doc=(
        "Exact interpolated median (F.median, whole-stage sortable agg) "
        "plus DETERMINISTIC mode per group: built-in mode() is "
        "tie-arbitrary in any engine, so the mode is computed as "
        "count-per-value -> row_number ordered (count DESC, value ASC) — "
        "reproducible under any partitioning. Median values here are "
        "integers/half-integers, exact in double on both engines."
    ),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    med = li.groupBy("l_returnflag").agg(
        F.median(F.col("q").cast("double")).alias("median_qty")
    )
    counts = li.groupBy("l_returnflag", "q").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("q").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("q").alias("mode_qty"))
    )
    return (
        med.join(mode, "l_returnflag")
        .select("l_returnflag", "median_qty", "mode_qty")
        .orderBy("l_returnflag")
    )


# -- Bivariate sufficient statistics (exact integer moments) -------------------

_ORACLE_BIVARIATE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
       CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS sum_y_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_x2,
       CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * 100, 0)
                     AS BIGINT)
                * CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS sum_y2_cents2,
       CAST(SUM(CAST(l_quantity AS BIGINT)
                * CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS sum_xy
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "agg_bivariate_moments",
    oracle=_ORACLE_BIVARIATE,
    tags=("agg", "stats"),
    doc=(
        "Bivariate sufficient statistics per group — (n, Σx, Σy, Σx², Σy², "
        "Σxy) as exact integers (quantity x price-cents): everything "
        "covariance/correlation/OLS-slope needs, in ONE map-side-combinable "
        "pass, with the float division/sqrt deferred to the consumer so the "
        "distributed part stays bit-exact and mergeable across partitions "
        "(the classic parallel-statistics decomposition)."
    ),
)
def agg_bivariate_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(dec("l_extendedprice") * 100, 0).cast("long")
    t = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    return (
        t.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sum_x"),
            F.sum("y").alias("sum_y_cents"),
            F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
            F.sum(F.col("y") * F.col("y")).alias("sum_y2_cents2"),
            F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        )
        .orderBy("l_returnflag")
    )


# -- Target encoding (m-estimate, exact rational) ------------------------------

_TE_M = 10

_ORACLE_TARGET_ENCODE = f"""
WITH cat AS (
  SELECT o_orderstatus AS category,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS sum_cents
  FROM orders GROUP BY 1
),
g AS (
  SELECT COUNT(*) AS g_n,
         CAST(SUM(CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS g_sum
  FROM orders
)
SELECT category, n,
       CAST(sum_cents * g_n + {_TE_M} * g_sum AS BIGINT) AS enc_num,
       CAST((n + {_TE_M}) * g_n AS BIGINT) AS enc_den
FROM cat, g
ORDER BY category
"""


@register(
    "ml_target_encode_status",
    oracle=_ORACLE_TARGET_ENCODE,
    tags=("agg", "ml"),
    doc=(
        f"M-estimate target encoding (m={_TE_M}) of order status by mean "
        "order value: per-category sums blended with the global prior, "
        "emitted as an EXACT-RATIONAL (num, den) integer pair — the "
        "categorical-feature encoder for ML pipelines, computed in two "
        "map-side-combinable aggregates with the scalar prior broadcast; "
        "no float crosses the engine boundary."
    ),
)
def ml_target_encode_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(dec("o_totalprice") * 100, 0).cast("long")
    t = orders.select(F.col("o_orderstatus").alias("category"), cents.alias("c"))
    cat = t.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("sum_cents")
    )
    g = t.agg(F.count(F.lit(1)).alias("g_n"), F.sum("c").alias("g_sum"))
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "category",
            "n",
            (F.col("sum_cents") * F.col("g_n") + _TE_M * F.col("g_sum"))
            .cast("long")
            .alias("enc_num"),
            ((F.col("n") + _TE_M) * F.col("g_n")).cast("long").alias("enc_den"),
        )
        .orderBy("category")
    )


# -- Conditional aggregates (count_if / bool_and / bool_or / any_value) --------

_ORACLE_COND_AGG = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       bool_and(o_totalprice > 900) AS all_over_900,
       bool_or(o_orderstatus = 'O') AS any_open,
       MIN(o_orderkey) AS first_key
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "agg_conditional_battery",
    oracle=_ORACLE_COND_AGG,
    tags=("agg",),
    doc=(
        "Conditional-aggregate battery: count_if twice, bool_and/bool_or "
        "(every/any), deterministic first via MIN — the FILTER-clause "
        "family, all map-side combinable in one pass."
    ),
)
def agg_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.bool_and(F.col("o_totalprice") > 900).alias("all_over_900"),
            F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
            F.min("o_orderkey").alias("first_key"),
        )
        .orderBy("o_orderpriority")
    )


# -- Ordered string aggregation ------------------------------------------------

_ORACLE_STRING_AGG = """
SELECT n_regionkey AS regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
ORDER BY regionkey
"""


@register(
    "agg_string_concat_ordered",
    oracle=_ORACLE_STRING_AGG,
    tags=("agg",),
    doc=(
        "Deterministic ordered string aggregation (LISTAGG/string_agg "
        "analog): collect_list is order-arbitrary in a distributed engine, "
        "so the contract form is array_sort -> array_join — reproducible "
        "under any partitioning."
    ),
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("regionkey")
    )


# -- SQL PIVOT clause ----------------------------------------------------------

_ORACLE_SQL_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS st_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS st_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS st_pending
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "restructure_sql_pivot",
    oracle=_ORACLE_SQL_PIVOT,
    tags=("restructure", "pivot"),
    doc=(
        "SQL PIVOT clause (the declarative twin of DataFrame "
        ".pivot()/the operators.actions_pivot fixed path): status counts "
        "widened per priority; fixed IN-list so the schema is static and "
        "no pivot-value discovery scan runs."
    ),
)
def restructure_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus FROM orders_pv
        )
        PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS st_open,
                                              'F' AS st_finished,
                                              'P' AS st_pending))
        ORDER BY o_orderpriority
        """
    )


@register(
    "agg_quantile_sketch_eval",
    oracle=None,
    tags=("agg", "approx", "eval"),
    doc=(
        "Quantile-sketch calibration eval (the approx-family counterpart "
        "of embed_ann_recall_eval): percentile_approx(l_extendedprice) "
        "at sketch accuracies 100 / 1000 / 10000 against the exact "
        "interpolated percentile, reported as the realized RANK error "
        "in ppm next to the GK guarantee 1/accuracy (+ one rank of "
        "discretization slack, since the sketch returns an actual "
        "sample) — the contract is asserted empirically in tests. "
        "Rows-only: the sketch state is engine-specific by "
        "construction; what IS cross-checkable is the exact column and "
        "the bound, both included in the output. At 100 TB the sketch "
        "is the only viable path (mergeable, single-pass) and this eval "
        "is how its accuracy knob gets sized."
    ),
)
def agg_quantile_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    n = li.count()
    exact = li.agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("p50_exact")
    ).collect()[0]["p50_exact"]
    rows = []
    for acc in (100, 1000, 10000):
        approx = li.agg(
            F.percentile_approx(F.col("x"), F.lit(0.5), F.lit(acc)).alias("p")
        ).collect()[0]["p"]
        # realized rank of the approx answer vs the ideal n/2
        rank = li.where(F.col("x") <= approx).count()
        rank_err_ppm = int(abs(rank - n / 2) / n * 1_000_000)
        # bound = GK guarantee (1/accuracy) + one rank of discretization
        # slack: the returned value is an actual sample, so even a perfect
        # sketch sits up to 1 rank from the ideal n/2 (and the exact
        # median interpolates between two samples)
        bound_ppm = 1_000_000 // acc + -(-1_000_000 // n)
        rows.append(
            (acc, float(round(approx, 4)), float(round(exact, 4)),
             rank_err_ppm, bound_ppm)
        )
    return spark.createDataFrame(
        rows,
        "accuracy int, p50_approx double, p50_exact double, "
        "rank_err_ppm long, bound_ppm long",
    )


_ORACLE_GINI = """
WITH cents AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(18,4)) * 100, 0) AS BIGINT)
           - (SELECT CAST(round(CAST(MIN(c_acctbal) AS DECIMAL(18,4)) * 100,
                           0) AS BIGINT) FROM customer) AS x,
         c_custkey
  FROM customer
),
ranked AS (
  SELECT seg, x,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY x, c_custkey) AS i
  FROM cents
),
s AS (
  SELECT seg, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six
  FROM ranked GROUP BY seg
)
SELECT seg, CAST(n AS BIGINT) AS n,
       round(CAST(2 * six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS
             DOUBLE)) - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
         AS gini
FROM s ORDER BY seg
"""


@register(
    "agg_gini_inequality",
    oracle=_ORACLE_GINI,
    tags=("agg", "stats", "scale-audit-only"),
    doc=(
        "Gini coefficient of (min-shifted) account balances per market "
        "segment via the exact rank formula G = 2*sum(i*x_i)/(n*sum(x)) "
        "- (n+1)/n over values sorted ascending — the inequality / "
        "concentration metric for spend, token, or data-contribution "
        "distributions (corpus_source_concentration's HHI sibling at "
        "the individual level). Rank products and sums stay exact "
        "HUGEINT/decimal; one float expression per group. Tagged "
        "scale-audit-only for the same reason as the exact equi-depth "
        "histogram: the per-group rank is a total order (here 5 "
        "segments of the customer table); the 100 TB swap is the "
        "grouped-prefix-sum rank from operators/indexing.py or a "
        "binned approximation."
    ),
)
def agg_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    shift = cust.agg(
        F.round(F.min(dec("c_acctbal")) * 100, 0).cast("bigint").alias("m")
    )
    cents = cust.crossJoin(F.broadcast(shift)).select(
        F.col("c_mktsegment").alias("seg"),
        (
            F.round(dec("c_acctbal") * 100, 0).cast("bigint") - F.col("m")
        ).alias("x"),
        "c_custkey",
    )
    w = Window.partitionBy("seg").orderBy("x", "c_custkey")
    ranked = cents.withColumn("i", F.row_number().over(w))
    s = ranked.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("x")
        ).alias("six"),
    )
    n = F.col("n").cast("double")
    return s.select(
        "seg",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.lit(2) * F.col("six")).cast("double")
            / (n * F.col("sx").cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    ).orderBy("seg")


_GINI_BIN_CENTS = 1000  # 10-currency-unit bins over the ~1.1e6-cent domain

# binned Gini: within a bin every value takes the bin's MEAN rank
# (c_b + (n_b+1)/2), so 2*six ~= sum_b (2*c_b + n_b + 1) * S_b — all
# integer arithmetic, exact given the binning contract.
_ORACLE_GINI_APPROX = f"""
WITH cents AS (
  SELECT c_mktsegment AS seg,
         CAST(round(CAST(c_acctbal AS DECIMAL(18,4)) * 100, 0) AS BIGINT)
           - (SELECT CAST(round(CAST(MIN(c_acctbal) AS DECIMAL(18,4)) * 100,
                           0) AS BIGINT) FROM customer) AS x
  FROM customer
),
binned AS (
  SELECT seg, x // {_GINI_BIN_CENTS} AS b,
         CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(x) AS BIGINT) AS sb
  FROM cents GROUP BY seg, x // {_GINI_BIN_CENTS}
),
cum AS (
  SELECT seg, b, nb, sb,
         COALESCE(SUM(nb) OVER (PARTITION BY seg ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM binned
),
s AS (
  SELECT seg, SUM(nb) AS n, CAST(COUNT(*) AS BIGINT) AS n_bins,
         CAST(SUM(sb) AS HUGEINT) AS sx,
         CAST(SUM((2 * cb + nb + 1) * CAST(sb AS HUGEINT)) AS HUGEINT)
           AS two_six
  FROM cum GROUP BY seg
)
SELECT seg, CAST(n AS BIGINT) AS n, n_bins,
       round(CAST(two_six AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
         AS gini_approx
FROM s ORDER BY seg
"""


@register(
    "agg_gini_inequality_approx",
    oracle=_ORACLE_GINI_APPROX,
    tags=("agg", "stats", "approx", "scale-path"),
    doc=(
        "Scale-path Gini (r8 verdict item 5): min-shifted balances bin "
        "into fixed-width cent buckets (map-side-combinable hash "
        "aggregate, domain-bounded ~1100 bins per segment regardless of "
        "N), then the mean-rank binned formula 2*six = sum_b (2*cum_b + "
        "n_b + 1)*S_b over the TINY per-segment bin table — the rank "
        "window runs over bins, never rows, so no single-partition "
        "total order anywhere in the plan.  All integer products "
        "(decimal-exact), one float expression per segment; deviation "
        "from the exact form is bounded by within-bin dispersion.  The "
        "exact rank form (agg_gini_inequality) stays as the calibration "
        "baseline."
    ),
)
def agg_gini_inequality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    shift = cust.agg(
        F.round(F.min(dec("c_acctbal")) * 100, 0).cast("bigint").alias("m")
    )
    cents = cust.crossJoin(F.broadcast(shift)).select(
        F.col("c_mktsegment").alias("seg"),
        (
            F.round(dec("c_acctbal") * 100, 0).cast("bigint") - F.col("m")
        ).alias("x"),
    )
    binned = cents.groupBy(
        "seg", (F.col("x") - F.pmod("x", F.lit(_GINI_BIN_CENTS))).alias("bin0")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("x").cast("bigint").alias("sb"),
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("bin0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = binned.withColumn("cb", F.coalesce(F.sum("nb").over(w), F.lit(0)))
    s = cum.groupBy("seg").agg(
        F.sum("nb").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.col("sb").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            (F.lit(2) * F.col("cb") + F.col("nb") + F.lit(1)).cast(
                "decimal(38,0)"
            )
            * F.col("sb")
        ).alias("two_six"),
    )
    n = F.col("n").cast("double")
    return s.select(
        "seg",
        F.col("n").cast("bigint").alias("n"),
        "n_bins",
        F.round(
            F.col("two_six").cast("double") / (n * F.col("sx").cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini_approx"),
    ).orderBy("seg")


_ORACLE_REGR_BATTERY = """
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
       round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register(
    "agg_regr_battery",
    oracle=_ORACLE_REGR_BATTERY,
    tags=("agg", "stats"),
    doc=(
        "Built-in OLS regression aggregate family per group: regr_count/"
        "slope/intercept/r2/avgx/avgy of extendedprice on quantity — the "
        "ANSI bivariate battery as SINGLE-PASS aggregates (each is a "
        "moments combination, map-side combinable), complementing "
        "agg_bivariate_moments' exact-integer sufficient statistics with "
        "the engine-native forms. Rounding (4-6dp) absorbs the two "
        "engines' summation-order ulps on these well-conditioned groups "
        "— the raw moments path remains the bit-exact alternative when "
        "conditioning degrades."
    ),
)
def agg_regr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("bigint").alias("n"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_MOM_WATERFALL = """
WITH m AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100, 0)
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT ym, cents,
       cents - LAG(cents) OVER (ORDER BY ym) AS delta_cents,
       CASE WHEN LAG(cents) OVER (ORDER BY ym) IS NULL THEN NULL
            ELSE CAST(floor(1000000.0
                 * (cents - LAG(cents) OVER (ORDER BY ym))
                 / LAG(cents) OVER (ORDER BY ym)) AS BIGINT) END
         AS mom_change_ppm
FROM m ORDER BY ym
"""


@register(
    "agg_mom_waterfall",
    oracle=_ORACLE_MOM_WATERFALL,
    tags=("agg", "timeseries", "analytics"),
    doc=(
        "Month-over-month revenue waterfall: monthly totals in exact "
        "cents, absolute delta and relative change (floored ppm) via "
        "LAG over the months table — the BI bridge chart every finance "
        "review starts from. The window runs over one row per month "
        "(bounded by calendar, not data); the corpus-scale work is one "
        "hash aggregate."
    ),
)
def agg_mom_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("ym")
    ).agg(
        F.round(F.sum(dec("o_totalprice")) * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("ym")
    prev = F.lag("cents").over(w)
    return m.select(
        "ym",
        "cents",
        (F.col("cents") - prev).alias("delta_cents"),
        F.when(prev.isNull(), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(1000000.0) * (F.col("cents") - prev) / prev
            ).cast("bigint")
        )
        .alias("mom_change_ppm"),
    ).orderBy("ym")


# -- Exact distinct via Spark's native bitmap aggregates (r9) ------------------

_ORACLE_BITMAP_DISTINCT = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


@register(
    "agg_bitmap_distinct",
    oracle=_ORACLE_BITMAP_DISTINCT,
    tags=("agg", "scale"),
    doc=(
        "EXACT distinct users per event type via Spark's native bitmap "
        "aggregates (bitmap_bucket_number / bitmap_bit_position / "
        "bitmap_construct_agg / bitmap_count, Spark 3.5+): each 32768-id "
        "bucket folds into a fixed 4KB bitmap DURING the map-side "
        "partial aggregate, so the shuffle carries one bitmap per "
        "(group, bucket) instead of one row per distinct id — the exact "
        "middle ground between COUNT(DISTINCT)'s expand-shuffle and the "
        "HLL sketch's 2% error (agg_hll_distinct_sketch). The oracle is "
        "plain COUNT(DISTINCT): identical counts prove the bitmap path "
        "exact. This is how 100 TB exact-distinct rollups actually ship "
        "(bitmap columns persisted per partition, OR-merged at query "
        "time — the lakehouse pre-agg pattern)."
    ),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(user_id))"
        ).alias("bm"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )
