"""Round-10 analytics operators: warehouse calendar/BI rollups and
entity-resolution survivorship.

* ``warehouse_fiscal_445_rollup`` — the 4-4-5 retail fiscal calendar
  (13-week quarters split 4+4+5) computed with pure integer date
  arithmetic and rolled up to fiscal periods.
* ``agg_top_n_with_others`` — the classic BI presentation rollup: top-5
  brands by exact revenue plus a single merged 'Others' bucket.
* ``er_golden_record`` — survivorship after blocking: near-dup document
  clusters (8-token-prefix blocks) merged into one golden record per
  cluster under deterministic attribute-selection rules.
* ``warehouse_inventory_aging`` — aging-bucket analysis of open orders
  against the watermark date (0-30 / 31-90 / 91-365 / 366+ days) with
  exact integer shares.

Reference scope: the reference engine's pandas pipelines stop at
groupby-aggregate dimensional rollups (reference transform.py); these are
[EXT] warehouse-analytics surface mandated by SURVEY §2.10/§6.  Every
statistic is an exact BIGINT (cents, day counts, ppm shares) so the DuckDB
differ matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import REVENUE_SQL, revenue
from .registry import register

# ---------------------------------------------------------------------------
# 4-4-5 fiscal calendar rollup
# ---------------------------------------------------------------------------

#: Fiscal epoch (fiscal week 0, fiscal year 1994 starts here).  Chosen on a
#: Monday before the earliest order date so week indexes are non-negative.
_FISCAL_EPOCH = "1994-01-31"
_FISCAL_Y0 = 1994

_ORACLE_FISCAL_445 = f"""
WITH fo AS (
  SELECT date_diff('day', DATE '{_FISCAL_EPOCH}',
                   CAST(o_orderdate AS DATE)) // 7 AS wk,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_e2
  FROM orders
),
m AS (
  SELECT {_FISCAL_Y0} + wk // 52 AS fiscal_year,
         (wk % 52) // 13 + 1 AS fiscal_quarter,
         ((wk % 52) // 13) * 3
           + CASE WHEN (wk % 52) % 13 < 4 THEN 1
                  WHEN (wk % 52) % 13 < 8 THEN 2
                  ELSE 3 END AS fiscal_period,
         price_e2
  FROM fo
)
SELECT CAST(fiscal_year AS BIGINT) AS fiscal_year,
       CAST(fiscal_quarter AS BIGINT) AS fiscal_quarter,
       CAST(fiscal_period AS BIGINT) AS fiscal_period,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price_e2) AS BIGINT) AS revenue_e2
FROM m
GROUP BY 1, 2, 3
ORDER BY fiscal_year, fiscal_period
"""


@register(
    "warehouse_fiscal_445_rollup",
    oracle=_ORACLE_FISCAL_445,
    tags=("warehouse", "calendar"),
    doc=(
        "4-4-5 retail fiscal calendar rollup: order dates map to 13-week "
        "fiscal quarters split into 4+4+5-week periods by PURE integer "
        "arithmetic on the day offset from a fixed fiscal epoch (week = "
        "days//7, year = week//52, quarter = week-in-year//13, period "
        "from the week-in-quarter thresholds) — the calendar every "
        "retail/CPG warehouse reports on, and a mapping that needs no "
        "calendar dimension table because it IS arithmetic.  One "
        "map-side-combinable aggregate after a per-row expression; "
        "revenue in exact cents."
    ),
)
def warehouse_fiscal_445_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    wk = F.floor(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_FISCAL_EPOCH).cast("date"))
        / 7
    )
    wiy = wk % 52
    wiq = wiy % 13
    mapped = orders.select(
        (F.lit(_FISCAL_Y0) + F.floor(wk / 52)).cast("bigint").alias("fiscal_year"),
        (F.floor(wiy / 13) + 1).cast("bigint").alias("fiscal_quarter"),
        (
            F.floor(wiy / 13) * 3
            + F.when(wiq < 4, 1).when(wiq < 8, 2).otherwise(3)
        )
        .cast("bigint")
        .alias("fiscal_period"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint").alias("price_e2"),
    )
    return (
        mapped.groupBy("fiscal_year", "fiscal_quarter", "fiscal_period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_e2").cast("bigint").alias("revenue_e2"),
        )
        .orderBy("fiscal_year", "fiscal_period")
    )


# ---------------------------------------------------------------------------
# Top-N with a merged 'Others' bucket
# ---------------------------------------------------------------------------

_TOPN_BRANDS = 5

_ORACLE_TOPN_OTHERS = f"""
WITH rev AS (
  SELECT p.p_brand AS brand,
         CAST(round(SUM({REVENUE_SQL}) * 100, 0) AS BIGINT) AS revenue_e2,
         CAST(COUNT(*) AS BIGINT) AS n_lineitems
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
),
rk AS (
  SELECT *, row_number() OVER (ORDER BY revenue_e2 DESC, brand) AS rn
  FROM rev
)
SELECT CAST(rn AS BIGINT) AS rank, brand,
       revenue_e2, n_lineitems
FROM rk WHERE rn <= {_TOPN_BRANDS}
UNION ALL
SELECT CAST({_TOPN_BRANDS + 1} AS BIGINT) AS rank, 'Others' AS brand,
       CAST(SUM(revenue_e2) AS BIGINT) AS revenue_e2,
       CAST(SUM(n_lineitems) AS BIGINT) AS n_lineitems
FROM rk WHERE rn > {_TOPN_BRANDS}
HAVING COUNT(*) > 0  -- empty tail -> NO Others row (zero-row parity with
                     -- the Spark side's isNotNull guard)
ORDER BY rank
"""


@register(
    "agg_top_n_with_others",
    oracle=_ORACLE_TOPN_OTHERS,
    tags=("agg", "bi"),
    doc=(
        "Top-N-plus-Others presentation rollup: exact decimal brand "
        "revenue, the 5 largest brands ranked (revenue DESC, brand ASC "
        "tie-break), every remaining brand merged into ONE 'Others' row — "
        "the rollup behind almost every BI pie/pareto chart, done in two "
        "aggregates (per-brand, then the Others re-aggregate over the "
        "already brand-sized table, never over the fact table twice).  "
        "The brand table is dimension-sized, so the rank window is "
        "single-partition by design — bounded state, annotated."
    ),
)
def agg_top_n_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum(revenue()) * 100, 0).cast("bigint").alias("revenue_e2"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )
    # brand-cardinality table: the global window is bounded by the brand
    # domain (dozens), not the fact table — safe single partition.
    w = Window.orderBy(F.col("revenue_e2").desc(), "brand")
    rk = rev.withColumn("rn", F.row_number().over(w))
    top = rk.where(F.col("rn") <= _TOPN_BRANDS).select(
        F.col("rn").cast("bigint").alias("rank"),
        "brand",
        "revenue_e2",
        "n_lineitems",
    )
    others = (
        rk.where(F.col("rn") > _TOPN_BRANDS)
        .agg(
            F.sum("revenue_e2").cast("bigint").alias("revenue_e2"),
            F.sum("n_lineitems").cast("bigint").alias("n_lineitems"),
        )
        .select(
            F.lit(_TOPN_BRANDS + 1).cast("bigint").alias("rank"),
            F.lit("Others").alias("brand"),
            "revenue_e2",
            "n_lineitems",
        )
        .where(F.col("revenue_e2").isNotNull())  # empty tail -> no row
    )
    return top.unionByName(others).orderBy("rank")


# ---------------------------------------------------------------------------
# ER survivorship: golden record per near-dup block
# ---------------------------------------------------------------------------

_ORACLE_GOLDEN = """
WITH blocked AS (
  SELECT doc_id, lang, source, n_chars,
         md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS block_key
  FROM documents
),
clusters AS (
  SELECT block_key FROM blocked GROUP BY block_key HAVING COUNT(*) >= 2
),
members AS (
  SELECT b.* FROM blocked b JOIN clusters c USING (block_key)
),
golden AS (
  SELECT block_key, doc_id AS golden_doc_id, lang AS golden_lang,
         source AS golden_source
  FROM members
  QUALIFY row_number() OVER (PARTITION BY block_key
                             ORDER BY n_chars DESC, doc_id) = 1
)
SELECT m.block_key,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(m.doc_id) AS BIGINT) AS earliest_doc_id,
       CAST(MAX(m.n_chars) AS BIGINT) AS max_n_chars,
       CAST(SUM(m.n_chars) AS BIGINT) AS sum_n_chars,
       ANY_VALUE(g.golden_doc_id) AS golden_doc_id,
       ANY_VALUE(g.golden_lang) AS golden_lang,
       ANY_VALUE(g.golden_source) AS golden_source
FROM members m JOIN golden g USING (block_key)
GROUP BY m.block_key
ORDER BY m.block_key
"""


@register(
    "er_golden_record",
    oracle=_ORACLE_GOLDEN,
    tags=("dedup", "er", "north-star"),
    doc=(
        "Entity-resolution survivorship (golden record): documents are "
        "blocked on the md5 of their first 8 tokens (near-dup clusters "
        "share prefixes — the planted fixture near-dups swap words later "
        "in the text), multi-member blocks become entities, and ONE "
        "golden record per entity is built under deterministic "
        "survivorship rules — representative = longest text (tie: lowest "
        "doc_id), plus merged lineage attributes (member count, earliest "
        "id, char extremes).  The missing last step of every dedup "
        "pipeline: candidate pairs and components say WHAT matches, "
        "survivorship says what the surviving row LOOKS LIKE.  Block key "
        "is a hash — the groupBy/window both shuffle once on it, "
        "cluster-bounded state."
    ),
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    blocked = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 8), " ")).alias(
            "block_key"
        ),
    )
    clusters = (
        blocked.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("block_key")
    )
    members = blocked.join(clusters, "block_key")
    w = Window.partitionBy("block_key").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    golden = (
        members.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "block_key",
            F.col("doc_id").alias("golden_doc_id"),
            F.col("lang").alias("golden_lang"),
            F.col("source").alias("golden_source"),
        )
    )
    merged = members.groupBy("block_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("doc_id").cast("bigint").alias("earliest_doc_id"),
        F.max("n_chars").cast("bigint").alias("max_n_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
    )
    return merged.join(golden, "block_key").orderBy("block_key")


# ---------------------------------------------------------------------------
# Inventory / receivables aging buckets
# ---------------------------------------------------------------------------

_ORACLE_AGING = """
WITH anchor AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders
),
aged AS (
  SELECT CASE
           WHEN date_diff('day', CAST(o_orderdate AS DATE), a.d0) <= 30
             THEN '000-030'
           WHEN date_diff('day', CAST(o_orderdate AS DATE), a.d0) <= 90
             THEN '031-090'
           WHEN date_diff('day', CAST(o_orderdate AS DATE), a.d0) <= 365
             THEN '091-365'
           ELSE '366+'
         END AS age_bucket,
         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_e2
  FROM orders, anchor a
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
SELECT age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price_e2) AS BIGINT) AS value_e2,
       CAST(COUNT(*) * 1000000 // t.n AS BIGINT) AS share_ppm
FROM aged, tot t
GROUP BY age_bucket, t.n
ORDER BY age_bucket
"""


@register(
    "warehouse_inventory_aging",
    oracle=_ORACLE_AGING,
    tags=("warehouse", "bi"),
    doc=(
        "Aging-bucket analysis (receivables/inventory aging): each order "
        "is bucketed by integer day distance from the watermark date "
        "(the table's max order date) into the standard 30/90/365 "
        "brackets, with exact cent totals and integer ppm shares — the "
        "finance-ops staple report.  The anchor is ONE scalar aggregate "
        "broadcast into a per-row expression; everything else is one "
        "map-side-combinable groupBy.  Day arithmetic is integer-exact "
        "in both engines."
    ),
)
def warehouse_inventory_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("d0"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    age = F.datediff(F.col("d0"), F.col("o_orderdate").cast("date"))
    aged = (
        orders.join(F.broadcast(anchor), F.lit(True), "left")
        .select(
            F.when(age <= 30, "000-030")
            .when(age <= 90, "031-090")
            .when(age <= 365, "091-365")
            .otherwise("366+")
            .alias("age_bucket"),
            F.round(F.col("o_totalprice") * 100.0, 0)
            .cast("bigint")
            .alias("price_e2"),
            "n_total",
        )
    )
    return (
        aged.groupBy("age_bucket", "n_total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_e2").cast("bigint").alias("value_e2"),
        )
        .select(
            "age_bucket",
            "n_orders",
            "value_e2",
            F.floor(F.col("n_orders") * 1000000 / F.col("n_total"))
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("age_bucket")
    )
