"""Join matrix queries (SURVEY.md §2.3: J1 fan-out parity, J3 join kinds,
J4 broadcast, J5 theta/range).

Scale notes: dimension joins (`nation`, `region`, `supplier`) are explicitly
broadcast — at 100 TB the fact side never shuffles for these.  Fact-fact
joins shuffle on their equi-keys and rely on AQE for skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.safe_math import dec2d, dec_sum, safe_div
from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import REVENUE_SQL, dsum_sql, revenue
from .registry import register

# -- J3/J4: inner equi-join with broadcast dims --------------------------------

_ORACLE_JOIN_INNER = """
SELECT n.n_name AS nation, COUNT(*) AS num_customers,
       (CAST(CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) * 100 AS BIGINT) AS DOUBLE) / 100) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name <> 'EUROPE'
GROUP BY n.n_name
"""


@register(
    "join_inner_broadcast_dims",
    oracle=_ORACLE_JOIN_INNER,
    tags=("join", "broadcast"),
    doc="Inner equi-joins through two broadcast dimension tables (J3+J4).",
)
def join_inner_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") != "EUROPE")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            dec_sum("c_acctbal").alias("total_acctbal"),
        )
    )


# -- J3: left outer join with null side ---------------------------------------

_ORACLE_JOIN_LEFT = """
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS num_orders,
       (CAST(CAST(round(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0), 2)
             * 100 AS BIGINT) AS DOUBLE) / 100) AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
"""


@register(
    "join_left_outer",
    oracle=_ORACLE_JOIN_LEFT,
    tags=("join",),
    doc="Left outer join: all customers, order stats 0-filled (J3 + D3 null-fill).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            dec2d(F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), F.lit(0))).alias("total_spent"),
        )
    )


# -- J3: semi / anti ----------------------------------------------------------

_ORACLE_SEMI = """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
"""


@register(
    "join_left_semi",
    oracle=_ORACLE_SEMI,
    tags=("join",),
    doc="Left-semi join: customers having at least one big order (J3).",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return customer.join(
        big, big.o_custkey == customer.c_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


_ORACLE_ANTI = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register(
    "join_left_anti",
    oracle=_ORACLE_ANTI,
    tags=("join",),
    doc="Left-anti join: customers with no orders at all (J3).",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, orders.o_custkey == customer.c_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# -- J3: cross join -----------------------------------------------------------

_ORACLE_CROSS = """
SELECT r.r_name AS region_name, n.n_name AS nation_name
FROM region r CROSS JOIN nation n
"""


@register(
    "join_cross_small",
    oracle=_ORACLE_CROSS,
    tags=("join",),
    doc="Cross join of two small dims (J3); BroadcastNestedLoop under the hood.",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    )


# -- J5: equi + range predicate join ------------------------------------------

_ORACLE_RANGE = """
SELECT p.p_brand AS brand, COUNT(*) AS qty_near_size_lines
FROM part p
JOIN lineitem l
  ON l.l_partkey = p.p_partkey
 AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
GROUP BY p.p_brand
"""


@register(
    "join_range_pred",
    oracle=_ORACLE_RANGE,
    tags=("join", "range"),
    doc="Equi-join with an extra range predicate (J5): quantity within ±5 of part size.",
)
def join_range_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_partkey == part.p_partkey) & li.l_quantity.between(
        part.p_size - 5, part.p_size + 5
    )
    return (
        part.join(li, cond)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("qty_near_size_lines"))
    )


# -- J5: pure inequality (theta) join -----------------------------------------

_ORACLE_THETA = """
SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
"""


@register(
    "join_theta_ineq",
    oracle=_ORACLE_THETA,
    tags=("join", "theta"),
    doc="Pure inequality theta join on small dims (J5; BroadcastNestedLoop).",
)
def join_theta_ineq(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(n2, F.col("n1.n_regionkey") < F.col("n2.n_regionkey")).select(
        F.col("n1.n_name").alias("nation_a"), F.col("n2.n_name").alias("nation_b")
    )


# -- J1 parity: full-outer merge with fan-out + 0-fill -------------------------

_ORACLE_FANOUT = """
WITH demo AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority, COUNT(*) AS demo_orders
  FROM orders GROUP BY o_custkey, o_orderpriority
),
geo AS (
  SELECT DISTINCT c_custkey AS custkey, c_mktsegment AS segment
  FROM customer WHERE c_acctbal > 0
)
SELECT COALESCE(d.custkey, g.custkey) AS custkey,
       COALESCE(d.priority, 'none') AS priority,
       COALESCE(g.segment, 'none') AS segment,
       COALESCE(d.demo_orders, 0) AS demo_orders
FROM demo d FULL OUTER JOIN geo g ON d.custkey = g.custkey
"""


@register(
    "join_full_outer_fanout",
    oracle=_ORACLE_FANOUT,
    tags=("join", "reference-parity"),
    doc=(
        "Reference J1 parity (transform.py:132-146): full-outer merge of a "
        "demographic-grain aggregate with a deduped geo-grain subset; rows "
        "fan out per matching geo row, unmatched sides null-filled."
    ),
)
def join_full_outer_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    demo = orders.groupBy(
        F.col("o_custkey").alias("custkey"), F.col("o_orderpriority").alias("priority")
    ).agg(F.count(F.lit(1)).alias("demo_orders"))
    geo = (
        customer.where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    joined = demo.alias("d").join(
        geo.alias("g"), F.col("d.custkey") == F.col("g.custkey"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("d.custkey"), F.col("g.custkey")).alias("custkey"),
        F.coalesce(F.col("d.priority"), F.lit("none")).alias("priority"),
        F.coalesce(F.col("g.segment"), F.lit("none")).alias("segment"),
        F.coalesce(F.col("d.demo_orders"), F.lit(0)).alias("demo_orders"),
    )


# -- Multi-join pipeline (TPC-H Q5 shape) -------------------------------------

_ORACLE_Q5 = f"""
SELECT n.n_name AS nation,
       {dsum_sql(REVENUE_SQL)} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register(
    "q5_local_supplier_revenue",
    oracle=_ORACLE_Q5,
    tags=("join", "agg", "flagship"),
    doc="TPC-H Q5-shaped 6-way join: broadcast dims + fact-fact shuffle join.",
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        region.where(F.col("r_name") == "ASIA")
        .join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dec2d(F.sum(revenue())).alias("revenue"))
    )


# -- J3: right outer -----------------------------------------------------------

_ORACLE_RIGHT = """
SELECT o.o_orderkey, o.o_orderstatus, c.c_name
FROM customer c RIGHT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 13 = 0
"""


@register(
    "join_right_outer",
    oracle=_ORACLE_RIGHT,
    tags=("join",),
    doc="Right outer equi-join (J3): orders kept even without a customer match.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 0)
    return customer.join(
        orders, orders.o_custkey == customer.c_custkey, "right"
    ).select("o_orderkey", "o_orderstatus", "c_name")


# -- J5+: as-of (point-in-time) join ------------------------------------------

# Explicit ROW_NUMBER form rather than DuckDB's native ASOF JOIN: with
# several right rows at the SAME timestamp the native ASOF winner is
# unspecified, while the operator's documented tie contract is "greatest
# payload struct" (r8 degenerate-fixture2) — the DESC chain below states
# exactly that.  Same contract in _ORACLE_ASOF_FWD / _ORACLE_ASOF_TOLERANCE.
_ORACLE_ASOF = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts AS vts, event_id AS view_id, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT event_id, user_id, ts, value, view_id, view_value FROM (
  SELECT c.event_id, c.user_id, c.ts, c.value, v.view_id, v.view_value,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY v.vts DESC, v.view_id DESC, v.view_value DESC
         ) AS rn
  FROM clicks c LEFT JOIN views v
    ON c.user_id = v.user_id AND v.vts <= c.ts
) WHERE rn = 1
"""


@register(
    "join_asof_events",
    oracle=_ORACLE_ASOF,
    tags=("join", "asof", "timeseries"),
    doc=(
        "As-of join: each click joined to the user's most recent prior view "
        "via the union+carry-forward window (one shuffle, no range product) "
        "— oracle: DuckDB's native ASOF LEFT JOIN."
    ),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(clicks, views, key="user_id", ts="ts", payload_cols=["view_id", "view_value"])


# -- J5: pure range (interval) join, binned ------------------------------------

_ORACLE_RANGE_BINNED = """
SELECT e1.event_id AS click_id, e2.event_id AS purchase_id
FROM events e1 JOIN events e2
  ON e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL '5 minutes'
WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
"""


@register(
    "join_range_binned",
    oracle=_ORACLE_RANGE_BINNED,
    tags=("join", "range", "scale"),
    doc=(
        "Pure interval join (purchases within 5 min after each click) via "
        "bin replication: equi-join on a 5-min time bin (right side "
        "replicated 2x) + exact refine — O(matches), not the O(|L|x|R|) "
        "nested loop a bare range predicate plans. Oracle: the naive "
        "inequality join."
    ),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import binned_interval_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts"
    )
    return binned_interval_join(clicks, purchases, window_us=300_000_000).select(
        "click_id", "purchase_id"
    )


_ORACLE_NULLSAFE = """
WITH t AS (
  SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, COUNT(*) AS n
  FROM customer GROUP BY 1
)
SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b
FROM t a JOIN t b ON a.seg IS NOT DISTINCT FROM b.seg
"""


@register(
    "join_null_safe_eq",
    oracle=_ORACLE_NULLSAFE,
    tags=("join",),
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match "
        "each other instead of dropping — the semantics a plain equi-join "
        "silently loses. Still a hash-joinable condition (null is one key "
        "value), unlike an OR-of-IS-NULL rewrite which degrades to a "
        "nested loop."
    ),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    t = cust.groupBy(
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = t.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))
    b = t.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))
    return a.join(b, a.seg_a.eqNullSafe(b.seg_b)).select(
        "seg_a", "seg_b", "n_a", "n_b"
    )


# -- Fuzzy string join (block -> edit-distance verify) ------------------------

_ORACLE_FUZZY = """
WITH v AS (SELECT DISTINCT p_name FROM part),
t AS (SELECT p_name, string_split(p_name, ' ')[2] AS noun FROM v)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name_a, name_b
"""


@register(
    "join_fuzzy_levenshtein",
    oracle=_ORACLE_FUZZY,
    tags=("join", "similarity", "text"),
    doc=(
        "Fuzzy string join: near-matching part names (edit distance <= 3) "
        "found as block -> verify, the same candidate-generation discipline "
        "as the near-dup ops — dedup the corpus to its name vocabulary "
        "first (tiny), block on a shared token so the quadratic verify "
        "runs inside blocks only, and never levenshtein the raw corpus "
        "cross product. At 100 TB the vocabulary join-back to rows is an "
        "equi-join; the fuzzy part stays vocabulary-sized."
    ),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    part = load_table(spark, sf_dir, "part")
    vocab = part.select("p_name").distinct()
    t = vocab.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("noun")
    )
    a = t.select(F.col("p_name").alias("name_a"), F.col("noun"))
    b = t.select(F.col("p_name").alias("name_b"), F.col("noun"))
    return (
        a.join(b, "noun")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .where(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


_ORACLE_ASOF_FWD = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts AS pts, event_id AS purchase_id, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id, ts, purchase_id, purchase_value FROM (
  SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_value,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY p.pts ASC, p.purchase_id DESC, p.purchase_value DESC
         ) AS rn
  FROM clicks c LEFT JOIN purchases p
    ON c.user_id = p.user_id AND p.pts >= c.ts
) WHERE rn = 1
"""


@register(
    "join_asof_forward",
    oracle=_ORACLE_ASOF_FWD,
    tags=("join", "asof", "timeseries"),
    doc=(
        "FORWARD as-of join: each click joined to the user's next purchase "
        "at-or-after it (attribution lookahead). Same one-shuffle "
        "union+carry pass as the backward form with the window frame "
        "flipped (first-over-following instead of last-over-preceding) — "
        "oracle: DuckDB native ASOF LEFT JOIN with a >= condition."
    ),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        ts="ts",
        payload_cols=["purchase_id", "purchase_value"],
        direction="forward",
    )


# ---------------------------------------------------------------------------
# Interval x interval overlap join (binned, exactly-once per pair).
# ---------------------------------------------------------------------------

#: Campaign flight windows: 10 campaigns, campaign i live for 5 days from
#: 2024-01-01 + 3i days (microsecond epochs; deliberately overlapping).
_IV_BASE_US = 1_704_067_200_000_000  # epoch_us('2024-01-01 00:00:00 UTC')
_IV_DAY_US = 86_400_000_000
_IV_N_CAMPAIGNS = 10

_ORACLE_INTERVAL_OVERLAP = f"""
WITH act AS (
  SELECT user_id, CAST(ts AS DATE) AS event_date,
         MIN(epoch_us(ts)) AS s1, MAX(epoch_us(ts)) AS e1
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
camp AS (
  SELECT i AS campaign_id,
         {_IV_BASE_US} + i * 3 * {_IV_DAY_US} AS s2,
         {_IV_BASE_US} + i * 3 * {_IV_DAY_US} + 5 * {_IV_DAY_US} AS e2
  FROM unnest(range(0, {_IV_N_CAMPAIGNS})) AS r(i)
)
SELECT a.user_id, a.event_date, c.campaign_id,
       least(a.e1, c.e2) - greatest(a.s1, c.s2) AS overlap_us
FROM act a JOIN camp c ON a.s1 <= c.e2 AND c.s2 <= a.e1
ORDER BY a.user_id, a.event_date, c.campaign_id
"""


@register(
    "join_interval_overlap",
    oracle=_ORACLE_INTERVAL_OVERLAP,
    tags=("join", "range", "scale", "north-star"),
    doc=(
        "Interval x interval OVERLAP join: per-(user, day) activity spans "
        "against overlapping 5-day campaign flight windows, reporting "
        "every overlapping pair with its overlap length. The general form "
        "of the point-in-window bin join (J5): both sides replicate to "
        "the day buckets their interval touches, the join is an equi-join "
        "on the bucket, and each pair is emitted only in the bucket "
        "holding its overlap start — exactly-once WITHOUT a distinct, so "
        "no second corpus-wide shuffle. Oracle: the naive inequality "
        "join. At 100 TB the replication factor is interval/bucket + 1 "
        "per row and the bucket key spreads uniformly."
    ),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    act = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("event_date")
    ).agg(
        F.min(F.unix_micros("ts")).alias("s1"),
        F.max(F.unix_micros("ts")).alias("e1"),
    )
    camp = spark.range(_IV_N_CAMPAIGNS).select(
        F.col("id").alias("campaign_id"),
        (F.lit(_IV_BASE_US) + F.col("id") * 3 * _IV_DAY_US).alias("s2"),
        (
            F.lit(_IV_BASE_US) + F.col("id") * 3 * _IV_DAY_US + 5 * _IV_DAY_US
        ).alias("e2"),
    )
    pairs = interval_overlap_join(
        act, camp, ("s1", "e1"), ("s2", "e2"), _IV_DAY_US
    )
    return pairs.select(
        "user_id",
        "event_date",
        "campaign_id",
        (F.least("e1", "e2") - F.greatest("s1", "s2")).alias("overlap_us"),
    ).orderBy("user_id", "event_date", "campaign_id")


# -- Bloom-gated semi-join reduction ------------------------------------------

_BSJ_M = 1 << 17  # bloom bits (16 KB — bounded sketch state)
_BSJ_K = 3        # probe hashes

_ORACLE_BLOOM_SEMI = f"""
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS sum_total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 9000
GROUP BY c.c_nationkey
ORDER BY nationkey
"""


@register(
    "join_bloom_semi_reduction",
    oracle=_ORACLE_BLOOM_SEMI,
    tags=("join", "bloom", "scale-path", "north-star"),
    doc=(
        "Bloom-gated semi-join reduction: a selective dimension predicate "
        "(high-balance customers) must prune the FACT side before the "
        "join's shuffle, not after. The dimension's join keys fold into a "
        "16 KB bloom bitset via one map-side-combinable bit_or aggregate "
        "(operators/text.py bloom_build — the shuffle carries at most "
        "m/64 rows, the driver holds only sketch state); the fact scan "
        "then drops non-members with a codegen'd literal-bitset test "
        "BEFORE any exchange, and the exact equi-join afterwards removes "
        "the bloom's false positives, so results are byte-identical to "
        "the plain join (the oracle IS the plain join). At sf0.01 the "
        "dim side broadcasts anyway; the operator's value is at 100 TB, "
        "where BOTH sides exceed broadcast thresholds and shuffle — the "
        "bloom cuts the fact side's shuffled bytes by the dimension "
        "selectivity (~10% here) for 16 KB of plan state, exactly what "
        "Spark's runtime bloom join filter does, made explicit, "
        "deterministic, and available on any join shape. Reference "
        "analog: the full-outer merge at transform.py:39-44 never "
        "prefilters — at pandas scale it cannot matter; at cluster "
        "scale it is the difference between shuffling 100 TB and 10 TB."
    ),
)
def join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bloom_build, bloom_might_contain

    pin_query_session_conf(spark)
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_nationkey")
    )
    bits = bloom_build(cust, "c_custkey", _BSJ_M, _BSJ_K)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    gated = orders.where(
        bloom_might_contain(bits, "o_custkey", _BSJ_M, _BSJ_K)
    )
    return (
        gated.join(cust, gated.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("sum_total"),
        )
        .orderBy("nationkey")
    )


# -- As-of NEAREST join (either direction, tie -> backward) --------------------

_ORACLE_ASOF_NEAREST = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts AS vts, event_id AS view_id
  FROM events WHERE event_type = 'view'
),
cand AS (
  SELECT c.event_id, c.user_id, c.ts, v.view_id, v.vts
  FROM clicks c LEFT JOIN views v ON c.user_id = v.user_id
)
SELECT event_id, user_id, ts, view_id FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY event_id
           ORDER BY abs(epoch_us(vts) - epoch_us(ts)),
                    CASE WHEN vts <= ts THEN 0 ELSE 1 END,
                    view_id DESC  -- greatest-payload tie contract (r8)
         ) AS rn
  FROM cand
) WHERE rn = 1
"""


@register(
    "join_asof_nearest",
    oracle=_ORACLE_ASOF_NEAREST,
    tags=("join", "asof", "timeseries"),
    doc=(
        "NEAREST as-of join (pandas merge_asof direction='nearest'): each "
        "click matched to the user's closest view in EITHER time "
        "direction, ties preferring the earlier (backward) side. "
        "Composed from the backward and forward as-of passes (each the "
        "one-shuffle union+carry window, operators/asof.py) joined on the "
        "left key with a pure-expression argmin — no range product "
        "anywhere; the oracle is the naive per-click argmin over all "
        "same-user views. Completes the as-of family: backward "
        "(join_asof_events), forward (join_asof_forward), binned-range "
        "(join_range_binned), nearest (this)."
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view")
    b = asof_join(
        clicks,
        views.select(
            "user_id",
            "ts",
            F.col("event_id").alias("b_view"),
            F.col("ts").alias("b_vts"),
        ),
        key="user_id",
        ts="ts",
        payload_cols=["b_view", "b_vts"],
        direction="backward",
    )
    f = asof_join(
        clicks,
        views.select(
            "user_id",
            "ts",
            F.col("event_id").alias("f_view"),
            F.col("ts").alias("f_vts"),
        ),
        key="user_id",
        ts="ts",
        payload_cols=["f_view", "f_vts"],
        direction="forward",
    )
    both = b.join(f.select("event_id", "f_view", "f_vts"), "event_id")
    back_delta = F.unix_micros("ts") - F.unix_micros("b_vts")
    fwd_delta = F.unix_micros("f_vts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("b_view").isNull(), F.col("f_view"))
        .when(F.col("f_view").isNull(), F.col("b_view"))
        .when(back_delta <= fwd_delta, F.col("b_view"))
        .otherwise(F.col("f_view"))
    )
    return both.select(
        "event_id", "user_id", "ts", nearest.alias("view_id")
    )


# -- Gaps and islands (consecutive same-type runs per user) --------------------

_ORACLE_ISLANDS = """
WITH isl AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
),
runs AS (
  SELECT user_id, island_id, event_type, COUNT(*) AS run_len
  FROM isl GROUP BY 1, 2, 3
)
SELECT event_type, run_len, COUNT(*) AS n_islands
FROM runs GROUP BY 1, 2
ORDER BY event_type, run_len
"""


@register(
    "events_gaps_islands",
    oracle=_ORACLE_ISLANDS,
    tags=("events", "window"),
    doc=(
        "Gaps-and-islands: maximal runs of consecutive same-type events "
        "per user (the classic sessionless streak analysis — retries, "
        "repeated errors, binge behavior), summarized as the run-length "
        "distribution per event type. One per-user window pass (break "
        "flag via lag + running sum island ids; deterministic (ts, "
        "event_id) ordering) feeding two hash aggregates. Windows "
        "partition on user_id — millions of small partitions, no "
        "one-reducer funnel; the repo's grouped-prefix-sum operators are "
        "the swap if a single user's history outgrows a task."
    ),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    isl = ev.withColumn("brk", brk).withColumn(
        "island_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = isl.groupBy("user_id", "island_id", "event_type").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type", "run_len")
        .agg(F.count(F.lit(1)).alias("n_islands"))
        .orderBy("event_type", "run_len")
    )


_ORACLE_ASOF_TOLERANCE = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts AS vts, event_id AS view_id, value AS view_value
  FROM events WHERE event_type = 'view'
),
matched AS (
  SELECT event_id, user_id, ts, value, vts, view_id, view_value FROM (
    SELECT c.event_id, c.user_id, c.ts, c.value, v.vts, v.view_id,
           v.view_value,
           ROW_NUMBER() OVER (
             PARTITION BY c.event_id
             ORDER BY v.vts DESC, v.view_id DESC, v.view_value DESC
           ) AS rn
    FROM clicks c LEFT JOIN views v
      ON c.user_id = v.user_id AND v.vts <= c.ts
  ) WHERE rn = 1
)
SELECT event_id, user_id, ts, value,
       CASE WHEN vts >= ts - INTERVAL '10 minutes' THEN view_id END
         AS view_id,
       CASE WHEN vts >= ts - INTERVAL '10 minutes' THEN view_value END
         AS view_value
FROM matched
"""


@register(
    "join_asof_tolerance",
    oracle=_ORACLE_ASOF_TOLERANCE,
    tags=("join", "asof", "timeseries"),
    doc=(
        "As-of join with a match horizon (pandas merge_asof(tolerance=...)"
        " analog, operators/asof.py tolerance_us): each click takes the "
        "user's most recent prior view ONLY if it is at most 10 minutes "
        "old, else NULL — the staleness guard every feature-store "
        "point-in-time lookup needs (a price/feature older than the "
        "horizon must not leak into the example). Same one-shuffle "
        "union+carry window as join_asof_events; the horizon is a pure "
        "post-filter on the carried timestamp, no extra shuffle. Oracle: "
        "DuckDB ASOF LEFT JOIN with a CASE horizon."
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks,
        views,
        key="user_id",
        ts="ts",
        payload_cols=["view_id", "view_value"],
        tolerance_us=10 * 60 * 1_000_000,
    )


# -- spatial neighbor join via grid bucketing ---------------------------------

_GEO_CELL = 50      # grid cell edge, centi-degrees (0.5 deg)
_GEO_R2 = 2500      # radius^2 in centi-degree^2 (0.5 deg radius)

_ORACLE_GEO_GRID = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST((c_custkey * 37) % 4000 - 2000 AS BIGINT) AS lat_c,
         CAST((c_custkey * 101) % 4000 - 2000 AS BIGINT) AS lon_c
  FROM customer
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         (a.lat_c - b.lat_c) * (a.lat_c - b.lat_c)
         + (a.lon_c - b.lon_c) * (a.lon_c - b.lon_c) AS dist2
  FROM pts a JOIN pts b
    ON a.id < b.id
   AND abs(a.lat_c - b.lat_c) <= {_GEO_CELL}
   AND abs(a.lon_c - b.lon_c) <= {_GEO_CELL}
  WHERE (a.lat_c - b.lat_c) * (a.lat_c - b.lat_c)
        + (a.lon_c - b.lon_c) * (a.lon_c - b.lon_c) <= {_GEO_R2}
)
SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2
FROM pairs ORDER BY dist2, id_a, id_b LIMIT 200
"""


@register(
    "join_spatial_grid_neighbors",
    oracle=_ORACLE_GEO_GRID,
    tags=("join", "spatial", "scale"),
    doc=(
        "Spatial neighbor join via GRID BUCKETING, the distributed "
        "spatial-join pattern (Sedona/GeoSpark's partitioning idea in "
        "miniature): each point lands in one 0.5-degree cell, the LEFT "
        "side replicates to its 3x3 neighborhood cells, and the join is "
        "an EQUI-join on the cell id + exact radius refine — O(points "
        "x local density), never the O(N^2) nested loop a bare distance "
        "predicate plans (and each qualifying pair matches exactly once "
        "because only one side replicates). Geometry is exact integer "
        "centi-degrees (squared distances as BIGINT — no trig or float "
        "crosses the oracle); coordinates are synthesized "
        "deterministically from c_custkey (the fixture has no geo "
        "columns — same augment-then-operate contract as the web "
        "queries). Oracle: the naive inequality join with the same "
        "radius."
    ),
)
def join_spatial_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 37) % 4000 - 2000).cast("long").alias("lat_c"),
        ((F.col("c_custkey") * 101) % 4000 - 2000).cast("long").alias("lon_c"),
    )
    cell = lambda c: F.expr(f"CAST({c} AS BIGINT) div {_GEO_CELL}")  # noqa: E731
    # left replicated to the 3x3 neighborhood; right stays in its own cell
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat_c").alias("lat_a"),
        F.col("lon_c").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cell("lat_c") + dy).alias("cy"),
                        (cell("lon_c") + dx).alias("cx"),
                    )
                    for dy, dx in offsets
                ]
            )
        ).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", "cell.cy", "cell.cx")
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat_c").alias("lat_b"),
        F.col("lon_c").alias("lon_b"),
        cell("lat_c").alias("cy"),
        cell("lon_c").alias("cx"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(b, ["cy", "cx"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
        .where(F.col("dist2") <= _GEO_R2)
        .orderBy("dist2", "id_a", "id_b")
        .limit(200)
    )
