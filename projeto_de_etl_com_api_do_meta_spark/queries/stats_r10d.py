"""Round-10d statistics / warehouse / codec additions.

* ``ml_ljung_box`` — portmanteau white-noise test per event type: exact
  integer ACF numerators (the n*x - S residual trick of
  ``events_autocorrelation_daily``), each r_k e9-fixed, Q assembled from
  the fixed points identically in both engines.
* ``ml_kendall_w`` — Kendall's coefficient of concordance (do the k
  event types agree on which days were big?) with half-unit tie ranks.
* ``ml_grubbs_test`` — max-studentized-residual outlier statistic with
  the argmax decided by the exact INTEGER key |n*x - S|.
* ``warehouse_factless_coverage`` — the factless-fact coverage query:
  which (nation, month) cells saw no orders, from a dimension-grid
  anti-join.
* ``corpus_ascii85_roundtrip`` — from-scratch Ascii85 text armor
  encode/decode through Arrow-batched pandas UDFs; byte lengths are
  recomputed analytically by the oracle and the decode must reproduce
  the original text exactly.

Determinism contract as elsewhere: exact integers / fixed points before
any cross-row sum; one final float expression per readout.  Reference
scope: [EXT] SURVEY §6 analytics surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import grand_median2_spine
from .registry import register

# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test per event type
# ---------------------------------------------------------------------------

_LB_MAX_LAG = 7

_ORACLE_LJUNG_BOX = f"""
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
idx AS (
  SELECT g, ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS t, x FROM daily
),
tot AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM idx GROUP BY g
),
cent AS (
  SELECT idx.g, t, CAST(tot.n * x - tot.s AS BIGINT) AS r, tot.n
  FROM idx JOIN tot ON tot.g = idx.g
),
den AS (SELECT g, CAST(SUM(r * r) AS BIGINT) AS d2 FROM cent GROUP BY g),
lags AS (
  SELECT a.g, l.lag,
         CAST(SUM(a.r * b.r) AS BIGINT) AS num
  FROM (SELECT unnest(range(1, {_LB_MAX_LAG} + 1)) AS lag) l
  JOIN cent a ON TRUE
  JOIN cent b ON b.g = a.g AND b.t = a.t + l.lag
  GROUP BY a.g, l.lag
),
rk AS (
  SELECT lags.g, lag,
         CAST(round(CAST(num AS DOUBLE) * 1000000000.0 / den.d2) AS BIGINT)
           AS r_e9
  FROM lags JOIN den ON den.g = lags.g
)
SELECT rk.g AS event_type, tot.n AS n_days,
       CAST(SUM(rk.r_e9 * rk.r_e9) AS BIGINT) AS sum_r2_e18,
       round(CAST(tot.n AS DOUBLE) * (tot.n + 2)
             * SUM(CAST(round(CAST(rk.r_e9 AS DOUBLE) * rk.r_e9
                              / 1000000.0 / (tot.n - rk.lag)) AS BIGINT))
             / 1000000000000.0,
             6) AS q_stat
FROM rk JOIN tot ON tot.g = rk.g
GROUP BY rk.g, tot.n
"""


@register(
    "ml_ljung_box",
    oracle=_ORACLE_LJUNG_BOX,
    tags=("ml", "stats", "timeseries"),
    doc=(
        f"Ljung-Box portmanteau white-noise test at lags 1..{_LB_MAX_LAG} "
        "per event type: ACF numerators/denominators are exact BIGINTs "
        "via the n*x - S integer residual trick, each r_k is e9-FIXED "
        "before use, and Q = n(n+2) sum r_k^2/(n-k) is assembled from "
        "those integers by one identical float expression — the "
        "cross-lag sum is over 7 deterministic terms ordered by the "
        "GROUP BY, but each term is a function of integers so order "
        "cannot change the rounded result.  Lag joins run on the "
        "calendar-bounded daily spine, never raw events."
    ),
)
def ml_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    idx = daily.select(
        "g",
        F.row_number().over(Window.partitionBy("g").orderBy("d")).alias("t"),
        "x",
    )
    tot = idx.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = idx.join(tot, "g").select(
        "g", "t", (F.col("n") * F.col("x") - F.col("s")).cast("bigint").alias("r")
    )
    den = cent.groupBy("g").agg(F.sum(F.col("r") * F.col("r")).cast("bigint").alias("d2"))
    lag_df = spark.range(1, _LB_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = cent.alias("a")
    b = cent.select(
        F.col("g").alias("bg"), F.col("t").alias("bt"), F.col("r").alias("br")
    )
    lags = (
        a.crossJoin(F.broadcast(lag_df))
        .join(
            b,
            (F.col("bg") == F.col("a.g"))
            & (F.col("bt") == F.col("a.t") + F.col("lag")),
        )
        .groupBy(F.col("a.g").alias("g"), "lag")
        .agg(F.sum(F.col("a.r") * F.col("br")).cast("bigint").alias("num"))
    )
    rk = lags.join(den, "g").select(
        "g",
        "lag",
        F.round(F.col("num").cast("double") * 1000000000.0 / F.col("d2"))
        .cast("bigint")
        .alias("r_e9"),
    )
    return (
        rk.join(tot, "g")
        .groupBy("g", "n")
        .agg(
            F.sum(F.col("r_e9") * F.col("r_e9")).cast("bigint").alias("sum_r2_e18"),
            F.round(
                F.col("n").cast("double")
                * (F.col("n") + 2)
                * F.sum(
                    F.round(
                        F.col("r_e9").cast("double")
                        * F.col("r_e9")
                        / 1000000.0
                        / (F.col("n") - F.col("lag"))
                    ).cast("bigint")
                )
                / 1000000000000.0,
                6,
            ).alias("q_stat"),
        )
        .select(
            F.col("g").alias("event_type"),
            F.col("n").alias("n_days"),
            "sum_r2_e18",
            "q_stat",
        )
    )


# ---------------------------------------------------------------------------
# Kendall's W coefficient of concordance
# ---------------------------------------------------------------------------

_ORACLE_KENDALL_W = """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(ts AS DATE)
),
rk AS (  -- half-unit average ranks (2*rank is an exact integer)
  SELECT g, d,
         CAST(2 * RANK() OVER (PARTITION BY g ORDER BY rev)
              + COUNT(*) OVER (PARTITION BY g, rev) - 1 AS BIGINT) AS r2
  FROM daily
),
ties AS (
  SELECT g, CAST(SUM(t * t * t - t) AS BIGINT) AS tt
  FROM (SELECT g, rev, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY g, rev)
  GROUP BY g
),
items AS (
  SELECT d, CAST(SUM(r2) AS BIGINT) AS row_r2,
         CAST(COUNT(*) AS BIGINT) AS m_here
  FROM rk GROUP BY d
),
complete AS (  -- only days every rater scored (balanced design)
  SELECT row_r2 FROM items
  WHERE m_here = (SELECT COUNT(DISTINCT g) FROM daily)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(row_r2) AS BIGINT) AS sum_r2,
         CAST(SUM(row_r2 * row_r2) AS BIGINT) AS sum_r2_sq
  FROM complete
),
m AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS m FROM daily),
t AS (SELECT CAST(SUM(tt) AS BIGINT) AS tie_total FROM ties)
SELECT agg.n AS n_days, m.m AS n_raters, agg.sum_r2, agg.sum_r2_sq,
       t.tie_total,
       round(CASE WHEN agg.n <= 1 OR m.m <= 0
                       OR m.m * m.m * (agg.n * agg.n * agg.n - agg.n)
                          - m.m * t.tie_total = 0 THEN 0.0
                  ELSE 12.0 * (agg.n * agg.sum_r2_sq
                               - agg.sum_r2 * agg.sum_r2)
                       / (4.0 * agg.n)
                       / (m.m * m.m * (CAST(agg.n AS DOUBLE) * agg.n * agg.n
                                       - agg.n)
                          - m.m * t.tie_total) END,
             6) AS w_stat
FROM agg, m, t
"""


@register(
    "ml_kendall_w",
    oracle=_ORACLE_KENDALL_W,
    tags=("ml", "stats"),
    doc=(
        "Kendall's W coefficient of concordance — do the k event types "
        "(raters) agree on which DAYS were big?  Half-unit average ranks "
        "per type (2*rank integers, same device as Kruskal-Wallis), "
        "balanced-design day filter, tie correction sum(t^3 - t) as an "
        "exact BIGINT, and W = 12 S' / (m^2(n^3 - n) - m sum T) as the "
        "single final float from five exact integers.  The transposed "
        "sibling of the repo's Friedman test (there days are blocks; "
        "here days are the items being ranked)."
    ),
)
def ml_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("g"), F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    r2 = (
        2 * F.rank().over(Window.partitionBy("g").orderBy("rev"))
        + F.count(F.lit(1)).over(Window.partitionBy("g", "rev"))
        - 1
    ).cast("bigint")
    rk = daily.select("g", "d", r2.alias("r2"))
    ties = (
        daily.groupBy("g", "rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tt")
        )
    )
    m = daily.agg(F.countDistinct("g").cast("bigint").alias("m"))
    items = rk.groupBy("d").agg(
        F.sum("r2").cast("bigint").alias("row_r2"),
        F.count(F.lit(1)).cast("bigint").alias("m_here"),
    )
    complete = items.join(F.broadcast(m), F.lit(True), "left").where(
        F.col("m_here") == F.col("m")
    )
    agg = complete.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("row_r2").cast("bigint").alias("sum_r2"),
        F.sum(F.col("row_r2") * F.col("row_r2")).cast("bigint").alias("sum_r2_sq"),
    )
    t = ties.agg(F.sum("tt").cast("bigint").alias("tie_total"))
    wden = (
        F.col("m") * F.col("m")
        * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        - F.col("m") * F.col("tie_total")
    )
    w = F.when(
        (F.col("n") <= 1) | (F.col("m") <= 0) | (wden == 0), F.lit(0.0)
    ).otherwise(
        12.0
        * (F.col("n") * F.col("sum_r2_sq") - F.col("sum_r2") * F.col("sum_r2"))
        / (4.0 * F.col("n"))
        / (
            F.col("m")
            * F.col("m")
            * (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
            - F.col("m") * F.col("tie_total")
        )
    )
    return (
        agg.join(F.broadcast(m), F.lit(True), "left")
        .join(F.broadcast(t), F.lit(True), "left")
        .select(
            F.col("n").alias("n_days"),
            F.col("m").alias("n_raters"),
            "sum_r2",
            "sum_r2_sq",
            "tie_total",
            F.round(w, 6).alias("w_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Grubbs outlier test per event type
# ---------------------------------------------------------------------------

_ORACLE_GRUBBS = """
WITH x AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
tot AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM x GROUP BY g
),
dev AS (
  SELECT x.g, x.x, ABS(tot.n * x.x - tot.s) AS u,
         ROW_NUMBER() OVER (PARTITION BY x.g
                            ORDER BY ABS(tot.n * x.x - tot.s) DESC, x.x)
           AS rn
  FROM x JOIN tot ON tot.g = x.g
)
SELECT tot.g AS event_type, tot.n, tot.s, tot.q,
       d.x AS suspect_x_e2, d.u AS max_u,
       round(CASE WHEN tot.n < 2
                       OR CAST(tot.n AS DOUBLE) * tot.q
                          - CAST(tot.s AS DOUBLE) * tot.s <= 0 THEN 0.0
                  ELSE CAST(d.u AS DOUBLE)
                       / sqrt(CAST(tot.n AS DOUBLE)
                              * (CAST(tot.n AS DOUBLE) * tot.q
                                 - CAST(tot.s AS DOUBLE) * tot.s)
                              / (tot.n - 1)) END,
             6) AS g_stat
FROM tot JOIN dev d ON d.g = tot.g AND d.rn = 1
"""


@register(
    "ml_grubbs_test",
    oracle=_ORACLE_GRUBBS,
    tags=("ml", "stats", "dq"),
    doc=(
        "Grubbs max-studentized-residual outlier test per event type: "
        "the suspect is the ARGMAX of the exact INTEGER key |n*x - S| "
        "(ties broken by value), so no float ever picks the candidate; "
        "G = |u| / sqrt(n (nQ - S^2)/(n-1)) is the single final float "
        "from the exact integer moments (nQ - S^2 computed in double "
        "because the product overflows BIGINT at sf1 — identical op "
        "order both engines).  One grouped aggregate + one argmax "
        "window."
    ),
)
def ml_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    tot = x.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    u = F.abs(F.col("n") * F.col("x") - F.col("s"))
    dev = (
        x.join(tot, "g")
        .withColumn("u", u)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.col("u").desc(), F.col("x"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("g", F.col("x").alias("suspect_x_e2"), F.col("u").alias("max_u"))
    )
    var_num = (
        F.col("n").cast("double") * F.col("q")
        - F.col("s").cast("double") * F.col("s")
    )
    g_stat = F.when((F.col("n") < 2) | (var_num <= 0), F.lit(0.0)).otherwise(
        F.col("max_u").cast("double")
        / F.sqrt(F.col("n").cast("double") * var_num / (F.col("n") - 1))
    )
    return tot.join(dev, "g").select(
        F.col("g").alias("event_type"),
        "n",
        "s",
        "q",
        "suspect_x_e2",
        "max_u",
        F.round(g_stat, 6).alias("g_stat"),
    )


# ---------------------------------------------------------------------------
# Factless-fact coverage (nation x month cells with no orders)
# ---------------------------------------------------------------------------

_ORACLE_FACTLESS = """
WITH months AS (
  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon
  FROM orders
),
nats AS (SELECT n_nationkey, n_name FROM nation),
grid AS (SELECT mon, n_nationkey, n_name FROM months CROSS JOIN nats),
covered AS (
  SELECT DISTINCT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mon,
         c.c_nationkey AS n_nationkey
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT g.mon AS month,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN cov.n_nationkey IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN cov.n_nationkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing,
       COALESCE(string_agg(CASE WHEN cov.n_nationkey IS NULL THEN g.n_name
                                END, ',' ORDER BY g.n_name), '')
         AS missing_nations_csv
FROM grid g
LEFT JOIN covered cov
  ON cov.mon = g.mon AND cov.n_nationkey = g.n_nationkey
GROUP BY g.mon
"""


@register(
    "warehouse_factless_coverage",
    oracle=_ORACLE_FACTLESS,
    tags=("warehouse",),
    doc=(
        "The Kimball factless-fact coverage question — which (nation, "
        "month) cells saw NO orders: the dimension grid (months spine x "
        "broadcast nation dim) left-anti-style joined against the "
        "covered cells, with missing nations rolled up per month as a "
        "count and a deterministic sorted CSV.  The grid is "
        "dimension-sized (|months| x 25) regardless of fact volume, and "
        "the covered set is one DISTINCT over a broadcast-dim join — "
        "the 'what did NOT happen' query every mart needs."
    ),
)
def warehouse_factless_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    months = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon")
    ).distinct()
    grid = months.crossJoin(F.broadcast(nation))
    covered = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
            F.col("c_nationkey").alias("n_nationkey"),
        )
        .distinct()
    )
    covered = covered.withColumn("cov", F.lit(1))
    j = grid.join(covered, ["mon", "n_nationkey"], "left_outer").select(
        F.col("mon"),
        "n_name",
        F.col("cov").isNotNull().alias("is_covered"),
    )
    return j.groupBy(F.col("mon").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("is_covered"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_covered"),
        F.sum(F.when(F.col("is_covered"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_missing"),
        F.coalesce(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(~F.col("is_covered"), F.col("n_name"))
                    )
                ),
                ",",
            ),
            F.lit(""),
        ).alias("missing_nations_csv"),
    )


# ---------------------------------------------------------------------------
# Ascii85 round-trip
# ---------------------------------------------------------------------------


def ascii85_encode(data: bytes) -> str:
    """Standard Ascii85 (no z-shortcut, no adobe delimiters): big-endian
    4-byte groups to 5 chars '!'..'u'; a partial group of n bytes emits
    n+1 chars."""
    out = []
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        pad = 4 - len(chunk)
        v = int.from_bytes(chunk + b"\x00" * pad, "big")
        digits = []
        for _ in range(5):
            v, r = divmod(v, 85)
            digits.append(chr(33 + r))
        group = "".join(reversed(digits))
        out.append(group[: 5 - pad])
    return "".join(out)


def ascii85_decode(text: str) -> bytes:
    out = bytearray()
    for i in range(0, len(text), 5):
        chunk = text[i : i + 5]
        pad = 5 - len(chunk)
        v = 0
        for ch in chunk + "u" * pad:
            v = v * 85 + (ord(ch) - 33)
        out.extend(v.to_bytes(4, "big")[: 4 - pad])
    return bytes(out)


_ORACLE_ASCII85 = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM((strlen(text) // 4) * 5
                + CASE WHEN strlen(text) % 4 = 0 THEN 0
                       ELSE strlen(text) % 4 + 1 END)
            AS BIGINT) AS total_armor_chars,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
FROM documents
GROUP BY source
"""


@register(
    "corpus_ascii85_roundtrip",
    oracle=_ORACLE_ASCII85,
    tags=("io", "codec", "corpus"),
    doc=(
        "Ascii85 text-armor round-trip through Arrow-batched pandas UDFs "
        "(from-scratch encoder/decoder, unit-tested against the stdlib "
        "base64.a85encode): the oracle recomputes armor lengths "
        "ANALYTICALLY from the 4->5 expansion rule (partial group of n "
        "bytes -> n+1 chars) and asserts every document decodes back to "
        "its original text (n_roundtrip_ok == n_docs) — a wrong radix "
        "digit or padding rule breaks either the length or the equality "
        "column.  Map-only + one grouped aggregate; the binary-to-text "
        "seam JSONL/XML exports of binary columns need."
    ),
)
def corpus_ascii85_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")

    @F.pandas_udf("string")
    def enc(texts):
        return texts.map(lambda t: ascii85_encode(t.encode("utf-8")))

    @F.pandas_udf("string")
    def dec(armor):
        return armor.map(lambda a: ascii85_decode(a).decode("utf-8"))

    coded = docs.select(
        "source",
        "text",
        F.octet_length("text").cast("bigint").alias("nbytes"),
        enc("text").alias("armor"),
    )
    back = coded.select(
        "source",
        "nbytes",
        F.length("armor").cast("bigint").alias("armor_len"),
        (dec("armor") == F.col("text")).alias("ok"),
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nbytes").cast("bigint").alias("total_bytes"),
        F.sum("armor_len").cast("bigint").alias("total_armor_chars"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Confusion-matrix effect battery at the exact median threshold
# ---------------------------------------------------------------------------

_ORACLE_MCC = """
WITH x AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
         CAST(round(value * 100) AS BIGINT) AS score
  FROM events WHERE value IS NOT NULL
),
o AS (
  SELECT label, score, row_number() OVER (ORDER BY score) AS rn,
         COUNT(*) OVER () AS n
  FROM x
),
m AS (
  SELECT CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN score ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN score ELSE 0 END)
              AS BIGINT) AS med2
  FROM o
),
cm AS (
  SELECT CAST(SUM(CASE WHEN label = 1 AND 2 * score > m.med2
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN label = 0 AND 2 * score > m.med2
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN label = 0 AND 2 * score <= m.med2
                       THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN label = 1 AND 2 * score <= m.med2
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM x, m
)
SELECT tp, fp, tn, fn,
       round(CASE WHEN (tp + fp) * (tp + fn) = 0
                       OR (tn + fp) * (tn + fn) = 0 THEN 0.0
                  ELSE (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                       / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                              * (tn + fp) * (tn + fn)) END, 6) AS mcc,
       round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1,
       round(CASE WHEN (tp + fn) = 0 OR (tn + fp) = 0 THEN 0.0
                  ELSE 0.5 * (CAST(tp AS DOUBLE) / (tp + fn)
                              + CAST(tn AS DOUBLE) / (tn + fp)) END,
             6) AS balanced_accuracy,
       round(CASE WHEN (tp + fn) = 0 OR (tn + fp) = 0 THEN 0.0
                  ELSE CAST(tp AS DOUBLE) / (tp + fn)
                       + CAST(tn AS DOUBLE) / (tn + fp) - 1.0 END,
             6) AS informedness
FROM cm
"""


@register(
    "ml_mcc_confusion_battery",
    oracle=_ORACLE_MCC,
    tags=("ml", "eval"),
    doc=(
        "Confusion-matrix effect battery (MCC, F1, balanced accuracy, "
        "Youden informedness) for the value-predicts-purchase classifier "
        "at the EXACT grand-median threshold: the cut is the integer "
        "2*median order statistic located on the distinct-cent spine "
        "(no raw-row global sort), every cell of the confusion matrix is "
        "an exact BIGINT (2*score > med2 integer compares), and each "
        "metric is one final float expression — MCC's four marginal "
        "products run in double because their product overflows BIGINT "
        "at sf1.  The threshold-fixed companion of the repo's "
        "ROC/PR-curve evals (AUC sweeps thresholds; this pins one and "
        "reports the operating-point portfolio)."
    ),
)
def ml_mcc_confusion_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
    )
    # 2*grand-median off the distinct-cent spine — never a raw-row global
    # sort (plan-audit: the ml_auc_roc_exact contract).
    m = grand_median2_spine(x.select("score"), "score", "med2")
    pred_pos = 2 * F.col("score") > F.col("med2")
    cm = x.join(F.broadcast(m), F.lit(True), "left").agg(
        F.sum(F.when((F.col("label") == 1) & pred_pos, 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("label") == 0) & pred_pos, 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("label") == 0) & ~pred_pos, 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
        F.sum(F.when((F.col("label") == 1) & ~pred_pos, 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )
    tp, fp, tn, fn = (F.col(c) for c in ("tp", "fp", "tn", "fn"))
    mcc = F.when(
        ((tp + fp) * (tp + fn) == 0) | ((tn + fp) * (tn + fn) == 0), F.lit(0.0)
    ).otherwise(
        (tp.cast("double") * tn - fp.cast("double") * fn)
        / F.sqrt(
            (tp + fp).cast("double") * (tp + fn) * (tn + fp) * (tn + fn)
        )
    )
    f1 = F.when(2 * tp + fp + fn == 0, F.lit(0.0)).otherwise(
        2.0 * tp / (2 * tp + fp + fn)
    )
    bal = F.when(((tp + fn) == 0) | ((tn + fp) == 0), F.lit(0.0)).otherwise(
        0.5 * (tp.cast("double") / (tp + fn) + tn.cast("double") / (tn + fp))
    )
    inf = F.when(((tp + fn) == 0) | ((tn + fp) == 0), F.lit(0.0)).otherwise(
        tp.cast("double") / (tp + fn) + tn.cast("double") / (tn + fp) - 1.0
    )
    return cm.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(mcc, 6).alias("mcc"),
        F.round(f1, 6).alias("f1"),
        F.round(bal, 6).alias("balanced_accuracy"),
        F.round(inf, 6).alias("informedness"),
    )
