"""Data-quality registry queries (the reference README's declared next step,
README.md:150-153) — each check is one scan + one reduce, oracle-verified."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.quality import null_rate_report, referential_violations
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_NULL_RATES = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_custkey,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_orderdate,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_totalprice
  FROM orders
)
SELECT col AS "column", n_rows, n_null,
       round(CAST(n_null AS DOUBLE) / n_rows, 6) AS null_rate
FROM agg
UNPIVOT (n_null FOR col IN (nn_custkey AS 'o_custkey',
                            nn_orderdate AS 'o_orderdate',
                            nn_totalprice AS 'o_totalprice'))
"""


@register(
    "dq_null_rates",
    oracle=_ORACLE_NULL_RATES,
    tags=("quality",),
    doc=(
        "Null-rate report over orders key columns: one conditional-count "
        "aggregation pass + unpivot (the reference's declared Great-"
        "Expectations-style next step, README.md:150-153)."
    ),
)
def dq_null_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return null_rate_report(orders, ["o_custkey", "o_orderdate", "o_totalprice"])


_ORACLE_REF_INTEGRITY = """
SELECT o.o_custkey, COUNT(*) AS n_orphan_rows
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
GROUP BY o.o_custkey
"""


@register(
    "dq_referential_integrity",
    oracle=_ORACLE_REF_INTEGRITY,
    tags=("quality",),
    doc=(
        "Referential-integrity check: orders whose custkey is missing from "
        "the positive-balance customer dimension (a deliberately partial "
        "dim, so violations exist) — broadcast left-anti join + count per "
        "orphan key."
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").where("c_acctbal > 0")
    return referential_violations(orders, "o_custkey", dim, "c_custkey")


_ORACLE_SNAPSHOT_DIFF = """
WITH b AS (
  SELECT event_id, value + 1 AS value FROM events
  WHERE event_id % 97 <> 0 AND event_id % 101 = 0
  UNION ALL
  SELECT event_id, value FROM events
  WHERE event_id % 97 <> 0 AND event_id % 101 <> 0
  UNION ALL
  SELECT event_id + 10000000 AS event_id, value FROM events
  WHERE event_id % 103 = 0
),
a AS (SELECT event_id, value FROM events)
SELECT COALESCE(a.event_id, b.event_id) AS event_id,
       CASE WHEN a.event_id IS NULL THEN 'added'
            WHEN b.event_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
WHERE a.event_id IS NULL OR b.event_id IS NULL OR a.value <> b.value
ORDER BY event_id
"""


@register(
    "dq_snapshot_diff",
    oracle=_ORACLE_SNAPSHOT_DIFF,
    tags=("quality", "warehouse"),
    doc=(
        "Anti-entropy table diff: snapshot B is derived from events by "
        "deterministic deletes (id%97), updates (id%101, value+1) and "
        "inserts (id%103 re-keyed); the diff reports added/removed/changed "
        "via one full-outer join on the key, unchanged rows filtered "
        "executor-side. Oracle derives B identically in SQL."
    ),
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.quality import snapshot_diff

    pin_query_session_conf(spark)
    a = load_table(spark, sf_dir, "events").select("event_id", "value")
    kept = a.where(F.col("event_id") % 97 != 0)
    b = (
        kept.where(F.col("event_id") % 101 == 0)
        .withColumn("value", F.col("value") + 1)
        .unionByName(kept.where(F.col("event_id") % 101 != 0))
        .unionByName(
            a.where(F.col("event_id") % 103 == 0).withColumn(
                "event_id", F.col("event_id") + 10_000_000
            )
        )
    )
    return snapshot_diff(a, b, "event_id", "value").orderBy("event_id")


_ORACLE_COLUMN_STATS = """
SELECT 'l_quantity' AS "column",
       CAST(min(l_quantity) AS DOUBLE) AS min_val,
       CAST(max(l_quantity) AS DOUBLE) AS max_val,
       count(DISTINCT l_quantity) AS n_distinct,
       count(*) - count(l_quantity) AS n_null
FROM lineitem
UNION ALL
SELECT 'l_discount',
       CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
       count(DISTINCT l_discount), count(*) - count(l_discount)
FROM lineitem
UNION ALL
SELECT 'l_suppkey',
       CAST(min(l_suppkey) AS DOUBLE), CAST(max(l_suppkey) AS DOUBLE),
       count(DISTINCT l_suppkey), count(*) - count(l_suppkey)
FROM lineitem
ORDER BY "column"
"""


@register(
    "dq_column_stats",
    oracle=_ORACLE_COLUMN_STATS,
    tags=("quality", "stats"),
    doc=(
        "Column-statistics profile (the ANALYZE TABLE analog feeding "
        "cost-based decisions): min/max/exact-distinct/null-count per "
        "column, all columns in ONE scan via a single multi-aggregate "
        "projection, unpivoted to one row per column. At scale the exact "
        "distinct swaps for approx_count_distinct — the exact form here "
        "keeps the oracle value-comparable."
    ),
)
def dq_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_suppkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"min__{c}"),
            F.max(c).cast("double").alias(f"max__{c}"),
            F.countDistinct(c).alias(f"nd__{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn__{c}"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"min__{c}").alias("min_val"),
            F.col(f"max__{c}").alias("max_val"),
            F.col(f"nd__{c}").alias("n_distinct"),
            F.col(f"nn__{c}").alias("n_null"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.column", "s.min_val", "s.max_val", "s.n_distinct", "s.n_null")
        .orderBy("column")
    )


_ORACLE_OUTLIERS_IQR = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type
FROM events e JOIN q USING (event_type)
WHERE e.value > q.q3 + 1.5 * (q.q3 - q.q1)
   OR e.value < q.q1 - 1.5 * (q.q3 - q.q1)
ORDER BY e.event_id
"""


@register(
    "dq_outliers_iqr",
    oracle=_ORACLE_OUTLIERS_IQR,
    tags=("quality", "stats", "analytics"),
    doc=(
        "Tukey-fence outlier detection per event type: exact per-group "
        "quartiles (one tiny aggregate, groups = |event_types|) broadcast "
        "back against the full table as a stateless range filter. Robust "
        "to the heavy tail (unlike z-scores, the quartiles don't move "
        "with the outliers). Quartile interpolation and fence arithmetic "
        "are identical IEEE ops on both engines; at 100 TB swap "
        "percentile() for approx_percentile and the shape is unchanged."
    ),
)
def dq_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(q), "event_type")
        .where(
            (F.col("value") > F.col("q3") + 1.5 * iqr)
            | (F.col("value") < F.col("q1") - 1.5 * iqr)
        )
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


# -- Zero-extra-scan pipeline metrics via df.observe ---------------------------

_ORACLE_OBSERVED = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpos_price,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_custkey,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100, 0)
            AS BIGINT) AS total_cents
FROM orders
"""


@register(
    "dq_observed_metrics",
    oracle=_ORACLE_OBSERVED,
    tags=("dq", "scale"),
    doc=(
        "Pipeline metrics via Spark's Observation API (df.observe): the "
        "input-side counters a production job publishes — row count, "
        "invalid-price count, null-key count, exact money total — are "
        "attached to the SAME scan the job already performs (here a "
        "downstream filter+count stands in for the job), so the metrics "
        "cost ZERO extra passes; a separate metrics query would re-scan "
        "100 TB. The observed values come back as accumulator-style "
        "results on the driver (one row — bounded by construction) and "
        "the oracle recomputes them with a plain aggregate, proving "
        "observe-metrics == recompute."
    ),
)
def dq_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from ..functions.safe_math import dec

    pin_query_session_conf(spark)
    obs = Observation("etl_metrics")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpos_price"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_custkey"),
        (F.round(F.sum(dec("o_totalprice")) * 100, 0))
        .cast("bigint")
        .alias("total_cents"),
    )
    # The "job": any action over the observed scan publishes the metrics.
    orders.where(F.col("o_orderstatus") == "F").count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_nonpos_price"],
                m["n_null_custkey"],
                m["total_cents"],
            )
        ],
        "n_rows long, n_nonpos_price long, n_null_custkey long, total_cents long",
    )


# -- declarative constraint suite (Deequ-style) ----------------------------------

_ORACLE_CONSTRAINTS = """
WITH scan AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS v_notnull,
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS v_unique,
         CAST(COUNT(*) FILTER (WHERE o_totalprice < 0
                                  OR o_totalprice > 1000000) AS BIGINT)
           AS v_range,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')
                                  OR o_orderstatus IS NULL) AS BIGINT)
           AS v_domain
  FROM orders
),
ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
)
SELECT * FROM (
  SELECT 'not_null:o_custkey' AS constraint_id, n AS n_checked,
         v_notnull AS n_violations, v_notnull = 0 AS passed FROM scan
  UNION ALL
  SELECT 'unique:o_orderkey', n, v_unique, v_unique = 0 FROM scan
  UNION ALL
  SELECT 'range:o_totalprice:[0,1000000]', n, v_range, v_range = 0 FROM scan
  UNION ALL
  SELECT 'domain:o_orderstatus:{O,F,P}', n, v_domain, v_domain = 0 FROM scan
  UNION ALL
  SELECT 'referential:o_custkey->customer.c_custkey',
         (SELECT n FROM scan), v_ref, v_ref = 0 FROM ref
) ORDER BY constraint_id
"""


@register(
    "dq_constraint_suite",
    oracle=_ORACLE_CONSTRAINTS,
    tags=("dq", "profiling", "scale"),
    doc=(
        "Declarative data-quality constraint suite (the Deequ/"
        "great-expectations shape): not-null, key-uniqueness, numeric "
        "range, value domain, and referential integrity validated in ONE "
        "pass — the four row-local constraints fold into a single "
        "conditional aggregate over the fact scan (map-side combinable; "
        "at 100 TB this is one read, not five), and only the referential "
        "check pays a join (broadcast, dim-sized). Output is the audit "
        "report: per-constraint checked/violation counts + verdict."
    ),
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    scan = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.count(F.lit(1)) - F.count("o_custkey")).cast("bigint").alias(
            "v_notnull"
        ),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("v_unique"),
        F.count_if(
            (F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1000000)
        )
        .cast("bigint")
        .alias("v_range"),
        F.count_if(
            ~F.col("o_orderstatus").isin("O", "F", "P")
            | F.col("o_orderstatus").isNull()
        )
        .cast("bigint")
        .alias("v_domain"),
    )
    ref = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("v_ref"))
    )
    s = scan.crossJoin(F.broadcast(ref))

    def row(cid: str, viol: str):
        return s.select(
            F.lit(cid).alias("constraint_id"),
            F.col("n").alias("n_checked"),
            F.col(viol).alias("n_violations"),
            (F.col(viol) == 0).alias("passed"),
        )

    return (
        row("not_null:o_custkey", "v_notnull")
        .unionByName(row("unique:o_orderkey", "v_unique"))
        .unionByName(row("range:o_totalprice:[0,1000000]", "v_range"))
        .unionByName(row("domain:o_orderstatus:{O,F,P}", "v_domain"))
        .unionByName(
            row("referential:o_custkey->customer.c_custkey", "v_ref")
        )
        .orderBy("constraint_id")
    )


# -- Chi-square independence test (lang x source, r8) -------------------------------

_ORACLE_CHISQ = """
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
margins AS (
  SELECT lang, CAST(SUM(o) AS BIGINT) AS row_n FROM obs GROUP BY lang
),
cols AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS col_n FROM obs GROUP BY source
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT m.lang, c.source,
         COALESCE(ob.o, 0) AS o,
         CAST(m.row_n AS DOUBLE) * c.col_n / (SELECT n FROM tot) AS e
  FROM margins m CROSS JOIN cols c
  LEFT JOIN obs ob ON ob.lang = m.lang AND ob.source = c.source
),
agg AS (
  SELECT CAST(SUM(CAST(round(power(o - e, 2) / e, 12)
                       AS DECIMAL(30,12))) AS DECIMAL(30,12)) AS chi2_dec,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS c
  FROM cells
)
SELECT (SELECT n FROM tot) AS n,
       round(CAST(chi2_dec AS DOUBLE), 6) AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       round(sqrt(CAST(chi2_dec AS DOUBLE)
                  / ((SELECT n FROM tot) * least(r - 1, c - 1))), 6)
         AS cramers_v
FROM agg
"""


@register(
    "dq_chisquare_independence",
    oracle=_ORACLE_CHISQ,
    tags=("quality", "stats"),
    doc=(
        "Chi-square independence test + Cramer's V between document lang "
        "and source — the categorical-drift companion to "
        "corpus_lang_source_mi (same contingency table, the classical "
        "test statistic instead of information). The full lang x source "
        "grid (including zero cells, via the margin cross join) is "
        "bounded by the category product; per-cell (o-e)^2/e terms are "
        "rounded at 12dp and summed as exact DECIMALs so no float-order "
        "hazard crosses the oracle. One scan -> one contingency "
        "aggregate -> a cells-scale reduce."
    ),
)
def dq_chisquare_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    margins = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("row_n"))
    cols = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("col_n"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    cells = (
        margins.crossJoin(cols)
        .join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.coalesce("o", F.lit(0)).alias("o"),
            (
                F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
            ).alias("e"),
        )
    )
    agg = cells.agg(
        F.sum(
            F.round(F.pow(F.col("o") - F.col("e"), 2) / F.col("e"), 12).cast(
                "decimal(30,12)"
            )
        ).alias("chi2_dec"),
        F.countDistinct("lang").cast("bigint").alias("r"),
        F.countDistinct("source").cast("bigint").alias("c"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n",
        F.round(F.col("chi2_dec").cast("double"), 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2_dec").cast("double")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# -- IQR outlier fences per group (r8) ----------------------------------------------

_ORACLE_IQR = """
WITH q AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
),
f AS (
  SELECT event_type, n, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo,
         q3 + 1.5 * (q3 - q1) AS hi
  FROM q
)
SELECT f.event_type, f.n,
       round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
       round(f.lo, 6) AS fence_lo, round(f.hi, 6) AS fence_hi,
       CAST((SELECT COUNT(*) FROM events e
             WHERE e.event_type = f.event_type
               AND (e.value < f.lo OR e.value > f.hi)) AS BIGINT)
         AS n_outliers
FROM f ORDER BY event_type
"""


@register(
    "dq_iqr_outlier_profile",
    oracle=_ORACLE_IQR,
    tags=("quality", "stats"),
    doc=(
        "Tukey IQR outlier profile per event_type: interpolated "
        "q1/q3 (Spark percentile == DuckDB quantile_cont, the "
        "agg_percentiles parity), 1.5*IQR fences computed by the "
        "identical double expression in both engines, and the count of "
        "rows outside the fences — the box-plot-rule complement to "
        "dq_robust_stats_mad's MAD screen. Two passes by construction "
        "(fences need the quantiles); the second is a broadcast-joined "
        "conditional count, no re-shuffle."
    ),
)
def dq_iqr_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = (
        ev.join(F.broadcast(f), "event_type")
        .where((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    return (
        f.join(out, "event_type", "left")
        .select(
            "event_type",
            "n",
            F.round("q1", 6).alias("q1"),
            F.round("q3", 6).alias("q3"),
            F.round("lo", 6).alias("fence_lo"),
            F.round("hi", 6).alias("fence_hi"),
            F.coalesce("n_outliers", F.lit(0)).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )
