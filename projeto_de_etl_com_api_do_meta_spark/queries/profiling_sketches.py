"""Dataset profiling + mergeable-sketch analytics (round 6).

Covers the diagnostics a data platform runs before/alongside the curation
pipeline: exact-reproducible distinct sketches (KMV — the oracle-checkable
cousin of the HLL the reference era would have reached for), per-column
completeness datasheets, Benford first-digit screening, and Zipf
rank-frequency fit over the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sketches import kmv_distinct, kmv_set_ops
from ..session import pin_query_session_conf
from .registry import register

# 16^15 = 2^60: the KMV hash space (operators/sketches.py).
_SPACE = "1152921504606846976.0"

_ORACLE_KMV = f"""
WITH h AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
           FROM orders),
sk AS (SELECT h FROM h ORDER BY h LIMIT 128),
s AS (SELECT MAX(h) AS kth_hash, COUNT(*) AS n FROM sk)
SELECT 128 AS k, kth_hash,
       CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
            ELSE round(127.0 * {_SPACE} / CAST(kth_hash AS DOUBLE), 4)
       END AS est_distinct,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
         AS exact_distinct
FROM s
"""


@register(
    "agg_kmv_distinct_sketch",
    oracle=_ORACLE_KMV,
    tags=("agg", "sketch", "scale"),
    doc=(
        "KMV bottom-k distinct sketch over orders.o_custkey "
        "(operators/sketches.py: kmv_distinct, k=128): per-partition "
        "bottom-k + k-row merge (TakeOrderedAndProject), estimate "
        "(k-1)/U_(k). Unlike approx_count_distinct's opaque HLL bytes the "
        "state is md5 fixed-point hashes, so the sketch AND the estimate "
        "are bit-reproducible in the DuckDB oracle — the calibration "
        "column exact_distinct shows the error at fixture scale. At "
        "100 TB the sketch rolls up per day/partition by re-taking "
        "bottom-k of unioned sketches, never rescanning history."
    ),
)
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return kmv_distinct(orders, "o_custkey", k=128)


_ORACLE_KMV_SETOPS = f"""
WITH a AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
           FROM events WHERE event_type = 'click' ORDER BY h LIMIT 128),
b AS (SELECT DISTINCT
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events WHERE event_type = 'view' ORDER BY h LIMIT 128),
u AS (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
      ORDER BY h LIMIT 128),
s AS (SELECT MAX(h) AS kth_hash, COUNT(*) AS n FROM u),
ov AS (SELECT COUNT(*) AS in_both FROM u
       WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
SELECT 128 AS k, kth_hash,
       CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
            ELSE round(127.0 * {_SPACE} / CAST(kth_hash AS DOUBLE), 4)
       END AS est_union,
       CAST(in_both AS BIGINT) AS sketch_overlap,
       round(CAST(in_both AS DOUBLE) / CAST(n AS DOUBLE)
             * CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                    ELSE round(127.0 * {_SPACE} / CAST(kth_hash AS DOUBLE), 4)
               END, 4) AS est_intersection
FROM s, ov
"""


@register(
    "agg_kmv_set_ops",
    oracle=_ORACLE_KMV_SETOPS,
    tags=("agg", "sketch", "scale"),
    doc=(
        "KMV sketch SET OPERATIONS (operators/sketches.py: kmv_set_ops): "
        "click-users vs view-users sketched independently, union sketch = "
        "re-take bottom-k of the two sketches (the merge rule that makes "
        "KMV associative), intersection via the rho estimator "
        "(|union sketch seen in both| / k scales the union estimate). "
        "This is the audience-overlap / cross-corpus-contamination "
        "primitive: at 100 TB both sides are k-row states, the set "
        "algebra never touches raw data again."
    ),
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    return kmv_set_ops(clicks, views, "user_id", k=128)


_ORACLE_BENFORD = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_freq,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_freq
FROM c, t ORDER BY digit
"""


@register(
    "dq_benford_digit_profile",
    oracle=_ORACLE_BENFORD,
    tags=("dq", "profiling"),
    doc=(
        "Benford first-significant-digit screen over order totals: "
        "observed digit frequencies next to the Benford expectation "
        "log10(1 + 1/d) — the classic anomaly/fraud and synthetic-data "
        "smell test a warehouse runs per ingest batch. One hash "
        "aggregation over 9 groups + a broadcast scalar total: "
        "embarrassingly scalable."
    ),
)
def dq_benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    digits = (
        orders.where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = digits.agg(F.sum("n").alias("total"))
    return (
        digits.crossJoin(F.broadcast(total))  # scalar-aggregate broadcast
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("obs_freq"),
            F.round(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")),
                6,
            ).alias("benford_freq"),
        )
        .orderBy("digit")
    )


_ORACLE_COMPLETENESS = """
WITH cols AS (
  SELECT 'c_custkey' AS col_name, COUNT(*) AS n, COUNT(c_custkey) AS n_present,
         COUNT(DISTINCT c_custkey) AS n_distinct FROM customer
  UNION ALL
  SELECT 'c_name', COUNT(*), COUNT(c_name), COUNT(DISTINCT c_name)
  FROM customer
  UNION ALL
  SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey),
         COUNT(DISTINCT c_nationkey) FROM customer
  UNION ALL
  SELECT 'c_acctbal', COUNT(*), COUNT(c_acctbal), COUNT(DISTINCT c_acctbal)
  FROM customer
  UNION ALL
  SELECT 'c_mktsegment', COUNT(*), COUNT(c_mktsegment),
         COUNT(DISTINCT c_mktsegment) FROM customer
)
SELECT col_name, CAST(n AS BIGINT) AS n,
       CAST(n - n_present AS BIGINT) AS n_null,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(CAST(n_present AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS completeness
FROM cols ORDER BY col_name
"""


@register(
    "dq_completeness_profile",
    oracle=_ORACLE_COMPLETENESS,
    tags=("dq", "profiling"),
    doc=(
        "Per-column completeness datasheet for the customer table: row "
        "count, null count, distinct count, completeness ratio — the "
        "ingest-gate profile every dq framework (Deequ-style) starts "
        "with. Spark side computes ALL columns in ONE scan (count + "
        "count(col) + approx-free count_distinct per column as "
        "aggregates), then unpivots the single result row with stack(); "
        "the oracle spells the same numbers as per-column UNION ALL. At "
        "100 TB one pass over the table replaces N per-column scans."
    ),
)
def dq_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    cols = ["c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"p_{c}"))
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
    one = cust.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', p_{c}, d_{c}" for c in cols)
    return (
        one.select(
            F.col("n"),
            F.expr(
                f"stack({len(cols)}, {stack_expr}) AS "
                "(col_name, n_present, n_distinct)"
            ),
        )
        .select(
            "col_name",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n") - F.col("n_present")).cast("bigint").alias("n_null"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            F.round(
                F.col("n_present").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("completeness"),
        )
        .orderBy("col_name")
    )


_ORACLE_ZIPF = """
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
),
freq AS (SELECT w, COUNT(*) AS f FROM words WHERE w <> '' GROUP BY w),
ranked AS (
  SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r
  FROM freq
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       round(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 5)
         AS zipf_slope,
       round(regr_intercept(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 5)
         AS zipf_intercept
FROM ranked WHERE r <= 100
"""


@register(
    "corpus_zipf_law_fit",
    oracle=_ORACLE_ZIPF,
    tags=("corpus", "profiling"),
    doc=(
        "Zipf rank-frequency fit over the corpus vocabulary: top-100 "
        "words by frequency, OLS slope/intercept of ln(freq) vs ln(rank) "
        "(a natural corpus should sit near slope -1; synthetic or "
        "boilerplate-heavy corpora deviate — a cheap corpus-health "
        "indicator next to the quality classifiers). One word-count "
        "aggregation + a 100-row regression; rank ties broken "
        "deterministically by word."
    ),
)
def corpus_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # top-100 via TakeOrdered (per-partition top-k, k-row merge) FIRST, so
    # the global row_number window only ever sees 100 rows.
    top = freq.orderBy(F.desc("f"), F.asc("w")).limit(100)
    ranked = top.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.desc("f"), F.asc("w"))),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.round(
            F.regr_slope(
                F.log(F.col("f").cast("double")),
                F.log(F.col("r").cast("double")),
            ),
            5,
        ).alias("zipf_slope"),
        F.round(
            F.regr_intercept(
                F.log(F.col("f").cast("double")),
                F.log(F.col("r").cast("double")),
            ),
            5,
        ).alias("zipf_intercept"),
    )


_ORACLE_ROBUST = """
WITH med AS (
  SELECT event_type,
         COUNT(*) AS n,
         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 4) AS median_v,
         round(quantile_cont(CAST(value AS DOUBLE), 0.05), 4) AS p05,
         round(quantile_cont(CAST(value AS DOUBLE), 0.95), 4) AS p95
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         round(quantile_cont(abs(CAST(e.value AS DOUBLE) - m.median_v), 0.5),
               4) AS mad_v
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
),
win AS (
  SELECT e.event_type,
         CAST(SUM(CAST(round(least(greatest(CAST(e.value AS DOUBLE),
                                             m.p05), m.p95) * 10000, 0)
                       AS BIGINT)) AS BIGINT) AS wsum_e4
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT med.event_type, CAST(med.n AS BIGINT) AS n, med.median_v, mad.mad_v,
       round(CAST(win.wsum_e4 AS DOUBLE) / CAST(med.n AS DOUBLE) / 10000.0,
             6) AS winsorized_mean
FROM med JOIN mad USING (event_type) JOIN win USING (event_type)
ORDER BY med.event_type
"""


@register(
    "dq_robust_stats_mad",
    oracle=_ORACLE_ROBUST,
    tags=("dq", "profiling", "stats"),
    doc=(
        "Robust per-group statistics: exact interpolated median, MAD "
        "(median absolute deviation — the robust sigma), and a 5/95 "
        "winsorized mean per event_type — the outlier-resistant profile "
        "a dq gate uses where mean/stddev would chase a single corrupt "
        "value. Two percentile passes (the second reuses the first's "
        "medians via a broadcast join); the winsorized mean clamps then "
        "fixed-points each value to 1e-4 units so the SUM is exact "
        "BIGINT math — no order-dependent double accumulation crosses "
        "the oracle. Percentiles round to 4dp before re-use, pinning the "
        "interpolation to identical inputs in both engines."
    ),
)
def dq_robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    med = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("median_v"),
        F.round(F.percentile(v, F.lit(0.05)), 4).alias("p05"),
        F.round(F.percentile(v, F.lit(0.95)), 4).alias("p95"),
    )
    joined = ev.join(F.broadcast(med), "event_type")
    mad = joined.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(v - F.col("median_v")), F.lit(0.5)), 4
        ).alias("mad_v")
    )
    win = joined.groupBy("event_type").agg(
        F.sum(
            F.round(
                F.least(F.greatest(v, F.col("p05")), F.col("p95")) * 10000, 0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("wsum_e4")
    )
    return (
        med.join(mad, "event_type")
        .join(win, "event_type")
        .select(
            "event_type",
            "n",
            "median_v",
            "mad_v",
            F.round(
                F.col("wsum_e4").cast("double") / F.col("n").cast("double")
                / 10000.0,
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


_ORACLE_KMV_RUNNING = f"""
WITH days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
),
hashes AS (
  SELECT CAST(ts AS DATE) AS d,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
cume AS (
  SELECT days.d AS d, h.h
  FROM days JOIN hashes h ON h.d <= days.d
  GROUP BY days.d, h.h
),
sk AS (
  SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS r
  FROM cume
),
s AS (
  SELECT d, MAX(h) AS kth_hash, COUNT(*) AS n
  FROM sk WHERE r <= 64 GROUP BY d
)
SELECT d, kth_hash,
       CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
            ELSE round(63.0 * {_SPACE} / CAST(kth_hash AS DOUBLE), 4)
       END AS est_cume_users
FROM s ORDER BY d
"""


@register(
    "agg_kmv_running_daily",
    oracle=_ORACLE_KMV_RUNNING,
    tags=("agg", "sketch", "timeseries", "scale"),
    doc=(
        "Running cumulative distinct-user estimate per day from MERGED "
        "daily KMV sketches — the rollup that makes sketches worth "
        "keeping: each day contributes one bottom-k sketch "
        "(per-partition bottom-k, k-row state), and day D's cumulative "
        "estimate re-takes bottom-k of the UNION of sketches for days "
        "<= D — history is never rescanned, the running state is "
        "days x k hashes. The engine computes the merge as one window "
        "rank over the (day, sketch-hash) table (each day's sketch is "
        "only k rows, so the cross-day union is tiny by construction); "
        "the oracle spells the same bottom-k per day directly. Exactly "
        "reproducible cross-engine, unlike a running HLL."
    ),
)
def agg_kmv_running_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_hash

    pin_query_session_conf(spark)
    k = 64
    ev = load_table(spark, sf_dir, "events")
    # per-day sketch: bottom-k distinct hashes within the day
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("d"), kmv_hash("user_id").alias("h")
        )
        .distinct()
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("d").orderBy("h")
            ),
        )
        .where(F.col("r") <= k)
        .drop("r")
    )
    days = daily.select("d").distinct()
    # merge rule: day D's sketch = bottom-k of union of sketches <= D.
    # The join input is (days x k) rows per side — sketch-scale, not data.
    cume = (
        days.alias("dd")
        .join(daily.alias("s"), F.col("s.d") <= F.col("dd.d"))
        .select(F.col("dd.d").alias("d"), F.col("s.h").alias("h"))
        .distinct()
        .withColumn(
            "r",
            F.row_number().over(Window.partitionBy("d").orderBy("h")),
        )
        .where(F.col("r") <= k)
    )
    s = cume.groupBy("d").agg(
        F.max("h").alias("kth_hash"), F.count("h").alias("n")
    )
    est = (
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(float(16**15))
                / F.col("kth_hash").cast("double"),
                4,
            )
        )
    )
    return s.select("d", "kth_hash", est.alias("est_cume_users")).orderBy("d")


_HLL_HASH = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"


def _hll_regs_sql(col: str, group: str | None) -> str:
    """Per-register max-rank CTE body over events for ``col`` (optionally
    grouped), mirroring operators/sketches.hll_rank_cols bit-for-bit."""
    h = _HLL_HASH.format(col=col)
    g = f"{group}, " if group else ""
    return f"""
  SELECT {g}(h >> 54) AS reg_idx,
         MAX(CASE WHEN (h & 18014398509481983) = 0 THEN 55
                  ELSE 55 - length(bin(h & 18014398509481983)) END) AS max_rank
  FROM (SELECT {g}{h} AS h FROM events WHERE {col} IS NOT NULL)
  GROUP BY {g.rstrip(', ') + (', ' if g else '')}reg_idx
"""


_HLL_EST_SQL = """
  SELECT scope,
         CAST(SUM(1::BIGINT << (55 - max_rank))
              + (64 - COUNT(*)) * (1::BIGINT << 55) AS BIGINT) AS sum_inv,
         CAST(64 - COUNT(*) AS INTEGER) AS n_zero
  FROM {regs} GROUP BY scope
"""

_ORACLE_HLL = f"""
WITH per_type AS ({_hll_regs_sql("user_id", "event_type")}),
all_ids AS ({_hll_regs_sql("event_id", None)}),
merged AS (
  SELECT reg_idx, MAX(max_rank) AS max_rank FROM per_type GROUP BY reg_idx
),
scoped AS (
  SELECT 'type:' || event_type AS scope, reg_idx, max_rank FROM per_type
  UNION ALL
  SELECT 'merged:user_id', reg_idx, max_rank FROM merged
  UNION ALL
  SELECT 'all:event_id', reg_idx, max_rank FROM all_ids
),
est AS ({_HLL_EST_SQL.format(regs="scoped")}),
exact AS (
  SELECT 'type:' || event_type AS scope,
         COUNT(DISTINCT user_id) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
  UNION ALL
  SELECT 'merged:user_id', COUNT(DISTINCT user_id)
  FROM events WHERE user_id IS NOT NULL
  UNION ALL
  SELECT 'all:event_id', COUNT(DISTINCT event_id)
  FROM events WHERE event_id IS NOT NULL
)
SELECT e.scope, e.sum_inv, e.n_zero,
       round(CASE WHEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(e.sum_inv AS DOUBLE) <= 160.0
                       AND e.n_zero > 0
                  THEN 64.0 * ln(64.0 / CAST(e.n_zero AS DOUBLE))
                  ELSE CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(e.sum_inv AS DOUBLE)
             END, 6) AS est_distinct,
       x.exact_distinct
FROM est e JOIN exact x USING (scope)
ORDER BY scope
"""


@register(
    "agg_hll_distinct_sketch",
    oracle=_ORACLE_HLL,
    tags=("agg", "sketch", "scale"),
    doc=(
        "Real HyperLogLog (Flajolet 2007: md5 fixed-point hash, 64 "
        "registers = top-6-bit index + leading-zero rank, alpha_64 bias "
        "correction, LinearCounting small-range switch) with CROSS-ENGINE-"
        "EXACT state: ranks come from length(bin(w)) and the harmonic sum "
        "is kept as an exact BIGINT (sum of 2^(55-rank), missing registers "
        "= 2^55), so DuckDB reproduces every register and sum_inv "
        "bit-for-bit — unlike approx_count_distinct's opaque binary state. "
        "Three scopes demo the three uses: per-group sketches (user_id per "
        "event_type, LinearCounting branch at fixture scale), an "
        "element-wise register-MAX merge of those sketches (the rollup "
        "that never rescans history), and a high-cardinality global sketch "
        "(event_id, raw-estimate branch). Plan: one scan -> map-side "
        "partial MAX into <= groups x 64 cells; exact_distinct is kept "
        "beside the estimate for fixture-scale calibration only."
    ),
)
def agg_hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_merge, hll_registers

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    per_type = hll_registers(
        ev.where(F.col("user_id").isNotNull()), "user_id", ["event_type"]
    )
    all_ids = hll_registers(
        ev.where(F.col("event_id").isNotNull()), "event_id", []
    )
    scoped = (
        per_type.select(
            F.concat(F.lit("type:"), F.col("event_type")).alias("scope"),
            "reg_idx",
            "max_rank",
        )
        .unionByName(
            hll_merge(per_type.drop("event_type"), []).select(
                F.lit("merged:user_id").alias("scope"), "reg_idx", "max_rank"
            )
        )
        .unionByName(
            all_ids.select(
                F.lit("all:event_id").alias("scope"), "reg_idx", "max_rank"
            )
        )
    )
    est = hll_estimate(scoped, ["scope"])
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy(F.concat(F.lit("type:"), F.col("event_type")).alias("scope"))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev.where(F.col("user_id").isNotNull()).agg(
                F.countDistinct("user_id").alias("exact_distinct")
            ).select(F.lit("merged:user_id").alias("scope"), "exact_distinct")
        )
        .unionByName(
            ev.where(F.col("event_id").isNotNull()).agg(
                F.countDistinct("event_id").alias("exact_distinct")
            ).select(F.lit("all:event_id").alias("scope"), "exact_distinct")
        )
    )
    return est.join(exact, "scope").orderBy("scope")


_ORACLE_HLL_RUNNING = f"""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
regs AS (
  SELECT d, (h >> 54) AS reg_idx,
         MAX(CASE WHEN (h & 18014398509481983) = 0 THEN 55
                  ELSE 55 - length(bin(h & 18014398509481983)) END)
           AS max_rank
  FROM (SELECT CAST(ts AS DATE) AS d,
               {_HLL_HASH.format(col="user_id")} AS h
        FROM events WHERE user_id IS NOT NULL)
  GROUP BY d, reg_idx
),
cume AS (
  SELECT days.d AS scope, r.reg_idx, MAX(r.max_rank) AS max_rank
  FROM days JOIN regs r ON r.d <= days.d
  GROUP BY days.d, r.reg_idx
),
est AS ({_HLL_EST_SQL.format(regs="cume")})
SELECT scope AS d, sum_inv, n_zero,
       round(CASE WHEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(sum_inv AS DOUBLE) <= 160.0
                       AND n_zero > 0
                  THEN 64.0 * ln(64.0 / CAST(n_zero AS DOUBLE))
                  ELSE CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(sum_inv AS DOUBLE)
             END, 6) AS est_cume_users
FROM est ORDER BY d
"""


@register(
    "agg_hll_running_daily",
    oracle=_ORACLE_HLL_RUNNING,
    tags=("agg", "sketch", "timeseries", "scale"),
    doc=(
        "Running cumulative distinct-user estimate per day from MERGED "
        "daily HyperLogLog sketches — the HLL twin of "
        "agg_kmv_running_daily, now exactly oracle-checkable because the "
        "register state is cross-engine-exact (md5 ranks + BIGINT "
        "harmonic sums): each day contributes a <= 64-cell register "
        "sketch, and day D's cumulative estimate is the element-wise "
        "register MAX over days <= D — history is never rescanned, the "
        "running state is days x 64 cells. One scan builds the daily "
        "registers (map-side partial MAX); the cumulative merge is a "
        "days-spine range join over the tiny register table."
    ),
)
def agg_hll_running_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_registers

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    daily = hll_registers(
        ev.select(F.col("ts").cast("date").alias("d"), "user_id"),
        "user_id",
        ["d"],
    )
    days = ev.select(F.col("ts").cast("date").alias("scope")).distinct()
    cume = (
        days.join(
            F.broadcast(daily), daily["d"] <= days["scope"], "inner"
        )
        .groupBy("scope", "reg_idx")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    est = hll_estimate(cume, ["scope"])
    return est.select(
        F.col("scope").alias("d"),
        "sum_inv",
        "n_zero",
        F.col("est_distinct").alias("est_cume_users"),
    ).orderBy("d")


_ORACLE_HLL_USERS = f"""
WITH per_type AS ({_hll_regs_sql("user_id", "event_type")}),
merged AS (
  SELECT reg_idx, MAX(max_rank) AS max_rank FROM per_type GROUP BY reg_idx
),
scoped AS (
  SELECT event_type AS scope, reg_idx, max_rank FROM per_type
  UNION ALL
  SELECT 'ALL', reg_idx, max_rank FROM merged
),
est AS ({_HLL_EST_SQL.format(regs="scoped")})
SELECT scope AS event_type, sum_inv, n_zero,
       round(CASE WHEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(sum_inv AS DOUBLE) <= 160.0
                       AND n_zero > 0
                  THEN 64.0 * ln(64.0 / CAST(n_zero AS DOUBLE))
                  ELSE CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
                       / CAST(sum_inv AS DOUBLE)
             END, 6) AS approx_users
FROM est ORDER BY event_type
"""


@register(
    "agg_hll_users_md5",
    oracle=_ORACLE_HLL_USERS,
    tags=("agg", "sketch", "scale"),
    doc=(
        "Oracle-backed TWIN of agg_hll_sketch_users (VERDICT r7 item 6): "
        "the identical output shape — distinct-user estimate per "
        "event_type plus an ALL row merged from the per-type sketches — "
        "but built on the house cross-engine-exact HLL (md5 fixed-point "
        "ranks, BIGINT harmonic sums) instead of Spark's opaque "
        "DataSketches binary state, so DuckDB reproduces every register "
        "bit-for-bit. The rows-only original stays registered to cover "
        "the built-in hll_sketch_agg/hll_union_agg surface; this twin "
        "pins the semantics with a hard value check. Same plan shape: "
        "one scan, map-side partial MAX into <= types x 64 cells, "
        "element-wise-MAX merge for the ALL scope."
    ),
)
def agg_hll_users_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_merge, hll_registers

    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_type = hll_registers(ev, "user_id", ["event_type"])
    scoped = per_type.select(
        F.col("event_type").alias("scope"), "reg_idx", "max_rank"
    ).unionByName(
        hll_merge(per_type.drop("event_type"), []).select(
            F.lit("ALL").alias("scope"), "reg_idx", "max_rank"
        )
    )
    est = hll_estimate(scoped, ["scope"])
    return est.select(
        F.col("scope").alias("event_type"),
        "sum_inv",
        "n_zero",
        F.col("est_distinct").alias("approx_users"),
    ).orderBy("event_type")
