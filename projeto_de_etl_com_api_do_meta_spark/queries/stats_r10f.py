"""Round-10f batch: post-hoc comparison and method-comparison regression.

* ``ml_tukey_hsd`` — Tukey's honest-significant-difference q statistic
  for every event-type pair after the one-way ANOVA, from the same
  exact integer group moments.
* ``ml_passing_bablok`` — the nonparametric method-comparison
  regression (median of pairwise slopes with the Passing-Bablok shift)
  between the click and view daily series, exact via the bounded
  pairwise-slope table.
* ``ml_deming_regression`` — errors-in-variables regression (lambda=1)
  with the closed-form slope from exact integer moments.

Together with ml_bland_altman and ml_lin_ccc these complete the
method-comparison toolbox (agreement limits, concordance, robust and
EIV fits).  Determinism contract as everywhere: exact BIGINT moments /
half-unit order statistics, one final float per readout.  Reference
scope: [EXT] SURVEY §6 analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Tukey HSD q statistics per event-type pair
# ---------------------------------------------------------------------------

_ORACLE_TUKEY = """
WITH x AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM x GROUP BY g
),
gl AS (
  -- within-group SS as a sum of per-group DOUBLE terms, each the exact
  -- rational Q - S^2/n rendered by one fixed-op-order expression and
  -- e0-rounded to an integer before the cross-group sum
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(round(CAST(q AS DOUBLE)
                             - CAST(s AS DOUBLE) * s / n) AS BIGINT))
              AS BIGINT) AS ssw
  FROM grp
)
SELECT a.g AS g_low, b.g AS g_high, a.n AS n_low, b.n AS n_high,
       CAST(a.s * b.n - b.s * a.n AS BIGINT) AS diff_num,
       round(CASE WHEN gl.n_tot <= gl.k OR gl.ssw <= 0 THEN 0.0
                  ELSE ABS(CAST(a.s AS DOUBLE) / a.n
                           - CAST(b.s AS DOUBLE) / b.n)
                       / sqrt(CAST(gl.ssw AS DOUBLE)
                              / (gl.n_tot - gl.k)
                              * 0.5 * (1.0 / a.n + 1.0 / b.n)) END,
             6) AS q_stat
FROM grp a JOIN grp b ON a.g < b.g, gl
"""


@register(
    "ml_tukey_hsd",
    oracle=_ORACLE_TUKEY,
    tags=("ml", "stats"),
    doc=(
        "Tukey HSD post-hoc q statistic for every event-type pair after "
        "the one-way ANOVA: q = |mean_a - mean_b| / sqrt(MSE/2 (1/n_a + "
        "1/n_b)) with the within-group SS carried as per-group "
        "e0-rounded integers (Q - S^2/n) summed as BIGINTs, the mean "
        "difference also carried as the exact integer S_a n_b - S_b n_a, "
        "and one final float per pair on the k-row moment table.  The "
        "WHICH-groups-differ answer ml_anova_oneway_exact's F cannot "
        "give.  One grouped aggregate + a k x k broadcast grid."
    ),
)
def ml_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    grp = x.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    ssw_i = F.round(
        F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ).cast("bigint")
    gl = grp.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(ssw_i).cast("bigint").alias("ssw"),
    )
    a = grp.select(
        F.col("g").alias("g_low"),
        F.col("n").alias("n_low"),
        F.col("s").alias("s_low"),
    )
    b = grp.select(
        F.col("g").alias("g_high"),
        F.col("n").alias("n_high"),
        F.col("s").alias("s_high"),
    )
    pairs = a.join(b, F.col("g_low") < F.col("g_high")).join(
        F.broadcast(gl), F.lit(True), "left"
    )
    diff_num = (
        F.col("s_low") * F.col("n_high") - F.col("s_high") * F.col("n_low")
    ).cast("bigint")
    q_stat = F.when(
        (F.col("n_tot") <= F.col("k")) | (F.col("ssw") <= 0), F.lit(0.0)
    ).otherwise(
        F.abs(
            F.col("s_low").cast("double") / F.col("n_low")
            - F.col("s_high").cast("double") / F.col("n_high")
        )
        / F.sqrt(
            F.col("ssw").cast("double")
            / (F.col("n_tot") - F.col("k"))
            * 0.5
            * (1.0 / F.col("n_low") + 1.0 / F.col("n_high"))
        )
    )
    return pairs.select(
        "g_low",
        "g_high",
        "n_low",
        "n_high",
        diff_num.alias("diff_num"),
        F.round(q_stat, 6).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# Shared daily click/view series (method-comparison fixtures)
# ---------------------------------------------------------------------------

_ORACLE_DAILY_XY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
)
"""

_ORACLE_PASSING_BABLOK = (
    _ORACLE_DAILY_XY
    + """
, slopes AS (
  -- pairwise slopes as exact rationals (num, den); vertical pairs and
  -- the Passing-Bablok excluded slope -1 (num = -den) are dropped
  SELECT b.y - a.y AS num, b.x - a.x AS den
  FROM daily a JOIN daily b ON a.day < b.day
  WHERE b.x <> a.x AND (b.y - a.y) <> -(b.x - a.x)
),
ranked AS (
  -- order slopes by their double value (identical (num, den) pairs give
  -- identical doubles in both engines, so the global order matches),
  -- ties broken deterministically by (num, den)
  SELECT num, den,
         row_number() OVER (
           ORDER BY CAST(CASE WHEN den < 0 THEN -num ELSE num END AS DOUBLE)
                    / CASE WHEN den < 0 THEN -den ELSE den END,
                    num, den) AS rn,
         COUNT(*) OVER () AS n_s,
         CAST(SUM(CASE WHEN CASE WHEN den < 0 THEN -num ELSE num END
                            < -(CASE WHEN den < 0 THEN -den ELSE den END)
                       THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n_neg
  FROM slopes
),
med AS (
  -- PB shift: the median position is offset by the FULL K = #slopes
  -- < -1 (exact integer cross-multiply test); odd/even handled as the
  -- usual two-middle sum of e6-fixed values (2*median scale)
  SELECT
    CAST(SUM(CASE WHEN rn = n_neg + (n_s + 1) // 2
                    OR rn = n_neg + (n_s + 2) // 2
             THEN CAST(round(CAST(CASE WHEN den < 0 THEN -num ELSE num END
                                  AS DOUBLE) * 1000000.0
                             / (CASE WHEN den < 0 THEN -den ELSE den END))
                  AS BIGINT)
                  * CASE WHEN n_neg + (n_s + 1) // 2
                              = n_neg + (n_s + 2) // 2
                         THEN 2 ELSE 1 END
             ELSE 0 END) AS BIGINT) AS m2_e6,
    ANY_VALUE(n_s) AS n_slopes, ANY_VALUE(n_neg) AS n_below_minus1
  FROM ranked
)
SELECT n_slopes, n_below_minus1, m2_e6 AS slope2_e6,
       round(CAST(m2_e6 AS DOUBLE) / 2000000.0, 6) AS pb_slope
FROM med
"""
)


@register(
    "ml_passing_bablok",
    oracle=_ORACLE_PASSING_BABLOK,
    tags=("ml", "stats"),
    doc=(
        "Passing-Bablok method-comparison slope between the click and "
        "view daily series: all pairwise slopes as exact (num, den) "
        "rationals over the calendar-bounded day pairs (~435 at 30 "
        "days), slopes equal to -1 excluded and the median OFFSET by "
        "the exact integer count of slopes below -1 (both "
        "cross-multiply tests, no float decides), the selected slope "
        "e6-fixed.  Scale-invariant and outlier-robust where OLS is "
        "neither — completes the method-comparison family beside "
        "Bland-Altman and Lin's CCC.  The pair join is spine-bounded; "
        "raw events never pair."
    ),
)
def ml_passing_bablok(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .where(
            (F.col("b.x") != F.col("a.x"))
            & ((F.col("b.y") - F.col("a.y")) != -(F.col("b.x") - F.col("a.x")))
        )
        .select(
            (F.col("b.y") - F.col("a.y")).alias("num"),
            (F.col("b.x") - F.col("a.x")).alias("den"),
        )
    )
    pnum = F.when(F.col("den") < 0, -F.col("num")).otherwise(F.col("num"))
    pden = F.when(F.col("den") < 0, -F.col("den")).otherwise(F.col("den"))
    ranked = slopes.select(
        "num",
        "den",
        F.row_number()
        .over(
            Window.orderBy(
                pnum.cast("double") / pden, F.col("num"), F.col("den")
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n_s"),
        F.sum(F.when(pnum < -pden, 1).otherwise(0))
        .over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("n_neg"),
        F.round(pnum.cast("double") * 1000000.0 / pden)
        .cast("bigint")
        .alias("slope_e6_row"),
    )
    p1 = F.col("n_neg") + F.expr("(n_s + 1) div 2")
    p2 = F.col("n_neg") + F.expr("(n_s + 2) div 2")
    med = ranked.agg(
        F.sum(
            F.when(
                (F.col("rn") == p1) | (F.col("rn") == p2),
                F.col("slope_e6_row")
                * F.when(p1 == p2, 2).otherwise(1),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("m2_e6"),
        F.first("n_s").cast("bigint").alias("n_slopes"),
        F.first("n_neg").cast("bigint").alias("n_below_minus1"),
    )
    return med.select(
        "n_slopes",
        "n_below_minus1",
        F.col("m2_e6").alias("slope2_e6"),
        F.round(F.col("m2_e6").cast("double") / 2000000.0, 6).alias("pb_slope"),
    )


_ORACLE_DEMING = (
    _ORACLE_DAILY_XY
    + """
, m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily
)
SELECT n, sx, sy, sxx, syy, sxy,
       round(CASE WHEN n * sxy - sx * sy = 0 THEN 0.0
                  ELSE ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                        - (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        + sqrt(((CAST(n AS DOUBLE) * syy
                                 - CAST(sy AS DOUBLE) * sy)
                                - (CAST(n AS DOUBLE) * sxx
                                   - CAST(sx AS DOUBLE) * sx))
                               * ((CAST(n AS DOUBLE) * syy
                                   - CAST(sy AS DOUBLE) * sy)
                                  - (CAST(n AS DOUBLE) * sxx
                                     - CAST(sx AS DOUBLE) * sx))
                               + 4.0 * (CAST(n AS DOUBLE) * sxy
                                        - CAST(sx AS DOUBLE) * sy)
                                     * (CAST(n AS DOUBLE) * sxy
                                        - CAST(sx AS DOUBLE) * sy)))
                       / (2.0 * (CAST(n AS DOUBLE) * sxy
                                 - CAST(sx AS DOUBLE) * sy)) END,
             6) AS deming_slope
FROM m
"""
)


@register(
    "ml_deming_regression",
    oracle=_ORACLE_DEMING,
    tags=("ml", "stats"),
    doc=(
        "Deming errors-in-variables regression (lambda=1) between the "
        "click and view daily series: slope = (Syy - Sxx + sqrt((Syy - "
        "Sxx)^2 + 4 Sxy^2)) / (2 Sxy) with every S carried as the exact "
        "integer n*moment - sum*sum (the shared n^2 factor cancels) and "
        "ONE final float expression — the fit OLS gets wrong when BOTH "
        "variables carry noise, i.e. every method-comparison setting.  "
        "One grouped aggregate over the calendar-bounded daily spine."
    ),
)
def ml_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    syy_c = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    sxx_c = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    sxy_c = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    slope = F.when(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy") == 0, F.lit(0.0)
    ).otherwise(
        (
            (syy_c - sxx_c)
            + F.sqrt((syy_c - sxx_c) * (syy_c - sxx_c) + 4.0 * sxy_c * sxy_c)
        )
        / (2.0 * sxy_c)
    )
    return m.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.round(slope, 6).alias("deming_slope"),
    )


# ---------------------------------------------------------------------------
# Data-integrity checksum audit (Adler-32 + CRC-32 folds)
# ---------------------------------------------------------------------------


def _crc32_table() -> list:
    """The standard CRC-32 (IEEE 802.3, poly 0xEDB88320) lookup table,
    generated here and embedded as a shared literal array in BOTH
    engines' SQL."""
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc32_table()


def _checksum_oracle() -> str:
    table_lit = "[" + ", ".join(str(v) for v in _CRC_TABLE) + "]"
    # DuckDB list_reduce has no init param: prepend the init element.
    adler = (
        "list_reduce(list_prepend([CAST(1 AS BIGINT), CAST(0 AS BIGINT)], "
        "list_transform(cps, c -> [c, CAST(0 AS BIGINT)])), "
        "(acc, e) -> [(acc[1] + e[1]) % 65521, "
        "(acc[2] + acc[1] + e[1]) % 65521])"
    )
    crc = (
        "list_reduce(list_prepend(CAST(4294967295 AS BIGINT), cps), "
        "(crc, c) -> xor(CAST(floor(crc / 256.0) AS BIGINT), "
        f"({table_lit})[CAST(xor(crc, c) % 256 AS INTEGER) + 1]))"
    )
    return f"""
WITH cp AS (
  SELECT doc_id, source,
         list_transform(string_split(text, ''),
                        ch -> CAST(unicode(ch) AS BIGINT)) AS cps
  FROM documents WHERE strlen(text) > 0
),
sums AS (
  SELECT doc_id, source,
         {adler} AS ad,
         xor({crc}, CAST(4294967295 AS BIGINT)) AS crc
  FROM cp
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ad[2] * 65536 + ad[1]) AS BIGINT) AS sum_adler32,
       CAST(SUM(crc) AS BIGINT) AS sum_crc32,
       CAST(MIN(ad[2] * 65536 + ad[1]) AS BIGINT) AS min_adler32
FROM sums GROUP BY source
"""


@register(
    "dq_checksum_audit",
    oracle=_checksum_oracle(),
    tags=("dq", "io"),
    doc=(
        "Data-integrity checksum audit: per-document Adler-32 (the [a, b] "
        "mod-65521 pair fold) and table-driven CRC-32 (IEEE 802.3 poly, "
        "256-entry table generated once in Python and embedded as a "
        "literal in BOTH engines), folded over the text's code points "
        "and summed per source — the order-independent integrity "
        "fingerprint a lakehouse copy job compares across replicas.  "
        "Matches zlib's byte checksums exactly on ASCII text (pinned by "
        "unit tests); defined over code points so unicode is total.  "
        "Pure integer folds; one shuffle."
    ),
)
def dq_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    table_lit = "array(" + ", ".join(str(v) for v in _CRC_TABLE) + ")"
    cps = "transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    adler = (
        f"aggregate({cps}, array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)), "
        "(acc, c) -> array((element_at(acc, 1) + c) % 65521, "
        "(element_at(acc, 2) + element_at(acc, 1) + c) % 65521))"
    )
    crc = (
        f"aggregate({cps}, CAST(4294967295 AS BIGINT), "
        "(crc, c) -> CAST(floor(crc / 256.0) AS BIGINT) ^ "
        f"element_at({table_lit}, CAST((crc ^ c) % 256 AS INT) + 1))"
    )
    sums = docs.where(F.octet_length("text") > 0).select(
        "source",
        F.expr(adler).alias("ad"),
        F.expr(f"({crc}) ^ CAST(4294967295 AS BIGINT)").alias("crc"),
    )
    return sums.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.expr("element_at(ad, 2) * 65536 + element_at(ad, 1)")
        )
        .cast("bigint")
        .alias("sum_adler32"),
        F.sum("crc").cast("bigint").alias("sum_crc32"),
        F.min(
            F.expr("element_at(ad, 2) * 65536 + element_at(ad, 1)")
        )
        .cast("bigint")
        .alias("min_adler32"),
    )


# ---------------------------------------------------------------------------
# Distribution-distance battery (TV / Hellinger / Bhattacharyya)
# ---------------------------------------------------------------------------

_ORACLE_DIST_DISTANCES = """
WITH x AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS s,
         CAST(floor(round(value * 100) / 5000.0) AS BIGINT) AS b
  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
h AS (
  SELECT b, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM x GROUP BY b
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM h
),
terms AS (
  -- TV numerator |c1 n2 - c2 n1| is an exact integer; the per-bucket
  -- Bhattacharyya term sqrt(p q) is e12-fixed before the cross-bucket sum
  SELECT CAST(SUM(ABS(c1 * n.n2 - c2 * n.n1)) AS BIGINT) AS tv_num,
         CAST(SUM(CAST(round(sqrt(CAST(c1 AS DOUBLE) * c2
                                  / (CAST(n.n1 AS DOUBLE) * n.n2))
                             * 1000000000000.0) AS BIGINT)) AS BIGINT)
           AS bc_e12,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM h, n
)
SELECT n.n1, n.n2, t.n_buckets, t.tv_num, t.bc_e12,
       round(CAST(t.tv_num AS DOUBLE) / (2.0 * n.n1 * n.n2), 6)
         AS total_variation,
       round(CAST(t.bc_e12 AS DOUBLE) / 1000000000000.0, 6)
         AS bhattacharyya_coef,
       round(sqrt(GREATEST(1.0 - CAST(t.bc_e12 AS DOUBLE)
                           / 1000000000000.0, 0.0)), 6) AS hellinger
FROM terms t, n
"""


@register(
    "ml_distribution_distances",
    oracle=_ORACLE_DIST_DISTANCES,
    tags=("ml", "stats", "drift"),
    doc=(
        "Distribution-distance battery between the click and view value "
        "histograms (fixed 50-unit cent buckets): total variation from "
        "the exact integer numerator sum|c1 n2 - c2 n1| / (2 n1 n2), "
        "Bhattacharyya coefficient with each per-bucket sqrt(p q) term "
        "e12-FIXED before the cross-bucket sum, and Hellinger = "
        "sqrt(1 - BC) as the final float — the bounded-metric companions "
        "of the repo's Wasserstein/JSD/KS/AD drift family (TV bounds "
        "every f-divergence; Hellinger is the L2 of sqrt-densities).  "
        "One grouped histogram + one tiny aggregate."
    ),
)
def ml_distribution_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    ).select(
        F.when(F.col("event_type") == "click", 1).otherwise(2).alias("s"),
        F.floor(F.round(F.col("value") * 100) / 5000.0).cast("bigint").alias("b"),
    )
    h = x.groupBy("b").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    n = h.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    hn = h.join(F.broadcast(n), F.lit(True), "left")
    bc_term = F.round(
        F.sqrt(
            F.col("c1").cast("double")
            * F.col("c2")
            / (F.col("n1").cast("double") * F.col("n2"))
        )
        * 1000000000000.0
    ).cast("bigint")
    terms = hn.agg(
        F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
        .cast("bigint")
        .alias("tv_num"),
        F.sum(bc_term).cast("bigint").alias("bc_e12"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    out = terms.join(F.broadcast(n), F.lit(True), "left")
    return out.select(
        "n1",
        "n2",
        "n_buckets",
        "tv_num",
        "bc_e12",
        F.round(
            F.col("tv_num").cast("double") / (2.0 * F.col("n1") * F.col("n2")),
            6,
        ).alias("total_variation"),
        F.round(F.col("bc_e12").cast("double") / 1000000000000.0, 6).alias(
            "bhattacharyya_coef"
        ),
        F.round(
            F.sqrt(
                F.greatest(
                    1.0 - F.col("bc_e12").cast("double") / 1000000000000.0,
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("hellinger"),
    )


# ---------------------------------------------------------------------------
# As-was vs as-is SCD2 dual-perspective report
# ---------------------------------------------------------------------------

_ORACLE_AS_WAS_AS_IS = """
WITH src AS (
  SELECT user_id, ts, event_id,
         CAST(floor(round(value * 100) / 10000.0) AS BIGINT) AS tier
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
changes AS (
  SELECT * FROM (
    SELECT user_id, ts, event_id, tier,
           lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev
    FROM src)
  WHERE prev IS NULL OR tier <> prev
),
versions AS (
  -- event_id tiebreak matches the change-detection lag: two same-ts tier
  -- changes for one user must close in the same order in both engines
  -- (ADVICE r10)
  SELECT user_id, ts AS valid_from, tier,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes
),
clicks AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'click' AND value IS NOT NULL
),
as_was AS (
  SELECT v.tier, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c.cents) AS BIGINT) AS cents
  FROM clicks c JOIN versions v
    ON v.user_id = c.user_id AND c.ts >= v.valid_from
   AND (v.valid_to IS NULL OR c.ts < v.valid_to)
  GROUP BY v.tier
),
as_is AS (
  SELECT v.tier, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c.cents) AS BIGINT) AS cents
  FROM clicks c JOIN versions v
    ON v.user_id = c.user_id AND v.valid_to IS NULL
  GROUP BY v.tier
)
SELECT COALESCE(w.tier, i.tier) AS tier,
       COALESCE(w.n, 0) AS n_as_was, COALESCE(w.cents, 0) AS cents_as_was,
       COALESCE(i.n, 0) AS n_as_is, COALESCE(i.cents, 0) AS cents_as_is
FROM as_was w FULL OUTER JOIN as_is i ON i.tier = w.tier
"""


@register(
    "warehouse_as_was_as_is",
    oracle=_ORACLE_AS_WAS_AS_IS,
    tags=("warehouse",),
    doc=(
        "The SCD2 dual-perspective report — click revenue by customer "
        "tier AS-WAS (the tier in effect when each click happened, the "
        "point-in-time join) next to AS-IS (every click restated under "
        "the customer's CURRENT tier): the report pair that motivates "
        "keeping type-2 history at all, and whose row-level divergence "
        "(clicks before a user's first version exist only as-is) is the "
        "auditable difference between the two attributions.  Versions "
        "from the same change-detection window as warehouse_scd2_build; "
        "exact cents; one full-outer tier merge with 0-fill."
    ),
)
def warehouse_as_was_as_is(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    src = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.round(F.col("value") * 100) / 10000.0)
        .cast("bigint")
        .alias("tier"),
    )
    changes = (
        src.withColumn("prev", F.lag("tier").over(w))
        .where(F.col("prev").isNull() | (F.col("tier") != F.col("prev")))
        .drop("prev")
    )
    # same (ts, event_id) tiebreak as the change-detection lag, so two
    # same-timestamp tier changes close deterministically (ADVICE r10)
    versions = changes.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("valid_from"),
        "tier",
        F.lead("ts").over(w).alias("valid_to"),
    )
    clicks = ev.where(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    ).select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    as_was = (
        clicks.join(
            versions,
            (F.col("v_user_id") == clicks.user_id)
            & (clicks.ts >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (clicks.ts < F.col("valid_to"))),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_as_was"),
            F.sum("cents").cast("bigint").alias("cents_as_was"),
        )
    )
    as_is = (
        clicks.join(
            versions.where(F.col("valid_to").isNull()),
            F.col("v_user_id") == clicks.user_id,
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_as_is"),
            F.sum("cents").cast("bigint").alias("cents_as_is"),
        )
    )
    return (
        as_was.join(as_is, "tier", "full_outer")
        .select(
            "tier",
            F.coalesce("n_as_was", F.lit(0)).alias("n_as_was"),
            F.coalesce("cents_as_was", F.lit(0)).alias("cents_as_was"),
            F.coalesce("n_as_is", F.lit(0)).alias("n_as_is"),
            F.coalesce("cents_as_is", F.lit(0)).alias("cents_as_is"),
        )
    )


# ---------------------------------------------------------------------------
# Distance correlation over the daily spine
# ---------------------------------------------------------------------------

_ORACLE_DCOR = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY CAST(ts AS DATE)
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
pairs AS (
  SELECT a.day AS di, b.day AS dj,
         ABS(a.x - b.x) AS ax, ABS(a.y - b.y) AS ay
  FROM daily a CROSS JOIN daily b
),
rows_ AS (
  SELECT di, CAST(SUM(ax) AS BIGINT) AS rx, CAST(SUM(ay) AS BIGINT) AS ry
  FROM pairs GROUP BY di
),
g AS (
  SELECT CAST(SUM(rx) AS BIGINT) AS gx, CAST(SUM(ry) AS BIGINT) AS gy
  FROM rows_
),
cent AS (
  -- double-centered entries scaled by n^2 (exact integers; the matrix
  -- is symmetric so row and column sums coincide)
  SELECT n.n * n.n * p.ax - n.n * ri.rx - n.n * rj.rx + g.gx AS axx,
         n.n * n.n * p.ay - n.n * ri.ry - n.n * rj.ry + g.gy AS ayy
  FROM pairs p
  JOIN rows_ ri ON ri.di = p.di
  JOIN rows_ rj ON rj.di = p.dj, n, g
),
s AS (
  SELECT CAST(SUM(axx * ayy) AS BIGINT) AS dcov2_num,
         CAST(SUM(axx * axx) AS BIGINT) AS dvarx_num,
         CAST(SUM(ayy * ayy) AS BIGINT) AS dvary_num
  FROM cent
)
SELECT n.n AS n_days, s.dcov2_num, s.dvarx_num, s.dvary_num,
       round(CASE WHEN s.dvarx_num <= 0 OR s.dvary_num <= 0
                       OR s.dcov2_num <= 0 THEN 0.0
                  ELSE sqrt(CAST(s.dcov2_num AS DOUBLE)
                            / sqrt(CAST(s.dvarx_num AS DOUBLE)
                                   * CAST(s.dvary_num AS DOUBLE))) END,
             6) AS dcor
FROM s, n
"""


@register(
    "ml_distance_correlation",
    oracle=_ORACLE_DCOR,
    tags=("ml", "stats"),
    doc=(
        "Szekely's distance correlation between the click and view daily "
        "series — the dependence measure that is ZERO iff independent "
        "(Pearson misses every nonlinear relationship): pairwise "
        "|x_i - x_j| distance matrices over the calendar-bounded spine, "
        "double-centered entries carried as exact n^2-scaled BIGINTs "
        "(the common scale cancels in the ratio), dCov^2/dVar sums exact, "
        "and one final float renders dCor.  The n x n pair grid is "
        "30 x 30 at any event volume — spine-bounded, never row-bounded."
    ),
)
def ml_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    # full n x n grid over the bounded daily spine (benign cartesian:
    # 30 x 30 rows at any data volume — plan-audit: spine-bounded)
    pairs = a.crossJoin(b).select(
        F.col("a.day").alias("di"),
        F.col("b.day").alias("dj"),
        F.abs(F.col("a.x") - F.col("b.x")).alias("ax"),
        F.abs(F.col("a.y") - F.col("b.y")).alias("ay"),
    )
    rows_ = pairs.groupBy("di").agg(
        F.sum("ax").cast("bigint").alias("rx"),
        F.sum("ay").cast("bigint").alias("ry"),
    )
    g = rows_.agg(
        F.sum("rx").cast("bigint").alias("gx"),
        F.sum("ry").cast("bigint").alias("gy"),
    )
    ri = rows_.select(
        F.col("di").alias("i_key"), F.col("rx").alias("rxi"), F.col("ry").alias("ryi")
    )
    rj = rows_.select(
        F.col("di").alias("j_key"), F.col("rx").alias("rxj"), F.col("ry").alias("ryj")
    )
    cent = (
        pairs.join(F.broadcast(ri), F.col("i_key") == F.col("di"))
        .join(F.broadcast(rj), F.col("j_key") == F.col("dj"))
        .join(F.broadcast(n), F.lit(True), "left")
        .join(F.broadcast(g), F.lit(True), "left")
        .select(
            (
                F.col("n") * F.col("n") * F.col("ax")
                - F.col("n") * F.col("rxi")
                - F.col("n") * F.col("rxj")
                + F.col("gx")
            ).alias("axx"),
            (
                F.col("n") * F.col("n") * F.col("ay")
                - F.col("n") * F.col("ryi")
                - F.col("n") * F.col("ryj")
                + F.col("gy")
            ).alias("ayy"),
        )
    )
    s = cent.agg(
        F.sum(F.col("axx") * F.col("ayy")).cast("bigint").alias("dcov2_num"),
        F.sum(F.col("axx") * F.col("axx")).cast("bigint").alias("dvarx_num"),
        F.sum(F.col("ayy") * F.col("ayy")).cast("bigint").alias("dvary_num"),
    )
    dcor = F.when(
        (F.col("dvarx_num") <= 0)
        | (F.col("dvary_num") <= 0)
        | (F.col("dcov2_num") <= 0),
        F.lit(0.0),
    ).otherwise(
        F.sqrt(
            F.col("dcov2_num").cast("double")
            / F.sqrt(
                F.col("dvarx_num").cast("double")
                * F.col("dvary_num").cast("double")
            )
        )
    )
    return s.join(F.broadcast(n), F.lit(True), "left").select(
        F.col("n").alias("n_days"),
        "dcov2_num",
        "dvarx_num",
        "dvary_num",
        F.round(dcor, 6).alias("dcor"),
    )
