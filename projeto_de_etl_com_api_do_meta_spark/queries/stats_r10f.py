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
