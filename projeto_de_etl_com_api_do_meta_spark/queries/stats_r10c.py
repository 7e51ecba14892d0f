"""Round-10c nonparametric / robust statistics operators.

Completes the distribution-free family around the r9/r10 additions
(Kruskal-Wallis, Friedman, ANOVA, runs, Page, Cochran):

* ``ml_brown_forsythe`` — robust variance-equality test on |x - group
  median| (the median-centred Levene).
* ``ml_mood_median_test`` — k-group median test from grand-median
  above/below counts.
* ``ml_jonckheere_trend`` — Jonckheere-Terpstra ordered-alternative
  trend statistic from exact cross-group dominance counts.
* ``ml_cliffs_delta`` — Cliff's delta ordinal effect size for every
  group pair from the same dominance machinery.
* ``ml_krippendorff_alpha`` — nominal inter-rater reliability over the
  user x event-type rating matrix.
* ``events_mann_kendall_trend`` — Mann-Kendall trend S with
  tie-corrected null variance over each type's daily series.

Determinism contract (repo-wide): values quantize to exact integer
fixed point (cents ``round(value*100)`` or unit buckets
``round(value)``), medians are carried as the exact integer ``2*median``
(sum of the two middle order statistics), dominance/tie counts come
from a distinct-value spine with windowed cumulative counts (never an
O(n^2) row join), and at most ONE final float expression per column —
identical text in both engines, correctly-rounded IEEE ops only —
renders the headline statistic rounded to 6 decimals.  Where a
rational intermediate must cross rows (sum of S_i^2/n_i, per-unit
disagreement), it is rounded to a FIXED-POINT INTEGER first so the
cross-row sum is order-independent in both engines.

Scale: every operator is one or two shuffles over grouped integer
aggregates; the dominance spine is O(k * |distinct buckets|), bounded
by the value-bucket vocabulary, not the row count.  Reference scope:
[EXT] SURVEY §6 analytics surface; the reference has no stats layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import grand_median2_spine
from .registry import register

# ---------------------------------------------------------------------------
# Brown-Forsythe robust variance-equality test
# ---------------------------------------------------------------------------

_ORACLE_BROWN_FORSYTHE = """
WITH x AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
o AS (
  SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM x
),
m AS (
  SELECT g,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
              AS BIGINT) AS m2
  FROM o GROUP BY g
),
z AS (
  SELECT o.g, ABS(2 * o.x - m.m2) AS z
  FROM o JOIN m ON o.g = m.g
),
grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS BIGINT) AS s_z,
         CAST(SUM(z * z) AS BIGINT) AS q_z
  FROM z GROUP BY g
),
gl AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s_z) AS BIGINT) AS t,
         CAST(SUM(CAST(round(CAST(s_z AS DOUBLE) * CAST(s_z AS DOUBLE) / n)
                       AS BIGINT)) AS BIGINT) AS sum_r,
         CAST(SUM(q_z) AS BIGINT) AS sum_q
  FROM grp
)
SELECT grp.g AS event_type, grp.n, grp.s_z, grp.q_z,
       round(CASE WHEN gl.k <= 1 OR gl.sum_q - gl.sum_r = 0 THEN 0.0
                  ELSE (CAST(gl.n_tot - gl.k AS DOUBLE)
                        / CAST(gl.k - 1 AS DOUBLE))
                       * CAST(gl.sum_r
                              - CAST(round(CAST(gl.t AS DOUBLE)
                                           * CAST(gl.t AS DOUBLE)
                                           / gl.n_tot) AS BIGINT) AS DOUBLE)
                       / CAST(gl.sum_q - gl.sum_r AS DOUBLE) END,
             6) AS bf_w
FROM grp, gl
"""


@register(
    "ml_brown_forsythe",
    oracle=_ORACLE_BROWN_FORSYTHE,
    tags=("ml", "stats"),
    doc=(
        "Brown-Forsythe robust variance-equality test: deviations |x - "
        "group median| with the median carried as the exact integer "
        "2*median (sum of the two middle cents order statistics), so "
        "every deviation, sum and square-sum is an exact BIGINT.  "
        "Sum(S_i^2/n_i) crosses groups as a per-group INTEGER rounding "
        "of the rational (order-independent), and the single final float "
        "renders W = ((N-k)/(k-1)) * between / within.  One window + two "
        "grouped aggregates; the 1-row global is a broadcast attach."
    ),
)
def ml_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("g").orderBy("x")
    o = x.select(
        "g",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
    )
    m = o.groupBy("g").agg(
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("x")).otherwise(0))
            + F.sum(F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("x")).otherwise(0))
        )
        .cast("bigint")
        .alias("m2")
    )
    z = o.join(m, "g").select("g", F.abs(2 * F.col("x") - F.col("m2")).alias("z"))
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("s_z"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("q_z"),
    )
    r_i = F.round(
        F.col("s_z").cast("double") * F.col("s_z").cast("double") / F.col("n")
    ).cast("bigint")
    gl = grp.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_z").cast("bigint").alias("t"),
        F.sum(r_i).cast("bigint").alias("sum_r"),
        F.sum("q_z").cast("bigint").alias("sum_q"),
    )
    t2n = F.round(
        F.col("t").cast("double") * F.col("t").cast("double") / F.col("n_tot")
    ).cast("bigint")
    bf = F.when(
        (F.col("k") <= 1) | (F.col("sum_q") - F.col("sum_r") == 0), F.lit(0.0)
    ).otherwise(
        ((F.col("n_tot") - F.col("k")).cast("double") / (F.col("k") - 1).cast("double"))
        * (F.col("sum_r") - t2n).cast("double")
        / (F.col("sum_q") - F.col("sum_r")).cast("double")
    )
    return grp.join(F.broadcast(gl), F.lit(True), "left").select(
        F.col("g").alias("event_type"),
        "n",
        "s_z",
        "q_z",
        F.round(bf, 6).alias("bf_w"),
    )


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------

_ORACLE_MOOD = """
WITH x AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
o AS (
  SELECT g, x, row_number() OVER (ORDER BY x) AS rn, COUNT(*) OVER () AS n
  FROM x
),
m AS (
  SELECT CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
              AS BIGINT) AS m2
  FROM o
),
c AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CASE WHEN 2 * x > m.m2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above
  FROM x, m GROUP BY g
),
gl AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
         CAST(SUM(n_above) AS BIGINT) AS a_tot
  FROM c
)
SELECT c.g AS event_type, c.n_g, c.n_above,
       c.n_g - c.n_above AS n_not_above,
       round(CASE WHEN gl.a_tot = 0 OR gl.a_tot = gl.n_tot THEN 0.0
                  ELSE (CAST(c.n_above AS DOUBLE)
                        - CAST(c.n_g AS DOUBLE) * gl.a_tot / gl.n_tot)
                       * (CAST(c.n_above AS DOUBLE)
                          - CAST(c.n_g AS DOUBLE) * gl.a_tot / gl.n_tot)
                       / (CAST(c.n_g AS DOUBLE) * gl.a_tot / gl.n_tot)
                       + (CAST(c.n_g - c.n_above AS DOUBLE)
                          - CAST(c.n_g AS DOUBLE) * (gl.n_tot - gl.a_tot)
                            / gl.n_tot)
                         * (CAST(c.n_g - c.n_above AS DOUBLE)
                            - CAST(c.n_g AS DOUBLE) * (gl.n_tot - gl.a_tot)
                              / gl.n_tot)
                         / (CAST(c.n_g AS DOUBLE) * (gl.n_tot - gl.a_tot)
                            / gl.n_tot) END,
             6) AS chi2_contrib
FROM c, gl
"""


@register(
    "ml_mood_median_test",
    oracle=_ORACLE_MOOD,
    tags=("ml", "stats"),
    doc=(
        "Mood's median test: the grand median is carried as the exact "
        "integer 2*median of the cents fixed point, each group's "
        "above/not-above split is an exact integer compare (2x > m2), "
        "and the per-group chi-square contribution is the single final "
        "float from those BIGINTs.  The median comes off the "
        "distinct-cent spine (cumulative counts locate the middle order "
        "statistics — no raw-row global sort) + one grouped aggregate; "
        "degenerate all-above/all-below renders 0."
    ),
)
def ml_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    # 2*grand-median from the distinct-cent spine — never a raw-row
    # global sort (plan-audit: the ml_auc_roc_exact contract).
    m = grand_median2_spine(x.select("x"), "x", "m2")
    c = (
        x.join(F.broadcast(m), F.lit(True), "left")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.when(2 * F.col("x") > F.col("m2"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
        )
    )
    gl = c.agg(
        F.sum("n_g").cast("bigint").alias("n_tot"),
        F.sum("n_above").cast("bigint").alias("a_tot"),
    )
    e_above = F.col("n_g").cast("double") * F.col("a_tot") / F.col("n_tot")
    e_below = (
        F.col("n_g").cast("double")
        * (F.col("n_tot") - F.col("a_tot"))
        / F.col("n_tot")
    )
    d_above = F.col("n_above").cast("double") - e_above
    d_below = (F.col("n_g") - F.col("n_above")).cast("double") - e_below
    contrib = F.when(
        (F.col("a_tot") == 0) | (F.col("a_tot") == F.col("n_tot")), F.lit(0.0)
    ).otherwise(d_above * d_above / e_above + d_below * d_below / e_below)
    return c.join(F.broadcast(gl), F.lit(True), "left").select(
        F.col("g").alias("event_type"),
        "n_g",
        "n_above",
        (F.col("n_g") - F.col("n_above")).alias("n_not_above"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# Shared dominance-count spine (Jonckheere / Cliff's delta)
# ---------------------------------------------------------------------------

_ORACLE_DOMINANCE = """
WITH x AS (
  SELECT event_type AS g, CAST(round(value) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
d AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY g, v),
spine AS (SELECT DISTINCT v FROM x),
gs AS (SELECT DISTINCT g FROM x),
grid AS (
  SELECT gs.g, spine.v, COALESCE(d.c, 0) AS c
  FROM gs CROSS JOIN spine
  LEFT JOIN d ON d.g = gs.g AND d.v = spine.v
),
cum AS (
  SELECT g, v, c,
         SUM(c) OVER (PARTITION BY g ORDER BY v
                      ROWS UNBOUNDED PRECEDING) - c AS cum_less
  FROM grid
),
pairs AS (
  SELECT a.g AS g_low, b.g AS g_high,
         CAST(SUM(b.c * a.cum_less) AS BIGINT) AS n_low_less,
         CAST(SUM(a.c * b.cum_less) AS BIGINT) AS n_low_greater,
         CAST(SUM(a.c * b.c) AS BIGINT) AS n_tie
  FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g
  GROUP BY a.g, b.g
),
sizes AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM d GROUP BY g)
"""

_ORACLE_JONCKHEERE = (
    _ORACLE_DOMINANCE
    + """
, tot AS (
  SELECT CAST(SUM(2 * p.n_low_less + p.n_tie) AS BIGINT) AS two_j,
         CAST(SUM(sa.n * sb.n) AS BIGINT) AS e_two_j
  FROM pairs p
  JOIN sizes sa ON sa.g = p.g_low
  JOIN sizes sb ON sb.g = p.g_high
),
gl AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(n * n * (2 * n + 3)) AS BIGINT) AS sum_nn
  FROM sizes
)
SELECT tot.two_j, tot.e_two_j,
       CAST(gl.n_tot * gl.n_tot * (2 * gl.n_tot + 3) - gl.sum_nn AS BIGINT)
         AS v18_num,
       round(CASE WHEN gl.n_tot * gl.n_tot * (2 * gl.n_tot + 3) - gl.sum_nn
                       <= 0 THEN 0.0
                  ELSE CAST(tot.two_j - tot.e_two_j AS DOUBLE)
                       / (2.0 * sqrt(CAST(gl.n_tot * gl.n_tot
                                          * (2 * gl.n_tot + 3) - gl.sum_nn
                                          AS DOUBLE) / 18.0)) END,
             6) AS z_stat
FROM tot, gl
"""
)


def _dominance_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(pairs, sizes): exact cross-group dominance counts over the
    distinct-bucket spine — O(k * |buckets|) work, never an O(n^2) join."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round("value").cast("bigint").alias("v"),
    )
    d = x.groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    spine = x.select("v").distinct()
    gs = x.select("g").distinct()
    # k x |buckets| grid: both sides are tiny dimension-like relations, so
    # the cartesian is a deliberate bounded grid build (plan-audit: benign).
    grid = (
        gs.crossJoin(F.broadcast(spine))
        .join(d, ["g", "v"], "left")
        .select("g", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "g", "v", "c", (F.sum("c").over(wcum) - F.col("c")).alias("cum_less")
    )
    a, b = cum.alias("a"), cum.alias("b")
    pairs = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("g_low"), F.col("b.g").alias("g_high"))
        .agg(
            F.sum(F.col("b.c") * F.col("a.cum_less"))
            .cast("bigint")
            .alias("n_low_less"),
            F.sum(F.col("a.c") * F.col("b.cum_less"))
            .cast("bigint")
            .alias("n_low_greater"),
            F.sum(F.col("a.c") * F.col("b.c")).cast("bigint").alias("n_tie"),
        )
    )
    sizes = d.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    return pairs, sizes


@register(
    "ml_jonckheere_trend",
    oracle=_ORACLE_JONCKHEERE,
    tags=("ml", "stats"),
    doc=(
        "Jonckheere-Terpstra ordered-alternative trend test with the "
        "alphabetical event_type order as the dose ordering: 2J = "
        "sum over ordered pairs of (2*#less + #ties) from exact "
        "dominance counts over the distinct-bucket spine (windowed "
        "cumulative counts, O(k*|buckets|) — never an O(n^2) pair join), "
        "E[2J] = sum n_i*n_j, and the z readout uses the no-tie null "
        "variance [N^2(2N+3) - sum n_i^2(2n_i+3)]/18 carried as its "
        "exact integer numerator."
    ),
)
def ml_jonckheere_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    pairs, sizes = _dominance_tables(spark, sf_dir)
    sa = sizes.select(F.col("g").alias("g_low"), F.col("n").alias("n_low"))
    sb = sizes.select(F.col("g").alias("g_high"), F.col("n").alias("n_high"))
    tot = (
        pairs.join(F.broadcast(sa), "g_low")
        .join(F.broadcast(sb), "g_high")
        .agg(
            F.sum(2 * F.col("n_low_less") + F.col("n_tie"))
            .cast("bigint")
            .alias("two_j"),
            F.sum(F.col("n_low") * F.col("n_high"))
            .cast("bigint")
            .alias("e_two_j"),
        )
    )
    gl = sizes.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum(F.col("n") * F.col("n") * (2 * F.col("n") + 3))
        .cast("bigint")
        .alias("sum_nn"),
    )
    v18 = (
        F.col("n_tot") * F.col("n_tot") * (2 * F.col("n_tot") + 3)
        - F.col("sum_nn")
    ).cast("bigint")
    z = F.when(v18 <= 0, F.lit(0.0)).otherwise(
        (F.col("two_j") - F.col("e_two_j")).cast("double")
        / (2.0 * F.sqrt(v18.cast("double") / 18.0))
    )
    return tot.join(F.broadcast(gl), F.lit(True), "left").select(
        "two_j",
        "e_two_j",
        v18.alias("v18_num"),
        F.round(z, 6).alias("z_stat"),
    )


_ORACLE_CLIFFS = (
    _ORACLE_DOMINANCE
    + """
SELECT p.g_low, p.g_high,
       p.n_low_greater AS n_gt, p.n_low_less AS n_lt, p.n_tie,
       sa.n AS n_low, sb.n AS n_high,
       round(CAST(p.n_low_greater - p.n_low_less AS DOUBLE)
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) AS delta
FROM pairs p
JOIN sizes sa ON sa.g = p.g_low
JOIN sizes sb ON sb.g = p.g_high
"""
)


@register(
    "ml_cliffs_delta",
    oracle=_ORACLE_CLIFFS,
    tags=("ml", "stats"),
    doc=(
        "Cliff's delta ordinal effect size for every event-type pair: "
        "delta = (#(x_low > x_high) - #(x_low < x_high)) / (n_low * "
        "n_high), with all three dominance counts exact BIGINTs from the "
        "shared distinct-bucket spine (windowed cumulative counts) and "
        "the ratio the single final float.  The effect-size companion "
        "the Mann-Whitney/Kruskal family report alongside their p-ish "
        "statistics."
    ),
)
def ml_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    pairs, sizes = _dominance_tables(spark, sf_dir)
    sa = sizes.select(F.col("g").alias("g_low"), F.col("n").alias("n_low"))
    sb = sizes.select(F.col("g").alias("g_high"), F.col("n").alias("n_high"))
    out = pairs.join(F.broadcast(sa), "g_low").join(F.broadcast(sb), "g_high")
    delta = (F.col("n_low_greater") - F.col("n_low_less")).cast("double") / (
        F.col("n_low").cast("double") * F.col("n_high").cast("double")
    )
    return out.select(
        "g_low",
        "g_high",
        F.col("n_low_greater").alias("n_gt"),
        F.col("n_low_less").alias("n_lt"),
        "n_tie",
        "n_low",
        "n_high",
        F.round(delta, 6).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal)
# ---------------------------------------------------------------------------

_ORACLE_KRIPPENDORFF = """
WITH r AS (
  SELECT user_id AS u, event_type AS c, CAST(COUNT(*) AS BIGINT) AS n_uc
  FROM events GROUP BY user_id, event_type
),
mu AS (
  SELECT u, CAST(SUM(n_uc) AS BIGINT) AS m,
         CAST(SUM(n_uc * n_uc) AS BIGINT) AS sq
  FROM r GROUP BY u
),
pairable AS (SELECT u, m, m * m - sq AS num FROM mu WHERE m >= 2),
do_ AS (
  SELECT CAST(SUM(CAST(round(CAST(num AS DOUBLE) * 1000000000.0 / (m - 1))
                       AS BIGINT)) AS BIGINT) AS d_o_e9,
         CAST(SUM(m) AS BIGINT) AS n_val,
         CAST(COUNT(*) AS BIGINT) AS n_units
  FROM pairable
),
cat AS (
  SELECT r.c, CAST(SUM(r.n_uc) AS BIGINT) AS n_c
  FROM r JOIN pairable p ON p.u = r.u
  GROUP BY r.c
),
catsq AS (SELECT CAST(SUM(n_c * n_c) AS BIGINT) AS sum_cat_sq FROM cat)
SELECT d.n_units, d.n_val, d.d_o_e9, cs.sum_cat_sq,
       round(CASE WHEN d.n_val IS NULL OR d.n_val < 2
                       OR d.n_val * d.n_val - cs.sum_cat_sq = 0 THEN 0.0
                  ELSE 1.0 - (CAST(d.d_o_e9 AS DOUBLE) / 1000000000.0
                              / d.n_val)
                             / (CAST(d.n_val * d.n_val - cs.sum_cat_sq
                                     AS DOUBLE)
                                / (CAST(d.n_val AS DOUBLE)
                                   * CAST(d.n_val - 1 AS DOUBLE))) END,
             6) AS alpha
FROM do_ d, catsq cs
"""


@register(
    "ml_krippendorff_alpha",
    oracle=_ORACLE_KRIPPENDORFF,
    tags=("ml", "stats"),
    doc=(
        "Krippendorff's alpha (nominal metric) over the user x "
        "event-type rating matrix: each pairable unit's observed "
        "disagreement (m_u^2 - sum n_uc^2)/(m_u - 1) is rounded to an "
        "e9 fixed-point INTEGER before the cross-unit sum (order-"
        "independent), expected disagreement comes from exact pooled "
        "category totals, and alpha = 1 - D_o/D_e is the single final "
        "float.  The any-number-of-raters reliability coefficient that "
        "generalizes the repo's Cohen/Fleiss kappas.  Two grouped "
        "aggregates + two 1-row attaches; map-side combinable."
    ),
)
def ml_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy(
        F.col("user_id").alias("u"), F.col("event_type").alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_uc"))
    mu = r.groupBy("u").agg(
        F.sum("n_uc").cast("bigint").alias("m"),
        F.sum(F.col("n_uc") * F.col("n_uc")).cast("bigint").alias("sq"),
    )
    pairable = mu.where(F.col("m") >= 2).select(
        "u", "m", (F.col("m") * F.col("m") - F.col("sq")).alias("num")
    )
    d_u_e9 = F.round(
        F.col("num").cast("double") * 1000000000.0 / (F.col("m") - 1)
    ).cast("bigint")
    do_ = pairable.agg(
        F.sum(d_u_e9).cast("bigint").alias("d_o_e9"),
        F.sum("m").cast("bigint").alias("n_val"),
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
    )
    cat = (
        r.join(pairable.select("u"), "u")
        .groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("n_c"))
    )
    catsq = cat.agg(
        F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sum_cat_sq")
    )
    d_e = (F.col("n_val") * F.col("n_val") - F.col("sum_cat_sq")).cast(
        "double"
    ) / (F.col("n_val").cast("double") * (F.col("n_val") - 1).cast("double"))
    alpha = F.when(
        F.col("n_val").isNull()
        | (F.col("n_val") < 2)
        | (F.col("n_val") * F.col("n_val") - F.col("sum_cat_sq") == 0),
        F.lit(0.0),
    ).otherwise(
        1.0
        - (F.col("d_o_e9").cast("double") / 1000000000.0 / F.col("n_val")) / d_e
    )
    return do_.join(F.broadcast(catsq), F.lit(True), "left").select(
        "n_units", "n_val", "d_o_e9", "sum_cat_sq", F.round(alpha, 6).alias("alpha")
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test per event type
# ---------------------------------------------------------------------------

_ORACLE_MANN_KENDALL = """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
s AS (
  SELECT a.g,
         CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day
  GROUP BY a.g
),
nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY g),
ties AS (
  SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT g, cnt, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY g, cnt)
  GROUP BY g
)
SELECT nd.g AS event_type, nd.n_days, s.s_stat,
       CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
            - ties.tie_term AS BIGINT) AS v18_num,
       round(CASE WHEN nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                       - ties.tie_term <= 0 THEN 0.0
                  ELSE CAST(s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                            WHEN s.s_stat < 0 THEN -1
                                            ELSE 0 END AS DOUBLE)
                       / sqrt(CAST(nd.n_days * (nd.n_days - 1)
                                   * (2 * nd.n_days + 5) - ties.tie_term
                                   AS DOUBLE) / 18.0) END,
             6) AS z_stat
FROM nd JOIN s ON s.g = nd.g JOIN ties ON ties.g = nd.g
"""


@register(
    "events_mann_kendall_trend",
    oracle=_ORACLE_MANN_KENDALL,
    tags=("events", "stats", "timeseries"),
    doc=(
        "Mann-Kendall monotone-trend test over each type's daily count "
        "series: S = sum of pairwise sign(x_j - x_i) over day pairs "
        "(exact integer; the day self-join is bounded by the CALENDAR, "
        "~30-90 rows per type, regardless of event volume), with the "
        "tie-corrected null variance [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18 "
        "carried as its exact integer numerator and the continuity-"
        "corrected z the single final float.  The distribution-free "
        "sibling of the repo's Theil-Sen slope."
    ),
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            F.sum(
                F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
                .when(F.col("b.cnt") < F.col("a.cnt"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat"),
        )
    )
    nd = daily.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("g", "cnt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    out = nd.join(s, "g").join(ties, "g")
    v18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    cc = (
        F.col("s_stat")
        - F.when(F.col("s_stat") > 0, 1).when(F.col("s_stat") < 0, -1).otherwise(0)
    ).cast("double")
    z = F.when(v18 <= 0, F.lit(0.0)).otherwise(
        cc / F.sqrt(v18.cast("double") / 18.0)
    )
    return out.select(
        F.col("g").alias("event_type"),
        "n_days",
        "s_stat",
        v18.alias("v18_num"),
        F.round(z, 6).alias("z_stat"),
    )
