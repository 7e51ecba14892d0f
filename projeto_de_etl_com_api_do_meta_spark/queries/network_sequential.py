"""Network-structure metrics and sequential analysis (round 9e).

* ``graph_assortativity_degree`` — Newman's degree assortativity r over
  the co-purchase graph: Pearson correlation of endpoint degrees across
  edges, from exact BIGINT edge-sums with ONE final float expression.
  Positive r = hubs link hubs (social nets), negative = hub-spoke
  (technological nets) — the one-number summary of degree mixing.
* ``graph_rich_club_coefficient`` — phi(k) = density of the subgraph
  induced by nodes of degree > k, for k in {2, 4, 8, 16}: whether the
  high-degree core is disproportionately interconnected.  Exact integer
  counts; the k-spine is a 4-row broadcast.
* ``events_sprt_sequential_test`` — Wald's Sequential Probability Ratio
  Test on the daily purchase share (H0: p=0.18 vs H1: p=0.22, alpha =
  beta = 0.05): the log-likelihood-ratio increments are CONSTANTS of the
  hypotheses, precomputed in Python to e9 fixed-point and embedded as
  literals in BOTH engines — no transcendental ever crosses the engine
  boundary — so the cumulative LLR is an exact BIGINT walk over the
  calendar-bounded daily series, reporting the first boundary crossing
  and the decision.  The sequential companion of the fixed-horizon
  events_ab_test_ztest (SPRT needs ~half the samples on average).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Degree assortativity
# ---------------------------------------------------------------------------

_ORACLE_ASSORT = """
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e0 AS (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),
sym AS (SELECT u AS s, v AS d FROM e0 UNION SELECT v, u FROM e0),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY s),
ek AS (
  SELECT ds.k AS j, dd.k AS k
  FROM sym e JOIN deg ds ON ds.s = e.s JOIN deg dd ON dd.s = e.d
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(j) AS BIGINT) AS sj,
         CAST(SUM(j * k) AS BIGINT) AS sjk,
         CAST(SUM(j * j) AS BIGINT) AS sj2
  FROM ek
)
SELECT m AS m_directed, sj AS sum_deg, sjk AS sum_deg_products,
       sj2 AS sum_deg_squares,
       round(CAST(m * sjk - sj * sj AS DOUBLE)
             / CAST(m * sj2 - sj * sj AS DOUBLE), 6) AS assortativity_r
FROM sums
"""


@register(
    "graph_assortativity_degree",
    oracle=_ORACLE_ASSORT,
    tags=("graph",),
    doc=(
        "Newman degree assortativity over the co-purchase part graph "
        "(same support>=2 spine as LPA/closeness): Pearson correlation "
        "of endpoint degrees across the SYMMETRIC edge list — by "
        "symmetry sum(j)=sum(k) and sum(j^2)=sum(k^2), so r = "
        "(M*Sjk - Sj^2) / (M*Sj2 - Sj^2) from four exact BIGINT edge "
        "aggregates and ONE final float division.  The plan is two "
        "degree-table joins onto the edge list (degree table broadcasts "
        "at any realistic vocab) + one combinable aggregate; at 100 TB "
        "degree products may need the documented DECIMAL(38,0) swap."
    ),
)
def graph_assortativity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= 2)
        .select("u", "v")
    )
    sym = (
        e0.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e0.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .distinct()
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ek = (
        sym.join(deg.select(F.col("s"), F.col("k").alias("j")), "s")
        .join(
            deg.select(F.col("s").alias("d"), F.col("k")),
            "d",
        )
        .select("j", "k")
    )
    sums = ek.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("j").cast("bigint").alias("sj"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("sjk"),
        F.sum(F.col("j") * F.col("j")).cast("bigint").alias("sj2"),
    )
    num = F.col("m") * F.col("sjk") - F.col("sj") * F.col("sj")
    den = F.col("m") * F.col("sj2") - F.col("sj") * F.col("sj")
    return sums.select(
        F.col("m").alias("m_directed"),
        F.col("sj").alias("sum_deg"),
        F.col("sjk").alias("sum_deg_products"),
        F.col("sj2").alias("sum_deg_squares"),
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "assortativity_r"
        ),
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient
# ---------------------------------------------------------------------------

_ORACLE_RICH_CLUB = """
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e0 AS (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),
sym AS (SELECT u AS s, v AS d FROM e0 UNION SELECT v, u FROM e0),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY s),
ks(kmin) AS (VALUES (2), (4), (8), (16)),
club AS (
  SELECT ks.kmin, d.s FROM deg d JOIN ks ON d.k > ks.kmin
),
nk AS (
  SELECT kmin, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM club GROUP BY kmin
),
ekc AS (
  SELECT c1.kmin, CAST(COUNT(*) AS BIGINT) AS m_sym
  FROM sym e
  JOIN club c1 ON c1.s = e.s
  JOIN club c2 ON c2.s = e.d AND c2.kmin = c1.kmin
  GROUP BY c1.kmin
)
SELECT CAST(n.kmin AS BIGINT) AS kmin, n.n_nodes,
       COALESCE(e.m_sym, 0) AS m_sym,
       CASE WHEN n.n_nodes >= 2
            THEN round(CAST(COALESCE(e.m_sym, 0) AS DOUBLE)
                       / CAST(n.n_nodes * (n.n_nodes - 1) AS DOUBLE), 6)
            END AS phi
FROM nk n LEFT JOIN ekc e ON e.kmin = n.kmin
ORDER BY kmin
"""


@register(
    "graph_rich_club_coefficient",
    oracle=_ORACLE_RICH_CLUB,
    tags=("graph",),
    doc=(
        "Rich-club coefficient phi(k) for k in {2,4,8,16} over the "
        "co-purchase graph: the edge density of the subgraph induced by "
        "nodes of degree > k — whether high-degree parts preferentially "
        "co-occur with each other.  Club membership is a 4-row k-spine "
        "join onto the degree table; induced edges are two membership "
        "semi-joins onto the symmetric edge list; phi is exact counts "
        "with one final float division, NULL where the club has < 2 "
        "members.  The density counterpart of the assortativity "
        "correlation (same spine, different mixing lens)."
    ),
)
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= 2)
        .select("u", "v")
    )
    sym = (
        e0.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e0.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    ks = spark.createDataFrame([(2,), (4,), (8,), (16,)], "kmin int")
    club = deg.crossJoin(F.broadcast(ks)).where(F.col("k") > F.col("kmin")).select(
        "kmin", "s"
    )
    nk = club.groupBy("kmin").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    ekc = (
        sym.join(club, "s")
        .join(
            club.select(F.col("kmin"), F.col("s").alias("d")),
            ["kmin", "d"],
        )
        .groupBy("kmin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m_sym"))
    )
    out = (
        nk.join(ekc, "kmin", "left")
        .select(
            F.col("kmin").cast("bigint").alias("kmin"),
            "n_nodes",
            F.coalesce("m_sym", F.lit(0)).cast("bigint").alias("m_sym"),
            F.when(
                F.col("n_nodes") >= 2,
                F.round(
                    F.coalesce("m_sym", F.lit(0)).cast("double")
                    / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double"),
                    6,
                ),
            ).alias("phi"),
        )
        .orderBy("kmin")
    )
    return out


# ---------------------------------------------------------------------------
# SPRT sequential test (Wald) on the daily purchase share
# ---------------------------------------------------------------------------

_P0, _P1 = 0.18, 0.22
_ALPHA = _BETA = 0.05
# LLR increments and boundaries as e9 fixed-point LITERALS — computed once
# here in Python so no transcendental is ever evaluated inside either engine.
_LLR_POS = round(math.log(_P1 / _P0) * 1_000_000_000)          # purchase
_LLR_NEG = round(math.log((1 - _P1) / (1 - _P0)) * 1_000_000_000)
_UPPER = round(math.log((1 - _BETA) / _ALPHA) * 1_000_000_000)  # accept H1
_LOWER = round(math.log(_BETA / (1 - _ALPHA)) * 1_000_000_000)  # accept H0

_ORACLE_SPRT = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
walk AS (
  SELECT d, n_pos, n,
         SUM(n_pos * CAST({_LLR_POS} AS BIGINT)
             + (n - n_pos) * CAST({_LLR_NEG} AS BIGINT))
           OVER (ORDER BY d) AS llr_e9,
         SUM(n) OVER (ORDER BY d) AS n_seen
  FROM daily
),
crossed AS (
  SELECT *, CASE WHEN llr_e9 >= {_UPPER} THEN 'accept_h1'
                 WHEN llr_e9 <= {_LOWER} THEN 'accept_h0' END AS verdict
  FROM walk
),
first_cross AS (
  SELECT * FROM crossed WHERE verdict IS NOT NULL
  QUALIFY row_number() OVER (ORDER BY d) = 1
),
last_day AS (
  SELECT * FROM crossed QUALIFY row_number() OVER (ORDER BY d DESC) = 1
)
SELECT COALESCE(f.verdict, 'continue') AS verdict,
       COALESCE(f.d, l.d) AS decision_day,
       CAST(COALESCE(f.n_seen, l.n_seen) AS BIGINT) AS n_samples,
       CAST(COALESCE(f.llr_e9, l.llr_e9) AS BIGINT) AS llr_e9,
       CAST({_UPPER} AS BIGINT) AS upper_e9,
       CAST({_LOWER} AS BIGINT) AS lower_e9
FROM last_day l LEFT JOIN first_cross f ON TRUE
"""


@register(
    "events_sprt_sequential_test",
    oracle=_ORACLE_SPRT,
    tags=("events", "stats", "sequential"),
    doc=(
        "Wald's Sequential Probability Ratio Test on the daily purchase "
        "share (H0 p=0.18 vs H1 p=0.22, alpha=beta=0.05): the per-sample "
        "LLR increments are CONSTANTS of the hypotheses, precomputed to "
        "e9 fixed-point in Python and embedded as literals in BOTH "
        "engines — the cumulative LLR is an exact BIGINT prefix sum over "
        "the calendar-bounded daily table, and the report is the first "
        "boundary crossing (day, sample count, verdict) or 'continue'.  "
        "The sequential companion of the fixed-horizon "
        "events_ab_test_ztest: same decision guarantees at ~half the "
        "expected sample size, and the daily granularity is exactly how "
        "a production experiment framework checks it (peeking-safe by "
        "construction)."
    ),
)
def events_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("d")
    walk = daily.select(
        "d",
        F.sum(
            F.col("n_pos") * F.lit(_LLR_POS).cast("bigint")
            + (F.col("n") - F.col("n_pos")) * F.lit(_LLR_NEG).cast("bigint")
        )
        .over(w)
        .alias("llr_e9"),
        F.sum("n").over(w).alias("n_seen"),
    )
    crossed = walk.withColumn(
        "verdict",
        F.when(F.col("llr_e9") >= _UPPER, "accept_h1").when(
            F.col("llr_e9") <= _LOWER, "accept_h0"
        ),
    )
    w_first = Window.orderBy("d")
    first_cross = (
        crossed.where(F.col("verdict").isNotNull())
        .withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select(
            F.col("verdict").alias("f_verdict"),
            F.col("d").alias("f_d"),
            F.col("n_seen").alias("f_n"),
            F.col("llr_e9").alias("f_llr"),
        )
    )
    w_last = Window.orderBy(F.col("d").desc())
    last_day = (
        crossed.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("d", "n_seen", "llr_e9")
    )
    # 1-row LEFT scalar attach: when NO boundary was crossed first_cross is
    # EMPTY and a plain crossJoin would wrongly drop the 'continue' row
    # (bug caught by test_sprt_walk_recompute at sf0.001, where the series
    # never crosses) — LEFT JOIN ON TRUE mirrors the oracle exactly.
    return last_day.join(F.broadcast(first_cross), F.lit(True), "left").select(
        F.coalesce("f_verdict", F.lit("continue")).alias("verdict"),
        F.coalesce("f_d", "d").alias("decision_day"),
        F.coalesce("f_n", "n_seen").alias("n_samples"),
        F.coalesce("f_llr", "llr_e9").alias("llr_e9"),
        F.lit(_UPPER).cast("bigint").alias("upper_e9"),
        F.lit(_LOWER).cast("bigint").alias("lower_e9"),
    )


# ---------------------------------------------------------------------------
# Discrete power-law MLE over user activity counts
# ---------------------------------------------------------------------------

_PL_XMIN = 5  # continuous-MLE approximation support threshold

_ORACLE_POWER_LAW = f"""
WITH act AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
tail AS (
  SELECT x, CAST(round(ln(CAST(x AS DOUBLE) / ({_PL_XMIN} - 0.5))
                  * 1000000000) AS BIGINT) AS lnterm_e9
  FROM act WHERE x >= {_PL_XMIN}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
         CAST(SUM(lnterm_e9) AS BIGINT) AS ln_sum_e9,
         CAST(MAX(x) AS BIGINT) AS x_max
  FROM tail
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM act)
SELECT t.n_users, s.n_tail, CAST({_PL_XMIN} AS BIGINT) AS x_min, s.x_max,
       s.ln_sum_e9,
       round(1.0 + CAST(s.n_tail AS DOUBLE) * 1000000000.0
                   / CAST(s.ln_sum_e9 AS DOUBLE), 6) AS alpha_hat
FROM s, tot t
"""


@register(
    "events_power_law_mle",
    oracle=_ORACLE_POWER_LAW,
    tags=("events", "stats"),
    doc=(
        "Discrete power-law exponent MLE over per-user activity counts "
        "(Clauset-Shalizi-Newman 2009 continuous approximation with the "
        "x_min - 1/2 shift): alpha = 1 + n / sum ln(x / (xmin - 0.5)).  "
        "Each ln term is rounded to e9 fixed-point PER USER before the "
        "sum (the unigram-surprisal determinism pattern — float addition "
        "order can never flake the hash), so the only cross-engine float "
        "is one identical final expression.  ACCEPTED ULP RISK: ln() is "
        "evaluated independently in both engines (JVM Math.log is 1-ulp, "
        "not correctly rounded), so a term within half an ulp of a "
        "0.5e-9 rounding boundary could in principle flip the e9 "
        "integer on a divergent libm; tests/test_advice_r10.py sweeps "
        "the full realistic count domain cross-engine so any divergence "
        "on this platform fails loudly instead of flaking the differ.  "
        "The heavy-tail diagnostic "
        "behind every skew decision the engine makes: if activity is "
        "power-law with small alpha, hot-key salting and AQE skew splits "
        "are mandatory, not optional.  One hash aggregate + one "
        "combinable tail aggregate — nothing data-scale after the "
        "per-user count."
    ),
)
def events_power_law_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    tail = act.where(F.col("x") >= _PL_XMIN).select(
        "x",
        F.round(
            F.log(F.col("x").cast("double") / (_PL_XMIN - 0.5)) * 1_000_000_000
        )
        .cast("bigint")
        .alias("lnterm_e9"),
    )
    s = tail.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum("lnterm_e9").cast("bigint").alias("ln_sum_e9"),
        F.max("x").cast("bigint").alias("x_max"),
    )
    tot = act.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return s.crossJoin(F.broadcast(tot)).select(
        "n_users",
        "n_tail",
        F.lit(_PL_XMIN).cast("bigint").alias("x_min"),
        "x_max",
        "ln_sum_e9",
        F.round(
            1.0
            + F.col("n_tail").cast("double")
            * 1_000_000_000.0
            / F.col("ln_sum_e9").cast("double"),
            6,
        ).alias("alpha_hat"),
    )


# ---------------------------------------------------------------------------
# Collocation extraction by t-score
# ---------------------------------------------------------------------------

_ORACLE_TSCORE = """
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
toks AS (
  SELECT doc_id, pos, w FROM toks0 WHERE regexp_matches(w, '^[a-z]+$')
),
big AS (
  SELECT t1.w AS w1, t2.w AS w2, CAST(COUNT(*) AS BIGINT) AS f12
  FROM toks t1 JOIN toks t2
    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  GROUP BY t1.w, t2.w
),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY w),
tot AS (SELECT CAST(SUM(f12) AS BIGINT) AS nb FROM big),
scored AS (
  SELECT b.w1, b.w2, b.f12, u1.f AS f1, u2.f AS f2, t.nb,
         round((CAST(b.f12 AS DOUBLE)
                - CAST(u1.f AS DOUBLE) * CAST(u2.f AS DOUBLE)
                  / CAST(t.nb AS DOUBLE))
               / sqrt(CAST(b.f12 AS DOUBLE)), 6) AS t_score
  FROM big b JOIN uni u1 ON u1.w = b.w1 JOIN uni u2 ON u2.w = b.w2
  CROSS JOIN tot t
  WHERE b.f12 >= 3
)
SELECT CAST(row_number() OVER (ORDER BY t_score DESC, w1, w2) AS BIGINT)
         AS rk,
       w1, w2, f12, f1, f2, t_score
FROM scored
QUALIFY row_number() OVER (ORDER BY t_score DESC, w1, w2) <= 15
ORDER BY rk
"""


@register(
    "corpus_collocation_tscore",
    oracle=_ORACLE_TSCORE,
    tags=("corpus", "text"),
    doc=(
        "Collocation extraction by t-score (Church & Hanks' hypothesis-"
        "test framing): t = (f12 - f1*f2/N) / sqrt(f12) per adjacent "
        "bigram with f12 >= 3, top-15 by (t DESC, words).  The t-score "
        "favors HIGH-FREQUENCY associations where PMI (corpus_pmi_"
        "bigrams) favors rare-but-exclusive ones and keyness (corpus_"
        "keyness_loglikelihood) contrasts corpora — the third classic "
        "association lens, one identical float expression over exact "
        "BIGINT counts.  Bigram/unigram aggregates are the corpus-scale "
        "passes (combinable); scoring and ranking run on the "
        "vocab^2-bounded bigram table."
    ),
)
def corpus_collocation_tscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "w")
    )
    t2 = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    big = (
        toks.join(t2, ["doc_id", "pos"])
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f12"))
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    tot = big.agg(F.sum("f12").cast("bigint").alias("nb"))
    scored = (
        big.where(F.col("f12") >= 3)
        .join(uni.select(F.col("w").alias("w1"), F.col("f").alias("f1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("f").alias("f2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "f12",
            "f1",
            "f2",
            F.round(
                (
                    F.col("f12").cast("double")
                    - F.col("f1").cast("double")
                    * F.col("f2").cast("double")
                    / F.col("nb").cast("double")
                )
                / F.sqrt(F.col("f12").cast("double")),
                6,
            ).alias("t_score"),
        )
    )
    w_rk = Window.orderBy(F.col("t_score").desc(), "w1", "w2")
    return (
        scored.select(
            F.row_number().over(w_rk).cast("bigint").alias("rk"),
            "w1",
            "w2",
            "f12",
            "f1",
            "f2",
            "t_score",
        )
        .where(F.col("rk") <= 15)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Friedman test (nonparametric repeated-measures ANOVA)
# ---------------------------------------------------------------------------

_ORACLE_FRIEDMAN = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
         CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
full_blocks AS (
  SELECT d FROM cells GROUP BY d
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM cells)
),
ranked AS (
  SELECT c.d, c.event_type,
         CAST(row_number() OVER (PARTITION BY c.d ORDER BY c.v, c.event_type)
              AS BIGINT) AS rk
  FROM cells c JOIN full_blocks f ON c.d = f.d
),
sums AS (
  SELECT event_type, CAST(SUM(rk) AS BIGINT) AS r_sum
  FROM ranked GROUP BY event_type
),
meta AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(r_sum) AS BIGINT) AS total,
         CAST(SUM(r_sum * r_sum) AS BIGINT) AS r2_sum
  FROM sums
),
nblocks AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM full_blocks)
SELECT n.n AS n_blocks, m.k AS k_treatments, m.r2_sum,
       round(12.0 * CAST(m.r2_sum AS DOUBLE)
             / (CAST(n.n AS DOUBLE) * CAST(m.k AS DOUBLE)
                * CAST(m.k + 1 AS DOUBLE))
             - 3.0 * CAST(n.n AS DOUBLE) * CAST(m.k + 1 AS DOUBLE),
             6) AS friedman_q
FROM meta m, nblocks n
"""


@register(
    "ml_friedman_test",
    oracle=_ORACLE_FRIEDMAN,
    tags=("ml", "stats"),
    doc=(
        "Friedman test (nonparametric repeated-measures ANOVA): days are "
        "blocks, event types are treatments, daily cent-revenue is the "
        "response; within-block ranks (PARTITIONED per-day windows — "
        "cent sums make ties measure-zero, and the (value, type) "
        "tie-break pins determinism anyway), Q = 12*sum(R_j^2)/(n*k*(k+1)) "
        "- 3n(k+1) from exact BIGINT rank sums with ONE final float "
        "expression.  Completes the nonparametric family: Mann-Whitney "
        "(2 independent), Wilcoxon (2 paired), Kruskal-Wallis-shaped "
        "Friedman (k matched groups) — blocks missing any treatment are "
        "excluded exactly as scipy does."
    ),
)
def ml_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("d"), "event_type"
        )
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("v")
        )
    )
    k_row = cells.agg(F.countDistinct("event_type").alias("k_all"))
    full_blocks = (
        cells.groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(k_row))
        .where(F.col("c") == F.col("k_all"))
        .select("d")
    )
    w = Window.partitionBy("d").orderBy("v", "event_type")
    ranked = cells.join(full_blocks, "d").select(
        "d", "event_type", F.row_number().over(w).cast("bigint").alias("rk")
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("rk").cast("bigint").alias("r_sum")
    )
    meta = sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("r_sum").cast("bigint").alias("total"),
        F.sum(F.col("r_sum") * F.col("r_sum")).cast("bigint").alias("r2_sum"),
    )
    nblocks = full_blocks.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return meta.crossJoin(F.broadcast(nblocks)).select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        "r2_sum",
        F.round(
            12.0
            * F.col("r2_sum").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("k").cast("double")
                * (F.col("k") + 1).cast("double")
            )
            - 3.0 * F.col("n").cast("double") * (F.col("k") + 1).cast("double"),
            6,
        ).alias("friedman_q"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (k independent groups)
# ---------------------------------------------------------------------------

_ORACLE_KRUSKAL = """
WITH scored AS (
  SELECT event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
per_v AS (
  SELECT v, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM scored GROUP BY v, event_type
),
vtot AS (
  SELECT v, CAST(SUM(cnt) AS BIGINT) AS vc FROM per_v GROUP BY v
),
ranked AS (
  SELECT v, vc,
         COALESCE(SUM(vc) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM vtot
),
-- average rank of value v in HALF units: 2*before + vc + 1
grp AS (
  SELECT p.event_type,
         CAST(SUM(p.cnt) AS BIGINT) AS n_g,
         CAST(SUM(p.cnt * (2 * r.before + r.vc + 1)) AS BIGINT) AS r_half
  FROM per_v p JOIN ranked r ON r.v = p.v
  GROUP BY p.event_type
),
tie AS (
  SELECT CAST(SUM(vc * vc * vc - vc) AS BIGINT) AS tie_sum,
         CAST(SUM(vc) AS BIGINT) AS n
  FROM vtot
),
h AS (
  SELECT t.n, t.tie_sum,
         CAST(COUNT(*) AS BIGINT) AS k,
         -- H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1), ranks in half units
         -- => R_g = r_half/2: H = 3/(N(N+1)) * sum(r_half^2/n_g) - 3(N+1)
         SUM(CAST(g.r_half AS DOUBLE) * CAST(g.r_half AS DOUBLE)
             / CAST(g.n_g AS DOUBLE)) AS s2
  FROM grp g, tie t
  GROUP BY t.n, t.tie_sum
)
SELECT n, k AS k_groups, tie_sum,
       round((3.0 * s2 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
              - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(tie_sum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
             6) AS h_statistic
FROM h
"""


@register(
    "ml_kruskal_wallis",
    oracle=_ORACLE_KRUSKAL,
    tags=("ml", "stats"),
    doc=(
        "Kruskal-Wallis H test across the five event-type value "
        "distributions — the k-group generalization that completes the "
        "nonparametric family (Mann-Whitney: 2 independent, Wilcoxon: 2 "
        "paired, Friedman: k blocked, Kruskal-Wallis: k independent).  "
        "Average ranks over ties kept in integer HALF units exactly as "
        "ml_mann_whitney_u (per-value counts -> one cumulative window "
        "over the DISTINCT-CENT-VALUE table), per-group rank sums and "
        "the tie-correction sum(t^3 - t) stay exact BIGINTs, and H with "
        "its tie correction is one final float expression with "
        "identical operand order on both engines.  SUM of DOUBLE "
        "divisions across k=5 groups is order-hazard-free because the "
        "grouped aggregation is over five rows with distinct keys — "
        "both engines reduce in ascending-key order after the sort-free "
        "hash, and the per-group terms are exact-integer ratios rounded "
        "only at the end."
    ),
)
def ml_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    scored = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v"),
    )
    per_v = scored.groupBy("v", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    vtot = per_v.groupBy("v").agg(F.sum("cnt").cast("bigint").alias("vc"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vtot.select(
        "v", "vc", F.coalesce(F.sum("vc").over(w), F.lit(0)).alias("before")
    )
    grp = (
        per_v.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt") * (2 * F.col("before") + F.col("vc") + 1))
            .cast("bigint")
            .alias("r_half"),
        )
    )
    tie = vtot.agg(
        F.sum(F.col("vc") * F.col("vc") * F.col("vc") - F.col("vc"))
        .cast("bigint")
        .alias("tie_sum"),
        F.sum("vc").cast("bigint").alias("n"),
    )
    h = (
        grp.crossJoin(F.broadcast(tie))
        .groupBy("n", "tie_sum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum(
                F.col("r_half").cast("double")
                * F.col("r_half").cast("double")
                / F.col("n_g").cast("double")
            ).alias("s2"),
        )
    )
    n_d = F.col("n").cast("double")
    return h.select(
        "n",
        F.col("k").alias("k_groups"),
        "tie_sum",
        F.round(
            (3.0 * F.col("s2") / (n_d * (n_d + 1)) - 3.0 * (n_d + 1))
            / (
                1.0
                - F.col("tie_sum").cast("double") / (n_d * n_d * n_d - n_d)
            ),
            6,
        ).alias("h_statistic"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time profile (Poisson-assumption diagnostic)
# ---------------------------------------------------------------------------

_ORACLE_INTERARRIVAL = """
WITH ordered AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
gaps AS (
  SELECT user_id,
         CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_s
  FROM ordered WHERE prev_ts IS NOT NULL
),
bucketed AS (
  SELECT CASE WHEN gap_s < 60 THEN '0_under_1m'
              WHEN gap_s < 3600 THEN '1_1m_to_1h'
              WHEN gap_s < 86400 THEN '2_1h_to_1d'
              ELSE '3_over_1d' END AS bucket,
         gap_s
  FROM gaps
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
       CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@register(
    "events_interarrival_profile",
    oracle=_ORACLE_INTERARRIVAL,
    tags=("events", "timeseries"),
    doc=(
        "Per-user inter-arrival time profile — the Poisson-assumption "
        "diagnostic behind every rate model (SPRT's Bernoulli days, the "
        "rate-ratio test, capacity planning): successive event gaps per "
        "user via ONE partitioned lag window (ties broken by event_id), "
        "bucketed into sub-minute / sub-hour / sub-day / over-day bands "
        "with exact BIGINT second sums, extrema, and square sums — "
        "enough exact moments to compute the coefficient of variation "
        "downstream (CV >> 1 = bursty, the Kleinberg-burst regime; "
        "CV ~ 1 = memoryless).  Gap squares stay under 2^63 up to "
        "~50-year spans; everything aggregates map-side after the "
        "per-user shuffle."
    ),
)
def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    gaps = ordered.where(F.col("prev_ts").isNotNull()).select(
        (
            F.col("ts").cast("double").cast("long")
            - F.col("prev_ts").cast("double").cast("long")
        ).alias("gap_s")
    )
    bucket = (
        F.when(F.col("gap_s") < 60, "0_under_1m")
        .when(F.col("gap_s") < 3600, "1_1m_to_1h")
        .when(F.col("gap_s") < 86400, "2_1h_to_1d")
        .otherwise("3_over_1d")
    )
    return (
        gaps.select(bucket.alias("bucket"), "gap_s")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap_s").cast("bigint").alias("sum_gap_s"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias(
                "sum_gap_sq"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F + pairwise effect sizes
# ---------------------------------------------------------------------------

_ORACLE_ANOVA = """
WITH scored AS (
  SELECT event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(v) AS BIGINT) AS s_g,
         CAST(SUM(v * v) AS BIGINT) AS s2_g
  FROM scored GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(s2_g) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
),
parts AS (
  -- SSB*n = sum over groups of (s_g*n - S*n_g)^2 / (n_g * n): keep the
  -- per-group term as ONE float ratio of exact integers, then sum over
  -- the k=5 distinct group keys
  SELECT t.n, t.k,
         SUM(CAST((g.s_g * t.n - t.s * g.n_g) AS DOUBLE)
             * CAST((g.s_g * t.n - t.s * g.n_g) AS DOUBLE)
             / (CAST(g.n_g AS DOUBLE) * CAST(t.n AS DOUBLE)
                * CAST(t.n AS DOUBLE))) AS ssb,
         SUM(CAST(g.s2_g AS DOUBLE)
             - CAST(g.s_g AS DOUBLE) * CAST(g.s_g AS DOUBLE)
               / CAST(g.n_g AS DOUBLE)) AS ssw
  FROM grp g, tot t
  GROUP BY t.n, t.k
)
SELECT p.n, p.k AS k_groups,
       t.s AS grand_sum_e2, t.s2 AS grand_sumsq_e4,
       round((p.ssb / (CAST(p.k AS DOUBLE) - 1.0))
             / (p.ssw / (CAST(p.n AS DOUBLE) - CAST(p.k AS DOUBLE))), 6)
         AS f_statistic
FROM parts p, tot t
"""


@register(
    "ml_anova_oneway_exact",
    oracle=_ORACLE_ANOVA,
    tags=("ml", "stats"),
    doc=(
        "One-way ANOVA F across the five event-type value distributions "
        "— the parametric companion of ml_kruskal_wallis on the same "
        "contrast: per-group (n, sum, sum-of-squares) cents stay exact "
        "BIGINTs in ONE combinable aggregate, between/within sums of "
        "squares are per-group float ratios of exact integers summed "
        "over the k=5 group keys, and F = (SSB/(k-1)) / (SSW/(n-k)).  "
        "Exactly the two-pass-free Welford-equivalent any SQL engine "
        "uses; at 100 TB the only data-scale pass is the first grouped "
        "aggregate (map-side combinable).  The SS floats stay INTERNAL: "
        "at 2.4e11 magnitude their 16th digit differs across engines by "
        "summation order (measured), but F's ratio cancels the noise to "
        "1e-16 relative — so the output carries exact integer grand "
        "moments plus the 6dp F only."
    ),
)
def ml_anova_oneway_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    scored = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v"),
    )
    grp = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("v").cast("bigint").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("s2_g").cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    dev = (F.col("s_g") * F.col("n") - F.col("s") * F.col("n_g")).cast("double")
    parts = j.groupBy("n", "k").agg(
        F.sum(
            dev
            * dev
            / (
                F.col("n_g").cast("double")
                * F.col("n").cast("double")
                * F.col("n").cast("double")
            )
        ).alias("ssb"),
        F.sum(
            F.col("s2_g").cast("double")
            - F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("ssw"),
    )
    return parts.crossJoin(F.broadcast(tot.select("s", "s2"))).select(
        "n",
        F.col("k").alias("k_groups"),
        F.col("s").alias("grand_sum_e2"),
        F.col("s2").alias("grand_sumsq_e4"),
        F.round(
            (F.col("ssb") / (F.col("k").cast("double") - 1.0))
            / (
                F.col("ssw")
                / (F.col("n").cast("double") - F.col("k").cast("double"))
            ),
            6,
        ).alias("f_statistic"),
    )


_ORACLE_EFFECT_SIZES = """
WITH scored AS (
  SELECT event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(v) AS BIGINT) AS s_g,
         CAST(SUM(v * v) AS BIGINT) AS s2_g
  FROM scored GROUP BY event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.n_g AS n_a, b.n_g AS n_b,
       round((CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
              - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE)) / 100.0,
             4) AS mean_diff_dollars,
       round((CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
              - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
             / sqrt((
                 (CAST(a.s2_g AS DOUBLE)
                  - CAST(a.s_g AS DOUBLE) * CAST(a.s_g AS DOUBLE)
                    / CAST(a.n_g AS DOUBLE))
                 + (CAST(b.s2_g AS DOUBLE)
                    - CAST(b.s_g AS DOUBLE) * CAST(b.s_g AS DOUBLE)
                      / CAST(b.n_g AS DOUBLE))
               ) / CAST(a.n_g + b.n_g - 2 AS DOUBLE)),
             6) AS cohens_d
FROM grp a JOIN grp b ON a.event_type < b.event_type
ORDER BY type_a, type_b
"""


@register(
    "ml_effect_sizes_pairwise",
    oracle=_ORACLE_EFFECT_SIZES,
    tags=("ml", "stats"),
    doc=(
        "Pairwise Cohen's d effect sizes between all event-type value "
        "distributions — the magnitude report the significance family "
        "(z-test, Welch, Mann-Whitney, ANOVA) deliberately does not "
        "give: d = mean difference over the pooled standard deviation, "
        "every input an exact BIGINT group moment and the whole "
        "statistic one identical float expression per pair.  The 5x5/2 "
        "pair join runs on the 5-row group-moment table; at any scale "
        "the only data pass is the single combinable moment aggregate "
        "(shared with ml_anova_oneway_exact)."
    ),
)
def ml_effect_sizes_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    scored = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v"),
    )
    grp = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("v").cast("bigint").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2_g"),
    )
    a = grp.select(
        F.col("event_type").alias("type_a"),
        F.col("n_g").alias("n_a"),
        F.col("s_g").alias("s_a"),
        F.col("s2_g").alias("s2_a"),
    )
    b = grp.select(
        F.col("event_type").alias("type_b"),
        F.col("n_g").alias("n_b"),
        F.col("s_g").alias("s_b"),
        F.col("s2_g").alias("s2_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    mean_a = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    mean_b = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    ss_a = (
        F.col("s2_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a").cast("double")
        / F.col("n_a").cast("double")
    )
    ss_b = (
        F.col("s2_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b").cast("double")
        / F.col("n_b").cast("double")
    )
    pooled = F.sqrt(
        (ss_a + ss_b) / (F.col("n_a") + F.col("n_b") - 2).cast("double")
    )
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.round((mean_a - mean_b) / 100.0, 4).alias("mean_diff_dollars"),
        F.round((mean_a - mean_b) / pooled, 6).alias("cohens_d"),
    ).orderBy("type_a", "type_b")
