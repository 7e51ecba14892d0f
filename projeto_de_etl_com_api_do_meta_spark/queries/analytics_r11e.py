"""Round-11 batch 5: the ads-experimentation readout family.

* ``events_shapley_attribution`` — EXACT Shapley channel attribution
  over the 4 touch channels: coalition value v(S) = conversions whose
  entire pre-purchase touch set fits inside S, computed on the 16-mask
  subset spine; Shapley weights k!(K-1-k)!/K! carried as integers
  scaled by 4! = 24, so every channel's value is one exact BIGINT.
  The game-theoretic upgrade over last-touch / Markov removal effects
  (events_markov_attribution): the only attribution scheme that is
  efficient + symmetric + additive.
* ``ml_cuped_adjustment`` — CUPED variance-reduced A/B readout
  (Deng et al. 2013): theta from the pooled user-grain covariance of a
  pre-exposure engagement covariate against purchase revenue, adjusted
  lift beside the raw lift, variance reduction = rho^2.
* ``ml_qini_uplift`` — Qini curve for uplift targeting over the
  distinct-score VALUE SPINE (no per-user global sort): cumulative
  treated/control conversions at each click-count cut, uplift and Qini
  in floored integer micro-units.
* ``ml_empirical_bayes_ctr`` — beta-binomial empirical-Bayes shrinkage
  of per-campaign conversion rates (James-Stein for CTRs): prior
  strength K = m(1-m)/v - 1 from method-of-moments across the bounded
  campaign spine, shrunk rate (x + m*K)/(n + K) in floored e6 units.

Determinism contract as the rest of r11: all mass arithmetic is exact
BIGINT (floor divisions only ever applied to non-negative operands, so
Spark ``div`` and DuckDB ``//`` agree); the few float readouts are ONE
textually-identical double expression per column, rounded.  Scale: every
operator is one user-grain (or event-grain) hash aggregate plus
constant-size spine work (16 coalition masks, 2 variants, the distinct
click-count spine, 25 campaigns).  Reference scope: [EXT] SURVEY §6 —
the experimentation layer downstream of the reference's CPC/CPL KPIs
(reference transform.py's safe-ratio metrics feed exactly these
readouts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Shapley attribution
# ---------------------------------------------------------------------------

#: Touch channels (the 4 non-conversion event types), alphabetical -> bits.
_SH_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
_SH_K = len(_SH_CHANNELS)

#: Shapley weight numerators |S|! * (K-1-|S|)! for K=4, scaled so the
#: denominator is exactly 4! = 24: [0!3!, 1!2!, 2!1!, 3!0!] = [6, 2, 2, 6].
_SH_W = (6, 2, 2, 6)

_SH_MASK_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{ch}' THEN {bit}" for ch, bit in _SH_CHANNELS)
    + " END"
)

_SH_SUBSET_ROWS = ", ".join(
    f"({m}, {bin(m).count('1')})" for m in range(2 ** _SH_K)
)
_SH_CHANNEL_ROWS = ", ".join(f"('{ch}', {bit})" for ch, bit in _SH_CHANNELS)

_SH_W_CASE = (
    "CASE pc " + " ".join(f"WHEN {s} THEN {w}" for s, w in enumerate(_SH_W)) + " END"
)
#: Same weight CASE, qualified on the excluded-subset side of the join.
_SH_W0_CASE = (
    "CASE v0.pc "
    + " ".join(f"WHEN {s} THEN {w}" for s, w in enumerate(_SH_W))
    + " END"
)

_ORACLE_SHAPLEY = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
firstp AS (
  SELECT user_id, MIN(rn) AS prn FROM ordered
  WHERE event_type = 'purchase' GROUP BY user_id
),
touch AS (
  SELECT o.user_id,
         CAST(SUM(DISTINCT {_SH_MASK_CASE}) AS BIGINT) AS mask
  FROM ordered o JOIN firstp f ON o.user_id = f.user_id
  WHERE o.rn < f.prn
  GROUP BY o.user_id
),
convmask AS (
  SELECT f.user_id, COALESCE(t.mask, 0) AS mask
  FROM firstp f LEFT JOIN touch t ON f.user_id = t.user_id
),
mcnt AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM convmask GROUP BY mask
),
subsets(s_mask, pc) AS (VALUES {_SH_SUBSET_ROWS}),
v AS (
  SELECT s.s_mask, s.pc, CAST(COALESCE(SUM(m.c), 0) AS BIGINT) AS v
  FROM subsets s LEFT JOIN mcnt m ON (m.mask & s.s_mask) = m.mask
  GROUP BY s.s_mask, s.pc
),
channels(channel, bit) AS (VALUES {_SH_CHANNEL_ROWS})
SELECT ch.channel,
       CAST(SUM(({_SH_W0_CASE}) * (v1.v - v0.v)) AS BIGINT) AS shapley_e24,
       round(CAST(SUM(({_SH_W0_CASE}) * (v1.v - v0.v)) AS DOUBLE) / 24.0, 6)
         AS shapley_conversions
FROM channels ch
JOIN v v0 ON (v0.s_mask & ch.bit) = 0
JOIN v v1 ON v1.s_mask = v0.s_mask + ch.bit
GROUP BY ch.channel
ORDER BY channel
"""


@register(
    "events_shapley_attribution",
    oracle=_ORACLE_SHAPLEY,
    tags=("events", "analytics", "attribution", "ml"),
    doc=(
        "EXACT Shapley-value channel attribution (Shapley 1953 applied "
        "to the marketing coalition game): v(S) = number of converting "
        "users whose entire pre-first-purchase touch set is contained "
        "in channel set S, evaluated on the full 2^4 = 16-subset spine; "
        "phi_i = sum over S not containing i of |S|!(K-1-|S|)!/K! * "
        "(v(S+i) - v(S)), carried as an exact BIGINT scaled by 4! = 24 "
        "(weights [6,2,2,6]).  Efficiency holds exactly: "
        "sum(shapley_e24) = 24*(v(full) - v(empty)).  The axiomatic "
        "multi-touch model beside events_markov_attribution's removal "
        "effects; all corpus-scale work is one per-user mask aggregate, "
        "the coalition algebra is a 16x16 literal-spine join."
    ),
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firstp = (
        ordered.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    touch = (
        ordered.join(firstp, "user_id")
        .where(F.col("rn") < F.col("prn"))
        .groupBy("user_id")
        .agg(F.expr(f"CAST(SUM(DISTINCT {_SH_MASK_CASE}) AS BIGINT)").alias("mask"))
    )
    convmask = firstp.join(touch, "user_id", "left").select(
        "user_id", F.coalesce("mask", F.lit(0)).alias("mask")
    )
    mcnt = convmask.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    subsets = spark.createDataFrame(
        [(m, bin(m).count("1")) for m in range(2 ** _SH_K)],
        "s_mask BIGINT, pc INT",
    )
    v = (
        subsets.join(
            mcnt,
            F.expr("(mask & s_mask) = mask"),
            "left",
        )
        .groupBy("s_mask", "pc")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("v"))
    )
    channels = spark.createDataFrame(
        list(_SH_CHANNELS), "channel STRING, bit BIGINT"
    )
    v0 = v.select(
        F.col("s_mask").alias("s0"), F.col("pc").alias("pc"), F.col("v").alias("v0")
    )
    v1 = v.select(F.col("s_mask").alias("s1"), F.col("v").alias("v1"))
    phi = (
        channels.join(F.broadcast(v0), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(v1), F.expr("s1 = s0 + bit"))
        .groupBy("channel")
        .agg(
            F.expr(f"CAST(SUM(({_SH_W_CASE}) * (v1 - v0)) AS BIGINT)").alias(
                "shapley_e24"
            ),
            F.expr(
                f"round(CAST(SUM(({_SH_W_CASE}) * (v1 - v0)) AS DOUBLE) / 24.0, 6)"
            ).alias("shapley_conversions"),
        )
    )
    return phi.orderBy("channel")


# ---------------------------------------------------------------------------
# CUPED adjusted A/B readout
# ---------------------------------------------------------------------------

#: Per-column double readouts — textually identical in both engines so the
#: IEEE arithmetic is bit-identical (the ml_partial_correlation contract).
_CU_MEAN = "CASE WHEN {n} = 0 THEN 0.0 ELSE CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE) END"
_CU_MY_A = _CU_MEAN.format(s="sy_a", n="n_a")
_CU_MY_B = _CU_MEAN.format(s="sy_b", n="n_b")
_CU_MX_A = _CU_MEAN.format(s="sx_a", n="n_a")
_CU_MX_B = _CU_MEAN.format(s="sx_b", n="n_b")
_CU_COV = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
_CU_VARX = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
_CU_VARY = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
_CU_THETA = f"CASE WHEN {_CU_VARX} <= 0 THEN 0.0 ELSE {_CU_COV} / {_CU_VARX} END"
_CU_RHO2 = (
    f"CASE WHEN {_CU_VARX} <= 0 OR {_CU_VARY} <= 0 THEN 0.0 "
    f"ELSE ({_CU_COV} * {_CU_COV}) / ({_CU_VARX} * {_CU_VARY}) END"
)

_CU_SELECT = f"""
SELECT n_a, n_b,
       round(({_CU_MY_A}) - ({_CU_MY_B}), 6) AS diff_raw_cents,
       round({_CU_THETA}, 9) AS theta,
       round((({_CU_MY_A}) - ({_CU_MY_B}))
             - ({_CU_THETA}) * (({_CU_MX_A}) - ({_CU_MX_B})), 6)
         AS diff_cuped_cents,
       round({_CU_RHO2}, 6) AS rho2,
       round(100.0 * ({_CU_RHO2}), 4) AS var_reduction_pct
"""

_ORACLE_CUPED = f"""
WITH usr AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
         CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
         CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx,
         CAST(COALESCE(SUM(x * y), 0) AS BIGINT) AS sxy,
         CAST(COALESCE(SUM(y * y), 0) AS BIGINT) AS syy,
         CAST(COALESCE(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_a,
         CAST(COALESCE(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_b,
         CAST(COALESCE(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END), 0)
              AS BIGINT) AS sx_a,
         CAST(COALESCE(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END), 0)
              AS BIGINT) AS sx_b,
         CAST(COALESCE(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END), 0)
              AS BIGINT) AS sy_a,
         CAST(COALESCE(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END), 0)
              AS BIGINT) AS sy_b
  FROM usr
)
{_CU_SELECT}
FROM m
"""


@register(
    "ml_cuped_adjustment",
    oracle=_ORACLE_CUPED,
    tags=("ml", "stats", "experimentation"),
    doc=(
        "CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & "
        "Walker, WSDM 2013): variants split by user_id %% 2 (the "
        "events_ab_test_ztest convention), Y = per-user purchase revenue "
        "in cents, covariate X = per-user view+click engagement; "
        "theta = cov(X,Y)/var(X) pooled, adjusted lift = raw lift - "
        "theta * covariate lift, variance reduction = rho^2.  All "
        "moments are ONE exact BIGINT user-grain aggregate; every float "
        "column is a single textually-shared double expression over "
        "those integers (the ml_partial_correlation contract), so the "
        "readout is bit-identical across engines.  One row of state at "
        "any event volume."
    ),
)
def ml_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    usr = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("bigint").alias("variant")
    ).agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("y"),
    )
    m = usr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("bigint").alias("sx"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("bigint").alias("sy"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0))
        .cast("bigint")
        .alias("sxx"),
        F.coalesce(F.sum(F.col("x") * F.col("y")), F.lit(0))
        .cast("bigint")
        .alias("sxy"),
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0))
        .cast("bigint")
        .alias("syy"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sx_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sx_b"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sy_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sy_b"),
    )
    return m.select(
        "n_a",
        "n_b",
        F.expr(f"round(({_CU_MY_A}) - ({_CU_MY_B}), 6)").alias("diff_raw_cents"),
        F.expr(f"round({_CU_THETA}, 9)").alias("theta"),
        F.expr(
            f"round((({_CU_MY_A}) - ({_CU_MY_B}))"
            f" - ({_CU_THETA}) * (({_CU_MX_A}) - ({_CU_MX_B})), 6)"
        ).alias("diff_cuped_cents"),
        F.expr(f"round({_CU_RHO2}, 6)").alias("rho2"),
        F.expr(f"round(100.0 * ({_CU_RHO2}), 4)").alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# Qini uplift curve
# ---------------------------------------------------------------------------

_QI_UPLIFT = (
    "(CASE WHEN cn_t = 0 THEN 0 ELSE (1000000 * cconv_t) {d} cn_t END)"
    " - (CASE WHEN cn_c = 0 THEN 0 ELSE (1000000 * cconv_c) {d} cn_c END)"
)
_QI_QINI = (
    "1000000 * cconv_t - (CASE WHEN cn_c = 0 THEN 0"
    " ELSE (1000000 * cconv_c * cn_t) {d} cn_c END)"
)

_ORACLE_QINI = f"""
WITH usr AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS t,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
),
bys AS (
  SELECT score,
         CAST(SUM(t) AS BIGINT) AS n_t,
         CAST(SUM(1 - t) AS BIGINT) AS n_c,
         CAST(SUM(t * conv) AS BIGINT) AS conv_t,
         CAST(SUM((1 - t) * conv) AS BIGINT) AS conv_c
  FROM usr GROUP BY score
),
cum AS (
  SELECT score,
         CAST(SUM(n_t) OVER w AS BIGINT) AS cn_t,
         CAST(SUM(n_c) OVER w AS BIGINT) AS cn_c,
         CAST(SUM(conv_t) OVER w AS BIGINT) AS cconv_t,
         CAST(SUM(conv_c) OVER w AS BIGINT) AS cconv_c
  FROM bys WINDOW w AS (ORDER BY score DESC)
)
SELECT score AS n_clicks_cut, cn_t, cn_c, cconv_t, cconv_c,
       CAST({_QI_UPLIFT.format(d="//")} AS BIGINT) AS uplift_micro,
       CAST({_QI_QINI.format(d="//")} AS BIGINT) AS qini_micro
FROM cum
ORDER BY n_clicks_cut DESC
"""


@register(
    "ml_qini_uplift",
    oracle=_ORACLE_QINI,
    tags=("ml", "experimentation", "uplift"),
    doc=(
        "Qini uplift curve (Radcliffe 2007) for click-count targeting: "
        "users hash into treatment/control by user_id %% 2, the "
        "targeting score is the per-user click count, and at every "
        "distinct score cut (descending) the curve reports cumulative "
        "treated/control sizes and conversions, incremental uplift "
        "floor(1e6*conv_t/n_t) - floor(1e6*conv_c/n_c), and the Qini "
        "value 1e6*conv_t - floor(1e6*conv_c*n_t/n_c) — all floored "
        "integer micro-units over non-negative operands so Spark div "
        "and DuckDB // agree exactly.  The cumulative window runs over "
        "the DISTINCT-SCORE VALUE SPINE (bounded by the max per-user "
        "click count), never over users — the quantize-then-spine "
        "contract (ml_auc_roc_exact), so no global row sort at any "
        "scale."
    ),
)
def ml_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    usr = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("bigint").alias("t")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
    )
    bys = usr.groupBy("score").agg(
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n_c"),
        F.sum(F.col("t") * F.col("conv")).cast("bigint").alias("conv_t"),
        F.sum((F.lit(1) - F.col("t")) * F.col("conv"))
        .cast("bigint")
        .alias("conv_c"),
    )
    # Cumulative over the distinct-click-count value spine (bounded), not
    # over users — plan-audit: GLOBAL_WINDOW on a value spine.
    w = Window.orderBy(F.col("score").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bys.select(
        "score",
        F.sum("n_t").over(w).cast("bigint").alias("cn_t"),
        F.sum("n_c").over(w).cast("bigint").alias("cn_c"),
        F.sum("conv_t").over(w).cast("bigint").alias("cconv_t"),
        F.sum("conv_c").over(w).cast("bigint").alias("cconv_c"),
    )
    return cum.select(
        F.col("score").alias("n_clicks_cut"),
        "cn_t",
        "cn_c",
        "cconv_t",
        "cconv_c",
        F.expr(_QI_UPLIFT.format(d="div")).cast("bigint").alias("uplift_micro"),
        F.expr(_QI_QINI.format(d="div")).cast("bigint").alias("qini_micro"),
    ).orderBy(F.col("n_clicks_cut").desc())


# ---------------------------------------------------------------------------
# Empirical-Bayes CTR shrinkage
# ---------------------------------------------------------------------------

_EB_N_CAMPAIGNS = 25

#: Prior strength K = m(1-m)/v - 1, clamped to >= 0; all e-fixed BIGINT.
_EB_K = (
    "CASE WHEN v_e12 = 0 THEN 0 ELSE "
    "GREATEST((m_e6 * (1000000 - m_e6)) {d} v_e12 - 1, 0) END"
)
_EB_SHRUNK = "(1000000 * x + m_e6 * kk) {d} (n + kk)"

_ORACLE_EB = f"""
WITH ev AS (
  SELECT user_id % {_EB_N_CAMPAIGNS} AS campaign,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
  FROM events
),
c AS (
  SELECT campaign, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(is_conv) AS BIGINT) AS x
  FROM ev GROUP BY campaign
),
r AS (SELECT campaign, n, x, (1000000 * x) // n AS p_e6 FROM c),
g1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(CASE WHEN COUNT(*) = 0 THEN 0
              ELSE COALESCE(SUM(p_e6), 0) // COUNT(*) END AS BIGINT) AS m_e6
  FROM r
),
g2 AS (
  SELECT g1.k, g1.m_e6,
         CAST(CASE WHEN g1.k = 0 THEN 0
              ELSE COALESCE(SUM((r.p_e6 - g1.m_e6) * (r.p_e6 - g1.m_e6)), 0)
                   // g1.k END AS BIGINT) AS v_e12
  FROM g1 LEFT JOIN r ON TRUE
  GROUP BY g1.k, g1.m_e6
),
p AS (
  SELECT r.campaign, r.n, r.x, r.p_e6, g2.m_e6, g2.v_e12,
         CAST({_EB_K.format(d="//")} AS BIGINT) AS kk
  FROM r CROSS JOIN g2
)
SELECT campaign, n, x,
       CAST(p_e6 AS BIGINT) AS raw_rate_e6,
       CAST({_EB_SHRUNK.format(d="//")} AS BIGINT) AS shrunk_rate_e6,
       m_e6 AS prior_mean_e6, kk AS prior_strength,
       round(CAST({_EB_SHRUNK.format(d="//")} AS DOUBLE) / 1000000.0, 6)
         AS shrunk_rate
FROM p
ORDER BY campaign
"""


@register(
    "ml_empirical_bayes_ctr",
    oracle=_ORACLE_EB,
    tags=("ml", "stats", "experimentation"),
    doc=(
        "Empirical-Bayes (beta-binomial, James-Stein-style) shrinkage of "
        "per-campaign conversion rates: campaigns hash from user_id mod "
        f"{_EB_N_CAMPAIGNS} (props is empty in the r11 sf0.01 refresh), "
        "raw rate floor(1e6*x/n), prior "
        "mean m and variance v by method of moments ACROSS the bounded "
        "campaign spine, prior strength K = m(1-m)/v - 1 (clamped at "
        "0), shrunk rate floor((1e6*x + m*K)/(n + K)).  The "
        "small-campaign CTR leaderboard fix — raw rates over-rank tiny "
        "n; shrinkage pulls them toward the prior by exactly the "
        "Bayesian amount.  Every quantity is e-fixed BIGINT with floor "
        "divisions on non-negative operands (Spark div == DuckDB //); "
        "one event-grain hash aggregate plus 25-row spine algebra."
    ),
)
def ml_empirical_bayes_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _EB_N_CAMPAIGNS).alias("campaign"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_conv"
        ),
    )
    c = ev.groupBy("campaign").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_conv").cast("bigint").alias("x"),
    )
    r = c.select(
        "campaign", "n", "x", F.expr("(1000000 * x) div n").alias("p_e6")
    )
    g1 = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            "CAST(CASE WHEN COUNT(*) = 0 THEN 0"
            " ELSE COALESCE(SUM(p_e6), 0) div COUNT(*) END AS BIGINT)"
        ).alias("m_e6"),
    )
    g2 = (
        g1.join(r, F.lit(True), "left")
        .groupBy("k", "m_e6")
        .agg(
            F.expr(
                "CAST(CASE WHEN k = 0 THEN 0"
                " ELSE COALESCE(SUM((p_e6 - m_e6) * (p_e6 - m_e6)), 0)"
                " div k END AS BIGINT)"
            ).alias("v_e12")
        )
    )
    p = r.crossJoin(F.broadcast(g2)).withColumn(
        "kk", F.expr(_EB_K.format(d="div")).cast("bigint")
    )
    return p.select(
        "campaign",
        "n",
        "x",
        F.col("p_e6").cast("bigint").alias("raw_rate_e6"),
        F.expr(_EB_SHRUNK.format(d="div")).cast("bigint").alias(
            "shrunk_rate_e6"
        ),
        F.col("m_e6").alias("prior_mean_e6"),
        F.col("kk").alias("prior_strength"),
        F.expr(
            f"round(CAST({_EB_SHRUNK.format(d='div')} AS DOUBLE)"
            " / 1000000.0, 6)"
        ).alias("shrunk_rate"),
    ).orderBy("campaign")
