"""Round-10 second analytics batch.

* ``ml_lin_ccc`` — Lin's concordance correlation coefficient between the
  daily click and view series, integer moments only.
* ``agg_palma_ratio`` — the Palma inequality ratio (top-10% share over
  bottom-40% share) per segment from exact rank thresholds.
* ``er_blocking_quality`` — the two standard blocking-evaluation metrics
  (pairs completeness, reduction ratio) for the 8-token-prefix blocker
  against a trigram-cosine ground truth, all integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Lin's concordance correlation coefficient
# ---------------------------------------------------------------------------

_ORACLE_CCC = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily
)
SELECT n, sx, sy, sxx, syy, sxy,
       CAST(2 * (n * sxy - sx * sy) AS BIGINT) AS ccc_num,
       CAST(n * sxx - sx * sx + n * syy - sy * sy
            + (sx - sy) * (sx - sy) AS BIGINT) AS ccc_den,
       round(CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
             / CAST(n * sxx - sx * sx + n * syy - sy * sy
                    + (sx - sy) * (sx - sy) AS DOUBLE), 6) AS ccc,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
FROM m
"""


@register(
    "ml_lin_ccc",
    oracle=_ORACLE_CCC,
    tags=("ml", "stats"),
    doc=(
        "Lin's concordance correlation coefficient between the daily "
        "click and view count series: CCC = 2*cov / (var_x + var_y + "
        "(mean_x - mean_y)^2), every term carried as its exact integer "
        "numerator (multiply through by n^2, the Cronbach-alpha trick), "
        "so ccc_num/ccc_den are BIGINTs and the only floats are the two "
        "final rationals (Pearson r emitted beside it — CCC <= r always, "
        "the gap IS the location+scale bias).  The agreement measure for "
        "'does the cheap metric reproduce the expensive one', which "
        "correlation alone overstates.  One daily aggregate, one scalar "
        "aggregate — nothing data-scale after the groupBy."
    ),
)
def ml_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
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
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = (2 * (n * sxy - sx * sy)).cast("bigint")
    den = (
        n * sxx - sx * sx + n * syy - sy * sy + (sx - sy) * (sx - sy)
    ).cast("bigint")
    return m.select(
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        num.alias("ccc_num"),
        den.alias("ccc_den"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("ccc"),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / F.sqrt(
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            ),
            6,
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Palma inequality ratio per segment
# ---------------------------------------------------------------------------

_ORACLE_PALMA = """
WITH cents AS (
  SELECT c_mktsegment AS seg,
         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS x,
         c_custkey
  FROM customer WHERE c_acctbal > 0
),
ranked AS (
  SELECT seg, x,
         row_number() OVER (PARTITION BY seg ORDER BY x, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM cents
)
SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN rn <= 2 * n // 5 THEN x ELSE 0 END) AS BIGINT)
         AS bottom40_e2,
       CAST(SUM(CASE WHEN rn > 9 * n // 10 THEN x ELSE 0 END) AS BIGINT)
         AS top10_e2,
       round(CAST(SUM(CASE WHEN rn > 9 * n // 10 THEN x ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(CASE WHEN rn <= 2 * n // 5 THEN x ELSE 0 END)
                    AS DOUBLE), 6) AS palma
FROM ranked GROUP BY seg ORDER BY seg
"""


@register(
    "agg_palma_ratio",
    oracle=_ORACLE_PALMA,
    tags=("agg", "stats", "bi"),
    doc=(
        "Palma inequality ratio per segment: total balance of the top "
        "decile over the bottom 40%, with the decile boundaries as exact "
        "integer rank thresholds (rn > 9n DIV 10, rn <= 2n DIV 5 on the "
        "(value, key)-ordered per-segment rank window) so group "
        "membership is bit-deterministic — no float quantiles anywhere.  "
        "Completes the inequality family (Gini = area-based, Hoover = "
        "transfer-based, Palma = tail-ratio); economists prefer Palma "
        "when the middle 50% is stable.  One partitioned window + one "
        "grouped aggregate."
    ),
)
def agg_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cents = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100.0, 0).cast("bigint").alias("x"),
            "c_custkey",
        )
    )
    w = Window.partitionBy("seg").orderBy("x", "c_custkey")
    wn = Window.partitionBy("seg")
    ranked = cents.select(
        "seg",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bottom = F.sum(
        F.when(F.col("rn") <= F.floor(2 * F.col("n") / 5), F.col("x")).otherwise(
            0
        )
    ).cast("bigint")
    top = F.sum(
        F.when(F.col("rn") > F.floor(9 * F.col("n") / 10), F.col("x")).otherwise(
            0
        )
    ).cast("bigint")
    return (
        ranked.groupBy("seg")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            bottom.alias("bottom40_e2"),
            top.alias("top10_e2"),
        )
        .select(
            "seg",
            "n",
            "bottom40_e2",
            "top10_e2",
            F.round(
                F.col("top10_e2").cast("double")
                / F.col("bottom40_e2").cast("double"),
                6,
            ).alias("palma"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Blocking-quality evaluation (pairs completeness + reduction ratio)
# ---------------------------------------------------------------------------

_ERBQ_CAP_MULT = 20
_ERBQ_ABS_CAP = 64  # min(N/20, 64) — mirrors dedup_tf_cosine_pairs' cap
_ERBQ_MIN_COS = 0.5


def _erbq_oracle() -> str:
    return f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
blocked AS (
  SELECT doc_id, md5(array_to_string(w[1:8], ' ')) AS block_key FROM ws
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.doc_id < b.doc_id
),
big AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
  FROM ws, unnest(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
tf AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS tf
  FROM big GROUP BY doc_id, g
),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY doc_id
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
kept AS (
  SELECT tf.* FROM tf
  JOIN (SELECT g FROM tf, nd GROUP BY g, nd.n_docs
        HAVING {_ERBQ_CAP_MULT} * COUNT(*) <= nd.n_docs
           AND COUNT(*) <= {_ERBQ_ABS_CAP}) c USING (g)
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT d.doc_a, d.doc_b
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
  WHERE 4 * d.dot * d.dot >= na.n2 * nb.n2
    AND CAST(d.dot AS DOUBLE)
        / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
        >= {_ERBQ_MIN_COS}
),
counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM truth t JOIN cand c
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_captured,
         (SELECT n_docs FROM nd) AS n_docs
)
SELECT n_true AS n_true_pairs, n_cand AS n_candidate_pairs,
       n_captured,
       CAST(CASE WHEN n_true = 0 THEN 1000000
                 ELSE n_captured * 1000000 // n_true END AS BIGINT)
         AS completeness_ppm,
       CAST(1000000 - n_cand * 1000000 // (n_docs * (n_docs - 1) // 2)
            AS BIGINT) AS reduction_ppm
FROM counts
"""


@register(
    "er_blocking_quality",
    oracle=_erbq_oracle(),
    tags=("dedup", "er", "eval"),
    doc=(
        "Blocking-quality evaluation — the two numbers every "
        "entity-resolution paper reports: PAIRS COMPLETENESS (fraction "
        "of true near-dup pairs the blocker keeps) and REDUCTION RATIO "
        "(fraction of the n^2 comparison space it eliminates), for the "
        "8-token-prefix blocker scored against the trigram-cosine>=0.5 "
        "ground truth (the dedup_tf_cosine_pairs semantics inlined, "
        "including its min(N/20, 64) df cap).  "
        "Both metrics are exact integer ppm — floor division, no "
        "floats — so the quality/cost trade-off of a blocking choice is "
        "itself a differ-verified quantity.  Near-dups whose edits touch "
        "the first 8 tokens escape the block: completeness < 1 is a "
        "REAL finding here, not an artifact."
    ),
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split("text", " ").alias("w"))
    blocked = ws.select(
        "doc_id",
        F.md5(F.array_join(F.slice("w", 1, 8), " ")).alias("block_key"),
    )
    ba = blocked.select(F.col("doc_id").alias("doc_a"), "block_key")
    bb = blocked.select(F.col("doc_id").alias("doc_b"), "block_key")
    cand = ba.join(bb, "block_key").where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b"
    )
    big = ws.where(F.size("w") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1),"
                " ' ', element_at(w, i + 2)))"
            )
        ).alias("g"),
    )
    tf = big.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cold = (
        tf.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(nd), F.lit(True), "left")
        .where(
            (_ERBQ_CAP_MULT * F.col("df") <= F.col("n_docs"))
            & (F.col("df") <= _ERBQ_ABS_CAP)
        )
        .select("g")
    )
    kept = tf.join(cold, "g")
    a = kept.select(F.col("doc_id").alias("doc_a"), "g", F.col("tf").alias("tf_a"))
    b = kept.select(F.col("doc_id").alias("doc_b"), "g", F.col("tf").alias("tf_b"))
    dots = (
        a.join(b, "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    cosine = F.col("dot").cast("double") / F.sqrt(
        F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
    )
    truth = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(
            (4 * F.col("dot") * F.col("dot") >= F.col("n2_a") * F.col("n2_b"))
            & (cosine >= _ERBQ_MIN_COS)
        )
        .select("doc_a", "doc_b")
    )
    n_true = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    n_cap = truth.join(cand, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_captured")
    )
    return (
        n_true.join(F.broadcast(n_cand), F.lit(True), "left")
        .join(F.broadcast(n_cap), F.lit(True), "left")
        .join(F.broadcast(nd), F.lit(True), "left")
        .select(
            F.col("n_true").alias("n_true_pairs"),
            F.col("n_cand").alias("n_candidate_pairs"),
            "n_captured",
            F.when(F.col("n_true") == 0, F.lit(1000000))
            .otherwise(F.floor(F.col("n_captured") * 1000000 / F.col("n_true")))
            .cast("bigint")
            .alias("completeness_ppm"),
            (
                1000000
                - F.floor(
                    F.col("n_cand")
                    * 1000000
                    / F.floor(F.col("n_docs") * (F.col("n_docs") - 1) / 2)
                )
            )
            .cast("bigint")
            .alias("reduction_ppm"),
        )
    )
