"""Round-11 batch 13: Good-Turing frequency smoothing.

``corpus_good_turing`` — Good-Turing smoothing over the document token
counts: the frequency-of-frequencies table N_r, the smoothed counts
r* = (r+1) N_{r+1} / N_r in exact micro-units, and the unseen-mass
estimate p0 = N_1 / N — the classic language-model smoothing and the
standard "how much vocabulary am I missing" estimator for corpus
coverage audits.  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------

_GT_MAX_R = 10

_ORACLE_GT = rf"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
tc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY term
),
nr AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc GROUP BY r
),
tot AS (
  SELECT CAST(COALESCE(SUM(r * n_r), 0) AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_r), 0) AS BIGINT) AS vocab
  FROM nr
)
SELECT nr.r, nr.n_r,
       CAST(CASE WHEN nxt.n_r IS NULL THEN 0
            ELSE ((nr.r + 1) * 1000000 * nxt.n_r) // nr.n_r END AS BIGINT)
         AS r_star_e6,
       tot.n_tokens, tot.vocab,
       CAST(CASE WHEN tot.n_tokens = 0 THEN 0
            ELSE (1000000 * COALESCE(n1.n_r, 0)) // tot.n_tokens END
            AS BIGINT) AS p_unseen_e6
FROM nr
LEFT JOIN nr nxt ON nxt.r = nr.r + 1
LEFT JOIN nr n1 ON n1.r = 1
CROSS JOIN tot
ORDER BY nr.r
LIMIT {_GT_MAX_R}
"""


@register(
    "corpus_good_turing",
    oracle=_ORACLE_GT,
    tags=("corpus", "text", "stats"),
    doc=(
        f"Good-Turing frequency smoothing over the whitespace token "
        f"counts (the {_GT_MAX_R} smallest observed frequencies — the "
        "synthetic corpus has no singleton tail, so the panel follows "
        "the data): the frequency-of-frequencies "
        "table N_r from two hash aggregates, smoothed counts "
        "r* = (r+1) N_(r+1)/N_r as floored micro-units (0 where "
        "N_(r+1) is empty — the raw estimator's own gap), and the "
        "unseen-probability mass p0 = N_1/N on every row.  The classic "
        "LM smoothing estimator and the standard corpus-coverage "
        "audit: p0 is the probability the NEXT token is one you have "
        "never seen.  All exact integers; the r-spine is bounded by "
        "the max token frequency."
    ),
)
def corpus_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    nr = tc.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    tot = nr.agg(
        F.coalesce(F.sum(F.col("r") * F.col("n_r")), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
        F.coalesce(F.sum("n_r"), F.lit(0)).cast("bigint").alias("vocab"),
    )
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    n1 = nr.where(F.col("r") == 1).select(F.col("n_r").alias("n_one"))
    return (
        nr.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(n1), F.lit(True), "left")
        .select(
            "r",
            "n_r",
            F.expr(
                "CAST(CASE WHEN n_r1 IS NULL THEN 0"
                " ELSE ((r + 1) * 1000000 * n_r1) div n_r END AS BIGINT)"
            ).alias("r_star_e6"),
            "n_tokens",
            "vocab",
            F.expr(
                "CAST(CASE WHEN n_tokens = 0 THEN 0"
                " ELSE (1000000 * COALESCE(n_one, 0)) div n_tokens END"
                " AS BIGINT)"
            ).alias("p_unseen_e6"),
        )
        .orderBy("r")
        .limit(_GT_MAX_R)
    )
