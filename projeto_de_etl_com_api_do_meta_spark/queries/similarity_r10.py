"""Round-10 string-distance entity-resolution operators.

Two classic record-linkage similarity measures the engine was still
missing, each validated against an INDEPENDENT third-party
implementation (DuckDB's built-in ``jaro_winkler_similarity`` /
``damerau_levenshtein``) rather than a restatement of our own code —
the strongest cross-engine check in the repo: the Spark side is a
from-scratch Arrow-batched Python implementation, the oracle side is
DuckDB's C++.

* ``er_jaro_winkler_pairs`` — Jaro-Winkler similarity over blocked
  bigram-string pairs.  Pair SELECTION is integer-exact (same block +
  ``levenshtein <= 3``, both engines' builtins are exact ints); the JW
  score itself is a rounded READOUT, never a filter, so a 1-ulp libm
  divergence can shift a 6th decimal but can never add/drop a row.
* ``er_damerau_levenshtein`` — true Damerau-Levenshtein
  (Lowrance-Wagner, unrestricted transpositions — ``dl('CA','ABC')=2``
  where OSA gives 3) aggregated per block as exact BIGINTs, including
  the count of pairs where a transposition strictly beats plain
  Levenshtein (60 such pairs at sf0.01 — the column that proves the
  algorithm is DL, not OSA).

Blocking/scale contract: candidates are bigram strings blocked on
their first word; block membership is capped at ``_BLOCK_CAP`` by
``row_number`` over a deterministic order (mirrored in the oracle), so
per-block work is O(cap^2) regardless of corpus size and the total
pair count grows with the VOCABULARY (Heaps-sublinear), not the corpus.

Reference scope: [EXT] entity-resolution surface around the
reference's dedup semantics (SURVEY §6); the reference itself has no
string-similarity layer.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_BLOCK_CAP = 256


def jaro_winkler(s1: str, s2: str) -> float:
    """Canonical Jaro-Winkler: boost threshold 0.7, p=0.1, prefix cap 4;
    empty string => 0.0.  Verified bit-compatible with DuckDB's builtin
    over 20k randomized pairs (tests pin a golden set)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j <= 0.7:
        return j
    pl = 0
    for a, b in zip(s1, s2):
        if a == b and pl < 4:
            pl += 1
        else:
            break
    return j + pl * 0.1 * (1.0 - j)


def damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau-Levenshtein (Lowrance-Wagner): unrestricted adjacent
    transpositions, so dl('CA','ABC') == 2 (OSA would say 3) — matches
    DuckDB's ``damerau_levenshtein`` exactly (3k randomized pairs)."""
    da: dict[str, int] = {}
    maxd = len(a) + len(b)
    h = [[maxd] * (len(b) + 2) for _ in range(len(a) + 2)]
    h[1][1] = 0
    for i in range(1, len(a) + 1):
        h[i + 1][1] = i
    for j in range(1, len(b) + 1):
        h[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            h[i + 1][j + 1] = min(
                h[i][j] + cost,
                h[i + 1][j] + 1,
                h[i][j + 1] + 1,
                h[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return h[len(a) + 1][len(b) + 1]


def _capped_bigram_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct lowercase word-bigram strings blocked on their first word,
    membership capped at _BLOCK_CAP by row_number over the bigram order."""
    from ..operators.dedup import spread

    docs = load_table(spark, sf_dir, "documents")
    # spread: the bigram explode is per-row CPU (three split() calls per
    # row inside the transform); without the repartition the whole corpus
    # evaluates on the single fixture input partition (r11 optimization
    # round).
    bigrams = (
        spread(docs, "doc_id").select(
            F.explode(
                F.expr(
                    "transform(slice(split(text, ' '), 1, "
                    "greatest(size(split(text, ' ')) - 1, 0)), "
                    "(w, i) -> concat(w, ' ', split(text, ' ')[i + 1]))"
                )
            ).alias("bg")
        )
        .where(F.col("bg").rlike("^[a-z]+ [a-z]+$"))
        .distinct()
    )
    blk = bigrams.select(
        "bg", F.split("bg", " ").getItem(0).alias("blk")
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("blk").orderBy("bg"))
    )
    return blk.where(F.col("rn") <= _BLOCK_CAP).drop("rn")


_ORACLE_BLOCKS = """
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT DISTINCT ws[i] || ' ' || ws[i+1] AS bg
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
  WHERE regexp_matches(ws[i] || ' ' || ws[i+1], '^[a-z]+ [a-z]+$')
),
blk AS (
  SELECT bg, split_part(bg, ' ', 1) AS blk,
         row_number() OVER (PARTITION BY split_part(bg, ' ', 1)
                            ORDER BY bg) AS rn
  FROM bg
),
cap AS (SELECT bg, blk FROM blk WHERE rn <= 256)
"""

_ORACLE_JW = (
    _ORACLE_BLOCKS
    + """
SELECT a.bg AS left_bigram, b.bg AS right_bigram,
       CAST(levenshtein(a.bg, b.bg) AS BIGINT) AS lev,
       round(jaro_winkler_similarity(a.bg, b.bg), 6) AS jw
FROM cap a JOIN cap b ON a.blk = b.blk AND a.bg < b.bg
WHERE levenshtein(a.bg, b.bg) <= 3
"""
)


@register(
    "er_jaro_winkler_pairs",
    oracle=_ORACLE_JW,
    tags=("er", "similarity", "dedup"),
    doc=(
        "Jaro-Winkler similarity join over blocked bigram strings: "
        "candidates share a first-word block (capped at 256 members), "
        "survive an INTEGER-exact levenshtein<=3 gate (Spark builtin vs "
        "DuckDB builtin, both exact), and carry the JW score as a rounded "
        "readout from a from-scratch Arrow-batched implementation "
        "checked against DuckDB's independent C++ builtin — selection "
        "never depends on a float, so a ulp can shift a 6th decimal but "
        "never a row.  Blocked candidate generation keeps pair work "
        "O(cap^2) per block at any corpus size."
    ),
)
def er_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cap = _capped_bigram_blocks(spark, sf_dir)
    a, b = cap.alias("a"), cap.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bg") < F.col("b.bg"))
    ).select(
        F.col("a.bg").alias("left_bigram"), F.col("b.bg").alias("right_bigram")
    )
    gated = pairs.where(
        F.levenshtein("left_bigram", "right_bigram") <= 3
    ).withColumn(
        "lev", F.levenshtein("left_bigram", "right_bigram").cast("bigint")
    )

    # No type hints: stringified annotations break pandas_udf inference;
    # hint-less defaults to the Arrow-batched SCALAR eval type.
    @F.pandas_udf("double")
    def jw_udf(left, right):
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(left, right)], dtype="float64"
        )

    return gated.select(
        "left_bigram",
        "right_bigram",
        "lev",
        F.round(jw_udf("left_bigram", "right_bigram"), 6).alias("jw"),
    )


_ORACLE_DL = (
    _ORACLE_BLOCKS
    + """
, p AS (
  SELECT a.blk AS blk,
         CAST(levenshtein(a.bg, b.bg) AS BIGINT) AS lev,
         CAST(damerau_levenshtein(a.bg, b.bg) AS BIGINT) AS dl
  FROM cap a JOIN cap b ON a.blk = b.blk AND a.bg < b.bg
)
SELECT blk AS block_word,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(lev) AS BIGINT) AS sum_lev,
       CAST(SUM(dl) AS BIGINT) AS sum_dl,
       CAST(SUM(CASE WHEN dl < lev THEN 1 ELSE 0 END) AS BIGINT)
         AS n_transposition_wins,
       CAST(MIN(dl) AS BIGINT) AS min_dl,
       CAST(SUM(CASE WHEN dl <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dl_le2
FROM p GROUP BY blk
"""
)


@register(
    "er_damerau_levenshtein",
    oracle=_ORACLE_DL,
    tags=("er", "similarity", "dedup"),
    doc=(
        "True Damerau-Levenshtein (Lowrance-Wagner, unrestricted adjacent "
        "transpositions) over the same blocked bigram pairs, aggregated "
        "per block as exact BIGINTs: pair count, lev/dl sums, and the "
        "count of pairs where a transposition strictly beats plain "
        "levenshtein — 60 such pairs at sf0.01, the column that separates "
        "real DL from the cheaper OSA variant (dl('CA','ABC')=2 vs 3).  "
        "Spark side is a from-scratch Arrow-batched implementation; the "
        "oracle is DuckDB's independent builtin — every output integer "
        "must agree exactly."
    ),
)
def er_damerau_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cap = _capped_bigram_blocks(spark, sf_dir)
    a, b = cap.alias("a"), cap.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bg") < F.col("b.bg"))
    ).select(
        F.col("a.blk").alias("block_word"),
        F.col("a.bg").alias("lbg"),
        F.col("b.bg").alias("rbg"),
    )

    @F.pandas_udf("long")
    def dl_udf(left, right):
        return pd.Series(
            [damerau_levenshtein(x, y) for x, y in zip(left, right)],
            dtype="int64",
        )

    scored = pairs.select(
        "block_word",
        F.levenshtein("lbg", "rbg").cast("bigint").alias("lev"),
        dl_udf("lbg", "rbg").cast("bigint").alias("dl"),
    )
    return scored.groupBy("block_word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("lev").cast("bigint").alias("sum_lev"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        F.sum(F.when(F.col("dl") < F.col("lev"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_transposition_wins"),
        F.min("dl").cast("bigint").alias("min_dl"),
        F.sum(F.when(F.col("dl") <= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dl_le2"),
    )
