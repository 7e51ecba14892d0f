"""Round-10 retrieval/similarity operators.

* ``eval_rbo_rankings`` — Rank-Biased Overlap (Webber et al. 2010)
  between two document rankers, with the p^(d-1)/d weights carried as
  shared literals and every overlap an exact integer, so the truncated
  RBO sum is order-independent fixed-point.
* ``dedup_tf_cosine_pairs`` — sparse term-frequency cosine similarity
  pairs through a df-capped posting-list join (the lexical sibling of
  the dense ``dedup_embedding_cosine``): integer dot products, an
  integer-exact cosine^2 prefilter, and ONE final sqrt per surviving
  pair.

Reference scope: [EXT] LLM-pipeline surface (SURVEY §6 dedup/retrieval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Rank-Biased Overlap between two rankers
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 10
_RBO_TERMS = ("data", "merge")

#: e12 fixed-point of p^(d-1)/d for d = 1..DEPTH, computed ONCE in Python
#: (correctly-rounded IEEE double ops) and embedded as literals in BOTH
#: engines — the weights never cross the engine boundary as arithmetic.
_RBO_W_E12 = [
    int(round(_RBO_P ** (d - 1) / d * 1_000_000_000_000))
    for d in range(1, _RBO_DEPTH + 1)
]


def _rbo_oracle() -> str:
    w_rows = ", ".join(
        f"({d}, {w})" for d, w in enumerate(_RBO_W_E12, start=1)
    )
    terms = ", ".join(f"'{t}'" for t in _RBO_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE w IN ({terms}) GROUP BY doc_id, w
),
df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS score_a,
         CAST(SUM(tf.tf * (n.n_docs - df.df)) AS BIGINT) AS score_b
  FROM tf JOIN df USING (w), n
  GROUP BY tf.doc_id
),
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_a DESC, doc_id) AS rn
  FROM scored QUALIFY rn <= {_RBO_DEPTH}
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_b DESC, doc_id) AS rn
  FROM scored QUALIFY rn <= {_RBO_DEPTH}
),
depths(d, w_e12) AS (VALUES {w_rows}),
ovl AS (
  SELECT dp.d, dp.w_e12,
         CAST(COUNT(rb.doc_id) AS BIGINT) AS ov
  FROM depths dp
  LEFT JOIN ra ON ra.rn <= dp.d
  LEFT JOIN rb ON rb.doc_id = ra.doc_id AND rb.rn <= dp.d
  GROUP BY dp.d, dp.w_e12
)
SELECT CAST(SUM(CASE WHEN d = {_RBO_DEPTH} THEN ov END) AS BIGINT)
         AS overlap_at_k,
       CAST(SUM(w_e12 * ov) AS BIGINT) AS rbo_sum_e12,
       round((1.0 - {_RBO_P}) * CAST(SUM(w_e12 * ov) AS DOUBLE) / 1e12, 6)
         AS rbo
FROM ovl
"""


@register(
    "eval_rbo_rankings",
    oracle=_rbo_oracle(),
    tags=("eval", "retrieval"),
    doc=(
        "Rank-Biased Overlap (p=0.9, depth 10) between two document "
        "rankers — raw term-frequency vs rarity-weighted tf*(N-df), both "
        "integer scores with doc_id tie-breaks so the rankings are "
        "deterministic.  The p^(d-1)/d weights are e12 fixed-point "
        "literals computed once and shared by both engines, each depth's "
        "overlap is an exact COUNT through a 10-row depth spine, and the "
        "truncated RBO sum is an order-independent BIGINT before the one "
        "final float.  THE comparator for ranker changes: top-weighted, "
        "handles non-conjoint lists, and here bit-reproducible — how a "
        "retrieval pipeline proves a scorer swap is benign."
    ),
)
def eval_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w").isin(*_RBO_TERMS))
    tf = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(F.broadcast(n), F.lit(True), "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("score_a"),
            F.sum(F.col("tf") * (F.col("n_docs") - F.col("df")))
            .cast("bigint")
            .alias("score_b"),
        )
    )
    # global top-10 windows: bounded by construction (depth 10), and the
    # TakeOrdered plan shape keeps them single-pass
    wa = Window.orderBy(F.col("score_a").desc(), "doc_id")
    wb = Window.orderBy(F.col("score_b").desc(), "doc_id")
    ra = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= _RBO_DEPTH)
        .select("doc_id", F.col("rn").alias("rn_a"))
    )
    rb = (
        scored.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") <= _RBO_DEPTH)
        .select("doc_id", F.col("rn").alias("rn_b"))
    )
    both = ra.join(rb, "doc_id")  # <= depth rows
    depths = spark.createDataFrame(
        list(zip(range(1, _RBO_DEPTH + 1), _RBO_W_E12)), "d int, w_e12 bigint"
    )
    overlaps = (
        depths.join(
            F.broadcast(both),
            (F.col("rn_a") <= F.col("d")) & (F.col("rn_b") <= F.col("d")),
            "left",
        )
        .groupBy("d", "w_e12")
        .agg(F.count("doc_id").cast("bigint").alias("ov"))
    )
    return overlaps.agg(
        F.sum(F.when(F.col("d") == _RBO_DEPTH, F.col("ov")))
        .cast("bigint")
        .alias("overlap_at_k"),
        F.sum(F.col("w_e12") * F.col("ov")).cast("bigint").alias("rbo_sum_e12"),
        F.round(
            F.lit(1.0 - _RBO_P)
            * F.sum(F.col("w_e12") * F.col("ov")).cast("double")
            / F.lit(1e12),
            6,
        ).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# Sparse trigram-TF cosine pairs (fraction-df-capped posting join)
# ---------------------------------------------------------------------------

#: keep a trigram shingle only if df <= min(N/20, 64): the FRACTION term
#: adapts to small corpora, the ABSOLUTE ceiling bounds posting work
#: sum(df^2) linearly at scale — the r10b probe measured the pure
#: fraction cap bending superlinear at x16 (31 s, SCALE_PROBE_r10b)
#: because 20*df <= N admits linearly growing absolute df; the ceiling
#: is the jaccard_pairs_capped absolute-regime lesson applied here.
#: Both terms are integer-exact in both engines.
_TFCOS_CAP_MULT = 20
_TFCOS_ABS_CAP = 64
_TFCOS_MIN_COS = 0.5


def _tfcos_oracle() -> str:
    return f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
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
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
kept AS (
  SELECT tf.* FROM tf
  JOIN (SELECT g FROM tf, n GROUP BY g, n.n_docs
        HAVING {_TFCOS_CAP_MULT} * COUNT(*) <= n.n_docs
           AND COUNT(*) <= {_TFCOS_ABS_CAP}) c
    USING (g)
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sim AS (
  SELECT d.doc_a, d.doc_b, d.dot, na.n2 AS n2_a, nb.n2 AS n2_b
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
  WHERE 4 * d.dot * d.dot >= na.n2 * nb.n2  -- integer-exact cos^2 >= 1/4
)
SELECT doc_a, doc_b, dot, n2_a, n2_b,
       round(CAST(dot AS DOUBLE)
             / sqrt(CAST(n2_a AS DOUBLE) * CAST(n2_b AS DOUBLE)), 6)
         AS cosine
FROM sim
WHERE CAST(dot AS DOUBLE)
      / sqrt(CAST(n2_a AS DOUBLE) * CAST(n2_b AS DOUBLE)) >= {_TFCOS_MIN_COS}
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_tf_cosine_pairs",
    oracle=_tfcos_oracle(),
    tags=("dedup", "similarity", "north-star"),
    doc=(
        "Sparse TRIGRAM-tf cosine near-dup pairs: word-trigram frequency "
        "vectors, a df cap min(N/20, 64) — fraction term for small corpora, "
        "ABSOLUTE ceiling bounding sum(df^2) linearly at scale (the "
        "jaccard capped-generator regime lesson, probe-measured) — "
        "dropping boilerplate "
        "shingles BEFORE the posting-list equi-join — posting work is "
        "sum(df^2) over cold shingles, never |docs|^2 — integer dot "
        "products, an integer 4*dot^2 >= n2_a*n2_b prefilter that kills "
        "sub-threshold pairs with NO float, and exactly one sqrt per "
        "surviving pair.  The weighted-lexical sibling of "
        "dedup_ngram_jaccard (set overlap) and dedup_embedding_cosine "
        "(dense): repeated-phrase near-dups rank differently under tf "
        "weighting than under set semantics.  Norms use the FULL trigram "
        "vector; the cap only prunes candidate generation (disclosed)."
    ),
)
def dedup_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import spread

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    # spread: the trigram explode is per-row CPU; without the repartition it
    # runs on the single fixture input partition (r11 optimization round).
    ws = spread(docs, "doc_id").select(
        "doc_id", F.split("text", " ").alias("w")
    ).where(
        F.size("w") >= 3  # sequence(1, 0) is DESCENDING in Spark — guard
    )
    big = ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1),"
                " ' ', element_at(w, i + 2)))"
            )
        ).alias("g"),
    )
    # localCheckpoint: norms, the df cap and BOTH posting sides re-derive
    # from tf; materializing it keeps the corpus-scale trigram pass at ONE
    # execution instead of four (r11 optimization round).  localCheckpoint
    # (not persist) so blocks release when the plan is GC'd.
    tf = big.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=True)
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cold = (
        tf.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n), F.lit(True), "left")
        .where(
            (_TFCOS_CAP_MULT * F.col("df") <= F.col("n_docs"))
            & (F.col("df") <= _TFCOS_ABS_CAP)
        )
        .select("g")
    )
    kept = tf.join(cold, "g")
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "g", F.col("tf").alias("tf_a")
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "g", F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    sim = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(
            4 * F.col("dot") * F.col("dot") >= F.col("n2_a") * F.col("n2_b")
        )
    )
    cosine = F.col("dot").cast("double") / F.sqrt(
        F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
    )
    return (
        sim.where(cosine >= _TFCOS_MIN_COS)
        .select(
            "doc_a",
            "doc_b",
            "dot",
            "n2_a",
            "n2_b",
            F.round(cosine, 6).alias("cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )
