"""Embedding-table queries: similarity search family (driver north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lit_fast import sql_matrix
from ..io import load_table
from ..operators.similarity import (
    brute_force_topk,
    centroids_per_label,
    embedding_near_dup,
    lsh_topk,
)
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_KNN = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings
           WHERE vec_id < 10
             AND list_dot_product(embedding, embedding) > 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
      WHERE list_dot_product(embedding, embedding) > 0),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_dot_product(q.qv, c.cv)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register(
    "embed_knn_bruteforce",
    oracle=_ORACLE_KNN,
    tags=("similarity", "north-star"),
    doc=(
        "Exact cosine top-5 neighbors for query vectors (vec_id < 10): "
        "broadcast nested-loop + zip_with dot product + window rank."
    ),
)
def embed_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return brute_force_topk(queries, emb, k=5)


@register(
    "embed_ann_lsh",
    oracle=None,
    tags=("similarity", "north-star", "approx"),
    doc=(
        "Approximate top-5 via random-hyperplane LSH buckets (8 planes): "
        "candidate generation is an equi-join on the bucket key — the scale "
        "path. Rows-only; recall vs brute force pinned by unit test."
    ),
)
def embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return lsh_topk(queries, emb, k=5)


_ORACLE_NEAR_DUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM e
      WHERE list_dot_product(v, v) > 0)  -- zero vectors: cosine undefined
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.u, b.u), 6) AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.u, b.u), 6) >= 0.4
"""


@register(
    "dedup_embedding_cosine",
    oracle=_ORACLE_NEAR_DUP,
    tags=("dedup", "similarity", "north-star"),
    doc=(
        "Embedding-cosine near-duplicate pairs (exact, cosine >= 0.4): both "
        "sides normalized once, each pair is a single dot product. Scale "
        "path swaps the all-pairs product for LSH-bucketed candidates."
    ),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.4)


_ORACLE_CENTROIDS = """
SELECT label,
       CAST(i - 1 AS INTEGER) AS pos,
       CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1099511627776.0) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 1099511627776.0 AS avg_component,
       COUNT(*) AS n_vectors
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, i
"""


@register(
    "embed_centroid_per_label",
    oracle=_ORACLE_CENTROIDS,
    tags=("similarity", "agg", "north-star"),
    doc=(
        "Per-label centroid components (posexplode + decimal-exact mean) — "
        "the aggregation backbone of IVF-style partitioned ANN."
    ),
)
def embed_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return centroids_per_label(emb)


@register(
    "embed_ann_ivf",
    oracle=None,
    tags=("similarity", "north-star", "approx"),
    doc=(
        "IVF ANN top-5: spherical k-means inverted lists (nlist=8, 1 Lloyd "
        "round, deterministic), probe the 2 closest lists per query, exact "
        "cosine within. Rows-only; nprobe=nlist==brute-force pinned by test."
    ),
)
def embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, k=5, nlist=8, nprobe=2, iters=1)


_ORACLE_QUANTIZE = """
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS scale
  FROM embeddings)
SELECT e.vec_id,
       CAST(floor(s.scale * 10000) AS BIGINT) AS scale_bp,
       CAST(i - 1 AS INT) AS pos,
       CASE WHEN s.scale = 0 THEN 0
            ELSE CAST(round(CAST(e.embedding[i] AS DOUBLE) / s.scale * 127)
                      AS BIGINT) END AS q_val
FROM embeddings e JOIN s USING (vec_id),
     unnest(range(1, len(e.embedding) + 1)) AS t(i)
ORDER BY e.vec_id, pos
"""


@register(
    "embed_quantize_int8",
    oracle=_ORACLE_QUANTIZE,
    tags=("embedding", "quantize", "north-star"),
    doc=(
        "Symmetric int8 quantization per embedding (the storage/ANN-speed "
        "trick: 4x smaller vectors, dot products in integer SIMD): "
        "per-vector absmax scale, values rounded to [-127, 127]. Pure "
        "JVM array lambdas — no UDF, no shuffle; the scale is emitted "
        "as floor-basis-points so no raw float crosses the oracle hash. "
        "Output is posexploded to (vec_id, scale_bp, pos, q_val) rows so "
        "the driver's pandas canonicalization (which can't hash list "
        "cells) can compare it."
    ),
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.select(
        "vec_id",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ).alias("scale"),
    )
    q = F.transform(
        "embedding",
        lambda x: F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(F.round(x.cast("double") / F.col("scale") * 127))
        .cast("long"),
    )
    return scaled.select(
        "vec_id",
        F.floor(F.col("scale") * 10000).cast("long").alias("scale_bp"),
        F.posexplode(q).alias("pos", "q_val"),
    ).orderBy("vec_id", "pos")


_ORACLE_ANN_INT8 = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q8 AS (
  -- round(unit-vector component * 127): same IEEE op order as Spark's
  -- unit_vectors + quantize_int8 (sequential-fold norm, then /nrm, *127),
  -- so the integer codes are bit-identical cross-engine
  SELECT vec_id, i - 1 AS pos,
         CAST(round(v[i] / sqrt(list_dot_product(v, v)) * 127) AS BIGINT)
           AS qv
  FROM e, unnest(range(1, len(v) + 1)) AS t(i)
),
pdot AS (
  -- exact integer dot (|qv| <= 127, 64 dims -> |pd| <= 2^20; DuckDB SUM
  -- promotes to HUGEINT, Spark folds in int64 — both exact)
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.qv * b.qv) AS pd
  FROM q8 a JOIN q8 b ON a.pos = b.pos AND a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY pd DESC, neighbor_id) AS srn
    FROM pdot) WHERE srn <= 20
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM short s
  JOIN e qe ON qe.vec_id = s.query_id
  JOIN e ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register(
    "embed_ann_int8",
    oracle=_ORACLE_ANN_INT8,
    tags=("embedding", "quantize", "ann", "north-star"),
    doc=(
        "Two-stage ANN on quantized vectors: int8 integer dot products "
        "shortlist k*4 candidates per query, exact float cosine re-ranks "
        "the shortlist. VALUE-EXACT oracle (upgraded from rows-only in r4): "
        "the int8 codes are round(unit*127) — the construction "
        "embed_quantize_int8's green oracle already proved bit-identical "
        "cross-engine — and the shortlist rule is an exact integer dot "
        "with (pd DESC, id) tie-break, so the full two-stage result "
        "is deterministic and value-verified. Recall vs the exact "
        "brute-force baseline additionally pinned in "
        "tests/test_similarity_ops.py."
    ),
)
def embed_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_int8_topk

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ann_int8_topk(queries, emb, k=5).orderBy("query_id", "rank")


# -- Signed random projection (dimensionality reduction) ----------------------

_SRP_M = 16
_FP = 1099511627776.0  # 2^40 — exact fixed-point scale shared with centroids

_ORACLE_SRP = f"""
WITH x AS (
  SELECT vec_id, i - 1 AS i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_FP}) AS BIGINT) AS xfp
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)
SELECT vec_id, CAST(j AS INT) AS proj_pos,
       CAST(SUM(xfp * (CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN 1 ELSE -1 END)) AS BIGINT) AS y_fp
FROM x, unnest(range(0, {_SRP_M})) AS u(j)
GROUP BY vec_id, j
ORDER BY vec_id, proj_pos
"""


@register(
    "embed_random_projection",
    oracle=_ORACLE_SRP,
    tags=("embedding", "similarity", "north-star"),
    doc=(
        f"Signed random projection to {_SRP_M} dims (Achlioptas/SimHash-"
        "style Johnson-Lindenstrauss reduction — the cheap front-end for "
        "ANN shortlists and LSH bucketing): a deterministic ±1 matrix "
        "derived from md5(i:j) parity, applied per row as a pure codegen "
        "zip_with/aggregate expression over a literal matrix. No UDF, no "
        "shuffle, no broadcast — the projection is embarrassingly parallel "
        "at any scale. Components are summed in exact 2^40 fixed point so "
        "the oracle compares integers, not FP roundings."
    ),
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    sign = [
        [
            1
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(_SRP_M)
    ]
    # one-parse literal matrix: see functions/lit_fast.py (r11 optimization)
    rmat = sql_matrix(sign, "BIGINT")
    xfp = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(_FP)).cast("long"),
    )
    yfp = F.transform(
        rmat,
        lambda row: F.aggregate(
            F.zip_with(F.col("_xfp"), row, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return (
        emb.withColumn("_xfp", xfp)
        .select("vec_id", F.posexplode(yfp).alias("proj_pos", "y_fp"))
        .orderBy("vec_id", "proj_pos")
    )


@register(
    "embed_ann_srp",
    tags=("embedding", "similarity", "ann", "north-star"),
    doc=(
        "Two-stage ANN via signed random projection: 32-dim JL-projected "
        "dot products shortlist k*32 candidates per query, exact float "
        "cosine re-ranks the shortlist. The projection matrix is a plan "
        "literal (no fit step, no broadcast state). Approximate -> "
        "rows-only; recall vs brute force pinned in "
        "tests/test_similarity_ops.py."
    ),
)
def embed_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_srp_topk

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ann_srp_topk(queries, emb, k=5).orderBy("query_id", "rank")


# -- Oracle-backed ANN twins (md5 cross-engine hash family) -------------------
#
# The production ANN queries above (embed_ann_lsh / embed_ann_srp / ...) use
# the murmur3 plane family — fast, but not reproducible in DuckDB, so they
# can only ever earn rows-only checks.  These twins re-express the SAME
# two algorithms (sign-bucket LSH candidate join; SRP integer-dot shortlist
# + exact re-rank) with an md5-parity projection matrix and 2^20 fixed-point
# integer arithmetic, making every intermediate — projection, bucket,
# shortlist, final rank — bit-identical across engines and the full result
# value-verifiable (the dedup_crossengine.py pattern applied to ANN).

_FP20 = 1048576.0  # 2^20: xfp<=2^20, y_fp<=64*2^20=2^26, 16-dim dot<=2^56


def _md5_sign_rows(tag: str, d: int, m: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix from md5('tag:i:j') parity —
    reproducible in any engine with md5 (the cross-engine hash family)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{tag}:{i}:{j}".encode()).hexdigest()[:8], 16)
            % 2
            == 0
            else -1
            for i in range(d)
        ]
        for j in range(m)
    ]


def _yfp_col(tag: str, d: int, m: int):
    """array<long> of m fixed-point signed projections of `embedding` —
    pure codegen zip_with/aggregate over a literal matrix (no UDF/shuffle).
    The matrix renders as ONE sql literal: per-element F.lit cost ~3 s of
    driver time per query build at m x d = 16 x 64 (r11 optimization)."""
    rmat = sql_matrix(_md5_sign_rows(tag, d, m), "BIGINT")
    xfp = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(_FP20)).cast("long"),
    )
    return F.transform(
        rmat,
        lambda row: F.aggregate(
            F.zip_with(xfp, row, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _oracle_yfp_cte(tag: str, m: int) -> str:
    """DuckDB CTEs x/y: per-(vec_id, j) fixed-point projection, md5 parity."""
    return f"""
x AS (
  SELECT vec_id, i - 1 AS i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_FP20}) AS BIGINT) AS xfp
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
y AS (
  SELECT vec_id, j,
         CAST(SUM(xfp * (CASE WHEN ('0x' || substr(md5('{tag}:'
                   || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                   1, 8))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT)
           AS y_fp
  FROM x, unnest(range(0, {m})) AS u(j)
  GROUP BY vec_id, j
)"""


_LSH_MD5_M = 8

_ORACLE_ANN_LSH_MD5 = f"""
WITH {_oracle_yfp_cte("lsh", _LSH_MD5_M)},
b AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN y_fp > 0 THEN (1::BIGINT << j) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM y GROUP BY vec_id
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM b q
  JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  JOIN e qe ON qe.vec_id = q.vec_id
  JOIN e ce ON ce.vec_id = c.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register(
    "embed_ann_lsh_md5",
    oracle=_ORACLE_ANN_LSH_MD5,
    tags=("embedding", "similarity", "ann", "north-star"),
    doc=(
        "Sign-bucket LSH ANN with a VALUE-EXACT oracle: 8 md5-parity "
        "hyperplanes in 2^20 fixed point give every vector an integer "
        "bucket (bit-identical cross-engine); candidates are an equi-join "
        "on the bucket key — the scale path, never all-pairs — and exact "
        "cosine ranks top-5 within the bucket. The md5 twin of "
        "embed_ann_lsh, built so the LSH algorithm itself (not just its "
        "row count) is oracle-verified."
    ),
)
def embed_ann_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, norm

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    yfp = _yfp_col("lsh", d, _LSH_MD5_M)
    wts = F.array(
        *[F.lit(1 << j).cast("long") for j in range(_LSH_MD5_M)]
    )
    bucket = F.aggregate(
        F.zip_with(
            yfp, wts,
            lambda y, w: F.when(y > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # unit_vectors() projects to (id, uv) only; bucket must ride along, so
    # inline the same normalize-once pattern here.  spread: the bucket
    # projection is interpreted-HOF CPU (m x d fixed-point folds per row);
    # without it the whole corpus evaluates on the single fixture input
    # partition (r11 optimization round).
    from ..operators.dedup import spread

    tmp = spread(emb, "vec_id").select(
        "vec_id",
        F.col("embedding").alias("_raw"),
        norm(F.col("embedding")).alias("_nrm"),
        bucket.alias("bucket"),
    )
    bucketed = tmp.select(
        "vec_id",
        F.transform(
            "_raw", lambda x: x.cast("double") / F.col("_nrm")
        ).alias("uv"),
        "bucket",
    )
    q = F.broadcast(
        bucketed.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("uv").alias("qv"),
            "bucket",
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("uv").alias("cv"), "bucket"
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


_SRP_MD5_M = 16
_SRP_MD5_SHORTLIST = 50

_ORACLE_ANN_SRP_MD5 = f"""
WITH {_oracle_yfp_cte("srp", _SRP_MD5_M)},
pdot AS (
  -- exact integer dot: per-component BIGINT products (|y_fp| <= 2^26, so
  -- each term <= 2^52) summed in DuckDB's HUGEINT SUM — bit-identical to
  -- Spark's int64 aggregate at any magnitude, unlike list_dot_product
  -- whose DOUBLE accumulator rounds past 2^53
  SELECT qy.vec_id AS query_id, cy.vec_id AS neighbor_id,
         SUM(qy.y_fp * cy.y_fp) AS pd
  FROM y qy JOIN y cy ON qy.j = cy.j AND qy.vec_id <> cy.vec_id
  WHERE qy.vec_id < 10
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY pd DESC, neighbor_id) AS srn
    FROM pdot
  ) WHERE srn <= {_SRP_MD5_SHORTLIST}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM short s
  JOIN e qe ON qe.vec_id = s.query_id
  JOIN e ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register(
    "embed_ann_srp_md5",
    oracle=_ORACLE_ANN_SRP_MD5,
    tags=("embedding", "similarity", "ann", "north-star"),
    doc=(
        "Two-stage SRP ANN with a VALUE-EXACT oracle: 16-dim md5-parity "
        "signed projection in 2^20 fixed point; the shortlist is the top-50 "
        "per query by INTEGER projected dot product (bit-identical "
        "cross-engine — the stage where approximation lives), then exact "
        "float cosine re-ranks to top-5. The md5 twin of embed_ann_srp: "
        "the shortlist rule is deterministic, so unlike the murmur3 "
        "variant the full two-stage result is value-verified."
    ),
)
def embed_ann_srp_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    # spread: the m x d fixed-point projection and the per-pair integer
    # dots below are interpreted-HOF CPU; without it they evaluate on the
    # single fixture input partition (r11 optimization round).
    from ..operators.dedup import spread

    proj = spread(emb, "vec_id").select(
        "vec_id", _yfp_col("srp", d, _SRP_MD5_M).alias("s")
    )
    q = F.broadcast(
        proj.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("s").alias("qs")
        )
    )
    pd_col = F.aggregate(
        F.zip_with(F.col("qs"), F.col("s"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pdot = (
        q.crossJoin(proj)  # 10 broadcast queries x corpus: shortlist stage
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), pd_col.alias("pd")
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("pd").desc(), F.col("neighbor_id")
    )
    short = (
        pdot.withColumn("srn", F.row_number().over(sw))
        .where(F.col("srn") <= _SRP_MD5_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    uv = unit_vectors(emb, "vec_id", "embedding", "vec_id", "uv")
    qe = uv.select(F.col("vec_id").alias("query_id"), F.col("uv").alias("qv"))
    ce = uv.select(
        F.col("vec_id").alias("neighbor_id"), F.col("uv").alias("cv")
    )
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


_IVF_MD5_K = 8       # inverted lists
_IVF_MD5_NPROBE = 2  # lists probed per query

# Shared oracle prefix: deterministic 2^20-fixed-point IVF build (seed
# centroids = vectors 0..7, argmax integer-dot assignment with list-id
# tie-break, exact integer floor-mean Lloyd update, re-scored dots d2).
# Used by embed_ann_ivf_md5 (single-assign + probe) and
# dedup_embedding_ivf_md5 (multi-assign pair generation).
_IVF_MD5_PREFIX_SQL = f"""
x AS (
  SELECT vec_id, i - 1 AS i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_FP20}) AS BIGINT) AS xfp
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
c0 AS (
  SELECT vec_id AS list_id, i, xfp AS cf FROM x WHERE vec_id < {_IVF_MD5_K}
),
d1 AS (
  SELECT x.vec_id, c.list_id, SUM(x.xfp * c.cf) AS dp
  FROM x JOIN c0 c ON x.i = c.i
  GROUP BY x.vec_id, c.list_id
),
a1x AS (
  SELECT vec_id, list_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, list_id) AS rn
    FROM d1) WHERE rn = 1
),
c1 AS (
  SELECT a1x.list_id, x.i,
         CAST((SUM(x.xfp) - ((SUM(x.xfp) % COUNT(*) + COUNT(*)) % COUNT(*)))
              / COUNT(*) AS BIGINT) AS cf
  FROM x JOIN a1x ON x.vec_id = a1x.vec_id
  GROUP BY a1x.list_id, x.i
),
d2 AS (
  SELECT x.vec_id, c.list_id, SUM(x.xfp * c.cf) AS dp
  FROM x JOIN c1 c ON x.i = c.i
  GROUP BY x.vec_id, c.list_id
)
"""

_ORACLE_ANN_IVF_MD5 = f"""
WITH x AS (
  SELECT vec_id, i - 1 AS i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_FP20}) AS BIGINT) AS xfp
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
c0 AS (
  SELECT vec_id AS list_id, i, xfp AS cf FROM x WHERE vec_id < {_IVF_MD5_K}
),
d1 AS (
  SELECT x.vec_id, c.list_id, SUM(x.xfp * c.cf) AS dp
  FROM x JOIN c0 c ON x.i = c.i
  GROUP BY x.vec_id, c.list_id
),
a1 AS (
  SELECT vec_id, list_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, list_id) AS rn
    FROM d1) WHERE rn = 1
),
c1 AS (
  SELECT a1.list_id, x.i,
         CAST((SUM(x.xfp) - ((SUM(x.xfp) % COUNT(*) + COUNT(*)) % COUNT(*)))
              / COUNT(*) AS BIGINT) AS cf
  FROM x JOIN a1 ON x.vec_id = a1.vec_id
  GROUP BY a1.list_id, x.i
),
d2 AS (
  SELECT x.vec_id, c.list_id, SUM(x.xfp * c.cf) AS dp
  FROM x JOIN c1 c ON x.i = c.i
  GROUP BY x.vec_id, c.list_id
),
a2 AS (
  SELECT vec_id, list_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, list_id) AS rn
    FROM d2) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, list_id) AS rn
    FROM d2 WHERE vec_id < 10) WHERE rn <= {_IVF_MD5_NPROBE}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN a2 a ON p.list_id = a.list_id
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM cand c JOIN e qe ON qe.vec_id = c.query_id
              JOIN e ce ON ce.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


def _ivf_md5_scores(emb: DataFrame) -> DataFrame:
    """Deterministic fixed-point IVF assignment scores (vec_id, list_id,
    dp): seed centroids = vectors 0..7 in 2^20 fixed point, argmax
    integer-dot assignment with list-id tie-break, one exact integer
    floor-mean Lloyd round, then the re-scored dots.  The Spark mirror of
    ``_IVF_MD5_PREFIX_SQL``; shared by embed_ann_ivf_md5 and
    dedup_embedding_ivf_md5."""
    from pyspark.sql import Window

    xfp = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * F.lit(_FP20)).cast("long"),
    )
    x = emb.select("vec_id", xfp.alias("xf"))
    dot_fp = F.aggregate(
        F.zip_with(F.col("xf"), F.col("cf"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )

    def assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
        """(vec_id, list_id, dp) for all pairs; centroids are K rows."""
        return vectors.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "list_id", dot_fp.alias("dp")
        )

    rn1 = Window.partitionBy("vec_id").orderBy(
        F.col("dp").desc(), F.col("list_id")
    )
    c0 = x.where(F.col("vec_id") < _IVF_MD5_K).select(
        F.col("vec_id").alias("list_id"), F.col("xf").alias("cf")
    )
    a1 = (
        assign(x, c0)
        .withColumn("rn", F.row_number().over(rn1))
        .where(F.col("rn") == 1)
        .select("vec_id", "list_id")
    )
    # Lloyd update: exact integer floor-mean per (list, component).
    # (s - pmod(s, n)) is divisible by n, so the double division is exact
    # (|result| << 2^53) — same construction as the oracle's % arithmetic.
    # posexplode the fixed-point EXPRESSION, not the aliased xf column: on
    # a plain attribute InferFiltersFromGenerate adds size(xf) > 0 and
    # pushdown substitutes the full transform below the join onto the scan,
    # evaluating it twice per row (r11 optimization round; the rule skips
    # expensive generator inputs, SPARK-36715).
    comp = emb.join(a1, "vec_id").select(
        "list_id", F.posexplode(xfp).alias("i", "v")
    )
    grp = comp.groupBy("list_id", "i").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    c1 = (
        grp.select(
            "list_id",
            "i",
            ((F.col("s") - F.pmod("s", "n")) / F.col("n"))
            .cast("long")
            .alias("cfv"),
        )
        .groupBy("list_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cfv"))),
                lambda p: p.cfv,
            ).alias("cf")
        )
    )
    return assign(x, c1)


@register(
    "embed_ann_ivf_md5",
    oracle=_ORACLE_ANN_IVF_MD5,
    tags=("embedding", "similarity", "ann", "north-star"),
    doc=(
        "IVF ANN with a VALUE-EXACT oracle: one deterministic Lloyd round "
        "in 2^20 fixed point (seed centroids = vectors 0..7, argmax integer "
        "dot assignment with list-id tie-break, exact integer floor-mean "
        "update) builds 8 inverted lists; queries probe their top-2 lists "
        "and exact cosine re-ranks candidates to top-5. Every stage — "
        "assignment, centroid update, probe selection — is integer "
        "arithmetic, so the full IVF structure (not just a row count) is "
        "verified cross-engine. The oracle twin of embed_ann_ivf, whose "
        "murmur3-seeded spherical k-means stays rows-only."
    ),
)
def embed_ann_ivf_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    rn1 = Window.partitionBy("vec_id").orderBy(
        F.col("dp").desc(), F.col("list_id")
    )
    d2 = _ivf_md5_scores(emb)
    a2 = (
        d2.withColumn("rn", F.row_number().over(rn1))
        .where(F.col("rn") == 1)
        .select(F.col("vec_id").alias("neighbor_id"), "list_id")
    )
    probe = (
        d2.where(F.col("vec_id") < 10)
        .withColumn("rn", F.row_number().over(rn1))
        .where(F.col("rn") <= _IVF_MD5_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "list_id")
    )
    cand = (
        F.broadcast(probe)
        .join(a2, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    uv = unit_vectors(emb, "vec_id", "embedding", "vec_id", "uv")
    qe = uv.select(F.col("vec_id").alias("query_id"), F.col("uv").alias("qv"))
    ce = uv.select(
        F.col("vec_id").alias("neighbor_id"), F.col("uv").alias("cv")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


_IVF_DEDUP_NASSIGN = 3      # lists each vector joins (multi-assignment)
_IVF_DEDUP_THRESHOLD = 0.4  # cosine near-dup cut (on the rounded value)

_ORACLE_DEDUP_IVF_MD5 = f"""
WITH {_IVF_MD5_PREFIX_SQL},
a2 AS (
  SELECT vec_id, list_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dp DESC, list_id) AS rn
    FROM d2) WHERE rn <= {_IVF_DEDUP_NASSIGN}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM a2 a JOIN a2 b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         round(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
  FROM cand c JOIN e ea ON ea.vec_id = c.vec_a
              JOIN e eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cos_sim
FROM scored WHERE cos_sim >= {_IVF_DEDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


@register(
    "dedup_embedding_ivf_md5",
    oracle=_ORACLE_DEDUP_IVF_MD5,
    tags=("similarity", "dedup", "north-star"),
    doc=(
        "Semantic near-dup via IVF lists with a VALUE-EXACT oracle (r8 "
        "verdict item 4): the deterministic fixed-point IVF build shared "
        "with embed_ann_ivf_md5 (_ivf_md5_scores — seed centroids 0..7, "
        "integer argmax assignment, exact floor-mean Lloyd round), but "
        "with MULTI-assignment (each vector joins its top-3 lists, the "
        "recall knob), then candidate pairs are vectors sharing a list "
        "(a<b, pair-distinct across lists) scored by exact cosine and "
        "cut at 0.4 on the rounded value.  Verifies the entire IVF pair "
        "generator cross-engine — the oracle twin of dedup_embedding_ivf, "
        "whose murmur3-seeded spherical k-means stays rows-only.  Scale "
        "path: pair work is ~nassign²/nlist of N² per the IVF contract; "
        "production sizes nlist to thousands."
    ),
)
def dedup_embedding_ivf_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    rn1 = Window.partitionBy("vec_id").orderBy(
        F.col("dp").desc(), F.col("list_id")
    )
    a2 = (
        _ivf_md5_scores(emb)
        .withColumn("rn", F.row_number().over(rn1))
        .where(F.col("rn") <= _IVF_DEDUP_NASSIGN)
        .select("vec_id", "list_id")
    )
    cand = (
        a2.alias("a")
        .join(
            a2.alias("b"),
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    uv = unit_vectors(emb, "vec_id", "embedding", "vec_id", "uv")
    ea = uv.select(F.col("vec_id").alias("vec_a"), F.col("uv").alias("va"))
    eb = uv.select(F.col("vec_id").alias("vec_b"), F.col("uv").alias("vb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= _IVF_DEDUP_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "embed_ann_pq",
    tags=("embedding", "quantize", "ann", "north-star"),
    doc=(
        "Two-stage ANN via product quantization + ADC: per-subspace "
        "codebooks (deterministic Lloyd), corpus compressed to nsub byte "
        "codes, per-query lookup tables broadcast so approximate scoring "
        "is an equi-join on (sub, code) plus nsub table lookups per pair "
        "— never a full-dimension product; exact cosine re-ranks the "
        "shortlist. Approximate -> rows-only; recall vs brute force "
        "pinned in tests/test_similarity_ops.py."
    ),
)
def embed_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return pq_topk(queries, emb, k=5).orderBy("query_id", "rank")


# -- PQ ANN oracle twin (fixed-point codebooks, exact ADC) --------------------

_PQ_FP_NSUB = 8    # subspaces (d=64 -> 8 dims each)
_PQ_FP_KSUB = 16   # codes per subspace codebook
_PQ_FP_SHORTLIST = 240  # k * rerank_factor, matching pq_topk's 5 * 48

_ORACLE_ANN_PQ_FP = f"""
WITH x AS (
  SELECT vec_id, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_FP20}) AS BIGINT) AS xfp
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
xs AS (SELECT vec_id, pos // 8 AS sub, pos % 8 AS r, xfp FROM x),
cb AS (
  -- codebooks = subvectors of vectors 0..{_PQ_FP_KSUB - 1} in fixed point
  SELECT vec_id AS code, sub, r, xfp AS cf FROM xs WHERE vec_id < {_PQ_FP_KSUB}
),
dist AS (
  SELECT v.vec_id, v.sub, c.code, SUM((v.xfp - c.cf) * (v.xfp - c.cf)) AS dd
  FROM xs v JOIN cb c ON v.sub = c.sub AND v.r = c.r
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id AS neighbor_id, sub, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                 ORDER BY dd ASC, code ASC) AS rn
    FROM dist) WHERE rn = 1
),
tab AS (
  -- per-query ADC lookup table: (sub, code) -> exact integer partial dot
  SELECT q.vec_id AS query_id, q.sub, c.code, SUM(q.xfp * c.cf) AS part
  FROM xs q JOIN cb c ON q.sub = c.sub AND q.r = c.r
  WHERE q.vec_id < 10
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT t.query_id, n.neighbor_id, SUM(t.part) AS adc
  FROM codes n JOIN tab t ON n.sub = t.sub AND n.code = t.code
  WHERE n.neighbor_id <> t.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc DESC, neighbor_id) AS srn
    FROM adc) WHERE srn <= {_PQ_FP_SHORTLIST}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM short s
  JOIN e qe ON qe.vec_id = s.query_id
  JOIN e ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register(
    "embed_ann_pq_fp",
    oracle=_ORACLE_ANN_PQ_FP,
    tags=("embedding", "quantize", "ann", "north-star"),
    doc=(
        "Product-quantization ANN with a VALUE-EXACT oracle: 2^20 "
        "fixed-point subvector codebooks (codes = vectors 0..15's "
        "subvectors — the deterministic seed stage of Lloyd, same trick as "
        "embed_ann_ivf_md5), corpus assigned per subspace by exact integer "
        "L2 argmin (dd ASC, code ASC tie-break), per-query ADC lookup "
        "tables of exact integer partial dots, approximate score = sum of "
        "nsub table lookups via the (sub, code) equi-join — never a "
        "full-dimension product — then exact cosine re-ranks the top-240 "
        "shortlist to top-5. Every stage is integer arithmetic, so the "
        "full PQ structure (codebooks, code assignment, ADC scores, "
        "shortlist) is verified cross-engine — the oracle twin of "
        "embed_ann_pq, whose float-Lloyd codebooks stay rows-only."
    ),
)
def embed_ann_pq_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    nsub, ksub, dsub = _PQ_FP_NSUB, _PQ_FP_KSUB, d // _PQ_FP_NSUB
    xfp = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * F.lit(_FP20)).cast("long"),
    )
    sub_arr = F.array(
        *[
            F.struct(
                F.lit(s).cast("long").alias("sub"),
                F.slice("xf", s * dsub + 1, dsub).alias("sv"),
            )
            for s in range(nsub)
        ]
    )
    xs = (
        emb.select("vec_id", xfp.alias("xf"))
        .select("vec_id", F.inline(sub_arr))
    )
    cb = xs.where(F.col("vec_id") < ksub).select(
        F.col("vec_id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    rn_code = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("dd").asc(), F.col("code").asc()
    )
    codes = (
        xs.join(F.broadcast(cb), "sub")
        .select("vec_id", "sub", "code", l2.alias("dd"))
        .withColumn("rn", F.row_number().over(rn_code))
        .where(F.col("rn") == 1)
        .select(F.col("vec_id").alias("neighbor_id"), "sub", "code")
    )
    part = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    table = (
        xs.where(F.col("vec_id") < 10)
        .join(F.broadcast(cb), "sub")
        .select(
            F.col("vec_id").alias("query_id"), "sub", "code", part.alias("part")
        )
    )
    adc = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("part").alias("adc"))
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    short = (
        adc.withColumn("srn", F.row_number().over(sw))
        .where(F.col("srn") <= _PQ_FP_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    uv = unit_vectors(emb, "vec_id", "embedding", "vec_id", "uv")
    qe = uv.select(F.col("vec_id").alias("query_id"), F.col("uv").alias("qv"))
    ce = uv.select(
        F.col("vec_id").alias("neighbor_id"), F.col("uv").alias("cv")
    )
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


# -- kNN majority-vote classification ------------------------------------------

_ORACLE_KNN_CLASSIFY = """
WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                  CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (
  SELECT q.query_id, q.true_label, c.neighbor_id, c.label,
         round(list_dot_product(q.qv, c.cv)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.neighbor_id
),
top5 AS (
  SELECT query_id, true_label, label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 5
),
votes AS (
  SELECT query_id, true_label, label, COUNT(*) AS n_votes
  FROM top5 GROUP BY 1, 2, 3
)
SELECT query_id, true_label,
       CAST(label AS BIGINT) AS pred_label,
       n_votes
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, label ASC) AS vr
  FROM votes
) WHERE vr = 1
ORDER BY query_id
"""


@register(
    "embed_knn_classify",
    oracle=_ORACLE_KNN_CLASSIFY,
    tags=("similarity", "ml", "north-star"),
    doc=(
        "kNN majority-vote label classification on top of the exact "
        "cosine top-5 (deterministic vote: count DESC, label ASC "
        "tie-break) — the label-propagation / auto-labeling primitive; "
        "swap the brute-force neighbor stage for any of the ANN shortlist "
        "paths at scale, the vote stays identical."
    ),
)
def embed_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.similarity import brute_force_topk

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    topk = brute_force_topk(queries, emb, k=5)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    qlabels = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .join(qlabels, "query_id")
        .groupBy("query_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").cast("long").alias("pred_label"),
            "n_votes",
        )
        .orderBy("query_id")
    )


@register(
    "dedup_embedding_ivf",
    oracle=None,
    tags=("similarity", "dedup", "north-star", "approx"),
    doc=(
        "Semantic near-dup at scale: candidate pairs restricted to shared "
        "IVF inverted lists (multi-assignment nassign=3 of nlist=8), exact "
        "cosine GEMM within each list, pair-distinct across lists. The "
        "approximate twin of dedup_embedding_cosine whose pair work is "
        "~nassign²/nlist of N² — the knob that makes semantic dedup "
        "feasible at 100 TB (production sizes nlist to thousands). "
        "Rows-only by design; recall >= 0.9 vs the exact operator pinned "
        "by test."
    ),
)
def dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup_ivf

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_ivf(
        emb, threshold=0.4, nlist=8, nassign=3
    ).orderBy("vec_a", "vec_b")


# -- Hard-negative mining (contrastive training-data prep) --------------------

_ORACLE_HARD_NEG = """
WITH q AS (SELECT vec_id AS query_id, CAST(label AS BIGINT) AS q_label,
                  CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, CAST(label AS BIGINT) AS n_label,
             CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (
  SELECT q.query_id, q.q_label, c.neighbor_id, c.n_label,
         round(list_dot_product(q.qv, c.cv)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE q.q_label <> c.n_label
)
SELECT query_id, q_label, neighbor_id, n_label, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


@register(
    "train_hard_negatives",
    oracle=_ORACLE_HARD_NEG,
    tags=("training", "similarity", "north-star"),
    doc=(
        "Hard-negative mining for contrastive training (anchor vectors "
        "vec_id < 20): per anchor, the top-5 most-similar vectors whose "
        "label DIFFERS — the negatives that actually move an embedding "
        "model. Same deterministic scorer as embed_knn_bruteforce "
        "(broadcast anchors, unit-vector dot, rank on (cos desc, id)); "
        "the label-mismatch filter runs before ranking so same-label "
        "near-dups never crowd the shortlist. rn<=5 gets the Partial "
        "WindowGroupLimit pushdown; at corpus scale the brute-force "
        "scorer swaps for an ANN shortlist (embed_ann_*) re-ranked "
        "exactly, label filter unchanged."
    ),
)
def train_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # labels ride through unit_vectors' passthrough — no second table
    # scan / shuffle join to reattach them
    q = unit_vectors(
        emb.where(F.col("vec_id") < 20),
        "vec_id", "embedding", "query_id", "qv",
        extra={"q_label": F.col("label").cast("long")},
    )
    c = unit_vectors(
        emb,
        "vec_id", "embedding", "neighbor_id", "cv",
        extra={"n_label": F.col("label").cast("long")},
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_label") != F.col("n_label"))
        .select(
            "query_id",
            "q_label",
            "neighbor_id",
            "n_label",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "q_label", "neighbor_id", "n_label", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    )


# -- Matryoshka truncation evaluation ----------------------------------------

_ORACLE_MRL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
full_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.qv, c.cv)
                            / (sqrt(list_dot_product(q.qv, q.qv))
                               * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                      c.neighbor_id) AS rank
    FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
  ) WHERE rank <= 5
),
trunc_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.qv[1:16], c.cv[1:16])
                            / (sqrt(list_dot_product(q.qv[1:16], q.qv[1:16]))
                               * sqrt(list_dot_product(c.cv[1:16], c.cv[1:16]))),
                            6) DESC,
                      c.neighbor_id) AS rank
    FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
  ) WHERE rank <= 5
)
SELECT f.query_id,
       CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
       CAST(5 AS BIGINT) AS k
FROM full_rank f
LEFT JOIN trunc_rank t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


@register(
    "embed_matryoshka_recall",
    oracle=_ORACLE_MRL,
    tags=("training", "similarity", "eval"),
    doc=(
        "Matryoshka truncation evaluation: per anchor (vec_id < 10), how "
        "many of the full-dimension cosine top-5 survive when vectors are "
        "truncated to their first 16 dims (MRL-style prefix) — the "
        "retrieval-quality check run before shipping truncated embeddings "
        "to a cheaper index. Both rankings use the deterministic "
        "(rounded cosine desc, id) order; overlap is a per-anchor "
        "left-join count. Bounded 10-anchor broadcast; at corpus scale "
        "the full-dim side is the existing ANN shortlist and the "
        "truncated side is the candidate index being evaluated."
    ),
)
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")

    def topk(vec_expr_df):
        # one top-k definition repo-wide: tie-break/rounding live in
        # brute_force_topk only
        return brute_force_topk(
            vec_expr_df.where(F.col("vec_id") < 10),
            vec_expr_df,
            k=5,
            id_col="vec_id",
            vec_col="vec",
        ).select("query_id", "neighbor_id")

    full = topk(emb.select("vec_id", F.col("embedding").alias("vec")))
    trunc = topk(
        emb.select("vec_id", F.slice("embedding", 1, 16).alias("vec"))
    )
    return (
        full.join(
            trunc.withColumn("_hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("n_overlap"),
            F.max(F.lit(5)).cast("long").alias("k"),
        )
        .orderBy("query_id")
    )


# -- Pair-similarity histogram (dedup-threshold calibration) ------------------

_ORACLE_SIM_HIST = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 1000),
n AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM e
      WHERE list_dot_product(v, v) > 0),  -- zero vectors: cosine undefined
pairs AS (
  SELECT round(list_dot_product(a.u, b.u), 6) AS cos_sim
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT CAST(floor((cos_sim + 1) * 10) AS BIGINT) AS bucket,
       COUNT(*) AS n_pairs,
       round(MIN(cos_sim), 6) AS min_cos,
       round(MAX(cos_sim), 6) AS max_cos
FROM pairs
GROUP BY CAST(floor((cos_sim + 1) * 10) AS BIGINT)
ORDER BY bucket
"""


@register(
    "embed_pair_sim_histogram",
    oracle=_ORACLE_SIM_HIST,
    tags=("embedding", "dedup", "eval"),
    doc=(
        "Dedup-threshold calibration: the distribution of pairwise cosine "
        "similarities (0.1-wide buckets over [-1, 1]) on a bounded sample "
        "(vec_id < 1000) — where the near-dup threshold should sit is read "
        "off this histogram's valley, BEFORE running semantic dedup on the "
        "corpus. Deliberately quadratic-on-a-sample: the audit/calibration "
        "op; production pair generation is the IVF/LSH candidate path "
        "(dedup_embedding_ivf). Same normalized-dot + round(6) contract as "
        "the dedup operators it calibrates."
    ),
)
def embed_pair_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot, unit_vectors

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    a = unit_vectors(emb, "vec_id", "embedding", "id_a", "ua")
    b = unit_vectors(emb, "vec_id", "embedding", "id_b", "ub")
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cos_sim"))
    )
    return (
        pairs.groupBy(
            F.floor((F.col("cos_sim") + 1) * 10).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.min("cos_sim"), 6).alias("min_cos"),
            F.round(F.max("cos_sim"), 6).alias("max_cos"),
        )
        .orderBy("bucket")
    )


# -- ANN recall evaluation (LSH md5 vs exact, value-exact) --------------------

_ORACLE_ANN_RECALL = f"""
WITH {_oracle_yfp_cte("lsh", _LSH_MD5_M)},
b AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN y_fp > 0 THEN (1::BIGINT << j) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM y GROUP BY vec_id
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
lsh_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos_sim
  FROM b q
  JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  JOIN e qe ON qe.vec_id = q.vec_id
  JOIN e ce ON ce.vec_id = c.vec_id
  WHERE q.vec_id < 10
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM lsh_scored) WHERE rank <= 5
),
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM e q CROSS JOIN e c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM exact_scored) WHERE rank <= 5
),
n_ann AS (
  SELECT query_id, COUNT(*) AS n FROM ann GROUP BY query_id
)
SELECT x.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COALESCE(MAX(n_ann.n), 0) AS BIGINT) AS n_ann,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_overlap,
       COUNT(a.neighbor_id) * 10000 // COUNT(*) AS recall_bp
FROM exact x
LEFT JOIN ann a
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
LEFT JOIN n_ann ON n_ann.query_id = x.query_id
GROUP BY x.query_id
ORDER BY x.query_id
"""


@register(
    "embed_ann_recall_eval",
    oracle=_ORACLE_ANN_RECALL,
    tags=("embedding", "ann", "eval", "north-star"),
    doc=(
        "ANN recall@5 evaluation, value-exact cross-engine: per anchor "
        "(vec_id < 10), how many of the exact cosine top-5 the md5-family "
        "sign-bucket LSH ANN (embed_ann_lsh_md5's exact pipeline) returns, "
        "plus the candidate count the bucket actually yielded — the "
        "index-quality report read before routing production traffic to a "
        "lossy ANN path (low n_ann = buckets too fine; low recall with "
        "full n_ann = too few planes). Both rankings share the repo-wide "
        "(rounded cosine DESC, id) tie-break so the overlap count is "
        "deterministic. The eval twin of the recall unit tests, as a "
        "registry query the driver value-verifies."
    ),
)
def embed_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    ann = embed_ann_lsh_md5(spark, sf_dir).select("query_id", "neighbor_id")
    exact = brute_force_topk(
        emb.where(F.col("vec_id") < 10), emb, k=5
    ).select("query_id", "neighbor_id")
    n_ann = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_ann"))
    return (
        exact.join(
            ann.withColumn("_hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_hit").alias("n_overlap"),
        )
        .join(n_ann, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("_n_ann", F.lit(0)).cast("long").alias("n_ann"),
            "n_overlap",
            F.expr("n_overlap * 10000 div n_exact").alias("recall_bp"),
        )
        .orderBy("query_id")
    )


# -- Centroid-distance outliers (embedding QA / OOD sweep) ---------------------

_OOD_SCALE = 65536  # 2^16 fixed-point; see overflow bound in the docstring

_ORACLE_OOD = f"""
WITH q AS (
  SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_OOD_SCALE}) AS BIGINT) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
s AS (
  SELECT label, pos, CAST(SUM(x) AS BIGINT) AS sx,
         COUNT(*) AS n
  FROM q GROUP BY 1, 2
),
d AS (
  SELECT q.vec_id, q.label,
         CAST(SUM((q.x * s.n - s.sx) * (q.x * s.n - s.sx)) AS BIGINT) AS dist_q
  FROM q JOIN s ON q.label = s.label AND q.pos = s.pos
  GROUP BY 1, 2
)
SELECT label, vec_id, dist_q FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY dist_q DESC, vec_id) AS rn
  FROM d
) WHERE rn <= 3
ORDER BY label, dist_q DESC, vec_id
"""


@register(
    "embed_outliers_centroid_dist",
    oracle=_ORACLE_OOD,
    tags=("similarity", "dq", "embedding"),
    doc=(
        "Embedding-QA outlier sweep: the 3 vectors farthest from their "
        "label's centroid, per label — the out-of-distribution / "
        "mislabeled-example detector run before embeddings feed dedup or "
        "retrieval. Distances are computed on 2^16 fixed-point components "
        "against the UNnormalized centroid as sum((n*x_i - S_i)^2) — pure "
        "BIGINT arithmetic, no float mean, so ranks are cross-engine and "
        "partitioning exact (rank-equivalent to squared L2 from the true "
        "mean, scaled by n^2). Overflow bound: 64 dims * (2n*2^16)^2 <= "
        "2^63 holds to n~2900 per label; at real scale swap the quantized "
        "score for float distance-to-centroid (rows-only determinism) or "
        "raise to DECIMAL(38,0) sums — same two-aggregate plan: one "
        "(label,pos) sum, one per-vec reduce, top-k per label via "
        "WindowGroupLimit (few labels, map-side partial limit)."
    ),
)
def embed_outliers_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("xf").cast("double") * _OOD_SCALE).cast("long").alias("x"),
    )
    s = q.groupBy("label", "pos").agg(
        F.sum("x").cast("long").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    d = (
        q.join(s, ["label", "pos"])
        .select(
            "vec_id",
            "label",
            ((F.col("x") * F.col("n") - F.col("sx"))
             * (F.col("x") * F.col("n") - F.col("sx"))).alias("sq"),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("sq").cast("long").alias("dist_q"))
    )
    w = Window.partitionBy("label").orderBy(F.col("dist_q").desc(), "vec_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("label", "vec_id", "dist_q")
        .orderBy("label", F.col("dist_q").desc(), "vec_id")
    )


_ORACLE_COVARIANCE = """
WITH q AS (
  SELECT vec_id, i - 1 AS i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS HUGEINT)
           AS qx
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
cross_m AS (
  SELECT a.i AS i, b.i AS j,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(a.qx * b.qx) AS sxy
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
),
marg AS (SELECT i, SUM(qx) AS sx FROM q GROUP BY i)
SELECT c.i, c.j,
       round(CAST(c.n * c.sxy - mi.sx * mj.sx AS DOUBLE)
             / 1099511627776.0
             / CAST(c.n AS DOUBLE) / CAST(c.n AS DOUBLE), 8) AS cov
FROM cross_m c JOIN marg mi ON c.i = mi.i JOIN marg mj ON c.j = mj.i
ORDER BY c.i, c.j
"""


@register(
    "embed_covariance_matrix",
    oracle=_ORACLE_COVARIANCE,
    tags=("similarity", "agg", "scale"),
    doc=(
        "Exact embedding covariance matrix "
        "(operators/similarity.py: gram_covariance): components "
        "fixed-pointed (floor(x * 2^20) — float->double widening and "
        "power-of-two scaling are lossless), all moments summed as exact "
        "decimal(38,0)/HUGEINT integers, one float division per output "
        "cell — bit-reproducible across engines where naive double "
        "accumulation would be order-dependent. dim^2 output rows "
        "regardless of N; the statistics tree-reduce (map-side partial "
        "aggregation), which is how the same pass runs at 100 TB (the "
        "docstring notes the mapInPandas X^T X Gram-block twin). Feeds "
        "embed_pca_whitening."
    ),
)
def embed_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import gram_covariance

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return gram_covariance(emb)


@register(
    "embed_pca_whitening",
    oracle=None,
    tags=("similarity", "ml", "scale"),
    doc=(
        "PCA whitening to 8 components "
        "(operators/similarity.py: pca_whiten): covariance aggregated "
        "distributed (embed_covariance_matrix's exact path), dim x dim "
        "eigendecomposition on the driver (the bounded-state collect "
        "pattern — a few KB regardless of N), whitening matrix broadcast "
        "into an Arrow-batched mapInPandas GEMM. Deterministic "
        "eigenvector sign convention. Rows-only: eigen-solves are not "
        "SQL-expressible; identity-covariance and decorrelation "
        "properties pinned in tests/test_similarity_ops.py."
    ),
)
def embed_pca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pca_whiten

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_whiten(emb, n_components=8)


_PCA_FP_D = 8      # leading dims (matches pca_whiten's n_components=8)
_PCA_FP_QS = 256.0  # 2^8 quantization (exact exponent shift)
_PCA_FP_VS = 65536  # rescale target between power rounds

# portable FLOOR division for signed BIGINTs: (x - pmod(x, s)) / s is exact
# in both engines (Spark `div` truncates toward zero, DuckDB `//` differs on
# negatives — the pmod construction sidesteps both).
def _floordiv_sql(x: str, s: str) -> str:
    return f"CAST(({x} - ((({x}) % ({s}) + ({s})) % ({s}))) / ({s}) AS BIGINT)"


_ORACLE_PCA_FP = f"""
WITH pts AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
         CAST(floor((greatest(least(CAST(embedding[i] AS DOUBLE), 8.0), -8.0)
                     + 1.0) * {_PCA_FP_QS}) AS BIGINT) AS qv
  FROM embeddings, unnest(range(1, {_PCA_FP_D} + 1)) AS t(i)
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
mu AS (SELECT pos, SUM(qv) AS s FROM pts GROUP BY pos),
c AS (  -- centered, floor((N*qv - S)/N): bounded +-512 at ANY corpus size
  SELECT p.vec_id, p.pos,
         {_floordiv_sql("n.n * p.qv - m.s", "n.n")} AS cv
  FROM pts p JOIN mu m ON m.pos = p.pos CROSS JOIN n
),
a AS (
  SELECT c1.pos AS i, c2.pos AS j, SUM(c1.cv * c2.cv) AS aij
  FROM c c1 JOIN c c2 ON c1.vec_id = c2.vec_id
  GROUP BY c1.pos, c2.pos
),
u1 AS (SELECT i, SUM(aij) AS u FROM a GROUP BY i),
s1 AS (SELECT MAX(abs(u)) // {_PCA_FP_VS} + 1 AS s
       FROM u1),
v1 AS (SELECT i, {_floordiv_sql("u", "s")} AS v FROM u1, s1),
u2 AS (
  SELECT a.i, SUM(a.aij * v1.v) AS u
  FROM a JOIN v1 ON a.j = v1.i
  GROUP BY a.i
),
s2 AS (SELECT MAX(abs(u)) // {_PCA_FP_VS} + 1 AS s
       FROM u2),
v2 AS (SELECT i, {_floordiv_sql("u", "s")} AS v FROM u2, s2)
SELECT c.vec_id, CAST(SUM(c.cv * v2.v) AS BIGINT) AS proj
FROM c JOIN v2 ON v2.i = c.pos
GROUP BY c.vec_id
ORDER BY c.vec_id
"""


@register(
    "embed_pca_whitening_fp",
    oracle=_ORACLE_PCA_FP,
    tags=("embedding", "ml", "north-star"),
    doc=(
        "Fixed-point cross-engine twin of embed_pca_whitening (r8 verdict "
        "item 4): the distributed PCA pipeline — exact integer CENTERING "
        "(floor((N*qv - S)/N), bounded +-512 at any corpus size), "
        "dimension-bounded integer Gram over the leading 8 dims (one "
        "map-side-combinable aggregate, 64 cells), two power-iteration "
        "rounds with max-rescaling, then the per-vector projection GEMM "
        "onto the dominant centered direction — verified value-exact in "
        "BIGINT (worst-case bound 8*N*2^18*2^16 < 2^63 up to N~2^26 "
        "vectors).  Signed floor-divs use the pmod construction so Spark "
        "div and DuckDB // agree on negatives.  Only the final dim x dim "
        "driver-side eigh + sqrt of the real operator (similarity."
        "pca_whiten) is outside SQL's reach; it stays pinned by "
        "tests/test_similarity_ops.py identity-covariance properties."
    ),
)
def embed_pca_whitening_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pts = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .where(F.col("pos") < _PCA_FP_D)
        .select(
            "vec_id",
            "pos",
            # clamp to +-8 first: embeddings are unit-ish by contract, but
            # a wild component (float32 extremes, r9 fixture) must degrade
            # to a saturated quantile, not overflow the BIGINT cast
            F.floor(
                (
                    F.greatest(
                        F.least(F.col("val").cast("double"), F.lit(8.0)),
                        F.lit(-8.0),
                    )
                    + F.lit(1.0)
                )
                * F.lit(_PCA_FP_QS)
            )
            .cast("long")
            .alias("qv"),
        )
    )
    n_row = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    mu = pts.groupBy("pos").agg(F.sum("qv").alias("s"))

    def floordiv(x, s):
        return ((x - F.pmod(x, s)) / s).cast("long")

    c = (
        pts.join(F.broadcast(mu), "pos")
        .crossJoin(F.broadcast(n_row))
        .select(
            "vec_id",
            "pos",
            floordiv(F.col("n") * F.col("qv") - F.col("s"), F.col("n")).alias(
                "cv"
            ),
        )
    )
    c2 = c.select(
        "vec_id", F.col("pos").alias("j"), F.col("cv").alias("cj")
    )
    a = (
        c.join(c2, "vec_id")
        .groupBy(F.col("pos").alias("i"), "j")
        .agg(F.sum(F.col("cv") * F.col("cj")).alias("aij"))
        .localCheckpoint(eager=True)  # reused by both power rounds
    )
    u1 = a.groupBy("i").agg(F.sum("aij").alias("u"))
    s1 = u1.agg(
        (F.expr(f"max(abs(u)) div {_PCA_FP_VS}") + 1).alias("s")
    )
    v1 = u1.crossJoin(F.broadcast(s1)).select(
        "i", floordiv(F.col("u"), F.col("s")).alias("v")
    )
    u2 = (
        a.join(F.broadcast(v1.withColumnRenamed("i", "j")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("aij") * F.col("v")).alias("u"))
    )
    s2 = u2.agg(
        (F.expr(f"max(abs(u)) div {_PCA_FP_VS}") + 1).alias("s")
    )
    v2 = u2.crossJoin(F.broadcast(s2)).select(
        F.col("i").alias("pos"), floordiv(F.col("u"), F.col("s")).alias("v")
    )
    return (
        c.join(F.broadcast(v2), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("cv") * F.col("v")).cast("long").alias("proj"))
        .orderBy("vec_id")
    )


_ORACLE_CLIP_PAIR = """
WITH img AS (SELECT vec_id AS img_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings WHERE vec_id < 250),
txt AS (SELECT vec_id - 250 AS img_id, vec_id AS txt_id,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= 250)
SELECT i.img_id, t.txt_id,
       round(list_dot_product(i.v, t.v)
             / (sqrt(list_dot_product(i.v, i.v))
                * sqrt(list_dot_product(t.v, t.v))), 6) AS cos_sim
FROM img i JOIN txt t USING (img_id)
WHERE round(list_dot_product(i.v, t.v)
            / (sqrt(list_dot_product(i.v, i.v))
               * sqrt(list_dot_product(t.v, t.v))), 6) >= 0.0
ORDER BY img_id
"""


@register(
    "multimodal_clip_pair_filter",
    oracle=_ORACLE_CLIP_PAIR,
    tags=("multimodal", "similarity", "north-star"),
    doc=(
        "CLIP-score pair gating, the LAION-style multimodal curation "
        "step: each (image, caption) PAIR — not all-pairs — scores one "
        "cosine between its two modality embeddings and survives iff "
        "score >= threshold. Pairs come from an equi-join on the shared "
        "example id (here synthesized as vec_id / vec_id+250 halves of "
        "the embeddings fixture standing in for the two encoder "
        "outputs), so the plan is ONE co-partitioned join + a zip_with "
        "dot product per row: O(pairs), embarrassingly parallel, no "
        "similarity index needed. Threshold 0.0 (random-vector cosines "
        "center on 0, so the gate bites ~half the fixture)."
    ),
)
def multimodal_clip_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    img = emb.where(F.col("vec_id") < 250).select(
        F.col("vec_id").alias("img_id"), to_d.alias("iv")
    )
    txt = emb.where(F.col("vec_id") >= 250).select(
        (F.col("vec_id") - 250).alias("img_id"),
        F.col("vec_id").alias("txt_id"),
        to_d.alias("tv"),
    )
    cos = F.round(
        dot(F.col("iv"), F.col("tv"))
        / (
            F.sqrt(dot(F.col("iv"), F.col("iv")))
            * F.sqrt(dot(F.col("tv"), F.col("tv")))
        ),
        6,
    )
    return (
        img.join(txt, "img_id")
        .select("img_id", "txt_id", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.0)
        .orderBy("img_id")
    )


# With k a bounded constant the Gonzalez recursion unrolls into SQL: each
# step is one (farthest point, its radius) argmax over the previous relaxed
# distances plus one least() relax against the new center.  Euclidean
# distance mirrors the Spark fold exactly — list_sum over the zipped
# squared-diff list is the same sequential accumulation as
# F.aggregate(zip_with(...), 0.0, acc+x) (verified bit-for-bit), and ties
# break (max d, min id) on both engines.
_KCENTER_K = 8
_KC_EUCLID = (
    "sqrt(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))))"
)


def _kcenter_oracle() -> str:
    steps = []
    for m in range(1, _KCENTER_K):
        prev = f"d{m - 1}"
        relax = _KC_EUCLID.format(a="s.v", b=f"(SELECT v FROM f{m})")
        steps.append(f"""
f{m} AS MATERIALIZED (
  SELECT id, d, v FROM {prev} ORDER BY d DESC, id LIMIT 1
),
d{m} AS MATERIALIZED (
  SELECT s.id, s.v, least(s.d, {relax}) AS d FROM {prev} s
)""")
    d0 = _KC_EUCLID.format(a="s.v", b="(SELECT v FROM c0)")
    rows = "\n  UNION ALL\n  ".join(
        f"SELECT {m} AS center_order, (SELECT id FROM f{m}) AS vec_id, "
        f"(SELECT round(d, 6) FROM f{m}) AS radius"
        for m in range(1, _KCENTER_K)
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS MATERIALIZED (SELECT id, v FROM src ORDER BY id LIMIT 1),
d0 AS MATERIALIZED (
  SELECT s.id, s.v, {d0} AS d FROM src s
),{",".join(steps)}
SELECT * FROM (
  SELECT 0 AS center_order, (SELECT id FROM c0) AS vec_id,
         CAST(NULL AS DOUBLE) AS radius
  UNION ALL
  {rows}
) ORDER BY center_order
"""


@register(
    "sample_coreset_kcenter",
    oracle=_kcenter_oracle(),
    tags=("sampling", "similarity", "ml"),
    doc=(
        "Greedy k-center coreset (Gonzalez 2-approximation, k=8): start "
        "from the lowest vec_id, then repeatedly promote the point "
        "farthest from its nearest chosen center (ties -> lowest id) and "
        "relax every point's nearest-center distance against the new "
        "center — the diversity-sampling primitive for data selection "
        "and k-means++-style seeding. Iterative-algorithm pattern: k "
        "bounded driver iterations, each ONE distributed pass (broadcast "
        "center vector, zip_with euclidean, running least()); state on "
        "the driver is k vectors. The bounded k makes the argmax "
        "recursion unrollable in SQL (r6 verdict item 4); radii rounded "
        "6dp, ties pinned to the lowest id on both engines; "
        "2-approximation property pinned in tests/test_similarity_ops.py."
    ),
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kcenter_greedy

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, k=8)


# -- clustering quality: centroid silhouette ------------------------------------

_ORACLE_SILHOUETTE = """
WITH comp AS MATERIALIZED (
  SELECT label, i,
         CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE)
                             * 1099511627776.0) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1099511627776.0 AS c
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  GROUP BY label, i
),
cent AS MATERIALIZED (
  SELECT label AS clabel, list(c ORDER BY i) AS cv FROM comp GROUP BY label
),
vecs AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dist AS (
  SELECT vecs.vec_id, vecs.label, cent.clabel,
         sqrt(list_sum(list_transform(list_zip(vecs.v, cent.cv),
                                      p -> (p[1] - p[2]) * (p[1] - p[2]))))
           AS d
  FROM vecs, cent
),
ab AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clabel = label THEN d END) AS a,
         MIN(CASE WHEN clabel <> label THEN d END) AS b
  FROM dist GROUP BY vec_id, label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(floor((b - a) / greatest(a, b) * 1000000000.0)
                           AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000000.0, 6) AS mean_silhouette
FROM ab GROUP BY label
ORDER BY label
"""


@register(
    "embed_silhouette_labels",
    oracle=_ORACLE_SILHOUETTE,
    tags=("similarity", "ml", "eval"),
    doc=(
        "Centroid-based (simplified) silhouette score per cluster — the "
        "O(n*k) clustering-quality audit (full silhouette is O(n^2) and "
        "never runs at corpus scale): a = distance to own centroid, b = "
        "nearest other centroid, s = (b-a)/max(a,b), averaged per label. "
        "Plan: decimal-exact centroids (one posexplode aggregate), tiny "
        "centroid table broadcast-cross-joined against the vectors (n x k "
        "rows), per-row sequential zip_with fold for the distance (bit-"
        "identical to DuckDB's list fold), per-vector a/b via conditional "
        "MAX/MIN, and the final mean in 1e-9 fixed point so no order-"
        "dependent float summation crosses the oracle."
    ),
)
def embed_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import centroids_per_label

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cent = (
        centroids_per_label(emb)
        .groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "avg_component"))
                ),
                lambda s: s.avg_component,
            ).alias("cv")
        )
    )
    vecs = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    d = F.sqrt(
        F.aggregate(
            F.zip_with("v", "cv", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dist = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "clabel", d.alias("d")
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias(
            "b"
        ),
    )
    s_e9 = F.floor(
        (F.col("b") - F.col("a"))
        / F.greatest(F.col("a"), F.col("b"))
        * 1000000000.0
    ).cast("bigint")
    return (
        ab.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(s_e9).cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000000.0),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


# -- DBSCAN over the cosine near-dup graph (r9) --------------------------------

_DBSCAN_THRESHOLD = 0.4  # neighbor = cosine >= threshold (rounded, as near_dup)
_DBSCAN_MIN_PTS = 3      # |N_eps(p)| >= min_pts counting p itself => core

_ORACLE_DBSCAN = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM e WHERE list_dot_product(v, v) > 0),
p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.u, b.u), 6) >= {_DBSCAN_THRESHOLD}
),
sym AS (SELECT va AS a, vb AS b FROM p UNION ALL SELECT vb, va FROM p),
deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
core AS (SELECT a FROM deg WHERE deg >= {_DBSCAN_MIN_PTS} - 1),
ce AS (
  SELECT s.a, s.b FROM sym s
  JOIN core ca ON ca.a = s.a
  JOIN core cb ON cb.a = s.b
),
reach(sn, m) AS (
  SELECT a, a FROM core
  UNION
  SELECT r.sn, c.b FROM reach r JOIN ce c ON c.a = r.m
),
labels AS (SELECT sn AS node, MIN(m) AS cluster_id FROM reach GROUP BY sn),
border AS (
  SELECT s.a AS node, MIN(l.cluster_id) AS cluster_id
  FROM sym s
  JOIN labels l ON l.node = s.b
  WHERE s.a NOT IN (SELECT a FROM core)
  GROUP BY s.a
)
SELECT emb.vec_id,
       CASE WHEN lc.cluster_id IS NOT NULL THEN 'core'
            WHEN lb.cluster_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(lc.cluster_id, lb.cluster_id) AS cluster_id
FROM embeddings emb
LEFT JOIN labels lc ON lc.node = emb.vec_id
LEFT JOIN border lb ON lb.node = emb.vec_id
ORDER BY emb.vec_id
"""


@register(
    "embed_dbscan_cosine",
    oracle=_ORACLE_DBSCAN,
    tags=("similarity", "dedup", "graph", "clustering"),
    doc=(
        "DBSCAN (Ester et al. 1996) over the embedding corpus with the "
        "cosine>=0.4 near-dup relation as the eps-neighborhood — the "
        "density-based clustering companion to embed_kmeans_lloyd "
        "(no k to pick, arbitrary cluster shapes, and an explicit NOISE "
        "verdict, which on an LLM corpus is exactly the dedup read: "
        "clusters = duplicate nests, noise = unique content). "
        f"Core iff |N(p)| >= {_DBSCAN_MIN_PTS} counting itself; clusters "
        "= connected components over core-core edges (the O(diameter) "
        "min-label propagation from operators/dedup.py, isolated cores "
        "kept as singleton clusters); border points attach to the MIN "
        "core-neighbor cluster (deterministic where the textbook's "
        "first-visitor assignment is run-order dependent); everything "
        "else, zero vectors included, is noise. Scale shape: the "
        "neighbor join is the pluggable generator — exact blocked GEMM "
        "here, the IVF/LSH candidate generators at 100 TB — and the "
        "rest is degree counting + CC, both shuffle-bounded by the "
        "pair count. Oracle: recursive-CTE components over the "
        "identical pair set."
    ),
)
def embed_dbscan_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components
    from ..operators.similarity import embedding_near_dup

    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup(
        emb, threshold=_DBSCAN_THRESHOLD
    ).select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")).persist()
    sym = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.where(F.col("deg") >= _DBSCAN_MIN_PTS - 1).select("a").persist()
    ce = (
        sym.join(core.withColumnRenamed("a", "ca"), sym.a == F.col("ca"))
        .join(core.withColumnRenamed("a", "cb"), sym.b == F.col("cb"))
        .select("a", "b")
    )
    cc = connected_components(ce, a_col="a", b_col="b").select(
        F.col("doc_id").alias("node"), "cluster_id"
    )
    # isolated cores (no core neighbor) are singleton clusters
    labels = cc.unionByName(
        core.join(cc, core.a == cc.node, "left_anti").select(
            F.col("a").alias("node"), F.col("a").alias("cluster_id")
        )
    ).persist()
    border = (
        sym.join(labels, sym.b == labels.node)
        .join(core.withColumnRenamed("a", "c2"), sym.a == F.col("c2"), "left_anti")
        .groupBy(sym.a.alias("node"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    lc = labels.withColumnRenamed("cluster_id", "cl_core")
    lb = border.withColumnRenamed("cluster_id", "cl_border").withColumnRenamed(
        "node", "bnode"
    )
    return (
        emb.select("vec_id")
        .join(lc, emb.vec_id == lc.node, "left")
        .join(lb, emb.vec_id == lb.bnode, "left")
        .select(
            "vec_id",
            F.when(F.col("cl_core").isNotNull(), "core")
            .when(F.col("cl_border").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cl_core", "cl_border").alias("cluster_id"),
        )
        .orderBy("vec_id")
    )
