"""Cluster-medoid selection without a pairwise join (r11 carry-over).

For points x_i in a cluster, the medoid cost sum_j ||x_i - x_j||^2
decomposes as  n*|x_i|^2 - 2*<x_i, S> + T  with S = sum_j x_j (the
component-wise sum vector) and T = sum_j |x_j|^2 — so medoid selection
needs ONE aggregate per cluster and ONE scan, never the n^2 pair join.
On e3-quantized integer embeddings every term is an exact BIGINT, making
the argmin bit-deterministic and DuckDB-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

def _medoid_oracle() -> str:
    return """
WITH pts AS (
  SELECT label, vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
  FROM embeddings
),
normed AS (
  SELECT label, vec_id, qv,
         CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS q2
  FROM pts
),
comps AS (
  SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
  FROM (SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS pos
        FROM pts)
  GROUP BY label, pos
),
sv AS (
  SELECT label, list(s ORDER BY pos) AS svec FROM comps GROUP BY label
),
meta AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q2) AS BIGINT) AS t
  FROM normed GROUP BY label
),
costs AS (
  SELECT nm.label, nm.vec_id,
         CAST(m.n * nm.q2
              - 2 * list_sum(list_transform(list_zip(nm.qv, s.svec),
                                            z -> z[1] * z[2]))
              + m.t AS BIGINT) AS cost
  FROM normed nm
  JOIN sv s USING (label)
  JOIN meta m USING (label)
)
SELECT c.label, CAST(m.n AS BIGINT) AS n_points,
       CAST(c.vec_id AS BIGINT) AS medoid_vec_id,
       c.cost AS medoid_cost
FROM costs c JOIN meta m USING (label)
QUALIFY row_number() OVER (PARTITION BY c.label
                           ORDER BY c.cost, c.vec_id) = 1
ORDER BY c.label
"""


@register(
    "embed_cluster_medoid",
    oracle=_medoid_oracle(),
    tags=("embeddings", "similarity", "dedup", "scale"),
    doc=(
        "Exact per-label cluster medoids WITHOUT the pairwise join: "
        "sum_j ||x_i - x_j||^2 = n*|x_i|^2 - 2*<x_i, S> + T with the "
        "cluster sum vector S and norm total T from one aggregate, so "
        "selection is O(n*d) — two shuffles on the label, never n^2 "
        "pairs (the identity that makes k-medoids assignment and "
        "cluster-representative picking viable at 100 TB).  On "
        "e3-quantized integer embeddings every cost is an exact BIGINT "
        "and the (cost, vec_id) argmin is bit-deterministic; DuckDB "
        "recomputes the identical algebra.  The representative-selection "
        "step SemDeDup needs after clustering: keep the medoid, drop "
        "its neighborhood."
    ),
)
def embed_cluster_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "label",
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000, 0).cast("bigint"),
        ).alias("qv"),
    )
    normed = pts.withColumn(
        "q2",
        F.aggregate(
            F.transform("qv", lambda v: v * v),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ),
    )
    # posexplode the quantize EXPRESSION, not the aliased qv column: on a
    # plain attribute InferFiltersFromGenerate adds size(qv) > 0 and
    # pushdown substitutes the full transform onto the scan, evaluating it
    # twice per row (r11 optimization round; the rule skips expensive
    # generator inputs, SPARK-36715).
    comps = (
        emb.select(
            "label",
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.round(x.cast("double") * 1000, 0).cast(
                        "bigint"
                    ),
                )
            ).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(F.sum("v").cast("bigint").alias("s"))
    )
    sv = comps.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda r: r["s"],
        ).alias("svec")
    )
    meta = normed.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q2").cast("bigint").alias("t"),
    )
    costs = (
        normed.join(F.broadcast(sv), "label")
        .join(F.broadcast(meta), "label")
        .select(
            "label",
            "vec_id",
            "n",
            (
                F.col("n") * F.col("q2")
                - 2
                * F.aggregate(
                    F.zip_with("qv", "svec", lambda a, b: a * b),
                    F.lit(0).cast("bigint"),
                    lambda a, v: a + v,
                )
                + F.col("t")
            )
            .cast("bigint")
            .alias("cost"),
        )
    )
    w = Window.partitionBy("label").orderBy("cost", "vec_id")
    return (
        costs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "label",
            F.col("n").alias("n_points"),
            F.col("vec_id").cast("bigint").alias("medoid_vec_id"),
            F.col("cost").alias("medoid_cost"),
        )
        .orderBy("label")
    )
