"""Round-10 graph/changepoint batch.

* ``graph_local_clustering`` — per-node local clustering coefficients on
  the part co-purchase graph (the node-level refinement of
  ``graph_triangle_count``'s global census).
* ``events_changepoint_binseg`` — single-split binary segmentation of the
  daily activity series: the best between-segment sum-of-squares split,
  scored from exact integer cumulative sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Local clustering coefficients
# ---------------------------------------------------------------------------

_ORACLE_LCC = """
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
),
tnode AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY node
),
scored AS (
  SELECT d.node, d.degree,
         COALESCE(t.n_triangles, 0) AS n_triangles,
         CASE WHEN d.degree < 2 THEN 0.0
              ELSE round(2.0 * COALESCE(t.n_triangles, 0)
                         / (CAST(d.degree AS DOUBLE) * (d.degree - 1)), 6)
         END AS lcc
  FROM deg d LEFT JOIN tnode t ON t.node = d.node
)
SELECT CAST(node AS BIGINT) AS node, degree,
       CAST(n_triangles AS BIGINT) AS n_triangles, lcc
FROM scored
QUALIFY row_number() OVER (ORDER BY degree DESC, node) <= 20
ORDER BY degree DESC, node
"""


@register(
    "graph_local_clustering",
    oracle=_ORACLE_LCC,
    tags=("graph", "analytics"),
    doc=(
        "Per-node local clustering coefficient on the part co-purchase "
        "graph (same support>=2 low->high edge set as "
        "graph_triangle_count): each ordered wedge closed by a third "
        "edge-join yields one triangle (a<b<c), exploded to credit all "
        "three corners, and lcc = 2*T_v/(deg*(deg-1)) is one rational "
        "per node from exact BIGINT triangle and degree counts.  The "
        "node-level cohesion signal global triangle censuses hide — "
        "hub-with-clustered-neighborhood vs hub-as-star is THE "
        "distinction community detection needs seeded.  Top-20 by "
        "(degree, node); the wedge join is the triangle-count plan "
        "reused, so its scale story (lower-degree-endpoint capping) "
        "carries over unchanged."
    ),
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
        # eager localCheckpoint instead of persist: the edge set feeds four
        # downstream branches, and a bare persist leaked pinned blocks
        # across full-registry sweeps (ADVICE r10) — the graph_ktruss_peel
        # idiom materializes once and lets GC reap the blocks
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tnode = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    scored = deg.join(tnode, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0)
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree").cast("double") * (F.col("degree") - 1)),
                6,
            )
        )
        .alias("lcc"),
    )
    w = Window.orderBy(F.col("degree").desc(), "node")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 20)
        .select(
            F.col("node").cast("bigint").alias("node"),
            "degree",
            "n_triangles",
            "lcc",
        )
        .orderBy(F.col("degree").desc(), "node")
    )


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint (single best split)
# ---------------------------------------------------------------------------

_ORACLE_BINSEG = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
cum AS (
  SELECT d, x,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
         CAST(SUM(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS sk,
         CAST(SUM(x) OVER () AS BIGINT) AS s,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
gains AS (
  SELECT d, k, sk, s, n,
         round(CAST(sk AS DOUBLE) * sk / k
               + CAST(s - sk AS DOUBLE) * (s - sk) / (n - k)
               - CAST(s AS DOUBLE) * s / n, 6) AS gain
  FROM cum WHERE k < n
)
SELECT d AS split_day, k AS split_k, n AS n_days, sk AS left_sum,
       CAST(s - sk AS BIGINT) AS right_sum, gain,
       round(CAST(sk AS DOUBLE) / k, 6) AS left_mean,
       round(CAST(s - sk AS DOUBLE) / (n - k), 6) AS right_mean
FROM gains
QUALIFY row_number() OVER (ORDER BY gain DESC, k) = 1
"""


@register(
    "events_changepoint_binseg",
    oracle=_ORACLE_BINSEG,
    tags=("events", "timeseries", "stats"),
    doc=(
        "Binary-segmentation changepoint: the single split of the daily "
        "activity series that maximizes the between-segment "
        "sum-of-squares gain S_k^2/k + (S-S_k)^2/(n-k) - S^2/n, scanned "
        "in ONE pass over the cumulative-sum window — every S_k is an "
        "exact BIGINT and the gain is a single identical float "
        "expression per candidate (rounded e6, (gain DESC, k) "
        "tie-break), so the argmax is bit-deterministic.  Where CUSUM "
        "(events_cusum_changepoint) answers 'has drift started' online, "
        "binseg answers 'where was the level shift' offline — recursing "
        "on the two halves yields the full segmentation, each recursion "
        "the same windowed scan.  Calendar-bounded state."
    ),
)
def events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    w_ord = Window.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = daily.select(
        "d",
        F.row_number().over(w_ord).cast("bigint").alias("k"),
        F.sum("x").over(w_cum).cast("bigint").alias("sk"),
        F.sum("x").over(w_all).cast("bigint").alias("s"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    sk, s, k, n = F.col("sk"), F.col("s"), F.col("k"), F.col("n")
    gains = cum.where(k < n).select(
        "d",
        "k",
        "sk",
        "s",
        "n",
        F.round(
            sk.cast("double") * sk / k
            + (s - sk).cast("double") * (s - sk) / (n - k)
            - s.cast("double") * s / n,
            6,
        ).alias("gain"),
    )
    w_best = Window.orderBy(F.col("gain").desc(), "k")
    return (
        gains.withColumn("_rn", F.row_number().over(w_best))
        .where(F.col("_rn") == 1)
        .select(
            F.col("d").alias("split_day"),
            F.col("k").alias("split_k"),
            F.col("n").alias("n_days"),
            F.col("sk").alias("left_sum"),
            (s - sk).cast("bigint").alias("right_sum"),
            "gain",
            F.round(sk.cast("double") / k, 6).alias("left_mean"),
            F.round((s - sk).cast("double") / (n - k), 6).alias("right_mean"),
        )
    )


# ---------------------------------------------------------------------------
# k-truss decomposition (k=3) via iterative support peeling
# ---------------------------------------------------------------------------

_KTRUSS_K = 3
_KTRUSS_ROUNDS = 6  # oracle unroll depth; Spark iterates to fixpoint


def _ktruss_oracle() -> str:
    """Unrolled truss peeling: each round recounts every edge's triangle
    support inside the surviving subgraph and drops edges with support
    < k-2.  Peeling is monotone (the edge set only shrinks), so surplus
    rounds past convergence are no-ops and the fixed unroll equals the
    true k-truss whenever the fixture converges inside it (the Spark
    loop counts its rounds and raises otherwise — the k-core guard
    pattern at graph_queries.py:544)."""
    rounds = []
    prev = "c0"
    for i in range(1, _KTRUSS_ROUNDS + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT u, v FROM {prev} UNION ALL SELECT v AS u, u AS v FROM {prev}
),
c{i} AS MATERIALIZED (
  SELECT e.u, e.v
  FROM {prev} e
  JOIN d{i} a ON a.u = e.u
  JOIN d{i} b ON b.u = e.v AND b.v = a.v
  GROUP BY e.u, e.v
  HAVING COUNT(*) >= {_KTRUSS_K - 2}
)""")
        prev = f"c{i}"
    chain = ",".join(rounds)
    return f"""
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
c0 AS MATERIALIZED (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),{chain}
SELECT node, CAST(COUNT(*) AS BIGINT) AS truss_degree FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
) GROUP BY node ORDER BY node
"""


@register(
    "graph_ktruss_peel",
    oracle=_ktruss_oracle(),
    tags=("graph", "analytics"),
    doc=(
        f"{_KTRUSS_K}-truss decomposition of the part co-purchase graph "
        "(same support>=2 canonical edge set as graph_triangle_count): "
        "iteratively recount each edge's triangle support INSIDE the "
        "surviving subgraph and drop edges below k-2 until fixpoint — "
        "the edge-cohesion strengthening of k-core (every truss edge is "
        "wedged into a triangle of truss edges).  Each round is one "
        "edge-edge wedge join + a grouped support count with a "
        "localCheckpoint lineage cut; Spark runs to fixpoint and counts "
        f"its rounds, the oracle unrolls {_KTRUSS_ROUNDS} monotone "
        "rounds, and the loop raises if convergence ever exceeds the "
        "unroll so the cross-engine contract cannot silently go stale."
    ),
)
def graph_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    c = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    n_prev = c.count()
    rounds = 0
    for _ in range(64):  # safety bound far above any plausible truss depth
        d = c.unionByName(
            c.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        da = d.select(F.col("u").alias("au"), F.col("v").alias("aw"))
        db = d.select(F.col("u").alias("bu"), F.col("v").alias("bw"))
        c = (
            c.join(da, F.col("au") == F.col("u"))
            .join(db, (F.col("bu") == F.col("v")) & (F.col("bw") == F.col("aw")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("s"))
            .where(F.col("s") >= _KTRUSS_K - 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n = c.count()
        if n == n_prev:
            break
        rounds += 1
        n_prev = n
    if rounds > _KTRUSS_ROUNDS:
        raise RuntimeError(
            f"k-truss peel converged in {rounds} rounds but the DuckDB "
            f"oracle unrolls only {_KTRUSS_ROUNDS}; raise _KTRUSS_ROUNDS "
            f"to >= {rounds} so the cross-engine check stays exact"
        )
    nodes = c.select(F.col("u").alias("node")).unionByName(
        c.select(F.col("v").alias("node"))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("truss_degree")
    )
