"""Graph analytics over the star schema: fixed-point PageRank.

Complements ``dedup_cluster_components`` (min-label connected components)
with the other canonical iterative-join-aggregate graph workload.  The graph
is the bipartite customer↔part purchase graph derived from
``orders ⋈ lineitem`` (distinct pairs, both directions), so node influence
reflects purchase co-occurrence — the "important entity" ranking a
recommendation pipeline would bootstrap from.

Determinism contract (cross-engine exactness): ranks are 1e9-scaled
integers and every per-edge contribution is ``(85 * rank) div (100 *
outdeg)`` — floor division on BIGINTs — so iteration results are
bit-identical in any engine and under any partitioning/summation order.
(Float PageRank would hash-mismatch from summation order alone.)  The
teleport term is the constant ``floor(0.15 * 1e9)`` per node; mass lost to
flooring is not redistributed — documented contract, same in the oracle.

Scale posture: each iteration is one shuffle join (edges ⋈ ranks on src —
co-partitionable, edges can be pre-partitioned and reused) plus one hash
aggregate on dst.  That is the textbook distributed PageRank shape; the
iteration count is a fixed k (unrolled CTEs in the oracle), and the edge
list is persisted once, not rebuilt per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_ITERS = 3
_R0 = 1_000_000_000  # initial rank, 1e9 fixed point
_BASE = 150_000_000  # floor(0.15 * 1e9) teleport per node

# Node ids: customers at custkey*2, parts at partkey*2+1 (disjoint spaces).
_EDGES_SQL = """
  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL
  SELECT DISTINCT l_partkey * 2 + 1 AS src, o_custkey * 2 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _oracle_pagerank() -> str:
    iters = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.id,
         {_BASE} + COALESCE(c.contrib, 0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS id,
           SUM((85 * p.rank) // (100 * d.outdeg)) AS contrib
    FROM edges e
    JOIN {prev} p ON p.id = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.id = n.id
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH edges AS ({_EDGES_SQL}),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS id FROM edges),
r0 AS (SELECT id, CAST({_R0} AS BIGINT) AS rank FROM nodes),
{chain}
SELECT id, CAST(rank AS BIGINT) AS rank FROM {prev} ORDER BY id
"""


@register(
    "graph_pagerank_purchases",
    oracle=_oracle_pagerank(),
    tags=("graph", "iterative", "north-star"),
    doc=(
        f"{_ITERS}-iteration fixed-point PageRank (damping 0.85) over the "
        "bipartite customer↔part purchase graph. Integer 1e9-scaled ranks "
        "with floor-division edge contributions make every iteration "
        "bit-exact across engines and partitionings; each iteration is one "
        "edges⋈ranks shuffle join + one dst hash aggregate (edges "
        "persisted once)."
    ),
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    ol = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"), (F.col("l_partkey") * 2 + 1).alias("p")
    )
    fwd = ol.select(F.col("c").alias("src"), F.col("p").alias("dst")).distinct()
    rev = ol.select(F.col("p").alias("src"), F.col("c").alias("dst")).distinct()
    edges = fwd.unionAll(rev).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    nodes = edges.select(F.col("src").alias("id")).distinct().persist()

    ranks = nodes.withColumn("rank", F.lit(_R0).cast("long"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(
                "dst", F.expr("(85 * rank) div (100 * outdeg)").alias("share")
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id",
            (F.lit(_BASE) + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        ).localCheckpoint(eager=True)  # lineage cut (HITS probe lesson)
    return ranks.orderBy("id")


# -- Triangle counting on the co-purchase projection ---------------------------

_ORACLE_TRIANGLES = """
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS support
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
edges AS (SELECT u, v FROM pairs WHERE support >= 2),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT COUNT(*) AS n_triangles,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(DISTINCT u) + COUNT(DISTINCT v)
          FROM (SELECT u, NULL AS v FROM edges
                UNION ALL SELECT NULL, v FROM edges)) AS node_mentions
FROM tri
"""


@register(
    "graph_triangle_count",
    oracle=_ORACLE_TRIANGLES,
    tags=("graph", "agg"),
    doc=(
        "Triangle counting on the part co-purchase graph (parts sharing an "
        "order, support >= 2): the canonical ordered-wedge enumeration — "
        "every edge directed low->high id, wedges from a two-hop self-join, "
        "closed by a third edge-join — each triangle counted exactly once, "
        "no orientation dedup pass. The support threshold bounds edge "
        "count; at scale wedges are additionally capped by joining from "
        "the lower-degree endpoint (degree table from "
        "graph_degree_distribution)."
    ),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a = pl.alias("a")
    b = pl.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    edges = pairs.where(F.col("support") >= 2).select("u", "v").persist()
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    mentions = edges.agg(
        (F.countDistinct("u") + F.countDistinct("v")).alias("node_mentions")
    )
    return n_tri.crossJoin(n_edges).crossJoin(mentions)


# -- Market-basket association rules (support / confidence / lift) -------------

_ORACLE_BASKET = """
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT o) AS total FROM pl),
item AS (SELECT p, COUNT(*) AS n_p FROM pl GROUP BY p),
pair AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS support
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT pr.u, pr.v, pr.support,
       CAST(pr.support * 1000000 // iu.n_p AS BIGINT) AS conf_u_to_v_ppm,
       CAST(pr.support * 1000000 // iv.n_p AS BIGINT) AS conf_v_to_u_ppm,
       CAST(pr.support * t.total AS BIGINT) AS lift_num,
       CAST(iu.n_p * iv.n_p AS BIGINT) AS lift_den
FROM pair pr
JOIN item iu ON iu.p = pr.u
JOIN item iv ON iv.p = pr.v
CROSS JOIN n_orders t
ORDER BY pr.support DESC, pr.u, pr.v
"""


@register(
    "basket_association_rules",
    oracle=_ORACLE_BASKET,
    tags=("graph", "agg", "analytics"),
    doc=(
        "Market-basket association rules over order baskets (support >= 3 "
        "part pairs): directional confidence as floor-ppm integers and "
        "lift as an exact rational (num, den) — no float division crosses "
        "the oracle hash. Pair generation is the within-order self-join "
        "(fan-out bounded by basket size squared), then two broadcast "
        "item-count joins + one scalar total. The co-occurrence analytics "
        "the reference's ads domain grows into (which creatives convert "
        "together)."
    ),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct().persist()
    total = pl.agg(F.countDistinct("o").alias("total"))
    item = pl.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    a, b = pl.alias("a"), pl.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 3)
    )
    iu = item.select(F.col("p").alias("u"), F.col("n_p").alias("n_u"))
    iv = item.select(F.col("p").alias("v"), F.col("n_p").alias("n_v"))
    return (
        pair.join(iu, "u")
        .join(iv, "v")
        .crossJoin(F.broadcast(total))
        .select(
            "u",
            "v",
            "support",
            F.expr("support * 1000000 div n_u").cast("long").alias(
                "conf_u_to_v_ppm"
            ),
            F.expr("support * 1000000 div n_v").cast("long").alias(
                "conf_v_to_u_ppm"
            ),
            (F.col("support") * F.col("total")).cast("long").alias("lift_num"),
            (F.col("n_u") * F.col("n_v")).cast("long").alias("lift_den"),
        )
        .orderBy(F.col("support").desc(), "u", "v")
    )


_ORACLE_LINK_PRED = """
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT c, COUNT(*) AS d FROM cp GROUP BY c),
pairs AS (
  SELECT a.c AS cust_a, b.c AS cust_b, COUNT(*) AS common
  FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
  GROUP BY a.c, b.c
  HAVING COUNT(*) >= 3
)
SELECT p.cust_a, p.cust_b, CAST(p.common AS BIGINT) AS common_parts,
       CAST(floor(1000000.0 * p.common / (da.d + db.d - p.common))
            AS BIGINT) AS jaccard_micro
FROM pairs p
JOIN deg da ON da.c = p.cust_a
JOIN deg db ON db.c = p.cust_b
ORDER BY common_parts DESC, cust_a, cust_b
LIMIT 50
"""


@register(
    "graph_link_prediction",
    oracle=_ORACLE_LINK_PRED,
    tags=("graph", "similarity", "analytics"),
    doc=(
        "Link prediction on the co-purchase graph: customer pairs scored "
        "by common-neighbor count and Jaccard over their part "
        "neighborhoods (floored to integer micro-units — no float "
        "division crosses the oracle), min-support 3, top-50. This is "
        "the similarity-join shape on a bipartite graph: one posting "
        "self-join keyed on the shared part (pair work bounded per part "
        "by that part's customer count — the same hot-key concern the "
        "dedup posting joins cap; at 100 TB hot parts get the "
        "df-cap/salting treatment of dedup_ngram_jaccard_capped), "
        "degrees come from one hash aggregate broadcast onto the pair "
        "table, and top-k is TakeOrderedAndProject."
    ),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = cp.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = cp.select(F.col("c").alias("cust_a"), "p")
    b = cp.select(F.col("c").alias("cust_b"), "p")
    pairs = (
        a.join(b, "p")
        .where(F.col("cust_a") < F.col("cust_b"))
        .groupBy("cust_a", "cust_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= 3)
    )
    da = deg.select(F.col("c").alias("cust_a"), F.col("d").alias("da"))
    db = deg.select(F.col("c").alias("cust_b"), F.col("d").alias("db"))
    return (
        pairs.join(F.broadcast(da), "cust_a")
        .join(F.broadcast(db), "cust_b")
        .select(
            "cust_a",
            "cust_b",
            F.col("common").cast("bigint").alias("common_parts"),
            F.floor(
                F.lit(1000000.0) * F.col("common")
                / (F.col("da") + F.col("db") - F.col("common"))
            )
            .cast("bigint")
            .alias("jaccard_micro"),
        )
        .orderBy(F.desc("common_parts"), "cust_a", "cust_b")
        .limit(50)
    )


# -- deterministic hash-guided random walks (DeepWalk corpus generation) -------

_WALK_STEPS = 3

_ORACLE_WALKS = f"""
WITH edges AS (
  SELECT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
bi AS (
  SELECT src, dst FROM edges
  UNION ALL SELECT dst AS src, src AS dst FROM edges
),
w0 AS (
  SELECT o_custkey AS walk_id, o_custkey * 2 AS node,
         CAST(o_custkey * 2 AS VARCHAR) AS path
  FROM orders WHERE o_custkey < 50 GROUP BY o_custkey
),
{", ".join(
    f'''w{s} AS (
  SELECT walk_id, node, path FROM (
    SELECT w.walk_id,
           b.dst AS node,
           w.path || '->' || CAST(b.dst AS VARCHAR) AS path,
           ROW_NUMBER() OVER (
             PARTITION BY w.walk_id
             ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':{s}:'
                          || CAST(b.dst AS VARCHAR)), b.dst) AS rn
    FROM w{s - 1} w JOIN bi b ON b.src = w.node
  ) WHERE rn = 1
)''' for s in range(1, _WALK_STEPS + 1)
)}
SELECT walk_id, path FROM w{_WALK_STEPS} ORDER BY walk_id
"""


@register(
    "graph_deterministic_walks",
    oracle=_ORACLE_WALKS,
    tags=("graph", "ml", "north-star"),
    doc=(
        "Hash-guided graph walks over the bipartite co-purchase graph — "
        "the DeepWalk/node2vec CORPUS-GENERATION step, made "
        "reproducible: at each of 3 steps the walker moves to the "
        "neighbor minimizing md5(walk_id : step : neighbor), so the "
        "'random' choice is a pure function of (walk, step, candidate) "
        "— no RNG state, any engine or retry regenerates identical "
        "walks (the md5-family determinism trick applied to sequential "
        "sampling). Each step is one frontier-edges equi-join + one "
        "min-per-walk aggregate; k steps = k joins, frontier size "
        "constant (one row per walk) — at 100 TB the edge side is "
        "hash-partitioned once and reused across steps. Walks feed "
        "skip-gram style embedding trainers downstream."
    ),
)
def graph_deterministic_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bi = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    frontier = (
        orders.where(F.col("o_custkey") < 50)
        .select(F.col("o_custkey").alias("walk_id"))
        .distinct()
        .select(
            "walk_id",
            (F.col("walk_id") * 2).alias("node"),
            (F.col("walk_id") * 2).cast("string").alias("path"),
        )
    )
    for s in range(1, _WALK_STEPS + 1):
        h = F.md5(
            F.concat_ws(
                "",
                F.col("walk_id").cast("string"),
                F.lit(f":{s}:"),
                F.col("dst").cast("string"),
            )
        )
        frontier = (
            frontier.join(bi, frontier.node == bi.src)
            .groupBy("walk_id")
            .agg(
                F.min(
                    F.struct(
                        h.alias("h"),
                        F.col("dst").alias("node"),
                        F.concat(
                            F.col("path"),
                            F.lit("->"),
                            F.col("dst").cast("string"),
                        ).alias("path"),
                    )
                ).alias("best")
            )
            .select("walk_id", F.col("best.node").alias("node"),
                    F.col("best.path").alias("path"))
        )
    return frontier.select("walk_id", "path").orderBy("walk_id")


# -- k-core decomposition (k=2) via iterative peeling (r8) -------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 8  # oracle unroll depth; Spark iterates to fixpoint


def _kcore_oracle() -> str:
    """Unrolled peeling: each round drops nodes with degree < k and every
    edge touching them.  Peeling is monotone (the kept set only shrinks),
    so once the fixture converges within the unroll depth the remaining
    rounds are no-ops and the fixed unroll equals the true k-core."""
    rounds = []
    prev = "e0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
k{i} AS MATERIALIZED (
  SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN k{i} a ON a.u = e.u
  JOIN k{i} b ON b.u = e.v
)""")
        prev = f"e{i}"
    chain = ",".join(rounds)
    return f"""
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),
e0 AS MATERIALIZED (
  SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
),{chain}
SELECT u AS part_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM {prev} GROUP BY u ORDER BY part_id
"""


def kcore_peel_edges(
    e: DataFrame, k: int = _KCORE_K, oracle_unroll: int | None = _KCORE_ROUNDS
) -> tuple[DataFrame, int]:
    """Iteratively peel the DIRECTED-DOUBLED edge set ``e(u, v)`` (each
    undirected edge present both ways) to its k-core fixpoint.  Each round
    is one degree aggregate + two semi-joins with a localCheckpoint
    lineage cut.  Returns (surviving edges, peel_rounds).

    ``oracle_unroll`` guards the cross-engine contract: the DuckDB oracle
    is a FIXED unroll, exact only when the measured peel depth fits inside
    it (monotonicity makes surplus rounds no-ops).  A fixture with a
    deeper peel (long degree-2 chains at larger SF) would silently
    diverge, so fail loudly instead — the fix is raising the unroll
    depth, never trusting a stale one.  Pass None to disable (pure-Spark
    use with no SQL twin)."""
    from ..operators.dedup import loop_shuffle_width

    e = e.localCheckpoint(eager=True)
    n_prev = e.count()
    peel_rounds = 0  # rounds that actually dropped something
    # loop-scoped scale-adaptive shuffle width (dedup.loop_shuffle_width):
    # peeling only shrinks the edge set, so the entry count bounds every
    # round's volume.
    with loop_shuffle_width(e.sparkSession, n_prev):
        for _ in range(64):  # safety bound above any plausible peel depth
            keep = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).where(
                F.col("deg") >= k
            ).select("u")
            e = (
                e.join(keep, "u")
                .join(keep.withColumnRenamed("u", "v"), "v")
                .select("u", "v")
                # eager=False: the count() below materializes the
                # checkpoint blocks inside its own job — one job
                # round-trip per round instead of two (r12; AQE executes
                # the upstream shuffle stages at construction either way).
                .localCheckpoint(eager=False)
            )
            n = e.count()
            if n == n_prev:
                break
            peel_rounds += 1
            n_prev = n
    if oracle_unroll is not None and peel_rounds > oracle_unroll:
        raise RuntimeError(
            f"k-core peel converged in {peel_rounds} rounds but the DuckDB "
            f"oracle unrolls only {oracle_unroll}; raise _KCORE_ROUNDS to "
            f">= {peel_rounds} so the cross-engine check stays exact"
        )
    return e, peel_rounds



@register(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    tags=("graph", "analytics"),
    doc=(
        f"{_KCORE_K}-core decomposition of the part co-purchase graph "
        "(same support>=2 edge set as graph_triangle_count) via iterative "
        "peeling: drop degree<k nodes and their edges until fixpoint — "
        "the standard dense-subgraph extraction before community/cohesion "
        "analysis. Each round is one degree aggregate + two semi-joins "
        "(single shuffle each) with localCheckpoint lineage cuts; Spark "
        f"runs to fixpoint, the oracle unrolls {_KCORE_ROUNDS} rounds "
        "(peeling is monotone, so extra rounds past convergence are "
        "no-ops — exact as long as the fixture converges within the "
        "unroll; the Spark loop COUNTS its peel rounds and raises if "
        "they ever exceed the unroll depth, so a deeper fixture can "
        "never silently diverge from the oracle)."
    ),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    e = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    core, _rounds = kcore_peel_edges(e)
    return (
        core.groupBy(F.col("u").alias("part_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .orderBy("part_id")
    )


# -- Bipartite co-occurrence projection (r8) ---------------------------------------

_ORACLE_BIPARTITE_COOC = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM ut GROUP BY 1
),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS co_users
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT c.type_a, c.type_b, c.co_users,
       sa.n_users AS users_a, sb.n_users AS users_b,
       round(CAST(c.co_users AS DOUBLE)
             / (sa.n_users + sb.n_users - c.co_users), 6) AS jaccard
FROM co c
JOIN sizes sa ON sa.event_type = c.type_a
JOIN sizes sb ON sb.event_type = c.type_b
ORDER BY type_a, type_b
"""


@register(
    "graph_bipartite_cooccurrence",
    oracle=_ORACLE_BIPARTITE_COOC,
    tags=("graph", "analytics"),
    doc=(
        "Bipartite projection of the user-eventtype graph onto event "
        "types: co-occurring-user counts + Jaccard affinity per type "
        "pair — the item-item projection that seeds co-visitation / "
        "related-items analyses. The projection joins on user_id over "
        "the DISTINCT (user, type) table, so per-user fanout is bounded "
        "by the type-set size (5 here), never by a user's raw event "
        "count — the skew guard that makes the projection safe on "
        "power-law users. All counts exact; one rational per pair."
    ),
)
def graph_bipartite_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    co = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_users"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        co.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "co_users",
            "users_a",
            "users_b",
            F.round(
                F.col("co_users").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("co_users")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# -- HITS hubs & authorities on the bipartite purchase graph (r9) --------------

_HITS_ITERS = 2
_HITS_SCALE = 1_000_000  # max-normalized fixed-point scale per half-step


def _oracle_hits() -> str:
    steps = []
    hub_prev = "h0"
    for i in range(1, _HITS_ITERS + 1):
        steps.append(
            f"""a{i}_raw AS (
  SELECT e.part, CAST(SUM(h.score) AS BIGINT) AS raw
  FROM edges e JOIN {hub_prev} h ON h.cust = e.cust
  GROUP BY e.part
),
a{i} AS (
  SELECT part, CAST(raw * {_HITS_SCALE}
                    // (SELECT MAX(raw) FROM a{i}_raw) AS BIGINT) AS score
  FROM a{i}_raw
),
h{i}_raw AS (
  SELECT e.cust, CAST(SUM(a.score) AS BIGINT) AS raw
  FROM edges e JOIN a{i} a ON a.part = e.part
  GROUP BY e.cust
),
h{i} AS (
  SELECT cust, CAST(raw * {_HITS_SCALE}
                    // (SELECT MAX(raw) FROM h{i}_raw) AS BIGINT) AS score
  FROM h{i}_raw
)"""
        )
        hub_prev = f"h{i}"
    chain = ",\n".join(steps)
    return f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
h0 AS (SELECT DISTINCT cust, CAST({_HITS_SCALE} AS BIGINT) AS score
       FROM edges),
{chain}
SELECT side, id, score FROM (
  SELECT 'hub' AS side, cust AS id, score FROM h{_HITS_ITERS}
  UNION ALL
  SELECT 'auth' AS side, part AS id, score FROM a{_HITS_ITERS}
) ORDER BY side, id
"""


@register(
    "graph_hits_bipartite",
    oracle=_oracle_hits(),
    tags=("graph", "iterative"),
    doc=(
        f"HITS hubs & authorities (Kleinberg 1999), {_HITS_ITERS} "
        "power-iteration rounds over the bipartite customer->part "
        "purchase graph: authority(p) = sum of hub scores over in-edges, "
        "hub(c) = sum of authority scores — the mutually-reinforcing "
        "ranking next to graph_pagerank_purchases' random-walk one. "
        "Spec's L2 normalization is replaced by max-normalization in "
        "1e6 fixed point with floor division (rankings identical — "
        "normalization only rescales — and every half-step is exact "
        "BIGINT arithmetic, bit-reproducible across engines and "
        "partitionings; the max is one scalar aggregate broadcast back). "
        "Each half-step is one edges-to-scores shuffle join + one hash "
        "aggregate, the same distributed shape as PageRank; the oracle "
        "unrolls the fixed iteration count into chained CTEs."
    ),
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .persist()
    )

    def _max_normalize(raw: DataFrame, key: str) -> DataFrame:
        mx = raw.agg(F.max("raw").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            key,
            F.expr(f"CAST(raw * {_HITS_SCALE} div mx AS BIGINT)").alias(
                "score"
            ),
        )

    hubs = edges.select("cust").distinct().withColumn(
        "score", F.lit(_HITS_SCALE).cast("bigint")
    )
    auths = None
    # localCheckpoint per half-step: without the lineage cut, every later
    # half-step re-evaluates (and AQE re-plans) the whole prior chain —
    # on a skew-heavy synthetic graph the unpersisted 4-half-step chain
    # measured >10x slower than the checkpointed one (SCALE_PROBE_r09b).
    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(hubs, "cust")
            .groupBy("part")
            .agg(F.sum("score").cast("bigint").alias("raw"))
        )
        auths = _max_normalize(a_raw, "part").localCheckpoint(eager=True)
        h_raw = (
            edges.join(auths, "part")
            .groupBy("cust")
            .agg(F.sum("score").cast("bigint").alias("raw"))
        )
        hubs = _max_normalize(h_raw, "cust").localCheckpoint(eager=True)
    out = (
        hubs.select(
            F.lit("hub").alias("side"), F.col("cust").alias("id"), "score"
        )
        .unionAll(
            auths.select(
                F.lit("auth").alias("side"), F.col("part").alias("id"), "score"
            )
        )
        .orderBy("side", "id")
    )
    return out


# -- Modularity of the co-purchase community structure (r9) ---------------------

_ORACLE_MODULARITY = """
WITH RECURSIVE pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS support
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
edges AS (SELECT u, v FROM pairs WHERE support >= 2),
sym AS (SELECT u AS s, v AS d FROM edges UNION SELECT v, u FROM edges),
reach(n, m) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.n, e.d FROM reach r JOIN sym e ON e.s = r.m
),
labels AS (SELECT n AS node, MIN(m) AS community FROM reach GROUP BY n),
m_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
deg AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY s),
comm AS (
  SELECT l.community,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d.d) AS BIGINT) AS degree_sum
  FROM labels l JOIN deg d ON d.node = l.node
  GROUP BY l.community
),
intra AS (
  SELECT la.community, CAST(COUNT(*) AS BIGINT) AS intra_edges
  FROM edges e
  JOIN labels la ON la.node = e.u
  JOIN labels lb ON lb.node = e.v AND lb.community = la.community
  GROUP BY la.community
)
SELECT c.community, c.n_nodes,
       COALESCE(i.intra_edges, 0) AS intra_edges,
       c.degree_sum,
       CAST(4 * t.m * COALESCE(i.intra_edges, 0)
            - c.degree_sum * c.degree_sum AS BIGINT) AS q_num,
       CAST(4 * t.m * t.m AS BIGINT) AS q_den
FROM comm c
LEFT JOIN intra i ON i.community = c.community
CROSS JOIN m_tot t
ORDER BY c.community
"""


@register(
    "graph_modularity_components",
    oracle=_ORACLE_MODULARITY,
    tags=("graph", "agg", "eval"),
    doc=(
        "Newman modularity of the part co-purchase graph's connected-"
        "component community structure: per community, Q's contribution "
        "as the EXACT rational (4m*e_c - d_c^2) / 4m^2 — intra-edge count "
        "e_c, degree sum d_c, and total edge count m are all BIGINTs, so "
        "the quality score of a community assignment is bit-exact with "
        "no float division inside the hash (sum q_num/q_den for total "
        "Q). This is the evaluation half of every community-detection "
        "loop (Louvain greedily maximizes exactly this quantity); "
        "communities here come from the same min-label components used "
        "for dedup clusters, so the operator composes generator + "
        "evaluator the way dedup_cluster_size_histogram does. Scale "
        "shape: two hash aggregates and two label joins over the edge "
        "list — no per-pair work beyond the support>=2 edge set."
    ),
)
def graph_modularity_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

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
        .persist()
    )
    labels = connected_components(edges, a_col="u", b_col="v").select(
        F.col("doc_id").alias("node"), F.col("cluster_id").alias("community")
    ).persist()
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    la = labels.withColumnRenamed("node", "u").withColumnRenamed(
        "community", "cu"
    )
    lb = labels.withColumnRenamed("node", "v").withColumnRenamed(
        "community", "cv"
    )
    intra = (
        edges.join(la, "u")
        .join(lb, "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    m_tot = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    return (
        comm.join(intra, "community", "left")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "community",
            "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).cast("bigint").alias(
                "intra_edges"
            ),
            "degree_sum",
            (
                4 * F.col("m") * F.coalesce("intra_edges", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("bigint")
            .alias("q_num"),
            (4 * F.col("m") * F.col("m")).cast("bigint").alias("q_den"),
        )
        .orderBy("community")
    )


# -- TextRank keyword extraction (r9) -------------------------------------------

_TR_ITERS = 3
_TR_R0 = 1_000_000_000
_TR_BASE = 150_000_000
_TR_TOPK = 20


def _oracle_textrank() -> str:
    iters = []
    prev = "r0"
    for i in range(1, _TR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.word,
         {_TR_BASE} + COALESCE(c.contrib, 0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS word,
           SUM((85 * p.rank * e.w) // (100 * d.wdeg)) AS contrib
    FROM sym e
    JOIN {prev} p ON p.word = e.src
    JOIN wdeg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.word = n.word
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
bg AS (
  SELECT least(toks[i], toks[i+1]) AS u, greatest(toks[i], toks[i+1]) AS v
  FROM t, unnest(range(1, greatest(len(toks), 1))) AS s(i)
  WHERE toks[i] <> toks[i+1]
),
edges AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w FROM bg GROUP BY u, v),
sym AS (
  SELECT u AS src, v AS dst, w FROM edges
  UNION ALL SELECT v, u, w FROM edges
),
wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM sym GROUP BY src),
nodes AS (SELECT DISTINCT src AS word FROM sym),
r0 AS (SELECT word, CAST({_TR_R0} AS BIGINT) AS rank FROM nodes),
{chain}
SELECT word, CAST(rank AS BIGINT) AS rank
FROM {prev}
ORDER BY rank DESC, word LIMIT {_TR_TOPK}
"""


@register(
    "text_textrank_keywords",
    oracle=_oracle_textrank(),
    tags=("text", "graph", "iterative"),
    doc=(
        f"TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank "
        "over the corpus-wide word co-occurrence graph (adjacent-token "
        "pairs, weight = corpus co-occurrence count), "
        f"{_TR_ITERS} fixed-point iterations with the same integer "
        "1e9-rank / floor-division contract as graph_pagerank_purchases "
        "— weighted contributions (85 * rank * w) div (100 * wdeg) are "
        "exact BIGINTs, bit-identical under any partitioning. Top-"
        f"{_TR_TOPK} words by rank (TakeOrdered, word tie-break) are the "
        "corpus keywords — the unsupervised keyword signal next to "
        "tf-idf (text_tfidf_top_terms), which scores terms per-document "
        "rather than by graph centrality. Scale shape: edge extraction "
        "is one posting-style aggregate; each iteration is one "
        "edges-ranks join + dst aggregate over the VOCABULARY graph "
        "(vocab-scale, not corpus-scale)."
    ),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    bg = docs.select(toks.alias("toks")).select(
        F.explode(
            F.expr(
                "filter(transform(sequence(1, greatest(size(toks) - 1, 0)),"
                " i -> struct(least(toks[i-1], toks[i]) AS u,"
                "            greatest(toks[i-1], toks[i]) AS v)),"
                " s -> s.u <> s.v)"
            )
        ).alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    edges = bg.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    ).persist()
    wdeg = sym.groupBy("src").agg(F.sum("w").cast("bigint").alias("wdeg"))
    nodes = sym.select(F.col("src").alias("word")).distinct()
    ranks = nodes.withColumn("rank", F.lit(_TR_R0).cast("bigint"))
    for _ in range(_TR_ITERS):
        contrib = (
            sym.join(ranks, sym.src == ranks.word)
            .join(wdeg, "src")
            .select(
                "dst",
                F.expr("(85 * rank * w) div (100 * wdeg)").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        # lineage cut per iteration (the HITS probe lesson: unpersisted
        # iteration chains re-plan the whole prior chain per round)
        ranks = nodes.join(contrib, nodes.word == contrib.dst, "left").select(
            "word",
            (F.lit(_TR_BASE) + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("bigint")
            .alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks.orderBy(F.desc("rank"), "word").limit(_TR_TOPK)


# -- Label-propagation community detection (r9) ---------------------------------

_LPA_ROUNDS = 2


def _oracle_lpa() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""v{i} AS (
  SELECT s.d AS node, l.label, COUNT(*) AS votes
  FROM sym s JOIN {prev} l ON l.node = s.s
  GROUP BY s.d, l.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY votes DESC, label) AS rn
    FROM v{i}
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS support
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
),
edges AS (SELECT u, v FROM pairs WHERE support >= 2),
sym AS (SELECT u AS s, v AS d FROM edges UNION SELECT v, u FROM edges),
l0 AS (SELECT DISTINCT s AS node, s AS label FROM sym),
{chain}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(MAX(node) AS BIGINT) AS max_node
FROM {prev} GROUP BY label ORDER BY label
"""


@register(
    "graph_label_propagation",
    oracle=_oracle_lpa(),
    tags=("graph", "iterative", "clustering"),
    doc=(
        f"Label-propagation community detection (Raghavan et al. 2007), "
        f"{_LPA_ROUNDS} SYNCHRONOUS rounds over the part co-purchase "
        "graph: each node adopts the most frequent label among its "
        "neighbors, ties broken by MIN label — the deterministic "
        "variant of the textbook's random tie-break (async random LPA "
        "is irreproducible by construction; synchronous min-tie-break "
        "makes every round a pure function of the previous labeling, "
        "which is what lets the oracle unroll it). Detection pairs with "
        "graph_modularity_components' evaluator: LPA proposes, "
        "modularity scores. Each round is one edges-labels shuffle join "
        "+ a (node, label) vote count + a per-NODE top-1 window "
        "(partitioned by node — bounded by the node's distinct "
        "neighbor labels). Community summary output keeps the result "
        "set node-scale-free."
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
    )
    sym = (
        edges.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(edges.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    wv = Window.partitionBy("node").orderBy(F.desc("votes"), "label")
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(labels, sym.s == labels.node)
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)  # lineage cut (HITS probe lesson)
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy("community")
    )


# ---------------------------------------------------------------------------
# Multi-source BFS closeness (4-hop harmonic centrality)
# ---------------------------------------------------------------------------

_BFS_HOPS = 4

_ORACLE_CLOSENESS = """
WITH RECURSIVE pl AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
e0 AS (
  SELECT a.p AS u, b.p AS v
  FROM pl a JOIN pl b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
),
edges AS (
  SELECT u AS s, v AS d FROM e0 UNION SELECT v, u FROM e0
),
deg AS (SELECT s, COUNT(*) AS c FROM edges GROUP BY s),
seeds AS (
  SELECT s FROM deg QUALIFY row_number() OVER (ORDER BY c DESC, s) <= 10
),
bfs(seed, node, dist) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT b.seed, e.d, b.dist + 1
  FROM bfs b JOIN edges e ON e.s = b.node
  WHERE b.dist < 4
),
md AS (SELECT seed, node, CAST(MIN(dist) AS BIGINT) AS dist
       FROM bfs GROUP BY seed, node)
SELECT seed,
       CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
       CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
       CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_d3,
       CAST(SUM(CASE WHEN dist = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_d4,
       CAST(SUM(CASE WHEN dist > 0 THEN 12 // dist ELSE 0 END) AS BIGINT)
         AS harmonic_x12,
       CAST(SUM(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached
FROM md GROUP BY seed ORDER BY seed
"""


@register(
    "graph_closeness_bfs",
    oracle=_ORACLE_CLOSENESS,
    tags=("graph",),
    doc=(
        "Multi-source BFS harmonic closeness over the co-purchase part "
        "graph (same support>=2 edge spine as graph_label_propagation): "
        "the 10 highest-degree parts (deterministic (degree DESC, node) "
        "seed ranking) BFS out 4 hops SIMULTANEOUSLY — the distance "
        "table keys on (seed, node) so one frontier join serves all "
        "seeds per round, 4 rounds of join + min-dist aggregate with "
        "localCheckpoint lineage cuts (the HITS probe lesson).  "
        "Harmonic centrality sum(1/d) is kept exact as x12 fixed-point "
        "(12 = lcm(1..4)).  Per-round frontier work is |frontier| x "
        "avg-degree — the textbook distributed BFS; the hop bound is "
        "the state cap that makes 100 TB closeness tractable (exact "
        "all-pairs closeness is not, which is why the bounded-hop form "
        "IS the production operator, cf. HyperANF-style approximations)."
    ),
)
def graph_closeness_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    e0 = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    sym = (
        e0.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionAll(e0.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .distinct()
        .persist()
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    w_seed = Window.orderBy(F.col("c").desc(), "s")
    seeds = (
        deg.withColumn("rk", F.row_number().over(w_seed))
        .where(F.col("rk") <= 10)
        .select(F.col("s").alias("seed"))
    )
    dist = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).cast("bigint").alias("dist")
    ).localCheckpoint(eager=True)
    for r in range(1, _BFS_HOPS + 1):
        frontier = dist.where(F.col("dist") == r - 1)
        nxt = frontier.join(sym, frontier.node == sym.s).select(
            "seed", F.col("d").alias("node"), F.lit(r).cast("bigint").alias("dist")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)  # lineage cut per BFS round
        )
    out = dist.groupBy("seed").agg(
        F.sum(F.when(F.col("dist") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_d1"),
        F.sum(F.when(F.col("dist") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_d2"),
        F.sum(F.when(F.col("dist") == 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_d3"),
        F.sum(F.when(F.col("dist") == 4, 1).otherwise(0))
        .cast("bigint")
        .alias("n_d4"),
        F.sum(
            F.when(F.col("dist") > 0, F.expr("12 DIV dist")).otherwise(0)
        )
        .cast("bigint")
        .alias("harmonic_x12"),
        F.sum(F.when(F.col("dist") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_reached"),
    )
    sym.unpersist()
    return out.orderBy("seed")
