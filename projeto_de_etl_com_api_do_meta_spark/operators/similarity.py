"""Similarity search over embedding columns (driver north star):
brute-force cosine top-k (exact baseline) and random-hyperplane LSH ANN
(the scale path).

Scale design:
- Brute force is a broadcast nested-loop of (small query set) × (corpus) —
  correct baseline, O(|Q|·|C|).  The dot product is a per-row ``zip_with``
  fold: JVM-side, no UDF, no Python.
- LSH buckets the corpus by sign-pattern of hyperplane projections; top-k
  search becomes an equi-join on the bucket key.  Hyperplanes are derived
  from murmur3 hashes, so signatures are deterministic with no fit step and
  no driver-side state — any executor can recompute them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lit_fast import sql_array, sql_matrix


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
    extra: dict | None = None,
) -> DataFrame:
    """Project to (id, vec/|vec|) so every downstream pair comparison is a
    single dot product instead of dot + two norms — at N query × M corpus
    pairs this cuts the per-pair work (and the codegen'd expression tree) 3×.
    The norm is computed once per row in its own projection step.

    ``extra`` maps output name -> Column for columns to carry through the
    projection (e.g. a label), so callers never re-join attributes they
    already had in hand — the normalization contract stays defined HERE
    only."""
    extra = extra or {}
    # cosine is undefined for the zero vector: dividing by a zero norm
    # yields NaN components here but NULL components in SQL engines
    # (x/0 -> NULL in DuckDB), a silent cross-engine split (r9 extreme
    # fixture).  The contract is to EXCLUDE zero-norm vectors from every
    # cosine comparison, both sides.  The gate is a short-circuiting
    # exists() on the RAW column, not `_nrm > 0`: a filter referencing
    # _nrm would be collapsed into the projection and recompute the
    # 64-element norm fold twice per row (measured: dedup_embedding_cosine
    # 1.6 -> 3.1 s before this form).
    # spread first: the norm fold + per-component divide are interpreted-HOF
    # CPU (no codegen for higher-order functions); without the repartition
    # every single-file fixture corpus normalizes on ONE input partition,
    # and every downstream pair comparison inherits that parallelism (r11
    # optimization round).  Results are partitioning-invariant.  The tiny
    # broadcast query sides pay one negligible extra shuffle.
    from .dedup import spread

    # r12 clean A/B at 32 cores, isolated medians (VERDICT r11 item 7 —
    # "is the unconditional spread paying for itself?"): WITH spread
    # dedup_embedding_cosine 1.07s / embed_knn 0.67 / power_iteration 1.06
    # / dedup_semantic_clustered 1.23; WITHOUT 1.66 / 1.10 / 1.19 / 1.43.
    # The repartition pays on every path at both core counts; kept.
    tmp = spread(df, id_col).where(
        F.exists(F.col(vec_col), lambda x: x != 0)
    ).select(
        F.col(id_col).alias(id_alias),
        *[c.alias(n) for n, c in extra.items()],
        F.col(vec_col).alias("_raw"),
        norm(F.col(vec_col)).alias("_nrm"),
    )
    return tmp.select(
        id_alias,
        *extra.keys(),
        F.transform("_raw", lambda x: x.cast("double") / F.col("_nrm")).alias(
            vec_alias
        ),
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Rank on (rounded cosine desc, neighbor id) — a total order, so results
    are deterministic and engine-comparable."""
    q = F.broadcast(unit_vectors(queries, id_col, vec_col, "query_id", "qv"))
    c = unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv")
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(plane_id: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane from murmur3 hashes, in [-1,1)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.hash(F.lit(plane_id), i).cast("double") / F.lit(2147483648.0),
    )


def _hyperplane_values(spark, n_planes: int, dim: int) -> list[list[float]]:
    """Evaluate the murmur3 hyperplanes ONCE (one 1-row driver-side job) so
    bucket computation embeds them as plan literals.  Recomputing the plane
    via an interpreted ``hash()`` HOF inside every row's bucket expression
    costs planes×dim hash calls PER ROW (measured ~4× the whole posting
    step at 64 planes × 64 dims); the values are identical — same
    expressions, evaluated once — so bucket ids are unchanged, and the
    "no fit step" property survives: any driver can rebuild the literals
    from the plane ids alone."""
    row = (
        spark.range(1)
        .select(*[_hyperplane(p, dim).alias(f"_p{p}") for p in range(n_planes)])
        .head()
    )
    return [list(row[f"_p{p}"]) for p in range(n_planes)]


def lsh_bucket(
    vec: Column,
    dim: int,
    num_planes: int = 12,
    plane_offset: int = 0,
    plane_values: list[list[float]] | None = None,
) -> Column:
    """Sign-pattern bucket id of a vector under ``num_planes`` hyperplanes
    (plane ids offset so multiple tables use disjoint plane families).
    Pass ``plane_values`` (from :func:`_hyperplane_values`, indexed by
    absolute plane id) to embed the planes as literals instead of
    re-hashing them per row."""
    bits = []
    for p in range(num_planes):
        plane = (
            F.lit(plane_values[plane_offset + p])
            if plane_values is not None
            else _hyperplane(plane_offset + p, dim)
        )
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0)))
    acc = F.lit(0)
    for bit in bits:
        acc = acc * 2 + bit
    return acc


def _lsh_postings(
    df: DataFrame,
    id_alias: str,
    vec_alias: str,
    id_col: str,
    vec_col: str,
    dim: int,
    num_tables: int,
    planes_per_table: int,
) -> DataFrame:
    """(id, vec, table_id, bucket) posting list across all hash tables.

    Bucket computation is one Arrow-batched numpy GEMM (sign pattern of
    ``V @ P.T``, bits packed per table) — the same "matrix products cross
    the Python seam" discipline as the blocked-GEMM verify step.  The
    expression-tree formulations were measured and rejected: per-plane
    ``hash()`` HOFs cost ~9 s of Catalyst ANALYSIS per query (planes×dim
    inlined nodes), and a shared-literal ``transform``/``aggregate`` tree
    pushed interpreted-lambda row cost to minutes (tables×planes×dim
    lambda invocations per row; HOFs never reach codegen).  The planes are
    still the deterministic murmur3 family, evaluated once on the driver —
    no fit step, any session can rebuild them from plane ids.  The input
    is explicitly hash-repartitioned to executor width first: a
    single-file source would otherwise feed one Python worker."""
    spark = df.sparkSession
    planes = np.array(
        _hyperplane_values(spark, num_tables * planes_per_table, dim)
    )  # (tables*planes, dim)
    n = spark.sparkContext.defaultParallelism
    nt, ppt = num_tables, planes_per_table
    weights = 2 ** np.arange(ppt - 1, -1, -1)  # MSB-first bit packing

    def bucketize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = pdf[vec_col].to_numpy()
            mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
            signs = (mat @ planes.T >= 0).astype(np.int64)  # (n, nt*ppt)
            bucket = signs.reshape(len(pdf), nt, ppt) @ weights  # (n, nt)
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_col].to_numpy().repeat(nt),
                    vec_alias: [v for v in vecs for _ in range(nt)],
                    "table_id": np.tile(np.arange(nt), len(pdf)),
                    "bucket": bucket.reshape(-1),
                }
            )

    # The id field keeps the caller's type (string ids etc.), not a
    # hardcoded long — only the vec/table/bucket columns are fixed.
    id_type = df.schema[id_col].dataType.simpleString()
    return df.repartition(n, F.col(id_col)).mapInPandas(
        bucketize,
        schema=(
            f"{id_alias} {id_type}, {vec_alias} array<double>, "
            "table_id int, bucket long"
        ),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_tables: int = 16,
    planes_per_table: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking over candidates that collide
    with the query in ANY of ``num_tables`` hash tables (standard multi-table
    LSH: per-table match prob p^planes, overall 1-(1-p^planes)^tables).

    Scale shape: corpus postings are replicated ``num_tables``× and the
    candidate search is an equi-join on (table_id, bucket) + distinct — never
    an all-pairs product.  Recall/cost tunes with (tables, planes)."""
    # Normalize before bucketing: hyperplane sign-buckets are invariant to
    # positive scaling, and downstream scoring becomes a single dot product.
    q = _lsh_postings(
        unit_vectors(queries, id_col, vec_col, "query_id", "qv"),
        "query_id", "qv", "query_id", "qv", dim, num_tables, planes_per_table,
    )
    c = _lsh_postings(
        unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv"),
        "neighbor_id", "cv", "neighbor_id", "cv", dim, num_tables, planes_per_table,
    )
    cands = (
        F.broadcast(q)
        .join(c, ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("qv").alias("qv"), F.first("cv").alias("cv"))
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 6,
    block_size: int = 4096,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a < b) pairs whose
    cosine similarity (rounded, so engine-comparable) reaches ``threshold``.

    Blocked matrix-product formulation: unit vectors are packed into
    ``block_size``-row matrices (one Arrow record each), the block pairs are
    a tiny cross join, and each pair is scored with ONE numpy GEMM inside
    ``mapInPandas`` — a block nested-loop that distributes the O(N²·d) work
    with no driver-side collect and per-task memory bounded by two blocks.
    The interpreted-expression alternative (per-pair zip_with fold) is
    ~50× slower.  At 100 TB prefer LSH blocking (``lsh_topk``'s bucket
    equi-join) to cut the candidate set before this exact verify."""
    import pandas as pd

    u = unit_vectors(df, id_col, vec_col, "vid", "uv")
    blocked = u.withColumn("block", F.floor(F.col("vid") / block_size))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vid")
        return pd.DataFrame(
            {
                "block": [int(pdf["block"].iloc[0])],
                "ids": [pdf["vid"].to_numpy(dtype="int64")],
                "mat": [np.stack(pdf["uv"].to_numpy()).reshape(-1).astype("float64")],
            }
        )

    packs = blocked.groupBy("block").applyInPandas(
        pack, schema="block long, ids array<long>, mat array<double>"
    )
    a, b = packs.alias("a"), packs.alias("b")
    block_pairs = a.join(b, F.col("a.block") <= F.col("b.block")).select(
        F.col("a.ids").alias("ids_a"),
        F.col("a.mat").alias("mat_a"),
        F.col("b.ids").alias("ids_b"),
        F.col("b.mat").alias("mat_b"),
    )

    def gemm(batches):
        import numpy as np

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for ids_a, mat_a, ids_b, mat_b in zip(
                pdf["ids_a"], pdf["mat_a"], pdf["ids_b"], pdf["mat_b"]
            ):
                ia = np.asarray(ids_a, dtype="int64")
                ib = np.asarray(ids_b, dtype="int64")
                A = np.asarray(mat_a, dtype="float64").reshape(len(ia), -1)
                B = np.asarray(mat_b, dtype="float64").reshape(len(ib), -1)
                sims = np.round(A @ B.T, round_digits)
                keep = (sims >= threshold) & (ia[:, None] < ib[None, :])
                r, c = np.nonzero(keep)
                out_a.append(ia[r])
                out_b.append(ib[c])
                out_c.append(sims[r, c])
            empty_i = np.array([], dtype="int64")
            empty_f = np.array([], dtype="float64")
            yield pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a) if out_a else empty_i,
                    "vec_b": np.concatenate(out_b) if out_b else empty_i,
                    "cos_sim": np.concatenate(out_c) if out_c else empty_f,
                }
            )

    return block_pairs.mapInPandas(
        gemm, schema="vec_a long, vec_b long, cos_sim double"
    )


# -- IVF (inverted-file) ANN --------------------------------------------------

#: Fixed-point scale for exact centroid sums: floor(x * 2^40) is an exact
#: integer for unit-vector components, so distributed partial sums are
#: order-independent (bit-deterministic under any partitioning).
_FP_SCALE = 1099511627776.0  # 2^40


def ivf_index(
    corpus_unit: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Spherical k-means IVF index over unit vectors: deterministic init
    (``id % nlist``), ``iters`` Lloyd rounds, assignment by max dot product.

    Scale shape (the classic distributed-Lloyd discipline, e.g. Spark MLlib
    KMeans): per round, ONE map-side-combinable hash aggregate computes
    per-(cluster, component) fixed-point sums — nlist×dim rows out, combined
    partially on every executor, so no round ever shuffles vectors and no
    reducer sees more than one component of one cluster (the grouped-UDF
    formulation that funnels the whole corpus into nlist reducers is exactly
    the skew this avoids).  The nlist×dim result is bounded by contract
    (k-means state, not data), collected, and re-broadcast as plan literals;
    re-assignment is then a stateless codegen projection — argmax over the
    literal centroid array, ties to the lowest cluster id — with zero
    shuffle and no lineage growth (each round's collect() cuts the plan).

    Determinism: floor(component * 2^40) sums are exact integers, so the
    centroid is bit-identical under any partitioning / arrival order.

    Returns (assignment df [id, vec, cluster], centroid df [cluster, cvec]).
    """
    if iters < 1:
        raise ValueError("ivf_index needs at least one Lloyd round")
    corpus_unit = corpus_unit.persist()  # loop-invariant: scanned once/round
    assign_expr = (F.col(id_col) % nlist).cast("int")
    for _ in range(iters):
        sums = (
            corpus_unit.select(
                assign_expr.alias("cluster"),
                F.posexplode(F.col(vec_col)).alias("pos", "c"),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.floor(F.col("c") * _FP_SCALE).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # bounded: nlist × dim rows (index state, not data)
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = (
                r["s"] / r["n"] / _FP_SCALE
            )
        dim = max(len(v) for v in by_cluster.values())
        cent_vecs = [
            [by_cluster[c].get(p, 0.0) for p in range(dim)]
            for c in sorted(by_cluster)
        ]
        # one-parse literal matrix: per-element F.lit costs 2-4 Py4J
        # round-trips, paid once per Lloyd round (r11 optimization;
        # functions/lit_fast.py) — repr round-trips bit-identically.
        cents_lit = sql_matrix(cent_vecs, "DOUBLE")
        # argmax dot over the literal centroids; array_position returns the
        # FIRST index equal to the max, i.e. ties break to the lowest
        # cluster id — same contract as an (dot DESC, cluster ASC) sort.
        dots = F.transform(cents_lit, lambda cv: dot(F.col(vec_col), cv))
        assign_expr = (F.array_position(dots, F.array_max(dots)) - 1).cast(
            "int"
        )
    # Cluster labels are DENSE indices into cent_vecs (argmax position), so
    # if a round emptied a cluster the surviving ones are renumbered 0..m-1
    # consistently on both sides of the (assign, cents) pair.
    assign = corpus_unit.withColumn("cluster", assign_expr)
    spark = corpus_unit.sparkSession
    cents = spark.createDataFrame(
        list(enumerate(cent_vecs)), "cluster int, cvec array<double>"
    )
    return assign, cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: rank the ``nlist`` centroids per query, probe
    the ``nprobe`` closest inverted lists, exact cosine only within them.

    The candidate join is keyed on ``cluster`` — at 100 TB the corpus is
    stored partitioned by cluster (the inverted file), so a probe touches
    only nprobe/nlist of the data.  ``nprobe == nlist`` degenerates to the
    exact brute-force result (pinned by unit test)."""
    uc = unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv")
    assign, cents = ivf_index(uc, "neighbor_id", "cv", nlist, iters)
    # Constraint cut on the inverted-file key.  `cluster` is an alias of an
    # argmax expression over `cv`, and on pyspark 4.1.2
    # InferFiltersFromConstraints substitutes that expression through the
    # probe-join equality and pushes an inferred predicate referencing `cv`
    # onto the PROBE side, where it cannot bind — a deterministic
    # fresh-session executor crash (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
    # localCheckpoint does NOT help (LogicalRDD preserves originConstraints),
    # so instead make the key expression non-deterministic-flagged with a
    # value-stable zero: QueryPlan.validConstraints only tracks deterministic
    # expressions, so no constraint about `cluster` can cross the join.
    # Regression-pinned by tests/test_virgin_session.py.
    assign = assign.withColumn(
        "cluster", F.col("cluster") + (F.rand(7) * 0).cast("int")
    )
    uq = unit_vectors(queries, id_col, vec_col, "query_id", "qv")
    # Rank centroids per query ROW-LOCALLY against the centroid table
    # collected to a literal (bounded: nlist rows by construction — an IVF
    # index has a driver-sized codebook even at 100 TB).  sort by
    # (-dot, cluster) then slice nprobe, i.e. the same (dot DESC, cluster
    # ASC) tie-break the previous window formulation had.  This needs NO
    # crossJoin, NO shuffle, and NO window for probe selection — and it
    # avoids a pyspark 4.1.2 Catalyst defect where a WindowGroupLimit-pruned
    # probe side of a shared-lineage self-join (queries == corpus) made the
    # post-join ZipWith dot fail attribute binding on its FIRST execution in
    # a fresh session (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on cv#...);
    # regression-pinned by tests/test_virgin_session.py.
    cent_rows = sorted(cents.collect(), key=lambda r: r["cluster"])
    # one-parse literal struct array (r11 optimization; see
    # functions/lit_fast.py — per-element F.lit is 2-4 Py4J round-trips,
    # and this runs once per query build over nlist x dim values).
    from ..functions.lit_fast import _scalar_sql

    cents_lit = F.expr(
        "array("
        + ",".join(
            "named_struct('cluster', {c}, 'cvec', array({v}))".format(
                c=int(r["cluster"]),
                v=",".join(
                    _scalar_sql(float(x), "DOUBLE") for x in r["cvec"]
                ),
            )
            for r in cent_rows
        )
        + ")"
    )
    ranked = F.transform(
        cents_lit,
        lambda c: F.struct(
            (-dot(F.col("qv"), c["cvec"])).alias("negdot"),
            c["cluster"].alias("cluster"),
        ),
    )
    probe_arr = F.slice(F.array_sort(ranked), 1, nprobe)
    probes = uq.withColumn(
        "cluster", F.explode(F.transform(probe_arr, lambda s: s["cluster"]))
    ).select("query_id", "qv", "cluster")
    scored = (
        probes.join(assign, "cluster")
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
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def centroids_per_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid as (label, pos, avg) rows — decimal-exact mean so
    results are engine-comparable; posexplode + partial-aggregating groupBy."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "component"),
    )
    # Exact fixed-point aggregation: floor(x * 2^40) is an exact integer for
    # float32 inputs of ordinary magnitude, so the sum is order-independent
    # (no float-addition reordering, no decimal rounding ties).
    scale = 1099511627776.0  # 2^40
    scaled = F.floor(F.col("component").cast("double") * F.lit(scale)).cast("long")
    return exploded.groupBy("label", "pos").agg(
        (F.sum(scaled).cast("double") / F.count(F.lit(1)) / F.lit(scale)).alias(
            "avg_component"
        ),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric absmax int8 quantization of unit vectors: q = round(u*127).

    Normalizing FIRST makes the quantized dot product a direct cosine
    estimate: cos ~= dot(qa, qb) / 127^2, max error ~ d * (1/127).  At
    scale this is the candidate-generation representation — 4x smaller
    than float32 and integer-SIMD friendly."""
    u = unit_vectors(df, id_col, vec_col, "qid", "uv")
    q = F.transform("uv", lambda x: F.round(x * 127).cast("long"))
    return u.select(F.col("qid").alias(id_col), q.alias("qvec"))


def ann_int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: int8 candidate scoring, exact float re-rank.

    Stage 1 scores every pair on the quantized integer dot product (cheap,
    SIMD-friendly; in a production engine the int8 matrix also fits caches
    4x better) and keeps ``k * rerank_factor`` candidates per query.
    Stage 2 re-scores ONLY those candidates with the exact float cosine
    and returns the top-k. Recall < 1 is possible only when quantization
    error reorders neighbors past the rerank horizon — pinned by a recall
    test against the exact brute-force baseline."""
    qq = F.broadcast(
        quantize_int8(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    )
    cq = quantize_int8(corpus, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    int_scored = (
        qq.crossJoin(cq)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(qq.qvec, cq.qvec, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("int_score"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("int_score").desc(), F.col("neighbor_id")
    )
    candidates = int_scored.withColumn("crank", F.row_number().over(w1)).where(
        F.col("crank") <= k * rerank_factor
    )
    # exact re-rank of the shortlisted pairs only
    qu = F.broadcast(
        unit_vectors(queries, id_col, vec_col, "query_id", "qv")
    )
    cu = unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv")
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        candidates.join(qu, "query_id")
        .join(cu, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def srp_signs(d: int, m: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix from md5(i:j) parity — the same
    construction the ``embed_random_projection`` registry query pins against
    its exact-arithmetic DuckDB oracle."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(m)
    ]


def ann_srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 32,
    rerank_factor: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN via signed random projection (Johnson-Lindenstrauss):
    shortlist on the m-dim projected dot product, exact cosine re-rank.

    The ±1 matrix is a plan literal, so stage 1 is a per-row codegen
    expression — projecting a 100 TB corpus is a shuffle-free map, and the
    m-dim candidate scoring moves d/m× less data than exact scoring.
    Recall < 1 happens when JL distortion (std ≈ sqrt((1+ρ²)/m) on each
    pair dot) reorders neighbors past the rerank horizon. The synthetic
    fixture corpus is near-isotropic — cosine gaps are tiny, the
    adversarial case for JL shortlists — so defaults are conservative
    (m=d/2, 32× rerank ≈ one third of a 500-vector corpus, still a 3×
    candidate cut); anisotropic real embedding corpora separate far
    better at small m. Pinned by the recall test."""
    d = len(corpus.select(vec_col).first()[0])
    # one-parse literal matrix (r11 optimization; functions/lit_fast.py)
    rmat = sql_matrix(srp_signs(d, m), "DOUBLE")

    def project(vec: Column) -> Column:
        return F.transform(
            rmat,
            lambda row: F.aggregate(
                F.zip_with(vec, row, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )

    uq = unit_vectors(queries, id_col, vec_col, "query_id", "qv").withColumn(
        "pq", project(F.col("qv"))
    )
    uc = unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv").withColumn(
        "pc", project(F.col("cv"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("proj_score").desc(), F.col("neighbor_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(uq)
        .crossJoin(uc)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "qv",
            "cv",
            dot(F.col("pq"), F.col("pc")).alias("proj_score"),
        )
        .withColumn("crank", F.row_number().over(w1))
        .where(F.col("crank") <= k * rerank_factor)
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _subvectors(df: DataFrame, id_alias: str, vec_col: str, nsub: int, dsub: int) -> DataFrame:
    """(id, sub, subvec) — split each vector into nsub contiguous slices."""
    slices = F.array(
        *[F.slice(F.col(vec_col), s * dsub + 1, dsub) for s in range(nsub)]
    )
    return df.select(id_alias, F.posexplode(slices).alias("sub", "subvec"))


def pq_index(
    corpus_unit: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    nsub: int = 8,
    ksub: int = 16,
    iters: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization index: per-subspace codebooks (k-means, the same
    deterministic Lloyd discipline as ``ivf_index``: init by id mix, means
    summed in id order, argmin ties by code) and per-vector codes.

    Scale shape per round: one Arrow grouped aggregate (nsub*ksub rows out)
    and one broadcast-join argmin — the corpus shuffles only on its own
    partitioning. Returns (codes [id, sub, code], cents [sub, code, cvec]).
    """
    if iters < 1:
        raise ValueError("pq_index needs at least one Lloyd round")
    dsub = dim // nsub
    spark = corpus_unit.sparkSession
    n_par = spark.sparkContext.defaultParallelism
    corpus_unit = corpus_unit.repartition(n_par, F.col(id_col)).persist()
    sv = _subvectors(corpus_unit, id_col, vec_col, nsub, dsub)
    # Same distributed-Lloyd discipline as ivf_index: per round ONE
    # map-side-combinable fixed-point component aggregate (nsub*ksub*dsub
    # rows of bounded codebook state — the grouped-UDF formulation would
    # funnel every subvector into nsub*ksub reducers), collected and
    # re-broadcast; re-encoding is a vectorized numpy argmin per Arrow
    # batch (ties to the lowest code, matching an (_d ASC, code ASC) sort).
    codes = sv.select(
        id_col,
        "sub",
        ((F.col(id_col) + F.col("sub")) % ksub).cast("int").alias("code"),
        "subvec",
    )
    cent_rows: list = []
    for _ in range(iters):
        sums = (
            codes.select("sub", "code", F.posexplode("subvec").alias("pos", "c"))
            .groupBy("sub", "code", "pos")
            .agg(
                F.sum(F.floor(F.col("c") * _FP_SCALE).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        cents_np = np.zeros((nsub, ksub, dsub))
        present = np.zeros((nsub, ksub), dtype=bool)
        for r in sums:
            cents_np[r["sub"], r["code"], r["pos"]] = r["s"] / r["n"] / _FP_SCALE
            present[r["sub"], r["code"]] = True

        def encode(batches, cents_np=cents_np, present=present):
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                ).reshape(len(pdf), nsub, dsub)
                out_ids, out_subs, out_codes, out_sv = [], [], [], []
                for s in range(nsub):
                    # (n, ksub) squared distances; empty codes masked out.
                    d2 = ((mat[:, s, None, :] - cents_np[None, s]) ** 2).sum(-1)
                    d2[:, ~present[s]] = np.inf
                    best = d2.argmin(axis=1)  # first min => lowest code
                    out_ids.append(pdf[id_col].to_numpy())
                    out_subs.append(np.full(len(pdf), s))
                    out_codes.append(best)
                    out_sv.extend(list(mat[:, s, :]))
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(out_ids),
                        "sub": np.concatenate(out_subs),
                        "code": np.concatenate(out_codes),
                        "subvec": out_sv,
                    }
                )

        codes = corpus_unit.mapInPandas(
            encode,
            schema=f"{id_col} long, sub int, code int, subvec array<double>",
        )
        cent_rows = [
            (s, c, [float(x) for x in cents_np[s, c]])
            for s in range(nsub)
            for c in range(ksub)
            if present[s, c]
        ]
    cents = spark.createDataFrame(
        cent_rows, "sub int, code int, cvec array<double>"
    )
    return codes, cents


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nsub: int = 8,
    ksub: int = 16,
    rerank_factor: int = 48,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN via product quantization with asymmetric distance
    computation (ADC): corpus vectors compress to nsub byte codes; each
    query precomputes a (sub, code) -> partial-dot lookup table against the
    codebooks (nsub*ksub entries, broadcast); the approximate score of a
    pair is the sum of nsub table lookups — an equi-join on (sub, code)
    plus a map-side-combining aggregate, never a full-dimension product.
    Exact float cosine re-ranks the shortlist. The near-isotropic fixture
    corpus is the adversarial case for coarse codebooks (like SRP), hence
    the generous rerank horizon; recall pinned by test."""
    d = len(corpus.select(vec_col).first()[0])
    uq = unit_vectors(queries, id_col, vec_col, "query_id", "qv").persist()
    uc = unit_vectors(corpus, id_col, vec_col, "neighbor_id", "cv").persist()
    codes, cents = pq_index(uc, "neighbor_id", "cv", d, nsub, ksub)
    qsub = _subvectors(uq, "query_id", "qv", nsub, d // nsub)
    table = (
        qsub.join(F.broadcast(cents), "sub")
        .select(
            "query_id",
            "sub",
            "code",
            dot(F.col("subvec"), F.col("cvec")).alias("part"),
        )
    )
    approx = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("part").alias("adc_score"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    shortlist = approx.withColumn("crank", F.row_number().over(w1)).where(
        F.col("crank") <= k * rerank_factor
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.join(F.broadcast(uq), "query_id")
        .join(uc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_ivf(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    nlist: int = 8,
    nassign: int = 2,
    iters: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """APPROXIMATE embedding near-dup: candidate pairs restricted to shared
    IVF inverted lists, exact cosine within — the semantic-dedup shape that
    survives 100 TB, where :func:`embedding_near_dup`'s exact all-blocks
    product cannot.  Each vector registers in its ``nassign`` closest lists
    (multi-assignment: a pair is a candidate if ANY list is shared, which
    recovers most borderline cross-list pairs); pair work is ≈
    nassign²/nlist of N² for balanced lists, so the knob only wins when
    nlist ≫ nassign² — at fixture scale (nlist=8) this demonstrates the
    SHAPE, while production sizes nlist to thousands.  Recall vs the exact
    operator is pinned by test.  Each list's pairwise scoring is one numpy
    GEMM per Arrow group (at larger list sizes, shard lists with the same
    blocked packing as the exact operator); same-pair hits from multiple
    shared lists are collapsed by a distinct on the (a, b) key."""
    import pandas as pd

    u = unit_vectors(df, id_col, vec_col, "vid", "uv")
    assign1, cents = ivf_index(u, "vid", "uv", nlist, iters)
    # Multi-assignment: rank ALL centroids per vector, keep the top-nassign.
    cent_rows = sorted(cents.collect(), key=lambda r: r["cluster"])
    cmat = np.array([r["cvec"] for r in cent_rows])  # (m, dim)
    m = len(cent_rows)
    p = min(nassign, m)

    def multi_assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = pdf["uv"].to_numpy()
            mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
            dots = mat @ cmat.T  # (n, m)
            # top-p clusters per row; ties to lowest cluster id via stable
            # argsort on (-dot, cluster-index natural order)
            order = np.argsort(-dots, axis=1, kind="stable")[:, :p]
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy().repeat(p),
                    "uv": [v for v in vecs for _ in range(p)],
                    "cluster": order.reshape(-1).astype("int32"),
                }
            )

    assign = u.repartition(
        u.sparkSession.sparkContext.defaultParallelism, F.col("vid")
    ).mapInPandas(
        multi_assign, schema="vid long, uv array<double>, cluster int"
    )

    def list_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vid")
        ids = pdf["vid"].to_numpy(dtype="int64")
        mat = np.stack([np.asarray(v, dtype="float64") for v in pdf["uv"]])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        sims = np.round(sims[ia, ib], round_digits)
        keep = sims >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cos_sim": sims[keep],
            }
        )

    return (
        assign.groupBy("cluster")
        .applyInPandas(
            list_pairs, schema="vec_a long, vec_b long, cos_sim double"
        )
        .distinct()  # a pair found via several shared lists counts once
    )


def gram_covariance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 20,
    round_digits: int = 8,
) -> DataFrame:
    """Exact covariance matrix of the embedding columns: rows (i, j, cov)
    for i <= j, cov = E[x_i x_j] - E[x_i] E[x_j].

    Determinism contract: components are fixed-pointed FIRST
    (``floor(double(x) * 2**scale_bits)`` — exact, float->double widening
    and power-of-two scaling are lossless), all sums run over exact
    integers (decimal(38,0): the cross-moment sum reaches ~2^70 at 5k
    vectors), and the single float division happens once per output cell —
    so the result is bit-reproducible in SQL (cov_ij = (n*Sxy - Sx*Sy) /
    2^(2*scale_bits) / n^2).

    Scale shape: posexplode -> self-join on the vector id (co-partitioned,
    AQE-local) -> one hash aggregation per (i, j) cell; output is dim^2
    rows regardless of N. At 100 TB the same statistics come from
    mapInPandas partial X^T X Gram blocks tree-reduced to the driver —
    dim x dim state either way; this expression form is the
    oracle-checkable fixture path.
    """
    two_p = float(2 ** (2 * scale_bits))
    q = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("i", "x"),
    ).select(
        "_id",
        "i",
        F.floor(F.col("x").cast("double") * (2 ** scale_bits))
        .cast("decimal(38,0)")
        .alias("qx"),
    )
    a, b = q.alias("a"), q.alias("b")
    cross = (
        a.join(b, (F.col("a._id") == F.col("b._id")) & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.col("a.qx") * F.col("b.qx")).alias("sxy"),
        )
    )
    marg = q.groupBy("i").agg(F.sum("qx").alias("sx"))
    mi = marg.select(F.col("i").alias("i"), F.col("sx").alias("sx_i"))
    mj = marg.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    return (
        cross.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j"))
                .cast("double")
                / F.lit(two_p)
                / F.col("n").cast("double")
                / F.col("n").cast("double"),
                round_digits,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def pca_whiten(
    df: DataFrame,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    eps: float = 1e-9,
) -> DataFrame:
    """PCA whitening: project each embedding onto the top ``n_components``
    principal axes scaled to unit variance — the standard preprocessing
    before ANN indexing / SemDeDup-style clustering (decorrelated,
    isotropic space makes euclidean = mahalanobis).

    Bounded-state pattern: the covariance matrix (dim x dim doubles — the
    ONLY collect, a few KB regardless of N) is aggregated distributed via
    :func:`gram_covariance`, eigendecomposed on the driver (numpy eigh,
    O(dim^3) once), and the whitening matrix ships back as a broadcast
    literal inside an Arrow-batched mapInPandas GEMM. Eigenvector sign is
    fixed deterministically (largest-|coefficient| made positive) so
    output is reproducible. Rows-only check: eigen-solves are not
    SQL-expressible; unit tests pin identity-covariance output.
    """
    import numpy as np

    cov_rows = gram_covariance(
        df, id_col=id_col, vec_col=vec_col, round_digits=12
    ).collect()
    dim = max(r.j for r in cov_rows) + 1
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order]  # dim x k
    lam = vals[order]
    # sign convention: per component, the largest-|coeff| entry is positive
    for c in range(comps.shape[1]):
        ix = int(np.abs(comps[:, c]).argmax())
        if comps[ix, c] < 0:
            comps[:, c] = -comps[:, c]
    w = (comps / np.sqrt(lam + eps)).astype("float64")  # dim x k
    # per-position means for centering (second tiny aggregate, dim rows)
    mu = np.zeros(dim)
    mu_rows = (
        df.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    for r in mu_rows:
        mu[r.i] = r.m
    spark = df.sparkSession
    b_w = spark.sparkContext.broadcast(w)
    b_mu = spark.sparkContext.broadcast(mu)
    src = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["v"].to_numpy()) - b_mu.value
            y = np.round(x @ b_w.value, round_digits)
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(y.shape[1]),
                    "pos": np.tile(np.arange(y.shape[1]), len(pdf)),
                    "whitened": y.reshape(-1),
                }
            )
            yield out

    return src.mapInPandas(
        project, schema="vec_id long, pos int, whitened double"
    ).orderBy("vec_id", "pos")


def kcenter_greedy(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (Gonzalez): returns the k chosen center rows as
    (order, vec_id, radius) where ``radius`` is the max nearest-center
    distance over the corpus BEFORE this center was added (so radius of
    center m is the coverage bound achieved by the first m-1 centers —
    the classic 2-approximation certificate, non-increasing).

    Iteration shape (the bounded-driver-loop pattern): k passes, each one
    distributed job — broadcast the newest center's vector (dim doubles),
    relax every row's running nearest-distance with one zip_with
    euclidean, take the global argmax via max(struct(dist, -id)). The
    relaxed distances persist between iterations (cached, O(N) state on
    executors, k x dim state on the driver). Ties break to the LOWEST id
    deterministically. Start center: lowest id.
    """
    src = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    first = src.orderBy("_id").limit(1).collect()[0]
    centers = [(0, first["_id"], None)]
    center_vec = first["v"]

    def dist_to(vec: list[float]):
        # one-parse literal vector (r11 optimization; functions/lit_fast.py)
        lit = sql_array([float(x) for x in vec], "DOUBLE")
        return F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    cur = src.select("_id", "v", dist_to(center_vec).alias("d")).cache()
    try:
        for m in range(1, k):
            far = cur.agg(
                F.max(F.struct(F.col("d").alias("d"), (-F.col("_id")).alias("nid")))
                .alias("s")
            ).collect()[0]["s"]
            next_id = -far["nid"]
            radius = far["d"]
            vec = cur.where(F.col("_id") == next_id).collect()[0]["v"]
            centers.append((m, next_id, round(radius, 6)))
            nxt = cur.select(
                "_id", "v", F.least(F.col("d"), dist_to(vec)).alias("d")
            ).cache()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return df.sparkSession.createDataFrame(
        centers, "center_order int, vec_id long, radius double"
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "doc_id",
    score_col: str = "rel",
    vec_col: str = "v",
    round_digits: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance rerank of a DEPTH-BOUNDED candidate set:
    greedily pick argmax(lam * relevance - (1-lam) * max cosine to the
    already-selected), ties to the lowest id — the diversity pass between
    retrieval and the context window (near-duplicate passages crowd out
    coverage; MMR trades a little relevance for it).

    Scale contract: MMR is quadratic in its INPUT, so the input must be a
    retriever's top-N (N <= ~100), never a corpus — the collect here is
    bounded by that depth (same bounded-state rule as the IVF centroid
    collect). The candidate scoring that feeds it is the distributed
    part. Deterministic: numpy argmax with explicit (score, -id)
    tie-break, scores rounded before comparison.  Known boundary (r8
    degenerate-fixture2): the pairwise cosines come from a numpy GEMM
    whose summation association differs from a SQL fold's, so on
    adversarial vectors (exact negated duplicates) a score can land one
    last-ulp across the 6dp rounding edge vs the oracle — selection and
    ranks still match; the reported score may differ by 1e-6.  The
    floor-before-sum contract's accepted residual, same as
    ml_logreg_gd_train's libm note.
    """
    import numpy as np

    rows = candidates.select(id_col, score_col, vec_col).collect()
    if not rows:
        return candidates.sparkSession.createDataFrame(
            [], f"rank int, {id_col} long, mmr_score double"
        )
    ids = np.array([r[id_col] for r in rows])
    rel = np.array([float(r[score_col]) for r in rows])
    mat = np.stack([np.asarray(r[vec_col], dtype="float64") for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    selected: list[int] = []
    out = []
    for rank in range(min(k, len(rows))):
        if selected:
            max_sim = sims[:, selected].max(axis=1)
        else:
            max_sim = np.zeros(len(rows))
        score = np.round(lam * rel - (1 - lam) * max_sim, round_digits)
        score[selected] = -np.inf
        best = int(
            min(
                range(len(rows)),
                key=lambda i: (-score[i], ids[i]),
            )
        )
        out.append((rank + 1, int(ids[best]), float(score[best])))
        selected.append(best)
    return candidates.sparkSession.createDataFrame(
        out, f"rank int, {id_col} long, mmr_score double"
    )
