"""Semantics tests for ml_queries: k-means invariants, degree-distribution
conservation, and length-bucket batch accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table
from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
    _BATCH,
    _BUCKET_W,
    _K,
    embed_kmeans_lloyd,
    graph_degree_distribution,
    train_length_bucket_batches,
)


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    out = embed_kmeans_lloyd(spark, sf_dir)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = out.collect()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    assert all(0 <= r.cid < _K for r in rows)
    assert all(r.dist_q >= 0 for r in rows)
    # seed vectors can drift clusters, but every cluster id seen is valid
    assert {r.cid for r in rows} <= set(range(_K))


def test_kmeans_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, embed_kmeans_lloyd(spark, sf_dir).collect()))
    b = sorted(map(tuple, embed_kmeans_lloyd(spark, sf_dir).collect()))
    assert a == b


def test_degree_distribution_conserves_nodes_and_edges(spark, sf_dir):
    out = graph_degree_distribution(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    n_edges = edges.count()
    n_cust = edges.select("o_custkey").distinct().count()
    n_part = edges.select("l_partkey").distinct().count()
    by_side = {}
    edge_mass = {}
    for r in out:
        by_side[r.side] = by_side.get(r.side, 0) + r.n_nodes
        edge_mass[r.side] = edge_mass.get(r.side, 0) + r.degree * r.n_nodes
    assert by_side == {"customer": n_cust, "part": n_part}
    # sum(degree * n_nodes) per side == total distinct edges
    assert edge_mass == {"customer": n_edges, "part": n_edges}


def test_length_buckets_cover_all_docs_without_overflow(spark, sf_dir):
    out = train_length_bucket_batches(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_seqs for r in out) == n_docs
    for r in out:
        assert 1 <= r.n_seqs <= _BATCH
        assert r.padding_waste == r.max_tokens * r.n_seqs - r.sum_tokens
        # every sequence in a batch fits the bucket's token range
        assert _BUCKET_W * r.bucket <= r.max_tokens < _BUCKET_W * (r.bucket + 1)


def test_twolevel_k_rule_matches_sql_isqrt_everywhere():
    """The two-level oracle derives k1 via floor(sqrt(kt)) corrected ±1 in
    pure SQL; it must equal math.isqrt for EVERY corpus size, including
    perfect squares and off-by-one-ulp hazards — a single disagreement
    would silently diverge the whole two-level clustering oracle."""
    import duckdb

    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        _SD_TARGET,
        _tl_dims,
    )

    # every corpus size up to 60k (covers kt 4..600, all fixture scales),
    # plus perfect-square and large-magnitude kt edge cases
    sizes = list(range(1, 60_001, 97)) + [
        (k * k) * _SD_TARGET for k in (2, 3, 10, 31, 100, 1000, 10_000)
    ] + [(k * k - 1) * _SD_TARGET for k in (10, 31, 100, 1000, 10_000)]
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH n(v) AS (SELECT unnest(?::BIGINT[])),
        kp AS (SELECT v, GREATEST(4, v // {_SD_TARGET}) AS kt FROM n),
        g0 AS (SELECT v, kt,
                      CAST(floor(sqrt(CAST(kt AS DOUBLE))) AS BIGINT) AS g
               FROM kp),
        kk AS (SELECT v, kt,
                      GREATEST(2, CASE WHEN g * g > kt THEN g - 1
                                       WHEN (g + 1) * (g + 1) <= kt THEN g + 1
                                       ELSE g END) AS k1
               FROM g0)
        SELECT v, k1, (kt + k1 - 1) // k1 AS k2 FROM kk ORDER BY v
        """,
        [sizes],
    ).fetchall()
    assert len(rows) == len(sizes)
    for v, k1_sql, k2_sql in rows:
        assert (k1_sql, k2_sql) == _tl_dims(v), v


# ---- round 6: distributed logistic-regression GD ---------------------------


def test_logreg_gd_learns_separable_data(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        logreg_gd_train,
    )

    rng = np.random.default_rng(5)
    n, dim = 400, 8
    x = rng.normal(size=(n, dim))
    # linearly separable: label by the sign of a fixed direction
    w_true = np.arange(1, dim + 1, dtype="float64")
    y = (x @ w_true >= 0).astype("int32")
    df = spark.createDataFrame(
        [(int(y[i]), [float(v) for v in x[i]]) for i in range(n)],
        "label int, embedding array<float>",
    )
    out = logreg_gd_train(df, iters=12, lr=1.0).collect()
    acc = out[0].n_correct / out[0].n_rows
    assert acc > 0.9, f"separable data must be learnable, acc={acc}"
    # determinism: a second run is bit-identical (exact integer gradients)
    out2 = logreg_gd_train(df, iters=12, lr=1.0).collect()
    assert [(r.pos, r.weight) for r in out] == [(r.pos, r.weight) for r in out2]


def test_logreg_gd_weights_track_true_direction(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        logreg_gd_train,
    )

    rng = np.random.default_rng(9)
    n, dim = 300, 4
    x = rng.normal(size=(n, dim))
    y = (x[:, 2] >= 0).astype("int32")  # only dim 2 matters
    df = spark.createDataFrame(
        [(int(y[i]), [float(v) for v in x[i]]) for i in range(n)],
        "label int, embedding array<float>",
    )
    w = {r.pos: r.weight for r in logreg_gd_train(df, iters=12, lr=1.0).collect()}
    assert w[2] > 0
    assert w[2] > 3 * max(abs(w[0]), abs(w[1]), abs(w[3]))


def test_isotonic_calibration_properties(spark):
    """PAVA invariants on the fixture: output is non-decreasing in bin,
    mass-preserving within pooled blocks (sum iso*n == sum pos overall),
    and at least one violator bin was actually pooled (iso != raw rate)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        ml_isotonic_calibration,
    )

    rows = ml_isotonic_calibration(spark, "/root/testdata/sf0.001").collect()
    assert rows == sorted(rows, key=lambda r: r["bin"])
    isos = [r["iso_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(isos, isos[1:])), "not monotone"
    total_pos = sum(r["frac_pos"] * r["n"] for r in rows)
    total_iso = sum(r["iso_rate"] * r["n"] for r in rows)
    assert abs(total_pos - total_iso) < 1e-6, "mass not preserved"
    assert any(abs(r["iso_rate"] - r["frac_pos"]) > 1e-9 for r in rows), (
        "fixture produced no violators; pooling untested"
    )
    assert all(0.0 <= v <= 1.0 for v in isos)


def test_bootstrap_ci_poisson_properties(spark):
    """CI brackets the observed mean, is ordered, and has plausible width
    (shrinks like 1/sqrt(n): the half-width should be within an order of
    magnitude of the normal-theory se on the fixture)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        ml_bootstrap_ci_poisson,
    )

    rows = ml_bootstrap_ci_poisson(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["mean_obs"] <= r["ci_hi"], r
        width = r["ci_hi"] - r["ci_lo"]
        assert 0 < width < 2.0 * abs(r["mean_obs"]) + 1.0, r
