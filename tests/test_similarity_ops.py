"""Similarity operator semantics: brute-force cosine top-k, LSH ANN recall,
label centroids."""

from __future__ import annotations

import math

from projeto_de_etl_com_api_do_meta_spark.io import load_table
from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
    brute_force_topk,
    centroids_per_label,
    lsh_topk,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_orders_by_cosine(spark):
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),   # nearly parallel to 0
            (2, [0.0, 1.0]),   # orthogonal to 0
            (3, [-1.0, 0.0]),  # opposite to 0
        ],
    )
    out = brute_force_topk(df.where("vec_id = 0"), df, k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert abs(out[0].cos_sim - 0.9 / math.hypot(0.9, 0.1)) < 1e-6
    assert out[1].cos_sim == 0.0
    assert out[2].cos_sim == -1.0


def test_lsh_topk_recall_on_fixtures(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 10")
    exact = brute_force_topk(queries, emb, k=5).collect()
    approx = lsh_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 hyperplanes / 256 buckets over 500 vectors: recall is partial by
    # design; the gate is "clearly better than random" (random ~ 5/500).
    assert recall > 0.2, f"LSH recall {recall} too low"


def test_centroids_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<float>",
    )
    got = {
        (r.label, r.pos): (r.avg_component, r.n_vectors)
        for r in centroids_per_label(df).collect()
    }
    assert got[(0, 0)] == (2.0, 2)
    assert got[(0, 1)] == (3.0, 2)
    assert got[(1, 0)] == (10.0, 1)
    assert got[(1, 1)] == (20.0, 1)


def test_embedding_near_dup_exact_pairs(spark):
    import math

    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        embedding_near_dup,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),     # same direction as 0 -> cos 1.0
        (2, [0.0, 1.0]),     # orthogonal to 0/1 -> cos 0.0
        (3, [1.0, 1.0]),     # cos 1/sqrt(2) with 0/1 and 2
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in embedding_near_dup(df, threshold=0.5).collect()
    }
    inv_sqrt2 = round(1 / math.sqrt(2), 6)
    assert got == {
        (0, 1): 1.0,
        (0, 3): inv_sqrt2,
        (1, 3): inv_sqrt2,
        (2, 3): inv_sqrt2,
    }


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(queries, emb, k=3).collect()
    # Probing every inverted list degenerates IVF to exact brute force.
    full = ivf_topk(queries, emb, k=3, nlist=4, nprobe=4, iters=1).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, exact), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, full), key=lambda t: (t[0], t[3])
    )


def test_ivf_partial_probe_is_subset_with_full_k(spark, sf_dir):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    rows = ivf_topk(queries, emb, k=3, nlist=4, nprobe=2, iters=1).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_ann_int8_recall_vs_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        ann_int8_topk,
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).collect()
    approx = ann_int8_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # int8 error is ~1/127 per component; with a 4x rerank horizon the
    # top-5 should be nearly perfectly recovered.
    assert recall >= 0.9, recall
    # re-ranked scores are EXACT float cosines: any overlapping pair must
    # carry the identical score in both results.
    exact_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9


def test_ann_srp_recall_vs_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        ann_srp_topk,
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).collect()
    approx = ann_srp_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # The near-isotropic fixture corpus is JL's adversarial case; with
    # m=32 and a 32x rerank horizon (~1/3 of the corpus) the top-5 is
    # nearly recovered.
    assert recall >= 0.85, recall
    # Re-ranked scores are exact cosines: overlapping pairs carry the
    # identical score.
    exact_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9


def test_ann_pq_recall_vs_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).collect()
    approx = pq_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # Coarse 8x16 codebooks on a near-isotropic corpus (the adversarial
    # case); the generous rerank horizon recovers the top-5.
    assert recall >= 0.85, recall
    exact_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9


def test_ivf_near_dup_recall_vs_exact(spark, sf_dir):
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup(emb, threshold=0.4).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_ivf(
            emb, threshold=0.4, nlist=8, nassign=3
        ).collect()
    }
    assert exact, "fixtures must contain near-dup pairs"
    # No false positives (exact verify within lists) ...
    assert approx <= exact
    # ... and high recall via multi-assignment.
    assert len(approx & exact) / len(exact) >= 0.9


def test_md5_ann_twins_recall_vs_bruteforce(spark, sf_dir):
    """The md5 oracle twins (deterministic fixed-point LSH / SRP / IVF) must
    stay real ANN algorithms, not just oracle-matching artifacts: their
    results are exact-cosine-scored and overlap the brute-force top-5."""
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        brute_force_topk,
    )
    from projeto_de_etl_com_api_do_meta_spark.queries.embeddings_queries import (
        embed_ann_ivf_md5,
        embed_ann_lsh_md5,
        embed_ann_srp_md5,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    exact_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}

    # SRP twin: 20-candidate integer-dot shortlist then exact re-rank —
    # full result rows, decent recall on the near-isotropic fixture.
    srp = embed_ann_srp_md5(spark, sf_dir).collect()
    srp_set = {(r.query_id, r.neighbor_id) for r in srp}
    assert len(srp_set & exact_set) / len(exact_set) >= 0.5
    # IVF twin: nprobe=2 of 8 lists.
    ivf = embed_ann_ivf_md5(spark, sf_dir).collect()
    ivf_set = {(r.query_id, r.neighbor_id) for r in ivf}
    assert len(ivf_set & exact_set) / len(exact_set) >= 0.3
    # LSH twin: single 8-bit bucket join — sparse candidates by design;
    # anything it returns that brute force also found must carry the
    # IDENTICAL exact cosine (same property for all three twins).
    lsh = embed_ann_lsh_md5(spark, sf_dir).collect()
    for rows in (srp, ivf, lsh):
        for r in rows:
            key = (r.query_id, r.neighbor_id)
            if key in exact_scores:
                assert abs(exact_scores[key] - r.cos_sim) < 1e-9


# ---- round 6: covariance / whitening / k-center ---------------------------


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_gram_covariance_matches_numpy(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        gram_covariance,
    )

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 5)).astype("float32")
    rows = gram_covariance(_emb_df(spark, mat), round_digits=8).collect()
    # fixed-point the SAME way the operator does before comparing
    q = np.floor(mat.astype("float64") * 2**20)
    expect = np.cov(q.T, bias=True) / 2**40
    for r in rows:
        assert abs(r.cov - expect[r.i, r.j]) < 1e-6, (r.i, r.j)


def test_pca_whiten_decorrelates(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        pca_whiten,
    )

    rng = np.random.default_rng(11)
    # anisotropic data: component 0 has 10x the variance of component 1
    base = rng.normal(size=(300, 4))
    base[:, 0] *= 10
    out = pca_whiten(_emb_df(spark, base.astype("float32")), n_components=3)
    pdf = out.toPandas().pivot(index="vec_id", columns="pos",
                               values="whitened")
    y = pdf.to_numpy()
    cov = np.cov(y.T, bias=True)
    # whitened covariance ~ identity
    assert np.allclose(cov, np.eye(3), atol=0.05), cov


def test_kcenter_radius_non_increasing_and_deterministic(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        kcenter_greedy,
    )

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(100, 6)).astype("float32")
    df = _emb_df(spark, mat)
    a = kcenter_greedy(df, k=5).collect()
    b = kcenter_greedy(df, k=5).collect()
    assert [r.vec_id for r in a] == [r.vec_id for r in b]  # deterministic
    radii = [r.radius for r in a if r.radius is not None]
    assert radii == sorted(radii, reverse=True)  # coverage only improves
    assert a[0].vec_id == 0  # starts at lowest id
