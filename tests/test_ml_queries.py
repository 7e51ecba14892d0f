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
