"""Operator robustness on EMPTY inputs — every operator must return an empty
result with the right schema, never raise."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<double>")


def test_dedup_ops_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        jaccard_pairs,
        minhash_near_dup,
        simhash_near_dup,
    )

    docs = _empty_docs(spark)
    assert exact_dedup(docs).count() == 0
    assert jaccard_pairs(docs).count() == 0
    assert minhash_near_dup(docs).count() == 0
    assert simhash_near_dup(docs).count() == 0
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_similarity_ops_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup,
        lsh_topk,
    )

    vecs = _empty_vecs(spark)
    assert brute_force_topk(vecs, vecs).count() == 0
    assert lsh_topk(vecs, vecs).count() == 0
    assert embedding_near_dup(vecs).count() == 0


def test_text_ops_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        doc_stats,
        predict_lang,
        winnow_fingerprints,
    )

    docs = _empty_docs(spark)
    assert doc_stats(docs).count() == 0
    assert predict_lang(docs).count() == 0
    assert winnow_fingerprints(docs).count() == 0


def test_asof_and_quality_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.asof import asof_join
    from projeto_de_etl_com_api_do_meta_spark.operators.quality import (
        null_rate_report,
        uniqueness_violations,
    )

    left = spark.createDataFrame([], "id long, user_id long, ts timestamp")
    right = spark.createDataFrame([], "rid long, user_id long, ts timestamp")
    assert asof_join(left, right, key="user_id", ts="ts", payload_cols=["rid"]).count() == 0
    empty = spark.createDataFrame([], "k long, v string")
    report = null_rate_report(empty, ["k", "v"]).collect()
    assert {r.column for r in report} == {"k", "v"}
    assert all(r.n_rows == 0 for r in report)
    assert uniqueness_violations(empty, ["k"]).count() == 0


def test_containment_and_bloom_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.dedup import (
        containment_pairs,
    )
    from projeto_de_etl_com_api_do_meta_spark.operators.text import (
        bloom_build,
        bloom_might_contain,
    )

    docs = _empty_docs(spark)
    assert containment_pairs(docs).count() == 0
    # Empty member set -> all-zero bitset -> gate admits nothing.
    bits = bloom_build(
        spark.createDataFrame([], "v string"), "v", 1 << 10, 3
    )
    assert not any(bits)
    probe = spark.createDataFrame([("x",), ("y",)], "v string")
    assert probe.where(bloom_might_contain(bits, "v", 1 << 10, 3)).count() == 0


def test_round6_ops_on_empty(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.indexing import (
        bestfit_pack,
    )
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        kmv_distinct,
        kmv_set_ops,
        kmv_sketch,
    )
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        gram_covariance,
    )

    ids = spark.createDataFrame([], "x long")
    assert kmv_sketch(ids, "x", 16).count() == 0
    row = kmv_distinct(ids, "x", 16).collect()[0]
    assert row.exact_distinct == 0  # estimate falls back to sketch size 0
    assert row.est_distinct == 0.0
    ops = kmv_set_ops(ids, ids, "x", 16).collect()[0]
    assert ops.est_union == 0.0
    items = spark.createDataFrame([], "shard long, doc_id long, n_tok long")
    assert bestfit_pack(items, "shard", "doc_id", "n_tok", 100).count() == 0
    vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert gram_covariance(vecs).count() == 0
