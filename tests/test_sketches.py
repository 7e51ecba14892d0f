"""KMV bottom-k sketch semantics: merge rule, estimator error, exact
fallback below k."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
    kmv_distinct,
    kmv_set_ops,
    kmv_sketch,
)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("x"))


def test_kmv_merge_equals_sketch_of_union(spark):
    """bottom-k(sketch(A) union sketch(B)) == sketch(A union B): the
    associativity that lets per-partition/per-day sketches roll up."""
    a, b = _ids(spark, 0, 2000), _ids(spark, 1500, 3500)
    k = 64
    merged = (
        kmv_sketch(a, "x", k)
        .unionByName(kmv_sketch(b, "x", k))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    direct = kmv_sketch(a.unionByName(b), "x", k)
    assert [r.h for r in merged.collect()] == [r.h for r in direct.collect()]


def test_kmv_estimate_error_within_bound(spark):
    """Relative error of the (k-1)/U_(k) estimator concentrates at
    ~1/sqrt(k); allow 4 sigma."""
    n, k = 5000, 256
    row = kmv_distinct(_ids(spark, 0, n), "x", k).collect()[0]
    assert row.exact_distinct == n
    rel_err = abs(row.est_distinct - n) / n
    assert rel_err < 4 / (k ** 0.5), f"rel_err={rel_err}"


def test_kmv_exact_below_k(spark):
    """Fewer distincts than k: the sketch IS the set, estimate is exact."""
    row = kmv_distinct(_ids(spark, 0, 50), "x", k=128).collect()[0]
    assert row.est_distinct == 50.0
    assert row.exact_distinct == 50


def test_kmv_set_ops_overlap_sanity(spark):
    """Disjoint sets estimate ~zero intersection; identical sets estimate
    intersection ~= union."""
    k = 128
    a, b = _ids(spark, 0, 1000), _ids(spark, 5000, 6000)
    row = kmv_set_ops(a, b, "x", k).collect()[0]
    assert row.est_intersection == 0.0
    same = kmv_set_ops(a, a, "x", k).collect()[0]
    assert same.est_intersection == same.est_union
