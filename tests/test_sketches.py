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


def test_hll_register_contract(spark):
    """Registers: at most m=64 per group, ranks in [1, 55]."""
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        HLL_M,
        hll_registers,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k", []).collect()
    assert 0 < len(regs) <= HLL_M
    assert all(1 <= r["max_rank"] <= 55 for r in regs)
    assert all(0 <= r["reg_idx"] < HLL_M for r in regs)


def test_hll_merge_equals_sketch_of_union(spark):
    """Element-wise register MAX of two halves == sketch of the whole —
    the associativity that makes HLL state mergeable across partitions
    and days without rescanning."""
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    lo = spark.range(0, 3000).select(F.col("id").alias("k"))
    hi = spark.range(1500, 6000).select(F.col("id").alias("k"))  # overlap
    both = lo.unionByName(hi)
    tag = lambda df, t: hll_registers(df, "k", []).withColumn(  # noqa: E731
        "part", F.lit(t)
    )
    merged = {
        (r["reg_idx"], r["max_rank"])
        for r in hll_merge(
            tag(lo, "a").unionByName(tag(hi, "b")).drop("part"), []
        ).collect()
    }
    direct = {
        (r["reg_idx"], r["max_rank"])
        for r in hll_registers(both, "k", []).collect()
    }
    assert merged == direct


def test_hll_estimate_error_within_bound(spark):
    """Relative error within ~3 sigma of the 1.04/sqrt(m) HLL bound on a
    high-cardinality domain (raw-estimate branch)."""
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        HLL_M,
        hll_estimate,
        hll_registers,
    )

    n = 50_000
    df = spark.range(0, n).select(F.col("id").alias("k"))
    row = hll_estimate(hll_registers(df, "k", []), []).collect()[0]
    rel = abs(row["est_distinct"] - n) / n
    assert rel < 3 * 1.04 / (HLL_M ** 0.5), rel
    assert row["n_zero"] == 0


def test_hll_duplicates_are_absorbed(spark):
    """MAX-register state is insensitive to duplication (the no-distinct
    property that keeps the scan shuffle-free)."""
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    base = spark.range(0, 2000).select(F.col("id").alias("k"))
    dup = base.unionByName(base).unionByName(base)
    a = hll_estimate(hll_registers(base, "k", []), []).collect()[0]
    b = hll_estimate(hll_registers(dup, "k", []), []).collect()[0]
    assert a["sum_inv"] == b["sum_inv"] and a["est_distinct"] == b["est_distinct"]


def test_hll_running_daily_monotone_and_consistent(spark):
    """Cumulative register merge: day-D estimate equals a fresh sketch of
    all data <= D (spot-checked on the last day), and sum_inv is
    non-increasing over days (registers only grow)."""
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_sketches import (
        agg_hll_running_daily,
    )

    sf = "/root/testdata/sf0.001"
    rows = agg_hll_running_daily(spark, sf).collect()
    assert rows == sorted(rows, key=lambda r: r["d"])
    invs = [r["sum_inv"] for r in rows]
    assert all(a >= b for a, b in zip(invs, invs[1:]))
    ev = load_table(spark, sf, "events").where(F.col("user_id").isNotNull())
    fresh = hll_estimate(hll_registers(ev, "user_id", []), []).collect()[0]
    assert rows[-1]["sum_inv"] == fresh["sum_inv"]
    assert rows[-1]["est_cume_users"] == fresh["est_distinct"]
