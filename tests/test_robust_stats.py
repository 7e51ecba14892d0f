"""Robust / nonparametric stats operators: pure-Python reference checks
for Mann-Whitney U, Theil-Sen, and the two-phase quantile selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table
from projeto_de_etl_com_api_do_meta_spark.queries.robust_stats import (
    agg_quantile_sketch_md5,
    ml_mann_whitney_u,
    ml_theil_sen_daily,
)

SF = "/root/testdata/sf0.001"


def _rankdata(xs):
    """Average ranks (1-based) with ties, pure Python."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_mann_whitney_matches_reference(spark):
    """U and the tie-corrected z agree with a brute-force rank computation."""
    ev = (
        load_table(spark, SF, "events")
        .where(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "view")
        )
        .select("event_type", F.round(F.col("value") * 100, 0).alias("v"))
        .collect()
    )
    vals = [int(r["v"]) for r in ev]
    grp = [1 if r["event_type"] == "click" else 0 for r in ev]
    ranks = _rankdata(vals)
    n1 = sum(grp)
    n0 = len(grp) - n1
    r1 = sum(r for r, g in zip(ranks, grp) if g == 1)
    u1 = r1 - n1 * (n1 + 1) / 2

    row = ml_mann_whitney_u(spark, SF).collect()[0]
    assert row["n_click"] == n1 and row["n_view"] == n0
    assert row["u1_half"] == int(round(2 * u1))

    # tie-corrected z
    from collections import Counter

    n = n1 + n0
    tie = sum(t**3 - t for t in Counter(vals).values())
    assert row["tie_sum"] == tie
    var = n1 * n0 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n0 / 2) / var**0.5
    assert abs(row["z"] - z) < 1e-5


def test_theil_sen_matches_bruteforce(spark):
    """Median pairwise slope equals the lower-median over all day pairs."""
    ev = (
        load_table(spark, SF, "events")
        .where(
            F.col("value").isNotNull()
            & (F.col("event_type") == "purchase")
        )
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0)).alias("y"))
        .collect()
    )
    days = sorted((r["d"], int(r["y"])) for r in ev)
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            dx = (days[j][0] - days[i][0]).days
            dy = days[j][1] - days[i][1]
            slopes.append((dy / dx, days[i][0], days[j][0], dy, dx))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1]

    row = ml_theil_sen_daily(spark, SF).collect()[0]
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == len(slopes)
    assert (row["med_dy_e2"], row["med_dx"]) == (med[3], med[4])
    assert abs(row["med_slope"] - med[0] / 100.0) < 1e-5


def test_quantile_twin_two_phase_equals_direct(spark):
    """The bin-then-refine selection returns the exact lower median of each
    deterministic sample, and the sample shrinks ~4x per rate step."""
    li = load_table(spark, SF, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("x"),
        F.conv(
            F.substring(
                F.md5(
                    (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast(
                        "string"
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("lane"),
    )
    rows = [(int(r["x"]), int(r["lane"])) for r in li.collect()]
    out = {r["k"]: r for r in agg_quantile_sketch_md5(spark, SF).collect()}
    assert set(out) == {4, 16, 64}
    n_full = len(rows)
    for k in (4, 16, 64):
        samp = sorted(x for x, lane in rows if lane % k == 0)
        assert out[k]["n_sample"] == len(samp)
        med = samp[(len(samp) + 1) // 2 - 1]
        assert out[k]["med_e2"] == med
        assert out[k]["rank_le"] == sum(1 for x, _ in rows if x <= med)
        err = abs(2 * out[k]["rank_le"] - n_full) * 1_000_000 // (2 * n_full)
        assert out[k]["rank_err_ppm"] == err
    # realized error grows as the sample shrinks but stays sane at 1/64
    assert out[64]["rank_err_ppm"] < 250_000
