"""Round-9b operators: Wasserstein drift, DDSketch quantiles, top paths,
rolling regression, Haar energy, tar shards, geo-grid kNN, soundex
blocking, RANSAC, encoding advisor, bitemporal as-of, BFS closeness —
property and brute-force reference tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_wasserstein_brute_force(spark):
    """W1 equals the brute-force sorted-sample mean |quantile diff|
    computed driver-side (equal-n case uses the coupling formula; here we
    integrate the ECDF gap directly)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.drift_sequence_queries import (
        ml_wasserstein_drift,
    )

    row = ml_wasserstein_drift(spark, SF).collect()[0]
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v"))
        .collect()
    )
    a = sorted(r["v"] for r in ev if r["event_type"] == "click")
    b = sorted(r["v"] for r in ev if r["event_type"] == "purchase")
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    w1_num = 0
    ia = ib = 0
    for x, x_next in zip(xs, xs[1:]):
        while ia < na and a[ia] <= x:
            ia += 1
        while ib < nb and b[ib] <= x:
            ib += 1
        w1_num += abs(ia * nb - ib * na) * (x_next - x)
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["w1_num_e2"] == w1_num
    assert math.isclose(
        row["w1_dollars"], round(w1_num / (na * nb * 100.0), 6), abs_tol=1e-9
    )


def test_ddsketch_bucket_guarantee(spark):
    """Every reported bucket brackets the true rank-r order statistic and
    its width respects the 1/8 relative-error structure."""
    from projeto_de_etl_com_api_do_meta_spark.queries.drift_sequence_queries import (
        agg_ddsketch_quantiles,
    )

    rows = agg_ddsketch_quantiles(spark, SF).collect()
    assert rows
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & (F.round(F.col("value") * 100, 0) >= 1))
        .select("event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["v"])
    for row in rows:
        vals = sorted(by_type[row["event_type"]])
        assert row["n"] == len(vals)
        true = vals[row["rnk"] - 1]
        assert row["lo_e2"] <= true <= row["hi_e2"]
        # structural relative-error: width < lo/8 + 1 for the subbucketed form
        if row["lo_e2"] >= 8:
            assert row["hi_e2"] - row["lo_e2"] + 1 <= max(row["lo_e2"] // 8, 1)


def test_top_paths_cover_all_users(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.drift_sequence_queries import (
        events_top_paths,
    )

    rows = events_top_paths(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # every path is at most 5 hops of known event types
    types = {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 5 and set(steps) <= types


def test_rolling_regression_recompute(spark):
    """Slope/intercept equal a driver-side OLS over each 7-day window."""
    from projeto_de_etl_com_api_do_meta_spark.queries.drift_sequence_queries import (
        window_rolling_regression,
    )

    rows = window_rolling_regression(spark, SF).collect()
    assert rows
    daily = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .orderBy("d")
        .collect()
    )
    series = [(r["d"].toordinal() - 719163, r["y"]) for r in daily]  # epoch day
    by_day = {}
    for i in range(6, len(series)):
        win = series[i - 6 : i + 1]
        sx = sum(x for x, _ in win)
        sy = sum(y for _, y in win)
        sxy = sum(x * y for x, y in win)
        sxx = sum(x * x for x, _ in win)
        num, den = 7 * sxy - sx * sy, 7 * sxx - sx * sx
        by_day[series[i][0]] = (num, den)
        assert den == 196  # consecutive-day invariant
    for r in rows:
        num, den = by_day[r["day"].toordinal() - 719163]
        assert (r["slope_num"], r["slope_den"]) == (num, den)
        assert math.isclose(r["slope_e2_per_day"], round(num / den, 6), abs_tol=1e-9)


def test_haar_parseval_and_reconstruction(spark):
    """Approx coefficient equals total revenue; unnormalized Parseval:
    sum over levels of energy_l / 2^l + approx^2 / 32 == sum val^2."""
    from projeto_de_etl_com_api_do_meta_spark.queries.drift_sequence_queries import (
        events_haar_wavelet_energy,
    )

    rows = {(r["level"], r["kind"]): r for r in events_haar_wavelet_energy(spark, SF).collect()}
    assert len(rows) == 6
    daily = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .orderBy("d")
        .collect()
    )
    vals = [r["y"] for r in daily] + [0] * (32 - len(daily))
    assert rows[(5, "approx")]["energy"] == sum(vals)
    # Parseval for the unnormalized transform (sum/diff without 1/sqrt2):
    # sum(x^2) = approx^2/32 + sum_l detail_energy_l / 2^l
    total = sum(v * v for v in vals)
    recon = rows[(5, "approx")]["energy"] ** 2 / 32 + sum(
        rows[(lv, "detail")]["energy"] / 2**lv for lv in range(1, 6)
    )
    assert math.isclose(total, recon, rel_tol=1e-12)
    for lv, n in [(1, 16), (2, 8), (3, 4), (4, 2), (5, 1)]:
        assert rows[(lv, "detail")]["n_coeffs"] == n


def test_tar_shards_match_source(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.io_archives import (
        io_tar_shard_roundtrip,
    )

    rows = io_tar_shard_roundtrip(spark, SF).collect()
    src = (
        load_table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    )
    src_map = {r["lang"]: (r["n"], r["s"]) for r in src}
    assert {r["lang"] for r in rows} == set(src_map)
    for r in rows:
        n, s = src_map[r["lang"]]
        assert r["n_docs"] == n and r["sum_chars_meta"] == s
        assert r["sum_text_chars"] == s and r["n_len_consistent"] == n


def test_geo_knn_brute_force(spark):
    """Grid answer equals brute force whenever brute-force nearest lies in
    the 3x3 neighborhood; otherwise the op reports a (documented) miss or
    a farther in-neighborhood supplier."""
    from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
        join_geo_grid_knn,
    )

    rows = join_geo_grid_knn(spark, SF).collect()
    cust = {r["c_custkey"]: r for r in rows}
    sups = [
        (k, (k * 40503) % 160000001 - 80000000, (k * 69069) % 360000001 - 180000000)
        for k in range(
            load_table(spark, SF, "supplier").agg(F.min("s_suppkey")).collect()[0][0],
            load_table(spark, SF, "supplier").agg(F.max("s_suppkey")).collect()[0][0] + 1,
        )
    ]

    def cell(lat, lon):
        return ((lat + 80000000) // 20000000, (lon + 180000000) // 20000000)

    checked = 0
    for ck, row in list(cust.items())[:200]:
        lat = (ck * 48271) % 160000001 - 80000000
        lon = (ck * 69621) % 360000001 - 180000000
        best = min(
            ((s[1] - lat) ** 2 + (s[2] - lon) ** 2, s[0]) for s in sups
        )
        ccx, ccy = cell(lat, lon)
        scx, scy = cell(*[c for c in sups if c[0] == best[1]][0][1:])
        if abs(scx - ccx) <= 1 and abs(scy - ccy) <= 1:
            assert row["matched"] and (row["d2_microdeg"], row["nearest_suppkey"]) == best
            checked += 1
    assert checked > 0


def test_soundex_blocking_parity_and_pairs(spark):
    """Spark soundex == the oracle's RE2-safe SQL chain over the live
    vocabulary plus the classic spec vectors."""
    import duckdb

    from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
        _soundex_sql,
        dedup_soundex_blocking,
    )

    rows = dedup_soundex_blocking(spark, SF).collect()
    assert rows and all(len(r["code"]) == 4 for r in rows)
    vocab = [w for r in rows for w in r["words_csv"].split(",")]
    words = vocab + ["robert", "rupert", "ashcraft", "tymczak", "pfister", "honeyman"]
    sp = {
        r["w"]: r["c"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("c"))
        .collect()
    }
    duck = dict(
        duckdb.connect()
        .execute(f"SELECT w, {_soundex_sql('w')} FROM (SELECT unnest(?) AS w)", [words])
        .fetchall()
    )
    assert sp == duck
    # block sizes sum to vocabulary size, pair counts fit C(n,2)
    for r in rows:
        assert r["n_words"] == len(r["words_csv"].split(","))
        assert 0 <= r["n_near_pairs"] <= r["n_words"] * (r["n_words"] - 1) // 2


def test_ransac_consensus_recompute(spark):
    """Reported inlier counts equal a driver-side recount for each model."""
    from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
        _RANSAC_EPS_E2,
        ml_ransac_line_md5,
    )

    rows = ml_ransac_line_md5(spark, SF).collect()
    assert 0 < len(rows) <= 5
    daily = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .orderBy("d")
        .collect()
    )
    pts = [(r["d"].toordinal() - 719163, r["y"]) for r in daily]
    inliers = [r["n_inliers"] for r in rows]
    assert inliers == sorted(inliers, reverse=True)
    for r in rows:
        dx, dy = r["slope_den"], r["slope_num"]
        # the model passes through SOME sampled point; find a consistent
        # anchor among the points and verify the count from it
        counts = set()
        for xi, yi in pts:
            c = sum(
                1
                for x, y in pts
                if abs((y - yi) * dx - (x - xi) * dy) <= _RANSAC_EPS_E2 * abs(dx)
            )
            counts.add(c)
        assert r["n_inliers"] in counts


def test_encoding_advisor_exact_counts(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
        layout_encoding_efficiency,
    )

    rows = {r["col"]: r for r in layout_encoding_efficiency(spark, SF).collect()}
    assert set(rows) == {"event_type", "user_id", "v_e2", "day"}
    ev = (
        load_table(spark, SF, "events")
        .orderBy("event_id")
        .select(
            "event_type",
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("v_e2"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        )
        .collect()
    )
    for col in rows:
        seq = [r[col] for r in ev]
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        assert rows[col]["n"] == len(seq)
        assert rows[col]["n_runs"] == runs
        assert rows[col]["n_distinct"] == len(set(seq))
        assert rows[col]["best_encoding"] in ("plain", "dict", "rle")


def test_bitemporal_as_known_at_monotonicity(spark):
    """The knowledge horizon only adds revisions: totals under the query's
    T are >= totals under rev-0-only knowledge, and every applied rev is
    within 0..2."""
    from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
        warehouse_bitemporal_asof,
    )

    rows = warehouse_bitemporal_asof(spark, SF).collect()
    assert rows
    orders = (
        load_table(spark, SF, "orders")
        .where(F.col("o_orderdate").cast("date") <= F.lit("1997-06-15").cast("date"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    base = {r["o_orderstatus"]: r["n"] for r in orders}
    assert {r["o_orderstatus"] for r in rows} == set(base)
    for r in rows:
        # every order valid by V contributes exactly one as-of row
        assert r["n_orders"] == base[r["o_orderstatus"]]
        assert 0 <= r["sum_rev_applied"] <= 2 * r["n_orders"]


def test_bfs_closeness_invariants(spark):
    """Frontier counts and the exact harmonic x12 identity."""
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        graph_closeness_bfs,
    )

    rows = graph_closeness_bfs(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r["n_reached"] == r["n_d1"] + r["n_d2"] + r["n_d3"] + r["n_d4"]
        assert (
            r["harmonic_x12"]
            == 12 * r["n_d1"] + 6 * r["n_d2"] + 4 * r["n_d3"] + 3 * r["n_d4"]
        )
        assert r["n_d1"] >= 1  # a top-degree seed has at least one neighbor
