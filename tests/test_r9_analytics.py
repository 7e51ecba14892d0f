"""Round-9 analytics operators: modularity, TextRank, diff-in-diff,
weighted median, next-fit packing, HITS, DBSCAN — property and
brute-force reference tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_modularity_identity_and_bounds(spark):
    """Sum of per-community q_num equals 4m^2*Q with Q in (-0.5, 1]; for a
    clustering that IS the connected components, every edge is intra, so
    sum(intra_edges) == m."""
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        graph_modularity_components,
    )

    rows = graph_modularity_components(spark, SF).collect()
    assert rows
    q_den = rows[0]["q_den"]
    m = int(round((q_den / 4) ** 0.5))
    assert q_den == 4 * m * m
    assert sum(r["intra_edges"] for r in rows) == m
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    q = sum(r["q_num"] for r in rows) / q_den
    assert -0.5 < q <= 1.0


def test_textrank_mass_and_determinism(spark):
    """Ranks positive, top-k sorted desc, and two runs identical."""
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        text_textrank_keywords,
    )

    a = text_textrank_keywords(spark, SF).collect()
    b = text_textrank_keywords(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    ranks = [r["rank"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    assert len(a) == 20


def test_diff_in_diff_recompute(spark):
    """DiD equals the four-cell contrast recomputed driver-side."""
    from projeto_de_etl_com_api_do_meta_spark.queries.robust_stats import (
        events_diff_in_diff,
    )

    ev = (
        load_table(spark, SF, "events")
        .where(
            F.col("value").isNotNull() & (F.col("event_type") == "purchase")
        )
        .select("user_id", "ts", F.round(F.col("value") * 100, 0).alias("v"))
        .collect()
    )
    import datetime

    cut = datetime.datetime(2024, 1, 16)
    cells = {}
    for r in ev:
        key = (r["user_id"] % 2, 0 if r["ts"] < cut else 1)
        s, n = cells.get(key, (0, 0))
        cells[key] = (s + int(r["v"]), n + 1)

    def mean(g, p):
        s, n = cells[(g, p)]
        return s / n / 100.0

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    row = events_diff_in_diff(spark, SF).collect()[0]
    assert row["n_t_pre"] == cells[(1, 0)][1]
    assert abs(row["did"] - did) < 1e-5


def test_weighted_median_crossing_property(spark):
    """For each segment the reported value is the true lower weighted
    median: weight strictly below it < totw/2 <= weight at-or-below it."""
    from projeto_de_etl_com_api_do_meta_spark.queries.robust_stats import (
        agg_weighted_median,
    )

    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment",
        F.round(F.col("c_acctbal").cast("decimal(18,4)") * 100, 0)
        .cast("long")
        .alias("v"),
    )
    orders = load_table(spark, SF, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count(F.lit(1)).alias("wt"))
    pts = [
        (r["c_mktsegment"], int(r["v"]), int(r["wt"]))
        for r in cust.join(orders, "c_custkey").collect()
    ]
    out = {r["seg"]: r for r in agg_weighted_median(spark, SF).collect()}
    segs = {s for s, _, _ in pts}
    assert set(out) == segs
    for seg in segs:
        sp = [(v, w) for s, v, w in pts if s == seg]
        tot = sum(w for _, w in sp)
        med = out[seg]["wmedian_e2"]
        below = sum(w for v, w in sp if v < med)
        at_or_below = sum(w for v, w in sp if v <= med)
        assert 2 * below < tot <= 2 * at_or_below
        assert out[seg]["total_weight"] == tot


def test_nextfit_fold_matches_python(spark):
    """The JVM fold reproduces a pure-Python next-fit packer per shard."""
    from projeto_de_etl_com_api_do_meta_spark.queries.training_ops import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        train_pack_nextfit_md5,
    )
    import hashlib
    import re

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    tok = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    shards = {}
    for r in docs:
        n = min(len(tok.findall(r["text"])), _PACK_BUDGET)
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        shards.setdefault(r["doc_id"] % _PACK_SHARDS, []).append((h, n))
    expect = {}
    for s, items in shards.items():
        bins, fill = 1, 0
        for _, n in sorted(items):
            if fill + n <= _PACK_BUDGET:
                fill += n
            else:
                bins, fill = bins + 1, n
        expect[s] = (len(items), bins, sum(n for _, n in items))
    got = {r["shard"]: r for r in train_pack_nextfit_md5(spark, SF).collect()}
    assert set(got) == set(expect)
    for s, (n_items, bins, tot) in expect.items():
        assert got[s]["n_items"] == n_items
        assert got[s]["n_bins"] == bins
        assert got[s]["total_tok"] == tot
        assert (
            got[s]["fill_ppm"] == tot * 1_000_000 // (bins * _PACK_BUDGET)
        )


def test_hits_normalization_and_determinism(spark):
    """Max score on each side is exactly the fixed-point scale; two runs
    bit-identical."""
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        _HITS_SCALE,
        graph_hits_bipartite,
    )

    rows = graph_hits_bipartite(spark, SF).collect()
    hubs = [r["score"] for r in rows if r["side"] == "hub"]
    auths = [r["score"] for r in rows if r["side"] == "auth"]
    assert max(hubs) == _HITS_SCALE and max(auths) == _HITS_SCALE
    assert all(0 <= s <= _HITS_SCALE for s in hubs + auths)
    again = graph_hits_bipartite(spark, SF).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_dbscan_role_contracts(spark):
    """Core/border/noise verdicts satisfy the DBSCAN definitions against a
    brute-force neighbor recomputation."""
    from projeto_de_etl_com_api_do_meta_spark.queries.embeddings_queries import (
        _DBSCAN_MIN_PTS,
        embed_dbscan_cosine,
    )
    import numpy as np

    emb = load_table(spark, SF, "embeddings").collect()
    vecs = {}
    for r in emb:
        v = np.array(r["embedding"], dtype="float64")
        nrm = np.linalg.norm(v)
        if nrm > 0:
            vecs[r["vec_id"]] = v / nrm
    ids = sorted(vecs)
    nbrs = {i: set() for i in ids}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if round(float(vecs[a] @ vecs[b]), 6) >= 0.4:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {i for i in ids if len(nbrs[i]) + 1 >= _DBSCAN_MIN_PTS}
    out = {r["vec_id"]: r for r in embed_dbscan_cosine(spark, SF).collect()}
    assert {i for i, r in out.items() if r["role"] == "core"} == core
    for i, r in out.items():
        if r["role"] == "border":
            assert i not in core and nbrs.get(i, set()) & core
            assert r["cluster_id"] is not None
        if r["role"] == "noise":
            assert r["cluster_id"] is None
            assert i not in core
            assert not (nbrs.get(i, set()) & core)
    # cluster labels: same component => same label (spot-check via cores)
    for c in core:
        for d in nbrs[c] & core:
            assert out[c]["cluster_id"] == out[d]["cluster_id"]


def test_bh_fdr_stepup_recompute(spark):
    """BH rejection set equals the step-up rule recomputed from the exact
    (n_extreme, n_reps) rationals; rejections are a prefix of the ranking."""
    from projeto_de_etl_com_api_do_meta_spark.queries.eval_stats import (
        ml_bh_fdr_permutation,
    )

    rows = ml_bh_fdr_permutation(spark, SF).collect()
    m = rows[0]["m"]
    assert len(rows) == m
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks)
    ok = [
        r["rank"]
        for r in rows
        if (r["n_extreme"] + 1) * 10 * m <= r["rank"] * (r["n_reps"] + 1)
    ]
    k = max(ok) if ok else 0
    for r in rows:
        assert r["rejected"] == (r["rank"] <= k)
        assert abs(
            r["p_value"] - (r["n_extreme"] + 1) / (r["n_reps"] + 1)
        ) < 1e-5


def test_conformal_quantile_and_coverage(spark):
    """qhat is the ceil(0.9*(n_cal+1))-th smallest calibration residual and
    the reported coverage matches a driver-side recount."""
    from projeto_de_etl_com_api_do_meta_spark.queries.robust_stats import (
        ml_conformal_interval,
    )

    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.dayofmonth("ts").alias("dom"),
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .collect()
    )
    out = {r["event_type"]: r for r in ml_conformal_interval(spark, SF).collect()}
    types = {r["event_type"] for r in ev}
    assert set(out) == types
    for t in types:
        tr = [r["v"] for r in ev if r["event_type"] == t and r["dom"] <= 10]
        cal = [
            r["v"] for r in ev if r["event_type"] == t and 11 <= r["dom"] <= 20
        ]
        te = [r["v"] for r in ev if r["event_type"] == t and r["dom"] >= 21]
        n, s = len(tr), sum(tr)
        res = sorted(abs(v * n - s) for v in cal)
        k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
        row = out[t]
        assert row["n_train"] == n and row["n_cal"] == len(cal)
        assert row["qhat_scaled"] == res[k - 1]
        cov = sum(1 for v in te if abs(v * n - s) <= res[k - 1])
        assert row["covered"] == cov
        assert row["coverage_ppm"] == cov * 1_000_000 // len(te)
        # the split-conformal guarantee: coverage >= 1 - alpha - slack
        assert row["coverage_ppm"] > 800_000


def test_cohort_ltv_monotone_and_mass(spark):
    """Cumulative LTV is non-decreasing within each cohort and total mass
    equals the corpus purchase revenue."""
    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_cohort_ltv,
    )

    rows = events_cohort_ltv(spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], []).append(r)
    last_cums = 0
    for c, rs in by_cohort.items():
        ages = [r["age"] for r in rs]
        assert ages == sorted(ages)
        cums = [r["cum_rev_e2"] for r in rs]
        assert cums == sorted(cums)
        assert cums[-1] == sum(r["rev_e2"] for r in rs)
        last_cums += cums[-1]
    total = (
        load_table(spark, SF, "events")
        .where(
            F.col("value").isNotNull() & (F.col("event_type") == "purchase")
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    assert last_cums == total


def test_label_propagation_partition_and_determinism(spark):
    """Communities partition the node set; two runs identical."""
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        graph_label_propagation,
    )

    a = graph_label_propagation(spark, SF).collect()
    b = graph_label_propagation(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    x, y = li.alias("x"), li.alias("y")
    edges = (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .groupBy(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
    )
    nodes = {
        r[0]
        for r in edges.select("u").union(edges.select("v")).distinct().collect()
    }
    assert sum(r["n_nodes"] for r in a) == len(nodes)
    assert all(r["community"] in nodes for r in a)
    assert all(r["min_node"] <= r["max_node"] for r in a)


def test_bitmap_distinct_equals_count_distinct(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.aggregates import (
        agg_bitmap_distinct,
    )

    got = {r["event_type"]: r for r in agg_bitmap_distinct(spark, SF).collect()}
    exact = {
        r["event_type"]: (r["d"], r["n"])
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    }
    assert set(got) == set(exact)
    for t, (d, n) in exact.items():
        assert got[t]["n_users"] == d
        assert got[t]["n_events"] == n


def test_attribution_conservation(spark):
    """First/last-touch conversions each sum to the number of converting
    users with a nonempty journey; linear credit per user nearly 1e6."""
    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_attribution_models,
    )

    rows = events_attribution_models(spark, SF).collect()
    ev = load_table(spark, SF, "events").collect()
    conv_ts = {}
    for r in ev:
        if r["event_type"] == "purchase":
            if r["user_id"] not in conv_ts or r["ts"] < conv_ts[r["user_id"]]:
                conv_ts[r["user_id"]] = r["ts"]
    journeys = {}
    for r in ev:
        t0 = conv_ts.get(r["user_id"])
        if t0 is not None and r["ts"] < t0 and r["event_type"] != "purchase":
            journeys.setdefault(r["user_id"], []).append(r)
    n_journeys = len(journeys)
    assert sum(r["first_touch_conv"] for r in rows) == n_journeys
    assert sum(r["last_touch_conv"] for r in rows) == n_journeys
    total_linear = sum(r["linear_credit_e6"] for r in rows)
    expected = sum(len(js) * (1_000_000 // len(js)) for js in journeys.values())
    assert total_linear == expected
    assert sum(r["n_touches"] for r in rows) == sum(
        len(js) for js in journeys.values()
    )


def test_xml_roundtrip_fidelity(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.warehouse_ops import (
        io_xml_roundtrip,
    )

    row = io_xml_roundtrip(spark, SF).collect()[0]
    assert row["n_rows"] > 0
    assert row["n_ok"] == row["n_rows"]


def test_horvitz_thompson_unbiasedness_mechanics(spark):
    """HT totals recompute from a driver-side sample replay; purchase
    (k=1) is a census so its estimate is exact with zero variance."""
    import hashlib

    from projeto_de_etl_com_api_do_meta_spark.queries.robust_stats import (
        _HT_RATES,
        sample_horvitz_thompson,
    )

    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id", "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        )
        .collect()
    )
    out = {r["event_type"]: r for r in sample_horvitz_thompson(spark, SF).collect()}
    for t, k in _HT_RATES.items():
        pop = [(r["event_id"], r["v"]) for r in ev if r["event_type"] == t]
        samp = [
            v
            for eid, v in pop
            if int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % k == 0
        ]
        row = out[t]
        assert row["n_pop"] == len(pop)
        assert row["n_samp"] == len(samp)
        assert row["ht_total_e2"] == sum(v * k for v in samp)
        assert row["ht_var_e4"] == sum(v * v * k * (k - 1) for v in samp)
    assert out["purchase"]["rel_err_ppm"] == 0
    assert out["purchase"]["ht_var_e4"] == 0


def test_burst_viterbi_matches_python(spark):
    """The bit-packed fold reproduces a pure-Python Viterbi DP per type."""
    import math

    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        _BURST_INF,
        events_burst_detection,
    )

    ev = (
        load_table(spark, SF, "events")
        .select(F.col("ts").cast("date").alias("d"), "event_type")
        .collect()
    )
    daily, dtot, rtot = {}, {}, {}
    for r in ev:
        daily[(r["d"], r["event_type"])] = daily.get((r["d"], r["event_type"]), 0) + 1
        dtot[r["d"]] = dtot.get(r["d"], 0) + 1
    for (d, t), n in daily.items():
        rtot[t] = rtot.get(t, 0) + n
    g = sum(dtot.values())
    out = {r["event_type"]: r for r in events_burst_detection(spark, SF).collect()}
    for t in rtot:
        days = sorted(d for (d, tt) in daily if tt == t)
        p0 = rtot[t] / g
        p1 = min(2.0 * rtot[t] / g, 0.999999)
        trans = math.floor(1e9 * math.log(len(days)))
        c0, c1 = 0, _BURST_INF
        m0, m1 = 0, 0
        for d in days:
            r, dt_ = daily[(d, t)], dtot[d]
            a0 = math.floor(-1e9 * (r * math.log(p0) + (dt_ - r) * math.log(1 - p0)))
            a1 = math.floor(-1e9 * (r * math.log(p1) + (dt_ - r) * math.log(1 - p1)))
            n0 = min(c0, c1) + a0
            n1 = min(c0 + trans, c1) + a1
            nm0 = (m0 if c0 <= c1 else m1) * 2
            nm1 = (m0 if c0 + trans < c1 else m1) * 2 + 1
            c0, c1, m0, m1 = n0, n1, nm0, nm1
        row = out[t]
        assert row["n_days"] == len(days)
        assert row["cost_end0"] == c0 and row["cost_end1"] == c1
        mask = m0 if c0 <= c1 else m1
        assert row["burst_mask"] == mask
        assert row["n_burst_days"] == bin(mask).count("1")
