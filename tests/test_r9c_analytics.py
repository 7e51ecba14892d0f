"""Round-9c/d operators: cooc-SVD embedding, pinball quantile regression,
RAKE, positional phrase search, decision stump, KWIC, FD profile,
fixed-width format — property and brute-force reference tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .collect()
    )


def test_cooc_svd_covers_vocab_and_is_deterministic(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.corpus_miner_queries import (
        corpus_cooc_svd_embedding,
    )

    a = corpus_cooc_svd_embedding(spark, SF).collect()
    b = corpus_cooc_svd_embedding(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) >= 10
    # power iteration on a non-negative matrix: all coordinates >= 0,
    # max coordinate rescaled into [1, 65536]
    vs = [r["v"] for r in a]
    assert all(v >= 0 for v in vs) and 1 <= max(vs) <= 65536


def test_pinball_intercept_is_residual_quantile(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.corpus_miner_queries import (
        ml_quantile_regression_pinball,
    )

    rows = {r["tau_x10"]: r for r in ml_quantile_regression_pinball(spark, SF).collect()}
    assert set(rows) == {5, 9}
    daily = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
        .collect()
    )
    pts = [(r["d"].toordinal() - 719163, r["y"]) for r in daily]
    for tau_x10, row in rows.items():
        s, b = row["slope_e2_per_day"], row["intercept_e2"]
        resid = sorted(y - s * x for x, y in pts)
        rk = (tau_x10 * len(resid) + 9) // 10
        assert b == resid[rk - 1]  # intercept IS the tau-quantile residual
        loss = sum(
            tau_x10 * (r - b) if r >= b else (10 - tau_x10) * (b - r)
            for r in resid
        )
        assert row["pinball_x10"] == loss
        # no other grid slope beats the winner (exhaustive re-check)
        for s2 in range(-2000, 2100, 100):
            r2 = sorted(y - s2 * x for x, y in pts)
            b2 = r2[(tau_x10 * len(r2) + 9) // 10 - 1]
            l2 = sum(
                tau_x10 * (r - b2) if r >= b2 else (10 - tau_x10) * (b2 - r)
                for r in r2
            )
            assert loss <= l2


def test_rake_scores_recompute(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.corpus_miner_queries import (
        _RAKE_SCALE,
        _RAKE_STOPS,
        text_rake_keywords,
    )

    rows = text_rake_keywords(spark, SF).collect()
    assert 0 < len(rows) <= 15
    # recompute word degree/freq and phrase scores driver-side
    toks = _tokens(spark)
    bydoc: dict[int, list[str]] = {}
    for r in sorted(toks, key=lambda t: (t["doc_id"], t["pos"])):
        bydoc.setdefault(r["doc_id"], []).append(r["w"])
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    phrases: list[list[str]] = []
    for ws in bydoc.values():
        cur: list[str] = []
        for w in ws + ["the"]:  # sentinel stop flushes the last phrase
            if w in _RAKE_STOPS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(ph)
    score = {w: (degree[w] * _RAKE_SCALE) // freq[w] for w in freq}
    for r in rows:
        member_sum = sum(score[w] for w in r["phrase"].split(" "))
        assert r["score_fp"] == member_sum


def test_phrase_search_counts_recompute(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.corpus_miner_queries import (
        corpus_phrase_search_positional,
    )

    rows = corpus_phrase_search_positional(spark, SF).collect()
    assert len(rows) == 3
    toks = _tokens(spark)
    bydoc: dict[int, list[tuple[int, str]]] = {}
    for r in toks:
        bydoc.setdefault(r["doc_id"], []).append((r["pos"], r["w"]))
    for row in rows:
        w1, w2 = row["phrase"].split(" ")
        per_doc: dict[int, int] = {}
        for doc, ws in bydoc.items():
            pos = dict(ws)
            c = sum(1 for p, w in ws if w == w1 and pos.get(p + 1) == w2)
            if c:
                per_doc[doc] = c
        assert row["n_docs"] == len(per_doc)
        assert row["n_occurrences"] == sum(per_doc.values())
        mx = max(per_doc.values())
        assert row["max_occ_per_doc"] == mx
        assert row["top_doc_id"] == min(d for d, c in per_doc.items() if c == mx)


def test_decision_stump_is_global_optimum(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_formats import (
        ml_decision_stump_exact,
    )

    row = ml_decision_stump_exact(spark, SF).collect()[0]
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("v"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .collect()
    )
    pts = sorted((r["v"], r["y"]) for r in ev)
    n, p = len(pts), sum(y for _, y in pts)
    assert (row["n"], row["n_positive"]) == (n, p)

    def gini2(t):
        n_l = sum(1 for v, _ in pts if v <= t)
        pos_l = sum(y for v, y in pts if v <= t)
        n_r, pos_r = n - n_l, p - pos_l
        if n_l == 0 or n_r == 0:
            return None
        return pos_l * (n_l - pos_l) / n_l + pos_r * (n_r - pos_r) / n_r

    best = min(
        (g, t) for t in sorted({v for v, _ in pts}) if (g := gini2(t)) is not None
    )
    assert row["threshold_e2"] == best[1]
    assert abs(row["weighted_gini_x2"] - best[0]) < 1e-6
    assert row["n_l"] + row["n_r"] == n
    assert row["n_correct_majority"] >= max(p, n - p)  # beats the base rate


def test_kwic_target_is_top_nonstop_word(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_formats import (
        _KWIC_STOPS,
        corpus_kwic_concordance,
    )

    rows = corpus_kwic_concordance(spark, SF).collect()
    assert 0 < len(rows) <= 10
    toks = _tokens(spark)
    freq: dict[str, int] = {}
    for r in toks:
        if r["w"] not in _KWIC_STOPS:
            freq[r["w"]] = freq.get(r["w"], 0) + 1
    top = min((w for w in freq if freq[w] == max(freq.values())))
    assert all(r["keyword"] == top for r in rows)
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) <= freq[top]


def test_fd_profile_recompute(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_formats import (
        dq_functional_dependency_profile,
    )

    rows = dq_functional_dependency_profile(spark, SF).collect()
    assert len(rows) == 12
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("user_id").cast("string").alias("user_id"),
            F.col("ts").cast("date").cast("string").alias("day"),
            F.expr(
                "CAST(CAST(round(value * 100.0, 0) AS BIGINT) DIV 10000 AS STRING)"
            ).alias("value_bucket"),
        )
        .collect()
    )
    for r in rows:
        lhs_vals = {x[r["lhs"]] for x in ev}
        pairs = {(x[r["lhs"]], x[r["rhs"]]) for x in ev}
        viol = sum(
            1
            for lv in lhs_vals
            if len({b for a, b in pairs if a == lv}) > 1
        )
        assert r["n_lhs_distinct"] == len(lhs_vals)
        assert r["n_pair_distinct"] == len(pairs)
        assert r["n_violating_lhs"] == viol
        assert r["holds"] == (len(lhs_vals) == len(pairs))


def test_fixed_width_preserves_totals(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_formats import (
        io_fixed_width_roundtrip,
    )

    rows = io_fixed_width_roundtrip(spark, SF).collect()
    src = (
        load_table(spark, SF, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias("s"),
        )
        .collect()
    )
    m = {r["c_mktsegment"]: (r["n"], r["s"]) for r in src}
    assert {r["c_mktsegment"] for r in rows} == set(m)
    for r in rows:
        n, s = m[r["c_mktsegment"]]
        assert (r["n_rows"], r["sum_acctbal_e2"], r["n_parse_ok"]) == (n, s, n)


def test_assortativity_in_range_and_recompute(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.network_sequential import (
        graph_assortativity_degree,
    )

    row = graph_assortativity_degree(spark, SF).collect()[0]
    m, sj, sjk, sj2 = (
        row["m_directed"],
        row["sum_deg"],
        row["sum_deg_products"],
        row["sum_deg_squares"],
    )
    assert -1.0 <= row["assortativity_r"] <= 1.0
    assert row["assortativity_r"] == round((m * sjk - sj * sj) / (m * sj2 - sj * sj), 6)


def test_rich_club_monotone_membership(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.network_sequential import (
        graph_rich_club_coefficient,
    )

    rows = sorted(
        graph_rich_club_coefficient(spark, SF).collect(), key=lambda r: r["kmin"]
    )
    assert rows
    # clubs shrink as k rises; induced edges can only shrink with them
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["m_sym"] <= a["m_sym"]
    for r in rows:
        assert r["m_sym"] % 2 == 0  # symmetric edge list counts both directions
        if r["phi"] is not None:
            assert 0.0 <= r["phi"] <= 1.0


def test_sprt_walk_recompute(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.network_sequential import (
        _LLR_NEG,
        _LLR_POS,
        _LOWER,
        _UPPER,
        events_sprt_sequential_test,
    )

    row = events_sprt_sequential_test(spark, SF).collect()[0]
    daily = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("d")
        .collect()
    )
    llr = n_seen = 0
    verdict, decision_day = "continue", daily[-1]["d"]
    for r in daily:
        llr += r["p"] * _LLR_POS + (r["n"] - r["p"]) * _LLR_NEG
        n_seen += r["n"]
        if llr >= _UPPER:
            verdict, decision_day = "accept_h1", r["d"]
            break
        if llr <= _LOWER:
            verdict, decision_day = "accept_h0", r["d"]
            break
    assert row["verdict"] == verdict
    assert row["decision_day"] == decision_day
    assert row["n_samples"] == n_seen and row["llr_e9"] == llr


def test_adpcm_query_reconstruction_error_bounded(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.pipelines_queries import (
        multimodal_adpcm_roundtrip,
    )

    rows = multimodal_adpcm_roundtrip(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["ok_format"]
        # mean |error| stays small once normalized by sample count: the
        # fixture ramps are within the adaptive range
        assert r["err_sum"] / r["n_samples"] < 2000
