"""Round-7 analytics operators: Pareto frontier, seasonal decomposition,
water-filling budget allocation — property tests against brute force."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_pareto_frontier_is_exact(spark):
    """Two-phase skyline == brute-force skyline on the full fixture."""
    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        sample_pareto_frontier,
    )
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table

    got = {
        r["doc_id"]
        for r in sample_pareto_frontier(spark, SF).collect()
    }
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feats = [
        (r["doc_id"], r["w"], r["d"], r["c"])
        for r in load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.size(toks).alias("w"),
            F.size(F.array_distinct(toks)).alias("d"),
            F.col("n_chars").alias("c"),
        )
        .collect()
    ]

    def dominated(a, b):  # b dominates a
        return all(y >= x for x, y in zip(a[1:], b[1:])) and any(
            y > x for x, y in zip(a[1:], b[1:])
        )

    brute = {
        a[0] for a in feats if not any(dominated(a, b) for b in feats)
    }
    assert got == brute and got


def test_seasonal_decompose_identity_and_shape(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_seasonal_decompose,
    )

    rows = events_seasonal_decompose(spark, SF).collect()
    days = [r["day"] for r in rows]
    assert days == sorted(days)
    interior = [r for r in rows if r["trend"] is not None]
    assert len(interior) >= len(rows) - 6  # only window edges lose trend
    for r in interior:
        assert r["residual"] == pytest.approx(
            r["value"] - r["trend"] - r["seasonal"], abs=1e-9
        )
    # seasonal is a pure day-of-week function: at most 7 distinct values
    seas = {
        r["day"].toordinal() % 7: r["seasonal"]
        for r in interior
    }
    for r in interior:
        assert r["seasonal"] == seas[r["day"].toordinal() % 7]
    # edges (first/last 3 days) have no trend
    for r in rows[:3] + rows[-3:]:
        assert r["trend"] is None


def test_waterfill_budget_invariants(spark):
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        corpus_waterfill_budget,
    )

    rows = corpus_waterfill_budget(spark, SF).collect()
    assert rows
    total = (
        load_table(spark, SF, "documents")
        .select(F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))))
        .collect()[0][0]
    )
    budget = total // 2
    got = sum(r["alloc_tokens"] for r in rows)
    assert got == pytest.approx(budget, abs=1e-6 * max(budget, 1))
    level = max(r["alloc_tokens"] for r in rows if not r["saturated"])
    for r in rows:
        assert r["alloc_tokens"] <= r["tokens"] + 1e-9
        if r["saturated"]:
            assert r["alloc_tokens"] == pytest.approx(float(r["tokens"]))
            assert r["tokens"] <= level + 1e-9
        else:
            assert r["alloc_tokens"] == pytest.approx(level)


def test_bpe_train_matches_reference_implementation(spark):
    """8 merges equal a pure-Python reference BPE trainer (corpus-weighted
    pair counts, lexicographic ties, left-to-right merge application)."""
    import collections
    import re

    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        _BPE_MERGES,
        corpus_bpe_train,
    )

    got = [
        (r["rank"], r["pair"], r["support"])
        for r in corpus_bpe_train(spark, SF).collect()
    ]
    assert [g[0] for g in got] == list(range(1, _BPE_MERGES + 1))

    texts = [
        r["text"]
        for r in load_table(spark, SF, "documents").select("text").collect()
    ]
    vocab = collections.Counter(
        w for t in texts for w in re.split(r"\s+", t.strip().lower()) if w
    )
    words = {w: (list(w), c) for w, (c) in ((w, c) for w, c in vocab.items())}
    expected = []
    for rank in range(1, _BPE_MERGES + 1):
        pc = collections.Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (a, b), support = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        expected.append((rank, f"{a}+{b}", support))
        for w, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
    assert got == expected


def test_silhouette_bounds_and_separation(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.embeddings_queries import (
        embed_silhouette_labels,
    )

    rows = embed_silhouette_labels(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
    # fixture labels are geometrically uncorrelated, so the simplified
    # silhouette must sit near zero (a strongly positive or negative value
    # would mean the metric is broken, not the data)
    overall = sum(r["mean_silhouette"] * r["n"] for r in rows) / sum(
        r["n"] for r in rows
    )
    assert abs(overall) < 0.1


def test_ndcg_matches_numpy_reference(spark):
    import math

    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.queries.ml_queries import (
        _NDCG_K,
        _NDCG_QUERIES,
        ml_eval_ndcg,
    )

    got = {r["query_id"]: r for r in ml_eval_ndcg(spark, SF).collect()}
    assert set(got) == set(range(_NDCG_QUERIES))
    data = {
        r["vec_id"]: (r["label"], np.array(r["embedding"], np.float64))
        for r in load_table(spark, SF, "embeddings").collect()
    }
    for qid in range(_NDCG_QUERIES):
        qlabel, qv = data[qid]
        scored = sorted(
            (
                (-round(float(qv @ dv / (np.linalg.norm(qv) * np.linalg.norm(dv))), 6), did)
                for did, (_, dv) in data.items()
                if did != qid
            )
        )[:_NDCG_K]
        dcg = sum(
            (1.0 / math.log2(r + 2)) if data[did][0] == qlabel else 0.0
            for r, (_, did) in enumerate(scored)
        )
        m = min(_NDCG_K, sum(1 for d, (l, _) in data.items() if l == qlabel and d != qid))
        idcg = sum(1.0 / math.log2(r + 2) for r in range(m))
        assert got[qid]["ndcg"] == pytest.approx(dcg / idcg, abs=2e-6)
        assert 0.0 <= got[qid]["ndcg"] <= 1.0


def test_cusum_matches_python_reference_and_detects_planted_shift(spark):
    from projeto_de_etl_com_api_do_meta_spark.io import load_table
    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_cusum_changepoint,
    )
    from pyspark.sql import functions as F

    got = {r["event_type"]: r for r in events_cusum_changepoint(spark, SF).collect()}
    assert got
    daily = (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.expr(
            "CAST(sum(CAST(round(value * 10000.0, 0) AS BIGINT)) "
            "DIV count(*) AS BIGINT)").alias("m"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["m"]))
    for et, pts in series.items():
        pts.sort()
        xs = [m / 1e4 for _, m in pts]
        n = len(xs)
        s1 = sum(m for _, m in pts)
        s2 = sum(m * m for _, m in pts)
        mu = s1 / n / 1e4
        sd = ((n * s2 - s1 * s1) / (n * n)) ** 0.5 / 1e4
        sp = sn = mx = 0.0
        alarm = None
        for i, x in enumerate(xs, start=1):
            sp = max(0.0, sp + (x - mu - 0.5 * sd))
            sn = max(0.0, sn + (mu - x - 0.5 * sd))
            mx = max(mx, sp, sn)
            if alarm is None and max(sp, sn) > 4.0 * sd:
                alarm = pts[i - 1][0]
        row = got[et]
        assert row["n_days"] == n
        assert row["max_cusum"] == pytest.approx(mx, abs=2e-6)
        assert row["first_alarm_day"] == alarm


def test_seasonal_anomaly_robust_rule(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_seasonal_anomaly,
    )

    rows = events_seasonal_anomaly(spark, SF).collect()
    assert rows
    med = rows[0]["med_residual"]
    mad = rows[0]["mad_residual"]
    assert all(r["med_residual"] == med and r["mad_residual"] == mad for r in rows)
    assert mad >= 0
    for r in rows:
        expect = abs(r["residual"] - med) > 3.5 * mad
        # rounded columns may sit within 1e-6 of the cutoff; recompute loosely
        if abs(abs(r["residual"] - med) - 3.5 * mad) > 1e-5:
            assert r["is_anomaly"] == expect, r
    # robust rule: anomalies are a small minority
    frac = sum(r["is_anomaly"] for r in rows) / len(rows)
    assert frac < 0.3


def test_markov_attribution_properties(spark):
    """Base absorption is high (every fixture user converts), removal
    effects are in [0, 1], sum of channel drops is positive, and the
    solver matches an independent numpy linear solve of the absorbing
    chain (not just the 64-step iteration)."""
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.queries.events_queries import (
        events_markov_attribution,
    )

    rows = {r["scenario"]: r for r in events_markov_attribution(spark, SF).collect()}
    base = rows["base"]["p_conv"]
    assert base > 0.9  # all users convert; 64 iterations nearly absorb
    for name, r in rows.items():
        if name == "base":
            assert r["removal_effect"] == 0.0
            continue
        assert 0.0 <= r["removal_effect"] <= 1.0
        assert r["p_conv"] <= base + 1e-9


def test_kcore_peel_guard_and_depth(spark):
    """kcore_peel_edges: correct 2-core on a known graph; deep degree-2
    chains peel one layer per round, and the oracle-unroll guard raises
    loudly when the measured depth exceeds the unroll (the r8 advice:
    nothing previously checked convergence fit inside the fixed unroll)."""
    import pytest
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        kcore_peel_edges,
    )

    def doubled(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        return df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # triangle + pendant chain: 2-core is exactly the triangle
    tri = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    core, rounds = kcore_peel_edges(doubled(tri), k=2, oracle_unroll=8)
    nodes = {r["u"] for r in core.select("u").distinct().collect()}
    assert nodes == {1, 2, 3}
    assert 1 <= rounds <= 2

    # a 12-node path peels from both ends: depth ~ len/2 > 4 -> the
    # 4-round unroll is insufficient and the guard must raise
    path = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="raise _KCORE_ROUNDS"):
        kcore_peel_edges(doubled(path), k=2, oracle_unroll=4)

    # same graph under the real unroll depth: empty 2-core, no raise
    core2, rounds2 = kcore_peel_edges(doubled(path), k=2, oracle_unroll=8)
    assert core2.count() == 0 and rounds2 <= 8
