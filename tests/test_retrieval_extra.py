"""BM25 retrieval + DSIR importance selection: semantics pinned against a
pure-Python reference computed from the same fixture parquet (independent of
both Spark SQL and the DuckDB oracle)."""

from __future__ import annotations

import math
import re

import pyarrow.parquet as pq

from projeto_de_etl_com_api_do_meta_spark.queries.retrieval_extra import (
    _BM25_TERMS,
    _BM25_TOPK,
    _DSIR_BUCKETS,
    _DSIR_TARGET_MOD,
    _DSIR_TOPK,
    corpus_bm25_search,
    sample_dsir_importance,
)


def _fixture_docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _toks(text):
    return re.split(r"\s+", text.strip().lower())


def _py_bm25(docs):
    """Row-at-a-time reference: same formula, same integer-micro flooring."""
    lens = {d: len(_toks(t)) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(lens.values()) / n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, t in docs:
        for w in _toks(t):
            if w in _BM25_TERMS:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict[str, set] = {}
    for (d, w), _ in tf.items():
        df.setdefault(w, set()).add(d)
    per_doc: dict[int, list[int]] = {}
    for (d, w), f in tf.items():
        idf = math.log(1.0 + (n_docs - len(df[w]) + 0.5) / (len(df[w]) + 0.5))
        s = idf * (f * 2.2) / (f + 1.2 * (1.0 - 0.75 + 0.75 * lens[d] / avgdl))
        per_doc.setdefault(d, []).append(math.floor(1_000_000.0 * s))
    ranked = sorted(
        ((d, len(v), sum(v)) for d, v in per_doc.items()),
        key=lambda r: (-r[2], r[0]),
    )
    return ranked[:_BM25_TOPK]


def _md5_bucket(tok):
    import hashlib

    h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
    return ((h % _DSIR_BUCKETS) + _DSIR_BUCKETS) % _DSIR_BUCKETS


def _py_dsir(docs):
    ct = [0] * _DSIR_BUCKETS
    cr = [0] * _DSIR_BUCKETS
    for d, t in docs:
        tgt = d % _DSIR_TARGET_MOD == 0
        for w in _toks(t):
            b = _md5_bucket(w)
            (ct if tgt else cr)[b] += 1
    tot_t, tot_r = sum(ct), sum(cr)
    lr = [
        math.floor(
            1_000_000.0
            * (
                math.log((ct[b] + 1.0) / (tot_t + float(_DSIR_BUCKETS)))
                - math.log((cr[b] + 1.0) / (tot_r + float(_DSIR_BUCKETS)))
            )
        )
        for b in range(_DSIR_BUCKETS)
    ]
    out = []
    for d, t in docs:
        if d % _DSIR_TARGET_MOD == 0:
            continue
        ws = _toks(t)
        out.append((d, len(ws), sum(lr[_md5_bucket(w)] for w in ws)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:_DSIR_TOPK]


def test_bm25_matches_python_reference(spark, sf_dir):
    got = [
        (r.doc_id, r.n_terms, r.bm25_micro)
        for r in corpus_bm25_search(spark, sf_dir).collect()
    ]
    assert got == _py_bm25(_fixture_docs(sf_dir))
    # ranked output: scores non-increasing, every doc matched >=1 query term
    scores = [s for _, _, s in got]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= n <= len(_BM25_TERMS) for _, n, _ in got)


def test_dsir_matches_python_reference(spark, sf_dir):
    got = [
        (r.doc_id, r.n_toks, r.weight_micro)
        for r in sample_dsir_importance(spark, sf_dir).collect()
    ]
    assert got == _py_dsir(_fixture_docs(sf_dir))
    # target docs are the estimation set, never selected
    assert all(d % _DSIR_TARGET_MOD != 0 for d, _, _ in got)


def test_dsir_gumbel_matches_python_reference(spark, sf_dir):
    import hashlib

    from projeto_de_etl_com_api_do_meta_spark.queries.retrieval_extra import (
        sample_dsir_gumbel,
    )

    docs = _fixture_docs(sf_dir)
    # reuse the exact weight computation, then add deterministic Gumbel
    ct = [0] * _DSIR_BUCKETS
    cr = [0] * _DSIR_BUCKETS
    for d, t in docs:
        tgt = d % _DSIR_TARGET_MOD == 0
        for w in _toks(t):
            (ct if tgt else cr)[_md5_bucket(w)] += 1
    tot_t, tot_r = sum(ct), sum(cr)
    lr = [
        math.floor(
            1_000_000.0
            * (
                math.log((ct[b] + 1.0) / (tot_t + float(_DSIR_BUCKETS)))
                - math.log((cr[b] + 1.0) / (tot_r + float(_DSIR_BUCKETS)))
            )
        )
        for b in range(_DSIR_BUCKETS)
    ]
    out = []
    for d, t in docs:
        if d % _DSIR_TARGET_MOD == 0:
            continue
        ws = _toks(t)
        weight = sum(lr[_md5_bucket(w)] for w in ws)
        u = (
            int(hashlib.md5(f"{d}:dsir".encode()).hexdigest()[:13], 16) + 0.5
        ) / 4503599627370496.0
        g = math.floor(1_000_000.0 * (0.0 - math.log(0.0 - math.log(u))))
        out.append((d, len(ws), weight, weight + g))
    out.sort(key=lambda r: (-r[3], r[0]))
    want = out[:_DSIR_TOPK]

    got = [
        (r.doc_id, r.n_toks, r.weight_micro, r.key_micro)
        for r in sample_dsir_gumbel(spark, sf_dir).collect()
    ]
    assert got == want


# ---- round 6: MMR diversification ------------------------------------------


def test_mmr_rerank_diversifies_vs_plain_topk(spark):
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        mmr_rerank,
    )

    rng = np.random.default_rng(21)
    # candidates: a tight near-duplicate cluster with the highest rel,
    # plus spread-out alternatives slightly lower
    base = rng.normal(size=8)
    rows = []
    for i in range(4):  # near-dup cluster, rel ~0.95
        v = base + rng.normal(scale=0.01, size=8)
        rows.append((i, 0.95 - i * 0.001, [float(x) for x in v]))
    for i in range(4, 12):  # diverse tail, rel 0.8
        rows.append((i, 0.8, [float(x) for x in rng.normal(size=8)]))
    df = spark.createDataFrame(rows, "doc_id long, rel double, v array<double>")
    out = mmr_rerank(df, k=4, lam=0.5).collect()
    picked = [r.doc_id for r in out]
    assert picked[0] == 0  # highest relevance first
    # plain top-4 would be the whole near-dup cluster {0,1,2,3};
    # MMR must break out of it
    assert not set(picked) <= {0, 1, 2, 3}, picked
    # deterministic
    again = [r.doc_id for r in mmr_rerank(df, k=4, lam=0.5).collect()]
    assert picked == again


def test_mmr_rerank_empty_input(spark):
    from projeto_de_etl_com_api_do_meta_spark.operators.similarity import (
        mmr_rerank,
    )

    df = spark.createDataFrame([], "doc_id long, rel double, v array<double>")
    assert mmr_rerank(df).count() == 0


def test_colbert_maxsim_matches_numpy_reference(spark):
    """MaxSim scores agree with an independent numpy implementation, the
    self-match scores exactly n_chunks, and scores are bounded by it."""
    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.queries.retrieval_extra import (
        _COLBERT_CHUNKS,
        _COLBERT_DIM,
        _RRF_QVEC,
        retrieval_colbert_maxsim,
    )

    sf = "/root/testdata/sf0.001"
    rows = retrieval_colbert_maxsim(spark, sf).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }

    def chunks(v):
        c = v.reshape(_COLBERT_CHUNKS, _COLBERT_DIM)
        return c / np.linalg.norm(c, axis=1, keepdims=True)

    qc = chunks(emb[_RRF_QVEC])

    def maxsim(doc):
        sim = qc @ chunks(emb[doc]).T  # 8x8 cosine grid
        return float(sim.max(axis=1).sum())

    for r in rows:
        assert abs(r["maxsim_score"] - maxsim(r["doc_id"])) < 1e-5
        assert r["maxsim_score"] <= _COLBERT_CHUNKS + 1e-9
    # the spark top-k is the true numpy top-k
    all_scores = sorted(
        ((round(maxsim(d), 6), -d) for d in emb if d != _RRF_QVEC),
        reverse=True,
    )[: len(rows)]
    assert [(-i, s) for s, i in all_scores] == [
        (r["doc_id"], r["maxsim_score"]) for r in rows
    ]
