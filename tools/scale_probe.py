"""Scale probe: measure the heaviest north-star queries ABOVE the sf0.1
fixture, on a generated corpus that mirrors the fixture's statistics.

The driver fixtures stop at sf0.1 (5k docs / 2k vectors), which is too small
to distinguish a posting-list join's quadratic tail from its linear body or
to show the prefix/capped/bloom scale paths earning their keep.  This tool
generates seeded corpora at N x the sf0.1 shape (same 31-word vocab, ~54
words/doc, 5 langs, 20 sources, ~0.2% exact dups + 2% near-dups; 64-dim
unit-ish embeddings with planted near-dup clusters), symlinks the remaining
tables from sf0.1, and times the probe queries at each size.  Results feed
SCALE.md — measured slopes, not argued ones.

Usage:
    python tools/scale_probe.py [--sizes 1,2,4] [--out /tmp/scale_probe]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
BASE_DOCS = 5000
BASE_VECS = 2000

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window join shuffle plan filter group order limit index "
    "cache read write stream"
).split()  # 31 words, mirroring the fixture's vocabulary size

_LANGS = ["en", "de", "zh", "fr", "es"]
_LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def gen_corpus(
    out_dir: str,
    mult: int,
    seed: int = 7,
    realistic_vocab: bool = False,
    vocab_size: int = 2000,
) -> None:
    """Write documents.parquet + embeddings.parquet at ``mult`` x sf0.1 and
    symlink every other sf0.1 table into ``out_dir``.

    ``realistic_vocab`` swaps the fixture-mirroring 31-word vocabulary for a
    2000-word zipf-ish one plus a fixed boilerplate sentence appended to 30%
    of documents — the regime that exposed the absolute df-cap bug (r3 probe:
    tiny vocab made EVERY shingle hot at x4+, emptying all capped sets).
    With a realistic vocab, content shingles stay cold at any corpus size
    while the boilerplate shingles are genuinely hot (df ≈ 0.3·N), so a
    correct fraction cap must keep the former and drop the latter."""
    rng = np.random.default_rng(seed + mult)
    n_docs, n_vecs = BASE_DOCS * mult, BASE_VECS * mult
    os.makedirs(out_dir, exist_ok=True)

    vocab = (
        np.array([f"w{i:04d}" for i in range(vocab_size)])
        if realistic_vocab
        else np.array(_VOCAB)
    )
    vp = None
    if realistic_vocab:  # zipf-ish frequencies over the 2000-word vocab
        vp = 1.0 / np.arange(1, len(vocab) + 1)
        vp /= vp.sum()
    lens = rng.integers(44, 65, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        words = rng.choice(vocab, size=lens[i], p=vp)
        texts.append(" ".join(words))
    if realistic_vocab:
        boiler = "subscribe to our newsletter terms and conditions apply"
        for j in rng.choice(n_docs, int(n_docs * 0.3), replace=False):
            texts[int(j)] = texts[int(j)] + " " + boiler
    # planted duplication mirroring the fixture: ~0.2% exact, ~2% near
    # (near-dup = earlier doc with a few words swapped)
    n_exact = max(1, n_docs // 500)
    n_near = max(1, n_docs // 50)
    for j in rng.choice(np.arange(n_docs // 2, n_docs), n_exact, replace=False):
        texts[j] = texts[int(j) - n_docs // 2]
    for j in rng.choice(np.arange(n_docs // 2, n_docs), n_near, replace=False):
        base = texts[int(j) - n_docs // 2].split()
        for p in rng.integers(0, len(base), size=3):
            base[int(p)] = str(rng.choice(_VOCAB))
        texts[j] = " ".join(base)

    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choice(_LANGS, size=n_docs, p=_LANG_P), pa.string()
            ),
            "source": pa.array(
                [f"src{int(s)}" for s in rng.integers(0, 20, size=n_docs)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # embeddings: 16 gaussian cluster centers + noise, ~1% planted near-dups
    centers = rng.normal(0, 0.12, size=(16, 64))
    assign = rng.integers(0, 16, size=n_vecs)
    emb = centers[assign] + rng.normal(0, 0.04, size=(n_vecs, 64))
    for j in rng.choice(
        np.arange(n_vecs // 2, n_vecs), max(1, n_vecs // 100), replace=False
    ):
        emb[j] = emb[int(j) - n_vecs // 2] + rng.normal(0, 0.002, size=64)
    vecs = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in emb],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(assign.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(vecs, os.path.join(out_dir, "embeddings.parquet"))

    # events: mult x rows AND mult x users over the same Jan-2024 span, so
    # per-(user, day) span counts -- the left side of the interval/session
    # queries -- grow linearly instead of just densifying fixed spans.
    n_events = 100_000 * mult
    n_users = 1500 * mult
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    ts_us = base_us + rng.integers(0, 30 * 86_400_000_000, size=n_events)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events), pa.int64()
            ),
            "event_type": pa.array(
                [
                    ["view", "click", "cart", "purchase", "refund"][int(i)]
                    for i in rng.integers(0, 5, size=n_events)
                ],
                pa.string(),
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 200, size=n_events), 4), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k":{int(i)}}}' for i in rng.integers(0, 9, size=n_events)],
                pa.string(),
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))

    for f in os.listdir(BASE_SF):
        dst = os.path.join(out_dir, f)
        if (
            f.startswith(("documents", "embeddings", "events"))
            or os.path.exists(dst)
        ):
            continue
        os.symlink(os.path.join(BASE_SF, f), dst)


#: (query, is_doc_query): doc queries scale with n_docs, vec with n_vecs.
PROBES = [
    ("dedup_containment_pairs", True),       # naive posting join (quadratic tail)
    ("dedup_containment_prefix_filter", True),  # its prefix-filtered scale path
    ("dedup_ngram_jaccard", True),           # naive Jaccard posting join
    ("dedup_jaccard_prefix_filter", True),   # prefix-filtered scale path
    ("dedup_ngram_jaccard_capped", True),    # frequency-capped scale path
    ("dedup_minhash_lsh", True),             # banded LSH (the sketch path)
    ("text_decontaminate_bloom", True),      # bloom-gated decontamination
    ("embed_ann_ivf", False),                # IVF ANN (Lloyd + shortlist)
    ("dedup_embedding_cosine", False),       # blocked-GEMM exact near-dup
    ("dedup_semantic_clustered_scaled", False),  # SemDeDup k ∝ N scale path
    ("dedup_semantic_twolevel_scaled", False),  # √k cells × √k sub-clusters
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--queries", default=None, help="comma list; default all")
    ap.add_argument(
        "--realistic-vocab",
        action="store_true",
        help="2000-word zipf vocab + 30%%-of-docs boilerplate sentence",
    )
    a = ap.parse_args()
    sizes = [int(s) for s in a.sizes.split(",")]
    wanted = set(a.queries.split(",")) if a.queries else None

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="scale-probe")
    results: dict[str, dict[str, float]] = {}
    for mult in sizes:
        suffix = "rv" if a.realistic_vocab else ""
        d = os.path.join(a.out, f"x{mult}{suffix}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            t0 = time.time()
            gen_corpus(d, mult, realistic_vocab=a.realistic_vocab)
            print(f"[gen] x{mult}{suffix}: {time.time()-t0:.1f}s", flush=True)
        names = list(wanted) if wanted else [n for n, _ in PROBES]
        for name in names:
            if name not in QUERIES:
                print(f"[skip] unknown query {name}", flush=True)
                continue
            spark.catalog.clearCache()
            t0 = time.time()
            n = QUERIES[name].fn(spark, d).count()
            dt = time.time() - t0
            results.setdefault(name, {})[f"x{mult}"] = round(dt, 2)
            print(f"[x{mult}] {name}: {dt:.2f}s ({n} rows)", flush=True)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
