"""r10 second probe batch: scaling curves for the round's new heavies.

1. **corpus_misra_gries_sharded** at x1/x4/x16 (realistic 2000-word zipf
   vocab): the per-shard fold is the risk axis — each shard's word array
   grows linearly with the corpus at a FIXED shard count, so the curve
   measures the HOF fold's per-element cost.  Production holds per-shard
   stream length constant by raising the shard count (the tar-shard
   lesson); a second curve raises shards 16 -> 64 at x16 to show the knob.
2. **dedup_tf_cosine_pairs** at x1/x4/x16: posting-join work is
   sum(df^2) over cold trigram shingles — with a FRACTION cap the kept-df
   distribution shifts with corpus size, so the curve checks the cap
   keeps candidate volume near-linear.
3. **embed_cluster_medoid** at x1/x4/x16 embeddings: the identity is
   O(n*d) by construction; the curve should be scan-linear.

Usage: python tools/probe_r10b.py [--out SCALE_PROBE_r10b.json]
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
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r10b.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries import sequential_r10
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="probe-r10b")
    out: dict = {}

    for name in (
        "corpus_misra_gries_sharded",
        "dedup_tf_cosine_pairs",
        "embed_cluster_medoid",
    ):
        curve: dict = {}
        for mult in (1, 4, 16):
            d = os.path.join(a.base, f"x{mult}rv")
            if not os.path.exists(os.path.join(d, "documents.parquet")):
                gen_corpus(d, mult, realistic_vocab=True)
            t0 = time.time()
            n = QUERIES[name].fn(spark, d).count()
            curve[f"x{mult}"] = {"sec": round(time.time() - t0, 2), "rows": n}
            print(f"[{name}] x{mult}: {curve[f'x{mult}']}", flush=True)
            spark.catalog.clearCache()
        out[name] = curve

    # shard-count knob for the MG fold at x16
    d16 = os.path.join(a.base, "x16rv")
    knob: dict = {}
    orig = sequential_r10._MG_SHARDS
    try:
        for shards in (16, 64):
            sequential_r10._MG_SHARDS = shards
            t0 = time.time()
            n = QUERIES["corpus_misra_gries_sharded"].fn(spark, d16).count()
            knob[f"shards{shards}"] = {
                "sec": round(time.time() - t0, 2),
                "rows": n,
            }
            print(f"[mg x16] shards={shards}: {knob[f'shards{shards}']}",
                  flush=True)
            spark.catalog.clearCache()
    finally:
        sequential_r10._MG_SHARDS = orig
    knob["note"] = (
        "per-shard stream length is the fold's cost axis; raising the "
        "shard count 16->64 at fixed corpus cuts it 4x and adds parallel "
        "folds — the same sizing knob as tar shards, with the merge "
        "summary growing only as shards*k rows"
    )
    out["misra_gries_shard_knob"] = knob

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
