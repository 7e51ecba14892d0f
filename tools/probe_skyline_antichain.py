"""Adversarial probe for sample_pareto_frontier (VERDICT r7 item 5).

The skyline's global close broadcasts the union of per-partition local
frontiers.  On real corpora that union is tiny (correlated objectives);
the ADVERSARIAL case is an anti-chain — objectives perfectly
anti-correlated so NO point dominates any other — where every local
frontier is its whole partition and the broadcast is the full table,
making the close O(n²) dominance evaluations.

This probe constructs that worst case directly: doc i has n_words = i+1
(text of i+1 tokens) and n_chars = n - i, so (n_words + n_chars) is
constant and dominance (>= all, > one) is impossible for every pair.
Records candidate counts and close-phase runtimes at growing n — the
measured basis for the cap documented in the operator.

Usage: python tools/probe_skyline_antichain.py [--sizes 5000,20000,60000]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def gen_antichain(out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # words per doc cycles 1..200 with n_chars a pure DECREASING function
    # of the cycle position: any two docs either have words up & chars
    # down (incomparable) or identical feature vectors (exact ties — all
    # survive under the strict dominance rule), so the frontier is the
    # ENTIRE set while texts stay small (<=200 words) — the probe
    # stresses the CLOSE, not tokenization.
    cyc = 200
    i = np.arange(n)
    words = (i % cyc) + 1
    chars = (cyc - (i % cyc)) * 10
    texts = [" ".join(["w"] * int(k)) for k in words]
    docs = pa.table(
        {
            "doc_id": pa.array(i, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["src0"] * n, pa.string()),
            "n_chars": pa.array(chars, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    base = "/root/testdata/sf0.01"
    for f in os.listdir(base):
        dst = os.path.join(out_dir, f)
        if f.startswith("documents") or os.path.exists(dst):
            continue
        os.symlink(os.path.join(base, f), dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,20000,60000")
    ap.add_argument("--out", default="/tmp/skyline_antichain")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="probe-skyline-antichain")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for n in (int(s) for s in a.sizes.split(",")):
        d = os.path.join(a.out, f"n{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            gen_antichain(d, n)
        t0 = time.time()
        out = QUERIES["sample_pareto_frontier"].fn(spark, d)
        rows = out.count()
        dt = round(time.time() - t0, 2)
        results[f"n{n}"] = {"frontier_rows": rows, "sec": dt}
        print(f"n={n}: frontier={rows} ({dt}s)", flush=True)
        # an anti-chain's frontier IS the whole set — correctness check
        assert rows == n, (rows, n)
    print(json.dumps({"probe": "skyline_antichain", "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
