"""r10 session-2 probe: scaling behavior of the new heavies.

1. **er_jaro_winkler_pairs — vocabulary axis.**  The operator's work is
   sum over first-word blocks of min(|block|, 256)^2 UDF comparisons, so
   the risk axis is VOCABULARY growth (blocks ~ V, block size ~ V/26ish),
   not corpus rows: with a fixed vocab, more documents only add scan cost
   to the DISTINCT.  Two curves prove both claims:
     a) corpus x1/x4/x16 at V=1000 — pair count must stay FLAT (vocab
        saturates, Heaps plateau), wall ~ scan-linear.
     b) V=250/1000/4000 at fixed corpus — pair volume grows ~V^2/blocks
        until the 256 cap bites; the probe records where the cap engages.
2. **geo_geohash_encode — row axis.**  Map-only projection + grouped
   count; wall must be scan-linear in points (x1/x16/x64 customers).

Usage: python tools/probe_r10c.py [--out SCALE_PROBE_r10c.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

BASE_DOCS = 2000
DOC_WORDS = 40


def _alpha_word(i: int) -> str:
    """Deterministic all-lowercase-alphabetic word for vocab index i."""
    s = []
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s.append(chr(ord("a") + r))
    return "".join(reversed(s)) + "zz"  # suffix keeps 1-char ids out


def gen_docs(out_dir: str, mult: int, vocab_size: int, seed: int = 7) -> None:
    """documents.parquet with an ALPHABETIC zipf vocab (the stock probe
    generator's w0001-style vocab fails the ^[a-z]+$ gate); other sf0.1
    tables symlinked."""
    rng = np.random.default_rng(seed + mult * 1000 + vocab_size)
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array([_alpha_word(i) for i in range(vocab_size)])
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    n_docs = BASE_DOCS * mult
    idx = rng.choice(vocab_size, size=(n_docs, DOC_WORDS), p=p)
    texts = [" ".join(vocab[row]) for row in idx]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array([f"s{i % 4}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t_) for t_ in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{out_dir}/documents.parquet")
    for f in os.listdir("/root/testdata/sf0.1"):
        dst = f"{out_dir}/{f}"
        if f.startswith("documents") or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.1/{f}", dst)


def gen_points(out_dir: str, mult: int) -> None:
    """customer/supplier parquet with mult x sf0.1 key ranges."""
    os.makedirs(out_dir, exist_ok=True)
    n_c, n_s = 15000 * mult, 1000 * mult
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_c), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_c)]),
                "c_nationkey": pa.array([i % 25 for i in range(n_c)], pa.int32()),
                "c_acctbal": pa.array([0.0] * n_c, pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * n_c, pa.string()),
            }
        ),
        f"{out_dir}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_s), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_s)]),
                "s_nationkey": pa.array([i % 25 for i in range(n_s)], pa.int32()),
            }
        ),
        f"{out_dir}/supplier.parquet",
    )
    for f in os.listdir("/root/testdata/sf0.1"):
        dst = f"{out_dir}/{f}"
        if f.startswith(("customer", "supplier")) or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.1/{f}", dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r10c.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe_r10c")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="probe_r10c",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(a.base, ignore_errors=True)

    out: dict = {"jw_corpus_axis": [], "jw_vocab_axis": [], "geohash_rows": []}

    for mult in (1, 4, 16):
        d = f"{a.base}/jw_x{mult}"
        gen_docs(d, mult, vocab_size=1000)
        t0 = time.time()
        n = QUERIES["er_jaro_winkler_pairs"].fn(spark, d).count()
        out["jw_corpus_axis"].append(
            {"mult": mult, "pairs": n, "wall_s": round(time.time() - t0, 2)}
        )
        print("jw corpus", out["jw_corpus_axis"][-1])

    for v in (250, 1000, 4000):
        d = f"{a.base}/jw_v{v}"
        gen_docs(d, 4, vocab_size=v)
        t0 = time.time()
        n = QUERIES["er_jaro_winkler_pairs"].fn(spark, d).count()
        out["jw_vocab_axis"].append(
            {"vocab": v, "pairs": n, "wall_s": round(time.time() - t0, 2)}
        )
        print("jw vocab", out["jw_vocab_axis"][-1])

    for mult in (1, 16, 64):
        d = f"{a.base}/geo_x{mult}"
        gen_points(d, mult)
        t0 = time.time()
        n = QUERIES["geo_geohash_encode"].fn(spark, d).count()
        out["geohash_rows"].append(
            {"mult": mult, "gh4_buckets": n, "wall_s": round(time.time() - t0, 2)}
        )
        print("geohash", out["geohash_rows"][-1])

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print("->", a.out)
    shutil.rmtree(a.base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
