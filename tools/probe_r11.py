"""r11 probe: the JW/DL ER family's _BLOCK_CAP knob at block saturation.

The r10c probe fixed the cap at 256 and varied vocabulary; the verdict
asked for the other axis: hold the corpus at x16 with a vocabulary whose
first-word blocks SATURATE the cap, and raise the cap 256 -> 1024,
measuring

  * candidate pairs (sum over blocks of C(min(|block|, cap), 2)) — the
    work bound the cap buys;
  * gate survivors (levenshtein<=3 rows, i.e. the rows the Python JW
    UDF actually scores) — the few-per-mille-survivor claim;
  * wall clock THROUGH the UDF (sum of the jw column — a bare count()
    would let Catalyst prune the UDF projection and time only the
    JVM gate, which is exactly the mistake this probe first made).

Vocabulary realism matters here: the r10c generator's words all end in
"zz" and differ in 1-3 leading chars, so the lev<=3 gate passes ~100%
of same-block pairs — useless for the survivor-rate claim.  This
generator derives each word from the md5 of its vocab index (hex mapped
a..p, length 4-11), so same-block second words are effectively random
strings and the integer gate is as selective as on real text.

Usage: python tools/probe_r11.py [--out SCALE_PROBE_r11.json]
"""

from __future__ import annotations

import argparse
import hashlib
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


def _hash_word(i: int) -> str:
    """Deterministic pseudo-random lowercase word, length 4-11."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    length = 4 + (i % 8)
    return "".join(chr(ord("a") + int(c, 16)) for c in h[:length])


def gen_docs(out_dir: str, mult: int, vocab_size: int, seed: int = 7) -> None:
    rng = np.random.default_rng(seed + mult * 1000 + vocab_size)
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array([_hash_word(i) for i in range(vocab_size)])
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r11.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe_r11")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries import similarity_r10
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="probe_r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(a.base, ignore_errors=True)

    d = f"{a.base}/jw_x16_v4000"
    gen_docs(d, mult=16, vocab_size=4000)

    out: dict = {"jw_block_cap_axis": []}
    orig_cap = similarity_r10._BLOCK_CAP
    try:
        for cap in (256, 1024):
            similarity_r10._BLOCK_CAP = cap
            spark.catalog.clearCache()
            # candidate-pair bound: sum over blocks of C(min(|b|, cap), 2)
            cand = int(
                similarity_r10._capped_bigram_blocks(spark, d)
                .groupBy("blk")
                .agg(F.count(F.lit(1)).alias("m"))
                .agg(F.sum(F.expr("m * (m - 1) div 2")).alias("cand"))
                .collect()[0]["cand"]
                or 0
            )
            t0 = time.time()
            # sum(jw) + count forces the Python scorer to actually run on
            # every gate survivor (count() alone lets Catalyst prune the
            # UDF projection and times only the JVM levenshtein gate)
            res = (
                QUERIES["er_jaro_winkler_pairs"]
                .fn(spark, d)
                .agg(
                    F.count(F.lit(1)).alias("survivors"),
                    F.sum("jw").alias("jw_sum"),
                )
                .collect()[0]
            )
            wall = round(time.time() - t0, 2)
            survivors = int(res["survivors"])
            row = {
                "cap": cap,
                "candidate_pairs": cand,
                "gate_survivors": survivors,
                "survivor_rate_ppm": round(survivors * 1e6 / max(cand, 1)),
                "sec": wall,
            }
            out["jw_block_cap_axis"].append(row)
            print("jw cap", row)
    finally:
        similarity_r10._BLOCK_CAP = orig_cap

    c256, c1024 = out["jw_block_cap_axis"]
    out["note"] = (
        "x16 corpus, V=4000 md5-derived words (blocks saturate): raising "
        "the cap 256->1024 multiplies candidate pairs "
        f"{round(c1024['candidate_pairs'] / max(c256['candidate_pairs'], 1), 1)}x "
        f"and end-to-end wall (through the Python JW scorer) "
        f"{round(c1024['sec'] / max(c256['sec'], 0.01), 1)}x — the cap is the work "
        f"knob; the integer levenshtein<=3 gate passes {c256['survivor_rate_ppm']} ppm "
        f"(cap 256) / {c1024['survivor_rate_ppm']} ppm (cap 1024) of candidates to "
        "Python, so the few-per-mille-survivor claim holds when blocks saturate."
    )
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", a.out)
    shutil.rmtree(a.base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
