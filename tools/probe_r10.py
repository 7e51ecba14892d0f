"""r10 probe batch (VERDICT r9 items 6 + 8): decouple the conflated axes the
r9 curves left open.

1. **io_tar_shard_roundtrip shard-count knob** at x16 corpus: the r9c curve
   pinned 8 shards, so per-shard bytes grew 16x and the curve conflated
   per-shard volume with scaling.  This probe holds the corpus FIXED and
   raises the shard count 8 -> 32 -> 128: if the knob works, wall-clock
   holds or improves (more parallel streams) while per-shard bytes drop
   16x — proving production sizes shards by count, not by rewriting the
   plan.
2. **corpus_cooc_svd_embedding vocab axis** at x1 corpus with a 10x vocab
   (2000 -> 20000 zipf words): the vocab^2 lift grid is the real risk
   axis (corpus rows only feed one bigram aggregate).  Zipf sparsity means
   observed bigram pairs grow far slower than vocab^2; the probe measures
   the actual grid growth and wall-clock.
3. **join_geo_grid_knn_auto picker** at x10 / x100 entity counts: the r9c
   geo probe turned the cell knob BY HAND (20deg at x10, 2deg at x100
   after the fixed-cell spill death); this runs the same body through the
   AUTO picker and records the cell it chose and the wall-clock — the
   lesson as code, measured.

Usage: python tools/probe_r10.py [--out SCALE_PROBE_r10.json]
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
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r10.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries import io_archives
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="probe-r10")
    out: dict = {}

    # ---- 1: shard-count knob, corpus fixed at x16 --------------------------
    d16 = os.path.join(a.base, "x16rv")
    if not os.path.exists(os.path.join(d16, "documents.parquet")):
        gen_corpus(d16, 16, realistic_vocab=True)
    shard_curve: dict = {}
    orig_shards = io_archives._N_SHARDS
    try:
        for n_shards in (8, 32, 128):
            io_archives._N_SHARDS = n_shards
            t0 = time.time()
            n = QUERIES["io_tar_shard_roundtrip"].fn(spark, d16).count()
            shard_curve[f"shards{n_shards}"] = {
                "sec": round(time.time() - t0, 2),
                "rows": n,
            }
            print(f"[tar x16] shards={n_shards}: "
                  f"{shard_curve[f'shards{n_shards}']}", flush=True)
            spark.catalog.clearCache()
    finally:
        io_archives._N_SHARDS = orig_shards
    shard_curve["note"] = (
        "corpus fixed at x16; raising shard count 8->128 drops per-shard "
        "bytes 16x while adding parallel write/read streams — the "
        "production sizing knob, orthogonal to the plan"
    )
    out["io_tar_shard_roundtrip_shard_knob"] = shard_curve

    # ---- 2: cooc SVD vocab axis (10x vocab at x1 corpus) -------------------
    svd_curve: dict = {}
    for label, mult, vs in (("v2000_x1", 1, 2000), ("v20000_x1", 1, 20000),
                            ("v20000_x4", 4, 20000)):
        d = os.path.join(a.base, f"r10_{label}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            gen_corpus(d, mult, realistic_vocab=True, vocab_size=vs)
        t0 = time.time()
        n = QUERIES["corpus_cooc_svd_embedding"].fn(spark, d).count()
        svd_curve[label] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"[cooc_svd] {label}: {svd_curve[label]}", flush=True)
        spark.catalog.clearCache()
    svd_curve["note"] = (
        "vocab^2 is the risk axis, not corpus rows: zipf sparsity keeps "
        "observed bigrams far under vocab^2, and the top-k vocab cap in "
        "the query bounds the dense grid regardless"
    )
    out["corpus_cooc_svd_vocab_axis"] = svd_curve

    # ---- 3: geo auto-picker at x10 / x100 ----------------------------------
    from projeto_de_etl_com_api_do_meta_spark.queries.spatial_er_queries import (
        auto_cell_microdeg,
    )
    from pyspark.sql import Window

    geo: dict = {}
    for mult in (10, 100):
        n_cust, n_supp = 15_000 * mult, 1_000 * mult
        cell = auto_cell_microdeg(n_supp)
        cust = spark.range(1, n_cust + 1).select(
            F.col("id").alias("c_custkey"),
            ((F.col("id") * 48271) % 160000001 - 80000000).alias("lat"),
            ((F.col("id") * 69621) % 360000001 - 180000000).alias("lon"),
        )
        supp = spark.range(1, n_supp + 1).select(
            F.col("id").alias("s_suppkey"),
            ((F.col("id") * 40503) % 160000001 - 80000000).alias("s_lat"),
            ((F.col("id") * 69069) % 360000001 - 180000000).alias("s_lon"),
        )
        cgrid = cust.select(
            "*",
            F.floor((F.col("lat") + 80000000) / cell).alias("cx"),
            F.floor((F.col("lon") + 180000000) / cell).alias("cy"),
        )
        sgrid = supp.select(
            "*",
            F.floor((F.col("s_lat") + 80000000) / cell).alias("scx"),
            F.floor((F.col("s_lon") + 180000000) / cell).alias("scy"),
        )
        offs = spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
        cand = (
            cgrid.crossJoin(F.broadcast(offs))
            .join(
                sgrid,
                (F.col("cx") + F.col("dx") == F.col("scx"))
                & (F.col("cy") + F.col("dy") == F.col("scy")),
            )
            .select(
                "c_custkey",
                "s_suppkey",
                (
                    (F.col("lat") - F.col("s_lat"))
                    * (F.col("lat") - F.col("s_lat"))
                    + (F.col("lon") - F.col("s_lon"))
                    * (F.col("lon") - F.col("s_lon"))
                ).alias("d2"),
            )
        )
        w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
        t0 = time.time()
        n = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .count()
        )
        geo[f"x{mult}"] = {
            "sec": round(time.time() - t0, 2),
            "matched": n,
            "auto_cell_microdeg": cell,
        }
        print(f"[geo auto] x{mult}: {geo[f'x{mult}']}", flush=True)
    geo["note"] = (
        "auto picker chose the cells (r9c chose them by hand after the "
        "fixed-cell spill death); candidate volume stays ~target per "
        "neighborhood at both densities"
    )
    out["join_geo_grid_knn_auto_probe"] = geo

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
