"""r9 third probe batch: scaling curves for the r9b/r9c operators.

1. **io_tar_shard_roundtrip** at x1/x4/x16: shard count held at 8 so the
   curve shows per-shard linearity (write = one tarfile stream per group,
   read = one member walk per shard).  Production sizes shards to ~1 GB
   by raising the shard count — the knob, not the algorithm, changes.
2. **corpus_cooc_svd_embedding** at x1/x4/x16 (realistic 2000-word zipf
   vocab): the bigram aggregate is the only corpus-scale pass; the lift
   matrix and matvec live on the (saturating) vocab^2 grid, so the curve
   should approach scan-linearity as Heaps-law vocab growth flattens.
3. **dedup_soundex_blocking** at x1/x4/x16 (realistic vocab): token df
   aggregate is corpus-scale; soundex blocks and the within-block pair
   join are vocabulary-scale.
4. **join_geo_grid_knn shape** at 10x and 100x the sf0.1 entity counts
   (coordinates are pure key arithmetic, so the probe scales the
   entities directly through the same grid join + argmin body):
   candidate volume = customers x per-neighborhood supplier density.
5. **events_top_paths shape** on 10M synthetic events across 150k users:
   the per-user prefix window is the only data-scale stage; path
   cardinality stays event-type^5-bounded.
6. **ml_quantile_regression_pinball spine** at 3650 synthetic days: the
   41-slope grid x daily spine (~150k cells) + per-slope order
   statistics — the documented worst realistic calendar span.

Usage: python tools/probe_r9c.py [--out SCALE_PROBE_r09c.json]
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
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r09c.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe")
    a = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="probe-r9c")
    out: dict = {}

    # ---- 1-3: documents-driven queries at x1/x4/x16 ------------------------
    for name in (
        "io_tar_shard_roundtrip",
        "corpus_cooc_svd_embedding",
        "dedup_soundex_blocking",
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
    out["io_tar_shard_roundtrip"]["note"] = (
        "shard count pinned at 8, so per-shard bytes grow 16x across the "
        "curve — production raises shard count to hold ~1 GB/shard and the "
        "same plan parallelizes; the walk is one sequential stream per task"
    )
    out["corpus_cooc_svd_embedding"]["note"] = (
        "bigram aggregate is the only corpus-scale pass; lift matrix + "
        "matvec run on the Heaps-saturating vocab^2 grid"
    )

    # ---- 4: geo grid kNN body at 10x / 100x entity counts -------------------
    geo: dict = {}
    # cell size SHRINKS with supplier density (20deg at x10, 2deg at x100):
    # holding cells fixed while density grows 100x yields ~8e9 candidates
    # (measured: spill-to-disk death on this box) — the probe demonstrates
    # the density knob, not the blowup.
    for mult, cell_u in ((10, 20000000), (100, 2000000)):
        n_cust, n_supp = 15_000 * mult, 1_000 * mult
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
            F.floor((F.col("lat") + 80000000) / cell_u).alias("cx"),
            F.floor((F.col("lon") + 180000000) / cell_u).alias("cy"),
        )
        sgrid = supp.select(
            "*",
            F.floor((F.col("s_lat") + 80000000) / cell_u).alias("scx"),
            F.floor((F.col("s_lon") + 180000000) / cell_u).alias("scy"),
        )
        offs = spark.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx int, dy int",
        )
        t0 = time.time()
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
        n = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .count()
        )
        geo[f"x{mult}"] = {
            "cust": n_cust,
            "supp": n_supp,
            "cell_microdeg": cell_u,
            "matched": n,
            "sec": round(time.time() - t0, 2),
        }
        print(f"[geo_knn] x{mult}: {geo[f'x{mult}']}", flush=True)
        spark.catalog.clearCache()
    geo["note"] = (
        "candidate volume = customers x 3x3-neighborhood supplier density; "
        "at fixed cell size density grows with supplier count, so 100 TB "
        "operation shrinks cells (or H3 levels) to hold density ~ k — the "
        "argmin window stays per-customer-partitioned either way"
    )
    out["join_geo_grid_knn"] = geo

    # ---- 5: top-paths body on 10M synthetic events --------------------------
    import pandas as pd  # noqa: F401

    ev = (
        spark.range(0, 10_000_000)
        .select(
            (F.col("id") % 150_000).alias("user_id"),
            F.col("id").alias("event_id"),
            (F.col("id") * 2654435761 % 97).alias("tick"),
            F.element_at(
                F.array(*[F.lit(t) for t in
                          ("click", "view", "purchase", "signup", "error")]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    w_rn = Window.partitionBy("user_id").orderBy("tick", "event_id")
    t0 = time.time()
    firstk = ev.select(
        "user_id", "event_type", F.row_number().over(w_rn).alias("rn")
    ).where(F.col("rn") <= 5)
    paths = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    n_paths = paths.groupBy("path").count().count()
    out["events_top_paths"] = {
        "events": 10_000_000,
        "users": 150_000,
        "distinct_paths": n_paths,
        "sec": round(time.time() - t0, 2),
        "note": (
            "per-user prefix window shuffles once on user_id (the only "
            "data-scale stage); distinct paths stay 5^|types|-bounded"
        ),
    }
    print(f"[top_paths] {out['events_top_paths']}", flush=True)

    # ---- 6: pinball grid on a 3650-day spine --------------------------------
    daily = spark.range(0, 3650).select(
        (F.lit(19000) + F.col("id")).alias("x"),
        (
            F.lit(5_000_000)
            + (F.col("id") * 1234567) % 1_000_000
            + F.col("id") * 300
        ).alias("y"),
    )
    grid = spark.range(0, 41).select(
        (100 * (F.col("id") - 20)).cast("bigint").alias("slope")
    )
    t0 = time.time()
    resid = grid.crossJoin(daily).select(
        "slope", (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    w_rk = Window.partitionBy("slope").orderBy("r")
    w_n = Window.partitionBy("slope")
    ranked = resid.select(
        "slope",
        "r",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    taus = spark.createDataFrame([(5,), (9,)], "tau_x10 int")
    icept = ranked.join(
        F.broadcast(taus), F.col("rk") == F.expr("(tau_x10 * n + 9) DIV 10")
    ).select("tau_x10", "slope", F.col("r").alias("b"))
    loss = (
        icept.join(resid.withColumnRenamed("r", "rr"), "slope")
        .groupBy("tau_x10", "slope", "b")
        .agg(
            F.sum(
                F.when(
                    F.col("rr") >= F.col("b"),
                    F.col("tau_x10") * (F.col("rr") - F.col("b")),
                ).otherwise(
                    (10 - F.col("tau_x10")) * (F.col("b") - F.col("rr"))
                )
            ).alias("pinball_x10")
        )
    )
    n_models = loss.count()
    out["ml_quantile_regression_pinball"] = {
        "days": 3650,
        "grid_cells": 41 * 3650,
        "models_scored": n_models,
        "sec": round(time.time() - t0, 2),
        "note": (
            "model-parallel scoring: every (slope, day) cell independent; "
            "per-slope order statistics ride PARTITIONED windows"
        ),
    }
    print(f"[pinball] {out['ml_quantile_regression_pinball']}", flush=True)

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
