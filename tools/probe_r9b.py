"""r9 second probe batch: scaling curves for the round's new operators.

1. **text_textrank_keywords** at x1/x4/x16 (realistic 2000-word zipf
   vocab): edge extraction is one corpus-scale aggregate, the 3 PageRank
   iterations run on the VOCABULARY graph — the curve should flatten as
   the vocab saturates (Heaps law) while the scan stays linear.
2. **train_pack_nextfit_md5** at x1/x4/x16: shard-parallel fold — the
   collect_list per shard grows linearly; confirms no hot-reducer blowup.
3. **graph_hits_bipartite shape** on synthetic zipf bipartite edges at
   1M/4M edges (the fixture's orders⋈lineitem graph is sf-pinned, so the
   probe scales the edge list directly through the same per-iteration
   join+aggregate body).
4. **ml_theil_sen_daily spine** at 3650 synthetic days (~6.66M pairs):
   the day-bounded pair join + one order-statistic window — the
   documented worst realistic calendar span.

Usage: python tools/probe_r9b.py [--out SCALE_PROBE_r09b.json]
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
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r09b.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe")
    a = ap.parse_args()

    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="probe-r9b")
    out: dict = {}

    # ---- 1 + 2: documents-driven queries at x1/x4/x16 ----------------------
    for name in ("text_textrank_keywords", "train_pack_nextfit_md5"):
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

    # ---- 3: HITS body on synthetic zipf bipartite edges --------------------
    hits: dict = {}
    for n_edges in (1_000_000, 4_000_000):
        rng = np.random.default_rng(13)
        cust = (rng.zipf(1.5, n_edges) % 200_000).astype("int64")
        part = (rng.zipf(1.5, n_edges) % 400_000).astype("int64")
        edges = (
            spark.createDataFrame(pd.DataFrame({"cust": cust, "part": part}))
            .distinct()
            .repartition(32)
            .persist()
        )
        ne = edges.count()
        hubs = edges.select("cust").distinct().withColumn(
            "score", F.lit(1_000_000).cast("bigint")
        )
        t0 = time.time()
        for _ in range(2):
            a_raw = (
                edges.join(hubs, "cust")
                .groupBy("part")
                .agg(F.sum("score").cast("bigint").alias("raw"))
            )
            mx = a_raw.agg(F.max("raw").alias("mx"))
            auths = a_raw.crossJoin(F.broadcast(mx)).select(
                "part",
                F.expr("CAST(raw * 1000000 div mx AS BIGINT)").alias("score"),
            )
            h_raw = (
                edges.join(auths, "part")
                .groupBy("cust")
                .agg(F.sum("score").cast("bigint").alias("raw"))
            )
            mx2 = h_raw.agg(F.max("raw").alias("mx"))
            hubs = h_raw.crossJoin(F.broadcast(mx2)).select(
                "cust",
                F.expr("CAST(raw * 1000000 div mx AS BIGINT)").alias("score"),
            )
        n_h = hubs.count()
        hits[f"edges_{n_edges}"] = {
            "distinct_edges": ne,
            "sec_2_iters": round(time.time() - t0, 2),
            "hubs": n_h,
        }
        print(f"[hits] {n_edges}: {hits[f'edges_{n_edges}']}", flush=True)
        edges.unpersist()
        spark.catalog.clearCache()
    hits["note"] = (
        "per-iteration body = edges-scores join + dst aggregate + 1-row "
        "max broadcast; zipf-skewed hub keys ride AQE's skew handling"
    )
    out["graph_hits_body"] = hits

    # ---- 4: Theil-Sen on a 10-year daily spine ------------------------------
    days = 3650
    rng = np.random.default_rng(17)
    daily = spark.createDataFrame(
        pd.DataFrame(
            {
                "d": pd.date_range("2015-01-01", periods=days).date,
                "x": np.arange(days, dtype="int64"),
                "y_e2": rng.integers(10_000, 1_000_000, days),
            }
        )
    ).persist()
    daily.count()
    aa, bb = daily.alias("a"), daily.alias("b")
    pairs = aa.join(bb, F.col("a.d") < F.col("b.d")).select(
        (F.col("b.y_e2") - F.col("a.y_e2")).alias("dy"),
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (
            (F.col("b.y_e2") - F.col("a.y_e2")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
        F.col("a.d").alias("da"),
        F.col("b.d").alias("db"),
    )
    from pyspark.sql import Window

    t0 = time.time()
    ranked = pairs.withColumn(
        "rn", F.row_number().over(Window.orderBy("slope", "da", "db"))
    ).withColumn("np", F.count(F.lit(1)).over(Window.partitionBy()))
    med = ranked.where(F.expr("rn = (np + 1) div 2")).collect()
    out["theil_sen_3650d"] = {
        "n_pairs": days * (days - 1) // 2,
        "sec": round(time.time() - t0, 2),
        "note": "10-year calendar spine (~6.66M pairs) through the exact "
        "order-statistic path; pairs are calendar-bounded so this is the "
        "realistic ceiling at any corpus size",
    }
    print(f"[theil_sen] {out['theil_sen_3650d']}", flush=True)
    assert len(med) == 1

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
