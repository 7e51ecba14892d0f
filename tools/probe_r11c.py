"""r11 probe #3: scaling behavior of the session-3 operator shapes.

1. **agg_count_min_sketch** — x1/x4/x16 events: state is 256 cells
   regardless of volume; wall must be scan-linear (map-combinable
   4x fan-out hash aggregate).
2. **events_shapley_attribution** — x1/x4/x16 events: all corpus-scale
   work is the per-user mask aggregate; the 16x16 coalition algebra is
   constant, so the curve must be scan-linear.
3. **dedup_cdc_chunking** — x1/x4/x16 documents: the rolling hash
   visits every char once inside higher-order functions; wall must be
   linear in total characters (the inherent cost of CDC).
4. **graph_hits_hubs** — x1/x4 entity scale: 8 shuffle half-rounds over
   the edge list; wall ~linear in edges at fixed round count.

Usage: python tools/probe_r11c.py [--out SCALE_PROBE_r11c.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from tools.probe_r11b import gen_copurchase, gen_events  # noqa: E402


def gen_documents(out_dir: str, mult: int) -> None:
    """documents scaled mult x by replicating sf0.01 docs with distinct
    numeric prefixes (so chunk content stays diverse, not pure dups)."""
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    ids, texts, langs, sources, nch = [], [], [], [], []
    base_ids = src["doc_id"].to_pylist()
    base_texts = src["text"].to_pylist()
    base_langs = src["lang"].to_pylist()
    base_sources = src["source"].to_pylist()
    n = len(base_ids)
    for m in range(mult):
        for i in range(n):
            t = f"copy {m} marker " + base_texts[i]
            ids.append(m * n + base_ids[i])
            texts.append(t)
            langs.append(base_langs[i])
            sources.append(base_sources[i])
            nch.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )
    for f in os.listdir("/root/testdata/sf0.01"):
        dst = f"{out_dir}/{f}"
        if f.startswith("documents") or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.01/{f}", dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r11c.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe_r11c")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="probe_r11c",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(a.base, ignore_errors=True)

    out: dict = {"cms": {}, "shapley": {}, "cdc": {}, "hits": {}}

    warm = f"{a.base}/warm"
    gen_events(warm, 1)
    gen_documents(f"{a.base}/warm_docs", 1)
    gen_copurchase(f"{a.base}/warm_g", 1)
    QUERIES["agg_count_min_sketch"].fn(spark, warm).count()
    QUERIES["events_shapley_attribution"].fn(spark, warm).count()
    QUERIES["dedup_cdc_chunking"].fn(spark, f"{a.base}/warm_docs").count()
    QUERIES["graph_hits_hubs"].fn(spark, f"{a.base}/warm_g").count()

    for mult in (1, 4, 16):
        d = f"{a.base}/ev_x{mult}"
        gen_events(d, mult)
        for key, qname in (("cms", "agg_count_min_sketch"),
                           ("shapley", "events_shapley_attribution")):
            spark.catalog.clearCache()
            t0 = time.time()
            n = QUERIES[qname].fn(spark, d).count()
            out[key][f"x{mult}"] = {"rows": n, "sec": round(time.time() - t0, 2)}
            print(key, mult, out[key][f"x{mult}"])

    for mult in (1, 4, 16):
        d = f"{a.base}/docs_x{mult}"
        gen_documents(d, mult)
        spark.catalog.clearCache()
        t0 = time.time()
        row = QUERIES["dedup_cdc_chunking"].fn(spark, d).collect()[0]
        out["cdc"][f"x{mult}"] = {
            "total_chunks": row["total_chunks"],
            "dup_chunks": row["dup_chunks"],
            "sec": round(time.time() - t0, 2),
        }
        print("cdc", mult, out["cdc"][f"x{mult}"])

    for mult in (1, 4):
        d = f"{a.base}/g_x{mult}"
        gen_copurchase(d, mult)
        spark.catalog.clearCache()
        t0 = time.time()
        n = QUERIES["graph_hits_hubs"].fn(spark, d).count()
        out["hits"][f"x{mult}"] = {"rows": n, "sec": round(time.time() - t0, 2)}
        print("hits", mult, out["hits"][f"x{mult}"])

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", a.out)
    shutil.rmtree(a.base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
