"""Long-run probe for the incremental streaming near-dup store (VERDICT r3
item 5): replay a corpus as MANY micro-batches (default 25, vs the registry
query's 5) and measure per-batch trigger time plus store file/row growth,
with and without compaction, and with a TTL retention policy.

What it demonstrates:
* WITHOUT compaction, the store gains one parquet file set per batch, so
  every batch's store probe + anti-join reads a linearly growing file list
  — per-batch cost creeps even though per-batch data is constant.
* WITH compaction (every 8 batches, semantics-preserving), the file count
  is bounded and per-batch cost stays flat.
* WITH ttl_batches, store ROWS are bounded too (windowed-suppression
  contract — explicit opt-in, not the oracle-verified default).

Per-batch timings come from the StreamingQuery's own progress events
(triggerExecution durationMs), not wall-clock around the whole run.

Usage: python tools/probe_incremental.py [--batches 25] [--corpus x4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def store_stats(spark, store_path: str) -> tuple[int, int]:
    files = len(glob.glob(os.path.join(store_path, "part-*.parquet")))
    rows = spark.read.parquet(store_path).count()
    return files, rows


def run_variant(
    spark, stream_dir: str, label: str, compact_every: int, ttl: int | None
) -> dict:
    from projeto_de_etl_com_api_do_meta_spark.streaming.windows import (
        incremental_neardup_suppress,
    )

    run = tempfile.mkdtemp(prefix=f"probe_incr_{label}_")
    store = os.path.join(run, "buckets.parquet")
    q = incremental_neardup_suppress(
        spark,
        stream_dir,
        store,
        os.path.join(run, "results.parquet"),
        os.path.join(run, "ckpt"),
        compact_every=compact_every,
        ttl_batches=ttl,
    )
    q.awaitTermination()
    batch_ms = [
        (p["batchId"], p["durationMs"].get("triggerExecution", 0))
        for p in (json.loads(str(j)) for j in q.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    files, rows = store_stats(spark, store)
    shutil.rmtree(run, ignore_errors=True)
    out = {
        "batch_ms": [ms for _, ms in sorted(batch_ms)],
        "store_files": files,
        "store_rows": rows,
    }
    first5 = out["batch_ms"][:5]
    last5 = out["batch_ms"][-5:]
    out["first5_avg_ms"] = round(sum(first5) / max(len(first5), 1))
    out["last5_avg_ms"] = round(sum(last5) / max(len(last5), 1))
    print(
        f"[{label}] batches={len(out['batch_ms'])} "
        f"first5={out['first5_avg_ms']}ms last5={out['last5_avg_ms']}ms "
        f"store_files={files} store_rows={rows}",
        flush=True,
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=25)
    ap.add_argument(
        "--corpus",
        default="/tmp/scale_probe_r4/x4",
        help="sf-style dir with documents.parquet (see tools/scale_probe.py)",
    )
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.session import get_spark
    from projeto_de_etl_com_api_do_meta_spark.streaming.windows import (
        chunked_docs_stream_dir,
    )

    spark = get_spark(app_name="probe-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream_dir = chunked_docs_stream_dir(spark, a.corpus, n_chunks=a.batches)

    results = {
        "corpus": a.corpus,
        "batches": a.batches,
        "no_compaction": run_variant(spark, stream_dir, "no_compaction", 0, None),
        "compact_every_8": run_variant(spark, stream_dir, "compact8", 8, None),
        "compact8_ttl8": run_variant(spark, stream_dir, "compact8_ttl8", 8, 8),
    }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
