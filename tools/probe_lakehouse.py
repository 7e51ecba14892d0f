"""Measure the lakehouse commit protocol's cost curve: commit_append must be
O(new data) regardless of table size (the claim in operators/lakehouse.py),
read_changes O(delta), and only full-snapshot reads may grow with history.

Appends K fixed-size batches, timing each append, its incremental
consumption, and a full snapshot read every few versions.

Usage: python tools/probe_lakehouse.py [--batches 20] [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--rows", type=int, default=200_000)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from projeto_de_etl_com_api_do_meta_spark.operators.lakehouse import (
        commit_append,
        read_changes,
        read_version,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    spark = get_spark(app_name="probe-lakehouse")
    spark.sparkContext.setLogLevel("ERROR")
    table = tempfile.mkdtemp(prefix="lakehouse_probe_") + "/t"

    appends, deltas, snapshots = [], [], {}
    for b in range(a.batches):
        df = (
            spark.range(b * a.rows, (b + 1) * a.rows)
            .select(
                F.col("id"),
                (F.col("id") % 97).alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            .repartition(4)
        )
        t0 = time.time()
        v = commit_append(df, table, stats_cols=("id",))
        appends.append(round(time.time() - t0, 2))
        if v >= 2:
            t0 = time.time()
            n = read_changes(spark, table, v - 1, v).count()
            deltas.append(round(time.time() - t0, 2))
            assert n == a.rows
        if v in (1, a.batches // 2, a.batches):
            t0 = time.time()
            total = read_version(spark, table).count()
            snapshots[f"v{v}"] = {
                "sec": round(time.time() - t0, 2),
                "rows": total,
            }
    out = {
        "batches": a.batches,
        "rows_per_batch": a.rows,
        "append_sec": appends,
        "read_changes_sec": deltas,
        "snapshot_read": snapshots,
        "note": (
            "append cost includes writing the batch + stats scan of the NEW "
            "files only + manifest publish; flat across versions = O(new "
            "data). read_changes is flat = O(delta). Snapshot reads grow "
            "with history, as they must."
        ),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
