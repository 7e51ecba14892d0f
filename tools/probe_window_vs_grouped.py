"""Reproduce SCALE.md's window-vs-grouped_dense_ids crossover measurement.

ROW_NUMBER() OVER (PARTITION BY g) runs one task per group; with few huge
groups that serializes the sort however many cores exist.  This probe times
the plain window against operators/indexing.py grouped_dense_ids on an
in-plan synthetic corpus (2 groups — the worst case for the window form)
and verifies both produce identical position assignments via an
order-sensitive checksum.

Usage:
    python tools/probe_window_vs_grouped.py [--rows 20000000]

Findings recorded in SCALE.md: at 320k rows the plain window wins (two
sub-second sorts); at 40M rows grouped is ~1.8x faster on local[32], and
past a single task's memory the window form stops completing at all.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from projeto_de_etl_com_api_do_meta_spark.operators.indexing import (  # noqa: E402
    grouped_dense_ids,
)
from projeto_de_etl_com_api_do_meta_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    a = ap.parse_args()

    spark = get_spark(app_name="probe_window_vs_grouped")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(a.rows).select(F.col("id").alias("doc_id"))
    epochs = base.crossJoin(
        F.broadcast(spark.range(2).select(F.col("id").cast("int").alias("epoch")))
    )
    keyed = epochs.withColumn(
        "sort_key",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ),
    )
    checksums = {}
    for name in ("grouped", "window"):
        spark.catalog.clearCache()
        t0 = time.time()
        if name == "window":
            w = W.partitionBy("epoch").orderBy("sort_key", "doc_id")
            out = keyed.withColumn(
                "position", F.row_number().over(w).cast("long")
            )
        else:
            out = grouped_dense_ids(
                keyed, "epoch", ["sort_key", "doc_id"], id_col="position"
            )
        # assignment-sensitive checksum: hashes the FULL (epoch, doc_id,
        # position) triple so swapped group offsets, cross-epoch mixups,
        # and modular position shifts all change the sum (a plain
        # position*doc product is blind to whole-group swaps because each
        # doc appears once per epoch).
        row = out.agg(
            F.count(F.lit(1)),
            F.sum(
                F.xxhash64("epoch", "doc_id", "position")
                % F.lit(1_000_000_007)
            ),
        ).collect()[0]
        checksums[name] = (int(row[0]), int(row[1]))
        print(
            f"{name}: {time.time() - t0:.1f}s rows={row[0]} checksum={row[1]}",
            flush=True,
        )
    assert checksums["window"] == checksums["grouped"], checksums
    print("checksums identical")


if __name__ == "__main__":
    main()
