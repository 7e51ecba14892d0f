"""r10 session-2 probe #2: the dominance/distinct-value spine axis.

The Jonckheere/Cliff's-delta dominance machinery and the Anderson-
Darling two-sample statistic all run over a spine of DISTINCT value
buckets (windowed cumulative counts), so their risk axis is value
CARDINALITY, not row count.  Fixture values land in ~287 buckets; this
probe widens the domain to 10k/100k/1M distinct values at a fixed row
count, and separately grows rows 10x at fixed cardinality, to pin both
slopes.

Usage: python tools/probe_r10d.py [--out SCALE_PROBE_r10d.json]
"""

from __future__ import annotations

import argparse
import datetime as dt
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

BASE_ROWS = 100_000


def gen_events(out_dir: str, n_rows: int, n_distinct: int, seed: int = 13) -> None:
    rng = np.random.default_rng(seed + n_rows + n_distinct)
    os.makedirs(out_dir, exist_ok=True)
    base = dt.datetime(2024, 1, 1)
    ts = [
        base + dt.timedelta(seconds=int(s))
        for s in rng.integers(0, 30 * 86400, n_rows)
    ]
    # values quantized so round(value) yields ~n_distinct buckets
    vals = rng.integers(0, n_distinct, n_rows).astype(np.float64)
    types = np.array(["click", "view", "purchase", "signup", "error"])[
        rng.integers(0, 5, n_rows)
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(n_rows), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 1500, n_rows), pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n_rows, pa.string()),
        }
    )
    pq.write_table(t, f"{out_dir}/events.parquet")
    for f in os.listdir("/root/testdata/sf0.1"):
        dst = f"{out_dir}/{f}"
        if f.startswith("events") or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.1/{f}", dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r10d.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe_r10d")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="probe_r10d",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(a.base, ignore_errors=True)

    out: dict = {"cardinality_axis": [], "row_axis": []}
    for nd in (10_000, 100_000, 1_000_000):
        d = f"{a.base}/card_{nd}"
        gen_events(d, BASE_ROWS, nd)
        row = {"n_distinct": nd, "rows": BASE_ROWS}
        for q in ("ml_jonckheere_trend", "ml_anderson_darling_2samp"):
            t0 = time.time()
            QUERIES[q].fn(spark, d).count()
            row[q + "_s"] = round(time.time() - t0, 2)
        out["cardinality_axis"].append(row)
        print("card", row)

    for mult in (1, 10):
        d = f"{a.base}/rows_x{mult}"
        gen_events(d, BASE_ROWS * mult, 100_000)
        row = {"mult": mult, "rows": BASE_ROWS * mult}
        for q in ("ml_jonckheere_trend", "ml_anderson_darling_2samp"):
            t0 = time.time()
            QUERIES[q].fn(spark, d).count()
            row[q + "_s"] = round(time.time() - t0, 2)
        out["row_axis"].append(row)
        print("rows", row)

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print("->", a.out)
    shutil.rmtree(a.base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
