"""r11 probe #2: scaling behavior of the two new heavy shapes.

1. **graph_adamic_adar — part-degree axis.**  The posting self-join's
   pair volume is sum over parts of C(deg_p, 2), so the risk axis is
   per-part customer degree (hot parts), not raw row count.  Two
   curves: entity scale x1/x4 (orders+lineitem grow together, degrees
   roughly constant -> pair volume ~linear), and a deliberate HOT-part
   fixture (one part bought by every customer) to measure the
   quadratic blowup the docstring's df-cap story is about.
2. **io_dod_timestamp_roundtrip — row axis.**  One shuffle on user_id +
   per-user Arrow batches; wall must be scan-linear in events
   (x1/x4/x16), with per-user stream length the only state.

Usage: python tools/probe_r11b.py [--out SCALE_PROBE_r11b.json]
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


def gen_copurchase(out_dir: str, mult: int, hot_part: bool = False, seed: int = 17) -> None:
    """orders + lineitem with mult x sf0.01-ish entity counts; optionally
    one hot part in every customer's basket."""
    rng = np.random.default_rng(seed + mult)
    os.makedirs(out_dir, exist_ok=True)
    n_cust, n_orders, n_parts = 1500 * mult, 15000 * mult, 2000 * mult
    custkeys = rng.integers(0, n_cust, n_orders)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_orders, pa.string()),
                "o_totalprice": pa.array([100.0] * n_orders, pa.float64()),
                "o_orderdate": pa.array(
                    [dt.date(2024, 1, 1)] * n_orders, pa.date32()
                ),
            }
        ),
        f"{out_dir}/orders.parquet",
    )
    rows_per_order = 4
    ok = np.repeat(np.arange(n_orders), rows_per_order)
    parts = rng.integers(0, n_parts, n_orders * rows_per_order)
    if hot_part:
        # part 0 lands in every order -> degree ~ n_cust
        parts[::rows_per_order] = 0
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(parts, pa.int64()),
                "l_quantity": pa.array([1.0] * len(ok), pa.float64()),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )
    for f in os.listdir("/root/testdata/sf0.01"):
        dst = f"{out_dir}/{f}"
        if f.startswith(("orders", "lineitem")) or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.01/{f}", dst)


def gen_events(out_dir: str, mult: int, seed: int = 19) -> None:
    rng = np.random.default_rng(seed + mult)
    os.makedirs(out_dir, exist_ok=True)
    n = 100_000 * mult
    base = dt.datetime(2024, 1, 1)
    ts = [
        base + dt.timedelta(microseconds=int(u))
        for u in rng.integers(0, 30 * 86400 * 1_000_000, n)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, 1500 * mult, n), pa.int64()),
                "event_type": pa.array(
                    np.array(["click", "view", "purchase", "signup", "error"])[
                        rng.integers(0, 5, n)
                    ]
                ),
                "value": pa.array(rng.uniform(0, 500, n), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        f"{out_dir}/events.parquet",
    )
    for f in os.listdir("/root/testdata/sf0.01"):
        dst = f"{out_dir}/{f}"
        if f.startswith("events") or os.path.exists(dst):
            continue
        os.symlink(f"/root/testdata/sf0.01/{f}", dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCALE_PROBE_r11b.json")
    )
    ap.add_argument("--base", default="/tmp/scale_probe_r11b")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="probe_r11b",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(a.base, ignore_errors=True)

    out: dict = {"adamic_adar": {}, "dod_codec": {}}

    # warm-up: first execution of each plan shape absorbs Catalyst codegen
    # + Arrow lane init (measured: cold x1 ran 2x slower than warm x4);
    # both shapes run once untimed so the curves compare like with like.
    warm = f"{a.base}/warm"
    gen_copurchase(warm, 1)
    gen_events(warm, 1)
    QUERIES["graph_adamic_adar"].fn(spark, warm).count()
    QUERIES["io_dod_timestamp_roundtrip"].fn(spark, warm).count()

    for mult in (1, 4):
        d = f"{a.base}/aa_x{mult}"
        gen_copurchase(d, mult)
        spark.catalog.clearCache()
        t0 = time.time()
        n = QUERIES["graph_adamic_adar"].fn(spark, d).count()
        out["adamic_adar"][f"x{mult}"] = {
            "rows": n,
            "sec": round(time.time() - t0, 2),
        }
        print("aa", mult, out["adamic_adar"][f"x{mult}"])

    d = f"{a.base}/aa_hot"
    gen_copurchase(d, 1, hot_part=True)
    spark.catalog.clearCache()
    t0 = time.time()
    n = QUERIES["graph_adamic_adar"].fn(spark, d).count()
    out["adamic_adar"]["x1_hot_part"] = {
        "rows": n,
        "sec": round(time.time() - t0, 2),
        "note": "one part in every basket (deg = n_cust = 1500, ~1.1M extra "
        "pairs): absorbed at this scale — the point is the C(deg,2) LAW, "
        "which at production degrees (1e6) reaches 5e11 pairs; that is "
        "the documented hot-key case where the df-cap/salting treatment "
        "of dedup_ngram_jaccard_capped must gate the self-join",
    }
    print("aa hot", out["adamic_adar"]["x1_hot_part"])

    for mult in (1, 4, 16):
        d = f"{a.base}/dod_x{mult}"
        gen_events(d, mult)
        spark.catalog.clearCache()
        t0 = time.time()
        rows = QUERIES["io_dod_timestamp_roundtrip"].fn(spark, d).collect()
        ok = sum(r["n_roundtrip_ok"] for r in rows)
        users = sum(r["n_users"] for r in rows)
        out["dod_codec"][f"x{mult}"] = {
            "users": users,
            "ok": ok,
            "sec": round(time.time() - t0, 2),
        }
        assert ok == users, "roundtrip failure at scale"
        print("dod", mult, out["dod_codec"][f"x{mult}"])

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", a.out)
    shutil.rmtree(a.base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
