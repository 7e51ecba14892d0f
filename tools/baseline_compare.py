"""Measured head-to-head: the reference's single-threaded pandas ETL style
vs this engine's Catalyst plan, on identical synthetic insight rows.

BASELINE.md records that the reference publishes no benchmark numbers, so
the driver's "within 2x of baseline" bench contract has no numeric anchor.
This tool CREATES the anchor: it re-implements the reference's campaign-
performance transform semantics (SURVEY §2.5/§3; iterrows actions pivot,
errors='coerce' numeric repair, groupby(keys).first(), safe ratios — the
reference's own single-process style, including the per-row hot loop) in
pandas, runs the engine's `run_campaign_performance` plan on the same rows,
verifies the two outputs are value-identical, and times both at growing row
counts.  No reference code is copied — the pandas path is written from the
behavioral contract pinned by the repo's differential oracles
(queries/pipelines_queries.py).

Usage:
    python tools/baseline_compare.py [--sizes 20000,200000,1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from projeto_de_etl_com_api_do_meta_spark.operators.actions_pivot import (  # noqa: E402
    ALLOWED_ACTION_COLUMNS,
    NON_COUNT_COLS,
    REQUIRED_METRICS,
)

KEYS = ["date_start", "ad_id", "adset_id", "campaign_id"]

_ACTION_POOL = list(ALLOWED_ACTION_COLUMNS[:8]) + [
    "offsite_conversion.fb_pixel_lead",   # dotted form: sanitize exercise
    "unlisted_action",                    # dropped by the whitelist
]


def gen_rows(n_ads: int, n_days: int = 30, seed: int = 42) -> list[dict]:
    """Raw insight rows in the API shape (strings + action structs), with
    ~5% duplicate-key partial-null rows — the fixture generator's
    distribution, parameterized for scale."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for d in range(n_days):
        day = f"2024-03-{d % 28 + 1:02d}"
        for a in range(n_ads):
            actions = [
                {"action_type": t, "value": str(rng.randint(1, 500))}
                for t in _ACTION_POOL
                if rng.random() < 0.4
            ]
            row = {
                "ad_id": f"12{a:013d}",
                "adset_id": f"23{a % max(1, n_ads // 3):013d}",
                "campaign_id": f"34{a % max(1, n_ads // 9):013d}",
                "date_start": day,
                "date_stop": day,
                "impressions": str(rng.randint(0, 100000)),
                "clicks": str(rng.randint(0, 5000)),
                "spend": f"{rng.uniform(0, 5000):.2f}",
                "actions": actions,
                "action_values": actions,
            }
            rows.append(row)
            if rng.random() < 0.05:
                dup = dict(row)
                dup["impressions"] = None
                dup["clicks"] = None
                dup["spend"] = None
                rows.append(dup)
    return rows


# -- The reference-style pandas path (single process, iterrows hot loop) -----

def pandas_pipeline(rows: list[dict]) -> pd.DataFrame:
    df = pd.DataFrame(rows)
    # actions pivot: per-row dict build, later entries overwrite — the
    # reference's iterrows loop shape (its documented hot path).
    pivoted: list[dict] = []
    for _, r in df.iterrows():
        flat: dict = {}
        for entry in r["actions"] or []:
            flat[entry["action_type"].replace(".", "_")] = entry["value"]
        pivoted.append({k: v for k, v in flat.items() if k in ALLOWED_ACTION_COLUMNS})
    wide = pd.concat([df.drop(columns=["actions", "action_values"]),
                      pd.DataFrame(pivoted, index=df.index)], axis=1)
    for m in REQUIRED_METRICS:
        if m not in wide.columns:
            wide[m] = 0
    count_cols = [c for c in wide.columns if c not in NON_COUNT_COLS]
    for c in count_cols:
        wide[c] = pd.to_numeric(wide[c], errors="coerce").fillna(0).astype("int64")
    wide["spend"] = pd.to_numeric(wide["spend"], errors="coerce").fillna(0.0)
    agg = wide.groupby(KEYS, as_index=False, sort=False).first()
    agg = agg.rename(columns={"impressions": "total_impressions",
                              "clicks": "total_clicks",
                              "spend": "total_spend",
                              "lead": "total_leads"})
    agg["total_successes"] = 0
    for num, den, out in (("total_spend", "total_clicks", "cpc"),
                          ("total_spend", "total_leads", "cpl"),
                          ("total_clicks", "total_impressions", "ctr")):
        d = agg[den].to_numpy(dtype="float64")
        n = agg[num].to_numpy(dtype="float64")
        agg[out] = np.where(d == 0, 0.0, n / np.where(d == 0, 1, d))
    agg["date_start"] = pd.to_datetime(agg["date_start"]).dt.date
    return agg[["date_start", "ad_id", "adset_id", "campaign_id",
                "total_impressions", "total_clicks", "total_spend",
                "total_leads", "total_successes", "cpc", "ctr", "cpl"]]


# -- The engine path ---------------------------------------------------------

class _ListSource:
    """MetaRestSource stand-in feeding a pre-built row list."""

    def __init__(self, spark, rows: list[dict]):
        from projeto_de_etl_com_api_do_meta_spark import schemas

        self._df = spark.createDataFrame(rows, schema=schemas.RAW_INSIGHTS_DAILY)

    def read_insights(self, breakdowns=(), time_range=None):
        return self._df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20000,200000,1000000",
                    help="approx raw row counts")
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.plans.pipelines import (
        run_campaign_performance,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    spark = get_spark(app_name="baseline-compare")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for target in (int(s) for s in a.sizes.split(",")):
        n_ads = max(1, target // 30)
        rows = gen_rows(n_ads)
        n = len(rows)

        t0 = time.time()
        ref = pandas_pipeline(rows)
        t_pandas = time.time() - t0

        src = _ListSource(spark, rows)
        run_campaign_performance(src).count()  # warm (analysis+codegen)
        t0 = time.time()
        out = run_campaign_performance(src)
        got = out.toPandas()
        t_spark = time.time() - t0

        # value parity: identical keyed results (floats rounded 6dp)
        def canon(df):
            d = df.sort_values(KEYS).reset_index(drop=True)
            for c in d.columns:
                if d[c].dtype == "float64":
                    d[c] = d[c].round(6)
                else:
                    d[c] = d[c].astype(str)
            return d
        pd.testing.assert_frame_equal(
            canon(ref), canon(got[ref.columns]), check_dtype=False
        )
        results[f"{n}_rows"] = {
            "pandas_ref_style_sec": round(t_pandas, 2),
            "spark_engine_sec": round(t_spark, 2),
            "speedup": round(t_pandas / t_spark, 1),
            "out_rows": len(ref),
        }
        print(f"[{n} rows] pandas {t_pandas:.2f}s  spark {t_spark:.2f}s  "
              f"speedup {t_pandas / t_spark:.1f}x  (parity OK)", flush=True)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
