"""Isolated single-query benchmark: fresh JVM/session, N reps, min+median.

Built for VERDICT r3 "What's wrong #1": five TPC-H headliners regressed
25-70% between BENCH_r02 and BENCH_r03 with no change to their source, most
plausibly session noise from the 9 queries added to the shared bench JVM.
This tool removes the shared-session variable: each invocation is one query
in its own process, so round-over-round deltas measured here are real.

Usage:
    python tools/bench_isolated.py q1_pricing_summary [q3_... ...] [--reps 5]

Each query runs in a SUBPROCESS (fresh JVM) so earlier queries cannot leak
cached blocks, codegen, or GC state into later ones.  Inside the child, rep 1
absorbs Catalyst analysis + codegen and is reported separately ("cold");
the min and median of the remaining reps are the steady-state numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from projeto_de_etl_com_api_do_meta_spark.queries.registry import QUERIES, _load_all
from projeto_de_etl_com_api_do_meta_spark.session import get_spark

name, sf_dir, reps = {name!r}, {sf_dir!r}, {reps}
_load_all()
spark = get_spark(app_name="bench-isolated",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
times = []
for _ in range(reps + 1):  # +1 cold rep
    spark.catalog.clearCache()
    t0 = time.time()
    QUERIES[name].fn(spark, sf_dir).count()
    times.append(time.time() - t0)
print("RESULT " + json.dumps({{"cold": times[0], "warm": times[1:]}}))
"""


def measure_isolated(
    names: list[str], sf_dir: str, reps: int = 5, quiet: bool = False
) -> dict[str, dict]:
    """Run each query in its own subprocess (fresh JVM); {name: stats}.
    Importable — bench.py uses this to auto-confirm flagged cross-round
    deltas inside the round's own artifact (r4 verdict item 5)."""
    out: dict[str, dict] = {}
    for name in names:
        code = _CHILD.format(repo=_REPO_ROOT, name=name, sf_dir=sf_dir, reps=reps)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None
        )
        if line is None:
            # Loud failure (VERDICT r9 item 3): carry the actual exception
            # text into the artifact so a crash-in-isolation can never again
            # read as benign noise.  bench.py surfaces any isolated error in
            # a top-level "errors" key and test_bench_recovery gates on it.
            tail = proc.stderr.strip().splitlines()
            exc = next(
                (ln for ln in reversed(tail)
                 if "Error" in ln or "Exception" in ln),
                tail[-1] if tail else "no stderr",
            )
            print(f"{name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            out[name] = {"error": True, "exception": exc[:500]}
            continue
        r = json.loads(line[len("RESULT "):])
        warm = r["warm"]
        out[name] = {
            "cold": round(r["cold"], 3),
            "min": round(min(warm), 3),
            "median": round(statistics.median(warm), 3),
            "reps": len(warm),
        }
        if not quiet:
            print(f"{name}: cold={out[name]['cold']}s "
                  f"min={out[name]['min']}s median={out[name]['median']}s",
                  flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    a = ap.parse_args()
    out = measure_isolated(a.queries, a.sf_dir, a.reps)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
