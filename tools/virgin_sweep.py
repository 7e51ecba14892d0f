"""Virgin-session smoke sweep: every registry query once, each in a FRESH JVM.

Built for VERDICT r9 item 2.  The shared pytest/bench sessions mask
first-execution-only plan bugs: `embed_ann_ivf` crashed deterministically on
its FIRST run in a fresh SparkSession (Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_
FOUND from InferFiltersFromConstraints substituting a self-join alias
expression across the probe join) yet passed everywhere a warm session had
already executed other queries.  This sweep removes that blind spot: each
query gets its own subprocess (own JVM, own Catalyst state, nothing warm), so
any plan that only compiles after session warm-up fails HERE, loudly.

Usage:
    python tools/virgin_sweep.py                      # all registry queries
    python tools/virgin_sweep.py embed_ann_ivf q1_... # a subset
    python tools/virgin_sweep.py --sf-dir /root/testdata/sf0.01 --workers 8

Each child runs local[4] (plan-compilation bugs don't need 32 cores) so 8
children co-exist on the 32-CPU box; the sweep of the full ~470-query
registry completes in ~10-15 min.  Exit code is non-zero if ANY query errors;
the artifact (VIRGIN_SWEEP.json, or --out) records per-query status + the
exception line for failures.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_MASTER"] = {master!r}
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "3g")
from projeto_de_etl_com_api_do_meta_spark.queries.registry import QUERIES, _load_all
from projeto_de_etl_com_api_do_meta_spark.session import get_spark
_load_all()
spark = get_spark(app_name="virgin-sweep",
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
n = QUERIES[{name!r}].fn(spark, {sf_dir!r}).count()
print("VIRGIN_OK " + str(n))
"""


def _run_one(name: str, sf_dir: str, master: str, timeout: int) -> dict:
    code = _CHILD.format(repo=_REPO_ROOT, master=master, name=name, sf_dir=sf_dir)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "exception": f"timeout after {timeout}s"}
    elapsed = round(time.time() - t0, 1)
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("VIRGIN_OK ")),
        None,
    )
    if line is not None:
        return {"ok": True, "rows": int(line.split()[1]), "sec": elapsed}
    tail = [ln for ln in proc.stderr.strip().splitlines() if ln.strip()]
    exc = next(
        (ln for ln in reversed(tail) if "Error" in ln or "Exception" in ln),
        tail[-1] if tail else "no stderr",
    )
    return {"ok": False, "exception": exc[:500], "sec": elapsed}


def sweep(
    names: list[str],
    sf_dir: str,
    workers: int = 8,
    master: str = "local[4]",
    timeout: int = 600,
    quiet: bool = False,
) -> dict[str, dict]:
    out: dict[str, dict] = {}
    done = 0
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        futs = {
            pool.submit(_run_one, n, sf_dir, master, timeout): n for n in names
        }
        for fut in cf.as_completed(futs):
            name = futs[fut]
            out[name] = fut.result()
            done += 1
            if not quiet:
                status = (
                    "ok"
                    if out[name]["ok"]
                    else "FAIL " + out[name]["exception"][:120]
                )
                print(f"[{done}/{len(names)}] {name}: {status}", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="default: whole registry")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_VIRGIN_SF_DIR", "/root/testdata/sf0.001"
        ),
    )
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--master", default="local[4]")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(_REPO_ROOT, "VIRGIN_SWEEP.json"))
    a = ap.parse_args()
    if a.queries:
        names = a.queries
    else:
        sys.path.insert(0, _REPO_ROOT)
        from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
            QUERIES,
            _load_all,
        )

        _load_all()
        names = list(QUERIES)
    t0 = time.time()
    results = sweep(names, a.sf_dir, a.workers, a.master, a.timeout)
    failures = {n: r for n, r in results.items() if not r["ok"]}
    artifact = {
        "sf_dir": a.sf_dir,
        "n_queries": len(names),
        "n_fail": len(failures),
        "failures": {n: r["exception"] for n, r in failures.items()},
        "total_sec": round(time.time() - t0, 1),
        "results": results,
    }
    with open(a.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"virgin sweep: {len(names) - len(failures)}/{len(names)} ok "
        f"in {artifact['total_sec']}s -> {a.out}"
    )
    if failures:
        for n, r in sorted(failures.items()):
            print(f"  FAIL {n}: {r['exception'][:200]}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
