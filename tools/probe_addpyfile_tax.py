"""Root-cause probe for the r7 `perf_daily_fact`/`join_full_outer_fanout`
regression (VERDICT r7, "What's wrong" #2): does the session-level
``addPyFile`` hook (session.py:_ship_package, added in commit 1afafa7) tax
every subsequent job by a constant?

Method: ONE process, ONE session (the bench methodology), run the two
regressed queries plus a no-op count N times BEFORE the hook fires and N
times AFTER.  addPyFile is session-sticky, so before/after inside one
session is the only clean A/B; process-level A/B would confound with JVM
warmup.  A second process flips the order (hook first) to control for
warmup drift.

Usage: python tools/probe_addpyfile_tax.py [hook_first]
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 7
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    hook_first = len(sys.argv) > 1 and sys.argv[1] == "hook_first"
    # Keep _ship_package from auto-firing via pin_query_session_conf: call
    # the query bodies' logic through the registry, but monkeypatch the
    # shipper to a recorder we control.
    from projeto_de_etl_com_api_do_meta_spark import session as sess_mod
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import queries_map
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    real_ship = sess_mod._ship_package
    sess_mod._ship_package = lambda spark: None  # disarm

    spark = get_spark(app_name="probe-addpyfile-tax")
    qmap = queries_map()
    targets = ["perf_daily_fact", "join_full_outer_fanout"]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qmap[name](spark, SF_DIR)
        df.collect()
        return time.perf_counter() - t0

    def noop() -> float:
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    # warmup (parquet footers, codegen)
    for name in targets:
        run_once(name)
    noop()

    def phase() -> dict:
        out: dict[str, list[float]] = {n: [] for n in targets}
        out["noop"] = []
        for _ in range(REPS):
            for n in targets:
                out[n].append(round(run_once(n), 4))
            out["noop"].append(round(noop(), 4))
        return out

    if hook_first:
        real_ship(spark)
        with_hook = phase()
        without = None  # cannot un-ship; single-phase control run
    else:
        without = phase()
        real_ship(spark)
        with_hook = phase()

    def med(xs):
        return sorted(xs)[len(xs) // 2] if xs else None

    result = {
        "probe": "addpyfile_tax",
        "order": "hook_first" if hook_first else "hook_second",
        "reps": REPS,
        "sf_dir": SF_DIR,
        "without_hook": without,
        "with_hook": with_hook,
        "median_without": {k: med(v) for k, v in (without or {}).items()},
        "median_with": {k: med(v) for k, v in with_hook.items()},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
