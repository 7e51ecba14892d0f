"""Virgin-session regression tests (VERDICT r9 items 1-3).

`embed_ann_ivf` crashed deterministically on its FIRST execution in a fresh
SparkSession on pyspark 4.1.2: InferFiltersFromConstraints substituted the
inverted-file key's alias expression (an argmax over the corpus vector `cv`)
through the probe-join equality and pushed a predicate referencing `cv` onto
the probe side, where it could not bind (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
Every shared test/bench session masked it because warm sessions replan.

These tests run the repro in a SUBPROCESS — a genuinely virgin JVM — so the
fix (the non-deterministic-flagged zero on the cluster key, which removes it
from constraint tracking; operators/similarity.py::ivf_topk) can never
silently regress.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_virgin(name: str, sf_dir: str) -> dict:
    sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))
    from virgin_sweep import _run_one

    return _run_one(name, sf_dir, master="local[4]", timeout=600)


def test_embed_ann_ivf_first_run_fresh_session():
    """The exact VERDICT r9 repro: first .count() in a virgin session."""
    r = _run_virgin("embed_ann_ivf", "/root/testdata/sf0.001")
    assert r["ok"], f"fresh-session crash regressed: {r.get('exception')}"
    assert r["rows"] > 0


def test_isolated_bench_error_carries_exception():
    """tools/bench_isolated.py must record the exception text, not a silent
    {"error": true} (VERDICT r9 item 3)."""
    sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))
    from bench_isolated import measure_isolated

    out = measure_isolated(
        ["__no_such_query__"], "/root/testdata/sf0.001", reps=1, quiet=True
    )
    rec = out["__no_such_query__"]
    assert rec.get("error") is True
    assert "exception" in rec and rec["exception"], rec
    # the child's KeyError on the unknown name must be visible
    assert "Error" in rec["exception"] or "error" in rec["exception"]


def test_bench_folds_isolated_errors_into_errors_key():
    """bench.py surfaces isolated crashes in the top-level "errors" key so a
    crash can never again ship as noise inside "isolated_detail"."""
    src = open(os.path.join(_REPO_ROOT, "bench.py")).read()
    assert 'setdefault("errors", {})' in src
    assert "isolated:" in src
