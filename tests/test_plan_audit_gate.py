"""CI gate for the plan-audit invariant (r8 verdict item 1).

The full audit materializes every batch query's physical plan (~minutes),
so the per-commit gate has three tiers:

1. allowlist hygiene — every allowlisted (query, flag) pair must reference
   a registered query, so stale entries can't silently mask a future FLAG
   under a recycled name (always runs, fast);
2. the blind-repartition source lint (always runs, fast);
3. the full plan audit — runs when SPARK_GRAFT_FULL_AUDIT=1 (the per-round
   closing sweep), skipped otherwise.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(_REPO_ROOT, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))


def test_allowlist_references_registered_queries():
    import plan_audit

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    stale = sorted(
        {name for name, _flag in plan_audit.ALLOWLIST if name not in QUERIES}
    )
    assert not stale, f"allowlist entries for unregistered queries: {stale}"
    bad_flags = sorted(
        {
            f
            for _n, f in plan_audit.ALLOWLIST
            if f not in ("CARTESIAN", "GLOBAL_WINDOW", "ROW_UDF")
        }
    )
    assert not bad_flags, f"unknown flag kinds in allowlist: {bad_flags}"


def test_no_blind_repartitions():
    import plan_audit

    assert plan_audit.lint_blind_repartitions() == 0


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_AUDIT") != "1",
    reason="full plan audit is the per-round closing sweep "
    "(SPARK_GRAFT_FULL_AUDIT=1)",
)
def test_full_plan_audit_is_green():
    import plan_audit

    assert plan_audit.audit() == 0
