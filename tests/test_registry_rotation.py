"""Scoring-window rotation: the registry reads CORRECTNESS_r*.json driver
artifacts so already-green queries automatically leave the ~50-slot scoring
prefix (re-scoring greens wastes the driver's budget — the round-2 verdict's
top finding)."""

from __future__ import annotations

import json
import os

from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
    QUERIES,
    _PRIORITY,
    _driver_verified,
    _load_all,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_names_are_unique():
    # a duplicate silently burns a scoring slot (r6 verdict item 3)
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_driver_artifacts_are_absorbed():
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        _FORCE_RESCORE,
    )

    _load_all()
    verified = _driver_verified()
    # every hash-match row from the committed driver artifacts is absorbed —
    # except names whose semantics changed after their green row landed
    # (_FORCE_RESCORE): those deliberately re-enter the scoring window.
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(_REPO_ROOT, fname)
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") and name not in _FORCE_RESCORE:
                    assert name in verified, (fname, name)


def test_force_rescore_reenters_window():
    """A semantically-changed query's stale green row must not keep it out
    of the scoring prefix."""
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        _FORCE_RESCORE,
    )

    _load_all()
    verified = _driver_verified()
    names = list(QUERIES)
    for n in _FORCE_RESCORE:
        assert n not in verified
        assert names.index(n) < 50, f"{n} fell outside the scoring window"


def test_new_artifact_is_picked_up():
    # q1_pricing_summary is ALREADY green in r02, so a leaked test file
    # can never skew real scoring order — safe to write in the repo root.
    path = os.path.join(_REPO_ROOT, "CORRECTNESS_r99.json")
    try:
        with open(path, "w") as f:
            json.dump({"q1_pricing_summary": {"hash_match": True}}, f)
        assert "q1_pricing_summary" in _driver_verified()
    finally:
        os.remove(path)


def test_scoring_prefix_has_no_verified_and_only_oracles():
    """Every not-yet-green oracle-backed query must sort before any green
    or rows-only one. When fewer than 50 unverified queries remain (the
    rotation is nearly drained), greens legitimately back-fill the window
    — only the PREFIX up to the unverified count is constrained."""
    _load_all()
    verified = _driver_verified()
    n_unverified = sum(
        1 for n, s in QUERIES.items() if s.oracle and n not in verified
    )
    prefix = list(QUERIES)[: min(50, n_unverified)]
    for name in prefix:
        assert name not in verified, f"{name} is green but still in the window"
        assert QUERIES[name].oracle, f"{name} is rows-only but in the window"
