"""The >25% regression auto-isolation must never silently no-op again (r6
verdict item 2): when a driver BENCH artifact has ``"parsed": null`` (stdout
line overflowed the driver's ~2000-char parse window, as in BENCH_r05), the
previous round's per-query timings are recovered from the raw ``tail``
capture — even when the tail is truncated mid-JSON."""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import bench  # noqa: E402


def test_parse_tail_whole_line():
    line = json.dumps({"metric": "x", "queries": {"q1": 1.5, "q2": 0.25}, "sf": 0.1})
    r = bench._parse_tail("noise\n" + line + "\n")
    assert r["queries"] == {"q1": 1.5, "q2": 0.25}


def test_parse_tail_truncated_head():
    # head cut mid-object, "queries" key itself gone — the r05 shape
    tail = '": 1.2, "q3_shipping_priority": 1.261, "q6_forecast": 0.302}, "sf": 0.1}\n'
    r = bench._parse_tail(tail)
    assert r is not None
    assert r["queries"]["q3_shipping_priority"] == 1.261
    assert "sf" not in r["queries"]


def test_real_r05_artifact_recovers():
    path = os.path.join(_REPO_ROOT, "BENCH_r05.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        d = json.load(f)
    assert d.get("parsed") is None  # the artifact that caused the no-op
    r = bench._parse_tail(d.get("tail", ""))
    assert r and len(r["queries"]) > 30


def test_latest_prev_bench_never_returns_queryless():
    p = bench._latest_prev_bench()
    if p is not None:
        assert p.get("queries"), "recovered bench must carry a queries map"


def test_headline_names_all_registered():
    """A renamed/removed registry query must not silently shrink the bench
    (bench.py filters unknown names instead of failing)."""
    from bench import HEADLINE
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, missing
    assert len(set(HEADLINE)) == len(HEADLINE)


def test_headline_line_budget():
    """The stdout metric line must fit the driver's ~2000-char parse window
    with headroom for an "isolated" section (r7 verdict item 4): simulate a
    worst-plausible line from the CURRENT headline set — 4-char timings
    ("12.34") per query plus an 8-entry isolated map — and assert it stays
    under the 1800-char hard guard bench.py enforces at emit time."""
    from bench import HEADLINE

    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 999.999,
            "unit": "sec",
            "queries": {n: 12.34 for n in HEADLINE},
            "sf": 0.1,
            "isolated": {n: 12.345 for n in HEADLINE[:8]},
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1800, (
        f"worst-case bench line is {len(line)} chars; prune HEADLINE"
    )
