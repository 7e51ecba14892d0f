"""Oracle dtype audit as a hard pytest gate.

DuckDB promotes SUM over integer expressions (including windowed SUMs inside
arithmetic) to HUGEINT; the driver's value hash is dtype-sensitive, so an
uncasted oracle column red-flags a driver row even when values are identical.
This exact artifact burned a driver slot in TWO rounds (r4
``lakehouse_incremental_scan``, r6 ``events_survival_kaplan_meier``) while
``tools/oracle_dtype_audit.py`` existed but was not wired into CI — r6
verdict item 1 makes it a failing gate.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from projeto_de_etl_com_api_do_meta_spark.io import TABLES, table_path  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.queries.registry import (  # noqa: E402
    QUERIES,
    _load_all,
)
from tools.oracle_dtype_audit import _HAZARD_TYPES  # noqa: E402

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(_SF_DIR), reason=f"test data missing: {_SF_DIR}"
)
def test_no_oracle_returns_hazardous_dtypes():
    _load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(_SF_DIR, t)}')"
        )
    hazards: list[tuple[str, list[tuple[str, str]]]] = []
    errors: list[tuple[str, str]] = []
    for name, spec in sorted(QUERIES.items()):
        if not spec.oracle:
            continue
        try:
            rel = con.sql(spec.oracle)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            errors.append((name, f"{type(e).__name__}: {e}"))
            continue
        bad = [(c, t) for c, t in cols if t.upper() in _HAZARD_TYPES]
        if bad:
            hazards.append((name, bad))
    assert not errors, errors
    assert not hazards, (
        "uncasted oracle dtypes (wrap in CAST(... AS BIGINT)): " + repr(hazards)
    )
