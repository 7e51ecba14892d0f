"""Audit every registered oracle's DuckDB result dtypes for cross-engine
hash hazards.

The driver compares Spark vs DuckDB results after pandas canonicalization;
DuckDB returns HUGEINT (int128) for SUM over integer expressions, which
pandas coerces to a dtype Spark's int64 never produces -> hash mismatch even
when values are identical (the q12 / embed_random_projection failure mode).
This tool runs each oracle with LIMIT 0 semantics (a cheap fetch at sf0.001)
and flags any HUGEINT / UHUGEINT / unexpected object-dtype column so casts
get added BEFORE the driver scores the query.

Usage:
    python tools/oracle_dtype_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import duckdb  # noqa: E402

from projeto_de_etl_com_api_do_meta_spark.io import TABLES, table_path  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.queries.registry import (  # noqa: E402
    QUERIES,
    _load_all,
)

_HAZARD_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT64", "UBIGINT"}


def main(sf_dir: str) -> int:
    _load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    n_hazard = n_err = n_ok = 0
    for name, spec in sorted(QUERIES.items()):
        if not spec.oracle:
            continue
        try:
            rel = con.sql(spec.oracle)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_err += 1
            continue
        hazards = [(c, t) for c, t in cols if t.upper() in _HAZARD_TYPES]
        if hazards:
            print(f"HAZ  {name}: {hazards}")
            n_hazard += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} clean, {n_hazard} hazardous, {n_err} errors")
    return 1 if (n_hazard or n_err) else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    a = ap.parse_args()
    sys.exit(main(a.sf))
