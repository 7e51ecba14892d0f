"""Pins for the r9 ADVICE findings (round 10).

1. events_power_law_mle's per-row ln() is evaluated independently by Spark
   (JVM Math.log, 1-ulp) and DuckDB (C libm) before e9 fixed-point rounding.
   The sweep below compares the rounded term cross-engine over the FULL
   realistic per-user-count domain, so a libm divergence that could flip an
   e9 integer fails loudly here instead of flaking the differ.
2. dq_functional_dependency_profile NULL-sentinels every FD column in both
   engines (DuckDB counts (lhs, NULL) struct tuples in COUNT(DISTINCT ..),
   Spark's countDistinct drops them) — verified on a fixture WITH nulls.
3. io_tar_shard_roundtrip removes its shard temp directory after the audit
   is materialized (it used to leak shard bytes every run).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.queries.network_sequential import (
    _PL_XMIN,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_power_law_ln_terms_match_duckdb_over_domain(spark):
    """round(ln(x / (xmin - 0.5)) * 1e9) must agree bit-for-bit between
    Spark and DuckDB for every count value x the estimator can see."""
    lo, hi = _PL_XMIN, 200_000
    spark_terms = (
        spark.range(lo, hi + 1)
        .select(
            F.col("id").alias("x"),
            F.round(
                F.log(F.col("id").cast("double") / (_PL_XMIN - 0.5))
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("t"),
        )
        .orderBy("x")
        .collect()
    )
    duck_terms = duckdb.sql(
        f"""
        SELECT x, CAST(round(ln(CAST(x AS DOUBLE) / ({_PL_XMIN} - 0.5))
                        * 1000000000) AS BIGINT) AS t
        FROM range({lo}, {hi + 1}) AS r(x) ORDER BY x
        """
    ).fetchall()
    assert len(spark_terms) == len(duck_terms)
    mismatches = [
        (int(s["x"]), int(s["t"]), int(d[1]))
        for s, d in zip(spark_terms, duck_terms)
        if int(s["t"]) != int(d[1])
    ]
    assert not mismatches, (
        f"libm divergence on this platform at {len(mismatches)} x values "
        f"(first: {mismatches[:5]}) — restate the estimator or quarantine"
    )


def test_fd_profile_null_semantics_symmetric(spark, tmp_path):
    """A fixture with NULL user_id/event_type must produce identical
    n_pair_distinct in both engines (the sentinel mapping at work)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.profiling_formats import (
        _ORACLE_FD_FULL,
        dq_functional_dependency_profile,
    )

    rows = [
        ("click", 1, "2024-01-01 00:00:00", 10.0),
        ("click", None, "2024-01-02 00:00:00", 20.0),
        (None, 2, "2024-01-03 00:00:00", 30.0),
        (None, None, "2024-01-04 00:00:00", 40.0),
        ("view", 2, "2024-01-05 00:00:00", None),  # dropped: value IS NULL
    ]
    ev = spark.createDataFrame(
        [(e, u, t, v) for e, u, t, v in rows],
        "event_type string, user_id bigint, ts string, value double",
    ).select(
        "event_type", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    pq = str(tmp_path / "events.parquet")
    ev.write.parquet(pq)
    # point both engines at the same fixture directory
    got = {
        (r["lhs"], r["rhs"]): (r["n_pair_distinct"], r["n_violating_lhs"])
        for r in dq_functional_dependency_profile(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = {
        (r[0], r[1]): (r[3], r[5])
        for r in con.execute(_ORACLE_FD_FULL).fetchall()
    }
    assert got == want
    # the NULL rows must actually be counted (not silently dropped)
    assert got[("event_type", "user_id")][0] == 4  # 4 distinct (et,uid) pairs


def test_tar_shard_tempdir_cleaned(spark):
    from projeto_de_etl_com_api_do_meta_spark.queries.io_archives import (
        io_tar_shard_roundtrip,
    )

    import tempfile

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "tar_shards_*")))
    out = io_tar_shard_roundtrip(spark, SF_DIR)
    assert out.count() > 0
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "tar_shards_*")))
    assert after - before == set(), "shard temp dir leaked"


def test_coverage_counts_block_fresh():
    """COVERAGE.md's generated-counts block must match the live registry +
    correctness artifacts (VERDICT r9 item 5: the hand-written header went
    stale twice; now regeneration is asserted in CI)."""
    import sys as _sys

    import re as _re

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_operators_md import _CC_BEGIN, _CC_END, _coverage_counts

    text = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    start = text.index(_CC_BEGIN)
    block = text[start : text.index(_CC_END)]
    # Compare against artifacts up to the round STAMPED at generation time:
    # the driver writes CORRECTNESS_r{N}.json AFTER the builder's final
    # commit, so an unbounded count would stale the committed block in a
    # race the builder cannot win (VERDICT r10 item 4).
    m = _re.search(r"cumulative through r(\d+)", block)
    assert m, "generated block lost its round stamp"
    stamped = int(m.group(1))
    total, n_oracle, n_green, latest = _coverage_counts(max_round=stamped)
    assert latest == stamped
    expected = (
        f"**{total} registry queries, {n_oracle} oracle-backed, "
        f"{n_green} unique driver-green"
    )
    assert expected in block, (
        "stale COVERAGE.md counts — run python tools/gen_operators_md.py"
    )


def test_rows_only_residue_documented():
    """Every rows-only registry entry must have a row in COVERAGE.md's
    residue table (name + why-not + twin), and the table must not list
    names that are no longer rows-only (VERDICT r9 item 9)."""
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    rows_only = {n for n, s in QUERIES.items() if not s.oracle}
    text = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    section = text.split("## Rows-only residue")[1].split("\n## ")[0]
    import re

    documented = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    assert rows_only - documented == set(), "undocumented rows-only entries"
    assert documented - rows_only == set(), "stale residue rows"
