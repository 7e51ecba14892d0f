"""Upsert sink semantics (reference load.py:42-133 parity): merge SQL
generation, parquet-merge insert/update/idempotency."""

from __future__ import annotations

import os

from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import (
    merge_sql,
    parquet_upsert,
)


def test_merge_sql_shape():
    merge, drop, drop_safe = merge_sql(
        "ads_campaign_performance",
        ["date_start", "ad_id", "total_spend"],
    )
    assert merge.startswith('INSERT INTO ads_campaign_performance ("date_start", "ad_id", "total_spend")')
    assert 'ON CONFLICT ("date_start", "ad_id") DO UPDATE SET' in merge
    assert '"total_spend" = EXCLUDED."total_spend"' in merge
    assert '"ad_id" = EXCLUDED' not in merge  # keys never updated
    assert drop == "DROP TABLE temp_ads_campaign_performance"
    assert drop_safe.endswith("IF EXISTS temp_ads_campaign_performance")


def test_merge_sql_jsonb_casts():
    merge, _, _ = merge_sql(
        "ads_raw_leads", ["lead_id", "field_data"], staging_table="t"
    )
    assert 'SELECT "lead_id", "field_data"::JSONB FROM t' in merge
    assert '"field_data" = EXCLUDED."field_data"::JSONB' in merge


def _read(spark, path):
    return {
        (r.k,): (r.v, r.ts) for r in spark.read.parquet(path).collect()
    }


def test_parquet_upsert_insert_update_idempotent(spark, tmp_path):
    target = os.path.join(str(tmp_path), "t")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k int, v string, ts int")
    parquet_upsert(spark, b1, target, keys=["k"])
    assert _read(spark, target) == {(1,): ("a", 1), (2,): ("b", 1)}

    # update 2, insert 3
    b2 = spark.createDataFrame([(2, "B", 2), (3, "c", 2)], "k int, v string, ts int")
    parquet_upsert(spark, b2, target, keys=["k"])
    assert _read(spark, target) == {(1,): ("a", 1), (2,): ("B", 2), (3,): ("c", 2)}

    # idempotency: merge(merge(T, d), d) == merge(T, d)
    parquet_upsert(spark, b2, target, keys=["k"])
    assert _read(spark, target) == {(1,): ("a", 1), (2,): ("B", 2), (3,): ("c", 2)}


def test_parquet_upsert_batch_dedup_keep_last(spark, tmp_path):
    target = os.path.join(str(tmp_path), "t2")
    batch = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2)], "k int, v string, ts int"
    )
    parquet_upsert(spark, batch, target, keys=["k"], order_col="ts")
    assert _read(spark, target) == {(1,): ("new", 2)}


def test_delta_merge_condition_null_safe_and_guarded():
    """Pure merge-condition builder (no jars needed): null-safe equality
    per key, non-empty key list enforced."""
    import pytest as _pytest

    from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import (
        delta_merge_condition,
    )

    assert delta_merge_condition(["a"]) == "t.`a` <=> s.`a`"
    assert (
        delta_merge_condition(["a", "b"])
        == "t.`a` <=> s.`a` AND t.`b` <=> s.`b`"
    )
    with _pytest.raises(ValueError):
        delta_merge_condition([])


def test_delta_upsert_gate_without_jars(spark, tmp_path):
    """Without delta-spark the gated sink must fail loudly with the
    parquet_upsert pointer, never half-write."""
    import pytest as _pytest

    from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import (
        delta_available,
        delta_upsert,
    )

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    if delta_available():
        _pytest.skip("delta-spark present; gate test is for its absence")
    with _pytest.raises(ImportError, match="parquet_upsert"):
        delta_upsert(spark, df, str(tmp_path / "t"), ["k"])


def test_delta_upsert_roundtrip_when_available(spark, tmp_path):
    """Environment-gated end-to-end MERGE (runs wherever the jars exist:
    insert, update-by-key, idempotent retry)."""
    import pytest as _pytest

    _pytest.importorskip("delta")
    from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import delta_upsert

    t = str(tmp_path / "t")
    delta_upsert(spark, spark.createDataFrame([(1, "a")], "k long, v string"), t, ["k"])
    batch = spark.createDataFrame([(1, "a2"), (2, "b")], "k long, v string")
    delta_upsert(spark, batch, t, ["k"])
    delta_upsert(spark, batch, t, ["k"])  # retry is a no-op
    rows = {(r.k, r.v) for r in spark.read.format("delta").load(t).collect()}
    assert rows == {(1, "a2"), (2, "b")}


def test_postgres_on_conflict_roundtrip_when_available():
    """Environment-gated LIVE Postgres round-trip of the generated merge
    SQL (r6 verdict item 6): skipped where psycopg2 or a reachable server
    is absent, so the full S5-S8 path lights up without code changes the
    moment the environment gains them.  DSN via SPARK_GRAFT_PG_DSN
    (defaults to a local socket connection)."""
    import os

    import pytest as _pytest

    psycopg2 = _pytest.importorskip("psycopg2")
    dsn = os.environ.get("SPARK_GRAFT_PG_DSN", "dbname=postgres")
    try:
        conn = psycopg2.connect(dsn, connect_timeout=3)
    except Exception as exc:  # pragma: no cover - environment-dependent
        _pytest.skip(f"no reachable Postgres: {exc}")
    from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import merge_sql

    tbl, stg = "sg_merge_target", "temp_sg_merge_target"
    cols = ["ad_id", "date_start", "spend", "payload"]
    merge, drop, drop_safe = merge_sql(
        tbl, cols, keys=["ad_id", "date_start"], staging_table=stg,
        jsonb_columns=["payload"],
    )
    try:
        with conn, conn.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {tbl}")
            cur.execute(drop_safe)
            cur.execute(
                f"CREATE TABLE {tbl} (ad_id TEXT, date_start TEXT, "
                "spend DOUBLE PRECISION, payload JSONB, "
                "PRIMARY KEY (ad_id, date_start))"
            )
            cur.execute(
                f"CREATE TABLE {stg} (ad_id TEXT, date_start TEXT, "
                "spend DOUBLE PRECISION, payload TEXT)"
            )
            cur.execute(
                f"INSERT INTO {stg} VALUES "
                "('a1','2024-01-01',1.5,'{\"k\": 1}'), "
                "('a2','2024-01-01',2.0,'{\"k\": 2}')"
            )
        with conn, conn.cursor() as cur:
            cur.execute(merge)   # initial insert via staging
            cur.execute(drop)
        with conn, conn.cursor() as cur:  # conflicting second batch
            cur.execute(
                f"CREATE TABLE {stg} (ad_id TEXT, date_start TEXT, "
                "spend DOUBLE PRECISION, payload TEXT)"
            )
            cur.execute(
                f"INSERT INTO {stg} VALUES "
                "('a1','2024-01-01',9.0,'{\"k\": 9}'), "
                "('a3','2024-01-02',3.0,NULL)"
            )
            cur.execute(merge)   # ON CONFLICT DO UPDATE path
            cur.execute(drop)
        with conn, conn.cursor() as cur:
            cur.execute(
                f"SELECT ad_id, spend, payload->>'k' FROM {tbl} ORDER BY ad_id"
            )
            rows = cur.fetchall()
        assert rows == [("a1", 9.0, "9"), ("a2", 2.0, "2"), ("a3", 3.0, None)]
    finally:
        with conn, conn.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {tbl}")
            cur.execute(drop_safe)
        conn.close()
