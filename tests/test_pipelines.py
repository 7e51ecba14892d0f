"""Reference-parity pipeline semantics over the fake REST transport
(SURVEY §3 entry points; golden invariants from FIXTURES.md A6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.plans.pipelines import (
    run_campaign_performance,
    run_dimension,
    run_lead_insights,
)
from projeto_de_etl_com_api_do_meta_spark.sources.meta_rest import (
    FakeMetaTransport,
    MetaRestSource,
)


@pytest.fixture(scope="module")
def source(spark):
    return MetaRestSource(spark, FakeMetaTransport())


def test_dimension_schema_and_dedup(source):
    dim = run_dimension(source)
    assert dim.columns == [
        "ad_id", "ad_name", "adset_id", "adset_name", "campaign_id", "campaign_name",
    ]
    # keep-last: every ad_id unique, and duplicated ids keep the LATER name
    assert dim.count() == dim.select("ad_id").distinct().count()
    dup = dim.where(F.col("ad_id") == f"12{0:013d}").first()
    assert dup.ad_name == "Ad 0 v1"  # arrival index 60 beats index 0


def test_dimension_status_filter_pushdown(source):
    # ARCHIVED/DELETED ads filtered at the source (extract.py:125-128)
    raw = source.read_ads(statuses=("ACTIVE",))
    statuses = {r.effective_status for r in raw.select("effective_status").collect()}
    assert statuses <= {"ACTIVE"}


def test_dimension_null_struct_flatten(source):
    dim = run_dimension(source)
    # null adset/campaign structs -> null names, never an error
    assert dim.where(F.col("adset_name").isNull()).count() >= 0


def test_performance_grain_and_metrics(source):
    perf = run_campaign_performance(source)
    assert perf.columns == [
        "date_start", "ad_id", "adset_id", "campaign_id",
        "total_impressions", "total_clicks", "total_spend", "total_leads",
        "total_successes", "cpc", "ctr", "cpl",
    ]
    keys = ["date_start", "ad_id", "adset_id", "campaign_id"]
    assert perf.count() == perf.select(*keys).distinct().count()
    # safe ratios: never null/inf, 0-denominator -> 0
    bad = perf.where(
        F.col("cpc").isNull()
        | F.isnan("cpc")
        | ((F.col("total_clicks") == 0) & (F.col("cpc") != 0.0))
    )
    assert bad.count() == 0
    assert dict(perf.dtypes)["date_start"] == "date"
    assert dict(perf.dtypes)["total_impressions"] == "bigint"
    # total_successes placeholder is constant 0 (transform.py:78-79)
    assert perf.agg(F.max("total_successes")).first()[0] == 0


def test_performance_first_nonnull_grain_dedup(source):
    """Duplicate (date, ad) rows with nulled metrics collapse to the first
    non-null value per column (pandas groupby().first() parity)."""
    raw = source.read_insights(())
    n_raw_keys = raw.select("date_start", "ad_id", "adset_id", "campaign_id").distinct().count()
    perf = run_campaign_performance(source)
    assert perf.count() == n_raw_keys


def test_leads_fanout_and_zero_fill(source):
    leads = run_lead_insights(source)
    head = ["date_start", "ad_id", "adset_id", "campaign_id", "age", "gender",
            "region", "total_spend", "total_leads"]
    assert leads.columns[: len(head)] == head
    # fan-out: demo rows replicate per region => more rows than demo grain
    demo_rows = source.read_insights(("age", "gender")).count()
    assert leads.count() > demo_rows * 0.5  # demo-only keys may collapse
    # pandas fillna(0) quirk: unmatched string dims carry literal '0'
    zeros = leads.where((F.col("age") == "0") | (F.col("region") == "0"))
    assert zeros.count() > 0
    # numeric 0-fill on unmatched side
    assert leads.where(F.col("total_spend").isNull()).count() == 0


def test_leads_whitelist_projection(source):
    leads = run_lead_insights(source)
    # 'lead' was renamed total_leads; no raw whitelist name may survive
    assert "lead" not in leads.columns
    # non-whitelisted action types never appear
    assert "not_whitelisted_action" not in leads.columns
    assert "another_ignored_type" not in leads.columns


def test_correlated_leads_scan(source):
    raw = source.read_leads()
    assert raw.count() > 0
    assert raw.select("form_id").distinct().count() == 5
    # time-range pushdown reaches the per-form inner scan
    windowed = source.read_leads(
        time_range={"since": "2024-03-01", "until": "2024-03-03"}
    )
    dates = [r[0][:10] for r in windowed.select("created_time").collect()]
    assert dates and all("2024-03-01" <= d <= "2024-03-03" for d in dates)
