"""Fixed StructType contracts (SURVEY §1.2-1.3).

The reference infers schemas from whatever the API returned and then repairs
them row-by-row; this engine inverts that: contracts are declared up front
and raw frames are conformed to them explicitly (functions/conform.py).

Raw-side schemas mirror the Meta API frames (FIXTURES.md group A; reference
extract.py:70-82,116-122,177-188): ids are STRINGS (Meta contract — never
parse to int), metrics arrive as numeric-as-string, actions as
array<struct<action_type,value>>.
"""

from __future__ import annotations

from pyspark.sql import types as T

ACTION_ENTRY = T.StructType(
    [
        T.StructField("action_type", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

_INSIGHTS_BASE = [
    T.StructField("ad_id", T.StringType()),
    T.StructField("adset_id", T.StringType()),
    T.StructField("campaign_id", T.StringType()),
    T.StructField("date_start", T.StringType()),
    T.StructField("date_stop", T.StringType()),
    T.StructField("impressions", T.StringType()),
    T.StructField("clicks", T.StringType()),
    T.StructField("spend", T.StringType()),
    T.StructField("actions", T.ArrayType(ACTION_ENTRY)),
    T.StructField("action_values", T.ArrayType(ACTION_ENTRY)),
]

#: raw insights, level='ad', no breakdown (extract.py:177-229)
RAW_INSIGHTS_DAILY = T.StructType(list(_INSIGHTS_BASE))

#: breakdown ['age','gender'] (extract.py:238-240)
RAW_INSIGHTS_DEMO = T.StructType(
    list(_INSIGHTS_BASE)
    + [T.StructField("age", T.StringType()), T.StructField("gender", T.StringType())]
)

#: breakdown ['region'] (extract.py:243-245)
RAW_INSIGHTS_GEO = T.StructType(
    list(_INSIGHTS_BASE) + [T.StructField("region", T.StringType())]
)

ID_NAME = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
)

#: raw ads entity scan (extract.py:106-169)
RAW_ADS = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("adset_id", T.StringType()),
        T.StructField("adset", ID_NAME),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("campaign", ID_NAME),
        T.StructField("effective_status", T.StringType()),
    ]
)

#: raw leadgen leads (extract.py:60-100)
RAW_LEADS = T.StructType(
    [
        T.StructField("lead_id", T.StringType()),
        T.StructField("created_time", T.StringType()),
        T.StructField("ad_id", T.StringType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("adset_id", T.StringType()),
        T.StructField("form_id", T.StringType()),
        T.StructField("field_data", T.StringType()),
        T.StructField("ad_platform_data", T.StringType()),
    ]
)

#: final table contracts (FIXTURES.md A6; transform.py:98,111-117,150-155)
ADS_DIMENSION = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("ad_name", T.StringType()),
        T.StructField("adset_id", T.StringType()),
        T.StructField("adset_name", T.StringType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("campaign_name", T.StringType()),
    ]
)

ADS_CAMPAIGN_PERFORMANCE = T.StructType(
    [
        T.StructField("date_start", T.DateType()),
        T.StructField("ad_id", T.StringType()),
        T.StructField("adset_id", T.StringType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("total_impressions", T.LongType()),
        T.StructField("total_clicks", T.LongType()),
        T.StructField("total_spend", T.DoubleType()),
        T.StructField("total_leads", T.LongType()),
        T.StructField("total_successes", T.LongType()),
        T.StructField("cpc", T.DoubleType()),
        T.StructField("ctr", T.DoubleType()),
        T.StructField("cpl", T.DoubleType()),
    ]
)

#: upsert conflict keys per table (load.py:49-63)
UPSERT_KEYS: dict[str, list[str]] = {
    "ads_dimension": ["ad_id"],
    "ads_campaign_performance": ["date_start", "ad_id"],
    "ads_lead_insights": ["date_start", "ad_id", "age", "gender", "region"],
    "ads_raw_leads": ["lead_id"],
}

#: columns cast to JSONB at the DB boundary (load.py:77-91)
JSONB_COLUMNS: dict[str, list[str]] = {"ads_raw_leads": ["field_data", "ad_platform_data"]}
