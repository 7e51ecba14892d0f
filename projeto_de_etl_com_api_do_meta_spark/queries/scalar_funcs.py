"""Scalar function family queries (SURVEY.md §2.5 R4/R5/R6).

One query per family — string, date, math, array, JSON — each exercising the
JVM-side built-ins that replace the reference's row-wise Python lambdas
(extract.py:144-156, transform.py:27-37).  No Python UDFs anywhere: every
expression stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# -- R4/R6: string family -----------------------------------------------------

_ORACLE_STRING = """
SELECT c_custkey AS custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS segment_lower,
       trim(concat('  ', c_name, '  ')) AS name_trimmed,
       substr(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       replace(c_name, '#', '-') AS name_dashed,
       string_split(c_name, '#')[1] AS name_head,
       string_split(c_name, '#')[-1] AS name_tail,
       CAST(contains(c_name, '00') AS BOOLEAN) AS has_double_zero,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
FROM customer
"""


@register(
    "fn_string_family",
    oracle=_ORACLE_STRING,
    tags=("functions",),
    doc=(
        "String family (R4/R6): upper/lower/trim/concat/substr/length/replace/"
        "split/contains/lpad — incl. the reference's prefix-strip & split "
        "patterns (extract.py:50-51,220-221)."
    ),
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    parts = F.split(F.col("c_name"), "#")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        parts.getItem(0).alias("name_head"),
        F.element_at(parts, -1).alias("name_tail"),
        F.col("c_name").contains("00").alias("has_double_zero"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


# -- R3/R5/R6: date family ----------------------------------------------------

_ORACLE_DATE = """
SELECT o_orderkey AS orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
         AS days_since_1995,
       CAST(CAST(o_orderdate AS DATE) + 90 AS DATE) AS due_date,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str
FROM orders
"""


@register(
    "fn_date_family",
    oracle=_ORACLE_DATE,
    tags=("functions",),
    doc=(
        "Date family (R3/R5/R6): year/month/dayofweek/date_trunc/datediff/"
        "date_add/date_format — incl. the reference's '%Y-%m-%d' formatting "
        "(extract.py:45-46) and window arithmetic (extract.py:34-41)."
    ),
)
def fn_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        d.alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_1995"),
        F.date_add(d, 90).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
    )


# -- R6: math family ----------------------------------------------------------

_ORACLE_MATH = """
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_partkey AS partkey,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_rounded,
       CAST(abs(CAST(l_discount AS DECIMAL(18,4)) - 0.05) AS DOUBLE) AS disc_dist,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       sqrt(l_extendedprice) AS price_sqrt,
       CAST(l_partkey % 7 AS BIGINT) AS partkey_mod7,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS qty_sq
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
"""


@register(
    "fn_math_family",
    oracle=_ORACLE_MATH,
    tags=("functions",),
    doc=(
        "Math family (R6): decimal-exact round/abs, ceil/floor, IEEE-exact "
        "sqrt, mod, ln (6dp-rounded: libm may differ by 1 ulp across engines)."
    ),
)
def fn_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    decp = F.col("l_extendedprice").cast("decimal(18,4)")
    decd = F.col("l_discount").cast("decimal(18,4)")
    return li.where((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_partkey").alias("partkey"),
        F.round(decp, 1).cast("double").alias("price_rounded"),
        F.abs(decd - F.lit(0.05).cast("decimal(18,4)")).cast("double").alias("disc_dist"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_partkey") % 7).alias("partkey_mod7"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_quantity").cast("double") * F.col("l_quantity").cast("double")).alias(
            "qty_sq"
        ),
    )


# -- R6: array family (on embeddings) -----------------------------------------

_ORACLE_ARRAY = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       round(list_sum(list_transform(embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)
         AS norm_sq,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
FROM embeddings
"""


@register(
    "fn_array_family",
    oracle=_ORACLE_ARRAY,
    tags=("functions", "array"),
    doc=(
        "Array family (R6): size / element_at / higher-order aggregate "
        "(norm) / filter — all JVM-side, no UDF (SURVEY §2.9)."
    ),
)
def fn_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            6,
        ).alias("norm_sq"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


# -- R6: JSON family (events.props — analog of reference field_data JSONB) ----

_ORACLE_JSON = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
       CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       CAST(json_extract(props, '$.missing') AS VARCHAR) IS NOT NULL AS has_missing
FROM events
"""


@register(
    "fn_json_family",
    oracle=_ORACLE_JSON,
    tags=("functions", "json"),
    doc=(
        "JSON family (R6/S7): get_json_object over the semi-structured props "
        "column — the engine-side analog of the reference's field_data JSONB "
        "handling (load.py:77-91)."
    ),
)
def fn_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )


# -- R6: map family (MapType — SURVEY §1.3 supported-type floor) --------------

#: Computed from the actual JSON keys (NOT hardcoded to a single 'k' key):
#: the r11 sf0.01 events refresh ships props = '{}', where the old
#: constant-folded oracle (1 AS n_keys, 'k' AS first_key, ...) diverged
#: from the real map semantics the Spark side computes.
_ORACLE_MAP = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       CASE WHEN len(json_keys(props)) = 0 THEN NULL
            ELSE list_sort(json_keys(props))[1] END AS first_key,
       list_contains(json_keys(props), 'k') AS has_k,
       CAST(len(json_keys(props)) + 1 AS INTEGER) AS n_after_concat,
       CASE WHEN len(json_keys(props)) = 0 THEN NULL
            ELSE concat(json_keys(props)[1], '=',
                 CAST(CAST(json_extract(props,
                      '$."' || json_keys(props)[1] || '"') AS INTEGER)
                      AS VARCHAR)) END AS kv_pair
FROM events
"""


@register(
    "fn_map_family",
    oracle=_ORACLE_MAP,
    tags=("functions", "map"),
    doc=(
        "Map family (R6): from_json to MapType, map_keys/map_values/"
        "element_at/map_contains_key/map_concat/map_entries + entry "
        "stringification — the MapType floor SURVEY §1.3 requires for the "
        "actions pivot."
    ),
)
def fn_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    ext = F.map_concat(m, F.create_map(F.lit("uid"), F.col("user_id").cast("int")))
    entries = F.map_entries(m)
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_sort(F.map_keys(m)).getItem(0).alias("first_key"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.size(F.map_keys(ext)).alias("n_after_concat"),
        F.concat(
            entries.getItem(0).getField("key"),
            F.lit("="),
            entries.getItem(0).getField("value").cast("string"),
        ).alias("kv_pair"),
    )


# -- R6: conditional / null-handling family -----------------------------------

_ORACLE_COND = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
            THEN TRUE ELSE FALSE END AS is_urgent,
       greatest(CAST(o_totalprice AS DOUBLE), 150000.0) AS floored_price,
       IF(o_custkey % 2 = 0, 'even', 'odd') AS custkey_parity
FROM orders
"""


@register(
    "fn_conditional_family",
    oracle=_ORACLE_COND,
    tags=("functions", "conditional"),
    doc=(
        "Conditional family (R6): CASE/WHEN bands, NULLIF+COALESCE "
        "re-labeling, LIKE predicates, greatest, IF — the expression "
        "vocabulary of the reference's backfill/cleanup steps."
    ),
)
def fn_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        (
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%")
        ).alias("is_urgent"),
        F.greatest(F.col("o_totalprice").cast("double"), F.lit(150000.0)).alias(
            "floored_price"
        ),
        F.when(F.col("o_custkey") % 2 == 0, "even").otherwise("odd").alias(
            "custkey_parity"
        ),
    )


# -- Semi-structured: VariantType JSON (Spark 4) ------------------------------

_ORACLE_VARIANT = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register(
    "fn_variant_json",
    oracle=_ORACLE_VARIANT,
    tags=("functions", "json", "variant"),
    doc=(
        "Semi-structured access via Spark 4 VariantType: parse_json once "
        "into the binary variant encoding, then typed path extraction "
        "(try_variant_get) — the schema-on-read path for the reference's "
        "JSONB field_data (load.py:77-91) that avoids re-parsing the JSON "
        "string per field access. Oracle: DuckDB JSON operators."
    ),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_ORACLE_BITWISE = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 15 AS bor,
       xor(o_orderkey, o_custkey) AS bxor,
       CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INTEGER) AS popcount,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr,
       ~o_orderkey AS bnot
FROM orders
WHERE o_orderkey < 400
ORDER BY o_orderkey
"""


@register(
    "fn_bitwise_family",
    oracle=_ORACLE_BITWISE,
    tags=("functions",),
    doc=(
        "Bitwise scalar family (R6): AND/OR/XOR/NOT, bit_count popcount, "
        "shifts — all codegen'd JVM expressions, no UDFs. The building "
        "blocks the SimHash/bucketing operators use, exposed as a "
        "standalone verified family."
    ),
)
def fn_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 400)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("bor"),
        k.bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.bit_count(k.cast("long")).alias("popcount"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.expr("~o_orderkey").alias("bnot"),
    ).orderBy("o_orderkey")


_ORACLE_LATERAL = """
SELECT doc_id, tok.w AS word, len(tok.w) AS word_len
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents WHERE doc_id < 20) d,
     unnest(d.toks) AS tok(w)
ORDER BY doc_id, word, word_len
"""


@register(
    "fn_lateral_view_explode",
    oracle=_ORACLE_LATERAL,
    tags=("functions", "restructure"),
    doc=(
        "LATERAL VIEW explode in SQL (the HiveQL-heritage row-expansion "
        "form; same plan as DataFrame explode): one row per token with "
        "its source doc — no shuffle, Generate node feeds codegen."
    ),
)
def fn_lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks")) \
        .createOrReplaceTempView("docs_toks_v")
    return spark.sql(
        """
        SELECT doc_id, word, length(word) AS word_len
        FROM docs_toks_v LATERAL VIEW explode(toks) t AS word
        ORDER BY doc_id, word, word_len
        """
    )


_ORACLE_TRY_FAMILY = """
SELECT doc_id,
       TRY_CAST(substr(text, 1, 4) AS BIGINT) AS try_num_prefix,
       TRY_CAST(lang AS BIGINT) AS try_lang_num,
       CAST(n_chars AS DOUBLE) / nullif(doc_id % 5, 0) AS div_nullable,
       COALESCE(TRY_CAST(substr(text, 1, 1) AS BIGINT), -1) AS coerced_first
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


@register(
    "fn_try_family",
    oracle=_ORACLE_TRY_FAMILY,
    tags=("functions", "reference-parity"),
    doc=(
        "try_* coercion family — the engine-native form of the reference's "
        "pandas errors='coerce' contract (reference transform.py:51-61): "
        "try_cast on non-numeric text -> null, guarded division -> null, "
        "coalesce backfill. ANSI-safe by construction: these expressions "
        "return null instead of raising under any session mode."
    ),
)
def fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.substring("text", 1, 4).try_cast("long").alias("try_num_prefix"),
        F.col("lang").try_cast("long").alias("try_lang_num"),
        (
            F.col("n_chars").cast("double")
            / F.nullif((F.col("doc_id") % 5), F.lit(0))
        ).alias("div_nullable"),
        F.coalesce(
            F.substring("text", 1, 1).try_cast("long"), F.lit(-1)
        ).alias("coerced_first"),
    ).orderBy("doc_id")


_ORACLE_CALENDAR = """
SELECT o_orderkey AS orderkey,
       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
FROM orders
WHERE o_orderkey < 500
ORDER BY orderkey
"""


@register(
    "fn_calendar_family",
    oracle=_ORACLE_CALENDAR,
    tags=("functions",),
    doc=(
        "Calendar/interval family (R5 extension): add_months, last_day, "
        "quarter, ISO week, day-of-year, quarter truncation — the "
        "fiscal-calendar toolkit, all codegen'd date arithmetic."
    ),
)
def fn_calendar_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
    ).orderBy("orderkey")


_ORACLE_HASH_FAMILY = """
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       CAST(length(md5(text)) AS INTEGER) AS md5_len
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
"""


@register(
    "fn_hash_family",
    oracle=_ORACLE_HASH_FAMILY,
    tags=("functions", "hash"),
    doc=(
        "Cryptographic hash family (md5 / sha-256) — the cross-engine-"
        "portable hash functions every dedup fingerprint, bucketing split, "
        "and sketch in this engine builds on, verified as a standalone "
        "scalar family."
    ),
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    ).orderBy("doc_id")


_ORACLE_REGEX = r"""
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
       regexp_replace(text, '[aeiou]', '_', 'g') LIKE '%__%' AS has_adj_vowels,
       regexp_matches(text, '^[A-Z]') AS starts_upper,
       CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS INTEGER) AS n_spaces
FROM documents
WHERE doc_id < 150
ORDER BY doc_id
"""


@register(
    "fn_regex_family",
    oracle=_ORACLE_REGEX,
    tags=("functions",),
    doc=(
        "Regex family (R4/R6 extension): group extraction, match counting, "
        "global replacement, anchored rlike, character-class stripping — "
        "all codegen'd pattern work (the cleaning primitives every "
        "text-pipeline stage leans on)."
    ),
)
def fn_regex_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_numbers"),
        F.regexp_replace("text", r"[aeiou]", "_").like("%__%").alias(
            "has_adj_vowels"
        ),
        F.col("text").rlike(r"^[A-Z]").alias("starts_upper"),
        F.length(F.regexp_replace("text", r"[^ ]", "")).alias("n_spaces"),
    ).orderBy("doc_id")
