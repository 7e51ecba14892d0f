"""Round-11 analytics batch: retrieval eval/scoring, lexical richness,
data-vault modeling, bit-packed integer codec.

* ``retrieval_map_eval`` — mean-average-precision@10 over the pinned
  eval queries; every AP term is the EXACT integer (1e9*cum_rel)//r, so
  the per-query sum is order-free BIGINT arithmetic.
* ``retrieval_lm_dirichlet`` — Dirichlet-smoothed query-likelihood
  retrieval (mu=2000) in integer micro-units via the posting-only
  decomposition, the language-modeling alternative to BM25.
* ``corpus_yule_k_richness`` — Yule's K, Simpson's D, Guiraud's R and
  Honore's H lexical-richness battery per source from the exact term-
  frequency spectrum.
* ``warehouse_data_vault_build`` — Data Vault 2.0 hub/link/satellite
  construction over customer/orders with md5 hash keys and hashdiffs
  (both engines' md5 agree byte-for-byte on the same key strings).
* ``io_bitpack_roundtrip`` — 6-bit fixed-width bit-packing of per-doc
  word-length sequences through Arrow-batched pandas UDFs, with an
  ANALYTIC packed-length oracle (4-byte header + ceil(6n/8)).

Determinism contract: integer fixed point end-to-end; floats only as a
single final rounded expression per column (identical text in both
engines) or floored to integer micro-units per term before any
cross-row sum.  Scale: broadcast query sides, posting-pruned explodes,
dimension-sized vault aggregates, map-only codecs — raw rows never
funnel through one partition.  Reference scope: [EXT] SURVEY §6; the
reference has no retrieval/corpus/vault layer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register
from .retrieval_extra import (
    _EVAL_K,
    _EVAL_SCORED_SQL,
    _retrieval_scored,
)

# ---------------------------------------------------------------------------
# Mean average precision
# ---------------------------------------------------------------------------

_ORACLE_MAP = f"""
WITH {_EVAL_SCORED_SQL},
topk AS (
  SELECT qid, qlabel, dlabel, r FROM ranked WHERE r <= {_EVAL_K}
),
rel AS (
  SELECT qid, r,
         CASE WHEN dlabel = qlabel THEN 1 ELSE 0 END AS is_rel,
         SUM(CASE WHEN dlabel = qlabel THEN 1 ELSE 0 END)
           OVER (PARTITION BY qid ORDER BY r ROWS UNBOUNDED PRECEDING)
           AS cum_rel
  FROM topk
),
terms AS (
  SELECT qid,
         CAST(SUM(CASE WHEN is_rel = 1
                       THEN (1000000000 * cum_rel) // r ELSE 0 END)
              AS BIGINT) AS ap_e9,
         CAST(SUM(is_rel) AS BIGINT) AS n_rel_topk
  FROM rel GROUP BY qid
)
SELECT q.qid AS query_id,
       CAST(COALESCE(t.n_rel_topk, 0) AS BIGINT) AS n_rel_topk,
       CAST((SELECT COUNT(*) FROM embeddings e
             WHERE e.label = q.qlabel AND e.vec_id <> q.qid) AS BIGINT)
         AS n_rel_total,
       CAST(COALESCE(t.ap_e9, 0) AS BIGINT) AS ap_e9,
       round(CASE WHEN (SELECT COUNT(*) FROM embeddings e
                        WHERE e.label = q.qlabel AND e.vec_id <> q.qid) = 0
                  THEN 0.0
                  ELSE CAST(COALESCE(t.ap_e9, 0) AS DOUBLE) / 1000000000.0
                       / LEAST({_EVAL_K},
                               (SELECT COUNT(*) FROM embeddings e
                                WHERE e.label = q.qlabel
                                  AND e.vec_id <> q.qid)) END,
             6) AS avg_precision
FROM q LEFT JOIN terms t ON t.qid = q.qid
ORDER BY query_id
"""


@register(
    "retrieval_map_eval",
    oracle=_ORACLE_MAP,
    tags=("retrieval", "eval"),
    doc=(
        f"Average precision @{_EVAL_K} per pinned eval query (the same 5 "
        "query vectors and 6dp-cosine ranking as the NDCG/MRR/recall/ERR "
        "evals): each relevant hit contributes the EXACT integer "
        "(1e9 * cum_rel) // r — integer floor division in both engines, "
        "so the AP sum is order-free BIGINT arithmetic — normalized by "
        "min(K, R) relevant candidates, the standard MAP@K denominator.  "
        "The area-under-PR-curve member that completes the repo's "
        "ranking-eval battery.  Plan: broadcast query side, per-query "
        "top-k window over the depth-bounded set."
    ),
)
def retrieval_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    scored = _retrieval_scored(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("did"))
    ranked = scored.select(
        "qid", "qlabel", "dlabel", F.row_number().over(w).alias("r")
    ).where(F.col("r") <= _EVAL_K)
    is_rel = F.when(F.col("dlabel") == F.col("qlabel"), 1).otherwise(0)
    wc = Window.partitionBy("qid").orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rel = ranked.select(
        "qid", "r", is_rel.alias("is_rel"), F.sum(is_rel).over(wc).alias("cum_rel")
    )
    terms = rel.groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("is_rel") == 1, F.expr("(1000000000 * cum_rel) div r")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ap_e9"),
        F.sum("is_rel").cast("bigint").alias("n_rel_topk"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qs = scored.select("qid", "qlabel").distinct()
    r_tot = (
        qs.join(
            emb.select(F.col("label").alias("qlabel"), F.col("vec_id").alias("did")),
            "qlabel",
        )
        .where(F.col("did") != F.col("qid"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel_total"))
    )
    out = (
        qs.select("qid")
        .join(terms, "qid", "left")
        .join(r_tot, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce("n_rel_topk", F.lit(0)).cast("bigint").alias("n_rel_topk"),
            F.coalesce("n_rel_total", F.lit(0)).cast("bigint").alias("n_rel_total"),
            F.coalesce("ap_e9", F.lit(0)).cast("bigint").alias("ap_e9"),
        )
    )
    ap = F.when(F.col("n_rel_total") == 0, F.lit(0.0)).otherwise(
        F.col("ap_e9").cast("double")
        / 1000000000.0
        / F.least(F.lit(_EVAL_K), F.col("n_rel_total"))
    )
    return out.select(
        "query_id",
        "n_rel_topk",
        "n_rel_total",
        "ap_e9",
        F.round(ap, 6).alias("avg_precision"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query-likelihood retrieval
# ---------------------------------------------------------------------------

_LMD_TERMS = ("window", "merge", "stream")
_LMD_MU = 2000
_LMD_TOPK = 10
_LMD_TERMS_SQL = ", ".join(f"'{t}'" for t in _LMD_TERMS)

#: Posting-only decomposition of the Dirichlet query likelihood:
#: score = sum over matched terms of ln(1 + tf*|C|/(mu*cf)) + |q|*ln(mu/(dl+mu)),
#: each part floored to integer micro-units (identical text both engines).
_LMD_TERM_MICRO = (
    "CAST(floor(1000000.0 * ln(1.0 + CAST(tf AS DOUBLE) * ctot"
    f" / ({_LMD_MU}.0 * cf))) AS BIGINT)"
)
_LMD_PRIOR_MICRO = (
    f"CAST(floor(1000000.0 * {len(_LMD_TERMS)}.0"
    f" * ln({_LMD_MU}.0 / (dl + {_LMD_MU}.0))) AS BIGINT)"
)

_ORACLE_LMD = rf"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM docs),
ctot AS (SELECT CAST(SUM(dl) AS BIGINT) AS ctot FROM lens),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({_LMD_TERMS_SQL})
  GROUP BY 1, 2
),
cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
matched AS (
  SELECT tf.doc_id,
         CAST(SUM({_LMD_TERM_MICRO}) AS BIGINT) AS match_micro,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM tf JOIN cf USING (term) CROSS JOIN ctot
  GROUP BY tf.doc_id
)
SELECT m.doc_id, m.n_terms,
       CAST(m.match_micro + {_LMD_PRIOR_MICRO} AS BIGINT) AS lmd_micro
FROM matched m JOIN lens USING (doc_id)
ORDER BY lmd_micro DESC, doc_id
LIMIT {_LMD_TOPK}
"""


@register(
    "retrieval_lm_dirichlet",
    oracle=_ORACLE_LMD,
    tags=("retrieval", "text", "corpus"),
    doc=(
        f"Dirichlet-smoothed query-likelihood retrieval (mu={_LMD_MU}) "
        "top-10 for the same 3-term query as corpus_bm25_search, via the "
        "posting-only decomposition score = sum over MATCHED terms of "
        "ln(1 + tf |C| / (mu cf)) + |q| ln(mu / (dl + mu)) — only docs "
        "containing a query term are scored, so the corpus-wide work is "
        "one length scan + the term-filtered explode, exactly BM25's "
        "plan.  Every part floors to integer micro-units before the "
        "per-doc sum, making the cross-engine total exact BIGINT math; "
        "collection stats (|C|, cf) are 1-row/|q|-row broadcasts.  The "
        "language-modeling retrieval family member beside BM25 (tf "
        "saturation) and TF-IDF (raw weighting)."
    ),
)
def retrieval_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    lens = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    ctot = lens.agg(F.sum("dl").cast("bigint").alias("ctot"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(list(_LMD_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("cf"))
    matched = (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(ctot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(_LMD_TERM_MICRO)).cast("bigint").alias("match_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
    )
    return (
        matched.join(lens, "doc_id")
        .select(
            "doc_id",
            "n_terms",
            (F.col("match_micro") + F.expr(_LMD_PRIOR_MICRO))
            .cast("bigint")
            .alias("lmd_micro"),
        )
        .orderBy(F.col("lmd_micro").desc(), "doc_id")
        .limit(_LMD_TOPK)
    )


# ---------------------------------------------------------------------------
# Lexical richness battery
# ---------------------------------------------------------------------------

_ORACLE_YULE = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS m
  FROM tok GROUP BY source, term
),
spec AS (
  SELECT source,
         CAST(SUM(m) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1_hapax,
         CAST(SUM(m * m) AS BIGINT) AS sm2
  FROM tf GROUP BY source
)
SELECT source, n_tokens, n_types, v1_hapax, sm2,
       round(CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE 10000.0 * (sm2 - n_tokens)
                       / (CAST(n_tokens AS DOUBLE) * n_tokens) END,
             6) AS yule_k,
       round(CASE WHEN n_tokens <= 1 THEN 0.0
                  ELSE CAST(sm2 - n_tokens AS DOUBLE)
                       / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)) END,
             6) AS simpson_d,
       round(CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE n_types / sqrt(CAST(n_tokens AS DOUBLE)) END,
             6) AS guiraud_r,
       round(CASE WHEN n_tokens <= 1 OR v1_hapax = n_types THEN 0.0
                  ELSE 100.0 * ln(CAST(n_tokens AS DOUBLE))
                       / (1.0 - CAST(v1_hapax AS DOUBLE) / n_types) END,
             6) AS honore_h
FROM spec
"""


@register(
    "corpus_yule_k_richness",
    oracle=_ORACLE_YULE,
    tags=("corpus", "text"),
    doc=(
        "Lexical-richness battery per source from the exact term-"
        "frequency spectrum: Yule's K = 1e4 (sum m^2 V(m) - N)/N^2 and "
        "Simpson's D = (sum m(m-1) V(m))/(N(N-1)) both collapse to the "
        "BIGINT pair (sum tf^2, N) because sum over the spectrum of "
        "m^2 V(m) IS sum over terms of tf^2; Guiraud's R = V/sqrt(N) "
        "and Honore's H = 100 ln N / (1 - V1/V) (hapax-driven, all-"
        "hapax guarded to 0) each one final float.  The size-robust "
        "vocabulary-diversity quadrant beside MTLD (sequential) and "
        "Heaps (growth-curve): repeated-draw probability, not type "
        "count.  Two grouped integer aggregates, map-side combinable."
    ),
)
def corpus_yule_k_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    spec = tf.groupBy("source").agg(
        F.sum("m").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("v1_hapax"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sm2"),
    )
    n = F.col("n_tokens")
    yule = F.when(n == 0, F.lit(0.0)).otherwise(
        10000.0 * (F.col("sm2") - n) / (n.cast("double") * n)
    )
    simpson = F.when(n <= 1, F.lit(0.0)).otherwise(
        (F.col("sm2") - n).cast("double") / (n.cast("double") * (n - 1))
    )
    guiraud = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("n_types") / F.sqrt(n.cast("double"))
    )
    honore = F.when(
        (n <= 1) | (F.col("v1_hapax") == F.col("n_types")), F.lit(0.0)
    ).otherwise(
        100.0
        * F.log(n.cast("double"))
        / (1.0 - F.col("v1_hapax").cast("double") / F.col("n_types"))
    )
    return spec.select(
        "source",
        "n_tokens",
        "n_types",
        "v1_hapax",
        "sm2",
        F.round(yule, 6).alias("yule_k"),
        F.round(simpson, 6).alias("simpson_d"),
        F.round(guiraud, 6).alias("guiraud_r"),
        F.round(honore, 6).alias("honore_h"),
    )


# ---------------------------------------------------------------------------
# Data Vault 2.0 build
# ---------------------------------------------------------------------------

_ORACLE_VAULT = """
WITH hub_customer AS (
  SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer
),
hub_order AS (
  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders
),
link_co AS (
  SELECT md5(CAST(o_custkey AS VARCHAR) || '|'
             || CAST(o_orderkey AS VARCHAR)) AS hk
  FROM orders
),
sat_order AS (
  SELECT md5(o_orderstatus || '|'
             || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             || '|' || CAST(o_orderdate AS VARCHAR)) AS hk
  FROM orders
),
u AS (
  SELECT 'hub_customer' AS entity, hk FROM hub_customer
  UNION ALL SELECT 'hub_order', hk FROM hub_order
  UNION ALL SELECT 'link_customer_order', hk FROM link_co
  UNION ALL SELECT 'sat_order_hashdiff', hk FROM sat_order
)
SELECT entity,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT hk) AS BIGINT) AS n_distinct_hk,
       MIN(hk) AS min_hk, MAX(hk) AS max_hk
FROM u GROUP BY entity
"""


@register(
    "warehouse_data_vault_build",
    oracle=_ORACLE_VAULT,
    tags=("warehouse",),
    doc=(
        "Data Vault 2.0 construction over customer/orders: hub hash "
        "keys are md5 of the business key rendered as text, the "
        "customer-order link key is md5 of the '|'-joined key pair, and "
        "the order satellite's hashdiff is md5 over (status, exact "
        "CENTS total, orderdate) — the float column crosses into the "
        "hash as its exact BIGINT cents rendering, never a float-to-"
        "string formatting (which the two engines would disagree on).  "
        "Per-entity row/distinct-key counts plus min/max key pin the "
        "full key population cross-engine (both md5s agree byte-for-"
        "byte).  The insert-only raw-vault modeling layer upstream of "
        "the repo's Kimball marts; map-only hashing + one grouped "
        "aggregate per entity."
    ),
)
def warehouse_data_vault_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    hub_customer = cust.select(
        F.lit("hub_customer").alias("entity"),
        F.md5(F.col("c_custkey").cast("string").cast("binary")).alias("hk"),
    )
    hub_order = orders.select(
        F.lit("hub_order").alias("entity"),
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias("hk"),
    )
    link_co = orders.select(
        F.lit("link_customer_order").alias("entity"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.col("o_orderkey").cast("string"),
            ).cast("binary")
        ).alias("hk"),
    )
    sat_order = orders.select(
        F.lit("sat_order_hashdiff").alias("entity"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
                F.col("o_orderdate").cast("string"),
            ).cast("binary")
        ).alias("hk"),
    )
    u = hub_customer.unionAll(hub_order).unionAll(link_co).unionAll(sat_order)
    return u.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("hk").cast("bigint").alias("n_distinct_hk"),
        F.min("hk").alias("min_hk"),
        F.max("hk").alias("max_hk"),
    )


# ---------------------------------------------------------------------------
# 6-bit fixed-width bit-packing codec
# ---------------------------------------------------------------------------

_BITPACK_WIDTH = 6
_BITPACK_MAX = (1 << _BITPACK_WIDTH) - 1


def bitpack_encode(values: list[int]) -> bytes:
    """Pack values (clamped to 0..63) at 6 bits each, LSB-first, after a
    4-byte little-endian count header — the parquet-style PLAIN bit-packed
    layout for a fixed width."""
    n = len(values)
    out = bytearray(n.to_bytes(4, "little"))
    acc = 0
    nbits = 0
    for v in values:
        v = min(max(int(v), 0), _BITPACK_MAX)
        acc |= v << nbits
        nbits += _BITPACK_WIDTH
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def bitpack_decode(buf: bytes) -> list[int]:
    n = int.from_bytes(buf[:4], "little")
    out: list[int] = []
    acc = 0
    nbits = 0
    i = 4
    while len(out) < n:
        if nbits < _BITPACK_WIDTH:
            acc |= buf[i] << nbits
            nbits += 8
            i += 1
            continue
        out.append(acc & _BITPACK_MAX)
        acc >>= _BITPACK_WIDTH
        nbits -= _BITPACK_WIDTH
    return out


_ORACLE_BITPACK = r"""
WITH words AS (
  SELECT source, doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_words
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(4 + (6 * n_words + 7) // 8) AS BIGINT)
         AS total_packed_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
FROM words GROUP BY source
"""


@register(
    "io_bitpack_roundtrip",
    oracle=_ORACLE_BITPACK,
    tags=("io", "codec"),
    doc=(
        "Fixed-width bit-packing round-trip (the parquet PLAIN "
        "bit-packed layout at width 6) over each document's word-length "
        "sequence, through real executor-side binary in Arrow-batched "
        "pandas UDFs: lengths clamp to 0..63, pack LSB-first behind a "
        "4-byte little-endian count header, and the oracle recomputes "
        "the packed size ANALYTICALLY as 4 + ceil(6n/8) while the "
        "engine asserts every document decodes back to its exact "
        "(clamped) sequence — a wrong shift direction or header width "
        "breaks one of the two columns.  The sub-byte quadrant of the "
        "codec family (varint is byte-aligned, PackBits is RLE); "
        "map-only + one grouped aggregate."
    ),
)
def io_bitpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")

    @F.pandas_udf("binary")
    def enc(lens):
        return lens.map(bitpack_encode)

    @F.pandas_udf("boolean")
    def ok(buf, lens):
        return pd.Series(
            [
                bitpack_decode(b)
                == [min(max(int(v), 0), _BITPACK_MAX) for v in ls]
                for b, ls in zip(buf, lens)
            ],
            dtype="bool",
        )

    lens = docs.select(
        "source",
        F.expr(
            r"transform(split(trim(text), '\\s+'), w -> length(w))"
        ).alias("lens"),
    )
    coded = lens.select(
        "source",
        F.size("lens").cast("bigint").alias("n_words"),
        enc("lens").alias("buf"),
        "lens",
    )
    back = coded.select(
        "source",
        "n_words",
        F.octet_length("buf").cast("bigint").alias("packed_len"),
        ok("buf", "lens").alias("ok"),
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("packed_len").cast("bigint").alias("total_packed_bytes"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip_ok"),
    )
