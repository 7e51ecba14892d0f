"""Round-10e batch: categorical-trend / stratified-association / text
normalization / RLE codec.

* ``ml_cochran_armitage_trend`` — trend-in-proportions test across
  ordered groups with integer dose scores; every moment an exact BIGINT.
* ``ml_mantel_haenszel_or`` — common odds ratio across day strata with
  per-stratum rationals e9-fixed before the cross-stratum sums.
* ``corpus_s_stemmer_tokens`` — the classic three-rule S-removal stemmer
  (Harman 1991) as pure SQL CASE logic, identical text in both engines.
* ``io_packbits_roundtrip`` — Apple PackBits RLE codec through real
  executor-side binary, with the oracle recomputing the encoded length
  ANALYTICALLY from the run structure of each document (runs >= 3
  become repeat packets, shorter runs merge into literal stretches).

Reference scope: [EXT] SURVEY §6 analytics/codec surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Cochran-Armitage trend test
# ---------------------------------------------------------------------------

_ORACLE_COCHRAN_ARMITAGE = """
WITH x AS (
  -- ordered dose groups: value tercile-ish integer buckets 0/1/2 by
  -- fixed cent cutoffs; outcome = the event is a purchase
  SELECT CASE WHEN round(value * 100) < 10000 THEN 0
              WHEN round(value * 100) < 30000 THEN 1 ELSE 2 END AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS d
  FROM x GROUP BY s
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(d) AS BIGINT) AS dd,
         CAST(SUM(s * d) AS BIGINT) AS sd,
         CAST(SUM(s * n) AS BIGINT) AS sn,
         CAST(SUM(s * s * n) AS BIGINT) AS ssn
  FROM g
)
SELECT nn AS n_total, dd AS n_events, sd AS sum_s_events, sn AS sum_s_n,
       ssn AS sum_s2_n,
       CAST(nn * sd - dd * sn AS BIGINT) AS trend_num,
       round(CASE WHEN dd = 0 OR dd = nn
                       OR CAST(nn AS DOUBLE) * ssn
                          - CAST(sn AS DOUBLE) * sn <= 0 THEN 0.0
                  ELSE CAST(nn * sd - dd * sn AS DOUBLE)
                       / sqrt(CAST(dd AS DOUBLE) * (nn - dd)
                              * (CAST(nn AS DOUBLE) * ssn
                                 - CAST(sn AS DOUBLE) * sn) / nn) END,
             6) AS z_stat
FROM tot
"""


@register(
    "ml_cochran_armitage_trend",
    oracle=_ORACLE_COCHRAN_ARMITAGE,
    tags=("ml", "stats"),
    doc=(
        "Cochran-Armitage trend-in-proportions test: does purchase "
        "probability rise with the value bucket (integer dose scores "
        "0/1/2 at fixed cent cutoffs)?  Z = (N sum(s d) - D sum(s n)) / "
        "sqrt(D(N-D)(N sum(s^2 n) - sum(s n)^2)/N) with every moment an "
        "exact BIGINT from ONE grouped aggregate and the z the single "
        "final float — the ordered-categories sibling of the chi-square "
        "independence test (which ignores order).  Map-side combinable."
    ),
)
def ml_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100)
    x = ev.where(F.col("value").isNotNull()).select(
        F.when(cents < 10000, 0).when(cents < 30000, 1).otherwise(2).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = x.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("d"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("d").cast("bigint").alias("dd"),
        F.sum(F.col("s") * F.col("d")).cast("bigint").alias("sd"),
        F.sum(F.col("s") * F.col("n")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast("bigint").alias("ssn"),
    )
    num = (F.col("nn") * F.col("sd") - F.col("dd") * F.col("sn")).cast("bigint")
    var_term = (
        F.col("nn").cast("double") * F.col("ssn")
        - F.col("sn").cast("double") * F.col("sn")
    )
    z = F.when(
        (F.col("dd") == 0) | (F.col("dd") == F.col("nn")) | (var_term <= 0),
        F.lit(0.0),
    ).otherwise(
        num.cast("double")
        / F.sqrt(
            F.col("dd").cast("double")
            * (F.col("nn") - F.col("dd"))
            * var_term
            / F.col("nn")
        )
    )
    return tot.select(
        F.col("nn").alias("n_total"),
        F.col("dd").alias("n_events"),
        F.col("sd").alias("sum_s_events"),
        F.col("sn").alias("sum_s_n"),
        F.col("ssn").alias("sum_s2_n"),
        num.alias("trend_num"),
        F.round(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel common odds ratio across day strata
# ---------------------------------------------------------------------------

_ORACLE_MANTEL_HAENSZEL = """
WITH x AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN round(value * 100) >= 20000 THEN 1 ELSE 0 END AS e
  FROM events WHERE value IS NOT NULL
),
cells AS (
  SELECT day,
         CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM x GROUP BY day
),
terms AS (
  SELECT day, a, b, c, d, a + b + c + d AS n,
         CAST(round(CAST(a AS DOUBLE) * d * 1000000000.0 / (a + b + c + d))
              AS BIGINT) AS ad_e9,
         CAST(round(CAST(b AS DOUBLE) * c * 1000000000.0 / (a + b + c + d))
              AS BIGINT) AS bc_e9
  FROM cells WHERE a + b + c + d > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       CAST(SUM(a) AS BIGINT) AS total_exposed_events,
       CAST(SUM(ad_e9) AS BIGINT) AS sum_ad_e9,
       CAST(SUM(bc_e9) AS BIGINT) AS sum_bc_e9,
       round(CASE WHEN SUM(bc_e9) = 0 THEN 0.0
                  ELSE CAST(SUM(ad_e9) AS DOUBLE) / SUM(bc_e9) END,
             6) AS mh_odds_ratio
FROM terms
"""


@register(
    "ml_mantel_haenszel_or",
    oracle=_ORACLE_MANTEL_HAENSZEL,
    tags=("ml", "stats"),
    doc=(
        "Mantel-Haenszel common odds ratio for (high-value exposure -> "
        "purchase) stratified by day — the confounder-adjusted "
        "association the pooled 2x2 table gets wrong (Simpson's "
        "paradox guard): each stratum's a*d/n and b*c/n rationals are "
        "e9-FIXED before the cross-stratum sums, so accumulation order "
        "is irrelevant, and OR_MH = sum(ad/n)/sum(bc/n) is the single "
        "final float.  One grouped 2x2 aggregate per day stratum; "
        "calendar-bounded state."
    ),
)
def ml_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.round(F.col("value") * 100) >= 20000, 1).otherwise(0).alias("e"),
    )
    cells = x.groupBy("day").agg(
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("e") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("e") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.where(n > 0).select(
        "a",
        F.round(F.col("a").cast("double") * F.col("d") * 1000000000.0 / n)
        .cast("bigint")
        .alias("ad_e9"),
        F.round(F.col("b").cast("double") * F.col("c") * 1000000000.0 / n)
        .cast("bigint")
        .alias("bc_e9"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("total_exposed_events"),
        F.sum("ad_e9").cast("bigint").alias("sum_ad_e9"),
        F.sum("bc_e9").cast("bigint").alias("sum_bc_e9"),
        F.round(
            F.when(F.sum("bc_e9") == 0, F.lit(0.0)).otherwise(
                F.sum("ad_e9").cast("double") / F.sum("bc_e9")
            ),
            6,
        ).alias("mh_odds_ratio"),
    )


# ---------------------------------------------------------------------------
# S-removal stemmer (Harman 1991)
# ---------------------------------------------------------------------------

#: The three ordered rules of the S stemmer, as one CASE expression whose
#: text is shared verbatim by both engines.  Harman semantics: the FIRST
#: rule whose suffix matches decides; hitting its exception list leaves
#: the word unchanged (no fall-through to later rules):
#:   1. -ies -> -y   (unless -eies / -aies)
#:   2. -es  -> -e   (unless -aes / -ees / -oes)
#:   3. -s   -> ''   (unless -us / -ss)
_S_STEM_SQL = """
CASE
  WHEN w LIKE '%ies' THEN
    CASE WHEN w NOT LIKE '%eies' AND w NOT LIKE '%aies'
         THEN substr(w, 1, length(w) - 3) || 'y' ELSE w END
  WHEN w LIKE '%es' THEN
    CASE WHEN w NOT LIKE '%aes' AND w NOT LIKE '%ees' AND w NOT LIKE '%oes'
         THEN substr(w, 1, length(w) - 1) ELSE w END
  WHEN w LIKE '%s' THEN
    CASE WHEN w NOT LIKE '%us' AND w NOT LIKE '%ss' AND length(w) > 1
         THEN substr(w, 1, length(w) - 1) ELSE w END
  ELSE w
END
"""

_ORACLE_S_STEMMER = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
ok AS (SELECT w FROM w WHERE regexp_matches(w, '^[a-z]+$')),
stemmed AS (SELECT w, {_S_STEM_SQL} AS stem FROM ok)
SELECT stem,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_surface_forms,
       CAST(SUM(CASE WHEN w <> stem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM stemmed GROUP BY stem
"""


@register(
    "corpus_s_stemmer_tokens",
    oracle=_ORACLE_S_STEMMER,
    tags=("corpus", "text"),
    doc=(
        "Harman's S-removal stemmer (the three ordered -ies/-es/-s "
        "rules with their exception lists) as ONE CASE expression whose "
        "text is shared verbatim by both engines — the lightweight "
        "conflation step retrieval pipelines run before indexing when a "
        "full Porter stemmer is overkill.  Groups the corpus by stem "
        "with surface-form and changed-token counts; one token explode "
        "+ one grouped aggregate, all codegen."
    ),
)
def corpus_s_stemmer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w").rlike("^[a-z]+$")
    )
    stemmed = w.select("w", F.expr(_S_STEM_SQL).alias("stem"))
    return stemmed.groupBy("stem").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("w").cast("bigint").alias("n_surface_forms"),
        F.sum(F.when(F.col("w") != F.col("stem"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
    )


# ---------------------------------------------------------------------------
# PackBits RLE codec round-trip
# ---------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits with a PINNED encoder policy so the length is
    analytically recomputable: every maximal run of length >= 3 becomes
    ceil(len/128) repeat packets (2 bytes each, even short tail chunks);
    runs of length < 3 merge into literal stretches, emitted as
    max-128-byte literal packets (1 + len bytes each)."""
    out = bytearray()
    n = len(data)
    i = 0
    lit_start = -1

    def flush_literals(end: int) -> None:
        nonlocal lit_start
        if lit_start < 0:
            return
        j = lit_start
        while j < end:
            chunk = data[j : min(j + 128, end)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += len(chunk)
        lit_start = -1

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            k = i
            while k < i + run:
                left = i + run - k
                chunk = 128 if left >= 128 else left
                if left - chunk == 1:
                    # a repeat header encodes runs of 2..128, so never
                    # leave a 1-byte tail: shrink this chunk by one (the
                    # packet COUNT is unchanged, keeping the oracle's
                    # 2*ceil(len/128) formula exact)
                    chunk -= 1
                out.append(257 - chunk)  # two's complement 1 - chunk
                out.append(data[i])
                k += chunk
        else:
            if lit_start < 0:
                lit_start = i
        i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(buf: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(buf):
        h = buf[i]
        i += 1
        if h < 128:  # literal of h+1 bytes
            out.extend(buf[i : i + h + 1])
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out.extend(buf[i : i + 1] * (257 - h))
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _packbits_len_sql() -> str:
    """Analytic PackBits length per document, from the run structure:
    repeat_bytes = sum over runs>=3 of 2*ceil(len/128); literal stretches
    (maximal groups of consecutive runs<3) cost len + ceil(len/128)."""
    return """
WITH chars AS (
  -- byte i of the UTF-8 encoding as its 2-char hex slice: the encoder is
  -- a BYTE codec, and substr(text, i) would index CHARACTERS over a
  -- byte-length range (ADVICE r10: phantom ''-runs on non-ASCII docs);
  -- hex(encode()) is pure ASCII, so char indexing == byte indexing.
  SELECT doc_id, i,
         substr(hex(encode(text)), CAST(2 * i - 1 AS INTEGER), 2) AS ch
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
                  1, CAST(octet_length(encode(text)) AS BIGINT))) AS i)
),
marks AS (
  SELECT doc_id, i, ch,
         CASE WHEN lag(ch) OVER (PARTITION BY doc_id ORDER BY i) = ch
              THEN 0 ELSE 1 END AS is_start
  FROM chars
),
runs AS (
  SELECT doc_id, CAST(SUM(is_start) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM marks
),
runlen AS (
  SELECT doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM runs GROUP BY doc_id, run_id
),
lit_marks AS (
  SELECT doc_id, run_id, len, CASE WHEN len >= 3 THEN 1 ELSE 0 END AS is_rep,
         CASE WHEN len < 3 AND COALESCE(lag(CASE WHEN len >= 3 THEN 1
                                             ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY run_id), 1) = 1
              THEN 1 ELSE 0 END AS lit_start
  FROM runlen
),
lit_groups AS (
  SELECT doc_id, run_id, len, is_rep,
         CAST(SUM(lit_start) OVER (PARTITION BY doc_id ORDER BY run_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS lit_grp
  FROM lit_marks
),
rep_bytes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN is_rep = 1
                       THEN 2 * CAST(ceil(len / 128.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS b
  FROM lit_groups GROUP BY doc_id
),
lit_bytes AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(sl + CAST(ceil(sl / 128.0) AS BIGINT)), 0)
              AS BIGINT) AS b
  FROM (SELECT doc_id, lit_grp, CAST(SUM(len) AS BIGINT) AS sl
        FROM lit_groups WHERE is_rep = 0 GROUP BY doc_id, lit_grp)
  GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(d.text)) AS BIGINT) AS total_bytes,
       CAST(SUM(COALESCE(rb.b, 0) + COALESCE(lb.b, 0)) AS BIGINT)
         AS total_packed_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
FROM documents d
LEFT JOIN rep_bytes rb ON rb.doc_id = d.doc_id
LEFT JOIN lit_bytes lb ON lb.doc_id = d.doc_id
GROUP BY d.source
"""


@register(
    "io_packbits_roundtrip",
    oracle=_packbits_len_sql(),
    tags=("io", "codec"),
    doc=(
        "Apple PackBits RLE round-trip through real executor-side binary "
        "(Arrow-batched pandas UDFs, pinned encoder policy: maximal runs "
        ">= 3 become 2-byte repeat packets per 128-chunk, shorter runs "
        "merge into 1+len literal packets per 128-stretch): the oracle "
        "recomputes the packed length ANALYTICALLY from each document's "
        "run structure (gaps-and-islands over consecutive equal "
        "characters) and asserts every document decodes back "
        "byte-identically — a wrong packet header or run split breaks "
        "either column.  The byte-RLE codec quadrant (BMP is raw, GIF "
        "is LZW, FLAC is predictive)."
    ),
)
def io_packbits_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")

    @F.pandas_udf("binary")
    def enc(texts):
        return texts.map(lambda t: packbits_encode(t.encode("utf-8")))

    @F.pandas_udf("string")
    def dec(bufs):
        return pd.Series(
            [packbits_decode(b).decode("utf-8") for b in bufs], dtype="object"
        )

    coded = docs.select(
        "source",
        "text",
        F.octet_length("text").cast("bigint").alias("nbytes"),
        enc("text").alias("buf"),
    )
    back = coded.select(
        "source",
        "nbytes",
        F.length("buf").cast("bigint").alias("packed_len"),
        (dec("buf") == F.col("text")).alias("ok"),
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nbytes").cast("bigint").alias("total_bytes"),
        F.sum("packed_len").cast("bigint").alias("total_packed_bytes"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip_ok"),
    )
