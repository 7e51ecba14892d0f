"""Round-11 batch 7: sub-document dedup and bitmap-index layout.

* ``dedup_cdc_chunking`` — content-defined chunking (the Rabin/FastCDC
  family): a rolling polynomial hash over each document picks chunk
  boundaries from CONTENT (hash % 64 == 0), so shared passages chunk
  identically regardless of their byte offset — the property fixed-size
  windows (text_chunk_overlap) lack and the reason CDC is the standard
  primitive for sub-document dedup in training-data pipelines (Lee et
  al. 2022 exact-substring dedup is the same idea at suffix grain).
  The whole per-document pass runs INSIDE higher-order array functions
  (transform/filter over a char-code array) — JVM-side, zero row
  explosion, embarrassingly parallel; only the cross-document chunk-hash
  aggregate shuffles.
* ``io_roaring_bitmap_stats`` — Roaring-bitmap container planning
  (Chambi et al. 2016) for the per-type event-id posting lists: each
  2^16-value chunk counts cardinality and RUNS (consecutive-id
  stretches, one partitioned lag) and picks the cheapest container —
  array (2n bytes, n <= 4096), bitmap (8192 bytes), or run (4r + 2
  bytes) — the layout decision a bitmap index makes per chunk at write
  time.

Exactness: every quantity is integer (char codes come from a literal
charset via instr, so unicode never touches codepoint semantics; hash
arithmetic is BIGINT mod 2^20).  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------

_CDC_W = 8  # rolling window (chars)
_CDC_B = 31  # polynomial base
_CDC_M = 1_048_576  # 2^20 hash modulus
_CDC_MASK = 64  # boundary when hash % 64 == 0 -> ~64-char expected chunks

#: Literal charset: symbol value = position in this string (0 if absent),
#: so char->int is engine-independent (no codepoint semantics involved).
_CDC_CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789 ."

#: The rolling-window hash at position i (1-based, i >= w): the SAME
#: lambda-free polynomial written against element_at/list indexing.
def _cdc_hash(idx: callable, var: str) -> str:
    terms = " + ".join(
        f"{idx(f'({var} - {_CDC_W - j})')} * {_CDC_B ** (_CDC_W - j)}"
        for j in range(1, _CDC_W + 1)
    )
    return f"(({terms}) % {_CDC_M})"


_CDC_SPARK_SYMS = (
    f"transform(sequence(1, length(text)), i ->"
    f" CAST(instr('{_CDC_CHARSET}', substring(text, i, 1)) AS BIGINT))"
)
_CDC_DUCK_SYMS = (
    f"list_transform(range(1, length(text) + 1), i ->"
    f" CAST(instr('{_CDC_CHARSET}', text[i]) AS BIGINT))"
)

#: Spark's sequence(lo, hi) DESCENDS when hi < lo (DuckDB's range is just
#: empty), so short documents need the explicit empty-array guard.
_CDC_SPARK_BPOS = (
    f"CASE WHEN length(text) < {_CDC_W} THEN array()"
    f" ELSE filter(sequence({_CDC_W}, length(text)), i -> "
    + _cdc_hash(lambda e: f"element_at(syms, CAST({e} AS INT))", "i")
    + f" % {_CDC_MASK} = 0) END"
)
_CDC_DUCK_BPOS = (
    f"list_filter(range({_CDC_W}, length(text) + 1), i -> "
    + _cdc_hash(lambda e: f"syms[{e}]", "i")
    + f" % {_CDC_MASK} = 0)"
)

_ORACLE_CDC = f"""
WITH syms AS MATERIALIZED (
  SELECT doc_id, text, {_CDC_DUCK_SYMS} AS syms
  FROM (SELECT doc_id, lower(text) AS text FROM documents)
),
bpos AS (
  SELECT doc_id, text,
         list_distinct(list_append({_CDC_DUCK_BPOS}, length(text))) AS bp0
  FROM syms
),
bounds AS (
  SELECT doc_id, text, list_prepend(0, list_sort(bp0)) AS bs FROM bpos
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(bs)), k ->
           substr(text, bs[k] + 1, bs[k + 1] - bs[k]))) AS chunk
  FROM bounds
),
hashes AS (
  SELECT md5(chunk) AS h, CAST(length(chunk) AS BIGINT) AS clen,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM chunks WHERE length(chunk) > 0
  GROUP BY md5(chunk), length(chunk)
)
SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS dup_chunks,
       CAST(COALESCE(SUM(clen * cnt), 0) AS BIGINT) AS total_bytes,
       CAST(COALESCE(SUM(clen * (cnt - 1)), 0) AS BIGINT) AS dedup_saved_bytes,
       CAST(COALESCE(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS cross_doc_chunks
FROM hashes
"""


@register(
    "dedup_cdc_chunking",
    oracle=_ORACLE_CDC,
    tags=("dedup", "text", "training", "scale-path"),
    doc=(
        f"Content-defined chunking for sub-document dedup: a rolling "
        f"degree-{_CDC_W} polynomial hash (base {_CDC_B}, mod 2^20) over "
        "each lowercased document picks boundaries where hash % "
        f"{_CDC_MASK} == 0 (~{_CDC_MASK}-char expected chunks), so "
        "shared passages align identically at ANY byte offset — the "
        "shift-invariance fixed windows lack, and the primitive behind "
        "exact-substring training-data dedup.  The whole per-document "
        "pass is higher-order array functions (char-code transform + "
        "boundary filter + chunk slicing) — JVM-side, no row explosion; "
        "the only shuffle is the cross-document chunk-hash aggregate, "
        "whose readout reports total/distinct/duplicated chunks, bytes "
        "saved by dedup, and chunks shared across documents.  Char "
        "codes come from a literal charset via instr (unicode-safe by "
        "construction)."
    ),
)
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text")
    )
    syms = docs.select("doc_id", "text", F.expr(_CDC_SPARK_SYMS).alias("syms"))
    bpos = syms.select(
        "doc_id",
        "text",
        F.expr(
            f"array_distinct(concat({_CDC_SPARK_BPOS},"
            " array(CAST(length(text) AS BIGINT))))"
        ).alias("bp0"),
    )
    bounds = bpos.select(
        "doc_id",
        "text",
        F.expr(
            "concat(array(CAST(0 AS BIGINT)), array_sort(bp0))"
        ).alias("bs"),
    )
    chunks = bounds.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(bs) - 1), k ->"
                " substring(text, CAST(element_at(bs, k) + 1 AS INT),"
                " CAST(element_at(bs, k + 1) - element_at(bs, k) AS INT)))"
            )
        ).alias("chunk"),
    )
    hashes = (
        chunks.where(F.length("chunk") > 0)
        .groupBy(F.md5("chunk").alias("h"), F.length("chunk").cast("bigint").alias("clen"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.countDistinct("doc_id").cast("bigint").alias("ndocs"),
        )
    )
    return hashes.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
        .cast("bigint")
        .alias("dup_chunks"),
        F.coalesce(F.sum(F.col("clen") * F.col("cnt")), F.lit(0))
        .cast("bigint")
        .alias("total_bytes"),
        F.coalesce(F.sum(F.col("clen") * (F.col("cnt") - 1)), F.lit(0))
        .cast("bigint")
        .alias("dedup_saved_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("cross_doc_chunks"),
    )


# ---------------------------------------------------------------------------
# Roaring bitmap container planner
# ---------------------------------------------------------------------------

_RB_CHUNK = 65_536
_RB_ARRAY_MAX = 4_096

_RB_BYTES = (
    "CASE WHEN 4 * runs + 2 <= LEAST(2 * n, 8192) THEN 4 * runs + 2"
    f" WHEN n <= {_RB_ARRAY_MAX} THEN 2 * n ELSE 8192 END"
)
_RB_CONTAINER = (
    "CASE WHEN 4 * runs + 2 <= LEAST(2 * n, 8192) THEN 'run'"
    f" WHEN n <= {_RB_ARRAY_MAX} THEN 'array' ELSE 'bitmap' END"
)

_ORACLE_ROARING = f"""
WITH ids AS (
  SELECT DISTINCT event_type, event_id FROM events
),
runs AS (
  SELECT event_type, event_id // {_RB_CHUNK} AS chunk, event_id,
         CASE WHEN lag(event_id) OVER (
                PARTITION BY event_type, event_id // {_RB_CHUNK}
                ORDER BY event_id) = event_id - 1
              THEN 0 ELSE 1 END AS run_start
  FROM ids
),
per_chunk AS (
  SELECT event_type, chunk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(run_start) AS BIGINT) AS runs
  FROM runs GROUP BY event_type, chunk
)
SELECT event_type, CAST(chunk AS BIGINT) AS chunk, n, runs,
       {_RB_CONTAINER} AS container,
       CAST({_RB_BYTES} AS BIGINT) AS container_bytes
FROM per_chunk
ORDER BY event_type, chunk
"""


@register(
    "io_roaring_bitmap_stats",
    oracle=_ORACLE_ROARING,
    tags=("io", "layout", "index"),
    doc=(
        "Roaring-bitmap container planning (Chambi et al. 2016) for the "
        "per-event-type event-id posting lists: ids split into 2^16 "
        "chunks, each chunk counts cardinality n and consecutive-id "
        "RUNS (one lag over the chunk partition — scale-safe window), "
        "and the planner picks the cheapest container exactly as "
        "roaring does: run (4r+2 bytes) when it beats both, else array "
        "(2n bytes, n <= 4096), else bitmap (8192 bytes).  The "
        "write-time layout decision of every bitmap index; all "
        "quantities exact integers."
    ),
)
def io_roaring_bitmap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    ids = ev.select("event_type", "event_id").distinct()
    w = Window.partitionBy(
        "event_type", F.expr(f"event_id div {_RB_CHUNK}")
    ).orderBy("event_id")
    runs = ids.select(
        "event_type",
        F.expr(f"event_id div {_RB_CHUNK}").alias("chunk"),
        "event_id",
        F.when(
            F.lag("event_id").over(w) == F.col("event_id") - 1, 0
        )
        .otherwise(1)
        .alias("run_start"),
    )
    per_chunk = runs.groupBy("event_type", "chunk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("run_start").cast("bigint").alias("runs"),
    )
    return per_chunk.select(
        "event_type",
        F.col("chunk").cast("bigint").alias("chunk"),
        "n",
        "runs",
        F.expr(_RB_CONTAINER).alias("container"),
        F.expr(_RB_BYTES).cast("bigint").alias("container_bytes"),
    ).orderBy("event_type", "chunk")
