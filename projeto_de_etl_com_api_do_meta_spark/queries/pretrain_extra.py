"""Pretraining-pipeline extras: unicode normalization, BPE application,
weighted reservoir sampling, rendezvous sharding, compression-ratio quality.

These round out the text-curation stack with operators every large-scale
training-data pipeline runs before anything else touches the bytes:
canonicalize unicode, tokenize, sample by weight, shard stably, and gate on
compressibility.  Reference parity note: the reference repo has no text
stack at all (SURVEY.md §2 [EXT] rows); these are north-star extensions.

Every operator is map-side / hash-agg shaped — no all-pairs work, no driver
materialization of row-scale data — so the plans survive a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import spread
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# text_unicode_normalize
# ---------------------------------------------------------------------------
# The fixture corpus is pure ASCII, so both engines first INJECT the same
# deterministic unicode damage (decomposed accents, NBSP, a control char —
# keyed on doc_id so the input is reproducible), then repair it: NFC
# composition + NBSP -> space + control-char strip + whitespace collapse.
# That makes the oracle a true differential test of the repair logic, not a
# comparison of two identity functions.

_ORACLE_UNICODE_NORMALIZE = """
WITH damaged AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN replace(text, 'a', 'a' || chr(769))
           WHEN 1 THEN replace(text, 'e', 'e' || chr(769)) || chr(7)
           ELSE replace(text, ' ', chr(160))
         END AS dirty
  FROM documents
),
clean AS (
  SELECT doc_id, dirty,
         trim(regexp_replace(
             regexp_replace(
                 replace(nfc_normalize(dirty), chr(160), ' '),
                 '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'),
             ' +', ' ', 'g')) AS clean
  FROM damaged
)
SELECT doc_id,
       CAST(length(dirty) AS BIGINT) AS n_dirty,
       CAST(length(clean) AS BIGINT) AS n_clean,
       md5(clean) AS fp
FROM clean
ORDER BY doc_id
"""


@register(
    "text_unicode_normalize",
    oracle=_ORACLE_UNICODE_NORMALIZE,
    tags=("text", "cleaning", "north-star"),
    doc=(
        "Unicode canonicalization battery (NFC composition + NBSP->space + "
        "C0-control strip + whitespace collapse), the first stage of every "
        "web-text curation funnel. Both engines deterministically damage "
        "the ASCII fixture the same way (combining acute accents, NBSP, "
        "BEL, keyed on doc_id) so the oracle differentially verifies the "
        "REPAIR: Spark composes NFC in an Arrow-batched pandas UDF "
        "(unicodedata.normalize — Spark has no NFC builtin) and does the "
        "rest with builtin regexp_replace/trim; DuckDB uses its native "
        "nfc_normalize. Character counts before/after plus an md5 "
        "fingerprint of the cleaned text must match byte-for-byte. "
        "Map-only: one pass, no shuffle beyond the fixture scan."
    ),
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    import unicodedata

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    dirty = spread(docs, "doc_id").withColumn(
        "dirty",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.replace(F.col("text"), F.lit("a"), F.lit("a\u0301")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.replace(F.col("text"), F.lit("e"), F.lit("e\u0301")),
                F.lit("\x07"),
            ),
        )
        .otherwise(F.replace(F.col("text"), F.lit(" "), F.lit("\u00a0"))),
    )

    # No type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's eval-type inference rejects; hint-less defaults to
    # the Arrow-batched SCALAR eval type, which is what we want.
    @F.pandas_udf("string")
    def nfc(s):
        return s.map(lambda t: unicodedata.normalize("NFC", t))

    clean = (
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.replace(nfc("dirty"), F.lit("\u00a0"), F.lit(" ")),
                    F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F]"),
                    F.lit(""),
                ),
                F.lit(" +"),
                F.lit(" "),
            )
        )
    ).alias("clean")
    return (
        dirty.select("doc_id", "dirty", clean)
        .select(
            "doc_id",
            F.length("dirty").cast("long").alias("n_dirty"),
            F.length("clean").cast("long").alias("n_clean"),
            F.md5("clean").alias("fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_bpe_apply
# ---------------------------------------------------------------------------
# Fixed ranked merge table (built bottom-up, as real tokenizers are: each
# merge's parts are base characters or earlier merge outputs).  The Spark
# side runs the REAL inference algorithm (repeatedly merge the
# lowest-ranked adjacent pair) on the DISTINCT-WORD table only — the same
# vocabulary-scale trick corpus_wordpiece_tokenize uses, so corpus-scale
# work is one word-count hash aggregate.  The oracle applies the merges as
# rank-ordered exhaustive string REPLACEs over '(c)(h)(a)(r)'-wrapped
# tokens, which is provably equivalent for a bottom-up merge table — a
# genuine cross-algorithm differential.

_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "a"),
    ("ta", "b"),
    ("l", "e"),
    ("tab", "le"),
    ("s", "c"),
    ("a", "n"),
    ("sc", "an"),
    ("r", "o"),
    ("ro", "w"),
    ("e", "r"),
)


def _bpe_oracle() -> str:
    expr = "'(' || array_to_string(string_split_regex(word, ''), ')(') || ')'"
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, '({a})({b})', '({a}{b})')"
    return f"""
WITH words AS (
  SELECT lower(w) AS word, COUNT(*) AS n_occurrences
  FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
  GROUP BY 1
),
enc AS (
  SELECT word, n_occurrences,
         trim(replace(replace({expr}, ')(', ' '), '(', ''), ')') AS toks
  FROM words
)
SELECT word,
       toks AS tokens,
       CAST(length(toks) - length(replace(toks, ' ', '')) + 1 AS BIGINT)
         AS n_tokens,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM enc
ORDER BY word
"""


@register(
    "corpus_bpe_apply",
    oracle=_bpe_oracle(),
    tags=("text", "tokenizer", "north-star"),
    doc=(
        "BPE tokenizer APPLICATION (inference side): encode every distinct "
        "corpus word against a fixed ranked merge table by repeatedly "
        "merging the lowest-ranked adjacent pair — the GPT-2/tiktoken "
        "algorithm. Scale shape: the Python encoder (Arrow-batched "
        "mapInPandas) runs on the DISTINCT-WORD table only (vocabulary-"
        "scale, bounded at any corpus size); the corpus-scale work is one "
        "map-side-combinable word-count aggregate, and the encoded vocab "
        "broadcasts back. Oracle: rank-ordered exhaustive REPLACE over "
        "wrapped '(c)(h)' tokens — equivalent for a bottom-up merge table, "
        "so the two engines verify each other across two different "
        "formulations of the same algorithm."
    ),
)
def corpus_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    wcnt = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )

    rank = {pair: i for i, pair in enumerate(_BPE_MERGES)}

    def encode(word: str) -> list[str]:
        toks = list(word)
        while len(toks) > 1:
            pairs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
            ranked = [(rank[p], i) for i, p in enumerate(pairs) if p in rank]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            best = _BPE_MERGES[best_rank]
            out, i = [], 0
            while i < len(toks):
                if (
                    i < len(toks) - 1
                    and (toks[i], toks[i + 1]) == best
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    def encode_batches(batches):
        for pdf in batches:
            toks = pdf["word"].map(encode)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "tokens": toks.map(" ".join),
                    "n_tokens": toks.map(len).astype("int64"),
                }
            )

    vocab_tok = wcnt.select("word").mapInPandas(
        encode_batches, "word string, tokens string, n_tokens long"
    )
    return (
        wcnt.join(F.broadcast(vocab_tok), "word")
        .select("word", "tokens", "n_tokens", "n_occurrences")
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# sample_weighted_reservoir
# ---------------------------------------------------------------------------
# Efraimidis–Spirakis A-ES: key_i = u_i^(1/w_i) with u_i uniform from a
# deterministic md5 hash; the global top-k by key is an exact weighted
# sample without replacement.  One map pass + a top-k — the distributed
# form is a per-partition top-k (TakeOrderedAndProject) with no full sort.

_RESERVOIR_K = 25

_ORACLE_WEIGHTED_RESERVOIR = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         POWER(
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':res'), 1, 13))
                 AS BIGINT) + 0.5) / 4503599627370496.0,
           1.0 / n_chars) AS k
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(k, 6) AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {_RESERVOIR_K}
"""


@register(
    "sample_weighted_reservoir",
    oracle=_ORACLE_WEIGHTED_RESERVOIR,
    tags=("sampling", "north-star"),
    doc=(
        "Deterministic weighted sampling without replacement (Efraimidis-"
        "Spirakis A-ES): key = u^(1/w) with u drawn from md5(doc_id), "
        "take the global top-k keys. Exactly reproducible across engines "
        "and runs — the property a training pipeline needs to re-derive "
        "the same sample from the same corpus snapshot. Scale shape: one "
        "map pass computes keys, then TakeOrderedAndProject does a "
        "per-partition top-k and merges k*nparts rows on the driver — no "
        "global sort, no shuffle of the corpus. Oracle: same fixed-point "
        "uniform and POWER in DuckDB, verified key-for-key at 6 dp."
    ),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4503599627370496.0)  # 2^52
    k = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            k.alias("k"),
        )
        .orderBy(F.desc("k"), "doc_id")
        .limit(_RESERVOIR_K)
        .select("doc_id", "weight", F.round("k", 6).alias("sample_key"))
    )


# ---------------------------------------------------------------------------
# train_rendezvous_sharding
# ---------------------------------------------------------------------------
# Highest-random-weight (rendezvous) hashing: shard(doc) = argmax over
# shards of md5(doc_id:shard).  Stateless and coordination-free — any
# worker can compute any document's shard — and minimally disruptive:
# growing n shards to n+1 moves exactly the documents whose new shard wins
# the argmax, ~1/(n+1) of the corpus in expectation, with NO other
# reassignments (the argmax over the surviving candidates is unchanged).
# The query assigns every document under 8 and under 9 shards and flags
# the moved rows, so the stability property is part of the verified output.

_ORACLE_RENDEZVOUS = """
WITH scores AS (
  SELECT d.doc_id, s.shard,
         md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(s.shard AS VARCHAR))
           AS score
  FROM documents d, unnest(range(0, 9)) AS s(shard)
),
a8 AS (
  SELECT doc_id, arg_max(shard, score) AS shard8
  FROM scores WHERE shard < 8 GROUP BY doc_id
),
a9 AS (
  SELECT doc_id, arg_max(shard, score) AS shard9
  FROM scores GROUP BY doc_id
)
SELECT a8.doc_id, CAST(shard8 AS BIGINT) AS shard8,
       CAST(shard9 AS BIGINT) AS shard9,
       CAST(shard8 <> shard9 AS INTEGER) AS moved
FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id
ORDER BY a8.doc_id
"""


@register(
    "train_rendezvous_sharding",
    oracle=_ORACLE_RENDEZVOUS,
    tags=("training", "sharding", "north-star"),
    doc=(
        "Rendezvous (highest-random-weight) sharding: assign each document "
        "to argmax over shards of md5(doc_id#shard). Stateless — any task "
        "computes any document's shard with no lookup table — and "
        "resize-stable: going 8->9 shards moves only the docs the new "
        "shard wins (~1/9), never reshuffles the rest; the query emits "
        "both assignments plus the moved flag so that property is part of "
        "the verified result. Scale shape: a 9-row shard spine is "
        "broadcast against the corpus (map-only expand) and the argmax is "
        "a map-side-combinable max(struct(score, shard)) hash aggregate; "
        "lexicographic md5 comparison is total so there are no ties."
    ),
)
def train_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shards = spark.range(0, 9).select(F.col("id").cast("int").alias("shard"))
    score = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("#"), F.col("shard").cast("string")
        )
    ).alias("score")
    scored = spread(docs, "doc_id").join(F.broadcast(shards)).select(
        "doc_id", "shard", score
    )
    a8 = (
        scored.where(F.col("shard") < 8)
        .groupBy("doc_id")
        .agg(F.max(F.struct("score", "shard")).alias("m"))
        .select("doc_id", F.col("m.shard").cast("long").alias("shard8"))
    )
    a9 = (
        scored.groupBy("doc_id")
        .agg(F.max(F.struct("score", "shard")).alias("m"))
        .select("doc_id", F.col("m.shard").cast("long").alias("shard9"))
    )
    return (
        a8.join(a9, "doc_id")
        .select(
            "doc_id",
            "shard8",
            "shard9",
            (F.col("shard8") != F.col("shard9")).cast("int").alias("moved"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_compression_ratio  (rows-only: no zlib in DuckDB)
# ---------------------------------------------------------------------------


@register(
    "text_compression_ratio",
    oracle=None,  # DuckDB has no DEFLATE; semantics pinned by unit tests
    tags=("text", "quality", "rows-only"),
    doc=(
        "Compressibility quality signal: zlib-deflate ratio per document "
        "(compressed_len / raw_len, level 6). Highly repetitive or "
        "boilerplate text compresses far below prose (~0.3), near-random "
        "text approaches 1.0 — a standard cheap pretraining filter that "
        "catches pathologies entropy-per-word misses (long-range repeats). "
        "Arrow-batched mapInPandas, map-only, no shuffle; deterministic "
        "(zlib level pinned) and pinned by unit tests on known strings "
        "since DuckDB has no DEFLATE to oracle against."
    ),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    import zlib

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def ratios(batches):
        for pdf in batches:
            raw = pdf["text"].map(lambda t: len(t.encode("utf-8")))
            comp = pdf["text"].map(
                lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw.astype("int64"),
                    "compressed_len": comp.astype("int64"),
                    "ratio": (comp / raw).round(6),
                }
            )

    out = spread(docs, "doc_id").mapInPandas(
        ratios, "doc_id long, raw_len long, compressed_len long, ratio double"
    )
    return out.withColumn(
        "low_quality", (F.col("ratio") < 0.35).cast("int")
    ).orderBy("doc_id")
