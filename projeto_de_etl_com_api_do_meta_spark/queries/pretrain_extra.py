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


# ---------------------------------------------------------------------------
# text_c4_line_rules
# ---------------------------------------------------------------------------
# The C4 line-level cleaning rules (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning", section 2.2): keep only lines that end in
# terminal punctuation AND have >= 5 words AND don't mention javascript;
# drop whole pages containing "lorem ipsum" or a curly brace, or with
# fewer than 3 surviving lines.  The punctuation-free fixture is first
# deterministically DECORATED (keyed on (doc_id, seg_pos)) so every rule
# has real positive and negative cases, and two page-poison lines are
# injected on doc_id residues — the oracle applies the same decoration, so
# the diff verifies the RULES, not the fixture.

_C4_SEG_WORDS = 8
_C4_JS_LINE = " requires javascript enabled."
_C4_LOREM_LINE = "lorem ipsum dolor sit amet."
_C4_BRACE_LINE = "body { margin: 0; } done."

_ORACLE_C4_LINE_RULES = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
t AS (
  SELECT doc_id, CAST(ceil(len(ws) / {_C4_SEG_WORDS}.0) AS BIGINT) AS n_segs, ws
  FROM w
),
seg AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_pos,
         array_to_string(
           ws[(i - 1) * {_C4_SEG_WORDS} + 1 : i * {_C4_SEG_WORDS}], ' ') AS seg
  FROM t, unnest(range(1, n_segs + 1)) AS r(i)
),
lines AS (
  SELECT doc_id, seg_pos,
         CASE (doc_id * 31 + seg_pos) % 5
           WHEN 0 THEN seg || '{_C4_JS_LINE}'
           WHEN 1 THEN seg
           WHEN 2 THEN seg || '!'
           WHEN 3 THEN seg || '?'
           ELSE seg || '.'
         END AS line
  FROM seg
  UNION ALL
  SELECT doc_id, 1000001, '{_C4_LOREM_LINE}' FROM documents WHERE doc_id % 41 = 0
  UNION ALL
  SELECT doc_id, 1000002, '{_C4_BRACE_LINE}' FROM documents WHERE doc_id % 43 = 1
),
judged AS (
  SELECT doc_id, seg_pos, line,
         (regexp_matches(line, '[.!?"]$')
          AND len(string_split(line, ' ')) >= 5
          AND NOT contains(line, 'javascript')) AS line_keep,
         contains(line, 'lorem ipsum') AS has_lorem,
         (contains(line, '{{') OR contains(line, '}}')) AS has_brace
  FROM lines
),
agg AS (
  SELECT doc_id,
         COUNT(*) AS n_lines,
         COUNT(*) FILTER (WHERE line_keep) AS n_kept,
         bool_or(has_lorem) AS any_lorem,
         bool_or(has_brace) AS any_brace,
         md5(COALESCE(string_agg(line, ' ' ORDER BY seg_pos)
                        FILTER (WHERE line_keep), '')) AS fp
  FROM judged GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(CASE WHEN NOT any_lorem AND NOT any_brace AND n_kept >= 3
                 THEN 1 ELSE 0 END AS INT) AS page_keep,
       fp
FROM agg
ORDER BY doc_id
"""


@register(
    "text_c4_line_rules",
    oracle=_ORACLE_C4_LINE_RULES,
    tags=("text", "quality", "cleaning", "north-star"),
    doc=(
        "The C4 line-level cleaning battery (Raffel et al. 2020 sec 2.2): "
        "a line survives iff it ends in terminal punctuation, has >= 5 "
        "words, and doesn't mention javascript; the whole page is dropped "
        "if any line contains 'lorem ipsum' or a curly brace, or fewer "
        "than 3 lines survive. Lines are fixed-8-word segments of the "
        "punctuation-free fixture, deterministically decorated keyed on "
        "(doc_id, seg_pos) so every rule fires both ways, plus injected "
        "lorem-ipsum / brace poison lines on doc_id residues. Rebuilt "
        "kept-text md5 is part of the verified output. Scale shape: "
        "segment explode is a per-row array expression, rules are JVM "
        "string predicates, and the per-doc verdict is ONE hash aggregate "
        "(array_sort(collect_list) rebuild, no window) — the only shuffle "
        "keys on doc_id."
    ),
)
def text_c4_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .web_queries import segment_words

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    segs = segment_words(spread(docs, "doc_id"), _C4_SEG_WORDS)

    k = (F.col("doc_id") * 31 + F.col("seg_pos")) % 5
    decorated = segs.select(
        "doc_id",
        "seg_pos",
        F.when(k == 0, F.concat("seg", F.lit(_C4_JS_LINE)))
        .when(k == 1, F.col("seg"))
        .when(k == 2, F.concat("seg", F.lit("!")))
        .when(k == 3, F.concat("seg", F.lit("?")))
        .otherwise(F.concat("seg", F.lit(".")))
        .alias("line"),
    )
    poison = docs.where(F.col("doc_id") % 41 == 0).select(
        "doc_id", F.lit(1000001).cast("long").alias("seg_pos"),
        F.lit(_C4_LOREM_LINE).alias("line"),
    ).unionAll(
        docs.where(F.col("doc_id") % 43 == 1).select(
            "doc_id", F.lit(1000002).cast("long").alias("seg_pos"),
            F.lit(_C4_BRACE_LINE).alias("line"),
        )
    )
    lines = decorated.unionAll(poison)

    judged = lines.select(
        "doc_id",
        "seg_pos",
        "line",
        (
            F.col("line").rlike('[.!?"]$')
            & (F.size(F.split("line", " ")) >= 5)
            & ~F.col("line").contains("javascript")
        ).alias("line_keep"),
        F.col("line").contains("lorem ipsum").alias("has_lorem"),
        (F.col("line").contains("{") | F.col("line").contains("}")).alias(
            "has_brace"
        ),
    )
    agg = judged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("line_keep").cast("long")).alias("n_kept"),
        F.max("has_lorem").alias("any_lorem"),
        F.max("has_brace").alias("any_brace"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("line_keep"),
                                F.struct("seg_pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            )
        ).alias("fp"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.when(
            ~F.col("any_lorem") & ~F.col("any_brace") & (F.col("n_kept") >= 3),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("page_keep"),
        "fp",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_mojibake_repair
# ---------------------------------------------------------------------------
# ftfy-style double-encoding repair: UTF-8 bytes decoded as Latin-1 leave
# telltale sequences (e 'Ã©', o-circumflex 'Ã´', right-quote 'â€™',
# em-dash 'â€”').  The ASCII fixture is deterministically damaged (keyed
# on doc_id % 4, one residue left CLEAN as the control group), then both
# engines count hits per pattern and repair by reverse substitution —
# md5 of the repaired text is value-verified.

_MOJIBAKE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("Ã©", "é"),  # 'Ã©' -> 'é'
    ("Ã´", "ô"),  # 'Ã´' -> 'ô'
    ("â€™", "’"),  # 'â€™' -> right single quote
    ("â€”", "—"),  # 'â€”' -> em dash
)
_MOJIBAKE_SUFFIX = " itâ€™s broken â€” badly"


def _mojibake_oracle() -> str:
    pats = _MOJIBAKE_PATTERNS
    dirty = (
        "CASE doc_id % 4 "
        f"WHEN 0 THEN replace(text, 'e', '{pats[0][0]}') "
        f"WHEN 1 THEN replace(text, 'o', '{pats[1][0]}') "
        f"WHEN 2 THEN text || '{_MOJIBAKE_SUFFIX}' "
        "ELSE text END"
    )
    hits = " + ".join(
        f"(length(dirty) - length(replace(dirty, '{p}', ''))) / {len(p)}"
        for p, _ in pats
    )
    repaired = "dirty"
    for p, r in pats:
        repaired = f"replace({repaired}, '{p}', '{r}')"
    return f"""
WITH damaged AS (
  SELECT doc_id, {dirty} AS dirty FROM documents
)
SELECT doc_id,
       CAST({hits} AS BIGINT) AS n_hits,
       CAST(CASE WHEN {hits} > 0 THEN 1 ELSE 0 END AS INT) AS mojibake,
       md5({repaired}) AS fp
FROM damaged
ORDER BY doc_id
"""


@register(
    "text_mojibake_repair",
    oracle=_mojibake_oracle(),
    tags=("text", "cleaning", "north-star"),
    doc=(
        "Mojibake (UTF-8-decoded-as-Latin-1) detection and repair, the "
        "ftfy pass of web-text curation: count telltale double-encoding "
        "sequences per document and reverse-substitute them. The ASCII "
        "fixture is deterministically damaged keyed on doc_id % 4 (one "
        "residue stays clean as the control), so hit counts, the flag, "
        "and the repaired-text md5 are all differentially verified. "
        "Map-only JVM string expressions — no UDF, no shuffle; at 100 TB "
        "this fuses into the scan's projection."
    ),
)
def text_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    pats = _MOJIBAKE_PATTERNS
    dirty = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit(pats[0][0])),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.replace(F.col("text"), F.lit("o"), F.lit(pats[1][0])),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.col("text"), F.lit(_MOJIBAKE_SUFFIX)),
        )
        .otherwise(F.col("text"))
    )
    d = docs.select("doc_id", dirty.alias("dirty"))

    n_hits = None
    for p, _ in pats:
        term = (
            (
                F.length("dirty")
                - F.length(F.replace(F.col("dirty"), F.lit(p), F.lit("")))
            )
            / F.lit(len(p))
        ).cast("long")
        n_hits = term if n_hits is None else n_hits + term

    repaired = F.col("dirty")
    for p, r in pats:
        repaired = F.replace(repaired, F.lit(p), F.lit(r))

    return d.select(
        "doc_id",
        n_hits.alias("n_hits"),
        (n_hits > 0).cast("int").alias("mojibake"),
        F.md5(repaired).alias("fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup_cross_source_priority
# ---------------------------------------------------------------------------
# When several corpora are merged (curated + web + crawl), duplicates must
# be resolved by SOURCE PRIORITY, not arbitrary min-id: the curated copy
# wins even if the crawl copy arrived first.  Fingerprint = md5 of the
# 4-word document head (the coarse head-key under which the fixture has
# real cross-source collisions); tier = source number % 3 (0 = curated,
# 1 = web, 2 = crawl), lowest tier wins, doc_id breaks ties.

_ORACLE_CROSS_SOURCE = """
WITH keyed AS (
  SELECT doc_id, source,
         -- TRY_CAST: a source not named 'srcN' falls back to the LAST
         -- tier (crawl) instead of raising — Spark's try_cast parity
         -- (found by the r8 degenerate-fixture differ)
         COALESCE(TRY_CAST(substr(source, 4) AS INT) % 3, 2) AS tier,
         md5(array_to_string(string_split(text, ' ')[1:4], ' ')) AS fp
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY tier, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fp) AS n_copies,
         COUNT(DISTINCT source) OVER (PARTITION BY fp) AS n_sources
  FROM keyed
)
SELECT fp,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(n_sources AS BIGINT) AS n_sources,
       doc_id AS keep_doc_id,
       source AS keep_source
FROM ranked
WHERE rn = 1 AND n_copies >= 2
ORDER BY fp
"""


@register(
    "dedup_cross_source_priority",
    oracle=_ORACLE_CROSS_SOURCE,
    tags=("dedup", "training", "north-star"),
    doc=(
        "Source-priority duplicate resolution for merged corpora: among "
        "copies sharing a fingerprint (md5 of the 4-word document head, "
        "under which the fixture has genuine cross-source collisions), the "
        "lowest source tier (source number % 3: curated < web < crawl) "
        "wins, doc_id breaking ties — the curated copy survives even when "
        "a crawl copy has the smaller id. Scale shape: ONE hash aggregate "
        "on the fingerprint (min(struct(tier, doc_id, source)) picks the "
        "winner, map-side combinable) — no window, no self-join; the "
        "oracle's ROW_NUMBER formulation is the cross-check."
    ),
)
def dedup_cross_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    keyed = spread(docs, "doc_id").select(
        "doc_id",
        "source",
        F.coalesce(
            F.expr("try_cast(substring(source, 4, 10) AS INT)") % 3, F.lit(2)
        ).alias("tier"),
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 4), " ")).alias(
            "fp"
        ),
    )
    agg = keyed.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("source").alias("n_sources"),
        F.min(F.struct("tier", "doc_id", "source")).alias("_w"),
    )
    return (
        agg.where(F.col("n_copies") >= 2)
        .select(
            "fp",
            "n_copies",
            "n_sources",
            F.col("_w.doc_id").alias("keep_doc_id"),
            F.col("_w.source").alias("keep_source"),
        )
        .orderBy("fp")
    )


# -- Source-concentration diagnostic (HHI over the corpus mixture) -------------

_ORACLE_HHI = """
WITH per AS (
  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_sources FROM per)
SELECT CAST(t.n_sources AS BIGINT) AS n_sources,
       CAST(t.total AS BIGINT) AS n_docs,
       CAST((SUM(p.cnt * p.cnt) * 10000) // (t.total * t.total) AS BIGINT)
         AS hhi_bp,
       CAST((MAX(p.cnt) * 10000) // t.total AS BIGINT) AS top_share_bp
FROM per p CROSS JOIN tot t
GROUP BY t.n_sources, t.total
"""


@register(
    "corpus_source_concentration",
    oracle=_ORACLE_HHI,
    tags=("corpus", "dq", "training"),
    doc=(
        "Source-concentration diagnostic: Herfindahl-Hirschman index of "
        "the corpus mixture (sum of squared source shares) plus the top "
        "source's share, both in exact integer basis points — the one-row "
        "report that says whether a merged corpus is dominated by a "
        "single source before temperature reweighting "
        "(corpus_temperature_mixture is the fix this diagnoses the need "
        "for). HHI_bp = sum(cnt^2)*10000 div total^2: pure BIGINT, no "
        "float shares. One map-side-combined count per source + one "
        "scalar reduce — O(sources) state."
    ),
)
def corpus_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy("n_sources", "total")
        .agg(
            F.expr("(SUM(cnt * cnt) * 10000) div (first(total) * first(total))")
            .alias("hhi_bp"),
            F.expr("(MAX(cnt) * 10000) div first(total)").alias("top_share_bp"),
        )
        .select(
            F.col("n_sources").cast("long").alias("n_sources"),
            F.col("total").cast("long").alias("n_docs"),
            "hhi_bp",
            "top_share_bp",
        )
    )


# -- Corpus data card (datasheet-for-datasets summary) --------------------------

_ORACLE_DATA_CARD = """
WITH base AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks,
         md5(trim(text)) AS fp
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_docs,
       CAST(((COUNT(*) - COUNT(DISTINCT fp)) * 10000) // COUNT(*) AS BIGINT)
         AS exact_dup_bp,
       CAST(MIN(n_toks) AS BIGINT) AS min_toks,
       CAST(MAX(n_toks) AS BIGINT) AS max_toks,
       CAST(SUM(n_toks) // COUNT(*) AS BIGINT) AS mean_toks
FROM base
"""


@register(
    "corpus_data_card",
    oracle=_ORACLE_DATA_CARD,
    tags=("corpus", "dq", "training"),
    doc=(
        "Corpus data card (the 'datasheets for datasets' summary a "
        "training-data release ships): document/token totals, language "
        "and source cardinalities, exact-duplicate rate in basis points "
        "(md5 content fingerprints), and token-length extremes/mean — "
        "ONE scan, one reduce, every aggregate map-side combinable "
        "(count-distincts expand to two-phase aggregates; at extreme "
        "cardinalities swap approx_count_distinct, same plan shape). The "
        "one-row report that fronts every corpus the pipeline publishes."
    ),
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    base = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_toks"),
        F.md5(F.trim("text")).alias("fp"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("fp").alias("n_unique_docs"),
        F.expr(
            "((COUNT(*) - COUNT(DISTINCT fp)) * 10000) div COUNT(*)"
        ).alias("exact_dup_bp"),
        F.min("n_toks").alias("min_toks"),
        F.max("n_toks").alias("max_toks"),
        F.expr("SUM(n_toks) div COUNT(*)").alias("mean_toks"),
    )
