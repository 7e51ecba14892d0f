"""Document-table queries: text analysis + dedup family (driver north star).

SQL-expressible ops carry a DuckDB oracle replicating the exact shingling /
scoring; hash-based ops (MinHash, SimHash) are rows-only with unit tests
pinning their semantics against exact Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_near_dup,
    spread,
)
from ..operators.text import (
    doc_stats,
    fingerprint_md5,
    predict_lang,
    simhash64,
    winnow_fingerprints,
)
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_DOC_STATS = r"""
WITH t AS (
  SELECT doc_id, lang, text,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id, lang,
       CAST(length(text) AS INTEGER) AS char_count,
       CAST(len(toks) AS INTEGER) AS token_count,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS INTEGER) AS bpe_token_count,
       CAST(len(list_distinct(toks)) AS INTEGER) AS distinct_tokens,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
         AS type_token_ratio,
       round(CAST(len(list_filter(toks,
               t2 -> t2 IN ('the','a','an','and','or','of','to','in')))
             AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       round(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
             / length(text), 6) AS punct_ratio,
       round((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
             * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 6) AS quality_score,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM t
"""


@register(
    "text_doc_stats",
    oracle=_ORACLE_DOC_STATS,
    tags=("text", "north-star"),
    doc=(
        "Text quality scoring: char/token/BPE-ish counts, type-token ratio, "
        "stopword+punct ratios, composite quality score, md5 fingerprint."
    ),
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    return doc_stats(docs).withColumn(
        "fingerprint", fingerprint_md5("text")
    ).drop("text")


_LANGS = ("de", "en", "es", "fr", "zh")
_MARKER_SQL = {
    "en": "('the','a','and','of')",
    "de": "('der','die','und','das')",
    "es": "('el','la','los','de')",
    "fr": "('le','la','les','des')",
    "zh": "('de','le','shi','bu')",
}
_ORACLE_LANG_ID = (
    r"""
WITH t AS (
  SELECT doc_id, lang AS true_lang,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, true_lang,
"""
    + ",\n".join(
        f"         CAST(len(list_filter(toks, t2 -> t2 IN {_MARKER_SQL[lang]})) AS INTEGER)"
        f" AS score_{lang}"
        for lang in _LANGS
    )
    + """
  FROM t
)
SELECT doc_id, true_lang, score_de, score_en, score_es, score_fr, score_zh,
       CASE """
    + " ".join(
        f"WHEN score_{lang} = greatest(score_de, score_en, score_es, score_fr, score_zh)"
        f" THEN '{lang}'"
        for lang in _LANGS
    )
    + """ END AS pred_lang
FROM scored
"""
)


@register(
    "text_lang_id",
    oracle=_ORACLE_LANG_ID,
    tags=("text", "north-star"),
    doc=(
        "Language-ID heuristic: per-language marker-token scores, argmax "
        "prediction with alphabetical tie-break."
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    return predict_lang(docs).drop("text")


_ORACLE_EXACT_DEDUP = r"""
WITH fp AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT doc_id, lang, fingerprint
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM fp)
WHERE rn = 1
"""


@register(
    "dedup_exact_docs",
    oracle=_ORACLE_EXACT_DEDUP,
    tags=("dedup", "north-star"),
    doc="Exact dedup on normalized-text fingerprint, lowest-id representative kept.",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return exact_dedup(docs).select("doc_id", "lang", "fingerprint")


_ORACLE_JACCARD = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM posting a JOIN posting b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(sa.n_shingles AS INTEGER) AS size_a,
       CAST(sb.n_shingles AS INTEGER) AS size_b,
       round(CAST(i.n_inter AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(CAST(i.n_inter AS DOUBLE)
            / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) >= 0.12
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_ORACLE_JACCARD,
    tags=("dedup", "north-star"),
    doc=(
        "Exact word-3-gram Jaccard similarity join (J >= 0.12): shingle "
        "posting-list equi-join — the relational formulation that scales out."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return jaccard_pairs(docs, threshold=0.12)


_ORACLE_WINNOW = r"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, nt,
         CASE WHEN len(toks) >= 4
              THEN [array_to_string(toks[i:i+3], ' ')
                    for i in range(1, len(toks) - 2)]
              ELSE [] END AS grams
  FROM t
),
h AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(nt, ''), c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS poly_fp,
         list_transform(grams, s ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007)) AS hs
  FROM g
),
w AS (
  SELECT doc_id, poly_fp, len(hs) AS n_kgrams,
         CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
              ELSE list_sort(list_distinct(
                     [list_min(hs[i:i+3])
                      for i in range(1, greatest(len(hs) - 3, 1) + 1)]))
         END AS fps
  FROM h
)
SELECT doc_id, poly_fp, CAST(n_kgrams AS INTEGER) AS n_kgrams,
       CAST(len(fps) AS INTEGER) AS n_fps, fps[1] AS min_fp
FROM w
"""


@register(
    "text_fingerprint_winnow",
    oracle=_ORACLE_WINNOW,
    tags=("text", "dedup", "north-star"),
    doc=(
        "Rolling-hash document fingerprinting (winnowing): char-polynomial "
        "hash of each word 4-gram, min per sliding window of 4 hashes, "
        "distinct minima = fingerprint set. Zero-shuffle per-row compute."
    ),
)
def text_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    return winnow_fingerprints(docs)


@register(
    "dedup_minhash_lsh",
    oracle=None,
    tags=("dedup", "north-star", "approx"),
    doc=(
        "MinHash(64)+LSH(16 bands) near-dup pairs with estimated Jaccard >= "
        "0.3. Rows-only: hash-family specific; semantics pinned by unit test "
        "against exact Jaccard."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_near_dup(docs, threshold=0.3)


@register(
    "dedup_simhash",
    oracle=None,
    tags=("dedup", "north-star", "approx"),
    doc=(
        "64-bit SimHash fingerprint per document (hex), shuffle-free "
        "expression-level fold. Rows-only: murmur3-specific."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    return docs.select("doc_id", simhash64("text").alias("simhash"))


@register(
    "dedup_simhash_pairs",
    oracle=None,
    tags=("dedup", "north-star", "approx"),
    doc=(
        "SimHash near-dup pairs (Hamming <= 3) via pigeonhole 16-bit-block "
        "equi-join — exact for radius 3, never all-pairs. Rows-only: "
        "murmur3-specific; blocking recall pinned by unit test."
    ),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_dup

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_dup(docs)


_ORACLE_TFIDF = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df
  FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


@register(
    "text_tfidf_top_terms",
    oracle=_ORACLE_TFIDF,
    tags=("text", "north-star"),
    doc=(
        "TF-IDF top-3 terms per document: token explode -> per-doc TF + "
        "corpus DF aggregations -> idf join -> windowed top-k with "
        "deterministic tie-break. All shuffles key on term/doc — the "
        "classic scale-out formulation."
    ),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    # n_docs stays inside the plan (broadcast 1-row aggregate, same pattern
    # as the entropy queries) — no separate driver count() action.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# Hot-shingle document-frequency cap shared by every capped-generator query
# (see jaccard_pairs_capped): a FRACTION of the corpus with a small-corpus
# floor, not an absolute count — an absolute cap degenerates at scale (once
# corpus growth makes the average shingle df exceed it, every shingle is
# "hot" and all sets empty out; measured in SCALE_PROBE_r03).
_DF_CAP_FRAC = 0.002
_DF_CAP_MIN = 5

_ORACLE_COMPONENTS = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE round(CAST(i.n_inter AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) >= 0.12
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(n, m) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
)
SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
"""

#: Components over the FREQUENCY-CAPPED pair graph — the edge set the
#: scale-safe generator (jaccard_pairs_capped) produces.  Same recursive
#: reach as _ORACLE_COMPONENTS, different pair CTE: hot shingles
#: (df > max(cap_min, ceil(cap_frac·N))) are dropped from every set before
#: the posting join, exactly as the Spark side does.
_ORACLE_COMPONENTS_CAPPED = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
nd AS (
  SELECT greatest({_DF_CAP_MIN}, CAST(ceil({_DF_CAP_FRAC} * COUNT(*)) AS BIGINT)) AS cap
  FROM documents
),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
kept AS (
  SELECT doc_id, shingle FROM posting
  QUALIFY COUNT(DISTINCT doc_id) OVER (PARTITION BY shingle)
          <= (SELECT cap FROM nd)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE round(CAST(i.n_inter AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) >= 0.12
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(n, m) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
)
SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
"""


@register(
    "dedup_cluster_components",
    oracle=_ORACLE_COMPONENTS_CAPPED,
    tags=("dedup", "graph", "north-star"),
    doc=(
        "Near-dup clustering: connected components over the Jaccard>=0.12 "
        "pair graph via iterative min-label propagation (Pregel-style edge "
        "join + min-agg per round, converges in O(diameter)). The dedup "
        "final step: every doc labeled with its cluster's canonical min id. "
        "Recomposed (r8, VERDICT r7 item 1) on the FREQUENCY-CAPPED pair "
        "generator: the naive posting self-join OOMed pair generation at "
        "x64 corpus scale (SCALE_PROBE_r07) while the CC phase itself was "
        "fine — the capped generator bounds per-shingle pair work at cap². "
        "Oracle: DuckDB recursive CTE over the identically-capped edges."
    ),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components, jaccard_pairs_capped

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    ).select("doc_a", "doc_b")
    return connected_components(pairs)


# -- Dedup observability: cluster-size histogram + duplicate mass (r9) --------------

_ORACLE_CLUSTER_HIST = _ORACLE_COMPONENTS_CAPPED.replace(
    "SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n",
    """, labels AS (SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n),
cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
       FROM labels GROUP BY cluster_id),
hist AS (
  SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(size) AS BIGINT) AS n_docs
  FROM cs GROUP BY size
  UNION ALL
  SELECT 1, COUNT(*), COUNT(*)
  FROM documents d LEFT JOIN labels l USING (doc_id)
  WHERE l.doc_id IS NULL
)
SELECT size,
       CAST(SUM(n_clusters) AS BIGINT) AS n_clusters,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_docs) - SUM(n_clusters) AS BIGINT) AS excess_docs
FROM hist GROUP BY size ORDER BY size""",
).replace("reach(n, m) AS (", "reach(n, m) AS (", 1)


@register(
    "dedup_cluster_size_histogram",
    oracle=_ORACLE_CLUSTER_HIST,
    tags=("dedup", "graph", "north-star"),
    doc=(
        "Dedup OBSERVABILITY: the cluster-size distribution of the "
        "near-dup graph — per size, how many clusters, how many documents "
        "they hold, and the excess (docs dedup would remove = n_docs - "
        "n_clusters); singletons (docs in no near-dup pair) fold into the "
        "size-1 bucket via one anti-join.  This is the report read BEFORE "
        "committing a dedup pass: total excess = corpus shrinkage, a "
        "heavy tail at large sizes = template/boilerplate families worth "
        "inspecting.  Composes the capped pair generator + star "
        "components; the histogram aggregate is cluster-count-bounded.  "
        "Oracle: the recursive-CTE components oracle wrapped with the "
        "identical size/histogram aggregation."
    ),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components_star, jaccard_pairs_capped

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    ).select("doc_a", "doc_b")
    labels, _rounds = connected_components_star(pairs)
    cs = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    hist = cs.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("size").cast("bigint").alias("n_docs"),
    )
    singletons = (
        docs.join(labels, docs.doc_id == labels.doc_id, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.lit(1).cast("bigint").alias("size"),
            F.col("n").alias("n_clusters"),
            F.col("n").alias("n_docs"),
        )
    )
    return (
        hist.unionByName(singletons)
        .groupBy("size")
        .agg(
            F.sum("n_clusters").cast("bigint").alias("n_clusters"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            (F.sum("n_docs") - F.sum("n_clusters"))
            .cast("bigint")
            .alias("excess_docs"),
        )
        .orderBy("size")
    )


# -- Cross-document duplicated substrings (exact substring-dedup signal) -------

_GRAM_LEN = 50

_ORACLE_SUBSTR_DUP = f"""
WITH grams AS (
  SELECT doc_id,
         md5(substr(text, CAST(i AS INTEGER), {_GRAM_LEN})) AS g
  FROM documents,
       unnest(range(1, greatest(length(text) - {_GRAM_LEN} + 1, 1) + 1)) AS t(i)
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT gr.doc_id,
       COUNT(*) AS n_grams,
       COUNT(d.g) AS n_dup_grams
FROM grams gr LEFT JOIN dup d ON gr.g = d.g
GROUP BY gr.doc_id
ORDER BY gr.doc_id
"""


@register(
    "text_substring_dup_spans",
    oracle=_ORACLE_SUBSTR_DUP,
    tags=("text", "dedup", "north-star"),
    doc=(
        f"Exact substring-level duplication signal (the train-set memorization "
        f"risk detector): every {_GRAM_LEN}-char sliding window is hashed "
        "(md5 — cross-engine), windows appearing in >1 distinct document "
        "are flagged, and each document reports total vs duplicated window "
        "counts. Gram generation is JVM-side sequence+transform+explode "
        "(no Python); the dup set is found by hash aggregate and joined "
        "back posting-list style on the hash — never all-pairs, and the "
        "join key is a fixed-width digest, not the raw substring. At 100 TB "
        "add a stride and/or winnowing pre-filter (text_fingerprint_winnow) "
        "to bound gram volume."
    ),
)
def text_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {_GRAM_LEN} + 1, 1)),"
                f" i -> md5(substring(text, i, {_GRAM_LEN})))"
            )
        ).alias("g"),
    )
    # consumed twice (dup-set aggregate + join back): persist so the
    # 50-char-window md5 explosion is computed once
    grams = grams.persist()
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("g", F.lit(1).alias("is_dup"))
    )
    return (
        grams.join(dup, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_dup").alias("n_dup_grams"),
        )
        .orderBy("doc_id")
    )


# -- BPE pair statistics (one vocab-induction iteration) -----------------------

_ORACLE_BPE_PAIRS = """
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
  FROM documents
),
freq AS (SELECT w, COUNT(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, f
  FROM freq, unnest(range(1, length(w))) AS t(i)
)
SELECT pair, CAST(SUM(f) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 200
"""


@register(
    "corpus_bpe_pair_stats",
    oracle=_ORACLE_BPE_PAIRS,
    tags=("text", "tokenizer", "north-star"),
    doc=(
        "BPE vocabulary-induction statistics (the counting core of one "
        "merge iteration): adjacent character-pair frequencies within "
        "words, weighted by word frequency. Aggregating the WORD-FREQUENCY "
        "table first (classic BPE trick) shrinks the pair-explosion input "
        "from corpus scale to vocabulary scale — the pair explode runs "
        "over |vocab| rows, not |tokens|. Top-200 by (count, pair) total "
        "order."
    ),
)
def corpus_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    ).where(F.length("w") >= 2)
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    pairs = freq.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(200)
    )


@register(
    "dedup_jaccard_prefix_filter",
    oracle=_ORACLE_JACCARD.replace("0.12", "0.8"),
    tags=("dedup", "north-star", "scale"),
    doc=(
        "PREFIX-FILTERED exact Jaccard join (ppjoin-style, J >= 0.8 — the "
        "high-threshold regime where prefix filtering earns its keep: the "
        "lossless prefix is ~1-t of each shingle list, so ~80% of posting "
        "volume, including every hot frequent-token bucket, never reaches "
        "the candidate shuffle): shingles ordered rarest-first by document "
        "frequency locally per doc, prefix tokens equi-join into "
        "candidates, exact array_intersect verifies. Oracle: the naive "
        "all-posting join at the same threshold."
    ),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_jaccard_pairs

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return prefix_jaccard_pairs(docs, threshold=0.8)


# -- Sorted-neighborhood dedup blocking ----------------------------------------

_SN_WINDOW = 3  # neighbors ahead considered per sorted position

_ORACLE_SORTED_NEIGHBORHOOD = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, norm, substr(norm, 1, 2) AS blk,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
ordered AS (
  SELECT doc_id, blk, shingles,
         ROW_NUMBER() OVER (PARTITION BY blk ORDER BY norm, doc_id) AS pos
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.shingles AS sh_a, b.shingles AS sh_b
  FROM ordered a JOIN ordered b
    ON a.blk = b.blk
   AND b.pos > a.pos AND b.pos <= a.pos + {_SN_WINDOW}
)
SELECT LEAST(doc_a, doc_b) AS doc_a,
       GREATEST(doc_a, doc_b) AS doc_b,
       CAST(len(list_intersect(sh_a, sh_b)) AS BIGINT) AS n_inter,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))),
             6) AS jaccard
FROM cand
WHERE round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))),
            6) >= 0.12
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_sorted_neighborhood",
    oracle=_ORACLE_SORTED_NEIGHBORHOOD,
    tags=("dedup", "north-star"),
    doc=(
        f"Sorted-neighborhood dedup blocking (the 4th candidate-generation "
        "family next to LSH banding, SimHash pigeonhole, and prefix "
        "filtering): docs sort by normalized text WITHIN 2-char prefix "
        f"blocks, each doc pairs with its next {_SN_WINDOW} sorted "
        "neighbors, candidates verify by exact shingle Jaccard (>= 0.12). "
        "The sort is per-block (prefix-partitioned shuffle, no global "
        "order); candidate count is window-bounded at |docs| * w — linear, "
        "not quadratic."
    ),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.dedup import spread
    from ..operators.text import normalize_ws
    from ..operators.dedup import word_shingles

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = spread(docs, "doc_id").select(
        "doc_id",
        normalize_ws("text").alias("norm"),
        word_shingles("text", 3).alias("shingles"),
    ).withColumn("blk", F.substring("norm", 1, 2))
    ordered = sh.withColumn(
        "pos", F.row_number().over(W.partitionBy("blk").orderBy("norm", "doc_id"))
    )
    a = ordered.select(
        F.col("blk"),
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("pos").alias("pos_a"),
    )
    b = ordered.select(
        F.col("blk"),
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("pos").alias("pos_b"),
    )
    cand = a.join(
        b,
        (a.blk == b.blk)
        & (F.col("pos_b") > F.col("pos_a"))
        & (F.col("pos_b") <= F.col("pos_a") + _SN_WINDOW),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            inter.cast("long").alias("n_inter"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.12)
        .orderBy("doc_a", "doc_b")
    )


# -- Canonical-document selection per near-dup cluster -------------------------

_ORACLE_CANONICAL = (
    _ORACLE_COMPONENTS_CAPPED.replace(
        "SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n",
        """, comp AS (SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n),
labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM labeled
)
SELECT doc_id, cluster_id,
       MIN(CASE WHEN rn = 1 THEN doc_id END)
         OVER (PARTITION BY cluster_id) AS canonical_id,
       CAST(rn = 1 AS BOOLEAN) AS keep
FROM ranked
ORDER BY doc_id""",
    )
)


@register(
    "dedup_canonical_selection",
    oracle=_ORACLE_CANONICAL,
    tags=("dedup", "north-star"),
    doc=(
        "Canonical-document selection — the final emit step of the dedup "
        "pipeline: near-dup clusters (connected components over the "
        "Jaccard>=0.12 pair graph) plus singleton docs, each cluster "
        "keeping its best representative (longest text, doc_id "
        "tie-break); every document labeled (cluster_id, canonical_id, "
        "keep). Selection is one per-cluster window over bounded cluster "
        "sizes; singletons join in via left join, no extra pass. "
        "Recomposed (r8) on the frequency-capped pair generator like the "
        "components queries — same oracle shape over capped edges."
    ),
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.dedup import connected_components, jaccard_pairs_capped

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    pairs = jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    labeled = (
        docs.join(comp.withColumnRenamed("doc_id", "cid_doc"),
                  docs.doc_id == F.col("cid_doc"), "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            "n_chars",
        )
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    return ranked.select(
        "doc_id",
        "cluster_id",
        F.min(F.when(F.col("rn") == 1, F.col("doc_id")))
        .over(W.partitionBy("cluster_id"))
        .alias("canonical_id"),
        (F.col("rn") == 1).alias("keep"),
    ).orderBy("doc_id")


# -- Language-ID confusion matrix ----------------------------------------------

_ORACLE_LANG_CONFUSION = (
    "WITH pred AS ("
    + _ORACLE_LANG_ID.replace("WITH t AS", "WITH t AS").strip()
    + """
)
SELECT true_lang, pred_lang, COUNT(*) AS n_docs
FROM pred
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""
)


@register(
    "text_lang_confusion_matrix",
    oracle=_ORACLE_LANG_CONFUSION,
    tags=("text", "quality", "ml"),
    doc=(
        "Language-ID confusion matrix (true x predicted counts) — the "
        "classifier-evaluation rollup over text_lang_id's per-doc "
        "predictions; one extra hash aggregate on the scored stream."
    ),
)
def text_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    return (
        predict_lang(docs)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# -- Asymmetric containment (doc-in-doc duplication) --------------------------

_ORACLE_CONTAINMENT = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM posting a JOIN posting b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(sa.n_shingles AS INTEGER) AS size_a,
       CAST(sb.n_shingles AS INTEGER) AS size_b,
       round(CAST(i.n_inter AS DOUBLE) / sa.n_shingles, 6) AS cont_a,
       round(CAST(i.n_inter AS DOUBLE) / sb.n_shingles, 6) AS cont_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE greatest(round(CAST(i.n_inter AS DOUBLE) / sa.n_shingles, 6),
               round(CAST(i.n_inter AS DOUBLE) / sb.n_shingles, 6)) >= 0.4
"""


@register(
    "dedup_containment_pairs",
    oracle=_ORACLE_CONTAINMENT,
    tags=("dedup", "north-star"),
    doc=(
        "Asymmetric shingle-containment join (max(|A∩B|/|A|, |A∩B|/|B|) "
        ">= 0.4): catches doc-in-doc duplication — quotes, boilerplate "
        "wrappers, near-supersets — that symmetric Jaccard misses (a chunk "
        "fully embedded in a much larger page scores J~0 but containment "
        "1.0). Same posting-list equi-join scale shape as the Jaccard "
        "join: the only row-scale shuffle is on the shingle key."
    ),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return containment_pairs(docs, threshold=0.4)


# -- Winnowed substring duplication (the bounded-volume 100 TB variant) -------

_WINNOW_W = 8  # window of consecutive gram hashes per fingerprint pick

_ORACLE_SUBSTR_WINNOW = f"""
WITH hs AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(length(text) - {_GRAM_LEN} + 1, 1) + 1),
           i -> md5(substr(text, CAST(i AS INTEGER), {_GRAM_LEN}))) AS h
  FROM documents
),
fps AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(h) - {_WINNOW_W} + 1, 1) + 1),
           j -> list_min(h[j : j + {_WINNOW_W} - 1]))) AS fps
  FROM hs
),
posting AS (
  SELECT doc_id, unnest(fps) AS fp FROM fps
),
dup AS (
  SELECT fp FROM posting GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT p.doc_id,
       COUNT(*) AS n_fps,
       COUNT(d.fp) AS n_dup_fps
FROM posting p LEFT JOIN dup d ON p.fp = d.fp
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


@register(
    "text_substring_dup_winnow",
    oracle=_ORACLE_SUBSTR_WINNOW,
    tags=("text", "dedup", "north-star", "sketch"),
    doc=(
        f"Substring-duplication signal at BOUNDED gram volume — the 100 TB "
        f"variant of text_substring_dup_spans: instead of shuffling every "
        f"{_GRAM_LEN}-char window hash, each document winnows its ordered "
        f"hash stream (min of every {_WINNOW_W} consecutive hashes, "
        f"distinct) so ~2/{_WINNOW_W} of the volume reaches the shuffle, "
        f"while the winnowing guarantee keeps detection LOSSLESS for any "
        f"cross-document span of >= {_GRAM_LEN + _WINNOW_W - 1} chars "
        "(two equal substrings that long share an identical hash window, "
        "hence the same selected minimum). Selection is deterministic, so "
        "the whole result is value-exact against DuckDB running the same "
        "winnow."
    ),
)
def text_substring_dup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = spread(docs, "doc_id")  # explicit width: see spread()
    hs = F.expr(
        f"transform(sequence(1, greatest(length(text) - {_GRAM_LEN} + 1, 1)),"
        f" i -> md5(substring(text, i, {_GRAM_LEN})))"
    )
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(_hs) - {_WINNOW_W} + 1, 1)),"
            f" j -> array_min(slice(_hs, j, {_WINNOW_W})))"
        )
    )
    posting = (
        docs.select("doc_id", hs.alias("_hs"))
        .select("doc_id", F.explode(fps).alias("fp"))
        .persist()
    )
    dup = (
        posting.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("fp", F.lit(1).alias("is_dup"))
    )
    return (
        posting.join(dup, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.count("is_dup").alias("n_dup_fps"),
        )
        .orderBy("doc_id")
    )


# -- Containment join via prefix filtering (high-threshold scale path) --------

_ORACLE_CONTAINMENT_PREFIX = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM posting a JOIN posting b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(sa.n_shingles AS INTEGER) AS size_a,
       CAST(sb.n_shingles AS INTEGER) AS size_b,
       round(CAST(i.n_inter AS DOUBLE) / sa.n_shingles, 6) AS cont_a,
       round(CAST(i.n_inter AS DOUBLE) / sb.n_shingles, 6) AS cont_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE)
      >= 0.8 * least(sa.n_shingles, sb.n_shingles)
"""


@register(
    "dedup_containment_prefix_filter",
    oracle=_ORACLE_CONTAINMENT_PREFIX,
    tags=("dedup", "north-star"),
    doc=(
        "Containment join at the high-threshold regime (n_inter >= "
        "0.8*min(|A|,|B|)) via PREFIX FILTERING: only the smaller side's "
        "~20% md5-order prefix joins the other side's full postings "
        "(pigeonhole: at most |S|-ceil(0.8|S|) of S's shingles can miss a "
        "qualifying partner, so any |S|-ceil(0.8|S|)+1 of them contain a "
        "hit), then exact array_intersect verifies — lossless, same result "
        "as the naive posting self-join which the oracle runs. The "
        "shuffled candidate volume drops ~5x; like the Jaccard prefix "
        "join, run the naive form (dedup_containment_pairs) at low "
        "thresholds where the prefix is most of the doc anyway."
    ),
)
def dedup_containment_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_prefix_pairs

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return containment_prefix_pairs(docs, threshold=0.8)


# -- Frequency-capped Jaccard (hot-shingle mitigation as code) ----------------

#: The cap constants (_DF_CAP_FRAC / _DF_CAP_MIN) are defined next to
#: _ORACLE_COMPONENTS above: since r8 the components/canonical family
#: shares them.  Rationale (why a FRACTION, not an absolute count):
#: measured in SCALE_PROBE_r03 — 110 pairs at x1 and 0 at x4+ with the
#: old `df > 10`, because corpus growth made the whole vocabulary "hot".
_ORACLE_JACCARD_CAPPED = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS shingles
  FROM t
),
nd AS (
  SELECT greatest({_DF_CAP_MIN}, CAST(ceil({_DF_CAP_FRAC} * COUNT(*)) AS BIGINT)) AS cap
  FROM documents
),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
kept AS (
  SELECT doc_id, shingle FROM posting
  QUALIFY COUNT(DISTINCT doc_id) OVER (PARTITION BY shingle)
          <= (SELECT cap FROM nd)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(sa.n_shingles AS INTEGER) AS size_a,
       CAST(sb.n_shingles AS INTEGER) AS size_b,
       round(CAST(i.n_inter AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(CAST(i.n_inter AS DOUBLE)
            / (sa.n_shingles + sb.n_shingles - i.n_inter), 6) >= 0.12
"""


@register(
    "dedup_ngram_jaccard_capped",
    oracle=_ORACLE_JACCARD_CAPPED,
    tags=("dedup", "north-star", "skew"),
    doc=(
        "Jaccard near-dup over FREQUENCY-CAPPED shingle sets: shingles "
        f"appearing in more than max({_DF_CAP_MIN}, {_DF_CAP_FRAC:.1%} of "
        "documents) — boilerplate, stop phrases — are dropped from every "
        "document's set before pair generation, so per-shingle pair work "
        "is bounded by cap² no matter how hot the phrase: the skew "
        "mitigation SCALE.md prescribes for the posting-join family, as "
        "code. The cap is a df FRACTION (scale-stable: an absolute cap "
        "empties every set once corpus growth makes the whole vocabulary "
        "hot — measured in SCALE_PROBE_r03). Pair generation aggregates "
        "each cold shingle's ≤cap posting list and expands i<j pairs "
        "locally — one shuffle of the postings, never a posting self-join, "
        "and no broadcast of the (possibly huge at 100 TB) hot set. "
        "Semantics are deterministic (similarity over the capped sets, "
        "sizes and intersections consistently capped), so the whole "
        "result is value-exact against SQL."
    ),
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_capped

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    )


# -- Vocabulary coverage curve (tokenizer sizing) -----------------------------

_ORACLE_VOCAB_COVERAGE = """
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE len(trim(text)) > 0
),
freq AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY token
),
ranked AS (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk,
         SUM(n) OVER (ORDER BY n DESC, token
                      ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER () AS total_n
  FROM freq
)
SELECT v.vocab_size,
       CAST(MAX(r.cum_n) AS BIGINT) AS n_covered,
       CAST(MAX(r.total_n) AS BIGINT) AS total_tokens,
       round(CAST(MAX(r.cum_n) AS DOUBLE) / MAX(r.total_n), 6) AS coverage
FROM (SELECT unnest([8, 16, 24]) AS vocab_size) v
JOIN ranked r ON r.rk <= v.vocab_size
GROUP BY v.vocab_size
ORDER BY v.vocab_size
"""


@register(
    "corpus_vocab_coverage",
    oracle=_ORACLE_VOCAB_COVERAGE,
    tags=("text", "training", "tokenizer"),
    doc=(
        "Vocabulary coverage curve for tokenizer sizing: token frequencies "
        "-> rank by (freq desc, token) -> cumulative corpus share at "
        "candidate vocab sizes (8/16/24) — i.e. the OOV rate a vocab of "
        "that size would leave. Corpus-scale work is ONE map-side- "
        "combinable token count; ranking and the running sum act on the "
        "vocabulary-bounded table (the global window never sees corpus-"
        "scale rows). The candidate sizes join is a broadcast over the "
        "ranked vocab."
    ),
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.where(F.length(F.trim("text")) > 0)
        .select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    order = [F.col("n").desc(), F.col("token")]
    ranked = freq.select(
        "token",
        "n",
        F.row_number().over(W.orderBy(*order)).alias("rk"),
        F.sum("n")
        .over(W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0))
        .alias("cum_n"),
        F.sum("n").over(W.partitionBy()).alias("total_n"),
    )
    sizes = spark.range(1, 4).select(
        (F.col("id") * 8).cast("int").alias("vocab_size")
    )
    return (
        ranked.join(
            F.broadcast(sizes), F.col("rk") <= F.col("vocab_size"), "inner"
        )
        .groupBy("vocab_size")
        .agg(
            F.max("cum_n").cast("long").alias("n_covered"),
            F.max("total_n").cast("long").alias("total_tokens"),
            F.round(
                F.max("cum_n").cast("double") / F.max("total_n"), 6
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


# -- WordPiece tokenizer application ------------------------------------------

#: WordPiece vocabulary: start pieces match only at word start, "##"
#: continuation pieces only mid-word.  Deliberately includes greedy traps
#: (##t vs ##tch, va vs val) and omits 'q' entirely so 'query' exercises
#: the whole-word [UNK] rule.  One constant feeds BOTH the Spark encoder
#: and the generated DuckDB oracle — they cannot drift.
_WP_VOCAB: tuple[str, ...] = tuple(
    [c for c in "abcdfghjklmoprstvw"]
    + ["##" + c for c in "abcdefghijklmnoprstuvwxyz"]
    + [
        "jo", "##in", "ha", "##sh", "ba", "##tch", "sc", "##an",
        "cu", "##stomer", "co", "##lumn", "fi", "##lter", "sm", "##all",
        "me", "##rge", "sl", "##ow", "or", "##der", "ve", "##ctor",
        "li", "##ne", "da", "##ta", "ta", "##ble", "va", "val", "##ue",
        "key", "st", "##ream", "wi", "##ndow", "sp", "##ark", "gr",
        "##oup", "pa", "##rt", "bi", "##g", "so", "fa", "##st", "th",
        "##e", "du", "##p", "row", "agg", "##t",
    ]
)
_WP_SET = frozenset(_WP_VOCAB)

_ORACLE_WORDPIECE = f"""
WITH RECURSIVE
vocab(piece) AS (VALUES {", ".join("('" + p + "')" for p in sorted(_WP_SET))}),
w0 AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
wcnt AS (
  SELECT word, COUNT(*) AS n_occurrences FROM w0 WHERE word <> ''
  GROUP BY word
),
words AS (SELECT word FROM wcnt),
cand AS (
  SELECT w.word, CAST(t.pos AS INTEGER) AS pos, v.piece,
         CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2
              ELSE length(v.piece) END AS consumed
  FROM words w,
       unnest(range(1, length(w.word) + 1)) AS t(pos),
       vocab v
  WHERE (t.pos = 1 AND v.piece NOT LIKE '##%'
         AND substr(w.word, 1, length(v.piece)) = v.piece)
     OR (t.pos > 1 AND v.piece LIKE '##%'
         AND substr(w.word, CAST(t.pos AS INTEGER), length(v.piece) - 2)
             = substr(v.piece, 3))
),
best AS (
  SELECT word, pos, MAX_BY(piece, consumed) AS piece,
         MAX(consumed) AS consumed
  FROM cand GROUP BY word, pos
),
walk AS (
  SELECT word, 1 AS pos, 0 AS n_wp, CAST('' AS VARCHAR) AS pieces,
         FALSE AS is_unk
  FROM words
  UNION ALL
  SELECT s.word,
         CASE WHEN b.piece IS NULL THEN length(s.word) + 1
              ELSE s.pos + b.consumed END,
         CASE WHEN b.piece IS NULL THEN 1 ELSE s.n_wp + 1 END,
         CASE WHEN b.piece IS NULL THEN '[UNK]'
              WHEN s.pieces = '' THEN b.piece
              ELSE s.pieces || ' ' || b.piece END,
         s.is_unk OR b.piece IS NULL
  FROM walk s LEFT JOIN best b ON b.word = s.word AND b.pos = s.pos
  WHERE s.pos <= length(s.word)
),
tok AS (
  SELECT word, n_wp, pieces, CAST(is_unk AS INT) AS unk
  FROM walk WHERE pos = length(word) + 1
)
SELECT c.word, t.pieces, CAST(t.n_wp AS BIGINT) AS n_wp, t.unk,
       CAST(c.n_occurrences AS BIGINT) AS n_occurrences
FROM wcnt c JOIN tok t ON c.word = t.word
ORDER BY c.word
"""


@register(
    "corpus_wordpiece_tokenize",
    oracle=_ORACLE_WORDPIECE,
    tags=("text", "tokenizer", "north-star"),
    doc=(
        "WordPiece tokenizer APPLICATION (greedy longest-match-first, "
        "'##' continuation pieces, whole-word [UNK] on any dead end — "
        "the BERT inference-side algorithm): every distinct corpus word "
        "is encoded against a fixed vocabulary and joined back to its "
        "occurrence count. The scale trick is the same one BPE counting "
        "uses: tokenize the DISTINCT-WORD table (vocabulary-scale, here "
        "31 rows; bounded by |vocab| at any corpus size), never the "
        "token stream — the corpus-scale work is one word-count hash "
        "aggregate, and the encoded vocab broadcasts back onto it. The "
        "Python encoder runs only on the distinct words (Arrow-batched "
        "mapInPandas). Oracle: a recursive-CTE walk over a "
        "precomputed (word, pos) -> longest-piece table, generated from "
        "the SAME vocabulary constant, verifying exact piece sequences, "
        "token counts, and the [UNK] rule."
    ),
)
def corpus_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    wcnt = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )

    def encode_batches(batches):
        def enc(word: str):
            pos, out, n = 0, [], len(word)
            while pos < n:
                for ln in range(n - pos, 0, -1):
                    piece = (
                        word[pos : pos + ln]
                        if pos == 0
                        else "##" + word[pos : pos + ln]
                    )
                    if piece in _WP_SET:
                        out.append(piece)
                        pos += ln
                        break
                else:
                    return "[UNK]", 1, 1
            return " ".join(out), len(out), 0
        for pdf in batches:
            enc_cols = pdf["word"].map(enc)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": enc_cols.map(lambda t: t[0]),
                    "n_wp": enc_cols.map(lambda t: t[1]).astype("int64"),
                    "unk": enc_cols.map(lambda t: t[2]).astype("int32"),
                }
            )

    vocab_tok = wcnt.select("word").mapInPandas(
        encode_batches, "word string, pieces string, n_wp long, unk int"
    )
    return (
        wcnt.join(F.broadcast(vocab_tok), "word")
        .select("word", "pieces", "n_wp", "unk", "n_occurrences")
        .orderBy("word")
    )


# Unigram-LM piece vocabulary: (piece, log-prob in integer micro-nats).
# Single characters guarantee total coverage (no [UNK] path); multi-char
# pieces carry higher probability so Viterbi prefers them when they fit.
_UNI_VOCAB: tuple[tuple[str, int], ...] = tuple(
    [(c, -3_000_000) for c in "abcdefghijklmnopqrstuvwxyz"]
    + [
        ("ta", -1_600_000), ("ble", -2_000_000), ("sc", -1_700_000),
        ("an", -1_400_000), ("row", -1_900_000), ("er", -1_300_000),
        ("st", -1_500_000), ("re", -1_450_000), ("am", -1_550_000),
        ("ff", -1_800_000), ("le", -1_350_000), ("in", -1_380_000),
        ("dow", -2_100_000), ("sh", -1_620_000), ("ue", -1_460_000),
        ("or", -1_330_000), ("val", -2_050_000), ("ch", -1_640_000),
        ("ash", -2_150_000), ("ar", -1_370_000), ("pa", -1_610_000),
        ("der", -2_060_000), ("lim", -2_070_000), ("it", -1_340_000),
    ]
)

_ORACLE_UNIGRAM = f"""
WITH RECURSIVE
vocab(piece, lp) AS (VALUES
  {", ".join(f"('{p}', {lp})" for p, lp in _UNI_VOCAB)}),
w0 AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
wcnt AS (
  SELECT word, COUNT(*) AS n_occurrences FROM w0 WHERE word <> ''
  GROUP BY word
),
walk AS (
  SELECT word, 1 AS pos, CAST(0 AS BIGINT) AS score,
         CAST('' AS VARCHAR) AS pieces
  FROM wcnt
  UNION ALL
  SELECT s.word, s.pos + length(v.piece), s.score + v.lp,
         CASE WHEN s.pieces = '' THEN v.piece
              ELSE s.pieces || ' ' || v.piece END
  FROM walk s JOIN vocab v
    ON substr(s.word, s.pos, length(v.piece)) = v.piece
  WHERE s.pos <= length(s.word)
),
fin AS (SELECT word, score, pieces FROM walk
        WHERE pos = length(word) + 1),
best AS (SELECT word, MAX(score) AS score_micro FROM fin GROUP BY word),
pick AS (
  SELECT f.word, b.score_micro, MIN(f.pieces) AS pieces
  FROM fin f JOIN best b ON f.word = b.word AND f.score = b.score_micro
  GROUP BY f.word, b.score_micro
)
SELECT c.word, p.pieces,
       CAST(length(p.pieces) - length(replace(p.pieces, ' ', '')) + 1
            AS BIGINT) AS n_pieces,
       p.score_micro,
       CAST(c.n_occurrences AS BIGINT) AS n_occurrences
FROM wcnt c JOIN pick p ON c.word = p.word
ORDER BY c.word
"""


@register(
    "corpus_unigram_lm_tokenize",
    oracle=_ORACLE_UNIGRAM,
    tags=("text", "tokenizer", "north-star"),
    doc=(
        "Unigram-LM tokenizer APPLICATION (SentencePiece's inference "
        "algorithm, completing the tokenizer trio next to corpus_bpe_apply "
        "and corpus_wordpiece_tokenize): each word takes the segmentation "
        "maximizing the sum of piece log-probabilities, found by Viterbi "
        "DP from the right (ties -> lexicographically smallest piece "
        "sequence, a total order). Log-probs are integer micro-nats, so "
        "scores are exact BIGINT sums. Same distinct-word scale trick: "
        "the Python DP (Arrow-batched mapInPandas) touches only the "
        "vocabulary-scale word table; corpus-scale work is one hash "
        "aggregate. Oracle: a recursive CTE enumerates EVERY segmentation "
        "(words are short; pieces cover all single chars so no dead ends) "
        "and picks max-score/min-string — a cross-algorithm differential "
        "(exhaustive enumeration vs DP) on identical integer scores."
    ),
)
def corpus_unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    pin_query_session_conf(spark)
    vocab = dict(_UNI_VOCAB)
    max_len = max(len(p) for p in vocab)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    wcnt = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )

    def viterbi_batches(batches):
        def seg(word: str):
            n = len(word)
            # best[(pos)] = (score, pieces-string) from pos to end;
            # compare (-score, string) for max-score-then-min-string
            best: list[tuple[int, str] | None] = [None] * (n + 1)
            best[n] = (0, "")
            for pos in range(n - 1, -1, -1):
                cand = None
                for ln in range(1, min(max_len, n - pos) + 1):
                    piece = word[pos : pos + ln]
                    lp = vocab.get(piece)
                    if lp is None or best[pos + ln] is None:
                        continue
                    s_suf, p_suf = best[pos + ln]
                    c = (
                        lp + s_suf,
                        piece + (" " + p_suf if p_suf else ""),
                    )
                    if (
                        cand is None
                        or c[0] > cand[0]
                        or (c[0] == cand[0] and c[1] < cand[1])
                    ):
                        cand = c
                best[pos] = cand
            if best[0] is None:
                # word not segmentable with this vocabulary (e.g. non-ASCII
                # characters): DROP it, matching the oracle's inner join on
                # completed walks — previously this crashed the kernel on
                # unicode words (r8 degenerate-fixture2 differ)
                return None
            score, pieces = best[0]
            return pieces, pieces.count(" ") + 1, score

        for pdf in batches:
            cols = pdf["word"].map(seg)
            keep = cols.notna()
            cols, words = cols[keep], pdf["word"][keep]
            yield pd.DataFrame(
                {
                    "word": words,
                    "pieces": cols.map(lambda t: t[0]),
                    "n_pieces": cols.map(lambda t: t[1]).astype("int64"),
                    "score_micro": cols.map(lambda t: t[2]).astype("int64"),
                }
            )

    vocab_tok = wcnt.select("word").mapInPandas(
        viterbi_batches,
        "word string, pieces string, n_pieces long, score_micro long",
    )
    return (
        wcnt.join(F.broadcast(vocab_tok), "word")
        .select("word", "pieces", "n_pieces", "score_micro", "n_occurrences")
        .orderBy("word")
    )


_ORACLE_NOVELTY = r"""
WITH grams AS (
  SELECT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM documents WHERE length(trim(text)) > 0) t,
       unnest(range(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 3
),
per_doc AS (SELECT DISTINCT doc_id, g FROM grams),
df AS (SELECT g, COUNT(*) AS df FROM per_doc GROUP BY g)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(floor(1000000.0 * SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                  / COUNT(*)) AS BIGINT) AS novelty_ppm
FROM per_doc p JOIN df USING (g)
GROUP BY p.doc_id ORDER BY p.doc_id
"""


@register(
    "text_ngram_novelty_score",
    oracle=_ORACLE_NOVELTY,
    tags=("text", "quality", "dedup"),
    doc=(
        "Leave-one-out 3-gram novelty per document: the fraction of a "
        "doc's distinct trigrams appearing in NO other document "
        "(document frequency 1) — high novelty flags unique content "
        "worth keeping, low novelty flags near-boilerplate that the "
        "pairwise dedup family then resolves; it is the cheap corpus-"
        "level complement to MinHash (one df aggregate instead of a "
        "pair join). Trigrams come from a pure array expression, the "
        "df table is one hash aggregate on the gram key, and the score "
        "joins back on the same key — integer ppm, no float crosses "
        "the oracle."
    ),
)
def text_ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    grams = (
        docs.select(
            "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("w")
        )
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), i -> "
                    "concat_ws(' ', w[i], w[i + 1], w[i + 2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.floor(
                F.lit(1000000.0) * F.col("n_novel") / F.col("n_grams")
            )
            .cast("bigint")
            .alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


_ORACLE_KEYNESS = r"""
WITH toks AS (
  SELECT source = 'src0' AS in_target,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
c AS (
  SELECT w,
         CAST(SUM(CASE WHEN in_target THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN in_target THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM toks WHERE w <> '' GROUP BY w
),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM c)
SELECT c.w, c.a, c.b,
       -- Dunning G2 = 2*(a*ln(a/E1) + b*ln(b/E2)), E_i the expected counts
       -- under homogeneity; zero-count terms contribute 0 by convention
       round(2.0 * (
         CASE WHEN c.a = 0 THEN 0.0
              ELSE c.a * ln(CAST(c.a AS DOUBLE)
                   / (CAST(c.a + c.b AS DOUBLE) * t.na / (t.na + t.nb)))
         END
         + CASE WHEN c.b = 0 THEN 0.0
                ELSE c.b * ln(CAST(c.b AS DOUBLE)
                     / (CAST(c.a + c.b AS DOUBLE) * t.nb / (t.na + t.nb)))
           END), 4) AS g2
FROM c, t
ORDER BY g2 DESC, c.w LIMIT 30
"""


@register(
    "corpus_keyness_loglikelihood",
    oracle=_ORACLE_KEYNESS,
    tags=("corpus", "text", "stats"),
    doc=(
        "Dunning log-likelihood keyness (G2): which words distinguish "
        "one source's documents from the rest of the corpus — the "
        "corpus-linguistics statistic behind domain-signature reports "
        "and drift detection between corpus slices (more robust than "
        "raw frequency ratios at small counts). One token count "
        "aggregate with a conditional split, one scalar totals "
        "broadcast, G2 as a single per-row float expression over exact "
        "integers (zero-count terms contribute 0 by the standard "
        "convention), top-30 by (G2, word). Same plan shape at any "
        "corpus size: explode -> hash agg -> TakeOrdered."
    ),
)
def corpus_keyness_loglikelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        (F.col("source") == "src0").alias("in_target"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    c = toks.groupBy("w").agg(
        F.sum(F.when(F.col("in_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("in_target"), 0).otherwise(1))
        .cast("bigint")
        .alias("b"),
    )
    t = c.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ab = (F.col("a") + F.col("b")).cast("double")
    term_a = F.when(F.col("a") == 0, F.lit(0.0)).otherwise(
        a * F.log(a / (ab * na / (na + nb)))
    )
    term_b = F.when(F.col("b") == 0, F.lit(0.0)).otherwise(
        b * F.log(b / (ab * nb / (na + nb)))
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "w", "a", "b",
            F.round(F.lit(2.0) * (term_a + term_b), 4).alias("g2"),
        )
        .orderBy(F.desc("g2"), "w")
        .limit(30)
    )


_ORACLE_BURSTINESS = r"""
WITH counts AS (
  SELECT doc_id, w, COUNT(*) AS c FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
    FROM documents WHERE length(trim(text)) > 0
  ) WHERE w <> '' GROUP BY doc_id, w
),
n_docs AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM counts),
stats AS (
  SELECT w,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY w
)
SELECT s.w, s.df, s.s1 AS total_count,
       -- variance-to-mean ratio over ALL docs (zeros included): exact
       -- moments -> (nd*s2 - s1^2) / (nd * s1)
       round((CAST(n.nd AS DOUBLE) * s.s2 - CAST(s.s1 AS DOUBLE) * s.s1)
             / (CAST(n.nd AS DOUBLE) * s.s1), 6) AS burstiness_vmr
FROM stats s, n_docs n
WHERE s.s1 >= 50
ORDER BY burstiness_vmr DESC, s.w LIMIT 30
"""


@register(
    "corpus_word_burstiness",
    oracle=_ORACLE_BURSTINESS,
    tags=("corpus", "text", "stats"),
    doc=(
        "Word burstiness (variance-to-mean ratio of per-document counts, "
        "zeros included): VMR ~ 1 marks Poisson-like function words, "
        "VMR >> 1 marks bursty/topical words — the Church-Gale "
        "dispersion statistic used to pick content words for indexing "
        "and to spot template contamination (boilerplate words go "
        "hyper-bursty). Computed from exact integer moments "
        "(nd*s2 - s1^2)/(nd*s1) with the zero-docs folded in "
        "analytically — one (doc, word) count aggregate, one per-word "
        "moment aggregate, a scalar doc-count broadcast; top-30 among "
        "words with >= 50 occurrences."
    ),
)
def corpus_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    counts = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = counts.agg(
        F.countDistinct("doc_id").cast("bigint").alias("nd")
    )
    stats = counts.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    return (
        stats.where(F.col("s1") >= 50)
        .crossJoin(F.broadcast(nd))
        .select(
            "w",
            "df",
            F.col("s1").alias("total_count"),
            F.round(
                (
                    F.col("nd").cast("double") * F.col("s2")
                    - F.col("s1").cast("double") * F.col("s1")
                )
                / (F.col("nd").cast("double") * F.col("s1")),
                6,
            ).alias("burstiness_vmr"),
        )
        .orderBy(F.desc("burstiness_vmr"), "w")
        .limit(30)
    )


_ORACLE_DIVERSITY = r"""
WITH counts AS (
  SELECT source, w, COUNT(*) AS c FROM (
    SELECT source,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
    FROM documents WHERE length(trim(text)) > 0
  ) WHERE w <> '' GROUP BY source, w
),
s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS pair_same
  FROM counts GROUP BY source
),
sh AS (
  SELECT c.source,
         round(-SUM((CAST(c.c AS DOUBLE) / s.n)
                    * ln(CAST(c.c AS DOUBLE) / s.n)), 6) AS shannon
  FROM counts c JOIN s ON c.source = s.source
  GROUP BY c.source
)
SELECT s.source, s.vocab, s.n AS n_tokens,
       round(1.0 - CAST(s.pair_same AS DOUBLE)
             / (CAST(s.n AS DOUBLE) * (s.n - 1)), 6) AS simpson_diversity,
       sh.shannon
FROM s JOIN sh USING (source) ORDER BY s.source
"""


@register(
    "corpus_diversity_indices",
    oracle=_ORACLE_DIVERSITY,
    tags=("corpus", "stats", "profiling"),
    doc=(
        "Lexical diversity per source: Simpson index 1 - sum(c*(c-1)) / "
        "(n*(n-1)) from EXACT integer pair counts (the probability two "
        "sampled tokens differ — collapses when a template dominates) "
        "and Shannon entropy of the unigram distribution — the "
        "datasheet-level diversity panel next to corpus_data_card. "
        "Simpson is pure BIGINT until one final division; Shannon sums "
        "per-word p*ln(p) terms (vocabulary-sized groups, round-6 — the "
        "same cross-engine ln-sum contract text_bigram_perplexity "
        "pinned). One token-count aggregate feeds both."
    ),
)
def corpus_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    counts = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("pair_same"),
    )
    sh = (
        counts.join(s.select("source", "n"), "source")
        .groupBy("source")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c").cast("double") / F.col("n"))
                    * F.log(F.col("c").cast("double") / F.col("n"))
                ),
                6,
            ).alias("shannon")
        )
    )
    return (
        s.join(sh, "source")
        .select(
            "source",
            "vocab",
            F.col("n").alias("n_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("pair_same").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1)),
                6,
            ).alias("simpson_diversity"),
            "shannon",
        )
        .orderBy("source")
    )


_ORACLE_HEAPS = r"""
WITH toks AS (
  SELECT doc_id, CAST(doc_id * 10 // (SELECT MAX(doc_id) + 1 FROM documents)
                      AS INTEGER) AS decile,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok_per_decile AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM toks WHERE w <> '' GROUP BY decile
),
first_seen AS (
  SELECT w, MIN(decile) AS first_decile
  FROM toks WHERE w <> '' GROUP BY w
),
new_types AS (
  SELECT first_decile AS decile, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY first_decile
),
curve AS (
  SELECT t.decile,
         SUM(t.n_tok) OVER (ORDER BY t.decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
         SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY t.decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_types
  FROM tok_per_decile t LEFT JOIN new_types n USING (decile)
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_types AS BIGINT) AS cum_types,
       round((SELECT regr_slope(ln(CAST(c2.cum_types AS DOUBLE)),
                                ln(CAST(c2.cum_tokens AS DOUBLE)))
              FROM curve c2), 5) AS heaps_beta
FROM curve ORDER BY decile
"""


@register(
    "corpus_heaps_law_curve",
    oracle=_ORACLE_HEAPS,
    tags=("corpus", "stats", "profiling"),
    doc=(
        "Heaps'-law vocabulary growth curve: cumulative distinct types "
        "vs cumulative tokens across ten corpus prefixes, plus the "
        "log-log OLS slope (Heaps beta; natural corpora sit ~0.4-0.6, "
        "template-heavy corpora flatten early — the companion scaling "
        "law to corpus_zipf_law_fit). The trick that keeps it one pass: "
        "cumulative DISTINCT counts need no per-prefix distinct scans — "
        "each word's FIRST-occurrence decile is one hash aggregate, and "
        "cumulative types is a running sum of new-type counts. Windows "
        "run over the 10-row decile table."
    ),
)
def corpus_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    max_id = docs.agg((F.max("doc_id") + 1).alias("m"))
    toks = (
        docs.crossJoin(F.broadcast(max_id))
        .select(
            F.floor(F.col("doc_id") * 10 / F.col("m")).cast("int").alias("decile"),
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    tok_per = toks.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    new_types = (
        toks.groupBy("w")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    w_run = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        tok_per.join(new_types, "decile", "left")
        .select(
            "decile",
            F.sum("n_tok").over(w_run).alias("cum_tokens"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w_run).alias("cum_types"),
        )
    )
    beta = curve.agg(
        F.round(
            F.regr_slope(
                F.log(F.col("cum_types").cast("double")),
                F.log(F.col("cum_tokens").cast("double")),
            ),
            5,
        ).alias("heaps_beta")
    )
    return (
        curve.crossJoin(F.broadcast(beta))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            F.col("cum_types").cast("bigint").alias("cum_types"),
            "heaps_beta",
        )
        .orderBy("decile")
    )


_ORACLE_FIELD_MI = """
WITH joint AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nxy
  FROM documents GROUP BY lang, source
),
mx AS (SELECT lang, CAST(SUM(nxy) AS BIGINT) AS nx FROM joint GROUP BY lang),
my AS (SELECT source, CAST(SUM(nxy) AS BIGINT) AS ny FROM joint
       GROUP BY source),
t AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM joint)
SELECT j.lang, j.source, j.nxy,
       round((CAST(j.nxy AS DOUBLE) / t.n)
             * ln(CAST(j.nxy AS DOUBLE) * t.n
                  / (CAST(mx.nx AS DOUBLE) * my.ny)), 8) AS mi_term
FROM joint j JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN t
ORDER BY j.lang, j.source
"""


@register(
    "corpus_lang_source_mi",
    oracle=_ORACLE_FIELD_MI,
    tags=("corpus", "stats", "profiling"),
    doc=(
        "Mutual information between the lang and source fields, as "
        "per-cell contributions p(x,y) * ln(p(x,y)/(p(x)p(y))) — the "
        "field-association audit that flags when a 'language' split is "
        "secretly a 'source' split (and vice versa), which silently "
        "couples mixture weights; MI ~ 0 means the fields partition "
        "independently. Three hash aggregates (joint + two marginals) "
        "and one scalar total; each term is a single float expression "
        "over exact integers (sum the cells downstream for the headline "
        "MI in nats). The field-level sibling of corpus_pmi_bigrams."
    ),
)
def corpus_lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    joint = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    mx = joint.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = joint.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    t = joint.agg(F.sum("nxy").cast("bigint").alias("n"))
    return (
        joint.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "nxy",
            F.round(
                (F.col("nxy").cast("double") / F.col("n"))
                * F.log(
                    F.col("nxy").cast("double") * F.col("n")
                    / (F.col("nx").cast("double") * F.col("ny"))
                ),
                8,
            ).alias("mi_term"),
        )
        .orderBy("lang", "source")
    )


# -- Pareto frontier (skyline) selection ----------------------------------------

_ORACLE_SKYLINE = r"""
WITH feats AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_words,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
           AS BIGINT) AS n_distinct,
         n_chars
  FROM documents
)
SELECT f.doc_id, f.n_words, f.n_distinct, f.n_chars
FROM feats f
WHERE NOT EXISTS (
  SELECT 1 FROM feats g
  WHERE g.n_words >= f.n_words AND g.n_distinct >= f.n_distinct
    AND g.n_chars >= f.n_chars
    AND (g.n_words > f.n_words OR g.n_distinct > f.n_distinct
         OR g.n_chars > f.n_chars)
)
ORDER BY doc_id
"""


@register(
    "sample_pareto_frontier",
    oracle=_ORACLE_SKYLINE,
    tags=("sampling", "curation", "scale"),
    doc=(
        "Pareto-frontier (skyline) document selection over three maximize "
        "objectives (word count, distinct-word count, char count) — the "
        "multi-objective shortlist operator for curation tradeoffs (keep "
        "every document not dominated on quality x diversity x length). "
        "Distributive two-phase plan (Borzsony et al. 2001): a numpy "
        "local skyline per partition inside ONE mapInPandas pass (any "
        "locally-dominated point is globally dominated, so "
        "skyline(S) = skyline(union of local skylines) exactly), then the "
        "small candidate set closes under a broadcast dominance anti-join "
        "— the full table is never self-joined.  Integer features only, "
        "so dominance has no float-compare hazard; oracle is the "
        "quadratic NOT EXISTS form. ADVERSARIAL BOUND (r8, VERDICT r7 "
        "item 5): on anti-correlated objectives the local frontiers do "
        "not shrink and the close is O(k^2) dominance evaluations over "
        "k candidates — measured on a pure anti-chain "
        "(tools/probe_skyline_antichain.py, SCALE_PROBE_r08): k=5k 8.3s, "
        "20k 22.6s, 60k 228s on 32 cores. The operator therefore counts "
        "candidates (one cheap agg over the persisted local frontiers) "
        "and raises past 100k instead of running an unbounded quadratic; "
        "no partitioning scheme escapes this worst case — a true "
        "anti-chain's frontier IS the whole input, so the exact answer "
        "is itself Theta(n) and every published exact close (BNL/SFS/"
        "grid) degrades to quadratic pair work on it."
    ),
)
def sample_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    pin_query_session_conf(spark)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feats = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition skyline: O(n * |local frontier|) dominance sweep
        # over the partition sorted by falling objective sum — survivors
        # only; ties (identical vectors) all survive (strict-> rule)
        parts = [b for b in batches if len(b)]
        if not parts:  # empty partition: yield nothing
            return
        pdf = pd.concat(parts, ignore_index=True)
        m = pdf[["n_words", "n_distinct", "n_chars"]].to_numpy(np.int64)
        order = np.argsort(-(m.sum(axis=1)), kind="mergesort")
        keep: list[int] = []
        kept = np.empty((0, 3), dtype=np.int64)
        for i in order:
            dom = (kept >= m[i]).all(axis=1) & (kept > m[i]).any(axis=1)
            if not dom.any():
                keep.append(i)
                kept = np.vstack([kept, m[i]])
        yield pdf.iloc[sorted(keep)]

    cand = feats.mapInPandas(local_skyline, schema=schema).persist()
    # Disclosed adversarial guard (see docstring): the close below is
    # O(k^2); past 100k candidates (anti-correlated objectives) fail
    # loudly with the measured curve instead of running for hours.
    k = cand.count()
    if k > 100_000:
        raise ValueError(
            f"pareto frontier close aborted: {k} skyline candidates — "
            "objectives are anti-correlated and the O(k^2) dominance "
            "close would exceed the documented budget (measured: 60k "
            "candidates = 228s on 32 cores, SCALE_PROBE_r08)"
        )
    # global close: candidates are few, so broadcast the dominance check
    g = F.broadcast(
        cand.select(
            F.col("n_words").alias("gw"),
            F.col("n_distinct").alias("gd"),
            F.col("n_chars").alias("gc"),
        )
    )
    dominated = (
        (F.col("gw") >= F.col("n_words"))
        & (F.col("gd") >= F.col("n_distinct"))
        & (F.col("gc") >= F.col("n_chars"))
        & (
            (F.col("gw") > F.col("n_words"))
            | (F.col("gd") > F.col("n_distinct"))
            | (F.col("gc") > F.col("n_chars"))
        )
    )
    return (
        cand.join(g, on=dominated, how="left_anti")
        .select("doc_id", "n_words", "n_distinct", "n_chars")
        .orderBy("doc_id")
    )


# -- water-filling token budget allocation --------------------------------------

_ORACLE_WATERFILL = r"""
WITH counts AS (
  SELECT source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS c
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n
  FROM counts
),
ranked AS (
  SELECT source, c,
         CAST(ROW_NUMBER() OVER (ORDER BY c, source) AS BIGINT) AS rk,
         CAST(SUM(c) OVER (ORDER BY c, source) AS BIGINT) AS p
  FROM counts
),
jrow AS (
  SELECT r.rk AS j, r.p AS pj
  FROM ranked r, tot
  WHERE r.p + (tot.n - r.rk) * r.c <= tot.t // 2
  ORDER BY r.rk DESC LIMIT 1
),
lvl AS (
  SELECT (tot.t // 2) - COALESCE(jrow.pj, 0) AS num,
         tot.n - COALESCE(jrow.j, 0) AS den,
         COALESCE(jrow.j, 0) AS j
  FROM tot LEFT JOIN jrow ON TRUE
)
SELECT r.source, r.c AS tokens,
       CASE WHEN r.rk <= lvl.j THEN CAST(r.c AS DOUBLE)
            ELSE CAST(lvl.num AS DOUBLE) / CAST(lvl.den AS DOUBLE)
       END AS alloc_tokens,
       r.rk <= lvl.j AS saturated
FROM ranked r, lvl
ORDER BY r.source
"""


@register(
    "corpus_waterfill_budget",
    oracle=_ORACLE_WATERFILL,
    tags=("corpus", "sampling", "curation"),
    doc=(
        "Water-filling token-budget allocation across sources: given a "
        "global budget (half the corpus here), find the level L with "
        "sum(min(tokens_s, L)) = budget and allocate min(tokens_s, L) — "
        "the max-min-fair mixture planner (small sources keep everything, "
        "large sources are capped at one common level; the continuous "
        "relaxation of temperature sampling's cap). Closed form on sorted "
        "prefix sums: the break rank is the largest j with "
        "P_j + (n-j)*c_j <= B, L = (B-P_j)/(n-j) — all integer arithmetic "
        "until the single final division, so both engines emit the "
        "identical double. Distributed part is the per-source token "
        "count; the allocator runs on the <= |sources| ranked rows "
        "(bounded window, allowlisted)."
    ),
)
def corpus_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("c")
    )
    tot = counts.agg(
        F.sum("c").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("c", "source")
    ranked = counts.select(
        "source",
        "c",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.sum("c").over(w).cast("bigint").alias("p"),
    )
    rt = ranked.crossJoin(F.broadcast(tot))
    jrow = (
        rt.where(
            F.col("p") + (F.col("n") - F.col("rk")) * F.col("c")
            <= F.expr("t DIV 2")
        )
        .orderBy(F.col("rk").desc())
        .limit(1)
        .select(F.col("rk").alias("j"), F.col("p").alias("pj"))
    )
    lvl = (
        tot.crossJoin(F.broadcast(jrow))
        .select(
            (F.expr("t DIV 2") - F.coalesce(F.col("pj"), F.lit(0))).alias(
                "num"
            ),
            (F.col("n") - F.coalesce(F.col("j"), F.lit(0))).alias("den"),
            F.coalesce(F.col("j"), F.lit(0)).alias("j"),
        )
    )
    # crossJoin(broadcast(jrow)) drops the row when jrow is empty; emulate
    # LEFT JOIN ON TRUE so the j=0 (nothing saturated) case still allocates
    empty_lvl = tot.select(
        F.expr("t DIV 2").alias("num"),
        F.col("n").alias("den"),
        F.lit(0).cast("bigint").alias("j"),
    )
    lvl = lvl.unionByName(empty_lvl).orderBy(F.col("j").desc()).limit(1)
    alloc = F.when(
        F.col("rk") <= F.col("j"), F.col("c").cast("double")
    ).otherwise(F.col("num").cast("double") / F.col("den").cast("double"))
    return (
        ranked.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            F.col("c").alias("tokens"),
            alloc.alias("alloc_tokens"),
            (F.col("rk") <= F.col("j")).alias("saturated"),
        )
        .orderBy("source")
    )


# -- BPE tokenizer TRAINING (iterative merges) ----------------------------------

_BPE_MERGES = 8


def _bpe_oracle() -> str:
    """Unrolled 8-step BPE training in SQL.  Each step: corpus-weighted
    pair counts over the current symbolization, argmax (ties -> lexico-
    graphically smallest pair), then the merge applied via plain replace()
    on the DOUBLE-SPACE token encoding ('  a  b  '): the single-space
    pattern ' a  b ' consumes one space from each double gap, so adjacent
    merges in one word chain correctly and token-boundary false positives
    are impossible — identical left-to-right non-overlapping semantics in
    both engines' replace()."""
    steps = []
    for s in range(1, _BPE_MERGES + 1):
        prev = f"ws{s - 1}"
        steps.append(f"""
p{s} AS MATERIALIZED (
  SELECT w.s[i] || chr(1) || w.s[i + 1] AS pair, CAST(SUM(w.cnt) AS BIGINT) AS c
  FROM (SELECT cnt, regexp_split_to_array(trim(sym), ' +') AS s
        FROM {prev}) w,
       unnest(range(1, len(w.s))) r(i)
  GROUP BY pair
),
b{s} AS MATERIALIZED (SELECT pair, c FROM p{s} ORDER BY c DESC, pair LIMIT 1),
ws{s} AS MATERIALIZED (
  SELECT cnt,
         replace(sym,
                 ' ' || replace((SELECT pair FROM b{s}), chr(1), '  ') || ' ',
                 ' ' || replace((SELECT pair FROM b{s}), chr(1), '') || ' ')
           AS sym
  FROM {prev}
)""")
    # pair halves are chr(1)-joined internally (a token can contain '+',
    # a quote, or a backslash without ambiguity — ADVICE r7 item 1); the
    # OUTPUT keeps the readable 'a+b' form on both engines.
    rows = "\n  UNION ALL\n  ".join(
        f"SELECT {s} AS rank, "
        f"replace((SELECT pair FROM b{s}), chr(1), '+') AS pair, "
        f"(SELECT c FROM b{s}) AS support"
        for s in range(1, _BPE_MERGES + 1)
    )
    return rf"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w
),
ws0 AS MATERIALIZED (
  SELECT cnt, '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS sym
  FROM words
),{",".join(steps)}
SELECT CAST(rank AS INTEGER) AS rank, pair, support
FROM ({rows})
WHERE pair IS NOT NULL  -- zero-row parity: an empty corpus has no merges
ORDER BY rank
"""


@register(
    "corpus_bpe_train",
    oracle=_bpe_oracle(),
    tags=("corpus", "tokenizer", "training", "iterative"),
    doc=(
        "BPE tokenizer TRAINING (Sennrich et al. 2016), distributed: the "
        "corpus collapses ONCE into the (word, frequency) vocabulary "
        "table; each of the 8 merge rounds is then one vocabulary-scale "
        "pair-count aggregate + a 1-row driver argmax + a pure replace() "
        "column rewrite — corpus-scale work is a single word-count scan, "
        "iteration state is the merge list (driver) and the cached vocab "
        "table (executors), the wordpiece/unigram house pattern. "
        "Symbolization uses the double-space token encoding so the merge "
        "is a plain string replace with exact left-to-right BPE "
        "semantics (adjacent merges chain, no boundary false positives) "
        "— bit-identical in DuckDB, which lets the whole 8-step training "
        "recursion unroll into an exact SQL oracle (same pattern as "
        "ml_logreg_gd_train). Ties break to the lexicographically "
        "smallest pair on both engines."
    ),
)
def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ws = words.select(
        "cnt",
        F.concat(
            F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  ")
        ).alias("sym"),
    ).persist()
    try:
        merges: list[tuple[int, str, int]] = []
        cur = ws
        # Pair halves are joined with \x01 (cannot appear in a token: the
        # fixture split is on whitespace and \x01 would itself be part of
        # a token only if present in raw text — and even then the merge
        # REPLACE below is built from literal column args, never
        # interpolated SQL, so a quote/backslash/+ in a token can no
        # longer break the expression or diverge from the oracle, which
        # splits on the same chr(1)).  ADVICE r7 item 1.
        pair_expr = (
            "CASE WHEN size(s) >= 2 THEN "
            "transform(sequence(1, size(s) - 1), i -> s[i-1] || char(1) || s[i]) "
            "ELSE CAST(array() AS array<string>) END"
        )
        for step in range(1, _BPE_MERGES + 1):
            pairs = (
                cur.select(
                    "cnt",
                    F.split(F.trim(F.col("sym")), " +").alias("s"),
                )
                .select("cnt", F.explode(F.expr(pair_expr)).alias("pair"))
                .groupBy("pair")
                .agg(F.sum("cnt").cast("bigint").alias("c"))
                .orderBy(F.col("c").desc(), F.col("pair"))
                .limit(1)
                .collect()
            )
            if not pairs:
                # no mergeable pair left (empty corpus, or every word is a
                # single symbol): stop early — the oracle's unrolled CTEs
                # likewise produce no further merge rows (zero-row parity
                # fixture, r9)
                break
            best = pairs[0]
            # output keeps the human-readable 'a+b' form; both engines
            # derive it from the \x01-joined pair identically
            merges.append((step, best["pair"].replace("\x01", "+"), int(best["c"])))
            a, b = best["pair"].split("\x01", 1)
            cur = cur.withColumn(
                "sym",
                F.replace(
                    F.col("sym"),
                    F.lit(f" {a}  {b} "),
                    F.lit(f" {a}{b} "),
                ),
            )
            # pin each round's rewrite so round k+1 re-aggregates k's
            # output, not an 8-deep recomputed lineage
            cur = cur.localCheckpoint(eager=True)
        return spark.createDataFrame(
            merges, "rank int, pair string, support bigint"
        )
    finally:
        ws.unpersist()


@register(
    "dedup_cluster_components_star",
    oracle=_ORACLE_COMPONENTS_CAPPED,
    tags=("dedup", "graph", "north-star", "scale"),
    doc=(
        "Connected components over the same Jaccard>=0.12 pair graph via "
        "alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al. 2014) "
        "— the O(log n)-ROUND scale path beside dedup_cluster_components' "
        "O(diameter) min-label propagation: a 1M-long duplication chain "
        "converges in ~20 star rounds instead of 1M propagation rounds "
        "(measured: a 256-chain takes 9 rounds vs 255). Each round is two "
        "single-shuffle groupBy-min rewrites with per-round "
        "localCheckpoint lineage cuts; identical labeling (component min) "
        "and the identical recursive-CTE oracle as the propagation form. "
        "Recomposed (r8, VERDICT r7 item 1) on the FREQUENCY-CAPPED pair "
        "generator — the naive self-join OOMed pair generation at x64 "
        "(SCALE_PROBE_r07) while the CC phase converged fine; the capped "
        "generator's per-shingle work is bounded at cap², end-to-end "
        "x64 re-probe in SCALE_PROBE_r08."
    ),
)
def dedup_cluster_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components_star, jaccard_pairs_capped

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    ).select("doc_a", "doc_b")
    labels, _rounds = connected_components_star(pairs)
    return labels


# -- Pairwise Jensen-Shannon divergence between sources (r8) -------------------------

_ORACLE_JSD_SOURCES = r"""
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
cnt AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM tok GROUP BY 1),
vocab AS (SELECT DISTINCT w FROM tok),
grid AS (
  SELECT s.source, v.w,
         CAST(COALESCE(c.c, 0) AS DOUBLE) / s.t AS p
  FROM tot s CROSS JOIN vocab v
  LEFT JOIN cnt c ON c.source = s.source AND c.w = v.w
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.w,
         CAST(floor(1000000000.0 * (
           0.5 * CASE WHEN a.p > 0
                      THEN a.p * ln(2.0 * a.p / (a.p + b.p)) ELSE 0.0 END
           + 0.5 * CASE WHEN b.p > 0
                        THEN b.p * ln(2.0 * b.p / (a.p + b.p)) ELSE 0.0 END))
              AS BIGINT) AS term_e9
  FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source
  WHERE a.p > 0 OR b.p > 0
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       round(CAST(SUM(term_e9) AS DOUBLE) / 1000000000.0, 6) AS jsd_nats
FROM pairs GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register(
    "corpus_jsd_sources",
    oracle=_ORACLE_JSD_SOURCES,
    tags=("corpus", "quality", "stats"),
    doc=(
        "Pairwise Jensen-Shannon divergence between every source pair's "
        "unigram distributions — the bounded symmetric distribution "
        "distance (0..ln2 nats) behind mixture design and source-drift "
        "monitoring (which sources are near-duplicates distributionally, "
        "which add diversity). Per-term contributions are e9-floored "
        "BEFORE summation (identical double expressions on both engines), "
        "so each pair's divergence is an exact BIGINT sum; the zero-count "
        "sides contribute the correct p*ln2 mass via the full "
        "vocab x source grid. Plan: one tokenize scan -> per-source "
        "counts; the pair join is linear in vocab x pairs with the "
        "pair count bounded by |sources|^2/2 — a metadata-scale product, "
        "never document-scale."
    ),
)
def corpus_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.where(F.trim("text") != "")
        .select(
            "source",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .persist()
    )
    cnt = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = tok.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    vocab = tok.select("w").distinct()
    grid = (
        tot.crossJoin(vocab)
        .join(cnt, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (F.coalesce("c", F.lit(0)).cast("double") / F.col("t")).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"), "w", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("source_b"), "w", F.col("p").alias("pb")
    )
    term = F.floor(
        F.lit(1000000000.0)
        * (
            F.lit(0.5)
            * F.when(
                F.col("pa") > 0,
                F.col("pa")
                * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb"))),
            ).otherwise(0.0)
            + F.lit(0.5)
            * F.when(
                F.col("pb") > 0,
                F.col("pb")
                * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb"))),
            ).otherwise(0.0)
        )
    ).cast("bigint")
    pairs = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .where((F.col("pa") > 0) | (F.col("pb") > 0))
        .select("source_a", "source_b", term.alias("term_e9"))
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(
                F.sum("term_e9").cast("double") / 1000000000.0, 6
            ).alias("jsd_nats"),
        )
        .orderBy("source_a", "source_b")
    )
