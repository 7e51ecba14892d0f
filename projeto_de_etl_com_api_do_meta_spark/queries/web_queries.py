"""Web-crawl curation operators: line-level dedup, boilerplate stripping,
host-level quality filtering.

These are the document-INTERIOR cleanup passes every web-scale training
pipeline runs between URL dedup and document-level dedup (C4 removed any
line occurring more than once in the corpus; CCNet/RefinedWeb strip
per-site boilerplate; host-level reputation gates whole domains):

- ``web_line_dedup_rebuild`` — C4-style: a text segment whose content
  appears anywhere else in the corpus is kept only at its FIRST occurrence
  (min ``(doc_id, position)``); every document is rebuilt from its
  surviving segments in order.
- ``web_boilerplate_strip_host`` — a segment repeated across >= K distinct
  documents of the SAME host is site boilerplate (nav bars, copyright
  footers) and is stripped from all of them.
- ``web_host_quality_filter`` — per-host Gopher-rule keep rates vs the
  corpus average: the domain-reputation report used to gate whole hosts.

The fixture corpus is prose-only (no newlines, no host column), so
"lines" are deterministic fixed-width word segments and the host is
derived from ``doc_id`` — same augment-then-operate contract as
``text_scrub_pii``: the oracle applies the identical augmentation, so the
dedup/strip/rebuild semantics (not just plumbing) are value-verified.

Scale notes (100 TB shape): segmentation is a stateless per-row JVM
expression (no UDF); first-occurrence selection is one hash aggregate on
the segment key with a map-side-combinable ``min(struct)`` partial; the
survivors join back on the same segment key (posting-list equi-join,
never all-pairs); document rebuild is a hash aggregate on ``doc_id``
whose per-group state is one document's segments. The only windows live
in the DuckDB oracles (the naive audit side). Host-boilerplate counting
is the same shape keyed on ``(host, segment)`` — per-host state never
concentrates on one reducer because the key includes the segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import spread
from ..session import pin_query_session_conf
from .registry import register
from .text_cleaning import gopher_metrics

#: Fixed segment width in words ("line" analog for the prose fixture).
_SEG_WORDS = 10
#: A segment in >= this many distinct docs of one host is boilerplate.
_BOILER_MIN_DOCS = 5
#: Synthetic host cardinality (doc_id % _N_HOSTS), matching the
#: canonical-URL fixture in web_url_canonical_dedup.
_N_HOSTS = 7


def segment_words(docs: DataFrame, width: int = _SEG_WORDS) -> DataFrame:
    """Explode ``text`` into fixed-``width``-word segments.

    Returns ``(doc_id, n_segs, seg_pos, seg)`` with 1-based positions; the
    trailing segment may be shorter. Pure JVM expressions: split once,
    then ``transform(sequence(...))`` + ``slice`` builds the segment array
    and ``posexplode`` flattens it.
    """
    base = docs.select("doc_id", F.split("text", " ").alias("ws"))
    seg_arr = F.transform(
        F.sequence(
            F.lit(1), F.ceil(F.size("ws") / F.lit(float(width))).cast("int")
        ),
        lambda i: F.array_join(
            F.slice("ws", (i - F.lit(1)) * width + F.lit(1), width), " "
        ),
    )
    return base.select(
        "doc_id",
        F.size("ws").alias("_nw"),
        F.posexplode(seg_arr).alias("_p", "seg"),
    ).select(
        "doc_id",
        F.ceil(F.col("_nw") / F.lit(float(width))).cast("long").alias("n_segs"),
        (F.col("_p") + 1).cast("long").alias("seg_pos"),
        "seg",
    )


def first_occurrence_only(segs: DataFrame) -> DataFrame:
    """Keep each distinct segment string only at its first corpus position
    (min ``(doc_id, seg_pos)``) — the C4 line-dedup rule.

    One ``min(struct)`` hash aggregate on the segment key (map-side
    combinable) + one equi-join back on the same key.
    """
    keeper = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_pos")).alias("_k")
    )
    return (
        segs.join(keeper, "seg")
        .where(
            (F.col("doc_id") == F.col("_k.doc_id"))
            & (F.col("seg_pos") == F.col("_k.seg_pos"))
        )
        .drop("_k")
    )


def rebuild_docs(kept: DataFrame) -> DataFrame:
    """Reassemble ``(doc_id, n_kept, rebuilt)`` from surviving segments in
    ``seg_pos`` order. One hash aggregate per document; ``array_sort`` on
    the collected ``(pos, seg)`` structs restores order without a window.
    """
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("rebuilt"),
    )


_ORACLE_LINE_DEDUP = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
t AS (
  SELECT doc_id, CAST(ceil(len(ws) / {_SEG_WORDS}.0) AS BIGINT) AS n_segs, ws
  FROM w
),
seg AS (
  SELECT doc_id, n_segs, i AS seg_pos,
         array_to_string(
           ws[(i - 1) * {_SEG_WORDS} + 1 : i * {_SEG_WORDS}], ' ') AS seg
  FROM t, unnest(range(1, n_segs + 1)) AS r(i)
),
fo AS (
  SELECT doc_id, seg_pos, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_pos) AS rn
  FROM seg
),
reb AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_pos) AS rebuilt
  FROM fo WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_segs,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       md5(COALESCE(r.rebuilt, '')) AS clean_hash
FROM t LEFT JOIN reb r USING (doc_id)
ORDER BY t.doc_id
"""


@register(
    "web_line_dedup_rebuild",
    oracle=_ORACLE_LINE_DEDUP,
    tags=("text", "dedup", "web", "north-star"),
    doc=(
        "C4-style line-level dedup with document reconstruction: every "
        f"{_SEG_WORDS}-word segment that appears anywhere else in the "
        "corpus survives only at its first occurrence (min (doc_id, "
        "position)); each document is rebuilt from its surviving segments "
        "in order and reported as (n_segs, n_kept, md5 of rebuilt text). "
        "Sub-document dedup catches quote/copy overlap that whole-document "
        "hashing misses. Shape: stateless segmentation expressions, one "
        "map-side-combinable min(struct) aggregate on the segment key, one "
        "posting-style equi-join back, one per-doc rebuild aggregate — no "
        "windows, no all-pairs; the oracle's ROW_NUMBER is the naive "
        "audit-side twin."
    ),
)
def web_line_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    segs = segment_words(docs)
    totals = segs.select("doc_id", "n_segs").distinct()
    reb = rebuild_docs(first_occurrence_only(segs.drop("n_segs")))
    return (
        totals.join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.md5(F.coalesce("rebuilt", F.lit(""))).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Per-host boilerplate stripping.
# ---------------------------------------------------------------------------

_ORACLE_BOILERPLATE = f"""
WITH w AS (
  SELECT doc_id,
         'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) AS host,
         string_split(text, ' ') AS ws
  FROM documents
),
t AS (
  SELECT doc_id, host,
         CAST(ceil(len(ws) / {_SEG_WORDS}.0) AS BIGINT) AS n_text_segs, ws
  FROM w
),
nat AS (
  SELECT doc_id, host, n_text_segs, i AS seg_pos,
         array_to_string(
           ws[(i - 1) * {_SEG_WORDS} + 1 : i * {_SEG_WORDS}], ' ') AS seg
  FROM t, unnest(range(1, n_text_segs + 1)) AS r(i)
),
aug AS (
  SELECT doc_id, host, n_text_segs, seg_pos, seg FROM nat
  UNION ALL
  SELECT doc_id, host, n_text_segs, n_text_segs + 1,
         'copyright ' || host || ' all rights reserved' FROM t
  UNION ALL
  SELECT doc_id, host, n_text_segs, n_text_segs + 2,
         'home about contact navigation ' || host FROM t
),
hs AS (
  SELECT host, seg, COUNT(DISTINCT doc_id) AS nd
  FROM aug GROUP BY host, seg
),
kept AS (
  SELECT a.doc_id, a.host, a.n_text_segs, a.seg_pos, a.seg
  FROM aug a JOIN hs USING (host, seg)
  WHERE hs.nd < {_BOILER_MIN_DOCS}
),
reb AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_pos) AS rebuilt
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       t.host,
       t.n_text_segs + 2 AS n_segs,
       CAST(t.n_text_segs + 2 - COALESCE(r.n_kept, 0) AS BIGINT)
         AS n_boiler_removed,
       md5(COALESCE(r.rebuilt, '')) AS clean_hash
FROM t LEFT JOIN reb r USING (doc_id)
ORDER BY t.doc_id
"""


@register(
    "web_boilerplate_strip_host",
    oracle=_ORACLE_BOILERPLATE,
    tags=("text", "cleaning", "web", "north-star"),
    doc=(
        "Per-site boilerplate stripping (the CCNet/RefinedWeb pass): a "
        f"segment appearing in >= {_BOILER_MIN_DOCS} distinct documents of "
        "the SAME host is site chrome (nav bars, copyright footers) and is "
        "removed from every document of that host; documents are rebuilt "
        "from the surviving segments. The prose fixture has no hosts or "
        "boilerplate, so a synthetic host (doc_id % "
        f"{_N_HOSTS}) and two per-host boilerplate lines are appended "
        "first — the operator must then actually detect and strip them "
        "(plus any naturally repeated segments), and the oracle applies "
        "the identical augmentation. Shape: per-(host, segment) count "
        "aggregate (map-side combinable, key includes the segment so one "
        "host never funnels to one reducer), equi-join back, per-doc "
        "rebuild aggregate."
    ),
)
def web_boilerplate_strip_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    host = F.concat(
        F.lit("site"), (F.col("doc_id") % _N_HOSTS).cast("string")
    )
    nat = segment_words(docs).withColumnRenamed(
        "n_segs", "n_text_segs"
    ).withColumn("host", host)
    per_doc = docs.select(
        "doc_id",
        host.alias("host"),
        F.ceil(F.size(F.split("text", " ")) / F.lit(float(_SEG_WORDS)))
        .cast("long")
        .alias("n_text_segs"),
    )
    bo = per_doc.select(
        "doc_id",
        "host",
        "n_text_segs",
        F.explode(
            F.array(
                F.struct(
                    (F.col("n_text_segs") + 1).alias("seg_pos"),
                    F.concat(
                        F.lit("copyright "),
                        F.col("host"),
                        F.lit(" all rights reserved"),
                    ).alias("seg"),
                ),
                F.struct(
                    (F.col("n_text_segs") + 2).alias("seg_pos"),
                    F.concat(
                        F.lit("home about contact navigation "), F.col("host")
                    ).alias("seg"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "host", "n_text_segs", "b.seg_pos", "b.seg")
    aug = nat.select("doc_id", "host", "n_text_segs", "seg_pos", "seg").unionByName(bo)
    hs = aug.groupBy("host", "seg").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    kept = aug.join(hs, ["host", "seg"]).where(F.col("nd") < _BOILER_MIN_DOCS)
    reb = rebuild_docs(kept.select("doc_id", "seg_pos", "seg"))
    return (
        per_doc.join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            (F.col("n_text_segs") + 2).alias("n_segs"),
            (F.col("n_text_segs") + 2 - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_boiler_removed"),
            F.md5(F.coalesce("rebuilt", F.lit(""))).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Host-level quality gating.
# ---------------------------------------------------------------------------

_ORACLE_HOST_QUALITY = """
WITH w AS (
  SELECT doc_id,
         'site' || CAST(doc_id % {n_hosts} AS VARCHAR) AS host,
         string_split(text, ' ') AS words,
         length(replace(text, ' ', '')) AS n_chars_ns
  FROM documents
),
m AS (
  SELECT doc_id, host,
         len(words) AS n_words,
         (10000 * n_chars_ns) // greatest(len(words), 1) AS mean_wordlen_bp,
         len(list_filter(words,
             x -> list_contains({stops!r}, x))) AS stop_hits,
         (10000 * len(list_distinct(words)))
             // greatest(len(words), 1) AS distinct_ratio_bp
  FROM w
),
k AS (
  SELECT doc_id, host,
         CASE WHEN n_words BETWEEN {min_words} AND {max_words}
               AND mean_wordlen_bp BETWEEN {min_mwl} AND {max_mwl}
               AND stop_hits >= {min_stops}
               AND distinct_ratio_bp >= {min_distinct}
          THEN 1 ELSE 0 END AS keep
  FROM m
),
h AS (
  SELECT host, COUNT(*) AS n_docs, SUM(keep) AS n_keep
  FROM k GROUP BY host
),
c AS (SELECT SUM(n_docs) AS all_docs, SUM(n_keep) AS all_keep FROM h)
SELECT h.host,
       CAST(h.n_docs AS BIGINT) AS n_docs,
       CAST(h.n_keep AS BIGINT) AS n_keep,
       CAST((10000 * h.n_keep) // h.n_docs AS BIGINT) AS keep_bp,
       CAST((10000 * c.all_keep) // c.all_docs AS BIGINT) AS corpus_keep_bp,
       CAST(CASE WHEN (10000 * h.n_keep) // h.n_docs
                    < (10000 * c.all_keep) // c.all_docs
             THEN 1 ELSE 0 END AS INT) AS below_avg
FROM h CROSS JOIN c
ORDER BY h.host
"""


@register(
    "web_host_quality_filter",
    oracle=None,  # bound below after formatting with the Gopher constants
    tags=("text", "quality", "web", "north-star"),
    doc=(
        "Host-level quality gating (domain reputation): per synthetic host "
        f"(doc_id % {_N_HOSTS}), the Gopher-rule keep rate in basis points "
        "vs the corpus-wide rate, with a below-average flag — the report "
        "used to drop whole low-quality domains rather than filtering doc "
        "by doc. Deliberately threshold-free (flag = below corpus mean): "
        "an absolute cutoff is config, the discriminating signal is the "
        "ranking. Shape: the per-doc rule battery is a stateless map "
        "(gopher_metrics, shared with text_gopher_quality_rules), then one "
        "tiny per-host aggregate and one broadcast corpus scalar."
    ),
)
def web_host_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    m = gopher_metrics(docs).select(
        "doc_id",
        F.concat(F.lit("site"), (F.col("doc_id") % _N_HOSTS).cast("string")).alias(
            "host"
        ),
        "keep",
    )
    h = m.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").cast("long").alias("n_keep"),
    )
    c = h.agg(
        F.sum("n_docs").alias("all_docs"), F.sum("n_keep").alias("all_keep")
    )
    return (
        h.crossJoin(F.broadcast(c))
        .select(
            "host",
            "n_docs",
            "n_keep",
            F.expr("(10000 * n_keep) div n_docs").cast("long").alias("keep_bp"),
            F.expr("(10000 * all_keep) div all_docs")
            .cast("long")
            .alias("corpus_keep_bp"),
            F.expr(
                "CAST((10000 * n_keep) div n_docs"
                " < (10000 * all_keep) div all_docs AS INT)"
            ).alias("below_avg"),
        )
        .orderBy("host")
    )


def _bind_host_quality_oracle() -> None:
    """Format the host-quality oracle with the Gopher constants (imported,
    not duplicated, so the two queries can never drift apart)."""
    from . import text_cleaning as tc
    from .registry import QUERIES, QuerySpec

    spec = QUERIES["web_host_quality_filter"]
    sql = _ORACLE_HOST_QUALITY.format(
        n_hosts=_N_HOSTS,
        stops=list(tc._GOPHER_STOPS),
        min_words=tc._GOPHER_MIN_WORDS,
        max_words=tc._GOPHER_MAX_WORDS,
        min_mwl=tc._GOPHER_MIN_MWL_BP,
        max_mwl=tc._GOPHER_MAX_MWL_BP,
        min_stops=tc._GOPHER_MIN_STOPS,
        min_distinct=tc._GOPHER_MIN_DISTINCT_BP,
    )
    QUERIES["web_host_quality_filter"] = QuerySpec(
        name=spec.name, fn=spec.fn, oracle=sql, tags=spec.tags, doc=spec.doc
    )


_bind_host_quality_oracle()


# ---------------------------------------------------------------------------
# Domain blocklist filtering (suffix match on registrable-domain boundaries).
# ---------------------------------------------------------------------------

#: Blocked domains: a host is blocked when it equals an entry or is a
#: subdomain of one (match on a full dot boundary, never substring — the
#: bug class where "site1.com" blocks "notsite1.com").
_BLOCKLIST = ("site3.com", "site1.co.uk", "sub2.site5.co.uk")

_ORACLE_BLOCKLIST = """
WITH docs_h AS (
  SELECT doc_id,
         'sub' || CAST(doc_id % 5 AS VARCHAR) || '.site' ||
         CAST(doc_id % 7 AS VARCHAR) ||
         CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.co.uk' END AS host
  FROM documents
),
bl AS (SELECT * FROM (VALUES ('site3.com'), ('site1.co.uk'),
                             ('sub2.site5.co.uk')) AS t(entry)),
matched AS (
  SELECT d.doc_id, b.entry,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id
                            ORDER BY LENGTH(b.entry) DESC, b.entry) AS rn
  FROM docs_h d JOIN bl b
    ON d.host = b.entry OR d.host LIKE '%.' || b.entry
),
lab AS (
  SELECT d.doc_id, COALESCE(m.entry, '(kept)') AS verdict
  FROM docs_h d LEFT JOIN (SELECT doc_id, entry FROM matched WHERE rn = 1) m
    ON d.doc_id = m.doc_id
)
SELECT verdict, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM lab GROUP BY verdict ORDER BY verdict
"""


@register(
    "web_domain_blocklist_filter",
    oracle=_ORACLE_BLOCKLIST,
    tags=("text", "web", "quality", "north-star"),
    doc=(
        "Domain-blocklist gating, the cheapest host-level filter of a "
        "crawl pipeline: a host is blocked iff it equals a blocklist "
        "entry or sits under one on a full dot boundary (subdomain), "
        "never by substring. Scale shape: each host explodes into its "
        "dot-suffixes (bounded by label count, ~4-6 per host — NOT a "
        "per-entry scan), the blocklist joins as a broadcast equi-join "
        "on the suffix, and the most-specific (longest) match wins via "
        "one max(struct) aggregate per doc. The corpus has no hosts, so "
        "deterministic hosts are synthesized from doc_id (same "
        "augment-then-operate contract as web_url_canonical_dedup); the "
        "oracle recomputes the match with LIKE on the same fixture."
    ),
)
def web_domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("sub"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".site"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, ".com").otherwise(".co.uk"),
    )
    d = docs.select("doc_id", host.alias("host"))
    labels = F.split("host", "\\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    exploded = d.select("doc_id", F.explode(suffixes).alias("sfx"))
    bl = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(e,) for e in _BLOCKLIST], "entry string"
        )
    )
    best = (
        exploded.join(bl, exploded.sfx == bl.entry)
        .groupBy("doc_id")
        .agg(
            F.max(F.struct(F.length("entry").alias("l"), F.col("entry").alias("e")))
            .getField("e")
            .alias("entry")
        )
    )
    return (
        d.join(best, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("entry", F.lit("(kept)")).alias("verdict")
        )
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("verdict")
    )


# robots.txt rule table: (host, path prefix, allow) — longest-prefix-match
# per RFC 9309, allow wins length ties. Deterministic fixture rules that
# exercise default-allow (no host entry), blanket disallow, carve-back
# allow, and a deeper re-disallow.
_ROBOTS_RULES: tuple[tuple[str, str, bool], ...] = (
    ("site0.com", "/", False),            # blanket disallow
    ("site0.com", "/p1", True),           # carve-back: /p1 subtree allowed
    ("site0.com", "/p1/q2", False),       # ...except /p1/q2
    ("site1.com", "/p3", False),          # targeted disallow only
    ("site2.com", "/", True),             # explicit allow-all
    ("site2.com", "/p5", False),
    ("site3.com", "/p", False),           # prefix (not path-segment) match
    ("site3.com", "/p7", True),           # same-length tie never occurs;
                                          # longer allow overrides
)

_ORACLE_ROBOTS = """
WITH urls AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host,
         '/p' || CAST(doc_id % 13 AS VARCHAR)
           || '/q' || CAST(doc_id % 5 AS VARCHAR) AS path
  FROM documents
),
rules AS (
  SELECT * FROM (VALUES
    ('site0.com', '/', FALSE), ('site0.com', '/p1', TRUE),
    ('site0.com', '/p1/q2', FALSE), ('site1.com', '/p3', FALSE),
    ('site2.com', '/', TRUE), ('site2.com', '/p5', FALSE),
    ('site3.com', '/p', FALSE), ('site3.com', '/p7', TRUE)
  ) AS t(host, prefix, allow)
),
matched AS (
  SELECT u.doc_id, u.host, u.path,
         MAX(struct_pack(l := length(r.prefix),
                         a := CASE WHEN r.allow THEN 1 ELSE 0 END))
           AS best
  FROM urls u JOIN rules r
    ON u.host = r.host AND starts_with(u.path, r.prefix)
  GROUP BY u.doc_id, u.host, u.path
)
SELECT u.host,
       CASE WHEN m.best IS NULL THEN 'fetch'             -- no rules: allow
            WHEN m.best.a = 1 THEN 'fetch' ELSE 'blocked' END AS verdict,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM urls u LEFT JOIN matched m USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "web_robots_fetch_gate",
    oracle=_ORACLE_ROBOTS,
    tags=("web", "governance", "north-star"),
    doc=(
        "robots.txt fetch gating per RFC 9309: each URL takes the "
        "LONGEST-prefix rule among its host's allow/disallow records "
        "(allow wins length ties, hosts with no rules default to allow) "
        "— the crawl-compliance step that runs before any page enters a "
        "training corpus. Scale shape: the compiled rule table is tiny "
        "(robots files per host), so it broadcasts; matching is one "
        "broadcast equi-join on host + starts_with refine + max(struct) "
        "per URL — no per-rule scans of the corpus. URLs are synthesized "
        "deterministically from doc_id (same augment-then-operate "
        "contract as web_domain_blocklist_filter; reference has no crawl "
        "tables). Encoding the allow flag inside the max(struct) makes "
        "the RFC tie-break declarative: (length, allow) sorts allow "
        "above disallow at equal length."
    ),
)
def web_robots_fetch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ).alias("host"),
        F.concat(
            F.lit("/p"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit("/q"),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("path"),
    )
    rules = F.broadcast(
        spark.createDataFrame(
            list(_ROBOTS_RULES), "host string, prefix string, allow boolean"
        )
    )
    matched = (
        urls.join(rules, "host")
        .where(F.col("path").startswith(F.col("prefix")))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("l"),
                    F.when(F.col("allow"), 1).otherwise(0).alias("a"),
                )
            ).alias("best")
        )
    )
    return (
        urls.join(matched, "doc_id", "left")
        .select(
            "host",
            F.when(
                F.col("best").isNull() | (F.col("best.a") == 1), "fetch"
            )
            .otherwise("blocked")
            .alias("verdict"),
        )
        .groupBy("host", "verdict")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
        .orderBy("host", "verdict")
    )
