"""Exact ML primitives, corpus concordance, FD discovery, and the
fixed-width file format (round 9d).

* ``ml_decision_stump_exact`` — the 1-split decision tree: every distinct
  feature value is a candidate threshold, split quality is weighted Gini
  computed from EXACT integer confusion cells (the only float is the
  final two-term score expression, identical operand order on both
  engines), winner by (score, threshold).  The base learner every
  boosting stack starts from, done as one cumulative window over the
  distinct-value table.
* ``corpus_kwic_concordance`` — KeyWord-In-Context: the corpus's most
  frequent non-stopword with its (prev, next) token contexts,
  frequency-ranked — corpus linguistics' oldest report, built from
  per-doc lag/lead windows.
* ``dq_functional_dependency_profile`` — FD discovery across event
  columns: A->B holds iff |distinct A| == |distinct (A,B)|; violating
  LHS values counted exactly.  The profiling step schema-normalization
  and key-candidate detection both start from.
* ``io_fixed_width_roundtrip`` — the mainframe/COBOL delivery format the
  CSV/JSON/XML family is missing: fixed column offsets, zero-padded
  signed numerics, written as plain text and parsed back by substring
  offsets alone.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Exact decision stump (1-split tree, weighted Gini)
# ---------------------------------------------------------------------------

_ORACLE_STUMP = """
WITH scored AS (
  SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
per_v AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY v
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
  FROM per_v
),
cum AS (
  SELECT v,
         SUM(cnt) OVER (ORDER BY v) AS n_l,
         SUM(pos) OVER (ORDER BY v) AS pos_l
  FROM per_v
),
cand AS (
  SELECT c.v AS threshold,
         c.n_l, c.pos_l, c.n_l - c.pos_l AS neg_l,
         t.n - c.n_l AS n_r, t.p - c.pos_l AS pos_r,
         (t.n - c.n_l) - (t.p - c.pos_l) AS neg_r,
         t.n AS n, t.p AS p
  FROM cum c, tot t
  WHERE c.n_l < t.n
),
best AS (
  SELECT *,
         CAST(pos_l * neg_l AS DOUBLE) / CAST(n_l AS DOUBLE)
           + CAST(pos_r * neg_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS gini2
  FROM cand
  QUALIFY row_number() OVER (ORDER BY
    CAST(pos_l * neg_l AS DOUBLE) / CAST(n_l AS DOUBLE)
      + CAST(pos_r * neg_r AS DOUBLE) / CAST(n_r AS DOUBLE), threshold) = 1
)
SELECT threshold AS threshold_e2, n, p AS n_positive,
       CAST(n_l AS BIGINT) AS n_l, CAST(pos_l AS BIGINT) AS pos_l,
       CAST(n_r AS BIGINT) AS n_r, CAST(pos_r AS BIGINT) AS pos_r,
       round(gini2, 6) AS weighted_gini_x2,
       CAST(greatest(pos_l, neg_l) + greatest(pos_r, neg_r) AS BIGINT)
         AS n_correct_majority
FROM best
"""


@register(
    "ml_decision_stump_exact",
    oracle=_ORACLE_STUMP,
    tags=("ml", "stats"),
    doc=(
        "Exact decision stump (1-split tree) predicting purchase from the "
        "cent-quantized event value: every distinct value is a candidate "
        "threshold, confusion cells come from ONE cumulative window over "
        "the distinct-value table (bounded by cent resolution — the "
        "ml_auc_roc_exact contract), split quality is the weighted Gini "
        "pos_l*neg_l/n_l + pos_r*neg_r/n_r with exact integer numerators "
        "and ONE identical two-term float expression for the ordering, "
        "ties broken by threshold.  The base learner boosting stacks "
        "start from, and the exact form of what a distributed GBDT's "
        "histogram split-finder approximates; majority-leaf training "
        "accuracy reported from the same cells."
    ),
)
def ml_decision_stump_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    scored = ev.where(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100.0, 0).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_v = scored.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = per_v.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w = Window.orderBy("v")
    cum = per_v.select(
        "v",
        F.sum("cnt").over(w).alias("n_l"),
        F.sum("pos").over(w).alias("pos_l"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("n_l") < F.col("n"))
        .select(
            F.col("v").alias("threshold"),
            "n_l",
            "pos_l",
            (F.col("n_l") - F.col("pos_l")).alias("neg_l"),
            (F.col("n") - F.col("n_l")).alias("n_r"),
            (F.col("p") - F.col("pos_l")).alias("pos_r"),
            ((F.col("n") - F.col("n_l")) - (F.col("p") - F.col("pos_l"))).alias(
                "neg_r"
            ),
            "n",
            "p",
        )
    )
    gini2 = (
        (F.col("pos_l") * F.col("neg_l")).cast("double") / F.col("n_l").cast("double")
        + (F.col("pos_r") * F.col("neg_r")).cast("double")
        / F.col("n_r").cast("double")
    )
    w_best = Window.orderBy(gini2, "threshold")
    return (
        cand.withColumn("gini2", gini2)
        .withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select(
            F.col("threshold").alias("threshold_e2"),
            "n",
            F.col("p").alias("n_positive"),
            "n_l",
            "pos_l",
            "n_r",
            "pos_r",
            F.round("gini2", 6).alias("weighted_gini_x2"),
            (
                F.greatest("pos_l", "neg_l") + F.greatest("pos_r", "neg_r")
            )
            .cast("bigint")
            .alias("n_correct_majority"),
        )
    )


# ---------------------------------------------------------------------------
# KWIC concordance
# ---------------------------------------------------------------------------

_KWIC_STOPS = ("a", "the", "of", "and", "to", "in")

_ORACLE_KWIC = f"""
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
toks AS (
  SELECT doc_id, pos, w FROM toks0 WHERE regexp_matches(w, '^[a-z]+$')
),
target AS (
  SELECT w FROM toks WHERE w NOT IN {_KWIC_STOPS!r}
  GROUP BY w
  QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, w) = 1
),
ctx AS (
  SELECT t.doc_id, t.pos, t.w,
         COALESCE(LAG(t.w)  OVER (PARTITION BY t.doc_id ORDER BY t.pos),
                  '<s>') AS prev_w,
         COALESCE(LEAD(t.w) OVER (PARTITION BY t.doc_id ORDER BY t.pos),
                  '</s>') AS next_w
  FROM toks t
),
hits AS (
  SELECT c.prev_w, c.w AS keyword, c.next_w
  FROM ctx c JOIN target g ON c.w = g.w
)
SELECT CAST(row_number() OVER (ORDER BY COUNT(*) DESC, prev_w, next_w)
            AS BIGINT) AS rk,
       keyword, prev_w, next_w,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM hits
GROUP BY keyword, prev_w, next_w
QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, prev_w, next_w) <= 10
ORDER BY rk
"""


@register(
    "corpus_kwic_concordance",
    oracle=_ORACLE_KWIC,
    tags=("corpus", "text"),
    doc=(
        "KeyWord-In-Context concordance — corpus linguistics' oldest "
        "report: the most frequent non-stopword (deterministic "
        "(count DESC, word) selection over the vocab table) shown with "
        "its (previous, next) token contexts, top-10 context patterns "
        "by frequency.  Contexts come from lag/lead windows PARTITIONED "
        "per doc (shuffle once on doc_id; sentence boundaries marked "
        "<s>/</s>), the pattern ranking runs on the vocab^2-bounded "
        "context table.  Complements the positional phrase search "
        "(exact-phrase lookup) with the inverse question: what *does* "
        "surround this word?"
    ),
)
def corpus_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .where(F.col("w").rlike("^[a-z]+$"))
    )
    w_tgt = Window.orderBy(F.col("cnt").desc(), "w")
    target = (
        toks.where(~F.col("w").isin(*_KWIC_STOPS))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w_tgt))
        .where(F.col("rk") == 1)
        .select("w")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    ctx = toks.select(
        "doc_id",
        "w",
        F.coalesce(F.lag("w").over(w_doc), F.lit("<s>")).alias("prev_w"),
        F.coalesce(F.lead("w").over(w_doc), F.lit("</s>")).alias("next_w"),
    )
    hits = ctx.join(F.broadcast(target), "w").select(
        F.col("w").alias("keyword"), "prev_w", "next_w"
    )
    counted = hits.groupBy("keyword", "prev_w", "next_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    w_rk = Window.orderBy(F.col("n_occurrences").desc(), "prev_w", "next_w")
    return (
        counted.select(
            F.row_number().over(w_rk).cast("bigint").alias("rk"),
            "keyword",
            "prev_w",
            "next_w",
            "n_occurrences",
        )
        .where(F.col("rk") <= 10)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Functional-dependency discovery profile
# ---------------------------------------------------------------------------

_FD_COLS = ("event_type", "user_id", "day", "value_bucket")

def _fd_pair_sql(lhs: str, rhs: str) -> str:
    return f"""
  SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
         CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS n_lhs_distinct,
         CAST(COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT) AS n_pair_distinct,
         (SELECT COUNT(*) FROM (
            SELECT {lhs} FROM ev GROUP BY {lhs}
            HAVING COUNT(DISTINCT {rhs}) > 1)) AS n_violating_lhs
  FROM ev"""


_ORACLE_FD_FULL = (
    """
WITH ev AS (
  SELECT COALESCE(event_type, '<NULL>') AS event_type,
         COALESCE(CAST(user_id AS VARCHAR), '<NULL>') AS user_id,
         COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '<NULL>') AS day,
         COALESCE(CAST(CAST(round(value * 100.0, 0) AS BIGINT) // 10000
                       AS VARCHAR), '<NULL>')
           AS value_bucket
  FROM events WHERE value IS NOT NULL
),
pairs AS ("""
    + "\n  UNION ALL".join(
        _fd_pair_sql(a, b) for a in _FD_COLS for b in _FD_COLS if a != b
    )
    + """
)
SELECT lhs, rhs, n_lhs_distinct, n_pair_distinct,
       n_pair_distinct - n_lhs_distinct AS n_excess_mappings,
       CAST(n_violating_lhs AS BIGINT) AS n_violating_lhs,
       n_lhs_distinct = n_pair_distinct AS holds
FROM pairs ORDER BY lhs, rhs
"""
)


@register(
    "dq_functional_dependency_profile",
    oracle=_ORACLE_FD_FULL,
    tags=("dq", "profiling"),
    doc=(
        "Functional-dependency discovery over event columns (event_type, "
        "user_id, day, value_bucket): A->B holds iff |distinct A| == "
        "|distinct (A, B)|, with the violating-LHS count (values mapping "
        "to >1 RHS) computed exactly for every directed pair — the "
        "profiling primitive behind key-candidate detection and schema "
        "normalization (TANE's level-1 lattice, done as 12 independent "
        "distinct aggregates that AQE runs as one shared scan family).  "
        "Each pair's work is two hash distinct-aggregates + one grouped "
        "HAVING — map-side combinable, no windows, no joins beyond the "
        "final 12-row union."
    ),
)
def dq_functional_dependency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        # NULL-sentinel every FD column SYMMETRICALLY with the oracle:
        # DuckDB's COUNT(DISTINCT (lhs, rhs)) counts struct tuples with a
        # NULL field while Spark's countDistinct(lhs, rhs) drops them — a
        # latent cross-engine divergence in n_pair_distinct if any FD column
        # is ever NULL (ADVICE r9).  Coalescing both engines to '<NULL>'
        # makes the two distinct-count semantics agree for any input.
        .select(
            F.coalesce(F.col("event_type"), F.lit("<NULL>")).alias("event_type"),
            F.coalesce(F.col("user_id").cast("string"), F.lit("<NULL>")).alias(
                "user_id"
            ),
            F.coalesce(
                F.col("ts").cast("date").cast("string"), F.lit("<NULL>")
            ).alias("day"),
            F.coalesce(
                F.expr(
                    "CAST(CAST(round(value * 100.0, 0) AS BIGINT) DIV 10000"
                    " AS STRING)"
                ),
                F.lit("<NULL>"),
            ).alias("value_bucket"),
        )
        .persist()
    )
    parts = []
    for lhs in _FD_COLS:
        for rhs in _FD_COLS:
            if lhs == rhs:
                continue
            viol = (
                ev.groupBy(lhs)
                .agg(F.countDistinct(rhs).alias("nd"))
                .where(F.col("nd") > 1)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violating_lhs"))
            )
            agg = ev.agg(
                F.countDistinct(lhs).cast("bigint").alias("n_lhs_distinct"),
                F.countDistinct(lhs, rhs).cast("bigint").alias("n_pair_distinct"),
            )
            parts.append(
                agg.crossJoin(F.broadcast(viol)).select(
                    F.lit(lhs).alias("lhs"),
                    F.lit(rhs).alias("rhs"),
                    "n_lhs_distinct",
                    "n_pair_distinct",
                    (F.col("n_pair_distinct") - F.col("n_lhs_distinct")).alias(
                        "n_excess_mappings"
                    ),
                    "n_violating_lhs",
                    (F.col("n_lhs_distinct") == F.col("n_pair_distinct")).alias(
                        "holds"
                    ),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("lhs", "rhs")


# ---------------------------------------------------------------------------
# Fixed-width file format round-trip
# ---------------------------------------------------------------------------

_ORACLE_FIXED_WIDTH = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS sum_acctbal_e2,
       CAST(SUM(c_nationkey) AS BIGINT) AS sum_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_parse_ok
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register(
    "io_fixed_width_roundtrip",
    oracle=_ORACLE_FIXED_WIDTH,
    tags=("io",),
    doc=(
        "Fixed-width (mainframe/COBOL copybook) format round-trip — the "
        "delivery format the CSV/JSON/XML/gzip family was missing: "
        "customers rendered as 54-char records (12-char zero-padded key, "
        "3-char nation, sign+14-char zero-padded balance cents, 12-char "
        "space-padded segment, 12-char name tail) via one concat "
        "projection, written with spark.write.text, read back with "
        "spark.read.text and parsed by SUBSTRING OFFSETS ALONE — no "
        "delimiters anywhere — then audited per segment against the "
        "source (row counts, exact cent sums, nation sums, and a "
        "parse-consistency count).  Offset parsing is pure codegen "
        "expressions; the format's virtue at scale is fixed record "
        "length = trivially splittable input."
    ),
)
def io_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100.0, 0).cast("bigint")
    line = F.concat(
        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
        F.lpad(F.col("c_nationkey").cast("string"), 3, "0"),
        F.when(cents < 0, F.lit("-")).otherwise(F.lit("+")),
        F.lpad(F.abs(cents).cast("string"), 14, "0"),
        F.rpad(F.col("c_mktsegment"), 12, " "),
        F.rpad(F.substring(F.col("c_name"), 1, 12), 12, " "),
    )
    target = tempfile.mkdtemp(prefix="fixed_width_") + "/cust_fw"
    (
        cust.select(line.alias("value"))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .text(target)
    )
    back = spark.read.text(target).select(
        F.substring("value", 1, 12).cast("bigint").alias("c_custkey"),
        F.substring("value", 13, 3).cast("int").alias("c_nationkey"),
        (
            F.when(F.substring("value", 16, 1) == "-", -1).otherwise(1)
            * F.substring("value", 17, 14).cast("bigint")
        ).alias("acctbal_e2"),
        F.trim(F.substring("value", 31, 12)).alias("c_mktsegment"),
        F.length("value").alias("reclen"),
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("acctbal_e2").cast("bigint").alias("sum_acctbal_e2"),
            F.sum("c_nationkey").cast("bigint").alias("sum_nationkey"),
            F.sum(F.when(F.col("reclen") == 54, 1).otherwise(0))
            .cast("bigint")
            .alias("n_parse_ok"),
        )
        .orderBy("c_mktsegment")
    )
