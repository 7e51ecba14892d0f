"""Round-11 batch 4: Markov steady state and pseudo-relevance feedback.

* ``events_markov_stationary`` — the long-run event-type mix: a
  Laplace-smoothed 5x5 transition matrix from exact per-user transition
  counts, then SIXTEEN power iterations run entirely in INTEGER
  arithmetic inside one higher-order-function fold (e6-scaled state
  vector x e12-scaled matrix, floor division each step) — the same
  template-generated-for-both-engines fold device as
  events_page_hinkley_fold, lifted from a 5-cell to a 5-vector state.
* ``retrieval_prf_expansion`` — RM-style pseudo-relevance feedback:
  the BM25 top-10 feedback set for the pinned 3-term query votes
  expansion terms by tf x idf in integer micro-units; top-10 new terms.

Determinism contract as stats_r11: exact integers end-to-end (the
Markov fold never touches a float; PRF scores are floored micro-units),
one final float per readout column.  Scale: transition counting is one
lag window per user partition + a 25-cell grid; PRF's corpus-wide work
is the BM25 plan plus one vocabulary-bounded df aggregate.  Reference
scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Markov stationary distribution
# ---------------------------------------------------------------------------

_MK_STATES = ("click", "error", "purchase", "signup", "view")
_MK_ITERS = 16
_E12 = 1_000_000_000_000


def _mk_cell_sql(i: int, j: int) -> str:
    """SUM CASE for transition count prev=state_i -> cur=state_j.
    COALESCE pins the zero-TRANSITION corpus: an empty aggregate yields
    NULL cells whose NULL propagation through the fold differs between
    engines; 0 cells make Laplace smoothing render the uniform prior
    identically in both."""
    return (
        f"COALESCE(SUM(CASE WHEN prev = '{_MK_STATES[i]}' "
        f"AND cur = '{_MK_STATES[j]}' THEN 1 ELSE 0 END), 0)"
    )


def _mk_plist(arr_open: str, arr_close: str, intdiv: str) -> str:
    """The 25-element row-major e12-fixed smoothed transition matrix, as an
    array literal — identical arithmetic text in both engines, only the
    array syntax and integer-division operator differ."""
    cells = []
    for i in range(5):
        row_tot = " + ".join(f"c{i}{k}" for k in range(5))
        for j in range(5):
            cells.append(
                f"((c{i}{j} + 1) * {_E12}) {intdiv} (({row_tot}) + 5)"
            )
    return arr_open + ", ".join(cells) + arr_close


def _mk_step(acc: str, pl: str, idx, intdiv: str, arr_open: str, arr_close: str) -> str:
    """One power-iteration step: v'_j = (sum_i v_i * P[i][j]) div 1e12."""
    comps = []
    for j in range(1, 6):
        dot = " + ".join(
            f"{idx(acc, i)} * {idx(pl, (i - 1) * 5 + j)}" for i in range(1, 6)
        )
        comps.append(f"(({dot}) {intdiv} {_E12})")
    return arr_open + ", ".join(comps) + arr_close


def _spark_idx(arr: str, i: int) -> str:
    return f"element_at({arr}, {i})"


def _duck_idx(arr: str, i: int) -> str:
    return f"{arr}[{i}]"


_MK_V0_SPARK = "array(" + ", ".join(["CAST(200000 AS BIGINT)"] * 5) + ")"
_MK_V0_DUCK = "[" + ", ".join(["CAST(200000 AS BIGINT)"] * 5) + "]"

_MK_FOLD_SPARK = (
    f"aggregate(sequence(1, {_MK_ITERS}), {_MK_V0_SPARK}, (acc, k) -> "
    + _mk_step("acc", "pl", _spark_idx, "div", "array(", ")")
    + ")"
)
_MK_FOLD_DUCK = (
    "list_reduce(list_prepend("
    + _MK_V0_DUCK
    + f", list_transform(range(1, {_MK_ITERS + 1}), k -> {_MK_V0_DUCK})), "
    "(acc, e) -> " + _mk_step("acc", "pl", _duck_idx, "//", "[", "]") + ")"
)

_MK_STATES_SQL_DUCK = "[" + ", ".join(f"'{s}'" for s in _MK_STATES) + "]"
_MK_STATES_SQL_SPARK = "array(" + ", ".join(f"'{s}'" for s in _MK_STATES) + ")"

_ORACLE_MARKOV = f"""
WITH seq AS (
  SELECT event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
cells AS (
  SELECT {", ".join(_mk_cell_sql(i, j) + f" AS c{i}{j}" for i in range(5) for j in range(5))}
  FROM seq WHERE prev IS NOT NULL
),
mat AS (
  SELECT {_mk_plist("[", "]", "//")} AS pl,
         {", ".join(" + ".join(f"c{i}{k}" for k in range(5)) + f" AS r{i}" for i in range(5))}
  FROM cells
),
folded AS (
  SELECT pl, {", ".join(f"r{i}" for i in range(5))},
         {_MK_FOLD_DUCK} AS v
  FROM mat
)
SELECT st.j AS state_idx,
       {_MK_STATES_SQL_DUCK}[st.j] AS state,
       CAST(CASE st.j {" ".join(f"WHEN {i + 1} THEN r{i}" for i in range(5))} END
            AS BIGINT) AS n_transitions_out,
       CAST(v[st.j] AS BIGINT) AS stationary_e6,
       round(CAST(v[st.j] AS DOUBLE) / 1000000.0, 6) AS stationary
FROM folded, (SELECT unnest(range(1, 6)) AS j) st
ORDER BY state_idx
"""


@register(
    "events_markov_stationary",
    oracle=_ORACLE_MARKOV,
    tags=("events", "ml", "analytics"),
    doc=(
        "Long-run stationary distribution of the per-user event-type "
        "Markov chain: transition counts from one lag window per user "
        "partition, Laplace-smoothed into an e12-FIXED 5x5 integer "
        "matrix, and SIXTEEN power iterations run entirely in integer "
        "arithmetic inside one higher-order fold (e6-scaled probability "
        "vector, floor division each step — the fold body is "
        "template-GENERATED for both engines, only array syntax and the "
        "div operator differ, so every intermediate of all 16 "
        "iterations is bit-identical).  The long-run mix the raw type "
        "histogram misrepresents whenever transitions are sticky; 25 "
        "cells of state at any event volume."
    ),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    cells = seq.agg(
        *[
            F.expr(_mk_cell_sql(i, j)).alias(f"c{i}{j}")
            for i in range(5)
            for j in range(5)
        ]
    )
    mat = cells.select(
        F.expr(_mk_plist("array(", ")", "div")).alias("pl"),
        *[
            F.expr(" + ".join(f"c{i}{k}" for k in range(5))).alias(f"r{i}")
            for i in range(5)
        ],
    )
    folded = mat.select(
        "pl",
        *[f"r{i}" for i in range(5)],
        F.expr(_MK_FOLD_SPARK).alias("v"),
    )
    st = folded.select(
        F.explode(F.expr("sequence(1, 5)")).alias("state_idx"),
        "v",
        *[f"r{i}" for i in range(5)],
    )
    row_tot = F.expr(
        "CASE state_idx "
        + " ".join(f"WHEN {i + 1} THEN r{i}" for i in range(5))
        + " END"
    ).cast("bigint")
    return st.select(
        "state_idx",
        F.expr(f"element_at({_MK_STATES_SQL_SPARK}, state_idx)").alias("state"),
        row_tot.alias("n_transitions_out"),
        F.expr("element_at(v, state_idx)").cast("bigint").alias("stationary_e6"),
        F.round(
            F.expr("element_at(v, state_idx)").cast("double") / 1000000.0, 6
        ).alias("stationary"),
    ).orderBy("state_idx")


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback expansion
# ---------------------------------------------------------------------------

_PRF_TERMS = ("window", "merge", "stream")
_PRF_FEEDBACK_K = 10
_PRF_TOPK = 10
_PRF_TERMS_SQL = ", ".join(f"'{t}'" for t in _PRF_TERMS)

#: BM25 partial in micro-units — the corpus_bm25_search expression verbatim.
_PRF_BM25_MICRO = (
    "CAST(floor(1000000.0 * ("
    "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    " * (tf * 2.2)"
    " / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
    ")) AS BIGINT)"
)

#: Expansion-term idf in micro-units (plain ln(N/df); df >= 1 by construction).
_PRF_IDF_MICRO = (
    "CAST(floor(1000000.0 * ln(CAST(n_docs AS DOUBLE) / df)) AS BIGINT)"
)

_ORACLE_PRF = rf"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM lens
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
qtf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term IN ({_PRF_TERMS_SQL})
  GROUP BY 1, 2
),
qdf AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
scored AS (
  SELECT qtf.doc_id, {_PRF_BM25_MICRO} AS term_micro
  FROM qtf JOIN qdf USING (term)
  JOIN lens ON lens.doc_id = qtf.doc_id
  CROSS JOIN stats
),
feedback AS (
  SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS bm25_micro
  FROM scored GROUP BY doc_id
  ORDER BY bm25_micro DESC, doc_id LIMIT {_PRF_FEEDBACK_K}
),
ftf AS (
  SELECT tok.term, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT tok.doc_id) AS BIGINT) AS n_feedback_docs
  FROM tok JOIN feedback USING (doc_id)
  WHERE tok.term NOT IN ({_PRF_TERMS_SQL})
    AND length(tok.term) >= 3
  GROUP BY tok.term
),
fdf AS (
  SELECT tok.term, CAST(COUNT(DISTINCT tok.doc_id) AS BIGINT) AS df
  FROM tok JOIN ftf USING (term) GROUP BY tok.term
),
expanded AS (
  SELECT ftf.term, ftf.n_feedback_docs, ftf.tf,
         CAST(ftf.tf * {_PRF_IDF_MICRO} AS BIGINT) AS score_micro
  FROM ftf JOIN fdf USING (term) CROSS JOIN stats
)
SELECT term, n_feedback_docs, tf, score_micro
FROM expanded
ORDER BY score_micro DESC, term LIMIT {_PRF_TOPK}
"""


@register(
    "retrieval_prf_expansion",
    oracle=_ORACLE_PRF,
    tags=("retrieval", "text", "corpus"),
    doc=(
        f"Pseudo-relevance feedback query expansion: the BM25 top-"
        f"{_PRF_FEEDBACK_K} feedback set for the pinned 3-term query "
        "votes candidate terms by tf-in-feedback x corpus idf, both in "
        "exact integer micro-units (the BM25 partials reuse "
        "corpus_bm25_search's floored expression verbatim; expansion idf "
        "is floored ln(N/df)), original query terms and sub-3-char "
        "tokens excluded, top-10 by (score, term).  The classic "
        "RM/Rocchio recall lever for the repo's retrieval stack — the "
        "terms you'd OR into the query next.  Corpus-wide work: the "
        "BM25 plan + one vocabulary-bounded df aggregate over the "
        "feedback postings."
    ),
)
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    lens = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tok = toks.select("doc_id", F.explode("toks").alias("term"))
    qtf = (
        tok.where(F.col("term").isin(list(_PRF_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        qtf.join(F.broadcast(qdf), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.expr(_PRF_BM25_MICRO).alias("term_micro"))
    )
    feedback = (
        scored.groupBy("doc_id")
        .agg(F.sum("term_micro").cast("bigint").alias("bm25_micro"))
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(_PRF_FEEDBACK_K)
        .select("doc_id")
    )
    ftf = (
        tok.join(F.broadcast(feedback), "doc_id")
        .where(
            ~F.col("term").isin(list(_PRF_TERMS)) & (F.length("term") >= 3)
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.countDistinct("doc_id").cast("bigint").alias("n_feedback_docs"),
        )
    )
    fdf = (
        tok.join(ftf.select("term"), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("df"))
    )
    expanded = (
        ftf.join(fdf, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "n_feedback_docs",
            "tf",
            (F.col("tf") * F.expr(_PRF_IDF_MICRO)).cast("bigint").alias(
                "score_micro"
            ),
        )
    )
    return expanded.orderBy(F.col("score_micro").desc(), "term").limit(
        _PRF_TOPK
    )
