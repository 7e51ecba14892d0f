"""Corpus mining + robust-fit operators (round 9c).

* ``corpus_cooc_svd_embedding`` — spectral word embedding from bigram
  co-occurrence statistics (the LSA / PPMI-SVD family): an exact-integer
  positive-lift association matrix over the vocabulary, then two power-
  iteration rounds toward its dominant singular direction, reusing the
  bit-exact integer matvec/rescale machinery of ``embed_power_iteration``.
  Lift (capped, fixed-point) replaces log-PMI deliberately: it is an
  exact BIGINT ratio, so no transcendental crosses the engine boundary.
* ``ml_quantile_regression_pinball`` — quantile regression by exact grid
  search: 41 candidate slopes, the optimal intercept for each slope IS
  the tau-quantile of its residuals (an order statistic, not an
  optimization), and the pinball loss is an exact scaled integer.  The
  tau-companion of ``window_rolling_regression``'s mean fit.
* ``text_rake_keywords`` — RAKE (Rapid Automatic Keyword Extraction,
  Rose et al. 2010): stopword-delimited candidate phrases, word score =
  degree/frequency kept as fixed-point integers (rounded per WORD before
  the phrase sum, so summation order cannot flake), phrases ranked by
  member-score sum.  The statistical sibling of the graph-based
  ``text_textrank_keywords``.
* ``corpus_phrase_search_positional`` — positional-index phrase search:
  the query set is the corpus's own top-3 bigrams, matched by the
  classic positional-adjacency join (term1 at pos p AND term2 at p+1 in
  the same doc) — the IR operator ``corpus_boolean_search`` cannot
  express because a doc-level index has no positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Spectral word embedding from co-occurrence lift (PPMI-SVD family)
# ---------------------------------------------------------------------------

_LIFT_FP = 10000   # lift fixed-point scale
_LIFT_CAP = 10**6  # cap rare-pair lift so matvec magnitudes stay bounded
_SVD_VS = 65536    # vector rescale target between power-iteration rounds

_ORACLE_COOC_SVD = f"""
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
big AS (
  SELECT t1.w AS w1, t2.w AS w2
  FROM toks0 t1 JOIN toks0 t2
    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  WHERE regexp_matches(t1.w, '^[a-z]+$')
    AND regexp_matches(t2.w, '^[a-z]+$')
),
sym AS (
  SELECT w1, w2 FROM big UNION ALL SELECT w2, w1 FROM big
),
cooc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM sym GROUP BY w1, w2
),
marg AS (
  SELECT w1 AS w, CAST(SUM(c12) AS BIGINT) AS c FROM cooc GROUP BY w1
),
tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM cooc),
m AS (
  SELECT co.w1, co.w2,
         least((co.c12 * {_LIFT_FP} * t.n) // (m1.c * m2.c),
               {_LIFT_CAP}) AS lift_fp
  FROM cooc co
  JOIN marg m1 ON m1.w = co.w1
  JOIN marg m2 ON m2.w = co.w2
  CROSS JOIN tot t
  WHERE co.c12 * t.n > m1.c * m2.c
),
u1 AS (SELECT w1 AS w, CAST(SUM(lift_fp) AS BIGINT) AS u FROM m GROUP BY w1),
s1 AS (SELECT MAX(u) // {_SVD_VS} + 1 AS s FROM u1),
v1 AS (SELECT w, u // s AS v FROM u1, s1),
u2 AS (
  SELECT m.w1 AS w, CAST(SUM(m.lift_fp * v1.v) AS BIGINT) AS u
  FROM m JOIN v1 ON m.w2 = v1.w
  GROUP BY m.w1
),
s2 AS (SELECT MAX(u) // {_SVD_VS} + 1 AS s FROM u2)
SELECT w AS word, CAST(u // s AS BIGINT) AS v
FROM u2, s2
ORDER BY word
"""


@register(
    "corpus_cooc_svd_embedding",
    oracle=_ORACLE_COOC_SVD,
    tags=("corpus", "embedding", "iterative"),
    doc=(
        "Spectral word embedding from bigram co-occurrence (LSA / "
        "PPMI-SVD family, Levy & Goldberg 2014): symmetric bigram "
        "counts, an EXACT-INTEGER positive-lift association matrix "
        "(lift_fp = min(c12*N*1e4 div c1*c2, 1e6) with the >0 filter "
        "playing PPMI's positivity — a rational statistic chosen over "
        "log-PMI precisely so no transcendental crosses the engine "
        "boundary), then two power-iteration rounds toward the dominant "
        "singular direction with integer max-rescale between rounds "
        "(the embed_power_iteration machinery on a vocab x vocab "
        "matrix).  Token and bigram aggregates are the only "
        "corpus-scale passes (map-side combinable); the matrix and "
        "vectors are vocabulary-bounded broadcasts.  At 100 TB the "
        "BIGINT lift intermediate (c12*1e4*N) needs the documented "
        "DECIMAL(38,0) swap once N exceeds ~3e7 bigrams per the "
        "overflow analysis; everything else scales untouched."
    ),
)
def corpus_cooc_svd_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import spread

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    # spread: the per-row bigram explode is CPU-bound; without it the whole
    # corpus tokenizes on the single fixture input partition (r11
    # optimization round — same rationale as the shingle posting joins).
    toks = spread(docs, "doc_id").select(F.split("text", " ").alias("ws"))
    big = (
        toks.select(
            F.explode(
                # CASE guard: Spark's sequence(1, 0) is DESCENDING, so a
                # single-token doc must yield an empty bigram array.
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN "
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> struct(ws[i-1] AS w1, ws[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .where(F.col("w1").rlike("^[a-z]+$") & F.col("w2").rlike("^[a-z]+$"))
    )
    # Symmetrize AFTER the first aggregate: counting directed bigrams first
    # collapses the corpus-scale stream to vocab² rows, so the swapped
    # union + re-aggregate touch only vocabulary-bounded data (before, the
    # union doubled the corpus-scale shuffle and the bigram pass ran twice).
    # sum(c) over {(w1,w2,c), (w2,w1,c)} == count over the row-level union.
    dir_cnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cooc = (
        dir_cnt.unionAll(
            dir_cnt.select(
                F.col("w2").alias("w1"), F.col("w1").alias("w2"), F.col("c")
            )
        )
        .groupBy("w1", "w2")
        .agg(F.sum("c").cast("bigint").alias("c12"))
        # localCheckpoint, not persist (r12, VERDICT r11 "What's wrong
        # #2"): marg, tot and m all re-derive from cooc, so the
        # vocab²-bounded table must materialize once — but persist()
        # with no unpersist pins the blocks for the life of a shared
        # session.  Checkpoint blocks release when the plan is GC'd.
        # eager=True is deliberate: with AQE even eager=False executes
        # every upstream shuffle stage at construction (only the final
        # stage defers), so laziness buys nothing here.
        .localCheckpoint(eager=True)
    )
    marg = cooc.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c12").cast("bigint").alias("c")
    )
    tot = cooc.agg(F.sum("c12").cast("bigint").alias("n"))
    m = (
        cooc.join(marg.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(marg.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .where(F.col("c12") * F.col("n") > F.col("c1") * F.col("c2"))
        .select(
            "w1",
            "w2",
            F.least(
                F.expr(f"(c12 * {_LIFT_FP} * n) DIV (c1 * c2)"),
                F.lit(_LIFT_CAP).cast("bigint"),
            ).alias("lift_fp"),
        )
        .persist()
    )
    u1 = m.groupBy(F.col("w1").alias("w")).agg(
        F.sum("lift_fp").cast("bigint").alias("u")
    )
    s1 = u1.agg((F.expr(f"max(u) DIV {_SVD_VS}") + 1).alias("s"))
    v1 = u1.crossJoin(F.broadcast(s1)).select("w", F.expr("u DIV s").alias("v"))
    u2 = (
        m.join(F.broadcast(v1.withColumnRenamed("w", "w2")), "w2")
        .groupBy(F.col("w1").alias("w"))
        .agg(F.sum(F.col("lift_fp") * F.col("v")).cast("bigint").alias("u"))
    )
    s2 = u2.agg((F.expr(f"max(u) DIV {_SVD_VS}") + 1).alias("s"))
    return (
        u2.crossJoin(F.broadcast(s2))
        .select(
            F.col("w").alias("word"), F.expr("u DIV s").cast("long").alias("v")
        )
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# Quantile regression by exact grid search (pinball loss)
# ---------------------------------------------------------------------------

_QR_SLOPES = 41      # slope grid: -2000..2000 cents/day step 100
_QR_STEP = 100

_ORACLE_PINBALL = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(SUM(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
  GROUP BY 1
),
grid AS (
  SELECT ({_QR_STEP} * (g.x - {(_QR_SLOPES - 1) // 2})) AS slope
  FROM range(0, {_QR_SLOPES}) g(x)
),
resid AS (
  SELECT g.slope, d.y - g.slope * d.x AS r
  FROM grid g, daily d
),
taus(tau_x10) AS (VALUES (5), (9)),
ranked AS (
  SELECT slope, r,
         row_number() OVER (PARTITION BY slope ORDER BY r) AS rk,
         COUNT(*) OVER (PARTITION BY slope) AS n
  FROM resid
),
icept AS (
  SELECT t.tau_x10, rk.slope, rk.r AS b
  FROM ranked rk JOIN taus t
    ON rk.rk = (t.tau_x10 * rk.n + 9) // 10
),
loss AS (
  SELECT i.tau_x10, i.slope, i.b,
         CAST(SUM(CASE WHEN rs.r >= i.b
                       THEN i.tau_x10 * (rs.r - i.b)
                       ELSE (10 - i.tau_x10) * (i.b - rs.r) END) AS BIGINT)
           AS pinball_x10
  FROM icept i JOIN resid rs ON rs.slope = i.slope
  GROUP BY i.tau_x10, i.slope, i.b
)
SELECT CAST(tau_x10 AS BIGINT) AS tau_x10,
       CAST(slope AS BIGINT) AS slope_e2_per_day,
       CAST(b AS BIGINT) AS intercept_e2, pinball_x10
FROM loss
QUALIFY row_number() OVER (PARTITION BY tau_x10
                           ORDER BY pinball_x10, slope) = 1
ORDER BY tau_x10
"""


@register(
    "ml_quantile_regression_pinball",
    oracle=_ORACLE_PINBALL,
    tags=("ml", "robust", "stats"),
    doc=(
        "Quantile regression by EXACT grid search: 41 candidate slopes "
        "over the daily revenue series, and for each slope the optimal "
        "intercept is not an optimization at all — it is the "
        "tau-quantile ORDER STATISTIC of that slope's residuals "
        "(pinball loss is piecewise-linear in b, minimized at the "
        "quantile).  Loss kept as an exact x10 integer (tau in tenths), "
        "winner per tau by (loss, slope).  Model-parallel scoring is "
        "the distributed pattern: every (slope, day) cell is "
        "independent, so the grid rides ONE broadcast join — at 100 TB "
        "you widen the grid or nest a second refinement pass "
        "(coarse-to-fine like the two-phase quantile selection), never "
        "serialize.  Completes the regression family: OLS mean "
        "(agg_regr_battery), rolling OLS (window_rolling_regression), "
        "robust median slope (ml_theil_sen_daily), consensus "
        "(ml_ransac_line_md5), and now conditional quantiles."
    ),
)
def ml_quantile_regression_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
        .select(
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
            "y",
        )
    )
    grid = spark.range(0, _QR_SLOPES).select(
        (_QR_STEP * (F.col("id") - (_QR_SLOPES - 1) // 2))
        .cast("bigint")
        .alias("slope")
    )
    resid = grid.crossJoin(daily).select(
        "slope", (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    taus = spark.createDataFrame([(5,), (9,)], "tau_x10 int")
    w_rk = Window.partitionBy("slope").orderBy("r")
    w_n = Window.partitionBy("slope")
    ranked = resid.select(
        "slope",
        "r",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    icept = ranked.join(
        F.broadcast(taus),
        F.col("rk") == F.expr("(tau_x10 * n + 9) DIV 10"),
    ).select("tau_x10", "slope", F.col("r").alias("b"))
    loss = (
        icept.join(resid.withColumnRenamed("r", "rr"), "slope")
        .groupBy("tau_x10", "slope", "b")
        .agg(
            F.sum(
                F.when(
                    F.col("rr") >= F.col("b"),
                    F.col("tau_x10") * (F.col("rr") - F.col("b")),
                ).otherwise((10 - F.col("tau_x10")) * (F.col("b") - F.col("rr")))
            )
            .cast("bigint")
            .alias("pinball_x10")
        )
    )
    w_best = Window.partitionBy("tau_x10").orderBy("pinball_x10", "slope")
    return (
        loss.withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select(
            F.col("tau_x10").cast("bigint").alias("tau_x10"),
            F.col("slope").cast("bigint").alias("slope_e2_per_day"),
            F.col("b").cast("bigint").alias("intercept_e2"),
            "pinball_x10",
        )
        .orderBy("tau_x10")
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_STOPS = ("a", "the", "of", "and", "to", "in")
_RAKE_SCALE = 1000

_ORACLE_RAKE = f"""
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
toks AS (
  SELECT doc_id, pos, w FROM toks0 WHERE regexp_matches(w, '^[a-z]+$')
),
flagged AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN {_RAKE_STOPS!r} THEN 1 ELSE 0 END AS is_stop
  FROM toks
),
phrased0 AS (
  SELECT doc_id, pos, w, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
  FROM flagged
),
phrased AS (
  SELECT doc_id, pos, w, phrase_id FROM phrased0 WHERE is_stop = 0
),
members AS (
  SELECT doc_id, phrase_id, pos, w,
         COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS plen
  FROM phrased
),
wordstats AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM members GROUP BY w
),
wscore AS (
  SELECT w, (degree * {_RAKE_SCALE}) // freq AS score_fp FROM wordstats
),
phrases AS (
  SELECT m.doc_id, m.phrase_id,
         string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
         CAST(SUM(ws.score_fp) AS BIGINT) AS score_fp
  FROM members m JOIN wscore ws ON ws.w = m.w
  GROUP BY m.doc_id, m.phrase_id
),
uniq AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MIN(score_fp) AS score_fp
  FROM phrases GROUP BY phrase
)
SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, phrase) AS BIGINT)
         AS rk,
       phrase, score_fp, n_occurrences
FROM uniq
QUALIFY row_number() OVER (ORDER BY score_fp DESC, phrase) <= 15
ORDER BY rk
"""


@register(
    "text_rake_keywords",
    oracle=_ORACLE_RAKE,
    tags=("text", "keywords"),
    doc=(
        "RAKE keyword extraction (Rose et al. 2010): candidate phrases "
        "are maximal stopword-free token runs (phrase id = running "
        "stopword count, a PER-DOC window), word score = degree/freq "
        "where degree sums the lengths of phrases containing the word — "
        "kept as fixed-point integers rounded PER WORD before the "
        "phrase-level sum, so float summation order cannot flake the "
        "cross-engine hash.  Phrases ranked by member-score sum, top-15 "
        "with (score DESC, phrase) tie-break.  The statistical sibling "
        "of text_textrank_keywords (graph voting) and "
        "corpus_keyness_loglikelihood (reference-corpus contrast): "
        "three keyword extractors, three different signals.  Word "
        "stats and the final ranking are vocabulary-scale; per-doc "
        "windows shuffle once on doc_id."
    ),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .where(F.col("w").rlike("^[a-z]+$"))
    )
    flagged = toks.select(
        "doc_id",
        "pos",
        "w",
        F.when(F.col("w").isin(*_RAKE_STOPS), 1).otherwise(0).alias("is_stop"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phrased = flagged.select(
        "doc_id", "pos", "w", "is_stop", F.sum("is_stop").over(w_run).alias("phrase_id")
    ).where(F.col("is_stop") == 0)
    w_len = Window.partitionBy("doc_id", "phrase_id")
    members = phrased.select(
        "doc_id", "phrase_id", "pos", "w", F.count(F.lit(1)).over(w_len).alias("plen")
    )
    wordstats = members.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    wscore = wordstats.select(
        "w", F.expr(f"(degree * {_RAKE_SCALE}) DIV freq").alias("score_fp")
    )
    phrases = (
        members.join(wscore, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("score_fp").cast("bigint").alias("score_fp"),
        )
    )
    uniq = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.min("score_fp").alias("score_fp"),
    )
    w_rk = Window.orderBy(F.col("score_fp").desc(), "phrase")
    return (
        uniq.select(
            F.row_number().over(w_rk).cast("bigint").alias("rk"),
            "phrase",
            "score_fp",
            "n_occurrences",
        )
        .where(F.col("rk") <= 15)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Positional-index phrase search
# ---------------------------------------------------------------------------

_ORACLE_PHRASE = """
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
toks AS (
  SELECT doc_id, pos, w FROM toks0 WHERE regexp_matches(w, '^[a-z]+$')
),
bigcnt AS (
  SELECT t1.w AS w1, t2.w AS w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks t1 JOIN toks t2
    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  GROUP BY t1.w, t2.w
),
queries AS (
  SELECT w1, w2, c,
         row_number() OVER (ORDER BY c DESC, w1, w2) AS qid
  FROM bigcnt
  QUALIFY row_number() OVER (ORDER BY c DESC, w1, w2) <= 3
),
hits AS (
  SELECT q.qid, q.w1, q.w2, t1.doc_id
  FROM queries q
  JOIN toks t1 ON t1.w = q.w1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
              AND t2.w = q.w2
),
perdoc AS (
  SELECT qid, w1, w2, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
  FROM hits GROUP BY qid, w1, w2, doc_id
),
champed AS (
  SELECT *, MAX(occ) OVER (PARTITION BY qid) AS qmax FROM perdoc
)
SELECT CAST(qid AS BIGINT) AS qid,
       w1 || ' ' || w2 AS phrase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(occ) AS BIGINT) AS n_occurrences,
       CAST(MAX(occ) AS BIGINT) AS max_occ_per_doc,
       CAST(MIN(CASE WHEN occ = qmax THEN doc_id END) AS BIGINT) AS top_doc_id
FROM champed
GROUP BY qid, w1, w2
ORDER BY qid
"""


@register(
    "corpus_phrase_search_positional",
    oracle=_ORACLE_PHRASE,
    tags=("corpus", "retrieval"),
    doc=(
        "Positional-index phrase search: the classic IR operator a "
        "doc-level inverted index (corpus_inverted_index, "
        "corpus_boolean_search) cannot express — exact phrase matching "
        "via the positional-adjacency join (term1 at pos p AND term2 at "
        "pos p+1 in the same doc).  The query set is the corpus's own "
        "top-3 bigrams (deterministic (count DESC, words) ranking over "
        "the vocab^2-bounded bigram table), so the query is "
        "self-contained; per-phrase doc counts, occurrence totals, and "
        "the (max-occ, min-doc) champion doc are reported.  The "
        "adjacency join shuffles on doc_id and is posting-list-sized "
        "per term — the standard two-term phrase plan in any positional "
        "index (Manning et al., IIR ch.2)."
    ),
)
def corpus_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "w")
    )
    t2 = toks.select(
        F.col("doc_id"), (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    bigcnt = (
        toks.join(t2, ["doc_id", "pos"])
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w_q = Window.orderBy(F.col("c").desc(), "w1", "w2")
    queries = (
        bigcnt.withColumn("qid", F.row_number().over(w_q))
        .where(F.col("qid") <= 3)
        .select("qid", "w1", "w2")
    )
    hits = (
        queries.join(toks.withColumnRenamed("w", "w1"), "w1")
        .join(
            toks.select(
                "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2m")
            ).withColumnRenamed("w2m", "w2"),
            ["doc_id", "pos", "w2"],
        )
    )
    perdoc = hits.groupBy("qid", "w1", "w2", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    w_max = Window.partitionBy("qid")
    champ = perdoc.withColumn("qmax", F.max("occ").over(w_max))
    return (
        champ.groupBy("qid", "w1", "w2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("occ").cast("bigint").alias("n_occurrences"),
            F.max("occ").cast("bigint").alias("max_occ_per_doc"),
            F.min(F.when(F.col("occ") == F.col("qmax"), F.col("doc_id")))
            .cast("bigint")
            .alias("top_doc_id"),
        )
        .select(
            F.col("qid").cast("bigint").alias("qid"),
            F.concat_ws(" ", "w1", "w2").alias("phrase"),
            "n_docs",
            "n_occurrences",
            "max_occ_per_doc",
            "top_doc_id",
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Burrows' Delta authorship distance between sources
# ---------------------------------------------------------------------------

_BD_TOPW = 20

_ORACLE_BURROWS = f"""
WITH toks0 AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
toks AS (
  SELECT source, w FROM toks0 WHERE regexp_matches(w, '^[a-z]+$')
),
topw AS (
  SELECT w FROM toks GROUP BY w
  QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, w) <= {_BD_TOPW}
),
stot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY source),
cnt AS (
  SELECT t.source, t.w, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks t JOIN topw ON t.w = topw.w
  GROUP BY t.source, t.w
),
grid AS (
  SELECT s.source, topw.w,
         (COALESCE(c.c, 0) * 1000000) // s.n AS x_ppm
  FROM stot s CROSS JOIN topw
  LEFT JOIN cnt c ON c.source = s.source AND c.w = topw.w
),
wstats AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x_ppm) AS BIGINT) AS sx,
         CAST(SUM(x_ppm * x_ppm) AS BIGINT) AS sx2
  FROM grid GROUP BY w
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.w,
         abs(a.x_ppm - b.x_ppm) AS dx,
         ws.k, ws.sx, ws.sx2
  FROM grid a
  JOIN grid b ON a.w = b.w AND a.source < b.source
  JOIN wstats ws ON ws.w = a.w
  WHERE ws.k * ws.sx2 > ws.sx * ws.sx
),
terms AS (
  -- per-word z-gap floored to e6 BEFORE the sum (order-hazard-free)
  SELECT src_a, src_b,
         CAST(floor(CAST(dx AS DOUBLE) * CAST(k AS DOUBLE) * 1000000.0
                    / sqrt(CAST(k * sx2 - sx * sx AS DOUBLE)))
              AS BIGINT) AS zgap_e6
  FROM pairs
),
delta AS (
  SELECT src_a, src_b,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(zgap_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
           AS delta_e6
  FROM terms GROUP BY src_a, src_b
)
SELECT CAST(row_number() OVER (ORDER BY delta_e6, src_a, src_b) AS BIGINT)
         AS rk,
       src_a, src_b, n_words, delta_e6
FROM delta
QUALIFY row_number() OVER (ORDER BY delta_e6, src_a, src_b) <= 10
ORDER BY rk
"""


@register(
    "corpus_burrows_delta",
    oracle=_ORACLE_BURROWS,
    tags=("corpus", "stylometry"),
    doc=(
        "Burrows' Delta (2002) — stylometry's standard authorship "
        "distance — between corpus sources: the top-20 function-word "
        "frequencies per source as exact floor-ppm integers, per-word "
        "z-scores against the cross-source mean/std (variance kept as "
        "the exact BIGINT k*Sx2 - Sx^2; zero-variance words dropped by "
        "the exact integer test), and Delta(a,b) = mean |z_a - z_b| "
        "with every per-word z-gap FLOORED to e6 before the sum so "
        "float addition order cannot flake the hash.  Top-10 most "
        "similar source pairs reported.  The word x source grid is "
        "20x20; the only corpus-scale pass is the token count — "
        "attribution over a 100 TB corpus costs one combinable "
        "aggregate plus sketch-sized arithmetic."
    ),
)
def corpus_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w").rlike("^[a-z]+$"))
    w_top = Window.orderBy(F.col("cnt").desc(), "w")
    topw = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w_top))
        .where(F.col("rk") <= _BD_TOPW)
        .select("w")
    )
    stot = toks.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cnt = (
        toks.join(F.broadcast(topw), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = (
        stot.crossJoin(F.broadcast(topw))
        .join(cnt, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr("(COALESCE(c, 0) * 1000000) DIV n").alias("x_ppm"),
        )
    )
    wstats = grid.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x_ppm").cast("bigint").alias("sx"),
        F.sum(F.col("x_ppm") * F.col("x_ppm")).cast("bigint").alias("sx2"),
    )
    a = grid.select(
        F.col("source").alias("src_a"), "w", F.col("x_ppm").alias("xa")
    )
    b = grid.select(
        F.col("source").alias("src_b"), F.col("w").alias("w"), F.col("x_ppm").alias("xb")
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(wstats), "w")
        .where(
            F.col("k") * F.col("sx2") > F.col("sx") * F.col("sx")
        )
    )
    terms = pairs.select(
        "src_a",
        "src_b",
        F.floor(
            F.abs(F.col("xa") - F.col("xb")).cast("double")
            * F.col("k").cast("double")
            * 1000000.0
            / F.sqrt(
                (F.col("k") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
            )
        )
        .cast("bigint")
        .alias("zgap_e6"),
    )
    delta = terms.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.expr("SUM(zgap_e6) DIV COUNT(*)").cast("bigint").alias("delta_e6"),
    )
    w_rk = Window.orderBy("delta_e6", "src_a", "src_b")
    return (
        delta.select(
            F.row_number().over(w_rk).cast("bigint").alias("rk"),
            "src_a",
            "src_b",
            "n_words",
            "delta_e6",
        )
        .where(F.col("rk") <= 10)
        .orderBy("rk")
    )
