"""Round-10 sequential-state operators: DTW and a sharded Misra-Gries sketch.

Both are bounded-state sequential recursions executed ENGINE-SIDE as
deterministic folds (the events_holt_linear_fold pattern: array_sort fixes a
total order, Spark ``aggregate()`` and DuckDB ``list_reduce`` execute the
identical operation sequence), so the DuckDB differ checks them
bit-for-bit — no UDF, no driver loop.

* ``events_dtw_daily`` — dynamic time warping distance between the click
  and view daily-count series via a NESTED fold (outer over series A,
  inner over the DP row): the classic O(n*m) alignment DP, row-local and
  calendar-bounded.
* ``corpus_misra_gries_sharded`` — the Misra-Gries heavy-hitter summary
  the way a cluster actually runs it: one k-counter sketch per
  DETERMINISTIC shard (doc_id % 16 — a stand-in for partition id that
  both engines can reproduce), merged by summation, with the merged
  estimate checked against exact counts AND the theoretical deficit
  bound sum(floor(N_s/(k+1))).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# Dynamic time warping between two daily series
# ---------------------------------------------------------------------------

_DTW_BIG = 1 << 40  # effectively-infinite DP border; sums stay < 2*BIG

_ORACLE_DTW = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
arrs AS (
  -- COALESCE: list() over zero rows is NULL in DuckDB but [] in Spark's
  -- collect_list — pin the empty-series contract to [] in both engines
  SELECT COALESCE(list(x ORDER BY d) FILTER (event_type = 'click'),
                  CAST([] AS BIGINT[])) AS A,
         COALESCE(list(x ORDER BY d) FILTER (event_type = 'view'),
                  CAST([] AS BIGINT[])) AS B
  FROM daily
),
dp AS (
  SELECT len(A) AS n_a, len(B) AS n_b,
         list_reduce(
           list_prepend(
             list_transform(range(0, len(B) + 1),
                            j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                      ELSE CAST({_DTW_BIG} AS BIGINT) END),
             list_transform(A, a -> [a])
           ),
           (acc, e) -> list_reduce(
               list_prepend([CAST({_DTW_BIG} AS BIGINT)],
                            list_transform(range(1, len(B) + 1), j -> [j])),
               (s, jj) -> list_append(s,
                   abs(e[1] - B[jj[1]]) + least(acc[jj[1]],
                                                acc[jj[1] + 1],
                                                s[-1]))
           )
         )[-1] AS dtw
  FROM arrs
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(dtw AS BIGINT) AS dtw_distance,
       CASE WHEN n_a + n_b = 0 THEN NULL
            ELSE round(CAST(dtw AS DOUBLE) / CAST(n_a + n_b AS DOUBLE), 6)
       END AS dtw_per_step
FROM dp
"""


@register(
    "events_dtw_daily",
    oracle=_ORACLE_DTW,
    tags=("events", "timeseries", "similarity"),
    doc=(
        "Dynamic time warping distance between the click and view daily "
        "count series: the full O(n*m) alignment DP executed as a NESTED "
        "engine-side fold — outer aggregate() over series A carrying the "
        "previous DP row, inner aggregate() over the row positions "
        "carrying the partial new row (new[j] needs new[j-1], so the "
        "inner dependency is itself a fold) — |a-b| integer costs, "
        "BIGINT state, zero floats until the final per-step "
        "normalization.  DTW is THE alignment measure for series that "
        "drift in phase (promotions shift clicks days before views); "
        "both series are calendar-bounded so the DP is row-local "
        "bounded state, and at 100 TB one such DP runs per "
        "entity-partition, embarrassingly parallel.  DuckDB executes "
        "the identical recursion via nested list_reduce — bit-equal."
    ),
)
def events_dtw_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    arrs = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type") == "click", F.struct("d", "x")
                    )
                )
            ),
            lambda s: s["x"],
        ).alias("A"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "view", F.struct("d", "x"))
                )
            ),
            lambda s: s["x"],
        ).alias("B"),
    )
    dp_expr = f"""
element_at(
  aggregate(
    A,
    transform(sequence(0, size(B)),
              j -> IF(j = 0, CAST(0 AS BIGINT), CAST({_DTW_BIG} AS BIGINT))),
    (prev, a) -> aggregate(
        sequence(1, size(B)),
        array(CAST({_DTW_BIG} AS BIGINT)),
        (s, j) -> concat(s, array(
            abs(a - element_at(B, j)) + least(
                element_at(prev, j),
                element_at(prev, j + 1),
                element_at(s, -1))))
    )
  ), -1)
"""
    return arrs.select(
        F.size("A").cast("bigint").alias("n_a"),
        F.size("B").cast("bigint").alias("n_b"),
        F.expr(dp_expr).cast("bigint").alias("dtw_distance"),
        F.when(F.size("A") + F.size("B") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.expr(dp_expr).cast("double")
                / (F.size("A") + F.size("B")).cast("double"),
                6,
            )
        )
        .alias("dtw_per_step"),
    )


# ---------------------------------------------------------------------------
# Sharded Misra-Gries heavy hitters with merged-deficit audit
# ---------------------------------------------------------------------------

_MG_K = 8
_MG_SHARDS = 16

_ORACLE_MG = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
sharded AS (
  SELECT doc_id % {_MG_SHARDS} AS shard, doc_id, pos, w FROM tok
),
streams AS (
  SELECT shard, list(w ORDER BY doc_id, pos) AS ws,
         CAST(COUNT(*) AS BIGINT) AS n_s
  FROM sharded GROUP BY shard
),
folded AS (
  SELECT shard, n_s,
         list_reduce(
           list_prepend(CAST([] AS STRUCT(w VARCHAR, c BIGINT)[]),
                        list_transform(ws, e -> [{{'w': e,
                                                   'c': CAST(0 AS BIGINT)}}])),
           (acc, el) -> CASE
             WHEN len(list_filter(acc, p -> p.w = el[1].w)) > 0
               THEN list_transform(acc, p -> CASE WHEN p.w = el[1].w
                         THEN {{'w': p.w, 'c': p.c + 1}} ELSE p END)
             WHEN len(acc) < {_MG_K}
               THEN list_append(acc, {{'w': el[1].w, 'c': CAST(1 AS BIGINT)}})
             ELSE list_filter(list_transform(acc,
                                p -> {{'w': p.w, 'c': p.c - 1}}),
                              p -> p.c > 0)
           END
         ) AS summary
  FROM streams
),
entries AS (
  SELECT f.shard, u.s.w AS w, u.s.c AS c
  FROM folded f, unnest(f.summary) AS u(s)
),
merged AS (
  SELECT w, CAST(SUM(c) AS BIGINT) AS est,
         CAST(COUNT(*) AS BIGINT) AS n_shards_present
  FROM entries GROUP BY w
),
truth AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS true_count FROM tok GROUP BY w
),
bound AS (
  SELECT CAST(SUM(n_s // ({_MG_K} + 1)) AS BIGINT) AS deficit_bound
  FROM streams
)
SELECT m.w, m.est, t.true_count, m.n_shards_present,
       CAST(t.true_count - m.est AS BIGINT) AS deficit,
       b.deficit_bound,
       t.true_count - m.est <= b.deficit_bound AS within_bound
FROM merged m JOIN truth t USING (w), bound b
ORDER BY t.true_count DESC, m.w
"""


@register(
    "corpus_misra_gries_sharded",
    oracle=_ORACLE_MG,
    tags=("corpus", "sketch", "scale", "north-star"),
    doc=(
        f"Misra-Gries heavy hitters the way a CLUSTER runs it: one "
        f"k={_MG_K}-counter sketch folds over each of {_MG_SHARDS} "
        "deterministic shards (doc_id %% shard — a reproducible stand-in "
        "for partition id, so both engines replay the identical per-shard "
        "streams in (doc_id, pos) order), summaries merge by summation, "
        "and the merged estimate is audited against exact corpus counts "
        "AND the theoretical deficit bound sum(floor(N_s/(k+1))) — every "
        "decrement event consumes k+1 occurrences, so the bound is exact "
        "arithmetic, not folklore.  The fold itself is pure Catalyst "
        "HOFs (aggregate over the word array with a <=k-struct state); "
        "per-shard state is the ONLY memory the operator ever holds, "
        "which is exactly why MG is the 100 TB frequent-items answer "
        "while exact groupBy tops out at the shuffle."
    ),
)
def corpus_misra_gries_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "w"
    )
    sharded = tok.withColumn("shard", F.col("doc_id") % _MG_SHARDS)
    streams = sharded.groupBy("shard").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "pos", "w"))),
            lambda s: s["w"],
        ).alias("ws"),
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
    )
    fold_expr = f"""
aggregate(
  ws,
  CAST(array() AS array<struct<w:string,c:bigint>>),
  (acc, e) -> CASE
    WHEN exists(acc, p -> p.w = e)
      THEN transform(acc, p -> IF(p.w = e,
                named_struct('w', p.w, 'c', p.c + CAST(1 AS BIGINT)), p))
    WHEN size(acc) < {_MG_K}
      THEN array_append(acc, named_struct('w', e, 'c', CAST(1 AS BIGINT)))
    ELSE filter(transform(acc,
                  p -> named_struct('w', p.w, 'c', p.c - CAST(1 AS BIGINT))),
                p -> p.c > 0)
  END
)
"""
    folded = streams.select(
        "shard", "n_s", F.expr(fold_expr).alias("summary")
    )
    entries = folded.select(
        "shard", F.explode("summary").alias("s")
    ).select("shard", F.col("s.w").alias("w"), F.col("s.c").alias("c"))
    merged = entries.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("est"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards_present"),
    )
    truth = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    bound = streams.agg(
        F.sum(F.floor(F.col("n_s") / (_MG_K + 1)))
        .cast("bigint")
        .alias("deficit_bound")
    )
    return (
        merged.join(truth, "w")
        .join(F.broadcast(bound), F.lit(True), "left")
        .select(
            "w",
            "est",
            "true_count",
            "n_shards_present",
            (F.col("true_count") - F.col("est")).cast("bigint").alias("deficit"),
            "deficit_bound",
            (F.col("true_count") - F.col("est") <= F.col("deficit_bound")).alias(
                "within_bound"
            ),
        )
        .orderBy(F.col("true_count").desc(), "w")
    )
