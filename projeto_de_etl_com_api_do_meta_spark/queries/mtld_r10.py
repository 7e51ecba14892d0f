"""MTLD lexical diversity (McCarthy & Jarvis 2010), fold-exact (r11 carry).

MTLD is inherently sequential — walk the token stream, complete a "factor"
whenever the running type-token ratio falls to 0.72, divide total tokens by
the (fractional) factor count — so it runs as the repo's deterministic
fold pattern with a STRING-SET accumulator: state = [factors, cur_tokens,
seen words...], the TTR test is the integer inequality 25*types <=
18*tokens (0.72 == 18/25 exactly), and DuckDB's list_reduce replays the
identical recursion.  Unlike TTR, MTLD is text-length invariant — the
reason it is the diversity metric corpus-linguistics actually reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_MTLD = """
WITH ws AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
),
folded AS (
  SELECT doc_id, lang, len(w) AS n_tokens,
         list_reduce(
           list_prepend(['0','0'], list_transform(w, x -> [x])),
           (acc, el) -> CASE
              WHEN 25 * (len(acc) - 2
                         + CASE WHEN list_contains(acc[3:], el[1])
                                THEN 0 ELSE 1 END)
                   <= 18 * (CAST(acc[2] AS BIGINT) + 1)
                THEN [CAST(CAST(acc[1] AS BIGINT) + 1 AS VARCHAR), '0']
              ELSE list_concat(
                     list_concat([acc[1],
                                  CAST(CAST(acc[2] AS BIGINT) + 1
                                       AS VARCHAR)],
                                 acc[3:]),
                     CASE WHEN list_contains(acc[3:], el[1])
                          THEN [] ELSE [el[1]] END)
           END) AS st
  FROM ws WHERE len(w) > 0
),
scored AS (
  SELECT doc_id, lang, n_tokens,
         CAST(st[1] AS BIGINT) AS factors,
         CAST(st[2] AS BIGINT) AS end_tokens,
         CAST(len(st) - 2 AS BIGINT) AS end_types,
         CAST(round(CAST(n_tokens AS DOUBLE)
               / (CAST(st[1] AS BIGINT)
                  + CASE WHEN CAST(st[2] AS BIGINT) = 0 THEN 0.0
                         ELSE (CAST(st[2] AS BIGINT) - (len(st) - 2))
                              * 25.0 / (7.0 * CAST(st[2] AS BIGINT)) END)
               * 1000000) AS BIGINT) AS mtld_e6
  FROM folded
  WHERE CAST(st[1] AS BIGINT) > 0 OR CAST(st[2] AS BIGINT) > len(st) - 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(mtld_e6) AS BIGINT) AS sum_mtld_e6,
       round(CAST(SUM(mtld_e6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
         AS mean_mtld
FROM scored GROUP BY lang ORDER BY lang
"""


@register(
    "corpus_mtld_diversity",
    oracle=_ORACLE_MTLD,
    tags=("corpus", "text", "stats"),
    doc=(
        "MTLD lexical diversity per language (McCarthy-Jarvis): the "
        "sequential factor walk runs as a deterministic fold with a "
        "STRING-SET accumulator [factors, cur_tokens, seen...], the TTR "
        "threshold is the exact integer inequality 25*types <= "
        "18*tokens (0.72 == 18/25), the trailing partial factor is the "
        "rational (tokens-types)*25/(7*tokens), and per-doc MTLD is "
        "e6-fixed before the per-lang sum so aggregation order can "
        "never flake the hash.  Documents whose trailing segment has "
        "perfect TTR and zero completed factors are excluded (MTLD "
        "undefined — division by zero factors).  Text-length-invariant "
        "where raw TTR is not: the diversity number corpus linguistics "
        "reports.  Per-doc state is bounded by doc vocabulary; the "
        "corpus pass is one map + one grouped aggregate."
    ),
)
def corpus_mtld_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("w")
    ).where(F.size("w") > 0)
    fold = """
aggregate(
  w,
  array('0', '0'),
  (acc, x) -> CASE
     WHEN 25 * (size(acc) - 2
                + IF(exists(slice(acc, 3, size(acc)), p -> p = x), 0, 1))
          <= 18 * (CAST(element_at(acc, 2) AS INT) + 1)
       THEN array(CAST(CAST(element_at(acc, 1) AS INT) + 1 AS STRING), '0')
     ELSE concat(
            array(element_at(acc, 1),
                  CAST(CAST(element_at(acc, 2) AS INT) + 1 AS STRING)),
            slice(acc, 3, size(acc)),
            IF(exists(slice(acc, 3, size(acc)), p -> p = x),
               array(), array(x)))
  END
)
"""
    folded = ws.select(
        "doc_id",
        "lang",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.expr(fold).alias("st"),
    )
    factors = F.element_at("st", 1).cast("bigint")
    end_tokens = F.element_at("st", 2).cast("bigint")
    end_types = (F.size("st") - 2).cast("bigint")
    partial = F.when(end_tokens == 0, F.lit(0.0)).otherwise(
        (end_tokens - end_types).cast("double")
        * F.lit(25.0)
        / (F.lit(7.0) * end_tokens.cast("double"))
    )
    scored = folded.where(
        (factors > 0) | (end_tokens > end_types)
    ).select(
        "lang",
        F.round(
            F.col("n_tokens").cast("double") / (factors + partial) * 1000000
        )
        .cast("bigint")
        .alias("mtld_e6"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("mtld_e6").cast("bigint").alias("sum_mtld_e6"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_mtld_e6",
            F.round(
                F.col("sum_mtld_e6").cast("double")
                / F.col("n_docs")
                / F.lit(1000000.0),
                6,
            ).alias("mean_mtld"),
        )
        .orderBy("lang")
    )
