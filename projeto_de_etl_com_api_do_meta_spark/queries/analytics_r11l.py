"""Round-11 batch 12: Bradley-Terry pairwise preference ranking.

``ml_bradley_terry`` — the Bradley-Terry model (1952) over the five
event types as "players": type a beats type b on a day when it logged
more events, the 20 pairwise win counts come from ONE daily-spine
aggregate, and the strength vector is fit by 12 iterations of
Zermelo's fixed-point update pi_i' = W_i / sum_j n_ij/(pi_i + pi_j)
(normalized each round) executed entirely inside a template-generated
fold — the SAME expression text in both engines, so every iteration is
IEEE-bit-identical (the ml_platt_scaling contract).  Bradley-Terry is
the canonical model behind chess ratings, RLHF preference models, and
paired A/B evaluations: it converts win/loss counts into a consistent
global strength ranking.  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .analytics_r11d import _MK_STATES
from .registry import register

_BT_ITERS = 12
_BT_K = len(_MK_STATES)


def _bt_w_cols() -> list[str]:
    """SUM(CASE) win columns w_ab over the daily count columns c0..c4."""
    cols = []
    for a in range(_BT_K):
        for b in range(_BT_K):
            if a != b:
                cols.append(
                    f"CAST(COALESCE(SUM(CASE WHEN c{a} > c{b} THEN 1 ELSE 0"
                    f" END), 0) AS BIGINT) AS w{a}{b}"
                )
    return cols


def _bt_fold(idx, arr, seq_outer: str, tfm: str = "transform") -> str:
    """12 Zermelo iterations; w{a}{b} columns must be in scope."""
    pis = [idx("pi", i + 1) for i in range(_BT_K)]
    raw = []
    for i in range(_BT_K):
        wi = " + ".join(f"w{i}{j}" for j in range(_BT_K) if j != i)
        den = " + ".join(
            f"(CASE WHEN ({pis[i]} + {pis[j]}) = 0.0 THEN 0.0"
            f" ELSE (w{i}{j} + w{j}{i}) / ({pis[i]} + {pis[j]}) END)"
            for j in range(_BT_K)
            if j != i
        )
        raw.append(
            f"CASE WHEN ({den}) = 0.0 THEN {pis[i]}"
            f" ELSE ({wi}) / ({den}) END"
        )
    raw_arr = arr(raw)
    tot = " + ".join(idx("r", i + 1) for i in range(_BT_K))
    norm = arr(
        [
            f"CASE WHEN ({tot}) = 0.0 THEN {idx('r', i + 1)}"
            f" ELSE {idx('r', i + 1)} / ({tot}) END"
            for i in range(_BT_K)
        ]
    )
    body = idx(f"{tfm}({arr([raw_arr])}, r -> {norm})", 1)
    init = arr([f"CAST({1.0 / _BT_K} AS DOUBLE)"] * _BT_K)
    return f"aggregate({seq_outer}, {init}, (pi, it) -> {body})"


def _spark_idx(e: str, i: int) -> str:
    return f"element_at({e}, {i})"


def _duck_idx(e: str, i: int) -> str:
    return f"({e})[{i}]"


def _spark_arr(items) -> str:
    return "array(" + ", ".join(items) + ")"


def _duck_arr(items) -> str:
    return "[" + ", ".join(items) + "]"


_BT_FOLD_SPARK = _bt_fold(
    _spark_idx, _spark_arr, f"sequence(1, {_BT_ITERS})"
)


def _bt_fold_duck() -> str:
    inner = _bt_fold(_duck_idx, _duck_arr, "__SEQ__", tfm="list_transform")
    # rewrite aggregate(seq, init, lambda) -> list_reduce(prepended, lambda)
    assert inner.startswith("aggregate(__SEQ__, ")
    rest = inner[len("aggregate(__SEQ__, "):-1]
    init, lam = rest.split(", (pi, it) -> ", 1)
    init_cast = f"CAST({init} AS DOUBLE[])"
    return (
        f"list_reduce(list_prepend({init_cast},"
        f" list_transform(range(1, {_BT_ITERS} + 1), it -> {init_cast})),"
        f" (pi, e) -> {lam})"
    )


_BT_TYPES_DUCK = "[" + ", ".join(f"'{s}'" for s in _MK_STATES) + "]"
_BT_TYPES_SPARK = "array(" + ", ".join(f"'{s}'" for s in _MK_STATES) + ")"

_ORACLE_BT = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         {", ".join(f"CAST(SUM(CASE WHEN event_type = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}" for i, s in enumerate(_MK_STATES))}
  FROM events GROUP BY CAST(ts AS DATE)
),
wins AS (
  SELECT {", ".join(_bt_w_cols())} FROM daily
),
fitted AS (SELECT *, {_bt_fold_duck()} AS pi FROM wins)
SELECT st.i AS type_idx,
       {_BT_TYPES_DUCK}[st.i] AS event_type,
       CAST(CASE st.i {" ".join("WHEN " + str(i + 1) + " THEN " + " + ".join(f"w{i}{j}" for j in range(_BT_K) if j != i) for i in range(_BT_K))} END
            AS BIGINT) AS wins,
       CAST(floor(({_duck_idx("pi", 0)})[st.i] * 1000000.0 + 0.5) AS BIGINT)
         AS strength_e6
FROM fitted, (SELECT unnest(range(1, {_BT_K} + 1)) AS i) st
ORDER BY type_idx
""".replace(f"({_duck_idx('pi', 0)})[st.i]", "(pi)[st.i]")


@register(
    "ml_bradley_terry",
    oracle=_ORACLE_BT,
    tags=("ml", "ranking", "iterative"),
    doc=(
        f"Bradley-Terry pairwise-preference model over the {_BT_K} event "
        "types: a beats b on any day it logged more events (ties "
        "excluded), the 20 win counts reduce from ONE calendar-bounded "
        f"daily aggregate, and {_BT_ITERS} Zermelo fixed-point "
        "iterations pi_i' = W_i / sum_j n_ij/(pi_i+pi_j) (normalized "
        "per round) run inside a template-generated fold whose text is "
        "identical in both engines — all iterations IEEE-bit-identical "
        "(the ml_platt_scaling device).  The canonical paired-"
        "comparison ranking model behind Elo-style ratings and RLHF "
        "preference fitting; readout strengths floored at e6 beside "
        "the exact win counts."
    ),
)
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        *[
            F.sum(F.when(F.col("event_type") == s, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i, s in enumerate(_MK_STATES)
        ]
    )
    wins = daily.agg(*[F.expr(c) for c in _bt_w_cols()])
    fitted = wins.select("*", F.expr(_BT_FOLD_SPARK).alias("pi"))
    st = fitted.select(
        F.explode(F.expr(f"sequence(1, {_BT_K})")).alias("type_idx"),
        "pi",
        *[f"w{a}{b}" for a in range(_BT_K) for b in range(_BT_K) if a != b],
    )
    wins_case = (
        "CASE type_idx "
        + " ".join(
            "WHEN "
            + str(i + 1)
            + " THEN "
            + " + ".join(f"w{i}{j}" for j in range(_BT_K) if j != i)
            for i in range(_BT_K)
        )
        + " END"
    )
    return st.select(
        "type_idx",
        F.expr(f"element_at({_BT_TYPES_SPARK}, type_idx)").alias("event_type"),
        F.expr(f"CAST({wins_case} AS BIGINT)").alias("wins"),
        F.expr(
            "CAST(floor(element_at(pi, type_idx) * 1000000.0 + 0.5)"
            " AS BIGINT)"
        ).alias("strength_e6"),
    ).orderBy("type_idx")
