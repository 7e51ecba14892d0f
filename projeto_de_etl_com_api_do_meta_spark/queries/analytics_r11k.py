"""Round-11 batch 11: in-engine Newton-solved logistic calibration.

``ml_platt_scaling`` — Platt-style sigmoid calibration of
P(purchase | engagement): a logistic regression p = sigmoid(a*s + b)
fit by EIGHT Newton-Raphson iterations executed ENTIRELY inside one
SQL expression — the per-score sufficient-statistic cells (score,
n_pos, n_neg) collect into a deterministic sorted array, and the
Newton loop is an outer fold over sequence(1,8) whose body computes
the exact gradient/Hessian sums with an inner fold over the cells and
solves the 2x2 system in closed form.  A ``transform`` over a
singleton array provides the let-binding that lets the inner-fold
result be referenced six times without recomputation-by-text.

Why it matters: calibration is normally a driver-side scikit loop over
collected data; here the DATA never leaves the engine — the user-grain
aggregate reduces the corpus to a bounded cell array (scores are small
integers), and the optimization is a deterministic expression over it.
Both engines run the SAME template-generated fold text, so every
intermediate of all 8 iterations is IEEE-bit-identical (the
events_markov_stationary contract, lifted from integer to double
state).  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_PL_ITERS = 8


def _platt_fold(idx, arr, seq_outer: str, cells: str) -> str:
    """The full 8-iteration Newton fold; idx(expr, i) renders 1-based
    element access, arr(items) renders an array literal, seq_outer is the
    engine's 8-element iteration list, cells the cell-array column."""
    c = "c"
    s_, pos_, neg_ = (idx(c, 1), idx(c, 2), idx(c, 3))
    ab_a, ab_b = idx("ab", 1), idx("ab", 2)
    p = f"(1.0 / (1.0 + exp(-(({ab_a}) * {s_} + ({ab_b})))))"
    w = f"(({pos_} + {neg_}) * {p} * (1.0 - {p}))"
    r = f"(({pos_} + {neg_}) * {p} - {pos_})"
    inner = (
        f"aggregate({cells}, "
        + arr(["CAST(0.0 AS DOUBLE)"] * 5)
        + f", (m, {c}) -> "
        + arr(
            [
                f"{idx('m', 1)} + {r} * {s_}",
                f"{idx('m', 2)} + {r}",
                f"{idx('m', 3)} + {w} * {s_} * {s_}",
                f"{idx('m', 4)} + {w} * {s_}",
                f"{idx('m', 5)} + {w}",
            ]
        )
        + ")"
    )
    g1, g2 = idx("m", 1), idx("m", 2)
    h11, h12, h22 = idx("m", 3), idx("m", 4), idx("m", 5)
    det = f"({h11} * {h22} - {h12} * {h12})"
    upd = arr(
        [
            f"CASE WHEN {det} = 0.0 THEN {ab_a} ELSE {ab_a}"
            f" - ({g1} * {h22} - {g2} * {h12}) / {det} END",
            f"CASE WHEN {det} = 0.0 THEN {ab_b} ELSE {ab_b}"
            f" - ({g2} * {h11} - {g1} * {h12}) / {det} END",
        ]
    )
    # let-binding: transform over a singleton array binds m = inner fold
    body = f"{idx(f'transform({arr([inner])}, m -> {upd})', 1)}"
    init = arr(["CAST(0.0 AS DOUBLE)", "b0"])
    return f"aggregate({seq_outer}, {init}, (ab, it) -> {body})"


def _spark_idx(e: str, i: int) -> str:
    return f"element_at({e}, {i})"


def _duck_idx(e: str, i: int) -> str:
    return f"({e})[{i}]"


def _spark_arr(items) -> str:
    return "array(" + ", ".join(items) + ")"


def _duck_arr(items) -> str:
    return "[" + ", ".join(items) + "]"


_PL_FOLD_SPARK = _platt_fold(
    _spark_idx, _spark_arr, f"sequence(1, {_PL_ITERS})", "cells"
)
#: DuckDB list_reduce needs the init prepended (the r11d fold device);
#: aggregate() does not exist, so wrap list_reduce to the same shape.
_PL_FOLD_DUCK_INNER = None  # built inline below


def _duck_fold() -> str:
    idx, arr = _duck_idx, _duck_arr
    c = "c"
    s_, pos_, neg_ = (idx(c, 1), idx(c, 2), idx(c, 3))
    ab_a, ab_b = idx("ab", 1), idx("ab", 2)
    p = f"(1.0 / (1.0 + exp(-(({ab_a}) * {s_} + ({ab_b})))))"
    w = f"(({pos_} + {neg_}) * {p} * (1.0 - {p}))"
    r = f"(({pos_} + {neg_}) * {p} - {pos_})"
    inner = (
        f"list_reduce(list_prepend(CAST({arr(['0.0'] * 5)} AS DOUBLE[]),"
        f" cells), (m, {c}) -> "
        + arr(
            [
                f"{idx('m', 1)} + {r} * {s_}",
                f"{idx('m', 2)} + {r}",
                f"{idx('m', 3)} + {w} * {s_} * {s_}",
                f"{idx('m', 4)} + {w} * {s_}",
                f"{idx('m', 5)} + {w}",
            ]
        )
        + ")"
    )
    g1, g2 = idx("m", 1), idx("m", 2)
    h11, h12, h22 = idx("m", 3), idx("m", 4), idx("m", 5)
    det = f"({h11} * {h22} - {h12} * {h12})"
    upd = arr(
        [
            f"CASE WHEN {det} = 0.0 THEN {ab_a} ELSE {ab_a}"
            f" - ({g1} * {h22} - {g2} * {h12}) / {det} END",
            f"CASE WHEN {det} = 0.0 THEN {ab_b} ELSE {ab_b}"
            f" - ({g2} * {h11} - {g1} * {h12}) / {det} END",
        ]
    )
    body = f"{idx(f'list_transform({arr([inner])}, m -> {upd})', 1)}"
    init = f"CAST({arr(['0.0', 'b0'])} AS DOUBLE[])"
    return (
        f"list_reduce(list_prepend({init},"
        f" list_transform(range(1, {_PL_ITERS} + 1), it -> {init})),"
        f" (ab, e) -> {body})"
    )


#: Probe scores for the calibrated-readout columns.
_PL_PROBES = (1, 5, 20)


def _pcal(idx, s: int) -> str:
    a, b = idx("ab", 1), idx("ab", 2)
    return (
        f"CAST(floor(1000000.0 /"
        f" (1.0 + exp(-(({a}) * {s}.0 + ({b})))) + 0.5) AS BIGINT)"
    )


_ORACLE_PLATT = f"""
WITH usr AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS BIGINT) AS s,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
cellrows AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM usr GROUP BY s
),
packed AS (
  SELECT list(CAST([s, pos, neg] AS DOUBLE[]) ORDER BY s) AS cells,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(neg) AS BIGINT) AS n_neg,
         ln((CAST(SUM(neg) AS DOUBLE) + 1.0)
            / (CAST(SUM(pos) AS DOUBLE) + 1.0)) AS b0
  FROM cellrows
  HAVING COUNT(*) > 0
),
fitted AS (SELECT n_pos, n_neg, {_duck_fold()} AS ab FROM packed)
SELECT n_pos, n_neg,
       CAST(floor({_duck_idx("ab", 1)} * 1000000.0 + 0.5) AS BIGINT)
         AS a_e6,
       CAST(floor({_duck_idx("ab", 2)} * 1000000.0 + 0.5) AS BIGINT)
         AS b_e6,
       {", ".join(_pcal(_duck_idx, s) + f" AS p_cal_s{s}_e6" for s in _PL_PROBES)}
FROM fitted
"""


@register(
    "ml_platt_scaling",
    oracle=_ORACLE_PLATT,
    tags=("ml", "calibration", "iterative"),
    doc=(
        f"Platt-style logistic calibration P(purchase | engagement) "
        f"fit by {_PL_ITERS} Newton-Raphson iterations INSIDE one SQL "
        "expression: the corpus reduces to per-score sufficient cells "
        "(score, n_pos, n_neg) — bounded by the distinct engagement "
        "counts — collected into a deterministically-sorted array, and "
        "the Newton loop is an outer fold whose body computes exact "
        "gradient/Hessian sums with an inner fold over the cells and "
        "solves the 2x2 system in closed form (a transform-over-"
        "singleton provides the let-binding).  No driver loop, no "
        "collect: the parametric sibling of ml_isotonic_calibration, "
        "and the standard post-hoc calibrator for classifier scores.  "
        "Both engines run template-generated fold text, so all 8 "
        "iterations are IEEE-bit-identical; readouts floored at e6 "
        "with calibrated probabilities at probe scores "
        f"{_PL_PROBES}."
    ),
)
def ml_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    usr = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("s"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    cellrows = usr.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
    )
    packed = (
        cellrows.agg(
            F.expr(
                "array_sort(collect_list(CAST(array(s, pos, neg)"
                " AS ARRAY<DOUBLE>)))"
            ).alias("cells"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum("neg").cast("bigint").alias("n_neg"),
            F.expr(
                "ln((CAST(SUM(neg) AS DOUBLE) + 1.0)"
                " / (CAST(SUM(pos) AS DOUBLE) + 1.0))"
            ).alias("b0"),
            F.count(F.lit(1)).alias("_nc"),
        )
        .where(F.col("_nc") > 0)
        .drop("_nc")
    )
    fitted = packed.select(
        "n_pos", "n_neg", F.expr(_PL_FOLD_SPARK).alias("ab")
    )
    return fitted.select(
        "n_pos",
        "n_neg",
        F.expr(
            f"CAST(floor({_spark_idx('ab', 1)} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("a_e6"),
        F.expr(
            f"CAST(floor({_spark_idx('ab', 2)} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("b_e6"),
        *[
            F.expr(_pcal(_spark_idx, s)).alias(f"p_cal_s{s}_e6")
            for s in _PL_PROBES
        ],
    )
