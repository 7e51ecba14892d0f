"""Property-based tests (SURVEY §5.4): totality and algebraic laws that must
hold for ANY input, not just fixtures — driven by hypothesis."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from projeto_de_etl_com_api_do_meta_spark.functions.safe_math import safe_div
from projeto_de_etl_com_api_do_meta_spark.sinks.upsert import parquet_upsert

_finite = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-(2**31), max_value=2**31).map(float),
)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pairs=st.lists(st.tuples(_finite, _finite), min_size=1, max_size=20))
@_SLOW
def test_safe_div_total_and_finite(spark, pairs):
    df = spark.createDataFrame(pairs, "num double, den double")
    rows = df.select(safe_div("num", "den").alias("q")).collect()
    for (num, den), row in zip(pairs, rows):
        assert row.q is not None and math.isfinite(row.q)
        if num is None or den is None or den == 0:
            assert row.q == 0.0
        else:
            assert row.q == num / den


@given(
    base=st.dictionaries(
        st.integers(0, 6), st.integers(-100, 100), min_size=1, max_size=6
    ),
    delta=st.dictionaries(
        st.integers(0, 6), st.integers(-100, 100), min_size=1, max_size=6
    ),
)
@_SLOW
def test_parquet_upsert_idempotent_and_last_write_wins(spark, tmp_path_factory, base, delta):
    target = str(tmp_path_factory.mktemp("upsert") / "t.parquet")

    def write(d):
        df = spark.createDataFrame(list(d.items()), "k long, v long")
        parquet_upsert(spark, df, target, keys=["k"])

    def snapshot():
        return {
            r.k: r.v for r in spark.read.parquet(target).collect()
        }

    write(base)
    write(delta)
    once = snapshot()
    write(delta)  # re-applying the same batch must change nothing
    assert snapshot() == once
    assert once == {**base, **delta}  # delta overwrites, base survives


@given(rows=st.lists(st.tuples(st.integers(0, 5), st.text(max_size=3)), max_size=10))
@_SLOW
def test_union_by_name_column_order_invariance(spark, rows):
    a = spark.createDataFrame(rows or [(0, "")], "k long, s string")
    b = a.select("s", "k")  # shuffled column order
    u1 = a.unionByName(b).collect()
    u2 = b.unionByName(a).select("k", "s").collect()
    assert sorted(map(tuple, u1)) == sorted(map(tuple, u2))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),
            st.lists(
                st.tuples(st.sampled_from(["lead", "link_click", "comment"]),
                          st.integers(0, 999)),
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@_SLOW
def test_pivot_unpivot_round_trip(spark, rows):
    from projeto_de_etl_com_api_do_meta_spark.operators.actions_pivot import (
        normalize_actions_fixed,
    )

    whitelist = ("lead", "link_click", "comment")
    data = [
        (rid, [{"action_type": t, "value": str(v)} for t, v in dict(acts).items()])
        for rid, (rid2, acts) in enumerate((r[0], r[1]) for r in rows)
    ]
    df = spark.createDataFrame(
        data,
        "row_id long, actions array<struct<action_type:string,value:string>>",
    )
    wide = normalize_actions_fixed(df, whitelist=whitelist)
    # Unpivot the widened metrics back to long form and compare with the
    # original (0-filled) action map — pivot must lose nothing whitelisted.
    stack_args = ", ".join(f"'{c}', {c}" for c in whitelist)
    long = wide.select(
        "row_id",
        F.expr(f"stack({len(whitelist)}, {stack_args}) AS (action_type, value)"),
    )
    got = {
        (r.row_id, r.action_type): r.value for r in long.collect()
    }
    for rid, (_, acts) in enumerate((r[0], r[1]) for r in rows):
        m = dict(acts)
        for t in whitelist:
            assert got[(rid, t)] == m.get(t, 0)
