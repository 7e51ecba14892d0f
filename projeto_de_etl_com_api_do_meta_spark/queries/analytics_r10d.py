"""Round-10d batch: streaming-sketch, warehouse-bridge and codec ops.

* ``agg_ams_f2_sketch`` — the Alon-Matias-Szegedy second-moment (F2)
  sketch with md5-derived ±1 four-wise-style signs: 16 estimators,
  mean-of-4 / median-of-4-means, every intermediate an exact integer or
  dyadic rational, next to the exact F2 and the realized error in ppm.
* ``warehouse_bridge_allocation`` — the Kimball bridge-table pattern:
  allocate each order's total price across its line items by quantity
  weight, each allocation rounded to exact cents BEFORE any cross-row
  sum, with the global rounding residual carried as a column.
* ``io_varint_roundtrip`` — protobuf-style LEB128 varint encode/decode
  through REAL executor-side binary (Arrow-batched pandas UDFs), with
  the oracle recomputing byte lengths and decoded sums analytically
  from the 7-bit length formula.

Reference scope: [EXT] sketch/warehouse/codec surface (SURVEY §6); the
reference itself has none of these layers.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# AMS F2 sketch
# ---------------------------------------------------------------------------

#: sign_j(u) = +1 iff the first hex digit of md5('<j>:<u>') is even — the
#: same deterministic md5-lane device the KMV/HLL twins use, evaluated as a
#: pure STRING comparison so both engines agree character-for-character.
_EVEN_HEX = "('0','2','4','6','8','a','c','e')"

_ORACLE_AMS = f"""
WITH ej AS (
  SELECT e.user_id, j.j
  FROM events e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
),
s AS (
  SELECT j,
         CAST(SUM(CASE WHEN substr(md5(CAST(j AS VARCHAR) || ':' ||
                                    CAST(user_id AS VARCHAR)), 1, 1)
                            IN {_EVEN_HEX} THEN 1 ELSE -1 END) AS BIGINT)
           AS s_j
  FROM ej GROUP BY j
),
grp AS (
  SELECT CAST(floor(j / 4.0) AS BIGINT) AS g,
         CAST(SUM(s_j * s_j) AS DOUBLE) / 4.0 AS mean_est
  FROM s GROUP BY CAST(floor(j / 4.0) AS BIGINT)
),
med AS (
  SELECT (SUM(mean_est) - MIN(mean_est) - MAX(mean_est)) / 2.0 AS f2_est
  FROM grp
),
exact AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id)
)
SELECT e.f2_exact, m.f2_est,
       CAST(round((m.f2_est - e.f2_exact) * 1000000.0 / e.f2_exact)
            AS BIGINT) AS rel_err_ppm
FROM exact e, med m
"""


@register(
    "agg_ams_f2_sketch",
    oracle=_ORACLE_AMS,
    tags=("agg", "sketch"),
    doc=(
        "Alon-Matias-Szegedy F2 (second frequency moment / self-join "
        "size) sketch over user_id: 16 md5-signed ±1 estimators "
        "(deterministic string-parity signs, the repo's md5-lane device), "
        "squared and combined mean-of-4 then median-of-4-means — the "
        "median of 4 dyadic rationals is (sum - min - max)/2, exact in "
        "double — beside the exact F2 and the realized relative error in "
        "ppm.  The explode-by-16 is map-side combinable (16 running "
        "counters per partition); sketch state is 16 integers total "
        "regardless of stream size — the canonical streaming answer to "
        "join-size estimation at 100 TB."
    ),
)
def agg_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    ej = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j")
    )
    sign = F.when(
        F.expr(
            f"substr(md5(cast(concat(cast(j as string), ':', "
            f"cast(user_id as string)) as binary)), 1, 1) in {_EVEN_HEX}"
        ),
        1,
    ).otherwise(-1)
    s = ej.groupBy("j").agg(F.sum(sign).cast("bigint").alias("s_j"))
    grp = s.groupBy(
        F.floor(F.col("j") / 4.0).cast("bigint").alias("g")
    ).agg(
        (F.sum(F.col("s_j") * F.col("s_j")).cast("double") / 4.0).alias(
            "mean_est"
        )
    )
    med = grp.agg(
        (
            (F.sum("mean_est") - F.min("mean_est") - F.max("mean_est")) / 2.0
        ).alias("f2_est")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"))
    )
    return exact.join(F.broadcast(med), F.lit(True), "left").select(
        "f2_exact",
        "f2_est",
        F.round(
            (F.col("f2_est") - F.col("f2_exact"))
            * 1000000.0
            / F.col("f2_exact")
        )
        .cast("bigint")
        .alias("rel_err_ppm"),
    )


# ---------------------------------------------------------------------------
# Bridge-table weighted allocation
# ---------------------------------------------------------------------------

_ORACLE_BRIDGE = """
WITH li AS (
  SELECT l_orderkey, l_returnflag,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2
  FROM orders
),
w AS (
  SELECT li.l_returnflag, li.qty, o.price_e2,
         SUM(li.qty) OVER (PARTITION BY li.l_orderkey) AS tot_q
  FROM li JOIN o ON o.o_orderkey = li.l_orderkey
),
alloc AS (
  SELECT l_returnflag, qty,
         CAST(round(CAST(price_e2 AS DOUBLE) * qty / tot_q) AS BIGINT)
           AS alloc_e2
  FROM w
),
gl AS (
  SELECT CAST(SUM(alloc_e2) AS BIGINT) AS total_alloc_e2 FROM alloc
),
op AS (
  SELECT CAST(SUM(o.price_e2) AS BIGINT) AS total_price_e2
  FROM o JOIN (SELECT DISTINCT l_orderkey FROM li) k
       ON k.l_orderkey = o.o_orderkey
)
SELECT a.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(a.qty) AS BIGINT) AS sum_qty,
       CAST(SUM(a.alloc_e2) AS BIGINT) AS sum_alloc_e2,
       MAX(op.total_price_e2 - gl.total_alloc_e2) AS rounding_residual_e2
FROM alloc a, gl, op
GROUP BY a.l_returnflag
"""


@register(
    "warehouse_bridge_allocation",
    oracle=_ORACLE_BRIDGE,
    tags=("warehouse",),
    doc=(
        "Kimball bridge-table allocation: each order's total price is "
        "spread across its line items proportional to quantity, every "
        "allocation rounded to exact CENTS (one correctly-rounded "
        "double op on exact integers) BEFORE any cross-row sum, so "
        "group totals are order-independent BIGINT arithmetic; the "
        "global rounding residual (orders total minus allocations "
        "total — the cents lost to per-row rounding) rides along as an "
        "audit column.  One co-partitioned orderkey join + one window "
        "— the many-to-many fact-allocation shape every finance mart "
        "needs."
    ),
)
def warehouse_bridge_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_e2"),
    )
    w = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "tot_q", F.sum("qty").over(Window.partitionBy("l_orderkey"))
    )
    alloc = w.select(
        "l_returnflag",
        "qty",
        F.round(
            F.col("price_e2").cast("double") * F.col("qty") / F.col("tot_q")
        )
        .cast("bigint")
        .alias("alloc_e2"),
    )
    gl = alloc.agg(F.sum("alloc_e2").cast("bigint").alias("total_alloc_e2"))
    op = (
        o.join(li.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"))
        .agg(F.sum("price_e2").cast("bigint").alias("total_price_e2"))
    )
    return (
        alloc.join(F.broadcast(gl), F.lit(True), "left")
        .join(F.broadcast(op), F.lit(True), "left")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
            F.sum("alloc_e2").cast("bigint").alias("sum_alloc_e2"),
            F.max(F.col("total_price_e2") - F.col("total_alloc_e2")).alias(
                "rounding_residual_e2"
            ),
        )
    )


# ---------------------------------------------------------------------------
# LEB128 varint round-trip
# ---------------------------------------------------------------------------


def varint_encode(n: int) -> bytes:
    """Unsigned LEB128 (protobuf varint) encoding."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_decode(buf: bytes) -> int:
    n = 0
    for i, b in enumerate(buf):
        n |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return n
    raise ValueError("unterminated varint")


_ORACLE_VARINT = """
WITH x AS (
  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL AND value >= 0
),
b AS (
  SELECT event_type, n,
         CASE WHEN n < 128 THEN 1
              WHEN n < 16384 THEN 2
              WHEN n < 2097152 THEN 3
              WHEN n < 268435456 THEN 4
              WHEN n < 34359738368 THEN 5
              WHEN n < 4398046511104 THEN 6
              WHEN n < 562949953421312 THEN 7
              WHEN n < 72057594037927936 THEN 8
              ELSE 9 END AS nbytes
  FROM x
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n) AS BIGINT) AS sum_decoded_e4,
       CAST(MAX(nbytes) AS BIGINT) AS max_bytes
FROM b GROUP BY event_type
"""


@register(
    "io_varint_roundtrip",
    oracle=_ORACLE_VARINT,
    tags=("io", "codec"),
    doc=(
        "Protobuf-style unsigned LEB128 varint round-trip through REAL "
        "binary: an Arrow-batched pandas UDF encodes each non-negative "
        "e4 fixed-point value to its varint bytes, a second UDF decodes "
        "them back, and the aggregate reports actual encoded byte "
        "lengths (F.length on the binary) and decoded sums — while the "
        "oracle recomputes both ANALYTICALLY from the 7-bit length "
        "formula ceil(bits/7), so any encoder/decoder defect (wrong "
        "continuation bit, dropped high bits) breaks the exact match.  "
        "Map-only + one grouped aggregate."
    ),
)
def io_varint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull() & (F.col("value") >= 0)).select(
        "event_type", F.round(F.col("value") * 10000).cast("bigint").alias("n")
    )

    @F.pandas_udf("binary")
    def enc(n):
        return n.map(lambda v: varint_encode(int(v)))

    @F.pandas_udf("long")
    def dec(buf):
        return pd.Series([varint_decode(b) for b in buf], dtype="int64")

    coded = x.select("event_type", enc("n").alias("buf"))
    decoded = coded.select(
        "event_type",
        F.length("buf").cast("bigint").alias("nbytes"),
        dec("buf").alias("n_back"),
    )
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("nbytes").cast("bigint").alias("total_bytes"),
        F.sum("n_back").cast("bigint").alias("sum_decoded_e4"),
        F.max("nbytes").cast("bigint").alias("max_bytes"),
    )
