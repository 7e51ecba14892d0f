"""Round-10 geospatial operators (beyond the grid-kNN family).

* ``geo_geohash_encode`` — canonical 25-bit/5-char geohash encode of the
  synthetic micro-degree points, built ENTIRELY from integer bit
  arithmetic whose SQL text is generated once in Python and embedded in
  BOTH engines (no float ever touches the encode), bucketed at the
  4-char prefix.
* ``geo_point_in_polygon`` — convex-polygon containment via exact
  integer cross-product signs against fixed literal vertices, broken
  down per nation.
* ``geo_trajectory_length`` — per-user travel distance over the
  time-ordered event trajectory; each segment length is rounded to an
  INTEGER micro-degree before the per-user sum, so the cross-row sum is
  order-independent in both engines.

Synthetic coordinates follow the repo's spatial convention
(``spatial_er_queries.py``): integer micro-degrees derived from keys by
fixed LCG multipliers, lat in [-80e6, 80e6], lon in [-180e6, 180e6].

Scale: geohash/PIP are single-pass stateless projections (map-only
until the final grouped count); the trajectory is one window + one
grouped sum partitioned by user.  Reference scope: [EXT] spatial
analytics surface (SURVEY §6); the reference has no geo layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

#: 25-bit geohash = 13 lon bits + 12 lat bits, lon first (even positions
#: from the MSB).  Quantization: b = floor((coord + half_range) * 2^nbits
#: / full_range), clamped to 2^nbits - 1 at the closed upper edge — exact
#: integer arithmetic in both engines.
_NLON, _NLAT = 13, 12


# Portability rule for the generated text: `/` is DOUBLE division in both
# engines (Spark int/int and DuckDB 1.x int/int both yield double), and
# CAST(double AS BIGINT) diverges (DuckDB rounds, Spark truncates) — so
# every division goes through floor(), whose exact-integer-valued result
# casts identically.  All operands stay below 2^53, so the double math is
# exact throughout.


def _fdiv(x: str, d: int) -> str:
    return f"CAST(floor(({x}) / {d}.0) AS BIGINT)"


def _bit_sql(lonb: str, latb: str) -> str:
    """SQL expression for the 25-bit interleaved geohash integer.

    Generated ONCE here and embedded verbatim in both the Spark plan and
    the DuckDB oracle, so the bit logic cannot drift between engines.
    Bit (24 - k) of the result comes from lon for even k, lat for odd k.
    """
    terms = []
    lon_i, lat_i = _NLON - 1, _NLAT - 1
    for k in range(25):
        shift = 24 - k
        if k % 2 == 0:
            src, j = lonb, lon_i
            lon_i -= 1
        else:
            src, j = latb, lat_i
            lat_i -= 1
        terms.append(f"({_fdiv(src, 1 << j)} % 2) * {1 << shift}")
    return " + ".join(terms)


def _geohash_sql(lat: str, lon: str) -> str:
    """SQL for the 5-char base32 geohash of integer micro-degree coords."""
    lonb = f"LEAST({_fdiv(f'(({lon}) + 180000000) * {1 << _NLON}', 360000000)}, {(1 << _NLON) - 1})"
    latb = f"LEAST({_fdiv(f'(({lat}) + 90000000) * {1 << _NLAT}', 180000000)}, {(1 << _NLAT) - 1})"
    # expression reuse via lateral aliases is not portable across engines,
    # so the generated text repeats the quantizers per bit — both
    # optimizers constant-fold the shared subtrees.
    bits = _bit_sql(lonb, latb)
    chars = []
    for i in range(5):
        shift = 20 - 5 * i
        chars.append(
            f"substr('{_BASE32}', CAST({_fdiv(f'({bits})', 1 << shift)} % 32 AS INTEGER) + 1, 1)"
        )
    return " || ".join(chars)


def _spark_geohash_expr(lat: str, lon: str) -> str:
    return _geohash_sql(lat, lon)


_ORACLE_GEOHASH = f"""
WITH pts AS (
  SELECT c_custkey AS k, 'customer' AS side,
         (c_custkey * 48271) % 160000001 - 80000000 AS lat,
         (c_custkey * 69621) % 360000001 - 180000000 AS lon
  FROM customer
  UNION ALL
  SELECT s_suppkey AS k, 'supplier' AS side,
         (s_suppkey * 40503) % 160000001 - 80000000 AS lat,
         (s_suppkey * 69069) % 360000001 - 180000000 AS lon
  FROM supplier
),
enc AS (
  SELECT side, {_geohash_sql("lat", "lon")} AS gh5
  FROM pts
)
SELECT substr(gh5, 1, 4) AS gh4,
       CAST(SUM(CASE WHEN side = 'customer' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers,
       CAST(SUM(CASE WHEN side = 'supplier' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppliers,
       MIN(gh5) AS min_gh5, MAX(gh5) AS max_gh5
FROM enc
GROUP BY substr(gh5, 1, 4)
"""


@register(
    "geo_geohash_encode",
    oracle=_ORACLE_GEOHASH,
    tags=("geo", "spatial"),
    doc=(
        "Canonical 25-bit (5-char base32) geohash encode of the synthetic "
        "micro-degree customer/supplier points, grouped at the 4-char "
        "prefix: the 13 lon + 12 lat quantized bits and their interleave "
        "are ONE piece of integer-arithmetic SQL text generated in Python "
        "and embedded verbatim in both engines, so the encode can never "
        "drift — no float touches the path.  The prefix bucket is the "
        "classic shard key for proximity joins (neighbors share "
        "prefixes), complementing the repo's explicit grid-cell kNN.  "
        "Map-only projection + one grouped count; constant-folded "
        "bit terms keep it inside whole-stage codegen."
    ),
)
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"),
        ((F.col("c_custkey") * 48271) % 160000001 - 80000000).alias("lat"),
        ((F.col("c_custkey") * 69621) % 360000001 - 180000000).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"),
        ((F.col("s_suppkey") * 40503) % 160000001 - 80000000).alias("lat"),
        ((F.col("s_suppkey") * 69069) % 360000001 - 180000000).alias("lon"),
    )
    pts = cust.unionByName(supp)
    enc = pts.select(
        "side", F.expr(_spark_geohash_expr("lat", "lon")).alias("gh5")
    )
    return enc.groupBy(F.substring("gh5", 1, 4).alias("gh4")).agg(
        F.sum(F.when(F.col("side") == "customer", 1).otherwise(0))
        .cast("bigint")
        .alias("n_customers"),
        F.sum(F.when(F.col("side") == "supplier", 1).otherwise(0))
        .cast("bigint")
        .alias("n_suppliers"),
        F.min("gh5").alias("min_gh5"),
        F.max("gh5").alias("max_gh5"),
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (convex, exact integer cross products)
# ---------------------------------------------------------------------------

#: Convex pentagon in micro-degrees, counter-clockwise in the (lon, lat)
#: plane (shoelace 2A = +1e14; per-turn cross products all positive).  It
#: hugs the southwest corner where the synthetic LCG points concentrate
#: before the modulus wraps, so BOTH verdicts are live at every sf
#: (82 customers inside at sf0.001/0.01/0.1, the rest outside).
_POLY = (
    (-81000000, -176000000),
    (-79000000, -172000000),
    (-74000000, -173000000),
    (-72000000, -178000000),
    (-77000000, -181000000),
)


def _pip_sql(lat: str, lon: str) -> str:
    """SQL for the containment verdict of (lat, lon) against _POLY.

    cross_i = (x2-x1)(lat-y1) - (y2-y1)(lon-x1) with x=lon, y=lat; inside
    a CCW convex polygon <=> every cross >= 0; 'boundary' if any == 0.
    Exact BIGINT products (|cross| < 6.5e16).
    """
    crosses = []
    n = len(_POLY)
    for i in range(n):
        y1, x1 = _POLY[i]
        y2, x2 = _POLY[(i + 1) % n]
        crosses.append(
            f"(CAST({x2 - x1} AS BIGINT) * (({lat}) - {y1})"
            f" - CAST({y2 - y1} AS BIGINT) * (({lon}) - {x1}))"
        )
    all_ge = " AND ".join(f"{c} >= 0" for c in crosses)
    any_eq = " OR ".join(f"{c} = 0" for c in crosses)
    return (
        f"CASE WHEN ({all_ge}) AND ({any_eq}) THEN 'boundary' "
        f"WHEN {all_ge} THEN 'inside' ELSE 'outside' END"
    )


_ORACLE_PIP = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         (c_custkey * 48271) % 160000001 - 80000000 AS lat,
         (c_custkey * 69621) % 360000001 - 180000000 AS lon
  FROM customer
),
v AS (
  SELECT n.n_name, {_pip_sql("lat", "lon")} AS verdict
  FROM pts JOIN nation n ON n.n_nationkey = pts.c_nationkey
)
SELECT n_name, verdict, CAST(COUNT(*) AS BIGINT) AS n
FROM v GROUP BY n_name, verdict
"""


@register(
    "geo_point_in_polygon",
    oracle=_ORACLE_PIP,
    tags=("geo", "spatial"),
    doc=(
        "Convex point-in-polygon containment from exact integer "
        "cross-product signs against a fixed literal pentagon (CCW): a "
        "point is inside iff every edge cross product is >= 0, on the "
        "boundary iff one is exactly 0 — all BIGINT arithmetic, no "
        "epsilon anywhere.  The edge expressions are one piece of "
        "generated SQL shared by both engines.  Broken down per nation "
        "via a broadcast dim join; map-only + one grouped count."
    ),
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        ((F.col("c_custkey") * 48271) % 160000001 - 80000000).alias("lat"),
        ((F.col("c_custkey") * 69621) % 360000001 - 180000000).alias("lon"),
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    v = cust.join(F.broadcast(nat), "c_nationkey").select(
        "n_name", F.expr(_pip_sql("lat", "lon")).alias("verdict")
    )
    return v.groupBy("n_name", "verdict").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# ---------------------------------------------------------------------------
# Per-user trajectory length
# ---------------------------------------------------------------------------

_ORACLE_TRAJECTORY = """
WITH pos AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271) % 160000001 - 80000000 AS lat,
         (event_id * 69621) % 360000001 - 180000000 AS lon
  FROM events
),
seg AS (
  SELECT user_id,
         lat - lag(lat) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dlat,
         lon - lag(lon) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dlon
  FROM pos
),
d AS (
  SELECT user_id,
         CAST(round(sqrt(CAST(dlat AS DOUBLE) * CAST(dlat AS DOUBLE)
                         + CAST(dlon AS DOUBLE) * CAST(dlon AS DOUBLE)))
              AS BIGINT) AS seg_len
  FROM seg WHERE dlat IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(seg_len) AS BIGINT) AS path_microdeg,
       CAST(MAX(seg_len) AS BIGINT) AS max_segment
FROM d GROUP BY user_id
"""


@register(
    "geo_trajectory_length",
    oracle=_ORACLE_TRAJECTORY,
    tags=("geo", "spatial", "events"),
    doc=(
        "Per-user trajectory length over the time-ordered synthetic "
        "event positions: each segment's Euclidean length (sqrt is a "
        "correctly-rounded IEEE op on exact integer inputs) is rounded "
        "to an INTEGER micro-degree BEFORE the per-user sum, so the "
        "cross-row accumulation is order-independent integer arithmetic "
        "in both engines.  One lag window partitioned by user (ties "
        "broken by event_id) + one grouped sum — the standard "
        "movement-analytics rollup shape."
    ),
)
def geo_trajectory_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    pos = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 48271) % 160000001 - 80000000).alias("lat"),
        ((F.col("event_id") * 69621) % 360000001 - 180000000).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = pos.select(
        "user_id",
        (F.col("lat") - F.lag("lat").over(w)).alias("dlat"),
        (F.col("lon") - F.lag("lon").over(w)).alias("dlon"),
    ).where(F.col("dlat").isNotNull())
    seg_len = F.round(
        F.sqrt(
            F.col("dlat").cast("double") * F.col("dlat").cast("double")
            + F.col("dlon").cast("double") * F.col("dlon").cast("double")
        )
    ).cast("bigint")
    d = seg.select("user_id", seg_len.alias("seg_len"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_len").cast("bigint").alias("path_microdeg"),
        F.max("seg_len").cast("bigint").alias("max_segment"),
    )
