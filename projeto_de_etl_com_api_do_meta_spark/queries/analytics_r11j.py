"""Round-11 batch 10: time-series mining — SAX words and the matrix profile.

* ``events_sax_symbolic`` — Symbolic Aggregate approXimation (Lin,
  Keogh et al. 2003): each event type's daily count series is
  PAA-compressed to 6 segments, z-normalized, and discretized against
  the canonical N(0,1) quartile breakpoints into a 4-letter alphabet.
  The SAX word is the index key of classic time-series data mining
  (similarity search, anomaly discovery) at 6 bytes per series.
* ``events_matrix_profile`` — the matrix profile (Yeh, Keogh et al.
  2016) of the daily total-count series at window m=5 with an
  exclusion zone of 2: per window, the EXACT integer squared distance
  to its nearest non-trivial neighbor; the global minimum pair is the
  top motif, the maximum is the top discord (anomaly).  The
  all-pairs work lives on the calendar-bounded window-pair spine.

Exactness: PAA means and distances are exact integers; z-scores are
single shared double expressions; symbol thresholds are literal
breakpoints.  Reference scope: [EXT] SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

# ---------------------------------------------------------------------------
# SAX
# ---------------------------------------------------------------------------

_SAX_SEGMENTS = 6
#: N(0,1) breakpoints for alphabet size 4 (canonical SAX table).
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)

_SAX_SYMBOL = (
    f"CASE WHEN z < {_SAX_BREAKS[0]} THEN 'a'"
    f" WHEN z < {_SAX_BREAKS[1]} THEN 'b'"
    f" WHEN z < {_SAX_BREAKS[2]} THEN 'c' ELSE 'd' END"
)

#: z of a segment: (paa - mu) / sigma from exact integer moments; sigma is
#: the population sd; degenerate sigma -> z = 0 (flat word 'cccccc'... no:
#: z=0 -> symbol 'c').
_SAX_Z = (
    "CASE WHEN n * sxx - s * s <= 0 THEN 0.0"
    " ELSE (CAST(paa_e6 AS DOUBLE) / 1000000.0"
    "       - CAST(s AS DOUBLE) / n)"
    "      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(s AS DOUBLE) * s)"
    "             / (CAST(n AS DOUBLE) * n)) END"
)

_ORACLE_SAX = f"""
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
idx AS (
  SELECT g, ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) - 1 AS t, x
  FROM daily
),
tot AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM idx GROUP BY g
),
segs AS (
  SELECT idx.g, (idx.t * {_SAX_SEGMENTS}) // tot.n AS seg,
         CAST(SUM(x) AS BIGINT) AS ssum, CAST(COUNT(*) AS BIGINT) AS scnt
  FROM idx JOIN tot ON tot.g = idx.g
  GROUP BY idx.g, (idx.t * {_SAX_SEGMENTS}) // tot.n
),
zs AS (
  SELECT segs.g, seg, (1000000 * ssum) // scnt AS paa_e6,
         tot.n, tot.s, tot.sxx
  FROM segs JOIN tot ON tot.g = segs.g
),
syms AS (
  SELECT g, seg, {_SAX_SYMBOL.replace("z", f"({_SAX_Z})")} AS sym FROM zs
)
SELECT g AS event_type,
       (SELECT n FROM tot WHERE tot.g = syms.g) AS n_days,
       string_agg(sym, '' ORDER BY seg) AS sax_word
FROM syms GROUP BY g
ORDER BY event_type
"""


@register(
    "events_sax_symbolic",
    oracle=_ORACLE_SAX,
    tags=("events", "timeseries", "text"),
    doc=(
        f"SAX symbolic representation (Lin & Keogh 2003) of each event "
        f"type's daily count series: PAA into {_SAX_SEGMENTS} segments "
        "by the canonical index map seg = floor(t*w/n) (exact integer; "
        "segment means e6-fixed), z-normalization from exact integer "
        "moments as ONE shared double expression, then the N(0,1) "
        "quartile breakpoints (-0.6745, 0, 0.6745) discretize into the "
        "4-letter alphabet.  The resulting 6-char word is the classic "
        "time-series index key — equal words = similar shapes, at 6 "
        "bytes per series regardless of length.  All work beyond the "
        "daily aggregate lives on the type x segment spine."
    ),
)
def events_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("g"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("g").orderBy("d")
    idx = daily.select(
        "g", (F.row_number().over(w) - 1).alias("t"), "x"
    )
    tot = idx.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    segs = (
        idx.join(tot, "g")
        .groupBy("g", F.expr(f"(t * {_SAX_SEGMENTS}) div n").alias("seg"))
        .agg(
            F.sum("x").cast("bigint").alias("ssum"),
            F.count(F.lit(1)).cast("bigint").alias("scnt"),
        )
    )
    zs = segs.join(tot, "g").select(
        "g",
        "seg",
        F.expr("(1000000 * ssum) div scnt").alias("paa_e6"),
        "n",
        "s",
        "sxx",
    )
    syms = zs.select(
        "g", "seg", "n", F.expr(_SAX_SYMBOL.replace("z", f"({_SAX_Z})")).alias("sym")
    )
    return (
        syms.groupBy("g")
        .agg(
            F.max("n").alias("n_days"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(seg, sym))), e -> e.sym), '')"
            ).alias("sax_word"),
        )
        .select(F.col("g").alias("event_type"), "n_days", "sax_word")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Matrix profile
# ---------------------------------------------------------------------------

_MP_M = 5  # subsequence length
_MP_EXCL = 2  # exclusion zone |i - j| <= excl are trivial matches

_ORACLE_MP = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, x FROM daily),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
pairs AS (
  SELECT a.t AS i, b.t AS j,
         CAST(SUM((av.x - bv.x) * (av.x - bv.x)) AS BIGINT) AS dist
  FROM idx a
  JOIN idx b ON abs(b.t - a.t) > {_MP_EXCL}
  CROSS JOIN nn
  JOIN idx av ON av.t BETWEEN a.t AND a.t + {_MP_M} - 1
  JOIN idx bv ON bv.t = av.t - a.t + b.t
  WHERE a.t + {_MP_M} - 1 <= nn.n AND b.t + {_MP_M} - 1 <= nn.n
  GROUP BY a.t, b.t
),
prof AS (
  SELECT i, MIN(dist) AS nn_dist FROM pairs GROUP BY i
),
best AS (
  SELECT p.i, MIN(p.j) AS nn_j, pr.nn_dist
  FROM pairs p JOIN prof pr ON pr.i = p.i AND p.dist = pr.nn_dist
  GROUP BY p.i, pr.nn_dist
)
SELECT CAST(i AS BIGINT) AS window_start,
       CAST(nn_j AS BIGINT) AS nn_start,
       CAST(nn_dist AS BIGINT) AS nn_sq_dist,
       CASE WHEN nn_dist = (SELECT MIN(nn_dist) FROM best) THEN 1 ELSE 0 END
         AS is_motif,
       CASE WHEN nn_dist = (SELECT MAX(nn_dist) FROM best) THEN 1 ELSE 0 END
         AS is_discord
FROM best
ORDER BY window_start
"""


@register(
    "events_matrix_profile",
    oracle=_ORACLE_MP,
    tags=("events", "timeseries", "anomaly"),
    doc=(
        f"Matrix profile (Yeh & Keogh 2016) of the daily total-count "
        f"series at window m={_MP_M}, exclusion zone {_MP_EXCL}: for "
        "every subsequence, the EXACT integer squared distance to its "
        "nearest non-trivial neighbor (ties -> lowest start), flagging "
        "the global minimum (top MOTIF — the repeated pattern) and "
        "maximum (top DISCORD — the anomaly).  The one data structure "
        "that answers motif discovery, anomaly detection, and shapelet "
        "candidates at once; all pair work is on the calendar-bounded "
        "window-pair spine, the raw stream contributes one daily "
        "aggregate."
    ),
)
def events_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x"
    )
    nn = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = idx.select(F.col("t").alias("i"))
    b = idx.select(F.col("t").alias("j"))
    av = idx.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    bv = idx.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, F.abs(F.col("j") - F.col("i")) > _MP_EXCL)
        .crossJoin(F.broadcast(nn))
        .where(
            (F.col("i") + _MP_M - 1 <= F.col("n"))
            & (F.col("j") + _MP_M - 1 <= F.col("n"))
        )
        .join(
            av,
            (F.col("ta") >= F.col("i")) & (F.col("ta") <= F.col("i") + _MP_M - 1),
        )
        .join(bv, F.col("tb") == F.col("ta") - F.col("i") + F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")))
            .cast("bigint")
            .alias("dist")
        )
    )
    prof = pairs.groupBy("i").agg(F.min("dist").alias("nn_dist"))
    best = (
        pairs.join(prof, "i")
        .where(F.col("dist") == F.col("nn_dist"))
        .groupBy("i", "nn_dist")
        .agg(F.min("j").alias("nn_j"))
    )
    gmin = best.agg(F.min("nn_dist").alias("gmin"))
    gmax = best.agg(F.max("nn_dist").alias("gmax"))
    return (
        best.crossJoin(F.broadcast(gmin))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.col("i").cast("bigint").alias("window_start"),
            F.col("nn_j").cast("bigint").alias("nn_start"),
            F.col("nn_dist").cast("bigint").alias("nn_sq_dist"),
            F.when(F.col("nn_dist") == F.col("gmin"), 1).otherwise(0).alias(
                "is_motif"
            ),
            F.when(F.col("nn_dist") == F.col("gmax"), 1).otherwise(0).alias(
                "is_discord"
            ),
        )
        .orderBy("window_start")
    )
