"""Round-10 third batch: zip-archive shards and concentration analytics.

* ``io_zip_shard_roundtrip`` — WebDataset-style sharding through ZIP
  containers (stdlib zipfile, STORED entries, pinned timestamps): the
  central-directory sibling of the tar shard round-trip.
* ``agg_hhi_concentration`` — Herfindahl-Hirschman market-concentration
  index per nation as an exact integer rational.
* ``agg_pareto_coverage`` — the 80/20 question ("how many brands cover
  80% of revenue") with integer cumulative thresholds.
"""

from __future__ import annotations

import io as _io
import json
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from ._shared import REVENUE_SQL, revenue
from .registry import register

# ---------------------------------------------------------------------------
# ZIP shard round-trip
# ---------------------------------------------------------------------------

_N_ZIP_SHARDS = 8

_ORACLE_ZIP_SHARDS = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars_meta,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars,
       CAST(SUM(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_len_consistent
FROM documents GROUP BY lang ORDER BY lang
"""


@register(
    "io_zip_shard_roundtrip",
    oracle=_ORACLE_ZIP_SHARDS,
    tags=("io", "scale"),
    doc=(
        "ZIP-container shard round-trip (the central-directory sibling of "
        "io_tar_shard_roundtrip): documents pack into 8 deterministic ZIP "
        "shards ({key}.txt + {key}.json STORED entries, pinned 1980 "
        "timestamps so shard bytes are reproducible) via one "
        "applyInPandas group per shard, read back through binaryFile + a "
        "central-directory member walk in mapInPandas, audited per-lang "
        "against the source table.  ZIP differs from tar exactly where "
        "readers break: the end-of-central-directory record must be "
        "located from the FILE END, member metadata lives in two places "
        "that must agree, and random access goes through the directory "
        "instead of a linear scan — a pass certifies all of it.  "
        "Local-mode note: shard dir is shared-filesystem temp space "
        "(see the tar twin), removed after the audit materializes."
    ),
)
def io_zip_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    pin_query_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    target = tempfile.mkdtemp(prefix="zip_shards_")

    write_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("n_members", T.LongType()),
            T.StructField("zip_bytes", T.LongType()),
        ]
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        path = os.path.join(target, f"shard-{shard:05d}.zip")
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            for row in pdf.itertuples(index=False):
                key = f"{int(row.doc_id):012d}"
                meta = json.dumps(
                    {
                        "doc_id": int(row.doc_id),
                        "lang": row.lang,
                        "source": row.source,
                        "n_chars": int(row.n_chars),
                    },
                    sort_keys=True,
                ).encode("utf-8")
                for ext, payload in (
                    (".txt", (row.text or "").encode("utf-8")),
                    (".json", meta),
                ):
                    info = zipfile.ZipInfo(key + ext, (1980, 1, 1, 0, 0, 0))
                    zf.writestr(info, payload)
        return pd.DataFrame(
            [(shard, 2 * len(pdf), os.path.getsize(path))],
            columns=["shard", "n_members", "zip_bytes"],
        )

    sharded = docs.withColumn(
        "shard", (F.col("doc_id") % _N_ZIP_SHARDS).cast("int")
    )
    manifest = sharded.groupBy("shard").applyInPandas(
        write_shard, schema=write_schema
    )
    n_written = sum(r.n_members for r in manifest.collect())
    if n_written == 0:
        shutil.rmtree(target, ignore_errors=True)
        return spark.createDataFrame(
            [],
            "lang string, n_docs long, sum_chars_meta long, "
            "sum_text_chars long, n_len_consistent long",
        )

    read_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars_meta", T.LongType()),
            T.StructField("text_chars", T.LongType()),
        ]
    )

    def unpack(batches):
        for batch in batches:
            out = []
            for content in batch["content"]:
                with zipfile.ZipFile(_io.BytesIO(bytes(content))) as zf:
                    texts: dict[str, int] = {}
                    metas: dict[str, dict] = {}
                    for name in zf.namelist():
                        payload = zf.read(name)
                        key, ext = os.path.splitext(name)
                        if ext == ".txt":
                            texts[key] = len(payload.decode("utf-8"))
                        else:
                            metas[key] = json.loads(payload)
                    for key, meta in metas.items():
                        out.append(
                            (
                                int(meta["doc_id"]),
                                meta["lang"],
                                int(meta["n_chars"]),
                                texts[key],
                            )
                        )
            yield pd.DataFrame(
                out, columns=["doc_id", "lang", "n_chars_meta", "text_chars"]
            )

    shards = spark.read.format("binaryFile").load(os.path.join(target, "*.zip"))
    rows = shards.select("content").mapInPandas(unpack, schema=read_schema)
    audit = (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars_meta").cast("bigint").alias("sum_chars_meta"),
            F.sum("text_chars").cast("bigint").alias("sum_text_chars"),
            F.sum(
                F.when(F.col("text_chars") == F.col("n_chars_meta"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_len_consistent"),
        )
        .orderBy("lang")
    )
    audit_rows = audit.collect()
    shutil.rmtree(target, ignore_errors=True)
    return spark.createDataFrame(audit_rows, audit.schema)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index
# ---------------------------------------------------------------------------

_ORACLE_HHI = f"""
WITH rev AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey,
         CAST(round(SUM({REVENUE_SQL}) * 100, 0) AS BIGINT) AS r_e2
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (
  SELECT nation, CAST(SUM(r_e2) AS BIGINT) AS total_e2 FROM rev
  GROUP BY nation
),
shares AS (
  -- integer ppm shares FIRST: share <= 1e6, so sum(share^2) <= n*1e12 and
  -- never overflows BIGINT at any corpus scale (raw r^2 overflows at sf0.01)
  SELECT r.nation, r.r_e2 * 1000000 // t.total_e2 AS share_ppm, t.total_e2
  FROM rev r JOIN tot t USING (nation)
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MAX(total_e2) AS BIGINT) AS total_e2,
       CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS sum_share_sq_ppm2,
       round(CAST(SUM(share_ppm * share_ppm) AS DOUBLE) / 100000000.0, 6)
         AS hhi
FROM shares GROUP BY nation ORDER BY nation
"""


@register(
    "agg_hhi_concentration",
    oracle=_ORACLE_HHI,
    tags=("agg", "bi"),
    doc=(
        "Herfindahl-Hirschman concentration index per supplier nation: "
        "HHI = 10000 * sum(share_i^2) where shares are supplier revenue "
        "fractions — carried as the exact integer pair (sum r^2, "
        "(sum r)^2) so the only float is the final division.  The "
        "antitrust-standard concentration number (10000 = monopoly, "
        "10000/n = perfect competition), and for the engine the measure "
        "of how skewed a join key is BEFORE you shuffle on it: HHI over "
        "key frequencies is exactly the collision probability scaled, "
        "so this same query shape is the skew-detection probe.  Two "
        "map-side-combinable aggregates."
    ),
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(F.round(F.sum(revenue()) * 100, 0).cast("bigint").alias("r_e2"))
    )
    tot = rev.groupBy("nation").agg(
        F.sum("r_e2").cast("bigint").alias("total_e2")
    )
    # integer ppm shares FIRST (share <= 1e6): sum(share^2) <= n*1e12, so
    # the squared sum never overflows BIGINT at any scale — raw cent
    # squares already overflow at sf0.01.
    shares = rev.join(F.broadcast(tot), "nation").select(
        "nation",
        F.floor(F.col("r_e2") * 1000000 / F.col("total_e2")).alias("share_ppm"),
        "total_e2",
    )
    return (
        shares.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.max("total_e2").cast("bigint").alias("total_e2"),
            F.sum(F.col("share_ppm") * F.col("share_ppm"))
            .cast("bigint")
            .alias("sum_share_sq_ppm2"),
        )
        .select(
            F.col("nation").cast("bigint").alias("nation"),
            "n_suppliers",
            "total_e2",
            "sum_share_sq_ppm2",
            F.round(
                F.col("sum_share_sq_ppm2").cast("double") / F.lit(100000000.0),
                6,
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Pareto coverage (how many brands cover 80% of revenue)
# ---------------------------------------------------------------------------

_ORACLE_PARETO = f"""
WITH rev AS (
  SELECT p.p_brand AS brand,
         CAST(round(SUM({REVENUE_SQL}) * 100, 0) AS BIGINT) AS r_e2
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
),
ranked AS (
  SELECT brand, r_e2,
         row_number() OVER (ORDER BY r_e2 DESC, brand) AS rn,
         SUM(r_e2) OVER (ORDER BY r_e2 DESC, brand
                         ROWS UNBOUNDED PRECEDING) AS cum_e2,
         SUM(r_e2) OVER () AS total_e2,
         COUNT(*) OVER () AS n_brands
  FROM rev
)
SELECT CAST(MIN(CASE WHEN 5 * cum_e2 >= 4 * total_e2 THEN rn END) AS BIGINT)
         AS brands_for_80pct,
       CAST(MAX(n_brands) AS BIGINT) AS n_brands,
       CAST(MAX(total_e2) AS BIGINT) AS total_e2,
       round(CAST(MIN(CASE WHEN 5 * cum_e2 >= 4 * total_e2 THEN rn END)
                  AS DOUBLE) / CAST(MAX(n_brands) AS DOUBLE), 6)
         AS pareto_fraction
FROM ranked
"""


@register(
    "agg_pareto_coverage",
    oracle=_ORACLE_PARETO,
    tags=("agg", "bi"),
    doc=(
        "Pareto 80/20 coverage: the smallest number of brands whose "
        "cumulative revenue reaches 80%% of the total, via an exact "
        "integer threshold (5*cum >= 4*total — no float percent "
        "anywhere) over the (revenue DESC, brand) cumulative window.  "
        "The concentration question every category manager asks, and "
        "for the engine the direct measure of whether a top-N "
        "materialization strategy will work on a dimension.  Windows run "
        "on the brand-cardinality table only (dozens of rows), never "
        "the fact table."
    ),
)
def agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum(revenue()) * 100, 0).cast("bigint").alias("r_e2"))
    )
    # brand-cardinality table: bounded global windows by construction
    w_rank = Window.orderBy(F.col("r_e2").desc(), "brand")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = rev.select(
        "brand",
        "r_e2",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("r_e2").over(w_cum).alias("cum_e2"),
        F.sum("r_e2").over(w_all).alias("total_e2"),
        F.count(F.lit(1)).over(w_all).alias("n_brands"),
    )
    return ranked.agg(
        F.min(
            F.when(
                5 * F.col("cum_e2") >= 4 * F.col("total_e2"), F.col("rn")
            )
        )
        .cast("bigint")
        .alias("brands_for_80pct"),
        F.max("n_brands").cast("bigint").alias("n_brands"),
        F.max("total_e2").cast("bigint").alias("total_e2"),
        F.round(
            F.min(
                F.when(
                    5 * F.col("cum_e2") >= 4 * F.col("total_e2"), F.col("rn")
                )
            ).cast("double")
            / F.max("n_brands").cast("double"),
            6,
        ).alias("pareto_fraction"),
    )


# ---------------------------------------------------------------------------
# Event-type affinity (pairwise Jaccard of user sets)
# ---------------------------------------------------------------------------

_ORACLE_TYPE_JACCARD = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ut GROUP BY event_type
)
SELECT p.type_a, p.type_b, p.n_both,
       sa.n_users AS n_a, sb.n_users AS n_b,
       CAST(sa.n_users + sb.n_users - p.n_both AS BIGINT) AS n_union,
       round(CAST(p.n_both AS DOUBLE)
             / CAST(sa.n_users + sb.n_users - p.n_both AS DOUBLE), 6)
         AS jaccard
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


@register(
    "events_type_jaccard_matrix",
    oracle=_ORACLE_TYPE_JACCARD,
    tags=("events", "analytics", "similarity"),
    doc=(
        "Behavioral affinity matrix: pairwise Jaccard similarity of the "
        "USER SETS behind each event type (do the people who click also "
        "purchase?), computed as a self-join of the distinct (user, "
        "type) table on user_id — intersection counts and set sizes are "
        "exact BIGINTs, one final rational per pair.  The audience-"
        "overlap analysis behind every cross-sell/segmentation decision, "
        "and the same shape as a feature-cooccurrence matrix: the "
        "distinct-pair self-join keyed on the entity is the scale "
        "pattern (work = sum over users of k_u^2 with k_u <= |types|, "
        "never |users|^2)."
    ),
)
def events_type_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            .cast("bigint")
            .alias("n_union"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )
