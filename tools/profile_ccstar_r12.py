"""Per-round timing of dedup_cluster_components_star (guide §1):
pair generation vs the star-contraction loop, and per-round cost."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from projeto_de_etl_com_api_do_meta_spark.io import load_table  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.operators import dedup as D  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.queries.registry import (  # noqa: E402
    QUERIES,
    _load_all,
)
from projeto_de_etl_com_api_do_meta_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    spark = get_spark(app_name="profile_ccstar")
    spark.sparkContext.setLogLevel("ERROR")
    from projeto_de_etl_com_api_do_meta_spark.queries.documents_queries import (
        _DF_CAP_FRAC,
        _DF_CAP_MIN,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    t0 = time.time()
    pairs = D.jaccard_pairs_capped(
        docs, threshold=0.12, cap_frac=_DF_CAP_FRAC, cap_min=_DF_CAP_MIN
    ).select("doc_a", "doc_b")
    pairs = pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()
    print(f"pair_gen: {time.time()-t0:.2f}s  n_pairs={n_pairs}", flush=True)

    # instrumented copy of connected_components_star
    t0 = time.time()
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    print(f"cc_init: {time.time()-t0:.2f}s  edges={e.count()}", flush=True)

    def _fp(df):
        h = F.pmod(
            F.xxhash64(F.greatest("u", "v"), F.least("u", "v")),
            F.lit(2147483647),
        )
        return df.select(F.count(F.lit(1)).alias("n"), F.sum(h).alias("h")).collect()[0]

    rounds = 0
    old_fp = None
    for _ in range(30):
        rounds += 1
        rt = time.time()
        adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            adj.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(m2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if rounds == 1:
            old_fp = _fp(e)
        prev = e
        new_fp = _fp(small)
        n_e = small.count()
        e = small
        dt = time.time() - rt
        print(f"round {rounds}: {dt:.2f}s  edges={n_e}", flush=True)
        if (new_fp["n"], new_fp["h"]) == (old_fp["n"], old_fp["h"]):
            if small.join(prev, ["u", "v"], "left_anti").limit(1).count() == 0:
                break
        old_fp = new_fp

    # full query, 2 reps
    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES["dedup_cluster_components_star"].fn(spark, sf_dir).count()
        print(f"full_query rep{rep}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
