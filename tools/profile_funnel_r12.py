"""Stage-by-stage timing of pipeline_training_funnel (guide §1: measure
first).  Each stage is materialized with the noop sink so we time the
computation, not the sink; job descriptions label the UI."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from projeto_de_etl_com_api_do_meta_spark.operators.dedup import (  # noqa: E402
    spread,
    word_shingles,
)
from projeto_de_etl_com_api_do_meta_spark.operators.text import tokens  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.io import load_table  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.queries.dedup_crossengine import (  # noqa: E402
    md5_lsh_pairs,
)
from projeto_de_etl_com_api_do_meta_spark.queries.registry import _load_all  # noqa: E402
from projeto_de_etl_com_api_do_meta_spark.queries.text_cleaning import (  # noqa: E402
    gopher_metrics,
)
from projeto_de_etl_com_api_do_meta_spark.session import get_spark  # noqa: E402


def t(spark, name, df):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{name:32s} {dt:7.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    spark = get_spark(app_name="profile_funnel")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()  # warm

    # stage 1: gopher quality gate
    t(spark, "s1_gopher_metrics", gopher_metrics(docs))
    q_ids = (
        gopher_metrics(docs).where(F.col("keep") == 1).select("doc_id")
    ).persist()
    t(spark, "s1_q_ids", q_ids)

    # stage 2: exact dedup on md5(text)
    k1 = docs.join(q_ids, "doc_id")
    k2_ids = (
        k1.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    ).persist()
    t(spark, "s2_k2_ids", k2_ids)

    # stage 3: LSH near-dedup
    k2 = docs.join(k2_ids, "doc_id")
    dup_ids = (
        md5_lsh_pairs(k2, sort=False)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    t(spark, "s3_lsh_dup_ids", dup_ids)
    k3_ids = k2_ids.join(dup_ids, "doc_id", "left_anti").persist()
    t(spark, "s3_k3_ids", k3_ids)

    # stage 4: containment decontamination
    tr_sh = (
        spread(docs.join(k3_ids, "doc_id"), "doc_id")
        .where(F.size(tokens("text")) >= 3)
        .select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
        .distinct()
    )
    t(spark, "s4_tr_sh", tr_sh)
    ev_sh = (
        spread(docs.where(F.col("doc_id") % 20 == 0), "doc_id")
        .where(F.size(tokens("text")) >= 3)
        .select(F.explode(word_shingles("text", 3)).alias("s"))
        .distinct()
    )
    t(spark, "s4_ev_sh", ev_sh)
    cont_ids = tr_sh.join(ev_sh, "s").select("doc_id").distinct()
    t(spark, "s4_cont_ids", cont_ids)
    k4_ids = (
        k3_ids.where(F.col("doc_id") % 20 != 0)
        .join(cont_ids, "doc_id", "left_anti")
    ).persist()
    t(spark, "s4_k4_ids", k4_ids)

    # full query end-to-end (fresh build, caches still warm from above
    # persists of the SAME DataFrame objects? no — fresh fn build)
    from projeto_de_etl_com_api_do_meta_spark.queries.registry import QUERIES

    for c in (q_ids, k2_ids, k3_ids, k4_ids):
        c.unpersist()
    spark.catalog.clearCache()
    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES["pipeline_training_funnel"].fn(spark, sf_dir).count()
        print(f"full_query rep{rep}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
