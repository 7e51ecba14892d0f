"""Pandas-interop escape hatches (SURVEY §2.9 / §2.4 A7).

The reference's custom logic is row-wise Python (``iterrows()``,
``.apply(lambda ...)`` — transform.py:27-37, extract.py:146-156); the engine
replaces the hot path with native expressions but still exposes the standard
vectorized escape hatches:

- ``pandas_udf`` GROUPED_AGG  — a UDAF over Arrow batches (A7),
- ``applyInPandas``           — grouped-map (UDTF-shaped) per-group kernels.

Both queries use exact integer arithmetic so the DuckDB oracle hash-matches
bit-for-bit (no float summation order to worry about).  Scale note: the
grouped-map shuffle keys on the grouping columns — at 100 TB pick keys with
enough cardinality (or salt) so single groups fit an executor's memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..session import pin_query_session_conf
from .registry import register

_ORACLE_UDAF = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT) * l_linenumber) AS BIGINT) AS weighted_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "agg_udaf_pandas",
    oracle=_ORACLE_UDAF,
    tags=("agg", "udaf", "pandas"),
    doc=(
        "UDAF via pandas_udf GROUPED_AGG (A7): Arrow-batched integer-exact "
        "weighted sum per (returnflag, linestatus) — the vectorized escape "
        "hatch that replaces row-at-a-time Python aggregation."
    ),
)
def agg_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)

    @F.pandas_udf("long")
    def weighted_qty(qty: pd.Series, line: pd.Series) -> int:
        return int((qty * line).sum())

    # Pandas group-aggs can't mix with JVM aggs in one agg() — count is a
    # second pandas UDAF so the whole aggregation runs on the Arrow path.
    @F.pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_linenumber").cast("long").alias("line"),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        weighted_qty("qty", "line").alias("weighted_qty"),
        n_rows("qty").alias("n_rows"),
    )


_ORACLE_GROUPED_MAP = """
WITH sub AS (SELECT * FROM lineitem WHERE l_orderkey % 97 = 0)
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_quantity DESC, l_orderkey, l_linenumber
       ) AS BIGINT) AS qty_rank
FROM sub
"""


@register(
    "udtf_applyinpandas",
    oracle=_ORACLE_GROUPED_MAP,
    tags=("udtf", "pandas"),
    doc=(
        "Grouped-map applyInPandas (UDTF-shaped, §2.9): per-returnflag pandas "
        "kernel ranking rows by quantity — deterministic total order, so the "
        "SQL window oracle matches exactly."
    ),
)
def udtf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)

    def rank_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_quantity", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        pdf["qty_rank"] = range(1, len(pdf) + 1)
        return pdf[["l_orderkey", "l_linenumber", "l_returnflag", "qty_rank"]]

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 97 == 0)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    )
    return li.groupBy("l_returnflag").applyInPandas(
        rank_kernel,
        schema="l_orderkey long, l_linenumber int, l_returnflag string, qty_rank long",
    )


_ORACLE_SCALAR_UDF = """
SELECT c_custkey,
       lower(replace(c_name, '#', '-')) AS slug,
       CAST(list_sum(list_transform(string_split(c_name, ''),
                                    c -> ascii(c))) % 997 AS BIGINT) AS checksum
FROM customer
"""


@register(
    "fn_scalar_udfs",
    oracle=_ORACLE_SCALAR_UDF,
    tags=("udf", "pandas"),
    doc=(
        "Scalar UDF escape hatches (§2.9): classic row-wise F.udf (checksum) "
        "and Arrow-vectorized scalar pandas_udf (slug) side by side — both "
        "oracle-verified; the hot path elsewhere never uses them."
    ),
)
def fn_scalar_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)

    @F.udf("long")
    def checksum(s: str) -> int:
        return sum(ord(c) for c in s) % 997

    @F.pandas_udf("string")
    def slug(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace("#", "-", regex=False)

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", slug("c_name").alias("slug"), checksum("c_name").alias("checksum")
    )


_ORACLE_COGROUP = """
WITH o AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
         CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) * 100
              AS BIGINT) AS BIGINT) AS total_cents
  FROM orders GROUP BY o_custkey
),
c AS (SELECT c_custkey AS custkey, c_mktsegment FROM customer)
SELECT c.custkey, c.c_mktsegment,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.total_cents, 0) AS total_cents
FROM c LEFT JOIN o ON c.custkey = o.custkey
"""


@register(
    "udtf_cogroup_pandas",
    oracle=_ORACLE_COGROUP,
    tags=("join", "pandas", "cogroup"),
    doc=(
        "Co-grouped map (groupBy().cogroup().applyInPandas): both tables "
        "shuffled on a shared bucket key, each bucket pair handed to one "
        "Arrow-batched kernel that merges per-customer with pandas — the "
        "escape hatch for per-key merge logic no join expresses. Bucketing "
        "(custkey % 64) keeps Python invocations at O(buckets), not "
        "O(customers); integer-cent sums keep the oracle exact."
    ),
)
def udtf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_query_session_conf(spark)
    n_buckets = 64
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        "c_mktsegment",
        F.pmod("c_custkey", F.lit(n_buckets)).alias("bucket"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.pmod("o_custkey", F.lit(n_buckets)).alias("bucket"),
        # exact cents as int64 before the kernel: no float sum order issues
        F.round(F.col("o_totalprice").cast("decimal(18,4)") * 100, 0)
        .cast("long")
        .alias("cents"),
    )

    def merge(c_pdf: pd.DataFrame, o_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(c_pdf) == 0:  # orders whose custkey is absent from customer
            return pd.DataFrame(
                columns=["custkey", "c_mktsegment", "n_orders", "total_cents"]
            )
        agg = (
            o_pdf.groupby("custkey")["cents"]
            .agg(n_orders="count", total_cents="sum")
            .reset_index()
        )
        out = c_pdf[["custkey", "c_mktsegment"]].merge(agg, on="custkey", how="left")
        out[["n_orders", "total_cents"]] = (
            out[["n_orders", "total_cents"]].fillna(0).astype("int64")
        )
        return out

    return (
        cust.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(
            merge,
            "custkey long, c_mktsegment string, n_orders long, total_cents long",
        )
    )


_ORACLE_ARROW_MAP = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) * 100 + l_linenumber AS qty_code
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""


@register(
    "map_in_arrow_batches",
    oracle=_ORACLE_ARROW_MAP,
    tags=("udf", "arrow"),
    doc=(
        "mapInArrow: per-partition transform over raw pyarrow RecordBatches "
        "— the lowest-overhead Python escape hatch (no pandas conversion, "
        "columnar end to end; the kernel computes on Arrow arrays "
        "directly). Exact integer arithmetic, so the oracle hash-matches. "
        "Scale shape identical to mapInPandas: stateless per batch, no "
        "shuffle, batch size bounded by maxRecordsPerBatch."
    ),
)
def map_in_arrow_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    pin_query_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def kernel(batches):
        for batch in batches:
            qty = pc.cast(batch.column("l_quantity"), pa.int64())
            line = pc.cast(batch.column("l_linenumber"), pa.int64())
            code = pc.add(pc.multiply(qty, pa.scalar(100, pa.int64())), line)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column("l_orderkey"), pa.int64()),
                    line,
                    code,
                ],
                names=["l_orderkey", "l_linenumber", "qty_code"],
            )

    return (
        li.where(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .mapInArrow(
            kernel, "l_orderkey long, l_linenumber long, qty_code long"
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_ORACLE_UDTF_LATERAL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS word
FROM w, unnest(range(1, least(len(w), 5) + 1)) AS t(i)
ORDER BY doc_id, pos
"""


@register(
    "fn_python_udtf_lateral",
    oracle=_ORACLE_UDTF_LATERAL,
    tags=("udf", "udtf", "sql"),
    doc=(
        "True Python UDTF (Spark 4 @udtf) applied as a SQL LATERAL table "
        "function: one row per leading word of each document. Completes "
        "the UDF surface beyond the pandas grouped-map 'UDTF-shaped' ops "
        "— this is the row-generator form, usable directly from SQL. "
        "Python-side and row-at-a-time, so the hot-path guidance still "
        "says codegen explode(); the UDTF exists for logic that can't be "
        "expressed as expressions."
    ),
)
def fn_python_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    pin_query_session_conf(spark)

    @udtf(returnType="pos int, word string")
    class SplitWords5:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")[:5]):
                yield i, w

    spark.udtf.register("split_words5", SplitWords5)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.word "
        "FROM _udtf_docs d, LATERAL split_words5(d.text) s "
        "ORDER BY d.doc_id, s.pos"
    )
