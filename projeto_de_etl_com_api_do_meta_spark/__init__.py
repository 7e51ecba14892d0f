"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL (`Ismaelrlima/Projeto-de-ETL-com-api-do-meta`),
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured Streaming)
and extended with large-scale LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout
------
- ``session``     : SparkSession builder (AQE, Arrow, tuned shuffle).
- ``io``          : fixture-table readers + schema contracts.
- ``functions``   : expression layer (safe math, coercion, conform, text, vectors).
- ``operators``   : relational + restructuring + dedup/similarity operators.
- ``sources``     : REST (Meta-shaped) source, file sources.
- ``sinks``       : JDBC staging + upsert (MERGE) writer, parquet merge.
- ``plans``       : reference-parity pipelines (dimension / performance / leads).
- ``streaming``   : incremental/streaming surface (windows, watermark, foreachBatch upsert).
- ``queries``     : the driver-facing query registry (queries() / oracle_sql()).
"""

__version__ = "0.1.0"
