"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 registers a named query here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` and (when the semantics
are SQL-expressible) a matching DuckDB oracle SQL string.  The registry is
what ``__spark_entry__.queries()`` / ``oracle_sql()`` expose to the
verification driver.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, oracle_sql_map, queries_map  # noqa: F401
