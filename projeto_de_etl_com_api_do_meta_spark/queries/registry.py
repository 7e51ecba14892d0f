"""Query registry plumbing.

Each query is registered with a decorator; importing this module pulls in all
query modules so the registry is fully populated.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB-runnable SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every query module (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        analysis_extra,
        documents_queries,
        embeddings_queries,
        events_queries,
        joins,
        pandas_interop,
        pipelines_queries,
        quality_queries,
        relational,
        scalar_funcs,
        segmentation_cdc,
        skew_queries,
        text_cleaning,
        tpch_extra,
        tpch_remaining,
        training_ops,
        warehouse_ops,
        windows_setops,
    )

    _LOADED = True
