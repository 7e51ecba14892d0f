"""Meta-shaped DataSource V2 (Python data source API) — SURVEY §7 M5 phase 2.

Upgrades the phase-1 driver-side fetch (`meta_rest.MetaRestSource`) to a real
``spark.read.format(...)`` source:

- **Partitioned scan**: each API *page* is an ``InputPartition``, so pages
  are fetched executor-parallel instead of serially on the driver (the
  reference pages serially in-process, extract.py:209-215). With a real
  cursor API the page count comes from the paging metadata; the fake
  transport derives it from the fixture row count at plan time.
- **Filter pushdown** (``pushFilters``): IN/= on ``effective_status`` maps
  to the endpoint's ``filtering`` param (reference extract.py:125-128);
  >=/<= on ``date_start`` maps to ``time_range`` (extract.py:199-205).
  Accepted filters are executed by the (fake) server; everything else is
  returned to Spark to evaluate — so a partially-pushable predicate stays
  correct.
- **Column pruning**: the engine's fixed schema contracts are the
  ``fields`` projection; Spark's required-schema pruning composes on top.

Registered under the short name ``meta_ads``; ``edge`` option selects
``ads`` (default) or ``insights`` (+ optional ``breakdowns=age,gender`` /
``region``).  Transport is the deterministic in-memory fake — a
facebook_business-backed transport would plug in behind the same two
methods (import-gated, the SDK is absent here).

The module also provides the other two legs of the DSv2 surface:
``meta_insights_stream`` (``SimpleDataSourceStreamReader`` with day-indexed
offsets — the reference's daily cron re-scan as a checkpointed streaming
source) and ``meta_load`` (``DataSourceWriter`` implementing the
reference's staged-chunk load + single atomic commit, load.py:42-46,94-119).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .. import schemas

_INSIGHTS_SCHEMAS = {
    "": schemas.RAW_INSIGHTS_DAILY,
    "age,gender": schemas.RAW_INSIGHTS_DEMO,
    "region": schemas.RAW_INSIGHTS_GEO,
}


def _attr(f: Filter) -> str:
    return ".".join(f.attribute)


class MetaAdsDataSource(DataSource):
    """``spark.read.format("meta_ads")`` — Meta Graph-shaped edges."""

    @classmethod
    def name(cls) -> str:
        return "meta_ads"

    def schema(self) -> StructType:
        if self.options.get("edge", "ads") == "insights":
            return _INSIGHTS_SCHEMAS[self.options.get("breakdowns", "")]
        return schemas.RAW_ADS

    def reader(self, schema: StructType) -> "MetaEdgeReader":
        return MetaEdgeReader(schema, dict(self.options))


class MetaEdgeReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.user_schema = schema
        self.edge = options.get("edge", "ads")
        self.breakdowns = tuple(
            b for b in options.get("breakdowns", "").split(",") if b
        )
        self.page_size = int(options.get("pagesize", "1000" if self.edge != "ads" else "25"))
        self.status_filter: list[str] | None = None
        self.since: str | None = None
        self.until: str | None = None
        self.drop_null_dates = False

    # -- pushdown -----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        # Eager (not a generator): acceptance side effects must happen at
        # planning time even if Spark never iterates the rejected list.
        # NOTE: runs in Spark's planning *worker process* — acceptance is
        # observable from the plan (no Filter node survives), not from
        # driver-side module state.
        rejected: list[Filter] = []
        for f in filters:
            if (
                self.edge == "ads"
                and isinstance(f, (In, EqualTo))
                and _attr(f) == "effective_status"
            ):
                vals = list(f.value) if isinstance(f, In) else [f.value]
                self.status_filter = [str(v) for v in vals]
            elif (
                self.edge == "insights"
                and isinstance(f, (GreaterThan, GreaterThanOrEqual))
                and _attr(f) == "date_start"
            ):
                self.since = str(f.value)
            elif (
                self.edge == "insights"
                and isinstance(f, (LessThan, LessThanOrEqual))
                and _attr(f) == "date_start"
            ):
                self.until = str(f.value)
            elif (
                self.edge == "insights"
                and isinstance(f, IsNotNull)
                and _attr(f) == "date_start"
            ):
                # Spark emits IsNotNull alongside range predicates; the
                # endpoint's time_range never returns null dates, and we
                # enforce it below for the pushed-alone case.
                self.drop_null_dates = True
            else:
                rejected.append(f)  # not pushable -> Spark evaluates it
        return rejected

    # -- planning -----------------------------------------------------------
    def _fetch_all(self) -> list[dict]:
        from .meta_rest import FakeMetaTransport

        t = FakeMetaTransport()
        params: dict = {"limit": 1_000_000_000}
        if self.edge == "ads":
            if self.status_filter is not None:
                params["filtering"] = [
                    {
                        "field": "ad.effective_status",
                        "operator": "IN",
                        "value": self.status_filter,
                    }
                ]
            pages = t.get_ads([f.name for f in schemas.RAW_ADS.fields], params)
        else:
            params["breakdowns"] = list(self.breakdowns)
            if self.since or self.until:
                params["time_range"] = {
                    "since": self.since or "0000-01-01",
                    "until": self.until or "9999-12-31",
                }
            from .meta_rest import INSIGHT_FIELDS

            pages = t.get_insights(INSIGHT_FIELDS, params)
        rows: list[dict] = []
        for page in pages:
            rows.extend(page)
        if self.drop_null_dates:
            rows = [r for r in rows if r.get("date_start") is not None]
        return rows

    def partitions(self) -> Sequence[InputPartition]:
        # One partition per API page. The fake transport is deterministic,
        # so the count is derived from the filtered row count; a cursor API
        # would take page tokens from paging metadata instead.
        n_rows = len(self._fetch_all())
        n_pages = max(1, math.ceil(n_rows / self.page_size))
        return [InputPartition(p) for p in range(n_pages)]

    # -- execution (runs on executors) --------------------------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        page = partition.value
        rows = self._fetch_all()[page * self.page_size : (page + 1) * self.page_size]

        def cell(row: dict, field) -> object:
            v = row.get(field.name)
            if v is None:
                return None
            if field.name in ("adset", "campaign"):
                return (v.get("id"), v.get("name"))
            if field.name in ("actions", "action_values"):
                return [(a.get("action_type"), a.get("value")) for a in v]
            return v

        for r in rows:
            yield tuple(cell(r, f) for f in self.user_schema.fields)


def register_meta_source(spark) -> None:
    """Idempotently register the short name with a session."""
    spark.dataSource.register(MetaAdsDataSource)


class MetaInsightsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch incremental reader over the insights edge.

    Offsets are day indexes into the edge's date domain: ``read`` ingests
    every complete day past the last committed offset (the API contract is
    "all available data", so batching happens across trigger runs, not
    within one) — the streaming-native form of the reference's daily cron
    re-scan (reference README.md:115-127 + extract.py:34-47, where
    "incremental" means re-fetching a sliding date window).
    ``readBetweenOffsets`` replays a committed range deterministically,
    which is what makes the source exactly-once under checkpoint recovery.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.user_schema = schema
        self.breakdowns = tuple(
            b for b in options.get("breakdowns", "").split(",") if b
        )

    def _rows_by_day(self) -> list[tuple[str, list[dict]]]:
        from .meta_rest import INSIGHT_FIELDS, FakeMetaTransport

        t = FakeMetaTransport()
        rows: list[dict] = []
        for page in t.get_insights(
            INSIGHT_FIELDS, {"limit": 1_000_000_000, "breakdowns": list(self.breakdowns)}
        ):
            rows.extend(page)
        by_day: dict[str, list[dict]] = {}
        for r in rows:
            by_day.setdefault(r["date_start"], []).append(r)
        return sorted(by_day.items())

    def initialOffset(self) -> dict:
        return {"day": 0}

    def _emit(self, days: list[tuple[str, list[dict]]]) -> list[tuple]:
        # Materialized list, not a generator: Spark's simple-stream wrapper
        # copy.copy()s the returned iterator to support replay.
        out: list[tuple] = []
        for _, rows in days:
            for r in rows:
                out.append(
                    tuple(
                        [
                            (a.get("action_type"), a.get("value"))
                            for a in (v or [])
                        ]
                        if f.name in ("actions", "action_values")
                        else v
                        for f, v in (
                            (f, r.get(f.name)) for f in self.user_schema.fields
                        )
                    )
                )
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        days = self._rows_by_day()
        lo = start["day"]
        # iter() over a materialized list: the wrapper needs a true
        # iterator (next()) that copy.copy() can snapshot for replay.
        return iter(self._emit(days[lo:])), {"day": len(days)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        days = self._rows_by_day()
        return iter(self._emit(days[start["day"] : end["day"]]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the fake endpoint keeps full history


class MetaInsightsStreamSource(DataSource):
    """``spark.readStream.format("meta_insights_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "meta_insights_stream"

    def schema(self) -> StructType:
        return _INSIGHTS_SCHEMAS[self.options.get("breakdowns", "")]

    def simpleStreamReader(self, schema: StructType) -> MetaInsightsStreamReader:
        return MetaInsightsStreamReader(schema, dict(self.options))


def register_meta_stream_source(spark) -> None:
    """Idempotently register the streaming short name with a session."""
    spark.dataSource.register(MetaInsightsStreamSource)


@dataclass
class _ChunkCommit(WriterCommitMessage):
    """Per-task commit message: what this writer staged."""

    task_rows: int = 0
    chunk_files: tuple[str, ...] = ()


class MetaLoadWriter(DataSourceWriter):
    """Staged-commit batch writer — the reference's load protocol
    (stage in chunks of ``batchsize``, then one atomic commit;
    load.py:42-46 + 94-119) as a DataSource V2 writer.

    Each task stages its rows in ``batchsize`` chunks under
    ``<path>/_staging`` and reports them in its commit message; ``commit``
    (driver, runs once, only if EVERY task succeeded) publishes a manifest
    listing all chunks — readers treat manifest presence as visibility, so
    a failed job leaves only invisible staging files for ``abort`` to
    clean.  On a JDBC target the same protocol is stage-table + one MERGE.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options["path"]
        self.batch_size = int(options.get("batchsize", "5000"))
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> _ChunkCommit:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        files: list[str] = []
        rows_out = 0
        chunk: list[dict] = []

        def flush() -> None:
            nonlocal chunk
            if not chunk:
                return
            fname = os.path.join(staging, f"chunk-{uuid.uuid4().hex}.jsonl")
            with open(fname, "w") as fh:
                for r in chunk:
                    fh.write(json.dumps(r, default=str) + "\n")
            files.append(fname)
            chunk = []

        for row in iterator:
            chunk.append({k: row[k] for k in self.fields})
            rows_out += 1
            if len(chunk) >= self.batch_size:
                flush()
        flush()
        return _ChunkCommit(task_rows=rows_out, chunk_files=tuple(files))

    def commit(self, messages) -> None:
        import json
        import os

        total = sum(m.task_rows for m in messages if m)
        chunks = [f for m in messages if m for f in m.chunk_files]
        manifest = {"total_rows": total, "chunks": sorted(chunks)}
        with open(os.path.join(self.path, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class MetaLoadSink(DataSource):
    """``df.write.format("meta_load").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "meta_load"

    def writer(self, schema: StructType, overwrite: bool) -> MetaLoadWriter:
        return MetaLoadWriter(schema, dict(self.options))


def register_meta_sink(spark) -> None:
    """Idempotently register the sink short name with a session."""
    spark.dataSource.register(MetaLoadSink)
