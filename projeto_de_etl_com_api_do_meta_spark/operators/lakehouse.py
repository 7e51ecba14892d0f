"""Manifest-based table versioning: snapshot isolation + time travel on
plain parquet, no table-format jars required.

The container has no delta-spark/iceberg jars (COVERAGE.md gap #2), but
the two mechanics those formats provide for batch ETL — atomic snapshot
commits and time travel — are a manifest protocol, not a file format:

- every commit writes its parquet files under a fresh ``data/v{N}/``
  prefix, then atomically publishes ``_manifests/v{N}.json`` listing
  exactly those files;
- readers resolve a manifest FIRST and read only the files it lists, so
  a reader of v1 never sees v2's files (snapshot isolation) and any
  historical version stays readable forever (time travel);
- the manifest write is a single ``os.rename`` onto the final name —
  the same last-writer-atomicity delta's _delta_log relies on.

This is deliberately the minimal subset: append/overwrite commits and
reads. MERGE on top of it is ``sinks/upsert.py: parquet_upsert``
composed with ``commit_version`` (read latest -> merge -> commit).

Scale notes: manifests hold file PATHS (one JSON line per file, ~100
bytes), never data; a 100 TB table's manifest is megabytes. Readers pass
the explicit file list to the parquet scan, so partition pruning and
row-group skipping work unchanged on the listed files.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def versions(table_dir: str) -> list[int]:
    """Committed version numbers, ascending. Uncommitted data dirs
    (crashed writers) are invisible — only a published manifest counts."""
    md = _manifest_dir(table_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for f in os.listdir(md):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def commit_version(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next table version and publish its manifest.

    The data lands under ``data/v{N}-{uuid}/`` (unique prefix, so a
    concurrent or crashed writer can never collide with published files),
    then the manifest is renamed into place as the commit point.
    """
    n = (versions(table_dir)[-1] + 1) if versions(table_dir) else 1
    data_dir = os.path.join(table_dir, "data", f"v{n}-{uuid.uuid4().hex[:8]}")
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    md = _manifest_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    manifest = {"version": n, "files": files}
    fd, tmp = tempfile.mkstemp(dir=md, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(md, f"v{n}.json"))  # the commit point
    return n


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot (default: latest). Only the manifest's
    files reach the scan — concurrently-written newer versions are
    invisible to this reader."""
    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    n = vs[-1] if version is None else version
    if n not in vs:
        raise FileNotFoundError(f"version {n} not in {vs}")
    with open(os.path.join(_manifest_dir(table_dir), f"v{n}.json")) as f:
        manifest = json.load(f)
    return spark.read.parquet(*manifest["files"])
