"""Global row indexing and file-layout operators.

``global_dense_ids`` assigns contiguous 0..n-1 ids in a total order WITHOUT
a single-partition window: range-repartition on the order key, count rows
per partition (first pass, tiny result to the driver), prefix-sum the
offsets, then add each partition's offset to its local running index
(second pass, Arrow-batched). This is the standard scalable replacement for
``row_number() OVER (ORDER BY ...)`` — the window form moves ALL rows to one
partition, which is exactly what a 100 TB engine must never do.

``compact_to_target_files`` is the small-files maintenance op: rewrite a
parquet dataset into ~target_mb output files (lakehouse compaction).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField


def global_dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0-based ids in ascending ``order_col`` order.

    Requires ``order_col`` to be unique (a key); ties would make the dense
    order ambiguous. Two distributed passes + one driver-side prefix sum of
    ``num_partitions`` longs — no global sort to a single partition.
    """
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(nparts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()
    # The persist is CORRECTNESS, not caching: repartitionByRange picks its
    # boundaries by sampling, and a re-execution may sample different
    # boundaries — pass 2 would then see different partition contents than
    # the offsets collected in pass 1 (observed: silently shifted ids at
    # sf0.1). Materializing pins one partitioning for both passes.
    # Honest limits: (a) persist does NOT truncate lineage — if an executor
    # loses both its cached blocks and its shuffle files, recompute may
    # re-sample; pass 2 validates its per-partition row counts against
    # pass 1's (below), so any content desync — including a boundary shift
    # between two partitions that both already hold rows, which a bare
    # offset lookup would NOT catch — fails the task loudly instead of
    # emitting silently shifted ids. A fault-tolerant deployment should
    # still checkpoint() here (HDFS-backed) to truncate lineage.
    # (b) The cache is pinned for the session (the lazy consumer needs it);
    # it spills MEMORY_AND_DISK under pressure and is dropped by
    # clearCache() — long-lived sessions indexing many corpora should clear
    # between corpora (bench.py and tools/scale_probe.py clear between
    # repetitions for exactly this reason).
    # Pass 1: per-partition row counts (result size = nparts, driver-safe).
    counts = {r["_pid"]: r.cnt for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_state = df.sparkSession.sparkContext.broadcast((offsets, counts))

    out_schema = parts.drop("_pid").schema.add(StructField(id_col, LongType(), False))

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen, pid = 0, None
        offsets, counts = b_state.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid]
            pdf[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf.drop(columns="_pid")
        expect = counts.get(pid, 0) if pid is not None else 0
        if seen != expect:
            raise RuntimeError(
                f"global_dense_ids: partition {pid} held {seen} rows in "
                f"pass 2 but {expect} in pass 1 — range boundaries were "
                "re-sampled between passes (cache loss?); ids would be "
                "silently shifted. Re-run, or checkpoint() the input."
            )

    # Arrow batches preserve within-partition order, so the local running
    # index matches the sortWithinPartitions order.
    return parts.mapInPandas(assign, out_schema)


def grouped_dense_ids(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    id_col: str = "pos",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group dense ranks in ascending ``order_cols`` order — the
    scalable replacement for ``ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY ...)`` when groups are few and huge (epochs, shards, days):
    the window form moves EACH group to a single reducer, so two epochs
    over a 100 TB corpus become two hot partitions.

    Shape: range-repartition on ``(group, *order_cols)`` (groups stay
    contiguous, order is global across partitions), count rows per
    ``(partition, group)`` — a driver-safe result bounded by
    ``nparts + n_groups`` because each range partition holds a contiguous
    key slice — prefix-sum per-group offsets across partitions, then add
    each batch's local running index (Arrow-batched second pass).

    ``(group_col, *order_cols)`` tuples must be unique, else the dense
    order is ambiguous. NULL groups are supported for string group columns
    (pandas preserves None keys); a NULL in a NUMERIC group column fails
    loudly (Arrow converts it to NaN, which never matches the collected
    None offset key) — pre-fill numeric nulls if you need them grouped.
    Pass 2 validates its per-(partition, group) row counts against
    pass 1's, so any partition-content desync between the two passes (see
    the persist note in :func:`global_dense_ids`) — including boundary
    shifts that keep every (pid, group) key present — raises in the task
    rather than emitting silently shifted ids.
    """
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(group_col)] + [F.col(c) for c in order_cols]
    parts = (
        df.repartitionByRange(nparts, *keys)
        .sortWithinPartitions(group_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()  # pins ONE range partitioning across both passes — see
    # global_dense_ids: re-sampled range boundaries would desync pass 2's
    # partition contents from pass 1's offsets.
    # Pass 1: rows per (partition, group). Range partitioning keeps each
    # partition to a contiguous slice, so this is at most nparts + n_groups
    # rows — driver-safe at any corpus size.
    counts = (
        parts.groupBy("_pid", group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_group: dict = {}
    for r in counts:
        by_group.setdefault(r[group_col], []).append((r["_pid"], r["cnt"]))
    offsets: dict = {}  # (pid, group) -> rows of this group in earlier pids
    totals: dict = {}  # (pid, group) -> pass-1 row count, for pass-2 checks
    for g, lst in by_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            offsets[(pid, g)] = acc
            totals[(pid, g)] = cnt
            acc += cnt
    b_state = df.sparkSession.sparkContext.broadcast((offsets, totals))

    out_schema = parts.drop("_pid").schema.add(StructField(id_col, LongType(), False))

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict = {}  # group -> rows already emitted in this partition
        pid = None
        off, totals = b_state.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            local = pdf.groupby(group_col, sort=False, dropna=False).cumcount()
            # strict lookup: a (pid, group) absent from pass 1 means the
            # partitioning desynced between passes — fail the task loudly.
            base = pdf[group_col].map(
                lambda g: off[(pid, g)] + seen.get(g, 0)
            )
            pdf[id_col] = (base + local + start).astype("int64")
            for g, c in pdf[group_col].value_counts(dropna=False).items():
                # normalize pandas' NaN stand-in for a None key back to
                # None so carryover matches the base lookup's key
                if isinstance(g, float) and g != g:
                    g = None
                seen[g] = seen.get(g, 0) + int(c)
            yield pdf.drop(columns="_pid")
        # Content check: a boundary shift that moves rows between two
        # partitions that BOTH already hold a group keeps every (pid, group)
        # key present, so the strict lookup alone can't catch it — the
        # per-group totals comparison can.
        expect = {g: c for (p, g), c in totals.items() if p == pid}
        if pid is not None and seen != expect:
            raise RuntimeError(
                f"grouped_dense_ids: partition {pid} group counts changed "
                f"between passes ({seen} != {expect}) — range boundaries "
                "were re-sampled (cache loss?); ids would be silently "
                "shifted. Re-run, or checkpoint() the input."
            )

    # Arrow batches preserve within-partition order, so local + carried
    # `seen` counters extend the sortWithinPartitions order exactly.
    return parts.mapInPandas(assign, out_schema)


def grouped_prefix_sums(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_before",
    inclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running totals of ``value_col`` in ``order_cols`` order —
    the scalable replacement for ``SUM(v) OVER (PARTITION BY group ORDER
    BY ...)`` when groups are few and huge. Same two-pass shape as
    :func:`grouped_dense_ids` (range repartition keeps groups contiguous;
    pass 1 collects per-(partition, group) value sums, bounded by
    ``nparts + n_groups``; pass 2 adds local cumulative sums on top of the
    prefix-summed offsets). ``inclusive=False`` gives the exclusive
    prefix (sum of strictly-earlier rows), the packing-friendly form.

    ``value_col`` must be integral (sums are exact longs); ``(group_col,
    *order_cols)`` tuples must be unique. Null-group and strict-lookup
    semantics match :func:`grouped_dense_ids`.
    """
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(group_col)] + [F.col(c) for c in order_cols]
    parts = (
        df.repartitionByRange(nparts, *keys)
        .sortWithinPartitions(group_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()  # pins ONE range partitioning across both passes — see
    # global_dense_ids.
    sums = (
        parts.groupBy("_pid", group_col)
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    by_group: dict = {}
    for r in sums:
        by_group.setdefault(r[group_col], []).append((r["_pid"], r["s"]))
    offsets: dict = {}  # (pid, group) -> value mass of this group in earlier pids
    totals: dict = {}  # (pid, group) -> pass-1 value mass, for pass-2 checks
    for g, lst in by_group.items():
        acc = 0
        for pid, s in sorted(lst):
            offsets[(pid, g)] = acc
            totals[(pid, g)] = int(s)
            acc += int(s)
    b_state = df.sparkSession.sparkContext.broadcast((offsets, totals))

    out_schema = parts.drop("_pid").schema.add(StructField(out_col, LongType(), False))

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict = {}  # group -> value mass already emitted in this partition
        pid = None
        off, totals = b_state.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            csum = pdf.groupby(group_col, sort=False, dropna=False)[
                value_col
            ].cumsum()
            if not inclusive:
                csum = csum - pdf[value_col]
            # strict lookup — see grouped_dense_ids.
            base = pdf[group_col].map(
                lambda g: off[(pid, g)] + seen.get(g, 0)
            )
            pdf[out_col] = (base + csum).astype("int64")
            for g, s in (
                pdf.groupby(group_col, sort=False, dropna=False)[
                    value_col
                ].sum().items()
            ):
                # groupby(...).sum() surfaces a None key as NaN (a fresh
                # float per batch) — normalize back to None, else a NULL
                # group's carried mass is lost across Arrow batches
                if isinstance(g, float) and g != g:
                    g = None
                seen[g] = seen.get(g, 0) + int(s)
            yield pdf.drop(columns="_pid")
        # Content check — see grouped_dense_ids (value-mass form).
        expect = {g: s for (p, g), s in totals.items() if p == pid}
        if pid is not None and seen != expect:
            raise RuntimeError(
                f"grouped_prefix_sums: partition {pid} group sums changed "
                f"between passes ({seen} != {expect}) — range boundaries "
                "were re-sampled (cache loss?); running totals would be "
                "silently wrong. Re-run, or checkpoint() the input."
            )

    return parts.mapInPandas(assign, out_schema)


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running total of ``value_col`` in ``order_cols`` order —
    the scalable replacement for ``SUM(v) OVER (ORDER BY ...)``: a
    constant-group projection onto :func:`grouped_prefix_sums`, i.e. the
    same two-pass shape (range repartition on the order key; pass 1
    collects ``nparts`` per-partition value sums to the driver; pass 2
    adds local cumulative sums on the prefix-summed offsets).  Rows never
    funnel through one partition.  ``order_cols`` tuples must be unique;
    ``value_col`` must be integral (exact long sums)."""
    marked = df.withColumn("_g", F.lit(1))
    out = grouped_prefix_sums(
        marked, "_g", order_cols, value_col, out_col, inclusive, num_partitions
    )
    return out.drop("_g")


def compact_to_target_files(
    df: DataFrame, path: str, target_mb: int = 128, row_bytes_estimate: int = 100
) -> int:
    """Rewrite ``df`` as parquet at ``path`` in ~target_mb files (lakehouse
    small-file compaction). Returns the file count written. The size
    estimate is row-count based — at scale you'd sample real row width; the
    shape (estimate -> coalesce/repartition -> overwrite) is the operator."""
    n_rows = df.count()
    total_mb = max(n_rows * row_bytes_estimate / (1024 * 1024), 1e-9)
    n_files = max(1, round(total_mb / target_mb))
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return n_files


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) curve key: bit-interleave ``cols`` (already scaled
    to non-negative ints < 2**bits) into one long.

    Built from shift/and/or expressions only, so it stays inside
    whole-stage codegen — no UDF. With k columns the key has k*bits bits;
    keep k*bits <= 63.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as parquet laid out along a Z-order curve over
    ``cols`` (the Delta/Iceberg OPTIMIZE ZORDER analog, built from plain
    Spark ops).

    Each column is min-max scaled to ``bits`` bits (one tiny agg pass for
    the bounds), rows are range-partitioned AND sorted by the interleaved
    curve key, so every output file covers a small hyper-rectangle of the
    key space. Parquet column min/max stats then prune files for
    predicates on ANY prefix-free subset of ``cols`` — unlike a
    lexicographic sort, which only prunes on the leading column. The curve
    key is dropped before write; content is unchanged (pure layout op).
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                    "long"
                ),
            )
        )
    keyed = df.withColumn("_zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def bestfit_pack(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Best-fit-decreasing bin packing per group: items sort by
    (size desc, id) and each goes into the open bin with the SMALLEST
    remaining capacity that still fits (ties: lowest bin id), else opens a
    new bin — the packing that recovers most of the padding waste
    next-fit/concat-chunk leaves on skewed length distributions (BFD is a
    11/9-OPT+1 approximation; next-fit is only 2-OPT).

    Sequential-state operator: the bin table is inherently order-dependent,
    so each group packs inside ONE applyInPandas call (Arrow-batched,
    deterministic order) — the parallel unit is the GROUP (shard), exactly
    how training-shard packing distributes at 100 TB: thousands of shards
    pack concurrently, each shard's state is its own open-bin table,
    bounded by shard token mass / budget. Items larger than ``budget`` are
    clamped to it (the real pipeline's truncate-to-context rule).

    Output: (group, id, size, bin_id, bin_fill) where bin_fill is the
    bin's total AFTER packing — per-bin utilization falls out of a
    groupBy(bin_id).
    """
    import numpy as np

    out_schema = (
        f"{group_col} long, {id_col} long, {size_col} long, "
        "bin_id long, bin_fill long"
    )
    src = df.select(
        F.col(group_col).cast("long"),
        F.col(id_col).cast("long"),
        F.least(F.col(size_col).cast("long"), F.lit(budget)).alias(size_col),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # O(n log n) best-fit via an ordered multiset of (fill, bin_id):
        # the best bin is the PREDECESSOR of (budget - s + 1, ...) — the
        # largest fill that still fits. A naive scan of the bin table is
        # O(n * bins) and measured quadratic at x64 (48.7 s for 40k items
        # per shard, SCALE_PROBE_r06b); the ordered-multiset form holds
        # the per-shard cost to n log n regardless of corpus growth.
        # Tie rule unchanged: equal fills resolve to the LOWEST bin id
        # (the multiset orders (fill, bin_id) ascending and bisect lands
        # on the first entry of a fill run, so stepping left yields the
        # run's... largest id; we instead keep (fill, -bin_id) so the
        # predecessor within an equal-fill run is the lowest id).
        # Stdlib bisect.insort on a plain list, not sortedcontainers: the
        # latter resolved only transitively in this env (r6 ADVICE) and a
        # leaner executor Python would fail at task runtime. Same O(log n)
        # search; list-insert memmove is C-speed and fine at shard sizes.
        import bisect

        pdf = pdf.sort_values(
            [size_col, id_col], ascending=[False, True], kind="mergesort"
        )
        sizes = pdf[size_col].to_numpy()
        open_bins: list[tuple[int, float]] = []  # (fill, -bin_id) ascending
        fills: list[int] = []
        assign = np.empty(len(sizes), dtype="int64")
        neg_inf = float("-inf")
        for n, s in enumerate(sizes):
            i = bisect.bisect_left(open_bins, (budget - s + 1, neg_inf))
            if i == 0:
                b = len(fills)  # nothing fits: open a new bin
                fills.append(0)
            else:
                _, neg = open_bins.pop(i - 1)
                b = int(-neg)
            fills[b] += s
            if fills[b] < budget:  # full bins leave the candidate set
                bisect.insort(open_bins, (fills[b], -b))
            assign[n] = b
        out = pdf.copy()
        out["bin_id"] = assign
        out["bin_fill"] = [fills[b] for b in assign]
        return out

    return src.groupBy(group_col).applyInPandas(pack, schema=out_schema)
