"""Capture formatted physical plans for flagship queries into PLANS.md.

The plan-shape tests (tests/test_plan_shapes.py) and tools/plan_audit.py
enforce these properties mechanically; this artifact makes them REVIEWABLE:
for each flagship query, the exact `.explain("formatted")` output plus a
one-paragraph annotation of why this is the plan you want at 100 TB.

Usage:  python tools/capture_plans.py  [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

#: Standing performance findings, regenerated into PLANS.md's header so
#: they survive plan re-capture.
PERF_NOTES = """
## Perf notes (standing findings)

- **r8 root-cause: the r7 `perf_daily_fact` / `join_full_outer_fanout`
  "regression" is NOT an `addPyFile` tax.** Suspect was session.py's
  `_ship_package` (commit 1afafa7) adding a constant per-job cost.
  Measured (tools/probe_addpyfile_tax.py, one session, 7 reps each,
  before vs after the hook fires, plus a flipped-order control): medians
  with the hook are equal-or-faster in both orders (hook-second:
  perf_daily_fact 2.04→1.92 s, no-op count 0.102→0.082 s — i.e. pure
  warmup drift; hook-first control shows the same plateau). addPyFile is
  one sc.addFile call per SESSION; it adds nothing per job. The r7
  deltas (~0.3 s on ~1 s queries, isolated ≈ shared) are attributed to
  headline-set composition changing shared-JVM cache/GC pressure — the
  r4-pinned noise mode — not to any code path. Artifact:
  SCALE_PROBE_r08.json, probe `addpyfile_tax`.
"""

#: (query, what to look for in the plan — the annotation printed above it)
FLAGSHIPS = [
    (
        "q3_shipping_priority",
        "TPC-H Q3 (customer ⋈ orders ⋈ lineitem): the segment filter reaches "
        "the customer scan as PushedFilters and only the referenced columns "
        "appear in ReadSchema; customer (small side) is broadcast, the "
        "orders⋈lineitem join shuffles on the key; the final top-10 is "
        "TakeOrderedAndProject, not a global sort.",
    ),
    (
        "perf_daily_fact",
        "The reference's campaign-performance pipeline as ONE fused Catalyst "
        "plan: conform → whitelist actions pivot (pure expressions, no UDF) "
        "→ coercions → first-non-null window per key → safe-ratio "
        "projection. Everything between the scan and the exchange is "
        "WholeStageCodegen — the reference's per-row Python loop is an "
        "expression tree here.",
    ),
    (
        "dedup_exact_docs",
        "Exact dedup as min(struct) hash aggregation — partial_min on the "
        "map side before the exchange (combine-before-shuffle), never a "
        "window sort over the full corpus.",
    ),
    (
        "dedup_ngram_jaccard",
        "Near-dup posting join: explode → equi-join on the shingle key → "
        "count aggregation. The only row-scale exchanges hash on "
        "shingle/doc keys; no CartesianProduct / BroadcastNestedLoopJoin "
        "anywhere in the tree (plan_audit fails the build if one appears).",
    ),
    (
        "text_decontaminate_bloom",
        "Bloom-gated decontamination: the might_contain filter sits "
        "directly on the raw gram stream BEFORE any wide exchange — the "
        "16 KB sketch prunes the 100 TB side pre-shuffle; the exact verify "
        "join only sees survivors.",
    ),
    (
        "embed_knn_bruteforce",
        "Exact kNN baseline: the 10-row query side is BroadcastExchange "
        "into a nested loop with the corpus (the deliberate, allowlisted "
        "exception), scored by codegen'd zip_with/aggregate dot products; "
        "per-query top-5 is a bounded window.",
    ),
    (
        "join_salted_skew",
        "Hot-key salted join: the skewed side is salted N ways and the "
        "small side replicated per salt (explode) so no single reducer "
        "owns a hot key — the exchange hashes on (key, salt).",
    ),
    (
        "stream_tumbling_daily",
        "Streaming tumbling window run as AvailableNow batch replay: "
        "stateful aggregation with watermark; partial aggregation before "
        "the state store exchange keeps per-batch shuffles bounded by "
        "distinct (window, key) pairs.",
    ),
    (
        "join_bloom_semi_reduction",
        "Bloom-gated semi-join: the literal-bitset membership Filter sits "
        "directly over the orders scan — BEFORE any Exchange — so the "
        "fact side's shuffle carries only bloom-passing rows (~dimension "
        "selectivity); the exact equi-join afterwards removes the bloom's "
        "false positives. The 16 KB bitset ships inside the plan as a "
        "literal; no extra join, no Python.",
    ),
    (
        "corpus_bm25_search",
        "BM25 ranked retrieval: the query-term IN-list Filter sits on the "
        "exploded token stream BEFORE the (doc, term) aggregation exchange "
        "— only the query's postings ever shuffle; df and (N, avgdl) are "
        "BroadcastExchange scalar aggregates joined map-side; the final "
        "top-10 is TakeOrderedAndProject, not a global sort.",
    ),
    (
        "retrieval_colbert_maxsim",
        "ColBERT late-interaction scoring: the 1-row query side is "
        "BroadcastExchange into the candidate scan; all 64 chunk-pair "
        "cosines are one WholeStageCodegen projection (no EvalPython, no "
        "explode); the top-10 is TakeOrderedAndProject on the 6dp-rounded "
        "score.",
    ),
    (
        "agg_quantile_sketch_md5",
        "Two-phase exact quantile selection (r9): per-cent-value counts are "
        "ONE hash aggregate with map-side combine; the coarse bin table "
        "(fixed width, ~110 rows) locates each rate's median bin via a tiny "
        "window; only the chosen bin's values are cum-summed (bounded by "
        "bin width); the final full-column rank is a 3-row broadcast "
        "comparison aggregate. No full-table total order anywhere — the "
        "global-sort-free shape exact quantiles need at 100 TB.",
    ),
    (
        "graph_hits_bipartite",
        "Iterative HITS with per-half-step localCheckpoint (r9 probe "
        "lesson): each half-step is one edges-scores shuffle join + one "
        "hash aggregate + a 1-row max broadcast; the checkpoint cuts "
        "lineage so AQE plans each half-step once instead of re-planning "
        "the whole prior chain (measured 6-12x on a skew-heavy synthetic "
        "graph, 29.5s->11.5s on the sf0.1 purchase graph).",
    ),
    (
        "agg_hll_distinct_sketch",
        "HyperLogLog registers: one scan, partial_max map-side combine "
        "into <= groups x 64 register cells before the exchange — the "
        "shuffle carries sketch state, never raw values; the merge scope "
        "is a second tiny MAX over the same cells.",
    ),
    (
        "ml_bootstrap_ci_poisson",
        "Poisson bootstrap: the x200 replicate fan-out (4 uniform lanes "
        "per md5 digest) feeds partial_sum map-side combine into "
        "(type, rep) cells — exploded rows never shuffle raw; CI order "
        "statistics run on the tiny replicate-mean table.",
    ),
    (
        "join_geo_grid_knn",
        "Grid-bucketed spatial kNN (r9b): the ONLY nested-loop in the tree is the allowlisted 9-row offset-spine broadcast (the 3x3 neighborhood enumeration — bounded by the constant 9, never data-scale); the supplier match itself is a BroadcastHashJoin on (cell_x, cell_y) — no distance cross product — and the argmin is a row_number window PARTITIONED by customer (WindowGroupLimit prunes to rank 1 before the final sort). Candidate volume = customers x cell density; at 100 TB you shrink cells to hold density ~ k and salt hot cells, the plan shape is unchanged.",
    ),
    (
        "corpus_cooc_svd_embedding",
        "Spectral word embedding (r9c): the ONLY corpus-scale stage is "
        "the bigram count hash aggregate (map-side combinable); the "
        "positive-lift matrix lives on the vocab^2 grid, and both "
        "power-iteration matvecs are vocab-row joins against broadcast "
        "rescaled vectors — integer arithmetic end-to-end, so the plan "
        "carries no float-summation ordering hazard across engines.",
    ),
    (
        "er_jaro_winkler_pairs",
        "String-distance ER join (r10s2): candidate pairs come from a "
        "first-word-block equi-join (SortMergeJoin on the block key, "
        "capped at 256 members by a row_number window), the O(pairs) "
        "mass gate is the JVM-side codegen levenshtein <= 3 filter, and "
        "only the gate's few-per-mille survivors reach the Arrow-batched "
        "Python JW scorer — the UDF never sees the candidate fire-hose. "
        "At 100 TB pair work is blocks x cap^2 with the vocabulary "
        "growing Heaps-sublinearly (SCALE_PROBE_r10c pins the cap "
        "engaging at x16).",
    ),
    (
        "geo_geohash_encode",
        "Geohash bucketing (r10s2): the 25-bit interleave is ~75 "
        "constant-folded integer terms inside ONE WholeStageCodegen "
        "projection over the union scan — a map-only stage ending in a "
        "partial-count hash aggregate; the only exchange hashes the "
        "gh4 prefix. Scan-linear to x64 in the probe.",
    ),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(_REPO_ROOT, "PLANS.md"))
    a = ap.parse_args()

    from projeto_de_etl_com_api_do_meta_spark.queries.registry import (
        QUERIES,
        _load_all,
    )
    from projeto_de_etl_com_api_do_meta_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    parts = [
        "# PLANS — formatted physical plans of flagship queries "
        "(auto-generated by tools/capture_plans.py)\n\n"
        "Mechanically enforced by tests/test_plan_shapes.py and "
        "tools/plan_audit.py; captured here for review. "
        f"Fixture: {a.sf}.\n" + PERF_NOTES
    ]
    for name, note in FLAGSHIPS:
        df = QUERIES[name].fn(spark, a.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        parts.append(f"\n## {name}\n\n{note}\n\n```\n{plan}\n```\n")
        print(f"captured {name}", flush=True)
    with open(a.out, "w") as f:
        f.write("".join(parts))
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
