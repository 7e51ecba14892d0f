"""Command-line entry point: run any registered query, arbitrary SQL over
the fixture tables, or inspect the registry — the day-to-day interface a
user of the reference's per-pipeline ``main.py`` scripts switches to.

    python -m projeto_de_etl_com_api_do_meta_spark list [--tag TAG]
    python -m projeto_de_etl_com_api_do_meta_spark run QUERY [--sf DIR]
        [--limit N] [--out PATH] [--explain]
    python -m projeto_de_etl_com_api_do_meta_spark sql "SELECT ..." [--sf DIR]

``run --out`` writes the result as parquet (the batch-job form); without
``--out`` it prints up to ``--limit`` rows. ``sql`` registers every fixture
table (region nation customer supplier part orders lineitem events documents
embeddings) as a temp view first, so ad-hoc ANSI SQL works out of the box.
``--explain`` prints the formatted physical plan INSTEAD of executing —
the first thing to read when a query misbehaves at scale.
"""

from __future__ import annotations

import argparse
import os
import sys

_DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="projeto_de_etl_com_api_do_meta_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", default=None, help="filter by tag")

    p_run = sub.add_parser("run", help="run a registered query")
    p_run.add_argument("query")
    p_run.add_argument("--sf", default=_DEFAULT_SF)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--out", default=None, help="write result parquet here")
    p_run.add_argument(
        "--explain", action="store_true", help="print the plan, don't execute"
    )

    p_sql = sub.add_parser("sql", help="run SQL over the fixture tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf", default=_DEFAULT_SF)
    p_sql.add_argument("--limit", type=int, default=20)
    return p


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .queries.registry import QUERIES, _load_all

    _load_all()

    if args.cmd == "list":
        for name, spec in sorted(QUERIES.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}\t{','.join(spec.tags)}")
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query].fn(spark, args.sf)
        if args.explain:
            print(_formatted_plan(df))
            return 0
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
            return 0
        df.show(args.limit, truncate=False)
        return 0

    # sql
    from .io import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, args.sf, t).createOrReplaceTempView(t)
        except Exception:  # a fixture dir may omit tables; views are best-effort
            continue
    spark.sql(args.statement).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
