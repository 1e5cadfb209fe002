"""CLI entry point -- the reference's invocation surface, Spark-first.

The reference runs as ``spark-submit --class App --master local[4]``
with six positional warehouse-credential args parsed by hand
(/root/reference/README.md:12-20, src/main/scala/App.scala:9-16).  Our
equivalent is a module CLI over local tables: paths and the query name
replace the connector credentials, and the flagship job writes through
the idempotent partitioned writer instead of a blind append.

    python -m location_summary_etl_spark list
    python -m location_summary_etl_spark run <query> [--sf-dir D] [--limit N]
    python -m location_summary_etl_spark flagship --out PATH [--sf-dir D]
                                                  [--mode append|overwrite|overwrite_partitions]
    python -m location_summary_etl_spark explain <query> [--sf-dir D]
                                                  [--mode formatted|simple|extended|cost]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="location_summary_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every registered query")

    runp = sub.add_parser("run", help="run one corpus query, print rows")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20)

    flag = sub.add_parser("flagship", help="run the flagship summary and write it")
    flag.add_argument("--out", required=True)
    flag.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    flag.add_argument("--mode", default="overwrite_partitions",
                      choices=["append", "overwrite", "overwrite_partitions"])

    exp = sub.add_parser(
        "explain", help="print a corpus query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    exp.add_argument("--mode", default="formatted",
                     choices=["formatted", "simple", "extended", "cost"])
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from location_summary_etl_spark.plans import corpus
    from location_summary_etl_spark.session import get_session

    if args.cmd == "list":
        for name in corpus.queries():
            print(name)
        return 0

    spark = get_session(app_name=f"lse-{args.cmd}")
    if args.cmd in ("run", "explain"):
        qs = corpus.queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = qs[args.query](spark, args.sf_dir)
        if args.cmd == "run":
            df.show(args.limit, truncate=False)
        else:
            df.explain(mode=args.mode)
        return 0

    # flagship: compute + write through the idempotent writer, the
    # partition key being the audit snapshot date (a rerun replaces
    # exactly its own snapshot partition -- contrast the reference's
    # duplicate-on-rerun append, App.scala:265-270).
    from location_summary_etl_spark.plans.flagship import flagship_nation_summary
    from location_summary_etl_spark.sources.writers import write_summary

    df = flagship_nation_summary(spark, args.sf_dir)
    partition_by = ["snapshot_date"] if args.mode == "overwrite_partitions" else None
    write_summary(df, args.out, mode=args.mode, partition_by=partition_by)
    print(f"wrote {args.out} ({args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
