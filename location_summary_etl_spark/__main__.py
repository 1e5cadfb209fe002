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
    python -m location_summary_etl_spark index {build|refresh|query|info|vacuum} ...

The ``index`` group is the persisted-ANN-index life-cycle
(operators/ann_index.py) as an operable surface: ``build`` from a
VersionedTable (delta-refreshable) or a bare parquet dir
(rebuild-only), ``refresh`` after base commits, ``query`` by corpus
ids with an optional staleness check, ``info`` for the pinned
metadata, ``vacuum`` for pin-aware retention across all index tables.
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

    idx = sub.add_parser(
        "index", help="persisted ANN index life-cycle (build/refresh/"
        "query/info/vacuum)")
    isub = idx.add_subparsers(dest="index_cmd", required=True)

    ib = isub.add_parser("build", help="build an index generation")
    ib.add_argument("--base", required=True,
                    help="VersionedTable root (delta-refreshable) or a "
                    "bare parquet path (rebuild-only)")
    ib.add_argument("--root", required=True, help="index root directory")
    ib.add_argument("--id-col", default="vec_id")
    ib.add_argument("--vec-col", default="embedding")
    ib.add_argument("--label-col", default="label")
    ib.add_argument("--quantizer", default="label",
                    choices=["label", "kmeans"])
    ib.add_argument("--k-cells", type=int, default=8)
    ib.add_argument("--train-iters", type=int, default=2)
    ib.add_argument("--store-quantized", action="store_true",
                    help="also persist the int8 inverted file "
                    "(serves ivf_query_index_quantized)")

    ir = isub.add_parser("refresh", help="delta-refresh after base commits")
    ir.add_argument("--base", required=True, help="VersionedTable root")
    ir.add_argument("--root", required=True)
    ir.add_argument("--id-col", default="vec_id")
    ir.add_argument("--vec-col", default="embedding")
    ir.add_argument("--label-col", default="label")
    ir.add_argument("--rebuild-fraction", type=float, default=0.2)
    ir.add_argument("--compact-files", type=int, default=64,
                    help="inverted-file fragmentation bound; 0 disables "
                    "compaction (the library's None)")

    iq = isub.add_parser("query", help="top-k for corpus ids")
    iq.add_argument("--root", required=True)
    iq.add_argument("--ids", required=True,
                    help="comma-separated query ids, e.g. 0,1,2")
    iq.add_argument("--k", type=int, default=5)
    iq.add_argument("--n-probe", type=int, default=2)
    iq.add_argument("--version", type=int, default=None,
                    help="pin an index generation (default: latest)")
    iq.add_argument("--verify-base", default=None,
                    help="VersionedTable root to staleness-check against")
    iq.add_argument("--quantized", action="store_true",
                    help="serve from the int8 inverted file (index must "
                    "be built with --store-quantized); query vectors are "
                    "looked up in the pinned float cells table")
    iq.add_argument("--refine", type=int, default=0,
                    help="with --quantized: float-rescore the int8 "
                    "top-R candidates (R >= k, e.g. 4-10x k) so the "
                    "final ranking uses exact cosine; 0 disables")

    ii = isub.add_parser("info", help="print the pinned index metadata")
    ii.add_argument("--root", required=True)
    ii.add_argument("--version", type=int, default=None)

    def _retain(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("retain must be >= 1")
        return n

    iv = isub.add_parser("vacuum", help="pin-aware retention")
    iv.add_argument("--root", required=True)
    iv.add_argument("--retain", type=_retain, default=2)
    iv.add_argument("--grace-seconds", type=float, default=3600.0)
    return p


def _index_main(args, spark) -> int:
    """The ``index`` subcommand group over operators/ann_index.py."""
    import json
    import os

    from location_summary_etl_spark.operators import ann_index
    from location_summary_etl_spark.sources.versioned import VersionedTable

    def _is_versioned(path: str) -> bool:
        # the layout knowledge stays in sources/versioned.py
        return os.path.isdir(VersionedTable(path).manifest_dir)

    if args.index_cmd == "build":
        if _is_versioned(args.base):
            tbl = VersionedTable(args.base)
            emb, base_version = tbl.read(spark), tbl.latest_version()
        else:
            emb, base_version = spark.read.parquet(args.base), None
        v = ann_index.build_ivf_index(
            emb, args.root, id_col=args.id_col, vec_col=args.vec_col,
            label_col=args.label_col, base_version=base_version,
            quantizer=args.quantizer, k_cells=args.k_cells,
            train_iters=args.train_iters,
            store_quantized=args.store_quantized)
        print(f"built index generation v{v} at {args.root}"
              + ("" if base_version is not None else
                 " (bare parquet base: refresh unavailable, rebuild only)"))
        return 0
    if args.index_cmd == "refresh":
        if not _is_versioned(args.base):
            print(f"{args.base} is not a VersionedTable root "
                  "(no _manifests); delta refresh needs one", file=sys.stderr)
            return 2
        v = ann_index.refresh_ivf_index(
            spark, VersionedTable(args.base), args.root,
            id_col=args.id_col, vec_col=args.vec_col,
            label_col=args.label_col,
            rebuild_fraction=args.rebuild_fraction,
            compact_files=args.compact_files if args.compact_files > 0
            else None)
        meta = ann_index.index_meta(args.root, v)
        print(f"index at generation v{v} (op={meta['op']}, "
              f"base_version={meta['base_version']})")
        return 0
    if args.index_cmd == "query":
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
        verify = (VersionedTable(args.verify_base).read(spark)
                  if args.verify_base else None)
        if args.quantized:
            # id-keyed quantized serving.  The staleness gate (the
            # library's verify_index, same contract the serving call's
            # verify_against wraps) runs FIRST: a stale pin must raise
            # StaleIndexError before the query-vector lookup can turn
            # it into a misleading "ids not in the indexed corpus"
            # error -- and before any scan is paid.  Then the query
            # vectors are looked up in the verified generation's float
            # cells table (IN pushdown over the id-sorted layout
            # prunes the scan), and the int8 inverted file serves.
            if verify is not None:
                meta = ann_index.verify_index(args.root, verify,
                                              version=args.version)
            else:
                meta = ann_index.index_meta(args.root, args.version)
            ids = sorted(set(ids))  # --ids 7,7 is one query, not two
            cells = VersionedTable(
                os.path.join(args.root, "cells")).read(
                    spark, meta["cells_version"])
            rows = (cells.filter(cells.vec_id.isin(ids))
                    .select("vec_id", "c_v").collect())
            if len(rows) != len(ids):
                missing = sorted(set(ids) - {int(r["vec_id"])
                                             for r in rows})
                print(f"error: ids not in the indexed corpus: "
                      f"{missing}", file=sys.stderr)
                return 2
            queries = [(int(r["vec_id"]), [float(x) for x in r["c_v"]])
                       for r in rows]
            ann_index.ivf_query_index_quantized(
                spark, args.root, queries, k=args.k,
                n_probe=args.n_probe, version=meta["version"],
                refine=args.refine if args.refine > 0 else None).show(
                    len(ids) * args.k, truncate=False)
            return 0
        ann_index.ivf_query_index(
            spark, args.root, ids, k=args.k, n_probe=args.n_probe,
            version=args.version, verify_against=verify).show(
                len(ids) * args.k, truncate=False)
        return 0
    if args.index_cmd == "info":
        print(json.dumps(ann_index.index_meta(args.root, args.version),
                         indent=1))
        return 0
    # vacuum
    removed = ann_index.vacuum_index(args.root,
                                     retain_generations=args.retain,
                                     grace_seconds=args.grace_seconds)
    for table, files in removed.items():
        print(f"{table}: removed {len(files)} file(s)")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from location_summary_etl_spark.plans import corpus
    from location_summary_etl_spark.session import get_session

    if args.cmd == "list":
        for name in corpus.queries():
            print(name)
        return 0

    if (args.cmd == "index" and args.index_cmd == "query"
            and args.quantized and 0 < args.refine < args.k):
        # Argument errors follow the missing-ids convention: stderr
        # message + exit 2, not a raw ValueError traceback -- and they
        # fail HERE, before the multi-second JVM startup (the library
        # validates too, at function entry, for non-CLI callers).
        print(f"error: --refine {args.refine} must be >= --k {args.k} "
              "(or 0 to disable)", file=sys.stderr)
        return 2

    if args.cmd == "index" and args.index_cmd in ("info", "vacuum"):
        # metadata/filesystem only -- neither touches Spark, so neither
        # pays the multi-second local JVM startup
        return _index_main(args, None)

    spark = get_session(app_name=f"lse-{args.cmd}")
    if args.cmd == "index":
        return _index_main(args, spark)
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
