"""Per-batch cost curve for the continuously-indexed ingest path
(r9 order #5): what does `foreach_batch_indexed_ingest`'s per-micro-
batch `refresh_ivf_index` cost as a function of batch size, and when
does refresh-every-N beat refresh-every-batch?

Method: the exact foreachBatch step (versioned append commit + delta
refresh) is driven directly, batch by batch, against the sf10 tier's
embeddings (200k vectors -- the largest self-generated tier) -- same code path as the stream, minus the
trigger/checkpoint machinery whose cost is Spark-fixed and batch-size-
independent.  Three batch sizes x 3 batches each, then the DEFERRED
variant (N commits, one refresh spanning them -- exactly what the
stream's crash-repair path already does, since refresh diffs against
the index's own pin).  Probe-gated (tools/hostprobe.py): waits for a
quiet window and stamps boundary probes.

Usage: python tools/ab_stream_ingest.py [tier]   (default sf10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools import hostprobe  # noqa: E402

BATCH_SIZES = [200, 1000, 4000]
BATCHES_PER_SIZE = 3
DEFER_N = 4          # deferred variant: DEFER_N commits, one refresh
DEFER_SIZE = 200


def main() -> None:
    from pyspark.sql import functions as F

    from location_summary_etl_spark.operators.ann_index import (
        index_meta,
        ivf_query_index,
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
    )
    from location_summary_etl_spark.session import get_session
    from location_summary_etl_spark.sources.versioned import VersionedTable

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    d = os.path.join(HERE, "bench_tiers", tier)
    spark = get_session(app_name="ab-stream-ingest")
    spark.range(1).write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    # Held-out ingest pool: ~8% of the corpus, chunked by sorted vec_id
    # so each batch is a cheap range filter.
    pool_cond = F.col("vec_id") % 12 == 0
    pool_ids = sorted(r["vec_id"] for r in
                      emb.filter(pool_cond).select("vec_id").collect())
    n_seed = emb.count() - len(pool_ids)
    print(f"{tier}: seed={n_seed} rows, ingest pool={len(pool_ids)}",
          flush=True)

    sizes = list(BATCH_SIZES)
    defer_size = DEFER_SIZE
    need = BATCHES_PER_SIZE * sum(sizes) + DEFER_N * defer_size
    while need > len(pool_ids):  # smaller tiers: shrink proportionally
        sizes = [max(50, s // 10) for s in sizes]
        defer_size = max(50, defer_size // 10)
        need = BATCHES_PER_SIZE * sum(sizes) + DEFER_N * defer_size

    scratch = f"/tmp/ab_stream_ingest_{tier}"
    shutil.rmtree(scratch, ignore_errors=True)
    base = VersionedTable(os.path.join(scratch, "base"))
    base.commit(emb.filter(~pool_cond), mode="overwrite")
    root = os.path.join(scratch, "idx")
    t0 = time.perf_counter()
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version())
    t_build = time.perf_counter() - t0

    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)

    cursor = 0

    def next_chunk(size: int):
        nonlocal cursor
        ids = pool_ids[cursor:cursor + size]
        cursor += size
        lo, hi = ids[0], ids[-1]
        return emb.filter(pool_cond
                          & (F.col("vec_id") >= lo)
                          & (F.col("vec_id") <= hi)), len(ids)

    cells_tbl = VersionedTable(os.path.join(root, "cells"))

    def step(size: int):
        """One foreachBatch step: commit the batch, refresh the index;
        returns (commit_sec, refresh_sec, n_rows, cells_files_after)."""
        chunk, n = next_chunk(size)
        t0 = time.perf_counter()
        base.commit(chunk, mode="append")
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        g = refresh_ivf_index(spark, base, root)
        t_r = time.perf_counter() - t0
        nf = cells_tbl._manifest(index_meta(root, g)["cells_version"])["n_files"]
        return t_c, t_r, n, nf

    print(f"index build over seed: {t_build:.2f}s", flush=True)
    results: dict[int, list[tuple]] = {}
    for size in sizes:
        results[size] = [step(size) for _ in range(BATCHES_PER_SIZE)]
        rows = results[size]
        per_krow = [r[1] / (r[2] / 1000) for r in rows]
        print(f"batch={size}: commit {[round(r[0], 2) for r in rows]}s, "
              f"refresh {[round(r[1], 2) for r in rows]}s "
              f"({[round(x, 2) for x in per_krow]} s/krow), "
              f"cells files after {[r[3] for r in rows]}", flush=True)

    # Deferred: DEFER_N commits land first, ONE refresh spans them
    # (the stream's crash-repair shape: refresh diffs against the
    # index's own pin, not "this batch").
    for _ in range(DEFER_N):
        chunk, _n = next_chunk(defer_size)
        base.commit(chunk, mode="append")
    t0 = time.perf_counter()
    refresh_ivf_index(spark, base, root)
    t_def = time.perf_counter() - t0
    per_batch_defer = [r[1] for r in results[defer_size]]
    print(f"deferred: {DEFER_N} x {defer_size} rows -> ONE refresh "
          f"{t_def:.2f}s vs {DEFER_N} per-batch refreshes "
          f"~{DEFER_N * min(per_batch_defer):.2f}s "
          f"(min-based; per-batch min {min(per_batch_defer):.2f}s)",
          flush=True)

    # sanity: the maintained index answers and passes the staleness gate
    got = ivf_query_index(spark, root, [1, 2, 3], k=3,
                          verify_against=base.read(spark))
    assert got.count() > 0
    print(f"end probe: {hostprobe.probe():.2f}s "
          f"(quiet <= {hostprobe.QUIET_SEC})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
