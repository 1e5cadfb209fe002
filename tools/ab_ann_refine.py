"""Refine-stage A/B for quantized serving (r10): int8 top-R + float
rescore (`ivf_query_index_quantized(refine=R)`) vs the bare int8 path
vs the float path, same literal queries, same probed cells.

What refine buys is ACCURACY at q8 scan cost: the candidate scan stays
the 1 byte/dim inverted file; only the top-R ids per query come back
for an exact float rescore (an IN(ids) pushdown over the build's
id-sorted-within-cell layout -- parquet's page-level column index then
decodes only pages that can hold a candidate id, so the fetch is
O(R x |Q|) pages, not O(probed cells' float bytes); the file-level
numbers printed here are the pre-page-pruning upper bound).

Usage: python tools/ab_ann_refine.py [tier] [R]   (default sf10, 100)

MEASURED 2026-08-15 (sf10 tier = 200k vectors, k=10, both probe
classes quiet, min-of-5 interleaved, END-TO-END per call --
construction inside the timer, because the refine path runs its int8
scan + top-R collect eagerly at construction; an earlier measurement
that timed only the prebuilt plan's action understated refined
latency by the whole candidate-scan term): agreement vs float is
0.80 bare int8; refined R=40 (4x k) stays 0.80 on this corpus
(random dense embeddings pack the top cosines within the ~1e-3
quantization error, scattering true top-10 past rank 40), R=100
(10x k) measures 1.00 AND row-for-row float-identical output.
End-to-end latency float 2.737 s / int8 1.454 s / refined(R=100)
2.598 s -- at this tiny tier the refine stage's extra driver jobs
eat most of the byte win, so refined wins on LATENCY only slightly
(~5% under float, exact results); the scale story is BYTES: the
bulk candidate scan stays int8 8.21 MB vs float 56.87 MB (6.9x) and
the float fetch decodes ~R x |Q| = 500 of 200k rows via IN-pushdown,
so at warehouse scale the refined path approaches bare-int8 I/O with
float-exact answers.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools import hostprobe  # noqa: E402


def timed(spark, make_df) -> float:
    """End-to-end: construction INSIDE the timer.  The refine path runs
    its int8 scan + top-R collect eagerly while the DataFrame is being
    BUILT, so timing only a prebuilt df's action would silently drop
    the candidate-scan term from the refined column (r10 self-review
    finding -- the first published numbers did exactly that)."""
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    make_df().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def scan_bytes(df) -> tuple[int, int]:
    files = [f.removeprefix("file:") for f in df.inputFiles()]
    return len(files), sum(os.path.getsize(f) for f in files)


def main() -> None:
    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
        ivf_query_index_quantized,
        ivf_query_index_vectors,
    )
    from location_summary_etl_spark.session import get_session

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    d = os.path.join(HERE, "bench_tiers", tier)
    spark = get_session(app_name="ab-ann-refine")
    spark.range(1).write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    root = f"/tmp/ab_ann_refine_{tier}"
    shutil.rmtree(root, ignore_errors=True)
    v = build_ivf_index(emb, root, store_quantized=True)
    qids = [0, 1, 2, 3, 4]
    queries = [(r["vec_id"], list(map(float, r["embedding"])))
               for r in emb.filter(emb.vec_id.isin(qids)).collect()]

    k = 10
    fl = lambda: ivf_query_index_vectors(spark, root, queries,  # noqa
                                         k=k, version=v)
    q8 = lambda: ivf_query_index_quantized(spark, root, queries,  # noqa
                                           k=k, version=v)
    rf = lambda: ivf_query_index_quantized(spark, root, queries,  # noqa
                                           k=k, version=v, refine=R)

    a = {(r["query_id"], r["vec_id"]) for r in fl().collect()}
    b = {(r["query_id"], r["vec_id"]) for r in q8().collect()}
    c = {(r["query_id"], r["vec_id"]) for r in rf().collect()}
    print(f"top-{k} agreement vs float: int8 {len(a & b) / len(a):.2f} "
          f"-> refined (R={R}) {len(a & c) / len(a):.2f}", flush=True)
    exact_rows = sorted(map(str, fl().collect()))
    ref_rows = sorted(map(str, rf().collect()))
    print(f"refined == float row-for-row: {exact_rows == ref_rows}",
          flush=True)

    probes, bw_probes = hostprobe.wait_quiet_all()
    probe, bw = probes[-1], bw_probes[-1]
    times = {"float": [], "int8": [], "refined": []}
    for _ in range(5):
        times["float"].append(timed(spark, fl))
        times["int8"].append(timed(spark, q8))
        times["refined"].append(timed(spark, rf))
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.3f} s  all "
              f"{[round(t, 3) for t in ts]}", flush=True)
    nf_f, by_f = scan_bytes(fl())
    nf_q, by_q = scan_bytes(q8())
    nf_r, by_r = scan_bytes(rf())
    nq = len(queries)
    print(f"scan (file-level): float {nf_f} files/{by_f / 1e6:.2f} MB; "
          f"int8 {nf_q} files/{by_q / 1e6:.2f} MB; "
          f"refined {nf_r} files/{by_r / 1e6:.2f} MB upper bound "
          f"(float fetch decodes ~{R * nq} of "
          f"{emb.count()} rows via IN-pushdown page pruning)",
          flush=True)
    print(f"probe start {probe:.3f}/end {hostprobe.probe():.3f} s, "
          f"probe_bw start {bw:.3f}/end {hostprobe.probe_mt():.3f} s "
          f"(r10 kernel, quiet<= {hostprobe.MT_QUIET_SEC})", flush=True)


if __name__ == "__main__":
    main()
