"""r13 A/B: width-pin the n-gram pair-expansion stage.

REST stage metrics (settled run, sf0.1, local[32]) for
dedup_ngram_jaccard at HEAD:

  stage  scan->widen      1 task      44 ms
  stage  shingle+postings 32 tasks  7461 ms CPU   sw 4.4 MB / 224k rec
  stage  drops branch     4 tasks    173 ms       (ReusedExchange)
  stage  bucket+PAIRS     4 tasks   1476 ms CPU   sw 18 MB / 1.22M rec
  stage  final count      16 tasks   613 ms

The pair expansion (quadratic in-bucket double explode + partial pair
count) runs on FOUR tasks: AQE parallelism-first coalescing sized the
4.4 MB gram shuffle by bytes, not by the work above it.  The r12
session-wide probes bracketed this (4 MB minPartitionSize floor ->
pair stage nearly serial, +64%; 64k floor -> everything widened,
dedup net worse), so the fix must be surgical and data-proportional:
hash-repartition the postings by gram below the bucket aggregate
(dedup.NGRAM_BUCKET_TASK_TARGET_BYTES) -- REPARTITION_BY_NUM is
coalescing-exempt, HashPartitioning(g) satisfies the aggregate, and
the aggregate runs single-phase (the wire carries raw 16 B postings
instead of per-partition partial lists: ~3x the bytes, zero partial
collect_list CPU).

Arms: target None (HEAD) / 64k (width 10 at sf0.1) / 32k (19) /
16k (cap 32).

Usage:  python tools/ab_r13_ngram_pairstage.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
PROBING = os.environ.get("SPARK_GRAFT_AB_PROBE", "1") != "0"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (sys.argv[2] if len(sys.argv) > 2
                else "/tmp/AB_R13_NGRAM_PAIRSTAGE.json")

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.operators import dedup as D
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from tools import hostprobe

    if PROBING:
        hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r13_ngram_pairstage")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    ARMS = {"head": None, "t64k": 64 * 1024, "t32k": 32 * 1024,
            "t16k": 16 * 1024}
    TARGETS = ["dedup_ngram_jaccard", "dedup_ngram_jaccard_uncapped"]
    ORIG = D.NGRAM_BUCKET_TASK_TARGET_BYTES

    def run(name):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def timed(name) -> float:
        spark.catalog.clearCache()
        _warm_until_jit_settles(lambda: run(name), jit)
        best = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def content_hash(df):
        from pyspark.sql import functions as F

        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.agg(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            F.count("*").alias("n")).first()
        return (str(row["h"]), row["n"])

    parity: dict[str, dict[str, bool]] = {}
    for name in TARGETS:
        ref = None
        for arm, t in ARMS.items():
            D.NGRAM_BUCKET_TASK_TARGET_BYTES = t
            try:
                h = content_hash(qs[name](spark, sf_dir))
            finally:
                D.NGRAM_BUCKET_TASK_TARGET_BYTES = ORIG
            if ref is None:
                ref = h
            parity.setdefault(name, {})[arm] = h == ref
    print("parity:", json.dumps(parity))

    probes = [hostprobe.probe()] if PROBING else []
    bw = [hostprobe.probe_mt()] if PROBING else []
    times = {n: {a: [] for a in ARMS} for n in TARGETS}
    for _ in range(ROUNDS):
        for name in TARGETS:
            for arm, t in ARMS.items():
                D.NGRAM_BUCKET_TASK_TARGET_BYTES = t
                try:
                    times[name][arm].append(timed(name))
                finally:
                    D.NGRAM_BUCKET_TASK_TARGET_BYTES = ORIG
        if PROBING:
            probes.append(hostprobe.probe())
            bw.append(hostprobe.probe_mt())

    out = {
        "sf_dir": sf_dir, "reps": REPS, "rounds": ROUNDS,
        "times": times,
        "min": {n: {a: min(ts) for a, ts in arms.items()}
                for n, arms in times.items()},
        "parity": parity,
        "probe_sec": probes, "probe_bw_sec": bw,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min"], indent=1))


if __name__ == "__main__":
    main()
