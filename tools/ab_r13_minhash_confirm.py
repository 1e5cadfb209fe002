"""r13 confirm A/B: the production SIGNATURE_TASK_TARGET_BYTES bound
vs the r12 core-width form, on the exact operators it reaches.

tools/ab_r13_minhash.py established the width curve with a
monkeypatched ensure_parallelism; this tool measures the REAL change
(dedup.SIGNATURE_TASK_TARGET_BYTES threaded through _posting_hashes):

  head   HEAD: width = min(cores, ceil(source_bytes / 64KB))
  wide   SIGNATURE_TASK_TARGET_BYTES disabled (None) == the r12 plan

Also asserts the n-gram operators' plans are BYTE-IDENTICAL between
arms (they do not pass a target; the constant must not reach them).

Usage:  python tools/ab_r13_minhash_confirm.py [sf_dir] [out_json]
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
                else "/tmp/AB_R13_MINHASH_CONFIRM.json")

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
    spark = get_session(app_name="ab_r13_minhash_confirm")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    HEADT = D.SIGNATURE_TASK_TARGET_BYTES
    ARMS = {"head": HEADT, "wide": None}
    TARGETS = ["dedup_minhash_lsh", "dedup_minhash_lsh_uncapped",
               "dedup_minhash_signatures"]

    # n-gram plans must not move between arms (modulo the fresh
    # expression/plan ids every plan build mints).
    import re

    def _norm(s: str) -> str:
        # expr ids, plan ids AND lambda-variable fresh names (x_1 vs
        # x_2: a session-global counter, not a plan property)
        return re.sub(r"(#\d+|plan_id=\d+|lambda x_\d+)", "#", s)

    for name in ("dedup_ngram_jaccard", "dedup_ngram_jaccard_uncapped"):
        plans = {}
        for arm, t in ARMS.items():
            D.SIGNATURE_TASK_TARGET_BYTES = t
            try:
                plans[arm] = _norm(
                    qs[name](spark, sf_dir)._jdf.queryExecution()
                    .explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            finally:
                D.SIGNATURE_TASK_TARGET_BYTES = HEADT
        assert plans["head"] == plans["wide"], f"{name} plan moved!"
    print("ngram plans identical across arms (modulo expr ids): ok")

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
            D.SIGNATURE_TASK_TARGET_BYTES = t
            try:
                h = content_hash(qs[name](spark, sf_dir))
            finally:
                D.SIGNATURE_TASK_TARGET_BYTES = HEADT
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
                D.SIGNATURE_TASK_TARGET_BYTES = t
                try:
                    times[name][arm].append(timed(name))
                finally:
                    D.SIGNATURE_TASK_TARGET_BYTES = HEADT
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
