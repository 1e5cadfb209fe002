"""r13 optimization A/B: the dedup_minhash_lsh width inversion.

The r12 driver artifacts (PERF_r12.json "scaling") measured
dedup_minhash_lsh at c8/c32 = 0.50 -- the query runs TWICE AS FAST on
8 cores as on 32 at sf0.1 -- while every other query sits at 0.73-1.02.
documents.parquet at sf0.1 is 594 KB / 500 docs; ``ensure_parallelism``
widens the scan to full core width (32), so every one of the plan's
~4 stages runs 32 tasks of ~18 KB each, and the three exchanges write
32x32 block matrices.  Hypothesis (guide §2.2 "fewer, larger tasks";
§2.6 tiny-task overhead): at this input size the per-task fixed cost
(scheduling, shuffle-file setup, AQE stage bookkeeping) exceeds the
per-task work, and a DATA-PROPORTIONAL width (bytes/target, cores-
capped) beats the constant core-width fan-out.

Arms (monkeypatched ``session.ensure_parallelism`` width; the
production change, if adopted, parameterises the helper instead):

  w32   HEAD: widen to defaultParallelism (32)
  w16 / w8 / w4
        widen to a fixed smaller width
  w1    no widening at all (the pre-r10 shape: everything fused into
        the single-row-group scan stage runs on one core)

Queries: dedup_minhash_lsh (the inversion), dedup_ngram_jaccard (same
widened postings pipeline, 2x the runtime -- does it want narrower
too?), text_fingerprints (the ONE query that scales 1.52 at c8/c32:
its per-byte work is ~4x heavier 8-char shingles, so it should KEEP
full width -- the control that stops us over-rotating on minhash).

Per-arm stage metrics for minhash w32/w8 come from the monitoring REST
API (UI enabled in this session only) so the loss attributes to a
stage, not a guess.

Usage:  python tools/ab_r13_minhash.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
PROBING = os.environ.get("SPARK_GRAFT_AB_PROBE", "1") != "0"
UI_PORT = 4052


def _stages(app_id: str) -> list[dict]:
    url = f"http://127.0.0.1:{UI_PORT}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/AB_R13_MINHASH.json"

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark import session as S
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from tools import hostprobe

    if PROBING:
        hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r13_minhash", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)})
    demote_guarded_window_warnings(spark)
    app_id = spark.sparkContext.applicationId
    qs = contract.queries()
    jit = _jit_bean(spark)

    orig_ep = S.ensure_parallelism

    def make_ep(width: int):
        if width == 1:
            return lambda df, min_partitions=None, by=None: df

        def ep(df, min_partitions=None, by=None):
            return orig_ep(df, min_partitions=width, by=by)

        return ep

    ARMS = {f"w{w}": make_ep(w) for w in (32, 16, 8, 4, 1)}
    TARGETS = {
        "dedup_minhash_lsh": ["w32", "w16", "w8", "w4", "w1"],
        "dedup_ngram_jaccard": ["w32", "w8"],
        "text_fingerprints": ["w32", "w16", "w8"],
    }

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

    # Parity: every arm must emit the identical result multiset.
    parity: dict[str, dict[str, bool]] = {}
    for name, arms in TARGETS.items():
        ref = None
        for arm in arms:
            S.ensure_parallelism = ARMS[arm]
            try:
                h = content_hash(qs[name](spark, sf_dir))
            finally:
                S.ensure_parallelism = orig_ep
            if ref is None:
                ref = h
            parity.setdefault(name, {})[arm] = h == ref
    print("parity:", json.dumps(parity))

    probes = [hostprobe.probe()] if PROBING else []
    bw = [hostprobe.probe_mt()] if PROBING else []
    times: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in arms} for n, arms in TARGETS.items()}
    for _ in range(ROUNDS):
        for name, arms in TARGETS.items():
            for arm in arms:
                S.ensure_parallelism = ARMS[arm]
                try:
                    times[name][arm].append(timed(name))
                finally:
                    S.ensure_parallelism = orig_ep
        if PROBING:
            probes.append(hostprobe.probe())
            bw.append(hostprobe.probe_mt())

    # Stage attribution for the minhash extremes: one fresh run per
    # arm, stage rows diffed against the pre-run stage list.
    stage_prof: dict[str, list[dict]] = {}
    for arm in ("w32", "w8"):
        S.ensure_parallelism = ARMS[arm]
        try:
            seen = {s["stageId"] for s in _stages(app_id)}
            spark.catalog.clearCache()
            run("dedup_minhash_lsh")
            new = [s for s in _stages(app_id) if s["stageId"] not in seen]
        finally:
            S.ensure_parallelism = orig_ep
        stage_prof[arm] = [
            {k: s.get(k) for k in (
                "stageId", "numTasks", "executorRunTime",
                "executorDeserializeTime", "schedulerDelay" if
                "schedulerDelay" in s else "status",
                "shuffleReadBytes", "shuffleWriteBytes",
                "inputBytes", "submissionTime", "completionTime",
                "firstTaskLaunchedTime", "name")}
            for s in sorted(new, key=lambda s: s["stageId"])]

    out = {
        "sf_dir": sf_dir, "reps": REPS, "rounds": ROUNDS,
        "times": times,
        "min": {n: {a: min(ts) for a, ts in arms.items()}
                for n, arms in times.items()},
        "parity": parity,
        "stage_profile_minhash": stage_prof,
        "probe_sec": probes, "probe_bw_sec": bw,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min"], indent=1))


if __name__ == "__main__":
    main()
