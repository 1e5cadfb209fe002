"""Identify the residual variance source for the two queries that
stay spread-tagged inside fully-quiet bench windows (r10 VERDICT #6:
``region_nation_rollup``, ``text_fingerprints``).

Both probe classes (arithmetic steal, aggregate bandwidth) certify
the window quiet, yet these two queries' per-pass minima disagree by
>1.25x across steady passes.  The remaining candidate sources are all
INSIDE the JVM or the page cache, invisible to a host probe:

  1. GC pressure        -- a major/mixed collection landing on a rep;
  2. codegen-cache      -- the generated-class or janino cache evicts
     eviction              between passes (the full 28-query list runs
                           in between), so a "warm" rep recompiles;
  3. page-cache /       -- the pass in between evicts the query's
     shuffle-file          parquet pages, so a rep re-reads from disk.

Each is directly observable from the driver JVM, so instead of
guessing we stamp every timed rep with deltas of:

  * GC count/time, per collector bean (java.lang.management);
  * janino compilations + generated-bytecode bytes
    (org.apache.spark.metrics.source.CodegenMetrics -- increments ONLY
    on a real compile, i.e. a cache miss);
  * JIT total compilation time (CompilationMXBean);
  * the JVM process's /proc/<pid>/io read_bytes (actual disk reads --
    a page-cache hit costs zero here).

Two phases, both under the full two-class probe gate:

  Phase A (isolation): warm + N timed reps of each target in a tight
  loop.  If the tight loop is stable, in-place repetition is not the
  problem and the variance lives in the inter-pass context.

  Phase B (bench reproduction): bench-shaped passes over the FULL
  headline list, instrumenting only the targets' timed reps.  Slow
  cells are then attributed by which signal moved with them.

Usage:
    python tools/ab_variance.py [sf_dir] [out_json]
defaults: /root/testdata/sf0.1, AB_VARIANCE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

TARGETS = ["region_nation_rollup", "text_fingerprints"]
CONTROL = "pricing_summary"  # never spread-tagged r6-r10
# env overrides so a smoke run (noisy host, tiny sf) can exercise the
# code paths without the full measurement protocol
ISO_REPS = int(os.environ.get("SPARK_GRAFT_AB_ISO_REPS", "12"))
BENCH_PASSES = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "6"))
PROBING = os.environ.get("SPARK_GRAFT_AB_PROBE", "1") != "0"


class JvmCounters:
    """Snapshot/delta reader for the four in-JVM signal classes."""

    def __init__(self, spark):
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        self._gc_beans = mf.getGarbageCollectorMXBeans()
        self._jit = mf.getCompilationMXBean()
        cls = jvm.java.lang.Class.forName(
            "org.apache.spark.metrics.source.CodegenMetrics$")
        cg = cls.getField("MODULE$").get(None)
        self._compile_hist = cg.METRIC_COMPILATION_TIME()
        self._bytecode_hist = cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE()
        # /proc/<pid>/io of the JVM (pid@host from the runtime bean)
        pid = mf.getRuntimeMXBean().getName().split("@")[0]
        self._io_path = f"/proc/{pid}/io"

    def _read_bytes(self) -> int:
        try:
            with open(self._io_path) as f:
                for line in f:
                    if line.startswith("read_bytes:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return -1

    def snap(self) -> dict:
        s = {"jit_ms": self._jit.getTotalCompilationTime(),
             "n_compiled": self._compile_hist.getCount(),
             "bytecode": self._bytecode_hist.getCount(),
             "read_bytes": self._read_bytes()}
        for i in range(self._gc_beans.size()):
            b = self._gc_beans.get(i)
            key = b.getName().replace(" ", "_").lower()
            s[f"gc_{key}_n"] = b.getCollectionCount()
            s[f"gc_{key}_ms"] = b.getCollectionTime()
        return s

    @staticmethod
    def delta(before: dict, after: dict) -> dict:
        return {k: after[k] - before[k] for k in before}


def timed_rep(spark, counters, fn) -> dict:
    spark.catalog.clearCache()
    before = counters.snap()
    t0 = time.perf_counter()
    fn()
    sec = time.perf_counter() - t0
    d = counters.delta(before, counters.snap())
    d["sec"] = round(sec, 4)
    return d


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _ROOT, "AB_VARIANCE.json")

    import __spark_entry__ as contract
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings, get_session)
    from tools import hostprobe

    probes, bw_probes = (hostprobe.wait_quiet_all() if PROBING
                         else ([-1.0], [-1.0]))
    spark = get_session(app_name="ab_variance")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    counters = JvmCounters(spark)

    def run(name):
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()

    # session warm-up through the full stack
    run(CONTROL)

    out = {"sf_dir": sf_dir, "startup_probe": probes[-1],
           "startup_bw": bw_probes[-1], "phase_a": {}, "phase_b": []}

    # ---- Phase A: tight-loop isolation --------------------------------
    for name in TARGETS + [CONTROL]:
        run(name)  # warm (codegen + JIT for exactly this plan)
        reps = [timed_rep(spark, counters, lambda: run(name))
                for _ in range(ISO_REPS)]
        out["phase_a"][name] = reps
        secs = [r["sec"] for r in reps]
        print(f"[A] {name}: min {min(secs):.3f} max {max(secs):.3f} "
              f"spread {max(secs) / min(secs):.2f}", flush=True)

    # ---- Phase B: bench-shaped passes, instrumented targets -----------
    names = [n for n in __import__("bench").HEADLINE if n in qs]
    for p in range(BENCH_PASSES):
        stamp0, bw0 = ((hostprobe.probe(), hostprobe.probe_mt())
                       if PROBING else (-1.0, -1.0))
        cells = {}
        for name in names:
            spark.catalog.clearCache()
            run(name)  # per-query warm, same as bench
            best = None
            for _ in range(2):
                r = timed_rep(spark, counters, lambda: run(name))
                if best is None or r["sec"] < best["sec"]:
                    best = r
            if name in TARGETS or name == CONTROL:
                cells[name] = best
        stamp1, bw1 = ((hostprobe.probe(), hostprobe.probe_mt())
                       if PROBING else (-1.0, -1.0))
        out["phase_b"].append({"probes": [stamp0, stamp1],
                               "bw": [bw0, bw1], "cells": cells})
        msg = " ".join(f"{n}={c['sec']:.3f}" for n, c in cells.items())
        print(f"[B] pass {p}: {msg} (probe {stamp0:.2f}/{stamp1:.2f} "
              f"bw {bw0:.2f}/{bw1:.2f})", flush=True)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)

    # ---- attribution summary ------------------------------------------
    print("\n== attribution ==")
    for name in TARGETS + [CONTROL]:
        cells = [(p["cells"][name], min(p["probes"]), p["bw"])
                 for p in out["phase_b"] if name in p["cells"]]
        secs = [c["sec"] for c, _, _ in cells]
        lo = min(secs)
        print(f"{name}: pass mins {['%.3f' % s for s in secs]} "
              f"spread {max(secs) / lo:.2f}")
        for c, _, _ in cells:
            flags = []
            if c["sec"] > 1.25 * lo:
                if c["n_compiled"]:
                    flags.append(f"compiled={c['n_compiled']}")
                gms = sum(v for k, v in c.items()
                          if k.startswith("gc_") and k.endswith("_ms"))
                if gms > 0.2 * c["sec"] * 1000:
                    flags.append(f"gc_ms={gms}")
                if c["read_bytes"] > 1 << 24:
                    flags.append(f"read_mb={c['read_bytes'] >> 20}")
                print(f"  SLOW {c['sec']:.3f}s: "
                      f"{', '.join(flags) or 'no signal moved'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
