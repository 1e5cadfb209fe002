"""Interleaved A/B for the r8 minmax_score form gate: single-lineage
window form vs broadcast-bounds form on bare file scans of increasing
size -- the measurement behind normalize._WINDOW_SOURCE_FRACTION.

The window form funnels every row into one task; the broadcast form
evaluates the lineage twice but stays distributed.  The crossover is
where single-task processing of N rows overtakes a second distributed
scan -- bounded above by guarded_unpartitioned's 100k-row in-plan
tripwire, which is why the gate is a safety fraction of the broadcast
cap rather than a tuned optimum.

Usage: python tools/ab_minmax_auto.py
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools import hostprobe  # noqa: E402


def timed(spark, df) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from location_summary_etl_spark.operators.normalize import (
        minmax_score,
        minmax_score_window,
    )
    from location_summary_etl_spark.session import source_bytes
    from location_summary_etl_spark.sources.registry import load_table

    from location_summary_etl_spark.session import get_session

    spark = get_session(app_name="ab-minmax-auto")
    spark.range(1).write.format("noop").mode("overwrite").save()
    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)

    cases = [
        # sf0.001 has no bench_tiers rewrite; the driver-written layout
        # is fine for an intra-size form A/B
        ("customer@sf0.001", "/root/testdata/sf0.001", "customer",
         "c_acctbal"),
        ("customer@sf0.01", os.path.join(HERE, "bench_tiers", "sf0.01"),
         "customer", "c_acctbal"),
        ("customer@sf0.1", os.path.join(HERE, "bench_tiers", "sf0.1"),
         "customer", "c_acctbal"),
        ("orders@sf0.01", os.path.join(HERE, "bench_tiers", "sf0.01"),
         "orders", "o_totalprice"),
        # orders@sf0.1 = ~150k rows: the window form's in-plan guard
        # trips there BY DESIGN -- that row count is the hard upper
        # bound on the window form, so the bytes gate must flip first.
    ]
    for name, d, table, col in cases:
        df = load_table(spark, d, table)
        w = lambda: minmax_score_window(df, col, "s")  # noqa: E731
        b = lambda: minmax_score(df, col, "s")         # noqa: E731
        timed(spark, w()); timed(spark, b())
        tw, tb = [], []
        for _ in range(3):
            tw.append(timed(spark, w()))
            tb.append(timed(spark, b()))
        print(f"{name}: bytes={source_bytes(df)} "
              f"window min {min(tw):.3f}s {sorted(tw)} | "
              f"broadcast min {min(tb):.3f}s {sorted(tb)} | "
              f"probe={hostprobe.probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
