"""r12 A/B: pricing_summary shared-subexpression projection.

The partial aggregate evaluates ``l_extendedprice * (1 - l_discount)``
three times (disc-price units, charge units, charge's SIGNUM) per row.
Whole-stage codegen CSE may or may not dedupe across aggregate
function children; variant B pre-projects ``_disc`` and ``_charge``
(same association order -- bit-identical doubles) so each evaluates
exactly once per row regardless.

Usage: python tools/ab_r12_q1proj.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "6"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.functions.scalars import (
        avg_fixed_point,
        sum_fixed_point,
    )
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from location_summary_etl_spark.sources.registry import load_table
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_q1proj")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    def q1_projected(spark_, sf_):
        li = load_table(spark_, sf_, "lineitem")
        cutoff = F.lit("1998-09-01").cast("timestamp_ntz")
        pre = (
            li.filter(F.col("l_shipdate") <= cutoff)
            .select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("_disc"),
            )
            .withColumn("_charge", F.col("_disc") * (1 + F.col("l_tax")))
            .drop("l_tax")
        )
        return pre.groupBy("l_returnflag", "l_linestatus").agg(
            sum_fixed_point("l_quantity", 0, 2).alias("sum_qty"),
            sum_fixed_point("l_extendedprice", 2, 2).alias("sum_base_price"),
            sum_fixed_point(F.col("_disc"), 4, 2).alias("sum_disc_price"),
            sum_fixed_point(F.col("_charge"), 6, 2).alias("sum_charge"),
            avg_fixed_point("l_quantity", 0, 4).alias("avg_qty"),
            avg_fixed_point("l_extendedprice", 2, 4).alias("avg_price"),
            avg_fixed_point("l_discount", 2, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )

    a = qs["pricing_summary"]

    def xor_hash(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    ha, hb = xor_hash(a(spark, SF_DIR)), xor_hash(q1_projected(spark, SF_DIR))
    print("parity", ha == hb, ha, hb, flush=True)
    assert ha == hb

    def timed(fn) -> float:
        spark.catalog.clearCache()
        _warm_until_jit_settles(
            lambda: fn(spark, SF_DIR).write.format("noop")
            .mode("overwrite").save(), jit)
        best = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    times = {"A": [], "B": []}
    for _ in range(ROUNDS):
        times["A"].append(timed(a))
        times["B"].append(timed(q1_projected))
        print("round", times, flush=True)
    out = {"times": times,
           "min": {v: min(ts) for v, ts in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out))
    with open("/tmp/AB_R12_Q1PROJ.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
