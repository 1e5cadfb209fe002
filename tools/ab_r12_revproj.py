"""r12 A/B: pre-project the Q3/Q5 revenue product (change-#6 class).

``_revenue_units()`` inlines fixed_units(price*(1-disc), 4) into the
aggregate: the product evaluates twice per aggregated row (value +
SIGNUM half-up term).  Variant B projects the product once below the
aggregate (same association, bit-identical doubles).  Q1's 3x case
won -12% (change #6); these are 2x on smaller aggregate inputs, so
this probe decides adopt-vs-document.

Usage: python tools/ab_r12_revproj.py
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
        fixed_units,
        round_portable,
    )
    from location_summary_etl_spark.plans.corpus_starjoin import (
        Q3_CUTOFF,
        Q3_SEGMENT,
        _revenue,
    )
    from location_summary_etl_spark.session import (
        broadcast_if_small,
        demote_guarded_window_warnings,
        ensure_parallelism,
        get_session,
    )
    from location_summary_etl_spark.sources.registry import load_table
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_revproj")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    def units_of(col):
        return fixed_units(col, 4).cast("decimal(38,0)")

    def q3_projected(spark_, sf_):
        customer = load_table(spark_, sf_, "customer")
        orders = load_table(spark_, sf_, "orders")
        lineitem = ensure_parallelism(
            load_table(spark_, sf_, "lineitem"), by="l_orderkey")
        cutoff = F.lit(Q3_CUTOFF).cast("timestamp_ntz")
        cust_ord = (
            customer.filter(F.col("c_mktsegment") == Q3_SEGMENT)
            .select("c_custkey")
            .join(
                orders.filter(F.col("o_orderdate") < cutoff)
                .select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
        )
        lin_rev = (
            lineitem.filter(F.col("l_shipdate") > cutoff)
            .select("l_orderkey", _revenue().alias("_r"))
            .groupBy("l_orderkey")
            .agg(F.sum(units_of(F.col("_r"))).alias("_rev"))
        )
        return (
            lin_rev.join(
                broadcast_if_small(cust_ord),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(
                "l_orderkey", "o_orderdate",
                round_portable(F.col("_rev") / F.lit(10000.0), 2)
                .alias("revenue"),
            )
            .orderBy(F.col("revenue").desc(), "l_orderkey")
            .limit(10)
        )

    pairs = {"order_shipping_priority": (qs["order_shipping_priority"],
                                         q3_projected)}

    def xor_hash(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    for name, (a, b) in pairs.items():
        ha, hb = xor_hash(a(spark, SF_DIR)), xor_hash(b(spark, SF_DIR))
        print("parity", name, ha == hb, ha, hb, flush=True)
        assert ha == hb, name

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

    times = {n: {"A": [], "B": []} for n in pairs}
    for _ in range(ROUNDS):
        for name, (a, b) in pairs.items():
            times[name]["A"].append(timed(a))
            times[name]["B"].append(timed(b))
            print("round", name, times[name], flush=True)
    out = {"times": times,
           "min": {n: {v: min(ts) for v, ts in d.items()}
                   for n, d in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out))
    with open("/tmp/AB_R12_REVPROJ.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
