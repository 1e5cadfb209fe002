"""r12 tier check: the widening adoptions at the 10x (sf1) tier.

Reverse A/B: A = HEAD (ensure_parallelism widenings of changes #4/#5
baked in), B = the pre-change forms re-implemented inline.  Run at
bench_tiers/sf1 where the file gate's behavior differs per table --
lineitem (184 MB, 49 row groups) gates OFF (est>=cores), events
(21 MB) and orders (30 MB) still fire -- so this checks both that the
no-op side is really a no-op and that the still-firing side does not
regress when real row-group parallelism exists underneath.

Usage: python tools/ab_r12_sf1check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR",
                        os.path.join(_ROOT, "bench_tiers", "sf1"))


def main() -> None:
    from pyspark.sql import Column, Window
    from pyspark.sql import functions as F

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.operators.snapshot import (
        latest_snapshot_window,
    )
    from location_summary_etl_spark.operators.windows import (
        epoch_seconds,
        sessionize,
    )
    from location_summary_etl_spark.plans.corpus_starjoin import (
        Q3_CUTOFF,
        Q3_SEGMENT,
        _revenue_units,
    )
    from location_summary_etl_spark.session import (
        broadcast_if_small,
        demote_guarded_window_warnings,
        get_session,
    )
    from location_summary_etl_spark.sources.registry import load_table
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_sf1check")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    # ---- pre-change replicas (the forms before changes #4/#5) ----
    def q3_old(spark_, sf_):
        customer = load_table(spark_, sf_, "customer")
        orders = load_table(spark_, sf_, "orders")
        lineitem = load_table(spark_, sf_, "lineitem")
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
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .groupBy("l_orderkey")
            .agg(F.sum(_revenue_units()).alias("_rev"))
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

    def latest_old(spark_, sf_):
        orders = load_table(spark_, sf_, "orders")
        return latest_snapshot_window(
            orders, ["o_custkey"], "o_orderdate"
        ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    def sess_old(spark_, sf_):
        ev = sessionize(load_table(spark_, sf_, "events"),
                        "user_id", "ts", 1800)
        return ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.max("session_id") + 1).alias("n_sessions"),
        )

    def runs_old(spark_, sf_):
        ev = load_table(spark_, sf_, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        new_run = F.when(
            F.lag("event_type").over(w) == F.col("event_type"), 0
        ).otherwise(1)
        runs = ev.select(
            "user_id", "event_type", "ts",
            F.sum(new_run).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("grp"),
        )
        return (
            runs.groupBy("user_id", "event_type", "grp")
            .agg(
                F.count(F.lit(1)).alias("run_len"),
                F.min("ts").alias("run_start"),
                F.max("ts").alias("run_end"),
            )
            .drop("grp")
        )

    def asof_old(spark_, sf_):
        ev = load_table(spark_, sf_, "events")
        probe = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts")
        base = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("ts").alias("click_ts"))
        keys, base_val, out_col = ["user_id"], "click_ts", "last_click_ts"
        val_type = base.schema[base_val].dataType
        p = probe.select(
            *probe.columns,
            F.col("ts").alias("__t"),
            F.lit(None).cast(val_type).alias("__v"),
            F.lit(1).alias("__p"),
        )
        b = base.select(
            *keys,
            F.col("ts").alias("__t"),
            F.col(base_val).alias("__v"),
            F.lit(0).alias("__p"),
        )
        for c in probe.columns:
            if c not in keys:
                b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
        u = p.unionByName(b.select(*p.columns))
        order: list[Column] = [F.col("__t"), F.col("__p").asc()]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn(out_col, F.last("__v", ignorenulls=True).over(w))
        out = u.filter(F.col("__p") == 1).select(*probe.columns, out_col)
        gap = epoch_seconds("ts") - epoch_seconds("last_click_ts")
        return out.select(
            "event_id", "user_id", "ts", "last_click_ts",
            round_portable(gap, 3).alias("gap_seconds"),
        )

    pairs = {
        "order_shipping_priority": (qs["order_shipping_priority"], q3_old),
        "latest_order_per_customer": (qs["latest_order_per_customer"],
                                      latest_old),
        "events_sessionization": (qs["events_sessionization"], sess_old),
        "events_state_runs": (qs["events_state_runs"], runs_old),
        "events_asof_purchase_click": (qs["events_asof_purchase_click"],
                                       asof_old),
    }

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

    times = {n: {"HEAD": [], "OLD": []} for n in pairs}
    for _ in range(ROUNDS):
        for name, (a, b) in pairs.items():
            times[name]["HEAD"].append(timed(a))
            times[name]["OLD"].append(timed(b))
            print("round", name, times[name], flush=True)
    out = {"sf_dir": SF_DIR, "times": times,
           "min": {n: {v: min(ts) for v, ts in d.items()}
                   for n, d in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out, indent=1))
    with open("/tmp/AB_R12_SF1CHECK.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
