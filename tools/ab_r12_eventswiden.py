"""r12 A/B tranche 5: pin the events window exchange at core width.

The minPartitionSize A/B (tools/ab_r12_minpart.py) showed the three
events window queries losing 18-42% to AQE small-shuffle coalescing
(their one ENSURE_REQUIREMENTS exchange carries ~2 MB, so
parallelism-first coalescing shrinks it to a couple of partitions and
the sort+window above it runs nearly serial), while the same conf
lowered globally REGRESSED the dedup family 14-28% -- so the fix must
be per-query, not a session conf.

The surgical form is the change-#4 trick: an explicit
``ensure_parallelism(by=<window key>)`` produces the SAME exchange in
the SAME position (hashpartitioning(user_id, n)), but tagged
REPARTITION_BY_NUM, which AQE coalescing must respect.  File-gated:
no-op at any tier where the scan is already wide.

  events_sessionization  widen events at load by user_id (window +
                         final groupBy both reuse it)
  events_state_runs      same
  events_asof            the window runs over a UNION (which erases
                         child partitioning), so the widening goes on
                         the unioned stream inside asof_join_backward

Usage: python tools/ab_r12_eventswiden.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import Column, Window
    from pyspark.sql import functions as F

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.operators.windows import epoch_seconds
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        ensure_parallelism,
        get_session,
    )
    from location_summary_etl_spark.sources import registry
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_eventswiden")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    def memo_key(name):
        return (id(spark), spark.sparkContext.applicationId, SF_DIR, name)

    def load_widened(spark_, sf_):
        return ensure_parallelism(
            registry.load_table(spark_, sf_, "events"), by="user_id")

    def via_widened_load(qname):
        def b(spark_, sf_):
            k = memo_key("events")
            saved = registry._LOAD_MEMO.get(k)
            registry._LOAD_MEMO[k] = load_widened(spark_, sf_)
            try:
                return qs[qname](spark_, sf_)
            finally:
                if saved is None:
                    registry._LOAD_MEMO.pop(k, None)
                else:
                    registry._LOAD_MEMO[k] = saved
        return b

    # asof replica with the widening on the unioned stream (the one
    # structural line that differs from operators/asof.py).
    def asof_widened(spark_, sf_):
        ev = registry.load_table(spark_, sf_, "events")
        probe = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts")
        base = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("ts").alias("click_ts"))
        keys, probe_ts, base_ts, base_val, out_col = (
            ["user_id"], "ts", "ts", "click_ts", "last_click_ts")
        val_type = base.schema[base_val].dataType
        p = probe.select(
            *probe.columns,
            F.col(probe_ts).alias("__t"),
            F.lit(None).cast(val_type).alias("__v"),
            F.lit(1).alias("__p"),
        )
        b = base.select(
            *keys,
            F.col(base_ts).alias("__t"),
            F.col(base_val).alias("__v"),
            F.lit(0).alias("__p"),
        )
        for c in probe.columns:
            if c not in keys:
                b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
        u = p.unionByName(b.select(*p.columns))
        u = ensure_parallelism(u, by=keys[0])          # <-- the change
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
        "events_sessionization": (qs["events_sessionization"],
                                  via_widened_load("events_sessionization")),
        "events_state_runs": (qs["events_state_runs"],
                              via_widened_load("events_state_runs")),
        "events_asof_purchase_click": (qs["events_asof_purchase_click"],
                                       asof_widened),
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
    print(json.dumps(out, indent=1))
    with open("/tmp/AB_R12_EVENTSWIDEN.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
