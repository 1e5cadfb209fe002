"""r12 A/B tranche 3: widen the serial fact-table scan stage.

Every sf0.1 table is ONE parquet file with ONE row group, so a scan
stage's work -- decode + filter + broadcast-join probes + PARTIAL
AGGREGATION -- runs on ONE core no matter how many cores the session
has (a parquet split cannot subdivide a row group).  Queries whose
plans carry real work in the scan stage (partial aggregates, the
terminal map of a no-shuffle query, broadcast-join chains) therefore
serialize their dominant cost at bench scale.

Variant B widens the fact scan with ``ensure_parallelism(df, by=key)``
(the r12 hash-partition form): one tiny shuffle of the raw scan output
buys full-width execution of everything downstream, and when ``key``
matches the downstream aggregate/join key the widening exchange
REPLACES the exchange the aggregate would have needed (EnsureRequirements
sees the distribution already satisfied).  At production scale
ensure_parallelism is gated off on file metadata (est >= cores), so
the plan is untouched exactly where inputs are already wide.

Per-query widen maps pick the downstream-reusable key where one exists:

  pricing_summary                lineitem/l_orderkey   (agg keys are 2 low-card cols; any spread key)
  lineitem_derived_columns       lineitem/l_orderkey   (terminal map)
  order_shipping_priority        lineitem/l_orderkey   (partial agg by orderkey reuses)
  region_local_supplier_volume   lineitem/l_orderkey   (3 BHJs + agg all in scan stage)
  part_small_quantity_revenue    lineitem/l_partkey    (per-part avg agg + partkey join reuse)
  flagship_nation_summary        orders/o_custkey      (argmax agg by custkey reuses)
  customer_order_recency         orders/o_custkey      (agg by custkey reuses)
  latest_order_per_customer      orders/o_custkey      (agg by custkey reuses)
  customer_order_count_distribution orders/o_custkey   (agg by custkey reuses)
  region_nation_rollup           orders/o_orderkey     (agg keys low-card; spread key)
  orders_price_banded_compiled   orders/o_orderkey     (agg key low-card; spread key)
  events_tumbling_10min          events/event_id       (agg key is window(ts); spread key)

Usage: python tools/ab_r12_scanwiden.py [case ...]
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

CASES = {
    "pricing_summary": {"lineitem": "l_orderkey"},
    "lineitem_derived_columns": {"lineitem": "l_orderkey"},
    "order_shipping_priority": {"lineitem": "l_orderkey"},
    "region_local_supplier_volume": {"lineitem": "l_orderkey"},
    "part_small_quantity_revenue": {"lineitem": "l_partkey"},
    "flagship_nation_summary": {"orders": "o_custkey"},
    "customer_order_recency": {"orders": "o_custkey"},
    "latest_order_per_customer": {"orders": "o_custkey"},
    "customer_order_count_distribution": {"orders": "o_custkey"},
    "region_nation_rollup": {"orders": "o_orderkey"},
    "orders_price_banded_compiled": {"orders": "o_orderkey"},
    "events_tumbling_10min": {"events": "event_id"},
}


def main() -> None:
    only = sys.argv[1:]
    cases = {k: v for k, v in CASES.items() if not only or k in only}

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        ensure_parallelism,
        get_session,
    )
    from location_summary_etl_spark.sources import registry
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_scanwiden")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    def memo_key(name: str):
        return (id(spark), spark.sparkContext.applicationId, SF_DIR, name)

    def widened(qname: str):
        """Variant B: seed the registry load-memo with widened tables
        while the query's DataFrame is BUILT (plan-time patch; the
        memo entry is restored before anything is executed)."""
        widen = cases[qname]

        def b(spark_, sf_):
            saved = {}
            for t, key in widen.items():
                k = memo_key(t)
                saved[k] = registry._LOAD_MEMO.get(k)
                base = registry.load_table(spark_, sf_, t)
                registry._LOAD_MEMO[k] = ensure_parallelism(base, by=key)
            try:
                return qs[qname](spark_, sf_)
            finally:
                for k, v in saved.items():
                    if v is None:
                        registry._LOAD_MEMO.pop(k, None)
                    else:
                        registry._LOAD_MEMO[k] = v
        return b

    def xor_hash(df):
        from pyspark.sql import functions as F
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    pairs = {n: (qs[n], widened(n)) for n in cases}

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
    with open("/tmp/AB_R12_SCANWIDEN.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
