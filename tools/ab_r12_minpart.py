"""r12 A/B tranche 4: AQE small-shuffle coalescing floor.

AQE's partition coalescing (parallelismFirst=true, the default) sizes
post-shuffle partitions at ``max(minPartitionSize, total/parallelism)``
with minPartitionSize defaulting to 1 MB -- so ANY exchange carrying
less than ~cores x 1 MB coalesces below core width, and the stage
above it (window functions, final aggregates, pair generation) runs
on a handful of cores at bench scale.  The latest_order_per_customer
A/B isolated exactly this: the ONLY plan diff of its -11% win was
ENSURE_REQUIREMENTS -> REPARTITION_BY_NUM on the same exchange, i.e.
"exempt from coalescing".

Variant B lowers ``spark.sql.adaptive.coalescePartitions
.minPartitionSize`` so the parallelism-first target keeps small
shuffles at full width.  Scale behavior: the floor only binds when a
shuffle's per-core share is below it, so at any real tier
(total/parallelism >= 1 MB) the coalescing decision is bit-identical
-- this is a small-input/wide-machine knob exactly like
ensure_parallelism's file gate, not a cluster tunable.

Usage: python tools/ab_r12_minpart.py [query ...]
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
B_SIZE = os.environ.get("SPARK_GRAFT_AB_MINPART", "64k")

CONF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"

# Headline queries whose plans carry ENSURE_REQUIREMENTS exchanges
# with sub-(cores x 1MB) payloads at sf0.1.
DEFAULT_QUERIES = [
    "events_sessionization",
    "events_state_runs",
    "events_asof_purchase_click",
    "events_funnel",
    "events_tumbling_10min",
    "user_value_ewma",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_contamination_check",
    "part_small_quantity_revenue",
    "order_shipping_priority",
    "pricing_summary",
    "flagship_nation_summary",
    "region_local_supplier_volume",
    "top_orders_per_nation",
    "region_nation_rollup",
    "customer_order_count_distribution",
    "customer_order_recency",
    "text_token_stats",
    "text_fingerprints",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_minpart")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)
    default_size = spark.conf.get(CONF)
    print("default", CONF, "=", default_size, "; B =", B_SIZE, flush=True)

    def xor_hash(df):
        from pyspark.sql import functions as F
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    # Parity: the conf only changes partition counts; the fixed-point
    # policy makes results partitioning-independent, but prove it.
    for name in names:
        spark.conf.set(CONF, default_size)
        ha = xor_hash(qs[name](spark, SF_DIR))
        spark.conf.set(CONF, B_SIZE)
        hb = xor_hash(qs[name](spark, SF_DIR))
        spark.conf.set(CONF, default_size)
        print("parity", name, ha == hb, ha, hb, flush=True)
        assert ha == hb, name

    def timed(name, size) -> float:
        spark.conf.set(CONF, size)
        fn = qs[name]
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
        spark.conf.set(CONF, default_size)
        return round(best, 3)

    times = {n: {"A": [], "B": []} for n in names}
    for _ in range(ROUNDS):
        for name in names:
            times[name]["A"].append(timed(name, default_size))
            times[name]["B"].append(timed(name, B_SIZE))
            print("round", name, times[name], flush=True)
    out = {"conf": CONF, "b_size": B_SIZE, "times": times,
           "min": {n: {v: min(ts) for v, ts in d.items()}
                   for n, d in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out, indent=1))
    with open("/tmp/AB_R12_MINPART.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
