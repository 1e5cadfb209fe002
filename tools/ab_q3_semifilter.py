"""Q3 third-form A/B (r8): eager aggregate with a broadcast SEMI-JOIN
FILTER pushed below it.

The sf10 decomposition (tools/decompose_r8.py) shows the eager form's
cost is the lineitem orderkey aggregate (scan+partial+exchange+final =
1.6-2.0 s of the 2.8 s query), and the r7 docstring already names the
waste: the pre-aggregate covers EVERY open-window order, while the
customer segment filter later keeps only ~segment-fraction of them.
Spark's runtime bloom filter (enabled in this session) does NOT inject
here -- the aggregate between the scan and the join blocks
InjectRuntimeFilter -- so this tool measures doing it by hand: semi-join
lineitem against the (broadcast) open-order KEYS before aggregating,
cutting the aggregate's input and the exchange by the join's
selectivity.  Results are identical by construction (the final join
re-applies the same key set).

Usage: python tools/ab_q3_semifilter.py [tiers...]   (default sf1 sf10)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from tools import hostprobe  # noqa: E402


def q3_semi_eager(spark, sf_dir):
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.plans.corpus_starjoin import (
        Q3_CUTOFF,
        Q3_SEGMENT,
    )
    from location_summary_etl_spark.session import broadcast_if_small
    from location_summary_etl_spark.sources.registry import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp_ntz")
    cust_ord = (
        customer.filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
        .join(orders.filter(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("c_custkey") == F.col("o_custkey")))
    okeys = F.broadcast(cust_ord.select("o_orderkey"))
    lin_rev = (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(okeys, F.col("l_orderkey") == F.col("o_orderkey"),
              "left_semi")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice")
                   * (1 - F.col("l_discount"))).alias("_rev")))
    return (
        lin_rev.join(broadcast_if_small(cust_ord),
                     F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_orderkey", "o_orderdate",
                round_portable(F.col("_rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def timed(spark, fn, d) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from location_summary_etl_spark.plans.corpus_starjoin import (
        order_shipping_priority,
    )
    from location_summary_etl_spark.session import get_session

    tiers = sys.argv[1:] or ["sf1", "sf10"]
    spark = get_session(app_name="ab-q3-semi")
    spark.range(1).write.format("noop").mode("overwrite").save()

    sf01 = os.path.join(HERE, "bench_tiers", "sf0.1")
    a = sorted(map(str, q3_semi_eager(spark, sf01).collect()))
    b = sorted(map(str, order_shipping_priority(spark, sf01).collect()))
    assert a == b, "semi form changed the result"
    print(f"sf0.1 results identical ({len(a)} rows)", flush=True)

    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)
    for tier in tiers:
        d = os.path.join(HERE, "bench_tiers", tier)
        timed(spark, order_shipping_priority, d)
        timed(spark, q3_semi_eager, d)
        te, ts = [], []
        for _ in range(4):
            te.append(timed(spark, order_shipping_priority, d))
            ts.append(timed(spark, q3_semi_eager, d))
        print(f"{tier}: eager min {min(te):.3f}s {sorted(te)} | "
              f"semi-eager min {min(ts):.3f}s {sorted(ts)} | "
              f"probe={hostprobe.probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
