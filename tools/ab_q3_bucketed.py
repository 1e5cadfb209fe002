"""Bucketed-layout A/B for Q3's dominant stage (r8 verdict order 2).

The sf10 decomposition (tools/decompose_r8.py) shows the eager Q3
form's cost is the lineitem orderkey aggregate: partial-agg + the
orderkey EXCHANGE is ~70% of the full query.  At 100 TB the exchange
is the part that grows with the fact; the standing lakehouse answer is
layout, not plan: bucket the fact on the aggregate/join key at write
time (sources/writers.write_bucketed) and the exchange disappears --
Catalyst sees the bucket spec's HashPartitioning and runs the
aggregate bucket-local.

This tool writes a one-time bucketed copy of the tier's lineitem
(bucketBy l_orderkey, 32 buckets), re-expresses the SAME eager plan
over it, asserts the bucketed plan contains NO exchange below the
aggregate, and interleaves timed runs against the shipped parquet
plan.

Usage: python tools/ab_q3_bucketed.py [tier]   (default sf10)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from tools import hostprobe  # noqa: E402


def eager_q3_over(spark, lineitem, sf_dir):
    """order_shipping_priority's exact eager plan with an injected
    lineitem relation (mirrors plans/corpus_starjoin.py)."""
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.plans.corpus_starjoin import (
        Q3_CUTOFF,
        Q3_SEGMENT,
    )
    from location_summary_etl_spark.session import broadcast_if_small
    from location_summary_etl_spark.sources.registry import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp_ntz")
    cust_ord = (
        customer.filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
        .join(orders.filter(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("c_custkey") == F.col("o_custkey")))
    lin_rev = (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
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


def timed(spark, fn) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from location_summary_etl_spark.session import get_session
    from location_summary_etl_spark.sources.registry import load_table
    from location_summary_etl_spark.sources.writers import write_bucketed

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    d = os.path.join(HERE, "bench_tiers", tier)
    spark = get_session(app_name="ab-q3-bucketed")
    spark.range(1).write.format("noop").mode("overwrite").save()

    table = f"li_bkt_{tier.replace('.', '_')}"
    path = os.path.join("/tmp", f"q3_bucketed_{tier}", "lineitem")
    if not spark.catalog.tableExists(table):
        print(f"writing bucketed lineitem -> {table} ...", flush=True)
        write_bucketed(load_table(spark, d, "lineitem"), table, path,
                       bucket_by="l_orderkey", n_buckets=32)

    bucketed = lambda: eager_q3_over(spark, spark.table(table), d)  # noqa
    plain = lambda: eager_q3_over(                                  # noqa
        spark, load_table(spark, d, "lineitem"), d)

    # plan assertion: the bucketed aggregate must run WITHOUT an
    # exchange under it (the whole point of the layout)
    pb = bucketed()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in pb, (
        "bucketed lineitem still exchanges on l_orderkey:\n" + pb)
    pp = plain()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" in pp, (
        "plain plan no longer exchanges -- baseline changed?")
    print(f"exchanges: bucketed={pb.count('Exchange ')} "
          f"plain={pp.count('Exchange ')}", flush=True)

    # results identical
    a = sorted(map(str, bucketed().collect()))
    b = sorted(map(str, plain().collect()))
    assert a == b, "bucketed plan changed the result"
    print(f"results identical ({len(a)} rows)", flush=True)

    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)
    timed(spark, plain); timed(spark, bucketed)  # warm
    tp, tb = [], []
    for _ in range(4):
        tp.append(timed(spark, plain))
        tb.append(timed(spark, bucketed))
    print(f"{tier}: plain-parquet min {min(tp):.3f}s {sorted(tp)} | "
          f"bucketed min {min(tb):.3f}s {sorted(tb)} | "
          f"probe={hostprobe.probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
