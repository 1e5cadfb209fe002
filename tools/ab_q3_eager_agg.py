"""Interleaved A/B: Q3 aggregate-ABOVE-join baseline (the pre-rewrite
plan shape, inlined below) vs the shipped eager pre-aggregation form
(plans/corpus_starjoin.order_shipping_priority, which groups lineitem
by orderkey BELOW the fact-fact join).

Hypothesis: revenue groups exactly on the join key, so aggregating the
~4x-wider lineitem side before the fact-fact join cuts the orderkey
shuffle bytes and the join probe volume by the lineitems-per-order
factor.  Result sets are identical by construction (o_orderdate is
functionally dependent on l_orderkey through the join).

Measured (this tool, quiet-window runs, min-of-3 after warm):
sf1 eager 0.73 s vs above-join 0.88 s; sf10 5.70 vs 6.84 s (second
window 3.13 vs 3.73 s) -- eager -16..-17% at both tiers.

Usage: python tools/ab_q3_eager_agg.py [tiers...]   (default sf1 sf10)
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
from location_summary_etl_spark.session import get_session, broadcast_if_small
from location_summary_etl_spark.sources.registry import load_table
from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.plans.corpus_starjoin import (
    order_shipping_priority, Q3_CUTOFF, Q3_SEGMENT)


def q3_above_join(spark, sf_dir):
    """The pre-rewrite baseline: join first, aggregate revenue above."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
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
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            broadcast_if_small(cust_ord),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round_portable(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def run(spark, fn, sf_dir):
    spark.catalog.clearCache()
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    tiers = sys.argv[1:] or ["sf1", "sf10"]
    spark = get_session("ab-q3")
    # correctness first: identical result sets at sf0.1
    sf01 = os.path.join(HERE, "bench_tiers", "sf0.1")
    a = sorted(q3_above_join(spark, sf01).collect())
    b = sorted(order_shipping_priority(spark, sf01).collect())
    assert a == b, f"result mismatch:\n{a}\n{b}"
    print("sf0.1 result sets identical (10 rows)")
    for tier in tiers:
        d = os.path.join(HERE, "bench_tiers", tier)
        # warm both, then interleave 3 timed reps each
        run(spark, q3_above_join, d); run(spark, order_shipping_priority, d)
        base, eag = [], []
        for _ in range(3):
            base.append(run(spark, q3_above_join, d))
            eag.append(run(spark, order_shipping_priority, d))
        print(f"{tier}: above-join min {min(base):.3f}s {sorted(base)} | "
              f"eager min {min(eag):.3f}s {sorted(eag)}")
    spark.stop()


if __name__ == "__main__":
    main()
