"""Round-8 sf10 residue decompositions (verdict orders 1, 2, 6).

For each of the three queries still >2x DuckDB at the deep tier, time
the query's STAGES cumulatively (bare scan -> +exchange -> +sort/agg ->
full plan) interleaved in one session, min-of-N per component, probe-
gated (tools/hostprobe.py).  If the last increment before "full" is
within noise of "full", the residue is the named stage's JVM throughput
-- a floor, not a removable plan stage.  Alternative plan shapes are
timed alongside so a win can be wired instead of proven impossible.

Components per target:

flagship  (window-form argmax residue, BENCH_CROSSOVER sf10 5.91x)
  scan            orders (custkey, orderdate, totalprice) bare scan
  scan_exchange   + hash repartition on o_custkey
  scan_exch_sort  + sortWithinPartitions (what WindowExec pays)
  argmax_window   latest_snapshot_window only (no downstream joins)
  argmax_shjreuse CANDIDATE: reused-exchange hash-agg argmax -- maxes
                  and probe share ONE shuffled child (ReusedExchange),
                  join needs no new exchange, AQE converts SMJ->SHJ,
                  so the 15M-row window SORT disappears
  full_window     flagship_nation_summary(use_window=True)
  full_shjreuse   flagship with the candidate argmax spliced in

q3        (eager-agg residue, sf10 6.39x)
  li_scan         filtered lineitem scan (shipdate > cutoff, 3 cols)
  li_agg          + groupBy(l_orderkey).sum -- the orderkey exchange
                  plus partial/final agg (the rewrite's big stage)
  cust_ord        the customer x orders build side alone
  full            order_shipping_priority

rollup    (flat-time 12.2x, verdict wants the formal proof)
  scan            customer (c_nationkey, c_acctbal) bare scan
  joins           + broadcast nation + region joins
  base_agg        + (r_name, n_name) hash aggregate
  full            region_nation_rollup (adds Expand over 130 rows)

Usage: python tools/decompose_r8.py [flagship|q3|rollup|all] [tier]
(default: all sf10; CROSSOVER_REPEATS-style env DECOMP_REPEATS, min-of,
default 3).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from tools import hostprobe  # noqa: E402

REPEATS = int(os.environ.get("DECOMP_REPEATS", "3"))


def _run(spark, df) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _measure(spark, components: dict) -> dict:
    """One warm pass, then REPEATS interleaved passes, min per name."""
    for fn in components.values():
        _run(spark, fn())
    best = {n: float("inf") for n in components}
    for _ in range(REPEATS):
        for n, fn in components.items():
            best[n] = min(best[n], _run(spark, fn()))
    return {n: round(t, 3) for n, t in best.items()}


def _argmax_shjreuse(orders):
    """Sort-free argmax candidate: one exchange, shared by the max
    aggregate and the join probe (ReusedExchange), hash join back."""
    o = orders.select("o_custkey", "o_orderdate", "o_totalprice"
                      ).repartition("o_custkey")
    mx = o.groupBy("o_custkey").agg(F.max("o_orderdate").alias("__mx"))
    return (o.join(mx, "o_custkey")
            .filter(F.col("o_orderdate") == F.col("__mx")).drop("__mx"))


def _flagship_with_argmax(spark, sf_dir, latest):
    """flagship_nation_summary's tail with an injected argmax relation
    (mirrors plans/flagship.py downstream of the argmax)."""
    from pyspark.sql import Window

    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.operators.normalize import (
        minmax_score_window,
    )
    from location_summary_etl_spark.operators.windows import (
        guarded_unpartitioned,
    )
    from location_summary_etl_spark.sources.registry import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    per_nation = (
        latest.join(customer,
                    latest["o_custkey"] == customer["c_custkey"], "inner")
        .groupBy("c_nationkey")
        .agg(F.avg("o_totalprice").alias("avg_order_total"),
             F.count("*").alias("order_count"),
             F.max(F.col("o_orderdate").cast("date")).alias("_max_odate"))
    )
    bal = customer.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("avg_acctbal"))
    scored = minmax_score_window(
        per_nation, "avg_order_total", "price_score"
    ).withColumn(
        "snapshot_date",
        guarded_unpartitioned(
            F.max("_max_odate").over(Window.partitionBy()), "decomp"),
    ).drop("_max_odate")
    return (
        scored.join(bal, "c_nationkey", "inner")
        .join(F.broadcast(nation),
              scored["c_nationkey"] == nation["n_nationkey"], "inner")
        .join(F.broadcast(region),
              nation["n_regionkey"] == region["r_regionkey"], "inner")
        .withColumn("avg_acctbal", round_portable("avg_acctbal", 2))
        .withColumn("avg_order_total", round_portable("avg_order_total", 2))
        .withColumn("price_score", round_portable("price_score", 2))
        .select("n_name", "r_name", "avg_acctbal", "avg_order_total",
                "order_count", "price_score", "snapshot_date")
    )


def decompose_flagship(spark, d):
    from location_summary_etl_spark.operators.snapshot import (
        latest_snapshot_window,
    )
    from location_summary_etl_spark.plans.flagship import (
        flagship_nation_summary,
    )
    from location_summary_etl_spark.sources.registry import load_table

    def orders():
        return load_table(spark, d, "orders")

    def scan():
        return orders().select("o_custkey", "o_orderdate", "o_totalprice")

    return _measure(spark, {
        "scan": scan,
        "scan_exchange": lambda: scan().repartition("o_custkey"),
        "scan_exch_sort": lambda: scan().repartition("o_custkey")
        .sortWithinPartitions("o_custkey"),
        "argmax_window": lambda: latest_snapshot_window(
            scan(), ["o_custkey"], "o_orderdate"),
        "argmax_shjreuse": lambda: _argmax_shjreuse(orders()),
        "full_window": lambda: flagship_nation_summary(
            spark, d, use_window=True),
        "full_shjreuse": lambda: _flagship_with_argmax(
            spark, d, _argmax_shjreuse(orders())),
    })


def decompose_q3(spark, d):
    from location_summary_etl_spark.plans.corpus_starjoin import (
        Q3_CUTOFF,
        Q3_SEGMENT,
        order_shipping_priority,
    )
    from location_summary_etl_spark.session import broadcast_if_small
    from location_summary_etl_spark.sources.registry import load_table

    cutoff = F.lit(Q3_CUTOFF).cast("timestamp_ntz")

    def li_scan():
        return (load_table(spark, d, "lineitem")
                .filter(F.col("l_shipdate") > cutoff)
                .select("l_orderkey", "l_extendedprice", "l_discount"))

    def li_agg():
        return li_scan().groupBy("l_orderkey").agg(
            F.sum(F.col("l_extendedprice")
                  * (1 - F.col("l_discount"))).alias("_rev"))

    def cust_ord():
        customer = load_table(spark, d, "customer")
        orders = load_table(spark, d, "orders")
        return (
            customer.filter(F.col("c_mktsegment") == Q3_SEGMENT)
            .select("c_custkey")
            .join(orders.filter(F.col("o_orderdate") < cutoff)
                  .select("o_orderkey", "o_custkey", "o_orderdate"),
                  F.col("c_custkey") == F.col("o_custkey")))

    def join_no_topk():
        return li_agg().join(broadcast_if_small(cust_ord()),
                             F.col("o_orderkey") == F.col("l_orderkey"))

    return _measure(spark, {
        "li_scan": li_scan,
        "li_agg": li_agg,
        "cust_ord": cust_ord,
        "join_no_topk": join_no_topk,
        "full": lambda: order_shipping_priority(spark, d),
    })


def decompose_rollup(spark, d):
    from location_summary_etl_spark.plans.corpus_reference import (
        region_nation_rollup,
    )
    from location_summary_etl_spark.sources.registry import load_table

    def scan():
        return (load_table(spark, d, "customer")
                .select("c_nationkey", "c_acctbal"))

    def joins():
        customer = load_table(spark, d, "customer")
        nation = load_table(spark, d, "nation")
        region = load_table(spark, d, "region")
        return (customer
                .join(F.broadcast(nation),
                      customer["c_nationkey"] == nation["n_nationkey"])
                .join(F.broadcast(region),
                      nation["n_regionkey"] == region["r_regionkey"])
                .select("r_name", "n_name", "c_acctbal"))

    def base_agg():
        return joins().groupBy("r_name", "n_name").agg(
            F.count("*").alias("_n"), F.sum("c_acctbal").alias("_s"))

    return _measure(spark, {
        "scan": scan,
        "joins": joins,
        "base_agg": base_agg,
        "full": lambda: region_nation_rollup(spark, d),
    })


def main() -> None:
    from location_summary_etl_spark.session import get_session

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    tier = sys.argv[2] if len(sys.argv) > 2 else "sf10"
    d = os.path.join(HERE, "bench_tiers", tier)
    if not os.path.isdir(d):
        raise SystemExit(f"missing tier {d}")

    spark = get_session(app_name="decompose-r8")
    spark.range(1).write.format("noop").mode("overwrite").save()

    print("startup probes:", hostprobe.wait_quiet(attempts=20,
                                                  sleep_sec=110),
          flush=True)
    targets = {"flagship": decompose_flagship, "q3": decompose_q3,
               "rollup": decompose_rollup}
    names = list(targets) if which == "all" else [which]
    for n in names:
        p0 = hostprobe.probe()
        res = targets[n](spark, d)
        p1 = hostprobe.probe()
        print(f"{n} @ {tier}: {res}  probes=[{p0}, {p1}]", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
