"""Second TPC-H sweep: the remaining classic query shapes (Q8, Q9,
Q14, Q21) adapted to the testdata star schema.

Adaptations forced by the schema (no ``partsupp`` table, no
``l_commitdate``/``l_receiptdate`` -- TESTDATA.md): Q9's supply cost
is proxied by ``p_retailprice``; Q21's "kept waiting" predicate is
``l_shipdate > o_orderdate + 90 days``.  Q2/Q20 need partsupp itself
and are out of scope for this dataset; their distinctive operator
content (correlated min subquery, nested IN chains) is covered by
part_small_quantity_revenue / part_brand_supplier_counts /
inactive_high_balance_segments.

Scale notes: every dimension rides a broadcast; the only wide
exchanges are lineitem |><| orders on orderkey and the final
aggregates, all partial-aggregated map-side.  Q21's double
existential (EXISTS another supplier / NOT EXISTS another LATE
supplier) is formulated as ONE per-order aggregate over the joined
lines -- the two correlated subqueries of the SQL form collapse into
array/count state per order, so the fact table is read once and
shuffled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    fixed_units,
    round_portable,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_units() -> F.Column:
    # exact scale-4 units of the discounted price (fixed-point policy,
    # functions/scalars.py): ratio numerators and denominators become
    # exact integer sums, so shares are identical doubles in both
    # engines.  Widened to DECIMAL(38,0) pre-sum: a long accumulator
    # at scale 4 overflows near 9.2e14 measure units (~sf 10^4, below
    # the 100 TB envelope) and ANSI Spark would raise where DuckDB
    # widens to HUGEINT (scalars.py range analysis; the widening is
    # measured-free on Q1 at sf1).
    return fixed_units(_rev(), 4).cast("decimal(38,0)")


# ------------------------------------------------ Q8: national market share
Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order year: the share of revenue in ASIA's customer market
    supplied by NATION_3 suppliers (TPC-H Q8 shape).  The market is
    pruned by the broadcast region->nation->customer chain before the
    fact join; the share is a conditional-sum / sum in one aggregate."""
    from location_summary_etl_spark.session import broadcast_if_small

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    market_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("mkt_nationkey"))
    market_customers = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(market_nations),
        F.col("c_nationkey") == F.col("mkt_nationkey"),
    ).select("c_custkey")
    supp_nation = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    ord_mkt = orders.select("o_orderkey", "o_custkey", "o_orderdate").join(
        broadcast_if_small(market_customers),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    j = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast_if_small(ord_mkt), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            round_portable(
                # cast both exact sums to double before dividing --
                # decimal/decimal would be decimal division, while the
                # DuckDB twin (HUGEINT / HUGEINT) is double division
                F.sum(F.when(F.col("supp_nation") == Q8_NATION,
                              _rev_units()).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(_rev_units()).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


register("nation_market_share", nation_market_share, f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(SUM(CASE WHEN n.n_name = '{Q8_NATION}'
                           THEN CAST(round(l_extendedprice * (1 - l_discount)
                                           * 10000, 0) AS BIGINT)
                           ELSE 0 END)
                  / SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 10000, 0) AS BIGINT)) AS DOUBLE), 6)
           AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n ON s_nationkey = n.n_nationkey
WHERE r_name = '{Q8_REGION}'
GROUP BY 1
""")


# --------------------------------------- Q9: product profit by nation/year
Q9_PTYPE = "PROMO"
Q9_COST_FACTOR = 0.1  # p_retailprice proxies the absent ps_supplycost


def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on PROMO parts per supplier nation and order year
    (TPC-H Q9 shape): profit = revenue - quantity * retailprice * 0.1.
    part and supplier|><|nation broadcast; lineitem |><| orders is the
    one wide join."""
    from location_summary_etl_spark.session import broadcast_if_small

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    promo_parts = part.filter(F.col("p_type") == Q9_PTYPE).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))

    # Profit has CANCELLATION (revenue minus cost), so a float sum's
    # last-ulp summation-order noise can straddle a 2-decimal rounding
    # boundary across engines (it did: 842247.875).  The aggregate is
    # therefore defined over integer CENTS: per-row half-away rounding
    # to cents is the same IEEE ops on the same input doubles in both
    # engines -> identical bigints -> an order-independent exact sum.
    profit = _rev() - F.col("l_quantity") * F.col("p_retailprice") * F.lit(
        Q9_COST_FACTOR
    )
    cents = (
        F.signum(profit) * F.floor(F.abs(profit) * F.lit(100.0) + F.lit(0.5))
    ).cast("long")
    j = (
        lineitem.join(F.broadcast(promo_parts),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            broadcast_if_small(orders.select("o_orderkey", "o_orderdate")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        j.groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            round_portable(F.sum(cents) / F.lit(100.0), 2).alias("sum_profit")
        )
    )


register("product_profit_by_nation_year", product_profit_by_nation_year, f"""
WITH p AS (
    SELECT n_name, o_orderdate,
           l_extendedprice * (1 - l_discount)
           - l_quantity * p_retailprice * {Q9_COST_FACTOR} AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_type = '{Q9_PTYPE}'
)
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(SUM(CAST(sign(profit) * floor(abs(profit) * 100.0 + 0.5)
                           AS BIGINT)) / 100.0 AS DOUBLE), 2) AS sum_profit
FROM p
GROUP BY 1, 2
""")


# ----------------------------------------------- Q14: promo revenue share
Q14_FROM, Q14_TO = "1997-01-01", "1998-01-01"


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 1997 ship month: percentage of revenue from PROMO-type parts
    (TPC-H Q14 shape) -- conditional-sum share over a broadcast part
    join, date filter pushed to the lineitem scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp_ntz"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return (
        j.groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            round_portable(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO",
                                _rev_units()).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(_rev_units()).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


register("promo_revenue_share", promo_revenue_share, f"""
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
       round(CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN CAST(round(l_extendedprice
                                             * (1 - l_discount) * 10000, 0)
                                             AS BIGINT)
                                   ELSE 0 END)
                  / SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 10000, 0) AS BIGINT)) AS DOUBLE), 6)
           AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q14_TO}'
GROUP BY 1
""")


# ------------------------------------- Q21: suppliers who kept orders waiting
Q21_LATE_DAYS = 90


def waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late lines per supplier in multi-supplier orders where that
    supplier was the ONLY late one (TPC-H Q21 shape; lateness =
    shipped more than 90 days after the order date, since the schema
    has no commit/receipt dates).

    The SQL form is a correlated EXISTS (another supplier in the
    order) AND NOT EXISTS (another LATE supplier in the order); here
    both collapse into ONE per-order aggregate -- distinct-supplier
    count and the distinct set of late suppliers -- so lineitem is
    read once and shuffled once on orderkey.  A qualifying order
    contributes its late-line count to its single late supplier."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    from location_summary_etl_spark.session import broadcast_if_small

    lines = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        broadcast_if_small(orders.select("o_orderkey", "o_orderdate")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.array_distinct(
            F.collect_list(F.when(F.col("late"), F.col("l_suppkey")))
        ).alias("late_supps"),
        F.count(F.when(F.col("late"), 1)).alias("n_late_lines"),
    )
    qual = per_order.filter(
        (F.col("n_supp") >= 2) & (F.size("late_supps") == 1)
    ).select(
        F.col("late_supps")[0].alias("s_suppkey_q"), "n_late_lines"
    )
    return (
        qual.groupBy("s_suppkey_q")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("s_suppkey_q") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
    )


register("waiting_supplier_orders", waiting_supplier_orders, f"""
WITH lines AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
late_lines AS (SELECT * FROM lines WHERE late)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late_lines l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late_lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
""")
