"""Correlated and nested subqueries: the Catalyst decorrelation corpus.

The reference's only subqueries are *uncorrelated* scalar subqueries in
WHERE (``dd.date = (SELECT max_date FROM ...)``,
/root/reference/src/main/scala/App.scala:70, 91, 128, 163) -- SURVEY.md
§2 A7, already covered by ``global_latest_orders``.  A warehouse user
also writes the *correlated* forms, and their execution strategy is the
difference between "runs" and "re-executes the inner query per row".
These five queries (classic TPC-H Q17/Q13/Q15/Q11/Q22 shapes adapted to
this star schema) pin the decorrelated plans:

- **Correlated scalar subquery** (``part_small_quantity_revenue``):
  Catalyst's RewriteCorrelatedScalarSubquery turns the per-part AVG
  into ONE aggregate over the correlation key plus a left outer join --
  a single shuffle on ``l_partkey``, never a nested loop.  At 100 TB
  the inner aggregate reads lineitem once, map-side-combined.
- **Correlated NOT EXISTS with an extra predicate**
  (``inactive_high_balance_segments``): rewritten to a left ANTI join
  on the correlation key with the date predicate pushed below the join
  build side -- the anti join only sees post-cutoff orders.
- **Uncorrelated scalar subquery in HAVING / WHERE**
  (``nation_revenue_share``, same pattern in the Q22 balance
  threshold): a one-row subquery plan executed once and broadcast into
  the filter -- in-plan, no driver round-trip (contrast the
  reference's collect-then-literal at App.scala:175-185).
- **Self-join against an aggregated view's max**
  (``top_revenue_supplier``): the CTE is evaluated once per consumer
  (Spark does not materialize non-cached CTEs); the MAX side collapses
  to a one-row broadcast, so the equality filter costs a BroadcastNLJ
  over one row, not a shuffle.
- **Distribution-of-counts** (``customer_order_count_distribution``):
  two stacked aggregations; the second groups on the first's output
  (~hundreds of distinct counts), so the second shuffle is tiny --
  cost is one left outer join + one wide aggregate.

All five stay entirely in whole-stage codegen; none collect to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    round_portable,
    sum_units,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table, register_views

# ------------------------------------------------- Q17: small-quantity revenue
Q17_BRAND = "Brand#4"
Q17_FRACTION = 0.5  # of the part's average quantity


def part_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost to small orders (TPC-H Q17 shape):
    lineitems of one brand whose quantity is below half that part's
    average quantity.  Expressed through spark.sql so the correlated
    scalar subquery exercises RewriteCorrelatedScalarSubquery: the
    per-part AVG becomes one aggregate + left outer join on l_partkey
    (quantities are integer-valued doubles, so the AVG is
    summation-order-exact in both engines).

    The outer part table is aliased ``p`` and the correlation is
    qualified ``l2.l_partkey = p.p_partkey`` -- an unqualified
    ``p_partkey`` would resolve to the INNER scope's part table and
    silently turn the subquery into an uncorrelated global average
    (inner scope shadows outer correlation in both Spark and DuckDB).
    The inner block keeps the brand join: a per-partkey average is
    unchanged by restricting WHICH partkeys are averaged, but the
    restriction lets the decorrelated aggregate scan only
    brand-matching lineitems (~1/25 of the fact, pruned by a broadcast
    semi on the filtered part dim) instead of the whole table -- at
    100 TB that is the difference between shuffling the corpus and a
    sliver."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    raw = spark.sql(f"""
        SELECT SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
               / 100.0 / 7.0 AS avg_yearly_raw
        FROM lineitem JOIN part p ON p.p_partkey = l_partkey
        WHERE p.p_brand = '{Q17_BRAND}'
          AND l_quantity < (
              SELECT {Q17_FRACTION} * AVG(l2.l_quantity)
              FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
              WHERE l2.l_partkey = p.p_partkey AND p2.p_brand = '{Q17_BRAND}')
    """)
    return raw.select(
        round_portable(F.col("avg_yearly_raw"), 2).alias("avg_yearly"))


register("part_small_quantity_revenue", part_small_quantity_revenue, f"""
SELECT round(CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  / 100.0 / 7.0 AS DOUBLE), 2) AS avg_yearly
FROM lineitem JOIN part p ON p.p_partkey = l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND l_quantity < (
      SELECT {Q17_FRACTION} * AVG(l2.l_quantity)
      FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
      WHERE l2.l_partkey = p.p_partkey AND p2.p_brand = '{Q17_BRAND}')
""")


# ------------------------------------- Q13: customer order-count distribution
Q13_EXCLUDED_PRIORITY = "1-URGENT"


def customer_order_count_distribution(spark: SparkSession, sf_dir: str
                                      ) -> DataFrame:
    """How many customers placed how many (non-urgent) orders (TPC-H
    Q13 shape).  Aggregate-BELOW-join: orders are counted per custkey
    FIRST (map-side combined, one row per customer crosses the wire),
    and only then left-joined to customer to pick up the zero-order
    customers -- the naive join-then-count shape shuffles every order
    row into the join.  The second groupBy runs over ~tens of distinct
    counts: its shuffle is measured in kilobytes regardless of input
    scale.

    MEASURED FLOOR (r7, sf10 tier = 15M orders / 1.5M customers,
    min-of-4 noop-sink): full query 0.58 s ~= the per-customer count
    alone 0.60 s -- the customer join and both downstream aggregates
    are FREE; the whole cost is the orders scan + 1.5M-group hash
    aggregate.  A join-free rewrite (derive the zero-count row as
    |customer| - |distinct custkeys|, result-verified equal) measured
    0.56 s -- no real win, and it silently assumes orders.o_custkey
    FK-integrity where the join form defines the semantics on any
    input, so the join form stays.  Spark time is near-flat across
    sf0.1/sf1/sf10 (0.29 -> 0.49 -> 0.56 s over 100x; ratio falls
    16.8 -> 12.7 -> 3.6): the floor signature."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts_per_customer = (
        orders.filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_customer = (
        customer.select("c_custkey")
        .join(counts_per_customer,
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


register("customer_order_count_distribution", customer_order_count_distribution, f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
    GROUP BY c_custkey
) per_customer
GROUP BY c_count
""")


# ----------------------------------------------- Q15: top revenue supplier(s)
Q15_FROM, Q15_TO = "1998-01-01", "1999-01-01"


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum shipped revenue in one year (TPC-H
    Q15 shape).  The per-supplier revenue aggregate is built once as a
    DataFrame and consumed twice (detail + global MAX); the MAX side is
    a one-row aggregate that Catalyst broadcasts, so the equality
    filter is a broadcast nested-loop over a single row -- no second
    shuffle of the revenue table.  Revenue is rounded to cents BEFORE
    the max/equality so cross-engine summation-order noise (~1e-10
    relative) cannot split the argmax."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    lo = F.lit(Q15_FROM).cast("timestamp_ntz")
    hi = F.lit(Q15_TO).cast("timestamp_ntz")
    revenue = (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(round_portable(
            sum_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            / F.lit(10000.0), 2)
            .alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(max_rev,
                     F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


register("top_revenue_supplier", top_revenue_supplier, f"""
WITH revenue AS (
    SELECT l_suppkey,
           round(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 10000, 0) AS BIGINT))
                      / 10000.0 AS DOUBLE), 2)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
      AND l_shipdate <  TIMESTAMP '{Q15_TO}'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")


# ------------------------------------------------- Q11: nation revenue share
Q11_FRACTION = 0.04


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier nations contributing more than a fraction of global
    revenue (TPC-H Q11 shape: HAVING against an uncorrelated scalar
    subquery).  The global-total subquery is a one-row plan broadcast
    into the HAVING filter -- the in-plan version of the reference's
    collect-then-literal normalization constants (App.scala:175-185).
    lineitem is read twice (grouped pass + global pass); both passes
    are map-side-combined so the shuffles carry one row per
    nation/partition and one row per partition respectively."""
    register_views(spark, sf_dir, ["lineitem", "supplier", "nation"])
    raw = spark.sql(f"""
        SELECT n_name, SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev_raw
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) > {Q11_FRACTION} * (
            SELECT SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) FROM lineitem)
    """)
    return raw.select(
        "n_name",
        round_portable(F.col("rev_raw") / F.lit(10000.0), 2)
        .alias("nation_revenue"))


register("nation_revenue_share", nation_revenue_share, f"""
SELECT n_name,
       round(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS DOUBLE), 2)
           AS nation_revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) > {Q11_FRACTION} * (
    SELECT SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) FROM lineitem)
""")


# ------------------------------------- Q22: inactive high-balance customers
Q22_CUTOFF = "2000-06-01"


def inactive_high_balance_segments(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Per-segment count and balance of above-average-balance customers
    with no recent orders (TPC-H Q22 shape).  Two subquery rewrites in
    one plan: the balance threshold is an uncorrelated scalar subquery
    (one-row broadcast), and the correlated NOT EXISTS with its date
    predicate becomes a left ANTI join against post-cutoff orders --
    the anti join's build side is pre-filtered to the cutoff, not all
    of orders."""
    register_views(spark, sf_dir, ["customer", "orders"])
    raw = spark.sql(f"""
        SELECT c_mktsegment,
               COUNT(*) AS num_customers,
               SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS bal_raw
        FROM customer c
        WHERE c_acctbal > (
            SELECT SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                   / (100.0 * COUNT(*))
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
        GROUP BY c_mktsegment
    """)
    return raw.select(
        "c_mktsegment", "num_customers",
        round_portable(F.col("bal_raw") / F.lit(100.0), 2)
        .alias("total_acctbal"))


register("inactive_high_balance_segments", inactive_high_balance_segments, f"""
SELECT c_mktsegment,
       COUNT(*) AS num_customers,
       round(CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 2) AS total_acctbal
FROM customer c
WHERE c_acctbal > (
    SELECT SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                   / (100.0 * COUNT(*))
            FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_mktsegment
""")


# --------------------------------- Q16: NOT IN (null-aware anti join)
def part_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per brand for small parts, excluding suppliers
    in the NOT IN list (TPC-H Q16 shape).  NOT IN is NOT the same
    operator as NOT EXISTS: its three-valued NULL semantics need a
    null-aware anti join (one NULL in the subquery empties the result);
    Spark plans a broadcast NAAJ here -- the corpus pins that operator
    distinctly from the LeftAnti of inactive_high_balance_segments."""
    register_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql("""
        SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 10
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY p_brand
    """)


register("part_brand_supplier_counts", part_brand_supplier_counts, """
SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 10
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand
""")
