"""Third TPC-H sweep: Q4, Q6, Q12 shapes — the last classic queries
missing from the corpus, completing 22/22 TPC-H shape coverage.

Adaptations forced by the schema (no ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode`` — TESTDATA.md): the "late line"
predicate that Q4 and Q12 build on ``l_commitdate < l_receiptdate`` is
expressed as a ship-delay against the order date
(``l_shipdate > o_orderdate + N days``), and Q12's ship-mode group key
becomes a derived delay bucket.  The operator content is unchanged:

- Q4  = date-windowed EXISTS with a correlated non-equi term
  (semi join whose condition mixes the key equality with an
  inequality on both sides' columns) + priority count.
- Q6  = the pure scan-side query: conjunctive range predicates all
  pushed to the parquet scan, one grand-total aggregate, no join.
- Q12 = fact-fact join + conditional two-way counts grouped by a
  derived classification column.

Scale notes: Q6 is map-only (filters land in PushedFilters, aggregate
is partial+final over a filtered sliver).  Q4's semi join and Q12's
inner join shuffle on orderkey only after the orders date filter
prunes the build side; both aggregates are map-side combined.
Reference anchor: the reference pushes exactly these filter/aggregate
shapes into its warehouse queries
(/root/reference/src/main/scala/App.scala:52-75 date-window + filter,
:166-263 conditional aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    round_portable,
    sum_units,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table

# ----------------------------------------------- Q4: order priority checking
Q4_FROM, Q4_TO = "1996-07-01", "1996-10-01"
Q4_LATE_DAYS = 60


def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: how many orders in one quarter had at least
    one line shipped more than Q4_LATE_DAYS after the order date
    (TPC-H Q4 shape).

    The EXISTS is a LEFT SEMI join whose condition carries the
    correlated inequality (l_shipdate > o_orderdate + 60 days) next to
    the key equality — the date window prunes orders before the
    shuffle, and the semi join short-circuits per order (no fanout, no
    distinct)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp_ntz"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    late = orders.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


register("order_priority_checking", order_priority_checking, f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q4_TO}'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
""")


# ----------------------------------------------- Q6: forecast revenue change
Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY = 24


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand-total discount revenue over a year/discount/quantity
    sliver (TPC-H Q6): every predicate is scan-pushable, the plan is
    scan -> filter -> partial agg -> one-row final agg — the query
    whose cost at 100 TB is pure pruned I/O."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp_ntz"))
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(round_portable(
            # exact scale-4 units (fixed-point policy, scalars.py;
            # DECIMAL(38,0)-widened accumulator via sum_units)
            sum_units(
                F.col("l_extendedprice") * F.col("l_discount"), 4)
            / F.lit(10000.0), 2
        ).alias("revenue"))
    )


register("forecast_revenue_change", forecast_revenue_change, f"""
SELECT round(CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000, 0)
                           AS BIGINT)) / 10000.0 AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q6_TO}'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
""")


# ------------------------------------- Q12: shipping delay priority counts
Q12_FROM, Q12_TO = "1997-01-01", "1998-01-01"
Q12_SLOW_DAYS, Q12_LATE_DAYS = 30, 90
_HIGH = ("1-URGENT", "2-HIGH")


def shipping_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship-delay bucket (FAST/SLOW/LATE, derived from
    l_shipdate - o_orderdate): counts of high- vs low-priority lines
    (TPC-H Q12 shape, delay bucket standing in for l_shipmode).

    One fact-fact shuffle on orderkey (both sides filtered first),
    then a 3-group conditional aggregate — the CASE classification and
    both count_ifs fuse into the same codegen'd aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > Q12_LATE_DAYS, F.lit("LATE"))
        .when(delay > Q12_SLOW_DAYS, F.lit("SLOW"))
        .otherwise(F.lit("FAST"))
    )
    high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


register("shipping_delay_priority_counts", shipping_delay_priority_counts, f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_LATE_DAYS}
            THEN 'LATE'
            WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_SLOW_DAYS}
            THEN 'SLOW' ELSE 'FAST' END AS delay_bucket,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q12_TO}'
GROUP BY 1
""")
