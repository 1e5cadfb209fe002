"""Ranking / navigation window-function corpus: the analytic-function
family still absent after ``corpus_extras`` (which covers rank +
running SUM + LAG) --

- **dense_rank / percent_rank / cume_dist / ntile**: the full ranking
  family over one window definition.  All four share a single
  partition-by-key shuffle + sort; Catalyst evaluates them in one
  Window operator pass.
- **lead + first_value/last_value**: forward navigation and
  frame-extreme values.  ``last_value`` needs an explicit
  UNBOUNDED-to-UNBOUNDED rows frame in both engines (the default frame
  stops at CURRENT ROW, which would make it an expensive identity).

Scale notes: both queries partition the window by ``o_custkey`` --
high-cardinality keys keep per-partition state small (a customer's own
orders) so the one shuffle each query does distributes evenly across
executors.  Ranking within a LOW-cardinality key (e.g. the 5-value
order priority) would serialize whole-corpus sorts onto 5 tasks; at
100 TB express those as groupBy aggregates or top-k patterns instead
(`top_orders_per_nation`).  Ordering includes the unique
``o_orderkey`` tiebreak so every rank/navigation value is
deterministic and engine-portable.

The reference has no window functions at all
(/root/reference/src/main/scala/App.scala computes its extremes with
global aggregates, SURVEY §2.B7); this extends §2.D's "absent" rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    round_portable,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


def orders_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order's standing inside its customer's history, by price:
    dense rank, percentile rank, cumulative distribution, and price
    quartile.  One window spec => one shuffle on o_custkey, one sort,
    all four functions evaluated in a single Window pass."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("price_rank"),
        round_portable(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_portable(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


ORDERS_RANK_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(dense_rank() OVER w AS INT) AS price_rank,
       round(CAST(percent_rank() OVER w AS DOUBLE), 6) AS pct_rank,
       round(CAST(cume_dist() OVER w AS DOUBLE), 6) AS cdist,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


def customer_order_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: days until the customer's next order (lead, NULL on
    the last one) and the customer's first/last order price.  The
    ordered window and the unbounded-frame window share partitioning
    and sort order, so Catalyst plans ONE exchange + ONE sort for both
    (two Window operators back-to-back, no second shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.lead("o_orderdate").over(wo), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_next"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
    )


CUSTOMER_TIMELINE_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(date_diff('day', o_orderdate, lead(o_orderdate) OVER wo) AS INT)
           AS days_to_next,
       first_value(o_totalprice) OVER wf AS first_price,
       last_value(o_totalprice) OVER wf AS last_price
FROM orders
WINDOW
  wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


register("orders_rank_analytics", orders_rank_analytics, ORDERS_RANK_SQL)
register("customer_order_timeline", customer_order_timeline, CUSTOMER_TIMELINE_SQL)


# ---------------------------------------- value-RANGE window frame
PRICE_BAND_RADIUS = 1000


def orders_price_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: how many same-priority orders have a total price
    within +-1000, and their average (floored) price -- a VALUE-based
    RANGE frame (the time-RANGE frame of events_rolling_10min, on a
    numeric axis).  One exchange on o_orderpriority + one sort on price
    serves the whole frame family; the running frame is O(n) per
    partition (two moving pointers), never O(n^2) pair evaluation.

    The averaged measure is floor(price): window aggregates associate
    differently across engines (running fold vs segment tree), so a
    double SUM's low bits are frame-implementation-defined -- but
    integer sums are exact under any association, making the AVG (and
    its rounding) bit-identical.  Same integer discipline as the
    quantized-ANN oracle.

    Scale caveat (the module-note low-cardinality warning applies):
    o_orderpriority has 5 values, so this exact shape serializes onto 5
    sorts at 100 TB.  A value-range frame that must span a whole huge
    table is instead range-partitioned on the order axis with a +-radius
    halo duplicated at the cuts (the as-of/interval-join trick in
    operators/asof.py); this corpus entry pins the frame SEMANTICS."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-PRICE_BAND_RADIUS, PRICE_BAND_RADIUS)
    )
    floored = F.floor("o_totalprice").cast("bigint")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.count("*").over(w).alias("n_neighbors"),
        # floored prices are integral: exact long window sum / count
        # (fixed-point policy, scalars.py)
        round_portable(
            F.sum(floored).over(w) / (1.0 * F.count("*").over(w)), 2
        ).alias("avg_neighbor_price"),
    )


register("orders_price_range_window", orders_price_range_window, f"""
SELECT o_orderkey, o_orderpriority,
       COUNT(*) OVER w AS n_neighbors,
       round(CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) OVER w
                  / (1.0 * COUNT(*) OVER w) AS DOUBLE), 2) AS avg_neighbor_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN {PRICE_BAND_RADIUS} PRECEDING
                       AND {PRICE_BAND_RADIUS} FOLLOWING)
""")
