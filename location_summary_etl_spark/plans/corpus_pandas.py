"""Grouped pandas API surface: ``cogroup().applyInPandas`` and
grouped-map ``applyInPandas`` with sequential (order-dependent) state.

The reference never leaves built-in expressions (its only imports are
``org.apache.spark.sql.functions`` -- /root/reference/src/main/scala/
App.scala:4), and neither does our core corpus.  These two queries
cover the remaining escape hatch an LLM-data pipeline needs: per-entity
imperative logic over one or two co-partitioned inputs, Arrow-batched
(never row-at-a-time).

Scale notes (100 TB):

- **Cogroup = two shuffles, total.**  Each side exchanges once on the
  key, then each key's two frames meet in ONE Python worker call.  The
  equivalent join-then-regroup formulation shuffles the *joined* fanout
  (|orders_k| x |events_k| rows per key); cogroup moves each input
  exactly once.  Skewed entities bound the per-call batch -- the frame
  handed to Python is one key's rows, not a partition's.
- **Sequential state stays vectorizable-adjacent.**  The EWMA fold is
  inherently order-dependent (y_t = 0.7*y_{t-1} + 0.3*x_t), exactly
  what built-in aggregates can't express without a closed form; per
  group it is O(n) single-pass with O(1) state, so the cost profile
  matches a window aggregate.  The fold arithmetic is written
  identically to the DuckDB oracle's ``list_reduce`` lambda so both
  engines produce the same IEEE doubles bit-for-bit before rounding.
- Output schemas are declared as DDL strings at the operator boundary
  -- the contract every ``applyInPandas`` caller must pin, since Arrow
  will not infer them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.session import partition_for_grouped_python
from location_summary_etl_spark.sources.registry import load_table


def _round_half_away(x: float, scale: int) -> float:
    """numpy replica of functions.scalars.round_portable (C-library
    half-away-from-zero on doubles == DuckDB round)."""
    p = float(10 ** scale)
    return float(np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p)


# ------------------------------------------------- cogroup: entity profile
COGROUP_SCHEMA = (
    "user_id bigint, n_orders bigint, order_total double, "
    "n_events bigint, event_value_total double"
)


def user_activity_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity activity profile from TWO fact tables at once:
    orders (keyed by o_custkey) cogrouped with events (keyed by
    user_id).  Keys present in either side appear (full-outer
    semantics); each side's totals come from its own frame, so there is
    no join fanout to re-aggregate away."""
    orders = partition_for_grouped_python(
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        "o_custkey",
    )
    events = partition_for_grouped_python(
        load_table(spark, sf_dir, "events").select("user_id", "value"),
        "user_id",
    )

    def profile(key: tuple, o: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_orders": [len(o)],
                # exact cents inside the Arrow batch too (fixed-point
                # policy): int64 sums, then one division -- parity
                # with the oracle's unit sums is structural
                "order_total": [_round_half_away(
                    int(o["o_totalprice"].mul(100).round().astype("int64")
                        .sum()) / 100.0, 2)],
                "n_events": [len(e)],
                "event_value_total": [_round_half_away(
                    int(e["value"].mul(100).round().astype("int64")
                        .sum()) / 100.0, 2)],
            }
        )

    return (
        orders.groupBy("o_custkey")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(profile, COGROUP_SCHEMA)
    )


COGROUP_SQL = """
WITH o AS (
    SELECT o_custkey AS k, COUNT(*) AS n_orders,
           round(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                      / 100.0 AS DOUBLE), 2) AS order_total
    FROM orders GROUP BY 1
),
e AS (
    SELECT user_id AS k, COUNT(*) AS n_events,
           round(CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      / 100.0 AS DOUBLE), 2) AS event_value_total
    FROM events GROUP BY 1
)
SELECT COALESCE(o.k, e.k) AS user_id,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.order_total, 0.0) AS order_total,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.event_value_total, 0.0) AS event_value_total
FROM o FULL OUTER JOIN e ON o.k = e.k
"""


# ------------------------------------- grouped map: sequential EWMA fold
EWMA_ALPHA = 0.3  # lambda below hard-codes 0.7/0.3: keep in sync
EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma_value double"


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final exponentially-weighted moving average of each user's event
    values in (ts, event_id) order -- a sequential fold with no
    closed-form built-in aggregate.

    Catalyst-native: ONE groupBy(user_id) exchange collects each
    user's (ts, event_id, value) structs; ``array_sort`` orders them
    (lexicographic struct order == the (ts, event_id) sort key), and
    ``F.aggregate`` runs the fold JVM-side on the aggregate row.  No
    Python stage at all -- the grouped-map formulation of the same
    fold lives in :func:`user_value_ewma_pandas` (the corpus keeps
    both: this one is the throughput path, that one exercises the
    grouped-Python API).  The fold's association is identical to the
    oracle's list_reduce lambda."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("_xs"),
    )
    fold = F.aggregate(
        F.slice("_xs", 2, F.greatest(F.size("_xs") - 1, F.lit(0))),
        F.element_at("_xs", 1)["value"],
        lambda acc, x: acc * F.lit(0.7) + x["value"] * F.lit(0.3),
    )
    return g.select(
        "user_id", "n_events", round_portable(fold, 6).alias("ewma_value")
    )


def user_value_ewma_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (``applyInPandas``) formulation of
    :func:`user_value_ewma`: one shuffle on user_id, then an O(n)/O(1)
    sequential scan per group in the Python worker.  Same oracle."""
    events = partition_for_grouped_python(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value"),
        "user_id",
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf.sort_values(["ts", "event_id"])["value"].to_numpy()
        acc = float(vals[0])
        for x in vals[1:]:
            # identical association to the oracle's list_reduce lambda
            acc = acc * 0.7 + float(x) * 0.3
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(vals)],
                "ewma_value": [_round_half_away(acc, 6)],
            }
        )

    return events.groupBy("user_id").applyInPandas(ewma, EWMA_SCHEMA)


EWMA_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       round(CAST(list_reduce(list(value ORDER BY ts, event_id),
                              (acc, x) -> acc * 0.7 + x * 0.3) AS DOUBLE), 6)
           AS ewma_value
FROM events
GROUP BY user_id
"""


register("user_activity_cogroup", user_activity_cogroup, COGROUP_SQL)
register("user_value_ewma", user_value_ewma, EWMA_SQL)
register("user_value_ewma_pandas", user_value_ewma_pandas, EWMA_SQL)


# ---------------------------------------- grouped-agg pandas UDF: wavg
# Completes the pandas API family (mapInPandas / applyInPandas /
# cogroup are covered elsewhere): PandasUDFType GROUPED_AGG -- a
# vectorized Python aggregate that Catalyst plans as a real partial-less
# aggregate over each group's Arrow batch.  Scale: one shuffle on the
# group key; the UDF sees each group's columns as numpy-backed Series.
# The weighted mean divides two sums, so cross-engine summation-order
# noise (~1e-11 relative) is normalized before the 4-decimal round.
def segment_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: order-month-weighted mean order price
    (a seasonality-corrected average), via a grouped-agg pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, w: pd.Series) -> float:
        # exact integer arithmetic inside the Arrow batch (fixed-point
        # policy, functions/scalars.py): cents x integer weight sums
        # in int64, one division at the end -- the weighted mean is
        # identical to the oracle's unit-sum form by construction
        cents = price.mul(100).round().astype("int64")
        wi = w.astype("int64")
        return float((cents * wi).sum() / (100.0 * wi.sum()))

    # Catalyst refuses to mix grouped-agg pandas UDFs with built-in
    # aggregates in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT), so
    # the row count is a pandas aggregate too.
    @pandas_udf("long")
    def pcount(price: pd.Series) -> int:
        return len(price)

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.select(
        "o_custkey", "o_totalprice", F.month("o_orderdate").alias("m")
    ).join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return j.groupBy("c_mktsegment").agg(
        round_portable(
            wavg(F.col("o_totalprice"), F.col("m").cast("double")), 4
        ).alias("weighted_avg_price"),
        pcount(F.col("o_totalprice")).alias("n_orders"),
    )


register("segment_weighted_price", segment_weighted_price, """
SELECT c_mktsegment,
       round(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          * CAST(m AS BIGINT))
                  / (100.0 * SUM(CAST(m AS BIGINT))) AS DOUBLE), 4)
           AS weighted_avg_price,
       COUNT(*) AS n_orders
FROM (SELECT o_custkey, o_totalprice,
             CAST(month(o_orderdate) AS DOUBLE) AS m
      FROM orders) o
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")


# ------------------------------------- Arrow-optimized scalar Python UDF
# The row-at-a-time escape hatch on its fastest transport (Spark 4
# useArrow=True: columnar Arrow batches instead of pickled rows).  Kept
# OUT of every hot path by policy -- this entry documents the API and
# its price: the lambda below is pure-Python per row, ~100x slower than
# the equivalent codegen'd CASE, which is why the oracle can express it
# as plain SQL at all.
def orders_arrow_udf_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per price band where the band is assigned by an
    Arrow-optimized scalar Python UDF."""
    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def band(price: float) -> str:
        if price < 50_000:
            return "low"
        if price < 200_000:
            return "mid"
        return "high"

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(band(F.col("o_totalprice")).alias("band"))
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"))
    )


register("orders_arrow_udf_bands", orders_arrow_udf_bands, """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS band,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""")
