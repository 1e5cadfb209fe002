"""Analytics corpus: reshaping and distribution operators absent from
both the reference and the earlier extension corpora --

- **pivot** (``groupBy().pivot().agg()``): long->wide reshaping; the
  oracle is the classic conditional-aggregation rewrite, which is also
  exactly how Spark executes a pivot with an explicit value list (one
  hash aggregate, no extra shuffle vs the plain groupBy).
- **exact per-group percentiles** (median / p90): Spark ``percentile``
  with continuous interpolation == DuckDB ``quantile_cont``.  Exact
  percentiles buffer each group's values, so at 100 TB this is for
  bounded-cardinality groups only -- the unbounded-scale path is the
  sketch in ``orders_approx_stats`` (t-digest-style partial merge).
- **deterministic stratified sampling**: per-stratum rates applied via
  a content-stable hash of the row id (same ``portable_hash60`` family
  as hash_split).  Unlike ``df.sampleBy`` this is reproducible across
  engines, runs, and cluster sizes -- the property a training-data
  pipeline needs for auditable subsampling.  Pure map + broadcast join
  of the tiny rate table: no shuffle at any scale.
- **time-series gap fill / resampling**: per-user fixed-width buckets
  between that user's first and last event, zero-filled.  The bucket
  series is generated with ``sequence()`` + ``explode`` (rows expand
  executor-side, never on the driver) and left-joined to the bucketed
  counts -- both sides shuffle on user_id once.

The reference has no analogue for any of these (it is a fixed
six-source summarizer -- /root/reference/src/main/scala/App.scala);
they extend SURVEY.md §2.D's "absent" rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    DUCKDB_HASH60,
    avg_fixed_point,
    portable_hash60,
    round_portable,
    sum_fixed_point,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


# ------------------------------------------------------------------ pivot
ORDER_STATUSES = ["O", "F", "P"]  # explicit value list => no discovery scan


def orders_month_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per (month, status) pivoted wide: one row per order-month,
    one count column per status.  The explicit value list matters at
    scale: without it Spark runs an extra distinct scan to discover the
    pivot values (and an unbounded status domain would make the schema
    unbounded)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("order_month")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    renamed = wide.select(
        "order_month",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in ORDER_STATUSES],
    )
    return renamed


ORDERS_PIVOT_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY 1
"""


# ------------------------------------------------- exact group percentiles
def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and p90 order price per market segment (customer
    join orders, one shuffle per side on the join key, then one
    aggregate shuffle on the 5-value segment key).  Continuous
    interpolation on both engines; the handful of group keys bounds the
    per-group value buffers."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        round_portable(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        round_portable(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
    )


SEGMENT_QUANTILES_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price,
       round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ------------------------------------------------- stratified sampling
SAMPLE_RATES = [  # (lang, keep rate): keep all English, downsample rest
    ("en", 1.0),
    ("de", 0.5),
    ("fr", 0.5),
    ("es", 0.25),
    ("zh", 0.25),
]
SAMPLE_SALT = "sample-v1"


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving per-language downsampling: keep doc iff
    hash(salt|doc_id) mod 10^6 < rate * 10^6.  Rates ride a broadcast
    join (unknown langs drop out -- inner join is the filter); the
    hash decision is per-row and corpus-independent, so re-runs and
    incremental batches sample identically."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(SAMPLE_RATES, "lang string, rate double")
    bucket = (
        portable_hash60(
            F.concat_ws("|", F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))
        ) % 1_000_000
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < (F.col("rate") * 1_000_000).cast("bigint"))
        .select("doc_id", "lang", "source")
    )


_H60_DOC = DUCKDB_HASH60.format(
    x=f"concat_ws('|', '{SAMPLE_SALT}', CAST(doc_id AS VARCHAR))"
)
_RATE_VALUES = ", ".join(f"('{l}', {r})" for l, r in SAMPLE_RATES)

STRATIFIED_SAMPLE_SQL = f"""
WITH rates(lang, rate) AS (VALUES {_RATE_VALUES})
SELECT doc_id, d.lang, source
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_H60_DOC} % 1000000 < CAST(r.rate * 1000000 AS BIGINT)
"""


# ------------------------------------------------- gap fill / resampling
BUCKET_SEC = 600  # 10-minute resampling grid


def events_user_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: event count for EVERY 10-minute bucket between the
    user's first and last event, gaps zero-filled.  ``sequence()``
    materializes each user's bucket range executor-side (bounded by the
    user's own activity span, not the corpus span); counts and spans
    both shuffle once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / BUCKET_SEC).alias("bucket"),
    )
    counts = bucketed.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n_events")
    )
    spans = bucketed.groupBy("user_id").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    series = spans.select(
        "user_id",
        F.explode(F.sequence("_mn", "_mx")).alias("bucket"),
    )
    return (
        series.join(counts, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("int").alias("n_events"),
        )
    )


EVENTS_GAPFILL_SQL = f"""
WITH b AS (
    SELECT user_id, CAST(floor(epoch(ts) / {BUCKET_SEC}) AS BIGINT) AS bucket
    FROM events
),
counts AS (
    SELECT user_id, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
),
series AS (
    SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
    FROM (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM b GROUP BY 1)
)
SELECT s.user_id, s.bucket, CAST(COALESCE(c.n, 0) AS INT) AS n_events
FROM series s LEFT JOIN counts c ON s.user_id = c.user_id AND s.bucket = c.bucket
"""


register("orders_month_status_pivot", orders_month_status_pivot, ORDERS_PIVOT_SQL)
register("segment_price_quantiles", segment_price_quantiles, SEGMENT_QUANTILES_SQL)
register("corpus_stratified_sample", corpus_stratified_sample, STRATIFIED_SAMPLE_SQL)
register("events_user_gapfill", events_user_gapfill, EVENTS_GAPFILL_SQL)


# ------------------------------------------------- unpivot / melt
MELT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_melt_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshaping (the inverse of orders_month_status_pivot):
    unpivot the four lineitem measures into (measure, value) rows, then
    profile each measure per linestatus.  ``unpivot`` is a zero-shuffle
    row expansion (each input row emits 4 value rows inside the scan
    stage); the only exchange is the final aggregate's.  The melt
    costs 4x the rows but 1/4 the row width -- at 100 TB you push the
    aggregate's partial phase into the same stage, so the wide form
    never materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_linestatus"],
        values=MELT_MEASURES,
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("l_linestatus", "measure").agg(
        F.count("*").alias("n"),
        # every melted measure is at most 2-decimal, so a shared
        # cents scale keeps the average exact (fixed-point policy)
        avg_fixed_point("value", 2, 6).alias("avg_value"),
        round_portable(F.max("value"), 2).alias("max_value"),
    )


_MELT_ARMS = " UNION ALL ".join(
    f"SELECT l_linestatus, '{m}' AS measure, {m} AS value FROM lineitem"
    for m in MELT_MEASURES
)

LINEITEM_MELT_SQL = f"""
WITH long AS ({_MELT_ARMS})
SELECT l_linestatus, measure,
       COUNT(*) AS n,
       round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(value)) AS DOUBLE), 6) AS avg_value,
       round(CAST(MAX(value) AS DOUBLE), 2) AS max_value
FROM long
GROUP BY l_linestatus, measure
"""

register("lineitem_melt_profile", lineitem_melt_profile, LINEITEM_MELT_SQL)


def skew_salted_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim equi-join under the oracle gate: lineitem joins
    the (deliberately small here, hot-keyed at scale) orders relation
    16-way salted -- the fact side derives a deterministic salt from
    its own columns (task-retry safe; rand() would reshuffle rows to a
    different salt mid-query) and the dim side explodes across all
    salts, so one hot join key spreads over n_salts tasks instead of
    one straggler.  Salting changes only the physical distribution:
    the oracle is the PLAIN join, which is exactly the point -- the
    gate certifies result-equivalence of the skew-resistant plan."""
    from location_summary_etl_spark.operators.skew import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
    joined = salted_join(lineitem, orders, "l_orderkey", n_salts=16)
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("n_lines"),
             sum_fixed_point("l_extendedprice", 2, 2)
             .alias("urgent_revenue"))
    )


register("skew_salted_fact_join", skew_salted_fact_join, """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_lines,
       round(CAST(SUM(CAST(round((l_extendedprice) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 2) AS urgent_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
""")
