"""Reference-parity corpus: one oracle-paired query per operator family
of SURVEY.md §2 (the reference's complete algebra: scan -> filter ->
equi/left join -> group-by {AVG,MIN,MAX} -> grand-total agg -> scalar
broadcast -> arithmetic/conditional/date/rounding -> rename/project).

Every query is a pure Catalyst plan (no UDFs, no collects); dimension
joins are broadcast; aggregates are partial+final hash aggregates.
Citations point at the reference construct each query reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    avg_fixed_point,
    duckdb_avg_fixed,
    duckdb_sum_fixed,
    fixed_units,
    round_portable,
    sum_fixed_point,
)
from location_summary_etl_spark.operators.aggregates import multi_avg
from location_summary_etl_spark.operators.normalize import minmax_score_auto
from location_summary_etl_spark.operators.snapshot import (
    global_latest_filter,
    latest_snapshot_window,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.session import ensure_parallelism
from location_summary_etl_spark.sources.registry import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# A3/A5: greatest-n-per-group (latest snapshot per key) -- the
# reference's 3-way-join argmax (App.scala:27-48), window formulation.
# r12: the orders scan is widened by the snapshot key (single-row-group
# file scans as ONE partition, so the per-custkey argmax otherwise runs
# serially in the scan stage; hash-partitioning by o_custkey REPLACES
# the exchange the window/aggregate needed).  Interleaved A/B
# (tools/ab_r12_scanwiden.py): 0.190 -> 0.168 and 0.231 -> 0.204 s
# (-11%) across two sessions.  No-op at production scale (file gate).
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = ensure_parallelism(_t(spark, sf_dir, "orders"), by="o_custkey")
    return latest_snapshot_window(orders, ["o_custkey"], "o_orderdate").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )


register("latest_order_per_customer", latest_order_per_customer, """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
FROM orders o
JOIN (SELECT o_custkey, MAX(o_orderdate) AS md FROM orders GROUP BY o_custkey) m
  ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.md
""")


# --------------------------------------------------------------------
# A6/A7: grand-total aggregate + uncorrelated scalar-subquery filter
# (``WHERE dd.date = (SELECT max_date ...)``, App.scala:57-75).
def global_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return global_latest_filter(orders, "o_orderdate").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )


register("global_latest_orders", global_latest_orders, """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
""")


# --------------------------------------------------------------------
# A5/B5/B6/B12: the classic pricing summary (TPC-H Q1 shape) -- filter,
# group-by, 8 aggregates, rounding. Partial aggregation map-side means
# the shuffle carries ~|groups| rows per partition at any scale.
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates run over EXACT integer units (functions/scalars.py
    fixed-point policy): quantity is integral, prices/discount/tax are
    2-decimal, so the discounted price is a scale-4 and the charge a
    scale-6 decimal -- every sum is an exact long sum (deterministic
    under any partitioning; a float sum is not), and the per-group
    division + rounding runs on identical integers in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    # r12: project the shared subexpressions once below the aggregate.
    # Inlined, the partial agg evaluated price*(1-discount) three times
    # per row (disc-price units, charge units, charge's SIGNUM) --
    # aggregate function children do not get the cross-expression CSE a
    # Project's codegen does.  _charge keeps the original association
    # (disc * (1 + tax)), so the doubles -- and the oracle hash -- are
    # bit-identical.  Interleaved A/B (tools/ab_r12_q1proj.py):
    # 0.681 -> 0.601 s (-12%).
    pre = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_disc"),
        )
        .withColumn("_charge", F.col("_disc") * (1 + F.col("l_tax")))
        .drop("l_tax")
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_fixed_point("l_quantity", 0, 2).alias("sum_qty"),
            sum_fixed_point("l_extendedprice", 2, 2).alias("sum_base_price"),
            sum_fixed_point(F.col("_disc"), 4, 2).alias("sum_disc_price"),
            sum_fixed_point(F.col("_charge"), 6, 2).alias("sum_charge"),
            avg_fixed_point("l_quantity", 0, 4).alias("avg_qty"),
            avg_fixed_point("l_extendedprice", 2, 4).alias("avg_price"),
            avg_fixed_point("l_discount", 2, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


register("pricing_summary", pricing_summary, f"""
SELECT l_returnflag, l_linestatus,
       {duckdb_sum_fixed('l_quantity', 0, 2)} AS sum_qty,
       {duckdb_sum_fixed('l_extendedprice', 2, 2)} AS sum_base_price,
       {duckdb_sum_fixed('l_extendedprice * (1 - l_discount)', 4, 2)} AS sum_disc_price,
       {duckdb_sum_fixed('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6, 2)} AS sum_charge,
       {duckdb_avg_fixed('l_quantity', 0, 4)} AS avg_qty,
       {duckdb_avg_fixed('l_extendedprice', 2, 4)} AS avg_price,
       {duckdb_avg_fixed('l_discount', 2, 4)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""")


# --------------------------------------------------------------------
# A8/A9/A10: conjunctive equality predicates + dim filter + narrow
# projection (the household-profile and state='DE' filters,
# App.scala:71-73, :106, :100-105). Filters are pushed to the parquet
# scan; nation/region are broadcast.
def segment_customers_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )


register("segment_customers_in_region", segment_customers_in_region, """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_mktsegment = 'BUILDING' AND r.r_name = 'ASIA'
""")


# --------------------------------------------------------------------
# A4/B2/B3: left outer join + NULL-tested conditional + date arithmetic
# (the nullable removed_date pattern, App.scala:161-169). Customers with
# no orders take the CASE's NULL branch.
def customer_order_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
        F.count("*").alias("order_cnt"),
    )
    joined = customer.join(
        per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
    )
    return joined.select(
        "c_custkey",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        F.when(F.col("last_order").isNull(), F.lit(-1))
        .otherwise(F.datediff("last_order", "first_order"))
        .alias("active_days"),
    )


register("customer_order_recency", customer_order_recency, """
SELECT c.c_custkey,
       COALESCE(o.order_cnt, 0) AS order_cnt,
       CASE WHEN o.last_order IS NULL THEN -1
            ELSE date_diff('day', o.first_order, o.last_order) END AS active_days
FROM customer c
LEFT JOIN (
    SELECT o_custkey,
           MAX(CAST(o_orderdate AS DATE)) AS last_order,
           MIN(CAST(o_orderdate AS DATE)) AS first_order,
           COUNT(*) AS order_cnt
    FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""")


# --------------------------------------------------------------------
# B7/B8: grand-total min/max broadcast into a 0-100 min-max score
# (App.scala:175-201), per-nation account balances.
def nation_balance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7/B8 through the STATS GATE (r9): minmax_score_auto picks the
    single-lineage window form while the lineage's source bytes stay
    provably small (customer is 312 KB at sf0.1 against the 8 MB
    bound, so the bench plan is the same window plan this entry always
    ran -- r8/r9 comparable by construction) and flips to the
    distributed broadcast form on unbounded inputs.  Gate behavior is
    plan-asserted in tests/test_plans.py."""
    customer = _t(spark, sf_dir, "customer")
    bal = customer.groupBy("c_nationkey").agg(
        # F.count(col) skips nulls -- preserves AVG's null semantics
        (F.sum(fixed_units("c_acctbal", 2))
         / (F.lit(100.0) * F.count("c_acctbal"))).alias("avg_bal"))
    return minmax_score_auto(bal, "avg_bal", "bal_score").select(
        "c_nationkey",
        round_portable("avg_bal", 2).alias("avg_bal"),
        round_portable("bal_score", 2).alias("bal_score"),
    )


register("nation_balance_score", nation_balance_score, """
WITH bal AS (
    SELECT c_nationkey,
           SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
               / (100.0 * COUNT(c_acctbal)) AS avg_bal
    FROM customer GROUP BY c_nationkey
),
b AS (SELECT MIN(avg_bal) AS mn, MAX(avg_bal) AS mx FROM bal)
SELECT c_nationkey,
       round(CAST(avg_bal AS DOUBLE), 2) AS avg_bal,
       round(CAST(CASE WHEN b.mx <> b.mn THEN (avg_bal - b.mn) / (b.mx - b.mn) * 100 END AS DOUBLE), 2) AS bal_score
FROM bal CROSS JOIN b
""")


# --------------------------------------------------------------------
# B6: programmatic multi-aggregate (avg(c) as avg_c splat,
# App.scala:212-214) over four lineitem measures.
def returnflag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = multi_avg(li, ["l_returnflag"],
                    ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                    fixed_scale=2)
    cols = [round_portable(c, 4).alias(c) for c in out.columns if c != "l_returnflag"]
    return out.select("l_returnflag", *cols)


register("returnflag_profile", returnflag_profile, """
SELECT l_returnflag,
       round(CAST(SUM(CAST(round((l_quantity) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(l_quantity)) AS DOUBLE), 4) AS avg_l_quantity,
       round(CAST(SUM(CAST(round((l_extendedprice) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(l_extendedprice)) AS DOUBLE), 4) AS avg_l_extendedprice,
       round(CAST(SUM(CAST(round((l_discount) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(l_discount)) AS DOUBLE), 4) AS avg_l_discount,
       round(CAST(SUM(CAST(round((l_tax) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(l_tax)) AS DOUBLE), 4) AS avg_l_tax
FROM lineitem
GROUP BY l_returnflag
""")


# --------------------------------------------------------------------
# A1/A2: the reference's CTE + fact-to-dim-date equi-join shape,
# expressed through the SQL API (spark.sql runs the same Catalyst
# pipeline as the DataFrame API).
def cte_latest_order_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql("""
        WITH max_snapshot AS (
            SELECT o_custkey, MAX(o_orderdate) AS max_date
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, m.max_date
        FROM customer c
        JOIN max_snapshot m ON c.c_custkey = m.o_custkey
    """)


register("cte_latest_order_sql", cte_latest_order_sql, """
WITH max_snapshot AS (
    SELECT o_custkey, MAX(o_orderdate) AS max_date
    FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, m.max_date
FROM customer c
JOIN max_snapshot m ON c.c_custkey = m.o_custkey
""")


# --------------------------------------------------------------------
# B2/B9: arithmetic + date-part derived columns (age_in_years and
# annualization at App.scala:166, :204-205).
def lineitem_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber",
        round_portable(revenue, 2).alias("revenue"),
        round_portable(revenue * (1 + F.col("l_tax")), 2).alias("charge"),
        F.year("l_shipdate").alias("ship_year"),
    )


register("lineitem_derived_columns", lineitem_derived_columns, """
SELECT l_orderkey, l_linenumber,
       round(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE), 2) AS revenue,
       round(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE), 2) AS charge,
       CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
""")


# --------------------------------------------------------------------
# B4/B10/B11: USING-style join (key deduplicated), drop of a duplicate
# column, and the reference's rename block (App.scala:248-253).
def customer_nation_renamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    nation = _t(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    return (
        customer.join(F.broadcast(nation), on="nationkey", how="inner")
        .drop("n_regionkey")
        .withColumnRenamed("c_name", "CUSTOMER_NAME")
        .withColumnRenamed("n_name", "NATION_NAME")
        .withColumnRenamed("c_acctbal", "ACCOUNT_BALANCE")
        .select("c_custkey", "CUSTOMER_NAME", "NATION_NAME", "ACCOUNT_BALANCE")
    )


register("customer_nation_renamed", customer_nation_renamed, """
SELECT c.c_custkey,
       c.c_name AS CUSTOMER_NAME,
       n.n_name AS NATION_NAME,
       c.c_acctbal AS ACCOUNT_BALANCE
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
""")


# --------------------------------------------------------------------
# A11: SELECT * passthrough across a join (App.scala:88 drags the
# joined dim's columns into the output).
def select_star_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return supplier.join(
        F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
    ).select("*")


register("select_star_passthrough", select_star_passthrough, """
SELECT s.*, n.*
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
""")


# --------------------------------------------------------------------
# Extension: window ranking (top-k per group). Absent from the
# reference (SURVEY §2.D) but its argmax is semantically a window;
# deterministic tie-break on the key.
#
# MEASURED FLOOR (r7, sf10 tier = 15M orders, local[32], min-of-4
# noop-sink interleaved).  Spark 4's InferWindowGroupLimit already
# plans the optimal distributed top-k-per-group: local sort -> PARTIAL
# WindowGroupLimit (each task keeps top-3 per nation) -> a <=2,400-row
# exchange -> final group-limit + row_number -- verified in the
# executed plan, so the shuffle is constant-size at any scale.  The
# time is join + per-task local sort: join-only 0.98 s, join +
# sortWithinPartitions 1.72 s ~= full query 1.69 s (the window itself
# is free).  Join strategy is not the lever: broadcast 1.59 /
# shuffle-hash 1.52 / sort-merge 1.44 s -- within 10%, so the
# declarative default stands (it auto-flips broadcast -> SMJ when
# customer outgrows the cap, the right call at warehouse scale).  A
# 3-chained-max_by rewrite would avoid the sort but scans the fact
# three times -- wrong at 100 TB.  Spark time is sublinear across
# tiers (0.28 -> 0.46 -> 1.62 s over 100x; ratio falls 9.09 -> 6.07 ->
# 3.15): the residue is single-node JVM sort throughput vs DuckDB's
# radix sort, and it parallelizes away with executors (per-task sort
# shrinks as splits multiply).
def top_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "rk", "o_orderkey", "o_totalprice")
    )


register("top_orders_per_nation", top_orders_per_nation, """
SELECT c_nationkey, rk, o_orderkey, o_totalprice
FROM (
    SELECT c.c_nationkey, o.o_orderkey, o.o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                              ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rk
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rk <= 3
""")


# --------------------------------------------------------------------
# Extension: global sort + limit with deterministic tie-break.
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


register("top_orders_global", top_orders_global, """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")


# --------------------------------------------------------------------
# Extension: rollup (multi-level aggregate) -- one-liner on top of the
# reference's hash-agg machinery (SURVEY §2.D "absent" list).
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the aggregate pushed BELOW the Expand: a bare
    ``rollup()`` over the joined fact triples every input row through
    the partial aggregate (Spark expands one row per grouping set
    before aggregating), so at 10x scale the grouping-set machinery
    processes 3 x |customer| rows to produce ~130 groups.  Aggregating
    to (r_name, n_name) grain FIRST and rolling up the 130-row result
    is the same relation -- count/sum are mergeable partial states, the
    exact mergeability the events_rollup_cascade entry proves -- and
    the Expand now costs 3 x 130 rows at ANY scale.  avg derives as
    sum/count at the edge (averaging averages would be wrong).
    Measured sf10: 0.33 -> 0.29 s (modest here -- the scan+join
    dominates at this tier); at 100 TB the win is 3x the fact volume
    through the widest aggregate.

    MEASURED FLOOR (r8, tools/decompose_r8.py, probe-bracketed quiet
    window [0.95, 0.95], min-of-4 interleaved, cumulative stages at
    sf10): customer (nationkey, acctbal) bare scan 0.052 s; + both
    broadcast dim joins 0.127 s; + the (r_name, n_name) hash
    aggregate 0.219 s; full query 0.237 s.  The rollup machinery
    (Expand over the 130-row pre-aggregate + merge) adds 0.018 s --
    8% -- so the 12.2x-vs-DuckDB deep ratio is scan + broadcast-probe
    + hash-agg fixed cost over 1.5M rows, flat across the 100x tier
    step (0.43 -> 0.36 s raw in BENCH_CROSSOVER) because that cost is
    bounded by input bytes, not grouping sets.  Nothing above the
    bare aggregate is removable; the aggregate itself is the query.
    """
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    full = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    # exact integer cents through BOTH aggregate levels (fixed-point
    # policy, functions/scalars.py): the partial per-(region, nation)
    # sums and the rollup's merge are long additions, so avg_bal is
    # deterministic and the final division runs on identical integers
    # in both engines.
    # _nn carries the NON-NULL count through the rollup so avg_bal
    # divides by COUNT(c_acctbal) like the oracle's duckdb_avg_fixed
    # (AVG null semantics); n_customers stays COUNT(*).
    base = full.groupBy("r_name", "n_name").agg(
        F.count("*").alias("_n"),
        F.count("c_acctbal").alias("_nn"),
        F.sum(fixed_units("c_acctbal", 2)).alias("_s"))
    return base.rollup("r_name", "n_name").agg(
        F.sum("_n").alias("n_customers"),
        round_portable(
            F.sum("_s") / (F.lit(100.0) * F.sum("_nn")), 2
        ).alias("avg_bal"),
    )


register("region_nation_rollup", region_nation_rollup, f"""
SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
       {duckdb_avg_fixed('c.c_acctbal', 2, 2)} AS avg_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""")


# --------------------------------------------------------------------
# Extension: set operations (absent from the reference, SURVEY §2.D).
def segment_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.exceptAll(urgent.distinct())


register("segment_without_urgent_orders", segment_without_urgent_orders, """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")


# --------------------------------------------------------------------
# Extension: distinct aggregate (absent from the reference).
def nation_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count("*").alias("n_customers"),
    )


register("nation_distinct_segments", nation_distinct_segments, """
SELECT c_nationkey,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
""")
