"""Recursive-CTE corpus: iterative computation expressed natively in
SQL (Spark 4.1 ``WITH RECURSIVE``), complementing the driver-loop
formulation in operators/graph.py.

Spark's recursive CTE executes as a UnionLoop: the anchor runs once,
then each iteration joins the previous step's output against the
(static) step relation until a fixpoint (empty step) -- the same
round-per-join structure ``connected_components`` drives from Python,
but scheduled inside one plan with no driver round-trips or
localCheckpoint lineage management.  Spark currently supports only
``UNION ALL`` recursion (no dedup between rounds), so the corpus
query is an ACYCLIC walk -- per-customer order chains, where each hop
is that customer's strictly-later next order -- which visits every row
exactly once by construction.  Cyclic closures (the dedup_clusters
component search) still need the driver loop or a UNION-capable
engine; the oracle for dedup_clusters shows that exact contrast.

Scale: each iteration is one equi-join of the frontier against the
successor relation, partitioned on the join key; total work is
O(sum of chain lengths) rows across all iterations -- the frontier
shrinks as chains end, and state never exceeds the longest chain's
round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table

CHAIN_GAP_DAYS = 90


def customer_order_chain_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of order-chain lengths: a chain is a maximal run of
    a customer's consecutive orders each placed within 90 days of the
    previous one.  Successor edges come from one window pass (lead on
    (custkey, orderdate, orderkey)); the recursive CTE walks the chains
    from their start orders, and the result is the chain-length
    histogram."""
    orders = load_table(spark, sf_dir, "orders")

    # Size the recursion's row cap to the input, don't trust the
    # default.  Spark guards every recursive CTE with
    # ``spark.sql.cteRecursionRowLimit`` (default 1M rows summed
    # across all iterations) -- at sf1 the walk legitimately exceeds
    # it (found by the r11 full-corpus soak: 1.5M orders, and the
    # acyclic walk emits each order exactly once, anchor + hops), and
    # at 100 TB any fixed constant is wrong for a walk whose legal
    # output is O(|orders|).  Each order appears in at most one chain
    # at exactly one depth, so 2x|orders| strictly bounds anchor+hop
    # rows; keeping the cap at that bound (instead of -1) preserves
    # the runaway-recursion safety net -- a cycle bug would still trip
    # it.  The count is a parquet metadata-only aggregate (no data
    # scan).  Session conf, set where the plan is declared: the limit
    # is enforced at execution time, which happens after this
    # function returns the lazy frame.
    cap = 2 * orders.count() + 16
    cur = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if 0 <= cur < cap:  # -1 means unlimited: never narrow it
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(cap))

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    succ = (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("next_key", F.lead("o_orderkey").over(w))
        .withColumn("next_date", F.lead("o_orderdate").over(w))
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .select(
            "o_orderkey",
            # hop forward only if the next order is within the gap
            F.when(
                F.datediff("next_date", "o_orderdate") <= CHAIN_GAP_DAYS,
                F.col("next_key"),
            ).alias("hop_key"),
            # a chain STARTS where there is no in-gap predecessor
            (
                F.col("prev_date").isNull()
                | (F.datediff("o_orderdate", "prev_date") > CHAIN_GAP_DAYS)
            ).alias("is_start"),
        )
    )
    succ.createOrReplaceTempView("order_succ")
    return spark.sql("""
        WITH RECURSIVE chain(start_key, cur_key, depth) AS (
            SELECT o_orderkey, o_orderkey, 1
            FROM order_succ WHERE is_start
            UNION ALL
            SELECT c.start_key, s.hop_key, c.depth + 1
            FROM chain c JOIN order_succ s ON c.cur_key = s.o_orderkey
            WHERE s.hop_key IS NOT NULL
        ),
        lengths AS (
            SELECT start_key, MAX(depth) AS chain_len
            FROM chain GROUP BY start_key
        )
        SELECT chain_len, COUNT(*) AS n_chains
        FROM lengths GROUP BY chain_len
    """)


register("customer_order_chain_lengths", customer_order_chain_lengths, f"""
WITH RECURSIVE succ AS (
    SELECT o_custkey, o_orderkey, o_orderdate,
           lead(o_orderkey) OVER w AS next_key,
           lead(o_orderdate) OVER w AS next_date,
           lag(o_orderdate) OVER w AS prev_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
edges AS (
    SELECT o_orderkey,
           CASE WHEN date_diff('day', o_orderdate, next_date)
                     <= {CHAIN_GAP_DAYS}
                THEN next_key END AS hop_key,
           (prev_date IS NULL OR
            date_diff('day', prev_date, o_orderdate) > {CHAIN_GAP_DAYS})
               AS is_start
    FROM succ
),
chain(start_key, cur_key, depth) AS (
    SELECT o_orderkey, o_orderkey, 1 FROM edges WHERE is_start
    UNION ALL
    SELECT c.start_key, e.hop_key, c.depth + 1
    FROM chain c JOIN edges e ON c.cur_key = e.o_orderkey
    WHERE e.hop_key IS NOT NULL
),
lengths AS (
    SELECT start_key, MAX(depth) AS chain_len FROM chain GROUP BY start_key
)
SELECT chain_len, COUNT(*) AS n_chains
FROM lengths GROUP BY chain_len
""")


# ---------------------------------------------------------------- pagerank
PR_ITERATIONS = 3
PR_DAMPING = 0.85


def supplier_customer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier->customer shipment graph (an edge per
    distinct supplier/customer pair that shares a lineitem): which
    customers sit downstream of the most diversified suppliers.  The
    fixed-iteration driver loop builds ONE lazy plan (operators/graph.py
    ``pagerank``); the oracle unrolls the same three iterations as
    chained CTEs -- iterative-algorithm parity, not just aggregates."""
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.operators.graph import pagerank

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        )
    )
    pr = pagerank(edges, "src", "dst",
                  iterations=PR_ITERATIONS, damping=PR_DAMPING)
    return pr.select("node", round_portable("rank", 8).alias("rank"))


def _pr_iteration(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
    SELECT nd.node,
           {1.0 - PR_DAMPING} / nd.n
               + {PR_DAMPING} * COALESCE(SUM(p.rank / od.deg), 0) AS rank
    FROM nodes_n nd
    LEFT JOIN edges e ON e.dst = nd.node
    LEFT JOIN {prev} p ON p.node = e.src
    LEFT JOIN outdeg od ON od.src = e.src
    GROUP BY nd.node, nd.n
)"""


register("supplier_customer_pagerank", supplier_customer_pagerank, f"""
WITH edges AS (
    SELECT DISTINCT 's:' || l_suppkey AS src, 'c:' || o_custkey AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ncnt AS (SELECT COUNT(*) AS n FROM nodes),
nodes_n AS (SELECT node, (SELECT CAST(n AS DOUBLE) FROM ncnt) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes_n),
{_pr_iteration('r0', 'r1')},
{_pr_iteration('r1', 'r2')},
{_pr_iteration('r2', 'r3')}
SELECT node, round(rank, 8) AS rank FROM r3
""")
