"""Extended SQL/API-surface corpus: Python UDTF, LATERAL correlated
subquery, MapType mid-plan algebra, and two more composite star shapes
(TPC-H Q7 / Q18 analogues).

The reference's surface is plain projections/joins/aggregates pushed
into a warehouse (/root/reference/src/main/scala/App.scala:22-165); the
entries here cover the table-function, lateral-correlation, and
map-typed corners of the engine that a user of Spark SQL would also
reach for (SURVEY §2.D "absent" categories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    fixed_units,
    round_portable,
    sum_units,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table, register_views

CHUNK_TOKENS = 40


# ------------------------------------------------------------------
# Python UDTF: one input doc row -> one row per fixed-size word chunk.
# A UDTF is the Spark-4 extensibility point for set-returning logic
# (vs scalar UDF / pandas UDF); the engine plans it as a Generate over
# a Python evaluation, so it composes with LATERAL like any built-in
# generator.  Per-row Python is the slow path (SURVEY §2.D) -- the
# production chunker is the pure-Catalyst corpus_chunk_documents; this
# entry exists to cover the UDTF API with oracle-exact semantics.
class _ChunkWords:
    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), CHUNK_TOKENS):
            ck = toks[i : i + CHUNK_TOKENS]
            yield doc_id, i // CHUNK_TOKENS, len(ck), " ".join(ck)


def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into CHUNK_TOKENS-word windows via a
    registered Python UDTF invoked as a SQL table function in a
    LATERAL position."""
    from pyspark.sql.functions import udtf

    register_views(spark, sf_dir, ["documents"])
    spark.udtf.register(
        "chunk_words_udtf",
        udtf(_ChunkWords,
             returnType="doc_id bigint, chunk_idx int, n_toks int, chunk string"),
    )
    return spark.sql("""
        SELECT t.doc_id, t.chunk_idx, t.n_toks, t.chunk
        FROM documents d, LATERAL chunk_words_udtf(d.doc_id, d.text) t
    """)


register("doc_chunks_udtf", doc_chunks_udtf, f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
c AS (
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           tk[(i * {CHUNK_TOKENS} + 1):least((i + 1) * {CHUNK_TOKENS}, len(tk))] AS ck
    FROM toks,
         UNNEST(generate_series(
             0, CAST(ceil(len(tk) / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) AS t(i)
)
SELECT doc_id, chunk_idx, CAST(len(ck) AS INT) AS n_toks,
       array_to_string(ck, ' ') AS chunk
FROM c
""")


# ------------------------------------------------------------------
# LATERAL correlated subquery: per-nation top-2 orders, written as the
# SQL-standard lateral join (the subquery re-evaluates per outer row;
# Catalyst decorrelates the LIMIT via a partitioned row_number, so the
# physical plan is ONE window pass over the join -- no per-row
# re-execution survives optimization).
def nation_top2_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["nation", "customer", "orders"])
    return spark.sql("""
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM nation n,
        LATERAL (
            SELECT o.o_orderkey, o.o_totalprice
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 2
        ) t
    """)


register("nation_top2_orders_lateral", nation_top2_orders_lateral, """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n,
LATERAL (
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 2
) t
""")


# ------------------------------------------------------------------
# MapType mid-plan: per-doc token-count MAP built with
# map_from_entries, consumed with map algebra (size / element_at /
# aggregate over map_values).  Result columns stay scalar -- the
# driver's canonicalizer hashes cells, and maps/arrays are the one
# thing it cannot hash (round-1 lesson) -- so the map lives strictly
# inside the plan.
def doc_token_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from location_summary_etl_spark.session import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        # hash-widened on doc_id (r12): both downstream aggregates
        # (groupBy(doc_id, tok), groupBy(doc_id)) reuse the
        # partitioning -- two exchanges deleted
        ensure_parallelism(docs.select("doc_id", "text"), by="doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    mapped = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("tok", "cnt")))
        ).alias("m")
    )
    max_cnt = F.aggregate(
        F.map_values("m"), F.lit(0).cast("bigint"),
        lambda acc, x: F.greatest(acc, x),
    )
    return mapped.select(
        "doc_id",
        F.size("m").alias("n_distinct_toks"),
        F.element_at("m", "the").alias("the_count"),
        max_cnt.alias("max_tok_count"),
    )


register("doc_token_map_stats", doc_token_map_stats, """
WITH c AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ) GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_distinct_toks,
       MAX(CASE WHEN tok = 'the' THEN cnt END) AS the_count,
       MAX(cnt) AS max_tok_count
FROM c GROUP BY doc_id
""")


# ------------------------------------------------------------------
# TPC-H Q7 analogue: bilateral shipping volume between two nations by
# ship year.  The two-nation filter lands on the BROADCAST nation dim
# joined into supplier and customer, so both fact inputs are pruned to
# the pair's slice before the fact-fact join; the only wide exchange
# is orders |><| lineitem on the order key.
Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    pair = nation.filter(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    supp = supplier.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("c_nk"),
                                F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")

    return (
        lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(round_portable(
            # exact scale-4 units (fixed-point policy, scalars.py;
            # DECIMAL(38,0)-widened accumulator via sum_units)
            sum_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            / F.lit(10000.0), 2
        ).alias("revenue"))
    )


register("nation_pair_volume", nation_pair_volume, f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 10000, 0) AS BIGINT))
                  / 10000.0 AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n2.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, l_year
""")


# ------------------------------------------------------------------
# TPC-H Q18 analogue: large-volume orders.  The HAVING aggregate over
# lineitem is the only wide shuffle; the qualifying order set is tiny
# by construction (tail of the quantity distribution), so it
# BROADCASTS back onto orders, and the customer lookup is a broadcast
# dim join -- the fact table is never joined wide.
Q18_QTY = 250


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    big = (
        lineitem.groupBy("l_orderkey")
        # quantities are integral: the exact long sum makes the HAVING
        # cut deterministic (fixed-point policy, scalars.py)
        .agg(F.sum(fixed_units("l_quantity", 0)).alias("qty_sum"))
        .filter(F.col("qty_sum") > Q18_QTY)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice", "qty_sum",
        )
    )


register("large_quantity_orders", large_quantity_orders, f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice, qty_sum
FROM (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_QTY}
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""")


# ------------------------------------------------------------------
# SQL pipe syntax (Spark 4): the linear FROM ... |> WHERE ... |>
# AGGREGATE composition form.  Same Catalyst plan as the nested
# SELECT -- the entry pins that the pipe parser path produces
# oracle-identical semantics (DuckDB has no pipe syntax; the oracle is
# the classic formulation, which is exactly the point).
def orders_pipe_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority x year order rollup written in SQL pipe syntax; the
    rounding runs as a DataFrame post-projection (round_portable) so
    display rounding matches DuckDB."""
    register_views(spark, sf_dir, ["orders"])
    df = spark.sql("""
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |> EXTEND CAST(year(o_orderdate) AS INT) AS o_year
        |> AGGREGATE COUNT(*) AS n_orders,
                    SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS sum_cents
           GROUP BY o_orderpriority, o_year
    """)
    return df.select(
        "o_orderpriority", "o_year", "n_orders",
        round_portable(F.col("sum_cents") / F.lit(100.0), 2).alias("sum_price"),
    )


register("orders_pipe_rollup", orders_pipe_rollup, """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INT) AS o_year,
       COUNT(*) AS n_orders,
       round(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 2) AS sum_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY 1, 2
""")


# ------------------------------------------------------------------
# Parameterized SQL (Spark 4 named-parameter binding): the injection-
# safe way to template a query -- parameters bind as literals in the
# parser, so Catalyst constant-folds and PUSHES them to the scan like
# any literal (no plan-cache-miss string concatenation).
PARAM_PRIO = "1-URGENT"
PARAM_FLOOR = 50_000.0


def orders_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order stats per status for one priority class and a price
    floor, with both predicates bound as named SQL parameters."""
    register_views(spark, sf_dir, ["orders"])
    df = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS sum_cents
        FROM orders
        WHERE o_orderpriority = :prio AND o_totalprice >= :floor
        GROUP BY o_orderstatus
        """,
        args={"prio": PARAM_PRIO, "floor": PARAM_FLOOR},
    )
    return df.select(
        "o_orderstatus", "n_orders",
        round_portable(F.col("sum_cents") / F.lit(100.0), 2).alias("sum_price"),
    )


register("orders_param_sql", orders_param_sql, f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       round(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 2) AS sum_price
FROM orders
WHERE o_orderpriority = '{PARAM_PRIO}' AND o_totalprice >= {PARAM_FLOOR}
GROUP BY o_orderstatus
""")
