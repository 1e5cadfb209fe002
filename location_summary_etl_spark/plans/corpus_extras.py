"""Extension corpus: the operator categories SURVEY.md §2.D records as
*absent* from the reference ("absent kinds still come free with
df.join(how=...)" / "cube/rollup/approx_count_distinct are one-liners")
-- demonstrated here as first-class, oracle-paired queries so the
coverage checklist has a line item per category:

- set ops: UNION ALL, INTERSECT (EXCEPT ALL lives in corpus_reference)
- join kinds: left semi, left anti, full outer
- grouping sets via CUBE
- non-equi range join (banded theta join on a numeric interval)
- approximate sketches (HLL distinct, approximate quantiles) --
  estimator internals are engine-specific, so the oracle checks the
  deterministic ACCURACY CONTRACT (estimate within rtol of exact,
  asserted in-plan) plus exact companion columns
- BPE-ish regexp token counting (north-star text analysis item)

Everything stays in built-in Catalyst expressions; dimension sides of
joins are broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    avg_fixed_point,
    fixed_units,
    round_portable,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Set op: UNION ALL of two branch projections (same shape both engines).
def union_customer_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    c = customer.select(
        F.lit("customer").alias("kind"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
    )
    s = supplier.select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("int").alias("nationkey"),
    )
    return c.unionByName(s)


register("union_customer_supplier_names", union_customer_supplier_names, """
SELECT 'customer' AS kind, c_name AS name, CAST(c_nationkey AS INT) AS nationkey FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_name AS name, CAST(s_nationkey AS INT) AS nationkey FROM supplier
""")


# --------------------------------------------------------------------
# Set op: INTERSECT (distinct semantics) -- nations that have BOTH
# customers and suppliers.
def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").cast("int").alias("nationkey"))
        .intersect(
            supplier.select(F.col("s_nationkey").cast("int").alias("nationkey"))
        )
    )


register("nations_with_both", nations_with_both, """
SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
""")


# --------------------------------------------------------------------
# Left SEMI join: customers with at least one urgent order.  The build
# side is only probed for existence -- no fan-out, no urgent columns in
# the output (the scalable EXISTS).
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


register("customers_with_urgent_orders", customers_with_urgent_orders, """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""")


# --------------------------------------------------------------------
# Left ANTI join: customers with no urgent orders (the scalable NOT
# EXISTS; contrast with corpus_reference's EXCEPT ALL formulation of
# the same predicate).
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer["c_custkey"] == urgent["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


register("customers_without_urgent_orders", customers_without_urgent_orders, """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""")


# --------------------------------------------------------------------
# FULL OUTER join: per-nation customer and supplier counts, keeping
# nations that appear on only one side (NULL-padded, coalesced).
def full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").cast("int").alias("nk_c")).agg(
        F.count("*").alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").cast("int").alias("nk_s")).agg(
        F.count("*").alias("n_suppliers")
    )
    return c.join(s, c["nk_c"] == s["nk_s"], "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


register("full_outer_nation_counts", full_outer_nation_counts, """
WITH c AS (SELECT CAST(c_nationkey AS INT) AS nk, COUNT(*) AS n_customers
           FROM customer GROUP BY 1),
     s AS (SELECT CAST(s_nationkey AS INT) AS nk, COUNT(*) AS n_suppliers
           FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""")


# --------------------------------------------------------------------
# CUBE: all grouping-set combinations of (brand, size-class) -- the
# grouping-sets family member rollup doesn't cover.
def part_brand_size_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    size_class = F.when(F.col("p_size") < 25, F.lit("small")).otherwise(
        F.lit("large")
    )
    return (
        part.withColumn("size_class", size_class)
        .cube("p_brand", "size_class")
        .agg(
            F.count("*").alias("n_parts"),
            # exact-cents average (fixed-point policy, scalars.py)
            avg_fixed_point("p_retailprice", 2, 2).alias("avg_price"),
        )
    )


register("part_brand_size_cube", part_brand_size_cube, """
SELECT p_brand,
       CASE WHEN p_size < 25 THEN 'small' ELSE 'large' END AS size_class,
       COUNT(*) AS n_parts,
       round(CAST(SUM(CAST(round((p_retailprice) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(p_retailprice)) AS DOUBLE), 2) AS avg_price
FROM part
GROUP BY CUBE (p_brand, size_class)
""")


# --------------------------------------------------------------------
# Non-equi RANGE join: price-band dimension joined on an interval
# predicate.  The band table is tiny and broadcast, so the theta join
# is a broadcast-nested-loop over |orders| x |bands| -- the scalable
# shape for banded range joins (never a shuffled cartesian).
PRICE_BANDS = [  # (band, lo, hi) -- hi exclusive
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 1_000_000_000.0),
]


def orders_price_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = orders.join(
        F.broadcast(bands),
        (orders["o_totalprice"] >= bands["lo"]) & (orders["o_totalprice"] < bands["hi"]),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        avg_fixed_point("o_totalprice", 2, 2).alias("avg_price"),
    )


_BAND_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

register("orders_price_banded", orders_price_banded, f"""
WITH bands(band, lo, hi) AS (VALUES {_BAND_VALUES})
SELECT band, COUNT(*) AS n_orders,
       round(CAST(SUM(CAST(round((o_totalprice) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(o_totalprice)) AS DOUBLE), 2) AS avg_price
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""")


# --------------------------------------------------------------------
# Approximate sketches: HLL++ distinct and approximate quantiles.
# Estimator OUTPUTS differ engine-to-engine by design, so the raw
# values cannot hash-match a DuckDB oracle.  The oracle-able statement
# is the estimator's ACCURACY CONTRACT: both sketches are
# deterministic for a fixed input, so "estimate within rtol of exact"
# is a stable boolean.  The query computes sketch AND exact aggregates
# in ONE plan (HLL++ partial-merge + GK quantile sketch still execute
# -- the plan shape a t-digest/KLL rollup would ship at 100 TB, where
# the exact companions would be dropped) and emits the exact values
# plus the interval assertions; the oracle emits the same exacts with
# TRUE literals.  Tolerances: HLL++ default rsd=0.05, asserted at 3
# sigma (15%); percentile_approx at accuracy=10000 has relative rank
# error 1e-4, asserted with an exact-percentile band at rank +/-0.02
# -- generous at any SF, tight enough that a broken estimator fails.
def orders_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("_hll"),
        F.count_distinct(F.col("o_custkey")).alias("exact_customers"),
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10_000)
        .alias("_pq"),
        F.expr("percentile(o_totalprice, array(0.48D, 0.52D, 0.93D, 0.97D))")
        .alias("_px"),
        F.count("*").alias("n_orders"),
    )
    in_band = lambda approx, lo, hi: (
        (approx >= F.element_at("_px", lo)) & (approx <= F.element_at("_px", hi))
    )
    return agg.select(
        "o_orderpriority",
        "exact_customers",
        "n_orders",
        (F.abs(F.col("_hll") - F.col("exact_customers"))
         <= 0.15 * F.col("exact_customers")).alias("hll_within_3sigma"),
        in_band(F.element_at("_pq", 1), 1, 2).alias("p50_in_rank_band"),
        in_band(F.element_at("_pq", 2), 3, 4).alias("p95_in_rank_band"),
    )


register("orders_approx_stats", orders_approx_stats, """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       TRUE AS hll_within_3sigma,
       TRUE AS p50_in_rank_band,
       TRUE AS p95_in_rank_band
FROM orders GROUP BY o_orderpriority
""")


# --------------------------------------------------------------------
# BPE-ish regexp token counting (north star: "token counting
# (whitespace + a BPE-ish regex)").  Pattern splits letter runs, digit
# runs, and single punctuation -- the shape of a GPT-2-style pre-
# tokenizer -- identical under Java regex and DuckDB's RE2 for this
# class of pattern.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


# --------------------------------------------------------------------
# Analytic window functions (running frames + lag) -- the window-family
# members ranking (top_orders_per_nation) doesn't cover.  One shuffle
# on the partition key; the running frame is computed in the sorted
# pass, no self-join.
def customer_order_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.filter(F.col("o_custkey") % 100 == 0)  # thin, deterministic slice
        .select(
            "o_custkey", "o_orderkey",
            # running frame over exact cents (fixed-point policy):
            # identical integers accumulate on both engines at every
            # frame position, whatever their frame evaluation strategy
            round_portable(
                F.sum(fixed_units("o_totalprice", 2)).over(running)
                / F.lit(100.0), 2
            ).alias("running_total"),
            F.row_number().over(w).alias("order_seq"),
            round_portable(
                F.col("o_totalprice")
                - F.lag("o_totalprice", 1).over(w), 2
            ).alias("delta_vs_prev"),
        )
    )


register("customer_order_running_totals", customer_order_running_totals, """
SELECT o_custkey, o_orderkey,
       round(CAST(SUM(CAST(round((o_totalprice) * 100, 0) AS BIGINT))
                      OVER w_run / 100.0 AS DOUBLE), 2) AS running_total,
       CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
       round(CAST(o_totalprice - LAG(o_totalprice, 1) OVER w AS DOUBLE), 2) AS delta_vs_prev
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")


def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return docs.select(F.col("doc_id"), pieces.alias("_p")).select(
        "doc_id",
        F.size("_p").alias("n_bpe_tokens"),
        F.size(F.array_distinct("_p")).alias("n_unique_bpe_tokens"),
    )


register("text_bpe_token_counts", text_bpe_token_counts, f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{BPE_PATTERN}'))) AS INT)
           AS n_unique_bpe_tokens
FROM documents
""")


# ------------------------------------------------- bitmap exact distinct
def orders_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct customers per order status via mergeable bitmaps
    (the exact-count sibling of events_sketch_rollup's HLL): keys map
    to (bucket, bit position), each (status, bucket) aggregates a
    fixed-size bitmap, and distinct = sum of per-bucket popcounts.
    Unlike COUNT(DISTINCT) -- whose shuffle carries every distinct key
    -- the bitmap shuffle carries one <=4 KB blob per (group, bucket),
    and the same bitmaps OR-merge into the global row without
    rescanning: a rollup tree with exact answers."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderstatus",
        F.bitmap_bucket_number("o_custkey").alias("bucket"),
        F.bitmap_bit_position("o_custkey").alias("pos"),
    )
    per_bucket = b.groupBy("o_orderstatus", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    per_status = per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.bitmap_count("bm")).alias("n_customers")
    )
    total = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_customers"))
        .select(F.lit("__all__").alias("o_orderstatus"), "n_customers")
    )
    return per_status.unionByName(total)


register("orders_bitmap_distinct", orders_bitmap_distinct, """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT '__all__' AS o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
""")


# ------------------------------------------------- edit-distance pairs
LEV_MAX = 2


def nation_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All nation-name pairs within Levenshtein distance 2 -- the
    string-metric dedup primitive (entity resolution on short keys).
    Broadcast self-cross of a dimension: fine for dimensions, never for
    facts -- fact-scale fuzzy matching goes through the blocked
    operators in operators/dedup.py, with edit distance as the
    in-bucket verifier."""
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .select(
            "name_a", "name_b",
            F.levenshtein("name_a", "name_b").alias("distance"),
        )
        .filter(F.col("distance") <= LEV_MAX)
    )


register("nation_name_fuzzy_pairs", nation_name_fuzzy_pairs, f"""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS distance
FROM nation a JOIN nation b ON a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= {LEV_MAX}
""")


# ------------------------------------- modern argmax/conditional aggregates
def nation_order_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer nation: the order holding the max/min total price
    (``max_by``/``min_by`` -- the declarative argmax the reference's
    greatest-n-per-group CTE hand-rolls, App.scala:27-48) plus a
    conditional count (``count_if``).  All three are ordinary
    partial+final aggregates: the shuffle carries one (value, payload)
    pair per group per partition, never a window's full row stream.

    The argmax RANKS BY A STRUCT -- (o_totalprice, o_orderkey) -- not
    the bare price: equal prices are then broken by key, so the
    payload is deterministic under ties at any scale.  The bare-price
    form relied on prices being tie-free, which held in the base
    testdata but not generally (the r11 sf1 soak's replicated tier
    carries every price 10x and the entry's answer became
    partition-order-dependent -- on a real cluster the same query
    would return different keys run to run).  The oracle expresses
    the identical semantics as a struct max/min (DuckDB's arg_max
    cannot rank by a composite)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("priciest_order"),
            F.min_by(
                "o_orderkey", F.struct("o_totalprice", "o_orderkey")
            ).alias("cheapest_order"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count("*").alias("n_orders"),
        )
    )


register("nation_order_extremes", nation_order_extremes, """
SELECT n_name,
       struct_extract(max({'p': o_totalprice, 'k': o_orderkey}), 'k')
           AS priciest_order,
       struct_extract(min({'p': o_totalprice, 'k': o_orderkey}), 'k')
           AS cheapest_order,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""")


def orders_price_banded_compiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as orders_price_banded through the compiled-CASE
    formulation (operators/bands.py): the static band dimension is
    collected once and fused into the scan as a CASE chain -- a pure
    map with NO join operator, the right plan when bands are small,
    static, and non-overlapping.  The oracle keeps the join SQL: equal
    output is exactly the claim.

    MEASURED FLOOR (r7, sf10 tier = 15M orders, min-of-4 noop-sink):
    full query 0.19 s vs a bare count over the same single column
    0.115 s -- the plan has nothing left to remove (scan one column,
    CASE, 6-group hash agg; no join, no wide shuffle), so the ~3x sf10
    ratio is the JVM scan + per-row CASE-eval throughput against
    DuckDB's vectorized scan.  Spark time is near-flat across tiers
    (0.151 -> 0.172 -> 0.19-0.234 s over 100x; ratio falls 11.2 ->
    9.7 -> 3.6): the floor signature."""
    from location_summary_etl_spark.operators.bands import (
        band_expr, validate_band_rows)

    orders = _t(spark, sf_dir, "orders")
    # PRICE_BANDS is a literal: compile straight from the constant.
    # Round-tripping it through createDataFrame().collect() would cost
    # a full Spark job before the query even starts (measured ~0.2 s of
    # the 0.39 s bench time); compile_bands stays for true relations.
    rows = validate_band_rows(PRICE_BANDS)
    return (
        orders.select(band_expr(rows, "o_totalprice").alias("band"),
                      "o_totalprice")
        .filter(F.col("band").isNotNull())
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            avg_fixed_point("o_totalprice", 2, 2).alias("avg_price"),
        )
    )


register("orders_price_banded_compiled", orders_price_banded_compiled, f"""
WITH bands(band, lo, hi) AS (VALUES {_BAND_VALUES})
SELECT band, COUNT(*) AS n_orders,
       round(CAST(SUM(CAST(round((o_totalprice) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(o_totalprice)) AS DOUBLE), 2) AS avg_price
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""")


def segment_right_outer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join coverage (the one join kind the corpus lacked):
    orders RIGHT JOIN customer keeps order-less customers as NULL fact
    rows; the aggregate counts them per market segment.  Catalyst plans
    it as the mirrored left-outer with the preserved side swapped --
    the point of the entry is that the NULL-extension semantics and
    the plan both come out right when the preserved side is the
    build/right input."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(customer, orders["o_custkey"] == customer["c_custkey"],
                    "right")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count_distinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("n_orderless_customers"),
        )
    )


register("segment_right_outer_coverage", segment_right_outer_coverage, """
SELECT c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
           AS n_orderless_customers
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")


def customer_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((n_name), (c_mktsegment)) — the
    non-hierarchical member of the grouping-sets family (rollup and
    cube are covered elsewhere; neither can express two disjoint
    single-column sets in one pass).  Uses Spark 4's DataFrame
    ``groupingSets`` API; one ExpandExec feeds one aggregate, so both
    summaries cost a single scan + shuffle.  grouping_id disambiguates
    the NULL-extended rows exactly as DuckDB's GROUPING()."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    )
    return (
        j.groupingSets(
            [["n_name"], ["c_mktsegment"]], "n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_customers"),
            avg_fixed_point("c_acctbal", 2, 2).alias("avg_acctbal"),
        )
    )


register("customer_grouping_sets", customer_grouping_sets, """
SELECT n_name, c_mktsegment,
       CAST(GROUPING(n_name, c_mktsegment) AS INT) AS gid,
       COUNT(*) AS n_customers,
       round(CAST(SUM(CAST(round((c_acctbal) * 100, 0) AS BIGINT))
                  / (100.0 * COUNT(c_acctbal)) AS DOUBLE), 2) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
""")
