"""Warehouse-connector round trip: the reference's B1/B15 structural
parity entry (SURVEY.md §2), end to end through a NON-FILE source/sink.

The reference's whole job is: read six warehouse relations via pushed
SQL queries, transform, append one summary table back to the warehouse
(/root/reference/src/main/scala/App.scala:22-50, 265-270).  This entry
replays that life-cycle against the ``duckwarehouse`` Python Data
Source (sources/warehouse.py): build a per-nation summary from the
parquet star schema, WRITE it through the connector's staged-commit
sink, then READ it back through the connector's pushdown query with a
JDBC-style partitioned scan -- the returned DataFrame's lineage starts
at the warehouse, not at parquet, so the correctness gate certifies
the full write -> warehouse -> partitioned-read cycle against a DuckDB
oracle that recomputes the summary directly from the base tables.

The balance sum is carried as integer CENTS (bigint) end to end --
per-row half-away rounding then an exact integer sum -- so the value
that survives the round trip is summation-order-independent and
byte-identical across engines (the Q9 cancellation lesson,
corpus_tpch2.py).  Repeated invocations are idempotent: the write runs
in overwrite mode (CREATE OR REPLACE inside the commit transaction).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table
from location_summary_etl_spark.sources.warehouse import register_warehouse


def _wh_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"spark_graft_wh_{tag}.duckdb")


def _fresh_dir(kind: str, sf_dir: str) -> str:
    """Per-invocation scratch directory for life-cycle entries.

    A fixed ``/tmp/spark_graft_<kind>_<sf>`` path is shared across runs
    and concurrent invocations -- a prior crash or parallel evaluation
    can leave foreign files visible to the read-back (the one class of
    explanation for r4's locally-irreproducible driver hash-red on
    ``merge_upsert_orders``).  Instead: a ``mkdtemp`` under a per-kind
    root, with an age-gated best-effort sweep of stale siblings (>10
    min old is never a concurrently-running evaluation)."""
    import shutil
    import time

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{kind}_runs_{tag}")
    os.makedirs(root, exist_ok=True)
    now = time.time()
    for entry in os.listdir(root):
        full = os.path.join(root, entry)
        try:
            if now - os.path.getmtime(full) > 600:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            pass
    return tempfile.mkdtemp(dir=root)


def warehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_warehouse(spark)
    db = _wh_path(sf_dir)

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = (
        F.signum("c_acctbal")
        * F.floor(F.abs(F.col("c_acctbal")) * F.lit(100.0) + F.lit(0.5))
    ).cast("long")
    summary = (
        customer.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(cents).alias("acctbal_cents"),
        )
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_nationkey", "n_name", "n_customers", "acctbal_cents")
    )
    (summary.write.format("duckwarehouse")
        .option("path", db)
        .option("table", "nation_summary")
        .mode("overwrite")
        .save())

    # Read back THROUGH the warehouse: pushdown query (filter runs in
    # the warehouse engine, as the reference's six loads do) +
    # JDBC-style range partitioning on the nation key.
    return (spark.read.format("duckwarehouse")
            .option("path", db)
            .option("query",
                    "SELECT n_nationkey, n_name, n_customers, acctbal_cents"
                    " FROM nation_summary WHERE n_customers > 0")
            .option("partition_column", "n_nationkey")
            .option("num_partitions", "4")
            .option("lower_bound", "0")
            .option("upper_bound", "25")
            .load())


register("warehouse_roundtrip", warehouse_roundtrip, """
SELECT n_nationkey, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(CASE WHEN c_acctbal >= 0
                          THEN floor(c_acctbal * 100.0 + 0.5)
                          ELSE -floor(-c_acctbal * 100.0 + 0.5)
                     END AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
HAVING COUNT(*) > 0
""")


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE life-cycle (sources/writers.merge_upsert): seed a
    per-(priority, month) order summary from the pre-1997 slice, then
    merge a late-arriving recompute of months >= 1996-06 built over the
    FULL table -- overlapping months are updated in place, 1997+ months
    are inserted, and only the touched priority partitions are
    rewritten (copy-on-write).  The read-back after the merge is the
    oracle-checked result, so the gate certifies the merge semantics
    end to end: months < 1996-06 must still carry pre-1997 numbers,
    months >= 1996-06 the full-table numbers.  Both phases run on
    every invocation (seed is a full overwrite), so the entry is
    deterministic and idempotent under re-runs.

    Money is integer CENTS end to end (exact sums, hash-stable).

    The merge target lives in a PER-INVOCATION ``tempfile.mkdtemp()``
    directory (r4 hardening): the previous fixed ``/tmp`` path was
    shared across runs and concurrent invocations, so a prior crash or
    a parallel evaluation could leave foreign files in the read-back
    glob -- the one class of explanation for the r4 driver's
    locally-irreproducible hash mismatch.  Because the read-back DF is
    lazily returned, cleanup cannot happen here; the seed data is
    persisted through a count() so every file the result needs exists
    before return, and stale dirs from prior invocations are swept
    eagerly (best-effort, age-gated so a concurrent run is untouched)."""
    from location_summary_etl_spark.sources.writers import merge_upsert

    path = _fresh_dir("merge", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * F.lit(100.0) + F.lit(0.5))
    ).cast("long")

    def summarize(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col("o_orderpriority").alias("priority"),
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                cents.alias("cents"),
            )
            .groupBy("priority", "month")
            .agg(F.count("*").alias("n_orders"),
                 F.sum("cents").alias("total_cents"))
        )

    base = summarize(orders.filter(F.col("o_orderdate") < "1997-01-01"))
    # Seed: full overwrite (re-run safe), partitioned by priority.
    base.write.mode("overwrite").partitionBy("priority").parquet(path)

    updates = summarize(orders).filter(F.col("month") >= "1996-06")
    # partition (priority) is part of the key, so partition-stability
    # holds by construction -- the discovery shortcut is sound here.
    merge_upsert(spark, updates, path, keys=["priority", "month"],
                 partition_by="priority", collect_metrics=False,
                 assume_partition_stable=True)
    got = spark.read.parquet(path)
    # Layout-independent read-back (r5 verdict): aggregate through an
    # explicit groupBy of the merge keys instead of trusting
    # file-granular row identity, with an in-plan uniqueness guard --
    # if any stale/duplicate file ever contributes a second row for a
    # key, the query fails loudly rather than hash-diverging silently.
    return (
        got.groupBy("priority", "month")
        .agg(F.count("*").alias("_n"),
             F.max("n_orders").alias("n_orders"),
             F.max("total_cents").alias("total_cents"))
        .select(
            "priority", "month",
            F.when(F.col("_n") == 1, F.col("n_orders"))
            .otherwise(F.raise_error(
                "merge read-back found duplicate rows for a key"))
            .alias("n_orders"),
            # Guard BOTH output columns (r6 advice): if a future edit
            # prunes n_orders, total_cents must still fail loudly on
            # duplicates instead of silently yielding MAX().
            F.when(F.col("_n") == 1, F.col("total_cents"))
            .otherwise(F.raise_error(
                "merge read-back found duplicate rows for a key"))
            .alias("total_cents"),
        )
    )


register("merge_upsert_orders", merge_upsert_orders, """
WITH cents AS (
    SELECT o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m') AS month,
           o_orderdate,
           CAST(CASE WHEN o_totalprice >= 0
                     THEN floor(o_totalprice * 100.0 + 0.5)
                     ELSE -floor(-o_totalprice * 100.0 + 0.5)
                END AS BIGINT) AS c
    FROM orders
),
base AS (
    SELECT priority, month, COUNT(*) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS total_cents
    FROM cents WHERE o_orderdate < DATE '1997-01-01'
    GROUP BY priority, month
),
upd AS (
    SELECT priority, month, COUNT(*) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS total_cents
    FROM cents GROUP BY priority, month
    HAVING month >= '1996-06'
)
SELECT priority, month, n_orders, total_cents FROM base
WHERE NOT EXISTS (SELECT 1 FROM upd
                  WHERE upd.priority = base.priority
                    AND upd.month = base.month)
UNION ALL
SELECT priority, month, n_orders, total_cents FROM upd
""")


def versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse-format life-cycle (sources/versioned.VersionedTable):
    commit the pre-1996 order slice as v0, append 1996+ as v1, then
    aggregate BOTH versions through time-travel reads -- v0 must see
    only the first commit even though v1 exists (snapshot isolation is
    what the oracle checks: the 'v0' rows replay the date filter, the
    'v1' rows the full table).  The table is rebuilt from scratch per
    invocation (per-invocation mkdtemp -- no cross-run or concurrent
    state can touch the read-back), so re-runs are deterministic."""
    from location_summary_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(os.path.join(_fresh_dir("vt", sf_dir), "table"))

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    t.commit(orders.filter(F.col("o_orderdate") < "1996-01-01"))
    t.commit(orders.filter(F.col("o_orderdate") >= "1996-01-01"))

    def agg(df: DataFrame, version: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.max(F.col("o_orderdate").cast("string")).alias("max_date"),
        ).withColumn("version", F.lit(version))

    return agg(t.read(spark, version=0), "v0").unionByName(
        agg(t.read(spark), "v1"))


register("versioned_time_travel", versioned_time_travel, """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(MAX(o_orderdate) AS VARCHAR) AS max_date,
       'v0' AS version
FROM orders WHERE o_orderdate < DATE '1996-01-01'
GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(MAX(o_orderdate) AS VARCHAR) AS max_date,
       'v1' AS version
FROM orders
GROUP BY o_orderpriority
""")


def versioned_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC over the lakehouse format: seed v0 with the orders slice
    whose key ends in 0-8, MERGE a deterministic update set (keys
    ending in 3 get +100 cents, keys ending in 9 are new inserts, keys
    ending in 6 are flagged deletes), then reconstruct the row-level
    change feed from the manifest file diff with
    ``VersionedTable.changes(0, keys=...)``.  The merge rewrites WHOLE
    affected files (copy-on-write), so the raw file diff contains
    every carried neighbor row too -- the oracle passing proves the
    netting cancels exactly the carried rows and classifies the rest
    (update pre/post images, inserts, deletes) from content + key
    alone.  Money is integer cents; the table lives in a
    per-invocation mkdtemp (r4 discipline)."""
    from location_summary_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(os.path.join(_fresh_dir("cdc", sf_dir), "table"))
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * F.lit(100.0) + F.lit(0.5))
    ).cast("long")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        cents.alias("cents"),
    )
    last = F.col("o_orderkey") % 10
    t.commit(base.filter(last != 9), mode="overwrite")
    updates = (
        base.filter(last.isin(3, 6, 9))
        .withColumn("cents",
                    F.when(last == 6, F.col("cents"))
                    .otherwise(F.col("cents") + 100))
        .withColumn("is_delete", last == 6)
    )
    t.merge(spark, updates, keys=["o_orderkey"], delete_col="is_delete")
    return t.changes(spark, 0, keys=["o_orderkey"])


register("versioned_change_feed", versioned_change_feed, """
WITH c AS (
    SELECT o_orderkey,
           o_orderpriority AS priority,
           CAST(CASE WHEN o_totalprice >= 0
                     THEN floor(o_totalprice * 100.0 + 0.5)
                     ELSE -floor(-o_totalprice * 100.0 + 0.5)
                END AS BIGINT) AS cents
    FROM orders
)
SELECT o_orderkey, priority, cents, 'update_preimage' AS _change_type
FROM c WHERE o_orderkey % 10 = 3
UNION ALL
SELECT o_orderkey, priority, cents + 100, 'update_postimage'
FROM c WHERE o_orderkey % 10 = 3
UNION ALL
SELECT o_orderkey, priority, cents + 100, 'insert'
FROM c WHERE o_orderkey % 10 = 9
UNION ALL
SELECT o_orderkey, priority, cents, 'delete'
FROM c WHERE o_orderkey % 10 = 6
""")


def versioned_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance through the CDC feed
    -- the reason a change feed exists.  A summary S0 is aggregated
    from v0; a MERGE (updates + inserts + flagged deletes, the
    change-feed entry's exact mutation set) produces v1; S1 is then
    computed WITHOUT touching v1's data: the keyed feed collapses to
    per-group deltas (insert/update_postimage add, delete/
    update_preimage subtract -- count and sum are abelian-group
    aggregates, so pre/post pairs transfer rows between groups
    exactly), and S0 + delta is the maintained view.  The oracle
    recomputes the same summary FROM SCRATCH on v1's logical state, so
    the hash gate certifies the incremental algebra end to end.  At
    100 TB this is the difference between re-aggregating the table and
    aggregating the delta."""
    from location_summary_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(os.path.join(_fresh_dir("ivm", sf_dir), "table"))
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        F.signum("o_totalprice")
        * F.floor(F.abs(F.col("o_totalprice")) * F.lit(100.0) + F.lit(0.5))
    ).cast("long")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        cents.alias("cents"),
    )
    last = F.col("o_orderkey") % 10
    t.commit(base.filter(last != 9), mode="overwrite")
    s0 = t.read(spark, 0).groupBy("priority").agg(
        F.count("*").alias("n_orders"), F.sum("cents").alias("total_cents"))
    updates = (
        base.filter(last.isin(3, 6, 9))
        .withColumn("cents",
                    F.when(last == 6, F.col("cents"))
                    .otherwise(F.col("cents") + 100))
        .withColumn("is_delete", last == 6)
    )
    t.merge(spark, updates, keys=["o_orderkey"], delete_col="is_delete")

    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (t.changes(spark, 0, 1, keys=["o_orderkey"])
             .groupBy("priority")
             .agg(F.sum(sign).alias("_dn"),
                  F.sum(sign * F.col("cents")).alias("_dc")))
    s1 = (s0.join(delta, "priority", "full_outer")
          .select(
              "priority",
              (F.coalesce("n_orders", F.lit(0))
               + F.coalesce("_dn", F.lit(0))).alias("n_orders"),
              (F.coalesce("total_cents", F.lit(0))
               + F.coalesce("_dc", F.lit(0))).alias("total_cents"))
          .filter(F.col("n_orders") > 0))
    return s1


# Oracle recomputes v1's logical state from scratch: deletes (key %10
# = 6) gone, updates/inserts (%10 in (3, 9)) carry +100 cents.
register("versioned_incremental_agg", versioned_incremental_agg, """
WITH c AS (
    SELECT o_orderkey,
           o_orderpriority AS priority,
           CAST(CASE WHEN o_totalprice >= 0
                     THEN floor(o_totalprice * 100.0 + 0.5)
                     ELSE -floor(-o_totalprice * 100.0 + 0.5)
                END AS BIGINT) AS cents
    FROM orders
),
v1 AS (
    SELECT priority,
           CASE WHEN o_orderkey % 10 IN (3, 9)
                THEN cents + 100 ELSE cents END AS cents
    FROM c WHERE o_orderkey % 10 <> 6
)
SELECT priority, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM v1 GROUP BY priority
""")


def versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution under the oracle gate: v0 commits a
    two-column nation summary, v1 appends rows carrying a NEW column
    -- the manifest-pinned read resolves v0's files with the evolved
    schema, so pre-evolution rows surface the new column as NULL (the
    lakehouse semantics, replayed by the oracle's CASE)."""
    from location_summary_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(os.path.join(_fresh_dir("ev", sf_dir), "table"))

    nation = load_table(spark, sf_dir, "nation")
    old_half = nation.filter(F.col("n_nationkey") < 12).select(
        "n_nationkey", "n_name")
    new_half = nation.filter(F.col("n_nationkey") >= 12).select(
        "n_nationkey", "n_name",
        F.col("n_regionkey").alias("region_key"))
    t.commit(old_half)
    t.commit(new_half, mode="append")
    return t.read(spark).select("n_nationkey", "n_name", "region_key")


register("versioned_schema_evolution", versioned_schema_evolution, """
SELECT n_nationkey, n_name,
       CASE WHEN n_nationkey >= 12 THEN n_regionkey END AS region_key
FROM nation
""")
