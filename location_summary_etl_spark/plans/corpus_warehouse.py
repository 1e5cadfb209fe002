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
