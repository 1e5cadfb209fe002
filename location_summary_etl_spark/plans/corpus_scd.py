"""SCD2 dimension-maintenance corpus entry.

Derives a deterministic update batch from the testdata itself (so both
engines see identical inputs): customers who ever placed a 1-URGENT
order get their account balance bumped by 100.00 as of the effective
date, everyone else is re-asserted unchanged, and one brand-new
business key (-1) exercises the insert path.  The merge is
operators/scd.py's single full-outer-join formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.operators.scd import scd2_merge
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table

SCD_BASE_DATE = "1995-01-01"
SCD_EFF_DATE = "1998-06-01"


def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned customer dimension after one SCD2 batch: urgent-order
    customers close their old row at the effective date and open a new
    one with the bumped balance; a synthetic key -1 inserts fresh."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    current = customer.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit(SCD_BASE_DATE).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey").distinct()
    )
    updates = (
        customer.join(
            urgent, customer["c_custkey"] == urgent["o_custkey"], "left"
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.when(F.col("o_custkey").isNotNull(),
                   F.col("c_acctbal") + F.lit(100.0))
            .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .unionByName(
            spark.range(1).select(
                F.lit(-1).cast("long").alias("c_custkey"),
                F.lit("SYNTH").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    return scd2_merge(
        current, updates, "c_custkey",
        ["c_mktsegment", "c_acctbal"], SCD_EFF_DATE,
    )


register("customer_scd2_merge", customer_scd2_merge, f"""
WITH cur AS (
    SELECT c_custkey, c_mktsegment, c_acctbal,
           DATE '{SCD_BASE_DATE}' AS valid_from,
           CAST(NULL AS DATE) AS valid_to
    FROM customer
),
urgent AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
upd AS (
    SELECT c.c_custkey, c.c_mktsegment,
           CASE WHEN u.o_custkey IS NOT NULL THEN c.c_acctbal + 100.0
                ELSE c.c_acctbal END AS c_acctbal
    FROM customer c LEFT JOIN urgent u ON c.c_custkey = u.o_custkey
    UNION ALL
    SELECT -1, 'SYNTH', 0.0
),
j AS (
    SELECT cur.c_custkey AS k, cur.c_mktsegment AS m, cur.c_acctbal AS b,
           cur.valid_from, upd.c_custkey AS uk, upd.c_mktsegment AS um,
           upd.c_acctbal AS ub,
           (cur.c_mktsegment IS DISTINCT FROM upd.c_mktsegment
            OR cur.c_acctbal IS DISTINCT FROM upd.c_acctbal) AS changed
    FROM cur FULL JOIN upd ON cur.c_custkey = upd.c_custkey
)
SELECT k AS c_custkey, m AS c_mktsegment, b AS c_acctbal,
       valid_from, DATE '{SCD_EFF_DATE}' AS valid_to
FROM j WHERE k IS NOT NULL AND uk IS NOT NULL AND changed
UNION ALL
SELECT k, m, b, valid_from, CAST(NULL AS DATE)
FROM j WHERE k IS NOT NULL AND (uk IS NULL OR NOT changed)
UNION ALL
SELECT uk, um, ub, DATE '{SCD_EFF_DATE}', CAST(NULL AS DATE)
FROM j WHERE uk IS NOT NULL AND (k IS NULL OR changed)
""")
