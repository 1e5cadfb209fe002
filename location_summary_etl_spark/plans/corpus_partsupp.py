"""TPC-H Q2/Q20 shapes over a SYNTHETIC partsupp relation.

The driver's testdata has no partsupp table (TESTDATA.md), which
blocked the two TPC-H shapes whose operator content lives nowhere
else: Q2's min-cost-supplier correlated MIN subquery over a
four-table correlated inner block, and Q20's nested semi-join chain
(IN -> IN -> correlated scalar aggregate).  partsupp is therefore
DERIVED, deterministically and identically in both engines, from the
tables that do exist:

- (part x 4) supplier assignment uses dbgen's own formula
  ``suppkey = (p + i*(S/4 + p/S)) mod S`` (integer division, i in
  0..3, 0-based keys like the testdata), de-duplicated because small
  S admits collisions dbgen's sf>=1 sizes don't;
- ``ps_availqty`` (1..9999) and ``ps_supplycost`` (1.00..999.99) come
  from the portable md5 hash family (functions/scalars.py), so every
  generated cell is bit-identical between Spark and the DuckDB oracle
  -- the same no-RNG-state discipline as the synthdocs source, and
  safe against task retries / partitioning changes at any scale.

The generator is SQL text shared by both engines up to dialect
(``div`` vs ``//``, ``explode`` vs ``UNNEST``); the corpus entries
prepend it as a CTE so the whole plan -- generation included -- stays
lazy, distributed, and oracle-paired.  Generation is one narrow
DISTINCT shuffle of (partkey, suppkey) pairs; at 100 TB a dimension
build like this runs once and lands in the warehouse, but nothing in
the plan requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import register_views

# Shared numeric constants (both dialects are rendered from these).
_AVAIL_MOD = 9999
_COST_MOD = 99900

_SPARK_PARTSUPP_CTE = f"""
s AS (SELECT COUNT(*) AS cnt FROM supplier),
ps_keys AS (
    SELECT DISTINCT p_partkey AS ps_partkey,
           (p_partkey + i * ((s.cnt div 4) + (p_partkey div s.cnt))) % s.cnt
               AS ps_suppkey
    FROM part CROSS JOIN s
    LATERAL VIEW explode(array(0, 1, 2, 3)) t AS i
),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           1 + (CAST(conv(substr(md5(concat_ws('|', 'psa', ps_partkey,
                ps_suppkey)), 1, 8), 16, 10) AS BIGINT) % {_AVAIL_MOD})
               AS ps_availqty,
           CAST(100 + (CAST(conv(substr(md5(concat_ws('|', 'psc', ps_partkey,
                ps_suppkey)), 1, 8), 16, 10) AS BIGINT) % {_COST_MOD})
               AS DOUBLE) / 100.0 AS ps_supplycost
    FROM ps_keys
)
"""

_DUCKDB_PARTSUPP_CTE = f"""
s AS (SELECT COUNT(*) AS cnt FROM supplier),
ps_keys AS (
    SELECT DISTINCT p_partkey AS ps_partkey,
           (p_partkey + i * ((s.cnt // 4) + (p_partkey // s.cnt))) % s.cnt
               AS ps_suppkey
    FROM part CROSS JOIN s CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(i)
),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           CAST(1 + (CAST('0x' || substr(md5(concat_ws('|', 'psa', ps_partkey,
                ps_suppkey)), 1, 8) AS BIGINT) % {_AVAIL_MOD}) AS BIGINT)
               AS ps_availqty,
           CAST(100 + (CAST('0x' || substr(md5(concat_ws('|', 'psc', ps_partkey,
                ps_suppkey)), 1, 8) AS BIGINT) % {_COST_MOD})
               AS DOUBLE) / 100.0 AS ps_supplycost
    FROM ps_keys
)
"""

# ------------------------------------------------ Q2: min-cost supplier
Q2_SIZE = 5
Q2_REGION = "EUROPE"

# Body is dialect-free; only the partsupp CTE differs.  The correlated
# MIN subquery carries its own four-table join (partsupp -> supplier ->
# nation -> region): Catalyst decorrelates it into an aggregate over
# the region-filtered partsupp keyed on ps_partkey plus a join back --
# one pass over the generated relation, never a per-row re-execution.
# ps_supplycost equality across the two blocks is safe: every cost is
# (100+k)/100.0 computed by the same IEEE ops on both sides of the
# comparison (and both engines), so min == value compares exactly.
_Q2_BODY = f"""
SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
       ps_supplycost AS min_supplycost
FROM partsupp
JOIN part     ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = {Q2_SIZE} AND r_name = '{Q2_REGION}'
  AND ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p_partkey AND r2.r_name = '{Q2_REGION}')
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (SURVEY.md §8): cheapest in-region supplier per
    qualifying part, via a correlated MIN over the synthetic partsupp."""
    register_views(spark, sf_dir,
                   ["part", "supplier", "nation", "region"])
    return spark.sql(f"WITH {_SPARK_PARTSUPP_CTE} {_Q2_BODY}")


register("min_cost_supplier", min_cost_supplier,
         f"WITH {_DUCKDB_PARTSUPP_CTE} {_Q2_BODY}")


# --------------------------------------- Q20: excess-stock semi-join chain
Q20_NATION = "NATION_3"
Q20_PART_PREFIX = "small"
Q20_FROM, Q20_TO = "1996-01-01", "1997-01-01"

# IN (IN (...)) + correlated scalar SUM: Spark rewrites the IN chain to
# left-semi joins and decorrelates the SUM into a grouped aggregate on
# (l_partkey, l_suppkey) joined back to partsupp -- lineitem is read
# once, filtered by shipdate at the scan.  A pair with no shipped
# lineitems yields NULL > comparison -> excluded (TPC-H semantics,
# identical in DuckDB).
_Q20_BODY = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (
            SELECT p_partkey FROM part
            WHERE p_name LIKE '{Q20_PART_PREFIX}%')
        AND ps_availqty > 0.5 * (
            SELECT SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
              AND l_shipdate <  TIMESTAMP '{Q20_TO}'))
"""


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (SURVEY.md §8): suppliers in one nation holding
    more than half a year's shipped volume of prefix-named parts."""
    register_views(spark, sf_dir,
                   ["part", "supplier", "nation", "lineitem"])
    return spark.sql(f"WITH {_SPARK_PARTSUPP_CTE} {_Q20_BODY}")


register("excess_stock_suppliers", excess_stock_suppliers,
         f"WITH {_DUCKDB_PARTSUPP_CTE} {_Q20_BODY}")
