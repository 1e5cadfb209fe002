"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline at sf0.001; ``queries`` /
``oracle_sql`` expose the full operator corpus (SURVEY.md §2 plus the
LLM-pipeline extensions) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from location_summary_etl_spark.plans import corpus
from location_summary_etl_spark.plans.flagship import flagship_nation_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    corpus._pin_session_semantics(spark)
    return flagship_nation_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    return corpus.oracle_sql()
