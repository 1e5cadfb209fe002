"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL job (AidanFarhi/location-summary-etl,
surveyed in SURVEY.md), re-expressed Spark-first and extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
    session     -- SparkSession factory (AQE, UTC, Arrow, tuned shuffle)
    sources     -- table registry (explicit schemas) + writers
    functions   -- portable scalar/vector/text column expressions
    operators   -- one well-named function per operator family
    plans       -- composed pipelines + the oracle query corpus
    streaming   -- Structured Streaming jobs over the events table
"""

from location_summary_etl_spark.session import get_session

__version__ = "0.11.0"

__all__ = ["get_session", "__version__"]
