from location_summary_etl_spark.functions.scalars import (
    portable_hash32,
    portable_hash60,
    round_portable,
)

__all__ = ["portable_hash32", "portable_hash60", "round_portable"]
