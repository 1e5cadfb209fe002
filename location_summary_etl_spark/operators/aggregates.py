"""Aggregation operators (SURVEY §2: A5, A6, B5, B6, B7).

All of these compile to Catalyst partial+final HashAggregate -- the
map-side combine means the shuffle carries one row per (partition,
group), which is what keeps a 100 TB group-by tractable.  Nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def avg_by(df: DataFrame, keys: list[str], col: str, alias: str) -> DataFrame:
    """GroupBy + single AVG -- the reference's per-location averages
    (/root/reference/src/main/scala/App.scala:172-174, 188-190, 208-209)."""
    return df.groupBy(*keys).agg(F.avg(col).alias(alias))


def multi_avg(df: DataFrame, keys: list[str], cols: list[str],
              fixed_scale: int | None = None) -> DataFrame:
    """Programmatic multi-aggregate: ``avg(c) as avg_c`` for each c --
    the reference's List[Column] splat
    (/root/reference/src/main/scala/App.scala:212-214).

    ``fixed_scale=s`` computes each average over exact 10^s integer
    units (fixed-point policy, functions/scalars.py) -- right when
    every column is a fixed-scale decimal of at most that scale;
    ``None`` keeps the plain float avg for real-valued columns."""
    if fixed_scale is None:
        return df.groupBy(*keys).agg(
            *[F.avg(c).alias(f"avg_{c}") for c in cols]
        )
    from location_summary_etl_spark.functions.scalars import fixed_units
    p = float(10 ** fixed_scale)
    return df.groupBy(*keys).agg(
        *[(F.sum(fixed_units(c, fixed_scale)) / (F.lit(p) * F.count(c)))
          .alias(f"avg_{c}") for c in cols]
    )


def global_min_max(df: DataFrame, col: str) -> DataFrame:
    """Grand-total MIN/MAX as a 1-row DataFrame (the reference collects
    this with ``.first`` -- /root/reference/src/main/scala/App.scala:175-179,
    191-195; we keep it distributed and let callers broadcast it)."""
    return df.agg(
        F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}")
    )
