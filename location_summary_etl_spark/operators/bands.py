"""Banded-dimension classification: compile a small static band table
into a Catalyst expression instead of joining against it.

The generic range join (``orders_price_banded``) is a broadcast
nested-loop: every probe row evaluates every band predicate -- O(N*B)
and a real join operator in the plan.  When the band table is (a)
small, (b) non-overlapping, and (c) fixed for the duration of the job
-- the normal case for price tiers, age brackets, SLA buckets -- the
scale-right formulation is to COLLECT the bands once on the driver and
compile them into a single CASE expression: the classification becomes
a pure map fused into whole-stage codegen with the scan, no join node,
no broadcast memory, no per-band predicate re-evaluation (the CASE
short-circuits).  This is the reference's collect-then-literal move
(App.scala:175-185) applied to a dimension instead of an aggregate.

Overlapping bands must keep the join formulation (a row may match
several); ``compile_bands`` asserts non-overlap rather than silently
picking one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_COMPILED_BANDS = 1000  # beyond this, use the join formulation


def compile_bands(bands: DataFrame, band_col: str = "band",
                  lo_col: str = "lo", hi_col: str = "hi") -> list[tuple]:
    """Collect and validate a (band, lo, hi] table for compilation."""
    rows = [(r[band_col], r[lo_col], r[hi_col]) for r in bands.collect()]
    return validate_band_rows(rows)


def validate_band_rows(rows: list[tuple]) -> list[tuple]:
    """Validate already-materialized (band, lo, hi) rows for compilation.

    The entry point when the band table is a literal in the job config
    rather than a relation: compiling from the constant skips the
    createDataFrame -> collect round trip (a full Spark job + two
    Python<->JVM transfers) that ``compile_bands`` pays, which at bench
    scale is larger than the query itself.
    """
    rows = [tuple(r) for r in rows]
    if len(rows) > MAX_COMPILED_BANDS:
        raise ValueError(
            f"{len(rows)} bands; compile_bands is for small static "
            "dimensions -- use the broadcast range join instead")
    rows.sort(key=lambda t: t[1])
    for (_, _, prev_hi), (_, lo, _) in zip(rows, rows[1:]):
        if lo < prev_hi:
            raise ValueError("overlapping bands; a row may match several "
                             "-- keep the join formulation")
    return rows


def band_expr(rows: list[tuple], value: Column | str) -> Column:
    """CASE-chain classifying ``value`` into its band (NULL if none).

    lo inclusive, hi exclusive -- same semantics as the range join.
    """
    v = F.col(value) if isinstance(value, str) else value
    expr = F.lit(None).cast("string")
    # Build from the last band backwards so the first (lowest) band is
    # the outermost WHEN -- evaluation short-circuits low-to-high.
    for band, lo, hi in reversed(rows):
        expr = F.when((v >= F.lit(lo)) & (v < F.lit(hi)), F.lit(band)) \
            .otherwise(expr)
    return expr
