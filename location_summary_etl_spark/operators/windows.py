"""Event-time window operators (batch formulations).

The reference is batch-only (SURVEY §2.D); these are the extension
operators a training-data pipeline needs over an events stream table.
Buckets are computed with portable epoch arithmetic (floor of epoch
seconds) rather than engine-specific windowing functions so the DuckDB
oracle reproduces them exactly; the Structured Streaming variants in
``streaming/jobs.py`` use native ``F.window``/watermarks.

Bucketing is a pure projection (no shuffle) -- the only shuffle in a
windowed aggregate is the groupBy on (bucket, dims), which AQE can
coalesce.  Sessionization is one window function pass per user: shuffle
on user_id, sort by ts -- the canonical formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(ts_col: Column | str) -> Column:
    """Naive-timestamp epoch seconds (double, fractional part kept)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return c.cast("timestamp").cast("double")


def tumbling_bucket(ts_col: Column | str, width_s: int) -> Column:
    """Start (epoch seconds, BIGINT) of the ``width_s`` tumbling window."""
    return (
        (F.floor(epoch_seconds(ts_col) / width_s) * width_s).cast("bigint")
    )


def sliding_buckets(ts_col: Column | str, width_s: int,
                    slide_s: int) -> Column:
    """Array of window-start epochs covering the event (width/slide
    overlapping windows).  Explode the result to assign each event to
    every window it belongs to."""
    if width_s % slide_s != 0:
        raise ValueError("width must be a multiple of slide")
    n = width_s // slide_s
    anchor = F.floor(epoch_seconds(ts_col) / slide_s)
    return F.array(
        *[((anchor - j) * slide_s).cast("bigint") for j in range(n)]
    )


def sessionize(events: DataFrame, user_col: str, ts_col: str,
               gap_s: int) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    to the previous event exceeds ``gap_s`` seconds.

    Returns the input plus ``session_id`` (0-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = epoch_seconds(ts_col) - epoch_seconds(F.lag(ts_col).over(w))
    new_session = F.when(gap.isNull() | (gap <= gap_s), 0).otherwise(1)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
