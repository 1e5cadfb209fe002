"""Slowly-changing-dimension (type 2) merge.

The reference's data model is snapshot-versioned facts over dimensions
(`snapshot_date_id` FKs resolved to the latest `dim_date` row --
/root/reference/src/main/scala/App.scala:27-36, 57-62): every load
appends a new snapshot and queries pick the newest.  SCD2 is the
complementary warehouse pattern the reference's Snowflake tables would
use for the dimensions themselves: instead of full snapshots, each key
keeps VERSIONED rows with [valid_from, valid_to) ranges and an open
(NULL valid_to) current row.

Spark has no MERGE INTO over plain parquet, so the operator expresses
the merge as ONE full-outer join on the business key plus three
projections of that join -- history rows pass through untouched:

    closed   = open rows whose attrs differ from the update -> close
               at eff_date
    carried  = open rows with no update / unchanged attrs -> unchanged
    opened   = changed or brand-new keys -> new open row at eff_date

Scale: the single shuffle is the key-partitioned full-outer join of
the OPEN slice against the update batch -- history (the bulk of an
SCD2 table) never moves.  Attribute comparison is null-safe (`<=>`)
so NULL -> value and value -> NULL transitions version correctly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(current: DataFrame, updates: DataFrame, key: str,
               attrs: list[str], eff_date: str,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Apply one SCD2 update batch; returns the full versioned table.

    ``current`` carries key + attrs + [valid_from, valid_to] (NULL
    valid_to = open row); ``updates`` carries key + attrs as of
    ``eff_date`` (an ISO date string).

    PRECONDITION: ``updates`` must be unique per business key -- a
    duplicate key would fan out through the full-outer join and emit
    conflicting closed/open version rows (two open rows for one key),
    corrupting the dimension silently.  The operator enforces it
    deterministically rather than trusting the caller: updates are
    reduced to one row per key, keeping the FIRST row under an
    ordering by all attribute values (NULLs first).  The dedupe is a
    keyed window over the (small) update batch, not the dimension, so
    it adds no shuffle beyond the merge join's own key partitioning.
    """
    if not attrs:
        raise ValueError("scd2_merge: attrs must be non-empty")
    eff = F.lit(eff_date).cast("date")
    out_cols = [key, *attrs, valid_from, valid_to]

    history = current.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    open_rows = current.filter(F.col(valid_to).isNull())

    from pyspark.sql import Window

    one_per_key = Window.partitionBy(key).orderBy(
        *[F.col(a).asc_nulls_first() for a in attrs]
    )
    upd = (
        updates.withColumn("_rn", F.row_number().over(one_per_key))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key).alias("_u_key"),
            *[F.col(a).alias(f"_u_{a}") for a in attrs],
        )
    )
    j = open_rows.join(upd, F.col(key) == F.col("_u_key"), "full")

    changed: Column = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"_u_{a}")) for a in attrs],
    )
    has_cur = F.col(key).isNotNull()
    has_upd = F.col("_u_key").isNotNull()

    closed = j.filter(has_cur & has_upd & changed).select(
        key, *attrs, F.col(valid_from), eff.alias(valid_to)
    )
    carried = j.filter(has_cur & (~has_upd | ~changed)).select(*out_cols)
    opened = j.filter(has_upd & (~has_cur | changed)).select(
        F.col("_u_key").alias(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        eff.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    )
    return history.unionByName(closed).unionByName(carried).unionByName(opened)
