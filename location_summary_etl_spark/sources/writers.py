"""Sinks (SURVEY §2 B15).

The reference appends to a warehouse table
(/root/reference/src/main/scala/App.scala:265-270), which duplicates
rows on re-run. Our default is overwrite-by-partition (idempotent
re-runs: a snapshot rerun replaces exactly its own partition via
dynamic partition overwrite); plain append is available for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_summary(df: DataFrame, path: str, mode: str = "overwrite_partitions",
                  partition_by: list[str] | None = None) -> None:
    """Write a summary table to parquet.

    - ``overwrite_partitions`` (default): dynamic partition overwrite --
      only the partitions present in ``df`` are replaced. Requires
      ``partition_by``.
    - ``append``: reference-parity blind append.
    - ``overwrite``: full-table replace.
    """
    if mode == "overwrite_partitions":
        if not partition_by:
            raise ValueError("overwrite_partitions requires partition_by")
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
    elif mode in ("append", "overwrite"):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    else:
        raise ValueError(f"unknown write mode {mode!r}")


def write_bucketed(df: DataFrame, table: str, path: str, bucket_by: str,
                   n_buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Write ``df`` as an external bucketed table (hash-bucketed on
    ``bucket_by`` into ``n_buckets`` files per partition).

    Bucketing is the co-located-join lever at 100 TB: two tables
    bucketed the same way join with ZERO shuffle (Catalyst sees the
    matching ``HashPartitioning`` from the bucket spec -- asserted in
    tests/test_operators.py), and bucket pruning serves point lookups
    on the bucket key.  Requires ``saveAsTable`` (the bucket spec lives
    in the catalog, not the parquet footer).
    """
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_by)
    )
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
