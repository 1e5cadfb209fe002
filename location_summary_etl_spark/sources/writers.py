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
