"""Portable scalar column expressions.

These exist because the oracle gate compares Spark results bit-for-bit
(after the driver's normalization) against DuckDB on the same data, so
every scalar that appears in an output column must compute the *same
double* in both engines.

``round_portable``
    Spark's ``F.round`` on doubles routes through the shortest decimal
    string (``BigDecimal.valueOf``), so ``round(4201.315, 2)`` -> 4201.32
    while DuckDB (std half-away-from-zero on the scaled binary value)
    gives 4201.31.  We emulate the C-library semantics with
    ``sign(x) * floor(|x| * 10^n + 0.5) / 10^n`` -- verified equal to
    DuckDB's DOUBLE round on tie, negative-tie, and representability
    probes.  The reference's display rounding is round(_, 2)
    (/root/reference/src/main/scala/App.scala:254-261).

``portable_hash32`` / ``portable_hash60``
    Deterministic cross-engine string hashes built from md5 hex
    prefixes: Spark ``conv(substr(md5(x),1,k),16,10)`` equals DuckDB
    ``CAST('0x'||substr(md5(x),1,k) AS BIGINT)``.  k=8 -> 32 bits,
    k=15 -> 60 bits (fits signed int64).  These power MinHash, SimHash,
    LSH banding, and fingerprinting with exact oracle parity; they are
    pure Catalyst expressions (JVM-side, codegen'd -- no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_portable(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10 ** scale))
    return (F.signum(c) * F.floor(F.abs(c) * p + F.lit(0.5)) / p).cast("double")


def portable_hash32(col: Column | str) -> Column:
    """32-bit hash of a string column, reproducible in DuckDB as
    ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def portable_hash60(col: Column | str) -> Column:
    """60-bit hash of a string column, reproducible in DuckDB as
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


# DuckDB-side templates for the same expressions (kept adjacent so the
# two definitions evolve together).
DUCKDB_HASH32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"
DUCKDB_HASH60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
DUCKDB_ROUND = "round(CAST({x} AS DOUBLE), {n})"
