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


# ------------------------------------------------------------------
# Exact fixed-point aggregation (r11).
#
# A float SUM/AVG is partition-order-dependent: at cluster scale the
# same query returns different last-digit values run to run, and
# against the oracle gate the two engines' sums straddle rounding
# boundaries exactly when the data makes true values land on them --
# which FIXED-SCALE measures do systematically (2-decimal prices
# averaged over round group counts produce exact .00005 half-ties;
# the r11 sf1 soak caught 59/8641 such groups in one entry).  Summing
# the measure's integer units (cents for scale 2) is exact and
# order-independent at any scale and any partitioning; the division
# back and the final rounding then run on identical integers in both
# engines, so determinism AND oracle parity are structural.
#
# POLICY: fixed-scale measures (prices, balances, 2-decimal values,
# integer counts) aggregate through these helpers.  Genuinely
# real-valued derived metrics (log-probs, norms, EWMA states, decoded
# frame means) stay float: their true values land on a rounding
# boundary with probability zero, and no integer representation
# exists.
#
# Range: a BIGINT unit sum overflows past ~9.2e18 -- at scale 2 that
# is 9.2e16 in measure units, comfortably past any 100 TB fact sum of
# prices; DuckDB widens SUM(BIGINT) to HUGEINT and Spark raises on
# long overflow rather than wrapping (ansi sum), so the bound is loud.


def fixed_units(col: Column | str, in_scale: int) -> Column:
    """Integer-units column for a fixed-scale measure: value * 10^s
    rounded to long (the product is within 1e-7 of the true integer
    for any double that *is* a scale-s decimal, so ANY
    round-to-nearest is exact).  ``in_scale=0`` is a bare integer
    cast.

    The nearest-rounding is ``(x*p + signum(x)*0.5)::long`` rather
    than ``F.round``: Spark's double round routes through
    ``BigDecimal.valueOf`` per row, and on the Q1 aggregate over
    sf0.1 lineitem the BigDecimal path measured 0.311 s vs 0.182 s
    for this all-double codegen form (byte-identical sums; the long
    cast truncates toward zero, which lands on the integer from
    either side given the <=1e-7 error bound, positive or
    negative)."""
    c = F.col(col) if isinstance(col, str) else col
    if in_scale == 0:
        return c.cast("long")
    p = F.lit(float(10 ** in_scale))
    return (c * p + F.signum(c) * F.lit(0.5)).cast("long")


def sum_fixed_point(col: Column | str, in_scale: int,
                    round_to: int) -> Column:
    """round(SUM(measure), round_to) computed over exact integer
    units.  DuckDB side: DUCKDB_SUM_FIXED."""
    p = float(10 ** in_scale)
    return round_portable(
        F.sum(fixed_units(col, in_scale)) / F.lit(p), round_to)


def avg_fixed_point(col: Column | str, in_scale: int,
                    round_to: int) -> Column:
    """round(AVG(measure), round_to) computed as exact-unit sum over
    the non-null count.  DuckDB side: DUCKDB_AVG_FIXED."""
    c = F.col(col) if isinstance(col, str) else col
    p = float(10 ** in_scale)
    return round_portable(
        F.sum(fixed_units(c, in_scale)) / (F.lit(p) * F.count(c)),
        round_to)


def duckdb_units(x: str, in_scale: int) -> str:
    if in_scale == 0:
        return f"CAST({x} AS BIGINT)"
    return f"CAST(round(({x}) * {10 ** in_scale}, 0) AS BIGINT)"


def duckdb_sum_fixed(x: str, in_scale: int, round_to: int) -> str:
    return (f"round(CAST(SUM({duckdb_units(x, in_scale)}) "
            f"/ {float(10 ** in_scale)} AS DOUBLE), {round_to})")


def duckdb_avg_fixed(x: str, in_scale: int, round_to: int) -> str:
    return (f"round(CAST(SUM({duckdb_units(x, in_scale)}) "
            f"/ ({float(10 ** in_scale)} * COUNT({x})) AS DOUBLE), "
            f"{round_to})")
