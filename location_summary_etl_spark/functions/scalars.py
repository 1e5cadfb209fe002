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
# Range: the accumulator is scale-aware (``sum_units``).  A BIGINT
# unit sum overflows past ~9.2e18 units: at scale 2 that is 9.2e16 in
# measure units -- ~16x a 100 TB price sum (sf1's largest Q1 charge
# group is ~5.5e10; x1e5 for 100 TB is ~5.5e15) -- so scale <= 2 sums
# stay on the fast long accumulator.  At scale >= 3 the long bound
# (9.2e{18-s} measure units) binds BELOW the 100 TB envelope (scale 6
# fails near sf~100 = 100 GB), and Spark's ANSI sum raises where
# DuckDB widens to HUGEINT -- so high scales accumulate in
# DECIMAL(38,0), which never practically overflows.  Measured on the
# Q1 charge sum at sf1 (7 reps): decimal accumulation is
# scan-dominated-free, 0.229 s median vs 0.228 s for long,
# byte-identical group sums.  The remaining limit is the DOUBLE
# output type itself: a 2-decimal value is representable only while
# |sum| < 2^53/100 ~ 9e13 measure units, which is inherent to any
# engine emitting doubles, not to the accumulator.


# in_scale >= this widens the sum accumulator to DECIMAL(38,0); the
# long-path headroom analysis above justifies the cutoff.
WIDE_SUM_SCALE = 3


def fixed_units(col: Column | str, in_scale: int) -> Column:
    """Integer-units column for a fixed-scale measure: value * 10^s
    rounded half-away-from-zero to long (the product is within 1e-7
    of the true integer for any double that *is* a scale-s decimal,
    so ANY round-to-nearest is exact).

    The nearest-rounding is ``(x*p + signum(x)*0.5)::long`` rather
    than ``F.round``: Spark's double round routes through
    ``BigDecimal.valueOf`` per row, and on the Q1 aggregate over
    sf0.1 lineitem the BigDecimal path measured 0.311 s vs 0.182 s
    for this all-double codegen form (byte-identical sums; the long
    cast truncates toward zero, which lands on the integer from
    either side given the <=1e-7 error bound, positive or negative).
    ``in_scale=0`` uses the same form with p=1, matching the DuckDB
    twin ``CAST(round(x, 0) AS BIGINT)`` (both half-away-from-zero)
    even for non-integral inputs.

    Exactness caveat: the arithmetic runs in DOUBLE, so inputs are
    exact only up to |x * 10^s| <= 2^53.  Genuinely integral BIGINT
    columns beyond 2^53 must not be routed through this helper (sum
    them directly); every corpus scale-0 use is a small count/flag."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10 ** in_scale))
    return (c * p + F.signum(c) * F.lit(0.5)).cast("long")


def sum_units(col: Column | str, in_scale: int) -> Column:
    """SUM of exact integer units with the overflow-safe accumulator
    for the scale (long for scale <= 2, DECIMAL(38,0) for scale >= 3
    -- see the range analysis above).  The DuckDB twin needs no
    widening: ``SUM(BIGINT)`` is already HUGEINT there.  Dividing the
    result by a double literal casts either accumulator type to
    double first, so downstream parity is unchanged."""
    u = fixed_units(col, in_scale)
    if in_scale >= WIDE_SUM_SCALE:
        u = u.cast("decimal(38,0)")
    return F.sum(u)


def sum_fixed_point(col: Column | str, in_scale: int,
                    round_to: int) -> Column:
    """round(SUM(measure), round_to) computed over exact integer
    units.  DuckDB side: DUCKDB_SUM_FIXED."""
    p = float(10 ** in_scale)
    return round_portable(
        sum_units(col, in_scale) / F.lit(p), round_to)


def avg_fixed_point(col: Column | str, in_scale: int,
                    round_to: int) -> Column:
    """round(AVG(measure), round_to) computed as exact-unit sum over
    the non-null count (F.count(col) skips nulls, preserving AVG's
    null semantics; the DuckDB twin uses COUNT(col) likewise).
    DuckDB side: DUCKDB_AVG_FIXED."""
    c = F.col(col) if isinstance(col, str) else col
    p = float(10 ** in_scale)
    return round_portable(
        sum_units(c, in_scale) / (F.lit(p) * F.count(c)),
        round_to)


def duckdb_units(x: str, in_scale: int) -> str:
    # round(x, 0) first so scale 0 is half-away-from-zero like the
    # Spark twin (a bare CAST AS BIGINT would round half-to-even in
    # DuckDB); scales >= 1 were already symmetric.
    return f"CAST(round(({x}) * {10 ** in_scale}, 0) AS BIGINT)"


def duckdb_sum_fixed(x: str, in_scale: int, round_to: int) -> str:
    return (f"round(CAST(SUM({duckdb_units(x, in_scale)}) "
            f"/ {float(10 ** in_scale)} AS DOUBLE), {round_to})")


def duckdb_avg_fixed(x: str, in_scale: int, round_to: int) -> str:
    return (f"round(CAST(SUM({duckdb_units(x, in_scale)}) "
            f"/ ({float(10 ** in_scale)} * COUNT({x})) AS DOUBLE), "
            f"{round_to})")
