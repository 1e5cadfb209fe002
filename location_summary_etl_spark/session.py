"""SparkSession factory.

The reference builds its session with a legacy two-step
SparkConf/SparkContext dance and no tuning at all
(/root/reference/src/main/scala/App.scala:18-20, master local[4] per
README.md:13).  We centralize session construction and set the knobs
that matter at scale:

- AQE on (runtime re-plan: broadcast conversion, shuffle coalescing,
  skew-join splitting) -- this is the 100 TB safety net.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is overridden (or left to AQE coalescing from a high
  initial value).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for the pandas-UDF paths (vector similarity,
  multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ensure_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition a narrow relation whose scan parallelism
    is below the session's core count, BEFORE CPU-heavy per-row work
    (shingling, hashing, vector math) is chained onto it.

    Why: a small parquet file with one row group scans as ONE partition,
    so everything fused into that scan stage runs on one core no matter
    how wide the machine is (measured: the whole dedup shingle pipeline
    on 1/32 cores at sf0.1).  At production scale inputs arrive in many
    splittable files, ``getNumPartitions() >= cores`` holds, and this is
    a no-op -- the repartition only fires in exactly the
    small-input/wide-machine regime where its tiny shuffle is worth it.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def partition_for_grouped_python(df, *keys: str, min_partitions: int | None = None):
    """Hash-partition by the grouping key at full core width before a
    grouped-Python stage (``applyInPandas`` / ``cogroup``).

    Grouped-Python stages are priced per GROUP call (pandas frame
    construction dominates, ~1 ms/group), but AQE sizes the pre-stage
    exchange by BYTES and coalesces a small shuffle down to a couple of
    partitions -- serializing thousands of group calls onto two Python
    workers (measured 1.6 s for 1500 no-op groups at sf0.1, vs ~0.1 s
    spread wide).  An explicit keyed repartition is exempt from AQE
    coalescing, already satisfies the stage's ClusteredDistribution
    (no second exchange), and spreads the group calls across cores.
    At production scale the exchange exceeds AQE's target size anyway
    and this pins the same layout it would pick.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def filter_behind_barrier(df, cond):
    """Filter on expensive DERIVED columns without re-evaluating them.

    ``df.filter(cond)`` where ``cond`` references computed columns lets
    PushDownPredicates substitute the full defining expressions into
    the scan as a duplicated data filter -- for array-building
    expressions (tokenize, shingles) that re-runs the heavy work per
    gate (measured 17x on corpus_clean's language gate: 9.5s vs 0.6s
    at sf0.1).  A nondeterministic column in a projection blocks all
    predicate pushdown through it, and the always-true guard keeps
    ColumnPruning from deleting the column (which would re-enable the
    pushdown).  Result rows are identical; only the plan shape changes.
    """
    from pyspark.sql import functions as F

    b = "_pushdown_barrier"
    return (
        df.withColumn(b, F.rand(7))
        .filter(cond & (F.col(b) >= F.lit(-1.0)))  # rand() in [0,1): always true
        .drop(b)
    )


def get_session(app_name: str = "location-summary-etl-spark",
                master: str | None = None,
                shuffle_partitions: int | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Codegen-heavy corpus (16-way minhash aggs, 32-bit vote sums):
        # the JVM default 240m code cache fills after a dozen such
        # queries, the JIT shuts off, and throughput collapses ~10x.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
