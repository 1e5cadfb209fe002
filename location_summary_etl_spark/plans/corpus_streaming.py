"""Streaming corpus: REAL Structured Streaming executions under the
DuckDB oracle gate.

Until round 4 streaming was the engine's weakest verification tier --
batch-vs-stream cross-check tests only, no external oracle row.  These
entries close that: each one starts an actual streaming query
(FileStreamSource over the events parquet, the real micro-batch
engine, watermarks and all), drains it with ``processAllAvailable``
into a memory sink, and returns the drained result as the
oracle-compared DataFrame.  The streams are bounded (one parquet
file), so the final state is deterministic and a batch SQL oracle can
replay it exactly -- the gate certifies that the STREAMING execution
path (stateful aggregation over micro-batches, session merging,
stream-static joins) converges to the same answer as the relational
semantics.

Scale notes: complete-mode draining is test-harness plumbing; the
streaming plans themselves are the production shapes (watermarked
windowed aggs whose state is O(open windows), session windows with
state O(open sessions), stream-static broadcast enrich with no stream
shuffle).  What is NOT covered stays explicit: unbounded-input
behavior (late-data eviction under watermark) is exercised by
tests/test_streaming.py, not by these bounded replays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    round_portable,
    sum_fixed_point,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table
from location_summary_etl_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    session_stats_stream,
    tumbling_counts_stream,
)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


def _drain(spark: SparkSession, stream_df: DataFrame, name: str,
           mode: str | None = None) -> DataFrame:
    """Unique memory-sink table per (entry, session); re-runs replace."""
    spark.catalog.dropTempView(name)
    return run_to_memory(stream_df, name, mode=mode)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts through the real micro-batch
    engine; the drained complete-mode state must equal the batch
    window aggregate (events_tumbling_10min's oracle shape)."""
    tag = _sf_tag(sf_dir)
    out = _drain(
        spark,
        tumbling_counts_stream(read_events_stream(spark, sf_dir)),
        f"stream_tumbling_{tag}",
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start"),
        "event_type",
        "n_events",
        round_portable("sum_value", 4).alias("sum_value"),
    )


register("streaming_tumbling_counts", streaming_tumbling_counts, """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 4) AS sum_value
FROM events
GROUP BY 1, 2
""")


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30-minute gap) per user; the
    drained state must equal the batch gaps-and-islands sessionization
    (session end = last event + gap)."""
    tag = _sf_tag(sf_dir)
    out = _drain(
        spark,
        session_stats_stream(read_events_stream(spark, sf_dir)),
        f"stream_sessions_{tag}",
    )
    return out.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start"),
        F.unix_timestamp("session_end").alias("session_end"),
        "n_events",
    )


register("streaming_session_windows", streaming_session_windows, """
WITH g AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(MAX(ts))) + 1800 AS BIGINT) AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
""")


def streaming_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrich (the no-stream-shuffle join
    shape): the event stream joins the customer dimension INSIDE the
    streaming query (static side broadcast, re-planned per
    micro-batch), then aggregates per (window, segment).  The drained
    complete-mode state must equal the batch join + window rollup."""
    from location_summary_etl_spark.streaming.jobs import enrich_events_stream

    tag = _sf_tag(sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    enriched = enrich_events_stream(
        read_events_stream(spark, sf_dir), customer)
    out = _drain(spark, enriched, f"stream_enrich_{tag}")
    return out.select(
        F.unix_timestamp("window_start").alias("window_start"),
        "c_mktsegment",
        "n_events",
        round_portable("sum_value", 4).alias("sum_value"),
    )


register("streaming_enrich_broadcast", streaming_enrich_broadcast, """
SELECT CAST(floor(epoch(e.ts) / 600) * 600 AS BIGINT) AS window_start,
       c.c_mktsegment,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(round((e.value) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""")


def streaming_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful escape hatch (``applyInPandasWithState``,
    RocksDB-capable state store, update mode) under the oracle gate:
    per-user running (count, sum, max).  The bounded source is one
    parquet file, so the stream is exactly one micro-batch and the
    drained update-mode output is one final row per user -- equal to
    the batch groupBy by construction if (and only if) the state fold
    is correct."""
    from location_summary_etl_spark.streaming.jobs import (
        user_running_stats_stream,
    )

    tag = _sf_tag(sf_dir)
    out = _drain(
        spark,
        user_running_stats_stream(read_events_stream(spark, sf_dir)),
        f"stream_userstats_{tag}",
        mode="update",
    )
    return out.select(
        "user_id", "n_events",
        round_portable("total_value", 4).alias("total_value"),
        round_portable("max_value", 4).alias("max_value"),
    )


register("streaming_user_running_stats", streaming_user_running_stats, """
SELECT user_id,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 4) AS total_value,
       round(CAST(MAX(value) AS DOUBLE), 4) AS max_value
FROM events
GROUP BY user_id
""")


def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once repair under the gate: the event stream unioned
    with ITSELF (every event delivered twice -- the duplicate-delivery
    shape a retried ingest produces) through
    ``dropDuplicatesWithinWatermark`` must restore exact
    distinctness.  The drained append-mode output is aggregated per
    event type so the oracle is a plain distinct count over events."""
    tag = _sf_tag(sf_dir)
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir))
    from location_summary_etl_spark.streaming.jobs import dedup_events_stream

    out = _drain(spark, dedup_events_stream(doubled),
                 f"stream_dedup_{tag}")
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
        sum_fixed_point("value", 2, 4).alias("sum_value"),
    )


register("streaming_dedup_replay", streaming_dedup_replay, """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_id) AS n_distinct_ids,
       round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 4) AS sum_value
FROM events
GROUP BY event_type
""")


def streaming_lakehouse_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional streaming ingest: the event stream (3 source
    files, ``maxFilesPerTrigger=1`` -> 3 real micro-batches) flows
    through ``foreachBatch`` into a :class:`VersionedTable`, one
    manifest COMMIT per batch with the batch id recorded for replay
    idempotence (streaming/jobs.foreach_batch_versioned_append -- the
    Delta-streaming-sink pattern on this repo's manifest commit).  The
    oracle-compared result aggregates the FINAL TABLE STATE, and
    ``n_commits`` pins the version count, so the gate certifies both
    that every batch landed exactly once and that the committed table
    equals the relational semantics of the whole stream.  Scratch dirs
    are per-invocation mkdtemp (r4 discipline)."""
    from location_summary_etl_spark.plans.corpus_warehouse import _fresh_dir
    from location_summary_etl_spark.sources.versioned import VersionedTable
    from location_summary_etl_spark.streaming.jobs import (
        foreach_batch_versioned_append,
    )

    scratch = _fresh_dir("ingest", sf_dir)
    src_dir = os.path.join(scratch, "src")
    events = load_table(spark, sf_dir, "events")
    (
        events.select("event_id", "event_type", "value")
        .withColumn("slice", F.pmod("event_id", F.lit(3)).cast("int"))
        .repartition("slice")          # exactly one file per slice
        .write.partitionBy("slice").parquet(src_dir)
    )

    stream = (
        spark.readStream.schema("event_id bigint, event_type string, "
                                "value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")  # flatten slice= dirs
        .parquet(src_dir)
    )
    t = VersionedTable(os.path.join(scratch, "table"))
    q = foreach_batch_versioned_append(
        stream, t, os.path.join(scratch, "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    return (
        t.read(spark).groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             sum_fixed_point("value", 2, 4).alias("sum_value"))
        .withColumn("n_commits", F.lit(t.latest_version() + 1))
    )


register("streaming_lakehouse_ingest", streaming_lakehouse_ingest, """
SELECT event_type,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT))
                  / 100.0 AS DOUBLE), 4) AS sum_value,
       3 AS n_commits
FROM events
GROUP BY event_type
""")
