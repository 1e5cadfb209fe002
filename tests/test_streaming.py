"""Structured Streaming: drive the parquet-backed bounded stream through
watermarked tumbling windows and session windows, and cross-check the
tumbling counts against the batch formulation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from location_summary_etl_spark.operators.windows import tumbling_bucket
from location_summary_etl_spark.sources.registry import load_table
from location_summary_etl_spark.streaming.jobs import (
    enrich_events_stream,
    purchase_view_join_stream,
    read_events_stream,
    run_to_memory,
    session_stats_stream,
    tumbling_counts_stream,
    user_running_stats_stream,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_to_memory(
        tumbling_counts_stream(stream, "10 minutes"), "tumbling_out"
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in result.collect()
    }
    assert got, "stream produced no windows"

    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ws", tumbling_bucket("ts", 600))
        .groupBy("ws", "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {
        (r["ws"], r["event_type"]): r["n"] for r in batch.collect()
    }
    got_epoch = {
        (int(k[0].timestamp()), k[1]): v for k, v in got.items()
    }
    assert got_epoch == want


def test_streaming_session_windows(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_to_memory(
        session_stats_stream(stream, "30 minutes"), "session_out"
    )
    rows = result.collect()
    assert rows
    # session windows must be non-degenerate and event counts positive
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] > 0 for r in rows)
    # total events across sessions == table size
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_streaming_stateful_user_stats_matches_batch(spark, sf_dir):
    """applyInPandasWithState running per-user stats == batch groupBy.

    In update mode each micro-batch emits the keys it touched; the
    final state per user is the row from the last batch that updated
    it (n_events is monotone, so max() selects it)."""
    stream = read_events_stream(spark, sf_dir)
    result = run_to_memory(
        user_running_stats_stream(stream), "user_stats_out", mode="update"
    )
    got = {}
    for r in result.collect():
        prev = got.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            got[r["user_id"]] = (
                r["n_events"], round(r["total_value"], 6), round(r["max_value"], 6)
            )
    assert got

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"),
             F.max("value").alias("m"))
    )
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6), round(r["m"], 6))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_dedup_drops_replayed_events(spark, sf_dir, tmp_path):
    """A replayed (duplicated) bounded stream dedups back to the
    original id set via dropDuplicatesWithinWatermark."""
    import pyspark.sql.functions as SF

    from location_summary_etl_spark.streaming.jobs import dedup_events_stream

    # Build a doubled copy of a slice of events in stream-readable form.
    src = (
        load_table(spark, sf_dir, "events")
        .filter(SF.col("event_id") % 10 == 0)
        # watermarks require TIMESTAMP (tz-aware); registry ts is NTZ
        .select("event_id", SF.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value")
    )
    doubled = src.unionByName(src)
    path = str(tmp_path / "replayed")
    doubled.write.mode("overwrite").parquet(path)
    n_unique = src.count()

    stream = (
        spark.readStream.schema(doubled.schema).parquet(path)
    )
    result = run_to_memory(dedup_events_stream(stream), "dedup_out",
                           mode="append")
    ids = [r["event_id"] for r in result.collect()]
    assert len(ids) == n_unique
    assert len(set(ids)) == n_unique


def test_streaming_join_matches_batch_interval_join(spark, sf_dir):
    """Stream-stream purchase/view band join == the batch inner join
    with the identical condition (pair-for-pair)."""
    stream = read_events_stream(spark, sf_dir)
    result = run_to_memory(
        purchase_view_join_stream(stream), "ss_join_out", mode="append"
    )
    got = {
        (r["event_id"], r["v_ts"]) for r in result.collect()
    }

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    batch = purchases.join(
        views,
        (purchases["user_id"] == views["v_user"])
        & (views["v_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 10 MINUTES"))
        & (views["v_ts"] < purchases["p_ts"]),
    )
    want = {(r["event_id"], r["v_ts"]) for r in batch.collect()}
    assert got, "stream-stream join produced no pairs"
    assert got == want


def test_streaming_left_outer_join_sound(spark, sf_dir):
    """LEFT OUTER stream-stream join: matched pairs must equal the
    batch inner join exactly, and NULL-padded rows may only appear for
    purchases the batch left join also leaves unmatched.  (The file
    stream arrives as one micro-batch, so tail unmatched rows whose
    no-match proof needs a further watermark advance may legitimately
    be withheld -- soundness, not completeness, is what a bounded
    replay can assert.)"""
    from location_summary_etl_spark.streaming.jobs import (
        purchase_view_left_join_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    result = run_to_memory(
        purchase_view_left_join_stream(stream), "ss_ljoin_out", mode="append"
    )
    rows = result.collect()
    got_matched = {(r["event_id"], r["v_ts"]) for r in rows
                   if r["v_ts"] is not None}
    got_null = {r["event_id"] for r in rows if r["v_ts"] is None}

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    cond = (
        (purchases["user_id"] == views["v_user"])
        & (views["v_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 10 MINUTES"))
        & (views["v_ts"] < purchases["p_ts"])
    )
    inner = purchases.join(views, cond)
    want_matched = {(r["event_id"], r["v_ts"]) for r in inner.collect()}
    matched_ids = {eid for eid, _ in want_matched}
    all_purchases = {r["event_id"] for r in purchases.collect()}
    want_null = all_purchases - matched_ids

    assert got_matched == want_matched
    assert got_null <= want_null
    # every purchase the stream did emit is accounted for exactly once
    assert got_null.isdisjoint(matched_ids)


def test_streaming_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: the parquet target
    matches the batch aggregation, and replaying the whole stream into
    the same target (fresh checkpoint = every batch redelivered) leaves
    it unchanged -- no duplicate rows."""
    from location_summary_etl_spark.streaming.jobs import foreach_batch_upsert

    target = str(tmp_path / "target")

    def run(checkpoint: str) -> None:
        stream = read_events_stream(spark, sf_dir)
        agg = tumbling_counts_stream(stream, "10 minutes").select(
            F.col("window_start").cast("long").alias("ws"),
            "event_type", "n_events",
        )
        q = foreach_batch_upsert(agg, target, checkpoint, ["ws", "event_type"])
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def snapshot() -> dict:
        return {
            (r["ws"], r["event_type"]): r["n_events"]
            for r in spark.read.parquet(target).collect()
        }

    run(str(tmp_path / "ckpt1"))
    got = snapshot()

    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ws", tumbling_bucket("ts", 600))
        .groupBy("ws", "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want

    run(str(tmp_path / "ckpt2"))  # full redelivery into the same target
    assert snapshot() == want


def test_streaming_warehouse_append_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch -> duckwarehouse append with transactional batch
    markers: the warehouse table matches the batch projection, a
    replayed micro-batch (same batch_id) commits nothing, and a NEW
    batch_id still appends -- the marker is per (table, batch), not a
    one-shot latch."""
    import duckdb

    from location_summary_etl_spark.sources.warehouse import register_warehouse
    from location_summary_etl_spark.streaming.jobs import (
        foreach_batch_warehouse_append,
    )

    register_warehouse(spark)
    db = str(tmp_path / "wh.duckdb")

    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_s"))
    q = foreach_batch_warehouse_append(
        stream, db, "events_log", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    n_events = load_table(spark, sf_dir, "events").count()
    con = duckdb.connect(db, read_only=True)
    assert con.execute("SELECT COUNT(*) FROM events_log").fetchone()[0] \
        == n_events
    committed = con.execute(
        "SELECT batch_id FROM _spark_commits WHERE tbl = 'events_log'"
    ).fetchall()
    con.close()
    assert committed  # at least one micro-batch went through the log

    # Replay: re-deliver one batch with an ALREADY-COMMITTED id -> no-op.
    replay = spark.createDataFrame(
        [(999, "click", 1)], "user_id long, event_type string, ts_s long")
    w = (replay.write.format("duckwarehouse")
         .option("path", db).option("table", "events_log"))
    w.option("batch_id", str(committed[0][0])).mode("append").save()
    # Fresh id -> appends.
    w.option("batch_id", str(max(b for b, in committed) + 1)) \
        .mode("append").save()
    con = duckdb.connect(db, read_only=True)
    assert con.execute("SELECT COUNT(*) FROM events_log").fetchone()[0] \
        == n_events + 1
    con.close()


def test_streaming_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static broadcast enrichment == the same join+window
    aggregate run as a batch query."""
    stream = read_events_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    result = run_to_memory(
        enrich_events_stream(stream, customer), "enrich_out"
    )
    got = {
        (int(r["window_start"].timestamp()), r["c_mktsegment"]):
            (r["n_events"], round(r["sum_value"], 6))
        for r in result.collect()
    }
    assert got, "stream-static enrich produced no rows"

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(
            customer.select(F.col("c_custkey").alias("user_id"),
                            "c_mktsegment"),
            "user_id",
        )
        .withColumn("ws", tumbling_bucket("ts", 600))
        .groupBy("ws", "c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    want = {
        (r["ws"], r["c_mktsegment"]): (r["n"], round(r["sv"], 6))
        for r in batch.collect()
    }
    assert got == want


def test_python_datasource_stream_replays_deterministically(spark, tmp_path):
    """The custom streaming Python data source delivers the whole
    bounded corpus in rows_per_batch micro-batches, and its content
    matches the batch data source row-for-row (pure function of
    (seed, doc_id) -> replay-safe)."""
    from location_summary_etl_spark.sources.pydatasource import (
        SynthDocsDataSource,
        SynthDocsStreamDataSource,
    )

    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthDocsStreamDataSource)

    stream = (
        spark.readStream.format("synthdocs_stream")
        .option("n_rows", 300).option("rows_per_batch", 80)
        .option("n_partitions", 4).load()
    )
    # No availableNow trigger: Python stream sources don't support it
    # (single-batch fallback); default micro-batch trigger +
    # processAllAvailable drains until latestOffset stops advancing.
    q = (
        stream.writeStream.format("memory").queryName("synth_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("synth_stream_out").collect()
    # Multiset check first: every doc exactly once (a dict would mask
    # duplicate emissions).
    assert sorted(r["doc_id"] for r in rows) == list(range(300))
    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in rows
    }

    batch = (
        spark.read.format("synthdocs").option("n_rows", 300)
        .option("n_partitions", 4).load()
    )
    want = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in batch.collect()
    }
    assert got == want


def test_python_datasource_stream_restart_no_duplicates(spark, tmp_path):
    """Stop the stream mid-corpus and restart from the same checkpoint:
    the resumed query must pick up at the committed offset -- every
    doc_id exactly once across both runs (multiset, not dict).  Guards
    the restart regression where a reader deriving latestOffset from
    in-memory driver state resets to 0 and re-emits committed rows."""
    import os
    import time

    from location_summary_etl_spark.sources.pydatasource import (
        SynthDocsStreamDataSource,
    )

    spark.dataSource.register(SynthDocsStreamDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start_query():
        stream = (
            spark.readStream.format("synthdocs_stream")
            .option("n_rows", 400).option("rows_per_batch", 100).load()
        )
        return (
            stream.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # Run 1: let at least one batch commit, then stop mid-stream.
    q = start_query()
    commits = os.path.join(ckpt, "commits")
    deadline = time.time() + 60
    while time.time() < deadline:
        done = [f for f in os.listdir(commits)] if os.path.isdir(commits) else []
        if any(not f.endswith(".tmp") for f in done):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    # Run 2: resume from the checkpoint and drain the rest.
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    result = spark.read.schema("doc_id LONG, text STRING, lang STRING, "
                               "source STRING, n_chars LONG").json(out)
    doc_ids = sorted(r["doc_id"] for r in result.collect())
    assert doc_ids == list(range(400)), (
        f"expected each of 400 docs exactly once, got {len(doc_ids)} rows "
        f"({len(set(doc_ids))} distinct)")


def test_transform_with_state_matches_batch(spark, sf_dir):
    """transformWithStateInPandas running per-user stats == batch
    groupBy (same discipline as the applyInPandasWithState test; the
    new API runs on the RocksDB state store).

    The operator's driver-side worker needs protobuf (Spark ships the
    state-server protocol over it); this sandbox has no protobuf and
    no network, so the test skips here and runs wherever pyspark's
    declared deps are actually installed.

    Un-skip attempts, recorded so the skip is evidence rather than a
    hole: ``pip download protobuf --no-deps`` fails with "No matching
    distribution found" (no PyPI reachability from this sandbox,
    2026-08-14), and vendoring is not viable -- pyspark's generated
    ``sql/streaming/proto/StateMessage_pb2.py`` requires the real
    protobuf C/upb runtime (``google.protobuf.descriptor``), not a
    stub surface."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf (pyspark[connect] dep)")
    from location_summary_etl_spark.streaming.jobs import user_running_stats_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = read_events_stream(spark, sf_dir)
        result = run_to_memory(
            user_running_stats_tws(stream), "user_stats_tws_out", mode="update"
        )
        got = {}
        for r in result.collect():
            best = got.get(r["user_id"])
            if best is None or r["n_events"] > best[0]:
                got[r["user_id"]] = (
                    r["n_events"], round(r["total_value"], 6),
                    round(r["max_value"], 6),
                )
        assert got
        batch = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"),
                 F.max("value").alias("m"))
        )
        want = {
            r["user_id"]: (r["n"], round(r["s"], 6), round(r["m"], 6))
            for r in batch.collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_versioned_stream_ingest_batch_replay_idempotent(spark, tmp_path):
    """The foreachBatch lakehouse sink's replay contract: re-delivering
    a (batch, batch_id) pair -- the at-least-once case after
    checkpoint recovery -- must not commit twice; a NEW batch id with
    the same rows must."""
    from location_summary_etl_spark.sources.versioned import VersionedTable
    from location_summary_etl_spark.streaming.jobs import (
        versioned_append_batch,
    )

    t = VersionedTable(str(tmp_path / "t"))
    b0 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                               "event_id bigint, event_type string, "
                               "value double")
    versioned_append_batch(t, b0, 0)
    versioned_append_batch(t, b0, 0)           # replay: skipped
    assert t.latest_version() == 0
    assert t.read(spark).count() == 2

    versioned_append_batch(t, b0, 1)           # same rows, new batch
    assert t.latest_version() == 1
    assert t.read(spark).count() == 4
    assert [h["operation"] for h in t.history()] == [
        "stream-append/0", "stream-append/1"]

    empty = b0.filter("event_id < 0")
    versioned_append_batch(t, empty, 2)        # empty batch: no commit
    assert t.latest_version() == 1


def test_indexed_ingest_keeps_index_current_per_batch(spark, tmp_path):
    """Continuously-indexed corpus (foreach_batch_indexed_ingest):
    3 real micro-batches append embeddings to the base VersionedTable
    and each one advances the ANN index a generation (ivf_delta); the
    final index answers identically to a from-scratch build over the
    final base, and the generation history shows one refresh per
    batch on top of the initial build."""
    import json
    import os

    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
        index_meta,
        ivf_query_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable
    from location_summary_etl_spark.streaming.jobs import (
        foreach_batch_indexed_ingest,
    )

    schema = "vec_id bigint, embedding array<float>, label int"
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(100)], schema), mode="overwrite")
    root = str(tmp_path / "idx")
    g0 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())

    # 3 one-file slices -> 3 micro-batches of 10 vectors each
    src = str(tmp_path / "src")
    (spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], i % 4) for i in range(30)],
        schema)
        .withColumn("slice", (F.col("vec_id") % 3).cast("int"))
        .repartition("slice")
        .write.partitionBy("slice").parquet(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = foreach_batch_indexed_ingest(
        stream, base, root, str(tmp_path / "ckpt"),
        rebuild_fraction=1.0)  # force the delta path for every batch
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert base.latest_version() == 3          # 3 batch commits
    meta = index_meta(root)
    assert meta["version"] == g0 + 3           # one generation per batch
    assert meta["op"] == "ivf_delta"
    assert meta["base_version"] == 3

    full_root = str(tmp_path / "full")
    vf = build_ivf_index(base.read(spark), full_root)
    qids = [1, 2, 1003, 1016, 1029]
    got = sorted(map(str, ivf_query_index(
        spark, root, qids, k=4, verify_against=base.read(spark))
        .collect()))
    want = sorted(map(str, ivf_query_index(
        spark, full_root, qids, k=4, version=vf).collect()))
    assert got == want

    # generation history: build + 3 deltas, each pinning its base
    cent = VersionedTable(os.path.join(root, "centroids"))
    ops = [json.loads(h["operation"]) for h in cent.history()]
    assert [o["op"] for o in ops] == [
        "ivf_build", "ivf_delta", "ivf_delta", "ivf_delta"]
    assert [o["base_version"] for o in ops] == [0, 1, 2, 3]


def test_indexed_ingest_deferred_refresh_cadence(spark, tmp_path):
    """refresh_every=N (the executable form of the r9 cost curve):
    with 3 micro-batches and refresh_every=3, exactly ONE refresh
    lands (on batch id 2) and it covers all three batches -- results
    equal a from-scratch build.  With a cadence that leaves the last
    batches uncovered, the index lags by design and one direct
    refresh_ivf_index call catches it up."""
    import json
    import os

    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
        index_meta,
        ivf_query_index,
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable
    from location_summary_etl_spark.streaming.jobs import (
        foreach_batch_indexed_ingest,
    )

    schema = "vec_id bigint, embedding array<float>, label int"

    def drive(name, refresh_every, n_slices):
        base = VersionedTable(str(tmp_path / f"base_{name}"))
        base.commit(spark.createDataFrame(
            [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
             for i in range(100)], schema), mode="overwrite")
        root = str(tmp_path / f"idx_{name}")
        g0 = build_ivf_index(base.read(spark), root,
                             base_version=base.latest_version())
        src = str(tmp_path / f"src_{name}")
        (spark.createDataFrame(
            [(1000 + i, [9.0, float(i), 1.0], i % 4)
             for i in range(10 * n_slices)], schema)
            .withColumn("slice", (F.col("vec_id") % n_slices).cast("int"))
            .repartition("slice")
            .write.partitionBy("slice").parquet(src))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = foreach_batch_indexed_ingest(
            stream, base, root, str(tmp_path / f"ckpt_{name}"),
            rebuild_fraction=1.0, refresh_every=refresh_every)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return base, root, g0

    # cadence divides the batch count: one refresh covers everything
    base, root, g0 = drive("full", refresh_every=3, n_slices=3)
    assert base.latest_version() == 3
    meta = index_meta(root)
    assert meta["version"] == g0 + 1           # ONE refresh, not three
    assert meta["base_version"] == 3           # ...covering all batches
    full_root = str(tmp_path / "spec_full")
    vf = build_ivf_index(base.read(spark), full_root)
    qids = [1, 2, 1003, 1016, 1029]
    got = sorted(map(str, ivf_query_index(
        spark, root, qids, k=4, verify_against=base.read(spark))
        .collect()))
    want = sorted(map(str, ivf_query_index(
        spark, full_root, qids, k=4, version=vf).collect()))
    assert got == want
    cent = VersionedTable(os.path.join(root, "centroids"))
    ops = [json.loads(h["operation"])["op"] for h in cent.history()]
    assert ops == ["ivf_build", "ivf_delta"]

    # cadence leaves a tail: index lags by design, one call repairs
    base2, root2, g0b = drive("lag", refresh_every=2, n_slices=3)
    assert base2.latest_version() == 3
    meta2 = index_meta(root2)
    assert meta2["version"] == g0b + 1         # refreshed at batch 1 only
    assert meta2["base_version"] == 2          # lagging the base (v3)
    g = refresh_ivf_index(spark, base2, root2)  # catch-up
    assert index_meta(root2, g)["base_version"] == 3
    ivf_query_index(spark, root2, [1, 1003], k=3,
                    verify_against=base2.read(spark)).collect()
