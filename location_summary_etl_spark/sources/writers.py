"""Sinks (SURVEY §2 B15).

The reference appends to a warehouse table
(/root/reference/src/main/scala/App.scala:265-270), which duplicates
rows on re-run. Our default is overwrite-by-partition (idempotent
re-runs: a snapshot rerun replaces exactly its own partition via
dynamic partition overwrite); plain append is available for parity.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def sink_partition_values(spark: SparkSession, path: str,
                          partition_col: str, cast_to: str | None = None) -> list:
    """Distinct values of ``partition_col`` already present in a
    partitioned parquet sink ([] if the sink does not exist yet).

    Partition-column values come from directory names, so the scan's
    ReadSchema is empty -- this reads file listings, not data, and its
    cost is O(#files), independent of row count.  ``cast_to`` undoes
    partition-type inference (a ``2024-01-01`` directory reads back as
    DATE; cast it to the source column's dtype so comparisons are
    same-typed)."""
    try:
        col = F.col(partition_col)
        if cast_to:
            col = col.cast(cast_to)
        rows = spark.read.parquet(path).select(col.alias("p")).distinct().collect()
    except AnalysisException:
        return []
    return [r["p"] for r in rows]


def incremental_update(spark: SparkSession, source_df: DataFrame, path: str,
                       partition_col: str,
                       mode: str = "newer_than_max") -> DataFrame:
    """Incrementally maintain a partitioned summary sink: write only the
    partitions the sink is missing, as one idempotent dynamic-partition
    overwrite.  Returns the delta DataFrame that was written.

    - ``newer_than_max``: high-water-mark ingestion -- process source
      rows whose partition value exceeds the sink's max.  O(1) state
      (one scalar), the right default for append-only date-partitioned
      feeds.  Late rows landing in an already-written partition are NOT
      picked up (reprocess that partition explicitly: filter the source
      to it and ``write_summary`` -- dynamic overwrite replaces exactly
      it).
    - ``missing_partitions``: backfill -- process partitions absent from
      the sink, wherever the holes are.  State is the sink's partition
      list (thousands of values at most, bounded by layout not rows),
      applied as an ``isin`` filter.

    At 100 TB the whole point is the filter lands on the SOURCE's
    partition column: for a partitioned source it becomes a
    PartitionFilter (directory pruning -- asserted in
    tests/test_plans.py), so an incremental run lists one day's files
    instead of scanning the lake.  Re-runs are no-ops: the delta is
    empty once the sink is caught up, and a crashed run re-derives the
    same delta (state lives in the sink layout, not a side channel).
    """
    src_type = dict(source_df.dtypes)[partition_col]
    existing = sink_partition_values(spark, path, partition_col, cast_to=src_type)
    if not existing:
        delta = source_df
    elif mode == "newer_than_max":
        delta = source_df.filter(F.col(partition_col) > F.lit(max(existing)))
    elif mode == "missing_partitions":
        delta = source_df.filter(~F.col(partition_col).isin(existing))
    else:
        raise ValueError(f"unknown incremental mode {mode!r}")
    write_summary(delta, path, partition_by=[partition_col])
    return delta


def write_sorted(df: DataFrame, path: str, sort_col: str,
                 n_files: int | None = None) -> None:
    """Write parquet range-clustered and sorted on ``sort_col``.

    ``repartitionByRange`` gives every output file a disjoint value
    range, and the within-partition sort gives every parquet ROW GROUP
    inside a file disjoint min/max stats (asserted from the footers in
    tests/test_operators.py).  A later range/point filter on
    ``sort_col`` then skips whole files and row groups at scan time via
    predicate pushdown -- the poor man's clustered index, and the main
    data-skipping lever parquet offers at 100 TB.  The range exchange
    samples the column to balance output sizes, so skew in ``sort_col``
    spreads across files instead of hot-spotting one."""
    n = n_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        df.repartitionByRange(int(n), F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zvalue(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative integer columns
    (bit i of a -> bit 2i, bit i of b -> bit 2i+1), as a pure Catalyst
    expression -- shifts and masks, codegen'd, no UDF.

    ``bits`` bounds each input's usable range (values are masked to
    ``bits`` low bits after a floor at 0); 16+16 interleaved bits fit
    comfortably in a BIGINT."""
    a = F.greatest(col_a.cast("long"), F.lit(0)).bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    b = F.greatest(col_b.cast("long"), F.lit(0)).bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zorder(df: DataFrame, path: str, col_a: str, col_b: str,
                 n_files: int | None = None, bits: int = 16) -> None:
    """Write parquet Z-order-clustered on TWO columns.

    :func:`write_sorted` gives perfect skipping on one column and none
    on any other; interleaving the bits of two keys into one Morton
    value and range-clustering on THAT localizes both dimensions at
    once -- every file/row group covers a small rectangle of the
    (a, b) space, so a selective filter on EITHER column prunes most
    files via parquet min/max stats (the multi-dimensional clustering
    trade: neither column is perfectly clustered, both are usefully
    clustered).  This is the standard lakehouse layout for fact tables
    filtered along two independent axes (e.g. time x tenant) and costs
    exactly one range exchange at write time, same as write_sorted."""
    n = n_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    zcol = zvalue(F.col(col_a), F.col(col_b), bits).alias("_z")
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(int(n), F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_partitions(spark: SparkSession, path: str, partition_col: str,
                       files_per_partition: int = 1) -> None:
    """Rewrite a partitioned sink so each partition holds at most
    ``files_per_partition`` files.

    Incremental appends leave a partition with one file per writing
    task; at 100 TB the resulting millions of small files dominate
    scan cost (open/seek per file, tiny row groups, NameNode/listing
    pressure).  Compaction is one shuffle keyed on (partition, salt):
    every row of a partition lands in at most ``files_per_partition``
    tasks.  Spark cannot overwrite a path it is reading, so this uses
    the standard rewrite-then-swap: write the compacted layout to a
    sibling directory, then atomically rename it over the original via
    the Hadoop FileSystem API (atomic on local/HDFS; on S3 a rename is
    a copy -- front it with a catalog/manifest there).  Readers see
    either the old layout or the new one, with a brief window where a
    new listing fails between delete and rename.  Run it on cold
    partitions (the high-water mark never rewrites them again)."""
    df = spark.read.parquet(path)
    keys = [F.col(partition_col)]
    if files_per_partition > 1:
        # row-level salt (NOT a function of the partition value, which
        # would be constant within a partition): spread each partition
        # across exactly k shuffle groups.
        keys.append(F.spark_partition_id() % files_per_partition)
    tmp = path.rstrip("/") + "__compacting"
    (
        df.repartition(*keys)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = dst.getFileSystem(hconf)
    fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"compaction swap failed: rename {tmp} -> {path}")


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


def write_observed(df: DataFrame, path: str, metrics: dict[str, Column],
                   mode: str = "overwrite") -> dict:
    """Write ``df`` to parquet while collecting named metrics IN the
    same pass (``df.observe`` + Observation): row counts, null counts,
    sums -- whatever DQ gates the pipeline needs -- are accumulated by
    the write job itself and returned as a dict.  The alternative (a
    second aggregate query before/after the write) scans the input
    twice; at 100 TB the observe path is the only affordable way to
    attach admission metrics to a sink.  Metrics must be aggregate
    expressions; observe computes them task-side and merges on the
    driver (same partial/final structure as an aggregate, riding the
    write job's tasks)."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).parquet(path)
    return obs.get


def merge_upsert(spark: SparkSession, updates: DataFrame, path: str,
                 keys: list[str], partition_by: str | None = None,
                 delete_col: str | None = None,
                 collect_metrics: bool = True,
                 assume_partition_stable: bool = False) -> dict:
    """Keyed MERGE into a parquet table: matched keys are UPDATED (or
    DELETED when ``delete_col`` is true), unmatched update rows are
    INSERTED -- the lakehouse-shaped generalization of this module's
    sink surface (the reference's blind warehouse append at
    /root/reference/src/main/scala/App.scala:265-270 is the degenerate
    no-keys case; the SCD2 plan in plans/corpus_scd.py is the
    keep-history variant of the same matched/unmatched split).

    Copy-on-write at PARTITION granularity: only partitions that can
    contain a matched key or receive an insert are read, merged
    (anti-join out the matched rows, union the update rows), and
    rewritten via dynamic partition overwrite; untouched partitions
    are never opened.  Affected partitions are the union of the
    updates' own partition values and the partitions holding matched
    keys in the target -- the latter found with a key semi-join
    against a column-pruned scan of (keys, partition) only, which is
    the honest CoW discovery cost when a key's partition value may
    change (Delta/Iceberg pay the same pass against file-level
    stats).  A partition whose rows are ALL deleted is removed through
    the Hadoop FileSystem API (dynamic overwrite cannot rewrite a
    partition to empty), so the path works on HDFS/S3A, not just
    local disk.

    IDEMPOTENT RE-APPLY: running the same merge twice is a no-op on
    the second pass -- re-matched rows are replaced with identical
    values, re-inserted rows now match and replace themselves, and
    re-deleted keys are already gone.  NOT concurrency-safe across
    writers (parquet has no table-level transaction log; the
    warehouse connector's staged commit covers the transactional
    sink story).

    Returns counts: {"inserted", "updated", "deleted", "partitions"}.
    ``collect_metrics=False`` skips the three counting aggregations
    (the merge itself never needs them) and returns -1 counts -- the
    cheap mode for pipelines that only want the table mutated.

    ``assume_partition_stable=True`` is the 100 TB discovery
    shortcut: when the caller GUARANTEES a key's partition value
    never changes (the usual case -- partition derived from the key,
    e.g. month in a (month, id) key), affected partitions are just
    the updates' own partition values and the full-table key scan is
    skipped entirely.  The guarantee is the caller's: a matched row
    living in a different partition than its update row would be
    missed (left as a stale duplicate), so only set this when the
    invariant genuinely holds.

    Partition-value caveats, stated rather than implied: values
    needing Hive directory escaping (spaces, ``/``, ``=``...) are not
    supported by the emptied-partition delete (the raw
    ``col=value`` path would miss the escaped directory name) --
    keep partition values filesystem-plain, which every sane layout
    does; and rows with a NULL partition value are never selected as
    affected (``isin`` is NULL-false), so merge them under an
    explicit sentinel partition instead.  ``VersionedTable.merge``
    has neither restriction (file-granular, no directory naming).
    """
    if delete_col is not None:
        deletes = updates.filter(F.col(delete_col)).drop(delete_col)
        upserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    else:
        deletes = None
        upserts = updates

    # MERGE requires key-unique updates (a key matched by two update
    # rows is ambiguous -- real MERGE implementations error too).
    dup = (updates.groupBy(*keys).count().filter(F.col("count") > 1)
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"merge_upsert: updates contain duplicate key {tuple(dup[0])[:len(keys)]}")

    try:
        target = spark.read.parquet(path)
        exists = True
    except AnalysisException:
        exists = False

    if not exists:
        write_summary(upserts, path,
                      mode="overwrite_partitions" if partition_by else "overwrite",
                      partition_by=[partition_by] if partition_by else None)
        n_ins = upserts.count()
        return {"inserted": n_ins, "updated": 0, "deleted": 0,
                "partitions": upserts.select(partition_by).distinct().count()
                if partition_by else 1}

    touched_keys = updates.select(*keys).distinct()
    if partition_by is None:
        # Degenerate CoW: one "partition" = the whole table.
        survivors = target.join(touched_keys, keys, "left_anti")
        merged = survivors.unionByName(upserts.select(*target.columns))
        counts = (_merge_counts(target, touched_keys, upserts, deletes, keys)
                  if collect_metrics else
                  {"inserted": -1, "updated": -1, "deleted": -1})
        # DURABLY stage the merged output before touching the source
        # path.  cache()+count() is NOT enough: cached blocks are not
        # fault-tolerant, so an executor loss (or memory eviction)
        # after the overwrite started would recompute the lineage
        # against a source path the overwrite is destroying -- job
        # failure or silently wrong survivors on any real cluster.  A
        # completed parquet write to a temp sibling IS durable; the
        # swap is then pure filesystem metadata (rename), no recompute
        # can ever re-read the old files.
        import uuid as _uuid

        tmp = f"{path}_merge_tmp_{_uuid.uuid4().hex}"
        merged.write.mode("error").parquet(tmp)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(path)
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = dst.getFileSystem(conf)
        fs.delete(dst, True)
        fs.rename(src, dst)
        _ensure_schema_marker(spark, path, target.schema)
        counts["partitions"] = 1
        return counts

    # Partitions that hold a matched key (column-pruned scan: keys +
    # partition column only) union the updates' own partitions --
    # unless the caller guarantees partition-stable keys, in which
    # case the updates' partitions ARE the affected set and the
    # full-table key scan is skipped.
    if assume_partition_stable:
        # deletes included: under the stable guarantee a delete's rows
        # live in the delete row's own partition.
        affected = [r[0] for r in
                    updates.select(partition_by).distinct().collect()]
    else:
        matched_parts = (
            target.join(touched_keys, keys, "left_semi")
            .select(partition_by).distinct()
        )
        update_parts = upserts.select(partition_by).distinct()
        affected = [r[0] for r in matched_parts.union(update_parts)
                    .distinct().collect()]
    if not affected:
        return {"inserted": 0, "updated": 0, "deleted": 0, "partitions": 0}

    affected_target = target.filter(F.col(partition_by).isin(affected))
    counts = (_merge_counts(affected_target, touched_keys, upserts, deletes, keys)
              if collect_metrics else
              {"inserted": -1, "updated": -1, "deleted": -1})
    survivors = affected_target.join(touched_keys, keys, "left_anti")
    merged = survivors.unionByName(upserts.select(*target.columns))
    # DURABLY stage the merged partitions to a temp sibling, then swap
    # each affected partition directory in via filesystem rename --
    # never a recompute against the partitions being replaced (the
    # earlier cache()+count() guard was not fault-tolerant: an
    # executor loss during the overwrite would re-read the source
    # partitions mid-destruction).  The write to the temp dir is a
    # completed, durable parquet job before the target is touched;
    # the swap itself moves only directory entries (per-partition
    # rename -- not atomic across partitions, same non-atomicity the
    # dynamic-overwrite path always had, but each partition is now
    # all-old or all-new and the input is never re-read).  A
    # partition emptied by deletes simply has no directory in the
    # temp output and is deleted.
    import uuid as _uuid

    tmp = f"{path}_merge_tmp_{_uuid.uuid4().hex}"
    merged.write.mode("error").partitionBy(partition_by).parquet(tmp)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = tmp_path.getFileSystem(conf)
    out_dirs = {
        st.getPath().getName()
        for st in fs.listStatus(tmp_path)
        if st.isDirectory()
        and st.getPath().getName().startswith(f"{partition_by}=")
    }
    for p in affected:
        dirname = f"{partition_by}={p}"
        dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{dirname}")
        fs.delete(dst, True)
        if dirname in out_dirs:
            fs.rename(jvm.org.apache.hadoop.fs.Path(f"{tmp}/{dirname}"), dst)
    # New-partition inserts may create partitions OUTSIDE the affected
    # list only when the update stream's partition values were the
    # affected set -- which they always are (affected includes the
    # updates' own partitions) -- so anything left in tmp is sidecars.
    fs.delete(tmp_path, True)
    # A previous total deletion may have left a root-level schema
    # marker; now that this merge has run, it is stale -- root files
    # and partition directories must not coexist in a Hive layout.
    # Remove root markers first; _ensure_schema_marker re-creates one
    # only if the table is (still) completely empty.
    root = jvm.org.apache.hadoop.fs.Path(path)
    for st in fs.listStatus(root):
        if st.isFile() and st.getPath().getName().endswith(".parquet"):
            fs.delete(st.getPath(), False)
    _ensure_schema_marker(spark, path, target.schema)
    counts["partitions"] = len(affected)
    return counts


def _ensure_schema_marker(spark: SparkSession, path: str, schema) -> None:
    """A parquet table whose LAST row was deleted by a merge must stay
    readable: with zero data files left, ``spark.read.parquet`` cannot
    infer a schema and raises UNABLE_TO_INFER_SCHEMA -- the
    total-deletion edge a hypothesis stream (delete every seeded key)
    caught.  Where a lakehouse manifest records the schema for free,
    plain parquet has only data files to carry it, so when nothing
    else survives, write ONE empty schema-bearing file at the table
    root (partition columns become regular empty columns -- harmless:
    there are no rows).  Any later write replaces the situation."""
    import py4j.protocol

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    try:
        it = fs.listFiles(root, True)
        while it.hasNext():
            f = it.next().getPath().getName()
            if f.endswith(".parquet"):
                return
    except py4j.protocol.Py4JJavaError:
        pass  # path itself gone (everything deleted): fall through
    (spark.createDataFrame([], schema)
     .coalesce(1).write.mode("append").parquet(path))


def _merge_counts(target: DataFrame, touched_keys: DataFrame,
                  upserts: DataFrame, deletes: DataFrame | None,
                  keys: list[str]) -> dict:
    """updated = upsert keys present in target; deleted = delete keys
    present; inserted = the rest of the upserts.  One pass over the
    (already partition-pruned) target's key columns."""
    tkeys = target.select(*keys)
    n_upd = upserts.select(*keys).distinct().join(tkeys, keys, "left_semi").count()
    n_del = (deletes.select(*keys).distinct().join(tkeys, keys, "left_semi").count()
             if deletes is not None else 0)
    n_ins = upserts.select(*keys).distinct().count() - n_upd
    return {"inserted": n_ins, "updated": n_upd, "deleted": n_del}
