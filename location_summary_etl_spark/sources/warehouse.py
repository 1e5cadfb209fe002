"""External-warehouse connector (Python Data Source over a DuckDB file).

The reference's only source AND only sink is a warehouse connector:
six ``spark.read.format(SNOWFLAKE_SOURCE_NAME).option("query", <SQL
pushed into the warehouse>)`` loads (/root/reference/src/main/scala/
App.scala:22-50) and one ``df.write...option("dbtable",
"summary_zip_code").mode("append")`` store (App.scala:265-270).  No
warehouse server exists in this sandbox, so the structural parity
entry is a DuckDB *file* behind Spark's native extensibility point
(``pyspark.sql.datasource``), playing the warehouse role with the
same contract surface:

- **Query pushdown**: ``option("query", sql)`` executes inside the
  warehouse engine; Spark plans the result as a relation.  Schema is
  inferred from the warehouse's result metadata (a LIMIT-0 probe on
  the driver), exactly how the Snowflake connector resolves its
  schema at load time.
- **JDBC-style partitioned parallel read**: ``partition_column`` /
  ``num_partitions`` / ``lower_bound`` / ``upper_bound`` generate one
  range predicate per partition (first range absorbs below-lower and
  NULLs, last absorbs above-upper, matching ``spark.read.jdbc``
  semantics) so executors read concurrently -- the scale path a
  single-connection read lacks.  Each task opens the file read-only;
  DuckDB allows concurrent readers.
- **Stage-then-commit sink**: warehouse sinks cannot take concurrent
  row-level writes from hundreds of tasks; the standard contract
  (Snowflake COPY INTO, Redshift manifests) is: tasks stage their
  partition to neutral storage, the driver commits all stages in ONE
  warehouse transaction.  ``write(...)`` stages each task's rows as a
  parquet file (Arrow, no Python row loop); ``commit(...)`` runs a
  single INSERT .. FROM read_parquet([all stages]) transaction
  (CREATE OR REPLACE first under overwrite mode); ``abort(...)``
  deletes the stages.  Task retries are safe: a re-executed task
  stages a new file and only the files named in the driver's commit
  messages are loaded.

At 100 TB the same design holds with the staging directory on object
storage and the commit running COPY/INSERT inside the warehouse --
the Spark side ships partition descriptors and staged files only.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_ARROW_TO_SPARK = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
    "bool": T.BooleanType(), "string": T.StringType(),
    "large_string": T.StringType(), "date32[day]": T.DateType(),
    "binary": T.BinaryType(), "large_binary": T.BinaryType(),
}


def _spark_type(arrow_type) -> T.DataType:
    import pyarrow as pa

    s = str(arrow_type)
    if s in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[s]
    if pa.types.is_timestamp(arrow_type):
        # DuckDB timestamps are naive; parquet tables in this repo are
        # TIMESTAMP_NTZ -- keep the same semantics through the warehouse.
        return T.TimestampNTZType()
    if pa.types.is_decimal(arrow_type):
        return T.DecimalType(arrow_type.precision, arrow_type.scale)
    raise ValueError(f"duckwarehouse: unmapped warehouse type {s}")


def _resolve_query(options) -> str:
    q = options.get("query")
    if q:
        return q
    tbl = options.get("dbtable")
    if tbl:
        return f"SELECT * FROM {tbl}"
    raise ValueError("duckwarehouse: need option 'query' or 'dbtable'")


@dataclass
class _RangePartition(InputPartition):
    where: str | None  # None = unpartitioned single read


class TransientWarehouseError(Exception):
    """Synthetic transient failure raised by the injection harness."""


def _connect_with_retries(path: str, options, *, read_only: bool):
    """Open the warehouse connection under the connector's retry
    policy: ``max_retries`` attempts (default 3) with exponential
    backoff starting at ``retry_backoff_ms`` (default 50 ms) --
    the client-side half of a remote connector's resilience contract
    (the part that is testable without a network; DNS/TLS/auth belong
    to a real server).  Retryable: DuckDB IO/connection errors (file
    locked by a concurrent writer -- the embedded analogue of a
    dropped connection) and the injected :class:`TransientWarehouseError`.

    FAILURE INJECTION (tests): ``inject_failures=N`` with
    ``inject_token=<unique>`` makes the first N connection attempts
    across ALL processes raise TransientWarehouseError.  The attempt
    counter is a file of appended bytes keyed by the token (executors
    are separate Python workers, so a module-level counter would
    reset per process); O_APPEND writes make the count monotone
    across concurrent tasks."""
    import time

    import duckdb

    retries = int(options.get("max_retries", 3))
    backoff = float(options.get("retry_backoff_ms", 50)) / 1000.0
    inject = int(options.get("inject_failures", 0))
    token = options.get("inject_token", "default")

    def attempt():
        if inject:
            import tempfile

            marker = os.path.join(
                tempfile.gettempdir(), f"duckwh_inject_{token}")
            fd = os.open(marker, os.O_CREAT | os.O_WRONLY | os.O_APPEND)
            try:
                os.write(fd, b"x")
                failed_so_far = os.fstat(fd).st_size
            finally:
                os.close(fd)
            if failed_so_far <= inject:
                raise TransientWarehouseError(
                    f"injected transient failure {failed_so_far}/{inject}")
        return duckdb.connect(path, read_only=read_only)

    last: Exception | None = None
    for i in range(retries):
        try:
            return attempt()
        except (TransientWarehouseError, duckdb.IOException,
                duckdb.ConnectionException) as e:
            last = e
            if i < retries - 1:
                time.sleep(backoff * (2 ** i))
    raise ConnectionError(
        f"duckwarehouse: connection failed after {retries} attempts "
        f"(last: {last})") from last


class _WarehouseReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.options = dict(options)
        self.query = _resolve_query(options)
        self.pcol = options.get("partition_column")
        self.n = int(options.get("num_partitions", 1))
        self.lo = options.get("lower_bound")
        self.hi = options.get("upper_bound")

    def partitions(self):
        if not self.pcol or self.n <= 1:
            return [_RangePartition(None)]
        lo, hi = int(self.lo), int(self.hi)
        stride = max(1, (hi - lo) // self.n)
        bounds = [lo + stride * i for i in range(1, self.n)]
        parts = []
        prev = None
        for b in bounds:
            if prev is None:
                # JDBC semantics: first range absorbs < lower and NULL
                parts.append(_RangePartition(
                    f"{self.pcol} < {b} OR {self.pcol} IS NULL"))
            else:
                parts.append(_RangePartition(
                    f"{self.pcol} >= {prev} AND {self.pcol} < {b}"))
            prev = b
        parts.append(_RangePartition(f"{self.pcol} >= {prev}"))
        return parts

    def read(self, partition: _RangePartition):
        con = _connect_with_retries(self.path, self.options, read_only=True)
        try:
            sql = f"SELECT * FROM ({self.query}) _q"
            if partition.where is not None:
                sql += f" WHERE {partition.where}"
            reader = con.execute(sql).fetch_record_batch(1 << 16)
            # Arrow batches, not Python rows: the executor streams
            # columnar data straight into Spark's Arrow path.
            yield from reader
        finally:
            con.close()


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str | None
    rows: int


class _WarehouseWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.opts = dict(options)
        self.table = options.get("table") or options.get("dbtable")
        if not self.table:
            raise ValueError("duckwarehouse: need option 'table'/'dbtable'")
        self.overwrite = overwrite
        self.staging_root = options.get(
            "staging_dir", self.path + ".staging")
        # Per-JOB staging subdir: Spark's Python Data Source does NOT
        # invoke writer.abort() when a task failure kills the job
        # (verified on 4.1 -- the job dies before any driver-side
        # writer callback), so a crashed job inevitably strands its
        # staged files.  Correctness is unaffected (commit loads ONLY
        # the files named in its commit messages), but the disk leak
        # must be collectable: isolating each job's stages under a
        # uuid dir lets the NEXT successful commit sweep stale job
        # dirs by mtime (``stale_stage_ttl_s``, default 24 h) without
        # ever racing a concurrent in-flight job's fresh stages.
        self.stage_dir = os.path.join(
            self.staging_root, f"job-{uuid.uuid4().hex}")
        self.stale_ttl = float(options.get("stale_stage_ttl_s", 86400))
        self.columns = [f.name for f in schema.fields]
        # Exactly-once marker for streaming foreachBatch appends: when
        # set, commit() inserts (table, batch_id) into the commit log
        # INSIDE the same transaction as the data, and a replayed
        # batch (same id already logged) commits nothing.  The marker
        # and the rows land or neither does -- the transactional-sink
        # pattern Structured Streaming needs from an at-least-once
        # foreachBatch to get effective exactly-once.
        self.batch_id = options.get("batch_id")
        self.commit_table = options.get("commit_table", "_spark_commits")

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _StagedFile(None, 0)
        cols = list(zip(*rows))
        tbl = pa.table(
            {name: list(vals) for name, vals in zip(self.columns, cols)})
        os.makedirs(self.stage_dir, exist_ok=True)
        f = os.path.join(self.stage_dir, f"stage-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, f)
        return _StagedFile(f, len(rows))

    def commit(self, messages):
        files = [m.path for m in messages if m and m.path]
        con = _connect_with_retries(self.path, self.opts, read_only=False)
        try:
            con.execute("BEGIN")
            if self.batch_id is not None:
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {self.commit_table} "
                    "(tbl VARCHAR, batch_id BIGINT)")
                seen = con.execute(
                    f"SELECT 1 FROM {self.commit_table} "
                    "WHERE tbl = ? AND batch_id = ?",
                    [self.table, int(self.batch_id)]).fetchone()
                if seen:
                    con.execute("ROLLBACK")
                    con.close()
                    self._cleanup(files)
                    return
                con.execute(
                    f"INSERT INTO {self.commit_table} VALUES (?, ?)",
                    [self.table, int(self.batch_id)])
            if not files:
                if self.overwrite:
                    con.execute(f"DROP TABLE IF EXISTS {self.table}")
                con.execute("COMMIT")
                return
            flist = ", ".join(f"'{f}'" for f in files)
            src = f"SELECT * FROM read_parquet([{flist}])"
            if self.overwrite:
                con.execute(f"CREATE OR REPLACE TABLE {self.table} AS {src}")
            else:
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {self.table} AS {src} LIMIT 0")
                con.execute(f"INSERT INTO {self.table} {src}")
            con.execute("COMMIT")
        finally:
            con.close()
        self._cleanup(files)

    def abort(self, messages):
        self._cleanup([m.path for m in messages if m and m.path])

    def _cleanup(self, files):
        import shutil
        import time

        for f in files:
            try:
                os.remove(f)
            except OSError:
                pass
        try:
            os.rmdir(self.stage_dir)
        except OSError:
            pass
        # Sweep job dirs stranded by crashed jobs (abort() is never
        # invoked on job failure -- see __init__).  mtime-gated so a
        # concurrent job's fresh stages are never touched.
        try:
            cutoff = time.time() - self.stale_ttl
            for name in os.listdir(self.staging_root):
                p = os.path.join(self.staging_root, name)
                if (name.startswith("job-") and p != self.stage_dir
                        and os.path.isdir(p) and os.path.getmtime(p) < cutoff):
                    shutil.rmtree(p, ignore_errors=True)
            os.rmdir(self.staging_root)  # gone when fully empty
        except OSError:
            pass


class DuckWarehouseDataSource(DataSource):
    """``spark.read.format("duckwarehouse")`` /
    ``df.write.format("duckwarehouse")`` -- see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "duckwarehouse"

    def schema(self):
        con = _connect_with_retries(
            self.options["path"], self.options, read_only=True)
        try:
            probe = con.execute(
                f"SELECT * FROM ({_resolve_query(self.options)}) _q LIMIT 0"
            ).arrow()
        finally:
            con.close()
        return T.StructType([
            T.StructField(f.name, _spark_type(f.type)) for f in probe.schema
        ])

    def reader(self, schema) -> DataSourceReader:
        return _WarehouseReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _WarehouseWriter(self.options, schema, overwrite)


def register_warehouse(spark) -> None:
    spark.dataSource.register(DuckWarehouseDataSource)
