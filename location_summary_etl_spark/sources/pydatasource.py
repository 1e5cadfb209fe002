"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``).

The reference's entire ingestion surface is a warehouse connector fed
by SQL strings (spark.read.format(SNOWFLAKE_SOURCE_NAME).option(
"query", ...) -- /root/reference/src/main/scala/App.scala:22-50).
This module is that concept expressed through Spark's native
extensibility point: a DataSource subclass the engine plans like any
relation -- named format, schema contract, explicit partitions, one
reader task per partition.

``SynthDocsDataSource`` generates a deterministic synthetic corpus
(documents-table shape) for load tests and pipeline dry-runs at any
scale without touching storage:

    spark.dataSource.register(SynthDocsDataSource)
    df = (spark.read.format("synthdocs")
          .option("n_rows", 100000).option("n_partitions", 64).load())

Scale design: partition count is an option (one generator task per
partition, rows split evenly), content derives from md5(seed|doc_id)
-- no RNG state, so any partition regenerates identically on retry
(task re-execution safety) and the corpus is reproducible across
cluster sizes.  Generation happens in the reader task (executor-side);
the driver ships only the partition descriptors.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

_LANGS = ["en", "de", "fr", "es", "zh"]
_SOURCES = ["web", "books", "wiki", "code"]
_WORDS = [
    "data", "spark", "query", "table", "join", "shuffle", "scan",
    "plan", "batch", "stream", "vector", "token", "model", "train",
]

SYNTH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def _doc(doc_id: int, seed: str) -> tuple:
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
    n_words = 5 + int(h[:2], 16) % 60
    words = [
        _WORDS[int(h[2 * i % 30: 2 * i % 30 + 2], 16) % len(_WORDS)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[int(h[8:10], 16) % len(_LANGS)],
        _SOURCES[int(h[10:12], 16) % len(_SOURCES)],
        len(text),
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = options.get("seed", "synthdocs-v1")

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id, self.seed)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthDocsReader(self.options)


# ------------------------------------------------------- streaming side
class _SynthDocsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic corpus: each
    trigger advances the offset by ``rows_per_batch`` until ``n_rows``
    is exhausted.  Offsets are plain dicts (JSON-serializable).

    Built on ``SimpleDataSourceStreamReader`` because its ``read(start)``
    RECEIVES the resume offset: after a query restart Spark hands the
    checkpointed offset straight to the reader, so the high-water mark
    can never regress below what was committed.  (The partition-planning
    ``DataSourceStreamReader`` derives ``latestOffset`` from in-process
    driver state, which resets to 0 on restart and either stalls the
    query or re-emits committed rows -- there is no callback that tells
    it the checkpointed position before the first post-restart trigger.)
    Replay of an in-flight batch goes through ``readBetweenOffsets``;
    content is a pure function of (seed, doc_id), so the regenerated
    rows are bit-identical -- the property a Kafka-backed source gets
    from broker retention.

    The simple-reader contract prefetches each micro-batch on the
    driver; that bounds ``rows_per_batch`` to driver memory, which is
    the right trade for a control-plane feed.  Bulk executor-side
    generation stays on the batch source (``synthdocs``), whose reader
    tasks scale with ``n_partitions``."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.seed = options.get("seed", "synthdocs-v1")

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        lo = min(start["offset"], self.n_rows)
        hi = min(lo + self.rows_per_batch, self.n_rows)
        return (
            iter([_doc(i, self.seed) for i in range(lo, hi)]),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [_doc(i, self.seed)
             for i in range(start["offset"], end["offset"])]
        )

    def commit(self, end):
        pass  # nothing to clean up: the source is stateless


class SynthDocsStreamDataSource(DataSource):
    """Streaming twin of :class:`SynthDocsDataSource` (separate name so
    both can be registered side by side)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs_stream"

    def schema(self):
        return SYNTH_SCHEMA

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthDocsSimpleStreamReader(self.options)
