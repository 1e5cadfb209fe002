"""Dataset-assembly operators for LLM-training pipelines: deterministic
train/validation splitting and sequence packing.

The reference has no analogue (it is a pure warehouse summarizer); these
are north-star extensions (BASELINE.json) that every pretraining data
pipeline needs between "corpus cleaned" and "tokens on GPUs":

- **hash split**: route each document to a split by a *content-stable*
  hash of its id.  Unlike ``df.randomSplit`` this is reproducible across
  runs, engines, and cluster sizes, and a document keeps its split when
  the corpus around it changes -- the property that prevents train/val
  leakage across dataset versions.  Pure map, no shuffle, any scale.

- **sequence packing**: pretraining concatenates documents and slices
  fixed-length context windows.  Packing is a running token-offset
  assignment: doc's window id = floor(start_offset / seq_len).  We
  partition the running sum BY SHARD (source): each shard packs
  independently -- exactly how multi-file tokenized datasets are built
  -- so the window function shuffles by shard and never funnels the
  corpus through one partition.  A global (unsharded) pack is the
  degenerate single-shard case and is intentionally not offered.

Both are pure Catalyst expressions with exact DuckDB translations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import portable_hash60
from location_summary_etl_spark.functions.texts import tokens


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               train_pct: int = 90,
               salt: str = "split-v1") -> DataFrame:
    """(id, bucket, split): bucket = stable hash of (salt, id) mod 100;
    split = 'train' if bucket < train_pct else 'val'.

    The salt versions the assignment: bumping it re-rolls every doc's
    bucket without touching the data, so experiments can hold multiple
    independent splits.  DuckDB mirror uses the same md5-prefix hash.
    """
    bucket = (
        portable_hash60(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
        % 100
    ).cast("int")
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("val")).alias("split"),
    )


def hash_split_sql(table: str = "documents", id_col: str = "doc_id",
                   train_pct: int = 90, salt: str = "split-v1") -> str:
    """DuckDB oracle for :func:`hash_split` (same hash, same buckets)."""
    h = (f"CAST('0x' || substr(md5(concat_ws('|', '{salt}', "
         f"CAST({id_col} AS VARCHAR))), 1, 15) AS BIGINT)")
    return f"""
SELECT {id_col},
       CAST({h} % 100 AS INT) AS bucket,
       CASE WHEN {h} % 100 < {train_pct} THEN 'train' ELSE 'val' END AS split
FROM {table}
"""


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   shard_col: str = "source") -> DataFrame:
    """Assign each doc its token offset and context-window (pack) span
    within its shard's concatenated token stream.

    Returns (shard, id, n_tokens, start_offset, pack_first, pack_last):
    docs are concatenated in id order per shard; ``pack_first/last`` are
    the first/last seq_len-sized windows the doc's tokens land in (a doc
    can straddle windows -- standard pretraining packing).

    Scale: one window shuffle partitioned by shard.  Shards are how
    tokenized datasets are physically built (per input file / source),
    so partitions stay bounded by shard size, not corpus size.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.size(tokens(text_col))
    base = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        n_tokens.alias("n_tokens"),
    )
    end_offset = F.sum("n_tokens").over(w)
    return (
        base.withColumn("start_offset", (end_offset - F.col("n_tokens")).cast("bigint"))
        .withColumn("pack_first", F.expr(f"start_offset div {seq_len}"))
        .withColumn(
            "pack_last",
            F.expr(f"(start_offset + n_tokens - 1) div {seq_len}"),
        )
    )


def pack_sequences_sql(seq_len: int = 2048, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text",
                       shard_col: str = "source") -> str:
    """DuckDB oracle for :func:`pack_sequences`."""
    return f"""
WITH t AS (
    SELECT {shard_col} AS shard, {id_col},
           len(string_split({text_col}, ' ')) AS n_tokens
    FROM {table}
),
o AS (
    SELECT shard, {id_col}, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                               ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_offset
    FROM t
)
SELECT shard, {id_col}, CAST(n_tokens AS INT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {seq_len} AS BIGINT) AS pack_first,
       CAST((start_offset + n_tokens - 1) // {seq_len} AS BIGINT) AS pack_last
FROM o
"""
