"""Multimodal corpus: binary-payload plumbing queries.

``multimodal_inventory`` is fully SQL-expressible (oracle-paired);
``multimodal_decode_features`` exercises the Arrow-batched decode path
(mapInPandas) and is deliberately a rows-only check -- it is the
designated non-SQL-expressible operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    frame_sample,
    resize_media,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return attach_fake_media(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )


def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.groupBy("source").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("media.n_bytes")).alias("total_bytes"),
        round_portable(F.avg(F.col("media.width")), 4).alias("avg_width"),
        F.countDistinct(F.col("media.sha")).alias("n_distinct_payloads"),
    )


register("multimodal_inventory", multimodal_inventory, """
SELECT source,
       COUNT(*) AS n_media,
       SUM(octet_length(encode(text))) AS total_bytes,
       round(CAST(AVG(length(text) % 64 + 16) AS DOUBLE), 4) AS avg_width,
       COUNT(DISTINCT sha256(text)) AS n_distinct_payloads
FROM documents
GROUP BY source
""")


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_media(_media(spark, sf_dir).select("doc_id", "payload", "media"))
    return decoded.select(
        "doc_id", "media_type", "width", "height", "n_pixels",
        round_portable("mean_byte", 4).alias("mean_byte"),
    )


# rows-only: the decode runs through mapInPandas (non-SQL-expressible).
register("multimodal_decode_features", multimodal_decode_features, None)


def multimodal_resize_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every payload to 32x24, then aggregate the rewritten
    metadata -- proves the resized struct/payload round-trips through
    downstream relational ops."""
    resized = resize_media(
        _media(spark, sf_dir).select("doc_id", "payload", "media"), 32, 24
    )
    return resized.groupBy(F.col("media.media_type").alias("media_type")).agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("media.n_bytes")).alias("total_bytes"),
        F.countDistinct(F.col("media.sha")).alias("n_distinct_payloads"),
    )


register("multimodal_resize_inventory", multimodal_resize_inventory, None)


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample 4 frames per payload (1->n fan-out inside the Arrow
    batch) and aggregate per frame position."""
    frames = frame_sample(
        _media(spark, sf_dir).select("doc_id", "payload"), n_frames=4
    )
    return frames.groupBy("frame_no").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").alias("total_bytes"),
        round_portable(F.avg("frame_mean"), 4).alias("avg_frame_mean"),
    )


register("multimodal_frame_stats", multimodal_frame_stats, None)
