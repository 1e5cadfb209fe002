"""Multimodal column plumbing (BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (the lakehouse-standard layout). All
Spark-side plumbing -- schemas, batch iteration, partitioning, UDF
signatures -- is real and tested; only the codec call itself is stubbed
(this container has no image/audio libraries) behind
``decode_backend='fake'`` / a ``NotImplementedError`` for real codecs.

Scale notes: payload-bearing rows are processed with ``mapInPandas``
(Arrow batches stream through executors; nothing accumulates on the
driver), and ``spark.sql.files.maxPartitionBytes`` naturally bounds the
bytes per task when payloads live in parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata struct carried next to every payload column.
MEDIA_META_FIELDS = (
    "media_type string, width int, height int, n_bytes bigint, sha string"
)

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "n_pixels bigint, mean_byte double"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from the
    text column (stands in for real image bytes; same schema/layout a
    real ingest would produce)."""
    payload = F.encode(F.col(text_col), "utf-8")
    width = (F.length(text_col) % 64 + 16).cast("int")
    height = (F.length(text_col) % 48 + 12).cast("int")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            width.alias("width"),
            height.alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("media"),
    )


def decode_media(media_df: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode payloads to per-media features via Arrow-batched
    ``mapInPandas``.

    ``backend='fake'`` computes deterministic pseudo-features (byte
    statistics) with the exact batch shape a real decoder would use;
    any other backend raises ``NotImplementedError`` until the codec
    libraries exist in the image.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"decode backend {backend!r}: codec libraries (PIL/ffmpeg) "
            "are not available in this environment; only the "
            "deterministic 'fake' backend is implemented"
        )

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = pdf["media"]
            widths = np.array([m["width"] for m in metas], dtype=np.int64)
            heights = np.array([m["height"] for m in metas], dtype=np.int64)
            mean_bytes = np.array(
                [float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0
                 for p in pdf["payload"]]
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": [m["media_type"] for m in metas],
                "width": widths,
                "height": heights,
                "n_pixels": widths * heights,
                "mean_byte": mean_bytes,
            })

    return media_df.mapInPandas(decode, DECODED_SCHEMA)
