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


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, media struct<media_type: string, "
    "width: int, height: int, n_bytes: bigint, sha: string>"
)


def resize_media(media_df: DataFrame, width: int, height: int,
                 backend: str = "fake") -> DataFrame:
    """Resize every payload to ``width x height`` via Arrow-batched
    ``mapInPandas``, rewriting the metadata struct to match.

    The fake backend tiles/truncates the byte buffer to width*height
    bytes -- deterministic, so tests can assert exact output sizes; a
    real backend would decode, resample, and re-encode in its place
    (same schema in, same schema out, so pipelines compose either way).
    """
    if backend != "fake":
        raise NotImplementedError(
            f"resize backend {backend!r}: codec libraries are not "
            "available in this environment"
        )

    def resize(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        target = width * height
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_payloads, out_meta = [], []
            for p, m in zip(pdf["payload"], pdf["media"]):
                buf = np.frombuffer(p, dtype=np.uint8)
                resized = np.resize(buf, target) if len(buf) else np.zeros(
                    target, dtype=np.uint8
                )
                raw = resized.tobytes()
                out_payloads.append(raw)
                out_meta.append({
                    "media_type": m["media_type"],
                    "width": width, "height": height,
                    "n_bytes": len(raw),
                    "sha": hashlib.sha256(raw).hexdigest(),
                })
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "payload": out_payloads,
                "media": out_meta,
            })

    return media_df.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_no int, frame_offset bigint, frame_bytes bigint, "
    "frame_mean double"
)


def frame_sample(media_df: DataFrame, n_frames: int = 4,
                 backend: str = "fake") -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames per payload (video-style
    fan-out: one input row -> n output rows), via ``mapInPandas``.

    The fake backend slices the byte buffer into equal frame windows
    and emits per-frame byte statistics; a real backend would seek and
    decode actual frames with the same (doc_id, frame_no) fan-out
    shape.  Fan-out happens inside the Arrow batch -- no explode
    shuffle, no driver involvement.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"frame-sample backend {backend!r}: codec libraries are not "
            "available in this environment"
        )

    def sample(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fnos, offs, nbytes, means = [], [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(p, dtype=np.uint8)
                if len(buf) == 0:
                    continue
                span = max(len(buf) // n_frames, 1)
                for f in range(n_frames):
                    off = f * span
                    if off >= len(buf):
                        break
                    window = buf[off:off + span]
                    ids.append(did)
                    fnos.append(f)
                    offs.append(off)
                    nbytes.append(len(window))
                    means.append(float(window.mean()))
            yield pd.DataFrame({
                "doc_id": np.array(ids, dtype=np.int64),
                "frame_no": np.array(fnos, dtype=np.int32),
                "frame_offset": np.array(offs, dtype=np.int64),
                "frame_bytes": np.array(nbytes, dtype=np.int64),
                "frame_mean": np.array(means, dtype=np.float64),
            })

    return media_df.mapInPandas(sample, FRAME_SCHEMA)
