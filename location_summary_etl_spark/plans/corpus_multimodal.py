"""Multimodal corpus: binary-payload plumbing queries, every entry
oracle-paired.

The mapInPandas entries are hash-gateable because their compute is
deterministic and integer-replayable.  Every modality now has a REAL
codec entry with an exact oracle: WAV audio (stdlib ``wave``), PNG
(stdlib ``zlib`` -- CRC-checked chunks, inflate, all five scanline
filters), GIF (LZW implemented from the spec), Y4M video (real
frame-boundary container), plus ``multimodal_mixed_decode`` routing a
heterogeneous payload column through all three file codecs in one
pass.  The original fake byte-statistics entries remain as the
plumbing baseline; a real THIRD-PARTY backend (Pillow, auto-selected
where installed) would revert ``multimodal_decode_features`` to
rows-only, while the codec entries keep their exact oracles because
their payloads are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.operators.multimodal import (
    attach_fake_media,
    attach_gif_images,
    attach_mixed_media,
    attach_png_images,
    attach_wav_audio,
    attach_y4m_video,
    decode_any,
    decode_audio,
    decode_gif,
    decode_media,
    decode_png,
    decode_video_frames,
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
    # All-integer output by design: the r4 driver gate flagged this
    # entry hash-red on an environment we could never reproduce (every
    # local run was green), and the only candidate for engine-version
    # drift was the lone float column (avg of 25 ints per source).
    # ``sum_width`` carries the identical information exactly (the
    # consumer divides by n_media), and an all-BIGINT row is immune to
    # any rounding/format difference between engines or versions.
    m = _media(spark, sf_dir)
    return m.groupBy("source").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("media.n_bytes")).alias("total_bytes"),
        F.sum(F.col("media.width")).cast("long").alias("sum_width"),
        F.countDistinct(F.col("media.sha")).alias("n_distinct_payloads"),
    )


register("multimodal_inventory", multimodal_inventory, """
SELECT source,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text) % 64 + 16) AS BIGINT) AS sum_width,
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


# The decode runs through mapInPandas, but the FAKE backend is
# deterministic byte statistics over an ASCII payload (payload =
# utf-8(text), verified single-byte for this corpus), so the oracle
# replicates it exactly: mean_byte == mean of code points.  A real
# codec backend would drop this oracle and revert to rows-only.
register("multimodal_decode_features", multimodal_decode_features, """
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(length(text) % 64 + 16 AS INT) AS width,
       CAST(length(text) % 48 + 12 AS INT) AS height,
       CAST((length(text) % 64 + 16) * (length(text) % 48 + 12) AS BIGINT)
           AS n_pixels,
       round(CAST(list_avg(list_transform(range(1, length(text) + 1),
                                          i -> ord(text[i]))) AS DOUBLE), 4)
           AS mean_byte
FROM documents
""")


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


# Fake resize = tile/truncate the byte buffer to 32*24 bytes; distinct
# payload count == distinct tiled-string count (the sha is injective on
# it), so the oracle needs no sha at all.
register("multimodal_resize_inventory", multimodal_resize_inventory, """
WITH r AS (
    SELECT doc_id,
           substring(repeat(text, CAST(ceil(768.0 / length(text)) AS INT)),
                     1, 768) AS resized
    FROM documents
)
SELECT 'image/fake' AS media_type,
       COUNT(*) AS n_media,
       CAST(COUNT(*) * 768 AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT resized) AS BIGINT) AS n_distinct_payloads
FROM r
""")


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


# Fake frame sampling: span = max(len // 4, 1), frame f covers
# [f*span, min((f+1)*span, len)); replayed per frame with a 4-row
# unnest.  frame_mean per row is an exact integer-sum / len double in
# both engines.
register("multimodal_frame_stats", multimodal_frame_stats, """
WITH d AS (
    SELECT doc_id, text, length(text) AS n,
           GREATEST(length(text) // 4, 1) AS span
    FROM documents WHERE length(text) > 0
),
f AS (
    SELECT doc_id, text, n, span, fno
    FROM d, UNNEST([0, 1, 2, 3]) AS t(fno)
    WHERE fno * span < n
),
w AS (
    SELECT doc_id, fno,
           LEAST(span, n - fno * span) AS fb,
           list_avg(list_transform(
               range(fno * span + 1,
                     fno * span + LEAST(span, n - fno * span) + 1),
               i -> ord(text[i]))) AS fm
    FROM f
)
SELECT CAST(fno AS INT) AS frame_no,
       COUNT(*) AS n_frames,
       CAST(SUM(fb) AS BIGINT) AS total_bytes,
       round(CAST(AVG(fm) AS DOUBLE), 4) AS avg_frame_mean
FROM w
GROUP BY 1
""")


def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path: write genuine WAV containers (stdlib ``wave``)
    per document and parse them back -- header fields and PCM
    amplitude statistics from an actual binary-format decode.  The
    payload is deterministic from doc_id, so the oracle replays the
    expected decode output with pure integer arithmetic (the header
    constants and the sample formula), making this mapInPandas pair
    hash-gateable despite the real codec in the middle."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_audio(attach_wav_audio(docs))
    return decoded.select(
        "doc_id", "n_channels", "sample_rate", "n_frames",
        round_portable("duration_sec", 6).alias("duration_sec"),
        round_portable("mean_abs_amplitude", 4).alias("mean_abs_amplitude"),
    )


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec path: write genuine PNG files per document
    (stdlib zlib; IHDR/IDAT/IEND with CRC32s; scanline y filtered with
    type y % 5 so all five PNG filters are exercised) and parse them
    back -- dimensions from the real IHDR, pixel sums from the
    inflated, unfiltered scanlines.  Deterministic pixel formula =>
    the oracle replays the decode output with pure integer arithmetic.
    All-integer output by design (the r4 all-BIGINT discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_png(attach_png_images(docs))


# Channel c of pixel (x, y) of doc d is (d*31 + y*17 + x*7 + c*11) % 256,
# width = 4 + d % 6, height = 3 + d % 5 -- sum_rgb is an exact integer
# triple-unnest sum.  A real zlib inflate + unfilter pass sits between
# the Spark side and these numbers; agreement proves the codec.
register("multimodal_png_decode", multimodal_png_decode, """
WITH d AS (
    SELECT doc_id, 4 + doc_id % 6 AS w, 3 + doc_id % 5 AS h
    FROM documents
)
SELECT d.doc_id,
       CAST(d.w AS INT) AS width,
       CAST(d.h AS INT) AS height,
       2 AS color_type,
       CAST(d.w * d.h AS BIGINT) AS n_pixels,
       CAST(SUM((d.doc_id * 31 + y.y * 17 + x.x * 7 + c.c * 11) % 256)
            AS BIGINT) AS sum_rgb
FROM d,
     UNNEST(generate_series(0, d.h - 1)) AS y(y),
     UNNEST(generate_series(0, d.w - 1)) AS x(x),
     UNNEST([0, 1, 2]) AS c(c)
GROUP BY d.doc_id, d.w, d.h
""")


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container path: write genuine YUV4MPEG2 clips per
    document (text header + FRAME-delimited raw YUV planes -- the
    mjpegtools/ffmpeg interchange format) and decode them frame by
    frame: one output row per frame from a real frame-boundary seek,
    the 1->n video fan-out inside the Arrow batch.  Deterministic
    plane formula => exact all-integer oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_video_frames(attach_y4m_video(docs))


# Plane c of frame f at (x, y) of doc d is
# (d*19 + f*29 + c*41 + y*7 + x*3) % 256; width = 4 + d % 3, height =
# 3 + d % 3, n_frames = 3 + d % 4.  frame_sum sums all three planes.
register("multimodal_video_frames", multimodal_video_frames, """
WITH d AS (
    SELECT doc_id, 4 + doc_id % 3 AS w, 3 + doc_id % 3 AS h,
           3 + doc_id % 4 AS n
    FROM documents
)
SELECT d.doc_id,
       CAST(f.f AS INT) AS frame_no,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(SUM((d.doc_id * 19 + f.f * 29 + c.c * 41 + y.y * 7 + x.x * 3)
                % 256) AS BIGINT) AS frame_sum
FROM d,
     UNNEST(generate_series(0, d.n - 1)) AS f(f),
     UNNEST([0, 1, 2]) AS c(c),
     UNNEST(generate_series(0, d.h - 1)) AS y(y),
     UNNEST(generate_series(0, d.w - 1)) AS x(x)
GROUP BY d.doc_id, f.f, w, h
""")


def multimodal_mixed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-payload decode -- the real training-data shape:
    ONE binary column holding PNG, GIF, and WAV payloads (modality by
    doc_id % 3), decoded in ONE ``mapInPandas`` pass that dispatches
    each row to its real parser on the metadata and emits a unified
    feature schema.  Every branch is the deterministic formula of its
    single-modality sibling, so the oracle replays the whole mixed
    table as a three-way UNION -- the gate certifies codec dispatch,
    not just each codec alone."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_any(attach_mixed_media(docs))


register("multimodal_mixed_decode", multimodal_mixed_decode, """
WITH d AS (SELECT doc_id FROM documents),
png AS (
    SELECT doc_id, 4 + doc_id % 6 AS w, 3 + doc_id % 5 AS h
    FROM d WHERE doc_id % 3 = 0
),
gif AS (
    SELECT doc_id, 16 + doc_id % 15 AS w, 12 + doc_id % 12 AS h
    FROM d WHERE doc_id % 3 = 1
),
wav AS (
    SELECT doc_id, 64 + doc_id % 128 AS n FROM d WHERE doc_id % 3 = 2
)
SELECT png.doc_id, 'image/png' AS media_type,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_units,
       CAST(SUM((png.doc_id * 31 + y.y * 17 + x.x * 7 + c.c * 11) % 256)
            AS BIGINT) AS feature_sum
FROM png,
     UNNEST(generate_series(0, png.h - 1)) AS y(y),
     UNNEST(generate_series(0, png.w - 1)) AS x(x),
     UNNEST([0, 1, 2]) AS c(c)
GROUP BY png.doc_id, w, h
UNION ALL
SELECT gif.doc_id, 'image/gif',
       CAST(w AS INT), CAST(h AS INT), CAST(w * h AS BIGINT),
       CAST(SUM(p + (p * 3) % 256 + (p * 7) % 256) AS BIGINT)
FROM (SELECT gif.doc_id, gif.w, gif.h,
             (gif.doc_id * 37 + y.y * 13 + x.x * 5) % 256 AS p
      FROM gif,
           UNNEST(generate_series(0, gif.h - 1)) AS y(y),
           UNNEST(generate_series(0, gif.w - 1)) AS x(x)) gif
GROUP BY gif.doc_id, gif.w, gif.h
UNION ALL
SELECT wav.doc_id, 'audio/wav', 0, 0, CAST(n AS BIGINT),
       CAST(SUM(ABS((wav.doc_id * 31 + t.t * 7) % 256 - 128)) AS BIGINT)
FROM wav, UNNEST(generate_series(0, wav.n - 1)) AS t(t)
GROUP BY wav.doc_id, wav.n
""")


def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec with a HAND-IMPLEMENTED compression algorithm: write
    genuine GIF89a files per document (LZW-compressed index streams --
    variable-width codes growing past 9 bits, clear/end codes,
    sub-block framing -- implemented from the spec, no library) and
    parse them back.  Deterministic pixel/palette formulas => exact
    all-integer oracle; agreement proves the LZW round trip."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_gif(attach_gif_images(docs))


# Index at (x, y) of doc d is p = (d*37 + y*13 + x*5) % 256; palette
# maps p to (p, p*3 % 256, p*7 % 256); width = 16 + d % 15, height =
# 12 + d % 12.  sum_rgb = SUM over pixels of the palette triple -- a
# real LZW decode sits between the Spark side and these numbers.
register("multimodal_gif_decode", multimodal_gif_decode, """
WITH d AS (
    SELECT doc_id, 16 + doc_id % 15 AS w, 12 + doc_id % 12 AS h
    FROM documents
),
px AS (
    SELECT d.doc_id, d.w, d.h,
           (d.doc_id * 37 + y.y * 13 + x.x * 5) % 256 AS p
    FROM d,
         UNNEST(generate_series(0, d.h - 1)) AS y(y),
         UNNEST(generate_series(0, d.w - 1)) AS x(x)
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(SUM(p + (p * 3) % 256 + (p * 7) % 256) AS BIGINT) AS sum_rgb
FROM px
GROUP BY doc_id, w, h
""")


# Sample t of doc d is (d*31 + t*7) % 256 (unsigned 8-bit PCM, mono,
# 8 kHz); n_frames = 64 + d % 128.  The decode's amplitude statistic is
# AVG(ABS(sample - 128)) -- exact integer math over generate_series.
register("multimodal_audio_decode", multimodal_audio_decode, """
WITH n AS (
    SELECT doc_id, 64 + doc_id % 128 AS n_frames FROM documents
),
amp AS (
    SELECT n.doc_id, n.n_frames,
           AVG(ABS((n.doc_id * 31 + t.t * 7) % 256 - 128)) AS mean_abs
    FROM n, UNNEST(generate_series(0, n.n_frames - 1)) AS t(t)
    GROUP BY n.doc_id, n.n_frames
)
SELECT doc_id,
       1 AS n_channels,
       8000 AS sample_rate,
       CAST(n_frames AS BIGINT) AS n_frames,
       round(CAST(n_frames AS DOUBLE) / 8000.0, 6) AS duration_sec,
       round(CAST(mean_abs AS DOUBLE), 4) AS mean_abs_amplitude
FROM amp
""")
