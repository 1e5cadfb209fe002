"""Multimodal column plumbing (BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (the lakehouse-standard layout). All
Spark-side plumbing -- schemas, batch iteration, partitioning, UDF
signatures -- is real and tested.  Codec status per family:

- **audio**: REAL.  ``attach_wav_audio`` writes genuine RIFF/WAVE
  containers and ``decode_audio`` parses them with the stdlib ``wave``
  module -- no third-party dependency, works everywhere.
- **image**: auto-selected.  ``decode_media(backend='auto')`` uses
  Pillow where importable (real decode) and the deterministic fake
  byte-statistics backend otherwise; this container has no Pillow, so
  only the fake path executes here (the 'pil' path is import-gated
  with a clear ``NotImplementedError``).
- **video frame-sample / resize**: fake-only (byte-window statistics
  with the real fan-out/batch shape); real backends raise until their
  libraries exist in the image.

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


def pick_image_backend() -> str:
    """First importable real image codec, else the deterministic fake.

    The resolution order is the auto-selection contract:
    ``decode_media(backend='auto')`` decodes real images wherever
    Pillow is installed and degrades to the fake (schema-identical)
    backend in codec-less environments like this sandbox."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return "pil"
    return "fake"


def decode_media(media_df: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode payloads to per-media features via Arrow-batched
    ``mapInPandas``.

    Backends:

    - ``'fake'`` (default -- the oracle path): deterministic byte
      statistics with the exact batch shape a real decoder uses.
    - ``'pil'``: real decode via Pillow (``Image.open`` on the payload
      bytes; width/height from the decoded image, mean_byte over the
      grayscale-converted pixels).  Import-gated: raises
      ``NotImplementedError`` naming the missing library where Pillow
      is absent.
    - ``'auto'``: :func:`pick_image_backend` -- 'pil' where
      importable, 'fake' otherwise.

    The corpus entries pin ``backend='fake'`` explicitly so the DuckDB
    oracle replay is environment-independent.
    """
    if backend == "auto":
        backend = pick_image_backend()
    if backend == "pil":
        import importlib.util

        if importlib.util.find_spec("PIL") is None:
            raise NotImplementedError(
                "decode backend 'pil': Pillow is not installed in this "
                "environment (pip install Pillow); the 'fake' backend "
                "is the codec-less fallback"
            )

        def decode_pil(batches):
            import io

            import numpy as np
            import pandas as pd
            from PIL import Image

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids, mts, ws, hs, pxs, means = [], [], [], [], [], []
                for did, p, m in zip(pdf["doc_id"], pdf["payload"],
                                     pdf["media"]):
                    with Image.open(io.BytesIO(p)) as img:
                        w, h = img.size
                        gray = np.asarray(img.convert("L"), dtype=np.float64)
                    ids.append(did)
                    mts.append(m["media_type"])
                    ws.append(w)
                    hs.append(h)
                    pxs.append(w * h)
                    means.append(float(gray.mean()))
                yield pd.DataFrame({
                    "doc_id": np.array(ids, dtype=np.int64),
                    "media_type": mts,
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "n_pixels": np.array(pxs, dtype=np.int64),
                    "mean_byte": np.array(means, dtype=np.float64),
                })

        return media_df.mapInPandas(decode_pil, DECODED_SCHEMA)
    if backend != "fake":
        raise NotImplementedError(
            f"decode backend {backend!r}: supported backends are "
            "'fake', 'pil' (where Pillow is installed), and 'auto'"
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


# ------------------------------------------------------------- audio
# A REAL codec path that needs no third-party library: WAV containers
# written and parsed with the stdlib ``wave`` module.  The payloads are
# genuine RIFF/WAVE files (44-byte header + PCM frames), and the decode
# actually parses the container -- unlike the image path, nothing here
# is faked, so this is the operator that proves the multimodal plumbing
# end-to-end against a binary format's real structure.
AUDIO_SAMPLE_RATE = 8000
AUDIO_BASE_FRAMES = 64
AUDIO_FRAME_MOD = 128

AUDIO_SCHEMA = (
    "doc_id bigint, payload binary, media struct<media_type: string, "
    "width: int, height: int, n_bytes: bigint, sha: string>"
)

AUDIO_DECODED_SCHEMA = (
    "doc_id bigint, n_channels int, sample_rate int, n_frames bigint, "
    "duration_sec double, mean_abs_amplitude double"
)


def attach_wav_audio(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real mono 8-bit WAV payload per document, deterministic from
    the id: ``n_frames = AUDIO_BASE_FRAMES + id % AUDIO_FRAME_MOD``,
    sample ``t`` is ``(id*31 + t*7) % 256`` (unsigned 8-bit PCM).
    Deterministic generation is what makes the DECODE oracle-able: the
    expected header fields and amplitude statistics are pure integer
    arithmetic over (id, t) that DuckDB replays exactly.

    Payload construction runs in ``mapInPandas`` (the same Arrow
    batch shape a real ingest-from-object-store would use); metadata
    reuses the media struct layout with width/height zeroed."""

    def synth(batches):
        import hashlib
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads, metas = [], []
            for did in pdf[id_col]:
                n = AUDIO_BASE_FRAMES + int(did) % AUDIO_FRAME_MOD
                t = np.arange(n, dtype=np.int64)
                samples = ((int(did) * 31 + t * 7) % 256).astype(np.uint8)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(AUDIO_SAMPLE_RATE)
                    w.writeframes(samples.tobytes())
                raw = buf.getvalue()
                payloads.append(raw)
                metas.append({
                    "media_type": "audio/wav",
                    "width": 0, "height": 0,
                    "n_bytes": len(raw),
                    "sha": hashlib.sha256(raw).hexdigest(),
                })
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(),
                "payload": payloads,
                "media": metas,
            })

    return docs.select(id_col).mapInPandas(synth, AUDIO_SCHEMA)


def decode_audio(media_df: DataFrame, backend: str = "wave") -> DataFrame:
    """Parse WAV payloads with the stdlib ``wave`` module: header
    fields (channels, rate, frame count) come from the real container
    parse, amplitude statistics from the decoded PCM frames.  This is
    a REAL decode -- a malformed payload raises, exactly as a real
    pipeline wants (fail the task, not silently emit zeros)."""
    if backend != "wave":
        raise NotImplementedError(
            f"audio decode backend {backend!r}: 'wave' (stdlib) is the "
            "implemented backend; soundfile/ffmpeg variants belong to "
            "environments that ship them"
        )

    def decode(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chans, rates, frames, durs, amps = [], [], [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(p), "rb") as w:
                    nch = w.getnchannels()
                    rate = w.getframerate()
                    n = w.getnframes()
                    width = w.getsampwidth()
                    raw = w.readframes(n)
                # WAV PCM is unsigned-biased at 8 bits, signed
                # little-endian at 16 -- decoding 16-bit frames as
                # bytes would halve the frame count and scramble the
                # amplitudes, so the width switch is load-bearing.
                if width == 1:
                    pcm = np.frombuffer(raw, dtype=np.uint8).astype(
                        np.float64) - 128.0
                elif width == 2:
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                else:
                    raise ValueError(
                        f"doc {did}: unsupported WAV sample width {width} "
                        "(8- and 16-bit PCM implemented)")
                ids.append(did)
                chans.append(nch)
                rates.append(rate)
                frames.append(n)
                durs.append(n / rate)
                amps.append(float(np.abs(pcm).mean()) if n else 0.0)
            yield pd.DataFrame({
                "doc_id": np.array(ids, dtype=np.int64),
                "n_channels": np.array(chans, dtype=np.int32),
                "sample_rate": np.array(rates, dtype=np.int32),
                "n_frames": np.array(frames, dtype=np.int64),
                "duration_sec": np.array(durs, dtype=np.float64),
                "mean_abs_amplitude": np.array(amps, dtype=np.float64),
            })

    return media_df.mapInPandas(decode, AUDIO_DECODED_SCHEMA)
