"""Multimodal (image/audio/video) column plumbing over binary columns.

Design (the part that matters at 100 TB):

- Media payloads travel as opaque ``binary`` columns next to typed
  metadata (``media_type``, byte length, source id) — one row per asset,
  colocated with its features, so a scan prunes to metadata-only when the
  payload isn't needed (parquet column pruning skips the blob bytes).
- Decode / feature-extraction runs as **Arrow-batched mapInPandas**: the
  JVM ships columnar batches to Python once per batch, never per row, and
  the UDF's output schema is declared so Catalyst plans downstream
  operators normally.
- Codecs are OPTIONAL dependencies: ``image/*`` dispatches to Pillow
  when importable (checked per executor inside the batch function, so a
  cluster only needs Pillow on executors); PCM WAV decodes with the
  stdlib ``wave`` module + numpy (:func:`decode_audio_features`) and
  YUV4MPEG2 video with a hand-rolled header/FRAME parser
  (:func:`decode_video_features`) — neither needs any optional
  dependency; remaining media types (compressed audio/video —
  soundfile/av) raise ``NotImplementedError``. ``application/fake``
  produces a deterministic pseudo-decode so the Spark-side plumbing
  (schema, batching, partitioning) is exercised end-to-end with zero
  codec dependencies — that path, plus the WAV and Y4M synth→decode
  round trips (whose sample/frame counts and means have SQL closed
  forms), is what the driver's oracle checks.

Batch-shape note: mapInPandas receives an iterator of pandas DataFrames
(one per Arrow batch, bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``)
— memory per task is bounded regardless of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "decode_features",
    "synthesize_wav_payload",
    "decode_audio_features",
    "synthesize_y4m_payload",
    "decode_video_features",
    "resize_stub",
    "frame_sample_stub",
]

#: Output schema of decode_features — declared so Catalyst can plan
#: downstream projection/aggregation over the extracted features.
FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "width INT, height INT, digest STRING"
)


def attach_binary_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    media_type: str = "application/fake",
) -> DataFrame:
    """Model a multimodal table from the documents testdata: payload =
    UTF-8 bytes of the text as an opaque ``binary`` column plus typed
    metadata. On a real corpus the payload comes from the storage layer
    (e.g. ``spark.read.format('binaryFile')``); the downstream plumbing is
    identical."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit(media_type).alias("media_type"),
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Extract per-asset features from the binary payload with one
    Arrow-batched mapInPandas pass. Input needs columns
    (doc_id, content, media_type); output follows FEATURE_SCHEMA.

    This is the slow-path pattern done right: batch-at-a-time Python,
    vectorized columns in and out, no row loops across the JVM boundary.

    The batch function is deliberately self-contained (nested decode +
    local imports): cloudpickle ships it by value, so executors never need
    this package importable on their own sys.path.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io

        import pandas as _pd

        # Optional-dependency seam: image/* dispatches to Pillow when it
        # is importable (per-executor check, once per Arrow-batch stream);
        # other real media types need soundfile / av and still raise.
        try:
            from PIL import Image as _PILImage  # type: ignore
        except Exception:
            _PILImage = None

        def _decode_bytes(payload: bytes, media_type: str) -> dict:
            if media_type == "application/fake":
                # Deterministic pseudo-decode: exercises the distributed
                # plumbing end-to-end without any codec dependency.
                n = len(payload)
                return {
                    "n_bytes": n,
                    "width": n % 64,  # deterministic fake dimensions
                    "height": (n // 64) % 64,
                    "digest": _hashlib.md5(payload).hexdigest(),
                }
            if media_type.startswith("image/") and _PILImage is not None:
                with _PILImage.open(_io.BytesIO(payload)) as im:
                    w, h = im.size
                return {
                    "n_bytes": len(payload),
                    "width": int(w),
                    "height": int(h),
                    "digest": _hashlib.md5(payload).hexdigest(),
                }
            raise NotImplementedError(
                f"no codec for media_type={media_type!r}"
                + (
                    " (install Pillow for image/*)"
                    if media_type.startswith("image/")
                    else (
                        " (PCM WAV decodes via decode_audio_features; "
                        "compressed audio needs soundfile)"
                        if media_type.startswith("audio/")
                        else ""
                    )
                )
            )

        for pdf in it:
            feats = [
                _decode_bytes(payload, mt)
                for payload, mt in zip(pdf["content"], pdf["media_type"])
            ]
            out = _pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[["doc_id", "media_type", "n_bytes", "width", "height", "digest"]]

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


#: Output schema of decode_audio_features.
AUDIO_FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, n_channels INT, "
    "sample_rate INT, n_samples BIGINT, mean_amp DOUBLE, digest STRING"
)


def synthesize_wav_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Deterministic PCM WAV payloads from the documents table: doc i
    carries ``(doc_id % 50) + 10`` mono 16-bit samples with
    ``sample[j] = ((doc_id*31 + j*7) % 65536) - 32768`` — a pure integer
    function of doc_id, so sample counts and means have a CLOSED FORM any
    SQL engine reproduces (the driver-oracle hook for the audio path).
    Payload bytes are a REAL RIFF/WAVE container written by stdlib
    ``wave`` (44-byte header + frames), built inside the same Arrow
    batch shape real ingest uses (binary in, binary out, no row loops
    across the JVM boundary)."""
    schema = "doc_id BIGINT, content BINARY, media_type STRING"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def _wav(doc_id: int) -> bytes:
            n = int(doc_id) % 50 + 10
            j = _np.arange(n, dtype=_np.int64)
            samples = ((int(doc_id) * 31 + j * 7) % 65536 - 32768).astype(
                _np.int16
            )
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(samples.tobytes())
            return buf.getvalue()

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content": [_wav(d) for d in pdf["doc_id"]],
                    "media_type": "audio/wav",
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _batches, schema=schema
    )


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Decode PCM WAV payloads (stdlib ``wave`` + numpy — zero optional
    dependencies) with one Arrow-batched mapInPandas pass: container
    params (channels, rate), frame count, and the mean 16-bit amplitude
    computed as exact-integer-sum / count (bit-identical to a SQL
    ``CAST(SUM(s) AS DOUBLE) / n``). Input needs (doc_id, content,
    media_type); non-``audio/wav`` rows raise — compressed codecs remain
    the documented env-limited gap."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes, media_type: str) -> dict:
            if media_type != "audio/wav":
                raise NotImplementedError(
                    f"decode_audio_features: no codec for {media_type!r} "
                    "(PCM WAV only; compressed audio needs soundfile)"
                )
            with _wave.open(_io.BytesIO(payload), "rb") as w:
                n_ch = w.getnchannels()
                rate = w.getframerate()
                n_frames = w.getnframes()
                width = w.getsampwidth()
                frames = w.readframes(n_frames)
            if width != 2:
                raise NotImplementedError(
                    f"decode_audio_features: {8 * width}-bit PCM "
                    "unsupported (16-bit only)"
                )
            samples = _np.frombuffer(frames, dtype="<i2")
            n = len(samples)
            mean = float(int(samples.astype(_np.int64).sum()) / n) if n else 0.0
            return {
                "n_bytes": len(payload),
                "n_channels": n_ch,
                "sample_rate": rate,
                "n_samples": n,
                "mean_amp": mean,
                "digest": _hashlib.md5(payload).hexdigest(),
            }

        for pdf in it:
            feats = [
                _decode(payload, mt)
                for payload, mt in zip(pdf["content"], pdf["media_type"])
            ]
            out = _pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[
                [
                    "doc_id", "media_type", "n_bytes", "n_channels",
                    "sample_rate", "n_samples", "mean_amp", "digest",
                ]
            ]

    return df.mapInPandas(_batches, schema=AUDIO_FEATURE_SCHEMA)


#: Output schema of decode_video_features.
VIDEO_FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, width INT, "
    "height INT, fps_num INT, n_frames BIGINT, mean_luma DOUBLE, "
    "digest STRING"
)

#: Y4M synth geometry (kept tiny so the closed-form oracle join stays
#: cheap): 4x4 mono frames, 2-9 frames per doc.
_Y4M_W = 4
_Y4M_H = 4
_Y4M_HEADER = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 Cmono\x0A"


def synthesize_y4m_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic YUV4MPEG2 (Y4M) video payloads from the documents
    table: doc i carries ``(doc_id % 8) + 2`` frames of 4x4 mono luma
    where ``byte[f][j] = (doc_id*7 + f*13 + j) % 256`` — a pure integer
    function of doc_id, so frame counts and mean luma have a SQL closed
    form (the driver-oracle hook, same pattern as the WAV path). Y4M is
    a REAL container (ffmpeg/mjpegtools): plain-text stream header then
    ``FRAME\\n`` + raw planes per frame — the simplest format that makes
    the video decode path exercise an actual parser rather than a stub."""
    schema = "doc_id BIGINT, content BINARY, media_type STRING"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        npix = _Y4M_W * _Y4M_H

        def _y4m(doc_id: int) -> bytes:
            nf = int(doc_id) % 8 + 2
            out = [_Y4M_HEADER]
            j = _np.arange(npix, dtype=_np.int64)
            for f in range(nf):
                luma = ((int(doc_id) * 7 + f * 13 + j) % 256).astype(_np.uint8)
                out.append(b"FRAME\x0A" + luma.tobytes())
            return b"".join(out)

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "content": [_y4m(d) for d in pdf["doc_id"]],
                    "media_type": "video/x-yuv4mpeg",
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _batches, schema=schema
    )


def decode_video_features(df: DataFrame) -> DataFrame:
    """Decode Y4M video payloads with one Arrow-batched mapInPandas pass:
    parse the stream header (W/H/F tags), iterate FRAME markers, and
    compute the frame count and mean luma (exact-integer-sum / count —
    bit-identical to ``CAST(SUM(b) AS DOUBLE) / n`` in SQL). Mono
    (Cmono) colorspace only — 4:2:0 et al. refuse loudly, as do
    non-Y4M media types: compressed video stays the documented
    env-limited gap (PyAV not in this container)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes, media_type: str) -> dict:
            if media_type != "video/x-yuv4mpeg":
                raise NotImplementedError(
                    f"decode_video_features: no codec for {media_type!r} "
                    "(Y4M only; compressed video needs PyAV)"
                )
            nl = payload.index(b"\x0A")
            header = payload[:nl].decode("ascii")
            tags = header.split(" ")
            if tags[0] != "YUV4MPEG2":
                raise ValueError("not a YUV4MPEG2 stream")
            params = {t[0]: t[1:] for t in tags[1:] if t}
            w, h = int(params["W"]), int(params["H"])
            fps_num = int(params.get("F", "25:1").split(":")[0])
            cs = params.get("C", "420")
            if cs != "mono":
                raise NotImplementedError(
                    f"decode_video_features: colorspace {cs!r} unsupported "
                    "(mono only)"
                )
            npix = w * h
            pos = nl + 1
            n_frames = 0
            total = 0
            while pos < len(payload):
                fnl = payload.index(b"\x0A", pos)
                if payload[pos:fnl].split(b" ")[0] != b"FRAME":
                    raise ValueError("malformed Y4M: missing FRAME marker")
                plane = _np.frombuffer(
                    payload[fnl + 1 : fnl + 1 + npix], dtype=_np.uint8
                )
                if len(plane) != npix:
                    raise ValueError("malformed Y4M: truncated frame")
                total += int(plane.astype(_np.int64).sum())
                n_frames += 1
                pos = fnl + 1 + npix
            mean = float(total / (n_frames * npix)) if n_frames else 0.0
            return {
                "n_bytes": len(payload),
                "width": w,
                "height": h,
                "fps_num": fps_num,
                "n_frames": n_frames,
                "mean_luma": mean,
                "digest": _hashlib.md5(payload).hexdigest(),
            }

        for pdf in it:
            feats = [
                _decode(payload, mt)
                for payload, mt in zip(pdf["content"], pdf["media_type"])
            ]
            out = _pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[
                [
                    "doc_id", "media_type", "n_bytes", "width", "height",
                    "fps_num", "n_frames", "mean_luma", "digest",
                ]
            ]

    return df.mapInPandas(_batches, schema=VIDEO_FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: same mapInPandas shape as decode_features,
    payload transformation stubbed to a deterministic truncation (a real
    impl swaps `_resize` for a PIL call; schema and batching unchanged)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resize(payload: bytes) -> bytes:
            return payload[: max(1, (width * height) % (len(payload) + 1))]

        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = [_resize(p) for p in pdf["content"]]
            yield pdf

    return df.mapInPandas(_batches, schema=df.schema)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to N frame
    rows (mapInPandas may return more rows than it receives — the frame
    explosion happens inside the Arrow batch, not via a JVM explode of
    pre-materialized frames)."""
    schema = "doc_id BIGINT, frame_idx INT, frame BINARY"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((doc_id, i, payload[off : off + every_n_bytes]))
            yield _pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(_batches, schema=schema)
