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
  stdlib ``wave`` module + numpy (:func:`decode_audio_features` — no
  optional dependency at all); remaining media types (compressed
  audio/video — soundfile/av) raise ``NotImplementedError``.
  ``application/fake`` produces a deterministic pseudo-decode so the
  Spark-side plumbing (schema, batching, partitioning) is exercised
  end-to-end with zero codec dependencies — that path, plus the WAV
  synth→decode round trip (whose sample counts/means have a SQL closed
  form), is what the driver's oracle checks.

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
