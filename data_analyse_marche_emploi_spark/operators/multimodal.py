"""Multimodal-column operators (north-star extension, BASELINE.json):
image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, plus decode / feature-extraction plumbing as
Arrow-batched Pandas operations over ``mapInPandas``.

The decode step itself is a STUB — this container has no image/audio
codecs — but everything Spark-side is real and tested: the schema, the
binary column handling, the ``mapInPandas`` batch iteration, the output
schema contract, and the partition-preserving shape. Swapping the fake
decoder for PIL/ffmpeg is a one-function change inside the UDF.

Scale notes: binary payloads ride the columnar Parquet path (no
base64); ``mapInPandas`` streams Arrow record batches so peak memory is
one batch, not one partition; feature extraction is embarrassingly
parallel (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, fake_mean double, fake_first long, decoder string"
)


def attach_media(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal table from the documents fixture: the UTF-8
    bytes of the text stand in for an opaque media payload, with a typed
    metadata struct alongside (the pattern for real image/audio columns:
    payload + struct{format, size, ...})."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(media).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder (PIL.Image.open /
    torchaudio.load / cv2.VideoCapture frame sampling). Real decoders
    are NOT installed in this environment; the plumbing around this
    function is the tested artifact."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "fake_mean": 0.0, "fake_first": -1}
    return {
        "n_bytes": len(payload),
        "fake_mean": sum(payload[:64]) / min(len(payload), 64),
        "fake_first": payload[0],
    }


RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes long, decoder string"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary, decoder string"


def resize_images(media_df: DataFrame, width: int = 224, height: int = 224,
                  id_col: str = "doc_id") -> DataFrame:
    """Image resize plumbing over mapInPandas. The resample itself is a
    STUB (no PIL/cv2 in this environment — a real impl replaces the
    body of ``fake_resize`` with ``PIL.Image.open(io.BytesIO(b))
    .resize((w, h))``); the Spark-side contract — binary in, fixed
    (width, height, bytes) out, Arrow batching, zero shuffle — is real
    and tested."""

    def fake_resize(b: bytes | None) -> int:
        # deterministic stand-in for the resampled byte size
        return 0 if not b else min(len(b), width * height * 3)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "n_bytes": pdf["media"].map(fake_resize),
                    "decoder": "fake-resize-v0",
                }
            )

    return media_df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing over mapInPandas: one payload row
    fans out to ≤ max_frames frame rows (a row-expanding UDTF shape).
    Frame extraction is a STUB (no ffmpeg/cv2 here — the fake "frame"
    is a deterministic byte slice standing in for a decoded keyframe);
    the fan-out schema and Arrow batch handling are real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["media"]):
                if payload is None:
                    continue
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames,
                 "decoder": "fake-framesample-v0"}
            )

    return media_df.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_windows int, duration_proxy double, band_energy array<double>, "
    "decoder string"
)


def extract_audio_features(media_df: DataFrame, window_bytes: int = 2048,
                           n_bands: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Audio feature plumbing over mapInPandas: payload → windowed
    "spectrogram" summary (window count, duration proxy, per-band
    energies). Decoding is a STUB (no torchaudio/librosa here — band
    energies are deterministic byte-slice means standing in for FFT
    bins); the schema, fixed-length feature vector, and Arrow batch
    shape are the tested contract."""

    def features(payload: bytes | None) -> tuple[int, float, list[float]]:
        if not payload:
            return 0, 0.0, [0.0] * n_bands
        n_windows = max(1, len(payload) // window_bytes)
        step = max(1, len(payload) // n_bands)
        bands = [
            (sum(payload[i * step:(i + 1) * step]) / max(1, len(payload[i * step:(i + 1) * step])))
            for i in range(n_bands)
        ]
        return n_windows, len(payload) / window_bytes, bands

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [features(p) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_windows": [r[0] for r in rows],
                    "duration_proxy": [r[1] for r in rows],
                    "band_energy": [r[2] for r in rows],
                    "decoder": "fake-audio-v0",
                }
            )

    return media_df.mapInPandas(batches, AUDIO_SCHEMA)


def extract_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + featurize each media payload via mapInPandas: Arrow batches
    in, feature rows out. One Python worker per partition, zero
    shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["media"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "fake_mean": [f["fake_mean"] for f in feats],
                    "fake_first": [f["fake_first"] for f in feats],
                    "decoder": "fake-v0",
                }
            )

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)
