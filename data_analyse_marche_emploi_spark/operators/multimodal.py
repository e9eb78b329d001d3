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
