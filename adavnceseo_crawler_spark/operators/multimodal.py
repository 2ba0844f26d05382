"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct, the way
a 100 TB training-data pipeline stores them next to text.  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signatures, partitioning
by modality — is real and tested; the actual codec step is STUBBED because the
sandbox has no image/audio libraries: ``decode_stub`` produces a deterministic
fake feature vector, and ``decode_real`` raises NotImplementedError with the
integration point documented.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decode hook — wire PIL/torchaudio/ffmpeg here on a real cluster."""
    raise NotImplementedError(
        "media codecs are not available in this sandbox; "
        "swap decode_stub -> decode_real wired to PIL/torchaudio in deployment"
    )


def decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake feature: byte-histogram folded to `dim` floats."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    folded = hist.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
    return folded / max(1.0, folded.sum())


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched).

    At scale: repartition by modality first so each task loads one codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return (
        media.repartition(F.col("modality"))
        .select("media_id", "modality", "payload")
        .mapInPandas(run, schema=FEATURES)
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 37 + j * 11) % 256) for j in range(64 + i % 128))
        meta = ("application/octet-stream", 64, 48, 1000 + i)
        rows.append((i, modality, payload, meta))
    return spark.createDataFrame(rows, MEDIA)
