"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode step
is a clearly-marked deterministic FAKE (or NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: schema, Arrow
batch shapes, mapInPandas signatures, partition behavior. Swapping the fake
for PIL/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, FloatType, IntegerType, ArrayType,
                               StringType, StructField, StructType)

FEATURE_DIM = 16

MEDIA_SCHEMA = StructType([
    StructField("media_id", IntegerType()),
    StructField("kind", StringType()),       # image | audio
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("width", IntegerType()),     # metadata travels beside payload
    StructField("height", IntegerType()),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", IntegerType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows. Payload bytes come from pure integer
    arithmetic (no RNG) so a SQL oracle can recompute any derived feature:
        size(i)    = 128 + (i*2654435761) % 1920
        byte(i, j) = (i*131 + j*31 + (i*j) % 97 + 7) % 256
    """
    rows = []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        size = 128 + (i * 2654435761) % 1920
        j = np.arange(size, dtype=np.int64)
        payload = bytes(((i * 131 + j * 31 + (i * j) % 97 + 7) % 256)
                        .astype(np.uint8))
        rows.append((i, kind, payload, 32 + i % 64, 32 + (i * 7) % 64))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB for a real image/audio decoder. Deterministic feature vector from
    payload bytes; replace with PIL.Image.open / soundfile.read in prod.
    A real deployment would raise NotImplementedError without the codec lib.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-arr.size) % FEATURE_DIM
    mat = np.pad(arr, (0, pad)).reshape(-1, FEATURE_DIM)
    return (mat.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, vectorized per batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })

    return media.mapInPandas(fn, FEATURES_SCHEMA)
