"""Multimodal asset plumbing: opaque binary columns + typed metadata.

A large-scale training-data pipeline carries image/audio/video alongside
text. The Spark-side contract here is real and tested — schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — while the actual codec work
is stubbed (this container ships no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` and the default path uses a deterministic
fake feature extractor, clearly marked.

Swap ``_extract_features`` for a real decoder (PIL/torchvision/ffmpeg) on a
cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),     # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — NOT AVAILABLE in this sandbox (no PIL/cv2).

    On a production cluster, replace with e.g. ``PIL.Image.open`` +
    ``np.asarray``. Kept as an explicit stub so the call site is honest.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this container"
    )


def _extract_features(payload: bytes, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE feature extractor (sandbox stand-in).

    Derives a unit vector from the payload hash — stable, content-addressed,
    and shaped exactly like a real embedding so downstream plumbing
    (ANN joins, dedup) is exercised for real.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    vec = np.random.Generator(np.random.PCG64(seed)).standard_normal(dim)
    vec /= np.linalg.norm(vec)
    return [float(x) for x in vec]


def synthetic_assets(
    spark: SparkSession, n: int, seed: int = 7, partitions: int = 4
) -> DataFrame:
    """Deterministic fake asset table (binary payloads with typed metadata)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                media = ["image", "audio", "video"][i % 3]
                payload = hashlib.sha256(
                    f"asset:{seed}:{i}".encode()
                ).digest() * (4 + i % 7)
                rows.append(
                    {
                        "asset_id": i,
                        "url": f"https://example.org/assets/{i}",
                        "media_type": media,
                        "payload": payload,
                        "width": 64 + i % 512 if media == "image" else None,
                        "height": 64 + (i * 3) % 512 if media == "image" else None,
                        "duration_ms": 1000 + i % 60000 if media != "image" else None,
                    }
                )
            out = pd.DataFrame(rows)
            out["asset_id"] = out["asset_id"].astype("int64")
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int32")
            yield out

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        _gen, schema=ASSETS_SCHEMA
    )


def feature_stage(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The real-world version decodes/resizes/frame-samples here; the batch
    shape (one Arrow batch of binary payloads in, one batch of fixed-dim
    float vectors out) is identical.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": [
                        _extract_features(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    pruned = assets.select("asset_id", "media_type", "payload")
    return pruned.mapInPandas(_featurize, schema=FEATURES_SCHEMA)
