"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages.  The actual codec
calls are STUBBED (image/audio libraries are not in this container): set
``fake=True`` for a deterministic fake decoder so the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested, or
``fake=False`` to get a clearly-marked ``NotImplementedError`` where a codec
(Pillow/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': derives a FEATURE_DIM float vector from
    the payload digest.  Stands in for decode→resize→embed."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / np.float32(65535.0))


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media table → per-item feature vectors via Arrow-batched mapInPandas.

    Partition by media_id hash upstream if payload sizes are skewed; batches
    arrive bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            if fake:
                vecs = [_fake_decode(p) for p in payloads]
            else:
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg — not available "
                    "in this container; plug the codec in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "feature": vecs,
                }
            )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


def media_exact_dup_clusters(media: DataFrame) -> DataFrame:
    """Exact-dup clustering of media payloads — camden's checksum grouping
    applied to binary columns (sha2 over payload, builtin, no decode)."""
    from pyspark.sql import Window

    hashed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("checksum")
    )
    w = Window.partitionBy("checksum")
    wo = Window.partitionBy("checksum").orderBy("media_id")
    return hashed.select(
        "media_id",
        "checksum",
        F.count("*").over(w).cast("long").alias("cluster_size"),
        F.row_number().over(wo).cast("long").alias("rn"),
    )
