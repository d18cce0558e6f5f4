"""Multimodal column plumbing: opaque binary media + typed metadata.

The interleaved-spans model carries media as references
(``media_ref`` spans). This module is the scale path for the media
payloads themselves: treat image/audio/video as ``binary`` columns with
a typed metadata struct, and run decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over ``mapInPandas``.

The decode step itself is STUBBED — image/audio codecs are not in this
container — behind ``decoder=`` callables. ``fake_image_decoder`` is the
deterministic test double (derives pseudo-pixel stats from the bytes);
``strict_decoder`` raises NotImplementedError to mark the integration
point. Everything Spark-side — schema, batch shape, partitioning,
UDF signature — is real and tested.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("doc_id", StringType(), True),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta", StructType([
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", IntegerType(), True),
            StructField("codec", StringType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("doc_id", StringType(), True),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def strict_decoder(content: bytes, media_type: str) -> np.ndarray:
    """Integration point for a real codec (PIL/librosa/ffmpeg)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; plug a real "
        "decoder or use fake_image_decoder for tests"
    )


def fake_image_decoder(content: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: 8-dim 'feature' from byte statistics.
    Pure function of the payload — stable across partitionings."""
    if content is None or len(content) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
    return np.array(
        [
            arr.mean(), arr.std(), arr.min(), arr.max(),
            float(len(arr) % 251), arr[0], arr[-1],
            float(int(arr.sum()) % 997),
        ],
        dtype=np.float32,
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = strict_decoder,
    batch_hint: int = 256,
) -> DataFrame:
    """media table -> FEATURE_SCHEMA via one mapInPandas pass.

    The decoder runs per element inside an Arrow batch (vectorized
    transfer; per-item decode is inherent to codecs). At scale: partition
    count sized so one batch of payloads fits executor memory —
    spark.sql.files.maxPartitionBytes governs the scan; binary payloads
    should be stored in their own column chunk (parquet does this) so
    metadata-only queries never read them.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(c, t).tolist() if c is not None else None
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) if c is not None else 0
                                for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "doc_id", "media_type", "content"
                        ).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract (native explode on metadata — no
    payload read), ready to feed a decode UDF. Demonstrates
    metadata-only pruning: the binary column is never touched."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"),
                                          F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + i % 128))
        rows.append(
            (
                f"m{i:05d}", f"d{i:06d}", mt, payload,
                (64, 64, 5000 if mt == "video" else None, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
