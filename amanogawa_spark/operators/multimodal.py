"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is fully real — schemas, partition-aware batch
iteration (``mapInPandas``), Arrow batch shapes, deterministic fake
feature extraction for tests — while the actual media decode is stubbed:
the decode libraries (PIL/opencv/librosa) are not in this container, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless a
deterministic fake decoder is requested. Swapping in a real decoder is a
one-function change; the pipeline shape (binary in → fixed-size float
feature out, batch-at-a-time, no shuffle) is what matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real impl needs PIL/opencv (not in this container)."""
    raise NotImplementedError("image decode requires PIL/opencv; use fake_decoder for tests")


def decode_audio(payload: bytes) -> np.ndarray:
    """STUB — real impl needs soundfile/librosa (not in this container)."""
    raise NotImplementedError("audio decode requires an audio lib; use fake_decoder for tests")


def fake_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes → dim floats in [0,1).

    Pure function of the bytes (seeded from a stable digest), so tests can
    assert byte-stable features across partitionings.
    """
    if payload is None:
        return np.zeros(dim, dtype=np.float64)
    import hashlib

    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(dim)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """(media_id, kind, feature: array<double>) via Arrow-batched mapInPandas.

    Partition-parallel map stage: every batch decodes independently, no
    shuffle, output is a fixed-width feature column ready for the
    similarity operators.
    """
    if decoder == "fake":
        decode = lambda b: fake_decoder(b, dim)  # noqa: E731
    elif decoder == "image":
        decode = decode_image
    elif decoder == "audio":
        decode = decode_audio
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(batches, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp.

    Decode is stubbed; the *plan* (explode duration into frame instants,
    partition-preserving) is the real Spark work.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    # exclusive upper bound: a decoder seeking t == duration
                    # of a duration-long stream gets EOF, so the last valid
                    # frame instant is duration-1 (sequence() is inclusive)
                    F.greatest(
                        F.coalesce(F.col("duration_ms"), F.lit(1)).cast("long")
                        - F.lit(1),
                        F.lit(0).cast("long"),
                    ),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests (no external data)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(32 + rng.randrange(64)))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind == "video" else (2000 if kind == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
