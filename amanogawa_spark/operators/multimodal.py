"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is fully real — schemas, partition-aware batch
iteration (``mapInPandas``), Arrow batch shapes, deterministic feature
extraction — and so is one decoder per modality, stdlib-only:

- images: binary PPM (P6) / PGM (P5) parsed with a numpy frombuffer —
  no PIL needed. Compressed formats (PNG/JPEG) still raise
  ``NotImplementedError`` because their codecs aren't in this container.
- audio: RIFF/WAV PCM via the stdlib ``wave`` module (8/16/32-bit).
  Lossy codecs (mp3/ogg) raise.

So the multimodal path is end-to-end real for one deterministic format
per modality; a ``fake_decoder`` remains for arbitrary-bytes tests.
Swapping in a richer decoder is a one-function change; the pipeline
shape (binary in → fixed-size float feature out, batch-at-a-time, no
shuffle) is what matters at 100 TB.
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
    """Binary PPM (P6) / PGM (P5) → float64 array (h, w, 3) in [0, 1].

    Pure stdlib+numpy: netpbm is a deterministic uncompressed format, so
    the decode is a header parse + ``np.frombuffer``. Compressed formats
    (PNG/JPEG) raise ``NotImplementedError`` — their codecs (PIL/opencv)
    are not in this container; the caller-visible contract is identical.
    """
    if payload is None or len(payload) < 2:
        raise NotImplementedError("empty/truncated payload")
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            "only binary PPM(P6)/PGM(P5) decode here; PNG/JPEG need PIL/opencv"
        )
    # header: magic, width, height, maxval as whitespace-separated tokens,
    # '#' comments allowed between tokens; one whitespace byte after maxval
    # then raw samples
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    n = w * h * channels
    arr = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    img = arr.astype(np.float64).reshape(h, w, channels) / float(maxval)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def decode_audio(payload: bytes) -> np.ndarray:
    """RIFF/WAV PCM → float64 mono samples in [-1, 1] (stdlib ``wave``).

    8/16/32-bit integer PCM; multi-channel input is mean-downmixed to
    mono. Lossy codecs (mp3/ogg) raise ``NotImplementedError``.
    """
    import io
    import wave

    if payload is None or payload[:4] != b"RIFF":
        raise NotImplementedError("only RIFF/WAV PCM decodes here; mp3/ogg need an audio lib")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        width = wf.getsampwidth()
        n_ch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """(h, w, 3) image → dim floats: grayscale tile means over a near-square
    grid (adaptive average pool) — deterministic, resolution-independent."""
    gray = img @ np.array([0.299, 0.587, 0.114])
    gh = max(1, int(np.sqrt(dim)))
    gw = max(1, (dim + gh - 1) // gh)
    h, w = gray.shape
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    out = np.zeros(dim, dtype=np.float64)
    i = 0
    for yi in range(gh):
        for xi in range(gw):
            if i >= dim:
                break
            tile = gray[ys[yi] : max(ys[yi + 1], ys[yi] + 1), xs[xi] : max(xs[xi + 1], xs[xi] + 1)]
            out[i] = float(tile.mean()) if tile.size else 0.0
            i += 1
    return out


def audio_features(x: np.ndarray, dim: int) -> np.ndarray:
    """Mono samples → dim floats: per-bin RMS energy over equal time bins."""
    if x.size == 0:
        return np.zeros(dim, dtype=np.float64)
    edges = np.linspace(0, x.size, dim + 1).astype(int)
    return np.array(
        [
            float(np.sqrt(np.mean(x[a:b] ** 2))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )


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
        decode = lambda b: image_features(decode_image(b), dim)  # noqa: E731
    elif decoder == "audio":
        decode = lambda b: audio_features(decode_audio(b), dim)  # noqa: E731
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


def synth_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary-PPM payload (no external data): seeded byte noise."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + pixels.tobytes()


def synth_wav(n_samples: int, rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV payload: seeded sine + noise."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / rate
    x = 0.5 * np.sin(2 * np.pi * (200 + 50 * (seed % 7)) * t)
    x += 0.1 * rng.standard_normal(n_samples)
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


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
