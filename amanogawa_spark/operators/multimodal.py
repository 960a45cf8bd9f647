"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is fully real — schemas, partition-aware batch
iteration (``mapInPandas``), Arrow batch shapes, deterministic feature
extraction — and so is one decoder per modality, stdlib-only:

- images: binary PPM (P6) / PGM (P5) parsed with a numpy frombuffer, and
  8-bit grey/RGB non-interlaced PNG via stdlib zlib inflate + scanline
  unfilter (encoder included for test fixtures). JPEG and exotic PNG
  variants raise ``NotImplementedError`` — those codecs aren't in this
  container.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) → (h, w*ch) uint8. Up is vectorized; Sub/Average/Paeth
    carry a left-neighbor dependency so they walk the row."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 2:  # Up
            out[y] = (row.astype(np.int32) + prior) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth (left-dependent)
            rec = out[y]
            ri = row.astype(np.int32)
            pi = prior.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                if ftype == 1:
                    rec[x] = (ri[x] + a) % 256
                elif ftype == 3:
                    rec[x] = (ri[x] + (a + int(pi[x])) // 2) % 256
                else:
                    b = int(pi[x])
                    c = int(pi[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (ri[x] + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """Stdlib PNG decode: chunk walk → IHDR + concatenated IDAT → zlib
    inflate → scanline unfilter. Supports 8-bit greyscale (color type 0)
    and RGB (2), non-interlaced — the deterministic subset; palette/alpha/
    16-bit/interlaced raise ``NotImplementedError`` honestly (no codec
    library in this container to fall back to)."""
    import struct
    import zlib

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG subset is 8-bit grey/RGB non-interlaced (got depth={depth}, "
            f"color={color}, interlace={interlace})"
        )
    ch = 1 if color == 0 else 3
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * ch):
        raise NotImplementedError("PNG IDAT length mismatch")
    px = _png_unfilter(raw, w, h, ch)
    img = px.astype(np.float64).reshape(h, w, ch) / 255.0
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def decode_image(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) / 8-bit non-interlaced PNG → float64
    array (h, w, 3) in [0, 1].

    Pure stdlib+numpy: netpbm is a header parse + ``np.frombuffer``; PNG
    is a zlib inflate + scanline unfilter (:func:`_decode_png`). JPEG and
    the exotic PNG variants raise ``NotImplementedError`` — their codecs
    (PIL/opencv) are not in this container; the caller-visible contract
    is identical.
    """
    if payload is None or len(payload) < 2:
        raise NotImplementedError("empty/truncated payload")
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            "only PPM(P6)/PGM(P5)/PNG decode here; JPEG needs PIL/opencv"
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


def encode_png(
    pixels: np.ndarray, filters: list[int] | None = None
) -> bytes:
    """Minimal stdlib PNG encoder: (h, w) uint8 grey or (h, w, 3) uint8 RGB
    → 8-bit non-interlaced PNG. ``filters`` optionally fixes each row's
    filter type (0..4; default all 0) — the test surface for the decoder's
    unfilter paths. Deterministic bytes (fixed zlib level)."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("grey or RGB only")
    color = 0 if ch == 1 else 2
    flat = px.reshape(h, w * ch).astype(np.int32)
    rows = bytearray()
    for y in range(h):
        f = filters[y] if filters else 0
        cur = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = cur - left
        elif f == 2:
            enc = cur - prior
        elif f == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = cur - (left + prior) // 2
        elif f == 4:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prior[:-ch]])
            p = left + prior - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            enc = cur - pred
        else:
            raise ValueError(f"filter {f}")
        rows.append(f)
        rows.extend((enc % 256).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + chunk(b"IEND", b"")
    )


def synth_png(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic PNG payload: the SAME seeded pixel matrix as
    ``synth_ppm`` (so PNG-vs-PPM round trips compare bit-identical), with
    each row cycling through the five filter types."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return encode_png(pixels, filters=[y % 5 for y in range(height)])


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


def image_dhash(img: np.ndarray, hash_size: int = 8) -> int:
    """(h, w, 3) image → ``hash_size²``-bit difference hash (dHash).

    Grayscale → adaptive average-pool to (hash_size, hash_size+1) → one
    bit per horizontal gradient sign. Resolution-independent and
    invariant to constant brightness shifts (gradients only); near
    re-encodes land within a few bit flips, so
    ``operators/dedup.hamming_neardup`` turns this into image near-dup
    detection. Deterministic pure numpy — no codec dependencies.
    """
    gray = img @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    gh, gw = hash_size, hash_size + 1
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    grid = np.zeros((gh, gw), dtype=np.float64)
    for yi in range(gh):
        for xi in range(gw):
            tile = gray[
                ys[yi] : max(ys[yi + 1], ys[yi] + 1),
                xs[xi] : max(xs[xi + 1], xs[xi] + 1),
            ]
            grid[yi, xi] = float(tile.mean()) if tile.size else 0.0
    bits = (grid[:, 1:] > grid[:, :-1]).flatten()
    return int(sum(1 << i for i, bit in enumerate(bits) if bit))


def media_dhashes(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """(media_id, dhash) — perceptual fingerprints for every decodable
    image payload (PPM/PGM/PNG); rows whose codec is unavailable are
    skipped, mirroring :func:`extract_features`'s contract. Map-only
    Arrow stage, no shuffle; feed the result to
    ``operators/dedup.hamming_neardup(n_bits=hash_size**2)``.
    """
    size = int(hash_size)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(payload)
                except NotImplementedError:
                    continue
                ids.append(mid)
                h = image_dhash(img, size)
                # reinterpret the unsigned bit pattern as two's-complement
                # so a full 64-bit hash fits Spark's signed LongType
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"media_id": ids, "dhash": hs})

    return media.select("media_id", "payload").mapInPandas(
        batches, "media_id long, dhash long"
    )


def audio_fingerprint(x: np.ndarray, n_bits: int = 64) -> int:
    """Mono samples → ``n_bits``-bit energy-contour fingerprint: RMS
    energy over ``n_bits + 1`` equal time bins, one bit per consecutive
    energy INCREASE — the temporal analogue of :func:`image_dhash`
    (sign-of-gradient bits), invariant to uniform volume scaling and
    resampling-preserving re-encodes. Feed pairs of these to
    ``operators/dedup.hamming_neardup`` for near-dup audio detection.
    """
    e = audio_features(x, n_bits + 1)
    bits = e[1:] > e[:-1]
    return int(sum(1 << i for i, bit in enumerate(bits) if bit))


def media_audio_fingerprints(media: DataFrame, n_bits: int = 64) -> DataFrame:
    """(media_id, afp) — fingerprints for every decodable WAV payload;
    undecodable codecs are skipped (the :func:`extract_features`
    contract). Map-only Arrow stage; two's-complement-folded into
    LongType like :func:`media_dhashes`."""
    bits = int(n_bits)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    x = decode_audio(payload)
                except NotImplementedError:
                    continue
                h = audio_fingerprint(x, bits)
                ids.append(mid)
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"media_id": ids, "afp": hs})

    return media.select("media_id", "payload").mapInPandas(
        batches, "media_id long, afp long"
    )
