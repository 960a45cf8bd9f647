"""Image dHash (operators/multimodal.py) + Hamming near-dup (operators/dedup.py)."""

from __future__ import annotations

import numpy as np
import pytest

from amanogawa_spark.operators.dedup import hamming_neardup
from amanogawa_spark.operators.multimodal import (
    decode_image,
    encode_png,
    image_dhash,
    media_dhashes,
    synth_ppm,
)


def _ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _base_pixels(seed=11, h=32, w=32):
    rng = np.random.default_rng(seed)
    # smooth gradient + low-frequency texture: a "natural" image stand-in
    yy, xx = np.mgrid[0:h, 0:w]
    base = 40 + 120 * (xx / w) + 40 * np.sin(yy / 5.0)
    img = np.clip(base[..., None] + rng.normal(0, 4, size=(h, w, 1)), 0, 255)
    return np.repeat(img, 3, axis=2).astype(np.uint8)


def test_dhash_codec_and_resolution_invariance():
    px = _base_pixels()
    h_ppm = image_dhash(decode_image(_ppm(px)))
    h_png = image_dhash(decode_image(encode_png(px)))
    assert h_ppm == h_png  # same pixels, different container
    # 2x nearest-neighbor upscale: pooled gradients are preserved
    up = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
    h_up = image_dhash(decode_image(_ppm(up)))
    assert bin(h_ppm ^ h_up).count("1") <= 6


def test_dhash_brightness_invariance_and_discrimination():
    px = _base_pixels()
    bright = np.clip(px.astype(np.int64) + 30, 0, 255).astype(np.uint8)
    assert image_dhash(decode_image(_ppm(px))) == image_dhash(
        decode_image(_ppm(bright))
    )
    other = _base_pixels(seed=99)[::-1, ::-1]
    d = bin(
        image_dhash(decode_image(_ppm(px)))
        ^ image_dhash(decode_image(_ppm(other)))
    ).count("1")
    assert d > 8  # unrelated content lands far away


def test_media_dhashes_skips_undecodable_and_finds_neardups(spark):
    px = _base_pixels()
    noisy = np.clip(
        px.astype(np.int64) + np.random.default_rng(5).integers(-2, 3, px.shape),
        0,
        255,
    ).astype(np.uint8)
    rows = [
        (0, bytearray(_ppm(px))),
        (1, bytearray(_ppm(noisy))),
        (2, bytearray(encode_png(_base_pixels(seed=77)[::-1]))),
        (3, bytearray(b"\xff\xd8\xff jpeg-ish")),  # undecodable: skipped
        (4, bytearray(synth_ppm(24, 16, seed=3))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = media_dhashes(media)
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert set(got) == {0, 1, 2, 4}
    def signed(h):
        return h - (1 << 64) if h >= (1 << 63) else h

    mirror = {
        i: image_dhash(decode_image(bytes(p))) for i, p in rows if i != 3
    }
    assert got == {i: signed(h) for i, h in mirror.items()}
    pairs = {
        (r["a"], r["b"]): r["distance"]
        for r in hamming_neardup(
            hashes, id_col="media_id", hash_col="dhash", max_distance=3
        ).collect()
    }
    assert (0, 1) in pairs  # the planted near-dup survives
    assert pairs[(0, 1)] == bin(mirror[0] ^ mirror[1]).count("1")


def test_hamming_neardup_exact_and_guards(spark):
    rows = [(0, 0b0), (1, 0b1), (2, 0b11), (3, 1 << 63 - 1 | 0b111111)]
    df = spark.createDataFrame(rows, "id long, sh long")
    got = {
        (r["a"], r["b"]): r["distance"]
        for r in hamming_neardup(df, max_distance=2).collect()
    }
    # brute-force mirror over all pairs
    want = {}
    for i, (a, ha) in enumerate(rows):
        for b, hb in rows[i + 1 :]:
            d = bin(ha ^ hb).count("1")
            if d <= 2:
                want[(a, b)] = d
    assert got == want
    with pytest.raises(ValueError):
        hamming_neardup(df, bands=4, max_distance=4)
    # hot-band guard: the all-zero high bands of these tiny hashes get
    # dropped when max_band_size < 4, killing every candidate pair that
    # ONLY shares degenerate bands
    guarded = hamming_neardup(df, max_distance=2, max_band_size=2).collect()
    assert len(guarded) <= len(want)


def test_audio_fingerprint_volume_invariance_and_neardup(spark):
    import io
    import wave

    from amanogawa_spark.operators.multimodal import (
        audio_fingerprint,
        decode_audio,
        media_audio_fingerprints,
        synth_wav,
    )

    def wav16(x: np.ndarray, rate=8000) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(
                (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
            )
        return buf.getvalue()

    t = np.arange(16000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) * (1 + 0.5 * np.sin(2 * np.pi * 1.3 * t))
    fp = audio_fingerprint(decode_audio(wav16(tone)))
    # half the volume: identical energy-contour bits
    assert audio_fingerprint(decode_audio(wav16(tone * 0.5))) == fp
    # tiny additive noise: few bit flips
    noisy = tone + np.random.default_rng(4).normal(0, 0.01, tone.shape)
    d = bin(fp ^ audio_fingerprint(decode_audio(wav16(noisy)))).count("1")
    assert d <= 6
    # a different envelope lands far away
    other = 0.5 * np.sin(2 * np.pi * 440 * t) * np.linspace(0, 1, t.size)
    far = bin(fp ^ audio_fingerprint(decode_audio(wav16(other)))).count("1")
    assert far > d
    rows = [
        (0, bytearray(wav16(tone))),
        (1, bytearray(wav16(noisy))),
        (2, bytearray(b"ID3 not-a-wav")),
        (3, bytearray(synth_wav(4000, seed=9))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["afp"] for r in media_audio_fingerprints(media).collect()}
    assert set(got) == {0, 1, 3}
    pairs = {
        (r["a"], r["b"]): r["distance"]
        for r in hamming_neardup(
            media_audio_fingerprints(media),
            id_col="media_id",
            hash_col="afp",
            bands=8,
            max_distance=6,
        ).collect()
    }
    assert (0, 1) in pairs
