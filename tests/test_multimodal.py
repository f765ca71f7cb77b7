"""Real stdlib codec path: netpbm/WAV decode, perceptual hashes, media
near-dup pairs (the reference deduped image FILES by checksum — reference
src/scanner.rs:84-93 streams bytes; the north rule generalizes to perceptual
content similarity after decode)."""

from __future__ import annotations

import numpy as np
import pytest

from camden_spark.datagen import generate_media
from camden_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_spectral_hash,
    average_hash,
    decode_media_features,
    decode_pnm,
    decode_wav,
    encode_pnm,
    media_near_dup_pairs,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_pnm_roundtrip():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_pnm(encode_pnm(rgb))
    assert out.shape == (17, 23, 3)
    assert np.array_equal((out * 255).round().astype(np.uint8), rgb)
    gray = rng.randint(0, 256, (9, 11), dtype=np.uint8)
    out2 = decode_pnm(encode_pnm(gray))
    assert out2.shape == (9, 11, 1)
    assert np.array_equal((out2[:, :, 0] * 255).round().astype(np.uint8), gray)


def test_pnm_header_edge_cases():
    # comments + extra whitespace are legal netpbm
    payload = b"P5 # c\n# another comment\n 3\n2 \n255\n" + bytes(6)
    img = decode_pnm(payload)
    assert img.shape == (2, 3, 1)
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n4 4\n255\n" + bytes(10))  # truncated raster
    with pytest.raises(ValueError):
        decode_pnm(b"\x89PNG....")  # wrong magic


def test_wav_roundtrip_and_mixdown():
    import io
    import wave

    rate = 8000
    t = np.arange(rate) / rate
    left = (np.sin(2 * np.pi * 440 * t) * 30000).astype("<i2")
    right = (np.sin(2 * np.pi * 440 * t) * 10000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            np.column_stack([left, right]).ravel().astype("<i2").tobytes()
        )
    samples, got_rate = decode_wav(buf.getvalue())
    assert got_rate == rate and samples.shape == (rate,)
    # mono mixdown = mean of channels
    expected = (left.astype(np.float32) + right) / 2 / 32768.0
    assert np.allclose(samples, expected, atol=1e-6)


def test_average_hash_photometric_invariance():
    rng = np.random.RandomState(5)
    img = rng.randint(60, 180, (32, 32, 3), dtype=np.uint8)
    shifted = (img.astype(np.int16) + 40).astype(np.uint8)  # no clipping
    assert average_hash(img) == average_hash(shifted)
    # a structural edit (quadrant blanked) flips many bits
    edited = img.copy()
    edited[:16, :16] = 0
    assert _ham(average_hash(img), average_hash(edited)) > 8


def test_audio_hash_amplitude_invariance():
    t = np.arange(4000) / 8000.0
    s = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 880 * t)
    assert audio_spectral_hash(s) == audio_spectral_hash(0.2 * s)
    other = np.sin(2 * np.pi * 1700 * t)
    # occupancy hash: sparse spectra set few bits, but disjoint pitches must
    # differ in every occupied band
    assert _ham(audio_spectral_hash(s), audio_spectral_hash(other)) >= 3


def _media_df(spark, seed=7, n=60):
    media, pairs = generate_media(n, seed=seed)
    df = spark.createDataFrame(media, schema=MEDIA_SCHEMA)
    truth = {tuple(sorted(p)) for p in pairs.itertuples(index=False)}
    return df, truth


def test_decode_media_features_error_rows(spark):
    df, _ = _media_df(spark)
    feats = decode_media_features(df).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(feats) == df.count()  # every row comes back, good or bad
    bad = [r for r in feats if not r["ok"]]
    # the planted PNG/MP3/video junk rows fail with a message, never a crash
    assert len(bad) == 3
    assert all(r["err"] and r["phash"] is None for r in bad)
    ok_img = [r for r in feats if r["ok"] and r["media_type"] == "image"]
    assert all(r["width"] == 32 and r["height"] == 32 for r in ok_img)
    ok_aud = [r for r in feats if r["ok"] and r["media_type"] == "audio"]
    assert all(480 <= r["duration_ms"] <= 520 for r in ok_aud)
    assert all(len(by_id[r["media_id"]]["feature"]) == 4 for r in ok_img + ok_aud)


def test_media_near_dup_pairs_exact_recall(spark):
    """Planted perceptual dups (brightness-shifted images, gain-scaled audio)
    are found exactly; distinct items never pair (datagen enforces hash
    separation, so recall AND precision are 1.0 at the default radius)."""
    df, truth = _media_df(spark, seed=7)
    got = {
        tuple(sorted((r["media_id_a"], r["media_id_b"])))
        for r in media_near_dup_pairs(df).collect()
    }
    assert got == truth


def _encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal stdlib PNG encoder (8-bit grayscale, filter 0) — test fixture
    for the import-guarded Pillow branch; no Pillow needed to BUILD it."""
    import struct
    import zlib

    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _has_pillow() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed")
def test_pillow_branch_decodes_png():
    """Where Pillow exists, non-netpbm images flow through the same feature
    path: decode → average_hash, matching the netpbm-decoded twin exactly."""
    from camden_spark.multimodal import _decode_one, decode_image_pillow

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    png = _encode_png_gray(gray)
    arr = decode_image_pillow(png)
    assert arr.shape == (16, 16, 1) or arr.shape == (16, 16, 3)
    row = _decode_one("image", png)
    twin = _decode_one("image", encode_pnm(gray))
    assert row["width"] == 16 and row["height"] == 16
    assert row["phash"] == twin["phash"]


def test_png_without_pillow_is_error_row(spark):
    """The optional branch degrades per north rule B3: a PNG payload in a
    Pillow-less container becomes ok=false with the import error surfaced —
    never a task failure, and netpbm rows in the same batch still decode."""
    if _has_pillow():
        pytest.skip("Pillow installed — covered by test_pillow_branch_decodes_png")
    png = _encode_png_gray(np.zeros((4, 4), dtype=np.uint8))
    pnm = encode_pnm(np.zeros((4, 4), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(pnm))],
        "media_id long, media_type string, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_media_features(df).collect()}
    assert rows[1]["ok"] is False and "PIL" in rows[1]["err"]
    assert rows[2]["ok"] is True
