"""Pure-numpy BMP/WAV codecs + the real multimodal decode path."""

from __future__ import annotations

import numpy as np
import pytest

from axosyslog_spark.operators import codecs


def _pattern(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx % 256, yy % 256, (xx + yy) % 256], axis=2).astype(np.uint8)


def test_bmp_roundtrip_exact():
    for w, h in [(1, 1), (3, 2), (16, 16), (37, 21)]:  # odd widths hit padding
        px = _pattern(w, h)
        data = codecs.encode_bmp(px)
        assert data[:2] == b"BM"
        w2, h2, back = codecs.decode_bmp(data)
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"NOTABMP")


def test_resize_nearest():
    px = _pattern(100, 60)
    small = codecs.resize_nearest(px, 50)
    assert max(small.shape[:2]) == 50 and small.shape == (30, 50, 3)
    assert np.array_equal(codecs.resize_nearest(px, 200), px)  # no upscale


def test_wav_roundtrip():
    samples = (np.sin(np.arange(1600) * 0.02) * 20000).astype(np.int16)
    data = codecs.encode_wav(samples, rate=16_000)
    rate, n, dur_ms, back = codecs.decode_wav(data)
    assert rate == 16_000 and n == 1600 and dur_ms == 100
    assert np.array_equal(back, samples)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxNOPE")


def test_real_media_pipeline(spark):
    """synthesize_real_media -> decode_media -> resize_images with
    ACTUAL BMP/WAV bytes through the Arrow plumbing."""
    from axosyslog_spark.operators import multimodal

    ids = spark.range(0, 10)
    media = multimodal.synthesize_real_media(ids, "id")
    rows = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert set(rows) == set(range(10))
    for mid, r in rows.items():
        if mid % 2 == 0:
            assert r["kind"] == "image" and r["width"] >= 16 and r["duration_ms"] == 0
        else:
            assert r["kind"] == "audio" and r["width"] == 0 and r["duration_ms"] > 0

    resized = {r["media_id"]: r for r in multimodal.resize_images(media, max_side=12).collect()}
    assert set(resized) == {0, 2, 4, 6, 8}
    for r in resized.values():
        assert max(r["width"], r["height"]) <= 12
        # the re-encoded payload is itself a valid BMP of the new size
        w, h, _ = codecs.decode_bmp(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])
