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


def _tiny_jpeg(width, height, components=3, sof=0xC0, extra_fill=False):
    """Structurally-valid JPEG header stream: SOI, APP0/JFIF, DQT,
    SOFn with the given dimensions, SOS, EOI."""
    import struct

    out = bytearray(b"\xff\xd8")                      # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif   # APP0
    dqt = b"\x00" + bytes(64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt     # DQT
    if extra_fill:
        out += b"\xff"                                 # fill byte before marker
    comp = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(components)
    )
    sof_body = struct.pack(">BHHB", 8, height, width, components) + comp
    out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sof_body)) + sof_body
    out += b"\xff\xda" + struct.pack(">H", 4) + b"\x01\x00"        # SOS
    out += b"\x12\x34"                                  # entropy bytes
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def test_jpeg_sof_probe_baseline_and_progressive():
    assert codecs.probe_jpeg(_tiny_jpeg(640, 480)) == (640, 480, 3)
    assert codecs.probe_jpeg(_tiny_jpeg(31, 7, components=1, sof=0xC2)) == (31, 7, 1)
    # fill bytes between markers are legal (T.81 B.1.1.2)
    assert codecs.probe_jpeg(_tiny_jpeg(100, 200, extra_fill=True)) == (100, 200, 3)


def test_jpeg_probe_rejects_bad_payloads():
    with pytest.raises(ValueError, match="SOI"):
        codecs.probe_jpeg(b"BM123456")
    with pytest.raises(ValueError, match="no SOF"):
        # SOI followed immediately by EOI
        codecs.probe_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        codecs.probe_jpeg(b"\xff\xd8\x00\x00\x00")


def test_decode_media_probes_real_jpeg(spark):
    from axosyslog_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        (1, "image", bytearray(_tiny_jpeg(320, 240)), "image/jpeg"),
        (2, "image", bytearray(_tiny_jpeg(12, 34, sof=0xC2)), "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: (r["width"], r["height"]) for r in decode_media(df).collect()}
    assert got == {1: (320, 240), 2: (12, 34)}


def _tiny_png(w, h, depth=8):
    import struct
    ihdr = struct.pack(">II", w, h) + bytes([depth, 2, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + ihdr + b"\x00\x00\x00\x00")


def _tiny_gif(w, h, frames=1, animated_ext=False):
    import struct
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
    for _ in range(frames):
        if animated_ext:  # graphic control extension before each frame
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + b"\x03\x01\x02\x03" + b"\x00"  # lzw min + subblock
    return out + b"\x3b"


def test_probe_png():
    assert codecs.probe_png(_tiny_png(640, 480)) == (640, 480, 8)
    assert codecs.probe_png(_tiny_png(1, 99999, depth=16)) == (1, 99999, 16)
    import pytest
    with pytest.raises(ValueError):
        codecs.probe_png(b"BM not a png")
    with pytest.raises(ValueError):
        codecs.probe_png(_tiny_png(0, 5))


def test_probe_gif():
    assert codecs.probe_gif(_tiny_gif(320, 200)) == (320, 200, 1)
    # animated: frame count via the block walk, extensions skipped
    assert codecs.probe_gif(
        _tiny_gif(16, 16, frames=3, animated_ext=True)
    ) == (16, 16, 3)
    import pytest
    with pytest.raises(ValueError):
        codecs.probe_gif(b"GIF89a" + b"\x00" * 3)  # truncated
    with pytest.raises(ValueError):
        codecs.probe_gif(b"JIF89a" + b"\x00" * 20)
