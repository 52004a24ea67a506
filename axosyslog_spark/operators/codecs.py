"""Pure-numpy media codecs: BMP (24-bit uncompressed) and WAV (PCM16).

These two containers are simple enough to implement from their public
specifications with numpy + struct alone, which turns the multimodal
pipeline's decode/resize stages into REAL work inside this container
(no image/audio libraries available). Formats needing external codecs
(JPEG/PNG/MP4/...) remain behind the documented stub in multimodal.py
— the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), 24bpp, bottom-up
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects HxWx3 RGB")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # rows bottom-up, BGR order, padded to 4 bytes
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, HxWx3 uint8 RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    if flipped:
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)


def resize_nearest(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_side (no-op when
    already small enough) — the resample step of the resize stage."""
    h, w = pixels.shape[:2]
    scale = min(1.0, max_side / max(h, w, 1))
    if scale >= 1.0:
        return pixels
    nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return np.ascontiguousarray(pixels[yi][:, xi])


# ---------------------------------------------------------------------------
# WAV: RIFF/WAVE with fmt (PCM) + data chunks, 16-bit
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D int16 mono samples -> WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV bytes -> (rate, n_samples, duration_ms, int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate, channels, samples = None, 1, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = len(samples) // channels
    return rate, n, int(n * 1000 / rate), samples


# ---------------------------------------------------------------------------
# JPEG: SOF header probe (dimensions without a full decode)
# ---------------------------------------------------------------------------

# Start-of-frame markers carry (precision, height, width, components).
# 0xC0-0xCF are SOFn except DHT (0xC4), JPGext (0xC8) and DAC (0xCC),
# per ITU-T T.81 table B.1.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# Standalone markers with no length field: TEM, RST0-7, SOI, EOI.
_JPEG_BARE_MARKERS = frozenset({0x01, *range(0xD0, 0xD8), 0xD8, 0xD9})


def probe_jpeg(data: bytes) -> tuple[int, int, int]:
    """JPEG bytes -> (width, height, components) from the first SOFn
    segment, walking the marker stream only — entropy-coded data is
    never touched, so this is O(header) regardless of image size.
    Handles baseline (SOF0) and progressive (SOF2) alike and tolerates
    fill bytes (0xFF padding) between markers per T.81 B.1.1.2."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            raise ValueError(f"JPEG marker desync at offset {i}")
        # skip fill bytes
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        i += 2
        if marker in _JPEG_BARE_MARKERS:
            if marker == 0xD9:  # EOI before any SOF
                break
            continue
        if i + 2 > n:
            break
        (seg_len,) = struct.unpack(">H", data[i:i + 2])
        if seg_len < 2:
            raise ValueError("JPEG segment length < 2")
        if marker in _JPEG_SOF_MARKERS:
            if i + 8 > n:
                raise ValueError("truncated SOF segment")
            height, width = struct.unpack(">HH", data[i + 3:i + 7])
            components = data[i + 7]
            return (width, height, components)
        if marker == 0xDA:  # SOS: entropy data follows, SOF must precede
            break
        i += seg_len
    raise ValueError("no SOF marker found")


# ---------------------------------------------------------------------------
# PNG / GIF: fixed-offset header probes (public format specs; like the
# JPEG SOF walk these read dimensions without any pixel decode)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def probe_png(data: bytes) -> tuple[int, int, int]:
    """PNG bytes -> (width, height, bit_depth) from the IHDR chunk,
    which the spec requires to be the FIRST chunk (offset 8: length +
    'IHDR' + 13-byte payload)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    if len(data) < 8 + 8 + 13 or data[12:16] != b"IHDR":
        raise ValueError("PNG missing leading IHDR chunk")
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    depth = data[24]
    if not w or not h:
        raise ValueError("PNG IHDR with zero dimension")
    return w, h, depth


def probe_gif(data: bytes) -> tuple[int, int, int]:
    """GIF bytes -> (width, height, n_frames). Dimensions come from
    the fixed logical-screen descriptor; the frame count is the number
    of image-separator blocks (0x2C) found by walking the block
    structure (sub-block chains are length-prefixed, no pixel
    decode)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    flags = data[10]
    i = 13
    if flags & 0x80:  # global color table present
        i += 3 * (2 << (flags & 0x07))

    def _skip_subblocks(j: int) -> int:
        while j < len(data) and data[j]:
            j += 1 + data[j]
        return j + 1  # past the 0x00 terminator

    frames = 0
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i = _skip_subblocks(i + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            lflags = data[i + 9]
            i += 10
            if lflags & 0x80:  # local color table
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW minimum code size
            i = _skip_subblocks(i)
        else:
            raise ValueError(f"GIF block desync at offset {i}")
    if not frames:
        raise ValueError("GIF with no image blocks")
    return w, h, frames
