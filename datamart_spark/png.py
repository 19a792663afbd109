"""Pure-Python PNG pixel decoder (stdlib zlib + numpy unfiltering).

The sandbox has no image codec libraries, but PNG needs none: the
format is zlib-compressed scanlines with 5 per-row predictors (RFC
2083).  This decoder makes ``multimodal.extract_image_features`` a REAL
operator for PNG payloads instead of an injected-stub boundary — JPEG
stays an explicit stub (a DCT codec is out of scope).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced.  Deterministic pure function
of the bytes (per-row invariance like extract_text).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array (palette
    expanded to RGB)."""
    if not payload or payload[:8] != _SIG:
        raise PngError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth} (8 only)")
    if interlace != 0:
        raise PngError("interlaced PNG unsupported")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")

    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * ch
    if raw.size != height * (stride + 1):
        raise PngError("scanline size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)

    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f = filters[y]
        cur = rows[y]
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub: recurrence over pixels within the row
            line = cur.copy()
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = (cur + prior) & 0xFF
        elif f == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
            out[y] = line
        else:
            raise PngError(f"bad filter {f}")

    img = out.astype(np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png_rgb(img: np.ndarray) -> bytes:
    """Minimal RGB(A)/gray PNG encoder (filter 0 rows) — used by tests
    and the synthetic multimodal corpus; roundtrips with decode_png."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_feature_extractor(dim: int = 16):
    """Real pixel-level extractor for PNG payloads: normalized luminance
    histogram over ``dim`` bins (luma = Rec.601 weights).  Drop-in for
    ``multimodal.extract_image_features(extractor=...)``."""

    def fn(payload: bytes) -> np.ndarray:
        img = decode_png(payload).astype(np.float64)
        if img.shape[2] >= 3:
            luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        else:
            luma = img[:, :, 0]
        hist, _ = np.histogram(luma, bins=dim, range=(0, 256))
        return (hist / luma.size).astype(np.float32)

    return fn
