"""Pure-Python PNG decoder: roundtrip, all five filters, palette, and
the real pixel-feature extractor through the multimodal Spark kernel."""

import struct
import zlib

import numpy as np
import pytest

from datamart_spark.png import (
    PngError,
    _SIG,
    decode_png,
    encode_png_rgb,
    png_feature_extractor,
)


def _chunk(ctype, data):
    c = struct.pack(">I", len(data)) + ctype + data
    return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)


def _encode_with_filters(img, filters):
    """Reference encoder applying a chosen filter per row."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    rows = []
    for y, f in enumerate(filters):
        cur = flat[y]
        enc = cur.copy()
        if f == 1:
            for x in range(w * ch - 1, ch - 1, -1):
                enc[x] = (enc[x] - cur[x - ch]) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                enc[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))


def test_roundtrip_all_channel_counts():
    rng = np.random.default_rng(0)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 17, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png_rgb(img)), img)


def test_all_filter_types_decode():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    png = _encode_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(png), img)


def test_palette_expansion():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (3, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 3, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), pal[idx])


def test_rejects_non_png_and_unsupported():
    with pytest.raises(PngError):
        decode_png(b"\xff\xd8\xff\xe0 jpeg")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    interlaced = bytearray(encode_png_rgb(img))
    interlaced[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(PngError):
        decode_png(bytes(interlaced))


def test_extractor_luma_histogram():
    # all-black vs all-white end up in the first vs last bin
    black = encode_png_rgb(np.zeros((4, 4, 3), dtype=np.uint8))
    white = encode_png_rgb(np.full((4, 4, 3), 255, dtype=np.uint8))
    fx = png_feature_extractor(dim=8)
    assert fx(black)[0] == 1.0 and fx(black)[1:].sum() == 0.0
    assert fx(white)[-1] == 1.0


def test_real_extractor_through_spark_kernel(spark):
    """The multimodal operator runs with a REAL decoder now — the codec
    boundary is closed for PNG (JPEG stays a documented stub)."""
    from datamart_spark.multimodal import extract_image_features

    rng = np.random.default_rng(4)
    rows = [
        (i, bytearray(encode_png_rgb(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8))))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = extract_image_features(df, extractor=png_feature_extractor(dim=8))
    got = {r["doc_id"]: r["features"] for r in out.collect()}
    assert len(got) == 8
    for i, payload in rows:
        want = png_feature_extractor(dim=8)(bytes(payload))
        assert np.allclose(got[i], want)
