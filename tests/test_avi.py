"""MJPEG/AVI video path: RIFF container roundtrip, frame-sample
operator, pixel-level video features via the in-repo JPEG codec."""

import numpy as np
import pytest

from datamart_spark.avi import (
    AviError,
    avi_video_frames,
    encode_mjpeg_avi,
    is_avi,
    mjpeg_feature_extractor,
    parse_avi,
)
from datamart_spark.jpeg import decode_jpeg, encode_jpeg_color, encode_jpeg_gray

W, H = 48, 32


def _frames(n=5):
    out = []
    for i in range(n):
        img = np.zeros((H, W, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
        img[:, :, 1] = (i * 40) % 256
        img[:, :, 2] = np.linspace(0, 255, H, dtype=np.uint8)[:, None]
        out.append(img)
    return out


@pytest.fixture(scope="module")
def avi_payload():
    jpegs = [encode_jpeg_color(f, sampling=(1, 1)) for f in _frames()]
    return jpegs, encode_mjpeg_avi(jpegs, W, H, fps=10)


def test_container_metadata(avi_payload):
    jpegs, payload = avi_payload
    assert is_avi(payload)
    m = parse_avi(payload)
    assert (m["width"], m["height"]) == (W, H)
    assert m["codec"] == "MJPG"
    assert m["n_frames"] == len(jpegs)
    assert m["usec_per_frame"] == 100000
    assert abs(m["duration_sec"] - 0.5) < 1e-9


def test_frames_bit_identical(avi_payload):
    jpegs, payload = avi_payload
    got = list(avi_video_frames(payload))
    assert [i for i, _ in got] == list(range(len(jpegs)))
    assert [f for _, f in got] == jpegs  # byte-exact through the container


def test_odd_length_frame_padding():
    """A frame of odd byte length forces the RIFF pad byte; the walk
    must realign and the frame must come back without the pad."""
    jpegs = [encode_jpeg_gray(np.full((8, 8), 128, np.uint8))]
    if len(jpegs[0]) % 2 == 0:
        jpegs[0] += b""  # encoder output length is content-dependent
    jpegs.append(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    # make the first frame odd-length deterministically via a COM marker
    f0 = jpegs[0]
    com = b"\xff\xfe" + (3).to_bytes(2, "big") + b"x"
    f0 = f0[:2] + com + f0[2:]
    if len(f0) % 2 == 0:
        com = b"\xff\xfe" + (4).to_bytes(2, "big") + b"xy"
        f0 = jpegs[0][:2] + com + jpegs[0][2:]
    assert len(f0) % 2 == 1
    payload = encode_mjpeg_avi([f0, jpegs[1]], 8, 8)
    got = [f for _, f in avi_video_frames(payload)]
    assert got == [f0, jpegs[1]]


def test_pixel_decode_parity(avi_payload):
    """Frame pixels through the container == direct JPEG decode."""
    jpegs, payload = avi_payload
    for (_, frame), jpg in zip(avi_video_frames(payload), jpegs):
        assert np.array_equal(decode_jpeg(frame), decode_jpeg(jpg))


def test_feature_extractor_strides(avi_payload):
    _, payload = avi_payload
    full = mjpeg_feature_extractor(dim=8)(payload)
    strided = mjpeg_feature_extractor(dim=8, frame_stride=2)(payload)
    assert full.shape == strided.shape == (8,)
    assert abs(full.sum() - 1.0) < 1e-5 and abs(strided.sum() - 1.0) < 1e-5
    with pytest.raises(AviError):
        mjpeg_feature_extractor()(b"RIFF\x04\x00\x00\x00AVI ")


def test_not_avi():
    assert not is_avi(b"\x00" * 32)
    with pytest.raises(AviError):
        parse_avi(b"\x00" * 32)
    with pytest.raises(AviError):
        list(avi_video_frames(b"RIFX" + b"\x00" * 16))


def test_sample_video_frames_operator(spark, avi_payload):
    import pandas as pd

    from datamart_spark.multimodal import sample_video_frames

    jpegs, payload = avi_payload
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "payload": [payload, payload, None, b"not an avi"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = sample_video_frames(df, frame_stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    assert set(by_doc) == {1, 2}
    for d in (1, 2):
        assert [i for i, _ in sorted(by_doc[d])] == [0, 2, 4]
        assert [f for _, f in sorted(by_doc[d])] == [jpegs[0], jpegs[2], jpegs[4]]


def test_video_meta_covers_avi(spark, avi_payload):
    import pandas as pd

    from datamart_spark.multimodal import decode_video_meta, sniff_video

    _, payload = avi_payload
    meta = sniff_video(payload)
    assert meta == ("AVI", 0.5, W, H, "MJPG", 1)
    pdf = pd.DataFrame(
        {"doc_id": pd.array([1], dtype="int64"), "payload": [payload]}
    )
    row = decode_video_meta(spark.createDataFrame(pdf)).collect()[0]
    assert (row["brand"], row["width"], row["height"], row["codec"]) == (
        "AVI", W, H, "MJPG",
    )


def test_extract_image_features_with_video_extractor(spark, avi_payload):
    import pandas as pd

    from datamart_spark.multimodal import extract_image_features

    _, payload = avi_payload
    pdf = pd.DataFrame(
        {"doc_id": pd.array([7], dtype="int64"), "payload": [payload]}
    )
    out = extract_image_features(
        spark.createDataFrame(pdf), dim=8,
        extractor=mjpeg_feature_extractor(dim=8),
    ).collect()
    assert len(out) == 1 and len(out[0]["features"]) == 8


def _chunk(cc: bytes, body: bytes) -> bytes:
    import struct

    return cc + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")


def test_rec_list_grouped_frames(avi_payload):
    """Interleaved VFW-capture AVIs wrap frame bundles in 'LIST rec '
    groups inside movi — the frame walk must descend into them."""
    import struct

    jpegs, payload = avi_payload
    # rebuild the payload with each frame wrapped in its own rec list
    movi_body = b"".join(
        _chunk(b"LIST", b"rec " + _chunk(b"00dc", f)) for f in jpegs
    )
    movi = _chunk(b"LIST", b"movi" + movi_body)
    # reuse the original header (everything up to the movi LIST)
    idx = payload.index(b"LIST", 12)
    while payload[idx + 8:idx + 12] != b"movi":
        idx = payload.index(b"LIST", idx + 1)
    rebuilt_body = payload[8:idx] + movi
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_body)) + rebuilt_body
    got = [f for _, f in avi_video_frames(rebuilt)]
    assert got == jpegs


def test_codec_falls_back_to_strf_compression(avi_payload):
    """A NUL-filled strh fccHandler (common in real files) must not
    surface as a garbage codec — strf's biCompression is authoritative."""
    _, payload = avi_payload
    i = payload.index(b"vids") + 4
    assert payload[i:i + 4] == b"MJPG"
    nulled = payload[:i] + b"\x00\x00\x00\x00" + payload[i + 4:]
    assert parse_avi(nulled)["codec"] == "MJPG"  # from strf biCompression


def test_frame_stride_validated_at_build_time(spark, avi_payload):
    import pandas as pd

    from datamart_spark.multimodal import sample_video_frames

    _, payload = avi_payload
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.array([1], dtype="int64"), "payload": [payload]})
    )
    with pytest.raises(ValueError, match="frame_stride"):
        sample_video_frames(df, frame_stride=0)
    with pytest.raises(AviError, match="frame_stride"):
        mjpeg_feature_extractor(frame_stride=0)


def test_deeply_nested_rec_lists_no_recursion_error():
    """A crafted payload nesting thousands of rec lists must yield its
    frames (document order) without a RecursionError."""
    import struct

    frame = encode_jpeg_gray(np.full((8, 8), 7, np.uint8))
    inner = _chunk(b"00dc", frame)
    for _ in range(2000):
        inner = _chunk(b"LIST", b"rec " + inner)
    movi = _chunk(b"LIST", b"movi" + inner + _chunk(b"00dc", frame))
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got = [f for _, f in avi_video_frames(payload)]
    assert got == [frame, frame]  # nested child before the later sibling


def test_second_video_stream_cannot_reset_codec(avi_payload):
    """First video stream wins: a second vids strh with a NUL handler
    must not reset an already-detected codec."""
    import struct

    _, payload = avi_payload
    i = payload.index(b"LIST", 12)  # hdrl list
    assert payload[i + 8:i + 12] == b"hdrl"
    strh2 = b"vids" + b"\x00" * 4 + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0, 0) + struct.pack("<4H", 0, 0, 8, 8)
    strl2 = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh2))
    hdrl_end = i + 8 + struct.unpack("<I", payload[i + 4:i + 8])[0]
    grown = payload[i + 8:hdrl_end] + strl2
    rebuilt_hdrl = b"LIST" + struct.pack("<I", len(grown)) + grown
    body = payload[8:i] + rebuilt_hdrl + payload[hdrl_end:]
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_avi(rebuilt)["codec"] == "MJPG"
