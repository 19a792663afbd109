"""Multimodal columns: opaque binary payloads + typed metadata.

Web-crawl corpora carry images/audio/video alongside HTML.  The engine
treats them as ``binary`` columns with a typed metadata struct; decode
and feature-extraction run as Arrow-batched ``mapInPandas`` kernels so
the Spark-side plumbing (schema, partitioning, batch shape) is real and
tested even where the actual codec is not available in this container.

The codec boundary is explicit: ``decode_image_meta`` parses real PNG /
JPEG / GIF headers (pure-Python, deterministic — enough for sizing and
filtering pipelines); ``extract_image_features`` needs a pixel decoder.
Two are REAL and in-repo: PNG (``png.decode_png`` — stdlib zlib + numpy
unfiltering) and JPEG (``jpeg.decode_jpeg`` — pure-Python T.81 Huffman
+ numpy IDCT; baseline AND progressive, grayscale and YCbCr color,
restart intervals).  Video METADATA is real too: ``sniff_video`` /
``decode_video_meta`` parse MP4/ISO-BMFF boxes (ftyp brand, mvhd
duration, tkhd dimensions, stsd codec fourcc — ISO/IEC 14496-12 is
public struct layout) and RIFF/AVI headers (``avi.parse_avi``).  Video
FRAME decode is REAL for one real-world codec: MJPEG-in-AVI frames are
plain JPEGs, so ``sample_video_frames`` (container walk → per-frame
binary rows) and ``avi.mjpeg_feature_extractor`` (frame-sampled pixel
histograms via the in-repo JPEG codec) run with no external library.
Other video codecs (H.264 etc.) remain the documented boundary: pass
``extractor`` or get ``NotImplementedError`` at plan-build time.

Scale: payload columns are the heavy bytes — keep them OUT of shuffles.
All kernels here are narrow (mapInPandas, no exchange); pipelines
should project metadata early and join features back by key, never
shuffle the binary column itself.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def sniff_image(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """Header-only decode of PNG / GIF / JPEG dimensions (pure function
    of the bytes — per-row invariance holds like for extract_text)."""
    if payload is None or len(payload) < 10:
        return None, None, None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return "png", int(w), int(h)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", int(w), int(h)
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to SOF0/2
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload binary) → typed image metadata, Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            metas = [sniff_image(bytes(p) if p is not None else None) for p in b[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "format": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "n_bytes": [len(p) if p is not None else 0 for p in b[payload_col]],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(kernel, schema=IMAGE_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

#: ISO-BMFF container boxes whose payload is a sequence of child boxes
_BMFF_CONTAINERS = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl"))


def _bmff_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the sibling boxes in
    buf[start:end] (ISO/IEC 14496-12 §4.2: 32-bit size, fourcc; size 1
    ⇒ 64-bit largesize follows; size 0 ⇒ box runs to the end)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", buf[i:i + 4])[0]
        btype = buf[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return  # malformed/truncated: stop, never over-read
        yield btype, i + hdr, i + size
        i += size


def sniff_video(payload: bytes):
    """MP4 / ISO-BMFF metadata from pure struct parsing (ISO/IEC
    14496-12 is public): ftyp major brand, mvhd duration (timescale
    units → seconds), the video track's tkhd dimensions (16.16 fixed
    point) and its stsd sample-entry fourcc (codec), and the track
    count.  Frame/pixel decode stays the documented codec boundary
    (``extract_image_features``'s ``extractor``); every sizing /
    filtering / budgeting pipeline need is served from here.

    RIFF/AVI payloads return the same tuple shape (brand "AVI",
    duration from avih frame count × frame duration, strh vids fourcc
    as codec, stream count as n_tracks) via ``avi.parse_avi``.

    → (brand, duration_sec, width, height, codec, n_tracks) or None
    when the payload is neither ISO-BMFF nor AVI."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .avi import parse_avi

        m = parse_avi(payload)
        return ("AVI", m["duration_sec"], m["width"], m["height"],
                m["codec"], m["n_streams"])
    if payload[4:8] != b"ftyp":
        return None
    brand = payload[8:12].decode("latin-1").strip() or None
    duration = None
    width = height = None
    codec = None
    n_tracks = 0

    def fixed16(b: bytes) -> int:
        return struct.unpack(">I", b)[0] >> 16

    for btype, s, e in _bmff_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for t2, s2, e2 in _bmff_boxes(payload, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = payload[s2]
                if ver == 1 and e2 - s2 >= 32:
                    ts = struct.unpack(">I", payload[s2 + 20:s2 + 24])[0]
                    dur = struct.unpack(">Q", payload[s2 + 24:s2 + 32])[0]
                else:
                    ts = struct.unpack(">I", payload[s2 + 12:s2 + 16])[0]
                    dur = struct.unpack(">I", payload[s2 + 16:s2 + 20])[0]
                if ts:
                    duration = dur / ts
            elif t2 == b"trak":
                n_tracks += 1
                tk_w = tk_h = None
                handler = None
                entry = None
                for t3, s3, e3 in _bmff_boxes(payload, s2, e2):
                    if t3 == b"tkhd" and e3 - s3 >= 84:
                        # v0 payload: ver/flags 4, ctime/mtime/id/res/
                        # dur 5×4, res 8, layer/alt/vol/res 4×2,
                        # matrix 36 → width at 76; v1 adds 12 (64-bit
                        # ctime/mtime/duration) → width at 88
                        ver = payload[s3]
                        off = (s3 + 88) if ver == 1 else (s3 + 76)
                        if off + 8 <= e3:
                            tk_w = fixed16(payload[off:off + 4])
                            tk_h = fixed16(payload[off + 4:off + 8])
                    elif t3 == b"mdia":
                        for t4, s4, e4 in _bmff_boxes(payload, s3, e3):
                            if t4 == b"hdlr" and e4 - s4 >= 12:
                                handler = payload[s4 + 8:s4 + 12]
                            elif t4 == b"minf":
                                for t5, s5, e5 in _bmff_boxes(payload, s4, e4):
                                    if t5 != b"stbl":
                                        continue
                                    for t6, s6, e6 in _bmff_boxes(
                                        payload, s5, e5
                                    ):
                                        if t6 == b"stsd" and e6 - s6 >= 16:
                                            entry = payload[s6 + 12:s6 + 16]
                if handler == b"vide" or (handler is None and tk_w):
                    if tk_w:
                        width, height = tk_w, tk_h
                    if entry:
                        codec = entry.decode("latin-1").strip() or None
    return brand, duration, width, height, codec, n_tracks


def decode_video_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload binary) → typed MP4 metadata, Arrow-batched —
    the video analog of ``decode_image_meta``: narrow mapInPandas, the
    binary column is never shuffled."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [bytes(p) if p is not None else None for p in b[payload_col]]
            metas = [sniff_video(p) for p in payloads]
            fmts = [
                None if m is None
                else ("avi" if p[:4] == b"RIFF" else "mp4")
                for p, m in zip(payloads, metas)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "format": fmts,
                    "brand": [m[0] if m else None for m in metas],
                    "duration_sec": [m[1] if m else None for m in metas],
                    "width": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[3] if m else None for m in metas], dtype="Int32"
                    ),
                    "codec": [m[4] if m else None for m in metas],
                    "n_tracks": pd.array(
                        [m[5] if m else None for m in metas], dtype="Int32"
                    ),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in b[payload_col]
                    ],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, schema=VIDEO_META_SCHEMA
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame, payload_col: str = "payload", frame_stride: int = 1
) -> DataFrame:
    """Frame-sample operator over MJPEG/AVI binary columns: every
    ``frame_stride``-th video frame as its own (doc_id, frame_idx,
    frame-JPEG binary) row — each emitted frame is a standalone JPEG
    the in-repo codec decodes (``jpeg.decode_jpeg``).  Non-AVI and
    null payloads contribute no rows (sizing/filtering pipelines
    select the container format with ``decode_video_meta`` first).

    Scale: narrow mapInPandas — frames are emitted inside the task
    that read the payload partition, so the heavy bytes fan out
    without a shuffle; downstream per-frame work (feature extraction,
    dedup) keys on (doc_id, frame_idx)."""
    if frame_stride < 1:
        # plan-build-time validation, same discipline as
        # extract_image_features — never a ZeroDivisionError inside
        # executors
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    from .avi import avi_video_frames, is_avi

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, p in zip(b["doc_id"], b[payload_col]):
                if p is None:
                    continue
                p = bytes(p)
                if not is_avi(p):
                    continue
                for i, f in avi_video_frames(p):
                    if i % frame_stride:
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, schema=VIDEO_FRAME_SCHEMA
    )


def feature_schema(dim: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    extractor: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Pixel-level feature extraction.  In-repo real decoders:
    ``png.png_feature_extractor(dim)`` for PNG,
    ``jpeg.jpeg_feature_extractor(dim)`` for JPEG — baseline AND
    progressive, grayscale and YCbCr color, any integer subsampling —
    and ``avi.mjpeg_feature_extractor(dim, frame_stride)`` for
    MJPEG/AVI video (frame-sampled luma histograms through the same
    JPEG codec).  Other video codecs need a library this container
    lacks — pass ``extractor`` or this raises at plan-build time, not
    inside executors."""
    if extractor is None:
        raise NotImplementedError(
            "pass `extractor` (bytes -> np.ndarray[dim]): "
            "png.png_feature_extractor(dim) for PNG, "
            "jpeg.jpeg_feature_extractor(dim) for JPEG (baseline + "
            "progressive, grayscale + YCbCr color), "
            "avi.mjpeg_feature_extractor(dim) for MJPEG/AVI video "
            "(all in-repo, real); an ffmpeg-based one in production "
            "for other video codecs"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                extractor(bytes(p)).astype(np.float32).tolist() if p is not None else None
                for p in b[payload_col]
            ]
            yield pd.DataFrame({"doc_id": b["doc_id"], "features": feats})

    return df.select("doc_id", payload_col).mapInPandas(kernel, schema=feature_schema(dim))


def byte_histogram_extractor(dim: int = 16) -> Callable[[bytes], np.ndarray]:
    """Deterministic stand-in extractor: normalized histogram of byte
    values bucketed into `dim` bins — real enough to test partitioning,
    batch shapes, and downstream ANN joins."""

    def fn(payload: bytes) -> np.ndarray:
        a = np.frombuffer(payload, dtype=np.uint8)
        if a.size == 0:
            return np.zeros(dim, dtype=np.float32)
        hist, _ = np.histogram(a, bins=dim, range=(0, 256))
        return (hist / a.size).astype(np.float32)

    return fn
