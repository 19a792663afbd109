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
restart intervals).  Video remains the documented stub: pass
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
    ``png.png_feature_extractor(dim)`` for PNG and
    ``jpeg.jpeg_feature_extractor(dim)`` for JPEG — baseline AND
    progressive, grayscale and YCbCr color, any integer subsampling.
    The remaining codecs (video) need a library this container lacks —
    pass ``extractor`` or this raises at plan-build time, not inside
    executors."""
    if extractor is None:
        raise NotImplementedError(
            "pass `extractor` (bytes -> np.ndarray[dim]): "
            "png.png_feature_extractor(dim) for PNG or "
            "jpeg.jpeg_feature_extractor(dim) for JPEG (baseline + "
            "progressive, grayscale + YCbCr color; both in-repo, real); "
            "an ffmpeg-based one in production for video"
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
