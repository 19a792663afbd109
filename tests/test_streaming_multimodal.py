"""Structured-Streaming ingest + multimodal binary-column plumbing."""

import struct

import numpy as np
import pytest

from datamart_spark.corpus import generate_documents
from datamart_spark.multimodal import (
    byte_histogram_extractor,
    decode_image_meta,
    extract_image_features,
    sniff_image,
)
from datamart_spark.streaming import incremental_ingest
from datamart_spark.streaming.ingest import latest_per_url


def test_incremental_ingest_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    dest = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    docs = generate_documents(spark, 50)
    docs.where("doc_id < 30").write.parquet(landing)
    incremental_ingest(spark, landing, dest, ckpt)
    assert spark.read.parquet(dest).count() == 30

    # second batch lands; availableNow drains ONLY the new files
    docs.where("doc_id >= 30").write.mode("append").parquet(landing)
    incremental_ingest(spark, landing, dest, ckpt)
    got = spark.read.parquet(dest)
    assert got.count() == 50
    assert got.select("doc_id").distinct().count() == 50

    # re-run with nothing new: no duplicates (exactly-once)
    incremental_ingest(spark, landing, dest, ckpt)
    assert spark.read.parquet(dest).count() == 50


def test_latest_per_url(spark, tmp_path):
    import pandas as pd

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1", "u1", "u2"],
                "doc_id": [1, 2, 3],
                "ingest_time": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-01"]
                ),
            }
        )
    )
    got = {r["url"]: r["doc_id"] for r in latest_per_url(corpus).collect()}
    assert got == {"u1": 2, "u2": 3}


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h)


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", h, w) + b"\x01"
    return b"\xff\xd8" + app0 + sof


def test_sniff_image():
    assert sniff_image(_png(640, 480)) == ("png", 640, 480)
    assert sniff_image(_gif(13, 7)) == ("gif", 13, 7)
    assert sniff_image(_jpeg(100, 50)) == ("jpeg", 100, 50)
    assert sniff_image(b"plainbytesxx") == (None, None, None)
    assert sniff_image(None) == (None, None, None)


def test_decode_image_meta_spark(spark):
    rows = [(1, _png(10, 20)), (2, _gif(3, 4)), (3, b"junkjunkjunk"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert got[1]["format"] == "png" and got[1]["width"] == 10 and got[1]["height"] == 20
    assert got[2]["format"] == "gif"
    assert got[3]["format"] is None
    assert got[4]["n_bytes"] == 0


def test_extract_features_requires_decoder(spark):
    df = spark.createDataFrame([(1, b"x" * 32)], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError):
        extract_image_features(df)


def test_extract_features_with_stub(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256))), (2, b"\x00" * 64)], "doc_id long, payload binary"
    )
    out = extract_image_features(df, extractor=byte_histogram_extractor(16))
    got = {r["doc_id"]: r["features"] for r in out.collect()}
    assert len(got[1]) == 16
    assert got[1] == pytest.approx([1 / 16] * 16)
    assert got[2][0] == pytest.approx(1.0)
    assert sum(got[2]) == pytest.approx(1.0)
    # deterministic: matches driver-side computation
    expect = byte_histogram_extractor(16)(bytes(range(256))).tolist()
    assert got[1] == pytest.approx(expect)
