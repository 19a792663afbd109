"""Structured-Streaming ingest + multimodal binary-column plumbing."""

import struct

import numpy as np
import pytest

from datamart_spark.corpus import generate_documents, generate_documents_pandas
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


def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    import struct

    if large:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(w=640, h=360, dur_units=9000, timescale=600, codec=b"avc1",
         version0=True) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr,
    minf(stbl(stsd[avc1])))))."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    if version0:
        mvhd = _box(b"mvhd", b"\x00" + b"\x00" * 3 + b"\x00" * 8
                    + struct.pack(">II", timescale, dur_units) + b"\x00" * 80)
    else:
        mvhd = _box(b"mvhd", b"\x01" + b"\x00" * 3 + b"\x00" * 16
                    + struct.pack(">IQ", timescale, dur_units) + b"\x00" * 80)
    # tkhd v0: ver/flags(4) ctime(4) mtime(4) id(4) res(4) dur(4)
    # res(8) layer(2) alt(2) vol(2) res(2) matrix(36) width(4) height(4)
    tkhd = _box(b"tkhd", b"\x00" + b"\x00" * 3 + b"\x00" * 72
                + struct.pack(">II", w << 16, h << 16))
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    # stsd: ver/flags(4) entry_count(4) entry{size(4) fourcc(4) ...}
    entry = struct.pack(">I", 16) + codec + b"\x00" * 8
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak, large=True)  # exercise largesize
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def test_sniff_video_mp4():
    from datamart_spark.multimodal import sniff_video

    got = sniff_video(_mp4())
    assert got == ("isom", 15.0, 640, 360, "avc1", 1)
    # 64-bit mvhd (version 1) parses identically
    assert sniff_video(_mp4(version0=False)) == ("isom", 15.0, 640, 360,
                                                 "avc1", 1)
    assert sniff_video(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None
    assert sniff_video(None) is None
    # truncated moov: no crash, partial metadata only
    t = _mp4()
    assert sniff_video(t[:40]) is not None or sniff_video(t[:40]) is None


def test_decode_video_meta_spark(spark):
    from datamart_spark.multimodal import decode_video_meta

    rows = [(1, _mp4(1280, 720, 1200, 600, b"hvc1")), (2, b"notavideo!!!"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_video_meta(df).collect()}
    assert got[1]["format"] == "mp4" and got[1]["brand"] == "isom"
    assert got[1]["width"] == 1280 and got[1]["height"] == 720
    assert got[1]["duration_sec"] == 2.0 and got[1]["codec"] == "hvc1"
    assert got[1]["n_tracks"] == 1
    assert got[2]["format"] is None
    assert got[3]["n_bytes"] == 0


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


def test_ingest_and_index_end_to_end(spark, tmp_path):
    """§2.9 full loop: stream-drain new pages → contiguous doc_ids →
    corpus append → grown-corpus resume rebuilds only the delta — and
    the new pages are immediately searchable, rank-identical to a
    fresh build over the same final corpus."""
    from datamart_spark.corpus import _VOCAB
    from datamart_spark.index import IndexCatalog, build_index
    from datamart_spark.query import bm25_topk_blockmax
    from datamart_spark.streaming.ingest import ingest_and_index

    landing = str(tmp_path / "landing")
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    cat = IndexCatalog(str(tmp_path / "cat"))

    docs = generate_documents(spark, 600).drop("doc_id")
    d400 = docs.orderBy("url").limit(400)
    d400.write.parquet(landing)
    m1 = ingest_and_index(spark, landing, corpus_dir, ckpt, cat)
    assert m1["n_docs"] == 400

    # batch 2: 200 more pages land; resume indexes only the delta
    rest = docs.join(d400.select("url"), "url", "left_anti")
    rest.write.mode("append").parquet(landing)
    m2 = ingest_and_index(spark, landing, corpus_dir, ckpt, cat)
    assert m2["n_docs"] == 600
    assert m2["built_shards_this_run"]  # delta shards rebuilt
    assert set(m2["built_shards_this_run"]) < set(range(m2["n_shards"] + 1))

    # searchable + rank-identical to a fresh build over the same corpus
    fresh = IndexCatalog(str(tmp_path / "fresh"))
    build_index(spark.read.parquet(corpus_dir), fresh, resume=False)
    q = f"{_VOCAB[40]} {_VOCAB[300]}"
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk_blockmax(spark, cat, q, k=15).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk_blockmax(spark, fresh, q, k=15).collect()]
    assert a == b and len(a) > 0


def test_stateful_recrawl_counter_across_drains(spark, tmp_path):
    """§2.9 custom stateful operator (applyInPandasWithState): per-url
    crawl counters must ACCUMULATE across availableNow drains via the
    checkpointed state store — run 2 sees run 1's counts without any
    corpus rescan."""
    from pyspark.sql import functions as F

    from datamart_spark.streaming.state import latest_crawl_state, track_recrawls

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = generate_documents(spark, 60)
    # drain 1: urls 0..39 once
    docs.where("doc_id < 40").write.parquet(landing)
    track_recrawls(spark, landing, out, ckpt)
    s1 = {r["url"]: r["n_crawls"] for r in latest_crawl_state(spark, out).collect()}
    assert len(s1) == 40 and set(s1.values()) == {1}

    # drain 2: urls 20..59 land again (20..39 are RE-crawls)
    docs.where("doc_id >= 20").withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
    ).write.mode("append").parquet(landing)
    track_recrawls(spark, landing, out, ckpt)
    s2 = {r["url"]: r["n_crawls"] for r in latest_crawl_state(spark, out).collect()}
    assert len(s2) == 60
    pdf = generate_documents_pandas(60)
    for i, url in enumerate(pdf["url"]):
        assert s2[url] == (2 if 20 <= i < 40 else 1), (i, url, s2[url])

    # first/last seen bookkeeping: recrawled urls span the 10-day shift
    row = latest_crawl_state(spark, out).where(
        F.col("n_crawls") == 2
    ).select(F.min("first_seen").alias("f"), F.max("last_seen").alias("l")).collect()[0]
    assert row["f"] < row["l"]
