"""AVI (RIFF) container parsing + MJPEG frame access — pure struct,
no codec library.

The multimodal boundary so far (multimodal.py): container METADATA is
real for ISO-BMFF, but frame/pixel decode of video needed an external
codec.  MJPEG closes that honestly for one real-world codec: an MJPEG
AVI's frame stream is a sequence of ordinary JPEG images inside RIFF
chunks, and this repo carries a full baseline+progressive JPEG codec
(jpeg.py).  So for 'MJPG' streams, frame sampling and pixel decode are
as real as the image path — RIFF walk → per-frame JPEG bytes →
decode_jpeg.

Format (public: Microsoft AVI RIFF spec / OpenDML):

  'RIFF' size 'AVI '
    LIST 'hdrl'
      'avih' (56 B): usec/frame, ..., total frames, streams, w, h
      LIST 'strl' per stream:
        'strh' (56 B): fccType ('vids'/'auds'), fccHandler ('MJPG'),
                        scale/rate (fps = rate/scale), length
        'strf' : BITMAPINFOHEADER for video
    LIST 'movi'
      '##dc'/'##db' size <frame bytes>   (word-aligned: odd ⇒ pad byte)
    'idx1' : (ckid, flags, offset, size) per chunk

All integers little-endian; chunk bodies are word-aligned.

Reference scope note: the reference profiles video files only by
name/extension (lib_profiler has no video decoding at all); this module
is part of the beyond-reference multimodal surface the training-data
pipeline needs (frame-sample → feature-extract over binary columns).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


class AviError(ValueError):
    pass


def _chunks(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_end) for sibling RIFF
    chunks in buf[start:end]; advances over the word-alignment pad."""
    i = start
    while i + 8 <= end:
        cc = buf[i:i + 4]
        size = struct.unpack("<I", buf[i + 4:i + 8])[0]
        ps = i + 8
        pe = min(ps + size, end)
        yield cc, ps, pe
        i = ps + size + (size & 1)


def is_avi(payload: bytes) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def parse_avi(payload: bytes) -> dict:
    """Container metadata: {width, height, usec_per_frame, n_frames,
    n_streams, codec, duration_sec}.  Raises AviError when the payload
    is not an AVI."""
    if not is_avi(payload):
        raise AviError("not a RIFF/AVI payload")
    meta = {
        "width": None, "height": None, "usec_per_frame": None,
        "n_frames": None, "n_streams": None, "codec": None,
        "duration_sec": None,
    }
    for cc, s, e in _chunks(payload, 12, len(payload)):
        if cc != b"LIST" or payload[s:s + 4] != b"hdrl":
            continue
        for c2, s2, e2 in _chunks(payload, s + 4, e):
            if c2 == b"avih" and e2 - s2 >= 40:
                (usec, _mbps, _pad, _flags, total, _init, streams, _buf,
                 w, h) = struct.unpack("<10I", payload[s2:s2 + 40])
                meta.update(
                    usec_per_frame=usec, n_frames=total,
                    n_streams=streams, width=w, height=h,
                )
            elif c2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                in_vids = False
                for c3, s3, e3 in _chunks(payload, s2 + 4, e2):
                    if c3 == b"strh" and e3 - s3 >= 8:
                        in_vids = payload[s3:s3 + 4] == b"vids"
                        # first video stream wins: a later vids strh
                        # (NUL-filled or not) must not reset a codec
                        # already detected
                        if in_vids and meta["codec"] is None:
                            meta["codec"] = _fourcc(payload[s3 + 4:s3 + 8])
                    elif c3 == b"strf" and in_vids and e3 - s3 >= 20:
                        # strf is BITMAPINFOHEADER; biCompression (bytes
                        # 16:20) is the authoritative codec — real-world
                        # writers often NUL-fill strh's fccHandler
                        if meta["codec"] is None:
                            meta["codec"] = _fourcc(payload[s3 + 16:s3 + 20])
    if meta["n_frames"] and meta["usec_per_frame"]:
        meta["duration_sec"] = meta["n_frames"] * meta["usec_per_frame"] / 1e6
    return meta


def _fourcc(raw: bytes) -> str | None:
    """Codec fourcc → str; NUL-filled / space-padded handlers (common in
    real AVIs) come back as None so the strf fallback can apply."""
    return raw.strip(b"\x00 ").decode("latin-1") or None


def _movi_video_chunks(payload: bytes, start: int, end: int):
    """Video data chunks ('##dc'/'##db') under a movi span, descending
    into 'LIST rec ' groups (interleaved VFW-capture AVIs wrap each
    frame bundle in a rec list — AVI RIFF spec, movi chunk grouping).
    Explicit iterator stack, not recursion: a crafted payload can nest
    rec lists thousands deep, and an untrusted corpus document must
    surface as an ordinary empty/garbled result, never a
    RecursionError that kills the executor task.  Document order is
    preserved — a rec list's children are walked before its later
    siblings, exactly as the recursive form would."""
    stack = [_chunks(payload, start, end)]
    while stack:
        descended = False
        for cc, s, e in stack[-1]:
            if cc == b"LIST" and payload[s:s + 4] == b"rec ":
                stack.append(_chunks(payload, s + 4, e))
                descended = True
                break
            if cc[2:4] in (b"dc", b"db"):
                yield s, e
        if not descended:
            stack.pop()


def avi_video_frames(payload: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_idx, frame_bytes) for every video chunk ('##dc' /
    '##db') in the movi list — including chunks grouped inside
    'LIST rec ' — in stream order.  For an 'MJPG' stream each
    frame_bytes is a standalone JPEG decodable by jpeg.decode_jpeg."""
    if not is_avi(payload):
        raise AviError("not a RIFF/AVI payload")
    idx = 0
    for cc, s, e in _chunks(payload, 12, len(payload)):
        if cc != b"LIST" or payload[s:s + 4] != b"movi":
            continue
        for s2, e2 in _movi_video_chunks(payload, s + 4, e):
            yield idx, payload[s2:e2]
            idx += 1


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame list → MJPEG AVI bytes (avih + vids strl with
    BITMAPINFOHEADER, movi '00dc' chunks, idx1 index) — the fixture
    writer for tests and the inverse of avi_video_frames."""
    usec = int(round(1e6 / fps))

    def chunk(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    idx_entries = []
    for f in frames:
        # dwOffset in idx1 is relative to the start of 'movi' (the kind
        # fourcc position), pointing at the chunk header
        idx_entries.append((b"00dc", 0x10, 4 + len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(cc + struct.pack("<3I", fl, off, sz) for cc, fl, off, sz in idx_entries),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def mjpeg_feature_extractor(dim: int = 16, frame_stride: int = 1):
    """Real pixel-level video extractor for MJPEG AVI payloads:
    decode every ``frame_stride``-th frame with the in-repo JPEG codec
    and average the per-frame normalized luma histograms — a drop-in
    ``extract_image_features(extractor=...)`` for video columns, the
    same contract as jpeg/png feature extractors."""
    if frame_stride < 1:
        raise AviError(f"frame_stride must be >= 1, got {frame_stride}")
    from .jpeg import decode_jpeg

    def fn(payload: bytes) -> np.ndarray:
        acc = np.zeros(dim, dtype=np.float64)
        n = 0
        for i, frame in avi_video_frames(payload):
            if i % frame_stride:
                continue
            img = decode_jpeg(frame).astype(np.float64)
            if img.shape[2] == 3:
                luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                        + 0.114 * img[:, :, 2])
            else:
                luma = img[:, :, 0]
            hist, _ = np.histogram(luma, bins=dim, range=(0, 256))
            acc += hist / luma.size
            n += 1
        if n == 0:
            raise AviError("no video frames in payload")
        return (acc / n).astype(np.float32)

    return fn
