"""MJPEG-in-AVI video: a REAL container parser + frame codec path.

Narrows the documented "no video codecs" gap with an actual
interchange format: AVI (RIFF) containers carrying Motion-JPEG
streams, each frame a baseline JPEG decoded by sources/jpeg.py. MJPEG
is the classic capture/surveillance/webcam format and the simplest
REAL video encoding — no inter-frame prediction, so the container
walk + per-frame JPEG decode is the whole pipeline. Inter-predicted
codecs (H.264/VP9/AV1) remain a documented NotImplementedError slot:
they need motion compensation and CABAC/range entropy decoding, a
different engine, not a bigger buffer.

Spark shape (same as every multimodal operator here): payloads flow
through mapInPandas batches; the container is parsed and frames are
decoded executor-side; only (doc_id, frame_idx, dims, fingerprints/
booleans) rows ever shuffle — frame pixels never leave the stage.

Public-spec framing only (RIFF chunk grammar, AVI main/stream
headers, '00dc' frame chunks, even-byte padding, idx1 index); the
reference repo has no media handling — north-star scope, not parity.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from building_coffee_commodity_trading_data_warehouse_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)

# ------------------------------------------------------------ container


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + body + even pad."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 25,
) -> bytes:
    """Build a minimal valid AVI: hdrl (avih + one 'vids'/'MJPG'
    stream with a BITMAPINFOHEADER strf), movi with one '00dc' chunk
    per JPEG frame, and an idx1 index."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIii",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            max(fps, 1),  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            -1,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = bytearray()
    idx = bytearray()
    offset = 4  # offsets in idx1 count from the start of 'movi' type
    for f in frames:
        movi_body += _chunk(b"00dc", f)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(f))
        offset += 8 + len(f) + (len(f) % 2)
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", riff_body)


def parse_avi_frames(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk the RIFF grammar and return (width, height,
    declared_frames, [jpeg_bytes per '00dc'/'00db' chunk]).

    Lenient where real files are messy (unknown chunks skipped,
    trailing garbage tolerated) but strict on the grammar itself:
    bad magic or a truncated chunk raises rather than guessing."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI magic)")
    riff_size = struct.unpack("<I", data[4:8])[0]
    end = min(len(data), 8 + riff_size)
    width = height = declared = 0
    frames: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height, declared
        while pos + 8 <= stop:
            fourcc = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > stop:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", data[body_start : body_start + 56])
                declared = vals[4]
                width, height = vals[8], vals[9]
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(data[body_start:body_end])
            pos = body_end + (size % 2)

    walk(12, end)
    return width, height, declared, frames


# ------------------------------------------------------------- operators

VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, width int, height int, channels int, "
    "pixels binary"
)


def decode_video_frames(media: DataFrame) -> DataFrame:
    """UDTF shape (1 payload → N frames): parse each AVI payload and
    decode every MJPEG frame to a raw pixel buffer. Frame pixels stay
    inside the stage unless the caller keeps the ``pixels`` column —
    downstream fingerprint operators drop it before any shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            out = {
                "doc_id": [], "frame_idx": [], "width": [],
                "height": [], "channels": [], "pixels": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, _, frames = parse_avi_frames(bytes(payload))
                for i, jpg in enumerate(frames):
                    w, h, c, px = decode_jpeg(jpg)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["pixels"].append(px)
            yield _pd.DataFrame(out)

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    return _widen(media).mapInPandas(_batches, schema=VIDEO_FRAME_SCHEMA)


MJPEG_CERTIFIED_SCHEMA = (
    "doc_id long, n_frames int, width int, height int, "
    "container_ok boolean, frames_ok boolean"
)


def certify_mjpeg_pipeline(media: DataFrame, quality: int = 95) -> DataFrame:
    """The video path certified end-to-end with oracle-computable
    output: per payload, derive ``n = len % 3 + 2`` deterministic RGB
    frames (frame f = the certify_image_pipeline image rolled by f
    bytes — same dims rule, so SQL can derive everything), encode
    each as baseline JPEG, mux into an AVI, then run the REAL reverse
    path (RIFF walk → per-frame JPEG decode) and check:

    * ``container_ok`` — declared header frame count, dims, and
      parsed-frame count all agree with the construction;
    * ``frames_ok`` — every decoded frame matches ITS OWN source
      frame within the measured JPEG error budget (max |err| ≤ 48 at
      q95) — frame order survives the mux, not just frame content.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _one(payload: bytes):
            b = bytes(payload)
            w = len(b) % 16 + 2
            h = len(b) % 8 + 2
            n = len(b) % 3 + 2
            need = w * h * 3
            if not b:
                b = b"\x00"
            base = _np.frombuffer(
                (b * (need // max(len(b), 1) + 1))[:need], dtype=_np.uint8
            )
            srcs = [_np.roll(base, -f) for f in range(n)]
            avi = encode_avi_mjpeg(
                w,
                h,
                [
                    encode_jpeg(w, h, s.tobytes(), quality=quality)
                    for s in srcs
                ],
            )
            pw, ph, declared, jpgs = parse_avi_frames(avi)
            container_ok = (pw, ph, declared, len(jpgs)) == (w, h, n, n)
            frames_ok = container_ok
            if frames_ok:
                for s, jpg in zip(srcs, jpgs):
                    w2, h2, c2, px = decode_jpeg(jpg)
                    if (w2, h2, c2) != (w, h, 3):
                        frames_ok = False
                        break
                    err = _np.abs(
                        _np.frombuffer(px, dtype=_np.uint8).astype(_np.int64)
                        - s.astype(_np.int64)
                    ).max()
                    if int(err) > 48:
                        frames_ok = False
                        break
            return n, w, h, bool(container_ok), bool(frames_ok)

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": _np.array([r[0] for r in rows], dtype="int32"),
                    "width": _np.array([r[1] for r in rows], dtype="int32"),
                    "height": _np.array([r[2] for r in rows], dtype="int32"),
                    "container_ok": [r[3] for r in rows],
                    "frames_ok": [r[4] for r in rows],
                }
            )

    import numpy as _np  # noqa: F401  (re-exported into closures above)

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    return _widen(media).mapInPandas(_batches, schema=MJPEG_CERTIFIED_SCHEMA)
