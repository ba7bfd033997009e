"""GIF87a/89a codec, pure Python — the LZW compression family.

Completes the real-codec set for the formats scraped web corpora
actually contain: BMP (uncompressed), PNG (DEFLATE), JPEG (DCT),
WAV (PCM), AVI/MJPEG (container), and now GIF — variable-width LZW
with clear/EOI codes, 255-byte sub-block framing, palette indexing,
the 4-pass interlace row order, and multi-frame animations (Graphic
Control Extensions with per-frame delays and disposal).

GIF is LOSSLESS for images of ≤256 colors, so unlike JPEG the
certification contract is byte-identity again: encode→decode must
reproduce the index array exactly. The encoder here is
palette-honest — it encodes what GIF can hold (an indexed image plus
its color table) and refuses >256-color inputs rather than silently
quantizing; gray(256) covers the certification path.

Spark plumbing rides the existing multimodal pattern (mapInPandas
batches, pixels never shuffle). Public-spec behavior only (GIF89a
specification); the reference repo has no media handling.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------------- LZW


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits a clear code first, grows code width
    from min_code_size+1 up to 12 bits, re-clears when the table
    fills, ends with EOI. Returns the raw code stream (no sub-block
    framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code == (1 << 12) + 1:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Inverse of lzw_encode; stops at EOI or after ``expected``
    output bytes (defensive against padded/truncated streams)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected])


# ----------------------------------------------------------- interlace


def interlace_rows(height: int) -> list[int]:
    """The GIF 4-pass row order: rows 0,8,16…, then 4,12…, 2,6,10…,
    finally 1,3,5…"""
    rows: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, height, step))
    return rows


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


GRAY_PALETTE = bytes(v for g in range(256) for v in (g, g, g))


# -------------------------------------------------------------- encoder


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes = GRAY_PALETTE,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Encode palette-index frames (each ``width*height`` bytes) as a
    GIF89a. One frame → plain image; several → an animation with a
    Netscape loop block and per-frame Graphic Control Extensions.
    ``palette`` is raw RGB triples (length = 3·2^n, n ≤ 8)."""
    n_colors = len(palette) // 3
    depth = max(1, (n_colors - 1).bit_length())
    if len(palette) != 3 * (1 << depth):
        raise ValueError("palette length must be 3 * power of two")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size does not match dims")
        if f and max(f) >= n_colors:
            raise ValueError("index beyond palette (GIF holds <=256 colors)")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += palette
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    min_code = max(2, depth)
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0]) + struct.pack(
                "<H", delay_cs
            ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if interlace else 0])
        idx = f
        if interlace:
            rows = interlace_rows(height)
            idx = b"".join(
                f[r * width : (r + 1) * width] for r in rows
            )
        out += bytes([min_code])
        out += _sub_blocks(lzw_encode(idx, min_code))
    out += b"\x3b"
    return bytes(out)


# -------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> tuple[int, int, bytes, list[bytes]]:
    """Decode a GIF87a/89a → (width, height, global_palette_rgb,
    [index frame bytes, row-major, de-interlaced]). Frames covering a
    sub-rectangle are composed onto the previous frame (disposal
    "none"/"do not dispose" semantics — the common animation case);
    a local color table raises (kept out of scope loudly rather than
    mis-colored silently)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    width, height = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[bytes] = []
    canvas = bytearray(width * height)
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip through sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        fpacked = data[pos + 9]
        pos += 10
        if fpacked & 0x80:
            raise ValueError("local color tables not supported")
        interlaced = bool(fpacked & 0x40)
        min_code = data[pos]
        pos += 1
        raw = bytearray()
        while data[pos]:
            ln = data[pos]
            raw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(raw), min_code, fw * fh)
        if interlaced:
            rows = interlace_rows(fh)
            fixed = bytearray(fw * fh)
            for src_r, dst_r in enumerate(rows):
                fixed[dst_r * fw : (dst_r + 1) * fw] = idx[
                    src_r * fw : (src_r + 1) * fw
                ]
            idx = bytes(fixed)
        for r in range(fh):
            dst = (top + r) * width + left
            canvas[dst : dst + fw] = idx[r * fw : (r + 1) * fw]
        frames.append(bytes(canvas))
    return width, height, palette, frames


def decode_gif_rgb(data: bytes) -> tuple[int, int, int, bytes]:
    """decode_image-compatible shape: first frame through the palette
    → (width, height, 3, row-major RGB bytes)."""
    width, height, palette, frames = decode_gif(data)
    if not frames:
        raise ValueError("GIF contains no image data")
    idx = frames[0]
    rgb = bytearray(len(idx) * 3)
    for i, v in enumerate(idx):
        rgb[3 * i : 3 * i + 3] = palette[3 * v : 3 * v + 3]
    return width, height, 3, bytes(rgb)


# --------------------------------------------------------- spark plumbing

GIF_CERTIFIED_SCHEMA = (
    "doc_id long, width int, height int, n_frames int, "
    "gif_ok boolean, interlace_ok boolean, anim_ok boolean"
)


def certify_gif_pipeline(media) -> "object":
    """The GIF path certified end-to-end: per payload, derive the
    deterministic GRAY image (dims len%16+2 × len%8+2, payload-tiled —
    256 grays always fit a GIF palette, so unlike JPEG the contract is
    byte-IDENTITY again) and prove three roundtrips:

    * ``gif_ok`` — single frame: decode(encode(img)) reproduces the
      index bytes and the gray palette exactly (LZW encode/decode,
      sub-block framing, code-width growth);
    * ``interlace_ok`` — the same through the 4-pass interlace row
      order both ways;
    * ``anim_ok`` — ``n = len%3+2`` rolled frames through an animated
      GIF89a (Netscape loop block, per-frame Graphic Control
      Extensions): every frame returns byte-identical IN ORDER.

    mapInPandas batches; only (doc_id, dims, booleans) rows shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _one(payload: bytes):
            b = bytes(payload)
            w = len(b) % 16 + 2
            h = len(b) % 8 + 2
            n = len(b) % 3 + 2
            need = w * h
            if not b:
                b = b"\x00"
            gray = (b * (need // max(len(b), 1) + 1))[:need]

            w1, h1, pal1, fr1 = decode_gif(encode_gif(w, h, [gray]))
            gif_ok = (
                (w1, h1) == (w, h)
                and pal1 == GRAY_PALETTE
                and fr1 == [gray]
            )
            w2, h2, _, fr2 = decode_gif(
                encode_gif(w, h, [gray], interlace=True)
            )
            interlace_ok = (w2, h2) == (w, h) and fr2 == [gray]
            arr = _np.frombuffer(gray, dtype=_np.uint8)
            frames = [_np.roll(arr, -f).tobytes() for f in range(n)]
            w3, h3, _, fr3 = decode_gif(
                encode_gif(w, h, frames, delay_cs=4)
            )
            anim_ok = (w3, h3) == (w, h) and fr3 == frames
            return w, h, n, bool(gif_ok), bool(interlace_ok), bool(anim_ok)

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": _np.array([r[0] for r in rows], dtype="int32"),
                    "height": _np.array([r[1] for r in rows], dtype="int32"),
                    "n_frames": _np.array([r[2] for r in rows], dtype="int32"),
                    "gif_ok": [r[3] for r in rows],
                    "interlace_ok": [r[4] for r in rows],
                    "anim_ok": [r[5] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=GIF_CERTIFIED_SCHEMA)
