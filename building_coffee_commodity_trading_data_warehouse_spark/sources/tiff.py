"""Baseline TIFF codec, pure Python — TIFF 6.0.

The scanned-document format: digitized corpora (books, forms,
archival scans) are TIFF-heavy, and it completes the still-image
codec set (BMP/PNG/JPEG/GIF/WebP) with the one container the rest
don't cover. Lossless throughout, so the certification contract is
byte-identity (like PNG/GIF/WebP/FLAC): encode → decode must
reproduce the pixel buffer exactly through every encoder path, and
tests/test_reference_codecs.py certifies both directions against the
JVM's javax.imageio TIFF plugin (its MM/big-endian uncompressed
output under our decoder; our II/LZW/PackBits/predictor streams under
its reader).

Coverage: both byte orders (II little / MM big — the reference
encoder here writes II, the JVM writer emits MM), IFD walk with
out-of-line values, 8-bit grayscale (photometric 0 and 1, with
min-is-white inversion) and RGB, multi-strip layouts (RowsPerStrip),
compressions 1 (none), 32773 (PackBits) and 5 (TIFF-variant LZW:
MSB-first codes, 9→12 bit widths with the early-change convention,
Clear/EOI, 4094-entry reset), and predictor 2 (horizontal
differencing per channel). PlanarConfiguration 2, tiles, and 16-bit
samples are rejected loudly. Public-spec behavior only; the
reference repo (ETL Process/STG.py) has no media handling at all.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------- constants

_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317

_C_NONE = 1
_C_LZW = 5
_C_PACKBITS = 32773

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


# ------------------------------------------------------------ PackBits


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch: until a run of ≥3 starts (2-byte runs inside
        # a literal cost the same either way; 3 breaks even for the run)
        j = i
        while j + 1 < n and j - i < 127:
            if j + 2 < n and data[j + 1] == data[j + 2] and (
                j + 3 >= n or data[j + 3] == data[j + 1]
            ):
                break
            j += 1
        out.append(j - i)
        out += data[i : j + 1]
        i = j + 1
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128 = noop
    if len(out) != expected:
        raise ValueError("PackBits strip length mismatch")
    return bytes(out)


# ------------------------------------------------------ TIFF-variant LZW
# MSB-first codes, 9→12 bits with the EARLY-CHANGE convention (width
# bumps when next_code == 2^w - 1, one code earlier than GIF), Clear =
# 256 / EOI = 257, table reset before 4094.


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # early change (TIFF convention, one earlier than GIF): the
        # width grows as soon as entry 2^w exists, not when a code
        # that needs it is first emitted
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = bytes([b])
        if next_code >= 4094:
            emit(table[prev], width)
            emit(256, 12)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            prev = b""
    if prev:
        emit(table[prev], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return 257  # treat truncation as EOI
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == 257:
            break
        if code == 256:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry at read time, so it widens at
        # 2^w - 1 where the encoder widens at 2^w (verified against
        # the OpenJDK TIFFLZWDecompressor both directions)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError("TIFF LZW strip length mismatch")
    return bytes(out)


# ----------------------------------------------------------- predictor


def _predict_encode(rows: bytes, width: int, channels: int) -> bytes:
    stride = width * channels
    out = bytearray(rows)
    for r in range(len(rows) // stride):
        base = r * stride
        for i in range(stride - 1, channels - 1, -1):
            out[base + i] = (rows[base + i] - rows[base + i - channels]) & 0xFF
    return bytes(out)


def _predict_decode(rows: bytes, width: int, channels: int) -> bytes:
    stride = width * channels
    out = bytearray(rows)
    for r in range(len(rows) // stride):
        base = r * stride
        for i in range(channels, stride):
            out[base + i] = (out[base + i] + out[base + i - channels]) & 0xFF
    return bytes(out)


# ------------------------------------------------------------- encoder


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    compression: str = "lzw",
    rows_per_strip: int = 8,
    predictor: bool = False,
) -> bytes:
    """Encode an (H, W, C) 8-bit buffer as a little-endian (II) TIFF.
    C = 1 gray (photometric 1, min-is-black) or 3 RGB. ``compression``
    ∈ none / packbits / lzw; ``predictor`` applies horizontal
    differencing (tag 317 = 2, LZW/none only per spec usage)."""
    if channels not in (1, 3):
        raise ValueError("encoder supports gray or RGB")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    comp = {"none": _C_NONE, "packbits": _C_PACKBITS, "lzw": _C_LZW}[compression]
    if predictor and comp == _C_PACKBITS:
        raise ValueError("predictor with PackBits is not standard TIFF")

    stride = width * channels
    strips: list[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        raw = pixels[y0 * stride : min(y0 + rows_per_strip, height) * stride]
        if predictor:
            raw = _predict_encode(raw, width, channels)
        if comp == _C_PACKBITS:
            raw = packbits_encode(raw)
        elif comp == _C_LZW:
            raw = lzw_encode(raw)
        strips.append(raw)

    n_strips = len(strips)
    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    def short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, v))

    def long_(tag: int, v: int) -> None:
        entries.append((tag, 4, 1, v))

    # layout: header(8) + IFD + out-of-line arrays + strip data
    n_entries = 10 + (1 if predictor else 0)
    ifd_size = 2 + 12 * n_entries + 4
    extra = bytearray()
    extra_base = 8 + ifd_size

    def array_long(values: list[int]) -> tuple[int, int]:
        if len(values) == 1:
            return 1, values[0]
        off = extra_base + len(extra)
        for v in values:
            extra.extend(struct.pack("<I", v))
        return len(values), off

    def array_short(values: list[int]) -> tuple[int, int]:
        if len(values) == 1:
            return 1, values[0]
        if len(values) == 2:
            return 2, values[0] | (values[1] << 16)
        off = extra_base + len(extra)
        for v in values:
            extra.extend(struct.pack("<H", v))
        return len(values), off

    short(_T_WIDTH, width)
    short(_T_HEIGHT, height)
    cnt, val = array_short([8] * channels)
    entries.append((_T_BITS, 3, cnt, val))
    short(_T_COMPRESSION, comp)
    short(_T_PHOTOMETRIC, 2 if channels == 3 else 1)
    entries.append((_T_STRIP_OFFSETS, 4, n_strips, 0))  # patched below
    short(_T_SAMPLES, channels)
    short(_T_ROWS_PER_STRIP, rows_per_strip)
    entries.append((_T_STRIP_COUNTS, 4, n_strips, 0))  # patched below
    short(_T_PLANAR, 1)
    if predictor:
        short(_T_PREDICTOR, 2)

    # strip offset/count arrays (patch placeholders)
    counts = [len(s) for s in strips]
    cnt_c, val_c = array_long(counts)
    data_base = extra_base + len(extra) + (4 * n_strips if n_strips > 1 else 0)
    offsets = []
    pos = data_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    cnt_o, val_o = array_long(offsets)
    entries = [
        (
            (_T_STRIP_OFFSETS, 4, cnt_o, val_o)
            if t == _T_STRIP_OFFSETS
            else (_T_STRIP_COUNTS, 4, cnt_c, val_c)
            if t == _T_STRIP_COUNTS
            else (t, ty, c, v)
        )
        for (t, ty, c, v) in entries
    ]
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    assert len(entries) == n_entries

    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)
    out += struct.pack("<H", n_entries)
    for tag, typ, count, value in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", value & 0xFFFF, 0)
        else:
            out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


# ------------------------------------------------------------- decoder


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline TIFF → (width, height, channels, pixel
    bytes). Both byte orders; compressions none/PackBits/LZW;
    photometric 0 (min-is-white, inverted to gray), 1, 2 (RGB);
    predictor 2; multi-strip. Tiles/planar-2/16-bit rejected."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF (II*/MM* header missing)")
    le = data[:2] == b"II"
    e = "<" if le else ">"

    def u16(off: int) -> int:
        return struct.unpack_from(e + "H", data, off)[0]

    def u32(off: int) -> int:
        return struct.unpack_from(e + "I", data, off)[0]

    ifd = u32(4)
    n = u16(ifd)
    tags: dict[int, tuple[int, int, int]] = {}
    for k in range(n):
        off = ifd + 2 + 12 * k
        tag, typ, count = u16(off), u16(off + 2), u32(off + 4)
        tags[tag] = (typ, count, off + 8)

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, count, voff = tags[tag]
        size = _TYPE_SIZES.get(typ, 1) * count
        if size > 4:
            voff = u32(voff)
        out = []
        for i in range(count):
            if typ == 3:
                out.append(u16(voff + 2 * i))
            elif typ == 4:
                out.append(u32(voff + 4 * i))
            elif typ == 1:
                out.append(data[voff + i])
            else:
                raise ValueError(f"unsupported TIFF tag type {typ}")
        return out

    width = values(_T_WIDTH)[0]
    height = values(_T_HEIGHT)[0]
    channels = values(_T_SAMPLES, [1])[0]
    bits = values(_T_BITS, [8])
    if any(b != 8 for b in bits) or channels not in (1, 3):
        raise ValueError("only 8-bit gray/RGB TIFF supported")
    comp = values(_T_COMPRESSION, [_C_NONE])[0]
    photometric = values(_T_PHOTOMETRIC)[0]
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if values(_T_PLANAR, [1])[0] != 1:
        raise ValueError("planar TIFF (PlanarConfiguration=2) unsupported")
    predictor = values(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip layouts only)")
    rows_per_strip = values(_T_ROWS_PER_STRIP, [height])[0]
    offsets = values(_T_STRIP_OFFSETS)
    counts = values(_T_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count arrays disagree")

    stride = width * channels
    out = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, height - i * rows_per_strip)
        expected = rows * stride
        raw = data[off : off + cnt]
        if comp == _C_NONE:
            if len(raw) < expected:
                raise ValueError("TIFF strip shorter than declared")
            raw = raw[:expected]
        elif comp == _C_PACKBITS:
            raw = packbits_decode(raw, expected)
        elif comp == _C_LZW:
            raw = lzw_decode(raw, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        if predictor == 2:
            raw = _predict_decode(raw, width, channels)
        out += raw
    if len(out) != height * stride:
        raise ValueError("TIFF decoded size mismatch")
    if photometric == 0:  # min-is-white
        out = bytearray(255 - v for v in out)
    return width, height, channels, bytes(out)


# --------------------------------------------------------- spark plumbing

TIFF_CERTIFIED_SCHEMA = (
    "doc_id long, width int, height int, n_strips int, "
    "none_ok boolean, packbits_ok boolean, lzw_ok boolean, "
    "predictor_ok boolean, gray_ok boolean"
)


def certify_tiff_pipeline(media) -> "object":
    """The TIFF path certified end-to-end: per payload, derive the
    deterministic RGB image (dims len%16+2 × len%8+2, payload-tiled)
    and prove byte-identity roundtrips through every encoder path —
    uncompressed, PackBits, TIFF-LZW (early-change code widths),
    LZW + horizontal-differencing predictor, and 8-bit grayscale —
    across a multi-strip layout (rows_per_strip=3 forces ≥2 strips at
    every gate size). tests/test_reference_codecs.py additionally
    certifies both directions against the JVM's javax.imageio TIFF
    plugin. mapInPandas batches; pixels never shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _rt(w, h, px, ch, **kw):
            w1, h1, c1, out = decode_tiff(encode_tiff(w, h, px, ch, **kw))
            return (w1, h1, c1) == (w, h, ch) and out == px

        def _one(payload: bytes):
            # dims from the TRUE payload length (oracle: octet_length,
            # 0 for empty docs); the fallback byte only feeds tiling.
            n = len(bytes(payload))
            b = bytes(payload) or b"\x00"
            w = n % 16 + 2
            h = n % 8 + 2
            need = w * h * 3
            rgb = (b * (need // len(b) + 1))[:need]
            gray = (b * (w * h // len(b) + 1))[: w * h]
            kw = dict(rows_per_strip=3)
            none_ok = _rt(w, h, rgb, 3, compression="none", **kw)
            pb_ok = _rt(w, h, rgb, 3, compression="packbits", **kw)
            lzw_ok = _rt(w, h, rgb, 3, compression="lzw", **kw)
            pred_ok = _rt(
                w, h, rgb, 3, compression="lzw", predictor=True, **kw
            )
            gray_ok = _rt(w, h, gray, 1, compression="packbits", **kw)
            n_strips = (h + 2) // 3
            return (
                w,
                h,
                n_strips,
                bool(none_ok),
                bool(pb_ok),
                bool(lzw_ok),
                bool(pred_ok),
                bool(gray_ok),
            )

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": _np.array([r[0] for r in rows], dtype="int32"),
                    "height": _np.array([r[1] for r in rows], dtype="int32"),
                    "n_strips": _np.array([r[2] for r in rows], dtype="int32"),
                    "none_ok": [r[3] for r in rows],
                    "packbits_ok": [r[4] for r in rows],
                    "lzw_ok": [r[5] for r in rows],
                    "predictor_ok": [r[6] for r in rows],
                    "gray_ok": [r[7] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=TIFF_CERTIFIED_SCHEMA)
