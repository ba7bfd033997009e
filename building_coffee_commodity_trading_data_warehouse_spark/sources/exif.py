"""EXIF metadata codec — TIFF-IFD structures inside JPEG APP1.

Corpus-curation surface: real image crawls filter and group on EXIF
(orientation-aware dedup, camera/device slicing, timestamp windows),
and the metadata travels as a complete TIFF byte structure inside a
JPEG ``APP1`` segment tagged ``Exif\\0\\0`` (EXIF 2.3 / TIFF 6.0 —
the same IFD grammar sources/tiff.py decodes for images). This module
writes and reads that structure:

* ``encode_exif(fields)`` — a little-endian TIFF blob: IFD0 with
  Make / Model / Orientation / DateTime and an Exif-sub-IFD pointer;
  the sub-IFD carries DateTimeOriginal / ISOSpeedRatings /
  PixelXDimension / PixelYDimension. ASCII values NUL-terminated,
  out-of-line values offset from the TIFF header per spec.
* ``insert_exif(jpeg, fields)`` — splices the APP1 right after SOI
  (the position EXIF requires); the baseline decoder skips APPn, so
  spliced images still decode byte-identically.
* ``parse_exif(jpeg)`` — walks the JPEG segment list to SOS, finds
  the Exif APP1, and reads both IFDs in either byte order (II/MM).

Certification: the m_exif_metadata gate synthesizes deterministic
fields per document, splices them into a REAL encoded JPEG, parses
them back, and the oracle replays every field from the payload bytes
in SQL; a boolean pins that the spliced JPEG still decodes to the
same pixels. Public-spec behavior only; the reference repo has no
media handling at all.
"""

from __future__ import annotations

import struct

# IFD0 tags
TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 34665
# Exif sub-IFD tags
TAG_ISO = 34855
TAG_DATETIME_ORIGINAL = 36867
TAG_PIXEL_X = 40962
TAG_PIXEL_Y = 40963

_ASCII, _SHORT, _LONG = 2, 3, 4


def _ifd_bytes(entries, base_offset):
    """entries: [(tag, type, values)] → (ifd bytes, out-of-line data).
    ``base_offset`` is the offset (from TIFF header start) where this
    IFD begins; out-of-line data is appended right after the IFD."""
    entries = sorted(entries, key=lambda e: e[0])
    ifd_size = 2 + 12 * len(entries) + 4
    extra = bytearray()
    body = bytearray(struct.pack("<H", len(entries)))
    for tag, typ, values in entries:
        if typ == _ASCII:
            data = values.encode("ascii") + b"\x00"
            count = len(data)
            if count <= 4:
                val = data.ljust(4, b"\x00")
            else:
                off = base_offset + ifd_size + len(extra)
                extra += data
                val = struct.pack("<I", off)
        elif typ == _SHORT:
            vals = values if isinstance(values, list) else [values]
            count = len(vals)
            if count <= 2:
                val = b"".join(struct.pack("<H", v) for v in vals).ljust(
                    4, b"\x00"
                )
            else:
                off = base_offset + ifd_size + len(extra)
                extra += b"".join(struct.pack("<H", v) for v in vals)
                val = struct.pack("<I", off)
        elif typ == _LONG:
            count = 1
            val = struct.pack("<I", values)
        else:
            raise ValueError(f"unsupported EXIF type {typ}")
        body += struct.pack("<HHI", tag, typ, count)
        body += val
    body += struct.pack("<I", 0)  # no next IFD
    return bytes(body), bytes(extra)


def encode_exif(fields: dict) -> bytes:
    """fields: make, model, orientation, datetime, datetime_original,
    iso, pixel_x, pixel_y → TIFF blob (header + IFD0 + Exif IFD)."""
    # two-pass: IFD0 size depends only on entry count (5 entries)
    ifd0_entries = 5
    ifd0_base = 8
    ifd0_size = 2 + 12 * ifd0_entries + 4

    # lay out IFD0 first (with a placeholder Exif pointer), then the
    # sub-IFD after IFD0's out-of-line data
    def build(exif_ptr):
        return _ifd_bytes(
            [
                (TAG_MAKE, _ASCII, fields["make"]),
                (TAG_MODEL, _ASCII, fields["model"]),
                (TAG_ORIENTATION, _SHORT, int(fields["orientation"])),
                (TAG_DATETIME, _ASCII, fields["datetime"]),
                (TAG_EXIF_IFD, _LONG, exif_ptr),
            ],
            ifd0_base,
        )

    ifd0, extra0 = build(0)
    exif_base = ifd0_base + len(ifd0) + len(extra0)
    ifd0, extra0 = build(exif_base)
    sub, extra_sub = _ifd_bytes(
        [
            (TAG_ISO, _SHORT, int(fields["iso"])),
            (TAG_DATETIME_ORIGINAL, _ASCII, fields["datetime_original"]),
            (TAG_PIXEL_X, _LONG, int(fields["pixel_x"])),
            (TAG_PIXEL_Y, _LONG, int(fields["pixel_y"])),
        ],
        exif_base,
    )
    assert len(ifd0) == ifd0_size
    return (
        b"II*\x00"
        + struct.pack("<I", ifd0_base)
        + ifd0
        + extra0
        + sub
        + extra_sub
    )


def insert_exif(jpeg: bytes, fields: dict) -> bytes:
    """Splice an Exif APP1 immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    payload = b"Exif\x00\x00" + encode_exif(fields)
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds APP1 capacity")
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + app1 + jpeg[2:]


def _parse_ifd(data: bytes, e: str, off: int) -> dict[int, object]:
    out: dict[int, object] = {}
    if off + 2 > len(data):
        raise ValueError("EXIF IFD offset out of range")
    (n,) = struct.unpack_from(e + "H", data, off)
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(e + "HHI", data, base)
        voff = base + 8
        size = {_ASCII: 1, _SHORT: 2, _LONG: 4}.get(typ, 0) * count
        if size == 0:
            continue  # unknown type: skip, do not fail the walk
        if size > 4:
            (voff,) = struct.unpack_from(e + "I", data, base + 8)
        if voff + size > len(data):
            raise ValueError(f"EXIF tag {tag} value out of range")
        if typ == _ASCII:
            raw = data[voff : voff + count]
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == _SHORT:
            vals = [
                struct.unpack_from(e + "H", data, voff + 2 * i)[0]
                for i in range(count)
            ]
            out[tag] = vals[0] if count == 1 else vals
        else:
            vals = [
                struct.unpack_from(e + "I", data, voff + 4 * i)[0]
                for i in range(count)
            ]
            out[tag] = vals[0] if count == 1 else vals
    return out


def parse_exif(jpeg: bytes) -> dict:
    """JPEG bytes → flat dict of the supported EXIF fields (empty dict
    when no Exif APP1 is present). Both byte orders."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    pos = 2
    tiff_blob = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("JPEG segment sync lost")
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS — metadata segments end here
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        body = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff_blob = body[6:]
            break
        pos += 2 + seglen
    if tiff_blob is None:
        return {}
    if tiff_blob[:4] == b"II*\x00":
        e = "<"
    elif tiff_blob[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("EXIF APP1 payload is not a TIFF structure")
    (ifd0_off,) = struct.unpack_from(e + "I", tiff_blob, 4)
    ifd0 = _parse_ifd(tiff_blob, e, ifd0_off)
    out = {
        "make": ifd0.get(TAG_MAKE),
        "model": ifd0.get(TAG_MODEL),
        "orientation": ifd0.get(TAG_ORIENTATION),
        "datetime": ifd0.get(TAG_DATETIME),
    }
    if TAG_EXIF_IFD in ifd0:
        sub = _parse_ifd(tiff_blob, e, int(ifd0[TAG_EXIF_IFD]))
        out.update(
            {
                "iso": sub.get(TAG_ISO),
                "datetime_original": sub.get(TAG_DATETIME_ORIGINAL),
                "pixel_x": sub.get(TAG_PIXEL_X),
                "pixel_y": sub.get(TAG_PIXEL_Y),
            }
        )
    return out


# --------------------------------------------------------- spark plumbing

EXIF_SCHEMA = (
    "doc_id long, make string, model string, orientation int, iso int, "
    "pixel_x int, pixel_y int, taken_at string, decode_ok boolean"
)


def image_metadata(media) -> "object":
    """EXIF pipeline certified end-to-end: per payload, derive
    deterministic camera fields (make/model/orientation/ISO/timestamp
    from the byte length, pixel dims from the fake-image rule),
    encode them as a real Exif APP1 TIFF blob, splice into a REAL
    encoded JPEG of the deterministic image, parse everything back
    from the spliced bytes, and emit the parsed values — which the
    oracle replays from the payload in SQL. ``decode_ok`` pins that
    the spliced JPEG still decodes to the same pixel buffer as the
    unspliced one (APP1 is transparent to the image path).

    mapInPandas batches; pixels and EXIF blobs never shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _one(payload: bytes):
            b = bytes(payload)
            n = len(b)
            w = n % 16 + 2
            h = n % 8 + 2
            need = w * h * 3
            src = b or b"\x00"
            rgb = (src * (need // len(src) + 1))[:need]
            fields = {
                "make": f"maker{n % 5}",
                "model": f"model{n % 7}",
                "orientation": n % 8 + 1,
                "datetime": f"2020:01:{n % 28 + 1:02d} 00:00:00",
                "datetime_original": f"2019:12:{n % 28 + 1:02d} 12:00:00",
                "iso": 100 + (n % 10) * 25,
                "pixel_x": w,
                "pixel_y": h,
            }
            plain = encode_jpeg(w, h, rgb, quality=90)
            tagged = insert_exif(plain, fields)
            back = parse_exif(tagged)
            ok = (
                back["make"] == fields["make"]
                and back["model"] == fields["model"]
                and back["orientation"] == fields["orientation"]
                and back["iso"] == fields["iso"]
                and back["pixel_x"] == w
                and back["pixel_y"] == h
                and back["datetime"] == fields["datetime"]
                and back["datetime_original"] == fields["datetime_original"]
                and decode_jpeg(tagged) == decode_jpeg(plain)
            )
            return (
                back["make"],
                back["model"],
                int(back["orientation"]),
                int(back["iso"]),
                int(back["pixel_x"]),
                int(back["pixel_y"]),
                back["datetime_original"],
                bool(ok),
            )

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "make": [r[0] for r in rows],
                    "model": [r[1] for r in rows],
                    "orientation": _np.array(
                        [r[2] for r in rows], dtype="int32"
                    ),
                    "iso": _np.array([r[3] for r in rows], dtype="int32"),
                    "pixel_x": _np.array([r[4] for r in rows], dtype="int32"),
                    "pixel_y": _np.array([r[5] for r in rows], dtype="int32"),
                    "taken_at": [r[6] for r in rows],
                    "decode_ok": [r[7] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=EXIF_SCHEMA)
