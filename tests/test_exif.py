"""EXIF codec tests (sources/exif.py): APP1 splice/parse roundtrips,
both byte orders, transparency to the image path, and hostile-input
behavior."""

from __future__ import annotations

import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import exif
from building_coffee_commodity_trading_data_warehouse_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)

_FIELDS = dict(
    make="maker3",
    model="model4",
    orientation=6,
    datetime="2020:01:05 00:00:00",
    datetime_original="2019:12:05 12:00:00",
    iso=225,
    pixel_x=10,
    pixel_y=6,
)


def _jpeg():
    rng = random.Random(1)
    w, h = 10, 6
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    return encode_jpeg(w, h, rgb, quality=90)


def test_splice_parse_roundtrip():
    jp = _jpeg()
    tagged = exif.insert_exif(jp, _FIELDS)
    back = exif.parse_exif(tagged)
    for k, v in _FIELDS.items():
        assert back[k] == v, k


def test_splice_is_transparent_to_decoder():
    jp = _jpeg()
    tagged = exif.insert_exif(jp, _FIELDS)
    assert decode_jpeg(tagged) == decode_jpeg(jp)


def test_no_exif_returns_empty():
    assert exif.parse_exif(_jpeg()) == {}


def test_short_ascii_values_inline():
    """ASCII values ≤ 4 bytes (incl. NUL) live inline in the IFD
    entry — a distinct layout path from out-of-line strings."""
    f = dict(_FIELDS, make="abc", model="x")
    back = exif.parse_exif(exif.insert_exif(_jpeg(), f))
    assert back["make"] == "abc"
    assert back["model"] == "x"


def test_big_endian_blob_parses():
    """Hand-build an MM (big-endian) Exif blob: IFD0 with orientation
    + make only."""
    make = b"bigend\x00"
    ifd_off = 8
    n = 2
    extra_off = ifd_off + 2 + 12 * n + 4
    blob = bytearray(b"MM\x00*") + struct.pack(">I", ifd_off)
    blob += struct.pack(">H", n)
    blob += struct.pack(">HHI", exif.TAG_MAKE, 2, len(make))
    blob += struct.pack(">I", extra_off)
    blob += struct.pack(">HHI", exif.TAG_ORIENTATION, 3, 1)
    blob += struct.pack(">HH", 3, 0)
    blob += struct.pack(">I", 0)
    blob += make
    payload = b"Exif\x00\x00" + bytes(blob)
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jp = _jpeg()
    tagged = jp[:2] + app1 + jp[2:]
    back = exif.parse_exif(tagged)
    assert back["make"] == "bigend"
    assert back["orientation"] == 3


def test_hostile_inputs():
    with pytest.raises(ValueError):
        exif.parse_exif(b"GIF89a" + b"\x00" * 10)
    # APP1 with garbage TIFF blob
    payload = b"Exif\x00\x00" + b"ZZ" * 10
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jp = _jpeg()
    with pytest.raises(ValueError):
        exif.parse_exif(jp[:2] + app1 + jp[2:])
    # truncated IFD offsets must raise, not over-read
    blob = b"II*\x00" + struct.pack("<I", 9999)
    payload = b"Exif\x00\x00" + blob
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    with pytest.raises(ValueError):
        exif.parse_exif(jp[:2] + app1 + jp[2:])


def test_orientation_range_and_unknown_types_skipped():
    """An IFD entry with an unknown value type must be skipped, not
    fail the walk (real files carry RATIONAL/UNDEFINED tags)."""
    blob = bytearray(exif.encode_exif(_FIELDS))
    # patch the Make entry's type (sorted first: tag 271) to RATIONAL
    # entry starts at 8 + 2 = 10; type at +2
    tag = struct.unpack_from("<H", blob, 10)[0]
    assert tag == exif.TAG_MAKE
    struct.pack_into("<H", blob, 12, 5)  # RATIONAL (unsupported)
    payload = b"Exif\x00\x00" + bytes(blob)
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jp = _jpeg()
    back = exif.parse_exif(jp[:2] + app1 + jp[2:])
    assert back["make"] is None  # skipped
    assert back["orientation"] == _FIELDS["orientation"]  # walk survived
