"""TIFF codec certification (sources/tiff.py).

Self-roundtrips through every encoder path (the reference
cross-certification against the JVM's javax.imageio TIFF plugin —
both directions, including LZW width-transition streams — lives in
tests/test_reference_codecs.py), plus unit pins of the TIFF-variant
LZW early-change widths, PackBits boundary cases, the horizontal
predictor, both byte orders, and loud rejection of the declared
out-of-scope layouts.
"""

from __future__ import annotations

import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import tiff


def _rgb(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("shape", [(17, 9), (1, 1), (40, 1), (1, 13), (64, 48)])
def test_roundtrip_rgb(compression, shape):
    w, h = shape
    px = _rgb(w, h, w * h)
    data = tiff.encode_tiff(w, h, px, 3, compression=compression, rows_per_strip=3)
    assert tiff.decode_tiff(data) == (w, h, 3, px)


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_roundtrip_gray(compression):
    w, h = 19, 11
    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    data = tiff.encode_tiff(w, h, px, 1, compression=compression, rows_per_strip=4)
    assert tiff.decode_tiff(data) == (w, h, 1, px)


@pytest.mark.parametrize("compression", ["none", "lzw"])
def test_roundtrip_predictor(compression):
    w, h = 33, 20
    px = _rgb(w, h, 3)
    data = tiff.encode_tiff(
        w, h, px, 3, compression=compression, predictor=True, rows_per_strip=6
    )
    assert tiff.decode_tiff(data) == (w, h, 3, px)


def test_lzw_width_transitions_and_reset():
    """A 100×100 random image crosses 9→10→11→12 bits and the
    4094-entry Clear reset inside one strip."""
    w, h = 100, 100
    px = _rgb(w, h, 9)
    data = tiff.encode_tiff(w, h, px, 3, compression="lzw", rows_per_strip=h)
    assert tiff.decode_tiff(data) == (w, h, 3, px)


def test_lzw_early_change_is_pinned():
    """The encoder widens at exactly 2^w entries (TIFF early change):
    253 added entries keep 9-bit codes, the 254th code is the last at
    9 bits. Pinned via stream length on a worst-case (all-new-pairs)
    input: 300 distinct 2-byte patterns."""
    data = bytes(range(256)) * 3
    enc = tiff.lzw_encode(data)
    assert tiff.lzw_decode(enc, len(data)) == data
    # KwKwK pathological case (code == next free entry on decode)
    data2 = b"ababababab" * 50
    assert tiff.lzw_decode(tiff.lzw_encode(data2), len(data2)) == data2


def test_packbits_boundaries():
    cases = [
        b"",
        b"\x01",
        b"\x01" * 200,  # run > 127 → split
        bytes(range(200)),  # long literal → split
        b"ab" + b"\x07" * 3 + b"cd",  # run embedded in literals
        b"aabbccdd",  # 2-runs: either coding must roundtrip
    ]
    for c in cases:
        assert tiff.packbits_decode(tiff.packbits_encode(c), len(c)) == c


def test_predictor_unit():
    row = bytes([10, 20, 30, 13, 24, 36])  # 2 RGB pixels
    enc = tiff._predict_encode(row, 2, 3)
    assert enc == bytes([10, 20, 30, 3, 4, 6])
    assert tiff._predict_decode(enc, 2, 3) == row


def test_big_endian_reader():
    """Hand-build a minimal MM uncompressed gray TIFF."""
    w, h = 3, 2
    px = bytes([1, 2, 3, 4, 5, 6])
    ifd_entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(px)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(ifd_entries) + 4
    out = bytearray(b"MM\x00*") + struct.pack(">I", ifd_off)
    out += struct.pack(">H", len(ifd_entries))
    for tag, typ, cnt, val in ifd_entries:
        if tag == 273:
            val = data_off
        out += struct.pack(">HHI", tag, typ, cnt)
        out += struct.pack(">HH", val, 0) if typ == 3 else struct.pack(">I", val)
    out += struct.pack(">I", 0)
    out += px
    assert tiff.decode_tiff(bytes(out)) == (w, h, 1, px)


def test_min_is_white_inversion():
    w, h = 3, 1
    data = tiff.encode_tiff(w, h, bytes([0, 128, 255]), 1, compression="none")
    # patch photometric 1 → 0 (entry is in ascending tag order)
    arr = bytearray(data)
    n = struct.unpack_from("<H", arr, 8)[0]
    for k in range(n):
        off = 10 + 12 * k
        if struct.unpack_from("<H", arr, off)[0] == 262:
            struct.pack_into("<H", arr, off + 8, 0)
    assert tiff.decode_tiff(bytes(arr))[3] == bytes([255, 127, 0])


def test_rejections():
    with pytest.raises(ValueError):
        tiff.decode_tiff(b"GIF89a" + b"\x00" * 40)
    with pytest.raises(ValueError):
        tiff.encode_tiff(2, 2, b"\x00" * 12, 3, compression="packbits", predictor=True)
    with pytest.raises(ValueError):
        tiff.encode_tiff(2, 2, b"\x00" * 5, 3)
