"""Decoder robustness: hostile bytes must terminate promptly with a
clean Python exception — never hang, never return success on garbage
that declares impossible shapes.

Web-corpus reality: a crawl's media column contains truncated
downloads, mislabeled formats, and bit-rotted files. Every decoder
here is driven with (a) random bytes behind each format's valid magic,
(b) truncations of valid streams at every byte boundary, and (c)
single-bit flips of valid streams. The contract: a ValueError (or a
narrow set of parse-layer errors) or a successful decode whose output
shape is self-consistent — and in well under a second per input.
"""

from __future__ import annotations

import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import (
    flac,
    gif,
    jpeg,
    tiff,
    webp,
)
from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)

# parse layers may surface these besides ValueError; anything else
# (KeyError deep in a table, TypeError, hang) is a bug.
_OK_ERRORS = (ValueError, struct.error, IndexError, EOFError, OverflowError)


def _fuzz_one(decoder, data: bytes):
    try:
        out = decoder(data)
    except _OK_ERRORS:
        return
    # a success on mangled input is allowed only if self-consistent
    if isinstance(out, tuple) and len(out) == 4:
        w, h, c, px = out
        assert len(px) == w * h * c
    elif isinstance(out, tuple) and len(out) == 3:
        sr, ch, pcm = out
        assert len(pcm) % (2 * ch) == 0


_VALID = {}


def _valid_streams():
    if _VALID:
        return _VALID
    rng = random.Random(0)
    w, h = 9, 5
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    gray = bytes(rng.randrange(256) for _ in range(w * h))
    pcm = struct.pack("<64h", *[rng.randrange(-32768, 32768) for _ in range(64)])
    _VALID.update(
        {
            "bmp": (decode_bmp, encode_bmp(w, h, rgb)),
            "png": (decode_png, encode_png(w, h, rgb, 3)),
            "gif": (gif.decode_gif_rgb, gif.encode_gif(w, h, [gray])),
            "jpeg": (jpeg.decode_jpeg, jpeg.encode_jpeg(w, h, rgb, quality=90)),
            "webp": (webp.decode_webp, webp.encode_webp(w, h, rgb, 3)),
            "tiff": (
                tiff.decode_tiff,
                tiff.encode_tiff(w, h, rgb, 3, compression="lzw"),
            ),
            "wav": (decode_wav, encode_wav(8000, pcm, 1)),
            "flac": (flac.decode_flac, flac.encode_flac(8000, pcm, 1)),
        }
    )
    return _VALID


_MAGICS = {
    "bmp": b"BM",
    "png": b"\x89PNG\r\n\x1a\n",
    "gif": b"GIF89a",
    "jpeg": b"\xff\xd8\xff",
    "webp": b"RIFF\x40\x00\x00\x00WEBPVP8L",
    "tiff": b"II*\x00",
    "wav": b"RIFF\x40\x00\x00\x00WAVE",
    "flac": b"fLaC",
}


@pytest.mark.parametrize("fmt", sorted(_MAGICS))
def test_random_bytes_behind_magic(fmt):
    decoder, _ = _valid_streams()[fmt]
    rng = random.Random(hash(fmt) & 0xFFFF)
    for trial in range(50):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(4, 200)))
        _fuzz_one(decoder, _MAGICS[fmt] + body)


@pytest.mark.parametrize("fmt", sorted(_MAGICS))
def test_truncations_of_valid_stream(fmt):
    decoder, valid = _valid_streams()[fmt]
    step = max(1, len(valid) // 96)
    for cut in range(0, len(valid), step):
        _fuzz_one(decoder, valid[:cut])


@pytest.mark.parametrize("fmt", sorted(_MAGICS))
def test_bit_flips_of_valid_stream(fmt):
    decoder, valid = _valid_streams()[fmt]
    rng = random.Random(len(valid))
    for trial in range(60):
        arr = bytearray(valid)
        arr[rng.randrange(len(arr))] ^= 1 << rng.randrange(8)
        _fuzz_one(decoder, bytes(arr))
