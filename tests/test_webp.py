"""WebP lossless (VP8L) codec certification.

Three layers of evidence, strongest first:

1. **Reference cross-certification** (when the system libwebp is
   loadable via ctypes — it is in this container): every one of our
   encoder paths must decode bit-exactly under the REFERENCE decoder
   (proves our bitstreams are spec-valid), and reference-encoder
   streams — which use the full arsenal: subtract-green + predictor +
   color transforms, meta prefix codes, color cache, LZ77 with the 2D
   distance map — must decode bit-exactly under OUR decoder.
2. **Distance-map probe**: the 120-entry plane-code table is
   re-derived empirically by decoding crafted one-copy streams with
   libwebp and reading back which pixel was copied; the hardcoded
   table must match all 120 entries.
3. **Self roundtrips** (no native dependency): byte-identity through
   every encoder mode across shapes, including 1×1, single-row,
   single-column, bundling-boundary widths, RGBA with alpha, and all
   14 predictor modes.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import webp


def _libwebp():
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    enc_args = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = enc_args
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = enc_args
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp not available")


def _lib_decode_rgba(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp refused the stream"
    out = ctypes.string_at(p, w.value * h.value * 4)
    _LIB.WebPFree(p)
    return w.value, h.value, out


def _lib_encode(w: int, h: int, buf: bytes, channels: int = 3) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = _LIB.WebPEncodeLosslessRGBA if channels == 4 else _LIB.WebPEncodeLosslessRGB
    n = fn(buf, w, h, w * channels, ctypes.byref(out))
    assert n, "libwebp refused to encode"
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def _rand_rgb(w: int, h: int, seed: int, channels: int = 3) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * channels))


_ALL_MODES = [
    dict(mode="none", use_lz77=False),
    dict(mode="none", cache_bits=6),
    dict(mode="none", cache_bits=8, use_lz77=True),
    dict(mode="subgreen", use_lz77=False),
    dict(mode="color"),
    *[dict(mode="predictor", predictor_mode=m) for m in range(14)],
]


# ------------------------------------------------------- self roundtrips


@pytest.mark.parametrize("kw", _ALL_MODES, ids=lambda kw: "-".join(
    f"{k}={v}" for k, v in kw.items()
))
def test_roundtrip_modes(kw):
    w, h = 17, 9
    rgb = _rand_rgb(w, h, 7)
    w1, h1, c1, out = webp.decode_webp(webp.encode_webp(w, h, rgb, 3, **kw))
    assert (w1, h1, c1) == (w, h, 3)
    assert out == rgb


@pytest.mark.parametrize("shape", [(1, 1), (3, 1), (1, 7), (2, 2), (33, 20), (40, 1)])
def test_roundtrip_shapes(shape):
    w, h = shape
    rgb = _rand_rgb(w, h, w * 100 + h)
    for mode in ("none", "subgreen", "predictor", "color"):
        _, _, _, out = webp.decode_webp(webp.encode_webp(w, h, rgb, 3, mode=mode))
        assert out == rgb, mode


@pytest.mark.parametrize("n_colors", [2, 3, 4, 5, 16, 17, 200])
def test_roundtrip_palette_bundling(n_colors):
    """Every pixel-bundling width: ≤2 → 1-bit, ≤4 → 2-bit, ≤16 →
    4-bit packed indices, >16 → plain 8-bit indices."""
    w, h = 19, 7  # width NOT a multiple of any bundle factor
    rng = random.Random(n_colors)
    pal = [bytes(((i * 31) % 256, (i * 57) % 256, (255 - i) % 256)) for i in range(n_colors)]
    img = b"".join(pal[rng.randrange(n_colors)] for _ in range(w * h))
    w1, h1, c1, out = webp.decode_webp(webp.encode_webp(w, h, img, 3, mode="palette"))
    assert (w1, h1, c1) == (w, h, 3)
    assert out == img


def test_roundtrip_degenerate_alphabets():
    w, h = 9, 5
    # single color → 1-symbol simple codes everywhere
    flat = b"\x05\x06\x07" * (w * h)
    assert webp.decode_webp(webp.encode_webp(w, h, flat, 3, mode="none"))[3] == flat
    # two colors → 2-symbol simple codes
    two = (b"\x00\x00\x00" + b"\xff\xff\xff") * ((w * h) // 2) + b"\x00\x00\x00"
    assert webp.decode_webp(webp.encode_webp(w, h, two, 3, mode="none"))[3] == two


def test_roundtrip_rgba_alpha():
    w, h = 11, 6
    rgba = _rand_rgb(w, h, 3, channels=4)
    w1, h1, c1, out = webp.decode_webp(webp.encode_webp(w, h, rgba, 4))
    assert (w1, h1, c1) == (w, h, 4)
    assert out == rgba


def test_roundtrip_gray_input():
    w, h = 12, 5
    gray = _rand_rgb(w, h, 4, channels=1)
    w1, h1, c1, out = webp.decode_webp(webp.encode_webp(w, h, gray, 1))
    assert (w1, h1, c1) == (w, h, 3)
    assert out == b"".join(bytes((v, v, v)) for v in gray)


def test_lz77_long_runs_cross_rows():
    """Runs longer than a row force distance-1 and distance-width
    matches plus length extra-bits > 0."""
    w, h = 16, 12
    buf = b"\x11\x22\x33" * (w * h // 2) + b"\x44\x55\x66" * (w * h - w * h // 2)
    _, _, _, out = webp.decode_webp(
        webp.encode_webp(w, h, buf, 3, mode="none", use_lz77=True, cache_bits=4)
    )
    assert out == buf


def test_lossy_vp8_rejected():
    fake = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError, match="lossy"):
        webp.decode_webp(fake)


def test_not_webp_rejected():
    with pytest.raises(ValueError):
        webp.decode_webp(b"GIF89a" + b"\x00" * 20)


def test_dist_map_generated_rule_prefix():
    """The first 96 entries follow the visible-neighborhood distance
    ordering (squared distance, then larger y, then positive x); the
    hardcoded tail intentionally deviates (see webp._DIST_MAP note)."""
    gen = sorted(
        ((x, y) for y in range(0, 9) for x in range(-8, 9) if y > 0 or x > 0),
        key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] > 0 else 1),
    )[:120]
    assert webp._DIST_MAP[:96] == gen[:96]
    assert len(webp._DIST_MAP) == 120
    assert len(set(webp._DIST_MAP)) == 120


# -------------------------------------------- reference cross-certification


@needs_libwebp
@pytest.mark.parametrize("kw", _ALL_MODES, ids=lambda kw: "-".join(
    f"{k}={v}" for k, v in kw.items()
))
def test_our_streams_decode_under_reference(kw):
    w, h = 17, 9
    rgb = _rand_rgb(w, h, 11)
    data = webp.encode_webp(w, h, rgb, 3, **kw)
    w1, h1, rgba = _lib_decode_rgba(data)
    assert (w1, h1) == (w, h)
    assert rgba == b"".join(rgb[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))


@needs_libwebp
def test_our_palette_and_lz77_streams_decode_under_reference():
    w, h = 19, 7
    pal = [bytes((i * 17 % 256, i * 53 % 256, i * 101 % 256)) for i in range(5)]
    rng = random.Random(5)
    img = b"".join(pal[rng.randrange(5)] for _ in range(w * h))
    w1, h1, rgba = _lib_decode_rgba(webp.encode_webp(w, h, img, 3, mode="palette"))
    assert rgba == b"".join(img[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))

    runs = (b"\x01\x02\x03" * 40 + b"\x09\x08\x07" * 40)
    runs = (runs * (w * h * 3 // len(runs) + 1))[: w * h * 3]
    data = webp.encode_webp(w, h, runs, 3, mode="none", cache_bits=8, use_lz77=True)
    _, _, rgba = _lib_decode_rgba(data)
    assert rgba == b"".join(runs[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))


@needs_libwebp
@pytest.mark.parametrize("shape", [(17, 9), (64, 48), (33, 20), (128, 70)])
def test_reference_streams_decode_under_ours(shape):
    """libwebp's lossless encoder uses the full spec (transform
    combinations, meta prefix codes, color cache, the distance map) —
    decoding its output bit-exactly is the strongest spec-parity
    evidence available offline."""
    import math

    w, h = shape
    pal = [bytes((i * 17 % 256, i * 53 % 256, i * 101 % 256)) for i in range(5)]
    images = {
        "gradient": bytes(
            ((x * 3 + y * 5) % 256, (x ^ y) % 256, (x + 2 * y) % 256)[c]
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ),
        "random": _rand_rgb(w, h, w * h),
        "blocks": b"".join(
            pal[(x // 4 + y // 4) % 5] for y in range(h) for x in range(w)
        ),
        "waves": bytes(
            (int(128 + 100 * math.sin(x / 7 + y / 11)) % 256, (x * y) % 256, (x + y) % 256)[c]
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ),
    }
    for name, buf in images.items():
        w1, h1, c1, out = webp.decode_webp(_lib_encode(w, h, buf))
        assert (w1, h1, c1) == (w, h, 3), name
        assert out == buf, name


@needs_libwebp
def test_reference_rgba_streams_decode_under_ours():
    """Bit-exact vs the reference DECODER. (The reference encoder
    itself discards RGB under fully-transparent pixels, so comparing
    against the original buffer would test libwebp's policy, not us.)"""
    w, h = 24, 16
    rgba = _rand_rgb(w, h, 9, channels=4)
    data = _lib_encode(w, h, rgba, channels=4)
    w1, h1, ref = _lib_decode_rgba(data)
    ww, hh, c, out = webp.decode_webp(data)
    assert (ww, hh, c) == (w1, h1, 4)
    assert out == ref


@needs_libwebp
def test_dist_map_matches_reference_probe():
    """Re-derive all 120 plane-code offsets by crafting one-copy
    streams and asking libwebp which pixel was copied."""
    w, h = 20, 10
    n = w * h

    def probe(code: int):
        wtr = webp._Writer()
        wtr.write(w - 1, 14)
        wtr.write(h - 1, 14)
        wtr.write(0, 1)
        wtr.write(0, 3)
        wtr.write(0, 1)  # no transforms
        wtr.write(0, 1)  # no cache
        wtr.write(0, 1)  # no meta
        lp, lex, lbits = webp._prefix_encode(1)
        dp, dex, dbits = webp._prefix_encode(code)
        g_f = {0: n - 1, 256 + lp: 1}
        r_f: dict[int, int] = {}
        b_f: dict[int, int] = {}
        for i in range(n - 1):
            r_f[i % 256] = r_f.get(i % 256, 0) + 1
            b_f[i // 256] = b_f.get(i // 256, 0) + 1
        green = webp._write_prefix_code(wtr, g_f, 256 + 24)
        red = webp._write_prefix_code(wtr, r_f, 256)
        blue = webp._write_prefix_code(wtr, b_f, 256)
        alpha = webp._write_prefix_code(wtr, {255: n - 1}, 256)
        dist = webp._write_prefix_code(wtr, d_f := {dp: 1}, 40)
        for i in range(n - 1):
            wtr.write_code(*green[0])
            wtr.write_code(*red[i % 256])
            wtr.write_code(*blue[i // 256])
            wtr.write_code(*alpha[255])
        wtr.write_code(*green[256 + lp])
        if lbits:
            wtr.write(lex, lbits)
        wtr.write_code(*dist[dp])
        if dbits:
            wtr.write(dex, dbits)
        payload = b"\x2f" + wtr.bytes()
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        _, _, rgba = _lib_decode_rgba(data)
        last = rgba[4 * (n - 1) : 4 * (n - 1) + 4]
        return (n - 1) - (last[0] + 256 * last[2])

    for code in range(1, 121):
        d = probe(code)
        dy = (d + 8) // w
        dx = d - w * dy
        assert webp._DIST_MAP[code - 1] == (dx, dy), f"plane code {code}"


def test_hostile_huge_dims_rejected_fast():
    """DoS guard: a ~30-byte stream declaring 16384x16384 with 0-bit
    'const' prefix codes must be rejected by the VP8L_MAX_PIXELS cap
    BEFORE the ~268M-iteration emit loop, not decoded."""
    import time

    # 0x2F sig, then 28 bits of 1s → w-1 = h-1 = 16383, alpha=0, ver=0
    payload = bytes([0x2F, 0xFF, 0xFF, 0xFF, 0x0F]) + b"\x00" * 25
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="VP8L_MAX_PIXELS"):
        webp.decode_vp8l(payload)
    assert time.monotonic() - t0 < 1.0
    # the full RIFF container path hits the same guard
    riff = (
        b"RIFF" + (4 + 8 + len(payload)).to_bytes(4, "little") + b"WEBP"
        + b"VP8L" + len(payload).to_bytes(4, "little") + payload
    )
    with pytest.raises(ValueError, match="VP8L_MAX_PIXELS"):
        webp.decode_webp(riff)


def test_max_pixels_cap_is_configurable():
    """Trusted callers may raise the module-level cap; images at or
    under the cap decode normally (the certify gates are ≤17x9)."""
    assert webp.VP8L_MAX_PIXELS >= (1 << 22)
    w, h = 17, 9
    rgb = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    out = webp.decode_webp(webp.encode_webp(w, h, rgb, 3))
    assert out == (w, h, 3, rgb)
