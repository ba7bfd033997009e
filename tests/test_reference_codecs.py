"""Two-sided reference certification of the image/audio codecs
against the JVM's javax.imageio / javax.sound.sampled — a second,
independent implementation of each format that ships inside the Spark
runtime itself (no extra dependency, available wherever the engine
runs).

For each lossless codec (PNG, BMP, GIF, WAV): our encoder's bytes
must decode EXACTLY under the JVM reference, and the JVM encoder's
bytes must decode EXACTLY under ours. For JPEG (lossy), both
directions must parse, agree on dimensions, and reconstruct within
the same error budget the m_decode_jpeg gate enforces. This
complements tests/test_webp.py's libwebp certification — every
shipping image codec now has a reference-implementation check, not
just self-roundtrips.

py4j round trips are per-call, so images here are deliberately tiny
(~17×9); the codecs' heavy-input behavior is covered by the pure
Python suites (test_multimodal/test_gif/test_webp/test_flac).
"""

from __future__ import annotations

import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources.gif import (
    GRAY_PALETTE,
    decode_gif,
    decode_gif_rgb,
    encode_gif,
)
from building_coffee_commodity_trading_data_warehouse_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)

W, H = 17, 9


def _rgb(seed: int, w: int = W, h: int = H) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def _jvm(spark):
    return spark._jvm


def _imageio_decode(spark, data: bytes):
    """→ (w, h, [(r, g, b, a), ...]) via javax.imageio."""
    jvm = _jvm(spark)
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    assert img is not None, "ImageIO could not parse the stream"
    w, h = img.getWidth(), img.getHeight()
    px = list(img.getRGB(0, 0, w, h, None, 0, w))
    return w, h, [
        ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, (p >> 24) & 0xFF)
        for p in px
    ]


def _imageio_encode(spark, fmt: str, w: int, h: int, rgb: bytes) -> bytes:
    jvm = _jvm(spark)
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for i in range(w * h):
        img.setRGB(
            i % w,
            i // w,
            (rgb[3 * i] << 16) | (rgb[3 * i + 1] << 8) | rgb[3 * i + 2],
        )
    baos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(img, fmt, baos)
    assert ok, f"ImageIO has no {fmt} writer"
    return bytes(baos.toByteArray())


def _expect_rgb(rgb: bytes):
    return [
        (rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2], 255)
        for i in range(len(rgb) // 3)
    ]


# ------------------------------------------------------------------ PNG


def test_png_ours_under_reference(spark):
    rgb = _rgb(1)
    w, h, px = _imageio_decode(spark, encode_png(W, H, rgb, 3))
    assert (w, h) == (W, H)
    assert px == _expect_rgb(rgb)


def test_png_reference_under_ours(spark):
    rgb = _rgb(2)
    data = _imageio_encode(spark, "png", W, H, rgb)
    w, h, c, out = decode_png(data)
    assert (w, h, c) == (W, H, 3)
    assert out == rgb


def test_png_gray_and_rgba_ours_under_reference(spark):
    rng = random.Random(3)
    gray = bytes(rng.randrange(256) for _ in range(W * H))
    jvm = _jvm(spark)
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(encode_png(W, H, gray, 1)))
    )
    assert (img.getWidth(), img.getHeight()) == (W, H)
    # getRGB would push gray through Java's linear-gray→sRGB colorspace
    # conversion (121 → 183); the RASTER holds the decoded samples
    raster = img.getRaster()
    got = [raster.getSample(i % W, i // W, 0) for i in range(W * H)]
    assert bytes(got) == gray
    rgba = bytes(rng.randrange(256) for _ in range(W * H * 4))
    w, h, px = _imageio_decode(spark, encode_png(W, H, rgba, 4))
    assert px == [
        (rgba[4 * i], rgba[4 * i + 1], rgba[4 * i + 2], rgba[4 * i + 3])
        for i in range(W * H)
    ]


# ------------------------------------------------------------------ BMP


def test_bmp_ours_under_reference(spark):
    rgb = _rgb(4)
    w, h, px = _imageio_decode(spark, encode_bmp(W, H, rgb))
    assert (w, h) == (W, H)
    assert px == _expect_rgb(rgb)


def test_bmp_reference_under_ours(spark):
    rgb = _rgb(5)
    data = _imageio_encode(spark, "bmp", W, H, rgb)
    w, h, c, out = decode_bmp(data)
    assert (w, h, c) == (W, H, 3)
    assert out == rgb


# ------------------------------------------------------------------ GIF


def test_gif_ours_under_reference(spark):
    rng = random.Random(6)
    gray = bytes(rng.randrange(256) for _ in range(W * H))
    w, h, px = _imageio_decode(spark, encode_gif(W, H, [gray]))
    assert (w, h) == (W, H)
    assert px == [(v, v, v, 255) for v in gray]


def test_gif_interlaced_ours_under_reference(spark):
    rng = random.Random(7)
    gray = bytes(rng.randrange(256) for _ in range(W * H))
    w, h, px = _imageio_decode(spark, encode_gif(W, H, [gray], interlace=True))
    assert (w, h) == (W, H)
    assert px == [(v, v, v, 255) for v in gray]


def test_gif_animation_frames_under_reference(spark):
    """Every animation frame must come back identical and IN ORDER
    from the reference decoder (ImageIO exposes frames via read(i))."""
    import numpy as np

    rng = random.Random(8)
    gray = bytes(rng.randrange(256) for _ in range(W * H))
    arr = np.frombuffer(gray, dtype=np.uint8)
    frames = [np.roll(arr, -k).tobytes() for k in range(3)]
    data = encode_gif(W, H, frames, delay_cs=4)
    jvm = _jvm(spark)
    stream = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    reader = jvm.javax.imageio.ImageIO.getImageReaders(stream).next()
    reader.setInput(stream)
    assert reader.getNumImages(True) == 3
    for k, frame in enumerate(frames):
        img = reader.read(k)
        px = list(img.getRGB(0, 0, W, H, None, 0, W))
        assert [
            ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) for p in px
        ] == [(v, v, v) for v in frame], f"frame {k}"


def test_gif_reference_under_ours(spark):
    """ImageIO's GIF writer quantizes into its own palette; feed an
    image of gray levels it can hold exactly and demand pixel-exact
    RGB back through OUR decoder."""
    rng = random.Random(9)
    gray = bytes(rng.randrange(32) * 8 for _ in range(W * H))
    rgb = b"".join(bytes((v, v, v)) for v in gray)
    data = _imageio_encode(spark, "gif", W, H, rgb)
    w, h, c, out = decode_gif_rgb(data)
    assert (w, h, c) == (W, H, 3)
    assert out == rgb


# ----------------------------------------------------------------- TIFF


@pytest.mark.parametrize(
    "kw",
    [
        dict(compression="none"),
        dict(compression="packbits"),
        dict(compression="lzw"),
        dict(compression="lzw", predictor=True),
    ],
    ids=lambda kw: "-".join(f"{k}={v}" for k, v in kw.items()),
)
def test_tiff_ours_under_reference(spark, kw):
    from building_coffee_commodity_trading_data_warehouse_spark.sources.tiff import (
        encode_tiff,
    )

    rgb = _rgb(14)
    w, h, px = _imageio_decode(spark, encode_tiff(W, H, rgb, 3, rows_per_strip=4, **kw))
    assert (w, h) == (W, H)
    assert px == _expect_rgb(rgb)


def test_tiff_ours_width_transition_under_reference(spark):
    """An 80×60 random image crosses the LZW 9→10→11 bit width
    transitions — the exact spot where an early-change disagreement
    desyncs the reference decoder."""
    from building_coffee_commodity_trading_data_warehouse_spark.sources.tiff import (
        encode_tiff,
    )

    rgb = _rgb(15, 80, 60)
    data = encode_tiff(80, 60, rgb, 3, compression="lzw", rows_per_strip=60)
    w, h, px = _imageio_decode(spark, data)
    assert (w, h) == (80, 60)
    assert px == _expect_rgb(rgb)


@pytest.mark.parametrize("ctype", [None, "PackBits", "LZW"])
def test_tiff_reference_under_ours(spark, ctype):
    from building_coffee_commodity_trading_data_warehouse_spark.sources.tiff import (
        decode_tiff,
    )

    jvm = _jvm(spark)
    rgb = _rgb(16, 40, 30)
    img = jvm.java.awt.image.BufferedImage(40, 30, 1)
    for i in range(40 * 30):
        img.setRGB(
            i % 40,
            i // 40,
            (rgb[3 * i] << 16) | (rgb[3 * i + 1] << 8) | rgb[3 * i + 2],
        )
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    params = writer.getDefaultWriteParam()
    if ctype:
        params.setCompressionMode(2)
        params.setCompressionType(ctype)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), params)
    ios.flush()
    w, h, c, out = decode_tiff(bytes(baos.toByteArray()))
    assert (w, h, c) == (40, 30, 3)
    assert out == rgb


# ----------------------------------------------------------------- JPEG


def _max_err(a: bytes, b: bytes) -> int:
    return max(abs(x - y) for x, y in zip(a, b))


def test_jpeg_ours_under_reference(spark):
    """Our 4:4:4 q95 stream must parse under ImageIO with the same
    reconstruction budget the m_decode_jpeg gate enforces (≤ 48)."""
    rgb = _rgb(10)
    data = encode_jpeg(W, H, rgb, quality=95, subsampling="444")
    w, h, px = _imageio_decode(spark, data)
    assert (w, h) == (W, H)
    flat = bytes(v for p in px for v in p[:3])
    assert _max_err(flat, rgb) <= 48


def test_jpeg_reference_under_ours(spark):
    """An ImageIO-encoded baseline JPEG (its own quant/Huffman tables,
    its own subsampling choice) must decode under ours within the
    gate budget."""
    jvm = _jvm(spark)
    # smooth gradient: on it, the decoders' only latitude is IDCT
    # rounding and chroma upsampling filters (ImageIO interpolates,
    # we replicate) — both small when chroma varies slowly. On noise
    # that upsampling latitude alone reaches ±60 (measured), which
    # would test the filter choice, not bitstream correctness.
    rgb = bytes(
        ((x * 7 + y * 3) % 256, (x * 2 + y * 5) % 256, (x + y * 4) % 256)[c]
        for y in range(H)
        for x in range(W)
        for c in range(3)
    )
    img = jvm.java.awt.image.BufferedImage(W, H, 1)
    for i in range(W * H):
        img.setRGB(
            i % W,
            i // W,
            (rgb[3 * i] << 16) | (rgb[3 * i + 1] << 8) | rgb[3 * i + 2],
        )
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    params = writer.getDefaultWriteParam()
    params.setCompressionMode(2)  # MODE_EXPLICIT
    params.setCompressionQuality(0.95)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), params)
    ios.flush()
    data = bytes(baos.toByteArray())
    w, h, c, out = decode_jpeg(data)
    assert (w, h, c) == (W, H, 3)
    # ImageIO writes 4:2:0 — on random noise the SUBSAMPLING error vs
    # the original is inherently large (chroma averaged 2×2), so the
    # right check is decoder-vs-decoder on the SAME bytes: both
    # reconstruct the same DCT coefficients, differing only in IDCT
    # rounding and chroma upsampling interpolation (ImageIO smooths,
    # we replicate — bounded, small on the luma-dominant signal).
    _, _, ref_px = _imageio_decode(spark, data)
    ref_flat = bytes(v for p in ref_px for v in p[:3])
    assert _max_err(out, ref_flat) <= 40
    import statistics

    mean_err = statistics.mean(
        abs(x - y) for x, y in zip(out, ref_flat)
    )
    assert mean_err <= 6


# ------------------------------------------------------------------ WAV


def _pcm16(values) -> bytes:
    return struct.pack(f"<{len(values)}h", *values)


def test_wav_ours_under_reference(spark):
    jvm = _jvm(spark)
    rng = random.Random(12)
    vals = [rng.randrange(-32768, 32768) for _ in range(500)]
    data = encode_wav(8000, _pcm16(vals), 1)
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    fmt = ais.getFormat()
    assert int(fmt.getSampleRate()) == 8000
    assert fmt.getChannels() == 1
    assert fmt.getSampleSizeInBits() == 16
    assert ais.getFrameLength() == 500
    assert bytes(ais.readAllBytes()) == _pcm16(vals)


def test_wav_reference_under_ours(spark):
    jvm = _jvm(spark)
    rng = random.Random(13)
    vals = [rng.randrange(-32768, 32768) for _ in range(300)]
    pcm = _pcm16(vals)
    fmt = jvm.javax.sound.sampled.AudioFormat(8000.0, 16, 1, True, False)
    jbytes = bytearray(pcm)
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(jbytes), fmt, len(vals)
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    wav_type = jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE
    jvm.javax.sound.sampled.AudioSystem.write(ais, wav_type, baos)
    data = bytes(baos.toByteArray())
    sr, ch, out = decode_wav(data)
    assert (sr, ch) == (8000, 1)
    assert out == pcm
