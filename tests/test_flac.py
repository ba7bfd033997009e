"""FLAC codec certification (RFC 9639 subset, sources/flac.py).

No reference libFLAC exists in this container (unlike libwebp for the
VP8L codec), so certification is the same as GIF's: byte-identity
roundtrips through every encoder path — which by construction
exercises every decoder path — plus integrity-chain checks (CRC-8 /
CRC-16 / STREAMINFO MD5 must catch single-bit corruption) and
bit-level pins of the header fields against the published spec
values.
"""

from __future__ import annotations

import math
import random
import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import flac


def _pcm(values):
    return struct.pack(f"<{len(values)}h", *values)


def _rand(n, seed):
    rng = random.Random(seed)
    return [rng.randrange(-32768, 32768) for _ in range(n)]


def _smooth(n):
    return [int(3000 * math.sin(i / 20)) for i in range(n)]


def _roundtrip(values, ch=1, **kw):
    pcm = _pcm(values)
    data = flac.encode_flac(8000, pcm, ch, **kw)
    sr, c, out = flac.decode_flac(data)
    assert (sr, c) == (8000, ch)
    assert out == pcm
    return data


@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed", "lpc", "escape"])
@pytest.mark.parametrize("block_size", [64, 192, 4096, 100])
def test_roundtrip_mono_modes(mode, block_size):
    for name, vals in [
        ("random", _rand(1000, 3)),
        ("smooth", _smooth(1000)),
        ("flat", [1234] * 1000),
    ]:
        _roundtrip(vals, subframe_mode=mode, block_size=block_size)


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(stereo_mode):
    n = 700
    left = _smooth(n)
    right = [int(2999 * math.sin(i / 20 + 0.01)) for i in range(n)]
    inter = [v for pair in zip(left, right) for v in pair]
    _roundtrip(inter, ch=2, stereo_mode=stereo_mode, block_size=256)


def test_roundtrip_stereo_odd_parity_mid_side():
    """mid/side floor-division parity: odd sums must reconstruct."""
    inter = [5, 2, -5, 2, 1, 0, -1, -2, 32767, -32768]
    _roundtrip(inter, ch=2, stereo_mode="mid_side", block_size=5)


def test_roundtrip_extremes_and_tiny():
    _roundtrip([-32768, 32767, -1, 0], block_size=4)
    _roundtrip([-5])
    _roundtrip([0] * 192)  # constant subframe, table blocksize code


def test_compression_on_smooth_signal():
    """FIXED predictors + Rice must actually compress a smooth signal
    (the point of the codec, not just container framing)."""
    pcm = _pcm(_smooth(4000))
    data = flac.encode_flac(8000, pcm, 1)
    assert len(data) < len(pcm) * 0.3


def test_verbatim_larger_than_fixed():
    pcm_vals = _smooth(2000)
    fixed = flac.encode_flac(8000, _pcm(pcm_vals), 1, subframe_mode="fixed")
    verb = flac.encode_flac(8000, _pcm(pcm_vals), 1, subframe_mode="verbatim")
    assert len(fixed) < len(verb)


def test_corruption_detection():
    good = flac.encode_flac(8000, _pcm(_smooth(600)), 1, block_size=192)
    # flip one bit somewhere in frame data → CRC-16 or MD5 must object
    for byte in (60, len(good) // 2, len(good) - 3):
        bad = bytearray(good)
        bad[byte] ^= 0x01
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(bad))


def test_header_bits_pinned():
    """Spec pins: fLaC marker, STREAMINFO fields, frame sync code."""
    vals = _smooth(500)
    data = flac.encode_flac(44100, _pcm(vals), 1, block_size=192)
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80  # last-metadata flag + type 0 (STREAMINFO)
    assert int.from_bytes(data[5:8], "big") == 34
    si = flac._BitReader(data[8 : 8 + 34])
    # RFC 9639 §8.2: the last (short, 116-sample) frame is EXCLUDED
    # from the min/max block-size bounds, and 16..65535 is the legal
    # range — both fields are the nominal block size.
    assert si.read(16) == 192  # min block size (last frame excluded)
    assert si.read(16) == 192  # max block size
    si.read(24)
    si.read(24)
    assert si.read(20) == 44100
    assert si.read(3) + 1 == 1
    assert si.read(5) + 1 == 16
    assert si.read(36) == 500
    frame = data[8 + 34 :]
    assert frame[0] == 0xFF and (frame[1] & 0xFC) == 0xF8  # 14-bit sync


def test_streaminfo_md5_is_of_raw_pcm():
    import hashlib

    vals = _rand(300, 9)
    pcm = _pcm(vals)
    data = flac.encode_flac(8000, pcm, 1)
    md5 = data[8 + 18 : 8 + 34]
    assert md5 == hashlib.md5(pcm).digest()


def test_coded_number_roundtrip():
    r = random.Random(1)
    cases = [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 0x3FFFFFF,
             (1 << 31), (1 << 36) - 1] + [r.randrange(1 << 36) for _ in range(50)]
    for v in cases:
        enc = flac._encode_coded_number(v)
        rd = flac._BitReader(enc)
        assert flac._decode_coded_number(rd) == v, v


def test_crc_vectors():
    """CRC-8 poly 0x07 and CRC-16 poly 0x8005 (init 0, no reflection):
    standard check values."""
    assert flac.crc8(b"123456789") == 0xF4
    assert flac.crc16(b"123456789") == 0xFEE8


def test_rice_escape_partitions_roundtrip():
    vals = _rand(512, 5)
    data = _roundtrip(vals, subframe_mode="escape", block_size=128)
    # escape streams are near-verbatim for random data
    assert len(data) > len(vals)


def test_non_flac_rejected():
    with pytest.raises(ValueError):
        flac.decode_flac(b"RIFF" + b"\x00" * 30)


def test_wrong_channel_pcm_length_rejected():
    with pytest.raises(ValueError):
        flac.encode_flac(8000, b"\x00\x01\x02", 1)  # 3 bytes ≠ whole samples


def test_streaminfo_min_block_size_spec_valid_with_short_last_frame():
    """RFC 9639: min/max block size exclude the last frame and must be
    16..65535 — a 5-sample stream at block_size=64 must still write
    64/64, not a spec-invalid 5 (strict decoders reject <16)."""
    vals = [100, -200, 300, -400, 500]
    data = flac.encode_flac(8000, _pcm(vals), 1, block_size=64)
    si = flac._BitReader(data[8 : 8 + 34])
    assert si.read(16) == 64  # min
    assert si.read(16) == 64  # max
    # and the stream still decodes exactly
    assert flac.decode_flac(data)[2] == _pcm(vals)
