"""FLAC codec, pure Python — RFC 9639 (lossless audio compression).

Widens the real-audio-codec set beyond RIFF/WAVE PCM
(multimodal.py encode_wav/decode_wav): FLAC is the lossless audio
format actually found in scraped/media corpora, and like the other
lossless codecs here (PNG/GIF/WebP) the certification contract is
byte-identity — encode → decode must reproduce the PCM samples
exactly, and the decoder additionally verifies the container's own
integrity chain (frame-header CRC-8, frame CRC-16, STREAMINFO MD5 of
the unencoded samples).

Decoder coverage: STREAMINFO + metadata-block walk, frame headers
(all block-size/sample-rate/sample-size code forms, UTF-8-coded
frame/sample numbers, fixed and variable blocking strategies), all
four channel assignments (independent, left/side, right/side,
mid/side — side channels carry the spec's +1 bit), subframe types
CONSTANT / VERBATIM / FIXED(0–4) / LPC(1–32) with wasted-bits
shifts, and both Rice residual methods (4- and 5-bit parameters)
including escaped raw-bit partitions.

Encoder coverage (chosen to exercise every decoder path): 16-bit
PCM, mono/stereo, any block size, all four stereo modes, CONSTANT
for flat blocks, FIXED orders 0–4 (best-order by residual magnitude),
VERBATIM, an LPC mode with quantized predictor coefficients, Rice
partitioning with per-partition optimal parameters, and the escape
path. Public-spec behavior only; the reference repo
(ETL Process/STG.py) has no media handling at all.
"""

from __future__ import annotations

import hashlib
import struct

# ------------------------------------------------------------ bit I/O
# FLAC packs bits MSB-first (network order) — the opposite of VP8L.


class _BitReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        v = 0
        bp = self.bitpos
        data = self.data
        for _ in range(n):
            byte = data[bp >> 3]
            v = (v << 1) | ((byte >> (7 - (bp & 7))) & 1)
            bp += 1
        self.bitpos = bp
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_offset(self) -> int:
        return self.bitpos >> 3


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0, "frame must be byte-aligned"
        return bytes(self.out)


# ---------------------------------------------------------------- CRCs


def _make_crc8_table() -> list[int]:
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------- coded number (UTF-8ish)


def _encode_coded_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    # n-byte form: lead byte carries (7 - n) bits, each of the n - 1
    # continuation bytes carries 6 (standard UTF-8 widths, extended to
    # 7 bytes / 36 bits)
    for nbytes in range(2, 8):
        lead_bits = 7 - nbytes
        if v < (1 << (lead_bits + 6 * (nbytes - 1))):
            break
    cont = []
    for _ in range(nbytes - 1):
        cont.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead_mask | v] + cont[::-1]
    return bytes(out)


def _decode_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC coded number lead byte")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------- frame helpers

_BLOCKSIZE_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                    4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                    2048: 0b1011, 4096: 0b1100, 8192: 0b1101, 16384: 0b1110,
                    32768: 0b1111}
_SAMPLE_RATE_CODES = {88200: 0b0001, 176400: 0b0010, 192000: 0b0011,
                      8000: 0b0100, 16000: 0b0101, 22050: 0b0110,
                      24000: 0b0111, 32000: 0b1000, 44100: 0b1001,
                      48000: 0b1010, 96000: 0b1011}
_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
                      32: 0b111}

_FIXED_COEFFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    co = _FIXED_COEFFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(co))
        for i in range(order, len(samples))
    ]


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _best_rice_param(residual: list[int], maxparam: int) -> int:
    if not residual:
        return 0
    total = sum(abs(v) for v in residual)
    mean = total // max(len(residual), 1)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < maxparam - 1:
        p += 1
    return p


# ---------------------------------------------------------------- encoder


def _write_residual(
    w: _BitWriter,
    residual: list[int],
    order: int,
    blocksize: int,
    partition_order: int,
    escape_bits: int | None,
) -> None:
    """Rice-coded residual (method 0, 4-bit params), 2^partition_order
    partitions; ``escape_bits`` forces the raw-bit escape in every
    partition (decoder-path exercise)."""
    w.write(0, 2)  # 4-bit rice parameters
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    pos = 0
    for k in range(nparts):
        count = psize - order if k == 0 else psize
        part = residual[pos : pos + count]
        pos += count
        if escape_bits is not None:
            w.write(0b1111, 4)
            w.write(escape_bits, 5)
            for v in part:
                w.write_signed(v, escape_bits)
            continue
        p = _best_rice_param(part, 15)
        w.write(p, 4)
        for v in part:
            u = _zigzag(v)
            w.write_unary(u >> p)
            if p:
                w.write(u & ((1 << p) - 1), p)


def _encode_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    mode: str,
    partition_order: int,
) -> None:
    n = len(samples)
    if mode == "auto":
        if all(s == samples[0] for s in samples):
            mode = "constant"
        else:
            mode = "fixed"
    if mode == "constant":
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(samples[0], bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
        return
    if mode in ("fixed", "escape"):
        best_order, best_cost = 0, None
        for order in range(min(4, n - 1) + 1):
            cost = sum(abs(v) for v in _fixed_residual(samples, order))
            if best_cost is None or cost < best_cost:
                best_order, best_cost = order, cost
        order = best_order
        residual = _fixed_residual(samples, order)
        while (n >> partition_order) <= order or n % (1 << partition_order):
            partition_order -= 1
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        escape = None
        if mode == "escape":
            escape = max(
                (abs(v).bit_length() + 1 for v in residual), default=1
            )
        _write_residual(w, residual, order, n, partition_order, escape)
        return
    if mode == "lpc":
        # a deliberately simple quantized predictor: coefficients
        # [3, -3, 1] (the FIXED order-3 polynomial) scaled by 2^shift —
        # exercises the LPC decode path (precision/shift/coeff fields)
        # with exact integer math.
        # precision must hold ±(3 << shift): 8-bit signed covers ±48
        order, shift, precision = 3, 4, 8
        if n <= order:
            return _encode_subframe(w, samples, bps, "verbatim", 0)
        coeffs = [3 << shift, -3 << shift, 1 << shift]
        residual = [
            samples[i]
            - (
                sum(coeffs[j] * samples[i - 1 - j] for j in range(order))
                >> shift
            )
            for i in range(order, n)
        ]
        while (n >> partition_order) <= order or n % (1 << partition_order):
            partition_order -= 1
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write_signed(s, bps)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(c, precision)
        _write_residual(w, residual, order, n, partition_order, None)
        return
    raise ValueError(f"unknown subframe mode: {mode}")


def encode_flac(
    sample_rate: int,
    pcm: bytes,
    channels: int = 1,
    *,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    subframe_mode: str = "auto",
    partition_order: int = 2,
) -> bytes:
    """Encode little-endian interleaved 16-bit PCM as a FLAC stream.
    ``stereo_mode`` ∈ independent / left_side / right_side / mid_side
    (stereo input only); ``subframe_mode`` ∈ auto / constant /
    verbatim / fixed / lpc / escape (escape = FIXED with raw-bit
    Rice-escape partitions)."""
    if channels not in (1, 2):
        raise ValueError("encoder supports mono or stereo 16-bit PCM")
    if len(pcm) % (2 * channels):
        raise ValueError("PCM byte length not a whole number of frames")
    n_total = len(pcm) // (2 * channels)
    samples = struct.unpack(f"<{n_total * channels}h", pcm)
    chans = [list(samples[c::channels]) for c in range(channels)]

    bps = 16
    md5 = hashlib.md5(pcm).digest()
    out = bytearray(b"fLaC")
    info = _BitWriter()
    # RFC 9639 §8.2: min/max block size are over all frames EXCEPT the
    # last (which may be shorter), and the legal range is 16..65535 —
    # so both fields are simply block_size; folding a short final
    # partial frame into the minimum would write a spec-invalid header
    # that strict decoders (libFLAC) reject.
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n_total, 36)
    body = info.bytes() + md5
    out += bytes([0x80 | 0x00]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    pos = 0
    while pos < n_total:
        bs = min(block_size, n_total - pos)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        bs_code = _BLOCKSIZE_CODES.get(bs)
        if bs_code is None:
            bs_code = 0b0110 if bs <= 256 else 0b0111
        w.write(bs_code, 4)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate)
        if sr_code is None:
            if sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
                sr_code = 0b1100
            elif sample_rate < 65536:
                sr_code = 0b1101
            elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
                sr_code = 0b1110
            else:
                sr_code = 0b0000  # from STREAMINFO
        w.write(sr_code, 4)
        if channels == 1 or stereo_mode == "independent":
            ch_code = channels - 1
            blocks = [ch[pos : pos + bs] for ch in chans]
        else:
            left = chans[0][pos : pos + bs]
            right = chans[1][pos : pos + bs]
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                ch_code = 0b1000
                blocks = [left, side]
                sub_bps = [bps, bps + 1]
            elif stereo_mode == "right_side":
                ch_code = 0b1001
                blocks = [side, right]
                sub_bps = [bps + 1, bps]
            elif stereo_mode == "mid_side":
                ch_code = 0b1010
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                blocks = [mid, side]
                sub_bps = [bps, bps + 1]
            else:
                raise ValueError(f"unknown stereo mode: {stereo_mode}")
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_CODES[bps], 3)
        w.write(0, 1)  # reserved
        for b in _encode_coded_number(frame_no):
            w.write(b, 8)
        if bs_code == 0b0110:
            w.write(bs - 1, 8)
        elif bs_code == 0b0111:
            w.write(bs - 1, 16)
        if sr_code == 0b1100:
            w.write(sample_rate // 1000, 8)
        elif sr_code == 0b1101:
            w.write(sample_rate, 16)
        elif sr_code == 0b1110:
            w.write(sample_rate // 10, 16)
        header = w.bytes()
        w = _BitWriter()
        for b in header:
            w.write(b, 8)
        w.write(crc8(header), 8)
        if channels == 1 or stereo_mode == "independent":
            for ch in blocks:
                _encode_subframe(w, ch, bps, subframe_mode, partition_order)
        else:
            for ch, cbps in zip(blocks, sub_bps):
                _encode_subframe(w, ch, cbps, subframe_mode, partition_order)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
        pos += bs
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------- decoder


def _read_residual(
    r: _BitReader, blocksize: int, order: int
) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    psize = blocksize >> porder
    if psize << porder != blocksize:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for k in range(nparts):
        count = psize - order if k == 0 else psize
        if count < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        p = r.read(pbits)
        if p == escape:
            nbits = r.read(5)
            for _ in range(count):
                out.append(r.read_signed(nbits) if nbits else 0)
            continue
        for _ in range(count):
            q = r.read_unary()
            u = (q << p) | (r.read(p) if p else 0)
            out.append(_unzigzag(u))
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if ftype == 0:
        v = r.read_signed(bps)
        samples = [v] * blocksize
    elif ftype == 1:
        samples = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:
        order = ftype - 8
        samples = [r.read_signed(bps) for _ in range(order)]
        residual = _read_residual(r, blocksize, order)
        co = _FIXED_COEFFS[order]
        for i, res in enumerate(residual):
            pos = order + i
            samples.append(
                res + sum(c * samples[pos - 1 - j] for j, c in enumerate(co))
            )
    elif ftype >= 32:
        order = ftype - 31
        samples = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = r.read(5)
        if shift >= 16:
            shift -= 32  # 5-bit two's complement (negative is invalid)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        residual = _read_residual(r, blocksize, order)
        for i, res in enumerate(residual):
            pos = order + i
            pred = sum(coeffs[j] * samples[pos - 1 - j] for j in range(order))
            samples.append(res + (pred >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> tuple[int, int, bytes]:
    """Decode a FLAC stream → (sample_rate, channels, interleaved
    little-endian 16-bit PCM). Verifies every frame-header CRC-8,
    every frame CRC-16, and the STREAMINFO MD5 of the decoded
    samples; 16-bit streams only (the container allows 4–32)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (fLaC marker missing)")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)
    si.read(16)
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    n_total = si.read(36)
    md5_expected = streaminfo[18:34]
    if bps != 16:
        raise ValueError(f"only 16-bit FLAC supported, got {bps}")

    chans: list[list[int]] = [[] for _ in range(channels)]
    try:
        _decode_frames(data, pos, channels, chans)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt FLAC frame: {exc}") from exc

    if n_total and any(len(c) != n_total for c in chans):
        raise ValueError("FLAC decoded sample count mismatch")
    n = len(chans[0])
    inter = [0] * (n * channels)
    for c in range(channels):
        inter[c::channels] = chans[c]
    pcm = struct.pack(f"<{n * channels}h", *inter)
    if hashlib.md5(pcm).digest() != md5_expected:
        raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return sample_rate, channels, pcm


def _decode_frames(
    data: bytes, pos: int, channels: int, chans: list[list[int]]
) -> None:
    """Frame loop: header (CRC-8), subframes, stereo decorrelation,
    frame CRC-16; appends decoded per-channel samples to ``chans``."""
    while pos < len(data):
        r = _BitReader(data, pos * 8)
        if r.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        if r.read(1):
            raise ValueError("FLAC reserved header bit set")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC reserved header bit set")
        _decode_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        if bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code not in (0, _SAMPLE_SIZE_CODES[16]):
            raise ValueError("frame sample size differs from STREAMINFO")
        r.align()
        header_end = r.byte_offset()
        if crc8(data[pos:header_end]) != data[header_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r = _BitReader(data, (header_end + 1) * 8)

        if ch_code <= 7:
            if ch_code + 1 != channels:
                raise ValueError("frame channel count differs from STREAMINFO")
            subs = [_read_subframe(r, bs, 16) for _ in range(channels)]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            bps_pair = {
                0b1000: (16, 17),
                0b1001: (17, 16),
                0b1010: (16, 17),
            }[ch_code]
            a = _read_subframe(r, bs, bps_pair[0])
            b = _read_subframe(r, bs, bps_pair[1])
            if ch_code == 0b1000:  # left/side
                subs = [a, [l - s for l, s in zip(a, b)]]
            elif ch_code == 0b1001:  # side/right
                subs = [[s + rt for s, rt in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        r.align()
        frame_end = r.byte_offset()
        if struct.unpack(">H", data[frame_end : frame_end + 2])[0] != crc16(
            data[pos:frame_end]
        ):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = frame_end + 2


# --------------------------------------------------------- spark plumbing

FLAC_CERTIFIED_SCHEMA = (
    "doc_id long, n_samples bigint, sample_rate int, peak bigint, "
    "sum_sq bigint, fixed_ok boolean, stereo_ok boolean, "
    "lpc_ok boolean, escape_ok boolean"
)


def certify_flac_pipeline(media) -> "object":
    """The FLAC path certified end-to-end, same signal contract as the
    WAV gate (m_audio_wav): each payload byte becomes a centered
    16-bit sample; the stream roundtrips byte-IDENTICALLY through
    four encoder paths — FIXED best-order mono, mid/side stereo (the
    left channel the signal, the right its 1-sample roll), the LPC
    subframe, and Rice-escape partitions — with every frame CRC-8/
    CRC-16 and the STREAMINFO MD5 verified by the decoder. The
    emitted stats are exact integers the oracle replays from
    character codes (peak = max|sample|, sum_sq = integer energy).

    mapInPandas batches; only (doc_id, stats, booleans) rows shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _one(payload: bytes):
            # stats derive from the TRUE payload (the oracle's
            # list_max/list_sum over an empty range are NULL and
            # n_samples is 0); the fallback byte only feeds the
            # roundtrip certification stream.
            raw = bytes(payload)
            b = raw or b"\x80"
            samples = [(v - 128) * 256 for v in b]
            pcm = struct.pack(f"<{len(samples)}h", *samples)
            peak = max(abs(s) for s in samples) if raw else None
            # sum_sq on the byte-scale deltas (the m_audio_wav oracle
            # convention: peak is sample-scale ×256, energy is not)
            sum_sq = sum((v - 128) * (v - 128) for v in b) if raw else None
            rate = 8000

            def _rt(data, want_ch, want_pcm):
                sr, ch, out = decode_flac(data)
                return sr == rate and ch == want_ch and out == want_pcm

            fixed_ok = _rt(
                encode_flac(rate, pcm, 1, block_size=64), 1, pcm
            )
            rolled = samples[1:] + samples[:1]
            st = [v for pair in zip(samples, rolled) for v in pair]
            st_pcm = struct.pack(f"<{len(st)}h", *st)
            stereo_ok = _rt(
                encode_flac(
                    rate, st_pcm, 2, block_size=64, stereo_mode="mid_side"
                ),
                2,
                st_pcm,
            )
            lpc_ok = _rt(
                encode_flac(rate, pcm, 1, block_size=64, subframe_mode="lpc"),
                1,
                pcm,
            )
            escape_ok = _rt(
                encode_flac(
                    rate, pcm, 1, block_size=64, subframe_mode="escape"
                ),
                1,
                pcm,
            )
            return (
                len(raw),
                rate,
                peak,
                sum_sq,
                bool(fixed_ok),
                bool(stereo_ok),
                bool(lpc_ok),
                bool(escape_ok),
            )

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": _np.array([r[0] for r in rows], dtype="int64"),
                    "sample_rate": _np.array([r[1] for r in rows], dtype="int32"),
                    "peak": _pd.array([r[2] for r in rows], dtype="Int64"),
                    "sum_sq": _pd.array([r[3] for r in rows], dtype="Int64"),
                    "fixed_ok": [r[4] for r in rows],
                    "stereo_ok": [r[5] for r in rows],
                    "lpc_ok": [r[6] for r in rows],
                    "escape_ok": [r[7] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=FLAC_CERTIFIED_SCHEMA)
