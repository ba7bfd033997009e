"""Baseline-sequential JPEG codec, pure Python + numpy — no PIL/libjpeg.

Closes the last documented multimodal capability gap (the
``decode_image(codec='pil')`` NotImplementedError slot): real LLM
multimodal corpora are JPEG-heavy, and BMP/PNG/WAV alone leave the
dominant format undecodable. Like the PNG codec (multimodal.py), this
is a REAL implementation of the public interchange format — ITU-T.81
baseline sequential DCT, 8-bit precision — not a passthrough fake:

  * encoder: JFIF framing, Annex-K quantization tables scaled by the
    IJG quality formula, Annex-K Huffman tables written via DHT,
    4:4:4 or 4:2:0 chroma subsampling, optional restart intervals,
    0xFF byte stuffing;
  * decoder: segment parser (DQT incl. 16-bit precision, DHT with
    multiple tables per segment, SOF0, DRI, APPn/COM skip), canonical
    Huffman decode, dequantize + batched IDCT (one einsum per
    component — the per-block Python loop only touches the entropy
    stream), sampling-factor-general block placement and nearest
    upsampling, RST0-7 resync with DC-predictor reset.

Spark-side plumbing lives in multimodal.certify_jpeg_pipeline /
decode_image(codec='auto'): batches of payloads flow through
mapInPandas, each batch decoded here executor-side — image bytes are
never shuffled, only (doc_id, dims, booleans) rows leave the stage.

JPEG is lossy, so the certification contract differs from the
byte-identity BMP/PNG gates: decode(encode(img)) must reproduce dims
exactly and pixels within an error budget measured for the quality
setting (pytest pins constant-color images to ±1 — DC-only blocks —
and the driver gate carries dims + bounded-error booleans).

Reference behavior modeled on the public JPEG spec (ITU-T.81) only;
the reference repo (/root/reference, pandas/psycopg2 ETL) has no
media handling at all — this is north-star scope, not parity.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------- tables

_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    for _r in range(_s, -1, -1) if _s % 2 == 0 else range(0, _s + 1):
        _c = _s - _r
        if _r < 8 and _c < 8:
            _ZIGZAG.append((_r, _c))
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# ITU-T.81 Annex K base quantization tables (luminance, chrominance)
_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL). The encoder
# writes these into DHT and the decoder reads tables back from DHT, so
# the bitstream is self-describing — these constants only pick WHICH
# valid prefix code the encoder uses.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_DCT = np.array(
    [
        [
            (math.sqrt(0.125) if u == 0 else 0.5)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality → quantization-table scaling."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), JPEG canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for bit-serial canonical decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# --------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted spatial blocks → DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _DCT, plane - 128.0, _DCT)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to 8-multiples by edge replication and cut into
    row-major (n, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _encode_coeff_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    cat = abs(diff).bit_length()
    c, ln = dc_codes[cat]
    bw.write(c, ln)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        cat = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | cat]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
    channels: int = 3,
    restart_interval: int = 0,
) -> bytes:
    """Encode a raw row-major pixel buffer (RGB if channels=3, gray if
    channels=1) as baseline-sequential JFIF. ``subsampling`` is '444'
    (no chroma decimation) or '420' (2x2); gray ignores it."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    img = np.frombuffer(pixels, dtype=np.uint8)
    if len(img) != width * height * channels:
        raise ValueError("pixel buffer does not match dims")
    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHROM, quality)

    if channels == 3:
        rgb = img.reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img.reshape(height, width).astype(np.float64)]

    sub = subsampling if channels == 3 else "444"
    if sub == "420" and channels == 3:
        hv = [(2, 2), (1, 1), (1, 1)]
        ph, pw = -height % 2, -width % 2
        dec = []
        for p in planes[1:]:
            q = np.pad(p, ((0, ph), (0, pw)), mode="edge")
            dec.append(
                (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2])
                / 4.0
            )
        planes = [planes[0]] + dec
    else:
        hv = [(1, 1)] * channels

    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component quantized coefficient blocks in row-major order;
    # each plane pads (edge replication) to its MCU-grid extent —
    # (mcuy*vi*8, mcux*hi*8) — which for subsampled layouts exceeds
    # the next 8-multiple
    comp_zz: list[np.ndarray] = []
    comp_bw: list[int] = []
    for ci, p in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        h_i, v_i = hv[ci]
        th, tw = mcuy * v_i * 8, mcux * h_i * 8
        ph, pw = th - p.shape[0], tw - p.shape[1]
        if ph or pw:
            p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
        blocks, bh, bw_ = _plane_blocks(p)
        coeff = _fdct_blocks(blocks)
        zz = np.rint(coeff / qt[None, :, :])[:, _ZZ_ROWS, _ZZ_COLS].astype(
            np.int64
        )
        comp_zz.append(zz)
        comp_bw.append(bw_)

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_c = _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    writer = _BitWriter()
    preds = [0] * channels
    out_entropy = bytearray()
    rst = 0
    n_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_in_interval == restart_interval:
                writer.pad_to_byte()
                out_entropy += writer.buf
                out_entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                preds = [0] * channels
                n_in_interval = 0
            for ci in range(channels):
                h_i, v_i = hv[ci]
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(v_i):
                    for bx in range(h_i):
                        row = my * v_i + by
                        col = mx * h_i + bx
                        idx = row * comp_bw[ci] + col
                        preds[ci] = _encode_coeff_block(
                            writer, comp_zz[ci][idx], preds[ci], dc, ac
                        )
            n_in_interval += 1
    writer.pad_to_byte()
    out_entropy += writer.buf

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    zz_l = qt_l[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += _seg(0xDB, b"\x00" + zz_l)
    if channels == 3:
        zz_c = qt_c[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += _seg(0xDB, b"\x01" + zz_c)
    sof = bytearray([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(channels)
    for ci in range(channels):
        h_i, v_i = hv[ci]
        sof += bytes([ci + 1, (h_i << 4) | v_i, 0 if ci == 0 else 1])
    out += _seg(0xC0, bytes(sof))

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += _dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if channels == 3:
        out += _dht(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS)
        out += _dht(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([channels])
    for ci in range(channels):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    out += out_entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


class _BitReader:
    """Bit-serial reader over one de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                # past the end: spec allows padding 1-bits
                return 1
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG → (width, height, channels,
    row-major pixel bytes: RGB for 3-component YCbCr, gray for 1).

    Supports: 8-bit baseline (SOF0), 1 or 3 components, sampling
    factors up to 2 (4:4:4 / 4:2:2 / 4:2:0), 8/16-bit DQT entries,
    multi-table DQT/DHT segments, DRI + RST0-7 resync, APPn/COM skip,
    0xFF00 stuffing. Rejects progressive/arithmetic JPEGs with a
    clear error (they are a different entropy layout, not a bigger
    buffer)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps: list of (cid, hi, vi, tq)
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[i : i + 2], "big")
        body = data[i + 2 : i + seglen]
        nxt = i + seglen
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                j += 1
                if pq:
                    vals = np.frombuffer(
                        body[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        body[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                qt = np.zeros((8, 8), dtype=np.int64)
                qt[_ZZ_ROWS, _ZZ_COLS] = vals
                qts[tq] = qt
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                j += 17 + nv
                (ac_tabs if tc else dc_tabs)[th] = _decode_table(bits, vals)
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            comps = []
            for k in range(nf):
                cid = body[6 + 3 * k]
                hv = body[7 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0xF, body[8 + 3 * k]))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}): only "
                "baseline sequential (SOF0) is implemented"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = {}
            for k in range(ns):
                cs = body[1 + 2 * k]
                tt = body[2 + 2 * k]
                scan_tabs[cs] = (tt >> 4, tt & 0xF)
            # split the entropy stream at RST markers, de-stuffing
            segments: list[bytes] = []
            cur = bytearray()
            j = nxt
            while j < n:
                b = data[j]
                if b != 0xFF:
                    cur.append(b)
                    j += 1
                    continue
                m2 = data[j + 1] if j + 1 < n else 0xD9
                if m2 == 0x00:
                    cur.append(0xFF)
                    j += 2
                elif 0xD0 <= m2 <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    j += 2
                else:
                    break
            segments.append(bytes(cur))
            return _decode_scan(
                frame,
                scan_tabs,
                qts,
                dc_tabs,
                ac_tabs,
                segments,
                restart_interval,
            )
        i = nxt
    raise ValueError("no SOS marker found")


def _decode_scan(
    frame,
    scan_tabs,
    qts,
    dc_tabs,
    ac_tabs,
    segments,
    restart_interval,
) -> tuple[int, int, int, bytes]:
    h, w, comps = frame
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # coefficient storage: per component, (blocks_down, blocks_across)
    comp_dims = []
    for cid, hi, vi, tq in comps:
        comp_dims.append((mcuy * vi, mcux * hi))
    coeff = [
        np.zeros((bd * ba, 8, 8), dtype=np.float64) for bd, ba in comp_dims
    ]

    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * nc
    n_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_in_interval == restart_interval:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                preds = [0] * nc
                n_in_interval = 0
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                try:
                    td, ta = scan_tabs[cid]
                    dct, act = dc_tabs[td], ac_tabs[ta]
                    qt = qts[tq]
                except KeyError as exc:
                    raise ValueError(
                        f"JPEG references undefined table {exc} (corrupt "
                        "or non-baseline stream)"
                    ) from exc
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, dct)
                        preds[ci] += _extend(reader.receive(s), s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        row = my * vi + by
                        col = mx * hi + bx
                        idx = row * comp_dims[ci][1] + col
                        blk = np.zeros((8, 8), dtype=np.int64)
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz
                        coeff[ci][idx] = blk * qt
            n_in_interval += 1

    # batched IDCT per component, then place, upsample, color-convert
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        bd, ba = comp_dims[ci]
        spatial = (
            np.einsum("ji,njk,kl->nil", _DCT, coeff[ci], _DCT) + 128.0
        )
        plane = (
            spatial.reshape(bd, ba, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bd * 8, ba * 8)
        )
        # nearest upsample to full resolution, crop to (h, w)
        plane = np.repeat(
            np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
        )[:h, :w]
        planes.append(plane)

    if nc == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()
