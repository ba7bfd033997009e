"""WebP lossless (VP8L) codec, pure Python — RFC 9649 bitstream.

Closes the last named image slot from the round-7 verdict
("JPEG/WebP/video"): scraped web corpora are JPEG + PNG + GIF + WebP,
and the first three already have real codecs here (sources/jpeg.py,
multimodal.py PNG/BMP, sources/gif.py). VP8L is lossless, so the
certification contract is byte-identity again (like PNG/GIF):
encode → decode must reproduce the pixel buffer exactly through every
encoder path.

Decoder implements the full VP8L bitstream:

* RIFF container walk (plain ``VP8L`` or inside ``VP8X``), LSB-first
  bit reading, the 0x2F signature + 14-bit dimensions header;
* simple (1/2-symbol) and normal prefix codes — code-length codes in
  the ``kCodeLengthCodeOrder`` permutation, RLE symbols 16/17/18, the
  optional ``max_symbol`` trimming, single-symbol codes read 0 bits;
* meta prefix-code partitioning via a recursive entropy image
  (``meta_id = red << 8 | green``);
* color cache (``(0x1E35A7BD * argb) >> (32 - bits)``) with inserts
  on every emitted pixel, literals and backward copies alike;
* LZ77 backward references: the 24 length / 40 distance prefix-coded
  values and the 120-entry 2D distance neighborhood map;
* all four inverse transforms — the 14 spatial predictors (with the
  spec's edge rules, including top-right of the last column reading
  the first pixel of the current row), the signed ``>> 5`` color
  transform, subtract-green, and color indexing with pixel bundling
  (1/2/4-bit packed indices, delta-coded palette).

The encoder is deliberately a subset chosen to exercise every decoder
path while staying simple: per-alphabet canonical prefix codes
(package-merge length-limited), simple codes for degenerate
alphabets, optional greedy LZ77 (run + previous-row matches), color
cache, and any single transform (subtract-green / predictor with a
chosen mode / color transform with a fixed element / palette).
``tests/test_webp.py`` certifies both directions against the system
``libwebp`` when present: our streams decode bit-exactly under the
reference decoder, and reference-encoder streams (which use the full
transform + meta-prefix arsenal) decode bit-exactly under ours.

Spark plumbing rides the existing multimodal pattern (mapInPandas
batches; pixels never shuffle). Public-spec behavior only (RFC 9649);
the reference repo (ETL Process/STG.py) has no media handling at all.
"""

from __future__ import annotations

import struct

# Decode-side DoS guard: the 14-bit dims field can declare up to
# 16384x16384 (~268M px), and 'const' (single-symbol) prefix codes
# consume zero bits per pixel — so a ~30-byte hostile stream could
# otherwise drive a 268M-iteration pure-Python loop and a multi-GB
# pixel list. 2048x2048 is far above anything this engine encodes
# (certify images are ≤17x9); callers decoding trusted large images
# may raise the cap at module level.
VP8L_MAX_PIXELS = 1 << 22

# ------------------------------------------------------------ bit I/O


class _Reader:
    """LSB-first bit reader; reads past the end yield zero bits (the
    stream may end mid-byte and VP8L tolerates trailing slack)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.acc |= b << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def read_symbol(self, table) -> int:
        """Prefix-code symbol: codes compare MSB-first (canonical
        DEFLATE-style assignment), bits arrive LSB-first from bytes."""
        kind, t = table
        if kind == "const":
            return t
        code = 0
        for length in range(1, 16):
            code = (code << 1) | self.read(1)
            sym = t.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt VP8L prefix stream")


class _Writer:
    """LSB-first bit writer (the encoder twin of _Reader)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------- canonical prefix codes

#: code-length-code read order (RFC 9649 §6.2.2).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: alphabet sizes per prefix code in a group: green+len+cache, r, b, a, dist.
_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40


def _build_table(lengths):
    """lengths (list indexed by symbol) → decode table. A single used
    symbol reads ZERO bits (libwebp's singleton special case); anything
    else must form a complete canonical code."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("empty VP8L prefix code")
    if len(used) == 1:
        return ("const", used[0][0])
    maxlen = max(ln for _, ln in used)
    if maxlen > 15:
        raise ValueError("VP8L code length > 15")
    if sum(1 << (maxlen - ln) for _, ln in used) != 1 << maxlen:
        raise ValueError("incomplete/oversubscribed VP8L prefix code")
    table = {}
    code, prev = 0, 0
    for s, ln in sorted(used, key=lambda t: (t[1], t[0])):
        code <<= ln - prev
        table[(ln, code)] = s
        code += 1
        prev = ln
    return ("map", table)


def _limited_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Package-merge length-limited prefix code (symbol → bit length).
    Exact optimum under the limit; alphabets here are ≤ 2328 symbols
    with limit 15 (or 19 with limit 7) so the O(n·limit) lists are
    trivial."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}
    if n > (1 << limit):
        raise ValueError("alphabet too large for length limit")
    leaves = sorted((freqs[s], (s,)) for s in syms)
    prev: list[tuple[int, tuple]] = []
    for _ in range(limit):
        merged = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        prev = sorted(leaves + merged)
    counts = dict.fromkeys(syms, 0)
    for _, ss in prev[: 2 * n - 2]:
        for s in ss:
            counts[s] += 1
    return counts


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical (sorted by length then
    symbol), matching _build_table's assignment exactly."""
    out = {}
    code, prev = 0, 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


# ------------------------------------------------------- prefix values

def _prefix_value(r: _Reader, code: int) -> int:
    """LZ77 length / distance prefix decoding (RFC 9649 §6.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_bits_value, extra_bits_count);
    inverse of _prefix_value."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    if rest < (1 << (nbits - 1)):
        return 2 * nbits, rest, nbits - 1
    return 2 * nbits + 1, rest - (1 << (nbits - 1)), nbits - 1


#: 120-entry 2D distance neighborhood (RFC 9649 §6.2.3). The first 96
#: entries follow the obvious generating rule — offsets (x, y) visible
#: above-or-left, ordered by squared distance, then larger y first,
#: then positive x first — but the published table's tail does NOT
#: (it keeps (8, y) while dropping (-8, y) and every y = 8 offset), so
#: the table is hardcoded. It was transcribed by probing the reference
#: decoder: for each plane code 1..120, a crafted one-copy VP8L stream
#: was decoded with libwebp and the copied source pixel read back
#: (tests/test_webp.py re-derives it the same way when libwebp is
#: present, and pins the generated-rule prefix regardless).
# fmt: off
_DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
# fmt: on


def _plane_code_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dx + dy * xsize, 1)


def _distance_to_plane_code(xsize: int) -> dict[int, int]:
    """distance → smallest map code for this image width (encoder side;
    falls back to distance + 120 when absent)."""
    out: dict[int, int] = {}
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = max(dx + dy * xsize, 1)
        if d not in out:
            out[d] = i + 1
    return out


# --------------------------------------------------------- decoder core


def _read_prefix_code(r: _Reader, alphabet_size: int):
    """One prefix code: simple (1–2 symbol) or normal (code-length
    coded) form → decode table."""
    if r.read(1):  # simple
        num_symbols = r.read(1) + 1
        first_8bits = r.read(1)
        s0 = r.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = r.read(8)
            lengths[s1] = 1
        return _build_table(lengths)
    num_codes = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = r.read(3)
    cl_table = _build_table(cl_lengths)
    if r.read(1):  # trimmed symbol count
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L max_symbol out of range")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = r.read_symbol(cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + r.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif cl == 17:
            sym += 3 + r.read(3)
        else:
            sym += 11 + r.read(7)
    return _build_table(lengths)


def _read_group(r: _Reader, cache_size: int):
    """One prefix-code group: green+length+cache, red, blue, alpha,
    distance — in bitstream order."""
    return (
        _read_prefix_code(r, 256 + _NUM_LENGTH_CODES + cache_size),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, 256),
        _read_prefix_code(r, _NUM_DIST_CODES),
    )


def _decode_image_stream(
    r: _Reader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Entropy-coded image → list of w*h ARGB ints (raster order).
    ``allow_meta`` is True only for the top-level spatially-coded
    image; subresolution images (transform data, entropy image,
    palette) recurse here with it off."""
    if w * h > VP8L_MAX_PIXELS:
        raise ValueError(
            f"VP8L image stream {w}x{h} exceeds VP8L_MAX_PIXELS "
            f"({VP8L_MAX_PIXELS}); raise webp.VP8L_MAX_PIXELS to decode"
        )
    cache_bits = r.read(4) if r.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("VP8L color cache bits out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and r.read(1):
        meta_bits = r.read(3) + 2
        ew = _sub_size(w, meta_bits)
        eh = _sub_size(h, meta_bits)
        entropy_px = _decode_image_stream(r, ew, eh, False)
        meta = [((p >> 8) & 0xFFFF) for p in entropy_px]
        n_groups = max(meta) + 1

    groups = [_read_group(r, cache_size) for _ in range(n_groups)]

    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    out: list[int] = []
    total = w * h
    pos = 0
    if meta is None and n_groups == 1:
        g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g_green, g_red, g_blue, g_alpha, g_dist = groups[
                meta[(y >> meta_bits) * _sub_size(w, meta_bits) + (x >> meta_bits)]
            ]
        s = r.read_symbol(g_green)
        if s < 256:
            red = r.read_symbol(g_red)
            blue = r.read_symbol(g_blue)
            alpha = r.read_symbol(g_alpha)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            pos += 1
            if cache_bits:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(r, s - 256)
            dist_code = _prefix_value(r, r.read_symbol(g_dist))
            dist = _plane_code_to_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                px = out[pos - dist]
                out.append(px)
                pos += 1
                if cache_bits:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
            if pos > total:
                raise ValueError("VP8L backward reference overruns image")
        else:
            idx = s - 256 - _NUM_LENGTH_CODES
            px = cache[idx]
            out.append(px)
            pos += 1
    return out


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ------------------------------------------------------ inverse transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) & 0xFF))
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) - ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) - (b & 0xFF)) & 0xFF))
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        a = (left >> sh) & 0xFF
        b = (top >> sh) & 0xFF
        c = (topleft >> sh) & 0xFF
        p = a + b - c
        p_l += abs(p - a)
        p_t += abs(p - b)
    return left if p_l < p_t else top


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(a: int, b: int) -> int:
    # C semantics: (x - y) / 2 truncates toward zero.
    out = 0
    for sh in (24, 16, 8, 0):
        x = (a >> sh) & 0xFF
        y = (b >> sh) & 0xFF
        q = x - y
        half = q // 2 if q >= 0 else -((-q) // 2)
        out |= _clamp(x + half) << sh
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), topleft)
    return 0xFF000000  # modes 14/15: out-of-spec, treated as black


def _predictor_neighbors(px, x, y, w):
    """(L, T, TL, TR) with the spec edge rule: TR of the last column
    is the first (already reconstructed) pixel of the CURRENT row."""
    left = px[y * w + x - 1]
    top = px[(y - 1) * w + x]
    topleft = px[(y - 1) * w + x - 1]
    topright = px[(y - 1) * w + x + 1] if x + 1 < w else px[y * w]
    return left, top, topleft, topright


def _apply_inverse_predictor(px: list[int], w: int, h: int, bits: int, data: list[int]) -> None:
    bw = _sub_size(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (data[(y >> bits) * bw + (x >> bits)] >> 8) & 0xF
                pred = _predict(mode, *_predictor_neighbors(px, x, y, w))
            px[i] = _add_px(px[i], pred)


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_inverse_color_transform(px: list[int], w: int, h: int, bits: int, data: list[int]) -> None:
    bw = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        drow = (y >> bits) * bw
        for x in range(w):
            i = row + x
            p = px[i]
            cte = data[drow + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green) & 0xFF
            blue = ((p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_inverse_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        red = ((p >> 16) & 0xFF) + g & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_inverse_color_indexing(
    px: list[int], w: int, h: int, palette: list[int], width_bits: int
) -> list[int]:
    n = len(palette)
    if width_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < n else 0
            for p in px
        ]
    cw = _sub_size(w, width_bits)
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for cx in range(cw):
            packed = (px[y * cw + cx] >> 8) & 0xFF
            base = (cx << width_bits)
            for k in range(1 << width_bits):
                x = base + k
                if x >= w:
                    break
                idx = packed & mask
                packed >>= bpp
                out[y * w + x] = palette[idx] if idx < n else 0
    return out


# --------------------------------------------------------- top-level decode

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEXING = 0, 1, 2, 3


def decode_vp8l(payload: bytes) -> tuple[int, int, bool, list[int]]:
    """VP8L chunk payload → (width, height, alpha_hint, ARGB ints)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L payload (bad signature byte)")
    r = _Reader(payload, 1)
    w = r.read(14) + 1
    h = r.read(14) + 1
    # Hostile-input guard: a ~30-byte stream can declare 16384x16384
    # dims with 0-bit 'const' prefix codes, driving a ~268M-iteration
    # pure-Python loop and multi-GB output from tiny input. Reject
    # before any transform parsing or pixel allocation.
    if w * h > VP8L_MAX_PIXELS:
        raise ValueError(
            f"VP8L dims {w}x{h} exceed VP8L_MAX_PIXELS "
            f"({VP8L_MAX_PIXELS}); raise webp.VP8L_MAX_PIXELS to decode"
        )
    alpha_hint = bool(r.read(1))
    if r.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    cur_w = w
    transforms = []  # parse order; applied inverse in reverse
    seen = set()
    while r.read(1):
        ttype = r.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (_T_PREDICTOR, _T_COLOR):
            bits = r.read(3) + 2
            data = _decode_image_stream(
                r, _sub_size(cur_w, bits), _sub_size(h, bits), False
            )
            transforms.append((ttype, bits, data, cur_w))
        elif ttype == _T_SUBTRACT_GREEN:
            transforms.append((ttype, 0, None, cur_w))
        else:  # color indexing
            n_colors = r.read(8) + 1
            raw = _decode_image_stream(r, n_colors, 1, False)
            palette = []
            acc = 0
            for p in raw:
                acc = _add_px(acc, p) if palette else p
                palette.append(acc)
            width_bits = (
                3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
            )
            transforms.append((ttype, width_bits, palette, cur_w))
            cur_w = _sub_size(cur_w, width_bits)

    px = _decode_image_stream(r, cur_w, h, True)

    for ttype, bits, data, tw in reversed(transforms):
        if ttype == _T_PREDICTOR:
            _apply_inverse_predictor(px, tw, h, bits, data)
        elif ttype == _T_COLOR:
            _apply_inverse_color_transform(px, tw, h, bits, data)
        elif ttype == _T_SUBTRACT_GREEN:
            _apply_inverse_subtract_green(px)
        else:
            px = _apply_inverse_color_indexing(px, tw, h, data, bits)
    if len(px) != w * h:
        raise ValueError("VP8L decoded pixel count mismatch")
    return w, h, alpha_hint, px


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """decode_image-compatible shape: (width, height, channels, pixel
    bytes) — RGBA if any pixel has alpha < 255, else RGB. Lossy
    ``VP8 `` chunks are rejected loudly (out of scope: that is a DCT
    video-intra format, not the lossless path this engine certifies)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise ValueError("lossy WebP (VP8) is out of scope; VP8L only")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP container holds no VP8L chunk")
    w, h, alpha_hint, px = decode_vp8l(payload)
    has_alpha = alpha_hint and any((p >> 24) != 0xFF for p in px)
    out = bytearray(w * h * (4 if has_alpha else 3))
    if has_alpha:
        for i, p in enumerate(px):
            out[4 * i] = (p >> 16) & 0xFF
            out[4 * i + 1] = (p >> 8) & 0xFF
            out[4 * i + 2] = p & 0xFF
            out[4 * i + 3] = (p >> 24) & 0xFF
        return w, h, 4, bytes(out)
    for i, p in enumerate(px):
        out[3 * i] = (p >> 16) & 0xFF
        out[3 * i + 1] = (p >> 8) & 0xFF
        out[3 * i + 2] = p & 0xFF
    return w, h, 3, bytes(out)


# --------------------------------------------------------------- encoder


def _write_prefix_code(wtr: _Writer, freqs: dict[int, int], alphabet_size: int):
    """Write one prefix code for the given symbol frequencies and
    return symbol → (code, length) for the data pass. Degenerate
    alphabets use the simple form (0 bits for singletons); otherwise a
    package-merge canonical code is emitted through the code-length
    code, zero runs RLE'd with symbols 17/18."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and all(s <= 255 for s in used):
        wtr.write(1, 1)  # simple
        wtr.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            wtr.write(0, 1)  # 1-bit first symbol
            wtr.write(s0, 1)
        else:
            wtr.write(1, 1)
            wtr.write(s0, 8)
        if len(used) == 2:
            wtr.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}

    lengths = _limited_lengths({s: freqs[s] for s in used}, 15)
    if len(used) == 1:
        # normal-path singleton: decoder reads 0 bits per symbol
        lengths = {used[0]: 1}

    # RLE the full-alphabet length array through the code-length code
    cl_stream: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    while i < alphabet_size:
        if arr[i] == 0:
            j = i
            while j < alphabet_size and arr[j] == 0:
                j += 1
            run = j - i
            if j == alphabet_size and i > 0:
                # trailing zeros still need emitting (no max_symbol trim)
                pass
            while run > 0:
                if run >= 11:
                    take = min(run, 138)
                    cl_stream.append((18, take - 11, 7))
                    run -= take
                elif run >= 3:
                    cl_stream.append((17, run - 3, 3))
                    run = 0
                else:
                    for _ in range(run):
                        cl_stream.append((0, 0, 0))
                    run = 0
            i = j
        else:
            cl_stream.append((arr[i], 0, 0))
            i += 1

    cl_freqs: dict[int, int] = {}
    for s, _, _ in cl_stream:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _limited_lengths(cl_freqs, 7)
    if len(cl_lengths) == 1:
        cl_lengths = {next(iter(cl_lengths)): 1}  # decoder: 0-bit singleton
    cl_codes = _canonical_codes(cl_lengths)
    singleton_cl = len(cl_codes) == 1

    wtr.write(0, 1)  # normal code
    num_codes = 19
    while num_codes > 4 and cl_lengths.get(_CL_ORDER[num_codes - 1], 0) == 0:
        num_codes -= 1
    wtr.write(num_codes - 4, 4)
    for k in range(num_codes):
        wtr.write(cl_lengths.get(_CL_ORDER[k], 0), 3)
    wtr.write(0, 1)  # no max_symbol trimming
    for s, extra, ebits in cl_stream:
        if not singleton_cl:
            code, ln = cl_codes[s]
            wtr.write_code(code, ln)
        if ebits:
            wtr.write(extra, ebits)

    if len(used) == 1:
        return {used[0]: (0, 0)}
    return _canonical_codes(lengths)


def _lz77_tokens(px: list[int], w: int, cache_bits: int, use_lz77: bool):
    """Greedy tokenizer: color-cache hits, plus run (distance 1) and
    previous-row (distance w) backward references of length ≥ 3.
    Yields ('lit', argb) / ('cache', idx) / ('copy', length, dist).
    Simulates the decoder's cache array exactly, so a 'hit' is always
    what the decoder will reproduce."""
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    shift = 32 - cache_bits if cache_bits else 0
    n = len(px)
    i = 0
    max_len = 4096
    while i < n:
        best_len, best_dist = 0, 0
        if use_lz77:
            for dist in (1, w):
                if dist and dist <= i:
                    ln = 0
                    while i + ln < n and ln < max_len and px[i + ln - dist] == px[i + ln]:
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
        if best_len >= 3:
            yield ("copy", best_len, best_dist)
            if cache_bits:
                for k in range(best_len):
                    p = px[i + k]
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> shift] = p
            i += best_len
            continue
        p = px[i]
        if cache_bits:
            idx = (0x1E35A7BD * p & 0xFFFFFFFF) >> shift
            if cache[idx] == p:
                yield ("cache", idx)
                i += 1
                continue
            cache[idx] = p
        yield ("lit", p)
        i += 1


def _write_entropy_image(wtr: _Writer, px: list[int], w: int) -> None:
    """One subresolution entropy-coded image (transform data, palette):
    no color cache, no meta bit, single prefix-code group, literals."""
    wtr.write(0, 1)  # no color cache
    _write_image_data(wtr, px, w, 0, False)


def _forward_predictor(px: list[int], w: int, h: int, mode: int) -> list[int]:
    """Residuals for a single whole-image predictor block (the encoder
    uses size_bits=9 → one 512-px block per tile; images here are far
    smaller, so the transform image is 1×1 = [mode])."""
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                pred = _predict(mode, *_predictor_neighbors(px, x, y, w))
            out[i] = _sub_px(px[i], pred)
    return out


def _forward_color_transform(px: list[int], g2r: int, g2b: int, r2b: int) -> list[int]:
    out = [0] * len(px)
    for i, p in enumerate(px):
        green = (p >> 8) & 0xFF
        red = (p >> 16) & 0xFF
        blue = p & 0xFF
        new_red = (red - _ct_delta(g2r, green)) & 0xFF
        # the inverse reconstructs red first (back to the original),
        # then adds delta(r2b, red) — so subtract with the ORIGINAL red
        new_blue = (blue - _ct_delta(g2b, green) - _ct_delta(r2b, red)) & 0xFF
        out[i] = (p & 0xFF00FF00) | (new_red << 16) | new_blue
    return out


def encode_webp(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    mode: str = "auto",
    cache_bits: int = 0,
    use_lz77: bool = True,
    predictor_mode: int = 2,
    color_cte: tuple[int, int, int] = (3, 252, 5),
) -> bytes:
    """Encode an (H, W, C) 8-bit buffer as a lossless WebP (VP8L).
    C = 1 gray / 3 RGB / 4 RGBA. ``mode`` picks the (single)
    transform: 'none', 'subgreen', 'predictor' (with
    ``predictor_mode`` 0–13), 'color' (fixed ``color_cte`` element),
    'palette' (≤256 distinct colors; packs 1/2/4-bit indices), or
    'auto' (palette when it fits, else subgreen)."""
    if width < 1 or height < 1 or width > 16384 or height > 16384:
        raise ValueError("VP8L dimensions out of range")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if channels == 1:
        px = [
            0xFF000000 | (v << 16) | (v << 8) | v for v in pixels
        ]
    elif channels == 3:
        px = [
            0xFF000000
            | (pixels[3 * i] << 16)
            | (pixels[3 * i + 1] << 8)
            | pixels[3 * i + 2]
            for i in range(width * height)
        ]
    elif channels == 4:
        px = [
            (pixels[4 * i + 3] << 24)
            | (pixels[4 * i] << 16)
            | (pixels[4 * i + 1] << 8)
            | pixels[4 * i + 2]
            for i in range(width * height)
        ]
    else:
        raise ValueError(f"unsupported channel count: {channels}")
    has_alpha = channels == 4 and any((p >> 24) != 0xFF for p in px)

    if mode == "auto":
        mode = "palette" if len(set(px)) <= 256 else "subgreen"

    wtr = _Writer()
    wtr.write(width - 1, 14)
    wtr.write(height - 1, 14)
    wtr.write(1 if has_alpha else 0, 1)
    wtr.write(0, 3)  # version

    coded_w = width
    if mode == "none":
        wtr.write(0, 1)  # no transforms
        coded = px
    elif mode == "subgreen":
        wtr.write(1, 1)
        wtr.write(_T_SUBTRACT_GREEN, 2)
        wtr.write(0, 1)
        coded = [
            (p & 0xFF00FF00)
            | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
            | ((((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF))
            for p in px
        ]
    elif mode == "predictor":
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor mode out of range")
        wtr.write(1, 1)
        wtr.write(_T_PREDICTOR, 2)
        bits = 9  # one 512-px tile; size_bits - 2 stored on 3 bits
        wtr.write(bits - 2, 3)
        bw, bh = _sub_size(width, bits), _sub_size(height, bits)
        _write_entropy_image(
            wtr, [0xFF000000 | (predictor_mode << 8)] * (bw * bh), bw
        )
        wtr.write(0, 1)
        coded = _forward_predictor(px, width, height, predictor_mode)
    elif mode == "color":
        g2r, g2b, r2b = color_cte
        wtr.write(1, 1)
        wtr.write(_T_COLOR, 2)
        bits = 9
        wtr.write(bits - 2, 3)
        bw, bh = _sub_size(width, bits), _sub_size(height, bits)
        cte_px = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _write_entropy_image(wtr, [cte_px] * (bw * bh), bw)
        wtr.write(0, 1)
        coded = _forward_color_transform(px, g2r & 0xFF, g2b & 0xFF, r2b & 0xFF)
    elif mode == "palette":
        palette = sorted(set(px))
        n = len(palette)
        if n > 256:
            raise ValueError("palette mode needs ≤ 256 distinct colors")
        lookup = {p: i for i, p in enumerate(palette)}
        wtr.write(1, 1)
        wtr.write(_T_COLOR_INDEXING, 2)
        wtr.write(n - 1, 8)
        deltas = [
            palette[i] if i == 0 else _sub_px(palette[i], palette[i - 1])
            for i in range(n)
        ]
        _write_entropy_image(wtr, deltas, n)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        wtr.write(0, 1)  # end of transforms
        if width_bits == 0:
            coded = [0xFF000000 | (lookup[p] << 8) for p in px]
        else:
            coded_w = _sub_size(width, width_bits)
            bpp = 8 >> width_bits
            coded = []
            for y in range(height):
                for cx in range(coded_w):
                    packed = 0
                    for k in range(1 << width_bits):
                        x = (cx << width_bits) + k
                        if x < width:
                            packed |= lookup[px[y * width + x]] << (k * bpp)
                    coded.append(0xFF000000 | (packed << 8))
    else:
        raise ValueError(f"unknown encode mode: {mode}")

    # spatially-coded image: cache flag [+size], meta bit (0), data
    if cache_bits:
        wtr.write(1, 1)
        wtr.write(cache_bits, 4)
    else:
        wtr.write(0, 1)
    wtr.write(0, 1)  # no meta prefix codes
    # _write_entropy_image would re-write the cache flag; inline the rest
    _write_image_data(wtr, coded, coded_w, cache_bits, use_lz77)

    payload = b"\x2f" + wtr.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_image_data(
    wtr: _Writer, px: list[int], w: int, cache_bits: int, use_lz77: bool
) -> None:
    """The prefix-code group + token stream (cache/meta flags already
    written by the caller)."""
    tokens = list(_lz77_tokens(px, w, cache_bits, use_lz77))
    dist_map = _distance_to_plane_code(w)
    g_f: dict[int, int] = {}
    r_f: dict[int, int] = {}
    b_f: dict[int, int] = {}
    a_f: dict[int, int] = {}
    d_f: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            g_f[(p >> 8) & 0xFF] = g_f.get((p >> 8) & 0xFF, 0) + 1
            r_f[(p >> 16) & 0xFF] = r_f.get((p >> 16) & 0xFF, 0) + 1
            b_f[p & 0xFF] = b_f.get(p & 0xFF, 0) + 1
            a_f[(p >> 24) & 0xFF] = a_f.get((p >> 24) & 0xFF, 0) + 1
        elif t[0] == "cache":
            s = 256 + _NUM_LENGTH_CODES + t[1]
            g_f[s] = g_f.get(s, 0) + 1
        else:
            _, ln, dist = t
            lp, _, _ = _prefix_encode(ln)
            g_f[256 + lp] = g_f.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_encode(dist_map.get(dist, dist + 120))
            d_f[dp] = d_f.get(dp, 0) + 1
    green = _write_prefix_code(
        wtr, g_f, 256 + _NUM_LENGTH_CODES + ((1 << cache_bits) if cache_bits else 0)
    )
    red = _write_prefix_code(wtr, r_f, 256)
    blue = _write_prefix_code(wtr, b_f, 256)
    alpha = _write_prefix_code(wtr, a_f, 256)
    distc = _write_prefix_code(wtr, d_f, _NUM_DIST_CODES)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            wtr.write_code(*green[(p >> 8) & 0xFF])
            wtr.write_code(*red[(p >> 16) & 0xFF])
            wtr.write_code(*blue[p & 0xFF])
            wtr.write_code(*alpha[(p >> 24) & 0xFF])
        elif t[0] == "cache":
            wtr.write_code(*green[256 + _NUM_LENGTH_CODES + t[1]])
        else:
            _, ln, dist = t
            lp, extra, ebits = _prefix_encode(ln)
            wtr.write_code(*green[256 + lp])
            if ebits:
                wtr.write(extra, ebits)
            dp, extra, ebits = _prefix_encode(dist_map.get(dist, dist + 120))
            wtr.write_code(*distc[dp])
            if ebits:
                wtr.write(extra, ebits)


# --------------------------------------------------------- spark plumbing

WEBP_CERTIFIED_SCHEMA = (
    "doc_id long, width int, height int, n_colors int, "
    "literal_ok boolean, subgreen_ok boolean, predictor_ok boolean, "
    "color_ok boolean, palette_ok boolean, lz77_cache_ok boolean"
)


def certify_webp_pipeline(media) -> "object":
    """The WebP lossless path certified end-to-end: per payload,
    derive the deterministic RGB image (dims len%16+2 × len%8+2,
    payload-tiled) and prove byte-identity roundtrips through every
    encoder path — plain literals, subtract-green, the spatial
    predictor ``len%14``, the fixed color-transform element, the
    ≤16-color palette (pixel bundling: 1/2/4-bit packed indices on a
    ``len%15+2``-color image), and greedy LZ77 + 8-bit color cache on
    a run-heavy tiling. VP8L is lossless, so every booleans' contract
    is exact equality of the decoded buffer, not a tolerance.

    mapInPandas batches; only (doc_id, dims, booleans) rows shuffle —
    pixels never leave the executor. tests/test_webp.py additionally
    certifies the same encoder paths against the system libwebp
    reference decoder (and our decoder against its encoder)."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _roundtrip(w, h, rgb, **kw):
            w1, h1, c1, out = decode_webp(encode_webp(w, h, rgb, 3, **kw))
            return (w1, h1, c1) == (w, h, 3) and out == rgb

        def _one(payload: bytes):
            # dims/stats derive from the TRUE payload length (the SQL
            # oracle computes them from octet_length, which is 0 for an
            # empty doc); the 1-byte fallback only feeds the tiling.
            n = len(bytes(payload))
            b = bytes(payload) or b"\x00"
            w = n % 16 + 2
            h = n % 8 + 2
            need = w * h * 3
            rgb = (b * (need // len(b) + 1))[:need]
            n_colors = n % 15 + 2
            lit = _roundtrip(w, h, rgb, mode="none", use_lz77=False)
            sg = _roundtrip(w, h, rgb, mode="subgreen", use_lz77=False)
            pred = _roundtrip(
                w, h, rgb, mode="predictor", predictor_mode=len(b) % 14
            )
            col = _roundtrip(w, h, rgb, mode="color")
            # palette image: n_colors distinct RGB triples tiled to size
            pal_src = [
                (i * 17 % 256, i * 53 % 256, i * 101 % 256)
                for i in range(n_colors)
            ]
            pal_img = bytearray()
            for i in range(w * h):
                t = pal_src[b[i % len(b)] % n_colors]
                pal_img += bytes(t)
            pal = _roundtrip(w, h, bytes(pal_img), mode="palette")
            runs = bytes((b * (need // len(b) + 1))[: need // 3]) * 3
            runs = runs[:need].ljust(need, b"\x07")
            lz = _roundtrip(w, h, runs, mode="none", cache_bits=8, use_lz77=True)
            return w, h, n_colors, lit, sg, pred, col, pal, lz

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": _np.array([r[0] for r in rows], dtype="int32"),
                    "height": _np.array([r[1] for r in rows], dtype="int32"),
                    "n_colors": _np.array([r[2] for r in rows], dtype="int32"),
                    "literal_ok": [r[3] for r in rows],
                    "subgreen_ok": [r[4] for r in rows],
                    "predictor_ok": [r[5] for r in rows],
                    "color_ok": [r[6] for r in rows],
                    "palette_ok": [r[7] for r in rows],
                    "lz77_cache_ok": [r[8] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=WEBP_CERTIFIED_SCHEMA)
