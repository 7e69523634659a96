"""WebP lossless (VP8L) codec — pure Python/numpy, from the public
"WebP Lossless Bitstream Specification" (Google, RFC-style spec that
ships with libwebp).

Round-5 addition closing the most common remaining web image format
(VERDICT r4 next-round item 5). Decoder is spec-complete for still
images: RIFF/VP8X container walk, simple + normal (code-length-coded)
prefix codes, meta-prefix entropy images, color cache, LZ77 backward
references with the 120-entry 2D distance neighborhood, and all four
transforms (predictor, color, subtract-green, color-indexing incl.
sub-byte index bundling). Lossy VP8 stays an explicit
NotImplementedError plug point (``multimodal.py`` policy boundary).

The encoder is deliberately simple — literal + distance-1 run LZ77,
balanced complete prefix codes, optional subtract-green — enough for
round-trip tests and media-pipeline re-encoding; it never emits the
exotic reader paths (those are covered by the spec-constructed
conformance vectors in ``tools/build_conformance_fixture.py``, whose
expectations are stamped independently of this module).

Reference parity note: the reference repo (a C# JSON extractor) has no
image surface; this exists for the LLM-pipeline multimodal tier
(SURVEY.md §2.4).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Bit I/O — VP8L packs bits LSB-first within bytes.
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0          # bit position
        self._n = len(data) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._n:
            raise ValueError("truncated VP8L bitstream")
        out = 0
        for i in range(nbits):
            p = self._pos + i
            out |= ((self._d[p >> 3] >> (p & 7)) & 1) << i
        self._pos += nbits
        return out

    def read_code(self, table: Dict[Tuple[int, int], int]) -> int:
        """Walk a canonical prefix code bit-by-bit (first bit = MSB of
        the code, deflate-style)."""
        code = 0
        for length in range(1, 16):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


class _BitWriter:
    def __init__(self) -> None:
        self._bits: List[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self._bits.append((value >> i) & 1)

    def write_code(self, length: int, code: int) -> None:
        """Emit a canonical prefix code MSB-first."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# Canonical prefix codes (deflate-style: by length, then symbol order)
# ---------------------------------------------------------------------------


def _canonical_table(lengths: List[int]) -> Dict[Tuple[int, int], int]:
    """code lengths -> {(length, code): symbol} decode table."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    for ln in range(1, 16):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                table[(ln, code)] = sym
                code += 1
        code <<= 1
    return table


def _canonical_codes(lengths: List[int]) -> Dict[int, Tuple[int, int]]:
    """code lengths -> {symbol: (length, code)} encode table."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    for ln in range(1, 16):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                codes[sym] = (ln, code)
                code += 1
        code <<= 1
    return codes


#: order in which code-length-code lengths are stored (spec §5.2.2).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]


class _PrefixCode:
    """A decoded prefix code: either a 0-bit trivial code (one symbol)
    or a canonical table."""

    def __init__(self, lengths: List[int] | None,
                 trivial: int | None = None) -> None:
        self.trivial = trivial
        self.table = _canonical_table(lengths) if lengths else {}

    def read(self, br: _BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        return br.read_code(self.table)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):                                    # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            if sym0 >= alphabet:
                raise ValueError("VP8L simple code symbol out of range")
            return _PrefixCode(None, trivial=sym0)
        sym1 = br.read(8)
        if sym0 >= alphabet or sym1 >= alphabet or sym0 == sym1:
            raise ValueError("VP8L simple code symbols invalid")
        lengths = [0] * alphabet
        lengths[sym0] = lengths[sym1] = 1
        return _PrefixCode(lengths)
    # Normal code: code lengths themselves prefix-coded.
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _canonical_table(cl_lengths)
    if br.read(1):                                    # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    while symbol < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = br.read_code(cl_table)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    if sum(1 for x in lengths if x) == 0:
        raise ValueError("VP8L normal code with no symbols")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers (spec §4.2.2)
# ---------------------------------------------------------------------------


def _prefix_decode(prefix: int, br: _BitReader) -> int:
    """Length/distance prefix symbol -> value (1-based)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> Tuple[int, int, int]:
    """value -> (prefix symbol, extra bits payload, extra bit count)."""
    if value <= 4:
        return value - 1, 0, 0
    t = value - 1
    extra = t.bit_length() - 2
    second_bit = (t >> extra) & 1
    offset = (2 + second_bit) << extra
    return 2 * extra + 2 + second_bit, t - offset, extra


#: 2D neighborhood for distance codes 1..120 (spec §4.2.2 table,
#: ordered by proximity); codes > 120 mean scanline distance code-120.
_DIST_MAP = [
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
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (8, 4), (3, 8), (-3, 8), (8, 5), (7, 6), (-7, 6),
    (6, 7), (-6, 7), (8, 6), (7, 7), (-7, 7), (8, 7),
]


def _plane_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Entropy-coded image (spec §5)
# ---------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_ALPHABETS = [256 + _NUM_LENGTH_CODES, 256, 256, 256, 40]


def _read_entropy_image(br: _BitReader, w: int, h: int,
                        is_argb: bool) -> np.ndarray:
    """Decode one spatially-coded image -> uint32 ARGB array (h, w).
    Transforms (main image only) are read and applied by the caller."""
    cache_bits = 0
    cache: List[int] = []
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_argb and br.read(1):                        # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _read_entropy_image(br, mw, mh, False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)
        num_groups = int(meta.max()) + 1
    groups = []
    for _ in range(num_groups):
        codes = []
        for ci, alpha_size in enumerate(_ALPHABETS):
            size = alpha_size + (len(cache) if ci == 0 else 0)
            codes.append(_read_prefix_code(br, size))
        groups.append(codes)

    total = w * h
    pix = np.zeros(total, np.uint32)
    pos = 0
    cache_hash = 0x1E35A7BD

    def cache_insert(p: int) -> None:
        if cache_bits:
            cache[((cache_hash * p) & 0xFFFFFFFF) >> (32 - cache_bits)] = p

    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:                                   # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = p
            cache_insert(p)
            pos += 1
        elif s < 256 + _NUM_LENGTH_CODES:             # LZ77 backref
            length = _prefix_decode(s - 256, br)
            dist_code = _prefix_decode(g[4].read(br), br)
            dist = _plane_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                if pos >= total:
                    break
                p = int(pix[pos - dist])
                pix[pos] = p
                cache_insert(p)
                pos += 1
        else:                                         # color cache hit
            idx = s - 256 - _NUM_LENGTH_CODES
            if not cache_bits or idx >= len(cache):
                raise ValueError("VP8L cache index without cache")
            pix[pos] = cache[idx]
            pos += 1
    return pix.reshape(h, w)


# ---------------------------------------------------------------------------
# Transforms (spec §3) — applied inverse, in reverse read order
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _comp(p: int, shift: int) -> int:
    return (p >> shift) & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) \
        | (b & 0xFF)


def _avg2_px(a: int, b: int) -> int:
    return _pack(*(_avg2(_comp(a, s), _comp(b, s)) for s in (24, 16, 8, 0)))


def _select(left: int, top: int, top_left: int) -> int:
    """Predictor 11 (spec Select): pick the neighbor closer to the
    gradient estimate L + T - TL, ties to top (libwebp semantics)."""
    p_l = p_t = 0
    for s in (24, 16, 8, 0):
        pred = _comp(left, s) + _comp(top, s) - _comp(top_left, s)
        p_l += abs(pred - _comp(left, s))
        p_t += abs(pred - _comp(top, s))
    return left if p_l < p_t else top


def _clamp_add_full(left: int, top: int, top_left: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        v = _comp(left, s) + _comp(top, s) - _comp(top_left, s)
        out |= max(0, min(255, v)) << s
    return out


def _clamp_add_half(avg: int, top_left: int) -> int:
    out = 0
    for s in (24, 16, 8, 0):
        a = _comp(avg, s)
        v = a + (a - _comp(top_left, s)) // 2
        out |= max(0, min(255, v)) << s
    return out


def _apply_predictor_inverse(pix: np.ndarray, modes: np.ndarray,
                             bits: int) -> None:
    """In-place inverse predictor transform (spec §3.1). Python loop —
    images at this tier are thumbnails; a real corpus run pushes this
    into the Arrow batch like every other kernel."""
    h, w = pix.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pix[0, x - 1])             # left
            elif x == 0:
                pred = int(pix[y - 1, 0])             # top
            else:
                mode = int((modes[y >> bits, x >> bits] >> 8) & 0xFF)
                left = int(pix[y, x - 1])
                top = int(pix[y - 1, x])
                tl = int(pix[y - 1, x - 1])
                tr = int(pix[y - 1, x + 1]) if x + 1 < w \
                    else int(pix[y - 1, 0])  # spec: TR of last col wraps
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2_px(_avg2_px(left, tr), top)
                elif mode == 6:
                    pred = _avg2_px(left, tl)
                elif mode == 7:
                    pred = _avg2_px(left, top)
                elif mode == 8:
                    pred = _avg2_px(tl, top)
                elif mode == 9:
                    pred = _avg2_px(top, tr)
                elif mode == 10:
                    pred = _avg2_px(_avg2_px(left, tl), _avg2_px(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_half(_avg2_px(left, top), tl)
                else:
                    raise ValueError(f"bad VP8L predictor mode {mode}")
            p = int(pix[y, x])
            pix[y, x] = _pack(_comp(p, 24) + _comp(pred, 24),
                              _comp(p, 16) + _comp(pred, 16),
                              _comp(p, 8) + _comp(pred, 8),
                              _comp(p, 0) + _comp(pred, 0))


def _delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 multiply >> 5 (spec §3.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_color_inverse(pix: np.ndarray, cte: np.ndarray,
                         bits: int) -> None:
    """In-place inverse color transform: element channels hold
    (red_to_blue, green_to_blue, green_to_red) in (R, G, B)."""
    h, w = pix.shape
    for y in range(h):
        for x in range(w):
            e = int(cte[y >> bits, x >> bits])
            g2r, g2b, r2b = _comp(e, 0), _comp(e, 8), _comp(e, 16)
            p = int(pix[y, x])
            green = _comp(p, 8)
            red = (_comp(p, 16) + _delta(g2r, green)) & 0xFF
            blue = (_comp(p, 0) + _delta(g2b, green)
                    + _delta(r2b, red)) & 0xFF
            pix[y, x] = _pack(_comp(p, 24), red, green, blue)


def _apply_subtract_green_inverse(pix: np.ndarray) -> None:
    green = (pix >> 8) & 0xFF
    red = ((pix >> 16) + green) & 0xFF
    blue = (pix + green) & 0xFF
    pix[:] = (pix & 0xFF00FF00) | (red << 16) | blue


# ---------------------------------------------------------------------------
# Decoder entry
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> uint8 (h, w, 3) RGB, or (h, w, 4) RGBA
    when any pixel is non-opaque (matching the PNG/GIF output API)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream (missing 0x2F signature)")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                        # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    pix = _decode_vp8l_body(br, w, h)

    alpha = ((pix >> 24) & 0xFF).astype(np.uint8)
    rgb = np.dstack([((pix >> 16) & 0xFF).astype(np.uint8),
                     ((pix >> 8) & 0xFF).astype(np.uint8),
                     (pix & 0xFF).astype(np.uint8)])
    if (alpha != 255).any():
        return np.dstack([rgb, alpha])
    return rgb


def _decode_vp8l_body(br: "_BitReader", w: int, h: int) -> np.ndarray:
    """Post-header VP8L image stream: transform list + entropy-coded
    pixels + inverse transforms -> (h, w) uint32 ARGB matrix. Shared by
    :func:`decode_vp8l` and the HEADERLESS alpha stream (ALPH chunk
    compression method 1, where the frame supplies the dimensions)."""
    transforms = []                                   # (type, data...)
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:                  # predictor / color
            bits = br.read(3) + 2
            sw = -(-xsize // (1 << bits))
            sh = -(-h // (1 << bits))
            sub = _read_entropy_image(br, sw, sh, False)
            transforms.append((ttype, bits, sub))
        elif ttype == 2:                              # subtract green
            transforms.append((2,))
        else:                                         # color indexing
            pal_size = br.read(8) + 1
            pal_img = _read_entropy_image(br, pal_size, 1, False)
            palette = np.zeros(pal_size, np.uint32)
            prev = 0
            for i in range(pal_size):
                # Palette entries are component-wise delta-coded.
                cur = int(pal_img[0, i])
                prev = _pack(_comp(cur, 24) + _comp(prev, 24),
                             _comp(cur, 16) + _comp(prev, 16),
                             _comp(cur, 8) + _comp(prev, 8),
                             _comp(cur, 0) + _comp(prev, 0))
                palette[i] = prev
            if pal_size <= 2:
                width_bits = 3
            elif pal_size <= 4:
                width_bits = 2
            elif pal_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, palette, width_bits, xsize))
            xsize = -(-xsize // (1 << width_bits))

    pix = _read_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == 3:
            _, palette, width_bits, full_w = t
            if width_bits:
                per = 1 << width_bits
                ibits = 8 >> width_bits
                idx = np.zeros((h, pix.shape[1] * per), np.uint32)
                for k in range(per):
                    idx[:, k::per] = ((pix >> 8) >> (k * ibits)) \
                        & ((1 << ibits) - 1)
                idx = idx[:, :full_w]
            else:
                idx = (pix >> 8) & 0xFF
            if int(idx.max()) >= len(palette):
                raise ValueError("VP8L palette index out of range")
            pix = palette[idx.astype(np.int64)]
        elif t[0] == 2:
            _apply_subtract_green_inverse(pix)
        elif t[0] == 1:
            _apply_color_inverse(pix, t[2], t[1])
        else:
            _apply_predictor_inverse(pix, t[2], t[1])

    return pix


def decode_webp(blob: bytes) -> np.ndarray:
    """RIFF WebP container -> pixels. Walks chunks (VP8X extended files
    carry VP8L after metadata chunks); lossless VP8L decodes here,
    lossy VP8 dispatches to the from-scratch RFC 6386 keyframe decoder
    in :mod:`.vp8` (new in r6 — closes the r5 plug point)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    alpha = None           # ALPH precedes VP8 in extended (VP8X) files
    while pos + 8 <= len(blob):
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return decode_vp8l(payload)
        if fourcc == b"ALPH":
            alpha = payload
        if fourcc == b"VP8 ":
            from json_time_series_extractor_spark.operators.vp8 import (
                decode_vp8)
            rgb = decode_vp8(payload)
            if alpha is None:
                return rgb
            h, w = rgb.shape[:2]
            return np.dstack([rgb, _decode_alph(alpha, w, h)])
        pos += 8 + size + (size & 1)                  # chunks pad to even
    raise ValueError("WebP container has no VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# Encoder — literal + distance-1 runs, balanced complete prefix codes
# ---------------------------------------------------------------------------


def _balanced_lengths(used: List[int], alphabet: int) -> List[int]:
    """Complete canonical code over `used` symbols: with k symbols and
    L = ceil(log2 k), 2^L - k symbols get length L-1 and the rest L
    (Kraft sum exactly 1). k == 1 pads with a dummy so the code stays
    complete."""
    k = len(used)
    lengths = [0] * alphabet
    if k == 1:
        dummy = (used[0] + 1) % alphabet
        lengths[used[0]] = lengths[dummy] = 1
        return lengths
    level = max(1, (k - 1).bit_length())
    n_short = (1 << level) - k
    for i, sym in enumerate(sorted(used)):
        lengths[sym] = level - 1 if i < n_short else level
    return lengths


def _write_lengths(bw: _BitWriter, lengths: List[int]) -> None:
    """Emit a 'normal' prefix code: 3-bit code-length-code lengths in
    _CL_ORDER, then the symbol lengths with 17/18 zero runs."""
    used_cl = sorted({ln for ln in lengths if ln} | {0, 17, 18})
    cl_lengths = _balanced_lengths(used_cl, 19)
    num_cl = max(_CL_ORDER.index(s) for s in range(19)
                 if cl_lengths[s]) + 1
    bw.write(0, 1)                                    # not simple
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)                                    # no max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 0
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run:
                if run >= 11:
                    chunk = min(run, 138)
                    bw.write_code(*cl_codes[18])
                    bw.write(chunk - 11, 7)
                    run -= chunk
                elif run >= 3:
                    bw.write_code(*cl_codes[17])
                    bw.write(run - 3, 3)
                    run = 0
                else:
                    for _ in range(run):
                        bw.write_code(*cl_codes[0])
                    run = 0
        else:
            bw.write_code(*cl_codes[lengths[i]])
            i += 1


def _write_prefix_code(bw: _BitWriter, used: List[int],
                       alphabet: int) -> List[int]:
    """Write the cheapest representation; return the code lengths."""
    if len(used) <= 2 and max(used) <= 255:  # simple codes carry 8-bit syms
        bw.write(1, 1)                                # simple
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first < 2:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            lengths = [0] * alphabet
            lengths[used[0]] = lengths[used[1]] = 1
            return lengths
        lengths = [0] * alphabet
        lengths[first] = 0                            # trivial, 0 bits
        return lengths
    lengths = _balanced_lengths(used, alphabet)
    _write_lengths(bw, lengths)
    return lengths


def encode_vp8l(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA -> WebP
    (RIFF + VP8L). Literal coding with distance-1 run LZ77; exact
    lossless round-trip through :func:`decode_webp`."""
    arr = np.ascontiguousarray(pixels, np.uint8)
    if arr.ndim == 2:
        arr = np.dstack([arr, arr, arr])
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (h, w[, 3|4]) uint8 array")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dims must be 1..16384")
    if arr.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
    else:
        alpha = arr[:, :, 3]
    argb = ((alpha.astype(np.uint32) << 24)
            | (arr[:, :, 0].astype(np.uint32) << 16)
            | (arr[:, :, 1].astype(np.uint32) << 8)
            | arr[:, :, 2].astype(np.uint32)).reshape(-1)

    # Tokenize: literal then a distance-1 run for repeats.
    tokens: List[Tuple] = []                          # ('lit', p) / ('run', n)
    i, total = 0, argb.size
    while i < total:
        p = int(argb[i])
        if i > 0 and p == int(argb[i - 1]):
            run = 1
            while i + run < total and int(argb[i + run]) == p:
                run += 1
            tokens.append(("run", run))
            i += run
        else:
            tokens.append(("lit", p))
            i += 1

    green_used, red_used, blue_used, alpha_used = set(), set(), set(), set()
    dist_used = set()
    for kind, v in tokens:
        if kind == "lit":
            green_used.add((v >> 8) & 0xFF)
            red_used.add((v >> 16) & 0xFF)
            blue_used.add(v & 0xFF)
            alpha_used.add((v >> 24) & 0xFF)
        else:
            length = v
            while length:
                chunk = min(length, 4096)
                green_used.add(256 + _prefix_encode(chunk)[0])
                dist_used.add(_prefix_encode(121)[0])  # dist 1 => code 121
                length -= chunk
    if not dist_used:
        dist_used.add(0)
    for s in (green_used, red_used, blue_used, alpha_used):
        if not s:
            s.add(0)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (alpha != 255).any() else 0, 1)     # alpha hint
    bw.write(0, 3)                                    # version
    bw.write(0, 1)                                    # no transforms
    bw.write(0, 1)                                    # no color cache
    bw.write(0, 1)                                    # no meta codes
    tables = []
    for used, alphabet in zip((green_used, red_used, blue_used,
                               alpha_used, dist_used), _ALPHABETS):
        lengths = _write_prefix_code(bw, sorted(used), alphabet)
        tables.append(_canonical_codes(lengths))

    def emit(ci: int, sym: int) -> None:
        entry = tables[ci].get(sym)
        if entry is not None:
            bw.write_code(*entry)                     # trivial => 0 bits

    for kind, v in tokens:
        if kind == "lit":
            emit(0, (v >> 8) & 0xFF)
            emit(1, (v >> 16) & 0xFF)
            emit(2, v & 0xFF)
            emit(3, (v >> 24) & 0xFF)
        else:
            length = v
            while length:
                chunk = min(length, 4096)
                lp, lx, lxn = _prefix_encode(chunk)
                emit(0, 256 + lp)
                bw.write(lx, lxn)
                dp, dx, dxn = _prefix_encode(121)
                emit(4, dp)
                bw.write(dx, dxn)
                length -= chunk

    payload = b"\x2F" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM/ANMF container layer, public WebP container
# spec). Frame payloads reuse the still codecs above (VP8L) and .vp8
# (lossy), so the animation layer is pure container walk + compositing.
# ---------------------------------------------------------------------------

def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _decode_alph(payload: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane.

    Both spec compression methods: raw (C=0) and VP8L-coded (C=1 — a
    HEADERLESS lossless stream whose green channel carries the alpha
    values, dimensions supplied by the frame; the reference encoder's
    default for lossy+alpha, so this is the common real-corpus case,
    closed r6). The four filters (none/horizontal/vertical/gradient)
    un-apply after either decode; pre-processing (level reduction) is
    an encode-side lossy step with no decoder inverse."""
    if not payload:
        raise ValueError("empty ALPH chunk")
    head = payload[0]
    comp = head & 0x03
    filt = (head >> 2) & 0x03
    if comp > 1:
        raise ValueError(f"reserved ALPH compression method {comp}")
    if comp == 1:
        pix = _decode_vp8l_body(_BitReader(payload[1:]), w, h)
        if pix.shape != (h, w):
            raise ValueError("ALPH VP8L plane size mismatch")
        a = ((pix >> 8) & 0xFF).astype(np.int32)      # green = alpha
    else:
        raw = np.frombuffer(payload, np.uint8, count=min(w * h,
                                                         len(payload) - 1),
                            offset=1)
        if raw.size < w * h:
            raise ValueError("truncated ALPH plane")
        a = raw.reshape(h, w).astype(np.int32)
    return _unfilter_alpha(a, filt)


def _unfilter_alpha(a: np.ndarray, filt: int) -> np.ndarray:
    """Invert the ALPH prediction filter over delta values ``a``."""
    h, w = a.shape
    if filt == 0:
        return a.astype(np.uint8)
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif filt == 1:                       # horizontal
                pred = out[y, x - 1] if x else out[y - 1, x]
            elif filt == 2:                       # vertical
                pred = out[y - 1, x] if y else out[y, x - 1]
            else:                                 # gradient
                if x == 0:
                    pred = out[y - 1, x]
                elif y == 0:
                    pred = out[y, x - 1]
                else:
                    g = (int(out[y, x - 1]) + int(out[y - 1, x])
                         - int(out[y - 1, x - 1]))
                    pred = min(255, max(0, g))
            out[y, x] = (a[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _decode_frame_payload(sub: bytes) -> np.ndarray:
    """ANMF frame data (sub-chunks: optional ALPH, then VP8/VP8L) ->
    (h, w, 4) RGBA."""
    alpha = None
    pos = 0
    while pos + 8 <= len(sub):
        fourcc = sub[pos:pos + 4]
        (size,) = struct.unpack_from("<I", sub, pos + 4)
        payload = sub[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError("truncated ANMF sub-chunk")
        if fourcc == b"VP8L":
            px = decode_vp8l(payload)
            if px.ndim == 2:
                px = np.dstack([px, px, px])
            if px.shape[2] == 3:
                px = np.dstack([px, np.full(px.shape[:2], 255, np.uint8)])
            return px
        if fourcc == b"VP8 ":
            from json_time_series_extractor_spark.operators.vp8 import (
                decode_vp8)
            rgb = decode_vp8(payload)
            h, w = rgb.shape[:2]
            a = (_decode_alph(alpha, w, h) if alpha is not None
                 else np.full((h, w), 255, np.uint8))
            return np.dstack([rgb, a])
        if fourcc == b"ALPH":
            alpha = payload            # decoded once VP8 dims are known
        pos += 8 + size + (size & 1)
    raise ValueError("ANMF frame data has no VP8/VP8L chunk")


def decode_webp_frames(blob: bytes) -> Tuple[list, list]:
    """Animated WebP -> (frames, durations_ms): each frame is the
    COMPOSED (canvas_h, canvas_w, 4) RGBA canvas at that point of the
    animation, per the container spec's blending (B: 0 alpha-blend,
    1 overwrite) and disposal (D: 1 fills the frame rect with the ANIM
    background color) rules; durations from each ANMF header.

    A non-animated WebP decodes as a single full-canvas frame with
    duration 0 — same convention as a 1-frame GIF."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    canvas = None
    bg = np.zeros(4, np.uint8)
    frames: list = []
    durations: list = []
    saw_anim = False
    still_alph = b""       # sibling ALPH chunk preceding a still VP8
    while pos + 8 <= len(blob):
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8X":
            cw = _u24(payload, 4) + 1
            ch = _u24(payload, 7) + 1
            canvas = np.zeros((ch, cw, 4), np.uint8)
        elif fourcc == b"ANIM":
            # background color is stored B, G, R, A
            bg = np.array([payload[2], payload[1], payload[0],
                           payload[3]], np.uint8)
            saw_anim = True
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X canvas")
            fx = _u24(payload, 0) * 2
            fy = _u24(payload, 3) * 2
            fw = _u24(payload, 6) + 1
            fh = _u24(payload, 9) + 1
            dur = _u24(payload, 12)
            flags = payload[15]
            overwrite = bool(flags & 0x02)        # B=1: do not blend
            dispose_bg = bool(flags & 0x01)       # D=1: dispose to bg
            px = _decode_frame_payload(payload[16:])
            if px.shape[:2] != (fh, fw):
                raise ValueError(
                    f"ANMF dims {fw}x{fh} != coded {px.shape[1]}x"
                    f"{px.shape[0]}")
            region = canvas[fy:fy + fh, fx:fx + fw]
            if region.shape[:2] != (fh, fw):
                raise ValueError("ANMF rect outside canvas")
            if overwrite:
                region[:] = px
            else:                                  # spec alpha-blend
                sa = px[:, :, 3:4].astype(np.float64) / 255.0
                da = region[:, :, 3:4].astype(np.float64) / 255.0
                oa = sa + da * (1.0 - sa)
                safe = np.where(oa == 0.0, 1.0, oa)
                rgb = (px[:, :, :3] * sa
                       + region[:, :, :3] * da * (1.0 - sa)) / safe
                region[:, :, :3] = np.clip(
                    np.round(rgb), 0, 255).astype(np.uint8)
                region[:, :, 3] = np.clip(
                    np.round(oa[:, :, 0] * 255.0), 0, 255).astype(np.uint8)
            frames.append(canvas.copy())
            durations.append(dur)
            if dispose_bg:
                canvas[fy:fy + fh, fx:fx + fw] = bg
        elif fourcc == b"ALPH" and not saw_anim:
            still_alph = blob[pos:pos + 8 + size + (size & 1)]
        elif fourcc in (b"VP8L", b"VP8 ") and not saw_anim:
            px = _decode_frame_payload(
                still_alph + blob[pos:pos + 8 + size])
            frames.append(px)
            durations.append(0)
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("WebP container has no frames")
    return frames, durations


def encode_webp_animation(frames: list, durations_ms: list, *,
                          bg=(255, 255, 255, 0), loop: int = 0) -> bytes:
    """RGBA/RGB uint8 frames + per-frame durations -> animated WebP
    (VP8X + ANIM + one full-canvas VP8L ANMF per frame, overwrite
    blending, no disposal) — lossless round-trip through
    :func:`decode_webp_frames`."""
    if len(frames) != len(durations_ms) or not frames:
        raise ValueError("need equal, nonzero frame/duration counts")
    arrs = []
    for f in frames:
        a = np.ascontiguousarray(f, np.uint8)
        if a.ndim == 2:
            a = np.dstack([a, a, a])
        if a.shape[2] == 3:
            a = np.dstack([a, np.full(a.shape[:2], 255, np.uint8)])
        arrs.append(a)
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("all frames must share the canvas size")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (fourcc + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    def u24(v: int) -> bytes:
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    vp8x = bytes([0x12, 0, 0, 0]) + u24(w - 1) + u24(h - 1)  # A|ANIM flags
    anim = bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", loop)
    body = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for a, dur in zip(arrs, durations_ms):
        still = encode_vp8l(a)               # RIFF still; extract VP8L
        sub = still[12:]                     # first chunk is VP8L
        anmf = (u24(0) + u24(0) + u24(w - 1) + u24(h - 1)
                + u24(int(dur)) + bytes([0x02]) + sub)
        body += chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
