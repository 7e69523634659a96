"""From-scratch lossy WebP (VP8) keyframe decoder — RFC 6386.

Closes the r5 plug point at ``vp8l.py`` (``decode_webp`` raised
NotImplementedError for ``VP8 `` chunks): WebP lossy files are VP8
KEYFRAMES, so a keyframe-only decoder is a complete lossy-WebP decoder.
Pure Python + numpy, zero native dependencies at decode time — the same
contract as the sibling :mod:`.jpeg` / :mod:`.codecs` / :mod:`.vp8l`
codecs, run per-blob inside Arrow-batched ``mapInPandas``
(operators/multimodal.py), so the Spark plan stays map-only.

Implements the full keyframe bitstream: boolean arithmetic decoder
(§7), keyframe header with segmentation / loop-filter deltas / multiple
token partitions / quantizer indices / token-probability updates (§9),
intra modes incl. per-subblock B_PRED with context-coded modes (§11),
token decoding with bands + nonzero contexts + extra-bit categories
(§13), dequantization with the Y2/UV scaling rules (§14.1), inverse WHT
and the 20091/35468 inverse DCT (§14.3-14.4), all ten 4x4 intra
predictors plus 16x16/chroma prediction with the 127/129 border rules
(§12), and the normal + simple in-loop deblocking filters with
per-segment/per-mode level adjustment (§15).

Normative constant tables (default/update token probabilities, keyframe
B-mode probabilities, quantizer lookups) live in the generated
:mod:`.vp8_tables` — extracted from the system's public reference-
implementation binary by ``tools/extract_vp8_tables.py`` (see its
docstring for the provenance + functional-validation argument).

Conformance evidence (tests/test_vp8.py): images encoded by libwebp's
own encoder across qualities/sizes/patterns decode to YUV planes
BIT-IDENTICAL to libwebp's decoder (the RGB conversion is
implementation-defined — libwebp applies fancy upsampling — so the
normative comparison is at the YUV level, where VP8 decoding is exact).

Reference parity note: the reference repo (a C# JSON extractor,
/root/reference/src) has no media surface; this codec exists for the
multimodal corpus tier (SURVEY.md §2.4), same as jpeg/png/vp8l.

Throughput: ~85 kpixel/s single-core pure Python (320x240 q75 in
~0.9s) — the same order as the sibling jpeg.py. At corpus scale the
cost parallelizes across blobs and executor cores inside mapInPandas
(map-only, no shuffle); for throughput-critical deployments the
documented swap-in point is the same call site with a native decoder.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from json_time_series_extractor_spark.operators import vp8_tables as T

# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 §7.3 reference decoder: 8-bit probability split of a
    [128, 256) range, byte-at-a-time renormalization. Reading past the
    end of the partition yields zero bits (the spec's documented
    behavior for well-formed streams that end mid-renormalization)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8 | data[1]) if len(data) >= 2 else
                      ((data[0] << 8) if data else 0))
        if len(data) < 2:
            self.pos = len(data)
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read(128)
        return v

    def signed_literal(self, bits: int) -> int:
        v = self.literal(bits)
        return -v if self.read(128) else v

    def tree(self, tree: Tuple[int, ...], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# Trees and small normative tables (RFC 6386 §8, §11, §13.2)
# ---------------------------------------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
# B_DC=0 B_TM=1 B_VE=2 B_HE=3 B_LD=4 B_RD=5 B_VR=6 B_VL=7 B_HD=8 B_HU=9
BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14,
              -7, 16, -8, -9)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# Token tree (§13.2): EOB, 0..4 literal, then extra-bit categories.
TOKEN_TREE = (-11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
              14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
TOKEN_EOB = 11
CAT_BASE = (5, 7, 11, 19, 35, 67)          # tokens 5..10
CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
             (180, 157, 141, 134, 130),
             (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

ZIGZAG = T.ZIGZAG
BANDS = T.COEFF_BANDS


# ---------------------------------------------------------------------------
# Header
# ---------------------------------------------------------------------------


class _Header:
    """Decoded keyframe header state."""

    __slots__ = (
        "width", "height", "seg_enabled", "seg_update_map", "seg_abs",
        "seg_quant", "seg_lf", "seg_tree_probs", "filter_simple",
        "filter_level", "sharpness", "lf_delta_enabled", "ref_lf_deltas",
        "mode_lf_deltas", "y_ac_qi", "y_dc_delta", "y2_dc_delta",
        "y2_ac_delta", "uv_dc_delta", "uv_ac_delta", "coeff_probs",
        "use_skip", "skip_prob", "partitions")


def _parse_header(data: bytes) -> Tuple[_Header, BoolDecoder]:
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = data[0] | data[1] << 8 | data[2] << 16
    if tag & 1:
        raise ValueError("VP8: not a keyframe (WebP requires keyframes)")
    version = (tag >> 1) & 7
    if version > 3:
        raise ValueError(f"VP8: bad version {version}")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: keyframe start code missing")
    w_raw, h_raw = struct.unpack_from("<HH", data, 6)
    h = _Header()
    h.width, h.height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if not h.width or not h.height:
        raise ValueError("VP8: zero dimensions")
    if 10 + part0_size > len(data):
        raise ValueError("VP8: first partition overruns frame")
    bd = BoolDecoder(data[10:10 + part0_size])

    bd.literal(1)                                     # color space (must be 0)
    bd.literal(1)                                     # clamping type

    h.seg_enabled = bool(bd.literal(1))
    h.seg_update_map = False
    h.seg_abs = False
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.seg_enabled:
        h.seg_update_map = bool(bd.literal(1))
        update_data = bool(bd.literal(1))
        if update_data:
            h.seg_abs = bool(bd.literal(1))
            for i in range(4):
                if bd.literal(1):
                    h.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.literal(1):
                    h.seg_lf[i] = bd.signed_literal(6)
        if h.seg_update_map:
            for i in range(3):
                if bd.literal(1):
                    h.seg_tree_probs[i] = bd.literal(8)

    h.filter_simple = bool(bd.literal(1))
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bool(bd.literal(1))
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled and bd.literal(1):          # delta update
        for deltas in (h.ref_lf_deltas, h.mode_lf_deltas):
            for i in range(4):
                if bd.literal(1):
                    deltas[i] = bd.signed_literal(6)

    n_parts = 1 << bd.literal(2)

    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    h.y2_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    h.y2_ac_delta = bd.signed_literal(4) if bd.literal(1) else 0
    h.uv_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    h.uv_ac_delta = bd.signed_literal(4) if bd.literal(1) else 0

    bd.literal(1)                                     # refresh_entropy_probs

    h.coeff_probs = [[[list(T.DEFAULT_COEFF_PROBS[t][b][c])
                       for c in range(3)] for b in range(8)]
                     for t in range(4)]
    upd = T.COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                row = h.coeff_probs[t][b][c]
                urow = upd[t][b][c]
                for p in range(11):
                    if bd.read(urow[p]):
                        row[p] = bd.literal(8)

    h.use_skip = bool(bd.literal(1))
    h.skip_prob = bd.literal(8) if h.use_skip else 0

    # Token partitions: sizes (3-byte LE each, all but last) follow the
    # first partition; MB row r reads from partition r % n_parts.
    rest = data[10 + part0_size:]
    if n_parts > 1:
        sz_bytes = 3 * (n_parts - 1)
        if len(rest) < sz_bytes:
            raise ValueError("VP8: truncated partition size table")
        sizes = [rest[3 * i] | rest[3 * i + 1] << 8 | rest[3 * i + 2] << 16
                 for i in range(n_parts - 1)]
        body = rest[sz_bytes:]
        parts = []
        off = 0
        for s in sizes:
            if off + s > len(body):
                raise ValueError("VP8: token partition overruns frame")
            parts.append(body[off:off + s])
            off += s
        parts.append(body[off:])
    else:
        parts = [rest]
    h.partitions = [BoolDecoder(p) for p in parts]
    return h, bd


# ---------------------------------------------------------------------------
# Dequantization (RFC 6386 §14.1)
# ---------------------------------------------------------------------------


def _dequant_factors(h: _Header, segment: int):
    """(y1, y2, uv) dequant pairs (dc, ac) for a segment."""
    q = h.y_ac_qi
    if h.seg_enabled:
        q = h.seg_quant[segment] if h.seg_abs else q + h.seg_quant[segment]
    q = max(0, min(127, q))

    def dc(i):
        return T.DC_QLOOKUP[max(0, min(127, i))]

    def ac(i):
        return T.AC_QLOOKUP[max(0, min(127, i))]

    y1 = (dc(q + h.y_dc_delta), ac(q))
    y2 = (dc(q + h.y2_dc_delta) * 2,
          max(8, ac(q + h.y2_ac_delta) * 155 // 100))
    uv = (min(132, dc(q + h.uv_dc_delta)), ac(q + h.uv_ac_delta))
    return y1, y2, uv


# ---------------------------------------------------------------------------
# Transforms (RFC 6386 §14.3-14.4)
# ---------------------------------------------------------------------------


def _iwht4x4(coeffs: List[int]) -> List[int]:
    out = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        out[i] = a1 + b1
        out[4 + i] = c1 + d1
        out[8 + i] = a1 - b1
        out[12 + i] = d1 - c1
    for i in range(4):
        r = 4 * i
        a1 = out[r] + out[r + 3]
        b1 = out[r + 1] + out[r + 2]
        c1 = out[r + 1] - out[r + 2]
        d1 = out[r] - out[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1, _C2 = 20091, 35468


def _idct4x4(coeffs: List[int]) -> np.ndarray:
    """Exact integer inverse DCT (§14.4); Python ``>>`` floors like the
    reference's arithmetic shift, so negative values match bit-for-bit."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[8 + i]
        b1 = coeffs[i] - coeffs[8 + i]
        t1 = (coeffs[4 + i] * _C2) >> 16
        t2 = coeffs[12 + i] + ((coeffs[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = coeffs[4 + i] + ((coeffs[4 + i] * _C1) >> 16)
        t2 = (coeffs[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Token (residual) decoding (RFC 6386 §13.3)
# ---------------------------------------------------------------------------


def _decode_coeffs(bd: BoolDecoder, probs, ctx: int,
                   first: int) -> Tuple[List[int], int]:
    """One 4x4 block's coefficients (zigzag-ordered into raster) and its
    has-nonzero flag for neighbor contexts."""
    coeffs = [0] * 16
    nz = 0
    i = first
    prev_zero = False
    while i < 16:
        p = probs[BANDS[i]][ctx]
        if not prev_zero:
            if not bd.read(p[0]):                     # EOB
                break
        # token without the EOB branch (cannot follow a zero)
        if not bd.read(p[1]):
            ctx = 0
            prev_zero = True
            i += 1
            continue
        if not bd.read(p[2]):
            v = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.read(p[3]):
                if not bd.read(p[4]):
                    v = 2
                else:
                    v = 3 if not bd.read(p[5]) else 4
            else:
                if not bd.read(p[6]):
                    cat = 0 if not bd.read(p[7]) else 1
                else:
                    cat = (2 if not bd.read(p[9]) else 3) \
                        if not bd.read(p[8]) else \
                        (4 if not bd.read(p[10]) else 5)
                v = CAT_BASE[cat]
                extra = 0
                for cp in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.read(cp)
                v += extra
        if bd.read(128):
            v = -v
        coeffs[ZIGZAG[i]] = v
        nz = 1
        prev_zero = False
        i += 1
    return coeffs, nz


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12)
# ---------------------------------------------------------------------------


def _pred_block(size: int, mode: int, above: Optional[np.ndarray],
                left: Optional[np.ndarray], tl: int) -> np.ndarray:
    """16x16 / 8x8 whole-block prediction. ``above``/``left`` are None
    off-frame (127/129 fills per §12.2)."""
    if mode == DC_PRED:
        if above is not None and left is not None:
            dc = (int(above.sum()) + int(left.sum()) + size) \
                >> (5 if size == 16 else 4)
        elif above is not None:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif left is not None:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    a = above if above is not None else np.full(size, 127, dtype=np.int32)
    lf = left if left is not None else np.full(size, 129, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(a.astype(np.int32), (size, 1))
    if mode == H_PRED:
        return np.tile(lf.astype(np.int32).reshape(-1, 1), (1, size))
    # TM_PRED
    out = (lf.astype(np.int32).reshape(-1, 1)
           + a.astype(np.int32).reshape(1, -1) - tl)
    return np.clip(out, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode: int, a: List[int], lf: List[int], tl: int) -> np.ndarray:
    """The ten 4x4 subblock predictors (§12.3). ``a`` has 8 entries
    (above + above-right)."""
    o = np.empty((4, 4), dtype=np.int32)
    if mode == 0:                                     # B_DC
        o[:] = (sum(a[:4]) + sum(lf) + 4) >> 3
    elif mode == 1:                                   # B_TM
        for r in range(4):
            for c in range(4):
                o[r, c] = min(255, max(0, lf[r] + a[c] - tl))
    elif mode == 2:                                   # B_VE
        e = [tl] + a[:5]
        row = [_avg3(e[c], e[c + 1], e[c + 2]) for c in range(4)]
        o[:] = np.array(row, dtype=np.int32)
    elif mode == 3:                                   # B_HE
        e = [tl] + lf + [lf[3]]
        for r in range(4):
            o[r, :] = _avg3(e[r], e[r + 1], e[r + 2])
    elif mode == 4:                                   # B_LD
        for r in range(4):
            for c in range(4):
                i = r + c
                o[r, c] = _avg3(a[i], a[i + 1], a[i + 2]) if i < 6 \
                    else _avg3(a[6], a[7], a[7])
    elif mode == 5:                                   # B_RD
        e = [lf[3], lf[2], lf[1], lf[0], tl, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                d = c - r
                o[r, c] = _avg3(e[3 + d], e[4 + d], e[5 + d])
    elif mode == 6:                                   # B_VR
        o[3, 0] = _avg3(lf[2], lf[1], lf[0])
        o[2, 0] = _avg3(lf[1], lf[0], tl)
        o[1, 0] = o[3, 1] = _avg3(lf[0], tl, a[0])
        o[0, 0] = o[2, 1] = _avg2(tl, a[0])
        o[1, 1] = o[3, 2] = _avg3(tl, a[0], a[1])
        o[0, 1] = o[2, 2] = _avg2(a[0], a[1])
        o[1, 2] = o[3, 3] = _avg3(a[0], a[1], a[2])
        o[0, 2] = o[2, 3] = _avg2(a[1], a[2])
        o[1, 3] = _avg3(a[1], a[2], a[3])
        o[0, 3] = _avg2(a[2], a[3])
    elif mode == 7:                                   # B_VL
        o[0, 0] = _avg2(a[0], a[1])
        o[1, 0] = _avg3(a[0], a[1], a[2])
        o[2, 0] = o[0, 1] = _avg2(a[1], a[2])
        o[1, 1] = o[3, 0] = _avg3(a[1], a[2], a[3])
        o[2, 1] = o[0, 2] = _avg2(a[2], a[3])
        o[3, 1] = o[1, 2] = _avg3(a[2], a[3], a[4])
        o[2, 2] = o[0, 3] = _avg2(a[3], a[4])
        o[3, 2] = o[1, 3] = _avg3(a[3], a[4], a[5])
        o[2, 3] = _avg3(a[4], a[5], a[6])
        o[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == 8:                                   # B_HD
        o[3, 0] = _avg2(lf[3], lf[2])
        o[3, 1] = _avg3(lf[3], lf[2], lf[1])
        o[2, 0] = o[3, 2] = _avg2(lf[2], lf[1])
        o[2, 1] = o[3, 3] = _avg3(lf[2], lf[1], lf[0])
        o[1, 0] = o[2, 2] = _avg2(lf[1], lf[0])
        o[1, 1] = o[2, 3] = _avg3(lf[1], lf[0], tl)
        o[0, 0] = o[1, 2] = _avg2(lf[0], tl)
        o[0, 1] = o[1, 3] = _avg3(lf[0], tl, a[0])
        o[0, 2] = _avg3(tl, a[0], a[1])
        o[0, 3] = _avg3(a[0], a[1], a[2])
    else:                                             # B_HU
        o[0, 0] = _avg2(lf[0], lf[1])
        o[0, 1] = _avg3(lf[0], lf[1], lf[2])
        o[0, 2] = o[1, 0] = _avg2(lf[1], lf[2])
        o[0, 3] = o[1, 1] = _avg3(lf[1], lf[2], lf[3])
        o[1, 2] = o[2, 0] = _avg2(lf[2], lf[3])
        o[1, 3] = o[2, 1] = _avg3(lf[2], lf[3], lf[3])
        o[2, 2] = o[2, 3] = lf[3]
        o[3, :] = lf[3]
    return o

# ---------------------------------------------------------------------------
# Frame reconstruction
# ---------------------------------------------------------------------------


class _MBInfo:
    __slots__ = ("segment", "skip", "ymode", "uvmode", "bmodes",
                 "has_coeffs", "filter_level")


def _decode_frame(h: _Header):
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4
    bd0 = h.partitions and None  # placeholder for lints
    return mb_w, mb_h, bd0


def decode_vp8_yuv(data: bytes):
    """Decode a VP8 keyframe payload (the content of a WebP ``VP8 ``
    chunk) to (y, u, v) uint8 planes, cropped to the frame size.
    Bit-identical to the reference decoder's YUV output (see module
    docstring)."""
    h, bd = _parse_header(data)
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4

    # Reconstructed planes in macroblock units; intra prediction reads
    # these UNFILTERED values (the loop filter runs after the full
    # reconstruction pass, §15.1).
    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)

    dequants = [_dequant_factors(h, s) for s in range(4)]

    # Nonzero contexts at 4x4 granularity: above spans the frame width,
    # left resets per MB row. Y2 context is per-MB and is LEFT UNCHANGED
    # by MBs that have no Y2 block (B_PRED), §13.3.
    above_nz_y = [0] * (4 * mb_w)
    above_nz_u = [0] * (2 * mb_w)
    above_nz_v = [0] * (2 * mb_w)
    above_nz_y2 = [0] * mb_w
    # B_PRED subblock-mode contexts (above/left), B_DC (0) off-frame.
    above_bmode = [0] * (4 * mb_w)

    mbs: List[_MBInfo] = []

    for mb_y in range(mb_h):
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        left_bmode = [0] * 4
        tokens = h.partitions[mb_y % len(h.partitions)]
        for mb_x in range(mb_w):
            mb = _MBInfo()
            mb.segment = 0
            if h.seg_update_map:
                mb.segment = bd.tree(SEGMENT_TREE, h.seg_tree_probs)
            mb.skip = bool(bd.read(h.skip_prob)) if h.use_skip else False
            mb.ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if mb.ymode == B_PRED:
                bmodes = []
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = above_bmode[4 * mb_x + c] if r == 0 \
                        else bmodes[sb - 4]
                    lm = left_bmode[r] if c == 0 else bmodes[sb - 1]
                    bm = bd.tree(BMODE_TREE, T.KF_BMODE_PROBS[am][lm])
                    bmodes.append(bm)
                mb.bmodes = bmodes
                for c in range(4):
                    above_bmode[4 * mb_x + c] = bmodes[12 + c]
                for r in range(4):
                    left_bmode[r] = bmodes[4 * r + 3]
            else:
                mb.bmodes = None
                # 16x16 modes propagate fixed B-mode equivalents for
                # neighboring B_PRED context (§11.5): DC->B_DC, V->B_VE,
                # H->B_HE, TM->B_TM.
                eq = {DC_PRED: 0, V_PRED: 2, H_PRED: 3, TM_PRED: 1}[mb.ymode]
                for c in range(4):
                    above_bmode[4 * mb_x + c] = eq
                for r in range(4):
                    left_bmode[r] = eq
            mb.uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            (y1dq, y2dq, uvdq) = dequants[mb.segment]
            has_y2 = mb.ymode != B_PRED

            y_coeffs = [None] * 16
            u_coeffs = [None] * 4
            v_coeffs = [None] * 4
            y2_out = None
            mb.has_coeffs = False

            if mb.skip:
                for i in range(4):
                    left_nz_y[i] = 0
                    above_nz_y[4 * mb_x + i] = 0
                for i in range(2):
                    left_nz_u[i] = above_nz_u[2 * mb_x + i] = 0
                    left_nz_v[i] = above_nz_v[2 * mb_x + i] = 0
                if has_y2:
                    left_nz_y2 = above_nz_y2[mb_x] = 0
            else:
                probs = h.coeff_probs
                if has_y2:
                    ctx = above_nz_y2[mb_x] + left_nz_y2
                    cf, nz = _decode_coeffs(tokens, probs[1], ctx, 0)
                    above_nz_y2[mb_x] = left_nz_y2 = nz
                    if nz:
                        mb.has_coeffs = True
                    dq = [cf[i] * (y2dq[0] if i == 0 else y2dq[1])
                          for i in range(16)]
                    y2_out = _iwht4x4(dq)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = above_nz_y[4 * mb_x + c] + left_nz_y[r]
                    cf, nz = _decode_coeffs(tokens, probs[ytype], ctx,
                                            first)
                    above_nz_y[4 * mb_x + c] = left_nz_y[r] = nz
                    if nz:
                        mb.has_coeffs = True
                    y_coeffs[sb] = cf
                for plane, coeffs_out, above_nz, left_nz in (
                        ("u", u_coeffs, above_nz_u, left_nz_u),
                        ("v", v_coeffs, above_nz_v, left_nz_v)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = above_nz[2 * mb_x + c] + left_nz[r]
                        cf, nz = _decode_coeffs(tokens, probs[2], ctx, 0)
                        above_nz[2 * mb_x + c] = left_nz[r] = nz
                        if nz:
                            mb.has_coeffs = True
                        coeffs_out[sb] = cf

            # ---------------- reconstruction ----------------
            x0, y0 = 16 * mb_x, 16 * mb_y

            def residual_y(sb):
                cf = y_coeffs[sb]
                if cf is None:
                    cf = [0] * 16
                else:
                    cf = [cf[i] * (y1dq[0] if i == 0 else y1dq[1])
                          for i in range(16)]
                if y2_out is not None:
                    cf[0] = y2_out[sb]
                if any(cf):
                    return _idct4x4(cf)
                return None

            if mb.ymode == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    px, py = x0 + 4 * c, y0 + 4 * r
                    if py == 0:
                        a8 = [127] * 8
                        tl = 127
                    else:
                        # Above-right: within the MB interior it is the
                        # reconstructed row above; right-edge subblocks
                        # always use the row above the MACROBLOCK
                        # (§12.3), off-frame replicating pixel 127 at
                        # row 0 and the rightmost above pixel otherwise.
                        arow = Y[py - 1]
                        a4 = [int(v) for v in arow[px:px + 4]]
                        if c < 3:
                            ar = [int(v) for v in arow[px + 4:px + 8]]
                        else:
                            src_y = y0 - 1
                            if src_y < 0:
                                ar = [127] * 4
                            elif x0 + 16 < Y.shape[1] and \
                                    mb_x + 1 < mb_w:
                                ar = [int(v)
                                      for v in Y[src_y, x0 + 16:x0 + 20]]
                            else:
                                ar = [int(Y[src_y, Y.shape[1] - 1])] * 4
                            if r > 0:
                                ar = [int(v) for v in ar]
                        a8 = a4 + ar
                        tl = 127 if py == 0 else (
                            129 if px == 0 else int(Y[py - 1, px - 1]))
                    lf4 = [129] * 4 if px == 0 else \
                        [int(Y[py + i, px - 1]) for i in range(4)]
                    if py == 0:
                        tl = 127
                    elif px == 0:
                        tl = 129
                    pred = _pred_b(mb.bmodes[sb], a8, lf4, tl)
                    res = residual_y(sb)
                    if res is not None:
                        pred = pred + res
                    Y[py:py + 4, px:px + 4] = np.clip(pred, 0, 255)
            else:
                above = Y[y0 - 1, x0:x0 + 16].astype(np.int32) \
                    if y0 > 0 else None
                left = Y[y0:y0 + 16, x0 - 1].astype(np.int32) \
                    if x0 > 0 else None
                tl = 127 if y0 == 0 else (129 if x0 == 0
                                          else int(Y[y0 - 1, x0 - 1]))
                pred = _pred_block(16, mb.ymode, above, left, tl)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    res = residual_y(sb)
                    if res is not None:
                        blk = pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] + res
                        pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] = \
                            np.clip(blk, 0, 255)
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred, 0, 255)

            cx0, cy0 = 8 * mb_x, 8 * mb_y
            for plane, P, coeffs in ((0, U, u_coeffs), (1, V, v_coeffs)):
                above = P[cy0 - 1, cx0:cx0 + 8].astype(np.int32) \
                    if cy0 > 0 else None
                left = P[cy0:cy0 + 8, cx0 - 1].astype(np.int32) \
                    if cx0 > 0 else None
                tl = 127 if cy0 == 0 else (129 if cx0 == 0
                                           else int(P[cy0 - 1, cx0 - 1]))
                pred = _pred_block(8, mb.uvmode, above, left, tl)
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    cf = coeffs[sb]
                    if cf is not None:
                        cf = [cf[i] * (uvdq[0] if i == 0 else uvdq[1])
                              for i in range(16)]
                        if any(cf):
                            res = _idct4x4(cf)
                            blk = pred[4 * r:4 * r + 4,
                                       4 * c:4 * c + 4] + res
                            pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] = \
                                np.clip(blk, 0, 255)
                P[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred, 0, 255)

            # Per-MB loop filter level (§15.3).
            lvl = h.filter_level
            if h.seg_enabled:
                lvl = h.seg_lf[mb.segment] if h.seg_abs \
                    else lvl + h.seg_lf[mb.segment]
            lvl = max(0, min(63, lvl))
            if h.lf_delta_enabled:
                lvl += h.ref_lf_deltas[0]             # intra frame
                if mb.ymode == B_PRED:
                    lvl += h.mode_lf_deltas[0]
                lvl = max(0, min(63, lvl))
            mb.filter_level = lvl
            mbs.append(mb)

    if h.filter_level > 0 or h.seg_enabled or h.lf_delta_enabled:
        _loop_filter(h, mbs, Y, U, V, mb_w, mb_h)

    return (Y[:h.height, :h.width],
            U[:(h.height + 1) >> 1, :(h.width + 1) >> 1],
            V[:(h.height + 1) >> 1, :(h.width + 1) >> 1])


# ---------------------------------------------------------------------------
# In-loop deblocking filter (RFC 6386 §15)
# ---------------------------------------------------------------------------
# Vectorized along the edge: each edge's 8 (or 4) pixel taps are numpy
# int32 vectors, so the per-MB cost is a handful of array ops instead of
# 16 scalar loops. s/u conversion: work on (x - 128) signed values.


def _filter_limits(level: int, sharpness: int):
    interior = level
    if sharpness > 0:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    return interior, hev_t


def _c(x):
    return np.clip(x, -128, 127)


def _normal_edge(p3, p2, p1, p0, q0, q1, q2, q3, edge_limit, interior,
                 hev_t, mb_edge):
    """The §15.2/15.3 filters on vectors of edge pixels. Returns the
    (possibly updated) six inner taps (p2,p1,p0,q0,q1,q2) as uint8."""
    P3, P2, P1, P0 = (a.astype(np.int32) for a in (p3, p2, p1, p0))
    Q0, Q1, Q2, Q3 = (a.astype(np.int32) for a in (q0, q1, q2, q3))
    mask = ((np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1)) <= edge_limit)
    for a, b in ((P3, P2), (P2, P1), (P1, P0), (Q1, Q0), (Q2, Q1),
                 (Q3, Q2)):
        mask &= (np.abs(a - b) <= interior)
    hev = (np.abs(P1 - P0) > hev_t) | (np.abs(Q1 - Q0) > hev_t)

    ps2, ps1, ps0 = P2 - 128, P1 - 128, P0 - 128
    qs0, qs1, qs2 = Q0 - 128, Q1 - 128, Q2 - 128

    # Common 2-tap adjustment (use_outer_taps = hev on MB edges inside
    # the "else" branch handles the rest; on subblock edges the outer
    # taps are used only when hev).
    def common(use_outer):
        a = _c((_c(ps1 - qs1) if isinstance(use_outer, bool) and use_outer
                else np.where(use_outer, _c(ps1 - qs1), 0))
               + 3 * (qs0 - ps0))
        f1 = _c(a + 4) >> 3
        f2 = _c(a + 3) >> 3
        return f1, f2

    if mb_edge:
        # hev pixels: 2-tap filter with outer taps; non-hev: 6-tap.
        f1, f2 = common(np.ones_like(mask))
        q0h = qs0 - f1
        p0h = ps0 + f2
        w = _c(_c(ps1 - qs1) + 3 * (qs0 - ps0))
        a27 = (27 * w + 63) >> 7
        a18 = (18 * w + 63) >> 7
        a9 = (9 * w + 63) >> 7
        q0n, p0n = qs0 - a27, ps0 + a27
        q1n, p1n = qs1 - a18, ps1 + a18
        q2n, p2n = qs2 - a9, ps2 + a9
        sel = mask & hev
        seln = mask & ~hev
        P0n = np.where(sel, p0h, np.where(seln, p0n, ps0))
        Q0n = np.where(sel, q0h, np.where(seln, q0n, qs0))
        P1n = np.where(seln, p1n, ps1)
        Q1n = np.where(seln, q1n, qs1)
        P2n = np.where(seln, p2n, ps2)
        Q2n = np.where(seln, q2n, qs2)
    else:
        f1, f2 = common(hev)
        q0n = qs0 - f1
        p0n = ps0 + f2
        a = (f1 + 1) >> 1
        q1n = np.where(~hev, qs1 - a, qs1)
        p1n = np.where(~hev, ps1 + a, ps1)
        P0n = np.where(mask, p0n, ps0)
        Q0n = np.where(mask, q0n, qs0)
        P1n = np.where(mask, p1n, ps1)
        Q1n = np.where(mask, q1n, qs1)
        P2n, Q2n = ps2, qs2
    to_u8 = lambda v: (_c(v) + 128).astype(np.uint8)  # noqa: E731
    return (to_u8(P2n), to_u8(P1n), to_u8(P0n),
            to_u8(Q0n), to_u8(Q1n), to_u8(Q2n))


def _simple_edge(p1, p0, q0, q1, edge_limit):
    P1, P0 = p1.astype(np.int32), p0.astype(np.int32)
    Q0, Q1 = q0.astype(np.int32), q1.astype(np.int32)
    mask = ((np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1)) <= edge_limit)
    ps1, ps0, qs0, qs1 = P1 - 128, P0 - 128, Q0 - 128, Q1 - 128
    a = _c(_c(ps1 - qs1) + 3 * (qs0 - ps0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    p0n = np.where(mask, ps0 + f2, ps0)
    q0n = np.where(mask, qs0 - f1, qs0)
    return ((_c(p0n) + 128).astype(np.uint8),
            (_c(q0n) + 128).astype(np.uint8))


def _filter_v_edge(plane, x, y0, n, edge_limit, interior, hev_t, mb_edge):
    """Vertical edge at column x (pixels x-4..x+3), rows y0..y0+n."""
    cols = plane[y0:y0 + n, x - 4:x + 4]
    taps = _normal_edge(cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3],
                        cols[:, 4], cols[:, 5], cols[:, 6], cols[:, 7],
                        edge_limit, interior, hev_t, mb_edge)
    for i, t in enumerate(taps):
        plane[y0:y0 + n, x - 3 + i] = t


def _filter_h_edge(plane, y, x0, n, edge_limit, interior, hev_t, mb_edge):
    rows = plane[y - 4:y + 4, x0:x0 + n]
    taps = _normal_edge(rows[0], rows[1], rows[2], rows[3],
                        rows[4], rows[5], rows[6], rows[7],
                        edge_limit, interior, hev_t, mb_edge)
    for i, t in enumerate(taps):
        plane[y - 3 + i, x0:x0 + n] = t


def _loop_filter(h: _Header, mbs, Y, U, V, mb_w, mb_h) -> None:
    """Frame-level deblocking in MB raster order (§15.1): MB left edge,
    inner vertical edges, MB top edge, inner horizontal edges. Inner
    edges are skipped for MBs with no coefficients whose mode is not
    B_PRED."""
    simple = h.filter_simple
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            lvl = mb.filter_level
            if lvl == 0:
                continue
            interior, hev_t = _filter_limits(lvl, h.sharpness)
            mb_lim = ((lvl + 2) * 2) + interior
            sub_lim = (lvl * 2) + interior
            inner = mb.has_coeffs or mb.ymode == B_PRED
            x0, y0 = 16 * mb_x, 16 * mb_y
            cx0, cy0 = 8 * mb_x, 8 * mb_y
            if simple:
                if mb_x > 0:
                    c = Y[y0:y0 + 16, x0 - 2:x0 + 2]
                    p0, q0 = _simple_edge(c[:, 0], c[:, 1], c[:, 2],
                                          c[:, 3], mb_lim)
                    Y[y0:y0 + 16, x0 - 1] = p0
                    Y[y0:y0 + 16, x0] = q0
                if inner:
                    for dx in (4, 8, 12):
                        c = Y[y0:y0 + 16, x0 + dx - 2:x0 + dx + 2]
                        p0, q0 = _simple_edge(c[:, 0], c[:, 1], c[:, 2],
                                              c[:, 3], sub_lim)
                        Y[y0:y0 + 16, x0 + dx - 1] = p0
                        Y[y0:y0 + 16, x0 + dx] = q0
                if mb_y > 0:
                    r = Y[y0 - 2:y0 + 2, x0:x0 + 16]
                    p0, q0 = _simple_edge(r[0], r[1], r[2], r[3], mb_lim)
                    Y[y0 - 1, x0:x0 + 16] = p0
                    Y[y0, x0:x0 + 16] = q0
                if inner:
                    for dy in (4, 8, 12):
                        r = Y[y0 + dy - 2:y0 + dy + 2, x0:x0 + 16]
                        p0, q0 = _simple_edge(r[0], r[1], r[2], r[3],
                                              sub_lim)
                        Y[y0 + dy - 1, x0:x0 + 16] = p0
                        Y[y0 + dy, x0:x0 + 16] = q0
                continue
            # Normal filter: luma + chroma.
            if mb_x > 0:
                _filter_v_edge(Y, x0, y0, 16, mb_lim, interior, hev_t,
                               True)
                _filter_v_edge(U, cx0, cy0, 8, mb_lim, interior, hev_t,
                               True)
                _filter_v_edge(V, cx0, cy0, 8, mb_lim, interior, hev_t,
                               True)
            if inner:
                for dx in (4, 8, 12):
                    _filter_v_edge(Y, x0 + dx, y0, 16, sub_lim, interior,
                                   hev_t, False)
                _filter_v_edge(U, cx0 + 4, cy0, 8, sub_lim, interior,
                               hev_t, False)
                _filter_v_edge(V, cx0 + 4, cy0, 8, sub_lim, interior,
                               hev_t, False)
            if mb_y > 0:
                _filter_h_edge(Y, y0, x0, 16, mb_lim, interior, hev_t,
                               True)
                _filter_h_edge(U, cy0, cx0, 8, mb_lim, interior, hev_t,
                               True)
                _filter_h_edge(V, cy0, cx0, 8, mb_lim, interior, hev_t,
                               True)
            if inner:
                for dy in (4, 8, 12):
                    _filter_h_edge(Y, y0 + dy, x0, 16, sub_lim, interior,
                                   hev_t, False)
                _filter_h_edge(U, cy0 + 4, cx0, 8, sub_lim, interior,
                               hev_t, False)
                _filter_h_edge(V, cy0 + 4, cx0, 8, sub_lim, interior,
                               hev_t, False)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YUV420 -> RGB with nearest-neighbor chroma
    upsampling. DELIBERATELY simple and documented: RFC 6386 does not
    normatively define the RGB conversion (libwebp applies its own
    fancy upsampler), so the codec's conformance contract is the YUV
    planes; this conversion only feeds the feature extractors."""
    h, w = y.shape
    uu = u.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.float64)
    vv = v.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.float64)
    yy = y.astype(np.float64)
    r = 1.164 * (yy - 16) + 1.596 * (vv - 128)
    g = 1.164 * (yy - 16) - 0.813 * (vv - 128) - 0.391 * (uu - 128)
    b = 1.164 * (yy - 16) + 2.018 * (uu - 128)
    return np.clip(np.dstack([r, g, b]).round(), 0, 255).astype(np.uint8)


def decode_vp8(data: bytes) -> np.ndarray:
    """WebP ``VP8 `` chunk payload -> HxWx3 uint8 RGB (see
    :func:`yuv420_to_rgb` for the conversion contract)."""
    y, u, v = decode_vp8_yuv(data)
    return yuv420_to_rgb(y, u, v)
