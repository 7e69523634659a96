"""Dependency-free baseline JPEG codec (pure Python + numpy).

Implements the baseline sequential DCT process of ITU-T T.81 (the JPEG
spec — public document), enough to decode the format a real web corpus
is mostly made of and to self-verify without PIL:

- **decode**: baseline (SOF0), 8-bit, grayscale or YCbCr; 4:4:4 and the
  web-default 4:2:0 chroma subsampling (plus any h,v in {1,2}); multiple
  DQT/DHT segments; restart markers (DRI/RSTn). Progressive (SOF2) and
  arithmetic coding are rejected with a clear error — they are the
  explicit PIL plug point.
- **encode**: baseline 4:4:4 or 4:2:0, standard Annex K quantization
  tables scaled by the libjpeg quality formula, standard Annex K Huffman
  tables (no per-image optimization). Grayscale or RGB.

The pair is inverse within quantization error, which makes the decoder
testable in this container: ``decode(encode(x, q))`` must land within a
bound derived from the quality's quantization step. All DCT/quantization
math is vectorized numpy over whole block grids; only the entropy coder
is a per-symbol Python loop (bounded by coefficient count, fine at
feature-extraction scale — this is the verification/local path, a
PIL/turbojpeg kernel slots into the same multimodal call sites for bulk
throughput).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .codecs import truncation_boundary

# ---------------------------------------------------------------------------
# Constants from ITU-T T.81 Annex K
# ---------------------------------------------------------------------------

#: Zigzag scan order: zigzag index -> (row-major) block index.
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K Huffman table specs: (bits[1..16] counts, symbol values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: DCT-II orthonormal basis matrix C: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base quantization table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((table * scale + 50) / 100), 1, 255)


def _build_huffman(bits: List[int], vals: List[int]
                   ) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: List[int], vals: List[int]
                        ) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _build_huffman(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self._nbits = 0


def _magnitude_category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_coefficient_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _decode_coefficient(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):            # positive
        return bits
    return bits - (1 << size) + 1


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded to /8 -> (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).swapaxes(1, 2)


def _deblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    by, bx = blocks.shape[:2]
    return blocks.swapaxes(1, 2).reshape(by * 8, bx * 8)[:h, :w]


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize a (by, bx, 8, 8) grid (all vectorized)."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ux,yixj,vj->yiuv", _C, shifted, _C)
    return np.round(coef / qt).astype(np.int32)


def _dequant_idct(coef: np.ndarray, qt: np.ndarray) -> np.ndarray:
    spatial = np.einsum("xu,yiuv,jv->yixj", _C.T, coef * qt, _C.T)
    return spatial + 128.0


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode_jpeg(pixels: np.ndarray, quality: int = 85, *,
                subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 (the web default; chroma box-filtered
    2x2); ``False`` emits 4:4:4. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (real encoders do — it's the
    decoder's resync path)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    h, w = arr.shape[:2]

    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)
    dc_l = _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2,
                            cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2,
                            cr.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    # Quantized coefficient grids per component, zigzagged.
    zz: List[np.ndarray] = []
    for ci, plane in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        q = _fdct_quant(_blockify(plane), qt)
        zz.append(q.reshape(q.shape[0], q.shape[1], 64)[..., _ZIGZAG])

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # Components' block grids must cover mcu{x,y} * their factors.
    for ci, (sh, sv) in enumerate(samp):
        need_y, need_x = mcuy * sv, mcux * sh
        by, bx = zz[ci].shape[:2]
        if by < need_y or bx < need_x:
            zz[ci] = np.pad(zz[ci], ((0, need_y - by), (0, need_x - bx),
                                     (0, 0)), mode="edge")

    writer = _BitWriter()
    pred = [0] * len(planes)

    def emit_block(block_zz: np.ndarray, ci: int) -> None:
        dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        diff = int(block_zz[0]) - pred[ci]
        pred[ci] = int(block_zz[0])
        size = _magnitude_category(diff)
        code, ln = dct[size]
        writer.write(code, ln)
        writer.write(_encode_coefficient_bits(diff, size), size)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if block_zz[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = int(block_zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]          # ZRL
                writer.write(code, ln)
                run -= 16
            size = _magnitude_category(v)
            code, ln = act[run * 16 + size]
            writer.write(code, ln)
            writer.write(_encode_coefficient_bits(v, size), size)
            run = 0
        if last_nz != 63:
            code, ln = act[0x00]              # EOB
            writer.write(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for ci in range(len(planes)):
                    pred[ci] = 0
            for ci, (sh, sv) in enumerate(samp):
                for v in range(sv):
                    for u in range(sh):
                        emit_block(zz[ci][my * sv + v, mx * sh + u], ci)
            mcu_count += 1
    writer.flush()

    # ---- markers ----
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                     # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payloads are stored in zigzag order: stored[k] = q[zigzag[k]].
    out += seg(0xFFDB, b"\x00" + bytes(
        qt_l.astype(np.uint8).reshape(64)[_ZIGZAG]))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(
            qt_c.astype(np.uint8).reshape(64)[_ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv,
                           0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)

    def dht(tc: int, th: int, bits: List[int], vals: List[int]) -> bytes:
        return seg(0xFFC4, bytes([tc << 4 | th]) + bytes(bits)
                   + bytes(vals))

    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xFFDA, sos)
    out += writer.out
    out += b"\xFF\xD9"                               # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

@truncation_boundary
def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:            # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                  # standalone
        (length,) = struct.unpack_from(">H", blob, pos)
        payload = blob[pos + 2:pos + length]
        pos += length
        if marker == 0xDB:            # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload, np.uint8, 64, p
                                        ).astype(np.float64)
                    p += 64
                else:
                    tbl = np.frombuffer(payload, ">u2", 64, p
                                        ).astype(np.float64)
                    p += 128
                q = np.zeros(64)
                q[_ZIGZAG] = tbl      # stored in zigzag order
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:          # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                bits = list(payload[p:p + 16])
                p += 16
                nv = sum(bits)
                vals = list(payload[p:p + nv])
                p += nv
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported, got {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", payload, 6 + 3 * ci)
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    # Documented support is factors {1,2} (4:4:4/4:2:2/
                    # 4:2:0); anything else would decode wrong geometry
                    # silently via lossy vmax//v division.
                    raise ValueError(
                        f"unsupported JPEG sampling factors {ch}x{cv} "
                        "(only 1 and 2 supported)")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) not supported — PIL/libjpeg plug in here")
        elif marker == 0xDD:          # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:          # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_sel = []
            for si in range(ns):
                cs, tables = payload[1 + 2 * si], payload[2 + 2 * si]
                scan_sel.append((cs, tables >> 4, tables & 0x0F))
            if len(scan_sel) != len(frame["comps"]):
                # A legal baseline non-interleaved scan sequence (ns <
                # ncomp per SOS) — unsupported format, NOT a corrupt
                # blob: raise the same way SOF2 does so on_error
                # policies classify it as a plug point.
                raise NotImplementedError(
                    f"non-interleaved baseline JPEG scan ({len(scan_sel)}"
                    f" of {len(frame['comps'])} components) not "
                    "supported")
            # Entropy-coded data runs to the next real marker.
            scan_start = pos
            p = pos
            while p + 1 < n:
                if blob[p] == 0xFF and blob[p + 1] not in (0x00,):
                    if 0xD0 <= blob[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            scan_bytes = blob[scan_start:p]
            pos = p
            return _decode_scan(frame, scan_sel, scan_bytes, qtables,
                                huff_dc, huff_ac, restart_interval)
        # APPn/COM and anything else: skipped
    raise ValueError("no SOS segment found")


def _decode_scan(frame, scan_sel, scan_bytes: bytes, qtables,
                 huff_dc, huff_ac, restart_interval: int) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    by_comp: Dict[int, np.ndarray] = {}
    for c in comps:
        by_comp[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
    table_for = {cs: (td, ta) for cs, td, ta in scan_sel}

    # Strip stuffed bytes and split on restart markers.
    segments: List[bytes] = []
    cur = bytearray()
    i = 0
    nb = len(scan_bytes)
    while i < nb:
        b = scan_bytes[i]
        if b == 0xFF:
            nxt = scan_bytes[i + 1] if i + 1 < nb else 0x00
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}

    def decode_huff(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = table_for[c["id"]]
                dct, act = huff_dc[td], huff_ac[ta]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = decode_huff(dct)
                        diff = _decode_coefficient(
                            reader.read_bits(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k <= 63:
                            sym = decode_huff(act)
                            if sym == 0x00:       # EOB
                                break
                            if sym == 0xF0:       # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            zz[k] = _decode_coefficient(
                                reader.read_bits(size), size)
                            k += 1
                        by_comp[c["id"]][my * c["v"] + v,
                                         mx * c["h"] + u] = zz
            mcu_count += 1

    # Dequantize + IDCT + upsample each component to full resolution.
    planes = []
    for c in comps:
        zz = by_comp[c["id"]]
        coef = np.zeros_like(zz)
        coef[..., _ZIGZAG] = zz       # inverse zigzag
        blocks = coef.reshape(zz.shape[0], zz.shape[1], 8, 8)
        spatial = _dequant_idct(blocks.astype(np.float64),
                                qtables[c["tq"]])
        plane = _deblockify(spatial, zz.shape[0] * 8, zz.shape[1] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
