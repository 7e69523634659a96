"""Dependency-free JPEG codec (pure Python + numpy).

Implements the baseline sequential AND progressive DCT processes of
ITU-T T.81 (the JPEG spec — public document), enough to decode the
formats a real web corpus is mostly made of and to self-verify without
PIL:

- **decode**: baseline (SOF0/1, interleaved or one-scan-per-component
  non-interleaved sequences) and progressive (SOF2 — spectral selection
  + successive approximation, DC/AC first + refinement scans, EOB runs,
  per T.81 G.1.2), 8-bit, grayscale or YCbCr; 4:4:4 and the web-default
  4:2:0 chroma subsampling (plus any h,v in {1,2}); multiple DQT/DHT
  segments; restart markers (DRI/RSTn). Arithmetic coding,
  lossless/hierarchical processes, and partially-interleaved baseline
  scan subsets are rejected with a clear error — they are the explicit
  PIL plug point.
- **encode**: baseline or progressive (4-phase successive-approximation
  scan script), 4:4:4 or 4:2:0, standard Annex K quantization tables
  scaled by the libjpeg quality formula, standard Annex K Huffman
  tables (no per-image optimization). Grayscale or RGB. Progressive
  encode exists chiefly to prove the decoder: both modes carry the same
  quantized coefficients, so their decodes are bit-identical.

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

def _encode_progressive_scans(zz: List[np.ndarray], samp, actual,
                              mcux: int, mcuy: int, dc_tables,
                              ac_tables) -> List[Tuple[bytes, bytes]]:
    """Progressive scan script -> [(SOS payload, entropy bytes)].

    Four-phase successive approximation (T.81 G.1.2): DC first at Al=1
    (interleaved), DC refinement at Al=0 (one bit per block), then per
    component AC first over Ss=1..Se=63 at Al=1 and AC refinement at
    Al=0. EOB runs are limited to EOB0 so the Annex K AC tables (which
    lack EOBn symbols) suffice; the decoder handles general EOBRUN."""
    ncomp = len(zz)
    scans: List[Tuple[bytes, bytes]] = []

    def sos(comp_ids, ss, se, ah, al):
        pl = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            pl += bytes([ci + 1, (td << 4) | td])
        return pl + bytes([ss, se, (ah << 4) | al])

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for v in range(sv):
                        for u in range(sh):
                            yield ci, zz[ci][my * sv + v, mx * sh + u]

    # Scan 1: DC first, all components interleaved, Ah=0 Al=1. The DC
    # point transform is an arithmetic shift (floor), so d>>1 works for
    # both signs and (d1 << 1) | (d & 1) reconstructs d exactly.
    w = _BitWriter()
    pred = [0] * ncomp
    for ci, blk in mcu_blocks():
        d = int(blk[0]) >> 1
        diff = d - pred[ci]
        pred[ci] = d
        size = _magnitude_category(diff)
        code, ln = dc_tables[ci][size]
        w.write(code, ln)
        w.write(_encode_coefficient_bits(diff, size), size)
    w.flush()
    scans.append((sos(list(range(ncomp)), 0, 0, 0, 1), bytes(w.out)))

    # Scan 2: DC refinement, Ah=1 Al=0 — raw magnitude bits, no Huffman.
    w = _BitWriter()
    for _, blk in mcu_blocks():
        w.write(int(blk[0]) & 1, 1)
    w.flush()
    scans.append((sos(list(range(ncomp)), 0, 0, 1, 0), bytes(w.out)))

    for ci in range(ncomp):
        act = ac_tables[ci]
        bh, bw = actual[ci]

        # AC first: values at Al=1 are sign * (|v| >> 1).
        w = _BitWriter()
        for byy in range(bh):
            for bxx in range(bw):
                blk = zz[ci][byy, bxx]
                last_nz = 0
                for k in range(63, 0, -1):
                    if abs(int(blk[k])) >> 1:
                        last_nz = k
                        break
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    v1 = (abs(v) >> 1) * (1 if v > 0 else -1)
                    if v1 == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        w.write(code, ln)
                        run -= 16
                    size = _magnitude_category(v1)
                    code, ln = act[(run << 4) | size]
                    w.write(code, ln)
                    w.write(_encode_coefficient_bits(v1, size), size)
                    run = 0
                if last_nz != 63:
                    code, ln = act[0x00]      # EOB0
                    w.write(code, ln)
        w.flush()
        scans.append((sos([ci], 1, 63, 0, 1), bytes(w.out)))

        # AC refinement (G.1.2.3): newly-significant coefficients
        # (|v| == 1) Huffman-coded with zero-history runs; correction
        # bits for already-significant ones buffered and flushed after
        # the next symbol (exactly the order the decoder consumes them).
        w = _BitWriter()
        for byy in range(bh):
            for bxx in range(bw):
                blk = zz[ci][byy, bxx]
                absv = [abs(int(blk[k])) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                run, br = 0, []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        code, ln = act[0xF0]
                        w.write(code, ln)
                        for b in br:
                            w.write(b, 1)
                        br = []
                        run -= 16
                    if t > 1:
                        br.append(t & 1)
                        continue
                    code, ln = act[(run << 4) | 1]
                    w.write(code, ln)
                    w.write(1 if int(blk[k]) > 0 else 0, 1)
                    for b in br:
                        w.write(b, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    code, ln = act[0x00]
                    w.write(code, ln)
                    for b in br:
                        w.write(b, 1)
        w.flush()
        scans.append((sos([ci], 1, 63, 1, 0), bytes(w.out)))
    return scans


def _encode_sequential_scans(zz: List[np.ndarray], actual, dc_tables,
                             ac_tables) -> List[Tuple[bytes, bytes]]:
    """Baseline NON-interleaved scan script: one full-spectral (DC+AC)
    scan per component over its actual block grid -> [(SOS payload,
    entropy bytes)]. Exists chiefly to prove the decoder's ns=1 path."""
    scans: List[Tuple[bytes, bytes]] = []
    for ci in range(len(zz)):
        td = 0 if ci == 0 else 1
        dct, act = dc_tables[ci], ac_tables[ci]
        w = _BitWriter()
        pred = 0
        bh, bw = actual[ci]
        for byy in range(bh):
            for bxx in range(bw):
                blk = zz[ci][byy, bxx]
                diff = int(blk[0]) - pred
                pred = int(blk[0])
                size = _magnitude_category(diff)
                code, ln = dct[size]
                w.write(code, ln)
                w.write(_encode_coefficient_bits(diff, size), size)
                last_nz = 0
                for k in range(63, 0, -1):
                    if blk[k]:
                        last_nz = k
                        break
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        w.write(code, ln)
                        run -= 16
                    size = _magnitude_category(v)
                    code, ln = act[(run << 4) | size]
                    w.write(code, ln)
                    w.write(_encode_coefficient_bits(v, size), size)
                    run = 0
                if last_nz != 63:
                    code, ln = act[0x00]
                    w.write(code, ln)
        w.flush()
        sos = bytes([1, ci + 1, (td << 4) | td, 0, 63, 0])
        scans.append((sos, bytes(w.out)))
    return scans


def encode_jpeg(pixels: np.ndarray, quality: int = 85, *,
                subsample: bool = True,
                restart_interval: int = 0,
                progressive: bool = False,
                interleave: bool = True) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> JFIF bytes.

    ``subsample=True`` emits 4:2:0 (the web default; chroma box-filtered
    2x2); ``False`` emits 4:4:4. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (real encoders do — it's the
    decoder's resync path; baseline only). ``progressive=True`` emits an
    SOF2 stream with the successive-approximation scan script of
    ``_encode_progressive_scans``; ``interleave=False`` emits a baseline
    stream with one non-interleaved full-spectral scan per component.
    Every mode carries the same quantized coefficients, so all decodes
    are bit-identical."""
    if progressive and restart_interval:
        raise ValueError(
            "restart markers are not supported in progressive encode")
    if not interleave and (progressive or restart_interval):
        raise ValueError(
            "interleave=False is a plain baseline mode (no progressive, "
            "no restart markers)")
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
    # Actual (pre-MCU-padding) block dims: non-interleaved progressive
    # scans iterate exactly this grid (T.81 A.2.2).
    actual = [(z.shape[0], z.shape[1]) for z in zz]

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

    multi_scans: List[Tuple[bytes, bytes]] = []
    if progressive or not interleave:
        dc_tables = [dc_l if ci == 0 else dc_c
                     for ci in range(len(planes))]
        ac_tables = [ac_l if ci == 0 else ac_c
                     for ci in range(len(planes))]
        if progressive:
            multi_scans = _encode_progressive_scans(
                zz, samp, actual, mcux, mcuy, dc_tables, ac_tables)
        else:
            multi_scans = _encode_sequential_scans(
                zz, actual, dc_tables, ac_tables)

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

    if not progressive and interleave:
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
                            emit_block(zz[ci][my * sv + v, mx * sh + u],
                                       ci)
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
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)

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
    if multi_scans:
        for sos_payload, entropy in multi_scans:
            out += seg(0xFFDA, sos_payload)
            out += entropy
    else:
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
    """JFIF bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB.

    Baseline (SOF0/1) and progressive (SOF2) DCT processes; progressive
    covers spectral selection AND successive approximation (DC/AC first
    + refinement scans, EOB runs), per ITU-T T.81 G.1.2."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coef: Dict[int, np.ndarray] = {}   # comp id -> (by, bx, 64) zigzag
    n_scans = 0
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (lossless/arithmetic/"
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
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if (not progressive
                    and 1 < len(scan_sel) < len(frame["comps"])):
                # A partially-interleaved baseline scan subset (1 < ns <
                # ncomp) — unsupported format, NOT a corrupt blob: raise
                # the same way unsupported SOFs do so on_error policies
                # classify it as a plug point. (ns == 1 non-interleaved
                # sequences decode below; ns == ncomp is the fast path.)
                raise NotImplementedError(
                    f"partially-interleaved baseline JPEG scan "
                    f"({len(scan_sel)} of {len(frame['comps'])} "
                    "components) not supported")
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
            if not progressive and len(scan_sel) == len(frame["comps"]):
                return _decode_scan(frame, scan_sel, scan_bytes, qtables,
                                    huff_dc, huff_ac, restart_interval)
            if not coef:
                _alloc_coef(frame, coef)
            if progressive:
                _progressive_scan(frame, coef, scan_sel, ss, se, ah, al,
                                  scan_bytes, huff_dc, huff_ac,
                                  restart_interval)
            else:
                # Baseline non-interleaved (ns=1 per SOS): accumulate
                # each component's full-spectral scan, reconstruct at
                # EOI like the progressive path.
                _sequential_scan_single(frame, coef, scan_sel,
                                        scan_bytes, huff_dc, huff_ac,
                                        restart_interval)
            n_scans += 1
        # APPn/COM and anything else: skipped
    if n_scans:
        return _reconstruct(frame, coef, qtables)
    raise ValueError("no SOS segment found")


def _split_restart_segments(scan_bytes: bytes) -> List[bytes]:
    """Strip stuffed 0xFF00 bytes and split entropy data on RSTn."""
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
    return segments


def _decode_huff_from(reader: "_BitReader", table) -> int:
    """Read one Huffman symbol (canonical (length, code) lookup)."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _comp_block_dims(frame, c) -> Tuple[int, int]:
    """A component's ACTUAL block grid (non-interleaved scans iterate
    this, NOT the MCU-padded grid — T.81 A.2.2)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coef(frame, coef: Dict[int, np.ndarray]) -> None:
    """Allocate MCU-padded zigzag coefficient planes for every frame
    component (progressive scans accumulate into these across scans)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        coef[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)


def _refine_nonzero(blk: np.ndarray, k: int, reader: "_BitReader",
                    p1: int) -> None:
    """AC refinement correction bit for an already-nonzero coefficient
    (T.81 G.1.2.3): if the bit is set and this magnitude bit isn't,
    grow the magnitude by 1 << Al in the coefficient's sign direction."""
    if reader.read_bit() and not int(blk[k]) & p1:
        blk[k] += p1 if blk[k] > 0 else -p1


def _sequential_scan_single(frame, coef: Dict[int, np.ndarray], scan_sel,
                            scan_bytes: bytes, huff_dc, huff_ac,
                            restart_interval: int) -> None:
    """One baseline NON-interleaved scan (ns=1): full-spectral DC+AC per
    block over the component's actual grid, accumulated into the shared
    coefficient planes (T.81 A.2.2 — restart counts are in blocks)."""
    (cs, td, ta), = scan_sel
    c = {x["id"]: x for x in frame["comps"]}[cs]
    dct, act = huff_dc[td], huff_ac[ta]
    plane = coef[cs]
    bh, bw = _comp_block_dims(frame, c)
    segments = _split_restart_segments(scan_bytes)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = 0
    count = 0
    for byy in range(bh):
        for bxx in range(bw):
            if (restart_interval and count
                    and count % restart_interval == 0):
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = 0
            count += 1
            blk = plane[byy, bxx]
            size = _decode_huff_from(reader, dct)
            diff = _decode_coefficient(reader.read_bits(size), size)
            pred += diff
            blk[0] = pred
            k = 1
            while k <= 63:
                sym = _decode_huff_from(reader, act)
                if sym == 0x00:       # EOB
                    break
                if sym == 0xF0:       # ZRL
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                blk[k] = _decode_coefficient(reader.read_bits(s), s)
                k += 1


def _progressive_scan(frame, coef: Dict[int, np.ndarray], scan_sel,
                      ss: int, se: int, ah: int, al: int,
                      scan_bytes: bytes, huff_dc, huff_ac,
                      restart_interval: int) -> None:
    """Decode one progressive scan into the coefficient planes.

    Four scan kinds (T.81 G.1.2): DC first (diff-coded, << Al), DC
    refinement (one bit per block), AC first (run-length + EOB runs,
    << Al), AC refinement (newly-significant coefficients interleaved
    with correction bits for history-nonzero ones; EOB runs consume
    correction bits too). DC scans may interleave components in MCU
    order; AC scans are single-component over its actual block grid."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    segments = _split_restart_segments(scan_bytes)
    seg_idx = 0
    reader = _BitReader(segments[0])

    def next_segment():
        nonlocal seg_idx, reader
        seg_idx += 1
        reader = _BitReader(segments[seg_idx])

    if ss == 0:                       # DC scan (first or refinement)
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        scan_comps = [by_id[cs] for cs, _, _ in scan_sel]
        dc_tbl = {cs: huff_dc.get(td) for cs, td, _ in scan_sel}
        pred = {c["id"]: 0 for c in scan_comps}
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
        mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
        interleaved = len(scan_comps) > 1

        def dc_unit(c, byy, bxx):
            blk = coef[c["id"]]
            if ah == 0:
                size = _decode_huff_from(reader, dc_tbl[c["id"]])
                diff = _decode_coefficient(reader.read_bits(size), size)
                pred[c["id"]] += diff
                blk[byy, bxx, 0] = pred[c["id"]] << al
            elif reader.read_bit():
                blk[byy, bxx, 0] |= 1 << al

        count = 0
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    if (restart_interval and count
                            and count % restart_interval == 0):
                        next_segment()
                        pred = {c["id"]: 0 for c in scan_comps}
                    for c in scan_comps:
                        for v in range(c["v"]):
                            for u in range(c["h"]):
                                dc_unit(c, my * c["v"] + v,
                                        mx * c["h"] + u)
                    count += 1
        else:
            c = scan_comps[0]
            bh, bw = _comp_block_dims(frame, c)
            for byy in range(bh):
                for bxx in range(bw):
                    if (restart_interval and count
                            and count % restart_interval == 0):
                        next_segment()
                        pred = {c["id"]: 0}
                    dc_unit(c, byy, bxx)
                    count += 1
        return

    # AC scan: exactly one component, its own block raster order.
    if len(scan_sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cs, _, ta = scan_sel[0]
    c = by_id[cs]
    act = huff_ac[ta]
    plane = coef[cs]
    bh, bw = _comp_block_dims(frame, c)
    eobrun = 0
    p1 = 1 << al
    count = 0
    for byy in range(bh):
        for bxx in range(bw):
            if (restart_interval and count
                    and count % restart_interval == 0):
                next_segment()
                eobrun = 0
            count += 1
            blk = plane[byy, bxx]
            if ah == 0:               # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _decode_huff_from(reader, act)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:   # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run overflows band")
                    blk[k] = _decode_coefficient(
                        reader.read_bits(s), s) << al
                    k += 1
            else:                     # AC refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _decode_huff_from(reader, act)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0 and r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        if s == 0:    # ZRL: 16 zero-history positions
                            newval = 0
                        elif s == 1:
                            newval = p1 if reader.read_bit() else -p1
                        else:
                            raise ValueError(
                                "refinement magnitude must be 1")
                        # Advance over r zero-history coefficients,
                        # correcting nonzero-history ones on the way.
                        while k <= se:
                            if blk[k] != 0:
                                _refine_nonzero(blk, k, reader, p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    # Remainder of the block only carries correction
                    # bits for already-nonzero coefficients.
                    while k <= se:
                        if blk[k] != 0:
                            _refine_nonzero(blk, k, reader, p1)
                        k += 1
                    eobrun -= 1


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
    segments = _split_restart_segments(scan_bytes)

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

    return _reconstruct(frame, by_comp, qtables)


def _reconstruct(frame, by_comp: Dict[int, np.ndarray],
                 qtables) -> np.ndarray:
    """Dequantize + IDCT + upsample zigzag coefficient planes to the
    final image (shared by the baseline and progressive paths)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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
