"""Dependency-free media codecs (pure Python + numpy).

The container has no PIL/opencv/ffmpeg/librosa, so the multimodal
operators' decode kernels were stubbed. These parsers cover formats whose
specs are simple enough to decode with numpy alone:

- **PPM (P6)** — binary RGB, the classic uncompressed interchange format;
- **BMP** — uncompressed 24-bit bottom-up Windows bitmaps (BITMAPINFOHEADER);
- **WAV** — RIFF PCM16 mono/stereo via the stdlib ``wave`` module;
- **PNG** — gray/palette/RGB/RGBA at every legal bit depth (1/2/4/8/16),
  non-interlaced or Adam7 interlaced: stdlib ``zlib`` inflate + the five
  scanline filters;
  ``tRNS`` transparency honored for palette (-> RGBA) and grayscale
  (-> gray+alpha), matching the GIF path;
- **GIF** — 87a/89a first frame: variable-width LZW, global/local
  palettes, four-pass interlacing, GCE transparency (-> RGBA);
- **JPEG** (baseline AND progressive) lives in :mod:`.jpeg` (T.81 DCT
  codec).

Together these cover the formats a real web corpus actually contains;
WebP/AVIF/video remain the PIL/ffmpeg plug points.

They plug into ``operators/multimodal.py`` as ``decode_stub="real"`` so at
least one non-fake decode path runs end-to-end in Spark; PIL/ffmpeg slot
into the same call sites for the formats these do not cover.
"""

from __future__ import annotations

import functools
import io
import struct
import wave
import zlib
from typing import Dict, Optional, Tuple

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def truncation_boundary(fn):
    """Codec-boundary translation: a truncated/corrupt blob surfaces as
    IndexError/KeyError inside the bit-level decoders (mid-stream reads,
    Huffman/palette lookups); re-raise those as ValueError HERE so the
    corrupt-blob policy in ``multimodal._DATA_ERRORS`` can stay narrow —
    a genuine indexing bug anywhere outside a decode kernel no longer
    masquerades as bad input data under on_error='null'/'skip'."""
    @functools.wraps(fn)
    def wrapper(blob, *args, **kwargs):
        try:
            return fn(blob, *args, **kwargs)
        except (IndexError, KeyError) as exc:
            raise ValueError(
                f"truncated or corrupt stream in {fn.__name__}: "
                f"{exc!r}") from exc
    return wrapper


def sniff_media_format(blob: bytes) -> str:
    """'ppm'|'bmp'|'wav'|'webp'|'png'|'jpeg'|'gif'|'webm'|'unknown'
    from magic bytes (WebP and WAV are both RIFF; the form type at
    offset 8 disambiguates; WebM/Matroska is the EBML magic)."""
    if blob[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        return "webp"
    if blob[:8] == _PNG_SIG:
        return "png"
    if blob[:3] == b"\xFF\xD8\xFF":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def _ppm_read_token(blob: bytes, pos: int) -> Tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comment lines."""
    n = len(blob)
    while pos < n:
        c = blob[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and blob[pos:pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and not blob[pos:pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return blob[start:pos], pos


@truncation_boundary
def decode_ppm(blob: bytes) -> np.ndarray:
    """P6 binary PPM -> (height, width, 3) uint8 array."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    width_b, pos = _ppm_read_token(blob, pos)
    height_b, pos = _ppm_read_token(blob, pos)
    maxval_b, pos = _ppm_read_token(blob, pos)
    width, height, maxval = int(width_b), int(height_b), int(maxval_b)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval, per spec
    need = width * height * 3
    data = blob[pos:pos + need]
    if len(data) != need:
        raise ValueError(f"PPM payload truncated: {len(data)} < {need}")
    return np.frombuffer(data, dtype=np.uint8).reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 -> P6 bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) array")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

@truncation_boundary
def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (height, width, 3) uint8 RGB array.

    Rows are 4-byte aligned and stored bottom-up (positive height) per the
    format; pixels are BGR on disk."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    header_size = struct.unpack_from("<I", blob, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMPs supported "
                         f"(bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, :width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    payload = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(payload), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload),
                       2835, 2835, 0, 0)
    return header + info + payload


# ---------------------------------------------------------------------------
# PNG (8-bit gray/palette/RGB/RGBA, non-interlaced or Adam7)
# ---------------------------------------------------------------------------
# Spec: https://www.w3.org/TR/png-3/ — signature, length-type-data-crc
# chunks, zlib-deflated scanlines each prefixed by one filter byte.

#: color type -> samples per pixel (8-bit depth => bytes per pixel).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2).
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, rp: int, height: int, stride: int,
                  bpp: int) -> Tuple[np.ndarray, int]:
    """Reconstruct ``height`` filtered scanlines starting at ``raw[rp]``;
    returns ((height, stride) uint8, next offset). ``bpp`` is the filter
    step in BYTES (max(1, channels*depth//8) per the spec — filtering is
    byte-wise at every bit depth). Filters none/up/sub are vectorized;
    average/paeth are per-byte (inherently sequential)."""
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        if rp >= len(raw):
            raise ValueError("PNG scanline payload truncated")
        f = raw[rp]
        row = np.frombuffer(raw, np.uint8, stride, rp + 1)
        rp += stride + 1
        if f == 0:          # None
            recon = row.copy()
        elif f == 1:        # Sub: recon[i] = row[i] + recon[i-bpp]
            # uint8 cumsum wraps mod 256 — exactly the spec arithmetic.
            recon = np.cumsum(row.reshape(-1, bpp), axis=0,
                              dtype=np.uint8).reshape(stride)
        elif f == 2:        # Up
            recon = row + prev
        elif f == 3:        # Average
            recon = row.copy()
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                recon[i] = (int(row[i])
                            + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:        # Paeth
            recon = row.copy()
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                recon[i] = (int(row[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = recon
        prev = recon
    return out, rp


@truncation_boundary
def decode_png(blob: bytes) -> np.ndarray:
    """PNG (every legal bit depth, non-interlaced or Adam7) -> uint8.

    Returns (h, w) for grayscale, (h, w, 3) for RGB/palette, (h, w, 2)
    for gray+alpha (incl. grayscale+tRNS), (h, w, 4) for RGBA (incl.
    palette+tRNS and truecolor+tRNS — the RGB-key transparency path,
    matched exactly in the source bit depth before the 8-bit downscale).
    Bit depths: 1/2/4/8/16 for grayscale, 1/2/4/8 for
    palette, 8/16 for the multi-channel types (the spec's full matrix);
    sub-byte samples are unpacked big-endian-first and grayscale is
    rescaled to 8-bit (0..255), 16-bit samples keep their high byte
    (the output API is uint8). Adam7 interlacing reconstructs each of
    the seven passes independently (per-pass filtering and per-pass
    byte packing per the spec) and scatters them onto the pass grid."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, palette = 8, [], None
    trns = None
    width = height = color_type = None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
            valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16),
                            3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
            if bit_depth not in valid_depths.get(color_type, ()):
                raise ValueError(
                    f"illegal PNG bit depth {bit_depth} for color type "
                    f"{color_type}")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * bit_depth // 8)
    # tRNS matching is an EXACT sample comparison per the spec, so when a
    # 16-bit image carries tRNS the full 16-bit samples must survive to
    # the compare — the high-byte downscale (uint8 output API) happens
    # only AFTER the alpha mask is computed (ADVICE r4: high-byte-only
    # matching wrongly keyed pixels differing in the low byte).
    keep16 = (bit_depth == 16 and trns is not None
              and color_type in (0, 2))

    def pass_stride(w: int) -> int:
        return -(-w * channels * bit_depth // 8)

    def rows_to_pixels(rows: np.ndarray, w: int) -> np.ndarray:
        """Packed unfiltered scanlines -> (rows, w, channels) uint8
        (uint16 full samples when a 16-bit tRNS compare is pending)."""
        hh = rows.shape[0]
        if bit_depth == 8:
            return rows[:, :w * channels].reshape(hh, w, channels)
        if bit_depth == 16:
            if keep16:
                be = rows.reshape(hh, -1, 2)[:, :w * channels, :] \
                    .astype(np.uint16)
                return ((be[:, :, 0] << 8) | be[:, :, 1]) \
                    .reshape(hh, w, channels)
            # Big-endian samples; keep the high byte (uint8 output API).
            return rows.reshape(hh, -1, 2)[:, :w * channels, 0] \
                .reshape(hh, w, channels)
        bits = np.unpackbits(rows, axis=1)[:, :w * bit_depth]
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        samples = (bits.reshape(hh, w, bit_depth) * weights) \
            .sum(axis=2).astype(np.uint8)
        if color_type == 0:
            # d-bit gray -> full 8-bit range (255 divisible by 1/3/15).
            samples *= 255 // ((1 << bit_depth) - 1)
        return samples[:, :, None]

    if interlace == 0:
        stride = pass_stride(width)
        if len(raw) != (stride + 1) * height:
            raise ValueError(f"PNG scanline payload {len(raw)} != "
                             f"{(stride + 1) * height}")
        rows, _ = _png_unfilter(raw, 0, height, stride, bpp)
        img = rows_to_pixels(rows, width)
    else:
        # Adam7: seven independently-filtered sub-images scattered onto
        # the pass grid (empty passes contribute no bytes; each pass
        # packs its own scanlines, so sub-byte depths re-pad per pass).
        img = np.zeros((height, width, channels),
                       np.uint16 if keep16 else np.uint8)
        rp = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            sub, rp = _png_unfilter(raw, rp, ph, pass_stride(pw), bpp)
            img[y0::dy, x0::dx] = rows_to_pixels(sub, pw)
        if rp != len(raw):
            raise ValueError(
                f"PNG interlaced payload mismatch: {len(raw)} != {rp}")
    if color_type == 3:
        idx = img[:, :, 0]
        rgb = palette[idx]            # (h, w) indexes -> (h, w, 3)
        if trns is None:
            return rgb
        # tRNS carries one alpha byte per palette entry (trailing
        # entries are opaque) -> RGBA, mirroring the GIF GCE path.
        pal_alpha = np.full(len(palette), 255, np.uint8)
        pal_alpha[:min(len(trns), len(palette))] = \
            np.frombuffer(trns[:len(palette)], np.uint8)
        return np.dstack([rgb, pal_alpha[idx]])
    if channels == 1:
        gray = img[:, :, 0]
        if trns is not None:
            # Grayscale tRNS: one sample value, compared EXACTLY in the
            # source bit depth (full 16-bit samples at depth 16 — kept
            # via keep16 — rescaled at sub-byte depths), then the pixels
            # downscale to the uint8 output API.
            (gray_level,) = struct.unpack(">H", trns[:2])
            if bit_depth == 16:
                alpha = np.where(gray == gray_level, 0, 255) \
                    .astype(np.uint8)
                gray = (gray >> 8).astype(np.uint8)
            else:
                if bit_depth == 8:
                    level = gray_level & 0xFF
                else:
                    level = (gray_level & ((1 << bit_depth) - 1)) \
                        * (255 // ((1 << bit_depth) - 1))
                alpha = np.where(gray == level, 0, 255).astype(np.uint8)
            return np.dstack([gray, alpha])
        return gray
    if color_type == 2 and trns is not None:
        # Truecolor tRNS: a 3x16-bit RGB key; pixels equal to the key in
        # ALL three samples become fully transparent -> RGBA (previously
        # silently ignored, returning an opaque image — ADVICE r4).
        r_key, g_key, b_key = struct.unpack(">HHH", trns[:6])
        if bit_depth == 16:
            key = np.array([r_key, g_key, b_key], np.uint16)
            alpha = np.where((img == key).all(axis=2), 0, 255) \
                .astype(np.uint8)
            img = (img >> 8).astype(np.uint8)
        else:
            key = np.array([r_key & 0xFF, g_key & 0xFF, b_key & 0xFF],
                           np.uint8)
            alpha = np.where((img == key).all(axis=2), 0, 255) \
                .astype(np.uint8)
        return np.dstack([img, alpha])
    return img


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, {1,2,3,4}) -> 8-bit non-interlaced PNG.

    Filter strategy: Up for every scanline after the first (cheap to
    apply vectorized, compresses smooth synthetic content well), None
    for row 0 — decoders must accept any per-row mix."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError("expected (h, w) or (h, w, {1,2,3,4}) uint8 array")
    h, w, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = arr.reshape(h, w * channels)
    filtered = bytearray()
    for y in range(h):
        if y == 0:
            filtered += b"\x00" + flat[0].tobytes()
        else:
            filtered += b"\x02" + (flat[y] - flat[y - 1]).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# WAV (RIFF): PCM 8/16/24/32, IEEE float 32/64, G.711 A-law / mu-law,
# WAVE_FORMAT_EXTENSIBLE — the sample codings a web corpus's WAVs carry.
# From the public specs: RIFF/WAVE (Multimedia Programming Interface and
# Data Specification 1.0) and ITU-T G.711 (A-law / mu-law companding).
# ---------------------------------------------------------------------------

#: RIFF fmt-chunk codes (WAVE spec registry).
_WAVE_FMT_PCM = 0x0001
_WAVE_FMT_FLOAT = 0x0003
_WAVE_FMT_ALAW = 0x0006
_WAVE_FMT_ULAW = 0x0007
_WAVE_FMT_EXTENSIBLE = 0xFFFE


@functools.lru_cache(maxsize=1)
def _g711_tables() -> Tuple[np.ndarray, np.ndarray]:
    """(ulaw_table, alaw_table): the 256 linear reconstruction levels of
    each G.711 coding, int32, index = wire byte.

    Built from the ITU-T G.711 segment structure rather than transcribed,
    on the conventional 16-bit linear scale: mu-law bytes are
    ones-complemented on the wire; |x| decodes as
    ((mantissa<<3) + 0x84) << exponent, minus the 0x84 bias (so byte
    0xFF is 0 and the loudest code is 32124). A-law bytes are XORed
    with 0x55 (alternate-bit inversion); segment 0 decodes as
    (mantissa<<4)+8, segments 1-7 as ((mantissa<<4)+0x108) << (e-1)
    (quietest codes are +/-8, loudest 32256)."""
    b = np.arange(256, dtype=np.int64)

    u = (~b) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    ulaw = np.where(u & 0x80, -mag, mag)

    a = b ^ 0x55
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    alaw = np.where(a & 0x80, mag, -mag)
    return ulaw.astype(np.int32), alaw.astype(np.int32)


@functools.lru_cache(maxsize=2)
def _g711_encode_lut(law: str) -> Tuple[np.ndarray, np.ndarray]:
    """(sorted reconstruction levels, wire byte per level) for nearest-
    level companding: the encoder quantizes each sample to the closest
    of the decoder's 256 reconstruction levels, which makes
    decode(encode(level)) == level by construction — the optimal
    quantizer for the coding, with no dependence on the spec's
    encoder-side segment-search conventions."""
    table = _g711_tables()[0 if law == "ulaw" else 1]
    order = np.argsort(table, kind="stable")
    return table[order].astype(np.float64), order.astype(np.uint8)


def _nearest_level(x: np.ndarray, levels: np.ndarray,
                   codes: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(levels, x)
    idx = np.clip(idx, 1, len(levels) - 1)
    left = levels[idx - 1]
    right = levels[idx]
    pick = np.where((x - left) <= (right - x), idx - 1, idx)
    return codes[pick]


def _iter_riff_chunks(blob: bytes):
    """Yield (fourcc, payload) for each top-level RIFF sub-chunk,
    honoring the spec's 2-byte alignment (odd-sized chunks carry a pad
    byte that is not part of the payload)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    end = min(len(blob), 8 + struct.unpack_from("<I", blob, 4)[0])
    while pos + 8 <= end:
        fourcc = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        payload = blob[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated RIFF chunk {fourcc!r}")
        yield fourcc, payload
        pos += 8 + size + (size & 1)


@truncation_boundary
def decode_wav(blob: bytes) -> Tuple[np.ndarray, int]:
    """WAV -> ((n_samples, n_channels) float64 in [-1, 1], rate).

    Sample codings: PCM 8-bit (unsigned) / 16 / 24 / 32-bit (signed LE),
    IEEE float 32/64, ITU-T G.711 A-law and mu-law, each plain or
    wrapped in WAVE_FORMAT_EXTENSIBLE (whose SubFormat GUID leads with
    the equivalent 16-bit code per the spec)."""
    fmt = None
    data = None
    for fourcc, payload in _iter_riff_chunks(blob):
        if fourcc == b"fmt " and fmt is None:
            fmt = payload
        elif fourcc == b"data" and data is None:
            data = payload
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk too short")
    (code, channels, rate, _byterate, _align,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if code == _WAVE_FMT_EXTENSIBLE:
        # fmt ext: cbSize(H) validBits(H) channelMask(I) SubFormat(16B);
        # SubFormat's first two bytes are the base format code.
        if len(fmt) < 26:
            raise ValueError("extensible WAV fmt chunk too short")
        code = struct.unpack_from("<H", fmt, 24)[0]
    if channels < 1:
        raise ValueError("WAV with zero channels")

    if code == _WAVE_FMT_PCM and bits == 16:
        out = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif code == _WAVE_FMT_PCM and bits == 8:
        out = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    elif code == _WAVE_FMT_PCM and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int64)
        val = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        out = val.astype(np.float64) / float(1 << 23)
    elif code == _WAVE_FMT_PCM and bits == 32:
        out = (np.frombuffer(data, dtype="<i4").astype(np.float64)
               / float(1 << 31))
    elif code == _WAVE_FMT_FLOAT and bits == 32:
        out = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif code == _WAVE_FMT_FLOAT and bits == 64:
        out = np.frombuffer(data, dtype="<f8").astype(np.float64)
    elif code in (_WAVE_FMT_ALAW, _WAVE_FMT_ULAW):
        if bits not in (0, 8):
            raise ValueError(f"G.711 WAV with {bits}-bit samples")
        ulaw_t, alaw_t = _g711_tables()
        table = ulaw_t if code == _WAVE_FMT_ULAW else alaw_t
        out = (table[np.frombuffer(data, dtype=np.uint8)]
               .astype(np.float64) / 32768.0)
    else:
        raise ValueError(
            f"unsupported WAV coding: format=0x{code:04x} bits={bits}")
    n = len(out) - len(out) % channels
    return out[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) float64 in [-1, 1] -> PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    # Symmetric 32768 scale on both sides: round-trip error is bounded by
    # half an LSB (0.5/32768); +1.0 clips to the int16 max.
    pcm = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_wav_fmt(samples: np.ndarray, rate: int, coding: str = "pcm16",
                   *, extensible: bool = False) -> bytes:
    """(n_samples, n_channels) float64 in [-1, 1] -> WAV bytes in any
    coding :func:`decode_wav` reads: ``pcm8``/``pcm16``/``pcm24``/
    ``pcm32``/``float32``/``float64``/``alaw``/``ulaw``.

    G.711 encoding quantizes to the decoder's nearest reconstruction
    level (see :func:`_g711_encode_lut`), so law round-trips are
    idempotent after one pass. ``extensible=True`` wraps the fmt chunk
    in WAVE_FORMAT_EXTENSIBLE with the coding's GUID (spec-defined
    ``{code}-0000-0010-8000-00AA00389B71`` media subtype base)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    flat = x.reshape(-1)
    if coding == "pcm16":
        code, bits = _WAVE_FMT_PCM, 16
        data = np.clip(np.round(flat * 32768.0), -32768,
                       32767).astype("<i2").tobytes()
    elif coding == "pcm8":
        code, bits = _WAVE_FMT_PCM, 8
        data = np.clip(np.round(flat * 128.0) + 128, 0,
                       255).astype(np.uint8).tobytes()
    elif coding == "pcm24":
        code, bits = _WAVE_FMT_PCM, 24
        v = np.clip(np.round(flat * float(1 << 23)), -(1 << 23),
                    (1 << 23) - 1).astype(np.int64) & 0xFFFFFF
        b3 = np.empty((len(v), 3), dtype=np.uint8)
        b3[:, 0] = v & 0xFF
        b3[:, 1] = (v >> 8) & 0xFF
        b3[:, 2] = (v >> 16) & 0xFF
        data = b3.tobytes()
    elif coding == "pcm32":
        code, bits = _WAVE_FMT_PCM, 32
        data = np.clip(np.round(flat * float(1 << 31)), -(1 << 31),
                       (1 << 31) - 1).astype("<i4").tobytes()
    elif coding == "float32":
        code, bits = _WAVE_FMT_FLOAT, 32
        data = flat.astype("<f4").tobytes()
    elif coding == "float64":
        code, bits = _WAVE_FMT_FLOAT, 64
        data = flat.astype("<f8").tobytes()
    elif coding in ("alaw", "ulaw"):
        code = _WAVE_FMT_ULAW if coding == "ulaw" else _WAVE_FMT_ALAW
        bits = 8
        levels, codes = _g711_encode_lut(coding)
        data = _nearest_level(flat * 32768.0, levels, codes).tobytes()
    else:
        raise ValueError(f"unknown WAV coding {coding!r}")

    channels = x.shape[1]
    align = channels * bits // 8
    if extensible:
        sub = struct.pack("<H", code) + bytes.fromhex(
            "0000000000108000 00aa00389b71".replace(" ", ""))
        fmt = struct.pack("<HHIIHH", _WAVE_FMT_EXTENSIBLE, channels, rate,
                          rate * align, align, bits)
        fmt += struct.pack("<HHI", 22, bits, 0) + sub
    else:
        fmt = struct.pack("<HHIIHH", code, channels, rate,
                          rate * align, align, bits)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (fourcc + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Feature kernels over decoded media (shared by multimodal operators)
# ---------------------------------------------------------------------------

def image_features(pixels: np.ndarray) -> Tuple[int, int, int, float, int]:
    """(width, height, n_channels, mean_luma, phash) from a decoded image.

    mean_luma: Rec.601 luma mean normalized to [0, 1]. phash: 64-bit
    average hash — luma block-averaged to 8x8, bit j set when cell j
    exceeds the 8x8 mean (row-major), folded into a signed int64."""
    h, w = pixels.shape[:2]
    channels = 1 if pixels.ndim == 2 else pixels.shape[2]
    if channels >= 3:
        luma = (0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1]
                + 0.114 * pixels[:, :, 2])
    elif pixels.ndim == 3:
        # 1-2 channels (gray / gray+alpha): luma is the gray channel.
        luma = pixels[:, :, 0].astype(np.float64)
    else:
        luma = pixels.astype(np.float64)
    # Block-average to 8x8 with edge-padded boundaries (no resampler dep).
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            block = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).reshape(-1)
    phash = 0
    for j, b in enumerate(bits):
        if b:
            phash |= (1 << j)
    if phash >= (1 << 63):
        phash -= (1 << 64)
    return w, h, channels, float(luma.mean() / 255.0), phash


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (deterministic, dependency-free)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return pixels[yi][:, xi]


def audio_features(samples: np.ndarray, rate: int
                   ) -> Tuple[int, int, float, int]:
    """(duration_ms, sample_rate, rms, fingerprint) from decoded PCM.

    Fingerprint: sign bits of 64 equal-width window-mean diffs of the mono
    mix — a shift-tolerant 64-bit acoustic sketch."""
    mono = samples.mean(axis=1)
    n = len(mono)
    duration_ms = int(round(n * 1000.0 / rate))
    rms = float(np.sqrt((mono * mono).mean())) if n else 0.0
    edges = (np.arange(66) * n) // 65
    means = np.array([
        mono[edges[i]:max(edges[i + 1], edges[i] + 1)].mean() if n else 0.0
        for i in range(65)])
    bits = means[1:] > means[:-1]
    fp = 0
    for j, b in enumerate(bits):
        if b:
            fp |= (1 << j)
    if fp >= (1 << 63):
        fp -= (1 << 64)
    return duration_ms, rate, rms, fp


# ---------------------------------------------------------------------------
# GIF (87a/89a, first frame)
# ---------------------------------------------------------------------------
# Spec: GIF89a specification (CompuServe, public). LZW with variable code
# width (3..12 bits), global/local palettes, interlacing, GCE transparency.

def _gif_deinterlace_order(height: int) -> list:
    """Row order of the four GIF interlace passes."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavoured LZW: variable width, CLEAR/EOI codes, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = next_code = 0
    reset()
    acc = nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits        # GIF packs codes LSB-first
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                if next_code < 4096:
                    table.append(prev + entry[:1])
                    next_code += 1
            elif code == next_code and next_code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out += entry
            prev = entry
            if (next_code == (1 << width) and width < 12):
                width += 1
            if len(out) >= expected:
                return bytes(out)
    return bytes(out)


@truncation_boundary
def decode_gif(blob: bytes) -> np.ndarray:
    """First frame of a GIF -> uint8 (h, w, 3), or (h, w, 4) when the
    frame's graphic-control extension declares a transparent index."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(blob, np.uint8, 3 * n, pos
                                   ).reshape(n, 3)
        pos += 3 * n
    transparent: Optional[int] = None
    while pos < len(blob):
        tag = blob[pos]
        pos += 1
        if tag == 0x3B:              # trailer
            break
        if tag == 0x21:              # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:        # graphic control
                size = blob[pos]
                flags = blob[pos + 1]
                if flags & 0x01:
                    transparent = blob[pos + 4]
                pos += size + 1
            while blob[pos] != 0:    # skip (remaining) sub-blocks
                pos += blob[pos] + 1
            pos += 1
            continue
        if tag != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{tag:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = blob[pos]
        pos += 1
        chunks = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            chunks += blob[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(chunks), min_code, w * h), np.uint8,
            w * h).reshape(h, w)
        if ipacked & 0x40:           # interlaced: rows arrive in 4 passes
            rows = np.empty((h, w), np.uint8)
            rows[_gif_deinterlace_order(h)] = idx
            idx = rows
        rgb = pal[idx]
        if transparent is None:
            return rgb
        alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha])
    raise ValueError("GIF contains no image frame")


def _lzw_encode(data: bytes, min_code: int) -> bytearray:
    """GIF LZW encode (greedy longest-match with a dict of byte strings);
    returns the packed code stream (caller wraps it in 255-byte
    sub-blocks)."""
    clear = 1 << min_code
    eoi = clear + 1
    acc = nbits = 0
    out_bits = bytearray()

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: Dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    put(clear, width)
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([b])
    if cur:
        put(table[cur], width)
    put(eoi, width)
    if nbits:
        out_bits.append(acc & 0xFF)
    return out_bits


def encode_gif(pixels: np.ndarray, *, interlace: bool = False,
               transparent: Optional[int] = None) -> bytes:
    """uint8 (h, w, 3) with <=256 distinct colors -> single-frame GIF89a.

    Exact (palette) round-trip; raises if the image needs more than 256
    palette entries. ``interlace`` writes the four-pass row order (the
    decoder's deinterlace path); ``transparent`` marks a palette INDEX
    as transparent via a GCE."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} colors exceed the GIF palette")
    pal_bits = max(1, int(len(pal) - 1).bit_length())
    pal_n = 1 << pal_bits
    palette = np.zeros((pal_n, 3), np.uint8)
    palette[:len(pal)] = pal
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_gif_deinterlace_order(h)]

    min_code = max(2, pal_bits)
    out_bits = _lzw_encode(idx.tobytes(), min_code)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0x00)
    out += bytes([min_code])
    for i in range(0, len(out_bits), 255):
        chunk = out_bits[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def encode_gif_animation(frames, delays_ms) -> bytes:
    """uint8 (h, w, 3) frames (shared <=256-color palette across all
    frames) + per-frame delays in ms -> animated GIF89a.

    Full-canvas frames with disposal=1 (leave in place) and a per-frame
    graphic-control extension carrying the delay (centisecond
    resolution, floor). Exists chiefly to prove
    :func:`decode_gif_frames` and the real video-frame sampling path."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames or len(frames) != len(delays_ms):
        raise ValueError("need >= 1 frame and one delay per frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must be (h, w, 3) and same size")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} colors exceed the GIF palette")
    pal_bits = max(1, int(len(pal) - 1).bit_length())
    pal_n = 1 << pal_bits
    palette = np.zeros((pal_n, 3), np.uint8)
    palette[:len(pal)] = pal
    idx_all = inverse.astype(np.uint8).reshape(len(frames), h, w)

    min_code = max(2, pal_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.tobytes()
    for idx, delay in zip(idx_all, delays_ms):
        # GCE: disposal=1 (<<2), no transparency; delay in centiseconds.
        out += bytes([0x21, 0xF9, 4, 0x04])
        out += struct.pack("<H", max(0, int(delay) // 10))
        out += bytes([0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x00)
        out += bytes([min_code])
        bits = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(bits), 255):
            chunk = bits[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


@truncation_boundary
def decode_gif_frames(blob: bytes) -> Tuple[list, list]:
    """Animated GIF -> (frames, delays_ms): each frame is the COMPOSED
    (sh, sw, 4) RGBA canvas at that point of the animation (sub-rect
    placement, transparency, and disposal methods 0-3 per GIF89a),
    delays from each frame's graphic-control extension in ms.

    This is the dependency-free "video" decode path: animated GIFs are
    the one moving-picture format a web corpus carries that needs no
    ffmpeg; real containers plug in at the same call site."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(blob, np.uint8, 3 * n, pos
                                   ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 4), np.uint8)
    frames: list = []
    delays: list = []
    transparent: Optional[int] = None
    disposal = 0
    delay_cs = 0
    while pos < len(blob):
        tag = blob[pos]
        pos += 1
        if tag == 0x3B:              # trailer
            break
        if tag == 0x21:              # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:        # graphic control
                size = blob[pos]
                flags = blob[pos + 1]
                disposal = (flags >> 2) & 0x07
                (delay_cs,) = struct.unpack_from("<H", blob, pos + 2)
                transparent = blob[pos + 4] if flags & 0x01 else None
                pos += size + 1
            while blob[pos] != 0:    # skip (remaining) sub-blocks
                pos += blob[pos] + 1
            pos += 1
            continue
        if tag != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{tag:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = blob[pos]
        pos += 1
        chunks = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            chunks += blob[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(chunks), min_code, w * h), np.uint8,
            w * h).reshape(h, w)
        if ipacked & 0x40:
            rows = np.empty((h, w), np.uint8)
            rows[_gif_deinterlace_order(h)] = idx
            idx = rows
        # Clip the frame rect to the logical screen.
        ch = min(h, sh - top)
        cw = min(w, sw - left)
        if ch <= 0 or cw <= 0:
            frames.append(canvas.copy())
            delays.append(delay_cs * 10)
            disposal, transparent, delay_cs = 0, None, 0
            continue
        before = canvas[top:top + ch, left:left + cw].copy() \
            if disposal == 3 else None
        sub = idx[:ch, :cw]
        rgba = np.dstack([pal[sub], np.full((ch, cw), 255, np.uint8)])
        if transparent is not None:
            opaque = sub != transparent
            region = canvas[top:top + ch, left:left + cw]
            region[opaque] = rgba[opaque]
        else:
            canvas[top:top + ch, left:left + cw] = rgba
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:            # restore to background = transparent
            canvas[top:top + ch, left:left + cw] = 0
        elif disposal == 3 and before is not None:
            canvas[top:top + ch, left:left + cw] = before
        disposal, transparent, delay_cs = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames, delays
