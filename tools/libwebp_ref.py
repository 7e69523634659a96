"""cffi bindings to the system's public libwebp (reference VP8/WebP
implementation, BSD license) — TEST/FIXTURE-BUILD ORACLE ONLY.

The production decode path (operators/vp8.py, vp8l.py) is pure
Python/numpy with zero native dependencies; this module exists so tests
can (a) encode real lossy/lossless WebP blobs with the reference
encoder and (b) assert the from-scratch decoder reproduces the
reference decoder's YUV planes bit-for-bit. Everything degrades
gracefully: ``available()`` is False when cffi or the library is
missing, and every consumer skips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

LIB_PATHS = ("/usr/lib/x86_64-linux-gnu/libwebp.so.7", "libwebp.so.7",
             "libwebp.so")

_CDEF = """
size_t WebPEncodeRGB(const uint8_t* rgb, int width, int height,
                     int stride, float quality_factor, uint8_t** output);
size_t WebPEncodeRGBA(const uint8_t* rgba, int width, int height,
                      int stride, float quality_factor, uint8_t** output);
uint8_t* WebPDecodeRGBA(const uint8_t* data, size_t data_size,
                        int* width, int* height);
size_t WebPEncodeLosslessRGB(const uint8_t* rgb, int width, int height,
                             int stride, uint8_t** output);
uint8_t* WebPDecodeRGB(const uint8_t* data, size_t data_size,
                       int* width, int* height);
uint8_t* WebPDecodeYUV(const uint8_t* data, size_t data_size,
                       int* width, int* height, uint8_t** u, uint8_t** v,
                       int* stride, int* uv_stride);
void WebPFree(void* ptr);
"""

_state: Optional[tuple] = None


def _load():
    global _state
    if _state is not None:
        return _state
    try:
        import cffi
        ffi = cffi.FFI()
        ffi.cdef(_CDEF)
        lib = None
        for p in LIB_PATHS:
            try:
                lib = ffi.dlopen(p)
                break
            except OSError:
                continue
        _state = (ffi, lib)
    except ImportError:
        _state = (None, None)
    return _state


def available() -> bool:
    ffi, lib = _load()
    return lib is not None


def encode_rgb(img: np.ndarray, quality: float) -> bytes:
    """Reference lossy encode (VP8 keyframe in a WebP container)."""
    ffi, lib = _load()
    h, w, _ = img.shape
    out = ffi.new("uint8_t**")
    buf = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    n = lib.WebPEncodeRGB(ffi.from_buffer(buf), w, h, w * 3,
                          float(quality), out)
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    blob = bytes(ffi.buffer(out[0], n))
    lib.WebPFree(out[0])
    return blob


def encode_rgba(img: np.ndarray, quality: float) -> bytes:
    """Reference lossy encode of RGBA (VP8 frame + lossless-compressed
    ALPH chunk in a VP8X container)."""
    ffi, lib = _load()
    h, w, _ = img.shape
    out = ffi.new("uint8_t**")
    buf = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    n = lib.WebPEncodeRGBA(ffi.from_buffer(buf), w, h, w * 4,
                           float(quality), out)
    if n == 0:
        raise RuntimeError("libwebp RGBA encode failed")
    blob = bytes(ffi.buffer(out[0], n))
    lib.WebPFree(out[0])
    return blob


def decode_rgba(blob: bytes) -> np.ndarray:
    """Reference decode to (h, w, 4) RGBA — the alpha plane is the
    normative comparison surface for ALPH decoding (RGB is
    implementation-defined YUV conversion; compare that via YUV)."""
    ffi, lib = _load()
    wp, hp = ffi.new("int*"), ffi.new("int*")
    p = lib.WebPDecodeRGBA(ffi.from_buffer(blob), len(blob), wp, hp)
    if p == ffi.NULL:
        raise RuntimeError("libwebp RGBA decode failed")
    w, h = wp[0], hp[0]
    arr = np.frombuffer(bytes(ffi.buffer(p, w * h * 4)),
                        np.uint8).reshape(h, w, 4).copy()
    lib.WebPFree(p)
    return arr


def decode_yuv(blob: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference decode to raw YUV420 planes — the normative comparison
    surface (RGB conversion is implementation-defined)."""
    ffi, lib = _load()
    wp, hp = ffi.new("int*"), ffi.new("int*")
    up, vp = ffi.new("uint8_t**"), ffi.new("uint8_t**")
    sp, usp = ffi.new("int*"), ffi.new("int*")
    y = lib.WebPDecodeYUV(ffi.from_buffer(blob), len(blob), wp, hp,
                          up, vp, sp, usp)
    if y == ffi.NULL:
        raise RuntimeError("libwebp decode failed")
    w, h, s, us = wp[0], hp[0], sp[0], usp[0]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.frombuffer(bytes(ffi.buffer(y, s * h)),
                      np.uint8).reshape(h, s)[:, :w].copy()
    U = np.frombuffer(bytes(ffi.buffer(up[0], us * ch)),
                      np.uint8).reshape(ch, us)[:, :cw].copy()
    V = np.frombuffer(bytes(ffi.buffer(vp[0], us * ch)),
                      np.uint8).reshape(ch, us)[:, :cw].copy()
    lib.WebPFree(y)
    return Y, U, V
