"""WebP VP8L codec tests (round-5 addition).

Spec-conformance of the decoder against independently hand-assembled
bitstreams lives in test_conformance.py / the `media_conformance`
oracle row; this file covers the encoder round-trip contract, the RIFF
container walk, error classification, and the Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_spark.operators.vp8l import (
    _prefix_decode, _prefix_encode, _BitReader, _BitWriter, decode_vp8l,
    decode_webp, encode_vp8l)


def _roundtrip(img: np.ndarray) -> np.ndarray:
    return decode_webp(encode_vp8l(img))


def _expected(img: np.ndarray) -> np.ndarray:
    exp = img if img.ndim == 3 else np.dstack([img, img, img])
    if exp.shape[2] == 4 and (exp[:, :, 3] == 255).all():
        exp = exp[:, :, :3]  # all-opaque RGBA decodes as RGB
    return exp


@pytest.mark.parametrize("shape,kind", [
    ((1, 1), "gray"), ((8, 8), "gray"), ((11, 7, 3), "rgb"),
    ((9, 31, 4), "rgba"), ((3, 300), "gray"), ((20, 30, 3), "rgb"),
])
def test_roundtrip_exact(shape, kind):
    rng = np.random.default_rng(hash((shape, kind)) % 2**32)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    out = _roundtrip(img)
    exp = _expected(img)
    assert out.shape == exp.shape and (out == exp).all()


def test_flat_images_compress_via_lz77():
    img = np.full((64, 64, 3), (10, 200, 30), np.uint8)
    blob = encode_vp8l(img)
    assert len(blob) < 100  # 12k pixels -> one literal + runs
    assert (_roundtrip(img) == img).all()


def test_alpha_channel_selects_output_shape():
    rgb = np.random.default_rng(0).integers(0, 256, (5, 6, 3)) \
        .astype(np.uint8)
    opaque = np.dstack([rgb, np.full((5, 6), 255, np.uint8)])
    assert _roundtrip(opaque).shape == (5, 6, 3)
    holed = opaque.copy()
    holed[2, 3, 3] = 0
    out = _roundtrip(holed)
    assert out.shape == (5, 6, 4) and out[2, 3, 3] == 0


def test_prefix_value_coding_roundtrip():
    for v in range(1, 4097):
        p, payload, nbits = _prefix_encode(v)
        assert 0 <= p < 40 or v > 1024  # length prefixes stay in range
        bw = _BitWriter()
        bw.write(payload, nbits)
        br = _BitReader(bw.bytes() + b"\x00")
        assert _prefix_decode(p, br) == v


def test_container_walk_skips_leading_chunks():
    """VP8X-style extended container: VP8L found after other chunks."""
    inner = encode_vp8l(np.full((3, 3), 7, np.uint8))
    vp8l_chunk = inner[12:]
    meta = b"XMP " + struct.pack("<I", 5) + b"hello\x00"  # odd => pad
    payload = b"WEBP" + meta + vp8l_chunk
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    assert (decode_webp(blob) == 7).all()


def test_error_classification():
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_vp8l(b"\x30\x00\x00")  # wrong signature byte
    good = encode_vp8l(np.full((4, 4), 9, np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:20])  # truncated mid-stream
    # Lossy VP8 decodes natively since r6; an EMPTY VP8 payload is a
    # data error (truncated frame), not a missing feature.
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(lossy)


def test_sniff_and_real_decode_path():
    from json_time_series_extractor_spark.operators.codecs import (
        sniff_media_format)
    from json_time_series_extractor_spark.operators.multimodal import (
        _real_decode_pixels)

    img = np.random.default_rng(1).integers(0, 256, (6, 9, 3)) \
        .astype(np.uint8)
    blob = encode_vp8l(img)
    assert sniff_media_format(blob) == "webp"
    fmt, px = _real_decode_pixels(blob)
    assert fmt == "webp" and (px == img).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2 ** 32 - 1),
       st.sampled_from([1, 3, 4]), st.integers(2, 256))
def test_roundtrip_property(w, h, seed, channels, n_colors):
    """Any palette-limited random image round-trips exactly (limited
    palettes exercise the run/LZ77 branch; full-range the literal one)."""
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (n_colors, channels))
    img = colors[rng.integers(0, n_colors, (h, w))].astype(np.uint8)
    if channels == 1:
        img = img[:, :, 0]
    out = _roundtrip(img)
    exp = _expected(img)
    assert out.shape == exp.shape and (out == exp).all()


def test_real_resize_roundtrips_webp(spark):
    from json_time_series_extractor_spark.operators.multimodal import (
        resize_images)

    img = np.random.default_rng(2).integers(0, 256, (12, 10, 3)) \
        .astype(np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_vp8l(img)))],
                               "media_id long, media binary")
    row = resize_images(df, 5, 6, decode_stub="real").collect()[0]
    assert (row["width"], row["height"]) == (5, 6)
    out = decode_webp(bytes(row["media"]))
    assert out.shape == (6, 5, 3)  # still lossless WebP after resize