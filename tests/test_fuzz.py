"""Property-based fuzzing of the extraction core (hypothesis).

Invariants asserted over random JSON documents and option combinations:
determinism, raw-text byte identity, value-kind/type agreement, DFS order,
depth capping, and batch-operator/core agreement.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_spark.core.extractor import (
    TimestampSource,
    get_samples,
)
from json_time_series_extractor_spark.core.options import ExtractorOptions

# JSON strategy: keys avoid '/' '~' escaping corner cases in half the runs
# and exercise them in the other half.
_keys = st.one_of(
    st.text(alphabet="abcxyz_09", min_size=1, max_size=6),
    st.sampled_from(["a/b", "a~b", "~0", "~1", "", " ", "0", "1"]),
)
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=12),
)
_json = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_keys, children, max_size=4)),
    max_leaves=20,
)
_docs = st.dictionaries(_keys, _json, max_size=5)
_opts = st.builds(
    ExtractorOptions,
    recursive=st.booleans(),
    max_depth=st.integers(min_value=1, max_value=4),
    allow_nested_timestamps=st.booleans(),
    include_array_indexes_in_sample_keys=st.booleans(),
)


def _fixed_fallback(opts: ExtractorOptions) -> ExtractorOptions:
    from datetime import datetime, timezone

    opts.get_default_timestamp = (
        lambda: datetime(2024, 1, 1, tzinfo=timezone.utc))
    return opts


@settings(max_examples=150, deadline=None)
@given(doc=_docs, opts=_opts)
def test_extraction_invariants(doc, opts):
    text = json.dumps(doc)
    opts = _fixed_fallback(opts)
    samples = list(get_samples(text, opts))

    # Determinism: a second run produces the identical sample list.
    assert samples == list(get_samples(text, opts))

    for s in samples:
        # Tagged-union agreement between value_kind and the Python type.
        v = s.value
        if s.value_kind == 0:
            assert v is None
        elif s.value_kind == 1:
            assert isinstance(v, float) and not isinstance(v, bool)
        elif s.value_kind == 2:
            assert isinstance(v, str)
        elif s.value_kind == 3:
            assert isinstance(v, bool)
        else:
            # Container: raw text is an exact substring of the input and
            # itself parses to an equal JSON value.
            assert isinstance(v, str) and v in text
            json.loads(v)
        # The fixed fallback is used whenever the doc lacks /time.
        if "time" not in doc:
            assert s.timestamp_source == TimestampSource.FALLBACK_PROVIDER

    if not opts.recursive:
        # Non-recursive mode: one sample per non-timestamp top-level key
        # (default template = local name, never a path separator needed).
        expected = [k for k in doc if k != "time"]
        assert [s.key for s in samples] == expected


@settings(max_examples=80, deadline=None)
@given(doc=_docs)
def test_depth_cap_bounds_pointer_depth(doc):
    opts = _fixed_fallback(ExtractorOptions(recursive=True, max_depth=2))
    for s in list(get_samples(json.dumps(doc), opts)):
        # Keys use the default {$prop} template -> escaped pointer with
        # '/' separators; depth cap 2 allows at most 2 segments.
        assert s.key.count("/") <= 1 + _extra_slashes(doc, s)


def _extra_slashes(doc, sample) -> int:
    # Keys containing literal '/' are escaped as ~1 by the pointer
    # renderer, so they never add segments; nothing extra to allow.
    return 0


@settings(max_examples=60, deadline=None)
@given(doc=_docs)
def test_batch_operator_matches_core(doc):
    """process_batch (the Spark operator kernel) agrees with the core."""
    import pandas as pd

    from json_time_series_extractor_spark.operators.extract import (
        process_batch,
    )

    text = json.dumps(doc)
    opts = ExtractorOptions(recursive=True, max_depth=3)
    pdf = pd.DataFrame({
        "url": ["u"],
        "warc_ts": pd.Series([1_700_000_000_000_000],
                             dtype="datetime64[us]"),
        "text": [text],
    })
    out = process_batch(pdf, opts)

    from datetime import datetime, timezone

    core_opts = ExtractorOptions(recursive=True, max_depth=3)
    core_opts.get_default_timestamp = (
        lambda: datetime.fromtimestamp(1_700_000_000, tz=timezone.utc))
    core = list(get_samples(text, core_opts))
    assert len(out) == len(core)
    assert list(out["series_key"]) == [s.key for s in core]
    assert list(out["value_kind"]) == [s.value_kind for s in core]


# ---------------------------------------------------------------------------
# Codec round-trips (pure numpy, Spark-free)
# ---------------------------------------------------------------------------

@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_image_codecs_roundtrip_any_shape(w, h, seed):
    """PPM and BMP encode->decode are identity for every (w, h) shape —
    including widths whose BMP rows need 4-byte stride padding."""
    import numpy as np

    from json_time_series_extractor_spark.operators.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_bmp(encode_bmp(img)) == img).all()


@given(st.integers(min_value=1, max_value=2000),
       st.integers(min_value=1, max_value=2),
       st.sampled_from([8000, 16000, 44100]),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_wav_codec_roundtrip_within_quantization(n, channels, rate, seed):
    import numpy as np

    from json_time_series_extractor_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    pcm = (rng.random((n, channels)) * 2 - 1) * 0.9
    decoded, out_rate = decode_wav(encode_wav(pcm, rate))
    assert out_rate == rate and decoded.shape == (n, channels)
    assert np.abs(decoded - pcm).max() <= 0.5 / 32768 + 1e-12


@given(st.integers(min_value=1, max_value=32),
       st.integers(min_value=1, max_value=32),
       st.sampled_from([1, 2, 3, 4]),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_png_codec_roundtrip_any_shape(w, h, channels, seed):
    """PNG encode->decode is identity for every shape and color type."""
    import numpy as np

    from json_time_series_extractor_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    out = decode_png(encode_png(img))
    want = img[:, :, 0] if channels == 1 else img
    assert out.shape == want.shape and (out == want).all()


@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.booleans(),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_jpeg_codec_q100_bounded_error(w, h, subsample, seed):
    """Baseline JPEG at q100: every pixel within a small bound for any
    shape/sampling (quant steps are 1; error comes from DCT rounding and
    — with 4:2:0 — the chroma box filter)."""
    import numpy as np

    from json_time_series_extractor_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample=subsample))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # 4:4:4: DCT round-trip + color transform rounding only. 4:2:0:
    # chroma averaged over 2x2 — luma stays tight, chroma can move far
    # on noise, so bound the LUMA error instead of raw channels.
    if not subsample:
        assert err.max() <= 12
    else:
        # Output luma algebraically equals the stored Y plane (the luma
        # coefficients of the chroma terms cancel exactly) — EXCEPT where
        # a channel clips at 0/255, which re-weights the sum. So the
        # tight luma bound applies to unclipped pixels only.
        luma_in = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                   + 0.114 * img[..., 2])
        luma_out = (0.299 * out[..., 0] + 0.587 * out[..., 1]
                    + 0.114 * out[..., 2])
        unclipped = ((out > 0) & (out < 255)).all(axis=-1)
        if unclipped.any():
            assert np.abs(luma_out - luma_in)[unclipped].max() <= 16


@given(st.integers(min_value=1, max_value=28),
       st.integers(min_value=1, max_value=28),
       st.booleans(),
       st.booleans(),
       st.integers(min_value=40, max_value=95),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_progressive_jpeg_equals_baseline_any_shape(w, h, subsample, gray,
                                                    quality, seed):
    """Progressive (SOF2) and baseline streams carry the same quantized
    coefficients, so decodes must be BIT-IDENTICAL for any shape,
    sampling, quality, and content — the successive-approximation
    refinement scans (incl. EOB runs and correction bits) must
    reconstruct every coefficient exactly."""
    import numpy as np

    from json_time_series_extractor_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality, subsample=subsample))
    prog = decode_jpeg(encode_jpeg(img, quality, subsample=subsample,
                                   progressive=True))
    assert base.shape == prog.shape and (base == prog).all()


@given(st.integers(min_value=1, max_value=30),
       st.integers(min_value=1, max_value=30),
       st.sampled_from([(0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
                        (2, 8), (2, 16), (3, 1), (3, 2), (3, 4), (3, 8),
                        (4, 8), (6, 8)]),
       st.booleans(),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_png_depth_matrix_roundtrip(w, h, combo, interlaced, seed):
    """Property: any legal (color type, bit depth) x (sequential, Adam7)
    PNG decodes to the expected pixels for any shape — sub-byte packing,
    16-bit high-byte, palette resolution, per-pass repacking."""
    import struct
    import zlib

    import numpy as np

    from json_time_series_extractor_spark.operators.codecs import (
        _ADAM7, _PNG_CHANNELS, decode_png)

    color_type, depth = combo
    rng = np.random.default_rng(seed)
    channels = _PNG_CHANNELS[color_type]
    maxv = (1 << depth) - 1
    if color_type == 3:
        pal = rng.integers(0, 256, (min(256, maxv + 1), 3)).astype(np.uint8)
        samples = rng.integers(0, len(pal), (h, w))
    elif channels == 1:
        samples = rng.integers(0, maxv + 1, (h, w))
    else:
        samples = rng.integers(0, maxv + 1, (h, w, channels))

    def pack_row(flat):
        if depth == 16:
            return flat.astype(">u2").tobytes()
        if depth == 8:
            return bytes(flat.astype(np.uint8))
        bits = ((flat[:, None].astype(np.uint8)
                 >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
        return np.packbits(bits).tobytes()

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytearray()
    grids = ([samples] if not interlaced else
             [samples[y0::dy, x0::dx] for x0, y0, dx, dy in _ADAM7
              if samples[y0::dy, x0::dx].size])
    for sub in grids:
        flat2d = sub.reshape(sub.shape[0], -1)
        for row in flat2d:
            raw += b"\x00" + pack_row(np.atleast_1d(row))
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(
                ">IIBBBBB", w, h, depth, color_type, 0, 0,
                1 if interlaced else 0)))
    if color_type == 3:
        blob += chunk(b"PLTE", pal.tobytes())
    blob += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")

    out = decode_png(blob)
    if color_type == 3:
        assert (out == pal[samples]).all()
    elif depth == 16:
        assert (out.reshape(samples.shape) == (samples >> 8)).all()
    elif channels == 1 and depth < 8:
        assert (out == (samples * (255 // maxv)).astype(np.uint8)).all()
    else:
        assert (out.reshape(samples.shape) == samples).all()


def _hand_png(samples, depth, color_type, trns=None):
    """Spec-straight PNG constructor (filter None rows), independent of
    encode_png — mirrors test_png_depth_matrix_roundtrip's builder."""
    import struct
    import zlib

    import numpy as np

    h, w = samples.shape[:2]

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytearray()
    flat2d = samples.reshape(h, -1)
    for row in flat2d:
        if depth == 16:
            raw += b"\x00" + row.astype(">u2").tobytes()
        else:
            raw += b"\x00" + bytes(row.astype(np.uint8))
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                         color_type, 0, 0, 0)))
    if trns is not None:
        blob += chunk(b"tRNS", trns)
    return blob + chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + chunk(b"IEND", b"")


def test_png_trns_truecolor_and_exact_16bit_match():
    """tRNS on truecolor yields RGBA keyed on the EXACT RGB sample
    triple, and 16-bit tRNS matching is exact in 16-bit space — a pixel
    differing from the key only in the LOW byte stays opaque (ADVICE r4:
    the key was previously compared on the high byte only, and truecolor
    tRNS was silently ignored)."""
    import struct

    import numpy as np

    from json_time_series_extractor_spark.operators.codecs import (
        decode_png)

    # Truecolor 8-bit, key (10, 20, 30): one exact-match pixel.
    px8 = np.array([[[10, 20, 30], [10, 20, 31]],
                    [[200, 20, 30], [10, 20, 30]]], np.uint8)
    out = decode_png(_hand_png(px8, 8, 2,
                               trns=struct.pack(">HHH", 10, 20, 30)))
    assert out.shape == (2, 2, 4)
    assert (out[:, :, :3] == px8).all()
    assert out[:, :, 3].tolist() == [[0, 255], [255, 0]]

    # Truecolor 16-bit, key (0x1234, 0x5678, 0x9ABC): the low-byte-only
    # neighbor shares every HIGH byte with the key yet must stay opaque.
    px16 = np.array([[[0x1234, 0x5678, 0x9ABC],
                      [0x1235, 0x5678, 0x9ABC]]], np.uint16)
    out = decode_png(_hand_png(px16, 16, 2,
                               trns=struct.pack(">HHH", 0x1234, 0x5678,
                                                0x9ABC)))
    assert out.shape == (1, 2, 4)
    assert (out[:, :, :3] == (px16 >> 8).astype(np.uint8)).all()
    assert out[0, :, 3].tolist() == [0, 255]

    # Grayscale 16-bit, key 0x8000: 0x80FF shares the high byte but is a
    # different 16-bit sample -> opaque (the r4 high-byte compare marked
    # it transparent).
    g16 = np.array([[0x8000, 0x80FF, 0x7FFF]], np.uint16)
    out = decode_png(_hand_png(g16, 16, 0,
                               trns=struct.pack(">H", 0x8000)))
    assert out.shape == (1, 3, 2)
    assert out[0, :, 0].tolist() == [0x80, 0x80, 0x7F]
    assert out[0, :, 1].tolist() == [0, 255, 255]

    # No-tRNS truecolor 16-bit still returns plain RGB high bytes.
    out = decode_png(_hand_png(px16, 16, 2))
    assert out.shape == (1, 2, 3) and out.dtype == np.uint8
