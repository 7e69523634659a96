"""Baseline JPEG codec: round-trip error bounds, format features,
decoder hardening, Spark integration."""

from __future__ import annotations

import numpy as np
import pytest

from json_time_series_extractor_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 5) % 256,
                     ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)


def test_roundtrip_error_bounds_444_and_420():
    """Smooth content at q90: 4:4:4 within a few quantization steps per
    channel; 4:2:0 a bit looser (chroma box filter)."""
    img = _gradient(64, 48)
    for sub, bound in [(False, 4), (True, 8)]:
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


def test_flat_color_is_exact():
    flat = np.full((17, 23, 3), [200, 30, 90], np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert (out == flat).all()


def test_grayscale_single_component():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (9, 17), np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100, subsample=False))
    assert out.ndim == 2 and out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_restart_markers_roundtrip():
    """DRI/RSTn: predictors reset per interval; decode must resync."""
    img = _gradient(50, 37)
    for sub, ri in [(True, 2), (False, 3), (True, 1)]:
        blob = encode_jpeg(img, 90, subsample=sub, restart_interval=ri)
        assert b"\xFF\xDD" in blob          # DRI emitted
        out = decode_jpeg(blob)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_non_multiple_of_mcu_sizes():
    """Edge padding: sizes not divisible by 8 (or 16 for 4:2:0)."""
    rng = np.random.default_rng(2)
    for shape in [(1, 1, 3), (7, 9, 3), (15, 17, 3), (16, 16, 3)]:
        img = rng.integers(0, 256, shape, np.uint8)
        for sub in (False, True):
            out = decode_jpeg(encode_jpeg(img, 95, subsample=sub))
            assert out.shape == shape


def test_quality_monotonicity():
    """Higher quality -> larger file and lower error (sanity of the
    libjpeg quality scaling)."""
    img = _gradient(40, 40)
    sizes, errs = [], []
    for q in (30, 60, 90):
        blob = encode_jpeg(img, q, subsample=False)
        out = decode_jpeg(blob)
        sizes.append(len(blob))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert sizes == sorted(sizes)
    assert errs == sorted(errs, reverse=True)


def test_rejects_unsupported_processes_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # SOF9 (arithmetic sequential) stays a plug point; SOF2 (progressive)
    # decodes for real now and is covered by the round-trip tests below.
    import struct
    sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = (b"\xFF\xD8" + struct.pack(">HH", 0xFFC9, len(sof9) + 2)
            + sof9 + b"\xFF\xD9")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(blob)
    # An SOF2 header with no scan data is a truncated file, not silence.
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    blob2 = (b"\xFF\xD8" + struct.pack(">HH", 0xFFC2, len(sof2) + 2)
             + sof2 + b"\xFF\xD9")
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(blob2)


def test_progressive_decodes_identical_to_baseline():
    """SOF2 successive-approximation scans (DC first/refine, per-
    component AC first/refine, EOB runs) reconstruct EXACTLY the same
    quantized coefficients as the baseline stream, so decoded pixels
    must match bit-for-bit across subsampling, grayscale, and
    non-MCU-multiple sizes."""
    rng = np.random.default_rng(11)
    cases = [
        (_gradient(16, 16), False, 85),
        (_gradient(17, 31), True, 75),
        (_gradient(48, 64), True, 60),
        (_gradient(33, 57), True, 85),
        (_gradient(24, 24)[..., 0], False, 90),           # grayscale
        (rng.integers(0, 256, (40, 56, 3)).astype(np.uint8), True, 85),
        (rng.integers(0, 256, (25, 25)).astype(np.uint8), False, 50),
    ]
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
        prog = decode_jpeg(encode_jpeg(img, q, subsample=sub,
                                       progressive=True))
        assert np.array_equal(base, prog), (img.shape, sub, q)


def test_progressive_corrupt_blob_policy():
    """Truncated progressive streams surface as recognized data errors
    (never raw IndexError/KeyError), and progressive+restarts is an
    explicit encode-time rejection."""
    from json_time_series_extractor_spark.operators.multimodal import (
        _DATA_ERRORS)

    blob = encode_jpeg(_gradient(32, 40), 80, progressive=True)
    for cut in (len(blob) // 4, len(blob) // 2, 3 * len(blob) // 4,
                len(blob) - 4):
        try:
            decode_jpeg(blob[:cut])
        except _DATA_ERRORS:
            pass
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_gradient(16, 16), progressive=True,
                    restart_interval=2)


def test_rejects_unsupported_sampling_and_noninterleaved():
    """Sampling factors outside {1,2} raise ValueError at SOF parse (not
    silent wrong geometry); a baseline non-interleaved scan sequence
    (ns < ncomp) raises NotImplementedError like SOF2 does."""
    blob = bytearray(encode_jpeg(_gradient(16, 16), 85))

    # Patch the luma component's h,v in SOF0 from the encoded value to
    # 3x1. SOF0 layout: FFC0 len prec(1) h(2) w(2) nc(1) [id hv tq]*
    sof = blob.find(b"\xFF\xC0")
    assert sof >= 0
    bad = bytearray(blob)
    bad[sof + 2 + 2 + 6 + 1] = 0x31
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(bad))

    # Patch SOS ns from 3 to 2: a partially-interleaved scan subset,
    # which this decoder declares unsupported rather than mis-decoding
    # (ns=1 non-interleaved sequences decode for real — test below).
    sos = blob.find(b"\xFF\xDA")
    assert sos >= 0
    bad2 = bytearray(blob)
    bad2[sos + 4] = 2
    with pytest.raises(NotImplementedError, match="partially-interleaved"):
        decode_jpeg(bytes(bad2))


def test_noninterleaved_baseline_decodes_identical():
    """A baseline stream with one full-spectral scan per component
    (ns=1 SOS sequence) reconstructs the same coefficients as the
    interleaved stream — decoded pixels bit-identical across
    subsampling, grayscale, and non-MCU sizes."""
    rng = np.random.default_rng(17)
    cases = [
        (_gradient(16, 16), False, 85),
        (_gradient(17, 31), True, 75),
        (_gradient(24, 24)[..., 0], False, 90),
        (rng.integers(0, 256, (33, 57, 3)).astype(np.uint8), True, 60),
    ]
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
        noni = decode_jpeg(encode_jpeg(img, q, subsample=sub,
                                       interleave=False))
        assert np.array_equal(base, noni), (img.shape, sub, q)
    with pytest.raises(ValueError, match="baseline mode"):
        encode_jpeg(_gradient(8, 8), interleave=False, progressive=True)
    with pytest.raises(ValueError, match="baseline mode"):
        encode_jpeg(_gradient(8, 8), interleave=False, restart_interval=2)


def test_real_jpeg_decode_through_spark(spark):
    """decode_stub='real' handles JPEG in extract_image_features and
    resize_images (JPEG-in -> JPEG-out)."""
    from json_time_series_extractor_spark.operators.codecs import (
        sniff_media_format)
    from json_time_series_extractor_spark.operators.multimodal import (
        extract_image_features, resize_images)

    img = np.zeros((16, 32, 3), dtype=np.uint8)
    img[:, 16:, :] = 255
    blob = encode_jpeg(img, quality=95, subsample=False)
    assert sniff_media_format(blob) == "jpeg"
    media = spark.createDataFrame([(1, bytearray(blob))],
                                  "media_id long, media binary")
    f = extract_image_features(media, decode_stub="real").collect()[0]
    assert (f.width, f.height, f.n_channels) == (32, 16, 3)
    assert abs(f.mean_luma - 0.5) < 0.02     # lossy: loose bound

    r = resize_images(media, 8, 8, decode_stub="real").collect()[0]
    out = decode_jpeg(bytes(r.media))
    assert out.shape == (8, 8, 3)
    # Halves survive the resample within lossy tolerance.
    assert out[:, :4].mean() < 30 and out[:, 4:].mean() > 225


def test_resize_handles_progressive_and_noninterleaved_input(spark):
    """The Spark resize path accepts every supported JPEG layout: SOF2
    progressive and ns=1 non-interleaved inputs decode transparently and
    re-encode as baseline."""
    img = _gradient(24, 40)
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, 85, progressive=True))),
         (2, bytearray(encode_jpeg(img, 85, interleave=False)))],
        "media_id long, media binary")
    from json_time_series_extractor_spark.operators.multimodal import (
        resize_images,
    )

    out = {r.media_id: r for r in
           resize_images(media, 10, 8, decode_stub="real").collect()}
    for mid in (1, 2):
        resized = decode_jpeg(bytes(out[mid].media))
        assert resized.shape == (8, 10, 3)
