"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
the Spark-side plumbing (schemas, partition-friendly batch iteration,
Arrow-batched UDF signatures) is real and tested. Decode kernels come in
three modes: ``decode_stub="real"`` actually decodes via the
dependency-free codecs in :mod:`.codecs` / :mod:`.jpeg` / :mod:`.vp8l`
/ :mod:`.vp8` (baseline AND progressive JPEG, PNG, GIF, lossless AND
lossy WebP, PPM, BMP, WAV — the formats a web corpus actually contains;
PIL/ffmpeg extend the same call sites to AVIF/video);
``decode_stub="fake"`` derives
deterministic features
from a hash of the bytes (oracle-reproducible pipelines at any scale);
``decode_stub="raise"`` marks the plug point explicitly.

At 100 TB scale the iterator-of-batches ``mapInPandas`` shape matters:
one media blob can be tens of MB, so the UDF must stream batches rather
than materialize a partition, and the metadata struct lets Catalyst prune
the blob column entirely for metadata-only queries.
"""

from __future__ import annotations

import hashlib
import struct
import wave
import zlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: Typed metadata carried alongside every media blob.
MEDIA_META_SCHEMA = (
    "media_type string, mime string, width int, height int, "
    "duration_ms int, size_bytes long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "mean_luma double, phash long"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index int, frame_ts_ms int, frame binary"
)



def _check_decode_stub(decode_stub: str,
                       allowed: tuple = ("fake", "real", "raise")) -> None:
    """Fail fast on typos or unsupported modes: an unknown mode would
    otherwise silently fall through to the fake hash-derived kernel."""
    if decode_stub not in allowed:
        raise ValueError(
            f"decode_stub must be one of {allowed}, got {decode_stub!r}")


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "null", "skip"):
        raise ValueError(
            f"on_error must be raise/null/skip, got {on_error!r}")


#: Exception types a truncated/corrupt blob produces in the parsers:
#: ValueError (explicit checks, plus IndexError/KeyError mid-stream
#: truncation translated at the codec boundary by
#: ``codecs.truncation_boundary``), NotImplementedError (format plug
#: points), struct.error (short headers), zlib.error (corrupt deflate),
#: wave.Error/EOFError (bad RIFF). Raw IndexError/KeyError are NOT
#: absorbed — a genuine indexing bug outside a decode kernel surfaces
#: even in null/skip modes instead of being dropped as corrupt data.
_DATA_ERRORS: tuple = (ValueError, NotImplementedError, struct.error,
                       zlib.error, wave.Error, EOFError)


def _guard(kernel, blob: bytes, on_error: str):
    """Run a decode kernel with the chosen corrupt-input policy.

    At 10^12-blob scale SOME inputs are truncated or mislabeled; the
    default ``on_error='raise'`` keeps verification strict, while
    ``'null'`` (emit the row with null features) and ``'skip'`` (drop
    the row) keep one bad blob from killing a 1000-executor job.
    Returns (ok, result)."""
    if on_error == "raise":
        return True, kernel(blob)
    try:
        return True, kernel(blob)
    except _DATA_ERRORS:
        return False, None


def attach_media_metadata(df: DataFrame, blob_col: str = "media",
                          media_type: str = "image",
                          mime: str = "application/octet-stream") -> DataFrame:
    """Derive the typed metadata struct from the blob (cheap JVM-side:
    size from ``length``; intrinsic dims unknown until decode -> null)."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.length(F.col(blob_col)).cast("long").alias("size_bytes")))


def _real_decode_pixels(blob: bytes) -> tuple:
    """Sniff + decode via the pure-Python codecs -> (fmt, pixel array).

    The shared real-decode entry for feature extraction and pixel
    hashing; PIL/opencv extend this one call site to the remaining
    formats (WebP, AVIF, ...)."""
    from json_time_series_extractor_spark.operators.codecs import (
        decode_bmp, decode_gif, decode_png, decode_ppm,
        sniff_media_format)

    fmt = sniff_media_format(blob)
    if fmt == "ppm":
        return fmt, decode_ppm(blob)
    if fmt == "bmp":
        return fmt, decode_bmp(blob)
    if fmt == "png":
        return fmt, decode_png(blob)
    if fmt == "jpeg":
        from json_time_series_extractor_spark.operators.jpeg import (
            decode_jpeg)
        return fmt, decode_jpeg(blob)
    if fmt == "gif":
        return fmt, decode_gif(blob)
    if fmt == "webp":
        from json_time_series_extractor_spark.operators.vp8l import (
            decode_webp)
        return fmt, decode_webp(blob)
    raise NotImplementedError(
        f"no dependency-free decoder for format {fmt!r}; PIL/"
        "opencv plug in here (AVIF, ...)")


def _fake_image_features(blob: bytes) -> tuple:
    """Deterministic stand-in for a real image decode: features derived
    from a sha256 of the bytes. Replaces PIL decode in this container."""
    digest = hashlib.sha256(blob).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    n_channels = 1 + (digest[2] % 4)
    mean_luma = digest[3] / 255.0
    phash = int.from_bytes(digest[4:12], "big", signed=True)
    return width, height, n_channels, mean_luma, phash


def extract_image_features(df: DataFrame, *, id_col: str = "media_id",
                           blob_col: str = "media",
                           decode_stub: str = "fake",
                           on_error: str = "raise") -> DataFrame:
    """Decode + feature-extract images via Arrow-batched ``mapInPandas``.

    ``decode_stub='fake'``: deterministic hash-derived features (testable
    plumbing). ``decode_stub='real'``: actual decode via the pure-Python
    JPEG/PNG/GIF/PPM/BMP codecs (Rec.601 mean luma + 8x8 average hash);
    PIL/opencv extend the same call site to the remaining formats.
    ``decode_stub='raise'``: placeholder marking that call site.
    """
    def _real_image_features(blob: bytes) -> tuple:
        from json_time_series_extractor_spark.operators.codecs import (
            image_features)

        _fmt, pixels = _real_decode_pixels(blob)
        w, h, c, luma, phash = image_features(pixels)
        return w, h, c, luma, phash

    _check_decode_stub(decode_stub)
    _check_on_error(on_error)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available "
                    "in this container; plug the decoder in here")
            kernel = (_real_image_features if decode_stub == "real"
                      else _fake_image_features)
            ids, rows = [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                ok, feat = _guard(kernel, bytes(b), on_error)
                if ok:
                    ids.append(mid)
                    rows.append(feat)
                elif on_error == "null":
                    ids.append(mid)
                    rows.append((None, None, None, None, None))
            feats = pd.DataFrame(
                rows, columns=["width", "height", "n_channels",
                               "mean_luma", "phash"])
            feats.insert(0, "media_id",
                         pd.Series(ids, dtype=pdf[id_col].dtype))
            yield feats

    return df.select(id_col, blob_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


PIXEL_HASH_SCHEMA = ("media_id long, fmt string, width int, height int, "
                     "n_channels int, pix_sha string")


def image_pixel_hashes(df: DataFrame, *, id_col: str = "media_id",
                       blob_col: str = "media",
                       on_error: str = "raise") -> DataFrame:
    """REAL decode -> canonical pixel hash, via Arrow-batched
    ``mapInPandas`` (map-only; scales like any per-blob kernel).

    The canonical hash is ``sha256("h|w|c|" + row-major uint8 bytes)``
    of the decoder's documented output array (2-D grayscale hashes as
    c=1). This is the contract the spec-constructed conformance fixture
    (tools/build_conformance_fixture.py) stamps INDEPENDENTLY from its
    a-priori sample arrays — the `media_conformance` oracle row compares
    the two, proving decoder-vs-spec correctness rather than
    decoder-vs-itself stability. Also useful at corpus scale for exact
    pixel-level dedup of re-encoded images (same pixels, different
    container bytes)."""
    import hashlib as _hashlib

    import numpy as np

    _check_on_error(on_error)

    def _kernel(blob: bytes) -> tuple:
        fmt, pixels = _real_decode_pixels(blob)
        arr = np.ascontiguousarray(pixels, np.uint8)
        h, w = arr.shape[:2]
        c = 1 if arr.ndim == 2 else arr.shape[2]
        dig = _hashlib.sha256(
            b"%d|%d|%d|" % (h, w, c) + arr.tobytes()).hexdigest()
        return fmt, w, h, c, dig

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                ok, out = _guard(_kernel, bytes(b), on_error)
                if ok:
                    ids.append(mid)
                    rows.append(out)
                elif on_error == "null":
                    ids.append(mid)
                    rows.append((None, None, None, None, None))
            res = pd.DataFrame(rows, columns=["fmt", "width", "height",
                                              "n_channels", "pix_sha"])
            res.insert(0, "media_id",
                       pd.Series(ids, dtype=pdf[id_col].dtype))
            yield res

    return df.select(id_col, blob_col).mapInPandas(run, PIXEL_HASH_SCHEMA)


PERCEPTUAL_HASH_SCHEMA = ("media_id long, fmt string, width int, "
                          "height int, ahash64 long, dhash64 long")


def perceptual_hashes_from_array(arr) -> tuple:
    """aHash64 + dHash64 of a decoded uint8 pixel array — the image
    near-dup fingerprint (re-encodes, format changes and mild quality
    loss keep a small Hamming distance where the exact pix_sha flips).

    Integer-only contract (implemented INDEPENDENTLY by
    tools/build_conformance_fixture.py from its a-priori arrays, so the
    fixture oracle proves decode+hash against the spec, not against
    itself):

    - grayscale: c<3 -> channel 0 (alpha ignored); otherwise the BT.601 integer luma
      ``(299*R + 587*G + 114*B) // 1000`` over the first three channels
      (alpha ignored);
    - sampling: center-of-cell nearest neighbor on a GHxGW grid —
      ``g[i][j] = gray[(2i+1)*H // (2*GH)][(2j+1)*W // (2*GW)]`` —
      well-defined for ANY image size >= 1x1 (no box-mean boundary
      ambiguity);
    - aHash (8x8): bit ``i*8+j`` = 1 iff ``g[i][j] > sum(g) // 64``;
    - dHash (8 rows x 9 cols): bit ``i*8+j`` = 1 iff
      ``g[i][j+1] > g[i][j]``;
    - both wrap to signed int64 (bit 63 is the sign).
    """
    import numpy as np

    a = np.asarray(arr, np.uint8)
    if a.ndim == 2 or a.shape[2] < 3:
        # 1 channel = the luma itself; 2 channels = gray+alpha (alpha
        # ignored, like the RGB case)
        gray = a[:, :, 0].astype(np.int64) if a.ndim == 3 \
            else a.astype(np.int64)
    else:
        rgb = a[:, :, :3].astype(np.int64)
        gray = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1]
                + 114 * rgb[:, :, 2]) // 1000
    h, w = gray.shape

    def grid(gh: int, gw: int):
        ri = [((2 * i + 1) * h) // (2 * gh) for i in range(gh)]
        ci = [((2 * j + 1) * w) // (2 * gw) for j in range(gw)]
        return gray[np.ix_(ri, ci)]

    def signed(x: int) -> int:
        return ((x + (1 << 63)) % (1 << 64)) - (1 << 63)

    g8 = grid(8, 8)
    m = int(g8.sum()) // 64
    ah = 0
    for i in range(8):
        for j in range(8):
            if int(g8[i, j]) > m:
                ah |= 1 << (i * 8 + j)
    g9 = grid(8, 9)
    dh = 0
    for i in range(8):
        for j in range(8):
            if int(g9[i, j + 1]) > int(g9[i, j]):
                dh |= 1 << (i * 8 + j)
    return signed(ah), signed(dh)


def image_perceptual_hashes(df: DataFrame, *, id_col: str = "media_id",
                            blob_col: str = "media",
                            on_error: str = "raise") -> DataFrame:
    """REAL decode -> :func:`perceptual_hashes_from_array`, via the same
    Arrow-batched map-only kernel as :func:`image_pixel_hashes`; the
    corpus-scale image near-dup stage (hash once, then band/bucket the
    64-bit hashes exactly like SimHash text near-dup)."""
    _check_on_error(on_error)

    def _kernel(blob: bytes) -> tuple:
        import numpy as np

        fmt, pixels = _real_decode_pixels(blob)
        arr = np.ascontiguousarray(pixels, np.uint8)
        h, w = arr.shape[:2]
        ah, dh = perceptual_hashes_from_array(arr)
        return fmt, w, h, ah, dh

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                ok, out = _guard(_kernel, bytes(b), on_error)
                if ok:
                    ids.append(mid)
                    rows.append(out)
                elif on_error == "null":
                    ids.append(mid)
                    rows.append((None, None, None, None, None))
            res = pd.DataFrame(rows, columns=["fmt", "width", "height",
                                              "ahash64", "dhash64"])
            res.insert(0, "media_id",
                       pd.Series(ids, dtype=pdf[id_col].dtype))
            yield res

    return df.select(id_col, blob_col).mapInPandas(
        run, PERCEPTUAL_HASH_SCHEMA)


RESIZED_SCHEMA = ("media_id long, media binary, width int, height int, "
                  "size_bytes long")

AUDIO_FEATURES_SCHEMA = ("media_id long, duration_ms int, sample_rate int, "
                         "rms double, audio_fp long")


def resize_images(df: DataFrame, width: int, height: int, *,
                  id_col: str = "media_id", blob_col: str = "media",
                  decode_stub: str = "fake",
                  on_error: str = "raise") -> DataFrame:
    """Resize plumbing: blob in -> (resized blob, target dims) out.

    The fake kernel derives the output bytes deterministically from
    (input bytes, target dims); ``decode_stub='real'`` decodes
    JPEG/PNG/GIF/PPM/BMP via the pure-Python codecs, nearest-neighbor
    resamples, and re-encodes format-preserving (PPM for BMP input) —
    PIL's resampler plugs into the same call site for the rest.
    Arrow-batched, map-only.
    """
    def _real_resize(blob: bytes) -> bytes:
        from json_time_series_extractor_spark.operators.codecs import (
            decode_bmp, decode_png, decode_ppm, encode_png, encode_ppm,
            resize_nearest, sniff_media_format)

        fmt = sniff_media_format(blob)
        if fmt == "ppm":
            pixels = decode_ppm(blob)
        elif fmt == "bmp":
            pixels = decode_bmp(blob)
        elif fmt == "png":
            # PNG round-trips as PNG (alpha/grayscale-preserving).
            return encode_png(resize_nearest(decode_png(blob),
                                             width, height))
        elif fmt == "jpeg":
            from json_time_series_extractor_spark.operators.jpeg import (
                decode_jpeg, encode_jpeg)
            return encode_jpeg(resize_nearest(decode_jpeg(blob),
                                              width, height))
        elif fmt == "gif":
            # GIF resamples losslessly back to GIF (palette preserved);
            # an RGBA frame (transparency) re-encodes as PNG.
            from json_time_series_extractor_spark.operators.codecs import (
                decode_gif, encode_gif)
            px = resize_nearest(decode_gif(blob), width, height)
            if px.ndim == 3 and px.shape[2] == 4:
                return encode_png(px)
            return encode_gif(px)
        elif fmt == "webp":
            # WebP (lossless VP8L or lossy VP8, both decoded natively)
            # re-encodes as lossless VP8L after the resize.
            from json_time_series_extractor_spark.operators.vp8l import (
                decode_webp, encode_vp8l)
            return encode_vp8l(resize_nearest(decode_webp(blob),
                                              width, height))
        else:
            raise NotImplementedError(
                f"no dependency-free decoder for format {fmt!r}; PIL/"
                "opencv plug in here (AVIF, ...)")
        return encode_ppm(resize_nearest(pixels, width, height))

    _check_decode_stub(decode_stub)
    _check_on_error(on_error)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image resize requires PIL/opencv — not available "
                    "in this container; plug the resampler in here")
            if decode_stub == "real":
                kernel = _real_resize
            else:
                def kernel(b: bytes) -> bytes:
                    return hashlib.sha256(
                        b + f"{width}x{height}".encode()).digest()
            ids, blobs = [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                ok, out = _guard(kernel, bytes(b), on_error)
                if ok:
                    ids.append(mid)
                    blobs.append(out)
                elif on_error == "null":
                    ids.append(mid)
                    blobs.append(None)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype=pdf[id_col].dtype),
                "media": pd.Series(blobs, dtype="object"),
                "width": pd.Series([width] * len(ids), dtype="int32"),
                "height": pd.Series([height] * len(ids), dtype="int32"),
                "size_bytes": pd.Series(
                    [len(b) if b is not None else -1 for b in blobs],
                    dtype="int64"),
            })

    return df.select(id_col, blob_col).mapInPandas(run, RESIZED_SCHEMA)


def extract_audio_features(df: DataFrame, *, id_col: str = "media_id",
                           blob_col: str = "media",
                           duration_col: str = "duration_ms",
                           decode_stub: str = "fake",
                           on_error: str = "raise") -> DataFrame:
    """Audio feature plumbing: duration/sample-rate/RMS/fingerprint.

    The fake kernel derives features from a sha256 of the bytes;
    ``decode_stub='real'`` parses WAV via :mod:`.codecs` (from-spec
    RIFF parser, r6: PCM 8/16/24/32, IEEE float 32/64, ITU-T G.711
    A-law/mu-law, WAVE_FORMAT_EXTENSIBLE; true duration, rate, RMS,
    64-bit window-diff fingerprint); librosa/ffmpeg extend the same
    call site to compressed audio. The Spark-side shape — metadata
    passthrough, Arrow batching, map-only plan — is identical in all
    modes.
    """
    _check_decode_stub(decode_stub)
    _check_on_error(on_error)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real audio decode requires librosa/ffmpeg — not "
                    "available in this container; plug the decoder in here")
            rows = []
            for mid, blob, dur in zip(pdf[id_col], pdf[blob_col],
                                      pdf[duration_col]):
                if decode_stub == "real":
                    def kernel(b: bytes) -> tuple:
                        from json_time_series_extractor_spark.operators \
                            .codecs import audio_features, decode_wav

                        samples, rate = decode_wav(b)
                        return audio_features(samples, rate)

                    ok, feat = _guard(kernel, bytes(blob), on_error)
                    if ok:
                        rows.append((mid, *feat))
                    elif on_error == "null":
                        rows.append((mid, None, None, None, None))
                    continue
                d = hashlib.sha256(bytes(blob)).digest()
                rows.append((
                    mid,
                    int(dur) if not pd.isnull(dur) else 0,
                    8000 * (1 + d[0] % 6),          # fake sample rate
                    d[1] / 255.0,                    # fake RMS
                    int.from_bytes(d[2:10], "big", signed=True)))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "sample_rate",
                               "rms", "audio_fp"])

    return df.select(id_col, blob_col, duration_col).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000, *,
                        id_col: str = "media_id", blob_col: str = "media",
                        duration_col: str = "duration_ms",
                        decode_stub: str = "fake",
                        on_error: str = "raise") -> DataFrame:
    """Frame-sampling plumbing: one video row -> N frame rows (UDTF shape).

    The fake decoder emits one deterministic pseudo-frame per sample
    point. ``decode_stub='real'`` decodes animated GIFs (GIF89a
    compositing: sub-rects, transparency, disposal) and — since r6 —
    animated WebP (ANIM/ANMF compositing per the container spec:
    sub-rects, alpha-blend/overwrite, dispose-to-background, frames
    via the from-scratch VP8L/VP8 codecs), emitting the frame
    DISPLAYED at each sample point as PNG bytes, with the true
    duration from the frame delays; other containers raise the ffmpeg
    plug-point error (a data error under the corrupt-blob policy
    taxonomy, but sample_video_frames is strict).
    """
    _check_decode_stub(decode_stub, allowed=("fake", "real", "raise"))
    _check_on_error(on_error)
    # Driver-side argument check: a nonpositive stride inside the kernel
    # would raise a ValueError that on_error='null'/'skip' absorbs as if
    # the BLOB were corrupt (ValueError is in _DATA_ERRORS) — a bad
    # argument must fail fast instead (ADVICE r4).
    if not isinstance(every_ms, int) or every_ms < 1:
        raise ValueError(f"every_ms must be an int >= 1, got {every_ms!r}")

    def _real_frames(blob: bytes):
        from json_time_series_extractor_spark.operators.codecs import (
            decode_gif_frames, encode_png, sniff_media_format)

        fmt = sniff_media_format(blob)
        if fmt == "gif":
            frames, delays = decode_gif_frames(blob)
        elif fmt == "webp":
            # r6: animated WebP (ANIM/ANMF) — same composed-canvas
            # contract as the GIF path, frames via the from-scratch
            # VP8L/VP8 codecs.
            from json_time_series_extractor_spark.operators.vp8l import (
                decode_webp_frames)
            frames, delays = decode_webp_frames(blob)
        elif fmt == "webm":
            # r6: WebM/Matroska demux (EBML) + the from-scratch VP8
            # decoder — KEYFRAME sampling semantics (interframes are
            # parsed but never decoded; see operators/webm.py).
            from json_time_series_extractor_spark.operators.webm import (
                decode_webm_keyframes)
            frames, delays = decode_webm_keyframes(blob)
        else:
            raise NotImplementedError(
                f"no dependency-free frame decoder for format {fmt!r}; "
                "ffmpeg plugs in here (mp4/mov/avi/...; webm decodes natively since r6)")
        total = sum(delays)
        starts = [0]
        for d in delays[:-1]:
            starts.append(starts[-1] + d)
        out = []
        for idx, t in enumerate(range(0, max(total, 1), every_ms)):
            shown = 0
            for i, s in enumerate(starts):
                if s <= t:
                    shown = i
            out.append((idx, t, encode_png(frames[shown])))
        return out

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real video decode requires ffmpeg — not available in "
                    "this container; plug the decoder in here")
            out_id, out_idx, out_ts, out_frame = [], [], [], []
            if decode_stub == "real":
                for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                    # Corrupt/unsupported blobs follow the same policy
                    # as the image/audio operators; 'null' emits one
                    # null-frame marker row for the media id.
                    ok, sampled = _guard(_real_frames, bytes(blob),
                                         on_error)
                    if ok:
                        for idx, t, png in sampled:
                            out_id.append(mid)
                            out_idx.append(idx)
                            out_ts.append(t)
                            out_frame.append(png)
                    elif on_error == "null":
                        out_id.append(mid)
                        out_idx.append(None)
                        out_ts.append(None)
                        out_frame.append(None)
                yield pd.DataFrame({
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_index": pd.Series(out_idx, dtype="Int32"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="Int32"),
                    "frame": pd.Series(out_frame, dtype="object"),
                })
                continue
            for mid, blob, dur in zip(pdf[id_col], pdf[blob_col],
                                      pdf[duration_col]):
                dur = int(dur) if not pd.isnull(dur) else 0
                for idx, t in enumerate(range(0, max(dur, 1), every_ms)):
                    # Text framing (":{t}") so a SQL oracle reproduces the
                    # frame bytes: sha256(concat(blob_text, ':', t)).
                    seed = hashlib.sha256(
                        bytes(blob) + f":{t}".encode()).digest()
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_ts.append(t)
                    out_frame.append(seed)
            yield pd.DataFrame({
                "media_id": pd.Series(out_id, dtype="int64"),
                "frame_index": pd.Series(out_idx, dtype="int32"),
                "frame_ts_ms": pd.Series(out_ts, dtype="int32"),
                "frame": pd.Series(out_frame, dtype="object"),
            })

    return df.select(id_col, blob_col, duration_col).mapInPandas(
        run, FRAME_SAMPLE_SCHEMA)


def synthesize_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/benchmarks: blob bytes are
    a hash-seeded function of the row id (no randomness, no files).

    sha-256 (not 512) so the oracle side can reproduce the blob: the fake
    feature chain is then ``sha256(hex(sha256(str(id))))``, expressible in
    DuckDB for exact value checks of the decode plumbing."""
    df = spark.range(n)
    blob = F.sha2(F.col("id").cast("string"), 256).cast("binary")
    # Duration from a sha256 tag (not xxhash64): DuckDB reproduces it with
    # the same hex-prefix parse, so frame sampling is value-checkable.
    dur = (F.conv(F.substring(
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(":dur")), 256),
        1, 4), 16, 10).cast("int") % 30_000 + 1000)
    out = df.select(
        F.col("id").alias("media_id"),
        blob.alias("media"),
        dur.alias("duration_ms"))
    return attach_media_metadata(out, "media", media_type=kind)
