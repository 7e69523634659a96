"""Independent codec ground truth (round-5 verdict item 1).

The `media_conformance` fixture is the only media fixture whose
expectations were NOT produced by this repo's codec stack: blobs are
assembled byte-by-byte from the published format specs by
tools/build_conformance_fixture.py (which imports nothing from the
package — asserted below) and expectations are stamped from the
a-priori sample arrays the blobs were built from. A symmetric
encoder/decoder bug that keeps the self-referential `media_real_*`
fixtures green fails here.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "media_conformance.parquet"
BUILDER = REPO / "tools" / "build_conformance_fixture.py"


def _canon_sha(arr: np.ndarray) -> tuple:
    a = np.ascontiguousarray(arr, np.uint8)
    h, w = a.shape[:2]
    c = 1 if a.ndim == 2 else a.shape[2]
    dig = hashlib.sha256(b"%d|%d|%d|" % (h, w, c) + a.tobytes()).hexdigest()
    return w, h, c, dig


def test_builder_has_no_repo_imports():
    """The independence guarantee: expectations cannot have been
    produced by the repo's decoders if the builder never imports the
    package."""
    src = BUILDER.read_text()
    assert "json_time_series_extractor_spark" not in src
    assert "import PIL" not in src  # nothing but stdlib + numpy/pyarrow


def test_fixture_shape_and_diversity():
    t = pq.read_table(FIXTURE)
    assert t.num_rows >= 10  # the verdict's "done" bar
    fmts = set(t.column("fmt").to_pylist())
    assert fmts == {"png", "jpeg", "gif", "bmp", "ppm", "webp"}
    counts = {f: t.column("fmt").to_pylist().count(f) for f in fmts}
    assert min(counts.values()) >= 1
    assert counts["png"] >= 10 and counts["webp"] >= 5


def test_every_vector_decodes_to_spec_pixels():
    """Direct (non-Spark) decode of every spec-constructed blob must
    reproduce the independently stamped width/height/channels/sha."""
    from json_time_series_extractor_spark.operators.codecs import (
        decode_bmp, decode_gif, decode_png, decode_ppm,
        sniff_media_format)
    from json_time_series_extractor_spark.operators.jpeg import decode_jpeg
    from json_time_series_extractor_spark.operators.vp8l import decode_webp

    decoders = {"png": decode_png, "jpeg": decode_jpeg,
                "gif": decode_gif, "bmp": decode_bmp, "ppm": decode_ppm,
                "webp": decode_webp}
    for row in pq.read_table(FIXTURE).to_pylist():
        fmt = sniff_media_format(row["media"])
        assert fmt == row["fmt"], row["note"]
        w, h, c, dig = _canon_sha(decoders[fmt](row["media"]))
        assert (w, h, c, dig) == (row["width"], row["height"],
                                  row["n_channels"], row["pix_sha"]), \
            f"vector {row['media_id']} ({row['note']}) mismatch"


def test_pixel_hashes_through_spark(spark):
    """The mapInPandas path (what the `media_conformance` oracle row
    runs) agrees with the stored expectations for every vector."""
    from json_time_series_extractor_spark.operators.multimodal import (
        image_pixel_hashes)

    df = spark.read.parquet(str(FIXTURE))
    got = {r["media_id"]: (r["fmt"], r["width"], r["height"],
                           r["n_channels"], r["pix_sha"])
           for r in image_pixel_hashes(df.select("media_id", "media"))
           .collect()}
    want = {r["media_id"]: (r["fmt"], r["width"], r["height"],
                            r["n_channels"], r["pix_sha"])
            for r in pq.read_table(FIXTURE).to_pylist()}
    assert got == want


def test_pixel_hash_on_error_policies(spark):
    """Corrupt blobs follow the house on_error contract; unknown formats
    surface as NotImplementedError plug points under raise."""
    from json_time_series_extractor_spark.operators.multimodal import (
        image_pixel_hashes)

    rows = [(1, bytes.fromhex("89504e47") + b"\x00" * 8),  # bad PNG
            (2, b"not an image at all")]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    with pytest.raises(Exception):
        image_pixel_hashes(df).collect()
    nulls = image_pixel_hashes(df, on_error="null").collect()
    assert len(nulls) == 2 and all(r["pix_sha"] is None for r in nulls)
    assert image_pixel_hashes(df, on_error="skip").count() == 0


def test_fixture_counts_stay_documented():
    """Round-4 verdict item 8: blob counts in prose must track the
    fixtures (the r3 'keep blob-count docstrings generated' note).
    Asserts the counts stated in COVERAGE.md and the media_real_decode
    docstring equal the actual parquet row counts."""
    import __spark_entry__ as entry

    n_real = pq.read_table(REPO / "tests" / "fixtures"
                           / "media_real.parquet").num_rows
    n_conf = pq.read_table(FIXTURE).num_rows
    assert f"{n_real} blobs" in entry.q_media_real_decode.__doc__
    assert f"{n_conf} " in entry.q_media_conformance.__doc__
    coverage = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"REAL decode of (\d+) committed blobs", coverage)
    assert m and int(m.group(1)) == n_real
    m = re.search(r"(\d+) SPEC-CONSTRUCTED vectors", coverage)
    assert m and int(m.group(1)) == n_conf
    # r6: the audio fixture count is prose-tracked too
    n_audio = pq.read_table(REPO / "tests" / "fixtures"
                            / "media_real_audio.parquet").num_rows
    assert f"{n_audio} committed WAV blobs" in \
        " ".join(entry.q_media_real_audio.__doc__.split())
    m = re.search(r"REAL WAV decode of (\d+) committed blobs", coverage)
    assert m and int(m.group(1)) == n_audio


def test_perceptual_hashes_near_dup_property(spark):
    """aHash/dHash behave as near-dup fingerprints: identical pixels
    under different containers hash identically; mild noise keeps a
    small Hamming distance; structurally different images are far; a
    tiny image (grid smaller than 8x8) still hashes; hand-computed 2x2
    checker board matches the documented contract."""
    import numpy as np

    from json_time_series_extractor_spark.operators.multimodal import (
        perceptual_hashes_from_array,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    # smooth it so single-pixel noise cannot flip many cells
    img = (img.astype(np.int64) // 4 * 4).astype(np.uint8)
    base_a, base_d = perceptual_hashes_from_array(img)
    assert perceptual_hashes_from_array(img.copy()) == (base_a, base_d)

    noisy = img.astype(np.int64)
    noisy[::7, ::9] += 2                        # mild, sub-threshold
    na, nd = perceptual_hashes_from_array(
        np.clip(noisy, 0, 255).astype(np.uint8))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(base_a, na) <= 8 and ham(base_d, nd) <= 12
    other = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    oa, od = perceptual_hashes_from_array(other)
    assert ham(base_a, oa) > 12 or ham(base_d, od) > 12

    # hand example: 2x2 checkerboard [[0,255],[255,0]] -> center
    # samples alternate; mean = 127 -> aHash bits exactly where the
    # sampled cell is 255
    chk = np.array([[0, 255], [255, 0]], np.uint8)
    ah, dh = perceptual_hashes_from_array(chk)
    bits = [(i, j) for i in range(8) for j in range(8)
            if (ah >> (i * 8 + j)) & 1]
    # row cell i maps to source row (2i+1)*2//16 = 0 for i<4 else 1
    for i, j in bits:
        sr, sc = (0 if i < 4 else 1), (0 if j < 4 else 1)
        assert chk[sr, sc] == 255
    assert len(bits) == 32
    # 1x1 image: every sample equal -> both hashes zero
    assert perceptual_hashes_from_array(
        np.array([[7]], np.uint8)) == (0, 0)
