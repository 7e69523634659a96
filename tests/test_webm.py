"""WebM/Matroska demux tests: container roundtrip, EBML edge cases,
error-path taxonomy, and (libwebp present) the real decode path.

Reference parity target: the container layout follows RFC 8794 (EBML)
and the public Matroska/WebM element registry; the decode contract is
``codecs.decode_gif_frames``-shaped so ``sample_video_frames`` treats
all three animation containers identically.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from json_time_series_extractor_spark.operators.webm import (
    _BLOCK,
    _BLOCK_GROUP,
    _CLUSTER,
    _CLUSTER_TS,
    _REFERENCE_BLOCK,
    _SEGMENT,
    _elem,
    _enc_id,
    _enc_size,
    _uint_elem,
    decode_webm_keyframes,
    encode_webm_vp8,
    parse_webm,
)


def _fake_payloads(n):
    return [bytes([0x40 + i]) * (20 + i) for i in range(n)]


def test_container_roundtrip():
    pays = _fake_payloads(3)
    blob = encode_webm_vp8(pays, 32, 24, delays_ms=[400, 700, 900])
    info = parse_webm(blob)
    assert info.track.codec_id == "V_VP8"
    assert (info.track.width, info.track.height) == (32, 24)
    assert info.duration_ms == 2000
    assert [(t, k) for t, k, _ in info.frames] == [
        (0, True), (400, True), (1100, True)]
    assert [p for _, _, p in info.frames] == pays


def test_unknown_size_segment():
    """Streamed files leave Segment open-ended (size = all ones);
    children are scanned to EOF."""
    pays = _fake_payloads(2)
    blob = encode_webm_vp8(pays, 8, 8, delays_ms=[500, 500])
    # Split at the Segment element and rebuild it with a 1-byte
    # unknown size (0xFF = marker + all data bits set).
    seg_id = _enc_id(_SEGMENT)
    at = blob.index(seg_id)
    size_len = 1
    first = blob[at + len(seg_id)]
    m = 0x80
    while not (first & m):
        m >>= 1
        size_len += 1
    payload = blob[at + len(seg_id) + size_len:]
    streamed = blob[:at] + seg_id + b"\xff" + payload
    info = parse_webm(streamed)
    assert [p for _, _, p in info.frames] == pays
    assert info.duration_ms == 1000


def test_block_group_and_interframes():
    """A BlockGroup with ReferenceBlock is an interframe: parsed,
    ordered, NOT a keyframe — and never decoded by keyframe sampling."""
    key = _fake_payloads(1)[0]
    inter = b"\x99" * 10
    blob = encode_webm_vp8([key], 8, 8, delays_ms=[1000])
    block = (_enc_size(1) + struct.pack(">h", 300) + b"\x00" + inter)
    group = _elem(_BLOCK_GROUP,
                  _elem(_BLOCK, block)
                  + _elem(_REFERENCE_BLOCK, b"\xff"))
    cluster = _elem(_CLUSTER, _uint_elem(_CLUSTER_TS, 0) + group)
    # Append the extra cluster inside the Segment by rebuilding it.
    seg_id = _enc_id(_SEGMENT)
    at = blob.index(seg_id)
    first = blob[at + len(seg_id)]
    size_len = 1
    m = 0x80
    while not (first & m):
        m >>= 1
        size_len += 1
    seg_payload = blob[at + len(seg_id) + size_len:] + cluster
    rebuilt = blob[:at] + _elem(_SEGMENT, seg_payload)
    info = parse_webm(rebuilt)
    assert [(t, k) for t, k, _ in info.frames] == [(0, True),
                                                   (300, False)]


def test_error_paths():
    with pytest.raises(ValueError, match="webm"):
        parse_webm(b"\x00\x01\x02\x03 garbage")
    with pytest.raises(ValueError, match="EBML"):
        parse_webm(b"\x1f\x43\xb6\x75\x84abcd")  # valid id, not EBML
    # Laced SimpleBlock -> explicit plug point.
    pays = _fake_payloads(1)
    blob = encode_webm_vp8(pays, 8, 8, delays_ms=[500])
    laced = blob.replace(
        _enc_size(1) + struct.pack(">h", 0) + b"\x80",
        _enc_size(1) + struct.pack(">h", 0) + b"\x86")  # EBML lacing
    with pytest.raises(NotImplementedError, match="laced"):
        parse_webm(laced)
    # Non-VP8 codec -> plug point.
    vp9 = blob.replace(b"V_VP8", b"V_VP9")
    with pytest.raises(NotImplementedError, match="V_VP9"):
        parse_webm(vp9)
    # No keyframes -> data error.
    nokey = blob.replace(
        _enc_size(1) + struct.pack(">h", 0) + b"\x80",
        _enc_size(1) + struct.pack(">h", 0) + b"\x00")
    with pytest.raises(ValueError, match="keyframe"):
        decode_webm_keyframes(nokey)


def test_real_vp8_keyframe_decode(spark):
    """Reference-encoded VP8 keyframes through the full Spark
    frame-sampling path (the pytest twin of the media_real_frames
    WebM rows)."""
    from tools.libwebp_ref import available, encode_rgb

    if not available():
        pytest.skip("libwebp not available")
    from json_time_series_extractor_spark.operators.multimodal import (
        sample_video_frames)
    from json_time_series_extractor_spark.operators.vp8 import decode_vp8
    from json_time_series_extractor_spark.operators.codecs import (
        decode_png)

    rng = np.random.default_rng(11)
    imgs = [(rng.integers(0, 4, (24, 32, 3)) * 80).astype(np.uint8)
            for _ in range(2)]
    pays = []
    for img in imgs:
        webp = encode_rgb(img, 90.0)
        pos = 12
        while pos < len(webp):
            tag = webp[pos:pos + 4]
            ln = int.from_bytes(webp[pos + 4:pos + 8], "little")
            if tag == b"VP8 ":
                pays.append(webp[pos + 8:pos + 8 + ln])
                break
            pos += 8 + ln + (ln & 1)
    blob = encode_webm_vp8(pays, 32, 24, delays_ms=[600, 900])
    media = spark.createDataFrame(
        [(5, bytearray(blob), 0)],
        "media_id long, media binary, duration_ms int")
    rows = sorted(sample_video_frames(media, every_ms=500,
                                      decode_stub="real").collect(),
                  key=lambda r: r.frame_index)
    # duration 1500ms, samples at 0, 500, 1000 -> keyframes 0, 0, 1
    assert [r.frame_ts_ms for r in rows] == [0, 500, 1000]
    for r, want in zip(rows, [0, 0, 1]):
        out = decode_png(bytes(r.frame))
        assert np.array_equal(out[..., :3], decode_vp8(pays[want]))
