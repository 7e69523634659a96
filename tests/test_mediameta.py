"""Container-metadata parsers (mp3 / mp4 / webm) — hand-built,
spec-derived bitstreams with a-priori expectations, plus the Spark
operator path.  Spec arithmetic is inlined here independently of the
module under test (same independence discipline as the conformance
fixture)."""

import struct

import numpy as np
import pytest

from json_time_series_extractor_spark.operators.mediameta import (
    extract_container_metadata,
    parse_container_metadata,
    parse_mp3,
    parse_mp4,
)


# --- builders (no imports from mediameta's tables) ------------------

def mp3_frame(version: int, layer: int, br_idx: int, sr_idx: int,
              padding: int, fill: int = 0xA5) -> bytes:
    """One MPEG audio frame built from raw header fields; the body is
    deterministic filler.  Frame length computed here from the spec
    formulas, not from the module."""
    h = (0x7FF << 21) | (version << 19) | (layer << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (padding << 9)
    hdr = struct.pack(">I", h)
    # spec tables, re-typed here on purpose
    sr = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}[version][sr_idx]
    if layer == 3:       # Layer I
        br = {3: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
                  352, 384, 416, 448),
              2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                  192, 224, 256)}[3 if version == 3 else 2][br_idx]
        flen = (12000 * br // sr + padding) * 4
    elif layer == 2:     # Layer II
        br = {3: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320, 384),
              2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  144, 160)}[3 if version == 3 else 2][br_idx]
        flen = 144000 * br // sr + padding
    else:                # Layer III
        br = {3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                  224, 256, 320),
              2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  144, 160)}[3 if version == 3 else 2][br_idx]
        flen = (144000 if version == 3 else 72000) * br // sr + padding
    return hdr + bytes([fill]) * (flen - 4)


def id3v2(size: int, footer: bool = False) -> bytes:
    assert size < 1 << 28
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    tag = b"ID3" + bytes([4, 0, 0x10 if footer else 0]) + ss
    tag += bytes(size)
    if footer:
        tag += b"3DI" + bytes([4, 0, 0x10]) + ss
    return tag


def box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype \
            + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version:
        body = bytes([1, 0, 0, 0]) + struct.pack(">QQIQ", 0, 0,
                                                 timescale, duration)
    else:
        body = bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) \
        + bytes(10) + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                                  0, 0, 0x40000000) + bytes(24) \
        + struct.pack(">I", 99)
    return box(b"mvhd", body)


def tkhd(width: int, height: int, version: int = 0) -> bytes:
    if version:
        body = bytes([1, 0, 0, 7]) + bytes(84 - 4)
    else:
        body = bytes([0, 0, 0, 7]) + bytes(76 - 4)
    body += struct.pack(">II", width << 16, height << 16)
    return box(b"tkhd", body)


def trak(handler: bytes, fourcc: bytes, width: int = 0, height: int = 0,
         tkhd_version: int = 0) -> bytes:
    hdlr = box(b"hdlr", bytes(8) + handler + bytes(13))
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    return box(b"trak", tkhd(width, height, tkhd_version) + mdia)


def mp4_blob(timescale: int, duration: int, *, mvhd_version: int = 0,
             large_moov: bool = False, traks: bytes = b"") -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    moov = box(b"moov", mvhd(timescale, duration, mvhd_version) + traks,
               large=large_moov)
    return ftyp + moov + box(b"mdat", b"\x00" * 32)


# --- mp3 ------------------------------------------------------------

def test_mp3_cbr_exact_duration_and_bitrate():
    # MPEG1 Layer III, 128 kbps, 44100 Hz, alternating padding: the
    # canonical stream. 30 frames of 1152 samples.
    frames = b"".join(mp3_frame(3, 1, 9, 0, i % 2) for i in range(30))
    m = parse_mp3(frames)
    assert m["n_frames"] == 30
    assert m["sample_rate"] == 44100
    assert m["duration_ms"] == 30 * 1152 * 1000 // 44100  # 783
    assert m["vbr"] is False
    # frame-length-weighted average must land back on ~128
    assert m["bitrate_kbps"] == 128


def test_mp3_vbr_and_id3_and_trailer():
    body = b"".join(mp3_frame(3, 1, br, 1, 0)        # 48 kHz, varying
                    for br in (5, 9, 14, 9, 5))
    blob = id3v2(200, footer=True) + body + b"TAG" + bytes(125)
    m = parse_mp3(blob)
    assert m["n_frames"] == 5
    assert m["sample_rate"] == 48000
    assert m["vbr"] is True
    assert m["duration_ms"] == 5 * 1152 * 1000 // 48000


def test_mp3_mpeg2_halved_granule_and_layer1():
    # MPEG2 Layer III: 576 samples/frame at 24 kHz
    m = parse_mp3(b"".join(mp3_frame(2, 1, 8, 1, 0) for _ in range(20)))
    assert m["duration_ms"] == 20 * 576 * 1000 // 24000
    # MPEG1 Layer I: 384 samples/frame, 4-byte-slot padding
    m1 = parse_mp3(b"".join(mp3_frame(3, 3, 4, 2, 1) for _ in range(12)))
    assert m1["n_frames"] == 12
    assert m1["duration_ms"] == 12 * 384 * 1000 // 32000


def test_mp3_xing_tag_flags_vbr_and_truncation():
    f = mp3_frame(3, 1, 9, 0, 0)
    xing = f[:20] + b"Xing" + f[24:]
    assert parse_mp3(xing + mp3_frame(3, 1, 9, 0, 0))["vbr"] is True
    # truncated final frame is not counted
    full = b"".join(mp3_frame(3, 1, 9, 0, 0) for _ in range(3))
    assert parse_mp3(full + mp3_frame(3, 1, 9, 0, 0)[:100])[
        "n_frames"] == 3
    with pytest.raises(ValueError):
        parse_mp3(bytes(64))                    # no sync
    with pytest.raises(NotImplementedError):
        parse_mp3(mp3_frame(3, 1, 9, 0, 0)[:2] + b"\x00\x00")  # free fmt
    with pytest.raises(ValueError):
        parse_mp3(b"")


def test_mp3_random_streams_match_spec_arithmetic():
    """Property: any sequence of valid frame specs (one shared sample
    rate, mixed bitrates/padding/layers within a version) parses to
    the exact spec-arithmetic duration/bitrate/frame count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    spec = st.tuples(st.sampled_from([3, 2, 0]),      # version
                     st.sampled_from([1, 2, 3]),      # layer
                     st.integers(1, 14),              # bitrate idx
                     st.integers(0, 2),               # samplerate idx
                     st.integers(0, 1))               # padding

    @settings(max_examples=40, deadline=None)
    @given(st.lists(spec, min_size=1, max_size=12), st.data())
    def run(specs, data):
        # pin version+samplerate stream-wide (parser rejects mid-stream
        # samplerate changes, and version pins the bitrate table)
        v0, _l0, _b0, s0, _p0 = specs[0]
        specs = [(v0, l, b, s0, p) for (_v, l, b, _s, p) in specs]
        blob = b""
        total_samples = total_bytes = 0
        sr = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}[v0][s0]
        for (ver, layer, bi, si, pad) in specs:
            f = mp3_frame(ver, layer, bi, si, pad,
                          fill=data.draw(st.integers(0, 255)))
            blob += f
            total_bytes += len(f)
            total_samples += (384 if layer == 3
                              else 1152 if (layer == 2 or ver == 3)
                              else 576)
        m = parse_mp3(blob)
        assert m["n_frames"] == len(specs)
        assert m["sample_rate"] == sr
        assert m["duration_ms"] == total_samples * 1000 // sr
        assert m["bitrate_kbps"] == \
            (total_bytes * 8 * sr // total_samples + 500) // 1000

    run()


# --- mp4 ------------------------------------------------------------

def test_mp4_v0_and_v1_and_largesize():
    v = trak(b"vide", b"avc1", 640, 360)
    a = trak(b"soun", b"mp4a")
    m = parse_mp4(mp4_blob(600, 3003, traks=v + a))
    assert m == {"container": "mp4", "duration_ms": 3003 * 1000 // 600,
                 "width": 640, "height": 360, "video_codec": "avc1",
                 "audio_codec": "mp4a", "track_count": 2,
                 "brand": "isom",
                 # no stts in this trak -> sample-table fields null
                 "n_samples": None, "n_keyframes": None,
                 "keyframe_ts_ms": None}
    # 64-bit duration via version-1 mvhd inside a largesize moov,
    # version-1 tkhd layout
    v1 = trak(b"vide", b"hev1", 1920, 1080, tkhd_version=1)
    m1 = parse_mp4(mp4_blob(90000, 2 ** 33, mvhd_version=1,
                            large_moov=True, traks=v1))
    assert m1["duration_ms"] == (2 ** 33) * 1000 // 90000
    assert (m1["width"], m1["height"]) == (1920, 1080)
    assert m1["video_codec"] == "hev1"
    assert m1["audio_codec"] is None


def test_mp4_malformed():
    with pytest.raises(ValueError):
        parse_mp4(box(b"ftyp", b"isom" + bytes(8)))  # no moov
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 24)                      # no ftyp
    bad = mp4_blob(600, 100)
    with pytest.raises(ValueError):
        # corrupt the moov box size (ftyp is 24 bytes: 8 + 16 payload)
        parse_mp4(bad[:24] + struct.pack(">I", 1 << 30) + bad[28:])


# --- routing + spark path ------------------------------------------

def test_routing_and_webm(spark):
    from json_time_series_extractor_spark.operators.webm import (
        encode_webm_vp8)
    webm = encode_webm_vp8([b"\x10\x00\x00\x9d\x01\x2a\x10\x00\x10\x00"],
                           16, 16, delays_ms=[500])
    m = parse_container_metadata(webm)
    assert (m["container"], m["width"], m["video_codec"]) == \
        ("webm", 16, "V_VP8")
    with pytest.raises(ValueError):
        parse_container_metadata(b"RIFF\x00\x00\x00\x00WAVE")

    rows = [(0, mp4_blob(1000, 2500, traks=trak(b"vide", b"av01",
                                                320, 240))),
            (1, b"".join(mp3_frame(3, 1, 9, 0, 0) for _ in range(10))),
            (2, webm),
            (3, b"\xff\xfb" + bytes(30))]       # truncated mp3
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = extract_container_metadata(df, on_error="null") \
        .orderBy("media_id").collect()
    assert [r.container for r in out] == ["mp4", "mp3", "webm", None]
    assert out[0].duration_ms == 2500 and out[0].video_codec == "av01"
    assert out[1].n_frames == 10 and out[1].sample_rate == 44100
    assert out[2].video_codec == "V_VP8"
    skip = extract_container_metadata(df, on_error="skip").collect()
    assert len(skip) == 3
    with pytest.raises(Exception):
        extract_container_metadata(df, on_error="raise").collect()
    # map-only plan: no exchange
    plan = extract_container_metadata(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan

# --- mp4 sample tables (r7: keyframes without decode) ----------------

def _trak_with_samples(stts, stss, mts, mdhd_version=0,
                       fourcc=b"avc1"):
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(13))
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    stbl = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stbl += box(b"stts", bytes(4) + struct.pack(">I", len(stts))
                + b"".join(struct.pack(">II", c, d) for c, d in stts))
    if stss is not None:
        stbl += box(b"stss", bytes(4) + struct.pack(">I", len(stss))
                    + b"".join(struct.pack(">I", n) for n in stss))
    if mdhd_version:
        mh = bytes([1, 0, 0, 0]) + struct.pack(">QQIQ", 0, 0, mts, 0) \
            + bytes(4)
    else:
        mh = bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, mts, 0) \
            + bytes(4)
    mdia = box(b"mdia", box(b"mdhd", mh) + hdlr
               + box(b"minf", box(b"stbl", stbl)))
    return box(b"trak", tkhd(64, 48) + mdia)


def _expect_keyframes(stts, stss, mts):
    """Naive full expansion — deliberately a different algorithm than
    the module's run-length walker."""
    deltas = [d for c, d in stts for _ in range(c)]
    dts = [0]
    for d in deltas[:-1]:
        dts.append(dts[-1] + d)
    syncs = stss if stss is not None else range(1, len(deltas) + 1)
    return (len(deltas), len(syncs),
            [dts[n - 1] * 1000 // mts for n in syncs])


def test_mp4_keyframes_hand_computed():
    # Multi-run NTSC deltas, explicit sync table, v1 mdhd.
    stts, stss, mts = [(10, 1001), (5, 3003)], [1, 4, 11, 15], 30000
    m = parse_mp4(mp4_blob(
        600, 15 * 600,
        traks=_trak_with_samples(stts, stss, mts, mdhd_version=1)))
    assert (m["n_samples"], m["n_keyframes"]) == (15, 4)
    assert m["keyframe_ts_ms"] == [0, 100, 333, 734]
    # Absent stss -> every sample is a sync sample (spec rule).
    m2 = parse_mp4(mp4_blob(
        1000, 2000, traks=_trak_with_samples([(4, 500)], None, 1000)))
    assert (m2["n_samples"], m2["n_keyframes"]) == (4, 4)
    assert m2["keyframe_ts_ms"] == [0, 500, 1000, 1500]
    # The MEDIA timescale governs, not the movie timescale.
    m3 = parse_mp4(mp4_blob(
        999999, 1, traks=_trak_with_samples([(2, 48000)], [2], 48000)))
    assert m3["keyframe_ts_ms"] == [1000]


def test_mp4_keyframes_malformed():
    # stss sample number beyond the stts total.
    bad = mp4_blob(600, 600,
                   traks=_trak_with_samples([(3, 100)], [5], 1000))
    with pytest.raises(ValueError, match="out of range"):
        parse_mp4(bad)
    # stts entry count overrunning its box.
    t = _trak_with_samples([(3, 100)], None, 1000)
    with pytest.raises(ValueError, match="stts"):
        parse_mp4(mp4_blob(600, 600, traks=t.replace(
            b"stts" + bytes(4) + struct.pack(">I", 1),
            b"stts" + bytes(4) + struct.pack(">I", 99), 1)))


def test_mp4_keyframes_property_vs_naive_expansion():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        stts = data.draw(st.lists(
            st.tuples(st.integers(1, 20), st.integers(0, 10**6)),
            min_size=1, max_size=6))
        n = sum(c for c, _ in stts)
        use_stss = data.draw(st.booleans())
        stss = (sorted(data.draw(st.sets(st.integers(1, n), min_size=1,
                                         max_size=min(n, 10))))
                if use_stss else None)
        mts = data.draw(st.sampled_from([1, 600, 1000, 30000, 90000]))
        m = parse_mp4(mp4_blob(
            600, 600, traks=_trak_with_samples(stts, stss, mts)))
        exp = _expect_keyframes(stts, stss, mts)
        assert (m["n_samples"], m["n_keyframes"],
                m["keyframe_ts_ms"]) == exp

    run()
