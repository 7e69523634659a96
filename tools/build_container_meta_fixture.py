"""Build tests/fixtures/media_container_meta.parquet — the container
metadata oracle fixture (MP3 / MP4 / WebM).

Independence discipline (same as build_conformance_fixture.py): every
blob is constructed HERE, byte-by-byte from the public specs (ISO/IEC
11172-3 frame headers, ISO/IEC 14496-12 boxes, RFC 8794 EBML via the
repo's muxer for the WebM blob only), and every expectation column is
stamped from the a-priori construction parameters with spec arithmetic
inlined below — ``operators/mediameta.py`` is never imported, so a
parser bug cannot leak into the expected values.

Deterministic: fixed parameters, seeded filler. Re-run only when the
fixture *contents* are intended to change:

    python tools/build_container_meta_fixture.py
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/tests/fixtures/media_container_meta.parquet"

# --- spec tables, re-typed here on purpose (NOT imported) -----------
_SR = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
       0: (11025, 12000, 8000)}
_BR = {
    (3, 3): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (3, 1): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (2, 3): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 1): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}


def mp3_frame(version: int, layer: int, br_idx: int, sr_idx: int,
              padding: int, rng) -> tuple:
    """-> (frame_bytes, samples, sample_rate, bitrate_kbps)."""
    h = (0x7FF << 21) | (version << 19) | (layer << 17) | (1 << 16) \
        | (br_idx << 12) | (sr_idx << 10) | (padding << 9)
    sr = _SR[version][sr_idx]
    br = _BR[(3 if version == 3 else 2, layer)][br_idx]
    if layer == 3:
        samples, flen = 384, (12000 * br // sr + padding) * 4
    elif layer == 2:
        samples, flen = 1152, 144000 * br // sr + padding
    else:
        samples = 1152 if version == 3 else 576
        flen = (144000 if version == 3 else 72000) * br // sr + padding
    body = bytes(int(b) for b in rng.integers(0, 256, flen - 4))
    return struct.pack(">I", h) + body, samples, sr, br


def mp3_stream(specs, rng, id3: int = 0):
    """specs: list of (version, layer, br_idx, sr_idx, padding).
    -> (blob, expectations dict) with exact spec arithmetic."""
    blob = b""
    if id3:
        ss = bytes([(id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F,
                    (id3 >> 7) & 0x7F, id3 & 0x7F])
        blob += b"ID3" + bytes([4, 0, 0]) + ss + bytes(id3)
    total_samples = total_bytes = 0
    sr0 = None
    brs = set()
    for spec in specs:
        fb, samples, sr, br = mp3_frame(*spec, rng)
        blob += fb
        total_samples += samples
        total_bytes += len(fb)
        sr0 = sr
        brs.add(br)
    dur = total_samples * 1000 // sr0
    avg = (total_bytes * 8 * sr0 // total_samples + 500) // 1000
    return blob, {"container": "mp3", "duration_ms": dur,
                  "sample_rate": sr0, "bitrate_kbps": avg,
                  "n_frames": len(specs), "vbr": len(brs) > 1}


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


def trak(handler: bytes, fourcc: bytes, width: int = 0, height: int = 0,
         tkhd_version: int = 0, stts=None, stss=None,
         mdhd_timescale: int = 0, mdhd_version: int = 0) -> bytes:
    if tkhd_version:
        tk = bytes([1, 0, 0, 7]) + bytes(80)
    else:
        tk = bytes([0, 0, 0, 7]) + bytes(72)
    tk += struct.pack(">II", width << 16, height << 16)
    hdlr = box(b"hdlr", bytes(8) + handler + bytes(13))
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    stbl = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    mdia_head = hdlr
    if stts is not None:
        # §8.6.1.2 TimeToSampleBox: (sample_count, sample_delta) runs.
        stbl += box(b"stts", bytes([0, 0, 0, 0])
                    + struct.pack(">I", len(stts))
                    + b"".join(struct.pack(">II", c, d)
                               for c, d in stts))
        if stss is not None:
            # §8.6.2 SyncSampleBox: 1-based sync sample numbers;
            # omitted entirely when every sample is sync.
            stbl += box(b"stss", bytes([0, 0, 0, 0])
                        + struct.pack(">I", len(stss))
                        + b"".join(struct.pack(">I", n) for n in stss))
        # §8.4.2 MediaHeaderBox carries the MEDIA timescale the sample
        # deltas are expressed in (distinct from the movie timescale).
        if mdhd_version:
            mh = bytes([1, 0, 0, 0]) + struct.pack(
                ">QQIQ", 0, 0, mdhd_timescale, 0) + bytes(4)
        else:
            mh = bytes([0, 0, 0, 0]) + struct.pack(
                ">IIII", 0, 0, mdhd_timescale, 0) + bytes(4)
        mdia_head = box(b"mdhd", mh) + hdlr
    mdia = box(b"mdia", mdia_head + box(b"minf", box(b"stbl", stbl)))
    return box(b"trak", box(b"tkhd", tk) + mdia)


def keyframe_expect(stts, stss, mdhd_timescale):
    """Expected (n_samples, n_keyframes, keyframe_ts_ms) by FULL
    expansion of the stts run-length table — deliberately a different
    algorithm than any parser might use. Spec arithmetic: decode time
    of sample n (1-based) is the sum of the first n-1 deltas, floored
    to ms in the MEDIA timescale; no stss means every sample is sync."""
    deltas = [d for c, d in stts for _ in range(c)]
    dts = [0]
    for d in deltas[:-1]:
        dts.append(dts[-1] + d)
    syncs = stss if stss is not None else range(1, len(deltas) + 1)
    ts = [dts[n - 1] * 1000 // mdhd_timescale for n in syncs]
    return len(deltas), len(ts), ts


def mp4_blob(brand: bytes, timescale: int, duration: int, *,
             mvhd_version: int = 0, large_moov: bool = False,
             traks=()) -> tuple:
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isomiso2")
    tk = b"".join(t[0] for t in traks)
    blob = ftyp + box(b"moov", mvhd(timescale, duration, mvhd_version)
                      + tk, large=large_moov) + box(b"mdat", bytes(48))
    vid = next((t for t in traks if t[1] == "vide"), None)
    aud = next((t for t in traks if t[1] == "soun"), None)
    return blob, {"container": "mp4",
                  "duration_ms": duration * 1000 // timescale,
                  "width": vid[3] if vid else None,
                  "height": vid[4] if vid else None,
                  "video_codec": vid[2] if vid else None,
                  "audio_codec": aud[2] if aud else None,
                  "track_count": len(traks),
                  "brand": brand.decode()}


def main() -> None:
    rng = np.random.default_rng(0xC0117A)
    rows = []

    # -- three MP3 streams --
    rows.append(mp3_stream([(3, 1, 9, 0, i % 2) for i in range(40)],
                           rng))                       # CBR 128k/44.1
    rows.append(mp3_stream([(3, 1, br, 1, 0)
                            for br in (5, 9, 14, 11, 7, 9)], rng,
                           id3=300))                   # VBR 48k + ID3
    rows.append(mp3_stream([(2, 1, 8, 1, 0) for _ in range(25)],
                           rng))                       # MPEG2 24k
    rows.append(mp3_stream([(3, 3, 4, 2, 1) for _ in range(18)],
                           rng))                       # Layer I 32k

    # -- three MP4 movies --
    v = (trak(b"vide", b"avc1", 640, 360), "vide", "avc1", 640, 360)
    a = (trak(b"soun", b"mp4a"), "soun", "mp4a", None, None)
    rows.append(mp4_blob(b"isom", 600, 3003, traks=(v, a)))
    v1 = (trak(b"vide", b"hev1", 1920, 1080, tkhd_version=1),
          "vide", "hev1", 1920, 1080)
    rows.append(mp4_blob(b"mp42", 90000, 2 ** 33, mvhd_version=1,
                         large_moov=True, traks=(v1,)))
    rows.append(mp4_blob(b"isom", 1000, 7500, traks=(a,)))

    # -- two MP4 movies with sample tables (r7): keyframe timestamps
    #    from stts/stss alone, no bitstream decode --
    stts_a = [(10, 1001), (5, 3003)]      # NTSC mixed-rate runs
    stss_a = [1, 4, 11, 15]
    va = (trak(b"vide", b"avc1", 1280, 720, stts=stts_a, stss=stss_a,
               mdhd_timescale=30000, mdhd_version=1),
          "vide", "avc1", 1280, 720)
    exp_a = keyframe_expect(stts_a, stss_a, 30000)
    b4, e4 = mp4_blob(b"isom", 600, 15 * 600, traks=(va,))
    e4.update(n_samples=exp_a[0], n_keyframes=exp_a[1],
              keyframe_ts_ms=exp_a[2])
    rows.append((b4, e4))

    stts_b = [(4, 500)]                   # all-sync: stss omitted
    vb = (trak(b"vide", b"vp09", 320, 180, stts=stts_b, stss=None,
               mdhd_timescale=1000),
          "vide", "vp09", 320, 180)
    exp_b = keyframe_expect(stts_b, None, 1000)
    b5, e5 = mp4_blob(b"mp42", 1000, 2000, traks=(vb,))
    e5.update(n_samples=exp_b[0], n_keyframes=exp_b[1],
              keyframe_ts_ms=exp_b[2])
    rows.append((b5, e5))

    # -- one WebM (blob via the repo muxer; expectations are the
    #    construction parameters, not a parse) --
    from json_time_series_extractor_spark.operators.webm import (
        encode_webm_vp8)
    payloads = [bytes(int(b) for b in rng.integers(0, 256, 64))
                for _ in range(3)]
    delays = [250, 400, 350]
    webm = encode_webm_vp8(payloads, 48, 32, delays_ms=delays)
    # Keyframe expectations from the construction parameters: the
    # muxer stamps every SimpleBlock keyframe (flag 0x80) and clusters
    # start at the cumulative delay prefix sums.
    kf_ts = [0]
    for d in delays[:-1]:
        kf_ts.append(kf_ts[-1] + d)
    rows.append((webm, {"container": "webm",
                        "duration_ms": sum(delays),
                        "width": 48, "height": 32,
                        "video_codec": "V_VP8", "track_count": 1,
                        "n_samples": len(payloads),
                        "n_keyframes": len(payloads),
                        "keyframe_ts_ms": kf_ts}))

    cols = ["container", "duration_ms", "sample_rate", "bitrate_kbps",
            "n_frames", "vbr", "width", "height", "video_codec",
            "audio_codec", "track_count", "brand", "n_samples",
            "n_keyframes", "keyframe_ts_ms"]
    types = {"container": pa.string(), "duration_ms": pa.int64(),
             "sample_rate": pa.int32(), "bitrate_kbps": pa.int32(),
             "n_frames": pa.int32(), "vbr": pa.bool_(),
             "width": pa.int32(), "height": pa.int32(),
             "video_codec": pa.string(), "audio_codec": pa.string(),
             "track_count": pa.int32(), "brand": pa.string(),
             "n_samples": pa.int32(), "n_keyframes": pa.int32(),
             "keyframe_ts_ms": pa.list_(pa.int64())}
    table = pa.table(
        {"media_id": pa.array(range(len(rows)), pa.int64()),
         "media": pa.array([r[0] for r in rows], pa.binary()),
         **{c: pa.array([r[1].get(c) for r in rows], types[c])
            for c in cols}})
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {len(rows)} blobs "
          f"({sum(1 for r in rows if r[1]['container'] == 'mp3')} mp3, "
          f"{sum(1 for r in rows if r[1]['container'] == 'mp4')} mp4, "
          f"{sum(1 for r in rows if r[1]['container'] == 'webm')} webm)")


if __name__ == "__main__":
    main()
