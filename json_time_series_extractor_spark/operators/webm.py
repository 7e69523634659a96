"""WebM (Matroska) container demux for video keyframe sampling.

From-scratch EBML parsing per RFC 8794 plus the public Matroska/WebM
element registry (matroska.org spec; WebM constrains codecs to
VP8/VP9/AV1 + Vorbis/Opus). Paired with the from-scratch VP8 keyframe
decoder (``operators/vp8.py``), this closes the ``webm`` branch of the
video plug point in ``multimodal.sample_video_frames``: real frame
sampling for VP8-in-WebM with zero native dependencies.

Scope (documented, not accidental):

- **Keyframe sampling.** VP8 interframes predict from prior frames;
  the keyframe-only decoder means sampling returns the most recent
  KEYFRAME at each sample point — the standard thumbnail/preview
  semantics. Non-key blocks are parsed (they advance nothing) and
  counted, never decoded.
- **VP8 video tracks.** V_VP9/V_AV1 raise the NotImplementedError
  plug-point (same taxonomy as the other codec plug points).
- **No lacing.** Video tracks are in practice one-frame-per-block;
  laced blocks raise NotImplementedError.
- Unknown-size elements (streamed files) are supported for Segment
  and Cluster — the two elements muxers actually leave open-ended —
  by scanning children until a non-child ID.

The module also carries a minimal muxer (:func:`encode_webm_vp8`) so
fixtures and tests can wrap reference-encoded VP8 payloads into real
containers — symmetric with ``codecs.encode_gif_animation``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# --- element IDs (marker bit included, as stored) ---
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB

#: Master elements whose children we descend into.
_MASTERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _CLUSTER,
            _BLOCK_GROUP}
#: Valid top-level children of an unknown-size Segment / Cluster —
#: anything else terminates the open-ended element.
_SEGMENT_CHILDREN = {_INFO, _TRACKS, _CLUSTER, 0x114D9B74, 0x1C53BB6B,
                     0x1254C367, 0x1941A469, 0x1043A770, 0x12B4}
_CLUSTER_CHILDREN = {_CLUSTER_TS, _SIMPLE_BLOCK, _BLOCK_GROUP, 0xA7,
                     0x5854, 0xAB}


def _read_id(buf: bytes, pos: int) -> Tuple[int, int]:
    """EBML element ID: length from the leading-zero count, value kept
    WITH the marker bit (how the registry lists IDs)."""
    if pos >= len(buf):
        raise ValueError("webm: truncated at element id")
    first = buf[pos]
    if first == 0:
        raise ValueError("webm: invalid element id")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
        if length > 4:
            raise ValueError("webm: element id longer than 4 bytes")
    if pos + length > len(buf):
        raise ValueError("webm: truncated element id")
    return int.from_bytes(buf[pos:pos + length], "big"), pos + length


def _read_size(buf: bytes, pos: int) -> Tuple[Optional[int], int]:
    """EBML data size: marker stripped; all-data-bits-set means
    'unknown size' (returned as None)."""
    if pos >= len(buf):
        raise ValueError("webm: truncated at element size")
    first = buf[pos]
    if first == 0:
        raise ValueError("webm: invalid element size")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(buf):
        raise ValueError("webm: truncated element size")
    val = first & (mask - 1)
    for b in buf[pos + 1:pos + length]:
        val = (val << 8) | b
    if val == (1 << (7 * length)) - 1:
        return None, pos + length
    return val, pos + length


def _uint(payload: bytes) -> int:
    return int.from_bytes(payload, "big")


def _float(payload: bytes) -> float:
    if len(payload) == 4:
        return struct.unpack(">f", payload)[0]
    if len(payload) == 8:
        return struct.unpack(">d", payload)[0]
    raise ValueError(f"webm: float element of {len(payload)} bytes")


@dataclass
class WebmVideoTrack:
    track_number: int
    codec_id: str
    width: int = 0
    height: int = 0


@dataclass
class WebmInfo:
    """Demux result: the first video track, its frames in container
    order, and the container duration."""
    track: Optional[WebmVideoTrack]
    #: (timestamp_ms, is_keyframe, payload)
    frames: List[Tuple[int, bool, bytes]] = field(default_factory=list)
    duration_ms: Optional[int] = None
    timestamp_scale_ns: int = 1_000_000


def _iter_children(buf: bytes, pos: int, end: int, allowed=None):
    """Yield (element_id, payload_start, payload_end); an unknown-size
    child is clamped to ``end``. When ``allowed`` is given (unknown-size
    parent), stop at the first ID outside it."""
    while pos < end:
        start = pos
        eid, pos = _read_id(buf, pos)
        if allowed is not None and eid not in allowed:
            return start
        size, pos = _read_size(buf, pos)
        payload_end = end if size is None else pos + size
        if payload_end > end:
            raise ValueError("webm: element overruns its parent")
        yield eid, pos, payload_end
        pos = payload_end
    return end


def _parse_track_entry(buf: bytes, pos: int, end: int) \
        -> Optional[WebmVideoTrack]:
    num, ttype, codec, w, h = None, None, "", 0, 0
    for eid, s, e in _iter_children(buf, pos, end):
        if eid == _TRACK_NUMBER:
            num = _uint(buf[s:e])
        elif eid == _TRACK_TYPE:
            ttype = _uint(buf[s:e])
        elif eid == _CODEC_ID:
            codec = buf[s:e].decode("ascii", "replace")
        elif eid == _VIDEO:
            for vid, vs, ve in _iter_children(buf, s, e):
                if vid == _PIXEL_W:
                    w = _uint(buf[vs:ve])
                elif vid == _PIXEL_H:
                    h = _uint(buf[vs:ve])
    if ttype == 1 and num is not None:
        return WebmVideoTrack(num, codec, w, h)
    return None


def _parse_block(buf: bytes, s: int, e: int, cluster_ts: int,
                 scale_ns: int, track_no: int,
                 out: List[Tuple[int, bool, bytes]],
                 keyframe: Optional[bool] = None) -> None:
    """(Simple)Block layout: track vint, int16 BE relative timestamp,
    flags, frame data. SimpleBlock carries keyframe-ness in flag bit
    0x80; for a BlockGroup Block the caller derives it from the
    presence of ReferenceBlock and passes it in."""
    tn, pos = _read_size(buf, s)  # track number is a plain vint
    if tn != track_no:
        return
    rel = struct.unpack(">h", buf[pos:pos + 2])[0]
    flags = buf[pos + 2]
    if (flags >> 1) & 0x3:
        raise NotImplementedError(
            "webm: laced blocks not supported (video tracks are "
            "one-frame-per-block in practice)")
    if keyframe is None:
        keyframe = bool(flags & 0x80)
    ts_ms = (cluster_ts + rel) * scale_ns // 1_000_000
    out.append((ts_ms, keyframe, buf[pos + 3:e]))


def parse_webm(blob: bytes) -> WebmInfo:
    """Demux a WebM byte string: header sanity, first video track,
    every block of that track with absolute ms timestamps."""
    pos = 0
    eid, pos = _read_id(blob, pos)
    if eid != _EBML:
        raise ValueError("webm: not an EBML stream")
    size, pos = _read_size(blob, pos)
    if size is None:
        raise ValueError("webm: unknown-size EBML header")
    hdr_end = pos + size
    for ceid, s, e in _iter_children(blob, pos, hdr_end):
        if ceid == _DOCTYPE:
            doctype = blob[s:e].decode("ascii", "replace").rstrip("\x00")
            if doctype not in ("webm", "matroska"):
                raise ValueError(f"webm: doctype {doctype!r}")
    pos = hdr_end
    eid, pos = _read_id(blob, pos)
    if eid != _SEGMENT:
        raise ValueError("webm: expected Segment after EBML header")
    seg_size, pos = _read_size(blob, pos)
    seg_end = len(blob) if seg_size is None else pos + seg_size

    info = WebmInfo(track=None)
    duration_ticks: Optional[float] = None
    # Pass 1: Info + Tracks (they precede clusters in every muxer, but
    # scan the whole segment to be safe).
    allowed = _SEGMENT_CHILDREN if seg_size is None else None
    clusters: List[Tuple[int, int]] = []
    for eid2, s, e in _iter_children(blob, pos, seg_end, allowed):
        if eid2 == _INFO:
            for ieid, is_, ie in _iter_children(blob, s, e):
                if ieid == _TS_SCALE:
                    info.timestamp_scale_ns = _uint(blob[is_:ie])
                elif ieid == _DURATION:
                    duration_ticks = _float(blob[is_:ie])
        elif eid2 == _TRACKS:
            for teid, ts_, te in _iter_children(blob, s, e):
                if teid == _TRACK_ENTRY and info.track is None:
                    info.track = _parse_track_entry(blob, ts_, te)
        elif eid2 == _CLUSTER:
            clusters.append((s, e))
    if duration_ticks is not None:
        info.duration_ms = int(duration_ticks
                               * info.timestamp_scale_ns // 1_000_000)
    if info.track is None:
        return info
    if info.track.codec_id.rstrip("\x00") != "V_VP8":
        raise NotImplementedError(
            f"webm: codec {info.track.codec_id!r} has no dependency-"
            "free decoder here (VP8 only; VP9/AV1 plug in at this "
            "boundary)")
    for s, e in clusters:
        cluster_ts = 0
        callowed = _CLUSTER_CHILDREN  # clusters may be unknown-size
        for ceid, cs, ce in _iter_children(blob, s, e, callowed):
            if ceid == _CLUSTER_TS:
                cluster_ts = _uint(blob[cs:ce])
            elif ceid == _SIMPLE_BLOCK:
                _parse_block(blob, cs, ce, cluster_ts,
                             info.timestamp_scale_ns,
                             info.track.track_number, out=info.frames)
            elif ceid == _BLOCK_GROUP:
                block_span = None
                has_ref = False
                for geid, gs, ge in _iter_children(blob, cs, ce):
                    if geid == _BLOCK:
                        block_span = (gs, ge)
                    elif geid == _REFERENCE_BLOCK:
                        has_ref = True
                if block_span is not None:
                    _parse_block(blob, block_span[0], block_span[1],
                                 cluster_ts, info.timestamp_scale_ns,
                                 info.track.track_number,
                                 out=info.frames, keyframe=not has_ref)
    info.frames.sort(key=lambda f: f[0])
    return info


def decode_webm_keyframes(blob: bytes):
    """Same contract as ``codecs.decode_gif_frames``: (frames, delays)
    where frames are RGB arrays and delays[i] is how long frame i is
    displayed. Frames are the VP8 KEYFRAMES (see module docstring);
    the final keyframe holds until the container duration when known,
    else for the previous inter-keyframe gap (1000 ms for a
    single-keyframe file)."""
    from json_time_series_extractor_spark.operators.vp8 import decode_vp8

    info = parse_webm(blob)
    if info.track is None:
        raise ValueError("webm: no video track")
    keys = [(t, p) for t, k, p in info.frames if k]
    if not keys:
        raise ValueError("webm: no keyframes in VP8 track")
    frames = [decode_vp8(p) for _, p in keys]
    delays = [keys[i + 1][0] - keys[i][0] for i in range(len(keys) - 1)]
    last_start = keys[-1][0]
    if info.duration_ms is not None and info.duration_ms > last_start:
        delays.append(info.duration_ms - last_start)
    else:
        delays.append(delays[-1] if delays else 1000)
    return frames, delays


# ---------------------------------------------------------------------------
# minimal muxer (fixture/test support)
# ---------------------------------------------------------------------------

def _enc_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("webm: size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint_elem(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _elem(eid, v.to_bytes(n, "big"))


def encode_webm_vp8(payloads: List[bytes], width: int, height: int, *,
                    delays_ms: List[int]) -> bytes:
    """Wrap VP8 keyframe payloads into a minimal valid WebM: one
    cluster per frame (sidesteps the int16 relative-timestamp bound),
    1 ms timestamp ticks, Duration = sum of delays."""
    if len(payloads) != len(delays_ms):
        raise ValueError("payloads/delays length mismatch")
    header = _elem(_EBML, b"".join([
        _uint_elem(0x4286, 1),           # EBMLVersion
        _uint_elem(0x42F7, 1),           # EBMLReadVersion
        _uint_elem(0x42F2, 4),           # EBMLMaxIDLength
        _uint_elem(0x42F3, 8),           # EBMLMaxSizeLength
        _elem(_DOCTYPE, b"webm"),
        _uint_elem(0x4287, 2),           # DocTypeVersion
        _uint_elem(0x4285, 2),           # DocTypeReadVersion
    ]))
    total = sum(delays_ms)
    seg_info = _elem(_INFO, b"".join([
        _uint_elem(_TS_SCALE, 1_000_000),
        _elem(_DURATION, struct.pack(">d", float(total))),
    ]))
    tracks = _elem(_TRACKS, _elem(_TRACK_ENTRY, b"".join([
        _uint_elem(_TRACK_NUMBER, 1),
        _uint_elem(0x73C5, 1),           # TrackUID
        _uint_elem(_TRACK_TYPE, 1),      # video
        _elem(_CODEC_ID, b"V_VP8"),
        _elem(_VIDEO, _uint_elem(_PIXEL_W, width)
              + _uint_elem(_PIXEL_H, height)),
    ])))
    clusters = []
    t = 0
    for payload, d in zip(payloads, delays_ms):
        sb = _elem(_SIMPLE_BLOCK,
                   _enc_size(1) + struct.pack(">h", 0) + b"\x80"
                   + payload)
        clusters.append(_elem(_CLUSTER, _uint_elem(_CLUSTER_TS, t) + sb))
        t += d
    segment = _elem(_SEGMENT, seg_info + tracks + b"".join(clusters))
    return header + segment
