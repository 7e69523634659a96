"""Gorilla-style time-series chunk codec (pure Python/numpy, Spark-free).

Implements the two encodings from Facebook's Gorilla paper (Pelkonen et al.,
VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory Time Series Database" —
see PAPERS.md) adapted to microsecond-resolution int64 timestamps:

- **Delta-of-delta timestamps** (§4.1): first timestamp verbatim (64 bits),
  first delta 64 bits, then each delta-of-delta is bucketed:
  ``0`` -> dod == 0; ``10`` + 7 bits; ``110`` + 9 bits; ``1110`` + 12 bits;
  ``11110`` + 32 bits; ``11111`` + 64 bits (extra tier for microsecond
  gaps — the paper's seconds-resolution buckets cap at 32 bits).
  Signed values use the paper's offset encoding (value + 2^(bits-1)).

- **XOR float values** (§4.2): first value verbatim; afterwards
  ``0`` -> identical bits; ``10`` -> XOR fits the previous
  leading/meaningful window; ``11`` + 5-bit leading-zero count + 6-bit
  meaningful-bit length + the bits. NaN and signed zero round-trip exactly
  (bit-level semantics).

This is new code for the new engine (the reference library has no storage
or compression at all); it runs inside ``applyInPandas`` per
(series_key, chunk) group — see ``..operators.chunks``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


class _BitWriter:
    __slots__ = ("_buf", "_acc", "_nbits")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, bits: int) -> None:
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._nbits += bits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def getvalue(self) -> bytes:
        if self._nbits:
            return bytes(self._buf) + bytes(
                [(self._acc << (8 - self._nbits)) & 0xFF])
        return bytes(self._buf)


class _BitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def read(self, bits: int) -> int:
        # O(1)-ish: slice the covering bytes, shift off the tail.
        pos = self._pos
        end = pos + bits
        chunk = int.from_bytes(self._data[pos >> 3:(end + 7) >> 3], "big")
        self._pos = end
        return (chunk >> ((((end + 7) >> 3) << 3) - end)) & ((1 << bits) - 1)


# (prefix_bits, prefix_value, payload_bits) tiers for delta-of-delta.
_DOD_TIERS: Tuple[Tuple[int, int, int], ...] = (
    (2, 0b10, 7),
    (3, 0b110, 9),
    (4, 0b1110, 12),
    (5, 0b11110, 32),
    (5, 0b11111, 64),
)


def _wrap64(value: int) -> int:
    """Two's-complement wrap to signed 64-bit (delta arithmetic stays
    closed under int64 even for adversarial inputs)."""
    value &= (1 << 64) - 1
    return value - (1 << 64) if value >= (1 << 63) else value


def encode_timestamps(ts_us: Sequence[int]) -> bytes:
    """Delta-of-delta encode int64 microsecond timestamps (must be sorted)."""
    w = _BitWriter()
    n = len(ts_us)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts_us[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    prev = int(ts_us[0])
    prev_delta = _wrap64(int(ts_us[1]) - prev)
    w.write(prev_delta & ((1 << 64) - 1), 64)
    prev = int(ts_us[1])
    for i in range(2, n):
        t = int(ts_us[i])
        delta = _wrap64(t - prev)
        dod = _wrap64(delta - prev_delta)
        prev, prev_delta = t, delta
        if dod == 0:
            w.write(0, 1)
            continue
        for prefix_bits, prefix, payload in _DOD_TIERS:
            half = 1 << (payload - 1)
            if -half <= dod < half:
                w.write(prefix, prefix_bits)
                w.write(dod + half, payload)
                break
    return w.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    prev, prev_delta = int(out[1]), delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            tier = 0
            while tier < len(_DOD_TIERS) - 1 and r.read(1) == 1:
                tier += 1
            payload = _DOD_TIERS[tier][2]
            half = 1 << (payload - 1)
            dod = r.read(payload) - half
        prev_delta = _wrap64(prev_delta + dod)
        prev = _wrap64(prev + prev_delta)
        out[i] = prev
    return out


def encode_values(values: Sequence[float]) -> bytes:
    """Gorilla XOR-encode float64 values (bit-exact incl. NaN, -0.0)."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_mlen = 65, 0  # invalid window -> first XOR forces '11'
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        if lead > 31:
            lead = 31  # 5-bit field; clamping only pads, never corrupts
        trail = (xor & -xor).bit_length() - 1
        mlen = 64 - lead - trail
        if (prev_lead <= lead
                and (64 - prev_lead - prev_mlen) <= trail):
            # Fits the previous window: '10' + meaningful bits of that window.
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_mlen), prev_mlen)
        else:
            # New window: '11' + 5-bit lead + 6-bit mlen + bits.
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen, 6)  # mlen in [1, 64]; 64 encodes as 0
            w.write(xor >> trail, mlen)
            prev_lead, prev_mlen = lead, mlen
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = 0, 0
    for i in range(1, n):
        flag = r.read(1)
        if flag == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            payload = r.read(mlen)
            xor = payload << (64 - lead - mlen)
        else:  # '11' new window
            lead = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
            payload = r.read(mlen)
            xor = payload << (64 - lead - mlen)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def encode_chunk(ts_us: Sequence[int], values: Sequence[float],
                 ) -> Tuple[bytes, bytes]:
    return encode_timestamps(ts_us), encode_values(values)


def decode_chunk(ts_blob: bytes, val_blob: bytes,
                 ) -> Tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(ts_blob), decode_values(val_blob)
