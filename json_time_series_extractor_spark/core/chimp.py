"""Chimp float-compression codec (pure Python/numpy, Spark-free).

Implements the value encoding from Liakos, Papakonstantinopoulou &
Kotidis, "Chimp: Efficient Lossless Floating Point Compression for Time
Series Databases" (PVLDB 15(11), 2022 — see PAPERS.md). Chimp revisits
Gorilla's XOR scheme with two observations measured across real TSDB
datasets:

- trailing zeros in the XOR are usually either plentiful (>6) or absent,
  so Gorilla's always-present 6-bit trailing length is wasted on the
  common case — Chimp spends 2 flag bits to split the cases instead;
- leading-zero counts cluster, so 3 bits addressing the rounded classes
  {0, 8, 12, 16, 18, 20, 22, 24} replace Gorilla's 5-bit exact count.

Per value (after a verbatim 64-bit first value):

- ``00``                      — XOR == 0 (repeat).
- ``01`` + 3-bit lead class + 6-bit significant length + the significant
  bits — the many-trailing-zeros case (trailing > 6).
- ``10`` + (64 - lead) bits  — lead class equals the previous one.
- ``11`` + 3-bit lead class + (64 - lead) bits — new lead class.

Like the Gorilla codec next door this is bit-exact for NaN payloads,
±0.0, infinities and denormals (pure uint64 bit semantics), and runs
inside ``applyInPandas`` per (series_key, chunk) group — timestamps keep
the delta-of-delta encoding from :mod:`.gorilla` (Chimp only redefines
the value stream). New code for the new engine: the reference library
(TimeSeriesExtractor.cs) has no storage or compression at all.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from json_time_series_extractor_spark.core.gorilla import (
    _BitReader,
    _BitWriter,
)

#: Leading-zero count -> rounded class value (round DOWN into the table,
#: so the class never overstates the true leading zeros).
_LEAD_CLASSES = (0, 8, 12, 16, 18, 20, 22, 24)


def _lead_round(lz: int) -> int:
    r = 0
    for c in _LEAD_CLASSES:
        if lz >= c:
            r = c
        else:
            break
    return r


_LEAD_REP = {c: i for i, c in enumerate(_LEAD_CLASSES)}
_TRAILING_THRESHOLD = 6


def encode_values(values: Sequence[float]) -> bytes:
    """Chimp-encode float64 values (bit-exact incl. NaN, -0.0)."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead = -1  # invalid: the first XOR can never take the '10' path
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0b00, 2)
            prev_lead = -1
            continue
        lead = _lead_round(64 - xor.bit_length())
        trail = (xor & -xor).bit_length() - 1
        if trail > _TRAILING_THRESHOLD:
            sig = 64 - lead - trail
            w.write(0b01, 2)
            w.write(_LEAD_REP[lead], 3)
            w.write(sig, 6)
            w.write(xor >> trail, sig)
            prev_lead = -1
        elif lead == prev_lead:
            w.write(0b10, 2)
            w.write(xor, 64 - lead)
        else:
            w.write(0b11, 2)
            w.write(_LEAD_REP[lead], 3)
            w.write(xor, 64 - lead)
            prev_lead = lead
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead = 0
    for i in range(1, n):
        flag = r.read(2)
        if flag == 0b00:
            out[i] = prev
            continue
        if flag == 0b01:
            lead = _LEAD_CLASSES[r.read(3)]
            sig = r.read(6)
            trail = 64 - lead - sig
            xor = r.read(sig) << trail
        elif flag == 0b10:
            xor = r.read(64 - lead)
        else:  # '11'
            lead = _LEAD_CLASSES[r.read(3)]
            xor = r.read(64 - lead)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)
