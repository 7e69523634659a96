"""Round-trip and property tests for the Gorilla chunk codec + operator."""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from json_time_series_extractor_spark.core import gorilla


def roundtrip_ts(ts):
    return gorilla.decode_timestamps(gorilla.encode_timestamps(ts))


def roundtrip_vals(vals):
    return gorilla.decode_values(gorilla.encode_values(vals))


def test_timestamps_regular_interval_compress_well():
    ts = np.arange(0, 3600, 60, dtype=np.int64) * 1_000_000
    blob = gorilla.encode_timestamps(ts)
    assert list(roundtrip_ts(ts)) == list(ts)
    # 60 timestamps x 8 bytes = 480 raw; DoD==0 after the first two -> tiny.
    assert len(blob) < 30


def test_timestamps_irregular():
    ts = [0, 1, 10, 11, 1_000_000_000, 1_000_000_001, 2**40, 2**40 + 7]
    assert list(roundtrip_ts(ts)) == ts


def test_timestamps_empty_single():
    assert list(roundtrip_ts([])) == []
    assert list(roundtrip_ts([1234567])) == [1234567]
    assert list(roundtrip_ts([-5, -3])) == [-5, -3]


def test_values_repeated_compress_to_one_bit_each():
    vals = [42.5] * 1000
    blob = gorilla.encode_values(vals)
    assert list(roundtrip_vals(vals)) == vals
    assert len(blob) < 4 + 8 + 1000 // 8 + 2


def test_values_specials_bit_exact():
    vals = [0.0, -0.0, math.nan, math.inf, -math.inf, 1e-300, -1e300]
    out = roundtrip_vals(vals)
    assert (np.asarray(vals).view(np.uint64) == out.view(np.uint64)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=60))
def test_values_roundtrip_property(vals):
    out = roundtrip_vals(vals)
    assert (np.asarray(vals, dtype=np.float64).view(np.uint64)
            == out.view(np.uint64)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=60))
def test_timestamps_roundtrip_property(deltas):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64))
    # Keep within int64 after cumsum (hypothesis values bounded above).
    assert list(roundtrip_ts(ts)) == list(ts)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=60))
def test_chimp_values_roundtrip_property(vals):
    from json_time_series_extractor_spark.core import chimp

    out = chimp.decode_values(chimp.encode_values(vals))
    assert (np.asarray(vals, dtype=np.float64).view(np.uint64)
            == out.view(np.uint64)).all()


def test_chimp_specials_and_flag_paths():
    """Hand-picked sequences that force every Chimp flag path: repeats
    ('00'), many trailing zeros ('01' — small-integer doubles XOR on
    exponent/high-mantissa bits only), stable lead class ('10'), and
    lead-class changes ('11'); bit-exact on specials."""
    from json_time_series_extractor_spark.core import chimp

    cases = [
        [0.0, -0.0, math.nan, math.inf, -math.inf, 1e-300, -1e300],
        [42.5] * 50,                             # '00' path
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],          # '01': integral doubles
        list(np.cumsum(np.full(40, 0.1))),       # '10': stable lead class
        [1.0, 1e300, 1e-300, -1.0, math.pi],     # '11': lead swings
    ]
    for vals in cases:
        out = chimp.decode_values(chimp.encode_values(vals))
        assert (np.asarray(vals, dtype=np.float64).view(np.uint64)
                == out.view(np.uint64)).all(), vals
    # the paper's headline: noisy walks beat Gorilla
    walk = list(np.cumsum(np.random.default_rng(3).normal(0, 1, 400)))
    assert len(chimp.encode_values(walk)) < \
        len(gorilla.encode_values(walk))


def test_chunk_operator_roundtrip_chimp_codec(spark):
    """compress/decompress with codec='chimp' roundtrips exactly and an
    unknown codec raises before any job runs."""
    from json_time_series_extractor_spark.operators.chunks import (
        compress_chunks,
        decompress_chunks,
    )

    rows = [("a", datetime(2024, 2, 5, 16 + i // 60, i % 60),
             float(np.sin(i)) * 100) for i in range(120)]
    samples = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    chunks = compress_chunks(samples, "1 hour", codec="chimp")
    decoded = sorted((r.series_key, r.ts, r.value_double)
                     for r in decompress_chunks(chunks,
                                                codec="chimp").collect())
    assert decoded == sorted(rows)
    with pytest.raises(ValueError):
        compress_chunks(samples, "1 hour", codec="zstd")


def test_chunk_operator_roundtrip(spark):
    from json_time_series_extractor_spark.operators.chunks import (
        compress_chunks,
        decompress_chunks,
    )

    def ts(minute, second=0):
        return datetime(2024, 2, 5, 16 + minute // 60, minute % 60, second)

    rows = [("a", ts(i), float(np.sin(i)) * 100) for i in range(150)] + \
           [("b", ts(i, 30), 7.0) for i in range(150)]
    samples = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    chunks = compress_chunks(samples, "1 hour")
    got_chunks = chunks.collect()
    # 150 minutes spans 3 distinct hours per key.
    assert len(got_chunks) == 6
    assert all(r.n > 0 for r in got_chunks)
    # Compression works: blobs much smaller than 16 bytes/point.
    total_blob = sum(len(r.ts_blob) + len(r.val_blob) for r in got_chunks)
    assert total_blob < 300 * 16 * 0.7

    decoded = sorted(
        (r.series_key, r.ts, r.value_double)
        for r in decompress_chunks(chunks).collect())
    assert decoded == sorted(rows)

def test_chunk_zone_maps_and_pruned_scan(spark):
    from pyspark.sql import functions as F

    from json_time_series_extractor_spark.operators.chunks import (
        compress_chunks,
        scan_chunks_pruned,
    )

    rows = (  # hour 0: low values; hour 1: high; hour 2: straddles 50
        [("a", datetime(2024, 2, 5, 0, m), 10.0 + m) for m in range(5)]
        + [("a", datetime(2024, 2, 5, 1, m), 90.0 + m) for m in range(5)]
        + [("a", datetime(2024, 2, 5, 2, m), 48.0 + m) for m in range(5)])
    samples = spark.createDataFrame(
        rows, "series_key string, ts timestamp, value_double double")
    chunks = compress_chunks(samples, "1 hour")

    # zone maps match the per-chunk truth
    stats = {r.chunk_start.hour: r for r in chunks.collect()}
    assert (stats[0].v_min, stats[0].v_max) == (10.0, 14.0)
    assert (stats[1].v_min, stats[1].v_max) == (90.0, 94.0)
    assert stats[0].ts_min == datetime(2024, 2, 5, 0, 0)
    assert stats[0].ts_max == datetime(2024, 2, 5, 0, 4)

    # value pruning: only hours 1 and 2 can contain v >= 50; the
    # straddling chunk is a partial false positive resolved by the
    # residual filter
    assert chunks.where(F.col("v_max") >= 50.0).count() == 2
    got = sorted((r.ts, r.value_double) for r in
                 scan_chunks_pruned(chunks, value_lo=50.0).collect())
    want = sorted((t, v) for _, t, v in rows if v >= 50.0)
    assert got == want

    # band query (both bounds) and time-range pruning compose
    got = sorted(r.value_double for r in scan_chunks_pruned(
        chunks, value_lo=11.0, value_hi=91.0,
        ts_lo=datetime(2024, 2, 5, 0, 1),
        ts_hi=datetime(2024, 2, 5, 1, 1)).collect())
    want = sorted(v for _, t, v in rows
                  if 11.0 <= v <= 91.0
                  and datetime(2024, 2, 5, 0, 1) <= t
                  <= datetime(2024, 2, 5, 1, 1))
    assert got == want

    # an envelope hit with zero qualifying samples contributes nothing
    assert scan_chunks_pruned(chunks, value_lo=94.5).count() == 0

    # the prune is a Column filter BEFORE the Python decode: the plan
    # filters the chunk frame, not only the decoded output
    plan = scan_chunks_pruned(chunks, value_lo=50.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "v_max" in plan  # stats-column predicate present pre-decode
