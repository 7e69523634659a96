"""Mergeable t-digest quantile tier: accuracy, merge property, cascade."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from json_time_series_extractor_spark.operators.tdigest import (
    _build,
    _estimate,
    _merge,
    rollup_tdigest,
    tdigest_cascade,
    tdigest_quantiles,
)


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    """Distance from q to est's empirical rank INTERVAL (tie-aware: a
    value with duplicate mass occupies a rank range) — the error the
    t-digest bounds."""
    s = np.sort(values)
    # Snap ulp-level weighted-mean rounding (a centroid of tied 1.1s can
    # average one ulp off 1.1) to the nearest datum before ranking.
    i = int(np.searchsorted(s, est))
    for j in (i - 1, i):
        if 0 <= j < len(s) and abs(est - s[j]) <= \
                1e-12 * max(abs(est), abs(s[j])):
            est = s[j]
            break
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    return 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))


def test_build_rank_accuracy_and_compression():
    """10k-point digests at delta=100 stay within 1% rank error at the
    body and 0.3% at the tails, with a bounded centroid count."""
    rng = np.random.default_rng(3)
    for dist in [rng.normal(100, 15, 10_000),
                 rng.lognormal(3, 1, 10_000),       # heavy tail
                 np.repeat(rng.integers(0, 50, 100), 100).astype(float)]:
        ms, ws, cnt, vmin, vmax = _build(dist, delta=100)
        assert cnt == len(dist)
        assert len(ms) <= 2 * 100
        assert ws.sum() == pytest.approx(len(dist))
        # Body tolerance includes one 1%-mass atom of slack: the discrete
        # distribution has 100 equal-mass values, so ANY estimator can sit
        # half an atom from q.
        for q, tol in [(0.5, 0.011), (0.95, 0.005), (0.99, 0.003)]:
            est = _estimate(ms, ws, cnt, vmin, vmax, q)
            assert _rank_error(dist, est, q) <= tol, (q, est)


def test_merge_matches_whole_build():
    """merge(digest(A), digest(B)) estimates within the same rank-error
    envelope as digest(A ∪ B) — the mergeability contract."""
    rng = np.random.default_rng(9)
    a, b = rng.normal(0, 1, 5_000), rng.normal(5, 2, 5_000)
    both = np.concatenate([a, b])
    merged = _merge([_build(a, 100), _build(b, 100)], 100)
    assert merged[2] == 10_000
    assert merged[3] == both.min() and merged[4] == both.max()
    for q in (0.5, 0.95, 0.99):
        est = _estimate(merged[0], merged[1], merged[2], merged[3],
                        merged[4], q)
        assert _rank_error(both, est, q) <= 0.015, q


def test_build_is_deterministic():
    """No RNG anywhere: same input -> bit-identical sketch."""
    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, 2_000)
    s1, s2 = _build(v.copy(), 100), _build(v.copy(), 100)
    assert (s1[0] == s2[0]).all() and (s1[1] == s2[1]).all()


def test_tiny_buckets_are_exact():
    """Buckets smaller than delta keep every point as a singleton
    centroid; min/max/median land exactly."""
    ms, ws, cnt, vmin, vmax = _build(np.array([3.0, 1.0, 2.0]), 100)
    assert (vmin, vmax, cnt) == (1.0, 3.0, 3)
    assert _estimate(ms, ws, cnt, vmin, vmax, 0.5) == 2.0
    assert _estimate(ms, ws, cnt, vmin, vmax, 0.0) == 1.0
    assert _estimate(ms, ws, cnt, vmin, vmax, 1.0) == 3.0


def _k1_bound(q: float, delta: int, cnt: int) -> float:
    """Rank-error budget from the k1 scale function. A cluster spans at
    most one k-unit, and dk/dq = delta / (pi * sqrt(q(1-q))), so the
    cluster's q-width at quantile q is <= pi*sqrt(q(1-q))/delta;
    midpoint interpolation can miss by about a cluster width (two
    half-clusters). Budget = 1.5 cluster widths + one point of discrete
    slack (1/cnt) — tight enough to catch a broken scale function or
    interpolator, loose enough to never flake on valid sketches."""
    import math
    return 1.5 * math.pi * math.sqrt(q * (1.0 - q)) / delta + 1.0 / cnt


@st.composite
def _adversarial_values(draw):
    """Distributions chosen to stress the sketch: heavy ties (equal-mass
    atoms), exponential/power tails, constant+outlier mixtures, uniform."""
    kind = draw(st.sampled_from(["ties", "exp", "mixed", "uniform",
                                 "constant"]))
    n = draw(st.integers(min_value=64, max_value=4000))
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    if kind == "ties":
        k = draw(st.integers(min_value=1, max_value=12))
        vals = rng.integers(-k, k + 1, n).astype(np.float64)
    elif kind == "exp":
        power = draw(st.sampled_from([1, 2, 3]))
        vals = rng.exponential(draw(st.floats(0.5, 50.0)), n) ** power
    elif kind == "mixed":
        vals = np.concatenate([np.full(n // 2, 3.14),
                               rng.normal(0.0, 1e6, n - n // 2)])
    elif kind == "constant":
        vals = np.full(n, draw(st.floats(-1e9, 1e9,
                                         allow_nan=False,
                                         allow_infinity=False)))
    else:
        vals = rng.uniform(-1e9, 1e9, n)
    return vals


_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


@settings(max_examples=60, deadline=None)
@given(values=_adversarial_values(), delta=st.sampled_from([50, 100, 200]))
def test_property_build_respects_k1_rank_bound(values, delta):
    """Hypothesis: for every adversarial distribution, each quantile
    estimate lands within the k1-scale rank-error budget of the exact
    empirical quantile (tie-aware), and the sketch invariants hold."""
    ms, ws, cnt, vmin, vmax = _build(values, delta)
    assert cnt == len(values)
    assert ws.sum() == pytest.approx(cnt)
    # Centroids stay sorted up to weighted-mean rounding: twenty tied
    # 3.14s can average to 3.139999...97, so allow ulp-scale inversions.
    scale = np.maximum(np.abs(ms[:-1]), np.abs(ms[1:])) + 1e-300
    assert (np.diff(ms) >= -1e-12 * scale).all()
    assert len(ms) <= 2 * delta + 1
    assert vmin == values.min() and vmax == values.max()
    # Same ulp slack on the range check: a centroid of tied 1.1s can
    # average one ulp below 1.1.
    rng_slack = 1e-12 * max(abs(vmin), abs(vmax)) + 1e-300
    for q in _QS:
        est = _estimate(ms, ws, cnt, vmin, vmax, q)
        assert vmin - rng_slack <= est <= vmax + rng_slack
        assert _rank_error(values, est, q) <= _k1_bound(q, delta, cnt), q


@settings(max_examples=40, deadline=None)
@given(values=_adversarial_values(),
       n_parts=st.integers(min_value=2, max_value=8),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_property_cascade_within_bound_of_direct_build(values, n_parts,
                                                       seed):
    """Hypothesis: merging per-part digests (the tier cascade) stays
    within 2x the k1 budget of the EXACT quantile, and within 3x of the
    direct whole-input build — cnt/min/max merge exactly. One extra
    budget unit covers the second compression pass of the merge."""
    delta = 100
    rng = np.random.default_rng(seed)
    parts = np.array_split(rng.permutation(values), n_parts)
    merged = _merge([_build(p, delta) for p in parts if len(p)], delta)
    direct = _build(values, delta)
    assert merged[2] == direct[2] == len(values)
    assert merged[3] == direct[3] and merged[4] == direct[4]
    for q in _QS:
        est_m = _estimate(merged[0], merged[1], merged[2], merged[3],
                          merged[4], q)
        est_d = _estimate(direct[0], direct[1], direct[2], direct[3],
                          direct[4], q)
        assert _rank_error(values, est_m, q) <= \
            2.0 * _k1_bound(q, delta, len(values)), q
        # Equivalence: the cascade may only drift from the direct build
        # by rank-bound amounts, never structurally.
        span = max(values.max() - values.min(), 1e-300)
        if span > 0:
            drift = _rank_error(values, est_m, q) \
                + _rank_error(values, est_d, q)
            assert drift <= 3.0 * _k1_bound(q, delta, len(values)), q


def test_vectorized_batch_build_is_bit_identical():
    """The segment-aware whole-batch build must equal per-bucket _build
    bit-for-bit (same floats, same cluster boundaries) on mixed bucket
    sizes incl. singletons and heavy ties."""
    from json_time_series_extractor_spark.operators.tdigest import (
        _build_batch_vectorized,
    )

    rng = np.random.default_rng(21)
    buckets = []
    for i in range(400):
        n = int(rng.integers(1, 60))
        if i % 5 == 0:
            vals = np.full(n, float(rng.integers(-3, 3)))
        else:
            vals = rng.normal(0, 10 ** (i % 4), n)
        buckets.append(np.sort(vals))
    for delta in (50, 100):
        ms_v, ws_v, cnts, vmins, vmaxs = _build_batch_vectorized(
            buckets, delta)
        for i, vals in enumerate(buckets):
            ms, ws, cnt, vmin, vmax = _build(vals, delta, presorted=True)
            assert cnts[i] == cnt and vmins[i] == vmin and vmaxs[i] == vmax
            assert len(ms_v[i]) == len(ms)
            assert (np.asarray(ms_v[i]) == ms).all(), (i, delta)
            assert (np.asarray(ws_v[i]) == ws).all(), (i, delta)


def test_vectorized_batch_merge_is_bit_identical():
    """The segment-aware whole-batch cascade merge must equal per-group
    _merge bit-for-bit — incl. stable tie ordering, integer-weight
    cumulative exactness, and the single-centroid early-return."""
    from json_time_series_extractor_spark.operators.tdigest import (
        _merge_batch_vectorized,
    )

    rng = np.random.default_rng(33)
    groups = []
    for i in range(250):
        n_parts = int(rng.integers(1, 6))
        parts = []
        for _ in range(n_parts):
            n = int(rng.integers(1, 40))
            vals = (np.full(n, 2.5) if i % 7 == 0
                    else rng.normal(0, 10 ** (i % 3), n))
            ms, ws, cnt, vmin, vmax = _build(np.sort(vals), 100,
                                             presorted=True)
            parts.append({"means": ms, "weights": ws, "cnt": cnt,
                          "vmin": vmin, "vmax": vmax})
        groups.append(parts)
    # One adversarial single-centroid group (hits the early-return).
    groups.append([{"means": np.array([1.0 / 3.0]),
                    "weights": np.array([3.0]), "cnt": 3,
                    "vmin": 0.3, "vmax": 0.35}])

    ms_v, ws_v, cnts, vmins, vmaxs = _merge_batch_vectorized(groups, 100)
    for i, parts in enumerate(groups):
        tuples = [(np.asarray(p["means"]), np.asarray(p["weights"]),
                   int(p["cnt"]), float(p["vmin"]), float(p["vmax"]))
                  for p in parts]
        ms, ws, cnt, vmin, vmax = _merge(tuples, 100)
        assert cnts[i] == cnt and vmins[i] == vmin and vmaxs[i] == vmax
        assert len(ms_v[i]) == len(ms), i
        assert (np.asarray(ms_v[i]) == ms).all(), i
        assert (np.asarray(ws_v[i]) == ws).all(), i


def test_spark_rollup_and_cascade(spark):
    """1m sketches cascade to 1h; the cascaded estimates agree with
    Spark's exact percentile within the rank-error tolerance, and cnt is
    exact. Coarse tier never re-reads raw data (sketch rows in)."""
    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    d1m = rollup_tdigest(samples, "1 minute", delta=100)
    d1h = tdigest_cascade(d1m, "1 hour", delta=100)
    got = {(r.series_key, r.bucket_ts): r
           for r in tdigest_quantiles(d1h).collect()}

    exact = {(r.series_key, r.bucket_ts): r for r in (
        samples.where(F.col("value_double").isNotNull())
        .groupBy("series_key",
                 F.window("ts", "1 hour")["start"].alias("bucket_ts"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             *[F.percentile("value_double", lo).alias(f"lo{i}")
               for i, lo in enumerate([0.40, 0.85, 0.89])],
             *[F.percentile("value_double", hi).alias(f"hi{i}")
               for i, hi in enumerate([0.60, 1.0, 1.0])])
        .collect())}

    assert got.keys() == exact.keys()
    eps = 1e-9
    for k, r in got.items():
        e = exact[k]
        assert r.cnt == e.cnt, k
        for i, est in enumerate([r.p50, r.p95, r.p99]):
            lo, hi = getattr(e, f"lo{i}"), getattr(e, f"hi{i}")
            assert lo - eps <= est <= hi + eps, (k, i, est, lo, hi)


def test_cascade_equals_direct_build_counts(spark):
    """cnt/vmin/vmax through the cascade == direct 1h build (the exact
    parts of the state merge exactly)."""
    samples = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
               .selectExpr("event_type AS series_key", "ts",
                           "value AS value_double"))
    via = {(r.series_key, r.bucket_ts): (r.cnt, r.vmin, r.vmax)
           for r in tdigest_cascade(
               rollup_tdigest(samples, "1 minute"), "1 hour").collect()}
    direct = {(r.series_key, r.bucket_ts): (r.cnt, r.vmin, r.vmax)
              for r in rollup_tdigest(samples, "1 hour").collect()}
    assert via == direct
