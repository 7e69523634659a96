"""Mergeable quantile sketch tier: t-digest rollup + cascade.

:func:`rollup.rollup_percentiles` is exact but terminal — exact
percentiles cannot cascade from tier state, so every coarser tier
re-scans raw samples. This module closes that gap with the merging
t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests", arXiv:1902.04023 — public algorithm): per-bucket sketch rows
whose state merges exactly like the mergeable histogram
(:func:`rollup.rollup_histogram`), but without pre-declared bounds and
with rank-error that tightens toward the tails (the p99-latency shape
the engine's north-star queries care about).

Sketch state per (series_key, bucket_ts): sorted centroid arrays
(means, weights) bounded by the ``delta`` size budget, plus exact
(cnt, min, max). Properties used here:

- **build** = batched merge pass over the bucket's sorted values
  (vectorized: cluster by floor(k1(q)) of the left cumulative rank;
  k1(q) = delta * (asin(2q-1)/pi + 1/2), the paper's scale function);
- **merge** = concatenate centroid lists, sort by mean, same pass —
  associative enough for tier cascades, deterministic (no RNG: cluster
  boundaries are a pure function of the sorted input);
- **estimate** = piecewise-linear interpolation over centroid midpoint
  ranks, with exact min/max anchoring the tails.

Spark shape: a JVM hash aggregate (``sort_array(collect_list(v))`` per
(series, bucket)) followed by a map-only ``mapInPandas`` that digests
whole Arrow batches of buckets per Python call. NOT ``applyInPandas``:
that fires one Python invocation per GROUP, and a 1-minute tier has one
group per series-minute — measured 190s vs ~2s for this shape at sf0.1
(~98k tiny groups; per-group invocation overhead dwarfs the math). The
cascade aggregates EXISTING sketch rows the same way, so coarse tiers
never touch raw data — the whole point. Quantile extraction is another
map-only pass.

At 100 TB: build shuffles once on (series, bucket) — identical
partitioning to every other rollup tier; the collect_list state is
bucket-bounded (the same bound applyInPandas would hold as a group).
The cascade shuffles one sketch row per (series, fine-bucket), thousands
of times smaller than raw. Skew follows the same analysis as rollup
(buckets bound the group size).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.rollup import _bucket

#: Sketch row schema shared by build and cascade.
TDIGEST_SCHEMA = (
    "series_key string, bucket_ts timestamp, means array<double>, "
    "weights array<double>, cnt long, vmin double, vmax double"
)

QUANTILE_SCHEMA = (
    "series_key string, bucket_ts timestamp, p50 double, p95 double, "
    "p99 double, cnt long"
)


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: int) -> Tuple[np.ndarray, np.ndarray]:
    """One batched merge pass: cluster sorted centroids by the k1 scale
    function of their left cumulative rank. Input must be sorted by mean;
    output is sorted, with at most ~2*delta centroids."""
    if len(means) <= 1:
        return means, weights
    total = weights.sum()
    q_left = (np.cumsum(weights) - weights) / total
    k = np.floor(delta * (np.arcsin(2.0 * q_left - 1.0) / np.pi + 0.5))
    grp = np.concatenate([[0], np.cumsum(k[1:] != k[:-1])])
    ws = np.bincount(grp, weights)
    ms = np.bincount(grp, weights * means) / ws
    return ms, ws


def _build(values: np.ndarray, delta: int, presorted: bool = False):
    """values (finite doubles) -> (means, weights, cnt, vmin, vmax)."""
    v = values if presorted else np.sort(values)
    ms, ws = _compress(v.astype(np.float64),
                       np.ones(len(v), dtype=np.float64), delta)
    return ms, ws, len(v), float(v[0]), float(v[-1])


def _merge(parts, delta: int):
    """parts: iterable of (means, weights, cnt, vmin, vmax) tuples."""
    all_m = np.concatenate([np.asarray(p[0], dtype=np.float64)
                            for p in parts])
    all_w = np.concatenate([np.asarray(p[1], dtype=np.float64)
                            for p in parts])
    order = np.argsort(all_m, kind="stable")
    ms, ws = _compress(all_m[order], all_w[order], delta)
    return (ms, ws, int(sum(p[2] for p in parts)),
            float(min(p[3] for p in parts)),
            float(max(p[4] for p in parts)))


def _estimate(means: np.ndarray, weights: np.ndarray, cnt: int,
              vmin: float, vmax: float, q: float) -> float:
    """Quantile estimate: linear interpolation over centroid midpoint
    ranks; the exact min/max anchor the segments outside the first/last
    midpoints (singleton tails are therefore exact)."""
    if cnt == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    mid = np.cumsum(weights) - weights / 2.0
    if target <= mid[0]:
        # min .. first centroid mean over [0, mid[0]]
        return float(vmin + (means[0] - vmin) * max(target, 0.0) / mid[0])
    if target >= mid[-1]:
        span = total - mid[-1]
        frac = 1.0 if span == 0 else min(target - mid[-1], span) / span
        return float(means[-1] + (vmax - means[-1]) * frac)
    i = int(np.searchsorted(mid, target, side="right"))
    frac = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(means[i - 1] + (means[i] - means[i - 1]) * frac)


def rollup_tdigest(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    delta: int = 100,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """Build one t-digest sketch row per (series, tier bucket) from raw
    samples. Nulls and NaNs are excluded (matching ``percentile``'s
    null handling; NaN would poison every centroid mean)."""
    v = F.col(value_col)
    prepared = (samples
                .where(v.isNotNull() & ~F.isnan(v.cast("double")))
                .select(F.col(key_col).alias("series_key"),
                        _bucket(ts_col, tier).alias("bucket_ts"),
                        v.cast("double").alias("_v")))
    # JVM-side: one sorted value array per bucket (hash aggregate,
    # bucket-bounded state), so Python sees one ROW per bucket and each
    # mapInPandas call digests a whole Arrow batch of buckets.
    grouped = (prepared.groupBy("series_key", "bucket_ts")
               .agg(F.sort_array(F.collect_list("_v")).alias("_vals")))
    return grouped.mapInPandas(digest_build_fn(delta), TDIGEST_SCHEMA)


def _build_batch_vectorized(vals_list, delta: int):
    """Digest EVERY bucket of an Arrow batch in one numpy pass.

    Equivalent to calling :func:`_build` per bucket (asserted
    bit-identical in tests — same elementwise arcsin/floor, same
    in-order bincount accumulation per cluster), but segment-aware: all
    buckets' sorted values are concatenated once, cluster boundaries are
    forced at bucket edges, and the per-cluster sums run over the whole
    batch. This removes the per-bucket Python/numpy call overhead that
    dominates fine tiers (~100k tiny buckets per batch).

    Returns (means_per_bucket, weights_per_bucket, cnts, vmins, vmaxs).
    """
    arrays = [np.asarray(v, dtype=np.float64) for v in vals_list]
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    if len(arrays) == 0 or lens.sum() == 0:
        return [], [], lens, np.empty(0), np.empty(0)
    concat = np.concatenate(arrays)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = concat.shape[0]
    # Left cumulative rank within each bucket: pos/len — exactly the
    # (cumsum(1)-1)/total floats the per-bucket path produces.
    pos = (np.arange(total, dtype=np.float64)
           - np.repeat(starts.astype(np.float64), lens))
    n_per = np.repeat(lens.astype(np.float64), lens)
    q_left = pos / n_per
    k = np.floor(delta * (np.arcsin(2.0 * q_left - 1.0) / np.pi + 0.5))
    boundary = np.empty(total, dtype=bool)
    boundary[0] = True
    boundary[1:] = k[1:] != k[:-1]
    boundary[starts] = True           # clusters never span buckets
    grp = np.cumsum(boundary) - 1
    ws_all = np.bincount(grp, np.ones(total, dtype=np.float64))
    ms_all = np.bincount(grp, np.float64(1.0) * concat) / ws_all
    seg_ids = np.repeat(np.arange(len(arrays)), lens)
    n_clusters = np.bincount(seg_ids[boundary], minlength=len(arrays))
    splits = np.cumsum(n_clusters)[:-1]
    return (np.split(ms_all, splits), np.split(ws_all, splits), lens,
            concat[starts], concat[starts + lens - 1])


def digest_build_fn(delta: int):
    """mapInPandas kernel turning (series_key, bucket_ts, _vals sorted
    array<double>) rows into TDIGEST_SCHEMA sketch rows. Shared by the
    batch build and the streaming tier (same kernel => the streaming
    sketches are bit-identical to batch on the same bucket contents)."""
    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ms, ws, cnts, vmins, vmaxs = _build_batch_vectorized(
                pdf["_vals"], delta)
            yield pd.DataFrame({
                "series_key": pdf["series_key"].to_numpy(),
                "bucket_ts": pdf["bucket_ts"].to_numpy(),
                "means": [list(m) for m in ms],
                "weights": [list(w) for w in ws],
                "cnt": cnts,
                "vmin": vmins,
                "vmax": vmaxs,
            })

    return build


def tdigest_cascade(child: DataFrame, tier: str, *,
                    delta: int = 100) -> DataFrame:
    """Merge a finer sketch tier into a coarser one — sketch rows in,
    sketch rows out, raw data never touched (the mergeable-percentile
    answer the exact tier can't give)."""

    # Same one-row-per-group shape as the build (see module docstring):
    # collect the child sketches per coarse bucket JVM-side, merge whole
    # Arrow batches of coarse buckets per Python call.
    grouped = (child
               .withColumn("_coarse", _bucket("bucket_ts", tier))
               .groupBy("series_key", "_coarse")
               .agg(F.collect_list(F.struct(
                   "means", "weights", "cnt", "vmin", "vmax"))
                   .alias("_parts")))

    def merge(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ms, ws, cnts, vmins, vmaxs = _merge_batch_vectorized(
                pdf["_parts"], delta)
            yield pd.DataFrame({
                "series_key": pdf["series_key"].to_numpy(),
                "bucket_ts": pdf["_coarse"].to_numpy(),
                "means": [list(m) for m in ms],
                "weights": [list(w) for w in ws],
                "cnt": cnts,
                "vmin": vmins,
                "vmax": vmaxs,
            })

    return grouped.mapInPandas(merge, TDIGEST_SCHEMA)


def _merge_batch_vectorized(parts_col, delta: int):
    """Merge EVERY coarse bucket of an Arrow batch in one numpy pass —
    the cascade analog of :func:`_build_batch_vectorized`, asserted
    bit-identical to per-group :func:`_merge` in tests.

    Exactness argument for the segment trick: tier weights are sums of
    unit weights, i.e. integer-valued float64s, so the global running
    sum minus each segment's base is EXACTLY the per-group cumulative
    sum (integer arithmetic below 2^53 is exact in float64), and the
    stable lexsort on (segment, mean) reproduces each group's stable
    mean argsort including tie order."""
    seg_lens, cnts, vmins, vmaxs = [], [], [], []
    m_chunks, w_chunks = [], []
    for parts in parts_col:
        total_len = 0
        cnt = 0
        vmin = np.inf
        vmax = -np.inf
        for p in parts:
            m = np.asarray(p["means"], dtype=np.float64)
            m_chunks.append(m)
            w_chunks.append(np.asarray(p["weights"], dtype=np.float64))
            total_len += len(m)
            cnt += int(p["cnt"])
            vmin = min(vmin, float(p["vmin"]))
            vmax = max(vmax, float(p["vmax"]))
        seg_lens.append(total_len)
        cnts.append(cnt)
        vmins.append(vmin)
        vmaxs.append(vmax)
    n_groups = len(seg_lens)
    if n_groups == 0:
        return [], [], cnts, np.empty(0), np.empty(0)
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    m_all = np.concatenate(m_chunks)
    w_all = np.concatenate(w_chunks)
    seg_all = np.repeat(np.arange(n_groups), seg_lens)
    order = np.lexsort((m_all, seg_all))
    m_s, w_s = m_all[order], w_all[order]
    total = m_s.shape[0]
    starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
    csw = np.cumsum(w_s)
    base = np.repeat(
        np.concatenate([[0.0], csw[np.cumsum(seg_lens)[:-1] - 1]]),
        seg_lens)
    seg_total = np.repeat(csw[np.cumsum(seg_lens) - 1] - base[starts],
                          seg_lens)
    q_left = (csw - base - w_s) / seg_total
    k = np.floor(delta * (np.arcsin(2.0 * q_left - 1.0) / np.pi + 0.5))
    boundary = np.empty(total, dtype=bool)
    boundary[0] = True
    boundary[1:] = k[1:] != k[:-1]
    boundary[starts] = True
    grp = np.cumsum(boundary) - 1
    ws_all = np.bincount(grp, w_s)
    ms_all = np.bincount(grp, w_s * m_s) / ws_all
    n_clusters = np.bincount(seg_all[boundary], minlength=n_groups)
    splits = np.cumsum(n_clusters)[:-1]
    ms_parts = np.split(ms_all, splits)
    ws_parts = np.split(ws_all, splits)
    # Single-centroid groups: _compress early-returns the centroid
    # untouched, so bypass the (w*m)/w round-trip (ulp-exact parity).
    for i in np.nonzero(seg_lens == 1)[0]:
        ms_parts[i] = m_s[starts[i]:starts[i] + 1].copy()
        ws_parts[i] = w_s[starts[i]:starts[i] + 1].copy()
    return (ms_parts, ws_parts, cnts,
            np.asarray(vmins), np.asarray(vmaxs))


def tdigest_quantiles(digests: DataFrame,
                      qs: tuple = (0.5, 0.95, 0.99)) -> DataFrame:
    """(series_key, bucket_ts, p50, p95, p99, cnt) estimates from sketch
    rows — map-only, one pass, no shuffle."""
    if tuple(qs) != (0.5, 0.95, 0.99):
        raise ValueError("QUANTILE_SCHEMA is fixed to (0.5, 0.95, 0.99); "
                         "extend the schema alongside qs")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, w, c, lo, hi, sk, bt in zip(
                    pdf["means"], pdf["weights"], pdf["cnt"], pdf["vmin"],
                    pdf["vmax"], pdf["series_key"], pdf["bucket_ts"]):
                m = np.asarray(m, dtype=np.float64)
                w = np.asarray(w, dtype=np.float64)
                rows.append((sk, bt,
                             _estimate(m, w, c, lo, hi, 0.5),
                             _estimate(m, w, c, lo, hi, 0.95),
                             _estimate(m, w, c, lo, hi, 0.99),
                             int(c)))
            yield pd.DataFrame(
                rows, columns=["series_key", "bucket_ts", "p50", "p95",
                               "p99", "cnt"])

    return digests.mapInPandas(run, QUANTILE_SCHEMA)


def tdigest_over_time(digests: DataFrame, k_buckets: int, *,
                      delta: int = 100,
                      min_buckets: int = 1) -> DataFrame:
    """PromQL ``quantile_over_time`` from SKETCHES: for every (series,
    bucket), merge the trailing ``k_buckets`` PRESENT buckets' t-digests
    (current included) into one rolling digest — quantiles over any
    trailing window at any tier, raw data never touched. The capability
    this buys at 100 TB: "p99 over the last 24h" per series from 24
    sketch rows instead of a day of raw samples.

    Window semantics match ``rolling_over_time``: a bounded ROWS frame
    over present tier rows (gaps are skipped, not zero-filled), with a
    ``min_buckets`` gate surfaced as ``n_buckets`` for the caller.
    Output: TDIGEST_SCHEMA + ``n_buckets``; feed to
    :func:`tdigest_quantiles` for estimates.

    Scale shape: one bounded window per series over TIER rows carrying
    sketch structs (collect_list over a (k)-row frame — state is k
    centroid arrays, ~k*delta doubles), then the same whole-batch
    vectorized merge the cascade uses. No raw-data shuffle; partition
    size is the series' bucket count.
    """
    if k_buckets < 1:
        raise ValueError(f"k_buckets must be >= 1, got {k_buckets}")
    if min_buckets < 1:
        raise ValueError(f"min_buckets must be >= 1, got {min_buckets}")
    w = (Window.partitionBy("series_key").orderBy("bucket_ts")
         .rowsBetween(-(k_buckets - 1), 0))
    rolled = (digests
              .withColumn("_parts", F.collect_list(F.struct(
                  "means", "weights", "cnt", "vmin", "vmax")).over(w))
              .withColumn("n_buckets", F.size("_parts"))
              .where(F.col("n_buckets") >= min_buckets)
              .select("series_key", "bucket_ts", "_parts", "n_buckets"))

    def merge(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ms, ws, cnts, vmins, vmaxs = _merge_batch_vectorized(
                pdf["_parts"], delta)
            yield pd.DataFrame({
                "series_key": pdf["series_key"].to_numpy(),
                "bucket_ts": pdf["bucket_ts"].to_numpy(),
                "means": [list(m) for m in ms],
                "weights": [list(w_) for w_ in ws],
                "cnt": cnts,
                "vmin": vmins,
                "vmax": vmaxs,
                "n_buckets": pdf["n_buckets"].to_numpy(),
            })

    return rolled.mapInPandas(merge, TDIGEST_SCHEMA + ", n_buckets int")
